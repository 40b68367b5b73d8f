"""UDF-registry validation corpus (FIXTURES.md F7, mirroring
tests/services/{valid,invalid}{Mutators,Filters}/)."""
import pytest

from chillastic_spark.model import ActionRef
from chillastic_spark.registry import Filters, Mutators, RegistryError

DATA_MUTATOR = """
TYPE = "data"
OLD = re.compile(r"^(.*)_(\\d{4}-\\d{2})-\\d{2}$")
def predicate(doc, args):
    return bool(OLD.match(doc["_index"]))
def mutate(doc, args):
    doc["_index"] = OLD.sub(r"\\1_\\2", doc["_index"])
    return doc
"""

DROP_WITH_ARGS = """
TYPE = "data"
def predicate(doc, args):
    return doc["_source"].get("field") == args["match"]
def mutate(doc, args):
    return None
"""

INDEX_RENAME = """
TYPE = "index"
def predicate(index, args):
    return True
def mutate(index, args):
    index["name"] = index["name"] + "_renamed"
    return index
"""

TEMPLATE_SHARDS = """
TYPE = "template"
def predicate(t, args):
    return True
def mutate(t, args):
    t.setdefault("settings", {})["number_of_shards"] = 2
    return t
"""

INDEX_FILTER = """
TYPE = "index"
def predicate(index, args):
    return index["name"].startswith("myindex")
"""

TYPE_FILTER_ARGS = """
TYPE = "type"
def predicate(t, args):
    return t["name"] == args["keep"]
"""

INVALID = {
    "noType": "def predicate(d, a):\n    return True\ndef mutate(d, a):\n    return d\n",
    "invalidType": "TYPE='nope'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return d\n",
    "noPredicate": "TYPE='data'\ndef mutate(d,a):\n    return d\n",
    "noMutate": "TYPE='data'\ndef predicate(d,a):\n    return True\n",
    "notPython": "this is ! not python ((",
}


def test_valid_mutators_register():
    m = Mutators()
    m.add("indexDate", DATA_MUTATOR)
    m.add("dropper", DROP_WITH_ARGS)
    m.add("rename", INDEX_RENAME)
    m.add("shards", TEMPLATE_SHARDS)
    assert m.list() == [
        "global/dropper", "global/indexDate", "global/rename", "global/shards"
    ]
    assert m.get("indexDate").type == "data"
    assert m.get("rename").type == "index"


@pytest.mark.parametrize("name,src", INVALID.items())
def test_invalid_mutators_rejected(name, src):
    m = Mutators()
    with pytest.raises(RegistryError):
        m.add("bad", src)


def test_filters_validate():
    f = Filters()
    f.add("idx", INDEX_FILTER)
    f.add("typ", TYPE_FILTER_ARGS)
    assert f.get("idx").type == "index"
    with pytest.raises(RegistryError):
        f.add("bad", "TYPE='data'\ndef predicate(d,a):\n    return True\n")


def test_namespacing_and_ids():
    m = Mutators()
    m.add("myMutator", DATA_MUTATOR, namespace="taskA")
    assert m.exists("myMutator", "taskA")
    assert not m.exists("myMutator")  # global unaffected
    with pytest.raises(ValueError):
        m.add("9startsWithDigit", DATA_MUTATOR)
    with pytest.raises(ValueError):
        m.add("has spaces", DATA_MUTATOR)
    m.remove_namespace("taskA")
    assert not m.exists("myMutator", "taskA")


def test_ensure_exist_and_args_fallback():
    m = Mutators()
    m.add("dropper", DROP_WITH_ARGS)
    with pytest.raises(RegistryError):
        m.ensure_exist([ActionRef(id="missing")])
    # per-action args beat task args (mutators.js:100-101)
    loaded = m.load(
        [ActionRef(id="dropper", arguments={"match": "x"})],
        task_arguments={"match": "y"},
    )
    assert loaded[0].arguments == {"match": "x"}
    loaded = m.load([ActionRef(id="dropper")], task_arguments={"match": "y"})
    assert loaded[0].arguments == {"match": "y"}


def test_persistence_roundtrip(tmp_path):
    d = str(tmp_path / "reg")
    m = Mutators(d)
    m.add("indexDate", DATA_MUTATOR)
    m2 = Mutators(d)  # fresh load from disk
    assert m2.exists("indexDate")
    assert m2.get("indexDate").type == "data"


SANDBOX_ESCAPES = {
    "open": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    open('/etc/passwd')\n    return d\n",
    "importOs": "TYPE='data'\nimport os\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return d\n",
    "importFromOs": "TYPE='data'\nfrom os import path\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return d\n",
    "dunderImport": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    __import__('os')\n    return d\n",
    "eval": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return eval('d')\n",
    "globalsEscape": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    predicate.__globals__\n    return d\n",
    "classEscape": "TYPE='data'\ndef predicate(d,a):\n    return ().__class__ is tuple\ndef mutate(d,a):\n    return d\n",
    "getattrDunder": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    getattr((), '__class__')\n    return d\n",
    "varsEscape": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    vars(predicate)\n    return d\n",
    "execStr": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    exec('x=1')\n    return d\n",
    "compileFn": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    compile('1','','eval')\n    return d\n",
    "moduleLoader": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    json.__loader__\n    return d\n",
    "breakpoint": "TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    breakpoint()\n    return d\n",
}


@pytest.mark.parametrize("name,src", SANDBOX_ESCAPES.items())
def test_sandbox_escapes_rejected_at_registration(name, src):
    """compile_source is the moment+lodash-only analog (reference
    README.md:172, compiler.js:6-12): user code gets re/math/datetime/
    json and a restricted builtins table, nothing else."""
    m = Mutators()
    with pytest.raises(RegistryError):
        m.add("bad", src)


def test_sandbox_allows_whitelisted_imports_and_builtins():
    src = (
        "TYPE='data'\n"
        "import math\n"
        "from datetime import timedelta\n"
        "def predicate(d,a):\n"
        "    return len(d) > 0 and isinstance(d, dict)\n"
        "def mutate(d,a):\n"
        "    d['_source'] = json.dumps({'pi': round(math.pi, 2),"
        " 'day': str(timedelta(days=1))})\n"
        "    return d\n"
    )
    m = Mutators()
    m.add("mathy", src)
    out = m.get("mathy").mutate({"_index": "i", "_source": "{}"}, None)
    assert '"pi": 3.14' in out["_source"]


def test_sandbox_runtime_builtins_restricted():
    # even if a forbidden name sneaks past the static scan via an alias,
    # the exec namespace simply does not contain it
    from chillastic_spark.registry import compile_source

    ns = compile_source("TYPE='data'\ndef predicate(d,a):\n    return True\ndef mutate(d,a):\n    return d\n")
    assert "open" not in ns["__builtins__"]
    assert ns["__builtins__"]["__import__"].__name__ == "_restricted_import"


def test_mutator_functions_work():
    m = Mutators()
    m.add("indexDate", DATA_MUTATOR)
    mut = m.get("indexDate")
    doc = {"_index": "log_2016-12-01", "_source": {}}
    assert mut.predicate(doc, None)
    assert mut.mutate(doc, None)["_index"] == "log_2016-12"


def test_registry_mutations_are_thread_safe(tmp_path):
    """Threaded Flask serves concurrent requests: an unlocked dict
    write racing list()/save() iteration raises 'dictionary changed
    size during iteration'."""
    import threading

    from chillastic_spark.registry import Mutators

    reg = Mutators(state_dir=str(tmp_path))
    errs = []

    def writer():
        try:
            for i in range(300):
                reg.add(
                    f"m{i}",
                    "TYPE='data'\n"
                    "def predicate(d, a):\n    return True\n"
                    "def mutate(d, a):\n    return d\n",
                    namespace="nsa",
                )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def reader():
        try:
            for _ in range(300):
                reg.list()
                reg.list("nsa")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert len(reg.list("nsa")) == 300
