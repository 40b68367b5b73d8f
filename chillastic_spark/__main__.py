"""Service entrypoint — the reference's index.js analog:
``python -m chillastic_spark`` starts the REST control plane over a
local SparkSession and a state root.

Config comes from the environment (the reference reads its own env,
config/index.js):

    CHILLASTIC_STATE_ROOT   task/progress state dir  (default ./state)
    CHILLASTIC_HOST         bind host (default 127.0.0.1 — loopback;
                            non-loopback binds REQUIRE an api key,
                            endpoints read local filesystem paths)
    CHILLASTIC_PORT         listen port              (default 8080)
    CHILLASTIC_API_KEY      api_key header auth (optional on loopback)
    CHILLASTIC_SEARCH_DIR   optional materialized search index dir
    CHILLASTIC_VECTOR_DIR   optional materialized vector index dir
    SPARK_GRAFT_CPUS        local[] parallelism      (default 32)
    SPARK_GRAFT_MASTER      Spark master override (e.g. yarn); an
                            already-active SparkSession always wins

On a cluster: start under spark-submit (the pre-created session is
reused as-is) or set SPARK_GRAFT_MASTER; ship the package to workers
with --py-files / a cluster env.
"""
from __future__ import annotations

import os


def build(state_root: str | None = None):
    """(engine, app) wired from the environment — separated from
    serving so tests can build without binding a port."""
    from chillastic_spark.api import create_app
    from chillastic_spark.engine import Engine
    from chillastic_spark.session import get_spark

    spark = get_spark("chillastic-service")
    engine = Engine(
        spark, state_root or os.environ.get("CHILLASTIC_STATE_ROOT", "./state")
    )
    app = create_app(
        engine,
        api_key=os.environ.get("CHILLASTIC_API_KEY"),
        search_index_dir=os.environ.get("CHILLASTIC_SEARCH_DIR"),
        vector_index_dir=os.environ.get("CHILLASTIC_VECTOR_DIR"),
    )
    return engine, app


def resolve_bind(env: "dict[str, str] | os._Environ" = os.environ) -> "tuple[str, int]":
    """(host, port) from the environment, refusing the dangerous
    combination: a non-loopback bind with NO api key would expose
    endpoints that read local parquet paths (e.g. GET /drift?path=...)
    to any network peer. Pure so tests pin the rule directly."""
    host = env.get("CHILLASTIC_HOST", "127.0.0.1")
    port = int(env.get("CHILLASTIC_PORT", "8080"))
    loopback = host in ("127.0.0.1", "::1", "localhost")
    if not loopback and not env.get("CHILLASTIC_API_KEY"):
        raise SystemExit(
            f"refusing to bind {host} without CHILLASTIC_API_KEY: "
            "endpoints expose local filesystem reads; set the key or "
            "bind loopback (CHILLASTIC_HOST=127.0.0.1)"
        )
    return host, port


def main() -> None:
    # validate bind config FIRST — it's pure env; failing after the
    # multi-second JVM/session boot would waste the whole startup
    host, port = resolve_bind()
    engine, app = build()
    engine.start()  # the reference starts running (index.js app.run)
    app.run(host=host, port=port)


if __name__ == "__main__":
    main()
