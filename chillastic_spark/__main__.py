"""Service entrypoint — the reference's index.js analog:
``python -m chillastic_spark`` starts the REST control plane over a
local SparkSession and a state root.

Config comes from the environment (the reference reads its own env,
config/index.js):

    CHILLASTIC_STATE_ROOT   task/progress state dir  (default ./state)
    CHILLASTIC_PORT         listen port              (default 8080)
    CHILLASTIC_API_KEY      optional api_key header auth
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


def main() -> None:
    engine, app = build()
    engine.start()  # the reference starts running (index.js app.run)
    port = int(os.environ.get("CHILLASTIC_PORT", "8080"))
    app.run(host="0.0.0.0", port=port)


if __name__ == "__main__":
    main()
