"""Document store: the parquet-backed "cluster" (SURVEY §2.1).

A store root holds one parquet dataset per index plus a JSON catalog of
index configs and templates (the ES settings/mappings/templates analog):

    {root}/
      data/{index}/*.parquet     — envelope rows
      catalog/indices.json       — {name: {settings, mappings, aliases}}
      catalog/templates.json     — {name: {index_patterns, settings, ...}}

Document envelope (transfer.js:175-189): ``_index, _type, _id`` strings,
``_source`` JSON string (schemaless payload), optional ``_size`` long.
At 100 TB the data/ dir maps 1:1 onto a partitioned table (one partition
per index/type); reads below always prune to the requested index and
push the type + size-range predicates into the parquet scan.
"""
from __future__ import annotations

import fnmatch
import json
import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("_index", T.StringType()),
        T.StructField("_type", T.StringType()),
        T.StructField("_id", T.StringType()),
        T.StructField("_source", T.StringType()),
        T.StructField("_size", T.LongType()),
    ]
)

# settings stripped before create (transfer.js:234-243)
NON_PORTABLE_SETTINGS = ("uuid", "creation_date", "provided_name")


class StoreError(RuntimeError):
    pass


class DocumentStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "catalog"), exist_ok=True)

    # ---------------------------------------------------------- paths
    def index_path(self, index: str) -> str:
        return os.path.join(self.root, "data", index)

    def _catalog_path(self, which: str) -> str:
        return os.path.join(self.root, "catalog", f"{which}.json")

    def _read_catalog(self, which: str) -> dict[str, Any]:
        p = self._catalog_path(which)
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def _write_catalog(self, which: str, data: dict[str, Any]) -> None:
        tmp = self._catalog_path(which) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
        os.replace(tmp, self._catalog_path(which))

    # ------------------------------------------------- index configs
    def get_indices(self, pattern: str) -> list[dict]:
        """Index configs matching a glob, name injected — the
        Transfer.getIndices shape (transfer.js:364-372)."""
        if not isinstance(pattern, str) or not pattern:
            raise StoreError("pattern must be a non-empty string")
        cat = self._read_catalog("indices")
        return [
            dict(cfg, name=name)
            for name, cfg in sorted(cat.items())
            if fnmatch.fnmatch(name, pattern)
        ]

    def put_indices(self, indices: list[dict]) -> None:
        """Create index configs, stripping non-portable settings
        (transfer.js:224-258)."""
        if not isinstance(indices, list):
            raise StoreError("indices must be a list")
        cat = self._read_catalog("indices")
        for index in indices:
            index = json.loads(json.dumps(index))  # deep copy
            name = index.pop("name", None)
            if not isinstance(name, str):
                raise StoreError("index config must carry a string name")
            settings = index.get("settings", {}).get("index")
            if isinstance(settings, dict):
                for k in NON_PORTABLE_SETTINGS:
                    settings.pop(k, None)
                if isinstance(settings.get("version"), dict):
                    settings["version"].pop("created", None)
            cat[name] = index
        self._write_catalog("indices", cat)

    # ---------------------------------------------------- templates
    def get_templates(self, pattern: str) -> list[dict]:
        """Templates matching a glob; system templates (any
        index_pattern starting with '.') are dropped; none found is an
        error (transfer.js:383-406)."""
        if not isinstance(pattern, str) or not pattern:
            raise StoreError("pattern must be a non-empty string")
        cat = self._read_catalog("templates")
        found = [
            dict(cfg, name=name)
            for name, cfg in sorted(cat.items())
            if fnmatch.fnmatch(name, pattern)
            and not any(p.startswith(".") for p in cfg.get("index_patterns", []))
        ]
        if not found:
            raise StoreError("Templates asked to be copied, but none found")
        return found

    def put_templates(self, templates: list[dict]) -> None:
        if not isinstance(templates, list):
            raise StoreError("templates must be a list")
        cat = self._read_catalog("templates")
        for template in templates:
            template = json.loads(json.dumps(template))
            name = template.pop("name", None)
            if not isinstance(name, str):
                raise StoreError("template must carry a string name")
            cat[name] = template
        self._write_catalog("templates", cat)

    # -------------------------------------------------------- types
    def types_of(self, index_cfg: dict) -> list[dict]:
        """Mapping types of an index config, name injected
        (subtasks.js:165 getTypesFromMappings)."""
        return [
            dict(t or {}, name=name)
            for name, t in sorted((index_cfg.get("mappings") or {}).items())
        ]

    # --------------------------------------------------------- data
    def list_data_indices(self, pattern: str = "*") -> list[str]:
        data = os.path.join(self.root, "data")
        return sorted(
            d for d in os.listdir(data)
            if fnmatch.fnmatch(d, pattern)
            and os.path.isdir(os.path.join(data, d))
        )

    def read(
        self,
        spark: SparkSession,
        index: str,
        type: Optional[str] = None,
        min_size: float = -1,
        max_size: float = -1,
    ) -> DataFrame:
        """Partitioned scan of one (index[,type]) slice with the size
        range pushed down (the scroll-scan analog, transfer.js:103-151;
        range query subtask.js:61-74)."""
        path = self.index_path(index)
        if not os.path.isdir(path):
            return spark.createDataFrame([], ENVELOPE_SCHEMA)
        df = spark.read.schema(ENVELOPE_SCHEMA).parquet(path)
        df = df.withColumn("_index", F.lit(index))
        if type is not None:
            df = df.filter(F.col("_type") == type)
        if min_size >= 0 and max_size >= 0:
            # NULL _size behaves as size 0 (matching the planner's
            # stats) so unsized docs land in EXACTLY the lowest bucket —
            # a bare range predicate would silently drop them
            in_range = (F.col("_size") >= min_size) & (F.col("_size") < max_size)
            if min_size <= 0 < max_size:
                in_range = in_range | F.col("_size").isNull()
            df = df.filter(in_range)
        return df

    def write_documents(
        self,
        df: DataFrame,
        index: str,
        mode: str = "append",
        partition_by: Optional[list[str]] = None,
    ) -> None:
        """Raw write of envelope rows into one index (no merge — see
        sinks.upsert for idempotent delivery).

        ``partition_by=["_type"]`` lays the index out Hive-style so
        per-type scans become partition-PRUNED reads (the metadata-level
        type filter of SURVEY P4, enforced by the storage layout) —
        the recommended layout at scale.
        """
        writer = df.select(
            "_index", "_type", "_id", "_source",
            *( ["_size"] if "_size" in df.columns else [F.lit(None).cast("long").alias("_size")]),
        ).write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.index_path(index))

    def count(self, spark: SparkSession, index: str, type: Optional[str] = None,
              min_size: float = -1, max_size: float = -1) -> int:
        """Subtask count query (subtasks.js:97-100)."""
        return self.read(spark, index, type, min_size, max_size).count()
