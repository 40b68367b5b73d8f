"""chillastic_spark — a PySpark-native document ETL / analytics engine.

A ground-up reimplementation of the capabilities of groupby/chillastic
(an Elasticsearch reindex/mutate pipeline engine — see SURVEY.md) as an
idiomatic PySpark library, extended with the operators a large-scale
LLM-training-data pipeline needs (dedup, similarity search, text
analysis, multimodal plumbing).

Layout:
  session    — tuned SparkSession factory
  tables     — testdata table loaders
  functions  — scalar function library (the mutator "stdlib", SURVEY §2.8)
  model      — Task / Subtask / Progress models (SURVEY §1.1)
  registry   — mutator & filter registries (SURVEY §2.10)
  sources    — document sources + catalog (index-config) transfer (SURVEY §2.1)
  sinks      — idempotent upsert sink (SURVEY §2.1 S4/S5)
  plans      — backlog planning, adaptive size-bucketing (SURVEY §4.1)
  operators  — mutate pipeline, dedup, similarity, text analysis
  streaming  — structured-streaming continuous reindex (SURVEY §2.9)
  queries    — the driver-facing query inventory + duckdb oracles
"""

__version__ = "0.1.0"
