"""data_integration_project_spark — a PySpark-native analytics/ETL engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (surveyed in SURVEY.md):
sources, per-entity transform pipelines, a declarative data-quality rule
engine, dual-source merge/reconciliation, a star-schema DWH build with
SCD2, monitoring aggregations, and a Structured Streaming ingest path —
plus large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is declared through the DataFrame/SQL API so Catalyst handles
pushdown, pruning, join selection, and AQE; Python UDFs appear only where
built-ins genuinely cannot express the semantics (Arrow-batched, never
row-at-a-time).
"""

__version__ = "0.1.0"
