"""DDL bootstrap (reference K7: per-run database + staging tables,
main.py:79-266 / setup_staging_tables.py:11-51) — idempotent
``CREATE ... IF NOT EXISTS`` through spark.sql against the session
catalog (Hive metastore / in-memory derby locally; Unity/Glue-style
catalogs at cluster scale — same statements).

The reference creates a FRESH ``DB_{run_id}`` per run; here a
run-scoped schema name serves the same isolation without wall-clock
coupling (the caller passes run_id explicitly).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..schemas import ENTITIES


def _ddl_type(dt: T.DataType) -> str:
    return dt.simpleString()


def bootstrap_run_schema(
    spark: SparkSession,
    run_id: str,
    *,
    prefix: str = "staging",
    sources: tuple[str, ...] = ("csv", "sql"),
    location: str | None = None,
) -> str:
    """Create the run-scoped database and one staging table per
    entity×source (the reference's 10 tables, main.py:129-256), all
    idempotent. Tables are parquet-backed managed tables; surrogate
    ``id IDENTITY`` becomes load-time ``row_number``/monotonic id, and
    ``loaded_at DEFAULT GETDATE()`` becomes a ``current_timestamp()``
    column written by the loader (Spark DDL has no column defaults on
    parquet tables)."""
    db = f"{prefix}_{run_id}"
    loc = f" LOCATION '{location}/{db}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}{loc}")
    for entity, schema in ENTITIES.items():
        cols = ", ".join(f"`{f.name}` {_ddl_type(f.dataType)}" for f in schema.fields)
        lineage = "`_line_no` bigint, `_run_id` string, `loaded_at` timestamp"
        for source in sources:
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {db}.{entity}_{source} "
                f"({cols}, {lineage}) USING parquet"
            )
    return db


def drop_run_schema(spark: SparkSession, db: str) -> None:
    """Tear down a run database (the reference leaves DB_{run_id}
    databases behind; CHECK_DATABASE.sql lists them — here cleanup is
    one statement)."""
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
