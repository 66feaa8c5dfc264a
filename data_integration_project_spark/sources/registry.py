"""Parquet table loading for the driver test tables (scan operators S1-S8).

All loads pass the explicit schema from :mod:`..schemas` so nothing is
inferred; Catalyst prunes to the referenced columns and pushes filters
into the parquet scan (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TESTDATA

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Columns stored as parquet timestamp[ns], which Spark's vectorized
#: reader refuses to map to TimestampType. They are read as raw nanos
#: (``spark.sql.legacy.parquet.nanosAsLong`` — pinned in
#: session.RUNTIME_CONFS) and converted to µs timestamps on load with
#: integer division (ns→µs loses nothing here: the fixtures carry no
#: sub-µs precision, and DuckDB's reader truncates identically).
NANOS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def physical_read_schema(name: str) -> T.StructType:
    """The schema handed to the parquet reader — canonical schema with
    timestamp[ns] columns widened to long."""
    nanos = NANOS_COLUMNS.get(name, ())
    return T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nanos else f.dataType)
            for f in TESTDATA[name].fields
        ]
    )


def convert_nanos(df: DataFrame, name: str) -> DataFrame:
    """ns-long → µs-timestamp conversion for :data:`NANOS_COLUMNS`
    (``div`` keeps the arithmetic in int64 — a double division would
    lose precision above 2^53 ns)."""
    for c in NANOS_COLUMNS.get(name, ()):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Scan one test table (S1/S4 analogue: full-table scan with schema)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA)}")
    df = spark.read.schema(physical_read_schema(name)).parquet(
        f"{sf_dir}/{name}.parquet"
    )
    return convert_nanos(df, name)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Whole-catalog scan (S7 analogue: read_all_tables)."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for the SQL API (S5)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
