"""Parquet table loading for the driver test tables (scan operators S1-S8).

All loads pass the explicit schema from :mod:`..schemas` so nothing is
inferred; Catalyst prunes to the referenced columns and pushes filters
into the parquet scan (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TABLE_NAMES, TESTDATA

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Timestamp columns that MAY be stored as parquet timestamp[ns], which
#: Spark's vectorized reader refuses to map to TimestampType. The actual
#: unit is probed from the parquet footer per file (cheap, driver-side,
#: cached): ns files are read as raw longs
#: (``spark.sql.legacy.parquet.nanosAsLong`` — pinned in
#: session.RUNTIME_CONFS) and converted to µs timestamps on load with
#: integer division (ns→µs loses nothing here: the fixtures carry no
#: sub-µs precision, and DuckDB's reader truncates identically); µs/ms
#: files map straight to TimestampType with no conversion.
NANOS_CANDIDATES: dict[str, tuple[str, ...]] = {"events": ("ts",)}


@lru_cache(maxsize=1024)
def _file_nanos_columns(path: str, candidates: tuple[str, ...]) -> tuple[str, ...]:
    """Subset of ``candidates`` physically stored as timestamp[ns] at
    ``path`` (file or directory) — a parquet footer/metadata read, no
    data scan."""
    if not candidates:
        return ()
    import pyarrow as pa

    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
    except Exception:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
    return tuple(
        c
        for c in candidates
        if c in schema.names
        and pa.types.is_timestamp(schema.field(c).type)
        and schema.field(c).type.unit == "ns"
    )


def physical_read_schema(name: str, path: str | None = None) -> T.StructType:
    """The schema handed to the parquet reader — canonical schema with
    the columns that are physically timestamp[ns] widened to long.
    Without a ``path`` to probe, all candidates are assumed ns (the
    legacy layout)."""
    candidates = NANOS_CANDIDATES.get(name, ())
    nanos = _file_nanos_columns(path, candidates) if path else candidates
    return T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nanos else f.dataType)
            for f in TESTDATA[name].fields
        ]
    )


def convert_nanos(df: DataFrame, name: str, path: str | None = None) -> DataFrame:
    """ns-long → µs-timestamp conversion for the columns
    :func:`physical_read_schema` widened to long (``div`` keeps the
    arithmetic in int64 — a double division would lose precision above
    2^53 ns)."""
    candidates = NANOS_CANDIDATES.get(name, ())
    nanos = _file_nanos_columns(path, candidates) if path else candidates
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Scan one test table (S1/S4 analogue: full-table scan with schema)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA)}")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.schema(physical_read_schema(name, path)).parquet(path)
    return convert_nanos(df, name, path)


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Whole-catalog scan (S7 analogue: read_all_tables)."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for the SQL API (S5)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
