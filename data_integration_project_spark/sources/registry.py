"""Parquet table loading for the driver test tables (scan operators S1-S8).

All loads pass the explicit schema from :mod:`..schemas` so nothing is
inferred; Catalyst prunes to the referenced columns and pushes filters
into the parquet scan (verify with ``df.explain('formatted')`` →
``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_NAMES, TESTDATA

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Scan one test table (S1/S4 analogue: full-table scan with schema)."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if name not in TESTDATA:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TESTDATA)}")
    return spark.read.schema(TESTDATA[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    """Whole-catalog scan (S7 analogue: read_all_tables)."""
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for the SQL API (S5)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
