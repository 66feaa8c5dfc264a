"""JDBC source leg (reference S4-S8): full-table scans, catalog
discovery, schema introspection, ad-hoc SQL passthrough — as
``spark.read.format("jdbc")`` plans.

Reference mapping (etl/db/database_factory.py):

- S4 ``read_table`` (:107-124)        → :func:`read_table` (dbtable
  scan; ``TOP n`` → ``.limit`` which Spark pushes into the JDBC query)
- S5 ``get_all_tables`` (:47-71)      → :func:`list_tables`
  (INFORMATION_SCHEMA catalog query pushed down as a subquery scan)
- S6 ``get_table_info`` (:73-105)     → :func:`table_info`
- S7 ``read_all_tables`` (:126-149)   → :func:`read_all_tables`
- S8 ``read_custom_query`` (:164-167) → :func:`read_query`

Partitioned reads: the reference streams one cursor; Spark parallelizes
with (partitionColumn, lowerBound, upperBound, numPartitions) — pass
``partition_on`` so a 1000-executor cluster reads 1000 ranges. Connect
retry (etl/utils/retry.py:5-39) is Spark's task retry; driver-side
connection establishment failures surface to the caller.

This container has no RDBMS or JDBC driver jar, so these plans cannot
execute here — construction is unit-tested, execution is gated by the
caller providing a reachable ``url``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class JdbcSource:
    """Connection descriptor (reference .env DB_* settings)."""

    url: str  # e.g. jdbc:sqlserver://host;databaseName=db
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    fetchsize: int = 1000  # cursor streaming, reference reads row-at-a-time
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        out = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.user is not None:
            out["user"] = self.user
        if self.password is not None:
            out["password"] = self.password
        if self.driver is not None:
            out["driver"] = self.driver
        out.update(self.extra)
        return out


def _reader(spark: SparkSession, src: JdbcSource, **opts: str):
    r = spark.read.format("jdbc")
    for k, v in {**src.options(), **opts}.items():
        r = r.option(k, v)
    return r


def read_table(
    spark: SparkSession,
    src: JdbcSource,
    table: str,
    schema: str = "dbo",
    limit: int | None = None,
    partition_on: tuple[str, int, int, int] | None = None,
) -> DataFrame:
    """S4: full-table scan. ``partition_on=(col, lo, hi, n)`` splits the
    scan into n range predicates executed in parallel."""
    opts: dict[str, str] = {"dbtable": f"{schema}.{table}"}
    if partition_on:
        col, lo, hi, n = partition_on
        opts.update(
            partitionColumn=col,
            lowerBound=str(lo),
            upperBound=str(hi),
            numPartitions=str(n),
        )
    df = _reader(spark, src, **opts).load()
    return df.limit(limit) if limit is not None else df


def read_query(spark: SparkSession, src: JdbcSource, query: str) -> DataFrame:
    """S8: ad-hoc SQL pushed to the source engine."""
    return _reader(spark, src, query=query).load()


def list_tables(spark: SparkSession, src: JdbcSource, schema: str = "dbo") -> DataFrame:
    """S5: base tables of a schema (sysdiagrams excluded like
    main.py:558-559)."""
    q = (
        "SELECT TABLE_NAME FROM INFORMATION_SCHEMA.TABLES "
        f"WHERE TABLE_SCHEMA = '{schema}' AND TABLE_TYPE = 'BASE TABLE' "
        "AND TABLE_NAME <> 'sysdiagrams'"
    )
    return read_query(spark, src, q)


def table_info(spark: SparkSession, src: JdbcSource, table: str, schema: str = "dbo") -> DataFrame:
    """S6: column name/type/length/nullability introspection."""
    q = (
        "SELECT COLUMN_NAME, DATA_TYPE, CHARACTER_MAXIMUM_LENGTH, IS_NULLABLE "
        "FROM INFORMATION_SCHEMA.COLUMNS "
        f"WHERE TABLE_SCHEMA = '{schema}' AND TABLE_NAME = '{table}' "
        "ORDER BY ORDINAL_POSITION"
    )
    return read_query(spark, src, q)


def read_all_tables(
    spark: SparkSession, src: JdbcSource, tables: list[str], schema: str = "dbo"
) -> dict[str, DataFrame]:
    """S7: whole-DB scan → dict of lazy DataFrames (nothing is fetched
    until an action runs, unlike the reference's eager row lists)."""
    return {t: read_table(spark, src, t, schema) for t in tables}
