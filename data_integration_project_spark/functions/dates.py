"""Date/time expression helpers (reference §2.9 date class + dim_date
attributes, sql/create_dwh_tables.sql:112-127).

Conventions are pinned to definitions that agree across engines:
``day_of_week`` is ISO (1=Monday..7=Sunday — Spark ``weekday()+1``,
DuckDB ``isodow``), ``week_of_year`` is ISO week (Spark ``weekofyear``,
DuckDB ``week``), names are English.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(col: Column) -> Column:
    """``YYYYMMDD`` int surrogate key (create_dwh_tables.sql:113)."""
    return F.date_format(col, "yyyyMMdd").cast("int")


def iso_day_of_week(col: Column) -> Column:
    """1=Monday .. 7=Sunday (ISO), engine-agnostic."""
    return (F.weekday(col) + F.lit(1)).cast("int")


def is_weekend(col: Column) -> Column:
    """Saturday/Sunday flag (create_dwh_tables.sql:124)."""
    return iso_day_of_week(col) >= 6


def dim_date_columns(col: Column) -> list[Column]:
    """The full dim_date attribute set (create_dwh_tables.sql:112-127)."""
    return [
        date_key(col).alias("date_key"),
        col.cast("date").alias("full_date"),
        iso_day_of_week(col).alias("day_of_week"),
        F.date_format(col, "EEEE").alias("day_name"),
        F.dayofmonth(col).cast("int").alias("day_of_month"),
        F.dayofyear(col).cast("int").alias("day_of_year"),
        F.weekofyear(col).cast("int").alias("week_of_year"),
        F.month(col).cast("int").alias("month"),
        F.date_format(col, "MMMM").alias("month_name"),
        F.quarter(col).cast("int").alias("quarter"),
        F.year(col).cast("int").alias("year"),
        is_weekend(col).cast("int").alias("is_weekend"),
        F.lit(0).alias("is_holiday"),  # reference defaults 0 (no holiday calendar)
    ]


#: DuckDB twin of :func:`dim_date_columns` — kept adjacent so the two
#: definitions evolve together.
DIM_DATE_SQL_COLUMNS = """
  CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
  CAST(d AS DATE) AS full_date,
  CAST(isodow(d) AS INT) AS day_of_week,
  dayname(d) AS day_name,
  CAST(day(d) AS INT) AS day_of_month,
  CAST(dayofyear(d) AS INT) AS day_of_year,
  CAST(week(d) AS INT) AS week_of_year,
  CAST(month(d) AS INT) AS month,
  monthname(d) AS month_name,
  CAST(quarter(d) AS INT) AS quarter,
  CAST(year(d) AS INT) AS year,
  CAST(isodow(d) >= 6 AS INT) AS is_weekend,
  0 AS is_holiday
"""
