"""Skew-handling queries: the salted aggregation and salted join from
operators/skew.py surfaced as oracle-checked catalog entries.

The events table is the worst-case skew fixture — 5 distinct
event_type values across the whole table, so EVERY group key is hot
and a naive hash partitioning funnels 1/5th of the table into single
reducers. The salted forms spread each hot key across n_salts tasks
and merge; the oracles prove the detour is invisible in the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join, salted_sum
from .catalog import query, t


@query(
    "events_skew_salted_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via two-phase salting: partial sums per
    (event_type, salt) — each of the 5 hot keys spreads across 16
    reducers — then a 5×16-row final merge. The value sum rides as
    exact decimal through both phases (decimal addition is
    order-independent), cast to double once at the end, so the salted
    plan is bit-identical to the direct one."""
    e = t(spark, sf_dir, "events").withColumn(
        "_v_dec", F.col("value").cast("decimal(18,6)")
    )
    out = salted_sum(
        e,
        ["event_type"],
        [("_v_dec", "total_value")],
        salt_from="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type",
        "n_rows",
        F.col("total_value").cast("double").alias("total_value"),
    )


@query(
    "events_skew_salted_join",
    oracle="""
    SELECT event_type,
           CASE WHEN event_type IN ('signup', 'purchase') THEN 1 ELSE 0 END
             AS is_conversion,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def events_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe dimension join: a 5-row event-type dimension is
    replicated 8× (explode) and joined on (event_type, salt), so each
    hot key's probe rows fan across 8 tasks instead of one. The
    post-join rollup re-aggregates per type; the oracle computes the
    same result with no join at all — proving the salting detour
    changes distribution only, never semantics. (At real scale the
    small side would also be broadcast-eligible; salting is the form
    for when it isn't.)"""
    e = t(spark, sf_dir, "events")
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn(
            "is_conversion",
            F.col("event_type").isin("signup", "purchase").cast("int"),
        )
    )
    joined = salted_join(e, dim, "event_type", n_salts=8)
    return joined.groupBy("event_type", "is_conversion").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("total_value"),
    )
