"""Star-schema DWH build operators (reference ``sql/create_dwh_tables.sql``):
date dimension, surrogate keys, SCD Type 2 merge, fact construction.

Scale notes: surrogate keys are assigned by a deterministic
``row_number`` over the natural key — a single shuffle; at 100 TB
dimension scale you'd switch to ``monotonically_increasing_id`` +
stable hashing or a key registry. SCD2 is a full merge-and-rewrite of
the dimension (dims are small relative to facts); Delta/Iceberg
``MERGE INTO`` is the incremental answer when a table format is on the
classpath.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.dates import dim_date_columns


def build_dim_date(spark: SparkSession, start: str, end: str) -> DataFrame:
    """dim_date generator (create_dwh_tables.sql:112-127): one row per
    calendar day in [start, end], all attributes derived (no driver-side
    loop — ``sequence`` + ``explode`` stays in the JVM)."""
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    return days.select(*dim_date_columns(F.col("d")))


def with_surrogate_key(df: DataFrame, natural_key: str, key_name: str) -> DataFrame:
    """IDENTITY-column replacement (create_dwh_tables.sql surrogate
    keys): deterministic dense ids 1..n ordered by the natural key."""
    w = Window.orderBy(natural_key)
    return df.withColumn(key_name, F.row_number().over(w))


def scd2_init(
    snapshot: DataFrame, valid_from: str, *, from_col="valid_from", to_col="valid_to", cur_col="is_current"
) -> DataFrame:
    """Open an initial SCD2 dimension from a full snapshot
    (create_dwh_tables.sql:29-32 valid_from/valid_to/is_current)."""
    return (
        snapshot.withColumn(from_col, F.lit(valid_from).cast("date"))
        .withColumn(to_col, F.lit(None).cast("date"))
        .withColumn(cur_col, F.lit(True))
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
    *,
    from_col="valid_from",
    to_col="valid_to",
    cur_col="is_current",
) -> DataFrame:
    """SCD Type 2 merge without a mutable store (SURVEY.md §7 hard part):

    * current rows whose tracked attributes changed → closed
      (``valid_to = effective_date``, ``is_current = false``);
    * changed + brand-new keys → opened as the new current version;
    * unchanged current rows and historical rows pass through.

    One broadcast-or-shuffle join on the key; the dimension is rewritten
    wholesale (idempotent, deterministic — no ``dropDuplicates``).
    """
    eff = F.lit(effective_date).cast("date")
    meta = [from_col, to_col, cur_col]
    upd = updates.select(key, *tracked)

    current = dim.filter(F.col(cur_col))
    history = dim.filter(~F.col(cur_col))

    # one join; differs==NULL means the key is absent from updates
    cmp = current.alias("c").join(
        upd.select(
            F.col(key),
            *[F.col(c).alias(f"_u_{c}") for c in tracked],
            F.lit(True).alias("_in_upd"),
        ),
        key,
        "left",
    )
    differs = F.coalesce(
        ~F.expr(" AND ".join(f"c.{c} <=> _u_{c}" for c in tracked)), F.lit(False)
    )

    untouched = cmp.filter(~F.coalesce(F.col("_in_upd"), F.lit(False)) | ~differs).select(
        key, *[F.col(f"c.{c}") for c in tracked], *[F.col(f"c.{c}") for c in meta]
    )
    closed = cmp.filter(F.coalesce(F.col("_in_upd"), F.lit(False)) & differs).select(
        key,
        *[F.col(f"c.{c}") for c in tracked],
        F.col(f"c.{from_col}").alias(from_col),
        eff.alias(to_col),
        F.lit(False).alias(cur_col),
    )
    changed_or_new = upd.join(
        current.select(
            key,
            *[F.col(c).alias(f"_c_{c}") for c in tracked],
            F.lit(True).alias("_in_cur"),
        ),
        key,
        "left",
    )
    is_new = ~F.coalesce(F.col("_in_cur"), F.lit(False))  # key absent from current
    upd_differs = F.coalesce(
        ~F.expr(" AND ".join(f"{c} <=> _c_{c}" for c in tracked)), F.lit(True)
    )
    opened = (
        changed_or_new.filter(is_new | upd_differs)
        .select(
            key,
            *tracked,
            eff.alias(from_col),
            F.lit(None).cast("date").alias(to_col),
            F.lit(True).alias(cur_col),
        )
    )
    cols = [key, *tracked, *meta]
    return (
        history.select(*cols)
        .unionByName(untouched.select(*cols))
        .unionByName(closed.select(*cols))
        .unionByName(opened.select(*cols))
    )


def current_dim(dim: DataFrame, cur_col: str = "is_current") -> DataFrame:
    """SCD2 lookup side: J3 requires ``is_current = 1`` filtering
    (create_dwh_tables.sql:160-165 FK + is_current index)."""
    return dim.filter(F.col(cur_col))


def build_fact(
    base: DataFrame,
    dims: list[tuple[DataFrame, Column, list[Column]]],
    measures: list[Column],
) -> DataFrame:
    """Generic fact build (fact_dat_hang shape,
    create_dwh_tables.sql:138-166): broadcast each dimension, join on its
    natural-key predicate, project surrogate keys + measures. FK
    integrity is join-time (Spark has no constraints): rows that miss a
    dimension keep NULL keys so the caller can route them to the error
    zone instead of silently dropping."""
    out = base
    keep: list[Column] = []
    for dim, on, take in dims:
        out = out.join(F.broadcast(dim), on, "left")
        keep.extend(take)
    return out.select(*keep, *measures)
