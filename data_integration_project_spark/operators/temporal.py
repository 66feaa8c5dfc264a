"""Temporal join operators Spark lacks as primitives: as-of join
(each left row matched to the most recent right row at-or-before its
timestamp) — expressed as a union + single window pass, per the
driver's custom-operator guidance (composition of built-ins first).

Scale shape: tag both inputs, union, ONE shuffle on (key) sorted by
(ts, tiebreak), then ``last(right_struct, ignorenulls=True)`` over the
preceding frame. Cost is a sort-within-key — no per-row lookups, no
range explosion, and skewed keys split via AQE. The classic
alternative (range join + window re-rank) shuffles twice and can
explode on dense right sides; this form cannot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int,
    prefix: str = "r_",
) -> DataFrame:
    """Time-range join: pairs (l, r) with the same key and
    ``|l.ts - r.ts| <= window_seconds`` — WITHOUT the naive
    inequality-join cross product.

    Binned form: right rows land in one coarse bin of width
    ``window_seconds``; left rows probe their own bin ±1 (any match is
    within one bin of the left row). The equi-join on (key, bin) is an
    ordinary hash join — work is proportional to true candidates, and
    the exact predicate filters the bin edges. This is the standard
    OSS-Spark substitute for a range-join optimizer rule.
    """
    w = F.lit(window_seconds)
    r_binned = right.select(
        F.col(on),
        *[F.col(c).alias(f"{prefix}{c}") for c in right.columns if c != on],
    ).withColumn("_bin", F.floor(F.col(f"{prefix}{right_ts}").cast("double") / w))
    l_binned = left.withColumn(
        "_bins",
        F.array(
            F.floor(F.col(left_ts).cast("double") / w) - 1,
            F.floor(F.col(left_ts).cast("double") / w),
            F.floor(F.col(left_ts).cast("double") / w) + 1,
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    joined = l_binned.join(r_binned, [on, "_bin"]).drop("_bin")
    dt_abs = F.abs(
        F.col(left_ts).cast("double") - F.col(f"{prefix}{right_ts}").cast("double")
    )
    return joined.filter(dt_abs <= w)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    strict: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: for every ``left`` row, attach the latest
    ``right`` row with the same ``on`` key and ``right_ts < left_ts``
    (``strict=False`` → ``<=``). Unmatched left rows keep NULLs (LEFT
    semantics). Right columns come back ``prefix``-renamed.

    DuckDB twin (the oracle): ``ASOF LEFT JOIN ... ON l.k = r.k AND
    l.ts > r.ts`` (or ``>=``).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tag = left.withColumn("_is_left", F.lit(True)).withColumn("_ats", F.col(left_ts))
    r_tag = (
        right.select(
            F.col(on),
            F.col(right_ts).alias("_ats"),
            F.struct(
                F.col(right_ts).alias(right_ts),
                *[F.col(c) for c in rcols],
            ).alias("_rpayload"),
        )
        .withColumn("_is_left", F.lit(False))
    )
    # align schemas for the union
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows sort BEFORE left rows at equal ts for <= semantics,
    # AFTER for strict <; the frame ends 1 row back either way
    ts_rank = (
        F.when(F.col("_is_left"), F.lit(1)).otherwise(F.lit(0))
        if not strict
        else F.when(F.col("_is_left"), F.lit(0)).otherwise(F.lit(1))
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", ts_rank)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = unioned.withColumn(
        "_asof", F.last("_rpayload", ignorenulls=True).over(w)
    )
    out = matched.filter(F.col("_is_left")).drop(
        "_is_left", "_ats", "_rpayload"
    )
    for c in [right_ts, *rcols]:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_asof.{c}"))
    return out.drop("_asof")


def pit_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str,
    *,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Point-in-time join: enrich each fact row with the SCD2 dimension
    version that was VALID AT the fact's event time —
    ``valid_from <= ts < valid_to`` (open-ended current version =
    NULL valid_to). The join every event-sourced DWH needs and plain
    equi-joins can't express: joining on key alone would fan out one
    fact row per dimension version.

    Scale shape: dimensions are small relative to facts, so the default
    is a broadcast join with the validity range as a residual predicate
    — the fact side never shuffles. For a dimension too big to
    broadcast, pass ``broadcast_dim=False``: the equi-key part shuffles
    both sides on the key and the range predicate filters within each
    key's (few) versions — never a blind interval cross-product."""
    d = F.broadcast(dim) if broadcast_dim else dim
    cond = (
        (fact[ts_col] >= d[from_col])
        & (d[to_col].isNull() | (fact[ts_col] < d[to_col]))
        & (fact[key] == d[key])
    )
    return fact.join(d, cond, "left").drop(d[key])
