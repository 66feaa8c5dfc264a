"""Exact quantiles at scale without a global sort: multipass range
refinement.

``multipass_quantile`` computes EXACT order statistics of an integer
column in O(log_k(domain)) full scans, holding only ``k`` counters per
quantile on the driver. Each pass buckets the current candidate range
of every requested quantile into ``k`` equal-width bins in ONE shared
scan (map-side-combined counts, shuffle carries <= k * |quantiles|
rows), locates the bin containing the target rank, and recurses into
it; when a range narrows to single values, the answer is exact.

This is the mergeable/bounded-state "edge estimator" completing the
sample-based RangePartitioner pattern (orders_range_partition_hist):
per-pass histograms are additive across partitions (mergeable), state
is fixed at k counters, and unlike a KLL sketch the final answer is
exact — the extra passes buy exactness, the right trade at 100 TB
where a global sort of the fact column is the thing to avoid.

Reference parity: the reference's reporting layer computes order
statistics by sorting in SQL over staged tables
(coffee_etl_clean/sql/create_merged_views.sql aggregate views); this
reformulates the same statistic scan-iteratively for data too large to
sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class _Range:
    idx: int
    label: str
    rank: int  # 1-indexed rank still to locate WITHIN [lo, hi]
    lo: int
    hi: int


def multipass_quantile(
    df: DataFrame,
    value: Column,
    probs: dict[str, tuple[int, int]],
    k: int = 4096,
    max_passes: int = 12,
) -> list[dict]:
    """Exact percentile_disc (least value whose cume_dist >= p) for an
    integer-valued column, via iterative k-ary range refinement.

    ``probs`` maps label -> (numerator, denominator); ranks are
    ``ceil(num * N / den)`` in EXACT integer arithmetic (a float
    ``ceil(p * N)`` is an off-by-one hazard: 0.9 * N computed in
    doubles can land an ulp above the true product and ceil past it).

    Returns one dict per entry of ``probs``: {label, prob, rank, value}.
    Driver memory is O(k * |probs|); every pass is one scan of ``df``.
    """
    v = value.alias("v")
    base = df.select(v)
    first = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()[0]
    n, lo0, hi0 = first["n"], first["lo"], first["hi"]
    if n == 0:
        return []

    def rank_of(num: int, den: int) -> int:
        return max(1, (num * n + den - 1) // den)

    ranges = [
        _Range(i, label, rank_of(*nd), lo0, hi0)
        for i, (label, nd) in enumerate(sorted(probs.items()))
    ]
    for _ in range(max_passes):
        active = [r for r in ranges if r.lo < r.hi]
        if not active:
            break
        widths = {r.idx: max(1, -(-(r.hi - r.lo + 1) // k)) for r in active}
        # one shared scan: every active quantile contributes a
        # (quantile-idx, bucket) pair where its range covers the row
        pairs = F.array(
            *[
                F.when(
                    F.col("v").between(r.lo, r.hi),
                    F.struct(
                        F.lit(r.idx).alias("qi"),
                        ((F.col("v") - F.lit(r.lo)) / F.lit(widths[r.idx]))
                        .cast("long")
                        .alias("b"),
                    ),
                )
                for r in active
            ]
        )
        counts = (
            base.select(F.explode(pairs).alias("p"))
            .filter(F.col("p").isNotNull())
            .groupBy(F.col("p.qi").alias("qi"), F.col("p.b").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_q: dict[int, dict[int, int]] = {}
        for row in counts:
            by_q.setdefault(row["qi"], {})[row["b"]] = row["c"]
        for r in active:
            width = widths[r.idx]
            cum = 0
            for b in sorted(by_q.get(r.idx, {})):
                c = by_q[r.idx][b]
                if cum + c >= r.rank:
                    r.rank -= cum
                    r.lo = r.lo + b * width
                    r.hi = min(r.hi, r.lo + width - 1)
                    break
                cum += c
            else:  # pragma: no cover — rank beyond range means a bug
                raise RuntimeError(f"rank {r.rank} not found in [{r.lo},{r.hi}]")
    leftover = [r for r in ranges if r.lo < r.hi]
    if leftover:  # pragma: no cover
        raise RuntimeError(f"did not converge in {max_passes} passes")
    return [
        {
            "label": r.label,
            "prob": probs[r.label][0] / probs[r.label][1],
            "rank": rank_of(*probs[r.label]),
            "value": r.lo,
        }
        for r in ranges
    ]

# ---------------------------------------------------------------------------
# One-pass MERGEABLE quantile summary (the KLL-style sketch half of the
# estimator pair; multipass_quantile above is the exact-iterative half).
# ---------------------------------------------------------------------------


def stride_summary(
    df: DataFrame,
    value: Column,
    id_col: Column,
    n_buckets: int = 64,
    k: int = 128,
) -> DataFrame:
    """One-pass bounded-state quantile summary: deterministic stride
    sampling by LOCAL rank within ``n_buckets`` hash buckets.

    Each bucket (``pmod(id, n_buckets)`` — a deterministic stand-in for
    "one summary per partition/executor") keeps every ``step``-th item
    of its sorted run, ``step = ceil(n_b / k)``, carrying weight
    ``min(step, n_b - rank + 1)`` so bucket weights sum EXACTLY to
    ``n_b``. The union of bucket samples is a mergeable summary of
    ≤ ``n_buckets·k`` weighted rows whose weighted-rank lookup has
    additive rank error ≤ Σ_b (step_b − 1) ≈ N/k — the classic
    mergeable-summary ε = 1/k guarantee, but with DETERMINISTIC
    compaction (rank stride, not KLL's coin-flip), which is what makes
    it bit-reproducible and oracle-checkable across engines.

    Merging more summaries = unioning more bucket samples — no
    re-sampling pass — so at 100 TB each executor summarizes its split
    independently and only ≤ n_buckets·k rows ever move.

    Returns columns ``v`` (value), ``b`` (bucket), ``rn`` (local rank),
    ``step``, ``w`` (weight).
    """
    c = df.select(
        value.alias("v"),
        id_col.alias("id"),
        F.pmod(id_col, F.lit(n_buckets)).alias("b"),
    )
    w_rank = Window.partitionBy("b").orderBy("v", "id")
    w_cnt = Window.partitionBy("b")
    ranked = c.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n_b", F.count(F.lit(1)).over(w_cnt)
    )
    stepped = ranked.withColumn(
        "step", F.floor((F.col("n_b") + F.lit(k - 1)) / F.lit(k)).cast("long")
    )
    return stepped.filter((F.col("rn") - 1) % F.col("step") == 0).select(
        "v",
        "b",
        "rn",
        "step",
        F.least(F.col("step"), F.col("n_b") - F.col("rn") + 1).alias("w"),
    )


def level_counts(
    base: DataFrame, group_cols: list[str], l_max: int = 20
) -> DataFrame:
    """Retained-set sizes of a hash-level sample at every level.

    ``base`` must carry a well-mixed non-negative integer hash column
    ``h`` (one per item — e.g. ``operators.sketch.hll_hash`` of the
    item id). An item belongs to the level-``ℓ`` sample iff
    ``h % 2^ℓ == 0`` — i.e. its trailing-zero count is ≥ ℓ — so the
    level-ℓ sample is a deterministic ~1/2^ℓ subsample and the samples
    are NESTED (level ℓ+1 ⊂ level ℓ). This is KLL's coin flip
    de-randomized: the "coin" is a bit of the item's own hash, which is
    what makes the sketch a pure FUNCTION OF THE SET — independent of
    row order, partitioning, or arrival batching — and therefore
    associatively mergeable with bit-exact merge = single-pass.

    Returns one row per (group..., lvl) with the retained count
    ``cnt``; computed as ``l_max+1`` conditional sums inside ONE
    map-side-combined aggregate (no row explosion), so the shuffle
    carries |groups|·1 rows of l_max+1 longs.
    """
    aggs = [
        F.sum((F.col("h") % F.lit(1 << lv) == 0).cast("long")).alias(f"c{lv}")
        for lv in range(l_max + 1)
    ]
    wide = base.groupBy(*group_cols).agg(*aggs)
    stack = (
        f"stack({l_max + 1}, "
        + ", ".join(f"{lv}, c{lv}" for lv in range(l_max + 1))
        + ") as (lvl, cnt)"
    )
    return wide.select(*group_cols, F.expr(stack))


def level_sample_retained(base: DataFrame, level_df: DataFrame) -> DataFrame:
    """Filter ``base`` to the level sample at the (single-row,
    broadcastable) compaction level ``level_df`` — column ``lvl``.
    The filter is the per-item predicate ``h % 2^lvl == 0``; at scale
    it runs map-side on every partition independently."""
    return base.crossJoin(F.broadcast(level_df)).filter(
        F.col("h") % F.expr("shiftleft(CAST(1 AS BIGINT), lvl)") == 0
    )


def summary_quantiles(
    summary: DataFrame, probs: dict[str, tuple[int, int]]
) -> DataFrame:
    """Weighted-rank quantile lookup over a :func:`stride_summary`.

    ``probs`` maps label -> (num, den); the target rank is the exact
    integer ``ceil(num·N/den)`` where ``N = Σw`` (the summary's weights
    reconstruct the population count exactly, so no extra scan of the
    base table is needed). The estimate for a rank is the first summary
    value whose cumulative weight reaches it, under the total order
    (v, b, rn). The cumulative window is single-partition by
    construction — the summary is ≤ n_buckets·k rows of sketch
    metadata, not data.
    """
    spark = summary.sparkSession
    n = summary.agg(F.sum("w")).collect()[0][0] or 0
    rows = [
        (label, num / den, max(1, (num * n + den - 1) // den))
        for label, (num, den) in sorted(probs.items())
    ]
    targets = spark.createDataFrame(
        rows, schema="label string, prob double, rank bigint"
    )
    w_cum = Window.orderBy("v", "b", "rn").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = summary.withColumn("cw", F.sum("w").over(w_cum))
    return (
        F.broadcast(targets)
        .join(cum, F.col("cw") >= F.col("rank"))
        .groupBy("label", "prob", "rank")
        .agg(F.min("v").alias("est"))
    )
