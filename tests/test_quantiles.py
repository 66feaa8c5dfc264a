"""multipass_quantile must equal the sorted-order statistic exactly,
including ties, tiny k (many passes), and rational rank edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_project_spark.operators.quantiles import multipass_quantile


def _expected(vals: list[int], num: int, den: int) -> int:
    rank = max(1, (num * len(vals) + den - 1) // den)
    return sorted(vals)[rank - 1]


def test_multipass_matches_sorted_rank(spark):
    vals = [7, 7, 7, 1, 3, 9, 1000000, -5, 3, 3, 42, 42, 0, 999999, 8]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    probs = {"p10": (1, 10), "p50": (1, 2), "p90": (9, 10), "p100": (1, 1)}
    # k=4 forces many refinement passes over the 1e6-wide domain
    res = {r["label"]: r for r in multipass_quantile(df, F.col("x"), probs, k=4)}
    for label, (num, den) in probs.items():
        assert res[label]["value"] == _expected(vals, num, den), label
        assert res[label]["rank"] == max(1, (num * len(vals) + den - 1) // den)


def test_multipass_single_value_and_empty(spark):
    one = spark.createDataFrame([(5,)], ["x"])
    res = multipass_quantile(one, F.col("x"), {"p50": (1, 2)})
    assert res == [{"label": "p50", "prob": 0.5, "rank": 1, "value": 5}]
    empty = one.filter(F.col("x") > 100)
    assert multipass_quantile(empty, F.col("x"), {"p50": (1, 2)}) == []


def _kll_sketch(spark, ids, cap):
    """Reference single-pass level sketch over a set of ids: the
    shallowest hash level whose sample fits, plus the retained ids."""
    from data_integration_project_spark.operators.quantiles import (
        level_counts,
        level_sample_retained,
    )
    from data_integration_project_spark.operators.sketch import hll_hash

    base = spark.createDataFrame([(i,) for i in ids], ["id"]).select(
        "id", hll_hash(F.col("id")).alias("h"), F.lit(0).alias("g")
    )
    counts = level_counts(base, ["g"], l_max=12)
    lvl = (
        counts.filter(F.col("cnt") <= cap)
        .agg(F.min("lvl").cast("int").alias("lvl"))
    )
    level = lvl.collect()[0]["lvl"]
    kept = sorted(
        r["id"] for r in level_sample_retained(base, lvl).collect()
    )
    return level, kept


def test_level_sketch_merge_is_shard_invariant(spark):
    """The associativity statement behind orders_kll_quantiles: the
    level sketch is a pure function of the SET, so merging per-shard
    sketches (union at max shard level, raise until it fits) gives the
    single-pass sketch bit-exactly — under ANY sharding."""
    from data_integration_project_spark.operators.quantiles import (
        level_counts,
        level_sample_retained,
    )
    from data_integration_project_spark.operators.sketch import hll_hash

    ids = list(range(1, 401))
    cap = 24
    level_1pass, kept_1pass = _kll_sketch(spark, ids, cap)
    assert 0 < len(kept_1pass) <= cap
    for n_shards in (2, 3, 8):
        base = spark.createDataFrame([(i,) for i in ids], ["id"]).select(
            "id",
            hll_hash(F.col("id")).alias("h"),
            (F.col("id") % n_shards).alias("shard"),
        )
        sc = level_counts(base, ["shard"], l_max=12)
        shard_l = (
            sc.filter(F.col("cnt") <= cap)
            .groupBy("shard")
            .agg(F.min("lvl").alias("l_s"))
        )
        union_ret = base.join(F.broadcast(shard_l), "shard").filter(
            F.col("h") % F.expr("shiftleft(CAST(1 AS BIGINT), l_s)") == 0
        )
        lm0 = shard_l.agg(F.max("l_s").alias("lm0"))
        lstar = (
            sc.groupBy("lvl")
            .agg(F.sum("cnt").alias("cnt"))
            .crossJoin(F.broadcast(lm0))
            .filter((F.col("cnt") <= cap) & (F.col("lvl") >= F.col("lm0")))
            .agg(F.min("lvl").cast("int").alias("lvl"))
        )
        assert lstar.collect()[0]["lvl"] == level_1pass, n_shards
        kept = sorted(
            r["id"]
            for r in level_sample_retained(union_ret, lstar).collect()
        )
        assert kept == kept_1pass, n_shards
