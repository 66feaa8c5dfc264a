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
