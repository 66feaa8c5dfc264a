"""Property tests for the round-2 continuation estimators: mergeable
quantile sketch, priority sampling, DBSCAN roles, JL projection, int8
quantization, and the interval-join grain rewrite (vs the naive theta
join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_project_spark.operators.quantiles import (
    stride_summary,
    summary_quantiles,
)
from data_integration_project_spark.operators.sampling import priority_sample

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_stride_summary_reconstructs_n_and_bounds_rank_error(spark):
    o = _orders(spark)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    summ = stride_summary(o, cents, F.col("o_orderkey"), n_buckets=16, k=32)
    rows = summ.collect()
    n = o.count()
    assert sum(r["w"] for r in rows) == n  # weights reconstruct N exactly
    # additive rank error bound: estimate's true rank within sum(step-1)
    steps = {r["b"]: r["step"] for r in rows}
    err_bound = sum(s - 1 for s in steps.values())
    est = summary_quantiles(summ, {"p50": (1, 2), "p90": (9, 10)}).collect()
    values = sorted(
        r[0] for r in o.select(cents.alias("v")).collect()
    )
    for r in est:
        true_rank_le = sum(1 for v in values if v <= r["est"])
        # two-sided: the weighted-rank lookup can land up to err_bound
        # ranks on either side of the target
        assert abs(true_rank_le - r["rank"]) <= err_bound, (
            r,
            true_rank_le,
            err_bound,
        )


def test_priority_sample_deterministic_and_dominates_weights(spark):
    o = _orders(spark)
    s1 = priority_sample(o, "o_orderkey", F.col("o_totalprice"), k=20)
    s2 = priority_sample(
        o.repartition(7), "o_orderkey", F.col("o_totalprice"), k=20
    )
    set1 = {(r["key"], r["w_hat"]) for r in s1.collect()}
    set2 = {(r["key"], r["w_hat"]) for r in s2.collect()}
    assert set1 == set2  # partitioning-independent selection
    assert len(set1) == 20
    for r in s1.collect():
        assert r["w_hat"] >= r["w"]  # estimator dominates the weight
        assert r["priority"] >= r["tau"]  # sampled = above threshold


def test_dbscan_planted_star_roles(spark):
    from data_integration_project_spark import plans

    out = plans.REGISTRY["embeddings_dbscan"].fn(spark, SF).collect()
    clusters = [r for r in out if r["cluster_rep"] != -1]
    noise = [r for r in out if r["cluster_rep"] == -1]
    assert len(clusters) >= 40  # ~50 planted stars survive SRP recall
    for c in clusters:
        assert c["n_core"] == 1 and 1 <= c["n_border"] <= 3, c
    assert noise and noise[0]["n_noise"] >= 150  # pairs + singletons


def test_jl_projection_distortion_bounded(spark):
    from data_integration_project_spark import plans

    out = plans.REGISTRY["embeddings_jl_projection"].fn(spark, SF).collect()
    assert out
    for r in out:
        assert 0.2 < r["distortion"] < 3.0, r  # k=16 JL keeps same order


def test_int8_quantization_error_bound(spark):
    from data_integration_project_spark import plans

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    # half a quantization step of the widest dimension bounds max error
    stats = (
        e.select(F.posexplode("embedding").alias("p", "x"))
        .groupBy("p")
        .agg((F.max("x") - F.min("x")).alias("rng"))
        .agg(F.max("rng"))
        .collect()[0][0]
    )
    bound = float(stats) / 255.0 / 2.0 * 1.0000001
    out = plans.REGISTRY["embeddings_int8_quantization"].fn(spark, SF)
    worst = out.agg(F.max("max_abs_err")).collect()[0][0]
    assert worst <= bound, (worst, bound)


def test_interval_join_grain_rewrite_matches_naive_theta_join(spark):
    from data_integration_project_spark import plans

    ev = spark.read.parquet(f"{SF}/events.parquet")
    win = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("we"),
    )
    naive = (
        win.join(
            ev.select("ts"),
            (F.col("ts") >= F.col("ws")) & (F.col("ts") < F.col("we")),
        )
        .groupBy("window_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    fast = plans.REGISTRY["events_interval_join"].fn(spark, SF).select(
        "window_id", "n_events"
    )
    n_rows = {
        (r["window_id"], r["n_events"]) for r in naive.collect()
    }
    f_rows = {(r["window_id"], r["n_events"]) for r in fast.collect()}
    assert n_rows == f_rows


def test_multiprobe_recall_beats_single_probe(spark):
    from data_integration_project_spark.operators import similarity as S

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = e.filter("vec_id % 50 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.brute_force_topk(q, e, "vec_id", "embedding", k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in S.srp_bucketed_topk(
            q, e, "vec_id", "embedding", k=5, n_planes=4, n_tables=3
        ).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in S.srp_multiprobe_topk(
            q, e, "vec_id", "embedding", k=5, n_planes=4, n_tables=3
        ).collect()
    }
    r_single = len(single & exact) / len(exact)
    r_multi = len(multi & exact) / len(exact)
    assert r_multi >= r_single, (r_single, r_multi)
