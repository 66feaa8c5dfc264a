"""Bucketed co-located joins: the 100 TB strategy SCALE.md prescribes
for the fact⋈fact leg (orders⋈lineitem on orderkey) — write both sides
bucketed on the join key, and the sort-merge join runs WITHOUT any
exchange (shuffle) on either side."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_small):
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_demo")
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    for name, df, key in (("orders_b", o, "o_orderkey"), ("lineitem_b", li, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS bucket_demo.{name}")
        (
            df.write.format("parquet")
            .bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"bucket_demo.{name}")
        )
    yield "bucket_demo"
    spark.sql("DROP DATABASE IF EXISTS bucket_demo CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    o = spark.table("bucket_demo.orders_b")
    li = spark.table("bucket_demo.lineitem_b")
    # force the shuffle-based join path: at test scale the small side
    # would broadcast (also shuffle-free, but not what we're proving)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_section = plan.split("HashAggregate")[-1]  # below the agg: the join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # co-located buckets: NO exchange feeds the join (the only exchange
    # allowed is the one the aggregation itself needs above the join)
    assert "Exchange" not in join_section, join_section[:500]

    # and the result is still correct
    expected = (
        spark.table("bucket_demo.lineitem_b")
        .join(spark.table("bucket_demo.orders_b").hint("broadcast"),
              spark.table("bucket_demo.lineitem_b").l_orderkey
              == spark.table("bucket_demo.orders_b").o_orderkey)
        .count()
    )
    assert joined.agg({"count": "sum"}).collect()[0][0] == expected
