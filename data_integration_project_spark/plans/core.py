"""Core relational queries: scans, aggregations, joins, sorts, set ops.

These cover the reference's aggregation/sort/join operator classes
(SURVEY.md §2.5-§2.8: A1/A5-A7, O1-O3, J1-J3, U1-U2) expressed over the
driver's TPC-H-ish tables. Dims are broadcast explicitly; everything
else is left to Catalyst/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SQL_DMEAN, SQL_DSUM, dmean, dsum, query, t

# ---------------------------------------------------------------------------
# q1_pricing_summary — the flagship. TPC-H-Q1-shaped scan+agg on lineitem:
# grouped conditional aggregation with derived measures (reference A1/A6/A7,
# sql/create_merged_views.sql:172-203 + sql/create_dwh_tables.sql:147-150).
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {SQL_DSUM('l_quantity', 'sum_qty', 2)},
      {SQL_DSUM('l_extendedprice', 'sum_base_price', 2)},
      {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
      {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
      {SQL_DMEAN('l_quantity', 'avg_qty', 2)},
      {SQL_DMEAN('l_extendedprice', 'avg_price', 2)},
      {SQL_DMEAN('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: 2-key groupBy, 8 aggregates, date filter.

    The filter is pushed into the parquet scan; partial aggregation
    (map-side combine) happens before the single shuffle on the two
    low-cardinality group keys, so the shuffle moves only
    |groups|×|partitions| rows regardless of input scale.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty", 2),
            dsum(F.col("l_extendedprice"), "sum_base_price", 2),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            dmean(F.col("l_quantity"), "avg_qty", 2),
            dmean(F.col("l_extendedprice"), "avg_price", 2),
            dmean(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A1: conditional aggregation (SUM(CASE WHEN ...)) per merged view
# (sql/create_merged_views.sql:172-203).
# ---------------------------------------------------------------------------


@query(
    "orders_status_report",
    oracle=f"""
    SELECT
      o_orderpriority,
      COUNT(*) AS total_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_orders,
      {SQL_DSUM('o_totalprice', 'total_value', 2)}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_status_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count + conditional sums per group (reference A1 report shape)."""
    o = t(spark, sf_dir, "orders")
    flag = lambda v: F.sum(F.when(F.col("o_orderstatus") == v, 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("total_orders"),
        flag("F").alias("finished_orders"),
        flag("O").alias("open_orders"),
        flag("P").alias("partial_orders"),
        dsum(F.col("o_totalprice"), "total_value", 2),
    )


# ---------------------------------------------------------------------------
# O1: TOP-N with total order (sql/create_merged_views.sql:211-212).
# ---------------------------------------------------------------------------


@query(
    "top10_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def top10_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP 10 ... ORDER BY — with a key tie-breaker so the selected set
    is deterministic under any partitioning (TakeOrderedAndProject)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J3: star-schema FK joins — fact ⋈ small dims, dims broadcast
# (sql/create_dwh_tables.sql:138-173).
# ---------------------------------------------------------------------------


@query(
    "star_revenue_by_region",
    oracle=f"""
    SELECT
      r.r_name AS region_name,
      COUNT(*) AS line_count,
      {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def star_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: the fact shuffles once on o_orderkey; customer/nation/
    region are broadcast so no additional fact shuffles occur. At 100 TB
    the orders⋈lineitem join should instead be co-partitioned (bucketed)
    on orderkey; the dim side stays broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A7: order-line fact measures (thanh_tien = qty × unit price) rolled up
# per order (sql/create_dwh_tables.sql:147-150), with a HAVING-style
# post-aggregation filter.
# ---------------------------------------------------------------------------


@query(
    "order_line_value",
    oracle=f"""
    SELECT
      l_orderkey,
      COUNT(*) AS n_lines,
      {SQL_DSUM('l_quantity', 'total_qty', 2)},
      {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'order_value')}
    FROM lineitem
    GROUP BY l_orderkey
    HAVING COUNT(*) >= 4
    """,
)
def order_line_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line rollup with post-aggregation filter (HAVING)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(F.col("l_quantity"), "total_qty", 2),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "order_value",
            ),
        )
        .filter(F.col("n_lines") >= 4)
    )


# ---------------------------------------------------------------------------
# Semi-join / EXISTS (J-class extension): orders having at least one
# late line — the correlated-subquery shape, executed as a left-semi
# hash join (one pass each side, no duplicate inflation).
# ---------------------------------------------------------------------------


@query(
    "orders_with_late_lines",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_late_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def orders_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: orders with ≥1 line shipped more
    than 90 days after the order date, counted per priority. The semi
    join emits each order at most once (no fan-out, unlike inner join +
    distinct) and the ship-date predicate is evaluated join-side."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


# ---------------------------------------------------------------------------
# Exact distribution statistics (extension beyond the reference's
# SUM/COUNT-only aggregate surface): percentiles with linear
# interpolation — Spark 4's exact `percentile` ≡ DuckDB quantile_cont.
# ---------------------------------------------------------------------------


@query(
    "orders_price_quantiles",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS median,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def orders_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantiles per priority class (linear interpolation, both
    engines; 4-dp rounding absorbs last-ulp interpolation ordering).
    At 100 TB swap `percentile` for `approx_percentile` — same plan
    shape, sketch-mergeable, no global sort."""
    o = t(spark, sf_dir, "orders")
    q = lambda p: F.round(F.percentile(F.col("o_totalprice"), F.lit(p)), 4)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        q(0.25).alias("p25"),
        q(0.50).alias("median"),
        q(0.95).alias("p95"),
    )


# ---------------------------------------------------------------------------
# Supplier-side rollup (nguyen_lieu supplier analogue, SURVEY.md §7
# entity mapping): dim join + grouped stats with a HAVING filter.
# ---------------------------------------------------------------------------


@query(
    "supplier_balance_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           COUNT(*) AS n_suppliers,
           {SQL_DSUM('s.s_acctbal', 'total_acctbal', 2)},
           {SQL_DMEAN('s.s_acctbal', 'avg_acctbal', 2)}
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    HAVING COUNT(*) >= 2
    """,
)
def supplier_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier account rollup per nation (broadcast dim join, exact-
    decimal sums, post-aggregation filter) — the supplier-side summary
    the reference's nguyen_lieu reporting implies."""
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum(F.col("s_acctbal"), "total_acctbal", 2),
            dmean(F.col("s_acctbal"), "avg_acctbal", 2),
        )
        .filter(F.col("n_suppliers") >= 2)
    )


# ---------------------------------------------------------------------------
# A5 / S6 analogue: catalog-style row-count introspection across tables
# (database_factory.get_table_info / read_all_tables, U2 union of stat rows).
# ---------------------------------------------------------------------------


@query(
    "table_row_counts",
    oracle="""
    SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM customer
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'region', COUNT(*) FROM region
    """,
)
def table_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog introspection: COUNT(*) per table, unioned into one report
    (reference S6/A5 + U2). Parquet count(*) reads footer metadata only."""
    names = ["customer", "orders", "lineitem", "part", "supplier", "nation", "region"]
    out = None
    for name in names:
        one = (
            t(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(F.lit(name).alias("table_name"), "n_rows")
        )
        out = one if out is None else out.unionByName(one)
    return out


# ---------------------------------------------------------------------------
# TPC-H classic join shapes (Q3 / Q5): the canonical shuffle-vs-broadcast
# benchmark plans, included so the relational surface covers the two most
# cited multi-join analytics patterns.
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate, COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): revenue of unshipped orders for one
    market segment. Physical shape to want at 100 TB: both date filters
    push to the parquet scans, the segment filter shrinks customer to a
    broadcastable dim (so orders never shuffles for it), lineitem joins
    orders on the shared orderkey (the one unavoidable shuffle — or zero
    with orderkey bucketing), and the top-10 is TakeOrderedAndProject,
    never a global sort. Tie-break on orderkey keeps the LIMIT edge
    deterministic."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select("l_orderkey", "revenue", "o_orderdate", "n_lines")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue where the SUPPLIER and
    the CUSTOMER share a nation — the semi-cyclic join (supplier joins
    lineitem on suppkey AND customer on nationkey) that defeats naive
    star planning. Spark-first shape: the only big-big join is
    lineitem⋈orders on orderkey; customer, supplier, nation, region are
    all broadcast, and the cross-branch nationkey equality lands as a
    broadcast-join predicate — the fact is shuffled exactly once.
    Date range prunes the orders scan before its join."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
