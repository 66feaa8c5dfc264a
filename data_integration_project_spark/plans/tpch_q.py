"""TPC-H remainder: every classic TPC-H query shape expressible on the
fixture's schema (no ``partsupp`` table — Q2/Q11 and the supply-cost
legs of Q9/Q16/Q20 are adapted to ``p_retailprice`` / lineitem-derived
supplier sets, noted per query). Together with the existing
q1/q3/q5/q7/q14/q18 this completes the standard multi-join /
correlated-subquery / disjunctive-predicate benchmark surface the
reference's SQL layer (coffee_etl_clean/sql/create_merged_views.sql,
create_dwh_tables.sql) exercises piecemeal.

House determinism rules apply throughout: money through the exact
decimal pattern (catalog.dsum), ratios as one double division of exact
operands, LIMIT always under a total order, and row-INCLUSION
predicates that involve averages rewritten in integer cents
(``5·q·n < Σq`` instead of ``q < 0.2·avg``) so no float tie can flip a
row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, dsum, query, t


def _cents(col):
    """Exact integer cents of a DOUBLE money/quantity column —
    floor(x*100+0.5) matches DuckDB CAST rounding (Spark's long cast
    truncates; see ROADMAP float-determinism case law)."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: the pure scan-filter-aggregate probe.
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue that would be gained by eliminating discounts
    in a band — a single filtered scan + global aggregate, the purest
    predicate-pushdown probe in the suite. All three predicates reach
    the parquet reader (PushedFilters on shipdate/discount/quantity);
    the aggregate is map-side partial, so the shuffle carries one row
    per partition. At 100 TB this is I/O-bound by min/max rowgroup
    skipping — exactly what the date filter enables."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 4),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: two nation legs, conditional share ratio.
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle="""
    WITH all_nations AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM part, lineitem, orders, customer, supplier,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_3's share of the ASIA market for STANDARD
    parts, by order year. Two independent nation legs (customer side
    restricted to the region, supplier side only labeling) and a
    conditional-share ratio computed as one double division of two
    exact decimal sums.

    Scale shape: lineitem is date-restricted via the orders join
    (the 100 TB side shuffles once on orderkey); part, customer,
    supplier, both nation legs and region all broadcast. The
    customer⋈nation⋈region reduction happens before the fact join, so
    non-ASIA customers never reach the shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_region = (
        c.join(
            F.broadcast(
                n.join(
                    F.broadcast(r), n.n_regionkey == r.r_regionkey
                ).select("n_nationkey")
            ),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    joined = (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    )
    agg = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
        ).alias("_n"),
        F.sum(vol).alias("_t"),
    )
    return agg.select(
        "o_year",
        F.col("_n").cast("double").alias("nation_volume"),
        F.col("_t").cast("double").alias("total_volume"),
        (F.col("_n").cast("double") / F.col("_t").cast("double")).alias(
            "mkt_share"
        ),
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (supply cost adapted to p_retailprice: the
# fixture has no partsupp, so unit cost = 60% of retail price).
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity
                    AS DECIMAL(18,4))) AS DOUBLE) AS profit
    FROM part, lineitem, orders, supplier, nation
    WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue: profit on 'red' parts by supplier nation
    and year. The fixture has no partsupp, so ps_supplycost is adapted
    to 0.6·p_retailprice (noted; the join/aggregate shape — a LIKE
    part filter driving a five-table join with a derived measure — is
    what Q9 exercises). The per-row profit expression is cast to
    decimal BEFORE summing so the sum is order-free.

    Scale shape: the %green% filter reduces part ~1/|colors| before
    broadcast; lineitem shuffles once on orderkey; supplier/nation
    broadcast."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: top-20 customers by returned revenue.
# ---------------------------------------------------------------------------


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name AS nation,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue', 4)}
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate < DATE '1996-04-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers who returned the most revenue in
    1996Q1 — join + group + top-N. The ORDER BY carries a c_custkey
    tie-break so the selected set is deterministic under any
    partitioning (revenue ties are real at small SF). Revenue ordering
    compares the exact decimal-derived doubles, identical both sides.

    Scale shape: the returnflag + date filters prune lineitem/orders
    before the fact⋈fact shuffle on orderkey; customer joins on the
    aggregated (one row per customer) side, then TakeOrderedAndProject
    keeps only 20 rows on the driver."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("_rev")
        )
    )
    return (
        per_cust.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            F.col("_rev").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 — shipping-delay priority split (shipmode adapted to returnflag:
# the fixture has no l_shipmode/commitdate/receiptdate, so "late" =
# shipped >90 days after order date, grouped by return flag).
# ---------------------------------------------------------------------------


@query(
    "q12_late_priority_split",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q12_late_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: late lines (shipped >90 days after order
    date — the fixture's lateness signal; no commit/receipt dates) in
    1996, split into high- vs low-priority counts per return flag.
    The join-side lateness predicate needs both tables' columns, so it
    evaluates inside the join; the shipdate year range still pushes to
    the scan.

    Scale shape: one orderkey shuffle; conditional counts are map-side
    partial; BIGINT casts keep the DuckDB HUGEINT hash artifact away."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (comment-regex exclusion
# adapted to a priority exclusion).
# ---------------------------------------------------------------------------


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, … qualifying
    orders — the double-aggregate over a LEFT OUTER join whose filter
    must live in the JOIN CONDITION (in WHERE it would turn the outer
    join inner and silently drop the 0-order customers, the
    distribution's most important bucket). COUNT(o_orderkey) counts
    non-NULL keys only, so unmatched customers land in c_count=0.

    Scale shape: both aggregations are map-side partial; the first
    shuffles on custkey (the join's own key — AQE coalesces), the
    second on |distinct counts| ≈ tiny."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (revenue view + scalar-max selection).
# ---------------------------------------------------------------------------


@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier, revenue0
    WHERE s_suppkey = supplier_no
      AND total_rev = (SELECT MAX(total_rev) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue in 1996Q1 —
    the shared-view + scalar-subquery-max shape. The max is compared
    on the EXACT decimal revenue (not the double projection), so
    equality can't be lost to rounding; all qualifying suppliers
    return (ties included), ordered by key.

    Scale shape: one suppkey shuffle builds the revenue view; the max
    is a tiny all-to-one aggregate joined back as a broadcast scalar
    (Catalyst turns the = (SELECT MAX…) into a broadcast filter);
    supplier broadcasts onto the surviving handful of rows."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (partsupp adapted to the
# suppliers observed shipping the part in lineitem).
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 500
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct suppliers able to supply each
    (brand, type, size) bucket — partsupp adapted to "suppliers
    observed shipping the part" (lineitem⋈part), and the
    comment-complaints exclusion to a low-balance supplier NOT IN.
    s_suppkey is non-NULL in the fixture so NOT IN ≡ anti-join here
    (the NULL-key semantics are exercised separately by
    reconcile_not_in_null_keys).

    Scale shape: the part filter broadcasts; the excluded-supplier set
    is tiny and broadcast as a left-anti; COUNT(DISTINCT) shuffles on
    the group key with the distinct expand — bounded by
    |brand×type×size| groups."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 500
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average; the
# inclusion predicate is exact-integer so no float tie can flip a row).
# ---------------------------------------------------------------------------


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH qual AS (
      SELECT l_partkey,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q_c,
             l_extendedprice
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size <= 10
    ),
    stats AS (
      SELECT l_partkey AS pk,
             CAST(SUM(q_c) AS BIGINT) AS sum_qc,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM qual GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_small_lines
    FROM qual, stats
    WHERE l_partkey = pk AND 5 * q_c * n < sum_qc
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders of Brand#3
    small parts — the correlated per-part-average inclusion test.
    ``l_quantity < 0.2 * avg(l_quantity)`` is rewritten in integer
    cents as ``5·q·n < Σq`` (container predicate adapted to p_size ≤
    10): both engines evaluate the same integer comparison, so a line
    sitting exactly on the 20% boundary can't be included by one
    engine and excluded by the other.

    Scale shape: Catalyst evaluates this as one partkey-shuffled
    aggregate joined back to the qualifying lines (both sides already
    partitioned by partkey — no extra shuffle); part's brand/size
    filter broadcasts into the scan."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    qual = li.join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "l_partkey",
        _cents(F.col("l_quantity")).alias("q_c"),
        "l_extendedprice",
    )
    stats = qual.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("q_c").alias("sum_qc"), F.count(F.lit(1)).alias("n")
    )
    small = qual.join(stats, F.col("l_partkey") == F.col("pk")).filter(
        5 * F.col("q_c") * F.col("n") < F.col("sum_qc")
    )
    return small.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under a disjunction of conjunctive branches.
# ---------------------------------------------------------------------------


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND (
        (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30)
        OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30)
      )
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from an OR of brand/size/quantity
    conjunctions — the disjunctive join-predicate shape (Brand#34
    doesn't exist in the 25-brand fixture; Brand#15 keeps the branch
    non-empty). The quantity legs refer only to lineitem and the
    brand/size legs only to part, so the optimizer can derive a
    residual pushable filter per side (quantity ∈ [1,30] on lineitem,
    brand ∈ {…} on part) while the cross-table disjunction evaluates
    post-join.

    Scale shape: part (filtered to the union of the branches'
    brands/sizes) broadcasts; single scan of lineitem; one-row
    result."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#15")
            & F.col("p_size").between(1, 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers with significant shipped volume of a part class
# (partsupp availability adapted to shipped quantity).
# ---------------------------------------------------------------------------


@query(
    "q20_volume_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS qty_c
      FROM lineitem, part
      WHERE l_partkey = p_partkey AND p_type = 'PROMO'
        AND l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1997-01-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, n_name AS nation, qty_c AS promo_qty_cents
    FROM supplier, nation, shipped
    WHERE s_suppkey = l_suppkey AND s_nationkey = n_nationkey
      AND n_name IN ('NATION_3', 'NATION_7')
      AND qty_c > 50000
    ORDER BY s_suppkey
    """,
)
def q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: suppliers in two nations who shipped more
    than 500 units of PROMO parts in 1996 — partsupp availability
    adapted to shipped volume (same shape: an aggregated-subquery
    threshold gating a supplier semi-join). Quantity sums in exact
    integer cents so the >500 threshold can't wobble.

    Scale shape: part filter broadcasts into the date-pruned lineitem
    scan; one suppkey shuffle; supplier and nation broadcast onto the
    few surviving keys."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    ).select("n_nationkey", "n_name")
    shipped = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_cents(F.col("l_quantity"))).alias("qty_c"))
        .filter(F.col("qty_c") > 50000)
    )
    return (
        shipped.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("qty_c").alias("promo_qty_cents"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS another supplier's
# line, NOT EXISTS another supplier's LATE line (lateness adapted to
# ship-vs-order date).
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, li l1
    WHERE s_suppkey = l1.l_suppkey
      AND l1.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM li l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM li l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late shipper on
    finished multi-supplier orders — the EXISTS + NOT EXISTS double
    correlation (lateness adapted to shipped >90 days after order
    date). Expressed as left-semi (another supplier participated)
    then left-anti (no other supplier was late) on the same derived
    line set; numwait ties broken by name for a deterministic top-20.

    Scale shape: the order-status filter prunes before the orderkey
    shuffle; semi/anti joins reuse the same orderkey partitioning as
    the base join (no extra exchange under AQE); supplier broadcasts
    at the end."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li_all = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate")
    )
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    l1 = li_all.filter(late)
    l2 = li_all.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li_all.filter(late).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: rich-but-inactive customers (phone
# country code adapted to nationkey buckets; exact-integer avg test).
# ---------------------------------------------------------------------------


@query(
    "q22_sales_opportunity",
    oracle="""
    WITH pos AS (
      SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c,
             c_custkey, c_nationkey % 5 AS cntry
      FROM customer WHERE c_acctbal > 0.0
    ),
    avg_bal AS (
      SELECT CAST(SUM(bal_c) AS BIGINT) AS sum_c,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pos
    )
    SELECT cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS totacctbal_cents
    FROM pos, avg_bal
    WHERE cntry IN (0, 1, 3)
      AND bal_c * n > sum_c
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = pos.c_custkey
          AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY cntry
    """,
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balances and
    no RECENT order (every fixture customer has ordered at least once,
    so "never ordered" is adapted to "no order since 2000-01-01" —
    same anti-join shape, non-empty support), bucketed by "country
    code" (phone prefix adapted to ``c_nationkey % 5``). The
    above-average inclusion test is exact integer (``bal·n > Σbal`` in
    cents), and the inactivity leg is the NOT EXISTS anti-join with
    its date predicate INSIDE the subquery; balances aggregate in
    exact cents.

    Scale shape: the scalar average is a tiny broadcast; the anti-join
    shuffles customer (the small fact) against orders' distinct
    custkeys; count/sum map-side partial into ≤5 groups."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0).select(
        _cents(F.col("c_acctbal")).alias("bal_c"),
        "c_custkey",
        (F.col("c_nationkey") % 5).alias("cntry"),
    )
    avg_bal = c.agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("n")
    )
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        c.filter(F.col("cntry").isin(0, 1, 3))
        .join(F.broadcast(avg_bal))
        .filter(F.col("bal_c") * F.col("n") > F.col("sum_c"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_c").alias("totacctbal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Derived partsupp — the fixture has no partsupp table, so Q2/Q11 run on
# a DETERMINISTIC derivation from part x supplier: each part gets 4
# suppliers by the dbgen stride rule (suppkey = (p + i*stride) mod S,
# stride = S/4 + (p-1)/S), with supply cost / avail qty as fixed integer
# hashes of (partkey, suppkey). Both engines derive the same rows from
# the same two dimension tables — no synthesized input files.
# ---------------------------------------------------------------------------

SQL_PARTSUPP = """
WITH sc AS (SELECT COUNT(*) AS c FROM supplier),
partsupp AS (
  SELECT DISTINCT
    p_partkey AS ps_partkey,
    (p_partkey + i.i * (sc.c // 4 + (p_partkey - 1) // sc.c)) % sc.c + 1
      AS ps_suppkey,
    ((p_partkey * 7919
      + ((p_partkey + i.i * (sc.c // 4 + (p_partkey - 1) // sc.c)) % sc.c + 1)
        * 104729) % 90000) + 10000 AS ps_supplycost_cents,
    ((p_partkey * 31
      + ((p_partkey + i.i * (sc.c // 4 + (p_partkey - 1) // sc.c)) % sc.c + 1)
        * 37) % 9999) + 1 AS ps_availqty
  FROM part, (VALUES (0), (1), (2), (3)) AS i(i), sc
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of ``SQL_PARTSUPP``. ``S`` (supplier count) is a
    dimension cardinality — a metadata scalar, not a data collect; at
    100 TB the supplier table is still dimension-sized. The 4-way
    explode keeps everything a projection over ``part`` (no join), and
    DISTINCT guards against stride collisions at small S (stride
    multiples of S/k map two i's to one supplier). The +1 lands keys on
    the REAL supplier domain 1..S (dbgen suppliers are 1-based; without
    it every row hashed to 0 fell out of the Q2/Q11 joins)."""
    s_count = int(t(spark, sf_dir, "supplier").count())
    stride = F.lit(s_count // 4) + F.expr(f"(ps_partkey - 1) div {s_count}")
    suppkey = (F.col("ps_partkey") + F.col("i") * stride) % s_count + 1
    return (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("i"),
        )
        .select(
            "ps_partkey",
            suppkey.alias("ps_suppkey"),
            (
                (F.col("ps_partkey") * 7919 + suppkey * 104729) % 90000 + 10000
            ).alias("ps_supplycost_cents"),
            ((F.col("ps_partkey") * 31 + suppkey * 37) % 9999 + 1).alias(
                "ps_availqty"
            ),
        )
        .distinct()
    )


def _region_partsupp(spark: SparkSession, sf_dir: str, r_name: str) -> DataFrame:
    """partsupp restricted to suppliers in one region — supplier,
    nation, region are all dimensions, so the whole filter side is one
    broadcast; partsupp never shuffles to learn its region."""
    n = t(spark, sf_dir, "nation").join(
        F.broadcast(
            t(spark, sf_dir, "region").filter(F.col("r_name") == r_name)
        ),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return derived_partsupp(spark, sf_dir).join(
        F.broadcast(s.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=SQL_PARTSUPP
    + """
    SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey AS p_partkey,
           p.p_name,
           CAST(ps.ps_supplycost_cents AS DOUBLE) / 100.0 AS ps_supplycost
    FROM partsupp ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
               AND p.p_size <= 10 AND p.p_type = 'PROMO'
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    WHERE ps.ps_supplycost_cents = (
      SELECT MIN(ps2.ps_supplycost_cents) FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                    AND r2.r_name = 'EUROPE'
      WHERE ps2.ps_partkey = ps.ps_partkey)
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: minimum-cost supplier per part within a region, over
    the derived partsupp (see module note). The classic correlated
    MIN subquery decorrelates to a per-part MIN aggregate joined back
    on (partkey, cost) — integer cents make the equality exact.

    Scale shape: supplier/nation/region fold into one broadcast, so
    regional partsupp is a map-side filter of a projection over part;
    the MIN aggregate and its join both hash on ps_partkey (one
    shuffle key, AQE coalesced); the part filter broadcasts. Costs
    stay integer until the final /100 projection."""
    psr = _region_partsupp(spark, sf_dir, "EUROPE")
    min_cost = psr.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("min_cents")
    )
    pf = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "PROMO")
    )
    return (
        psr.join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(pf), F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_name",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias(
                "ps_supplycost"
            ),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q11_important_stock",
    oracle=SQL_PARTSUPP
    + """
    , natps AS (
      SELECT ps.ps_partkey, ps.ps_supplycost_cents * ps.ps_availqty AS v
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    )
    SELECT ps_partkey,
           CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / 100.0 AS stock_value
    FROM natps
    GROUP BY ps_partkey
    HAVING SUM(v) * 1000 > 3 * (SELECT SUM(v) FROM natps)
    ORDER BY stock_value DESC, ps_partkey
    LIMIT 100
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose regional stock value exceeds a fraction
    of the region total, on the derived partsupp. The scalar-subquery
    threshold becomes a broadcast single-row join; the inclusion test
    is exact integer (``value·1000 > 3·total`` in cents — no float
    fraction can flip a row between engines).

    Scale shape: one ps_partkey shuffle for the group sums; the grand
    total is a second pass over the same cached projection reduced to
    one row (broadcast). Values stay int64 — cents·qty ≤ 1e9/row and
    the ×1000 guard stays under 2^63 at SF100k."""
    natps = _region_partsupp(spark, sf_dir, "EUROPE").select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"),
    ).persist()
    # the cache serves exactly two passes (grand total + group sums);
    # the output is ≤100 rows — materialize it (localCheckpoint is
    # GC-collectable, a CacheManager entry is not) and release the
    # cache before returning
    try:
        total = natps.agg(F.sum("v").alias("tot"))
        out = (
            natps.groupBy("ps_partkey")
            .agg(F.sum("v").alias("sv"))
            .join(F.broadcast(total))
            .filter(F.col("sv") * 1000 > F.lit(3) * F.col("tot"))
            .select(
                "ps_partkey",
                (F.col("sv").cast("double") / 100.0).alias("stock_value"),
            )
            .orderBy(F.col("stock_value").desc(), "ps_partkey")
            .limit(100)
            .localCheckpoint()
        )
    finally:
        natps.unpersist()
    return out


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders per priority that had at least one late line
    (shipped >90 days after order date — the fixture's lateness
    signal, as in Q12/Q21). EXISTS decorrelates to a left-semi join
    whose lateness predicate needs both sides, so it evaluates as a
    join condition; the quarter filter on orders pushes to the scan.

    Scale shape: semi join hashes on orderkey (semi joins keep only
    the left row — no fanout from multi-line orders); the ≤5-group
    count is map-side partial. The orders date filter prunes before
    the shuffle on both engines."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "partsupp_fifo_allocation",
    oracle=SQL_PARTSUPP
    + """
    , demand AS (
      SELECT l_partkey AS pk,
             SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS d_centi
      FROM lineitem GROUP BY 1
    ),
    lots AS (
      SELECT ps_partkey, ps_suppkey,
             ps_availqty * 100 AS q_centi,
             SUM(ps_availqty * 100) OVER (
               PARTITION BY ps_partkey ORDER BY ps_suppkey
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM partsupp
    ),
    alloc AS (
      SELECT l.ps_partkey, l.ps_suppkey, l.q_centi,
             greatest(CAST(0 AS BIGINT),
                      least(l.q_centi, d.d_centi - (l.cum - l.q_centi)))
               AS a_centi,
             d.d_centi
      FROM lots l JOIN demand d ON d.pk = l.ps_partkey
    )
    SELECT ps_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_lots,
           CAST(SUM(CASE WHEN a_centi > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lots_touched,
           CAST(SUM(a_centi) AS BIGINT) AS allocated_centi,
           CAST(greatest(MAX(d_centi) - SUM(q_centi), 0) AS BIGINT)
             AS unfilled_centi,
           CAST(SUM(a_centi * ps_suppkey) AS BIGINT) AS alloc_checksum
    FROM alloc GROUP BY ps_partkey
    """,
)
def partsupp_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation — consuming each part's demand against its
    supply lots in first-in order (suppkey as the arrival order on the
    derived partsupp). The sequential-sounding "walk lots until demand
    is met" is pure window math: lot i absorbs
    clamp(D − cum_{i−1}, 0, qty_i) — one running sum, no fold, no
    recursion, which is why it scales as a single partkey-partitioned
    window pass (the ledger/inventory pattern: FIFO cost basis,
    warehouse picking, capacity spillover). Integer centi-units
    throughout; the suppkey-weighted checksum certifies WHICH lots
    were touched, not just how much."""
    demand = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(
                F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
            ).alias("d_centi")
        )
    )
    w = (
        Window.partitionBy("ps_partkey")
        .orderBy("ps_suppkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lots = derived_partsupp(spark, sf_dir).select(
        "ps_partkey",
        "ps_suppkey",
        (F.col("ps_availqty") * 100).alias("q_centi"),
    ).withColumn("cum", F.sum("q_centi").over(w))
    alloc = lots.join(demand, F.col("pk") == F.col("ps_partkey")).withColumn(
        "a_centi",
        F.greatest(
            F.lit(0).cast("long"),
            F.least(
                F.col("q_centi"), F.col("d_centi") - (F.col("cum") - F.col("q_centi"))
            ),
        ),
    )
    return alloc.groupBy("ps_partkey").agg(
        F.count(F.lit(1)).alias("n_lots"),
        F.sum(F.when(F.col("a_centi") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_lots_touched"),
        F.sum("a_centi").cast("long").alias("allocated_centi"),
        F.greatest(
            F.max("d_centi") - F.sum("q_centi"), F.lit(0).cast("long")
        ).alias("unfilled_centi"),
        F.sum(F.col("a_centi") * F.col("ps_suppkey"))
        .cast("long")
        .alias("alloc_checksum"),
    )
