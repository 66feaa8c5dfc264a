"""Merge & reconciliation queries (reference U1-U3, J1-J2, J4, A1).

Dual sources are simulated deterministically from ``customer``: the
"sql" copy diverges on known keys (uppercased names on ``%4==0``,
shifted balances on ``%20==0``), reproducing the cross-source conflict
patterns the reference reconciles in
``sql/create_merged_views.sql:211-235``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import reconcile as R
from .catalog import SQL_DSUM, dsum, query, t

_CSV_SQL_COPIES = """
    WITH csv_src AS (SELECT * FROM customer),
    sql_src AS (
      SELECT
        c_custkey,
        CASE WHEN c_custkey % 4 = 0 THEN upper(c_name) ELSE c_name END AS c_name,
        c_nationkey,
        CASE WHEN c_custkey % 20 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
        c_mktsegment
      FROM customer
    )
"""


def _sql_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        k,
        F.when(k % 4 == 0, F.upper("c_name")).otherwise(F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.when(k % 20 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        "c_mktsegment",
    )


@query(
    "merged_customer_sources",
    oracle=_CSV_SQL_COPIES
    + f"""
    , merged AS (
      SELECT 'csv' AS source, * FROM csv_src
      UNION ALL
      SELECT 'sql' AS source, * FROM sql_src
    )
    SELECT source, COUNT(*) AS n_rows, {SQL_DSUM('c_acctbal', 'total_acctbal', 2)}
    FROM merged GROUP BY source
    """,
)
def merged_customer_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 merged view + A1 per-source verification counts."""
    merged = R.merged_view(
        {"csv": t(spark, sf_dir, "customer"), "sql": _sql_copy(spark, sf_dir)}
    )
    return R.source_counts(merged, dsum(F.col("c_acctbal"), "total_acctbal", 2))


@query(
    "reconcile_conflicts",
    oracle=_CSV_SQL_COPIES
    + """
    SELECT
      c.c_custkey,
      c.c_name AS csv_c_name,
      s.c_name AS sql_c_name,
      c.c_acctbal AS csv_c_acctbal,
      s.c_acctbal AS sql_c_acctbal
    FROM csv_src c JOIN sql_src s ON c.c_custkey = s.c_custkey
    WHERE c.c_name IS DISTINCT FROM s.c_name
       OR c.c_acctbal IS DISTINCT FROM s.c_acctbal
    """,
)
def reconcile_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: cross-source conflicting records
    (create_merged_views.sql:215-225), NULL-safe comparison."""
    return R.conflicting_records(
        t(spark, sf_dir, "customer"),
        _sql_copy(spark, sf_dir),
        "c_custkey",
        ["c_name", "c_acctbal"],
    )


@query(
    "reconcile_only_in_source",
    oracle="""
    WITH csv_src AS (SELECT * FROM customer WHERE c_custkey % 2 = 0),
    sql_src AS (SELECT * FROM customer WHERE c_custkey % 3 = 0)
    SELECT 'only_in_csv' AS direction, c_custkey FROM csv_src
    WHERE c_custkey NOT IN (SELECT c_custkey FROM sql_src)
    UNION ALL
    SELECT 'only_in_sql', c_custkey FROM sql_src
    WHERE c_custkey NOT IN (SELECT c_custkey FROM csv_src)
    """,
)
def reconcile_only_in_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/U3: records present in exactly one source, both directions
    (create_merged_views.sql:227-235) — left_anti joins."""
    c = t(spark, sf_dir, "customer")
    csv = c.filter(F.col("c_custkey") % 2 == 0)
    sql = c.filter(F.col("c_custkey") % 3 == 0)
    a = R.only_in(csv, sql, "c_custkey").select(
        F.lit("only_in_csv").alias("direction"), "c_custkey"
    )
    b = R.only_in(sql, csv, "c_custkey").select(
        F.lit("only_in_sql").alias("direction"), "c_custkey"
    )
    return a.unionByName(b)


@query(
    "reconcile_not_in_null_keys",
    oracle="""
    WITH src AS (
      SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS k
      FROM customer WHERE c_custkey % 2 = 0
    ),
    tgt_clean AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 3 = 0),
    tgt_null AS (SELECT k FROM tgt_clean UNION ALL SELECT NULL),
    tgt_empty AS (SELECT k FROM tgt_clean WHERE FALSE)
    SELECT 'vs_clean' AS leg, k FROM src
    WHERE k NOT IN (SELECT k FROM tgt_clean)
    UNION ALL
    SELECT 'vs_null', k FROM src
    WHERE k NOT IN (SELECT k FROM tgt_null)
    UNION ALL
    SELECT 'vs_empty', k FROM src
    WHERE k NOT IN (SELECT k FROM tgt_empty)
    """,
)
def reconcile_not_in_null_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 NOT IN parity with NULL keys (SURVEY §7 flagged divergence):
    three legs against the same NULL-bearing source — a clean target
    (NULL-keyed source rows must NOT surface, unlike left_anti), a
    target containing a NULL (must be empty), and an empty target
    (every source row qualifies, NULLs included)."""
    c = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    # round-9 (guide §1.2): `src` feeds all three NOT-IN legs and
    # `tgt_clean` two of them — lazy localCheckpoint of the key lists
    # so the source scans once, not once per leg (the 3VL legs
    # themselves are the demonstrated surface and stay untouched).
    src = c.filter(k % 2 == 0).select(
        F.when(k % 10 == 0, F.lit(None)).otherwise(k).alias("k")
    ).localCheckpoint(eager=False)
    tgt_clean = c.filter(k % 3 == 0).select(k.alias("k")).localCheckpoint(
        eager=False
    )
    tgt_null = tgt_clean.unionByName(
        spark.range(1).select(F.lit(None).cast("long").alias("k"))
    )
    tgt_empty = tgt_clean.filter(F.lit(False))
    legs = [
        ("vs_clean", tgt_clean),
        ("vs_null", tgt_null),
        ("vs_empty", tgt_empty),
    ]
    out = None
    for tag, tgt in legs:
        leg = R.only_in_not_in(src, tgt, "k").select(
            F.lit(tag).alias("leg"), "k"
        )
        out = leg if out is None else out.unionByName(leg)
    return out


@query(
    "part_category_lookup",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT p_brand AS ten_loai,
             CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INT) AS loai_id
      FROM part
    ),
    items AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 3 = 1 THEN lower(p_brand)
                  WHEN p_partkey % 3 = 2 THEN '  ' || p_brand || ' '
                  ELSE p_brand END AS loai
      FROM part
    ),
    resolved AS (
      SELECT i.p_partkey, d.loai_id
      FROM items i LEFT JOIN dim d
        ON regexp_replace(lower(trim(replace(replace(i.loai,'_',' '),'-',' '))), '\\s+', ' ', 'g')
         = regexp_replace(lower(trim(replace(replace(d.ten_loai,'_',' '),'-',' '))), '\\s+', ' ', 'g')
    )
    SELECT loai_id, COUNT(*) AS n_items FROM resolved GROUP BY loai_id
    """,
)
def part_category_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: deferred category name→id lookup against a broadcast dim with
    name normalization (case/padding variants as in the tensanpham.csv
    fixtures). Unmatched names keep NULL ids (routed to error zone in
    the pipeline)."""
    p = t(spark, sf_dir, "part")
    dim = p.select(
        F.col("p_brand").alias("ten_loai"),
        F.regexp_extract("p_brand", "#(\\d+)", 1).cast("int").alias("loai_id"),
    ).distinct()
    k = F.col("p_partkey")
    items = p.select(
        k,
        F.when(k % 3 == 1, F.lower("p_brand"))
        .when(k % 3 == 2, F.concat(F.lit("  "), F.col("p_brand"), F.lit(" ")))
        .otherwise(F.col("p_brand"))
        .alias("loai"),
    )
    resolved = R.category_lookup(items, dim, "loai", "ten_loai", "loai_id")
    return resolved.groupBy(F.col("_dim_id").alias("loai_id")).agg(
        F.count(F.lit(1)).alias("n_items")
    )
