"""Schema registry: explicit StructTypes for every table the engine reads.

The reference infers schemas at the edges (CSV headers, cursor
descriptions) and fixes them in staging DDL (reference
``main.py:129-256``). Here every entity has one canonical, explicit
``StructType`` — schema-on-read with no inference, so a parquet/CSV scan
prunes columns and pushes filters reliably.

Two families:

* ``TESTDATA``  — the driver's TPC-H-ish tables at /root/testdata/sf*/.
* ``ENTITIES``  — the reference's five coffee-shop entities (canonical,
  post-adapter layouts; see FIXTURES.md §A).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver test tables (FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TESTDATA)

# ---------------------------------------------------------------------------
# Reference entities — canonical layouts (FIXTURES.md §A; reference DDL
# main.py:129-256). One canonical schema per entity; the per-source
# layout differences (e.g. mon CSV vs SQL) are resolved by adapters in
# functions/cleaning.py, matching data_transformer.py:116-133.
# ---------------------------------------------------------------------------

ENTITIES: dict[str, T.StructType] = {
    "khach_hang": T.StructType(
        [
            T.StructField("customer_id", T.StringType()),
            T.StructField("ho_ten", T.StringType()),
            T.StructField("sdt", T.StringType()),
            T.StructField("thanh_pho", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("extract_time", T.TimestampType()),
        ]
    ),
    "loai_mon": T.StructType(
        [
            T.StructField("ma_loai", T.StringType()),
            T.StructField("ten_loai", T.StringType()),
            T.StructField("mo_ta", T.StringType()),
            T.StructField("extract_time", T.TimestampType()),
        ]
    ),
    "mon": T.StructType(
        [
            T.StructField("ten_mon", T.StringType()),
            T.StructField("loai_id", T.IntegerType()),
            T.StructField("gia", T.DoubleType()),
            T.StructField("extract_time", T.TimestampType()),
        ]
    ),
    "nguyen_lieu": T.StructType(
        [
            T.StructField("ma_nguyen_lieu", T.StringType()),
            T.StructField("ten_nguyen_lieu", T.StringType()),
            T.StructField("so_luong", T.DoubleType()),
            T.StructField("don_vi", T.StringType()),
            T.StructField("gia", T.DoubleType()),
            T.StructField("ngay_nhap", T.DateType()),
            T.StructField("extract_time", T.TimestampType()),
        ]
    ),
    "dat_hang": T.StructType(
        [
            T.StructField("khach_hang_id", T.StringType()),
            T.StructField("mon_id", T.StringType()),
            T.StructField("so_luong", T.IntegerType()),
            T.StructField("ngay_dat", T.DateType()),
            T.StructField("trang_thai", T.StringType()),
            T.StructField("extract_time", T.TimestampType()),
        ]
    ),
}

#: Envelope/lineage columns every raw-zone record carries (reference
#: STEP2_RAW_CONSUMER.py:154,171-174).
METADATA_COLUMNS = ("_source", "_extract_time", "_run_id", "_line_no")
