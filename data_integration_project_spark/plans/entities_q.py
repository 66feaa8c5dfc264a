"""End-to-end five-entity pipeline queries — the reference's actual use
case (coffee-shop CSV/SQL sources → transform → validate → merge →
facts), run over synthesized dirty fixtures that reproduce the
reference's dirty-data patterns (SURVEY.md §5.1; values are original,
patterns are parity: duplicate ids, digit/illegal-char names, short
phones, truncated emails, unparseable prices, unknown categories,
broken FK references, malformed CSV lines).

Each query carries a DuckDB oracle over inline VALUES — the SAME
literal rows — re-expressing transform+validate relationally, so the
whole CSV→verdict pipeline is value-hash checked end to end.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import (
    transform_dat_hang,
    transform_khach_hang,
    transform_mon,
    transform_nguyen_lieu,
)
from ..operators.entity_rules import (
    dat_hang_rules,
    fk_exists,
    khach_hang_rules,
    mon_rules,
)
from ..operators.quality import reject_duplicates
from ..operators.reconcile import category_lookup, merged_view
from ..pipeline import run_full_pipeline, run_history
from ..sources.csv import read_entity_csv, with_line_numbers
from .catalog import SQL_DSUM, dsum, query

# ---------------------------------------------------------------------------
# Fixture rows (single source of truth for BOTH the CSV file Spark reads
# and the VALUES literals the oracle reads). '' in a CSV field is read
# back by Spark as NULL — the VALUES renderer applies the same rule.
# ---------------------------------------------------------------------------

_KH_ROWS = [
    ("1", "An  Nguyen ", "0912345678", "Ha Noi", "An.Nguyen@Example.com"),  # fixed+valid
    ("1", "An Nguyen", "0912345678", "Ha Noi", "an.nguyen@example.com"),  # dup id
    ("2", "Binh Tran2424", "0987654321", "Da Nang", "binh@example.vn"),  # digits in name
    ("3", "Chi Le*", "0911222333", "Hue", "chi@example.vn"),  # illegal char
    ("4", "Dung Pham", "123", "Ha Noi", "dung@example.vn"),  # 3-digit phone
    ("5", "Em Vo", "09-1122-3344", "Can Tho", "em@"),  # truncated email
    ("6", "", "0933444555", "Ha Noi", "six@example.vn"),  # blank name
    ("7", "Giang Ho", "0944555666", "ha noi", "giang@EXAMPLE.vn"),  # fixed+valid
    (None, "Hai Vu", "0955666777", "Hue", "hai@example.vn"),  # missing id
]
_KH_CORRUPT_LINE = "8,Broken"  # too few columns → _corrupt_record
_KH_CORRUPT_LINE_NO = len(_KH_ROWS) + 1


def _sql_lit(v: str | None) -> str:
    """None → NULL. Note '' stays '' — createDataFrame fixtures keep
    empty strings; only the CSV reader turns empty fields into NULLs
    (those fixtures use None in the tuple)."""
    if v is None:
        return "NULL"
    return "'" + v.replace("'", "''") + "'"


def _values(rows: list[tuple], extra: str = "") -> str:
    rendered = []
    for i, row in enumerate(rows, start=1):
        cells = ", ".join([str(i)] + [_sql_lit(c) for c in row])
        rendered.append(f"({cells}{extra and ', ' + extra})")
    return ",\n      ".join(rendered)


# ---------------------------------------------------------------------------
# khach_hang: CSV file → permissive scan → transform → rules → first-wins
# ---------------------------------------------------------------------------

_KH_ORACLE = f"""
    WITH raw(line_no, id, ho_ten, sdt, thanh_pho, email) AS (VALUES
      {_values(_KH_ROWS)}),
    fixed AS (
      SELECT line_no, id AS customer_id,
             nullif(trim(regexp_replace(ho_ten, '\\s+', ' ', 'g')), '') AS ho_ten,
             nullif(regexp_replace(sdt, '[^0-9]', '', 'g'), '') AS sdt,
             nullif(lower(trim(email)), '') AS email
      FROM raw),
    checked AS (
      SELECT *,
        (customer_id IS NOT NULL AND regexp_matches(customer_id, '^[0-9]+$')) AS ok_id,
        (ho_ten IS NOT NULL AND trim(ho_ten) <> '') AS ok_nb,
        (ho_ten IS NOT NULL AND regexp_matches(ho_ten, '^[\\p{{L}} ]+$')) AS ok_nc,
        (coalesce(length(ho_ten), 0) <= 100) AS ok_nl,
        (sdt IS NOT NULL AND regexp_matches(sdt, '^[0-9]{{9,11}}$')) AS ok_ph,
        (email IS NOT NULL AND
         regexp_matches(email, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}$')) AS ok_em
      FROM fixed),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY customer_id ORDER BY line_no) AS rnk
      FROM checked)
    SELECT line_no, customer_id, ho_ten, sdt, email,
      (ok_id AND ok_nb AND ok_nc AND ok_nl AND ok_ph AND ok_em AND rnk = 1) AS is_valid,
      concat_ws(' | ',
        CASE WHEN NOT ok_id THEN 'invalid customer_id' END,
        CASE WHEN NOT ok_nb THEN 'ho_ten is blank' END,
        CASE WHEN NOT ok_nc THEN 'ho_ten has illegal characters' END,
        CASE WHEN NOT ok_nl THEN 'ho_ten too long' END,
        CASE WHEN NOT ok_ph THEN 'invalid phone' END,
        CASE WHEN NOT ok_em THEN 'invalid email' END,
        CASE WHEN rnk > 1 THEN 'duplicate customer_id' END) AS errors
    FROM ranked
    UNION ALL
    SELECT {_KH_CORRUPT_LINE_NO}, NULL, NULL, NULL, NULL, false, 'malformed csv line'
"""


@query("khachhang_csv_pipeline", oracle=_KH_ORACLE)
def khachhang_csv_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1→P1→V1/V2/V3 end to end: write the dirty fixture as a real
    BOM-ed CSV, permissive-scan it (malformed line → corrupt capture),
    materialize per-file line numbers, transform, validate with the
    khach_hang RuleSet, and apply ordered first-wins id dedup. Returns
    every row's verdict. The oracle rebuilds the identical pipeline
    from VALUES."""
    d = tempfile.mkdtemp(prefix="kh_csv_")
    path = os.path.join(d, "khachhang.csv")
    with open(path, "w", encoding="utf-8-sig") as f:
        f.write("id,ho_ten,sdt,thanh_pho,email\n")
        for row in _KH_ROWS:
            f.write(",".join(c if c is not None else "" for c in row) + "\n")
        f.write(_KH_CORRUPT_LINE + "\n")

    # cache: Spark disallows querying ONLY the corrupt-record column of
    # a raw CSV scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN); the fixture is
    # tiny and read twice (corrupt + good branches)
    raw = with_line_numbers(read_entity_csv(spark, path, "khach_hang")).cache()
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_line_no").alias("line_no"),
        *[F.lit(None).cast("string").alias(c) for c in ("customer_id", "ho_ten", "sdt", "email")],
        F.lit(False).alias("is_valid"),
        F.lit("malformed csv line").alias("errors"),
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    transformed = transform_khach_hang(good)
    validated = khach_hang_rules().validate(transformed)
    deduped = reject_duplicates(
        validated.drop("_is_valid"),
        ["customer_id"],
        [F.col("_line_no")],
        "duplicate customer_id",
    )
    verdicts = deduped.select(
        F.col("_line_no").alias("line_no"),
        "customer_id",
        "ho_ten",
        "sdt",
        "email",
        F.col("_is_valid").alias("is_valid"),
        F.concat_ws(" | ", "_errors").alias("errors"),
    )
    return verdicts.unionByName(corrupt)


# ---------------------------------------------------------------------------
# mon: dual-source layouts → transform → category lookup (J4) → merge (U1)
# ---------------------------------------------------------------------------

_MON_CSV_ROWS = [
    ("1", "Pho Bo", "45000", "An sang"),
    ("2", "Ca Phe Sua", "", "Do uong"),  # empty price → 0
    ("3", "Banh Mi", "abc", "An sang"),  # unparseable price → 0
    ("4", "Tra Da", "-5000", " do uong "),  # negative; padded category resolves
    ("5", "Banh Kem", "55 000", "Banh ngot!!!"),  # spaced price → 0; junk category
    ("6", "Mi Xao", "60000", "AN SANG"),  # case-insensitive category resolve
    ("7", "Sinh To", "35000", "An khuya"),  # unknown category
]
_LOAI_ROWS = [("1", "An sang"), ("2", "Do uong"), ("3", "Banh ngot")]
_MON_SQL_ROWS = [
    ("Com Tam", "1", "65000"),
    ("Nuoc Cam", "2", "30000"),
    ("Banh Quy", "3", "25000"),
]

_MON_ORACLE = f"""
    WITH mon_csv(line_no, id, ten_san_pham, gia, loai) AS (VALUES
      {_values(_MON_CSV_ROWS)}),
    loai_mon(line_no, ma_loai, ten_loai) AS (VALUES
      {_values(_LOAI_ROWS)}),
    mon_sql(line_no, ten_mon, loai_id, gia) AS (VALUES
      {_values(_MON_SQL_ROWS)}),
    csv_tr AS (
      SELECT trim(m.ten_san_pham) AS ten_mon,
             CAST(d.ma_loai AS INT) AS loai_id,
             coalesce(TRY_CAST(m.gia AS DOUBLE), 0.0) AS gia,
             (coalesce(TRY_CAST(m.gia AS DOUBLE), 0.0) > 0
              AND coalesce(TRY_CAST(m.gia AS DOUBLE), 0.0) <= 10000000) AS price_ok
      FROM mon_csv m
      LEFT JOIN loai_mon d
        ON regexp_replace(lower(trim(regexp_replace(m.loai, '[_-]', ' ', 'g'))), '\\s+', ' ', 'g')
         = regexp_replace(lower(trim(regexp_replace(d.ten_loai, '[_-]', ' ', 'g'))), '\\s+', ' ', 'g')),
    sql_tr AS (
      SELECT trim(ten_mon) AS ten_mon, CAST(loai_id AS INT) AS loai_id,
             coalesce(TRY_CAST(gia AS DOUBLE), 0.0) AS gia,
             (coalesce(TRY_CAST(gia AS DOUBLE), 0.0) > 0
              AND coalesce(TRY_CAST(gia AS DOUBLE), 0.0) <= 10000000) AS price_ok
      FROM mon_sql)
    SELECT 'CSV' AS source, ten_mon, loai_id, gia,
           (price_ok AND loai_id IS NOT NULL) AS is_valid FROM csv_tr
    UNION ALL
    SELECT 'SQL', ten_mon, loai_id, gia,
           (price_ok AND loai_id IS NOT NULL) AS is_valid FROM sql_tr
"""


@query("mon_dual_source_merge", oracle=_MON_ORACLE)
def mon_dual_source_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 dual-layout adapter + J4 deferred category-name→id broadcast
    lookup + U1 merged view with source tag, then mon rules (price
    positivity) + resolved-category check. The CSV layout carries the
    category NAME (dirty variants); the SQL layout carries the id."""
    csv_raw = spark.createDataFrame(
        _MON_CSV_ROWS, "id string, ten_san_pham string, gia string, loai string"
    )
    loai_dim = spark.createDataFrame(_LOAI_ROWS, "ma_loai string, ten_loai string")
    sql_raw = spark.createDataFrame(
        _MON_SQL_ROWS, "ten_mon string, loai_id string, gia string"
    )
    looked = category_lookup(csv_raw, loai_dim, "loai", "ten_loai", "ma_loai")
    csv_tr = transform_mon(looked).withColumn(
        "loai_id", F.coalesce(F.col("loai_id"), F.col("_dim_id").cast("int"))
    ).drop("_dim_id")
    sql_tr = transform_mon(sql_raw)
    merged = merged_view({"CSV": csv_tr, "SQL": sql_tr})
    validated = mon_rules().validate(merged)
    return validated.select(
        "source",
        "ten_mon",
        "loai_id",
        "gia",
        (F.col("_is_valid") & F.col("loai_id").isNotNull()).alias("is_valid"),
    )


# ---------------------------------------------------------------------------
# dat_hang: transform → rules → FK existence joins (V4/J3)
# ---------------------------------------------------------------------------

_DH_ROWS = [
    ("1", "1", "1", "2", "2024-01-05", "NEW"),
    ("2", "7", "6", "1", "2024-01-06", "DONE"),
    ("3", "99", "1", "3", "2024-01-07", "CONFIRMED"),  # unknown customer
    ("4", "1", "42", "1", "2024-01-08", "NEW"),  # unknown item
    ("5", "7", "1", "0", "2024-01-09", "DONE"),  # qty 0
    ("6", "1", "6", "2", "2024-01-10", "SHIPPED"),  # unknown status
    ("7", "", "1", "1", "2024-01-11", "NEW"),  # missing customer ref
    ("8", "7", "6", "x", "bad-date", "CANCELLED"),  # qty+date unparseable
]
_DH_CUSTOMERS = ["1", "7"]
_DH_ITEMS = ["1", "6"]

_DH_ORACLE = f"""
    WITH raw(line_no, id, khach_hang_id, mon_id, so_luong, ngay_dat, trang_thai) AS (VALUES
      {_values(_DH_ROWS)}),
    dim_kh(khach_hang_id) AS (VALUES {', '.join(f"('{c}')" for c in _DH_CUSTOMERS)}),
    dim_mon(mon_id) AS (VALUES {', '.join(f"('{c}')" for c in _DH_ITEMS)}),
    tr AS (
      SELECT line_no, id, khach_hang_id, mon_id,
             coalesce(TRY_CAST(so_luong AS INT), 0) AS so_luong,
             TRY_CAST(ngay_dat AS DATE) AS ngay_dat,
             nullif(trim(trang_thai), '') AS trang_thai
      FROM raw),
    checked AS (
      SELECT t.*,
        (t.khach_hang_id IS NOT NULL AND trim(t.khach_hang_id) <> '') AS ok_cref,
        (t.mon_id IS NOT NULL AND trim(t.mon_id) <> '') AS ok_iref,
        (t.so_luong > 0) AS ok_qty,
        (t.trang_thai IN ('NEW','CONFIRMED','DONE','CANCELLED')) AS ok_status,
        (t.ngay_dat IS NOT NULL) AS ok_date,
        (k.khach_hang_id IS NOT NULL) AS ok_fk_c,
        (m.mon_id IS NOT NULL) AS ok_fk_i
      FROM tr t
      LEFT JOIN dim_kh k ON t.khach_hang_id = k.khach_hang_id
      LEFT JOIN dim_mon m ON t.mon_id = m.mon_id)
    SELECT id AS order_id, khach_hang_id, mon_id, so_luong, ngay_dat, trang_thai,
      (ok_cref AND ok_iref AND ok_qty AND ok_status AND ok_date
       AND ok_fk_c AND ok_fk_i) AS is_valid,
      concat_ws(' | ',
        CASE WHEN NOT ok_cref THEN 'khach_hang_id missing' END,
        CASE WHEN NOT ok_iref THEN 'mon_id missing' END,
        CASE WHEN NOT ok_qty THEN 'so_luong must be > 0' END,
        CASE WHEN NOT ok_status THEN 'unknown trang_thai' END,
        CASE WHEN NOT ok_date THEN 'ngay_dat missing/unparseable' END,
        CASE WHEN NOT ok_fk_c THEN 'unknown khach_hang_id' END,
        CASE WHEN NOT ok_fk_i THEN 'unknown mon_id' END) AS errors
    FROM checked
"""


@query("dathang_fk_validation", oracle=_DH_ORACLE)
def dathang_fk_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 transform → dat_hang rules → V4 FK existence via broadcast
    left joins against the customer/item key dims, error-annotated
    (rows are KEPT with messages — the reject-whole-row policy applies
    at the split, not the check)."""
    raw = spark.createDataFrame(
        _DH_ROWS,
        "id string, khach_hang_id string, mon_id string, so_luong string,"
        " ngay_dat string, trang_thai string",
    ).withColumn("_order_id", F.col("id"))
    dim_kh = spark.createDataFrame([(c,) for c in _DH_CUSTOMERS], "khach_hang_id string")
    dim_mon = spark.createDataFrame([(c,) for c in _DH_ITEMS], "mon_id string")
    tr = transform_dat_hang(raw)
    validated = dat_hang_rules().validate(tr).drop("_is_valid")
    with_c = fk_exists(validated, "khach_hang_id", dim_kh, "khach_hang_id", "unknown khach_hang_id")
    with_i = fk_exists(with_c.drop("_is_valid"), "mon_id", dim_mon, "mon_id", "unknown mon_id")
    return with_i.select(
        F.col("_order_id").alias("order_id"),
        "khach_hang_id",
        "mon_id",
        "so_luong",
        "ngay_dat",
        "trang_thai",
        F.col("_is_valid").alias("is_valid"),
        F.concat_ws(" | ", "_errors").alias("errors"),
    )


# ---------------------------------------------------------------------------
# nguyen_lieu: transform → inventory fact rollup (A6)
# ---------------------------------------------------------------------------

_NL_ROWS = [
    ("1", "Ca phe hat", "25", "kg", "180000", "2024-01-03"),
    ("2", "Sua dac", "40", "hop", "22000", "2024-01-03"),
    ("3", "Duong", "", "kg", "18000", "2024-01-04"),  # missing qty → 0
    ("4", "Tra xanh", "12", "goi", "35000", "2024-01-04"),
    ("5", "Bot ca cao", "8", "chai", "95000", "2024-01-05"),
]

_NL_ORACLE = f"""
    WITH raw(line_no, id, ten_nguyen_lieu, so_luong, don_vi, gia, ngay_nhap) AS (VALUES
      {_values(_NL_ROWS)}),
    tr AS (
      SELECT TRY_CAST(ngay_nhap AS DATE) AS ngay_nhap,
             coalesce(TRY_CAST(so_luong AS DOUBLE), 0.0) AS so_luong,
             coalesce(TRY_CAST(gia AS DOUBLE), 0.0) AS gia
      FROM raw)
    SELECT ngay_nhap, COUNT(*) AS n_items,
           {SQL_DSUM('so_luong', 'total_qty', 2)},
           {SQL_DSUM('so_luong * gia', 'tong_gia_tri', 2)}
    FROM tr GROUP BY ngay_nhap
"""


@query("nguyenlieu_inventory_fact", oracle=_NL_ORACLE)
def nguyenlieu_inventory_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 transform → A6 inventory-fact rollup per receipt date
    (fact_kho_nguyen_lieu, create_dwh_tables.sql:180-206): stock
    quantity and total value = Σ qty×price."""
    raw = spark.createDataFrame(
        _NL_ROWS,
        "id string, ten_nguyen_lieu string, so_luong string, don_vi string,"
        " gia string, ngay_nhap string",
    )
    tr = transform_nguyen_lieu(raw)
    return tr.groupBy("ngay_nhap").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("so_luong"), "total_qty", 2),
        dsum(F.col("so_luong") * F.col("gia"), "tong_gia_tri", 2),
    )


# ---------------------------------------------------------------------------
# Run-history lineage (A4 across runs): two full pipeline runs land in
# one queryable history table; the oracle recomputes both runs' zone
# counts from the same fixture VALUES.
# ---------------------------------------------------------------------------

_KH_ROWS_RUN2 = _KH_ROWS[:5]  # second run: a smaller re-delivery


def _kh_run_counts_sql(tag: str, rows: list[tuple]) -> str:
    """Expected (run_id, entity, ingested, clean, error) for one run of
    the khach_hang pipeline over ``rows`` — the same transform/check/
    first-wins logic as ``_KH_ORACLE``, aggregated to zone counts
    (corrupt CSV lines never enter the envelope, so they appear in no
    count)."""
    return f"""
    SELECT '{tag}' AS run_id, 'khach_hang' AS entity,
           COUNT(*) AS ingested,
           CAST(SUM(CASE WHEN ok_all AND rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS clean,
           CAST(SUM(CASE WHEN NOT (ok_all AND rnk = 1) THEN 1 ELSE 0 END) AS BIGINT)
             AS error
    FROM (
      SELECT *,
             (ok_id AND ok_nb AND ok_nc AND ok_nl AND ok_ph AND ok_em) AS ok_all,
             row_number() OVER (PARTITION BY customer_id ORDER BY line_no) AS rnk
      FROM (
        SELECT line_no, customer_id, ho_ten, sdt, email,
          (customer_id IS NOT NULL AND regexp_matches(customer_id, '^[0-9]+$')) AS ok_id,
          (ho_ten IS NOT NULL AND trim(ho_ten) <> '') AS ok_nb,
          (ho_ten IS NOT NULL AND regexp_matches(ho_ten, '^[\\p{{L}} ]+$')) AS ok_nc,
          (coalesce(length(ho_ten), 0) <= 100) AS ok_nl,
          (sdt IS NOT NULL AND regexp_matches(sdt, '^[0-9]{{9,11}}$')) AS ok_ph,
          (email IS NOT NULL AND
           regexp_matches(email, '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}$')) AS ok_em
        FROM (
          SELECT line_no, id AS customer_id,
                 nullif(trim(regexp_replace(ho_ten, '\\s+', ' ', 'g')), '') AS ho_ten,
                 nullif(regexp_replace(sdt, '[^0-9]', '', 'g'), '') AS sdt,
                 nullif(lower(trim(email)), '') AS email
          FROM (VALUES
            {_values(rows)})
            AS raw(line_no, id, ho_ten, sdt, thanh_pho, email)
        )
      )
    )
    """


@query(
    "pipeline_run_history",
    oracle=_kh_run_counts_sql("r1", _KH_ROWS)
    + "\n    UNION ALL\n"
    + _kh_run_counts_sql("r2", _KH_ROWS_RUN2),
)
def pipeline_run_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 across runs: two complete pipeline executions (ingest →
    checkpointed drain → validate/dedup → zones → marts) append to the
    run_history lineage table, which is then queried back — run-scoped
    counts survive as a queryable parquet table rather than the
    reference's per-run log files (pipeline_run_*.log)."""
    out_root = tempfile.mkdtemp(prefix="runhist_")
    for tag, rows in (("r1", _KH_ROWS), ("r2", _KH_ROWS_RUN2)):
        data_dir = os.path.join(out_root, f"in_{tag}")
        os.makedirs(data_dir)
        with open(
            os.path.join(data_dir, "khachhang.csv"), "w", encoding="utf-8-sig"
        ) as f:
            f.write("id,ho_ten,sdt,thanh_pho,email\n")
            for row in rows:
                f.write(",".join(c if c is not None else "" for c in row) + "\n")
            f.write(_KH_CORRUPT_LINE + "\n")  # dead-letters, reaches no zone
        run_full_pipeline(spark, data_dir, out_root, run_id=tag)
    return run_history(spark, out_root).select(
        "run_id", "entity", "ingested", "clean", "error"
    )
