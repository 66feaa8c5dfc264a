"""Unit tests for the rule engine + entity transforms, using the
reference's dirty fixture patterns (FIXTURES.md §A) as inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_project_spark.functions import cleaning
from data_integration_project_spark.operators import quality as Q


def test_transform_khach_hang_fixture_patterns(spark):
    rows = [
        # (id, ho_ten, sdt, thanh_pho, email) — dirty patterns from khachhang.csv
        ("1", "Nguyen   Van  A ", "(09) 12-345-678", " Hà Nội ", " USER@Example.COM "),
        ("2", "Trần Hạnh2424", "123", "", "test@"),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, "id string, ho_ten string, sdt string, thanh_pho string, email string")
    out = cleaning.transform_khach_hang(df, extract_time=F.lit("2026-01-01").cast("timestamp"))
    got = {r["customer_id"]: r.asDict() for r in out.collect()}
    assert got["1"]["ho_ten"] == "Nguyen Van A"          # whitespace collapsed
    assert got["1"]["sdt"] == "0912345678"               # digits only
    assert got["1"]["thanh_pho"] == "Hà Nội"             # trimmed
    assert got["1"]["email"] == "user@example.com"       # lowercased
    assert got["2"]["sdt"] == "123"                      # kept; rejection is the rule engine's job
    assert got[None]["ho_ten"] is None                   # blank → NULL


def test_transform_mon_dual_layout(spark):
    # CSV layout: category by NAME, price dirty (fixtures tensanpham.csv:88-101)
    csv = spark.createDataFrame(
        [("Phở bò ", "50 000", "Ăn sáng"), ("Trà đá", "abc", "Đồ uống"), ("Bún", "-345", "x")],
        "ten_san_pham string, gia string, loai string",
    )
    out = {r["ten_mon"]: r for r in cleaning.transform_mon(csv).collect()}
    assert out["Phở bò"]["loai_id"] is None              # deferred name→id lookup
    assert out["Trà đá"]["gia"] == 0.0                   # unparseable → default 0 (ref P4)
    assert out["Bún"]["gia"] == -345.0                   # parseable negative kept; rules reject later
    # SQL layout: loai_id numeric
    sql = spark.createDataFrame([("Phở bò", "2", "45000")], "ten_mon string, loai_id string, gia string")
    row = cleaning.transform_mon(sql).collect()[0]
    assert row["loai_id"] == 2 and row["gia"] == 45000.0


def test_ruleset_fix_then_validate(spark):
    df = spark.createDataFrame(
        [(1, "  Alice  ", "a@b.com"), (2, "", "a@b.com"), (3, "Bob", "test@")],
        "id int, name string, email string",
    )
    rs = (
        Q.RuleSet("t")
        .fix("name", F.regexp_replace(F.trim("name"), r"\s+", " "))
        .rule("name_not_blank", Q.not_blank("name"), "blank name")
        .rule("email", Q.valid_email("email"), "bad email")
    )
    validated = {r["id"]: r for r in rs.validate(df).collect()}
    assert validated[1]["_is_valid"] and validated[1]["name"] == "Alice"  # repaired, not rejected
    assert validated[2]["_errors"] == ["blank name"]
    assert validated[3]["_errors"] == ["bad email"]
    clean, error = rs.split(df)
    assert clean.count() == 1
    err = {r["id"]: r["_errors"] for r in error.collect()}
    assert err == {2: "blank name", 3: "bad email"}


def test_first_wins_dedup_order(spark):
    # khachhang.csv:2-3 — duplicate id=1, first occurrence wins (V2)
    df = spark.createDataFrame(
        [(1, "first", 10), (1, "second", 20), (2, "only", 30)],
        "id int, tag string, _line_no int",
    )
    ranked = Q.first_wins(df, ["id"], ["_line_no"])
    winners = {r["id"]: r["tag"] for r in ranked.filter("_dup_rank = 1").collect()}
    assert winners == {1: "first", 2: "only"}
    rejected = Q.reject_duplicates(df, ["id"], ["_line_no"])
    bad = rejected.filter(~F.col("_is_valid")).collect()
    assert len(bad) == 1 and bad[0]["tag"] == "second"


def test_validation_is_single_projection(spark):
    """The compiled rule pass must stay one codegen'd projection — no
    UDFs, no extra shuffles (scale guard)."""
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    rs = Q.RuleSet("t").rule("nn", Q.not_blank("name"))
    plan = rs.validate(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
