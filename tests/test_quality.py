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


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _instance_handshake(rows, rounds=3):
    """Pure-Python instance-level greedy maximal matching — the oracle's
    algorithm, used to pin the quotient rewrite on dup-dense inputs the
    parquet fixtures don't contain (they have no duplicate names)."""
    import itertools

    blocks: dict = {}
    for k, n, nat in rows:
        blocks.setdefault((nat, n[:16]), []).append((k, n))
    edges = set()
    for mem in blocks.values():
        for (ka, na), (kb, nb) in itertools.combinations(mem, 2):
            d = _lev(na, nb)
            if d <= 2 and ka != kb:
                edges.add((d, min(ka, kb), max(ka, kb)))
    out = []
    for rnd in range(1, rounds + 1):
        best: dict = {}
        for e in edges:
            for node in (e[1], e[2]):
                if node not in best or e < best[node]:
                    best[node] = e
        sel = [e for e in edges if best.get(e[1]) == e and best.get(e[2]) == e]
        out += [(a, b, d, rnd) for (d, a, b) in sel]
        matched = {x for (d, a, b) in sel for x in (a, b)}
        edges = {e for e in edges if e[1] not in matched and e[2] not in matched}
    return sorted(out)


def test_quotient_matching_equals_instance_handshake_on_dups(spark):
    """The distinct-name quotient rewrite of one-to-one linkage must
    emit the exact matching of the instance-level algorithm on a
    DUP-DENSE corpus: name multiplicities 1-7 (odd leftovers joining
    the cross-name pool mid-run), near-names at lev 1-2, interleaved
    keys stressing the (d, a, b) tie-break, a blocker name whose
    duplicates shield it from an exposed suitor, and a second nation
    isolating blocks."""
    from data_integration_project_spark.plans.quality_q import (
        quotient_one_to_one_matching,
    )

    names = {
        "alpha customer 0001": 3,   # odd: leftover exposed in round 2
        "alpha customer 0002": 1,   # lev1 of 0001 — blocked in round 1
        "alpha customer 0003": 2,   # even: never exposed
        "alpha customer 0013": 1,   # lev1 of 0003, lev2 of 0001/0002
        "beta customerxx 9999": 7,  # >6: members remain through round 3
        "beta customerxx 9990": 1,  # lev1 suitor of the blocker above
        "gamma lone 77": 1,         # isolated (no similar name)
    }
    rows, i = [], 0
    for name, mult in names.items():
        for _ in range(mult):
            # (i*37) mod 991 is a permutation — keys of different names
            # interleave, so min-key/tie-break order ≠ insertion order
            rows.append((100 + (i * 37) % 991, name, 5))
            i += 1
    # second nation: same names, disjoint block space
    rows += [(k + 10000, n, 9) for (k, n, _) in rows[:6]]
    expected = _instance_handshake(rows)
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int"
    )
    got = sorted(
        (r["key_a"], r["key_b"], r["edit_dist"], r["round"])
        for r in quotient_one_to_one_matching(spark, df).collect()
    )
    assert got == expected
