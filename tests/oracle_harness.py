"""Local replica of the driver's correctness protocol.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the same
parquet tables, then compares row count, column-name set, and the
order-insensitive multiset of row values. Stricter than the driver
(exact value equality) so that passing here predicts passing there.
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

from data_integration_project_spark.schemas import TABLE_NAMES

_REL_TOL = 0.0  # exact by default; queries are designed to be bit-deterministic

#: Output-boundary type ALLOWLISTS (round 9, single source of truth —
#: imported by tests/test_oracle_types.py and tools/scan_output_types.py).
#: The driver's value hash is TYPE-CANONICALIZATION-sensitive across the
#: Spark/DuckDB fetch paths (r6 HUGEINT reds, r8 decimal red — one
#: family), so only the kinds some ever-driver-green query has actually
#: exercised may cross the output boundary.  Spark-side census from the
#: round-9 audit: bigint 1050 cols, string 278, double 250, int 203,
#: date 36, timestamp 23, boolean 11, timestamp_ntz 2; DuckDB-side
#: TINYINT is proven via dedup_simhash's r1-green hamming column.
PROVEN_SPARK_KINDS = {
    "bigint", "boolean", "date", "double", "int", "string",
    "timestamp", "timestamp_ntz",
}
PROVEN_DUCK_KINDS = {
    "BIGINT", "BOOLEAN", "DATE", "DOUBLE", "INTEGER", "TINYINT",
    "TIMESTAMP", "VARCHAR",
}


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def run_compare(spark, name: str, sf_dir: str) -> None:
    from data_integration_project_spark import plans

    spec = plans.REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)

    # Output-boundary TYPE guard, Spark side (VERDICT r8 item 1,
    # widened to an ALLOWLIST in round 9): the driver's value hash is
    # TYPE-CANONICALIZATION-sensitive across the Spark/DuckDB fetch
    # paths, and _norm below folds Decimal -> float / int128 -> int,
    # making this harness structurally blind to the class.  r6's
    # HUGEINT reds and r8's customers_correlated_subquery red (the only
    # decimal-output query of 405; red for two driver rounds while
    # repr-identical locally) are one family: equal values, divergent
    # type canonicalization.  Decimal math INSIDE a query is fine and
    # load-bearing for bit-determinism — only the RETURNED schema is
    # restricted, to PROVEN_SPARK_KINDS (see the module constant; the
    # round-9 audit caught doc_inverted_index's array<bigint> posting
    # list this way, now serialized to a canonical string).
    for f in sdf.schema.fields:
        assert f.dataType.simpleString() in PROVEN_SPARK_KINDS, (
            f"{name}: returned column {f.name!r} has type "
            f"{f.dataType.simpleString()} — not in the driver-proven "
            f"boundary set {sorted(PROVEN_SPARK_KINDS)}; cast/serialize at "
            f"the output boundary (r6 HUGEINT / r8 decimal family)"
        )
    spark_cols = sorted(sdf.columns)
    spark_rows = [tuple(_norm(row[c]) for c in spark_cols) for row in sdf.collect()]

    # no-leaked-cache invariant (VERDICT r5 item 2, generalized from the
    # corpus_dataset_card ADVICE): after a catalog query is built AND
    # executed, the CacheManager must hold nothing — every in-function
    # persist() is released in try/finally; frames a returned plan must
    # re-read are localCheckpoint'ed (GC-collectable) instead of cached.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{name}: leaked cached relation(s) after execution"
    )

    # zero-CartesianProduct invariant (VERDICT r6 hygiene item 8,
    # promoted from the round-6 ad-hoc catalog scan): a crossJoin
    # against a stats-less frame silently plans as CartesianProduct and
    # re-executes one side per partition of the other — the recurring
    # scale killer. Checked on the RETURNED plan after execution (AQE
    # final); driver-side composed results (createDataFrame panels)
    # have trivial plans and pass vacuously.
    assert "CartesianProduct" not in (
        sdf._jdf.queryExecution().executedPlan().toString()
    ), f"{name}: CartesianProduct in executed plan"

    assert spec.oracle is not None, f"{name}: no oracle registered"
    con = duck_connection(sf_dir)

    # Oracle result-TYPE guard (VERDICT r6 item 1, widened to the
    # symmetric ALLOWLIST in round 9): the driver's value hash is
    # type-sensitive, while _norm folds int128 -> Python int and is
    # structurally blind to DuckDB widening a SUM to HUGEINT where
    # Spark returns bigint.  Bind the relation and reject any type kind
    # no ever-driver-green oracle has exercised, so an uncast SUM (r6),
    # a decimal money column (r8), or a future LIST/FLOAT/struct output
    # fails HERE, locally, instead of in the driver's sample.
    rel = con.sql(spec.oracle)
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        assert t in PROVEN_DUCK_KINDS, (
            f"{name}: oracle column {col!r} has DuckDB type {t} — not in "
            f"the driver-proven boundary set {sorted(PROVEN_DUCK_KINDS)}; "
            f"CAST/serialize at the output boundary (r6 HUGEINT / "
            f"r8 decimal family)"
        )

    res = con.execute(spec.oracle)
    duck_cols_raw = [d[0] for d in res.description]
    duck_cols = sorted(duck_cols_raw)
    idx = [duck_cols_raw.index(c) for c in duck_cols]
    duck_rows = [tuple(_norm(r[i]) for i in idx) for r in res.fetchall()]

    assert spark_cols == duck_cols, f"{name}: columns differ {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted = sorted(spark_rows, key=repr)
    d_sorted = sorted(duck_rows, key=repr)
    if s_sorted != d_sorted:
        diffs = [
            (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark, duck): {diffs}; cols={spark_cols}"
        )
