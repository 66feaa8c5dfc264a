"""Scan the OUTPUT type surface of every catalog query (Spark + oracle).

Triage tool for the r6-HUGEINT / r8-decimal failure family (VERDICT r8
item 3): the driver's order-insensitive value hash is
TYPE-CANONICALIZATION-sensitive across the Spark and DuckDB fetch
paths, while the local harness ``_norm`` folds Decimal->float and
int128->int — so a query can be repr-identical locally for rounds while
red in every driver sample.  The triage rule this tool implements:

    driver red that the local exact compare can't reproduce
      => diff the output TYPE surface against the ever-green set FIRST,
         before touching query/oracle shape.

For each registered query it builds the Spark plan (no execution beyond
what the builder itself runs) and binds the oracle in DuckDB, then
prints one JSON line per query with both type surfaces and a
``flags`` list of non-portable boundary types (decimal on either side,
HUGEINT/unsigned on the oracle side).  Exit code 1 if any query is
flagged.

Usage:

    python tools/scan_output_types.py [sf_dir] [name ...]

Defaults to /root/testdata/sf0.001 and all queries.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_BAD_ORACLE = ("HUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")

#: Spark boundary kinds some ever-driver-green query has exercised
#: (keep in sync with tests/oracle_harness.run_compare's allowlist)
_PROVEN_KINDS = {
    "bigint", "boolean", "date", "double", "int", "string",
    "timestamp", "timestamp_ntz",
}

#: DuckDB-side twin (TINYINT via dedup_simhash's r1-green hamming col)
_PROVEN_DUCK_KINDS = {
    "BIGINT", "BOOLEAN", "DATE", "DOUBLE", "INTEGER", "TINYINT",
    "TIMESTAMP", "VARCHAR",
}


def scan(spark, con, name: str, sf_dir: str) -> dict:
    from data_integration_project_spark import plans

    spec = plans.REGISTRY[name]
    out: dict = {"name": name, "flags": []}
    try:
        sdf = spec.fn(spark, sf_dir)
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        out["spark"] = spark_types
        if any("decimal" in t.lower() for t in spark_types.values()):
            out["flags"].append("spark_decimal_output")
        if any(t not in _PROVEN_KINDS for t in spark_types.values()):
            out["flags"].append("spark_unproven_kind")
    except Exception as exc:  # noqa: BLE001 — survey tool, keep scanning
        out["spark_error"] = f"{type(exc).__name__}: {exc}"[:200]
    if spec.oracle is None:
        out["oracle"] = None
        return out
    try:
        rel = con.sql(spec.oracle)
        duck_types = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        out["oracle"] = duck_types
        for t in duck_types.values():
            if "DECIMAL" in t:
                out["flags"].append("oracle_decimal_output")
            if any(b in t for b in _BAD_ORACLE):
                out["flags"].append("oracle_hugeint_or_unsigned")
            if t not in _PROVEN_DUCK_KINDS:
                out["flags"].append("oracle_unproven_kind")
    except Exception as exc:  # noqa: BLE001
        out["oracle_error"] = f"{type(exc).__name__}: {exc}"[:200]
    out["flags"] = sorted(set(out["flags"]))
    return out


def main(argv: list[str]) -> int:
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.001"
    from data_integration_project_spark import plans
    from data_integration_project_spark.session import get_spark
    from tests.oracle_harness import duck_connection

    names = argv[2:] or list(plans.REGISTRY)
    spark = get_spark("scan_output_types")
    con = duck_connection(sf_dir)
    n_flagged = 0
    for name in names:
        row = scan(spark, con, name, sf_dir)
        if row["flags"] or "spark_error" in row or "oracle_error" in row:
            n_flagged += 1
        print(json.dumps(row))
    print(
        f"# scanned {len(names)} queries at {sf_dir}: {n_flagged} flagged",
        file=sys.stderr,
    )
    return 1 if n_flagged else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
