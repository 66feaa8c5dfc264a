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
``flags`` list of boundary type kinds no ever-driver-green query has
exercised (the allowlists live in tests/oracle_harness.py; DECIMAL,
HUGEINT, unsigned ints, LIST, STRUCT, FLOAT all fall outside them).
Exit code 1 if any query is flagged.

Usage:

    python tools/scan_output_types.py [sf_dir] [name ...]

Defaults to /root/testdata/sf0.001 and all queries.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# Single source of truth for the output-boundary allowlists (any type
# containing DECIMAL / HUGEINT / unsigned ints is by construction not
# in them, so per-kind ban flags would be subsumed).
from tests.oracle_harness import PROVEN_DUCK_KINDS, PROVEN_SPARK_KINDS  # noqa: E402


def scan(spark, con, name: str, sf_dir: str) -> dict:
    from data_integration_project_spark import plans

    spec = plans.REGISTRY[name]
    out: dict = {"name": name, "flags": []}
    try:
        sdf = spec.fn(spark, sf_dir)
        spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        out["spark"] = spark_types
        if any(t not in PROVEN_SPARK_KINDS for t in spark_types.values()):
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
            if t not in PROVEN_DUCK_KINDS:
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
