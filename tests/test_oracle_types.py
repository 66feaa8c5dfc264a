"""Output-boundary type ban over EVERY oracle, without running Spark.

The driver's order-insensitive value hash is type-canonicalization-
sensitive across the Spark and DuckDB fetch paths: equal values with
divergent type canonicalization hash differently. Two incidents, one
family — round 6's HUGEINT reds (DuckDB widens SUM(BIGINT) to int128)
and round 8's two-round `customers_correlated_subquery` red (the only
decimal-output query of 405; Spark DecimalType vs DuckDB DECIMAL).
`tests/oracle_harness.run_compare` guards both sides per query inside
the full gate; this module is the FAST half — binding all 409 oracles
takes ~2s, so an offending cast fails at authoring time even in a
targeted test run that never reaches the big gate.

Spark-side twin: tools/scan_output_types.py (builds every query's plan
and dumps both type surfaces — the triage tool for any future
local-green driver-red).
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import PROVEN_DUCK_KINDS, duck_connection


def test_every_oracle_output_kind_is_driver_proven(sf_small):
    from data_integration_project_spark import plans

    con = duck_connection(sf_small)
    offenders: list[str] = []
    for name, spec in plans.REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            rel = con.sql(spec.oracle)
        except Exception as exc:  # pragma: no cover — oracle must bind
            pytest.fail(f"{name}: oracle failed to bind: {exc}")
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if t not in PROVEN_DUCK_KINDS:
                offenders.append(f"{name}.{col}: {t}")
    assert not offenders, (
        "oracle output type kinds never driver-proven (CAST/serialize at "
        f"the boundary, r6-HUGEINT/r8-decimal family): {offenders}"
    )
