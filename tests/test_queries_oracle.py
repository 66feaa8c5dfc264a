"""Every catalog query with an oracle must match DuckDB exactly.

This is a local replica of the driver's sf0.01 gate, run at sf0.001 for
speed (set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 to run the real
scale). Queries without an oracle get a smoke-run (schema + rows>=0).
"""

from __future__ import annotations

import os

import pytest

from data_integration_project_spark import plans

from .oracle_harness import run_compare

TEST_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

ORACLE_NAMES = sorted(n for n, s in plans.REGISTRY.items() if s.oracle is not None)
SMOKE_NAMES = sorted(n for n, s in plans.REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, name):
    run_compare(spark, name, TEST_SF)


@pytest.mark.parametrize("name", SMOKE_NAMES)
def test_smoke_runs(spark, name):
    df = plans.REGISTRY[name].fn(spark, TEST_SF)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(plans.REGISTRY)


def test_resample_first_ordering():
    """The five queries whose last driver verdict predates their fix
    must lead queries()/oracle_sql() so a prefix-sampling driver
    re-covers them (VERDICT r2 item 2)."""
    from data_integration_project_spark.plans.catalog import _RESAMPLE_FIRST

    qs = list(plans.queries())
    assert qs[: len(_RESAMPLE_FIRST)] == _RESAMPLE_FIRST
    os_ = list(plans.oracle_sql())
    assert os_[: len(_RESAMPLE_FIRST)] == _RESAMPLE_FIRST
