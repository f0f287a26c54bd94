"""Driver-shaped correctness gate: every registered query with an
oracle must match DuckDB exactly at the correctness scale factor."""

from __future__ import annotations

import pytest

from data_lake_with_spark_and_aws_s3_spark import REGISTRY

from .parity import run_parity

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if not s.oracle]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_parity(spark, duck, sf_dir, spec):
    run_parity(spark, duck, spec, sf_dir)


@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=[s.name for s in ROWS_ONLY_SPECS])
def test_rows_only_runs(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0  # must execute without error; schema stable
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_registry_contract():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
