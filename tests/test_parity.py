"""Oracle-parity suite: every registered query must match its DuckDB oracle
exactly at the driver's correctness scale factor (SURVEY.md §5 item 2)."""

from __future__ import annotations

import pytest

from eprints_to_hyku_data_tool_spark.plans.registry import REGISTRY, _load_all

from .parity import assert_parity

_load_all()
ORACLE_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(name, spark, sf_dir, duck):
    spec = REGISTRY[name]
    assert_parity(spec.fn(spark, sf_dir), spec.oracle, duck, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() > 0, f"{name}: rows-only query returned an empty result"
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(REGISTRY)
