"""The gate: every registered query vs its DuckDB oracle at sf0.01."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.registry import load_all

from .conftest import SF_ORACLE
from .oracle_harness import run_compare


def _names():
    return sorted(load_all())


@pytest.mark.parametrize("name", _names())
def test_oracle(name, spark, duck):
    spec = load_all()[name]
    run_compare(name, spec, spark, duck, SF_ORACLE)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None


def test_registry_consistency():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    for name in o:
        assert isinstance(o[name], str) and o[name].strip()
