"""Golden regression gate: every query's sf0.001 digest must match the
frozen snapshot (tests/golden/sf0001.json).  Fast — no DuckDB involved.
After an INTENTIONAL semantics change: python -m tests.regen_golden."""

from __future__ import annotations

import pytest

from covid_data_pipeline_spark.registry import load_all

from .conftest import SF_SMOKE
from .golden_utils import digest, load_golden


@pytest.fixture(scope="module")
def golden():
    return load_golden()


@pytest.mark.parametrize("name", sorted(load_all()))
def test_golden(name, spark, golden):
    assert name in golden, (
        f"{name} has no golden digest — run python -m tests.regen_golden"
    )
    got = digest(load_all()[name].fn(spark, SF_SMOKE))
    assert got == golden[name], (
        f"{name} drifted from golden snapshot: {got} != {golden[name]}"
    )
