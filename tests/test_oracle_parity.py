"""Differential tests: every oracle-bearing registry key must match DuckDB
bit-for-bit (the driver's CORRECTNESS gate, run locally)."""

from __future__ import annotations

import pytest

from bitcoin_price_etl_spark.registry import load_all
from tests.oracle import compare_to_oracle

ORACLE_KEYS = sorted(k for k, spec in load_all().items() if spec.oracle is not None)
ROWS_ONLY_KEYS = sorted(k for k, spec in load_all().items() if spec.oracle is None)


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_oracle_parity(spark, sf_dir, key):
    compare_to_oracle(spark, key, sf_dir)


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_runs(spark, sf_dir, key):
    """Rows-only keys must at least execute and return a stable schema."""
    spec = load_all()[key]
    df = spec.fn(spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
