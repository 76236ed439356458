"""The primary correctness gate: every registered query with an oracle must
match DuckDB exactly (row count + columns + order-insensitive values) at the
test scale factor — a local replica of the driver's t2 verify."""

from __future__ import annotations

import pytest

from recommendation_system_big_data_spark.registry import registry

from tests.conftest import assert_oracle_match

_DEFS = registry()
_WITH_ORACLE = [name for name, q in _DEFS.items() if q.oracle is not None]
_ROWS_ONLY = [name for name, q in _DEFS.items() if q.oracle is None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    qd = _DEFS[name]
    sdf = qd.fn(spark, sf_dir)
    assert_oracle_match(sdf, duck, qd.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    """⊘ queries: must run, produce a stable schema, and ≥0 rows (driver's
    weaker check). Heavier semantics live in the dedicated test modules."""
    qd = _DEFS[name]
    sdf = qd.fn(spark, sf_dir)
    assert sdf.columns
    assert sdf.count() >= 0
