"""The primary correctness gate: every registered query with an oracle must
match DuckDB exactly (row count + columns + order-insensitive values) at the
test scale factor — a local replica of the driver's t2 verify."""

from __future__ import annotations

import pytest

from recommendation_system_big_data_spark.registry import registry

from tests.conftest import assert_oracle_match

_DEFS = registry()
# a0_* driver-window aliases are the same callables/oracles as their canonical
# names (see registry._DRIVER_WINDOW_ALIASES) — running them again here would
# only double the suite's wall-clock.
_CANON = {name: q for name, q in _DEFS.items() if "alias" not in q.tags}
_WITH_ORACLE = [name for name, q in _CANON.items() if q.oracle is not None]
_ROWS_ONLY = [name for name, q in _CANON.items() if q.oracle is None]


def test_alias_entries_mirror_canonical():
    """Every a0_ alias must point at exactly its canonical fn + oracle."""
    for name, q in _DEFS.items():
        if "alias" in q.tags:
            canon = _DEFS[name.removeprefix("a0_")]
            assert q.fn is canon.fn and q.oracle == canon.oracle, name


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
