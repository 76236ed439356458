"""Entity-resolution pipeline gates beyond the oracle match."""

from __future__ import annotations

def test_entity_resolution_invariants(spark, sf_dir):
    """ER clusters are non-trivial (every emitted entity has >= 2
    members — singletons are omitted by spec) and never cross the
    brand blocking boundary."""
    from recommendation_system_big_data_spark.operators.linkage import (
        pipeline_entity_resolution,
    )

    rows = pipeline_entity_resolution(spark, sf_dir).collect()
    assert rows
    assert all(r["n_members"] >= 2 for r in rows)
    assert all(r["n_brands"] == 1 for r in rows)
    assert all(r["canonical_name"] is not None for r in rows)
