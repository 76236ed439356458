"""Geo-operator gates: the blocked proximity join must actually be an
equi-join (no cartesian/nested-loop anywhere — the oracle brute-forces,
the engine must not), and the nearest-hub argmin must broadcast the hub
side."""

from __future__ import annotations

from recommendation_system_big_data_spark.operators.geo import (
    geo_nearest_hub,
    geo_proximity_join_blocked,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_proximity_join_is_equi_blocked(spark, sf_dir):
    df = geo_proximity_join_blocked(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nearest_hub_broadcasts_hubs(spark, sf_dir):
    df = geo_nearest_hub(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    rows = df.collect()
    custs = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert len(rows) == custs



def test_point_in_region_blocked_no_cartesian(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.geo import (
        geo_point_in_region,
    )

    df = geo_point_in_region(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert all(r["n_regions"] >= 1 for r in rows)
    assert all(r["region_nation"] <= 24 for r in rows)
