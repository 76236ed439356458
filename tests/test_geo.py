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

