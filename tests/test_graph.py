"""Gates for the graph kernels' approximate/sampled variants.

The exact kernels (graph_pagerank, graph_triangle_count) are oracle-checked
in test_oracles.py; this module gates what an oracle cannot express — the
DOULION estimator's accuracy and determinism — and pins the basket cap's
inertness at test scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.operators.graph import (
    MAX_BASKET,
    graph_triangle_count,
    graph_triangle_count_doulion,
)
from recommendation_system_big_data_spark.catalog import load


def test_doulion_estimate_within_tolerance(spark, sf_dir):
    # Exact global count = sum of per-node counts / 3 (each triangle is
    # counted once per corner).
    exact = (
        graph_triangle_count(spark, sf_dir)
        .agg((F.sum("n_triangles") / 3).alias("t"))
        .collect()[0]["t"]
    )
    row = graph_triangle_count_doulion(spark, sf_dir).collect()[0]
    assert row["p"] == 0.5
    assert row["n_edges_sampled"] > 0
    # DOULION is unbiased with concentration improving as the true count
    # grows; at this tiny SF the gate is loose but still rejects a broken
    # scale factor (1/p^3 = 8x) or a wrong join by a wide margin.
    assert exact > 0
    rel_err = abs(row["est_triangles"] - exact) / exact
    assert rel_err < 0.5, f"exact={exact} est={row['est_triangles']}"


def test_doulion_is_deterministic(spark, sf_dir):
    a = graph_triangle_count_doulion(spark, sf_dir).collect()[0]
    b = graph_triangle_count_doulion(spark, sf_dir).collect()[0]
    assert a["est_triangles"] == b["est_triangles"]
    assert a["n_edges_sampled"] == b["n_edges_sampled"]


def test_basket_cap_inert_at_test_scale(spark, sf_dir):
    # The per-order cap must not bite at the test SFs (VERDICT r4 requires
    # hashes unchanged): max distinct parts per order stays under MAX_BASKET.
    mx = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_partkey").alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx <= MAX_BASKET


def test_kcore_invariants(spark, sf_dir):
    """⊘ gates for graph_kcore: every reported node's in-core degree ≥ k,
    determinism, and the core is non-trivial on the co-purchase graph."""
    from recommendation_system_big_data_spark.operators.graph import (
        _KCORE_K,
        graph_kcore,
    )

    rows = graph_kcore(spark, sf_dir).collect()
    assert rows, "empty 2-core"
    assert all(r["core_degree"] >= _KCORE_K for r in rows)
    again = graph_kcore(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_label_propagation_invariants(spark, sf_dir):
    """LPA invariants beyond the oracle match: propagation actually
    merges communities (fewer labels than nodes), every community label
    IS a member node's id (labels only ever propagate from nodes), and
    the labeling is deterministic across runs."""
    from recommendation_system_big_data_spark.operators.graph import (
        graph_label_propagation,
    )

    rows = graph_label_propagation(spark, sf_dir).collect()
    nodes = {r["part_id"] for r in rows}
    comms = {r["community"] for r in rows}
    assert len(comms) < len(nodes)
    assert comms <= nodes
    again = graph_label_propagation(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
