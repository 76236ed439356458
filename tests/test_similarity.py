"""Similarity-search quality: the LSH-probed top-k must recall a reasonable
share of the exact brute-force top-k, and both tiers must be deterministic."""

from __future__ import annotations

from recommendation_system_big_data_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_topk_lsh,
)


def _topsets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    approx = _topsets(sim_topk_lsh(spark, sf_dir))
    recalls = []
    for q, nbrs in exact.items():
        got = approx.get(q, set())
        recalls.append(len(got & nbrs) / len(nbrs))
    mean_recall = sum(recalls) / len(recalls)
    # hamming<=8 of 16 planes: ~85% expected recall even on the weak
    # (cos≈0.3-0.4) neighbors random test vectors produce; this guards
    # against the sketch being broken, not against ANN being approximate.
    assert mean_recall >= 0.6, mean_recall


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.similarity import (
        sim_topk_ivf,
    )

    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    approx = _topsets(sim_topk_ivf(spark, sf_dir))
    recalls = [
        len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items()
    ]
    # random vectors scatter near-uniformly over coarse cells, so 4-of-20
    # probes bounds recall near n_probe/n_lists; the gate guards the index
    # mechanics (assignment + probe + re-rank), not ANN quality on noise.
    assert sum(recalls) / len(recalls) >= 0.15, sum(recalls) / len(recalls)
    # every returned neighbor must be a real vector with a sane rank list
    rows = sim_topk_ivf(spark, sf_dir).collect()
    assert all(1 <= r["rn"] <= 10 for r in rows)


def test_bruteforce_deterministic(spark, sf_dir):
    a = sorted(map(str, sim_topk_bruteforce(spark, sf_dir).collect()))
    b = sorted(map(str, sim_topk_bruteforce(spark, sf_dir).collect()))
    assert a == b
