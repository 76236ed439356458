"""Differential tests for the round-6 kernels: independent sequential
Python references (a third implementation besides Spark and the DuckDB
oracle) recomputed from the raw parquet — the pattern that caught the
Kaplan-Meier ln(0) bug both engines shared."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_sequence_packing_matches_sequential_reference(spark, sf_dir):
    """Replay the concat-and-chunk spec token by token in Python and
    compare the full accounting table cell-exactly."""
    from recommendation_system_big_data_spark.functions.text import (
        _PACK_SEQ_LEN,
        pipeline_sequence_packing,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "source", "size(split(text, ' ')) AS n")
        .collect()
    )
    per_src = defaultdict(list)
    for r in docs:
        per_src[r["source"]].append((r["doc_id"], r["n"]))
    expect = {}
    for src, rows in per_src.items():
        rows.sort()
        off = 0
        for doc_id, n in rows:
            lo, hi = off, off + n
            for seq in range(lo // _PACK_SEQ_LEN, (hi - 1) // _PACK_SEQ_LEN + 1):
                s_lo, s_hi = seq * _PACK_SEQ_LEN, (seq + 1) * _PACK_SEQ_LEN
                key = (src, seq)
                nd, nt, first, last = expect.get(key, (0, 0, doc_id, doc_id))
                expect[key] = (
                    nd + 1,
                    nt + min(hi, s_hi) - max(lo, s_lo),
                    min(first, doc_id),
                    max(last, doc_id),
                )
            off = hi

    got = {
        (r["source"], r["seq_id"]): (
            r["n_docs"],
            r["n_tokens"],
            r["first_doc_id"],
            r["last_doc_id"],
        )
        for r in pipeline_sequence_packing(spark, sf_dir).collect()
    }
    assert got == expect


def test_label_propagation_matches_sequential_reference(spark, sf_dir):
    """Run the 4 synchronous weighted-LPA rounds in plain Python over
    the same capped co-purchase edge list and compare every label."""
    from recommendation_system_big_data_spark.operators.graph import (
        _LPA_ITERS,
        MAX_BASKET,
        graph_label_propagation,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(list)
    for r in li:
        baskets[r["l_orderkey"]].append(r["l_partkey"])
    w = Counter()
    for rows in baskets.values():
        # dense_rank(<= MAX_BASKET) keeps every ROW of the first 32
        # distinct parts — multiplicity carries into the pair weights,
        # exactly like _capped_items feeding the self-join.
        keep = set(sorted(set(rows))[:MAX_BASKET])
        capped = [p for p in rows if p in keep]
        for a in capped:
            for b in capped:
                if a != b:
                    w[(a, b)] += 1
    neighbors = defaultdict(list)
    for (a, b), wt in w.items():
        neighbors[b].append((a, wt))  # incoming: dst adopts from src
    labels = {n: n for n in {a for a, _ in w}}
    for _ in range(_LPA_ITERS):
        new = {}
        for node, inc in neighbors.items():
            score = Counter()
            for src, wt in inc:
                score[labels[src]] += wt
            best = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
            new[node] = best[0]
        labels = new

    got = {
        r["part_id"]: r["community"]
        for r in graph_label_propagation(spark, sf_dir).collect()
    }
    assert got == labels
