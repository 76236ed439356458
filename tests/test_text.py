"""Text-function properties not expressible as oracles: the rolling hash's
order sensitivity and the canonical fingerprint's order INsensitivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.functions.text import rolling_hash, tokens


def _hashes(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    return [
        r["h"] for r in df.select(rolling_hash(tokens(F.col("text"))).alias("h")).collect()
    ]


def test_rolling_hash_equal_texts_collide(spark):
    a, b = _hashes(spark, ["the quick brown fox", "the quick brown fox"])
    assert a == b


def test_rolling_hash_is_order_sensitive(spark):
    a, b = _hashes(spark, ["the quick brown fox", "fox brown quick the"])
    assert a != b


def test_rolling_hash_deterministic_across_runs(spark):
    x1 = _hashes(spark, ["alpha beta gamma"])[0]
    x2 = _hashes(spark, ["alpha beta gamma"])[0]
    assert x1 == x2 and 0 <= x1 < 1_000_000_007


def test_canonical_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [("the quick brown fox",), ("fox brown quick the",)], ["text"]
    )
    canon = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split("text", " "))), " "
        ).cast("binary")
    )
    fps = [r["fp"] for r in df.select(canon.alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    """Packing invariants the oracle can't see on its own: per source,
    the packed sequences partition the token stream exactly — token
    totals conserved, every sequence except the last is exactly full,
    and seq_ids are gapless from 0."""
    from recommendation_system_big_data_spark.functions.text import (
        _PACK_SEQ_LEN,
        pipeline_sequence_packing,
    )

    rows = pipeline_sequence_packing(spark, sf_dir).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("source", "size(split(text, ' ')) AS n")
        .groupBy("source")
        .sum("n")
        .collect()
    )
    totals = {r["source"]: r["sum(n)"] for r in docs}
    assert set(per_src) == set(totals)
    for src, seqs in per_src.items():
        seqs.sort(key=lambda r: r["seq_id"])
        assert [s["seq_id"] for s in seqs] == list(range(len(seqs)))
        assert sum(s["n_tokens"] for s in seqs) == totals[src]
        assert all(s["n_tokens"] == _PACK_SEQ_LEN for s in seqs[:-1])
        assert 0 < seqs[-1]["n_tokens"] <= _PACK_SEQ_LEN


def test_bm25_differential_vs_sequential_reference(spark, sf_dir):
    """Differential-kernel test (the test_property_stats pattern): replay
    BM25 end-to-end in sequential Python over the raw fixture documents
    and compare every (query, doc, score, rank) cell against the Spark
    result. Catches what the DuckDB oracle structurally cannot — a bug
    class shared by both declarative engines (e.g. a wrong idf form or
    an off-by-one in the query-slice) would pass the oracle and fail
    here."""
    import math

    from recommendation_system_big_data_spark.functions.text import (
        _BM25_B,
        _BM25_K1,
        _BM25_QLEN,
        _BM25_RESIDUE,
        _BM25_STRIDE,
        _BM25_TOP_K,
        text_bm25_retrieval,
    )

    raw = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    # postings/lengths over NON-EMPTY tokens (the query filters them);
    # the query slice below is over RAW tokens (F.slice runs before the
    # empty-token filter)
    docs = {d: [t for t in toks if t != ""] for d, toks in raw.items()}
    tf = {d: {} for d in docs}
    for d, toks in docs.items():
        for t in toks:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(toks) for d, toks in docs.items()}
    n_docs = len(docs)
    avgdl = sum(dl.values()) / n_docs
    df = {}
    for d in docs:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1

    expected = {}
    for qid, toks in raw.items():
        if qid % _BM25_STRIDE != _BM25_RESIDUE:
            continue
        # query terms: first _BM25_QLEN RAW tokens, empties dropped after
        # the slice (matching the Spark/oracle order), distinct
        qterms = set(t for t in toks[:_BM25_QLEN] if t != "")
        scores = {}
        for d in docs:
            if d == qid:
                continue
            s = 0.0
            for t in qterms:
                if t not in tf[d]:
                    continue
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1)
                f = tf[d][t]
                s += idf * f * (_BM25_K1 + 1) / (
                    f + _BM25_K1 * (1 - _BM25_B + _BM25_B * dl[d] / avgdl)
                )
            if s > 0.0:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rn, (d, s) in enumerate(ranked[:_BM25_TOP_K], start=1):
            expected[(qid, d)] = (s, rn)

    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rn"])
        for r in text_bm25_retrieval(spark, sf_dir).collect()
    }
    assert set(got) == set(expected), (
        len(got), len(expected),
        sorted(set(got) ^ set(expected))[:5],
    )
    mism = {
        k: (got[k], expected[k])
        for k in expected
        if abs(got[k][0] - expected[k][0]) > 1e-6 or got[k][1] != expected[k][1]
    }
    assert not mism, list(mism.items())[:5]
