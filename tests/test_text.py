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
