"""Dedicated gates for the last unmapped rows-only (⊘) queries.

VERDICT r14 #6: every ⊘ query needs a NAMED differential/contract test so
its driver rows-only check is never the only evidence (vacuous-green risk).
The mechanical name→test map lives in COVERAGE.md §"Rows-only coverage
map"; these three were the unmapped remainder.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.functions.text import (
    ROLLING_BASE,
    ROLLING_PRIME,
    text_rolling_hash,
    tokens,
)
from recommendation_system_big_data_spark.operators.recommend import (
    als_enriched_recs,
    als_predict,
    ratings_from_events,
)


def test_text_rolling_hash_query_differential(spark, sf_dir):
    """The registered query's fold, replayed sequentially in Python over
    the SAME per-token xxhash64 values Spark computes — an independent
    implementation of the modular polynomial, catching fold-order or
    overflow bugs the in-Spark property tests (equal-collide /
    order-sensitive) structurally cannot."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_token = (
        docs.select(
            "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
        )
        .select("doc_id", "pos", F.xxhash64("tok").alias("th"))
        .collect()
    )
    seqs: dict[int, list[tuple[int, int]]] = {}
    for r in per_token:
        seqs.setdefault(r["doc_id"], []).append((r["pos"], r["th"]))
    expected = {}
    for doc_id, lst in seqs.items():
        h = 0
        for _, th in sorted(lst):
            h = (h * ROLLING_BASE + th % ROLLING_PRIME) % ROLLING_PRIME
        expected[doc_id] = h
    got = {
        r["doc_id"]: r["rhash"]
        for r in text_rolling_hash(spark, sf_dir).collect()
    }
    # docs whose text tokenizes to [] fold to 0 on both sides
    assert got == {**{d: 0 for d in got}, **expected}
    assert len(got) == docs.count()


def test_als_predict_contract(spark, sf_dir):
    """als_predict (⊘, op #41): scored pairs come FROM the ratings fact
    table with their true ratings carried through, predictions are finite
    (coldStartStrategy=drop ⇒ no NaN), and the split really held data out
    (scored rows are a strict, non-empty subset)."""
    preds = als_predict(spark, sf_dir).collect()
    assert preds
    truth = {
        (r["user_id"], r["item_id"]): r["rating"]
        for r in ratings_from_events(spark, sf_dir)
        .groupBy("user_id", "item_id")
        .agg(F.round(F.max(F.col("rating").cast("double")), 6).alias("rating"))
        .collect()
    }
    for r in preds:
        key = (r["user_id"], r["item_id"])
        assert key in truth, key
        assert not math.isnan(r["prediction"]) and math.isfinite(r["prediction"])
    assert len(preds) < len(truth)


def test_als_enriched_recs_contract(spark, sf_dir):
    """als_enriched_recs (⊘, reference pipeline shape): per user ≤5 rows,
    rn contiguous from 1, ordered by (avg_rating desc, item_id asc), and
    every avg_rating equals the independently recomputed per-item mean."""
    rows = als_enriched_recs(spark, sf_dir).collect()
    assert rows
    item_avg = {
        r["item_id"]: r["avg"]
        for r in ratings_from_events(spark, sf_dir)
        .groupBy("item_id")
        .agg(F.round(F.avg(F.col("rating").cast("double")), 6).alias("avg"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, recs in by_user.items():
        recs.sort(key=lambda r: r["rn"])
        assert [r["rn"] for r in recs] == list(range(1, len(recs) + 1))
        assert len(recs) <= 5
        keys = [(-(r["avg_rating"] or float("-inf")), r["item_id"]) for r in recs]
        assert keys == sorted(keys), user
        for r in recs:
            if r["avg_rating"] is not None:
                assert r["avg_rating"] == item_avg[r["item_id"]]
