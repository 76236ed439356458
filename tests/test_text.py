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
