"""Sampling determinism + statistical gates (SURVEY.md §5.2: sampling ops
register rows-only, so their invariants are pytest's job)."""

from __future__ import annotations


def test_random_split_sizes_and_determinism(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.sampling import (
        random_split,
    )

    a = {r["split"]: r["n"] for r in random_split(spark, sf_dir).collect()}
    b = {r["split"]: r["n"] for r in random_split(spark, sf_dir).collect()}
    assert a == b  # same session, same seed, same partitioning -> identical
    total = a["train"] + a["test"]
    assert abs(a["train"] / total - 0.8) < 0.05


def test_sample_frac_seeded_rerun_identical(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.sampling import (
        sample_frac,
    )

    a = sorted(r["event_id"] for r in sample_frac(spark, sf_dir).collect())
    b = sorted(r["event_id"] for r in sample_frac(spark, sf_dir).collect())
    assert a == b and len(a) > 0

def test_stratified_sample_rates(spark, sf_dir):
    """sampleBy must honor the per-stratum fractions (±50% relative — a
    loose Bernoulli bound at small SF) and draw only from listed strata."""
    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.sampling import (
        sample_stratified,
    )

    totals = {
        r["l_returnflag"]: r["n"]
        for r in load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got = {
        r["l_returnflag"]: r["n"]
        for r in sample_stratified(spark, sf_dir)
        .groupBy("l_returnflag")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    fractions = {"A": 0.2, "N": 0.05, "R": 0.1}
    assert set(got) <= set(fractions)
    for k, frac in fractions.items():
        expected = totals[k] * frac
        assert abs(got.get(k, 0) - expected) <= 0.5 * expected + 5, (k, got.get(k), expected)


def test_portable_bucket_matches_reference_md5(spark):
    """The engine's split bucket must equal the pure-Python md5 reference
    (first 8 hex digits as int, mod 100) — the property that makes split
    assignment reproducible outside Spark entirely."""
    import hashlib

    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    keys = list(range(1, 101)) + [10**12 + 7, 987654321]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {
        r["k"]: r["b"]
        for r in df.select(
            "k", portable_bucket(F.col("k"), 100).alias("b")
        ).collect()
    }
    for k in keys:
        want = int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 100
        assert got[k] == want, (k, got[k], want)
