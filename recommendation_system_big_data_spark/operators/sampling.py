"""Sampling / splits — SURVEY.md §2.8.

Both ops are partitioning-dependent even when seeded, so they register
without oracles (⊘ rows-only checks) exactly as SURVEY.md §5.2 prescribes;
the pytest suite checks their statistical and determinism properties
(same-session reruns are identical; fractions land near nominal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


@register("random_split", oracle=None, tags=("sampling",))
def random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 80/20 split (op #33; model-als.py:122 `randomSplit([.8,.2], 42)`).
    Returns the split sizes — the downstream-relevant invariant."""
    train, test = load(spark, sf_dir, "events").randomSplit([0.8, 0.2], seed=42)
    return (
        train.agg(F.lit("train").alias("split"), F.count(F.lit(1)).alias("n"))
        .unionByName(test.agg(F.lit("test").alias("split"), F.count(F.lit(1)).alias("n")))
    )


@register("sample_frac", oracle=None, tags=("sampling",))
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample (op #34; exploratory-data-analysis.py:92 samples
    UNSEEDED — the engine always seeds, SURVEY.md §7.3)."""
    return (
        load(spark, sf_dir, "events")
        .sample(fraction=0.8, seed=42)
        .select("event_id", "user_id", "event_type", "value")
    )


@register("sample_stratified", oracle=None, tags=("sampling",))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-key) sampling via sampleBy: different Bernoulli
    fractions per l_returnflag stratum, fixed seed. ⊘ rows-only (sampling
    is seed/partitioning-defined, not SQL-expressible); the per-stratum
    rates are gated in tests/test_sampling.py. The 100 TB use is
    class-balanced training-set extraction — one scan, no shuffle, the
    filter evaluates per-row against the stratum's threshold."""
    fractions = {"A": 0.2, "N": 0.05, "R": 0.1}
    return (
        load(spark, sf_dir, "lineitem")
        .sampleBy("l_returnflag", fractions=fractions, seed=42)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )
