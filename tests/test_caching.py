"""Cache reuse — the fix for the reference's repeated-count antipattern
(exploratory-data-analysis.py:158,170-171 ran three jobs for one number;
SURVEY.md §4). Asserts the cached plan actually reads from memory."""

from __future__ import annotations

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.plans.explain import physical_plan


def test_cached_frame_reads_from_memory(spark, sf_dir):
    df = load(spark, sf_dir, "orders").cache()
    try:
        n1 = df.count()  # materializes the cache
        n2 = df.count()  # served from InMemoryRelation
        assert n1 == n2
        assert "InMemoryTableScan" in physical_plan(df)
    finally:
        df.unpersist()


def test_uncached_frame_scans_files(spark, sf_dir):
    df = load(spark, sf_dir, "orders")
    assert "InMemoryTableScan" not in physical_plan(df)
    assert "Scan parquet" in physical_plan(df)
