"""Streaming semantics: the true micro-batch runs must agree with their
batch-mode (oracle-checked) equivalents, and the foreachBatch sink must
deliver every row exactly once across batches."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.streaming.jobs import (
    run_stream_foreach_batch,
    stream_tumbling_counts,
    stream_session_windows,
    tumbling_window_agg,
    session_window_agg,
)


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_tumbling_matches_batch(spark, sf_dir):
    stream = stream_tumbling_counts(spark, sf_dir)
    batch = tumbling_window_agg(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_stream_sessions_match_batch(spark, sf_dir):
    stream = stream_session_windows(spark, sf_dir)
    batch = session_window_agg(spark, sf_dir).select(
        "user_id", "session_start", "n_events"
    )
    assert _as_set(stream) == _as_set(batch)


def test_foreach_batch_exactly_once(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="rsbd_feb_")
    try:
        counts = run_stream_foreach_batch(spark, sf_dir, out)
        expected = (
            load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
        )
        assert sum(counts) == expected
        written = spark.read.parquet(os.path.join(out, "batch=*")).count()
        assert written == expected
    finally:
        shutil.rmtree(out, ignore_errors=True)
