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


def test_stream_sliding_matches_batch(spark, sf_dir):
    from recommendation_system_big_data_spark.streaming.jobs import (
        sliding_window_agg,
        stream_sliding_counts,
    )

    stream = stream_sliding_counts(spark, sf_dir)
    batch = sliding_window_agg(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_stateful_operator_matches_batch(spark, sf_dir):
    from recommendation_system_big_data_spark.streaming.stateful import (
        stream_stateful_user_stats,
    )

    stream = stream_stateful_user_stats(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in stream.collect()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        assert abs(got[u][1] - want[u][1]) < 1e-4, (u, got[u], want[u])


def test_checkpoint_recovery_processes_each_file_once(spark, sf_dir):
    """Exactly-once across restarts: a checkpointed file-source stream,
    stopped and restarted after new data arrives, processes only the new
    file — the recovery contract a 100 TB ingest pipeline depends on."""
    import tempfile
    from pyspark.sql import functions as F

    base = tempfile.mkdtemp(prefix="rsbd_ckpt_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src)

    ev = load(spark, sf_dir, "events")
    n_total = ev.count()
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    half_a.write.parquet(os.path.join(src, "a"), mode="overwrite")

    def run_once():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = spark.read.parquet(out).count()
    assert first == half_a.count()

    half_b.write.parquet(os.path.join(src, "b"), mode="overwrite")
    run_once()  # restart from checkpoint: must pick up ONLY the new file
    total = spark.read.parquet(out).count()
    assert total == n_total, (first, total, n_total)

    shutil.rmtree(base, ignore_errors=True)


def test_rate_source_produces_shaped_rows(spark):
    from recommendation_system_big_data_spark.streaming.jobs import rate_source_demo

    ev = rate_source_demo(spark, rows_per_second=500)
    q = (
        ev.writeStream.format("memory")
        .queryName("rsbd_rate_demo")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table("rsbd_rate_demo").count() > 0:
                break
            time.sleep(0.5)
        rows = spark.table("rsbd_rate_demo").limit(10).collect()
        assert rows, "rate source produced no rows in 20s"
        assert {r["event_type"] for r in rows} <= {"view", "click", "purchase"}
        assert all(0 <= r["user_id"] < 50 for r in rows)
    finally:
        q.stop()


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


def test_stream_dedup_matches_batch(spark, sf_dir):
    """dropDuplicatesWithinWatermark over a twice-replayed stream must yield
    exactly the batch dedup of the same replay (one row per event)."""
    from recommendation_system_big_data_spark.streaming.jobs import (
        dedup_events_replayed,
        stream_dedup_replayed,
    )

    stream = stream_dedup_replayed(spark, sf_dir)
    batch = dedup_events_replayed(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """The watermarked stream-stream interval join must emit exactly the
    batch attribution pairs: inner-join matches are complete once
    AvailableNow drains both sides."""
    from recommendation_system_big_data_spark.streaming.jobs import (
        attribution_click_purchase,
        stream_stream_join_attribution,
    )

    stream = stream_stream_join_attribution(spark, sf_dir)
    batch = attribution_click_purchase(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_stream_static_join_matches_batch(spark, sf_dir):
    from recommendation_system_big_data_spark.streaming.jobs import (
        dim_enriched_window_agg,
        stream_static_dim_join,
    )

    stream = stream_static_dim_join(spark, sf_dir)
    batch = dim_enriched_window_agg(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_foreachbatch_upsert_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.streaming.jobs import (
        stream_foreachbatch_upsert,
    )

    final_state = stream_foreachbatch_upsert(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    assert _as_set(final_state) == _as_set(batch)


def test_stream_python_datasource_matches_batch(spark, sf_dir):
    """The custom streaming DataSource must deliver exactly the batch
    source's rows across its offset-tracked micro-batches."""
    from recommendation_system_big_data_spark.sources.pyds import (
        scan_python_datasource,
        stream_python_datasource,
    )

    stream = stream_python_datasource(spark, sf_dir)
    batch = scan_python_datasource(spark, sf_dir)
    assert _as_set(stream) == _as_set(batch)


def test_transform_with_state_matches_batch(spark, sf_dir):
    """The transformWithStateInPandas operator must produce the same final
    per-user stats as the batch groupBy (and hence as the legacy
    applyInPandasWithState operator). Skips where the container lacks
    google.protobuf (the API's state-protocol dependency)."""
    import importlib.util

    import pytest

    if (importlib.util.find_spec("google") is None
            or importlib.util.find_spec("google.protobuf") is None):
        pytest.skip("google.protobuf not available in this container")
    from recommendation_system_big_data_spark.streaming.stateful import (
        stream_transform_with_state,
    )

    stream = stream_transform_with_state(spark, sf_dir)
    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in stream.collect()}
    want = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in batch.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], (u, got[u], want[u])
        assert abs(got[u][1] - want[u][1]) < 1e-4, (u, got[u], want[u])


def test_rolling_anomaly_stream_matches_batch(spark, sf_dir):
    """The streaming rolling-zscore counters (20-value ring buffer in
    state) must equal the batch preceding-20 frame aggregation when all
    events arrive in order — the replay/backfill determinism contract."""
    from recommendation_system_big_data_spark.operators.windows import (
        window_rolling_zscore,
    )
    from recommendation_system_big_data_spark.streaming.stateful import (
        stream_rolling_anomaly,
    )

    streamed = {
        r["user_id"]: (r["n_scored"], r["n_anomalies"])
        for r in stream_rolling_anomaly(spark, sf_dir).collect()
    }
    batch = (
        window_rolling_zscore(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("is_anomaly").alias("n_anomalies"),
        )
    )
    want = {
        r["user_id"]: (r["n_scored"], r["n_anomalies"]) for r in batch.collect()
    }
    # Streamed output covers every user with events; batch covers users
    # with >=5 scored observations. Compare on the batch's support, and
    # require streamed zero-counts elsewhere to be consistent.
    for u, (n_scored, n_anom) in want.items():
        assert streamed[u] == (n_scored, n_anom), (u, streamed[u], want[u])
    for u, (n_scored, _) in streamed.items():
        if u not in want:
            assert n_scored == 0, (u, streamed[u])


def test_watermark_late_drop_parity(spark, sf_dir):
    """The late file's rows must be dropped: every emitted window equals
    the head-file-only batch aggregation, and at least one of those
    windows WOULD have a larger count if the late rows had been merged
    (proving the drop actually happened, not that the data didn't
    overlap)."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import epoch_s, load
    from recommendation_system_big_data_spark.streaming.jobs import (
        _ordered_stream_fixture,
        stream_watermark_late_drop,
    )

    emitted = {
        r["window_start"]: r["n"]
        for r in stream_watermark_late_drop(spark, sf_dir).collect()
    }
    assert emitted, "no windows finalized"

    path, n_late = _ordered_stream_fixture(spark, sf_dir)
    assert n_late > 0
    head = spark.read.parquet(f"{path}/00_head.parquet")
    head_daily = {
        r["window_start"]: r["n"]
        for r in head.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(epoch_s(F.col("w.start")).alias("window_start"), "n")
        .collect()
    }
    for ws, n in emitted.items():
        assert head_daily.get(ws) == n, (ws, n, head_daily.get(ws))

    full_daily = {
        r["window_start"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(epoch_s(F.col("w.start")).alias("window_start"), "n")
        .collect()
    }
    # the late rows' windows exist in the full batch answer with larger
    # counts than head-only (or are absent from head entirely)
    assert any(
        full_daily[ws] > head_daily.get(ws, 0)
        for ws in full_daily
    )


def test_stream_approx_distinct_within_tolerance(spark, sf_dir):
    """Every streaming HLL window estimate must land within rsd-scaled
    tolerance of the batch exact distinct count for the same (window,
    event_type) — and cover exactly the same window set."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import epoch_s
    from recommendation_system_big_data_spark.streaming.jobs import (
        events_stream,
        stream_approx_distinct_users,
    )
    from recommendation_system_big_data_spark.catalog import load

    stream = {
        (r["window_start"], r["event_type"]): r["approx_users"]
        for r in stream_approx_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        (r["window_start"], r["event_type"]): r["n_users"]
        for r in (
            load(spark, sf_dir, "events")
            .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .select(
                epoch_s(F.col("w.start")).alias("window_start"),
                "event_type",
                "n_users",
            )
            .collect()
        )
    }
    assert set(stream) == set(exact)
    for k, est in stream.items():
        assert abs(est - exact[k]) <= max(3, 0.1 * exact[k]), (k, est, exact[k])
