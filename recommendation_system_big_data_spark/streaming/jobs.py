"""Structured Streaming surface over the `events` table — SURVEY.md §2.10.

The reference is batch-only; this module adds the declared streaming
extension: tumbling / sliding / session windows with watermarked late-data
handling, a file (Parquet) stream source, memory + foreachBatch sinks.

Per the driver contract, each windowed aggregation registers TWICE:
  - a batch-mode query (identical window math) with a DuckDB oracle
    (`time_bucket` / gaps-and-islands) — the hash-checked correctness gate;
  - a true `readStream` run (Trigger.AvailableNow → memory sink) — ⊘
    rows-only, since DuckDB cannot express micro-batch execution.

Scale notes: windowed aggs shuffle on (window, key) and keep state only for
open windows (watermark bounds state size); the parquet file source is the
stand-in for Kafka — swap `readStream.format` and the plan is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from recommendation_system_big_data_spark.catalog import epoch_s, epoch_us, load
from recommendation_system_big_data_spark.registry import register
from recommendation_system_big_data_spark.session import ensure_runtime_conf

def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file per micro-batch
    in AvailableNow mode).

    Streaming sources require an explicit schema; hard-coding one breaks
    the day the generator changes its timestamp encoding (round 4: ts went
    from INT64 TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros, and a pinned
    LongType schema silently read micros as if they were nanos — every
    window start off by 1000×). The batch reader's footer schema is the
    source of truth; the ns-long case converts exactly as catalog.load.

    Watermarks require an instant TIMESTAMP (EVENT_TIME_IS_NOT_ON_
    TIMESTAMP_TYPE on NTZ), so NTZ event time is cast through the session
    zone — ensure_runtime_conf pins it to UTC, making the cast value-
    preserving against the naive batch/oracle reads."""
    ensure_runtime_conf(spark)
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(file_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(raw.dtypes).get("ts")
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


# ---------------------------------------------------------------------------
# Batch-mode window aggregations (oracle-checked)
# ---------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT CAST(floor(epoch(time_bucket(INTERVAL 10 MINUTES, ts))) AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL 10 MINUTES, ts), event_type
"""


@register("tumbling_window_agg", oracle=_TUMBLING_ORACLE, tags=("streaming", "headline"))
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows × event_type (batch mode; §2.10)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_SLIDING_ORACLE = """
WITH starts AS (
    SELECT unnest([time_bucket(INTERVAL 5 MINUTES, ts),
                   time_bucket(INTERVAL 5 MINUTES, ts) - INTERVAL 5 MINUTES]) AS ws,
           value
    FROM events
)
SELECT CAST(floor(epoch(ws)) AS BIGINT) AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM starts
GROUP BY ws
"""


@register("sliding_window_agg", oracle=_SLIDING_ORACLE, tags=("streaming",))
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows, 10-minute length / 5-minute slide: every event lands
    in exactly two windows; the oracle materializes both starts explicitly."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(epoch_s(F.col("w.start")).alias("window_start"), "n", "sum_value")
    )


_SESSION_ORACLE = """
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                     OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTES
                THEN 1 ELSE 0 END AS brk
    FROM events
), g AS (
    SELECT user_id, ts, value,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM o
)
SELECT user_id,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM g GROUP BY user_id, sid
"""


@register("session_window_agg", oracle=_SESSION_ORACLE, tags=("streaming",))
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute inactivity gap per user (batch mode).
    The oracle is the classic gaps-and-islands formulation; a session closes
    when the next event arrives ≥ gap after the previous one (Spark session
    windows are half-open [start, last+gap))."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            epoch_s(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# True streaming runs (⊘ rows-only — micro-batch execution, memory sink)
# ---------------------------------------------------------------------------


def run_stream_to_memory(
    agg: DataFrame, spark: SparkSession, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming aggregation to a memory sink with
    Trigger.AvailableNow (process everything available, then stop)."""
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


@register("stream_tumbling_counts", oracle=None, tags=("streaming",))
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming run: parquet file source → 30-minute
    watermark → tumbling 10-minute count/sum → memory sink (AvailableNow).
    ⊘ rows-only; tests assert it matches the batch tumbling query."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, spark, "rsbd_stream_tumbling")


@register("stream_approx_distinct_users", oracle=None, tags=("streaming",))
def stream_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cardinality: distinct users per tumbling window via
    HyperLogLog state — THE production streaming-distinct pattern.
    An exact streaming COUNT(DISTINCT) needs an unbounded per-window
    value set in the state store; the HLL partial is a fixed-size,
    MERGEABLE register bank, so state stays O(windows·log log n) no
    matter how many users flow through, and late rows (within the
    watermark) merge into the existing sketch instead of re-scanning.
    rsd=0.02 ⇒ ~2% standard error. ⊘ rows-only; tests gate each
    window's estimate against the batch exact distinct count."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "event_type",
            "approx_users",
        )
    )
    return run_stream_to_memory(agg, spark, "rsbd_stream_approx_distinct")


@register("stream_sliding_counts", oracle=None, tags=("streaming",))
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming sliding windows (10 min / 5 min slide) with watermark.
    ⊘ rows-only; tests assert parity with the batch sliding query."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(epoch_s(F.col("w.start")).alias("window_start"), "n", "sum_value")
    )
    return run_stream_to_memory(agg, spark, "rsbd_stream_sliding")


@register("stream_session_windows", oracle=None, tags=("streaming",))
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming sessionization: watermarked session_window per user.
    ⊘ rows-only; tests assert parity with the batch session query."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_s(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )
    return run_stream_to_memory(agg, spark, "rsbd_stream_sessions")


def rate_source_demo(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate source (§2.10 'file/rate source'): the built-in synthetic stream
    generator, shaped like the events table — the local stand-in for a
    Kafka/Kinesis source; swapping `format("rate")` for `format("kafka")`
    leaves the rest of the plan untouched. Library function; exercised by
    tests/test_streaming.py with a short timed run."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 50).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
    )


def run_stream_foreach_batch(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> list[int]:
    """foreachBatch sink demo (§2.10): write each micro-batch of a filtered
    stream to partitioned parquet. Returns per-batch row counts (library
    function, exercised by tests — not a registered query)."""
    counts: list[int] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        counts.append(n)
        batch_df.write.mode("append").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    ev = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    q = ev.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination()
    return counts


_DEDUP_EVENTS_ORACLE = """
SELECT event_id, user_id, event_type, ROUND(value, 6) AS value
FROM (
    SELECT event_id, user_id, event_type, value FROM events
    UNION ALL
    SELECT event_id, user_id, event_type, value FROM events
)
GROUP BY event_id, user_id, event_type, value
"""


@register("dedup_events_replayed", oracle=_DEDUP_EVENTS_ORACLE, tags=("streaming", "dedup"))
def dedup_events_replayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of at-least-once stream dedup: the event stream replayed
    twice (union with itself — the delivery-duplicate model), then
    dropDuplicates on the event key. The oracle certifies the deduped
    output is exactly one row per event. One shuffle on event_id; at scale
    this is the idempotent-ingestion primitive in every exactly-once
    pipeline (the streaming twin below bounds its state by watermark)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    return (
        ev.unionByName(ev)
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type", F.round("value", 6).alias("value"))
    )


@register("stream_dedup_replayed", oracle=None, tags=("streaming", "dedup"))
def stream_dedup_replayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming dedup: two readStream branches over the same source
    (an at-least-once redelivery), unioned, watermarked, then
    dropDuplicatesWithinWatermark on event_id — state for a key is dropped
    once the watermark passes it, so dedup state is bounded no matter how
    long the stream runs (plain dropDuplicates on a stream retains keys
    forever). ⊘ rows-only; parity with the batch twin asserted in
    tests/test_streaming.py."""
    a = events_stream(spark, sf_dir)
    b = events_stream(spark, sf_dir)
    dedup = (
        a.unionByName(b)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", F.round("value", 6).alias("value"))
    )
    return run_stream_to_memory(dedup, spark, "rsbd_stream_dedup", output_mode="append")


_ATTRIBUTION_ORACLE = """
SELECT p.event_id AS purchase_id,
       c.event_id AS click_id,
       p.user_id  AS user_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase'
 AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 12 HOUR
 AND c.ts <= p.ts
"""


def _attribution(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Every (purchase, click) pair for the same user with the click in the
    12 h before the purchase — the ad-attribution interval join. The user
    equality is the shuffle key; the time bound is the join residual that
    (in streaming) also bounds state retention."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    return p.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 12 HOURS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (epoch_us("p_ts") - epoch_us("c_ts")).alias("gap_us"),
    )


@register("attribution_click_purchase", oracle=_ATTRIBUTION_ORACLE, tags=("streaming", "join"))
def attribution_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join: purchases matched to
    same-user clicks in the preceding 12 h. Both sides shuffle once on
    user_id (equi-key) and the interval predicate evaluates as the join
    residual; at 100 TB the selective event_type filters push to the scans
    first, so the shuffle carries only the two thin event streams."""
    ev = load(spark, sf_dir, "events")
    return _attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
    )


@register("stream_stream_join_attribution", oracle=None, tags=("streaming", "join"))
def stream_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True stream-stream inner join: two watermarked readStream branches
    (purchases, clicks) joined on user + a 12 h event-time interval.

    The canonical Structured Streaming form: BOTH sides carry watermarks
    and the join condition bounds event-time distance, so the state store
    evicts a click once the purchase-side watermark passes click_ts + 12 h
    — state is O(events in the window), not O(stream length). Inner-join
    matches emit append-mode in the micro-batch that completes the pair.
    ⊘ rows-only; parity with the batch twin asserted in
    tests/test_streaming.py."""
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 minutes")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 minutes")
    )
    joined = _attribution(purchases, clicks)
    return run_stream_to_memory(
        joined, spark, "rsbd_stream_attribution", output_mode="append"
    )


_ENRICHED_ORACLE = """
SELECT CAST(floor(epoch(time_bucket(INTERVAL 15 MINUTES, ts))) AS BIGINT)
           AS window_start,
       c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY time_bucket(INTERVAL 15 MINUTES, ts), c_mktsegment
"""


@register("dim_enriched_window_agg", oracle=_ENRICHED_ORACLE, tags=("streaming",))
def dim_enriched_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the stream-static enrichment: events joined to the
    customer dimension on user_id, then tumbling 15-minute windows per
    market segment. The hash-checked twin of `stream_static_dim_join`."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    from recommendation_system_big_data_spark.catalog import maybe_broadcast

    return (
        ev.join(
            maybe_broadcast(cust, sf_dir, "customer"),
            ev["user_id"] == cust["c_custkey"],
        )
        .groupBy(F.window("ts", "15 minutes").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "c_mktsegment",
            "n",
            "sum_value",
        )
    )


@register("stream_static_dim_join", oracle=None, tags=("streaming",))
def stream_static_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming stream-static join: the watermarked event stream is
    enriched against the STATIC customer dimension (re-read per micro-batch
    by Structured Streaming — the canonical pattern for dimension lookups
    in a streaming ETL; at scale the static side is a broadcast or a
    bucketed store, and slowly-changing dims swap in scd2_build's output).
    ⊘ rows-only; tests assert parity with `dim_enriched_window_agg`."""
    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .groupBy(F.window("ts", "15 minutes").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "c_mktsegment",
            "n",
            "sum_value",
        )
    )
    return run_stream_to_memory(agg, spark, "rsbd_stream_static_join")


@register("stream_foreachbatch_upsert", oracle=None, tags=("streaming",))
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch upsert sink — THE production pattern for streaming into
    a keyed store (Delta MERGE, JDBC upsert, a KV service): a per-user
    running aggregate streams in update mode, and every micro-batch's
    changed keys are merged into persistent state by delete-matching +
    append, emulating the transactional MERGE with a versioned parquet
    swap. The source is split into 4 files and throttled to
    maxFilesPerTrigger=1, so the merge genuinely runs several times with
    overlapping keys — the final state must equal the one-shot batch
    aggregate (tests assert parity).

    Scale: each micro-batch merge joins state against only the batch's
    keys (broadcast — update mode emits changed keys only); state is
    key-partitioned parquet, so the anti-join prunes to touched
    partitions. ⊘ rows-only (micro-batch execution is not
    SQL-expressible)."""
    from recommendation_system_big_data_spark.sources.sinks import _sink_dir

    src = _sink_dir(sf_dir, "fbsrc")
    ev = load(spark, sf_dir, "events")
    # deterministic 4-way split (not .repartition(4), whose row placement is
    # partitioner-dependent): event_id ranges → one file each → 4 triggers
    ev.withColumn("split", (F.col("event_id") % 4).cast("int")).write.mode(
        "overwrite"
    ).partitionBy("split").parquet(src)

    state_root = _sink_dir(sf_dir, "fbstate")
    state = {"path": None, "version": 0}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = batch_df.select("user_id", "n", "sum_value")
        if state["path"] is not None:
            prev = spark.read.parquet(state["path"])
            keep = prev.join(
                F.broadcast(new.select("user_id")), "user_id", "left_anti"
            )
            merged = keep.unionByName(new)
        else:
            merged = new
        state["version"] += 1
        out = os.path.join(state_root, f"v{state['version']}")
        merged.write.mode("overwrite").parquet(out)
        state["path"] = out

    raw = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        raw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    q = (
        agg.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state["path"])


def _assert_stream_batch_equiv(
    streamed: DataFrame, batch: DataFrame, name: str
) -> None:
    """Loud multiset-equality gate between a finished streaming run and
    its one-shot batch twin (VERDICT r11 #6). Distributed — two
    exceptAll counts, no driver collect of data rows."""
    extra = streamed.exceptAll(batch).count()
    missing = batch.exceptAll(streamed).count()
    if extra or missing:
        raise ValueError(
            f"{name}: stream/batch divergence — {extra} rows only in the "
            f"streaming result, {missing} only in the batch twin"
        )


@register(
    "stream_attribution_batch_equiv",
    oracle=_ATTRIBUTION_ORACLE,
    tags=("streaming", "join"),
)
def stream_attribution_batch_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-bearing equivalence harness for the stream-stream interval
    join (VERDICT r11 #6): runs the TRUE watermarked streaming join
    (stream_stream_join_attribution), asserts multiset equality with the
    batch twin in-query, and returns the STREAMING result — so the
    driver's DuckDB hash check covers the streaming join's math, not
    just the batch plan's. AvailableNow processes the full fixture, so
    no pair is watermark-dropped and exact parity is the contract, not a
    tolerance."""
    streamed = stream_stream_join_attribution(spark, sf_dir)
    batch = attribution_click_purchase(spark, sf_dir)
    _assert_stream_batch_equiv(streamed, batch, "stream_attribution_batch_equiv")
    return streamed


_FOREACHBATCH_STATE_ORACLE = """
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
"""


@register(
    "stream_foreachbatch_batch_equiv",
    oracle=_FOREACHBATCH_STATE_ORACLE,
    tags=("streaming",),
)
def stream_foreachbatch_batch_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-bearing equivalence harness for the foreachBatch upsert
    sink (VERDICT r11 #6): runs the real throttled 4-trigger streaming
    upsert (stream_foreachbatch_upsert), asserts its final persisted
    state equals the one-shot batch per-user aggregate in-query, and
    returns the streamed STATE — the driver's DuckDB hash check then
    covers the update-mode merge math (cumulative state, anti-join
    delete-matching, versioned swap), which the ⊘ rows-only row on the
    base job cannot see."""
    final_state = stream_foreachbatch_upsert(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "sum_value"
        ),
    )
    _assert_stream_batch_equiv(
        final_state.select("user_id", "n", "sum_value"),
        batch,
        "stream_foreachbatch_batch_equiv",
    )
    return final_state.select("user_id", "n", "sum_value")


_LINEAR_ATTRIBUTION_ORACLE = """
WITH purchases AS (
    SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us, value AS revenue
    FROM events WHERE event_type = 'purchase'
), clicks AS (
    SELECT event_id AS c_id, user_id, epoch_us(ts) AS c_us
    FROM events WHERE event_type = 'click'
), pairs AS (
    SELECT p.p_id, p.revenue, c.c_id
    FROM purchases p JOIN clicks c
      ON p.user_id = c.user_id
     AND c.c_us <= p.p_us
     AND c.c_us > p.p_us - 43200000000
), share AS (
    SELECT c_id,
           revenue / (COUNT(*) OVER (PARTITION BY p_id)) AS credit
    FROM pairs
)
SELECT c_id AS click_event_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases_touched,
       ROUND(SUM(credit), 4) AS attributed_revenue
FROM share GROUP BY c_id
"""


@register(
    "attribution_linear_multitouch",
    oracle=_LINEAR_ATTRIBUTION_ORACLE,
    tags=("streaming", "join"),
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's revenue splits
    EQUALLY across every same-user click in the preceding 12 h, and each
    click accumulates its credits — the fairer sibling of the last-touch
    model (`attribution_click_purchase` counts pairs; this one divides
    money). Marketing's default when no position model is trusted.

    Same scalable join shape as the batch interval join: both thin
    streams shuffle once on user_id and the 12 h bound is the join
    residual; the per-purchase touch count is a window on the PAIRS
    table partitioned by purchase (each purchase's pair group is small —
    clicks-per-user-per-12h), and the final fold groups by click. The
    division happens after counting, so credits sum exactly to attributed
    revenue per purchase. ROUND(4) covers the credit summation order."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        epoch_us("ts").alias("p_us"),
        F.col("value").alias("revenue"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        "user_id",
        epoch_us("ts").alias("c_us"),
    )
    pairs = purchases.join(clicks, "user_id").where(
        (F.col("c_us") <= F.col("p_us"))
        & (F.col("c_us") > F.col("p_us") - 43_200_000_000)
    )
    share = pairs.select(
        "c_id",
        (
            F.col("revenue")
            / F.count(F.lit(1)).over(Window.partitionBy("p_id"))
        ).alias("credit"),
    )
    return share.groupBy(F.col("c_id").alias("click_event_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases_touched"),
        F.round(F.sum("credit"), 4).alias("attributed_revenue"),
    )


def _ordered_stream_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, int]:
    """Three-file streaming fixture with CONTROLLED arrival order:
    00_head holds the LAST 20 days of history (its max event time sets
    the watermark), 01_mid holds the single newest event again (a no-op
    batch whose only job is to age the watermark one batch — Spark's
    late-row FILTER uses the watermark with a one-batch lag: batch N
    filters with the watermark that was operative in batch N-1, while
    eviction/emission uses the freshly advanced value), and 02_late
    replays the FIRST ~10 days — by then hopelessly behind the filtering
    watermark, so every row is dropped (numRowsDroppedByWatermark).
    File names and mtimes both ascend so FileStreamSource ordering is
    unambiguous. Returns (dir, n_late_rows)."""
    import time as _time

    from recommendation_system_big_data_spark.sources.sinks import _sink_dir

    out = _sink_dir(sf_dir, "latefix")
    ev = load(spark, sf_dir, "events")
    agg = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 20 DAY")).alias("c"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    cutoff, mx = agg["c"], agg["mx"]
    head = ev.where(F.col("ts") >= F.lit(cutoff))
    mid = ev.where(F.col("ts") == F.lit(mx))
    late = ev.where(F.col("ts") < F.lit(cutoff))
    n_late = late.count()
    head.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "h"))
    mid.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "m"))
    late.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "l"))
    import glob
    import shutil

    os.makedirs(os.path.join(out, "stream"), exist_ok=True)
    order = (
        ("h", "00_head.parquet"),
        ("m", "01_mid.parquet"),
        ("l", "02_late.parquet"),
    )
    now = _time.time()
    for i, (sub, name) in enumerate(order):
        src = glob.glob(os.path.join(out, sub, "part-*.parquet"))[0]
        dst = os.path.join(out, "stream", name)
        shutil.copyfile(src, dst)
        os.utime(dst, (now - 90 + i * 30, now - 90 + i * 30))
    return os.path.join(out, "stream"), n_late


@register("stream_watermark_late_drop", oracle=None, tags=("streaming",))
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data DROP semantics, demonstrated for real: three
    micro-batches (maxFilesPerTrigger=1 over an order-pinned fixture) —
    batch 0 carries the newest 20 days (advancing the watermark to
    max(ts)−1d), batch 1 is a no-op that AGES that watermark one batch,
    and batch 2 replays the oldest ~10 days, which are then dropped at
    the stateful operator. The aging batch pins the subtle real
    contract this build exhibits: the late-row FILTER applies the
    watermark with a ONE-BATCH LAG (batch N filters with batch N−1's
    operative watermark), while state eviction/append emission uses the
    fresh value — so "one batch late" data is still aggregated (and its
    window late-emitted), and only "two+ batches late" data drops. The
    eviction half is what bounds state at 100 TB; the lag half is why
    append-mode consumers must upsert by window key rather than assume
    exactly-one-emission.

    ⊘ rows-only; tests/test_streaming.py asserts the parity: emitted
    windows equal the batch aggregation of the head data alone, the
    dropped rows' early windows never appear, and those windows ARE
    present in the no-watermark batch answer."""
    ensure_runtime_conf(spark)
    path, _ = _ordered_stream_fixture(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    ts = F.col("ts")
    if dict(raw.dtypes).get("ts") == "timestamp_ntz":
        ts = F.col("ts").cast("timestamp")
    ev = raw.select(ts.alias("ts"), "event_type", "value").withWatermark(
        "ts", "1 day"
    )
    agg = (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(epoch_s(F.col("w.start")).alias("window_start"), "n")
    )
    return run_stream_to_memory(
        agg, spark, "rsbd_stream_late_drop", output_mode="append"
    )


_STATE_READ_ORACLE = _TUMBLING_ORACLE


@register(
    "stream_state_store_read",
    oracle=_STATE_READ_ORACLE,
    tags=("streaming",),
)
def stream_state_store_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming state-store OBSERVABILITY via the `statestore` batch
    data source (Spark 4's state reader, SPARK-45511): run the tumbling
    count/sum aggregation as a real stream with a checkpoint, then read
    the checkpoint's state store back as a batch DataFrame — the way an
    operator debugs a wedged stateful query in production (what keys is
    it holding? how big? which partition?) WITHOUT touching the running
    job's internals.

    The correctness twist that makes this oracle-CHECKED rather than
    rows-only: for a complete-mode aggregation drained with
    Trigger.AvailableNow, the final state IS the aggregate — so the
    flattened state rows must hash-match the same DuckDB oracle the
    batch `tumbling_window_agg` runs against. A streaming run, a
    checkpoint round-trip, and the state codec all sit between the
    input and the check; any state corruption or window-assignment
    drift would break the hash.

    The state frame is localCheckpoint-materialized before the temp
    checkpoint directory is removed, and `partition_id` is dropped — it
    depends on the session's shuffle-partition count, which is exactly
    the kind of layout detail the output must not leak. Scale shape:
    state readers shard by store partition; reading is a parallel scan
    of the HDFS-backed store files, never a replay of the input."""
    import shutil
    import tempfile

    ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
    )
    chk = tempfile.mkdtemp(prefix="rsbd_state_read_")
    name = "rsbd_state_read_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    query = (
        agg.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", chk)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    state = (
        spark.read.format("statestore")
        .load(chk)
        .select(
            # the state schema names the grouping window field `window`
            # (the pre-alias name) and the agg buffer fields by their
            # FUNCTIONS (`count`, `sum`, plus sum's isEmpty flag)
            epoch_s(F.col("key.window.start")).alias("window_start"),
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n"),
            F.col("value.sum").cast("double").alias("sum_value"),
        )
        .localCheckpoint()  # materialize BEFORE the checkpoint dir goes away
    )
    shutil.rmtree(chk, ignore_errors=True)
    return state
