"""Time-series resampling and signal operators over the event stream.

SURVEY.md §2.5 declares windowed time analytics an engine surface; these
operators add the batch time-series toolkit a metrics/ML pipeline expects
on top of the existing tumbling/sliding/session windows: bar resampling
(OHLC), rolling activity, trend signals (SMA crossover), drawdown,
seasonality and changepoint scans.

Shared scale discipline: the fact table is always reduced to a coarse
grain FIRST (day, user, (day,user)) with one map-side-combined groupBy,
revenue/value sums ride as exact DECIMALs so cross-engine comparisons are
bit-stable, and every subsequent window runs on the reduced grain. The
only unpartitioned windows here run on the daily grain (≤ retention-period
days — constant-sized, not data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


_OHLC_ORACLE = """
WITH keyed AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           value,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
             || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
    FROM events
)
SELECT day,
       arg_min(value, ord) AS open,
       MAX(value)          AS high,
       MIN(value)          AS low,
       arg_max(value, ord) AS close,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS volume,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM keyed
GROUP BY day
"""


@register("ts_resample_ohlc", oracle=_OHLC_ORACLE, tags=("window", "timeseries"))
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars over event values — downsampling a point series to
    open/high/low/close/volume bars, the canonical tick→bar compaction
    every metrics store and market-data pipeline runs.

    ONE aggregation, no window: open/close are `min_by`/`max_by` with a
    (ts, event_id) struct orderkey — fully partial-aggregable (each
    partition keeps its earliest/latest candidate, merge keeps the
    winner), so the plan is a single map-side-combined groupBy on day
    with no sort and no second scan. The oracle reproduces the selection
    with a zero-padded string orderkey (DuckDB's arg_min lacks struct
    keys); event_id uniqueness makes the orderkey total, so both engines
    pick identical rows. Volume sums ride as DECIMAL for cross-engine
    exactness."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.to_date("ts").alias("day"),
            "value",
            F.struct("ts", "event_id").alias("ord"),
        )
        .groupBy("day")
        .agg(
            F.min_by("value", "ord").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ord").alias("close"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("volume"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


_DRAWDOWN_ORACLE = """
WITH c AS (
    SELECT user_id, ts, event_id,
           SUM(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM events
), d AS (
    SELECT user_id, ts, event_id, cum,
           MAX(cum) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS peak,
           lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
             || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
    FROM c
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT)        AS n_events,
       ROUND(MAX(cum), 6)              AS peak_value,
       ROUND(arg_max(cum, ord), 6)     AS final_value,
       ROUND(MAX(peak - cum), 6)       AS max_drawdown
FROM d
GROUP BY user_id
"""


def max_drawdown_per_key(
    ev: DataFrame, key: str = "user_id", value: str = "value",
    ts: str = "ts", ordcol: str = "event_id",
) -> DataFrame:
    """Library kernel: per-key max drawdown of the cumulative value
    series — stacked running-sum + running-max windows on one
    partitioning/ordering, then a per-key fold. Output: key, n_events,
    peak_value, final_value, max_drawdown. Property-tested against a
    sequential accumulator in tests/test_property_stats.py."""
    w = Window.partitionBy(key).orderBy(ts, ordcol).rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = ev.select(
        key,
        F.struct(ts, ordcol).alias("ord"),
        F.sum(value).over(w).alias("cum"),
    )
    d = c.select(
        key,
        "ord",
        "cum",
        F.max("cum")
        .over(
            Window.partitionBy(key)
            .orderBy("ord")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .alias("peak"),
    )
    return d.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.max("cum"), 6).alias("peak_value"),
        F.round(F.max_by("cum", "ord"), 6).alias("final_value"),
        F.round(F.max(F.col("peak") - F.col("cum")), 6).alias("max_drawdown"),
    )


@register("ts_max_drawdown", oracle=_DRAWDOWN_ORACLE, tags=("window", "timeseries"))
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of the cumulative value series: largest
    peak-to-trough drop of the running total — the risk/health metric for
    any monotone-ish KPI (balance, engagement score, SLA budget).

    Two stacked running windows on the SAME partitioning+ordering
    (cumulative sum, then running max of it) — Spark plans a single
    exchange and a single sort feeding both Window operators, then one
    groupBy on the already-partitioned user key. Running sums accumulate
    in frame order, so the doubles are bit-identical across engines (same
    class as the oracle-green `window_running_sum`); the final-value pick
    uses the total (ts, event_id) orderkey via max_by/arg_max."""
    return max_drawdown_per_key(load(spark, sf_dir, "events"))


_SMA_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
    FROM events
    GROUP BY 1
), sma AS (
    SELECT day,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
           CAST(SUM(rev) OVER (
               ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 3 AS sma_fast,
           CAST(SUM(rev) OVER (
               ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 7 AS sma_slow
    FROM daily
), sig AS (
    SELECT day, sma_fast, sma_slow,
           sma_fast - sma_slow AS diff,
           LAG(sma_fast - sma_slow) OVER (ORDER BY day) AS prev_diff
    FROM sma
    WHERE rn >= 7
)
SELECT day,
       ROUND(sma_fast, 4) AS sma_fast,
       ROUND(sma_slow, 4) AS sma_slow,
       CASE WHEN diff > 0 THEN 'golden_cross' ELSE 'death_cross' END AS signal
FROM sig
WHERE prev_diff IS NOT NULL
  AND ((diff > 0 AND prev_diff <= 0) OR (diff < 0 AND prev_diff >= 0))
"""


@register("ts_sma_crossover", oracle=_SMA_ORACLE, tags=("window", "timeseries"))
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fast/slow moving-average crossover detection on the daily value
    series — the classic trend-change trigger (3-day SMA crossing the
    7-day SMA), generalized to any KPI monitored for regime shifts.

    The fact table folds to the daily grain first; all SMA windows and
    the LAG run on that constant-sized series (≤ retention days), so the
    unpartitioned window is bounded regardless of fact volume. Daily
    revenue is an exact DECIMAL sum and both SMAs divide the exact sum as
    a double — so the crossover comparisons see bit-identical values on
    both engines and the emitted signal set is hash-stable (no epsilon
    games on the sign tests). Partial leading windows are excluded
    (rn >= 7) so denominators are the fixed 3 and 7."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    sma = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("rn"),
        (F.sum("rev").over(w3).cast("double") / 3).alias("sma_fast"),
        (F.sum("rev").over(w7).cast("double") / 7).alias("sma_slow"),
    ).where(F.col("rn") >= 7)
    diff = F.col("sma_fast") - F.col("sma_slow")
    sig = sma.select(
        "day",
        "sma_fast",
        "sma_slow",
        diff.alias("diff"),
        F.lag(diff).over(Window.orderBy("day")).alias("prev_diff"),
    )
    return sig.where(
        F.col("prev_diff").isNotNull()
        & (
            ((F.col("diff") > 0) & (F.col("prev_diff") <= 0))
            | ((F.col("diff") < 0) & (F.col("prev_diff") >= 0))
        )
    ).select(
        "day",
        F.round("sma_fast", 4).alias("sma_fast"),
        F.round("sma_slow", 4).alias("sma_slow"),
        F.when(F.col("diff") > 0, F.lit("golden_cross"))
        .otherwise(F.lit("death_cross"))
        .alias("signal"),
    )


_SEASONAL_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
    FROM orders
    GROUP BY 1
), tot AS (
    SELECT CAST(SUM(rev) AS DOUBLE) AS total_rev,
           CAST(COUNT(*) AS BIGINT) AS total_days
    FROM daily
)
SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 2) AS avg_daily_rev,
       ROUND(
           (CAST(SUM(rev) AS DOUBLE) / COUNT(*))
           / (MAX(total_rev) / MAX(total_days)),
           6
       ) AS seasonal_index
FROM daily CROSS JOIN tot
GROUP BY 1
"""


@register("ts_seasonal_index", oracle=_SEASONAL_ORACLE, tags=("window", "timeseries"))
def ts_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of order revenue: each weekday's average
    daily revenue relative to the overall daily average (index 1.0 = a
    typical day) — the first factor peeled off in any demand
    decomposition, and the denominator for weekday-corrected anomaly
    alerts.

    Orders fold to the daily grain once (exact DECIMAL sums); the 1-row
    grand total joins back as a broadcast so the index derives from the
    DAILY aggregate only — the fact table is scanned exactly once
    regardless of how many seasonal factors are read off. Spark's
    dayofweek (1=Sunday) is pinned as the output convention; the oracle
    maps DuckDB's 0-based dayofweek onto it."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev")
        )
    )
    tot = daily.agg(
        F.sum("rev").cast("double").alias("total_rev"),
        F.count(F.lit(1)).cast("long").alias("total_days"),
    )
    avg_daily = F.sum("rev").cast("double") / F.count(F.lit(1))
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy(F.dayofweek("day").cast("int").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(avg_daily, 2).alias("avg_daily_rev"),
            F.round(
                avg_daily / (F.max("total_rev") / F.max("total_days")), 6
            ).alias("seasonal_index"),
        )
    )


_ROLLING_ACTIVE_ORACLE = """
WITH du AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
    FROM events
), spine AS (
    SELECT DISTINCT day FROM du
), fanned AS (
    SELECT du.day + CAST(o.o AS INT) AS report_day, du.user_id
    FROM du CROSS JOIN (SELECT UNNEST(generate_series(0, 6)) AS o) o
)
SELECT s.day AS report_day,
       CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS active_users_7d,
       CAST(COUNT(*) AS BIGINT) AS user_days_7d
FROM fanned f JOIN spine s ON f.report_day = s.day
GROUP BY s.day
"""


@register(
    "ts_rolling_active_users",
    oracle=_ROLLING_ACTIVE_ORACLE,
    tags=("window", "timeseries"),
)
def ts_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling active users (WAU) per day — THE product activity
    metric, and the textbook case where the naive form (count distinct
    over a sliding range frame) simply does not exist as a window
    aggregate in either engine.

    Scalable shape: the fact table first dedups to (day, user) — one
    map-side-combined aggregation that collapses arbitrarily many events
    per user-day to one row — then each user-day is fanned out to the 7
    report days it contributes to via an in-row `explode(sequence(0,6))`
    (pure narrow op, no join), and one groupBy per report day counts
    distinct users. Fan-out is 7× of the REDUCED grain, every join is an
    equi-join (the day-spine probe that trims partial trailing windows is
    a broadcast of the tiny date dimension), and there is no range
    self-join or nested loop anywhere."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct()
    fanned = du.select(
        "day", "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o")
    ).select(F.date_add("day", F.col("o")).alias("report_day"), "user_id")
    return (
        fanned.join(
            F.broadcast(spine.withColumnRenamed("day", "report_day")),
            "report_day",
        )
        .groupBy("report_day")
        .agg(
            F.countDistinct("user_id").cast("long").alias("active_users_7d"),
            F.count(F.lit(1)).cast("long").alias("user_days_7d"),
        )
    )


_CUSUM_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS rev
    FROM events
    GROUP BY 1
), m AS (
    SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_rev FROM daily
), c AS (
    SELECT day, rev, rev - mean_rev AS dev,
           SUM(rev - mean_rev) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cusum
    FROM daily CROSS JOIN m
)
SELECT day,
       ROUND(rev, 2)   AS daily_rev,
       ROUND(dev, 6)   AS deviation,
       ROUND(cusum, 6) AS cusum,
       CAST(ABS(cusum) = MAX(ABS(cusum)) OVER () AS BOOLEAN) AS is_changepoint
FROM c
"""


@register("ts_changepoint_cusum", oracle=_CUSUM_ORACLE, tags=("window", "timeseries"))
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily value series: cumulative sum
    of deviations from the global mean; the day where |CUSUM| peaks is
    the single most likely level-shift point (the classic offline CUSUM
    estimator). Flags that day alongside the full diagnostic series.

    Fact → daily grain first (exact DECIMAL sums cast once to double, so
    both engines hold bit-identical inputs); the global mean joins back
    as a 1-row broadcast; the running CUSUM and its |max| run on the
    constant-sized daily series. The argmax flag compares doubles
    produced by an identical fixed-order accumulation on both engines —
    deterministic, no epsilon."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("rev")
        )
    )
    m = daily.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("mean_rev")
    )
    run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(m)).select(
        "day",
        "rev",
        (F.col("rev") - F.col("mean_rev")).alias("dev"),
        F.sum(F.col("rev") - F.col("mean_rev")).over(run).alias("cusum"),
    )
    return c.select(
        "day",
        F.round("rev", 2).alias("daily_rev"),
        F.round("dev", 6).alias("deviation"),
        F.round("cusum", 6).alias("cusum"),
        (
            F.abs(F.col("cusum"))
            == F.max(F.abs(F.col("cusum"))).over(
                Window.partitionBy()
            )
        ).alias("is_changepoint"),
    )


_SEASONAL_ANOMALY_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS rev
    FROM orders
    GROUP BY 1
), idx AS (
    SELECT CAST(dayofweek(day) + 1 AS INT) AS dow,
           CAST(SUM(CAST(rev AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
               AS dow_avg
    FROM daily GROUP BY 1
), deseason AS (
    SELECT d.day, d.rev, i.dow_avg,
           ROUND(d.rev / i.dow_avg, 6) AS ratio
    FROM daily d JOIN idx i ON CAST(dayofweek(d.day) + 1 AS INT) = i.dow
), stats AS (
    SELECT AVG(ratio) AS mu, STDDEV_POP(ratio) AS sigma FROM deseason
)
SELECT day,
       ROUND(rev, 2) AS daily_rev,
       ratio AS deseasonalized_ratio,
       CASE WHEN sigma = 0 THEN NULL
            ELSE ROUND((ratio - mu) / sigma, 4) END AS z_score,
       CASE WHEN sigma = 0 THEN NULL
            ELSE CAST(ABS((ratio - mu) / sigma) > 2.0 AS BOOLEAN)
            END AS is_anomaly
FROM deseason CROSS JOIN stats
"""


@register(
    "ts_seasonal_anomaly", oracle=_SEASONAL_ANOMALY_ORACLE, tags=("window", "timeseries")
)
def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-corrected revenue anomaly flags: divide each day's revenue
    by its day-of-week average (the `ts_seasonal_index` factor), z-score
    the deseasonalized ratios, flag |z| > 2 — so a slow Sunday isn't an
    incident and a slow Tuesday is. The composition layer over the
    seasonal-index and rolling-zscore primitives.

    Everything beyond the one fact→daily fold runs on the daily grain:
    the per-dow averages are a 7-row re-aggregation joined back as a
    broadcast, the z-stats are a 1-row broadcast. Ratios are rounded
    before the z-stats so both engines feed identical inputs into the
    mean/std fold; the z itself rounds at 4 (cross-engine summation
    order over the day grain)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("rev")
        )
    )
    idx = daily.groupBy(F.dayofweek("day").cast("int").alias("dow")).agg(
        (
            F.sum(F.col("rev").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("dow_avg")
    )
    deseason = daily.join(
        F.broadcast(idx), F.dayofweek("day").cast("int") == F.col("dow")
    ).select(
        "day", "rev", F.round(F.col("rev") / F.col("dow_avg"), 6).alias("ratio")
    )
    stats = deseason.agg(
        F.avg("ratio").alias("mu"), F.stddev_pop("ratio").alias("sigma")
    )
    z = (F.col("ratio") - F.col("mu")) / F.col("sigma")
    # σ = 0 (a flat deseasonalized series — e.g. a single day of data)
    # leaves the z-score undefined: NULL on both engines, not an ANSI
    # raise (Welford σ of a constant column is exactly 0.0). r13 probe.
    flat = F.col("sigma") == 0
    return deseason.crossJoin(F.broadcast(stats)).select(
        "day",
        F.round("rev", 2).alias("daily_rev"),
        F.col("ratio").alias("deseasonalized_ratio"),
        F.when(flat, F.lit(None).cast("double"))
        .otherwise(F.round(z, 4))
        .alias("z_score"),
        F.when(flat, F.lit(None).cast("boolean"))
        .otherwise(F.abs(z) > 2.0)
        .alias("is_anomaly"),
    )


_WOW_ORACLE = """
WITH weekly AS (
    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS rev,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
)
SELECT week_start,
       ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
       n_orders,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(LAG(rev) OVER (ORDER BY week_start) AS DOUBLE) - 1,
             6) AS wow_growth,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(LAG(rev, 4) OVER (ORDER BY week_start) AS DOUBLE) - 1,
             6) AS vs_4w_ago
FROM weekly
"""


@register("ts_wow_growth", oracle=_WOW_ORACLE, tags=("window", "timeseries"))
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week and vs-4-weeks-ago growth rates of order revenue —
    the exec-dashboard staple, with the week boundary pinned to ISO
    Monday (`date_trunc('week')` agrees between the engines) so "this
    week" means the same rows everywhere.

    Fact → weekly grain in one map-side-combined groupBy (exact DECIMAL
    revenue); both LAG offsets share the single ordered window over the
    constant-sized weekly series. NULL growth on the first rows is kept
    (no COALESCE-to-zero — a missing baseline is not 0% growth)."""
    weekly = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    w = Window.orderBy("week_start")
    return weekly.select(
        "week_start",
        F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        "n_orders",
        F.round(
            F.col("rev").cast("double") / F.lag("rev").over(w).cast("double") - 1,
            6,
        ).alias("wow_growth"),
        F.round(
            F.col("rev").cast("double")
            / F.lag("rev", 4).over(w).cast("double")
            - 1,
            6,
        ).alias("vs_4w_ago"),
    )


_NEW_RETURNING_ORACLE = """
WITH du AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
    FROM events
), first_seen AS (
    SELECT user_id, MIN(day) AS first_day FROM du GROUP BY user_id
)
SELECT du.day,
       CAST(COUNT(CASE WHEN du.day = fs.first_day THEN 1 END) AS BIGINT)
           AS new_users,
       CAST(COUNT(CASE WHEN du.day > fs.first_day THEN 1 END) AS BIGINT)
           AS returning_users,
       ROUND(COUNT(CASE WHEN du.day > fs.first_day THEN 1 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS returning_share
FROM du JOIN first_seen fs ON du.user_id = fs.user_id
GROUP BY du.day
"""


@register(
    "ts_new_vs_returning", oracle=_NEW_RETURNING_ORACLE, tags=("window", "timeseries")
)
def ts_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new vs returning active users — the growth-accounting split
    (is the DAU line new acquisition or retention?) that pairs with
    `ts_rolling_active_users` (how many) and `cohort_retention` (how
    long they stay).

    Same dedup-first discipline as the WAU op: facts collapse to
    (day, user) once; first-seen dates are one more groupBy of that
    REDUCED grain; and the classification join runs (day,user)⋈(user) —
    both sides already user-keyed, so Spark reuses the partitioning.
    Integer counts throughout; the share division is the only double."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = du.join(first_seen, "user_id")
    new = F.count(F.when(F.col("day") == F.col("first_day"), 1))
    ret = F.count(F.when(F.col("day") > F.col("first_day"), 1))
    return j.groupBy("day").agg(
        new.cast("long").alias("new_users"),
        ret.cast("long").alias("returning_users"),
        F.round(ret / F.count(F.lit(1)).cast("double"), 6).alias(
            "returning_share"
        ),
    )


_FORECAST_ORACLE = """
WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE))
               AS idx,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS rev
    FROM events GROUP BY 1
), fit AS (
    SELECT regr_slope(rev, idx) AS b, regr_intercept(rev, idx) AS a,
           MAX(idx) AS last_idx
    FROM daily
)
SELECT CAST(DATE '1970-01-01' + INTERVAL (f.last_idx + h.h) DAY AS DATE)
           AS forecast_day,
       CAST(h.h AS BIGINT) AS horizon_days,
       ROUND(f.a + f.b * (f.last_idx + h.h), 4) AS forecast_rev
FROM fit f CROSS JOIN (SELECT UNNEST(generate_series(1, 7)) AS h) h
"""


@register("ts_forecast_linear", oracle=_FORECAST_ORACLE, tags=("window", "timeseries"))
def ts_forecast_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day linear-trend revenue forecast: OLS of daily revenue on the
    day index (regr_slope/regr_intercept — one aggregate fold), then the
    fitted line extrapolated over a generated horizon — the
    capacity-planning baseline every fancier forecaster must beat, and
    the trend leg a seasonal forecast composes with `ts_seasonal_index`.

    Fact → daily grain once (exact DECIMAL revenue); the fit is a 1-row
    aggregate of that constant-sized series; the horizon is an exploded
    literal sequence against the broadcast fit — forecasting N days is
    O(N) rows of scalar algebra, no recursion, no driver loop."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "idx"
            )
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("rev")
        )
    )
    fit = daily.agg(
        F.regr_slope("rev", "idx").alias("b"),
        F.regr_intercept("rev", "idx").alias("a"),
        F.max("idx").alias("last_idx"),
    )
    horizon = fit.select(
        "a",
        "b",
        "last_idx",
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"),
    )
    return horizon.select(
        F.date_add(
            F.lit("1970-01-01").cast("date"), (F.col("last_idx") + F.col("h")).cast("int")
        ).alias("forecast_day"),
        F.col("h").cast("long").alias("horizon_days"),
        F.round(
            F.col("a") + F.col("b") * (F.col("last_idx") + F.col("h")), 4
        ).alias("forecast_rev"),
    )


_XCORR_ORACLE = """
WITH daily AS (
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE)
               AS clicks,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS DOUBLE)
               AS buys
    FROM events GROUP BY 1
), lagged AS (
    SELECT l.l AS lag_days, a.clicks AS x, b.buys AS y
    FROM daily a
    JOIN (SELECT UNNEST(generate_series(-3, 3)) AS l) l ON TRUE
    JOIN daily b ON b.day = a.day + CAST(l.l AS INT)
)
SELECT CAST(lag_days AS BIGINT) AS lag_days,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CORR(x, y), 6) AS xcorr
FROM lagged GROUP BY lag_days
"""


@register("ts_cross_correlation", oracle=_XCORR_ORACLE, tags=("window", "timeseries"))
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation of daily clicks vs purchases (lags −3..+3
    days): does click volume LEAD purchase volume, and by how many days?
    The lead-lag scan behind marketing-mix timing and metric causality
    triage (`ts_autocorrelation` asks the same of a series against
    itself).

    Fact → daily grain once; the lag alignment is a 7-row lag spine
    fanned against the constant-sized daily table and an equi-join on
    the shifted day — all tiny after the single fact fold. Counts are
    exact; CORR's sums are the only doubles (ROUND 6)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("double")
        .alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("double")
        .alias("buys"),
    )
    spine = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag_days"))
    b = daily.select(F.col("day").alias("bday"), F.col("buys").alias("y"))
    lagged = (
        daily.select("day", "clicks")
        .crossJoin(F.broadcast(spine))
        .join(b, F.col("bday") == F.expr("date_add(day, lag_days)"))
    )
    return lagged.groupBy(F.col("lag_days").cast("long").alias("lag_days")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.corr("clicks", "y"), 6).alias("xcorr"),
    )


def _holt_fn(alpha: float, beta: float, horizon: int):
    """Factory for the per-key Holt linear-trend solve — nested closure
    so cloudpickle ships it by value (the probe_foreign_cwd contract)."""

    def holt(pdf):
        import pandas as pd

        pdf = pdf.sort_values("idx").reset_index(drop=True)
        key = pdf["event_type"].iloc[0]
        y = [float(v) for v in pdf["y"]]
        if len(y) < 2:
            return pd.DataFrame(
                {"event_type": [], "h": [], "forecast": []}
            ).astype({"event_type": "str", "h": "int64", "forecast": "float64"})
        level, trend = y[0], y[1] - y[0]
        for x in y[1:]:
            prev_level = level
            level = alpha * x + (1.0 - alpha) * (level + trend)
            trend = beta * (level - prev_level) + (1.0 - beta) * trend
        return pd.DataFrame(
            {
                "event_type": [key] * horizon,
                "h": list(range(1, horizon + 1)),
                # no rounding here: Python round() is half-even while the
                # oracle's ROUND is half-away-from-zero — the caller
                # applies F.round (HALF_UP, the repo-wide convention that
                # hash-matches DuckDB ROUND) on the raw double.
                "forecast": [
                    level + h * trend for h in range(1, horizon + 1)
                ],
            }
        )

    return holt


#: Holt smoothing constants + horizon: fixed (not fitted) so the solve
#: is a single deterministic pass both here and in the reference replay.
_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7

#: The Holt recurrence as a recursive CTE: one state row per
#: (event_type, step), advanced by joining the next daily observation.
#: Literals are the repr of the SAME Python-computed smoothing factors
#: the pandas solve uses (1-α, 1-β round to identical doubles), and the
#: level' expression is written once per term exactly as the Python
#: loop computes it, so every step is the same IEEE arithmetic DAG on
#: both engines — bit-identical states, ROUND(,6) at the very end only.
_HOLT_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM events GROUP BY 1, 2
), seq AS (
    SELECT event_type, y,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM daily
), rec(event_type, rn, n, level, trend) AS (
    SELECT s1.event_type, 2, s1.n,
           {_HOLT_ALPHA!r} * s2.y
               + {1.0 - _HOLT_ALPHA!r} * (s1.y + (s2.y - s1.y)),
           {_HOLT_BETA!r} * (({_HOLT_ALPHA!r} * s2.y
               + {1.0 - _HOLT_ALPHA!r} * (s1.y + (s2.y - s1.y))) - s1.y)
               + {1.0 - _HOLT_BETA!r} * (s2.y - s1.y)
    FROM seq s1 JOIN seq s2
      ON s2.event_type = s1.event_type AND s1.rn = 1 AND s2.rn = 2
    UNION ALL
    SELECT r.event_type, r.rn + 1, r.n,
           {_HOLT_ALPHA!r} * s.y
               + {1.0 - _HOLT_ALPHA!r} * (r.level + r.trend),
           {_HOLT_BETA!r} * (({_HOLT_ALPHA!r} * s.y
               + {1.0 - _HOLT_ALPHA!r} * (r.level + r.trend)) - r.level)
               + {1.0 - _HOLT_BETA!r} * r.trend
    FROM rec r JOIN seq s
      ON s.event_type = r.event_type AND s.rn = r.rn + 1
    WHERE r.rn < r.n
)
SELECT r.event_type, g.h, ROUND(r.level + g.h * r.trend, 6) AS forecast
FROM rec r, UNNEST(generate_series(1, {_HOLT_H})) AS g(h)
WHERE r.rn = r.n
"""


@register("ts_holt_linear", oracle=_HOLT_ORACLE, tags=("timeseries", "ml"))
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day Holt linear-trend (double exponential smoothing) forecast
    of daily value per event_type — the adaptive-trend sibling of
    ts_forecast_linear's global OLS line: Holt re-estimates level and
    trend at every step, so regime changes decay into the forecast at
    rate α/β instead of being averaged over the whole history.

    The recurrence is inherently order-sequential, so the shape is the
    same reduce-then-solve split as ml_isotonic_calibration: the fact
    table folds to the per-(event_type, day) grain FIRST (one
    map-combined shuffle; the solve input is |keys|·|days| rows
    regardless of corpus size), then one Arrow batch per key runs the
    textbook recurrence. Oracled since round 8: the recurrence IS
    SQL-expressible as a recursive CTE advancing one (level, trend)
    state row per step — both engines execute the identical IEEE
    arithmetic DAG (the DECIMAL daily fold makes the inputs
    bit-identical first), so the forecasts hash-match exactly.
    tests/test_property_roundsix.py additionally replays the recurrence
    in plain Python and requires cell-exact agreement."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        # DECIMAL accumulation: `value` is a 2-dp quantity, so the daily
        # sum in cents is exact and associative — summation order (which
        # differs between partitionings and engines) cannot move the
        # Holt input by an ulp. Cast back to double AFTER the exact sum.
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(
            _holt_fn(_HOLT_ALPHA, _HOLT_BETA, _HOLT_H),
            "event_type string, h long, forecast double",
        )
        # HALF_UP like DuckDB ROUND; the UDF's Python round() would be
        # half-even and could diverge on an exact 6-dp midpoint (r8 ADVICE).
        .select("event_type", "h", F.round("forecast", 6).alias("forecast"))
    )


#: Holdout length for the forecast backtest — the last week of each
#: event_type's daily series is scored against a fit on everything before.
BACKTEST_HOLDOUT_DAYS = 7

_BACKTEST_ORACLE = f"""
WITH daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM events GROUP BY 1, 2
), cut AS (
    SELECT event_type, MAX(idx) - {BACKTEST_HOLDOUT_DAYS} AS cutoff
    FROM daily GROUP BY 1
), d2 AS (
    SELECT daily.*, cut.cutoff FROM daily JOIN cut USING (event_type)
), fit AS (
    SELECT event_type,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS a,
           CAST(n AS BIGINT) AS n_train
    FROM (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(CAST(idx AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(rev AS DECIMAL(38,20))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(idx AS DOUBLE) * rev AS DECIMAL(38,20))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(idx AS DOUBLE) * CAST(idx AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE) AS sxx
        FROM d2 WHERE idx <= cutoff GROUP BY 1
    )
), scored AS (
    SELECT d2.event_type, fit.n_train,
           d2.rev - (fit.a + fit.b * d2.idx) AS err,
           d2.rev AS rev
    FROM d2 JOIN fit USING (event_type) WHERE d2.idx > d2.cutoff
)
SELECT event_type,
       MAX(n_train) AS n_train,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(CAST(SUM(CAST(abs(err) AS DECIMAL(38,20))) AS DOUBLE)
             / CAST(SUM(CAST(abs(rev) AS DECIMAL(38,20))) AS DOUBLE), 6)
           AS wape,
       ROUND(CAST(SUM(CAST(err AS DECIMAL(38,20))) AS DOUBLE)
             / CAST(SUM(CAST(abs(rev) AS DECIMAL(38,20))) AS DOUBLE), 6)
           AS bias,
       ROUND(sqrt(CAST(SUM(CAST(err * err AS DECIMAL(38,20))) AS DOUBLE)
                  / COUNT(*)), 6) AS rmse
FROM scored GROUP BY event_type
"""


@register(
    "ml_backtest_forecast", oracle=_BACKTEST_ORACLE, tags=("timeseries", "ml")
)
def ml_backtest_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting — the evaluation loop ts_forecast_linear's
    docstring promises ("the baseline every fancier forecaster must
    beat") made executable: per event_type, fit the OLS trend on all but
    the last BACKTEST_HOLDOUT_DAYS of the daily series, score the
    holdout, and report WAPE (weighted absolute percentage error — the
    scale-free number forecast teams actually compare), signed bias
    (over- vs under-forecasting), and RMSE, plus train/test sizes.

    Shape: one map-combined fold to the (event_type, day) grain is the
    only data-scaled stage; the per-type cutoffs and fits are |types|-row
    broadcast model tables; the error rollup aggregates the ≤holdout-
    sized test slice per type. Cross-engine determinism: the daily fold
    is DECIMAL-exact, the OLS coefficients come from exact-decimal
    moment sums divided once — NOT regr_slope/intercept, whose double
    accumulation is partition-order-dependent and gets amplified by
    idx ≈ 2·10⁴ before the error metrics (the embedding_covariance
    knife-edge class) — and every error sum accumulates through
    decimal(38,20), so partition order cannot move the ROUND(,6) hash
    at any layout."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    cut = daily.groupBy("event_type").agg(
        (F.max("idx") - BACKTEST_HOLDOUT_DAYS).alias("cutoff")
    )
    d2 = daily.join(F.broadcast(cut), "event_type")
    # OLS coefficients from exact-decimal moment sums divided once, NOT
    # regr_slope/regr_intercept: the builtin accumulates doubles in
    # partition order, which is the embedding_covariance knife-edge class
    # (r8) — an ulp shift in b is amplified by idx ≈ 2·10⁴ before the
    # ROUND(,6) error metrics. With decimal Σx/Σy/Σxy/Σx² both engines
    # evaluate one identical IEEE expression for (b, a).
    xd = F.col("idx").cast("double")
    dsum = lambda c: F.sum(c.cast("decimal(38,20)")).cast("double")  # noqa: E731
    moments = (
        d2.filter(F.col("idx") <= F.col("cutoff"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            dsum(xd).alias("sx"),
            dsum(F.col("rev")).alias("sy"),
            dsum(xd * F.col("rev")).alias("sxy"),
            dsum(xd * xd).alias("sxx"),
        )
    )
    b = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    fit = moments.select(
        "event_type",
        b.alias("b"),
        ((F.col("sy") - b * F.col("sx")) / F.col("n")).alias("a"),
        F.col("n").cast("long").alias("n_train"),
    )
    err = F.col("rev") - (F.col("a") + F.col("b") * F.col("idx"))
    scored = (
        d2.filter(F.col("idx") > F.col("cutoff"))
        .join(F.broadcast(fit), "event_type")
        .select("event_type", "n_train", err.alias("err"), "rev")
    )
    dsum = lambda c: F.sum(c.cast("decimal(38,20)")).cast("double")  # noqa: E731
    return scored.groupBy("event_type").agg(
        F.max("n_train").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(dsum(F.abs(F.col("err"))) / dsum(F.abs(F.col("rev"))), 6).alias(
            "wape"
        ),
        F.round(dsum(F.col("err")) / dsum(F.abs(F.col("rev"))), 6).alias("bias"),
        F.round(
            F.sqrt(dsum(F.col("err") * F.col("err")) / F.count(F.lit(1))), 6
        ).alias("rmse"),
    )


#: Holt-Winters additive-seasonal constants: weekly period over the daily
#: grain, fixed (not fitted) smoothing so the solve is one deterministic
#: pass; the complements (1−α etc.) are computed ONCE in Python and
#: interpolated into the oracle via repr, so both engines run the exact
#: same double constants (1.0−0.4 is NOT the double 0.6 — never recompute
#: complements independently per engine).
_HW_ALPHA = 0.5
_HW_BETA = 0.3
_HW_GAMMA = 0.4
_HW_M = 7  # season length (day-of-week)
_HW_H = 7  # forecast horizon

_HW_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
    FROM events GROUP BY 1, 2
), seq AS (
    SELECT event_type, cents, CAST(cents AS DOUBLE) / 100.0 AS y,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM daily
), c1 AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN rn <= {_HW_M} THEN cents END) AS DOUBLE)
               / 100.0 / {_HW_M} AS a0,
           (CAST(SUM(CASE WHEN rn > {_HW_M} AND rn <= {2 * _HW_M}
                          THEN cents END) AS DOUBLE) / 100.0 / {_HW_M}
            - CAST(SUM(CASE WHEN rn <= {_HW_M} THEN cents END) AS DOUBLE)
              / 100.0 / {_HW_M}) / {_HW_M} AS b0,
           MAX(n) AS n
    FROM seq
    WHERE n >= {2 * _HW_M}
    GROUP BY event_type
), s0 AS (
    SELECT seq.event_type,
           list(seq.y - c1.a0 ORDER BY seq.rn) AS s, MAX(c1.a0) AS a0,
           MAX(c1.b0) AS b0, MAX(c1.n) AS n
    FROM seq JOIN c1 USING (event_type)
    WHERE seq.rn <= {_HW_M}
    GROUP BY seq.event_type
), rec(event_type, rn, n, lvl, tr, s) AS (
    SELECT s0.event_type, {_HW_M + 1}, s0.n,
           {_HW_ALPHA!r} * (q.y - s0.s[1])
               + {1.0 - _HW_ALPHA!r} * (s0.a0 + s0.b0),
           {_HW_BETA!r} * (({_HW_ALPHA!r} * (q.y - s0.s[1])
               + {1.0 - _HW_ALPHA!r} * (s0.a0 + s0.b0)) - s0.a0)
               + {1.0 - _HW_BETA!r} * s0.b0,
           s0.s[2:] || [{_HW_GAMMA!r} * (q.y - ({_HW_ALPHA!r} * (q.y - s0.s[1])
               + {1.0 - _HW_ALPHA!r} * (s0.a0 + s0.b0)))
               + {1.0 - _HW_GAMMA!r} * s0.s[1]]
    FROM s0 JOIN seq q
      ON q.event_type = s0.event_type AND q.rn = {_HW_M + 1}
    UNION ALL
    SELECT r.event_type, r.rn + 1, r.n,
           {_HW_ALPHA!r} * (q.y - r.s[1])
               + {1.0 - _HW_ALPHA!r} * (r.lvl + r.tr),
           {_HW_BETA!r} * (({_HW_ALPHA!r} * (q.y - r.s[1])
               + {1.0 - _HW_ALPHA!r} * (r.lvl + r.tr)) - r.lvl)
               + {1.0 - _HW_BETA!r} * r.tr,
           r.s[2:] || [{_HW_GAMMA!r} * (q.y - ({_HW_ALPHA!r} * (q.y - r.s[1])
               + {1.0 - _HW_ALPHA!r} * (r.lvl + r.tr)))
               + {1.0 - _HW_GAMMA!r} * r.s[1]]
    FROM rec r JOIN seq q
      ON q.event_type = r.event_type AND q.rn = r.rn + 1
    WHERE r.rn < r.n
)
SELECT r.event_type, g.h,
       ROUND(r.lvl + g.h * r.tr + r.s[((g.h - 1) % {_HW_M}) + 1], 6)
           AS forecast
FROM rec r, UNNEST(generate_series(1, {_HW_H})) AS g(h)
WHERE r.rn = r.n
"""


def _holt_winters_fn(alpha: float, beta: float, gamma: float, m: int, horizon: int):
    """Factory for the per-key Holt-Winters additive solve (nested closure,
    by-value pickling). Complements are bound HERE so the UDF and the
    oracle share the identical double constants."""
    oma, omb, omg = 1.0 - alpha, 1.0 - beta, 1.0 - gamma

    def hw(pdf):
        import pandas as pd

        pdf = pdf.sort_values("idx").reset_index(drop=True)
        key = pdf["event_type"].iloc[0]
        # cents → double division replicates both engines'
        # decimal(18,2)→double cast (correctly rounded) bit-for-bit.
        y = [int(v) / 100.0 for v in pdf["cents"]]
        if len(y) < 2 * m:
            return pd.DataFrame(
                {"event_type": [], "h": [], "forecast": []}
            ).astype({"event_type": "str", "h": "int64", "forecast": "float64"})
        a0 = float(sum(int(v) for v in pdf["cents"][:m])) / 100.0 / m
        a1 = float(sum(int(v) for v in pdf["cents"][m : 2 * m])) / 100.0 / m
        level, trend = a0, (a1 - a0) / m
        season = [y[j] - a0 for j in range(m)]
        for x in y[m:]:
            s_old = season[0]
            prev = level
            level = alpha * (x - s_old) + oma * (prev + trend)
            trend = beta * (level - prev) + omb * trend
            season = season[1:] + [gamma * (x - level) + omg * s_old]
        return pd.DataFrame(
            {
                "event_type": [key] * horizon,
                "h": list(range(1, horizon + 1)),
                # raw doubles out; the caller applies F.round (HALF_UP —
                # matches DuckDB ROUND; Python round() is half-even).
                "forecast": [
                    level + h * trend + season[(h - 1) % m]
                    for h in range(1, horizon + 1)
                ],
            }
        )

    return hw


@register(
    "ts_holt_winters_seasonal", oracle=_HW_ORACLE, tags=("timeseries", "ml")
)
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE-SEASONAL forecast (level + trend + weekly
    day-of-week component) of daily value per event_type — the seasonal
    upgrade of ts_holt_linear, and the model a traffic/revenue series
    with a weekly rhythm actually needs (a linear-trend forecaster
    systematically overshoots Sundays and undershoots Mondays; the
    seasonal state absorbs exactly that).

    Convention (fixed, documented, mirrored in the oracle): classical
    NIST initialization — level₀ = mean of the first m days, trend₀ =
    (mean of the second m − mean of the first m)/m, seasonal₀ = first
    cycle's deviations from level₀ — then the standard coupled
    recurrences from day m+1 with fixed α/β/γ; keys shorter than 2m
    days emit nothing. Forecast ŷ(h) = level + h·trend + s[(h−1) mod m].

    Cross-engine exactness: the daily fold is exact integer CENTS (so
    the recurrence inputs are bit-identical doubles on both engines),
    the smoothing complements are single shared double constants, and
    the oracle's recursive CTE carries the m-slot seasonal state as a
    LIST, advancing the identical IEEE expression DAG one day per step
    — so the 6-dp forecasts hash-match exactly, same contract as
    ts_holt_linear. The sequential replay test in
    tests/test_round10_ops.py re-runs the recurrence in plain Python
    and requires cell-exact agreement.

    Scale shape: reduce-then-solve — one map-combined shuffle folds the
    fact table to |keys|·|days| rows; one Arrow batch per key runs the
    O(days) recurrence; state is (2 + m) floats per key regardless of
    history length."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(
            _holt_winters_fn(_HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_M, _HW_H),
            "event_type string, h long, forecast double",
        )
        .select("event_type", "h", F.round("forecast", 6).alias("forecast"))
    )


_STL_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS rev_cents
    FROM orders GROUP BY 1
), win AS (
    SELECT day, rev_cents,
           SUM(rev_cents) OVER w AS s7,
           COUNT(*) OVER w AS c7,
           dayofweek(day) AS dow0
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), tr AS (
    SELECT day, rev_cents, dow0,
           (s7 * 1000) // 7 AS trend_milli,
           rev_cents * 1000 - (s7 * 1000) // 7 AS detr_milli
    FROM win WHERE c7 = 7
), sdow AS (
    SELECT dow0, SUM(detr_milli) // COUNT(*) AS s_raw FROM tr GROUP BY dow0
), smean AS (
    SELECT SUM(s_raw) // COUNT(*) AS m FROM sdow
)
SELECT t.day, t.rev_cents,
       CAST(t.trend_milli AS BIGINT) AS trend_milli,
       CAST(s.s_raw - sm.m AS BIGINT) AS seasonal_milli,
       CAST(t.detr_milli - (s.s_raw - sm.m) AS BIGINT) AS remainder_milli
FROM tr t JOIN sdow s USING (dow0) CROSS JOIN smean sm
"""


@register(
    "ts_stl_classical_decompose", oracle=_STL_ORACLE, tags=("timeseries",)
)
def ts_stl_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily order revenue
    (period 7): value = trend + seasonal + remainder — the moving-average
    decomposition underlying STL's initialization and every dashboard's
    "seasonally adjusted" series. Complements the family: ts_seasonal_index
    reads off ONE multiplicative factor; ts_holt_winters_seasonal FORECASTS
    with recursive smoothing; this one EXPLAINS each observed day.

    Method (Hyndman & Athanasopoulos, FPP3 §3.4, classical decomposition):
    trend = centered 7-term moving average (odd period, so no double MA
    needed); seasonal = per-weekday mean of the detrended series, centered
    so the seven components sum to ~0; remainder = residual. Rows without
    a full ±3-day window (the series' first/last 3 days) carry no trend
    and are excluded — the textbook convention.

    Integer exit: revenue in exact cents; trend/seasonal/remainder in
    milli-cents via truncating division (both engines truncate toward
    zero, verified incl. negatives — the detrended means are signed); no
    float anywhere.

    Scale shape: facts fold to the DAY grain once (map-side combined
    decimal sums); the centered-MA window runs on that CALENDAR-bounded
    grain (rows = days of history — a few thousand for decades; it grows
    with time, never with data volume, so the global ROWS window is not a
    fact-grain scale hazard); the 7-row seasonal table and its 1-row mean
    broadcast back."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("rev_cents")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    win = daily.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("c7"),
        F.dayofweek("day").alias("dow0"),
    )
    tr = win.filter(F.col("c7") == 7).select(
        "day",
        "rev_cents",
        "dow0",
        F.expr("(s7 * 1000) div 7").alias("trend_milli"),
        F.expr("rev_cents * 1000 - (s7 * 1000) div 7").alias("detr_milli"),
    )
    sdow = tr.groupBy("dow0").agg(
        F.expr("SUM(detr_milli) div COUNT(1)").alias("s_raw")
    )
    smean = sdow.agg(F.expr("SUM(s_raw) div COUNT(1)").alias("m"))
    return (
        tr.join(F.broadcast(sdow), "dow0")
        .crossJoin(F.broadcast(smean))
        .select(
            "day",
            "rev_cents",
            F.col("trend_milli").cast("long").alias("trend_milli"),
            (F.col("s_raw") - F.col("m")).cast("long").alias("seasonal_milli"),
            (F.col("detr_milli") - (F.col("s_raw") - F.col("m")))
            .cast("long")
            .alias("remainder_milli"),
        )
    )


#: DFT probe periods (hours). Chosen to bracket the cycles a 30-day
#: event log can carry: intra-day (6/8/12), daily (24), multi-day
#: (48/84) and weekly (168) — every period divides into the window at
#: least 4 times, the classical minimum for a stable periodogram line.
PERIODOGRAM_PERIODS = (6, 8, 12, 24, 48, 84, 168)

_PERIODOGRAM_ORACLE = f"""
WITH hours AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
), mu AS (
    SELECT AVG(CAST(x AS DOUBLE)) AS m FROM hours
), grid AS (
    SELECT UNNEST([{", ".join(str(p) for p in PERIODOGRAM_PERIODS)}]) AS p
), terms AS (
    SELECT g.p,
           SUM((CAST(h.x AS DOUBLE) - mu.m)
               * COS(2 * PI() * (h.h % g.p) / g.p)) AS c,
           SUM((CAST(h.x AS DOUBLE) - mu.m)
               * SIN(2 * PI() * (h.h % g.p) / g.p)) AS s,
           SUM((CAST(h.x AS DOUBLE) - mu.m)
               * (CAST(h.x AS DOUBLE) - mu.m)) AS ss,
           CAST(COUNT(*) AS BIGINT) AS nh
    FROM hours h, grid g, mu
    GROUP BY g.p
)
SELECT CAST(p AS INT) AS period_hours,
       CASE WHEN ss = 0 THEN NULL
            ELSE ROUND(2.0 * (c * c + s * s) / (CAST(nh AS DOUBLE) * ss), 6)
            END AS power_ratio
FROM terms
"""


@register(
    "ts_periodogram_dft",
    oracle=_PERIODOGRAM_ORACLE,
    tags=("window", "timeseries"),
)
def ts_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of hourly event volume at a fixed
    period grid — the seasonality DETECTOR that has to run before
    `ts_seasonal_index` / `ts_stl_classical_decompose` can assume their
    period: for each candidate period p, project the mean-centered
    series onto cos/sin at frequency 1/p and report the captured energy
    share 2(c² + s²)/(n·Σx̃²) — 1.0 for a pure sinusoid at p, ~2/n for
    white noise (the classical periodogram R² normalization; periods
    that don't divide the window leak slightly, so the share is
    approximate, not a hard [0,1]). A dominant line (daily traffic →
    24h) stands out an order of magnitude above the rest; a flat table
    says "don't fit a seasonal model".

    The angle is computed from (t mod p) — exactly representable
    integers — so both engines evaluate cos/sin on token-identical
    double arguments; the only cross-engine freedom is libm's last ulp
    and the summation order over the HOUR grain, both absorbed by
    ROUND(6) on an O(1) ratio (relative noise ~1e-13). Energy Σx̃² is
    summed per period row so the whole statistic is one fold of the
    hour × period frame.

    Scale shape: the fact scan folds to the hour grain with map-side
    combine (counts are exact integers — the only unbounded-data sum in
    the plan); the DFT itself runs on hours × |grid| rows, where the
    hour grain is bounded by the calendar window, not by row count, and
    the 7-row period grid is a broadcast. At 100 TB of events over the
    same retention window this plan does exactly one extra reduce over
    today's."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    hours = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        # integral div, not `/3600 → cast`: the double quotient can round
        # UP across an hour boundary and disagree with the oracle's `//`.
        .groupBy(F.expr("es div 3600").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    mu = hours.agg(F.avg(F.col("x").cast("double")).alias("m"))
    grid = spark.range(len(PERIODOGRAM_PERIODS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS]),
            (F.col("id") + 1).cast("int"),
        ).alias("p")
    )
    xc = F.col("x").cast("double") - F.col("m")
    ang = F.expr("2 * PI() * (h % p) / p")
    terms = (
        hours.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(grid))
        .groupBy("p")
        .agg(
            F.sum(xc * F.cos(ang)).alias("c"),
            F.sum(xc * F.sin(ang)).alias("s"),
            F.sum(xc * xc).alias("ss"),
            F.count(F.lit(1)).cast("long").alias("nh"),
        )
    )
    # ss = 0 (a constant hourly series: every centered term is exactly
    # 0.0 on both engines) leaves the energy share undefined — NULL, not
    # an ANSI raise. r13 degenerate-probe finding.
    return terms.select(
        F.col("p").cast("int").alias("period_hours"),
        F.when(F.col("ss") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.lit(2.0)
                * (F.col("c") * F.col("c") + F.col("s") * F.col("s"))
                / (F.col("nh").cast("double") * F.col("ss")),
                6,
            )
        )
        .alias("power_ratio"),
    )


#: Dickey–Fuller 5% critical value (constant-only regression, large n) —
#: documented rather than hidden: the stationarity flag is exactly
#: "t < ADF_CRIT_5PCT".
ADF_CRIT_5PCT = -2.86

_ADF_ORACLE = f"""
WITH daily AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1
), lagged AS (
    SELECT y - LAG(y) OVER (ORDER BY day) AS dy,
           LAG(y) OVER (ORDER BY day) AS ylag
    FROM daily
), pairs AS (
    SELECT CAST(dy AS HUGEINT) AS dy, CAST(ylag AS HUGEINT) AS ylag
    FROM lagged WHERE dy IS NOT NULL
), s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(ylag) AS BIGINT) AS sx,
           CAST(SUM(dy) AS BIGINT) AS sy,
           CAST(SUM(ylag * ylag) AS BIGINT) AS sxx,
           CAST(SUM(ylag * dy) AS BIGINT) AS sxy,
           CAST(SUM(dy * dy) AS BIGINT) AS syy
    FROM pairs
), c AS (
    SELECT n,
           CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS sxx_c,
           CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS sxy_c,
           CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS syy_c
    FROM s
), fit AS (
    SELECT n, sxy_c / sxx_c AS beta,
           (syy_c - (sxy_c / sxx_c) * sxy_c) / (n - 2) / sxx_c AS var_b
    FROM c
)
SELECT n AS n_diffs,
       ROUND(beta, 6) AS beta,
       CASE WHEN var_b <= 0 THEN NULL
            ELSE ROUND(beta / SQRT(var_b), 4) END AS df_tstat,
       CASE WHEN var_b <= 0 THEN 0
            ELSE CAST(beta / SQRT(var_b) < {ADF_CRIT_5PCT} AS BIGINT)
            END AS stationary_5pct
FROM fit
"""


@register("ts_adf_stationarity", oracle=_ADF_ORACLE, tags=("timeseries",))
def ts_adf_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey–Fuller unit-root test on daily event volume — the
    stationarity GATE the forecasting family assumes: `ts_holt_linear` /
    `ts_forecast_linear` / ARIMA-style models are only licensed after
    differencing makes the series stationary, and DF is the test that
    decides (Δy_t = α + β·y_{t−1} + ε; a unit root means β = 0, and the
    test statistic t = β̂/se(β̂) is compared against the Dickey–Fuller
    distribution's critical value, NOT the t-table — the −2.86 constant
    is documented in ADF_CRIT_5PCT because that substitution is the
    classic misuse).

    All sufficient statistics are exact integers (daily counts, their
    lags and diffs over the calendar-bounded day grain — a plain LAG
    window over ≤ retention-window rows at ANY data volume), centered
    moments and the t-statistic exit through shared double expressions,
    and the flag compares identically-derived doubles against the same
    literal. Scale shape: one map-side-combined fold of the facts to
    the day grain; everything after is constant-size."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        .groupBy(F.expr("es div 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        (F.col("y") - F.lag("y").over(w)).alias("dy"),
        F.lag("y").over(w).alias("ylag"),
    ).where(F.col("dy").isNotNull())
    s = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ylag").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.expr("CAST(ylag AS DECIMAL(19,0)) * ylag")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("CAST(ylag AS DECIMAL(19,0)) * dy")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("CAST(dy AS DECIMAL(19,0)) * dy")).cast("decimal(38,0)").alias("syy"),
    )
    c = s.select(
        "n",
        F.expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n").alias("sxx_c"),
        F.expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n").alias("sxy_c"),
        F.expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n").alias("syy_c"),
    )
    fit = c.select(
        "n",
        F.expr("sxy_c / sxx_c").alias("beta"),
        F.expr("(syy_c - (sxy_c / sxx_c) * sxy_c) / (n - 2) / sxx_c").alias(
            "var_b"
        ),
    )
    # var_b = 0 (a perfectly deterministic difference series) must not
    # reach the division: ANSI Spark raises DIVIDE_BY_ZERO where DuckDB
    # would emit inf — pin ONE semantics (NULL t, flag 0) on both engines.
    return fit.select(
        F.col("n").alias("n_diffs"),
        F.round("beta", 6).alias("beta"),
        F.expr(
            "CASE WHEN var_b <= 0 THEN NULL"
            " ELSE ROUND(beta / SQRT(var_b), 4) END"
        ).alias("df_tstat"),
        F.expr(
            f"CASE WHEN var_b <= 0 THEN 0"
            f" ELSE CAST(beta / SQRT(var_b) < {ADF_CRIT_5PCT} AS LONG) END"
        )
        .cast("long")
        .alias("stationary_5pct"),
    )


_ITS_ORACLE = """
WITH daily AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1
), rel AS (
    SELECT day - (SELECT MIN(day) FROM daily) AS t, y FROM daily
), cut AS (
    SELECT (MAX(t) + 1 + 1) // 2 AS t0 FROM rel
), seg AS (
    SELECT CAST(t >= cut.t0 AS BIGINT) AS post,
           CAST(t AS HUGEINT) AS t, CAST(y AS HUGEINT) AS y, cut.t0
    FROM rel, cut
), s AS (
    SELECT post, MAX(t0) AS t0, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(t) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(t * y) AS BIGINT) AS sxy,
           CAST(SUM(t * t) AS BIGINT) AS sxx
    FROM seg GROUP BY post
), fit AS (
    SELECT post, t0, n,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS slope,
           (CAST(sy AS DOUBLE)
            - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              * sx) / n AS intercept
    FROM s
)
SELECT pre.n AS n_pre, post.n AS n_post,
       CAST(pre.t0 AS BIGINT) AS t0,
       ROUND(pre.slope, 4) AS pre_slope,
       ROUND(post.slope, 4) AS post_slope,
       ROUND(post.slope - pre.slope, 4) AS slope_change,
       ROUND((post.intercept + post.slope * pre.t0)
             - (pre.intercept + pre.slope * pre.t0), 4) AS level_change
FROM (SELECT * FROM fit WHERE post = 0) pre,
     (SELECT * FROM fit WHERE post = 1) post
"""


@register("ts_interrupted_series", oracle=_ITS_ORACLE, tags=("timeseries",))
def ts_interrupted_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series (ITS) segmented regression — the causal
    readout for a deploy/policy change WITHOUT a control group (the
    time-series sibling of `ml_diff_in_diff`, which needs one): fit OLS
    trend lines to daily volume before and after the intervention point
    and report the LEVEL change (the jump between the two fitted lines
    evaluated at the cut — the immediate effect) and the SLOPE change
    (the trend break — the sustained effect). Segmented regression with
    both terms is the standard ITS form (Wagner et al. 2002); fitting
    the segments separately is algebraically the same saturated model.

    The intervention point here is the span's integral midpoint (the
    fixture has no deploy log; in production pass the known date). Both
    segments' sufficient statistics are exact integers over the
    calendar-bounded day grain (one map-side-combined fold of the facts,
    then a 2-row fold), and the fitted lines exit through shared double
    expressions, ROUND(4). The planted test recovers an exact
    jump-plus-trend-break construction to the fourth decimal."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        .groupBy(F.expr("es div 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    dmin = daily.agg(F.min("day").alias("d0"))
    rel = daily.crossJoin(F.broadcast(dmin)).select(
        (F.col("day") - F.col("d0")).alias("t"), "y"
    )
    cut = rel.agg(F.expr("(MAX(t) + 1 + 1) div 2").alias("t0"))
    seg = rel.crossJoin(F.broadcast(cut)).select(
        (F.col("t") >= F.col("t0")).cast("long").alias("post"),
        "t",
        "y",
        "t0",
    )
    s = seg.groupBy("post").agg(
        F.max("t0").alias("t0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(t AS DECIMAL(19,0)) * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("CAST(t AS DECIMAL(19,0)) * t")).cast("decimal(38,0)").alias("sxx"),
    )
    slope = (
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    )
    fit = s.select(
        "post",
        "t0",
        "n",
        F.expr(slope).alias("slope"),
        F.expr(f"(CAST(sy AS DOUBLE) - ({slope}) * sx) / n").alias(
            "intercept"
        ),
    )
    pre = fit.where("post = 0").select(
        F.col("n").alias("n_pre"),
        F.col("t0").cast("long").alias("t0"),
        F.col("slope").alias("pre_slope"),
        F.col("intercept").alias("pre_intercept"),
    )
    post = fit.where("post = 1").select(
        F.col("n").alias("n_post"),
        F.col("slope").alias("post_slope"),
        F.col("intercept").alias("post_intercept"),
    )
    return pre.crossJoin(F.broadcast(post)).select(
        "n_pre",
        "n_post",
        "t0",
        F.round("pre_slope", 4).alias("pre_slope"),
        F.round("post_slope", 4).alias("post_slope"),
        F.round(F.col("post_slope") - F.col("pre_slope"), 4).alias(
            "slope_change"
        ),
        F.round(
            (F.col("post_intercept") + F.col("post_slope") * F.col("t0"))
            - (F.col("pre_intercept") + F.col("pre_slope") * F.col("t0")),
            4,
        ).alias("level_change"),
    )


#: R/S window sizes for the Hurst estimate — near-dyadic, sized to the
#: fixture's ~30-day event log (orders span years, events weeks); every
#: window fits the span, giving the log-log fit 4 points.
HURST_WINDOWS = (4, 7, 14, 28)

_HURST_ORACLE = f"""
WITH daily AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
), d0 AS (
    SELECT MIN(day) AS dmin FROM daily
), grid AS (
    SELECT UNNEST([{", ".join(str(w) for w in HURST_WINDOWS)}]) AS w
), rows_w AS (
    SELECT g.w, (d.day - d0.dmin) // g.w AS b, d.day, d.x
    FROM daily d, d0, grid g
), stats AS (
    SELECT w, b, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(x) AS BIGINT) AS sx,
           SUM(CAST(x AS HUGEINT) * x) AS sxx
    FROM rows_w GROUP BY w, b
), full_blocks AS (
    SELECT w, b, sx, w * sxx - CAST(sx AS HUGEINT) * sx AS den
    FROM stats WHERE cnt = w
), z AS (
    SELECT r.w, r.b,
           r.w * SUM(r.x) OVER (PARTITION BY r.w, r.b ORDER BY r.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (PARTITION BY r.w, r.b ORDER BY r.day)
             * f.sx AS zc
    FROM rows_w r JOIN full_blocks f ON r.w = f.w AND r.b = f.b
), rng AS (
    SELECT w, b, MAX(zc) - MIN(zc) AS rr FROM z GROUP BY w, b
), ratio AS (
    SELECT rng.w,
           CAST(rng.rr AS DOUBLE) / SQRT(CAST(f.den AS DOUBLE)) AS rs
    FROM rng JOIN full_blocks f ON rng.w = f.w AND rng.b = f.b
    WHERE f.den > 0
), per_w AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           ROUND(AVG(rs), 6) AS rs
    FROM ratio GROUP BY w
), fitted AS (
    SELECT w, n_blocks, rs,
           CAST(COUNT(*) OVER () AS BIGINT) AS k,
           SUM(LN(CAST(w AS DOUBLE))) OVER () AS slx,
           SUM(LN(rs)) OVER () AS sly,
           SUM(LN(CAST(w AS DOUBLE)) * LN(rs)) OVER () AS slxy,
           SUM(LN(CAST(w AS DOUBLE)) * LN(CAST(w AS DOUBLE))) OVER () AS slxx
    FROM per_w
)
SELECT CAST(w AS INT) AS window_days, n_blocks, rs,
       CASE WHEN k < 2 OR k * slxx - slx * slx = 0 THEN NULL
            ELSE ROUND((k * slxy - slx * sly)
                       / (k * slxx - slx * slx), 4) END AS hurst
FROM fitted
ORDER BY window_days
"""


@register(
    "ts_hurst_exponent", oracle=_HURST_ORACLE, tags=("window", "timeseries")
)
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily event volume via classical rescaled-range
    (R/S) analysis (Hurst 1951; Mandelbrot's long-memory diagnostic):
    for each dyadic window size w, split the day series into full
    blocks, compute each block's range-of-cumulative-deviations over its
    standard deviation, average, and read H as the log-log slope of
    R/S against w. H ≈ 0.5 = no long memory (random walk increments);
    H > 0.5 = persistent trends (mean-reverting forecasting assumptions
    break); H < 0.5 = anti-persistent. The missing scale diagnostic
    between the lag-local ACF family and the runs test.

    Exact-integer core: with integer daily counts, the block-scaled
    cumulative deviation Z'ᵢ = w·cum(x) − i·Σx and the variance core
    den = w·Σx² − (Σx)² are EXACT integers, and R/S per block is
    R'/√den — one double division of an exact int by the square root of
    an exact int, bit-identical cross-engine. Per-w averages round at 6
    BEFORE the log-log fit so both engines fit identical points; zero-
    variance blocks are excluded exactly (den = 0), short tail blocks
    by the cnt = w filter, and a fit with < 2 surviving points pins
    NULL. All windows ride the bounded day grain — block size ≤ 28
    rows, so the per-block window sort is O(1) state at any data
    volume."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        .groupBy(F.expr("es div 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    d0 = daily.agg(F.min("day").alias("dmin"))
    grid = spark.range(len(HURST_WINDOWS)).select(
        F.element_at(
            F.array(*[F.lit(w) for w in HURST_WINDOWS]),
            (F.col("id") + 1).cast("int"),
        ).cast("long").alias("w")
    )
    rows_w = (
        daily.crossJoin(F.broadcast(d0))
        .crossJoin(F.broadcast(grid))
        .select(
            "w",
            F.expr("(day - dmin) div w").alias("b"),
            "day",
            "x",
        )
    )
    stats = rows_w.groupBy("w", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * x")).cast(
            "decimal(26,0)"
        ).alias("sxx"),
    )
    full_blocks = stats.where(F.col("cnt") == F.col("w")).select(
        "w",
        "b",
        "sx",
        F.expr(
            "CAST(w * sxx - CAST(sx AS DECIMAL(19,0)) * sx"
            " AS DECIMAL(30,0))"
        ).alias("den"),
    )
    wb = Window.partitionBy("w", "b").orderBy("day")
    z = (
        rows_w.join(full_blocks.select("w", "b", "sx"), ["w", "b"])
        .select(
            "w",
            "b",
            (
                F.col("w")
                * F.sum("x").over(
                    wb.rowsBetween(Window.unboundedPreceding, 0)
                )
                - F.row_number().over(wb) * F.col("sx")
            ).alias("zc"),
        )
    )
    rng = z.groupBy("w", "b").agg(
        (F.max("zc") - F.min("zc")).alias("rr")
    )
    ratio = (
        rng.join(full_blocks.select("w", "b", "den"), ["w", "b"])
        .where(F.col("den") > 0)
        .select(
            "w",
            (
                F.col("rr").cast("double")
                / F.sqrt(F.col("den").cast("double"))
            ).alias("rs"),
        )
    )
    per_w = ratio.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.round(F.avg("rs"), 6).alias("rs"),
    )
    wall = Window.partitionBy()
    lnw = F.log(F.col("w").cast("double"))
    lnr = F.log("rs")
    fitted = per_w.select(
        "w",
        "n_blocks",
        "rs",
        F.count(F.lit(1)).over(wall).cast("long").alias("k"),
        F.sum(lnw).over(wall).alias("slx"),
        F.sum(lnr).over(wall).alias("sly"),
        F.sum(lnw * lnr).over(wall).alias("slxy"),
        F.sum(lnw * lnw).over(wall).alias("slxx"),
    )
    return fitted.select(
        F.col("w").cast("int").alias("window_days"),
        "n_blocks",
        "rs",
        F.expr(
            "CASE WHEN k < 2 OR k * slxx - slx * slx = 0 THEN NULL"
            " ELSE ROUND((k * slxy - slx * sly)"
            " / (k * slxx - slx * slx), 4) END"
        ).alias("hurst"),
    ).orderBy("window_days")


def _granger_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    f_stat = "(GREATEST(rss_r - rss_u, 0.0) * (n - 3) / rss_u)"
    p = f"(2.0 * (1.0 - {normal_cdf_sql(f'SQRT({f_stat})')}))"
    return f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS purchases
    FROM events GROUP BY 1
), lagged AS (
    SELECT b.purchases AS y, a.purchases AS x1, a.clicks AS x2
    FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
), moments AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(x1 AS DECIMAL(19,0))) AS DOUBLE) AS sx1,
           CAST(SUM(CAST(x2 AS DECIMAL(19,0))) AS DOUBLE) AS sx2,
           CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * x1) AS DOUBLE) AS sx1x1,
           CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * x2) AS DOUBLE) AS sx2x2,
           CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * x2) AS DOUBLE) AS sx1x2,
           CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * y) AS DOUBLE) AS sx1y,
           CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * y) AS DOUBLE) AS sx2y,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DOUBLE) AS syy
    FROM lagged
), centered AS (
    SELECT n,
           sx1x1 - sx1 * sx1 / n AS s11,
           sx2x2 - sx2 * sx2 / n AS s22,
           sx1x2 - sx1 * sx2 / n AS s12,
           sx1y - sx1 * sy / n AS s1y,
           sx2y - sx2 * sy / n AS s2y,
           syy - sy * sy / n AS syy_c
    FROM moments
), solved AS (
    SELECT n, s11, s22, s12, s1y, s2y, syy_c,
           s11 * s22 - s12 * s12 AS det
    FROM centered
), rss AS (
    SELECT n,
           CASE WHEN s11 = 0 THEN NULL
                ELSE syy_c - s1y * s1y / s11 END AS rss_r,
           CASE WHEN det = 0 THEN NULL
                ELSE syy_c - ((s1y * s22 - s2y * s12) / det) * s1y
                           - ((s2y * s11 - s1y * s12) / det) * s2y
                END AS rss_u,
           CASE WHEN det = 0 THEN NULL
                ELSE (s2y * s11 - s1y * s12) / det END AS beta_x_lag,
           CASE WHEN det = 0 THEN NULL
                ELSE (s1y * s22 - s2y * s12) / det END AS beta_y_lag
    FROM solved
)
SELECT n AS n_pairs,
       ROUND(beta_y_lag, 6) AS beta_y_lag,
       ROUND(beta_x_lag, 6) AS beta_x_lag,
       CASE WHEN n < 4 OR rss_r IS NULL OR rss_u IS NULL OR rss_u <= 0
            THEN NULL ELSE ROUND({f_stat}, 4) END AS f_stat,
       CASE WHEN n < 4 OR rss_r IS NULL OR rss_u IS NULL OR rss_u <= 0
            THEN NULL ELSE ROUND({p}, 6) END AS p_value
FROM rss
"""


@register(
    "ts_granger_causality", oracle=_granger_oracle(), tags=("timeseries",)
)
def ts_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Granger causality from daily clicks to daily purchases —
    "does yesterday's click volume improve today's purchase forecast
    beyond yesterday's purchases alone?" Restricted (y_t ~ y_{t−1}) vs
    unrestricted (y_t ~ y_{t−1} + x_{t−1}) OLS via the closed-form
    2-predictor normal equations (the same reduce-then-solve shape as
    the engine's 2-var regression), F = (RSS_r − RSS_u)(n−3)/RSS_u with
    1 numerator df, p via the t≈z asymptotic 2(1−Φ(√F)) — documented
    approximation, exact to ~1e-3 at the day-grain n here. Granger
    causality is prediction, not causation; the docstring says so, so
    the operator doesn't have to.

    Exactness: daily counts are exact integers; every moment sum runs
    through DECIMAL(19,0) products summed exactly before ONE cast to
    double, so partitioning cannot tip the solve (the r9
    embedding-covariance lesson). The lag join is day = day + 1 on the
    bounded calendar grain — gaps simply drop pairs. Degenerate guards:
    constant regressors (s11 = 0 / det = 0) and RSS_u ≤ 0 pin NULL on
    both engines."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum((F.col("event_type") == "click").cast("long"))
            .cast("long")
            .alias("clicks"),
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("purchases"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"),
        F.col("purchases").alias("x1"),
        F.col("clicks").alias("x2"),
    )
    b = daily.select(F.col("day").alias("db"), F.col("purchases").alias("y"))
    lagged = a.join(b, F.expr("db = da + INTERVAL 1 DAY")).select(
        "y", "x1", "x2"
    )
    d = "DECIMAL(19,0)"
    moments = lagged.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d})) AS DOUBLE)").alias("sx1"),
        F.expr(f"CAST(SUM(CAST(x2 AS {d})) AS DOUBLE)").alias("sx2"),
        F.expr(f"CAST(SUM(CAST(y AS {d})) AS DOUBLE)").alias("sy"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d}) * x1) AS DOUBLE)").alias("sx1x1"),
        F.expr(f"CAST(SUM(CAST(x2 AS {d}) * x2) AS DOUBLE)").alias("sx2x2"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d}) * x2) AS DOUBLE)").alias("sx1x2"),
        F.expr(f"CAST(SUM(CAST(x1 AS {d}) * y) AS DOUBLE)").alias("sx1y"),
        F.expr(f"CAST(SUM(CAST(x2 AS {d}) * y) AS DOUBLE)").alias("sx2y"),
        F.expr(f"CAST(SUM(CAST(y AS {d}) * y) AS DOUBLE)").alias("syy"),
    )
    centered = moments.select(
        "n",
        F.expr("sx1x1 - sx1 * sx1 / n").alias("s11"),
        F.expr("sx2x2 - sx2 * sx2 / n").alias("s22"),
        F.expr("sx1x2 - sx1 * sx2 / n").alias("s12"),
        F.expr("sx1y - sx1 * sy / n").alias("s1y"),
        F.expr("sx2y - sx2 * sy / n").alias("s2y"),
        F.expr("syy - sy * sy / n").alias("syy_c"),
    ).withColumn("det", F.expr("s11 * s22 - s12 * s12"))
    rss = centered.select(
        "n",
        F.expr(
            "CASE WHEN s11 = 0 THEN NULL"
            " ELSE syy_c - s1y * s1y / s11 END"
        ).alias("rss_r"),
        F.expr(
            "CASE WHEN det = 0 THEN NULL"
            " ELSE syy_c - ((s1y * s22 - s2y * s12) / det) * s1y"
            " - ((s2y * s11 - s1y * s12) / det) * s2y END"
        ).alias("rss_u"),
        F.expr(
            "CASE WHEN det = 0 THEN NULL"
            " ELSE (s2y * s11 - s1y * s12) / det END"
        ).alias("beta_x_lag"),
        F.expr(
            "CASE WHEN det = 0 THEN NULL"
            " ELSE (s1y * s22 - s2y * s12) / det END"
        ).alias("beta_y_lag"),
    )
    f_stat = "(GREATEST(rss_r - rss_u, 0.0) * (n - 3) / rss_u)"
    p = f"(2.0 * (1.0 - {normal_cdf_sql(f'SQRT({f_stat})')}))"
    guard = "n < 4 OR rss_r IS NULL OR rss_u IS NULL OR rss_u <= 0"
    return rss.select(
        F.col("n").alias("n_pairs"),
        F.round("beta_y_lag", 6).alias("beta_y_lag"),
        F.round("beta_x_lag", 6).alias("beta_x_lag"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL ELSE ROUND({f_stat}, 4) END"
        ).alias("f_stat"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
    )


_SPECTRAL_ENTROPY_ORACLE = f"""
WITH hours AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
), mu AS (
    SELECT AVG(CAST(x AS DOUBLE)) AS m FROM hours
), grid AS (
    SELECT UNNEST([{", ".join(str(p) for p in PERIODOGRAM_PERIODS)}]) AS p
), terms AS (
    SELECT g.p,
           SUM((CAST(h.x AS DOUBLE) - mu.m)
               * COS(2 * PI() * (h.h % g.p) / g.p)) AS c,
           SUM((CAST(h.x AS DOUBLE) - mu.m)
               * SIN(2 * PI() * (h.h % g.p) / g.p)) AS s
    FROM hours h, grid g, mu
    GROUP BY g.p
), energy AS (
    SELECT p, c * c + s * s AS e,
           SUM(c * c + s * s) OVER () AS tot,
           CAST(COUNT(*) OVER () AS BIGINT) AS k
    FROM terms
), probs AS (
    SELECT p, e, k, tot,
           CASE WHEN tot > 0 THEN e / tot END AS pr,
           MAX(CASE WHEN tot > 0 THEN e / tot END) OVER () AS pr_max
    FROM energy
)
SELECT MAX(k) AS n_periods,
       CASE WHEN MAX(tot) <= 0 THEN NULL
            ELSE ROUND(-SUM(CASE WHEN pr > 0 THEN pr * LN(pr) ELSE 0 END)
                       / LN(CAST(MAX(k) AS DOUBLE)), 6)
            END AS spectral_entropy,
       MIN(CASE WHEN pr = pr_max THEN p END) AS dominant_period,
       CASE WHEN MAX(tot) <= 0 THEN NULL
            ELSE ROUND(MAX(pr), 6) END AS dominant_share
FROM probs
"""


@register(
    "ts_spectral_entropy", oracle=_SPECTRAL_ENTROPY_ORACLE, tags=("timeseries",)
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of hourly event volume over the
    engine's fixed candidate-period grid — the one-number "how seasonal
    is this series" readout on top of `ts_periodogram_dft`'s per-period
    table: the DFT energies at the grid frequencies normalize to a
    probability distribution and H = −Σp·ln p / ln(k) lands in [0, 1];
    near 0 means one dominant cycle (forecast with a seasonal model),
    near 1 means the energy is spread flat (don't). The
    dominant_period/dominant_share pair names the winning cycle — the
    forecastability gate feature libraries (tsfresh/catch22 class) put
    first.

    Same exactness class as the periodogram it extends: hourly counts
    are exact integers off one map-side-combined fold; cos/sin run on
    token-identical (h mod p) arguments; the entropy is an O(1)-row
    shared-double expression, ROUND(6) absorbing libm + summation-order
    ulps. A zero-energy (constant) series pins NULL; the argmax ties
    break on the smallest period."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    hours = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        .groupBy(F.expr("es div 3600").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    mu = hours.agg(F.avg(F.col("x").cast("double")).alias("m"))
    grid = spark.range(len(PERIODOGRAM_PERIODS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in PERIODOGRAM_PERIODS]),
            (F.col("id") + 1).cast("int"),
        ).alias("p")
    )
    xc = F.col("x").cast("double") - F.col("m")
    ang = F.expr("2 * PI() * (h % p) / p")
    terms = (
        hours.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(grid))
        .groupBy("p")
        .agg(
            F.sum(xc * F.cos(ang)).alias("c"),
            F.sum(xc * F.sin(ang)).alias("s"),
        )
    )
    energy = terms.select(
        "p",
        F.expr("c * c + s * s").alias("e"),
        F.sum(F.expr("c * c + s * s"))
        .over(Window.partitionBy())
        .alias("tot"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("k"),
    )
    probs = energy.select(
        "p",
        "k",
        "tot",
        F.expr("CASE WHEN tot > 0 THEN e / tot END").alias("pr"),
        F.max(F.expr("CASE WHEN tot > 0 THEN e / tot END"))
        .over(Window.partitionBy())
        .alias("pr_max"),
    )
    return probs.agg(
        F.max("k").alias("n_periods"),
        F.expr(
            "CASE WHEN MAX(tot) <= 0 THEN NULL"
            " ELSE ROUND(-SUM(CASE WHEN pr > 0 THEN pr * LN(pr)"
            " ELSE 0 END) / LN(CAST(MAX(k) AS DOUBLE)), 6) END"
        ).alias("spectral_entropy"),
        F.min(F.expr("CASE WHEN pr = pr_max THEN p END")).alias(
            "dominant_period"
        ),
        F.expr(
            "CASE WHEN MAX(tot) <= 0 THEN NULL"
            " ELSE ROUND(MAX(pr), 6) END"
        ).alias("dominant_share"),
    )


_MASE_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), fc AS (
    SELECT b.day, b.rev AS y, a.rev AS f,
           CAST(ABS(b.rev - a.rev) AS BIGINT) AS abs_e,
           CASE WHEN b.rev = 0 AND a.rev = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(FLOOR(2000000.0 * ABS(b.rev - a.rev)
                          / (ABS(b.rev) + ABS(a.rev))) AS BIGINT)
                END AS smape_micros
    FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 7 DAY
), naive AS (
    SELECT CAST(ABS(b.rev - a.rev) AS BIGINT) AS abs_d
    FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
), agg AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fc) AS n_fc,
           (SELECT CAST(COALESCE(SUM(abs_e), 0) AS BIGINT) FROM fc)
               AS sum_abs_e,
           (SELECT CAST(COALESCE(SUM(smape_micros), 0) AS BIGINT) FROM fc)
               AS sum_smape,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM naive) AS n_naive,
           (SELECT CAST(COALESCE(SUM(abs_d), 0) AS BIGINT) FROM naive)
               AS sum_abs_d
)
SELECT n_fc AS n_forecasts, n_naive AS n_naive_steps,
       CASE WHEN n_fc = 0 OR n_naive = 0 OR sum_abs_d = 0 THEN NULL
            ELSE CAST(CAST(sum_abs_e AS HUGEINT) * n_naive * 1000000
                      // (CAST(sum_abs_d AS HUGEINT) * n_fc) AS BIGINT)
            END AS mase_micros,
       CASE WHEN n_fc = 0 THEN NULL
            ELSE CAST(sum_smape // n_fc AS BIGINT) END AS smape_micros
FROM agg
"""


@register(
    "ts_seasonal_naive_mase", oracle=_MASE_ORACLE, tags=("timeseries",)
)
def ts_seasonal_naive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE and sMAPE of the weekly seasonal-naive forecast
    (ŷ_t = y_{t−7}) on daily revenue — Hyndman & Koehler's (2006)
    scaled error is THE forecast-accuracy number that survives
    zero-valued and mixed-scale series where MAPE blows up: MASE < 1
    means the candidate beats the one-step naive walk in-sample, and
    the seasonal-naive's own MASE is the bar every model in
    `ml_backtest_forecast` must clear before it earns production
    traffic. sMAPE (bounded ≤ 2) rides along as the conventional
    companion.

    Exactness: daily cents are exact integers, so every |error| is an
    exact integer; MASE exits through ONE cross-multiplied truncating
    division (Σ|e|·n_naive·10⁶ div Σ|d|·n_fc — no intermediate means,
    no float ratio of ratios), and each sMAPE term FLOOR-quantizes to
    micro-units before its exact integer mean. Both lag joins are
    calendar-day equi-joins (day = day + k); gaps drop pairs on both
    engines identically. The constant series (Σ|d| = 0: MASE undefined)
    pins NULL; sMAPE's 0/0 days pin 0 by the standard convention."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).cast("long").alias("rev")
        )
    )
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("f"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("y"))
    fc = a.join(b, F.expr("db = da + INTERVAL 7 DAY")).select(
        F.expr("CAST(ABS(y - f) AS BIGINT)").alias("abs_e"),
        F.expr(
            "CASE WHEN y = 0 AND f = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(FLOOR(2000000.0 * ABS(y - f)"
            " / (ABS(y) + ABS(f))) AS BIGINT) END"
        ).alias("smape_micros"),
    )
    naive = a.join(
        b, F.expr("db = da + INTERVAL 1 DAY")
    ).select(F.expr("CAST(ABS(y - f) AS BIGINT)").alias("abs_d"))
    fc_agg = fc.agg(
        F.count(F.lit(1)).cast("long").alias("n_fc"),
        F.coalesce(F.sum("abs_e"), F.lit(0)).cast("long").alias("sum_abs_e"),
        F.coalesce(F.sum("smape_micros"), F.lit(0))
        .cast("long")
        .alias("sum_smape"),
    )
    nv_agg = naive.agg(
        F.count(F.lit(1)).cast("long").alias("n_naive"),
        F.coalesce(F.sum("abs_d"), F.lit(0)).cast("long").alias("sum_abs_d"),
    )
    return fc_agg.crossJoin(F.broadcast(nv_agg)).select(
        F.col("n_fc").alias("n_forecasts"),
        F.col("n_naive").alias("n_naive_steps"),
        F.expr(
            "CASE WHEN n_fc = 0 OR n_naive = 0 OR sum_abs_d = 0 THEN NULL"
            " ELSE CAST(CAST(sum_abs_e AS DECIMAL(38,0)) * n_naive"
            " * 1000000 div (CAST(sum_abs_d AS DECIMAL(38,0)) * n_fc)"
            " AS BIGINT) END"
        ).alias("mase_micros"),
        F.expr(
            "CASE WHEN n_fc = 0 THEN NULL"
            " ELSE CAST(sum_smape div n_fc AS BIGINT) END"
        ).alias("smape_micros"),
    )


#: Croston smoothing constant and the deterministic part sample (every
#: 29th part keeps the demand table intermittent AND the recursive-CTE
#: oracle tractable at every SF).
_CROSTON_ALPHA = 0.2
_CROSTON_PART_MOD = 29

_CROSTON_ORACLE = f"""
WITH RECURSIVE demand AS (
    SELECT l_partkey AS part,
           datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
               AS idx,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS z
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l_partkey % {_CROSTON_PART_MOD} = 0
    GROUP BY 1, 2
), seq AS (
    SELECT part, z,
           idx - LAG(idx) OVER (PARTITION BY part ORDER BY idx) AS gap,
           ROW_NUMBER() OVER (PARTITION BY part ORDER BY idx) AS rn,
           COUNT(*) OVER (PARTITION BY part) AS n
    FROM demand
), eligible AS (
    SELECT * FROM seq WHERE n >= 3
), rec(part, rn, n, level, interval) AS (
    SELECT s2.part, 2, s2.n,
           {_CROSTON_ALPHA!r} * s2.z + {1.0 - _CROSTON_ALPHA!r} * s1.z,
           CAST(s2.gap AS DOUBLE)
    FROM eligible s1 JOIN eligible s2
      ON s2.part = s1.part AND s1.rn = 1 AND s2.rn = 2
    UNION ALL
    SELECT r.part, r.rn + 1, r.n,
           {_CROSTON_ALPHA!r} * s.z + {1.0 - _CROSTON_ALPHA!r} * r.level,
           {_CROSTON_ALPHA!r} * s.gap
               + {1.0 - _CROSTON_ALPHA!r} * r.interval
    FROM rec r JOIN eligible s
      ON s.part = r.part AND s.rn = r.rn + 1
    WHERE r.rn < r.n
)
SELECT part AS p_partkey, CAST(n AS BIGINT) AS n_demands,
       ROUND(level, 6) AS smoothed_size,
       ROUND(interval, 6) AS smoothed_interval,
       ROUND(level / interval, 6) AS croston_rate,
       ROUND((1.0 - {_CROSTON_ALPHA!r} / 2.0) * level / interval, 6)
           AS sba_rate
FROM rec WHERE rn = n
"""


def _croston_fn(alpha: float):
    """Factory for the per-part Croston recurrence — nested closure so
    cloudpickle ships it by value (the probe_foreign_cwd contract)."""

    def croston(pdf):
        import pandas as pd

        pdf = pdf.sort_values("idx").reset_index(drop=True)
        if len(pdf) < 3:
            return pd.DataFrame(
                {
                    "p_partkey": [],
                    "n_demands": [],
                    "smoothed_size": [],
                    "smoothed_interval": [],
                    "croston_rate": [],
                    "sba_rate": [],
                }
            ).astype(
                {
                    "p_partkey": "int64",
                    "n_demands": "int64",
                    "smoothed_size": "float64",
                    "smoothed_interval": "float64",
                    "croston_rate": "float64",
                    "sba_rate": "float64",
                }
            )
        part = int(pdf["part"].iloc[0])
        z = [float(v) for v in pdf["z"]]
        idx = [int(v) for v in pdf["idx"]]
        gaps = [idx[i] - idx[i - 1] for i in range(1, len(idx))]
        level = alpha * z[1] + (1.0 - alpha) * z[0]
        interval = float(gaps[0])
        for i in range(2, len(z)):
            level = alpha * z[i] + (1.0 - alpha) * level
            interval = alpha * gaps[i - 1] + (1.0 - alpha) * interval
        return pd.DataFrame(
            {
                "p_partkey": [part],
                "n_demands": [len(z)],
                # raw doubles out; the caller applies F.round (HALF_UP,
                # hash-matching DuckDB ROUND) — Python round() is
                # half-even and can diverge on exact midpoints.
                "smoothed_size": [level],
                "smoothed_interval": [interval],
                "croston_rate": [level / interval],
                "sba_rate": [(1.0 - alpha / 2.0) * level / interval],
            }
        )

    return croston


@register(
    "ts_forecast_croston", oracle=_CROSTON_ORACLE, tags=("timeseries", "ml")
)
def ts_forecast_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston (1972) intermittent-demand forecast per part, plus the
    Syntetos–Boylan bias-corrected (SBA) rate — the method demand
    planners reach for when a plain SES reads a sparse series as
    "demand is collapsing" every zero week: Croston smooths the nonzero
    demand SIZES and the inter-demand INTERVALS as two separate SES
    recurrences and forecasts size/interval per period; SBA multiplies
    by (1 − α/2) to undo Croston's documented positive bias. Parts
    sample deterministically (key mod {mod}); initialization convention:
    level seeds from the first two sizes, interval from the first
    observed gap — stated, because every Croston implementation differs
    here.

    Same reduce-then-solve shape as ts_holt_linear: the join+fold to
    (part, day) demand grain is the only data-sized stage; one Arrow
    batch per part runs the recurrence (thousands of independent
    groups — embarrassingly parallel), and the oracle replays the
    IDENTICAL arithmetic DAG as a per-part recursive CTE, so the rates
    hash-match exactly on the DECIMAL-exact inputs. Parts with < 3
    demand days are excluded (nothing to smooth).""".format(
        mod=_CROSTON_PART_MOD
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_partkey") % _CROSTON_PART_MOD == 0
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    demand = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("z")
        )
    )
    out = demand.groupBy("part").applyInPandas(
        _croston_fn(_CROSTON_ALPHA),
        "p_partkey long, n_demands long, smoothed_size double,"
        " smoothed_interval double, croston_rate double, sba_rate double",
    )
    return out.select(
        "p_partkey",
        "n_demands",
        F.round("smoothed_size", 6).alias("smoothed_size"),
        F.round("smoothed_interval", 6).alias("smoothed_interval"),
        F.round("croston_rate", 6).alias("croston_rate"),
        F.round("sba_rate", 6).alias("sba_rate"),
    )


_HAAR_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), idxd AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t, rev
    FROM daily
), lv AS (
    SELECT UNNEST([1, 2, 3, 4]) AS level
), blocks AS (
    SELECT lv.level, i.t // (1 << lv.level) AS b,
           CAST(SUM(CASE WHEN i.t % (1 << lv.level) < (1 << (lv.level - 1))
                    THEN i.rev ELSE 0 END) AS BIGINT) AS s_left,
           CAST(SUM(CASE WHEN i.t % (1 << lv.level) >= (1 << (lv.level - 1))
                    THEN i.rev ELSE 0 END) AS BIGINT) AS s_right,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM idxd i, lv
    GROUP BY 1, 2
), dets AS (
    SELECT level,
           CAST((s_left - s_right) AS DECIMAL(38,0))
               * (s_left - s_right) AS d2
    FROM blocks WHERE cnt = (1 << level)
), per_level AS (
    SELECT level, CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(d2) AS DECIMAL(38,0)) AS e
    FROM dets GROUP BY level
), tot AS (
    SELECT SUM(CAST(e AS HUGEINT) // n_blocks) AS e_tot FROM per_level
)
SELECT level,
       CAST(1 << (level - 1) AS BIGINT) AS scale_days,
       n_blocks,
       CAST(CAST(e AS HUGEINT) // n_blocks AS BIGINT) AS mean_energy_cents2,
       CASE WHEN tot.e_tot = 0 THEN NULL
            ELSE CAST((CAST(e AS HUGEINT) // n_blocks) * 1000 // tot.e_tot
                      AS BIGINT) END AS energy_share_milli
FROM per_level, tot
"""


@register(
    "ts_wavelet_haar_energy", oracle=_HAAR_ORACLE, tags=("timeseries",)
)
def ts_wavelet_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of daily revenue at dyadic
    scales 1/2/4/8 days — "at WHICH timescale does this series vary?":
    each level's detail coefficient is the half-block sum difference
    (s_left − s_right over a 2^k-day block), and the per-level mean
    energy localizes variance the global moments and the periodogram's
    fixed frequency grid each miss (a payday spike loads scale 1; a
    weekly cycle loads scales 2-4; slow drift loads the top level).
    The energy-share column is the scale spectrum a forecaster reads
    before choosing differencing/seasonal terms.

    Integer-exact end to end: cents sums per half-block are exact
    longs, d² products run through DECIMAL(38,0), and both the
    per-level mean and the share exit as truncating integer divisions
    (HUGEINT in the oracle — DuckDB's DECIMAL `//` routes through
    double, the r14 Davies–Bouldin finding). Incomplete tail blocks
    are dropped (cnt = 2^k), the standard dyadic convention. The only
    ordered operation is the dense day index over the bounded calendar
    grain; the block fold is one map-side-combined groupBy on
    (level, t div 2^k) — a 4× fan-out of the DAY table, not the
    facts."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).cast("long").alias("rev")
        )
    )
    idxd = daily.select(
        (F.row_number().over(Window.orderBy("day")) - 1)
        .cast("long")
        .alias("t"),
        "rev",
    )
    lv = spark.range(1, 5).select(F.col("id").cast("int").alias("level"))
    blocks = (
        idxd.crossJoin(F.broadcast(lv))
        .groupBy("level", F.expr("t div (1 << level)").alias("b"))
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN t % (1 << level) < (1 << (level - 1))"
                    " THEN rev ELSE 0 END"
                )
            ).cast("long").alias("s_left"),
            F.sum(
                F.expr(
                    "CASE WHEN t % (1 << level) >= (1 << (level - 1))"
                    " THEN rev ELSE 0 END"
                )
            ).cast("long").alias("s_right"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    dets = blocks.where(F.expr("cnt = (1 << level)")).select(
        "level",
        F.expr(
            "CAST(s_left - s_right AS DECIMAL(38,0)) * (s_left - s_right)"
        ).alias("d2"),
    )
    per_level = dets.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("d2").alias("e"),
    ).withColumn("mean_e", F.expr("e div n_blocks"))
    tot = per_level.agg(F.sum("mean_e").alias("e_tot"))
    return per_level.crossJoin(F.broadcast(tot)).select(
        "level",
        F.expr("CAST(1 << (level - 1) AS BIGINT)").alias("scale_days"),
        "n_blocks",
        F.expr("CAST(mean_e AS BIGINT)").alias("mean_energy_cents2"),
        F.expr(
            "CASE WHEN e_tot = 0 THEN NULL"
            " ELSE CAST(CAST(mean_e AS DECIMAL(38,0)) * 1000"
            " div e_tot AS BIGINT) END"
        ).alias("energy_share_milli"),
    )


_SAMPEN_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN COUNT(*) < 2 THEN NULL
                ELSE CAST(FLOOR(0.2 * STDDEV_SAMP(CAST(rev AS DOUBLE)))
                          AS BIGINT) END AS r
    FROM daily
), seq AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
           rev,
           LEAD(rev, 1) OVER (ORDER BY day) AS x1,
           LEAD(rev, 2) OVER (ORDER BY day) AS x2
    FROM daily
), tmpl AS (
    SELECT i, rev AS x0, x1, x2 FROM seq WHERE x2 IS NOT NULL
), pairs AS (
    SELECT CASE WHEN ABS(a.x0 - b.x0) <= s.r AND ABS(a.x1 - b.x1) <= s.r
                THEN 1 ELSE 0 END AS bm,
           CASE WHEN ABS(a.x0 - b.x0) <= s.r AND ABS(a.x1 - b.x1) <= s.r
                     AND ABS(a.x2 - b.x2) <= s.r
                THEN 1 ELSE 0 END AS am
    FROM tmpl a JOIN tmpl b ON b.i > a.i, stats s
    WHERE s.r IS NOT NULL
), agg AS (
    SELECT CAST(COALESCE(SUM(bm), 0) AS BIGINT) AS b_pairs,
           CAST(COALESCE(SUM(am), 0) AS BIGINT) AS a_pairs
    FROM pairs
)
SELECT (SELECT n FROM stats) AS n_days,
       (SELECT r FROM stats) AS r_cents,
       b_pairs, a_pairs,
       CASE WHEN b_pairs = 0 OR a_pairs = 0 THEN NULL
            ELSE ROUND(-LN(CAST(a_pairs AS DOUBLE) / b_pairs), 6)
            END AS sample_entropy
FROM agg
"""


@register(
    "ts_sample_entropy", oracle=_SAMPEN_ORACLE, tags=("timeseries",)
)
def ts_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (Richman & Moorman 2000, m = 2, r = 0.2σ) of
    daily revenue — the regularity measure from physiological signal
    analysis that reads "how predictable is tomorrow given a 2-day
    template": SampEn = −ln(A/B) where B counts template pairs matching
    within tolerance r at length m and A those still matching at m+1.
    Low SampEn = self-similar/regular (seasonal, forecastable), high =
    novel patterns keep appearing. Complements the spectral entropy
    (frequency domain) with a time-domain, amplitude-aware measure that
    needs no stationarity assumption.

    Exactness: daily cents and the FLOOR-quantized integer tolerance
    make every template comparison an exact integer test, so A and B
    are engine-exact; only the final −ln ratio is a shared double
    (ROUND 6). The O(d²) template-pair join runs on the BOUNDED
    calendar-day grain (the mann_kendall class — ~2 s at any SF since
    days grow with time, not volume); lead windows ride the same
    bounded sort. B = 0 or A = 0 (tiny or constant series... constant
    matches everything, A=B>0 → SampEn 0) pins NULL."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).cast("long").alias("rev")
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(
            "CASE WHEN COUNT(1) < 2 THEN NULL"
            " ELSE CAST(FLOOR(0.2 * STDDEV_SAMP(CAST(rev AS DOUBLE)))"
            " AS BIGINT) END"
        ).alias("r"),
    )
    w = Window.orderBy("day")
    seq = daily.select(
        F.row_number().over(w).cast("long").alias("i"),
        F.col("rev").alias("x0"),
        F.lead("rev", 1).over(w).alias("x1"),
        F.lead("rev", 2).over(w).alias("x2"),
    ).where(F.col("x2").isNotNull())
    a = seq.select(
        F.col("i").alias("ia"),
        F.col("x0").alias("a0"),
        F.col("x1").alias("a1"),
        F.col("x2").alias("a2"),
    )
    b = seq.select(
        F.col("i").alias("ib"),
        F.col("x0").alias("b0"),
        F.col("x1").alias("b1"),
        F.col("x2").alias("b2"),
    )
    pairs = (
        a.join(b, F.col("ib") > F.col("ia"))
        .crossJoin(F.broadcast(stats))
        .where(F.col("r").isNotNull())
        .select(
            F.expr(
                "CASE WHEN ABS(a0 - b0) <= r AND ABS(a1 - b1) <= r"
                " THEN 1 ELSE 0 END"
            ).alias("bm"),
            F.expr(
                "CASE WHEN ABS(a0 - b0) <= r AND ABS(a1 - b1) <= r"
                " AND ABS(a2 - b2) <= r THEN 1 ELSE 0 END"
            ).alias("am"),
        )
    )
    agg = pairs.agg(
        F.coalesce(F.sum("bm"), F.lit(0)).cast("long").alias("b_pairs"),
        F.coalesce(F.sum("am"), F.lit(0)).cast("long").alias("a_pairs"),
    )
    return agg.crossJoin(F.broadcast(stats)).select(
        F.col("n").alias("n_days"),
        F.col("r").alias("r_cents"),
        "b_pairs",
        "a_pairs",
        F.expr(
            "CASE WHEN b_pairs = 0 OR a_pairs = 0 THEN NULL"
            " ELSE ROUND(-LN(CAST(a_pairs AS DOUBLE) / b_pairs), 6) END"
        ).alias("sample_entropy"),
    )


#: KPSS Bartlett-window truncation lag (fixed, as in the original paper's
#: l4 choice; a data-driven lag would make the statistic sample-dependent
#: in a way the fixed-seed testdata doesn't need).
KPSS_LAGS = 4

_KPSS_ORACLE = f"""
WITH daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
    FROM events GROUP BY 1, 2
), stats AS (
    SELECT event_type, idx, yc,
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
           CAST(SUM(yc) OVER (PARTITION BY event_type) AS HUGEINT) AS s
    FROM daily
), e AS (
    SELECT event_type, idx, n,
           CAST(n AS HUGEINT) * yc - s AS ev
    FROM stats
), ps AS (
    SELECT event_type, idx, n, ev,
           SUM(ev) OVER (PARTITION BY event_type ORDER BY idx) AS cum
    FROM e
), lagd AS (
    SELECT event_type, n, ev, cum,
           LAG(ev, 1) OVER (PARTITION BY event_type ORDER BY idx) AS e1,
           LAG(ev, 2) OVER (PARTITION BY event_type ORDER BY idx) AS e2,
           LAG(ev, 3) OVER (PARTITION BY event_type ORDER BY idx) AS e3,
           LAG(ev, 4) OVER (PARTITION BY event_type ORDER BY idx) AS e4
    FROM ps
), fold AS (
    SELECT event_type, MAX(n) AS n,
           SUM(cum * cum) AS a,
           10 * SUM(ev * ev)
             + 2 * (8 * SUM(ev * e1) + 6 * SUM(ev * e2)
                    + 4 * SUM(ev * e3) + 2 * SUM(ev * e4)) AS d
    FROM lagd GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CASE WHEN n < 2 OR d <= 0 THEN NULL
            ELSE CAST(CASE WHEN a >= 0
                 THEN (20000000 * a + n * d) // (2 * n * d)
                 ELSE -((20000000 * (-a) + n * d) // (2 * n * d)) END
                 AS BIGINT)
       END AS eta_micros,
       CASE WHEN n < 2 OR d <= 0 THEN NULL
            ELSE CAST(10000000 * a >= 463000 * n * d AS BIGINT)
       END AS reject_level_5pct
FROM fold
"""


@register(
    "ts_kpss_stationarity", oracle=_KPSS_ORACLE, tags=("timeseries",)
)
def ts_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski–Phillips–Schmidt–Shin
    1992) per event_type daily series — the COMPLEMENT of
    `ts_adf_stationarity`: ADF's null is a unit root, KPSS's null is
    stationarity, and running both is the textbook confirmatory pair
    (agree ⇒ confident; disagree ⇒ near-integrated). η = Σ_t S_t² /
    (n²·σ̂²_lr) with S_t the partial sums of demeaned observations and
    σ̂²_lr the Bartlett-window long-run variance at lag {KPSS_LAGS}.

    Exactness: the demeaned residual is scaled by n (E_t = n·y_t − Σy,
    an exact BIGINT on exact cent inputs), which makes partial sums,
    Σ S_t², and every lag-autocovariance exact integers; the Bartlett
    weights (1 − l/5) are cleared to integers by a global ×10, and the
    n-powers cancel to η = 10·A/(n·D) — ONE exact rational, exited as
    round-half-away-from-zero eta_micros (integer hash). The 5%%
    critical value 0.463 compares as a pure integer inequality. Guards:
    n < 2 days or a zero long-run variance (const/oneday fixtures) →
    NULL. Shape: one map-combined daily fold, then day-grain windows
    partitioned BY KEY (each series is one task's slice; the day grain
    is bounded by calendar time, not corpus size — the same argument as
    every other per-key daily kernel here)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    wk = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("idx")
    e = daily.select(
        "event_type",
        "idx",
        F.count(F.lit(1)).over(wk).cast("long").alias("n"),
        (
            F.count(F.lit(1)).over(wk).cast("decimal(20,0)") * F.col("yc")
            - F.sum(F.col("yc").cast("decimal(20,0)")).over(wk)
        )
        .cast("decimal(25,0)")
        .alias("ev"),
    )
    lagd = e.select(
        "event_type",
        "n",
        "ev",
        F.sum("ev").over(wo.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.lag("ev", 1).over(wo).alias("e1"),
        F.lag("ev", 2).over(wo).alias("e2"),
        F.lag("ev", 3).over(wo).alias("e3"),
        F.lag("ev", 4).over(wo).alias("e4"),
    )
    fold = lagd.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(cum * cum AS DECIMAL(38,0))")).alias("a"),
        F.expr(
            "10 * SUM(CAST(ev * ev AS DECIMAL(38,0)))"
            " + 2 * (8 * SUM(CAST(ev * e1 AS DECIMAL(38,0)))"
            " + 6 * SUM(CAST(ev * e2 AS DECIMAL(38,0)))"
            " + 4 * SUM(CAST(ev * e3 AS DECIMAL(38,0)))"
            " + 2 * SUM(CAST(ev * e4 AS DECIMAL(38,0))))"
        ).alias("d"),
    )
    return fold.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CASE WHEN n < 2 OR d <= 0 THEN NULL"
            " ELSE CAST(CASE WHEN a >= 0"
            " THEN (20000000 * a + n * d) div (2 * n * d)"
            " ELSE -((20000000 * (-a) + n * d) div (2 * n * d)) END"
            " AS BIGINT) END"
        ).alias("eta_micros"),
        F.expr(
            "CASE WHEN n < 2 OR d <= 0 THEN NULL"
            " ELSE CAST(10000000 * a >= 463000 * n * d AS BIGINT) END"
        ).alias("reject_level_5pct"),
    )


def _theta_fn(alpha: float, horizon: int):
    """Factory for the per-key Theta solve (nested closure — pickled by
    value per the probe_foreign_cwd contract). Works on exact integer
    CENTS so the OLS normal-equation sums are exact ints; every double
    is produced by the same expression the oracle writes (float(int)
    conversion ≡ CAST(int AS DOUBLE): both correctly rounded)."""

    def theta(pdf):
        import pandas as pd

        pdf = pdf.sort_values("idx").reset_index(drop=True)
        key = pdf["event_type"].iloc[0]
        yc = [int(v) for v in pdf["yc"]]
        n = len(yc)
        if n < 2:
            return pd.DataFrame(
                {"event_type": [], "h": [], "forecast": []}
            ).astype(
                {"event_type": "str", "h": "int64", "forecast": "float64"}
            )
        st = n * (n + 1) // 2
        stt = n * (n + 1) * (2 * n + 1) // 6
        syc = sum(yc)
        sty = sum((t + 1) * y for t, y in enumerate(yc))
        bnum = n * sty - st * syc
        bden = n * stt - st * st
        b = float(bnum) / float(bden)
        a = (float(syc) - b * float(st)) / float(n)
        level = 2.0 * float(yc[0]) - (a + b * 1.0)
        for t in range(2, n + 1):
            x = 2.0 * float(yc[t - 1]) - (a + b * float(t))
            level = alpha * x + (1.0 - alpha) * level
        return pd.DataFrame(
            {
                "event_type": [key] * horizon,
                "h": list(range(1, horizon + 1)),
                # raw doubles out; caller applies F.round (HALF_UP)
                "forecast": [
                    (0.5 * (a + b * float(n + h)) + 0.5 * level) / 100.0
                    for h in range(1, horizon + 1)
                ],
            }
        )

    return theta


_THETA_ALPHA = 0.5
_THETA_H = 7

#: Theta as a recursive CTE: OLS on exact HUGEINT cent sums (b/a written
#: with the same CAST-then-divide the pandas solve mirrors via
#: float(int)/float(int)), theta2-line SES advanced one state per step —
#: the ts_holt_linear IEEE-DAG-parity argument verbatim.
_THETA_ORACLE = f"""
WITH RECURSIVE daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
    FROM events GROUP BY 1, 2
), seq AS (
    SELECT event_type, yc,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM daily
), ols AS (
    SELECT event_type, CAST(MAX(n) AS HUGEINT) AS n,
           CAST(SUM(rn) AS HUGEINT) AS st,
           CAST(SUM(CAST(rn AS HUGEINT) * rn) AS HUGEINT) AS stt,
           CAST(SUM(yc) AS HUGEINT) AS syc,
           CAST(SUM(CAST(rn AS HUGEINT) * yc) AS HUGEINT) AS sty
    FROM seq GROUP BY event_type
    HAVING MAX(n) >= 2
), ab AS (
    SELECT event_type, n,
           CAST(n * sty - st * syc AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b,
           (CAST(syc AS DOUBLE)
            - CAST(n * sty - st * syc AS DOUBLE)
              / CAST(n * stt - st * st AS DOUBLE) * CAST(st AS DOUBLE))
           / CAST(n AS DOUBLE) AS a
    FROM ols
), rec(event_type, rn, n, a, b, level) AS (
    SELECT s.event_type, 1, ab.n, ab.a, ab.b,
           2.0 * CAST(s.yc AS DOUBLE) - (ab.a + ab.b * 1.0)
    FROM seq s JOIN ab ON ab.event_type = s.event_type AND s.rn = 1
    UNION ALL
    SELECT r.event_type, r.rn + 1, r.n, r.a, r.b,
           {_THETA_ALPHA!r} * (2.0 * CAST(s.yc AS DOUBLE)
               - (r.a + r.b * CAST(r.rn + 1 AS DOUBLE)))
           + {1.0 - _THETA_ALPHA!r} * r.level
    FROM rec r JOIN seq s
      ON s.event_type = r.event_type AND s.rn = r.rn + 1
    WHERE r.rn < r.n
)
SELECT r.event_type, g.h,
       ROUND((0.5 * (r.a + r.b * CAST(r.n + g.h AS DOUBLE))
              + 0.5 * r.level) / 100.0, 6) AS forecast
FROM rec r, UNNEST(generate_series(1, {_THETA_H})) AS g(h)
WHERE r.rn = r.n
"""


@register("ts_theta_forecast", oracle=_THETA_ORACLE, tags=("timeseries", "ml"))
def ts_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner; Hyndman & Billah 2003 showed it is SES with
    drift) of daily value per event_type: decompose into the θ=0 line
    (the OLS trend, fully deterministic) and the θ=2 line (2y − trend,
    double the local curvature), SES the θ=2 line, and average the two
    extrapolations. Complements ts_holt_linear (adaptive trend) and
    ts_forecast_linear (pure OLS): Theta damps trend the way the M3/M4
    evidence prefers.

    Determinism: the OLS normal equations run on exact integer cents
    (Σt, Σt², Σy, Σty are exact HUGEINT/Python-int sums — no unordered
    float accumulation anywhere), and b/a enter the doubles through
    float(int)/float(int) ≡ CAST-then-divide, identical on both
    engines; the SES recursion is the same step-by-step IEEE DAG as
    ts_holt_linear's recursive-CTE parity. Keys with < 2 days emit no
    forecast (oneday/tiny fixtures). The solve input is |keys|·|days|
    rows — applyInPandas after one map-combined daily fold, the
    reference reduce-then-solve split."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    return (
        daily.groupBy("event_type")
        .applyInPandas(
            _theta_fn(_THETA_ALPHA, _THETA_H),
            "event_type string, h long, forecast double",
        )
        .select("event_type", "h", F.round("forecast", 6).alias("forecast"))
    )


#: ARCH-LM shared exit: LM = n·r² over (s_t, s_{t-1}) pairs from exact
#: decimal sums; the χ²(1) 5% critical value compares on the ROUND(4) exit.
_ARCH_LM = (
    "(CAST(np AS DOUBLE)"
    " * (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " * (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)"
    "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / ((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)"
    "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"
)
_ARCH_GUARD = (
    "np < 3"
    " OR CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <= 0e0"
    " OR CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) <= 0e0"
)

_ARCH_ORACLE = f"""
WITH daily AS (
    SELECT event_type,
           datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS idx,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
    FROM events GROUP BY 1, 2
), cen AS (
    SELECT event_type, idx, yc,
           CAST(SUM(yc) OVER (PARTITION BY event_type) AS HUGEINT)
               // CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT)
               AS m
    FROM daily
), sq AS (
    SELECT event_type, idx,
           CAST((yc - m) * (yc - m) AS HUGEINT) AS s
    FROM cen
), pairs AS (
    SELECT event_type, s AS y,
           LAG(s) OVER (PARTITION BY event_type ORDER BY idx) AS x
    FROM sq
), agg AS (
    SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE x IS NOT NULL) AS BIGINT) AS np,
           SUM(x) FILTER (WHERE x IS NOT NULL) AS sx,
           SUM(y) FILTER (WHERE x IS NOT NULL) AS sy,
           SUM(x * y) FILTER (WHERE x IS NOT NULL) AS sxy,
           SUM(x * x) FILTER (WHERE x IS NOT NULL) AS sxx,
           SUM(y * y) FILTER (WHERE x IS NOT NULL) AS syy
    FROM pairs GROUP BY event_type
)
SELECT event_type, np AS n_pairs,
       CASE WHEN {_ARCH_GUARD} THEN NULL
            ELSE ROUND({_ARCH_LM}, 4) END AS lm_stat,
       CASE WHEN {_ARCH_GUARD} THEN NULL
            ELSE CAST(ROUND({_ARCH_LM}, 4) > 3.8415 AS BIGINT)
       END AS reject_5pct
FROM agg
"""


@register("ts_arch_lm_test", oracle=_ARCH_ORACLE, tags=("timeseries",))
def ts_arch_lm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle's ARCH-LM test (Engle 1982, lag-1 form) per event_type daily
    series — volatility clustering: do SQUARED deviations correlate with
    yesterday's? `stat_ljung_box` tests autocorrelation of LEVELS; this
    tests the second moment, the defining symptom of conditional
    heteroskedasticity (risk/fraud streams, bursty traffic), and the
    gate before trusting any constant-variance forecast band
    (ts_holt_linear / ts_theta_forecast intervals). Lag-1 LM = n·r² of
    (s_t, s_{t−1}) against χ²(1) = 3.8415 at 5%.

    Exactness: daily cents are decimal-exact; centering uses the
    TRUNCATED integer mean (S div n — the levene/mood micro-grid
    convention, mirrored by the oracle's HUGEINT //); squared residuals
    and all five regression sums are exact HUGEINT/decimal folds, so
    the one double expression (n·r², written once, shared text) is
    deterministic. Guards: < 3 pairs or a zero-variance side (const
    fixture: all s_t = 0) → NULL. One daily fold + per-key windows on
    the calendar-bounded grain."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("idx"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("yc")
        )
    )
    wk = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("idx")
    sq = daily.select(
        "event_type",
        "idx",
        F.expr(
            "CAST((yc - CAST(SUM(yc) OVER (PARTITION BY event_type)"
            " AS DECIMAL(30,0)) div COUNT(*) OVER (PARTITION BY event_type))"
            " AS DECIMAL(19,0))"
        ).alias("e"),
    ).select(
        "event_type",
        "idx",
        F.expr("CAST(e * e AS DECIMAL(38,0))").alias("s"),
    )
    pairs = sq.select(
        "event_type",
        F.col("s").alias("y"),
        F.lag("s").over(wo).alias("x"),
    )
    # FILTER-clause aggregation (not a pre-filter): a key whose series is
    # a single day keeps its output row with np = 0 → NULL stats, exactly
    # the oracle's shape (oneday/tiny fixtures).
    agg = pairs.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) FILTER (WHERE x IS NOT NULL) AS LONG)").alias(
            "np"
        ),
        F.expr("SUM(x) FILTER (WHERE x IS NOT NULL)").alias("sx"),
        F.expr("SUM(y) FILTER (WHERE x IS NOT NULL)").alias("sy"),
        F.expr(
            "SUM(CAST(x * y AS DECIMAL(38,0))) FILTER (WHERE x IS NOT NULL)"
        ).alias("sxy"),
        F.expr(
            "SUM(CAST(x * x AS DECIMAL(38,0))) FILTER (WHERE x IS NOT NULL)"
        ).alias("sxx"),
        F.expr(
            "SUM(CAST(y * y AS DECIMAL(38,0))) FILTER (WHERE x IS NOT NULL)"
        ).alias("syy"),
    )
    return agg.select(
        "event_type",
        F.col("np").alias("n_pairs"),
        F.expr(
            f"CASE WHEN {_ARCH_GUARD} THEN NULL"
            f" ELSE ROUND({_ARCH_LM}, 4) END"
        ).alias("lm_stat"),
        F.expr(
            f"CASE WHEN {_ARCH_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_ARCH_LM}, 4) > 3.8415 AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Yule-Walker PACF (closed form, lags 1-3) ------------------------------
# Partial autocorrelation via the closed-form solutions of the k-th
# Yule-Walker Toeplitz system (Cramer's rule at k=3): phi_kk is the
# AR(k) coefficient on the deepest lag — the quantity the Box-Jenkins
# AR-order cut-off rule actually reads, which the raw ACF
# (ts_autocorrelation) cannot give. YW convention: r_k uses the GLOBAL
# mean and variance (sum over aligned products / total SS), not the
# per-lag re-centered Pearson of ts_autocorrelation — the two
# operators are deliberately different estimators.

_PACF2 = "((r2 - r1 * r1) / (1.0 - r1 * r1))"
# det of the order-3 Toeplitz and its Cramer numerator, expanded:
_PACF3_DEN = "(1.0 - 2.0 * r1 * r1 - r2 * r2 + 2.0 * r1 * r1 * r2)"
_PACF3_NUM = (
    "(r3 - r1 * r2 - r1 * (r1 * r3 - r2 * r2)"
    " + r1 * (r1 * r1 - r2) * 1.0 - 0.0"
    " + (r1 * r1 - r2) * 0.0)"
)
_PACF3 = f"({_PACF3_NUM} / {_PACF3_DEN})"

_PACF_ORACLE = f"""
WITH daily AS (
    SELECT o_orderdate AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders GROUP BY o_orderdate
), stats AS (
    SELECT COUNT(*) AS n, AVG(rev) AS mu,
           SUM(rev * rev) - COUNT(*) * AVG(rev) * AVG(rev) AS ss
    FROM daily
), lagged AS (
    SELECT rev - (SELECT mu FROM stats) AS x,
           LAG(rev, 1) OVER (ORDER BY d) - (SELECT mu FROM stats) AS x1,
           LAG(rev, 2) OVER (ORDER BY d) - (SELECT mu FROM stats) AS x2,
           LAG(rev, 3) OVER (ORDER BY d) - (SELECT mu FROM stats) AS x3
    FROM daily
), acf AS (
    SELECT (SELECT n FROM stats) AS n,
           SUM(x * x1) / (SELECT ss FROM stats) AS r1,
           SUM(x * x2) / (SELECT ss FROM stats) AS r2,
           SUM(x * x3) / (SELECT ss FROM stats) AS r3
    FROM lagged
    WHERE (SELECT ss FROM stats) > 0
    HAVING COUNT(*) > 0
)
SELECT lag_k, CAST(n AS BIGINT) AS n_days,
       CASE WHEN lag_k = 1 THEN ROUND(r1, 6)
            WHEN lag_k = 2 THEN
                CASE WHEN ABS(1.0 - r1 * r1) < 1e-12 THEN NULL
                     ELSE ROUND({_PACF2}, 6) END
            ELSE
                CASE WHEN ABS({_PACF3_DEN}) < 1e-12 THEN NULL
                     ELSE ROUND({_PACF3}, 6) END
       END AS pacf
FROM acf CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS lag_k) lags
ORDER BY lag_k
"""


@register("ts_pacf_yule_walker", oracle=_PACF_ORACLE, tags=("window", "ml"))
def ts_pacf_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily revenue at lags 1-3 by the
    closed-form Yule-Walker solutions: phi_11 = r1,
    phi_22 = (r2−r1²)/(1−r1²), and phi_33 from Cramer's rule on the
    order-3 Toeplitz system — the AR-order selection readout
    (`ts_autocorrelation` decays slowly for ANY AR process; the PACF
    cuts off sharply at the true order, which is what Box-Jenkins
    actually inspects). No Levinson recursion loop: at fixed small k
    the solve is a ratio of determinant polynomials in (r1, r2, r3),
    shared verbatim with the oracle.

    Scale shape: the fact table folds to the bounded daily grain; the
    global mean/SS is one reduce; three LAG columns ride ONE window
    sort on the daily grain; the r_k sums are one fold; the Toeplitz
    algebra runs on a single row. Degenerate classes: zero variance →
    no acf row (0 output rows); |1−r1²| or det→0 → NULL pacf."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rev").alias("mu"),
        F.expr(
            "SUM(rev * rev) - COUNT(*) * AVG(rev) * AVG(rev)"
        ).alias("ss"),
    )
    w = Window.orderBy(F.asc("d"))
    lagged = (
        daily.select(
            "d",
            "rev",
            F.lag("rev", 1).over(w).alias("p1"),
            F.lag("rev", 2).over(w).alias("p2"),
            F.lag("rev", 3).over(w).alias("p3"),
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "n",
            "ss",
            F.expr("rev - mu").alias("x"),
            F.expr("p1 - mu").alias("x1"),
            F.expr("p2 - mu").alias("x2"),
            F.expr("p3 - mu").alias("x3"),
        )
    )
    acf = (
        lagged.where("ss > 0")
        .agg(
            F.max("n").alias("n"),
            F.expr("SUM(x * x1) / MAX(ss)").alias("r1"),
            F.expr("SUM(x * x2) / MAX(ss)").alias("r2"),
            F.expr("SUM(x * x3) / MAX(ss)").alias("r3"),
        )
        .where(F.col("n").isNotNull())
    )
    lags = spark.range(1, 4).select(F.col("id").cast("int").alias("lag_k"))
    return (
        acf.crossJoin(F.broadcast(lags))
        .select(
            "lag_k",
            F.col("n").cast("long").alias("n_days"),
            F.expr(
                f"CASE WHEN lag_k = 1 THEN ROUND(r1, 6)"
                f" WHEN lag_k = 2 THEN"
                f" CASE WHEN ABS(1.0 - r1 * r1) < 1e-12 THEN NULL"
                f" ELSE ROUND({_PACF2}, 6) END"
                f" ELSE CASE WHEN ABS({_PACF3_DEN}) < 1e-12 THEN NULL"
                f" ELSE ROUND({_PACF3}, 6) END END"
            ).alias("pacf"),
        )
        .orderBy("lag_k")
    )


# --- Lo-MacKinlay variance-ratio test --------------------------------------
# Random-walk diagnostic on the log daily-revenue series: under a
# random walk, the variance of q-period increments is exactly q times
# the 1-period variance; VR(q) far from 1 means mean-reversion (<1) or
# momentum (>1). Overlapping q-sums with the Lo-MacKinlay small-sample
# bias corrections and the homoskedastic asymptotic z.

_VR_Z = "((vr - 1.0) / SQRT(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * tn)))"

_VR_ORACLE = f"""
WITH daily AS (
    SELECT o_orderdate AS d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders GROUP BY o_orderdate
), lx AS (
    SELECT d, LN(rev) AS x FROM daily WHERE rev > 0
), r AS (
    SELECT x - LAG(x, 1) OVER (ORDER BY d) AS r1,
           x - LAG(x, 2) OVER (ORDER BY d) AS r2,
           x - LAG(x, 4) OVER (ORDER BY d) AS r4
    FROM lx
), base AS (
    SELECT COUNT(r1) AS tn, AVG(r1) AS mu,
           SUM(r1 * r1) - COUNT(r1) * AVG(r1) * AVG(r1) AS ss1_num
    FROM r
), s1 AS (
    SELECT tn, mu,
           CASE WHEN tn > 1 THEN ss1_num / (tn - 1) ELSE NULL END AS s1v
    FROM base
), sq AS (
    SELECT q,
           CASE WHEN q = 2 THEN
               (SELECT SUM((r2 - 2 * (SELECT mu FROM s1))
                          * (r2 - 2 * (SELECT mu FROM s1))) FROM r
                WHERE r2 IS NOT NULL)
           ELSE
               (SELECT SUM((r4 - 4 * (SELECT mu FROM s1))
                          * (r4 - 4 * (SELECT mu FROM s1))) FROM r
                WHERE r4 IS NOT NULL)
           END AS ssq,
           CASE WHEN q = 2 THEN
               (SELECT COUNT(r2) FROM r)
           ELSE (SELECT COUNT(r4) FROM r) END AS nq
    FROM (SELECT UNNEST([2, 4]) AS q)
), vrq AS (
    SELECT q, (SELECT CAST(tn AS DOUBLE) FROM s1) AS tn,
           CASE WHEN (SELECT s1v FROM s1) IS NULL
                     OR (SELECT s1v FROM s1) <= 0
                     OR nq = 0 OR (1.0 - CAST(q AS DOUBLE) / (SELECT tn FROM s1)) <= 0
                THEN NULL
                ELSE (ssq / (q * nq
                             * (1.0 - CAST(q AS DOUBLE) / (SELECT tn FROM s1))))
                     / (SELECT s1v FROM s1)
           END AS vr
    FROM sq
)
SELECT CAST(q AS INT) AS q, CAST(tn AS BIGINT) AS n_returns,
       ROUND(vr, 6) AS variance_ratio,
       CASE WHEN vr IS NULL OR tn < 2 THEN NULL
            ELSE ROUND({_VR_Z}, 4) END AS z_stat,
       CASE WHEN vr IS NULL OR tn < 2 THEN NULL
            ELSE CAST(ABS(ROUND({_VR_Z}, 4)) > 1.9600 AS BIGINT)
       END AS reject_5pct
FROM vrq ORDER BY q
"""


@register(
    "ts_variance_ratio_test", oracle=_VR_ORACLE, tags=("window", "ml")
)
def ts_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test (q = 2, 4) on log daily
    revenue: is the series a random walk, mean-reverting (VR < 1), or
    trending (VR > 1)? The diagnostic that separates "forecastable
    structure exists" from `ts_adf_stationarity`'s unit-root question
    — ADF can fail to reject while VR already shows strong
    mean-reversion at short horizons. Overlapping q-period increments
    (x_t − x_{t−q}) with the (T−q+1)(1−q/T) small-sample denominator
    and the homoskedastic z = (VR−1)/sqrt(2(2q−1)(q−1)/(3qT)).

    Scale shape: daily fold → LN → three LAG columns on ONE bounded
    daily-grain window sort → constant-row algebra. Degenerate
    classes: <2 returns, zero 1-period variance, or an empty q-diff
    column → NULL ratio/z (ANSI-null through, matching the oracle)."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    lx = daily.where("rev > 0").select("d", F.expr("LN(rev)").alias("x"))
    w = Window.orderBy(F.asc("d"))
    r = lx.select(
        (F.col("x") - F.lag("x", 1).over(w)).alias("r1"),
        (F.col("x") - F.lag("x", 2).over(w)).alias("r2"),
        (F.col("x") - F.lag("x", 4).over(w)).alias("r4"),
    )
    s1 = r.agg(
        F.count("r1").cast("double").alias("tn"),
        F.avg("r1").alias("mu"),
        F.expr(
            "CASE WHEN COUNT(r1) > 1 THEN"
            " (SUM(r1 * r1) - COUNT(r1) * AVG(r1) * AVG(r1))"
            " / (COUNT(r1) - 1) ELSE NULL END"
        ).alias("s1v"),
    )
    qsums = r.crossJoin(F.broadcast(s1)).agg(
        F.max("tn").alias("tn"),
        F.max("mu").alias("mu"),
        F.max("s1v").alias("s1v"),
        F.sum(F.expr("(r2 - 2 * mu) * (r2 - 2 * mu)")).alias("ss2"),
        F.count("r2").alias("n2"),
        F.sum(F.expr("(r4 - 4 * mu) * (r4 - 4 * mu)")).alias("ss4"),
        F.count("r4").alias("n4"),
    )
    qs = spark.range(0, 2).select(
        F.expr("CAST(CASE WHEN id = 0 THEN 2 ELSE 4 END AS INT)").alias("q")
    )
    vrq = qsums.crossJoin(F.broadcast(qs)).select(
        "q",
        "tn",
        F.expr(
            "CASE WHEN s1v IS NULL OR s1v <= 0"
            " OR (CASE WHEN q = 2 THEN n2 ELSE n4 END) = 0"
            " OR (1.0 - CAST(q AS DOUBLE) / tn) <= 0 THEN NULL"
            " ELSE ((CASE WHEN q = 2 THEN ss2 ELSE ss4 END)"
            " / (q * (CASE WHEN q = 2 THEN n2 ELSE n4 END)"
            " * (1.0 - CAST(q AS DOUBLE) / tn))) / s1v END"
        ).alias("vr"),
    )
    return vrq.select(
        "q",
        F.col("tn").cast("long").alias("n_returns"),
        F.round("vr", 6).alias("variance_ratio"),
        F.expr(
            f"CASE WHEN vr IS NULL OR tn < 2 THEN NULL"
            f" ELSE ROUND({_VR_Z}, 4) END"
        ).alias("z_stat"),
        F.expr(
            f"CASE WHEN vr IS NULL OR tn < 2 THEN NULL"
            f" ELSE CAST(ABS(ROUND({_VR_Z}, 4)) > 1.9600 AS BIGINT) END"
        ).alias("reject_5pct"),
    ).orderBy("q")


# --- Durbin-Watson on detrended daily revenue ------------------------------
# The classic first-order residual-autocorrelation statistic on the
# OLS-detrended daily series: DW = sum (e_t - e_{t-1})^2 / sum e_t^2,
# ~ 2(1 - rho1). The linear fit is the closed-form two-sum OLS on the
# calendar-day grain (same shape as ts_forecast_linear); residual
# differencing is one LAG on the bounded daily window.

_DW = "(sdiff / sse)"
_DW_GUARD = "sse IS NULL OR sse <= 0 OR n < 3"

_DW_ORACLE = f"""
WITH daily AS (
    SELECT epoch_us(o_orderdate - (SELECT MIN(o_orderdate) FROM orders))
               // 86400000000 AS t,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY o_orderdate
), fit AS (
    SELECT COUNT(*) AS n, AVG(CAST(t AS DOUBLE)) AS mx, AVG(y) AS my,
           SUM(CAST(t AS DOUBLE) * y) - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y) AS sxy,
           SUM(CAST(t AS DOUBLE) * t) - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE)) AS sxx
    FROM daily
), resid AS (
    SELECT y - ((SELECT my FROM fit)
                + CASE WHEN (SELECT sxx FROM fit) > 0
                       THEN (SELECT sxy FROM fit) / (SELECT sxx FROM fit)
                       ELSE 0.0 END
                  * (CAST(t AS DOUBLE) - (SELECT mx FROM fit))) AS e,
           t
    FROM daily
), lagged AS (
    SELECT e, e - LAG(e, 1) OVER (ORDER BY t) AS de FROM resid
), fold AS (
    SELECT (SELECT n FROM fit) AS n,
           SUM(e * e) AS sse, SUM(de * de) AS sdiff
    FROM lagged
)
SELECT CAST(n AS BIGINT) AS n_days,
       CASE WHEN {_DW_GUARD} THEN NULL
            ELSE ROUND({_DW}, 4) END AS dw_stat,
       CASE WHEN {_DW_GUARD} THEN 'undefined'
            WHEN ROUND({_DW}, 4) < 1.5 THEN 'positive_autocorr'
            WHEN ROUND({_DW}, 4) > 2.5 THEN 'negative_autocorr'
            ELSE 'none'
       END AS verdict
FROM fold
"""


@register("ts_durbin_watson", oracle=_DW_ORACLE, tags=("window", "ml"))
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on OLS-detrended daily revenue — the
    residual-independence check every regression readout
    (`ts_forecast_linear`, `ts_interrupted_series`) silently assumes:
    DW ≈ 2(1−ρ₁), < 1.5 flags positive serial correlation (reported
    standard errors are too small; switch to Newey-West or model the
    AR term), > 2.5 negative. Complements `stat_ljung_box` (which
    tests the raw series) by testing AFTER the trend is removed.

    Scale shape: fact table folds once to the calendar-day grain; the
    OLS fit is the closed-form two-sum form in ONE reduce; residuals
    and their first difference ride one bounded daily-grain window;
    the DW ratio is a final 1-row fold. Day index is exact integer
    days from the minimum date (epoch_us // 86400000000 — the r15
    seam: never `//` on DuckDB EPOCH doubles). Degenerate classes:
    n < 3 or zero residual variance (perfect fit / flat series) →
    NULL + 'undefined'."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    mind = daily.agg(F.min("o_orderdate").alias("d0"))
    keyed = daily.crossJoin(F.broadcast(mind)).select(
        F.expr(
            "timestampdiff(MICROSECOND, d0, o_orderdate) div 86400000000"
        ).alias("t"),
        "y",
    )
    fit = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("t").cast("double")).alias("mx"),
        F.avg("y").alias("my"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * y)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y)"
        ).alias("sxy"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * t)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE))"
        ).alias("sxx"),
    )
    resid = keyed.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        F.expr(
            "y - (my + CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END"
            " * (CAST(t AS DOUBLE) - mx))"
        ).alias("e"),
    )
    w = Window.orderBy(F.asc("t"))
    lagged = resid.select(
        "n", "e", (F.col("e") - F.lag("e", 1).over(w)).alias("de")
    )
    fold = lagged.agg(
        F.max("n").alias("n"),
        F.sum(F.expr("e * e")).alias("sse"),
        F.sum(F.expr("de * de")).alias("sdiff"),
    )
    return fold.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            f"CASE WHEN {_DW_GUARD} THEN NULL"
            f" ELSE ROUND({_DW}, 4) END"
        ).alias("dw_stat"),
        F.expr(
            f"CASE WHEN {_DW_GUARD} THEN 'undefined'"
            f" WHEN ROUND({_DW}, 4) < 1.5 THEN 'positive_autocorr'"
            f" WHEN ROUND({_DW}, 4) > 2.5 THEN 'negative_autocorr'"
            f" ELSE 'none' END"
        ).alias("verdict"),
    )


# --- Breusch-Pagan heteroskedasticity test ---------------------------------
# Koenker's studentized form on the daily OLS residuals: regress e^2
# on the day index, LM = n * R^2_aux ~ chi2(1). The variance twin of
# ts_durbin_watson's serial-correlation check — together they decide
# whether the OLS standard-error column of any daily-trend readout
# can be trusted at all.

_BP_LM = "(CAST(n AS DOUBLE) * sxy2 * sxy2 / (sxx2 * syy2))"
_BP_GUARD = "n < 3 OR sxx2 <= 0 OR syy2 <= 0"

_BP_ORACLE = f"""
WITH daily AS (
    SELECT epoch_us(o_orderdate - (SELECT MIN(o_orderdate) FROM orders))
               // 86400000000 AS t,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY o_orderdate
), fit AS (
    SELECT COUNT(*) AS n, AVG(CAST(t AS DOUBLE)) AS mx, AVG(y) AS my,
           SUM(CAST(t AS DOUBLE) * y)
               - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y) AS sxy,
           SUM(CAST(t AS DOUBLE) * t)
               - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE))
               AS sxx
    FROM daily
), resid AS (
    SELECT CAST(t AS DOUBLE) AS x,
           POW(y - ((SELECT my FROM fit)
                + CASE WHEN (SELECT sxx FROM fit) > 0
                       THEN (SELECT sxy FROM fit) / (SELECT sxx FROM fit)
                       ELSE 0.0 END
                  * (CAST(t AS DOUBLE) - (SELECT mx FROM fit))), 2) AS e2
    FROM daily
), aux AS (
    SELECT (SELECT n FROM fit) AS n,
           SUM(x * e2) - COUNT(*) * AVG(x) * AVG(e2) AS sxy2,
           SUM(x * x) - COUNT(*) * AVG(x) * AVG(x) AS sxx2,
           SUM(e2 * e2) - COUNT(*) * AVG(e2) * AVG(e2) AS syy2
    FROM resid
)
SELECT CAST(n AS BIGINT) AS n_days,
       CASE WHEN {_BP_GUARD} THEN NULL
            ELSE ROUND({_BP_LM}, 4) END AS bp_lm_stat,
       CASE WHEN {_BP_GUARD} THEN NULL
            ELSE CAST(ROUND({_BP_LM}, 4) > 3.8415 AS BIGINT)
       END AS reject_5pct
FROM aux
"""


@register("ts_breusch_pagan", oracle=_BP_ORACLE, tags=("window", "ml"))
def ts_breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan (Koenker studentized) heteroskedasticity test on
    the daily-revenue trend residuals: does residual VARIANCE drift
    with time? The variance twin of `ts_durbin_watson` — DW flags
    serial correlation, BP flags variance growth; either one breaks
    the homoskedastic OLS standard errors that `ts_forecast_linear`'s
    confidence band assumes. LM = n·R² of the e²-on-t auxiliary
    regression, chi²(1); the Koenker form needs no normality of e.

    Scale shape: same closed-form two-sum OLS on the calendar-day
    grain as ts_durbin_watson (one fact fold, one broadcast fit row),
    auxiliary moments one more bounded-grain fold. Degenerate
    classes: n<3, flat day index, or zero e² variance (perfect fit /
    const series) → NULL."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    mind = daily.agg(F.min("o_orderdate").alias("d0"))
    keyed = daily.crossJoin(F.broadcast(mind)).select(
        F.expr(
            "timestampdiff(MICROSECOND, d0, o_orderdate) div 86400000000"
        ).alias("t"),
        "y",
    )
    fit = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("t").cast("double")).alias("mx"),
        F.avg("y").alias("my"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * y)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y)"
        ).alias("sxy"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * t)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE))"
        ).alias("sxx"),
    )
    resid = keyed.crossJoin(F.broadcast(fit)).select(
        "n",
        F.col("t").cast("double").alias("x"),
        F.expr(
            "POW(y - (my + CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END"
            " * (CAST(t AS DOUBLE) - mx)), 2)"
        ).alias("e2"),
    )
    aux = resid.agg(
        F.max("n").alias("n"),
        F.expr(
            "SUM(x * e2) - COUNT(*) * AVG(x) * AVG(e2)"
        ).alias("sxy2"),
        F.expr("SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)").alias("sxx2"),
        F.expr(
            "SUM(e2 * e2) - COUNT(*) * AVG(e2) * AVG(e2)"
        ).alias("syy2"),
    )
    return aux.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            f"CASE WHEN {_BP_GUARD} THEN NULL"
            f" ELSE ROUND({_BP_LM}, 4) END"
        ).alias("bp_lm_stat"),
        F.expr(
            f"CASE WHEN {_BP_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_BP_LM}, 4) > 3.8415 AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Newey-West HAC standard error for the trend slope ----------------------
# When ts_durbin_watson flags serial correlation, the honest follow-up
# is not to abandon OLS but to fix its standard error: the
# Newey-West/Bartlett HAC variance over the slope scores
# u_t = (t - tbar) e_t with lag window L = 5,
#   V_NW(b) = (S0 + 2 sum_l (1 - l/(L+1)) S_l) / sxx^2.

_NW_L = 5

_NW_ORACLE = f"""
WITH daily AS (
    SELECT epoch_us(o_orderdate - (SELECT MIN(o_orderdate) FROM orders))
               // 86400000000 AS t,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
    FROM orders GROUP BY o_orderdate
), fit AS (
    SELECT COUNT(*) AS n, AVG(CAST(t AS DOUBLE)) AS mx, AVG(y) AS my,
           SUM(CAST(t AS DOUBLE) * y)
               - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y) AS sxy,
           SUM(CAST(t AS DOUBLE) * t)
               - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE))
               AS sxx
    FROM daily
), scores AS (
    SELECT t,
           (CAST(t AS DOUBLE) - (SELECT mx FROM fit))
           * (y - ((SELECT my FROM fit)
                   + CASE WHEN (SELECT sxx FROM fit) > 0
                          THEN (SELECT sxy FROM fit) / (SELECT sxx FROM fit)
                          ELSE 0.0 END
                     * (CAST(t AS DOUBLE) - (SELECT mx FROM fit)))) AS u
    FROM daily
), lagged AS (
    SELECT u,
           LAG(u, 1) OVER (ORDER BY t) AS u1,
           LAG(u, 2) OVER (ORDER BY t) AS u2,
           LAG(u, 3) OVER (ORDER BY t) AS u3,
           LAG(u, 4) OVER (ORDER BY t) AS u4,
           LAG(u, 5) OVER (ORDER BY t) AS u5
    FROM scores
), fold AS (
    SELECT (SELECT n FROM fit) AS n, (SELECT sxx FROM fit) AS sxx,
           (SELECT sxy FROM fit) AS sxy,
           SUM(u * u) AS s0,
           COALESCE(SUM(u * u1), 0.0) AS s1,
           COALESCE(SUM(u * u2), 0.0) AS s2,
           COALESCE(SUM(u * u3), 0.0) AS s3,
           COALESCE(SUM(u * u4), 0.0) AS s4,
           COALESCE(SUM(u * u5), 0.0) AS s5
    FROM lagged
), vnw AS (
    SELECT n, sxx, sxy,
           CASE WHEN sxx > 0 THEN
               (s0 + 2.0 * ((1.0 - 1.0 / {_NW_L + 1}) * s1
                            + (1.0 - 2.0 / {_NW_L + 1}) * s2
                            + (1.0 - 3.0 / {_NW_L + 1}) * s3
                            + (1.0 - 4.0 / {_NW_L + 1}) * s4
                            + (1.0 - 5.0 / {_NW_L + 1}) * s5))
                   / (sxx * sxx)
           ELSE NULL END AS v,
           CASE WHEN sxx > 0 THEN s0 / (sxx * sxx) ELSE NULL END AS v_iid
    FROM fold
)
SELECT CAST(n AS BIGINT) AS n_days,
       CASE WHEN n < 3 OR sxx <= 0 THEN NULL
            ELSE ROUND(sxy / sxx, 6) END AS slope,
       CASE WHEN n < 3 OR sxx <= 0 OR v_iid IS NULL OR v_iid < 0 THEN NULL
            ELSE ROUND(SQRT(v_iid), 6) END AS se_white_iid,
       CASE WHEN n < 3 OR sxx <= 0 OR v IS NULL OR v <= 0 THEN NULL
            ELSE ROUND(SQRT(v), 6) END AS se_newey_west,
       CASE WHEN n < 3 OR sxx <= 0 OR v IS NULL OR v <= 0 THEN NULL
            ELSE ROUND((sxy / sxx) / SQRT(v), 4) END AS t_stat_nw
FROM vnw
"""


@register("ts_newey_west_slope", oracle=_NW_ORACLE, tags=("window", "ml"))
def ts_newey_west_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West HAC standard error (Bartlett kernel, L=5) for the
    daily-revenue trend slope — the repair `ts_durbin_watson`
    prescribes when it flags serial correlation: keep the OLS point
    estimate, replace its variance with the autocovariance-weighted
    sandwich over the slope scores u_t = (t−t̄)e_t. Reports the
    sandwich-vs-White-iid SE pair so the correction factor is visible,
    plus the corrected t statistic.

    Scale shape: one calendar-day fold, one broadcast fit row, five
    LAG columns on ONE bounded daily-grain window sort, one reduce.
    Degenerate classes: n<3, flat day index, or nonpositive sandwich
    (all-zero residuals) → NULL."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )
    mind = daily.agg(F.min("o_orderdate").alias("d0"))
    keyed = daily.crossJoin(F.broadcast(mind)).select(
        F.expr(
            "timestampdiff(MICROSECOND, d0, o_orderdate) div 86400000000"
        ).alias("t"),
        "y",
    )
    fit = keyed.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("t").cast("double")).alias("mx"),
        F.avg("y").alias("my"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * y)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(y)"
        ).alias("sxy"),
        F.expr(
            "SUM(CAST(t AS DOUBLE) * t)"
            " - COUNT(*) * AVG(CAST(t AS DOUBLE)) * AVG(CAST(t AS DOUBLE))"
        ).alias("sxx"),
    )
    scores = keyed.crossJoin(F.broadcast(fit)).select(
        "t",
        "n",
        "sxx",
        "sxy",
        F.expr(
            "(CAST(t AS DOUBLE) - mx)"
            " * (y - (my + CASE WHEN sxx > 0 THEN sxy / sxx ELSE 0.0 END"
            " * (CAST(t AS DOUBLE) - mx)))"
        ).alias("u"),
    )
    w = Window.orderBy(F.asc("t"))
    lagged = scores.select(
        "n",
        "sxx",
        "sxy",
        "u",
        *[F.lag("u", i).over(w).alias(f"u{i}") for i in range(1, _NW_L + 1)],
    )
    fold = lagged.agg(
        F.max("n").alias("n"),
        F.max("sxx").alias("sxx"),
        F.max("sxy").alias("sxy"),
        F.sum(F.expr("u * u")).alias("s0"),
        *[
            F.coalesce(F.sum(F.expr(f"u * u{i}")), F.lit(0.0)).alias(
                f"s{i}"
            )
            for i in range(1, _NW_L + 1)
        ],
    )
    bart = " + ".join(
        f"(1.0 - {i}.0 / {_NW_L + 1}) * s{i}" for i in range(1, _NW_L + 1)
    )
    vnw = fold.select(
        "n",
        "sxx",
        "sxy",
        # sxx = 0 (single day / flat index) must short-circuit BEFORE the
        # division: ANSI Spark raises DIVIDE_BY_ZERO on the eager form.
        F.expr(
            f"CASE WHEN sxx > 0 THEN (s0 + 2.0 * ({bart})) / (sxx * sxx)"
            f" ELSE NULL END"
        ).alias("v"),
        F.expr(
            "CASE WHEN sxx > 0 THEN s0 / (sxx * sxx) ELSE NULL END"
        ).alias("v_iid"),
    )
    return vnw.select(
        F.col("n").cast("long").alias("n_days"),
        F.expr(
            "CASE WHEN n < 3 OR sxx <= 0 THEN NULL"
            " ELSE ROUND(sxy / sxx, 6) END"
        ).alias("slope"),
        F.expr(
            "CASE WHEN n < 3 OR sxx <= 0 OR v_iid IS NULL OR v_iid < 0 THEN NULL"
            " ELSE ROUND(SQRT(v_iid), 6) END"
        ).alias("se_white_iid"),
        F.expr(
            "CASE WHEN n < 3 OR sxx <= 0 OR v IS NULL OR v <= 0 THEN NULL"
            " ELSE ROUND(SQRT(v), 6) END"
        ).alias("se_newey_west"),
        F.expr(
            "CASE WHEN n < 3 OR sxx <= 0 OR v IS NULL OR v <= 0 THEN NULL"
            " ELSE ROUND((sxy / sxx) / SQRT(v), 4) END"
        ).alias("t_stat_nw"),
    )
