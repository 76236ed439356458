"""Interval / time-grid operators — bucketed range join, gap-fill with
forward fill, and interval-overlap concurrency.

Spark has no native range-join optimizer rule (a point-in-interval ON
clause compiles to BroadcastNestedLoopJoin or a cartesian product), so the
big×big case needs the classic bucketing rewrite: quantize both sides to
fixed-width buckets no narrower than the band, explode the interval side
into the ≤2 buckets it can overlap, equi-join on the bucket key, and
re-check the exact predicate. The candidate space drops from |O|×|L| to
(rows per bucket)², and the join is an ordinary shuffled hash join that
scales horizontally. Same rewrite Databricks' range-join hint and Flink's
interval join apply internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import epoch_us, load
from recommendation_system_big_data_spark.registry import register

#: Range-join band: lineitems shipped within [o_orderdate, +3 days).
_BAND_DAYS = 3
#: Bucket width must be ≥ band so an interval spans at most 2 buckets.
_BUCKET_DAYS = 4

#: Interval-side selectivity: only top-value orders open a window. Range
#: joins are interval×point — the interesting case keeps the point side
#: huge and the interval side selective; an all-orders × all-lineitems
#: 3-day band would emit ~0.2% of the cross product (≈10^8 pairs at
#: sf0.1, ≈10^14 at 100 TB), which no join strategy survives — that is a
#: semantics problem, not a plan problem.
_MIN_ORDER_VALUE = 495_000.0

def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    band: int,
    bucket_width: int | None = None,
) -> DataFrame:
    """Equi-join rewrite of ``ON p >= s AND p < s + band`` (integer domain).

    Quantize both sides to ``bucket_width``-wide buckets (must be ≥ band;
    default band+1): an interval [s, s+band) can only contain points in
    buckets ⌊s/w⌋ and ⌊s/w⌋+1, so the interval side explodes into exactly
    those two keys, the point side keeps its single bucket, and a bucket
    equi-join + exact re-check replaces the nested-loop plan an
    inequality-only ON clause compiles to. Each qualifying pair meets in
    exactly ONE bucket (the point's), so no post-join dedup. Returns the
    joined frame with both sides' columns; callers aggregate.

    Property-tested against the naive cross-join filter in
    tests/test_property_ranges.py (random bands, bucket-boundary cases).
    """
    w = bucket_width if bucket_width is not None else band + 1
    if w < band:
        raise ValueError(f"bucket_width {w} must be >= band {band}")
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.floor(F.col(start_col) / w),
                F.floor(F.col(start_col) / w) + 1,
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    return (
        pt.join(iv, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(start_col) + band)
        )
        .drop("__bucket")
    )


_RANGE_JOIN_ORACLE = f"""
SELECT strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS order_month,
       COUNT(*) AS n_pairs
FROM orders o
JOIN lineitem l
  ON CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
 AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
     + INTERVAL {_BAND_DAYS} DAYS
 AND l.l_orderkey <> o.o_orderkey
WHERE o.o_totalprice > {_MIN_ORDER_VALUE}
GROUP BY 1
"""


@register("join_range_bucketed", oracle=_RANGE_JOIN_ORACLE, tags=("range",))
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via bucketing: count, per order month, the
    OTHER orders' lineitems shipped inside each top-value order's 3-day
    window — a co-shipment density signal around big purchases. The
    interval side is filtered (top ~1% by order value, pushed to the
    scan); the point side is the full fact table.

    Both sides quantize ship/order dates to 4-day buckets. A 3-day interval
    starting at day `s` can only contain points in buckets ⌊s/4⌋ and
    ⌊s/4⌋+1, so the interval side explodes into exactly those two bucket
    keys (2× fan-out, constant), the point side keeps its single bucket,
    and the bucket equi-join + exact-predicate filter replaces the
    nested-loop plan Spark would otherwise pick for an inequality-only ON
    clause. Bucket width ≥ band guarantees each qualifying pair meets in
    exactly one bucket — no post-join dedup. Per-bucket row counts are
    bounded by data density per 4 days, independent of total history
    length, so the plan survives a 100× scale-up where the nested loop is
    quadratic."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > _MIN_ORDER_VALUE)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.datediff(
                F.col("o_orderdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("o_day"),
        )
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("l_day"),
    )
    pairs = point_in_interval_join(
        li, o, "l_day", "o_day", _BAND_DAYS, _BUCKET_DAYS
    ).filter(F.col("l_orderkey") != F.col("o_orderkey"))
    return pairs.groupBy("order_month").agg(F.count(F.lit(1)).alias("n_pairs"))


#: Gap-fill grid resolution: one hour, in microseconds.
_HOUR_US = 3_600_000_000

#: Fixed event-type domain (same contract as reshape.EVENT_TYPES — an
#: unbounded domain would need a discovery scan and is a determinism risk).
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_GAPFILL_ORACLE = f"""
WITH sparse AS (
    SELECT event_type,
           epoch_us(ts) // {_HOUR_US} AS hour_idx,
           CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS hour_sum
    FROM events GROUP BY 1, 2
), bounds AS (
    SELECT MIN(hour_idx) AS mn, MAX(hour_idx) AS mx FROM sparse
), grid AS (
    SELECT t.event_type, g.hour_idx
    FROM (VALUES {", ".join(f"('{t}')" for t in _EVENT_TYPES)}) AS t(event_type),
         bounds, UNNEST(generate_series(bounds.mn, bounds.mx)) AS g(hour_idx)
)
SELECT grid.event_type,
       grid.hour_idx,
       ROUND(LAST_VALUE(sparse.hour_sum IGNORE NULLS) OVER (
           PARTITION BY grid.event_type ORDER BY grid.hour_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 6) AS filled_sum,
       CASE WHEN sparse.hour_sum IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid LEFT JOIN sparse
  ON grid.event_type = sparse.event_type AND grid.hour_idx = sparse.hour_idx
"""


@register("ts_gapfill_ffill", oracle=_GAPFILL_ORACLE, tags=("range",))
def ts_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly per-type value sums on a dense
    hour grid, empty hours forward-filled from the last observed hour —
    the resample + ffill step every downstream window/forecast pipeline
    assumes (hypertable-style time_bucket gapfill + locf).

    The dense grid is generated distributively — `sequence()` between the
    observed min/max hour exploded against the fixed type domain — not
    collected and re-parallelized. Forward fill is `last(x, ignorenulls)`
    over an hour-ordered window per series; one shuffle on event_type for
    the window, after an hour-level pre-aggregate has collapsed the stream
    to |hours|×|types| rows. Decimal sums keep hour totals
    order-independent (tpch.py determinism note); the per-series window
    partitions are grid-sized (bounded by time span, not event volume), so
    a skewed type costs nothing extra."""
    ev = load(spark, sf_dir, "events")
    sparse = (
        ev.select(
            "event_type",
            F.floor(epoch_us("ts") / _HOUR_US).cast("long").alias("hour_idx"),
            "value",
        )
        .groupBy("event_type", "hour_idx")
        .agg(
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("hour_sum")
        )
    )
    bounds = sparse.agg(
        F.min("hour_idx").alias("mn"), F.max("hour_idx").alias("mx")
    )
    types = spark.createDataFrame(
        [(t,) for t in _EVENT_TYPES], "event_type string"
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("hour_idx")
        )
        .crossJoin(F.broadcast(types))
    )
    ffill = Window.partitionBy("event_type").orderBy("hour_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return grid.join(sparse, ["event_type", "hour_idx"], "left").select(
        "event_type",
        "hour_idx",
        F.round(F.last("hour_sum", ignorenulls=True).over(ffill), 6).alias(
            "filled_sum"
        ),
        F.when(F.col("hour_sum").isNull(), 1).otherwise(0).alias("is_gap"),
    )


#: Same inactivity gap as sessionize_events (windows.py) — sessions stay
#: "active" until the timeout, so the interval is [first_event, last+gap).
_SESSION_GAP_US = 43_200_000_000

_CONCURRENCY_ORACLE = f"""
WITH stamped AS (
    SELECT user_id, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
    FROM events
), flagged AS (
    SELECT user_id, us,
           SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING
           ) AS sid
    FROM stamped
), intervals AS (
    SELECT user_id, sid, MIN(us) AS s_us, MAX(us) + {_SESSION_GAP_US} AS e_us
    FROM flagged GROUP BY user_id, sid
), boundaries AS (
    SELECT s_us AS us, 1 AS delta FROM intervals
    UNION ALL
    SELECT e_us AS us, -1 AS delta FROM intervals
), net AS (
    SELECT us, SUM(delta) AS net FROM boundaries GROUP BY us
), conc AS (
    SELECT us, SUM(net) OVER (ORDER BY us ROWS UNBOUNDED PRECEDING) AS n
    FROM net
)
SELECT CAST(MAX(n) AS BIGINT) AS peak_concurrency,
       MIN(us) FILTER (WHERE n = (SELECT MAX(n) FROM conc)) AS peak_at_us
FROM conc
"""


@register(
    "max_concurrent_intervals", oracle=_CONCURRENCY_ORACLE, tags=("range",)
)
def max_concurrent_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval overlap: the maximum number of simultaneously active
    user sessions and the first instant it is reached (capacity-planning /
    peak-load shape).

    Sessions are the gap-based intervals of sessionize_events, active
    until the 12 h timeout. Each interval emits a +1/−1 boundary pair; the
    boundaries collapse to one net delta per timestamp (ends sort with
    starts at the same instant, so touching sessions never double-count),
    and the running sum of nets IS the concurrency curve.

    The prefix sum over the single global time order is the scale hazard —
    a bare Window.orderBy(us) funnels every boundary through one task.
    This uses the two-phase distributed pattern instead: range-partition
    by timestamp, per-partition running sums, then a per-partition-totals
    cumulative offset (a ≤|partitions|-row window — trivially small)
    broadcast-joined back. Each task scans only its time slice; the
    sequential step is O(partitions), not O(boundaries)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy("us")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(order).isNull()
            | (F.col("us") - F.lag("us").over(order) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = flagged.groupBy("user_id", "sid").agg(
        F.min("us").alias("s_us"),
        (F.max("us") + F.lit(_SESSION_GAP_US)).alias("e_us"),
    )
    return interval_peak_concurrency(intervals)


def running_sums(
    df: DataFrame,
    order_cols: list[str],
    sums: dict[str, tuple[str, bool]],
    n_parts: int = 16,
    group_cols: tuple = (),
    keep_pid: bool = False,
) -> DataFrame:
    """Distributed running sums over ONE global order — the two-phase
    prefix-sum pattern: range-partition on the order columns, running
    sums within each partition, then a per-partition-totals cumulative
    offset (the only sequential window, ≤ n_parts rows) broadcast back.
    Each task scans only its slice; the sequential step is O(n_parts),
    never O(rows). This is the scale-correct replacement for a bare
    ``Window.orderBy(...)`` whenever the ordered grain grows with data
    (the statistical kernels' distinct-score/value grids, cumulative
    shares over dimension tables, boundary sweeps).

    ``sums`` maps output column → (value column, inclusive?); exclusive
    sums (inclusive=False) are the "strictly before this row" shape the
    midrank kernels need, 0 for the first row. Contract: ``order_cols``
    must be ASCENDING-comparable and must uniquely identify rows (every
    caller here folds to a distinct grain first — a range boundary may
    split ties otherwise), and value columns must be exact types
    (integral/decimal): float running sums would vary with the sampled
    partition boundaries. Values are partitioning-invariant by
    construction, so oracle hashes are unaffected by where the cuts
    land. repartitionByRange samples boundaries per execution, and the
    within/offsets branches are only consistent if they see the SAME
    cuts — the localCheckpoint is REQUIRED, not an optimization (AQE
    replan / disabled exchange reuse would silently corrupt the sum).
    ``group_cols`` generalizes to one independent running sum PER GROUP
    (the order restarts in every group): the range partitioning leads
    with the group key so each group's rows span a contiguous pid
    range, the within-partition window adds the group to its partition
    key, and the offsets fold runs per (group, pid) — still ≤
    groups×n_parts rows through the only ordered windows.
    ``keep_pid=True`` preserves the ``_pid`` column so callers can
    derive partition-boundary handoffs (e.g. a grouped lead) from the
    SAME checkpointed cuts — pid values are range-ordered by
    construction. Property-tested against a sequential reference in
    tests/test_property_ranges.py."""
    gcols = list(group_cols)
    parts = (
        df.repartitionByRange(n_parts, *gcols, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    w_in = Window.partitionBy(*gcols, "_pid").orderBy(*order_cols)
    out = parts
    tot_aggs = []
    for out_col, (val, inclusive) in sums.items():
        hi = Window.currentRow if inclusive else -1
        out = out.withColumn(
            f"_run_{out_col}",
            F.coalesce(
                F.sum(val).over(w_in.rowsBetween(Window.unboundedPreceding, hi)),
                F.lit(0),
            ),
        )
        tot_aggs.append(F.sum(val).alias(f"_tot_{out_col}"))
    offsets = parts.groupBy(*gcols, "_pid").agg(*tot_aggs)
    w_off = (
        Window.partitionBy(*gcols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    for out_col in sums:
        offsets = offsets.withColumn(
            f"_off_{out_col}",
            F.coalesce(F.sum(f"_tot_{out_col}").over(w_off), F.lit(0)),
        )
    joined = out.join(
        F.broadcast(
            offsets.select(*gcols, "_pid", *[f"_off_{c}" for c in sums])
        ),
        gcols + ["_pid"],
    )
    for out_col in sums:
        joined = joined.withColumn(
            out_col, F.col(f"_run_{out_col}") + F.col(f"_off_{out_col}")
        )
    return joined.drop(
        *([] if keep_pid else ["_pid"]),
        *[f"_run_{c}" for c in sums],
        *[f"_off_{c}" for c in sums],
    )


def ntile_distributed(
    df: DataFrame,
    order_cols: list,
    k: int,
    out_col: str,
    n_parts: int = 16,
) -> DataFrame:
    """Exact SQL NTILE(k) over a global order WITHOUT a single-task sort:
    rank = exclusive running count of ones + 1 (running_sums), n = one
    broadcast scalar, bucket = the standard remainder split (the first
    n % k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — SQL NTILE's exact
    distribution, so this is hash-identical to F.ntile on the same
    tie-broken order). Same contract as running_sums: order_cols must
    uniquely identify rows (pre-negate numerics for descending order).
    Property-tested against F.ntile in tests/test_property_ranges.py."""
    ranked = running_sums(
        df.withColumn("_one", F.lit(1)),
        order_cols,
        {"_r0": ("_one", False)},
        n_parts,
    )
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    r = F.col("_r0") + 1
    q = F.floor(F.col("_n") / k).cast("long")
    rem = F.col("_n") % k
    thr = rem * (q + 1)
    bucket = F.when(r <= thr, F.floor((r - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((r - thr - 1) / q) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_one", "_r0", "_n")
    )


def interval_peak_concurrency(
    intervals: DataFrame,
    start_col: str = "s_us",
    end_col: str = "e_us",
    n_parts: int = 16,
) -> DataFrame:
    """Peak overlap of half-open intervals [start, end) → 1 row
    (peak_concurrency, peak_at_us). The +1/−1 boundary sweep with the
    two-phase distributed prefix sum (running_sums above).
    Property-tested against a brute-force sweep in
    tests/test_property_ranges.py."""
    boundaries = intervals.select(
        F.col(start_col).alias("us"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select(F.col(end_col).alias("us"), F.lit(-1).alias("delta"))
    )
    net = boundaries.groupBy("us").agg(F.sum("delta").alias("net"))
    conc = running_sums(net, ["us"], {"n": ("net", True)}, n_parts).select(
        "us", "n"
    )
    # Peak, then first instant reaching it — two passes over the curve.
    # The curve is |distinct boundary timestamps| rows (≪ events), so a
    # lineage cut is cheap and guarantees the sessionize/window pipeline
    # underneath runs once, rather than relying on AQE exchange reuse.
    conc = conc.localCheckpoint()
    peak = conc.agg(F.max("n").alias("mx"))
    return (
        conc.join(F.broadcast(peak), F.col("n") == F.col("mx"))
        .agg(
            F.max("n").cast("long").alias("peak_concurrency"),
            F.min("us").alias("peak_at_us"),
        )
    )


#: Interval-overlap join bucket width: one day of microseconds.
_OVERLAP_BUCKET_US = 86_400_000_000

_INTERVAL_OVERLAP_ORACLE = f"""
WITH stamped AS (
    SELECT user_id, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
    FROM events
), flagged AS (
    SELECT user_id, us,
           SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING
           ) AS sid
    FROM stamped
), iv AS (
    SELECT user_id, sid, MIN(us) AS s_us, MAX(us) + {_SESSION_GAP_US} AS e_us
    FROM flagged GROUP BY user_id, sid
)
SELECT COUNT(*) AS n_overlapping_pairs,
       COUNT(DISTINCT a.user_id) AS n_even_users
FROM iv a JOIN iv b
  ON a.user_id % 2 = 0 AND b.user_id % 2 = 1
 AND a.s_us < b.e_us AND b.s_us < a.e_us
"""


@register("join_interval_overlap", oracle=_INTERVAL_OVERLAP_ORACLE, tags=("range",))
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join — the general case point_in_interval
    is a degenerate form of: count session pairs (even-user × odd-user)
    whose active intervals overlap (co-presence / concurrent-usage
    analysis).

    Bucketing now fans out BOTH sides: each interval explodes into every
    day-bucket it spans (variable fan-out, bounded by interval length ÷
    bucket width — the data-dependent cost knob of interval joins), the
    join is an equi-join on the bucket, and the exact overlap predicate
    re-checks. A pair can now meet in MANY buckets, so instead of a
    post-join distinct, each pair is counted only in its canonical first
    shared bucket — ⌊max(s₁,s₂)/w⌋, which both intervals provably cover —
    a stateless predicate, not a dedup shuffle. Session building is the
    one (user_id) shuffle; the overlap join shuffles on day buckets,
    where per-bucket density is bounded by concurrent sessions per day,
    not by history length."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy("us")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(order).isNull()
            | (F.col("us") - F.lag("us").over(order) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "sid",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    iv = flagged.groupBy("user_id", "sid").agg(
        F.min("us").alias("s_us"),
        (F.max("us") + F.lit(_SESSION_GAP_US)).alias("e_us"),
    )

    def explode_buckets(df: DataFrame, prefix: str) -> DataFrame:
        w = _OVERLAP_BUCKET_US
        return df.select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("s_us").alias(f"{prefix}_s"),
            F.col("e_us").alias(f"{prefix}_e"),
            F.explode(
                F.sequence(
                    F.floor(F.col("s_us") / w),
                    F.floor((F.col("e_us") - 1) / w),
                )
            ).alias("bucket"),
        )

    a = explode_buckets(iv.filter(F.col("user_id") % 2 == 0), "a")
    b = explode_buckets(iv.filter(F.col("user_id") % 2 == 1), "b")
    w = _OVERLAP_BUCKET_US
    pairs = a.join(b, "bucket").filter(
        (F.col("a_s") < F.col("b_e"))
        & (F.col("b_s") < F.col("a_e"))
        # canonical first shared bucket: count each pair exactly once
        & (F.col("bucket") == F.floor(F.greatest("a_s", "b_s") / w))
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs"),
        F.countDistinct("a_user").alias("n_even_users"),
    )


_UNION_COVERAGE_ORACLE = """
WITH iv AS (
    SELECT user_id,
           epoch_us(ts) AS s,
           epoch_us(ts) + 1800000000 AS e,
           event_id
    FROM events
), flagged AS (
    SELECT user_id, s, e, event_id,
           CASE WHEN s > COALESCE(MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), -1) THEN 1 ELSE 0 END AS new_island
    FROM iv
), islanded AS (
    SELECT user_id, s, e,
           CAST(SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS island
    FROM flagged
), islands AS (
    SELECT user_id, island,
           MIN(s) AS island_start, MAX(e) AS island_end
    FROM islanded GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(island_end - island_start) // 1000000 AS BIGINT)
           AS coverage_seconds
FROM islands GROUP BY user_id
"""


def interval_union_per_key(
    iv: DataFrame, key: str = "user_id", s: str = "s", e: str = "e",
    ordcol: str = "event_id",
) -> DataFrame:
    """Library kernel: per-key union of [s, e) integer intervals via the
    running-max sweep (island detection → island extents → summed
    lengths). Input columns: key, s, e, ordcol (a per-key tiebreaker
    making the sort total). Output: key, n_islands, coverage_units
    (Σ island lengths, in the input's integer units).

    Property-tested against a brute-force interval merge on random
    inputs in tests/test_property_ranges.py — the relational sweep and
    the sequential merge must agree exactly on every generated case."""
    prior = (
        Window.partitionBy(key)
        .orderBy(s, ordcol)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy(key)
        .orderBy(s, ordcol)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = iv.select(
        key,
        s,
        e,
        ordcol,
        F.when(
            F.col(s) > F.coalesce(F.max(e).over(prior), F.lit(None)), 1
        )
        .otherwise(F.when(F.max(e).over(prior).isNull(), 1).otherwise(0))
        .alias("new_island"),
    )
    islanded = flagged.select(
        key,
        s,
        e,
        F.sum("new_island").over(run).cast("long").alias("island"),
    )
    islands = islanded.groupBy(key, "island").agg(
        F.min(s).alias("island_start"), F.max(e).alias("island_end")
    )
    return islands.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start"))
        .cast("long")
        .alias("coverage_units"),
    )


@register(
    "ts_interval_union_coverage",
    oracle=_UNION_COVERAGE_ORACLE,
    tags=("range", "timeseries"),
)
def ts_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of overlapping intervals per user — each event opens a
    30-minute activity window; overlapping windows merge, and the answer
    is total COVERED time (the billing/engagement/SLA-uptime measure that
    double-counting naive sums get wrong). The set-union complement of
    `max_concurrent_intervals` (peak overlap) and `window_gaps_islands`
    (which islands integer days; this islands real intervals).

    Classic sweep in relational form (the `interval_union_per_key`
    kernel, property-tested against a brute-force merge): one (user)
    shuffle, running MAX of prior interval ends detects island starts,
    a running SUM of those flags numbers the islands, and coverage is
    Σ(max end − min start) per island. All epoch-microsecond integer
    arithmetic — exact on both engines. Both windows share one
    partitioning+ordering → single exchange + sort."""
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        epoch_us("ts").alias("s"),
        (epoch_us("ts") + 1_800_000_000).alias("e"),
        "event_id",
    )
    per_key = interval_union_per_key(iv)
    return per_key.select(
        "user_id",
        "n_islands",
        F.expr("coverage_units div 1000000").cast("long").alias(
            "coverage_seconds"
        ),
    )
