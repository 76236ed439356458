"""Window functions — per-group top-k, ranking, analytics, frames.

The reference's only per-group top-k is delegated to MLlib
(`recommendForUserSubset`, model-als.py:132); SURVEY.md §2.5 declares the
idiomatic Window realization as the engine surface. All orderings carry
explicit tiebreakers so results are oracle-hashable.

Scale note: a Window.partitionBy(k) is one shuffle on k; for top-k over
heavily skewed partitions, pre-aggregate or salt first. None of these
queries sort globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import epoch_s, epoch_us, load
from recommendation_system_big_data_spark.registry import register


@register(
    "topk_per_user",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY value DESC, event_id ASC
               ) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
    tags=("window", "headline"),
)
def topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user top-3 events by value (op #26) — the relational equivalent of
    the reference's recommendForUserSubset top-30 (model-als.py:132)."""
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value", "rn")
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_size, rnk, drnk FROM (
        SELECT p_partkey, p_brand, p_size,
               RANK()       OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS rnk,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS drnk
        FROM part
    ) WHERE rnk <= 3
    """,
    tags=("window",),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank with genuine ties (SURVEY.md §2.5 extension row).
    Tie groups share a rank, so the emitted row set is deterministic without
    an intra-tie ordering."""
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return (
        load(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_brand",
            "p_size",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value
    FROM events
    """,
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over per-user event time (SURVEY.md §2.5)."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "window_ntile_dist",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    tags=("window",),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartiles, percent_rank, cume_dist over a
    fully-tiebroken global order (SURVEY.md §2.5).

    r11 (VERDICT r10 #3): `orders` is fact-scaled, so the global order no
    longer runs as a bare Window.orderBy (a single-reducer sort at 100 TB)
    — the rank comes from ranges.running_sums' two-phase distributed
    prefix count, and all three distribution statistics derive from it
    exactly: the order is unique (o_orderkey tiebreak), so rank ≡
    row_number, NTILE(4) is the remainder split on that rank
    (hash-identical to F.ntile — property-tested in
    tests/test_property_ranges.py), percent_rank = (rank−1)/(n−1) and
    cume_dist = rank/n with n one broadcast scalar. The §2.5
    window-function FORM itself stays demonstrated on bounded grain by
    rfm_segmentation (per-customer) and window_percent_rank_cume."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    base = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", (-F.col("o_totalprice")).alias("_np"))
        .withColumn("_one", F.lit(1))
    )
    ranked = running_sums(base, ["_np", "o_orderkey"], {"_r0": ("_one", False)})
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    # NTILE boundaries in pure integer arithmetic (`div`, r11 ADVICE):
    # floor(double/double) relies on IEEE rounding never crossing an
    # integer boundary; exact at any n only with integral division.
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn("_r", F.col("_r0") + F.lit(1).cast("long"))
        .withColumn("_q", F.expr("_n div 4"))
        .withColumn("_rem", F.col("_n") % 4)
        .withColumn("_thr", F.col("_rem") * (F.col("_q") + 1))
        .withColumn(
            "quartile",
            F.when(
                F.col("_r") <= F.col("_thr"),
                F.expr("(_r - 1) div (_q + 1)") + 1,
            )
            .otherwise(F.col("_rem") + F.expr("(_r - _thr - 1) div _q") + 1)
            .cast("int"),
        )
        .select(
            "o_orderkey",
            "quartile",
            # n = 1: both engines' builtin PERCENT_RANK defines the single
            # row as 0.0 — pin that instead of the (n−1)=0 ANSI raise the
            # derived form would hit (r13 tiny-fixture probe finding).
            F.when(F.col("_n") == 1, F.lit(0.0))
            .otherwise(
                F.round((F.col("_r") - 1) / (F.col("_n") - 1), 6)
            )
            .alias("pct_rank"),
            F.round(F.col("_r") / F.col("_n"), 6).alias("cume"),
        )
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: per-customer running spend (SURVEY.md §2.5).
    Decimal accumulation keeps every prefix sum exact and order-stable."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           ROUND(FIRST_VALUE(value) OVER w, 6) AS first_value,
           ROUND(LAST_VALUE(value)  OVER w, 6) AS last_value
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit unbounded ROWS frame — the
    session-entry/session-exit attribution shape (first touch vs last touch
    per user). The frame must be spelled out: last_value's default frame
    ends at CURRENT ROW, which silently returns the current row instead of
    the partition's last. One shuffle on user_id; DISTINCT collapses the
    per-event duplication and is fused into the same exchange set."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.round(F.first("value").over(w), 6).alias("first_value"),
            F.round(F.last("value").over(w), 6).alias("last_value"),
        )
        .distinct()
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_10m_sum
    FROM events
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user rolling 10-minute value sum —
    the time-windowed-lookback shape (fraud velocity, rate limiting). RANGE
    (unlike ROWS) includes all peers of the current timestamp, so the frame
    is deterministic even under ts ties; ordering is on INTEGER epoch
    microseconds — range frames need a numeric distance, and whole-second
    truncation (unix_timestamp / epoch()) shifts boundary membership for
    events with sub-second timestamps. One shuffle on user_id; decimal sum
    keeps the rolling total order-independent."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us("ts"))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("rolling_10m_sum"),
    )


_SESSIONIZE_ORACLE = """
WITH stamped AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_us
    FROM events
), flagged AS (
    SELECT user_id, event_id, us,
           CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 43200000000
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS session_idx
    FROM stamped
)
SELECT user_id, session_idx,
       COUNT(*)          AS n_events,
       MIN(us)           AS start_us,
       MAX(us) - MIN(us) AS duration_us
FROM flagged
GROUP BY user_id, session_idx
"""

#: Inactivity gap that closes a session: 12 hours in microseconds. The
#: testdata's inter-event gaps have p50 ≈ 7.3 h and p90 ≈ 25 h, so this
#: threshold produces real multi-event sessions rather than singletons.
_SESSION_GAP_US = 43_200_000_000


@register("sessionize_events", oracle=_SESSIONIZE_ORACLE, tags=("window",))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization: assign each event to a per-user
    session that closes after 12 h of inactivity, then roll up per session.

    The classic lag-flag-cumsum construction: LAG finds each event's gap to
    its predecessor, a gap over the threshold raises a new-session flag, and
    the running sum of flags numbers the sessions. Both window passes share
    one (user_id)-partitioned sort, so sessionization costs a single shuffle
    regardless of how many sessions a user has — the 100 TB shape, since
    sessions per user are unbounded but events-per-user partitions are not
    (skewed power users are bounded by the window sort, not a cross join).
    The per-session rollup is a second shuffle on (user_id, session_idx).
    All outputs are exact integers (epoch microseconds), so the oracle hash
    is float-free. Ties on ts break by event_id on both engines. Streaming
    equivalent: session_window_agg / stream_session_windows (F.session_window
    with a watermark); this is the batch/backfill twin of those queries.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(order).isNull()
            | (F.col("us") - F.lag("us").over(order) > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "session_idx",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


_FUNNEL_ORACLE = """
WITH ew AS (
    SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04 00:00:00'
), v AS (
    SELECT user_id, MIN(epoch_us(ts)) AS t_view
    FROM ew WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
    FROM ew e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t_view
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
    FROM ew e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t_click
    GROUP BY e.user_id
), u AS (
    SELECT DISTINCT user_id FROM ew
)
SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage,
       COUNT(*) AS n_users
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
GROUP BY funnel_stage
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("window",))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: how many users progressed view → click →
    purchase, where each step must occur AT OR AFTER the previous step's
    first occurrence (a purchase before any click doesn't count). The
    funnel is scoped to an analysis window (first 3 days of the event
    history — chosen so the testdata populates all four stages; full-
    history funnels saturate at stage 3 for every user).

    Each stage is one filtered min-aggregate over the event stream joined
    to the previous stage's firsts — three map-side-combined aggregates
    and three joins on user_id, all shuffling only (user, timestamp)
    pairs. The stage frames shrink monotonically (stage N ⊆ stage N-1),
    so at 100 TB the expensive scans are the first stage; later joins are
    against ever-smaller key sets (broadcastable once selective). Epoch-
    microsecond comparisons keep step ordering exact."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-04 00:00:00").cast("timestamp"))
        .select("user_id", "event_type", epoch_us("ts").alias("us"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.join(v, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("us") >= F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase") & (F.col("us") >= F.col("t_click"))
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    u = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy(stage.alias("funnel_stage"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


#: Per-step funnel timeout (12 h in µs) — the windowFunnel-style bound.
FUNNEL_STEP_GAP_US = 43_200_000_000

_FUNNEL_GAP_ORACLE = f"""
WITH v AS (
    SELECT user_id, MIN(epoch_us(ts)) AS t_view
    FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
    FROM events e JOIN v ON e.user_id = v.user_id
    WHERE e.event_type = 'click'
      AND epoch_us(e.ts) >= v.t_view
      AND epoch_us(e.ts) <= v.t_view + {FUNNEL_STEP_GAP_US}
    GROUP BY e.user_id
), p AS (
    SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase'
      AND epoch_us(e.ts) >= c.t_click
      AND epoch_us(e.ts) <= c.t_click + {FUNNEL_STEP_GAP_US}
    GROUP BY e.user_id
), u AS (
    SELECT DISTINCT user_id FROM events
)
SELECT CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            WHEN v.user_id IS NOT NULL THEN 1
            ELSE 0 END AS funnel_stage,
       COUNT(*) AS n_users
FROM u
LEFT JOIN v ON u.user_id = v.user_id
LEFT JOIN c ON u.user_id = c.user_id
LEFT JOIN p ON u.user_id = p.user_id
GROUP BY funnel_stage
"""


@register("funnel_window_gap", oracle=_FUNNEL_GAP_ORACLE, tags=("window",))
def funnel_window_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded conversion funnel (the windowFunnel/Amplitude
    "within X of the previous step" variant of funnel_conversion): each
    next stage must occur within FUNNEL_STEP_GAP_US of the previous
    stage's matched event, so a purchase three weeks after the click no
    longer converts. Matching is GREEDY-EARLIEST per step (the first
    view anchors the chain; the first in-window click anchors stage 3)
    — the documented semantics of per-step-timeout funnels, chosen over
    ClickHouse's any-anchor maximization because it stays join-free:
    three filtered min-aggregates and three user_id joins, no
    view×click pair expansion per user, so per-user cost is O(events),
    not O(events²), at any skew. Stage frames shrink monotonically, so
    at 100 TB the later joins run against ever-smaller (broadcastable)
    key sets — the same shape funnel_conversion prices."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t_view"))
    )
    c = (
        ev.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("us") >= F.col("t_view"))
            & (F.col("us") <= F.col("t_view") + FUNNEL_STEP_GAP_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_click"))
    )
    p = (
        ev.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("us") >= F.col("t_click"))
            & (F.col("us") <= F.col("t_click") + FUNNEL_STEP_GAP_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("t_purchase"))
    )
    u = ev.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        u.join(v, "user_id", "left")
        .join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .groupBy(stage.alias("funnel_stage"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_COHORT_ORACLE = """
WITH firsts AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), activity AS (
    SELECT DISTINCT e.user_id, CAST(e.ts AS DATE) AS day FROM events e
)
SELECT strftime(f.first_day, '%Y-%m-%d') AS cohort_day,
       datediff('day', f.first_day, a.day) AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM activity a JOIN firsts f ON a.user_id = f.user_id
GROUP BY f.first_day, day_offset
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("window",))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each later active day as an offset from their cohort start — the
    growth-analytics staple. One min-aggregate for cohort assignment, one
    distinct-projection of (user, day) activity, a broadcastable join
    (firsts is one row per user, same key as the activity shuffle), and
    the final (cohort, offset) rollup. All outputs exact (dates and
    counts), so the retention matrix is hash-stable."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    activity = ev.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("day", "first_day").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


_RFM_ORACLE = """
WITH rfm AS (
    SELECT o_custkey,
           MAX(CAST(o_orderdate AS DATE)) AS last_order,
           COUNT(*) AS frequency,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
    FROM orders GROUP BY o_custkey
), scored AS (
    SELECT o_custkey,
           NTILE(4) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
           NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)  AS f_score,
           NTILE(4) OVER (ORDER BY monetary DESC, o_custkey)   AS m_score
    FROM rfm
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers
FROM scored
GROUP BY r_score, f_score, m_score
"""


@register("rfm_segmentation", oracle=_RFM_ORACLE, tags=("window",))
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for recency, frequency,
    and monetary value (ntile over each metric, custkey tiebreak for
    cross-engine determinism), rolled up to segment-cell counts.

    Scale shape (r13: the last data-sized global window in the engine):
    each NTILE(4) runs through ranges.ntile_distributed — the two-phase
    distributed rank (range partition, per-slice window, O(n_parts)
    offsets), hash-identical to F.ntile on the same tie-broken order
    (property-tested) — so the customer grain never funnels through one
    task. Dates/numerics are pre-negated for the descending orders (the
    kernel's ascending-unique contract); the per-order data is reduced
    map-side in the first aggregate as before."""
    from recommendation_system_big_data_spark.operators.ranges import (
        ntile_distributed,
    )

    rfm = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
        .select(
            "o_custkey",
            (-F.datediff(
                F.col("last_order"), F.lit("1970-01-01").cast("date")
            )).alias("_nr"),
            (-F.col("frequency")).alias("_nf"),
            (-F.col("monetary")).alias("_nm"),
        )
    )
    t = ntile_distributed(rfm, ["_nr", "o_custkey"], 4, "r_score")
    t = ntile_distributed(t, ["_nf", "o_custkey"], 4, "f_score")
    t = ntile_distributed(t, ["_nm", "o_custkey"], 4, "m_score")
    return t.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_ROLLUP_INCR_ORACLE = """
SELECT CAST(floor(epoch(time_bucket(INTERVAL 15 MINUTES, ts))) AS BIGINT)
           AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY time_bucket(INTERVAL 15 MINUTES, ts), event_type
"""


@register("rollup_incremental_agg", oracle=_ROLLUP_INCR_ORACLE, tags=("window",))
def rollup_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate maintenance: the 15-minute
    rollup is computed FROM the 1-minute rollup, never from raw events —
    count and decimal-sum are algebraic aggregates, so re-aggregating
    partials is exact. The oracle aggregates raw events directly, proving
    the two-level path bit-identical.

    This is the scale pattern for dashboard hierarchies (1m → 15m → 1h →
    1d): each level reads the level below (~1/15th the rows), raw data is
    scanned exactly once ever, and a late-arriving partition re-rolls only
    its own buckets. Both aggregates shuffle on aligned keys (the 15-min
    key is a pure function of the 1-min key), so AQE coalesces the second
    exchange to near-zero."""
    ev = load(spark, sf_dir, "events")
    m1 = ev.groupBy(
        F.window("ts", "1 minute").alias("w1"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
    )
    return (
        m1.groupBy(F.window(F.col("w1.start"), "15 minutes").alias("w"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").cast("double").alias("sum_value"),
        )
        .select(
            epoch_s(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


_EWMA_ORACLE = """
WITH r AS (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events
)
SELECT t1.event_id,
       ROUND(SUM(t2.value * pow(0.8, t1.rn - t2.rn))
             / SUM(pow(0.8, t1.rn - t2.rn)), 6) AS ewma
FROM r t1 JOIN r t2
  ON t1.user_id = t2.user_id AND t2.rn BETWEEN t1.rn - 9 AND t1.rn
GROUP BY t1.event_id
"""


@register("window_ewma", oracle=_EWMA_ORACLE, tags=("window",))
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.8, last 10 observations,
    pandas adjust=True normalization) per user over event time — the
    trailing smoother behind every monitoring/anomaly baseline.

    Spark spelling: collect the 10-row trailing frame into an array via a
    single window pass, then weight and fold entirely in JVM higher-order
    functions (zip_with + aggregate) — no self-join, no UDF. The oracle
    spells the same math as a relational band self-join on row index; the
    engine's window form shuffles once on user_id where the self-join
    shuffles twice and multiplies rows ×10. Weight products are identical
    IEEE expressions; only summation order differs (fold vs hash-agg),
    drift ~1e-15 against the ROUND(6) boundary."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-9, 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.expr(
        """
        aggregate(
            zip_with(vals, sequence(size(vals) - 1, 0, -1),
                     (v, j) -> v * pow(0.8, j)),
            0D, (acc, x) -> acc + x)
        / aggregate(transform(sequence(size(vals) - 1, 0, -1),
                              j -> pow(0.8, j)),
                    0D, (acc, x) -> acc + x)
        """
    )
    return (
        ev.select("event_id", vals.alias("vals"))
        .select("event_id", F.round(ewma, 6).alias("ewma"))
    )


_SEQ_PATTERN_ORACLE = """
WITH seqs AS (
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
    FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN seq LIKE '%view%click%purchase%' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched
FROM seqs
"""


@register("sequence_pattern_match", oracle=_SEQ_PATTERN_ORACLE, tags=("window",))
def sequence_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event-sequence pattern detection (SQL MATCH_RECOGNIZE's
    simplest shape, which Spark lacks): how many users' event streams
    contain view → … → click → … → purchase in that order.

    Per-user sequences build as sort_array(collect_list(struct(ts-key,
    type))) — one shuffle on user_id, the sort is per-group and
    partition-local — then the pattern is a single LIKE over the
    comma-joined type string (valid because no event type is a substring
    of another). Everything stays in codegen; contrast with
    funnel_conversion/attribution (windows.py, streaming/jobs.py), which
    answer the same family via min-timestamp joins — that is the shape
    for UNBOUNDED per-user histories, while this one trades a bounded
    collect_list for arbitrary regex-class patterns."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", epoch_us("ts").alias("us"), "event_id", "event_type"
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("us", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("seq")
    )
    return seqs.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            F.when(F.col("seq").like("%view%click%purchase%"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
    )


#: Dynamic session gaps: purchases keep a session alive 24 h, everything
#: else 12 h (in microseconds / seconds).
_GAP_LONG_US = 86_400_000_000
_GAP_SHORT_US = 43_200_000_000

_DYN_SESSION_ORACLE = f"""
WITH stamped AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CASE WHEN event_type = 'purchase'
                THEN {_GAP_LONG_US} ELSE {_GAP_SHORT_US} END AS gap_us
    FROM events
), flagged AS (
    SELECT user_id, event_id, us,
           CASE WHEN MAX(us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) IS NULL
                OR us >= MAX(us + gap_us) OVER (
                    PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                )
           THEN 1 ELSE 0 END AS brk
    FROM stamped
), numbered AS (
    SELECT user_id, us,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM flagged
)
SELECT user_id, MIN(us) AS session_start_us, COUNT(*) AS n_events
FROM numbered GROUP BY user_id, sid
"""


@register("sessionize_dynamic_gap", oracle=_DYN_SESSION_ORACLE, tags=("window",))
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-EVENT inactivity gap — purchases hold the
    session open 24 h, other events 12 h (the checkout-grace-period
    shape). Spark's session_window accepts a gap EXPRESSION, evaluated per
    event; each event opens [ts, ts+gap) and overlapping windows merge.

    The oracle derives identical semantics relationally: an event starts a
    new session iff it is at-or-after the running MAX of every previous
    event's (ts + its own gap) — the running-max formulation of interval
    merging (half-open, so touching boundaries split). Same single
    (user_id)-shuffle cost as fixed-gap sessionize_events; the dynamic gap
    is a map-side CASE, free at any scale."""
    # the gap expression must resolve to CalendarIntervalType — string
    # branches coerce there; DayTimeIntervalType (INTERVAL literals) is
    # rejected by the session_window analyzer
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("24 hours")
    ).otherwise(F.lit("12 hours"))
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_us(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


_ROLLING_ZSCORE_ORACLE = """
WITH framed AS (
    SELECT event_id, user_id, value,
           AVG(value) OVER w AS mu,
           STDDEV_SAMP(value) OVER w AS sd,
           COUNT(*) OVER w AS n_obs
    FROM events
    WINDOW w AS (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
    )
)
SELECT event_id, user_id,
       ROUND((value - mu) / sd, 4) AS zscore,
       CAST(ABS((value - mu) / sd) > 3.0 AS BIGINT) AS is_anomaly
FROM framed
WHERE n_obs >= 5 AND sd > 0
"""


@register("window_rolling_zscore", oracle=_ROLLING_ZSCORE_ORACLE, tags=("window",))
def window_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each event scored against the mean and
    sample stddev of its user's PRECEDING 20 observations (frame excludes the
    current row — scoring a point against a baseline that contains it dilutes
    exactly the spikes being hunted). Events with fewer than 5 prior
    observations or a degenerate (zero-variance) baseline are withheld rather
    than scored against noise.

    One shuffle on user_id serves all three frame aggregates (single WINDOW
    spec both engines). At 100 TB this is the streaming-adjacent anomaly
    baseline: the same frame math ports to a stateful streaming op with a
    20-row ring buffer per key; batch form costs one exchange + sort within
    partitions. STDDEV_SAMP over an explicit frame is sequentially
    accumulated in both engines; ROUND(4) absorbs the accumulation-order
    drift (same precision budget as fn_pandas_udaf_grouped).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-20, -1)
    )
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_obs"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.filter((F.col("n_obs") >= 5) & (F.col("sd") > 0))
        .select(
            "event_id",
            "user_id",
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 3.0).cast("long").alias("is_anomaly"),
        )
    )


_LAG_FEATURES_ORACLE = """
SELECT event_id, user_id,
       ROUND(value, 6) AS val,
       ROUND(LAG(value, 1) OVER w, 6) AS lag_1,
       ROUND(LAG(value, 7) OVER w, 6) AS lag_7,
       ROUND(AVG(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 4) AS roll_mean_7,
       ROUND((value - LAG(value, 1) OVER w)
             / NULLIF(LAG(value, 1) OVER w, 0), 4) AS pct_change
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("ts_lag_features", oracle=_LAG_FEATURES_ORACLE, tags=("window", "ml"))
def ts_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-feature matrix — the forecasting/feature-store shape: previous
    value, 7-back value, trailing 7-row mean, and period-over-period change
    per user series. This is the feature-engineering mirror of
    window_rolling_zscore (same frame machinery, pointed at model inputs
    instead of anomaly flags); at 100 TB it is THE bulk op of a feature
    store backfill.

    All four features share one user_id shuffle + one within-partition
    sort — Spark computes every window expression over the same
    WindowSpec in a single Window physical operator (the oracle spells it
    as one named WINDOW for the same reason). Leading rows with no lag
    are NULL (not dropped): a feature matrix must stay row-aligned with
    its source. pct_change NULLIFs a zero denominator rather than
    emitting ±Inf — NULL features are imputable, infinities poison
    downstream normalization."""
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    w7 = w.rowsBetween(-6, 0)
    lag1 = F.lag("value", 1).over(w)
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("val"),
        F.round(lag1, 6).alias("lag_1"),
        F.round(F.lag("value", 7).over(w), 6).alias("lag_7"),
        F.round(F.avg("value").over(w7), 4).alias("roll_mean_7"),
        F.round(
            (F.col("value") - lag1) / F.nullif(lag1, F.lit(0)), 4
        ).alias("pct_change"),
    )


_ROLLING_MEDIAN_ORACLE = """
WITH framed AS (
    SELECT event_id, user_id,
           MEDIAN(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
           ) AS med,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
           ) AS n_obs
    FROM events
)
SELECT event_id, user_id, ROUND(med, 6) AS rolling_median
FROM framed WHERE n_obs >= 5
"""


@register("window_rolling_median", oracle=_ROLLING_MEDIAN_ORACLE, tags=("window",))
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over the preceding-20 frame — the robust companion of
    window_rolling_zscore's mean baseline (a single spike drags a rolling
    mean for 20 rows; the rolling median shrugs it off).

    Spark refuses aggregate-percentiles over framed windows
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so this demonstrates the
    frame-array technique for ARBITRARY order statistics: collect_list
    over the frame (one window pass), then array_sort + middle element(s)
    entirely in JVM higher-order expressions — the same pattern
    window_ewma uses for weighted folds. Interpolated even-count median
    (mean of the two middle elements) matches DuckDB's MEDIAN exactly.
    Cost: the frame array is bounded at 20 elements per row by
    construction, so state is O(frame), not O(partition)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-20, -1)
    )
    vals = F.array_sort(F.collect_list("value").over(w))
    return (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            vals.alias("vals"),
        )
        .filter(F.size("vals") >= 5)
        .select(
            "event_id",
            "user_id",
            F.round(
                F.when(
                    F.size("vals") % 2 == 1,
                    F.element_at("vals", ((F.size("vals") + 1) / 2).cast("int")),
                ).otherwise(
                    (
                        F.element_at("vals", (F.size("vals") / 2).cast("int"))
                        + F.element_at("vals", (F.size("vals") / 2).cast("int") + 1)
                    )
                    / 2.0
                ),
                6,
            ).alias("rolling_median"),
        )
    )


_STREAKS_ORACLE = """
WITH days AS (
    SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
    FROM orders
), grouped AS (
    SELECT o_custkey, d,
           d - CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY d
           ) AS INTEGER) AS island
    FROM days
), islands AS (
    SELECT o_custkey, island,
           CAST(COUNT(*) AS BIGINT) AS streak_days,
           MIN(d) AS streak_start
    FROM grouped GROUP BY o_custkey, island
)
SELECT o_custkey,
       CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       strftime(MIN(streak_start), '%Y-%m-%d') AS first_streak_start
FROM islands
GROUP BY o_custkey
HAVING MAX(streak_days) >= 2
"""


@register("window_gaps_islands", oracle=_STREAKS_ORACLE, tags=("window",))
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-order-day streaks per customer — the
    activity-streak / continuous-coverage primitive (login streaks, sensor
    uptime segments, contiguous inventory runs). The classic O(n) trick:
    date minus its per-customer row_number is CONSTANT within a run of
    consecutive days, so one window + two aggregations find every island —
    no self-join, no recursion, no per-row loop.

    All three steps share the o_custkey partitioning: distinct days, the
    row_number window, and both island rollups — one shuffle does the
    work (AQE reuses the exchange). Dates subtract as integer day counts
    in both engines; the HAVING keeps only customers with a real (≥2-day)
    streak so the result is meaningful at every SF."""
    days = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    grouped = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = grouped.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("d").alias("streak_start"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.max("streak_days").cast("long").alias("longest_streak"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.date_format(F.min("streak_start"), "yyyy-MM-dd").alias(
                "first_streak_start"
            ),
        )
        .filter(F.col("longest_streak") >= 2)
    )


_TRANSITION_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
), pairs AS (
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, next_type, n,
       ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type), 6)
           AS transition_prob
FROM pairs
"""


@register(
    "sequence_transition_matrix", oracle=_TRANSITION_ORACLE, tags=("window", "ml")
)
def sequence_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next_type | prev_type), the behavioral fingerprint behind next-action
    prediction, funnel-leak diagnosis, and bot detection (bots have
    near-degenerate rows; humans don't). Companion to
    sequence_pattern_match, which looks for ONE fixed pattern — this
    summarizes ALL observed 2-grams.

    One lag window per user (shuffle on user_id), then a 25-cell aggregate:
    the output is |event_types|² regardless of input size, so the second
    shuffle is constant-sized and the row-normalizing window runs on that
    constant table. At 100 TB the lag window is the only real cost and it
    partitions by user — no global ordering anywhere."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
        ).alias("prev_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("prev_type")),
            6,
        ).alias("transition_prob"),
    )


_RUNNING_DISTINCT_ORACLE = """
WITH flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) = 1 THEN 1 ELSE 0 END AS is_first
    FROM events
)
SELECT event_id, user_id,
       CAST(SUM(is_first) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS distinct_types_so_far
FROM flagged
"""


@register("window_running_distinct", oracle=_RUNNING_DISTINCT_ORACLE, tags=("window",))
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered stream — SQL window frames
    forbid DISTINCT aggregates, so the standard rewrite is first-occurrence
    flagging: a row is +1 iff it is the first time its (user, type) pair
    appears (one row_number window), then a plain running SUM of the flag
    (second window). Feature engineering's "breadth of behavior so far"
    signal (how many distinct actions preceded this purchase?).

    Both windows partition by user_id — the second reuses the first's
    shuffle (the (user,type) window hash-partitions on user_id too, since
    partitionBy prefixes match), so the plan carries ONE exchange. State is
    O(1) per row either way; nothing accumulates a set."""
    flagged = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.row_number().over(
                Window.partitionBy("user_id", "event_type").orderBy(
                    F.asc("ts"), F.asc("event_id")
                )
            )
            == 1,
            1,
        )
        .otherwise(0)
        .alias("is_first"),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_first")
        .over(
            Window.partitionBy("user_id")
            .orderBy(F.asc("ts"), F.asc("event_id"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("distinct_types_so_far"),
    )


def _acf_corr(k: int) -> str:
    """Guarded aligned-pairs Pearson for lag k — rev/l{k} are exact 2-dp
    daily decimal sums, re-cast to DECIMAL(19,2) inside the fragment
    (DuckDB's SUM(DECIMAL) widens to width 38, whose square would exceed
    its 38-width multiply bind limit; the cast is value-exact). The
    FILTER keeps only complete pairs (CORR's null semantics)."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        guarded_pearson_sql,
    )

    return guarded_pearson_sql(
        "rev", f"l{k}", where=f"l{k} IS NOT NULL", digits=4
    )


_ACF_ORACLE = """
WITH daily AS (
    SELECT o_orderdate AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY o_orderdate
), lagged AS (
    SELECT rev,
           LAG(rev, 1) OVER (ORDER BY d) AS l1,
           LAG(rev, 2) OVER (ORDER BY d) AS l2,
           LAG(rev, 3) OVER (ORDER BY d) AS l3,
           LAG(rev, 7) OVER (ORDER BY d) AS l7
    FROM daily
)
SELECT 1 AS lag_days, {c1} AS acf FROM lagged
UNION ALL SELECT 2, {c2} FROM lagged
UNION ALL SELECT 3, {c3} FROM lagged
UNION ALL SELECT 7, {c7} FROM lagged
ORDER BY lag_days
""".format(c1=_acf_corr(1), c2=_acf_corr(2), c3=_acf_corr(3), c7=_acf_corr(7))


@register("ts_autocorrelation", oracle=_ACF_ORACLE, tags=("window", "ml"))
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily-revenue series at lags 1/2/3/7 — the
    seasonality probe run before choosing forecast features (a spike at
    lag 7 means weekly cycle; slow decay means trend — difference first).
    Definition pinned to CORR(x_t, x_{t-k}) over the aligned pairs (the
    "sample ACF with per-lag re-centering"), identical in both engines.

    The unpartitioned LAG window is safe HERE and only here: the series is
    one row per calendar day (bounded by the date span, ~2.4k rows over the
    TPC-H range, independent of fact-table size), produced by a properly
    distributed pre-aggregation. The pattern to copy is agg-then-window,
    never window-then-agg. All four lags ride ONE window sort; the four
    guarded correlations fold into ONE global aggregate; stack() reshapes
    4 columns to long form without touching the fact table again.

    r13 degenerate hardening: daily revenue folds in DECIMAL(18,2)
    (exact, order-independent), each lag's correlation is the guarded
    sums-based fragment over FILTERed complete pairs — builtin CORR
    raises under ANSI Spark on a flat series, and DuckDB's UNPIVOT
    silently DROPPED NULL acf rows where Spark's stack kept them (the
    oneday-probe 4/0 row mismatch); the UNION ALL oracle keeps them."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.orderBy(F.asc("d"))
    lagged = daily.select(
        "rev",
        F.lag("rev", 1).over(w).alias("l1"),
        F.lag("rev", 2).over(w).alias("l2"),
        F.lag("rev", 3).over(w).alias("l3"),
        F.lag("rev", 7).over(w).alias("l7"),
    )
    wide = lagged.agg(
        F.expr(_acf_corr(1)).alias("a1"),
        F.expr(_acf_corr(2)).alias("a2"),
        F.expr(_acf_corr(3)).alias("a3"),
        F.expr(_acf_corr(7)).alias("a7"),
    )
    return (
        wide.select(
            F.expr(
                "stack(4, 1, a1, 2, a2, 3, a3, 7, a7) AS (lag_days, acf)"
            )
        )
        .select(
            F.col("lag_days").cast("int").alias("lag_days"),
            F.col("acf").alias("acf"),
        )
        .orderBy("lag_days")
    )


_PARETO_ORACLE = """
WITH rev AS (
    SELECT l_partkey, SUM(l_extendedprice) AS part_rev
    FROM lineitem GROUP BY l_partkey
), tiled AS (
    SELECT part_rev,
           NTILE(10) OVER (ORDER BY part_rev DESC, l_partkey ASC) AS decile
    FROM rev
), by_decile AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_parts,
           SUM(part_rev) AS decile_rev
    FROM tiled GROUP BY decile
)
SELECT decile, n_parts,
       ROUND(decile_rev / SUM(decile_rev) OVER (), 6) AS rev_share,
       ROUND(SUM(decile_rev) OVER (ORDER BY decile)
             / SUM(decile_rev) OVER (), 6) AS cum_rev_share
FROM by_decile
"""


@register("window_cumulative_share", oracle=_PARETO_ORACLE, tags=("window",))
def window_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC concentration curve: parts ranked by revenue, split
    into deciles, each decile's share and cumulative share of total
    revenue — the "do 20% of SKUs carry 80% of revenue?" table that drives
    assortment pruning and cache-tier sizing (its skew twin is
    skew_key_report, which measures the same concentration on join keys).

    The fact table reduces via one map-side-combined groupBy before
    anything global happens; the decile cut runs through
    ranges.ntile_distributed — the PART dimension scales with the
    catalog, so the global rank is range-partitioned (exclusive running
    count + SQL NTILE's remainder split, hash-identical to F.ntile) —
    and the share windows run on exactly 10 rows."""
    from recommendation_system_big_data_spark.operators.ranges import (
        ntile_distributed,
    )

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_rev"))
    )
    tiled = ntile_distributed(
        rev.withColumn("_negrev", -F.col("part_rev")),
        ["_negrev", "l_partkey"],
        10,
        "decile",
    ).select("part_rev", "decile")
    by_decile = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_parts"), F.sum("part_rev").alias("decile_rev")
    )
    tot = Window.partitionBy()
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return by_decile.select(
        "decile",
        "n_parts",
        F.round(F.col("decile_rev") / F.sum("decile_rev").over(tot), 6).alias(
            "rev_share"
        ),
        F.round(
            F.sum("decile_rev").over(cum) / F.sum("decile_rev").over(tot), 6
        ).alias("cum_rev_share"),
    )


_TIME_RANGE_FRAME_ORACLE = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS events_last_hour,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS DOUBLE), 2) AS value_last_hour
FROM events
"""


@register(
    "window_time_range_frame", oracle=_TIME_RANGE_FRAME_ORACLE, tags=("window",)
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frames: per event, the count and value-sum of
    that user's events in the TRAILING HOUR — frames bounded by event
    TIME, not row position, which is the semantics rate-limiters,
    velocity features, and fraud scores actually need (a ROWS 20
    PRECEDING frame spans wildly different durations per user;
    `window_rolling_zscore` is that row-counted cousin).

    One (user) shuffle + one sort serves both interval aggregates; the
    frame scan is incremental within the partition (each row extends the
    previous frame's bounds — O(n) per partition, not O(n·frame)).
    DECIMAL value sums keep identical frame contents summing to
    identical results on both engines. RANGE requires a single ORDER BY
    key; ties (same user, same microsecond) share a frame by definition,
    which is exactly the time semantics — no tiebreaker wanted."""
    # INTERVAL frame bounds have no DataFrame-API spelling
    # (rangeBetween takes longs) — SQL is the canonical form.
    load(spark, sf_dir, "events").createOrReplaceTempView("events_trf")
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS events_last_hour,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS DOUBLE), 2) AS value_last_hour
        FROM events_trf
        """
    )


_CONVERSION_LAG_ORACLE = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
           MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS t_buy
    FROM events GROUP BY user_id
), lags AS (
    SELECT (t_buy - t_view) // 1000000 AS lag_s
    FROM firsts
    WHERE t_view IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_view
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_converters,
    ROUND(AVG(CASE WHEN lag_s <= 3600 THEN 1.0 ELSE 0.0 END), 6)
        AS within_1h,
    ROUND(AVG(CASE WHEN lag_s <= 21600 THEN 1.0 ELSE 0.0 END), 6)
        AS within_6h,
    ROUND(AVG(CASE WHEN lag_s <= 86400 THEN 1.0 ELSE 0.0 END), 6)
        AS within_24h,
    ROUND(AVG(CASE WHEN lag_s <= 604800 THEN 1.0 ELSE 0.0 END), 6)
        AS within_7d,
    CAST(CAST(quantile_disc(lag_s, 0.5) AS BIGINT) AS BIGINT) AS median_lag_s
FROM lags
"""


@register("funnel_conversion_lag_curve", oracle=_CONVERSION_LAG_ORACLE, tags=("window",))
def funnel_conversion_lag_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-lag curve: of users whose first purchase follows their
    first view, what share converts within 1h / 6h / 24h / 7d, plus the
    median lag — the latency distribution behind attribution-window
    choices (the 12 h window `attribution_click_purchase` hardcodes
    should come FROM this curve) and remarketing timing.

    One conditional-min fold per user (both firsts in a single groupBy),
    a lag projection in exact integer seconds, and one keyless reduce
    for every curve point — adding thresholds adds expressions, not
    passes. Median uses the DISC convention on integer lags."""
    firsts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", epoch_us("ts"))
            ).alias("t_view"),
            F.min(
                F.when(F.col("event_type") == "purchase", epoch_us("ts"))
            ).alias("t_buy"),
        )
    )
    lags = firsts.where(
        F.col("t_view").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_view"))
    ).select(F.expr("(t_buy - t_view) div 1000000").alias("lag_s"))

    def within(sec: int):
        return F.round(
            F.avg(F.when(F.col("lag_s") <= sec, 1.0).otherwise(0.0)), 6
        )

    return lags.agg(
        F.count(F.lit(1)).cast("long").alias("n_converters"),
        within(3600).alias("within_1h"),
        within(21600).alias("within_6h"),
        within(86400).alias("within_24h"),
        within(604800).alias("within_7d"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_s)")
        .cast("long")
        .alias("median_lag_s"),
    )


_PCTRANK_ORACLE = """
SELECT event_id,
       event_type,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
"""


@register("window_percent_rank_cume", oracle=_PCTRANK_ORACLE, tags=("window",))
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST per event-type partition — the two
    normalized rank functions (completing the rank family next to
    rank/dense_rank/ntile): where does each event's value sit within its
    type, as a [0,1] position. Ordering carries the event_id tiebreak so
    the ranks are a total order.

    Float-exit note (COVERAGE.md r10): the outputs are emitted RAW, not
    ROUND()ed — percent_rank is (rank−1)/(n−1) and cume_dist is
    peer_count/n, single IEEE divisions of identical integers on both
    engines, so the doubles are bit-identical by construction; it is
    ROUNDING a double that knife-edges, never computing one. Verified by
    the repr-exact cross-engine sweep gate.

    Scale: one shuffle on the partition key; ranks are streaming within
    each sorted partition."""
    w = Window.partitionBy("event_type").orderBy(
        F.asc("value"), F.asc("event_id")
    )
    return load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
    )


_HAMPEL_ORACLE = """
WITH framed AS (
    SELECT event_id, user_id, value,
           list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING
           ) AS vals
    FROM events
), sized AS (
    SELECT event_id, user_id, value, vals,
           list_aggregate(vals, 'median') AS med
    FROM framed WHERE len(vals) >= 5
), devs AS (
    SELECT event_id, user_id, value, med,
           list_aggregate(list_transform(vals, v -> abs(v - med)),
                          'median') AS mad
    FROM sized
)
SELECT event_id, user_id,
       ROUND(med, 6) AS frame_median,
       ROUND(mad, 6) AS frame_mad,
       CAST(ABS(value - med) > 3.0 * 1.4826 * mad AS BIGINT) AS is_outlier
FROM devs
"""


@register("window_hampel_filter", oracle=_HAMPEL_ORACLE, tags=("window",))
def window_hampel_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel outlier filter per user stream: flag a value when it sits
    more than 3 scaled-MADs from the trailing median (MAD·1.4826 ≈ σ
    under normality) — the production anomaly detector that
    `window_rolling_zscore` approximates badly on dirty data, because
    the z-score's OWN mean and stddev are dragged by the outliers it is
    supposed to find; median/MAD have a 50% breakdown point (Hampel
    1974; Pearson 2002 process-data survey).

    Built on the frame-array technique of `window_rolling_median` (Spark
    refuses aggregate-percentiles over framed windows): ONE window pass
    collects the bounded 20-element trailing frame, then the median AND
    the MAD — a median of |v − med| over the same frame — are pure JVM
    higher-order expressions (array_sort / transform / element_at), no
    second window, no Python. Even-count medians interpolate (a+b)/2
    identically in both engines, and the flag compares identically-
    derived doubles, so the boolean cannot knife-edge. State is O(frame)
    per row by construction; the only shuffle is the user_id window
    partitioning, the same one every per-user feature shares.

    Known degeneracy (inherent to Hampel, kept deliberately): a frame
    where >50% of values are identical has MAD = 0 and flags ANY
    deviation — on near-constant streams pair this with an absolute
    floor, or it reports every tick of a mostly-flat sensor (the
    planted test pins both regimes)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(-20, -1)
    )

    def arr_median(arr):
        n = F.size(arr)
        return F.when(
            n % 2 == 1,
            F.element_at(arr, ((n + 1) / 2).cast("int")),
        ).otherwise(
            (
                F.element_at(arr, (n / 2).cast("int"))
                + F.element_at(arr, (n / 2).cast("int") + 1)
            )
            / 2.0
        )

    framed = (
        load(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "value",
            F.array_sort(F.collect_list("value").over(w)).alias("vals"),
        )
        .filter(F.size("vals") >= 5)
        .withColumn("med", arr_median(F.col("vals")))
        .withColumn(
            "mad",
            arr_median(
                F.array_sort(
                    F.transform(
                        F.col("vals"),
                        lambda v: F.abs(v - F.col("med")),
                    )
                )
            ),
        )
    )
    return framed.select(
        "event_id",
        "user_id",
        F.round("med", 6).alias("frame_median"),
        F.round("mad", 6).alias("frame_mad"),
        (
            F.abs(F.col("value") - F.col("med"))
            > F.lit(3.0) * F.lit(1.4826) * F.col("mad")
        )
        .cast("long")
        .alias("is_outlier"),
    )
