"""Temporal join operators Spark has no native word for — expressed as
compositions of existing DataFrame ops (the SURVEY.md §2.11 custom-operator rule:
composition first, Pandas UDF only if semantics demand it).

As-of join: attach to each left event the most recent right event at or
before it (per key). The scalable form is NOT a per-key loop or a
range-predicate join (quadratic within key) but union + last(ignorenulls)
over an ordered window: one shuffle on (user), linear scan per partition.
DuckDB spells the same thing ASOF JOIN; the oracle uses the window
formulation so tie-breaking is bit-identical.

Range join: band predicate against a small bucket dimension — broadcast +
non-equi condition, the idiomatic Spark shape when one side is tiny."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import epoch_s, epoch_us, load
from recommendation_system_big_data_spark.registry import register

_ASOF_ORACLE = """
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'view' THEN value END AS view_value,
           CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
           value
    FROM events WHERE event_type IN ('view', 'purchase')
), filled AS (
    SELECT user_id, ts, event_id, purchase_id, value,
           LAST_VALUE(view_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_view_value
    FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
       value AS purchase_value,
       last_view_value
FROM filled WHERE purchase_id IS NOT NULL
"""


@register("join_asof", oracle=_ASOF_ORACLE, tags=("join", "temporal"))
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the most recent prior (or same-instant
    earlier-id) view's value for that user. Composition: tag → union is
    implicit (one scan, two CASE columns) → last(ignorenulls) over the
    event-time window → filter to the left stream. One shuffle on user_id,
    no range predicate, no skew beyond the key distribution — this is the
    100 TB as-of shape."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", F.col("value")).alias("view_value"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "last_view_value", F.last("view_value", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("purchase_id").isNotNull()).select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        epoch_s("ts").alias("unix_ts"),
        F.col("value").alias("purchase_value"),
        "last_view_value",
    )


_RANGE_ORACLE = """
WITH bands AS (
    SELECT * FROM (VALUES
        ('tiny', 0.0, 50.0), ('small', 50.0, 100.0),
        ('medium', 100.0, 150.0), ('large', 150.0, 1e9)
    ) AS t(band, lo, hi)
)
SELECT band, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


@register("join_range_band", oracle=_RANGE_ORACLE, tags=("join", "temporal"))
def join_range_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: facts against a tiny interval dimension via
    broadcast nested-loop on the band predicate — at any scale the fact side
    streams once; never express this as a cross join + filter of two big
    sides."""
    bands = spark.createDataFrame(
        [
            ("tiny", 0.0, 50.0),
            ("small", 50.0, 100.0),
            ("medium", 100.0, 150.0),
            ("large", 150.0, 1e9),
        ],
        ["band", "lo", "hi"],
    )
    ev = load(spark, sf_dir, "events")
    return (
        ev.join(
            F.broadcast(bands),
            (ev["value"] >= bands["lo"]) & (ev["value"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
        )
    )


_ASOF_NEAREST_ORACLE = """
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'view' THEN value END AS view_value,
           CASE WHEN event_type = 'view' THEN epoch_us(ts) END AS view_us,
           CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
           value
    FROM events WHERE event_type IN ('view', 'purchase')
), filled AS (
    SELECT user_id, ts, event_id, purchase_id, value,
           LAST_VALUE(view_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS back_value,
           LAST_VALUE(view_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS back_us,
           FIRST_VALUE(view_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS fwd_value,
           FIRST_VALUE(view_us IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS fwd_us
    FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       value AS purchase_value,
       CASE
         WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
         WHEN fwd_us IS NULL THEN back_value
         WHEN back_us IS NULL THEN fwd_value
         WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts) THEN back_value
         ELSE fwd_value
       END AS nearest_view_value,
       CASE
         WHEN back_us IS NULL AND fwd_us IS NULL THEN 'none'
         WHEN fwd_us IS NULL THEN 'backward'
         WHEN back_us IS NULL THEN 'forward'
         WHEN epoch_us(ts) - back_us <= fwd_us - epoch_us(ts) THEN 'backward'
         ELSE 'forward'
       END AS direction
FROM filled WHERE purchase_id IS NOT NULL
"""


@register("join_asof_nearest", oracle=_ASOF_NEAREST_ORACLE, tags=("join", "temporal"))
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join: each purchase gets the view closest in
    time — before OR after (ties break backward) — the sensor-fusion /
    attribution variant that backward-only ASOF (join_asof above, and
    DuckDB's ASOF JOIN keyword) cannot express.

    Same scalable machinery as join_asof: one scan tags both streams, one
    (user_id) shuffle feeds FOUR frame windows that share a single sort —
    last(ignorenulls) over the strictly-preceding frame and
    first(ignorenulls) over the strictly-following frame, for the value
    and its epoch — then the nearest pick is a narrow CASE on the time
    gaps. Still no range predicate and no per-key quadratic work; the
    exclusive frames keep a purchase from matching itself and pin
    same-instant semantics to (ts, event_id) order on both engines."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    is_view = F.col("event_type") == "view"
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_view, F.col("value")).alias("view_value"),
        F.when(is_view, epoch_us("ts")).alias("view_us"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "purchase_id"
        ),
        "value",
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    filled = tagged.select(
        "user_id",
        "ts",
        "purchase_id",
        "value",
        F.last("view_value", ignorenulls=True).over(back).alias("back_value"),
        F.last("view_us", ignorenulls=True).over(back).alias("back_us"),
        F.first("view_value", ignorenulls=True).over(fwd).alias("fwd_value"),
        F.first("view_us", ignorenulls=True).over(fwd).alias("fwd_us"),
    )
    now = epoch_us("ts")
    back_closer = (now - F.col("back_us")) <= (F.col("fwd_us") - now)
    return filled.where(F.col("purchase_id").isNotNull()).select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        F.col("value").alias("purchase_value"),
        F.when(
            F.col("back_us").isNull() & F.col("fwd_us").isNull(), F.lit(None)
        )
        .when(F.col("fwd_us").isNull(), F.col("back_value"))
        .when(F.col("back_us").isNull(), F.col("fwd_value"))
        .when(back_closer, F.col("back_value"))
        .otherwise(F.col("fwd_value"))
        .alias("nearest_view_value"),
        F.when(
            F.col("back_us").isNull() & F.col("fwd_us").isNull(), F.lit("none")
        )
        .when(F.col("fwd_us").isNull(), F.lit("backward"))
        .when(F.col("back_us").isNull(), F.lit("forward"))
        .when(back_closer, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


#: Tolerance for the bounded as-of join — a view older than this many
#: seconds no longer "explains" the purchase (the pandas merge_asof
#: `tolerance=` semantics).
_ASOF_TOLERANCE_S = 6 * 3600

_ASOF_TOL_ORACLE = f"""
WITH tagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'view' THEN value END AS view_value,
           CASE WHEN event_type = 'view'
                THEN CAST(floor(epoch(ts)) AS BIGINT) END AS view_ts,
           CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id,
           value
    FROM events WHERE event_type IN ('view', 'purchase')
), filled AS (
    SELECT user_id, ts, event_id, purchase_id, value,
           LAST_VALUE(view_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_view_value,
           LAST_VALUE(view_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_view_ts
    FROM tagged
)
SELECT purchase_id AS event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts,
       value AS purchase_value,
       CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - last_view_ts
                 <= {_ASOF_TOLERANCE_S}
            THEN last_view_value END AS view_value_within_tol,
       CASE WHEN last_view_ts IS NULL THEN NULL
            ELSE CAST(CAST(floor(epoch(ts)) AS BIGINT) - last_view_ts
                      AS BIGINT) END AS gap_s,
       CAST(last_view_ts IS NOT NULL
            AND CAST(floor(epoch(ts)) AS BIGINT) - last_view_ts
                > {_ASOF_TOLERANCE_S} AS BIGINT) AS stale_view
FROM filled WHERE purchase_id IS NOT NULL
"""


@register(
    "join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "temporal")
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded as-of join: each purchase gets the most recent prior
    view's value ONLY if that view is within the 6-hour tolerance —
    pandas' `merge_asof(tolerance=...)` semantics, which the unbounded
    `join_asof` silently violates for attribution (a view from last
    month does not explain today's purchase). The stale_view flag and
    raw gap_s ride along so the attribution pipeline can report HOW
    much signal the tolerance drops instead of just dropping it.

    Same 100 TB shape as `join_asof` — one scan, two tag columns, one
    user-keyed window carrying (value, timestamp) through
    last(ignorenulls), the tolerance applied as a codegen'd CASE at the
    end: no second join, no range predicate, no extra shuffle. Epoch
    seconds are exact integers on both engines (catalog.epoch_s)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", F.col("value")).alias(
            "view_value"
        ),
        F.when(F.col("event_type") == "view", epoch_s("ts")).alias(
            "view_ts"
        ),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "purchase_id"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn(
        "last_view_value", F.last("view_value", ignorenulls=True).over(w)
    ).withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
    ep = epoch_s("ts")
    gap = ep - F.col("last_view_ts")
    return filled.filter(F.col("purchase_id").isNotNull()).select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        ep.alias("unix_ts"),
        F.col("value").alias("purchase_value"),
        F.when(gap <= _ASOF_TOLERANCE_S, F.col("last_view_value")).alias(
            "view_value_within_tol"
        ),
        F.when(
            F.col("last_view_ts").isNotNull(), gap.cast("long")
        ).alias("gap_s"),
        (
            F.col("last_view_ts").isNotNull()
            & (gap > _ASOF_TOLERANCE_S)
        ).cast("long").alias("stale_view"),
    )
