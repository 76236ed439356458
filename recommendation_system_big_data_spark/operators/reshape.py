"""Reshaping operators — pivot (long→wide), unpivot (wide→long), and the
SQL set operations (INTERSECT / EXCEPT).

The reference's EDA script reshapes in pandas after collect
(exploratory-data-analysis.py:92-103 partitions columns and pivots
driver-side); here the same shapes stay distributed: `groupBy().pivot()`
with an EXPLICIT value list (never the two-job value-discovery scan) and
the native `DataFrame.unpivot`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register

#: Fixed pivot domain — declaring it is both a determinism contract (column
#: order) and a performance one: without it Spark runs an extra distinct
#: job just to discover the columns.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

_PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f'''CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN 1 END), 0) AS BIGINT)
                   AS {t}_n,
               CAST(COALESCE(SUM(CASE WHEN event_type = '{t}'
                                      THEN CAST(value AS DECIMAL(18,2)) END),
                             0) AS DOUBLE) AS {t}_sum'''
           for t in EVENT_TYPES)}
FROM events GROUP BY user_id
"""


@register("reshape_pivot", oracle=_PIVOT_ORACLE, tags=("reshape",))
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide: per-user event counts and exact-decimal value sums, one
    column pair per event type. Pivot with an explicit value list compiles
    to exactly two aggregates: a map-side-combined (user, type) pre-agg,
    then pivotfirst on user over a stream already collapsed to ≤|types|
    rows per user — no per-type scans and no value-discovery job (an
    unlisted pivot would run an extra distinct job just to find the
    columns, and an unbounded domain is a driver OOM at 100 TB, not a
    query)."""
    ev = load(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum"),
        )
    )
    cols = [F.col("user_id")]
    for t in EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n"))
        cols.append(
            F.coalesce(F.col(f"{t}_sum"), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias(f"{t}_sum")
        )
    return wide.select(*cols)


_UNPIVOT_ORACLE = """
SELECT c_custkey, 'c_acctbal' AS metric, ROUND(c_acctbal, 6) AS value FROM customer
UNION ALL
SELECT c_custkey, 'c_nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
FROM customer
"""


@register("reshape_unpivot", oracle=_UNPIVOT_ORACLE, tags=("reshape",))
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long with the native `DataFrame.unpivot` (SQL UNPIVOT / melt):
    each input row fans out to one row per measure column inside the map
    stage — no shuffle, no union of N scans (the UNION ALL spelling the
    oracle uses would read the table once per measure; unpivot reads it
    once, full stop)."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round("c_acctbal", 6).alias("c_acctbal"),
        F.col("c_nationkey").cast("double").alias("c_nationkey"),
    )
    return cust.unpivot(
        ids=["c_custkey"],
        values=["c_acctbal", "c_nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_SET_OPS_ORACLE = """
SELECT 'click_and_buy' AS cohort, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
UNION ALL
SELECT 'click_no_buy' AS cohort, user_id FROM (
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
)
"""


@register("set_ops_cohorts", oracle=_SET_OPS_ORACLE, tags=("reshape",))
def set_ops_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT as audience set algebra: users who both clicked
    and purchased vs clicked-but-never-purchased, tagged and stacked.

    Both set ops compile to hash semi/anti joins over distinct keys —
    Catalyst dedups each side before the join, so the shuffle carries
    distinct user_ids only (≪ event rows). The two branches share the
    identical child scans; the exchange is reused under AQE rather than
    recomputed."""
    ev = load(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clickers.intersect(buyers).select(
        F.lit("click_and_buy").alias("cohort"), "user_id"
    )
    only = clickers.subtract(buyers).select(
        F.lit("click_no_buy").alias("cohort"), "user_id"
    )
    return both.unionByName(only)
