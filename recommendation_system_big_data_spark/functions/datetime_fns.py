"""Date/time functions over `lineitem.l_shipdate` / `orders.o_orderdate` /
`events.ts` — the minimal temporal surface SURVEY.md §2.9 declares (the
reference keeps its date-like columns as raw strings, model-als.py:27-28).

Timestamp-precision discipline (SURVEY.md §7.3 item 5): testdata timestamps
are ns (events) and ms (lineitem/orders); Spark works at µs. Every query
output is either a formatted date string or an epoch-second long, so the
oracle hash never depends on sub-second representation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import epoch_s, epoch_us, load
from recommendation_system_big_data_spark.registry import register


@register(
    "fn_date_trunc",
    oracle="""
    SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY date_trunc('month', l_shipdate)
    """,
    tags=("datetime",),
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue rollup via date_trunc (SURVEY.md §2.9 extension)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("month", "l_shipdate").alias("_m"))
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.date_format("_m", "yyyy-MM-dd").alias("ship_month"),
            "revenue",
            "n_items",
        )
    )


@register(
    "fn_extract_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)  AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT)   AS order_day
    FROM orders
    """,
    tags=("datetime",),
)
def fn_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar field extraction (year/month/day)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
    )


@register(
    "fn_unix_epoch",
    oracle="""
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS unix_ts
    FROM events
    """,
    tags=("datetime",),
)
def fn_unix_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-second conversion of the ns-precision event stream; TZ-safe
    because `catalog.load` builds the column from timestamp_micros (UTC)."""
    return load(spark, sf_dir, "events").select(
        "event_id", epoch_s("ts").alias("unix_ts")
    )


_TRY_ARITH_ORACLE = """
SELECT event_id,
       value / NULLIF(CAST(user_id % 5 AS DOUBLE), 0) AS safe_ratio,
       CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS was_div0
FROM events
"""


@register("fn_try_arithmetic", oracle=_TRY_ARITH_ORACLE, tags=("scalar",))
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant arithmetic: try_divide yields NULL instead of a
    job-killing exception under ANSI mode (and instead of ±Infinity under
    legacy mode) — the spelling that makes a 100 TB pipeline robust to
    the one bad row in a trillion. The oracle is the portable
    NULLIF-denominator form; a was_div0 flag keeps the quarantine
    auditable rather than silent."""
    ev = load(spark, sf_dir, "events")
    denom = (F.col("user_id") % 5).cast("double")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), denom).alias("safe_ratio"),
        F.when(F.col("user_id") % 5 == 0, 1).otherwise(0).alias("was_div0"),
    )


_DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d')
           AS due_date,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d')
           AS review_date,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
           AS month_close,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')
            AS BIGINT) AS days_to_cutoff
FROM orders
"""


@register("fn_date_arithmetic", oracle=_DATE_ARITH_ORACLE, tags=("datetime",))
def fn_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-calendar date arithmetic — date_add, add_months, last_day,
    datediff: the SLA / billing-cycle scalar surface (due dates, review
    windows, month-end closes, days-to-cutoff aging). All four are
    codegen'd integer date math over the scan — zero shuffles, and the
    computed dates remain partition-pruning-friendly constants under
    Catalyst folding when filtered on.

    Month-end clamping is the cross-engine trap this query pins:
    Jan 31 + 1 month must clamp to Feb 28/29 — Spark's add_months and
    DuckDB's + INTERVAL n MONTH both clamp, and the oracle match proves
    it. Dates are emitted as formatted strings so the hash never depends
    on date physical representation."""
    d = F.col("o_orderdate").cast("date")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("review_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_close"),
        F.datediff(F.lit("1998-12-01").cast("date"), d)
        .cast("long")
        .alias("days_to_cutoff"),
    )


_TZ_CONVERT_ORACLE = """
SELECT event_id,
       ts AS utc_naive,
       CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York'
            AS TIMESTAMP) AS ny_wall,
       CAST(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo'
            AS TIMESTAMP) AS tokyo_wall,
       CAST(EXTRACT(hour FROM ts AT TIME ZONE 'UTC'
                    AT TIME ZONE 'America/New_York') AS INT) AS ny_hour
FROM events
WHERE event_id % 97 = 0
"""


@register("fn_timezone_convert", oracle=_TZ_CONVERT_ORACLE, tags=("fn", "datetime"))
def fn_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion semantics, pinned: naive UTC event times
    rendered as New York and Tokyo WALL times (from_utc_timestamp — the
    IANA-rules conversion including DST, which a fixed-offset shift gets
    wrong twice a year; the January data here sits in EST = UTC−5, and
    the assertion locks the rule engine, not an offset constant). The
    display-layer complement of the storage rule this engine enforces
    everywhere else: store naive-UTC, convert at the EDGE, never let a
    session zone leak into stored values (catalog.epoch_us exists
    because of exactly that hazard).

    Narrow codegen'd projection; the sampled filter (1/97 keys) keeps
    the driver-hash row set small without losing date coverage."""
    ev = load(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    utc = F.col("ts").cast("timestamp")
    return ev.select(
        "event_id",
        F.col("ts").alias("utc_naive"),
        F.from_utc_timestamp(utc, "America/New_York").alias("ny_wall"),
        F.from_utc_timestamp(utc, "Asia/Tokyo").alias("tokyo_wall"),
        F.hour(F.from_utc_timestamp(utc, "America/New_York"))
        .cast("int")
        .alias("ny_hour"),
    )
