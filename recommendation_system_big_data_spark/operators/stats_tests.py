"""Statistical inference operators — two-sample tests, concentration and
weighted order statistics.

The reference's EDA script stops at describe()/corr
(exploratory-data-analysis.py:88-141); SURVEY.md §2.2 declares profiling as
an engine surface, and a production analytics engine is expected to answer
"is this difference real?" next. These operators compute the classical
inference statistics with closed-form aggregate algebra — one scan, one
reduce — never a per-row Python boundary.

Scale notes: every test statistic here folds to a constant number of rows
after ONE map-side-combined aggregation of the fact table; the only window
operators run on post-aggregation grains (distinct values / dimension
rows), documented per-operator with the bucketed-prefix-sum fallback for
grains that outgrow one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load, min_parallelism
from recommendation_system_big_data_spark.functions.safe_stats import (
    guarded_pearson_sql,
)
from recommendation_system_big_data_spark.registry import register


_TTEST_ORACLE = """
WITH g AS (
    SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_a,
        AVG(CASE WHEN event_type = 'click' THEN value END)               AS m_a,
        VAR_SAMP(CASE WHEN event_type = 'click' THEN value END)          AS v_a,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_b,
        AVG(CASE WHEN event_type = 'purchase' THEN value END)            AS m_b,
        VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END)       AS v_b
    FROM events
    WHERE event_type IN ('click', 'purchase')
)
SELECT
    n_a, n_b,
    ROUND(m_a, 4) AS mean_a,
    ROUND(m_b, 4) AS mean_b,
    ROUND(m_a - m_b, 4) AS mean_diff,
    ROUND(SQRT(v_a / n_a + v_b / n_b), 4) AS std_err,
    CASE WHEN v_a / n_a + v_b / n_b = 0 THEN NULL
         ELSE ROUND((m_a - m_b) / SQRT(v_a / n_a + v_b / n_b), 4)
         END AS t_stat,
    CASE WHEN v_a / n_a + v_b / n_b = 0 THEN NULL
         ELSE ROUND(
        POW(v_a / n_a + v_b / n_b, 2)
        / (POW(v_a / n_a, 2) / (n_a - 1) + POW(v_b / n_b, 2) / (n_b - 1)),
        2
    ) END AS welch_dof
FROM g
"""


@register("stat_ttest_welch", oracle=_TTEST_ORACLE, tags=("profile", "experiment"))
def stat_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test: is the mean event value
    of clicks different from purchases? The continuous-outcome counterpart
    of `ab_test_report` (two-proportion z) and `stat_chi_square`
    (categorical association) — together the three cover the standard
    experiment-readout matrix.

    Everything is conditional aggregation over ONE filtered scan — n, mean
    and sample variance per arm come out of a single keyless reduce (the
    filter `event_type IN (...)` is pushed to the parquet scan), and the
    Welch statistic plus the Welch–Satterthwaite degrees of freedom are
    closed-form scalar algebra on that 1-row aggregate. No shuffle beyond
    the final 1-row reduce; at 100 TB this is scan-bound, embarrassingly
    partial-aggregable, and skew-immune (no keys at all).

    ROUND(4) on the float outputs covers cross-engine summation order in
    the mean/variance folds."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    a = F.when(F.col("event_type") == "click", F.col("value"))
    b = F.when(F.col("event_type") == "purchase", F.col("value"))
    g = ev.agg(
        F.count(a).alias("n_a"),
        F.avg(a).alias("m_a"),
        F.var_samp(a).alias("v_a"),
        F.count(b).alias("n_b"),
        F.avg(b).alias("m_b"),
        F.var_samp(b).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    # se2 = 0 (a constant-value corpus) must not reach the division:
    # ANSI Spark raises DIVIDE_BY_ZERO where DuckDB infs/NaNs — pin ONE
    # semantics (NULL statistic) on both engines. Same degenerate class
    # as the ADF var=0 guard and the stump-hist zero-range fix.
    return g.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round(F.col("m_a") - F.col("m_b"), 4).alias("mean_diff"),
        F.round(F.sqrt(se2), 4).alias("std_err"),
        F.when(
            se2 == 0, F.lit(None).cast("double")
        ).otherwise(
            F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4)
        ).alias("t_stat"),
        F.when(se2 == 0, F.lit(None).cast("double"))
        .otherwise(F.round(dof, 2))
        .alias("welch_dof"),
    )


_MWU_ORACLE = """
WITH v AS (
    SELECT value,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS c_a,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY value
), r AS (
    SELECT c_a, c,
           COALESCE(CAST(SUM(c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS cum_before
    FROM v
), s AS (
    SELECT
        CAST(SUM(c_a) AS BIGINT)                          AS n_a,
        CAST(SUM(c - c_a) AS BIGINT)                      AS n_b,
        CAST(SUM(c_a * (2 * cum_before + c + 1)) AS BIGINT) AS rank_sum2_a,
        CAST(SUM(c * c * c - c) AS BIGINT)                AS tie_term
    FROM r
)
SELECT
    n_a, n_b,
    ROUND((rank_sum2_a - n_a * (n_a + 1)) / 2.0, 1) AS u_stat,
    CASE WHEN n_a * n_b / 12.0 * (
                (n_a + n_b + 1)
                - tie_term / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))
            ) <= 0 THEN NULL
    ELSE ROUND(
        ((rank_sum2_a - n_a * (n_a + 1)) / 2.0 - n_a * n_b / 2.0)
        / SQRT(
            n_a * n_b / 12.0 * (
                (n_a + n_b + 1)
                - tie_term / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))
            )
        ),
        4
    ) END AS z_stat
FROM s
"""


@register("stat_mann_whitney", oracle=_MWU_ORACLE, tags=("profile", "experiment"))
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) for clicks vs purchases — the
    non-parametric sibling of `stat_ttest_welch` for heavy-tailed value
    distributions where means mislead (revenue, latency).

    Exact midranks WITHOUT a row-level global sort: the fact table first
    folds to one row per DISTINCT value carrying per-arm counts (one
    map-side-combined groupBy); midranks come from a running count over
    that distinct-value grain (cum_before + (c+1)/2, doubled to stay in
    exact integer arithmetic — `rank_sum2_a` is 2×R_A, so every quantity
    up to the final U/z fold is a BIGINT and hash-exact across engines).
    The tie correction Σ(t³−t) falls out of the same per-value counts.

    Scale note (closed round 8): the running count over the distinct-
    value grain — which grows with the data for real-valued metrics —
    runs through ranges.running_sums, the two-phase distributed prefix
    sum (range-partition, per-partition partials, O(partitions) offset
    window). No single task ever sees the whole grid; the statistic's
    algebra is unchanged and stays BIGINT-exact."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    v = ev.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c_a"),
        F.count(F.lit(1)).alias("c"),
    )
    r = running_sums(v, ["value"], {"cum_before": ("c", False)}).select(
        "c_a", "c", "cum_before"
    )
    s = r.agg(
        F.sum("c_a").cast("long").alias("n_a"),
        F.sum(F.col("c") - F.col("c_a")).cast("long").alias("n_b"),
        F.sum(F.col("c_a") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("long")
        .alias("rank_sum2_a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("long")
        .alias("tie_term"),
    )
    u = (F.col("rank_sum2_a") - F.col("n_a") * (F.col("n_a") + 1)) / 2.0
    n = F.col("n_a") + F.col("n_b")
    var_u = (
        F.col("n_a")
        * F.col("n_b")
        / 12.0
        * ((n + 1) - F.col("tie_term") / (n.cast("double") * (n - 1)))
    )
    # var_u = 0 (every observation tied on one value) must not reach the
    # division — NULL z on both engines (the ANSI degenerate class).
    return s.select(
        "n_a",
        "n_b",
        F.round(u, 1).alias("u_stat"),
        F.when(var_u <= 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (u - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(var_u), 4
            )
        )
        .alias("z_stat"),
    )


_GINI_ORACLE = """
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS x
    FROM orders GROUP BY o_custkey
), ranked AS (
    SELECT x,
           CAST(ROW_NUMBER() OVER (ORDER BY x ASC, o_custkey ASC) AS BIGINT) AS i
    FROM rev
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_customers,
    ROUND(CAST(SUM(x) AS DOUBLE), 2) AS total_rev,
    ROUND(
        (2.0 * CAST(SUM(i * x) AS DOUBLE)
         - (COUNT(*) + 1) * CAST(SUM(x) AS DOUBLE))
        / (COUNT(*) * CAST(SUM(x) AS DOUBLE)),
        6
    ) AS gini
FROM ranked
"""


def gini_from_values(rev: DataFrame, value: str = "x",
                     ordcol: str = "o_custkey") -> DataFrame:
    """Library kernel: Gini coefficient of a (value, tiebreak) frame via
    the rank identity G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) over ascending
    values. Output: (n, total, gini). Property-tested against the
    mean-absolute-difference definition in tests/test_property_stats.py.
    The global rank decomposes through ranges.running_sums (rank =
    exclusive running count of ones + 1 on the unique (value, tiebreak)
    grain), so no single task ever sorts the whole frame — the caller's
    pre-aggregated grain (customers here) scales with the data."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ranked = running_sums(
        rev.select(value, ordcol).withColumn("_one", F.lit(1)),
        [value, ordcol],
        {"_i0": ("_one", False)},
    ).select(value, (F.col("_i0") + 1).cast("long").alias("i"))
    n = F.count(F.lit(1))
    sx = F.sum(value).cast("double")
    return ranked.agg(
        n.cast("long").alias("n"),
        F.round(sx, 2).alias("total"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col(value)).cast("double") - (n + 1) * sx)
            / (n * sx),
            6,
        ).alias("gini"),
    )


@register("stat_gini_coefficient", oracle=_GINI_ORACLE, tags=("profile",))
def stat_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration — the scalar
    summary of the Lorenz curve whose decile form is
    `window_cumulative_share` (windows.py). 0 = perfectly equal spend,
    →1 = one whale carries the book.

    Uses the rank identity G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx) over ascending
    per-customer revenue: the fact table folds to the customer grain first
    (one map-side-combined groupBy), revenue is summed as DECIMAL so both
    engines rank identical exact values, and the only global sort runs on
    the customer dimension grain — post-aggregation always, and swappable
    for the bucketed prefix-sum pattern (ranges.py) when even the
    dimension outgrows one partition."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("x")
        )
    )
    return gini_from_values(rev).select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_rev"),
        "gini",
    )


_WEIGHTED_PCTL_ORACLE = """
WITH pw AS (
    SELECT l_returnflag AS rf, l_extendedprice AS price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS w
    FROM lineitem
    GROUP BY l_returnflag, l_extendedprice
), c AS (
    SELECT rf, price, w,
           CAST(SUM(w) OVER (
               PARTITION BY rf ORDER BY price ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS cumw,
           CAST(SUM(w) OVER (PARTITION BY rf) AS DECIMAL(18,2)) AS totw
    FROM pw
)
SELECT rf,
       CAST(totw AS DOUBLE) AS total_weight,
       MIN(CASE WHEN cumw >= CAST(0.25 AS DECIMAL(3,2)) * totw THEN price END)
           AS wp25,
       MIN(CASE WHEN cumw >= CAST(0.50 AS DECIMAL(3,2)) * totw THEN price END)
           AS wmedian,
       MIN(CASE WHEN cumw >= CAST(0.75 AS DECIMAL(3,2)) * totw THEN price END)
           AS wp75
FROM c
GROUP BY rf, totw
"""


def weighted_quantiles(
    pw: DataFrame, group: str = "rf", value: str = "price", weight: str = "w"
) -> DataFrame:
    """Library kernel: exact weighted quartiles of a pre-aggregated
    (group, distinct value, DECIMAL weight) frame via the cumulative-
    weight scan — min value whose running weight reaches q·total, per
    quantile. Property-tested against a sequential reference in
    tests/test_property_stats.py (boundary-exact thanks to DECIMAL
    weights)."""
    cum = (
        Window.partitionBy(group)
        .orderBy(F.asc(value))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = pw.select(
        group,
        value,
        F.sum(weight).over(cum).cast("decimal(18,2)").alias("cumw"),
        F.sum(weight)
        .over(Window.partitionBy(group))
        .cast("decimal(18,2)")
        .alias("totw"),
    )

    def pick(frac: str):
        thresh = F.lit(frac).cast("decimal(3,2)") * F.col("totw")
        return F.min(F.when(F.col("cumw") >= thresh, F.col(value)))

    return c.groupBy(group, "totw").agg(
        pick("0.25").alias("wp25"),
        pick("0.50").alias("wmedian"),
        pick("0.75").alias("wp75"),
    )


@register(
    "agg_weighted_percentile", oracle=_WEIGHTED_PCTL_ORACLE, tags=("profile", "agg")
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted price quartiles per returnflag — "half the UNITS
    shipped cost at most X", which is the inventory question
    (`agg_percentile_by_group`'s unweighted quantiles answer the
    line-item question). Spark has no weighted percentile built-in; the
    exact semantics compose from a cumulative-weight scan.

    Shape: fold to one row per (group, distinct price) with DECIMAL weight
    sums first — so the cumulative window runs on the distinct-price grain
    in a fixed ascending order, making every running sum an exact decimal
    both engines reproduce bit-identically (no float summation-order
    hazard on the threshold comparison). Quantile selection is then a
    conditional MIN over the windowed frame — one groupBy, no join. Same
    CDF-aggregation idea as `agg_summary`'s exact percentiles, weighted."""
    pw = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("rf"),
            F.col("l_extendedprice").alias("price"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("w")
        )
    )
    return weighted_quantiles(pw).select(
        "rf",
        F.col("totw").cast("double").alias("total_weight"),
        "wp25",
        "wmedian",
        "wp75",
    )


#: Poisson(1) inverse-CDF thresholds (cumulative e⁻¹·Σ 1/k!): a uniform
#: draw u maps to the weight k whose cumulative bin contains it. Literal
#: constants so both engines evaluate the identical ladder.
_POIS_CDF = (
    0.36787944117144233,  # k=0
    0.7357588823428847,   # k=1
    0.9196986029286058,   # k=2
    0.9810118431238462,   # k=3
    0.9963401531726563,   # k=4
    0.9994058151824183,   # k=5
    0.9999167588507119,   # k=6 — else 7
)

_N_BOOT = 10

_BOOTSTRAP_ORACLE = f"""
WITH fanned AS (
    SELECT e.value, b.b,
           (CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR) || '_'
                                 || CAST(b.b AS VARCHAR)), 1, 8)) AS BIGINT)
            % 1000000 + 0.5) / 1000000.0 AS u
    FROM events e
    CROSS JOIN (SELECT UNNEST(generate_series(0, {_N_BOOT - 1})) AS b) b
), weighted AS (
    SELECT b, value,
           CASE
             WHEN u < {_POIS_CDF[0]} THEN 0 WHEN u < {_POIS_CDF[1]} THEN 1
             WHEN u < {_POIS_CDF[2]} THEN 2 WHEN u < {_POIS_CDF[3]} THEN 3
             WHEN u < {_POIS_CDF[4]} THEN 4 WHEN u < {_POIS_CDF[5]} THEN 5
             WHEN u < {_POIS_CDF[6]} THEN 6 ELSE 7
           END AS w
    FROM fanned
), reps AS (
    SELECT b,
           CASE WHEN SUM(w) = 0 THEN NULL
                ELSE ROUND(SUM(w * value) / SUM(w), 6) END AS boot_mean
    FROM weighted GROUP BY b
), pt AS (
    SELECT AVG(value) AS point_est FROM events
)
SELECT CAST({_N_BOOT} AS BIGINT) AS n_replicates,
       ROUND(MAX(point_est), 6) AS point_est,
       ROUND(AVG(boot_mean), 6) AS boot_mean_of_means,
       CASE WHEN COUNT(boot_mean) < 2 THEN NULL
            ELSE ROUND(STDDEV_SAMP(boot_mean), 6) END AS boot_se,
       ROUND(MIN(boot_mean), 6) AS ci_lo,
       ROUND(MAX(boot_mean), 6) AS ci_hi
FROM reps CROSS JOIN pt
"""


@register("stat_bootstrap_ci", oracle=_BOOTSTRAP_ORACLE, tags=("profile", "experiment"))
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap standard error / CI for the mean event value —
    THE bootstrap that works at 100 TB: classical resampling needs n
    draws from n rows (global coordination); the Poisson bootstrap gives
    every row an independent Poisson(1) weight per replicate, so each
    replicate is one weighted aggregate and the whole B-replicate
    bootstrap is a single scan with a B-way explode (no shuffle of the
    fact table beyond the replicate groupBy on B keys).

    Determinism: the per-(row, replicate) uniform comes from the
    portable md5 bucket (same coin as split_by_hash), mapped through a
    literal Poisson inverse-CDF ladder — identical weights on any
    engine, which is what makes a *bootstrap* oracle-checkable at all.
    Replicate means round before the tiny B-row CI fold."""
    ev = load(spark, sf_dir, "events")
    fanned = ev.select("event_id", "value").select(
        "event_id",
        "value",
        F.explode(F.sequence(F.lit(0), F.lit(_N_BOOT - 1))).alias("b"),
    )
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    u = (
        portable_bucket(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("_"),
                F.col("b").cast("string"),
            ),
            1_000_000,
        ).cast("double")
        + 0.5
    ) / 1_000_000.0
    w = F.when(u < _POIS_CDF[0], 0)
    for k in range(1, 7):
        w = w.when(u < _POIS_CDF[k], k)
    w = w.otherwise(7)
    # an all-zero-weight replicate (possible on tiny corpora) has no
    # resample — NULL mean, not an ANSI raise; and < 2 defined replicate
    # means leave the SE undefined (Spark stddev_samp would emit NaN
    # where DuckDB NULLs). r13 tiny-fixture probe findings.
    reps = (
        fanned.select("b", "value", w.alias("w"))
        .groupBy("b")
        .agg(
            F.when(F.sum("w") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.round(F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6)
            )
            .alias("boot_mean")
        )
    )
    pt = ev.agg(F.avg("value").alias("point_est"))
    return reps.crossJoin(F.broadcast(pt)).agg(
        F.lit(_N_BOOT).cast("long").alias("n_replicates"),
        F.round(F.max("point_est"), 6).alias("point_est"),
        F.round(F.avg("boot_mean"), 6).alias("boot_mean_of_means"),
        F.when(F.count("boot_mean") < 2, F.lit(None).cast("double"))
        .otherwise(F.round(F.stddev_samp("boot_mean"), 6))
        .alias("boot_se"),
        F.round(F.min("boot_mean"), 6).alias("ci_lo"),
        F.round(F.max("boot_mean"), 6).alias("ci_hi"),
    )


_KM_ORACLE = """
WITH spans AS (
    SELECT user_id,
           MIN(ts) AS t0,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
), labeled AS (
    SELECT epoch_us(COALESCE(fp, last_ts) - t0) // 3600000000
               AS duration_hours,
           CASE WHEN fp IS NULL THEN 0 ELSE 1 END AS died
    FROM spans
), per_t AS (
    SELECT duration_hours AS t,
           CAST(SUM(died) AS BIGINT) AS d,
           CAST(COUNT(*) - SUM(died) AS BIGINT) AS c
    FROM labeled GROUP BY duration_hours
), risk AS (
    SELECT t, d, c,
           CAST((SELECT COUNT(*) FROM labeled) AS BIGINT)
           - COALESCE(CAST(SUM(d + c) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS BIGINT), 0) AS n_at_risk
    FROM per_t
)
SELECT t AS duration_hours, n_at_risk, d AS n_deaths, c AS n_censored,
       -- zero-factor guard mirrors kaplan_meier_curve: once a time
       -- where everyone at risk dies has passed, S is exactly 0 (LN(0)
       -- RAISES in DuckDB and is NULL in Spark — neither may be summed)
       CASE WHEN SUM(CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END) OVER (
                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) > 0 THEN 0.0
       ELSE ROUND(EXP(SUM(
                CASE WHEN d < n_at_risk
                     THEN LN(1.0 - CAST(d AS DOUBLE) / n_at_risk)
                     ELSE 0.0 END) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )), 6) END AS survival
FROM risk
WHERE n_at_risk > 0
"""


def kaplan_meier_curve(labeled: DataFrame, t: str = "duration_hours",
                       died: str = "died") -> DataFrame:
    """Library kernel: product-limit survival curve from a (duration,
    died 0/1) frame — life table on the distinct-duration grain,
    at-risk counts from a running sum, S(t) = exp(Σ ln(1−d/n)).
    The unpartitioned windows run on the distinct-duration grain, which
    is bounded by the observation window (durations are bucketed time
    units), not by subject count — the registered caller documents this;
    a caller with an unbounded grain should pre-bucket durations.
    Output: (t, n_at_risk, n_deaths, n_censored, survival).
    Property-tested against a sequential KM in
    tests/test_property_stats.py."""
    per_t = labeled.groupBy(F.col(t).alias("t")).agg(
        F.sum(died).cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum(died)).cast("long").alias("c"),
    )
    total = labeled.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0))
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    factor = 1.0 - F.col("d").cast("double") / F.col("n_at_risk")
    # Spark's log(0) is NULL and window SUM skips nulls — a time where
    # EVERYONE at risk dies (factor 0) would silently vanish from the
    # product instead of zeroing the curve (caught by the differential
    # test; DuckDB's LN(0) = -inf does the right thing by accident).
    # Track zero factors explicitly.
    logged = risk.where(F.col("n_at_risk") > 0).select(
        "t",
        "n_at_risk",
        "d",
        "c",
        F.when(factor > 0, F.log(factor)).alias("log_factor"),
        F.when(factor <= 0, 1).otherwise(0).alias("zero_factor"),
    )
    return logged.select(
        "t",
        "n_at_risk",
        F.col("d").alias("n_deaths"),
        F.col("c").alias("n_censored"),
        F.when(F.sum("zero_factor").over(run) > 0, 0.0)
        .otherwise(F.round(F.exp(F.sum("log_factor").over(run)), 6))
        .alias("survival"),
    )


@register("ml_kaplan_meier", oracle=_KM_ORACLE, tags=("profile", "ml"))
def ml_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier curve for TIME TO FIRST PURCHASE (hours from a
    user's first event to their first purchase), right-censored at the
    last observed event for users who never purchase — the correction
    every naive mean time-to-convert silently omits.
    S(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ). (Re-clocked in r15: the original
    first→last-span/3-day-horizon clock censored EVERY subject on the
    synthetic corpus — uniformly active users — so no driver row ever
    exercised a death; the conversion clock has abundant events and a
    real censored tail, and `stat_logrank_test` shares it verbatim.)

    Relational KM: users fold to (duration, died) in one groupBy (the
    censoring horizon is a 1-row broadcast); the life table groups by
    DISTINCT duration; at-risk counts come from a running sum over that
    distinct-duration grain; and the product-limit estimator is
    exp(running Σ ln(1−d/n)) — the log-sum trick that turns a running
    PRODUCT (which neither engine has) into the running sum both have.
    d, n are exact integers, the ln terms are identical doubles summed
    in frame order → deterministic. Distinct-duration grain is bounded
    by the observation window, not the user count."""
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
        F.max("ts").alias("last_ts"),
    )
    labeled = spans.select(
        F.expr(
            "timestampdiff(MICROSECOND, t0, COALESCE(fp, last_ts))"
            " div 3600000000"
        ).alias("duration_hours"),
        F.expr("CASE WHEN fp IS NULL THEN 0 ELSE 1 END").alias("died"),
    )
    return kaplan_meier_curve(labeled).select(
        F.col("t").alias("duration_hours"),
        "n_at_risk",
        "n_deaths",
        "n_censored",
        "survival",
    )


_EFFECT_SIZE_ORACLE = """
WITH g AS (
    SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_a,
        AVG(CASE WHEN event_type = 'click' THEN value END)               AS m_a,
        VAR_SAMP(CASE WHEN event_type = 'click' THEN value END)          AS v_a,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_b,
        AVG(CASE WHEN event_type = 'purchase' THEN value END)            AS m_b,
        VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END)       AS v_b
    FROM events
    WHERE event_type IN ('click', 'purchase')
)
SELECT n_a, n_b,
       CASE WHEN n_a < 2 OR n_b < 2
                 OR (n_a - 1) * v_a + (n_b - 1) * v_b = 0 THEN NULL
            ELSE ROUND((m_a - m_b)
             / SQRT(((n_a - 1) * v_a + (n_b - 1) * v_b) / (n_a + n_b - 2)),
             4) END AS cohens_d,
       CASE WHEN n_a < 2 OR n_b < 2
                 OR (n_a - 1) * v_a + (n_b - 1) * v_b = 0 THEN NULL
            ELSE ROUND(((m_a - m_b)
              / SQRT(((n_a - 1) * v_a + (n_b - 1) * v_b) / (n_a + n_b - 2)))
             * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 4) END AS hedges_g
FROM g
"""


@register("stat_effect_sizes", oracle=_EFFECT_SIZE_ORACLE, tags=("profile", "experiment"))
def stat_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g (small-sample-corrected) for the click vs
    purchase value gap — the companion `stat_ttest_welch` needs at scale:
    with 10⁹ rows EVERYTHING is "significant"; the effect size says
    whether the difference is worth acting on (|d| ≈ 0.2 small / 0.5
    medium / 0.8 large). Same one-scan conditional-aggregate fold as the
    t-test (pooled rather than Welch variance, per the d definition);
    the g correction 1 − 3/(4N−9) is scalar algebra on the same row."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    a = F.when(F.col("event_type") == "click", F.col("value"))
    b = F.when(F.col("event_type") == "purchase", F.col("value"))
    g = ev.agg(
        F.count(a).cast("long").alias("n_a"),
        F.avg(a).alias("m_a"),
        F.var_samp(a).alias("v_a"),
        F.count(b).cast("long").alias("n_b"),
        F.avg(b).alias("m_b"),
        F.var_samp(b).alias("v_b"),
    )
    pooled = F.sqrt(
        ((F.col("n_a") - 1) * F.col("v_a") + (F.col("n_b") - 1) * F.col("v_b"))
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    d = (F.col("m_a") - F.col("m_b")) / pooled
    corr = 1 - 3.0 / (4 * (F.col("n_a") + F.col("n_b")) - 9)
    # Constant-value arms zero the pooled variance (Welford terms are
    # exactly 0.0 on both engines) and a 1-row arm gives Spark NaN where
    # DuckDB NULLs VAR_SAMP — both pin NULL effect sizes. r13 probe.
    degenerate = (
        (F.col("n_a") < 2)
        | (F.col("n_b") < 2)
        | (
            (F.col("n_a") - 1) * F.col("v_a")
            + (F.col("n_b") - 1) * F.col("v_b")
            == 0
        )
    )
    return g.select(
        "n_a",
        "n_b",
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(d, 4))
        .alias("cohens_d"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(d * corr, 4))
        .alias("hedges_g"),
    )


_POWER_ORACLE = """
WITH g AS (
    SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_a,
        AVG(CASE WHEN event_type = 'click' THEN value END)      AS m_a,
        VAR_SAMP(CASE WHEN event_type = 'click' THEN value END) AS v_a,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
            AS n_b,
        AVG(CASE WHEN event_type = 'purchase' THEN value END)   AS m_b,
        VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END) AS v_b
    FROM events WHERE event_type IN ('click', 'purchase')
)
SELECT ROUND(m_a - m_b, 4) AS observed_delta,
       CASE WHEN n_a < 2 OR n_b < 2 THEN NULL
            ELSE ROUND(SQRT((v_a + v_b) / 2), 4) END AS pooled_sd,
       CASE WHEN n_a < 2 OR n_b < 2 OR m_a - m_b = 0 THEN NULL
            ELSE CAST(CEIL(2 * ((v_a + v_b) / 2)
                 * POW(1.959963985 + 0.8416212336, 2)
                 / POW(m_a - m_b, 2)) AS BIGINT) END AS n_per_arm_observed,
       CAST(CEIL(2 * POW(1.959963985 + 0.8416212336, 2)
                 / POW(0.2, 2)) AS BIGINT) AS n_per_arm_small_effect
FROM g
"""


@register("stat_power_sample_size", oracle=_POWER_ORACLE, tags=("profile", "experiment"))
def stat_power_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test sample-size calculator: n per arm = 2σ²(z_{α/2}+z_β)²/δ²
    for 80% power at α=0.05 (z constants 1.96, 0.8416 as literals —
    neither engine has an inverse normal CDF, and hardcoding the two
    canonical quantiles is what every power calculator does). σ² comes
    from the LIVE data (the pooled variance of the two arms) and δ from
    the observed gap, plus the standardized small-effect (d=0.2)
    answer — the planning companion to `stat_ttest_welch` (read the
    result) and `stat_effect_sizes` (judge the size): this one says how
    long to run the NEXT test.

    One conditional-aggregate reduce; everything after is scalar algebra
    on a single row."""
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    a = F.when(F.col("event_type") == "click", F.col("value"))
    b = F.when(F.col("event_type") == "purchase", F.col("value"))
    g = ev.agg(
        F.count(a).cast("long").alias("n_a"),
        F.avg(a).alias("m_a"),
        F.var_samp(a).alias("v_a"),
        F.count(b).cast("long").alias("n_b"),
        F.avg(b).alias("m_b"),
        F.var_samp(b).alias("v_b"),
    )
    z2 = (1.959963985 + 0.8416212336) ** 2
    pooled_var = (F.col("v_a") + F.col("v_b")) / 2
    delta = F.col("m_a") - F.col("m_b")
    # δ = 0 (identical arm means — exact on both engines for constant
    # arms) must not reach the δ² division, and a 1-row arm gives Spark
    # NaN where DuckDB NULLs VAR_SAMP — pin NULL. r13 probe finding.
    small = (F.col("n_a") < 2) | (F.col("n_b") < 2)
    return g.select(
        F.round(delta, 4).alias("observed_delta"),
        F.when(small, F.lit(None).cast("double"))
        .otherwise(F.round(F.sqrt(pooled_var), 4))
        .alias("pooled_sd"),
        F.when(small | (delta == 0), F.lit(None).cast("long"))
        .otherwise(
            F.ceil(2 * pooled_var * F.lit(z2) / F.pow(delta, 2)).cast("long")
        )
        .alias("n_per_arm_observed"),
        F.ceil(2 * F.lit(z2) / F.lit(0.2**2)).cast("long").alias(
            "n_per_arm_small_effect"
        ),
    )


#: Midranks are exact halves of integers → DECIMAL(19,1) carries them
#: exactly and (19,1)×(19,1) stays inside both engines' 38-digit multiply
#: budget (ranks ≤ 1e10 even at 100 TB: per-term products ≤ ~1e20 ≪ 1e38).
#: The guarded sums-based form replaces builtin CORR, whose internal
#: division raises under ANSI Spark on a constant-rank column. r13 probe.
_SPEARMAN_RHO = guarded_pearson_sql(
    "r_x", "r_y", dec="DECIMAL(19,1)", digits=6
)

_SPEARMAN_ORACLE = """
WITH pairs AS (
    SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
), rx AS (
    SELECT x, CAST(COUNT(*) AS BIGINT) AS c,
           COALESCE(CAST(SUM(COUNT(*)) OVER (
               ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS cb
    FROM pairs GROUP BY x
), ry AS (
    SELECT y, CAST(COUNT(*) AS BIGINT) AS c,
           COALESCE(CAST(SUM(COUNT(*)) OVER (
               ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS cb
    FROM pairs GROUP BY y
), ranked AS (
    SELECT (rx.cb + (rx.c + 1) / 2.0) AS r_x,
           (ry.cb + (ry.c + 1) / 2.0) AS r_y
    FROM pairs p JOIN rx ON p.x = rx.x JOIN ry ON p.y = ry.y
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       {rho} AS spearman_rho
FROM ranked
""".format(rho=_SPEARMAN_RHO)


@register("stat_spearman_corr", oracle=_SPEARMAN_ORACLE, tags=("profile",))
def stat_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs price — Pearson on
    MIDRANKS: monotone-association strength that ignores the marginal
    shapes, robust where `agg_corr_matrix`'s Pearson is dragged by
    outliers and curvature. ρ close to Pearson ⇒ the relationship is
    linear; far apart ⇒ monotone-but-curved (use ranks downstream).

    Same no-global-row-sort discipline as `stat_mann_whitney`: each
    variable's midranks come from a distinct-VALUE fold + running count
    on that reduced grain, then join back to the pair stream on the
    value (broadcast-sized here; at scale both are hash equi-joins) and
    one CORR fold finishes it. Midranks are exact halves of integers, so
    the only doubles are CORR's own sums — ROUND(6)."""
    pairs = load(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )

    def midranks(col: str) -> DataFrame:
        from recommendation_system_big_data_spark.operators.ranges import (
            running_sums,
        )

        counts = pairs.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return running_sums(
            counts, [col], {"cum_before": ("c", False)}
        ).select(
            col,
            (F.col("cum_before") + (F.col("c") + 1) / 2.0).alias(f"r_{col}"),
        )

    ranked = pairs.join(midranks("x"), "x").join(midranks("y"), "y")
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr(_SPEARMAN_RHO).alias("spearman_rho"),
    )


_THEIL_ORACLE = """
WITH cust AS (
    SELECT o.o_custkey, c.c_nationkey AS nat,
           CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS x
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY o.o_custkey, c.c_nationkey
), gstat AS (
    SELECT nat, CAST(COUNT(*) AS BIGINT) AS ng, SUM(x) AS sumg, AVG(x) AS mug
    FROM cust GROUP BY nat
), tot AS (
    SELECT SUM(x) AS xt, AVG(x) AS mu FROM cust
), within AS (
    SELECT c.nat,
           SUM((c.x / g.mug) * LN(c.x / g.mug)) / g.ng AS t_within
    FROM cust c JOIN gstat g ON c.nat = g.nat
    GROUP BY c.nat, g.ng
)
SELECT CAST(g.nat AS INT) AS nation,
       g.ng AS n_customers,
       ROUND(g.sumg / t.xt, 6) AS revenue_share,
       ROUND(w.t_within, 6) AS t_within,
       ROUND((g.sumg / t.xt) * LN(g.mug / t.mu), 6) AS between_contribution
FROM gstat g
JOIN within w ON w.nat = g.nat
CROSS JOIN tot t
"""


@register("stat_theil_decomposition", oracle=_THEIL_ORACLE, tags=("profile",))
def stat_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition of customer revenue by nation:
    total inequality splits EXACTLY into within-group and between-group
    parts — T = Σ sᵍ·Tᵍ + Σ sᵍ·ln(μᵍ/μ) — answering what Gini
    (`stat_gini_coefficient`) cannot: is concentration driven by whales
    INSIDE markets or by rich-vs-poor MARKETS? Each nation's row carries
    its share-weighted within term and its between contribution; the
    column sums reassemble global T.

    Fact → customer grain once (exact DECIMAL); group stats are a
    |nations|-row re-aggregation broadcast back; the within fold is one
    more pass over the customer grain. All shuffles keyed on nation —
    no global sort anywhere (the rank-based Gini needs one; Theil is
    the decomposable, sort-free inequality index, which is exactly why
    economists use it at scale)."""
    cust = (
        load(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load(spark, sf_dir, "customer").select(
                    "c_custkey", F.col("c_nationkey").alias("nat")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_custkey", "nat")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("x")
        )
    )
    gstat = cust.groupBy("nat").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").alias("sumg"),
        F.avg("x").alias("mug"),
    )
    tot = cust.agg(F.sum("x").alias("xt"), F.avg("x").alias("mu"))
    within = (
        cust.join(F.broadcast(gstat), "nat")
        .groupBy("nat", "ng")
        .agg(
            (
                F.sum(
                    (F.col("x") / F.col("mug"))
                    * F.log(F.col("x") / F.col("mug"))
                )
                / F.col("ng")
            ).alias("t_within")
        )
        .select("nat", "t_within")
    )
    return (
        gstat.join(within, "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("nat").cast("int").alias("nation"),
            F.col("ng").alias("n_customers"),
            F.round(F.col("sumg") / F.col("xt"), 6).alias("revenue_share"),
            F.round("t_within", 6).alias("t_within"),
            F.round(
                (F.col("sumg") / F.col("xt"))
                * F.log(F.col("mug") / F.col("mu")),
                6,
            ).alias("between_contribution"),
        )
    )


_WILSON_ORACLE = """
WITH g AS (
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT) AS k
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
)
SELECT segment, n, k,
       ROUND(k / CAST(n AS DOUBLE), 6) AS rate,
       ROUND((k / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (2 * n)
              - 1.959963985 * SQRT((k / CAST(n AS DOUBLE))
                    * (1 - k / CAST(n AS DOUBLE)) / n
                    + 1.959963985 * 1.959963985 / (4.0 * n * n)))
             / (1 + 1.959963985 * 1.959963985 / n), 6) AS wilson_lo,
       ROUND((k / CAST(n AS DOUBLE) + 1.959963985 * 1.959963985 / (2 * n)
              + 1.959963985 * SQRT((k / CAST(n AS DOUBLE))
                    * (1 - k / CAST(n AS DOUBLE)) / n
                    + 1.959963985 * 1.959963985 / (4.0 * n * n)))
             / (1 + 1.959963985 * 1.959963985 / n), 6) AS wilson_hi
FROM g
"""


@register("stat_wilson_ci", oracle=_WILSON_ORACLE, tags=("profile", "experiment"))
def stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% intervals for per-segment urgent-order rates —
    the proportion CI that behaves at the extremes where the naive
    normal (Wald) interval fails (k=0 gives Wald a width of exactly
    zero — absurd confidence — where Wilson correctly spreads; Wilson
    also never leaves [0,1]). The rate-reporting companion of
    `ab_test_report` (which compares two rates) and
    `stat_power_sample_size` (which plans for them).

    One broadcast dim join + one conditional-count fold per segment;
    the interval is closed-form scalar algebra on exact integer (n, k)
    with the z constant as a literal — identical on both engines."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    g = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1))
            .cast("long")
            .alias("k"),
        )
    )
    z = 1.959963985
    p = F.col("k") / F.col("n").cast("double")
    n = F.col("n")
    center = p + z * z / (2 * n)
    half = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return g.select(
        "segment",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - half) / denom, 6).alias("wilson_lo"),
        F.round((center + half) / denom, 6).alias("wilson_hi"),
    )


_MK_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           SUM(CAST(value AS DECIMAL(18,2))) AS rev
    FROM events GROUP BY 1
), pairs AS (
    SELECT CASE WHEN b.rev > a.rev THEN 1
                WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
    FROM daily a JOIN daily b ON b.day > a.day
), ties AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY rev
), agg AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n,
           (SELECT CAST(COALESCE(SUM(sgn), 0) AS BIGINT) FROM pairs) AS s,
           (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
            FROM ties) AS tie_term
), v AS (
    SELECT n, s,
           CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0 AS var_s
    FROM agg
)
SELECT n AS n_days, s AS s_stat,
       ROUND(var_s, 6) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0 END, 4) AS z_stat,
       CASE WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                       WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                       ELSE 0 END) > 1.96 THEN 'increasing'
            WHEN (CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                       WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                       ELSE 0 END) < -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM v
"""


@register(
    "stat_trend_mann_kendall", oracle=_MK_ORACLE, tags=("profile", "timeseries")
)
def stat_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test over daily revenue — the
    nonparametric "is this KPI actually drifting or am I reading noise"
    answer (no distribution assumption, robust to outliers; the standard
    first test on an ops dashboard series). S = Σ sign(x_j − x_i) over
    all day pairs i<j; variance uses the tie-corrected formula; the
    continuity-corrected z gates the verdict at |z| > 1.96.

    Exactness: the fact table folds to the daily grain ONCE with
    DECIMAL(18,2) sums, so every pairwise sign is an exact integer
    comparison — S, n, and the tie term are integers on both engines,
    and z is one shared IEEE expression over them (ROUND 4). The O(d²)
    pair join runs on the BOUNDED daily grain (~90 rows here, ≤ a few
    thousand for any real horizon), never on the fact table — the same
    reduce-then-solve shape as ts_holt_linear. At 100 TB the only
    data-scaled stage is the one map-side-combined daily fold."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    a = daily.select(F.col("day").alias("da"), F.col("rev").alias("ra"))
    b = daily.select(F.col("day").alias("db"), F.col("rev").alias("rb"))
    sgn = (
        F.when(F.col("rb") > F.col("ra"), 1)
        .when(F.col("rb") < F.col("ra"), -1)
        .otherwise(0)
    )
    s_df = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(F.coalesce(F.sum(sgn), F.lit(0)).cast("long").alias("s"))
    )
    n_df = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    tie_df = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    agg = n_df.crossJoin(s_df).crossJoin(tie_df)
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ).cast("double") / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 4).alias("z_stat"),
        F.when(z > 1.96, "increasing")
        .when(z < -1.96, "decreasing")
        .otherwise("no_trend")
        .alias("trend"),
    )


#: SPRT hypotheses and error rates: simple H0 p=0.48 vs H1 p=0.52 on the
#: daily purchase share of purchase+click traffic (fixture mix ≈ 0.5, so
#: the LLR genuinely wanders instead of saturating on day one), with
#: alpha = beta = 0.05 giving the classic symmetric ln(19) boundaries.
SPRT_P0 = 0.48
SPRT_P1 = 0.52
SPRT_BOUND = 19.0  # (1-beta)/alpha = 0.95/0.05

_SPRT_ORACLE = f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS conversions,
           CAST(COUNT(CASE WHEN event_type IN ('purchase', 'click') THEN 1 END)
                AS BIGINT) AS trials
    FROM events GROUP BY 1
), llr AS (
    SELECT day, conversions, trials,
           conversions * ln({SPRT_P1} / {SPRT_P0})
             + (trials - conversions)
               * ln((1 - {SPRT_P1}) / (1 - {SPRT_P0})) AS llr
    FROM daily
), cum AS (
    SELECT day, conversions, trials, llr,
           SUM(llr) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_llr
    FROM llr
)
SELECT day, conversions, trials,
       ROUND(llr, 6) AS llr,
       ROUND(cum_llr, 6) AS cum_llr,
       CASE WHEN cum_llr >= ln({SPRT_BOUND}) THEN 'accept_h1'
            WHEN cum_llr <= -ln({SPRT_BOUND}) THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM cum
"""


@register(
    "stat_sprt_sequential", oracle=_SPRT_ORACLE, tags=("profile", "experiment")
)
def stat_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test over the daily purchase
    share of purchase+click traffic — the peek-as-you-go experimentation
    primitive (fixed-horizon tests like stat_ttest_welch forbid early
    stopping; SPRT's cumulative log-likelihood ratio with ±ln((1-β)/α)
    boundaries is the classic always-valid alternative). Per day: the
    day's LLR contribution, the running total, and the decision state
    the experimenter would have seen that evening.

    Shape: one map-combined fold of the fact table to the bounded daily
    grain is the only data-scaled stage; the cumulative sum is a window
    over ≤ retention-period days (the module's documented bounded-grain
    convention). Determinism: counts are exact integers, both engines
    evaluate the identical LLR expression over them (the shared ln
    convention), and the running sum accumulates in frame order — so
    the boundary comparisons cannot flip between engines."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("conversions"),
            F.count(
                F.when(F.col("event_type").isin("purchase", "click"), 1)
            )
            .cast("long")
            .alias("trials"),
        )
    )
    c1 = F.log(F.lit(SPRT_P1) / F.lit(SPRT_P0))
    c2 = F.log((1 - F.lit(SPRT_P1)) / (1 - F.lit(SPRT_P0)))
    llr = F.col("conversions") * c1 + (F.col("trials") - F.col("conversions")) * c2
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "day", "conversions", "trials", llr.alias("llr")
    ).withColumn("cum_llr", F.sum("llr").over(w))
    bound = F.log(F.lit(SPRT_BOUND))
    return cum.select(
        "day",
        "conversions",
        "trials",
        F.round("llr", 6).alias("llr"),
        F.round("cum_llr", 6).alias("cum_llr"),
        F.when(F.col("cum_llr") >= bound, "accept_h1")
        .when(F.col("cum_llr") <= -bound, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


#: One-way ANOVA quantization: event values carry 2 decimals, so
#: FLOOR(value·1e4) loses nothing real and makes every downstream op exact
#: integer arithmetic — the integer-hash exit convention (COVERAGE.md r10,
#: the embedding_covariance pattern). Variance outputs are in units of
#: 1e-8·value²; F is emitted in milli-units, eta² in micro-units.
ANOVA_QUANT = 10_000

#: F saturation: f_milli is reported as min(round(1000·F), 1e15) — i.e. F
#: caps at 1e12. Degenerate inputs (within-variance ≈ 0 with any real
#: between-group spread) would otherwise push the truncating division's
#: quotient past 2^63, where Spark's IntegralDivide silently wraps (the
#: r10 Brier lesson, ADVICE r10). Mirrored in the oracle via LEAST.
ANOVA_F_CAP = 10**15

_ANOVA_ORACLE = f"""
WITH vq AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}.0) AS HUGEINT) AS vq
    FROM events
), per AS (
    SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
           SUM(vq) AS s_g, SUM(vq * vq) AS q_g
    FROM vq GROUP BY g
), per2 AS (
    SELECT *, (s_g * s_g) // n_g AS ssq_g FROM per
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n,
           SUM(s_g) AS s, SUM(q_g) AS q, SUM(ssq_g) AS ssq
    FROM per2
), fin AS (
    SELECT k, n,
           ssq - (s * s) // n AS ssb,
           q - ssq            AS ssw,
           q - (s * s) // n   AS sst
    FROM tot
), fin2 AS (
    SELECT *, CASE WHEN n = k THEN NULL ELSE ssw // (n - k) END AS vw
    FROM fin
)
SELECT CAST(k AS BIGINT)   AS k_groups,
       CAST(n AS BIGINT)   AS n_total,
       CAST(CASE WHEN ssb < 0 THEN -((-ssb) // n) ELSE ssb // n END
            AS BIGINT) AS var_between_q,
       CAST(vw AS BIGINT)  AS var_within_q,
       CAST(CASE WHEN vw IS NULL OR vw = 0 OR k = 1 THEN NULL
            WHEN ssb < 0
            THEN -LEAST(((-ssb) * 2000 + vw * (k - 1))
                        // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            ELSE LEAST((ssb * 2000 + vw * (k - 1))
                       // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            END AS BIGINT) AS f_milli,
       CAST(CASE WHEN sst = 0 THEN NULL
            WHEN ssb < 0
            THEN -(((-ssb) * 2000000 + sst) // (2 * sst))
            ELSE (ssb * 2000000 + sst) // (2 * sst)
            END AS BIGINT) AS eta_sq_micros
FROM fin2
"""


@register("stat_anova_oneway", oracle=_ANOVA_ORACLE, tags=("profile", "experiment"))
def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five event types on event value: the
    k-group generalization of `stat_ttest_welch` (equal-variance form) —
    F = (SSB/(k−1))/MSW plus the effect size η² = SSB/SST, the pair
    every experiment readout with >2 arms needs before any pairwise
    test is allowed.

    Integer-exit convention (COVERAGE.md r10): values are FLOOR-quantized
    to 1e-4 units (they carry 2 decimals, so nothing real is lost) and
    every intermediate stays in DECIMAL. Spark's `div` is exact on
    decimals but RETURNS LONG, so a quotient past 2^63 silently wraps
    (ADVICE r10, the "never big div small" trap) — therefore every
    unbounded quotient (per-group S²/n, total S²/n, which are Θ(n·1e8))
    is computed with the exact remainder identity
    ``(a - a % b) / b`` (decimal in, decimal out, exact because the
    numerator is made divisible first; a ≥ 0 so floor = trunc), and
    `div` is only ever used where the quotient is output-scale:
    var_between = SSB div n and MSW = SSW div (n−k) are bounded by the
    value range squared (~1e14 in quant² units), η² ≤ 1e6 micro-units,
    and F saturates at ANOVA_F_CAP milli-units via LEAST. Exactness
    bound: group sums fit DECIMAL(30,0) and their squares DECIMAL(38,0)
    — exact to ~3e12 rows per group (beyond 100 TB of events), and past
    that Spark's decimal overflow is a LOUD null, never a wrong number.

    Scale shape: ONE map-side-combined aggregate of the fact table to k
    rows (count/sum/sum-of-squares per group — the same sufficient
    statistics a sequential scan would keep), then a keyless fold of the
    k rows; nothing downstream of the first reduce depends on n."""
    vq = F.floor(F.col("value") * F.lit(float(ANOVA_QUANT))).cast("long")
    grouped = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), vq.alias("vq")
    )
    return anova_fold(grouped)


def anova_fold(grouped: DataFrame) -> DataFrame:
    """Library kernel: one-way ANOVA over a ``(g, vq)`` frame of integer-
    quantized observations, with the full decimal overflow-proof algebra
    documented at stat_anova_oneway (its sole caller until
    stat_levene_variance reused it on |x − m̂_g| deviations)."""
    per = (
        grouped.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("decimal(20,0)").alias("n_g"),
            F.sum(F.col("vq").cast("decimal(20,0)")).alias("s_g"),
            F.sum(F.col("vq").cast("decimal(19,0)") * F.col("vq")).alias("q_g"),
        )
        # Exact trunc(s_g²/n_g) without a LONG quotient: make the
        # numerator divisible, then decimal-divide (exact, no rounding).
        .withColumn("s2_g", F.expr("CAST(s_g * s_g AS DECIMAL(38,0))"))
        .withColumn(
            "ssq_g",
            F.expr("CAST((s2_g - s2_g % n_g) / n_g AS DECIMAL(32,0))"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum("ssq_g").alias("ssq"),
    )
    fin = (
        tot.withColumn("s2", F.expr("CAST(s * s AS DECIMAL(38,0))"))
        .withColumn("sn", F.expr("CAST((s2 - s2 % n) / n AS DECIMAL(32,0))"))
        .select(
            "k",
            "n",
            F.expr("CAST(ssq - sn AS DECIMAL(33,0))").alias("ssb"),
            F.expr("CAST(q - ssq AS DECIMAL(33,0))").alias("ssw"),
            F.expr("CAST(q - sn AS DECIMAL(33,0))").alias("sst"),
        )
        .withColumn(
            # n = k (every group a single row) leaves no within degrees of
            # freedom: NULL, not an ANSI divide-by-zero (r13 probe class).
            "vw",
            F.expr("CASE WHEN n = k THEN NULL ELSE ssw div (n - k) END"),
        )
        .withColumn("absb", F.expr("CAST(abs(ssb) AS DECIMAL(33,0))"))
    )
    # F in milli-units, saturated: numerator absb·2000 ≤ ~2e30 fits
    # decimal(38,0); the remainder identity keeps the quotient decimal
    # (it can legitimately exceed 2^63 when vw is tiny), then LEAST caps
    # it at output scale. fb=0 is dodged with a sentinel divisor because
    # ANSI evaluates the remainder before the CASE guard would — and k=1
    # (a single group, the r13 oneday probe) zeroes fb the same way.
    f_milli = F.expr(
        f"""CASE WHEN vw IS NULL OR vw = 0 OR k = 1 THEN NULL ELSE
        (CASE WHEN ssb < 0 THEN -1 ELSE 1 END) * CAST(LEAST(
            CAST((fa - fa % fb) / fb AS DECIMAL(38,0)),
            CAST({ANOVA_F_CAP} AS DECIMAL(38,0))) AS LONG) END"""
    )
    eta = F.expr(
        "CASE WHEN sst = 0 THEN NULL ELSE"
        " (CASE WHEN ssb < 0 THEN -1 ELSE 1 END)"
        " * ((absb * 2000000 + sst) div (2 * sst)) END"
    )
    return (
        fin.withColumn(
            "fa", F.expr("CAST(absb * 2000 + vw * (k - 1) AS DECIMAL(38,0))")
        )
        .withColumn(
            "fb",
            F.expr(
                "CAST(CASE WHEN vw IS NULL OR vw = 0 OR k = 1 THEN 1"
                " ELSE 2 * vw * (k - 1) END"
                " AS DECIMAL(20,0))"
            ),
        )
        .select(
            F.col("k").alias("k_groups"),
            F.col("n").cast("long").alias("n_total"),
            F.expr("ssb div n").cast("long").alias("var_between_q"),
            F.col("vw").cast("long").alias("var_within_q"),
            f_milli.cast("long").alias("f_milli"),
            eta.cast("long").alias("eta_sq_micros"),
        )
    )


#: Permutation count for the exact-resampling test. 200 keeps the window
#: work at B·n rows (~2M at sf0.1) while giving p-value resolution 1/201.
PERM_B = 200

_PERM_ORACLE = f"""
WITH ev AS (
    SELECT event_id,
           event_type = 'click' AS is_a,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM events WHERE event_type IN ('click', 'purchase')
), tot AS (
    SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,
           SUM(CASE WHEN is_a THEN cents ELSE 0 END) AS s_a,
           SUM(CASE WHEN is_a THEN 0 ELSE cents END) AS s_b
    FROM ev
), obs AS (
    SELECT n_a, n_b, ABS(s_a * n_b - s_b * n_a) AS t_obs FROM tot
), perms AS (
    SELECT b.b, ev.cents, tot.n_a, tot.n_b,
           ROW_NUMBER() OVER (
               PARTITION BY b.b
               ORDER BY md5(CAST(b.b AS VARCHAR) || ':'
                            || CAST(ev.event_id AS VARCHAR)),
                        ev.event_id
           ) AS rnk
    FROM ev, range(1, {PERM_B + 1}) b(b), tot
), tstats AS (
    SELECT b,
           ABS(SUM(CASE WHEN rnk <= n_a THEN cents ELSE 0 END) * MAX(n_b)
               - SUM(CASE WHEN rnk > n_a THEN cents ELSE 0 END) * MAX(n_a))
               AS t_b
    FROM perms GROUP BY b
)
SELECT obs.n_a, obs.n_b,
       CAST(obs.t_obs AS BIGINT) AS t_obs_scaled,
       CAST({PERM_B} AS BIGINT) AS n_perms,
       CAST((SELECT COUNT(*) FROM tstats WHERE t_b >= obs.t_obs)
            AS BIGINT) AS n_exceed
FROM obs
"""


@register(
    "stat_permutation_test", oracle=_PERM_ORACLE, tags=("profile", "experiment")
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample permutation test of mean event value, click vs purchase
    — the assumption-free companion of `stat_ttest_welch` (no normality,
    no variance model: under H₀ the labels are exchangeable, so the
    observed mean gap is ranked against the gap under PERM_B relabelings
    that preserve the group sizes). Reports the exceedance count; the
    Monte-Carlo p-value is (n_exceed + 1)/(n_perms + 1).

    The resampling itself is ORACLE-EXACT — rare for a permutation test:
    permutation b orders the pooled rows by md5(b || ':' || event_id)
    (both engines produce the identical lowercase-hex md5, so the
    pseudo-random total order is engine-independent and seeded by b) and
    assigns the first n_a ranks to group A. Every statistic is integer:
    values enter as exact cents, and mean gaps compare via the
    cross-multiplied |S_A·n_B − S_B·n_A| — no division, no float,
    nothing to knife-edge (COVERAGE.md r10 convention).

    Scale shape: one scan folds the facts; the B-fold expansion is a
    crossJoin with a broadcast PERM_B-row spine (rows·B total, B
    independent window partitions — embarrassingly parallel, one
    shuffle on b); each permutation reduces map-side to one row. B is
    a constant: the expansion is linear in data, and at 100 TB the
    per-b ordering falls out of the same bucketed prefix-sum pattern
    as the other global-order statistics (ranges.py).

    The pooled slice goes through the min_parallelism guard before the
    fan-out: a selective filter of a small parquet table collapses to
    one input split, and the ×B crossJoin inherits its parent's
    partitioning — so without the guard every md5 of the B·n expansion
    runs on ONE core (measured 9.2 s → 2.1 s at sf0.1/local[32]). The
    guard (vs the unconditional repartition it replaced, r11 ADVICE) is
    a no-op exchange-free pass-through when the scan already carries
    >= session-parallelism splits — at production scale it never
    DOWN-partitions an input that arrives wider than
    defaultParallelism."""
    ev = min_parallelism(
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            (F.col("event_type") == "click").alias("is_a"),
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        ),
        spark,
    )
    tot = ev.agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(1)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("cents")).otherwise(0)).alias("s_a"),
        F.sum(F.when(F.col("is_a"), 0).otherwise(F.col("cents"))).alias("s_b"),
    )
    spine = F.broadcast(spark.range(1, PERM_B + 1).select(F.col("id").alias("b")))
    w = Window.partitionBy("b").orderBy(
        F.md5(
            F.concat(
                F.col("b").cast("string"), F.lit(":"), F.col("event_id").cast("string")
            ).cast("binary")
        ),
        F.asc("event_id"),
    )
    perms = (
        ev.crossJoin(spine)
        .crossJoin(F.broadcast(tot.select("n_a", "n_b")))
        .select("b", "cents", "n_a", "n_b", F.row_number().over(w).alias("rnk"))
    )
    tstats = perms.groupBy("b").agg(
        F.abs(
            F.sum(F.when(F.col("rnk") <= F.col("n_a"), F.col("cents")).otherwise(0))
            * F.max("n_b")
            - F.sum(F.when(F.col("rnk") > F.col("n_a"), F.col("cents")).otherwise(0))
            * F.max("n_a")
        ).alias("t_b")
    )
    obs = tot.select(
        "n_a",
        "n_b",
        F.abs(F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a")).alias(
            "t_obs"
        ),
    )
    # COUNT (not SUM) so an empty pool (no click/purchase rows at all)
    # yields 0, matching the oracle's scalar COUNT subquery — SUM over
    # the empty aggregate is NULL and split the engines on the tiny
    # probe fixture.
    exceed = (
        tstats.crossJoin(F.broadcast(obs.select(F.col("t_obs").alias("t0"))))
        .agg(
            F.count(F.when(F.col("t_b") >= F.col("t0"), 1))
            .cast("long")
            .alias("n_exceed")
        )
    )
    return obs.crossJoin(F.broadcast(exceed)).select(
        "n_a",
        "n_b",
        F.col("t_obs").cast("long").alias("t_obs_scaled"),
        F.lit(PERM_B).cast("long").alias("n_perms"),
        "n_exceed",
    )


_LEVENE_ORACLE = f"""
WITH vq AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}.0) AS HUGEINT) AS vq
    FROM events
), m AS (
    SELECT g, SUM(vq) // CAST(COUNT(*) AS HUGEINT) AS m_g FROM vq GROUP BY g
), z AS (
    SELECT vq.g, ABS(vq.vq - m.m_g) AS vq2 FROM vq JOIN m USING (g)
), per AS (
    SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
           SUM(vq2) AS s_g, SUM(vq2 * vq2) AS q_g
    FROM z GROUP BY g
), per2 AS (
    SELECT *, (s_g * s_g) // n_g AS ssq_g FROM per
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n,
           SUM(s_g) AS s, SUM(q_g) AS q, SUM(ssq_g) AS ssq
    FROM per2
), fin AS (
    SELECT k, n,
           ssq - (s * s) // n AS ssb,
           q - ssq            AS ssw
    FROM tot
), fin2 AS (
    SELECT *, CASE WHEN n = k THEN NULL ELSE ssw // (n - k) END AS vw
    FROM fin
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_total,
       CAST(CASE WHEN vw IS NULL OR vw = 0 OR k = 1 THEN NULL
            WHEN ssb < 0
            THEN -LEAST(((-ssb) * 2000 + vw * (k - 1))
                        // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            ELSE LEAST((ssb * 2000 + vw * (k - 1))
                       // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            END AS BIGINT) AS w_milli
FROM fin2
"""


@register(
    "stat_levene_variance", oracle=_LEVENE_ORACLE, tags=("profile", "experiment")
)
def stat_levene_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's test for equality of variances across the five event
    types — the gate every equal-variance procedure (the classic-F ANOVA
    above, pooled t-tests) should pass through first: W is simply the
    one-way ANOVA F statistic computed on the absolute deviations
    z = |x − x̄_g|, so heavy spread differences show up as mean
    differences of z.

    Deterministic integer variant: deviations are taken from the
    TRUNCATED integer group mean m̂_g = S_g div n_g in 1e-4 quant units
    (< 1 quant unit from the real mean; both engines truncate
    identically, so the statistic is exactly mirrored — the documented
    micro-grid convention, same class as the Brier res quantization).
    The fold reuses anova_fold, inheriting the r11 overflow-proof
    decimal algebra and the W saturation at ANOVA_F_CAP.

    Scale shape: TWO map-combined passes over the facts (one k-row mean
    table broadcast back, one deviation fold) — the price of a centered
    statistic without materializing deviations; everything after the
    second reduce is k rows."""
    vq = F.floor(F.col("value") * F.lit(float(ANOVA_QUANT))).cast("long")
    obs = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), vq.alias("vq")
    )
    # Group sums accumulate in decimal (a LONG sum wraps near 1e13 rows
    # of 1e6-unit values); the mean quotient itself is bounded by the
    # value range, so the exit back to LONG is safe at any n.
    m = obs.groupBy("g").agg(
        F.expr(
            "CAST(SUM(CAST(vq AS DECIMAL(30,0))) div COUNT(1) AS LONG)"
        ).alias("m_g")
    )
    z = obs.join(F.broadcast(m), "g").select(
        "g", F.abs(F.col("vq") - F.col("m_g")).alias("vq")
    )
    return anova_fold(z).select(
        "k_groups",
        "n_total",
        F.col("f_milli").alias("w_milli"),
    )


_KW_ORACLE = """
WITH vt AS (
    SELECT value, event_type AS g, CAST(COUNT(*) AS HUGEINT) AS c_g
    FROM events GROUP BY value, event_type
), v AS (
    SELECT value, SUM(c_g) AS c FROM vt GROUP BY value
), r AS (
    SELECT value, c,
           COALESCE(SUM(c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM v
), per AS (
    SELECT vt.g,
           SUM(vt.c_g) AS n_g,
           SUM(vt.c_g * (2 * r.cum_before + r.c + 1)) AS rank_sum2_g
    FROM vt JOIN r ON vt.value = r.value
    GROUP BY vt.g
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n FROM per
), dev AS (
    SELECT per.n_g, tot.n, tot.k,
           per.rank_sum2_g - per.n_g * (tot.n + 1) AS d2_g
    FROM per, tot
), devq AS (
    SELECT n_g, n, k,
           CASE WHEN d2_g < 0
                THEN -((-d2_g) * 1000000 // (n_g * (n + 1)))
                ELSE d2_g * 1000000 // (n_g * (n + 1)) END AS m_g
    FROM dev
), s AS (
    SELECT MAX(n) AS n, MAX(k) AS k,
           SUM(n_g * m_g * m_g) AS s_q
    FROM devq
), ties AS (
    SELECT SUM(c * c * c - c) AS t3 FROM v
), fin AS (
    SELECT k, n, t3,
           3.0 * (CAST(n AS DOUBLE) + 1.0) * CAST(s_q AS DOUBLE)
               / (CAST(n AS DOUBLE) * 1e12) AS h,
           n * n * n - n AS n3
    FROM s, ties
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_total,
       ROUND(h, 4) AS h_stat,
       CASE WHEN n3 - t3 = 0 THEN NULL
            ELSE ROUND(h * CAST(n3 AS DOUBLE) / CAST(n3 - t3 AS DOUBLE), 4)
            END AS h_tie_adj,
       CASE WHEN n3 - t3 = 0 THEN NULL
            ELSE ROUND(h * CAST(n3 AS DOUBLE) / CAST(n3 - t3 AS DOUBLE)
             / (CAST(n AS DOUBLE) - 1.0), 6) END AS eps_sq
FROM fin
"""


@register(
    "stat_kruskal_wallis", oracle=_KW_ORACLE, tags=("profile", "experiment")
)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across the five event types on event value — the
    rank-based (distribution-free) counterpart of `stat_anova_oneway`,
    completing the k-group row of the test matrix the same way
    `stat_mann_whitney` completes the 2-group row: use it when the
    per-arm value distributions are heavy-tailed and the ANOVA's
    equal-variance normal model misleads.

    Same exact-midrank machinery as `stat_mann_whitney`: the facts fold
    to a distinct-value grain carrying per-(value, group) counts, exact
    DOUBLED midranks come from the two-phase distributed prefix sum
    (ranges.running_sums — no global row sort at any scale), and the
    per-group rank sums stay integral. The group deviation from the
    grand mean rank is then quantized to micro-units through ONE
    bounded truncating division — the Brier m_k pattern
    (ml_eval.py:2178) — so Σ n_g·m_g² is exact integer algebra at any
    n: no quotient in the plan grows with the data (the naive
    Σ R_g²/n_g form wraps its numerator at N⁴). H and the tie-corrected
    H/(1 − ΣT/(N³−N)) exit through one shared double expression,
    mirrored token-for-token in the oracle. Width budget: the doubled
    rank sums and N³−N ride DECIMAL — exact to N≈3e12 rows (beyond
    100 TB of events); past that decimal overflow is a LOUD null,
    never a wrap.

    Scale shape: one map-side-combined groupBy to the distinct-value
    grain, the prefix sum over that grain, one equi-join back (both
    sides the same grain), then k-row folds. Skew-immune: no key sees
    more than its share of distinct values."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events")
    vt = ev.groupBy("value", F.col("event_type").alias("g")).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c_g")
    )
    v = vt.groupBy("value").agg(
        F.sum("c_g").cast("decimal(20,0)").alias("c")
    )
    r = running_sums(v, ["value"], {"cum_before": ("c", False)})
    per = (
        vt.join(r, "value")
        .groupBy("g")
        .agg(
            F.sum("c_g").cast("decimal(20,0)").alias("n_g"),
            F.sum(
                F.col("c_g")
                * (2 * F.col("cum_before") + F.col("c") + 1)
            )
            .cast("decimal(32,0)")
            .alias("rank_sum2_g"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("decimal(20,0)").alias("n"),
    )
    # |m_g| < 1e6 by construction (|d2_g| < n_g·(N+1)), so the LONG
    # quotient of `div` is output-scale — never 'huge div small'.
    devq = (
        per.crossJoin(F.broadcast(tot))
        .withColumn(
            "d2_g",
            F.expr("CAST(rank_sum2_g - n_g * (n + 1) AS DECIMAL(38,0))"),
        )
        .withColumn(
            "m_g",
            F.expr(
                "(CASE WHEN d2_g < 0 THEN -1 ELSE 1 END) *"
                " (CAST(abs(d2_g) * 1000000 AS DECIMAL(38,0))"
                "  div CAST(n_g * (n + 1) AS DECIMAL(38,0)))"
            ),
        )
    )
    s = devq.agg(
        F.max("k").alias("k"),
        F.max("n").alias("n"),
        F.sum(F.expr("CAST(n_g * (m_g * m_g) AS DECIMAL(38,0))")).alias(
            "s_q"
        ),
    )
    ties = v.agg(
        F.sum(
            F.expr(
                "CAST(CAST(c AS DECIMAL(13,0)) * CAST(c AS DECIMAL(13,0))"
                " * CAST(c AS DECIMAL(13,0)) - c AS DECIMAL(38,0))"
            )
        ).alias("t3")
    )
    fin = (
        s.crossJoin(F.broadcast(ties))
        .withColumn(
            "h",
            F.expr(
                "3.0 * (CAST(n AS DOUBLE) + 1.0) * CAST(s_q AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * 1e12)"
            ),
        )
        .withColumn(
            "n3",
            F.expr(
                "CAST(CAST(n AS DECIMAL(13,0)) * CAST(n AS DECIMAL(13,0))"
                " * CAST(n AS DECIMAL(13,0)) - n AS DECIMAL(38,0))"
            ),
        )
    )
    # n3 = t3 when the corpus has ONE distinct value (all ties): the
    # tie correction's denominator is 0 — NULL adjusted outputs on both
    # engines rather than an ANSI DIVIDE_BY_ZERO (h_stat itself is a
    # well-defined 0 there and stays).
    return fin.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        F.round("h", 4).alias("h_stat"),
        F.expr(
            "CASE WHEN n3 - t3 = 0 THEN NULL ELSE"
            " ROUND(h * CAST(n3 AS DOUBLE) / CAST(n3 - t3 AS DOUBLE), 4)"
            " END"
        ).alias("h_tie_adj"),
        F.expr(
            "CASE WHEN n3 - t3 = 0 THEN NULL ELSE"
            " ROUND(h * CAST(n3 AS DOUBLE) / CAST(n3 - t3 AS DOUBLE)"
            " / (CAST(n AS DOUBLE) - 1.0), 6) END"
        ).alias("eps_sq"),
    )


_JB_ORACLE = """
WITH mu AS (
    SELECT event_type, AVG(value) AS m, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
), cm AS (
    SELECT e.event_type, MAX(mu.n) AS n,
           AVG(POW(e.value - mu.m, 2)) AS m2,
           AVG(POW(e.value - mu.m, 3)) AS m3,
           AVG(POW(e.value - mu.m, 4)) AS m4
    FROM events e JOIN mu ON e.event_type = mu.event_type
    GROUP BY e.event_type
), fin AS (
    SELECT event_type, n,
           CASE WHEN m2 = 0 THEN NULL ELSE m3 / POW(m2, 1.5) END AS g1,
           CASE WHEN m2 = 0 THEN NULL ELSE m4 / POW(m2, 2) - 3 END AS g2
    FROM cm
)
SELECT event_type, n,
       ROUND(g1, 4) AS skew_g1,
       ROUND(g2, 4) AS kurt_excess,
       ROUND(n * (g1 * g1 / 6.0 + g2 * g2 / 24.0), 4) AS jb_stat,
       ROUND(EXP(-(n * (g1 * g1 / 6.0 + g2 * g2 / 24.0)) / 2.0), 6)
           AS p_chi2_df2
FROM fin
"""


@register("stat_jarque_bera", oracle=_JB_ORACLE, tags=("profile",))
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test per event type — the moment-based
    gate that decides WHICH test applies: if JB rejects normality, the
    readout should come from `stat_mann_whitney`/`stat_kruskal_wallis`
    instead of the t/F tests. JB = n·(g1²/6 + g2²/24) over skewness g1
    and excess kurtosis g2; because JB is asymptotically χ²(2) and the
    χ²(2) survival function is closed-form, the p-value is EXACT
    algebra — p = exp(−JB/2) — with no CDF table or library call, one
    of the few classical tests where the engine can emit a true
    p-value from built-ins alone.

    Moments come from the same two-pass centered fold as
    `agg_moments_shape` (single-pass E[x⁴] expansion cancels
    catastrophically at large means; the per-group mean joins back as
    a broadcast). ROUND(4)/ROUND(6) absorbs hash-agg summation order
    on the double folds — the same budget as agg_moments_shape, which
    this query deliberately shares its estimator conventions with
    (population g-forms, NOT the engines' disagreeing built-ins).

    Scale shape: two map-side-combined aggregates of the fact table to
    k rows each with a broadcast join between them; nothing downstream
    of the second reduce depends on n."""
    ev = load(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("value") - F.col("m")
    cm = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.avg(F.pow(d, 2)).alias("m2"),
            F.avg(F.pow(d, 3)).alias("m3"),
            F.avg(F.pow(d, 4)).alias("m4"),
        )
    )
    # m2 = 0 (a constant-value group) leaves skew/kurtosis undefined —
    # NULL through, matching the oracle's CASE (ANSI degenerate class).
    nul = F.lit(None).cast("double")
    g1 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m3") / F.pow(F.col("m2"), 1.5)
    )
    g2 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m4") / F.pow(F.col("m2"), 2) - 3
    )
    jb = F.col("n") * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
    return cm.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(g1, 4).alias("skew_g1"),
        F.round(g2, 4).alias("kurt_excess"),
        F.round(jb, 4).alias("jb_stat"),
        F.round(F.exp(-jb / 2.0), 6).alias("p_chi2_df2"),
    )


_CA_ORACLE = """
WITH d AS (
    SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
           CAST(o_orderstatus = 'F' AS BIGINT) AS y
    FROM orders
), per AS (
    SELECT w, CAST(COUNT(*) AS HUGEINT) AS n_k,
           CAST(SUM(y) AS HUGEINT) AS r_k
    FROM d GROUP BY w
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           SUM(n_k) AS n, SUM(r_k) AS r,
           SUM(w * r_k) AS swr, SUM(w * n_k) AS swn,
           SUM(w * w * n_k) AS swwn
    FROM per
), fin AS (
    SELECT k, n, r,
           n * swr - r * swn AS num,
           n * swwn - swn * swn AS vnum
    FROM tot
)
SELECT k AS k_doses,
       CAST(n AS BIGINT) AS n_total,
       CAST(r AS BIGINT) AS n_pos,
       CASE WHEN r = 0 OR r = n OR vnum = 0 THEN NULL
            ELSE ROUND(CAST(num AS DOUBLE)
             / SQRT(CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)
                    * CAST(vnum AS DOUBLE) / CAST(n AS DOUBLE)), 4)
            END AS z_trend
FROM fin
"""


@register(
    "stat_cochran_armitage", oracle=_CA_ORACLE, tags=("profile", "experiment")
)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend-in-proportions test: does the fulfilled
    rate rise or fall MONOTONICALLY with order priority (the ordinal
    dose 1-URGENT … 5-LOW)? The chi-square test (`stat_chi_square`)
    only answers "is there ANY association"; when the grouping is
    ordered, the 1-df trend test concentrates all its power on the
    monotone alternative — the standard dose-response readout for
    tiered experiments (priority tiers, price tiers, exposure counts).

    All sufficient statistics are exact integers from ONE map-side-
    combined aggregate to k dose rows: n_k, r_k, and the weighted sums
    Σw·r, Σw·n, Σw²·n. The z numerator N·Σwr − R·Σwn and variance core
    N·Σw²n − (Σwn)² stay in DECIMAL (exact to ~1e18 rows — far beyond
    100 TB; loud null past that), and z exits through one shared
    double expression mirrored token-for-token in the oracle. Scale
    shape: one scan → k rows → 1 row; skew-immune (no keyed shuffle at
    all beyond the k-row hash agg)."""
    d = load(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("w"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    per = d.groupBy("w").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n_k"),
        F.sum("y").cast("decimal(20,0)").alias("r_k"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_k").cast("decimal(20,0)").alias("n"),
        F.sum("r_k").cast("decimal(20,0)").alias("r"),
        F.sum(F.expr("w * r_k")).cast("decimal(24,0)").alias("swr"),
        F.sum(F.expr("w * n_k")).cast("decimal(24,0)").alias("swn"),
        F.sum(F.expr("w * w * n_k")).cast("decimal(26,0)").alias("swwn"),
    )
    fin = tot.select(
        "k",
        "n",
        "r",
        F.expr("CAST(n * swr - r * swn AS DECIMAL(38,0))").alias("num"),
        F.expr("CAST(n * swwn - swn * swn AS DECIMAL(38,0))").alias("vnum"),
    )
    # Degenerate exact-integer exits (r13 probe): a single-class outcome
    # (r = 0 or r = n — e.g. every order fulfilled) or a single dose
    # level (vnum = 0) zeroes the variance — NULL z, not an ANSI raise.
    return fin.select(
        F.col("k").alias("k_doses"),
        F.col("n").cast("long").alias("n_total"),
        F.col("r").cast("long").alias("n_pos"),
        F.expr(
            "CASE WHEN r = 0 OR r = n OR vnum = 0 THEN NULL"
            " ELSE ROUND(CAST(num AS DOUBLE)"
            " / SQRT(CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE)"
            "        * CAST(vnum AS DOUBLE) / CAST(n AS DOUBLE)), 4) END"
        ).alias("z_trend"),
    )


_THEILSEN_ORACLE = """
WITH daily AS (
    SELECT event_type AS g,
           CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS x,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
), pairs AS (
    SELECT a.g,
           CASE WHEN b.y - a.y < 0
                THEN -((a.y - b.y) * 1000000 // (b.x - a.x))
                ELSE (b.y - a.y) * 1000000 // (b.x - a.x) END AS slope
    FROM daily a JOIN daily b ON a.g = b.g AND a.x < b.x
)
SELECT g AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       MEDIAN(slope) AS sen_slope_micros,
       CAST(SUM(CASE WHEN slope > 0 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS pos_share_micros
FROM pairs GROUP BY g
"""


@register("agg_theil_sen_slope", oracle=_THEILSEN_ORACLE, tags=("profile",))
def agg_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the median of all pairwise
    slopes of daily revenue — the estimator that tolerates up to ~29%
    arbitrarily corrupted days where OLS (`agg_regression_stats`,
    `agg_slope_builtin`) is dragged by a single outlier day. Reported
    with the positive-slope share, the Mann–Kendall-adjacent direction
    signal (`stat_trend_mann_kendall` tests the same monotonicity on
    the raw sequence).

    The deliberate scale inversion: Theil–Sen is O(m²) in SERIES LENGTH,
    so the engine aggregates FIRST — the fact table folds to the
    (group × day) grain with one map-side-combined reduce (exact cent
    sums via the decimal cast, the _PERM_ORACLE convention), and only
    that bounded grain self-joins (30 days → 435 pairs per group at ANY
    row count; a year is ~66k pairs — still constant w.r.t. data
    volume). Pairwise-on-facts would be quadratic; pairwise-on-days is
    free. Slopes quantize to exact micro-units through a sign-split
    truncating division (both engines truncate toward zero on the
    positive branch), and the median of those integers interpolates
    identically (verified: both return the (a+b)/2 double), so the exit
    is deterministic."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("g"),
            F.expr("CAST(value AS DECIMAL(12,2))").alias("v"),
            epoch_s("ts").alias("es"),
        )
        .groupBy("g", F.expr("es div 86400").alias("x"))
        .agg(
            F.sum(F.expr("CAST(v * 100 AS BIGINT)"))
            .cast("long")
            .alias("y")
        )
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.g").alias("g"),
        F.expr(
            "CASE WHEN b.y - a.y < 0"
            " THEN -((a.y - b.y) * 1000000 div (b.x - a.x))"
            " ELSE (b.y - a.y) * 1000000 div (b.x - a.x) END"
        ).alias("slope"),
    )
    return pairs.groupBy(F.col("g").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.median("slope").alias("sen_slope_micros"),
        F.expr(
            "CAST(SUM(CASE WHEN slope > 0 THEN 1 ELSE 0 END) * 1000000"
            " div COUNT(1) AS BIGINT)"
        ).alias("pos_share_micros"),
    )


#: SRM chi-square saturation cap (milli-units) — same convention as
#: ANOVA_F_CAP: a degenerate split yields a huge but meaningless
#: statistic; saturate loudly instead of overflowing silently.
SRM_CHI2_CAP = 10_000_000_000

_SRM_ORACLE = f"""
WITH arms AS (
    SELECT CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 2 = 0 AS BIGINT) AS t
    FROM events
), s AS (
    SELECT CAST(SUM(t) AS HUGEINT) AS n_t,
           CAST(SUM(1 - t) AS HUGEINT) AS n_c,
           CAST(COUNT(*) AS HUGEINT) AS n
    FROM arms
)
SELECT CAST(n_t AS BIGINT) AS n_treat,
       CAST(n_c AS BIGINT) AS n_ctrl,
       CAST(LEAST((n_t - n_c) * (n_t - n_c) * 1000 // n,
                  {SRM_CHI2_CAP}) AS BIGINT) AS chi2_milli,
       CAST((n_t - n_c) * (n_t - n_c) * 1000 // n > 3841 AS BIGINT)
           AS srm_flag
FROM s
"""


@register("stat_srm_check", oracle=_SRM_ORACLE, tags=("experiment",))
def stat_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail for the 50/50 md5 assignment —
    the FIRST check every experimentation platform runs before reading
    any metric (Fabijan et al. 2019: SRM invalidates the experiment, and
    it happens constantly — bot filtering, logging loss, redirect skew).
    For an expected 1:1 split the goodness-of-fit chi-square collapses
    to (n_t − n_c)²/n with 1 df; the query emits it in exact milli-units
    plus the α=0.05 flag (critical value 3.841 — an integer-vs-constant
    comparison, no CDF needed).

    The statistic's quotient grows with the imbalance (a degenerate
    all-one-arm split gives χ² = n), so it SATURATES at SRM_CHI2_CAP via
    LEAST — the ANOVA_F_CAP convention: loud ceiling, never a wrapped
    long. One keyless map-side-combined fold; skew-free by construction.

    This also audits the engine's own split machinery: every fold-based
    query here trusts portable_bucket to be fair, and this is the query
    that would catch it lying (the planted test feeds it a rigged split
    and requires the flag to fire)."""
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    arms = load(spark, sf_dir, "events").select(
        (portable_bucket(F.col("event_id"), 2) == 0).cast("long").alias("t")
    )
    s = arms.agg(
        F.sum("t").cast("decimal(20,0)").alias("n_t"),
        F.sum(1 - F.col("t")).cast("decimal(20,0)").alias("n_c"),
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n"),
    )
    chi2 = (
        "CAST((n_t - n_c) * (n_t - n_c) AS DECIMAL(38,0)) * 1000 div n"
    )
    return s.select(
        F.col("n_t").cast("long").alias("n_treat"),
        F.col("n_c").cast("long").alias("n_ctrl"),
        F.expr(f"LEAST({chi2}, {SRM_CHI2_CAP})").cast("long").alias(
            "chi2_milli"
        ),
        F.expr(f"({chi2}) > 3841").cast("long").alias("srm_flag"),
    )


#: TOST equivalence margin: ±5% of the grand mean (relative margins are
#: the normal pre-registration for value metrics), and the large-sample
#: z critical value for the two one-sided 5% tests.
TOST_MARGIN_PCT = 5
TOST_Z_CRIT = 1.645

_TOST_ORACLE = f"""
WITH g AS (
    SELECT
        CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_a,
        AVG(CASE WHEN event_type = 'click' THEN value END)               AS m_a,
        VAR_SAMP(CASE WHEN event_type = 'click' THEN value END)          AS v_a,
        CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_b,
        AVG(CASE WHEN event_type = 'purchase' THEN value END)            AS m_b,
        VAR_SAMP(CASE WHEN event_type = 'purchase' THEN value END)       AS v_b,
        AVG(CASE WHEN event_type IN ('click', 'purchase') THEN value END)
            AS grand_mean
    FROM events
), f AS (
    SELECT n_a, n_b,
           m_a - m_b AS diff,
           SQRT(v_a / n_a + v_b / n_b) AS se,
           grand_mean * {TOST_MARGIN_PCT} / 100.0 AS margin
    FROM g
)
SELECT n_a, n_b,
       ROUND(diff, 4) AS mean_diff,
       ROUND(margin, 4) AS margin,
       CASE WHEN se = 0 THEN NULL
            ELSE ROUND((diff + margin) / se, 4) END AS t_lower,
       CASE WHEN se = 0 THEN NULL
            ELSE ROUND((diff - margin) / se, 4) END AS t_upper,
       CASE WHEN se = 0 THEN 0
            ELSE CAST((diff + margin) / se > {TOST_Z_CRIT}
                 AND (diff - margin) / se < -{TOST_Z_CRIT} AS BIGINT)
            END AS equivalent
FROM f
"""


@register("stat_tost_equivalence", oracle=_TOST_ORACLE, tags=("experiment",))
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests, Schuirmann 1987) for
    click vs purchase value: the readout `stat_ttest_welch` CANNOT give
    you — "the arms are the same" is not the absence of significance
    (absence of evidence ≠ evidence of absence); equivalence requires
    BOTH one-sided tests to reject at the pre-registered margin. The
    margin here is ±5% of the grand mean (the standard relative
    pre-registration for value metrics) and the critical value is the
    large-sample z — documented, not hidden, because equivalence claims
    live and die by these two constants.

    Same single-scan sufficient-statistics fold as the Welch test (one
    keyless map-side-combined aggregate), with the two t-statistics and
    the margin exiting through shared double expressions mirrored in the
    oracle; the `equivalent` flag compares identically-derived doubles
    against the same literal on both engines, so it cannot knife-edge.
    ROUND(4) on reported floats is display-only."""
    ev = load(spark, sf_dir, "events")
    a = F.when(F.col("event_type") == "click", F.col("value"))
    b = F.when(F.col("event_type") == "purchase", F.col("value"))
    both = F.when(
        F.col("event_type").isin("click", "purchase"), F.col("value")
    )
    g = ev.agg(
        F.count(a).cast("long").alias("n_a"),
        F.avg(a).alias("m_a"),
        F.var_samp(a).alias("v_a"),
        F.count(b).cast("long").alias("n_b"),
        F.avg(b).alias("m_b"),
        F.var_samp(b).alias("v_b"),
        F.avg(both).alias("grand_mean"),
    )
    f = g.select(
        "n_a",
        "n_b",
        (F.col("m_a") - F.col("m_b")).alias("diff"),
        F.sqrt(F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")).alias(
            "se"
        ),
        (F.col("grand_mean") * TOST_MARGIN_PCT / 100.0).alias("margin"),
    )
    # se = 0 (constant values both arms): the one-sided t's are
    # undefined — NULL t's and a conservative non-equivalent flag on
    # both engines (the ANSI degenerate class; an equivalence CLAIM from
    # a zero-variance fixture would be vacuous, so 0 is the honest flag).
    nul = F.lit(None).cast("double")
    return f.select(
        "n_a",
        "n_b",
        F.round("diff", 4).alias("mean_diff"),
        F.round("margin", 4).alias("margin"),
        F.when(F.col("se") == 0, nul)
        .otherwise(
            F.round((F.col("diff") + F.col("margin")) / F.col("se"), 4)
        )
        .alias("t_lower"),
        F.when(F.col("se") == 0, nul)
        .otherwise(
            F.round((F.col("diff") - F.col("margin")) / F.col("se"), 4)
        )
        .alias("t_upper"),
        F.when(F.col("se") == 0, F.lit(0))
        .otherwise(
            (
                ((F.col("diff") + F.col("margin")) / F.col("se")
                 > TOST_Z_CRIT)
                & ((F.col("diff") - F.col("margin")) / F.col("se")
                   < -TOST_Z_CRIT)
            ).cast("int")
        )
        .cast("long")
        .alias("equivalent"),
    )


_HOLM_ORACLE = """
WITH mu AS (
    SELECT event_type, AVG(value) AS m, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
), cm AS (
    SELECT e.event_type, MAX(mu.n) AS n,
           AVG(POW(e.value - mu.m, 2)) AS m2,
           AVG(POW(e.value - mu.m, 3)) AS m3,
           AVG(POW(e.value - mu.m, 4)) AS m4
    FROM events e JOIN mu ON e.event_type = mu.event_type
    GROUP BY e.event_type
), pv AS (
    SELECT event_type,
           CASE WHEN m2 = 0 THEN NULL
                ELSE EXP(-(n * (POW(m3 / POW(m2, 1.5), 2) / 6.0
                           + POW(m4 / POW(m2, 2) - 3, 2) / 24.0)) / 2.0)
                END AS p
    FROM cm
), ranked AS (
    SELECT event_type, p,
           CAST(ROW_NUMBER() OVER (ORDER BY p, event_type) AS BIGINT) AS rnk,
           CAST(COUNT(*) OVER () AS BIGINT) AS k
    FROM pv WHERE p IS NOT NULL
), adjusted AS (
    SELECT event_type, p, rnk, k,
           MAX(LEAST((k - rnk + 1) * p, 1.0)) OVER (
               ORDER BY rnk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS p_holm
    FROM ranked
)
SELECT event_type,
       ROUND(p, 6) AS p_raw,
       CAST(rnk AS BIGINT) AS p_rank,
       ROUND(p_holm, 6) AS p_holm,
       CAST(p_holm < 0.05 AS BIGINT) AS reject_05
FROM adjusted
UNION ALL
SELECT event_type,
       CAST(NULL AS DOUBLE) AS p_raw,
       CAST(NULL AS BIGINT) AS p_rank,
       CAST(NULL AS DOUBLE) AS p_holm,
       CAST(NULL AS BIGINT) AS reject_05
FROM pv WHERE p IS NULL
"""


@register(
    "stat_holm_bonferroni", oracle=_HOLM_ORACLE, tags=("profile", "experiment")
)
def stat_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holm–Bonferroni step-down correction over the per-group
    Jarque–Bera p-values — the multiple-testing discipline the engine's
    OTHER tests feed into: running k tests at α=0.05 inflates the
    family-wise error to 1−0.95^k, and Holm (1979) controls it
    uniformly-more-powerfully than plain Bonferroni with zero extra
    assumptions. Adjusted p = running MAX over the sorted sequence of
    (k−rank+1)·p, clamped at 1 — the step-down monotonicity is the part
    naive implementations drop, and the planted test pins it.

    Reuses stat_jarque_bera's exact-p machinery (χ²(2) survival =
    exp(−JB/2)); ranking, the cumulative max, and the flags run on the
    k-row AGGREGATE (k = |event types|), so the only data-sized stages
    are the two moment folds. Ties in p break on event_type for a
    deterministic rank on both engines."""
    ev = load(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("value") - F.col("m")
    cm = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.avg(F.pow(d, 2)).alias("m2"),
            F.avg(F.pow(d, 3)).alias("m3"),
            F.avg(F.pow(d, 4)).alias("m4"),
        )
    )
    # m2 = 0 (a constant-value group) leaves skew/kurtosis undefined —
    # NULL through, matching the oracle's CASE (ANSI degenerate class).
    nul = F.lit(None).cast("double")
    g1 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m3") / F.pow(F.col("m2"), 1.5)
    )
    g2 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m4") / F.pow(F.col("m2"), 2) - 3
    )
    jb = F.col("n") * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
    pv = cm.select("event_type", F.exp(-jb / 2.0).alias("p"))
    # NULL-p groups (m2 = 0 → undefined test) are excluded from BOTH the
    # rank and k, then re-attached with NULL adjusted columns: Spark
    # sorts NULLs first while DuckDB sorts them last, so ranking over
    # them diverges cross-engine AND hands an undefined test rank 1
    # (ADVICE r13). k must not count tests that were never run.
    valid = pv.where(F.col("p").isNotNull())
    w_rank = Window.orderBy(F.asc("p"), F.asc("event_type"))
    ranked = valid.select(
        "event_type",
        "p",
        F.row_number().over(w_rank).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("k"),
    )
    w_cum = Window.orderBy("rnk").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adjusted = ranked.withColumn(
        "p_holm",
        F.max(
            F.least((F.col("k") - F.col("rnk") + 1) * F.col("p"), F.lit(1.0))
        ).over(w_cum),
    )
    return adjusted.select(
        "event_type",
        F.round("p", 6).alias("p_raw"),
        F.col("rnk").alias("p_rank"),
        F.round("p_holm", 6).alias("p_holm"),
        (F.col("p_holm") < 0.05).cast("long").alias("reject_05"),
    ).unionByName(
        pv.where(F.col("p").isNull()).select(
            "event_type",
            F.lit(None).cast("double").alias("p_raw"),
            F.lit(None).cast("long").alias("p_rank"),
            F.lit(None).cast("double").alias("p_holm"),
            F.lit(None).cast("long").alias("reject_05"),
        )
    )


_OVERDISP_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
), s AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM daily GROUP BY event_type
), f AS (
    SELECT event_type, n_days, sy,
           CASE WHEN n_days < 2 THEN NULL
                ELSE (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_days)
                     / (n_days - 1) END AS var_s,
           CAST(sy AS DOUBLE) / n_days AS mean_s
    FROM s
)
SELECT event_type, n_days,
       ROUND(mean_s, 4) AS mean_daily,
       ROUND(var_s, 4) AS var_daily,
       CASE WHEN var_s IS NULL THEN NULL
            ELSE ROUND(var_s / mean_s, 4) END AS dispersion_index,
       CASE WHEN var_s IS NULL THEN NULL
            ELSE ROUND((n_days - 1) * var_s / mean_s, 4) END
           AS poisson_gof_chi2,
       CASE WHEN var_s IS NULL THEN NULL
            ELSE CAST(var_s / mean_s > 1.0 + 2.0 * SQRT(2.0 / (n_days - 1))
                      AS BIGINT) END AS overdispersed
FROM f
"""


@register(
    "stat_overdispersion_index",
    oracle=_OVERDISP_ORACLE,
    tags=("profile", "timeseries"),
)
def stat_overdispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostic for daily event counts per type — the
    gate that decides whether a Poisson model is even admissible: under
    Poisson, Var = Mean, so the dispersion index Var/Mean ≈ 1 and
    (n−1)·Var/Mean is χ²(n−1) (the classical Poisson goodness-of-fit /
    Fisher dispersion test). Real traffic is almost always
    overdispersed (bursts, weekly cycles, mixtures), which is why count
    models default to negative binomial — but "almost always" is
    exactly the claim this query measures instead of assumes. The flag
    uses the two-sigma normal approximation of the index under H₀
    (sd ≈ √(2/(n−1))), stated in the expression rather than hidden.

    Counts are exact integers over the (type × day) grain (one
    map-side-combined fold), the index and GOF statistic exit through
    shared double expressions, and the flag compares identically-derived
    doubles. Constant-size after the first reduce."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select("event_type", epoch_s("ts").alias("es"))
        .groupBy("event_type", F.expr("es div 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(19,0)) * y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    # n_days < 2 (an event type whose rows all land on one day) must not
    # reach the n_days - 1 division: ANSI Spark raises DIVIDE_BY_ZERO where
    # DuckDB NULLs — pin NULL variance/index/GOF/flag on both engines.
    # Same degenerate class as the Welch-t / Jarque-Bera guards. mean_s
    # needs no guard (n_days >= 1 by the groupBy; daily counts >= 1).
    f = s.select(
        "event_type",
        "n_days",
        F.expr(
            "CASE WHEN n_days < 2 THEN NULL"
            " ELSE (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n_days)"
            " / (n_days - 1) END"
        ).alias("var_s"),
        F.expr("CAST(sy AS DOUBLE) / n_days").alias("mean_s"),
    )
    return f.select(
        "event_type",
        "n_days",
        F.round("mean_s", 4).alias("mean_daily"),
        F.round("var_s", 4).alias("var_daily"),
        F.expr(
            "CASE WHEN var_s IS NULL THEN NULL"
            " ELSE ROUND(var_s / mean_s, 4) END"
        ).alias("dispersion_index"),
        F.expr(
            "CASE WHEN var_s IS NULL THEN NULL"
            " ELSE ROUND((n_days - 1) * var_s / mean_s, 4) END"
        ).alias("poisson_gof_chi2"),
        F.expr(
            "CASE WHEN var_s IS NULL THEN NULL"
            " ELSE CAST(var_s / mean_s > 1.0 + 2.0 * SQRT(2.0 / (n_days - 1))"
            " AS LONG) END"
        ).alias("overdispersed"),
    )


_BH_ORACLE = """
WITH mu AS (
    SELECT event_type, AVG(value) AS m, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
), cm AS (
    SELECT e.event_type, MAX(mu.n) AS n,
           AVG(POW(e.value - mu.m, 2)) AS m2,
           AVG(POW(e.value - mu.m, 3)) AS m3,
           AVG(POW(e.value - mu.m, 4)) AS m4
    FROM events e JOIN mu ON e.event_type = mu.event_type
    GROUP BY e.event_type
), pv AS (
    SELECT event_type,
           CASE WHEN m2 = 0 THEN NULL
                ELSE EXP(-(n * (POW(m3 / POW(m2, 1.5), 2) / 6.0
                           + POW(m4 / POW(m2, 2) - 3, 2) / 24.0)) / 2.0)
                END AS p
    FROM cm
), ranked AS (
    SELECT event_type, p,
           CAST(ROW_NUMBER() OVER (ORDER BY p, event_type) AS BIGINT) AS rnk,
           CAST(COUNT(*) OVER () AS BIGINT) AS k
    FROM pv WHERE p IS NOT NULL
), adjusted AS (
    SELECT event_type, p, rnk, k,
           MIN(LEAST(k * p / rnk, 1.0)) OVER (
               ORDER BY rnk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS p_bh
    FROM ranked
)
SELECT event_type,
       ROUND(p, 6) AS p_raw,
       CAST(rnk AS BIGINT) AS p_rank,
       ROUND(p_bh, 6) AS p_bh,
       CAST(p_bh < 0.05 AS BIGINT) AS reject_fdr_05
FROM adjusted
UNION ALL
SELECT event_type,
       CAST(NULL AS DOUBLE) AS p_raw,
       CAST(NULL AS BIGINT) AS p_rank,
       CAST(NULL AS DOUBLE) AS p_bh,
       CAST(NULL AS BIGINT) AS reject_fdr_05
FROM pv WHERE p IS NULL
"""


@register(
    "stat_benjamini_hochberg", oracle=_BH_ORACLE, tags=("profile", "experiment")
)
def stat_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg step-UP FDR adjustment over the same per-group
    Jarque–Bera p-value family `stat_holm_bonferroni` corrects — the two
    standard multiple-testing disciplines on IDENTICAL inputs, so the
    FWER-vs-FDR tradeoff is directly visible: BH's adjusted
    p = min over j ≥ rank of (k·p_j / j), clamped at 1 (the running MIN
    from the LARGEST p downward is the step-up monotonicity naive
    implementations drop; Holm's is a running MAX from the smallest).
    At 10⁴ metrics per experiment platform run, BH is what keeps
    discovery count useful while Holm goes to zero power.

    The only data-sized stages are the two moment folds (shared shape
    with stat_jarque_bera); ranking and the reverse cumulative MIN run
    on the k-row aggregate. m2 = 0 groups inherit the JB NULL guard;
    ties in p break on event_type for a deterministic rank."""
    ev = load(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("value") - F.col("m")
    cm = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.avg(F.pow(d, 2)).alias("m2"),
            F.avg(F.pow(d, 3)).alias("m3"),
            F.avg(F.pow(d, 4)).alias("m4"),
        )
    )
    nul = F.lit(None).cast("double")
    g1 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m3") / F.pow(F.col("m2"), 1.5)
    )
    g2 = F.when(F.col("m2") == 0, nul).otherwise(
        F.col("m4") / F.pow(F.col("m2"), 2) - 3
    )
    jb = F.col("n") * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
    pv = cm.select("event_type", F.exp(-jb / 2.0).alias("p"))
    # Same NULL-p discipline as stat_holm_bonferroni: undefined tests
    # (m2 = 0) are excluded from the rank and k, re-attached with NULL
    # adjusted columns (cross-engine NULL-ordering seam, ADVICE r13).
    valid = pv.where(F.col("p").isNotNull())
    w_rank = Window.orderBy(F.asc("p"), F.asc("event_type"))
    ranked = valid.select(
        "event_type",
        "p",
        F.row_number().over(w_rank).cast("long").alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("k"),
    )
    w_cum = Window.orderBy(F.desc("rnk")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    adjusted = ranked.withColumn(
        "p_bh",
        F.min(
            F.least(F.col("k") * F.col("p") / F.col("rnk"), F.lit(1.0))
        ).over(w_cum),
    )
    return adjusted.select(
        "event_type",
        F.round("p", 6).alias("p_raw"),
        F.col("rnk").alias("p_rank"),
        F.round("p_bh", 6).alias("p_bh"),
        (F.col("p_bh") < 0.05).cast("long").alias("reject_fdr_05"),
    ).unionByName(
        pv.where(F.col("p").isNull()).select(
            "event_type",
            F.lit(None).cast("double").alias("p_raw"),
            F.lit(None).cast("long").alias("p_rank"),
            F.lit(None).cast("double").alias("p_bh"),
            F.lit(None).cast("long").alias("reject_fdr_05"),
        )
    )


_MCNEMAR_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased
    FROM events GROUP BY user_id
), cells AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(clicked * (1 - purchased)) AS BIGINT) AS b,
           CAST(SUM((1 - clicked) * purchased) AS BIGINT) AS c
    FROM per_user
)
SELECT n_users, b AS click_only, c AS purchase_only,
       CASE WHEN b + c = 0 THEN NULL
            ELSE ROUND(POW(GREATEST(ABS(b - c) - 1, 0), 2) / CAST(b + c AS DOUBLE), 4)
            END AS mcnemar_chi2_cc,
       CASE WHEN b + c = 0 THEN NULL
            ELSE ROUND(2.0 * (1.0 - {{phi}}), 6) END AS p_value
FROM cells
"""


def _mcnemar_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    z = "(SQRT(POW(GREATEST(ABS(b - c) - 1, 0), 2) / CAST(b + c AS DOUBLE)))"
    return _MCNEMAR_ORACLE.format(phi=normal_cdf_sql(z))


@register(
    "stat_mcnemar", oracle=_mcnemar_oracle(), tags=("profile", "experiment")
)
def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on the paired binary outcome (user ever clicked,
    user ever purchased): do the two funnel events disagree
    symmetrically? Only the DISCORDANT cells carry information —
    b = click-without-purchase, c = purchase-without-click — and the
    continuity-corrected χ²(1) = (|b−c|−1)²/(b+c) is the classic paired
    test the unpaired chi-square (`stat_chi_square`) silently gets wrong
    on matched designs (same user in both columns). First op to use the
    engine's new shared Φ fragment (safe_stats.normal_cdf_sql, A&S
    26.2.17): p = 2·(1−Φ(√χ²)) — a real p-value with no erf in either
    engine.

    One per-user fold (map-side combined), one 1-row cell reduce; b, c
    are exact integers, χ² and p exit through shared double expressions.
    b + c = 0 (no discordant pairs) pins NULL, not an ANSI raise."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max((F.col("event_type") == "click").cast("int")).alias(
                "clicked"
            ),
            F.max((F.col("event_type") == "purchase").cast("int")).alias(
                "purchased"
            ),
        )
    )
    cells = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("clicked") * (1 - F.col("purchased")))
        .cast("long")
        .alias("b"),
        F.sum((1 - F.col("clicked")) * F.col("purchased"))
        .cast("long")
        .alias("c"),
    )
    z = "(SQRT(POW(GREATEST(ABS(b - c) - 1, 0), 2) / CAST(b + c AS DOUBLE)))"
    return cells.select(
        "n_users",
        F.col("b").alias("click_only"),
        F.col("c").alias("purchase_only"),
        F.expr(
            "CASE WHEN b + c = 0 THEN NULL"
            " ELSE ROUND(POW(GREATEST(ABS(b - c) - 1, 0), 2) / CAST(b + c AS DOUBLE), 4)"
            " END"
        ).alias("mcnemar_chi2_cc"),
        F.expr(
            "CASE WHEN b + c = 0 THEN NULL"
            f" ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(z)}), 6) END"
        ).alias("p_value"),
    )


def _two_prop_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    z = (
        "((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)"
        " / SQRT((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        " * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        " * (1.0 / n1 + 1.0 / n2)))"
    )
    se_un = (
        "SQRT((CAST(c1 AS DOUBLE) / n1) * (1.0 - CAST(c1 AS DOUBLE) / n1)"
        " / n1 + (CAST(c2 AS DOUBLE) / n2)"
        " * (1.0 - CAST(c2 AS DOUBLE) / n2) / n2)"
    )
    return f"""
WITH assigned AS (
    SELECT user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
), cells AS (
    SELECT CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS c2
    FROM assigned
)
SELECT n1, c1, n2, c2,
       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
            ELSE ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2, 6)
            END AS rate_diff,
       CASE WHEN n1 = 0 OR n2 = 0 OR c1 + c2 = 0 OR c1 + c2 = n1 + n2
            THEN NULL ELSE ROUND({z}, 4) END AS z_stat,
       CASE WHEN n1 = 0 OR n2 = 0 OR c1 + c2 = 0 OR c1 + c2 = n1 + n2
            THEN NULL
            ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f"ABS({z})")}), 6)
            END AS p_value,
       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
            WHEN {se_un} = 0 THEN NULL
            ELSE ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2
                       - 1.959963985 * {se_un}, 6) END AS ci95_lo,
       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL
            WHEN {se_un} = 0 THEN NULL
            ELSE ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2
                       + 1.959963985 * {se_un}, 6) END AS ci95_hi
FROM cells
"""


@register(
    "stat_two_proportion_z",
    oracle=_two_prop_oracle(),
    tags=("profile", "experiment"),
)
def stat_two_proportion_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test with p-value and Wald 95% CI on the
    hash-assigned A/B arms — the inference layer `ab_test_report`
    deliberately stopped short of (its docstring ends at "the z-test
    itself is a driver-side formula"; with safe_stats.normal_cdf_sql
    that formula now runs IN the engine, oracle-checked). Pooled-SE z
    for the test (the H₀-correct form), unpooled SE for the interval
    (the estimation-correct form) — the textbook pairing.

    One per-user fold, one 1-row conditional-aggregate reduce; counts
    are exact integers and every float exits through shared double
    expressions. Degenerates pinned NULL: an empty arm, an all-convert
    or no-convert pool (pooled variance 0), a zero unpooled SE."""
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    assigned = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("conv")
        )
        .select(
            (portable_bucket(F.col("user_id"), 2)).alias("variant"), "conv"
        )
    )
    cells = assigned.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("long").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("long").alias("n2"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    z = (
        "((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)"
        " / SQRT((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        " * (1.0 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))"
        " * (1.0 / n1 + 1.0 / n2)))"
    )
    se_un = (
        "SQRT((CAST(c1 AS DOUBLE) / n1) * (1.0 - CAST(c1 AS DOUBLE) / n1)"
        " / n1 + (CAST(c2 AS DOUBLE) / n2)"
        " * (1.0 - CAST(c2 AS DOUBLE) / n2) / n2)"
    )
    return cells.select(
        "n1",
        "c1",
        "n2",
        "c2",
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
            " ELSE ROUND(CAST(c1 AS DOUBLE) / n1"
            " - CAST(c2 AS DOUBLE) / n2, 6) END"
        ).alias("rate_diff"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR c1 + c2 = 0"
            " OR c1 + c2 = n1 + n2"
            f" THEN NULL ELSE ROUND({z}, 4) END"
        ).alias("z_stat"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR c1 + c2 = 0"
            " OR c1 + c2 = n1 + n2 THEN NULL"
            f" ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f'ABS({z})')}), 6)"
            " END"
        ).alias("p_value"),
        # n-guards come FIRST as their own WHEN branch: Spark evaluates
        # every operand of a single OR condition eagerly in codegen, so
        # `... OR se_un = 0` divides by an empty arm's n before the n=0
        # test can protect it (tiny-fixture probe finding).
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
            f" WHEN {se_un} = 0 THEN NULL"
            " ELSE ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2"
            f" - 1.959963985 * {se_un}, 6) END"
        ).alias("ci95_lo"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
            f" WHEN {se_un} = 0 THEN NULL"
            " ELSE ROUND(CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2"
            f" + 1.959963985 * {se_un}, 6) END"
        ).alias("ci95_hi"),
    )


def _runs_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    ez = "(2.0 * n1 * n2 / (n1 + n2) + 1.0)"
    vz = (
        "((2.0 * n1 * n2) * (2.0 * n1 * n2 - n1 - n2)"
        " / (POW(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1)))"
    )
    z = f"((r - {ez}) / SQRT({vz}))"
    return f"""
WITH daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
), med AS (
    SELECT quantile_disc(cents, 0.5) AS m FROM daily
), signs AS (
    SELECT day, CAST(cents > med.m AS BIGINT) AS s
    FROM daily, med WHERE cents <> med.m
), flagged AS (
    SELECT s, CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                   OR LAG(s) OVER (ORDER BY day) <> s
                   THEN 1 ELSE 0 END AS new_run
    FROM signs
), agg AS (
    SELECT CAST(SUM(s) AS BIGINT) AS n1,
           CAST(SUM(1 - s) AS BIGINT) AS n2,
           CAST(SUM(new_run) AS BIGINT) AS r
    FROM flagged
)
SELECT n1 AS n_above, n2 AS n_below, r AS n_runs,
       CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 OR 2 * n1 * n2 = n1 + n2 THEN NULL
            ELSE ROUND({z}, 4) END AS z_stat,
       CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 OR 2 * n1 * n2 = n1 + n2 THEN NULL
            ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f"ABS({z})")}), 6)
            END AS p_value
FROM agg
"""


@register(
    "stat_runs_test", oracle=_runs_oracle(), tags=("profile", "timeseries")
)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on daily revenue vs its median — the
    model-free "is this series random or structured" gate: too FEW runs
    of above/below-median days means positive serial dependence (trend,
    regimes — don't bootstrap i.i.d.!), too MANY means oscillation.
    Complements the parametric ACF family (`ts_autocorrelation`,
    `stat_overdispersion_index`) with a test that assumes nothing about
    the marginal distribution. Ties at the median are dropped — the
    classical convention, stated not implied.

    Exactness: daily cents fold exactly; the median is a DISCRETE
    quantile (an actual data value — engine-exact); signs, runs, n1/n2
    are exact integers from one LAG pass over the bounded day grain;
    z and p (via the shared Φ fragment) exit through shared double
    expressions. One-sign series (n1 or n2 = 0) pins NULL."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("cents")
        )
    )
    med = daily.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)"
        ).alias("m")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("cents") != F.col("m"))
        .select("day", (F.col("cents") > F.col("m")).cast("long").alias("s"))
    )
    lag_s = F.lag("s").over(Window.orderBy("day"))
    flagged = signs.select(
        "s",
        F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.agg(
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
        F.sum("new_run").cast("long").alias("r"),
    )
    ez = "(2.0 * n1 * n2 / (n1 + n2) + 1.0)"
    vz = (
        "((2.0 * n1 * n2) * (2.0 * n1 * n2 - n1 - n2)"
        " / (POW(CAST(n1 + n2 AS DOUBLE), 2) * (n1 + n2 - 1)))"
    )
    z = f"((r - {ez}) / SQRT({vz}))"
    return agg.select(
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 OR 2 * n1 * n2 = n1 + n2 THEN NULL"
            f" ELSE ROUND({z}, 4) END"
        ).alias("z_stat"),
        F.expr(
            "CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 OR 2 * n1 * n2 = n1 + n2 THEN NULL"
            f" ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f'ABS({z})')}), 6)"
            " END"
        ).alias("p_value"),
    )


def _bayes_ab_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    # Beta(1+c, 1+n-c) posterior moments — priors make every variance
    # strictly positive, so this family has NO degenerate division.
    mu = "(CAST(1 + c{i} AS DOUBLE) / (n{i} + 2))"
    var = (
        "((CAST(1 + c{i} AS DOUBLE) * (1 + n{i} - c{i}))"
        " / (POW(CAST(n{i} + 2 AS DOUBLE), 2) * (n{i} + 3)))"
    )
    mu1, mu2 = mu.format(i=1), mu.format(i=2)
    v1, v2 = var.format(i=1), var.format(i=2)
    zscore = f"(({mu2} - {mu1}) / SQRT({v1} + {v2}))"
    return f"""
WITH assigned AS (
    SELECT user_id,
           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 2 AS variant,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
), cells AS (
    SELECT CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS c2
    FROM assigned
)
SELECT n1, c1, n2, c2,
       ROUND({mu1}, 6) AS post_mean_a,
       ROUND({mu2}, 6) AS post_mean_b,
       ROUND({normal_cdf_sql(zscore)}, 6) AS prob_b_beats_a,
       CAST({normal_cdf_sql(zscore)} > 0.95 AS BIGINT) AS ship_b_95
FROM cells
"""


@register(
    "stat_bayes_ab_beta",
    oracle=_bayes_ab_oracle(),
    tags=("profile", "experiment"),
)
def stat_bayes_ab_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B readout under Beta(1,1) priors: posterior conversion
    means and P(B > A) — the decision quantity modern experiment
    platforms report INSTEAD of a p-value (a probability a PM can act
    on, valid under optional stopping where the z-test's α is not).
    P(B>A) uses the normal approximation of the two Beta posteriors
    (error O(1/n) — documented, negligible at fixture scale and beyond)
    through the shared Φ fragment; the uniform priors make every
    posterior variance strictly positive, so this is the rare statistic
    with NO degenerate division path at all.

    Same one-fold + 1-row-reduce shape as stat_two_proportion_z (the
    frequentist twin on identical cells — run both, watch them agree at
    large n and diverge honestly at small n)."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    assigned = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("conv")
        )
        .select(
            (portable_bucket(F.col("user_id"), 2)).alias("variant"), "conv"
        )
    )
    cells = assigned.agg(
        F.count(F.when(F.col("variant") == 0, 1)).cast("long").alias("n1"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.count(F.when(F.col("variant") == 1, 1)).cast("long").alias("n2"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    mu = "(CAST(1 + c{i} AS DOUBLE) / (n{i} + 2))"
    var = (
        "((CAST(1 + c{i} AS DOUBLE) * (1 + n{i} - c{i}))"
        " / (POW(CAST(n{i} + 2 AS DOUBLE), 2) * (n{i} + 3)))"
    )
    mu1, mu2 = mu.format(i=1), mu.format(i=2)
    v1, v2 = var.format(i=1), var.format(i=2)
    zscore = f"(({mu2} - {mu1}) / SQRT({v1} + {v2}))"
    phi = normal_cdf_sql(zscore)
    return cells.select(
        "n1",
        "c1",
        "n2",
        "c2",
        F.expr(f"ROUND({mu1}, 6)").alias("post_mean_a"),
        F.expr(f"ROUND({mu2}, 6)").alias("post_mean_b"),
        F.expr(f"ROUND({phi}, 6)").alias("prob_b_beats_a"),
        F.expr(f"CAST({phi} > 0.95 AS BIGINT)").cast("long").alias(
            "ship_b_95"
        ),
    )


#: χ²(df) 5% critical values for the Ljung–Box flag, df = lags actually
#: available (a short series legitimately tests fewer lags).
_LB_CRIT = {1: 3.8415, 2: 5.9915, 3: 7.8147, 4: 9.4877, 5: 11.0705,
            6: 12.5916, 7: 14.0671}
_LB_CRIT_SQL = ("CASE lags_used " + " ".join(
    f"WHEN {k} THEN {v}" for k, v in _LB_CRIT.items()) + " END")

_LJUNG_ORACLE = f"""
WITH daily AS (
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS day,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS s
    FROM daily
), dev AS (
    SELECT day, tot.n * x - tot.s AS d FROM daily, tot
), den AS (
    SELECT SUM(d * d) AS den FROM dev
), pairs AS (
    SELECT d2.day - d1.day AS lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           SUM(d1.d * d2.d) AS num
    FROM dev d1 JOIN dev d2 ON d2.day - d1.day BETWEEN 1 AND 7
    GROUP BY 1
), rho AS (
    SELECT CAST(p.lag AS INT) AS lag, p.n_pairs,
           CASE WHEN den.den = 0 THEN NULL
                ELSE CAST(p.num AS DOUBLE) / CAST(den.den AS DOUBLE)
                END AS rho,
           CAST(tot.n AS BIGINT) AS nd
    FROM pairs p, den, tot
), q AS (
    SELECT lag, n_pairs, rho, nd,
           CAST(COUNT(*) OVER () AS BIGINT) AS lags_used,
           SUM(rho * rho / (nd - lag)) OVER () * nd * (nd + 2) AS q_stat
    FROM rho
)
SELECT lag, n_pairs,
       ROUND(rho, 6) AS rho,
       ROUND(q_stat, 4) AS q_stat,
       lags_used,
       CASE WHEN q_stat IS NULL THEN NULL
            ELSE CAST(q_stat > {_LB_CRIT_SQL} AS BIGINT) END AS reject_5pct
FROM q
ORDER BY lag
"""


@register(
    "stat_ljung_box", oracle=_LJUNG_ORACLE, tags=("profile", "timeseries")
)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test on daily event volume: are the first 7
    autocorrelations JOINTLY zero? Q = n(n+2)·Σ ρ̂²ₖ/(n−k) ~ χ²(K) under
    white noise — the standard residual-diagnostic gate after any
    forecast fit (`ts_holt_*`, `ml_backtest_forecast`): per-lag ACF
    (`ts_autocorrelation`) eyeballs one lag at a time; Ljung–Box prices
    the family with one number and a 5% flag (per-df critical values as
    documented literals).

    Exact-integer core: daily counts are exact, deviations are scaled by
    n (dev = n·x − S, avoiding the fractional mean entirely), and every
    num/den is an exact HUGEINT/decimal sum from an equi-join of the
    bounded day grain against a 7-row lag spine — no window over facts,
    no float until the shared ρ/Q exit. A constant series (den = 0,
    exactly, on both engines) pins NULL ρ and Q."""
    from recommendation_system_big_data_spark.catalog import epoch_s

    daily = (
        load(spark, sf_dir, "events")
        .select(epoch_s("ts").alias("es"))
        .groupBy(F.expr("es div 86400").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(12,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(19,0)")).cast("decimal(24,0)").alias(
            "s"
        ),
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        F.expr("CAST(n * x - s AS DECIMAL(26,0))").alias("d"),
        F.col("n").cast("long").alias("nd"),
    )
    den = dev.agg(
        F.sum(F.expr("CAST(d * d AS DECIMAL(38,0))")).alias("den")
    )
    spine = (
        dev.sparkSession.range(1, 8)
        .select(F.col("id").alias("lag"))
    )
    d2 = dev.select(F.col("day").alias("day2"), F.col("d").alias("e"))
    pairs = (
        dev.crossJoin(F.broadcast(spine))
        .withColumn("day2", F.col("day") + F.col("lag"))
        .join(d2, "day2")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.expr("CAST(d * e AS DECIMAL(38,0))")).alias("num"),
            F.max("nd").alias("nd"),
        )
    )
    rho = pairs.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.expr(
            "CASE WHEN den = 0 THEN NULL"
            " ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END"
        ).alias("rho"),
        "nd",
    )
    w = Window.partitionBy()
    q = rho.select(
        "lag",
        "n_pairs",
        "rho",
        "nd",
        F.count(F.lit(1)).over(w).cast("long").alias("lags_used"),
        (
            F.sum(
                F.col("rho") * F.col("rho") / (F.col("nd") - F.col("lag"))
            ).over(w)
            * F.col("nd")
            * (F.col("nd") + 2)
        ).alias("q_stat"),
    )
    return q.select(
        "lag",
        "n_pairs",
        F.round("rho", 6).alias("rho"),
        F.round("q_stat", 4).alias("q_stat"),
        "lags_used",
        F.expr(
            "CASE WHEN q_stat IS NULL THEN NULL"
            f" ELSE CAST(q_stat > {_LB_CRIT_SQL} AS BIGINT) END"
        ).alias("reject_5pct"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# round-14 session additions
# ---------------------------------------------------------------------------


def _kendall_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    z = (
        "(3.0 * (c - d) / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
        " / 2.0))"
    )
    return f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1
), pairs AS (
    SELECT CASE WHEN b.rev > a.rev THEN 1 WHEN b.rev < a.rev THEN -1
                ELSE 0 END
         * CASE WHEN b.cnt > a.cnt THEN 1 WHEN b.cnt < a.cnt THEN -1
                ELSE 0 END AS prod
    FROM daily a JOIN daily b ON b.day > a.day
), cd AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN prod = 1 THEN 1 END), 0) AS BIGINT)
               AS c,
           CAST(COALESCE(SUM(CASE WHEN prod = -1 THEN 1 END), 0) AS BIGINT)
               AS d
    FROM pairs
), t1 AS (
    SELECT CAST(COALESCE(SUM(t * (t - 1) / 2), 0) AS BIGINT) AS n1
    FROM (SELECT COUNT(*) AS t FROM daily GROUP BY rev)
), t2 AS (
    SELECT CAST(COALESCE(SUM(t * (t - 1) / 2), 0) AS BIGINT) AS n2
    FROM (SELECT COUNT(*) AS t FROM daily GROUP BY cnt)
), agg AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n,
           c, d, n1, n2
    FROM cd, t1, t2
)
SELECT n AS n_days, c AS concordant, d AS discordant,
       CASE WHEN n < 2 OR n * (n - 1) / 2 = n1 OR n * (n - 1) / 2 = n2
            THEN NULL
            ELSE ROUND((c - d) / SQRT((CAST(n AS DOUBLE) * (n - 1) / 2 - n1)
                                      * (CAST(n AS DOUBLE) * (n - 1) / 2
                                         - n2)), 6)
            END AS tau_b,
       CASE WHEN n < 2 OR n * (n - 1) / 2 = n1 OR n * (n - 1) / 2 = n2
            THEN NULL
            ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f"ABS({z})")}), 6)
            END AS p_value
FROM agg
"""


@register(
    "stat_kendall_tau", oracle=_kendall_oracle(), tags=("profile", "timeseries")
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b rank correlation between daily revenue and daily
    order count — the third rank-correlation convention after Pearson
    (`agg_corr_matrix`) and Spearman (`stat_spearman_corr`): τ counts
    concordant-vs-discordant PAIRS, so it is interpretable as a
    probability difference and degrades more gracefully under ties than
    Spearman's ρ (τ-b divides out tie mass on both margins — the 'b'
    that naive implementations drop). The z approximation
    z = 3(C−D)/√(n(n−1)(2n+5)/2) is the classical large-sample null.

    Exactness: the fact table folds ONCE to the daily grain with exact
    integer cents and counts, so every pairwise comparison, C, D, and
    both tie terms are exact integers on both engines; τ and p exit
    through shared double expressions (ROUND 6). The O(d²) pair join
    runs on the BOUNDED calendar-day grain — same shape as
    stat_trend_mann_kendall; the only data-scaled stage is the daily
    fold. All-tied margins (n1 or n2 = full pair count) pin NULL."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            ).cast("long").alias("rev"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    a = daily.select(
        F.col("day").alias("da"), F.col("rev").alias("ra"), F.col("cnt").alias("ca")
    )
    b = daily.select(
        F.col("day").alias("db"), F.col("rev").alias("rb"), F.col("cnt").alias("cb")
    )
    sgn_r = (
        F.when(F.col("rb") > F.col("ra"), 1)
        .when(F.col("rb") < F.col("ra"), -1)
        .otherwise(0)
    )
    sgn_c = (
        F.when(F.col("cb") > F.col("ca"), 1)
        .when(F.col("cb") < F.col("ca"), -1)
        .otherwise(0)
    )
    prod = sgn_r * sgn_c
    cd = a.join(b, F.col("db") > F.col("da")).agg(
        F.coalesce(F.sum((prod == 1).cast("long")), F.lit(0))
        .cast("long")
        .alias("c"),
        F.coalesce(F.sum((prod == -1).cast("long")), F.lit(0))
        .cast("long")
        .alias("d"),
    )
    n1 = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(F.sum(F.expr("t * (t - 1) / 2")), F.lit(0))
            .cast("long")
            .alias("n1")
        )
    )
    n2 = (
        daily.groupBy("cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(F.sum(F.expr("t * (t - 1) / 2")), F.lit(0))
            .cast("long")
            .alias("n2")
        )
    )
    n_df = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    agg = (
        cd.crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n_df))
    )
    z = (
        "(3.0 * (c - d) / SQRT(CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)"
        " / 2.0))"
    )
    degenerate = (
        "n < 2 OR n * (n - 1) / 2 = n1 OR n * (n - 1) / 2 = n2"
    )
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.expr(
            f"CASE WHEN {degenerate} THEN NULL"
            " ELSE ROUND((c - d) / SQRT((CAST(n AS DOUBLE) * (n - 1) / 2"
            " - n1) * (CAST(n AS DOUBLE) * (n - 1) / 2 - n2)), 6) END"
        ).alias("tau_b"),
        F.expr(
            f"CASE WHEN {degenerate} THEN NULL"
            f" ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f'ABS({z})')}), 6)"
            " END"
        ).alias("p_value"),
    )


_PETTITT_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), ranked AS (
    SELECT day,
           CAST(2 * RANK() OVER (ORDER BY rev)
                + COUNT(*) OVER (PARTITION BY rev) - 1 AS BIGINT) AS r2
    FROM daily
), swept AS (
    SELECT day,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           CAST(SUM(r2) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS s2,
           CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n
    FROM ranked
), u AS (
    SELECT day, t, n, s2 - t * (n + 1) AS u_t
    FROM swept WHERE t < n
)
SELECT n AS n_days,
       CAST(ABS(u_t) AS BIGINT) AS k_stat,
       day AS changepoint_day,
       ROUND(LEAST(2.0 * EXP(-6.0 * CAST(ABS(u_t) AS DOUBLE) * ABS(u_t)
                   / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
                   1.0), 6) AS p_value,
       CAST(LEAST(2.0 * EXP(-6.0 * CAST(ABS(u_t) AS DOUBLE) * ABS(u_t)
                  / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)),
                  1.0) < 0.05 AS BIGINT) AS reject_5pct
FROM u
ORDER BY ABS(u_t) DESC, day
LIMIT 1
"""


@register(
    "stat_pettitt_changepoint",
    oracle=_PETTITT_ORACLE,
    tags=("profile", "timeseries"),
)
def stat_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt (1979) nonparametric changepoint test on daily revenue —
    the rank-based companion to `ts_changepoint_cusum`: it locates the
    single most likely shift point WITHOUT assuming a distribution or a
    known variance, via the Mann–Whitney-style sweep
    U_t = Σ_{i≤t} Σ_{j>t} sign(x_i − x_j) and the classical
    approximation p ≈ 2·exp(−6K²/(n³+n²)), K = max|U_t|. The midrank
    identity U_t = 2·S_t − t(n+1) (S_t = cumulative midrank sum) turns
    the O(n²) double sum into ONE rank pass plus ONE running sum.

    Exactness: daily cents are exact integers; doubled midranks
    2r = 2·RANK + ties − 1 keep the sweep in integer algebra on both
    engines, so K and the argmax day are engine-exact; only the final p
    is a shared double (ROUND 6). Windows run on the BOUNDED calendar-
    day grain (the same sanctioned class as ts_stl/mann_kendall); the
    argmax exits via ORDER BY |U| DESC, day LIMIT 1 — deterministic
    under ties. The all-tied series (const fixture) yields U≡0, p=1."""
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
    ranked = daily.select(
        "day",
        (
            2 * F.rank().over(Window.orderBy("rev"))
            + F.count(F.lit(1)).over(Window.partitionBy("rev"))
            - 1
        ).cast("long").alias("r2"),
    )
    w_day = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    swept = ranked.select(
        "day",
        F.row_number().over(Window.orderBy("day")).cast("long").alias("t"),
        F.sum("r2").over(w_day).cast("long").alias("s2"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("n"),
    )
    u = swept.where(F.col("t") < F.col("n")).select(
        "day",
        "n",
        (F.col("s2") - F.col("t") * (F.col("n") + 1)).alias("u_t"),
    )
    p = (
        "LEAST(2.0 * EXP(-6.0 * CAST(ABS(u_t) AS DOUBLE) * ABS(u_t)"
        " / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)), 1.0)"
    )
    return (
        u.orderBy(F.abs(F.col("u_t")).desc(), F.col("day"))
        .limit(1)
        .select(
            F.col("n").alias("n_days"),
            F.abs(F.col("u_t")).cast("long").alias("k_stat"),
            F.col("day").alias("changepoint_day"),
            F.expr(f"ROUND({p}, 6)").alias("p_value"),
            F.expr(f"CAST({p} < 0.05 AS BIGINT)").alias("reject_5pct"),
        )
    )


def _lilliefors_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    phi = normal_cdf_sql("((CAST(rev AS DOUBLE) - m) / s)")
    return f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(rev AS DOUBLE)) AS m,
           STDDEV_SAMP(CAST(rev AS DOUBLE)) AS s
    FROM daily
), ranked AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev, day) AS BIGINT) AS i,
           rev, n, m, s
    FROM daily, stats
), gaps AS (
    SELECT n,
           GREATEST(ABS(CAST(i AS DOUBLE) / n - {phi}),
                    ABS({phi} - CAST(i - 1 AS DOUBLE) / n)) AS gap
    FROM ranked WHERE s IS NOT NULL AND s > 0
)
SELECT MAX(n) AS n_days,
       ROUND(MAX(gap), 6) AS d_stat,
       ROUND(0.886 / SQRT(CAST(MAX(n) AS DOUBLE)), 6) AS crit_05,
       CAST(MAX(gap) > 0.886 / SQRT(CAST(MAX(n) AS DOUBLE)) AS BIGINT)
           AS reject_5pct
FROM gaps
GROUP BY ()
HAVING COUNT(*) > 0
"""


@register(
    "stat_lilliefors_normality",
    oracle=_lilliefors_oracle(),
    tags=("profile", "timeseries"),
)
def stat_lilliefors_normality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors (1967) normality test on daily revenue — the
    one-sample KS test against a normal with ESTIMATED mean/std (the
    estimation is what shifts the critical value off the vanilla KS
    table; 0.886/√n is the classical α=0.05 large-sample approximation
    from Lilliefors' Monte-Carlo table). Complements `stat_jarque_bera`
    (moment-based) with a CDF-distance test: JB sees skew/kurtosis, the
    sup-gap sees any shape violation, including multimodality JB can
    miss. D = max over sorted points of max(|i/n − Φ(z_i)|,
    |Φ(z_i) − (i−1)/n|) — BOTH one-sided gaps, which naive ECDF
    implementations drop.

    Exactness: one exact-integer daily fold; mean/std/Φ are shared
    double expressions (the committed A&S Φ fragment); the sort runs on
    the BOUNDED calendar-day grain with a (rev, day) tiebreak so ranks
    are engine-identical under ties. A constant series (s = 0, const
    fixture) yields the empty gaps set → 0 rows on both engines."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

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
        F.avg(F.col("rev").cast("double")).alias("m"),
        F.stddev_samp(F.col("rev").cast("double")).alias("s"),
    )
    ranked = daily.crossJoin(F.broadcast(stats)).select(
        F.row_number()
        .over(Window.orderBy("rev", "day"))
        .cast("long")
        .alias("i"),
        "rev",
        "n",
        "m",
        "s",
    )
    phi = normal_cdf_sql("((CAST(rev AS DOUBLE) - m) / s)")
    gaps = ranked.where(F.col("s").isNotNull() & (F.col("s") > 0)).select(
        "n",
        F.expr(
            f"GREATEST(ABS(CAST(i AS DOUBLE) / n - {phi}),"
            f" ABS({phi} - CAST(i - 1 AS DOUBLE) / n))"
        ).alias("gap"),
    )
    return (
        gaps.agg(
            F.max("n").alias("n_days"),
            F.round(F.max("gap"), 6).alias("d_stat"),
            F.expr(
                "ROUND(0.886 / SQRT(CAST(MAX(n) AS DOUBLE)), 6)"
            ).alias("crit_05"),
            F.expr(
                "CAST(MAX(gap) > 0.886 / SQRT(CAST(MAX(n) AS DOUBLE))"
                " AS BIGINT)"
            ).alias("reject_5pct"),
            F.count(F.lit(1)).alias("_n_rows"),
        )
        .where(F.col("_n_rows") > 0)
        .drop("_n_rows")
    )


def _g_test_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    p = chi2_sf_sql_expr("g_stat", "CAST((r - 1) * (c - 1) AS DOUBLE)")
    return f"""
WITH cells AS (
    SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
), margins AS (
    SELECT n,
           CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
           CAST(SUM(n) OVER (PARTITION BY dow) AS BIGINT) AS col_n,
           CAST(SUM(n) OVER () AS BIGINT) AS tot
    FROM cells
), g AS (
    SELECT 2.0 * SUM(n * LN(CAST(n AS DOUBLE) * tot
                            / (CAST(row_n AS DOUBLE) * col_n))) AS g_stat,
           (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM cells)
               AS r,
           (SELECT CAST(COUNT(DISTINCT dow) AS BIGINT) FROM cells) AS c,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM margins
)
SELECT n_events, r AS n_event_types, c AS n_dows,
       CAST((r - 1) * (c - 1) AS BIGINT) AS df,
       CASE WHEN r < 2 OR c < 2 THEN NULL ELSE ROUND(g_stat, 4) END
           AS g_stat,
       CASE WHEN r < 2 OR c < 2 THEN NULL ELSE ROUND({p}, 6) END
           AS p_value
FROM g
"""


@register("stat_g_test", oracle=_g_test_oracle(), tags=("profile", "experiment"))
def stat_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (likelihood-ratio chi-square) of independence on the
    event_type × day-of-week contingency table — the
    information-theoretic twin of `stat_chi_square`: G = 2·Σ O·ln(O/E)
    is additive under table partitioning (G decomposes exactly across
    subtables, Pearson's X² does not), which is why corpus-linguistics
    and log-analysis stacks (Dunning 1993 log-likelihood keyness) prefer
    it. Empty cells contribute 0 by the 0·ln(0)=0 convention — they
    simply never appear in the grouped cell table, so no guard is
    needed. p via the shared Wilson–Hilferty chi-square survival
    fragment at df=(r−1)(c−1).

    Scale: ONE map-side-combined fold to the r×c cell grain (≤ a few
    dozen rows at any data size); margins are windows over that bounded
    grain; G is one aggregate over it. Spark dayofweek (1=Sunday) is
    the output convention; the oracle maps DuckDB's 0-based dayofweek
    onto it (ts_seasonal_index precedent)."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    cells = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.dayofweek("ts").cast("long").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    margins = cells.select(
        "n",
        F.sum("n").over(Window.partitionBy("event_type")).cast("long").alias("row_n"),
        F.sum("n").over(Window.partitionBy("dow")).cast("long").alias("col_n"),
        F.sum("n").over(Window.partitionBy()).cast("long").alias("tot"),
    )
    dims = cells.agg(
        F.countDistinct("event_type").cast("long").alias("r"),
        F.countDistinct("dow").cast("long").alias("c"),
    )
    g = margins.agg(
        F.expr(
            "2.0 * SUM(n * LN(CAST(n AS DOUBLE) * tot"
            " / (CAST(row_n AS DOUBLE) * col_n)))"
        ).alias("g_stat"),
        F.sum("n").cast("long").alias("n_events"),
    ).crossJoin(F.broadcast(dims))
    p = chi2_sf_sql_expr("g_stat", "CAST((r - 1) * (c - 1) AS DOUBLE)")
    return g.select(
        "n_events",
        F.col("r").alias("n_event_types"),
        F.col("c").alias("n_dows"),
        F.expr("CAST((r - 1) * (c - 1) AS BIGINT)").alias("df"),
        F.expr(
            "CASE WHEN r < 2 OR c < 2 THEN NULL ELSE ROUND(g_stat, 4) END"
        ).alias("g_stat"),
        F.expr(
            f"CASE WHEN r < 2 OR c < 2 THEN NULL ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
    )


def _friedman_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    p = chi2_sf_sql_expr("chi2_f", "CAST(k - 1 AS DOUBLE)")
    return f"""
WITH weekly AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS wk, event_type,
           SUM(CAST(value AS DECIMAL(18,2))) AS v
    FROM events GROUP BY 1, 2
), kk AS (
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM weekly
), complete AS (
    SELECT w.wk, w.event_type, w.v, kk.k
    FROM weekly w, kk
    WHERE w.wk IN (SELECT wk FROM weekly
                   GROUP BY wk HAVING COUNT(*) = (SELECT k FROM kk))
), ranked AS (
    SELECT wk, event_type, k,
           CAST(2 * RANK() OVER (PARTITION BY wk ORDER BY v)
                + COUNT(*) OVER (PARTITION BY wk, v) - 1 AS BIGINT) AS r2
    FROM complete
), sums AS (
    SELECT event_type, MAX(k) AS k,
           CAST(SUM(r2) AS BIGINT) AS r2_j,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((r2 - (k + 1)) * (r2 - (k + 1))) AS BIGINT) AS dev2
    FROM ranked GROUP BY event_type
), stat AS (
    SELECT MAX(k) AS k, MAX(n) AS n_weeks,
           CAST(SUM((r2_j - n * (k + 1)) * (r2_j - n * (k + 1)))
                AS BIGINT) AS num,
           CAST(SUM(dev2) AS BIGINT) AS den
    FROM sums
)
SELECT n_weeks, k AS n_treatments,
       CASE WHEN den = 0 OR k < 2 THEN NULL
            ELSE ROUND((k - 1) * CAST(num AS DOUBLE) / den, 4)
            END AS friedman_chi2,
       CASE WHEN den = 0 OR k < 2 THEN NULL
            ELSE ROUND({p.replace("chi2_f", "((k - 1) * CAST(num AS DOUBLE) / den)")}, 6)
            END AS p_value
FROM stat
"""


@register(
    "stat_friedman_test", oracle=_friedman_oracle(), tags=("profile", "experiment")
)
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman (1937) rank test for treatment differences across
    matched blocks — blocks are calendar weeks, treatments the event
    types, responses the weekly value sums: "do the event types differ
    consistently once week-to-week level shifts are blocked out?" The
    within-block ranking is what distinguishes it from Kruskal–Wallis
    (`stat_kruskal_wallis` ranks globally and is blind to block
    effects). Tie-robust Conover form:
    χ²_F = (k−1)·Σ_j(R_j − n(k+1)/2)² / Σ_ij(r_ij − (k+1)/2)², which
    reduces to the textbook 12/(nk(k+1)) formula when ties are absent;
    incomplete weeks (missing a treatment) are dropped — the test
    requires complete blocks, stated not implied.

    Exactness: doubled midranks 2r = 2·RANK + ties − 1 keep numerator
    and denominator in exact integer algebra on both engines (the 4s
    cancel); χ² and the Wilson–Hilferty p exit as shared doubles. All
    windows run on the bounded (weeks × event types) grain; the one
    data-sized stage is the weekly fold. All-tied blocks (const
    fixture: den = 0) pin NULL."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    weekly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("week", "ts").cast("date").alias("wk"),
            "event_type",
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    )
    kk = weekly.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    wk_counts = weekly.groupBy("wk").agg(F.count(F.lit(1)).alias("n_types"))
    complete = (
        weekly.join(F.broadcast(kk))
        .join(
            F.broadcast(wk_counts),
            "wk",
        )
        .where(F.col("n_types") == F.col("k"))
        .select("wk", "event_type", "v", "k")
    )
    ranked = complete.select(
        "wk",
        "event_type",
        "k",
        (
            2 * F.rank().over(Window.partitionBy("wk").orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("wk", "v"))
            - 1
        ).cast("long").alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.max("k").alias("k"),
        F.sum("r2").cast("long").alias("r2_j"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            (F.col("r2") - (F.col("k") + 1))
            * (F.col("r2") - (F.col("k") + 1))
        ).cast("long").alias("dev2"),
    )
    stat = sums.agg(
        F.max("k").alias("k"),
        F.max("n").alias("n_weeks"),
        F.sum(
            (F.col("r2_j") - F.col("n") * (F.col("k") + 1))
            * (F.col("r2_j") - F.col("n") * (F.col("k") + 1))
        ).cast("long").alias("num"),
        F.sum("dev2").cast("long").alias("den"),
    )
    chi2 = "((k - 1) * CAST(num AS DOUBLE) / den)"
    p = chi2_sf_sql_expr(chi2, "CAST(k - 1 AS DOUBLE)")
    return stat.select(
        "n_weeks",
        F.col("k").alias("n_treatments"),
        F.expr(
            "CASE WHEN den = 0 OR k < 2 THEN NULL"
            f" ELSE ROUND({chi2}, 4) END"
        ).alias("friedman_chi2"),
        F.expr(
            "CASE WHEN den = 0 OR k < 2 THEN NULL"
            f" ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
    )


def _bartlett_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    p = chi2_sf_sql_expr("x2", "CAST(k - 1 AS DOUBLE)")
    return f"""
WITH vq AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}.0) AS HUGEINT) AS vq
    FROM events
), per AS (
    SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
           SUM(vq) AS s_g, SUM(vq * vq) AS q_g
    FROM vq GROUP BY g
    HAVING COUNT(*) >= 2
), var_g AS (
    SELECT g, CAST(n_g AS BIGINT) AS n_g,
           (CAST(q_g AS DOUBLE) - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
            / CAST(n_g AS DOUBLE)) / (CAST(n_g AS DOUBLE) - 1) AS v_g
    FROM per
), agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n_g) AS BIGINT) AS n,
           SUM((n_g - 1) * v_g) AS sw,
           SUM(CASE WHEN v_g <= 0 THEN 1 ELSE 0 END) AS n_zero_var,
           SUM(CASE WHEN v_g > 0 THEN (n_g - 1) * LN(v_g) END) AS sln,
           SUM(1.0 / (n_g - 1)) AS sinv
    FROM var_g
), stat AS (
    SELECT k, n, n_zero_var,
           CASE WHEN k < 2 OR n <= k OR n_zero_var > 0 THEN NULL
                ELSE ((n - k) * LN(sw / (n - k)) - sln)
                     / (1.0 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1)))
                END AS x2
    FROM agg
)
SELECT k AS k_groups, n AS n_total,
       CASE WHEN x2 IS NULL THEN NULL ELSE ROUND(x2, 4) END
           AS bartlett_chi2,
       CASE WHEN x2 IS NULL THEN NULL ELSE ROUND({p}, 6) END AS p_value
FROM stat
"""


@register(
    "stat_bartlett_test", oracle=_bartlett_oracle(), tags=("profile", "experiment")
)
def stat_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's test for homogeneity of variance across the event-type
    groups — the parametric counterpart to `stat_levene_variance`:
    sharper when the data really are normal, notoriously sensitive when
    they are not, which is exactly why the engine ships BOTH (the
    Levene/Bartlett disagreement IS the non-normality diagnostic).
    χ² = [(N−k)·ln(S_p²) − Σ(n_i−1)·ln(s_i²)] / C with the standard
    Bartlett correction C; p via the shared Wilson–Hilferty fragment at
    df = k−1.

    Exactness: values quantize to the ANOVA grid; every per-group sum
    (Σv, Σv²) is exact HUGEINT/decimal integer algebra, so the group
    variances are deterministic doubles from exact inputs, and all
    ln/ratio work runs on the k-row grain — the one data-sized stage is
    the map-side-combined group fold. Groups with n < 2 are excluded
    (no variance to test); ANY zero-variance group pins NULL (ln
    undefined — the const fixture's class)."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    vq = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"),
        F.expr(f"CAST(FLOOR(value * {ANOVA_QUANT}.0) AS DECIMAL(38,0))").alias(
            "vq"
        ),
    )
    per = (
        vq.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("vq").alias("s_g"),
            F.sum(F.expr("vq * vq")).alias("q_g"),
        )
        .where(F.col("n_g") >= 2)
    )
    var_g = per.select(
        "n_g",
        F.expr(
            "(CAST(q_g AS DOUBLE) - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)"
            " / CAST(n_g AS DOUBLE)) / (CAST(n_g AS DOUBLE) - 1)"
        ).alias("v_g"),
    )
    agg = var_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.expr("(n_g - 1) * v_g")).alias("sw"),
        F.sum(F.expr("CASE WHEN v_g <= 0 THEN 1 ELSE 0 END")).alias(
            "n_zero_var"
        ),
        F.sum(
            F.expr("CASE WHEN v_g > 0 THEN (n_g - 1) * LN(v_g) END")
        ).alias("sln"),
        F.sum(F.expr("1.0 / (n_g - 1)")).alias("sinv"),
    )
    # The degenerate guards live INSIDE the x2 CASE: k = 1 (single
    # group) divides by 3(k−1), n = k divides by n−k, and a
    # zero-variance group would feed LN(0) — ANSI Spark raises and
    # DuckDB errors where the final-select guard never gets to run
    # (r14 degenerate-probe finding, const + oneday fixtures).
    stat = agg.select(
        "k",
        "n",
        "n_zero_var",
        F.expr(
            "CASE WHEN k < 2 OR n <= k OR n_zero_var > 0 THEN NULL"
            " ELSE ((n - k) * LN(sw / (n - k)) - sln)"
            " / (1.0 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1))) END"
        ).alias("x2"),
    )
    p = chi2_sf_sql_expr("x2", "CAST(k - 1 AS DOUBLE)")
    return stat.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.expr(
            "CASE WHEN x2 IS NULL THEN NULL ELSE ROUND(x2, 4) END"
        ).alias("bartlett_chi2"),
        F.expr(
            f"CASE WHEN x2 IS NULL THEN NULL ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
    )


_CRONBACH_ORACLE = """
WITH x AS (
    SELECT user_id, event_type AS item,
           SUM(CAST(FLOOR(value * 1000000.0) AS HUGEINT)) AS xq
    FROM events GROUP BY 1, 2
), nu AS (
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM x
), items AS (
    SELECT item,
           SUM(xq) AS sx, SUM(xq * xq) AS qx
    FROM x GROUP BY item
), item_var AS (
    SELECT item,
           (CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
            / n) / (n - 1) AS v_i
    FROM items, nu WHERE n >= 2
), totals AS (
    SELECT user_id, SUM(xq) AS tq FROM x GROUP BY user_id
), tot_var AS (
    SELECT CASE WHEN MAX(nu.n) < 2 THEN NULL
                ELSE (CAST(SUM(tq * tq) AS DOUBLE)
                      - CAST(SUM(tq) AS DOUBLE) * CAST(SUM(tq) AS DOUBLE)
                        / MAX(nu.n)) / (MAX(nu.n) - 1)
                END AS v_t
    FROM totals, nu
), fin AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM item_var) AS k,
           (SELECT MAX(n) FROM nu) AS n_users,
           (SELECT SUM(v_i) FROM item_var) AS sv,
           (SELECT v_t FROM tot_var) AS v_t
)
SELECT k AS n_items, n_users,
       CASE WHEN k < 2 OR v_t IS NULL OR v_t <= 0 THEN NULL
            ELSE ROUND(CAST(k AS DOUBLE) / (k - 1) * (1.0 - sv / v_t), 6)
            END AS cronbach_alpha
FROM fin
"""


@register(
    "stat_cronbach_alpha", oracle=_CRONBACH_ORACLE, tags=("profile", "experiment")
)
def stat_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's α internal-consistency coefficient, with users as
    subjects and event types as items (score = the user's value total
    per type; a user silent on a type scores 0, which the sum algebra
    encodes for free). α = k/(k−1)·(1 − Σσ²_i/σ²_total) — the standard
    "do these k signals measure one underlying trait" reliability
    check, here reading "is per-user engagement one-dimensional across
    event types" (α near 1) "or are the types independent behaviors"
    (α near 0, even negative). The engagement-composite sanity check a
    scoring pipeline owes itself before summing features.

    Exactness: scores quantize to micro-units and every moment (Σx,
    Σx², per-user totals) is exact HUGEINT/decimal algebra with N =
    the full user universe — absent (user, item) cells contribute
    exactly 0 to every sum, so the complete-matrix variances come out
    of the SPARSE table with no fill-in join. Variances become shared
    doubles only at the k-row/1-row grain. σ²_total = 0 (const fixture:
    every user identical) and k < 2 pin NULL."""
    x = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", F.col("event_type").alias("item"))
        .agg(
            F.sum(
                F.expr("CAST(FLOOR(value * 1000000.0) AS DECIMAL(38,0))")
            ).alias("xq")
        )
    )
    nu = x.agg(F.countDistinct("user_id").cast("long").alias("n"))
    items = x.groupBy("item").agg(
        F.sum("xq").alias("sx"), F.sum(F.expr("xq * xq")).alias("qx")
    )
    item_var = (
        items.crossJoin(F.broadcast(nu))
        .where(F.col("n") >= 2)
        .select(
            F.expr(
                "(CAST(qx AS DOUBLE) - CAST(sx AS DOUBLE)"
                " * CAST(sx AS DOUBLE) / n) / (n - 1)"
            ).alias("v_i")
        )
    )
    totals = x.groupBy("user_id").agg(F.sum("xq").alias("tq"))
    # n = 1 user (tiny fixture) divides by n−1 — the guard must wrap
    # the expression itself, not the final select (ANSI raise class;
    # r14 degenerate-probe finding).
    tot_var = totals.crossJoin(F.broadcast(nu)).agg(
        F.expr(
            "CASE WHEN MAX(n) < 2 THEN NULL"
            " ELSE (CAST(SUM(tq * tq) AS DOUBLE) - CAST(SUM(tq) AS DOUBLE)"
            " * CAST(SUM(tq) AS DOUBLE) / MAX(n)) / (MAX(n) - 1) END"
        ).alias("v_t")
    )
    sv = item_var.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("v_i").alias("sv"),
    )
    return (
        sv.crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(tot_var))
        .select(
            F.col("k").alias("n_items"),
            F.col("n").alias("n_users"),
            F.expr(
                "CASE WHEN k < 2 OR v_t IS NULL OR v_t <= 0 THEN NULL"
                " ELSE ROUND(CAST(k AS DOUBLE) / (k - 1)"
                " * (1.0 - sv / v_t), 6) END"
            ).alias("cronbach_alpha"),
        )
    )


def _rate_ratio_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    z = (
        "((n1 - (n1 + n2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))"
        " / SQRT((n1 + n2) * (CAST(t1 AS DOUBLE) / (t1 + t2))"
        " * (1.0 - CAST(t1 AS DOUBLE) / (t1 + t2))))"
    )
    guard = "t1 = 0 OR t2 = 0 OR n1 + n2 = 0"
    return f"""
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
), agg AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN dow BETWEEN 2 AND 6 THEN n END), 0)
                AS BIGINT) AS n1,
           CAST(COALESCE(SUM(CASE WHEN dow IN (1, 7) THEN n END), 0)
                AS BIGINT) AS n2,
           CAST(COALESCE(SUM(CASE WHEN dow BETWEEN 2 AND 6 THEN 1 END), 0)
                AS BIGINT) AS t1,
           CAST(COALESCE(SUM(CASE WHEN dow IN (1, 7) THEN 1 END), 0)
                AS BIGINT) AS t2
    FROM daily
)
SELECT n1 AS weekday_events, t1 AS weekday_days,
       n2 AS weekend_events, t2 AS weekend_days,
       CASE WHEN {guard} OR n2 = 0 THEN NULL
            ELSE ROUND((CAST(n1 AS DOUBLE) / t1)
                       / (CAST(n2 AS DOUBLE) / t2), 6) END AS rate_ratio,
       CASE WHEN {guard} OR n1 = 0 OR n2 = 0 THEN NULL
            ELSE ROUND(EXP(LN((CAST(n1 AS DOUBLE) / t1)
                              / (CAST(n2 AS DOUBLE) / t2))
                           - 1.959963985
                             * SQRT(1.0 / n1 + 1.0 / n2)), 6)
            END AS rr_ci95_lo,
       CASE WHEN {guard} OR n1 = 0 OR n2 = 0 THEN NULL
            ELSE ROUND(EXP(LN((CAST(n1 AS DOUBLE) / t1)
                              / (CAST(n2 AS DOUBLE) / t2))
                           + 1.959963985
                             * SQRT(1.0 / n1 + 1.0 / n2)), 6)
            END AS rr_ci95_hi,
       CASE WHEN {guard} THEN NULL ELSE ROUND({z}, 4) END AS z_stat,
       CASE WHEN {guard} THEN NULL
            ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f"ABS({z})")}), 6)
            END AS p_value
FROM agg
"""


@register(
    "stat_poisson_rate_ratio",
    oracle=_rate_ratio_oracle(),
    tags=("profile", "experiment"),
)
def stat_poisson_rate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson rate-ratio test, weekday vs weekend event rates — the
    exposure-adjusted comparison `stat_two_proportion_z` can't do
    (5 weekdays vs 2 weekend days: raw counts are incomparable, RATES
    are): the classical conditional trick reduces H0: λ1 = λ2 to a
    binomial — given n = n1 + n2 total events, n1 ~ Bin(n, t1/(t1+t2))
    under the null — tested with the shared Φ fragment; the rate-ratio
    CI uses the standard log method, se = √(1/n1 + 1/n2). This is the
    on-call question "is the weekend rate REALLY lower or is it just
    two days of exposure" as one row.

    Scale shape: one map-side-combined daily fold, one 1-row reduce;
    counts and exposure days are exact integers, every statistic a
    shared double expression. Zero exposure on either side, or zero
    events where a log/denominator needs them, pins NULL (guards
    INSIDE each CASE — the ANSI raise class)."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.dayofweek(F.to_date("ts")).cast("long").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    agg = daily.agg(
        F.coalesce(
            F.sum(F.expr("CASE WHEN dow BETWEEN 2 AND 6 THEN n END")),
            F.lit(0),
        ).cast("long").alias("n1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN dow IN (1, 7) THEN n END")), F.lit(0)
        ).cast("long").alias("n2"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN dow BETWEEN 2 AND 6 THEN 1 END")),
            F.lit(0),
        ).cast("long").alias("t1"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN dow IN (1, 7) THEN 1 END")), F.lit(0)
        ).cast("long").alias("t2"),
    )
    z = (
        "((n1 - (n1 + n2) * (CAST(t1 AS DOUBLE) / (t1 + t2)))"
        " / SQRT((n1 + n2) * (CAST(t1 AS DOUBLE) / (t1 + t2))"
        " * (1.0 - CAST(t1 AS DOUBLE) / (t1 + t2))))"
    )
    guard = "t1 = 0 OR t2 = 0 OR n1 + n2 = 0"
    rr = "((CAST(n1 AS DOUBLE) / t1) / (CAST(n2 AS DOUBLE) / t2))"
    se = "SQRT(1.0 / n1 + 1.0 / n2)"
    return agg.select(
        F.col("n1").alias("weekday_events"),
        F.col("t1").alias("weekday_days"),
        F.col("n2").alias("weekend_events"),
        F.col("t2").alias("weekend_days"),
        F.expr(
            f"CASE WHEN {guard} OR n2 = 0 THEN NULL"
            f" ELSE ROUND({rr}, 6) END"
        ).alias("rate_ratio"),
        F.expr(
            f"CASE WHEN {guard} OR n1 = 0 OR n2 = 0 THEN NULL"
            f" ELSE ROUND(EXP(LN({rr}) - 1.959963985 * {se}), 6) END"
        ).alias("rr_ci95_lo"),
        F.expr(
            f"CASE WHEN {guard} OR n1 = 0 OR n2 = 0 THEN NULL"
            f" ELSE ROUND(EXP(LN({rr}) + 1.959963985 * {se}), 6) END"
        ).alias("rr_ci95_hi"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL ELSE ROUND({z}, 4) END"
        ).alias("z_stat"),
        F.expr(
            f"CASE WHEN {guard} THEN NULL"
            f" ELSE ROUND(2.0 * (1.0 - {normal_cdf_sql(f'ABS({z})')}), 6)"
            " END"
        ).alias("p_value"),
    )


def _ad_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    phi = normal_cdf_sql("((CAST(rev AS DOUBLE) - m) / s)")
    phic = f"GREATEST(LEAST({phi}, 1.0 - 1e-15), 1e-15)"
    term = (
        f"((2 * i - 1) * LN({phic})"
        f" + (2 * (n - i) + 1) * LN(1.0 - {phic}))"
    )
    return f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS BIGINT)) AS BIGINT) AS rev
    FROM orders GROUP BY 1
), stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(rev AS DOUBLE)) AS m,
           STDDEV_SAMP(CAST(rev AS DOUBLE)) AS s
    FROM daily
), ranked AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rev, day) AS BIGINT) AS i,
           rev, n, m, s
    FROM daily, stats WHERE s IS NOT NULL AND s > 0
), terms AS (
    SELECT n, CAST(FLOOR({term} * 1000000000.0) AS BIGINT) AS t_nanos
    FROM ranked
), agg AS (
    SELECT MAX(n) AS n,
           -CAST(MAX(n) AS DOUBLE)
           - (CAST(SUM(t_nanos) AS DOUBLE) / 1000000000.0)
             / MAX(n) AS a2
    FROM terms GROUP BY ()
    HAVING COUNT(*) > 0
)
SELECT n AS n_days,
       ROUND(a2, 4) AS a2_stat,
       ROUND(a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n)), 4)
           AS a2_star,
       CAST(a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n))
            > 0.752 AS BIGINT) AS reject_5pct
FROM agg
"""


@register(
    "stat_anderson_darling_normal",
    oracle=_ad_oracle(),
    tags=("profile", "timeseries"),
)
def stat_anderson_darling_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson–Darling normality test on daily revenue — the
    TAIL-WEIGHTED member of the engine's normality triad: Jarque–Bera
    sees moments, Lilliefors the max CDF gap, and A² integrates the
    squared CDF gap with 1/[F(1−F)] weighting, making it the most
    powerful of the three against tail departures (the kind that break
    risk/outlier assumptions first). Case-3 (estimated μ, σ)
    calibration per Stephens (1974): A*² = A²(1 + 0.75/n + 2.25/n²),
    reject at 5% when A*² > 0.752.

    The classic rearrangement folds the two order-statistic sums into
    ONE pass — per sorted row, (2i−1)·ln Φ(z_i) + (2(n−i)+1)·ln(1−Φ(z_i))
    — no self-join on mirrored ranks. Φ is the shared A&S fragment,
    CLAMPED to [1e-15, 1−1e-15] before LN: at |z| ≳ 8 the polynomial
    saturates to exactly 1.0 and Spark's LN(0) = NULL silently drops
    the row while DuckDB returns -inf (the ln-domain seam class). Each
    row's term FLOOR-quantizes to nano-units before the exact integer
    sum; the sort runs on the bounded calendar-day grain with the
    (rev, day) tiebreak. A constant series (s = 0) yields 0 rows."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

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
        F.avg(F.col("rev").cast("double")).alias("m"),
        F.stddev_samp(F.col("rev").cast("double")).alias("s"),
    )
    ranked = (
        daily.crossJoin(F.broadcast(stats))
        .where(F.col("s").isNotNull() & (F.col("s") > 0))
        .select(
            F.row_number()
            .over(Window.orderBy("rev", "day"))
            .cast("long")
            .alias("i"),
            "rev",
            "n",
            "m",
            "s",
        )
    )
    phi = normal_cdf_sql("((CAST(rev AS DOUBLE) - m) / s)")
    phic = f"GREATEST(LEAST({phi}, 1.0 - 1e-15), 1e-15)"
    term = (
        f"((2 * i - 1) * LN({phic})"
        f" + (2 * (n - i) + 1) * LN(1.0 - {phic}))"
    )
    terms = ranked.select(
        "n",
        F.expr(f"CAST(FLOOR({term} * 1000000000.0) AS BIGINT)").alias(
            "t_nanos"
        ),
    )
    agg = (
        terms.agg(
            F.max("n").alias("n"),
            F.expr(
                "-CAST(MAX(n) AS DOUBLE)"
                " - (CAST(SUM(t_nanos) AS DOUBLE) / 1000000000.0) / MAX(n)"
            ).alias("a2"),
            F.count(F.lit(1)).alias("_rows"),
        )
        .where(F.col("_rows") > 0)
        .drop("_rows")
    )
    star = "a2 * (1.0 + 0.75 / n + 2.25 / (CAST(n AS DOUBLE) * n))"
    return agg.select(
        F.col("n").alias("n_days"),
        F.round("a2", 4).alias("a2_stat"),
        F.expr(f"ROUND({star}, 4)").alias("a2_star"),
        F.expr(f"CAST({star} > 0.752 AS BIGINT)").alias("reject_5pct"),
    )


_BF_ORACLE = f"""
WITH vq AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}.0) AS HUGEINT) AS vq
    FROM events
), dist AS (
    SELECT g, vq, CAST(COUNT(*) AS HUGEINT) AS cnt FROM vq GROUP BY g, vq
), cum AS (
    SELECT g, vq,
           SUM(cnt) OVER (PARTITION BY g ORDER BY vq) AS c,
           SUM(cnt) OVER (PARTITION BY g) AS n_g
    FROM dist
), med AS (
    SELECT g, MIN(vq) AS m_g FROM cum WHERE 2 * c >= n_g GROUP BY g
), z AS (
    SELECT vq.g, ABS(vq.vq - med.m_g) AS vq2
    FROM vq JOIN med ON vq.g = med.g
), per AS (
    SELECT g, CAST(COUNT(*) AS HUGEINT) AS n_g,
           SUM(vq2) AS s_g, SUM(vq2 * vq2) AS q_g
    FROM z GROUP BY g
), per2 AS (
    SELECT *, (s_g * s_g) // n_g AS ssq_g FROM per
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS n,
           SUM(s_g) AS s, SUM(q_g) AS q, SUM(ssq_g) AS ssq
    FROM per2
), fin AS (
    SELECT k, n,
           ssq - (s * s) // n AS ssb,
           q - ssq            AS ssw
    FROM tot
), fin2 AS (
    SELECT *, CASE WHEN n = k THEN NULL ELSE ssw // (n - k) END AS vw
    FROM fin
)
SELECT CAST(k AS BIGINT) AS k_groups,
       CAST(n AS BIGINT) AS n_total,
       CAST(CASE WHEN vw IS NULL OR vw = 0 OR k = 1 THEN NULL
            WHEN ssb < 0
            THEN -LEAST(((-ssb) * 2000 + vw * (k - 1))
                        // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            ELSE LEAST((ssb * 2000 + vw * (k - 1))
                       // (2 * vw * (k - 1)), {ANOVA_F_CAP})
            END AS BIGINT) AS w_milli
FROM fin2
"""


@register(
    "stat_brown_forsythe", oracle=_BF_ORACLE, tags=("profile", "experiment")
)
def stat_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test for equality of variances — Levene's W with
    MEDIAN centers instead of means (Brown & Forsythe 1974), the
    modern-default robust variant: centering on the median keeps the
    test honest under the skewed/heavy-tailed distributions that
    inflate mean-centered Levene, which is why NIST and most stats
    packages recommend it as the first choice. Read next to
    `stat_levene_variance` and `stat_bartlett_test`, the triple is the
    full variance-homogeneity diagnostic ladder (parametric → robust →
    most-robust).

    The per-group LOWER MEDIAN is integer-exact by construction —
    smallest quantized value with 2·cum ≥ n over the per-group distinct
    value grain (count-based, never quantile_disc: the r14
    percentile_disc boundary seam) — and the fold reuses anova_fold's
    overflow-proof HUGEINT/decimal algebra on |x − med_g|, exiting as
    the same saturated w_milli. The median windows PARTITION by group,
    so each group's sorted domain is one task's slice of the
    domain-bounded quant grid; everything after is two map-combined
    passes like Levene."""
    vq = F.floor(F.col("value") * F.lit(float(ANOVA_QUANT))).cast("long")
    obs = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), vq.alias("vq")
    )
    dist = obs.groupBy("g", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.partitionBy("g").orderBy("vq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dist.select(
        "g",
        "vq",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("n_g"),
    )
    med = (
        cum.where(F.expr("2 * c >= n_g"))
        .groupBy("g")
        .agg(F.min("vq").alias("m_g"))
    )
    z = obs.join(F.broadcast(med), "g").select(
        "g", F.abs(F.col("vq") - F.col("m_g")).alias("vq")
    )
    return anova_fold(z).select(
        "k_groups",
        "n_total",
        F.col("f_milli").alias("w_milli"),
    )


#: Welch-ANOVA quantization: coarser than ANOVA_QUANT because every
#: group-level moment must stay exactly double-representable (< 2^53)
#: AFTER the decimal-exact fold — vq ≤ 5.7e4, so q_g = Σvq² ≤ 6.3e14 at
#: sf1 (2e5 rows/group); the 2^53 budget holds through sf1 with 10×
#: headroom and the docstring names the exponent for beyond.
WELCH_QUANT = 100

#: Shared double-expression fragments for Welch's ANOVA — the SAME text is
#: executed by Spark and DuckDB so every IEEE operation has an identical
#: tree. Inputs n_g/s_g/q_g are exact integers < 2^53 (cast to double is
#: exact on both engines); every subsequent op is deterministic IEEE.
_WELCH_MEAN = "(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
_WELCH_VAR = (
    "((CAST(q_g AS DOUBLE)"
    " - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE))"
    " / (CAST(n_g AS DOUBLE) - 1.0))"
)
_WELCH_W = f"(CAST(n_g AS DOUBLE) / {_WELCH_VAR})"

_WELCH_ORACLE = f"""
WITH obs AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {WELCH_QUANT}.0) AS BIGINT) AS vq
    FROM events
), per AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(vq) AS BIGINT) AS s_g,
           CAST(SUM(vq * vq) AS BIGINT) AS q_g
    FROM obs GROUP BY g
    HAVING COUNT(*) >= 2 AND COUNT(*) * SUM(vq * vq) > SUM(vq) * SUM(vq)
), terms AS (
    SELECT g, n_g,
           CAST(FLOOR({_WELCH_W} * 1000000000.0) AS BIGINT) AS w_nanos,
           CAST(FLOOR({_WELCH_W} * {_WELCH_MEAN} * 1000000000.0) AS BIGINT)
               AS wm_nanos,
           {_WELCH_MEAN} AS mean_g,
           {_WELCH_W} AS w_g
    FROM per
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n_g) AS n,
           SUM(w_nanos) AS sw, SUM(wm_nanos) AS swm
    FROM terms
), dev AS (
    SELECT t.g,
           CAST(FLOOR(t.w_g
               * (t.mean_g - CAST(o.swm AS DOUBLE) / CAST(o.sw AS DOUBLE))
               * (t.mean_g - CAST(o.swm AS DOUBLE) / CAST(o.sw AS DOUBLE))
               * 1000000.0) AS BIGINT) AS a_micros,
           CAST(FLOOR((1.0 - t.w_nanos / CAST(o.sw AS DOUBLE))
               * (1.0 - t.w_nanos / CAST(o.sw AS DOUBLE))
               / (CAST(t.n_g AS DOUBLE) - 1.0)
               * 1000000000000.0) AS BIGINT) AS b_picos
    FROM terms t CROSS JOIN tot o
    WHERE o.sw > 0
), fold AS (
    SELECT SUM(a_micros) AS sa, SUM(b_picos) AS sb FROM dev
)
SELECT CAST(o.k AS BIGINT) AS k_groups,
       CAST(o.n AS BIGINT) AS n_total,
       CASE WHEN o.k < 2 OR f.sa IS NULL OR f.sb IS NULL
            THEN NULL ELSE ROUND(
           (CAST(f.sa AS DOUBLE) / 1000000.0 / (CAST(o.k AS DOUBLE) - 1.0))
           / (1.0 + 2.0 * (CAST(o.k AS DOUBLE) - 2.0)
              / (CAST(o.k AS DOUBLE) * CAST(o.k AS DOUBLE) - 1.0)
              * (CAST(f.sb AS DOUBLE) / 1000000000000.0)), 4)
       END AS f_welch,
       CASE WHEN o.k < 2 OR f.sb IS NULL OR f.sb = 0
            THEN NULL ELSE ROUND(
           (CAST(o.k AS DOUBLE) * CAST(o.k AS DOUBLE) - 1.0)
           / (3.0 * (CAST(f.sb AS DOUBLE) / 1000000000000.0)), 2)
       END AS nu2
FROM tot o CROSS JOIN fold f
"""


@register(
    "stat_welch_anova", oracle=_WELCH_ORACLE, tags=("profile", "experiment")
)
def stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA (Welch 1951) — the
    unequal-variances F test that `stat_anova_oneway` is NOT: classic
    ANOVA assumes a pooled within-group variance, and under variance
    heterogeneity (exactly what stat_levene_variance / brown_forsythe
    detect) its size is wrong. Welch weights each group by n_g/s²_g and
    adjusts the denominator df (Welch–Satterthwaite ν₂), making the
    trio anova→levene→welch the complete textbook decision path.

    Determinism architecture (the repo's integer-exit discipline, ext.):
    the fact table folds once to per-group exact integer moments
    (n_g, Σvq, Σvq²) with vq = FLOOR(value·WELCH_QUANT) — all < 2^53, so
    the cast to double is EXACT on both engines, and every group-level
    double (mean, variance, weight) is one identical IEEE expression
    tree. Cross-group sums — the only place summation ORDER could move a
    bit — are taken over FLOOR-quantized BIGINT terms (w, w·mean at
    nanos; the B-term at picos), so they are exact and associative; the
    final F*/ν₂ are single fixed expressions over those exact sums.
    Groups with n_g < 2 are excluded (their variance is undefined), and
    k < 2 exits NULL rather than an ANSI divide (degenerate-fixture
    class). One map-combined shuffle (per-group fold) + a broadcast of
    the k-row weight table: the 100 TB cost is the scan.
    Beyond sf1 the q_g budget approaches 2^53 — drop WELCH_QUANT one
    decade per 100× rows (the exponent is the only scale knob)."""
    vq = F.floor(F.col("value") * F.lit(float(WELCH_QUANT))).cast("long")
    per = (
        load(spark, sf_dir, "events")
        .select(F.col("event_type").alias("g"), vq.alias("vq"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("vq").cast("long").alias("s_g"),
            F.sum(F.col("vq") * F.col("vq")).cast("long").alias("q_g"),
        )
        .where(F.col("n_g") >= 2)
        # Zero-variance groups make w_g = n/0 — and Spark ANSI raises on
        # DOUBLE division by zero too (r15 degenerate probe, const/mixed
        # fixtures). Exact integer compare, no epsilon; mirrored in the
        # oracle's HAVING.
        .where(
            F.expr(
                "CAST(n_g AS DECIMAL(19,0)) * q_g"
                " > CAST(s_g AS DECIMAL(19,0)) * s_g"
            )
        )
    )
    terms = per.select(
        "g",
        "n_g",
        F.expr(f"CAST(FLOOR({_WELCH_W} * 1000000000.0) AS BIGINT)").alias(
            "w_nanos"
        ),
        F.expr(
            f"CAST(FLOOR({_WELCH_W} * {_WELCH_MEAN} * 1000000000.0) AS BIGINT)"
        ).alias("wm_nanos"),
        F.expr(_WELCH_MEAN).alias("mean_g"),
        F.expr(_WELCH_W).alias("w_g"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("w_nanos").cast("long").alias("sw"),
        F.sum("wm_nanos").cast("long").alias("swm"),
    )
    dev = terms.crossJoin(F.broadcast(tot)).where("sw > 0").select(
        F.expr(
            "CAST(FLOOR(w_g"
            " * (mean_g - CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))"
            " * (mean_g - CAST(swm AS DOUBLE) / CAST(sw AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("a_micros"),
        F.expr(
            "CAST(FLOOR((1.0 - w_nanos / CAST(sw AS DOUBLE))"
            " * (1.0 - w_nanos / CAST(sw AS DOUBLE))"
            " / (CAST(n_g AS DOUBLE) - 1.0)"
            " * 1000000000000.0) AS BIGINT)"
        ).alias("b_picos"),
    )
    # keyless agg + cross join: exactly ONE output row even when every
    # group was excluded (tiny/const fixtures) — matches the oracle shape.
    sums = dev.agg(
        F.sum("a_micros").alias("sa"), F.sum("b_picos").alias("sb")
    )
    return tot.crossJoin(F.broadcast(sums)).select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        F.expr(
            "CASE WHEN k < 2 OR sa IS NULL OR sb IS NULL THEN NULL ELSE ROUND("
            "(CAST(sa AS DOUBLE) / 1000000.0 / (CAST(k AS DOUBLE) - 1.0))"
            " / (1.0 + 2.0 * (CAST(k AS DOUBLE) - 2.0)"
            " / (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)"
            " * (CAST(sb AS DOUBLE) / 1000000000000.0)), 4) END"
        ).alias("f_welch"),
        F.expr(
            "CASE WHEN k < 2 OR sb IS NULL OR sb = 0 THEN NULL ELSE ROUND("
            "(CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0)"
            " / (3.0 * (CAST(sb AS DOUBLE) / 1000000000000.0)), 2) END"
        ).alias("nu2"),
    )


_MOOD_ORACLE = f"""
WITH obs AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}.0) AS BIGINT) AS vq
    FROM events
), dist AS (
    SELECT vq, CAST(COUNT(*) AS BIGINT) AS cnt FROM obs GROUP BY vq
), cum AS (
    SELECT vq, SUM(cnt) OVER (ORDER BY vq) AS c,
           SUM(cnt) OVER () AS n
    FROM dist
), med AS (
    SELECT MIN(vq) AS m FROM cum WHERE 2 * c >= n
), cells AS (
    SELECT g,
           CAST(COUNT(CASE WHEN vq >  (SELECT m FROM med) THEN 1 END)
               AS BIGINT) AS above,
           CAST(COUNT(CASE WHEN vq <= (SELECT m FROM med) THEN 1 END)
               AS BIGINT) AS at_or_below
    FROM obs GROUP BY g
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           SUM(above) AS ca, SUM(at_or_below) AS cb,
           SUM(above + at_or_below) AS n
    FROM cells
), terms AS (
    SELECT c.g,
        CAST(FLOOR(
            CAST(c.above * t.n - (c.above + c.at_or_below) * t.ca AS DOUBLE)
            * CAST(c.above * t.n - (c.above + c.at_or_below) * t.ca AS DOUBLE)
            / (CAST(t.n AS DOUBLE)
               * CAST(c.above + c.at_or_below AS DOUBLE)
               * CAST(t.ca AS DOUBLE)) * 1000000.0) AS BIGINT)
        + CAST(FLOOR(
            CAST(c.at_or_below * t.n
                 - (c.above + c.at_or_below) * t.cb AS DOUBLE)
            * CAST(c.at_or_below * t.n
                 - (c.above + c.at_or_below) * t.cb AS DOUBLE)
            / (CAST(t.n AS DOUBLE)
               * CAST(c.above + c.at_or_below AS DOUBLE)
               * CAST(t.cb AS DOUBLE)) * 1000000.0) AS BIGINT)
        AS cell_micros
    FROM cells c CROSS JOIN tot t
    WHERE t.ca > 0 AND t.cb > 0
)
SELECT t.k AS k_groups, CAST(t.n AS BIGINT) AS n_total,
       CAST(t.k - 1 AS BIGINT) AS df,
       CAST((SELECT SUM(cell_micros) FROM terms) AS BIGINT) AS chi2_micros
FROM tot t
"""


@register(
    "stat_mood_median_test", oracle=_MOOD_ORACLE, tags=("profile", "experiment")
)
def stat_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test — the nonparametric k-sample location test that
    dichotomizes every observation against the GLOBAL median and runs a
    2×k Pearson χ² on the above/at-or-below table. Far less powerful
    than Kruskal–Wallis but valid under arbitrary group distributions
    (it only looks at the sign of x − m̂), which is why it survives as
    the robustness cross-check beside `stat_kruskal_wallis`.

    The global lower median reuses brown_forsythe's count-based kernel
    (distinct-value grain, unpartitioned cumulative window over the
    domain-bounded quant grid — never percentile_disc). Each of the 2k
    cells' (O·N − n_g·c_j)²/(N·n_g·c_j) term is one fixed IEEE
    expression over exact BIGINTs that are each < 2^53 (O·N ≤ 1e12 at
    sf1), FLOOR-quantized to micros so the k-cell sum is exact and
    order-free — the output χ² is a BIGINT, hash-stable on any engine.
    Degenerate guard: a corpus entirely on one side of its median
    (const fixture) yields ca or cb = 0 → zero-row terms → NULL
    chi2_micros, never an ANSI divide."""
    vq = F.floor(F.col("value") * F.lit(float(ANOVA_QUANT))).cast("long")
    obs = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("g"), vq.alias("vq")
    )
    dist = obs.groupBy("vq").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wcum = Window.orderBy("vq").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        dist.select(
            "vq",
            F.sum("cnt").over(wcum).alias("c"),
            F.sum("cnt").over(Window.partitionBy()).alias("n"),
        )
        .where(F.expr("2 * c >= n"))
        .agg(F.min("vq").alias("m"))
    )
    cells = (
        obs.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.sum(F.expr("CASE WHEN vq > m THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("above"),
            F.sum(F.expr("CASE WHEN vq <= m THEN 1 ELSE 0 END"))
            .cast("long")
            .alias("at_or_below"),
        )
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("above").cast("long").alias("ca"),
        F.sum("at_or_below").cast("long").alias("cb"),
        F.sum(F.col("above") + F.col("at_or_below")).cast("long").alias("n"),
    )
    terms = (
        cells.crossJoin(F.broadcast(tot))
        .where("ca > 0 AND cb > 0")
        .select(
            F.expr(
                "CAST(FLOOR("
                "CAST(above * n - (above + at_or_below) * ca AS DOUBLE)"
                " * CAST(above * n - (above + at_or_below) * ca AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(above + at_or_below AS DOUBLE)"
                " * CAST(ca AS DOUBLE)) * 1000000.0) AS BIGINT)"
                " + CAST(FLOOR("
                "CAST(at_or_below * n - (above + at_or_below) * cb AS DOUBLE)"
                " * CAST(at_or_below * n - (above + at_or_below) * cb AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(above + at_or_below AS DOUBLE)"
                " * CAST(cb AS DOUBLE)) * 1000000.0) AS BIGINT)"
            ).alias("cell_micros")
        )
    )
    return tot.crossJoin(
        F.broadcast(terms.agg(F.sum("cell_micros").alias("chi2_micros")))
    ).select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_total"),
        (F.col("k") - 1).cast("long").alias("df"),
        F.col("chi2_micros").cast("long").alias("chi2_micros"),
    )


#: ICC quantization: one decade below WELCH_QUANT because the cross-GROUP
#: sum of s_g² must stay < 2^53 with thousands of groups (users), not 5.
ICC_QUANT = 10

_ICC_ORACLE = f"""
WITH obs AS (
    SELECT user_id AS g,
           CAST(FLOOR(value * {ICC_QUANT}.0) AS BIGINT) AS vq
    FROM events
), per AS (
    SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
           CAST(SUM(vq) AS BIGINT) AS s_g,
           CAST(SUM(vq * vq) AS BIGINT) AS q_g
    FROM obs GROUP BY g
), per2 AS (
    SELECT *, (s_g * s_g - (s_g * s_g) % n_g) // n_g AS ssq_g FROM per
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS grp, SUM(n_g) AS n,
           SUM(s_g) AS s, SUM(q_g) AS q, SUM(ssq_g) AS ssq,
           SUM(n_g * n_g) AS nn
    FROM per2
), fin AS (
    SELECT grp, n,
           CAST(ssq - (s * s - (s * s) % n) // n AS BIGINT) AS ssb,
           CAST(q - ssq AS BIGINT) AS ssw,
           CAST(nn - (nn - nn % n) // n AS BIGINT) AS k0num
    FROM tot
)
SELECT CAST(grp AS BIGINT) AS n_groups, CAST(n AS BIGINT) AS n_total,
       CASE WHEN grp < 2 OR n = grp OR (ssb = 0 AND ssw = 0)
            THEN NULL ELSE ROUND(
           (CAST(ssb AS DOUBLE) / (CAST(grp AS DOUBLE) - 1.0)
            - CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(grp AS DOUBLE)))
           / (CAST(ssb AS DOUBLE) / (CAST(grp AS DOUBLE) - 1.0)
              + ((CAST(n AS DOUBLE) - CAST(k0num AS DOUBLE))
                 / (CAST(grp AS DOUBLE) - 1.0) - 1.0)
              * CAST(ssw AS DOUBLE)
              / (CAST(n AS DOUBLE) - CAST(grp AS DOUBLE))), 6)
       END AS icc1
FROM fin
"""


@register("stat_icc_oneway", oracle=_ICC_ORACLE, tags=("profile",))
def stat_icc_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way random-effects intraclass correlation ICC(1) (Shrout &
    Fleiss 1979) over per-user event values — "how much of the value
    variance is BETWEEN users": the standard reliability / clustering-
    strength statistic (and the design-effect input for clustered
    experiment sizing, deff = 1 + (m̄−1)·ICC — read beside
    stat_power_sample_size). Unbalanced groups use the k₀ mean-size
    correction (N − Σn_g²/N)/(G−1).

    anova_fold's overflow-proof algebra at the user grain: per-group
    exact integer moments at ICC_QUANT (one decade below WELCH_QUANT —
    the Σs_g² budget is paid across THOUSANDS of user groups), exact
    truncating-divide ssq via the divisible-numerator trick, and a
    final single fixed IEEE expression over exact BIGINTs each < 2^53.
    One map-combined shuffle on user_id; everything after is a 1-row
    fold. Degenerate guards: G < 2 or every group a singleton → NULL."""
    vq = F.floor(F.col("value") * F.lit(float(ICC_QUANT))).cast("long")
    per = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").alias("g"), vq.alias("vq"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("decimal(20,0)").alias("n_g"),
            F.sum(F.col("vq").cast("decimal(20,0)")).alias("s_g"),
            F.sum(F.col("vq").cast("decimal(19,0)") * F.col("vq")).alias(
                "q_g"
            ),
        )
        .withColumn("s2_g", F.expr("CAST(s_g * s_g AS DECIMAL(38,0))"))
        .withColumn(
            "ssq_g",
            F.expr("CAST((s2_g - s2_g % n_g) / n_g AS DECIMAL(32,0))"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("grp"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum("ssq_g").alias("ssq"),
        F.sum(F.expr("CAST(n_g * n_g AS DECIMAL(38,0))")).alias("nn"),
    )
    fin = (
        tot.withColumn("s2", F.expr("CAST(s * s AS DECIMAL(38,0))"))
        .select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.expr("CAST(ssq - (s2 - s2 % n) / n AS BIGINT)").alias("ssb"),
            F.expr("CAST(q - ssq AS BIGINT)").alias("ssw"),
            F.expr("CAST(nn - (nn - nn % n) / n AS BIGINT)").alias("k0num"),
        )
    )
    return fin.select(
        F.col("grp").alias("n_groups"),
        F.col("n").alias("n_total"),
        F.expr(
            "CASE WHEN grp < 2 OR n = grp OR (ssb = 0 AND ssw = 0)"
            " THEN NULL ELSE ROUND("
            "(CAST(ssb AS DOUBLE) / (CAST(grp AS DOUBLE) - 1.0)"
            " - CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(grp AS DOUBLE)))"
            " / (CAST(ssb AS DOUBLE) / (CAST(grp AS DOUBLE) - 1.0)"
            " + ((CAST(n AS DOUBLE) - CAST(k0num AS DOUBLE))"
            " / (CAST(grp AS DOUBLE) - 1.0) - 1.0)"
            " * CAST(ssw AS DOUBLE)"
            " / (CAST(n AS DOUBLE) - CAST(grp AS DOUBLE))), 6) END"
        ).alias("icc1"),
    )


#: Dunn z / p fragments shared verbatim by the Spark plan and the DuckDB
#: oracle (column names n_i/n_j/nn/t3/dm are identical in both).
_DUNN_VAR = (
    "((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 1e0) / 12e0"
    " - CAST(t3 AS DOUBLE) / (12e0 * (CAST(nn AS DOUBLE) - 1e0)))"
    " * (1e0 / CAST(n_i AS DOUBLE) + 1e0 / CAST(n_j AS DOUBLE)))"
)
_DUNN_Z = f"((CAST(dm AS DOUBLE) / 1e6 / 2e0) / SQRT({_DUNN_VAR}))"


def _dunn_exprs() -> tuple[str, str]:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        normal_cdf_sql,
    )

    guard = f"nn < 2 OR {_DUNN_VAR} <= 0e0"
    z = f"CASE WHEN {guard} THEN NULL ELSE ROUND({_DUNN_Z}, 4) END"
    phi = normal_cdf_sql(f"ABS({_DUNN_Z})")
    p = (
        f"CASE WHEN {guard} THEN NULL ELSE "
        f"ROUND(LEAST(1e0, CAST(m AS DOUBLE) * 2e0 * (1e0 - {phi})), 6) END"
    )
    return z, p


def _dunn_oracle() -> str:
    z, p = _dunn_exprs()
    return f"""
WITH vt AS (
    SELECT value, event_type AS g, CAST(COUNT(*) AS HUGEINT) AS c_g
    FROM events GROUP BY value, event_type
), v AS (
    SELECT value, SUM(c_g) AS c FROM vt GROUP BY value
), r AS (
    SELECT value, c,
           COALESCE(SUM(c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cum_before
    FROM v
), per AS (
    SELECT vt.g, SUM(vt.c_g) AS n_g,
           SUM(vt.c_g * (2 * r.cum_before + r.c + 1)) AS rs2_g
    FROM vt JOIN r ON vt.value = r.value
    GROUP BY vt.g
), tot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, SUM(n_g) AS nn FROM per
), ties AS (
    SELECT SUM(c * c * c - c) AS t3 FROM v
), pairs AS (
    SELECT a.g AS g1, b.g AS g2,
           CAST(a.n_g AS BIGINT) AS n_i, CAST(b.n_g AS BIGINT) AS n_j,
           t.nn, s.t3, t.k * (t.k - 1) // 2 AS m,
           CASE WHEN a.rs2_g * b.n_g >= b.rs2_g * a.n_g
                THEN (a.rs2_g * b.n_g - b.rs2_g * a.n_g) * 1000000
                     // (a.n_g * b.n_g)
                ELSE -((b.rs2_g * a.n_g - a.rs2_g * b.n_g) * 1000000
                     // (a.n_g * b.n_g)) END AS dm
    FROM per a JOIN per b ON a.g < b.g
    CROSS JOIN tot t CROSS JOIN ties s
)
SELECT g1, g2, n_i, n_j,
       {z} AS z_dunn,
       {p} AS p_bonferroni
FROM pairs
"""


@register(
    "stat_dunn_posthoc", oracle=_dunn_oracle(), tags=("profile", "experiment")
)
def stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc test (Dunn 1964) — the pairwise follow-up that a
    significant `stat_kruskal_wallis` demands: which groups differ?
    z_ij = (R̄_i − R̄_j)/√[(N(N+1)/12 − ΣT/(12(N−1)))·(1/n_i + 1/n_j)]
    on the SAME tie-corrected midranks KW used (using fresh pairwise
    Mann–Whitneys instead is the classic post-hoc mistake — ranks must
    come from the pooled ranking), with Bonferroni-adjusted two-sided
    p-values over the k(k−1)/2 family via the shared Φ fragment.

    Machinery: vt/v/r/per is stat_kruskal_wallis's exact-midrank kernel
    verbatim (distinct-value grain, two-phase prefix sum, integral
    doubled rank sums); the mean-rank difference is quantized through
    ONE bounded truncating division (dm micros — the Brier/KW m_g
    pattern, |dm| ≤ 2N·1e6, so no quotient grows super-linearly) and
    the k(k−1)/2 pairwise frame is a broadcast self-join of the k-row
    per-group table. Degenerate guards: N < 2 or an all-ties corpus
    (variance term 0: const fixture) → NULL z and p."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events")
    vt = ev.groupBy("value", F.col("event_type").alias("g")).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c_g")
    )
    v = vt.groupBy("value").agg(F.sum("c_g").cast("decimal(20,0)").alias("c"))
    r = running_sums(v, ["value"], {"cum_before": ("c", False)})
    per = (
        vt.join(r, "value")
        .groupBy("g")
        .agg(
            F.sum("c_g").cast("decimal(20,0)").alias("n_g"),
            F.sum(
                F.col("c_g") * (2 * F.col("cum_before") + F.col("c") + 1)
            )
            .cast("decimal(32,0)")
            .alias("rs2_g"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("decimal(20,0)").alias("nn"),
    )
    ties = v.agg(
        F.sum(
            F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")
        ).alias("t3")
    )
    a = per.select(
        F.col("g").alias("g1"),
        F.col("n_g").alias("na"),
        F.col("rs2_g").alias("rsa"),
    )
    b = per.select(
        F.col("g").alias("g2"),
        F.col("n_g").alias("nb"),
        F.col("rs2_g").alias("rsb"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("g1") < F.col("g2"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            "g1",
            "g2",
            F.col("na").cast("long").alias("n_i"),
            F.col("nb").cast("long").alias("n_j"),
            "nn",
            "t3",
            F.expr("k * (k - 1) div 2").alias("m"),
            F.expr(
                "CASE WHEN rsa * nb >= rsb * na"
                " THEN (rsa * nb - rsb * na) * 1000000 div (na * nb)"
                " ELSE -((rsb * na - rsa * nb) * 1000000 div (na * nb)) END"
            ).alias("dm"),
        )
    )
    z, p = _dunn_exprs()
    return pairs.select(
        "g1",
        "g2",
        "n_i",
        "n_j",
        F.expr(z).alias("z_dunn"),
        F.expr(p).alias("p_bonferroni"),
    )


#: Jonckheere–Terpstra z / variance fragments — shared text between the
#: Spark plan and the oracle (inputs jt2 / e2 / varx are exact integers /
#: one exact double each).
_JT_Z = "((CAST(jt2 AS DOUBLE) - CAST(e2 AS DOUBLE)) / (2e0 * SQRT(varx)))"

_JT_ORACLE = f"""
WITH vt AS (
    SELECT value, event_type AS g, CAST(COUNT(*) AS HUGEINT) AS c_g
    FROM events GROUP BY value, event_type
), dense AS (
    -- densified (value, group) grid: group i needs a cumulative AT EVERY
    -- pooled value, including values where it has no observation
    SELECT v.value, gs.g, COALESCE(vt.c_g, 0) AS c_g
    FROM (SELECT DISTINCT value FROM vt) v
    CROSS JOIN (SELECT DISTINCT g FROM vt) gs
    LEFT JOIN vt ON vt.value = v.value AND vt.g = gs.g
), grid AS (
    SELECT value, g, c_g,
           COALESCE(SUM(c_g) OVER (
               PARTITION BY g ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cb_g
    FROM dense
), pair AS (
    SELECT SUM(b.c_g * (2 * a.cb_g + a.c_g)) AS jt2
    FROM grid a JOIN vt b ON a.value = b.value AND a.g < b.g
), per AS (
    SELECT g, SUM(c_g) AS n_g FROM vt GROUP BY g
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           SUM(n_g) AS n, SUM(n_g * n_g) AS sn2,
           SUM(n_g * n_g * (2 * n_g + 3)) AS sn23
    FROM per
), ties AS (
    SELECT value, SUM(c_g) AS c FROM vt GROUP BY value
), tsum AS (
    SELECT SUM(c * c * (2 * c + 3)) AS st23 FROM ties
), fin AS (
    SELECT t.k, t.n,
           (t.n * t.n - t.sn2) // 2 AS e2,
           (CAST(t.n AS DOUBLE) * t.n * (2e0 * t.n + 3e0)
            - CAST(t.sn23 AS DOUBLE) - CAST(s.st23 AS DOUBLE)) / 72e0
               AS varx,
           p.jt2
    FROM tot t CROSS JOIN tsum s CROSS JOIN pair p
)
SELECT CAST(k AS BIGINT) AS k_groups, CAST(n AS BIGINT) AS n_total,
       CAST(jt2 AS BIGINT) AS jt2,
       CASE WHEN k < 2 OR varx <= 0e0 THEN NULL
            ELSE ROUND({_JT_Z}, 4) END AS z_jt
FROM fin
"""


@register(
    "stat_jonckheere_terpstra",
    oracle=_JT_ORACLE,
    tags=("profile", "experiment"),
)
def stat_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere–Terpstra trend test — the ORDERED-alternative k-sample
    test stat_kruskal_wallis cannot be: KW asks "any difference?", JT
    asks "do values INCREASE along the group ordering?" (groups ordered
    lexically here — the dose axis; swap in any ordinal). JT = Σ_{i<j}
    U_ij, the sum of pairwise Mann–Whitney counts, far more powerful
    than KW when the alternative is monotone (the standard dose-response
    test). Normal approximation z = (JT − E)/σ with the first-order tie
    variance (2n+3)-form; half-counted ties ride the doubled-integer
    convention (jt2 = 2·JT exact).

    Machinery: the (value, group) distinct grain carries PER-GROUP
    exclusive prefix counts (windows PARTITIONED by group over the
    domain-bounded quant grid — never a global order); 2·U_ij folds as
    Σ_v c_j(v)·(2·cb_i(v) + c_i(v)) through ONE value-aligned self-join
    of the grain with g_i < g_j — k²/2 group pairs per distinct value,
    constant in corpus size. Everything downstream is k-row algebra
    with exact HUGEINT/decimal sums; z is a single fixed double
    expression. Degenerate: all-equal values (const fixture) zero the
    variance → NULL z, and jt2 still reports the (fully tied) count."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events")
    vt = ev.groupBy("value", F.col("event_type").alias("g")).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c_g")
    )
    # densify: every group needs a cumulative at EVERY pooled value —
    # a sparse per-group prefix silently drops the cross-group mass
    # (caught by the sequential differential before first commit)
    dense = (
        vt.select("value")
        .distinct()
        .crossJoin(F.broadcast(vt.select("g").distinct()))
        .join(vt, ["value", "g"], "left")
        .select(
            "value",
            "g",
            F.coalesce(F.col("c_g"), F.lit(0).cast("decimal(20,0)")).alias(
                "c_g"
            ),
        )
    )
    grid = running_sums(
        dense, ["value"], {"cb_g": ("c_g", False)}, group_cols=("g",)
    )
    a = grid.select(
        F.col("value").alias("v"),
        F.col("g").alias("gi"),
        F.col("c_g").alias("ci"),
        F.col("cb_g").alias("cbi"),
    )
    b = vt.select(
        F.col("value").alias("v"),
        F.col("g").alias("gj"),
        F.col("c_g").alias("cj"),
    )
    pair = (
        a.join(b, (a["v"] == b["v"]) & (F.col("gi") < F.col("gj")))
        .agg(
            F.sum(
                F.expr("CAST(cj * (2 * cbi + ci) AS DECIMAL(38,0))")
            ).alias("jt2")
        )
    )
    per = vt.groupBy("g").agg(F.sum("c_g").cast("decimal(20,0)").alias("n_g"))
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("decimal(20,0)").alias("n"),
        F.sum(F.expr("CAST(n_g * n_g AS DECIMAL(38,0))")).alias("sn2"),
        F.sum(
            F.expr("CAST(n_g * n_g * (2 * n_g + 3) AS DECIMAL(38,0))")
        ).alias("sn23"),
    )
    ties = vt.groupBy("value").agg(
        F.sum("c_g").cast("decimal(20,0)").alias("c")
    )
    tsum = ties.agg(
        F.sum(
            F.expr("CAST(c * c * (2 * c + 3) AS DECIMAL(38,0))")
        ).alias("st23")
    )
    fin = (
        tot.crossJoin(F.broadcast(tsum))
        .crossJoin(F.broadcast(pair))
        .select(
            "k",
            F.col("n"),
            F.expr("CAST((n * n - sn2) div 2 AS DECIMAL(38,0))").alias("e2"),
            F.expr(
                "(CAST(n AS DOUBLE) * n * (2e0 * n + 3e0)"
                " - CAST(sn23 AS DOUBLE) - CAST(st23 AS DOUBLE)) / 72e0"
            ).alias("varx"),
            "jt2",
        )
    )
    return fin.select(
        F.col("k").alias("k_groups"),
        F.col("n").cast("long").alias("n_total"),
        F.col("jt2").cast("long").alias("jt2"),
        F.expr(
            f"CASE WHEN k < 2 OR varx <= 0e0 THEN NULL"
            f" ELSE ROUND({_JT_Z}, 4) END"
        ).alias("z_jt"),
    )


#: Cramér–von Mises two-sample exit: T = U/(n·m·(n+m)) − (4nm−1)/(6(n+m)),
#: U from doubled midranks (U4 = 4U exact); shared text both engines.
_CVM_T = (
    "(CAST(u4 AS DOUBLE) / 4e0"
    " / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)"
    "    * (CAST(n AS DOUBLE) + CAST(m AS DOUBLE)))"
    " - (4e0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE) - 1e0)"
    "   / (6e0 * (CAST(n AS DOUBLE) + CAST(m AS DOUBLE))))"
)

_CVM_ORACLE = f"""
WITH vt AS (
    SELECT value,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS HUGEINT) AS a,
           CAST(COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END)
                AS HUGEINT) AS b
    FROM events GROUP BY value
), grid AS (
    SELECT value, a, b,
           COALESCE(SUM(a + b) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cb,
           COALESCE(SUM(a) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cba,
           COALESCE(SUM(b) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cbb
    FROM vt
), terms AS (
    -- per distinct value: Σ_{{k=k0+1}}^{{k0+c}} (R − 2k)² in closed form
    -- (R = doubled pooled midrank, k = within-sample rank): the tied
    -- members are identical, so the assignment order is immaterial and
    -- the arithmetic-run sum is exact.
    SELECT
        a * (2 * cb + a + b + 1) * (2 * cb + a + b + 1)
          - 4 * (2 * cb + a + b + 1) * (a * cba + a * (a + 1) // 2)
          + 4 * (a * cba * cba + 2 * cba * (a * (a + 1) // 2)
                 + a * (a + 1) * (2 * a + 1) // 6) AS sa,
        b * (2 * cb + a + b + 1) * (2 * cb + a + b + 1)
          - 4 * (2 * cb + a + b + 1) * (b * cbb + b * (b + 1) // 2)
          + 4 * (b * cbb * cbb + 2 * cbb * (b * (b + 1) // 2)
                 + b * (b + 1) * (2 * b + 1) // 6) AS sb
    FROM grid
), fold AS (
    SELECT (SELECT SUM(a) FROM vt) AS n, (SELECT SUM(b) FROM vt) AS m,
           SUM(sa) AS ssa, SUM(sb) AS ssb
    FROM terms
), fin AS (
    SELECT CAST(n AS HUGEINT) AS n, CAST(m AS HUGEINT) AS m,
           CAST(n AS HUGEINT) * ssa + CAST(m AS HUGEINT) * ssb AS u4
    FROM fold
)
SELECT CAST(n AS BIGINT) AS n_pos, CAST(m AS BIGINT) AS n_neg,
       CASE WHEN n = 0 OR m = 0 THEN NULL
            ELSE ROUND({_CVM_T}, 6) END AS t_stat,
       CASE WHEN n = 0 OR m = 0 THEN NULL
            ELSE CAST(ROUND({_CVM_T}, 6) > 0.461 AS BIGINT) END
           AS reject_5pct
FROM fin
"""


@register(
    "stat_cramer_von_mises_2samp",
    oracle=_CVM_ORACLE,
    tags=("profile", "experiment"),
)
def stat_cramer_von_mises_2samp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises test (Anderson 1962 rank form) between
    the purchase and non-purchase value distributions — the INTEGRATED
    squared CDF distance, completing the two-sample norm family:
    Mann–Whitney sees location, KS (ml_eval_ks_separation) the single
    widest CDF gap, CvM the whole-curve L² discrepancy that catches
    distributed-everywhere differences a sup-norm misses. 5% critical
    value 0.461 (large-sample).

    Fully integer-exact: U = nΣ(r_i − i)² + mΣ(s_j − j)² is folded at
    the DISTINCT-VALUE grain with doubled midranks — within a tie block
    the members are identical so the within-sample ranks k form an
    arithmetic run whose Σ(R − 2k)² has a closed form in exact
    HUGEINT/decimal algebra (no per-row explode, no tie-order
    sensitivity by construction). One distinct fold + the two-phase
    prefix sums; T exits through one shared double expression over
    exact integers. Single-class input → NULL (degenerate class)."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    vt = (
        load(spark, sf_dir, "events")
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("decimal(20,0)")
            .alias("a"),
            F.count(F.when(F.col("event_type") != "purchase", 1))
            .cast("decimal(20,0)")
            .alias("b"),
        )
        .withColumn("ab", F.expr("CAST(a + b AS DECIMAL(20,0))"))
    )
    grid = running_sums(
        vt,
        ["value"],
        {"cb": ("ab", False), "cba": ("a", False), "cbb": ("b", False)},
    )
    terms = grid.select(
        F.expr(
            "CAST(a * (2 * cb + a + b + 1) * (2 * cb + a + b + 1)"
            " - 4 * (2 * cb + a + b + 1) * (a * cba + (a * (a + 1)) div 2)"
            " + 4 * (a * cba * cba + 2 * cba * ((a * (a + 1)) div 2)"
            " + (a * (a + 1) * (2 * a + 1)) div 6) AS DECIMAL(38,0))"
        ).alias("sa"),
        F.expr(
            "CAST(b * (2 * cb + a + b + 1) * (2 * cb + a + b + 1)"
            " - 4 * (2 * cb + a + b + 1) * (b * cbb + (b * (b + 1)) div 2)"
            " + 4 * (b * cbb * cbb + 2 * cbb * ((b * (b + 1)) div 2)"
            " + (b * (b + 1) * (2 * b + 1)) div 6) AS DECIMAL(38,0))"
        ).alias("sb"),
    )
    tot = vt.agg(
        F.sum("a").cast("decimal(20,0)").alias("n"),
        F.sum("b").cast("decimal(20,0)").alias("m"),
    )
    fin = (
        terms.agg(
            F.sum("sa").alias("ssa"), F.sum("sb").alias("ssb")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "m",
            F.expr("CAST(n * ssa + m * ssb AS DECIMAL(38,0))").alias("u4"),
        )
    )
    return fin.select(
        F.col("n").cast("long").alias("n_pos"),
        F.col("m").cast("long").alias("n_neg"),
        F.expr(
            f"CASE WHEN n = 0 OR m = 0 THEN NULL"
            f" ELSE ROUND({_CVM_T}, 6) END"
        ).alias("t_stat"),
        F.expr(
            f"CASE WHEN n = 0 OR m = 0 THEN NULL"
            f" ELSE CAST(ROUND({_CVM_T}, 6) > 0.461 AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Cliff's delta ---------------------------------------------------------
# Ordinal effect size between the purchase and non-purchase value
# distributions: delta = (#{x>y} - #{x<y}) / (n*m). Folded at the
# distinct-value grain with exclusive prefix sums (no pairwise join):
# a purchase row at value v beats exactly the non-purchase mass strictly
# below v and loses to the mass strictly above. Emitted in exact ppm
# integer units (sign * abs-div) so the cross-engine compare is
# bit-free; the magnitude label applies Romano et al. thresholds
# (0.147 / 0.33 / 0.474) to |delta| in the same integer units.

_CLIFF_ORACLE = """
WITH vt AS (
    SELECT value,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS HUGEINT) AS a,
           CAST(COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END)
                AS HUGEINT) AS b
    FROM events WHERE value IS NOT NULL GROUP BY value
), grid AS (
    SELECT a, b,
           COALESCE(SUM(b) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cbb
    FROM vt
), fold AS (
    SELECT (SELECT SUM(a) FROM vt) AS n, (SELECT SUM(b) FROM vt) AS m,
           SUM(a * cbb) AS gt,
           SUM(a * ((SELECT SUM(b) FROM vt) - cbb - b)) AS lt
    FROM grid
)
SELECT CAST(n AS BIGINT) AS n_pos, CAST(m AS BIGINT) AS n_neg,
       CASE WHEN n = 0 OR m = 0 THEN NULL
            ELSE CAST(CASE WHEN gt >= lt THEN 1 ELSE -1 END
                      * ((ABS(gt - lt) * 1000000) // (n * m)) AS BIGINT)
       END AS delta_ppm,
       CASE WHEN n = 0 OR m = 0 THEN 'undefined'
            WHEN (ABS(gt - lt) * 1000000) // (n * m) < 147000
                THEN 'negligible'
            WHEN (ABS(gt - lt) * 1000000) // (n * m) < 330000 THEN 'small'
            WHEN (ABS(gt - lt) * 1000000) // (n * m) < 474000 THEN 'medium'
            ELSE 'large'
       END AS magnitude
FROM fold
"""


@register(
    "stat_cliffs_delta",
    oracle=_CLIFF_ORACLE,
    tags=("profile", "experiment"),
)
def stat_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size (purchase vs non-purchase
    value): the dominance probability P(X>Y) - P(X<Y) that reads a
    Mann-Whitney rejection in practical units — `stat_mann_whitney`
    says WHETHER the distributions differ, this says HOW MUCH, robust
    to any monotone transform (unlike `stat_effect_sizes`' Cohen's d,
    which assumes interval scale). Romano thresholds label |delta|.

    Exact integer algebra end to end: one distinct-value fold, one
    exclusive prefix sum (`running_sums` two-phase pattern, never a
    bare global window), pair counts by block multiplication —
    #{x>y} = sum a_v * cumB(<v) — then sign * abs integer division
    into ppm units, so trunc-vs-floor never diverges on negatives and
    no double crosses the engine boundary. Scale: the grain is
    distinct values; the pairwise O(n*m) space is never materialized.
    Degenerate classes: single-class input -> NULL/'undefined'; all
    values tied -> delta 0 'negligible' by construction."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    vt = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("decimal(20,0)")
            .alias("a"),
            F.count(F.when(F.col("event_type") != "purchase", 1))
            .cast("decimal(20,0)")
            .alias("b"),
        )
    )
    grid = running_sums(vt, ["value"], {"cbb": ("b", False)})
    tot = vt.agg(
        F.sum("a").cast("decimal(20,0)").alias("n"),
        F.sum("b").cast("decimal(20,0)").alias("m"),
    )
    fold = (
        grid.crossJoin(F.broadcast(tot))
        .agg(
            F.max("n").alias("n"),
            F.max("m").alias("m"),
            F.sum(F.expr("a * cbb")).alias("gt"),
            F.sum(F.expr("a * (m - cbb - b)")).alias("lt"),
        )
    )
    ppm = "((ABS(gt - lt) * 1000000) div (n * m))"
    return fold.select(
        F.col("n").cast("long").alias("n_pos"),
        F.col("m").cast("long").alias("n_neg"),
        F.expr(
            f"CASE WHEN n = 0 OR m = 0 THEN NULL"
            f" ELSE CAST(CASE WHEN gt >= lt THEN 1 ELSE -1 END"
            f" * {ppm} AS BIGINT) END"
        ).alias("delta_ppm"),
        F.expr(
            f"CASE WHEN n = 0 OR m = 0 THEN 'undefined'"
            f" WHEN {ppm} < 147000 THEN 'negligible'"
            f" WHEN {ppm} < 330000 THEN 'small'"
            f" WHEN {ppm} < 474000 THEN 'medium'"
            f" ELSE 'large' END"
        ).alias("magnitude"),
    )


# --- D'Agostino K² omnibus normality --------------------------------------
# Finite-sample-corrected skewness (D'Agostino 1970) and kurtosis
# (Anscombe-Glynn 1983) Z transforms, combined K2 = Z1² + Z2² ~ chi²(2).
# Every transform is elementary algebra (sqrt/ln/cbrt), so both engines
# evaluate ONE shared expression text over the same (nd, g1, g2) inputs
# — the entire divergence budget is the two moment folds, same as
# stat_jarque_bera. All n-polynomials run on nd = CAST(n AS DOUBLE) so
# no engine ever multiplies BIGINTs (overflow-free at any n).

_DK2_Y = "(g1 * SQRT((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))))"
_DK2_B2 = (
    "(3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0)"
    " / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0)))"
)
_DK2_W2 = f"(-1.0 + SQRT(2.0 * ({_DK2_B2} - 1.0)))"
_DK2_DELTA = f"(1.0 / SQRT(0.5 * LN({_DK2_W2})))"
_DK2_ALPHA = f"SQRT(2.0 / ({_DK2_W2} - 1.0))"
_DK2_Z1 = (
    f"({_DK2_DELTA} * LN({_DK2_Y} / {_DK2_ALPHA}"
    f" + SQRT(({_DK2_Y} / {_DK2_ALPHA}) * ({_DK2_Y} / {_DK2_ALPHA})"
    f" + 1.0)))"
)
_DK2_EB2 = "(3.0 * (nd - 1.0) / (nd + 1.0))"
_DK2_VB2 = (
    "(24.0 * nd * (nd - 2.0) * (nd - 3.0)"
    " / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0)))"
)
_DK2_X = f"(((g2 + 3.0) - {_DK2_EB2}) / SQRT({_DK2_VB2}))"
_DK2_SB1 = (
    "(6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0))"
    " * SQRT(6.0 * (nd + 3.0) * (nd + 5.0)"
    " / (nd * (nd - 2.0) * (nd - 3.0))))"
)
_DK2_A = (
    f"(6.0 + 8.0 / {_DK2_SB1} * (2.0 / {_DK2_SB1}"
    f" + SQRT(1.0 + 4.0 / ({_DK2_SB1} * {_DK2_SB1}))))"
)
_DK2_Z2 = (
    f"(((1.0 - 2.0 / (9.0 * {_DK2_A}))"
    f" - CBRT((1.0 - 2.0 / {_DK2_A})"
    f" / (1.0 + {_DK2_X} * SQRT(2.0 / ({_DK2_A} - 4.0)))))"
    f" / SQRT(2.0 / (9.0 * {_DK2_A})))"
)
_DK2_K2 = f"({_DK2_Z1} * {_DK2_Z1} + {_DK2_Z2} * {_DK2_Z2})"
_DK2_GUARD = "n <= 8 OR m2 IS NULL OR m2 = 0"

_DK2_ORACLE = f"""
WITH mu AS (
    SELECT event_type, AVG(value) AS m, COUNT(*) AS n
    FROM events WHERE value IS NOT NULL GROUP BY event_type
), cm AS (
    SELECT e.event_type, MAX(mu.n) AS n,
           AVG(POW(e.value - mu.m, 2)) AS m2,
           AVG(POW(e.value - mu.m, 3)) AS m3,
           AVG(POW(e.value - mu.m, 4)) AS m4
    FROM events e JOIN mu ON e.event_type = mu.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
), gg AS (
    SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
           CASE WHEN m2 = 0 THEN NULL
                ELSE m3 / POW(m2, 1.5) END AS g1,
           CASE WHEN m2 = 0 THEN NULL
                ELSE m4 / POW(m2, 2) - 3.0 END AS g2,
           m2
    FROM cm
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN {_DK2_GUARD} THEN NULL
            ELSE ROUND({_DK2_Z1}, 4) END AS z_skew,
       CASE WHEN {_DK2_GUARD} THEN NULL
            ELSE ROUND({_DK2_Z2}, 4) END AS z_kurt,
       CASE WHEN {_DK2_GUARD} THEN NULL
            ELSE ROUND({_DK2_K2}, 4) END AS k2_stat,
       CASE WHEN {_DK2_GUARD} THEN NULL
            ELSE ROUND(EXP(-{_DK2_K2} / 2.0), 6) END AS p_chi2_df2,
       CASE WHEN {_DK2_GUARD} THEN NULL
            ELSE CAST(ROUND({_DK2_K2}, 4) > 5.9915 AS BIGINT)
       END AS reject_5pct
FROM gg
ORDER BY event_type
"""


@register(
    "stat_dagostino_k2",
    oracle=_DK2_ORACLE,
    tags=("profile",),
)
def stat_dagostino_k2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Agostino-Pearson K² omnibus normality test per event type —
    the finite-sample refinement of `stat_jarque_bera`: JB's g1²/g2²
    sum converges to chi²(2) slowly (kurtosis is notoriously
    long-tailed), while the D'Agostino/Anscombe-Glynn Z transforms
    normalize each moment at the observed n before squaring, which is
    what scipy.stats.normaltest ships. Same two-pass centered moment
    fold as JB (single-pass E[x4] expansion cancels catastrophically);
    everything downstream of (n, g1, g2) is ONE expression string
    shared verbatim with the oracle, so the engines cannot diverge in
    the transform algebra. p = exp(-K2/2) stays exact chi²(2) algebra.

    Scale shape: two map-side-combined scans to k rows, broadcast mean
    join between them; the transform runs on k rows. Guards: n <= 8
    (transforms undefined) or zero variance -> NULL row, matching the
    oracle CASE on both engines."""
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    mu = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.count(F.lit(1)).alias("n")
    )
    d = F.col("value") - F.col("m")
    cm = (
        ev.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.avg(F.pow(d, 2)).alias("m2"),
            F.avg(F.pow(d, 3)).alias("m3"),
            F.avg(F.pow(d, 4)).alias("m4"),
        )
    )
    gg = cm.select(
        "event_type",
        "n",
        F.col("n").cast("double").alias("nd"),
        F.expr(
            "CASE WHEN m2 = 0 THEN NULL ELSE m3 / POW(m2, 1.5) END"
        ).alias("g1"),
        F.expr(
            "CASE WHEN m2 = 0 THEN NULL ELSE m4 / POW(m2, 2) - 3.0 END"
        ).alias("g2"),
        "m2",
    )
    return gg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.expr(
            f"CASE WHEN {_DK2_GUARD} THEN NULL"
            f" ELSE ROUND({_DK2_Z1}, 4) END"
        ).alias("z_skew"),
        F.expr(
            f"CASE WHEN {_DK2_GUARD} THEN NULL"
            f" ELSE ROUND({_DK2_Z2}, 4) END"
        ).alias("z_kurt"),
        F.expr(
            f"CASE WHEN {_DK2_GUARD} THEN NULL"
            f" ELSE ROUND({_DK2_K2}, 4) END"
        ).alias("k2_stat"),
        F.expr(
            f"CASE WHEN {_DK2_GUARD} THEN NULL"
            f" ELSE ROUND(EXP(-{_DK2_K2} / 2.0), 6) END"
        ).alias("p_chi2_df2"),
        F.expr(
            f"CASE WHEN {_DK2_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_DK2_K2}, 4) > 5.9915 AS BIGINT) END"
        ).alias("reject_5pct"),
    ).orderBy("event_type")


# --- Ansari-Bradley scale test ---------------------------------------------
# Rank-based two-sample dispersion test: scores s(r) = min(r, N+1-r)
# peak at the center, so a sample concentrated in the middle scores
# high. Ties take the score OF the pooled midrank (R's ansari.test
# convention: pmin(rank, N+1-rank) over midranks), which makes the
# whole block share one score — an exact integer in DOUBLED units
# (midrank doubles are integers). The normal approximation uses the
# tie-safe finite-population moments of a sum of m draws from the
# realized score multiset, so no even/odd-N case split and no tie
# correction factor is needed: E[AB] = m*S1/N and
# Var[AB] = m*(N-m)*(N*S2 - S1²) / (N²*(N-1)) hold verbatim with ties.

_AB_Z = (
    "((CAST(ab2 AS DOUBLE)"
    " - CAST(np AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(nn AS DOUBLE))"
    " / SQRT(CAST(np AS DOUBLE) * CAST(mm AS DOUBLE)"
    " * (CAST(nn AS DOUBLE) * CAST(s2t AS DOUBLE)"
    "    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    " / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)"
    "    * (CAST(nn AS DOUBLE) - 1.0))))"
)
_AB_GUARD = (
    "np = 0 OR mm = 0 OR nn < 3 OR nn * s2t - s1 * s1 = 0"
)

_AB_ORACLE = f"""
WITH vt AS (
    SELECT value,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS HUGEINT) AS a,
           CAST(COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END)
                AS HUGEINT) AS b
    FROM events WHERE value IS NOT NULL GROUP BY value
), tot AS (
    SELECT SUM(a) AS np, SUM(b) AS mm, SUM(a + b) AS nn FROM vt
), grid AS (
    SELECT a, b, a + b AS t,
           COALESCE(SUM(a + b) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS cb
    FROM vt
), scored AS (
    SELECT a, t,
           LEAST(2 * cb + t + 1,
                 2 * ((SELECT nn FROM tot) + 1) - (2 * cb + t + 1))
               AS s2
    FROM grid
), fold AS (
    SELECT (SELECT np FROM tot) AS np, (SELECT mm FROM tot) AS mm,
           (SELECT nn FROM tot) AS nn,
           SUM(a * s2) AS ab2, SUM(t * s2) AS s1,
           SUM(t * s2 * s2) AS s2t
    FROM scored
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(mm AS BIGINT) AS n_neg,
       CAST(ab2 AS BIGINT) AS ab_stat_x2,
       CASE WHEN {_AB_GUARD} THEN NULL
            ELSE ROUND({_AB_Z}, 6) END AS z_stat,
       CASE WHEN {_AB_GUARD} THEN NULL
            ELSE CAST(ABS(ROUND({_AB_Z}, 6)) > 1.959964 AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_ansari_bradley",
    oracle=_AB_ORACLE,
    tags=("profile", "experiment"),
)
def stat_ansari_bradley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ansari-Bradley two-sample scale test (purchase vs non-purchase
    value): completes the nonparametric triad — Mann-Whitney reads
    location, Cramér-von Mises the whole curve, AB specifically the
    DISPERSION difference under equal medians, without the normality
    `stat_bartlett_test` / `stat_brown_forsythe` lean on. Scores
    min(r, N+1-r) are V-shaped, so tie blocks cannot use the
    arithmetic-run algebra of the CvM kernel; instead the R convention
    (score of the midrank) makes the block score constant — exact in
    DOUBLED integer units (2*cb + t + 1 is the doubled midrank).

    The z exit uses finite-population draw moments over the realized
    score multiset (tie-safe by construction, no parity case split);
    one shared expression string on exact integers feeds both engines.
    Scale shape: distinct-value fold, one two-phase exclusive prefix
    sum, one reduce; S2-family decimal(38) products cap out near
    n ~ 1e11 pooled rows, past which the fold's final products drop to
    doubles (documented, same budget as stat_cramer_von_mises_2samp).
    Degenerate classes: single class or all-tied values -> NULL z."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    vt = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("decimal(20,0)")
            .alias("a"),
            F.count(F.when(F.col("event_type") != "purchase", 1))
            .cast("decimal(20,0)")
            .alias("b"),
        )
        .withColumn("t", F.expr("CAST(a + b AS DECIMAL(20,0))"))
    )
    tot = vt.agg(
        F.sum("a").cast("decimal(20,0)").alias("np"),
        F.sum("b").cast("decimal(20,0)").alias("mm"),
        F.sum("t").cast("decimal(20,0)").alias("nn"),
    )
    grid = running_sums(vt, ["value"], {"cb": ("t", False)})
    scored = grid.crossJoin(F.broadcast(tot)).withColumn(
        "s2",
        F.expr(
            "LEAST(2 * cb + t + 1, 2 * (nn + 1) - (2 * cb + t + 1))"
        ),
    )
    fold = scored.agg(
        F.max("np").alias("np"),
        F.max("mm").alias("mm"),
        F.max("nn").alias("nn"),
        F.sum(F.expr("CAST(a * s2 AS DECIMAL(38,0))")).alias("ab2"),
        F.sum(F.expr("CAST(t * s2 AS DECIMAL(38,0))")).alias("s1"),
        F.sum(F.expr("CAST(t * s2 * s2 AS DECIMAL(38,0))")).alias("s2t"),
    )
    return fold.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("mm").cast("long").alias("n_neg"),
        F.col("ab2").cast("long").alias("ab_stat_x2"),
        F.expr(
            f"CASE WHEN {_AB_GUARD} THEN NULL"
            f" ELSE ROUND({_AB_Z}, 6) END"
        ).alias("z_stat"),
        F.expr(
            f"CASE WHEN {_AB_GUARD} THEN NULL"
            f" ELSE CAST(ABS(ROUND({_AB_Z}, 6)) > 1.959964 AS BIGINT)"
            f" END"
        ).alias("reject_5pct"),
    )


# --- Log-rank test ---------------------------------------------------------
# Two-group survival comparison over the ml_kaplan_meier life table:
# at each distinct event time, the treated group's observed deaths are
# compared with the hypergeometric expectation d*n1/n given the pooled
# at-risk sets; chi2(1) = (O1-E1)^2 / sum V_j. The time grain, at-risk
# prefix sums, and censoring convention are EXACTLY the KM kernel's, so
# the two operators read as one coherent survival surface.

_LOGRANK_ORACLE = """
WITH ev AS (
    SELECT user_id,
           MIN(ts) AS t0,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
           MAX(ts) AS last_ts,
           CAST(COUNT(*) AS HUGEINT) AS ec
    FROM events GROUP BY user_id
), ectot AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS nu,
           CAST(SUM(ec) AS HUGEINT) AS te
    FROM ev
), labeled AS (
    SELECT epoch_us(COALESCE(fp, last_ts) - t0) // 3600000000 AS t,
           CASE WHEN ec * (SELECT nu FROM ectot)
                     >= (SELECT te FROM ectot) THEN 1 ELSE 0 END AS grp,
           CASE WHEN fp IS NULL THEN 0 ELSE 1 END AS died
    FROM ev
), per_t AS (
    SELECT t,
           SUM(CASE WHEN grp = 1 THEN died ELSE 0 END) AS d1,
           SUM(CASE WHEN grp = 1 THEN 1 - died ELSE 0 END) AS c1,
           SUM(CASE WHEN grp = 0 THEN died ELSE 0 END) AS d0,
           SUM(CASE WHEN grp = 0 THEN 1 - died ELSE 0 END) AS c0
    FROM labeled GROUP BY t
), tot AS (
    SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n1_tot,
           SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n0_tot
    FROM labeled
), risk AS (
    SELECT t, d1, d0,
           (SELECT n1_tot FROM tot) - COALESCE(SUM(d1 + c1) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS n1,
           (SELECT n0_tot FROM tot) - COALESCE(SUM(d0 + c0) OVER (
               ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS n0
    FROM per_t
), terms AS (
    SELECT d1,
           CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0) AS e1,
           CASE WHEN n1 + n0 > 1 THEN
               CAST(d1 + d0 AS DOUBLE) * n1 * n0
               * (n1 + n0 - d1 - d0)
               / (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1))
           ELSE 0.0 END AS v
    FROM risk WHERE d1 + d0 > 0 AND n1 > 0 AND n0 > 0
), fold AS (
    SELECT (SELECT n1_tot FROM tot) AS n1_tot,
           (SELECT n0_tot FROM tot) AS n0_tot,
           COALESCE(SUM(d1), 0) AS o1, COALESCE(SUM(e1), 0.0) AS e1,
           COALESCE(SUM(v), 0.0) AS v
    FROM terms
)
SELECT CAST(n1_tot AS BIGINT) AS n_treat, CAST(n0_tot AS BIGINT) AS n_ctrl,
       CAST(o1 AS BIGINT) AS observed_treat,
       ROUND(e1, 6) AS expected_treat,
       CASE WHEN v <= 0 THEN NULL
            ELSE ROUND((o1 - e1) * (o1 - e1) / v, 4) END AS chi2_stat,
       CASE WHEN v <= 0 THEN NULL
            ELSE CAST(ROUND((o1 - e1) * (o1 - e1) / v, 4) > 3.8415
                      AS BIGINT) END AS reject_5pct
FROM fold
"""


@register(
    "stat_logrank_test",
    oracle=_LOGRANK_ORACLE,
    tags=("profile", "ml", "experiment"),
)
def stat_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test on TIME TO FIRST PURCHASE: do heavy
    users (at-or-above-mean event count, decided by exact integer
    cross-multiplication so no double boundary exists) convert on the
    same clock as light users? The hypothesis test that completes
    `ml_kaplan_meier`'s product-limit machinery — duration is hours
    from a user's first event to their first purchase, right-censored
    at the last observed event for users who never purchase (the
    correction a naive mean time-to-convert silently omits). At each
    distinct conversion time the treated conversions are scored
    against the hypergeometric expectation d·n1/n with variance
    d·n1·n0·(n−d) / (n²(n−1)), and chi²(1) = (ΣO−ΣE)²/ΣV.

    Scale shape: one groupBy(user) fold, one distinct-duration life
    table, ONE two-phase exclusive prefix sum over the bounded
    duration grain (running_sums; never a data-proportional bare
    window), one reduce. Counts stay exact integers through the prefix
    sums; E and V are double sums over the bounded grain under the
    ROUND(6)/ROUND(4) budget shared with the chi² family. Degenerate
    classes: a single group or zero observed events → NULL chi²."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("fp"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("decimal(20,0)").alias("ec"),
    )
    ectot = spans.agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("nu"),
        F.sum("ec").cast("decimal(20,0)").alias("te"),
    )
    labeled = spans.crossJoin(F.broadcast(ectot)).select(
        F.expr(
            "timestampdiff(MICROSECOND, t0, COALESCE(fp, last_ts))"
            " div 3600000000"
        ).alias("t"),
        # heavy vs light users by exact integer cross-multiply
        # (ec >= mean without ever comparing against a double)
        F.expr("CASE WHEN ec * nu >= te THEN 1 ELSE 0 END").alias("grp"),
        F.expr("CASE WHEN fp IS NULL THEN 0 ELSE 1 END").alias("died"),
    )
    per_t = labeled.groupBy("t").agg(
        F.sum(F.expr("CASE WHEN grp = 1 THEN died ELSE 0 END"))
        .cast("long")
        .alias("d1"),
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 - died ELSE 0 END"))
        .cast("long")
        .alias("c1"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN died ELSE 0 END"))
        .cast("long")
        .alias("d0"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 - died ELSE 0 END"))
        .cast("long")
        .alias("c0"),
    )
    tot = labeled.agg(
        F.sum(F.expr("CASE WHEN grp = 1 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n1_tot"),
        F.sum(F.expr("CASE WHEN grp = 0 THEN 1 ELSE 0 END"))
        .cast("long")
        .alias("n0_tot"),
    )
    grid = running_sums(
        per_t, ["t"], {"cum1": ("d1", False), "cumc1": ("c1", False),
                       "cum0": ("d0", False), "cumc0": ("c0", False)}
    )
    risk = grid.crossJoin(F.broadcast(tot)).select(
        "d1",
        "d0",
        "n1_tot",
        "n0_tot",
        F.expr("n1_tot - cum1 - cumc1").alias("n1"),
        F.expr("n0_tot - cum0 - cumc0").alias("n0"),
    )
    terms = risk.where("d1 + d0 > 0 AND n1 > 0 AND n0 > 0").select(
        "d1",
        "n1_tot",
        "n0_tot",
        F.expr("CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)").alias("e1"),
        F.expr(
            "CASE WHEN n1 + n0 > 1 THEN"
            " CAST(d1 + d0 AS DOUBLE) * n1 * n0"
            " * (n1 + n0 - d1 - d0)"
            " / (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1))"
            " ELSE 0.0 END"
        ).alias("v"),
    )
    # agg with no groupBy always yields ONE row (NULL/0 sums on an empty
    # terms frame — e.g. a fixture where every user is in one group), so
    # totals join in AFTER the fold and survive the empty case.
    fold = terms.agg(
        F.coalesce(F.sum("d1"), F.lit(0)).alias("o1"),
        F.coalesce(F.sum("e1"), F.lit(0.0)).alias("e1"),
        F.coalesce(F.sum("v"), F.lit(0.0)).alias("v"),
    ).crossJoin(F.broadcast(tot))
    return fold.select(
        F.col("n1_tot").cast("long").alias("n_treat"),
        F.col("n0_tot").cast("long").alias("n_ctrl"),
        F.col("o1").cast("long").alias("observed_treat"),
        F.round("e1", 6).alias("expected_treat"),
        F.expr(
            "CASE WHEN v <= 0 THEN NULL"
            " ELSE ROUND((o1 - e1) * (o1 - e1) / v, 4) END"
        ).alias("chi2_stat"),
        F.expr(
            "CASE WHEN v <= 0 THEN NULL"
            " ELSE CAST(ROUND((o1 - e1) * (o1 - e1) / v, 4) > 3.8415"
            " AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Nelson-Aalen cumulative hazard ----------------------------------------
# The hazard-scale twin of ml_kaplan_meier on the same conversion
# clock: H(t) = sum_{ti<=t} d_i/n_i with the binomial (Klein 1991)
# variance sum d_i*(n_i-d_i)/n_i^3. Total where KM's product hits zero (H just
# grows), and the natural input to hazard-ratio eyeballing before a
# formal stat_logrank_test readout.

_NA_ORACLE = """
WITH spans AS (
    SELECT user_id,
           MIN(ts) AS t0,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
), labeled AS (
    SELECT epoch_us(COALESCE(fp, last_ts) - t0) // 3600000000 AS t,
           CASE WHEN fp IS NULL THEN 0 ELSE 1 END AS died
    FROM spans
), per_t AS (
    SELECT t, CAST(SUM(died) AS BIGINT) AS d,
           CAST(COUNT(*) - SUM(died) AS BIGINT) AS c
    FROM labeled GROUP BY t
), risk AS (
    SELECT t, d, c,
           CAST((SELECT COUNT(*) FROM labeled) AS BIGINT)
           - COALESCE(CAST(SUM(d + c) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS BIGINT), 0) AS n_at_risk
    FROM per_t
)
SELECT t AS duration_hours, n_at_risk, d AS n_deaths,
       ROUND(SUM(CAST(d AS DOUBLE) / n_at_risk) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 6) AS cum_hazard,
       ROUND(SUM(CAST(d AS DOUBLE) * (n_at_risk - d)
                 / (CAST(n_at_risk AS DOUBLE) * n_at_risk * n_at_risk))
             OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ), 6) AS var_hazard
FROM risk
WHERE n_at_risk > 0
"""


@register(
    "survival_nelson_aalen",
    oracle=_NA_ORACLE,
    tags=("profile", "ml"),
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator on the conversion clock
    shared with `ml_kaplan_meier` / `stat_logrank_test` (hours from
    first event to first purchase, right-censored at last event):
    H(t) = Σ d/n with the binomial (Klein) variance Σ d(n−d)/n³. KM's product-limit S(t)
    collapses to exactly 0 the moment every at-risk subject converts
    (its zero-factor guard); H keeps resolving the hazard structure
    past that point, and exp(−H) is the Fleming-Harrington survival
    alternative a consumer can derive row-wise.

    Scale shape: identical to the KM kernel — one user fold, life
    table on the bounded distinct-duration grain, at-risk counts from
    the prior-row running sum, two running sums of exact-integer
    ratios on that bounded grain. No data-proportional window."""
    ev = load(spark, sf_dir, "events")
    labeled = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("t0"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("fp"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            F.expr(
                "timestampdiff(MICROSECOND, t0, COALESCE(fp, last_ts))"
                " div 3600000000"
            ).alias("t"),
            F.expr("CASE WHEN fp IS NULL THEN 0 ELSE 1 END").alias("died"),
        )
    )
    per_t = labeled.groupBy("t").agg(
        F.sum("died").cast("long").alias("d"),
        (F.count(F.lit(1)) - F.sum("died")).cast("long").alias("c"),
    )
    total = labeled.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    prior = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        (
            F.col("n_total")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(prior), F.lit(0))
        )
        .cast("long")
        .alias("n_at_risk"),
    )
    return risk.where(F.col("n_at_risk") > 0).select(
        F.col("t").alias("duration_hours"),
        "n_at_risk",
        F.col("d").alias("n_deaths"),
        F.round(
            F.sum(F.expr("CAST(d AS DOUBLE) / n_at_risk")).over(run), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum(
                F.expr(
                    "CAST(d AS DOUBLE) * (n_at_risk - d)"
                    " / (CAST(n_at_risk AS DOUBLE) * n_at_risk * n_at_risk)"
                )
            ).over(run),
            6,
        ).alias("var_hazard"),
    )


# --- Cochran-Mantel-Haenszel test + MH pooled odds ratio -------------------
# Stratified 2x2 association: does urgent priority associate with
# order failure AFTER controlling for market segment? Per stratum the
# 2x2 cell counts are one conditional-count fold; the CMH statistic
# scores sum(a - E[a]) against the hypergeometric variance with the
# standard 0.5 continuity correction, and the Mantel-Haenszel pooled
# odds ratio sum(ad/N)/sum(bc/N) is the confounding-adjusted effect.

_CMH_CHI2 = (
    "(POW(GREATEST(ABS(sa - se) - 0.5, 0.0), 2) / sv)"
)
_CMH_GUARD = "sv <= 0"

_CMH_ORACLE = f"""
WITH j AS (
    SELECT c.c_mktsegment AS stratum,
           CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END AS exposed,
           CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), cells AS (
    SELECT stratum,
           CAST(SUM(exposed * bad) AS BIGINT) AS a,
           CAST(SUM(exposed * (1 - bad)) AS BIGINT) AS b,
           CAST(SUM((1 - exposed) * bad) AS BIGINT) AS cc,
           CAST(SUM((1 - exposed) * (1 - bad)) AS BIGINT) AS d
    FROM j GROUP BY stratum
), terms AS (
    SELECT a,
           CAST(a + b AS DOUBLE) * (a + cc) / (a + b + cc + d) AS e,
           CAST(a + b AS DOUBLE) * (cc + d) * (a + cc) * (b + d)
           / (POW(CAST(a + b + cc + d AS DOUBLE), 2)
              * (a + b + cc + d - 1)) AS v,
           CAST(a AS DOUBLE) * d / (a + b + cc + d) AS r,
           CAST(b AS DOUBLE) * cc / (a + b + cc + d) AS s
    FROM cells WHERE a + b + cc + d > 1
), fold AS (
    SELECT CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS k,
           COALESCE(SUM(a), 0) AS sa, COALESCE(SUM(e), 0.0) AS se,
           COALESCE(SUM(v), 0.0) AS sv,
           COALESCE(SUM(r), 0.0) AS sr, COALESCE(SUM(s), 0.0) AS ss
    FROM terms
)
SELECT k AS n_strata, CAST(sa AS BIGINT) AS exposed_bad,
       ROUND(se, 6) AS expected,
       CASE WHEN {_CMH_GUARD} THEN NULL
            ELSE ROUND({_CMH_CHI2}, 4) END AS cmh_chi2,
       CASE WHEN {_CMH_GUARD} THEN NULL
            ELSE CAST(ROUND({_CMH_CHI2}, 4) > 3.8415 AS BIGINT)
       END AS reject_5pct,
       CASE WHEN ss <= 0 THEN NULL
            ELSE ROUND(sr / ss, 6) END AS or_mh
FROM fold
"""


@register(
    "stat_mantel_haenszel",
    oracle=_CMH_ORACLE,
    tags=("profile", "experiment"),
)
def stat_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 test with the MH pooled
    odds ratio: urgent-priority vs order-failure association
    CONTROLLING for market segment — the confounder-adjusted reading
    that a marginal `stat_g_test` / chi² cannot give (Simpson's
    reversal is exactly the failure mode this guards). Continuity-
    corrected chi²(1) = (|Σa − ΣE| − ½)² / ΣV with hypergeometric
    per-stratum variance; OR_MH = Σ(ad/N) / Σ(bc/N).

    Scale shape: one dim-broadcast join, one conditional-count fold to
    the stratum grain (k rows), one reduce of closed-form per-stratum
    terms. Cell counts are exact integers; E/V/OR terms are doubles on
    the bounded stratum grain under the chi²-family ROUND budget.
    Degenerate classes: single-subject strata are excluded (N>1
    required by V's denominator); all-zero variance → NULL."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("stratum")
    )
    j = (
        load(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "stratum",
            F.expr(
                "CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
                " THEN 1 ELSE 0 END"
            ).alias("exposed"),
            F.expr(
                "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"
            ).alias("bad"),
        )
    )
    cells = j.groupBy("stratum").agg(
        F.sum(F.expr("exposed * bad")).cast("long").alias("a"),
        F.sum(F.expr("exposed * (1 - bad)")).cast("long").alias("b"),
        F.sum(F.expr("(1 - exposed) * bad")).cast("long").alias("cc"),
        F.sum(F.expr("(1 - exposed) * (1 - bad)")).cast("long").alias("d"),
    )
    terms = cells.where("a + b + cc + d > 1").select(
        "a",
        F.expr(
            "CAST(a + b AS DOUBLE) * (a + cc) / (a + b + cc + d)"
        ).alias("e"),
        F.expr(
            "CAST(a + b AS DOUBLE) * (cc + d) * (a + cc) * (b + d)"
            " / (POW(CAST(a + b + cc + d AS DOUBLE), 2)"
            " * (a + b + cc + d - 1))"
        ).alias("v"),
        F.expr("CAST(a AS DOUBLE) * d / (a + b + cc + d)").alias("r"),
        F.expr("CAST(b AS DOUBLE) * cc / (a + b + cc + d)").alias("s"),
    )
    kcount = cells.agg(F.count(F.lit(1)).cast("long").alias("k"))
    fold = terms.agg(
        F.coalesce(F.sum("a"), F.lit(0)).alias("sa"),
        F.coalesce(F.sum("e"), F.lit(0.0)).alias("se"),
        F.coalesce(F.sum("v"), F.lit(0.0)).alias("sv"),
        F.coalesce(F.sum("r"), F.lit(0.0)).alias("sr"),
        F.coalesce(F.sum("s"), F.lit(0.0)).alias("ss"),
    ).crossJoin(F.broadcast(kcount))
    return fold.select(
        F.col("k").alias("n_strata"),
        F.col("sa").cast("long").alias("exposed_bad"),
        F.round("se", 6).alias("expected"),
        F.expr(
            f"CASE WHEN {_CMH_GUARD} THEN NULL"
            f" ELSE ROUND({_CMH_CHI2}, 4) END"
        ).alias("cmh_chi2"),
        F.expr(
            f"CASE WHEN {_CMH_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_CMH_CHI2}, 4) > 3.8415 AS BIGINT) END"
        ).alias("reject_5pct"),
        F.expr(
            "CASE WHEN ss <= 0 THEN NULL ELSE ROUND(sr / ss, 6) END"
        ).alias("or_mh"),
    )


# --- Cochran's Q test -------------------------------------------------------
# Repeated-measures binary outcomes: does engagement incidence differ
# across event types when every user is their own control? The k
# "treatments" are event types, x_ut = 1 iff user u emitted type t.
# Q = k(k-1) * (k*sumC2 - T^2) / (k*T - sumR2) with T = total
# successes, sumC2 = sum of squared column (type) totals, sumR2 = sum
# of squared row (user) totals — every term an exact integer from two
# folds of the distinct (user, type) presence frame.

_CQ_Q = (
    "(CAST((k - 1) * (k * sc2 - tt * tt) AS DOUBLE)"
    " / CAST(k * tt - sr2 AS DOUBLE))"
)
_CQ_GUARD = "k < 2 OR k * tt - sr2 = 0"

_CQ_ORACLE = f"""
WITH cnt AS (
    SELECT user_id, event_type, CAST(COUNT(*) AS HUGEINT) AS n_ut
    FROM events GROUP BY user_id, event_type
), nu AS (
    SELECT CAST(COUNT(DISTINCT user_id) AS HUGEINT) AS nu FROM events
), tj AS (
    SELECT event_type, CAST(SUM(n_ut) AS HUGEINT) AS tp
    FROM cnt GROUP BY event_type
), k AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k FROM tj
), pres AS (
    SELECT cnt.user_id, cnt.event_type
    FROM cnt JOIN tj ON cnt.event_type = tj.event_type
    WHERE cnt.n_ut * (SELECT nu FROM nu) >= tj.tp
), rowsum AS (
    SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS r
    FROM pres GROUP BY user_id
), colsum AS (
    SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS c
    FROM pres GROUP BY event_type
), fold AS (
    SELECT (SELECT k FROM k) AS k,
           COALESCE((SELECT SUM(r) FROM rowsum), 0) AS tt,
           COALESCE((SELECT SUM(r * r) FROM rowsum), 0) AS sr2,
           COALESCE((SELECT SUM(c * c) FROM colsum), 0) AS sc2,
           (SELECT nu FROM nu) AS n_users
)
SELECT CAST(n_users AS BIGINT) AS n_users, CAST(k AS BIGINT) AS k_types,
       CASE WHEN {_CQ_GUARD} THEN NULL
            ELSE ROUND({_CQ_Q}, 4) END AS q_stat,
       CASE WHEN {_CQ_GUARD} THEN NULL
            ELSE CAST(ROUND({_CQ_Q}, 4) >
                 CASE CAST(k AS BIGINT)
                      WHEN 2 THEN 3.8415 WHEN 3 THEN 5.9915
                      WHEN 4 THEN 7.8147 WHEN 5 THEN 9.4877
                      WHEN 6 THEN 11.0705 WHEN 7 THEN 12.5916
                      WHEN 8 THEN 14.0671 WHEN 9 THEN 15.5073
                      ELSE 16.9190 END AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_cochran_q",
    oracle=_CQ_ORACLE,
    tags=("profile", "experiment"),
)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test for k related binary samples: with each user
    as their own control, is the probability of being a HEAVY emitter
    (at-or-above-mean event count for that type, decided by exact
    integer cross-multiplication — raw presence is vacuous on an
    always-active corpus where kT = ΣR² exactly) constant across the
    k event types? The repeated-measures extension of McNemar
    (`stat_mcnemar_test` is exactly Q at k=2) and the binary analogue
    of `stat_friedman_test` — completing the within-subject family.
    Q = (k−1)(kΣC² − T²) / (kT − ΣR²) ~ chi²(k−1).

    Exact integer algebra: one (user, type) count fold, per-type
    totals as a k-row broadcast, row/column sums and their squares
    from two grouped folds; Q's numerator and denominator are exact
    decimal polynomials with ONE double division at the exit. The
    chi²(k−1) critical value is selected by a CASE over the observed
    k (df ≤ 10 tabulated, the classical-table convention used across
    this module). Users absent from the heavy frame contribute R=0
    exactly as the formula requires. Scale: every fold is map-side
    combinable; the user grain never leaves its aggregation.
    Degenerate classes: k=1 or all-R∈{0,k} (denominator 0) → NULL."""
    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n_ut")
    )
    nuf = ev.agg(
        F.countDistinct("user_id").cast("decimal(20,0)").alias("nu")
    )
    tj = cnt.groupBy("event_type").agg(
        F.sum("n_ut").cast("decimal(20,0)").alias("tp")
    )
    kf = tj.agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("k"))
    pres = (
        cnt.join(F.broadcast(tj), "event_type")
        .crossJoin(F.broadcast(nuf))
        .where("n_ut * nu >= tp")
        .select("user_id", "event_type")
    )
    rowsum = pres.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("r")
    )
    colsum = pres.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c")
    )
    rfold = rowsum.agg(
        F.coalesce(F.sum("r"), F.lit(0)).cast("decimal(38,0)").alias("tt"),
        F.coalesce(F.sum(F.expr("r * r")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sr2"),
    )
    cfold = colsum.agg(
        F.coalesce(F.sum(F.expr("c * c")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sc2")
    )
    fold = (
        rfold.crossJoin(F.broadcast(cfold))
        .crossJoin(F.broadcast(kf))
        .crossJoin(F.broadcast(nuf))
    )
    return fold.select(
        F.col("nu").cast("long").alias("n_users"),
        F.col("k").cast("long").alias("k_types"),
        F.expr(
            f"CASE WHEN {_CQ_GUARD} THEN NULL"
            f" ELSE ROUND({_CQ_Q}, 4) END"
        ).alias("q_stat"),
        F.expr(
            f"CASE WHEN {_CQ_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_CQ_Q}, 4) >"
            f" CASE CAST(k AS BIGINT)"
            f" WHEN 2 THEN 3.8415 WHEN 3 THEN 5.9915"
            f" WHEN 4 THEN 7.8147 WHEN 5 THEN 9.4877"
            f" WHEN 6 THEN 11.0705 WHEN 7 THEN 12.5916"
            f" WHEN 8 THEN 14.0671 WHEN 9 THEN 15.5073"
            f" ELSE 16.9190 END AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Tukey-Kramer HSD -------------------------------------------------------
# All-pairs post-hoc after ANOVA on the parametric track: q_ij =
# |m_i - m_j| / sqrt((MSE/2)(1/n_i + 1/n_j)) against the studentized-
# range critical value q_{k,inf,0.05} (the df=inf row is the honest
# asymptote at engine scale where N-k is astronomically large). The
# nonparametric siblings are stat_dunn_posthoc (rank-based) and
# stat_games_howell-style Welch corrections; HSD is the equal-variance
# classic every stats text reaches for first.

_HSD_Q = (
    "(ABS(m_a - m_b) / SQRT((mse / 2.0) * (1.0 / n_a + 1.0 / n_b)))"
)
_HSD_CRIT = (
    "CASE k WHEN 2 THEN 2.7718 WHEN 3 THEN 3.3145 WHEN 4 THEN 3.6332"
    " WHEN 5 THEN 3.8577 WHEN 6 THEN 4.0301 WHEN 7 THEN 4.1696"
    " WHEN 8 THEN 4.2862 WHEN 9 THEN 4.3866 ELSE 4.4745 END"
)
_HSD_GUARD = "mse <= 0 OR n_a < 2 OR n_b < 2"

_HSD_ORACLE = f"""
WITH g AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, AVG(value) AS m,
           SUM(value * value) - COUNT(*) * AVG(value) * AVG(value) AS ssw
    FROM events WHERE value IS NOT NULL GROUP BY event_type
), pool AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(ssw) AS ssw_tot,
           SUM(n) AS n_tot
    FROM g
), mse AS (
    SELECT k, CASE WHEN n_tot > k THEN ssw_tot / (n_tot - k)
                   ELSE NULL END AS mse
    FROM pool
), pairs AS (
    SELECT a.event_type AS group_a, b.event_type AS group_b,
           a.n AS n_a, b.n AS n_b, a.m AS m_a, b.m AS m_b,
           (SELECT k FROM mse) AS k, (SELECT mse FROM mse) AS mse
    FROM g a JOIN g b ON a.event_type < b.event_type
)
SELECT group_a, group_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       ROUND(m_a - m_b, 6) AS mean_diff,
       CASE WHEN {_HSD_GUARD} THEN NULL
            ELSE ROUND({_HSD_Q}, 4) END AS q_stat,
       CASE WHEN {_HSD_GUARD} THEN NULL
            ELSE CAST(ROUND({_HSD_Q}, 4) > {_HSD_CRIT} AS BIGINT)
       END AS reject_5pct
FROM pairs ORDER BY group_a, group_b
"""


@register(
    "stat_tukey_hsd",
    oracle=_HSD_ORACLE,
    tags=("profile", "experiment"),
)
def stat_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD all-pairs comparison of event-type value means
    — the parametric post-hoc that answers WHICH groups differ after
    an omnibus F/Welch rejection, with family-wise error controlled by
    the studentized-range distribution instead of `stat_dunn_posthoc`'s
    Bonferroni-on-ranks. Unequal n handled by the Kramer form
    q = |Δm| / sqrt((MSE/2)(1/n_a + 1/n_b)); critical values are the
    df=∞ studentized-range 5% row selected by the observed k (at
    engine scale N−k dwarfs any finite-df row — the honest asymptote,
    same convention as the module's chi² tables).

    Scale shape: ONE conditional fold of the fact table to the k-row
    group grain (count/mean/SS per group, Welford-free expanded form),
    pooled MSE as a 1-row broadcast, and the pair frame is a k×k
    self-join of the BOUNDED group table — never a fact-table join.
    Degenerate classes: zero MSE (all constant) or a group with n<2 →
    NULL q; k=1 → zero pair rows."""
    g = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("value").alias("m"),
            F.expr(
                "SUM(value * value) - COUNT(*) * AVG(value) * AVG(value)"
            ).alias("ssw"),
        )
    )
    pool = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.expr(
            "CASE WHEN SUM(n) > COUNT(*) THEN SUM(ssw) / (SUM(n) - COUNT(*))"
            " ELSE NULL END"
        ).alias("mse"),
    )
    a = g.select(
        F.col("event_type").alias("group_a"),
        F.col("n").alias("n_a"),
        F.col("m").alias("m_a"),
    )
    b = g.select(
        F.col("event_type").alias("group_b"),
        F.col("n").alias("n_b"),
        F.col("m").alias("m_b"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(pool))
    )
    return pairs.select(
        "group_a",
        "group_b",
        "n_a",
        "n_b",
        F.round(F.expr("m_a - m_b"), 6).alias("mean_diff"),
        F.expr(
            f"CASE WHEN {_HSD_GUARD} THEN NULL"
            f" ELSE ROUND({_HSD_Q}, 4) END"
        ).alias("q_stat"),
        F.expr(
            f"CASE WHEN {_HSD_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_HSD_Q}, 4) > {_HSD_CRIT} AS BIGINT) END"
        ).alias("reject_5pct"),
    ).orderBy("group_a", "group_b")


# --- Fligner-Killeen test ---------------------------------------------------
# The most-robust rung of the variance-homogeneity ladder (Conover,
# Johnson & Johnson 1981 simulation study; scipy.stats.fligner):
# normal scores a(r) = PHI^-1(0.5 + r/(2(N+1))) of the pooled midranks
# of |x - median_g|, X2 = (sum_g S_g^2/n_g - N*abar^2) / s^2 ~
# chi2(k-1). PHI^-1 is Acklam's rational approximation (|eps| < 1.2e-9,
# public domain) emitted as ONE expression string shared verbatim by
# both engines — identical IEEE trees, so the scores cannot diverge.


def _acklam_upper_half(p: str) -> str:
    """Inverse normal CDF for p in (0.5, 1) — Acklam's two-branch
    rational approximation (central |p-0.5| <= 0.47575, else upper
    tail), as a SQL expression string over the sub-expression ``p``."""
    q = f"({p} - 0.5)"
    r = f"({q} * {q})"
    central_num = (
        f"((((( -3.969683028665376e+01 * {r} + 2.209460984245205e+02)"
        f" * {r} - 2.759285104469687e+02) * {r} + 1.383577518672690e+02)"
        f" * {r} - 3.066479806614716e+01) * {r} + 2.506628277459239e+00)"
        f" * {q}"
    )
    central_den = (
        f"((((( -5.447609879822406e+01 * {r} + 1.615858368580409e+02)"
        f" * {r} - 1.556989798598866e+02) * {r} + 6.680131188771972e+01)"
        f" * {r} - 1.328068155288572e+01) * {r} + 1.0)"
    )
    t = f"SQRT(-2.0 * LN(1.0 - {p}))"
    tail_num = (
        f"(((( -7.784894002430293e-03 * {t} - 3.223964580411365e-01)"
        f" * {t} - 2.400758277161838e+00) * {t} - 2.549732539343734e+00)"
        f" * {t} + 4.374664141464968e+00) * {t} + 2.938163982698783e+00"
    )
    tail_den = (
        f"((((7.784695709041462e-03 * {t} + 3.224671290700398e-01)"
        f" * {t} + 2.445134137142996e+00) * {t} + 3.754408661907416e+00)"
        f" * {t} + 1.0)"
    )
    return (
        f"(CASE WHEN {p} <= 0.97575"
        f" THEN ({central_num}) / ({central_den})"
        f" ELSE -(({tail_num})) / ({tail_den}) END)"
    )


#: normal score from the DOUBLED midrank R2 and pooled N:
#: p = 0.5 + (R2/2) / (2(N+1)) = 0.5 + R2 / (4(N+1))
_FK_P = "(0.5 + CAST(r2 AS DOUBLE) / (4.0 * (CAST(nn AS DOUBLE) + 1.0)))"
_FK_SCORE = None  # assigned below (needs the helper above)
_FK_SCORE = _acklam_upper_half(_FK_P)

_FK_X2 = "((sgq - nn * abar * abar) / s2)"
#: the zero-variance decision is STRUCTURAL (ndist < 2 exact-integer
#: distinct-deviation count), never a float-sign read: with one
#: distinct deviation the true s2 is identically 0 but each engine's
#: cancellation residue lands on a different side of 0.0 (const-
#: fixture catch); with >= 2 distinct scores s2 is O(1)-positive.
_FK_GUARD = "nn < 2 OR k < 2 OR ndist < 2 OR s2 IS NULL OR s2 <= 0"
_FK_CRIT = (
    "CASE k WHEN 2 THEN 3.8415 WHEN 3 THEN 5.9915 WHEN 4 THEN 7.8147"
    " WHEN 5 THEN 9.4877 WHEN 6 THEN 11.0705 WHEN 7 THEN 12.5916"
    " WHEN 8 THEN 14.0671 WHEN 9 THEN 15.5073 WHEN 10 THEN 16.9190"
    " ELSE 18.3070 END"
)

_FK_ORACLE = f"""
WITH obs AS (
    SELECT event_type AS g,
           CAST(FLOOR(value * {ANOVA_QUANT}) AS BIGINT) AS vq
    FROM events WHERE value IS NOT NULL
), dist AS (
    SELECT g, vq, CAST(COUNT(*) AS HUGEINT) AS cnt
    FROM obs GROUP BY g, vq
), cum AS (
    SELECT g, vq, cnt,
           SUM(cnt) OVER (PARTITION BY g ORDER BY vq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
           SUM(cnt) OVER (PARTITION BY g) AS n_g
    FROM dist
), med AS (
    SELECT g, MIN(vq) AS m_g FROM cum WHERE 2 * c >= n_g GROUP BY g
), dev AS (
    SELECT o.g, ABS(o.vq - med.m_g) AS a
    FROM obs o JOIN med ON o.g = med.g
), devg AS (
    SELECT g, a, CAST(COUNT(*) AS HUGEINT) AS cnt
    FROM dev GROUP BY g, a
), grid AS (
    SELECT a, SUM(cnt) AS t,
           COALESCE(SUM(SUM(cnt)) OVER (ORDER BY a
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM devg GROUP BY a
), scored AS (
    SELECT a, 2 * cb + t + 1 AS r2,
           (SELECT SUM(t) FROM grid) AS nn
    FROM grid
), sc AS (
    SELECT a, {_FK_SCORE} AS s FROM scored
), pg AS (
    SELECT devg.g, SUM(devg.cnt * sc.s) AS s_g,
           CAST(SUM(devg.cnt) AS DOUBLE) AS n_g,
           SUM(devg.cnt * sc.s * sc.s) AS q_g
    FROM devg JOIN sc ON devg.a = sc.a
    GROUP BY devg.g
), fold AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k, SUM(n_g) AS nn,
           (SELECT COUNT(*) FROM grid) AS ndist,
           SUM(s_g) / SUM(n_g) AS abar,
           SUM(s_g * s_g / n_g) AS sgq,
           CASE WHEN SUM(n_g) > 1 THEN
               (SUM(q_g) - SUM(s_g) * SUM(s_g) / SUM(n_g))
               / (SUM(n_g) - 1)
           ELSE NULL END AS s2
    FROM pg
)
SELECT k AS k_groups, CAST(nn AS BIGINT) AS n_total,
       CASE WHEN {_FK_GUARD} THEN NULL
            ELSE ROUND({_FK_X2}, 4) END AS fk_chi2,
       CASE WHEN {_FK_GUARD} THEN NULL
            ELSE CAST(ROUND({_FK_X2}, 4) > {_FK_CRIT} AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_fligner_killeen",
    oracle=_FK_ORACLE,
    tags=("profile", "experiment"),
)
def stat_fligner_killeen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fligner-Killeen variance-homogeneity test across event types —
    the top, most-robust rung of the ladder `stat_bartlett_test` →
    `stat_levene_variance` → `stat_brown_forsythe` → here: normal
    scores of the pooled midranks of |x − median_g| make the statistic
    distribution-free in location AND resistant to outliers, which is
    why scipy's fligner() is the recommendation when normality is
    doubtful. X² = (Σ S_g²/n_g − N·ā²)/s² ~ chi²(k−1).

    Engine shape: the Brown-Forsythe lower-median kernel (count-based
    over the per-group quantized distinct grid — never an engine
    quantile), deviations fold to the (group, deviation) distinct
    grain, ONE pooled prefix sum gives doubled midranks (exact
    integers), and PHI⁻¹ is Acklam's rational approximation emitted as
    one expression string shared verbatim with the oracle (identical
    IEEE trees; |approx err| < 1.2e-9, far inside the ROUND(4) exit).
    Tie blocks share a midrank hence a score, so all score sums run on
    the bounded distinct-deviation grain. Degenerate classes: k<2,
    N<2, or zero score variance (all deviations tied — e.g. constant
    values) → NULL."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    vq = F.floor(F.col("value") * F.lit(float(ANOVA_QUANT))).cast("long")
    obs = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(F.col("event_type").alias("g"), vq.alias("vq"))
    )
    dist = obs.groupBy("g", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.partitionBy("g").orderBy("vq").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = dist.select(
        "g",
        "vq",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("n_g"),
    )
    med = (
        cum.where(F.expr("2 * c >= n_g"))
        .groupBy("g")
        .agg(F.min("vq").alias("m_g"))
    )
    devg = (
        obs.join(F.broadcast(med), "g")
        .select("g", F.abs(F.col("vq") - F.col("m_g")).alias("a"))
        .groupBy("g", "a")
        .agg(F.count(F.lit(1)).cast("decimal(20,0)").alias("cnt"))
    )
    grid = devg.groupBy("a").agg(
        F.sum("cnt").cast("decimal(20,0)").alias("t")
    )
    grid = running_sums(grid, ["a"], {"cb": ("t", False)})
    nntot = grid.agg(F.sum("t").cast("decimal(20,0)").alias("nn"))
    sc = grid.crossJoin(F.broadcast(nntot)).select(
        "a",
        F.expr("2 * cb + t + 1").alias("r2"),
        "nn",
    ).select("a", F.expr(_FK_SCORE).alias("s"))
    pg = (
        devg.join(sc, "a")
        .groupBy("g")
        .agg(
            F.sum(F.expr("cnt * s")).alias("s_g"),
            F.sum("cnt").cast("double").alias("n_g"),
            F.sum(F.expr("cnt * s * s")).alias("q_g"),
        )
    )
    nd = grid.agg(F.count(F.lit(1)).cast("long").alias("ndist"))
    fold = pg.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").alias("nn"),
        F.expr("SUM(s_g) / SUM(n_g)").alias("abar"),
        F.expr("SUM(s_g * s_g / n_g)").alias("sgq"),
        F.expr(
            "CASE WHEN SUM(n_g) > 1 THEN"
            " (SUM(q_g) - SUM(s_g) * SUM(s_g) / SUM(n_g))"
            " / (SUM(n_g) - 1) ELSE NULL END"
        ).alias("s2"),
    ).crossJoin(F.broadcast(nd))
    return fold.select(
        F.col("k").alias("k_groups"),
        F.col("nn").cast("long").alias("n_total"),
        F.expr(
            f"CASE WHEN {_FK_GUARD} THEN NULL"
            f" ELSE ROUND({_FK_X2}, 4) END"
        ).alias("fk_chi2"),
        F.expr(
            f"CASE WHEN {_FK_GUARD} THEN NULL"
            f" ELSE CAST(ROUND({_FK_X2}, 4) > {_FK_CRIT} AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Wilcoxon signed-rank test ---------------------------------------------
# The PAIRED rank test the suite lacked (stat_mann_whitney is the
# unpaired sibling): per user, the click-vs-view average-value gap in
# exact integer micro-units (truncating (s*1e6) div n on the decimal
# sums — never a double subtraction, so the tie structure is engine-
# invariant), then midranks of |d| over the distinct-|d| grain and the
# normal approximation with the standard tie correction
# Var = m(m+1)(2m+1)/24 - sum t(t^2-1)/48. Zeros drop (Wilcoxon's
# convention); W+ stays an exact integer in DOUBLED rank units.

_WSR_Z = (
    "((CAST(wp2 AS DOUBLE) / 2.0"
    " - CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0) / 4.0)"
    " / SQRT(CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) + 1.0)"
    " * (2.0 * CAST(m AS DOUBLE) + 1.0) / 24.0"
    " - CAST(tcorr AS DOUBLE) / 48.0))"
)
#: Var(W+) = [2m(m+1)(2m+1) - tcorr] / 48; the tie-corrected variance
#: is strictly positive for any m >= 1 (even a single all-m tie block
#: leaves m(m+1)(3m+3)/48), so the second clause is a belt-and-braces
#: exact-integer guard, not a reachable branch.
_WSR_GUARD = (
    "m < 1 OR 2 * m * (m + 1) * (2 * m + 1) - tcorr <= 0"
)

_WSR_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           SUM(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(value * 1000000) AS HUGEINT) END)
               AS s_c,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_c,
           SUM(CASE WHEN event_type = 'view'
                    THEN CAST(FLOOR(value * 1000000) AS HUGEINT) END)
               AS s_v,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_v
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
), diffs AS (
    SELECT (CASE WHEN s_c >= 0 THEN s_c // n_c
                 ELSE -((-s_c) // n_c) END)
           - (CASE WHEN s_v >= 0 THEN s_v // n_v
                   ELSE -((-s_v) // n_v) END) AS d
    FROM per_user WHERE n_c > 0 AND n_v > 0
), nz AS (
    SELECT d, ABS(d) AS ad FROM diffs WHERE d <> 0
), grid AS (
    SELECT ad, CAST(COUNT(*) AS HUGEINT) AS t,
           CAST(COUNT(CASE WHEN d > 0 THEN 1 END) AS HUGEINT) AS tp,
           COALESCE(SUM(CAST(COUNT(*) AS HUGEINT)) OVER (ORDER BY ad
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
    FROM nz GROUP BY ad
), fold AS (
    SELECT COALESCE(SUM(t), 0) AS m,
           COALESCE(SUM(tp * (2 * cb + t + 1)), 0) AS wp2,
           COALESCE(SUM(t * (t * t - 1)), 0) AS tcorr
    FROM grid
)
SELECT CAST(m AS BIGINT) AS n_nonzero_pairs,
       CAST(wp2 AS BIGINT) AS w_plus_x2,
       CASE WHEN {_WSR_GUARD} THEN NULL
            ELSE ROUND({_WSR_Z}, 6) END AS z_stat,
       CASE WHEN {_WSR_GUARD} THEN NULL
            ELSE CAST(ABS(ROUND({_WSR_Z}, 6)) > 1.959964 AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_wilcoxon_signed_rank",
    oracle=_WSR_ORACLE,
    tags=("profile", "experiment"),
)
def stat_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: within the SAME user, is the average
    click value shifted against the average view value? The paired
    counterpart of `stat_mann_whitney` — pairing removes the
    between-user variance that swamps unpaired tests, and ranks make
    it median-robust where `stat_ttest_welch` on per-user diffs is
    not. Zero differences drop (Wilcoxon's convention); ties take
    midranks with the t(t²−1)/48 variance correction.

    Exactness: the paired difference is computed in integer
    micro-units: values FLOOR-quantize to micros per row (the COVERAGE
    r10 convention — a double->DECIMAL CAST here would ride Spark's
    shortest-repr HALF_UP against DuckDB's exact-binary rounding, a
    probed midpoint-class divergence), exact integer sums, then
    sign-split truncating division so `div`/`//` agree on negatives —
    a double subtraction would let a last-ulp disagreement flip a tie
    block. W+ rides in doubled rank units (exact integers
    through the distinct-|d| prefix sum); one shared z expression at
    the exit. Scale shape: one groupBy(user) fold, one distinct-grain
    prefix sum (running_sums), one reduce. Degenerate classes: no
    complete pairs, all-zero diffs, or a single tie block spanning
    everything (variance 0) → NULL."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    per_user = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                "SUM(CASE WHEN event_type = 'click'"
                " THEN CAST(FLOOR(value * 1000000) AS DECIMAL(38,0)) END)"
            ).alias("s_c"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_c"),
            F.expr(
                "SUM(CASE WHEN event_type = 'view'"
                " THEN CAST(FLOOR(value * 1000000) AS DECIMAL(38,0)) END)"
            ).alias("s_v"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_v"),
        )
    )
    diffs = per_user.where("n_c > 0 AND n_v > 0").select(
        F.expr(
            "(CASE WHEN s_c >= 0 THEN s_c div n_c"
            " ELSE -((-s_c) div n_c) END)"
            " - (CASE WHEN s_v >= 0 THEN s_v div n_v"
            " ELSE -((-s_v) div n_v) END)"
        ).alias("d")
    )
    nz = diffs.where("d <> 0").select(
        "d", F.abs(F.col("d")).alias("ad")
    )
    grid = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("t"),
        F.count(F.when(F.col("d") > 0, 1))
        .cast("decimal(20,0)")
        .alias("tp"),
    )
    grid = running_sums(grid, ["ad"], {"cb": ("t", False)})
    fold = grid.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("decimal(38,0)").alias("m"),
        F.coalesce(
            F.sum(F.expr("tp * (2 * cb + t + 1)")), F.lit(0)
        )
        .cast("decimal(38,0)")
        .alias("wp2"),
        F.coalesce(F.sum(F.expr("t * (t * t - 1)")), F.lit(0))
        .cast("decimal(38,0)")
        .alias("tcorr"),
    )
    return fold.select(
        F.col("m").cast("long").alias("n_nonzero_pairs"),
        F.col("wp2").cast("long").alias("w_plus_x2"),
        F.expr(
            f"CASE WHEN {_WSR_GUARD} THEN NULL"
            f" ELSE ROUND({_WSR_Z}, 6) END"
        ).alias("z_stat"),
        F.expr(
            f"CASE WHEN {_WSR_GUARD} THEN NULL"
            f" ELSE CAST(ABS(ROUND({_WSR_Z}, 6)) > 1.959964 AS BIGINT)"
            f" END"
        ).alias("reject_5pct"),
    )


# --- Sign test --------------------------------------------------------------
# The assumption-free floor under the paired ladder: only the SIGN of
# each user's click-vs-view gap is used, so it is valid under any
# continuous within-pair distribution. Continuity-corrected normal
# approximation z = sgn(2S+ - n) * max(|2S+ - n| - 1, 0) / sqrt(n) —
# every input an exact integer, one shared expression at the exit.

_SIGN_Z = (
    "(CAST(CASE WHEN 2 * sp >= n THEN 1 ELSE -1 END"
    " * GREATEST(ABS(2 * sp - n) - 1, 0) AS DOUBLE)"
    " / SQRT(CAST(n AS DOUBLE)))"
)
_SIGN_GUARD = "n < 1"

_SIGN_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           SUM(CASE WHEN event_type = 'click'
                    THEN CAST(FLOOR(value * 1000000) AS HUGEINT) END)
               AS s_c,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_c,
           SUM(CASE WHEN event_type = 'view'
                    THEN CAST(FLOOR(value * 1000000) AS HUGEINT) END)
               AS s_v,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_v
    FROM events WHERE value IS NOT NULL
    GROUP BY user_id
), diffs AS (
    SELECT (CASE WHEN s_c >= 0 THEN s_c // n_c
                 ELSE -((-s_c) // n_c) END)
           - (CASE WHEN s_v >= 0 THEN s_v // n_v
                   ELSE -((-s_v) // n_v) END) AS d
    FROM per_user WHERE n_c > 0 AND n_v > 0
), fold AS (
    SELECT CAST(COUNT(CASE WHEN d <> 0 THEN 1 END) AS BIGINT) AS n,
           CAST(COUNT(CASE WHEN d > 0 THEN 1 END) AS BIGINT) AS sp
    FROM diffs
)
SELECT n AS n_nonzero_pairs, sp AS n_positive,
       CASE WHEN {_SIGN_GUARD} THEN NULL
            ELSE ROUND({_SIGN_Z}, 6) END AS z_stat,
       CASE WHEN {_SIGN_GUARD} THEN NULL
            ELSE CAST(ABS(ROUND({_SIGN_Z}, 6)) > 1.959964 AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_sign_test",
    oracle=_SIGN_ORACLE,
    tags=("profile", "experiment"),
)
def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test on the per-user click-vs-view value gap — the
    bottom, assumption-free rung of the paired ladder
    (`stat_ttest_paired`-style t needs normality,
    `stat_wilcoxon_signed_rank` needs symmetric differences, the sign
    test needs NOTHING beyond exchangeable signs). Less power, total
    robustness; disagreement between the three IS the diagnostic.

    Same exact integer-micros difference kernel as the signed-rank
    test (truncating decimal division, sign-split); the statistic
    needs only two conditional counts and exits through one shared
    continuity-corrected z expression. One groupBy(user) fold + one
    reduce; nothing else. Degenerate class: zero nonzero pairs →
    NULL."""
    per_user = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.expr(
                "SUM(CASE WHEN event_type = 'click'"
                " THEN CAST(FLOOR(value * 1000000) AS DECIMAL(38,0)) END)"
            ).alias("s_c"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_c"),
            F.expr(
                "SUM(CASE WHEN event_type = 'view'"
                " THEN CAST(FLOOR(value * 1000000) AS DECIMAL(38,0)) END)"
            ).alias("s_v"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_v"),
        )
    )
    diffs = per_user.where("n_c > 0 AND n_v > 0").select(
        F.expr(
            "(CASE WHEN s_c >= 0 THEN s_c div n_c"
            " ELSE -((-s_c) div n_c) END)"
            " - (CASE WHEN s_v >= 0 THEN s_v div n_v"
            " ELSE -((-s_v) div n_v) END)"
        ).alias("d")
    )
    fold = diffs.agg(
        F.count(F.when(F.col("d") != 0, 1)).cast("long").alias("n"),
        F.count(F.when(F.col("d") > 0, 1)).cast("long").alias("sp"),
    )
    return fold.select(
        F.col("n").alias("n_nonzero_pairs"),
        F.col("sp").alias("n_positive"),
        F.expr(
            f"CASE WHEN {_SIGN_GUARD} THEN NULL"
            f" ELSE ROUND({_SIGN_Z}, 6) END"
        ).alias("z_stat"),
        F.expr(
            f"CASE WHEN {_SIGN_GUARD} THEN NULL"
            f" ELSE CAST(ABS(ROUND({_SIGN_Z}, 6)) > 1.959964 AS BIGINT)"
            f" END"
        ).alias("reject_5pct"),
    )


# --- Lilliefors test for exponentiality ------------------------------------
# One-sample KS against an exponential with ESTIMATED rate (Lilliefors
# 1969): are inter-event gaps memoryless? The companion of
# stat_lilliefors_normality on the other classical null, and the
# principled check before any exponential/Poisson queueing assumption
# (sessionization gap thresholds, arrival-rate models). D folds on the
# distinct-gap grain: D = max over grid of max(F_n(x) - F0(x),
# F0(x) - F_n(x^-)) with F0(x) = 1 - exp(-x / xbar).

_LEXP_F0 = "(1.0 - EXP(-CAST(g AS DOUBLE) / xbar))"
_LEXP_GUARD = "n < 2 OR xbar <= 0"

_LEXP_ORACLE = f"""
WITH seq AS (
    SELECT user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
    FROM events
), gaps AS (
    SELECT epoch_us(ts - prev_ts) // 1000000 AS g
    FROM seq WHERE prev_ts IS NOT NULL
), grid AS (
    SELECT g, CAST(COUNT(*) AS HUGEINT) AS c,
           SUM(CAST(COUNT(*) AS HUGEINT)) OVER (ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM gaps GROUP BY g
), tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, AVG(CAST(g AS DOUBLE)) AS xbar
    FROM gaps
), dgrid AS (
    SELECT GREATEST(
               CAST(cum AS DOUBLE) / (SELECT n FROM tot)
                   - {_LEXP_F0.replace("xbar", "(SELECT xbar FROM tot)")},
               {_LEXP_F0.replace("xbar", "(SELECT xbar FROM tot)")}
                   - CAST(cum - c AS DOUBLE) / (SELECT n FROM tot)
           ) AS dd
    FROM grid
), fold AS (
    SELECT (SELECT n FROM tot) AS n, (SELECT xbar FROM tot) AS xbar,
           MAX(dd) AS d
    FROM dgrid
)
SELECT CAST(n AS BIGINT) AS n_gaps,
       ROUND(xbar, 4) AS mean_gap_sec,
       CASE WHEN {_LEXP_GUARD} THEN NULL ELSE ROUND(d, 6) END AS d_stat,
       CASE WHEN {_LEXP_GUARD} THEN NULL
            ELSE CAST(ROUND(d, 6) >
                 1.06 / SQRT(CAST(n AS DOUBLE)) AS BIGINT)
       END AS reject_5pct
FROM fold
"""


@register(
    "stat_lilliefors_exponential",
    oracle=_LEXP_ORACLE,
    tags=("profile",),
)
def stat_lilliefors_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lilliefors test for EXPONENTIALITY of inter-event gaps (seconds
    between a user's consecutive events): the memorylessness check
    behind every Poisson-arrival assumption — sessionization gap
    cutoffs, arrival-rate capacity models, exponential back-off
    analyses. One-sample KS with the rate estimated from the data,
    so the 1.06/√n critical value (Lilliefors 1969 asymptotic row)
    replaces the plain-KS table, exactly as
    `stat_lilliefors_normality` does for the Gaussian null.

    Engine shape: per-user LAG on the (user, ts) partitioned window —
    a properly keyed window, scale-safe — gaps fold to the distinct-
    second grain (bounded by the observation window in seconds), the
    ECDF is one prefix sum there, and D evaluates both one-sided gaps
    at each grid point (F_n jump vs F0) before one MAX reduce. Gap
    seconds are exact integers (epoch-micros division — never `//` on
    a DuckDB EPOCH double); F0 is one shared double expression.
    Degenerate classes: <2 gaps or zero mean gap (all simultaneous) →
    NULL."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", "event_id", F.lag("ts").over(w).alias("prev_ts")
    )
    gaps = seq.where(F.col("prev_ts").isNotNull()).select(
        F.expr(
            "timestampdiff(MICROSECOND, prev_ts, ts) div 1000000"
        ).alias("g")
    )
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    grid = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c")
    )
    grid = running_sums(grid, ["g"], {"cum": ("c", True)})
    tot = gaps.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.col("g").cast("double")).alias("xbar"),
    )
    f0 = _LEXP_F0
    dgrid = grid.crossJoin(F.broadcast(tot)).select(
        F.greatest(
            F.expr(f"CAST(cum AS DOUBLE) / n - {f0}"),
            F.expr(f"{f0} - CAST(cum - c AS DOUBLE) / n"),
        ).alias("dd")
    )
    fold = dgrid.agg(F.max("dd").alias("d")).crossJoin(F.broadcast(tot))
    return fold.select(
        F.col("n").alias("n_gaps"),
        F.round("xbar", 4).alias("mean_gap_sec"),
        F.expr(
            f"CASE WHEN {_LEXP_GUARD} THEN NULL"
            f" ELSE ROUND(d, 6) END"
        ).alias("d_stat"),
        F.expr(
            f"CASE WHEN {_LEXP_GUARD} THEN NULL"
            f" ELSE CAST(ROUND(d, 6) >"
            f" 1.06 / SQRT(CAST(n AS DOUBLE)) AS BIGINT) END"
        ).alias("reject_5pct"),
    )


# --- Delta-method CI for a ratio metric ------------------------------------
# The experiment readout ab_test_report cannot give: for a RATIO
# metric (value per event), user-level randomization makes the naive
# per-event variance wrong (events cluster within users); the correct
# per-arm variance is the delta-method expansion of R = xbar/ybar over
# the USER-level (x, y) pairs:
#   Var(R) ~ (var_x - 2 R cov_xy + R^2 var_y) / (n * ybar^2).
# Arms ride the engine-portable md5 bucket (sampling.portable_bucket),
# the same assignment convention as ab_test_report.

_DELTA_R = "(mx / my)"
#: GREATEST(, 0): when x is an exact multiple of y for every user
#: (const fixture), the quadratic form is identically 0 and each
#: engine's cancellation residue can land fractionally NEGATIVE —
#: DuckDB SQRT then RAISES and Spark yields NaN, layout-dependently.
#: Clamping to 0 makes the exact-zero-variance class read se = 0 on
#: both engines.
_DELTA_V = (
    f"(GREATEST(vx - 2.0 * {_DELTA_R} * cxy"
    f" + {_DELTA_R} * {_DELTA_R} * vy, 0.0)"
    f" / (CAST(n AS DOUBLE) * my * my))"
)
_DELTA_GUARD = "n < 2 OR my = 0"

_RATIO_CI_ORACLE = f"""
WITH per_user AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 2 AS arm,
           SUM(COALESCE(value, 0.0)) AS x,
           CAST(COUNT(*) AS DOUBLE) AS y
    FROM events GROUP BY user_id
), arms AS (
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
           AVG(x) AS mx, AVG(y) AS my,
           CASE WHEN COUNT(*) > 1 THEN
               (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) / (COUNT(*) - 1)
           ELSE 0.0 END AS vx,
           CASE WHEN COUNT(*) > 1 THEN
               (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)) / (COUNT(*) - 1)
           ELSE 0.0 END AS vy,
           CASE WHEN COUNT(*) > 1 THEN
               (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y)) / (COUNT(*) - 1)
           ELSE 0.0 END AS cxy
    FROM per_user GROUP BY arm
), readout AS (
    SELECT arm, n,
           CASE WHEN {_DELTA_GUARD} THEN NULL
                ELSE {_DELTA_R} END AS r,
           CASE WHEN {_DELTA_GUARD} THEN NULL
                ELSE {_DELTA_V} END AS v
    FROM arms
), diff AS (
    SELECT SUM(CASE WHEN arm = 1 THEN r END)
               - SUM(CASE WHEN arm = 0 THEN r END) AS dr,
           SUM(CASE WHEN arm = 1 THEN v END)
               + SUM(CASE WHEN arm = 0 THEN v END) AS dv
    FROM readout
)
SELECT r.arm AS arm, r.n AS n_users,
       ROUND(r.r, 6) AS ratio_value_per_event,
       CASE WHEN r.v IS NULL THEN NULL
            ELSE ROUND(SQRT(r.v), 6) END AS se,
       CASE WHEN r.v IS NULL THEN NULL
            ELSE ROUND(r.r - 1.959964 * SQRT(r.v), 6) END AS ci_lo,
       CASE WHEN r.v IS NULL THEN NULL
            ELSE ROUND(r.r + 1.959964 * SQRT(r.v), 6) END AS ci_hi,
       CASE WHEN d.dr IS NULL OR d.dv IS NULL OR d.dv <= 0 THEN NULL
            ELSE ROUND(d.dr / SQRT(d.dv), 4) END AS z_diff,
       CASE WHEN d.dr IS NULL OR d.dv IS NULL OR d.dv <= 0 THEN NULL
            ELSE CAST(ABS(ROUND(d.dr / SQRT(d.dv), 4)) > 1.9600
                      AS BIGINT) END AS reject_5pct
FROM readout r CROSS JOIN diff d
ORDER BY arm
"""


@register(
    "stat_ratio_metric_delta_ci",
    oracle=_RATIO_CI_ORACLE,
    tags=("profile", "experiment"),
)
def stat_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (value per
    event) under user-level randomization — the readout
    `ab_test_report`'s binary-conversion z cannot give. Events cluster
    within users, so a per-event variance is anticonservative; the
    delta method expands Var(x̄/ȳ) over user-level (Σvalue, n_events)
    pairs — the Deng et al. "ratio metrics in A/B tests" standard.
    Arms come from the same engine-portable md5 bucket as
    ab_test_report, so the two readouts describe ONE experiment.

    One groupBy(user) fold, one groupBy(arm) moment fold (expanded
    sample var/cov forms), the arm-difference z via conditional sums
    on the 2-row frame. Emits per-arm rows with the pooled diff
    z/reject repeated (uniform schema). Degenerate classes: an arm
    with n<2 or zero mean denominator → NULL row stats and NULL diff
    (NULL propagates through the conditional sums on both engines)."""
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.expr("COALESCE(value, 0.0)")).alias("x"),
            F.count(F.lit(1)).cast("double").alias("y"),
        )
        .select(
            portable_bucket(F.col("user_id"), 2).alias("arm"), "x", "y"
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.expr(
            "CASE WHEN COUNT(*) > 1 THEN"
            " (SUM(x * x) - COUNT(*) * AVG(x) * AVG(x)) / (COUNT(*) - 1)"
            " ELSE 0.0 END"
        ).alias("vx"),
        F.expr(
            "CASE WHEN COUNT(*) > 1 THEN"
            " (SUM(y * y) - COUNT(*) * AVG(y) * AVG(y)) / (COUNT(*) - 1)"
            " ELSE 0.0 END"
        ).alias("vy"),
        F.expr(
            "CASE WHEN COUNT(*) > 1 THEN"
            " (SUM(x * y) - COUNT(*) * AVG(x) * AVG(y)) / (COUNT(*) - 1)"
            " ELSE 0.0 END"
        ).alias("cxy"),
    )
    readout = arms.select(
        "arm",
        "n",
        F.expr(
            f"CASE WHEN {_DELTA_GUARD} THEN NULL ELSE {_DELTA_R} END"
        ).alias("r"),
        F.expr(
            f"CASE WHEN {_DELTA_GUARD} THEN NULL ELSE {_DELTA_V} END"
        ).alias("v"),
    )
    diff = readout.agg(
        F.expr(
            "SUM(CASE WHEN arm = 1 THEN r END)"
            " - SUM(CASE WHEN arm = 0 THEN r END)"
        ).alias("dr"),
        F.expr(
            "SUM(CASE WHEN arm = 1 THEN v END)"
            " + SUM(CASE WHEN arm = 0 THEN v END)"
        ).alias("dv"),
    )
    return (
        readout.crossJoin(F.broadcast(diff))
        .select(
            "arm",
            F.col("n").alias("n_users"),
            F.round("r", 6).alias("ratio_value_per_event"),
            F.expr(
                "CASE WHEN v IS NULL THEN NULL"
                " ELSE ROUND(SQRT(v), 6) END"
            ).alias("se"),
            F.expr(
                "CASE WHEN v IS NULL THEN NULL"
                " ELSE ROUND(r - 1.959964 * SQRT(v), 6) END"
            ).alias("ci_lo"),
            F.expr(
                "CASE WHEN v IS NULL THEN NULL"
                " ELSE ROUND(r + 1.959964 * SQRT(v), 6) END"
            ).alias("ci_hi"),
            F.expr(
                "CASE WHEN dr IS NULL OR dv IS NULL OR dv <= 0 THEN NULL"
                " ELSE ROUND(dr / SQRT(dv), 4) END"
            ).alias("z_diff"),
            F.expr(
                "CASE WHEN dr IS NULL OR dv IS NULL OR dv <= 0 THEN NULL"
                " ELSE CAST(ABS(ROUND(dr / SQRT(dv), 4)) > 1.9600"
                " AS BIGINT) END"
            ).alias("reject_5pct"),
        )
        .orderBy("arm")
    )


# --- Nemenyi post-hoc after Friedman ---------------------------------------
# Demsar (2006) critical-difference readout: after stat_friedman_test
# rejects, WHICH event types differ? Mean within-block (weekly) ranks
# compared pairwise against CD = q_alpha * sqrt(k(k+1)/(6n)), with
# q_alpha the infinite-df studentized range / sqrt(2) row selected by
# the observed k. Shares stat_friedman_test's block convention
# verbatim (weekly value sums, complete blocks, doubled midranks), so
# the omnibus and the post-hoc read the same experiment.

_NEMENYI_Q = (
    "CASE k WHEN 2 THEN 1.959964 WHEN 3 THEN 2.343701"
    " WHEN 4 THEN 2.569032 WHEN 5 THEN 2.727747"
    " WHEN 6 THEN 2.849705 WHEN 7 THEN 2.948320"
    " WHEN 8 THEN 3.030879 WHEN 9 THEN 3.101730"
    " ELSE 3.163684 END"
)
_NEMENYI_CD = (
    f"({_NEMENYI_Q} * SQRT(CAST(k AS DOUBLE) * (k + 1)"
    f" / (6.0 * CAST(n AS DOUBLE))))"
)
_NEMENYI_GUARD = "n < 1 OR k < 2"

_NEMENYI_ORACLE = f"""
WITH weekly AS (
    SELECT date_trunc('week', ts) AS wk, event_type,
           SUM(CAST(value AS DECIMAL(18,6))) AS v
    FROM events GROUP BY 1, 2
), kk AS (
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM weekly
), complete AS (
    SELECT w.wk, w.event_type, w.v, kk.k
    FROM weekly w, kk
    WHERE w.wk IN (SELECT wk FROM weekly
                   GROUP BY wk HAVING COUNT(*) = (SELECT k FROM kk))
), ranked AS (
    SELECT wk, event_type, k,
           CAST(2 * RANK() OVER (PARTITION BY wk ORDER BY v)
                + COUNT(*) OVER (PARTITION BY wk, v) - 1 AS BIGINT) AS r2
    FROM complete
), sums AS (
    SELECT event_type, MAX(k) AS k,
           CAST(SUM(r2) AS BIGINT) AS r2_j,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ranked GROUP BY event_type
), pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.k AS k, a.n AS n, a.r2_j AS ra, b.r2_j AS rb
    FROM sums a JOIN sums b ON a.event_type < b.event_type
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_blocks,
       CASE WHEN {_NEMENYI_GUARD} THEN NULL
            ELSE ROUND(CAST(ra AS DOUBLE) / (2 * n), 4) END AS mean_rank_a,
       CASE WHEN {_NEMENYI_GUARD} THEN NULL
            ELSE ROUND(CAST(rb AS DOUBLE) / (2 * n), 4) END AS mean_rank_b,
       CASE WHEN {_NEMENYI_GUARD} THEN NULL
            ELSE ROUND({_NEMENYI_CD}, 4) END AS critical_difference,
       CASE WHEN {_NEMENYI_GUARD} THEN NULL
            ELSE CAST(ABS(CAST(ra AS DOUBLE) - rb) / (2 * n)
                      > {_NEMENYI_CD} AS BIGINT) END AS reject_5pct
FROM pairs ORDER BY type_a, type_b
"""


@register(
    "stat_nemenyi_posthoc",
    oracle=_NEMENYI_ORACLE,
    tags=("profile", "experiment"),
)
def stat_nemenyi_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nemenyi critical-difference post-hoc after Friedman (Demšar
    2006): all-pairs comparison of mean within-week ranks of the event
    types against CD = q_α·sqrt(k(k+1)/(6n)) — the blocked-design
    sibling of `stat_tukey_hsd` (independent groups) and
    `stat_dunn_posthoc` (unpaired ranks), closing the post-hoc
    triangle. Shares `stat_friedman_test`'s machinery verbatim:
    weekly value sums as blocks, complete blocks only, doubled
    midranks so rank sums stay exact integers.

    Scale shape: weekly fold (bounded calendar grain), per-week rank
    windows keyed by week, one k-row sum fold, then a k×k self-join
    of the BOUNDED treatment table. Degenerate classes: k<2 (zero
    pair rows by construction of the self-join) or zero complete
    blocks → NULL readouts."""
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("wk"), "event_type"
    ).agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    kk = weekly.agg(
        F.countDistinct("event_type").cast("long").alias("k")
    )
    counts = weekly.groupBy("wk").agg(F.count(F.lit(1)).alias("c"))
    complete = (
        weekly.join(F.broadcast(kk))
        .join(counts, "wk")
        .where(F.col("c") == F.col("k"))
        .select("wk", "event_type", "v", "k")
    )
    wrank = Window.partitionBy("wk").orderBy("v")
    wtie = Window.partitionBy("wk", "v")
    ranked = complete.select(
        "event_type",
        "k",
        (
            2 * F.rank().over(wrank) + F.count(F.lit(1)).over(wtie) - 1
        )
        .cast("long")
        .alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.max("k").alias("k"),
        F.sum("r2").cast("long").alias("r2_j"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    a = sums.select(
        F.col("event_type").alias("type_a"),
        F.col("k"),
        F.col("n"),
        F.col("r2_j").alias("ra"),
    )
    b = sums.select(
        F.col("event_type").alias("type_b"),
        F.col("r2_j").alias("rb"),
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    return pairs.select(
        "type_a",
        "type_b",
        F.col("n").alias("n_blocks"),
        F.expr(
            f"CASE WHEN {_NEMENYI_GUARD} THEN NULL"
            f" ELSE ROUND(CAST(ra AS DOUBLE) / (2 * n), 4) END"
        ).alias("mean_rank_a"),
        F.expr(
            f"CASE WHEN {_NEMENYI_GUARD} THEN NULL"
            f" ELSE ROUND(CAST(rb AS DOUBLE) / (2 * n), 4) END"
        ).alias("mean_rank_b"),
        F.expr(
            f"CASE WHEN {_NEMENYI_GUARD} THEN NULL"
            f" ELSE ROUND({_NEMENYI_CD}, 4) END"
        ).alias("critical_difference"),
        F.expr(
            f"CASE WHEN {_NEMENYI_GUARD} THEN NULL"
            f" ELSE CAST(ABS(CAST(ra AS DOUBLE) - rb) / (2 * n)"
            f" > {_NEMENYI_CD} AS BIGINT) END"
        ).alias("reject_5pct"),
    ).orderBy("type_a", "type_b")


# --- Partial correlation ----------------------------------------------------
# First-order partial correlation of engagement intensity and average
# spend CONTROLLING for purchase propensity:
#   r_xy.z = (r_xy - r_xz r_yz) / sqrt((1 - r_xz^2)(1 - r_yz^2)),
# with the Fisher-z significance test at n - 3 effective dof. The
# confounder-adjusted pairwise readout that a raw agg_corr_matrix
# cannot give, and the bivariate sibling of ml_feature_vif's
# whole-matrix collinearity screen.

_PCORR = (
    "((r_xy - r_xz * r_yz)"
    " / SQRT((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)))"
)
_PCORR_GUARD = (
    "r_xy IS NULL OR r_xz IS NULL OR r_yz IS NULL OR n < 4"
    " OR (1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz) <= 1e-12"
)
#: Fisher z of the partial r, SE 1/sqrt(n - 3 - 1) (one conditioning
#: variable); |z| > 1.96 rejects zero partial correlation.
_PCORR_Z = (
    f"(0.5 * LN((1.0 + {_PCORR}) / (1.0 - {_PCORR}))"
    f" * SQRT(CAST(n AS DOUBLE) - 4.0))"
)


def _pcorr_corr(a: str, b: str) -> str:
    return (
        f"(CASE WHEN (s{a}{a} - n * m{a} * m{a}) <= 0"
        f" OR (s{b}{b} - n * m{b} * m{b}) <= 0 THEN NULL"
        f" ELSE (s{a}{b} - n * m{a} * m{b})"
        f" / SQRT((s{a}{a} - n * m{a} * m{a})"
        f" * (s{b}{b} - n * m{b} * m{b})) END)"
    )


_PCORR_ORACLE = f"""
WITH feats AS (
    SELECT LN(1.0 + COUNT(*)) AS x,
           COALESCE(AVG(value), 0.0) AS y,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS DOUBLE) / COUNT(*) AS z
    FROM events GROUP BY user_id
), mom AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           AVG(x) AS mx, AVG(y) AS my, AVG(z) AS mz,
           SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz,
           SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz
    FROM feats
), corr AS (
    SELECT n,
           {_pcorr_corr('x', 'y')} AS r_xy,
           {_pcorr_corr('x', 'z')} AS r_xz,
           {_pcorr_corr('y', 'z')} AS r_yz
    FROM mom
)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND(r_xy, 6) AS r_raw,
       CASE WHEN {_PCORR_GUARD} THEN NULL
            ELSE ROUND({_PCORR}, 6) END AS r_partial,
       CASE WHEN {_PCORR_GUARD} OR ABS({_PCORR}) >= 1.0 THEN NULL
            ELSE ROUND({_PCORR_Z}, 4) END AS fisher_z,
       CASE WHEN {_PCORR_GUARD} OR ABS({_PCORR}) >= 1.0 THEN NULL
            ELSE CAST(ABS(ROUND({_PCORR_Z}, 4)) > 1.9600 AS BIGINT)
       END AS reject_5pct
FROM corr
"""


@register(
    "stat_partial_correlation",
    oracle=_PCORR_ORACLE,
    tags=("profile",),
)
def stat_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation: does engagement intensity
    (ln(1+events)) correlate with average spend ONCE purchase
    propensity is controlled for? The confounder-adjusted readout the
    raw `agg_corr_matrix` cannot give — a strong r_raw with a near-
    zero r_partial is the classic "both driven by the confounder"
    signature. Closed form r_xy.z over the three pairwise Pearson r's;
    Fisher z with n−4 effective dof prices it.

    One groupBy(user) feature fold, ONE nine-sum moment reduce,
    everything after on a single row with expressions shared verbatim
    between engines (the ml_feature_vif discipline). Degenerate
    classes: any zero-variance marginal, |r| = 1 conditioning
    (denominator ≤ 1e-12 structural guard), or n < 4 → NULL partial
    readouts while r_raw still reports."""
    feats = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("LN(1.0 + COUNT(*))").alias("x"),
            F.expr("COALESCE(AVG(value), 0.0)").alias("y"),
            F.expr(
                "CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)"
                " AS DOUBLE) / COUNT(*)"
            ).alias("z"),
        )
    )
    mom = feats.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg("z").alias("mz"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
        F.sum(F.expr("z * z")).alias("szz"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * z")).alias("sxz"),
        F.sum(F.expr("y * z")).alias("syz"),
    )
    corr = mom.select(
        "n",
        F.expr(_pcorr_corr("x", "y")).alias("r_xy"),
        F.expr(_pcorr_corr("x", "z")).alias("r_xz"),
        F.expr(_pcorr_corr("y", "z")).alias("r_yz"),
    )
    return corr.select(
        F.col("n").cast("long").alias("n_users"),
        F.round("r_xy", 6).alias("r_raw"),
        F.expr(
            f"CASE WHEN {_PCORR_GUARD} THEN NULL"
            f" ELSE ROUND({_PCORR}, 6) END"
        ).alias("r_partial"),
        F.expr(
            f"CASE WHEN {_PCORR_GUARD} OR ABS({_PCORR}) >= 1.0 THEN NULL"
            f" ELSE ROUND({_PCORR_Z}, 4) END"
        ).alias("fisher_z"),
        F.expr(
            f"CASE WHEN {_PCORR_GUARD} OR ABS({_PCORR}) >= 1.0 THEN NULL"
            f" ELSE CAST(ABS(ROUND({_PCORR_Z}, 4)) > 1.9600 AS BIGINT)"
            f" END"
        ).alias("reject_5pct"),
    )
