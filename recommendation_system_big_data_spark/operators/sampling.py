"""Sampling / splits — SURVEY.md §2.8.

Both ops are partitioning-dependent even when seeded, so they register
without oracles (⊘ rows-only checks) exactly as SURVEY.md §5.2 prescribes;
the pytest suite checks their statistical and determinism properties
(same-session reruns are identical; fractions land near nominal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


@register("random_split", oracle=None, tags=("sampling",))
def random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded 80/20 split (op #33; model-als.py:122 `randomSplit([.8,.2], 42)`).
    Returns the split sizes — the downstream-relevant invariant."""
    train, test = load(spark, sf_dir, "events").randomSplit([0.8, 0.2], seed=42)
    return (
        train.agg(F.lit("train").alias("split"), F.count(F.lit(1)).alias("n"))
        .unionByName(test.agg(F.lit("test").alias("split"), F.count(F.lit(1)).alias("n")))
    )


@register("sample_frac", oracle=None, tags=("sampling",))
def sample_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample (op #34; exploratory-data-analysis.py:92 samples
    UNSEEDED — the engine always seeds, SURVEY.md §7.3)."""
    return (
        load(spark, sf_dir, "events")
        .sample(fraction=0.8, seed=42)
        .select("event_id", "user_id", "event_type", "value")
    )


@register("sample_stratified", oracle=None, tags=("sampling",))
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-key) sampling via sampleBy: different Bernoulli
    fractions per l_returnflag stratum, fixed seed. ⊘ rows-only (sampling
    is seed/partitioning-defined, not SQL-expressible); the per-stratum
    rates are gated in tests/test_sampling.py. The 100 TB use is
    class-balanced training-set extraction — one scan, no shuffle, the
    filter evaluates per-row against the stratum's threshold."""
    fractions = {"A": 0.2, "N": 0.05, "R": 0.1}
    return (
        load(spark, sf_dir, "lineitem")
        .sampleBy("l_returnflag", fractions=fractions, seed=42)
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


def portable_bucket(col: Column, n: int) -> Column:
    """Deterministic, engine-portable hash bucket in [0, n): first 8 hex
    digits of md5 of the key's string form, as an integer, mod n. Unlike
    xxhash64 (JVM-specific) or rand (partitioning-dependent), md5 exists
    with identical semantics in Spark, DuckDB, and every warehouse — so
    split assignment is reproducible across engines, re-runs, cluster
    sizes, and repartitionings. That reproducibility is the point of
    hash-based splits: a row's split follows it forever (no train/test
    leakage when the dataset is re-ingested or grows)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % n


_HASH_SPLIT_ORACLE = """
SELECT split, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM (
    SELECT CASE
             WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
             WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS split,
           o_totalprice
    FROM orders
)
GROUP BY split
"""


@register("split_by_hash", oracle=_HASH_SPLIT_ORACLE, tags=("sampling",))
def split_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by key hash — the
    production alternative to randomSplit for ML data: assignment is a pure
    function of the key, so it is stable under re-ingestion, appends, and
    any cluster size (randomSplit's assignment shifts with partitioning,
    silently leaking rows across splits between runs). Fully SQL-
    expressible, hence oracle-checked — the one sampling op where
    cross-engine hash equality is provable. Output: per-split row count
    and exact decimal value mass."""
    bucket = portable_bucket(F.col("o_orderkey"), 100)
    return (
        load(spark, sf_dir, "orders")
        .withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


_BALANCED_ORACLE = """
WITH target AS (
    SELECT MIN(cnt) AS m FROM (
        SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
    )
), ranked AS (
    SELECT o_orderkey, o_orderpriority,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT),
                        o_orderkey
           ) AS rn
    FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n
FROM ranked, target
WHERE rn <= m
GROUP BY o_orderpriority
"""


@register("sample_class_balanced", oracle=_BALANCED_ORACLE, tags=("sampling",))
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic class rebalancing: downsample every class to the
    smallest class's size, choosing WHICH rows survive by hash order (not
    rand()), so the balanced set is reproducible row-for-row across runs
    and engines — the curriculum/domain-mixing primitive in training-data
    pipelines ("cap every source at N documents").

    Plan shape: one count-aggregate for the floor (broadcast as a 1-row
    cross join), one window over the class key to rank rows, one filter.
    The window shuffle is the cost; at 100 TB with few classes the per-
    class partitions are huge but the rank-then-filter form still beats
    collecting per-class counts and re-sampling (one pass, no skewed
    reservoir on the driver). Skewed-class salting applies if one class
    dominates (see join_salted_skew)."""
    orders = load(spark, sf_dir, "orders")
    floor = orders.groupBy("o_orderpriority").count().agg(
        F.min("count").alias("m")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        portable_bucket(F.col("o_orderkey"), 1 << 62), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(floor))
        .filter(F.col("rn") <= F.col("m"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: Mixture weights per source bucket: sources are mapped onto 4 weight
#: tiers by numeric suffix mod 4 — a stand-in for the per-source sampling
#: rates of a real training-mix spec (wiki ×1.0, web ×0.25, …).
_MIX_RATES = {0: 100, 1: 50, 2: 25, 3: 10}  # percent, applied per source tier

_SOURCE_WEIGHTED_ORACLE = f"""
WITH tiered AS (
    SELECT doc_id, source,
           TRY_CAST(SUBSTR(source, 4) AS BIGINT) % 4 AS tier,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept
FROM tiered
WHERE bucket < CASE tier
    WHEN 0 THEN {_MIX_RATES[0]} WHEN 1 THEN {_MIX_RATES[1]}
    WHEN 2 THEN {_MIX_RATES[2]} ELSE {_MIX_RATES[3]} END
GROUP BY source
"""


@register(
    "sample_source_weighted", oracle=_SOURCE_WEIGHTED_ORACLE, tags=("sampling",)
)
def sample_source_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture sampling — the data-mixing step of a training
    corpus spec (Pile/Dolma-style: keep 100% of tier-0 sources, 50% of
    tier-1, …), as a pure map-stage filter.

    Each row's keep/drop is `portable_bucket(doc_id) < rate(source)`:
    deterministic, engine-portable (md5), independent of partitioning,
    and stable under re-ingestion — re-running the mix on a grown corpus
    keeps every previously-kept row (monotone bucket rule), so training
    runs can be extended without resampling churn. No shuffle until the
    per-source accounting aggregate; at 100 TB the filter is free
    (codegen map stage) and the only cost is the scan itself."""
    # Unbounded suffix + try-cast semantics on BOTH sides: Spark's non-ANSI
    # cast and DuckDB's TRY_CAST each yield NULL on a non-numeric suffix,
    # and NULL % 4 falls through to the final 10% tier in both CASEs.
    tier = F.expr("substring(source, 4)").cast("long") % 4
    rate = (
        F.when(tier == 0, F.lit(_MIX_RATES[0]))
        .when(tier == 1, F.lit(_MIX_RATES[1]))
        .when(tier == 2, F.lit(_MIX_RATES[2]))
        .otherwise(F.lit(_MIX_RATES[3]))
    )
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(portable_bucket(F.col("doc_id"), 100) < rate)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


#: Weighted-reservoir sample size.
_RESERVOIR_K = 100

_WEIGHTED_RESERVOIR_ORACLE = f"""
WITH keyed AS (
    SELECT o_orderkey, o_totalprice,
           -LN((CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                     AS BIGINT) % 1000000 AS DOUBLE) + 0.5) / 1000000.0)
               / CAST(o_totalprice AS DOUBLE) AS ekey
    FROM orders
    WHERE o_totalprice > 0
), ranked AS (
    SELECT o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (ORDER BY ekey ASC, o_orderkey ASC) AS rn
    FROM keyed
)
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS weight
FROM ranked WHERE rn <= {_RESERVOIR_K}
"""


@register(
    "sample_weighted_reservoir",
    oracle=_WEIGHTED_RESERVOIR_ORACLE,
    tags=("sampling",),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items, inclusion probability
    proportional to weight — Efraimidis-Spirakis exponential-sort: draw
    u ~ U(0,1) per row, key = -ln(u)/w, keep the k smallest keys. One pass,
    no per-stratum state, and — because u comes from the portable md5
    bucket, not rand() — the sample is deterministic, partitioning-
    independent, and reproducible in any engine (the oracle recomputes the
    identical keys in DuckDB).

    Scale shape: key assignment is a codegen map stage over the scan; the
    global top-k is TakeOrderedAndProject (per-partition k then a k·P
    driver-side merge — never a full sort). At 100 TB with k=100 the
    shuffled state is k rows per partition, i.e. nothing. This is the
    sampling rung between uniform hash sampling (split_by_hash) and the
    per-tier mixture (sample_source_weighted): one knob, smooth weights.
    """
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    u = (
        portable_bucket(F.col("o_orderkey"), 1_000_000).cast("double") + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    w = F.col("o_totalprice").cast("double")
    keyed = orders.select(
        "o_orderkey",
        w.alias("weight"),
        (-F.log(u) / w).alias("ekey"),
    )
    return (
        keyed.orderBy(F.asc("ekey"), F.asc("o_orderkey"))
        .limit(_RESERVOIR_K)
        .select("o_orderkey", "weight")
    )


_CV_FOLD_ORACLE = """
WITH folded AS (
    SELECT CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 5 AS fold,
           o_orderpriority,
           o_totalprice
    FROM orders
)
SELECT CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(COUNT(*) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE), 6) AS share,
       ROUND(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS urgent_rate,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS total_rev
FROM folded
GROUP BY fold
"""


@register("ml_cv_fold_assign", oracle=_CV_FOLD_ORACLE, tags=("sampling", "ml"))
def ml_cv_fold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (k=5) with a fold
    balance report — fold id is a pure function of the key via the
    portable md5 bucket, so folds are stable under re-ingestion, appends,
    cluster resizes, and are reproducible in ANY engine that can hash
    (the same property split_by_hash pins for train/val/test). The report
    is what a training harness checks before trusting the folds: equal
    shares, matching label rates (urgent_rate as the stand-in class
    balance), matching value mass.

    One narrow projection (the fold column) + one map-side-combined
    groupBy on 5 keys; the share window runs on 5 rows. Nothing here
    scales with anything but the fact scan."""
    orders = load(spark, sf_dir, "orders")
    folded = orders.select(
        portable_bucket(F.col("o_orderkey"), 5).alias("fold"),
        "o_orderpriority",
        "o_totalprice",
    )
    per_fold = folded.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("urgent_rate"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_rev"),
    )
    return per_fold.select(
        "fold",
        "n_orders",
        F.round(
            F.col("n_orders") / F.sum("n_orders").over(Window.partitionBy()),
            6,
        ).alias("share"),
        "urgent_rate",
        "total_rev",
    )


def _hash_uniformity_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    p = chi2_sf_sql_expr("chi2", "63e0")
    return f"""
WITH bucketed AS (
    SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 64 AS b
    FROM (SELECT DISTINCT user_id FROM events)
), cells AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS n FROM bucketed GROUP BY b
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n_keys,
           CAST(COUNT(*) AS BIGINT) AS n_filled,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(MIN(n) AS BIGINT) AS min_bucket,
           SUM(CAST(n AS DOUBLE) * n) AS sum_n2
    FROM cells
), stat AS (
    SELECT n_keys, n_filled, max_bucket, min_bucket,
           CASE WHEN n_keys = 0 THEN NULL
                ELSE 64.0 * sum_n2 / n_keys - n_keys END AS chi2
    FROM tot
)
SELECT n_keys, n_filled, max_bucket, min_bucket,
       CASE WHEN chi2 IS NULL THEN NULL ELSE ROUND(chi2, 4) END
           AS chi2_uniformity,
       CASE WHEN chi2 IS NULL THEN NULL ELSE ROUND({p}, 6) END AS p_value
FROM stat
"""


@register(
    "quality_hash_uniformity",
    oracle=_hash_uniformity_oracle(),
    tags=("sampling", "quality"),
)
def quality_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity audit of the engine's portable md5 bucket
    hash over 64 buckets of the distinct user keys — the correctness
    hinge every hash-split, salted join, and stratified sampler in this
    repo leans on (`split_by_hash`, `random_split`, `join_skew_salted`):
    if the bucket distribution is skewed for a real key population,
    every 80/10/10 split silently isn't. χ² = Σ(n_b − E)²/E against the
    uniform expectation folds to the algebraic form 64·Σn²/N − N, which
    needs no per-bucket expected-count join; p via the shared
    Wilson–Hilferty fragment at df = 63. Also reports min/max bucket
    occupancy — the numbers a debugging engineer looks at first.

    Scale: one distinct on the key (map-side combined), one 64-row cell
    fold; everything after is O(1). Exact integer counts; χ² is one
    shared double expression over them. Empty input pins NULL."""
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    keys = load(spark, sf_dir, "events").select("user_id").distinct()
    cells = keys.select(
        portable_bucket(F.col("user_id"), 64).alias("b")
    ).groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.agg(
        F.sum("n").cast("long").alias("n_keys"),
        F.count(F.lit(1)).cast("long").alias("n_filled"),
        F.max("n").cast("long").alias("max_bucket"),
        F.min("n").cast("long").alias("min_bucket"),
        F.sum(F.expr("CAST(n AS DOUBLE) * n")).alias("sum_n2"),
    )
    stat = tot.select(
        "n_keys",
        "n_filled",
        "max_bucket",
        "min_bucket",
        F.expr(
            "CASE WHEN n_keys = 0 THEN NULL"
            " ELSE 64.0 * sum_n2 / n_keys - n_keys END"
        ).alias("chi2"),
    )
    p = chi2_sf_sql_expr("chi2", "63e0")
    return stat.select(
        "n_keys",
        "n_filled",
        "max_bucket",
        "min_bucket",
        F.expr(
            "CASE WHEN chi2 IS NULL THEN NULL ELSE ROUND(chi2, 4) END"
        ).alias("chi2_uniformity"),
        F.expr(
            f"CASE WHEN chi2 IS NULL THEN NULL ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
    )
