"""Model-evaluation operators: confusion/PRF, exact AUC, ranking metrics,
calibration, regression error — the offline-eval suite a training pipeline
runs after every fit.

The reference evaluates its ALS model with a single RMSE
(model-als.py:118-121, RegressionEvaluator); SURVEY.md §2.7 declares
evaluation an engine surface. These operators compute the standard metric
families with pure aggregate algebra — fact-sized data folds to the
metric's natural grain (class, score, user, bin) in ONE map-side-combined
aggregation, and every statistic derives from that reduced table. No
metric here ever collects predictions to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load, maybe_broadcast
from recommendation_system_big_data_spark.operators.sampling import portable_bucket
from recommendation_system_big_data_spark.registry import register


from recommendation_system_big_data_spark.functions.text import _SW_SQL

_CONFUSION_ORACLE = f"""
WITH pred AS (
    SELECT CASE WHEN CAST(len(list_intersect(list_distinct(string_split(text,' ')),
                {_SW_SQL})) AS DOUBLE)
                / greatest(len(list_distinct(string_split(text,' '))), 1) >= 0.05
           THEN 'en' ELSE 'unk' END AS p,
           lang AS y
    FROM documents
), cells AS (
    SELECT p, y, CAST(COUNT(*) AS BIGINT) AS n FROM pred GROUP BY p, y
), classes AS (
    SELECT DISTINCT p AS c FROM cells UNION SELECT DISTINCT y FROM cells
)
SELECT c AS class,
       CAST(COALESCE(SUM(CASE WHEN p = c AND y = c THEN n END), 0) AS BIGINT) AS tp,
       CAST(COALESCE(SUM(CASE WHEN p = c AND y <> c THEN n END), 0) AS BIGINT) AS fp,
       CAST(COALESCE(SUM(CASE WHEN p <> c AND y = c THEN n END), 0) AS BIGINT) AS fn,
       ROUND(COALESCE(SUM(CASE WHEN p = c AND y = c THEN n END), 0)
             / CAST(greatest(COALESCE(SUM(CASE WHEN p = c THEN n END), 0), 1)
                    AS DOUBLE), 6) AS precision,
       ROUND(COALESCE(SUM(CASE WHEN p = c AND y = c THEN n END), 0)
             / CAST(greatest(COALESCE(SUM(CASE WHEN y = c THEN n END), 0), 1)
                    AS DOUBLE), 6) AS recall
FROM classes CROSS JOIN cells
GROUP BY c
"""


@register("ml_eval_confusion", oracle=_CONFUSION_ORACLE, tags=("ml", "eval"))
def ml_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class confusion counts + precision/recall for the language-ID
    heuristic against the labeled `lang` column — classification eval as
    a composition: the registered `text_lang_id` query supplies
    (predicted, labeled) and this operator turns any such pair stream
    into the metric table.

    Fact rows fold to the |pred|×|label| cell table in one groupBy;
    per-class tp/fp/fn then come from conditional sums over the CELLS
    joined against the (broadcast, ≤|classes|-row) class list — the raw
    predictions are scanned exactly once no matter how many classes or
    metrics are read off. Cites reference eval:
    model-als.py:118-121 (single-metric RegressionEvaluator)."""
    from recommendation_system_big_data_spark.functions.text import text_lang_id

    pred = text_lang_id(spark, sf_dir).select(
        F.col("predicted_lang").alias("p"), F.col("labeled_lang").alias("y")
    )
    cells = pred.groupBy("p", "y").agg(F.count(F.lit(1)).cast("long").alias("n"))
    classes = (
        cells.select(F.col("p").alias("c"))
        .union(cells.select("y"))
        .distinct()
    )
    j = F.broadcast(classes).crossJoin(cells)
    tp = F.coalesce(F.sum(F.when((F.col("p") == F.col("c")) & (F.col("y") == F.col("c")), F.col("n"))), F.lit(0))
    fp = F.coalesce(F.sum(F.when((F.col("p") == F.col("c")) & (F.col("y") != F.col("c")), F.col("n"))), F.lit(0))
    fn = F.coalesce(F.sum(F.when((F.col("p") != F.col("c")) & (F.col("y") == F.col("c")), F.col("n"))), F.lit(0))
    return j.groupBy(F.col("c").alias("class")).agg(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        F.round(tp / F.greatest(tp + fp, F.lit(1)).cast("double"), 6).alias(
            "precision"
        ),
        F.round(tp / F.greatest(tp + fn, F.lit(1)).cast("double"), 6).alias(
            "recall"
        ),
    )


_AUC_ORACLE = """
WITH s AS (
    SELECT value,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS c_p,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events
    GROUP BY value
), r AS (
    SELECT c_p, c,
           COALESCE(CAST(SUM(c) OVER (
               ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS BIGINT), 0) AS cum_before
    FROM s
), t AS (
    SELECT CAST(SUM(c_p) AS BIGINT) AS n_pos,
           CAST(SUM(c - c_p) AS BIGINT) AS n_neg,
           CAST(SUM(c_p * (2 * cum_before + c + 1)) AS BIGINT) AS rank_sum2_p
    FROM r
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE ROUND((rank_sum2_p / 2.0 - n_pos * (n_pos + 1) / 2.0)
                 / (CAST(n_pos AS DOUBLE) * n_neg), 6) END AS auc
FROM t
"""


def auc_exact(scored: DataFrame, score: str = "value",
              is_pos: str = "is_pos") -> DataFrame:
    """Library kernel: exact ROC AUC of any (score, is_pos) frame via the
    midrank identity — fold to the distinct-score grain, running count
    for midranks (2× arithmetic keeps everything BIGINT), one keyless
    reduce. Returns (n_pos, n_neg, auc). Property-tested against the
    O(n²) pairwise definition in tests/test_property_stats.py.

    The running count uses the two-phase distributed prefix sum
    (ranges.running_sums): the distinct-score grid grows with the data
    (real-valued scores ⇒ ~n distinct), so a bare Window.orderBy(score)
    would funnel the whole grid through one task at 100 TB."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    s = scored.groupBy(score).agg(
        F.count(F.when(F.col(is_pos), 1)).alias("c_p"),
        F.count(F.lit(1)).alias("c"),
    )
    r = running_sums(s, [score], {"cum_before": ("c", False)}).select(
        "c_p", "c", "cum_before"
    )
    t = r.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum(F.col("c") - F.col("c_p")).cast("long").alias("n_neg"),
        F.sum(F.col("c_p") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("long")
        .alias("rank_sum2_p"),
    )
    # A single-class frame (n_pos = 0 or n_neg = 0) leaves AUC undefined —
    # pin NULL on both engines instead of the ANSI raise. r13 probe.
    return t.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.round(
                (
                    F.col("rank_sum2_p") / 2.0
                    - F.col("n_pos") * (F.col("n_pos") + 1) / 2.0
                )
                / (F.col("n_pos").cast("double") * F.col("n_neg")),
                6,
            )
        )
        .alias("auc"),
    )


@register("ml_eval_auc_roc", oracle=_AUC_ORACLE, tags=("ml", "eval"))
def ml_eval_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of `value` as a purchase-vs-rest score, via the
    rank identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with midranks for
    ties — NOT threshold sweeping: the identity gives the exact area in
    one pass, which is why it's the standard distributed AUC.

    Same scalable machinery as `stat_mann_whitney` (AUC is the
    normalized U statistic): fold to the distinct-score grain with
    per-class counts, running count over that grain for midranks
    (doubled → exact BIGINT arithmetic until the final division), one
    keyless reduce. The unpartitioned window runs on distinct scores
    only; the bucketed prefix-sum fallback (ranges.py) applies verbatim
    if scores outgrow one partition."""
    scored = load(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").alias("is_pos")
    )
    return auc_exact(scored)


_PATK_ORACLE = """
WITH ranked AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
           ) AS rn
    FROM events
), top3 AS (
    SELECT user_id,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS hits
    FROM ranked WHERE rn <= 3 GROUP BY user_id
), rel AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nrel
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT
    CAST((SELECT COUNT(*) FROM top3) AS BIGINT) AS n_users,
    CAST((SELECT COUNT(*) FROM rel) AS BIGINT) AS n_rel_users,
    ROUND((SELECT AVG(hits / 3.0) FROM top3), 6) AS mean_p_at_3,
    ROUND((SELECT AVG(CAST(t.hits AS DOUBLE) / r.nrel)
           FROM rel r JOIN top3 t ON r.user_id = t.user_id), 6)
        AS mean_recall_at_3
"""


@register("ml_eval_precision_at_k", oracle=_PATK_ORACLE, tags=("ml", "eval"))
def ml_eval_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@3 / Recall@3 treating each user's top-3 events by value
    as the "recommended" slate and purchases as relevance — the ranking
    eval the reference's top-30 slates (model-als.py:132) never get.

    One user-partitioned window ranks the slate (same shuffle shape as
    `topk_per_user`), hits fold per user, relevance counts fold per user
    in a parallel branch of the SAME shuffle key, and the two ≤|users|
    tables join on their common partitioning before a final keyless
    reduce. Per-user metric averaging (macro average) keeps whales from
    dominating — the metric every recsys eval reports."""
    ev = load(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    )
    top3 = (
        ev.select("user_id", "event_type", rn.alias("rn"))
        .where(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("hits")
        )
    )
    rel = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("nrel"))
    )
    joined = rel.join(top3, "user_id")
    p = top3.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.avg(F.col("hits") / 3.0), 6).alias("mean_p_at_3"),
    )
    rc = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_rel_users"),
        F.round(F.avg(F.col("hits").cast("double") / F.col("nrel")), 6).alias(
            "mean_recall_at_3"
        ),
    )
    return p.crossJoin(F.broadcast(rc)).select(
        "n_users", "n_rel_users", "mean_p_at_3", "mean_recall_at_3"
    )


_CALIBRATION_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS vmax FROM events
), binned AS (
    SELECT LEAST(CAST(FLOOR(value / vmax * 10) AS BIGINT), 9) AS bin,
           value / vmax AS score,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events CROSS JOIN mx
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(AVG(CAST(pos AS DOUBLE)), 6) AS pos_rate
FROM binned GROUP BY bin
"""


@register("ml_eval_calibration", oracle=_CALIBRATION_ORACLE, tags=("ml", "eval"))
def ml_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table: value normalized to [0,1] as a score, cut into
    10 equal-width bins; per bin the mean score vs the observed purchase
    rate — the reliability-diagram data behind "is 0.8 really 80%?".

    The global max joins back as a 1-row broadcast (same pattern as
    `ts_seasonal_index`); binning is a narrow codegen'd expression and
    the whole metric is one groupBy on 10 keys. Bin edges use the exact
    double max on both engines, so assignment is deterministic."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(mx)).select(
        F.least(
            F.floor(F.col("value") / F.col("vmax") * 10).cast("long"), F.lit(9)
        ).alias("bin"),
        (F.col("value") / F.col("vmax")).alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.round(F.avg(F.col("pos").cast("double")), 6).alias("pos_rate"),
    )


_REG_METRICS_ORACLE = """
WITH split AS (
    SELECT event_type, value,
           CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 80
                THEN 'train' ELSE 'test' END AS part
    FROM events
), model AS (
    SELECT event_type, AVG(value) AS yhat
    FROM split WHERE part = 'train' GROUP BY event_type
), scored AS (
    SELECT s.value AS y, m.yhat
    FROM split s JOIN model m ON s.event_type = m.event_type
    WHERE s.part = 'test'
), base AS (
    SELECT AVG(y) AS ybar FROM scored
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_test,
    ROUND(SQRT(AVG(POW(y - yhat, 2))), 4) AS rmse,
    ROUND(AVG(ABS(y - yhat)), 4) AS mae,
    CASE WHEN SUM(POW(y - ybar, 2)) = 0 THEN NULL
         ELSE ROUND(1 - SUM(POW(y - yhat, 2)) / SUM(POW(y - ybar, 2)), 4)
         END AS r2,
    ROUND(AVG(CASE WHEN y = 0 THEN NULL
                   ELSE ABS(y - yhat) / ABS(y) END), 4) AS mape
FROM scored CROSS JOIN base
"""


@register(
    "ml_eval_regression_metrics", oracle=_REG_METRICS_ORACLE, tags=("ml", "eval")
)
def ml_eval_regression_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe regression eval: fit the simplest model (per-type mean
    on the 80% hash-split train partition), score the held-out 20%, and
    report RMSE / MAE / R² / MAPE in one reduce — the metric ladder the
    reference reports one rung of (RMSE, model-als.py:118-121).

    The split is the portable md5 bucket (stable under re-ingestion —
    the property split_by_hash pins); the "model" is a ≤|types|-row
    aggregate that joins back as a broadcast, so scoring is a narrow map
    over the test scan and every metric folds in the same single
    aggregation (R²'s baseline mean joins as a second 1-row
    broadcast)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "part",
        F.when(portable_bucket(F.col("event_id"), 100) < 80, "train").otherwise(
            "test"
        ),
    )
    model = (
        ev.where(F.col("part") == "train")
        .groupBy("event_type")
        .agg(F.avg("value").alias("yhat"))
    )
    scored = (
        ev.where(F.col("part") == "test")
        .join(F.broadcast(model), "event_type")
        .select(F.col("value").alias("y"), "yhat")
    )
    base = scored.agg(F.avg("y").alias("ybar"))
    err = F.col("y") - F.col("yhat")
    ss_tot = F.sum(F.pow(F.col("y") - F.col("ybar"), 2))
    # r13 degenerate probe: a constant-target test fold gives ss_tot = 0
    # (every centered term exactly 0.0 on both engines) — R² is undefined;
    # pin NULL rather than let ANSI Spark raise where DuckDB NULLs. MAPE
    # is per-row undefined at y = 0: NULL those terms BEFORE the AVG
    # (both engines' AVG skips NULLs), i.e. MAPE over nonzero actuals —
    # the standard convention stated rather than implied.
    return scored.crossJoin(F.broadcast(base)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(F.sqrt(F.avg(F.pow(err, 2))), 4).alias("rmse"),
        F.round(F.avg(F.abs(err)), 4).alias("mae"),
        F.when(ss_tot == 0, F.lit(None).cast("double"))
        .otherwise(F.round(1 - F.sum(F.pow(err, 2)) / ss_tot, 4))
        .alias("r2"),
        F.round(
            F.avg(
                F.when(F.col("y") == 0, F.lit(None).cast("double")).otherwise(
                    F.abs(err) / F.abs(F.col("y"))
                )
            ),
            4,
        ).alias("mape"),
    )


_FEATURE_HASH_ORACLE = """
WITH toks AS (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
    FROM documents
), hashed AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 32 AS bucket
    FROM toks WHERE tok <> ''
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM hashed GROUP BY doc_id, bucket
"""


@register("ml_feature_hashing", oracle=_FEATURE_HASH_ORACLE, tags=("ml", "text"))
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization: tokens hash into a fixed 32-bucket
    space and the per-(doc, bucket) term frequencies ARE the sparse
    feature vector — the vocabulary-free vectorizer
    (HashingTF/FeatureHasher semantics) that needs no fitted dictionary,
    no broadcast vocab, and therefore no coordination at 100 TB: any
    executor can featurize any shard independently, and the bucket space
    is fixed no matter how the corpus grows.

    The hash is the engine's portable md5 bucket rather than a JVM
    murmur, so the exact same features come out of ANY engine that can
    md5 — which also makes the op fully oracle-checkable. One explode +
    one map-side-combined groupBy; output is the sparse COO form
    downstream trainers consume."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    bucket = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long") % 32
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


_TARGET_ENC_ORACLE = """
WITH folded AS (
    SELECT o_orderpriority AS cat,
           CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
               AS BIGINT) % 5 AS fold,
           CAST(o_totalprice AS DECIMAL(18,2)) AS y
    FROM orders
), cf AS (
    SELECT cat, CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_cf,
           CAST(SUM(y) AS DECIMAL(28,2)) AS sum_cf
    FROM folded GROUP BY cat, fold
), c AS (
    SELECT cat, CAST(SUM(n_cf) AS BIGINT) AS n_c,
           CAST(SUM(sum_cf) AS DECIMAL(28,2)) AS sum_c
    FROM cf GROUP BY cat
)
SELECT cf.cat, cf.fold, cf.n_cf,
       CASE WHEN c.n_c = cf.n_cf THEN NULL
            ELSE ROUND(CAST(c.sum_c - cf.sum_cf AS DOUBLE)
                       / (c.n_c - cf.n_cf), 4) END AS oof_mean,
       ROUND(CAST(c.sum_c AS DOUBLE) / c.n_c, 4) AS cat_mean
FROM cf JOIN c ON cf.cat = c.cat
"""


@register("ml_target_encoding", oracle=_TARGET_ENC_ORACLE, tags=("ml", "feature"))
def ml_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe (out-of-fold) target encoding: each (category, fold)
    cell gets the target mean computed from the OTHER four folds —
    the feature-engineering staple that naive per-category means get
    wrong (a row must never see its own target). Folds come from the
    same portable md5 bucket as `ml_cv_fold_assign`, so encoding and
    training folds agree by construction.

    The subtraction trick makes it one pass: per-(cat, fold) count/sum
    partials roll up to per-cat totals, and the out-of-fold mean is
    (total − own fold)/(n − own n) — no k-fold re-scan, no self-join of
    the fact table. Sums ride as DECIMAL so both engines divide identical
    exact numerators. The encode table is |cats|×k rows — broadcast it to
    score the training set."""
    folded = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("cat"),
        portable_bucket(F.col("o_orderkey"), 5).alias("fold"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("y"),
    )
    cf = folded.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_cf"),
        F.sum("y").cast("decimal(28,2)").alias("sum_cf"),
    )
    c = cf.groupBy("cat").agg(
        F.sum("n_cf").cast("long").alias("n_c"),
        F.sum("sum_cf").cast("decimal(28,2)").alias("sum_c"),
    )
    return cf.join(F.broadcast(c), "cat").select(
        "cat",
        "fold",
        "n_cf",
        # a category living entirely in ONE fold has no out-of-fold data:
        # NULL (the honest "no encoding available"), not an ANSI raise.
        # r13 tiny-fixture probe finding.
        F.when(
            F.col("n_c") == F.col("n_cf"), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(
                (F.col("sum_c") - F.col("sum_cf")).cast("double")
                / (F.col("n_c") - F.col("n_cf")),
                4,
            )
        )
        .alias("oof_mean"),
        F.round(F.col("sum_c").cast("double") / F.col("n_c"), 4).alias("cat_mean"),
    )


_WOE_IV_ORACLE = """
WITH labeled AS (
    SELECT c.c_mktsegment AS cat,
           CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pos
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), cells AS (
    SELECT cat,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg
    FROM labeled GROUP BY cat
), kept AS (
    SELECT * FROM cells WHERE n_pos > 0 AND n_neg > 0
), tot AS (
    SELECT CAST(SUM(n_pos) AS DOUBLE) AS tp, CAST(SUM(n_neg) AS DOUBLE) AS tn
    FROM kept
)
SELECT cat, n_pos, n_neg,
       ROUND(LN((n_pos / tp) / (n_neg / tn)), 6) AS woe,
       ROUND((n_pos / tp - n_neg / tn) * LN((n_pos / tp) / (n_neg / tn)), 6)
           AS iv_contribution
FROM kept CROSS JOIN tot
"""


@register("ml_woe_iv", oracle=_WOE_IV_ORACLE, tags=("ml", "feature"))
def ml_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence and information value per category — the
    credit-scoring/feature-screening measure of how strongly a
    categorical feature separates a binary target (IV < 0.02: useless;
    > 0.3: strong; the IV sum over rows is the feature's score).
    WoE = ln(%pos/%neg) per category against mktsegment vs urgent-order
    incidence.

    One broadcast dim join + one groupBy on the category; totals join
    back as a 1-row broadcast. Categories missing either class are
    excluded BEFORE the totals (WoE is ±∞ there — and Spark's ln(0) is
    NULL where DuckDB's is -inf, a cross-engine divergence this guard
    removes; the standard fix when such cells matter is Laplace
    smoothing). Integer counts make every ratio exact until the final
    ln, so ROUND(6) is cosmetic, not load-bearing."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("cat")
    )
    labeled = (
        load(spark, sf_dir, "orders")
        .join(maybe_broadcast(cust, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "cat",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("pos"),
        )
    )
    cells = labeled.groupBy("cat").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("long").alias("n_neg"),
    )
    kept = cells.where((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    tot = kept.agg(
        F.sum("n_pos").cast("double").alias("tp"),
        F.sum("n_neg").cast("double").alias("tn"),
    )
    pr = F.col("n_pos") / F.col("tp")
    nr = F.col("n_neg") / F.col("tn")
    return kept.crossJoin(F.broadcast(tot)).select(
        "cat",
        "n_pos",
        "n_neg",
        F.round(F.log(pr / nr), 6).alias("woe"),
        F.round((pr - nr) * F.log(pr / nr), 6).alias("iv_contribution"),
    )


_LOGREG_LR = 0.1

_LOGREG_ORACLE = f"""
WITH base AS (
    SELECT CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y,
           value / 100.0 AS x1
    FROM events
), w1 AS (
    SELECT 0 - {_LOGREG_LR} * AVG(1.0 * (0.5 - y)) AS w0,
           0 - {_LOGREG_LR} * AVG(x1 * (0.5 - y)) AS w1
    FROM base
), w2 AS (
    SELECT w1.w0 - {_LOGREG_LR} * AVG(
               1.0 * (1.0 / (1.0 + EXP(-(w1.w0 + w1.w1 * x1))) - y)) AS w0,
           w1.w1 - {_LOGREG_LR} * AVG(
               x1 * (1.0 / (1.0 + EXP(-(w1.w0 + w1.w1 * x1))) - y)) AS w1
    FROM base CROSS JOIN w1
    GROUP BY w1.w0, w1.w1
), w3 AS (
    SELECT w2.w0 - {_LOGREG_LR} * AVG(
               1.0 * (1.0 / (1.0 + EXP(-(w2.w0 + w2.w1 * x1))) - y)) AS w0,
           w2.w1 - {_LOGREG_LR} * AVG(
               x1 * (1.0 / (1.0 + EXP(-(w2.w0 + w2.w1 * x1))) - y)) AS w1
    FROM base CROSS JOIN w2
    GROUP BY w2.w0, w2.w1
)
SELECT CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_rows,
       ROUND(w0, 4) AS w0,
       ROUND(w1, 4) AS w1,
       ROUND((SELECT AVG(CASE WHEN (w3.w0 + w3.w1 * b.x1 > 0) = (b.y = 1.0)
                              THEN 1.0 ELSE 0.0 END)
              FROM base b), 6) AS train_accuracy
FROM w3
"""


@register("ml_logreg_gd", oracle=_LOGREG_ORACLE, tags=("ml",))
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression by batch gradient descent — 3 fixed full-batch
    steps, lr=0.1, predicting purchase from the scaled event value —
    iterative ML training expressed entirely as aggregate algebra: each
    step is ONE keyless reduce (the gradient is an average of per-row
    σ(w·x)−y terms) and the 2-weight model rides between steps as a
    broadcast 1-row aggregate, never touching the driver.

    This is the distributed-training shape in miniature: scan-bound,
    fully partial-aggregable gradients, model state O(d) — exactly how a
    parameter-server round works, minus the server. Fixed iteration
    count keeps it oracle-expressible (the DuckDB oracle unrolls the
    same 3 steps as CTE levels — same trick as graph_pagerank). The
    closed-form sibling is ml_linreg_normal_eq; the evaluation ladder
    (AUC/calibration/confusion) consumes this model's scores."""
    base = load(spark, sf_dir, "events").select(
        F.when(F.col("event_type") == "purchase", 1.0).otherwise(0.0).alias("y"),
        (F.col("value") / 100.0).alias("x1"),
    )
    w = base.agg(
        (F.lit(0) - _LOGREG_LR * F.avg(1.0 * (0.5 - F.col("y")))).alias("w0"),
        (F.lit(0) - _LOGREG_LR * F.avg(F.col("x1") * (0.5 - F.col("y")))).alias(
            "w1"
        ),
    )
    for _ in range(2):
        z = F.col("w0") + F.col("w1") * F.col("x1")
        sig = 1.0 / (1.0 + F.exp(-z))
        w = (
            base.crossJoin(F.broadcast(w))
            .groupBy("w0", "w1")
            .agg(
                F.avg(1.0 * (sig - F.col("y"))).alias("g0"),
                F.avg(F.col("x1") * (sig - F.col("y"))).alias("g1"),
            )
            .select(
                (F.col("w0") - _LOGREG_LR * F.col("g0")).alias("w0"),
                (F.col("w1") - _LOGREG_LR * F.col("g1")).alias("w1"),
            )
        )
    scored = base.crossJoin(F.broadcast(w))
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.max("w0"), 4).alias("w0"),
        F.round(F.max("w1"), 4).alias("w1"),
        F.round(
            F.avg(
                F.when(
                    (F.col("w0") + F.col("w1") * F.col("x1") > 0)
                    == (F.col("y") == 1.0),
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("train_accuracy"),
    )


_NDCG_ORACLE = """
WITH ranked AS (
    SELECT user_id,
           CASE event_type WHEN 'purchase' THEN 2.0
                           WHEN 'click' THEN 1.0 ELSE 0.0 END AS gain,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id ASC
           ) AS rn
    FROM events
), dcg AS (
    SELECT user_id,
           SUM(gain / (LN(rn + 1) / LN(2))) AS dcg3
    FROM ranked WHERE rn <= 3 GROUP BY user_id
), ideal AS (
    SELECT user_id,
           SUM(gain / (LN(irn + 1) / LN(2))) AS idcg3
    FROM (
        SELECT user_id, gain,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY gain DESC, event_id ASC
               ) AS irn
        FROM (
            SELECT user_id, event_id,
                   CASE event_type WHEN 'purchase' THEN 2.0
                                   WHEN 'click' THEN 1.0 ELSE 0.0 END AS gain
            FROM events
        )
    ) WHERE irn <= 3
    GROUP BY user_id
), mrr AS (
    SELECT user_id, MIN(rn) AS first_rel
    FROM ranked WHERE gain > 0 GROUP BY user_id
)
SELECT
    CAST((SELECT COUNT(*) FROM dcg) AS BIGINT) AS n_users,
    ROUND((SELECT AVG(CASE WHEN i.idcg3 > 0 THEN d.dcg3 / i.idcg3 ELSE 0 END)
           FROM dcg d JOIN ideal i ON d.user_id = i.user_id), 6) AS mean_ndcg_3,
    ROUND((SELECT AVG(1.0 / first_rel) FROM mrr), 6) AS mrr
"""


@register("ml_eval_ndcg_mrr", oracle=_NDCG_ORACLE, tags=("ml", "eval"))
def ml_eval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@3 and MRR — the graded and position-of-first-hit ranking
    metrics completing the slate-eval ladder (P@k/R@k in
    ml_eval_precision_at_k are binary and position-blind; NDCG discounts
    by rank with graded gains purchase=2 > click=1, MRR cares only where
    the first relevant item sits).

    Two user-partitioned rankings share the same shuffle key (actual
    order by score, ideal order by gain); DCG/IDCG fold per user, their
    ratio macro-averages, and MRR is avg(1/min relevant rank). Gains are
    small exact rationals over log2 — both engines compute identical
    per-user terms, ROUND(6) covers the macro-average summation order."""
    ev = load(spark, sf_dir, "events")
    gain = (
        F.when(F.col("event_type") == "purchase", 2.0)
        .when(F.col("event_type") == "click", 1.0)
        .otherwise(0.0)
    )
    ranked = ev.select(
        "user_id",
        gain.alias("gain"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                F.desc("value"), F.asc("event_id")
            )
        )
        .alias("rn"),
        F.row_number()
        .over(
            Window.partitionBy("user_id").orderBy(
                gain.desc(), F.asc("event_id")
            )
        )
        .alias("irn"),
    )
    log2 = F.log(F.col("rn") + 1) / F.log(F.lit(2.0))
    ilog2 = F.log(F.col("irn") + 1) / F.log(F.lit(2.0))
    dcg = (
        ranked.where(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(F.sum(F.col("gain") / log2).alias("dcg3"))
    )
    ideal = (
        ranked.where(F.col("irn") <= 3)
        .groupBy("user_id")
        .agg(F.sum(F.col("gain") / ilog2).alias("idcg3"))
    )
    mrr = (
        ranked.where(F.col("gain") > 0)
        .groupBy("user_id")
        .agg(F.min("rn").alias("first_rel"))
    )
    nd = dcg.join(ideal, "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(
            F.avg(
                F.when(
                    F.col("idcg3") > 0, F.col("dcg3") / F.col("idcg3")
                ).otherwise(0.0)
            ),
            6,
        ).alias("mean_ndcg_3"),
    )
    mr = mrr.agg(F.round(F.avg(1.0 / F.col("first_rel")), 6).alias("mrr"))
    return nd.crossJoin(F.broadcast(mr))


_NB_ORACLE = """
WITH split AS (
    SELECT doc_id, lang, text,
           CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 80
                THEN 'train' ELSE 'test' END AS part
    FROM documents
), toks AS (
    SELECT doc_id, lang, part, UNNEST(string_split(text, ' ')) AS tok
    FROM split
), toks_ne AS (
    SELECT * FROM toks WHERE tok <> ''
), class_tok AS (
    SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
    FROM toks_ne WHERE part = 'train' GROUP BY lang, tok
), class_tot AS (
    SELECT lang, CAST(SUM(c) AS BIGINT) AS tot,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM class_tok GROUP BY lang
), vocab AS (
    SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
    FROM toks_ne WHERE part = 'train'
), priors AS (
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM split WHERE part = 'train' GROUP BY lang
), prior_tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM priors
), doc_tok AS (
    SELECT doc_id, lang AS true_lang, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks_ne WHERE part = 'test' GROUP BY doc_id, lang, tok
), scored AS (
    SELECT d.doc_id, d.true_lang, p.lang AS cand,
           LN(p.n_docs / CAST(pt.n AS DOUBLE))
           + SUM(d.tf * LN((COALESCE(ct.c, 0) + 1)
                           / CAST(t.tot + vocab.v AS DOUBLE))) AS score
    FROM doc_tok d
    CROSS JOIN priors p
    CROSS JOIN prior_tot pt
    CROSS JOIN vocab
    JOIN class_tot t ON t.lang = p.lang
    LEFT JOIN class_tok ct ON ct.lang = p.lang AND ct.tok = d.tok
    GROUP BY d.doc_id, d.true_lang, p.lang, p.n_docs, pt.n
), best AS (
    SELECT doc_id, true_lang,
           MIN(ROW(-score, cand)) AS r
    FROM scored GROUP BY doc_id, true_lang
)
SELECT true_lang,
       r[2] AS predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM best
GROUP BY true_lang, r[2]
"""


@register("ml_naive_bayes_langid", oracle=_NB_ORACLE, tags=("ml", "text"))
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier — train on the 80% md5
    hash split, Laplace-smoothed per-class token likelihoods, classify
    the held-out 20%, output the confusion cells — a full supervised
    text-classification pipeline (fit → predict → evaluate) in pure
    relational algebra, end-to-end oracle-checkable.

    Scale shape: the model IS three aggregate tables — (class, token)
    counts, class totals, priors — produced by one explode + groupBys on
    the train split; scoring joins each test doc's (token, tf) rows
    against the likelihood table on TOKEN (equi-join; the class list and
    scalar totals ride along as broadcasts), folds Σ tf·log p per
    (doc, class), and argmaxes with a (−score, class) struct-min — the
    deterministic tiebreak. Nothing iterates; adding classes or tokens
    changes table sizes, not plan shape. Laplace +1 keeps unseen-token
    likelihoods finite; the LEFT JOIN supplies the zero-count rows."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "part",
        F.when(portable_bucket(F.col("doc_id"), 100) < 80, "train").otherwise(
            "test"
        ),
    )
    toks = docs.select(
        "doc_id", "lang", "part", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    train = toks.where(F.col("part") == "train")
    class_tok = train.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # Model scalars derive from the ALREADY-AGGREGATED (lang, tok) table —
    # map-side-combined aggregates, never windows: a global or per-lang
    # unbounded window here would funnel the whole vocabulary through one
    # partition (an OOM + straggler at web-corpus vocabulary), which is
    # exactly the state-bound mistake agg_summary's rewrite removed. The
    # one round-7 change kept: vocabulary size counts the model table
    # (|vocab|·|langs| rows), not a second explode+distinct pass over the
    # raw train corpus.
    class_tot = class_tok.groupBy("lang").agg(
        F.sum("c").cast("long").alias("tot")
    )
    vocab = class_tok.agg(F.countDistinct("tok").cast("long").alias("v"))
    priors = (
        docs.where(F.col("part") == "train")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    prior_tot = priors.agg(F.sum("n_docs").cast("long").alias("n"))
    doc_tok = (
        toks.where(F.col("part") == "test")
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cand = (
        priors.join(F.broadcast(class_tot), "lang")
        .crossJoin(F.broadcast(prior_tot))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cand"),
            "n_docs",
            "tot",
            "n",
            "v",
        )
    )
    likeli = class_tok.select(
        F.col("lang").alias("cand"), "tok", "c"
    )
    scored = (
        doc_tok.crossJoin(F.broadcast(cand))
        .join(likeli, ["cand", "tok"], "left")  # vocab-sized: let AQE
        # choose broadcast vs shuffle by stats — forcing broadcast would
        # OOM at web-corpus vocabulary
        .groupBy("doc_id", "true_lang", "cand", "n_docs", "n")
        .agg(
            F.sum(
                F.col("tf")
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("tot") + F.col("v")).cast("double")
                )
            ).alias("ll")
        )
        .select(
            "doc_id",
            "true_lang",
            "cand",
            (
                F.log(F.col("n_docs") / F.col("n").cast("double")) + F.col("ll")
            ).alias("score"),
        )
    )
    best = scored.groupBy("doc_id", "true_lang").agg(
        F.min(F.struct((-F.col("score")).alias("neg"), F.col("cand"))).alias("r")
    )
    return best.groupBy(
        "true_lang", F.col("r.cand").alias("predicted_lang")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


_IPW_ORACLE = """
WITH base AS (
    SELECT c.c_mktsegment AS segment,
           CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS t,
           o.o_totalprice AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), prop AS (
    SELECT segment,
           CAST(SUM(t) AS DOUBLE) / COUNT(*) AS p,
           CAST(COUNT(*) AS BIGINT) AS n_seg
    FROM base GROUP BY segment
), scored AS (
    SELECT b.t, b.y, p.p FROM base b JOIN prop p ON b.segment = p.segment
    WHERE p.p > 0 AND p.p < 1
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(t) AS BIGINT) AS n_treated,
    ROUND(AVG(CASE WHEN t = 1 THEN y END)
          - AVG(CASE WHEN t = 0 THEN y END), 4) AS naive_diff,
    ROUND(SUM(t * y / p) / SUM(t / p)
          - SUM((1 - t) * y / (1 - p)) / SUM((1 - t) / (1 - p)), 4)
        AS ipw_ate
FROM scored
"""


@register("ml_ipw_ate", oracle=_IPW_ORACLE, tags=("ml", "experiment"))
def ml_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (Hájek
    estimator): does urgent priority change order value once segment
    composition is controlled for? Propensity = per-segment treatment
    rate; each treated outcome reweights by 1/p, each control by
    1/(1−p), and normalized weighted means difference out the effect —
    the observational-causal baseline, with the naive (confounded)
    difference alongside so the adjustment is visible.

    Two passes by necessity (propensities then reweighting): a |segments|
    propensity fold joined back as a broadcast, then ONE keyless reduce
    carrying all four weighted sums. Degenerate propensities (0 or 1 —
    no overlap) are excluded per positivity; the real-covariate version
    swaps the segment rate for `ml_logreg_gd`'s scores and changes
    nothing structurally."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    base = (
        load(spark, sf_dir, "orders")
        .join(maybe_broadcast(cust, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "segment",
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .otherwise(0)
            .alias("t"),
            F.col("o_totalprice").alias("y"),
        )
    )
    prop = base.groupBy("segment").agg(
        (F.sum("t").cast("double") / F.count(F.lit(1))).alias("p")
    )
    scored = base.join(F.broadcast(prop), "segment").where(
        (F.col("p") > 0) & (F.col("p") < 1)
    )
    t, y, p = F.col("t"), F.col("y"), F.col("p")
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").cast("long").alias("n_treated"),
        F.round(
            F.avg(F.when(t == 1, y)) - F.avg(F.when(t == 0, y)), 4
        ).alias("naive_diff"),
        F.round(
            F.sum(t * y / p) / F.sum(t / p)
            - F.sum((1 - t) * y / (1 - p)) / F.sum((1 - t) / (1 - p)),
            4,
        ).alias("ipw_ate"),
    )


_LINEAR_ATTRIB_ORACLE = """
WITH s AS (
    SELECT COVAR_POP(l_quantity, l_quantity)      AS s11,
           COVAR_POP(l_quantity, l_discount)      AS s12,
           COVAR_POP(l_discount, l_discount)      AS s22,
           COVAR_POP(l_extendedprice, l_quantity) AS sy1,
           COVAR_POP(l_extendedprice, l_discount) AS sy2,
           AVG(l_quantity)      AS mx1,
           AVG(l_discount)      AS mx2,
           AVG(l_extendedprice) AS my
    FROM lineitem
), coef AS (
    SELECT mx1, mx2, my,
           CASE WHEN s11 * s22 - s12 * s12 = 0 THEN NULL
                ELSE (sy1 * s22 - sy2 * s12) / (s11 * s22 - s12 * s12)
                END AS b1,
           CASE WHEN s11 * s22 - s12 * s12 = 0 THEN NULL
                ELSE (sy2 * s11 - sy1 * s12) / (s11 * s22 - s12 * s12)
                END AS b2
    FROM s
)
SELECT l.l_orderkey, l.l_linenumber,
       ROUND(c.my, 4) AS baseline,
       ROUND(c.b1 * (l.l_quantity - c.mx1), 4) AS contrib_quantity,
       ROUND(c.b2 * (l.l_discount - c.mx2), 4) AS contrib_discount,
       ROUND(c.my + c.b1 * (l.l_quantity - c.mx1)
                  + c.b2 * (l.l_discount - c.mx2), 4) AS prediction,
       ROUND(l.l_extendedprice, 4) AS actual
FROM lineitem l CROSS JOIN coef c
ORDER BY c.my + c.b1 * (l.l_quantity - c.mx1)
           + c.b2 * (l.l_discount - c.mx2) DESC,
         l.l_orderkey, l.l_linenumber
LIMIT 20
"""


@register("ml_linear_attribution", oracle=_LINEAR_ATTRIB_ORACLE, tags=("ml", "eval"))
def ml_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feature prediction attribution for the closed-form linear
    model (`ml_linreg_normal_eq`'s coefficients): each prediction
    decomposes EXACTLY as baseline (ȳ) + Σ bⱼ(xⱼ−x̄ⱼ) — the additive
    explanation SHAP generalizes, exact (not sampled) for linear models
    because the decomposition IS the model. Emits the top-20 highest
    predictions with each feature's signed contribution next to the
    actual — the "why is this forecast so high" view.

    The model is a 1-row aggregate (covariance fold + 2×2 Cramer solve)
    broadcast over the scoring scan; contributions are narrow codegen'd
    algebra; top-20 is TakeOrderedAndProject on the unrounded prediction
    with a total key tiebreak."""
    li = load(spark, sf_dir, "lineitem")
    s = li.agg(
        F.covar_pop("l_quantity", "l_quantity").alias("s11"),
        F.covar_pop("l_quantity", "l_discount").alias("s12"),
        F.covar_pop("l_discount", "l_discount").alias("s22"),
        F.covar_pop("l_extendedprice", "l_quantity").alias("sy1"),
        F.covar_pop("l_extendedprice", "l_discount").alias("sy2"),
        F.avg("l_quantity").alias("mx1"),
        F.avg("l_discount").alias("mx2"),
        F.avg("l_extendedprice").alias("my"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    # Singular Gram (constant feature → co-moments exactly 0.0 on both
    # engines) pins NULL coefficients instead of an ANSI raise; NULL then
    # propagates through contributions/prediction identically cross-engine
    # and the top-20 falls back to the key tiebreak (NULLS LAST under DESC
    # on both engines). r13 degenerate-probe finding.
    coef = s.select(
        "mx1",
        "mx2",
        "my",
        F.when(det == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("sy1") * F.col("s22") - F.col("sy2") * F.col("s12")) / det
        )
        .alias("b1"),
        F.when(det == 0, F.lit(None).cast("double"))
        .otherwise(
            (F.col("sy2") * F.col("s11") - F.col("sy1") * F.col("s12")) / det
        )
        .alias("b2"),
    )
    scored = li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice"
    ).crossJoin(F.broadcast(coef))
    c1 = F.col("b1") * (F.col("l_quantity") - F.col("mx1"))
    c2 = F.col("b2") * (F.col("l_discount") - F.col("mx2"))
    pred = F.col("my") + c1 + c2
    return (
        scored.select(
            "l_orderkey",
            "l_linenumber",
            F.round("my", 4).alias("baseline"),
            F.round(c1, 4).alias("contrib_quantity"),
            F.round(c2, 4).alias("contrib_discount"),
            F.round(pred, 4).alias("prediction"),
            F.round("l_extendedprice", 4).alias("actual"),
            pred.alias("_sort"),
        )
        .orderBy(F.desc("_sort"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
        .drop("_sort")
    )


_LIFT_GAINS_ORACLE = """
WITH users AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS score,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS n_pos
    FROM events GROUP BY user_id
), tiled AS (
    SELECT n_pos,
           NTILE(10) OVER (ORDER BY score DESC, user_id ASC) AS decile
    FROM users
), per AS (
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_pos) AS BIGINT) AS n_purchases
    FROM tiled GROUP BY decile
)
SELECT decile, n_users, n_purchases,
       CASE WHEN SUM(n_purchases) OVER () = 0 THEN NULL
            ELSE ROUND(CAST(SUM(n_purchases) OVER (
                 ORDER BY decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / SUM(n_purchases) OVER (), 6) END AS cum_gain,
       CASE WHEN SUM(n_purchases) OVER () = 0 THEN NULL
            ELSE ROUND((n_purchases / CAST(n_users AS DOUBLE))
             / (SUM(n_purchases) OVER () / CAST(SUM(n_users) OVER () AS DOUBLE)),
             6) END AS lift
FROM per
"""


@register("ml_eval_lift_gains", oracle=_LIFT_GAINS_ORACLE, tags=("ml", "eval"))
def ml_eval_lift_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative gains: users ranked by total event value
    (the targeting score), cut into score deciles, and each decile's
    purchase lift over the base rate plus the cumulative share of all
    purchases captured — the campaign-targeting readout ("mail the top 3
    deciles, get X% of buyers"). The threshold-free cousins of AUC: AUC
    summarizes ONE number, the gains curve says where to cut.

    Users fold from the fact stream in one groupBy (DECIMAL scores →
    deterministic decile boundaries); the decile cut runs through
    ranges.ntile_distributed — the user grain scales with the data, so
    the global rank is range-partitioned (exclusive running count + SQL
    NTILE's remainder split, hash-identical to F.ntile; the window-form
    NTILE surface itself is demonstrated by window_ntile_dist). The
    final windows run on 10 rows. Counts exact; only the two ratios are
    doubles."""
    from recommendation_system_big_data_spark.operators.ranges import (
        ntile_distributed,
    )

    users = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("score"),
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("long")
            .alias("n_pos"),
        )
    )
    tiled = ntile_distributed(
        users.withColumn("_negscore", -F.col("score")),
        ["_negscore", "user_id"],
        10,
        "decile",
    ).select("n_pos", "decile")
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_pos").cast("long").alias("n_purchases"),
    )
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    # a purchase-free corpus zeroes the overall rate — NULL gains/lift,
    # not an ANSI raise (r13 tiny-fixture probe finding).
    no_pos = F.sum("n_purchases").over(tot) == 0
    return per.select(
        "decile",
        "n_users",
        "n_purchases",
        F.when(no_pos, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                F.sum("n_purchases").over(cum).cast("double")
                / F.sum("n_purchases").over(tot),
                6,
            )
        )
        .alias("cum_gain"),
        F.when(no_pos, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("n_purchases") / F.col("n_users").cast("double"))
                / (
                    F.sum("n_purchases").over(tot)
                    / F.sum("n_users").over(tot).cast("double")
                ),
                6,
            )
        )
        .alias("lift"),
    )


_PINBALL_ORACLE = """
WITH split AS (
    SELECT event_type, value,
           CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 100 < 80
                THEN 'train' ELSE 'test' END AS part
    FROM events
), model AS (
    SELECT event_type,
           quantile_disc(value, 0.50) AS q50,
           quantile_disc(value, 0.90) AS q90
    FROM split WHERE part = 'train' GROUP BY event_type
)
SELECT s.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       ROUND(AVG(CASE WHEN s.value >= m.q50
                      THEN 0.5 * (s.value - m.q50)
                      ELSE 0.5 * (m.q50 - s.value) END), 4) AS pinball_p50,
       ROUND(AVG(CASE WHEN s.value >= m.q90
                      THEN 0.9 * (s.value - m.q90)
                      ELSE 0.1 * (m.q90 - s.value) END), 4) AS pinball_p90,
       ROUND(AVG(CASE WHEN s.value <= m.q90 THEN 1.0 ELSE 0.0 END), 6)
           AS p90_coverage
FROM split s JOIN model m ON s.event_type = m.event_type
WHERE s.part = 'test'
GROUP BY s.event_type
"""


@register("ml_eval_pinball_loss", oracle=_PINBALL_ORACLE, tags=("ml", "eval"))
def ml_eval_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-forecast evaluation: pinball (quantile) loss of per-type
    P50/P90 predictions fit on the train split and scored on held-out
    rows, plus empirical P90 coverage (should sit near 0.9; far off ⇒
    the quantile model is mis-calibrated). RMSE grades POINT forecasts;
    probabilistic forecasts — the kind capacity planning actually needs —
    are graded exactly this way.

    Same leakage-safe shape as `ml_eval_regression_metrics`: the md5
    hash split, a ≤|types|-row quantile model (DISC — actual train
    values) joined back as a broadcast, and ONE conditional-aggregate
    reduce for both losses and the coverage. The asymmetric loss is
    plain CASE algebra — identical on both engines."""
    ev = load(spark, sf_dir, "events").withColumn(
        "part",
        F.when(portable_bucket(F.col("event_id"), 100) < 80, "train").otherwise(
            "test"
        ),
    )
    model = (
        ev.where(F.col("part") == "train")
        .groupBy("event_type")
        .agg(
            F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("q50"),
            F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY value)").alias("q90"),
        )
    )
    test = ev.where(F.col("part") == "test").join(F.broadcast(model), "event_type")
    v, q50, q90 = F.col("value"), F.col("q50"), F.col("q90")
    return test.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.round(
            F.avg(
                F.when(v >= q50, 0.5 * (v - q50)).otherwise(0.5 * (q50 - v))
            ),
            4,
        ).alias("pinball_p50"),
        F.round(
            F.avg(
                F.when(v >= q90, 0.9 * (v - q90)).otherwise(0.1 * (q90 - v))
            ),
            4,
        ).alias("pinball_p90"),
        F.round(F.avg(F.when(v <= q90, 1.0).otherwise(0.0)), 6).alias(
            "p90_coverage"
        ),
    )


_LEARNING_CURVE_ORACLE = """
WITH base AS (
    SELECT event_type, value,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 100 AS bucket
    FROM events
), test AS (
    SELECT event_type, value FROM base WHERE bucket >= 80
), fracs AS (
    SELECT UNNEST([20, 40, 60, 80]) AS train_pct
), models AS (
    SELECT f.train_pct, b.event_type, AVG(b.value) AS yhat,
           CAST(COUNT(*) AS BIGINT) AS n_train
    FROM base b JOIN fracs f ON b.bucket < f.train_pct
    GROUP BY f.train_pct, b.event_type
)
, sizes AS (
    SELECT train_pct, CAST(SUM(n_train) AS BIGINT) AS n_train_rows
    FROM models GROUP BY train_pct
)
SELECT m.train_pct,
       MAX(s.n_train_rows) AS n_train_rows,
       ROUND(SQRT(AVG(POW(t.value - m.yhat, 2))), 4) AS test_rmse
FROM test t
JOIN models m ON t.event_type = m.event_type
JOIN sizes s ON s.train_pct = m.train_pct
GROUP BY m.train_pct
"""


@register("ml_learning_curve", oracle=_LEARNING_CURVE_ORACLE, tags=("ml", "eval"))
def ml_learning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning curve: held-out RMSE of the per-type-mean model fit on
    nested 20/40/60/80% training fractions — the is-more-data-still-
    helping diagnostic that decides between collecting data and changing
    models (flat curve ⇒ model-bound; falling ⇒ data-bound). Fractions
    NEST by construction (bucket < pct), so each point sees a superset
    of the previous — the property that makes the curve monotone-ish and
    which independent random subsamples break.

    One scan builds all four models: the bucket column joins a 4-row
    broadcast fraction table (each row lands in every fraction it
    belongs to — fan-out ≤4×), folds per (fraction, type), and the fixed
    20% test set evaluates every model in one more broadcast-join
    reduce. Adding curve points changes the fraction literal, not the
    plan."""
    base = load(spark, sf_dir, "events").select(
        "event_type", "value", portable_bucket(F.col("event_id"), 100).alias("bucket")
    )
    test = base.where(F.col("bucket") >= 80).select("event_type", "value")
    fracs = spark.range(1, 5).select((F.col("id") * 20).cast("int").alias("train_pct"))
    models = (
        base.crossJoin(F.broadcast(fracs))
        .where(F.col("bucket") < F.col("train_pct"))
        .groupBy("train_pct", "event_type")
        .agg(
            F.avg("value").alias("yhat"),
            F.count(F.lit(1)).cast("long").alias("n_train"),
        )
    )
    sizes = models.groupBy("train_pct").agg(
        F.sum("n_train").cast("long").alias("n_train_rows")
    )
    return (
        test.join(F.broadcast(models), "event_type")
        .join(F.broadcast(sizes), "train_pct")
        .groupBy("train_pct")
        .agg(
            F.max("n_train_rows").alias("n_train_rows"),
            F.round(
                F.sqrt(F.avg(F.pow(F.col("value") - F.col("yhat"), 2))), 4
            ).alias("test_rmse"),
        )
    )


_THRESHOLD_OPT_ORACLE = """
WITH users AS (
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS score,
           CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY user_id
), cuts AS (
    SELECT DISTINCT UNNEST(quantile_disc(score,
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])) AS thr
    FROM users
), scored AS (
    SELECT c.thr,
           CAST(SUM(CASE WHEN u.score >= c.thr AND u.y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN u.score >= c.thr AND u.y = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN u.score < c.thr AND u.y = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS fn
    FROM users u CROSS JOIN cuts c
    GROUP BY c.thr
)
SELECT ROUND(thr, 4) AS threshold, tp, fp, fn,
       ROUND(tp / CAST(GREATEST(tp + fp, 1) AS DOUBLE), 6) AS precision,
       ROUND(tp / CAST(GREATEST(tp + fn, 1) AS DOUBLE), 6) AS recall,
       ROUND(2.0 * tp / CAST(GREATEST(2 * tp + fp + fn, 1) AS DOUBLE), 6)
           AS f1
FROM scored
"""


@register("ml_threshold_optimization", oracle=_THRESHOLD_OPT_ORACLE, tags=("ml", "eval"))
def ml_threshold_optimization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold sweep: precision/recall/F1 of "flag users with
    score ≥ t" at each score-decile cut — the operating-point table that
    turns a ranked score into a DECISION (AUC says the ranking is good;
    this says where to draw the line, and what each choice of line costs
    in precision vs recall). Read with `ml_eval_lift_gains` (same score,
    population view).

    Users fold once; candidate thresholds are the 9 DISC decile
    boundaries (a ≤9-row broadcast — thresholds from the data, not a
    hardcoded grid); each user×threshold cell is a broadcast fan-out of
    the REDUCED user grain (9×|users|, narrow), folding straight into
    per-threshold confusion counts. Exact integer counts; ratios are
    the only doubles."""
    users = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("score"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    cuts = users.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY score)"
            ).alias(f"t{i}")
            for i, q in enumerate(qs)
        ]
    ).select(F.explode(F.array(*[F.col(f"t{i}") for i in range(len(qs))])).alias("thr")).distinct()
    scored = users.crossJoin(F.broadcast(cuts))
    flagged = F.col("score") >= F.col("thr")
    per = scored.groupBy("thr").agg(
        F.sum(F.when(flagged & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(flagged & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~flagged & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
    )
    return per.select(
        F.round("thr", 4).alias("threshold"),
        "tp",
        "fp",
        "fn",
        F.round(
            F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)).cast("double"),
            6,
        ).alias("recall"),
        F.round(
            2.0
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)).cast(
                "double"
            ),
            6,
        ).alias("f1"),
    )


_DID_ORACLE = """
WITH bounds AS (
    SELECT MAX(o_orderdate) - INTERVAL 365 DAY AS split_at FROM orders
), labeled AS (
    SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
           CASE WHEN o.o_orderdate >= b.split_at THEN 1 ELSE 0 END AS post,
           o.o_totalprice AS y
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    CROSS JOIN bounds b
), cells AS (
    SELECT treated, post,
           CAST(COUNT(*) AS BIGINT) AS n, AVG(y) AS m
    FROM labeled GROUP BY treated, post
), wide AS (
    SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN m END) AS t_post,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN m END) AS t_pre,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN m END) AS c_post,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN m END) AS c_pre,
        CAST(SUM(n) AS BIGINT) AS n_total
    FROM cells
)
SELECT n_total,
       ROUND(t_post - t_pre, 4) AS treated_change,
       ROUND(c_post - c_pre, 4) AS control_change,
       ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did_estimate
FROM wide
"""


@register("ml_diff_in_diff", oracle=_DID_ORACLE, tags=("ml", "experiment"))
def ml_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the BUILDING segment's order-value change
    across the last-365-day boundary, minus the other segments' change
    over the same boundary — the quasi-experimental estimator for
    rollouts without randomization (the control's change absorbs the
    common time trend; what's left is attributable to whatever happened
    to the treated group). Completes the causal ladder: naive diff →
    IPW (`ml_ipw_ate`, composition control) → DiD (time control).

    The entire estimator is the 2×2 cell-mean table — one broadcast dim
    join, one (treated, post) groupBy, closed-form algebra on 4 rows.
    The parallel-trends assumption is the analyst's burden; the engine's
    burden is exact cells, pinned here."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("treated"),
    )
    bounds = load(spark, sf_dir, "orders").agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAY")).alias("split_at")
    )
    labeled = (
        load(spark, sf_dir, "orders")
        .crossJoin(F.broadcast(bounds))
        .join(maybe_broadcast(cust, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "treated",
            (F.col("o_orderdate") >= F.col("split_at")).cast("int").alias("post"),
            F.col("o_totalprice").alias("y"),
        )
    )
    cells = labeled.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.avg("y").alias("m")
    )
    wide = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 1), F.col("m"))).alias("t_post"),
        F.max(F.when((F.col("treated") == 1) & (F.col("post") == 0), F.col("m"))).alias("t_pre"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 1), F.col("m"))).alias("c_post"),
        F.max(F.when((F.col("treated") == 0) & (F.col("post") == 0), F.col("m"))).alias("c_pre"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return wide.select(
        "n_total",
        F.round(F.col("t_post") - F.col("t_pre"), 4).alias("treated_change"),
        F.round(F.col("c_post") - F.col("c_pre"), 4).alias("control_change"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            4,
        ).alias("did_estimate"),
    )


_CUPED_ORACLE = """
WITH bounds AS (
    SELECT MAX(ts) - INTERVAL 15 DAY AS split_at FROM events
), per_user AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN e.ts < b.split_at
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS x_pre,
           CAST(SUM(CASE WHEN e.ts >= b.split_at
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS y_post
    FROM events e CROSS JOIN bounds b
    GROUP BY user_id
), complete AS (
    SELECT COALESCE(x_pre, 0) AS x, COALESCE(y_post, 0) AS y FROM per_user
), theta AS (
    SELECT CASE WHEN VAR_POP(x) = 0 THEN NULL
                ELSE COVAR_POP(y, x) / VAR_POP(x) END AS th,
           AVG(x) AS mx
    FROM complete
)
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_users,
    ROUND(t.th, 6) AS theta,
    ROUND(VAR_POP(c.y), 4) AS var_raw,
    ROUND(VAR_POP(c.y - t.th * (c.x - t.mx)), 4) AS var_cuped,
    CASE WHEN VAR_POP(c.y) = 0 THEN NULL
         ELSE ROUND(1 - VAR_POP(c.y - t.th * (c.x - t.mx)) / VAR_POP(c.y), 6)
         END AS variance_reduction
FROM complete c CROSS JOIN theta t
GROUP BY t.th, t.mx
"""


@register("stat_cuped_adjustment", oracle=_CUPED_ORACLE, tags=("profile", "experiment"))
def stat_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: adjust each user's post-period value by
    θ·(pre-period value − mean), θ = cov(y,x)/var(x) — the pre-experiment
    covariate trick that shrinks metric variance (and hence experiment
    duration) by exactly the R² between periods; the reported
    variance_reduction IS the fraction of runtime a CUPED'd experiment
    saves. The modern A/B platform staple closing the experimentation
    kit (readout → effect size → power → CUPED).

    Users fold once over a 15-day pre/post split (DECIMAL sums; absent
    periods are 0-imputed, the standard new-user convention); θ is a
    1-row covariance fold broadcast back; both variances come from ONE
    final reduce. ROUND before comparison covers the double folds."""
    bounds = load(spark, sf_dir, "events").agg(
        (F.max("ts") - F.expr("INTERVAL 15 DAY")).alias("split_at")
    )
    per_user = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") < F.col("split_at"),
                        F.col("value").cast("decimal(18,2)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("ts") >= F.col("split_at"),
                        F.col("value").cast("decimal(18,2)"),
                    )
                ).cast("double"),
                F.lit(0.0),
            ).alias("y"),
        )
    )
    # var(x) = 0 (no pre-period variation — e.g. a corpus whose events all
    # land post-split, so every x is the 0-impute) leaves θ undefined;
    # var(y) = 0 likewise the reduction ratio. Welford variances of
    # constant columns are exactly 0.0 on both engines — NULL, not an
    # ANSI raise. r13 degenerate-probe finding.
    theta = per_user.agg(
        F.when(F.var_pop("x") == 0, F.lit(None).cast("double"))
        .otherwise(F.covar_pop("y", "x") / F.var_pop("x"))
        .alias("th"),
        F.avg("x").alias("mx"),
    )
    adj = F.col("y") - F.col("th") * (F.col("x") - F.col("mx"))
    return (
        per_user.crossJoin(F.broadcast(theta))
        .groupBy("th", "mx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.var_pop("y"), 4).alias("var_raw"),
            F.round(F.var_pop(adj), 4).alias("var_cuped"),
            F.when(F.var_pop("y") == 0, F.lit(None).cast("double"))
            .otherwise(F.round(1 - F.var_pop(adj) / F.var_pop("y"), 6))
            .alias("variance_reduction"),
        )
        .select(
            "n_users",
            F.round("th", 6).alias("theta"),
            "var_raw",
            "var_cuped",
            "variance_reduction",
        )
    )


def _pav_fn():
    """Factory for the PAV (pool-adjacent-violators) grouped-map — built
    as a nested closure so cloudpickle ships it by VALUE and workers
    never import this package (the probe_foreign_cwd contract)."""

    def pav(pdf):
        import pandas as pd

        pdf = pdf.sort_values("score").reset_index(drop=True)
        # blocks: [lo, hi, n, pos] merged while means violate monotonicity
        blocks = []
        for r in pdf.itertuples(index=False):
            blocks.append([r.score, r.score, int(r.n), int(r.pos)])
            while (
                len(blocks) > 1
                and blocks[-2][3] * blocks[-1][2]
                >= blocks[-1][3] * blocks[-2][2]
            ):
                # integer cross-multiplied mean comparison: exact, no
                # float ties; >= merges equal means so blocks are
                # strictly increasing (canonical minimal solution)
                hi = blocks.pop()
                blocks[-1][1] = hi[1]
                blocks[-1][2] += hi[2]
                blocks[-1][3] += hi[3]
        return pd.DataFrame(
            {
                "score_lo": [b[0] for b in blocks],
                "score_hi": [b[1] for b in blocks],
                "n": [b[2] for b in blocks],
                "pos": [b[3] for b in blocks],
                "p_cal": [round(b[3] / b[2], 6) for b in blocks],
            }
        )

    return pav


def isotonic_fit(scored: DataFrame, score: str, label: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of a binary label
    against a score, via PAV on the DISTINCT-SCORE grain: the corpus
    folds to (score, n, pos) sufficient statistics first (one shuffle,
    map-side combined — the same compression auc_exact rides), then the
    sequential pool-adjacent-violators pass runs over that compressed
    table in ONE Arrow batch. PAV is inherently order-sequential; the
    scalable form is exactly this reduce-then-solve split, and the
    solve input is |distinct scores| rows regardless of corpus size.
    Means compare by integer cross-multiplication — bit-exact, no
    float-tie drift. Returns the fitted step function: (score_lo,
    score_hi, n, pos, p_cal) with p_cal strictly increasing."""
    grain = (
        scored.groupBy(F.col(score).alias("score"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(label).cast("long")).cast("long").alias("pos"),
        )
        .withColumn("g", F.lit(1))
    )
    return grain.groupBy("g").applyInPandas(
        _pav_fn(),
        "score_lo double, score_hi double, n long, pos long, p_cal double",
    )


@register("ml_isotonic_calibration", oracle=None, tags=("ml",))
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic score calibration (PAV) of `value` against the
    purchase-vs-rest label — the nonparametric counterpart of
    ml_eval_calibration's fixed-bin reliability table: instead of
    presuming decile bins, PAV finds the coarsest monotone step
    function whose block means ARE the calibrated probabilities (the
    standard post-hoc calibrator next to Platt scaling). ⊘ rows-only
    (PAV is not SQL-expressible); tests/test_property_roundsix.py
    replays the exact algorithm sequentially in Python on the same
    grain and requires cell-exact agreement, plus monotonicity and
    mass-conservation invariants on randomized seeded inputs."""
    scored = load(spark, sf_dir, "events").select(
        "value",
        (F.col("event_type") == "purchase").alias("is_pos"),
    )
    return isotonic_fit(scored, "value", "is_pos")


_PR_AUC_ORACLE = """
WITH ranked AS (
    SELECT CAST(event_type = 'purchase' AS INT) AS is_pos,
           ROW_NUMBER() OVER (ORDER BY value DESC, event_id ASC) AS i,
           SUM(CAST(event_type = 'purchase' AS INT))
               OVER (ORDER BY value DESC, event_id ASC) AS cp
    FROM events
), terms AS (
    SELECT CAST(cp AS BIGINT) AS cp, i,
           (CAST(cp AS HUGEINT) * 1000000000) // i AS term_nanos
    FROM ranked WHERE is_pos = 1
)
SELECT CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_pos,
       CAST(CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE (SUM(term_nanos) * 2 + 1000 * COUNT(*))
            // (2000 * COUNT(*)) END AS BIGINT) AS ap_micros
FROM terms
"""


@register("ml_eval_pr_auc", oracle=_PR_AUC_ORACLE, tags=("ml", "experiment"))
def ml_eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (area under the precision-recall curve in
    its standard step form): AP = (1/n₊)·Σ_{positives} precision@rank —
    the class-imbalance-honest companion of ml_eval_auc_roc (ROC AUC
    stays optimistic when positives are rare; PR-AUC is what a filtering
    / retrieval pipeline actually tunes against).

    Determinism + integer exit (COVERAGE.md r10): ranking is the total
    order (value DESC, event_id ASC) — the bruteforce tiebreak
    convention — so ties have one defined AP; each positive's
    precision@i enters as the TRUNCATING integer division
    (10⁹·cum_pos) div i (Spark `div` ≡ DuckDB `//` on non-negatives),
    making every term an identical BIGINT on both engines (per-positive
    error < 1e-9, deterministic and mirrored), and AP exits as a
    round-half-away micro-unit BIGINT. No float anywhere.

    Scale shape (r11, VERDICT r10 #2): rank and cum_pos are BOTH prefix
    sums over the unique (−value, event_id) order, so they run through
    ranges.running_sums — the two-phase distributed prefix sum (range-
    partition, per-slice window, ≤ n_parts-row offset fold) — instead of
    a bare Window.orderBy, which would funnel every fact row through ONE
    task. AP needs ROW grain (the event_id tiebreak gives tied-value
    positives distinct ranks), so unlike the AUC kernel there is no
    distinct-value fold first; the localCheckpoint inside running_sums
    therefore materializes the (is_pos, value, id) projection once —
    the honest cost of an exactly-tiebroken global rank at scale."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    is_pos = (F.col("event_type") == "purchase").cast("int")
    base = (
        load(spark, sf_dir, "events")
        .select("event_id", is_pos.alias("is_pos"), (-F.col("value")).alias("_nv"))
        .withColumn("_one", F.lit(1))
    )
    ranked = running_sums(
        base,
        ["_nv", "event_id"],
        {"i": ("_one", True), "cp": ("is_pos", True)},
    ).select("is_pos", "i", F.col("cp").cast("long").alias("cp"))
    # One fold over ALL ranked rows (no separate count job / driver
    # scalar): positives contribute their term, negatives contribute 0
    # to the sum and 0 to n_pos.
    # cp·1e9 in decimal (a LONG product wraps near cp≈9e9 — the r11
    # convention sweep); the quotient is bounded ≤ 1e9 because cp ≤ i.
    # The term SUM likewise accumulates in decimal (Θ(n_pos·1e9)).
    terms = ranked.select(
        "is_pos",
        F.expr(
            "CASE WHEN is_pos = 1 THEN"
            " CAST(CAST(cp AS DECIMAL(20,0)) * 1000000000 div i AS LONG)"
            " ELSE 0 END"
        ).alias("term_nanos"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("is_pos").cast("long").alias("n_pos"),
        # a positive-free corpus leaves AP undefined — NULL, not an ANSI
        # raise (r13 tiny-fixture probe finding).
        F.expr(
            "CAST(CASE WHEN SUM(is_pos) = 0 THEN NULL"
            " ELSE (SUM(CAST(term_nanos AS DECIMAL(20,0))) * 2"
            " + 1000 * SUM(is_pos))"
            " div (2000 * CAST(SUM(is_pos) AS DECIMAL(20,0))) END AS LONG)"
        ).alias("ap_micros"),
    )


_STUMP_ORACLE = """
WITH grain AS (
    SELECT value,
           CAST(COUNT(*) AS BIGINT) AS n_v,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS BIGINT) AS p_v
    FROM events GROUP BY value
), tot AS (
    SELECT SUM(n_v) AS n, SUM(p_v) AS p FROM grain
), pre AS (
    SELECT value,
           SUM(n_v) OVER (ORDER BY value ASC) AS nl,
           SUM(p_v) OVER (ORDER BY value ASC) AS pl
    FROM grain
), q AS (
    SELECT value, nl, pl, t.n, t.p,
           (nl * 1000000000::HUGEINT) // t.n AS nlq,
           (pl * 1000000000::HUGEINT) // t.n AS plq,
           ((t.n - nl) * 1000000000::HUGEINT) // t.n AS nrq,
           ((t.p - pl) * 1000000000::HUGEINT) // t.n AS prq,
           (t.p * 1000000000::HUGEINT) // t.n AS pq
    FROM pre, tot t
), cand AS (
    SELECT value AS split_value,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(n - nl AS BIGINT) AS n_right,
           CAST(p - pl AS BIGINT) AS pos_right,
           CAST((plq * (nlq - plq) * nrq + prq * (nrq - prq) * nlq)
                // (nlq * nrq) AS BIGINT) AS g_nanos,
           CAST((pq * (1000000000 - pq)) // 1000000000 AS BIGINT) AS g0_nanos
    FROM q
    WHERE nlq > 0 AND nrq > 0
)
SELECT split_value, n_left, pos_left, n_right, pos_right, g_nanos,
       g0_nanos - g_nanos AS gain_nanos
FROM cand
ORDER BY g_nanos ASC, split_value ASC
LIMIT 1
"""


@register("ml_decision_stump", oracle=_STUMP_ORACLE, tags=("ml",))
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best-split finding for a depth-1 decision tree (stump) on
    `value` against the purchase-vs-rest label — the inner loop of every
    tree-ensemble trainer, distributed the way XGBoost/LightGBM's exact
    mode does it: fold the facts to the DISTINCT-VALUE grain with
    per-value (count, positives), prefix-sum that grain once, and score
    every candidate threshold from the prefix sums alone. The winning
    split minimizes the weighted Gini impurity.

    Integer exit, r11 overflow-proof form: counts quantize to 1e-9
    CLASS SHARES first (x·1e9 div n — each quotient bounded by 1e9 at
    ANY n), then the weighted-Gini ordering is scored on the quantized
    shares as (plq(nlq−plq)nrq + prq(nrq−prq)nlq) div (nlq·nrq) — every
    div's quotient is a bounded nano statistic, where the previous
    count-rational's quotient grew with n and would hit the silent
    2^63 IntegralDivide wrap near 4e10 rows (the ADVICE r10 class, found
    by re-audit this round). The micro-grid convention: a deterministic
    1e-9-share grain, mirrored exactly in the oracle; splits putting
    < 1e-9 of the data on one side are excluded (nlq/nrq = 0). The
    threshold itself is a raw data double (never computed with); the
    root impurity enters the reported gain through the same shares.

    Scale shape (r11, VERDICT r10 #2): one map-combined aggregate to the
    distinct-value grain, then the prefix sums run through
    ranges.running_sums — the distinct-value grid is fact-scaled
    (real-valued scores ⇒ ~n distinct), so a bare Window.orderBy(value)
    would be a single-reducer sort at 100 TB; the grand totals come from
    a 1-row broadcast aggregate instead of an unbounded window. One
    TakeOrderedAndProject for the argmin. The fact table is scanned
    exactly once."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").cast("long").alias("y")
    )
    grain = ev.groupBy("value").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("y").alias("p_v")
    )
    tot = grain.agg(
        F.sum("n_v").cast("long").alias("n"), F.sum("p_v").cast("long").alias("p")
    )
    pre = running_sums(
        grain, ["value"], {"nl": ("n_v", True), "pl": ("p_v", True)}
    ).crossJoin(F.broadcast(tot)).select("value", "nl", "pl", "n", "p")
    return _stump_argmin(pre, "value", "split_value")


def _stump_argmin(pre: DataFrame, key: str, out_key: str) -> DataFrame:
    """Shared split scorer for the exact and histogram stumps: quantize
    counts to 1e-9 class shares (every div quotient bounded at any n —
    the r11 convention; the raw count-rational wrapped near 4e10 rows),
    score the weighted Gini on the shares, argmin with key tiebreak.
    ``pre`` carries (key, nl, pl, n, p)."""
    q = pre.select(
        key,
        F.col("nl").cast("long").alias("nl"),
        F.col("pl").cast("long").alias("pl"),
        "n",
        "p",
        F.expr("CAST(nl AS DECIMAL(20,0)) * 1000000000 div n").alias("nlq"),
        F.expr("CAST(pl AS DECIMAL(20,0)) * 1000000000 div n").alias("plq"),
        F.expr(
            "CAST(n - nl AS DECIMAL(20,0)) * 1000000000 div n"
        ).alias("nrq"),
        F.expr(
            "CAST(p - pl AS DECIMAL(20,0)) * 1000000000 div n"
        ).alias("prq"),
        F.expr("CAST(p AS DECIMAL(20,0)) * 1000000000 div n").alias("pq"),
    )
    cand = q.filter((F.col("nlq") > 0) & (F.col("nrq") > 0)).select(
        F.col(key).alias(out_key),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        (F.col("n") - F.col("nl")).cast("long").alias("n_right"),
        (F.col("p") - F.col("pl")).cast("long").alias("pos_right"),
        F.expr(
            "CAST((CAST(plq * (nlq - plq) AS DECIMAL(20,0)) * nrq"
            " + CAST(prq * (nrq - prq) AS DECIMAL(20,0)) * nlq)"
            " div (CAST(nlq AS DECIMAL(19,0)) * nrq) AS LONG)"
        ).alias("g_nanos"),
        F.expr(
            "CAST(pq * (1000000000 - pq) div 1000000000 AS LONG)"
        ).alias("g0_nanos"),
    )
    return (
        cand.select(
            out_key, "n_left", "pos_left", "n_right", "pos_right",
            "g_nanos",
            (F.col("g0_nanos") - F.col("g_nanos")).alias("gain_nanos"),
        )
        .orderBy(F.asc("g_nanos"), F.asc(out_key))
        .limit(1)
    )


_SILHOUETTE_ORACLE = """
WITH base AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0)
                                    AS BIGINT)) AS arr
    FROM embeddings
), ex AS (
    SELECT vec_id, label AS own, CAST(t.i AS BIGINT) AS pos,
           arr[t.i + 1] AS xq
    FROM base, UNNEST(range(len(arr))) AS t(i)
), q AS (
    SELECT vec_id, SUM(CAST(xq AS HUGEINT) * xq) AS qq FROM ex GROUP BY vec_id
), cent AS (
    SELECT own AS clabel, pos, SUM(CAST(xq AS HUGEINT)) AS s,
           CAST(COUNT(*) AS HUGEINT) AS n_l
    FROM ex GROUP BY own, pos
), ss AS (
    SELECT clabel, SUM(s * s) AS ss, MAX(n_l) AS n_l FROM cent GROUP BY clabel
), dots AS (
    SELECT e.vec_id, e.own, c.clabel, SUM(CAST(e.xq AS HUGEINT) * c.s) AS dot
    FROM ex e JOIN cent c ON c.pos = e.pos
    GROUP BY e.vec_id, e.own, c.clabel
), dist AS (
    SELECT d.vec_id, d.own, d.clabel,
           (ss.n_l * ss.n_l * q.qq - 2 * ss.n_l * d.dot + ss.ss)
               // (ss.n_l * ss.n_l) AS dist_q
    FROM dots d JOIN ss USING (clabel) JOIN q ON q.vec_id = d.vec_id
), ab AS (
    SELECT vec_id, own,
           MAX(CASE WHEN clabel = own THEN dist_q END) AS a,
           MIN(CASE WHEN clabel != own THEN dist_q END) AS b
    FROM dist GROUP BY vec_id, own
), s AS (
    SELECT own,
           CASE WHEN GREATEST(a, b) = 0 THEN 0
                ELSE ((b - a) * 1000000::HUGEINT) // GREATEST(a, b)
           END AS s_micros
    FROM ab
)
SELECT CAST(own AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(SUM(s_micros) AS BIGINT) AS sum_s_micros,
       CAST(CASE WHEN SUM(s_micros) < 0
                 THEN -((-SUM(s_micros)) // COUNT(*))
                 ELSE SUM(s_micros) // COUNT(*) END AS BIGINT)
           AS mean_s_micros
FROM s GROUP BY own
"""


@register("ml_silhouette_labels", oracle=_SILHOUETTE_ORACLE, tags=("ml",))
def ml_silhouette_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based, squared-distance) silhouette score of
    the embedding corpus against its labels — the cluster-quality
    readout: a(i) = squared distance to the OWN label's centroid,
    b(i) = to the nearest OTHER centroid, s(i) = (b−a)/max(a,b) in
    [−1, 1]; per-label means localize which classes bleed together.
    Simplified silhouette (vs all-pairs) is the form that scales — it
    needs centroids, not the n² distance matrix — and squared distances
    (documented convention) keep it radical-free.

    Exact integer algebra end-to-end (COVERAGE.md r10): elements
    quantize to micro-units; d²(x, c_l) = Σ_p(n_l·x_p − S_{l,p})²/n_l²
    expands to (n_l²·Σx² − 2n_l·⟨x,S_l⟩ + ΣS_l²)/n_l², all exact
    integer sums; distances land as truncating-division BIGINTs (≤1
    micro² error, identical both engines), the min/argmin over labels
    is an integer min, and s exits in micro-units via truncating
    division with a zero-distance guard.

    Scale shape: one explode to the (vector, dim) grain; label
    centroids are one (labels × dims)-row aggregate; the vector×label
    scoring joins the exploded grain to the TINY centroid table on pos
    (broadcast — labels·dims rows) and folds back per (vector, label):
    state O(classes·dims), data touched once, no n² anywhere."""
    ex = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.col("label").alias("own"),
            F.posexplode(
                F.transform(
                    "embedding",
                    lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast(
                        "long"
                    ),
                )
            ).alias("pos", "xq"),
        )
    )
    q = ex.groupBy("vec_id").agg(
        F.sum(F.col("xq") * F.col("xq")).alias("qq")
    )
    cent = ex.groupBy(F.col("own").alias("clabel"), "pos").agg(
        F.sum("xq").alias("s"), F.count(F.lit(1)).alias("n_l")
    )
    ss = cent.groupBy("clabel").agg(
        F.sum((F.col("s") * F.col("s")).cast("decimal(38,0)")).alias("ss"),
        F.max("n_l").alias("n_l"),
    )
    dots = (
        ex.join(F.broadcast(cent.select("clabel", "pos", "s")), "pos")
        .groupBy("vec_id", "own", "clabel")
        .agg(F.sum(F.col("xq") * F.col("s")).alias("dot"))
    )
    dist = (
        dots.join(F.broadcast(ss), "clabel")
        .join(q, "vec_id")
        .select(
            "vec_id",
            "own",
            "clabel",
            F.expr(
                "CAST((CAST(n_l AS DECIMAL(12,0)) * n_l * CAST(qq AS DECIMAL(16,0))"
                " - 2 * CAST(n_l AS DECIMAL(12,0)) * dot + ss)"
                " div (CAST(n_l AS DECIMAL(12,0)) * n_l) AS LONG)"
            ).alias("dist_q"),
        )
    )
    ab = dist.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("clabel") == F.col("own"), F.col("dist_q"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("own"), F.col("dist_q"))).alias("b"),
    )
    s = ab.select(
        "own",
        F.expr(
            "CASE WHEN GREATEST(a, b) = 0 THEN 0"
            " ELSE CAST((b - a) AS DECIMAL(20,0)) * 1000000"
            "      div GREATEST(a, b) END"
        )
        .cast("long")
        .alias("s_micros"),
    )
    return s.groupBy(F.col("own").cast("long").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("s_micros").cast("long").alias("sum_s_micros"),
        F.expr(
            "CAST(CASE WHEN SUM(s_micros) < 0"
            " THEN -((-SUM(s_micros)) div COUNT(1))"
            " ELSE SUM(s_micros) div COUNT(1) END AS LONG)"
        ).alias("mean_s_micros"),
    )


_BRIER_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS mv FROM events
), scored AS (
    SELECT CAST(FLOOR(value / mx.mv * 1000000.0) AS BIGINT) AS q,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mx
), binned AS (
    SELECT LEAST((q * 10) // 1000000, 9) AS bin, q, y FROM scored
), per_bin AS (
    SELECT bin, CAST(COUNT(*) AS HUGEINT) AS n_k,
           SUM(CAST(q AS HUGEINT)) AS q_k, SUM(CAST(y AS HUGEINT)) AS y_k
    FROM binned GROUP BY bin
), tot AS (
    SELECT SUM(n_k) AS n, SUM(y_k) AS y FROM per_bin
), raw AS (
    SELECT SUM((CAST(q AS HUGEINT) - 1000000 * y)
               * (CAST(q AS HUGEINT) - 1000000 * y)) AS sq
    FROM scored
), m AS (
    SELECT p.n_k, p.q_k, p.y_k, t.n, t.y,
           ((p.y_k * t.n - t.y * p.n_k) * 1000000) // (t.n * p.n_k) AS m_k
    FROM per_bin p, tot t
), terms AS (
    SELECT SUM(((q_k - 1000000 * y_k) * (q_k - 1000000 * y_k))
               // (n_k * 1000 * n)) AS rel_nanos,
           SUM((n_k * m_k * m_k) // (1000 * n)) AS res_nanos
    FROM m
)
SELECT CAST(t.n AS BIGINT) AS n_total,
       CAST(t.y AS BIGINT) AS n_pos,
       CAST(raw.sq // (1000 * t.n) AS BIGINT) AS brier_nanos,
       CAST((((t.y * (t.n - t.y)) // t.n) * 1000000000) // t.n AS BIGINT)
           AS uncertainty_nanos,
       CAST(terms.rel_nanos AS BIGINT) AS reliability_nanos,
       CAST(terms.res_nanos AS BIGINT) AS resolution_nanos
FROM tot t, raw, terms
"""


@register("ml_eval_brier_decomposition", oracle=_BRIER_ORACLE, tags=("ml",))
def ml_eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score over decile bins —
    Brier = uncertainty − resolution + reliability (up to within-bin
    variance when forecasts aren't bin-constant): UNCERTAINTY ȳ(1−ȳ) is
    the no-skill floor, RELIABILITY penalizes miscalibration (bin mean
    forecast vs bin positive rate — what ml_eval_calibration tabulates),
    RESOLUTION rewards bins that separate outcomes. The raw Brier score
    is reported alongside. The forecast proxy is value max-normalized to
    [0,1], the same score family as the other eval queries.

    All-integer exit (COVERAGE.md r10): probabilities quantize to
    micro-units through ONE shared double division (value/max — IEEE-
    identical both engines) and FLOOR; every component is exact integer
    algebra over per-bin (n_k, Σq, Σy) sufficient statistics with
    mirrored truncating divisions, emitted in nano-units. Nothing
    floats, nothing knife-edges.

    Scale shape: one pass folds the facts to 10 bin rows (map-side
    combine); the raw-Brier sum rides the same scan; everything after
    the first reduce is constant-size. The global max is a 1-row
    broadcast (same scalar class as the corpus stats elsewhere)."""
    mx = load(spark, sf_dir, "events").agg(F.max("value").alias("mv"))
    scored = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("value") / F.col("mv") * F.lit(1000000.0))
            .cast("long")
            .alias("q"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    binned = scored.select(
        F.least(F.expr("(q * 10) div 1000000"), F.lit(9)).alias("bin"), "q", "y"
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n_k"),
        F.sum(F.col("q").cast("decimal(19,0)")).alias("q_k"),
        F.sum(F.col("y").cast("decimal(20,0)")).alias("y_k"),
    )
    raw = scored.agg(
        F.sum(
            ((F.col("q") - 1000000 * F.col("y")) * (F.col("q") - 1000000 * F.col("y")))
            .cast("decimal(24,0)")
        ).alias("sq")
    )
    tot = per_bin.agg(
        F.sum("n_k").cast("long").alias("n"), F.sum("y_k").cast("long").alias("y")
    )
    # Spark `div` returns LONG and silently WRAPS at 2^63 when the
    # quotient overflows — even under ANSI (found here: bin 3 at sf0.1
    # computed (d²·1e9) div n_k with quotient 9.7e18 > long max and came
    # back negative; verified repro in the verify skill notes). Every
    # div below therefore produces an OUTPUT-SCALE quotient — never
    # 'huge div small' (ADVICE r10 caught the two that still were):
    #   rel: d² div (n_k·1000·n) is ONE division (≡ the former
    #     (d² div n_k) div (1000n) by the nested-floor identity on a
    #     nonnegative numerator — same values, same hash) with quotient
    #     ≤ 1e9·n_k/n, bounded at any SF.
    #   res: the bin's outcome-rate deviation is quantized to micro-
    #     units FIRST (m_k ∈ [−1e6,1e6], one bounded-quotient division),
    #     then scored as n_k·m_k² div (1000n) ≤ 1e9 — a deterministic
    #     micro-grid statistic, mirrored exactly in the oracle (its
    #     sub-micro truncation is the documented semantics, not error).
    # Each multiply is width-budgeted: exact to ~1e12 rows per bin,
    # and past that decimal overflow is a LOUD null, never a wrap.
    terms = (
        per_bin.crossJoin(F.broadcast(tot))
        .withColumn(
            "m_k",
            F.expr(
                "CAST((y_k * n - y * n_k) * 1000000"
                " div (CAST(n AS DECIMAL(20,0)) * n_k) AS LONG)"
            ),
        )
        .select(
            F.expr(
                "CAST(CAST((q_k - 1000000 * y_k) AS DECIMAL(19,0))"
                " * CAST((q_k - 1000000 * y_k) AS DECIMAL(19,0))"
                " div (n_k * 1000 * CAST(n AS DECIMAL(20,0))) AS LONG)"
            ).alias("rel_k"),
            F.expr(
                "CAST(n_k * m_k * m_k"
                " div (1000 * CAST(n AS DECIMAL(20,0))) AS LONG)"
            ).alias("res_k"),
        )
        .agg(
            F.sum("rel_k").alias("rel_nanos"),
            F.sum("res_k").alias("res_nanos"),
        )
    )
    return (
        tot.crossJoin(F.broadcast(raw))
        .crossJoin(F.broadcast(terms))
        .select(
            F.col("n").alias("n_total"),
            F.col("y").alias("n_pos"),
            F.expr("CAST(sq div (1000 * n) AS LONG)").alias("brier_nanos"),
            # y·(n−y) ≤ n²/4 needs decimal; the first quotient ≤ n/4
            # fits LONG to n≈3.6e19, re-widened to decimal(30,0) before
            # the ·1e9 so the second numerator can't wrap either.
            F.expr(
                "CAST(CAST(CAST(y AS DECIMAL(19,0)) * (n - y) div n"
                " AS DECIMAL(30,0)) * 1000000000 div n AS LONG)"
            ).alias("uncertainty_nanos"),
            F.col("rel_nanos").cast("long").alias("reliability_nanos"),
            F.col("res_nanos").cast("long").alias("resolution_nanos"),
        )
    )


_ECE_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS mv FROM events
), scored AS (
    SELECT CAST(FLOOR(value / mx.mv * 1000000.0) AS BIGINT) AS q,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mx
), per_bin AS (
    SELECT LEAST((q * 10) // 1000000, 9) AS bin,
           CAST(COUNT(*) AS HUGEINT) AS n_k,
           SUM(CAST(q AS HUGEINT)) AS q_k, SUM(CAST(y AS HUGEINT)) AS y_k
    FROM scored GROUP BY 1
), tot AS (
    SELECT SUM(n_k) AS n FROM per_bin
), gaps AS (
    SELECT bin, n_k, ABS(q_k - 1000000 * y_k) AS d_k,
           ABS(q_k - 1000000 * y_k) // n_k AS gap_micros
    FROM per_bin
)
SELECT CAST(t.n AS BIGINT) AS n_total,
       CAST((SELECT SUM(d_k) FROM gaps) * 1000 // t.n AS BIGINT) AS ece_nanos,
       CAST((SELECT MAX(gap_micros) FROM gaps) AS BIGINT) AS mce_micros,
       CAST((SELECT bin FROM gaps
             ORDER BY gap_micros DESC, bin ASC LIMIT 1) AS BIGINT) AS worst_bin
FROM tot t
"""


@register("ml_eval_ece", oracle=_ECE_ORACLE, tags=("ml", "eval"))
def ml_eval_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error over decile bins — the scalar the
    calibration family was missing: ml_eval_calibration TABULATES the
    reliability diagram, ml_eval_brier_decomposition prices
    miscalibration inside the Brier score; ECE = Σ (n_k/n)·|p̄_k − ȳ_k|
    is the one number model cards report (Guo et al., ICML'17), and MCE
    (the worst bin's gap) is its tail companion.

    Same forecast proxy and binning as the Brier query (value
    max-normalized through one shared IEEE-identical double division,
    FLOOR to micro-units, decile bins). All-integer algebra: the
    weighted sum telescopes to ece_nanos = (Σ|q_k − 1e6·y_k|)·1000 div n
    — one bounded truncating division (quotient ≤ 1e9); per-bin
    gap_micros = |d_k| div n_k ≤ 1e6. The worst bin ties break to the
    lowest bin id, pinned on both engines.

    Scale shape: one map-combined fold of the facts to ≤10 bin rows
    (the max is a 1-row broadcast, same scalar class as Brier's);
    everything after the first reduce is constant-size."""
    mx = load(spark, sf_dir, "events").agg(F.max("value").alias("mv"))
    scored = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("value") / F.col("mv") * F.lit(1000000.0))
            .cast("long")
            .alias("q"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    per_bin = scored.groupBy(
        F.least(F.expr("(q * 10) div 1000000"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("n_k"),
        F.sum(F.col("q").cast("decimal(19,0)")).alias("q_k"),
        F.sum(F.col("y").cast("decimal(20,0)")).alias("y_k"),
    )
    gaps = per_bin.select(
        "bin",
        "n_k",
        F.expr("ABS(q_k - 1000000 * y_k)").alias("d_k"),
        F.expr("ABS(q_k - 1000000 * y_k) div n_k").alias("gap_micros"),
    )
    return gaps.agg(
        F.sum("n_k").cast("long").alias("n_total"),
        F.expr("CAST(SUM(d_k) * 1000 div SUM(n_k) AS LONG)").alias(
            "ece_nanos"
        ),
        F.max("gap_micros").cast("long").alias("mce_micros"),
        F.expr(
            "CAST(min_by(bin, struct(-gap_micros, bin)) AS LONG)"
        ).alias("worst_bin"),
    )


_KAPPA_ORACLE = f"""
WITH pairs AS (
    SELECT CASE WHEN CAST(len(list_intersect(list_distinct(string_split(text,' ')),
                {_SW_SQL})) AS DOUBLE)
                / greatest(len(list_distinct(string_split(text,' '))), 1) >= 0.05
           THEN 'en' ELSE 'unk' END AS pred,
           lang AS label
    FROM documents
), cells AS (
    SELECT pred, label, CAST(COUNT(*) AS HUGEINT) AS c FROM pairs
    GROUP BY pred, label
), tot AS (
    SELECT SUM(c) AS n,
           SUM(CASE WHEN pred = label THEN c ELSE 0 END) AS diag
    FROM cells
), marg AS (
    SELECT SUM(p.rp * l.cl) AS e FROM
        (SELECT pred AS k, SUM(c) AS rp FROM cells GROUP BY pred) p
        JOIN (SELECT label AS k, SUM(c) AS cl FROM cells GROUP BY label) l
        USING (k)
)
SELECT CAST(t.n AS BIGINT) AS n_total,
       CAST(t.diag AS BIGINT) AS n_agree,
       CAST((t.diag * 1000000) // t.n AS BIGINT) AS po_micros,
       CAST((m.e * 1000000) // (t.n * t.n) AS BIGINT) AS pe_micros,
       CAST(CASE WHEN t.n * t.n = m.e THEN NULL
            WHEN t.n * t.diag < m.e THEN
              -((( m.e - t.n * t.diag) * 2000000 + (t.n * t.n - m.e))
                // (2 * (t.n * t.n - m.e)))
            ELSE
              (((t.n * t.diag - m.e) * 2000000 + (t.n * t.n - m.e))
               // (2 * (t.n * t.n - m.e)))
            END AS BIGINT) AS kappa_micros
FROM tot t, marg m
"""


@register("ml_eval_cohen_kappa", oracle=_KAPPA_ORACLE, tags=("ml", "eval"))
def ml_eval_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's κ for the language-ID heuristic against the labeled lang
    column — the chance-corrected agreement scalar the confusion table
    (ml_eval_confusion, same prediction stream) doesn't report: raw
    accuracy flatters any skewed label distribution; κ subtracts the
    agreement two independent raters with these marginals would reach by
    luck (κ=0 ⇒ no better than chance).

    Exact integer rational: with integer cell counts,
    κ = (n·Σdiag − Σ_c row_c·col_c) / (n² − Σ_c row_c·col_c) — one
    round-half-away micro-unit division with the sign handled explicitly
    and the degenerate pe=1 marginal emitting NULL; po/pe are reported
    alongside in floor micro-units. No float anywhere.

    Scale shape: predictions fold to the |classes|² cell table in one
    map-combined groupBy; everything after is constant-size algebra on
    the cells (marginal products via one tiny self-join on class)."""
    from recommendation_system_big_data_spark.functions.text import text_lang_id

    pairs = text_lang_id(spark, sf_dir).select(
        F.col("predicted_lang").alias("pred"),
        F.col("labeled_lang").alias("label"),
    )
    cells = pairs.groupBy("pred", "label").agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("c")
    )
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("pred") == F.col("label"), F.col("c")).otherwise(0))
        .alias("diag"),
    )
    rp = cells.groupBy(F.col("pred").alias("k")).agg(F.sum("c").alias("rp"))
    cl = cells.groupBy(F.col("label").alias("k")).agg(F.sum("c").alias("cl"))
    marg = rp.join(cl, "k").agg(F.sum(F.expr("rp * cl")).alias("e"))
    return (
        tot.crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("long").alias("n_total"),
            F.col("diag").cast("long").alias("n_agree"),
            F.expr("CAST(diag * 1000000 div n AS LONG)").alias("po_micros"),
            F.expr(
                "CAST(e * 1000000 div (n * CAST(n AS DECIMAL(20,0)))"
                " AS LONG)"
            ).alias("pe_micros"),
            F.expr(
                """CAST(CASE
                  WHEN n * CAST(n AS DECIMAL(20,0)) = e THEN NULL
                  WHEN n * diag < e THEN
                    -(((e - n * diag) * 2000000
                       + (n * CAST(n AS DECIMAL(20,0)) - e))
                      div (2 * (n * CAST(n AS DECIMAL(20,0)) - e)))
                  ELSE
                    (((n * diag - e) * 2000000
                      + (n * CAST(n AS DECIMAL(20,0)) - e))
                     div (2 * (n * CAST(n AS DECIMAL(20,0)) - e)))
                  END AS LONG)"""
            ).alias("kappa_micros"),
        )
    )


#: Histogram-mode split search: 256 fixed bins between the global
#: min/max — LightGBM/XGBoost-hist's actual scale trade (bin first,
#: scan 256 cells, give up sub-bin split resolution).
STUMP_HIST_BINS = 256

_STUMP_HIST_ORACLE = f"""
WITH mm AS (
    SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
), binned AS (
    -- mx = mn (zero-range corpus): every value maps to bin 0 by explicit
    -- guard on BOTH engines; an unguarded (v-mn)/0 is NaN whose FLOOR/
    -- CAST semantics split across engines (r11 ADVICE).
    SELECT CASE WHEN mm.mx = mm.mn THEN 0
                ELSE LEAST(CAST(FLOOR((value - mm.mn) / (mm.mx - mm.mn)
                                      * {STUMP_HIST_BINS}.0) AS BIGINT),
                           {STUMP_HIST_BINS - 1})
           END AS bin,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mm
), grain AS (
    SELECT bin, CAST(COUNT(*) AS HUGEINT) AS n_v,
           SUM(CAST(y AS HUGEINT)) AS p_v
    FROM binned GROUP BY bin
), tot AS (
    SELECT SUM(n_v) AS n, SUM(p_v) AS p FROM grain
), pre AS (
    SELECT bin,
           SUM(n_v) OVER (ORDER BY bin ASC) AS nl,
           SUM(p_v) OVER (ORDER BY bin ASC) AS pl
    FROM grain
), q AS (
    SELECT bin, nl, pl, t.n, t.p,
           (nl * 1000000000::HUGEINT) // t.n AS nlq,
           (pl * 1000000000::HUGEINT) // t.n AS plq,
           ((t.n - nl) * 1000000000::HUGEINT) // t.n AS nrq,
           ((t.p - pl) * 1000000000::HUGEINT) // t.n AS prq,
           (t.p * 1000000000::HUGEINT) // t.n AS pq
    FROM pre, tot t
), cand AS (
    SELECT bin AS split_bin,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(n - nl AS BIGINT) AS n_right,
           CAST(p - pl AS BIGINT) AS pos_right,
           CAST((plq * (nlq - plq) * nrq + prq * (nrq - prq) * nlq)
                // (nlq * nrq) AS BIGINT) AS g_nanos,
           CAST((pq * (1000000000 - pq)) // 1000000000 AS BIGINT) AS g0_nanos
    FROM q
    WHERE nlq > 0 AND nrq > 0
)
SELECT split_bin, n_left, pos_left, n_right, pos_right, g_nanos,
       g0_nanos - g_nanos AS gain_nanos
FROM cand
ORDER BY g_nanos ASC, split_bin ASC
LIMIT 1
"""


@register("ml_decision_stump_hist", oracle=_STUMP_HIST_ORACLE, tags=("ml",))
def ml_decision_stump_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-mode best-split search — the scale companion of
    ml_decision_stump and the algorithm gradient-boosting trainers
    ACTUALLY run at 100 TB (LightGBM's hist mode, XGBoost
    tree_method=hist): values pre-bin into 256 fixed-width cells between
    the global min/max, the candidate scan runs over ≤256 bins instead
    of the ~n distinct-value grid, and the split loses at most one bin
    of resolution. The exact-mode stump prices the full grid (and needs
    the distributed prefix sum); this one's candidate table FITS IN A
    CLOSED FIST at any data size — the prefix window runs on ≤256 rows,
    a constant grain needing no distribution machinery.

    The bin id comes from one shared double expression
    ((v−mn)/(mx−mn)·256, FLOOR, capped) — IEEE-identical cross-engine,
    the Brier/ECE normalization pattern; min/max are a 1-row broadcast.
    Scoring is the shared share-quantized Gini scorer (_stump_argmin —
    every div quotient bounded at any n), argmin with split_bin
    tiebreak."""
    mm = load(spark, sf_dir, "events").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mm))
        .select(
            # zero-range guard mirrored in the oracle: mx = mn → bin 0
            # on both engines (unguarded, NaN bin semantics diverge).
            F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                        * F.lit(float(STUMP_HIST_BINS))
                    ).cast("long"),
                    F.lit(STUMP_HIST_BINS - 1),
                )
            )
            .alias("bin"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    grain = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("y").alias("p_v")
    )
    tot = grain.agg(
        F.sum("n_v").cast("long").alias("n"), F.sum("p_v").cast("long").alias("p")
    )
    w = Window.orderBy(F.asc("bin"))
    pre = (
        grain.select(
            "bin",
            F.sum("n_v").over(w).alias("nl"),
            F.sum("p_v").over(w).alias("pl"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return _stump_argmin(
        pre.withColumnRenamed("bin", "split_bin"), "split_bin", "split_bin"
    )


_LOGLOSS_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS mv FROM events
), scored AS (
    SELECT LEAST(GREATEST(
               CAST(FLOOR(value / mx.mv * 1000000.0) AS BIGINT), 100),
               999900) AS qc,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mx
), per_q AS (
    SELECT qc, CAST(COUNT(*) AS BIGINT) AS n_q, CAST(SUM(y) AS BIGINT) AS y_q
    FROM scored GROUP BY qc
), s AS (
    SELECT CAST(SUM(n_q) AS BIGINT) AS n, CAST(SUM(y_q) AS BIGINT) AS pos,
           SUM(CAST(y_q AS DOUBLE)
                   * (-LN(CAST(qc AS DOUBLE) / 1000000.0))
               + CAST(n_q - y_q AS DOUBLE)
                   * (-LN(1.0 - CAST(qc AS DOUBLE) / 1000000.0))) AS loss
    FROM per_q
), fin AS (
    SELECT n, pos, loss / n AS ll,
           CASE WHEN pos = 0 OR pos = n THEN NULL
                ELSE -(CAST(pos AS DOUBLE) / n) * LN(CAST(pos AS DOUBLE) / n)
                     - (1.0 - CAST(pos AS DOUBLE) / n)
                         * LN(1.0 - CAST(pos AS DOUBLE) / n) END AS base
    FROM s
)
SELECT n AS n_total, pos AS n_pos,
       ROUND(ll, 6) AS mean_log_loss,
       ROUND(base, 6) AS baseline_entropy,
       CASE WHEN base IS NULL THEN NULL
            ELSE ROUND(1.0 - ll / base, 6) END AS skill_score
FROM fin
"""


@register("ml_eval_log_loss", oracle=_LOGLOSS_ORACLE, tags=("ml", "eval"))
def ml_eval_log_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean negative log-likelihood (cross-entropy) of the max-normalized
    score against the purchase label — the proper scoring rule the other
    eval queries bracket: Brier (ml_eval_brier_decomposition) is its
    quadratic sibling, ECE its calibration-only projection; log loss is
    what classifier training actually optimizes, so drift here and not
    in AUC means a calibration problem, not a ranking one. Reported with
    the label-entropy baseline (log loss of the constant p̄ predictor)
    and the skill score 1 − LL/H(p̄), so "0.62" has a yardstick.

    Clipping is integral: scores quantize to micro-units through the ONE
    shared double division the eval family uses, then clamp to
    [100, 999900] micro (ε = 1e-4) BEFORE any log — the standard guard
    that keeps a single confident-wrong row from emitting ±Inf.

    The transcendental trick: ln() is never evaluated per fact row. The
    facts fold to the distinct clipped-score grain — bounded at 999 801
    rows AT ANY DATA SCALE — and each distinct score's two log terms are
    weighted by that grain's (n_q, y_q) counts. So the double summation
    runs over a bounded, deterministic grain (cross-engine noise is
    ~1e6 ulp-weighted terms against a ROUND(6) budget), while the
    unbounded work is all exact integer counting with map-side combine.
    One scan + one bounded reduce; the global max is a 1-row broadcast."""
    mx = load(spark, sf_dir, "events").agg(F.max("value").alias("mv"))
    scored = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mx))
        .select(
            F.least(
                F.greatest(
                    F.floor(F.col("value") / F.col("mv") * F.lit(1000000.0))
                    .cast("long"),
                    F.lit(100),
                ),
                F.lit(999900),
            ).alias("qc"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    per_q = scored.groupBy("qc").agg(
        F.count(F.lit(1)).cast("long").alias("n_q"),
        F.sum("y").cast("long").alias("y_q"),
    )
    p = F.col("qc").cast("double") / 1000000.0
    s = per_q.agg(
        F.sum("n_q").cast("long").alias("n"),
        F.sum("y_q").cast("long").alias("pos"),
        F.sum(
            F.col("y_q").cast("double") * (-F.log(p))
            + (F.col("n_q") - F.col("y_q")).cast("double")
            * (-F.log(1.0 - p))
        ).alias("loss"),
    )
    pbar = F.col("pos").cast("double") / F.col("n")
    # pos = 0 or pos = n (a single-class corpus) must not reach LN or the
    # ll/base division: DuckDB's LN(0) raises out-of-range and base = 0
    # divides by zero under ANSI Spark — pin ONE semantics (NULL baseline
    # and skill score) on both engines, matching ml_eval_mcc's degenerate
    # marginals.
    degenerate = (F.col("pos") == 0) | (F.col("pos") == F.col("n"))
    base = -pbar * F.log(pbar) - (1.0 - pbar) * F.log(1.0 - pbar)
    return s.select(
        F.col("n").alias("n_total"),
        F.col("pos").alias("n_pos"),
        F.round(F.col("loss") / F.col("n"), 6).alias("mean_log_loss"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(base, 6))
        .alias("baseline_entropy"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(F.round(1.0 - (F.col("loss") / F.col("n")) / base, 6))
        .alias("skill_score"),
    )


_CONFORMAL_ORACLE = """
WITH ev AS (
    SELECT event_type,
           CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vm,
           CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 10 AS b
    FROM events
), model AS (
    SELECT event_type,
           CAST(SUM(CAST(vm AS HUGEINT)) // COUNT(*) AS BIGINT) AS pred
    FROM ev WHERE b < 6 GROUP BY event_type
), cal AS (
    SELECT ABS(ev.vm - model.pred) AS r
    FROM ev JOIN model USING (event_type) WHERE ev.b IN (6, 7)
), nn AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal
), kk AS (
    SELECT n_cal, LEAST((9 * (n_cal + 1) + 9) // 10, n_cal) AS k FROM nn
), rg AS (
    SELECT r, CAST(COUNT(*) AS BIGINT) AS c FROM cal GROUP BY r
), cum AS (
    SELECT r, SUM(c) OVER (ORDER BY r) AS cs FROM rg
), qh AS (
    SELECT MIN(cum.r) AS qhat FROM cum, kk WHERE cum.cs >= kk.k
), test AS (
    SELECT ABS(ev.vm - model.pred) AS r
    FROM ev JOIN model USING (event_type) WHERE ev.b >= 8
), cov AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN test.r <= qh.qhat THEN 1 ELSE 0 END)
                AS BIGINT) AS covered
    FROM test, qh
)
SELECT kk.n_cal, cov.n_test, qh.qhat AS qhat_micros,
       CAST(900000 AS BIGINT) AS nominal_micros,
       cov.covered * 1000000 // cov.n_test AS coverage_micros
FROM kk, qh, cov
"""


@register("ml_conformal_interval", oracle=_CONFORMAL_ORACLE, tags=("ml", "eval"))
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval with held-out coverage audit —
    the distribution-free uncertainty wrapper every production model
    ships with (Vovk et al.; Angelopoulos & Bates 2021 survey): fit on
    a train fold, take q̂ = the ⌈0.9·(n+1)⌉-th smallest absolute
    residual on a CALIBRATION fold, and the interval ŷ ± q̂ is
    guaranteed ≥90% marginal coverage for exchangeable data — which the
    TEST-fold coverage column then verifies empirically. The "model" is
    the per-event-type train-fold mean (the same ≤|types|-row broadcast
    model family as ml_learning_curve), because conformal's guarantee
    holds for ANY point predictor; swap in ALS/regression scores and
    the machinery is unchanged.

    Everything is exact integer arithmetic: values quantize to micro
    units (FLOOR — both engines truncate the identical double), fold
    assignment is the portable md5 bucket (60/20/20), the model mean is
    a truncating decimal division with an output-scale quotient, and
    q̂ is an exact order statistic — per-distinct-residual counts, the
    two-phase distributed prefix sum (ranges.running_sums, no global
    row sort), then MIN over ranks ≥ k. Coverage exits as an integral
    micro-rate. Nothing floats, nothing knife-edges.

    Scale shape: one scan folds each branch with map-side combine; the
    model and q̂ are 1-to-k-row broadcasts; the residual grain the
    prefix sum orders is distinct |residual| values — bounded by the
    quantized value range (≤ ~5e8 here), not by row count."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("vm"),
        portable_bucket(F.col("event_id"), 10).alias("b"),
    )
    model = (
        ev.where(F.col("b") < 6)
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(SUM(CAST(vm AS DECIMAL(30,0))) div COUNT(1) AS LONG)"
            ).alias("pred")
        )
    )
    cal = (
        ev.where(F.col("b").isin(6, 7))
        .join(F.broadcast(model), "event_type")
        .select(F.abs(F.col("vm") - F.col("pred")).alias("r"))
    )
    nn = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    kk = nn.select(
        "n_cal",
        F.least(
            F.expr("(9 * (n_cal + 1) + 9) div 10"), F.col("n_cal")
        ).alias("k"),
    )
    rg = cal.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = running_sums(rg, ["r"], {"cs": ("c", True)})
    qh = (
        cum.crossJoin(F.broadcast(kk))
        .where(F.col("cs") >= F.col("k"))
        .agg(F.min("r").alias("qhat"))
    )
    test = (
        ev.where(F.col("b") >= 8)
        .join(F.broadcast(model), "event_type")
        .select(F.abs(F.col("vm") - F.col("pred")).alias("r"))
    )
    cov = test.crossJoin(F.broadcast(qh)).agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum((F.col("r") <= F.col("qhat")).cast("long"))
        .cast("long")
        .alias("covered"),
    )
    return (
        kk.crossJoin(F.broadcast(qh))
        .crossJoin(F.broadcast(cov))
        .select(
            "n_cal",
            "n_test",
            F.col("qhat").alias("qhat_micros"),
            F.lit(900000).cast("long").alias("nominal_micros"),
            F.expr("covered * 1000000 div n_test").alias("coverage_micros"),
        )
    )


_FAIRNESS_ORACLE = """
WITH base AS (
    SELECT c.c_mktsegment AS segment,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
           CAST(o.o_orderstatus = 'F' AS BIGINT) AS y
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), thr AS (
    SELECT SUM(CAST(cents AS HUGEINT)) // COUNT(*) AS t FROM base
), scored AS (
    SELECT segment, y, CAST(cents > thr.t AS BIGINT) AS pred
    FROM base, thr
), per AS (
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(pred * y) AS BIGINT) AS tp,
           CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp
    FROM scored GROUP BY segment
), rates AS (
    SELECT segment, n, n_pos,
           n_pred_pos * 1000000 // n AS selection_micros,
           CASE WHEN n_pos = 0 THEN NULL
                ELSE tp * 1000000 // n_pos END AS tpr_micros,
           CASE WHEN n = n_pos THEN NULL
                ELSE fp * 1000000 // (n - n_pos) END AS fpr_micros
    FROM per
)
SELECT segment, n, n_pos, selection_micros, tpr_micros, fpr_micros,
       CAST(MAX(selection_micros) OVER () - MIN(selection_micros) OVER ()
            AS BIGINT) AS parity_gap_micros,
       CAST(MAX(tpr_micros) OVER () - MIN(tpr_micros) OVER ()
            AS BIGINT) AS tpr_gap_micros,
       CAST(MAX(fpr_micros) OVER () - MIN(fpr_micros) OVER ()
            AS BIGINT) AS fpr_gap_micros
FROM rates
"""


@register("ml_eval_fairness_gaps", oracle=_FAIRNESS_ORACLE, tags=("ml", "eval"))
def ml_eval_fairness_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a classifier across market segments:
    per-segment selection rate (demographic parity), TPR (equal
    opportunity) and FPR, plus the max−min GAP of each across segments —
    the three standard disparity readouts (Hardt et al. 2016; Barocas,
    Hardt & Narayanan ch. 3) that a model gate checks before deploy.
    The audited "classifier" is the deterministic mean-threshold rule
    over order value (the same proxy-score family as the other eval
    queries); swap in real scores and the machinery is unchanged.

    Exact integers end to end: money quantizes through the decimal-cast
    cents convention, the threshold is one truncating division of exact
    sums, every rate is an integral micro-division per segment, and the
    gap columns are window max−min over the |segments|-row AGGREGATE —
    the only window in the plan runs on k rows, not facts.

    Scale shape: one fact⋈dim equi-join (AQE picks broadcast when the
    customer side fits), one map-side-combined fold to k segment rows,
    then constant-size algebra. The 1-row threshold is a broadcast."""
    base = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            ),
            "o_custkey",
        )
        .select(
            "segment",
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .alias("cents"),
            (F.col("o_orderstatus") == "F").cast("long").alias("y"),
        )
    )
    thr = base.agg(
        F.expr(
            "CAST(SUM(CAST(cents AS DECIMAL(30,0))) div COUNT(1) AS LONG)"
        ).alias("t")
    )
    scored = base.crossJoin(F.broadcast(thr)).select(
        "segment", "y", (F.col("cents") > F.col("t")).cast("long").alias("pred")
    )
    per = scored.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pred").cast("long").alias("n_pred_pos"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.col("pred") * F.col("y")).cast("long").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("y"))).cast("long").alias("fp"),
    )
    # A segment whose orders are all fulfilled (n = n_pos) or none
    # (n_pos = 0) must not reach the rate division: ANSI Spark raises
    # DIVIDE_BY_ZERO where DuckDB's integer // 0 NULLs — pin NULL rates on
    # both engines. The window gaps then range over the defined rates only
    # (MAX/MIN ignore NULLs identically on both engines; an all-degenerate
    # column yields a NULL gap, also cross-engine-identical).
    rates = per.select(
        "segment",
        "n",
        "n_pos",
        F.expr("n_pred_pos * 1000000 div n").alias("selection_micros"),
        F.expr(
            "CASE WHEN n_pos = 0 THEN NULL"
            " ELSE tp * 1000000 div n_pos END"
        ).alias("tpr_micros"),
        F.expr(
            "CASE WHEN n = n_pos THEN NULL"
            " ELSE fp * 1000000 div (n - n_pos) END"
        ).alias("fpr_micros"),
    )
    w = Window.partitionBy()
    return rates.select(
        "segment",
        "n",
        "n_pos",
        "selection_micros",
        "tpr_micros",
        "fpr_micros",
        (F.max("selection_micros").over(w) - F.min("selection_micros").over(w))
        .cast("long")
        .alias("parity_gap_micros"),
        (F.max("tpr_micros").over(w) - F.min("tpr_micros").over(w))
        .cast("long")
        .alias("tpr_gap_micros"),
        (F.max("fpr_micros").over(w) - F.min("fpr_micros").over(w))
        .cast("long")
        .alias("fpr_gap_micros"),
    )


_QINI_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS mv FROM events
), scored AS (
    SELECT CAST(FLOOR(value / mx.mv * 1000000.0) AS BIGINT) AS q,
           CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 2 = 0 AS BIGINT) AS t,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mx
), blocks AS (
    SELECT q,
           CAST(SUM(t) AS BIGINT) AS n_t,
           CAST(SUM(t * y) AS BIGINT) AS y_t,
           CAST(SUM(1 - t) AS BIGINT) AS n_c,
           CAST(SUM((1 - t) * y) AS BIGINT) AS y_c
    FROM scored GROUP BY q
), cum AS (
    SELECT n_t + n_c AS c_k,
           CAST(SUM(n_t) OVER w AS HUGEINT) AS nt,
           CAST(SUM(y_t) OVER w AS HUGEINT) AS yt,
           CAST(SUM(n_c) OVER w AS HUGEINT) AS nc,
           CAST(SUM(y_c) OVER w AS HUGEINT) AS yc
    FROM blocks
    WINDOW w AS (ORDER BY 1000000 - q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), tot AS (
    SELECT CAST(SUM(n_t + n_c) AS HUGEINT) AS n,
           CAST(SUM(n_t) AS BIGINT) AS n_treat,
           CAST(SUM(n_c) AS BIGINT) AS n_ctrl
    FROM blocks
), rated AS (
    SELECT cum.c_k, cum.nt, cum.nc, tot.n, tot.n_treat, tot.n_ctrl,
           (yt * 1000000000) // tot.n
           - CASE WHEN nc = 0 THEN 0
                  ELSE (yc * nt * 1000000000) // (nc * tot.n) END
               AS q_rate_nanos
    FROM cum, tot
), area AS (
    SELECT MAX(n_treat) AS n_treat, MAX(n_ctrl) AS n_ctrl,
           MAX(n) AS n,
           SUM(CAST(q_rate_nanos AS HUGEINT) * c_k) AS area_raw
    FROM rated
), endp AS (
    SELECT q_rate_nanos AS endpoint_nanos
    FROM rated WHERE nt + nc = n
)
SELECT area.n_treat, area.n_ctrl,
       CAST(endp.endpoint_nanos AS BIGINT) AS endpoint_nanos,
       CAST(CASE WHEN area.area_raw < 0
                 THEN -((-area.area_raw) // area.n)
                 ELSE area.area_raw // area.n END AS BIGINT) AS auuc_nanos,
       CAST(2 * (CASE WHEN area.area_raw < 0
                 THEN -((-area.area_raw) // area.n)
                 ELSE area.area_raw // area.n END)
            - endp.endpoint_nanos AS BIGINT) AS qini2_nanos
FROM area, endp
"""


@register("ml_eval_qini_auuc", oracle=_QINI_ORACLE, tags=("ml", "eval"))
def ml_eval_qini_auuc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / AUUC uplift evaluation — the CAUSAL companion of the
    accuracy evals: given a randomized treatment flag (the portable md5
    coin — a simulated RCT over the fixture; swap in the real assignment
    column in production) and a targeting score, the Qini curve plots,
    for each score-ordered population prefix, the incremental positives
    treatment earned over control reweighted to treatment size,
    Y_t(k) − Y_c(k)·N_t(k)/N_c(k) (Radcliffe 2007; the standard
    uplift-model readout). Reported normalized: the endpoint (overall
    incremental rate), the area under the normalized curve (AUUC), and
    the doubled Qini coefficient 2·AUUC − endpoint (the area above the
    random-targeting diagonal, ×2 to stay integral — positive means the
    score targets persuadables better than a coin).

    Same machinery as ml_eval_pr_auc: the facts fold to the distinct-
    score grain, all four cumulative series ride ONE pass of
    ranges.running_sums (two-phase distributed prefix sum — no global
    row sort), and every division has an OUTPUT-SCALE quotient: rates
    are nanos of a [−1,1] quantity (yt·1e9 div n and yc·nt·1e9 div
    (nc·n), both bounded ≤ 1e9 since yt ≤ n, yc ≤ nc), the area re-
    normalizes by n with a sign-split division, and nothing floats.
    Zero-control prefixes define the control term as 0 (mirrored).
    ⊘-adjacent honesty: the oracle mirrors every truncation, so this IS
    hash-checked, not rows-only.

    Scale shape: one scan → distinct-score grain (≤ 1e6+1 rows at any
    data size) → prefix sums → 1 row."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    mx = load(spark, sf_dir, "events").agg(F.max("value").alias("mv"))
    scored = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mx))
        .select(
            F.floor(F.col("value") / F.col("mv") * F.lit(1000000.0))
            .cast("long")
            .alias("q"),
            (portable_bucket(F.col("event_id"), 2) == 0)
            .cast("long")
            .alias("t"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    blocks = scored.groupBy("q").agg(
        F.sum("t").cast("long").alias("n_t"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("y_t"),
        F.sum(1 - F.col("t")).cast("long").alias("n_c"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("y_c"),
    ).withColumn("inv", F.lit(1000000) - F.col("q"))
    cum = running_sums(
        blocks,
        ["inv"],
        {"nt": ("n_t", True), "yt": ("y_t", True),
         "nc": ("n_c", True), "yc": ("y_c", True)},
    ).select(
        (F.col("n_t") + F.col("n_c")).alias("c_k"),
        F.col("nt").cast("decimal(20,0)").alias("nt"),
        F.col("yt").cast("decimal(20,0)").alias("yt"),
        F.col("nc").cast("decimal(20,0)").alias("nc"),
        F.col("yc").cast("decimal(20,0)").alias("yc"),
    )
    tot = blocks.agg(
        F.sum(F.col("n_t") + F.col("n_c")).cast("decimal(20,0)").alias("n"),
        F.sum("n_t").cast("long").alias("n_treat"),
        F.sum("n_c").cast("long").alias("n_ctrl"),
    )
    rated = cum.crossJoin(F.broadcast(tot)).select(
        "c_k",
        "nt",
        "nc",
        "n",
        "n_treat",
        "n_ctrl",
        F.expr(
            "CAST(yt * 1000000000 AS DECIMAL(38,0)) div n"
            " - CASE WHEN nc = 0 THEN 0"
            "   ELSE CAST(yc * nt * 1000000000 AS DECIMAL(38,0))"
            "        div CAST(nc * n AS DECIMAL(38,0)) END"
        ).alias("q_rate_nanos"),
    )
    area = rated.agg(
        F.max("n_treat").alias("n_treat"),
        F.max("n_ctrl").alias("n_ctrl"),
        F.max("n").alias("n"),
        F.sum(
            F.expr("CAST(q_rate_nanos AS DECIMAL(28,0)) * c_k")
        ).alias("area_raw"),
    )
    endp = rated.where(
        F.expr("nt + nc = CAST(n AS DECIMAL(20,0))")
    ).select(F.col("q_rate_nanos").alias("endpoint_nanos"))
    auuc = (
        "(CASE WHEN area_raw < 0"
        " THEN -(CAST(-area_raw AS DECIMAL(38,0)) div n)"
        " ELSE CAST(area_raw AS DECIMAL(38,0)) div n END)"
    )
    return (
        area.crossJoin(F.broadcast(endp))
        .select(
            "n_treat",
            "n_ctrl",
            F.col("endpoint_nanos").cast("long").alias("endpoint_nanos"),
            F.expr(auuc).cast("long").alias("auuc_nanos"),
            F.expr(f"2 * {auuc} - endpoint_nanos")
            .cast("long")
            .alias("qini2_nanos"),
        )
    )


_MCC_ORACLE = """
WITH mx AS (
    SELECT MAX(value) AS mv FROM events
), scored AS (
    SELECT CAST(value / mx.mv > 0.5 AS BIGINT) AS pred,
           CAST(event_type = 'purchase' AS BIGINT) AS y
    FROM events, mx
), cm AS (
    SELECT CAST(SUM(pred * y) AS BIGINT) AS tp,
           CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
           CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
           CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
    FROM scored
)
SELECT tp, fp, fn, tn,
       CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0
                 OR tn + fn = 0
            THEN NULL
            ELSE ROUND(
           (CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
           / SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                  * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)),
           6) END AS mcc
FROM cm
"""


@register("ml_eval_mcc", oracle=_MCC_ORACLE, tags=("ml", "eval"))
def ml_eval_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient at the 0.5 score threshold — the
    single scalar that stays honest under class imbalance where accuracy
    and even F1 mislead (Chicco & Jurman 2020: MCC is high only when ALL
    four confusion cells are good; F1 ignores TN entirely). Completes
    the thresholded-eval family: `ml_eval_confusion` tabulates the
    cells, this reduces them to the balanced scalar.

    The four cells are exact integers from one keyless fold (the same
    max-normalized score family as the other evals; the 0.5 threshold
    compares identically-derived doubles); MCC exits through one shared
    double expression — the products are taken in DOUBLE deliberately,
    because (tp+fp)(tp+fn)(tn+fp)(tn+fn) overflows any fixed decimal at
    ~1e10 rows while the double route is exact to 2^53 per factor and
    the output needs only 6 decimals. ROUND(6) display convention.

    Scale: one scan, one 1-row reduce, a broadcast scalar for the max."""
    mx = load(spark, sf_dir, "events").agg(F.max("value").alias("mv"))
    scored = (
        load(spark, sf_dir, "events")
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("value") / F.col("mv") > 0.5).cast("long").alias("pred"),
            (F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    cm = scored.agg(
        F.sum(F.col("pred") * F.col("y")).cast("long").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("y"))).cast("long").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("y")).cast("long").alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("y"))).cast("long").alias("tn"),
    )
    # any zero marginal (e.g. the threshold never fires on a constant-
    # value corpus) leaves MCC undefined — NULL on both engines (the
    # ANSI degenerate class). Guarded as OR-of-zeros, NOT a product:
    # the n^4 BIGINT product itself overflows loudly near n = 55k.
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp = 0 OR tp + fn = 0 OR tn + fp = 0"
            " OR tn + fn = 0 THEN NULL ELSE ROUND("
            "(CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)"
            " / SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)"
            "        * (CAST(tn AS DOUBLE) + fp)"
            "        * (CAST(tn AS DOUBLE) + fn)), 6) END"
        ).alias("mcc"),
    )


_PSM_ORACLE = """
WITH y AS (
    SELECT o_custkey, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                          * 100 AS BIGINT)) AS BIGINT) AS y_cents
    FROM orders GROUP BY o_custkey
), units AS (
    SELECT c.c_custkey AS k,
           CAST(c.c_mktsegment = 'BUILDING' AS BIGINT) AS t,
           CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
           COALESCE(y.y_cents, 0) AS y
    FROM customer c LEFT JOIN y ON c.c_custkey = y.o_custkey
), lined AS (
    SELECT *,
           last_value(CASE WHEN t = 0 THEN bal END IGNORE NULLS) OVER w_prev
               AS pb,
           last_value(CASE WHEN t = 0 THEN y END IGNORE NULLS) OVER w_prev
               AS py,
           first_value(CASE WHEN t = 0 THEN bal END IGNORE NULLS) OVER w_next
               AS nb,
           first_value(CASE WHEN t = 0 THEN y END IGNORE NULLS) OVER w_next
               AS ny
    FROM units
    WINDOW w_prev AS (ORDER BY bal, k
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           w_next AS (ORDER BY bal, k
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
), matched AS (
    SELECT k, bal, y,
           CASE WHEN pb IS NULL AND nb IS NULL THEN NULL
                WHEN pb IS NULL THEN ny
                WHEN nb IS NULL THEN py
                WHEN bal - pb <= nb - bal THEN py
                ELSE ny END AS my
    FROM lined WHERE t = 1
)
SELECT
    CAST((SELECT COUNT(*) FROM units WHERE t = 1) AS BIGINT) AS n_treated,
    CAST((SELECT COUNT(*) FROM units WHERE t = 0) AS BIGINT) AS n_controls,
    CAST(COUNT(my) AS BIGINT) AS n_matched,
    CAST(SUM(CASE WHEN my IS NOT NULL THEN y - my END) AS BIGINT)
        AS sum_diff_cents,
    CASE WHEN COUNT(my) = 0 THEN NULL
         ELSE ROUND(CAST(SUM(CASE WHEN my IS NOT NULL THEN y - my END)
                         AS DOUBLE) / COUNT(my) / 100.0, 4)
         END AS att_dollars
FROM matched
"""


@register("ml_psm_att", oracle=_PSM_ORACLE, tags=("ml", "experiment"))
def ml_psm_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor matching ATT (with replacement): every treated
    customer (BUILDING segment) is matched to the control whose account
    balance is closest, and the average treated-minus-matched outcome
    (total order revenue) is the effect on the treated — completing the
    observational-causal ladder naive diff → IPW (`ml_ipw_ate`) → DiD
    (`ml_diff_in_diff`) → CUPED (`stat_cuped_adjustment`) with the
    matching estimator every applied-econ playbook starts from. Balance
    stands in for the propensity score (within-segment scores are what
    a logistic fit on this covariate would produce, monotonically) —
    swap in `ml_logreg_gd` scores and the machinery is unchanged.

    Scalable 1-D nearest-neighbor WITHOUT a pairwise join AND without a
    global-order window (a bare Window.orderBy(bal) funnels every
    customer through one task — the exact hazard ranges.running_sums
    exists for): ONE distributed running count over (balance, key)
    order gives every row the number of controls at-or-before it; that
    count IS the ordinal of the bracketing controls, so two hash
    equi-joins against the control-ordinal table fetch the previous
    (index cc) and next (index cc+1) control — closest wins, ties to
    the LOWER side (deterministic, documented). O(n log n) total work,
    O(n_parts) sequential state, where the naive cross join is
    O(treated × controls). Money is exact cents; the only floats are
    the final ROUND'd dollar means. No controls at all pins NULL ATT."""
    y = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100"
                    " AS BIGINT)"
                )
            )
            .cast("long")
            .alias("y_cents")
        )
    )
    units = (
        load(spark, sf_dir, "customer")
        .join(y, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.col("c_custkey").alias("k"),
            (F.col("c_mktsegment") == "BUILDING").cast("long").alias("t"),
            F.expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .alias("bal"),
            F.coalesce("y_cents", F.lit(0)).cast("long").alias("y"),
        )
    )
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    # cc = number of controls at-or-before this row in (bal, k) order —
    # the distributed prefix count (range partition + per-slice window +
    # O(n_parts) offsets), never a single global sort task.
    counted = running_sums(
        units.withColumn("ic", (1 - F.col("t")).cast("long")),
        ["bal", "k"],
        {"cc": ("ic", True)},
    )
    ctrl_idx = counted.where(F.col("t") == 0).select(
        F.col("cc").alias("idx"),
        F.col("bal").alias("cb"),
        F.col("y").alias("cy"),
    )
    treated = counted.where(F.col("t") == 1).select("k", "bal", "y", "cc")
    prev_c = ctrl_idx.select(
        F.col("idx").alias("cc"),
        F.col("cb").alias("pb"),
        F.col("cy").alias("py"),
    )
    next_c = ctrl_idx.select(
        (F.col("idx") - 1).alias("cc"),
        F.col("cb").alias("nb"),
        F.col("cy").alias("ny"),
    )
    matched = (
        treated.join(prev_c, "cc", "left")
        .join(next_c, "cc", "left")
        .select(
            "k",
            "y",
            F.expr(
                "CASE WHEN pb IS NULL AND nb IS NULL THEN NULL"
                " WHEN pb IS NULL THEN ny"
                " WHEN nb IS NULL THEN py"
                " WHEN bal - pb <= nb - bal THEN py"
                " ELSE ny END"
            ).alias("my"),
        )
    )
    # COUNT (not SUM) so an empty customer table yields 0, matching the
    # oracle's COUNT subqueries.
    counts = units.agg(
        F.count(F.when(F.col("t") == 1, 1)).cast("long").alias("n_treated"),
        F.count(F.when(F.col("t") == 0, 1)).cast("long").alias("n_controls"),
    )
    # aggregate matched ALONE first (a global aggregate returns one row
    # even over an empty treated set, with COUNT 0 — matching the
    # oracle's shape on a no-treated corpus), then attach the counts.
    matched_agg = matched.agg(
        F.count("my").cast("long").alias("n_matched"),
        F.sum(
            F.when(F.col("my").isNotNull(), F.col("y") - F.col("my"))
        )
        .cast("long")
        .alias("sum_diff_cents"),
        F.expr(
            "CASE WHEN COUNT(my) = 0 THEN NULL"
            " ELSE ROUND(CAST(SUM(CASE WHEN my IS NOT NULL THEN y - my END)"
            " AS DOUBLE) / COUNT(my) / 100.0, 4) END"
        ).alias("att_dollars"),
    )
    return counts.crossJoin(matched_agg).select(
        "n_treated",
        "n_controls",
        "n_matched",
        "sum_diff_cents",
        "att_dollars",
    )


_DB_INDEX_ORACLE = """
WITH ex AS (
    SELECT vec_id, label AS own, CAST(t.i AS BIGINT) AS pos,
           CAST(FLOOR(CAST(embedding[CAST(t.i AS BIGINT) + 1] AS DOUBLE)
                      * 1000000.0) AS BIGINT) AS xq
    FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
), q AS (
    SELECT vec_id, MAX(own) AS own,
           CAST(SUM(xq * xq) AS BIGINT) AS qq
    FROM ex GROUP BY vec_id
), cent AS (
    SELECT own AS clabel, pos, CAST(SUM(xq) AS BIGINT) AS s,
           CAST(COUNT(*) AS BIGINT) AS n_l
    FROM ex GROUP BY own, pos
), percl AS (
    SELECT clabel, MAX(n_l) AS n_l,
           CAST(SUM(CAST(s AS DECIMAL(38,0)) * s) AS DECIMAL(38,0)) AS ss
    FROM cent GROUP BY clabel
), scat AS (
    SELECT p.clabel, p.n_l,
           CAST(p.n_l AS DECIMAL(38,0)) * sq.sum_qq - p.ss AS a_i
    FROM percl p JOIN (
        SELECT own AS clabel, CAST(SUM(qq) AS DECIMAL(38,0)) AS sum_qq
        FROM q GROUP BY own
    ) sq ON p.clabel = sq.clabel
), pair_num AS (
    SELECT a.clabel AS la, b.clabel AS lb,
           MAX(a.n_l) AS na, MAX(b.n_l) AS nb,
           CAST(SUM(CAST(a.s * b.n_l - b.s * a.n_l AS DECIMAL(38,0))
                    * (a.s * b.n_l - b.s * a.n_l)) AS DECIMAL(38,0)) AS num
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.clabel <> b.clabel
    GROUP BY a.clabel, b.clabel
), ratios AS (
    SELECT la, lb,
           CASE WHEN num = 0 THEN NULL
                ELSE CAST(CAST((sa.a_i * nb * nb + sb.a_i * na * na)
                               * 1000 AS HUGEINT)
                          // CAST(num AS HUGEINT) AS BIGINT)
                END AS r_milli
    FROM pair_num
    JOIN scat sa ON sa.clabel = la
    JOIN scat sb ON sb.clabel = lb
), worst AS (
    SELECT la, lb, r_milli,
           ROW_NUMBER() OVER (PARTITION BY la
                              ORDER BY r_milli DESC NULLS LAST, lb) AS rn
    FROM ratios
)
SELECT s.clabel AS label, s.n_l AS n_members,
       CAST(CAST(s.a_i AS HUGEINT)
            // CAST(CAST(s.n_l AS DECIMAL(38,0)) * s.n_l AS HUGEINT)
            AS BIGINT) AS scatter_sq_micro2,
       w.lb AS worst_other,
       w.r_milli AS db_component_milli
FROM scat s JOIN worst w ON w.la = s.clabel AND w.rn = 1
"""


@register(
    "ml_davies_bouldin_labels", oracle=_DB_INDEX_ORACLE, tags=("ml_eval",)
)
def ml_davies_bouldin_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin cluster-separation components of the embedding
    corpus against its labels — the within/between readout that
    complements `ml_silhouette_labels`: for each cluster,
    R_i = max_{j≠i} (S_i + S_j) / M_ij (scatter of the two clusters
    over their centroid separation), and the named worst_other says
    WHICH class it collides with (the actionable part — silhouette
    only says how much). Squared-distance convention throughout
    (documented, radical-free): S_i = mean squared member-centroid
    distance, M_ij = squared centroid distance.

    Exact integer algebra end-to-end (COVERAGE.md r10 convention —
    a first draft that emitted ROUND(double, 6) on the 1e12-magnitude
    scatter hash-failed at 1 ulp: 18 significant digits exceeds what a
    double carries): elements quantize to micro-units,
    A_i = n_i·Σ‖x‖² − ‖S_i‖² is an exact DECIMAL(38,0), and the ratio
    exits through the algebraic identity
    R_ij = (A_i·n_j² + A_j·n_i²) / Σ_p(S_ip·n_j − S_jp·n_i)² — the
    (n_i·n_j)² factors cancel exactly — as a truncating milli-unit
    division (both engines truncate toward zero). DECIMAL(38,0)
    headroom bounds the corpus at ~1e5 vectors/label at d=64 micro
    units; past that, drop to milli-unit element quantization (same
    identity, 6 fewer digits per term).

    Scale shape: one explode to the (vector, dim) grain, centroids are
    a (labels × dims)-row aggregate, and ALL pairwise work runs on that
    k·d-row table (k = |labels|, bounded) — no data×data stage
    anywhere. Identical centroids (M = 0) pin that pair's ratio NULL;
    worst-pair ties break on the other label ascending."""
    ex = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast(
                    "long"
                ),
            )
        ).alias("pos", "xq"),
    )
    q = ex.groupBy("vec_id").agg(
        F.max("own").alias("own"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("qq"),
    )
    cent = ex.groupBy(F.col("own").alias("clabel"), "pos").agg(
        F.sum("xq").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("n_l"),
    )
    percl = cent.groupBy("clabel").agg(
        F.max("n_l").alias("n_l"),
        F.sum(F.expr("CAST(s AS DECIMAL(38,0)) * s")).alias("ss"),
    )
    sum_qq = q.groupBy(F.col("own").alias("clabel")).agg(
        F.sum("qq").cast("decimal(38,0)").alias("sum_qq")
    )
    scat = percl.join(sum_qq, "clabel").select(
        "clabel",
        "n_l",
        F.expr("CAST(n_l AS DECIMAL(38,0)) * sum_qq - ss").alias("a_i"),
    )
    a = cent.select(
        F.col("clabel").alias("la"),
        "pos",
        F.col("s").alias("sa"),
        F.col("n_l").alias("na"),
    )
    b = cent.select(
        F.col("clabel").alias("lb"),
        "pos",
        F.col("s").alias("sb"),
        F.col("n_l").alias("nb"),
    )
    pair_num = (
        a.join(F.broadcast(b), ["pos"])
        .where(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.sum(
                F.expr(
                    "CAST(sa * nb - sb * na AS DECIMAL(38,0))"
                    " * (sa * nb - sb * na)"
                )
            ).alias("num"),
        )
    )
    sa_df = scat.select(
        F.col("clabel").alias("la"), F.col("a_i").alias("a_a")
    )
    sb_df = scat.select(
        F.col("clabel").alias("lb"), F.col("a_i").alias("a_b")
    )
    ratios = (
        pair_num.join(F.broadcast(sa_df), "la")
        .join(F.broadcast(sb_df), "lb")
        .select(
            "la",
            "lb",
            F.expr(
                "CASE WHEN num = 0 THEN NULL"
                " ELSE CAST((a_a * nb * nb + a_b * na * na) * 1000"
                " div num AS BIGINT) END"
            ).alias("r_milli"),
        )
    )
    worst = ratios.select(
        "la",
        "lb",
        "r_milli",
        F.row_number()
        .over(
            Window.partitionBy("la").orderBy(
                F.desc_nulls_last("r_milli"), F.asc("lb")
            )
        )
        .alias("rn"),
    ).where(F.col("rn") == 1)
    return scat.join(worst, scat["clabel"] == worst["la"]).select(
        F.col("clabel").alias("label"),
        F.col("n_l").alias("n_members"),
        F.expr(
            "CAST(a_i div (CAST(n_l AS DECIMAL(38,0)) * n_l) AS BIGINT)"
        ).alias("scatter_sq_micro2"),
        F.col("lb").alias("worst_other"),
        F.col("r_milli").alias("db_component_milli"),
    )


_TWEEDIE_ORACLE = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY 1, 2
), base AS (
    SELECT dow, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(COUNT(*) AS BIGINT) AS nd
    FROM daily GROUP BY dow
), scored AS (
    SELECT d.day, d.y, CAST(b.sy AS DOUBLE) / b.nd AS mu
    FROM daily d JOIN base b ON d.dow = b.dow
), terms AS (
    SELECT y,
           CAST(FLOOR((CASE WHEN y = 0 THEN 2.0 * mu
                 ELSE 2.0 * (y * LN(y / mu) - (y - mu)) END) * 1000000.0)
                AS BIGINT) AS pois_micros,
           CASE WHEN y = 0 OR mu <= 0 THEN NULL
                ELSE CAST(FLOOR(2.0 * (-LN(y / mu) + (y - mu) / mu)
                                * 1000000.0) AS BIGINT)
                END AS gamma_micros
    FROM scored WHERE mu > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(COALESCE(SUM(CASE WHEN y = 0 THEN 1 END), 0) AS BIGINT)
           AS n_zero_days,
       CAST(SUM(pois_micros) // COUNT(*) AS BIGINT)
           AS poisson_dev_mean_micros,
       CASE WHEN COUNT(gamma_micros) = 0 THEN NULL
            ELSE CAST(SUM(gamma_micros) // COUNT(gamma_micros) AS BIGINT)
            END AS gamma_dev_mean_micros
FROM terms
"""


@register(
    "ml_eval_tweedie_deviances", oracle=_TWEEDIE_ORACLE, tags=("ml_eval",)
)
def ml_eval_tweedie_deviances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson and Gamma unit-deviance means of the day-of-week seasonal
    baseline on daily purchase counts — the GLM-native forecast metrics
    RMSE misrepresents for counts and positive-skewed targets: Poisson
    deviance 2[y·ln(y/μ) − (y−μ)] penalizes relative error at the
    variance the data actually has (Var ∝ μ), Gamma deviance
    2[−ln(y/μ) + (y−μ)/μ] the Var ∝ μ² regime; comparing the two means
    tells you WHICH variance regime your series is in — the p-selection
    step of a Tweedie GLM, as a query. Baseline μ = per-dow mean (the
    seasonal-naive model ts_seasonal_index ships); in-sample by design.

    Exactness: counts and dow sums are exact integers; μ is one shared
    IEEE division; each deviance term FLOOR-quantizes to micro-units
    BEFORE the sum, so the fold is exact integer addition on both
    engines — a raw double sum over the day grain would vary with
    summation order. y = 0 contributes the exact Poisson limit 2μ and
    is excluded (counted) from the Gamma mean, where the deviance is
    undefined. One data-sized fold; everything after runs on the
    bounded calendar grain."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.to_date("ts").alias("day"),
            F.dayofweek(F.to_date("ts")).cast("long").alias("dow"),
        )
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("long"))
            .cast("long")
            .alias("y")
        )
    )
    base = daily.groupBy("dow").agg(
        F.sum("y").cast("long").alias("sy"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )
    scored = daily.join(F.broadcast(base), "dow").select(
        "y", F.expr("CAST(sy AS DOUBLE) / nd").alias("mu")
    )
    terms = scored.where(F.col("mu") > 0).select(
        "y",
        F.expr(
            "CAST(FLOOR((CASE WHEN y = 0 THEN 2.0 * mu"
            " ELSE 2.0 * (y * LN(y / mu) - (y - mu)) END) * 1000000.0)"
            " AS BIGINT)"
        ).alias("pois_micros"),
        F.expr(
            "CASE WHEN y = 0 OR mu <= 0 THEN NULL"
            " ELSE CAST(FLOOR(2.0 * (-LN(y / mu) + (y - mu) / mu)"
            " * 1000000.0) AS BIGINT) END"
        ).alias("gamma_micros"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.coalesce(F.sum((F.col("y") == 0).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_zero_days"),
        F.expr("CAST(SUM(pois_micros) div COUNT(1) AS BIGINT)").alias(
            "poisson_dev_mean_micros"
        ),
        F.expr(
            "CASE WHEN COUNT(gamma_micros) = 0 THEN NULL"
            " ELSE CAST(SUM(gamma_micros) div COUNT(gamma_micros)"
            " AS BIGINT) END"
        ).alias("gamma_dev_mean_micros"),
    )


_GAUC_ORACLE = """
WITH scored AS (
    SELECT user_id,
           CAST(FLOOR(value * 1000000.0) AS BIGINT) AS s,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
    FROM events WHERE event_type IN ('purchase', 'view')
), ranked AS (
    SELECT user_id, pos,
           CAST(2 * RANK() OVER (PARTITION BY user_id ORDER BY s)
                + COUNT(*) OVER (PARTITION BY user_id, s) - 1 AS BIGINT)
               AS r2
    FROM scored
), per_user AS (
    SELECT user_id,
           CAST(SUM(pos) AS BIGINT) AS np,
           CAST(SUM(1 - pos) AS BIGINT) AS nn,
           CAST(SUM(CASE WHEN pos = 1 THEN r2 ELSE 0 END) AS BIGINT)
               AS r2_pos
    FROM ranked GROUP BY user_id
), u AS (
    SELECT user_id, np, nn,
           (r2_pos - np * (np + 1)) AS u2
    FROM per_user WHERE np > 0 AND nn > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users_evaluable,
       CAST(SUM(np * nn) AS BIGINT) AS n_pairs,
       CASE WHEN SUM(np * nn) = 0 THEN NULL
            ELSE CAST(CAST(SUM(u2) AS HUGEINT) * 1000000
                      // (2 * CAST(SUM(np * nn) AS HUGEINT)) AS BIGINT)
            END AS gauc_micros,
       CASE WHEN COUNT(*) = 0 THEN NULL
            ELSE CAST(SUM(CAST(u2 AS HUGEINT) * 1000000
                          // (2 * np * nn)) // COUNT(*) AS BIGINT)
            END AS macro_gauc_micros
FROM u
"""


@register("ml_eval_gauc", oracle=_GAUC_ORACLE, tags=("ml_eval", "recsys"))
def ml_eval_gauc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped AUC (GAUC) of the value signal ranking purchases above
    views WITHIN each user — the recommender-eval convention (pinned by
    the DIN paper, Zhou et al. 2018, and standard in CTR work): a
    global AUC (`ml_eval_auc_roc`) is inflated by easy BETWEEN-user
    separation that a per-user ranker never exploits; GAUC scores only
    within-user pair orderings. Two published weightings ride in one
    row: pair-weighted (Σ_u U_u / Σ_u n⁺·n⁻ — pooled within-user
    concordance) and macro (unweighted mean of per-user AUCs). Users
    with no purchase or no view are excluded (no pair to rank) and
    counted via n_users_evaluable.

    Exact integer algebra: scores FLOOR-quantize to micro-units;
    doubled midranks 2r = 2·RANK + ties − 1 make each user's
    Mann–Whitney U exact through ties (U = (Σ2r⁺ − n⁺(n⁺+1))/2, the 2s
    carried to the final truncating micro division). Every window is
    PARTITIONED BY user — the per-user grain is the natural shuffle
    key, nothing global — and the final fold is one aggregate. This is
    the 100 TB GAUC shape."""
    scored = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            "user_id",
            F.expr("CAST(FLOOR(value * 1000000.0) AS BIGINT)").alias("s"),
            (F.col("event_type") == "purchase").cast("int").alias("pos"),
        )
    )
    ranked = scored.select(
        "user_id",
        "pos",
        (
            2 * F.rank().over(Window.partitionBy("user_id").orderBy("s"))
            + F.count(F.lit(1)).over(Window.partitionBy("user_id", "s"))
            - 1
        ).cast("long").alias("r2"),
    )
    per_user = ranked.groupBy("user_id").agg(
        F.sum("pos").cast("long").alias("np"),
        F.sum(1 - F.col("pos")).cast("long").alias("nn"),
        F.sum(F.expr("CASE WHEN pos = 1 THEN r2 ELSE 0 END"))
        .cast("long")
        .alias("r2_pos"),
    )
    u = per_user.where((F.col("np") > 0) & (F.col("nn") > 0)).select(
        "np", "nn", (F.col("r2_pos") - F.col("np") * (F.col("np") + 1)).alias("u2")
    )
    return u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_evaluable"),
        F.sum(F.col("np") * F.col("nn")).cast("long").alias("n_pairs"),
        F.expr(
            "CASE WHEN SUM(np * nn) = 0 THEN NULL"
            " ELSE CAST(CAST(SUM(u2) AS DECIMAL(38,0)) * 1000000"
            " div (2 * CAST(SUM(np * nn) AS DECIMAL(38,0))) AS BIGINT) END"
        ).alias("gauc_micros"),
        F.expr(
            "CASE WHEN COUNT(1) = 0 THEN NULL"
            " ELSE CAST(SUM(CAST(u2 AS DECIMAL(38,0)) * 1000000"
            " div (2 * np * nn)) div COUNT(1) AS BIGINT) END"
        ).alias("macro_gauc_micros"),
    )


def _chi2_fs_oracle() -> str:
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    p = chi2_sf_sql_expr("chi2", "CAST((b - 1) * (l - 1) AS DOUBLE)")
    return f"""
WITH base AS (
    SELECT event_type AS label,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS f_dow,
           CAST(FLOOR(epoch(ts)) AS BIGINT) % 86400 // 14400 AS f_hour4,
           LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 3) AS f_valbkt
    FROM events
), long AS (
    SELECT label, 'dow' AS feature, f_dow AS lvl FROM base
    UNION ALL
    SELECT label, 'hour4' AS feature, f_hour4 AS lvl FROM base
    UNION ALL
    SELECT label, 'value_bucket' AS feature, f_valbkt AS lvl FROM base
), cells AS (
    SELECT feature, lvl, label, CAST(COUNT(*) AS BIGINT) AS n
    FROM long GROUP BY 1, 2, 3
), margins AS (
    SELECT feature, n,
           CAST(SUM(n) OVER (PARTITION BY feature, lvl) AS BIGINT) AS row_n,
           CAST(SUM(n) OVER (PARTITION BY feature, label) AS BIGINT) AS col_n,
           CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS tot
    FROM cells
), per_feature AS (
    SELECT feature,
           SUM(POW(CAST(n AS DOUBLE)
                   - CAST(row_n AS DOUBLE) * col_n / tot, 2)
               / (CAST(row_n AS DOUBLE) * col_n / tot)) AS chi2,
           (SELECT COUNT(DISTINCT lvl) FROM cells c2
            WHERE c2.feature = margins.feature) AS b,
           (SELECT COUNT(DISTINCT label) FROM cells c2
            WHERE c2.feature = margins.feature) AS l
    FROM margins GROUP BY feature
)
SELECT feature,
       CAST(b AS BIGINT) AS n_levels,
       CAST((b - 1) * (l - 1) AS BIGINT) AS df,
       CASE WHEN b < 2 OR l < 2 THEN NULL ELSE ROUND(chi2, 4) END AS chi2,
       CASE WHEN b < 2 OR l < 2 THEN NULL ELSE ROUND({p}, 6) END AS p_value,
       CAST(ROW_NUMBER() OVER (
            ORDER BY CASE WHEN b < 2 OR l < 2 THEN -1 ELSE chi2 END DESC,
                     feature) AS BIGINT) AS chi2_rank
FROM per_feature
"""


@register(
    "ml_chi2_feature_selection", oracle=_chi2_fs_oracle(), tags=("ml_eval",)
)
def ml_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square univariate feature scoring against the event-type
    label — the SelectKBest shape: three candidate categorical features
    (day-of-week, 4-hour daypart, fixed-width value bucket) each get an
    independence χ², a Wilson–Hilferty p, and a rank, in ONE pass. The
    point is the COMPARATIVE ranking (which feature carries label
    signal), which single-feature tests (`stat_chi_square`,
    `stat_g_test`) don't give; fixed-width value buckets (not
    quantiles) keep the featurization free of any cross-engine ordering
    seam — the r14 percentile_disc lesson.

    Scale shape: one scan fans each row to 3 (feature, level) rows
    map-side (the unpivot is an in-task UNION, no shuffle multiplier
    beyond 3×), one map-side-combined fold to the (feature, level,
    label) cell grain (bounded: ≤ 3·(7+6+4)·|labels| rows), margins as
    windows over that bounded grain, ranks over 3 rows. Exact integer
    counts; χ² is a shared double expression (expected counts are exact
    rationals evaluated identically)."""
    from recommendation_system_big_data_spark.catalog import epoch_s
    from recommendation_system_big_data_spark.functions.safe_stats import (
        chi2_sf_sql_expr,
    )

    base = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("label"),
        F.dayofweek("ts").cast("long").alias("f_dow"),
        (epoch_s("ts") % 86400)
        .cast("long")
        .alias("_sec"),
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(3)
        ).alias("f_valbkt"),
    ).withColumn("f_hour4", F.expr("_sec div 14400"))
    long = (
        base.select("label", F.lit("dow").alias("feature"), F.col("f_dow").alias("lvl"))
        .unionByName(
            base.select(
                "label", F.lit("hour4").alias("feature"), F.col("f_hour4").alias("lvl")
            )
        )
        .unionByName(
            base.select(
                "label",
                F.lit("value_bucket").alias("feature"),
                F.col("f_valbkt").alias("lvl"),
            )
        )
    )
    cells = long.groupBy("feature", "lvl", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    margins = cells.select(
        "feature",
        "n",
        F.sum("n").over(Window.partitionBy("feature", "lvl")).cast("long").alias("row_n"),
        F.sum("n").over(Window.partitionBy("feature", "label")).cast("long").alias("col_n"),
        F.sum("n").over(Window.partitionBy("feature")).cast("long").alias("tot"),
    )
    dims = cells.groupBy("feature").agg(
        F.countDistinct("lvl").cast("long").alias("b"),
        F.countDistinct("label").cast("long").alias("l"),
    )
    per_feature = (
        margins.groupBy("feature")
        .agg(
            F.sum(
                F.expr(
                    "POW(CAST(n AS DOUBLE)"
                    " - CAST(row_n AS DOUBLE) * col_n / tot, 2)"
                    " / (CAST(row_n AS DOUBLE) * col_n / tot)"
                )
            ).alias("chi2")
        )
        .join(F.broadcast(dims), "feature")
    )
    p = chi2_sf_sql_expr("chi2", "CAST((b - 1) * (l - 1) AS DOUBLE)")
    w = Window.orderBy(
        F.desc(
            F.expr("CASE WHEN b < 2 OR l < 2 THEN -1 ELSE chi2 END")
        ),
        F.asc("feature"),
    )
    return per_feature.select(
        "feature",
        F.col("b").alias("n_levels"),
        F.expr("CAST((b - 1) * (l - 1) AS BIGINT)").alias("df"),
        F.expr(
            "CASE WHEN b < 2 OR l < 2 THEN NULL ELSE ROUND(chi2, 4) END"
        ).alias("chi2"),
        F.expr(
            f"CASE WHEN b < 2 OR l < 2 THEN NULL ELSE ROUND({p}, 6) END"
        ).alias("p_value"),
        F.row_number().over(w).cast("long").alias("chi2_rank"),
    )


_KS_SEP_ORACLE = """
WITH grid AS (
    SELECT value AS s,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
               AS c_p,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY value
), cum AS (
    SELECT s,
           SUM(c_p) OVER (ORDER BY s) AS cp,
           SUM(c - c_p) OVER (ORDER BY s) AS cn
    FROM grid
), tot AS (
    SELECT CAST(SUM(c_p) AS BIGINT) AS n_pos,
           CAST(SUM(c - c_p) AS BIGINT) AS n_neg
    FROM grid
), nums AS (
    SELECT c.s, CAST(ABS(c.cp * t.n_neg - c.cn * t.n_pos) AS BIGINT) AS num
    FROM cum c CROSS JOIN tot t
), best AS (
    SELECT MAX(num) AS m FROM nums
)
SELECT t.n_pos, t.n_neg,
       CASE WHEN t.n_pos = 0 OR t.n_neg = 0 THEN NULL
            ELSE ROUND(CAST(b.m AS DOUBLE)
                 / (CAST(t.n_pos AS DOUBLE) * CAST(t.n_neg AS DOUBLE)), 6)
       END AS ks,
       (SELECT MIN(s) FROM nums WHERE num = b.m) AS ks_score
FROM tot t CROSS JOIN best b
"""


@register("ml_eval_ks_separation", oracle=_KS_SEP_ORACLE, tags=("ml", "eval"))
def ml_eval_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov separation of a score between classes — the
    credit-scoring "KS statistic": max over thresholds of
    |F̂_pos(t) − F̂_neg(t)|, with the maximizing threshold. The
    label-conditioned sibling of `drift_ks_test` (which compares TIME
    snapshots of one column) and the order-free complement of
    `ml_eval_auc_roc` (AUC integrates the same two CDFs; KS reports
    their widest gap and WHERE it is — the natural operating point).

    Exactness: both empirical CDFs live on the distinct-score grid with
    integer cumulative counts (ranges.running_sums — two-phase prefix
    sum, no single-task window at scale), so the gap numerator
    |cp·n_neg − cn·n_pos| is an exact BIGINT; max and argmin-threshold
    are integer comparisons, and the one division happens once on the
    1-row exit. Single-class input → NULL ks (degenerate-fixture
    class). reference: same capability axis as model-eval utilities in
    eda-tools.py (reference repo) but distributed."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    grid = (
        load(spark, sf_dir, "events")
        .select(
            F.col("value").alias("s"),
            (F.col("event_type") == "purchase").alias("is_pos"),
        )
        .groupBy("s")
        .agg(
            F.count(F.when(F.col("is_pos"), 1)).alias("c_p"),
            F.count(F.lit(1)).alias("c"),
        )
        .withColumn("c_n", F.col("c") - F.col("c_p"))
    )
    cum = running_sums(
        grid, ["s"], {"cp": ("c_p", True), "cn": ("c_n", True)}
    )
    tot = grid.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum("c_n").cast("long").alias("n_neg"),
    )
    nums = (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "s",
            "n_pos",
            "n_neg",
            F.abs(
                F.col("cp") * F.col("n_neg") - F.col("cn") * F.col("n_pos")
            )
            .cast("long")
            .alias("num"),
        )
        # two consumers (max + argmin-threshold) would otherwise each
        # replay the full two-phase prefix sum — A/B'd at sf0.1: warm
        # band 2.2-2.6s → 1.8-2.4s and static exchanges 20 → 5
        .localCheckpoint(eager=False)
    )
    best = nums.agg(F.max("num").alias("m"))
    at = (
        nums.join(F.broadcast(best), F.col("num") == F.col("m"))
        .agg(F.min("s").alias("ks_score"))
    )
    return (
        tot.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(at))
        .select(
            "n_pos",
            "n_neg",
            F.when(
                (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.round(
                    F.col("m").cast("double")
                    / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
                    6,
                )
            )
            .alias("ks"),
            "ks_score",
        )
    )


#: Mutual-information binning: FLOOR(value / MI_BIN) — 12 bins over the
#: observed [0, 560] range, coarse enough that every cell count is
#: statistically meaningful at sf0.001.
MI_BIN = 50.0

_MI_ORACLE = f"""
WITH obs AS (
    SELECT CAST(FLOOR(value / {MI_BIN!r}) AS BIGINT) AS x,
           event_type AS y
    FROM events
), cells AS (
    SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c FROM obs GROUP BY x, y
), mx AS (
    SELECT x, CAST(SUM(c) AS BIGINT) AS rx FROM cells GROUP BY x
), my AS (
    SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY y
), tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cells
), terms AS (
    SELECT CAST(FLOOR(CAST(c.c AS DOUBLE)
               * (LN(CAST(c.c AS DOUBLE)) + LN(CAST(t.n AS DOUBLE))
                  - LN(CAST(m1.rx AS DOUBLE)) - LN(CAST(m2.cy AS DOUBLE)))
               * 1000000000.0) AS BIGINT) AS t_nanos
    FROM cells c
    JOIN mx m1 ON c.x = m1.x
    JOIN my m2 ON c.y = m2.y
    CROSS JOIN tot t
)
SELECT t.n AS n_rows, t.n_cells,
       ROUND((CAST((SELECT SUM(t_nanos) FROM terms) AS DOUBLE)
              / 1000000000.0) / CAST(t.n AS DOUBLE), 6) AS mi_nats
FROM tot t
"""


@register("ml_mutual_information", oracle=_MI_ORACLE, tags=("ml", "eval"))
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) between the binned value feature and the
    event-type label — the model-free feature-relevance score that
    catches the non-monotone dependence `ml_chi2_feature_selection`'s
    χ² sees only diffusely and a correlation misses entirely; the
    standard third member of the filter-selection toolbox (χ² / MI /
    WOE-IV, all three now present).

    I = Σ_xy p̂_xy·ln(p̂_xy/(p̂_x·p̂_y)), computed as exact integer cell
    counts (one groupBy; marginals are two tiny re-aggregations joined
    back — broadcast, cells ≤ bins×labels) with each cell's
    c·(ln c + ln N − ln r_x − ln c_y) FLOOR-quantized to nanos, so the
    cross-cell sum is exact and order-free — the stat_anderson_darling
    LN-nanos discipline. ln is evaluated on exact integers < 2^53
    (identical doubles both engines); a last-ulp libm divergence would
    need to land exactly on a nano boundary to flip the hash (the same
    accepted exposure as every normal_cdf_sql caller, swept by
    ulp_partition_sweep on landing day)."""
    obs = load(spark, sf_dir, "events").select(
        F.floor(F.col("value") / F.lit(MI_BIN)).cast("long").alias("x"),
        F.col("event_type").alias("y"),
    )
    cells = obs.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("c"))
    mx = cells.groupBy("x").agg(F.sum("c").cast("long").alias("rx"))
    my = cells.groupBy("y").agg(F.sum("c").cast("long").alias("cy"))
    tot = cells.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    terms = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_cells",
            F.expr(
                "CAST(FLOOR(CAST(c AS DOUBLE)"
                " * (LN(CAST(c AS DOUBLE)) + LN(CAST(n AS DOUBLE))"
                " - LN(CAST(rx AS DOUBLE)) - LN(CAST(cy AS DOUBLE)))"
                " * 1000000000.0) AS BIGINT)"
            ).alias("t_nanos"),
        )
    )
    return terms.groupBy("n", "n_cells").agg(
        F.sum("t_nanos").alias("s_nanos")
    ).select(
        F.col("n").alias("n_rows"),
        "n_cells",
        F.round(
            (F.col("s_nanos").cast("double") / F.lit(1000000000.0))
            / F.col("n").cast("double"),
            6,
        ).alias("mi_nats"),
    )


#: Truncated-RBO parameters (Webber, Moffat & Zobel 2010): persistence p
#: and evaluation depth K.
RBO_P = 0.9
RBO_K = 10

#: Per-item RBO weight W(m) = Σ_{d=m..K} p^{d-1}/d, nano-quantized ONCE in
#: Python and inlined as identical integer literals into BOTH plans — the
#: cross-engine float question is removed by construction.
_RBO_W_NANOS = tuple(
    int(
        sum(RBO_P ** (d - 1) / d for d in range(m, RBO_K + 1)) * 1_000_000_000
    )
    for m in range(1, RBO_K + 1)
)

_RBO_CASE = "CASE m " + " ".join(
    f"WHEN {m} THEN {w}" for m, w in enumerate(_RBO_W_NANOS, start=1)
) + " ELSE 0 END"

_RBO_ORACLE = f"""
WITH it AS (
    SELECT user_id, event_id % 101 AS item,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents,
           MAX(epoch_us(ts)) AS last_us
    FROM events GROUP BY 1, 2
), ranked AS (
    SELECT user_id, item,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY cents DESC, item ASC
           ) AS ra,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY last_us DESC, item ASC
           ) AS rb
    FROM it
), m AS (
    SELECT user_id,
           CASE WHEN ra >= rb THEN ra ELSE rb END AS m
    FROM ranked
    WHERE ra <= {RBO_K} AND rb <= {RBO_K}
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_common,
       ROUND({1.0 - RBO_P!r} * CAST(SUM({_RBO_CASE}) AS DOUBLE)
             / 1000000000.0, 6) AS rbo
FROM m GROUP BY user_id
"""


@register("ml_eval_rank_biased_overlap", oracle=_RBO_ORACLE, tags=("ml", "eval"))
def ml_eval_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between each
    user's value-ranked and recency-ranked item lists — the
    top-weighted similarity for comparing two RANKINGS (ranker A/B
    test, index-rebuild regression, "did the rerank change what users
    actually see?"), where Kendall's τ (stat_kendall_tau) wrongly
    weights position 100 like position 1. Truncated RBO@{RBO_K} with
    p = {RBO_P}: RBO = (1−p)·Σ_d p^(d−1)·|A_d ∩ B_d|/d.

    The depth sum is inverted to one weight per ITEM: an item at ranks
    (ra, rb) joins every depth d ≥ max(ra, rb), so its total
    contribution is W(m) = Σ_{{d=m..K}} p^(d−1)/d — a {RBO_K}-entry
    lookup inlined as INTEGER nano literals computed once in Python
    (both engines sum exact BIGINTs; no float accumulation, no
    cross-engine pow/divide). Two row_number windows per user (exact
    cents / epoch-micros keys, item tiebreak — no float ordering), one
    filter to the top-K intersection, one exact fold. Per-user work is
    O(items); the windows shuffle once on user_id."""
    from recommendation_system_big_data_spark.catalog import epoch_us

    it = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("event_id") % 101).alias("item"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
            F.max(epoch_us(F.col("ts"))).alias("last_us"),
        )
    )
    wa = Window.partitionBy("user_id").orderBy(
        F.desc("cents"), F.asc("item")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("last_us"), F.asc("item")
    )
    ranked = it.select(
        "user_id",
        "item",
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wb).alias("rb"),
    )
    m = ranked.where(
        (F.col("ra") <= RBO_K) & (F.col("rb") <= RBO_K)
    ).select("user_id", F.greatest("ra", "rb").alias("m"))
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.round(
            F.lit(1.0 - RBO_P)
            * F.sum(F.expr(_RBO_CASE)).cast("double")
            / F.lit(1000000000.0),
            6,
        ).alias("rbo"),
    )


#: Markov attribution: transient channel states (alphabetical; `purchase`
#: is the absorbing CONV state) and the fixed absorption-iteration count —
#: the chain mixes in a handful of steps, 60 is far past double
#: convergence, and a FIXED count keeps the recursion oracle-expressible
#: (the ts_holt_linear argument).
_MARKOV_CHANNELS = ("click", "error", "signup", "view")
_MARKOV_ITERS = 60


def _markov_step_exprs(
    removed: str | None, cpfx: str = "", ppfx: str = ""
) -> dict[str, str]:
    """One absorption-iteration update per state, as SQL text over the
    wide coefficient row (columns c_{s}_{t}, c_{s}_conv) and the previous
    iterate columns p_{s}; ``cpfx``/``ppfx`` qualify the two relations in
    the recursive member. Python's driver replica evaluates the SAME
    expressions via eval-free mirroring in _markov_solve — term order is
    the tuple order of _MARKOV_CHANNELS, fixed on both sides."""
    states = ("start",) + _MARKOV_CHANNELS
    out = {}
    for s in states:
        if s == removed:
            out[s] = "0e0"
            continue
        terms = [
            f"{cpfx}c_{s}_{t} * {ppfx}p_{t}"
            for t in _MARKOV_CHANNELS
            if t != removed
        ]
        terms.append(f"{cpfx}c_{s}_conv")
        out[s] = "(" + " + ".join(terms) + ")"
    return out


def _markov_solve(coef: dict[str, float], removed: str | None) -> float:
    """Driver replica of the SQL recursion: identical term order,
    identical IEEE ops, same fixed iteration count."""
    states = ("start",) + _MARKOV_CHANNELS
    p = {s: 0.0 for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt = {}
        for s in states:
            if s == removed:
                nxt[s] = 0.0
                continue
            acc = 0.0
            for t in _MARKOV_CHANNELS:
                if t != removed:
                    acc = acc + coef[f"c_{s}_{t}"] * p[t]
            acc = acc + coef[f"c_{s}_conv"]
            nxt[s] = acc
        p = nxt
    return p["start"]


def _markov_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed stage: first-conversion journeys → transition counts.

    Per user, events order by (ts, event_id); the journey is everything
    up to and including the FIRST purchase (converters) or the whole
    history (non-converters). Emitted edges: START→s₁, sᵢ→sᵢ₊₁ between
    consecutive non-purchase states, s_last→conv / s_last→drop. One
    window + one groupBy, both on the user_id shuffle."""
    from recommendation_system_big_data_spark.catalog import epoch_us

    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            "event_type",
            epoch_us(F.col("ts")).alias("us"),
        )
        .withColumn(
            "purch_before",
            F.count(F.when(F.col("event_type") == "purchase", 1)).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        # journey = rows before the first purchase, plus the purchase row
        .where(F.col("purch_before") == 0)
        .withColumn("prev_state", F.lag("event_type").over(w))
        .withColumn(
            "next_state", F.lead("event_type").over(w)
        )
    )
    edges = ev.select(
        F.coalesce(F.col("prev_state"), F.lit("start")).alias("src"),
        F.when(F.col("event_type") == "purchase", F.lit("conv"))
        .otherwise(F.col("event_type"))
        .alias("dst"),
    ).union(
        # terminal drop edge for non-converter journeys
        ev.where(
            F.col("next_state").isNull()
            & (F.col("event_type") != "purchase")
        ).select(
            F.col("event_type").alias("src"), F.lit("drop").alias("dst")
        )
    )
    return edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def _markov_coef_sql(counts_cte: str) -> str:
    """Wide 1-row coefficient projection: c_{s}_{t} = n(s→t)/n(s→*)."""
    states = ("start",) + _MARKOV_CHANNELS
    cols = []
    for s in states:
        for t in _MARKOV_CHANNELS + ("conv",):
            cols.append(
                f"COALESCE(CAST(SUM(CASE WHEN src = '{s}' AND dst = '{t}'"
                f" THEN n END) AS DOUBLE)"
                f" / NULLIF(CAST(SUM(CASE WHEN src = '{s}' THEN n END)"
                f" AS DOUBLE), 0e0), 0e0) AS c_{s}_{t}"
            )
    return (
        f"SELECT {', '.join(cols)} FROM {counts_cte}"
    )


def _markov_oracle() -> str:
    states = ("start",) + _MARKOV_CHANNELS
    recs = []
    for scen in (None,) + _MARKOV_CHANNELS:
        tag = scen or "base"
        step = _markov_step_exprs(scen, cpfx="c.", ppfx="r.")
        init_cols = ", ".join(f"0e0 AS p_{s}" for s in states)
        next_cols = ", ".join(f"{step[s]} AS p_{s}" for s in states)
        recs.append(
            f"rec_{tag}(i, {', '.join('p_' + s for s in states)}) AS (\n"
            f"    SELECT 0, {init_cols}\n"
            f"    UNION ALL\n"
            f"    SELECT r.i + 1, {next_cols}\n"
            f"    FROM rec_{tag} r CROSS JOIN coef c"
            f" WHERE r.i < {_MARKOV_ITERS}\n"
            f")"
        )
    effects = ", ".join(
        f"(SELECT p_start FROM rec_{c} WHERE i = {_MARKOV_ITERS}) AS p_{c}"
        for c in _MARKOV_CHANNELS
    )
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel, p_conv_all,"
        f" CASE WHEN p_conv_all <= 0e0 THEN NULL"
        f" ELSE ROUND(1e0 - p_{c} / p_conv_all, 6) END AS removal_effect,"
        f" CASE WHEN tot <= 0e0 THEN NULL ELSE ROUND("
        f" (CASE WHEN p_conv_all <= 0e0 THEN 0e0"
        f" ELSE 1e0 - p_{c} / p_conv_all END) / tot, 6) END"
        f" AS attribution_share"
        f" FROM fin"
        for c in _MARKOV_CHANNELS
    )
    share_sum = " + ".join(
        f"(CASE WHEN p_conv_all <= 0e0 THEN 0e0"
        f" ELSE 1e0 - p_{c} / p_conv_all END)"
        for c in _MARKOV_CHANNELS
    )
    return f"""
WITH RECURSIVE journey AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS purch_before
    FROM events
), j2 AS (
    SELECT user_id, event_id, event_type, us,
           LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id
           ) AS prev_state,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY us, event_id
           ) AS next_state
    FROM journey WHERE purch_before = 0
), edges AS (
    SELECT COALESCE(prev_state, 'start') AS src,
           CASE WHEN event_type = 'purchase' THEN 'conv'
                ELSE event_type END AS dst
    FROM j2
    UNION ALL
    SELECT event_type AS src, 'drop' AS dst
    FROM j2 WHERE next_state IS NULL AND event_type <> 'purchase'
), counts AS (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
    FROM edges GROUP BY src, dst
), coef AS (
    {_markov_coef_sql('counts')}
), {', '.join(recs)},
base AS (
    SELECT p_start AS p_conv_all FROM rec_base WHERE i = {_MARKOV_ITERS}
), eff AS (
    SELECT b.p_conv_all, {effects}
    FROM base b
), fin AS (
    SELECT *, {share_sum} AS tot FROM eff
)
{rows}
"""


@register(
    "attribution_markov_removal",
    oracle=_markov_oracle(),
    tags=("ml", "eval"),
)
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014) — the
    data-driven multi-touch model that replaced heuristic last-click /
    position rules: build the first-order journey chain over channel
    states, compute the absorption (conversion) probability from START,
    then each channel's worth is how much that probability DROPS when
    the channel is removed (its transitions redirected to the drop
    sink), normalized into attribution shares. Completes the
    attribution ladder: interval-join last-touch
    (attribution_click_purchase) → heuristic multi-touch
    (ml_linear_attribution) → model-based (this).

    Split: the DATA-heavy stage (journey segmentation to first
    conversion + transition counts) is one window + one groupBy on the
    user_id shuffle; the chain itself is a BOUNDED artifact (≤ 6×6
    states — the kmeans-centroid collect class), solved by fixed-count
    absorption iteration whose update is the SAME expression text the
    oracle's recursive CTE advances (term order pinned by
    _MARKOV_CHANNELS; coefficients enter as CAST-division of exact
    counts ≡ float(int)/float(int)) — the ts_holt_linear IEEE-DAG
    parity argument on a 1-row wide state. Degenerate guards: zero
    conversions or zero total removal effect → NULL (oneday's
    all-purchase corpus degenerates to START→conv only: every removal
    effect 0, shares NULL on both engines)."""
    counts = {
        (r["src"], r["dst"]): r["n"]
        for r in _markov_transition_counts(spark, sf_dir).collect()
    }
    states = ("start",) + _MARKOV_CHANNELS
    out_tot = {
        s: sum(n for (src, _), n in counts.items() if src == s)
        for s in states
    }
    coef = {}
    for s in states:
        for t in _MARKOV_CHANNELS + ("conv",):
            n = counts.get((s, t), 0)
            coef[f"c_{s}_{t}"] = (
                float(n) / float(out_tot[s]) if out_tot[s] else 0.0
            )
    p_all = _markov_solve(coef, None)
    effects = {
        c: (1.0 - _markov_solve(coef, c) / p_all) if p_all > 0.0 else None
        for c in _MARKOV_CHANNELS
    }
    tot = sum(e if e is not None else 0.0 for e in effects.values())
    rows = []
    for c in _MARKOV_CHANNELS:
        e = effects[c]
        rows.append(
            (
                c,
                p_all,
                round(e, 6) if e is not None else None,
                round((e if e is not None else 0.0) / tot, 6)
                if tot > 0.0 and p_all > 0.0
                else None,
            )
        )
    return spark.createDataFrame(
        rows,
        "channel string, p_conv_all double, removal_effect double,"
        " attribution_share double",
    )


#: AdaBoost-on-stumps: histogram bins (fixed width 10 over the value
#: range), boosting rounds, error clamp, and the 1e15 term quantizer that
#: makes every cross-cell weight sum exact and order-free.
_ADA_BIN = 10.0
_ADA_MAX_BIN = 60
_ADA_ROUNDS = 3
_ADA_EPS_CLAMP = 1e-10
_ADA_Q = 1e15


def _ada_round_sql(r: int) -> str:
    """One boosting round as chained CTEs over the weighted cell table
    w{r-1}(bin, y, wt): quantized per-(threshold, polarity) errors →
    integer argmin (tiebreak t asc, p asc) → alpha → reweighted,
    renormalized w{r}. The SAME arithmetic is replayed by _ada_solve."""
    prev = f"w{r - 1}"
    return f"""er{r} AS (
    SELECT t.t, p.p,
           SUM(CASE WHEN (CASE WHEN w.bin <= t.t THEN p.p ELSE -p.p END)
                    <> w.y
               THEN CAST(FLOOR(w.wt * {_ADA_Q!r}) AS BIGINT)
               ELSE 0 END) AS errq
    FROM {prev} w
    CROSS JOIN (SELECT UNNEST(generate_series(0, {_ADA_MAX_BIN})) AS t) t
    CROSS JOIN (SELECT UNNEST([1, -1]) AS p) p
    GROUP BY t.t, p.p
), best{r} AS (
    SELECT t, p, errq FROM er{r}
    ORDER BY errq ASC, t ASC, p ASC LIMIT 1
), ab{r} AS (
    SELECT t, p, errq,
           0.5 * LN((1e0 - GREATEST(LEAST(errq / {_ADA_Q!r},
                                          1e0 - {_ADA_EPS_CLAMP!r}),
                                    {_ADA_EPS_CLAMP!r}))
                    / GREATEST(LEAST(errq / {_ADA_Q!r},
                                     1e0 - {_ADA_EPS_CLAMP!r}),
                               {_ADA_EPS_CLAMP!r})) AS alpha
    FROM best{r}
), u{r} AS (
    SELECT w.bin, w.y,
           w.wt * EXP(-ab{r}.alpha * w.y
                      * (CASE WHEN w.bin <= ab{r}.t THEN ab{r}.p
                              ELSE -ab{r}.p END)) AS wt
    FROM {prev} w CROSS JOIN ab{r}
), z{r} AS (
    SELECT SUM(CAST(FLOOR(wt * {_ADA_Q!r}) AS BIGINT)) AS zq FROM u{r}
), w{r} AS (
    SELECT u.bin, u.y, u.wt / (z.zq / {_ADA_Q!r}) AS wt
    FROM u{r} u CROSS JOIN z{r} z
)"""


def _ada_oracle() -> str:
    rounds = ",\n".join(_ada_round_sql(r) for r in range(1, _ADA_ROUNDS + 1))
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, CAST(t AS BIGINT) AS threshold,"
        f" CAST(p AS BIGINT) AS polarity, ROUND(alpha, 6) AS alpha,"
        f" ROUND(errq / {_ADA_Q!r}, 6) AS eps FROM ab{r}"
        for r in range(1, _ADA_ROUNDS + 1)
    )
    return f"""
WITH cells AS (
    SELECT LEAST(CAST(FLOOR(value / {_ADA_BIN!r}) AS BIGINT),
                 {_ADA_MAX_BIN}) AS bin,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), n AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cells
), w0 AS (
    SELECT bin, y, CAST(cnt AS DOUBLE) / CAST(n.n AS DOUBLE) AS wt
    FROM cells CROSS JOIN n
),
{rounds}
{rows}
"""


def _ada_solve(cells: dict, n: int) -> list[tuple]:
    """Driver replica of the oracle's boosting rounds over the bounded
    (≤ 2·(MAX_BIN+1)-cell) histogram artifact — same quantization, same
    clamp, same IEEE update expression, same (errq, t, p) argmin."""
    import math as m

    w = {k: float(c) / float(n) for k, c in cells.items()}
    out = []
    for r in range(1, _ADA_ROUNDS + 1):
        best = None
        for t in range(_ADA_MAX_BIN + 1):
            for p in (1, -1):
                errq = sum(
                    m.floor(wt * _ADA_Q)
                    for (b, y), wt in w.items()
                    if (p if b <= t else -p) != y
                )
                # tiebreak matches the oracle's ORDER BY errq, t, p ASC
                # (p = -1 wins an exact tie over p = +1)
                key = (errq, t, p)
                if best is None or key < best[0]:
                    best = (key, t, p, errq)
        _, t, p, errq = best
        eps = max(min(errq / _ADA_Q, 1.0 - _ADA_EPS_CLAMP), _ADA_EPS_CLAMP)
        alpha = 0.5 * m.log((1.0 - eps) / eps)
        out.append((r, t, p, round(alpha, 6), round(errq / _ADA_Q, 6)))
        u = {
            (b, y): wt
            * m.exp(-alpha * y * (p if b <= t else -p))
            for (b, y), wt in w.items()
        }
        zq = sum(m.floor(wt * _ADA_Q) for wt in u.values())
        w = {k: wt / (zq / _ADA_Q) for k, wt in u.items()}
    return out


@register("ml_adaboost_stumps", oracle=_ada_oracle(), tags=("ml",))
def ml_adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete AdaBoost (Freund & Schapire 1997) on histogram decision
    stumps — {_ADA_ROUNDS} boosting rounds over the purchase-vs-rest
    label: the canonical ensemble member missing between the single
    stump (ml_decision_stump_hist) and the fitted models (ALS/logreg/
    k-means); each round re-weights the cells its predecessor got wrong
    and refits, which is the entire boosting idea in three rows.

    Scale split (the histogram-boosting insight — LightGBM's): the ONLY
    data-proportional work is the (bin, label) histogram fold; boosting
    state lives on that BOUNDED ≤ 2·(bins+1)-cell artifact (the
    kmeans-centroid collect class), so rounds cost nothing at any
    corpus size. Determinism: per-(t, p) weighted errors and the
    normalizer are sums of FLOOR(wt·1e15)-quantized BIGINT terms (exact,
    order-free); the argmin is an integer-key comparison with (t, p)
    tiebreak; alpha/weight updates are fixed IEEE expressions replayed
    verbatim by the oracle's chained per-round CTEs. Clamped eps keeps
    LN finite when a stump is perfect (degenerate single-class
    fixtures)."""
    cells_df = (
        load(spark, sf_dir, "events")
        .select(
            F.least(
                F.floor(F.col("value") / F.lit(_ADA_BIN)).cast("long"),
                F.lit(_ADA_MAX_BIN),
            ).alias("bin"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(-1))
            .alias("y"),
        )
        .groupBy("bin", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    rows = cells_df.collect()
    cells = {(r["bin"], r["y"]): r["cnt"] for r in rows}
    n = sum(cells.values())
    out = _ada_solve(cells, n)
    return spark.createDataFrame(
        out,
        "round bigint, threshold bigint, polarity bigint,"
        " alpha double, eps double",
    )


#: 1-D GMM-EM: value-domain histogram grain (unit-width bins — bounded by
#: the [0, 561] domain, never the corpus), component count, EM rounds, and
#: the per-cell 1e9 quantizer that makes every cross-cell sum exact.
_GMM_ROUNDS = 10
_GMM_VAR_FLOOR = 1e-6
_GMM_EXP_CLAMP = -700.0
_GMM_Q = 1e9


def _gmm_resp_sql(mu1: str, v1: str, pi1: str, mu2: str, v2: str, pi2: str,
                  x: str) -> tuple[str, str]:
    """Responsibility expressions (shared text; the 1/√(2π) factor cancels
    in the ratio). Exponents clamp at {_GMM_EXP_CLAMP} so a far-tail cell
    never yields 0/0."""
    g1 = (f"(EXP(GREATEST({_GMM_EXP_CLAMP!r}, -({x} - {mu1}) * ({x} - {mu1})"
          f" / (2e0 * {v1}))) / SQRT({v1}))")
    g2 = (f"(EXP(GREATEST({_GMM_EXP_CLAMP!r}, -({x} - {mu2}) * ({x} - {mu2})"
          f" / (2e0 * {v2}))) / SQRT({v2}))")
    den = f"({pi1} * {g1} + {pi2} * {g2})"
    return f"({pi1} * {g1} / {den})", f"({pi2} * {g2} / {den})"


def _gmm_solve(cells: list[tuple[int, int]]) -> list[tuple]:
    """Driver replica of the oracle's EM rounds over the bounded histogram
    (CPython libm and DuckDB share the platform libm; all cross-cell sums
    are FLOOR(term·1e9) exact integers, so order is irrelevant)."""
    import math as m

    n = sum(c for _, c in cells)
    s2 = sum(c * (2 * b + 1) for b, c in cells)
    q4 = sum(c * (2 * b + 1) ** 2 for b, c in cells)
    mean = float(s2) / (2.0 * float(n))
    var = max(float(q4) / (4.0 * float(n)) - mean * mean, _GMM_VAR_FLOOR)
    sd = m.sqrt(var)
    mu1, mu2 = mean - sd / 2.0, mean + sd / 2.0
    v1 = v2 = var
    pi1 = pi2 = 0.5
    for _ in range(_GMM_ROUNDS):
        acc = [0] * 6  # w1, x1, xx1, w2, x2, xx2 (quantized)
        for b, c in cells:
            x = (2.0 * b + 1.0) / 2.0
            g1 = m.exp(max(_GMM_EXP_CLAMP,
                           -(x - mu1) * (x - mu1) / (2.0 * v1))) / m.sqrt(v1)
            g2 = m.exp(max(_GMM_EXP_CLAMP,
                           -(x - mu2) * (x - mu2) / (2.0 * v2))) / m.sqrt(v2)
            den = pi1 * g1 + pi2 * g2
            r1 = pi1 * g1 / den
            r2 = pi2 * g2 / den
            acc[0] += m.floor(c * r1 * _GMM_Q)
            acc[1] += m.floor(c * r1 * x * _GMM_Q)
            acc[2] += m.floor(c * r1 * x * x * _GMM_Q)
            acc[3] += m.floor(c * r2 * _GMM_Q)
            acc[4] += m.floor(c * r2 * x * _GMM_Q)
            acc[5] += m.floor(c * r2 * x * x * _GMM_Q)
        w1, x1, xx1, w2, x2, xx2 = (float(a) for a in acc)
        mu1 = x1 / w1
        v1 = max(xx1 / w1 - mu1 * mu1, _GMM_VAR_FLOOR)
        pi1 = w1 / (w1 + w2)
        mu2 = x2 / w2
        v2 = max(xx2 / w2 - mu2 * mu2, _GMM_VAR_FLOOR)
        pi2 = w2 / (w1 + w2)
    return [
        (1, round(pi1, 6), round(mu1, 6), round(m.sqrt(v1), 6)),
        (2, round(pi2, 6), round(mu2, 6), round(m.sqrt(v2), 6)),
    ]


def _gmm_oracle() -> str:
    rounds = []
    prev = "p0"
    for r in range(1, _GMM_ROUNDS + 1):
        r1, r2 = _gmm_resp_sql(
            f"{prev}.mu1", f"{prev}.v1", f"{prev}.pi1",
            f"{prev}.mu2", f"{prev}.v2", f"{prev}.pi2", "c.x",
        )
        rounds.append(f"""e{r} AS (
    SELECT CAST(FLOOR(c.cnt * {r1} * {_GMM_Q!r}) AS HUGEINT) AS w1,
           CAST(FLOOR(c.cnt * {r1} * c.x * {_GMM_Q!r}) AS HUGEINT) AS x1,
           CAST(FLOOR(c.cnt * {r1} * c.x * c.x * {_GMM_Q!r}) AS HUGEINT)
               AS xx1,
           CAST(FLOOR(c.cnt * {r2} * {_GMM_Q!r}) AS HUGEINT) AS w2,
           CAST(FLOOR(c.cnt * {r2} * c.x * {_GMM_Q!r}) AS HUGEINT) AS x2,
           CAST(FLOOR(c.cnt * {r2} * c.x * c.x * {_GMM_Q!r}) AS HUGEINT)
               AS xx2
    FROM cells c CROSS JOIN {prev}
), p{r} AS (
    SELECT CAST(SUM(x1) AS DOUBLE) / CAST(SUM(w1) AS DOUBLE) AS mu1,
           GREATEST(CAST(SUM(xx1) AS DOUBLE) / CAST(SUM(w1) AS DOUBLE)
               - (CAST(SUM(x1) AS DOUBLE) / CAST(SUM(w1) AS DOUBLE))
               * (CAST(SUM(x1) AS DOUBLE) / CAST(SUM(w1) AS DOUBLE)),
               {_GMM_VAR_FLOOR!r}) AS v1,
           CAST(SUM(w1) AS DOUBLE)
               / (CAST(SUM(w1) AS DOUBLE) + CAST(SUM(w2) AS DOUBLE)) AS pi1,
           CAST(SUM(x2) AS DOUBLE) / CAST(SUM(w2) AS DOUBLE) AS mu2,
           GREATEST(CAST(SUM(xx2) AS DOUBLE) / CAST(SUM(w2) AS DOUBLE)
               - (CAST(SUM(x2) AS DOUBLE) / CAST(SUM(w2) AS DOUBLE))
               * (CAST(SUM(x2) AS DOUBLE) / CAST(SUM(w2) AS DOUBLE)),
               {_GMM_VAR_FLOOR!r}) AS v2,
           CAST(SUM(w2) AS DOUBLE)
               / (CAST(SUM(w1) AS DOUBLE) + CAST(SUM(w2) AS DOUBLE)) AS pi2
    FROM e{r}
)""")
        prev = f"p{r}"
    return f"""
WITH cells AS (
    SELECT CAST(FLOOR(value) AS BIGINT) AS b,
           (2e0 * CAST(FLOOR(value) AS BIGINT) + 1e0) / 2e0 AS x,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
), mom AS (
    SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
           CAST(SUM(cnt * (2 * b + 1)) AS HUGEINT) AS s2,
           CAST(SUM(cnt * (2 * b + 1) * (2 * b + 1)) AS HUGEINT) AS q4
    FROM cells
), p0 AS (
    SELECT CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))
               - SQRT(GREATEST(CAST(q4 AS DOUBLE) / (4e0 * CAST(n AS DOUBLE))
                   - (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE)))
                   * (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))),
                   {_GMM_VAR_FLOOR!r})) / 2e0 AS mu1,
           GREATEST(CAST(q4 AS DOUBLE) / (4e0 * CAST(n AS DOUBLE))
               - (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE)))
               * (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))),
               {_GMM_VAR_FLOOR!r}) AS v1,
           0.5e0 AS pi1,
           CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))
               + SQRT(GREATEST(CAST(q4 AS DOUBLE) / (4e0 * CAST(n AS DOUBLE))
                   - (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE)))
                   * (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))),
                   {_GMM_VAR_FLOOR!r})) / 2e0 AS mu2,
           GREATEST(CAST(q4 AS DOUBLE) / (4e0 * CAST(n AS DOUBLE))
               - (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE)))
               * (CAST(s2 AS DOUBLE) / (2e0 * CAST(n AS DOUBLE))),
               {_GMM_VAR_FLOOR!r}) AS v2,
           0.5e0 AS pi2
    FROM mom
),
{','.join(rounds)}
SELECT 1 AS component, ROUND(pi1, 6) AS pi, ROUND(mu1, 6) AS mu,
       ROUND(SQRT(v1), 6) AS sigma FROM p{_GMM_ROUNDS}
UNION ALL
SELECT 2, ROUND(pi2, 6), ROUND(mu2, 6), ROUND(SQRT(v2), 6)
FROM p{_GMM_ROUNDS}
"""


@register("ml_gmm_em_1d", oracle=_gmm_oracle(), tags=("ml",))
def ml_gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture fit by {_GMM_ROUNDS} EM rounds
    (Dempster, Laird & Rubin 1977) over the event-value distribution —
    the probabilistic sibling of ml_kmeans_lloyd (soft responsibilities
    instead of hard assignment) and the canonical latent-variable
    algorithm previously missing between the moment kernels and the
    fitted models. Deterministic moment-split init (μ ± σ/2, equal
    weights) — no random restarts to reconcile across engines.

    Scale split (the adaboost/markov pattern): the ONLY data-sized work
    is the unit-bin histogram fold, bounded by the VALUE DOMAIN (~561
    cells), not the corpus; EM rounds run on that bounded artifact.
    Determinism: every cross-cell sum is FLOOR(term·1e9)-quantized
    exact integer; per-cell responsibilities are one shared expression
    (clamped exponents — no 0/0 tail cells) whose EXP/SQRT evaluate in
    the SAME platform libm for the driver replica and DuckDB; the
    oracle advances each round as a chained CTE pair (terms → params).
    Variance floors keep the const fixture (σ = 0) finite on both
    engines."""
    rows = (
        load(spark, sf_dir, "events")
        .groupBy(F.floor("value").cast("long").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    )
    out = _gmm_solve([(r["b"], r["cnt"]) for r in rows])
    return spark.createDataFrame(
        out, "component bigint, pi double, mu double, sigma double"
    )


# --- Logistic regression via IRLS ------------------------------------------
# The one classical GLM the suite lacked: binary response fit by
# iteratively reweighted least squares with a d=4 design (intercept +
# three engagement features). Each IRLS step is ONE map-side-combined
# aggregation producing the 4x4 normal matrix and 4-vector (14 sums, a
# bounded driver artifact); the driver solves the tiny system with
# numpy and broadcasts the next beta — the MLlib LogisticRegression
# shape (treeAggregate of gram partials) re-expressed relationally.
# Rows-only (iterative matrix solve is outside single-statement SQL);
# the differential gate is tests/test_round15b_ops.py's independent
# numpy IRLS on the collected feature frame.

_IRLS_ITERS = 8


@register("ml_logistic_irls", oracle=None, tags=("ml",))
def ml_logistic_irls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression P(user has an 'error' event | engagement)
    fit by IRLS: features x1 = ln(1 + n_events), x2 = purchase ratio,
    x3 = avg value / 100, plus intercept. 8 Newton steps; each step
    aggregates the weighted Gram matrix X'WX (10 unique entries) and
    X'W(eta + (y-mu)/w) (4 entries) in ONE distributed fold — the
    only driver-side state is the 4x4 solve (numpy), broadcast back
    as literals in the next step's expressions. Sigmoid input clamped
    to +/-30 so exp() never overflows under ANSI.

    Scale: the feature frame is one groupBy(user) of the fact table,
    cached across the 8 folds; per-step work is map-side combinable
    and the driver artifact is O(d^2), independent of n. Output: one
    row per term with the fitted coefficient, n_users and the final
    deviance-scale log loss repeated as context columns. Evidence ⊘:
    sequential numpy IRLS replica (same features, independent linear
    algebra) must match coefficients to 1e-4."""
    import numpy as np

    ev = load(spark, sf_dir, "events")
    feats = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("ne"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "np_"
            ),
            F.avg("value").alias("av"),
            F.max(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("y"),
        )
        .select(
            F.expr("LN(1.0 + ne)").alias("x1"),
            F.expr("CAST(np_ AS DOUBLE) / ne").alias("x2"),
            F.expr("COALESCE(av, 0.0) / 100.0").alias("x3"),
            F.col("y").cast("double").alias("y"),
        )
        .cache()
    )
    n_users = feats.count()  # also materializes the cache
    if n_users == 0:
        feats.unpersist()
        return spark.createDataFrame(
            [], "term string, coef double, n_users bigint, log_loss double"
        )
    beta = np.zeros(4)
    xs = ["1.0", "x1", "x2", "x3"]
    for _ in range(_IRLS_ITERS):
        z = (
            f"GREATEST(-30.0, LEAST(30.0, {beta[0]!r} + {beta[1]!r} * x1"
            f" + {beta[2]!r} * x2 + {beta[3]!r} * x3))"
        )
        mu = f"(1.0 / (1.0 + EXP(-({z}))))"
        w = f"GREATEST({mu} * (1.0 - {mu}), 1e-10)"
        # working response eta = z + (y - mu) / w
        eta = f"({z} + (y - {mu}) / {w})"
        aggs = []
        for i in range(4):
            for j in range(i, 4):
                aggs.append(
                    F.sum(F.expr(f"{w} * {xs[i]} * {xs[j]}")).alias(
                        f"a{i}{j}"
                    )
                )
        for i in range(4):
            aggs.append(
                F.sum(F.expr(f"{w} * {xs[i]} * {eta}")).alias(f"b{i}")
            )
        row = feats.agg(*aggs).collect()[0]
        A = np.zeros((4, 4))
        b = np.zeros(4)
        for i in range(4):
            for j in range(i, 4):
                A[i, j] = A[j, i] = row[f"a{i}{j}"]
            b[i] = row[f"b{i}"]
        try:
            beta = np.linalg.solve(A, b)
        except np.linalg.LinAlgError:
            break
    zf = (
        f"GREATEST(-30.0, LEAST(30.0, {beta[0]!r} + {beta[1]!r} * x1"
        f" + {beta[2]!r} * x2 + {beta[3]!r} * x3))"
    )
    muf = f"(1.0 / (1.0 + EXP(-({zf}))))"
    ll = feats.agg(
        F.avg(
            F.expr(
                f"-(y * LN(GREATEST({muf}, 1e-15))"
                f" + (1.0 - y) * LN(GREATEST(1.0 - {muf}, 1e-15)))"
            )
        ).alias("ll")
    ).collect()[0]["ll"]
    feats.unpersist()
    terms = ["intercept", "log1p_events", "purchase_ratio", "avg_value_h"]
    return spark.createDataFrame(
        [
            (t, round(float(beta[i]), 6), n_users, round(float(ll), 6))
            for i, t in enumerate(terms)
        ],
        "term string, coef double, n_users bigint, log_loss double",
    )


# --- Variance inflation factors --------------------------------------------
# Multicollinearity screen for the engagement design matrix (the same
# d=3 feature frame ml_logistic_irls fits on): VIF_j = diag(R^-1)_jj
# over the predictor correlation matrix, closed form at k=3 —
#   det = 1 - r12^2 - r13^2 - r23^2 + 2 r12 r13 r23
#   VIF_1 = (1 - r23^2)/det   (and cyclically).
# One moment fold; correlations from expanded sums so both engines
# share the identical expression tree.

_VIF_DET = (
    "(1.0 - r12 * r12 - r13 * r13 - r23 * r23"
    " + 2.0 * r12 * r13 * r23)"
)
_VIF_GUARD = f"r12 IS NULL OR r13 IS NULL OR r23 IS NULL OR {_VIF_DET} <= 1e-12"


def _vif_corr(i: int, j: int) -> str:
    return (
        f"(CASE WHEN (s{i}{i} - n * m{i} * m{i}) <= 0"
        f" OR (s{j}{j} - n * m{j} * m{j}) <= 0 THEN NULL"
        f" ELSE (s{i}{j} - n * m{i} * m{j})"
        f" / SQRT((s{i}{i} - n * m{i} * m{i})"
        f" * (s{j}{j} - n * m{j} * m{j})) END)"
    )


_VIF_ORACLE = f"""
WITH feats AS (
    SELECT LN(1.0 + COUNT(*)) AS x1,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS DOUBLE) / COUNT(*) AS x2,
           COALESCE(AVG(value), 0.0) / 100.0 AS x3
    FROM events GROUP BY user_id
), mom AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           AVG(x1) AS m1, AVG(x2) AS m2, AVG(x3) AS m3,
           SUM(x1 * x1) AS s11, SUM(x2 * x2) AS s22, SUM(x3 * x3) AS s33,
           SUM(x1 * x2) AS s12, SUM(x1 * x3) AS s13, SUM(x2 * x3) AS s23
    FROM feats
), corr AS (
    SELECT n, {_vif_corr(1, 2)} AS r12, {_vif_corr(1, 3)} AS r13,
           {_vif_corr(2, 3)} AS r23
    FROM mom
)
SELECT f.feature, CAST(n AS BIGINT) AS n_users,
       CASE WHEN {_VIF_GUARD} THEN NULL
            ELSE ROUND(CASE f.feature
                 WHEN 'log1p_events' THEN (1.0 - r23 * r23) / {_VIF_DET}
                 WHEN 'purchase_ratio' THEN (1.0 - r13 * r13) / {_VIF_DET}
                 ELSE (1.0 - r12 * r12) / {_VIF_DET} END, 4)
       END AS vif
FROM corr CROSS JOIN (
    SELECT UNNEST(['log1p_events', 'purchase_ratio', 'avg_value_h'])
        AS feature) f
ORDER BY f.feature
"""


@register("ml_feature_vif", oracle=_VIF_ORACLE, tags=("ml", "feature"))
def ml_feature_vif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance inflation factors for the engagement design matrix —
    the multicollinearity screen run before trusting ANY coefficient
    readout (`ml_logistic_irls` fits exactly these features; VIF > 5
    means its standard errors are inflated and the coefficients are
    unstable under resampling). Closed form at k=3: VIF_j is the j-th
    diagonal of the inverse predictor correlation matrix, a ratio of
    determinant polynomials in (r12, r13, r23).

    One groupBy(user) feature fold, ONE nine-sum moment reduce,
    correlations from expanded sums (identical expression text both
    engines), and the 3-row output rides a literal feature spine.
    Degenerate classes: any zero-variance predictor or a singular
    correlation matrix (det ≤ 1e-12, exact collinearity) → NULL VIFs
    on all rows."""
    feats = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("LN(1.0 + COUNT(*))").alias("x1"),
            F.expr(
                "CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)"
                " AS DOUBLE) / COUNT(*)"
            ).alias("x2"),
            F.expr("COALESCE(AVG(value), 0.0) / 100.0").alias("x3"),
        )
    )
    mom = feats.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x1").alias("m1"),
        F.avg("x2").alias("m2"),
        F.avg("x3").alias("m3"),
        F.sum(F.expr("x1 * x1")).alias("s11"),
        F.sum(F.expr("x2 * x2")).alias("s22"),
        F.sum(F.expr("x3 * x3")).alias("s33"),
        F.sum(F.expr("x1 * x2")).alias("s12"),
        F.sum(F.expr("x1 * x3")).alias("s13"),
        F.sum(F.expr("x2 * x3")).alias("s23"),
    )
    corr = mom.select(
        "n",
        F.expr(_vif_corr(1, 2)).alias("r12"),
        F.expr(_vif_corr(1, 3)).alias("r13"),
        F.expr(_vif_corr(2, 3)).alias("r23"),
    )
    spine = spark.createDataFrame(
        [("log1p_events",), ("purchase_ratio",), ("avg_value_h",)],
        "feature string",
    )
    return (
        corr.crossJoin(F.broadcast(spine))
        .select(
            "feature",
            F.col("n").cast("long").alias("n_users"),
            F.expr(
                f"CASE WHEN {_VIF_GUARD} THEN NULL"
                f" ELSE ROUND(CASE feature"
                f" WHEN 'log1p_events' THEN (1.0 - r23 * r23) / {_VIF_DET}"
                f" WHEN 'purchase_ratio' THEN (1.0 - r13 * r13) / {_VIF_DET}"
                f" ELSE (1.0 - r12 * r12) / {_VIF_DET} END, 4) END"
            ).alias("vif"),
        )
        .orderBy("feature")
    )


# --- DeLong confidence interval for AUC ------------------------------------
# ml_eval_auc_roc reports the exact point estimate; this op adds the
# DeLong (1988) nonparametric variance so the AUC ships with a CI —
# the difference between "0.71" and "0.71 +/- 0.02" is the difference
# between a readout and a decision. The placement formulation folds on
# the distinct-score grain: a positive's placement is the fraction of
# negatives below it (ties count half) — exact integers in doubled
# units from the same exclusive prefix sums the AUC rank identity
# uses; S10/S01 are weighted variances of the two placement columns.

_DELONG_GUARD = "n_pos < 2 OR n_neg < 2"

_DELONG_ORACLE = f"""
WITH s AS (
    SELECT value AS score,
           CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                AS HUGEINT) AS c_p,
           CAST(COUNT(CASE WHEN event_type <> 'purchase' THEN 1 END)
                AS HUGEINT) AS c_n
    FROM events WHERE value IS NOT NULL GROUP BY value
), grid AS (
    SELECT c_p, c_n,
           COALESCE(SUM(c_p) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_pb,
           COALESCE(SUM(c_n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_nb
    FROM s
), tot AS (
    SELECT CAST(SUM(c_p) AS BIGINT) AS n_pos,
           CAST(SUM(c_n) AS BIGINT) AS n_neg
    FROM s
), placed AS (
    -- doubled placements: v10x2 = 2*neg_below + neg_tied (per positive),
    -- v01x2 = 2*pos_above + pos_tied (per negative)
    SELECT c_p, c_n,
           2 * cum_nb + c_n AS v10x2,
           2 * ((SELECT n_pos FROM tot) - cum_pb - c_p) + c_p AS v01x2
    FROM grid
), mom AS (
    SELECT (SELECT n_pos FROM tot) AS n_pos,
           (SELECT n_neg FROM tot) AS n_neg,
           SUM(c_p * v10x2) AS sp1, SUM(c_p * v10x2 * v10x2) AS sp2,
           SUM(c_n * v01x2) AS sn1, SUM(c_n * v01x2 * v01x2) AS sn2
    FROM placed
), fin AS (
    SELECT n_pos, n_neg,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE CAST(sp1 AS DOUBLE) / (2.0 * n_pos * n_neg) END AS auc,
           CASE WHEN n_pos > 1 AND n_neg > 0 THEN
               (CAST(sp2 AS DOUBLE) - CAST(sp1 AS DOUBLE) * sp1 / n_pos)
               / (n_pos - 1) / (4.0 * n_neg * n_neg)
           ELSE NULL END AS s10,
           CASE WHEN n_neg > 1 AND n_pos > 0 THEN
               (CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * sn1 / n_neg)
               / (n_neg - 1) / (4.0 * n_pos * n_pos)
           ELSE NULL END AS s01
    FROM mom
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
            ELSE ROUND(auc, 6) END AS auc,
       CASE WHEN {_DELONG_GUARD} THEN NULL
            ELSE ROUND(SQRT(s10 / n_pos + s01 / n_neg), 6) END AS se,
       CASE WHEN {_DELONG_GUARD} THEN NULL
            ELSE ROUND(auc - 1.959964 * SQRT(s10 / n_pos + s01 / n_neg), 6)
       END AS ci_lo,
       CASE WHEN {_DELONG_GUARD} THEN NULL
            ELSE ROUND(auc + 1.959964 * SQRT(s10 / n_pos + s01 / n_neg), 6)
       END AS ci_hi
FROM fin
"""


@register(
    "ml_eval_auc_delong_ci",
    oracle=_DELONG_ORACLE,
    tags=("ml", "eval"),
)
def ml_eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeLong (1988) nonparametric CI for the ROC AUC of value as a
    purchase-vs-rest score — the uncertainty `ml_eval_auc_roc`'s point
    estimate lacks. Placement formulation: each positive's placement
    is the fraction of negatives scored below it (ties half), each
    negative's the fraction of positives above; AUC is the mean of
    either column and SE² = S10/n₁ + S01/n₀ over their sample
    variances. Placements stay EXACT integers in doubled units on the
    distinct-score grain (the same exclusive prefix sums as the AUC
    rank identity — one running_sums pass produces both classes'
    cumulative counts), so the only doubles are the final variance
    folds over that grain under the ROUND budget.

    Scale shape: one distinct-score fold, one two-phase prefix sum,
    one weighted-moment reduce. Degenerate classes: single-class input
    → NULL AUC; a class with n<2 → AUC but NULL SE/CI."""
    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    s = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy(F.col("value").alias("score"))
        .agg(
            F.count(F.when(F.col("event_type") == "purchase", 1))
            .cast("decimal(20,0)")
            .alias("c_p"),
            F.count(F.when(F.col("event_type") != "purchase", 1))
            .cast("decimal(20,0)")
            .alias("c_n"),
        )
    )
    grid = running_sums(
        s, ["score"], {"cum_pb": ("c_p", False), "cum_nb": ("c_n", False)}
    )
    tot = s.agg(
        F.sum("c_p").cast("long").alias("n_pos"),
        F.sum("c_n").cast("long").alias("n_neg"),
    )
    placed = grid.crossJoin(F.broadcast(tot)).select(
        "c_p",
        "c_n",
        "n_pos",
        "n_neg",
        F.expr("2 * cum_nb + c_n").alias("v10x2"),
        F.expr("2 * (n_pos - cum_pb - c_p) + c_p").alias("v01x2"),
    )
    mom = placed.agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.sum(F.expr("c_p * v10x2")).cast("decimal(38,0)").alias("sp1"),
        F.sum(F.expr("c_p * v10x2 * v10x2"))
        .cast("decimal(38,0)")
        .alias("sp2"),
        F.sum(F.expr("c_n * v01x2")).cast("decimal(38,0)").alias("sn1"),
        F.sum(F.expr("c_n * v01x2 * v01x2"))
        .cast("decimal(38,0)")
        .alias("sn2"),
    )
    # every division names its zero class in the guard: ANSI Spark
    # raises DIVIDE_BY_ZERO eagerly on a single-class frame (oneday/
    # tiny fixtures) where DuckDB would only produce a masked inf.
    fin = mom.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL"
            " ELSE CAST(sp1 AS DOUBLE) / (2.0 * n_pos * n_neg) END"
        ).alias("auc"),
        F.expr(
            "CASE WHEN n_pos > 1 AND n_neg > 0 THEN"
            " (CAST(sp2 AS DOUBLE) - CAST(sp1 AS DOUBLE) * sp1 / n_pos)"
            " / (n_pos - 1) / (4.0 * n_neg * n_neg) ELSE NULL END"
        ).alias("s10"),
        F.expr(
            "CASE WHEN n_neg > 1 AND n_pos > 0 THEN"
            " (CAST(sn2 AS DOUBLE) - CAST(sn1 AS DOUBLE) * sn1 / n_neg)"
            " / (n_neg - 1) / (4.0 * n_pos * n_pos) ELSE NULL END"
        ).alias("s01"),
    )
    return fin.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL"
            " ELSE ROUND(auc, 6) END"
        ).alias("auc"),
        F.expr(
            f"CASE WHEN {_DELONG_GUARD} THEN NULL"
            f" ELSE ROUND(SQRT(s10 / n_pos + s01 / n_neg), 6) END"
        ).alias("se"),
        F.expr(
            f"CASE WHEN {_DELONG_GUARD} THEN NULL"
            f" ELSE ROUND(auc - 1.959964 * SQRT(s10 / n_pos + s01 / n_neg),"
            f" 6) END"
        ).alias("ci_lo"),
        F.expr(
            f"CASE WHEN {_DELONG_GUARD} THEN NULL"
            f" ELSE ROUND(auc + 1.959964 * SQRT(s10 / n_pos + s01 / n_neg),"
            f" 6) END"
        ).alias("ci_hi"),
    )


# --- Frequent sequential patterns (PrefixSpan) -----------------------------
# The pattern-mining family was absent: basket_rules_lift hand-rolls
# PAIRWISE association rules, but frequent SEQUENCES (ordered journey
# motifs like view->click->purchase) need PrefixSpan's projected-
# database recursion — MLlib ships it distributed (ml.fpm.PrefixSpan,
# the same library precedent as the ALS pipeline). Sequences are each
# user's JOURNEY PREFIX — the first _PSPAN_MAX_EVENTS event types by
# (ts, event_id). The prefix cap is analytical, not just a bound: on
# an always-active corpus every short motif is a subsequence of every
# FULL history (all 155 candidates pass at any support — vacuous);
# 5-event prefixes make support discriminative (12/155 at 0.3).

_PSPAN_MIN_SUPPORT = 0.3
_PSPAN_MAX_LEN = 3
_PSPAN_MAX_EVENTS = 5


@register("sequence_prefixspan", oracle=None, tags=("ml", "sequence"))
def sequence_prefixspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent sequential patterns of user event types via MLlib
    PrefixSpan (minSupport 0.3, maxPatternLength 3): WHICH journey
    motifs are common — the ordered counterpart of
    `basket_rules_lift`'s co-occurrence rules and the data-driven
    input to funnel design (`funnel_window_gap` checks a DECLARED
    funnel; this discovers candidates). Each user contributes their
    JOURNEY PREFIX — the first 5 events by (ts, event_id) as
    single-item itemsets: on an always-active corpus, full histories
    contain every short motif (all 155 candidates frequent at any
    reasonable support — a vacuous readout the landing check caught);
    prefixes ask the discriminative question "how do journeys START"
    and also bound every projected database by construction.

    Scale: PrefixSpan's projected-database passes are MLlib-
    distributed (the local-processing threshold keeps small
    projections on executors); the sequence build is one keyed window
    + groupBy(user). Deterministic given the corpus (support counts
    are exact; output ordered by support desc, then pattern string).
    ⊘ rows-only: recursive pattern growth isn't single-statement SQL;
    the differential gate enumerates ALL length-≤3 patterns over the
    5-symbol alphabet and counts subsequence support sequentially
    (tests/test_round15b_ops.py)."""
    from pyspark.ml.fpm import PrefixSpan

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PSPAN_MAX_EVENTS)
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: F.array(s["event_type"]),
            ).alias("sequence")
        )
        .select("sequence")
    )
    ps = PrefixSpan(
        minSupport=_PSPAN_MIN_SUPPORT,
        maxPatternLength=_PSPAN_MAX_LEN,
        maxLocalProjDBSize=32_000_000,
    )
    res = ps.findFrequentSequentialPatterns(seqs)
    return res.select(
        F.expr(
            "array_join(transform(sequence, x -> array_join(x, '+')), '>')"
        ).alias("pattern"),
        F.col("freq").cast("long").alias("support_count"),
    ).orderBy(F.desc("support_count"), F.asc("pattern"))


# --- Frequent itemsets (FP-Growth) -----------------------------------------
# The unordered half of the pattern-mining family: basket_rules_lift
# hand-rolls PAIRWISE lift; FP-Growth mines frequent itemsets of ANY
# size without candidate generation (conditional FP-tree recursion,
# MLlib-distributed). Baskets are each order's distinct part set.

#: ABSOLUTE support floor (orders). A fractional floor cannot stay
#: non-vacuous across scale factors here: the part catalog grows with
#: the corpus, so pair co-occurrence support DILUTES (max pair count 5
#: at both sf0.001 and sf0.01 while n_orders grows 10x — 0.2% passes
#: 433 pairs at sf0.001 and ZERO at sf0.01). MLlib takes a fraction,
#: so the op computes n_orders first and passes _FPG_MIN_COUNT / n.
_FPG_MIN_COUNT = 3


@register("basket_fpgrowth", oracle=None, tags=("ml", "olap"))
def basket_fpgrowth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part itemsets over order baskets via MLlib FP-Growth
    (absolute support >= 3 orders): the general-size completion of
    `basket_rules_lift`'s pairwise rules — FP-Growth's conditional-
    tree recursion finds ALL frequent itemsets without enumerating
    candidates, which is the only shape that survives wide baskets at
    scale. Baskets are distinct part sets per order (one groupBy).

    Scale: MLlib's distributed FP-Growth partitions conditional trees
    by item suffix (the PFP paper's shape); the basket build is one
    map-side-combined fold. Deterministic given the corpus: exact
    support counts, items within an itemset sorted, output ordered by
    (support desc, itemset string). ⊘ rows-only: variable-size
    itemset recursion isn't single-statement SQL; the differential
    gate runs a sequential apriori over the collected baskets and
    must match the (itemset, support) table cell-exactly."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("items"))
    )
    n_orders = baskets.count()
    if n_orders < _FPG_MIN_COUNT:
        # fewer baskets than the absolute floor: nothing can qualify,
        # and 3/n would exceed MLlib's [0,1] minSupport domain (tiny
        # fixture catch).
        return spark.createDataFrame(
            [], "itemset string, itemset_size int, support_count bigint"
        )
    fp = FPGrowth(
        itemsCol="items",
        # epsilon keeps float truncation from excluding exact-count-3
        minSupport=max(_FPG_MIN_COUNT / n_orders - 1e-12, 1e-12),
        minConfidence=0.1,
    )
    model = fp.fit(baskets)
    return (
        model.freqItemsets
        # singleton itemsets are plain part frequencies
        # (agg_topk_categories territory) and would crowd the readout:
        # keep the associative sizes, every one of them.
        .where(F.size("items") >= 2)
        .select(
            F.expr(
                "array_join(transform(array_sort(items),"
                " x -> CAST(x AS STRING)), '+')"
            ).alias("itemset"),
            F.size("items").alias("itemset_size"),
            F.col("freq").cast("long").alias("support_count"),
        )
        .orderBy(F.desc("support_count"), F.asc("itemset"))
    )
