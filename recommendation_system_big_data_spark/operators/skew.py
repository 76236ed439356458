"""Skew-mitigation join patterns.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles skewed
SHUFFLE partitions after the fact; explicit salting is the planning-time
pattern for the pathological case AQE cannot fix — a join key whose
cardinality is so low that entire keys exceed one task (nationkey: 25
values for every customer on Earth). Salting rewrites the join so the
hot key's rows spread over `key × salt` shuffle partitions, at the price
of replicating the small side salt-fold times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.queries.tpch import dsum
from recommendation_system_big_data_spark.registry import register

#: Salt fold: hot-key rows spread over this many sub-keys. 16 × 25 nations
#: = 400 shuffle groups — enough to occupy every core at local[32] and, at
#: cluster scale, to cap any single task at 1/16 of the hottest key.
_SALT = 16

_SALTED_JOIN_ORACLE = """
SELECT n.n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("join_skew_salted", oracle=_SALTED_JOIN_ORACLE, tags=("skew",))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer⋈nation on a 25-value key, salted: the fact side gets a
    deterministic salt `xxhash64(c_custkey) mod 16`, the dimension side
    explodes into all 16 salts, and the join key becomes (nationkey, salt)
    — so no shuffle partition ever receives a whole nation's customers.

    The result is byte-identical to the unsalted join (the oracle IS the
    unsalted join): salting changes data placement, never semantics. For
    this table size a broadcast join is the practical choice and what
    tpch.py does elsewhere; the salted spelling is registered as the
    shuffle-plan fallback for when the "dimension" is itself too large to
    broadcast but the key domain is tiny — the case where both broadcast
    and naive shuffle plans fail. The final groupBy(n_name) re-shuffles 25
    keys of partial aggregates (map-side combined), not raw rows."""
    cust = load(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.xxhash64("c_custkey"), F.lit(_SALT))
    )
    nat = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .withColumn(
            "salt", F.explode(F.array(*[F.lit(i) for i in range(_SALT)]))
        )
    )
    j = cust.join(
        nat,
        (cust["c_nationkey"] == nat["n_nationkey"])
        & (cust["salt"] == nat["salt"]),
    )
    return j.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum(F.col("c_acctbal")).alias("sum_acctbal"),
    )


_NULL_BYPASS_ORACLE = """
WITH ev AS (
    SELECT CASE WHEN event_type IN ('view', 'error') THEN NULL
                ELSE user_id END AS uid,
           value
    FROM events
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
           AS sum_value_cents
FROM ev LEFT JOIN customer c ON ev.uid = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("join_null_skew_bypass", oracle=_NULL_BYPASS_ORACLE, tags=("skew",))
def join_null_skew_bypass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join with a heavily-NULL join key (anonymous traffic: view and
    error events carry no user), written the way it must be at scale:
    NULL keys can never match, yet a naive left join still SHUFFLES every
    NULL row — and they all hash to the SAME partition, the one skew
    shape AQE's splitter cannot fix (splitting a partition of non-matching
    rows still replays them through the join). The bypass splits the fact
    stream on key nullability: the NULL branch skips the join entirely
    (dimension columns stamped NULL), only the matched-key branch
    shuffles, and the two branches union ahead of the rollup. Semantics
    are EXACTLY the naive left join's — the oracle is the one-line naive
    form — while the plan's join input carries zero NULL keys by
    construction.

    ~40% of fixture events route through the bypass. Integer exit: event
    values are exact 2-decimal quantities, summed as DECIMAL(12,2) and
    emitted as cent BIGINTs.

    Scale shape: the split is a predicate on an already-scanned column
    (both branches prune to the same scan; Catalyst plans one scan per
    branch of the union but each reads only its filtered rows); the
    joined branch shuffles |non-null| rows instead of |all| rows — at a
    70%-anonymous clickstream that is a 3× shuffle cut before skew even
    enters it."""
    ev = load(spark, sf_dir, "events").select(
        F.when(
            F.col("event_type").isin("view", "error"), F.lit(None)
        )
        .otherwise(F.col("user_id"))
        .alias("uid"),
        "value",
    )
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = ev.filter(F.col("uid").isNotNull()).join(
        dim, F.col("uid") == F.col("c_custkey"), "left"
    )
    bypass = ev.filter(F.col("uid").isNull()).withColumn(
        "c_mktsegment", F.lit(None).cast("string")
    )
    both = joined.select("c_mktsegment", "value").unionByName(
        bypass.select("c_mktsegment", "value")
    )
    return both.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.sum(F.col("value").cast("decimal(12,2)")) * 100)
        .cast("long")
        .alias("sum_value_cents"),
    )
