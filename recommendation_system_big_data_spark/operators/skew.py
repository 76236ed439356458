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
