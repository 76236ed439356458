"""Explicit runtime-filter (Bloom-style) join pre-filtering.

At 100 TB the dominant join cost is shuffling the FACT side; when the
build side is selective (a filtered dimension), shipping a compact
membership summary of the build keys to the fact scan lets most fact rows
drop BEFORE the exchange. Spark's optimizer does this itself in narrow
cases (DPP for partition columns, AQE's InjectRuntimeFilter for
shuffle-join subqueries); this operator is the explicit DataFrame-level
form for the cases the optimizer can't see — multi-stage pipelines,
checkpointed intermediates, or filters the planner can't push.

Correctness is unconditional: the Bloom pre-filter only DROPS provably
non-matching rows (one-sided error — false positives survive to the exact
equi-join, which eliminates them), so the result is identical to the plain
join and fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register

#: Bloom domain: 2^20 single-hash buckets packed into 64-bit words.
#: ~3% fill at sf0.1's ~30k build keys; size this ~32+ bits/key in
#: production (or let AQE inject its own runtime filter when it can).
_N_BITS = 1 << 20


_BLOOM_JOIN_ORACLE = """
SELECT l.l_returnflag AS rf,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag
"""


@register(
    "join_bloom_prefilter", oracle=_BLOOM_JOIN_ORACLE, tags=("join", "runtime-filter")
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order line revenue by returnflag, with the fact side
    pre-filtered by a hand-built single-hash Bloom bitmap of the filtered
    build keys — the explicit runtime-filter pattern.

    Build: the selective orders subset hashes each key into a 2^20-bucket
    domain and packs buckets into 64-bit words with a `bit_or` aggregate
    (two-level: bucket→word partial-aggregates map-side, same construct
    as `agg_bitmap_distinct`) — a (word, mask) table of ≤16k rows whose
    size tracks the BUILD side only, broadcastable at any fact scale.

    Probe: the fact side computes its key's word and BROADCAST-HASH-joins
    the word table (inner join — an absent word IS the Bloom "no"), then
    a codegen'd bitwise-AND filter tests the bit. Both steps run BEFORE
    the join exchange, so non-matching fact rows never shuffle, and both
    stay inside whole-stage codegen (an earlier 1-row-map formulation put
    the membership test in a BroadcastNestedLoopJoin condition, which
    Spark evaluates interpreted — ~10× slower). Survivors (matches +
    Bloom false positives) then run the exact equi-join with the urgent
    orders; false positives die there, making the result bit-identical
    to the plain join the oracle runs."""
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def bucket(key: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(key), F.lit(_N_BITS))

    words = (
        orders.select(bucket(F.col("o_orderkey")).alias("b"))
        .groupBy((F.col("b") / 64).cast("long").alias("word"))
        .agg(F.bit_or(F.expr("shiftleft(1L, CAST(b % 64 AS INT))")).alias("mask"))
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .withColumn("pb", bucket(F.col("l_orderkey")))
        .withColumn("pword", (F.col("pb") / 64).cast("long"))
    )
    survived = (
        li.join(F.broadcast(words), li.pword == words.word)
        .where(
            F.col("mask").bitwiseAND(F.expr("shiftleft(1L, CAST(pb % 64 AS INT))"))
            != 0
        )
        .drop("pb", "pword", "word", "mask")
    )
    return (
        survived.join(orders.select("o_orderkey"), survived.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("rf"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )
    )
