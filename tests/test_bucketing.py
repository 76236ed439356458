"""Layout-operator guarantees: the bucketed join must read with zero
shuffle exchanges, and the salted join must be row-equivalent to the plain
join while actually spreading hot keys across salts."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.operators.bucketing import (
    N_SALTS,
    bucketed_pair,
    salt_column,
    salted_join,
)
from recommendation_system_big_data_spark.plans import explain


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    ot, ct = bucketed_pair(spark, sf_dir)
    orders, cust = spark.table(ot), spark.table(ct)
    joined = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    assert explain.num_shuffles(joined) == 0, explain.physical_plan(joined)


def test_bucketed_join_rowcount_matches_plain(spark, sf_dir):
    ot, ct = bucketed_pair(spark, sf_dir)
    bucketed = spark.table(ot).join(
        spark.table(ct), F.col("o_custkey") == F.col("c_custkey")
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    assert bucketed.count() == plain.count()


def test_salted_join_equivalent_to_plain(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    salted = salted_join(
        li, supp, "l_suppkey", "s_suppkey", ["l_orderkey", "l_linenumber"]
    ).select("l_orderkey", "l_linenumber", "s_name")
    plain = li.join(supp, li["l_suppkey"] == supp["s_suppkey"]).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_actually_spreads_keys(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", salt_column(N_SALTS, F.col("l_orderkey"), F.col("l_linenumber"))
    )
    # the hottest supplier's rows should hit every salt value
    hot = li.groupBy("l_suppkey").count().orderBy(F.desc("count")).first()["l_suppkey"]
    n_salts_used = (
        li.filter(F.col("l_suppkey") == hot).select("salt").distinct().count()
    )
    assert n_salts_used == N_SALTS


def test_semdedup_bucketed_pairing_no_shuffle(spark, sf_dir):
    """The semdedup 100 TB deployment shape, executed (VERDICT r14 #5):
    write the probed assignment bucketed by centroid_id, then the
    candidate-pairing self-join plans ZERO shuffle exchanges
    (bucket-local SortMergeJoin), and the keeper-election result is
    identical to the in-session repartition+checkpoint path."""
    import os

    from recommendation_system_big_data_spark.operators.bucketing import (
        N_BUCKETS,
        _drop_stale_location,
    )
    from recommendation_system_big_data_spark.operators.dedup import (
        semantic_pairs_from_probed,
        semantic_probed_assignment,
        semantic_semdedup_frame,
    )

    name = f"semdedup_probed_{os.getpid()}"
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        (
            semantic_probed_assignment(spark, sf_dir)
            .write.bucketBy(N_BUCKETS, "centroid_id")
            .sortBy("centroid_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    bt = spark.table(name)
    pairing = bt.alias("a").join(
        bt.alias("b").hint("merge"),
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    assert explain.num_shuffles(pairing) == 0, explain.physical_plan(pairing)
    bucketed = {tuple(r) for r in semantic_pairs_from_probed(bt).collect()}
    in_session = {tuple(r) for r in semantic_semdedup_frame(spark, sf_dir).collect()}
    assert bucketed == in_session and bucketed
