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
