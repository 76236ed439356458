"""Profiling library functions beyond the oracle-registered queries: the
composite EDA report and the HLL-vs-exact distinct gate."""

from __future__ import annotations

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.operators.profile import profile_report
from recommendation_system_big_data_spark.operators.relational import (
    agg_approx_count_distinct,
)


def test_profile_report_composes_lazily(spark, sf_dir):
    rep = profile_report(
        load(spark, sf_dir, "lineitem"),
        numeric_cols=["l_quantity", "l_extendedprice"],
        topk_col="l_returnflag",
    )
    assert rep["n_columns"] == 11
    assert rep["counts"].collect()[0]["n_rows"] > 0
    missing = rep["missing"].collect()[0]
    assert missing["l_quantity"] == 0
    summary = {r["col_name"]: r for r in rep["summary"].collect()}
    assert set(summary) == {"l_quantity", "l_extendedprice"}
    assert summary["l_quantity"]["min_v"] <= summary["l_quantity"]["p50"] <= summary["l_quantity"]["max_v"]
    top = rep["top_categories"].collect()
    assert top and top[0]["n"] >= top[-1]["n"]


def test_approx_summary_tracks_exact(spark, sf_dir):
    """The scale path's GK percentiles must sit within a small relative
    error of the exact path; moments must agree exactly."""
    from recommendation_system_big_data_spark.operators.profile import (
        agg_summary,
        agg_summary_approx,
    )

    exact = {r["col_name"]: r for r in agg_summary(spark, sf_dir).collect()}
    approx = {r["col_name"]: r for r in agg_summary_approx(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for c, e in exact.items():
        a = approx[c]
        for m in ("n", "mean", "stddev", "min_v", "max_v"):
            assert a[m] == e[m], (c, m, a[m], e[m])
        spread = e["max_v"] - e["min_v"] or 1.0
        for p in ("p25", "p50", "p75"):
            assert abs(a[p] - e[p]) <= 0.01 * spread, (c, p, a[p], e[p])


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    for r in agg_approx_count_distinct(spark, sf_dir).collect():
        assert abs(r["approx_parts"] - r["exact_parts"]) <= max(
            3, 0.05 * r["exact_parts"]
        ), r
