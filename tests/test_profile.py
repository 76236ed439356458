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


def test_hll_sketch_merge_estimates_within_tolerance(spark, sf_dir):
    """Per-group HLL estimates and the merged-sketch ALL estimate must land
    within 5% of the exact distinct counts (standard error at default
    lgK=12 is ~1.6%, so 5% is a stable CI bound, not a tuned pass)."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.profile import (
        agg_hll_sketch_merge,
    )

    est = {r["scope"]: r["approx_distinct_customers"]
           for r in agg_hll_sketch_merge(spark, sf_dir).collect()}
    orders = load(spark, sf_dir, "orders")
    exact = {r["o_orderpriority"]: r["n"]
             for r in orders.groupBy("o_orderpriority")
             .agg(F.countDistinct("o_custkey").alias("n")).collect()}
    exact["ALL"] = orders.select("o_custkey").distinct().count()
    assert set(est) == set(exact)
    for scope, n in exact.items():
        assert abs(est[scope] - n) <= 0.05 * n, (scope, est[scope], n)


def test_freq_items_contains_true_frequent_values(spark, sf_dir):
    """Every value with true frequency ≥ support must appear (the KPS
    guarantee); all 5 priorities sit near 20% ≫ the 10% support."""
    from recommendation_system_big_data_spark.operators.profile import stat_freq_items

    row = stat_freq_items(spark, sf_dir).collect()[0]
    assert {"1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"} <= set(
        row["frequent_priorities"].split("|")
    )
    assert {"F", "O", "P"} <= set(row["frequent_statuses"].split("|"))


def test_eda_render_stub_raises_without_matplotlib(spark, sf_dir):
    """The data path is complete; rendering is honestly stubbed until a
    plotting stack exists (same policy as the multimodal codec)."""
    import pytest

    from recommendation_system_big_data_spark.operators.eda_export import (
        eda_plot_series,
        render_eda_pngs,
    )

    pdf = eda_plot_series(spark, sf_dir).toPandas()
    assert set(pdf["series"]) == {"hist_totalprice", "top_brands", "corr"}
    try:
        import matplotlib  # noqa: F401

        has_mpl = True
    except ImportError:
        has_mpl = False
    if not has_mpl:
        with pytest.raises(NotImplementedError):
            render_eda_pngs(pdf, "/tmp/eda_out")


def test_eda_svg_renderer_writes_real_figures(spark, sf_dir, tmp_path):
    """The dependency-free SVG path renders all three figures in THIS
    container: well-formed XML, one bar per series row, negative corr
    cells drawn below the zero baseline."""
    import xml.etree.ElementTree as ET

    from recommendation_system_big_data_spark.operators.eda_export import (
        eda_plot_series,
        render_eda_svgs,
    )

    pdf = eda_plot_series(spark, sf_dir).toPandas()
    paths = render_eda_svgs(pdf, str(tmp_path))
    assert len(paths) == 3
    for p in paths:
        root = ET.parse(p).getroot()
        assert root.tag.endswith("svg")
        name = p.rsplit("/", 1)[-1].removesuffix(".svg")
        n_bars = len(
            [e for e in root.iter() if e.tag.endswith("rect")]
        )
        assert n_bars == (pdf["series"] == name).sum()


def test_slope_pandas_and_builtin_twins_agree(spark, sf_dir):
    """The applyInPandas yardstick and its JVM twin must emit identical
    results cell-for-cell — the pair's whole point is pricing the Python
    boundary at PROVABLY equal semantics (both already hash-match the
    same DuckDB regr_slope oracle; this pins them to each other without
    an engine in between)."""
    from recommendation_system_big_data_spark.functions.pandas_fns import (
        agg_slope_builtin,
        grouped_pandas_slope,
    )

    a = {
        r["user_id"]: (r["n"], r["slope"])
        for r in grouped_pandas_slope(spark, sf_dir).collect()
    }
    b = {
        r["user_id"]: (r["n"], r["slope"])
        for r in agg_slope_builtin(spark, sf_dir).collect()
    }
    assert set(a) == set(b)
    mism = {
        u: (a[u], b[u])
        for u in a
        if a[u][0] != b[u][0]
        or (a[u][1] is None) != (b[u][1] is None)
        or (a[u][1] is not None and abs(a[u][1] - b[u][1]) > 1e-9)
    }
    assert not mism, list(mism.items())[:5]
