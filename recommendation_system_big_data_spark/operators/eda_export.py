"""Plot-data export — the engine-side counterpart of the reference's EDA
charts (exploratory-data-analysis.py:96-142: seaborn histplot, top-20
value_counts barplot, df.corr() heatmap).

The reference renders on the driver from pandas; at 100 TB the correct
split is: the CLUSTER computes the plot-ready series (bins, bars, matrix
cells — each a bounded-size aggregate), and whatever renders — notebook,
BI tool, matplotlib — consumes a few hundred rows. This module computes
exactly the series those three charts draw, as one oracle-checked query,
renders real standalone SVG figures with zero dependencies
(render_eda_svgs — works in this container, tested), and renders PNGs
only if a plotting stack exists (render_eda_pngs stays an honest
import-try stub here — the same policy as the multimodal codec,
multimodal.py:43)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.functions.safe_stats import (
    guarded_pearson_sql,
)
from recommendation_system_big_data_spark.operators.profile import hist_bucket
from recommendation_system_big_data_spark.registry import register

#: r13 degenerate hardening: builtin CORR raises under ANSI on a
#: zero-variance column (no outer CASE can stop an aggregate-internal
#: division) — both engines run the same guarded sums-based fragment.
_CORR_QP = guarded_pearson_sql("l_quantity", "l_extendedprice")
_CORR_PD = guarded_pearson_sql("l_extendedprice", "l_discount")
_CORR_QD = guarded_pearson_sql("l_quantity", "l_discount")

_PLOT_SERIES_ORACLE = """
WITH hist AS (
    SELECT 'hist_totalprice' AS series,
           CAST(LEAST(CAST(FLOOR((o_totalprice - 1013.7)
                                 / ((499978.59 - 1013.7) / 20)) AS BIGINT),
                      19) AS VARCHAR) AS x,
           CAST(COUNT(*) AS DOUBLE) AS y
    FROM orders
    GROUP BY 2
), bars AS (
    SELECT 'top_brands' AS series, p_brand AS x, CAST(COUNT(*) AS DOUBLE) AS y
    FROM part GROUP BY p_brand
    ORDER BY COUNT(*) DESC, p_brand ASC LIMIT 20
), corr_cells AS (
    SELECT 'corr' AS series, 'l_quantity__l_extendedprice' AS x,
           {corr_qty_price} AS y FROM lineitem
    UNION ALL
    SELECT 'corr', 'l_extendedprice__l_discount',
           {corr_price_disc} FROM lineitem
    UNION ALL
    SELECT 'corr', 'l_quantity__l_discount',
           {corr_qty_disc} FROM lineitem
)
SELECT * FROM hist
UNION ALL SELECT * FROM bars
UNION ALL SELECT * FROM corr_cells
""".format(
    corr_qty_price=_CORR_QP,
    corr_price_disc=_CORR_PD,
    corr_qty_disc=_CORR_QD,
)

@register("eda_plot_series", oracle=_PLOT_SERIES_ORACLE, tags=("profile", "eda"))
def eda_plot_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three chart-ready series of the reference's EDA figures in long
    form (series, x, y): 20 histogram bins of order value, the top-20
    brand bars, and the numeric correlation cells. Three bounded
    aggregates unioned — the whole result is O(bins + bars + pairs) rows
    whatever the input size, which is what makes cluster-side EDA viable
    at 100 TB (the reference's toPandas-then-plot would ship the table)."""
    hist = (
        load(spark, sf_dir, "orders")
        .groupBy(hist_bucket(F.col("o_totalprice")).cast("string").alias("x"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .select(F.lit("hist_totalprice").alias("series"), "x", "y")
    )
    bars = (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_brand").alias("x"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("x"))
        .limit(20)
        .select(
            F.lit("top_brands").alias("series"), "x", F.col("n").cast("double").alias("y")
        )
    )
    li = load(spark, sf_dir, "lineitem")
    corr_cells = li.agg(
        F.expr(_CORR_QP).alias("l_quantity__l_extendedprice"),
        F.expr(_CORR_PD).alias("l_extendedprice__l_discount"),
        F.expr(_CORR_QD).alias("l_quantity__l_discount"),
    ).select(
        F.explode(
            F.create_map(
                F.lit("l_quantity__l_extendedprice"),
                F.col("l_quantity__l_extendedprice"),
                F.lit("l_extendedprice__l_discount"),
                F.col("l_extendedprice__l_discount"),
                F.lit("l_quantity__l_discount"),
                F.col("l_quantity__l_discount"),
            )
        ).alias("x", "y")
    ).select(F.lit("corr").alias("series"), "x", "y")
    return hist.unionByName(bars).unionByName(corr_cells)


def render_eda_pngs(series_pdf, out_dir: str) -> list[str]:
    """Render the three figures from a collected eda_plot_series pandas
    frame. Requires matplotlib, which this container does not ship — the
    data path above is complete and oracle-checked either way (same
    stub policy as the multimodal codec)."""
    try:
        import matplotlib  # noqa: F401
        import matplotlib.pyplot as plt
    except ImportError as exc:  # pragma: no cover - container has no mpl
        raise NotImplementedError(
            "matplotlib not available in this container; eda_plot_series "
            "provides the chart-ready data for any external renderer"
        ) from exc
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name in ("hist_totalprice", "top_brands", "corr"):
        sub = series_pdf[series_pdf["series"] == name]
        fig, ax = plt.subplots()
        ax.bar(sub["x"], sub["y"])
        ax.set_title(name)
        path = os.path.join(out_dir, f"{name}.png")
        fig.savefig(path)
        plt.close(fig)
        written.append(path)
    return written


def render_eda_svgs(series_pdf, out_dir: str) -> list[str]:
    """Render the three figures as standalone SVG files with NO plotting
    dependency — pure string assembly over the collected chart series,
    so the repo renders real figures in this container (closing the
    reference's exploratory-data-analysis.py:96-142 rendering parity
    honestly; render_eda_pngs remains the matplotlib path for
    environments that ship it). Bar charts with a zero baseline (the
    corr series has negative cells), value-scaled heights, and x labels
    under each bar. Input is a few hundred rows of bounded aggregate —
    rendering is driver-side by design, exactly like any BI consumer."""
    from xml.sax.saxutils import escape

    os.makedirs(out_dir, exist_ok=True)
    width, height, m_left, m_bottom, m_top = 640, 400, 40, 60, 30
    plot_w, plot_h = width - m_left - 10, height - m_top - m_bottom
    written = []
    for name in ("hist_totalprice", "top_brands", "corr"):
        sub = series_pdf[series_pdf["series"] == name]
        xs = list(sub["x"])
        ys = [float(v) for v in sub["y"]]
        if not ys:
            continue
        y_lo, y_hi = min(0.0, min(ys)), max(0.0, max(ys))
        span = (y_hi - y_lo) or 1.0
        to_py = lambda v: m_top + (y_hi - v) / span * plot_h
        bar_w = plot_w / max(len(ys), 1)
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}">',
            f'<text x="{width / 2}" y="18" text-anchor="middle" '
            f'font-size="14" font-family="sans-serif">{escape(str(name))}</text>',
            f'<line x1="{m_left}" y1="{to_py(0.0)}" x2="{width - 10}" '
            f'y2="{to_py(0.0)}" stroke="#333" stroke-width="1"/>',
        ]
        for i, (x, y) in enumerate(zip(xs, ys)):
            x0 = m_left + i * bar_w
            y_top, y_zero = to_py(max(y, 0.0)), to_py(min(y, 0.0))
            parts.append(
                f'<rect x="{x0 + 1:.2f}" y="{y_top:.2f}" '
                f'width="{bar_w - 2:.2f}" '
                f'height="{max(y_zero - y_top, 0.5):.2f}" fill="#4878a8"/>'
            )
            parts.append(
                f'<text x="{x0 + bar_w / 2:.2f}" y="{height - m_bottom + 14}" '
                f'text-anchor="end" font-size="8" font-family="sans-serif" '
                f'transform="rotate(-45 {x0 + bar_w / 2:.2f} '
                f'{height - m_bottom + 14})">{escape(str(x))}</text>'
            )
        parts.append("</svg>")
        path = os.path.join(out_dir, f"{name}.svg")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        written.append(path)
    return written
