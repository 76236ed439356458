"""Action-surface parity (SURVEY.md §2.1 ops #5 collect, #8 show, plus the
EDA schema-introspection calls §1.3): trivial by construction, asserted so
the inventory row is exercised, not assumed."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from recommendation_system_big_data_spark.catalog import load


def test_collect_materializes_rows(spark, sf_dir):
    rows = load(spark, sf_dir, "region").collect()  # op #5, model-als.py:134
    assert len(rows) == 5
    assert {r["r_name"] for r in rows} == {
        "AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"
    }


def test_show_renders_table(spark, sf_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        # op #8, exploratory-data-analysis.py:168 `show(5, truncate=False)`
        load(spark, sf_dir, "nation").show(5, truncate=False)
    out = buf.getvalue()
    assert "n_nationkey" in out and out.count("\n") >= 7


def test_schema_introspection_calls(spark, sf_dir):
    df = load(spark, sf_dir, "orders")
    assert "o_orderkey" in df.columns  # exploratory-data-analysis.py:154
    assert dict(df.dtypes)["o_totalprice"] == "double"  # :175
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.printSchema()  # :169
    assert "o_orderpriority" in buf.getvalue()


def test_observe_metrics_piggyback_on_action(spark, sf_dir):
    """df.observe attaches accumulator-style metrics to a real action — row
    counts and sums arrive with the job, no second scan. The operational
    pattern for pipeline health checks at 100 TB (counting a 100 TB input
    twice to log progress doubles the bill)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("orders_health")
    df = load(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    n = df.count()
    assert obs.get["n_rows"] == n
    assert obs.get["total"] > 0
