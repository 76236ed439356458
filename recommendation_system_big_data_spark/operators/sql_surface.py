"""The spark.sql(...) string surface — SURVEY.md §3.3's optional entry
point (c). The reference never writes SQL strings; the engine exposes the
same plans through SQL text over registered temp views, including
backtick-quoted non-identifier column names (SURVEY.md §1.3) and
GROUPING SETS (which the DataFrame API only reaches via rollup/cube)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register one testdata table as a sf-scoped temp view; returns the
    view name (idempotent — re-registration replaces)."""
    vname = f"v_{name}"
    load(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


_SQL_FLAGSHIP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_order
FROM orders
GROUP BY o_orderpriority
"""


@register("sql_surface_agg", oracle=_SQL_FLAGSHIP_ORACLE, tags=("sql",))
def sql_surface_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A query authored as SQL text (spark.sql) over a registered view —
    identical Catalyst pipeline to the DataFrame form (SURVEY.md §3.3)."""
    v = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_order
        FROM {v}
        GROUP BY o_orderpriority
        """
    )


_GROUPING_SETS_ORACLE = """
SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
       COALESCE(l_linestatus, '(all)') AS linestatus,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS_ORACLE, tags=("sql", "agg"))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL surface (SURVEY.md §2.4 —
    rollup/cube's general form)."""
    v = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
               COALESCE(l_linestatus, '(all)') AS linestatus,
               COUNT(*) AS n
        FROM {v}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


_BACKTICK_ORACLE = """
SELECT doc_id AS "Doc ID", lang AS "Lang-Code", n_chars AS "Char Count"
FROM documents WHERE n_chars > 200
"""


@register("sql_backtick_names", oracle=_BACKTICK_ORACLE, tags=("sql",))
def sql_backtick_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-identifier column names (spaces, hyphens) through the SQL surface
    with backtick quoting — the reference's `English name` / `Score-10` /
    `On-Hold` convention (model-als.py:23-53, SURVEY.md §1.3)."""
    load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("Doc ID"),
        F.col("lang").alias("Lang-Code"),
        F.col("n_chars").alias("Char Count"),
    ).createOrReplaceTempView("v_docs_spaced")
    return spark.sql(
        'SELECT `Doc ID`, `Lang-Code`, `Char Count` FROM v_docs_spaced WHERE `Char Count` > 200'
    )
