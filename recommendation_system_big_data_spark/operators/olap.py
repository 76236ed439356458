"""Multi-level aggregation — ROLLUP, CUBE, GROUPING SETS.

The reference's EDA notebook computes per-level summaries with separate
pandas groupbys (exploratory-data-analysis.py:60-95, one pass per level);
the relational spelling is a single grouping-sets aggregate. Spark compiles
all three to ONE Expand + HashAggregate: the fact stream is scanned once,
each row fans out to its grouping-set combinations inside the map stage
(Expand), and one shuffle aggregates every level together — at 100 TB that
is strictly better than N per-level scans, and the fan-out factor is the
number of grouping sets, not the table size.

Determinism: `grouping_id()` disambiguates a rolled-up NULL from a data
NULL; both engines put the first grouping column in the most significant
bit. Money sums use the exact-decimal `dsum` convention (tpch.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load, maybe_broadcast
from recommendation_system_big_data_spark.queries.tpch import disc_price, dsum
from recommendation_system_big_data_spark.registry import register

_ROLLUP_ORACLE = """
SELECT r.r_name,
       n.n_name,
       GROUPING(r.r_name, n.n_name) AS gid,
       COUNT(c.c_custkey) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("agg_rollup_hierarchy", oracle=_ROLLUP_ORACLE, tags=("olap",))
def agg_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals region → nation → grand total in one pass.

    `rollup(a, b)` = GROUPING SETS ((a,b), (a), ()): per-nation rows,
    per-region subtotals, and the grand total from a single Expand(3×) +
    aggregate — no self-union of three groupBys, no re-scan per level.
    The two dimension joins are broadcast (size-gated)."""
    cust = load(spark, sf_dir, "customer")
    nat = maybe_broadcast(load(spark, sf_dir, "nation"), sf_dir, "nation")
    reg = maybe_broadcast(load(spark, sf_dir, "region"), sf_dir, "region")
    j = cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"]).join(
        reg, nat["n_regionkey"] == reg["r_regionkey"]
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("c_custkey").alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        )
        .select("r_name", "n_name", "gid", "n_customers", "sum_acctbal")
    )


_CUBE_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("agg_cube_revenue", oracle=_CUBE_ORACLE, tags=("olap",))
def agg_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping sets — both
    margins, the cross table, and the grand total — in one Expand(4×) +
    aggregate over a single fact scan. Group cardinality is the product of
    the two domains (~12), so the post-Expand shuffle is tiny regardless of
    fact size; the Expand fan-out happens after column pruning, so each
    duplicated row carries only the 4 needed columns."""
    # The discounted-price decimal multiply is projected BEFORE the cube:
    # Expand replicates each row 4×, and an agg-input expression would be
    # evaluated on the expanded stream — pre-computing it does the decimal
    # math once per source row instead of once per (row × grouping set).
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", disc_price().alias("dp")
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("dp").cast("decimal(22,4)"))
            .cast("double")
            .alias("sum_disc_price"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_items", "sum_disc_price")
    )


@register(
    "olap_skyline_pareto",
    oracle="""
    WITH best AS (
        SELECT p_size,
               MIN(ROW(p_retailprice, p_partkey)) AS r
        FROM part GROUP BY p_size
    ), cand AS (
        SELECT p_size, r[1] AS price, r[2] AS partkey
        FROM best
    ), sky AS (
        SELECT p_size, price, partkey,
               MIN(price) OVER (
                   ORDER BY p_size DESC, partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS best_price_bigger
        FROM cand
    )
    SELECT p_size AS size, price, CAST(partkey AS BIGINT) AS p_partkey
    FROM sky
    WHERE best_price_bigger IS NULL OR price < best_price_bigger
    """,
    tags=("olap",),
)
def olap_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-front query: the parts where no other part is both
    bigger AND cheaper (maximize size, minimize price) — the
    multi-objective shortlist ("best tradeoffs only") that a plain ORDER
    BY cannot express.

    Scalable 2-D skyline: first fold the fact set to ONE candidate per
    size (its cheapest part — anything else at that size is dominated
    a priori; min_by keeps the lowest partkey as the deterministic tie
    representative), then a single running-MIN sweep over sizes in
    DESCENDING order keeps a candidate iff it is strictly cheaper than
    every bigger size's best. The expensive step is the map-side-combined
    groupBy on size; the window runs on the |sizes| grain (bounded
    domain). Dominance in higher dimensions generalizes via the same
    fold + block-nested sweep per docstring references in SURVEY §2.6."""
    cand = (
        load(spark, sf_dir, "part")
        .groupBy(F.col("p_size").alias("size"))
        .agg(
            F.min(F.struct("p_retailprice", "p_partkey")).alias("r")
        )
        .select(
            "size",
            F.col("r.p_retailprice").alias("price"),
            F.col("r.p_partkey").cast("long").alias("p_partkey"),
        )
    )
    prior = Window.orderBy(F.desc("size"), F.asc("p_partkey")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky = cand.select(
        "size",
        "price",
        "p_partkey",
        F.min("price").over(prior).alias("best_price_bigger"),
    )
    return sky.where(
        F.col("best_price_bigger").isNull()
        | (F.col("price") < F.col("best_price_bigger"))
    ).select("size", "price", "p_partkey")
