"""Relational core — SURVEY.md §2.1-2.9 operator inventory.

Each registered query re-expresses one operator the reference exercises
(citations inline) over the driver testdata, paired with a DuckDB oracle.
All queries are pure DataFrame-API plans: Catalyst handles pushdown,
pruning, join strategy, and top-k fusion (SURVEY.md §4); nothing here
collects to the driver or loops in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load, maybe_broadcast
from recommendation_system_big_data_spark.queries.tpch import davg, dsum
from recommendation_system_big_data_spark.registry import register

# ---------------------------------------------------------------------------
# §2.1 scans / sources (parquet + driver-local; CSV lives in sources/csv.py)
# ---------------------------------------------------------------------------


@register(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
    tags=("scan",),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan with filter+projection pushdown (op #3; reference CSV
    analogue model-als.py:56-67). `.explain` shows PushedFilters and a
    4-column ReadSchema — the scan never materializes the other 7 columns."""
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    )


@register(
    "from_local",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), 'URGENT'),
        (CAST(2 AS BIGINT), 'HIGH'),
        (CAST(3 AS BIGINT), 'MEDIUM'),
        (CAST(4 AS BIGINT), 'LOW'),
        (CAST(5 AS BIGINT), 'NONE')
    ) AS t(tier_id, tier_name)
    """,
    tags=("scan",),
)
def from_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame from a driver-local collection (op #4; model-als.py:131,139)."""
    rows = [(1, "URGENT"), (2, "HIGH"), (3, "MEDIUM"), (4, "LOW"), (5, "NONE")]
    return spark.createDataFrame(rows, ["tier_id", "tier_name"])


@register(
    "roundtrip_pandas",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    tags=("scan",),
)
def roundtrip_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow round-trip: DataFrame → pandas → DataFrame (ops #5-6;
    model-als.py:164-165). Arrow transfer is exact for int64/float64, so the
    values hash identically to the source table. Re-entering Spark through
    the ORIGINAL schema keeps the trip null-faithful: pandas stores a NULL
    double as NaN, and an inferred-schema createDataFrame would hand that
    NaN back as a value, not a NULL. Only valid for driver-fitting results —
    never on unbounded data (SURVEY.md §7.3)."""
    src = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    return spark.createDataFrame(src.toPandas(), schema=src.schema)


@register(
    "roundtrip_arrow",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("scan",),
)
def roundtrip_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Arrow round-trip: DataFrame → pyarrow.Table → DataFrame
    (Spark 4's toArrow / createDataFrame-from-Table). The zero-copy sibling
    of roundtrip_pandas — no pandas object conversion, no NaN/NULL
    ambiguity, and the Table carries its own schema so the return trip
    needs no re-pinning. The driver-materialization caveat is identical:
    results only, never unbounded data."""
    src = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return spark.createDataFrame(src.toArrow())


# ---------------------------------------------------------------------------
# §2.2 projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "project_named",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    tags=("projection",),
)
def project_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection by name (op #9; model-als.py:142-143)."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "project_computed",
    oracle="""
    SELECT COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END)      AS o_orderkey,
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END)       AS o_custkey,
           COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END)   AS o_orderstatus,
           COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END)    AS o_totalprice,
           COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END)     AS o_orderdate,
           COUNT(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS o_orderpriority
    FROM orders
    """,
    tags=("projection",),
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Programmatically-built projection: one conditional-count expression per
    column, exactly the EDA null-audit shape (op #10, #20;
    exploratory-data-analysis.py:146-154). One pass, one aggregate."""
    df = load(spark, sf_dir, "orders")
    return df.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in df.columns]
    )


@register(
    "rename_col",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("projection",),
)
def rename_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename a derived aggregate column (op #11; model-als.py:145)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(davg(F.col("l_quantity")).alias("avg_l_quantity"))
        .withColumnRenamed("avg_l_quantity", "avg_qty")
    )


@register(
    "drop_col",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("projection",),
)
def drop_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop the duplicate join key after an equi-join (op #12; model-als.py:148)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(maybe_broadcast(cust, sf_dir, "customer"), orders["o_custkey"] == cust["c_custkey"])
        .drop(cust["c_custkey"])
        .select("o_orderkey", "o_custkey", "c_name", "o_totalprice")
    )


@register(
    "filter_eq",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("filter",),
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter on a string column (op #13; model-als.py:150,155)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "filter_compound",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE lang LIKE '%e%' OR source LIKE '%0%' OR lang IS NULL OR source = ''
    """,
    tags=("filter",),
)
def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-chain compound predicate: contains | contains | isNull | == ''
    (op #14; exploratory-data-analysis.py:147-153)."""
    pred = (
        F.col("lang").contains("e")
        | F.col("source").contains("0")
        | F.col("lang").isNull()
        | (F.col("source") == "")
    )
    return load(spark, sf_dir, "documents").filter(pred).select("doc_id", "lang", "source")


@register(
    "alias_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net_price
    FROM lineitem
    """,
    tags=("projection",),
)
def alias_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias a computed expression (op #15; exploratory-data-analysis.py:153).
    Per-row decimal arithmetic — exact, no rounding needed."""
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(3,0)") - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("double")
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", net.alias("net_price")
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_left_dim",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def join_left_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join fact→dimension on differently-named keys, dimension
    broadcast (op #16; model-als.py:141-143). The reference's 17.5k-row anime
    dim is exactly this shape; at 100 TB the dim stays broadcast-able while
    the fact side never shuffles."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(maybe_broadcast(cust, sf_dir, "customer"), orders["o_custkey"] == cust["c_custkey"], "left")
        .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
    )


@register(
    "join_left_agg",
    oracle="""
    SELECT p_partkey, p_name, p_brand, avg_qty
    FROM part LEFT JOIN (
        SELECT l_partkey,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    ) ON p_partkey = l_partkey
    """,
    tags=("join",),
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join against a grouped-aggregate subplan, duplicate key dropped
    (op #17; model-als.py:145-148 — recs ⋈ avg_ratings)."""
    part = load(spark, sf_dir, "part")
    avg_qty = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(davg(F.col("l_quantity")).alias("avg_qty"))
    )
    return (
        part.join(avg_qty, part["p_partkey"] == avg_qty["l_partkey"], "left")
        .drop("l_partkey")
        .select("p_partkey", "p_name", "p_brand", "avg_qty")
    )


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 100000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (op #18; capability extension per SURVEY.md §2.3)."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    cust = load(spark, sf_dir, "customer")
    return orders.join(maybe_broadcast(cust, sf_dir, "customer"), orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with ≥1 urgent order (op #18). Semi joins
    never duplicate or widen rows — the scale-safe EXISTS."""
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, cust["c_custkey"] == urgent["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT'
                              AND year(o_orderdate) = 1995)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no URGENT order in 1995 (op #18).

    Keyed so the result is NON-EMPTY at test scale (1115 of 1500
    customers at sf0.01): the original "customers with no orders at
    all" matched the oracle only on the empty set — a vacuous green
    (VERDICT r13 "What's wrong" #1). The operator under test (left-anti
    hash join with the filter pushed to the build side) is unchanged."""
    cust = load(spark, sf_dir, "customer")
    urgent_95 = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.year("o_orderdate") == 1995)
    )
    return cust.join(
        urgent_95, cust["c_custkey"] == urgent_95["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.4 aggregations (profiling-flavored aggs live in operators/profile.py)
# ---------------------------------------------------------------------------


@register(
    "agg_avg_by_key",
    oracle="""
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value), 6) AS avg_value
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_avg_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by single key, mean of one measure (op #19; model-als.py:145 —
    the avg_ratings aggregate). Partial+final HashAggregate, one shuffle."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(davg(F.col("value")).alias("avg_value"))
    )


@register(
    "agg_count_rows",
    oracle="SELECT COUNT(*) AS n FROM lineitem",
    tags=("agg",),
)
def agg_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full row count as a 1-row DataFrame (op #21;
    exploratory-data-analysis.py:158,170-171 — computed once, not three times)."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts per group (SURVEY.md §2.4 note;
    at 100 TB prefer approx_count_distinct — see test_profile for the HLL
    variant, which is not oracle-hashable by design)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@register(
    "agg_topk_categories",
    oracle="""
    SELECT p_brand, COUNT(*) AS n FROM part
    GROUP BY p_brand ORDER BY n DESC, p_brand ASC LIMIT 20
    """,
    tags=("agg",),
)
def agg_topk_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent categorical values (op #23;
    exploratory-data-analysis.py:124 did this in pandas `value_counts` —
    here it is a distributed agg + TakeOrderedAndProject, no driver data)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(20)
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
           COALESCE(l_linestatus, '(all)') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP (SURVEY.md §2.4 'available natively')."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("(all)")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS orderstatus,
           COALESCE(o_orderpriority, '(all)') AS orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping-set combinations via CUBE (SURVEY.md §2.4)."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(dsum(F.col("o_totalprice")).alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("orderpriority"),
            "sum_price",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / limits
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5
    """,
    tags=("sort",),
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit → TakeOrderedAndProject, not a full sort
    (ops #27-28; model-als.py:151-158). The pandas re-sort the reference
    appends (model-als.py:167-171) is a no-op folded away (op #29)."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations / dedup / cleaning
# ---------------------------------------------------------------------------


@register(
    "union_pos",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000
    UNION ALL
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 150000
    """,
    tags=("setop",),
)
def union_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional UNION ALL retaining duplicates (op #30; model-als.py:107).
    unionByName is the engine's preferred spelling; positional kept for
    reference parity."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    a = orders.filter(F.col("o_totalprice") > 100000)
    b = orders.filter(F.col("o_totalprice") > 150000)
    return a.union(b)


@register(
    "dropna_after_join",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer JOIN orders ON c_custkey = o_custkey
    """,
    tags=("setop",),
)
def dropna_after_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """na.drop() over a null-producing LEFT join ≡ the inner join (op #31;
    model-als.py:107). The oracle states the algebraic identity."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .na.drop()
    )


@register(
    "dedup_subset",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM (
        SELECT event_id, user_id, event_type, value,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY event_id ASC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("dedup",),
)
def dedup_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key dedup with a deterministic keeper (op #32;
    model-als.py:109). dropDuplicates keeps an *arbitrary* row — fine for
    the reference, unverifiable for an oracle — so the engine's canonical
    dedup is row_number()=1 with an explicit tiebreaker (SURVEY.md §7.3)."""
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("event_id"))
    return (
        load(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("setop",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row DISTINCT (SURVEY.md §2.7 'native')."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations having both customers and
    suppliers (SURVEY.md §2.7)."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.intersect(supp)


@register(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): customers who ordered in 1995 but
    churned by 1996 (SURVEY.md §2.7).

    Keyed on overlapping-but-distinct year cohorts so the result is
    NON-EMPTY at test scale (261 rows at sf0.01) — the original
    "nations with no suppliers" matched the oracle only on the empty
    set (VERDICT r13 "What's wrong" #1). Same EXCEPT operator."""
    orders = load(spark, sf_dir, "orders")
    c95 = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    c96 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return c95.subtract(c96)


# ---------------------------------------------------------------------------
# §2.9 scalar functions
# ---------------------------------------------------------------------------


@register(
    "fn_contains",
    oracle="""
    SELECT doc_id,
           CAST(text LIKE '%spark%' AS BIGINT) AS has_spark,
           CAST(lang LIKE '%e%' AS BIGINT)     AS lang_has_e
    FROM documents
    """,
    tags=("scalar",),
)
def fn_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring containment (op #35; exploratory-data-analysis.py:147-151)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("text").contains("spark").cast("long").alias("has_spark"),
        F.col("lang").contains("e").cast("long").alias("lang_has_e"),
    )


@register(
    "fn_isnull_isnan",
    oracle="""
    SELECT event_id,
           CAST(value IS NULL AS BIGINT) AS value_is_null,
           CAST(isnan(value) AS BIGINT)  AS value_is_nan,
           CAST(props IS NULL AS BIGINT) AS props_is_null
    FROM events
    """,
    tags=("scalar",),
)
def fn_isnull_isnan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL and NaN tests (ops #36-37; exploratory-data-analysis.py:150-152)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.col("value").isNull().cast("long").alias("value_is_null"),
        F.isnan("value").cast("long").alias("value_is_nan"),
        F.col("props").isNull().cast("long").alias("props_is_null"),
    )


@register(
    "fn_when_case",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS value_band,
           CAST(event_type = 'purchase' AS BIGINT) AS is_purchase
    FROM events
    """,
    tags=("scalar",),
)
def fn_when_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression + equality-vs-literal (ops #38-39;
    exploratory-data-analysis.py:147, model-als.py:150)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("value_band"),
        (F.col("event_type") == "purchase").cast("long").alias("is_purchase"),
    )


# ---------------------------------------------------------------------------
# §2.11 nested-data unnesting (the reference's collect-loop antipattern fixed)
# ---------------------------------------------------------------------------


@register(
    "unnest_recs",
    oracle="SELECT o_custkey, o_orderkey, o_totalprice FROM orders",
    tags=("nested",),
)
def unnest_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY<STRUCT> build + explode, one plan end-to-end (op #44).

    The reference collects the nested ALS output to the driver and unnests
    with a Python loop (model-als.py:134-139) — a plan break Catalyst cannot
    see across. The engine's form nests with collect_list(struct(...)) and
    flattens with explode; the oracle states the round-trip identity."""
    nested = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.collect_list(F.struct("o_orderkey", "o_totalprice")).alias("recs"))
    )
    flat = nested.select("o_custkey", F.explode("recs").alias("rec"))
    return flat.select(
        "o_custkey",
        F.col("rec.o_orderkey").alias("o_orderkey"),
        F.col("rec.o_totalprice").alias("o_totalprice"),
    )


@register(
    "fn_split_explode",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
    GROUP BY word ORDER BY n DESC, word ASC LIMIT 10
    """,
    tags=("scalar", "nested"),
)
def fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode over a delimited multi-value string (SURVEY.md §2.9
    extension row — the reference's comma-separated `Genres` string,
    model-als.py:22, is exactly this shape)."""
    return (
        load(spark, sf_dir, "part")
        .select(F.explode(F.split("p_type", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(10)
    )


@register("agg_approx_count_distinct", oracle=None, tags=("agg",))
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct counts (⊘ approximate by construction — the
    100 TB spelling of COUNT(DISTINCT); the exact variant is
    agg_count_distinct). rsd=0.01 keeps the estimate within ~1%; the pytest
    gate checks it against the exact count."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@register(
    "fn_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_upper,
           trim(source) AS source_trim,
           regexp_replace(lang, '[aeiou]', '_', 'g') AS lang_masked,
           substring(source, 1, 3) AS source_prefix,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_key
    FROM documents
    """,
    tags=("scalar",),
)
def fn_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface: case, trim, regexp_replace, substring, pad
    (SURVEY.md §2.9 — all JVM built-ins, zero Python)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.upper("lang").alias("lang_upper"),
        F.trim("source").alias("source_trim"),
        F.regexp_replace("lang", "[aeiou]", "_").alias("lang_masked"),
        F.substring("source", 1, 3).alias("source_prefix"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("doc_key"),
    )


@register(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)) AS BIGINT) AS n_positive,
           CAST(len(list_filter(CAST(embedding AS DOUBLE[]), x -> abs(x) > 1.5)) > 0 AS BIGINT) AS has_large,
           ROUND(list_aggregate(CAST(embedding[1:8] AS DOUBLE[]), 'sum'), 6) AS head_sum
    FROM embeddings
    """,
    tags=("scalar", "nested"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: size, filter, exists, slice+aggregate
    fold (SURVEY.md §2.9 extension; the similarity operators build on the
    same primitives in functions/vectors.py)."""
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.exists(v, lambda x: F.abs(x) > 1.5).cast("long").alias("has_large"),
        F.round(
            F.aggregate(F.slice(v, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("head_sum"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END)    AS click,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END)    AS error,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END)   AS signup,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS view
    FROM events GROUP BY user_id
    """,
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) on an explicit value list — per-user event-type
    matrix. The value list is pinned so the plan is ONE aggregate pass
    (unpinned pivot runs an extra distinct-values job, an avoidable full
    scan at 100 TB)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "clean_fill_replace",
    oracle="""
    SELECT c_custkey,
           c_name,
           COALESCE(o_orderkey, -1) AS o_orderkey,
           COALESCE(o_totalprice, 0.0) AS o_totalprice,
           CASE WHEN COALESCE(o_orderpriority, 'NONE') = '5-LOW'
                THEN 'LOW' ELSE COALESCE(o_orderpriority, 'NONE') END AS priority
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
    tags=("setop", "cleaning"),
)
def clean_fill_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """na.fill + na.replace — the constructive side of the reference's
    cleaning pass (model-als.py:107 drops; a training pipeline usually
    imputes instead). Typed defaults per column, then a value rewrite."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "o_orderpriority")
        .na.fill({"o_orderkey": -1, "o_totalprice": 0.0, "o_orderpriority": "NONE"})
        .replace("5-LOW", "LOW", subset=["o_orderpriority"])
        .withColumnRenamed("o_orderpriority", "priority")
    )


@register(
    "schema_introspection",
    oracle="""
    SELECT * FROM (VALUES
        ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
        ('o_orderstatus', 'string'), ('o_totalprice', 'double'),
        ('o_orderdate', 'timestamp_ntz'), ('o_orderpriority', 'string')
    ) AS t(col_name, dtype)
    """,
    tags=("introspection",),
)
def schema_introspection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-as-data: df.dtypes surfaced as rows (SURVEY.md §1.3 — the EDA
    pipeline's printSchema/dtypes/columns surface, exploratory-data-
    analysis.py:169-191). The oracle pins the expected driver-testdata
    schema, so this doubles as a schema-drift tripwire."""
    df = load(spark, sf_dir, "orders")
    return spark.createDataFrame(df.dtypes, ["col_name", "dtype"])


@register(
    "fn_explode_outer",
    oracle="""
    SELECT doc_id, u.long_tok
    FROM (
        SELECT doc_id,
               CASE WHEN len(list_filter(string_split(text, ' '), x -> len(x) > 9)) = 0
                    THEN [NULL]
                    ELSE list_filter(string_split(text, ' '), x -> len(x) > 9)
               END AS toks
        FROM documents
    ), unnest(toks) AS u(long_tok)
    """,
    tags=("scalar", "nested"),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: null-preserving unnest — documents whose filtered
    token array is EMPTY still emit one (doc_id, NULL) row, so an outer
    explode never silently drops parent rows (the LEFT JOIN semantics of
    unnest; a plain explode is the inner join). The oracle spells the same
    semantics via CASE-to-[NULL]."""
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 9)
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.explode_outer(toks).alias("long_tok"))
    )


@register(
    "fn_map_ops",
    oracle="""
    SELECT doc_id,
           lang   AS lang_tag,
           source AS source_tag,
           2      AS n_tags,
           (lang IS NOT NULL) AS has_lang
    FROM documents
    """,
    tags=("scalar", "nested"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map from entries, extract by key, inspect
    cardinality and key membership — the tag/properties-column shape of a
    metadata table. The oracle verifies the extracted VALUES (DuckDB's MAP
    type doesn't hash-compare across engines, so the map itself never
    reaches the output schema — extraction happens Spark-side)."""
    tags = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    d = load(spark, sf_dir, "documents").select("doc_id", tags.alias("tags"))
    return d.select(
        "doc_id",
        F.element_at("tags", "lang").alias("lang_tag"),
        F.element_at("tags", "source").alias("source_tag"),
        F.size("tags").alias("n_tags"),
        F.array_contains(F.map_keys("tags"), "lang").alias("has_lang"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(o_custkey, c_custkey) AS custkey,
           n_orders,
           c_name
    FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) a
    FULL OUTER JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-customer order counts against the customer dim —
    customers with no orders surface with NULL n_orders (the right-side
    preservation), and any orphan order keys would surface with NULL c_name
    (left-side). Full outer cannot broadcast (both sides must be preserved),
    so the plan is the shuffle join AQE picks; keys are uniform."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    agg = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        agg.join(cust, agg["o_custkey"] == cust["c_custkey"], "full_outer")
        .select(
            F.coalesce(agg["o_custkey"], cust["c_custkey"]).alias("custkey"),
            "n_orders",
            "c_name",
        )
    )


@register(
    "agg_median_mode",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, ROUND(median(l_quantity), 6) AS median_qty
        FROM lineitem GROUP BY l_returnflag
    ), counts AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ), modal AS (
        SELECT l_returnflag, l_quantity AS mode_qty,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY n DESC, l_quantity ASC) AS rn
        FROM counts
    )
    SELECT med.l_returnflag, med.median_qty, modal.mode_qty
    FROM med JOIN modal ON med.l_returnflag = modal.l_returnflag AND modal.rn = 1
    """,
    tags=("agg",),
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (exact interpolated, = quantile_cont 0.5) and mode per group.
    The mode is computed as count-then-rank with an explicit value tiebreak
    rather than F.mode, whose tie resolution is engine-defined — the
    deterministic spelling is also the scalable one (combiner-friendly
    count, then a tiny per-group rank)."""
    li = load(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty")
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.desc("n"), F.asc("l_quantity"))
    modal = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    return med.join(modal, "l_returnflag")


@register(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority AS priority,
           o_totalprice    AS price,
           (o_totalprice > 300000) AS is_big
    FROM orders
    """,
    tags=("scalar", "nested"),
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: build a nested struct column, access fields via
    dotted paths, star-expand a sub-struct back to columns — the
    carry-a-record-through-the-pipeline shape. The oracle verifies the
    re-flattened values (struct construction + field access must be
    lossless)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("priority"),
            F.struct(
                F.col("o_totalprice").alias("price"),
                (F.col("o_totalprice") > 300000).alias("is_big"),
            ).alias("money"),
        ).alias("rec"),
    )
    return o.select(
        "o_orderkey",
        F.col("rec.priority").alias("priority"),
        F.col("rec.money.price").alias("price"),
        F.col("rec.money.is_big").alias("is_big"),
    )


@register(
    "fn_regexp_extract",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^(\\w+) (\\w+)', 1) AS type_head,
           regexp_extract(p_type, '(\\w+)$', 1)         AS type_tail,
           CAST(regexp_matches(p_name, 'a.*e') AS BIGINT) AS name_has_ae
    FROM part
    """,
    tags=("scalar",),
)
def fn_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction + boolean match (rlike) — the log-parsing /
    field-carving scalar surface. Pure codegen'd string ops, no UDF."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract(F.col("p_type"), r"^(\w+) (\w+)", 1).alias("type_head"),
        F.regexp_extract(F.col("p_type"), r"(\w+)$", 1).alias("type_tail"),
        F.col("p_name").rlike("a.*e").cast("long").alias("name_has_ae"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           CAST(len(list(DISTINCT l_linestatus)) AS INT) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "nested"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set into a SORTED array — collection aggregates are
    set-semantics (arrival order is partitioning-dependent), so any
    oracle-comparable or downstream-joinable use must canonicalize with
    array_sort. The distinct set is tiny per group (bounded domain), so the
    combiner ships sets, not rows."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.array_sort(F.collect_set("l_linestatus")).alias("statuses_arr"))
        .select(
            "l_returnflag",
            F.array_join("statuses_arr", ",").alias("statuses"),
            F.size("statuses_arr").alias("n_statuses"),
        )
    )


@register(
    "stat_crosstab",
    oracle="""
    SELECT l_returnflag AS l_returnflag_l_linestatus,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stat"),
)
def stat_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.stat.crosstab — the contingency-table helper (pairwise frequency
    of two categoricals). Same plan class as groupBy().pivot() with a
    count aggregate: one shuffle on the row key, columns from the (bounded)
    value domain."""
    ct = load(spark, sf_dir, "lineitem").stat.crosstab("l_returnflag", "l_linestatus")
    # crosstab derives its columns from OBSERVED values — a corpus where a
    # status never occurs simply lacks that column, while the oracle's
    # fixed conditional counts emit 0. Pin the declared bounded domain
    # with a 0 fallback (r13 tiny-fixture probe finding).
    cols = set(ct.columns)
    f_col = (F.col("F") if "F" in cols else F.lit(0)).cast("long")
    o_col = (F.col("O") if "O" in cols else F.lit(0)).cast("long")
    return ct.select(
        "l_returnflag_l_linestatus",
        f_col.alias("F"),
        o_col.alias("O"),
    )


@register(
    "fn_null_safe_eq",
    oracle="""
    SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
    FROM documents d1 JOIN documents d2
      ON d1.lang IS NOT DISTINCT FROM d2.lang
     AND d1.doc_id < d2.doc_id AND d1.doc_id < 20 AND d2.doc_id < 20
    """,
    tags=("join", "scalar"),
)
def fn_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each OTHER instead of matching nothing — the semantics needed when NULL
    is a legitimate category value (unknown language still groups with
    unknown language). Catalyst plans <=> as a hash-join key, unlike an
    `a = b OR (a IS NULL AND b IS NULL)` spelling, which degenerates to a
    nested-loop."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"))
    return (
        a.join(b, a["lang_a"].eqNullSafe(b["lang_b"]) & (a["doc_a"] < b["doc_b"]))
        .select("doc_a", "doc_b")
    )


@register(
    "union_by_name_missing",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT s_suppkey, s_name, NULL
    FROM supplier WHERE s_suppkey <= 100
    """,
    tags=("set",),
)
def union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): schema-mediated union of
    heterogeneous sources — the supplier side has no balance column and gets
    NULLs, by NAME, not by position (a positional union would silently pair
    the wrong columns the moment one side reorders)."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
        )
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 100)
        .select(
            F.col("s_suppkey").alias("custkey"),
            F.col("s_name").alias("name"),
        )
    )
    return cust.unionByName(supp, allowMissingColumns=True)


_PROVENANCE_ORACLE = """
SELECT 'events.parquet' AS file_name, COUNT(*) AS n
FROM events
"""


@register("scan_file_provenance", oracle=_PROVENANCE_ORACLE, tags=("scan",))
def scan_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance via the hidden `_metadata` struct — which
    physical file produced each row (file_name/file_path/row_index). The
    bookkeeping every audited training-data pipeline must carry: a bad
    shard gets traced and excised by provenance, not by value forensics.
    Zero-cost column (populated from split metadata, no extra IO); here
    rolled up to per-file row counts."""
    return (
        load(spark, sf_dir, "events")
        .select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_NULLS_ORDER_ORACLE = """
WITH nulled AS (
    SELECT o_orderkey,
           CASE WHEN o_custkey % 97 = 0 THEN NULL ELSE o_custkey END
               AS maybe_cust
    FROM orders
)
SELECT o_orderkey, maybe_cust,
       CAST(maybe_cust IS NULL AS BIGINT) AS is_null
FROM nulled
ORDER BY maybe_cust DESC NULLS FIRST, o_orderkey ASC
LIMIT 200
"""


@register("sort_nulls_ordering", oracle=_NULLS_ORDER_ORACLE, tags=("sort",))
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ordering — the silent cross-engine trap
    this query pins: Spark's default puts NULLs FIRST on ascending (LAST
    on descending), DuckDB/Postgres default NULLS LAST on ascending (FIRST
    on descending). Any top-k over a nullable ranking column silently
    returns different rows per engine unless the placement is spelled out
    — so this engine's rule is: orderings over nullable keys ALWAYS carry
    desc_nulls_first/asc_nulls_last explicitly (here DESC NULLS FIRST on
    a synthetically-nulled key, exercising the non-default corner on both
    engines).

    sort+limit compiles to TakeOrderedAndProject (per-partition top-k +
    driver merge of k·P rows) — never a global sort. NULL rows order among
    themselves by the o_orderkey tiebreaker, keeping the result
    hash-stable."""
    nulled = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_custkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("maybe_cust"),
    )
    return (
        nulled.select(
            "o_orderkey",
            "maybe_cust",
            F.col("maybe_cust").isNull().cast("long").alias("is_null"),
        )
        .orderBy(F.desc_nulls_first("maybe_cust"), F.asc("o_orderkey"))
        .limit(200)
    )


_BOOL_AGG_ORACLE = """
SELECT l_returnflag AS rf,
       BOOL_AND(l_quantity > 0)      AS all_qty_positive,
       BOOL_OR(l_discount > 0.09)    AS any_deep_discount,
       BOOL_AND(l_tax < 0.09)        AS all_low_tax,
       CAST(COUNT(*) AS BIGINT)      AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("fn_bool_agg", oracle=_BOOL_AGG_ORACLE, tags=("fn", "agg"))
def fn_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates — `every`/`any` (BOOL_AND/BOOL_OR): the
    assertion layer of data quality ("ALL quantities positive?", "ANY
    discount past the alert line?") as first-class aggregates rather than
    COUNT(CASE...)=COUNT(*) circumlocutions. Both short-circuit at the
    partial-aggregate level (a partition that has seen a false needs no
    more input for AND), so they're the cheapest possible full-table
    invariant check — one map-side-combined groupBy, booleans in the
    shuffle."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.every(F.col("l_quantity") > 0).alias("all_qty_positive"),
        F.some(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.every(F.col("l_tax") < 0.09).alias("all_low_tax"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


_CALENDAR_ORACLE = """
WITH bounds AS (
    SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
           CAST(MAX(o_orderdate) AS DATE) AS mx
    FROM orders
), spine AS (
    SELECT UNNEST(generate_series(bounds.mn, bounds.mx, INTERVAL 1 DAY))::DATE
               AS d
    FROM bounds
)
SELECT d AS date,
       CAST(EXTRACT(year FROM d) AS INT) AS year,
       CAST(EXTRACT(quarter FROM d) AS INT) AS quarter,
       CAST(EXTRACT(month FROM d) AS INT) AS month,
       CAST(dayofweek(d) + 1 AS INT) AS dow,
       CAST(isodow(d) IN (6, 7) AS BOOLEAN) AS is_weekend,
       CAST(EXTRACT(day FROM d) = 1 AS BOOLEAN) AS is_month_start,
       CAST(d = last_day(d) AS BOOLEAN) AS is_month_end,
       CAST(EXTRACT(doy FROM d) AS INT) AS day_of_year
FROM spine
"""


@register("dim_calendar_build", oracle=_CALENDAR_ORACLE, tags=("fn", "dim"))
def dim_calendar_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generator: a dense date spine spanning the fact
    table's observed range, with the derived attributes every warehouse
    date dimension carries (year/quarter/month, day-of-week, weekend and
    month-boundary flags, day-of-year) — the join target that turns
    "group by date_trunc" SQL into conformed-dimension star queries, and
    the spine `ts_gapfill_ffill` densifies against.

    The spine generates DISTRIBUTIVELY — sequence() between the observed
    min/max (a 1-row broadcast) exploded into rows, never a driver loop;
    attributes are narrow codegen'd expressions. A decade is ~3.7k rows:
    always broadcastable, so at 100 TB this dimension costs nothing and
    every calendar flag comes off the dim, not a per-row recompute over
    the fact table."""
    bounds = load(spark, sf_dir, "orders").agg(
        F.min(F.to_date("o_orderdate")).alias("mn"),
        F.max(F.to_date("o_orderdate")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d")
    )
    return spine.select(
        F.col("d").alias("date"),
        F.year("d").cast("int").alias("year"),
        F.quarter("d").cast("int").alias("quarter"),
        F.month("d").cast("int").alias("month"),
        F.dayofweek("d").cast("int").alias("dow"),
        F.expr("weekday(d) IN (5, 6)").alias("is_weekend"),
        (F.dayofmonth("d") == 1).alias("is_month_start"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
        F.dayofyear("d").cast("int").alias("day_of_year"),
    )


_ROLE_PLAYING_ORACLE = """
WITH bounds AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS mn,
           MAX(CAST(o_orderdate AS DATE)) AS mx
    FROM orders
), li AS (
    SELECT o.o_orderdate, l.l_shipdate
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    CROSS JOIN bounds b
    WHERE CAST(l.l_shipdate AS DATE) BETWEEN b.mn AND b.mx
)
SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(CASE WHEN date_trunc('month', l_shipdate)
                            > date_trunc('month', o_orderdate)
                  THEN 1 END) AS BIGINT) AS shipped_next_month,
       CAST(COUNT(CASE WHEN isodow(CAST(l_shipdate AS DATE)) IN (6, 7)
                  THEN 1 END) AS BIGINT) AS weekend_ships
FROM li
GROUP BY 1
"""


@register("join_role_playing_calendar", oracle=_ROLE_PLAYING_ORACLE, tags=("join", "dim"))
def join_role_playing_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-playing dimension: the SAME calendar dim (dim_calendar_build)
    joined twice under two roles — order calendar and ship calendar — to
    answer cross-role questions ("how many lines slipped past the order
    month?", "what ships on weekends?"). The star-schema pattern where
    one conformed dimension serves every date column via aliased joins,
    instead of re-deriving calendar logic per fact column.

    Both calendar joins are broadcasts of the always-tiny dim (two
    aliased copies — Spark treats them as independent build sides); the
    fact side is joined once to orders (AQE's call) and scanned once.
    The oracle derives the same flags from calendar arithmetic directly,
    proving the dim's attributes match the inline computation. The inner
    calendar join scopes the report to ship dates INSIDE the calendar
    window (a tail of lines ships after the last order date; a dim join
    is also an implicit domain filter — pinned here, the classic silent
    row-loss of star joins)."""
    cal = dim_calendar_build(spark, sf_dir)
    order_cal = F.broadcast(
        cal.select(
            F.col("date").alias("od"),
            F.col("month").alias("order_month"),
            F.col("year").alias("order_year"),
        )
    )
    ship_cal = F.broadcast(
        cal.select(
            F.col("date").alias("sd"),
            F.col("month").alias("ship_month"),
            F.col("year").alias("ship_year"),
            F.col("is_weekend").alias("ship_weekend"),
        )
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.to_date("l_shipdate").alias("sd"))
        .join(
            load(spark, sf_dir, "orders").select(
                "o_orderkey", F.to_date("o_orderdate").alias("od")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(order_cal, "od")
        .join(ship_cal, "sd")
    )
    slipped = (F.col("ship_year") * 12 + F.col("ship_month")) > (
        F.col("order_year") * 12 + F.col("order_month")
    )
    return li.groupBy(F.col("order_month").cast("int").alias("order_month")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.count(F.when(slipped, 1)).cast("long").alias("shipped_next_month"),
        F.count(F.when(F.col("ship_weekend"), 1)).cast("long").alias(
            "weekend_ships"
        ),
    )


_BAG_SET_OPS_ORACLE = """
WITH a AS (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), b AS (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
), ea AS (
    SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b
), ia AS (
    SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b
)
SELECT
    CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_a,
    CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_b,
    CAST((SELECT COUNT(*) FROM ea) AS BIGINT) AS except_all_rows,
    CAST((SELECT COUNT(*) FROM ia) AS BIGINT) AS intersect_all_rows,
    CAST((SELECT COUNT(DISTINCT o_custkey) FROM ea) AS BIGINT)
        AS except_all_distinct
"""


@register("set_ops_bag_all", oracle=_BAG_SET_OPS_ORACLE, tags=("set",))
def set_ops_bag_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations — EXCEPT ALL / INTERSECT ALL
    (`exceptAll`/`intersectAll`): multiplicity-aware difference and
    intersection, where a key appearing 5× in A and 2× in B survives
    EXCEPT ALL 3 times — reconciliation semantics (ledger vs ledger)
    that the DISTINCT set ops (`set_except`/`set_intersect`) silently
    collapse. Spark plans both as a count-compare aggregate + generate
    (per-key min/difference of multiplicities), NOT an anti/semi join —
    one shuffle per side on the key, replication by arithmetic.

    Output folds both results to counts so the multiplicity arithmetic
    (n_a − intersect_all = except_all) is visible and hash-stable."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = o.where(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")
    ea = a.exceptAll(b)
    ia = a.intersectAll(b)
    return (
        a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
        .crossJoin(
            F.broadcast(b.agg(F.count(F.lit(1)).cast("long").alias("n_b")))
        )
        .crossJoin(
            F.broadcast(
                ea.agg(
                    F.count(F.lit(1)).cast("long").alias("except_all_rows"),
                    F.countDistinct("o_custkey")
                    .cast("long")
                    .alias("except_all_distinct"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ia.agg(
                    F.count(F.lit(1)).cast("long").alias("intersect_all_rows")
                )
            )
        )
        .select(
            "n_a", "n_b", "except_all_rows", "intersect_all_rows",
            "except_all_distinct",
        )
    )


_TRY_CAST_ORACLE = """
SELECT event_id,
       TRY_CAST(event_type AS BIGINT) AS bad_cast,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1)
           AS k_or_default
FROM events
"""


@register("fn_try_cast_json", oracle=_TRY_CAST_ORACLE, tags=("scalar", "json"))
def fn_try_cast_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast — the casting half of the ANSI escape hatch family
    (fn_try_arithmetic covers try_divide): with Spark 4 running ANSI SQL
    by default, a malformed cast THROWS and kills the job, so every cast
    over crawl-grade data goes through try_cast's NULL-and-continue.
    Exercises the always-fails shape (a word to BIGINT) and the
    load-bearing one — pulling a numeric field out of a JSON props
    string, where one junk row in a trillion must quarantine (NULL →
    COALESCE default), not abort the pipeline. Map-only, codegen'd, one
    scan."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("k_num"),
        F.coalesce(
            F.expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"),
            F.lit(-1),
        ).alias("k_or_default"),
    )
