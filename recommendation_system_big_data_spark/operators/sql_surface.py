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


_EXISTS_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
)
ORDER BY s_suppkey
"""


@register("sql_exists_subquery", oracle=_EXISTS_ORACLE, tags=("sql",))
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface. Catalyst rewrites the
    subquery to a LeftSemi join on the correlation key — the same plan the
    DataFrame left_semi form produces, so the fact side is scanned once
    with the quantity filter pushed down and no payload columns carried."""
    vs = _view(spark, sf_dir, "supplier")
    vl = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        SELECT s_suppkey, s_name
        FROM {vs} s
        WHERE EXISTS (
            SELECT 1 FROM {vl} l
            WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
        )
        ORDER BY s_suppkey
        """
    )


_SCALAR_SUBQ_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 50
"""


@register("sql_scalar_subquery", oracle=_SCALAR_SUBQ_ORACLE, tags=("sql",))
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate. Catalyst evaluates the
    1-row aggregate as its own tiny job and folds the result into the main
    scan's filter — the fact table is read once, not self-joined. (The
    1.9×avg comparison is float-benign: it gates a >2σ-ish tail, and row
    membership at the boundary would need a price within one ulp of
    exactly 1.9× the mean; the factor sits below max/avg in the quasi-uniform
    price distribution so the tail is non-empty at every test SF.)"""
    v = _view(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice
        FROM {v}
        WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM {v})
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 50
        """
    )


_LATERAL_ORACLE = """
SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 6) AS c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, c_acctbal FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name ASC
    LIMIT 3
) t
ORDER BY n.n_name ASC, c_acctbal DESC, t.c_name ASC
"""


@register("sql_lateral_topk", oracle=_LATERAL_ORACLE, tags=("sql",))
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join with ORDER BY + LIMIT — the SQL spelling of
    per-group top-k. Catalyst decorrelates the lateral subquery into a
    ranked window over the join (DecorrelateInnerQuery), so despite the
    per-nation phrasing this executes as ONE pass over customer with a
    rank filter — not |nation| probe queries. The deterministic tiebreak
    (c_acctbal DESC, c_name ASC) makes the LIMIT stable across engines."""
    vn = _view(spark, sf_dir, "nation")
    vc = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_name, ROUND(t.c_acctbal, 6) AS c_acctbal
        FROM {vn} n JOIN LATERAL (
            SELECT c_name, c_acctbal FROM {vc} c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name ASC
            LIMIT 3
        ) t
        ORDER BY n.n_name ASC, c_acctbal DESC, t.c_name ASC
        """
    )


_PARAM_SQL_ORACLE = """
SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > 9000 AND c_mktsegment = 'BUILDING'
"""


@register("sql_parameterized", oracle=_PARAM_SQL_ORACLE, tags=("sql",))
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized spark.sql — named markers bound server-side, the
    injection-safe way to template queries (string-formatting a user
    value into SQL is how warehouses get owned; parameter binding never
    re-parses the value as syntax). The markers bind as literals in the
    parsed plan, so Catalyst constant-folds and pushes them down exactly
    like hand-written constants."""
    v = _view(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
        FROM {v}
        WHERE c_acctbal > :min_bal AND c_mktsegment = :segment
        """,
        args={"min_bal": 9000, "segment": "BUILDING"},
    )


_RECURSIVE_REACH_ORACLE = """
WITH RECURSIVE capped AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               DENSE_RANK() OVER (
                   PARTITION BY l_orderkey ORDER BY l_partkey
               ) AS irk
        FROM lineitem
    ) WHERE irk <= 32
), edges AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), seed AS (
    SELECT MIN(l_partkey) AS node FROM capped
), reach(node, depth) AS (
    SELECT node, 0 FROM seed
    UNION ALL
    SELECT DISTINCT e.v, r.depth + 1
    FROM reach r JOIN edges e ON e.u = r.node
    WHERE r.depth < 2
)
SELECT CAST(min_depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM (SELECT node, MIN(depth) AS min_depth FROM reach GROUP BY node)
GROUP BY min_depth
"""


@register("sql_recursive_reachability", oracle=_RECURSIVE_REACH_ORACLE, tags=("sql", "graph"))
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4) — bounded-depth BFS over the co-purchase
    graph from the smallest part key: how many parts are 0, 1, and 2 hops
    away. The declarative spelling of the iterative traversals this engine
    otherwise drives from Python (PageRank's fixed loop, the connected-
    components fixpoint in dedup.py) — the recursion lives INSIDE one
    Catalyst plan, so the SQL surface now covers hierarchy/graph walks
    (org rollups, BOM explosions, referral chains) without a driver loop.

    The recursive leg is a per-iteration DISTINCT frontier expansion;
    depth is bounded at 2 because an unbounded walk of a dense
    co-purchase graph is the path-explosion anti-pattern — real
    deployments bound depth or iterate with a visited-set fixpoint
    (dedup_cluster_components for the unbounded case). Min-depth per
    node is taken AFTER the walk: UNION ALL + final MIN keeps both
    engines' recursion semantics identical rather than leaning on
    engine-specific cycle handling.

    The walk traverses the ORDER-ITEM INCIDENCE table directly (two
    equi-joins per step: frontier→items on part, items→items on order)
    instead of materializing the co-purchase edge list first. The edge
    list is O(Σ basket²) pairs and was the query's dominant cost
    (1.6s of 3.3s at sf0.1 — measured round 8; at 100 TB it's the
    difference between a full pair shuffle and per-step work
    proportional to frontier × order fanout). The capped incidence
    table is checkpointed BEFORE the recursive plan because a CTE
    referenced from the recursive leg is re-derived per frontier step
    (the round-6 lesson, still true on the incidence spelling — here
    it would recompute the dense_rank cap window 2× per step). The
    basket cap itself is kept: reachability is defined over the same
    capped co-purchase graph the oracle and the graph operators use.
    Seed note: dense_rank keeps each order's smallest partkey, so MIN
    over the capped set equals MIN over lineitem, which the seed leg
    computes in-plan (no driver scalar)."""
    from recommendation_system_big_data_spark.operators.graph import (
        _capped_items,
    )

    li = _capped_items(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ).localCheckpoint()
    li.createOrReplaceTempView("v_reach_items")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
WITH RECURSIVE seed AS (
    SELECT MIN(l_partkey) AS node FROM v_lineitem
), reach(node, depth) AS (
    SELECT node, 0 FROM seed
    UNION ALL
    SELECT DISTINCT i2.l_partkey, r.depth + 1
    FROM reach r
    JOIN v_reach_items i1 ON i1.l_partkey = r.node
    JOIN v_reach_items i2 ON i2.l_orderkey = i1.l_orderkey
                         AND i2.l_partkey != r.node
    WHERE r.depth < 2
)
SELECT CAST(min_depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM (SELECT node, MIN(depth) AS min_depth FROM reach GROUP BY node)
GROUP BY min_depth
"""
    )


_GROUP_BY_ALL_ORACLE = """
WITH agg AS (
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS revenue,
           ROUND(AVG(l_discount), 6) AS avg_discount
    FROM lineitem
    GROUP BY ALL
)
SELECT * EXCLUDE (avg_discount) FROM agg ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_GROUP_BY_ALL_ORACLE, tags=("sql",))
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL ergonomics in one statement: GROUP BY ALL (keys inferred
    from the non-aggregate select list), ORDER BY ALL, and star-EXCEPT
    projection — Spark 4 and DuckDB both speak all three, so analyst SQL
    written in either engine runs unchanged here. Semantically identical
    to spelling the keys out; Catalyst resolves ALL at analysis time, so
    the physical plan is the ordinary partial→final hash aggregate.

    (Spark spells column exclusion `* EXCEPT (...)`, DuckDB `* EXCLUDE
    (...)` — the one dialect seam, pinned here so downstream users know
    both.) The ORDER BY ALL total sort runs on the |rf|×|ls| aggregate
    (single digits), not the fact table."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba")
    return spark.sql(
        """
        WITH agg AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DOUBLE), 2) AS revenue,
                   ROUND(AVG(l_discount), 6) AS avg_discount
            FROM lineitem_gba
            GROUP BY ALL
        )
        SELECT * EXCEPT (avg_discount) FROM agg ORDER BY ALL
        """
    )


_COLLATION_ORACLE = """
WITH mixed AS (
    SELECT CASE WHEN o_orderkey % 2 = 0 THEN UPPER(o_orderpriority)
                ELSE LOWER(o_orderpriority) END AS pri,
           o_totalprice
    FROM orders
)
SELECT LOWER(pri) AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS revenue
FROM mixed
GROUP BY LOWER(pri)
"""


@register("fn_collation_groupby", oracle=_COLLATION_ORACLE, tags=("sql", "fn"))
def fn_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 collations): group a mixed-case
    key under UTF8_LCASE so 'URGENT' and 'urgent' are ONE group — the
    engine-level answer to case-insensitive joins/groupBys that otherwise
    force a lower() rewrite of every producer. The mixed-case key is
    synthesized here (alternating upper/lower by key parity) since the
    testdata arrives canonical.

    The collation rides the comparison, not the data: hashing and
    equality in the exchange/aggregate respect UTF8_LCASE directly.
    The output key is re-projected through lower() because a collated
    group's REPRESENTATIVE is first-seen (nondeterministic under
    parallel aggregation) — the semantic pin every collation user needs
    to know. Oracle spells the same semantics as GROUP BY lower()."""
    mixed = load(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("pri"),
        "o_totalprice",
    )
    return (
        mixed.groupBy(F.expr("collate(pri, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
                2,
            ).alias("revenue"),
        )
        .select(
            F.lower(F.col("k").cast("string")).alias("priority"),
            "n_orders",
            "revenue",
        )
    )


_SQL_PIVOT_ORACLE = """
SELECT l_linestatus,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'A'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
           AS rev_a,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
           AS rev_n,
       ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE), 2)
           AS rev_r
FROM lineitem
GROUP BY l_linestatus
"""


@register("sql_pivot_syntax", oracle=_SQL_PIVOT_ORACLE, tags=("sql", "reshape"))
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level PIVOT clause (the reshape_pivot DataFrame op's SQL
    spelling): revenue by linestatus pivoted across the three return
    flags, with the IN list EXPLICIT — which is the scale-relevant
    property: a pinned value list removes the extra distinct-discovery
    job DataFrame pivot runs without one, so the plan is a single
    Expand-free conditional aggregate on a known schema.

    Catalyst compiles PIVOT to exactly the conditional-aggregation form
    the oracle spells in portable SQL — same plan, two dialects."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pvt")
    return spark.sql(
        """
        SELECT l_linestatus,
               ROUND(CAST(rev_a AS DOUBLE), 2) AS rev_a,
               ROUND(CAST(rev_n AS DOUBLE), 2) AS rev_n,
               ROUND(CAST(rev_r AS DOUBLE), 2) AS rev_r
        FROM (
            SELECT l_linestatus, l_returnflag,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS price
            FROM lineitem_pvt
        )
        PIVOT (
            SUM(price) FOR l_returnflag IN ('A' AS rev_a, 'N' AS rev_n,
                                            'R' AS rev_r)
        )
        """
    )


_NOT_IN_NULL_ORACLE = """
WITH probe AS (
    SELECT c_custkey FROM customer
), nullable_keys AS (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL SELECT NULL
)
SELECT
    CAST((SELECT COUNT(*) FROM probe
          WHERE c_custkey NOT IN (SELECT o_custkey FROM nullable_keys))
         AS BIGINT) AS not_in_with_null,
    CAST((SELECT COUNT(*) FROM probe p
          WHERE NOT EXISTS (SELECT 1 FROM nullable_keys k
                            WHERE k.o_custkey = p.c_custkey))
         AS BIGINT) AS not_exists_with_null,
    CAST((SELECT COUNT(*) FROM probe
          WHERE c_custkey NOT IN (SELECT o_custkey FROM nullable_keys
                                  WHERE o_custkey IS NOT NULL))
         AS BIGINT) AS not_in_null_filtered
"""


@register("sql_not_in_null_semantics", oracle=_NOT_IN_NULL_ORACLE, tags=("sql",))
def sql_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null footgun, pinned as an asserted contract: one NULL
    in the subquery makes `NOT IN` three-valued-logic UNKNOWN for every
    probe row — the count silently becomes 0 — while NOT EXISTS (null-
    rejecting equality) and a null-filtered NOT IN return the real
    anti-join answer. Standard SQL in both engines; the single most
    common silent-wrong-answer migration bug, so the engine ships it as
    a verified behavior, not folklore.

    Plan note: NOT IN compiles to null-aware anti join (Spark:
    NullAwareAnti, single-column only), strictly costlier than the
    LeftAnti that NOT EXISTS / null-filtered NOT IN get — filter the
    nulls and write NOT EXISTS at scale."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_nin")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_nin")
    return spark.sql(
        """
        WITH nullable_keys AS (
            SELECT o_custkey FROM orders_nin WHERE o_orderpriority = '1-URGENT'
            UNION ALL SELECT CAST(NULL AS BIGINT)
        )
        SELECT
            CAST((SELECT COUNT(*) FROM customer_nin
                  WHERE c_custkey NOT IN (SELECT o_custkey FROM nullable_keys))
                 AS BIGINT) AS not_in_with_null,
            CAST((SELECT COUNT(*) FROM customer_nin p
                  WHERE NOT EXISTS (SELECT 1 FROM nullable_keys k
                                    WHERE k.o_custkey = p.c_custkey))
                 AS BIGINT) AS not_exists_with_null,
            CAST((SELECT COUNT(*) FROM customer_nin
                  WHERE c_custkey NOT IN (SELECT o_custkey FROM nullable_keys
                                          WHERE o_custkey IS NOT NULL))
                 AS BIGINT) AS not_in_null_filtered
        """
    )


_LISTAGG_ORACLE = """
SELECT o_orderpriority AS priority,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
           AS first_keys,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT o_orderpriority, o_orderkey,
           ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority ORDER BY o_orderkey
           ) AS rn
    FROM orders
) WHERE rn <= 5
GROUP BY o_orderpriority
"""


@register("agg_listagg_within_group", oracle=_LISTAGG_ORACLE, tags=("sql", "agg"))
def agg_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4) — ordered string aggregation as
    the ANSI spelling, vs the collect_list+array_join composition
    `agg_collect_sorted` pins. The WITHIN GROUP order is part of the
    result's VALUE, so unordered listagg is a determinism bug by
    construction; here the order key is explicit and total.

    The top-5-per-group window bounds the aggregated string (unbounded
    listagg of a 100 TB group is an OOM wearing a function name — cap
    the group first, always). One window + one groupBy on the same
    partitioning."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               listagg(CAST(o_orderkey AS STRING), ',')
                   WITHIN GROUP (ORDER BY o_orderkey) AS first_keys,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT o_orderpriority, o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ) AS rn
            FROM orders_la
        ) WHERE rn <= 5
        GROUP BY o_orderpriority
        """
    )


_IDENTIFIER_ORACLE = """
SELECT r_regionkey, r_name FROM region
"""


@register("sql_identifier_clause", oracle=_IDENTIFIER_ORACLE, tags=("sql",))
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause (Spark 4): template table/column NAMES from
    parameters without string concatenation — the injection-safe half of
    dynamic SQL that `sql_parameterized` (value parameters) can't cover,
    because names aren't values. The parser resolves IDENTIFIER(:p) as
    an identifier token, so `'region; DROP TABLE'` is a name lookup
    failure, never a statement.

    Templated multi-tenant / per-date table routing is the production
    use: one statement text, N physical tables, plan cache friendly."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region_idf")
    return spark.sql(
        "SELECT IDENTIFIER(:keycol) AS r_regionkey, r_name "
        "FROM IDENTIFIER(:tbl)",
        args={"tbl": "region_idf", "keycol": "r_regionkey"},
    )


_LATERAL_ALIAS_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 4) AS net,
       ROUND(ROUND(l_extendedprice * (1 - l_discount), 4) * (1 + l_tax), 4)
           AS gross,
       ROUND(ROUND(ROUND(l_extendedprice * (1 - l_discount), 4)
             * (1 + l_tax), 4)
             - ROUND(l_extendedprice * (1 - l_discount), 4), 4) AS tax_amount
FROM lineitem
WHERE l_quantity >= 49
"""


@register("sql_lateral_column_alias", oracle=_LATERAL_ALIAS_ORACLE, tags=("sql",))
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: a SELECT item referencing an alias defined
    EARLIER IN THE SAME SELECT (net → gross → tax_amount), instead of
    nesting three subqueries or repeating the expression tree. Catalyst
    inlines the chain at analysis — the physical plan is identical to
    the written-out form (the oracle spells the expansion), so the
    feature is free; it exists to stop copy-paste drift between repeated
    subexpressions, which at 3 levels deep is where bugs live."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_lca")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS net,
               ROUND(net * (1 + l_tax), 4) AS gross,
               ROUND(gross - net, 4) AS tax_amount
        FROM lineitem_lca
        WHERE l_quantity >= 49
        """
    )


_SESSION_VAR_ORACLE = """
WITH t AS (
    SELECT ROUND(AVG(o_totalprice), 2) AS thresh FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       ROUND(AVG(o_totalprice), 2) AS avg_above
FROM orders, t
WHERE o_totalprice > t.thresh
GROUP BY o_orderpriority
"""


@register("sql_session_variables", oracle=_SESSION_VAR_ORACLE, tags=("sql",))
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + EXECUTE IMMEDIATE (Spark 4): DECLARE OR
    REPLACE a typed variable, SET it from a scalar subquery (the
    corpus-average threshold), then run a statement that binds it with
    `USING` — the scripting surface warehouse SQL users migrate with
    (Snowflake/BigQuery session variables, T-SQL DECLARE). The variable
    binds as a literal in the parsed plan, so Catalyst constant-folds
    and pushes it down exactly like sql_parameterized's markers; the
    DECLARE OR REPLACE form keeps the query idempotent per session.

    The oracle inlines the same threshold as a CTE — variables are a
    SESSION surface, not a semantics change, which is exactly what the
    hash-match proves."""
    v = _view(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE price_thresh DOUBLE")
    spark.sql(
        f"SET VAR price_thresh = "
        f"(SELECT ROUND(AVG(o_totalprice), 2) FROM {v})"
    )
    return spark.sql(
        f"""
        EXECUTE IMMEDIATE
        'SELECT o_orderpriority,
                COUNT(*) AS n_above,
                ROUND(AVG(o_totalprice), 2) AS avg_above
         FROM {v}
         WHERE o_totalprice > ?
         GROUP BY o_orderpriority'
        USING price_thresh
        """
    )


_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT)
           AS qty_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
ORDER BY l_returnflag, l_linestatus
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE, tags=("sql",))
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (`|>`): the q1 pricing-summary shape
    written as a top-to-bottom dataflow — FROM, then each clause as a
    pipe stage in EXECUTION order (filter |> aggregate |> filter-on-agg
    |> order) instead of the inside-out SELECT nesting. Same Catalyst
    plan as the classic form; the oracle is the classic form, which IS
    the semantics claim — pipe syntax is sugar, not a new engine.

    The aggregate stage's GROUP BY columns flow through implicitly, and
    the post-AGGREGATE WHERE plays HAVING without the keyword — the two
    spots where the sugar could plausibly diverge from the classic
    reading, so exactly what the oracle pins. Quantities accumulate as
    exact DECIMAL before the BIGINT exit (l_quantity is stored DOUBLE;
    a bare double-sum cast would sit on the truncate-vs-round engine
    seam)."""
    li = _view(spark, sf_dir, "lineitem")
    return spark.sql(
        f"""
        FROM {li}
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * 100) AS BIGINT)
                         AS qty_cents,
                     CAST(COUNT(*) AS BIGINT) AS n_lines
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_lines > 10
        |> SELECT l_returnflag, l_linestatus, qty_cents, n_lines
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


_SQL_UDF_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(CAST(SUM(CAST(
           CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2)))
           * (1 + CAST(l_tax AS DECIMAL(18,2)))
       AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS DOUBLE) AS net_revenue,
       CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))
                          AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS holdout_items
FROM lineitem
GROUP BY l_returnflag
"""


@register("sql_scalar_udf", oracle=_SQL_UDF_ORACLE, tags=("sql",))
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (CREATE FUNCTION ... RETURNS ... RETURN expr —
    new engine surface in Spark 4.0, SPARK-46707): the warehouse way to
    share business logic (a net-revenue formula, a fold-assignment rule)
    WITHOUT leaving the optimizer. Unlike Python UDFs, a SQL UDF is an
    expression template — Catalyst INLINES the body at the call site, so
    the call costs nothing: it constant-folds, pushes down, and stays
    inside whole-stage codegen (the plan below shows HashAggregate over
    the inlined decimal expression, no BatchEvalPython anywhere — the
    pinning test asserts exactly that).

    Two UDFs exercise the two composition axes: `net_price` is pure
    decimal algebra over three columns (the TPC-H q1 money convention),
    and `is_holdout` CALLS `bucket5`, another SQL UDF (nested inlining),
    reusing the engine-portable md5 fold rule so the oracle can mirror
    it verbatim. The oracle inlines both bodies by hand — identical
    semantics is the point.

    Scale: indistinguishable from writing the expressions inline — one
    map-side-combined aggregate, decimal-exact money."""
    v = _view(spark, sf_dir, "lineitem")
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION net_price(
               price DECIMAL(18,2), disc DECIMAL(18,2), tax DECIMAL(18,2))
           RETURNS DECIMAL(28,6)
           RETURN CAST(price * (1 - disc) * (1 + tax) AS DECIMAL(28,6))"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION bucket5(k BIGINT)
           RETURNS BIGINT
           RETURN CAST(conv(substr(md5(CAST(k AS STRING)), 1, 8), 16, 10)
                       AS BIGINT) % 5"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION is_holdout(k BIGINT)
           RETURNS BOOLEAN
           RETURN bucket5(k) = 0"""
    )
    return spark.sql(
        f"""
        SELECT l_returnflag,
               COUNT(*) AS n_items,
               CAST(CAST(SUM(net_price(
                   CAST(l_extendedprice AS DECIMAL(18,2)),
                   CAST(l_discount AS DECIMAL(18,2)),
                   CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(28,6))
                   AS DOUBLE) AS net_revenue,
               SUM(CASE WHEN is_holdout(l_orderkey) THEN 1 ELSE 0 END)
                   AS holdout_items
        FROM {v}
        GROUP BY l_returnflag
        """
    )


_BOM_ORACLE = """
WITH RECURSIVE bom AS (
    SELECT p_partkey AS child,
           p_partkey // 10 AS parent,
           1 + p_partkey % 3 AS qty_per,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cost_cents
    FROM part WHERE p_partkey >= 10
), roots AS (
    SELECT p_partkey AS root,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cost_cents
    FROM part WHERE p_partkey < 10
), paths(root, node, mult) AS (
    SELECT root, root, CAST(1 AS BIGINT) FROM roots
    UNION ALL
    SELECT p.root, b.child, p.mult * b.qty_per
    FROM paths p JOIN bom b ON b.parent = p.node
), costed AS (
    SELECT p.root, p.mult * b.cost_cents AS ext_cents
    FROM paths p JOIN bom b ON b.child = p.node
    UNION ALL
    SELECT r.root, r.cost_cents FROM roots r
)
SELECT root AS root_part,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(SUM(CAST(ext_cents AS HUGEINT)) AS BIGINT)
           AS rolled_cost_cents
FROM costed GROUP BY root
"""


@register(
    "sql_recursive_bom_rollup", oracle=_BOM_ORACLE, tags=("sql", "graph")
)
def sql_recursive_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials cost rollup via a recursive CTE — the WEIGHTED
    transitive closure `sql_recursive_reachability` doesn't exercise:
    each parts-explosion path multiplies its per-level quantities, and a
    root's rolled-up cost is Σ over its subtree of (path quantity
    product) × component cost — the manufacturing/finance query that
    motivated recursive SQL in the first place (parts explosion,
    Codd's classic). The hierarchy is synthesized deterministically from
    part keys (parent = key div 10, so depth is logarithmic and BOTH
    engines build the identical DAG-free tree; qty_per = 1 + key mod 3),
    and every multiplier and cost stays in exact integer cents — path
    products are bounded by 3^depth ≈ 3^5, so nothing approaches long
    range even at 100× part count.

    Spark 4 runs the same recursive-CTE text through spark.sql; the
    recursion depth is data-logarithmic (≤ ⌈log₁₀ max_key⌉), each
    iteration is one equi-join on the parent key — the same per-level
    shuffle family an iterative DataFrame loop would produce, but
    planned as ONE statement with no driver-side looping."""
    v = _view(spark, sf_dir, "part")
    return spark.sql(
        f"""
        WITH RECURSIVE bom AS (
            SELECT p_partkey AS child,
                   p_partkey div 10 AS parent,
                   1 + p_partkey % 3 AS qty_per,
                   CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cost_cents
            FROM {v} WHERE p_partkey >= 10
        ), roots AS (
            SELECT p_partkey AS root,
                   CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                       AS cost_cents
            FROM {v} WHERE p_partkey < 10
        ), paths AS (
            SELECT root, root AS node, CAST(1 AS BIGINT) AS mult FROM roots
            UNION ALL
            SELECT p.root, b.child AS node, p.mult * b.qty_per AS mult
            FROM paths p JOIN bom b ON b.parent = p.node
        ), costed AS (
            SELECT p.root, p.mult * b.cost_cents AS ext_cents
            FROM paths p JOIN bom b ON b.child = p.node
            UNION ALL
            SELECT r.root, r.cost_cents AS ext_cents FROM roots r
        )
        SELECT root AS root_part,
               COUNT(*) AS n_components,
               CAST(SUM(CAST(ext_cents AS DECIMAL(30,0))) AS BIGINT)
                   AS rolled_cost_cents
        FROM costed GROUP BY root
        """
    )
