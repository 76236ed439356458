"""Iterative graph analytics on DataFrames — PageRank over the part
co-purchase graph.

Companion to the connected-components fixpoint in `operators/dedup.py`
(the other iterative algorithm in the engine): where CC iterates to
convergence with a driver-checked delta, PageRank runs a FIXED iteration
count, which keeps it oracle-expressible (the DuckDB oracle unrolls the
same three iterations as CTE levels).

Scale design: the edge list is built once (the only heavy shuffle), then
every iteration is one join + one aggregate keyed on the edge endpoints —
the rank table (|nodes| rows) is dwarfed by the edge table, and
`localCheckpoint` after each iteration cuts the growing lineage exactly as
dedup.py:592 does for CC. No driver-side collect anywhere: even the node
count enters the plan as a broadcast 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load, maybe_broadcast
from recommendation_system_big_data_spark.registry import register

DAMPING = 0.85
N_ITER = 3

#: Per-order item cap for co-purchase pair generation. Pair fan-out is
#: quadratic in basket size; one uncapped pathological basket (a 10k-item
#: bot "order" or a catalog dump) alone generates 10^8 pairs inside a
#: single task. Capping to the first MAX_BASKET distinct part keys —
#: dense_rank, so every ROW of a surviving part survives and co-occurrence
#: multiplicities are unchanged — bounds per-order fan-out at MAX_BASKET^2
#: deterministically of partitioning. Max observed basket at the test SFs
#: is 17 distinct parts, so the cap is inert there (oracle results
#: unchanged) and only bites where it should.
MAX_BASKET = 32

_CAPPED_ITEMS_SQL = """
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               DENSE_RANK() OVER (
                   PARTITION BY l_orderkey ORDER BY l_partkey
               ) AS irk
        FROM lineitem
    ) WHERE irk <= 32
"""


def _capped_items(li: DataFrame) -> DataFrame:
    """Cap each order's basket to its first MAX_BASKET distinct parts.

    The dense_rank window shuffles on l_orderkey — the same key the pair
    self-join hashes on, so the partitioning is reused and the cap adds
    no extra exchange. This row-level spelling is for consumers whose
    edge WEIGHTS carry row multiplicity (pagerank, modularity, label
    propagation, link-prediction support counts); DISTINCT-edge consumers
    go through _edges_undirected/_edges_directed below, which skip the
    window and the pair self-join entirely."""
    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        li.withColumn("irk", F.dense_rank().over(w))
        .filter(F.col("irk") <= MAX_BASKET)
        .drop("irk")
    )


def _order_part_sets(li: DataFrame) -> DataFrame:
    """(l_orderkey, parts): each order's first MAX_BASKET distinct part
    keys as a sorted array — the set-based spelling of _capped_items for
    DISTINCT-pair consumers (slice(array_sort(collect_set), 1, cap) keeps
    exactly the dense_rank≤cap part values). One exchange (the groupBy
    combiner-aggregates map-side); the window spelling pays the same
    exchange plus a per-order sort and re-emits every fact row."""
    return li.groupBy("l_orderkey").agg(
        F.slice(F.array_sort(F.collect_set("l_partkey")), 1, MAX_BASKET).alias(
            "parts"
        )
    )


#: All unordered pairs u < v within each order's sorted capped part set,
#: generated in-array (codegen, no join): element i pairs with every
#: element after it.
_PAIR_EXPR = (
    "flatten(transform(parts, (x, i) -> "
    "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS u, y AS v))))"
)


def _edges_undirected(li: DataFrame) -> DataFrame:
    """DISTINCT undirected co-purchase edges (u < v) without the pair
    self-join: the capped row self-join shuffles the fact scan twice and
    emits BOTH orientations of every within-order pair into the distinct,
    while this spelling shuffles the scan once (into _order_part_sets)
    and feeds the distinct half the rows — each order's C(basket, 2)
    pairs exactly once. Same edge set by construction (guide §2.3/§2.4:
    shuffle fewer bytes, remove the second exchange outright). Consumers
    needing per-row multiplicity must keep the self-join (_capped_items)."""
    return (
        _order_part_sets(li)
        .select(F.explode(F.expr(_PAIR_EXPR)).alias("e"))
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .distinct()
    )


def _edges_directed(li: DataFrame) -> DataFrame:
    """DISTINCT directed co-purchase edges (src, dst) — both orientations
    of every undirected edge, mirrored AFTER the distinct (one explode
    pass, not a self-union that would re-run the dedup) so the dedup
    shuffle carries m rows instead of 2m."""
    return (
        _edges_undirected(li)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                    F.struct(F.col("v").alias("src"), F.col("u").alias("dst")),
                )
            ).alias("e")
        )
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
    )


_PAGERANK_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), e0 AS (
    SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM pairs GROUP BY src, dst
), outw AS (
    SELECT src, SUM(w) AS tot FROM e0 GROUP BY src
), e AS (
    SELECT e0.src, e0.dst, e0.w, outw.tot FROM e0 JOIN outw ON outw.src = e0.src
), nodes AS (
    SELECT DISTINCT src AS id FROM e0
), nn AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), r0 AS (
    SELECT id, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn
), c1 AS (
    SELECT e.dst AS id, SUM(r0.r * e.w / e.tot) AS c
    FROM e JOIN r0 ON r0.id = e.src GROUP BY e.dst
), r1 AS (
    SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c1.c, 0) AS r
    FROM nodes CROSS JOIN nn LEFT JOIN c1 ON c1.id = nodes.id
), c2 AS (
    SELECT e.dst AS id, SUM(r1.r * e.w / e.tot) AS c
    FROM e JOIN r1 ON r1.id = e.src GROUP BY e.dst
), r2 AS (
    SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c2.c, 0) AS r
    FROM nodes CROSS JOIN nn LEFT JOIN c2 ON c2.id = nodes.id
), c3 AS (
    SELECT e.dst AS id, SUM(r2.r * e.w / e.tot) AS c
    FROM e JOIN r2 ON r2.id = e.src GROUP BY e.dst
), r3 AS (
    SELECT nodes.id, 0.15 / nn.n + 0.85 * COALESCE(c3.c, 0) AS r
    FROM nodes CROSS JOIN nn LEFT JOIN c3 ON c3.id = nodes.id
)
SELECT id AS part_id, ROUND(r, 6) AS pagerank FROM r3
"""


@register("graph_pagerank", oracle=_PAGERANK_ORACLE, tags=("graph",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations) over the part
    co-purchase graph: parts are linked when they appear in the same order,
    edge weight = co-occurrence count, edges symmetric by construction (so
    no dangling-mass correction is needed). The classic "customers who
    bought X also value Y" centrality — the graph-shaped cousin of the
    reference's ALS item ranking (model-als.py:125-139).

    Float determinism: per-edge contribution r·w/tot is the identical IEEE
    expression in both engines; only the SUM order differs, whose drift is
    ~1e-14 absolute after 3 iterations — six orders below the final
    ROUND(.,6) boundary. No intermediate rounding (that would CREATE
    boundary flips rather than prevent them).

    At 100 TB: pair generation is the dominant shuffle (quadratic per
    order, bounded at MAX_BASKET^2 by the _capped_items guard); each
    iteration shuffles |edges| once on src
    (join) and once on dst (aggregate), reusing the same hash partitioning
    AQE-side. Ranks are localCheckpoint'ed per iteration to cut lineage,
    mirroring the CC fixpoint discipline (dedup.py:592)."""
    li = _capped_items(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    e0 = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        # e0 feeds three consumers (out-weight agg, edge join, node list);
        # an eager cut materializes the expensive pair shuffle once
        # (measured ~2s/consumer at sf0.1) — same discipline as the
        # triangle kernel's edge checkpoint.
        .localCheckpoint()
    )
    outw = e0.groupBy("src").agg(F.sum("w").alias("tot"))
    # Hash-partition the edge list on src ONCE; every iteration's
    # contribution join then reuses this partitioning and shuffles only
    # the |nodes|-sized rank table — the standard Pregel layout.
    edges = e0.join(outw, "src").repartition("src").localCheckpoint()
    nodes = e0.select(F.col("src").alias("id")).distinct().localCheckpoint()
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "id", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(N_ITER):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("w") / F.col("tot")).alias("c"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                "id",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(DAMPING) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(F.col("id").alias("part_id"), F.round("r", 6).alias("pagerank"))


_TRIANGLE_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), pairs AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey)    AS u,
                    GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), tri AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM pairs e1
    JOIN pairs e2 ON e2.u = e1.v
    JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT node, COUNT(*) AS n_triangles
FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
)
GROUP BY node
"""


@register("graph_triangle_count", oracle=_TRIANGLE_ORACLE, tags=("graph",))
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part co-purchase graph — the
    clustering/cohesion primitive behind community detection and spam
    topology checks.

    Compact-forward, edge-iterator formulation: orient each undirected
    edge from the endpoint with the smaller (degree, id) to the larger,
    build each node's sorted out-neighbor array, and for every oriented
    edge (u, v) emit adj⁺(u) ∩ adj⁺(v) — each triangle {u,v,w} surfaces
    exactly once, at the unique edge whose two endpoints both point at w.
    Degree ordering is the scale guarantee: a hub of degree d keeps only
    its HIGHER-degree neighbors in adj⁺, so max |adj⁺| is O(√m), total
    intersection work is O(m^1.5), and the intersection replaces the
    explicit wedge self-join — the 49M wedge rows the r5 plan shuffled
    into the closing join (measured: the whole-query bottleneck) are now
    enumerated inside a codegen'd array_intersect and never materialized.
    Everything is key-partitioned shuffle joins on node ids (adjacency
    arrays ride along, each ≤ O(√m) longs); the degree table (|nodes|
    rows) carries a size-GATED broadcast hint (catalog.maybe_broadcast —
    nodes are part keys, which scale with the corpus, so above the gate
    the strategy is AQE's call); no edge-scale broadcast, no driver
    materialization. The oracle keeps the wedge-join spelling with the
    simple id orientation — same triangle set, since per-node membership
    is orientation-invariant.

    Scale regime: O(m^1.5) wedge volume grows ~1000x at 100x edges — when
    exact counting stops being affordable, switch to the DOULION
    edge-sampling estimator below (graph_triangle_count_doulion), which
    is unbiased and concentrates exactly where the exact kernel is most
    expensive."""
    edges = (
        _edges_undirected(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        # The edge build is the most expensive subtree and feeds THREE
        # consumers below (edges itself + the two degree broadcasts);
        # without a cut Spark re-evaluates it per consumer (measured ~2s
        # each at sf0.1). Same persist-the-edge-list discipline as the
        # adjacency checkpoint.
        .localCheckpoint()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = maybe_broadcast(deg, sf_dir, "part").select(
        F.col("node").alias("u"), F.col("deg").alias("du")
    )
    dv = maybe_broadcast(deg, sf_dir, "part").select(
        F.col("node").alias("v"), F.col("deg").alias("dv")
    )
    # Orient by (degree, id): src is the endpoint earlier in that order.
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
    )
    # Materialize the ADJACENCY (src → sorted out-neighbors), not the raw
    # oriented list: exploding nbrs reproduces every (src, dst, nbrs_u)
    # row in-place, so the probe below needs ONE join (on dst) instead of
    # two — the r14 plan exchanged oriented by src, and built adj twice
    # (no exchange reuse across the two probe joins: 2 ObjectHashAggregate
    # + 5 Exchange before, 1 + 4 after; warm-min 4.08s → 3.63s at sf0.1).
    # Persisting the per-node index then enumerating edge-by-edge is
    # exactly the 100 TB deployment shape.
    adj = (
        oriented.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .localCheckpoint()
        # SHUFFLE_HASH hint: the checkpointed adjacency carries a tiny
        # size estimate, and without a veto the planner BROADCASTS the
        # whole per-node index into the probe join — adj scales with the
        # corpus, so that plan dies at scale (see graph_bfs_hops).
        # Shuffled-hash (build = adj's per-partition slice, bounded by
        # the partitioning) beats merge here because merge would SORT
        # the wedge-heavy exploded side.
        .hint("shuffle_hash")
    )
    # The inner join is lossless here: a dst missing from adj has no
    # out-neighbors, so its intersection is empty — the edge closes no
    # triangle either way.
    left = adj.select(
        "src", F.col("nbrs").alias("nbrs_u"), F.explode("nbrs").alias("dst")
    )
    tri_w = left.join(
        adj.select(F.col("src").alias("v_key"), F.col("nbrs").alias("nbrs_v")),
        F.col("dst") == F.col("v_key"),
    ).select("src", "dst", F.array_intersect("nbrs_u", "nbrs_v").alias("ws"))
    return (
        tri_w.select("src", "dst", F.explode("ws").alias("w"))
        .select(F.explode(F.array("src", "dst", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


#: DOULION sampling rate for the approximate triangle count. At the test
#: SFs the exact kernel is cheap; p exists to exercise and gate the
#: estimator. A 100 TB deployment picks p so the sampled edge list fits
#: the cluster (expected wedge volume scales by p^1.5).
DOULION_P = 0.5


@register("graph_triangle_count_doulion", tags=("graph", "approx"))
def graph_triangle_count_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION global triangle estimate — the sampling escape hatch for the
    exact compact-forward kernel (graph_triangle_count above).

    Exact per-node triangle counting is O(m^1.5) wedge volume; at 100× the
    edge count that grows ~1000×, so at the top end of the scale regime the
    exact kernel is a cluster-day. DOULION (Tsourakakis et al., KDD'09:
    "DOULION: counting triangles in massive graphs with a coin") sparsifies
    first: keep each edge independently with probability p, count triangles
    exactly on the sparsified graph, scale by 1/p^3 — an unbiased estimator
    whose variance vanishes as the true count grows (concentration is best
    exactly where exact counting is least affordable). Expected cost drops
    by p^2 on edges materialized and ~p^1.5 on wedge volume.

    The coin is a portable md5 hash of the undirected edge key — not
    rand() — so the estimate is deterministic, partitioning-independent,
    and reproducible across runs/engines. Same oriented-edge pipeline as
    the exact kernel, then one global count: returns 1 row
    (est_triangles double, n_edges_sampled bigint, p double).

    ⊘ rows-only by design: a sampling estimator has no SQL-exact oracle;
    tests/test_graph.py gates the estimate's relative error against the
    exact count and pins determinism.
    """
    from recommendation_system_big_data_spark.operators.sampling import (
        portable_bucket,
    )

    edges = _edges_undirected(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    # The DOULION coin: deterministic per-edge keep/drop at rate p.
    kept = edges.filter(
        portable_bucket(F.concat_ws("|", F.col("u"), F.col("v")), 1000)
        < F.lit(int(DOULION_P * 1000))
    )
    deg = (
        kept.select(F.col("u").alias("node"))
        .unionByName(kept.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = maybe_broadcast(deg, sf_dir, "part").select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = maybe_broadcast(deg, sf_dir, "part").select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        kept.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
            .alias("e")
        )
        .select(F.col("e.s").alias("src"), F.col("e.d").alias("dst"))
        .localCheckpoint()
        # MERGE hint vetoes the misestimate-driven broadcast of the
        # oriented edge list into its own wedge self-join — see
        # graph_bfs_hops.
        .hint("merge")
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = e1.join(e2, F.col("e1.dst") == F.col("e2.src")).join(
        e3,
        (F.col("e1.src") == F.col("e3.src"))
        & (F.col("e2.dst") == F.col("e3.dst")),
    )
    n_edges = kept.agg(F.count(F.lit(1)).alias("n_edges_sampled"))
    scale = 1.0 / (DOULION_P**3)
    return tri.agg(
        (F.count(F.lit(1)) * F.lit(scale)).alias("est_triangles")
    ).crossJoin(F.broadcast(n_edges)).select(
        "est_triangles", "n_edges_sampled", F.lit(DOULION_P).alias("p")
    )


#: Minimum co-occurrence (order count) for a rule to be reported.
_RULE_MIN_SUPPORT = 5

_BASKET_RULES_ORACLE = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM ({_CAPPED_ITEMS_SQL})
), n_orders AS (
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM items
), item_supp AS (
    SELECT l_partkey, CAST(COUNT(*) AS DOUBLE) AS n_item
    FROM items GROUP BY l_partkey
), pair_supp AS (
    SELECT a.l_partkey AS antecedent, b.l_partkey AS consequent,
           CAST(COUNT(*) AS DOUBLE) AS n_pair
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.antecedent, p.consequent,
       CAST(p.n_pair AS BIGINT) AS n_orders_both,
       ROUND(p.n_pair / sa.n_item, 6) AS confidence,
       ROUND(p.n_pair * n_orders.n / (sa.n_item * sc.n_item), 6) AS lift
FROM pair_supp p
JOIN item_supp sa ON sa.l_partkey = p.antecedent
JOIN item_supp sc ON sc.l_partkey = p.consequent
CROSS JOIN n_orders
WHERE p.n_pair >= {_RULE_MIN_SUPPORT}
"""


@register("basket_rules_lift", oracle=_BASKET_RULES_ORACLE, tags=("graph", "ml"))
def basket_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets — support, confidence, and lift
    for every part pair co-purchased in at least _RULE_MIN_SUPPORT orders.
    The classic market-basket analysis ("X ⇒ Y with lift 2.3"): confidence
    is P(Y|X); lift normalizes by P(Y), so lift > 1 separates genuine
    affinity from popularity. The frequency-statistics complement of the
    model-based rankers in this engine: ALS factors (recommend.py) and
    PageRank centrality (above) learn global structure, rules expose
    directly explainable pairwise affinities.

    Plan: distinct (order, item) pairs → pair counts via the capped
    self-join (bounded at MAX_BASKET² per order) → two broadcast-size
    joins against per-item supports and one 1-row cross join for the
    order total. The pair aggregate reuses the l_orderkey partitioning of
    the self-join; item supports are |parts| rows — broadcastable at any
    realistic catalog size. The min-support filter applies BEFORE the
    support joins, so only reportable rules flow into them. Both engines
    evaluate the identical ratio expressions; ROUND(6) absorbs nothing
    but display noise (counts are exact integers)."""
    # One set-per-order frame feeds all three aggregates: the order total
    # (one row per order by construction), item supports (explode the
    # set), and pair supports. Pair co-occurrence counts are SYMMETRIC —
    # n(a,b) == n(b,a) == |orders containing both| — so aggregate the
    # unordered u < v grain (half the shuffle the ordered self-join fed)
    # and mirror both rule orientations AFTER the count + min-support
    # filter. Identical rows to the ordered spelling.
    sets = _order_part_sets(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ).localCheckpoint(eager=False)
    n_orders = sets.agg(F.count(F.lit(1)).cast("double").alias("n"))
    item_supp = (
        sets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("double").alias("n_item"))
    )
    pair_und = (
        sets.select(F.explode(F.expr(_PAIR_EXPR)).alias("e"))
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_pair"))
        .filter(F.col("n_pair") >= _RULE_MIN_SUPPORT)
    )
    pair_supp = pair_und.select(
        F.col("u").alias("antecedent"), F.col("v").alias("consequent"), "n_pair"
    ).unionAll(
        pair_und.select(
            F.col("v").alias("antecedent"), F.col("u").alias("consequent"), "n_pair"
        )
    )
    sa = maybe_broadcast(item_supp, sf_dir, "part").select(
        F.col("l_partkey").alias("antecedent"), F.col("n_item").alias("supp_a")
    )
    sc = maybe_broadcast(item_supp, sf_dir, "part").select(
        F.col("l_partkey").alias("consequent"), F.col("n_item").alias("supp_c")
    )
    return (
        pair_supp.join(sa, "antecedent")
        .join(sc, "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            F.col("n_pair").cast("long").alias("n_orders_both"),
            F.round(F.col("n_pair") / F.col("supp_a"), 6).alias("confidence"),
            F.round(
                F.col("n_pair") * F.col("n") / (F.col("supp_a") * F.col("supp_c")), 6
            ).alias("lift"),
        )
    )


_BFS_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), nodes AS (
    SELECT DISTINCT src AS id FROM edges
), seeds AS (
    SELECT id FROM nodes WHERE id % 100 = 0
), f1 AS (
    SELECT DISTINCT e.dst AS id FROM edges e JOIN seeds s ON e.src = s.id
), f2 AS (
    SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON e.src = f1.id
), f3 AS (
    SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON e.src = f2.id
), all_levels AS (
    SELECT id, 0 AS hops FROM seeds
    UNION ALL SELECT id, 1 FROM f1
    UNION ALL SELECT id, 2 FROM f2
    UNION ALL SELECT id, 3 FROM f3
)
SELECT id AS part_id, CAST(MIN(hops) AS INTEGER) AS hops
FROM all_levels GROUP BY id
"""


@register("graph_bfs_hops", oracle=_BFS_ORACLE, tags=("graph",))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the co-purchase graph: minimum hop distance
    (≤3) from the seed set {parts with id % 100 == 0} — the "blast radius"
    primitive behind recall campaigns (everything within 2 hops of a
    defective part), influence propagation, and fraud-ring expansion from
    known-bad seeds.

    Level-synchronous frontier expansion, the standard distributed-BFS
    shape: each level is one equi-join frontier⨝edges (shuffle keyed on
    src) followed by a distinct on the frontier — NEVER a recursive
    per-path enumeration, whose path count grows as degree^k while the
    frontier is capped at |nodes|. The DuckDB oracle unrolls the identical
    level sets as CTEs (its recursive CTE would enumerate paths).
    Distances resolve by MIN over levels at the end, so a node reached at
    hops 1 and 3 reports 1. Fixed depth keeps it oracle-expressible; the
    unbounded variant is the CC fixpoint loop (dedup.py:592) with the same
    per-iteration localCheckpoint lineage cut."""
    # MERGE hint: the set-based edge build carries a tiny Catalyst size
    # estimate (no join inflates it, and localCheckpoint's LogicalRDD
    # keeps the origin estimate), so the planner BROADCASTS the edge
    # list into the frontier joins and streams each level through one
    # task (measured 2.8s → 8s+ at sf0.1; at scale a broadcast edge
    # list is an OOM). Guide §3.1: when estimates are wrong, pick the
    # strategy explicitly — SMJ is the shape these level joins always
    # ran as and the only one that survives any frontier size.
    edges = (
        _edges_directed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .localCheckpoint(eager=False)
        .hint("merge")
    )
    frontier = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .filter(F.col("id") % 100 == 0)
    )
    levels = [frontier.select("id", F.lit(0).alias("hops"))]
    for depth in (1, 2, 3):
        frontier = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(F.col("dst").alias("id"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        levels.append(frontier.select("id", F.lit(depth).alias("hops")))
    union = levels[0]
    for lv in levels[1:]:
        union = union.unionByName(lv)
    return union.groupBy(F.col("id").alias("part_id")).agg(
        F.min("hops").cast("int").alias("hops")
    )


_MODULARITY_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), e AS (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM pairs GROUP BY src, dst
), labeled AS (
    SELECT e.w, ps.p_brand AS cs, pd.p_brand AS cd
    FROM e
    JOIN part ps ON ps.p_partkey = e.src
    JOIN part pd ON pd.p_partkey = e.dst
), tot AS (
    SELECT CAST(SUM(w) AS DOUBLE) AS m FROM labeled
), intra AS (
    SELECT cs AS community, CAST(SUM(w) AS BIGINT) AS w_in
    FROM labeled WHERE cs = cd GROUP BY cs
), deg AS (
    SELECT community, CAST(SUM(w) AS BIGINT) AS strength
    FROM (
        SELECT cs AS community, w FROM labeled
        UNION ALL
        SELECT cd AS community, w FROM labeled
    ) GROUP BY community
)
SELECT d.community,
       d.strength,
       CAST(COALESCE(i.w_in, 0) AS BIGINT) AS intra_weight,
       ROUND(COALESCE(i.w_in, 0) / t.m - POW(d.strength / (2 * t.m), 2), 6)
           AS q_contribution
FROM deg d
LEFT JOIN intra i ON i.community = d.community
CROSS JOIN tot t
"""


@register("graph_community_modularity", oracle=_MODULARITY_ORACLE, tags=("graph",))
def graph_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition over the part co-purchase
    graph: per community, Q_c = W_in_c/W − (S_c/2W)² — summing the rows
    gives the global Q that community-detection methods (Louvain/Leiden)
    maximize, so this operator is both the quality gauge for ANY labeling
    and one full Louvain evaluation step.

    The edge list is the capped co-purchase self-join (MAX_BASKET bounds
    the quadratic fan-out; src<dst keeps each undirected edge once);
    brand labels attach via two broadcast joins with the part dimension,
    and every modularity ingredient — total weight, intra-community
    weight, community strength — is one aggregation of the EDGE table.
    Edge weights are integer counts, so everything up to the final Q
    division is exact."""
    li = _capped_items(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    brands = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    labeled = (
        e.join(
            F.broadcast(brands.select(F.col("p_partkey").alias("src"),
                                      F.col("p_brand").alias("cs"))), "src"
        )
        .join(
            F.broadcast(brands.select(F.col("p_partkey").alias("dst"),
                                      F.col("p_brand").alias("cd"))), "dst"
        )
        .select("w", "cs", "cd")
    )
    tot = labeled.agg(F.sum("w").cast("double").alias("m"))
    intra = (
        labeled.where(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.sum("w").cast("long").alias("w_in"))
    )
    deg = (
        labeled.select(F.col("cs").alias("community"), "w")
        .unionAll(labeled.select(F.col("cd").alias("community"), "w"))
        .groupBy("community")
        .agg(F.sum("w").cast("long").alias("strength"))
    )
    return (
        deg.join(F.broadcast(intra), "community", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "community",
            "strength",
            F.coalesce(F.col("w_in"), F.lit(0)).cast("long").alias("intra_weight"),
            F.round(
                F.coalesce(F.col("w_in"), F.lit(0)) / F.col("m")
                - F.pow(F.col("strength") / (2 * F.col("m")), 2),
                6,
            ).alias("q_contribution"),
        )
    )


_KCORE_K = 2
#: Defensive backstop only — peeling strictly shrinks the node count every
#: non-fixpoint round, so rounds are bounded by |V|; hitting this means a
#: checkpoint/caching bug, and the loop RAISES rather than returning a
#: non-converged (contract-violating) core.
_KCORE_MAX_ITERS = 10_000


@register("graph_kcore", oracle=None, tags=("graph",))
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the part co-purchase graph: iterated
    peeling — drop every node with degree < k, recompute degrees, repeat
    to fixpoint — leaving the maximal subgraph where every node keeps ≥k
    neighbors. The density filter community detection and fraud-ring
    mining run first (PageRank finds IMPORTANT nodes; k-core finds
    COHESIVE regions).

    Same driver-looped fixpoint discipline as the connected-components
    clustering (dedup.py): each peel is one degree aggregate + one semi
    join on the edge list, `localCheckpoint` cuts lineage per round, and
    the loop exits when the node count stops shrinking — the driver sees
    only per-round COUNTS (scalars), never data. Peeling is monotone, so
    rounds are bounded by the graph's degeneracy ordering depth, not
    |V|. ⊘ rows-only (fixpoint iteration isn't SQL); test gates pin the
    invariants: every surviving node has degree ≥ k within the core,
    node counts shrink monotonically, deterministic."""
    edges = (
        _edges_undirected(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .localCheckpoint()
    )
    prev_n = -1
    for it in range(_KCORE_MAX_ITERS + 1):
        if it == _KCORE_MAX_ITERS:
            raise RuntimeError(
                f"graph_kcore: no fixpoint after {_KCORE_MAX_ITERS} peel "
                "rounds — monotone peeling cannot do this; checkpointing bug"
            )
        deg = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= _KCORE_K).select("id").localCheckpoint()
        n = keep.count()
        if n == prev_n:
            break
        prev_n = n
        edges = (
            edges.join(
                keep.withColumnRenamed("id", "src"), "src", "semi"
            )
            .join(keep.withColumnRenamed("id", "dst"), "dst", "semi")
            .localCheckpoint()
        )
    core_deg = (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
    return core_deg.orderBy(F.desc("core_degree"), F.asc("id")).limit(100)


#: Synchronous LPA rounds. Fixed (not run-to-stability) because
#: synchronous label propagation can 2-cycle on bipartite-ish regions;
#: a fixed round count keeps the output well-defined AND lets the oracle
#: unroll the exact same computation.
_LPA_ITERS = 4


def _lpa_oracle() -> str:
    """Unrolled-iteration oracle, same discipline as _PAGERANK_ORACLE:
    every round is one join + one weighted count + one deterministic
    arg-max (score DESC, label ASC), so the SQL is mechanical."""
    sql = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), e AS (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM pairs GROUP BY src, dst
), l0 AS (
    SELECT DISTINCT src AS node, src AS lab FROM e
)"""
    prev = "l0"
    for i in range(1, _LPA_ITERS + 1):
        sql += f""", s{i} AS (
    SELECT e.dst AS node, l.lab, SUM(e.w) AS sc
    FROM e JOIN {prev} l ON l.node = e.src
    GROUP BY e.dst, l.lab
), l{i} AS (
    SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (
                   PARTITION BY node ORDER BY sc DESC, lab ASC
               ) AS rn
        FROM s{i}
    ) WHERE rn = 1
)"""
        prev = f"l{i}"
    return sql + f"""
SELECT node AS part_id, lab AS community FROM {prev}
"""


@register("graph_label_propagation", oracle=_lpa_oracle(), tags=("graph",))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community DETECTION via weighted synchronous label propagation
    (Raghavan et al. 2007) over the part co-purchase graph — the
    companion to graph_community_modularity, which only EVALUATES a
    given partition. Each node starts as its own community; each round
    every node adopts the label with the highest incident edge weight
    among its neighbors (tie → smallest label, so the whole run is
    deterministic); 4 fixed synchronous rounds.

    Exactness: edge weights are integer co-occurrence counts and the
    argmax compares integer sums — no float anywhere, so the oracle
    match is bit-exact by construction. Scale shape: per round, ONE
    |edges| join against the |nodes|-sized label table (edge list
    hash-partitioned on src once, same Pregel layout as pagerank) + one
    (node, label) weighted count + one per-node top-1 window; labels are
    localCheckpoint'ed per round to cut lineage. Pair generation is the
    dominant shuffle, bounded by the MAX_BASKET cap exactly as in the
    other co-purchase kernels."""
    li = _capped_items(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    edges = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .repartition("src")
        .localCheckpoint()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    pick = Window.partitionBy("node").orderBy(F.desc("sc"), F.asc("lab"))
    for _ in range(_LPA_ITERS):
        labels = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.sum("w").alias("sc"))
            .withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("node").alias("part_id"), F.col("lab").alias("community")
    )


_ASSORT_ORACLE = f"""
WITH capped AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               DENSE_RANK() OVER (
                   PARTITION BY l_orderkey ORDER BY l_partkey
               ) AS irk
        FROM lineitem
    ) WHERE irk <= {MAX_BASKET}
), edges AS (
    SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
           GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), directed AS (
    SELECT u AS s, v AS d FROM edges
    UNION ALL SELECT v, u FROM edges
), deg AS (
    SELECT s AS node, CAST(COUNT(*) AS HUGEINT) AS dg
    FROM directed GROUP BY s
), stamped AS (
    SELECT ds.dg AS du, dd.dg AS dv
    FROM directed e JOIN deg ds ON e.s = ds.node
    JOIN deg dd ON e.d = dd.node
), sums AS (
    SELECT CAST(COUNT(*) AS HUGEINT) AS m2,
           SUM(du * dv) AS sjk, SUM(du) AS sj, SUM(du * du) AS sjj
    FROM stamped
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST(CASE WHEN m2 * sjj - sj * sj = 0 THEN NULL
            WHEN m2 * sjk - sj * sj < 0 THEN
              -(((sj * sj - m2 * sjk) * 2000000 + (m2 * sjj - sj * sj))
                // (2 * (m2 * sjj - sj * sj)))
            ELSE
              (((m2 * sjk - sj * sj) * 2000000 + (m2 * sjj - sj * sj))
               // (2 * (m2 * sjj - sj * sj)))
            END AS BIGINT) AS assortativity_micros
FROM sums
"""


@register("graph_assortativity", oracle=_ASSORT_ORACLE, tags=("graph",))
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the directed edge
    list — positive when hubs co-purchase with hubs (assortative,
    social-network-like), negative when hubs attach to leaves
    (disassortative, catalog/dependency-like). The one scalar that says
    which topology regime the co-purchase graph is in, complementing the
    local (triangles) and global (modularity, k-core) structure ops.

    Exact integer rational: with integer degrees over the 2M-row directed
    list, r = (2M·Σd_u d_v − (Σd_u)²) / (2M·Σd_u² − (Σd_u)²) — one
    sign-aware round-half-away micro division (|r| ≤ 1 so the quotient is
    bounded; den = 0 for degree-regular graphs → NULL). Sums accumulate
    in decimal; the width budget is exact past 1e12 edges at realistic
    degree skews, and beyond it Spark's decimal overflow is a LOUD null.

    Scale shape: the capped co-purchase self-join (MAX_BASKET² per-order
    bound) is the dominant shuffle, identical to the triangle/PageRank
    edge build; degrees are one groupBy of the directed list; stamping
    joins the vocabulary-sized degree table twice (AQE broadcasts at
    fixture scale, shuffle-hash at web scale); the statistic folds
    map-side to one row."""
    edges = _edges_undirected(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    ).localCheckpoint()
    directed = edges.select(F.col("u").alias("s"), F.col("v").alias("d")).unionAll(
        edges.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    deg = directed.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    stamped = (
        directed.join(deg.select(F.col("node").alias("s"), F.col("dg").alias("du")), "s")
        .join(deg.select(F.col("node").alias("d"), F.col("dg").alias("dv")), "d")
        .select("du", "dv")
    )
    sums = stamped.agg(
        F.count(F.lit(1)).cast("decimal(20,0)").alias("m2"),
        F.sum(F.expr("CAST(du AS DECIMAL(19,0)) * dv")).alias("sjk"),
        F.sum(F.col("du").cast("decimal(20,0)")).alias("sj"),
        F.sum(F.expr("CAST(du AS DECIMAL(19,0)) * du")).alias("sjj"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        sums.crossJoin(F.broadcast(n_nodes))
        .select(
            F.expr("CAST(m2 div 2 AS LONG)").alias("n_edges"),
            "n_nodes",
            F.expr(
                """CAST(CASE
                  WHEN m2 * sjj - sj * sj = 0 THEN NULL
                  WHEN m2 * sjk - sj * sj < 0 THEN
                    -(((sj * sj - m2 * sjk) * 2000000 + (m2 * sjj - sj * sj))
                      div (2 * (m2 * sjj - sj * sj)))
                  ELSE
                    (((m2 * sjk - sj * sj) * 2000000 + (m2 * sjj - sj * sj))
                     div (2 * (m2 * sjj - sj * sj)))
                  END AS LONG)"""
            ).alias("assortativity_micros"),
        )
    )


#: Predicted links reported by the Jaccard link-prediction query.
LINKPRED_TOP_K = 20
#: Minimum co-purchase count for a pair to count as an edge. Support
#: thresholding (the market-basket minimum-support rule) is what keeps
#: the neighborhood graph SPARSE: single-co-occurrence pairs are noise
#: on any high-throughput catalog, and without the threshold the
#: distance-2 wedge join goes dense-quadratic (measured at sf0.1:
#: 148M wedges on the support-1 graph, median degree 119, vs 2,173
#: wedges / max degree 10 at support 2 — see SCALING.md r12).
LINKPRED_MIN_SUPPORT = 2

_LINKPRED_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT LEAST(a.l_partkey, b.l_partkey) AS u,
           GREATEST(a.l_partkey, b.l_partkey) AS v
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {LINKPRED_MIN_SUPPORT}
), directed AS (
    SELECT u AS s, v AS d FROM edges
    UNION ALL SELECT v, u FROM edges
), deg AS (
    SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS dg
    FROM directed GROUP BY s
), wedges AS (
    SELECT e1.s AS u, e2.s AS v, CAST(COUNT(*) AS BIGINT) AS cn
    FROM directed e1 JOIN directed e2
      ON e1.d = e2.d AND e1.s < e2.s
    GROUP BY e1.s, e2.s
), nonedges AS (
    SELECT w.u, w.v, w.cn FROM wedges w
    LEFT JOIN edges e ON e.u = w.u AND e.v = w.v
    WHERE e.u IS NULL
)
SELECT n.u AS part_u, n.v AS part_v, n.cn AS common_neighbors,
       (1000000 * n.cn) // (du.dg + dv.dg - n.cn) AS jaccard_micros
FROM nonedges n
JOIN deg du ON du.node = n.u
JOIN deg dv ON dv.node = n.v
ORDER BY jaccard_micros DESC, part_u ASC, part_v ASC
LIMIT {LINKPRED_TOP_K}
"""


@register("graph_jaccard_link_prediction", oracle=_LINKPRED_ORACLE, tags=("graph",))
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-Jaccard link prediction over the part co-purchase graph
    (Liben-Nowell & Kleinberg 2003): for every NON-adjacent pair with at
    least one common neighbor, score |N(u)∩N(v)| / |N(u)∪N(v)| and
    report the top-k predicted links — the classic "parts that should
    co-sell but haven't yet" recommendation signal, the graph-topology
    complement of als_item_similarity's latent-factor version.

    Edges require LINKPRED_MIN_SUPPORT repeat co-purchases — the
    market-basket minimum-support rule, and the load-bearing scale
    decision: neighborhood similarity is only meaningful on the
    repeat-signal graph, and the support threshold is what keeps the
    distance-2 join sparse (at sf0.1 the support-1 graph has median
    degree 119 and 148M wedges → 22 s; the support-2 graph has max
    degree 10 and 2,173 wedges — SCALING.md r12 entry). Common-neighbor
    counting is then the wedge join (two copies of the directed list
    equi-joined on the shared endpoint with s1 < s2 — the same shuffle
    family the triangle count prices); candidate pairs are only those
    with cn ≥ 1, never all pairs. Existing edges drop via one left-anti
    join; |N∪N| = deg_u + deg_v − cn by inclusion-exclusion, so no
    second set operation. Integer floor micro-units; deterministic
    (score, u, v) top-k fuses to TakeOrderedAndProject. Reference
    anchor: the co-purchase graph family extends
    exploratory-data-analysis.py's per-item aggregate view to
    relational structure."""
    li = _capped_items(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.least("a.l_partkey", "b.l_partkey").alias("u"),
            F.greatest("a.l_partkey", "b.l_partkey").alias("v"),
        )
        .agg(F.count(F.lit(1)).alias("_sup"))
        .filter(F.col("_sup") >= LINKPRED_MIN_SUPPORT)
        .select("u", "v")
        .localCheckpoint()
    )
    directed = edges.select(F.col("u").alias("s"), F.col("v").alias("d")).unionAll(
        edges.select(F.col("v").alias("s"), F.col("u").alias("d"))
    )
    deg = directed.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("dg")
    )
    e1, e2 = directed.alias("e1"), directed.alias("e2")
    wedges = (
        e1.join(
            e2,
            (F.col("e1.d") == F.col("e2.d")) & (F.col("e1.s") < F.col("e2.s")),
        )
        .groupBy(F.col("e1.s").alias("u"), F.col("e2.s").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("cn"))
    )
    nonedges = wedges.join(edges, ["u", "v"], "left_anti")
    scored = (
        nonedges.join(deg.select(F.col("node").alias("u"), F.col("dg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("dg").alias("dv")), "v")
        .select(
            F.col("u").alias("part_u"),
            F.col("v").alias("part_v"),
            F.col("cn").alias("common_neighbors"),
            F.expr("(1000000 * cn) div (du + dv - cn)").alias("jaccard_micros"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard_micros"), F.asc("part_u"), F.asc("part_v")
    ).limit(LINKPRED_TOP_K)


_HITS_ORACLE = """
WITH e AS (
    SELECT o.o_custkey AS cust, l.l_partkey AS part,
           CAST(COUNT(*) AS DOUBLE) AS w
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_custkey, l.l_partkey
), h1r AS (
    SELECT cust, SUM(w) AS h FROM e GROUP BY cust
), h1n AS (
    SELECT SQRT(SUM(h * h)) AS z FROM h1r
), h1 AS (
    SELECT cust, h / h1n.z AS h FROM h1r, h1n
), a1r AS (
    SELECT e.part, SUM(e.w * h1.h) AS a
    FROM e JOIN h1 ON e.cust = h1.cust GROUP BY e.part
), a1n AS (
    SELECT SQRT(SUM(a * a)) AS z FROM a1r
), a1 AS (
    SELECT part, a / a1n.z AS a FROM a1r, a1n
), h2r AS (
    SELECT e.cust, SUM(e.w * a1.a) AS h
    FROM e JOIN a1 ON e.part = a1.part GROUP BY e.cust
), h2n AS (
    SELECT SQRT(SUM(h * h)) AS z FROM h2r
), h2 AS (
    SELECT cust, h / h2n.z AS h FROM h2r, h2n
), a2r AS (
    SELECT e.part, SUM(e.w * h2.h) AS a
    FROM e JOIN h2 ON e.cust = h2.cust GROUP BY e.part
), a2n AS (
    SELECT SQRT(SUM(a * a)) AS z FROM a2r
), a2 AS (
    SELECT part, a / a2n.z AS a FROM a2r, a2n
)
SELECT 'hub' AS role, cust AS node_id, ROUND(h, 6) AS score FROM h2
UNION ALL
SELECT 'authority', part, ROUND(a, 6) FROM a2
"""


@register("graph_hits", oracle=_HITS_ORACLE, tags=("graph",))
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the bipartite
    customer→part purchase graph, two L2-normalized power iterations:
    a strong HUB is a customer whose basket concentrates on strong
    authorities; a strong AUTHORITY is a part bought by strong hubs —
    the mutually-recursive centrality pair PageRank's single score
    cannot express, and the graph-shaped reading of "influential buyer
    / must-stock item". Two iterations is where the co-purchase
    fixture's ordering stabilizes (the same budget-vs-convergence trade
    as graph_pagerank's three).

    Float determinism: each contribution w·score is the identical IEEE
    expression on both engines; only SUM order differs (~1e-14 after
    two iterations, six orders under ROUND(6)). L2 norms are shared
    double expressions; a graph with edges always has positive norms,
    and an edgeless corpus yields the empty result on both engines —
    no division ever sees zero.

    Scale shape: the fact⋈fact equi-join folds to the (cust, part)
    edge grain once (map-side combine) and is checkpointed; each
    half-iteration is ONE |edges| shuffle keyed alternately on cust /
    part — the Pregel layout graph_pagerank documents, with the rank
    table broadcast-sized per key group. Nothing quadratic anywhere."""
    e = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
            load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey"
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
        .localCheckpoint()
    )

    def _l2(df: DataFrame, col: str) -> DataFrame:
        # Each normalization references its input TWICE (norm fold + the
        # scale-back join) and feeds the next half-iteration, so without a
        # lineage cut the plan tree doubles per half-iteration (measured:
        # 86 exchanges static). Checkpointing each score table keeps every
        # half-iteration at one |edges| shuffle — the pagerank discipline.
        scores = df.localCheckpoint()
        z = scores.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("z"))
        return scores.crossJoin(F.broadcast(z)).select(
            *[c for c in scores.columns if c != col],
            (F.col(col) / F.col("z")).alias(col),
        )

    h1 = _l2(e.groupBy("cust").agg(F.sum("w").alias("h")), "h")
    a1 = _l2(
        e.join(h1, "cust")
        .groupBy("part")
        .agg(F.sum(F.col("w") * F.col("h")).alias("a")),
        "a",
    )
    h2 = _l2(
        e.join(a1, "part")
        .groupBy("cust")
        .agg(F.sum(F.col("w") * F.col("a")).alias("h")),
        "h",
    )
    a2 = _l2(
        e.join(h2, "cust")
        .groupBy("part")
        .agg(F.sum(F.col("w") * F.col("h")).alias("a")),
        "a",
    )
    hubs = h2.select(
        F.lit("hub").alias("role"),
        F.col("cust").alias("node_id"),
        F.round("h", 6).alias("score"),
    )
    auths = a2.select(
        F.lit("authority").alias("role"),
        F.col("part").alias("node_id"),
        F.round("a", 6).alias("score"),
    )
    return hubs.unionByName(auths)


_CLOSENESS_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), seeds AS (
    SELECT src AS seed FROM (
        SELECT src, COUNT(DISTINCT dst) AS deg FROM edges GROUP BY src
    ) ORDER BY deg DESC, src LIMIT 8
), f1 AS (
    SELECT DISTINCT s.seed, e.dst AS id
    FROM edges e JOIN seeds s ON e.src = s.seed
), f2 AS (
    SELECT DISTINCT f1.seed, e.dst AS id
    FROM edges e JOIN f1 ON e.src = f1.id
), f3 AS (
    SELECT DISTINCT f2.seed, e.dst AS id
    FROM edges e JOIN f2 ON e.src = f2.id
), all_levels AS (
    SELECT seed, seed AS id, 0 AS hops FROM seeds
    UNION ALL SELECT seed, id, 1 FROM f1
    UNION ALL SELECT seed, id, 2 FROM f2
    UNION ALL SELECT seed, id, 3 FROM f3
), dist AS (
    SELECT seed, id, CAST(MIN(hops) AS BIGINT) AS d
    FROM all_levels GROUP BY seed, id
)
SELECT seed AS seed_part,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(d) AS BIGINT) AS sum_dist,
       CASE WHEN SUM(d) = 0 THEN NULL
            ELSE CAST((COUNT(*) - 1) * 1000000 // SUM(d) AS BIGINT)
            END AS closeness_micros
FROM dist GROUP BY seed
"""


@register("graph_closeness_sampled", oracle=_CLOSENESS_ORACLE, tags=("graph",))
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness centrality of the 8 highest-degree co-purchase hubs,
    truncated at 3 hops — the sampled-seed form that is how closeness is
    actually computed at scale (exact closeness needs all-pairs
    distances; production graph stacks sample seeds or use
    pivot/HyperANF sketches). Closeness = reached/Σdist over the 3-hop
    ball: a hub with high degree but poorly connected neighborhood
    ranks below a smaller hub that reaches the graph's core — degree
    (already measured by `graph_hits`/`graph_pagerank`) can't see that.

    Per-seed level-synchronous BFS, the `graph_bfs_hops` shape with the
    seed id carried through the frontier: each level is one equi-join
    frontier⨝edges + distinct on (seed, node) — frontier size is capped
    at 8·|nodes| regardless of path multiplicity; the oracle unrolls the
    identical level sets. Seeds select via one TakeOrderedAndProject
    (degree DESC, id tiebreak). Distances and counts are exact
    integers; closeness exits as a truncating micro division. Fixed
    depth keeps it oracle-expressible AND bounds every frontier — the
    unbounded variant is the CC fixpoint with per-iteration
    checkpointing."""
    # MERGE hint vetoes the misestimate-driven broadcast of the edge
    # list — see graph_bfs_hops.
    edges = (
        _edges_directed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .localCheckpoint(eager=False)
        .hint("merge")
    )
    seeds = (
        edges.groupBy("src")
        .agg(F.countDistinct("dst").alias("deg"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(8)
        .select(F.col("src").alias("seed"))
    )
    frontier = seeds.select("seed", F.col("seed").alias("id"))
    levels = [frontier.select("seed", "id", F.lit(0).alias("hops"))]
    for depth in (1, 2, 3):
        frontier = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select("seed", F.col("dst").alias("id"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        levels.append(frontier.select("seed", "id", F.lit(depth).alias("hops")))
    union = levels[0]
    for lv in levels[1:]:
        union = union.unionByName(lv)
    dist = union.groupBy("seed", "id").agg(
        F.min("hops").cast("long").alias("d")
    )
    return dist.groupBy(F.col("seed").alias("seed_part")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("d").cast("long").alias("sum_dist"),
        F.expr(
            "CASE WHEN SUM(d) = 0 THEN NULL"
            " ELSE CAST((COUNT(1) - 1) * 1000000 div SUM(d) AS BIGINT) END"
        ).alias("closeness_micros"),
    )


_RICH_CLUB_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), deg AS (
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
), grid AS (
    SELECT UNNEST([2, 4, 8, 16]) AS k
), rich AS (
    SELECT g.k, d.id FROM grid g JOIN deg d ON d.d > g.k
), nk AS (
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rich FROM rich GROUP BY k
), ek AS (
    SELECT r1.k, CAST(COUNT(*) AS BIGINT) AS e_rich_directed
    FROM edges e
    JOIN rich r1 ON r1.id = e.src
    JOIN rich r2 ON r2.id = e.dst AND r2.k = r1.k
    GROUP BY r1.k
)
SELECT nk.k, nk.n_rich,
       CAST(COALESCE(ek.e_rich_directed, 0) / 2 AS BIGINT) AS e_rich,
       CASE WHEN nk.n_rich < 2 THEN NULL
            ELSE CAST(COALESCE(ek.e_rich_directed, 0) * 1000000
                      // (nk.n_rich * (nk.n_rich - 1)) AS BIGINT)
            END AS phi_micros
FROM nk LEFT JOIN ek ON ek.k = nk.k
"""


@register(
    "graph_rich_club_coefficient", oracle=_RICH_CLUB_ORACLE, tags=("graph",)
)
def graph_rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the co-purchase graph at a fixed
    degree grid — "do the hubs preferentially trade with each other?":
    φ(k) = E_{>k} / (N_{>k}·(N_{>k}−1)) is the edge density of the
    subgraph induced by nodes of degree > k (directed-pair convention;
    the symmetric edge table double-counts, so e_rich halves it back).
    A rising φ(k) is the hub-oligarchy signature assortativity
    (`graph_assortativity`) summarizes into one number but can't
    localize; flat φ(k) with high max degree means hubs are
    distribution centers, not a club.

    Scale shape: ONE degree fold over the edge table; the 4-row k grid
    joins against it (each node lands in every tier below its degree —
    a ≤4× fan-out of the NODE table, not the edges); the induced-edge
    count is two hash joins of edges against the per-tier rich sets
    keyed on node id. Exact integer counts; φ exits as a truncating
    micro division. Tiers with < 2 rich nodes pin NULL (density
    undefined)."""
    # MERGE hint vetoes the misestimate-driven broadcast of the edge
    # list into the induced-edge joins — see graph_bfs_hops.
    edges = (
        _edges_directed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .localCheckpoint(eager=False)
        .hint("merge")
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    grid = spark.range(4).select(
        F.element_at(
            F.array(F.lit(2), F.lit(4), F.lit(8), F.lit(16)),
            (F.col("id") + 1).cast("int"),
        ).alias("k")
    )
    rich = deg.crossJoin(F.broadcast(grid)).where(
        F.col("d") > F.col("k")
    ).select("k", "id")
    nk = rich.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_rich")
    )
    r1 = rich.select(F.col("k").alias("k1"), F.col("id").alias("src"))
    r2 = rich.select(F.col("k").alias("k2"), F.col("id").alias("dst"))
    ek = (
        edges.join(r1, "src")
        .join(r2, ["dst"])
        .where(F.col("k1") == F.col("k2"))
        .groupBy(F.col("k1").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("e_rich_directed"))
    )
    return nk.join(ek, "k", "left").select(
        "k",
        "n_rich",
        F.expr(
            "CAST(COALESCE(e_rich_directed, 0) div 2 AS BIGINT)"
        ).alias("e_rich"),
        F.expr(
            "CASE WHEN n_rich < 2 THEN NULL"
            " ELSE CAST(COALESCE(e_rich_directed, 0) * 1000000"
            " div (n_rich * (n_rich - 1)) AS BIGINT) END"
        ).alias("phi_micros"),
    )


_POWERLAW_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), deg AS (
    SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY src
), dist AS (
    SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY d
), ccdf AS (
    SELECT d,
           CAST((SELECT SUM(cnt) FROM dist) AS BIGINT)
           - CAST(COALESCE(SUM(cnt) OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_ge
    FROM dist
), hill AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
           SUM(LN(CAST(d AS DOUBLE) / 4.0)) AS sln
    FROM deg WHERE d >= 4
), fit AS (
    SELECT REGR_SLOPE(LN(CAST(n_ge AS DOUBLE)), LN(CAST(d AS DOUBLE)))
               AS slope,
           REGR_R2(LN(CAST(n_ge AS DOUBLE)), LN(CAST(d AS DOUBLE))) AS r2,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM ccdf WHERE d >= 1
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(MAX(d) AS BIGINT) FROM deg) AS max_degree,
       f.n_points,
       CASE WHEN f.n_points < 3 THEN NULL
            ELSE ROUND(1.0 - f.slope, 4) END AS alpha_ccdf,
       CASE WHEN f.n_points < 3 THEN NULL ELSE ROUND(f.r2, 4) END
           AS ccdf_fit_r2,
       CASE WHEN h.n_tail = 0 OR h.sln <= 0 THEN NULL
            ELSE ROUND(1.0 + h.n_tail / h.sln, 4) END AS alpha_hill,
       h.n_tail AS hill_tail_n
FROM fit f, hill h
"""


@register(
    "graph_powerlaw_degree_fit", oracle=_POWERLAW_ORACLE, tags=("graph",)
)
def graph_powerlaw_degree_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law fit of the co-purchase degree distribution — "is this a
    scale-free graph, and what's its exponent?": two estimators that
    should agree on a true power law and diverge diagnostically when
    they don't. (1) the log-log CCDF regression (α = 1 − slope; CCDF
    regression, not the raw histogram — binning noise in the sparse
    tail biases the histogram fit, the classic Clauset-Shalizi-Newman
    critique), and (2) the Hill/MLE estimator α̂ = 1 + n/Σ ln(d/d_min)
    at d_min = 4, the CSN-recommended form. Exponent drift across
    snapshots signals a structural change (bot rings, catalog
    consolidation) degree means never show.

    Scale shape: one degree fold over the edges, one fold to the
    distinct-DEGREE grain (bounded by max degree — slow-growing), the
    CCDF as one cumulative window over that tiny grain, the Hill sum
    as one aggregate over nodes. Exact integer counts in; the two
    regressions/ratios are shared double expressions (ROUND 4).
    Degenerate tails (n_tail = 0, < 3 CCDF points) pin NULL."""
    edges = _edges_directed(
        load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    dist = deg.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.max("d").cast("long").alias("max_degree"),
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    ccdf = dist.crossJoin(F.broadcast(tot)).select(
        "d",
        (
            F.col("n_nodes")
            - F.coalesce(F.sum("cnt").over(wd), F.lit(0))
        ).cast("long").alias("n_ge"),
    )
    hill = deg.where(F.col("d") >= 4).agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.sum(F.expr("LN(CAST(d AS DOUBLE) / 4.0)")).alias("sln"),
    )
    fit = ccdf.agg(
        F.regr_slope(
            F.ln(F.col("n_ge").cast("double")),
            F.ln(F.col("d").cast("double")),
        ).alias("slope"),
        F.regr_r2(
            F.ln(F.col("n_ge").cast("double")),
            F.ln(F.col("d").cast("double")),
        ).alias("r2"),
        F.count(F.lit(1)).cast("long").alias("n_points"),
    )
    return (
        fit.crossJoin(F.broadcast(hill))
        .crossJoin(F.broadcast(tot))
        .select(
            "n_nodes",
            "max_degree",
            "n_points",
            F.expr(
                "CASE WHEN n_points < 3 THEN NULL"
                " ELSE ROUND(1.0 - slope, 4) END"
            ).alias("alpha_ccdf"),
            F.expr(
                "CASE WHEN n_points < 3 THEN NULL ELSE ROUND(r2, 4) END"
            ).alias("ccdf_fit_r2"),
            F.expr(
                "CASE WHEN n_tail = 0 OR sln <= 0 THEN NULL"
                " ELSE ROUND(1.0 + n_tail / sln, 4) END"
            ).alias("alpha_hill"),
            F.col("n_tail").alias("hill_tail_n"),
        )
    )


#: Betweenness sampling: seed count and the 1e9 dependency quantizer —
#: δ contributions fold as floor(σ_v·(1e9 + δ_w)/σ_w), all exact integer
#: algebra in DECIMAL(38)/HUGEINT (identical truncation both engines).
_BETW_SEEDS = 4

_BETWEENNESS_ORACLE = f"""
WITH capped AS ({_CAPPED_ITEMS_SQL}
), edges AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM capped a JOIN capped b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
), seeds AS (
    SELECT src AS seed FROM (
        SELECT src, COUNT(DISTINCT dst) AS deg FROM edges GROUP BY src
    ) ORDER BY deg DESC, src LIMIT {_BETW_SEEDS}
), l0 AS (
    SELECT seed, seed AS id, CAST(1 AS HUGEINT) AS sigma FROM seeds
), l1 AS (
    SELECT l0.seed, e.dst AS id, CAST(SUM(l0.sigma) AS HUGEINT) AS sigma
    FROM edges e JOIN l0 ON e.src = l0.id
    GROUP BY l0.seed, e.dst
    HAVING NOT EXISTS (
        SELECT 1 FROM l0 p WHERE p.seed = l0.seed AND p.id = e.dst)
), l2 AS (
    SELECT l1.seed, e.dst AS id, CAST(SUM(l1.sigma) AS HUGEINT) AS sigma
    FROM edges e JOIN l1 ON e.src = l1.id
    GROUP BY l1.seed, e.dst
    HAVING NOT EXISTS (
        SELECT 1 FROM l0 p WHERE p.seed = l1.seed AND p.id = e.dst)
       AND NOT EXISTS (
        SELECT 1 FROM l1 p WHERE p.seed = l1.seed AND p.id = e.dst)
), l3 AS (
    SELECT l2.seed, e.dst AS id, CAST(SUM(l2.sigma) AS HUGEINT) AS sigma
    FROM edges e JOIN l2 ON e.src = l2.id
    GROUP BY l2.seed, e.dst
    HAVING NOT EXISTS (
        SELECT 1 FROM l0 p WHERE p.seed = l2.seed AND p.id = e.dst)
       AND NOT EXISTS (
        SELECT 1 FROM l1 p WHERE p.seed = l2.seed AND p.id = e.dst)
       AND NOT EXISTS (
        SELECT 1 FROM l2 p WHERE p.seed = l2.seed AND p.id = e.dst)
), d2 AS (
    SELECT v.seed, v.id,
           CAST(SUM((v.sigma * (1000000000 + 0)
                     - (v.sigma * (1000000000 + 0)) % w.sigma)
                    / w.sigma) AS HUGEINT) AS dq
    FROM l2 v JOIN edges e ON e.src = v.id
    JOIN l3 w ON w.seed = v.seed AND w.id = e.dst
    GROUP BY v.seed, v.id
), d1 AS (
    SELECT v.seed, v.id,
           CAST(SUM((v.sigma * (1000000000 + COALESCE(d2.dq, 0))
                     - (v.sigma * (1000000000 + COALESCE(d2.dq, 0)))
                       % w.sigma)
                    / w.sigma) AS HUGEINT) AS dq
    FROM l1 v JOIN edges e ON e.src = v.id
    JOIN l2 w ON w.seed = v.seed AND w.id = e.dst
    LEFT JOIN d2 ON d2.seed = w.seed AND d2.id = w.id
    GROUP BY v.seed, v.id
), alld AS (
    SELECT seed, id, dq FROM d1
    UNION ALL
    SELECT seed, id, dq FROM d2
)
SELECT id AS part, CAST(SUM(dq) AS BIGINT) AS betweenness_nanos,
       CAST(COUNT(DISTINCT seed) AS BIGINT) AS n_seeds
FROM alld GROUP BY id
HAVING SUM(dq) > 0
"""


@register(
    "graph_betweenness_sampled",
    oracle=_BETWEENNESS_ORACLE,
    tags=("graph",),
)
def graph_betweenness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled betweenness centrality (Brandes 2001, seed-sampled as in
    Brandes–Pich 2007) over the co-purchase graph, truncated at 3 hops —
    the bridge/bottleneck centrality the rest of the family cannot see:
    pagerank/HITS reward being POPULAR, closeness rewards being NEAR,
    betweenness rewards being BETWEEN (on many shortest paths), the
    quantity that finds broker nodes. Exact betweenness is all-pairs;
    production computes exactly this seed-sampled truncated form.

    Forward pass: level-synchronous BFS with DISJOINT level sets and
    exact path counts σ (σ(v, k) = Σ over in-edges from level k−1 —
    integer, the l0/l1/l2/l3 anti-join ladder). Backward pass (the
    Brandes accumulation δ(v) = Σ σ_v/σ_w·(1+δ_w)): dependencies are
    INTEGER-quantized as δq(v) = Σ floor(σ_v·(1e9 + δq_w)/σ_w) — the
    divisible-numerator exact-floor trick in DECIMAL(38)/HUGEINT, so
    the two engines' sums are identical by construction (no float
    anywhere) and betweenness_nanos is an exact BIGINT hash. Per-seed
    frontier cost is the closeness ladder's; the backward pass is two
    more level-aligned equi-joins. Output: every node on ≥ 1 shortest
    path between a seed and its ball, with its summed quantized
    dependency."""
    # MERGE hint vetoes the misestimate-driven broadcast of the edge
    # list — see graph_bfs_hops.
    edges = (
        _edges_directed(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .localCheckpoint(eager=False)
        .hint("merge")
    )
    seeds = (
        edges.groupBy("src")
        .agg(F.countDistinct("dst").alias("deg"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(_BETW_SEEDS)
        .select(F.col("src").alias("seed"))
    )
    l0 = seeds.select(
        "seed", F.col("seed").alias("id"),
        F.lit(1).cast("decimal(38,0)").alias("sigma"),
    ).localCheckpoint(eager=False)

    def next_level(prev: DataFrame, *earlier: DataFrame) -> DataFrame:
        nxt = (
            edges.join(prev, edges["src"] == prev["id"])
            .groupBy("seed", F.col("dst").alias("nid"))
            .agg(F.sum("sigma").cast("decimal(38,0)").alias("sigma"))
            .withColumnRenamed("nid", "id")
        )
        for lv in earlier:
            nxt = nxt.join(
                lv.select("seed", "id"), ["seed", "id"], "left_anti"
            )
        return nxt.localCheckpoint(eager=False)

    l1 = next_level(l0, l0)
    l2 = next_level(l1, l0, l1)
    l3 = next_level(l2, l0, l1, l2)

    def back_level(v: DataFrame, w: DataFrame, dq_w: DataFrame | None):
        wd = w.select(
            F.col("seed").alias("ws"),
            F.col("id").alias("wid"),
            F.col("sigma").alias("wsig"),
        )
        if dq_w is not None:
            wd = wd.join(
                dq_w.select(
                    F.col("seed").alias("ws"),
                    F.col("id").alias("wid"),
                    "dq",
                ),
                ["ws", "wid"],
                "left",
            ).select(
                "ws", "wid", "wsig",
                F.coalesce(F.col("dq"), F.lit(0).cast("decimal(38,0)")).alias(
                    "dqw"
                ),
            )
        else:
            wd = wd.select(
                "ws", "wid", "wsig",
                F.lit(0).cast("decimal(38,0)").alias("dqw"),
            )
        num = "CAST(sigma * (1000000000 + dqw) AS DECIMAL(38,0))"
        return (
            v.join(edges, v["id"] == edges["src"])
            .join(
                wd,
                (F.col("ws") == v["seed"]) & (F.col("wid") == edges["dst"]),
            )
            .groupBy(v["seed"], v["id"])
            .agg(
                F.sum(
                    F.expr(f"CAST(({num} - {num} % wsig) / wsig"
                           " AS DECIMAL(38,0))")
                ).cast("decimal(38,0)").alias("dq")
            )
        )

    d2 = back_level(l2, l3, None).localCheckpoint(eager=False)
    d1 = back_level(l1, l2, d2)
    alld = d1.unionByName(d2)
    return (
        alld.groupBy(F.col("id").alias("part"))
        .agg(
            F.sum("dq").cast("long").alias("betweenness_nanos"),
            F.countDistinct("seed").cast("long").alias("n_seeds"),
        )
        .where(F.col("betweenness_nanos") > 0)
    )


_KTRUSS_K = 3
#: Same defensive backstop contract as graph_kcore: each non-fixpoint
#: round strictly removes at least one edge, so rounds are bounded by
#: |E|; hitting the cap means a checkpointing bug and the loop RAISES.
_KTRUSS_MAX_ITERS = 10_000


@register("graph_ktruss", oracle=None, tags=("graph",))
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss decomposition (k=3) of the part co-purchase graph:
    iteratively drop every edge whose SUPPORT (number of triangles it
    closes) is below k−2, recomputing supports after each peel, until
    fixpoint. The edge-grained sharpening of `graph_kcore`: a k-core
    keeps nodes with enough neighbors, a k-truss keeps edges embedded
    in enough mutual-neighbor structure — the standard cohesive-
    subgraph ladder (Cohen 2008), and the cheaper community-core
    primitive that seeded truss-based community search.

    Per round, supports come from the SAME compact-forward kernel as
    `graph_triangle_count`: orient by (degree, id) — max out-degree
    O(sqrt m), total intersection work O(m^1.5) honest pricing, never
    all-pairs — enumerate each triangle once via adjacency-array
    intersection, and explode it back onto its three undirected edges
    for one support fold. (An id-only orientation GC-thrashed at sf0.1:
    hub parts keep their whole neighborhood in the wedge set; degree
    ordering is the scale guarantee, not a nicety.) The driver loop follows the
    kcore fixpoint discipline verbatim: localCheckpoint per round,
    scalar counts only, RAISE on the unreachable iteration cap.
    ⊘ rows-only (fixpoint iteration isn't single-statement SQL); the
    pytest gates pin: surviving supports ≥ k−2 recomputed in pure
    Python on the final edge set, monotone edge-count shrinkage, and
    agreement with a sequential k-truss replica on the capped graph."""
    edges = (
        _edges_undirected(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .localCheckpoint()
        # MERGE hint vetoes the misestimate-driven broadcast of the edge
        # list into the per-round wedge/support joins — see graph_bfs_hops.
        .hint("merge")
    )
    prev_m = -1
    supports = None
    for it in range(_KTRUSS_MAX_ITERS + 1):
        if it == _KTRUSS_MAX_ITERS:
            raise RuntimeError(
                f"graph_ktruss: no fixpoint after {_KTRUSS_MAX_ITERS} "
                "peel rounds — monotone edge peeling cannot do this; "
                "checkpointing bug"
            )
        # Compact-forward enumeration per round (graph_triangle_count's
        # kernel): orient by (degree, id) so max out-degree is O(sqrt m)
        # — the id-only orientation first tried here GC-thrashed at
        # sf0.1 because hub parts kept their full neighborhoods in the
        # wedge join. Each triangle surfaces once, at the oriented edge
        # whose endpoints both point at w; all three UNDIRECTED edges
        # then get one support credit.
        deg = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        du = deg.select(F.col("node").alias("src"), F.col("deg").alias("du"))
        dv = deg.select(F.col("node").alias("dst"), F.col("deg").alias("dv"))
        oriented = (
            edges.join(du, "src")
            .join(dv, "dst")
            .select(
                F.when(
                    (F.col("du") < F.col("dv"))
                    | (
                        (F.col("du") == F.col("dv"))
                        & (F.col("src") < F.col("dst"))
                    ),
                    F.struct(F.col("src").alias("s"), F.col("dst").alias("d")),
                )
                .otherwise(
                    F.struct(F.col("dst").alias("s"), F.col("src").alias("d"))
                )
                .alias("e")
            )
            .select(F.col("e.s").alias("os"), F.col("e.d").alias("od"))
            .localCheckpoint()
        )
        adj = oriented.groupBy("os").agg(
            F.sort_array(F.collect_list("od")).alias("nbrs")
        )
        tri_edges = (
            oriented.join(
                adj.select(
                    F.col("os").alias("u_key"), F.col("nbrs").alias("nbrs_u")
                ),
                F.col("os") == F.col("u_key"),
            )
            .join(
                adj.select(
                    F.col("os").alias("v_key"), F.col("nbrs").alias("nbrs_v")
                ),
                F.col("od") == F.col("v_key"),
            )
            .select(
                "os", "od", F.array_intersect("nbrs_u", "nbrs_v").alias("ws")
            )
            .select("os", "od", F.explode("ws").alias("w"))
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.least("os", "od").alias("src"),
                            F.greatest("os", "od").alias("dst"),
                        ),
                        F.struct(
                            F.least("os", "w").alias("src"),
                            F.greatest("os", "w").alias("dst"),
                        ),
                        F.struct(
                            F.least("od", "w").alias("src"),
                            F.greatest("od", "w").alias("dst"),
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
        )
        supports = (
            edges.join(
                tri_edges.groupBy("src", "dst").agg(
                    F.count(F.lit(1)).cast("long").alias("support")
                ),
                ["src", "dst"],
                "left",
            )
            .select(
                "src",
                "dst",
                F.coalesce(F.col("support"), F.lit(0)).alias("support"),
            )
            .localCheckpoint()
        )
        kept = supports.where(
            F.col("support") >= F.lit(_KTRUSS_K - 2)
        ).select("src", "dst")
        m = kept.count()
        if m == prev_m:
            break
        prev_m = m
        edges = kept.localCheckpoint()
    return (
        supports.where(F.col("support") >= F.lit(_KTRUSS_K - 2))
        .orderBy(F.desc("support"), F.asc("src"), F.asc("dst"))
        .limit(100)
    )
