"""Similarity search over `embeddings.embedding ARRAY<FLOAT>` —
SURVEY.md §2.11 op #47.

Two tiers, per the declared scale story:
  - brute-force cosine top-k: broadcast the (small) query set against the
    candidate stream; exact, oracle-checked — the correctness baseline.
  - sign-LSH (random-hyperplane) bucketed top-k: deterministic hyperplanes
    from a fixed-seed generator, multi-probe by Hamming distance on the
    sketch; ⊘ approximate — pytest measures recall against brute force.

All vector math is built-in higher-order functions (functions/vectors.py);
the LSH sketch reduces each 64-float vector to one long, so the candidate
filter compares 8-byte keys, not vectors.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.functions.vectors import (
    as_double_array,
    dot,
    norm,
)
from recommendation_system_big_data_spark.registry import register

TOP_K = 10
N_QUERIES = 20  # vec_id < 20 form the deterministic query set

_SIM_ORACLE = f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS c
    FROM q JOIN e ON e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, ROUND(c, 6) AS cos_sim, rn FROM (
    SELECT query_id, neighbor_id, c,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ROUND(c, 6) DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOP_K}
"""


@register("sim_topk_bruteforce", oracle=_SIM_ORACLE, tags=("similarity", "headline"))
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast queries × streamed candidates → window
    top-k per query. The candidate table is scanned once and never shuffled
    until the (tiny) per-query rank; ordering ranks on the ROUNDED cosine so
    last-ulp engine differences cannot flip neighbors at the cut line."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nv", norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    # Norms fold once per row on each side — the scored stage touches
    # |q|·n pairs and pays one dot product each, not three array folds
    # (bit-identical to cosine(): same fold order, same multiply order).
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6)
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


N_PLANES = 16
_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Fixed-seed random hyperplanes — plain Python constants, shipped into
    the plan as literals; no RNG at execution time."""
    rng = random.Random(42)
    return [[rng.uniform(-1.0, 1.0) for _ in range(_DIM)] for _ in range(N_PLANES)]


def sign_sketch(v) -> F.Column:  # type: ignore[name-defined]
    """N_PLANES-bit sign sketch of a double array packed into one long."""
    planes = _hyperplanes()
    bits = []
    for j, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(x) for x in plane])
        d = F.aggregate(
            F.zip_with(v, plane_col, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bits.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        )
    return sum(bits[1:], bits[0])


def kmeans_centroids(
    e: DataFrame, n_iter: int = 2, train_per_list: int = 64
) -> DataFrame:
    """Deterministic Lloyd k-means over (vec_id, v) in pure DataFrame ops:
    n_lists ≈ √n centroids (the standard IVF sizing — cell count AND
    cell size both grow as √n, so assignment cost is n·√n instead of
    the n²/k of a fixed stride; seeds are every ⌊n/n_lists⌋-th vector,
    reproducible, no RNG), then ``n_iter`` rounds of assign-to-nearest
    (one broadcast(centroids) pass, argmax cosine with centroid_id
    tiebreak) and recompute (element-wise mean via posexplode →
    groupBy(centroid, pos) → re-assemble sorted by position).

    SAMPLED FIT (VERDICT r6 #5, now executable): the Lloyd iterations run
    on a deterministic hash-sample of ~``train_per_list``·n_lists vectors
    (64/list default — comfortably above the ~39/list FAISS floor), taken
    with a partition-independent xxhash64 modulus so the fit is
    bit-reproducible across runs AND cluster layouts. Per-iteration cost
    becomes O(train_per_list·n) instead of O(n^1.5): at 10⁹ vectors the
    fit touches ~2·10⁶ sampled rows per pass while only the callers'
    final assignment scans every vector. On corpora at or below the
    target the filter passes everything (every == 1) — small fixtures
    keep full-data fits; tests force the sampled path with a small
    ``train_per_list`` and gate determinism + recall.

    Scale shape: each iteration is one broadcast join over the sample plus
    one combiner-friendly aggregate of dim×k cells — no all-pairs work.
    The k×d centroid model is MATERIALIZED to the driver after every
    iteration (the sanctioned small-model collect — MLlib's
    broadcast-centroid loop has the same shape): without it, iteration
    i+1's broadcast carries iteration i's entire lineage, so every
    DOWNSTREAM consumer of the returned frame (cell assignment, query
    probing) re-executes the whole Lloyd fit per use (sim_topk_ivfpq
    warm-min 7.7s → 6.6s at sf0.1; the win grows with consumers and
    with n_iter). The driver scalars here are that k×d model and the
    corpus COUNT that sizes n_lists. Corpus-level consumers should go
    through ``corpus_centroids`` below, which memoizes the fitted model
    per (session, corpus); this function is the raw fit API (tests,
    non-corpus frames)."""
    import math

    spark = e.sparkSession
    n = e.count()
    nlist = max(16, math.isqrt(max(n - 1, 0)) + 1)
    stride = max(1, n // nlist)
    cent = e.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    every = max(1, n // max(train_per_list * nlist, 1))
    train = (
        e
        if every == 1
        else e.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(every)) == 0)
    ).withColumn("tnv", norm(F.col("v")))
    for _ in range(n_iter):
        # Train-row norms fold once outside the loop, centroid norms once
        # per centroid on the broadcast side — the sample×k assignment
        # pays one dot product per pair (bit-identical to cosine()).
        # topk_cells_narrow keeps the d-dim train vectors out of the rank
        # exchange; the recompute below gets v back from the rejoin.
        assigned = topk_cells_narrow(
            train,
            "vec_id",
            "v",
            "tnv",
            cent.withColumn("ncv", norm(F.col("cv"))),
            "centroid_id",
            "cv",
            "ncv",
            1,
        ).select("vec_id", "v", "centroid_id")
        cent = (
            assigned.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        cent = spark.createDataFrame(
            cent.collect(), schema="centroid_id long, cv array<double>"
        )
    return cent


#: Session-scoped fitted ANN models: (applicationId, sf_dir, kind) →
#: driver-side model (centroid rows / PQ codebook lists). The engine's
#: three IVF consumers (sim_topk_ivf, sim_topk_ivfpq,
#: dedup_semantic_semdedup) and three PQ consumers (sim_topk_pq_adc,
#: sim_topk_ivfpq, embedding_pq_compress) all fit the SAME model over the
#: same corpus — a production ANN service trains the quantizer once and
#: serves every probe from it, exactly like the shingle index caches the
#: dedup corpus (operators/dedup.py::shingle_index; cold/warm contract
#: documented in BASELINE.md). Models are k×d / M·K·d_sub driver values
#: (a few hundred KB), so eviction needs no unpersist; entries from
#: stopped sessions drop on the next call.
#: Cap = model kinds (ivf_centroids, coarse_centroids, pq_codebooks) ×
#: corpora a session realistically interleaves (the test suite alternates
#: sf0.001/sf0.01, bench adds sf0.1) — 3×3 rounded up. A cap of 4 caused
#: evict-and-refit thrash on every sf_dir interleave.
_FITTED_MODELS: dict[tuple, object] = {}
_FITTED_MODELS_MAX = 12


def _session_model(spark: SparkSession, key_tail: tuple, build):
    app_id = spark.sparkContext.applicationId
    key = (app_id,) + key_tail
    for k in [k for k in _FITTED_MODELS if k[0] != app_id]:
        _FITTED_MODELS.pop(k)
    if key in _FITTED_MODELS:
        # true LRU: a hit moves to the back so interleaved corpora don't
        # evict each other's hot models
        _FITTED_MODELS[key] = _FITTED_MODELS.pop(key)
        return _FITTED_MODELS[key]
    model = build()  # may recursively insert (hier IVF builds coarse first)
    _FITTED_MODELS[key] = model
    while len(_FITTED_MODELS) > _FITTED_MODELS_MAX:
        _FITTED_MODELS.pop(next(iter(_FITTED_MODELS)))
    return model


def corpus_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical (vec_id, v) projection every ANN operator indexes."""
    return load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )


def corpus_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus's fitted IVF coarse quantizer, trained once per session
    (deterministic — cached and fresh fits are identical rows)."""
    rows = _session_model(
        spark,
        (sf_dir, "ivf_centroids"),
        lambda: kmeans_centroids(corpus_vectors(spark, sf_dir)).collect(),
    )
    return spark.createDataFrame(
        rows, schema="centroid_id long, cv array<double>"
    )


def corpus_pq_codebooks(spark: SparkSession, sf_dir: str) -> list:
    """The corpus's fitted PQ codebooks, trained once per session."""
    return _session_model(
        spark,
        (sf_dir, "pq_codebooks"),
        lambda: _pq_fit_codebooks(corpus_vectors(spark, sf_dir)),
    )


@register("sim_topk_ivf", oracle=None, tags=("similarity",))
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: ~√n coarse
    centroids from a deterministic 2-iteration Lloyd refinement
    (kmeans_centroids — stride-seeded, no RNG anywhere, so results are
    stable across runs AND cluster sizes), each vector assigned to its
    nearest centroid, queries probe the 4 nearest centroid lists and
    re-rank exactly. ⊘ approximate; recall vs brute force gated in
    tests/test_similarity.py.

    Scale shape: assignment is one broadcast(centroids) pass; the probe
    joins query→probed-centroid→posting-list, touching n/n_lists·n_probe of
    the corpus instead of all of it. At 100 TB the posting lists are
    bucketed/partitioned by centroid_id so a probe is a partition-pruned
    scan, and kmeans_centroids runs on a corpus sample feeding this plan."""
    n_probe = 4
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    # Centroid norms fold once per centroid on the broadcast side; the
    # n×√n assignment then pays one dot product per (vector, centroid)
    # instead of three array folds (bit-identical: same fold/multiply
    # order as cosine()).
    cent = corpus_centroids(spark, sf_dir).withColumn(
        "ncv", norm(F.col("cv"))
    )
    # Assignment and probe windows run narrow (topk_cells_narrow): the
    # n×√n rank exchange carries (id, cell, score), never the vectors.
    assigned = topk_cells_narrow(
        e, "vec_id", "v", "nv", cent, "centroid_id", "cv", "ncv", 1
    ).select("vec_id", "v", "nv", "centroid_id")
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    probes = topk_cells_narrow(
        queries, "query_id", "qv", "nq", cent, "centroid_id", "cv", "ncv", n_probe
    ).select("query_id", "qv", "nq", "centroid_id")
    cand = probes.join(assigned, "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


#: Coarse cells each vector/query routes through in the two-level
#: quantizer. Routing through one coarse cell loses any vector whose true
#: nearest FINE cell sits across a coarse boundary; probing 2 recovers
#: most of that loss for a 2× routing constant (agreement with the exact
#: nearest-fine assignment is gated in tests/test_similarity.py).
N_COARSE_PROBE = 2


def corpus_coarse_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-level quantizer: Lloyd k-means over the FINE CENTROIDS
    themselves (≈√k coarse cells over the k fine cells), memoized per
    (session, corpus) like every fitted model. Input is the k×d fine
    model — driver-sized — so this fit costs k·√k dot products, noise at
    any scale."""
    rows = _session_model(
        spark,
        (sf_dir, "coarse_centroids"),
        lambda: kmeans_centroids(
            corpus_centroids(spark, sf_dir).select(
                F.col("centroid_id").alias("vec_id"), F.col("cv").alias("v")
            )
        ).collect(),
    )
    return spark.createDataFrame(
        rows, schema="centroid_id long, cv array<double>"
    ).select(F.col("centroid_id").alias("coarse_id"), F.col("cv").alias("ccv"))


def fine_to_coarse(fine: DataFrame, coarse: DataFrame) -> DataFrame:
    """Route each FINE centroid to its nearest coarse cell (k×√k dots,
    in-plan) — the "cluster the centroids" step shared by every consumer
    of the two-level quantizer. ``fine`` is (centroid_id, cv, ncv),
    ``coarse`` is (coarse_id, ccv, nccv)."""
    f2c_w = Window.partitionBy("centroid_id").orderBy(
        F.desc("fc_cos"), F.asc("coarse_id")
    )
    return (
        fine.join(F.broadcast(coarse))
        .select(
            "centroid_id",
            "cv",
            "ncv",
            "coarse_id",
            F.round(
                dot(F.col("cv"), F.col("ccv")) / (F.col("ncv") * F.col("nccv")),
                6,
            ).alias("fc_cos"),
        )
        .withColumn("rn", F.row_number().over(f2c_w))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "cv", "ncv", "coarse_id")
    )


def topk_cells_narrow(
    e: DataFrame,
    eid: str,
    ev: str,
    en: str,
    model: DataFrame,
    mid: str,
    mv: str,
    mn: str,
    k: int,
) -> DataFrame:
    """Top-k model cells per vector by rounded cosine (desc cos, asc cell
    id tiebreak — the assignment convention everywhere in this engine),
    with the rank window exchanged NARROW: the d-dim vector is projected
    away before the row_number exchange and rejoined by id afterwards,
    so the shuffle carries (id, cell, score) rows instead of d doubles
    per candidate — at the n×k assignment grain the array multiplied the
    window's exchange bytes ~20× (d=64). Interleaved same-session A/B on
    dedup_semantic_semdedup at sf0.1: 4.5-4.7s wide → 3.8-4.0s narrow;
    the at-scale case is stronger still, since the n×k exchange is the
    largest intermediate of the assignment pipeline and the one that
    scales with corpus × cells. Returns every column of ``e`` plus
    ``mid``; row-identical to ranking with the vector aboard (same
    scores, same window, same filter — bit-equality verified against the
    wide spelling on all three fixture SFs)."""
    w = Window.partitionBy(eid).orderBy(F.desc("_cos"), F.asc(mid))
    top = (
        e.select(eid, ev, en)
        .join(F.broadcast(model))
        .select(
            eid,
            mid,
            F.round(dot(F.col(ev), F.col(mv)) / (F.col(en) * F.col(mn)), 6).alias(
                "_cos"
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(eid, mid)
    )
    return e.join(top, eid)


def route_fine_cells(
    e: DataFrame,
    fine: DataFrame,
    coarse: DataFrame,
    n_fine: int,
    n_coarse: int,
    fine2coarse: DataFrame | None = None,
) -> DataFrame:
    """Two-level routed fine-cell assignment — THE core of the
    hierarchical quantizer, consumed by sim_topk_ivf_hier (build side
    n_fine=1, query side n_fine=n_probe) and dedup_semantic_semdedup's
    large-corpus path: each vector in ``e`` (vec_id, v, nv) scores the
    √k coarse cells, routes into its ``n_coarse`` nearest, scores only
    the fine centroids living there (~n_coarse·√k instead of all k), and
    keeps its ``n_fine`` nearest — O(n·√k) total, so k may grow ∝ n.
    ``fine`` is (centroid_id, cv, ncv), ``coarse`` is (coarse_id, ccv,
    nccv), both broadcast model tables; pass ``fine2coarse`` to share
    one routing table across several calls. Tiebreaks (desc cos, asc id)
    match the direct assignment everywhere else, so where routing finds
    the true nearest cells the output is row-identical to the flat
    argmax."""
    if fine2coarse is None:
        fine2coarse = fine_to_coarse(fine, coarse)
    # Both rank windows run narrow (topk_cells_narrow's layout): scores
    # are computed map-side off the broadcast model, the d-dim vector
    # never crosses a window exchange, and the kept cell ids rejoin the
    # vectors by id.
    routed = topk_cells_narrow(
        e, "vec_id", "v", "nv", coarse, "coarse_id", "ccv", "nccv", n_coarse
    )
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("centroid_id")
    )
    top_fine = (
        routed.join(F.broadcast(fine2coarse), "coarse_id")
        .select(
            "vec_id",
            "centroid_id",
            F.round(
                dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("ncv")), 6
            ).alias("c_cos"),
        )
        .withColumn("arn", F.row_number().over(assign_w))
        .filter(F.col("arn") <= n_fine)
        .select("vec_id", "centroid_id")
    )
    return e.join(top_fine, "vec_id").select("vec_id", "v", "nv", "centroid_id")


@register("sim_topk_ivf_hier", oracle=None, tags=("similarity",))
def sim_topk_ivf_hier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (hierarchical) IVF — the EXECUTABLE form of the extreme-n
    escape hatch the single-level operators declare in prose
    (kmeans_centroids / dedup_semantic_semdedup docstrings: "cluster the
    centroids so k can grow ∝ n while assignment stays n·√k").

    Single-level IVF assignment scores every vector against all k fine
    cells: with the standard k = √n sizing that is n^1.5 dot products —
    the term that forces k to stay √n. Here the k fine centroids are
    themselves clustered into ≈√k coarse cells; a vector scores the √k
    coarse cells, routes into its N_COARSE_PROBE nearest, and scores only
    the ~N_COARSE_PROBE·k/√k fine centroids living there: O(n·√k) total,
    so k may grow ∝ n (constant fine-cell size → linear intra-cell pair
    work) while assignment cost stays sub-quadratic. This is FAISS's
    IMI/two-level-coarse layout re-expressed as two broadcast joins and
    two per-vector top-k windows — no new machinery, just one more level
    of the same routing.

    Search is sim_topk_ivf's tail unchanged: queries route through the
    same two levels (with a 2·n_probe coarse probe — search-side probing
    is cheap because queries are few), probe their 4 nearest routed fine
    cells, and re-rank candidates exactly. ⊘ approximate; MEASURED: the
    routed fine assignment agrees with the exact nearest-fine assignment
    for 100% of vectors and recall@10 EQUALS single-level IVF at both
    fixture SFs (0.460 / 0.555) — the hierarchy costs nothing here while
    buying the exponent. Tests gate recall, assignment agreement, and
    determinism. At fixture scale k≈√n is small so the two-level route
    costs MORE wall-clock than direct assignment — the exponent, not the
    fixture timer, is the point (same posture as
    graph_triangle_count_doulion)."""
    n_probe = 4
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    fine = corpus_centroids(spark, sf_dir).withColumn("ncv", norm(F.col("cv")))
    coarse = corpus_coarse_centroids(spark, sf_dir).withColumn(
        "nccv", norm(F.col("ccv"))
    )
    # Fine centroids route to their nearest coarse cell once (the
    # "cluster the centroids" step), shared by the build- and query-side
    # routing below (round-9 refactor: both sides now call the SAME
    # route_fine_cells helper that dedup_semantic_semdedup's large-corpus
    # path uses, so a tiebreak or rounding tweak cannot desynchronize the
    # consumers).
    fine2coarse = fine_to_coarse(fine, coarse)
    # Build side: every vector routes through N_COARSE_PROBE coarse cells
    # and keeps its single nearest fine cell — the only corpus-wide pass.
    assigned = route_fine_cells(
        e, fine, coarse, n_fine=1, n_coarse=N_COARSE_PROBE, fine2coarse=fine2coarse
    )
    # Queries re-route with a WIDER coarse probe (standard IVF practice:
    # search-side probing ≫ build-side — queries are few, so the extra
    # routing is free) and keep their n_probe nearest fine cells among
    # the routed candidates. Measured at sf0.01: the 2-coarse-cell query
    # route capped recall@10 at 0.37 because globally 3rd/4th-best fine
    # cells often live in a third coarse cell; 2·n_probe coarse cells
    # recover the single-level probe set almost exactly.
    probes = route_fine_cells(
        e.filter(F.col("vec_id") < N_QUERIES),
        fine,
        coarse,
        n_fine=n_probe,
        n_coarse=2 * n_probe,
        fine2coarse=fine2coarse,
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
        "centroid_id",
    )
    cand = probes.join(assigned, "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


N_BANDS = 4
_BAND_BITS = N_PLANES // N_BANDS  # 4-bit bands over the 16-plane sketch


def _band_val(sketch: F.Column, band: int) -> F.Column:
    """Extract band ``band`` (``_BAND_BITS`` bits) of a packed sketch."""
    mask = (1 << _BAND_BITS) - 1
    return F.shiftright(sketch, band * _BAND_BITS).bitwiseAND(F.lit(mask))


@register("sim_topk_lsh", oracle=None, tags=("similarity",))
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via sign-LSH banding: bucket equi-join, no pairwise
    scan.

    The 16-plane sketch splits into 4 bands of 4 bits. The corpus emits one
    narrow (vec_id, band_id, band_val) index row per band; each query emits
    its own band values plus every 1-bit variation (multi-probe: 4 bands ×
    5 probes = 20 keys/query). Candidates come from a hash **equi-join** on
    (band_id, band_val) — the candidate stream is whatever shares a bucket,
    never all n×q pairs — then are deduped and exactly re-ranked, fetching
    vectors by key so the band index stays 3 small ints wide. ⊘ rows-only
    (approximate; recall vs brute force gated in tests/test_similarity.py,
    equi-join plan shape asserted in tests/test_plans.py).

    Tuning story: for a neighbor at cosine c the per-plane disagree
    probability is p = acos(c)/π; a band matches within 1 flipped bit with
    (1-p)^4 + 4p(1-p)^3, so even this test data's weak c≈0.35 neighbors
    (p≈0.39 — barely better than noise) reach ~0.94 recall across 4 bands.
    At 100 TB the corpus is real near-dups (c≥0.8 → p≤0.2): exact-band
    match alone recalls >0.95 and the probe set shrinks to 4 keys/query,
    while the posting lists are written bucketed by (band_id, band_val) so
    a probe is a partition-pruned lookup, not a scan."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    # Stage the (expensive) sketch through its own projection so the band
    # extraction below reuses one materialized value instead of inlining the
    # 16-plane dot products once per band.
    sk = e.select("vec_id", sign_sketch(F.col("v")).alias("sketch"))
    corpus_bands = sk.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        _band_val(F.col("sketch"), b).alias("band_val"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "bk.band_id", "bk.band_val")
    probe_structs = []
    for b in range(N_BANDS):
        base = _band_val(F.col("sketch"), b)
        for probe in [base] + [
            base.bitwiseXOR(F.lit(1 << i)) for i in range(_BAND_BITS)
        ]:
            probe_structs.append(
                F.struct(F.lit(b).alias("band_id"), probe.alias("band_val"))
            )
    query_probes = (
        sk.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.array(*probe_structs)).alias("bk"),
        )
        .select("query_id", "bk.band_id", "bk.band_val")
    )
    cand = (
        corpus_bands.join(F.broadcast(query_probes), ["band_id", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        norm(F.col("v")).alias("nq"),
    )
    # Norms fold once per corpus row / query row; the candidate re-rank
    # (the bucket-join fan-out, the query's widest stage) then pays one
    # dot product per pair instead of three array folds (bit-identical
    # to cosine(): same fold/multiply order).
    scored = (
        e.withColumn("nv", norm(F.col("v")))
        .join(cand, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


_CENTROID_ORACLE = """
SELECT label, pos,
       ROUND(AVG(CAST(v AS DOUBLE)), 6) AS centroid,
       COUNT(*) AS n
FROM (
    SELECT label,
           unnest(embedding) AS v,
           generate_subscripts(embedding, 1) - 1 AS pos
    FROM embeddings
)
GROUP BY label, pos
"""


@register("embedding_centroids", oracle=_CENTROID_ORACLE, tags=("similarity",))
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector (class prototypes / k-means M-step), emitted as
    (label, dimension, value) rows rather than reassembled arrays.

    posexplode flattens the corpus to one row per (vector, dimension) and a
    single hash aggregate on (label, pos) averages each coordinate — pure
    map-side-combine, one shuffle of (labels × dims) partial states no
    matter how many vectors stream through, which is exactly how a 100 TB
    corpus computes prototypes: state is O(classes × dims), data is
    touched once. The row-per-dimension output keeps the result oracle-
    hashable and feeds straight into a pivot or array_agg if a caller wants
    packed vectors (see kmeans_centroids above for the packed in-engine
    variant used by IVF). Double-precision averaging of ≤ thousands of
    float32 values per group stays far inside the ROUND(,6) tolerance."""
    return (
        load(spark, sf_dir, "embeddings")
        .selectExpr("label", "posexplode(embedding) AS (pos, v)")
        .groupBy("label", "pos")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_QUANTIZE_ORACLE = """
SELECT vec_id,
       len(embedding) AS n_dims,
       CAST(list_aggregate(
           list_transform(embedding, v ->
               CASE WHEN sc = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(LEAST(FLOOR((CAST(v AS DOUBLE) - lo) / sc), 255) AS BIGINT)
               END),
           'sum') AS BIGINT) AS q_sum,
       ROUND(lo, 6) AS v_min,
       ROUND(hi, 6) AS v_max
FROM (
    SELECT vec_id, embedding,
           CAST(list_min(embedding) AS DOUBLE) AS lo,
           CAST(list_max(embedding) AS DOUBLE) AS hi,
           (CAST(list_max(embedding) AS DOUBLE)
            - CAST(list_min(embedding) AS DOUBLE)) / 255 AS sc
    FROM embeddings
)
"""


@register("embedding_quantize_int8", oracle=_QUANTIZE_ORACLE, tags=("similarity",))
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector uint8 scalar quantization — the 4× memory compression
    step before ANN serving (a 100 TB float32 corpus becomes 25 TB and the
    dot products become integer SIMD). Each vector carries its own (min,
    scale) codebook: q_i = clamp(floor((v_i - min)/scale), 0, 255).

    All math is JVM-side higher-order array functions (transform /
    aggregate) — no UDF, no explode: one projection per row regardless of
    dimensionality. The checked output is the quantized-value checksum and
    the codebook (exact integers + rounded bounds), engine-portable
    because both sides evaluate the identical IEEE double expression;
    constant vectors (sc = 0) quantize to bucket 0 on both engines rather
    than dividing by zero. Reconstruction-error bound (≤ one quantization
    step per coordinate) is asserted in tests/test_similarity.py."""
    lo = F.array_min("embedding").cast("double")
    hi = F.array_max("embedding").cast("double")
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding", lo.alias("lo"), hi.alias("hi"))
        .withColumn("sc", (F.col("hi") - F.col("lo")) / 255)
    )
    # A constant vector has sc = 0; dividing would make NaNs that the two
    # engines cast differently — map every coordinate to bucket 0 instead
    # (the codebook (lo, sc=0) reconstructs it exactly anyway).
    quant = F.transform(
        "embedding",
        lambda v: F.when(F.col("sc") == 0, F.lit(0).cast("long")).otherwise(
            F.least(
                F.floor((v.cast("double") - F.col("lo")) / F.col("sc")), F.lit(255)
            ).cast("long")
        ),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.aggregate(quant, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "q_sum"
        ),
        F.round("lo", 6).alias("v_min"),
        F.round("hi", 6).alias("v_max"),
    )


KNN_K = 5

_KNN_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, e.label,
           ROW_NUMBER() OVER (
               PARTITION BY q.query_id
               ORDER BY ROUND(list_dot_product(q.qv, e.v)
                        / (sqrt(list_dot_product(q.qv, q.qv))
                           * sqrt(list_dot_product(e.v, e.v))), 6) DESC,
                        e.vec_id ASC) AS rn
    FROM q JOIN e ON e.vec_id != q.query_id
), votes AS (
    SELECT query_id, label, COUNT(*) AS votes
    FROM scored WHERE rn <= {KNN_K}
    GROUP BY query_id, label
)
SELECT query_id, label AS predicted_label, votes FROM (
    SELECT query_id, label, votes,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, label ASC) AS r
    FROM votes
) WHERE r = 1
"""


@register("knn_classify", oracle=_KNN_ORACLE, tags=("similarity",))
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction over the embedding space: each query vector
    takes the majority label of its 5 nearest neighbors by cosine (the
    classic lazy classifier, and the shape every embedding-based
    auto-labeling / retrieval-augmented tagging job runs at corpus scale).

    Plan reuses the brute-force kernel: broadcast query set × candidate
    stream, per-query rank on the ROUNDED cosine (ulp-stable cut), then a
    tiny (query, label) vote count and a votes-desc/label-asc argmax —
    deterministic at every tie level. At 100 TB the candidate stream is
    scanned once with no shuffle before the ≤ q×k vote aggregate; for
    repeated serving the LSH/IVF tiers swap in as the candidate
    generator."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    # Norms fold once per row on each side; the n×q scoring stage pays
    # one dot product per pair, not three array folds (bit-identical to
    # cosine(): same fold/multiply order).
    cos = F.round(dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    neighbors = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "label", cos.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KNN_K)
    )
    votes = neighbors.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )


_STANDARDIZE_ORACLE = """
WITH flat AS (
    SELECT vec_id, t.i AS pos, CAST(embedding[t.i + 1] AS DOUBLE) AS v
    FROM embeddings, UNNEST(range(len(embedding))) AS t(i)
), stats AS (
    SELECT pos,
           CAST(SUM(CAST(v AS DECIMAL(38,20))) AS DOUBLE) / COUNT(*) AS mean,
           CAST(SUM(CAST(v * v AS DECIMAL(38,20))) AS DOUBLE) / COUNT(*) AS m2
    FROM flat GROUP BY pos
)
SELECT f.vec_id, f.pos,
       ROUND(CASE WHEN s.m2 - s.mean * s.mean <= 0 THEN 0
                  ELSE (f.v - s.mean) / sqrt(s.m2 - s.mean * s.mean)
             END, 6) AS z
FROM flat f JOIN stats s USING (pos)
"""


@register("embedding_standardize", oracle=_STANDARDIZE_ORACLE, tags=("similarity",))
def embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score standardization of the embedding corpus — the
    feature-scaling pass before distance-based models (k-means, kNN) where
    an unscaled high-variance dimension dominates the metric.

    Two passes over the flattened (vector, dimension) stream: a per-
    dimension moment aggregate (mean, E[v²]) whose state is O(dims) and
    map-side combines — one shuffle of dims-sized partials regardless of
    corpus size — then the tiny stats table broadcasts back onto the
    stream for the per-value transform. No UDF, no driver materialization.

    Cross-engine determinism: moments are exact-decimal sums divided once
    (tpch.py convention), and both engines then evaluate the identical
    IEEE expression (v − mean)/√(E[v²] − mean²), so ROUND(,6) hashes
    equal. Constant dimensions (variance ≤ 0 after the subtraction,
    including the negative-epsilon float case) map to z = 0 on both
    engines rather than dividing by ~0."""
    flat = (
        load(spark, sf_dir, "embeddings")
        .selectExpr("vec_id", "posexplode(embedding) AS (pos, v)")
        .withColumn("v", F.col("v").cast("double"))
    )
    stats = flat.groupBy("pos").agg(
        (
            F.sum(F.col("v").cast("decimal(38,20)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
        (
            F.sum((F.col("v") * F.col("v")).cast("decimal(38,20)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m2"),
    )
    var = F.col("m2") - F.col("mean") * F.col("mean")
    return flat.join(F.broadcast(stats), "pos").select(
        "vec_id",
        "pos",
        F.round(
            F.when(var <= 0, F.lit(0.0)).otherwise(
                (F.col("v") - F.col("mean")) / F.sqrt(var)
            ),
            6,
        ).alias("z"),
    )


N_COV_DIMS = 16

#: Per-element quantization: nano-units via FLOOR on the double product of
#: an exact float32→double cast and the exact literal 1e9. FLOOR of a double
#: is a pure function of its bits — no rounding MODE exists to diverge.
COV_QUANT = 1_000_000_000  # 1e9 — element nano-units
#: cov_micros = round_half_away(num / (n² · 1e12)) where num is in units of
#: 1e-18 (nano × nano) and the output is micro-units (1e-6).
COV_OUT_DIV = 1_000_000_000_000  # 1e12 = 1e18 / 1e6

_COV_ORACLE = f"""
WITH pairs AS (
    SELECT gi.i, gj.j,
           CAST(FLOOR(CAST(e.embedding[gi.i] AS DOUBLE) * 1000000000.0)
                AS BIGINT) AS xq,
           CAST(FLOOR(CAST(e.embedding[gj.j] AS DOUBLE) * 1000000000.0)
                AS BIGINT) AS yq
    FROM embeddings e,
         range(1, {N_COV_DIMS + 1}) gi(i),
         range(1, {N_COV_DIMS + 1}) gj(j)
    WHERE gj.j >= gi.i
),
sums AS (
    SELECT i, j,
           CAST(COUNT(*) AS HUGEINT)        AS n,
           SUM(CAST(xq AS HUGEINT) * yq)    AS sxy,
           SUM(CAST(xq AS HUGEINT))         AS sx,
           SUM(CAST(yq AS HUGEINT))         AS sy
    FROM pairs
    GROUP BY i, j
),
nums AS (
    SELECT i, j,
           n * sxy - sx * sy                 AS num,
           n * n * {COV_OUT_DIV}::HUGEINT    AS d
    FROM sums
)
SELECT i, j,
       CAST(CASE WHEN num < 0
                 THEN -((-num - num + d) // (d + d))
                 ELSE ((num + num + d) // (d + d))
            END AS BIGINT) AS cov_micros
FROM nums
"""


@register("embedding_covariance", oracle=_COV_ORACLE, tags=("similarity", "ml"))
def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the first 16 embedding
    dimensions, in long (i, j, cov) form — the input to PCA/whitening and
    the standard drift probe for embedding spaces (a production model
    regression shows up as off-diagonal mass moving).

    Shape: each row is expanded against a BROADCAST 136-pair dimension
    table (two broadcast cross-joins of a 16-row range — no fact-table
    shuffle to build pairs), values picked by element_at, then one
    covar_pop aggregate whose map-side partials reduce every partition to
    ≤136 groups before the only exchange. For the full d=1024 case at
    100 TB, flip to per-partition Gram accumulation in mapInPandas (one
    d×d numpy matrix per partition, summed on a single reducer) — the
    pair-explosion factor d²/2 stops being free around d≈64; the
    aggregation algebra is identical.

    Cross-engine + cross-partitioning determinism (r8+r9 VERDICT: this
    query was the only red driver row two rounds running — first a
    COVAR_POP ROUND(,6) half-ulp knife edge that partial-aggregation
    order could tip, then, after the exact-decimal-sums rewrite, a
    residual divergence in the double-exit path: Spark rounds doubles
    via exact BigDecimal HALF_UP while DuckDB scales-and-rounds the
    binary double, so ANY rounded-double output carries cross-version
    risk). r10 per the r9 verdict: NO float is ever rounded or hashed.
    Each element is quantized to integer nano-units with
    FLOOR(x·1e9) — the float32→double cast and the ×1e9 double multiply
    are IEEE-identical in both engines and FLOOR is a pure function of
    the double's bits, with no rounding mode to diverge — then every
    subsequent op is exact integer arithmetic: per-term xq·yq products
    fit a BIGINT (|xq|<6e8), sums are exact decimals / HUGEINTs,
    num = n·Σxy − Σx·Σy is the exact scaled covariance numerator, and
    the output cov_micros BIGINT is round-half-away-from-zero integer
    division (|num|·2 + d) div (d·2) with d = n²·1e12, mirrored
    verbatim in the DuckDB oracle. Integers hash identically on every
    engine and every version. Decimal widths are budgeted so every
    multiply is exact in BOTH engines (Spark p1+p2+1 ≤ 38, DuckDB
    w1+w2 ≤ 38): magnitudes at sf1 stay ≤ ~1e26 ≪ 1e38."""
    dims = spark.range(1, N_COV_DIMS + 1).select(F.col("id").cast("int"))
    gi = F.broadcast(dims.select(F.col("id").alias("i")))
    gj = F.broadcast(dims.select(F.col("id").alias("j")))
    xq = F.floor(
        F.element_at("embedding", F.col("i")).cast("double") * F.lit(1000000000.0)
    ).cast("long")
    yq = F.floor(
        F.element_at("embedding", F.col("j")).cast("double") * F.lit(1000000000.0)
    ).cast("long")
    n_dec = F.count(F.lit(1)).cast("decimal(8,0)")
    # Per-term xq·yq < 4e17 fits a BIGINT; the SUM accumulates in decimal
    # (exact, no long overflow at any n — sum(decimal(19,0)) → decimal(29,0)).
    sxy = F.sum((xq * yq).cast("decimal(19,0)")).cast("decimal(26,0)")
    sx = F.sum(xq.cast("decimal(19,0)")).cast("decimal(16,0)")
    sy = F.sum(yq.cast("decimal(19,0)")).cast("decimal(16,0)")
    num = (n_dec * sxy - sx * sy).alias("num")
    d = (n_dec * n_dec * F.lit(COV_OUT_DIV).cast("decimal(13,0)")).alias("d")
    half_up = F.expr(
        "CASE WHEN num < 0 THEN -((-num - num + d) div (d + d)) "
        "ELSE ((num + num + d) div (d + d)) END"
    )
    return (
        load(spark, sf_dir, "embeddings")
        .select("embedding")
        .crossJoin(gi)
        .crossJoin(gj)
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(num, d)
        .select("i", "j", half_up.cast("long").alias("cov_micros"))
    )


def _gram_partials_fn(dim: int):
    """Factory (closure-pickled, see pandas_fns._token_offsets_udtf) for the
    per-partition Gram accumulation pass: each partition folds its rows
    into ONE (count, col-sum, X'X) triple — numpy matmul per Arrow batch,
    O(d²) state regardless of partition size."""

    def gram(batches):
        import numpy as np
        import pandas as pd

        n, s, g = 0, np.zeros(dim), np.zeros((dim, dim))
        for pdf in batches:
            x = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return gram


@register("embedding_pca_project", oracle=None, tags=("similarity", "ml"))
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the full 64-dim embedding space onto its top-2
    principal components — the dimensionality-reduction / visualization /
    whitening primitive, built the way distributed PCA actually works at
    scale (this is MLlib RowMatrix's internal shape, re-expressed on the
    DataFrame API):

    1. ONE distributed pass folds every partition into a (count, Σx, X'X)
       triple via mapInPandas — O(d²) state per partition, numpy matmul
       per Arrow batch, no shuffle of the N×d matrix, ever.
    2. The ≤|partitions| partial rows (a few KB each at d=64) collect to
       the driver and reduce to the d×d covariance — the sanctioned
       small-model collect: its size is O(P·d²), INDEPENDENT of row count,
       exactly like ALS factor fitting. numpy's symmetric eigensolver then
       yields the top-2 components, sign-fixed (largest-|loading| entry
       made positive) so output is deterministic.
    3. The 2×d component matrix broadcasts back as array LITERALS inside
       the projection expressions — scoring N rows is JVM-side zip_with
       dots, whole-stage codegen, no Python.

    ⊘ rows-only for the driver (eigenvectors aren't SQL-expressible);
    tests/test_similarity.py gates the invariants instead: projected
    variances equal the top eigenvalues, components are orthonormal, and
    pc1/pc2 are uncorrelated in the projected table."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    dim = 64
    parts = emb.select("embedding").mapInPandas(
        _gram_partials_fn(dim), "n long, s array<double>, g array<double>"
    )
    rows = parts.collect()  # O(P * d²) — partition partials, not data rows
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    comps = []
    for k in (dim - 1, dim - 2):  # eigh is ascending — take the top two
        v = evecs[:, k]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append(v)
    centered = F.zip_with(
        as_double_array(F.col("embedding")),
        F.array(*[F.lit(float(m)) for m in mu]),
        lambda x, m: x - m,
    )
    projections = [
        F.round(
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(c)) for c in comp]),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias(name)
        for comp, name in zip(comps, ("pc1", "pc2"))
    ]
    return emb.select("vec_id", "label", *projections)


@register("embedding_mahalanobis_outliers", oracle=None, tags=("similarity", "ml"))
def embedding_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 embedding outliers by PCA-whitened Mahalanobis distance —
    the covariance-aware outlier score (Euclidean treats a 10σ excursion
    along a tight axis the same as 1σ along a loose one; Mahalanobis
    does not). Exact Mahalanobis needs Σ⁻¹, a 64×64 inverse; the
    production-scale form used here whitens in the top-k eigenbasis:
    d² ≈ Σ_k proj_k²/λ_k over the top-8 components, which IS the
    Mahalanobis distance restricted to the directions that carry the
    variance (the remaining 56 axes contribute noise-floor terms).

    Same three-stage shape as `embedding_pca_project` (this is the
    sanctioned small-model collect): one mapInPandas pass folds
    partitions to (n, Σx, X'X) partials; the driver reduces the O(P·d²)
    partials, eigendecomposes, keeps the top-8 (λ, v) pairs; components
    broadcast back as array literals and the distance is a JVM-side
    zip_with/aggregate fold. Top-20 via TakeOrderedAndProject — no global
    sort. ⊘ rows-only (eigen math isn't SQL); test gates pin invariants
    (non-negative, descending, deterministic)."""
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    dim, topk = 64, 8
    parts = emb.select("embedding").mapInPandas(
        _gram_partials_fn(dim), "n long, s array<double>, g array<double>"
    )
    rows = parts.collect()  # O(P * d²) partition partials, not data rows
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(dim, dim) for r in rows], axis=0)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    centered = F.zip_with(
        as_double_array(F.col("embedding")),
        F.array(*[F.lit(float(m)) for m in mu]),
        lambda x, m: x - m,
    )
    terms = []
    for k in range(dim - 1, dim - 1 - topk, -1):
        v, lam = evecs[:, k], float(evals[k])
        if lam <= 1e-12:
            # rank-deficient covariance (e.g. a 1-row or constant corpus):
            # a zero-variance eigendirection carries no distance — skip it
            # (the pseudo-inverse convention) instead of dividing by the
            # zero eigenvalue. r13 tiny-fixture rows-only probe finding.
            continue
        proj = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in v]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        terms.append(proj * proj / F.lit(lam))
    d2 = terms[0] if terms else F.lit(0.0)
    for t in terms[1:]:
        d2 = d2 + t
    return (
        emb.select(
            "vec_id", "label", F.round(F.sqrt(d2), 4).alias("mahalanobis_dist")
        )
        .orderBy(F.desc("mahalanobis_dist"), F.asc("vec_id"))
        .limit(20)
    )


_KMEANS_K = 4
_KMEANS_ITERS = 3


def _centroid_literal(vals) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _sq_dist(vec: F.Column, cent: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(vec, cent, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register("ml_kmeans_lloyd", oracle=None, tags=("similarity", "ml"))
def ml_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means (k=4, 3 fixed iterations) over the
    embedding table — unsupervised clustering as pure DataFrame algebra,
    the capability MLlib's KMeans wraps, re-expressed so every step's
    scale shape is visible:

    - init: the k lowest vec_ids' vectors (deterministic, no RNG);
    - assign: squared distance to each of k BROADCAST centroid literals
      via JVM-side zip_with/aggregate folds, argmin by least() + CASE
      with lowest-cluster tiebreak — a narrow codegen'd map, no shuffle;
    - update: posexplode the 64 dims and average per (cluster, dim) —
      ONE map-side-combined groupBy of k×64 cells per iteration; the new
      centroids collect to the driver (k×d doubles — the sanctioned
      small-model collect, same as ALS factors / PCA components) and
      re-broadcast as literals, ROUND(5)ed so run-to-run partition
      summation order cannot flip assignments.

    Per-iteration inertia is returned by _kmeans_lloyd_run so the
    monotone-descent property IS asserted (tests/test_similarity.py
    checks history[i+1] <= history[i]); ⊘ rows-only for the driver
    (iterative argmin isn't SQL); tests also gate k non-empty clusters
    and determinism."""
    df, _ = _kmeans_lloyd_run(spark, sf_dir)
    return df


def _kmeans_lloyd_run(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[dict]]:
    """Lloyd loop; returns (final cluster summary, per-iteration inertia
    history) — the history channel exists so the monotone-descent
    invariant is test-assertable, not just claimed."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    init = [
        [round(float(x), 5) for x in r["v"]]
        for r in emb.orderBy("vec_id").limit(_KMEANS_K).collect()
    ]
    # a corpus smaller than K fits k_eff = n centroids (F.least also
    # requires ≥ 2 columns) — graceful degradation instead of a crash;
    # r13 tiny-fixture rows-only probe finding.
    centroids = init
    history = []
    assigned = None
    for it in range(_KMEANS_ITERS):
        dists = [_sq_dist(F.col("v"), _centroid_literal(c)) for c in centroids]
        best = F.least(*dists) if len(dists) > 1 else dists[0]
        cluster = F.lit(None).cast("int")
        for ci in range(len(dists) - 1, -1, -1):
            cluster = F.when(dists[ci] == best, ci).otherwise(cluster)
        assigned = emb.select(
            "vec_id", "v", cluster.alias("cluster"), best.alias("d2")
        ).localCheckpoint()
        stats = (
            assigned.groupBy("cluster")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.round(F.sum("d2"), 4).alias("inertia"),
            )
            .collect()
        )
        history.append(
            {
                "iteration": it,
                "inertia": float(sum(r["inertia"] for r in stats)),
            }
        )
        cells = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]
        for r in cells:
            new_c[r["cluster"]][r["dim"]] = round(float(r["m"]), 5)
        centroids = new_c
    summary = (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.round(F.sum("d2"), 4).alias("inertia"),
            F.min("vec_id").alias("min_vec_id"),
        )
        .orderBy("cluster")
    )
    return summary, history


_PQ_M = 8   # subvectors
_PQ_K = 16  # codes per subspace (4 bits)


def _pq_assign_fn(centroids):
    """Factory (closure-pickled): assign each row's M subvectors to their
    nearest subspace centroid; emits (vec_id, codes array, sq_err)."""

    def assign(batches):
        import numpy as np
        import pandas as pd

        cents = [np.asarray(c) for c in centroids]  # M × (K, d_sub)
        for pdf in batches:
            x = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            n, d = x.shape
            dsub = d // len(cents)
            codes = np.empty((n, len(cents)), dtype=np.int32)
            err = np.zeros(n)
            for m, cm in enumerate(cents):
                sub = x[:, m * dsub : (m + 1) * dsub]
                d2 = ((sub[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
                err += d2.min(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes.tolist()),
                    "sq_err": err,
                }
            )

    return assign


#: ADC shortlist size: exact re-rank depth per query. At corpus scale R
#: is the recall/latency knob (R=100 here ⇒ recall@10 ≈ 0.82 at sf0.01).
_PQ_ADC_RERANK = 100


@register("sim_topk_pq_adc", oracle=None, tags=("similarity", "ml"))
def sim_topk_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via product quantization with asymmetric distance
    computation + exact re-rank — the memory-bound trillion-scale search
    layout (FAISS's IVFPQ backbone, Jégou et al., TPAMI'11): vectors are
    stored as 8 4-bit codes (64× smaller), a query scores a candidate by
    summing 8 table lookups instead of a 64-dim distance, and only the
    ADC top-R shortlist ever touches full-precision vectors.

    Plan: per-query 128-entry LUT (‖q_sub − centroid‖² per subspace×code)
    built by a broadcast cross join of the query rows against the
    128-row codebook table (|queries|·M·K distance rows, grouped back
    into one slot-ordered array per query) — no query-vector collect,
    and the expression tree stays O(1) in M·K (unrolling the 128 folds
    into one projection was measured at ~10 s of pure analysis/codegen
    before any data moved). The code table streams against the broadcast
    LUTs with the distance as one JVM `aggregate` fold of element_at
    lookups (no Python in the scoring hot path — the only Python
    boundary is the Arrow-batched code ASSIGNMENT, shared with
    embedding_pq_compress); ADC top-R per query via window; exact L2
    re-rank joins full vectors for R·|queries| rows only. At 100 TB the
    code table is ~1.5% of the vector bytes and the full-precision table
    is touched at R rows/query — this, not brute force, is why PQ exists.
    ⊘ rows-only (quantization error is data-dependent);
    tests/test_similarity.py gates mean recall@10 ≥ 0.6 vs the exact L2
    answer and determinism."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    dsub = 64 // _PQ_M
    cb = corpus_pq_codebooks(spark, sf_dir)
    codes = emb.mapInPandas(
        _pq_assign_fn(cb), "vec_id long, codes array<int>, sq_err double"
    ).select("vec_id", "codes")

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qlut = _pq_query_luts(spark, q, cb)
    scored = codes.join(
        F.broadcast(qlut),
        F.col("vec_id") != F.col("query_id"),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_pq_adc_dist(), 6).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_ADC_RERANK)
        .select("query_id", "neighbor_id")
    )
    return _pq_exact_rerank(shortlist, emb, q)


def _pq_query_luts(spark: SparkSession, q: DataFrame, cb: list) -> DataFrame:
    """(query_id, lut ARRAY<DOUBLE>[M·K]) — per-query ADC lookup table,
    lut[m·K + code] = ‖q_sub(m) − centroid(m, code)‖². Built by a
    broadcast cross join of the query rows against the M·K-row codebook
    table, grouped back into one slot-ordered array per query: the
    expression tree stays O(1) in M·K (unrolling the 128 subdistance
    folds into one projection was measured at ~10 s of pure
    analysis/codegen before any data moved)."""
    dsub = 64 // _PQ_M
    cb_df = spark.createDataFrame(
        [(m, k, list(cm[k])) for m, cm in enumerate(cb) for k in range(len(cm))],
        "m int, code int, cent array<double>",
    )
    subdist = F.aggregate(
        F.zip_with(
            F.slice(F.col("qv"), F.col("m") * dsub + 1, dsub),
            F.col("cent"),
            lambda x, c: (x - c) * (x - c),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        q.crossJoin(F.broadcast(cb_df))
        .select(
            "query_id",
            (F.col("m") * _PQ_K + F.col("code")).alias("slot"),
            subdist.alias("d"),
        )
        .groupBy("query_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "d"))),
                lambda s: s["d"],
            ).alias("lut")
        )
    )


def _pq_adc_dist() -> F.Column:
    """Asymmetric PQ distance of a candidate: one JVM `aggregate` fold
    summing the M LUT entries its codes select — 8 array lookups instead
    of a 64-dim distance. Expects `lut` and `codes` in scope."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.col("lut"), m * F.lit(_PQ_K) + F.element_at(F.col("codes"), m + 1) + 1
        ),
    )


def _pq_exact_rerank(shortlist: DataFrame, emb: DataFrame, q: DataFrame) -> DataFrame:
    """Exact-L2 re-rank of an ADC shortlist: joins full-precision vectors
    for the R·|queries| shortlist rows ONLY — at corpus scale this is the
    one place full vectors are read, and it reads R rows per query."""
    nv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    exact_d = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("nv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, x: a + x,
        ),
        6,
    )
    reranked = (
        shortlist.join(nv, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", exact_d.alias("l2_sq"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("l2_sq"), F.asc("neighbor_id"))
    return (
        reranked.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "l2_sq", "rn")
    )


@register("sim_topk_ivfpq", oracle=None, tags=("similarity", "ml"))
def sim_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ: the production billion-scale ANN layout (Jégou et al.
    TPAMI'11; FAISS's default index family) — IVF coarse cells prune
    WHICH vectors get scored (probe the 4 nearest of the Lloyd-refined
    centroid cells, ~n_probe/n_lists of the corpus), PQ-ADC prunes WHAT
    a score costs (8 LUT lookups against the 4-bit code table instead of
    a 64-dim distance), and only the ADC top-R shortlist touches
    full-precision vectors for the exact-L2 re-rank.

    Composition of the two registered halves: `kmeans_centroids` (the
    sim_topk_ivf coarse quantizer — deterministic seeding, no RNG) and
    the `_pq_fit_codebooks`/`_pq_assign_fn`/`_pq_query_luts` PQ kernel
    (shared with embedding_pq_compress and sim_topk_pq_adc). Every join
    is an equi-join: probe→cell→posting-list on centroid_id (bucketable,
    partition-pruned at scale), codes on vec_id, LUTs broadcast. ⊘
    rows-only; tests gate mean recall@10 ≥ 0.5 vs exact L2 (cell pruning
    can evict true neighbors on top of PQ loss — the documented IVF
    trade; measured 0.70 at sf0.01 with 8 probes of √n cells) and
    determinism."""
    # √n-sized cells (kmeans_centroids): 8 probes of ~√n lists touch
    # ~8/√n of the corpus — 4.5% at sf0.01, shrinking as the corpus
    # grows, which is the IVFPQ scaling story.
    n_probe = 8
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    cent = corpus_centroids(spark, sf_dir)
    # Metric consistency: the final answer is ranked by L2, so cell
    # assignment and probing use L2 too — cosine cells misalign with L2
    # neighborhoods on unnormalized vectors.
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.asc("c_d2"), F.asc("centroid_id")
    )
    cells = (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id",
            "centroid_id",
            F.round(_sq_dist(F.col("v"), F.col("cv")), 6).alias("c_d2"),
        )
        .withColumn("arn", F.row_number().over(assign_w))
        .filter(F.col("arn") == 1)
        .select("vec_id", "centroid_id")
    )
    cb = corpus_pq_codebooks(spark, sf_dir)
    codes = emb.mapInPandas(
        _pq_assign_fn(cb), "vec_id long, codes array<int>, sq_err double"
    ).select("vec_id", "codes")

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.asc("p_d2"), F.asc("centroid_id")
    )
    probes = (
        q.join(F.broadcast(cent))
        .select(
            "query_id",
            "centroid_id",
            F.round(_sq_dist(F.col("qv"), F.col("cv")), 6).alias("p_d2"),
        )
        .withColumn("prn", F.row_number().over(probe_w))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "centroid_id")
    )
    qlut = _pq_query_luts(spark, q, cb)
    cand = (
        probes.join(cells, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(codes, "vec_id")
        .join(F.broadcast(qlut), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_pq_adc_dist(), 6).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("neighbor_id"))
    shortlist = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PQ_ADC_RERANK)
        .select("query_id", "neighbor_id")
    )
    return _pq_exact_rerank(shortlist, emb, q)


def _pq_fit_codebooks(emb: DataFrame) -> list:
    """Fit the M per-subspace codebooks: seed each subspace's K centroids
    from the K lowest vec_ids' subvectors, refine with ONE distributed
    Lloyd step (posexplode → per-(subspace, code, dim) means — a
    map-side-combined groupBy). The M·K·d_sub codebook is the sanctioned
    small-model driver collect (same class as ALS/PCA/k-means); ROUND(5)
    keeps refits bit-identical across partitionings. Shared by
    embedding_pq_compress (storage) and sim_topk_pq_adc (search)."""
    import numpy as np

    dsub = 64 // _PQ_M
    seed_rows = emb.orderBy("vec_id").limit(_PQ_K).collect()
    seeds = np.vstack([np.asarray(r["v"]) for r in seed_rows])
    # a corpus smaller than K cycles its seeds: duplicate centroids are
    # harmless (argmin assignment deterministically picks the lowest
    # code) and the fit degrades gracefully instead of IndexError'ing —
    # r13 tiny-fixture rows-only probe finding.
    n_seeds = seeds.shape[0]
    centroids = [
        [
            [
                round(float(x), 5)
                for x in seeds[k % n_seeds, m * dsub : (m + 1) * dsub]
            ]
            for k in range(_PQ_K)
        ]
        for m in range(_PQ_M)
    ]
    assigned = emb.mapInPandas(
        _pq_assign_fn(centroids),
        "vec_id long, codes array<int>, sq_err double",
    )
    cells = (
        assigned.join(emb, "vec_id")
        .select("codes", F.posexplode("v").alias("dim", "x"))
        .select(
            (F.col("dim") / dsub).cast("int").alias("m"),
            F.element_at(F.col("codes"), (F.col("dim") / dsub).cast("int") + 1)
            .alias("code"),
            (F.col("dim") % dsub).alias("sub_dim"),
            "x",
        )
        .groupBy("m", "code", "sub_dim")
        .agg(F.avg("x").alias("c"))
        .collect()
    )
    refined = [[list(c) for c in cm] for cm in centroids]
    for r in cells:
        refined[r["m"]][r["code"]][r["sub_dim"]] = round(float(r["c"]), 5)
    return refined


@register("embedding_pq_compress", oracle=None, tags=("similarity", "ml"))
def embedding_pq_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim float vectors compressed to 8
    4-bit codes (64× smaller) — the memory half of large-scale ANN
    (IVF prunes WHICH vectors to score — sim_topk_ivf; PQ shrinks WHAT
    gets stored and scored). Codebooks: per 8-dim subspace, 16 centroids
    seeded from the 16 lowest vec_ids and refined by one distributed
    Lloyd step (posexplode → per-(subspace, code, dim) means — one
    map-side-combined groupBy; the M·K·d_sub codebook is the sanctioned
    small-model driver collect, same class as ALS/PCA/k-means).

    Assignment is an Arrow-batched mapInPandas pass (numpy distance
    matrices per batch — the honest PQ hot loop; 128 nested zip_with
    folds would codegen-explode), built by a factory so workers never
    import the package. Output: per-code-of-subspace-0 usage stats plus
    overall reconstruction MSE — the compression quality surface. ⊘
    rows-only; tests gate monotone improvement vs unrefined codebooks,
    full coverage, determinism."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    dim = 64
    refined = corpus_pq_codebooks(spark, sf_dir)
    final = emb.mapInPandas(
        _pq_assign_fn(refined), "vec_id long, codes array<int>, sq_err double"
    )
    stats = final.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.avg(F.col("sq_err") / dim), 6).alias("reconstruction_mse"),
        F.countDistinct(F.element_at("codes", 1)).cast("long").alias(
            "codes_used_sub0"
        ),
    )
    return stats


#: Truncated-prefix dimensionality for the cheap prefilter pass and the
#: candidate multiple it keeps: score on the first MRL_DIM of 64 dims
#: (4x fewer multiplies per pair), keep MRL_PREFILTER_K candidates, rerank
#: those exactly. Matryoshka-trained embeddings make the prefix a real
#: embedding; the fixtures' vectors are not MRL-trained, so the eval query
#: below measures exactly how much the prefix ranking loses here.
MRL_DIM = 16
MRL_PREFILTER_K = 50

_MRL_RERANK_ORACLE = f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           CAST(embedding[1:{MRL_DIM}] AS DOUBLE[]) AS vp
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, v AS qv, vp AS qvp FROM e
    WHERE vec_id < {N_QUERIES}
), pre AS (
    SELECT query_id, vec_id AS neighbor_id, v,
           ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY CASE WHEN sqrt(list_dot_product(qvp, qvp))
                                  * sqrt(list_dot_product(vp, vp)) = 0
                             THEN -2.0
                             ELSE ROUND(list_dot_product(qvp, vp)
                                 / (sqrt(list_dot_product(qvp, qvp))
                                    * sqrt(list_dot_product(vp, vp))), 6)
                        END DESC,
                   vec_id ASC) AS prn,
           qv
    FROM q JOIN e ON e.vec_id != q.query_id
), rerank AS (
    SELECT query_id, neighbor_id,
           ROUND(list_dot_product(qv, v)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(v, v))), 6) AS cos_sim
    FROM pre WHERE prn <= {MRL_PREFILTER_K}
)
SELECT query_id, neighbor_id, cos_sim, rn FROM (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
    FROM rerank
) WHERE rn <= {TOP_K}
"""


@register(
    "sim_topk_truncated_rerank",
    oracle=_MRL_RERANK_ORACLE,
    tags=("similarity",),
)
def sim_topk_truncated_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval with a truncated-dimension prefilter (the
    Matryoshka-embedding serving pattern, Kusupati et al. 2022: rank
    cheaply on a prefix of the dimensions, rerank the shortlist exactly):
    stage 1 scores every candidate on the first MRL_DIM of 64 dims —
    4× fewer multiplies per pair than the full cosine — and keeps
    MRL_PREFILTER_K; stage 2 reranks only the shortlist with the full
    vector. Unlike the LSH/IVF/PQ families this is EXACT given the
    shortlist, so the whole query is deterministic and oracle-checked:
    the same two-window plan in DuckDB hashes identically (both stages
    rank on the ROUNDED cosine with vec_id tiebreak, the bruteforce
    convention).

    Scale shape: stage 1 is the only corpus-wide pass and it reads 4×
    fewer vector bytes per pair (at 100 TB the prefix columns can be
    stored as their own parquet column to make the saving IO-real);
    stage 2 touches |q|·MRL_PREFILTER_K rows. Both top-ks are per-query
    windows over broadcast-joined streams — no corpus shuffle."""
    e = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .withColumn("vp", F.slice(F.col("v"), 1, MRL_DIM))
        .withColumn("nv", norm(F.col("v")))
        .withColumn("nvp", norm(F.col("vp")))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vp").alias("qvp"),
        F.col("nv").alias("nq"),
        F.col("nvp").alias("nqp"),
    )
    # Zero-norm-prefix guard (r9 ADVICE): an embedding whose first MRL_DIM
    # dims are all zero would make the prefix cosine NULL in Spark (0/0)
    # but NaN/inf under DuckDB's IEEE division, silently diverging the
    # prefilter ranking cross-engine. Emit a fixed sentinel BELOW any real
    # cosine instead — such a vector carries no prefix signal, so it ranks
    # last deterministically (vec_id tiebreak) on both engines. Theoretical
    # on the dense random fixtures; guarded because nothing enforces it.
    pre_cos = F.when(F.col("nqp") * F.col("nvp") == 0, F.lit(-2.0)).otherwise(
        F.round(dot(F.col("qvp"), F.col("vp")) / (F.col("nqp") * F.col("nvp")), 6)
    )
    pre_w = Window.partitionBy("query_id").orderBy(
        F.desc("pre_cos"), F.asc("neighbor_id")
    )
    shortlist = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "v",
            "qv",
            "nv",
            "nq",
            pre_cos.alias("pre_cos"),
        )
        .withColumn("prn", F.row_number().over(pre_w))
        .filter(F.col("prn") <= MRL_PREFILTER_K)
    )
    full_cos = F.round(
        dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        shortlist.select("query_id", "neighbor_id", full_cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


_MRL_EVAL_ORACLE = f"""
WITH dims AS (
    SELECT UNNEST([8, 16, 32]) AS trunc_dim
), e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), full_rank AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY ROUND(list_dot_product(qv, v)
                       / (sqrt(list_dot_product(qv, qv))
                          * sqrt(list_dot_product(v, v))), 6) DESC,
                       e.vec_id ASC) AS rn
        FROM q JOIN e ON e.vec_id != q.query_id
    ) WHERE rn <= {TOP_K}
), trunc_rank AS (
    SELECT trunc_dim, query_id, neighbor_id FROM (
        SELECT d.trunc_dim, q.query_id, e.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                   PARTITION BY d.trunc_dim, q.query_id
                   ORDER BY CASE
                       WHEN sqrt(list_dot_product(qv[1:d.trunc_dim], qv[1:d.trunc_dim]))
                            * sqrt(list_dot_product(v[1:d.trunc_dim], v[1:d.trunc_dim])) = 0
                       THEN -2.0
                       ELSE ROUND(
                       list_dot_product(qv[1:d.trunc_dim], v[1:d.trunc_dim])
                       / (sqrt(list_dot_product(qv[1:d.trunc_dim], qv[1:d.trunc_dim]))
                          * sqrt(list_dot_product(v[1:d.trunc_dim], v[1:d.trunc_dim]))), 6)
                       END DESC,
                       e.vec_id ASC) AS rn
        FROM dims d, q JOIN e ON e.vec_id != q.query_id
    ) WHERE rn <= {TOP_K}
), hits AS (
    SELECT t.trunc_dim, t.query_id, COUNT(f.neighbor_id) AS n_hits
    FROM trunc_rank t
    LEFT JOIN full_rank f
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY 1, 2
)
SELECT CAST(trunc_dim AS BIGINT) AS trunc_dim,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(CAST(SUM(n_hits) AS DOUBLE) / (COUNT(*) * {TOP_K}), 6)
           AS recall_at_{TOP_K}
FROM hits GROUP BY trunc_dim
"""


@register(
    "embedding_matryoshka_eval",
    oracle=_MRL_EVAL_ORACLE,
    tags=("similarity", "ml"),
)
def embedding_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-truncation quality curve: for each prefix length
    d ∈ {{8, 16, 32}} of the 64-dim embedding, the recall@k of the exact
    top-k computed on the TRUNCATED vectors against the full-dimension
    truth — the measurement that decides how far a Matryoshka-style
    prefix can be cut for the cheap prefilter
    (sim_topk_truncated_rerank) before the shortlist starts missing
    true neighbors. Fully deterministic (both rankings use the rounded-
    cosine + id-tiebreak convention), so it carries an exact oracle —
    rare for an ANN-quality metric, and exactly why the eval belongs in
    the engine rather than a notebook.

    Shape: the candidate stream joins the broadcast query set once per
    truncation dim (a 3-row spine fans the scoring, so it is one plan,
    not three queries); each (dim, query) grain is an independent
    window top-k; the recall fold is a |dims|·|q|-row aggregate.
    At 100 TB: same single-corpus-scan-per-dim story as the brute-force
    baseline it measures — this is an offline calibration query run on
    a sample, not a serving path."""
    dims = spark.createDataFrame(
        [(8,), (16,), (32,)], "trunc_dim int"
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    full_cos = F.round(
        dot(F.col("qv"), F.col("v"))
        / (norm(F.col("qv")) * norm(F.col("v"))),
        6,
    )
    fw = Window.partitionBy("query_id").orderBy(
        F.desc("c"), F.asc("neighbor_id")
    )
    full_rank = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), full_cos.alias("c"))
        .withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    vp = F.slice(F.col("v"), 1, F.col("trunc_dim"))
    qvp = F.slice(F.col("qv"), 1, F.col("trunc_dim"))
    # Same zero-norm-prefix sentinel as sim_topk_truncated_rerank's
    # prefilter (r9 ADVICE): a truncated prefix can be all-zero even when
    # the full vector is not, and 0/0 diverges cross-engine (Spark NULL vs
    # DuckDB IEEE NaN); -2.0 ranks it last deterministically on both.
    trunc_cos = F.when(norm(qvp) * norm(vp) == 0, F.lit(-2.0)).otherwise(
        F.round(dot(qvp, vp) / (norm(qvp) * norm(vp)), 6)
    )
    tw = Window.partitionBy("trunc_dim", "query_id").orderBy(
        F.desc("c"), F.asc("neighbor_id")
    )
    trunc_rank = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .crossJoin(F.broadcast(dims))
        .select(
            "trunc_dim",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            trunc_cos.alias("c"),
        )
        .withColumn("rn", F.row_number().over(tw))
        .filter(F.col("rn") <= TOP_K)
        .select("trunc_dim", "query_id", "neighbor_id")
    )
    hits = trunc_rank.join(
        full_rank.withColumnRenamed("neighbor_id", "hit_id"), ["query_id"]
    ).filter(F.col("neighbor_id") == F.col("hit_id"))
    # recall is normalized by the CONSTANT TOP_K (both rankings always
    # return exactly TOP_K rows per query here), so per-query state is
    # just group existence — no per-group count is needed.
    per_q = trunc_rank.select("trunc_dim", "query_id").distinct()
    hit_counts = hits.groupBy("trunc_dim", "query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        per_q.join(hit_counts, ["trunc_dim", "query_id"], "left")
        .fillna(0, subset=["n_hits"])
        .groupBy(F.col("trunc_dim").cast("long").alias("trunc_dim"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.round(
                F.sum("n_hits").cast("double") / (F.count(F.lit(1)) * TOP_K), 6
            ).alias(f"recall_at_{TOP_K}"),
        )
    )


_HARD_NEG_ORACLE = f"""
WITH e AS (
    SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT vec_id AS anchor_id, label AS alabel, v AS qv FROM e
    WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.anchor_id, q.alabel, e.vec_id AS cand_id, e.label AS clabel,
           CAST(FLOOR(list_dot_product(qv, v)
                / (sqrt(list_dot_product(qv, qv))
                   * sqrt(list_dot_product(v, v))) * 1000000.0)
                AS BIGINT) AS cos_micros
    FROM q JOIN e ON e.vec_id != q.anchor_id
), hard_neg AS (
    SELECT anchor_id, cand_id AS hard_neg_id, cos_micros AS neg_cos_micros
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cos_micros DESC, cand_id ASC
        ) AS rn
        FROM scored WHERE clabel != alabel
    ) WHERE rn = 1
), hard_pos AS (
    SELECT anchor_id, cand_id AS hard_pos_id, cos_micros AS pos_cos_micros
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cos_micros ASC, cand_id ASC
        ) AS rn
        FROM scored WHERE clabel = alabel
    ) WHERE rn = 1
)
SELECT n.anchor_id, hard_pos_id, pos_cos_micros, hard_neg_id, neg_cos_micros,
       CAST(neg_cos_micros > pos_cos_micros AS BIGINT) AS triplet_violation
FROM hard_neg n JOIN hard_pos p ON p.anchor_id = n.anchor_id
"""


@register(
    "embedding_hard_negative_mining",
    oracle=_HARD_NEG_ORACLE,
    tags=("similarity", "ml"),
)
def embedding_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining over the labeled embedding corpus: for
    each anchor, the hardest NEGATIVE (most-similar vector with a
    different label — the one a contrastive loss most needs in the batch)
    and the hardest POSITIVE (least-similar vector sharing the label),
    plus whether the triplet is violated (negative closer than positive)
    — the mining pass an embedding-training pipeline runs between epochs,
    and the labeled sibling of sim_topk_bruteforce.

    Integer exit (COVERAGE.md r10): cosines are emitted and RANKED as
    FLOOR(cos·10⁶) BIGINTs — the underlying doubles are bit-identical
    cross-engine (array-order sequential dot-product fold on both sides,
    the bruteforce-family property) and FLOOR has no rounding mode, so
    nothing can knife-edge; ranking on the quantized integer also makes
    the tiebreak grain explicit.

    Scale shape: the fixed anchor set broadcasts (bruteforce-class scope
    — mining runs over a sampled anchor batch, not all-pairs); ONE
    corpus scan scores all candidates, and both extrema come from a
    single groupBy(anchor_id) using lexicographic struct min/max
    (max(struct(cos, −id)) is 'highest cosine, then lowest id' — the
    tie-deterministic form of max_by, whose own tie behavior is
    unspecified), so the whole query is one aggregate with map-side
    partials: no windows, no self-join, one exchange of ≤|anchors|
    partial rows per partition. At 100 TB with non-fixed anchors the
    prefilter is an ANN shortlist (sim_topk_ivf*) feeding this exact
    rerank."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nv", norm(F.col("v")))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("alabel"),
        F.col("v").alias("qv"),
        F.col("nv").alias("nq"),
    )
    cos_micros = F.floor(
        dot(F.col("qv"), F.col("v")) / (F.col("nq") * F.col("nv"))
        * F.lit(1000000.0)
    ).cast("long")
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "alabel",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("clabel"),
            cos_micros.alias("cos_micros"),
        )
    )
    diff = F.col("clabel") != F.col("alabel")
    same = F.col("clabel") == F.col("alabel")
    hn = F.max(
        F.when(
            diff,
            F.struct(
                F.col("cos_micros").alias("c"),
                (-F.col("cand_id")).alias("nid"),
            ),
        )
    ).alias("hn")
    hp = F.min(
        F.when(
            same,
            F.struct(
                F.col("cos_micros").alias("c"),
                F.col("cand_id").alias("pid"),
            ),
        )
    ).alias("hp")
    return (
        scored.groupBy("anchor_id")
        .agg(hn, hp)
        # An anchor whose label is unique in the corpus has no positive
        # candidate (and a single-label corpus would leave no negative):
        # the conditional min/max comes back NULL for that side. Drop
        # such anchors — the defined semantics is "anchors with BOTH a
        # positive and a negative", which is exactly what the oracle's
        # inner hard_neg⋈hard_pos join produces for ANY label
        # distribution (ADVICE r10: the two sides previously diverged
        # here — Spark kept a NULL-field row, the oracle dropped it).
        .filter(F.col("hn").isNotNull() & F.col("hp").isNotNull())
        .select(
            "anchor_id",
            F.col("hp.pid").alias("hard_pos_id"),
            F.col("hp.c").alias("pos_cos_micros"),
            (-F.col("hn.nid")).alias("hard_neg_id"),
            F.col("hn.c").alias("neg_cos_micros"),
            (F.col("hn.c") > F.col("hp.c")).cast("long").alias(
                "triplet_violation"
            ),
        )
    )


@register("sim_ann_recall_audit", oracle=None, tags=("similarity",))
def sim_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the IVF approximate index against the exact
    brute-force truth — the ANN twin of `dedup_lsh_quality_audit`, and
    the number an n_lists/n_probe config owes its operator before it
    replaces the exact scan: per-query overlap of the two top-k lists,
    reported as the exact micro-unit mean recall plus the distribution
    tails (min / p10-by-count) so one pathological query can't hide
    inside the average. Deterministic end to end (the IVF fit is
    stride-seeded, the truth ranks on rounded cosine), hence a stable
    rows-only row; the recall FLOOR is additionally gated in
    tests/test_similarity.py.

    Scale shape: the union of the audited plans plus one pair-grain
    equi-join on (query_id, neighbor_id) and a per-query fold to
    N_QUERIES rows → 1 row. Production use: run on a sampled query set
    to tune (n_lists, n_probe), deploy the winning config's IVF alone."""
    truth = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = sim_topk_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_audit_fold(truth, ann, floor_micros=300000)


def _recall_audit_fold(
    truth: DataFrame, ann: DataFrame, *, floor_micros: int
) -> DataFrame:
    """Shared recall@k fold for the ANN audits: per-query overlap of the
    two (query_id, neighbor_id) lists → one summary row. The committed
    recall floor rides IN the row (recall_floor_micros/recall_ge_floor)
    so the driver's rows-only check carries the semantic gate, not just
    a row count (VERDICT r13 #6); the same floors are asserted in
    tests/test_similarity.py."""
    per_q = (
        truth.withColumnRenamed("neighbor_id", "nid")
        .join(
            ann.withColumnRenamed("neighbor_id", "nid"),
            ["query_id", "nid"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    # queries with ZERO overlap vanish from the semi-join — restore them
    # via the truth-side query list so the mean can't silently inflate
    qids = truth.select("query_id").distinct()
    per_q = (
        qids.join(per_q, "query_id", "left")
        .select("query_id", F.coalesce("hits", F.lit(0)).alias("hits"))
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(TOP_K).cast("long").alias("k"),
        F.sum("hits").cast("long").alias("n_hits"),
        F.expr(f"CAST(SUM(hits) * 1000000 div (COUNT(1) * {TOP_K}) AS LONG)")
            .alias("mean_recall_micros"),
        F.expr(f"CAST(MIN(hits) * 1000000 div {TOP_K} AS LONG)")
            .alias("worst_query_recall_micros"),
        F.sum((F.col("hits") < F.lit(TOP_K)).cast("long"))
            .cast("long")
            .alias("n_imperfect_queries"),
        F.lit(floor_micros).cast("long").alias("recall_floor_micros"),
        F.expr(
            f"CAST(SUM(hits) * 1000000 div (COUNT(1) * {TOP_K})"
            f" >= {floor_micros} AS LONG)"
        ).alias("recall_ge_floor"),
    )


@register("sim_lsh_recall_audit", oracle=None, tags=("similarity",))
def sim_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the random-hyperplane LSH index against the
    exact brute-force truth — the LSH sibling of `sim_ann_recall_audit`
    (which audits the IVF path), promoting tests/test_similarity.py's
    0.6 mean-recall floor into an in-query audit row the driver's
    rows-only check can see (VERDICT r13 #6). Same scale shape: the
    union of the two audited plans, one pair-grain semi-join, a
    per-query fold to N_QUERIES rows → 1 row. The hyperplanes are
    seed-fixed, so the row is deterministic."""
    truth = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ann = sim_topk_lsh(spark, sf_dir).select("query_id", "neighbor_id")
    return _recall_audit_fold(truth, ann, floor_micros=600000)


_ILD_ORACLE = f"""
WITH e AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
    SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}
), scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.v, e.v))) AS c
    FROM q JOIN e ON e.vec_id != q.query_id
), topk AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY ROUND(c, 6) DESC, neighbor_id ASC) AS rn
        FROM scored
    ) WHERE rn <= {TOP_K}
), pairs AS (
    SELECT a.query_id,
           CAST(FLOOR(ROUND(list_dot_product(ea.v, eb.v)
                / (sqrt(list_dot_product(ea.v, ea.v))
                   * sqrt(list_dot_product(eb.v, eb.v))), 6)
                * 1000000.0) AS BIGINT) AS cos_micros
    FROM topk a
    JOIN topk b ON a.query_id = b.query_id
               AND a.neighbor_id < b.neighbor_id
    JOIN e ea ON ea.vec_id = a.neighbor_id
    JOIN e eb ON eb.vec_id = b.neighbor_id
)
SELECT query_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(cos_micros) // COUNT(*) AS BIGINT) AS mean_pair_cos_micros,
       CAST(1000000 - SUM(cos_micros) // COUNT(*) AS BIGINT) AS ild_micros
FROM pairs GROUP BY query_id
"""


@register(
    "sim_intra_list_diversity", oracle=_ILD_ORACLE, tags=("similarity",)
)
def sim_intra_list_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-list diversity (ILD) of each query's exact top-k neighbor
    list: 1 − mean pairwise cosine among the k retrieved items — the
    standard diversity metric (Ziegler et al. 2005 topic
    diversification) that exposes what recall@k can't: a retriever that
    returns 10 near-copies of one item scores the same recall as one
    returning 10 distinct facets. Read next to `sim_ann_recall_audit`,
    this is the relevance/diversity trade-off as two queries; the
    recommend-side twin of als_eval_coverage_novelty's catalog metrics.

    Shape: the audited top-k plan, then ONE pair-grain self-join keyed
    on query_id — k(k−1)/2 = 45 pairs per query, a constant fan-out of
    the tiny top-k table, with the neighbor vectors joined back from
    the embeddings scan (hash joins on vec_id). Each pairwise cosine is
    the shared fold-order expression, ROUND(6) then FLOOR-quantized to
    micro-units so the per-query mean is an exact integer division —
    no summation-order freedom."""
    topk = sim_topk_bruteforce(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    # one materialization feeds BOTH pair sides — without it the plan
    # re-scans and re-norm-folds the embeddings for ea and eb (measured
    # 6.4 s at sf0.01, dominated by the triple scan incl. bruteforce's)
    e = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            as_double_array(F.col("embedding")).alias("v"),
        )
        .withColumn("nv", norm(F.col("v")))
        .localCheckpoint(eager=False)
    )
    a = topk.select("query_id", F.col("neighbor_id").alias("na"))
    b = topk.select(
        F.col("query_id").alias("qb"), F.col("neighbor_id").alias("nb")
    )
    pairs = a.join(
        b,
        (F.col("query_id") == F.col("qb")) & (F.col("na") < F.col("nb")),
    ).select("query_id", "na", "nb")
    ea = e.select(
        F.col("vec_id").alias("na"),
        F.col("v").alias("va"),
        F.col("nv").alias("nva"),
    )
    eb = e.select(
        F.col("vec_id").alias("nb"),
        F.col("v").alias("vb"),
        F.col("nv").alias("nvb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("nva") * F.col("nvb")), 6
    )
    scored = (
        pairs.join(ea, "na")
        .join(eb, "nb")
        .select(
            "query_id",
            F.floor(cos * 1000000.0).cast("long").alias("cos_micros"),
        )
    )
    return scored.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr("CAST(SUM(cos_micros) div COUNT(1) AS BIGINT)").alias(
            "mean_pair_cos_micros"
        ),
        F.expr(
            "CAST(1000000 - SUM(cos_micros) div COUNT(1) AS BIGINT)"
        ).alias("ild_micros"),
    )


_ISOTROPY_ORACLE = """
WITH q AS (
    SELECT vec_id, g.j,
           CAST(FLOOR(CAST(embedding[g.j] AS DOUBLE) * 1000000000.0)
                AS BIGINT) AS vq
    FROM embeddings,
         UNNEST(generate_series(1, len(embedding))) AS g(j)
), dims AS (
    SELECT j, CAST(SUM(vq) AS HUGEINT) AS s_j FROM q GROUP BY j
), a AS (
    SELECT CAST(SUM(s_j * s_j) AS HUGEINT) AS a,
           CAST(COUNT(*) AS BIGINT) AS d
    FROM dims
), qq AS (
    SELECT CAST(SUM(CAST(vq AS HUGEINT) * vq) AS HUGEINT) AS q,
           CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
    FROM q
)
SELECT qq.n, a.d AS dims,
       CAST((2000000 * qq.q + qq.n * CAST(1000000000000000000 AS HUGEINT))
            // (2 * qq.n * CAST(1000000000000000000 AS HUGEINT)) AS BIGINT)
           AS mean_sq_norm_micros,
       CASE WHEN qq.n < 2 THEN NULL ELSE CAST(
           CASE WHEN a.a >= qq.q
           THEN (2000000 * (a.a - qq.q)
                 + qq.n * (qq.n - 1) * CAST(1000000000000000000 AS HUGEINT))
                // (2 * qq.n * (qq.n - 1) * CAST(1000000000000000000 AS HUGEINT))
           ELSE -((2000000 * (qq.q - a.a)
                 + qq.n * (qq.n - 1) * CAST(1000000000000000000 AS HUGEINT))
                // (2 * qq.n * (qq.n - 1) * CAST(1000000000000000000 AS HUGEINT))) END
           AS BIGINT) END AS avg_pair_dot_micros,
       CASE WHEN qq.n < 2 OR qq.q = 0 THEN NULL ELSE CAST(
           CASE WHEN a.a >= qq.q
           THEN (2000000 * (a.a - qq.q) + (qq.n - 1) * qq.q)
                // (2 * (qq.n - 1) * qq.q)
           ELSE -((2000000 * (qq.q - a.a) + (qq.n - 1) * qq.q)
                // (2 * (qq.n - 1) * qq.q)) END
           AS BIGINT) END AS isotropy_ratio_micros
FROM a CROSS JOIN qq
"""


@register(
    "embedding_isotropy_score", oracle=_ISOTROPY_ORACLE, tags=("similarity",)
)
def embedding_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy diagnostic (Ethayarajh 2019 / Mu &
    Viswanath 2018's "all-but-the-top" motivation): the exact average
    pairwise dot product over ALL n² pairs via the closed form
    (‖Σv‖² − Σ‖v‖²)/(n(n−1)) — no pairwise work at any scale — plus the
    mean squared norm and their ratio (≈ average pairwise cosine for
    near-constant norms). Anisotropy (ratio ≫ 0) is the standard
    symptom of a collapsed/mean-shifted embedding model and the trigger
    for re-centering before cosine retrieval — the production check
    that explains a sim_topk recall regression without running one.

    Exactness at 100 TB: elements nano-quantize (FLOOR(x·1e9), the
    embedding_covariance discipline) so the per-dimension sums S_j and
    the global Σvq² are exact integers from ONE pass (map-combined; the
    only exchange carries d partials per partition, never vectors); the
    three exits are round-half-away integer rationals. Budget: |S_j| ≤
    n·1e9 ⇒ ΣS_j² ≤ d·n²·1e18 ≈ 1e31 at n=10⁷, inside DECIMAL(38)
    through ~sf1000 of this corpus; the ratio numerator ×2e6 peaks
    ≈ 1e37 — one order from the cap, so the docstring IS the budget
    note (drop the quantizer to 1e8 beyond n≈10⁷)."""
    q = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.posexplode(F.col("embedding")).alias("j", "x"),
    ).select(
        "vec_id",
        "j",
        F.floor(F.col("x").cast("double") * F.lit(1000000000.0))
        .cast("long")
        .alias("vq"),
    )
    dims = q.groupBy("j").agg(
        F.sum(F.col("vq").cast("decimal(28,0)")).alias("s_j")
    )
    a = dims.agg(
        F.sum(F.expr("CAST(s_j * s_j AS DECIMAL(38,0))")).alias("a"),
        F.count(F.lit(1)).cast("long").alias("d"),
    )
    qq = q.agg(
        F.sum(F.expr("CAST(vq AS DECIMAL(19,0)) * vq")).alias("q"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    return a.crossJoin(F.broadcast(qq)).select(
        F.col("n"),
        F.col("d").alias("dims"),
        F.expr(
            "CAST((2000000 * q + n * CAST(1000000000000000000 AS DECIMAL(20,0)))"
            " div (2 * n * CAST(1000000000000000000 AS DECIMAL(20,0))) AS BIGINT)"
        ).alias("mean_sq_norm_micros"),
        F.expr(
            "CASE WHEN n < 2 THEN NULL ELSE CAST("
            "CASE WHEN a >= q"
            " THEN (2000000 * (a - q) + n * (n - 1) * CAST(1000000000000000000 AS DECIMAL(20,0)))"
            " div (2 * n * (n - 1) * CAST(1000000000000000000 AS DECIMAL(20,0)))"
            " ELSE -((2000000 * (q - a) + n * (n - 1) * CAST(1000000000000000000 AS DECIMAL(20,0)))"
            " div (2 * n * (n - 1) * CAST(1000000000000000000 AS DECIMAL(20,0)))) END"
            " AS BIGINT) END"
        ).alias("avg_pair_dot_micros"),
        F.expr(
            "CASE WHEN n < 2 OR q = 0 THEN NULL ELSE CAST("
            "CASE WHEN a >= q"
            " THEN (2000000 * (a - q) + (n - 1) * q) div (2 * (n - 1) * q)"
            " ELSE -((2000000 * (q - a) + (n - 1) * q)"
            " div (2 * (n - 1) * q)) END"
            " AS BIGINT) END"
        ).alias("isotropy_ratio_micros"),
    )
