"""Similarity-search quality: the LSH-probed top-k must recall a reasonable
share of the exact brute-force top-k, and both tiers must be deterministic."""

from __future__ import annotations

from recommendation_system_big_data_spark.operators.similarity import (
    sim_topk_bruteforce,
    sim_topk_lsh,
)


def _topsets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    approx = _topsets(sim_topk_lsh(spark, sf_dir))
    recalls = []
    for q, nbrs in exact.items():
        got = approx.get(q, set())
        recalls.append(len(got & nbrs) / len(nbrs))
    mean_recall = sum(recalls) / len(recalls)
    # hamming<=8 of 16 planes: ~85% expected recall even on the weak
    # (cos≈0.3-0.4) neighbors random test vectors produce; this guards
    # against the sketch being broken, not against ANN being approximate.
    assert mean_recall >= 0.6, mean_recall


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.similarity import (
        sim_topk_ivf,
    )

    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    approx = _topsets(sim_topk_ivf(spark, sf_dir))
    recalls = [
        len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items()
    ]
    # With the 2-iteration Lloyd refinement the coarse cells track the data
    # (measured ~0.49 mean recall on random vectors at 4-of-20 probes, vs
    # the ~n_probe/n_lists floor for arbitrary cells); the gate guards the
    # index mechanics AND the centroid refinement staying effective.
    assert sum(recalls) / len(recalls) >= 0.3, sum(recalls) / len(recalls)
    # every returned neighbor must be a real vector with a sane rank list
    rows = sim_topk_ivf(spark, sf_dir).collect()
    assert all(1 <= r["rn"] <= 10 for r in rows)


def test_bruteforce_deterministic(spark, sf_dir):
    a = sorted(map(str, sim_topk_bruteforce(spark, sf_dir).collect()))
    b = sorted(map(str, sim_topk_bruteforce(spark, sf_dir).collect()))
    assert a == b


def test_kmeans_centroids_deterministic(spark, sf_dir):
    """Lloyd refinement is RNG-free: two runs yield identical centroids."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.functions.vectors import (
        as_double_array,
    )
    from recommendation_system_big_data_spark.operators.similarity import (
        kmeans_centroids,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    a = sorted(map(str, kmeans_centroids(e).collect()))
    b = sorted(map(str, kmeans_centroids(e).collect()))
    assert a == b
    assert len(a) > 1


def test_kmeans_sampled_fit_path(spark, sf_dir):
    """Force the sampled-fit branch (every > 1) with a small
    train_per_list: the fit must stay deterministic, produce multiple
    centroids, and an IVF probe built on sampled-fit centroids must keep
    useful recall — the executable form of the 100 TB 'fit on a sample,
    assign the full corpus' story (VERDICT r6 #5)."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.functions.vectors import (
        as_double_array,
        cosine,
    )
    from recommendation_system_big_data_spark.operators.similarity import (
        kmeans_centroids,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    import math

    n = e.count()
    nlist = max(16, math.isqrt(max(n - 1, 0)) + 1)
    # the largest train_per_list that still forces every >= 2 (the
    # sampled branch) on this fixture — production uses 64/list; the
    # floor only exists because the fixture corpus is tiny
    tpl = max(1, n // (2 * nlist))
    a = kmeans_centroids(e, train_per_list=tpl)
    b = kmeans_centroids(e, train_per_list=tpl)
    sa, sb = sorted(map(str, a.collect())), sorted(map(str, b.collect()))
    assert sa == sb and len(sa) > 1
    # sampled-fit centroids differ from full-fit (the branch really ran)
    full_cent = kmeans_centroids(e)
    assert sa != sorted(map(str, full_cent.collect()))

    # and they still partition the space: the mean best-cosine over the
    # full corpus must be within 10% of the full-data fit's (on random
    # test vectors absolute cosines are low; the RELATIVE gate is what
    # the sampled-fit story promises)
    def quality(cent):
        return (
            e.join(F.broadcast(cent))
            .select("vec_id", cosine(F.col("v"), F.col("cv")).alias("c"))
            .groupBy("vec_id")
            .agg(F.max("c").alias("best"))
            .agg(F.avg("best").alias("m"))
            .collect()[0]["m"]
        )

    q_sampled, q_full = quality(a), quality(full_cent)
    assert q_sampled >= 0.9 * q_full, (q_sampled, q_full)


def test_quantization_reconstruction_error_bounded(spark, sf_dir):
    """Dequantizing q back to lo + q*scale must land within one step of the
    original coordinate for every dimension (floor quantization's bound)."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.catalog import load

    e = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "embedding",
            F.array_min("embedding").cast("double").alias("lo"),
            F.array_max("embedding").cast("double").alias("hi"),
        )
        .withColumn("sc", (F.col("hi") - F.col("lo")) / 255)
    )
    err = e.select(
        F.aggregate(
            F.transform(
                "embedding",
                lambda v: F.abs(
                    v.cast("double")
                    - (
                        F.col("lo")
                        + F.least(
                            F.floor((v.cast("double") - F.col("lo")) / F.col("sc")),
                            F.lit(255),
                        )
                        * F.col("sc")
                    )
                ),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        F.col("sc"),
    )
    bad = err.filter(F.col("max_err") > F.col("sc") * 1.000001).count()
    assert bad == 0


def test_pca_projection_invariants(spark, sf_dir):
    """embedding_pca_project is ⊘ (eigen isn't SQL-expressible); gate the
    linear-algebra invariants instead: the projected coordinates must have
    variance equal to the top eigenvalues of the input covariance (in
    descending order) and be mutually uncorrelated, and the projection must
    be deterministic across runs (sign fix)."""
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_pca_project,
    )

    rows = embedding_pca_project(spark, sf_dir).collect()
    pc1 = np.array([r["pc1"] for r in rows])
    pc2 = np.array([r["pc2"] for r in rows])
    # variance ordering + decorrelation (population covariance)
    v1, v2 = pc1.var(), pc2.var()
    assert v1 >= v2 > 0
    corr = np.corrcoef(pc1, pc2)[0, 1]
    assert abs(corr) < 0.05, corr
    # eigen-variance match: recompute the covariance directly
    emb = np.vstack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
        ]
    )
    cov = np.cov(emb, rowvar=False, bias=True)
    evals = np.linalg.eigvalsh(cov)
    # ROUND(4) on outputs → loose relative tolerance
    assert abs(v1 - evals[-1]) / evals[-1] < 0.02, (v1, evals[-1])
    assert abs(v2 - evals[-2]) / evals[-2] < 0.02, (v2, evals[-2])
    # determinism
    again = embedding_pca_project(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mahalanobis_outlier_invariants(spark, sf_dir):
    """⊘ gates for embedding_mahalanobis_outliers: exactly 20 rows,
    distances non-negative and non-increasing, deterministic across runs,
    and the whitened distances must be plausibly standardized (top-8
    eigen-whitening → d² is a sum of 8 squared z-scores, so the MEAN d
    over the whole table sits near sqrt(8); the top-20 must exceed it)."""
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_mahalanobis_outliers,
    )

    rows = embedding_mahalanobis_outliers(spark, sf_dir).collect()
    assert len(rows) == 20
    d = [r["mahalanobis_dist"] for r in rows]
    assert all(x >= 0 for x in d)
    assert d == sorted(d, reverse=True)
    assert d[-1] >= np.sqrt(8) * 0.8, d[-1]  # top-20 above the bulk mean
    again = embedding_mahalanobis_outliers(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_kmeans_lloyd_invariants(spark, sf_dir):
    """⊘ gates for ml_kmeans_lloyd: k non-empty clusters partitioning the
    table, positive inertia, monotone inertia descent across iterations
    (Lloyd's convergence property; small epsilon for the ROUND(5)
    centroid quantization), and determinism across runs."""
    from recommendation_system_big_data_spark.operators.similarity import (
        ml_kmeans_lloyd,
        _kmeans_lloyd_run,
        _KMEANS_K,
    )

    df, history = _kmeans_lloyd_run(spark, sf_dir)
    inertias = [h["inertia"] for h in history]
    assert len(inertias) >= 2
    for prev, cur in zip(inertias, inertias[1:]):
        assert cur <= prev * (1 + 1e-6), inertias

    rows = df.collect()
    assert len(rows) == _KMEANS_K
    total = sum(r["n_vectors"] for r in rows)
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert total == n_emb
    assert all(r["n_vectors"] > 0 for r in rows)
    assert all(r["inertia"] > 0 for r in rows)
    again = ml_kmeans_lloyd(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_pq_adc_recall_and_determinism(spark, sf_dir):
    """⊘ gates for sim_topk_pq_adc: mean recall@10 vs the exact L2
    answer ≥ 0.6 (4-bit PQ + R=100 exact re-rank; measured 0.82 at
    sf0.01), full k rows per query, determinism across runs."""
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        sim_topk_pq_adc,
        N_QUERIES,
        TOP_K,
    )

    rows = sim_topk_pq_adc(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(per_q) == N_QUERIES
    assert all(len(s) == TOP_K for s in per_q.values())

    erows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in erows])
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in erows])
    recalls = []
    for qid in range(N_QUERIES):
        qv = X[ids == qid][0]
        d = ((X - qv) ** 2).sum(1)
        d[ids == qid] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:TOP_K]].tolist())
        recalls.append(len(per_q[qid] & exact) / TOP_K)
    assert np.mean(recalls) >= 0.6, recalls

    again = sim_topk_pq_adc(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    """⊘ gates for sim_topk_ivfpq: mean recall@10 vs the exact L2 answer
    ≥ 0.5 (IVF cell pruning can evict true neighbors on top of the PQ
    quantization loss — the documented trade), full k rows per query,
    determinism across runs."""
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        sim_topk_ivfpq,
        N_QUERIES,
        TOP_K,
    )

    rows = sim_topk_ivfpq(spark, sf_dir).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(per_q) == N_QUERIES
    assert all(len(s) == TOP_K for s in per_q.values())

    erows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in erows])
    X = np.vstack([np.asarray(r["embedding"], dtype=np.float64) for r in erows])
    recalls = []
    for qid in range(N_QUERIES):
        qv = X[ids == qid][0]
        d = ((X - qv) ** 2).sum(1)
        d[ids == qid] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:TOP_K]].tolist())
        recalls.append(len(per_q[qid] & exact) / TOP_K)
    assert np.mean(recalls) >= 0.5, recalls

    again = sim_topk_ivfpq(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pq_compress_invariants(spark, sf_dir):
    """⊘ gates for embedding_pq_compress: full coverage, a plausible
    reconstruction error (positive, and far below the per-dim variance a
    code-of-zero baseline would leave), healthy codebook usage, and
    determinism."""
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_pq_compress,
    )

    row = embedding_pq_compress(spark, sf_dir).collect()[0]
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert row["n_vectors"] == n_emb
    assert 0 < row["reconstruction_mse"]
    emb = np.vstack(
        [
            np.asarray(r["embedding"], dtype=np.float64)
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("embedding")
            .collect()
        ]
    )
    per_dim_var = emb.var(axis=0).mean()
    assert row["reconstruction_mse"] < per_dim_var, (
        row["reconstruction_mse"],
        per_dim_var,
    )
    assert row["codes_used_sub0"] >= 8  # at least half the codebook works
    again = embedding_pq_compress(spark, sf_dir).collect()[0]
    assert tuple(row) == tuple(again)


def test_session_model_cache_matches_fresh_fit(spark, sf_dir):
    """The session-scoped ANN model cache must be a pure memo: a cached
    corpus_centroids / corpus_pq_codebooks hit is bit-identical to a
    fresh fit of the same corpus (the determinism that makes the
    index-once/probe-many posture safe), and repeated calls hit the
    cache (same driver-side object)."""
    from recommendation_system_big_data_spark.operators.similarity import (
        _FITTED_MODELS,
        _pq_fit_codebooks,
        corpus_centroids,
        corpus_pq_codebooks,
        corpus_vectors,
        kmeans_centroids,
    )

    cached = sorted(map(str, corpus_centroids(spark, sf_dir).collect()))
    fresh = sorted(
        map(str, kmeans_centroids(corpus_vectors(spark, sf_dir)).collect())
    )
    assert cached == fresh and len(cached) > 1

    cb_cached = corpus_pq_codebooks(spark, sf_dir)
    assert cb_cached == _pq_fit_codebooks(corpus_vectors(spark, sf_dir))
    # second call returns the memoized object, not a refit
    assert corpus_pq_codebooks(spark, sf_dir) is cb_cached
    app_id = spark.sparkContext.applicationId
    assert (app_id, sf_dir, "ivf_centroids") in _FITTED_MODELS


def test_session_model_cache_eviction_bounded(spark, sf_dir):
    """The model cache must stay bounded (LRU-ish eviction at
    _FITTED_MODELS_MAX) and rebuild evicted entries rather than serving
    stale objects from unbounded growth."""
    from recommendation_system_big_data_spark.operators import similarity as S

    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return builds["n"]

    S._FITTED_MODELS.clear()
    for i in range(S._FITTED_MODELS_MAX + 2):
        S._session_model(spark, (f"dir{i}", "kind"), build)
    assert len(S._FITTED_MODELS) <= S._FITTED_MODELS_MAX
    assert builds["n"] == S._FITTED_MODELS_MAX + 2
    # the oldest entry was evicted; re-requesting it rebuilds
    before = builds["n"]
    S._session_model(spark, ("dir0", "kind"), build)
    assert builds["n"] == before + 1
    S._FITTED_MODELS.clear()


def test_session_model_cache_true_lru(spark, sf_dir):
    """A cache HIT must refresh recency (true LRU): interleaving two
    corpora's three model kinds — the test suite's actual access
    pattern — must never evict-and-refit a hot entry, and a build that
    itself inserts (the hierarchical IVF builds the coarse model inside
    the fine model's build()) must not push the cache past its cap."""
    from recommendation_system_big_data_spark.operators import similarity as S

    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return builds["n"]

    S._FITTED_MODELS.clear()
    kinds = ("ivf_centroids", "coarse_centroids", "pq_codebooks")
    for _ in range(3):  # three interleaved passes over 2 corpora × 3 kinds
        for d in ("dirA", "dirB"):
            for k in kinds:
                S._session_model(spark, (d, k), build)
    assert builds["n"] == 6, "interleaved hot set must fit with zero refits"

    # nested insert during build() must respect the cap
    def nested_build():
        S._session_model(spark, ("dirC", "coarse"), build)
        builds["n"] += 1
        return builds["n"]

    S._session_model(spark, ("dirC", "fine"), nested_build)
    assert len(S._FITTED_MODELS) <= S._FITTED_MODELS_MAX
    # LRU order: touch the oldest entry, fill to the cap, and the
    # refreshed entry must survive while a non-touched one is evicted
    S._session_model(spark, ("dirA", "ivf_centroids"), build)  # hit
    n_before = builds["n"]
    i = 0
    while len(S._FITTED_MODELS) < S._FITTED_MODELS_MAX:
        S._session_model(spark, (f"fill{i}", "k"), build)
        i += 1
    S._session_model(spark, ("overflow", "k"), build)  # forces one eviction
    app_id = spark.sparkContext.applicationId
    assert (app_id, "dirA", "ivf_centroids") in S._FITTED_MODELS
    S._session_model(spark, ("dirA", "ivf_centroids"), build)
    assert builds["n"] == n_before + (i + 1), "refreshed entry was refit"
    S._FITTED_MODELS.clear()


def test_ivf_hier_recall_agreement_determinism(spark, sf_dir):
    """The two-level quantizer must (a) keep recall@10 in the same band as
    single-level IVF (coarse routing adds only boundary loss), (b) route
    most vectors to their true nearest fine cell (the agreement stat
    that evidences the routing quality directly), and (c) stay
    deterministic."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from recommendation_system_big_data_spark.functions.vectors import dot, norm
    from recommendation_system_big_data_spark.operators.similarity import (
        N_COARSE_PROBE,
        corpus_centroids,
        corpus_coarse_centroids,
        corpus_vectors,
        sim_topk_ivf_hier,
    )

    # (a) recall vs brute force — same floor as single-level IVF
    # (measured EQUAL to sim_topk_ivf at both fixture SFs: 0.460 /
    # 0.555 — the 2·n_probe query-side coarse route fully recovers the
    # single-level probe set)
    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    approx = _topsets(sim_topk_ivf_hier(spark, sf_dir))
    recalls = [
        len(approx.get(q, set()) & nbrs) / len(nbrs) for q, nbrs in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.3, sum(recalls) / len(recalls)

    # (b) routed fine assignment agrees with the exact nearest fine cell
    # for most vectors (N_COARSE_PROBE=2 recovers boundary straddlers)
    e = corpus_vectors(spark, sf_dir).withColumn("nv", norm(F.col("v")))
    fine = corpus_centroids(spark, sf_dir).withColumn("ncv", norm(F.col("cv")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("centroid_id"))
    exact_assign = {
        r["vec_id"]: r["centroid_id"]
        for r in (
            e.join(F.broadcast(fine))
            .select(
                "vec_id",
                "centroid_id",
                F.round(
                    dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("ncv")),
                    6,
                ).alias("c"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        )
    }
    # reconstruct the hier assignment exactly as the query does
    coarse = corpus_coarse_centroids(spark, sf_dir)
    assert coarse.count() >= 16
    hier_rows = sim_topk_ivf_hier(spark, sf_dir)  # warm the models
    hier_rows.collect()
    from recommendation_system_big_data_spark.operators import similarity as S

    # agreement measured through the operator's own routed frame:
    # re-derive it by calling the internals the same way the op does
    fine2coarse_w = Window.partitionBy("centroid_id").orderBy(
        F.desc("fc"), F.asc("coarse_id")
    )
    f2c = (
        fine.join(F.broadcast(coarse.withColumn("nccv", norm(F.col("ccv")))))
        .select(
            "centroid_id",
            "coarse_id",
            F.round(
                dot(F.col("cv"), F.col("ccv")) / (F.col("ncv") * F.col("nccv")),
                6,
            ).alias("fc"),
        )
        .withColumn("rn", F.row_number().over(fine2coarse_w))
        .filter(F.col("rn") == 1)
        .select("centroid_id", "coarse_id")
    )
    route_w = Window.partitionBy("vec_id").orderBy(F.desc("vc"), F.asc("coarse_id"))
    routed = (
        e.join(F.broadcast(coarse.withColumn("nccv", norm(F.col("ccv")))))
        .select(
            "vec_id",
            "v",
            "nv",
            "coarse_id",
            F.round(
                dot(F.col("v"), F.col("ccv")) / (F.col("nv") * F.col("nccv")), 6
            ).alias("vc"),
        )
        .withColumn("crn", F.row_number().over(route_w))
        .filter(F.col("crn") <= N_COARSE_PROBE)
        .select("vec_id", "v", "nv", "coarse_id")
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("centroid_id"))
    hier_assign = {
        r["vec_id"]: r["centroid_id"]
        for r in (
            routed.join(F.broadcast(f2c.join(fine, "centroid_id")), "coarse_id")
            .select(
                "vec_id",
                "centroid_id",
                F.round(
                    dot(F.col("v"), F.col("cv")) / (F.col("nv") * F.col("ncv")),
                    6,
                ).alias("c"),
            )
            .withColumn("rn", F.row_number().over(aw))
            .filter(F.col("rn") == 1)
            .collect()
        )
    }
    agree = sum(
        1 for k, v in exact_assign.items() if hier_assign.get(k) == v
    ) / len(exact_assign)
    assert agree >= 0.5, agree

    # (c) determinism
    a = sorted(map(str, sim_topk_ivf_hier(spark, sf_dir).collect()))
    b = sorted(map(str, sim_topk_ivf_hier(spark, sf_dir).collect()))
    assert a == b


def test_covariance_partition_order_invariant(spark, sf_dir):
    """embedding_covariance's r8 driver row went red on a one-ulp ROUND(,6)
    knife edge tipped by partial-aggregation summation order; the r9 row
    stayed red through the exact-decimal-sums rewrite because the pipeline
    still EXITED through a double ROUND (engine round algorithms differ on
    binary doubles). The r10 fix hashes no float at all: FLOOR-quantized
    integer nano-units in, exact integer algebra, cov_micros BIGINT out.
    This gate asserts bit-identical integer output across partition counts
    AND that the output really is integral (a regression back to float
    output is caught by the dtype check)."""
    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_covariance,
    )

    base = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for parts in ("1", "8", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            df = embedding_covariance(spark, sf_dir)
            assert dict(df.dtypes)["cov_micros"] == "bigint"
            rows = sorted(
                (r["i"], r["j"], r["cov_micros"]) for r in df.collect()
            )
            assert all(isinstance(r[2], int) for r in rows)
            results.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    assert results[0] == results[1] == results[2]


def test_truncated_rerank_recall_and_determinism(spark, sf_dir):
    """The truncated-prefix prefilter + exact rerank must (a) recover a
    solid share of the brute-force top-k even on these RANDOM (non-MRL-
    trained) fixture vectors, where the 16-dim prefix alone ranks poorly
    — measured 0.485 vs the pure-truncation recall@10 of ~0.19 that
    embedding_matryoshka_eval reports at dim 16 — and (b) strictly beat
    that pure-truncation recall, which is the entire point of carrying
    the 5x shortlist into an exact rerank. Also deterministic (exact
    semantics, no RNG)."""
    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_matryoshka_eval,
        sim_topk_bruteforce,
        sim_topk_truncated_rerank,
    )

    exact = _topsets(sim_topk_bruteforce(spark, sf_dir))
    two_stage = _topsets(sim_topk_truncated_rerank(spark, sf_dir))
    recalls = [
        len(two_stage.get(q, set()) & nbrs) / len(nbrs)
        for q, nbrs in exact.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.4, mean_recall
    trunc16 = {
        r["trunc_dim"]: r["recall_at_10"]
        for r in embedding_matryoshka_eval(spark, sf_dir).collect()
    }[16]
    assert mean_recall > trunc16, (mean_recall, trunc16)
    a = sorted(map(str, sim_topk_truncated_rerank(spark, sf_dir).collect()))
    b = sorted(map(str, sim_topk_truncated_rerank(spark, sf_dir).collect()))
    assert a == b


def test_matryoshka_eval_monotone(spark, sf_dir):
    """Recall@10 of truncated-dimension exact search must be a valid
    fraction and (weakly) improve as more dimensions are kept."""
    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_matryoshka_eval,
    )

    rows = {
        r["trunc_dim"]: r["recall_at_10"]
        for r in embedding_matryoshka_eval(spark, sf_dir).collect()
    }
    assert set(rows) == {8, 16, 32}
    assert all(0.0 <= v <= 1.0 for v in rows.values()), rows
    # weak monotonicity with a small tolerance: more dims, better recall
    assert rows[16] >= rows[8] - 0.05, rows
    assert rows[32] >= rows[16] - 0.05, rows


def test_zero_norm_prefix_guard_cross_engine(spark, tmp_path):
    """r9 ADVICE: a vector whose first MRL_DIM dims are all zero made the
    truncated-prefix cosine 0/0 — NULL in Spark (sorts last under DESC)
    but NaN/inf under DuckDB's IEEE float division, so the prefilter
    ranking could diverge cross-engine. Both queries now emit a fixed
    sentinel (-2.0, below any real cosine) for zero-norm prefixes. This
    plants exactly that vector (zero 16-dim prefix, nonzero tail) in a
    temp embeddings table and asserts (a) the Spark rankings contain no
    NULL scores and include the planted vector, and (b) the Spark result
    equals the DuckDB oracle CELL-EXACTLY on the planted corpus — the
    divergence the advice predicted, reproduced and pinned."""
    import duckdb
    import numpy as np

    from recommendation_system_big_data_spark.operators.similarity import (
        MRL_DIM,
        embedding_matryoshka_eval,
        sim_topk_truncated_rerank,
    )
    from recommendation_system_big_data_spark.registry import registry

    rng = np.random.RandomState(7)
    rows = []
    for vid in range(30):
        v = rng.randn(64).astype("float32")
        if vid == 25:  # planted: zero prefix, nonzero tail
            v[:MRL_DIM] = 0.0
        rows.append((vid, [float(x) for x in v], vid % 3))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    R = registry()
    for name, fn in (
        ("sim_topk_truncated_rerank", sim_topk_truncated_rerank),
        ("embedding_matryoshka_eval", embedding_matryoshka_eval),
    ):
        sdf = fn(spark, str(tmp_path))
        srows = sorted(
            tuple(repr(v) for v in r) for r in sdf.collect()
        )
        assert all("None" not in r for r in srows), (name, srows[:3])
        res = con.execute(R[name].oracle)
        dcols = [d[0] for d in res.description]
        idx = [dcols.index(c) for c in sdf.columns]
        orows = sorted(
            tuple(repr(float(r[i]) if isinstance(r[i], float) else r[i]) for i in idx)
            for r in res.fetchall()
        )
        assert srows == orows, (name, srows[:3], orows[:3])


def test_recall_audits_carry_floor_flags(spark, sf_dir):
    """VERDICT r13 #6: the audit rows must carry the committed floor and
    a live pass flag so a driver rows-only row is a semantic check."""
    from recommendation_system_big_data_spark.operators.similarity import (
        sim_ann_recall_audit,
        sim_lsh_recall_audit,
    )

    for fn in (sim_lsh_recall_audit, sim_ann_recall_audit):
        row = fn(spark, sf_dir).collect()[0].asDict()
        assert row["recall_floor_micros"] in (300000, 600000)
        assert row["recall_ge_floor"] == 1, (fn.__name__, row)
        assert row["mean_recall_micros"] >= row["recall_floor_micros"]
