"""Dedup semantics beyond the oracle gate: MinHash-LSH recall against the
exact Jaccard result, SimHash fingerprint properties, determinism of the
hash-derived signatures across repeated runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_ngram_jaccard,
    dedup_simhash,
    minhash_signature,
    shingles,
    simhash64,
)
from recommendation_system_big_data_spark.catalog import load


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def test_minhash_recall_vs_exact(spark, sf_dir):
    exact = _pairs(dedup_ngram_jaccard(spark, sf_dir))
    approx = _pairs(dedup_minhash_lsh(spark, sf_dir))
    # precision is exact (candidates are verified with true Jaccard)...
    assert approx <= exact or not exact
    # ...and recall at J>=0.5 with 16 bands × 4 rows should be near-total.
    if exact:
        assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_incremental_minhash_subset_and_recall(spark, sf_dir):
    """The MinHash-banded incremental variant must emit only true pairs
    (exact verify ⇒ subset of the exact incremental query) with
    near-total recall at J>=0.5 (16 bands × 4 rows)."""
    from recommendation_system_big_data_spark.operators.dedup import (
        dedup_incremental_near,
        dedup_incremental_near_minhash,
    )

    def pairs(df):
        return {
            (r["new_doc"], r["corpus_doc"])
            for r in df.select("new_doc", "corpus_doc").collect()
        }

    exact = pairs(dedup_incremental_near(spark, sf_dir))
    approx = pairs(dedup_incremental_near_minhash(spark, sf_dir))
    assert approx <= exact or not exact
    if exact:
        assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_planted_probe_nonvacuous_and_minhash_recall(spark, sf_dir):
    """The planted-batch probe variants (VERDICT r6 #2): non-empty BY
    CONSTRUCTION at every scale factor, every planted document finds its
    own source at >= 0.5, and the banded-MinHash path is a subset of the
    exact probe with near-total recall. This fixture also pins the true
    position-independent MinHash semantics — the round-7 seed-binding fix
    (minhash_from_hashes) is exactly what a shifted-shingle batch
    exercises and the md5-split fixtures could not."""
    from recommendation_system_big_data_spark.operators.dedup import (
        _PROBE_ID_OFFSET,
        dedup_incremental_near_probe,
        dedup_incremental_near_probe_minhash,
    )

    def pairs(df):
        return {
            (r["new_doc"], r["corpus_doc"])
            for r in df.select("new_doc", "corpus_doc").collect()
        }

    exact = pairs(dedup_incremental_near_probe(spark, sf_dir))
    assert exact, "planted probe must be non-empty at any SF"
    # every planted doc matches its own source
    planted = {d for d, _ in exact}
    assert all((d, d - _PROBE_ID_OFFSET) in exact for d in planted)
    approx = pairs(dedup_incremental_near_probe_minhash(spark, sf_dir))
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_probe_id_offset_clears_corpus_ids(spark, sf_dir):
    """_PROBE_ID_OFFSET is a fixed constant (the DuckDB oracle must
    compute identical planted ids), so the no-collision guarantee is an
    assumption about the fixture: max corpus doc_id must stay below it.
    If a larger scale factor ever breaks this, the constant must be
    raised in dedup.py (operator + oracle together)."""
    from recommendation_system_big_data_spark.operators.dedup import (
        _PROBE_ID_OFFSET,
    )

    max_id = (
        load(spark, sf_dir, "documents")
        .agg(F.max("doc_id").alias("m"))
        .collect()[0]["m"]
    )
    assert max_id < _PROBE_ID_OFFSET, (
        f"corpus doc_id {max_id} collides with the planted-probe id "
        f"space (offset {_PROBE_ID_OFFSET}); raise _PROBE_ID_OFFSET in "
        "dedup.py and its oracle"
    )


def test_minhash_signature_varies_by_seed(spark, sf_dir):
    """True MinHash: the 64 signature slots are DIFFERENT hash functions —
    a multi-shingle doc's slots cannot all collapse to one value (the
    failure mode of the pre-r7 element-index seed shadowing)."""
    docs = load(spark, sf_dir, "documents").limit(5).select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    for row in docs.select(
        "doc_id", minhash_signature(F.col("sh")).alias("sig")
    ).collect():
        assert len(set(row["sig"])) > 1, row["doc_id"]


def test_minhash_signature_deterministic(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(50).select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    a = docs.select("doc_id", minhash_signature(F.col("sh")).alias("sig")).collect()
    b = docs.select("doc_id", minhash_signature(F.col("sh")).alias("sig")).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_simhash_identical_docs_share_fingerprint(spark, sf_dir):
    # duplicate the token stream of one doc under two ids → same simhash
    toks = (
        load(spark, sf_dir, "documents")
        .limit(1)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    two = toks.withColumn("doc_id", F.lit(1)).unionByName(
        toks.withColumn("doc_id", F.lit(2))
    )
    fp = simhash64(two.select("doc_id", "token", "cnt")).collect()
    assert len(fp) == 2
    assert fp[0]["simhash"] == fp[1]["simhash"]


def test_simhash_pairs_have_small_hamming(spark, sf_dir):
    rows = dedup_simhash(spark, sf_dir).collect()
    assert all(r["hamming"] <= 3 for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_shingle_index_bounded_eviction(spark, sf_dir):
    """ADVICE r1: the session shingle cache must evict (and unpersist) old
    entries instead of accumulating one persisted frame per sf_dir."""
    from recommendation_system_big_data_spark.operators import dedup as D

    D._SHINGLE_INDEX.clear()
    a = D.shingle_index(spark, "/root/testdata/sf0.001")
    assert a is D.shingle_index(spark, "/root/testdata/sf0.001")  # cache hit
    D.shingle_index(spark, "/root/testdata/sf0.01")
    D.shingle_index(spark, "/root/testdata/sf0.1")  # 3rd entry → evict oldest
    assert len(D._SHINGLE_INDEX) <= D._SHINGLE_INDEX_MAX
    # the evicted (oldest) frame must be unpersisted
    assert a.storageLevel.useMemory is False
    D._SHINGLE_INDEX.clear()


def test_df_cap_is_noop_on_testdata(spark, sf_dir):
    """VERDICT r2 #5: the SHINGLE_DF_CAP boilerplate anti-join must not
    change results on the test corpus (max shingle df 25 at sf0.1, far
    below the production cap) — capped and effectively-uncapped runs must
    emit identical pair sets."""
    from recommendation_system_big_data_spark.operators.dedup import (
        _exploded_index,
        ngram_jaccard_pairs,
    )

    ex = _exploded_index(spark, sf_dir)
    capped = ngram_jaccard_pairs(ex)  # default SHINGLE_DF_CAP
    uncapped = ngram_jaccard_pairs(ex, df_cap=10**9)
    assert _pairs(capped) == _pairs(uncapped)


def test_df_cap_bounds_boilerplate_blowup(spark):
    """On a template-heavy corpus (every doc shares one boilerplate
    sentence), uncapped candidate generation goes quadratic in the corpus
    while a binding cap removes the boilerplate shingles entirely: the
    planted true near-dup pair survives, the n² boilerplate-only pairs do
    not."""
    from recommendation_system_big_data_spark.operators.dedup import (
        _exploded_shingles,
        ngram_jaccard_pairs,
    )

    boiler = "all rights reserved contact us terms of service"
    # 8 boiler tokens + 2 unique → 6 of 8 shingles shared between any two
    # docs → J = 6/10 ≥ 0.5 for every one of the C(40,2) boilerplate pairs
    docs = [(i, "en", f"{boiler} id{i} x{i}") for i in range(40)]
    # planted near-dup pair: identical long bodies, distinct from the rest
    twin = "the quick brown fox jumps over the lazy dog again and again today"
    docs += [(100, "en", twin), (101, "en", twin + " extra")]
    ex = _exploded_shingles(
        spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    )
    uncapped = _pairs(ngram_jaccard_pairs(ex, df_cap=10**9))
    capped = _pairs(ngram_jaccard_pairs(ex, df_cap=10))
    assert (100, 101) in capped
    # boilerplate-only pairs pass J>=0.5 uncapped (shared sentence dominates
    # the short docs) but are dropped once its shingles exceed the cap
    assert len(uncapped) > len(capped)
    assert all(a == 100 for a, _ in capped), capped


def test_connected_components_converges_on_long_chains(spark):
    """A path graph has the worst diameter for min-label propagation; two
    10-node chains plus an isolated pair must collapse to exactly three
    components labeled by their minimum node."""
    from recommendation_system_big_data_spark.operators.dedup import (
        connected_components,
    )

    chain1 = [(i, i + 1) for i in range(1, 10)]       # 1–10
    chain2 = [(i, i + 1) for i in range(20, 29)]      # 20–29
    pairs = spark.createDataFrame(chain1 + chain2 + [(100, 101)], ["a", "b"])
    got = {
        (r["node"], r["comp"])
        for r in connected_components(pairs, "a", "b").collect()
    }
    want = {(n, 1) for n in range(1, 11)}
    want |= {(n, 20) for n in range(20, 30)}
    want |= {(100, 100), (101, 100)}
    assert got == want


def test_substring_span_bounds_and_symmetry(spark, sf_dir):
    """Span-profile invariants: dup_frac ∈ [0, 1] and consistent with
    its own counts; a duplicated window implies ≥ 2 docs carry it, so
    the corpus-wide dup_windows total is never 1."""
    from recommendation_system_big_data_spark.operators.dedup import (
        dedup_substring_span,
    )

    rows = dedup_substring_span(spark, sf_dir).collect()
    assert rows
    total_dup = 0
    for r in rows:
        assert 0 <= r["dup_windows"] <= r["n_windows"]
        assert abs(r["dup_frac"] - round(r["dup_windows"] / r["n_windows"], 6)) < 1e-9
        total_dup += r["dup_windows"]
    assert total_dup != 1


def test_simhash_perturbation_sensitivity(spark, sf_dir):
    """Adversarial-perturbation gate (the probe style that exposed the
    round-7 MinHash seed bug): a 2-token edit of a ~long document must
    move the fingerprint only a few bits, while an unrelated document
    sits near the 32-bit random-distance floor. Catches any future
    regression that makes the fingerprint position- or doc-global (both
    would blow up the perturbation distance or zero the unrelated one)."""
    from pyspark.sql import functions as F

    base = (
        load(spark, sf_dir, "documents")
        .where(F.size(F.split("text", " ")) >= 60)
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    assert len(base) == 2
    toks_a = base[0]["text"].split(" ")
    toks_b = base[1]["text"].split(" ")
    perturbed = list(toks_a)
    perturbed[3] = "zzz_perturbed_token_1"
    perturbed[17] = "zzz_perturbed_token_2"
    rows = (
        [(1, t) for t in toks_a]
        + [(2, t) for t in perturbed]
        + [(3, t) for t in toks_b]
    )
    toks = (
        spark.createDataFrame(rows, "doc_id long, token string")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    fp = {r["doc_id"]: r["simhash"] for r in simhash64(toks).collect()}
    ham = lambda x, y: bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
    d_pert = ham(fp[1], fp[2])
    d_unrel = ham(fp[1], fp[3])
    # margin gate, not an absolute floor: two documents drawn from the
    # SAME generator vocabulary legitimately land well under the 32-bit
    # random distance (measured 15 at sf0.01) — what must hold is that a
    # 2-token edit stays MUCH closer than a different document
    assert d_pert < 12, d_pert
    assert d_unrel >= d_pert + 8, (d_unrel, d_pert)


def test_semdedup_precision_and_recall(spark, sf_dir):
    """SemDeDup (cluster-blocked semantic dedup): every reported
    (keeper, vec_id) must be a true >=threshold cosine pair with
    keeper < vec_id (precision exact by construction — candidates are
    verified with true cosine), and the drop set must cover >= 0.75 of
    the brute-force all-pairs truth (0.87-0.90 measured at both SFs
    with 3-probe assignment)."""
    from recommendation_system_big_data_spark.operators.dedup import (
        SEMANTIC_THRESHOLD,
        dedup_semantic_semdedup,
    )
    from recommendation_system_big_data_spark.functions.vectors import (
        as_double_array,
        cosine,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    cos = cosine(F.col("a.v"), F.col("b.v"))
    truth = {
        (r["va"], r["vb"])
        for r in (
            e.alias("a")
            .join(e.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(cos >= SEMANTIC_THRESHOLD)
            .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
            .collect()
        )
    }
    res = dedup_semantic_semdedup(spark, sf_dir).collect()
    reported = {(r["keeper"], r["vec_id"]) for r in res}
    assert reported <= truth, reported - truth
    truth_drop = {b for _, b in truth}
    res_drop = {r["vec_id"] for r in res}
    assert res_drop <= truth_drop
    if truth_drop:
        recall = len(res_drop & truth_drop) / len(truth_drop)
        assert recall >= 0.75, (len(res_drop), len(truth_drop), recall)


def test_semdedup_hier_routed_path(spark, sf_dir):
    """The large-corpus path (two-level quantizer routing, default above
    SEMANTIC_HIER_THRESHOLD vectors — r8 VERDICT #5), forced on fixture
    data: precision stays exact by construction (candidates are verified
    with true cosine), recall vs the brute-force truth must stay at the
    direct path's gate, and the routed drop-set should agree with the
    direct assignment's almost everywhere (the fixture's routed fine
    assignment matches the exact nearest-fine assignment)."""
    from recommendation_system_big_data_spark.operators.dedup import (
        SEMANTIC_THRESHOLD,
        semantic_semdedup_frame,
    )
    from recommendation_system_big_data_spark.functions.vectors import (
        as_double_array,
        cosine,
    )

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    cos = cosine(F.col("a.v"), F.col("b.v"))
    truth = {
        (r["va"], r["vb"])
        for r in (
            e.alias("a")
            .join(e.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
            .filter(cos >= SEMANTIC_THRESHOLD)
            .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"))
            .collect()
        )
    }
    hier = semantic_semdedup_frame(spark, sf_dir, force_hier=True).collect()
    reported = {(r["keeper"], r["vec_id"]) for r in hier}
    assert reported <= truth, reported - truth
    truth_drop = {b for _, b in truth}
    hier_drop = {r["vec_id"] for r in hier}
    assert hier_drop <= truth_drop
    if truth_drop:
        recall = len(hier_drop & truth_drop) / len(truth_drop)
        assert recall >= 0.75, (len(hier_drop), len(truth_drop), recall)
    # routed vs direct agreement on the drop set
    direct_drop = {
        r["vec_id"]
        for r in semantic_semdedup_frame(spark, sf_dir, force_hier=False).collect()
    }
    if direct_drop:
        overlap = len(hier_drop & direct_drop) / len(direct_drop)
        assert overlap >= 0.9, (len(hier_drop), len(direct_drop), overlap)


def test_dedup_cascade_planted_funnel(spark):
    """The staged funnel over a PLANTED corpus: 3 exact copies of one doc
    (stage 1 must drop 2), one near-dup pair ~0.9 Jaccard (stage 2 must
    drop the higher id), one unrelated doc. Exercises both stages'
    drop paths, which the fixture corpus cannot below sf0.1 (it has no
    exact-duplicate texts there)."""
    from recommendation_system_big_data_spark.operators.dedup import (
        dedup_cascade_report,
    )

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(3, 40))  # drop 3 leading tokens
    other = " ".join(f"x{i}" for i in range(40))
    d = spark.createDataFrame(
        [
            (0, "en", base),
            (1, "en", base),
            (2, "en", base),
            (3, "en", near),
            (4, "en", other),
            (5, "fr", other),
        ],
        "doc_id long, lang string, text string",
    )
    rows = {
        (r["stage_id"], r["lang"]): (r["n_in"], r["n_dropped"], r["n_out"])
        for r in dedup_cascade_report(d).collect()
    }
    # stage 1: en 5 docs -> 2 exact copies of `base` dropped. Exact groups
    # span languages (text identity only), so fr's sole doc (5, same text
    # as en doc 4, keeper = min id 4) is ALSO dropped — fr must still
    # report (1, 1, 0), not vanish from the funnel (regression pin: the
    # first cut inner-joined the rollups and lost the row).
    assert rows[(1, "en")] == (5, 2, 3)
    assert rows[(1, "fr")] == (1, 1, 0)
    # stage 2: the near-dup (doc 3 vs keeper 0) drops; fr has no
    # surviving docs so it has no stage-2 row (documented semantics).
    assert rows[(2, "en")] == (3, 1, 2)
    assert (2, "fr") not in rows
