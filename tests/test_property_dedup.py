"""Differential property tests: a pure-Python reference implementation of
the shingle / Jaccard / fingerprint semantics, checked against the Spark
operators on a generated corpus with controlled duplicate structure.
This catches semantic drift the fixed testdata can't (e.g. off-by-one in
shingling short docs, union-vs-concat jaccard denominators)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    jaccard,
    shingles,
)

VOCAB = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]


def _gen_corpus(seed: int, n: int = 40) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        if i > 0 and rng.random() < 0.3:
            # near-dup of an earlier doc: mutate a few tokens
            base = docs[rng.randrange(len(docs))][1].split()
            for _ in range(max(1, len(base) // 10)):
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            text = " ".join(base)
        else:
            text = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30)))
        docs.append((i, text))
    return docs


def _py_shingles(text: str) -> set[str]:
    toks = text.split(" ")
    if len(toks) < 3:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _py_jaccard(a: set[str], b: set[str]) -> float:
    return len(a & b) / len(a | b)


def test_shingles_match_python_reference(spark):
    corpus = _gen_corpus(seed=7)
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }
    for doc_id, text in corpus:
        assert got[doc_id] == _py_shingles(text), (doc_id, text)


def test_pairwise_jaccard_matches_python_reference(spark):
    corpus = _gen_corpus(seed=11, n=25)
    df = spark.createDataFrame(corpus, ["doc_id", "text"]).select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    a, b = df.alias("a"), df.alias("b")
    ja = jaccard(F.col("a.sh"), F.col("b.sh"))
    got = {
        (r["da"], r["db"]): r["j"]
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            F.round(ja, 9).alias("j"),
        )
        .collect()
    }
    sh = {i: _py_shingles(t) for i, t in corpus}
    for i, _ in corpus:
        for k, _ in corpus:
            if i < k:
                assert abs(got[(i, k)] - round(_py_jaccard(sh[i], sh[k]), 9)) < 1e-9


def test_fingerprint_matches_python_md5(spark):
    corpus = _gen_corpus(seed=13, n=20)
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    canon = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ").cast(
            "binary"
        )
    )
    got = {r["doc_id"]: r["fp"] for r in df.select("doc_id", canon.alias("fp")).collect()}
    for doc_id, text in corpus:
        expect = hashlib.md5(
            " ".join(sorted(set(text.split(" ")))).encode()
        ).hexdigest()
        assert got[doc_id] == expect


def test_threshold_pairs_are_exactly_the_python_reference_set(spark):
    corpus = _gen_corpus(seed=17, n=30)
    sh = {i: _py_shingles(t) for i, t in corpus}
    want = {
        (i, k)
        for i, _ in corpus
        for k, _ in corpus
        if i < k and _py_jaccard(sh[i], sh[k]) >= JACCARD_THRESHOLD
    }
    df = spark.createDataFrame(corpus, ["doc_id", "text"]).select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    a, b = df.alias("a"), df.alias("b")
    ja = jaccard(F.col("a.sh"), F.col("b.sh"))
    got = {
        (r["da"], r["db"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(ja >= JACCARD_THRESHOLD)
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .collect()
    }
    assert got == want
