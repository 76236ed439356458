"""Property tests for the text functions: Spark results must equal a plain
Python model of the same definition on adversarial inputs (empty-ish text,
single token, repeated tokens, unicode, long runs) — all examples evaluated
in ONE DataFrame pass per property, not one job per example."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.functions.text import tokens
from recommendation_system_big_data_spark.operators.dedup import shingles

VOCAB = ["the", "cat", "sat", "on", "répé", "数据", "x" * 50, "a"]


def _corpus():
    rng = random.Random(7)
    docs = [
        "single",
        "two tokens",
        "the the the the",  # heavy repetition
        "répé 数据 mixed unicode",
        " ".join(rng.choice(VOCAB) for _ in range(200)),
    ]
    for _ in range(20):
        docs.append(" ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 40))))
    return [(i, d) for i, d in enumerate(docs)]


def test_token_count_matches_python_split(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == len(text.split(" ")), (doc_id, text)


def test_shingles_match_python_model(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }

    def model(text: str) -> set[str]:
        toks = text.split(" ")
        n = max(len(toks) - 3, 0)
        out = set()
        for i in range(n + 1):
            out.add(" ".join(toks[i : i + 3]))
        return out

    for doc_id, text in rows:
        assert got[doc_id] == model(text), (doc_id, text)


def test_fingerprint_is_order_and_repeat_invariant(spark):
    # md5 over sorted distinct tokens: permuting or repeating tokens must
    # not change it; changing the token set must.
    base = "delta alpha charlie bravo"
    variants = [
        (1, base),
        (2, "alpha bravo charlie delta"),
        (3, "alpha alpha bravo charlie delta delta"),
        (4, "alpha bravo charlie echo"),
    ]
    df = spark.createDataFrame(variants, ["doc_id", "text"])
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(F.col("text")))), " ")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", F.md5(canon.cast("binary")).alias("fp")
        ).collect()
    }
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]
    expected = hashlib.md5(b"alpha bravo charlie delta").hexdigest()
    assert got[1] == expected
