"""Stage-level bisect for text_bm25_retrieval (VERDICT r11 #2 / the
r10-committed disposition in BASELINE.md).

Times each subtree of the BM25 plan in isolation at sf0.1 (warm-min of
REPS runs after one warmup) so the grown stage — if any — is named
instead of re-litigating the watch line. Run:

    python tools/bisect_bm25.py [sf_dir]
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, ".")
from recommendation_system_big_data_spark.session import get_spark
from recommendation_system_big_data_spark.sources.csv import load  # noqa: E402
from recommendation_system_big_data_spark.functions.text import (  # noqa: E402
    _BM25_K1,
    _BM25_B,
    _BM25_QLEN,
    _BM25_RESIDUE,
    _BM25_STRIDE,
    _BM25_TOP_K,
    text_bm25_retrieval,
    tokens,
)

REPS = 4


def timeit(label, thunk):
    thunk()  # warm
    best = min(
        (lambda t0=time.perf_counter(): (thunk(), time.perf_counter() - t0)[1])()
        for _ in range(REPS)
    )
    print(f"{label:24s} {best:7.3f}s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")

    def build():
        tok = docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("token")
        ).where(F.col("token") != "")
        postings = tok.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
        dl = tok.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("dl")
        )
        stats = dl.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        dfreq = postings.groupBy("token").agg(
            F.count(F.lit(1)).cast("long").alias("df")
        )
        qtok = (
            docs.where(F.col("doc_id") % _BM25_STRIDE == _BM25_RESIDUE)
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode(
                    F.slice(tokens(F.col("text")), 1, _BM25_QLEN)
                ).alias("token"),
            )
            .where(F.col("token") != "")
            .distinct()
        )
        return tok, postings, dl, stats, dfreq, qtok

    tok, postings, dl, stats, dfreq, qtok = build()

    t = {}
    t["tok"] = timeit("tok (explode)", lambda: tok.count())
    t["postings"] = timeit("postings (tf)", lambda: postings.count())
    t["dl"] = timeit("dl (doc len)", lambda: dl.count())
    t["dfreq"] = timeit("dfreq (df)", lambda: dfreq.count())
    t["qtok"] = timeit("qtok (queries)", lambda: qtok.count())

    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    contrib = (
        idf
        * F.col("tf")
        * (_BM25_K1 + 1)
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qtok.join(postings, "token")
        .where(F.col("doc_id") != F.col("query_id"))
        .join(dfreq, "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    t["scored"] = timeit("scored (joins+agg)", lambda: scored.count())

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    full = (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= _BM25_TOP_K)
        .select("query_id", "doc_id", "score", "rn")
    )
    t["full_inline"] = timeit("full (inline rebuild)", lambda: full.count())
    t["full_query"] = timeit(
        "full (registered fn)", lambda: text_bm25_retrieval(spark, sf_dir).count()
    )
    print()
    print("increments: scored-over-inputs =",
          round(t["scored"] - max(t["postings"], t["dfreq"], t["dl"], t["qtok"]), 3),
          "| window-over-scored =", round(t["full_inline"] - t["scored"], 3))


if __name__ == "__main__":
    main()
