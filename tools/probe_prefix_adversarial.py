"""Adversarial scale probe for dedup_prefix_filter_join (VERDICT r11 #4).

The worry: a near-identical corpus makes prefixes useless — every copy
of a duplicated document shares its whole rarest-shingle prefix, so the
candidate join's posting lists grow with the duplication factor K and
the per-group candidate set grows as K². That K² is OUTPUT-bound (the
true duplicate-pair set itself is K·(K−1)/2 per group), so the honest
question is whether the PRE-verify stages blow up FASTER than the
output: candidate rows before DISTINCT (the prefix-join fan-out — one
row per shared prefix token per pair) and the verify join's input.

Method: replicate the sf0.1 documents table K times (texts identical,
doc_ids offset — the worst case: every group is an exact duplicate
class, Jaccard 1.0, so NO candidate is ever pruned by the length filter
or lost to verify), measure each stage's row count and the end-to-end
warm time, and fit the growth exponent between successive K.

    python tools/probe_prefix_adversarial.py [base_sf_dir]
"""
from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from recommendation_system_big_data_spark.session import get_spark  # noqa: E402
from recommendation_system_big_data_spark.operators import dedup  # noqa: E402


def build_duplicated(spark, base_dir: str, k: int, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def stage_counts(spark, sf_dir: str) -> dict:
    """Re-derive the query's internal stages (same expressions as
    dedup.dedup_prefix_filter_join) and count each."""
    tau = dedup.PREFIX_TAU_MICROS
    idx = dedup.shingle_index(spark, sf_dir)
    full = idx.select("doc_id", "lang", "sh", F.size("sh").alias("n_sh"))
    ex = full.select(
        "doc_id", "lang", "n_sh", F.explode("sh").alias("shingle")
    )
    dfreq = ex.groupBy("shingle").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    plen = (
        F.col("n_sh") - F.expr(f"({tau} * n_sh + 999999) div 1000000") + 1
    ).cast("int")
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy("doc_id", "lang", "n_sh")
        .agg(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("df"), F.col("shingle")))
                    ),
                    lambda s: s["shingle"],
                ),
                F.lit(1),
                plen,
            ).alias("prefix")
        )
    )
    pre = ordered.select(
        "doc_id", "lang", "n_sh", F.explode("prefix").alias("shingle")
    ).localCheckpoint()
    a, b = pre.alias("a"), pre.alias("b")
    raw_cand = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.n_sh") * 1000000 >= tau * F.col("b.n_sh"))
        & (F.col("b.n_sh") * 1000000 >= tau * F.col("a.n_sh")),
    )
    return {
        "prefix_rows": pre.count(),
        "raw_cand": raw_cand.count(),
        "cand": raw_cand.select(
            F.col("a.doc_id"), F.col("b.doc_id")
        ).distinct().count(),
    }


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # 8 GiB heap: the K=8 point carries a ~10M-row verify join whose
    # array payloads overflow the default 1g local-mode heap — a probe
    # sizing concern, not an engine one (executors own their memory on
    # a real cluster).
    spark = get_spark(
        app_name="prefix-adversarial",
        extra_conf={"spark.driver.memory": "8g"},
    )
    root = tempfile.mkdtemp(prefix="prefix_adv_")
    prev = None
    print(f"base={base}  tau={dedup.PREFIX_TAU_MICROS}")
    print(
        f"{'K':>2} {'docs':>6} {'prefix':>9} {'raw_cand':>10} "
        f"{'cand':>9} {'out':>9} {'sec':>7}  exponents(prefix/raw/cand/out/sec)"
    )
    try:
        for k in (1, 2, 4, 8):
            d = os.path.join(root, f"k{k}")
            build_duplicated(spark, base, k, d)
            counts = stage_counts(spark, d)
            q = dedup.dedup_prefix_filter_join(spark, d)
            q.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            out_rows = q.count()
            sec = time.perf_counter() - t0
            docs = spark.read.parquet(
                os.path.join(d, "documents.parquet")
            ).count()
            row = dict(counts, out=out_rows, sec=sec, docs=docs, k=k)
            exps = ""
            if prev:
                e = [
                    f"{math.log(row[f] / max(prev[f], 1)) / math.log(k / prev['k']):.2f}"
                    for f in ("prefix_rows", "raw_cand", "cand", "out", "sec")
                ]
                exps = "/".join(e)
            print(
                f"{k:>2} {docs:>6} {row['prefix_rows']:>9} {row['raw_cand']:>10} "
                f"{row['cand']:>9} {out_rows:>9} {sec:>7.2f}  {exps}"
            )
            prev = row
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
