"""Partition-order ulp sweep (r8 VERDICT #8): catch the
embedding_covariance class of bug — a float value whose ROUND(,6) result
depends on partial-aggregation summation order — BEFORE a driver round
does.

For every oracle-bearing registry query (or the names given on argv), run
the Spark side under two deliberately different physical layouts:

  A: shuffle.partitions=1,  default input splits   (one reducer — the
     "sequential sum" order)
  B: shuffle.partitions=37, 64 KiB input splits    (many reducers AND many
     scan partitions — maximally different partial-combine order; 37 is
     prime so hash distribution differs from every power-of-2 default)

and diff the final (rounded) outputs cell-exactly. Any difference means a
float path accumulates in layout-dependent order close enough to a
ROUND(,6) boundary to flip — the fix is exact-decimal accumulation
(embedding_standardize / embedding_covariance pattern), not tolerance.
(A layout sweep can only prove sensitivity, not its absence — the r8
embedding_covariance flip survived two local partition counts and still
tipped in the driver env; queries whose floats ride exact-decimal sums
are immune by construction and this sweep is their regression guard.)

Usage:
    python tools/ulp_partition_sweep.py [--sf DIR] [name ...]
Writes one JSON line to SWEEPS.jsonl (tag: ulp_partition_sweep) and exits
non-zero on any A≠B diff.
"""
import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from recommendation_system_big_data_spark.registry import registry  # noqa: E402

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]

R = registry()
names = args or [
    n
    for n, q in R.items()
    if q.oracle is not None and "alias" not in q.tags
]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ulp-sweep")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)


def _clear_session_caches():
    """Drop the session-scoped PERSISTED frames and fitted models between
    layout runs. Without this, layout B reads the shingle index (and any
    k-means model) materialized under layout A's partitioning, and every
    cached-index consumer compares A against A — a vacuous zero-diff
    (found by round-9 review; the first sweep's dedup-family evidence was
    overstated exactly this way)."""
    from recommendation_system_big_data_spark.operators import dedup as _dedup
    from recommendation_system_big_data_spark.operators import (
        similarity as _similarity,
    )

    for cache in (_dedup._SHINGLE_INDEX, _dedup._HOT_SHINGLES):
        for df in cache.values():
            df.unpersist(blocking=False)
        cache.clear()
    _similarity._FITTED_MODELS.clear()


def run(name, shuffle, split_bytes):
    _clear_session_caches()
    spark.conf.set("spark.sql.shuffle.partitions", shuffle)
    spark.conf.set("spark.sql.files.maxPartitionBytes", split_bytes)
    df = R[name].fn(spark, SF)
    return sorted(
        [tuple(repr(v) for v in row) for row in df.collect()], key=repr
    )


fails, t0 = [], time.time()
for i, name in enumerate(names):
    try:
        a = run(name, "1", str(128 * 1024 * 1024))
        b = run(name, "37", str(64 * 1024))
        if a != b:
            fails.append(name)
            only_a = [r for r in a if r not in b][:2]
            only_b = [r for r in b if r not in a][:2]
            print(f"DIFF {name}: A-only {only_a} B-only {only_b}", flush=True)
        elif (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)} ok ({time.time() - t0:.0f}s)", flush=True)
    except Exception as e:  # pragma: no cover - diagnostic path
        fails.append(name)
        print(f"ERR  {name}: {e}", flush=True)

record = {
    "tag": "ulp_partition_sweep",
    "ts": int(time.time()),
    "sf": SF,
    "checked": len(names),
    "fails": fails,
    "elapsed_sec": round(time.time() - t0, 1),
}
with open(os.path.join(REPO, "SWEEPS.jsonl"), "a") as fh:
    fh.write(json.dumps(record) + "\n")
print(json.dumps(record))
spark.stop()
sys.exit(1 if fails else 0)
