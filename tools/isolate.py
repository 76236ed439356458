#!/usr/bin/env python
"""Isolated steady-state timing for one or more registry queries.

Usage: python tools/isolate.py <query> [<query> ...] [--runs N] [--sf DIR]

Fresh session per invocation; per query: one untimed warm run (codegen JIT,
parquet footers, session-scoped model/index fits), then N timed noop-sink
runs — prints each run plus the warm-min, the same steady-state statistic
bench.py records. Jobs are labeled so the timeline is attributable
(guide §1.5). This is the r10 bisect protocol's harness, committed so the
isolated numbers in BASELINE.md are reproducible.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recommendation_system_big_data_spark.registry import registry  # noqa: E402
from recommendation_system_big_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    spark = get_spark(app_name="rsbd-isolate")
    spark.range(1000).selectExpr("sum(id)").collect()
    defs = registry()
    for name in args:
        fn = defs[name].fn
        spark.sparkContext.setJobDescription(f"warm: {name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: cold={cold:.3f} runs="
            + ",".join(f"{t:.3f}" for t in times)
            + f" warm_min={min(times):.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
