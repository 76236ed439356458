"""Reproduce driver hash mismatches at sf0.01.

Runs the named queries through Spark and DuckDB at sf0.01 and diffs the
value multisets exactly (no rounding), printing the first differing cells.
Usage: python tools/repro_mismatch.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from recommendation_system_big_data_spark.catalog import TABLES
from recommendation_system_big_data_spark.registry import registry
from recommendation_system_big_data_spark.session import get_spark

SF_DIR = os.environ.get("RSBD_TEST_SF_DIR", "/root/testdata/sf0.01")

DEFAULT = [
    "cogrouped_pandas_ratio",
    "pipeline_training_mix",
    "q12_priority_shipments",
    "sessionize_events",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "item"):
        return norm(v.item())
    return v


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="repro", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    defs = registry()
    for name in names:
        qd = defs[name]
        sdf = qd.fn(spark, SF_DIR)
        spark_cols = list(sdf.columns)
        srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        res = con.execute(qd.oracle)
        dcols = [d[0] for d in res.description]
        drows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        idx = [dcols.index(c) for c in spark_cols]
        drows = [tuple(r[i] for i in idx) for r in drows]
        ss, dd = sorted(srows, key=repr), sorted(drows, key=repr)
        mism = [(a, b) for a, b in zip(ss, dd) if a != b]
        print(f"=== {name}: rows {len(srows)}/{len(drows)}, mismatched rows: {len(mism)}")
        for a, b in mism[:5]:
            diffs = [
                (spark_cols[i], x, y)
                for i, (x, y) in enumerate(zip(a, b))
                if x != y
            ]
            print("  spark:", a)
            print("  duck :", b)
            print("  cell diffs:", diffs[:6])


if __name__ == "__main__":
    main()
