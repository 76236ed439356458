"""Command-line entry point: run any registered query from a shell.

    python -m recommendation_system_big_data_spark --list
    python -m recommendation_system_big_data_spark q1_pricing_summary
    python -m recommendation_system_big_data_spark q5_local_supplier_volume \
        --sf-dir /root/testdata/sf0.1 --explain --limit 50

This is the human-facing twin of the driver contract in
``__spark_entry__.py``: same registry, same (spark, sf_dir) calling
convention, plus plan inspection (--explain prints the formatted physical
plan — the ".explain and iterate" loop from SURVEY.md §4).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="python -m recommendation_system_big_data_spark",
        description="Run a registered query against a testdata scale-factor dir.",
    )
    parser.add_argument("query", nargs="?", help="registered query name")
    parser.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="testdata directory (default: $SPARK_GRAFT_SF_DIR or sf0.001)",
    )
    parser.add_argument("--list", action="store_true", help="list queries and exit")
    parser.add_argument("--explain", action="store_true", help="print the physical plan")
    parser.add_argument("--limit", type=int, default=20, help="rows to show (default 20)")
    args = parser.parse_args(argv)

    from recommendation_system_big_data_spark.registry import registry

    defs = registry()
    if args.list or not args.query:
        for name, q in defs.items():
            if "alias" in q.tags:
                continue
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:36s} [{kind}] {' '.join(q.tags)}")
        return 0
    if args.query not in defs:
        print(f"unknown query: {args.query!r} (see --list)", file=sys.stderr)
        return 2

    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from recommendation_system_big_data_spark.session import get_spark

    spark = get_spark(app_name=f"rsbd-cli-{args.query}")
    try:
        df = defs[args.query].fn(spark, args.sf_dir)
        if args.explain:
            from recommendation_system_big_data_spark.plans import explain

            print(explain.physical_plan(df))
        df.show(args.limit, truncate=40)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
