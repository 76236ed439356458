"""Sink-side behavioral contracts beyond oracle parity: compaction must
actually reduce file counts, and the compacted layout must carry
non-overlapping key ranges per file (the property min/max pruning uses)."""

from __future__ import annotations

import glob
import os

from recommendation_system_big_data_spark.sources.sinks import (
    _sink_dir,
    compaction_small_files,
)


def _parquet_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_compaction_reduces_file_count(spark, sf_dir):
    compaction_small_files(spark, sf_dir).count()
    frag = _sink_dir(sf_dir, "frag")
    compact = _sink_dir(sf_dir, "compact")
    n_frag, n_compact = len(_parquet_files(frag)), len(_parquet_files(compact))
    assert n_frag == 64, n_frag
    assert n_compact <= 4, n_compact


def test_compaction_files_have_disjoint_key_ranges(spark, sf_dir):
    compaction_small_files(spark, sf_dir).count()
    compact = _sink_dir(sf_dir, "compact")
    ranges = []
    for f in _parquet_files(compact):
        df = spark.read.parquet(f)
        row = df.selectExpr(
            "min(o_orderkey) AS lo", "max(o_orderkey) AS hi"
        ).collect()[0]
        ranges.append((row.lo, row.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next, ranges


def test_scan_binary_files_pins_content(spark, sf_dir):
    """⊘ gate: binaryFile ingestion must surface exactly the pinned
    fixture files with correct lengths and content hashes."""
    import hashlib

    from recommendation_system_big_data_spark.sources.sinks import (
        _BINARY_FIXTURES,
        scan_binary_files,
    )

    rows = scan_binary_files(spark, sf_dir).collect()
    got = {r["file_name"]: (r["length"], r["sha256"]) for r in rows}
    want = {
        name: (len(content), hashlib.sha256(content).hexdigest())
        for name, content in _BINARY_FIXTURES.items()
    }
    assert got == want
