"""Property tests for the range/interval kernels (operators/ranges.py):
the bucketed point-in-interval join must equal the naive cross-join
filter, and the distributed concurrency sweep must equal a brute-force
Python sweep — over randomized inputs that hit bucket boundaries, empty
overlaps, duplicate timestamps, and touching intervals."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from recommendation_system_big_data_spark.operators.ranges import (
    interval_peak_concurrency,
    point_in_interval_join,
)


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def test_bucketed_range_join_equals_naive(spark):
    rng = random.Random(42)
    for band, bucket_width in ((1, 1), (3, 4), (7, 7), (10, 25)):
        points = [(i, rng.randrange(0, 200)) for i in range(300)]
        intervals = [(j, rng.randrange(-10, 200)) for j in range(80)]
        p = spark.createDataFrame(points, "pid long, p long")
        iv = spark.createDataFrame(intervals, "iid long, s long")
        got = _pairs(
            point_in_interval_join(p, iv, "p", "s", band, bucket_width)
        )
        want = sorted(
            (pid, iid)
            for pid, pv in points
            for iid, sv in intervals
            if sv <= pv < sv + band
        )
        assert got == want, (band, bucket_width, len(got), len(want))


def test_bucketed_range_join_rejects_narrow_buckets(spark):
    import pytest

    p = spark.createDataFrame([(1, 1)], "pid long, p long")
    iv = spark.createDataFrame([(1, 1)], "iid long, s long")
    with pytest.raises(ValueError):
        point_in_interval_join(p, iv, "p", "s", band=5, bucket_width=4)


def test_bucketed_range_join_negative_domain(spark):
    # floor-division bucketing must stay consistent below zero (floor, not
    # truncation): points and starts straddling 0 still pair correctly.
    points = [(i, v) for i, v in enumerate(range(-20, 21))]
    intervals = [(j, s) for j, s in enumerate(range(-22, 20, 3))]
    p = spark.createDataFrame(points, "pid long, p long")
    iv = spark.createDataFrame(intervals, "iid long, s long")
    got = _pairs(point_in_interval_join(p, iv, "p", "s", 3))
    want = sorted(
        (pid, iid)
        for pid, pv in points
        for iid, sv in intervals
        if sv <= pv < sv + 3
    )
    assert got == want


def _brute_peak(intervals):
    """Brute-force sweep: peak overlap of [s, e) and first time it occurs."""
    bounds = {}
    for s, e in intervals:
        bounds[s] = bounds.get(s, 0) + 1
        bounds[e] = bounds.get(e, 0) - 1
    cur = peak = 0
    peak_at = None
    for us in sorted(bounds):
        cur += bounds[us]
        if cur > peak:
            peak, peak_at = cur, us
    return peak, peak_at


def test_peak_concurrency_equals_bruteforce(spark):
    rng = random.Random(7)
    for trial in range(5):
        ivs = []
        for _ in range(rng.randrange(5, 120)):
            s = rng.randrange(0, 500)
            ivs.append((s, s + rng.randrange(1, 60)))
        # touching intervals: one ends exactly where another starts
        ivs.append((600, 650))
        ivs.append((650, 700))
        df = spark.createDataFrame(ivs, "s_us long, e_us long")
        row = interval_peak_concurrency(df).collect()[0]
        peak, peak_at = _brute_peak(ivs)
        assert row["peak_concurrency"] == peak, (trial, row, peak)
        assert row["peak_at_us"] == peak_at, (trial, row, peak_at)


def test_peak_concurrency_touching_intervals_do_not_overlap(spark):
    # [0, 10) and [10, 20): ends apply before starts at the same instant,
    # so the peak must be 1.
    df = spark.createDataFrame([(0, 10), (10, 20)], "s_us long, e_us long")
    row = interval_peak_concurrency(df).collect()[0]
    assert row["peak_concurrency"] == 1


def test_interval_union_matches_bruteforce_merge(spark):
    """interval_union_per_key (relational running-max sweep) must agree
    exactly with a sequential interval merge on randomized inputs —
    overlapping, nested, touching, and duplicate intervals included."""
    from recommendation_system_big_data_spark.operators.ranges import (
        interval_union_per_key,
    )

    rng = random.Random(20260814)
    for trial in range(8):
        rows = []
        for i in range(rng.randrange(4, 60)):
            k = rng.randrange(0, 4)
            s0 = rng.randrange(0, 500)
            rows.append((k, s0, s0 + rng.randrange(1, 120), i))
        # touching intervals: end == next start must merge ([s, e) union)
        rows.append((0, 600, 650, 9000))
        rows.append((0, 650, 700, 9001))
        # exact duplicate interval
        rows.append((1, 100, 150, 9002))
        rows.append((1, 100, 150, 9003))
        df = spark.createDataFrame(
            rows, "user_id int, s long, e long, event_id int"
        )
        got = {
            r["user_id"]: (r["n_islands"], r["coverage_units"])
            for r in interval_union_per_key(df).collect()
        }

        expected = {}
        by_key = {}
        for k, s0, e0, _ in rows:
            by_key.setdefault(k, []).append((s0, e0))
        for k, spans in by_key.items():
            spans.sort()
            merged = []
            for s0, e0 in spans:
                if merged and s0 <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e0))
                else:
                    merged.append((s0, e0))
            expected[k] = (len(merged), sum(e0 - s0 for s0, e0 in merged))
        assert got == expected, (trial, got, expected)


def test_running_sums_matches_sequential_reference(spark):
    """ranges.running_sums must equal a sequential prefix sum for both
    inclusive and exclusive modes, across partition counts that force
    the order grid to span many range partitions (the decomposition
    must be invisible in the values)."""
    import random

    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    rng = random.Random(19)
    for trial, n_parts in ((0, 1), (1, 4), (2, 16), (3, 64)):
        keys = rng.sample(range(10_000), 300)
        rows = [(k, rng.randint(-5, 50)) for k in keys]
        df = spark.createDataFrame(rows, "k long, v long")
        got = {
            r["k"]: (r["inc"], r["exc"])
            for r in running_sums(
                df, ["k"], {"inc": ("v", True), "exc": ("v", False)}, n_parts
            ).collect()
        }
        acc = 0
        expected = {}
        for k, v in sorted(rows):
            expected[k] = (acc + v, acc)
            acc += v
        assert got == expected, (trial, n_parts)


def test_ntile_distributed_matches_builtin(spark):
    """ntile_distributed must be hash-identical to F.ntile over the same
    tie-broken order, across n/k shapes that hit every remainder case
    (n % k == 0, n % k > 0, n < k) and partition counts."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from recommendation_system_big_data_spark.operators.ranges import (
        ntile_distributed,
    )

    rng = random.Random(31)
    for n, k, n_parts in ((40, 4, 1), (41, 4, 8), (7, 10, 16), (100, 7, 64)):
        keys = rng.sample(range(100_000), n)
        df = spark.createDataFrame([(x,) for x in keys], "x long")
        got = {
            r["x"]: r["b"]
            for r in ntile_distributed(df, ["x"], k, "b", n_parts).collect()
        }
        want = {
            r["x"]: r["b"]
            for r in df.select(
                "x", F.ntile(k).over(Window.orderBy("x")).alias("b")
            ).collect()
        }
        assert got == want, (n, k, n_parts)


def test_running_sums_grouped_matches_sequential_reference(spark):
    """Grouped mode: each group's running sum restarts and matches a
    per-group sequential reference, with groups interleaved across the
    range partitions."""
    import random

    from recommendation_system_big_data_spark.operators.ranges import (
        running_sums,
    )

    rng = random.Random(47)
    rows = []
    for g in ("a", "b", "c"):
        for k in rng.sample(range(5000), 200):
            rows.append((g, k, rng.randint(1, 9)))
    df = spark.createDataFrame(rows, "g string, k long, v long")
    for n_parts in (1, 8, 32):
        got = {
            (r["g"], r["k"]): (r["inc"], r["exc"])
            for r in running_sums(
                df,
                ["k"],
                {"inc": ("v", True), "exc": ("v", False)},
                n_parts,
                group_cols=("g",),
            ).collect()
        }
        expected = {}
        for g in ("a", "b", "c"):
            acc = 0
            for gg, k, v in sorted(r for r in rows if r[0] == g):
                expected[(g, k)] = (acc + v, acc)
                acc += v
        assert got == expected, n_parts
