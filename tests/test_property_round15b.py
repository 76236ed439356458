"""Randomized differential property tests for the r15-B rank kernels.

The driver fixtures exercise ONE tie profile; these tests regenerate a
tie-HEAVY synthetic events table per seed (values drawn from a small
integer lattice so midrank blocks are large, plus a single-class seed
and an all-tied seed) and require the registered operators to match
independent sequential replicas cell-exactly. This is the
test_property_stats.py discipline applied to the session-B additions
whose exactness claims ride tie-block algebra: Cliff's delta,
Ansari-Bradley, and the Wilcoxon signed-rank / sign-test pair kernel.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest


def _write_events(spark, tmpdir, seed, n_users=12, n_rows=400,
                  single_class=False, all_tied=False):
    rng = random.Random(seed)
    rows = []
    lattice = [round(x * 0.25, 2) for x in range(0, 40)]
    base = __import__("datetime").datetime(2024, 1, 1)
    for i in range(n_rows):
        et = (
            "purchase"
            if single_class
            else rng.choice(["purchase", "click", "view", "error"])
        )
        v = 5.0 if all_tied else rng.choice(lattice)
        rows.append(
            (
                i,
                base + __import__("datetime").timedelta(seconds=i * 37),
                rng.randrange(n_users),
                et,
                v,
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    out = f"{tmpdir}/events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmpdir)


def _read_pairs(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    x = [r["value"] for r in rows if r["event_type"] == "purchase"]
    y = [r["value"] for r in rows if r["event_type"] != "purchase"]
    return x, y


@pytest.mark.parametrize(
    "seed,single_class,all_tied",
    [(1, False, False), (2, False, False), (3, True, False), (4, False, True)],
)
def test_cliffs_delta_random_tie_heavy(spark, tmp_path, seed, single_class,
                                       all_tied):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cliffs_delta,
    )

    sf = _write_events(spark, tmp_path, seed, single_class=single_class,
                       all_tied=all_tied)
    x, y = _read_pairs(spark, sf)
    got = stat_cliffs_delta(spark, sf).collect()[0]
    n, m = len(x), len(y)
    assert got["n_pos"] == n and got["n_neg"] == m
    if n == 0 or m == 0:
        assert got["delta_ppm"] is None
        assert got["magnitude"] == "undefined"
        return
    import bisect

    ys = sorted(y)
    gt = sum(bisect.bisect_left(ys, xi) for xi in x)
    lt = sum(len(ys) - bisect.bisect_right(ys, xi) for xi in x)
    d = gt - lt
    want = (1 if d >= 0 else -1) * (abs(d) * 1000000 // (n * m))
    assert got["delta_ppm"] == want


@pytest.mark.parametrize(
    "seed,single_class,all_tied",
    [(5, False, False), (6, False, False), (7, True, False), (8, False, True)],
)
def test_ansari_bradley_random_tie_heavy(spark, tmp_path, seed, single_class,
                                         all_tied):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_ansari_bradley,
    )

    sf = _write_events(spark, tmp_path, seed, single_class=single_class,
                       all_tied=all_tied)
    x, y = _read_pairs(spark, sf)
    n, m = len(x), len(y)
    got = stat_ansari_bradley(spark, sf).collect()[0]
    assert got["n_pos"] == n and got["n_neg"] == m
    if n == 0 or m == 0:
        assert got["z_stat"] is None
        return
    pooled = x + y
    N = n + m
    order = sorted(range(N), key=lambda i: pooled[i])
    ranks = [0.0] * N
    i = 0
    while i < N:
        j = i
        while j + 1 < N and pooled[order[j + 1]] == pooled[order[i]]:
            j += 1
        mid = (i + j + 2) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    scores = [min(r, N + 1 - r) for r in ranks]
    AB2 = int(round(sum(2 * s for s in scores[:n])))
    assert got["ab_stat_x2"] == AB2
    S1 = sum(scores)
    S2 = sum(s * s for s in scores)
    V = n * m * (N * S2 - S1 * S1) / (N * N * (N - 1.0))
    if V <= 0:
        assert got["z_stat"] is None
        return
    z = (sum(scores[:n]) - n * S1 / N) / math.sqrt(V)
    assert abs(got["z_stat"] - round(z, 6)) <= 1e-5


@pytest.mark.parametrize("seed", [9, 10, 11])
def test_wilcoxon_and_sign_random_tie_heavy(spark, tmp_path, seed):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_sign_test,
        stat_wilcoxon_signed_rank,
    )

    sf = _write_events(spark, tmp_path, seed)
    rows = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id", "event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        e = per[r["user_id"]]
        if r["event_type"] == "click":
            e[0] += math.floor(r["value"] * 1000000)
            e[1] += 1
        if r["event_type"] == "view":
            e[2] += math.floor(r["value"] * 1000000)
            e[3] += 1
    ds = []
    for s_c, n_c, s_v, n_v in per.values():
        if n_c > 0 and n_v > 0:
            a = s_c // n_c if s_c >= 0 else -((-s_c) // n_c)
            b = s_v // n_v if s_v >= 0 else -((-s_v) // n_v)
            ds.append(a - b)
    nz = [d for d in ds if d != 0]
    m = len(nz)

    got_w = stat_wilcoxon_signed_rank(spark, sf).collect()[0]
    assert got_w["n_nonzero_pairs"] == m
    if m >= 1:
        c = Counter(abs(d) for d in nz)
        mid = {}
        cb = 0
        for v in sorted(c):
            t = c[v]
            mid[v] = cb + (t + 1) / 2
            cb += t
        Wp = sum(mid[abs(d)] for d in nz if d > 0)
        assert got_w["w_plus_x2"] == int(round(Wp * 2))
        tcorr = sum(t * (t * t - 1) for t in c.values())
        V = m * (m + 1) * (2 * m + 1) / 24 - tcorr / 48
        if V > 0:
            z = (Wp - m * (m + 1) / 4) / math.sqrt(V)
            assert abs(got_w["z_stat"] - round(z, 6)) <= 1e-5

    got_s = stat_sign_test(spark, sf).collect()[0]
    sp = sum(1 for d in nz if d > 0)
    assert got_s["n_nonzero_pairs"] == m and got_s["n_positive"] == sp
    if m >= 1:
        z = (
            (1 if 2 * sp >= m else -1)
            * max(abs(2 * sp - m) - 1, 0)
            / math.sqrt(m)
        )
        assert abs(got_s["z_stat"] - round(z, 6)) <= 1e-6
