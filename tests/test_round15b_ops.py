"""Round-15 session-B operators: sequential-Python differential replicas.

Same contract as tests/test_round15_ops.py — each test recomputes the
statistic from the RAW fixture rows with an independent pure-Python
implementation (exact ints where the operator is exact; the published
float formulas where it exits through ROUND) and requires agreement with
the Spark result, proving the shared engine expression is the TEXTBOOK
formula and not merely self-consistent across engines.
"""

from __future__ import annotations

import math
from collections import defaultdict


def _values_by_class(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    x = [r["value"] for r in rows if r["event_type"] == "purchase"]
    y = [r["value"] for r in rows if r["event_type"] != "purchase"]
    return x, y


def _midranks(pooled):
    order = sorted(range(len(pooled)), key=lambda i: pooled[i])
    ranks = [0.0] * len(pooled)
    i = 0
    while i < len(pooled):
        j = i
        while j + 1 < len(pooled) and (
            pooled[order[j + 1]] == pooled[order[i]]
        ):
            j += 1
        mid = (i + j + 2) / 2.0
        for k in range(i, j + 1):
            ranks[order[k]] = mid
        i = j + 1
    return ranks


def test_cliffs_delta_matches_bruteforce(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cliffs_delta,
    )

    x, y = _values_by_class(spark, sf_dir)
    ys = sorted(y)
    import bisect

    gt = sum(bisect.bisect_left(ys, xi) for xi in x)
    lt = sum(len(ys) - bisect.bisect_right(ys, xi) for xi in x)
    n, m = len(x), len(y)
    d = gt - lt
    want_ppm = (1 if d >= 0 else -1) * (abs(d) * 1000000 // (n * m))
    a = abs(d) * 1000000 // (n * m)
    want_mag = (
        "negligible"
        if a < 147000
        else "small" if a < 330000 else "medium" if a < 474000 else "large"
    )
    got = stat_cliffs_delta(spark, sf_dir).collect()[0]
    assert got["n_pos"] == n and got["n_neg"] == m
    assert got["delta_ppm"] == want_ppm
    assert got["magnitude"] == want_mag


def test_dagostino_k2_matches_textbook(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_dagostino_k2,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    got = {r["event_type"]: r for r in stat_dagostino_k2(spark, sf_dir).collect()}
    for g, vs in groups.items():
        n = len(vs)
        if n <= 8:
            assert got[g]["k2_stat"] is None
            continue
        mean = sum(vs) / n
        m2 = sum((v - mean) ** 2 for v in vs) / n
        if m2 == 0:
            assert got[g]["k2_stat"] is None
            continue
        m3 = sum((v - mean) ** 3 for v in vs) / n
        m4 = sum((v - mean) ** 4 for v in vs) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3.0
        Y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
        b2 = (
            3.0
            * (n * n + 27.0 * n - 70.0)
            * (n + 1)
            * (n + 3)
            / ((n - 2.0) * (n + 5) * (n + 7) * (n + 9))
        )
        W2 = -1.0 + math.sqrt(2.0 * (b2 - 1.0))
        delta = 1.0 / math.sqrt(0.5 * math.log(W2))
        alpha = math.sqrt(2.0 / (W2 - 1.0))
        Z1 = delta * math.log(Y / alpha + math.sqrt((Y / alpha) ** 2 + 1.0))
        E = 3.0 * (n - 1) / (n + 1)
        V = (
            24.0
            * n
            * (n - 2)
            * (n - 3)
            / ((n + 1.0) ** 2 * (n + 3) * (n + 5))
        )
        xk = ((g2 + 3.0) - E) / math.sqrt(V)
        sb1 = (
            6.0
            * (n * n - 5.0 * n + 2.0)
            / ((n + 7.0) * (n + 9.0))
            * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2.0) * (n - 3)))
        )
        A = 6.0 + 8.0 / sb1 * (2.0 / sb1 + math.sqrt(1.0 + 4.0 / sb1**2))
        inner = (1.0 - 2.0 / A) / (1.0 + xk * math.sqrt(2.0 / (A - 4.0)))
        Z2 = ((1.0 - 2.0 / (9.0 * A)) - math.copysign(1, inner) * abs(
            inner
        ) ** (1.0 / 3.0)) / math.sqrt(2.0 / (9.0 * A))
        k2 = Z1 * Z1 + Z2 * Z2
        # the float fold order differs (Python sum vs Spark partials), so
        # compare at a tolerance strictly tighter than any decision point
        assert abs(got[g]["z_skew"] - round(Z1, 4)) <= 2e-4
        assert abs(got[g]["z_kurt"] - round(Z2, 4)) <= 2e-4
        assert abs(got[g]["k2_stat"] - round(k2, 4)) <= 4e-3
        assert got[g]["reject_5pct"] == (1 if round(k2, 4) > 5.9915 else 0)


def test_ansari_bradley_matches_bruteforce(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_ansari_bradley,
    )

    x, y = _values_by_class(spark, sf_dir)
    n, m = len(x), len(y)
    pooled = x + y
    N = n + m
    ranks = _midranks(pooled)
    scores = [min(r, N + 1 - r) for r in ranks]
    AB2 = int(round(sum(2 * s for s in scores[:n])))
    S1 = sum(scores)
    S2 = sum(s * s for s in scores)
    E = n * S1 / N
    V = n * m * (N * S2 - S1 * S1) / (N * N * (N - 1.0))
    got = stat_ansari_bradley(spark, sf_dir).collect()[0]
    assert got["n_pos"] == n and got["n_neg"] == m
    assert got["ab_stat_x2"] == AB2
    if V > 0:
        z = (sum(scores[:n]) - E) / math.sqrt(V)
        assert abs(got["z_stat"] - round(z, 6)) <= 1e-5
        assert got["reject_5pct"] == (1 if abs(round(z, 6)) > 1.959964 else 0)
