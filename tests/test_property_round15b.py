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


@pytest.mark.parametrize("seed,censor_frac", [(21, 0.3), (22, 0.6), (23, 1.0)])
def test_survival_family_with_real_censoring(spark, tmp_path, seed,
                                             censor_frac):
    """Every user in the driver corpus purchases, so the CENSORING
    branch of the registered survival operators never executes on
    fixture data (the shared kaplan_meier_curve kernel is property-
    tested, but stat_logrank_test / survival_nelson_aalen carry their
    own labeled-frame construction). These seeds make 30%/60%/100% of
    users purchase-free and require the full operators to match
    sequential life-table replicas — including the all-censored seed
    where every statistic must go NULL/empty-tail rather than raise."""
    import datetime

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_logrank_test,
        survival_nelson_aalen,
    )

    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    n_users = 14
    for u in range(n_users):
        purchases = rng.random() >= censor_frac
        n_ev = rng.randrange(3, 12)
        for i in range(n_ev):
            if purchases and i == n_ev - 2:
                et = "purchase"
            else:
                et = rng.choice(["click", "view", "error"])
            rows.append(
                (
                    eid,
                    base + datetime.timedelta(
                        hours=u * 3 + i * rng.randrange(1, 30)
                    ),
                    u,
                    et,
                    round(rng.random() * 100, 2),
                    "{}",
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    out = f"{tmp_path}/events.parquet"
    df.coalesce(1).write.mode("overwrite").parquet(out)
    sf = str(tmp_path)

    # sequential conversion-clock frame
    per = {}
    for r in rows:
        _, ts, u, et, _, _ = r
        e = per.setdefault(u, {"t0": ts, "fp": None, "last": ts, "ec": 0})
        e["ec"] += 1
        if ts < e["t0"]:
            e["t0"] = ts
        if ts > e["last"]:
            e["last"] = ts
        if et == "purchase" and (e["fp"] is None or ts < e["fp"]):
            e["fp"] = ts
    subj = []
    nu = len(per)
    te = sum(e["ec"] for e in per.values())
    for e in per.values():
        end = e["fp"] if e["fp"] is not None else e["last"]
        us = int((end - e["t0"]).total_seconds() * 1_000_000)
        subj.append(
            (
                us // 3_600_000_000,
                1 if e["ec"] * nu >= te else 0,
                1 if e["fp"] is not None else 0,
            )
        )
    n_censored = sum(1 for _, _, d in subj if d == 0)
    assert censor_frac == 0 or n_censored > 0 or censor_frac < 0.4

    # Nelson-Aalen replica
    times = sorted({t for t, _, _ in subj})
    at_risk = len(subj)
    H = 0.0
    want_na = {}
    for t in times:
        d = sum(1 for tt, _, dd in subj if tt == t and dd == 1)
        c = sum(1 for tt, _, dd in subj if tt == t and dd == 0)
        if at_risk > 0:
            H += d / at_risk
            want_na[t] = (at_risk, d, round(H, 6))
        at_risk -= d + c
    got_na = {
        r["duration_hours"]: (
            r["n_at_risk"], r["n_deaths"], r["cum_hazard"]
        )
        for r in survival_nelson_aalen(spark, sf).collect()
    }
    assert set(got_na) == set(want_na)
    for t in want_na:
        assert got_na[t][0] == want_na[t][0]
        assert got_na[t][1] == want_na[t][1]
        assert abs(got_na[t][2] - want_na[t][2]) <= 1e-5

    # log-rank replica
    r1 = sum(1 for _, g, _ in subj if g == 1)
    r0 = len(subj) - r1
    O1 = E1 = V = 0.0
    rr1, rr0 = r1, r0
    for t in times:
        d1 = sum(1 for tt, g, d in subj if tt == t and g == 1 and d == 1)
        c1 = sum(1 for tt, g, d in subj if tt == t and g == 1 and d == 0)
        d0 = sum(1 for tt, g, d in subj if tt == t and g == 0 and d == 1)
        c0 = sum(1 for tt, g, d in subj if tt == t and g == 0 and d == 0)
        d, n = d1 + d0, rr1 + rr0
        if d > 0 and rr1 > 0 and rr0 > 0:
            O1 += d1
            E1 += d * rr1 / n
            if n > 1:
                V += d * rr1 * rr0 * (n - d) / (n * n * (n - 1))
        rr1 -= d1 + c1
        rr0 -= d0 + c0
    # Kaplan-Meier on the same frame (shared clock; zero-factor guard
    # must coexist with a censored tail)
    from recommendation_system_big_data_spark.operators.stats_tests import (
        ml_kaplan_meier,
    )

    at_risk = len(subj)
    km_s = 1.0
    want_km = {}
    zeroed = False
    for t in times:
        d = sum(1 for tt, _, dd in subj if tt == t and dd == 1)
        c = sum(1 for tt, _, dd in subj if tt == t and dd == 0)
        if at_risk > 0:
            if d >= at_risk:
                zeroed = True
            if zeroed:
                km_s = 0.0
            else:
                km_s *= 1.0 - d / at_risk
            want_km[t] = (at_risk, d, c, round(km_s, 6))
        at_risk -= d + c
    got_km = {
        r["duration_hours"]: (
            r["n_at_risk"], r["n_deaths"], r["n_censored"], r["survival"]
        )
        for r in ml_kaplan_meier(spark, sf).collect()
    }
    assert set(got_km) == set(want_km)
    for t in want_km:
        assert got_km[t][:3] == want_km[t][:3]
        assert abs(got_km[t][3] - want_km[t][3]) <= 1e-5

    got_lr = stat_logrank_test(spark, sf).collect()[0]
    assert got_lr["n_treat"] == r1 and got_lr["n_ctrl"] == r0
    assert got_lr["observed_treat"] == int(O1)
    assert abs(got_lr["expected_treat"] - round(E1, 6)) <= 1e-5
    if V > 0:
        assert abs(got_lr["chi2_stat"] - round((O1 - E1) ** 2 / V, 4)) <= 1e-3
    else:
        assert got_lr["chi2_stat"] is None
