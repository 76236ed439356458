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
from collections import Counter, defaultdict


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


def _conversion_frame(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    per = {}
    for r in rows:
        u = r["user_id"]
        e = per.setdefault(u, {"t0": r["ts"], "fp": None, "last": r["ts"]})
        if r["ts"] < e["t0"]:
            e["t0"] = r["ts"]
        if r["ts"] > e["last"]:
            e["last"] = r["ts"]
        if r["event_type"] == "purchase" and (
            e["fp"] is None or r["ts"] < e["fp"]
        ):
            e["fp"] = r["ts"]
    out = []
    for e in per.values():
        end = e["fp"] if e["fp"] is not None else e["last"]
        us = int((end - e["t0"]).total_seconds() * 1_000_000)
        out.append((us // 3_600_000_000, 1 if e["fp"] is not None else 0))
    return out


def test_logrank_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_logrank_test,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    per = {}
    for r in rows:
        u = r["user_id"]
        e = per.setdefault(
            u, {"t0": r["ts"], "fp": None, "last": r["ts"], "ec": 0}
        )
        e["ec"] += 1
        if r["ts"] < e["t0"]:
            e["t0"] = r["ts"]
        if r["ts"] > e["last"]:
            e["last"] = r["ts"]
        if r["event_type"] == "purchase" and (
            e["fp"] is None or r["ts"] < e["fp"]
        ):
            e["fp"] = r["ts"]
    nu = len(per)
    te = sum(e["ec"] for e in per.values())
    subj = []
    for e in per.values():
        end = e["fp"] if e["fp"] is not None else e["last"]
        us = int((end - e["t0"]).total_seconds() * 1_000_000)
        t = us // 3_600_000_000
        subj.append(
            (t, 1 if e["ec"] * nu >= te else 0, 1 if e["fp"] else 0)
        )
    r1 = sum(1 for _, g, _ in subj if g == 1)
    r0 = len(subj) - r1
    n1t, n0t = r1, r0
    O1 = E1 = V = 0.0
    for t in sorted({t for t, _, _ in subj}):
        d1 = sum(1 for tt, g, d in subj if tt == t and g == 1 and d == 1)
        c1 = sum(1 for tt, g, d in subj if tt == t and g == 1 and d == 0)
        d0 = sum(1 for tt, g, d in subj if tt == t and g == 0 and d == 1)
        c0 = sum(1 for tt, g, d in subj if tt == t and g == 0 and d == 0)
        d, n = d1 + d0, r1 + r0
        if d > 0 and r1 > 0 and r0 > 0:
            O1 += d1
            E1 += d * r1 / n
            if n > 1:
                V += d * r1 * r0 * (n - d) / (n * n * (n - 1))
        r1 -= d1 + c1
        r0 -= d0 + c0
    got = stat_logrank_test(spark, sf_dir).collect()[0]
    assert got["n_treat"] == n1t and got["n_ctrl"] == n0t
    assert got["observed_treat"] == int(O1)
    assert abs(got["expected_treat"] - round(E1, 6)) <= 1e-5
    if V > 0:
        chi2 = (O1 - E1) ** 2 / V
        assert abs(got["chi2_stat"] - round(chi2, 4)) <= 1e-3
    else:
        assert got["chi2_stat"] is None


def test_nelson_aalen_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        survival_nelson_aalen,
    )

    subj = _conversion_frame(spark, sf_dir)
    times = sorted({t for t, _ in subj})
    n_at_risk = len(subj)
    H = VH = 0.0
    want = {}
    for t in times:
        d = sum(1 for tt, died in subj if tt == t and died == 1)
        c = sum(1 for tt, died in subj if tt == t and died == 0)
        if n_at_risk > 0:
            H += d / n_at_risk
            VH += d * (n_at_risk - d) / n_at_risk**3
            want[t] = (n_at_risk, d, round(H, 6), round(VH, 6))
        n_at_risk -= d + c
    got = {
        r["duration_hours"]: (
            r["n_at_risk"],
            r["n_deaths"],
            r["cum_hazard"],
            r["var_hazard"],
        )
        for r in survival_nelson_aalen(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == want[t][0] and got[t][1] == want[t][1]
        assert abs(got[t][2] - want[t][2]) <= 1e-5
        assert abs(got[t][3] - want[t][3]) <= 1e-5


def test_mantel_haenszel_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_mantel_haenszel,
    )

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderpriority", "o_orderstatus")
        .collect()
    )
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_mktsegment")
        .collect()
    }
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for r in orders:
        if r["o_custkey"] not in seg:
            continue
        s = seg[r["o_custkey"]]
        e = 1 if r["o_orderpriority"] in ("1-URGENT", "2-HIGH") else 0
        b = 1 if r["o_orderstatus"] == "F" else 0
        cells[s][0 if e and b else 1 if e else 2 if b else 3] += 1
    sa = se = sv = sr = ss = 0.0
    for a, b, c, d in cells.values():
        N = a + b + c + d
        if N <= 1:
            continue
        sa += a
        se += (a + b) * (a + c) / N
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (N**2 * (N - 1))
        sr += a * d / N
        ss += b * c / N
    got = stat_mantel_haenszel(spark, sf_dir).collect()[0]
    assert got["n_strata"] == len(cells)
    assert got["exposed_bad"] == int(sa)
    if sv > 0:
        chi2 = max(abs(sa - se) - 0.5, 0.0) ** 2 / sv
        assert abs(got["cmh_chi2"] - round(chi2, 4)) <= 1e-3
    if ss > 0:
        assert abs(got["or_mh"] - round(sr / ss, 6)) <= 1e-5


def test_cochran_q_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cochran_q,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type")
        .collect()
    )
    cnt = Counter((r["user_id"], r["event_type"]) for r in rows)
    nu = len({u for u, _ in cnt})
    tp = Counter()
    for (u, t), c in cnt.items():
        tp[t] += c
    k = len(tp)
    R = Counter()
    C = Counter()
    for (u, t), c in cnt.items():
        if c * nu >= tp[t]:
            R[u] += 1
            C[t] += 1
    T = sum(R.values())
    sr2 = sum(r * r for r in R.values())
    sc2 = sum(c * c for c in C.values())
    den = k * T - sr2
    got = stat_cochran_q(spark, sf_dir).collect()[0]
    assert got["n_users"] == nu and got["k_types"] == k
    if k >= 2 and den != 0:
        q = (k - 1) * (k * sc2 - T * T) / den
        assert abs(got["q_stat"] - round(q, 4)) <= 1e-3
    else:
        assert got["q_stat"] is None


def _daily_rev(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    agg = defaultdict(Decimal)
    for r in rows:
        agg[r["o_orderdate"]] += Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    return [float(agg[d]) for d in sorted(agg)]


def test_pacf_yule_walker_matches_linear_solve(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_pacf_yule_walker,
    )

    import numpy as np

    x = np.array(_daily_rev(spark, sf_dir))
    got = {r["lag_k"]: r for r in ts_pacf_yule_walker(spark, sf_dir).collect()}
    n = len(x)
    mu = x.mean()
    ss = ((x - mu) ** 2).sum()
    if ss == 0:
        assert not got
        return
    r = [1.0] + [
        float(((x[k:] - mu) * (x[:-k] - mu)).sum() / ss) for k in (1, 2, 3)
    ]
    for k in (1, 2, 3):
        T = np.array([[r[abs(i - j)] for j in range(k)] for i in range(k)])
        det = np.linalg.det(T)
        assert got[k]["n_days"] == n
        if abs(det) < 1e-12:
            assert got[k]["pacf"] is None
            continue
        phi = np.linalg.solve(T, np.array(r[1 : k + 1]))
        assert got[k]["pacf"] is not None
        assert abs(got[k]["pacf"] - round(float(phi[-1]), 6)) <= 1e-5


def test_variance_ratio_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_variance_ratio_test,
    )

    import numpy as np

    x = np.array(_daily_rev(spark, sf_dir))
    lx = np.log(x[x > 0])
    got = {r["q"]: r for r in ts_variance_ratio_test(spark, sf_dir).collect()}
    r1 = np.diff(lx)
    T = len(r1)
    if T < 2:
        for q in got:
            assert got[q]["variance_ratio"] is None or got[q]["z_stat"] is None
        return
    mu = r1.mean()
    s1 = ((r1 - mu) ** 2).sum() / (T - 1)
    for q in (2, 4):
        if len(lx) <= q or s1 <= 0 or 1 - q / T <= 0:
            assert got[q]["variance_ratio"] is None
            continue
        rq = lx[q:] - lx[:-q]
        nq = len(rq)
        sq = ((rq - q * mu) ** 2).sum() / (q * nq * (1 - q / T))
        vr = sq / s1
        z = (vr - 1) / math.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q * T))
        assert abs(got[q]["variance_ratio"] - round(vr, 6)) <= 1e-5
        assert abs(got[q]["z_stat"] - round(z, 4)) <= 1e-3


def test_tukey_hsd_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_tukey_hsd,
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
    stats = {
        g: (len(v), sum(v) / len(v)) for g, v in groups.items()
    }
    ssw = sum(
        sum((x - stats[g][1]) ** 2 for x in v) for g, v in groups.items()
    )
    k = len(groups)
    n_tot = sum(n for n, _ in stats.values())
    mse = ssw / (n_tot - k) if n_tot > k else None
    crit = {2: 2.7718, 3: 3.3145, 4: 3.6332, 5: 3.8577, 6: 4.0301}.get(
        k, 4.4745 if k > 9 else None
    )
    got = {
        (r["group_a"], r["group_b"]): r
        for r in stat_tukey_hsd(spark, sf_dir).collect()
    }
    names = sorted(groups)
    assert len(got) == k * (k - 1) // 2
    for i in range(k):
        for j in range(i + 1, k):
            a, b = names[i], names[j]
            row = got[(a, b)]
            na, ma = stats[a]
            nb, mb = stats[b]
            assert abs(row["mean_diff"] - round(ma - mb, 6)) <= 2e-6
            if mse is None or mse <= 0 or na < 2 or nb < 2:
                assert row["q_stat"] is None
                continue
            q = abs(ma - mb) / math.sqrt((mse / 2) * (1 / na + 1 / nb))
            assert abs(row["q_stat"] - round(q, 4)) <= 1e-3
            if crit is not None:
                assert row["reject_5pct"] == (1 if round(q, 4) > crit else 0)


def test_durbin_watson_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_durbin_watson,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    agg = defaultdict(Decimal)
    for r in rows:
        agg[r["o_orderdate"]] += Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    days = sorted(agg)
    d0 = days[0]
    pts = [
        (
            int((d - d0).total_seconds() * 1_000_000) // 86_400_000_000,
            float(agg[d]),
        )
        for d in days
    ]
    n = len(pts)
    got = ts_durbin_watson(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    if n < 3:
        assert got["dw_stat"] is None
        return
    mx = sum(t for t, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxy = sum(t * y for t, y in pts) - n * mx * my
    sxx = sum(t * t for t, _ in pts) - n * mx * mx
    slope = sxy / sxx if sxx > 0 else 0.0
    e = [y - (my + slope * (t - mx)) for t, y in pts]
    sse = sum(x * x for x in e)
    sdiff = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    if sse <= 0:
        assert got["dw_stat"] is None
        return
    dw = sdiff / sse
    assert abs(got["dw_stat"] - round(dw, 4)) <= 1e-3
    want_v = (
        "positive_autocorr"
        if round(dw, 4) < 1.5
        else "negative_autocorr" if round(dw, 4) > 2.5 else "none"
    )
    assert got["verdict"] == want_v


def test_fligner_killeen_matches_exact_invcdf(spark, sf_dir):
    """The engine uses Acklam's PHI^-1 approximation; the replica uses
    statistics.NormalDist().inv_cdf (exact) — agreement at the ROUND(4)
    exit proves the approximation error is immaterial AND the rank/
    median/fold plumbing is the textbook FK statistic."""
    from statistics import NormalDist

    from recommendation_system_big_data_spark.operators.stats_tests import (
        ANOVA_QUANT,
        stat_fligner_killeen,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .where("value IS NOT NULL")
        .collect()
    )
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(
            math.floor(r["value"] * ANOVA_QUANT)
        )
    got = stat_fligner_killeen(spark, sf_dir).collect()[0]
    k = len(groups)
    N = sum(len(v) for v in groups.values())
    assert got["k_groups"] == k and got["n_total"] == N
    devs = []
    for g, vs in groups.items():
        cnt = Counter(vs)
        cum = 0
        med = None
        for v in sorted(cnt):
            cum += cnt[v]
            if 2 * cum >= len(vs):
                med = v
                break
        devs += [(g, abs(v - med)) for v in vs]
    c = Counter(d for _, d in devs)
    mid = {}
    cb = 0
    for v in sorted(c):
        t = c[v]
        mid[v] = cb + (t + 1) / 2
        cb += t
    nd = NormalDist()
    score = {v: nd.inv_cdf(0.5 + mid[v] / (2 * (N + 1))) for v in mid}
    S = Counter()
    n_g = Counter()
    Q = tot = 0.0
    for g, d in devs:
        s = score[d]
        S[g] += s
        n_g[g] += 1
        Q += s * s
        tot += s
    if k < 2 or N < 2:
        assert got["fk_chi2"] is None
        return
    abar = tot / N
    s2 = (Q - N * abar * abar) / (N - 1)
    if s2 <= 0:
        assert got["fk_chi2"] is None
        return
    X2 = (sum(S[g] ** 2 / n_g[g] for g in S) - N * abar * abar) / s2
    assert abs(got["fk_chi2"] - round(X2, 4)) <= 1e-3


def test_lm_perplexity_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.functions.text import (
        text_lm_perplexity,
    )

    import re as _re

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    pairs = []
    for r in docs:
        t = (r["text"] or "").strip()
        if not t:
            continue
        tk = _re.split(r"\s+", t)
        for i in range(len(tk) - 1):
            pairs.append((r["doc_id"], r["source"], tk[i], tk[i + 1]))
    vocab = {w for _, _, w1, w2 in pairs for w in (w1, w2)}
    V = len(vocab)
    big = Counter((w1, w2) for _, _, w1, w2 in pairs)
    ctx = Counter()
    for (w1, _), c in big.items():
        ctx[w1] += c
    k = 0.5
    lps = defaultdict(list)
    for d, s, w1, w2 in pairs:
        lps[(d, s)].append(
            math.log((big[(w1, w2)] + k) / (ctx[w1] + k * V))
        )
    bysrc = defaultdict(list)
    for (d, s), v in lps.items():
        bysrc[s].append(math.exp(-sum(v) / len(v)))
    got = {r["source"]: r for r in text_lm_perplexity(spark, sf_dir).collect()}
    assert set(got) == set(bysrc)
    for s, ppls in bysrc.items():
        assert got[s]["n_docs"] == len(ppls)
        assert abs(got[s]["avg_ppl"] - round(sum(ppls) / len(ppls), 4)) <= 1e-2
        assert abs(got[s]["min_ppl"] - round(min(ppls), 4)) <= 1e-2
        assert abs(got[s]["max_ppl"] - round(max(ppls), 4)) <= 1e-2


def test_logistic_irls_matches_numpy(spark, sf_dir):
    import numpy as np

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _IRLS_ITERS,
        ml_logistic_irls,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "value")
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0.0, 0])
    for r in rows:
        e = per[r["user_id"]]
        e[0] += 1
        if r["event_type"] == "purchase":
            e[1] += 1
        if r["value"] is not None:
            e[2] += r["value"]
        if r["event_type"] == "error":
            e[3] = 1
    X = []
    y = []
    for ne, npur, sv, has_err in per.values():
        X.append([1.0, math.log(1.0 + ne), npur / ne, (sv / ne) / 100.0])
        y.append(float(has_err))
    X = np.array(X)
    y = np.array(y)
    beta = np.zeros(4)
    for _ in range(_IRLS_ITERS):
        z = np.clip(X @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-z))
        w = np.maximum(mu * (1 - mu), 1e-10)
        eta = z + (y - mu) / w
        A = X.T @ (X * w[:, None])
        b = X.T @ (w * eta)
        beta = np.linalg.solve(A, b)
    got = {r["term"]: r for r in ml_logistic_irls(spark, sf_dir).collect()}
    assert got["intercept"]["n_users"] == len(per)
    terms = ["intercept", "log1p_events", "purchase_ratio", "avg_value_h"]
    for i, t in enumerate(terms):
        assert abs(got[t]["coef"] - beta[i]) <= 1e-4, (t, got[t]["coef"], beta[i])
    z = np.clip(X @ beta, -30, 30)
    mu = 1.0 / (1.0 + np.exp(-z))
    ll = -np.mean(
        y * np.log(np.maximum(mu, 1e-15))
        + (1 - y) * np.log(np.maximum(1 - mu, 1e-15))
    )
    assert abs(got["intercept"]["log_loss"] - ll) <= 1e-4


def _paired_micro_diffs(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
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
    return ds


def test_wilcoxon_signed_rank_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_wilcoxon_signed_rank,
    )

    nz = [d for d in _paired_micro_diffs(spark, sf_dir) if d != 0]
    m = len(nz)
    got = stat_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert got["n_nonzero_pairs"] == m
    if m < 1:
        assert got["z_stat"] is None
        return
    c = Counter(abs(d) for d in nz)
    mid = {}
    cb = 0
    for v in sorted(c):
        t = c[v]
        mid[v] = cb + (t + 1) / 2
        cb += t
    Wp = sum(mid[abs(d)] for d in nz if d > 0)
    tcorr = sum(t * (t * t - 1) for t in c.values())
    assert got["w_plus_x2"] == int(round(Wp * 2))
    V = m * (m + 1) * (2 * m + 1) / 24 - tcorr / 48
    if V <= 0:
        assert got["z_stat"] is None
        return
    z = (Wp - m * (m + 1) / 4) / math.sqrt(V)
    assert abs(got["z_stat"] - round(z, 6)) <= 1e-5


def test_sign_test_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_sign_test,
    )

    ds = _paired_micro_diffs(spark, sf_dir)
    nz = [d for d in ds if d != 0]
    m = len(nz)
    sp = sum(1 for d in nz if d > 0)
    got = stat_sign_test(spark, sf_dir).collect()[0]
    assert got["n_nonzero_pairs"] == m and got["n_positive"] == sp
    if m < 1:
        assert got["z_stat"] is None
        return
    z = (
        (1 if 2 * sp >= m else -1)
        * max(abs(2 * sp - m) - 1, 0)
        / math.sqrt(m)
    )
    assert abs(got["z_stat"] - round(z, 6)) <= 1e-6


def test_lilliefors_exponential_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_lilliefors_exponential,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        per[r["user_id"]].append((r["ts"], r["event_id"]))
    gaps = []
    for v in per.values():
        v.sort()
        for i in range(1, len(v)):
            us = int((v[i][0] - v[i - 1][0]).total_seconds() * 1_000_000)
            gaps.append(us // 1_000_000)
    got = stat_lilliefors_exponential(spark, sf_dir).collect()[0]
    n = len(gaps)
    assert got["n_gaps"] == n
    if n < 2:
        assert got["d_stat"] is None
        return
    xbar = sum(gaps) / n
    assert abs(got["mean_gap_sec"] - round(xbar, 4)) <= 1e-3
    if xbar <= 0:
        assert got["d_stat"] is None
        return
    c = Counter(gaps)
    cum = 0
    D = 0.0
    for v in sorted(c):
        f0 = 1 - math.exp(-v / xbar)
        lo = cum / n
        cum += c[v]
        D = max(D, cum / n - f0, f0 - lo)
    assert abs(got["d_stat"] - round(D, 6)) <= 1e-5
    assert got["reject_5pct"] == (
        1 if round(D, 6) > 1.06 / math.sqrt(n) else 0
    )


def test_ratio_metric_delta_ci_matches_sequential(spark, sf_dir):
    import hashlib

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_ratio_metric_delta_ci,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "value")
        .collect()
    )
    per = defaultdict(lambda: [0.0, 0])
    for r in rows:
        e = per[r["user_id"]]
        e[0] += r["value"] if r["value"] is not None else 0.0
        e[1] += 1
    arms = defaultdict(list)
    for u, (x, y) in per.items():
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        arms[arm].append((x, float(y)))
    got = {r["arm"]: r for r in stat_ratio_metric_delta_ci(spark, sf_dir).collect()}
    stats = {}
    for arm, pts in arms.items():
        n = len(pts)
        assert got[arm]["n_users"] == n
        if n < 2:
            assert got[arm]["ratio_value_per_event"] is None
            stats[arm] = None
            continue
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        vx = sum((x - mx) ** 2 for x, _ in pts) / (n - 1)
        vy = sum((y - my) ** 2 for _, y in pts) / (n - 1)
        cxy = sum((x - mx) * (y - my) for x, y in pts) / (n - 1)
        if my == 0:
            assert got[arm]["ratio_value_per_event"] is None
            stats[arm] = None
            continue
        r_ = mx / my
        v = (vx - 2 * r_ * cxy + r_ * r_ * vy) / (n * my * my)
        stats[arm] = (r_, v)
        assert abs(got[arm]["ratio_value_per_event"] - round(r_, 6)) <= 1e-5
        assert abs(got[arm]["se"] - round(math.sqrt(v), 6)) <= 1e-5
    if stats.get(0) and stats.get(1):
        dr = stats[1][0] - stats[0][0]
        dv = stats[1][1] + stats[0][1]
        z = dr / math.sqrt(dv)
        for arm in got:
            assert abs(got[arm]["z_diff"] - round(z, 4)) <= 1e-3


def test_ktruss_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.graph import (
        _KTRUSS_K,
        MAX_BASKET,
        graph_ktruss,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in baskets.values():
        capped = sorted(parts)[:MAX_BASKET]
        for i in range(len(capped)):
            for j in range(i + 1, len(capped)):
                edges.add((capped[i], capped[j]))
    # sequential k-truss peel
    while True:
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        support = {
            (u, v): len(adj[u] & adj[v]) for u, v in edges
        }
        kept = {e for e in edges if support[e] >= _KTRUSS_K - 2}
        if kept == edges:
            break
        edges = kept
    got = graph_ktruss(spark, sf_dir).collect()
    want = sorted(
        ((u, v, support[(u, v)]) for u, v in edges),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:100]
    got_t = [(r["src"], r["dst"], r["support"]) for r in got]
    assert got_t == want
    # invariant: every surviving edge has support >= k-2 in the truss
    for _, _, s in got_t:
        assert s >= _KTRUSS_K - 2


def test_breusch_pagan_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_breusch_pagan,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    agg = defaultdict(Decimal)
    for r in rows:
        agg[r["o_orderdate"]] += Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    days = sorted(agg)
    d0 = days[0]
    pts = [
        (
            int((d - d0).total_seconds() * 1_000_000) // 86_400_000_000,
            float(agg[d]),
        )
        for d in days
    ]
    n = len(pts)
    got = ts_breusch_pagan(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    if n < 3:
        assert got["bp_lm_stat"] is None
        return
    mx = sum(t for t, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxy = sum(t * y for t, y in pts) - n * mx * my
    sxx = sum(t * t for t, _ in pts) - n * mx * mx
    slope = sxy / sxx if sxx > 0 else 0.0
    e2 = [(t, (y - (my + slope * (t - mx))) ** 2) for t, y in pts]
    mx2 = sum(t for t, _ in e2) / n
    me2 = sum(v for _, v in e2) / n
    sxy2 = sum(t * v for t, v in e2) - n * mx2 * me2
    sxx2 = sum(t * t for t, _ in e2) - n * mx2 * mx2
    syy2 = sum(v * v for _, v in e2) - n * me2 * me2
    if sxx2 <= 0 or syy2 <= 0:
        assert got["bp_lm_stat"] is None
        return
    lm = n * sxy2 * sxy2 / (sxx2 * syy2)
    assert abs(got["bp_lm_stat"] - round(lm, 4)) <= 2e-3


def test_newey_west_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        _NW_L,
        ts_newey_west_slope,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    agg = defaultdict(Decimal)
    for r in rows:
        agg[r["o_orderdate"]] += Decimal(str(r["o_totalprice"])).quantize(
            Decimal("0.01")
        )
    days = sorted(agg)
    d0 = days[0]
    pts = [
        (
            int((d - d0).total_seconds() * 1_000_000) // 86_400_000_000,
            float(agg[d]),
        )
        for d in days
    ]
    n = len(pts)
    got = ts_newey_west_slope(spark, sf_dir).collect()[0]
    assert got["n_days"] == n
    if n < 3:
        assert got["slope"] is None
        return
    mx = sum(t for t, _ in pts) / n
    my = sum(y for _, y in pts) / n
    sxy = sum(t * y for t, y in pts) - n * mx * my
    sxx = sum(t * t for t, _ in pts) - n * mx * mx
    if sxx <= 0:
        assert got["slope"] is None
        return
    slope = sxy / sxx
    u = [(t - mx) * (y - (my + slope * (t - mx))) for t, y in pts]
    s = [sum(x * x for x in u)] + [
        sum(u[i] * u[i - l] for i in range(l, n)) for l in range(1, _NW_L + 1)
    ]
    v = (
        s[0]
        + 2.0 * sum((1.0 - l / (_NW_L + 1)) * s[l] for l in range(1, _NW_L + 1))
    ) / (sxx * sxx)
    assert abs(got["slope"] - round(slope, 6)) <= 1e-5
    if v > 0:
        assert abs(got["se_newey_west"] - round(math.sqrt(v), 6)) <= 1e-5
        assert abs(got["t_stat_nw"] - round(slope / math.sqrt(v), 4)) <= 1e-3


def test_nemenyi_matches_sequential(spark, sf_dir):
    from decimal import Decimal

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_nemenyi_posthoc,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("ts", "event_type", "value")
        .collect()
    )
    weekly = defaultdict(Decimal)
    for r in rows:
        wk = (r["ts"] - __import__("datetime").timedelta(
            days=r["ts"].weekday()
        )).date()
        weekly[(wk, r["event_type"])] += Decimal(str(r["value"])).quantize(
            Decimal("0.000001")
        )
    types = sorted({t for _, t in weekly})
    k = len(types)
    blocks = defaultdict(dict)
    for (wk, t), v in weekly.items():
        blocks[wk][t] = v
    complete = {wk: d for wk, d in blocks.items() if len(d) == k}
    n = len(complete)
    r2sum = Counter()
    for d in complete.values():
        vals = sorted(d.values())
        for t, v in d.items():
            rank = vals.index(v) + 1  # min rank of the tie block
            ties = vals.count(v)
            r2sum[t] += 2 * rank + ties - 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in stat_nemenyi_posthoc(spark, sf_dir).collect()
    }
    assert len(got) == k * (k - 1) // 2
    q = {2: 1.959964, 3: 2.343701, 4: 2.569032, 5: 2.727747}.get(k)
    for i in range(k):
        for j in range(i + 1, k):
            row = got[(types[i], types[j])]
            assert row["n_blocks"] == n
            if n < 1 or k < 2:
                assert row["critical_difference"] is None
                continue
            ma = r2sum[types[i]] / (2 * n)
            mb = r2sum[types[j]] / (2 * n)
            assert abs(row["mean_rank_a"] - round(ma, 4)) <= 1e-3
            assert abs(row["mean_rank_b"] - round(mb, 4)) <= 1e-3
            if q is not None:
                cd = q * math.sqrt(k * (k + 1) / (6.0 * n))
                assert abs(row["critical_difference"] - round(cd, 4)) <= 1e-3
                assert row["reject_5pct"] == (1 if abs(ma - mb) > cd else 0)


def test_feature_vif_matches_numpy(spark, sf_dir):
    import numpy as np

    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_feature_vif,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "value")
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0.0, 0])
    for r in rows:
        e = per[r["user_id"]]
        e[0] += 1
        if r["event_type"] == "purchase":
            e[1] += 1
        if r["value"] is not None:
            e[2] += r["value"]
            e[3] += 1
    X = np.array(
        [
            [
                math.log(1.0 + ne),
                npur / ne,
                ((sv / nv) if nv else 0.0) / 100.0,
            ]
            for ne, npur, sv, nv in per.values()
        ]
    )
    got = {r["feature"]: r for r in ml_feature_vif(spark, sf_dir).collect()}
    R = np.corrcoef(X, rowvar=False)
    det = np.linalg.det(R)
    names = ["log1p_events", "purchase_ratio", "avg_value_h"]
    if det <= 1e-12:
        for t in names:
            assert got[t]["vif"] is None
        return
    inv = np.linalg.inv(R)
    for i, t in enumerate(names):
        assert abs(got[t]["vif"] - round(float(inv[i, i]), 4)) <= 1e-3


def test_delong_auc_ci_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_auc_delong_ci,
    )

    x, y = _values_by_class(spark, sf_dir)  # positives, negatives
    n1, n0 = len(x), len(y)
    got = ml_eval_auc_delong_ci(spark, sf_dir).collect()[0]
    assert got["n_pos"] == n1 and got["n_neg"] == n0
    if n1 == 0 or n0 == 0:
        assert got["auc"] is None
        return
    import bisect

    ys = sorted(y)
    xs = sorted(x)
    v10 = [
        (bisect.bisect_left(ys, xi)
         + 0.5 * (bisect.bisect_right(ys, xi) - bisect.bisect_left(ys, xi)))
        / n0
        for xi in x
    ]
    v01 = [
        ((n1 - bisect.bisect_right(xs, yi))
         + 0.5 * (bisect.bisect_right(xs, yi) - bisect.bisect_left(xs, yi)))
        / n1
        for yi in y
    ]
    auc = sum(v10) / n1
    assert abs(got["auc"] - round(auc, 6)) <= 1e-5
    if n1 < 2 or n0 < 2:
        assert got["se"] is None
        return
    m10 = sum(v10) / n1
    m01 = sum(v01) / n0
    s10 = sum((v - m10) ** 2 for v in v10) / (n1 - 1)
    s01 = sum((v - m01) ** 2 for v in v01) / (n0 - 1)
    se = math.sqrt(s10 / n1 + s01 / n0)
    assert abs(got["se"] - round(se, 6)) <= 1e-5
    assert abs(got["ci_lo"] - round(auc - 1.959964 * se, 6)) <= 1e-5
    assert abs(got["ci_hi"] - round(auc + 1.959964 * se, 6)) <= 1e-5


def test_fd_audit_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.profile import (
        _FD_CANDIDATES,
        profile_fd_audit,
    )

    got = {r["candidate"]: r for r in profile_fd_audit(spark, sf_dir).collect()}
    assert len(got) == len(_FD_CANDIDATES)
    for name, table, lhs, rhs in _FD_CANDIDATES:
        rows = (
            spark.read.parquet(f"{sf_dir}/{table}.parquet")
            .select(lhs, rhs)
            .collect()
        )
        pair = Counter(
            (r[lhs], r[rhs]) for r in rows if r[lhs] is not None
        )
        total = Counter()
        mx = Counter()
        for (l, _), c in pair.items():
            total[l] += c
            mx[l] = max(mx[l], c)
        n_rows = sum(total.values())
        viol = sum(total[l] - mx[l] for l in total)
        row = got[name]
        assert row["n_groups"] == len(total)
        assert row["n_rows"] == n_rows
        assert row["n_violating_rows"] == viol
        assert row["holds"] == (1 if viol == 0 else 0)
        assert abs(row["g3_error"] - round(viol / n_rows, 6)) <= 1e-9


def test_prefixspan_matches_exhaustive_enumeration(spark, sf_dir):
    from itertools import product

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _PSPAN_MAX_EVENTS,
        _PSPAN_MAX_LEN,
        _PSPAN_MIN_SUPPORT,
        sequence_prefixspan,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per = defaultdict(list)
    for r in rows:
        per[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    seqs = []
    for v in per.values():
        v.sort()
        seqs.append([t for _, _, t in v[:_PSPAN_MAX_EVENTS]])
    n = len(seqs)
    types = sorted({t for s in seqs for t in s})

    def contains(seq, pat):
        i = 0
        for s in seq:
            if i < len(pat) and s == pat[i]:
                i += 1
        return i == len(pat)

    want = {}
    for L in range(1, _PSPAN_MAX_LEN + 1):
        for pat in product(types, repeat=L):
            c = sum(contains(s, pat) for s in seqs)
            if c >= _PSPAN_MIN_SUPPORT * n:
                want[">".join(pat)] = c
    got = {
        r["pattern"]: r["support_count"]
        for r in sequence_prefixspan(spark, sf_dir).collect()
    }
    assert got == want


def test_fpgrowth_matches_sequential_apriori(spark, sf_dir):
    from itertools import combinations

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _FPG_MIN_COUNT,
        basket_fpgrowth,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in rows:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    baskets = [frozenset(b) for b in baskets.values()]
    # level-wise apriori, sizes >= 2 (the op excludes singletons)
    freq_prev = {
        frozenset([i])
        for i in {x for b in baskets for x in b}
        if sum(1 for b in baskets if i in b) >= _FPG_MIN_COUNT
    }
    want = {}
    size = 2
    while freq_prev:
        cands = {
            a | b
            for a in freq_prev
            for b in freq_prev
            if len(a | b) == size
        }
        freq_now = set()
        for c in cands:
            sup = sum(1 for b in baskets if c <= b)
            if sup >= _FPG_MIN_COUNT:
                freq_now.add(c)
                want["+".join(str(x) for x in sorted(c))] = sup
        freq_prev = freq_now
        size += 1
    got = {
        r["itemset"]: r["support_count"]
        for r in basket_fpgrowth(spark, sf_dir).collect()
    }
    assert got == want


def test_partial_correlation_matches_numpy(spark, sf_dir):
    import numpy as np

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_partial_correlation,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "value")
        .collect()
    )
    per = defaultdict(lambda: [0, 0, 0.0, 0])
    for r in rows:
        e = per[r["user_id"]]
        e[0] += 1
        if r["event_type"] == "purchase":
            e[1] += 1
        if r["value"] is not None:
            e[2] += r["value"]
            e[3] += 1
    X = np.array(
        [
            [
                math.log(1.0 + ne),
                (sv / nv) if nv else 0.0,
                npur / ne,
            ]
            for ne, npur, sv, nv in per.values()
        ]
    )
    n = len(X)
    got = stat_partial_correlation(spark, sf_dir).collect()[0]
    assert got["n_users"] == n
    R = np.corrcoef(X, rowvar=False)
    r_xy, r_xz, r_yz = R[0, 1], R[0, 2], R[1, 2]
    assert abs(got["r_raw"] - round(float(r_xy), 6)) <= 1e-5
    den = (1 - r_xz**2) * (1 - r_yz**2)
    if n < 4 or den <= 1e-12:
        assert got["r_partial"] is None
        return
    rp = (r_xy - r_xz * r_yz) / math.sqrt(den)
    assert abs(got["r_partial"] - round(float(rp), 6)) <= 1e-5
    if abs(rp) < 1.0:
        z = 0.5 * math.log((1 + rp) / (1 - rp)) * math.sqrt(n - 4.0)
        assert abs(got["fisher_z"] - round(z, 4)) <= 1e-3
