"""Round-15 operators: sequential-Python differential replicas.

Each test recomputes the operator's statistic from the RAW fixture rows
with an independent pure-Python implementation (exact ints / Decimal where
the operator is exact; textbook float formulas where it exits through
ROUND) and requires agreement with the Spark result. This is the
differential-kernel layer (SURVEY §5 / COVERAGE "Differential kernel
tests"): the DuckDB oracle proves cross-ENGINE agreement, these prove the
shared formula is the TEXTBOOK one.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

SF = None  # use the session sf_dir fixture


def _events(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "value", "ts", "event_id")
        .collect()
    )


def test_welch_anova_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        WELCH_QUANT,
        stat_welch_anova,
    )

    rows = _events(spark, sf_dir)
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(math.floor(r["value"] * WELCH_QUANT))
    stats = {}
    for g, vs in groups.items():
        n = len(vs)
        if n < 2:
            continue
        s, q = sum(vs), sum(v * v for v in vs)
        if n * q <= s * s:
            continue
        mean = float(s) / float(n)
        var = (float(q) - float(s) * float(s) / float(n)) / (float(n) - 1.0)
        stats[g] = (n, mean, float(n) / var)
    k = len(stats)
    sw = sum(math.floor(w * 1e9) for _, _, w in stats.values())
    swm = sum(math.floor(w * m * 1e9) for _, m, w in stats.values())
    xt = float(swm) / float(sw)
    sa = sum(
        math.floor(w * (m - xt) * (m - xt) * 1e6) for _, m, w in stats.values()
    )
    sb = sum(
        math.floor(
            (1.0 - math.floor(w * 1e9) / float(sw)) ** 2 / (float(n) - 1.0)
            * 1e12
        )
        for n, _, w in stats.values()
    )
    f_ref = (float(sa) / 1e6 / (float(k) - 1.0)) / (
        1.0
        + 2.0 * (float(k) - 2.0) / (float(k) * float(k) - 1.0)
        * (float(sb) / 1e12)
    )
    got = stat_welch_anova(spark, sf_dir).collect()[0]
    assert got["k_groups"] == k
    assert got["f_welch"] == pytest.approx(f_ref, abs=2e-4)


def test_mood_median_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        ANOVA_QUANT,
        stat_mood_median_test,
    )

    rows = _events(spark, sf_dir)
    vq = sorted(math.floor(r["value"] * ANOVA_QUANT) for r in rows)
    n = len(vq)
    # lowest value with 2*cum >= n over the distinct grain
    cum = 0
    med = None
    for val, cnt in sorted(Counter(vq).items()):
        cum += cnt
        if 2 * cum >= n:
            med = val
            break
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        q = math.floor(r["value"] * ANOVA_QUANT)
        cells[r["event_type"]][0 if q > med else 1] += 1
    ca = sum(a for a, _ in cells.values())
    cb = sum(b for _, b in cells.values())
    chi2_micros = 0
    for a, b in cells.values():
        ng = a + b
        chi2_micros += math.floor(
            float(a * n - ng * ca) ** 2 / (float(n) * float(ng) * float(ca))
            * 1e6
        )
        chi2_micros += math.floor(
            float(b * n - ng * cb) ** 2 / (float(n) * float(ng) * float(cb))
            * 1e6
        )
    got = stat_mood_median_test(spark, sf_dir).collect()[0]
    assert got["chi2_micros"] == chi2_micros
    assert got["df"] == len(cells) - 1


def test_icc_oneway_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        ICC_QUANT,
        stat_icc_oneway,
    )

    rows = _events(spark, sf_dir)
    per = defaultdict(list)
    for r in rows:
        per[r["user_id"]].append(math.floor(r["value"] * ICC_QUANT))
    G = len(per)
    N = sum(len(v) for v in per.values())
    S = sum(sum(v) for v in per.values())
    Q = sum(x * x for v in per.values() for x in v)
    ssq = sum((sum(v) ** 2) // len(v) for v in per.values())
    ssb = ssq - (S * S) // N
    ssw = Q - ssq
    nn = sum(len(v) ** 2 for v in per.values())
    k0n = nn - (nn - nn % N) // N
    msb = float(ssb) / (float(G) - 1.0)
    msw = float(ssw) / (float(N) - float(G))
    icc_ref = (msb - msw) / (
        msb + ((float(N) - float(k0n)) / (float(G) - 1.0) - 1.0) * msw
    )
    got = stat_icc_oneway(spark, sf_dir).collect()[0]
    assert got["n_groups"] == G and got["n_total"] == N
    assert got["icc1"] == pytest.approx(icc_ref, abs=1e-6)
    assert -1.0 <= got["icc1"] <= 1.0


def test_ks_separation_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_ks_separation,
    )

    rows = _events(spark, sf_dir)
    pos = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    neg = sorted(r["value"] for r in rows if r["event_type"] != "purchase")
    npos, nneg = len(pos), len(neg)
    grid = sorted(set(pos) | set(neg))
    best, best_s = -1, None
    cp = cn = 0
    ip = ineg = 0
    for s in grid:
        while ip < npos and pos[ip] <= s:
            ip += 1
        while ineg < nneg and neg[ineg] <= s:
            ineg += 1
        num = abs(ip * nneg - ineg * npos)
        if num > best:
            best, best_s = num, s
    got = ml_eval_ks_separation(spark, sf_dir).collect()[0]
    assert got["n_pos"] == npos and got["n_neg"] == nneg
    assert got["ks"] == pytest.approx(best / (npos * nneg), abs=1e-6)
    assert got["ks_score"] == pytest.approx(best_s)


def test_mutual_information_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.ml_eval import (
        MI_BIN,
        ml_mutual_information,
    )

    rows = _events(spark, sf_dir)
    cells = Counter(
        (math.floor(r["value"] / MI_BIN), r["event_type"]) for r in rows
    )
    rx = Counter()
    cy = Counter()
    for (x, y), c in cells.items():
        rx[x] += c
        cy[y] += c
    n = sum(cells.values())
    s_nanos = sum(
        math.floor(
            c * (math.log(c) + math.log(n) - math.log(rx[x]) - math.log(cy[y]))
            * 1e9
        )
        for (x, y), c in cells.items()
    )
    mi_ref = (s_nanos / 1e9) / n
    got = ml_mutual_information(spark, sf_dir).collect()[0]
    assert got["n_cells"] == len(cells)
    assert got["mi_nats"] == pytest.approx(mi_ref, abs=1e-6)
    assert got["mi_nats"] >= 0.0  # MI is non-negative up to quantization


def test_kpss_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_kpss_stationarity,
    )
    from decimal import Decimal

    rows = _events(spark, sf_dir)
    daily = defaultdict(lambda: defaultdict(Decimal))
    epoch = None
    for r in rows:
        day = r["ts"].date().toordinal()
        daily[r["event_type"]][day] += Decimal(str(r["value"])).quantize(
            Decimal("0.01")
        )
    expected = {}
    for g, series in daily.items():
        yc = [int(v * 100) for _, v in sorted(series.items())]
        n = len(yc)
        if n < 2:
            expected[g] = None
            continue
        s = sum(yc)
        ev = [n * y - s for y in yc]
        cum = 0
        a = 0
        for e in ev:
            cum += e
            a += cum * cum
        d = 10 * sum(e * e for e in ev)
        for lag, w10 in ((1, 8), (2, 6), (3, 4), (4, 2)):
            d += 2 * w10 * sum(
                ev[t] * ev[t - lag] for t in range(lag, n)
            )
        if d <= 0:
            expected[g] = None
            continue
        expected[g] = (20000000 * a + n * d) // (2 * n * d)
    got = {
        r["event_type"]: r["eta_micros"]
        for r in ts_kpss_stationarity(spark, sf_dir).collect()
    }
    assert got == expected


def test_theta_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.timeseries import (
        _THETA_ALPHA,
        _THETA_H,
        ts_theta_forecast,
    )
    from decimal import Decimal

    rows = _events(spark, sf_dir)
    daily = defaultdict(lambda: defaultdict(Decimal))
    for r in rows:
        daily[r["event_type"]][r["ts"].date().toordinal()] += Decimal(
            str(r["value"])
        ).quantize(Decimal("0.01"))
    expected = {}
    for g, series in daily.items():
        yc = [int(v * 100) for _, v in sorted(series.items())]
        n = len(yc)
        if n < 2:
            continue
        st = n * (n + 1) // 2
        stt = n * (n + 1) * (2 * n + 1) // 6
        syc = sum(yc)
        sty = sum((t + 1) * y for t, y in enumerate(yc))
        b = float(n * sty - st * syc) / float(n * stt - st * st)
        a = (float(syc) - b * float(st)) / float(n)
        level = 2.0 * float(yc[0]) - (a + b * 1.0)
        for t in range(2, n + 1):
            x = 2.0 * float(yc[t - 1]) - (a + b * float(t))
            level = _THETA_ALPHA * x + (1.0 - _THETA_ALPHA) * level
        for h in range(1, _THETA_H + 1):
            expected[(g, h)] = (
                0.5 * (a + b * float(n + h)) + 0.5 * level
            ) / 100.0
    got = {
        (r["event_type"], r["h"]): r["forecast"]
        for r in ts_theta_forecast(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k2, v in expected.items():
        assert got[k2] == pytest.approx(v, abs=1e-6), k2


def test_hhi_matches_sequential(spark, sf_dir):
    from decimal import Decimal

    from recommendation_system_big_data_spark.operators.olap import (
        olap_market_share_hhi,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r["c_custkey"]: (r["c_mktsegment"], r["c_nationkey"])
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    rev = defaultdict(int)
    for o in orders:
        seg, nat = cust[o["o_custkey"]]
        rev[(seg, nat)] += int(
            Decimal(str(o["o_totalprice"])).quantize(Decimal("0.01")) * 100
        )
    seg_tot = defaultdict(int)
    for (seg, _), c in rev.items():
        seg_tot[seg] += c
    hhi = defaultdict(int)
    top = defaultdict(int)
    nsellers = Counter()
    for (seg, _), c in rev.items():
        bp = c * 10000 // seg_tot[seg]
        hhi[seg] += bp * bp
        top[seg] = max(top[seg], bp)
        nsellers[seg] += 1
    got = {r["segment"]: r for r in olap_market_share_hhi(spark, sf_dir).collect()}
    assert set(got) == set(hhi)
    for seg in hhi:
        assert got[seg]["hhi"] == hhi[seg]
        assert got[seg]["top_share_bp"] == top[seg]
        assert got[seg]["n_sellers"] == nsellers[seg]
        # HHI lives in [10^8/n, 10^8] (up to bp truncation)
        assert got[seg]["hhi"] <= 10**8


def test_isotropy_matches_bruteforce(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.similarity import (
        embedding_isotropy_score,
    )

    vecs = [
        [math.floor(float(x) * 1e9) for x in r["embedding"]]
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    ]
    n, d = len(vecs), len(vecs[0])
    s = [sum(v[j] for v in vecs) for j in range(d)]
    a = sum(x * x for x in s)
    q = sum(x * x for v in vecs for x in v)
    got = embedding_isotropy_score(spark, sf_dir).collect()[0]
    assert got["n"] == n and got["dims"] == d

    def half_away(num, den):
        return (2 * num + den) // (2 * den) if num >= 0 else -(
            (2 * (-num) + den) // (2 * den)
        )

    assert got["mean_sq_norm_micros"] == half_away(
        q * 10**6, n * 10**18
    )
    assert got["avg_pair_dot_micros"] == half_away(
        (a - q) * 10**6, n * (n - 1) * 10**18
    )
    assert got["isotropy_ratio_micros"] == half_away(
        (a - q) * 10**6, (n - 1) * q
    )
    # brute-force O(n^2) cross-check of the closed form itself
    brute = sum(
        sum(x * y for x, y in zip(vecs[i], vecs[j]))
        for i in range(0, n, 25)
        for j in range(n)
        if j != i
    )
    closed = sum(
        sum(vecs[i][k] * s[k] for k in range(d)) - sum(x * x for x in vecs[i])
        for i in range(0, n, 25)
    )
    assert brute == closed


def test_dunn_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_dunn_posthoc,
    )

    rows = _events(spark, sf_dir)
    allv = sorted(r["value"] for r in rows)
    n = len(allv)
    # doubled midranks on the distinct grain
    rank2 = {}
    cum = 0
    for val, cnt in sorted(Counter(allv).items()):
        rank2[val] = 2 * cum + cnt + 1
        cum += cnt
    per = defaultdict(lambda: [0, 0])  # n_g, rank_sum2
    for r in rows:
        per[r["event_type"]][0] += 1
        per[r["event_type"]][1] += rank2[r["value"]]
    t3 = sum(c**3 - c for c in Counter(allv).values())
    k = len(per)
    m = k * (k - 1) // 2
    got = {
        (r["g1"], r["g2"]): r for r in stat_dunn_posthoc(spark, sf_dir).collect()
    }
    assert len(got) == m
    var_base = n * (n + 1) / 12.0 - t3 / (12.0 * (n - 1.0))
    for (g1, (n1, rs1)) in per.items():
        for (g2, (n2, rs2)) in per.items():
            if g1 >= g2:
                continue
            num = rs1 * n2 - rs2 * n1
            dm = (
                num * 10**6 // (n1 * n2)
                if num >= 0
                else -((-num) * 10**6 // (n1 * n2))
            )
            z_ref = (dm / 1e6 / 2.0) / math.sqrt(
                var_base * (1.0 / n1 + 1.0 / n2)
            )
            r = got[(g1, g2)]
            assert r["z_dunn"] == pytest.approx(z_ref, abs=2e-4)
            if r["p_bonferroni"] is not None:
                assert 0.0 <= r["p_bonferroni"] <= 1.0


def test_jonckheere_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_jonckheere_terpstra,
    )

    rows = _events(spark, sf_dir)
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    keys = sorted(groups)
    jt2 = 0
    for i, gi in enumerate(keys):
        for gj in keys[i + 1 :]:
            for x in groups[gi]:
                for y in groups[gj]:
                    if x < y:
                        jt2 += 2
                    elif x == y:
                        jt2 += 1
    n = len(rows)
    sn2 = sum(len(v) ** 2 for v in groups.values())
    sn23 = sum(len(v) ** 2 * (2 * len(v) + 3) for v in groups.values())
    tc = Counter(r["value"] for r in rows)
    st23 = sum(c * c * (2 * c + 3) for c in tc.values())
    e2 = (n * n - sn2) // 2
    var = (float(n) * n * (2.0 * n + 3.0) - sn23 - st23) / 72.0
    z_ref = (jt2 - e2) / (2.0 * math.sqrt(var))
    got = stat_jonckheere_terpstra(spark, sf_dir).collect()[0]
    assert got["jt2"] == jt2
    assert got["z_jt"] == pytest.approx(z_ref, abs=2e-4)


def test_rbo_matches_sequential(spark, sf_dir):
    from decimal import Decimal

    from recommendation_system_big_data_spark.operators.ml_eval import (
        RBO_K,
        RBO_P,
        _RBO_W_NANOS,
        ml_eval_rank_biased_overlap,
    )

    rows = _events(spark, sf_dir)
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # cents, last_us
    for r in rows:
        it = per[r["user_id"]][r["event_id"] % 101]
        it[0] += int(Decimal(str(r["value"])).quantize(Decimal("0.01")) * 100)
        us = int(r["ts"].timestamp() * 1_000_000)
        it[1] = max(it[1], us)
    expected = {}
    for u, items in per.items():
        by_val = sorted(items.items(), key=lambda kv: (-kv[1][0], kv[0]))
        by_rec = sorted(items.items(), key=lambda kv: (-kv[1][1], kv[0]))
        ra = {it: i + 1 for i, (it, _) in enumerate(by_val)}
        rb = {it: i + 1 for i, (it, _) in enumerate(by_rec)}
        s_nanos = 0
        n_common = 0
        for it in items:
            if ra[it] <= RBO_K and rb[it] <= RBO_K:
                n_common += 1
                s_nanos += _RBO_W_NANOS[max(ra[it], rb[it]) - 1]
        expected[u] = (n_common, (1.0 - RBO_P) * s_nanos / 1e9)
    got = {
        r["user_id"]: (r["n_common"], r["rbo"])
        for r in ml_eval_rank_biased_overlap(spark, sf_dir).collect()
    }
    assert set(got) == {u for u, (nc, _) in expected.items() if nc > 0} | {
        u for u in got
    }
    for u, r in got.items():
        assert r[0] == expected[u][0], u
        assert r[1] == pytest.approx(expected[u][1], abs=1e-6), u
    # RBO is a similarity in [0, 1]
    assert all(0.0 <= r[1] <= 1.0 + 1e-9 for r in got.values())


def test_dbscan_grid_matches_sequential(spark, sf_dir):
    from recommendation_system_big_data_spark.operators.geo import (
        _DBSCAN_CELL,
        _DBSCAN_MINPTS,
        geo_dbscan_grid,
    )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    cells = Counter(
        (
            (r["c_custkey"] * 7919 % 12000) // _DBSCAN_CELL,
            (r["c_custkey"] * 104729 % 36000) // _DBSCAN_CELL,
        )
        for r in cust
    )
    core = {cy * 1000 + cx: ((cy, cx), c) for (cy, cx), c in cells.items()
            if c >= _DBSCAN_MINPTS}
    # sequential union-find
    parent = {i: i for i in core}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pos = {p: i for i, (p, _) in core.items()}
    for i, ((cy, cx), _) in core.items():
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                j = pos.get((cy + dy, cx + dx))
                if j is not None:
                    a, b = find(i), find(j)
                    if a != b:
                        parent[max(a, b)] = min(a, b)
    clusters = defaultdict(lambda: [0, 0])
    for i, (_, c) in core.items():
        root = find(i)
        clusters[root][0] += 1
        clusters[root][1] += c
    got = {
        r["cluster_id"]: (r["n_cells"], r["n_points"])
        for r in geo_dbscan_grid(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in clusters.items()}


def test_markov_attribution_matches_sequential(spark, sf_dir):
    """Independent journey segmentation (plain Python sort per user, no
    windows) + the same fixed-iteration absorption solve — gates the
    window-based transition builder and the coefficient algebra."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        _MARKOV_CHANNELS,
        _markov_solve,
        attribution_markov_removal,
    )

    rows = _events(spark, sf_dir)
    by_user = defaultdict(list)
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        by_user[r["user_id"]].append((us, r["event_id"], r["event_type"]))
    counts = Counter()
    for u, evs in by_user.items():
        evs.sort()
        prev = "start"
        for _, _, t in evs:
            if t == "purchase":
                counts[(prev, "conv")] += 1
                prev = None
                break
            counts[(prev, t)] += 1
            prev = t
        if prev is not None:
            counts[(prev, "drop")] += 1
    states = ("start",) + _MARKOV_CHANNELS
    out_tot = {
        s: sum(n for (src, _), n in counts.items() if src == s)
        for s in states
    }
    coef = {
        f"c_{s}_{t}": (
            float(counts.get((s, t), 0)) / float(out_tot[s])
            if out_tot[s]
            else 0.0
        )
        for s in states
        for t in _MARKOV_CHANNELS + ("conv",)
    }
    p_all = _markov_solve(coef, None)
    got = {
        r["channel"]: r
        for r in attribution_markov_removal(spark, sf_dir).collect()
    }
    assert set(got) == set(_MARKOV_CHANNELS)
    tot = sum(
        1.0 - _markov_solve(coef, c) / p_all for c in _MARKOV_CHANNELS
    )
    for c in _MARKOV_CHANNELS:
        r = got[c]
        assert r["p_conv_all"] == pytest.approx(p_all, abs=1e-9)
        e = 1.0 - _markov_solve(coef, c) / p_all
        assert r["removal_effect"] == pytest.approx(e, abs=1e-6)
        assert r["attribution_share"] == pytest.approx(e / tot, abs=1e-6)
    # shares form a distribution
    assert sum(r["attribution_share"] for r in got.values()) == pytest.approx(
        1.0, abs=1e-4
    )


def test_adaboost_rounds_decrease_training_error(spark, sf_dir):
    """Boosting contract gates: round-1 eps equals the best single
    stump's weighted error under UNIFORM weights (i.e. adaboost round 1
    == the plain stump search), every eps < 0.5 (weak-learner
    guarantee on non-degenerate data), and alphas are positive."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        _ADA_BIN,
        _ADA_MAX_BIN,
        ml_adaboost_stumps,
    )

    rows = _events(spark, sf_dir)
    cells = Counter(
        (min(math.floor(r["value"] / _ADA_BIN), _ADA_MAX_BIN),
         1 if r["event_type"] == "purchase" else -1)
        for r in rows
    )
    n = sum(cells.values())
    best = None
    for t in range(_ADA_MAX_BIN + 1):
        for p in (1, -1):
            err = sum(
                c for (b, y), c in cells.items()
                if (p if b <= t else -p) != y
            )
            if best is None or err < best:
                best = err
    got = {r["round"]: r for r in ml_adaboost_stumps(spark, sf_dir).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1]["eps"] == pytest.approx(best / n, abs=1e-5)
    for r in got.values():
        assert 0.0 < r["eps"] < 0.5
        assert r["alpha"] > 0.0
        assert 0 <= r["threshold"] <= _ADA_MAX_BIN
        assert r["polarity"] in (1, -1)


def test_textrank_ranks_form_distribution(spark, sf_dir):
    """PageRank invariant: ranks are positive and sum to ~1 over the
    candidate vocabulary (symmetric graph, no dangling nodes)."""
    from recommendation_system_big_data_spark.functions.text import (
        text_textrank_keywords,
    )

    rows = text_textrank_keywords(spark, sf_dir).collect()
    assert rows
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-3)
    assert all(r["rank"] > 0 for r in rows)


def test_arch_lm_matches_sequential(spark, sf_dir):
    from decimal import Decimal

    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_arch_lm_test,
    )

    rows = _events(spark, sf_dir)
    daily = defaultdict(lambda: defaultdict(Decimal))
    for r in rows:
        daily[r["event_type"]][r["ts"].date().toordinal()] += Decimal(
            str(r["value"])
        ).quantize(Decimal("0.01"))
    expected = {}
    for g, series in daily.items():
        yc = [int(v * 100) for _, v in sorted(series.items())]
        n = len(yc)
        m = sum(yc) // n
        s = [(y - m) ** 2 for y in yc]
        xs, ys = s[:-1], s[1:]
        np_ = len(xs)
        if np_ < 3:
            expected[g] = (np_, None)
            continue
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        vx = float(np_) * float(sxx) - float(sx) * float(sx)
        vy = float(np_) * float(syy) - float(sy) * float(sy)
        if vx <= 0 or vy <= 0:
            expected[g] = (np_, None)
            continue
        cov = float(np_) * float(sxy) - float(sx) * float(sy)
        expected[g] = (np_, float(np_) * cov * cov / (vx * vy))
    got = {
        r["event_type"]: (r["n_pairs"], r["lm_stat"])
        for r in ts_arch_lm_test(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for g, (np_, lm) in expected.items():
        assert got[g][0] == np_
        if lm is None:
            assert got[g][1] is None
        else:
            assert got[g][1] == pytest.approx(lm, abs=2e-4)
            assert got[g][1] >= 0.0


def test_gmm_recovers_planted_bimodal(spark, sf_dir):
    """EM sanity on a planted two-Gaussian histogram: means recovered
    within a bin, weights near the planted 0.4/0.6, mu1 < mu2 by the
    deterministic moment-split init; plus distribution invariants on
    the registered query."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        _gmm_solve,
        ml_gmm_em_1d,
    )
    import random

    rng = random.Random(7)
    cells = Counter()
    for _ in range(4000):
        cells[max(0, min(560, int(rng.gauss(100, 15))))] += 1
    for _ in range(6000):
        cells[max(0, min(560, int(rng.gauss(400, 25))))] += 1
    fit = _gmm_solve(sorted(cells.items()))
    (c1, pi1, mu1, sd1), (c2, pi2, mu2, sd2) = fit
    assert abs(mu1 - 100) < 5 and abs(mu2 - 400) < 5
    assert abs(pi1 - 0.4) < 0.05 and abs(pi2 - 0.6) < 0.05
    assert 5 < sd1 < 30 and 10 < sd2 < 40

    got = sorted(
        ml_gmm_em_1d(spark, sf_dir).collect(), key=lambda r: r["component"]
    )
    assert [r["component"] for r in got] == [1, 2]
    assert sum(r["pi"] for r in got) == pytest.approx(1.0, abs=1e-5)
    assert got[0]["mu"] <= got[1]["mu"]
    assert all(r["sigma"] > 0 for r in got)


def test_betweenness_matches_sequential_brandes(spark, sf_dir):
    """Sequential replica of the truncated quantized Brandes pass over
    the collected edge list — independent level construction (plain BFS
    with dict sets) gating the anti-join ladder and the integer
    dependency fold."""
    from recommendation_system_big_data_spark.operators.graph import (
        _BETW_SEEDS,
        MAX_BASKET,
        graph_betweenness_sampled,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in baskets.values():
        capped = sorted(parts)[:MAX_BASKET]
        for x in capped:
            for y in capped:
                if x != y:
                    edges.add((x, y))
    adj = defaultdict(set)
    deg = Counter()
    for s, d in edges:
        adj[s].add(d)
        deg[s] += 1
    seeds = sorted(deg, key=lambda k: (-deg[k], k))[:_BETW_SEEDS]
    total = Counter()
    contributing = defaultdict(set)
    for seed in seeds:
        levels = [{seed: 1}]
        seen = {seed}
        for _ in range(3):
            nxt = defaultdict(int)
            for u, sig in levels[-1].items():
                for w in adj[u]:
                    if w not in seen:
                        nxt[w] += sig
            seen |= set(nxt)
            levels.append(dict(nxt))
        dq = [dict() for _ in range(4)]
        for k in (2, 1):
            for v, sig_v in levels[k].items():
                acc = 0
                for w in adj[v]:
                    if w in levels[k + 1]:
                        sig_w = levels[k + 1][w]
                        acc += sig_v * (10**9 + dq[k + 1].get(w, 0)) // sig_w
                if acc:
                    dq[k][v] = acc
        for k in (1, 2):
            for v, q in dq[k].items():
                total[v] += q
                contributing[v].add(seed)
    got = {
        r["part"]: (r["betweenness_nanos"], r["n_seeds"])
        for r in graph_betweenness_sampled(spark, sf_dir).collect()
    }
    expected = {
        v: (q, len(contributing[v])) for v, q in total.items() if q > 0
    }
    assert got == expected


def test_cvm_matches_sequential(spark, sf_dir):
    """Textbook O(n log n) replica: pool, midrank, per-sample within-rank
    loop — the naive form the closed-form tie-block fold must equal."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cramer_von_mises_2samp,
    )

    rows = _events(spark, sf_dir)
    a = sorted(r["value"] for r in rows if r["event_type"] == "purchase")
    b = sorted(r["value"] for r in rows if r["event_type"] != "purchase")
    n, m = len(a), len(b)
    # doubled pooled midranks per distinct value
    pooled = Counter(a) + Counter(b)
    rank2 = {}
    cum = 0
    for v, c in sorted(pooled.items()):
        rank2[v] = 2 * cum + c + 1
        cum += c
    u4 = 0
    sa = sum((rank2[v] - 2 * (i + 1)) ** 2 for i, v in enumerate(a))
    sb = sum((rank2[v] - 2 * (j + 1)) ** 2 for j, v in enumerate(b))
    u4 = n * sa + m * sb
    t_ref = (u4 / 4.0) / (float(n) * float(m) * float(n + m)) - (
        4.0 * n * m - 1.0
    ) / (6.0 * (n + m))
    got = stat_cramer_von_mises_2samp(spark, sf_dir).collect()[0]
    assert got["n_pos"] == n and got["n_neg"] == m
    assert got["t_stat"] == pytest.approx(t_ref, abs=1e-6)
