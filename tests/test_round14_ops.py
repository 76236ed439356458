"""Round-14 additions: semantic pins on planted corpora for the new
rank/changepoint/normality/contingency/blocked-rank tests, Granger,
Heaps' law, Davies–Bouldin, the GLM deviances, and segment migration.
Oracle equivalence is covered by the registry checks; these tests pin
the STATISTICS — a hash match can't tell a correct Kendall τ from a
consistently wrong one on both engines."""

from __future__ import annotations

import datetime
import math


def _write_orders(spark, path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_kendall_tau_perfect_monotone(spark, tmp_path):
    """Strictly co-monotone daily (revenue, count) → τ_b = +1; strictly
    anti-monotone → −1. Pins the sign convention and the pair algebra."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_kendall_tau,
    )

    t0 = datetime.datetime(1995, 1, 1)
    # day d has d+1 orders of price 10*(d+1): rev and cnt both increase
    rows = []
    k = 0
    for d in range(8):
        for _ in range(d + 1):
            rows.append(
                (k, k % 5, "F", 10.0 * (d + 1),
                 t0 + datetime.timedelta(days=d), "1-URGENT")
            )
            k += 1
    sf = str(tmp_path / "mono")
    _write_orders(spark, sf, rows)
    r = stat_kendall_tau(spark, sf).collect()[0]
    assert r["tau_b"] == 1.0 and r["p_value"] < 0.05, r

    # anti-monotone: more orders but each cheaper, rev decreasing
    rows = []
    k = 0
    for d in range(8):
        for _ in range(d + 1):
            rows.append(
                (k, k % 5, "F", 1000.0 / ((d + 1) * (d + 1)),
                 t0 + datetime.timedelta(days=d), "1-URGENT")
            )
            k += 1
    sf = str(tmp_path / "anti")
    _write_orders(spark, sf, rows)
    r = stat_kendall_tau(spark, sf).collect()[0]
    assert r["tau_b"] == -1.0, r


def test_pettitt_locates_planted_step(spark, tmp_path):
    """A clean level shift at day 10 of 20 → changepoint_day = day 10
    (the last day of the low regime maximizes |U_t|), p < 0.05."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_pettitt_changepoint,
    )

    t0 = datetime.datetime(1995, 1, 1)
    rows = []
    for d in range(20):
        base = 100.0 if d < 10 else 500.0
        rows.append(
            (d, d % 5, "F", base + d * 0.01,
             t0 + datetime.timedelta(days=d), "1-URGENT")
        )
    sf = str(tmp_path)
    _write_orders(spark, sf, rows)
    r = stat_pettitt_changepoint(spark, sf).collect()[0]
    assert r["changepoint_day"] == datetime.date(1995, 1, 10), r
    assert r["p_value"] < 0.05 and r["reject_5pct"] == 1, r


def test_lilliefors_d_matches_sequential_reference(spark, tmp_path):
    """D statistic equals a sequential Python replica (ECDF both-sided
    gaps vs Φ at the sample mean/std) on a planted skewed series."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_lilliefors_normality,
    )

    t0 = datetime.datetime(1995, 1, 1)
    vals = [((7 * i + 3) % 23) ** 2 + 1.0 for i in range(30)]  # skewed
    rows = [
        (i, i % 5, "F", vals[i], t0 + datetime.timedelta(days=i), "x")
        for i in range(30)
    ]
    sf = str(tmp_path)
    _write_orders(spark, sf, rows)
    r = stat_lilliefors_normality(spark, sf).collect()[0]

    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    m = sum(cents) / n
    s = math.sqrt(sum((c - m) ** 2 for c in cents) / (n - 1))
    d_ref = 0.0
    for i, c in enumerate(cents, start=1):
        z = (c - m) / s
        phi = 0.5 * (1 + math.erf(z / math.sqrt(2)))
        d_ref = max(d_ref, abs(i / n - phi), abs(phi - (i - 1) / n))
    assert abs(r["d_stat"] - d_ref) < 1e-4, (r["d_stat"], d_ref)
    assert r["crit_05"] == round(0.886 / math.sqrt(n), 6)


def test_g_test_independence_vs_association(spark, tmp_path):
    """Counts independent of day-of-week → G ≈ 0, p ≈ 1; a hard
    weekday/weekend × type association → reject."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_g_test,
    )

    t0 = datetime.datetime(2024, 1, 1)  # a Monday
    indep, assoc = [], []
    k = 0
    for d in range(14):
        for typ in ("click", "view"):
            for _ in range(5):
                indep.append(
                    (k, t0 + datetime.timedelta(days=d), k % 9, typ, 1.0, "{}")
                )
                k += 1
        # association: clicks only on weekdays, views only on weekends
        dow = (t0 + datetime.timedelta(days=d)).weekday()
        typ = "click" if dow < 5 else "view"
        for _ in range(10):
            assoc.append(
                (k, t0 + datetime.timedelta(days=d), k % 9, typ, 1.0, "{}")
            )
            k += 1
    sf_i, sf_a = str(tmp_path / "i"), str(tmp_path / "a")
    _write_events(spark, sf_i, indep)
    _write_events(spark, sf_a, assoc)
    ri = stat_g_test(spark, sf_i).collect()[0]
    ra = stat_g_test(spark, sf_a).collect()[0]
    assert ri["g_stat"] == 0.0 and ri["p_value"] > 0.9, ri
    assert ra["g_stat"] > 50 and ra["p_value"] < 0.01, ra


def test_granger_planted_lag_dependence(spark, tmp_path):
    """y_t driven exactly by x_{t−1} (purchases today = clicks
    yesterday) → the unrestricted fit is near-perfect and F rejects;
    the x coefficient recovers the planted unit lag effect."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_granger_causality,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, k = [], 0
    clicks = [((5 * d + 7) % 13) + 2 for d in range(30)]
    for d in range(30):
        for _ in range(clicks[d]):
            rows.append(
                (k, t0 + datetime.timedelta(days=d), k % 9, "click", 1.0, "{}")
            )
            k += 1
        if d > 0:
            # +1 every other day: near-perfect (not exact — an exact fit
            # pins RSS_u = 0 and the operator correctly NULLs F there)
            for _ in range(clicks[d - 1] + (d % 2)):
                rows.append(
                    (k, t0 + datetime.timedelta(days=d), k % 9, "purchase",
                     1.0, "{}")
                )
                k += 1
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    r = ts_granger_causality(spark, sf).collect()[0]
    assert r["p_value"] is not None and r["p_value"] < 0.01, r
    assert abs(r["beta_x_lag"] - 1.0) < 0.15, r


def test_heaps_beta_bounds(spark, tmp_path):
    """All-unique-token corpus → V(N) = N exactly: β = 1, K = 1, R² = 1.
    A corpus that repeats one vocabulary forever → β near 0."""
    from recommendation_system_big_data_spark.functions.text import (
        text_heaps_vocab_growth,
    )

    uniq = [
        (i, " ".join(f"w{i}_{j}" for j in range(10)), "en", "s", 10)
        for i in range(20)
    ]
    rep = [
        (i, "alpha beta gamma delta epsilon", "en", "s", 10)
        for i in range(20)
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    sf_u, sf_r = str(tmp_path / "u"), str(tmp_path / "r")
    spark.createDataFrame(uniq, schema).write.mode("overwrite").parquet(
        f"{sf_u}/documents.parquet"
    )
    spark.createDataFrame(rep, schema).write.mode("overwrite").parquet(
        f"{sf_r}/documents.parquet"
    )
    ru = text_heaps_vocab_growth(spark, sf_u).collect()[0]
    rr = text_heaps_vocab_growth(spark, sf_r).collect()[0]
    assert ru["heaps_beta"] == 1.0 and ru["heaps_k"] == 1.0, ru
    assert ru["fit_r2"] == 1.0, ru
    assert rr["heaps_beta"] < 0.2, rr
    assert rr["total_types"] == 5, rr


def test_davies_bouldin_separation_ordering(spark, tmp_path):
    """Two tight, far-apart clusters score a SMALLER worst-pair
    component than the same clusters moved close together — the
    defining monotonicity of the index."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_davies_bouldin_labels,
    )

    def corpus(sep):
        rows = []
        for i in range(40):
            lbl = i % 2
            jitter = ((i * 7) % 5 - 2) / 100.0
            center = sep if lbl else -sep
            vec = [center + jitter, center - jitter] + [0.0] * 6
            rows.append((i, [float(x) for x in vec], lbl))
        return rows

    schema = "vec_id long, embedding array<float>, label int"
    sf_far, sf_near = str(tmp_path / "far"), str(tmp_path / "near")
    spark.createDataFrame(corpus(0.9), schema).write.mode(
        "overwrite"
    ).parquet(f"{sf_far}/embeddings.parquet")
    spark.createDataFrame(corpus(0.05), schema).write.mode(
        "overwrite"
    ).parquet(f"{sf_near}/embeddings.parquet")
    far = {
        r["label"]: r["db_component_milli"]
        for r in ml_davies_bouldin_labels(spark, sf_far).collect()
    }
    near = {
        r["label"]: r["db_component_milli"]
        for r in ml_davies_bouldin_labels(spark, sf_near).collect()
    }
    assert all(far[k] < near[k] for k in far), (far, near)


def test_tweedie_deviances_zero_for_perfect_baseline(spark, tmp_path):
    """If every day's count equals its dow mean exactly, both unit
    deviances are 0 (up to the micro quantization floor)."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_tweedie_deviances,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, k = [], 0
    for d in range(28):  # 4 full weeks, constant count per dow
        cnt = 3 + (t0 + datetime.timedelta(days=d)).weekday()
        for _ in range(cnt):
            rows.append(
                (k, t0 + datetime.timedelta(days=d), k % 9, "purchase",
                 1.0, "{}")
            )
            k += 1
    sf = str(tmp_path)
    _write_events(spark, sf, rows)
    r = ml_eval_tweedie_deviances(spark, sf).collect()[0]
    assert abs(r["poisson_dev_mean_micros"]) <= 1, r
    assert abs(r["gamma_dev_mean_micros"]) <= 1, r
    assert r["n_zero_days"] == 0


def test_segment_migration_planted_matrix(spark, tmp_path):
    """9 customers in each year with planted tercile positions: three
    move up one segment, three churn, three join — the matrix counts
    exactly those transitions."""
    from recommendation_system_big_data_spark.operators.olap import (
        olap_segment_migration,
    )

    rows, k = [], 0

    def add(cust, year, total):
        nonlocal k
        rows.append(
            (k, cust, "F", float(total),
             datetime.datetime(year, 6, 1), "1-URGENT")
        )
        k += 1

    # 1995: customers 1-9, spends 10..90 (terciles: 1-3 low, 4-6 mid,
    # 7-9 high). 1996: customers 4-12, spends shift so 4-6 low, 7-9
    # mid, 10-12 high.
    for c in range(1, 10):
        add(c, 1995, 10 * c)
    for c in range(4, 13):
        add(c, 1996, 10 * c)
    sf = str(tmp_path)
    _write_orders(spark, sf, rows)
    got = {
        (r["seg_1995"], r["seg_1996"]): r["n_customers"]
        for r in olap_segment_migration(spark, sf).collect()
    }
    assert got == {
        ("low", "none"): 3,
        ("mid", "low"): 3,
        ("high", "mid"): 3,
        ("none", "high"): 3,
    }, got


def test_friedman_consistent_ranking_rejects(spark, tmp_path):
    """Event types with a consistent within-week ordering across many
    weeks → Friedman rejects; identical weekly totals → NULL (den = 0)."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_friedman_test,
    )

    t0 = datetime.datetime(2024, 1, 1)  # Monday: clean ISO weeks
    ordered, tied = [], []
    k = 0
    for w in range(8):
        day = t0 + datetime.timedelta(weeks=w)
        for j, typ in enumerate(("click", "view", "purchase")):
            for _ in range(j + 1):  # click < view < purchase every week
                ordered.append((k, day, k % 9, typ, 2.0, "{}"))
                k += 1
            tied.append((k, day, k % 9, typ, 2.0, "{}"))
            k += 1
    sf_o, sf_t = str(tmp_path / "o"), str(tmp_path / "t")
    _write_events(spark, sf_o, ordered)
    _write_events(spark, sf_t, tied)
    ro = stat_friedman_test(spark, sf_o).collect()[0]
    rt = stat_friedman_test(spark, sf_t).collect()[0]
    assert ro["p_value"] is not None and ro["p_value"] < 0.01, ro
    assert rt["friedman_chi2"] is None and rt["p_value"] is None, rt


def test_bartlett_homogeneous_vs_heteroscedastic(spark, tmp_path):
    """Equal spreads → fail to reject; one group 20× wider → reject.
    A zero-variance group pins NULL (the ln(0) ANSI class the r14
    degenerate probe caught)."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_bartlett_test,
    )

    t0 = datetime.datetime(2024, 1, 1)
    spread = {"click": 1.0, "view": 1.0, "purchase": 1.0}
    wide = {"click": 1.0, "view": 1.0, "purchase": 20.0}

    def corpus(sd):
        rows = []
        k = 0
        for typ, s in sd.items():
            for i in range(60):
                jitter = ((i * 7 + 3) % 11 - 5) * s
                rows.append(
                    (k, t0 + datetime.timedelta(hours=i), k % 9, typ,
                     100.0 + jitter, "{}")
                )
                k += 1
        return rows

    sf_h, sf_w = str(tmp_path / "h"), str(tmp_path / "w")
    _write_events(spark, sf_h, corpus(spread))
    _write_events(spark, sf_w, corpus(wide))
    rh = stat_bartlett_test(spark, sf_h).collect()[0]
    rw = stat_bartlett_test(spark, sf_w).collect()[0]
    assert rh["p_value"] > 0.5, rh
    assert rw["p_value"] < 0.001, rw

    const = [
        (i, t0 + datetime.timedelta(hours=i), i % 9,
         ("click", "view")[i % 2], 5.0, "{}")
        for i in range(40)
    ]
    sf_c = str(tmp_path / "c")
    _write_events(spark, sf_c, const)
    rc = stat_bartlett_test(spark, sf_c).collect()[0]
    assert rc["bartlett_chi2"] is None and rc["p_value"] is None, rc


def test_cronbach_alpha_perfect_consistency(spark, tmp_path):
    """Every item score identical per user (perfectly correlated items)
    → α = 1 exactly; items assigned to DISJOINT user sets (maximally
    inconsistent) → α well below 1."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cronbach_alpha,
    )

    t0 = datetime.datetime(2024, 1, 1)
    perfect, split = [], []
    k = 0
    for u in range(12):
        for j, typ in enumerate(("click", "view", "purchase")):
            perfect.append(
                (k, t0 + datetime.timedelta(hours=u), u, typ,
                 float(10 + u), "{}")
            )
            k += 1
            if u % 3 == j:
                split.append(
                    (k, t0 + datetime.timedelta(hours=u), u, typ,
                     float(10 + u), "{}")
                )
                k += 1
    sf_p, sf_s = str(tmp_path / "p"), str(tmp_path / "s")
    _write_events(spark, sf_p, perfect)
    _write_events(spark, sf_s, split)
    rp = stat_cronbach_alpha(spark, sf_p).collect()[0]
    rs = stat_cronbach_alpha(spark, sf_s).collect()[0]
    assert rp["cronbach_alpha"] == 1.0, rp
    assert rs["cronbach_alpha"] < 0.5, rs


def test_spectral_entropy_sine_vs_flat(spark, tmp_path):
    """A clean 24h cycle → low entropy, dominant_period = 24; a flat
    hourly series → the energy spreads (higher entropy, no 24h line)."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_spectral_entropy,
    )

    t0 = datetime.datetime(2024, 1, 1)
    cyc, flat = [], []
    k = 0
    for h in range(24 * 14):
        n_cyc = 3 + (6 if (h % 24) in (12, 13, 14) else 0)
        # md5-scrambled jitter: genuinely aperiodic over the window (a
        # (h % k) or multiplicative-hash jitter IS a periodic signal
        # and concentrates spectral energy at its own period)
        import hashlib

        n_flat = 3 + int(
            hashlib.md5(str(h).encode()).hexdigest()[:4], 16
        ) % 7
        for _ in range(n_cyc):
            cyc.append(
                (k, t0 + datetime.timedelta(hours=h), k % 9, "click",
                 1.0, "{}")
            )
            k += 1
        for _ in range(n_flat):
            flat.append(
                (k, t0 + datetime.timedelta(hours=h), k % 9, "click",
                 1.0, "{}")
            )
            k += 1
    sf_c, sf_f = str(tmp_path / "c"), str(tmp_path / "f")
    _write_events(spark, sf_c, cyc)
    _write_events(spark, sf_f, flat)
    rc = ts_spectral_entropy(spark, sf_c).collect()[0]
    rf = ts_spectral_entropy(spark, sf_f).collect()[0]
    # a square daily pulse spreads real energy into its 12/8/6h
    # harmonics, so the fundamental's share tops out well under 1 —
    # the gate is "clearly dominant over the 1/7 uniform share"
    assert rc["dominant_period"] == 24 and rc["dominant_share"] > 0.25, rc
    assert rc["spectral_entropy"] < rf["spectral_entropy"], (rc, rf)


def test_jsd_identical_vs_disjoint_sources(spark, tmp_path):
    """Identical unigram distributions → JSD = 0; disjoint vocabularies
    → JSD = ln 2 (the upper bound)."""
    import math

    from recommendation_system_big_data_spark.functions.text import (
        text_js_divergence_sources,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    same = [
        (i, "alpha beta gamma", "en", f"s{i % 2}", 10) for i in range(10)
    ]
    disj = [
        (i, "alpha beta gamma" if i % 2 == 0 else "delta epsilon zeta",
         "en", f"s{i % 2}", 10)
        for i in range(10)
    ]
    sf_s, sf_d = str(tmp_path / "s"), str(tmp_path / "d")
    spark.createDataFrame(same, schema).write.mode("overwrite").parquet(
        f"{sf_s}/documents.parquet"
    )
    spark.createDataFrame(disj, schema).write.mode("overwrite").parquet(
        f"{sf_d}/documents.parquet"
    )
    rs = text_js_divergence_sources(spark, sf_s).collect()[0]
    rd = text_js_divergence_sources(spark, sf_d).collect()[0]
    assert rs["jsd"] == 0.0, rs
    assert abs(rd["jsd"] - math.log(2)) < 1e-5, rd


def test_closeness_star_hub(spark, tmp_path):
    """Star graph: the hub reaches every spoke in 1 hop → closeness
    exactly 1.0 (1e6 micros); each seed spoke reaches the hub at 1 and
    the other spokes at 2 → (1 + 2·(n−2))/(n−1) mean distance."""
    from recommendation_system_big_data_spark.operators.graph import (
        graph_closeness_sampled,
    )

    # order k joins hub part 1 with spoke part k+1 (2 items per order)
    rows = []
    for k in range(9):
        rows.append((k, 1))
        rows.append((k, k + 2))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).selectExpr(
        "l_orderkey",
        "l_partkey",
        "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(1.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount",
        "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag",
        "'O' AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["seed_part"]: r
        for r in graph_closeness_sampled(spark, str(tmp_path)).collect()
    }
    assert got[1]["n_reached"] == 9 and got[1]["closeness_micros"] == 1000000
    # a spoke seed: hub at 1 hop, 8 other spokes at 2 → 9 reached, Σd=17
    spoke = got[min(k for k in got if k != 1)]
    assert spoke["n_reached"] == 9 and spoke["sum_dist"] == 17
    assert spoke["closeness_micros"] == 9 * 1000000 // 17


def test_mase_perfect_weekly_cycle(spark, tmp_path):
    """An exactly 7-periodic series → seasonal-naive errors are 0 →
    MASE = 0 while the naive walk errs daily; a constant series pins
    NULL (the naive scale is 0)."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_seasonal_naive_mase,
    )

    t0 = datetime.datetime(1995, 1, 1)
    cyc = [
        (d, d % 5, "F", 100.0 + 10.0 * (d % 7),
         t0 + datetime.timedelta(days=d), "x")
        for d in range(28)
    ]
    const = [
        (d, d % 5, "F", 100.0, t0 + datetime.timedelta(days=d), "x")
        for d in range(28)
    ]
    sf_c, sf_k = str(tmp_path / "c"), str(tmp_path / "k")
    _write_orders(spark, sf_c, cyc)
    _write_orders(spark, sf_k, const)
    rc = ts_seasonal_naive_mase(spark, sf_c).collect()[0]
    rk = ts_seasonal_naive_mase(spark, sf_k).collect()[0]
    assert rc["mase_micros"] == 0 and rc["smape_micros"] == 0, rc
    assert rk["mase_micros"] is None, rk


def test_croston_matches_sequential_reference(spark, tmp_path):
    """The distributed Croston recurrence equals a sequential Python
    replay on a planted intermittent series (part 29, 5 demand days)."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        _CROSTON_ALPHA,
        ts_forecast_croston,
    )

    t0 = datetime.datetime(1995, 1, 1)
    days = [0, 3, 4, 10, 18]
    sizes = [5.0, 2.0, 7.0, 1.0, 4.0]
    orders = [
        (i, 1, "F", 100.0, t0 + datetime.timedelta(days=days[i]), "x")
        for i in range(5)
    ]
    lineitem = []
    for i in range(5):
        lineitem.append((i, 29, sizes[i]))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_partkey long, l_quantity double"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    a = _CROSTON_ALPHA
    gaps = [days[i] - days[i - 1] for i in range(1, 5)]
    level = a * sizes[1] + (1 - a) * sizes[0]
    interval = float(gaps[0])
    for i in range(2, 5):
        level = a * sizes[i] + (1 - a) * level
        interval = a * gaps[i - 1] + (1 - a) * interval
    r = ts_forecast_croston(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["p_partkey"] == 29, r
    assert abs(r[0]["smoothed_size"] - level) < 1e-6, (r, level)
    assert abs(r[0]["smoothed_interval"] - interval) < 1e-6
    assert abs(r[0]["croston_rate"] - level / interval) < 1e-6


def test_asof_tolerance_drops_stale_views(spark, tmp_path):
    """A purchase 1h after a view keeps its value; a purchase 30h after
    the only view reports NULL with stale_view = 1 and the exact gap."""
    from recommendation_system_big_data_spark.operators.asof import (
        join_asof_tolerance,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 42.0, "{}"),
        (2, t0 + datetime.timedelta(hours=1), 7, "purchase", 10.0, "{}"),
        (3, t0 + datetime.timedelta(hours=31), 7, "purchase", 11.0, "{}"),
        (4, t0, 8, "purchase", 12.0, "{}"),  # no view at all
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["event_id"]: r
        for r in join_asof_tolerance(spark, str(tmp_path)).collect()
    }
    assert got[2]["view_value_within_tol"] == 42.0
    assert got[2]["stale_view"] == 0 and got[2]["gap_s"] == 3600
    assert got[3]["view_value_within_tol"] is None
    assert got[3]["stale_view"] == 1 and got[3]["gap_s"] == 31 * 3600
    assert got[4]["view_value_within_tol"] is None
    assert got[4]["stale_view"] == 0 and got[4]["gap_s"] is None


def test_hash_uniformity_on_sequential_keys(spark, tmp_path):
    """Sequential integer keys — the adversarial case for weak hashes —
    must still bucket uniformly (p not tiny) and fill all 64 buckets."""
    from recommendation_system_big_data_spark.operators.sampling import (
        quality_hash_uniformity,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i, "click", 1.0, "{}")
        for i in range(6400)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = quality_hash_uniformity(spark, str(tmp_path)).collect()[0]
    assert r["n_keys"] == 6400 and r["n_filled"] == 64, r
    assert r["p_value"] > 0.001, r


def test_gauc_planted_orderings(spark, tmp_path):
    """User A ranks every purchase above every view (AUC 1), user B the
    reverse (AUC 0), equal pair counts → pooled and macro GAUC = 0.5;
    a third user with ties everywhere contributes exactly 0.5."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_gauc,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, k = [], 0

    def ev(u, typ, v):
        nonlocal k
        rows.append((k, t0 + datetime.timedelta(seconds=k), u, typ, v, "{}"))
        k += 1

    for i in range(3):
        ev(1, "purchase", 10.0 + i)
        ev(1, "view", 1.0 + i)
        ev(2, "purchase", 1.0 + i)
        ev(2, "view", 10.0 + i)
        ev(3, "purchase", 5.0)
        ev(3, "view", 5.0)
    _write_events(spark, str(tmp_path), rows)
    r = ml_eval_gauc(spark, str(tmp_path)).collect()[0]
    assert r["n_users_evaluable"] == 3 and r["n_pairs"] == 27, r
    assert r["gauc_micros"] == 500000, r
    assert r["macro_gauc_micros"] == 500000, r


def test_randomized_response_debias_recovers_truth(spark, tmp_path):
    """With enough users the debiased estimate lands near the true rate
    while the reported rate is pulled toward 1/2; ε = ln 3 at γ = 0.5."""
    from recommendation_system_big_data_spark.functions.quality import (
        privacy_randomized_response,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(4000):
        typ = "purchase" if u % 10 < 3 else "view"  # true rate 0.3
        rows.append((u, t0 + datetime.timedelta(seconds=u), u, typ, 1.0, "{}"))
    _write_events(spark, str(tmp_path), rows)
    r = privacy_randomized_response(spark, str(tmp_path)).collect()[0]
    assert r["true_rate"] == 0.3, r
    assert abs(r["debiased_rate"] - 0.3) < 0.05, r
    # reported rate sits between truth and 1/2, strictly shrunk
    assert 0.3 < r["reported_rate"] < 0.5, r
    assert abs(r["epsilon_local"] - math.log(3)) < 1e-6


def test_rich_club_complete_core(spark, tmp_path):
    """A 5-clique of hub parts plus pendant spokes: at k = 4 the rich
    set is exactly the clique (degree 5-6 for clique members via
    spokes) → φ = 1.0; pendants (degree 1) never enter any tier."""
    from recommendation_system_big_data_spark.operators.graph import (
        graph_rich_club_coefficient,
    )

    rows = []
    ok = 0
    # clique: every pair of parts 1..5 co-occurs in its own order
    for i in range(1, 6):
        for j in range(i + 1, 6):
            rows.append((ok, i))
            rows.append((ok, j))
            ok += 1
    # pendant spokes: part 100+i pairs once with clique member i
    for i in range(1, 6):
        rows.append((ok, i))
        rows.append((ok, 100 + i))
        ok += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).selectExpr(
        "l_orderkey", "l_partkey",
        "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(1.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount",
        "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag", "'O' AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {
        r["k"]: r
        for r in graph_rich_club_coefficient(spark, str(tmp_path)).collect()
    }
    # clique members have degree 5 (4 clique + 1 spoke) → rich at k=4
    assert got[4]["n_rich"] == 5 and got[4]["e_rich"] == 10, got[4]
    assert got[4]["phi_micros"] == 1000000, got[4]
    # at k=2 the rich set is still only the clique (pendants degree 1)
    assert got[2]["n_rich"] == 5 and got[2]["phi_micros"] == 1000000


def test_chi2_feature_selection_ranks_planted_signal(spark, tmp_path):
    """Label depends ONLY on the value bucket (purchases get value 190,
    views value 10) → value_bucket ranks first with a huge χ²; dow and
    hour4 carry no signal on this uniform layout."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_chi2_feature_selection,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(7 * 24 * 4):
        typ = "purchase" if i % 2 == 0 else "view"
        val = 190.0 if typ == "purchase" else 10.0
        rows.append(
            (i, t0 + datetime.timedelta(hours=i % (7 * 24)), i % 97,
             typ, val, "{}")
        )
    _write_events(spark, str(tmp_path), rows)
    got = {
        r["feature"]: r
        for r in ml_chi2_feature_selection(spark, str(tmp_path)).collect()
    }
    assert got["value_bucket"]["chi2_rank"] == 1, got
    assert got["value_bucket"]["p_value"] < 1e-6, got
    assert got["dow"]["chi2"] < 1.0 and got["hour4"]["chi2"] < 1.0, got


def test_rate_ratio_planted_double_rate(spark, tmp_path):
    """Weekday rate exactly 2× the weekend rate over 4 full weeks →
    rate_ratio = 2.0, CI excludes 1, p rejects."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_poisson_rate_ratio,
    )

    t0 = datetime.datetime(2024, 1, 1)  # Monday
    rows, k = [], 0
    for d in range(28):
        dow = (t0 + datetime.timedelta(days=d)).weekday()
        cnt = 40 if dow < 5 else 20
        for _ in range(cnt):
            rows.append(
                (k, t0 + datetime.timedelta(days=d), k % 9, "click", 1.0, "{}")
            )
            k += 1
    _write_events(spark, str(tmp_path), rows)
    r = stat_poisson_rate_ratio(spark, str(tmp_path)).collect()[0]
    assert r["weekday_days"] == 20 and r["weekend_days"] == 8, r
    assert r["rate_ratio"] == 2.0, r
    assert r["rr_ci95_lo"] > 1.0, r
    assert r["p_value"] < 1e-6, r


def test_anderson_darling_matches_sequential_reference(spark, tmp_path):
    """A² equals a sequential Python replica on a planted skewed
    series, and the planted heavy-skew series rejects."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_anderson_darling_normal,
    )

    t0 = datetime.datetime(1995, 1, 1)
    vals = [((7 * i + 3) % 23) ** 2 + 1.0 for i in range(40)]
    rows = [
        (i, i % 5, "F", vals[i], t0 + datetime.timedelta(days=i), "x")
        for i in range(40)
    ]
    _write_orders(spark, str(tmp_path), rows)
    r = stat_anderson_darling_normal(spark, str(tmp_path)).collect()[0]

    cents = sorted(round(v * 100) for v in vals)
    n = len(cents)
    m = sum(cents) / n
    s = math.sqrt(sum((c - m) ** 2 for c in cents) / (n - 1))
    total = 0.0
    for i, c in enumerate(cents, start=1):
        z = (c - m) / s
        phi = min(max(0.5 * (1 + math.erf(z / math.sqrt(2))), 1e-15),
                  1 - 1e-15)
        total += (2 * i - 1) * math.log(phi) + (
            2 * (n - i) + 1
        ) * math.log(1 - phi)
    a2_ref = -n - total / n
    assert abs(r["a2_stat"] - a2_ref) < 2e-3, (r["a2_stat"], a2_ref)
    assert r["reject_5pct"] == 1, r


def test_haar_energy_localizes_weekly_cycle(spark, tmp_path):
    """A pure period-8 square wave loads the scale-4 level (level 3:
    half-block sums differ maximally) and puts ZERO energy at level 1
    when adjacent days are always equal (period-8 with 2-day steps)."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_wavelet_haar_energy,
    )

    t0 = datetime.datetime(1995, 1, 1)
    rows = []
    for d in range(64):
        # 2-day plateaus, period 8: [hi hi hi hi lo lo lo lo] repeating
        v = 500.0 if (d % 8) < 4 else 100.0
        rows.append((d, d % 5, "F", v, t0 + datetime.timedelta(days=d), "x"))
    _write_orders(spark, str(tmp_path), rows)
    got = {
        r["level"]: r
        for r in ts_wavelet_haar_energy(spark, str(tmp_path)).collect()
    }
    # adjacent days within a plateau are equal → level-1 details are 0
    # except across the hi→lo boundary (t=3/4 pair is split hi|lo? no:
    # blocks are [0,1],[2,3],[4,5],[6,7] — all within-plateau) → 0
    assert got[1]["mean_energy_cents2"] == 0, got[1]
    # level 3 (blocks of 8) sees [4×hi | 4×lo] → maximal detail
    assert got[3]["mean_energy_cents2"] > 0
    assert got[3]["energy_share_milli"] >= 900, got
    # level 4 (blocks of 16) sees two full periods → sums cancel → 0
    assert got[4]["mean_energy_cents2"] == 0, got[4]


def test_ild_separates_tight_and_diverse_lists(spark, tmp_path):
    """Queries whose neighbors are near-copies score ILD ≈ 0; queries
    whose neighbors split across orthogonal directions score higher."""
    from recommendation_system_big_data_spark.operators.similarity import (
        sim_intra_list_diversity,
    )

    rows = []
    # DISJOINT support so each query only matches its own pool.
    # query 0 + pool A: +x huggers (near-copies → ILD ≈ 0)
    rows.append((0, [1.0] + [0.0] * 63, 0))
    for i in range(15):
        v = [1.0] + [0.0] * 63
        v[1] = 0.01 * (i + 1)
        rows.append((100 + i, v, 0))
    # query 1 + pool B: q1 spreads over dims 32-47, pool B are the unit
    # axes there → every pool-B pair is orthogonal (ILD = 1.0)
    q1 = [0.0] * 64
    for d in range(32, 48):
        q1[d] = 0.25
    rows.append((1, q1, 1))
    for i in range(15):
        v = [0.0] * 64
        v[32 + i] = 1.0
        rows.append((200 + i, v, 1))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {
        r["query_id"]: r
        for r in sim_intra_list_diversity(spark, str(tmp_path)).collect()
    }
    assert got[0]["n_pairs"] == 45 and got[1]["n_pairs"] == 45
    assert got[0]["ild_micros"] < 100000, got[0]
    # pool B pairs are exactly orthogonal → ILD 1.0
    assert got[1]["ild_micros"] == 1000000, got


def test_simhash_audit_floor_flag(spark, sf_dir):
    """The audit row carries the committed floor and a live pass flag
    (VERDICT r13 #6 convention) and measures a real recall."""
    from recommendation_system_big_data_spark.operators.dedup import (
        dedup_simhash_quality_audit,
    )

    r = dedup_simhash_quality_audit(spark, sf_dir).collect()[0].asDict()
    assert r["recall_floor_micros"] == 300000
    assert r["recall_ge_floor"] in (None, 1), r
    if r["n_true_pairs"]:
        assert r["recall_micros"] >= r["recall_floor_micros"], r


def test_brown_forsythe_robust_vs_outlier(spark, tmp_path):
    """Equal spreads with one wild outlier in a group: mean-centered
    Levene inflates (the outlier drags the group mean), median-centered
    Brown-Forsythe stays calmer — the defining robustness property."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_brown_forsythe,
        stat_levene_variance,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows, k = [], 0
    for typ in ("click", "view"):
        for i in range(60):
            jitter = ((i * 7 + 3) % 11 - 5) * 1.0
            rows.append(
                (k, t0 + datetime.timedelta(hours=i), k % 9, typ,
                 100.0 + jitter, "{}")
            )
            k += 1
    rows.append((k, t0, 1, "click", 100000.0, "{}"))  # one wild outlier
    _write_events(spark, str(tmp_path), rows)
    bf = stat_brown_forsythe(spark, str(tmp_path)).collect()[0]
    lv = stat_levene_variance(spark, str(tmp_path)).collect()[0]
    assert bf["k_groups"] == 2 and bf["n_total"] == 121
    assert abs(bf["w_milli"]) < abs(lv["w_milli"]), (bf, lv)


def test_sample_entropy_regular_vs_scrambled(spark, tmp_path):
    """A strictly periodic series has MANY length-3 template matches
    (low SampEn); an md5-scrambled series of the same values loses
    them (higher SampEn)."""
    import hashlib

    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_sample_entropy,
    )

    t0 = datetime.datetime(1995, 1, 1)
    period = [100.0, 200.0, 300.0, 400.0]
    reg = [
        (d, d % 5, "F", period[d % 4], t0 + datetime.timedelta(days=d), "x")
        for d in range(80)
    ]
    scr_vals = [
        100.0 + int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 300
        for d in range(80)
    ]
    scr = [
        (d, d % 5, "F", scr_vals[d], t0 + datetime.timedelta(days=d), "x")
        for d in range(80)
    ]
    sf_r, sf_s = str(tmp_path / "r"), str(tmp_path / "s")
    _write_orders(spark, sf_r, reg)
    _write_orders(spark, sf_s, scr)
    rr = ts_sample_entropy(spark, sf_r).collect()[0]
    rs = ts_sample_entropy(spark, sf_s).collect()[0]
    assert rr["sample_entropy"] == 0.0, rr  # periodic: A = B exactly
    assert rs["sample_entropy"] is None or rs["sample_entropy"] > 0.3, rs


def test_powerlaw_fit_on_planted_star_forest(spark, tmp_path):
    """A graph with degrees following d ∈ {1×many, high×few} yields a
    finite Hill alpha and a CCDF fit; sanity-pins the estimator wiring
    (exact alphas need a true continuum — this pins mechanics + NULLs)."""
    from recommendation_system_big_data_spark.operators.graph import (
        graph_powerlaw_degree_fit,
    )

    rows, ok = [], 0
    # hubs h=1..4 with degree 16/8/4/2 via pairwise orders to leaves
    hub_deg = {1: 16, 2: 8, 3: 4, 4: 2}
    leaf = 1000
    for h, d in hub_deg.items():
        for _ in range(d):
            rows.append((ok, h))
            rows.append((ok, leaf))
            leaf += 1
            ok += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).selectExpr(
        "l_orderkey", "l_partkey",
        "CAST(1.0 AS DOUBLE) AS l_quantity",
        "CAST(1.0 AS DOUBLE) AS l_extendedprice",
        "CAST(0.0 AS DOUBLE) AS l_discount",
        "CAST(0.0 AS DOUBLE) AS l_tax",
        "'N' AS l_returnflag", "'O' AS l_linestatus",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = graph_powerlaw_degree_fit(spark, str(tmp_path)).collect()[0]
    assert r["n_nodes"] == 30 + 4 and r["max_degree"] == 16, r
    assert r["hill_tail_n"] == 3, r  # hubs with degree >= 4
    assert r["alpha_hill"] is not None and r["alpha_hill"] > 1.0, r
    assert r["alpha_ccdf"] is not None and r["ccdf_fit_r2"] is not None
