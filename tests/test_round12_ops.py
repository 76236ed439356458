"""Round-12 session additions and ADVICE-fix regression tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_min_parallelism_declines_to_probe_below_shuffles(spark):
    """r11 ADVICE (catalog.py): probing df.rdd.getNumPartitions() below a
    shuffle finalizes the plan, bypasses AQE, and may mismatch runtime
    splits. The helper's contract is now leaf-scan-only: any plan with a
    shuffle-producing operator is returned UNCHANGED (same object)."""
    from recommendation_system_big_data_spark.catalog import min_parallelism

    base = spark.range(0, 100)
    for shuffled in (
        base.groupBy((F.col("id") % 3).alias("k")).count(),
        base.join(spark.range(0, 10), "id"),
        base.repartition(2),
        base.distinct(),
        base.orderBy("id"),
    ):
        assert min_parallelism(shuffled, spark) is shuffled


def test_min_parallelism_widens_narrow_leaf_scan(spark, sf_dir, tmp_path):
    """A 1-file leaf scan (1 split) must come back at >= session
    parallelism; an already-wide input must pass through untouched."""
    from recommendation_system_big_data_spark.catalog import min_parallelism

    p = str(tmp_path / "one")
    spark.range(0, 50).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    want = spark.sparkContext.defaultParallelism
    widened = min_parallelism(narrow, spark)
    assert widened.rdd.getNumPartitions() >= min(want, 50)

    wide = spark.read.parquet(p).repartition(want + 4)
    # shuffle-bearing: pass-through by contract
    assert min_parallelism(wide, spark) is wide


def test_ntile_integer_div_boundaries(spark):
    """r11 ADVICE (windows.py): tile assignment must be exact integral
    arithmetic. Check the remainder-split quartile math against
    F.ntile(4) ground truth at several n around the 4-boundary,
    including n < 4."""
    from pyspark.sql.window import Window

    for n in (1, 2, 3, 4, 5, 7, 8, 9, 101, 1000, 1003):
        df = spark.range(1, n + 1).select(F.col("id").alias("_r"))
        truth = df.withColumn(
            "t", F.ntile(4).over(Window.orderBy(F.asc("_r")))
        )
        q = n // 4
        rem = n % 4
        got = df.select(
            "_r",
            F.when(
                F.col("_r") <= rem * (q + 1),
                F.expr(f"(_r - 1) div ({q} + 1)") + 1,
            )
            .otherwise(rem + F.expr(f"(_r - {rem * (q + 1)} - 1) div {q}") + 1)
            .cast("int")
            .alias("t2"),
        )
        rows = {r["_r"]: r["t"] for r in truth.collect()}
        rows2 = {r["_r"]: r["t2"] for r in got.collect()}
        assert rows == rows2, f"n={n}: {rows} != {rows2}"


def test_window_ntile_dist_matches_builtin_ntile(spark, sf_dir):
    """The full operator (distributed prefix-sum rank + integer-div
    remainder split) must still be row-for-row identical to the
    single-window F.ntile(4) reference at fixture scale."""
    from pyspark.sql.window import Window

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.windows import (
        window_ntile_dist,
    )

    got = {
        r["o_orderkey"]: r["quartile"]
        for r in window_ntile_dist(spark, sf_dir).collect()
    }
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = {
        r["o_orderkey"]: r["q"]
        for r in load(spark, sf_dir, "orders")
        .select("o_orderkey", F.ntile(4).over(w).alias("q"))
        .collect()
    }
    assert got == want


def test_stump_hist_zero_range_corpus(spark, duck, tmp_path):
    """r11 ADVICE (ml_eval.py): a zero-range corpus (all values equal)
    must bin to 0 on BOTH engines instead of NaN-splitting. Plant a
    constant-value events table and require the Spark result to match
    the DuckDB oracle exactly."""
    import duckdb

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _STUMP_HIST_ORACLE,
        ml_decision_stump_hist,
    )
    from tests.conftest import assert_oracle_match

    rows = [
        (i, 100 + i, "purchase" if i % 3 == 0 else "click", 5.0)
        for i in range(40)
    ]
    sf = str(tmp_path / "flat")
    spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    ).write.parquet(sf + "/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    sdf = ml_decision_stump_hist(spark, sf)
    # Both engines must agree (the pre-fix Spark plan NaN-binned and
    # diverged from DuckDB here). A zero-range corpus collapses to one
    # bin, so no split with n_right > 0 exists: the agreed result is
    # EMPTY — the guard's job is cross-engine agreement, not inventing
    # a split.
    assert_oracle_match(sdf, con, _STUMP_HIST_ORACLE, "stump_hist_zero_range")
    assert sdf.count() == 0
    con.close()


def test_stream_batch_equiv_gate_fires(spark):
    """The in-query stream/batch equivalence gate must raise on any
    multiset divergence (extra, missing, or multiplicity-changed rows),
    and stay silent on a permuted-but-equal pair."""
    import pytest

    from recommendation_system_big_data_spark.streaming.jobs import (
        _assert_stream_batch_equiv,
    )

    a = spark.createDataFrame([(1, 10.0), (2, 20.0), (2, 20.0)], "k long, v double")
    same_permuted = spark.createDataFrame(
        [(2, 20.0), (2, 20.0), (1, 10.0)], "k long, v double"
    )
    _assert_stream_batch_equiv(a, same_permuted, "equal")

    dup_dropped = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    with pytest.raises(ValueError, match="divergence"):
        _assert_stream_batch_equiv(a, dup_dropped, "multiplicity")
    with pytest.raises(ValueError, match="divergence"):
        _assert_stream_batch_equiv(dup_dropped, a, "missing")


def test_als_rmse_band_gate_fires():
    """recommend.RMSE_BAND is enforced in-query: out-of-band RMSE must be
    a loud ValueError, not a green 1-row frame (VERDICT r11 #7). Pure
    band-logic check via the module constant."""
    from recommendation_system_big_data_spark.operators.recommend import (
        RMSE_BAND,
    )

    lo, hi = RMSE_BAND
    assert lo == 0.0 and hi == 3.0


def test_brier_exact_in_the_wrap_domain(spark, tmp_path):
    """VERDICT r11 #5, the Brier mirror of the planted ANOVA wrap test
    (ee1aa1e): the reliability term squares the bin's forecast-outcome
    gap d = q_k − 1e6·y_k, and with 4000 max-score negatives in one bin
    d² = 1.6e19 crosses 2^63 — the exact domain where the pre-r11 long
    math wrapped (ADVICE r10; fix 0191e9d/28eb903 moved the terms to
    DECIMAL). Require cross-engine agreement with DuckDB's HUGEINT
    oracle AND a big-int sequential replay."""
    import duckdb

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _BRIER_ORACLE,
        ml_eval_brier_decomposition,
    )

    rows = []
    for i in range(4000):  # bin 9: q = 1e6 each, y = 0 → d = 4e9
        rows.append((i, 1, "click", 100.0, None))
    for i in range(4000, 4030):  # bin 0: low-score positives
        rows.append((i, 2, "purchase", 5.0, None))
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double,"
        " ts timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = ml_eval_brier_decomposition(spark, str(tmp_path)).collect()[0]

    # wrap-domain sanity: the planted top bin's d² really exceeds 2^63
    d_top = 4000 * 1000000
    assert d_top * d_top > 2**63, "planted frame left the wrap domain"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{tmp_path}/events.parquet/*.parquet'"
    )
    oracle = con.execute(_BRIER_ORACLE).fetchall()[0]
    assert tuple(got) == tuple(oracle), (tuple(got), tuple(oracle))

    # big-int sequential replay of the quantized decomposition
    mv = 100.0
    scored = [
        (int((v / mv) * 1000000), 1 if t == "purchase" else 0)
        for _, _, t, v, _ in rows
    ]
    bins: dict[int, list[tuple[int, int]]] = {}
    for q, y in scored:
        bins.setdefault(min((q * 10) // 1000000, 9), []).append((q, y))
    n = len(scored)
    ypos = sum(y for _, y in scored)
    sq = sum((q - 1000000 * y) ** 2 for q, y in scored)
    def tdiv(a: int, b: int) -> int:
        """SQL `div`: integral quotient truncating toward zero (Python
        // floors, which differs on negative numerators)."""
        q, r = divmod(a, b)
        return q + 1 if q < 0 and r != 0 else q

    rel = res = 0
    for members in bins.values():
        n_k = len(members)
        q_k = sum(q for q, _ in members)
        y_k = sum(y for _, y in members)
        d = q_k - 1000000 * y_k
        rel += tdiv(d * d, n_k * 1000 * n)
        m_k = tdiv((y_k * n - ypos * n_k) * 1000000, n * n_k)
        res += tdiv(n_k * m_k * m_k, 1000 * n)
    assert got["n_total"] == n and got["n_pos"] == ypos
    assert got["brier_nanos"] == sq // (1000 * n)
    assert got["reliability_nanos"] == rel
    assert got["resolution_nanos"] == res
    assert got["uncertainty_nanos"] == (((ypos * (n - ypos)) // n) * 10**9) // n
    con.close()


def test_decimal38_overflow_is_loud_not_a_wrap(spark):
    """VERDICT r11 #5, the DECIMAL(38) edge itself: the exact s²
    expressions ANOVA and Brier ride (CAST(x*x AS DECIMAL(38,0)))
    must ERROR past 38 digits — never wrap, never silently null. The
    engine pins spark.sql.ansi.enabled=true (session.RUNTIME_CONF) so
    this holds under driver-owned sessions too."""
    import pytest

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    # 1e19 → square is 1e38, one past DECIMAL(38,0)'s 10^38 − 1 max
    edge = spark.createDataFrame(
        [("10000000000000000000",)], "s string"
    ).select(F.expr("CAST(s AS DECIMAL(20,0)) AS sg"))
    with pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        edge.select(F.expr("CAST(sg * sg AS DECIMAL(38,0)) AS s2")).collect()

    # just inside the budget: (1e19 − 1)² has 38 digits and must be exact
    inside = spark.createDataFrame(
        [("9999999999999999999",)], "s string"
    ).select(F.expr("CAST(s AS DECIMAL(20,0)) AS sg"))
    [row] = inside.select(
        F.expr("CAST(sg * sg AS DECIMAL(38,0)) AS s2")
    ).collect()
    assert int(row["s2"]) == 9999999999999999999**2


def test_assortativity_basket_cap_bites_on_pathological_order(spark, tmp_path):
    """VERDICT r11 #4: pin graph_assortativity's capped co-purchase
    self-join. One planted 100-part bot order must contribute only
    C(32,2) = 496 edges (the MAX_BASKET cap), not C(100,2) = 4950 — and
    the capped semantics must agree cross-engine with the oracle's
    identically-capped SQL on the same planted frame."""
    import duckdb

    from recommendation_system_big_data_spark.operators.graph import (
        MAX_BASKET,
        _ASSORT_ORACLE,
        graph_assortativity,
    )

    rows = [(1, p, 1) for p in range(1000, 1100)]  # 100 distinct parts
    rows += [(2, 5000, 1), (2, 5001, 1)]  # a normal 2-part order
    rows += [(3, 5001, 1), (3, 5002, 1)]  # chains through part 5001
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = graph_assortativity(spark, str(tmp_path)).collect()[0]

    # cap math: the bot order survives as its 32 smallest part keys →
    # C(32,2) edges; the two normal orders add 2 more.
    want_edges = MAX_BASKET * (MAX_BASKET - 1) // 2 + 2
    assert got["n_edges"] == want_edges, got
    assert got["n_nodes"] == MAX_BASKET + 3

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"'{tmp_path}/lineitem.parquet/*.parquet'"
    )
    oracle = con.execute(_ASSORT_ORACLE).fetchall()[0]
    assert tuple(got) == tuple(oracle), (tuple(got), tuple(oracle))
    con.close()


def test_funnel_gap_excludes_out_of_window_steps(spark, tmp_path):
    """funnel_window_gap must stop counting a step that falls outside
    FUNNEL_STEP_GAP_US of the previous matched step (the whole point of
    the windowFunnel variant vs funnel_conversion)."""
    from datetime import datetime, timedelta

    from recommendation_system_big_data_spark.operators.windows import (
        funnel_window_gap,
    )

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    h = timedelta(hours=1)
    rows = [
        # user 1: purchase 13h after the click → outside the 12h gap → stage 2
        (1, t0, 1, "view", 1.0, None),
        (2, t0 + h, 1, "click", 1.0, None),
        (3, t0 + 14 * h, 1, "purchase", 1.0, None),
        # user 2: all steps inside the gap → stage 3
        (4, t0, 2, "view", 1.0, None),
        (5, t0 + h, 2, "click", 1.0, None),
        (6, t0 + 2 * h, 2, "purchase", 1.0, None),
        # user 3: click 13h after the first view → stage 1
        (7, t0, 3, "view", 1.0, None),
        (8, t0 + 13 * h, 3, "click", 1.0, None),
        # user 4: no funnel event at all → stage 0
        (9, t0, 4, "error", 1.0, None),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["funnel_stage"]: r["n_users"]
        for r in funnel_window_gap(spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}, got


def test_rake_sequential_replica(spark, sf_dir):
    """Pure-Python RAKE over the fixture corpus must reproduce the
    query's top-k exactly (scores, ordering, ties)."""
    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.functions.text import (
        RAKE_TOP_K,
        STOPWORDS,
        text_rake_keywords,
    )

    freq: dict[str, int] = {}
    degree: dict[str, int] = {}
    for r in load(spark, sf_dir, "documents").select("text").collect():
        phrase: list[str] = []
        for tok in r["text"].split(" ") + [""]:  # sentinel flushes the tail
            if tok in STOPWORDS or tok == "":
                for w in phrase:
                    freq[w] = freq.get(w, 0) + 1
                    degree[w] = degree.get(w, 0) + len(phrase)
                phrase = []
            else:
                phrase.append(tok)
    want = sorted(
        (
            (w, freq[w], degree[w], (1000000 * degree[w]) // freq[w])
            for w in freq
        ),
        key=lambda t: (-t[3], t[0]),
    )[:RAKE_TOP_K]
    got = [
        (r["word"], r["freq"], r["degree"], r["rake_micros"])
        for r in text_rake_keywords(spark, sf_dir).collect()
    ]
    assert got == want, (got[:5], want[:5])


def test_link_prediction_planted_square(spark, tmp_path):
    """4-cycle co-purchase graph p1–p2–p3–p4–p1: the two diagonals are
    the only non-edges, each with both neighbors shared → Jaccard 1.0
    exactly; no other pair may appear."""
    from recommendation_system_big_data_spark.operators.graph import (
        graph_jaccard_link_prediction,
    )

    # two 2-part orders per cycle edge (LINKPRED_MIN_SUPPORT = 2), plus
    # one single-co-occurrence noise pair that must NOT become an edge
    rows = []
    o = 0
    for x, y in [(1, 2), (2, 3), (3, 4), (4, 1)]:
        for _ in range(2):
            o += 1
            rows += [(o, x, 1), (o, y, 1)]
    rows += [(o + 1, 1, 1), (o + 1, 9, 1)]  # support-1 noise: no edge
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_quantity long"
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))

    got = [
        (r["part_u"], r["part_v"], r["common_neighbors"], r["jaccard_micros"])
        for r in graph_jaccard_link_prediction(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3, 2, 1000000), (2, 4, 2, 1000000)], got


# ---------------------------------------------------------------------------
# r12 session additions (batch 2): nonparametric k-group test, normality
# gate, proper-scoring-rule eval, conformal intervals, seasonality detector.
# ---------------------------------------------------------------------------


def test_kruskal_wallis_sequential_reference(spark, sf_dir):
    """Big-int replay of the exact midrank + micro-quantized deviation
    algebra on the same events, down to the shared double exit."""
    from collections import Counter, defaultdict

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_kruskal_wallis,
    )

    rows = load(spark, sf_dir, "events").select("value", "event_type").collect()
    c = Counter(r["value"] for r in rows)
    cg = Counter((r["value"], r["event_type"]) for r in rows)
    cum, cum_before = 0, {}
    for v in sorted(c):
        cum_before[v] = cum
        cum += c[v]
    n_g, rs2 = defaultdict(int), defaultdict(int)
    for (v, g), k in cg.items():
        n_g[g] += k
        rs2[g] += k * (2 * cum_before[v] + c[v] + 1)
    n = sum(n_g.values())
    kk = len(n_g)
    s_q = 0
    for g in n_g:
        d2 = rs2[g] - n_g[g] * (n + 1)
        m = (-((-d2 * 1000000) // (n_g[g] * (n + 1)))
             if d2 < 0 else (d2 * 1000000) // (n_g[g] * (n + 1)))
        s_q += n_g[g] * m * m
    t3 = sum(x * x * x - x for x in c.values())
    h = 3.0 * (float(n) + 1.0) * float(s_q) / (float(n) * 1e12)
    n3 = n * n * n - n
    h_adj = h * float(n3) / float(n3 - t3)

    r = stat_kruskal_wallis(spark, sf_dir).collect()[0]
    assert r["k_groups"] == kk and r["n_total"] == n
    assert abs(r["h_stat"] - round(h, 4)) < 1e-9
    assert abs(r["h_tie_adj"] - round(h_adj, 4)) < 1e-9
    assert abs(r["eps_sq"] - round(h_adj / (float(n) - 1.0), 6)) < 1e-9


def test_kruskal_wallis_planted_two_group_equals_mwu_z2(spark, tmp_path):
    """For k=2 the Kruskal–Wallis H equals the squared Mann–Whitney z
    (both are the same rank statistic) — a planted cross-operator
    identity check, within the micro-quantization budget."""
    import math
    import random

    rng = random.Random(7)
    evs = []
    for i in range(400):
        g = "click" if i % 2 == 0 else "purchase"
        base = 10.0 if g == "click" else 12.0
        evs.append(
            (i, None, i, g, round(base + rng.random() * 5, 2), "{}")
        )
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    evs = [
        (e[0], t0 + datetime.timedelta(minutes=e[0]), e[2], e[3], e[4], e[5])
        for e in evs
    ]
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_kruskal_wallis,
        stat_mann_whitney,
    )

    h = stat_kruskal_wallis(spark, str(tmp_path)).collect()[0]
    z = stat_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert h["k_groups"] == 2
    assert math.isclose(h["h_tie_adj"], z["z_stat"] ** 2, rel_tol=5e-3)


def test_jarque_bera_sequential_reference(spark, sf_dir):
    """Moment replay per group; also JB >= 0 and p = exp(-JB/2)."""
    import math
    from collections import defaultdict

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_jarque_bera,
    )

    vals = defaultdict(list)
    for r in load(spark, sf_dir, "events").select("event_type", "value").collect():
        vals[r["event_type"]].append(r["value"])

    got = {r["event_type"]: r for r in stat_jarque_bera(spark, sf_dir).collect()}
    assert set(got) == set(vals)
    for g, xs in vals.items():
        n = len(xs)
        m = sum(xs) / n
        m2 = sum((x - m) ** 2 for x in xs) / n
        m3 = sum((x - m) ** 3 for x in xs) / n
        m4 = sum((x - m) ** 4 for x in xs) / n
        g1 = m3 / m2**1.5
        g2 = m4 / m2**2 - 3
        jb = n * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
        r = got[g]
        assert r["n"] == n
        assert abs(r["skew_g1"] - g1) < 1e-3
        assert abs(r["kurt_excess"] - g2) < 1e-3
        assert r["jb_stat"] >= 0
        assert abs(r["jb_stat"] - jb) < max(1e-2, abs(jb) * 1e-5)
        assert abs(r["p_chi2_df2"] - math.exp(-jb / 2.0)) < 1e-5


def test_log_loss_sequential_reference(spark, sf_dir):
    """Per-row replay of the clipped cross-entropy plus the skill
    identity 1 - LL/H(pbar)."""
    import math

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_log_loss,
    )

    rows = load(spark, sf_dir, "events").select("value", "event_type").collect()
    mv = max(r["value"] for r in rows)
    loss = pos = 0.0
    for r in rows:
        qc = min(max(int(math.floor(r["value"] / mv * 1000000.0)), 100), 999900)
        y = 1 if r["event_type"] == "purchase" else 0
        p = qc / 1000000.0
        loss += -math.log(p) if y else -math.log(1.0 - p)
        pos += y
    n = len(rows)
    pbar = pos / n
    base = -pbar * math.log(pbar) - (1 - pbar) * math.log(1 - pbar)

    got = ml_eval_log_loss(spark, sf_dir).collect()[0]
    assert got["n_total"] == n and got["n_pos"] == pos
    assert abs(got["mean_log_loss"] - loss / n) < 1e-5
    assert abs(got["baseline_entropy"] - base) < 1e-5
    assert abs(got["skill_score"] - (1 - (loss / n) / base)) < 1e-4


def test_conformal_sequential_reference(spark, sf_dir):
    """Exact integer replay: md5 buckets, truncating model means, the
    ceil((n+1)*0.9) order statistic, and the coverage rational."""
    import hashlib
    import math
    from collections import defaultdict

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_conformal_interval,
    )

    rows = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()

    def bucket(eid):
        return int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16) % 10

    tr_s, tr_n = defaultdict(int), defaultdict(int)
    cal, test = [], []
    for r in rows:
        vm = int(math.floor(r["value"] * 1000000.0))
        b = bucket(r["event_id"])
        if b < 6:
            tr_s[r["event_type"]] += vm
            tr_n[r["event_type"]] += 1
        elif b < 8:
            cal.append((r["event_type"], vm))
        else:
            test.append((r["event_type"], vm))
    pred = {g: tr_s[g] // tr_n[g] for g in tr_s}
    cal_r = sorted(abs(vm - pred[g]) for g, vm in cal if g in pred)
    n_cal = len(cal_r)
    k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
    qhat = cal_r[k - 1]
    test_r = [abs(vm - pred[g]) for g, vm in test if g in pred]
    covered = sum(1 for r_ in test_r if r_ <= qhat)

    got = ml_conformal_interval(spark, sf_dir).collect()[0]
    assert got["n_cal"] == n_cal
    assert got["n_test"] == len(test_r)
    assert got["qhat_micros"] == qhat
    assert got["nominal_micros"] == 900000
    assert got["coverage_micros"] == covered * 1000000 // len(test_r)
    # the distribution-free guarantee should roughly hold on iid data
    assert got["coverage_micros"] > 800000


def test_periodogram_planted_pure_cosine(spark, tmp_path):
    """A planted 24h-cosine volume series: the 24h line captures ~all the
    centered energy; every other probe period (all orthogonal over the
    336h window) stays near zero."""
    import datetime
    import math

    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_periodogram_dft,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    eid = 0
    for h in range(336):  # 14 days, divisible by every probe period
        cnt = 10 + round(6 * math.cos(2 * math.pi * h / 24))
        for j in range(cnt):
            evs.append(
                (eid, t0 + datetime.timedelta(hours=h, seconds=j), eid,
                 "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(4).write.parquet(str(tmp_path / "events.parquet"))

    got = {
        r["period_hours"]: r["power_ratio"]
        for r in ts_periodogram_dft(spark, str(tmp_path)).collect()
    }
    assert set(got) == {6, 8, 12, 24, 48, 84, 168}
    assert got[24] > 0.97
    for p, ratio in got.items():
        if p != 24:
            assert ratio < 0.03, (p, ratio)


def test_cochran_armitage_sequential_reference(spark, sf_dir):
    """Integer replay of the trend z from per-dose sufficient stats."""
    import math
    from collections import defaultdict

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_cochran_armitage,
    )

    n_k, r_k = defaultdict(int), defaultdict(int)
    for row in load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).collect():
        w = int(row["o_orderpriority"][0])
        n_k[w] += 1
        r_k[w] += 1 if row["o_orderstatus"] == "F" else 0
    n = sum(n_k.values())
    r = sum(r_k.values())
    swr = sum(w * r_k[w] for w in n_k)
    swn = sum(w * n_k[w] for w in n_k)
    swwn = sum(w * w * n_k[w] for w in n_k)
    num = n * swr - r * swn
    vnum = n * swwn - swn * swn
    z = float(num) / math.sqrt(float(r) * float(n - r) * float(vnum) / float(n))

    got = stat_cochran_armitage(spark, sf_dir).collect()[0]
    assert got["k_doses"] == len(n_k)
    assert got["n_total"] == n and got["n_pos"] == r
    assert abs(got["z_trend"] - round(z, 4)) < 1e-9


def test_theil_sen_planted_outlier_immunity(spark, tmp_path):
    """A perfectly linear daily series (+200 cents/day) with one wrecked
    day: every clean pair's quantized slope is exactly 2e8 micro-units,
    and the median shrugs off the outlier day's 28 contaminated pairs."""
    import datetime

    from recommendation_system_big_data_spark.operators.stats_tests import (
        agg_theil_sen_slope,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    evs = []
    for d in range(15):
        val = 10.0 + 2.0 * d if d != 7 else 999.0
        evs.append(
            (d, t0 + datetime.timedelta(days=d), d, "click", val, "{}")
        )
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    got = agg_theil_sen_slope(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["event_type"] == "click"
    assert r["n_pairs"] == 105
    assert r["sen_slope_micros"] == 200000000.0


def test_dp_laplace_sequential_reference(spark, sf_dir):
    """md5-seeded inverse-CDF replay; determinism across invocations;
    noise bounded by the ln tail at the 1e-6 u-grid."""
    import hashlib
    import math

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.functions.quality import (
        privacy_dp_count_laplace,
    )

    true_n = {
        r["event_type"]: r["n"]
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    got1 = {
        r["event_type"]: r for r in privacy_dp_count_laplace(spark, sf_dir).collect()
    }
    got2 = {
        r["event_type"]: r["noisy_count"]
        for r in privacy_dp_count_laplace(spark, sf_dir).collect()
    }
    assert set(got1) == set(true_n)
    for g, row in got1.items():
        h = int(hashlib.md5(f"dp-v1:{g}".encode()).hexdigest()[:8], 16)
        u = (float(h % 1000000) + 0.5) / 1000000.0 - 0.5
        noise = -1.0 * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))
        assert abs(row["noisy_count"] - (true_n[g] + noise)) < 1e-3
        assert row["noisy_count"] == got2[g]  # deterministic release
        assert row["epsilon_micros"] == 1000000 and row["sensitivity"] == 1
        # the 1e-6 u-grid bounds |noise| at ln(1e6)/eps ~ 13.8
        assert abs(row["noisy_count"] - true_n[g]) < 14.0


def test_hampel_planted_spike(spark, tmp_path):
    """A flat stream (MAD 0) flags the spike and nothing else; a clean
    alternating stream under the same threshold flags nothing."""
    import datetime

    from recommendation_system_big_data_spark.operators.windows import (
        window_hampel_filter,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i in range(30):
        # user 1: flat at 10 except a spike at i=25
        evs.append(
            (i, t0 + datetime.timedelta(minutes=i), 1, "click",
             100.0 if i == 25 else 10.0, "{}")
        )
        # user 2: benign period-3 cycle 10/11/12 — every frame's MAD is
        # 1 (a two-value alternation would hit the MAD=0 degeneracy and
        # legitimately flag all of it), so nothing crosses 4.45·MAD
        evs.append(
            (100 + i, t0 + datetime.timedelta(minutes=i), 2, "click",
             10.0 + float(i % 3), "{}")
        )
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    rows = window_hampel_filter(spark, str(tmp_path)).collect()
    flagged = {r["event_id"] for r in rows if r["is_outlier"] == 1}
    assert flagged == {25}
    # frames after the spike contain it but the MEDIAN shrugs it off
    u1_after = [r for r in rows if r["user_id"] == 1 and r["event_id"] > 25]
    assert all(r["frame_median"] == 10.0 for r in u1_after)


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    """The SQL UDF must be an expression template, not a black box: no
    Python evaluation node in the plan, and the result is identical to
    writing the expressions inline through the DataFrame API."""
    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.sql_surface import (
        sql_scalar_udf,
    )
    from recommendation_system_big_data_spark.plans import explain

    df = sql_scalar_udf(spark, sf_dir)
    plan = explain.physical_plan(df)
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan, plan
    assert "HashAggregate" in plan, plan

    inline = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.expr(
                    "CAST(CAST(l_extendedprice AS DECIMAL(18,2))"
                    " * (1 - CAST(l_discount AS DECIMAL(18,2)))"
                    " * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(28,6))"
                )
            )
            .cast("decimal(28,6)")
            .cast("double")
            .alias("net_revenue"),
            F.sum(
                F.expr(
                    "CASE WHEN CAST(conv(substr(md5(CAST(l_orderkey AS STRING)),"
                    " 1, 8), 16, 10) AS BIGINT) % 5 = 0 THEN 1 ELSE 0 END"
                )
            ).alias("holdout_items"),
        )
    )
    got = {r["l_returnflag"]: (r["n_items"], r["net_revenue"], r["holdout_items"])
           for r in df.collect()}
    want = {r["l_returnflag"]: (r["n_items"], r["net_revenue"], r["holdout_items"])
            for r in inline.collect()}
    assert got == want


def test_capture_recapture_planted(spark, tmp_path):
    """Planted two-window census: 5 users in both halves, 3 only in the
    first, 2 only in the second -> Chapman (9*8)//6 - 1 = 11 vs true 10,
    signed error +100000 micro."""
    import datetime

    from recommendation_system_big_data_spark.operators.profile import (
        stat_capture_recapture,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs, eid = [], 0

    def add(uid, day):
        nonlocal eid
        evs.append(
            (eid, t0 + datetime.timedelta(days=day, hours=1), uid, "click",
             1.0, "{}")
        )
        eid += 1

    for u in range(1, 6):      # both halves
        add(u, 2)
        add(u, 7)
    for u in range(6, 9):      # first half only
        add(u, 1)
    for u in range(9, 11):     # second half only
        add(u, 8)
    add(1, 0)                  # pin the span to days 0..9 (mid = 5)
    add(2, 9)
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    r = stat_capture_recapture(spark, str(tmp_path)).collect()[0]
    assert (r["n1"], r["n2"], r["n_both"]) == (8, 7, 5)
    assert r["true_distinct"] == 10
    assert r["chapman_estimate"] == 11
    assert r["err_micros"] == 100000


def test_lsh_quality_audit_planted(spark, tmp_path):
    """Exact-duplicate pairs are ALWAYS bucketed together (identical
    signatures), so planted exact dups force recall = 1e6; a planted
    low-similarity pair exercises the verify filter. All three ratios
    must equal their integer definitions on the returned counts."""
    import random

    from recommendation_system_big_data_spark.operators.dedup import (
        dedup_lsh_quality_audit,
    )

    rng = random.Random(42)
    docs = []
    did = 0
    for k in range(6):  # 6 exact-duplicate pairs
        text = " ".join(f"w{k}x{rng.randrange(1000)}" for _ in range(30))
        for _ in range(2):
            docs.append((did, text, "en", "s", len(text)))
            did += 1
    for k in range(8):  # unique background docs
        text = " ".join(f"u{k}y{rng.randrange(100000)}" for _ in range(30))
        docs.append((did, text, "en", "s", len(text)))
        did += 1
    # one low-J pair (~1/3 overlap, below the 0.5 threshold): bands may
    # or may not bucket it; the verify stage must never emit it
    base = [f"z{i}" for i in range(30)]
    tail = [f"q{i}" for i in range(30)]
    docs.append((did, " ".join(base + tail[:5]), "en", "s", 0)); did += 1
    docs.append((did, " ".join(base[:15] + tail), "en", "s", 0)); did += 1

    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.parquet(str(tmp_path / "documents.parquet"))

    r = dedup_lsh_quality_audit(spark, str(tmp_path)).collect()[0]
    assert r["n_true_pairs"] >= 6
    assert r["recall_micros"] == 1000000  # exact dups can't be missed
    assert r["n_hit"] <= min(r["n_true_pairs"], r["n_detected_pairs"])
    assert r["n_detected_pairs"] <= r["n_candidates"]
    assert r["recall_micros"] == r["n_hit"] * 1000000 // r["n_true_pairs"]
    assert r["precision_micros"] == r["n_hit"] * 1000000 // r["n_detected_pairs"]
    assert (
        r["verify_survival_micros"]
        == r["n_detected_pairs"] * 1000000 // r["n_candidates"]
    )


def test_ann_recall_audit_matches_direct_recompute(spark, sf_dir):
    """The audit row must equal a per-query python recompute over the
    same two deterministic queries (incl. zero-overlap restoration)."""
    from collections import defaultdict

    from recommendation_system_big_data_spark.operators.similarity import (
        TOP_K,
        sim_ann_recall_audit,
        sim_topk_bruteforce,
        sim_topk_ivf,
    )

    truth = defaultdict(set)
    for r in sim_topk_bruteforce(spark, sf_dir).collect():
        truth[r["query_id"]].add(r["neighbor_id"])
    ann = defaultdict(set)
    for r in sim_topk_ivf(spark, sf_dir).collect():
        ann[r["query_id"]].add(r["neighbor_id"])
    hits = {q: len(truth[q] & ann.get(q, set())) for q in truth}
    n_q = len(truth)
    n_hits = sum(hits.values())

    got = sim_ann_recall_audit(spark, sf_dir).collect()[0]
    assert got["n_queries"] == n_q and got["k"] == TOP_K
    assert got["n_hits"] == n_hits
    assert got["mean_recall_micros"] == n_hits * 1000000 // (n_q * TOP_K)
    assert got["worst_query_recall_micros"] == min(hits.values()) * 1000000 // TOP_K
    assert got["n_imperfect_queries"] == sum(1 for h in hits.values() if h < TOP_K)


def test_fairness_gaps_sequential_reference(spark, sf_dir):
    """Integer replay of the per-segment rates and the window gaps."""
    from collections import defaultdict
    from decimal import Decimal

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_fairness_gaps,
    )

    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in load(spark, sf_dir, "customer").collect()
    }
    rows = [
        (
            seg[r["o_custkey"]],
            int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100),
            1 if r["o_orderstatus"] == "F" else 0,
        )
        for r in load(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice", "o_orderstatus")
        .collect()
    ]
    thr = sum(c for _, c, _ in rows) // len(rows)
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, pred, pos, tp, fp
    for g, c, y in rows:
        p = 1 if c > thr else 0
        st = per[g]
        st[0] += 1
        st[1] += p
        st[2] += y
        st[3] += p * y
        st[4] += p * (1 - y)
    rates = {
        g: (
            st[1] * 1000000 // st[0],
            st[3] * 1000000 // st[2],
            st[4] * 1000000 // (st[0] - st[2]),
        )
        for g, st in per.items()
    }
    sel = [v[0] for v in rates.values()]
    tpr = [v[1] for v in rates.values()]
    fpr = [v[2] for v in rates.values()]

    got = {r["segment"]: r for r in ml_eval_fairness_gaps(spark, sf_dir).collect()}
    assert set(got) == set(rates)
    for g, (s, t, f) in rates.items():
        r = got[g]
        assert (r["selection_micros"], r["tpr_micros"], r["fpr_micros"]) == (s, t, f)
        assert r["parity_gap_micros"] == max(sel) - min(sel)
        assert r["tpr_gap_micros"] == max(tpr) - min(tpr)
        assert r["fpr_gap_micros"] == max(fpr) - min(fpr)


def test_bridge_allocation_conserves_and_allocates_exactly(spark, sf_dir, tmp_path):
    """Conservation identity on the real fixture (allocated + dust ==
    total order cents over orders with lines) plus a planted 1-order
    exact-arithmetic check including the truncation dust."""
    from decimal import Decimal

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.olap import (
        olap_bridge_allocation,
    )

    rows = olap_bridge_allocation(spark, sf_dir).collect()
    total_alloc = sum(r["allocated_cents"] for r in rows)
    li_orders = {
        r["l_orderkey"]
        for r in load(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    }
    total_cents = sum(
        int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        for r in load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
        if r["o_orderkey"] in li_orders
    )
    assert total_alloc == total_cents
    dust = [r for r in rows if r["brand"] == "(rounding dust)"]
    assert len(dust) == 1 and 0 <= dust[0]["allocated_cents"] < len(li_orders) * 100

    # planted: order 777.77 over lines 1.00 / 2.00 / 4.00 -> shares 1/7,
    # 2/7, 4/7 of 77777 cents truncate to 11111, 22222, 44444; dust 0
    import datetime

    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.00, 0.0, 0.0, "N", "O",
          datetime.date(2024, 1, 2)),
         (1, 2, 1, 2, 1.0, 2.00, 0.0, 0.0, "N", "O",
          datetime.date(2024, 1, 2)),
         (1, 3, 1, 3, 1.0, 4.00, 0.0, 0.0, "N", "O",
          datetime.date(2024, 1, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1, "O", 777.77, datetime.date(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "pa", "BrandA", "t", 1, 1.0),
         (2, "pb", "BrandB", "t", 1, 1.0),
         (3, "pc", "BrandC", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(tmp_path / "part.parquet"))

    got = {
        r["brand"]: r["allocated_cents"]
        for r in olap_bridge_allocation(spark, str(tmp_path)).collect()
    }
    assert got == {
        "BrandA": 11111,
        "BrandB": 22222,
        "BrandC": 44444,
        "(rounding dust)": 0,
    }


def test_qini_auuc_sequential_reference(spark, sf_dir):
    """Big-int replay of the full Qini pipeline: md5 coin, distinct-score
    blocks, cumulative series, bounded-quotient rates, sign-split area."""
    import hashlib
    import math
    from collections import defaultdict

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_qini_auuc,
    )

    rows = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    mv = max(r["value"] for r in rows)
    blocks = defaultdict(lambda: [0, 0, 0, 0])
    for r in rows:
        q = int(math.floor(r["value"] / mv * 1000000.0))
        t = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:8], 16) % 2 == 0
        y = 1 if r["event_type"] == "purchase" else 0
        b = blocks[q]
        if t:
            b[0] += 1
            b[1] += y
        else:
            b[2] += 1
            b[3] += y
    n = sum(b[0] + b[2] for b in blocks.values())
    n_treat = sum(b[0] for b in blocks.values())
    n_ctrl = sum(b[2] for b in blocks.values())
    nt = yt = nc = yc = 0
    area_raw = 0
    endpoint = None
    for q in sorted(blocks, reverse=True):
        b = blocks[q]
        nt += b[0]; yt += b[1]; nc += b[2]; yc += b[3]
        rate = (yt * 10**9) // n - (
            0 if nc == 0 else (yc * nt * 10**9) // (nc * n)
        )
        area_raw += rate * (b[0] + b[2])
        if nt + nc == n:
            endpoint = rate
    auuc = -((-area_raw) // n) if area_raw < 0 else area_raw // n

    got = ml_eval_qini_auuc(spark, sf_dir).collect()[0]
    assert got["n_treat"] == n_treat and got["n_ctrl"] == n_ctrl
    assert got["endpoint_nanos"] == endpoint
    assert got["auuc_nanos"] == auuc
    assert got["qini2_nanos"] == 2 * auuc - endpoint


def test_qini_positive_on_planted_persuadables(spark, tmp_path):
    """A score that ranks persuadables first must produce qini2 > 0:
    high-value events convert ONLY under treatment; low-value never."""
    import datetime
    import hashlib

    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_qini_auuc,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i in range(2000):
        treated = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2 == 0
        persuadable = i % 2 == 0
        converts = persuadable and treated
        evs.append(
            (i, t0 + datetime.timedelta(seconds=i), i,
             "purchase" if converts else "click",
             200.0 + (i % 50) if persuadable else 10.0 + (i % 50), "{}")
        )
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(2).write.parquet(str(tmp_path / "events.parquet"))

    got = ml_eval_qini_auuc(spark, str(tmp_path)).collect()[0]
    assert got["qini2_nanos"] > 0
    # endpoint: overall uplift is ~ n_persuadable_treated / n > 0
    assert got["endpoint_nanos"] > 0


def test_srm_planted_rigged_split_fires(spark, sf_dir, tmp_path):
    """On the real fixture the md5 coin must NOT flag (fair split); on a
    planted 70/30 rig it MUST (chi2 = (0.4n)^2/n = 0.16n >> 3.841)."""
    import datetime
    import hashlib

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_srm_check,
    )

    fair = stat_srm_check(spark, sf_dir).collect()[0]
    assert fair["srm_flag"] == 0
    assert fair["n_treat"] + fair["n_ctrl"] > 0
    assert fair["chi2_milli"] == (
        (fair["n_treat"] - fair["n_ctrl"]) ** 2 * 1000
        // (fair["n_treat"] + fair["n_ctrl"])
    )

    # rig: keep only ids whose md5 coin lands treatment, plus 30% controls
    t0 = datetime.datetime(2024, 1, 1)
    evs, eid = [], 0
    kept_c = 0
    i = 0
    while eid < 1000:
        coin = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2 == 0
        if coin or kept_c < 150:
            evs.append((i, t0 + datetime.timedelta(seconds=i), i, "click",
                        1.0, "{}"))
            eid += 1
            if not coin:
                kept_c += 1
        i += 1
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    rigged = stat_srm_check(spark, str(tmp_path)).collect()[0]
    assert rigged["srm_flag"] == 1
    assert rigged["chi2_milli"] > 3841


def test_sketch_error_audit_identities(spark, sf_dir):
    """Exact column must equal a direct countDistinct; error columns must
    equal their integer definitions; HLL at 1% RSD must be within ~5%
    of exact on the fixture."""
    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.profile import (
        agg_sketch_error_audit,
    )

    got = agg_sketch_error_audit(spark, sf_dir).collect()[0]
    exact = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert got["exact_distinct"] == exact

    def err(a):
        d = a - exact
        return (d * 1000000) // exact if d >= 0 else -((-d * 1000000) // exact)

    assert got["err_default_micros"] == err(got["hll_default"])
    assert got["err_rsd01_micros"] == err(got["hll_rsd01"])
    assert abs(got["err_rsd01_micros"]) < 50000


def test_state_store_read_matches_batch_and_metadata(spark, sf_dir):
    """The state rows must equal the batch tumbling aggregate row-for-row,
    and the state-metadata source must describe the aggregation operator."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F2

    from recommendation_system_big_data_spark.streaming.jobs import (
        events_stream,
        stream_state_store_read,
        tumbling_window_agg,
    )

    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 2))
        for r in stream_state_store_read(spark, sf_dir).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 2))
        for r in tumbling_window_agg(spark, sf_dir).collect()
    }
    assert got == want

    # metadata source: rerun with a kept checkpoint to introspect it
    chk = tempfile.mkdtemp(prefix="rsbd_state_meta_")
    try:
        ev = events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
        agg = ev.groupBy(F2.window("ts", "10 minutes")).count()
        q = (
            agg.writeStream.format("memory")
            .queryName("rsbd_state_meta_sink")
            .option("checkpointLocation", chk)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        md = spark.read.format("state-metadata").load(chk).collect()
        assert len(md) == 1
        assert md[0]["operatorName"] == "stateStoreSave"
        assert md[0]["maxBatchId"] >= md[0]["minBatchId"] >= 0
    finally:
        shutil.rmtree(chk, ignore_errors=True)


def test_scd2_late_arrival_splits_interval(spark, tmp_path):
    """A late change landing between two historized changes must close
    the covering interval at the late date, and only affected keys may
    carry was_corrected=1."""
    import datetime

    from recommendation_system_big_data_spark.operators.merge import (
        scd2_late_arriving,
    )

    d = datetime.date
    # key 1: on-time changes Jan 1 (key 7) and Jan 20 (key 14);
    #        LATE change Jan 10 (orderkey 10 -> 10 % 7 = 3)
    # key 2: on-time only (orderkey 8, 15 -> not late)
    spark.createDataFrame(
        [
            (7, 1, "O", 1.0, d(2024, 1, 1), "1-URGENT"),
            (14, 1, "O", 1.0, d(2024, 1, 20), "3-MEDIUM"),
            (10, 1, "O", 1.0, d(2024, 1, 10), "2-HIGH"),  # late
            (8, 2, "O", 1.0, d(2024, 1, 5), "4-NOT SPECIFIED"),
            (15, 2, "O", 1.0, d(2024, 1, 25), "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))

    rows = scd2_late_arriving(spark, str(tmp_path)).collect()
    k1 = sorted(
        [r for r in rows if r["o_custkey"] == 1], key=lambda r: r["valid_from"]
    )
    assert [(r["valid_from"], r["valid_to"], r["attr"]) for r in k1] == [
        ("2024-01-01", "2024-01-10", "1-URGENT"),   # split by the late row
        ("2024-01-10", "2024-01-20", "2-HIGH"),
        ("2024-01-20", "9999-12-31", "3-MEDIUM"),
    ]
    assert all(r["was_corrected"] == 1 for r in k1)
    k2 = [r for r in rows if r["o_custkey"] == 2]
    assert all(r["was_corrected"] == 0 for r in k2)
    assert {r["attr"] for r in k2 if r["is_current"] == 1} == {"5-LOW"}


def test_gi_star_planted_hotspot(spark, tmp_path):
    """A planted point mass in one cell must make that cell's
    neighborhood the global maximum z, with z > 2; a uniform background
    stays near 0. Also pin the edge/wrap bookkeeping: lat-edge rows
    carry n_nb = 6, interior 9, and the grid is always 864 rows."""
    from recommendation_system_big_data_spark.operators.geo import (
        geo_hotspot_gi_star,
    )

    # custkey k lands in cell (((k*7919)%12000)//500, ((k*104729)%36000)//1000).
    # Plant ~200 keys that all map to ONE cell by construction: k multiples
    # of 12000*36000/gcd... simpler: pick keys with k % (12000*36000) equal —
    # use k = base + j*43200000 keeps both residues; but keys get huge. Use
    # brute scan for keys hitting cell (0,0): (k*7919)%12000 < 500 and
    # (k*104729)%36000 < 1000.
    hot = [k for k in range(1, 400000)
           if (k * 7919) % 12000 < 500 and (k * 104729) % 36000 < 1000][:200]
    assert len(hot) == 200
    background = [k for k in range(400001, 400601)]
    rows = [(k, f"c{k}", 0, 0.0, "BUILDING") for k in hot + background]
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))

    out = geo_hotspot_gi_star(spark, str(tmp_path)).collect()
    assert len(out) == 864
    by_nb = {(r["cell_row"], r["cell_col"]): r for r in out}
    assert all(
        r["n_nb"] == (6 if r["cell_row"] in (0, 23) else 9) for r in out
    )
    # the planted cell (0,0) neighborhood must be the global max z
    top = max(out, key=lambda r: r["gi_z"])
    assert abs(top["cell_row"] - 0) <= 1
    assert top["cell_col"] in (0, 1, 35)
    assert top["gi_z"] > 2.0
    assert by_nb[(0, 0)]["n_points"] >= 200


def test_tost_sequential_reference(spark, sf_dir):
    """Replay the sufficient-statistics fold and the two one-sided
    t-statistics; the flag must equal the replayed comparisons."""
    import math

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.stats_tests import (
        TOST_MARGIN_PCT,
        TOST_Z_CRIT,
        stat_tost_equivalence,
    )

    va, vb, vboth = [], [], []
    for r in load(spark, sf_dir, "events").select("event_type", "value").collect():
        if r["event_type"] == "click":
            va.append(r["value"])
        elif r["event_type"] == "purchase":
            vb.append(r["value"])
        if r["event_type"] in ("click", "purchase"):
            vboth.append(r["value"])

    def var_samp(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    diff = sum(va) / len(va) - sum(vb) / len(vb)
    se = math.sqrt(var_samp(va) / len(va) + var_samp(vb) / len(vb))
    margin = (sum(vboth) / len(vboth)) * TOST_MARGIN_PCT / 100.0

    got = stat_tost_equivalence(spark, sf_dir).collect()[0]
    assert got["n_a"] == len(va) and got["n_b"] == len(vb)
    assert abs(got["mean_diff"] - diff) < 1e-3
    assert abs(got["margin"] - margin) < 1e-3
    assert abs(got["t_lower"] - (diff + margin) / se) < 1e-2
    assert abs(got["t_upper"] - (diff - margin) / se) < 1e-2
    assert got["equivalent"] == int(
        (diff + margin) / se > TOST_Z_CRIT
        and (diff - margin) / se < -TOST_Z_CRIT
    )


def test_mcc_sequential_reference_and_bounds(spark, sf_dir):
    """Cell replay + MCC formula replay; MCC in [-1, 1]; degenerate
    denominator handled by the engines' NULL (planted all-negative)."""
    import math

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.ml_eval import (
        ml_eval_mcc,
    )

    rows = load(spark, sf_dir, "events").select("event_type", "value").collect()
    mv = max(r["value"] for r in rows)
    tp = fp = fn = tn = 0
    for r in rows:
        pred = 1 if r["value"] / mv > 0.5 else 0
        y = 1 if r["event_type"] == "purchase" else 0
        tp += pred * y
        fp += pred * (1 - y)
        fn += (1 - pred) * y
        tn += (1 - pred) * (1 - y)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    got = ml_eval_mcc(spark, sf_dir).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (tp, fp, fn, tn)
    assert abs(got["mcc"] - mcc) < 1e-6
    assert -1.0 <= got["mcc"] <= 1.0


def test_holm_bonferroni_monotone_and_planted():
    """Pure-python pin of the step-down property the operator implements:
    adjusted p's are the running max of (k-rank+1)*p, monotone
    nondecreasing in rank, clamped at 1."""
    ps = [0.001, 0.012, 0.012, 0.6, 0.9]
    k = len(ps)
    adj, run = [], 0.0
    for i, p in enumerate(sorted(ps)):
        run = max(run, min((k - i) * p, 1.0))
        adj.append(run)
    assert adj == sorted(adj)
    # 0.6*2 = 1.2 clamps to 1.0, and the running max HOLDS it at rank 5
    # even though 0.9*1 = 0.9 alone would be smaller (the step-down
    # monotonicity naive implementations drop)
    assert adj == [0.005, 0.048, 0.048, 1.0, 1.0]


def test_holm_bonferroni_matches_jb_pvalues(spark, sf_dir):
    """The operator's raw p's must equal stat_jarque_bera's p column and
    the adjustment must replay exactly."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_holm_bonferroni,
        stat_jarque_bera,
    )

    jb = {
        r["event_type"]: r["p_chi2_df2"]
        for r in stat_jarque_bera(spark, sf_dir).collect()
    }
    got = sorted(
        stat_holm_bonferroni(spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    assert {r["event_type"]: r["p_raw"] for r in got} == jb
    k = len(got)
    run = 0.0
    for i, r in enumerate(got):
        run = max(run, min((k - i) * r["p_raw"], 1.0))
        assert abs(r["p_holm"] - round(run, 6)) < 2e-6
        assert r["reject_05"] == int(r["p_holm"] < 0.05)


def test_like_for_like_planted_segments(spark, tmp_path):
    """Planted two-period book: one comparable customer (+50% growth),
    one churned, one new — exact segment classification and growth."""
    import datetime

    from recommendation_system_big_data_spark.operators.olap import (
        olap_like_for_like,
    )

    d = datetime.datetime
    spark.createDataFrame(
        [
            # comparable: 100.00 in p1, 150.00 in p2
            (1, 1, "O", 100.00, d(2024, 1, 1), "1-URGENT"),
            (2, 1, "O", 150.00, d(2024, 1, 30), "1-URGENT"),
            # churned: p1 only
            (3, 2, "O", 40.00, d(2024, 1, 2), "1-URGENT"),
            # new: p2 only
            (4, 3, "O", 70.00, d(2024, 1, 29), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))

    got = {r["segment"]: r for r in olap_like_for_like(spark, str(tmp_path)).collect()}
    assert set(got) == {"comparable", "churned", "new"}
    c = got["comparable"]
    assert (c["n_customers"], c["rev_p1_cents"], c["rev_p2_cents"]) == (1, 10000, 15000)
    assert c["growth_micros"] == 500000
    assert got["churned"]["growth_micros"] == -1000000
    assert got["new"]["rev_p1_cents"] == 0 and got["new"]["growth_micros"] is None


def test_adf_planted_series(spark, tmp_path):
    """A strongly mean-reverting planted series (white noise around a
    constant level) must reject the unit root (stationary flag 1); a
    pure random-walk-like trending series must not. Plus a sequential
    replay of the OLS algebra on the fixture grain."""
    import datetime
    import math
    import random

    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_adf_stationarity,
    )

    def write_series(path, counts):
        t0 = datetime.datetime(2024, 1, 1)
        evs, eid = [], 0
        for d, c in enumerate(counts):
            for j in range(c):
                evs.append(
                    (eid, t0 + datetime.timedelta(days=d, seconds=j), eid,
                     "click", 1.0, "{}")
                )
                eid += 1
        spark.createDataFrame(
            evs,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).coalesce(1).write.parquet(str(path / "events.parquet"))

    rng = random.Random(5)
    noise = [50 + rng.randrange(-20, 21) for _ in range(40)]
    p1 = tmp_path / "stationary"
    p1.mkdir()
    write_series(p1, noise)
    r1 = ts_adf_stationarity(spark, str(p1)).collect()[0]
    assert r1["stationary_5pct"] == 1
    assert r1["df_tstat"] < -2.86

    trend = [10 + 5 * d for d in range(40)]  # deterministic trend: no
    p2 = tmp_path / "trending"               # mean reversion in levels
    p2.mkdir()
    write_series(p2, trend)
    r2 = ts_adf_stationarity(spark, str(p2)).collect()[0]
    assert r2["stationary_5pct"] == 0

    # sequential replay on the planted stationary series
    ys = noise
    pairs = [(ys[i] - ys[i - 1], ys[i - 1]) for i in range(1, len(ys))]
    n = len(pairs)
    sx = sum(x for _, x in pairs)
    sy = sum(d for d, _ in pairs)
    sxx = sum(x * x for _, x in pairs)
    sxy = sum(d * x for d, x in pairs)
    syy = sum(d * d for d, _ in pairs)
    sxx_c = sxx - sx * sx / n
    sxy_c = sxy - sx * sy / n
    syy_c = syy - sy * sy / n
    beta = sxy_c / sxx_c
    var_b = (syy_c - beta * sxy_c) / (n - 2) / sxx_c
    assert r1["n_diffs"] == n
    assert abs(r1["beta"] - beta) < 1e-5
    assert abs(r1["df_tstat"] - beta / math.sqrt(var_b)) < 1e-3


def test_price_elasticity_planted_slope(spark, tmp_path):
    """A planted exact power law q = c·p^(-2) must recover elasticity
    -2.0 with r2 = 1; a flat-price brand reports an unidentified
    (NULL-div or degenerate) slope we never mistake for signal."""
    from recommendation_system_big_data_spark.operators.olap import (
        olap_price_elasticity,
    )

    lines = []
    lid = 0
    # brand A: unit price p in {1, 2, 4, 8}, qty = 64 / p^2 exactly
    for p, q in [(1.0, 64.0), (2.0, 16.0), (4.0, 4.0), (8.0, 1.0)]:
        lines.append((lid, 1, 1, 1, q, p * q, 0.0, 0.0, "N", "O", None))
        lid += 1
    # brand B: FLAT unit price (sxx_c = 0) across varying quantities —
    # the unidentified-slope degenerate the guard pins to NULL.
    for q in [1.0, 2.0, 4.0]:
        lines.append((lid, 2, 1, 1, q, 3.0 * q, 0.0, 0.0, "N", "O", None))
        lid += 1
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "pa", "BrandA", "t", 1, 1.0), (2, "pb", "BrandB", "t", 1, 3.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(tmp_path / "part.parquet"))

    got = {r["brand"]: r for r in
           olap_price_elasticity(spark, str(tmp_path)).collect()}
    assert set(got) == {"BrandA", "BrandB"}
    r = got["BrandA"]
    assert r["n_lines"] == 4
    # micro-quantized log points (r13 exact-algebra rewrite) recover the
    # planted slope to the ROUND(4) output budget, not to float epsilon
    assert abs(r["elasticity"] - (-2.0)) < 5e-4
    assert abs(r["r2"] - 1.0) < 5e-4
    rb = got["BrandB"]
    assert rb["n_lines"] == 3
    assert rb["elasticity"] is None and rb["r2"] is None


def test_hll_intersection_audit_identities(spark, sf_dir):
    """exact_inter must equal the true overlap; est_inter must equal the
    engine's own inclusion-exclusion on its estimates; the audited error
    stays inside a loose compounded-RSD bound on the fixture."""
    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.profile import (
        agg_hll_intersection_audit,
    )

    ev = load(spark, sf_dir, "events")
    a = {r["user_id"] for r in ev.where("event_type = 'click'")
         .select("user_id").distinct().collect()}
    b = {r["user_id"] for r in ev.where("event_type = 'purchase'")
         .select("user_id").distinct().collect()}
    got = agg_hll_intersection_audit(spark, sf_dir).collect()[0]
    assert got["exact_a"] == len(a) and got["exact_b"] == len(b)
    assert got["exact_inter"] == len(a & b)
    inter = got["exact_inter"]
    if inter:
        d = got["est_inter"] - inter
        want = ((d * 1000000) // inter if d >= 0
                else -((-d * 1000000) // inter))
        assert got["err_micros"] == want
        # lgConfigK=14 → RSD ~0.8%; inclusion-exclusion compounds ~3x the
        # union size over the intersection — stay inside a loose 20%
        assert abs(got["err_micros"]) < 200000


def test_its_planted_jump_and_trend_break(spark, tmp_path):
    """Planted exact construction: pre = 50 + 1*t, post = 90 + 3*t
    (evaluated at the cut: level jump = 40, slope change = +2). The
    segmented fit must recover all four numbers to the round budget."""
    import datetime

    from recommendation_system_big_data_spark.operators.timeseries import (
        ts_interrupted_series,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs, eid = [], 0
    n_days = 40
    cut = (n_days + 1) // 2  # the operator's integral midpoint, t0 = 20
    for t in range(n_days):
        cnt = 50 + 1 * t if t < cut else 90 + 3 * t
        for j in range(cnt):
            evs.append(
                (eid, t0 + datetime.timedelta(days=t, seconds=j), eid,
                 "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(2).write.parquet(str(tmp_path / "events.parquet"))

    r = ts_interrupted_series(spark, str(tmp_path)).collect()[0]
    assert (r["n_pre"], r["n_post"], r["t0"]) == (cut, n_days - cut, cut)
    assert abs(r["pre_slope"] - 1.0) < 1e-6
    assert abs(r["post_slope"] - 3.0) < 1e-6
    assert abs(r["slope_change"] - 2.0) < 1e-6
    # level change at t0: (90 + 3*20) - (50 + 1*20) = 80... evaluated on
    # the FITTED lines, which reproduce the construction exactly
    assert abs(r["level_change"] - 80.0) < 1e-6


def test_overdispersion_planted_poisson_vs_bursty(spark, tmp_path):
    """A constant-rate series sits at index ~<= 1+2sigma (flag 0); a
    planted bursty mixture (alternating 10/200 per day) must flag."""
    import datetime

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_overdispersion_index,
    )

    t0 = datetime.datetime(2024, 1, 1)
    evs, eid = [], 0
    for d in range(30):
        for j in range(50):  # constant 50/day: index == 0 < threshold
            evs.append((eid, t0 + datetime.timedelta(days=d, seconds=j),
                        eid, "click", 1.0, "{}"))
            eid += 1
        for j in range(10 if d % 2 == 0 else 200):  # bursty
            evs.append((eid, t0 + datetime.timedelta(days=d, seconds=3000 + j),
                        eid, "purchase", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        evs,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(2).write.parquet(str(tmp_path / "events.parquet"))

    got = {r["event_type"]: r for r in
           stat_overdispersion_index(spark, str(tmp_path)).collect()}
    assert got["click"]["overdispersed"] == 0
    assert got["click"]["dispersion_index"] == 0.0
    assert got["purchase"]["overdispersed"] == 1
    assert got["purchase"]["dispersion_index"] > 50


def test_quantile_sketch_audit_identities(spark, sf_dir):
    """Exact column must match the engine's own percentile(); higher
    accuracy must not be worse on rank-error bound terms; errors equal
    their integer definitions."""
    import math

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.operators.profile import (
        agg_quantile_sketch_audit,
    )

    exact = (
        load(spark, sf_dir, "events")
        .selectExpr("percentile(value, array(0.5, 0.9, 0.99)) AS e")
        .collect()[0]["e"]
    )
    got = {r["percentile"]: r for r in
           agg_quantile_sketch_audit(spark, sf_dir).collect()}
    assert sorted(got) == [50, 90, 99]
    for pct, ex in zip([50, 90, 99], exact):
        r = got[pct]
        assert abs(r["exact_value"] - ex) < 1e-6
        for acc_col, err_col in [("approx_acc1k", "err_acc1k_micros"),
                                 ("approx_acc10k", "err_acc10k_micros")]:
            d = r[acc_col] - r["exact_value"]
            want = (math.floor(d / r["exact_value"] * 1000000) if d >= 0
                    else -math.floor(-d / r["exact_value"] * 1000000))
            assert abs(r[err_col] - want) <= 1, (pct, acc_col)
        # acc=10k rank error <= 1e-4: on ~10k rows that is ~1 rank — the
        # value error must be tiny relative to acc=1k's bound
        assert abs(r["err_acc10k_micros"]) <= 105000


def test_bom_rollup_planted_tree(spark, tmp_path):
    """Planted 3-level tree: root 1 -> children 10 (qty 2), 11 (qty 3);
    10 -> 100 (qty 2). Rolled cost = 100 + 2*200 + 3*300 + (2*2)*500 =
    3400 cents over 4 components."""
    from recommendation_system_big_data_spark.operators.sql_surface import (
        sql_recursive_bom_rollup,
    )

    spark.createDataFrame(
        [
            (1, "root", "B", "t", 1, 1.00),
            (10, "sub-a", "B", "t", 1, 2.00),
            (11, "sub-b", "B", "t", 1, 3.00),
            (100, "leaf", "B", "t", 1, 5.00),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(tmp_path / "part.parquet"))

    got = {r["root_part"]: (r["n_components"], r["rolled_cost_cents"])
           for r in sql_recursive_bom_rollup(spark, str(tmp_path)).collect()}
    assert got == {1: (4, 3400)}


def test_compressed_roundtrip_codecs_engage(spark, sf_dir):
    """The written files must actually carry each codec (extension
    check), and the query's cross-codec agreement gate must pass."""
    import glob
    import os

    from recommendation_system_big_data_spark.sources.sinks import (
        _sink_dir,
        sink_compressed_roundtrip,
    )

    rows = sink_compressed_roundtrip(spark, sf_dir).collect()
    assert len(rows) > 0
    csv_files = glob.glob(os.path.join(_sink_dir(sf_dir, "csvgz"), "*.csv.gz"))
    assert csv_files, "gzip codec did not engage on the CSV sink"
    zstd_files = glob.glob(
        os.path.join(_sink_dir(sf_dir, "pqzstd"), "*.zstd.parquet")
    )
    assert zstd_files, "zstd codec did not engage on the parquet sink"
    snappy_files = glob.glob(
        os.path.join(_sink_dir(sf_dir, "pqsnappy"), "*.snappy.parquet")
    )
    assert snappy_files, "snappy codec did not engage on the parquet sink"


def test_degenerate_constant_corpus_agrees_cross_engine(spark, tmp_path):
    """The ANSI degenerate class, engine-wide: on an all-constant-value
    corpus, zero-variance denominators must yield NULL statistics that
    MATCH the DuckDB oracle (ANSI Spark raises DIVIDE_BY_ZERO where
    DuckDB infs — the ADF/stump-hist class, now pinned for the six
    inference/eval ops the r12 probe caught raising)."""
    import datetime

    import duckdb

    from recommendation_system_big_data_spark.operators.ml_eval import (
        _MCC_ORACLE,
        ml_eval_mcc,
    )
    from recommendation_system_big_data_spark.operators.stats_tests import (
        _JB_ORACLE,
        _KW_ORACLE,
        _MWU_ORACLE,
        _TOST_ORACLE,
        _TTEST_ORACLE,
        stat_jarque_bera,
        stat_kruskal_wallis,
        stat_mann_whitney,
        stat_tost_equivalence,
        stat_ttest_welch,
    )
    from tests.conftest import assert_oracle_match

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), i,
         "click" if i % 2 else "purchase", 5.0, "{}")
        for i in range(200)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(sf + "/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    for fn, oracle, name in [
        (stat_ttest_welch, _TTEST_ORACLE, "ttest"),
        (stat_mann_whitney, _MWU_ORACLE, "mwu"),
        (stat_kruskal_wallis, _KW_ORACLE, "kruskal"),
        (stat_jarque_bera, _JB_ORACLE, "jb"),
        (stat_tost_equivalence, _TOST_ORACLE, "tost"),
        (ml_eval_mcc, _MCC_ORACLE, "mcc"),
    ]:
        sdf = fn(spark, sf)
        assert_oracle_match(sdf, con, oracle, f"degenerate_{name}")
    con.close()
