"""Differential property tests for the statistical kernels: pure-Python
reference implementations checked against the relational machinery on
randomized inputs — tie-heavy, skewed, and degenerate cases the fixed
testdata can't exercise."""

from __future__ import annotations

import random

from recommendation_system_big_data_spark.operators.ml_eval import auc_exact


def _brute_auc(pairs):
    """O(n²) pairwise AUC: P(score_pos > score_neg) + 0.5·P(tie)."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    if not pos or not neg:
        return None
    wins = ties = 0
    for a in pos:
        for b in neg:
            if a > b:
                wins += 1
            elif a == b:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_kernel_matches_pairwise_definition(spark):
    """auc_exact's midrank identity must equal the O(n²) pairwise AUC on
    randomized score sets — including heavy ties (integer scores from a
    small domain), perfect separation, and anti-separation."""
    rng = random.Random(20260814)
    cases = []
    for _ in range(6):
        n = rng.randrange(5, 80)
        # small integer domain → guaranteed cross-class ties
        cases.append(
            [(float(rng.randrange(0, 10)), rng.random() < 0.4) for _ in range(n)]
        )
    # perfect separation → AUC exactly 1
    cases.append([(float(i), i >= 5) for i in range(10)])
    # anti-separation → AUC exactly 0
    cases.append([(float(i), i < 5) for i in range(10)])
    # all scores identical → AUC exactly 0.5
    cases.append([(7.0, i % 3 == 0) for i in range(12)])

    for trial, pairs in enumerate(cases):
        expected = _brute_auc(pairs)
        if expected is None:
            continue
        df = spark.createDataFrame(pairs, "value double, is_pos boolean")
        row = auc_exact(df).collect()[0]
        assert row["n_pos"] == sum(1 for _, p in pairs if p)
        assert row["n_neg"] == sum(1 for _, p in pairs if not p)
        assert abs(row["auc"] - round(expected, 6)) <= 1e-6, (
            trial,
            row["auc"],
            expected,
        )


def _brute_weighted_quantiles(rows, fracs=(0.25, 0.5, 0.75)):
    """Sequential reference: per group, sorted values, integer cum weights,
    first value whose cumulative weight reaches frac·total."""
    out = {}
    by_g = {}
    for g, v, w in rows:
        by_g.setdefault(g, {}).setdefault(v, 0)
        by_g[g][v] += w
    for g, vw in by_g.items():
        items = sorted(vw.items())
        total = sum(w for _, w in items)
        picks = []
        for q in fracs:
            cum = 0
            for v, w in items:
                cum += w
                # DECIMAL comparison: cum >= q*total with exact arithmetic
                if cum * 100 >= int(q * 100) * total:
                    picks.append(v)
                    break
        out[g] = tuple(picks)
    return out


def test_weighted_quantiles_match_sequential_reference(spark):
    """weighted_quantiles (DECIMAL cumulative scan) must agree with the
    sequential pick on random integer-weighted values, including
    single-value groups and weight-boundary exact hits."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.operators.stats_tests import (
        weighted_quantiles,
    )

    rng = random.Random(20260814)
    for trial in range(6):
        rows = []
        for _ in range(rng.randrange(3, 50)):
            rows.append(
                (
                    rng.randrange(0, 3),
                    float(rng.randrange(1, 25)),
                    rng.randrange(1, 9),
                )
            )
        # boundary case: weights 1,1,2 → cum 2 == 0.5*4 exactly at 2nd value
        rows += [(9, 1.0, 1), (9, 2.0, 1), (9, 3.0, 2)]
        df = (
            spark.createDataFrame(rows, "rf int, price double, wi int")
            .groupBy("rf", "price")
            .agg(F.sum(F.col("wi").cast("decimal(18,2)")).cast("decimal(18,2)").alias("w"))
        )
        got = {
            r["rf"]: (r["wp25"], r["wmedian"], r["wp75"])
            for r in weighted_quantiles(df).collect()
        }
        expected = _brute_weighted_quantiles(rows)
        assert got == expected, (trial, got, expected)


def test_max_drawdown_matches_sequential_accumulator(spark):
    """max_drawdown_per_key must match a python running accumulator on
    random signed series — including all-positive (drawdown 0 only if
    never dips) and monotonically-falling series."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        max_drawdown_per_key,
    )

    rng = random.Random(20260814)
    rows = []
    i = 0
    for k in range(4):
        for _ in range(rng.randrange(3, 40)):
            rows.append((k, i, float(rng.randrange(-50, 60))))
            i += 1
    # monotone falling series: drawdown = total fall
    for v in (10.0, -5.0, -5.0, -5.0):
        rows.append((8, i, v))
        i += 1
    df = spark.createDataFrame(rows, "user_id int, ts long, value double")
    df = df.withColumn("event_id", df.ts)
    got = {
        r["user_id"]: (
            r["n_events"],
            r["peak_value"],
            r["final_value"],
            r["max_drawdown"],
        )
        for r in max_drawdown_per_key(df).collect()
    }

    expected = {}
    by_k = {}
    for k, t, v in rows:
        by_k.setdefault(k, []).append((t, v))
    for k, seq in by_k.items():
        seq.sort()
        cum = dd = 0.0
        peak_seen = float("-inf")
        for _, v in seq:
            cum += v
            peak_seen = max(peak_seen, cum)
            dd = max(dd, peak_seen - cum)
        expected[k] = (
            len(seq),
            round(peak_seen, 6),
            round(cum, 6),
            round(dd, 6),
        )
    assert got == expected, (got, expected)


def test_gini_matches_mean_absolute_difference(spark):
    """gini_from_values' rank identity must equal the definitional form
    G = Σᵢⱼ|xᵢ−xⱼ| / (2n²·μ) on random value sets — including heavy
    ties, a uniform set (G=0), and extreme concentration."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        gini_from_values,
    )

    rng = random.Random(20260814)
    cases = []
    for _ in range(5):
        n = rng.randrange(3, 60)
        cases.append([float(rng.randrange(1, 40)) for _ in range(n)])
    cases.append([7.0] * 12)                  # perfectly equal → 0
    cases.append([0.0] * 9 + [100.0])         # one whale → (n-1)/n
    for trial, xs in enumerate(cases):
        rows = [(x, i) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "x double, o_custkey int")
        got = gini_from_values(df).collect()[0]["gini"]
        n = len(xs)
        mu = sum(xs) / n
        mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
        expected = mad / (2 * mu) if mu else 0.0
        assert abs(got - round(expected, 6)) <= 1e-6, (trial, got, expected)


def test_kaplan_meier_matches_sequential_life_table(spark):
    """kaplan_meier_curve must match the textbook sequential estimator on
    random censored samples — ties between deaths and censorings at the
    same time included (both leave risk AFTER the time point)."""
    from recommendation_system_big_data_spark.operators.stats_tests import (
        kaplan_meier_curve,
    )

    rng = random.Random(20260814)
    for trial in range(6):
        rows = [
            (rng.randrange(0, 12), 1 if rng.random() < 0.7 else 0)
            for _ in range(rng.randrange(5, 80))
        ]
        df = spark.createDataFrame(rows, "duration_hours long, died int")
        got = {
            r["t"]: (r["n_at_risk"], r["n_deaths"], r["survival"])
            for r in kaplan_meier_curve(df).collect()
        }

        by_t = {}
        for t, d in rows:
            dd, cc = by_t.get(t, (0, 0))
            by_t[t] = (dd + d, cc + (1 - d))
        n_risk = len(rows)
        surv = 1.0
        expected = {}
        for t in sorted(by_t):
            d, c = by_t[t]
            if n_risk <= 0:
                break
            surv *= 1.0 - d / n_risk
            expected[t] = (n_risk, d, round(surv, 6))
            n_risk -= d + c
        assert got == expected, (trial, got, expected)


def test_slope_builtin_null_pair_semantics(spark):
    """slope_agg_expr must reproduce regr_slope's pair semantics on data
    with NULL ys: the pair is dropped from BOTH co-moments (a bare
    var_pop(x) would keep the row and bias the denominator). Compared
    against a sequential OLS reference over the non-null pairs only —
    the divergence class the fixtures (null-free value) cannot expose."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.functions.pandas_fns import (
        slope_agg_expr,
    )

    rng = random.Random(82)
    rows, expected = [], {}
    for g in range(6):
        xs = [float(i) for i in range(12)]
        ys = [rng.uniform(-5, 5) for _ in xs]
        # punch 0..4 holes in y (group 0 keeps none null as the control)
        holes = set(rng.sample(range(len(xs)), k=g % 5))
        pairs = [(x, y) for i, (x, y) in enumerate(zip(xs, ys)) if i not in holes]
        px = [p[0] for p in pairs]
        py = [p[1] for p in pairs]
        mx = sum(px) / len(px)
        denom = sum((x - mx) ** 2 for x in px)
        expected[g] = round(
            sum((x - mx) * y for x, y in zip(px, py)) / denom, 4
        )
        rows += [
            (g, x, None if i in holes else y)
            for i, (x, y) in enumerate(zip(xs, ys))
        ]

    df = spark.createDataFrame(rows, "g int, x double, y double")
    got = {
        r["g"]: r["slope"]
        for r in df.groupBy("g").agg(slope_agg_expr("x", "y").alias("slope")).collect()
    }
    assert got == expected


def test_pandas_slope_udf_matches_builtin_on_nulls(spark):
    """The applyInPandas slope and the built-in slope_agg_expr must agree
    on data WITH NULL ys (the fixtures are null-free, so only a synthetic
    frame exercises the UDF's NaN-mask path). Also pins n = full group
    row count (the oracle's COUNT(*)), not the pair count."""
    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.functions.pandas_fns import (
        _SLOPE_SCHEMA,
        _slope_fn,
        slope_agg_expr,
    )

    rng = random.Random(7)
    rows = []
    for g in range(8):
        for i in range(20):
            y = None if rng.random() < 0.2 and g > 0 else rng.uniform(-3, 3)
            rows.append((g, float(i) * 0.25, y))
    df = spark.createDataFrame(rows, "user_id long, ts_hours double, value double")

    udf_out = {
        (r["user_id"]): (r["n"], r["slope"])
        for r in df.groupBy("user_id")
        .applyInPandas(_slope_fn(), schema=_SLOPE_SCHEMA)
        .collect()
    }
    builtin_out = {
        r["user_id"]: (r["n"], r["slope"])
        for r in df.select(
            "user_id",
            F.col("ts_hours").alias("x"),
            F.col("value").alias("y"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            slope_agg_expr("x", "y").alias("slope"),
        )
        .collect()
    }
    assert udf_out == builtin_out
    assert all(n == 20 for n, _ in udf_out.values())


def test_mann_kendall_matches_sequential_reference(spark, sf_dir):
    """Replay the Mann-Kendall statistic sequentially in plain Python over
    the same exact-decimal daily series and require cell-exact agreement
    (integer S/n/ties; one shared IEEE expression for z)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from recommendation_system_big_data_spark.operators.stats_tests import (
        stat_trend_mann_kendall,
    )

    daily = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
        .collect()
    )
    series = [Decimal(r["rev"]) for r in sorted(daily, key=lambda r: r["day"])]
    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(series).values()
    )
    var_s = float(n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    if s > 0:
        z = (s - 1) / var_s**0.5
    elif s < 0:
        z = (s + 1) / var_s**0.5
    else:
        z = 0.0
    # Reference rounding must replicate Spark's F.round convention —
    # HALF_UP on the shortest-repr decimal (r9 ADVICE: Python round()
    # rounds half-even and diverges on exact 4/6-dp midpoints; same
    # helper convention as test_property_roundsix.py).
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round(x: float, nd: int) -> float:
        q = Decimal(1).scaleb(-nd)
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    row = stat_trend_mann_kendall(spark, sf_dir).collect()[0]
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var_s"] == spark_round(var_s, 6)
    assert row["z_stat"] == spark_round(z, 4)
