"""Differential tests for the round-6 kernels: independent sequential
Python references (a third implementation besides Spark and the DuckDB
oracle) recomputed from the raw parquet — the pattern that caught the
Kaplan-Meier ln(0) bug both engines shared."""

from __future__ import annotations

from collections import Counter, defaultdict


def test_sequence_packing_matches_sequential_reference(spark, sf_dir):
    """Replay the concat-and-chunk spec token by token in Python and
    compare the full accounting table cell-exactly."""
    from recommendation_system_big_data_spark.functions.text import (
        _PACK_SEQ_LEN,
        pipeline_sequence_packing,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("doc_id", "source", "size(split(text, ' ')) AS n")
        .collect()
    )
    per_src = defaultdict(list)
    for r in docs:
        per_src[r["source"]].append((r["doc_id"], r["n"]))
    expect = {}
    for src, rows in per_src.items():
        rows.sort()
        off = 0
        for doc_id, n in rows:
            lo, hi = off, off + n
            for seq in range(lo // _PACK_SEQ_LEN, (hi - 1) // _PACK_SEQ_LEN + 1):
                s_lo, s_hi = seq * _PACK_SEQ_LEN, (seq + 1) * _PACK_SEQ_LEN
                key = (src, seq)
                nd, nt, first, last = expect.get(key, (0, 0, doc_id, doc_id))
                expect[key] = (
                    nd + 1,
                    nt + min(hi, s_hi) - max(lo, s_lo),
                    min(first, doc_id),
                    max(last, doc_id),
                )
            off = hi

    got = {
        (r["source"], r["seq_id"]): (
            r["n_docs"],
            r["n_tokens"],
            r["first_doc_id"],
            r["last_doc_id"],
        )
        for r in pipeline_sequence_packing(spark, sf_dir).collect()
    }
    assert got == expect


def test_label_propagation_matches_sequential_reference(spark, sf_dir):
    """Run the 4 synchronous weighted-LPA rounds in plain Python over
    the same capped co-purchase edge list and compare every label."""
    from recommendation_system_big_data_spark.operators.graph import (
        _LPA_ITERS,
        MAX_BASKET,
        graph_label_propagation,
    )

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(list)
    for r in li:
        baskets[r["l_orderkey"]].append(r["l_partkey"])
    w = Counter()
    for rows in baskets.values():
        # dense_rank(<= MAX_BASKET) keeps every ROW of the first 32
        # distinct parts — multiplicity carries into the pair weights,
        # exactly like _capped_items feeding the self-join.
        keep = set(sorted(set(rows))[:MAX_BASKET])
        capped = [p for p in rows if p in keep]
        for a in capped:
            for b in capped:
                if a != b:
                    w[(a, b)] += 1
    neighbors = defaultdict(list)
    for (a, b), wt in w.items():
        neighbors[b].append((a, wt))  # incoming: dst adopts from src
    labels = {n: n for n in {a for a, _ in w}}
    for _ in range(_LPA_ITERS):
        new = {}
        for node, inc in neighbors.items():
            score = Counter()
            for src, wt in inc:
                score[labels[src]] += wt
            best = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
            new[node] = best[0]
        labels = new

    got = {
        r["part_id"]: r["community"]
        for r in graph_label_propagation(spark, sf_dir).collect()
    }
    assert got == labels


def _pav_reference(points):
    """Sequential weighted PAV over (score, n, pos) points, integer
    cross-multiplied mean comparisons — the textbook algorithm."""
    blocks = []
    for score, n, pos in sorted(points):
        blocks.append([score, score, n, pos])
        while len(blocks) > 1 and blocks[-2][3] * blocks[-1][2] >= blocks[-1][3] * blocks[-2][2]:
            hi = blocks.pop()
            blocks[-1][1] = hi[1]
            blocks[-1][2] += hi[2]
            blocks[-1][3] += hi[3]
    return [
        (lo, hi, n, pos, round(pos / n, 6)) for lo, hi, n, pos in blocks
    ]


def test_isotonic_calibration_matches_reference_and_invariants(spark, sf_dir):
    """The distributed PAV must equal the sequential reference
    cell-exactly on the fixture grain AND on randomized tie-heavy
    inputs; fitted means strictly increase and conserve total mass."""
    import random

    from recommendation_system_big_data_spark.operators.ml_eval import (
        isotonic_fit,
        ml_isotonic_calibration,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("value", "event_type = 'purchase' AS is_pos")
        .collect()
    )
    grain = {}
    for r in ev:
        n, p = grain.get(r["value"], (0, 0))
        grain[r["value"]] = (n + 1, p + bool(r["is_pos"]))
    expect = _pav_reference([(s, n, p) for s, (n, p) in grain.items()])
    got = [
        (r["score_lo"], r["score_hi"], r["n"], r["pos"], r["p_cal"])
        for r in ml_isotonic_calibration(spark, sf_dir).collect()
    ]
    assert sorted(got) == expect

    rng = random.Random(20260814)
    for trial in range(4):
        rows = [
            (float(rng.randrange(0, 12)), rng.random() < 0.5)
            for _ in range(rng.randrange(10, 120))
        ]
        df = spark.createDataFrame(rows, "value double, is_pos boolean")
        fit = sorted(
            (r["score_lo"], r["score_hi"], r["n"], r["pos"], r["p_cal"])
            for r in isotonic_fit(df, "value", "is_pos").collect()
        )
        pts = {}
        for v, p in rows:
            n, s = pts.get(v, (0, 0))
            pts[v] = (n + 1, s + bool(p))
        assert fit == _pav_reference(
            [(s, n, p) for s, (n, p) in pts.items()]
        ), trial
        # invariants: strictly increasing means, conserved mass
        means = [b[4] for b in fit]
        assert all(a < b for a, b in zip(means, means[1:]))
        assert sum(b[2] for b in fit) == len(rows)
        assert sum(b[3] for b in fit) == sum(1 for _, p in rows if p)


def test_holt_linear_matches_sequential_reference(spark, sf_dir):
    """Recompute the daily grain independently and replay the Holt
    recurrence — identical IEEE operation order, so agreement is
    cell-exact, not tolerance-based."""
    from recommendation_system_big_data_spark.operators.timeseries import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        _HOLT_H,
        ts_holt_linear,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "event_type",
            "datediff(to_date(ts), date'1970-01-01') AS idx",
            "value",
        )
        .collect()
    )
    daily = {}
    for r in ev:
        daily.setdefault(r["event_type"], {}).setdefault(r["idx"], 0)
        # integer cents: exact association-free sum, matching the
        # engine's DECIMAL(18,2) accumulator bit-for-bit
        daily[r["event_type"]][r["idx"]] += round(r["value"] * 100)
    expect = {}
    for key, series in daily.items():
        y = [series[i] / 100.0 for i in sorted(series)]
        if len(y) < 2:
            continue
        level, trend = y[0], y[1] - y[0]
        for x in y[1:]:
            prev = level
            level = _HOLT_ALPHA * x + (1.0 - _HOLT_ALPHA) * (level + trend)
            trend = _HOLT_BETA * (level - prev) + (1.0 - _HOLT_BETA) * trend
        for h in range(1, _HOLT_H + 1):
            # Spark F.round on a double goes through Scala
            # BigDecimal.decimal(d) = valueOf(Double.toString(d)), i.e. it
            # rounds the SHORTEST-REPR decimal value HALF_UP — verified
            # empirically on this Spark (F.round(0.1234565, 6) → 0.123457,
            # where the exact binary value 0.12345649999... would give
            # 0.123456). Decimal(repr(x)) replicates that; Decimal(x) or
            # Python round() would diverge on exactly the midpoint class
            # this test pins.
            from decimal import ROUND_HALF_UP, Decimal

            expect[(key, h)] = float(
                Decimal(repr(level + h * trend)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

    got = {
        (r["event_type"], r["h"]): r["forecast"]
        for r in ts_holt_linear(spark, sf_dir).collect()
    }
    assert got == expect
