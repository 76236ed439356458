"""Model-based test for the MERGE/upsert helper: random change feeds are
applied both by operators/merge.apply_changes (distributed full-outer plan)
and by a pure-Python dict model; the snapshots must agree exactly. This
catches semantic drift the fixed upsert_snapshot oracle can't (op mixes,
insert-then-delete keys, payload columns missing from the feed)."""

from __future__ import annotations

import random

from recommendation_system_big_data_spark.operators.merge import apply_changes


def _model_apply(base_rows, changes):
    snap = {k: (s, p) for k, s, p in base_rows}
    for k, op, ns, np_ in changes:
        if op == "D":
            snap.pop(k, None)
        else:  # 'U' over an existing key or 'I' of a new one — same coalesce
            old = snap.get(k, (None, None))
            snap[k] = (
                ns if ns is not None else old[0],
                np_ if np_ is not None else old[1],
            )
    return {(k, s, p) for k, (s, p) in snap.items()}


def test_apply_changes_matches_dict_model(spark):
    rng = random.Random(7)
    for trial in range(5):
        base_keys = rng.sample(range(100), 30)
        base_rows = [(k, f"s{k % 3}", float(k * 10)) for k in base_keys]
        changes = []
        used = set()
        for _ in range(20):
            op = rng.choice(["U", "D", "I"])
            if op == "I":
                k = rng.choice([x for x in range(200, 300) if x not in used])
            else:
                k = rng.choice([x for x in base_keys if x not in used])
            used.add(k)  # compacted feed: one change per key
            if op == "D":
                changes.append((k, "D", None, None))
            else:
                ns = rng.choice([None, "upd"])
                np_ = rng.choice([None, float(k + 0.5)])
                if ns is None and np_ is None:
                    ns = "upd"
                changes.append((k, op, ns, np_))
        base = spark.createDataFrame(
            base_rows, "o_orderkey long, o_orderstatus string, o_totalprice double"
        )
        feed = spark.createDataFrame(
            changes,
            "o_orderkey long, op string, new_o_orderstatus string, new_o_totalprice double",
        )
        got = {
            (r["o_orderkey"], r["o_orderstatus"], r["o_totalprice"])
            for r in apply_changes(base, feed, "o_orderkey").collect()
        }
        assert got == _model_apply(base_rows, changes), f"trial {trial}"
