"""Per-query drift report against first-recorded baselines.

BASELINE.md's policy: each headline query's FIRST driver-recorded run
(BENCH_r{N}.json, field `parsed.queries`) is its baseline; the gate is
2× at sf0.1/local[32]. This tool automates the round-end audit that was
previously done by hand: for every query it finds the first recorded
value, the latest value, and the ratio — normalized by the
`sentinel_fixed_cost` control when both rounds carry it (the sentinel's
code never changes, so its drift measures host contention, not
regressions).

Usage:
    python tools/bench_drift.py                 # driver-recorded rounds
    python tools/bench_drift.py current.json    # + a local bench run
                                                # (one bench.py JSON line)

Exit code 1 if any query's (sentinel-normalized when available) ratio
exceeds the 2× gate; the WATCH list marks > 1.5×.
"""

from __future__ import annotations

import glob
import json
import os
import sys

GATE = 2.0
WATCH = 1.5
SENTINEL = "sentinel_fixed_cost"
#: Second host axis (round 9): the CPU sentinel read 0.79x of r8 while
#: the median real query read 1.13x in the same session — burst-CPU
#: speed and shuffle/memory throughput drift independently. When BOTH
#: rounds of an adjacent pair carry the shuffle sentinel, the host
#: factor is the GEOMETRIC MEAN of the two sentinel ratios (each axis
#: weighs equally); otherwise the CPU sentinel alone, then the median
#: fallback.
SENTINEL2 = "sentinel_shuffle_cost"
SENTINELS = (SENTINEL, SENTINEL2)

#: Deliberate plan changes re-baseline EXPLICITLY — never silently.
#: When a query's physical strategy is intentionally replaced (e.g. a
#: VERDICT-ordered scale fix that trades single-host seconds for
#: distributed correctness), its first-recorded number measures the OLD
#: plan and gating against it would punish the ordered fix. Each entry
#: names the first round whose recording measures the NEW plan; until
#: that round exists the query is reported but not gated. Entries are
#: part of the audit trail: the report prints every re-baseline applied,
#: and the rationale lives in BASELINE.md (§re-baselines).
REBASELINED: dict[str, tuple[str, str]] = {
    # r11: VERDICT r10 #2 replaced the bare global-order window (a
    # single-reducer sort over fact grain) with ranges.running_sums'
    # two-phase distributed prefix sum. Hash-identical output; the
    # 0.31s r10 number priced the non-scalable plan. Quiet isolated
    # steady state under the new plan: ~0.72s at sf0.1 (BASELINE.md).
    "ml_eval_pr_auc": (
        "BENCH_r11.json",
        "VERDICT r10 #2: distributed prefix-sum rank replaces the "
        "single-reducer global window",
    ),
    # r12: the r10-committed disposition fired (r10 AND r11 both read
    # >1.5x corrected). Stage-level bisect at sf0.1 (BASELINE.md
    # §round-12, tools/bisect_bm25.py): NO stage grew — tok 0.22s,
    # postings 0.39s, dl 0.23s, dfreq 0.18s, qtok 0.16s, scored 1.23s,
    # window +0.35s, full warm-min 1.67s, i.e. 1.13x the 1.48s r7
    # recording. The 3.28s r11 reading was a host stall of the
    # reshape_pivot-anomaly class; the 1.48 r7 number is a
    # favorable-host vintage artifact (same class as
    # rollup_incremental_agg's 0.37). Baseline re-anchors to the first
    # post-bisect driver recording; plan unchanged (PLANS.md row still
    # 9 shuffles / 3 bcast / WindowGroupLimit intact).
    "text_bm25_retrieval": (
        "BENCH_r12.json",
        "r10 disposition: bisect found no grown stage (steady state "
        "1.67s isolated); r7 1.48s was a favorable-host vintage number "
        "and r11 3.28s a host stall",
    ),
}


def _reconstruct_from_tail(rec: dict) -> dict:
    """Recover the bench JSON line from the driver's 2000-char stdout tail.

    The driver stores only the tail of bench.py's stdout; if the JSON line
    outgrew that cap (r7: 2013 chars) the front of the line is cut and
    ``parsed`` is null. The line's shape is fixed
    (``{"metric": ..., ..., "queries": {...}, "sf": ...}``), so a cut that
    spares the ``"queries"`` object can be repaired by re-wrapping it.
    """
    tail = (rec.get("tail") or "").replace("\\n", "\n").strip()
    line = tail.rsplit("\n", 1)[-1] if tail else ""
    i = line.find('"queries"')
    if i < 0:
        return {}
    try:
        return json.loads("{" + line[i:].rstrip() + ("" if line.rstrip().endswith("}") else "}"))
    except ValueError:
        return {}


def _rounds() -> list[tuple[str, dict]]:
    out = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        try:
            rec = json.load(open(f))
        except (ValueError, OSError):
            continue
        parsed = rec.get("parsed") or _reconstruct_from_tail(rec)
        qs = parsed.get("queries")
        if qs:
            out.append((os.path.basename(f), qs))
    return out


def main() -> int:
    rounds = _rounds()
    for extra in sys.argv[1:]:
        qs = json.load(open(extra)).get("queries")
        if qs:
            name = os.path.basename(extra)
            if any(rname == name for rname, _ in rounds):
                print(f"refusing extra round {extra}: basename {name!r} "
                      "collides with a recorded BENCH round")
                return 2
            rounds.append((name, qs))
    if not rounds:
        print("no bench rounds found")
        return 0

    first: dict[str, tuple[str, float]] = {}
    for rname, qs in rounds:
        for q, v in qs.items():
            first.setdefault(q, (rname, v))
    latest_name, latest = rounds[-1]

    # Apply explicit re-baselines (plan changes): baseline becomes the
    # first recording at-or-after the named round; if that round has no
    # recording yet, the query is reported at ratio 1.0 (ungated) until
    # one lands. Every application is printed — this is audit surface,
    # not a mute button.
    for q, (from_round, why) in REBASELINED.items():
        newbase = None
        for rname, qs in rounds:
            if rname >= from_round and q in qs:
                newbase = (rname, qs[q])
                break
        if newbase is None and q in latest:
            newbase = (latest_name, latest[q])
        if newbase is not None and q in first and first[q] != newbase:
            print(f"re-baselined {q}: {first[q][1]:.2f}s {first[q][0]} -> "
                  f"{newbase[1]:.2f}s {newbase[0]} ({why})")
            first[q] = newbase

    # Host-contention control, chained across rounds. For each adjacent
    # round pair the host factor is the sentinel's ratio when both rounds
    # carry it (the sentinel's code never changes, so its drift is pure
    # host contention); for pre-sentinel rounds (r1-r4) it falls back to
    # the MEDIAN ratio over common queries — robust to individual real
    # regressions, and the only reason r3-baselined queries stopped
    # reading as a fleet-wide 1.5× "regression" after the global r3→r4
    # host shift (median 1.32× across all 31 common queries, measured).
    # H[round] is the host speed index relative to the latest round.
    import statistics

    H: dict[str, float] = {latest_name: 1.0}
    for (aname, aqs), (bname, bqs) in zip(rounds[-2::-1], rounds[::-1]):
        sa, sb = aqs.get(SENTINEL), bqs.get(SENTINEL)
        s2a, s2b = aqs.get(SENTINEL2), bqs.get(SENTINEL2)
        if sa and sb and s2a and s2b:
            # BOTH sentinel ratios are clamped to the same symmetric band
            # as the median fallback before combining (r9 ADVICE: the
            # first cut clamped only the shuffle sentinel; a one-off CPU
            # burst in either round would then skew H by sqrt(spike) and
            # could normalize a real regression to green — the exact
            # failure mode the m2 clamp was added to prevent). Each
            # sentinel is a single job on a shared container; a ratio
            # outside 1/1.4..1.4 is a spike, not a host state, and
            # contributes 1.0 (no correction) instead.
            m1 = sb / sa
            if not 1.0 / 1.4 <= m1 <= 1.4:
                m1 = 1.0
            m2 = s2b / s2a
            if not 1.0 / 1.4 <= m2 <= 1.4:
                m2 = 1.0
            m = (m1 * m2) ** 0.5
        elif sa and sb:
            m = sb / sa
        else:
            common = [
                bqs[q] / aqs[q]
                for q in aqs
                if q in bqs and q not in SENTINELS and aqs[q]
            ]
            m = statistics.median(common) if common else 1.0
            # Host contention on one container plausibly drifts within
            # a symmetric multiplicative ×1.4 band (1/1.4 ≈ 0.714 .. 1.4);
            # a median outside it is a protocol or engine change (r1→r2's
            # 0.405 was the warm-run protocol landing), which must NOT be
            # attributed to the host. Symmetric because a genuine ~0.75×
            # host SPEEDUP is as plausible as a 1.35× slowdown (r8 ADVICE:
            # the old 0.8 floor clamped real speedups to 1.0, reading as
            # engine regression).
            if not 1.0 / 1.4 <= m <= 1.4:
                m = 1.0
        H[aname] = H[bname] / m

    def norm_ratio(q: str, v: float) -> float:
        base_round, base = first[q]
        if not base:
            return float("inf")
        # compare host-corrected values: v / H[latest] vs base / H[base]
        return (v / base) * H.get(base_round, 1.0)

    bad, watch = [], []
    print(f"latest round: {latest_name} ({len(latest)} queries)")
    for q in sorted(latest):
        if q in SENTINELS:
            continue
        r = norm_ratio(q, latest[q])
        base_round, base = first[q]
        line = f"{r:5.2f}x  {q}  ({base:.2f}s {base_round} -> {latest[q]:.2f}s)"
        if r > GATE:
            bad.append(line)
        elif r > WATCH:
            watch.append(line)
    print(f"\nqueries over the {GATE}x gate: {len(bad)}")
    for line in bad:
        print("  GATE ", line)
    print(f"queries on the {WATCH}x watch list: {len(watch)}")
    for line in watch:
        print("  WATCH", line)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
