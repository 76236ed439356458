"""Degenerate-safe, partition-order-proof statistic fragments shared by
Spark queries AND their DuckDB oracles.

The ANSI degenerate class (COVERAGE.md §r12/r13 hardening): any x/σ-shaped
exit raises DIVIDE_BY_ZERO under ANSI Spark where DuckDB NULLs — and a
guard that tests a FLOAT sufficient statistic for zero is itself a knife
edge, because double summation order differs across engines/partitionings
(the r13 probe caught olap_price_elasticity's first guard diverging exactly
this way). The robust recipe, applied here once and reused:

1. accumulate sufficient statistics EXACTLY — decimal sums of
   decimal-cast inputs (order-independent, identical on both engines);
2. guard on EXACT conditions — ``MIN(x) = MAX(x)`` (per-row values are
   identical doubles on both engines) or an exact-integer denominator;
3. exit through ONE shared double expression — the same SQL text is
   parsed by Spark (`F.expr`) and DuckDB, so the doubles are bit-identical
   and ROUND agrees.

Note: Spark's builtin ``corr``/``stddev``/``covar`` aggregates evaluate
their internal division INSIDE the aggregate, so no outer CASE can stop
the ANSI raise — the sums-based rewrite below is the only guardable form.

These fragments assume non-null inputs (the TPC-H-shaped fixture columns;
callers with nullable columns pre-filter).
"""

from __future__ import annotations


def guarded_pearson_sql(a: str, b: str, *, dec: str = "DECIMAL(19,2)",
                        where: str | None = None, digits: int = 4) -> str:
    """Zero-variance-guarded Pearson correlation of two non-null numeric
    columns, valid in both Spark SQL and DuckDB.

    Sums are exact decimals (a 2-dp money/quantity column cast to ``dec``
    is exact, and decimal SUM is order-independent), so the min=max guard
    and the double exit behave identically cross-engine. The residual
    ``den = 0`` guard covers double cancellation when min < max but the
    centered moment rounds to exactly zero — the test runs on the SAME
    doubles both engines computed, so it trips identically.

    ``dec`` width MUST be 19-or-wider (and ≤ (19, s)): DuckDB stores
    width ≤ 18 decimals in int64 and its multiply then overflows at
    ~1e9-unscaled operands instead of widening, while width 19 forces the
    int128 path; and w1 + w2 ≤ 38 is DuckDB's multiply bind limit, so 19
    is also the max. Spark's (19,s)×(19,s) → precision cap keeps scale
    ≥ 2s-1; with ≤ 2-dp inputs every product is exact at that scale.
    """
    ca, cb = f"CAST({a} AS {dec})", f"CAST({b} AS {dec})"
    return guarded_pearson_sql_prequantized(
        ca, cb, raw_a=a, raw_b=b, where=where, digits=digits
    )


def guarded_pearson_sql_prequantized(
    ca: str, cb: str, *, raw_a: str | None = None, raw_b: str | None = None,
    where: str | None = None, digits: int = 4,
) -> str:
    """Like :func:`guarded_pearson_sql` but over expressions ``ca``/``cb``
    that are ALREADY exact (decimal columns or quantized integers) and
    multiply-safe in both engines. ``where`` adds a ``FILTER (WHERE …)``
    clause to every aggregate — the null-aligned-pairs form (e.g. lagged
    series where only complete pairs count); both engines support the
    standard FILTER clause. With an empty or all-NULL filtered set every
    guard comparison is NULL, the CASE falls through, and the exit is
    NULL arithmetic — no raise on either engine.
    """
    raw_a, raw_b = raw_a or ca, raw_b or cb
    f = f" FILTER (WHERE {where})" if where else ""
    n = f"CAST(COUNT(*){f} AS DOUBLE)"
    sa = f"CAST(SUM({ca}){f} AS DOUBLE)"
    sb = f"CAST(SUM({cb}){f} AS DOUBLE)"
    sab = f"CAST(SUM({ca} * {cb}){f} AS DOUBLE)"
    saa = f"CAST(SUM({ca} * {ca}){f} AS DOUBLE)"
    sbb = f"CAST(SUM({cb} * {cb}){f} AS DOUBLE)"
    den = (f"(SQRT({n} * {saa} - {sa} * {sa})"
           f" * SQRT({n} * {sbb} - {sb} * {sb}))")
    return (
        f"CASE WHEN MIN({raw_a}){f} = MAX({raw_a}){f}"
        f" OR MIN({raw_b}){f} = MAX({raw_b}){f} THEN NULL"
        f" WHEN {den} = 0 THEN NULL"
        f" ELSE ROUND(({n} * {sab} - {sa} * {sb}) / {den}, {digits}) END"
    )


def normal_cdf_sql(z: str) -> str:
    """Standard normal CDF Φ(z) as one SQL expression valid in both
    Spark and DuckDB — neither engine ships erf/Φ, so z-statistics
    could not emit p-values until now. Abramowitz & Stegun 26.2.17
    (Zelen–Severo polynomial), |error| < 7.5e-8: far inside the
    ROUND(6) budget every p-value output uses. The literals parse to
    identical doubles on both engines and the arithmetic is
    expression-identical; the only cross-engine freedom is EXP's last
    ulp, ~1e-16 relative — the established libm-absorbed-by-ROUND
    class (ts_periodogram_dft's cos/sin note).

    ``z`` must be a parenthesized-safe expression; NULL propagates.
    """
    # Every constant is written in e-notation: a bare `0.2316419` parses
    # as a DECIMAL literal on BOTH engines, and their differing decimal
    # promotion rules then diverge the arithmetic at ~1e-11 (caught by
    # test_normal_cdf_fragment_matches_erf); `...e0` is a DOUBLE literal
    # everywhere, making the expression bit-deterministic up to libm EXP.
    az = f"ABS({z})"
    t = f"(1e0 / (1e0 + 2.316419e-1 * {az}))"
    poly = (
        f"({t} * (3.19381530e-1 + {t} * (-3.56563782e-1 + {t} *"
        f" (1.781477937e0 + {t} * (-1.821255978e0 + {t} *"
        f" 1.330274429e0)))))"
    )
    upper = (
        f"(1e0 - EXP(-({az} * {az}) / 2e0) / 2.5066282746310002e0 * {poly})"
    )
    return f"(CASE WHEN {z} >= 0 THEN {upper} ELSE 1e0 - {upper} END)"


def chi2_sf_sql(x: str, df: int) -> str:
    """Chi-square survival function P(X² > x) at integer ``df`` as one
    SQL expression valid in both Spark and DuckDB, via the
    Wilson–Hilferty (1931) cube-root normal approximation:
    (X²/df)^(1/3) ≈ N(1 − 2/(9df), 2/(9df)). Classic published
    approximation, relative error ~1e-3 in the tail for df ≥ 1 —
    adequate for reporting a test's p-value (the decision thresholds
    .05/.01 are nowhere near its error band for the statistics the
    engine emits), and expression-identical on both engines so a
    ROUND(6) hash sees zero cross-engine freedom beyond libm EXP/POW
    (the established absorbed class).

    ``x`` must be a parenthesized-safe expression; NULL propagates.
    x ≤ 0 pins the survival to 1 (POW of a negative base at a
    fractional exponent is NULL/NaN on the engines, so the guard is
    correctness, not cosmetics).
    """
    c = 2.0 / (9.0 * df)
    z = f"((POW(({x}) / {float(df)!r}, 1e0/3e0) - 1e0 + {c!r}) / SQRT({c!r}))"
    return (
        f"(CASE WHEN ({x}) <= 0e0 THEN 1e0"
        f" ELSE 1e0 - {normal_cdf_sql(z)} END)"
    )


def chi2_sf_sql_expr(x: str, df_expr: str) -> str:
    """`chi2_sf_sql` with the degrees of freedom as a SQL EXPRESSION
    (for contingency tests whose df depends on the observed table
    shape). Same Wilson–Hilferty approximation, same guard; ``df_expr``
    must evaluate to a positive DOUBLE-compatible value, NULL
    propagates."""
    c = f"(2e0 / (9e0 * ({df_expr})))"
    z = (
        f"((POW(({x}) / ({df_expr}), 1e0/3e0) - 1e0 + {c}) / SQRT({c}))"
    )
    return (
        f"(CASE WHEN ({x}) <= 0e0 THEN 1e0"
        f" ELSE 1e0 - {normal_cdf_sql(z)} END)"
    )
