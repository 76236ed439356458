"""Arrow-batched (vectorized) Python UDF surface — the sanctioned escape
hatch when built-in functions genuinely can't express a transform.

Policy (SURVEY.md §4 / SCALING.md): nothing in the engine's hot paths uses
Python UDFs — every shipped operator is built-in/codegen'd. This module
exists to prove the *capability* with the right plumbing: `@pandas_udf`
receives whole Arrow record batches (one Python invocation per ~10k rows,
numpy-vectorized inside) instead of the row-at-a-time pickled path that is
10-100× slower. The multimodal operators (operators/multimodal.py) use the
same machinery via mapInPandas for binary payloads.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import epoch_s, epoch_us, load
from recommendation_system_big_data_spark.registry import register


def _log_damped_udf():
    """Build the vectorized UDF lazily — pandas_udf resolves its return
    type against the active session, so decorating at import time would
    require a SparkSession just to import the registry."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log_damped(v: pd.Series) -> pd.Series:
        """Vectorized ln(1+|v|)·sign(v) — one numpy expression per batch."""
        import numpy as np

        return pd.Series(np.log1p(np.abs(v)) * np.sign(v))

    return log_damped


@register(
    "fn_pandas_udf_vectorized",
    oracle="""
    SELECT event_id,
           ROUND(ln(1 + abs(value)) * sign(value), 6) AS damped
    FROM events
    """,
    tags=("scalar", "udf"),
)
def fn_pandas_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A scalar `@pandas_udf` transform over the event stream, oracle-checked
    against the closed-form SQL. The plan shows ArrowEvalPython — batches
    cross the JVM↔Python boundary as Arrow buffers, and the UDF cost is one
    numpy expression per batch. (For anything this expressible, prefer the
    built-in: `F.log1p(F.abs(v)) * F.signum(v)` stays in codegen — that is
    the engine's actual convention; this query exists to keep the UDF
    plumbing exercised and correct.)"""
    damped = _log_damped_udf()
    return load(spark, sf_dir, "events").select(
        "event_id", F.round(damped(F.col("value")), 6).alias("damped")
    )


_SLOPE_SCHEMA = "user_id long, n long, slope double"

_SLOPE_ORACLE = """
SELECT user_id,
       COUNT(*) AS n,
       ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 4) AS slope
FROM events
GROUP BY user_id
"""


def _slope_fn():
    """Build the per-group OLS slope function: value vs time-in-hours,
    numerically stabilized by centering x (the covariance/variance form
    regr_slope also uses). Returned as a NESTED function on purpose:
    cloudpickle serializes closures by value, so Spark's Python workers
    never need this package importable — a module-level function would be
    pickled by reference and fail under the driver's vanilla session."""

    def slope(pdf):
        import pandas as pd_local

        # regr_slope pair semantics: a NULL on either side drops the
        # pair (NaN would otherwise poison the sums); n stays the full
        # group row count to match the oracle's COUNT(*). NaN-masking
        # on the numpy arrays, not DataFrame.dropna — the block-manager
        # copy per group measurably slowed the whole query (2.6→3.7s
        # at sf0.1) while the x==x mask is branch-free and skipped
        # entirely on the (typical) all-valid group.
        x = pdf["ts_hours"].to_numpy(dtype="float64")
        y = pdf["value"].to_numpy(dtype="float64")
        m = (x == x) & (y == y)
        if not m.all():
            x, y = x[m], y[m]
        xc = x - x.mean() if len(x) else x
        denom = (xc * xc).sum()
        s = float((xc * y).sum() / denom) if denom > 0 else None
        return pd_local.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [len(pdf)],
                "slope": [None if s is None else round(s, 4)],
            }
        )

    return slope


@register(
    "grouped_pandas_slope",
    oracle=_SLOPE_ORACLE,
    tags=("agg", "udf"),
)
def grouped_pandas_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map `applyInPandas`: per-user OLS trend (value vs time) where
    each user's events arrive as one pandas DataFrame — the custom-per-group-
    model shape (per-entity regression/seasonality/forecast) that has no
    built-in aggregate. One shuffle on the group key, Arrow both ways, and
    each group must fit one executor's memory — the documented contract of
    grouped map (bounded per-user history here; at 100 TB cap or window the
    per-key rows first). Oracle: DuckDB's closed-form regr_slope over the
    same centered-x arithmetic; x is scaled to hours so slopes are O(1) and
    survive ROUND(,4) across engines."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (epoch_us("ts") / F.lit(3.6e9)).alias("ts_hours"),
        "value",
    )
    return ev.groupBy("user_id").applyInPandas(_slope_fn(), schema=_SLOPE_SCHEMA)


@register(
    "agg_slope_builtin",
    oracle=_SLOPE_ORACLE,
    tags=("agg",),
)
def agg_slope_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JVM twin of `grouped_pandas_slope`: identical per-user OLS
    slope computed with built-in aggregates — covar_pop/var_pop is
    exactly regr_slope's closed form, one map-side-combined groupBy, no
    Python anywhere. Same oracle as the pandas version, so the pair
    PROVES semantic equivalence while the bench prices the boundary:
    this is the path the engine convention prescribes whenever the
    per-group model is expressible as aggregates; applyInPandas is for
    models that are not (see grouped_pandas_slope's docstring).

    Numerical note: covar_pop/var_pop accumulate co-moments in one pass
    (Welford-style), which for this centered-x arithmetic agrees with
    the two-pass pandas computation within an ulp — ROUND(,4) absorbs
    it on both engines, as it already does for DuckDB's regr_slope."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (epoch_us("ts") / F.lit(3.6e9)).alias("x"),
        F.col("value").alias("y"),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        slope_agg_expr("x", "y").alias("slope"),
    )


def slope_agg_expr(x: str, y: str):
    """regr_slope as built-in co-moments, with regr_slope's PAIR
    semantics: a NULL on either side drops the pair. covar_pop already
    does, but a bare var_pop(x) would keep an x whose y is NULL and
    silently diverge — masking x through y's nullness gives both
    co-moments the same pair set (pinned by
    tests/test_property_stats.py::test_slope_builtin_null_pair_semantics)."""
    xp = F.when(F.col(y).isNotNull(), F.col(x))
    return F.when(
        F.var_pop(xp) > 0,
        F.round(F.covar_pop(xp, F.col(y)) / F.var_pop(xp), 4),
    )


def _arrow_stats_fn():
    """mapInArrow batch function, nested for by-value pickling (see
    _slope_fn). Consumes pyarrow RecordBatches directly — no pandas
    conversion at all, the cheapest possible Python boundary."""

    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            v = batch.column("value")
            absv = pc.abs(v)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pc.round(pc.multiply(absv, pa.scalar(2.0)), 6),
                ],
                names=["event_id", "double_abs"],
            )

    return batch_stats


@register(
    "fn_map_in_arrow",
    oracle="""
    SELECT event_id, ROUND(abs(value) * 2.0, 6) AS double_abs FROM events
    """,
    tags=("scalar", "udf"),
)
def fn_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the third (and cheapest) Python-boundary tier. Batches
    arrive as raw pyarrow RecordBatches — no Arrow→pandas materialization,
    so the per-batch overhead is a pointer handoff, not a Series build.
    The tier ladder the engine documents: built-ins (codegen, the hot-path
    rule) → @pandas_udf / mapInPandas (Arrow + pandas, for numpy-shaped
    logic) → mapInArrow (Arrow only, for columnar codecs and zero-copy
    passthroughs like the multimodal payload filters). Oracle-checked
    against the closed-form SQL."""
    ev = load(spark, sf_dir, "events").select("event_id", "value")
    return ev.mapInArrow(_arrow_stats_fn(), "event_id long, double_abs double")


def _tail_share_udf():
    """Iterator-of-Series pandas UDF, nested for by-value pickling. The
    iterator form exists for expensive ONE-TIME init (model weights, a
    tokenizer): the setup runs once per PARTITION, then streams every
    Arrow batch through it — a plain pandas_udf would re-enter Python
    cold for every batch with no place to hold state."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def tail_share(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        threshold = 75.0  # stand-in for "load the model once per partition"
        for v in it:
            yield pd.Series(np.where(v.to_numpy() >= threshold, 1.0, 0.0))

    return tail_share


@register(
    "fn_pandas_udf_iterator",
    oracle="""
    SELECT event_id,
           CAST(CASE WHEN value >= 75.0 THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS is_tail
    FROM events
    """,
    tags=("scalar", "udf"),
)
def fn_pandas_udf_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator pandas UDF (SCALAR_ITER): per-partition init amortized
    across all of a partition's Arrow batches — the shape for UDFs that
    load weights/tokenizers. Oracle-checked against the closed-form
    threshold."""
    tail = _tail_share_udf()
    return load(spark, sf_dir, "events").select(
        "event_id", tail(F.col("value")).alias("is_tail")
    )


_COGROUP_SCHEMA = "user_id long, n_events long, n_sessions long, events_per_session double"


def _cogroup_ratio_fn():
    """Cogrouped-map function (nested, by-value pickled): receives BOTH
    groups for a key — the events batch and the sessions batch — as
    pandas frames, locally aligned. The cogroup is Spark's two-sided
    grouped-map: a full shuffle co-partitions both inputs on the key, then
    Python sees each key exactly once with both sides."""

    def ratio(events_pdf, sessions_pdf):
        import pandas as pd

        uid = (
            events_pdf["user_id"].iloc[0]
            if len(events_pdf)
            else sessions_pdf["user_id"].iloc[0]
        )
        n_ev = int(len(events_pdf))
        n_sess = int(sessions_pdf["n_sessions"].iloc[0]) if len(sessions_pdf) else 0
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_events": [n_ev],
                "n_sessions": [n_sess],
                "events_per_session": [
                    round(n_ev / n_sess, 6) if n_sess else None
                ],
            }
        )

    return ratio


@register(
    "cogrouped_pandas_ratio",
    oracle="""
    WITH stamped AS (
        SELECT user_id, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_us
        FROM events
    ), sess AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 43200000000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM stamped GROUP BY user_id
    ), ev AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    )
    SELECT ev.user_id, ev.n_events, sess.n_sessions,
           ROUND(CAST(ev.n_events AS DOUBLE) / sess.n_sessions, 6)
               AS events_per_session
    FROM ev JOIN sess ON ev.user_id = sess.user_id
    """,
    tags=("udf", "window"),
)
def cogrouped_pandas_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().cogroup().applyInPandas — the two-sided grouped-map API:
    each user's raw events AND their per-user session count (from
    sessionize_events' rollup) arrive together in Python, co-partitioned
    by one shuffle each. Here the Python body is a trivial ratio (so the
    DuckDB oracle can check the plumbing end-to-end); the real use is
    two-sided per-key logic that SQL can't express — custom as-of
    matching, per-key model scoring against a feature group. Hot-path
    rule still applies: this exact ratio SHOULD be a join + division
    (see the oracle); the query exists to keep the cogroup machinery
    exercised and correct."""
    from recommendation_system_big_data_spark.operators.windows import (
        sessionize_events,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "event_id")
    sessions = (
        sessionize_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_idx").alias("n_sessions"))
    )
    return (
        ev.groupBy("user_id")
        .cogroup(sessions.groupBy("user_id"))
        .applyInPandas(_cogroup_ratio_fn(), _COGROUP_SCHEMA)
    )


def _token_offsets_udtf():
    """Build the token-offset UDTF. The decorated CLASS is defined inside
    this factory on purpose: cloudpickle serializes module-level classes BY
    REFERENCE, which dies with ModuleNotFoundError on Python workers that
    don't share the driver's sys.path (the round driver's vanilla session);
    a closure-scoped class pickles by value."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token_idx int, token string, char_start int")
    class TokenOffsets:
        def eval(self, text: str):
            pos = 0
            for i, tok in enumerate(text.split(" ")):
                yield i, tok, pos
                pos += len(tok) + 1

    return TokenOffsets


_UDTF_ORACLE = """
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       CAST(i - 1 AS INT) AS token_idx,
       toks[i] AS token,
       CAST(COALESCE(SUM(len(toks[i]) + 1) OVER (
                PARTITION BY doc_id ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS char_start
FROM t, UNNEST(generate_series(1, len(toks))) AS g(i)
"""


@register("fn_python_udtf", oracle=_UDTF_ORACLE, tags=("udf", "text"))
def fn_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+) — the last rung of the
    Python-boundary ladder: one input row yields MANY output rows from
    imperative Python, consumed through LATERAL. Here: tokens with their
    character offsets (the span bookkeeping every annotation/NER pipeline
    threads through chunking).

    The oracle reproduces the offsets relationally (UNNEST + running
    window sum) — which is also the engine's own preferred spelling for
    this particular job; the UDTF exists to keep the table-function
    plumbing exercised, priced, and correct (same built-in-first rule as
    every rung: fn docstrings in this module). UDTF rows stream through
    Arrow batches partition-locally — no shuffle, scales as a map stage."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("v_docs_udtf")
    spark.udtf.register("token_offsets", _token_offsets_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, t.token_idx, t.token, t.char_start
        FROM v_docs_udtf d, LATERAL token_offsets(d.text) t
        """
    )


def _geomean_udaf():
    """Grouped-agg pandas UDAFs (Series → scalar), built lazily like the
    scalar UDFs above and nested so cloudpickle ships them by value.
    Spark disallows mixing a grouped-agg pandas UDF with non-pandas
    aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the row
    count is a second UDAF rather than F.count."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        import numpy as np

        return float(np.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def ncount(v: pd.Series) -> int:
        return int(len(v))

    return geomean, ncount


@register(
    "fn_pandas_udaf_grouped",
    oracle="""
    SELECT event_type,
           ROUND(EXP(AVG(LN(value))), 4) AS geo_mean,
           COUNT(*) AS n
    FROM events WHERE value > 0
    GROUP BY event_type
    """,
    tags=("agg", "udf"),
)
def fn_pandas_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF — the aggregation rung of the Python tier
    ladder (scalar → iterator → grouped-map → cogrouped-map → UDAF):
    per-type geometric mean of positive event values, one Arrow batch per
    group reduced to one scalar in numpy.

    The closed form EXP(AVG(LN(v))) is the oracle AND the better engine
    spelling (stays in codegen, map-side combines); the UDAF exists to
    keep the aggregation boundary exercised — it is the shape you need
    when the per-group reduction has no SQL closed form (trimmed
    estimators, order statistics over weights). Caveat priced into the
    plan: a grouped-agg UDAF has NO partial aggregation — every raw row
    shuffles to its group's task, where built-in aggregates ship one
    partial state per map task. Rounded to 4 decimals (not 6): the log
    sum accumulates in engine-specific order, so the 6th decimal can flip
    on larger groups (same precision budget as agg_regression_stats)."""
    geo, ncount = _geomean_udaf()
    ev = load(spark, sf_dir, "events").filter(F.col("value") > 0)
    return ev.groupBy("event_type").agg(
        F.round(geo("value"), 4).alias("geo_mean"),
        ncount("value").alias("n"),
    )


#: Misra-Gries summary capacity per partition. Guarantee: an item with
#: GLOBAL frequency > N/MG_K has per-partition frequency > N_p/MG_K in at
#: least one partition (pigeonhole over the partition sums), and per-
#: partition MG with capacity MG_K never evicts such an item to zero —
#: so the union of per-partition candidate sets is a superset of the true
#: heavy hitters. False positives are killed by the exact recheck pass.
MG_K = 200


def _mg_candidates_fn():
    """Factory for the per-partition Misra-Gries pass (closure-pickled —
    module-level functions die on vanilla-session Python workers, see
    _token_offsets_udtf). Consumes the whole partition's Arrow batches
    through one iterator, maintains a bounded MG_K-entry summary, and
    emits only the surviving candidates."""

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < MG_K:
                    counters[tok] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        if counters:
            yield pd.DataFrame({"token": list(counters.keys())})

    return mg


_HH_ORACLE = """
WITH tok AS (
    SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
), t AS (
    SELECT token FROM tok WHERE token <> ''
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY token
HAVING COUNT(*) > (SELECT COUNT(*) FROM t) / 200.0
"""


@register("agg_heavy_hitters_mg", oracle=_HH_ORACLE, tags=("udf", "text", "sketch"))
def agg_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (tokens with frequency > N/200) via the two-pass
    Misra-Gries candidate + exact-recheck pattern — the way to find
    frequent items at 100 TB WITHOUT shuffling the full vocabulary:

    - Pass 1: each partition streams once through a bounded MG_K-entry
      summary (mapInPandas over the token stream; O(MG_K) state, no
      shuffle). Pigeonhole guarantees the candidate union contains every
      true heavy hitter (proof at MG_K), so the sketch can only ADD
      spurious candidates, never lose real ones.
    - Pass 2: exact counts for the candidate set only — a broadcast
      semi-join prunes the token stream before the groupBy, so the only
      shuffle aggregates |candidates| ≲ partitions × MG_K keys instead of
      the full vocabulary.

    The final HAVING uses exact counts, which is why this sketch query is
    oracle-checkable bit-for-bit (the oracle is the naive full groupBy):
    the approximation affects WORK, not the ANSWER. Python is the sketch's
    natural home here — MG's data-dependent eviction has no vectorized
    form — and it touches each token exactly once per pass."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    candidates = (
        toks.mapInPandas(_mg_candidates_fn(), "token string").distinct()
    )
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        toks.join(F.broadcast(candidates), "token", "semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n") > F.col("n_total") / 200.0)
        .select("token", "n")
    )


_ARROW_UDF_ORACLE = """
SELECT event_id,
       ROUND(SQRT(ABS(value)) * 3.0 + 1.0, 6) AS scored
FROM events
"""


@register("fn_arrow_python_udf", oracle=_ARROW_UDF_ORACLE, tags=("fn", "python"))
def fn_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4's `useArrow=True`) —
    the middle rung of the Python-boundary ladder this package prices
    end to end: row-at-a-time pickled UDFs (banned repo-wide) →
    THIS (same scalar call signature, Arrow batch transfer, ~2-5×) →
    vectorized pandas_udf (whole-series numpy, fn_pandas_udf_vectorized)
    → built-ins (no boundary at all). Same deliberate-cost contract as
    the pandas tier: the oracle IS the built-in expression, proving the
    boundary adds no semantic drift, only transfer cost.

    Defined as a nested closure so cloudpickle ships it by value — the
    round driver's workers don't share the driver's sys.path
    (tools/probe_foreign_cwd.py gates this)."""
    import decimal
    import math

    from pyspark.sql.functions import udf

    def score(v):
        if v is None:
            return None
        # Half-AWAY-FROM-ZERO to 6 places, matching Spark/DuckDB ROUND.
        # Python's round() is half-to-even, and floor(x*1e6 + 0.5) can
        # disagree within an ulp of a .5 boundary (and overflows 2^53);
        # quantizing the shortest repr via Decimal matches BigDecimal /
        # DuckDB ROUND(double, 6) semantics exactly.
        x = math.sqrt(abs(v)) * 3.0 + 1.0
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    arrow_score = udf(score, "double", useArrow=True)
    return load(spark, sf_dir, "events").select(
        "event_id", arrow_score("value").alias("scored")
    )


_UDTF_TABLE_ORACLE = """
WITH gaps AS (
    SELECT user_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us
    FROM events
)
SELECT user_id,
       CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("fn_udtf_table_arg", oracle=_UDTF_TABLE_ORACLE, tags=("fn", "python"))
def fn_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic UDTF over a TABLE argument (Spark 4):
    `FROM udtf(TABLE(events) PARTITION BY user_id ORDER BY ...)` streams
    each user's rows through a stateful Python class in event order —
    the SQL-surface twin of applyInPandasWithState for BATCH, and the
    shape for per-key sequential logic (here: longest inter-event gap)
    when the caller lives in SQL, not the DataFrame API. The engine
    handles the shuffle/sort from the PARTITION BY/ORDER BY clause; the
    UDTF sees one ordered partition per key and may yield any number of
    rows.

    The class is defined INSIDE this function so cloudpickle ships it by
    value (module-level classes pickle by reference and die on the round
    driver's workers — same rule as every pandas fn here, gated by
    tools/probe_foreign_cwd.py). The gap math uses integer microseconds;
    the oracle is the LAG-window formulation — proving the sequential
    Python and the relational spelling agree exactly."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class UserGaps:
        def __init__(self):
            self.user = None
            self.prev_us = None
            self.n = 0
            self.max_gap = None

        def eval(self, row):
            self.user = row["user_id"]
            us = row["us"]
            if self.prev_us is not None:
                gap = us - self.prev_us
                if self.max_gap is None or gap > self.max_gap:
                    self.max_gap = gap
            self.prev_us = us
            self.n += 1

        def terminate(self):
            if self.user is not None and self.max_gap is not None:
                yield self.user, self.n, self.max_gap

    spark.udtf.register("rsbd_user_gaps", UserGaps)
    load(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("us")
    ).createOrReplaceTempView("events_udtf_src")
    return spark.sql(
        """
        SELECT * FROM rsbd_user_gaps(
            TABLE(events_udtf_src) PARTITION BY user_id ORDER BY (us, event_id)
        )
        """
    )


def _split_k_udtf():
    """Dynamic-schema UDTF factory: `analyze()` computes the OUTPUT
    SCHEMA from the constant k argument at plan time — the Spark 4 UDTF
    surface a fixed returnType cannot express (here: k segment columns
    from one string). Class nested for by-value pickling, same rule as
    every Python-row-path factory in this package."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"seg_{i + 1}", StringType())
                        for i in range(k.value)
                    ]
                )
            )

        def eval(self, text, k):
            parts = (text or "").split(" ")
            yield tuple(
                parts[i] if i < len(parts) else None for i in range(k)
            )

    return udtf(SplitK)


_UDTF_DYN_ORACLE = """
WITH t AS (
    SELECT p_partkey, string_split(p_name, ' ') AS w
    FROM part WHERE p_partkey % 50 = 0
)
SELECT p_partkey, w[1] AS seg_1, w[2] AS seg_2, w[3] AS seg_3
FROM t
"""


@register("fn_udtf_dynamic_schema", oracle=_UDTF_DYN_ORACLE, tags=("fn",))
def fn_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with a plan-time computed schema: `analyze()` reads the
    foldable k argument and emits k typed output columns — the dynamic
    half of the Python UDTF API (fn_python_udtf pins the static
    returnType form, fn_udtf_table_arg the TABLE-argument form). The
    planner sees real per-column types, so downstream pruning and
    codegen treat the UDTF output like any relation — this, not
    convenience, is why analyze() exists. Lateral-joined per part row,
    splitting p_name's first 3 words into columns."""
    load(spark, sf_dir, "part").filter(
        F.col("p_partkey") % 50 == 0
    ).createOrReplaceTempView("part_udtf_dyn")
    spark.udtf.register("rsbd_split_k", _split_k_udtf())
    return spark.sql(
        """
        SELECT t.p_partkey, s.*
        FROM part_udtf_dyn t, LATERAL rsbd_split_k(t.p_name, 3) s
        """
    )
