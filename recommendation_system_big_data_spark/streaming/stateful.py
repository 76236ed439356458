"""Custom stateful streaming operator via applyInPandasWithState —
SURVEY.md §2.10's "custom stateful operators" extension point.

The operator keeps (count, sum, max_ts) per user across micro-batches and
emits the updated stats each batch — the building block for online feature
stores / per-entity counters that tumbling windows can't express (state
lives across windows and batches). Arrow-batched per group; state is a
typed tuple, bounded by the user-id cardinality (at 100 TB: millions of
keys × a few longs — trivially partitioned by the state store)."""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register
from recommendation_system_big_data_spark.streaming.jobs import (
    events_stream,
    run_stream_to_memory,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update_user_stats_fn():
    """Build the state-update function as a CLOSURE: cloudpickle serializes
    nested functions by value, so streaming Python workers never need this
    package importable (a module-level function pickles by reference and
    dies under the round driver's vanilla-session, foreign-cwd condition)."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as pdl

        (user_id,) = key
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pdl.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(total, 6)]}
        )

    return update


def stateful_user_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user running stats with explicit state."""
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _update_user_stats_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register("stream_stateful_user_stats", oracle=None, tags=("streaming",))
def stream_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⊘ true streaming run of the custom stateful operator (AvailableNow →
    memory sink, update mode). tests/test_streaming.py checks the final
    per-user stats equal the batch groupBy."""
    out = run_stream_to_memory(
        stateful_user_stats_stream(spark, sf_dir),
        spark,
        "rsbd_stream_stateful",
        output_mode="update",
    )
    # update-mode memory sink may hold one row per state update; keep the
    # final (max n_events) row per user deterministically.
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("n_events"))
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )


def _user_stats_processor_cls():
    """Build the StatefulProcessor class inside a factory (by-value
    pickling, same rule as above). ValueState holds (n, total) per user;
    each micro-batch folds its rows in and emits the running stats."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pdl

            n, total = (
                self._state.get() if self._state.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pdl.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(total, 6)],
                }
            )

        def close(self) -> None:
            pass

    return UserStatsProcessor


def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-user running stats through transformWithStateInPandas —
    Spark 4's successor to applyInPandasWithState: a StatefulProcessor
    object with named, typed state slots (ValueState/ListState/MapState),
    lifecycle hooks, and timer support, instead of one callback with a
    single state tuple.

    ENVIRONMENT-GATED (same class as the PIL codec and matplotlib
    renderer): the transformWithState state protocol speaks protobuf
    between the JVM and the Python state server, and this container ships
    no google.protobuf — the API crashes at driver-worker init
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Not registered as a
    driver query for that reason; tests/test_streaming.py runs the parity
    check whenever protobuf IS importable, so the operator lights up on a
    normally-provisioned cluster with zero code change. The registered
    applyInPandasWithState operator (above) covers the stateful surface
    in-container."""
    import importlib.util

    if (importlib.util.find_spec("google") is None
            or importlib.util.find_spec("google.protobuf") is None):
        raise ModuleNotFoundError(
            "transformWithStateInPandas needs google.protobuf, which this "
            "container does not provide"
        )
    ev = events_stream(spark, sf_dir).select("user_id", "value")
    out = ev.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_stats_processor_cls()(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    result = run_stream_to_memory(
        out, spark, "rsbd_stream_tws", output_mode="update"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        result.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )


ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("buf", ArrayType(DoubleType())),
        StructField("n_scored", LongType()),
        StructField("n_anomalies", LongType()),
    ]
)

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_scored", LongType()),
        StructField("n_anomalies", LongType()),
    ]
)

#: Mirror of the batch op's constants (operators/windows.py
#: window_rolling_zscore): baseline = up to 20 PRIOR observations, at
#: least 5 required, |z| > 3 flags, sample stddev.
_ANOM_WINDOW = 20
_ANOM_MIN_OBS = 5
_ANOM_THRESHOLD = 3.0


def _rolling_anomaly_fn():
    """Closure factory (by-value pickling — see _update_user_stats_fn)."""

    def update(key, pdfs, state):
        import math

        import pandas as pdl

        (user_id,) = key
        if state.exists:
            buf, n_scored, n_anom = state.get
            buf = list(buf)
        else:
            buf, n_scored, n_anom = [], 0, 0
        rows = pdl.concat(list(pdfs))
        # Event-time order within the batch: state evolves per event
        # exactly as the batch window does per frame.
        rows = rows.sort_values(["ts", "event_id"])
        for v in rows["value"].astype(float):
            window = buf[-_ANOM_WINDOW:]
            if len(window) >= _ANOM_MIN_OBS:
                mu = sum(window) / len(window)
                var = sum((x - mu) ** 2 for x in window) / (len(window) - 1)
                sd = math.sqrt(var)
                if sd > 0:
                    n_scored += 1
                    if abs((v - mu) / sd) > _ANOM_THRESHOLD:
                        n_anom += 1
            buf = (buf + [v])[-_ANOM_WINDOW:]
        state.update((buf, n_scored, n_anom))
        yield pdl.DataFrame(
            {
                "user_id": [user_id],
                "n_scored": [n_scored],
                "n_anomalies": [n_anom],
            }
        )

    return update


def rolling_anomaly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-user rolling-zscore anomaly counters with an explicit
    20-value ring buffer in state."""
    ev = events_stream(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    return ev.groupBy("user_id").applyInPandasWithState(
        _rolling_anomaly_fn(),
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register("stream_rolling_anomaly", oracle=None, tags=("streaming",))
def stream_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """⊘ the streaming twin of window_rolling_zscore (operators/windows.py):
    per-user anomaly counters maintained across micro-batches with a
    bounded 20-value ring buffer in typed state — the online-monitoring
    shape (alert on the event, not in tomorrow's batch) that a windowed
    aggregation cannot express because the baseline spans window
    boundaries. State per key is 20 doubles + 2 longs — at 100 TB the
    state store holds |users| × ~176 bytes, partitioned by key, and each
    micro-batch touches only the keys it carries.

    tests/test_streaming.py pins batch parity: the final streamed counters
    equal the batch frame aggregation when everything arrives in order
    (AvailableNow over static files), which is exactly the determinism a
    replay/backfill through the streaming path must deliver."""
    out = run_stream_to_memory(
        rolling_anomaly_stream(spark, sf_dir),
        spark,
        "rsbd_stream_anomaly",
        output_mode="update",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_scored"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_scored", "n_anomalies")
    )
