"""Custom Python DataSource (Spark 4 DataSource API) — the extension
point for reading formats Spark has no built-in connector for.

The reference reads only CSV; a 100 TB deployment inevitably meets a
bespoke format (proprietary log framing, an internal record service).
Spark 4's Python DataSource API is the sanctioned way in: the source
declares its schema and a PARTITION PLAN, and executors pull their
partitions in parallel through Arrow — no driver materialization, no
single-threaded ingest. The demo source generates a deterministic
synthetic record stream (hash-derived values, no RNG), so the DuckDB
oracle can regenerate it exactly from `generate_series`.

Worker-pickling discipline (same rule as functions/pandas_fns.py): the
DataSource classes are defined INSIDE the query function, so cloudpickle
serializes them BY VALUE. Module-level classes would pickle by reference
and die with ModuleNotFoundError on executors when the driver-owned
session has the repo only on driver sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from recommendation_system_big_data_spark.registry import register
from recommendation_system_big_data_spark.session import ensure_runtime_conf

#: Rows and partition count of the synthetic source (options to the API).
_N_ROWS = 10_000
_N_PARTS = 8

_PYDS_ORACLE = f"""
SELECT g.i AS id,
       CAST(g.i % 32 AS INTEGER) AS bucket,
       CAST((g.i * 7919) % 104729 AS DOUBLE) / 104729 AS val
FROM UNNEST(generate_series(0, {_N_ROWS - 1})) AS g(i)
"""


@register("scan_python_datasource", oracle=_PYDS_ORACLE, tags=("source",))
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through a registered custom Python DataSource: 8 planned
    input partitions, each executor generating its slice — the partition
    fan-out (not the toy payload) is the point. Values are integer-exact
    before one final double division, so both engines produce identical
    IEEE doubles with no rounding tolerance needed."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    ensure_runtime_conf(spark)

    class SynthReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 1000))
            self.parts = int(options.get("parts", 4))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            # round-robin slice: partition i yields rows i, i+P, i+2P, …
            for k in range(partition.value, self.n, self.parts):
                yield (k, k % 32, (k * 7919 % 104729) / 104729)

    class SynthSource(DataSource):
        @classmethod
        def name(cls):
            return "rsbd_synth"

        def schema(self):
            return "id bigint, bucket int, val double"

        def reader(self, schema):
            return SynthReader(self.options)

    spark.dataSource.register(SynthSource)
    return (
        spark.read.format("rsbd_synth")
        .option("n", str(_N_ROWS))
        .option("parts", str(_N_PARTS))
        .load()
    )


@register("stream_python_datasource", oracle=None, tags=("source", "streaming"))
def stream_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming half of the DataSource API: a SimpleDataSourceStreamReader
    serving deterministic offset-tracked micro-batches — the template for a
    bespoke queue/service connector when Kafka isn't the transport.

    The reader's contract is the offset protocol: initialOffset → read
    (returns rows + next offset) → commit. AvailableNow snapshots only the
    FIRST read's progress for a simple reader, so the query runs on the
    default micro-batch trigger and is stopped once the offset stops
    advancing — four 2 500-row batches, then an empty read. The final
    memory-sink table is exactly rows [0, _N_ROWS) — asserted against the
    batch source in tests/test_streaming.py. ⊘ rows-only (micro-batch
    execution is not SQL-expressible); classes nested for by-value
    pickling, as above."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    ensure_runtime_conf(spark)
    batch_rows = 2500

    class SynthStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            if pos >= _N_ROWS:
                return iter([]), {"pos": pos}
            end = min(pos + batch_rows, _N_ROWS)
            rows = [
                (k, k % 32, (k * 7919 % 104729) / 104729)
                for k in range(pos, end)
            ]
            return iter(rows), {"pos": end}

        def readBetweenOffsets(self, start, end):
            rows = [
                (k, k % 32, (k * 7919 % 104729) / 104729)
                for k in range(start["pos"], end["pos"])
            ]
            return iter(rows)

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "rsbd_synth_stream"

        def schema(self):
            return "id bigint, bucket int, val double"

        def simpleStreamReader(self, schema):
            return SynthStreamReader()

    spark.dataSource.register(SynthStreamSource)

    name = "rsbd_pyds_stream"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = spark.readStream.format("rsbd_synth_stream").load()
    query = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            query.processAllAvailable()
            if spark.table(name).count() >= _N_ROWS:
                break
            time.sleep(0.2)
    finally:
        query.stop()
    return spark.table(name)


_PYDS_SINK_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderkey % 10 = 0
GROUP BY o_orderstatus
"""


@register("sink_python_datasource", oracle=_PYDS_SINK_ORACLE, tags=("sink",))
def sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE through a custom Python DataSource (the writer half of the
    Spark 4 Python DataSource API — scan_python_datasource covers the
    read half): each executor task serializes its partition to one
    JSON-lines file via DataSourceWriter.write, Spark collects the
    commit messages, and the round-trip read-back + aggregate must
    hash-match the source table — proving the custom sink lost nothing.
    Classes are defined INSIDE the function (by-value pickling, same
    rule as the readers); output is pid-scoped like every other sink.
    The per-task file layout is exactly how real custom sinks (feature
    stores, search indexes) shard their output."""
    import json
    import os

    from pyspark import TaskContext
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    from recommendation_system_big_data_spark.catalog import load
    from recommendation_system_big_data_spark.sources.sinks import _sink_dir

    ensure_runtime_conf(spark)
    out = _sink_dir(sf_dir, "pyds")
    # The writer appends partition-id-named files; a rerun with fewer
    # partitions (AQE / conf change) would otherwise leave stale parts
    # that the read-back double-counts. Clear first = overwrite semantics.
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    class LineFileWriter(DataSourceWriter):
        def __init__(self, options):
            self._path = options.get("path")

        def write(self, iterator):
            import json as _json
            import os as _os

            ctx = TaskContext.get()
            part = ctx.partitionId() if ctx is not None else 0
            tmp = _os.path.join(self._path, f"part-{part:05d}.jsonl")
            with open(tmp, "w") as fh:
                for row in iterator:
                    fh.write(_json.dumps(row.asDict()) + "\n")
            return WriterCommitMessage()

    class LineFileSink(DataSource):
        @classmethod
        def name(cls):
            return "rsbd_line_sink"

        def writer(self, schema, overwrite):
            return LineFileWriter(self.options)

    spark.dataSource.register(LineFileSink)
    rows = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double"))
    )
    (
        rows.write.format("rsbd_line_sink")
        .option("path", out)
        .mode("append")
        .save()
    )
    back = spark.read.schema(rows.schema).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )
