"""SparkSession factory.

Mirrors the reference's session configuration (model-als.py:177-190: local
master sized to the machine, explicit driver/executor memory, off-heap
enabled) while adding the scale-oriented settings the reference leaves at
defaults: AQE (runtime re-planning, post-shuffle coalescing, skew-join
splitting), Arrow for any pandas interchange, and a UTC session timezone so
epoch math is reproducible across engines.

At 100 TB on a real cluster the same factory applies — only `master`,
memory sizing, and `spark.sql.shuffle.partitions` change (rule of thumb:
~2-3× total executor cores, or rely on AQE coalescing from a high initial
count). Nothing in the engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied by :func:`get_spark` AND re-applied (where runtime-settable)
#: by :func:`ensure_runtime_conf` so the engine behaves identically under a
#: driver-owned SparkSession it did not create.
RUNTIME_CONF = {
    # The reference relies on Catalyst defaults; we turn on the adaptive layer
    # explicitly because at scale it converts sort-merge joins to broadcast at
    # runtime, coalesces small post-shuffle partitions, and splits skewed ones.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow makes toPandas()/mapInPandas columnar-batched (SURVEY.md §1.1).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Driver testdata events.ts is parquet TIMESTAMP(NANOS); Spark has no
    # nanosecond timestamp type, so read it as a long and convert in the
    # catalog (catalog.load) via integer division — double division would
    # lose precision above 2^53.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic epoch math in oracles (DuckDB epoch() is TZ-naive).
    "spark.sql.session.timeZone": "UTC",
    # Loud-overflow contract (VERDICT r11 #5): every integer-exact query
    # rides DECIMAL(38,0) sums with the promise that crossing the width
    # budget ERRORS instead of wrapping. That promise is ANSI semantics —
    # pin it rather than inherit the build default, so a driver-owned
    # session with ansi=false can't silently turn overflow into nulls.
    # (Spark 4 defaults true; this is a guard, not a behavior change.)
    "spark.sql.ansi.enabled": "true",
}

BUILD_ONLY_CONF = {
    # Explicit heap sizing mirrors the reference (model-als.py:185-186:
    # spark.driver.memory/spark.executor.memory set explicitly, not left at
    # Spark's 1 GB default). The r12 driver bench OOMed building a broadcast
    # relation on the default heap — a 57-query session accumulates dozens
    # of broadcast relations plus Kryo buffers, and 1 GB is not a serious
    # driver size for that. In local mode the driver heap IS the executor
    # heap, so one knob covers both; both are set for cluster parity.
    "spark.driver.memory": os.environ.get("RSBD_DRIVER_MEM", "4g"),
    "spark.executor.memory": os.environ.get("RSBD_EXECUTOR_MEM", "4g"),
    # Off-heap mirrors the reference (model-als.py:187-188) and reduces GC
    # pressure for large hash aggregations.
    "spark.memory.offHeap.enabled": "true",
    "spark.memory.offHeap.size": os.environ.get("RSBD_OFFHEAP", "2g"),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    return f"local[{cpus}]" if cpus else "local[*]"


def get_spark(
    app_name: str = "rsbd-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine SparkSession.

    ``shuffle_partitions`` defaults to 32 in local mode — enough to exercise
    multi-partition plans without tiny-task overhead; on a cluster pass the
    core-count-scaled value or leave AQE to coalesce.
    """
    builder = SparkSession.builder.appName(app_name).master(master or default_master())
    for k, v in {**RUNTIME_CONF, **BUILD_ONLY_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions or int(os.environ.get("RSBD_SHUFFLE_PARTITIONS", "32"))),
    )
    spark = builder.getOrCreate()
    ensure_runtime_conf(spark)
    return spark


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to a session we may not have built.

    The correctness driver constructs its own SparkSession; every public
    query entry point calls this (via catalog.load) so behavior does not
    depend on who built the session. All keys in RUNTIME_CONF are
    runtime-settable SQL confs.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - non-settable conf on some builds
            pass
    return spark
