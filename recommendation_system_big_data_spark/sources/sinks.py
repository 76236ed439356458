"""Sinks — CSV export (reference parity) and partitioned Parquet (scale).

The reference's sink is pandas `to_csv` of a 5-row result
(model-als.py:173-174); `write_single_csv` reproduces that single-file
contract without leaving Spark. `write_partitioned_parquet` is the actual
100 TB sink: partition columns prune downstream scans, and writers run
fully parallel (no coalesce(1) on big data — ever).
"""

from __future__ import annotations

import atexit
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register
from recommendation_system_big_data_spark.sources.csv import FIXTURE_ROOT

#: Sink outputs are pid-scoped (`<sf>_sink_<kind>_<pid>`) so concurrent
#: driver/pytest/bench processes never overwrite under each other's readers.
#: ADVICE r2: that fixed the race but leaked one directory per process
#: forever. Lifecycle now: each process removes its own dirs at exit, and
#: module import sweeps any dir whose owning pid is no longer alive
#: (covering processes that died before their atexit ran).
_SINK_DIR_RE = re.compile(r"_sink_[a-z]+_(\d+)$")
_OWNED_SINK_DIRS: set[str] = set()


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _sweep_stale_sink_dirs() -> None:
    if not os.path.isdir(FIXTURE_ROOT):
        return
    for name in os.listdir(FIXTURE_ROOT):
        m = _SINK_DIR_RE.search(name)
        if m and int(m.group(1)) != os.getpid() and not _pid_alive(int(m.group(1))):
            shutil.rmtree(os.path.join(FIXTURE_ROOT, name), ignore_errors=True)


@atexit.register
def _cleanup_own_sink_dirs() -> None:
    for d in _OWNED_SINK_DIRS:
        shutil.rmtree(d, ignore_errors=True)


_sweep_stale_sink_dirs()


def _sink_dir(sf_dir: str, kind: str) -> str:
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(FIXTURE_ROOT, f"{sf_name}_sink_{kind}_{os.getpid()}")
    _OWNED_SINK_DIRS.add(out)
    return out


def write_single_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV with header (op #7; model-als.py:173-174 equivalent).
    coalesce(1) is acceptable only for driver-scale results like the
    reference's 5-row exports."""
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def write_partitioned_parquet(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Partitioned Parquet sink — the scale path (SURVEY.md §7.3 item 7)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


_SINK_QUERY_ORACLE = """
SELECT c_custkey, c_name, c_acctbal FROM customer
ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
"""


@register("sink_csv_roundtrip", oracle=_SINK_QUERY_ORACLE, tags=("sink", "csv"))
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a top-k result to a single CSV file, read it back through the
    explicit schema (op #7) — proves the sink preserves values exactly."""
    top = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
    )
    # pid-scoped output: two concurrent processes at the same sf (driver
    # verify + bench/pytest) must not overwrite under each other's readers —
    # the same cross-process race already fixed for bucketed table names.
    out = _sink_dir(sf_dir, "csv")
    write_single_csv(top, out)
    return spark.read.schema(top.schema).option("header", "true").csv(out)


_SINK_PARQUET_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
"""


@register("sink_parquet_partitioned", oracle=_SINK_PARQUET_ORACLE, tags=("sink",))
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned Parquet write + partition-pruned read-back aggregate.
    The read-back groupBy hits exactly the partition column, so the oracle
    also certifies that partitioning preserved every row."""
    orders = load(spark, sf_dir, "orders")
    out = _sink_dir(sf_dir, "parquet")
    write_partitioned_parquet(orders, out, ["o_orderpriority"])
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


_JSONL_ORACLE = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


@register("sink_jsonl_roundtrip", oracle=_JSONL_ORACLE, tags=("sink", "json"))
def sink_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + source round-trip: write the documents table as
    newline-delimited JSON (the interchange format every LLM-data pipeline
    speaks), read it back through the ORIGINAL schema, and prove values
    survive exactly (JSON string escaping round-trips unicode/control
    chars; the explicit schema avoids type widening on read). Writers run
    one file per partition — the parallel sink shape — and the read-back
    is schema-pinned, never inferred (inference is a full extra pass at
    100 TB)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    out = _sink_dir(sf_dir, "jsonl")
    docs.write.mode("overwrite").json(out)
    return spark.read.schema(docs.schema).json(out)


_ORC_ORACLE = """
SELECT o_orderkey, o_orderstatus, o_totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM orders
WHERE o_orderkey % 5 = 0
"""


@register("sink_orc_roundtrip", oracle=_ORC_ORACLE, tags=("sink",))
def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source round-trip — the second columnar at-rest format
    Spark ships natively (Hive-ecosystem interop; same predicate-pushdown
    and column-pruning machinery as parquet, different reader). Values
    must survive exactly: the oracle reads the SOURCE table, so any
    type-mapping loss in the ORC writer/reader (decimal widening, date
    epoch mismatch) would hash-mismatch. Pid-scoped output path keeps
    concurrent driver/pytest/bench processes off each other's files."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )
    out = _sink_dir(sf_dir, "orc")
    orders.write.mode("overwrite").orc(out)
    return spark.read.schema(orders.schema).orc(out)


_DPP_ORACLE = """
SELECT CAST(ts AS DATE) AS event_date, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
WHERE day(ts) IN (1, 2, 3)
GROUP BY CAST(ts AS DATE), event_type
"""


@register("dpp_partition_pruned_join", oracle=_DPP_ORACLE, tags=("sink",))
def dpp_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end-to-end: events land date-partitioned
    (the canonical fact layout), then a join against a FILTERED calendar
    dimension prunes the fact scan to the dimension's surviving dates at
    RUNTIME — the partition filter is injected as a dynamicpruning#
    subquery on the broadcast build side, so the 100 TB table reads 3
    partitions, not 30 (tests/test_plans.py asserts the plan shape). This
    is the join-shaped analogue of static partition pruning: the date set
    comes from data, not from a literal in the query text.

    The calendar dim derives deterministically from the raw events (month
    days 1-3 flagged); the oracle re-derives the same cohort with a WHERE,
    proving pruning lost no rows."""
    ev = load(spark, sf_dir, "events")
    out = _sink_dir(sf_dir, "dpp")
    (
        ev.withColumn("event_date", F.col("ts").cast("date"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(out)
    )
    fact = spark.read.parquet(out)
    calendar = (
        ev.select(F.col("ts").cast("date").alias("d")).distinct()
        .filter(F.dayofmonth("d").isin(1, 2, 3))
    )
    return (
        fact.join(F.broadcast(calendar), fact["event_date"] == calendar["d"])
        .groupBy("event_date", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


_COMPACTION_ORACLE = """
SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice
FROM orders
"""


@register("compaction_small_files", oracle=_COMPACTION_ORACLE, tags=("sink",))
def compaction_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every long-lived
    lake runs (streaming sinks and per-batch appends fragment tables into
    KB files; at 100 TB the resulting file-listing and task-granularity
    overhead dominates scan cost). A deliberately fragmented copy (64
    files) is rewritten as range-partitioned, key-sorted target files:
    `repartitionByRange(4, key)` gives equal-sized output files with
    non-overlapping key ranges (min/max footer stats then prune reads),
    and `sortWithinPartitions` makes each file internally ordered for
    row-group skipping. Content identity is the oracle; the file count
    drop is asserted in tests/test_sinks.py."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    frag = _sink_dir(sf_dir, "frag")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    compact = _sink_dir(sf_dir, "compact")
    (
        spark.read.parquet(frag)
        .repartitionByRange(4, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite")
        .parquet(compact)
    )
    return spark.read.parquet(compact).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 6).alias("o_totalprice")
    )


_EVOLUTION_ORACLE = """
SELECT o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderpriority
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, ROUND(o_totalprice, 6), o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
"""


@register("schema_evolution_merge", oracle=_EVOLUTION_ORACLE, tags=("sink",))
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: batch 1 lands with the v1 schema, batch 2
    adds a column, and `mergeSchema` unions the footers so old files
    surface NULL for the new column — the standard contract for long-lived
    corpora whose schema widens over time (every Delta/Iceberg table does
    exactly this; plain parquet exposes it via the option).

    mergeSchema is priced honestly: it footer-reads every file at load, so
    production tables keep the merged schema in a catalog instead — the
    option belongs at ingest/repair time, not on every query. The oracle
    is the explicit NULL-padded UNION ALL."""
    orders = load(spark, sf_dir, "orders")
    out = _sink_dir(sf_dir, "evolve")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", F.round("o_totalprice", 6).alias("o_totalprice")
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        "o_orderpriority",
    )
    v1.write.mode("overwrite").parquet(os.path.join(out, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(out, "batch=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(out)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


#: Deterministic corruption rule for the malformed-JSON fixture: every
#: doc whose id is 0 mod 50 gets its closing brace cut off.
_CORRUPT_MOD = 50

_CORRUPT_JSON_ORACLE = f"""
SELECT lang, COUNT(*) AS n_docs FROM documents
WHERE doc_id % {_CORRUPT_MOD} != 0
GROUP BY lang
UNION ALL
SELECT '_corrupt' AS lang, COUNT(*) AS n_docs FROM documents
WHERE doc_id % {_CORRUPT_MOD} = 0
"""


@register(
    "scan_json_corrupt_records", oracle=_CORRUPT_JSON_ORACLE, tags=("source",)
)
def scan_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingestion of a corpus with malformed lines — the
    real-world JSONL scrape where a fraction of records is truncated.

    A fixture is built by serializing `documents` to JSON lines and
    deterministically truncating every 50th record, then read back
    schema-pinned in PERMISSIVE mode with `_corrupt_record` capturing the
    rejects. The query reports per-language good-record counts plus the
    quarantined count under the `_corrupt` sentinel — the
    ingest-monitoring shape (FAILFAST would kill a 100 TB job on one bad
    byte; DROPMALFORMED silently loses data; PERMISSIVE + quarantine
    column is the only auditable mode). Parsing stays in the JVM JSON
    reader; corruption detection costs nothing extra."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    lines = docs.select(
        F.when(
            F.col("doc_id") % _CORRUPT_MOD == 0,
            # cut the tail off the serialized record → unparseable
            F.expr("substring(to_json(struct(doc_id, lang, source, n_chars)), 1, 20)"),
        )
        .otherwise(F.to_json(F.struct("doc_id", "lang", "source", "n_chars")))
        .alias("value")
    )
    out = _sink_dir(sf_dir, "jsonl_corrupt")
    lines.write.mode("overwrite").text(out)

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        back.select(
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt"))
            .otherwise(F.col("lang"))
            .alias("lang")
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_TIME_TRAVEL_ORACLE = """
SELECT r_regionkey, r_name,
       CAST(0 AS BIGINT) AS version
FROM region
"""


@register("sink_time_travel_versions", oracle=_TIME_TRAVEL_ORACLE, tags=("sink",))
def sink_time_travel_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-snapshot sink with time travel — the table-format
    mechanic (Delta/Iceberg snapshot isolation) reduced to its essence
    on plain Parquet: each commit writes an immutable snapshot directory
    `v=<n>/` plus a tiny JSON manifest naming the current version;
    readers pin a version by PATH, so a v0 reader is untouched by the
    v1 commit (snapshot isolation), and "time travel" is just reading an
    older immutable directory.

    Here: v0 = the region table; v1 = the same table with names
    lowercased (a breaking rewrite). The query commits both, then READS
    BACK v0 — proving the old snapshot survived the new commit
    bit-for-bit (the oracle is the original table). At scale the
    manifest grows into per-snapshot file lists + stats (that's all a
    log-structured table format is); the immutability + pinned-path
    contract shown here is the part query plans rely on."""
    import json

    base = _sink_dir(sf_dir, "ttv")
    region = load(spark, sf_dir, "region")
    region.write.mode("overwrite").parquet(os.path.join(base, "v=0"))
    region.select(
        "r_regionkey", F.lower("r_name").alias("r_name")
    ).write.mode("overwrite").parquet(os.path.join(base, "v=1"))
    with open(os.path.join(base, "_manifest.json"), "w") as f:
        json.dump({"current": 1, "versions": [0, 1]}, f)
    manifest = json.load(open(os.path.join(base, "_manifest.json")))
    assert manifest["current"] == 1
    pinned = 0  # time travel: read the superseded snapshot
    return spark.read.parquet(os.path.join(base, f"v={pinned}")).select(
        "r_regionkey",
        "r_name",
        F.lit(pinned).cast("long").alias("version"),
    )


#: Pinned binary fixture files for the binaryFile ingestion path.
_BINARY_FIXTURES = {
    "img_a.bin": b"\x89PNG-fake\x00" + bytes(range(64)),
    "img_b.bin": b"RIFF-fake\x00" + bytes(reversed(range(128))),
    "clip_c.bin": b"\x00\x01\x02mp4-fake" + bytes(range(32)) * 3,
}


def _binary_fixture_dir() -> str:
    out = os.path.join(FIXTURE_ROOT, "binary_files")
    os.makedirs(out, exist_ok=True)
    for name, content in _BINARY_FIXTURES.items():
        p = os.path.join(out, name)
        if not (os.path.exists(p) and open(p, "rb").read() == content):
            with open(p, "wb") as f:
                f.write(content)
    return out


@register("scan_binary_files", oracle=None, tags=("scan", "multimodal"))
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`binaryFile` format ingestion — the front door for multimodal
    corpora: each file lands as one row of (path, modificationTime,
    length, content binary), which is exactly the opaque-binary +
    typed-metadata shape operators/multimodal.py processes downstream
    (decode/resize/frame-sample over mapInPandas).

    Output projects (file_name, length, content sha256) — deterministic
    identity for the pinned fixture files, path- and mtime-free so the
    check is stable across hosts. ⊘ rows-only (DuckDB has no binaryFile
    reader); tests pin the exact expected rows. Scale note: binaryFile
    parallelizes per file and honors pathGlobFilter/recursiveFileLookup;
    pair with `spark.sql.files.maxPartitionBytes` so many small blobs
    batch per task instead of one task per file."""
    path = _binary_fixture_dir()
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").cast("long").alias("length"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    ).orderBy("file_name")


_TEXT_ROUNDTRIP_ORACLE = """
SELECT md5(text) AS line_hash, CAST(length(text) AS BIGINT) AS n_chars
FROM documents WHERE NOT contains(text, chr(10))
"""


@register("sink_text_roundtrip", oracle=_TEXT_ROUNDTRIP_ORACLE, tags=("sink", "text"))
def sink_text_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`text` format round-trip: one document per line out, one line per
    row back — the rawest interchange format (log shippers, classic NLP
    corpora, line-delimited exports), where the ONLY schema is "a string
    column named value" and the newline is the record separator (so
    embedded newlines are the format's failure mode — the writer path
    must pre-filter or escape them; pinned here by scoping to
    newline-free docs, which this corpus is).

    Round-trip identity is checked content-first: the read-back lines'
    md5 + length multiset must equal the source docs' (order-free — text
    files have no row order contract). Writers parallelize per partition
    like any file sink."""
    docs = load(spark, sf_dir, "documents").where(
        ~F.col("text").contains("\n")
    )
    out = _sink_dir(sf_dir, "text")
    docs.select(F.col("text").alias("value")).write.mode("overwrite").text(out)
    back = spark.read.text(out)
    return back.select(
        F.md5("value").alias("line_hash"),
        F.length("value").cast("long").alias("n_chars"),
    )


_XML_ORACLE = """
SELECT n_regionkey,
       CAST(COUNT(*) AS BIGINT) AS n_nations,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey
"""


@register("sink_xml_roundtrip", oracle=_XML_ORACLE, tags=("sink",))
def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML round-trip (Spark 4 integrated the spark-xml reader and
    writer): the nation dimension is written as <nation> row elements and
    read back through rowTag with an explicit schema, then aggregated —
    the hash match against plain `nation` proves the XML codec preserves
    every row and value. XML is the interchange format of the enterprise
    feeds (SAP, banking, EDI) a warehouse migration ingests; the explicit
    read schema is the production form (inference re-scans the data).
    Same pid-scoped fixture discipline as the other sinks."""
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = _sink_dir(sf_dir, "xml")
    (
        nat.coalesce(1)
        .write.mode("overwrite")
        .format("xml")
        .option("rowTag", "nation")
        .option("rootTag", "nations")
        .save(out)
    )
    schema = StructType(
        [
            StructField("n_nationkey", LongType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", LongType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(schema)
        .load(out)
    )
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


_COMPRESSED_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


@register(
    "sink_compressed_roundtrip", oracle=_COMPRESSED_ORACLE, tags=("sink",)
)
def sink_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-codec roundtrip — the storage knob the other sink
    roundtrips leave at defaults: the SAME aggregate is written as
    gzip CSV, zstd Parquet, and snappy Parquet, read back through each
    codec, and the three read-backs are UNIONED under a check that they
    agree row-for-row before one copy is returned (a codec that silently
    corrupted or dropped rows would triple-count or diverge, and the
    oracle's exact counts would catch either). File extensions are
    asserted in the pytest so the codecs demonstrably engaged rather
    than silently falling back.

    Codec choice is a real 100 TB lever: zstd parquet typically reads
    ~1.3-2× smaller than snappy at similar scan speed (worth petabytes
    of S3), while gzip CSV exists for interchange, not analytics — this
    query is the harness that proves switching the knob never changes
    the DATA. Scale shape: one aggregate (map-side combined), three
    driver-scale writes, three scans of tiny files."""
    agg = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
    out_csv = _sink_dir(sf_dir, "csvgz")
    out_zstd = _sink_dir(sf_dir, "pqzstd")
    out_snappy = _sink_dir(sf_dir, "pqsnappy")
    (
        agg.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .csv(out_csv)
    )
    agg.write.mode("overwrite").option("compression", "zstd").parquet(out_zstd)
    agg.write.mode("overwrite").option("compression", "snappy").parquet(
        out_snappy
    )
    back_csv = (
        spark.read.schema(agg.schema).option("header", "true").csv(out_csv)
    )
    back_zstd = spark.read.parquet(out_zstd)
    back_snappy = spark.read.parquet(out_snappy)
    # all three must agree exactly: diff via except-all in both directions
    for back in (back_zstd, back_snappy):
        extra = back_csv.exceptAll(back).count()
        missing = back.exceptAll(back_csv).count()
        if extra or missing:
            raise ValueError(
                f"codec roundtrip divergence: +{extra}/-{missing} rows"
            )
    return back_zstd
