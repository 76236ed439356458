"""JSON extraction over `events.props` — SURVEY.md §2.11 op #49.

The reference keeps every semi-structured string opaque (model-als.py:22
`Genres`); the engine exposes the two idiomatic Spark forms: path extraction
(`get_json_object`) and schema projection (`from_json`). `from_json` is the
scale path — one parse per row into a typed struct, columnar after that —
while `get_json_object` re-parses per call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_value
    FROM events
    """,
    tags=("json",),
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-based extraction: get_json_object (op #49)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@register(
    "json_from_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_value,
           CAST(CAST(props->>'$.k' AS BIGINT) % 10 AS BIGINT) AS k_mod10
    FROM events
    """,
    tags=("json",),
)
def json_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read projection: from_json into a typed struct, then
    ordinary columnar expressions over the parsed field (op #49)."""
    parsed = load(spark, sf_dir, "events").select(
        "event_id", F.from_json("props", "k BIGINT").alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        (F.col("p.k") % 10).alias("k_mod10"),
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_value,
           CAST(props->>'$.k' AS VARCHAR) AS k_string
    FROM events
    """,
    tags=("json",),
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through the native VARIANT type (Spark
    4.x): parse_json materializes a binary variant ONCE, then typed
    variant_get probes read fields without re-parsing the string — the
    engine-native path that supersedes per-probe get_json_object at
    scale (N probes over get_json_object parse the JSON N times; over a
    variant they are N cheap binary lookups). Same answers, checked
    against DuckDB's JSON operators; the parse is staged through its own
    projection so the two probes share one variant value."""
    v = load(spark, sf_dir, "events").select(
        "event_id", F.parse_json("props").alias("v")
    )
    return v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_value"),
        F.variant_get("v", "$.k", "string").alias("k_string"),
    )


_XML_ORACLE = """
SELECT o_orderkey,
       o_orderstatus AS status,
       ROUND(o_totalprice, 2) AS price
FROM orders WHERE o_orderkey % 10 = 0
"""


@register("fn_xml_extract", oracle=_XML_ORACLE, tags=("scalar", "xml"))
def fn_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion via from_xml (new in Spark 4): records are serialized
    to XML strings (deterministically, from the orders table — the corpus
    has no XML column), then parsed back through an explicit schema and
    the extracted fields verified against the source values by the
    oracle. Round-trips the third major semi-structured format alongside
    JSON (json_fns) and variant (json_variant_extract); parsing stays in
    the JVM row-path, schema pinned — never inferred."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.round("o_totalprice", 2).cast("string"),
        F.lit("</price></order>"),
    )
    parsed = orders.select(
        F.from_xml(xml, "key BIGINT, status STRING, price DOUBLE").alias("x")
    )
    return parsed.select(
        F.col("x.key").alias("o_orderkey"),
        F.col("x.status").alias("status"),
        F.col("x.price").alias("price"),
    )


_AES_ORACLE = """
SELECT c_custkey, c_name AS name_roundtripped, c_mktsegment
FROM customer WHERE c_custkey % 20 = 0
"""


@register("fn_aes_roundtrip", oracle=_AES_ORACLE, tags=("scalar", "crypto"))
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip: aes_encrypt (GCM) then
    aes_decrypt with the same key recovers the plaintext exactly — the
    PII-at-rest pattern where a sensitive column is stored encrypted and
    only privileged readers hold the key. GCM mode is randomized (fresh
    IV per row), so ciphertexts are not comparable or hashable — the
    oracle verifies the DECRYPTED value equals the source, which is the
    actual contract. Both AES stages are JVM codegen expressions; no
    Python, no UDF."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 20 == 0)
    key = F.lit("0123456789abcdef")  # 16-byte demo key; prod = KMS-provided
    enc = F.aes_encrypt(F.col("c_name").cast("binary"), key.cast("binary"))
    dec = F.aes_decrypt(enc, key.cast("binary"))
    return cust.select(
        "c_custkey",
        dec.cast("string").alias("name_roundtripped"),
        "c_mktsegment",
    )


_CSV_STRING_ORACLE = """
SELECT r_regionkey, r_name,
       r_regionkey AS back_key, r_name AS back_name
FROM region
"""


@register("fn_csv_string_roundtrip", oracle=_CSV_STRING_ORACLE, tags=("fn",))
def fn_csv_string_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CSV functions — `to_csv` packs a struct into one CSV
    STRING column, `from_csv` parses it back with an explicit schema:
    the embedded-CSV path (CSV inside a message envelope, Kafka values,
    audit columns) that file-level CSV readers never touch. The oracle
    asserts round-trip identity: parse(serialize(row)) must equal the
    row, which pins quoting/escaping symmetry between the two functions.

    Narrow projections both ways; the parse carries the same
    explicit-schema discipline as every scan in this engine (inference
    on a per-row function would be per-row schema chaos)."""
    r = load(spark, sf_dir, "region")
    packed = r.select(
        "r_regionkey",
        "r_name",
        F.to_csv(F.struct("r_regionkey", "r_name")).alias("csv_line"),
    )
    parsed = packed.select(
        "r_regionkey",
        "r_name",
        F.from_csv(
            F.col("csv_line"), F.lit("back_key BIGINT, back_name STRING")
        ).alias("back"),
    )
    return parsed.select(
        "r_regionkey", "r_name", F.col("back.back_key").alias("back_key"),
        F.col("back.back_name").alias("back_name"),
    )


_VARIANT_ORACLE = """
WITH ex AS (
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       'OBJECT<k: BIGINT>' AS discovered_schema
FROM ex
GROUP BY event_type
"""


@register("fn_variant_extract", oracle=_VARIANT_ORACLE, tags=("json", "scalar"))
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type end-to-end: parse_json the semi-structured
    props column ONCE into a variant (a binary-encoded tree — repeated
    extractions skip re-tokenizing the JSON string, the reason VARIANT
    exists), pull a typed field out with variant_get, and let
    schema_of_variant_agg DISCOVER the merged schema across every row —
    the schema-on-read primitive a 100 TB landing zone uses before
    anyone writes a DDL. The oracle pins the extraction semantics via
    plain JSON path (engines must agree on values) AND the expected
    discovered schema literal ('OBJECT<k: BIGINT>' — if the fixture's
    props shape ever drifts, the discovery column goes red first).

    Scale shape: parse + extract are per-row codegen'd kernels; the
    rollup is one map-side-combined aggregate to |event_type| rows. At
    100 TB the win is storage-side: a VARIANT column in parquet keeps
    shredded binary instead of strings, so the parse cost is paid at
    ingest once, not per query."""
    v = load(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    ex = v.select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        "v",
    )
    return ex.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count("k").cast("long").alias("n_with_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.expr("schema_of_variant_agg(v)").alias("discovered_schema"),
    )
