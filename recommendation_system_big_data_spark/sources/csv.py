"""CSV ingestion with the reference's exact conventions.

The reference reads every input CSV with an explicit StructType and a fixed
option set (model-als.py:56-67: header, comma sep, '"' as both quote and
escape, whitespace trim, `nullValue='Unknown'` sentinel, UTF-8; headerless
variant model-als.py:94-101). Those conventions are reproduced here as
`read_csv_reference` / `read_csv_headerless`.

The registered queries prove CSV round-trip fidelity against Parquet truth:
write a testdata table to CSV (single deterministic file), read it back
through the reference-convention reader, and let the oracle compare against
the original table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register
from recommendation_system_big_data_spark.session import ensure_runtime_conf

#: Reference CSV option set (model-als.py:56-67).
REFERENCE_CSV_OPTIONS = {
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "ignoreLeadingWhiteSpace": "true",
    "ignoreTrailingWhiteSpace": "true",
    "nullValue": "Unknown",
    "encoding": "UTF-8",
}

FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".fixtures")


def read_csv_reference(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """CSV scan with explicit schema + the reference option set (op #1;
    headerless positional binding when header=False — op #2,
    model-als.py:94-101). Explicit schemas skip the inference scan — at
    100 TB that is one full pass over the data saved (SURVEY.md §4)."""
    ensure_runtime_conf(spark)
    reader = spark.read.schema(schema).option("header", str(header).lower())
    for k, v in REFERENCE_CSV_OPTIONS.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def _csv_fixture(spark: SparkSession, sf_dir: str, table: str, header: bool) -> str:
    """Write `<sf_dir>/<table>.parquet` as a CSV fixture (once per sf) under
    the repo-local .fixtures dir; returns the CSV directory path."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    suffix = "h" if header else "nh"
    out = os.path.join(FIXTURE_ROOT, f"{sf_name}_{table}_{suffix}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load(spark, sf_dir, table)
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", str(header).lower())
            .csv(out)
        )
    return out


@register("scan_csv_schema", oracle="SELECT * FROM nation", tags=("scan", "csv"))
def scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip with header + explicit schema + reference options
    (op #1). The oracle is the Parquet truth the CSV was derived from."""
    nation = load(spark, sf_dir, "nation")
    path = _csv_fixture(spark, sf_dir, "nation", header=True)
    return read_csv_reference(spark, path, nation.schema, header=True)


@register("scan_csv_headerless", oracle="SELECT * FROM region", tags=("scan", "csv"))
def scan_csv_headerless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headerless CSV scan with positional schema binding (op #2)."""
    region = load(spark, sf_dir, "region")
    path = _csv_fixture(spark, sf_dir, "region", header=False)
    return read_csv_reference(spark, path, region.schema, header=False)
