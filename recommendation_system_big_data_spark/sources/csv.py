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


#: Deterministic malformed-CSV fixture: the failure modes a 100 TB CSV
#: ingest actually meets — type garbage, too many fields, missing fields,
#: quoted separators, trailing empties. Content is pinned so the oracle
#: can be literal SQL.
_CORRUPT_CSV_LINES = (
    "1,alpha,10",
    "2,beta,notanint",
    "3,gamma,30",
    "garbage-no-separators",
    "5,delta,50,extra,fields",
    "6,epsilon,",
    '7,"zeta,comma",70',
    "8,eta,42",
)


def _corrupt_csv_fixture() -> str:
    out_dir = os.path.join(FIXTURE_ROOT, "corrupt_csv")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part-000.csv")
    content = "\n".join(_CORRUPT_CSV_LINES) + "\n"
    if not (os.path.exists(path) and open(path).read() == content):
        with open(path, "w") as f:
            f.write(content)
    return path


_CORRUPT_SCAN_ORACLE = """
SELECT * FROM (VALUES
    (CAST(1 AS INT), 'alpha',       CAST(10 AS INT),   CAST(NULL AS VARCHAR)),
    (CAST(2 AS INT), 'beta',        CAST(NULL AS INT), '2,beta,notanint'),
    (CAST(3 AS INT), 'gamma',       CAST(30 AS INT),   CAST(NULL AS VARCHAR)),
    (CAST(NULL AS INT), CAST(NULL AS VARCHAR), CAST(NULL AS INT),
         'garbage-no-separators'),
    (CAST(5 AS INT), 'delta',       CAST(50 AS INT),   '5,delta,50,extra,fields'),
    (CAST(6 AS INT), 'epsilon',     CAST(NULL AS INT), CAST(NULL AS VARCHAR)),
    (CAST(7 AS INT), 'zeta,comma',  CAST(70 AS INT),   CAST(NULL AS VARCHAR)),
    (CAST(8 AS INT), 'eta',         CAST(42 AS INT),   CAST(NULL AS VARCHAR))
) AS t(id, name, val, corrupt_record)
"""


@register(
    "scan_csv_corrupt_permissive",
    oracle=_CORRUPT_SCAN_ORACLE,
    tags=("scan", "csv"),
)
def scan_csv_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE malformed-CSV scan with quarantine column — the ingest
    contract for dirty data at scale: never fail the job, never silently
    drop a row; parse what parses and capture the raw line of what
    doesn't in `columnNameOfCorruptRecord` for a dead-letter sweep
    (companion to scan_json_corrupt_records, the JSON form, and
    fn_try_arithmetic, the expression-level form).

    Pinned Spark PERMISSIVE semantics (asserted by the literal oracle):
    a type-garbage field nulls THAT field, keeps the fields that parsed,
    and quarantines the raw line; too-many-fields parses the leading
    fields AND quarantines;
    too-few-fields pads nulls with NO quarantine (schema tolerance);
    quoted separators are data. The corrupt column must be materialized
    alongside a parsed column in one projection (Spark requires
    selecting more than the corrupt column alone). Narrow scan, no
    shuffle; the quarantine filter pushes down like any other."""
    ensure_runtime_conf(spark)
    path = _corrupt_csv_fixture()
    df = (
        spark.read.schema("id int, name string, val int, corrupt_record string")
        .option("header", "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt_record")
        .csv(path)
    )
    return df.select("id", "name", "val", "corrupt_record")
