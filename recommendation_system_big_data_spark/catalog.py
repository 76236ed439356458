"""Table catalog for the driver-generated testdata (TESTDATA.md).

The reference hand-loads CSVs with explicit StructTypes (model-als.py:17-103);
here the primary at-rest format is Parquet (columnar, statistics, predicate
pushdown — the right 100 TB format), with the CSV conventions preserved in
`sources/csv.py` for ingestion parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.session import ensure_runtime_conf

#: Every driver-provided table (TESTDATA.md / FIXTURES.md §B).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    `events.ts` is stored as parquet TIMESTAMP(NANOS) which Spark cannot map
    to a native type; with `spark.sql.legacy.parquet.nanosAsLong` it arrives
    as a nanosecond epoch long and is converted here to TimestampType at
    microsecond precision using integer division (`ts div 1000`) — a double
    division would lose precision for epochs above 2^53 ns (~mid-1970).
    """
    ensure_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql(...)` works too."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
