"""Reference CSV-convention fidelity (FIXTURES.md §A): the 'Unknown'→NULL
scan-time sentinel, quote/escape handling, whitespace trim, headerless
positional binding, and non-identifier column names with spaces/hyphens —
the exact ingestion behavior of model-als.py:56-101."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from recommendation_system_big_data_spark.operators.profile import missing_value_audit
from recommendation_system_big_data_spark.sources.csv import read_csv_reference

ANIME_LIKE_SCHEMA = StructType(
    [
        StructField("ID", IntegerType()),
        StructField("Name", StringType()),
        StructField("English name", StringType()),
        StructField("Type", StringType()),
        StructField("Score-10", DoubleType()),
        StructField("On-Hold", IntegerType()),
        StructField("Plan to Watch", IntegerType()),
    ]
)

CSV_BODY = '''ID,Name,English name,Type,Score-10,On-Hold,Plan to Watch
1,Gintama,Gintama,TV,9.2,5,10
2,Unknown,Unknown,Movie,8.1,3,7
3,  Cowboy Bebop  ,"Cowboy, Bebop",TV,Unknown,2,4
4,"He said ""hi""",,TV,7.7,1,2
'''


@pytest.fixture(scope="module")
def anime_csv(spark):
    d = tempfile.mkdtemp(prefix="rsbd_csv_")
    path = os.path.join(d, "anime.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write(CSV_BODY)
    return path


def test_unknown_sentinel_becomes_null(spark, anime_csv):
    df = read_csv_reference(spark, anime_csv, ANIME_LIKE_SCHEMA)
    rows = {r["ID"]: r for r in df.collect()}
    assert rows[2]["Name"] is None  # 'Unknown' → NULL at scan time
    assert rows[2]["English name"] is None
    assert rows[3]["Score-10"] is None  # sentinel applies to doubles too


def test_whitespace_trim_and_quote_escape(spark, anime_csv):
    df = read_csv_reference(spark, anime_csv, ANIME_LIKE_SCHEMA)
    rows = {r["ID"]: r for r in df.collect()}
    assert rows[3]["Name"] == "Cowboy Bebop"  # leading/trailing trim
    assert rows[3]["English name"] == "Cowboy, Bebop"  # quoted comma
    assert rows[4]["Name"] == 'He said "hi"'  # '"' as escape char


def test_space_and_hyphen_column_names_are_first_class(spark, anime_csv):
    df = read_csv_reference(spark, anime_csv, ANIME_LIKE_SCHEMA)
    # bracket access like df_anime["English name"] (model-als.py:142)
    out = df.select(df["English name"], df["Score-10"], df["Plan to Watch"])
    assert out.columns == ["English name", "Score-10", "Plan to Watch"]
    # and backtick quoting through the SQL surface
    df.createOrReplaceTempView("anime_like")
    sql = df.sparkSession.sql(
        "SELECT `English name`, `On-Hold` FROM anime_like WHERE `Score-10` > 9"
    )
    assert sql.count() == 1


def test_headerless_positional_binding(spark):
    d = tempfile.mkdtemp(prefix="rsbd_csv_")
    path = os.path.join(d, "ratings.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write("666666,1,9.5\n666666,2,8.0\n123,1,7.5\n")
    schema = StructType(
        [
            StructField("user_id", IntegerType()),
            StructField("anime_id", IntegerType()),
            StructField("rating", DoubleType()),
        ]
    )
    df = read_csv_reference(spark, path, schema, header=False)
    assert df.count() == 3
    assert df.filter(F.col("user_id") == 666666).count() == 2


def test_audit_counts_sentinels_and_nulls(spark, anime_csv):
    df = read_csv_reference(spark, anime_csv, ANIME_LIKE_SCHEMA)
    audit = missing_value_audit(df.select("Name", "English name")).collect()[0]
    # row2 scan-NULL + nothing else for Name; English name: row2 NULL + row4 empty
    assert audit["Name"] == 1
    assert audit["English name"] == 2
