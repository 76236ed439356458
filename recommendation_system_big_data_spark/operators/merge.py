"""Snapshot maintenance: MERGE/upsert semantics over an immutable snapshot.

A 100 TB training-data pipeline is incremental: a nightly change feed
(inserts, updates, deletes keyed by primary key) must be folded into the
previous snapshot. Table formats (Delta/Iceberg/Hudi) expose this as
``MERGE INTO``; on plain DataFrames the same semantics are one full-outer
join on the key plus coalesce — which is also what those formats execute
underneath, minus the file-level skipping. This module spells that plan
out so the engine covers the operation without depending on a format
library the container doesn't ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register

_UPSERT_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
), changes AS (
    SELECT o_orderkey, 'U' AS op, 'U' AS new_o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE) AS new_o_totalprice
    FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 21 <> 0
    UNION ALL
    SELECT o_orderkey, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 21 = 0
    UNION ALL
    SELECT -o_orderkey - 1, 'I', 'N', CAST(o_totalprice AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 0
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey)      AS o_orderkey,
       COALESCE(c.new_o_orderstatus, b.o_orderstatus)   AS o_orderstatus,
       ROUND(COALESCE(c.new_o_totalprice, b.o_totalprice), 6) AS o_totalprice
FROM base b
FULL JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


def apply_changes(base: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """MERGE a change feed into a snapshot.

    ``changes`` columns: ``key``, ``op`` ('U'pdate / 'D'elete / 'I'nsert),
    plus ``new_<base column>`` payload columns — the FULL base column name
    after the prefix (``o_totalprice`` → ``new_o_totalprice``), so two base
    columns can never collide on a shared suffix and a feed column matches
    exactly one snapshot column. Base columns without a ``new_`` twin pass
    through unchanged. One full-outer shuffle join on the key — the identical plan shape a
    Delta ``MERGE INTO`` compiles to. Deletes drop the base row, updates
    coalesce change payload over base payload, inserts survive the outer
    join with no base match. Keys are assumed unique per side (snapshot PK
    and compacted feed); a real feed is deduplicated to last-write-wins
    upstream (see dedup_subset for that operator)."""
    b, c = base.alias("b"), changes.alias("c")
    payload = [col for col in base.columns if col != key]
    joined = b.join(c, F.col(f"b.{key}") == F.col(f"c.{key}"), "full_outer")
    kept = joined.filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
    out_cols = [F.coalesce(F.col(f"c.{key}"), F.col(f"b.{key}")).alias(key)]
    for col in payload:
        new = f"new_{col}"
        if new in changes.columns:
            out_cols.append(F.coalesce(F.col(f"c.{new}"), F.col(f"b.{col}")).alias(col))
        else:
            out_cols.append(F.col(f"b.{col}").alias(col))
    return kept.select(*out_cols)


@register("upsert_snapshot", oracle=_UPSERT_ORACLE, tags=("merge",))
def upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fold a deterministic synthetic change feed (≈14% updates with a 10%
    price bump, ≈5% deletes, ≈8% inserts under negated keys (negative, so they can never collide with a real orderkey at any scale factor), all carved
    from the orders table by key modulus) into the orders snapshot.

    The price bump is exact decimal arithmetic (2-dp price × 1-dp factor =
    3-dp result) so both engines produce the identical double. Scale shape:
    the snapshot shuffles once on its primary key; at 100 TB the win is
    storing the snapshot bucketed by that key so only the (small) change
    feed shuffles — see join_bucketed for the zero-exchange variant."""
    base = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )
    k = F.col("o_orderkey")
    orders = load(spark, sf_dir, "orders")
    bumped = (
        F.col("o_totalprice").cast("decimal(18,2)")
        * F.lit(1.1).cast("decimal(2,1)")
    ).cast("double")
    upd = orders.filter((k % 7 == 0) & (k % 21 != 0)).select(
        k.alias("o_orderkey"),
        F.lit("U").alias("op"),
        F.lit("U").alias("new_o_orderstatus"),
        bumped.alias("new_o_totalprice"),
    )
    dele = orders.filter(k % 21 == 0).select(
        k.alias("o_orderkey"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("new_o_orderstatus"),
        F.lit(None).cast("double").alias("new_o_totalprice"),
    )
    ins = orders.filter(k % 13 == 0).select(
        (-k - 1).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.lit("N").alias("new_o_orderstatus"),
        F.col("o_totalprice").cast("double").alias("new_o_totalprice"),
    )
    changes = upd.unionByName(dele).unionByName(ins)
    merged = apply_changes(base, changes, "o_orderkey")
    return merged.select(
        "o_orderkey",
        F.col("o_orderstatus"),
        F.round("o_totalprice", 6).alias("o_totalprice"),
    )


_SCD2_ORACLE = """
SELECT o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(
           strftime(LEAD(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d'),
           '9999-12-31') AS valid_to,
       o_orderpriority AS attr,
       CASE WHEN LEAD(o_orderdate) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) IS NULL
            THEN 1 ELSE 0 END AS is_current
FROM orders
"""


@register("scd2_build", oracle=_SCD2_ORACLE, tags=("merge",))
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a slowly-changing-dimension type-2 table from a change log:
    each change row opens a validity interval [its date, next change's
    date), the latest change stays open (9999-12-31 sentinel, is_current
    flag). One LEAD window per key — a single shuffle on the dimension key
    regardless of history depth.

    This is the historization step that makes `join_asof` (asof.py) work:
    a fact row joins the dimension version whose [valid_from, valid_to)
    interval contains the fact timestamp. Orders stand in for the change
    log (customer's priority "changes" with each order); the ordering
    carries an o_orderkey tiebreaker so same-day changes historize
    deterministically in both engines."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    nxt = F.lead("o_orderdate").over(w)
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")).alias(
            "valid_to"
        ),
        F.col("o_orderpriority").alias("attr"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )
