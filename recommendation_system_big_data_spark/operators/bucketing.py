"""Physical-layout operators: bucketed co-located joins and salted skew
joins — the two techniques SURVEY.md §7.3 item 7 names for the 100 TB join
story (neither appears in the reference, which broadcasts everything).

Bucketing: both sides pre-hashed into the same bucket count on the join key
at write time → the join needs NO exchange at read time (asserted in
tests/test_bucketing.py). At 100 TB this converts every recurring join on
the bucket key from a full fact-table shuffle into a local zip of buckets.

Salting: when one side's key distribution is skewed (a handful of hot
suppliers receiving most lineitems), explode the small side over N salt
values and give the big side a deterministic salt in [0, N) — the hot key's
rows spread across N reducers. AQE's skew-join split handles moderate skew
automatically; salting is the explicit form for extreme or repeatable
cases."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register

N_BUCKETS = 8
N_SALTS = 8


def _table_exists(spark: SparkSession, name: str) -> bool:
    return spark.catalog.tableExists(name)


def _drop_stale_location(spark: SparkSession, name: str) -> None:
    """The in-memory catalog forgets managed tables between sessions but
    their warehouse directories persist; saveAsTable then fails with
    LOCATION_ALREADY_EXISTS. Clear the orphaned location."""
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    if wh:
        shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)


def bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure orders and customer exist as bucketed tables (same bucket
    count, same key) for this scale factor; returns their table names."""
    # pid-scoped names: two processes sharing the warehouse dir must never
    # manage the same table (one's overwrite deletes the files under the
    # other's reader). Within a process the pair is built once and reused.
    sfn = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    pid = os.getpid()
    ot, ct = f"orders_bkt_{sfn}_{pid}", f"customer_bkt_{sfn}_{pid}"
    if not _table_exists(spark, ot):
        _drop_stale_location(spark, ot)
        (
            load(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(ot)
        )
    if not _table_exists(spark, ct):
        _drop_stale_location(spark, ct)
        (
            load(spark, sf_dir, "customer")
            .write.bucketBy(N_BUCKETS, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(ct)
        )
    return ot, ct


_BUCKETED_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("join_bucketed", oracle=_BUCKETED_ORACLE, tags=("join", "layout"))
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — zero exchanges on
    either input (SortMergeJoin reads matching buckets directly; the plan
    assertion lives in tests/test_bucketing.py). Falls back to the plain
    tables if the session cannot write managed tables (read-only warehouse),
    preserving identical results."""
    try:
        ot, ct = bucketed_pair(spark, sf_dir)
        orders, cust = spark.table(ot), spark.table(ct)
    except Exception:  # pragma: no cover - warehouse not writable
        orders = load(spark, sf_dir, "orders")
        cust = load(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
        )
    )


def salt_column(n: int, *cols: Column) -> Column:
    """Deterministic salt in [0, n): xxhash64 of row-identifying columns —
    reproducible across runs/partitionings, unlike rand()-based salting."""
    return F.pmod(F.xxhash64(*cols), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    big_id_cols: list[str],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Skew-resistant equi-join: replicate `small` n_salts times, salt `big`
    deterministically, join on (key, salt). Row multiset identical to the
    plain join."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "salt", salt_column(n_salts, *[F.col(c) for c in big_id_cols])
    )
    return big_salted.join(
        small_rep,
        (big_salted[big_key] == small_rep[small_key]) & (big_salted["salt"] == small_rep["salt"]),
    ).drop("salt")


_SALTED_ORACLE = """
SELECT s_name,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


@register("join_salted_skew", oracle=_SALTED_ORACLE, tags=("join", "layout"))
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier key is the testdata's skew axis (few suppliers, many
    lineitems); the salted join spreads each hot supplier over N_SALTS
    reducers. Result provably identical to the plain join (the oracle IS
    the plain join)."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    joined = salted_join(
        li, supp, "l_suppkey", "s_suppkey", ["l_orderkey", "l_linenumber"]
    )
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"),
    )


_ZORDER_ORACLE = """
WITH bucketed AS (
    SELECT o_orderkey,
           o_custkey % 65536 AS xb,
           datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536 AS yb
    FROM orders
), s1 AS (
    SELECT o_orderkey,
           (xb | (xb << 8)) & 16711935 AS x,
           (yb | (yb << 8)) & 16711935 AS y
    FROM bucketed
), s2 AS (
    SELECT o_orderkey,
           (x | (x << 4)) & 252645135 AS x,
           (y | (y << 4)) & 252645135 AS y
    FROM s1
), s3 AS (
    SELECT o_orderkey,
           (x | (x << 2)) & 858993459 AS x,
           (y | (y << 2)) & 858993459 AS y
    FROM s2
), s4 AS (
    SELECT o_orderkey,
           (x | (x << 1)) & 1431655765 AS x,
           (y | (y << 1)) & 1431655765 AS y
    FROM s3
)
SELECT o_orderkey, x | (y << 1) AS z_key FROM s4
"""


def _spread_bits(col):
    """Interleave-ready 16-bit spread (Morton encoding half): insert a zero
    between every bit using the standard mask cascade — pure BIGINT
    arithmetic, bit-identical in any engine."""
    col = col.cast("long")
    v = (col.bitwiseOR(F.shiftleft(col, 8))).bitwiseAND(F.lit(0x00FF00FF).cast("long"))
    v = (v.bitwiseOR(F.shiftleft(v, 4))).bitwiseAND(F.lit(0x0F0F0F0F).cast("long"))
    v = (v.bitwiseOR(F.shiftleft(v, 2))).bitwiseAND(F.lit(0x33333333).cast("long"))
    v = (v.bitwiseOR(F.shiftleft(v, 1))).bitwiseAND(F.lit(0x55555555).cast("long"))
    return v


@register("zorder_key", oracle=_ZORDER_ORACLE, tags=("layout",))
def zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleave of (customer, order-day) — the multi-
    dimensional clustering key. Sorting a table by z_key before writing
    gives every file a TIGHT min/max envelope on BOTH dimensions at once,
    so parquet row-group statistics prune scans filtered by either column
    — the data-layout trick behind Delta/Iceberg OPTIMIZE ZORDER, here as
    a plain deterministic projection (bit-mask cascade, no UDF, identical
    BIGINT arithmetic in both engines).

    Usage at 100 TB: `df.repartitionByRange(N, "z_key").sortWithinPartitions
    ("z_key").write...` — range partitioning by z_key is what turns the
    key into file-level locality. The projection itself is shuffle-free."""
    b = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).alias("xb"),
        (
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
            )
            % 65536
        ).alias("yb"),
    )
    return b.select(
        "o_orderkey",
        _spread_bits(F.col("xb"))
        .bitwiseOR(F.shiftleft(_spread_bits(F.col("yb")), 1))
        .alias("z_key"),
    )
