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


_CDC_ORACLE = """
WITH base AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
), feed AS (
    SELECT o_orderkey, 1 AS seq, 'U' AS op, 'U1' AS new_o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                * CAST(1.05 AS DECIMAL(3,2)) AS DOUBLE) AS new_o_totalprice
    FROM orders WHERE o_orderkey % 5 = 0
    UNION ALL
    SELECT o_orderkey, 2, 'U', 'U2',
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                * CAST(1.1 AS DECIMAL(2,1)) AS DOUBLE)
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, 3, 'D', NULL, NULL
    FROM orders WHERE o_orderkey % 20 = 0
    UNION ALL
    SELECT -o_orderkey - 1, 1, 'I', 'N', CAST(o_totalprice AS DOUBLE)
    FROM orders WHERE o_orderkey % 13 = 0
    UNION ALL
    SELECT -o_orderkey - 1, 2, 'U', 'N2',
           CAST(CAST(o_totalprice AS DECIMAL(18,2))
                * CAST(2.0 AS DECIMAL(2,1)) AS DOUBLE)
    FROM orders WHERE o_orderkey % 26 = 0
), latest AS (
    SELECT o_orderkey, op, new_o_orderstatus, new_o_totalprice FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                     ORDER BY seq DESC) AS rn
        FROM feed
    ) WHERE rn = 1
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey)           AS o_orderkey,
       COALESCE(c.new_o_orderstatus, b.o_orderstatus) AS o_orderstatus,
       ROUND(COALESCE(c.new_o_totalprice, b.o_totalprice), 6) AS o_totalprice
FROM base b
FULL JOIN latest c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


@register("cdc_apply_changes", oracle=_CDC_ORACLE, tags=("merge",))
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO semantics (Delta Live Tables / Debezium-feed
    folding): the change feed carries MULTIPLE versions per key with a
    monotone sequence number — possibly out of order, insert-then-update,
    update-then-delete. Stage 1 compacts the feed to last-write-wins via a
    per-key rank on seq DESC; stage 2 is the same full-outer MERGE as
    `upsert_snapshot` (apply_changes). A 'U' whose key is absent from the
    snapshot upserts — the outer join makes new-key updates and inserts
    converge, exactly the APPLY CHANGES contract.

    Scale: the rank shuffles the FEED only (days of changes, ≪ snapshot);
    the merge is the one snapshot-sized shuffle. Feed versions per key are
    bounded by feed cadence, so no skew amplification from hot keys."""
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", F.col("o_totalprice").cast("double")
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")

    def slice_(mod: int, seq: int, op: str, key, status, price) -> DataFrame:
        return orders.filter(F.col("o_orderkey") % mod == 0).select(
            key.alias("o_orderkey"),
            F.lit(seq).alias("seq"),
            F.lit(op).alias("op"),
            status.alias("new_o_orderstatus"),
            price.alias("new_o_totalprice"),
        )

    k = F.col("o_orderkey")
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    feed = (
        slice_(5, 1, "U", k, F.lit("U1"),
               (dec * F.lit("1.05").cast("decimal(3,2)")).cast("double"))
        .unionByName(slice_(10, 2, "U", k, F.lit("U2"),
                            (dec * F.lit("1.1").cast("decimal(2,1)")).cast("double")))
        .unionByName(slice_(20, 3, "D", k, null_s, null_d))
        .unionByName(slice_(13, 1, "I", -k - 1, F.lit("N"),
                            F.col("o_totalprice").cast("double")))
        .unionByName(slice_(26, 2, "U", -k - 1, F.lit("N2"),
                            (dec * F.lit("2.0").cast("decimal(2,1)")).cast("double")))
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "seq")
    )
    merged = apply_changes(base, latest, "o_orderkey")
    return merged.select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 6).alias("o_totalprice")
    )


_PIT_ORACLE = """
WITH dim AS (
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           COALESCE(
               strftime(LEAD(o_orderdate) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d'),
               '9999-12-31') AS valid_to,
           o_orderpriority AS attr
    FROM orders
), fact AS (
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
           strftime(l.l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_linenumber = 1
)
SELECT f.l_orderkey, f.o_custkey, f.ship_day, d.attr AS priority_at_ship
FROM fact f
JOIN dim d
  ON f.o_custkey = d.o_custkey
 AND f.ship_day >= d.valid_from
 AND f.ship_day < d.valid_to
"""


@register("scd2_pit_lookup", oracle=_PIT_ORACLE, tags=("merge", "temporal"))
def scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact→SCD2 lookup: each shipment joins the dimension
    VERSION that was valid on its ship date — the query every
    historized warehouse runs ("what was the customer's priority when
    this shipped?"), and the consumer side of scd2_build.

    NOT an interval predicate join (quadratic within key, and a
    nested-loop plan): dimension version-starts and fact rows interleave
    in one stream sorted by (custkey, date), and last(ignorenulls) over
    that window carries the in-effect version onto every fact row — the
    same union-sort machinery as join_asof (asof.py), which works here
    because SCD2 intervals tile the timeline per key: "valid at d" ≡
    "most recent version start ≤ d". One shuffle on the dimension key;
    facts whose ship day precedes the first version simply drop (inner
    semantics), matching the interval-join oracle exactly. Ties (a
    version starting ON the ship day) resolve to the new version on both
    engines: the window orders version rows before fact rows at equal
    dates only via the is_fact 0/1 secondary key.

    Same-day version churn: two changes for one key on one day historize
    as a zero-length interval [d, d) plus the survivor [d, next). The
    zero-length version can match no fact in interval semantics, so it is
    dropped BEFORE the union — which also makes (custkey, day) unique on
    the dim side, the determinism requirement for last() under equal
    window sort keys."""
    dim = scd2_build(spark, sf_dir).filter(
        F.col("valid_from") < F.col("valid_to")
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("valid_from").alias("day"),
        F.lit(0).alias("is_fact"),
        F.col("attr"),
        F.lit(None).cast("long").alias("l_orderkey"),
        F.lit(None).cast("string").alias("ship_day"),
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    orders = load(spark, sf_dir, "orders")
    fact = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        F.lit(1).alias("is_fact"),
        F.lit(None).cast("string").alias("attr"),
        "l_orderkey",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    )
    stream = dim.unionByName(fact)
    w = (
        Window.partitionBy("custkey")
        .orderBy(F.asc("day"), F.asc("is_fact"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = stream.withColumn(
        "priority_at_ship", F.last("attr", ignorenulls=True).over(w)
    )
    return (
        carried.filter(
            (F.col("is_fact") == 1) & F.col("priority_at_ship").isNotNull()
        )
        .select(
            "l_orderkey",
            F.col("custkey").alias("o_custkey"),
            "ship_day",
            "priority_at_ship",
        )
    )


_SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
    SELECT o_orderkey,
           md5(CONCAT(o_orderstatus, '|', CAST(CAST(o_totalprice AS
               DECIMAL(18,2)) AS VARCHAR), '|', o_orderpriority)) AS row_hash
    FROM orders WHERE o_orderkey % 11 <> 0
), new AS (
    SELECT o_orderkey,
           md5(CONCAT(CASE WHEN o_orderkey % 7 = 0 THEN 'R'
                           ELSE o_orderstatus END, '|',
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '|',
               o_orderpriority)) AS row_hash
    FROM orders WHERE o_orderkey % 13 <> 0
)
SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.row_hash <> n.row_hash THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
GROUP BY status
"""


@register("diff_snapshots", oracle=_SNAPSHOT_DIFF_ORACLE, tags=("merge", "quality"))
def diff_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff audit — the reconciliation step after any
    upsert/backfill/migration: given yesterday's and today's snapshot of
    the same table, report how many rows were added, removed, changed, and
    unchanged. This is the validation twin of upsert_snapshot above: MERGE
    produces the new snapshot, diff proves what the merge did.

    Rows compare by a single md5 over the canonicalized payload (decimals
    pinned to a fixed scale so formatting can't masquerade as change) —
    computed in the map stage, so the full-outer join ships (key, 32-byte
    hash) instead of whole rows. At 100 TB that is the difference between
    shuffling two table-widths and shuffling two key columns; with both
    snapshots bucketed on the key the exchange disappears entirely. The
    two synthetic snapshots here carve deterministic subsets of orders
    (drop keys %11=0 from old, %13=0 from new, flip status on %7=0) so
    every status bucket is non-empty at every SF.
    """
    orders = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.md5(
            F.concat_ws("|", F.col("o_orderstatus"), price, F.col("o_orderpriority"))
        ).alias("row_hash"),
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.md5(
            F.concat_ws(
                "|",
                F.when(F.col("o_orderkey") % 7 == 0, F.lit("R")).otherwise(
                    F.col("o_orderstatus")
                ),
                price,
                F.col("o_orderpriority"),
            )
        ).alias("row_hash"),
    )
    o, n = old.alias("o"), new.alias("n")
    joined = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("removed"))
        .when(F.col("o.row_hash") != F.col("n.row_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


_SCD2_LATE_ORACLE = """
WITH affected AS (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 7 = 3
)
SELECT o.o_custkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS valid_from,
       COALESCE(
           strftime(LEAD(o.o_orderdate) OVER (
               PARTITION BY o.o_custkey
               ORDER BY o.o_orderdate, o.o_orderkey), '%Y-%m-%d'),
           '9999-12-31') AS valid_to,
       o.o_orderpriority AS attr,
       CASE WHEN LEAD(o.o_orderdate) OVER (
                PARTITION BY o.o_custkey
                ORDER BY o.o_orderdate, o.o_orderkey) IS NULL
            THEN 1 ELSE 0 END AS is_current,
       CAST(a.o_custkey IS NOT NULL AS BIGINT) AS was_corrected
FROM orders o LEFT JOIN affected a ON o.o_custkey = a.o_custkey
"""


@register("scd2_late_arriving", oracle=_SCD2_LATE_ORACLE, tags=("merge",))
def scd2_late_arriving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving change repair for an SCD2 dimension — the warehouse
    failure mode `scd2_build` alone can't handle: a change record lands
    AFTER later changes were already historized, so existing validity
    intervals must SPLIT (the late row closes the interval that was
    covering its date). The scale-correct repair never re-historizes the
    whole dimension: late keys are isolated (one distinct + semi-join),
    ONLY that slice re-windows over (stored history ∪ late rows), and
    the untouched majority passes through with an anti-join — at 100 TB
    the repair cost tracks the late batch's key count, not the
    dimension size. Every output row carries `was_corrected` so
    downstream consumers can invalidate caches per key.

    Fixture simulation: orders with o_orderkey % 7 = 3 are the late
    batch (deterministic, mirrored); the on-time build here is
    recomputed because the harness has no stored table — in production
    it is the persisted SCD2, which is the whole point of repairing
    incrementally. Semantics check: the repaired slice must equal the
    from-scratch rebuild for those keys, and the oracle IS that full
    rebuild plus the flag — agreement proves the incremental path
    loses nothing. The equality of the two plans is exactly what the
    hash check certifies."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    )
    late = orders.filter(F.col("o_orderkey") % 7 == 3)
    ontime = orders.filter(F.col("o_orderkey") % 7 != 3)
    affected = late.select("o_custkey").distinct()

    def historize(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        nxt = F.lead("o_orderdate").over(w)
        return df.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, "yyyy-MM-dd"), F.lit("9999-12-31")
            ).alias("valid_to"),
            F.col("o_orderpriority").alias("attr"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
        )

    # repair slice: (on-time history ∪ late rows) for affected keys only
    repaired = historize(
        ontime.join(affected, "o_custkey", "left_semi").unionByName(late)
    ).withColumn("was_corrected", F.lit(1).cast("long"))
    untouched = historize(
        ontime.join(affected, "o_custkey", "left_anti")
    ).withColumn("was_corrected", F.lit(0).cast("long"))
    return repaired.unionByName(untouched)
