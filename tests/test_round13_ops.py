"""Round-13 additions: the ADVICE r12 degenerate-guard fixes, verified
cross-engine on planted degenerate corpora (the same class as
test_degenerate_constant_corpus_agrees_cross_engine — ANSI Spark raises
DIVIDE_BY_ZERO / LN-domain errors where DuckDB NULLs or errors, so both
engines must pin NULL explicitly)."""

from __future__ import annotations

import datetime

import duckdb

from tests.conftest import assert_oracle_match


def _duck(views: dict[str, str]):
    con = duckdb.connect()
    for name, path in views.items():
        con.execute(
            f"CREATE VIEW {name} AS"
            f" SELECT * FROM '{path}/*.parquet'"
        )
    return con


def test_degenerate_single_class_and_single_day_events(spark, tmp_path):
    """All-purchase single-day corpus: ml_eval_log_loss's pos = n must
    NULL the baseline entropy + skill score (DuckDB LN(0) would raise)
    and stat_overdispersion_index's n_days = 1 must NULL var/index/GOF
    (ANSI div-by-zero) — identically on both engines."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        _LOGLOSS_ORACLE,
        ml_eval_log_loss,
    )
    from recommendation_system_big_data_spark.operators.stats_tests import (
        _OVERDISP_ORACLE,
        stat_overdispersion_index,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), i, "purchase",
         1.0 + (i % 7), "{}")
        for i in range(200)
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(sf + "/events.parquet")

    ll = ml_eval_log_loss(spark, sf)
    r = ll.collect()[0]
    assert r["n_pos"] == r["n_total"] == 200
    assert r["baseline_entropy"] is None and r["skill_score"] is None
    assert r["mean_log_loss"] is not None

    od = stat_overdispersion_index(spark, sf)
    ro = od.collect()[0]
    assert ro["n_days"] == 1
    assert ro["var_daily"] is None
    assert ro["dispersion_index"] is None
    assert ro["poisson_gof_chi2"] is None
    assert ro["overdispersed"] is None

    con = _duck({"events": sf + "/events.parquet"})
    assert_oracle_match(ll, con, _LOGLOSS_ORACLE, "degenerate_log_loss")
    assert_oracle_match(od, con, _OVERDISP_ORACLE, "degenerate_overdisp")
    con.close()


def test_degenerate_fairness_single_class_segments(spark, tmp_path):
    """A segment whose orders are ALL fulfilled (n = n_pos → FPR rate
    divides by zero) and one with NONE (n_pos = 0 → TPR divides by
    zero) must both emit NULL rates, cross-engine-identically; the gap
    windows range over the defined rates only."""
    from recommendation_system_big_data_spark.operators.ml_eval import (
        _FAIRNESS_ORACLE,
        ml_eval_fairness_gaps,
    )

    sf = str(tmp_path)
    custs = [(1, "AUTOMOBILE"), (2, "BUILDING"), (3, "MACHINERY")]
    spark.createDataFrame(
        [(k, f"c{k}", "addr", 0, "p", 1.0, seg, "x") for k, seg in custs],
        "c_custkey long, c_name string, c_address string, c_nationkey long,"
        " c_phone string, c_acctbal double, c_mktsegment string,"
        " c_comment string",
    ).coalesce(1).write.parquet(sf + "/customer.parquet")
    orders = []
    oid = 0
    # AUTOMOBILE: all 'F' (n_pos = n); BUILDING: none 'F' (n_pos = 0);
    # MACHINERY: mixed — both rates defined, anchoring the gap windows.
    for custkey, statuses, prices in [
        (1, "FFFF", [10.0, 20.0, 900.0, 950.0]),
        (2, "OOOO", [15.0, 25.0, 910.0, 940.0]),
        (3, "FOFO", [12.0, 22.0, 920.0, 930.0]),
    ]:
        for st, pr in zip(statuses, prices):
            orders.append(
                (oid, custkey, st, pr, datetime.date(2024, 1, 1), "1-URGENT",
                 "clerk", 0, "c")
            )
            oid += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string,"
        " o_clerk string, o_shippriority int, o_comment string",
    ).coalesce(1).write.parquet(sf + "/orders.parquet")

    fg = ml_eval_fairness_gaps(spark, sf)
    got = {r["segment"]: r for r in fg.collect()}
    assert got["AUTOMOBILE"]["fpr_micros"] is None
    assert got["AUTOMOBILE"]["tpr_micros"] is not None
    assert got["BUILDING"]["tpr_micros"] is None
    assert got["BUILDING"]["fpr_micros"] is not None
    assert got["MACHINERY"]["tpr_micros"] is not None
    assert got["MACHINERY"]["fpr_micros"] is not None
    # the gaps range over defined rates only (MAX/MIN skip NULLs)
    assert got["AUTOMOBILE"]["tpr_gap_micros"] is not None

    con = _duck({
        "customer": sf + "/customer.parquet",
        "orders": sf + "/orders.parquet",
    })
    assert_oracle_match(fg, con, _FAIRNESS_ORACLE, "degenerate_fairness")
    con.close()


def test_degenerate_gi_star_zero_variance_grid(spark, tmp_path):
    """An empty customer table gives 864 all-zero cells — the global
    variance term is exactly 0 and every gi_z must be NULL on both
    engines (ANSI Spark would raise DIVIDE_BY_ZERO)."""
    from recommendation_system_big_data_spark.operators.geo import (
        _GI_ORACLE,
        geo_hotspot_gi_star,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [],
        "c_custkey long, c_name string, c_address string, c_nationkey long,"
        " c_phone string, c_acctbal double, c_mktsegment string,"
        " c_comment string",
    ).coalesce(1).write.parquet(sf + "/customer.parquet")

    gi = geo_hotspot_gi_star(spark, sf)
    rows = gi.collect()
    assert len(rows) == 24 * 36
    assert all(r["gi_z"] is None and r["n_points"] == 0 for r in rows)

    con = _duck({"customer": sf + "/customer.parquet"})
    assert_oracle_match(gi, con, _GI_ORACLE, "degenerate_gi_star")
    con.close()


def test_degenerate_flat_price_elasticity_cross_engine(spark, tmp_path):
    """The flat-price brand (sxx_c = 0) must NULL elasticity and r2 in
    BOTH engines — the oracle-mirror of the planted-slope unit test."""
    from recommendation_system_big_data_spark.operators.olap import (
        _ELASTICITY_ORACLE,
        olap_price_elasticity,
    )

    sf = str(tmp_path)
    lines = []
    lid = 0
    for p, q in [(1.0, 64.0), (2.0, 16.0), (4.0, 4.0), (8.0, 1.0)]:
        lines.append((lid, 1, 1, 1, q, p * q, 0.0, 0.0, "N", "O", None))
        lid += 1
    for q in [1.0, 2.0, 4.0]:  # flat unit price 3.0
        lines.append((lid, 2, 1, 1, q, 3.0 * q, 0.0, 0.0, "N", "O", None))
        lid += 1
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    ).coalesce(1).write.parquet(sf + "/lineitem.parquet")
    spark.createDataFrame(
        [(1, "pa", "BrandA", "t", 1, 1.0), (2, "pb", "BrandB", "t", 1, 3.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(sf + "/part.parquet")

    el = olap_price_elasticity(spark, sf)
    con = _duck({
        "lineitem": sf + "/lineitem.parquet",
        "part": sf + "/part.parquet",
    })
    assert_oracle_match(el, con, _ELASTICITY_ORACLE, "degenerate_elasticity")
    con.close()
