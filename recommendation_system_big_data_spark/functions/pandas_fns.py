"""Arrow-batched (vectorized) Python UDF surface — the sanctioned escape
hatch when built-in functions genuinely can't express a transform.

Policy (SURVEY.md §4 / SCALING.md): nothing in the engine's hot paths uses
Python UDFs — every shipped operator is built-in/codegen'd. This module
exists to prove the *capability* with the right plumbing: `@pandas_udf`
receives whole Arrow record batches (one Python invocation per ~10k rows,
numpy-vectorized inside) instead of the row-at-a-time pickled path that is
10-100× slower. The multimodal operators (operators/multimodal.py) use the
same machinery via mapInPandas for binary payloads.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from recommendation_system_big_data_spark.catalog import load
from recommendation_system_big_data_spark.registry import register


def _log_damped_udf():
    """Build the vectorized UDF lazily — pandas_udf resolves its return
    type against the active session, so decorating at import time would
    require a SparkSession just to import the registry."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def log_damped(v: pd.Series) -> pd.Series:
        """Vectorized ln(1+|v|)·sign(v) — one numpy expression per batch."""
        import numpy as np

        return pd.Series(np.log1p(np.abs(v)) * np.sign(v))

    return log_damped


@register(
    "fn_pandas_udf_vectorized",
    oracle="""
    SELECT event_id,
           ROUND(ln(1 + abs(value)) * sign(value), 6) AS damped
    FROM events
    """,
    tags=("scalar", "udf"),
)
def fn_pandas_udf_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A scalar `@pandas_udf` transform over the event stream, oracle-checked
    against the closed-form SQL. The plan shows ArrowEvalPython — batches
    cross the JVM↔Python boundary as Arrow buffers, and the UDF cost is one
    numpy expression per batch. (For anything this expressible, prefer the
    built-in: `F.log1p(F.abs(v)) * F.signum(v)` stays in codegen — that is
    the engine's actual convention; this query exists to keep the UDF
    plumbing exercised and correct.)"""
    damped = _log_damped_udf()
    return load(spark, sf_dir, "events").select(
        "event_id", F.round(damped(F.col("value")), 6).alias("damped")
    )


_SLOPE_SCHEMA = "user_id long, n long, slope double"

_SLOPE_ORACLE = """
SELECT user_id,
       COUNT(*) AS n,
       ROUND(regr_slope(value, epoch_us(ts) / 3600000000.0), 4) AS slope
FROM events
GROUP BY user_id
"""


def _slope_fn():
    """Build the per-group OLS slope function: value vs time-in-hours,
    numerically stabilized by centering x (the covariance/variance form
    regr_slope also uses). Returned as a NESTED function on purpose:
    cloudpickle serializes closures by value, so Spark's Python workers
    never need this package importable — a module-level function would be
    pickled by reference and fail under the driver's vanilla session."""

    def slope(pdf):
        import pandas as pd_local

        x = pdf["ts_hours"].to_numpy(dtype="float64")
        y = pdf["value"].to_numpy(dtype="float64")
        xc = x - x.mean()
        denom = (xc * xc).sum()
        s = float((xc * y).sum() / denom) if denom > 0 else None
        return pd_local.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n": [len(pdf)],
                "slope": [None if s is None else round(s, 4)],
            }
        )

    return slope


@register(
    "grouped_pandas_slope",
    oracle=_SLOPE_ORACLE,
    tags=("agg", "udf"),
)
def grouped_pandas_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map `applyInPandas`: per-user OLS trend (value vs time) where
    each user's events arrive as one pandas DataFrame — the custom-per-group-
    model shape (per-entity regression/seasonality/forecast) that has no
    built-in aggregate. One shuffle on the group key, Arrow both ways, and
    each group must fit one executor's memory — the documented contract of
    grouped map (bounded per-user history here; at 100 TB cap or window the
    per-key rows first). Oracle: DuckDB's closed-form regr_slope over the
    same centered-x arithmetic; x is scaled to hours so slopes are O(1) and
    survive ROUND(,4) across engines."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") / F.lit(3.6e9)).alias("ts_hours"),
        "value",
    )
    return ev.groupBy("user_id").applyInPandas(_slope_fn(), schema=_SLOPE_SCHEMA)
