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
