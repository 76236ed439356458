"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``recommendation_system_big_data_spark``
package; this module only adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from recommendation_system_big_data_spark import registry as _registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference shape model-als.py:141-158 → SURVEY.md §3.3)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from recommendation_system_big_data_spark.queries.flagship import (
        flagship_top_customers,
    )

    return flagship_top_customers(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops whose semantics are not
    SQL-expressible (ALS, LSH, streaming runs, sampling — SURVEY.md §5.2)
    are omitted → rows-only checks."""
    return _registry.all_oracles()
