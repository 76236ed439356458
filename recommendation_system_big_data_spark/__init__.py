"""recommendation_system_big_data_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo Geronimo-Basso/recommendation-system-big-data
(a PySpark ALS recommender + EDA pipeline, see SURVEY.md), extended with the
operators a large-scale training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search,
multimodal binary columns, text analysis, and Structured Streaming.

Design stance (SURVEY.md §7):
- DataFrame/SQL first; Catalyst/Tungsten pick the physical plan.
- Built-in `pyspark.sql.functions` in every hot path (whole-stage codegen);
  Pandas UDFs via `mapInPandas` only where built-ins cannot express the
  semantics (multimodal decode stubs).
- Broadcast small dimensions, AQE on, explicit deterministic tiebreakers so
  every declared query is oracle-checkable against DuckDB.
"""

from recommendation_system_big_data_spark.session import get_spark
from recommendation_system_big_data_spark.catalog import TABLES, load, register_temp_views
from recommendation_system_big_data_spark.registry import (
    QueryDef,
    all_oracles,
    all_queries,
    get_query,
    register,
)

__all__ = [
    "get_spark",
    "TABLES",
    "load",
    "register_temp_views",
    "QueryDef",
    "register",
    "all_queries",
    "all_oracles",
    "get_query",
]

__version__ = "0.1.0"
