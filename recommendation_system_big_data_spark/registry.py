"""Central query registry.

Every implemented operator from SURVEY.md §2 registers a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes the registry to the
correctness driver; ``bench.py`` times the headline subset.

Determinism contract (SURVEY.md §7.3): every registered query uses explicit
tiebreakers, fixed seeds, and ROUND(x, 6) on float outputs so the driver's
order-insensitive value-hash comparison is stable. Queries whose semantics
are not SQL-expressible (ALS, LSH, true streaming runs, sampling) register
with ``oracle=None`` → the driver records a weaker rows-only check.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Modules that register queries on import. Order is cosmetic only.
_QUERY_MODULES = (
    "recommendation_system_big_data_spark.queries.flagship",
    "recommendation_system_big_data_spark.queries.tpch",
    "recommendation_system_big_data_spark.operators.relational",
    "recommendation_system_big_data_spark.operators.profile",
    "recommendation_system_big_data_spark.operators.windows",
    "recommendation_system_big_data_spark.operators.dedup",
    "recommendation_system_big_data_spark.operators.sampling",
    "recommendation_system_big_data_spark.operators.similarity",
    "recommendation_system_big_data_spark.operators.multimodal",
    "recommendation_system_big_data_spark.operators.recommend",
    "recommendation_system_big_data_spark.operators.bucketing",
    "recommendation_system_big_data_spark.operators.asof",
    "recommendation_system_big_data_spark.operators.sql_surface",
    "recommendation_system_big_data_spark.functions.text",
    "recommendation_system_big_data_spark.functions.json_fns",
    "recommendation_system_big_data_spark.functions.datetime_fns",
    "recommendation_system_big_data_spark.sources.csv",
    "recommendation_system_big_data_spark.sources.sinks",
    "recommendation_system_big_data_spark.streaming.jobs",
    "recommendation_system_big_data_spark.streaming.stateful",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → rows-only check (⊘)
    tags: tuple[str, ...]


_REGISTRY: dict[str, QueryDef] = {}
_loaded = False


def register(name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, tags=tuple(tags))
        return fn

    return deco


def load_all_modules() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def registry() -> dict[str, QueryDef]:
    load_all_modules()
    return dict(sorted(_REGISTRY.items()))


def get_query(name: str) -> QueryDef:
    return registry()[name]


def all_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in registry().items()}


def all_oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in registry().items() if q.oracle is not None}
