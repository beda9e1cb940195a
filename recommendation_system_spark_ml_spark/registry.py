"""Query registry feeding the driver contract (__spark_entry__.py).

Every implemented operator from SURVEY.md §2 registers a QuerySpec:
a (spark, sf_dir) -> DataFrame callable plus, when ANSI-SQL can express
the same semantics, a DuckDB oracle string. Column names are aligned on
both sides (the driver's compare sorts columns by name before hashing).

Float discipline for oracle-hashable queries: every non-exact float
output is wrapped in round() AT THE SAME PRECISION on both sides, at a
granularity coarse relative to cross-engine summation noise (sums of
~1e8 magnitude -> round 2; averages -> round 4..6). Integer-valued
doubles (e.g. l_quantity) sum exactly and need no rounding.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None -> rows-only check
    bench: bool = False        # include in bench.py headline set


def register(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn
    return deco


# Modules whose import populates the registry.
_QUERY_MODULES = (
    "recommendation_system_spark_ml_spark.plans.flagship",
    "recommendation_system_spark_ml_spark.operators.relational",
    "recommendation_system_spark_ml_spark.operators.analytics",
    "recommendation_system_spark_ml_spark.operators.formats",
    "recommendation_system_spark_ml_spark.operators.joins",
    "recommendation_system_spark_ml_spark.operators.aggregates",
    "recommendation_system_spark_ml_spark.operators.windows",
    "recommendation_system_spark_ml_spark.functions.scalar",
    "recommendation_system_spark_ml_spark.streaming.windows",
    "recommendation_system_spark_ml_spark.streaming.stateful",
    "recommendation_system_spark_ml_spark.streaming.upsert",
    "recommendation_system_spark_ml_spark.operators.sqlapi",
    "recommendation_system_spark_ml_spark.operators.scale",
    "recommendation_system_spark_ml_spark.operators.dedup",
    "recommendation_system_spark_ml_spark.operators.similarity",
    "recommendation_system_spark_ml_spark.operators.textops",
    "recommendation_system_spark_ml_spark.operators.multimodal",
    "recommendation_system_spark_ml_spark.ml.parity",
)


def all_specs() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)
