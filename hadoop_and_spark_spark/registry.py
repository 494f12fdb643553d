"""Central query registry.

Aggregates every operator module's ``QUERIES`` (name -> callable
(spark, sf_dir) -> DataFrame) and ``ORACLE_SQL`` (name -> DuckDB SQL
string) into the driver contract exposed by ``__spark_entry__.py``.

Modules register lazily so a bug in one family never hides the rest.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_OPERATOR_MODULES = (
    "hadoop_and_spark_spark.operators.relational",
    "hadoop_and_spark_spark.operators.text",
    "hadoop_and_spark_spark.operators.index",
    "hadoop_and_spark_spark.operators.graph",
    "hadoop_and_spark_spark.operators.ml",
    "hadoop_and_spark_spark.operators.dedup",
    "hadoop_and_spark_spark.operators.similarity",
    "hadoop_and_spark_spark.operators.textstats",
    "hadoop_and_spark_spark.operators.temporal",
    "hadoop_and_spark_spark.operators.multimodal",
    "hadoop_and_spark_spark.streaming.windows",
    "hadoop_and_spark_spark.sources.taxi",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _OPERATOR_MODULES:
        try:
            mod = importlib.import_module(modname)
        except ImportError:
            continue
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {modname}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE_SQL", {}))
    return queries, oracles
