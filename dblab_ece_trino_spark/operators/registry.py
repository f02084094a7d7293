"""Registry of operator-level queries for the driver correctness gate.

Every operator in SURVEY.md §2 gets a focused query here: a Spark callable
(SQL through the engine, or a DataFrame-API build) plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string.  Operators
whose results are engine-specific (hash bucketing values, LSH bucket
assignments, streaming state) register without an oracle and get the
driver's rows-only check, backed by property tests in tests/.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class OpQuery:
    name: str
    spark_fn: SparkQuery
    oracle: str | None = None


_REGISTRY: dict[str, OpQuery] = {}


def register(name: str, spark_fn: SparkQuery, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate operator query name: {name}")
    _REGISTRY[name] = OpQuery(name, spark_fn, oracle)


def register_sql(name: str, spark_sql: str, oracle: str | None = None) -> None:
    """Register a query given as engine SQL text (3-part names allowed)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dblab_ece_trino_spark.entrypoints import engine_for

        return engine_for(spark, sf_dir).sql(spark_sql, name=name)

    run.__name__ = f"query_{name}"
    register(name, run, oracle)


def _ensure_loaded() -> None:
    # Importing the operator modules performs their registrations.
    from dblab_ece_trino_spark.operators import (  # noqa: F401
        relational,
        joins,
        dedup,
        similarity,
        text,
        multimodal,
        sqlsurface,
    )
    from dblab_ece_trino_spark import queries_tpch  # noqa: F401
    from dblab_ece_trino_spark import queries_tpch_ext  # noqa: F401
    from dblab_ece_trino_spark import queries_advanced  # noqa: F401


def spark_queries() -> dict[str, SparkQuery]:
    _ensure_loaded()
    return {n: o.spark_fn for n, o in _REGISTRY.items()}


def oracle_queries() -> dict[str, str]:
    _ensure_loaded()
    return {n: o.oracle for n, o in _REGISTRY.items() if o.oracle is not None}
