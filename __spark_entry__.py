"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (the q003 shape: fact ⋈ dim
broadcast join + group-by + TopN) at sf0.001.  ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the LLM-pipeline extensions; the driver compares each against DuckDB at
sf0.01 (row count + schema + order-insensitive value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dblab_ece_trino_spark.entrypoints import build_queries

    return build_queries()["q003"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dblab_ece_trino_spark.entrypoints import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from dblab_ece_trino_spark.entrypoints import build_oracles

    return build_oracles()
