"""Readers/writers for the non-parquet formats the catalog can host.

Each reader returns a DataFrame with a *declared* schema (SURVEY §1.3:
fixed schemas are the norm; inference is reserved for the ES-analog
path where the reference also infers).  The catalog's ``TableSpec.fmt``
dispatches here, so a table's storage format is invisible to queries —
the same property Trino's connector SPI provides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read.options(**(options or {"header": "true"}))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    reader = spark.read.options(**(options or {}))
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned sink: one directory per partition value.

    At scale this is what makes partition *pruning* possible — a filter
    on the partition column prunes directories before any file is opened
    (the analog of the reference's pushed scan constraints).
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: pre-shuffled storage for co-located joins.

    Two tables bucketed by the same key with the same bucket count join
    with NO exchange — the shuffle was paid once at write time.  This is
    the Spark-native answer to the reference's hash-bucketed export
    (loader.py:213-218) and the single biggest lever for repeated
    big-big joins at 100 TB.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a dropped managed table can leave its location behind (e.g. after an
    # aborted write); Spark refuses to recreate over it
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table_name.lower()}", ignore_errors=True)

    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name, format="parquet")
