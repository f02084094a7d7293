"""Data loading pipeline — parity with the reference's data-loader.

The reference loader (/root/reference/data-loader/loader.py) has three
modes, mapped here Spark-first:

1. ``leader_ctas`` (loader.py:312-374): drop targets in parallel, CREATE
   SCHEMA IF NOT EXISTS, then parallel CTAS ``tpcds.sfN.<t>`` into the
   PG/Mongo catalogs under a bounded ThreadPoolExecutor (loader.py:184).
   → ``ctas_load``: read the generator source (the driver's parquet
   testdata standing in for the TPC-DS connector), write each table to its
   catalog's warehouse path with ``df.write.mode("overwrite")``, same
   bounded thread pool.  Spark writes are already parallel *within* a
   table (one task per partition); the pool parallelizes *across* tables
   exactly like the reference.

2. ``es_load_bucket`` streaming export (loader.py:202-248): each worker
   streams its deterministic hash-bucket slice (loader.py:213-218) and
   POSTs ``_bulk`` NDJSON batches of ``--batch-rows`` docs
   (loader.py:137-152).
   → ``export_bucketed_ndjson``: one shuffle on the bucket id
   (``repartition(N, bucket)``), then ``foreachPartition`` writes NDJSON
   batch files — executor-side, no driver collect, batch size preserved.
   Spark's repartition *subsumes* the reference's manual bucket predicate
   re-scan (it scans the source once, not once per bucket).

3. DDL (loader.py:251-265, 347-349) → ``create_schema`` / ``drop_table``.

Scale: at 100 TB the CTAS path is bottlenecked by the shuffle-free
read→write pipeline (good); the export path by the single bucket shuffle.
Both inherit AQE partition coalescing from the engine session.
"""

from __future__ import annotations

import json
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dblab_ece_trino_spark.functions.hashing import bucket_expr
from dblab_ece_trino_spark.session import EngineSession


@dataclass
class LoadReport:
    table: str
    target: str
    rows: int


def ctas_load(
    eng: EngineSession,
    source_sf_dir: str,
    warehouse_dir: str,
    placement: dict[str, list[str]] | None = None,
    parallelism: int = 4,
) -> list[LoadReport]:
    """Parallel CTAS: source tables → per-catalog parquet warehouse.

    Mirrors loader.py:154-199 (drop + CTAS under a bounded pool), then
    registers every loaded table in the engine's catalog registry so
    3-part names resolve against the *loaded* copies.
    """
    placement = placement or eng.catalogs.REFERENCE_PLACEMENT

    def load_one(cat_schema: str, table: str) -> LoadReport:
        cat, schema = cat_schema.split(".")
        src = os.path.join(source_sf_dir, f"{table}.parquet")
        dst = os.path.join(warehouse_dir, cat, schema, table)
        # drop-if-exists analog (loader.py:163 DROP TABLE IF EXISTS)
        shutil.rmtree(dst, ignore_errors=True)
        df = eng.catalogs._read_parquet(src)
        df.write.mode("overwrite").parquet(dst)
        # count the DESTINATION so LoadReport.rows verifies the written
        # table, not the source; parquet footer metadata only — no data
        # scan, the write itself stays the only full pass.
        n = eng.spark.read.parquet(dst).count()
        eng.catalogs.register_parquet(cat, schema, table, dst)
        return LoadReport(table=table, target=f"{cat}.{schema}.{table}", rows=n)

    jobs = [
        (cat_schema, t)
        for cat_schema, tables in placement.items()
        for t in tables
        if os.path.exists(os.path.join(source_sf_dir, f"{t}.parquet"))
    ]
    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        return list(pool.map(lambda j: load_one(*j), jobs))


def export_bucketed_ndjson(
    df: DataFrame,
    key_col: str,
    out_dir: str,
    num_buckets: int = 8,
    batch_rows: int = 1000,
) -> int:
    """Hash-bucketed streaming export — the ES ``_bulk`` path, Spark-first.

    The reference assigns each worker ``mod(hash(key), N) = b`` and
    re-scans the source per bucket (loader.py:223-235); here one
    ``repartition(N, bucket)`` shuffle routes every row to its bucket's
    task, and each task streams its partition in ``batch_rows`` NDJSON
    chunks (the ``_bulk`` payload shape, loader.py:137-152) — executor-side
    file writes, nothing through the driver.

    Returns the number of batch files written.
    """
    os.makedirs(out_dir, exist_ok=True)
    bucketed = df.withColumn("__bucket", bucket_expr(F.col(key_col), num_buckets))
    cols = [c for c in df.columns]

    def write_partition(rows) -> None:
        # Runs on executors; import-local state only.  A Spark partition
        # holds rows of SEVERAL bucket ids (repartition hashes the bucket
        # value — murmur3(bucket) % numPartitions — it does not map bucket
        # b to partition b), so each row is routed to a buffer keyed by
        # its OWN bucket value and every buffer flushes independently.
        # File names carry the Spark partition id so two partitions that
        # share a bucket id can never collide.
        import json as _json
        import os as _os

        from pyspark import TaskContext

        task_pid = TaskContext.get().partitionId()
        batches: dict[int, list[str]] = {}
        seqs: dict[int, int] = {}

        def flush(bucket: int) -> None:
            batch = batches.get(bucket)
            if not batch:
                return
            seq = seqs.get(bucket, 0)
            path = _os.path.join(
                out_dir,
                f"bucket={bucket}",
                f"batch-{task_pid:04d}-{seq:05d}.ndjson",
            )
            _os.makedirs(_os.path.dirname(path), exist_ok=True)
            with open(path, "w", encoding="utf-8") as f:
                f.write("\n".join(batch) + "\n")
            batch.clear()
            seqs[bucket] = seq + 1

        for row in rows:
            d = row.asDict(recursive=True)
            bucket = d.pop("__bucket")
            batch = batches.setdefault(bucket, [])
            batch.append(_json.dumps({k: d[k] for k in cols}, default=str))
            if len(batch) >= batch_rows:
                flush(bucket)
        for bucket in list(batches):
            flush(bucket)

    bucketed.repartition(num_buckets, "__bucket").foreachPartition(write_partition)
    return sum(len(files) for _, _, files in os.walk(out_dir))


def create_schema(eng: EngineSession, name: str) -> None:
    """CREATE SCHEMA IF NOT EXISTS parity (loader.py:347-349)."""
    eng.spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_table(eng: EngineSession, name: str) -> None:
    """DROP TABLE IF EXISTS parity (loader.py:251-265)."""
    eng.spark.sql(f"DROP TABLE IF EXISTS {name}")


def export_manifest(reports: list[LoadReport], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump([r.__dict__ for r in reports], f, indent=2)


def ctas_load_jdbc(
    eng: EngineSession,
    source_sf_dir: str,
    url: str,
    tables: list[str],
    catalog: str = "psql",
    schema: str = "public",
    options: dict[str, str] | None = None,
    parallelism: int = 4,
) -> list[LoadReport]:
    """Parallel CTAS into a JDBC store — the reference loader's actual
    PostgreSQL load step (loader.py:312-374 CTAS into the PG catalog),
    not the parquet stand-in: each table is written through
    ``df.write.format("jdbc")`` (executor-side batched INSERTs, one
    connection per partition — Spark's distributed analog of the
    reference's per-worker load), then re-registered as a ``jdbc``
    TableSpec so 3-part names resolve against the *store*, with
    filter/aggregate pushdown from then on.

    ``rows`` counts the DESTINATION via a JDBC count — the same
    write-verification discipline as ``ctas_load``.
    """
    from dblab_ece_trino_spark.catalog import TableSpec

    opts = dict(options or {})

    def load_one(table: str) -> LoadReport:
        src = os.path.join(source_sf_dir, f"{table}.parquet")
        dst = table.upper()
        df = eng.catalogs._read_parquet(src)
        (
            df.write.format("jdbc")
            .options(**opts)
            .option("url", url)
            .option("dbtable", dst)
            .mode("overwrite")
            .save()
        )
        eng.catalogs.register(
            TableSpec(
                catalog,
                schema,
                table,
                "jdbc",
                options={**opts, "url": url, "dbtable": dst},
            )
        )
        n = (
            eng.spark.read.format("jdbc")
            .options(**opts)
            .option("url", url)
            .option("dbtable", dst)
            .load()
            .count()
        )
        return LoadReport(table=table, target=f"{catalog}.{schema}.{table}", rows=n)

    with ThreadPoolExecutor(max_workers=parallelism) as pool:
        return list(pool.map(load_one, tables))
