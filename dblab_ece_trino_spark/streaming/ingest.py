"""Streaming document ingest: the continuous front door of the
training-data pipeline.

Batch curation (operators/llmprep.py, operators/dedup.py) assumes the
corpus is at rest; real corpora arrive continuously.  This module runs
the same cleaning semantics as a Structured Streaming pipeline:

    files → PII redaction → quality gate → watermark-bounded exact dedup

Every stage is chosen for bounded state at 100 TB/day:

- redaction and scoring are stateless projections (identical code to the
  batch operators — Column expressions don't care whether the plan is
  streaming);
- dedup uses ``dropDuplicatesWithinWatermark`` on the content
  fingerprint, so the state store holds only the watermark horizon of
  fingerprints (a true global streaming dedup would grow state forever —
  the horizon IS the contract, stated rather than hidden);
- the sink is the idempotent bucketed foreachBatch writer shared with
  the events pipeline (streaming/events.write_bucketed_sink).

Tests pin stream output to the batch analog run over the same files
(tests/test_streaming.py::test_document_ingest_matches_batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dblab_ece_trino_spark.operators.llmprep import PII_PATTERNS
from dblab_ece_trino_spark.operators.text import quality_score

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_document_stream(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over a documents directory (schema pinned —
    streaming sources never infer), one file per micro-batch so tests
    exercise true incremental processing."""
    return (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )


def _redacted(text: Column) -> Column:
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return red


def clean_document_stream(
    docs: DataFrame,
    min_quality: float = 0.5,
    watermark: str = "1 hour",
) -> DataFrame:
    """The cleaning pipeline, streaming or batch (same expressions).

    Ingest time is content-addressed (derived from doc_id) rather than
    wall-clock so replays are deterministic; production would use the
    source's event time.  Output: one row per first-seen fingerprint
    with the redacted text and quality score.
    """
    staged = (
        docs.withColumn("ingest_ts", F.timestamp_seconds(F.col("doc_id")))
        .withColumn("fingerprint", F.md5("text"))
        .withColumn("clean_text", _redacted(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .filter(F.col("quality") >= min_quality)
    )
    if staged.isStreaming:
        return staged.withWatermark(
            "ingest_ts", watermark
        ).dropDuplicatesWithinWatermark(["fingerprint"])
    return staged.dropDuplicates(["fingerprint"])
