"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:

- the payload is an opaque ``binary`` column; metadata (modality, codec,
  dims, duration) is a typed struct next to it.  Parquet stores binary
  contiguously per row-group, so scans that only touch metadata never
  read the payload bytes (column pruning does the heavy lifting).
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole columns
  per batch, no per-row serde.  Repartition *before* the decode stage to
  size batches for worker memory (big payloads → more, smaller
  partitions).
- the actual codec calls (PIL/librosa/ffmpeg) are NOT available in this
  container, so ``decode_image``/``decode_audio`` raise
  ``NotImplementedError`` behind a clearly marked seam, and the pipeline
  is exercised end-to-end with ``fake_decode`` — a deterministic
  bytes→features stub with the same signature/schema, so the Spark-side
  plumbing (schemas, batching, partitioning) is fully real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dblab_ece_trino_spark.operators.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), True),
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("modality", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


# ----------------------------------------------------------- decoder seam
def decode_image(payload: bytes) -> "object":
    """REAL DECODER STUB — image libs are not bundled in this container.

    In production this would be e.g. PIL.Image.open(io.BytesIO(payload));
    the mapInPandas plumbing around it is identical.
    """
    raise NotImplementedError("image decoding requires an image library (e.g. PIL)")


def decode_audio(payload: bytes) -> "object":
    """REAL DECODER STUB — audio libs are not bundled in this container."""
    raise NotImplementedError("audio decoding requires an audio library")


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode+feature-extract: fixed-dim
    features derived from byte statistics.  Same signature/shape as a real
    extractor, so the pipeline around it is production-shaped."""
    if payload is None:
        return [0.0] * dim
    n = len(payload)
    out = []
    for i in range(dim):
        # strided byte sums — cheap, deterministic, content-sensitive
        s = sum(payload[i::dim]) if n else 0
        out.append(round(s / (n or 1), 6))
    return out


# ------------------------------------------------------- pipeline operators
def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents corpus (text bytes as the
    opaque payload) — the container has no real image/audio fixtures, but
    every pipeline property (binary column, typed metadata, batch decode)
    is exercised for real."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("utf-8").alias("codec"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, dim: int = 8, decoder=None) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas: each batch arrives as a pandas DataFrame; the decode loop
    is per-row *within* a columnar batch (the unavoidable shape for codec
    calls), with no Spark-side per-row overhead.

    ``decoder`` injects the real codec: any ``bytes -> list[float]``
    callable (e.g. a PIL/torchvision feature extractor) is shipped to the
    workers via the closure — the stub is pluggable, not hard-coded.
    Defaults to the deterministic ``fake_decode``.
    """
    decode = decoder or (lambda p: fake_decode(p, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "modality": pdf["meta"].map(
                        lambda m: m["modality"] if m is not None else None
                    ),
                    "feature": pdf["payload"].map(decode),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: expands each video payload into frame
    rows (media_id, frame_idx, ts_ms).  The real decoder seam is
    ``decode_*``; here frame count derives from metadata duration."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(
            (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int"),
            F.lit(0),
        ),
    )
    return media.select(
        "media_id", F.explode(frames).alias("frame_idx")
    ).withColumn("ts_ms", F.col("frame_idx") * every_ms)


def _resize_payload(payload: bytes, width: int, height: int) -> bytes:
    """REAL RESIZE STUB — in production: decode → PIL resize → re-encode.
    The deterministic fake keeps a content-dependent prefix so downstream
    stages see size-changed, content-derived bytes."""
    if payload is None:
        return None
    keep = max(1, min(len(payload), width * height))
    # pad empty payloads to the 1-byte floor (b''[:1] is still 0 bytes,
    # which would diverge from the least(greatest(len,1),w*h) contract)
    return (payload or b"\x00")[:keep]


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, resizer=None
) -> DataFrame:
    """Arrow-batched resize stage: payload transformed through the codec
    seam, metadata struct rewritten with the new dimensions.  Same
    mapInPandas shape as a real thumbnailer; partition-size the input so a
    batch of payloads fits the Python worker (the 100 TB knob).

    ``resizer`` injects the real codec: any
    ``(bytes, width, height) -> bytes`` callable (decode → resize →
    re-encode) replaces the deterministic stub."""
    resize = resizer or _resize_payload

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(
                lambda m: None
                if m is None
                else {**m, "width": width, "height": height}
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: resize(p, width, height)
                    ),
                    "meta": meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


# ------------------------------------------------------------ query entries
def _q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dblab_ece_trino_spark.entrypoints import engine_for

    docs = engine_for(spark, sf_dir).catalogs.table("lake.llm.documents")
    media = media_from_documents(docs)
    feats = extract_features(media)
    # project the oracle-checkable scalar columns; the feature vector is
    # covered by the determinism test in tests/test_multimodal.py
    return feats.select("media_id", "n_bytes", "modality")


def _q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling over synthetic durations (1 ms per char) — the
    sequence-explode expansion is the real operator; durations would come
    from container metadata in production."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    docs = engine_for(spark, sf_dir).catalogs.table("lake.llm.documents")
    media = media_from_documents(docs).withColumn(
        "meta",
        F.col("meta").withField("duration_ms", F.col("media_id") % 5000 + 1000),
    )
    return frame_sample(media, every_ms=1000)


register(
    "multimodal_frame_sample",
    _q_multimodal_frames,
    # one frame row per started second of the synthetic duration
    # (doc_id % 5000 + 1000 ms); floor() because Spark's double->int cast
    # truncates while DuckDB's rounds.
    oracle="""
    SELECT doc_id AS media_id, frame_idx, frame_idx * 1000 AS ts_ms
    FROM (
      SELECT doc_id,
             unnest(generate_series(
               0, CAST(floor((doc_id % 5000 + 1000) / 1000.0) AS INT))) AS frame_idx
      FROM documents
    )
    """,
)


def _q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage through the Arrow mapInPandas codec seam; the
    oracle-checkable projection is the rewritten metadata plus the
    deterministic fake-resize byte length (min(len, w·h))."""
    from dblab_ece_trino_spark.entrypoints import engine_for

    docs = engine_for(spark, sf_dir).catalogs.table("lake.llm.documents")
    media = media_from_documents(docs)
    resized = resize_media(media, width=64, height=64)
    return resized.select(
        "media_id",
        F.octet_length("payload").alias("n_bytes_resized"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


register(
    "multimodal_resize",
    _q_multimodal_resize,
    oracle="""
    SELECT doc_id AS media_id,
           least(greatest(octet_length(encode(text)), 1), 64*64) AS n_bytes_resized,
           64 AS width, 64 AS height
    FROM documents
    """,
)


register(
    "multimodal_features",
    _q_multimodal_features,
    # byte length of the utf-8 payload is SQL-expressible: DuckDB's
    # encode() yields the same bytes.
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           'text' AS modality
    FROM documents
    """,
)
