"""Multimodal (binary) columns alongside relational data (SURVEY.md
§2.B-10 ``multimodal_cols``; north-star LLM-data-pipeline surface).

The reference's data model is pure text lines (``hadoop_tutorial/src/
Kmeans.java:204-213``); this extends the engine to opaque media blobs:
image/audio/video payloads ride as ``BinaryType`` columns with typed
metadata, and per-blob processing (decode, feature-extract, frame-
sample) runs as Arrow-batched ``mapInPandas`` over those columns.

The container has no media libraries, so *payloads are deterministic
fakes* (the UTF-8 bytes of ``documents.text``) and real decoders are
clearly-marked stubs (``decode_image``/``decode_audio`` below raise
``NotImplementedError`` unless PIL/soundfile are importable). What IS
real and tested: the Spark-side plumbing — BinaryType schema, Arrow
batch transfer of binary columns, UDF signatures, frame-slice layout,
and partitioning.

Scale notes (100 TB):
  * Blobs never shuffle here: metadata extraction and frame sampling
    are narrow per-row expressions; ``mapInPandas`` preserves
    partitioning. At 100 TB keep blobs in their own parquet column
    (column pruning skips them unless referenced) and size
    ``maxPartitionBytes`` so a batch of blobs fits executor memory.
  * ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the Arrow
    batch footprint when individual blobs are large.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nchu_bigdata_spark.compat import dround, sql_dround
from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register

_FRAME_LEN = 128  # chars per sampled frame
_FRAME_STRIDE = 256  # sample one frame every N chars


def _modality(col: str = "doc_id") -> F.Column:
    return (
        F.when(F.col(col) % 3 == 0, "image")
        .when(F.col(col) % 3 == 1, "audio")
        .otherwise("video")
    )


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the fake media payload (UTF-8 bytes of text) + modality
    tag — the multimodal table shape: relational cols + binary col +
    typed metadata."""
    return docs.select(
        "doc_id",
        _modality().alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
    )


# --------------------------------------------------------------------------
# multimodal_cols — binary column + typed metadata, JVM-side
# --------------------------------------------------------------------------


@register(
    "multimodal_cols",
    tags=("b10",),
    oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               substring(hex(encode(text)), 1, 32) AS payload_head_hex,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal table: BinaryType payload + modality tag + metadata
    (byte length, content digest). All narrow JVM expressions — blob
    metadata never leaves the scan stage. The BinaryType column itself
    stays internal: the output carries its first-16-bytes hex prefix,
    byte length, and digest (raw binary output is a bytearray in pandas,
    which crashes the driver's canonicalizer — and at 100 TB you never
    ship blobs to a result set anyway).

    (Oracle note: DuckDB 1.0 md5 only takes VARCHAR; md5(text) equals
    md5 of its UTF-8 bytes, which is what Spark hashes. The hex prefix
    is sliced from the full hex string — character-safe on both engines,
    unlike byte-slicing multibyte text.)"""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).select(
        "doc_id",
        "modality",
        F.substring(F.hex(F.col("payload")), 1, 32).alias("payload_head_hex"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


# --------------------------------------------------------------------------
# multimodal_framesample — strided frame sampling, JVM-side
# --------------------------------------------------------------------------


@register(
    "multimodal_framesample",
    tags=("b10",),
    oracle=f"""
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               md5(substr(text, i * {_FRAME_STRIDE} + 1, {_FRAME_LEN}))
                   AS frame_md5
        FROM documents,
             unnest(range((length(text) + {_FRAME_STRIDE} - 1)
                          // {_FRAME_STRIDE})) AS r(i)
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling: one {fl}-char frame per {fs}-char window
    of the payload (the video keyframe-sampling shape). Narrow explode
    — frames are sliced inside the scan stage, no shuffle; only
    (doc_id, idx, digest) rows flow downstream, never the blob."""
    docs = table(spark, sf_dir, "documents")
    n_frames = F.floor(
        (F.length("text") + _FRAME_STRIDE - 1) / _FRAME_STRIDE
    ).cast("int")
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        "text",
    ).select(
        "doc_id",
        "frame_idx",
        F.md5(
            F.substring(
                F.col("text"), F.col("frame_idx") * _FRAME_STRIDE + 1, _FRAME_LEN
            )
        ).alias("frame_md5"),
    )


# --------------------------------------------------------------------------
# multimodal_decode — Arrow-batched feature extraction (rows-only)
# --------------------------------------------------------------------------

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("byte_std", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def decode_image(payload: bytes):
    """STUB — real image decode needs pillow, which is not in this
    container. The Spark-side plumbing (binary column → Arrow batch →
    per-blob python) is exercised by ``_extract_features`` instead."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow (not installed); "
            "plumbing is tested via the deterministic byte-feature path"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


def decode_audio(payload: bytes):
    """STUB — see decode_image."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires soundfile (not installed)"
        ) from e
    raise NotImplementedError("wire soundfile decode here when available")


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic per-blob features (byte moments) standing in for a
    real decoder; numpy over the Arrow-delivered bytes, one batch at a
    time, bounded memory."""
    import numpy as np

    for pdf in batches:
        feats = []
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            b = np.frombuffer(bytes(payload), dtype=np.uint8)
            feats.append(
                (
                    int(doc_id),
                    str(modality),
                    int(b.size),
                    float(round(b.mean(), 6)) if b.size else 0.0,
                    float(round(b.std(), 6)) if b.size else 0.0,
                    "byte-moments-stub",
                )
            )
        yield pd.DataFrame(
            feats,
            columns=[
                "doc_id",
                "modality",
                "n_bytes",
                "byte_mean",
                "byte_std",
                "decoder",
            ],
        )


@register(
    "multimodal_decode",
    tags=("b10",),
    oracle=None,  # rows-only: python decode path, not SQL-expressible
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched 'decode' over the binary column via ``mapInPandas``
    — the real 100 TB decode shape: partition-preserving (no shuffle),
    per-batch memory bounded, blob bytes cross to Python exactly once.
    Features are deterministic byte moments (see module doc: real
    decoders are stubbed, plumbing is real)."""
    docs = table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(_extract_features, _DECODE_SCHEMA)
