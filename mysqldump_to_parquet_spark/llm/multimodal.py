"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partitioning, Arrow batch shape) fully real
and the codec-dependent decode step stubbed.

Model (SURVEY.md §2.2 "multimodal design"):

* payload: ``BinaryType`` column — Parquet stores it as BYTE_ARRAY with
  page compression; rows stay splittable, and large blobs amortize across
  row groups.  At 100 TB the payloads ride the same partitioning as any
  other column — no side files, no path indirection to break atomicity.
* metadata: a typed struct column (media_type/width/height/duration_ms)
  — filterable + prunable without touching payload bytes (Parquet column
  projection means a metadata-only query never reads a single payload
  page; see tests/test_plans.py).
* decode / feature-extract: ``mapInPandas`` over Arrow batches.  The image
  codec libs are not in this container, so ``decode_image_batch`` raises
  ``NotImplementedError`` unless a decoder is importable; the deterministic
  fake (`fake_features`) exercises the identical batch path end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

#: Typed metadata carried beside every binary payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from documents: payload = UTF-8 bytes
    (deterministic stand-in for image bytes), metadata derived per-row."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.Series:
    """Real decoder slot — requires an image codec library.

    STUB: PIL/cv2 are not available in this container; the Spark-side
    contract (bytes in, array out, Arrow-batched) is exercised through
    ``fake_features`` instead.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decode requires PIL/cv2 (not in this environment); "
            "use fake_features for the plumbing path"
        ) from exc
    raise NotImplementedError("real decode path not implemented in v0")


def resize_image_batch(payloads: pd.Series, width: int, height: int) -> pd.Series:
    """Real resize slot — requires an image codec library (same env-gated
    contract as :func:`decode_image_batch`)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image resize requires PIL/cv2 (not in this environment); "
            "use fake_resize for the plumbing path"
        ) from exc
    raise NotImplementedError("real resize path not implemented in v0")


def fake_resize(batches: Iterator[pd.DataFrame], factor: int = 4) -> Iterator[pd.DataFrame]:
    """Deterministic resize stand-in: keep every ``factor``-th payload byte
    (a stride-subsample — the 1-D analog of nearest-neighbor downscaling).
    Same mapInPandas batch contract a real resizer would use: bytes in,
    smaller bytes + updated metadata out."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload": payloads.map(lambda b: bytes(b[::factor])),
                "orig_bytes": payloads.map(len).astype("int64"),
                "resized_bytes": payloads.map(
                    lambda b: len(b[::factor])
                ).astype("int64"),
            }
        )


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor: 4 doubles per payload
    derived from byte statistics.  Same signature/batching as a real
    decoder (mapInPandas: Arrow batches in, Arrow batches out)."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                "feat": payloads.map(
                    lambda b: [
                        float(len(b)),
                        float(b[0]) if len(b) else 0.0,
                        float(b[-1]) if len(b) else 0.0,
                        float(sum(b[:16])),
                    ]
                ),
            }
        )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_meta: binary round-trip + Arrow-batched feature
    extraction, projected to oracle-checkable scalars."""
    media = media_table(spark, sf_dir)
    feats = media.select("doc_id", "payload").mapInPandas(
        fake_features, FEATURE_SCHEMA
    )
    meta = media.select("doc_id", F.col("meta.width").alias("width"))
    return feats.join(meta, "doc_id").select(
        "doc_id",
        "n_bytes",
        "checksum",  # md5 computed inside the pandas batch — differential
        "width",     # proof the Arrow round-trip preserved every byte
        F.size("feat").cast("long").alias("n_features"),
    )


#: Frame sampling: N evenly spaced fixed-size byte windows per payload —
#: the video-keyframe / audio-clip access pattern, expressed on the opaque
#: binary column.
N_FRAMES = 4
FRAME_BYTES = 64


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_frames: sample N_FRAMES byte windows per payload
    (1 row → N rows), entirely JVM-side — ``substring`` slices BinaryType
    without decoding, so at 100 TB frame extraction never touches Python
    and reads each payload page once for all its frames.

    A real decoder would replace the md5 checksum with pixel features
    (``decode_image_batch`` is the env-gated slot); the window arithmetic,
    explode shape, and byte slicing are the production plumbing.
    Checksums run on the UTF-8 decode of each window (the corpus payloads
    are ASCII text stand-ins), which keeps a cross-engine oracle: DuckDB's
    md5 is VARCHAR-only.
    """
    media = media_table(spark, sf_dir)
    n = F.length("payload")  # byte length of the binary payload
    span = F.greatest(n - F.lit(FRAME_BYTES), F.lit(0))
    frames = media.select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"),
    ).withColumn(
        "offset", F.expr(f"(frame_idx * greatest(length(payload) - {FRAME_BYTES}, 0)) DIV {N_FRAMES - 1}")
    )
    window = F.expr(f"substring(payload, offset + 1, {FRAME_BYTES})")
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("offset").cast("long").alias("offset"),
        F.length(window).cast("long").alias("frame_bytes"),
        F.md5(F.decode(window, "UTF-8")).alias("frame_md5"),
    )


MULTIMODAL_FRAMES_SQL = f"""
SELECT doc_id,
       frame_idx,
       (frame_idx * greatest(strlen(text) - {FRAME_BYTES}, 0)) // {N_FRAMES - 1}
         AS offset,
       CAST(length(substring(
         text,
         CAST((frame_idx * greatest(strlen(text) - {FRAME_BYTES}, 0))
              // {N_FRAMES - 1} AS INTEGER) + 1,
         {FRAME_BYTES})) AS BIGINT) AS frame_bytes,
       md5(substring(
         text,
         CAST((frame_idx * greatest(strlen(text) - {FRAME_BYTES}, 0))
              // {N_FRAMES - 1} AS INTEGER) + 1,
         {FRAME_BYTES})) AS frame_md5
FROM documents,
     (SELECT unnest(generate_series(0, {N_FRAMES - 1})) AS frame_idx)
"""


MULTIMODAL_META_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT)   AS n_bytes,  -- byte length (UTF-8), not chars
       md5(text)                      AS checksum,
       CAST(n_chars % 640 AS INTEGER) AS width,
       CAST(4 AS BIGINT)              AS n_features
FROM documents
"""


QUERIES = {
    "q_multimodal_meta": multimodal_features,
    "q_multimodal_frames": multimodal_frames,
}
ORACLE = {
    "q_multimodal_meta": MULTIMODAL_META_SQL,
    "q_multimodal_frames": MULTIMODAL_FRAMES_SQL,
}
