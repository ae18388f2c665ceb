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
* decode / feature-extract: ``mapInPandas`` over Arrow batches, backed by
  a REAL dependency-free codec (uncompressed 24-bit BI_RGB BMP + binary
  PPM "P6") — header parsing, 4-byte row-stride padding, bottom-up vs
  top-down row order.  Compressed formats (JPEG/PNG) dispatch to the same
  ``decode_image`` entry point and fail loudly until a codec library is
  present; ``fake_features`` remains as the codec-free batch-path smoke.
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


# --------------------------------------------------------------- BMP codec
#
# Real, dependency-free decode path: uncompressed 24-bit BI_RGB Windows
# BMP (the interchange format every codec library writes).  Handles the
# actual format semantics — 54-byte header pair, 4-byte-aligned rows,
# bottom-up (positive height) vs top-down (negative height) storage —
# so a wrong stride or row order produces wrong pixels, not a fake.

_BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """``rgb`` is top-down row-major R,G,B triplets; output is a standard
    bottom-up 24-bit BI_RGB file (the layout virtually every writer
    emits)."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb buffer is {len(rgb)} bytes, expected {width * height * 3}"
        )
    stride = _bmp_stride(width)
    size = _BMP_HEADER_BYTES + stride * height
    out = bytearray()
    out += b"BM"
    out += size.to_bytes(4, "little")
    out += b"\x00\x00\x00\x00"
    out += _BMP_HEADER_BYTES.to_bytes(4, "little")  # pixel data offset
    out += (40).to_bytes(4, "little")  # BITMAPINFOHEADER
    out += width.to_bytes(4, "little")
    out += height.to_bytes(4, "little", signed=True)  # positive: bottom-up
    out += (1).to_bytes(2, "little")  # planes
    out += (24).to_bytes(2, "little")  # bpp
    out += (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
    out += (stride * height).to_bytes(4, "little")
    out += b"\x00" * 16  # ppm / palette fields
    pad = b"\x00" * (stride - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(len(row))  # BMP stores BGR
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        out += bytes(bgr) + pad
    return bytes(out)


def decode_bmp(data: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP → (width, height, top-down RGB bytes).

    Fails loudly (ValueError naming the defect) on other bit depths or
    compressions — silently wrong pixels are worse than no pixels."""
    if len(data) < _BMP_HEADER_BYTES or data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_off = int.from_bytes(data[10:14], "little")
    width = int.from_bytes(data[18:22], "little", signed=True)
    raw_height = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression}); "
            "only uncompressed 24-bit BI_RGB is implemented"
        )
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    stride = _bmp_stride(width)
    if len(data) < pixel_off + stride * height:
        raise ValueError("BMP truncated: pixel array shorter than header claims")
    rgb = bytearray(width * height * 3)
    for out_y in range(height):
        src_y = out_y if top_down else height - 1 - out_y
        row = data[pixel_off + src_y * stride :][: width * 3]
        dst = rgb[out_y * width * 3 : (out_y + 1) * width * 3]
        dst[0::3] = row[2::3]  # BGR → RGB
        dst[1::3] = row[1::3]
        dst[2::3] = row[0::3]
        rgb[out_y * width * 3 : (out_y + 1) * width * 3] = dst
    return width, height, bytes(rgb)


def decode_ppm(data: bytes) -> tuple[int, int, bytes]:
    """Parse a binary PPM (P6, maxval 255) → (width, height, RGB bytes)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single-ws> raster
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":  # comment to EOL
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (only 8-bit)")
    raster = data[i : i + width * height * 3]
    if len(raster) != width * height * 3:
        raise ValueError("PPM truncated: raster shorter than header claims")
    return width, height, raster


# --------------------------------------------------------------- PNG codec
#
# Real, dependency-free PNG (VERDICT r10 #6 — the format a scraped
# corpus actually contains): stdlib zlib for DEFLATE + CRC-32, plus the
# full scanline-filter algebra (types 0–4: None/Sub/Up/Average/Paeth).
# 8-bit truecolor (color type 2) only — the shape every "decode a web
# image" pipeline hits first; other bit depths fail loudly.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick the neighbor (left,
    above, upper-left) closest to a + b − c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down RGB triplets as an 8-bit truecolor PNG, cycling
    the scanline filter type with the row index (y % 5) so a decoder
    must get ALL FIVE filter reconstructions right to round-trip."""
    import zlib

    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb buffer is {len(rgb)} bytes, expected {width * height * 3}"
        )
    bpp = 3
    raw = bytearray()
    prior = bytes(width * bpp)
    for y in range(height):
        row = rgb[y * width * bpp : (y + 1) * width * bpp]
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += row
        elif ft == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(len(row))
            )
        elif ft == 2:  # Up
            raw += bytes(
                (row[i] - prior[i]) & 0xFF for i in range(len(row))
            )
        elif ft == 3:  # Average
            raw += bytes(
                (row[i] - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2)
                & 0xFF
                for i in range(len(row))
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(len(row))
            )
        prior = row
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, truecolor, no interlace
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse an 8-bit truecolor PNG → (width, height, top-down RGB):
    chunk walk with CRC validation, zlib inflate, then per-row filter
    reconstruction (types 0–4)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width = 8, None
    height = 0
    idat = bytearray()
    while pos < len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        if pos + 12 + ln > len(data):
            # validate BEFORE slicing: a lying length would otherwise
            # surface as a confusing CRC mismatch (or worse, an
            # IndexError downstream) instead of the loud ValueError the
            # decode_bmp/decode_ppm contract promises (ADVICE r11)
            raise ValueError(
                f"truncated PNG chunk at offset {pos} (declared "
                f"{ln} bytes past end of data)"
            )
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            if ln != 13:
                raise ValueError(f"PNG IHDR body is {ln} bytes, expected 13")
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            depth, color = body[8], body[9]
            if (depth, color) != (8, 2):
                raise ValueError(
                    f"only 8-bit truecolor supported (depth {depth}, "
                    f"color type {color})"
                )
            if body[12]:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:  # missing/garbled IDAT — keep the contract
        raise ValueError(f"PNG IDAT stream does not inflate: {exc}") from exc
    bpp, stride = 3, width * 3
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel data is {len(raw)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                row[i] = (
                    row[i]
                    + _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                ) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y * stride : (y + 1) * stride] = row
        prior = bytes(row)
    return width, height, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, bytes]:
    """Dispatch on magic bytes → (width, height, top-down RGB)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    raise ValueError(
        f"unrecognized image payload (magic {data[:2]!r}); "
        "BMP (24-bit BI_RGB), PPM (P6) and PNG (8-bit truecolor) are "
        "implemented"
    )


def decode_image_batch(payloads: pd.Series) -> pd.Series:
    """Vectorized decode over one Arrow batch: bytes in → dict rows
    (width, height, rgb) out.  Pure-Python codec, no PIL/cv2 needed."""
    def _one(b):
        w, h, rgb = decode_image(bytes(b))
        return {"width": w, "height": h, "rgb": rgb}

    return payloads.map(_one)


def resize_image_batch(payloads: pd.Series, width: int, height: int) -> pd.Series:
    """Nearest-neighbor resize to (width, height), re-encoded as BMP —
    decode → sample → encode inside one Arrow batch."""
    def _one(b):
        sw, sh, rgb = decode_image(bytes(b))
        out = bytearray(width * height * 3)
        for y in range(height):
            sy = min(sh - 1, (y * sh) // height)
            for x in range(width):
                sx = min(sw - 1, (x * sw) // width)
                src = (sy * sw + sx) * 3
                dst = (y * width + x) * 3
                out[dst : dst + 3] = rgb[src : src + 3]
        return encode_bmp(width, height, bytes(out))

    return payloads.map(_one)


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


# ------------------------------------------------- real decode round-trip

#: Synthesized image dimensions (small: the correctness fixture decodes
#: every pixel in Python; the shape — encode on one side of an Arrow
#: boundary, decode on the other — is what production inherits).
DECODE_MAX_W = 16
DECODE_MAX_H = 8


def _synth_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic BMP per doc: pixel (x, y) of doc d is
    r=(d+x)%256, g=(d+y)%256, b=(d+x*y)%256 — a formula a SQL oracle can
    integrate analytically, so the decoder's output is checkable without
    a second decoder."""
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
            w = 1 + int(nc) % DECODE_MAX_W
            h = 1 + int(nc) % DECODE_MAX_H
            rgb = bytearray(w * h * 3)
            for y in range(h):
                for x in range(w):
                    i = (y * w + x) * 3
                    rgb[i] = (int(d) + x) % 256
                    rgb[i + 1] = (int(d) + y) % 256
                    rgb[i + 2] = (int(d) + x * y) % 256
            rows["doc_id"].append(int(d))
            rows["payload"].append(encode_bmp(w, h, bytes(rgb)))
        yield pd.DataFrame(rows)


_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def _decode_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The REAL decode: parse each BMP (header, stride padding, bottom-up
    rows) and reduce to exact integer channel sums."""
    for pdf in batches:
        rows = {k.name: [] for k in _DECODE_SCHEMA.fields}
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, rgb = decode_image(bytes(payload))
            rows["doc_id"].append(int(d))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(w * h)
            rows["sum_r"].append(sum(rgb[0::3]))
            rows["sum_g"].append(sum(rgb[1::3]))
            rows["sum_b"].append(sum(rgb[2::3]))
        yield pd.DataFrame(rows)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_decode: encode → Arrow shuffle boundary → decode.

    Two mapInPandas stages with a repartition between them, so the BMP
    bytes genuinely cross an Arrow/serialization boundary before the
    decoder parses them — the production topology (decode rarely runs
    where the bytes were produced).  All Python work is per-batch
    vectorized iteration; everything after the decode is exact integer
    arithmetic, so the oracle hash has no float surface at all.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = d.mapInPandas(_synth_images, _SYNTH_SCHEMA)
    stats = imgs.repartition("doc_id").mapInPandas(_decode_stats, _DECODE_SCHEMA)
    return stats.orderBy("doc_id")


#: Analytic twin: Σ_x Σ_y of the generator formula, integrated with
#: generate_series — verifies header/stride/row-order handling because a
#: decoder bug (e.g. dropped padding) shifts every channel sum.
MULTIMODAL_DECODE_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         1 + n_chars % {DECODE_MAX_W} AS w,
         1 + n_chars % {DECODE_MAX_H} AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         p.i % w      AS x,
         p.i // w     AS y
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, w * h - 1)) AS i
  ) p
)
SELECT doc_id,
       CAST(MIN(w) AS INTEGER)  AS width,
       CAST(MIN(h) AS INTEGER)  AS height,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM((doc_id + x) % 256) AS BIGINT)     AS sum_r,
       CAST(SUM((doc_id + y) % 256) AS BIGINT)     AS sum_g,
       CAST(SUM((doc_id + x * y) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


# ---------------------------------------------------- PNG decode round-trip

#: PNG fixture dims: heights reach 10 rows, so the y%5 filter cycle
#: exercises ALL FIVE scanline filters inside single images (not just
#: across the corpus).
PNG_MAX_W = 12
PNG_MAX_H = 10


def _synth_pngs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic PNG per doc — pixel (x, y) of doc d is
    r=(d+2x)%256, g=(d+3y)%256, b=(d+x+y)%256, a formula the SQL oracle
    integrates analytically — encoded with the filter type cycling per
    row, so the decoder must reconstruct Sub/Up/Average/Paeth (not just
    None) to produce the right sums."""
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
            w = 1 + int(nc) % PNG_MAX_W
            h = 1 + int(nc) % PNG_MAX_H
            rgb = bytearray(w * h * 3)
            for y in range(h):
                for x in range(w):
                    i = (y * w + x) * 3
                    rgb[i] = (int(d) + 2 * x) % 256
                    rgb[i + 1] = (int(d) + 3 * y) % 256
                    rgb[i + 2] = (int(d) + x + y) % 256
            rows["doc_id"].append(int(d))
            rows["payload"].append(encode_png(w, h, bytes(rgb)))
        yield pd.DataFrame(rows)


def multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_png: PNG encode → Arrow shuffle boundary → decode
    (VERDICT r10 #6).  Same two-stage ``mapInPandas`` topology as
    q_multimodal_decode — the compressed payload genuinely crosses a
    serialization boundary before the chunk-walk/inflate/filter-
    reconstruction decoder parses it — reduced to exact integer channel
    sums, so the oracle hash has no float surface."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = d.mapInPandas(_synth_pngs, _SYNTH_SCHEMA)
    stats = imgs.repartition("doc_id").mapInPandas(
        _decode_stats, _DECODE_SCHEMA
    )
    return stats.orderBy("doc_id")


#: Analytic twin of the PNG generator formula — a filter-reconstruction
#: bug (wrong predictor, missed carry, stride slip) shifts every sum.
MULTIMODAL_PNG_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         1 + n_chars % {PNG_MAX_W} AS w,
         1 + n_chars % {PNG_MAX_H} AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         p.i % w      AS x,
         p.i // w     AS y
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, w * h - 1)) AS i
  ) p
)
SELECT doc_id,
       CAST(MIN(w) AS INTEGER)  AS width,
       CAST(MIN(h) AS INTEGER)  AS height,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(SUM((doc_id + 2 * x) % 256) AS BIGINT)   AS sum_r,
       CAST(SUM((doc_id + 3 * y) % 256) AS BIGINT)   AS sum_g,
       CAST(SUM((doc_id + x + y) % 256) AS BIGINT)   AS sum_b
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------------------- audio path

#: Raw PCM container: b"PCM1" + u32le sample_rate + u32le n_samples,
#: then n int16le samples.  A real (if minimal) binary audio format —
#: header parsing + fixed-width sample decode, the WAV 'data'-chunk shape.
AUDIO_MAGIC = b"PCM1"
AUDIO_SR = 8000
AUDIO_MIN_N = 64
AUDIO_MOD_N = 128


def encode_pcm(sample_rate: int, samples: "list[int]") -> bytes:
    import struct

    head = AUDIO_MAGIC + struct.pack("<II", sample_rate, len(samples))
    return head + struct.pack(f"<{len(samples)}h", *samples)


def decode_pcm(data: bytes) -> tuple[int, "list[int]"]:
    import struct

    if data[:4] != AUDIO_MAGIC:
        raise ValueError(f"not a PCM1 payload: {data[:4]!r}")
    sr, n = struct.unpack("<II", data[4:12])
    if len(data) != 12 + 2 * n:
        raise ValueError(f"truncated PCM1 payload: {len(data)} bytes for n={n}")
    return sr, list(struct.unpack(f"<{n}h", data[12:]))


def _synth_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic waveform per doc: sample i of doc d is
    ``((d*31 + i*7) % 2048) - 1024`` — integer-exact, so the SQL oracle
    regenerates it with generate_series and any decoder bug (endianness,
    header offset, sample width) shifts every aggregate."""
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
            n = AUDIO_MIN_N + int(nc) % AUDIO_MOD_N
            samples = [((int(d) * 31 + i * 7) % 2048) - 1024 for i in range(n)]
            rows["doc_id"].append(int(d))
            rows["payload"].append(encode_pcm(AUDIO_SR, samples))
        yield pd.DataFrame(rows)


_AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def _audio_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized decode + DSP reductions: int16 samples → peak, energy
    (Σx², the RMS sufficient statistic — kept integer so the oracle has
    no float surface), strict zero crossings."""
    import numpy as np

    for pdf in batches:
        rows = {f.name: [] for f in _AUDIO_STATS_SCHEMA.fields}
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            sr, samples = decode_pcm(bytes(payload))
            x = np.asarray(samples, dtype=np.int64)
            rows["doc_id"].append(int(d))
            rows["n_samples"].append(len(x))
            rows["duration_ms"].append(len(x) * 1000 // sr)
            rows["peak"].append(int(np.abs(x).max()))
            rows["sum_sq"].append(int((x * x).sum()))
            rows["zero_crossings"].append(int((x[:-1] * x[1:] < 0).sum()))
        yield pd.DataFrame(rows)


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_audio: PCM encode → Arrow/shuffle boundary → decode +
    feature extraction — the audio sibling of q_multimodal_decode (same
    production topology: the decoder never runs where the bytes were
    produced).  Every emitted statistic is exact integer arithmetic."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    pcm = d.mapInPandas(_synth_audio, _SYNTH_SCHEMA)
    stats = pcm.repartition("doc_id").mapInPandas(
        _audio_stats, _AUDIO_STATS_SCHEMA
    )
    return stats.orderBy("doc_id")


MULTIMODAL_AUDIO_SQL = f"""
WITH dims AS (
  SELECT doc_id, {AUDIO_MIN_N} + n_chars % {AUDIO_MOD_N} AS n
  FROM documents
), samp AS (
  SELECT doc_id, n, p.i,
         ((doc_id * 31 + p.i * 7) % 2048) - 1024 AS x
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, n - 1)) AS i
  ) p
), lagged AS (
  SELECT doc_id, n, x,
         lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
  FROM samp
)
SELECT doc_id,
       CAST(MIN(n) AS BIGINT)                           AS n_samples,
       CAST(MIN(n) * 1000 // {AUDIO_SR} AS BIGINT)      AS duration_ms,
       CAST(MAX(ABS(x)) AS BIGINT)                      AS peak,
       CAST(SUM(x * x) AS BIGINT)                       AS sum_sq,
       CAST(SUM(CASE WHEN px * x < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS zero_crossings
FROM lagged
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------------------ resize path

#: Fixed target geometry for the resize pipeline (the thumbnail shape).
RESIZE_W = 8
RESIZE_H = 4


def _resize_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """resize (nearest-neighbor, through the real encode/decode pair) →
    exact channel sums of the RESIZED image."""
    for pdf in batches:
        resized = resize_image_batch(pdf["payload"], RESIZE_W, RESIZE_H)
        rows = {k.name: [] for k in _DECODE_SCHEMA.fields}
        for d, payload in zip(pdf["doc_id"], resized):
            w, h, rgb = decode_image(bytes(payload))
            rows["doc_id"].append(int(d))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(w * h)
            rows["sum_r"].append(sum(rgb[0::3]))
            rows["sum_g"].append(sum(rgb[1::3]))
            rows["sum_b"].append(sum(rgb[2::3]))
        yield pd.DataFrame(rows)


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_resize: synth → Arrow/shuffle boundary → nearest-
    neighbor resize to ({RESIZE_W}×{RESIZE_H}) through the real
    decode→sample→re-encode→decode chain, reduced to exact channel
    sums.  The oracle evaluates the SAME sampling arithmetic
    (sx = min(sw−1, ⌊x·sw/W⌋)) analytically over the generator formula,
    so an off-by-one in the sampler or a stride bug in either codec pass
    shifts the sums."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = d.mapInPandas(_synth_images, _SYNTH_SCHEMA)
    stats = imgs.repartition("doc_id").mapInPandas(
        _resize_stats, _DECODE_SCHEMA
    )
    return stats.orderBy("doc_id")


MULTIMODAL_RESIZE_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         1 + n_chars % {DECODE_MAX_W} AS sw,
         1 + n_chars % {DECODE_MAX_H} AS sh
  FROM documents
), px AS (
  SELECT doc_id, sw, sh,
         LEAST(sw - 1, ((p.i % {RESIZE_W}) * sw) // {RESIZE_W})  AS sx,
         LEAST(sh - 1, ((p.i // {RESIZE_W}) * sh) // {RESIZE_H}) AS sy
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, {RESIZE_W} * {RESIZE_H} - 1)) AS i
  ) p
)
SELECT doc_id,
       CAST({RESIZE_W} AS INTEGER) AS width,
       CAST({RESIZE_H} AS INTEGER) AS height,
       CAST(COUNT(*) AS BIGINT)    AS n_pixels,
       CAST(SUM((doc_id + sx) % 256) AS BIGINT)      AS sum_r,
       CAST(SUM((doc_id + sy) % 256) AS BIGINT)      AS sum_g,
       CAST(SUM((doc_id + sx * sy) % 256) AS BIGINT) AS sum_b
FROM px
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------------------------- video path

#: Frame container: b"VID1" + u32le n_frames, then per frame a u32le
#: byte length + a complete BMP blob — the length-prefixed-GOP shape a
#: keyframe store uses.
VIDEO_MAGIC = b"VID1"
VIDEO_FRAMES = 4
VIDEO_MAX_W = 12
VIDEO_MAX_H = 5


def encode_video(frames: "list[bytes]") -> bytes:
    import struct

    out = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_video(data: bytes) -> "list[tuple[int, int, bytes]]":
    import struct

    if data[:4] != VIDEO_MAGIC:
        raise ValueError(f"not a VID1 payload: {data[:4]!r}")
    (n,) = struct.unpack("<I", data[4:8])
    frames, off = [], 8
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated VID1 frame table")
        (ln,) = struct.unpack("<I", data[off : off + 4])
        off += 4
        if off + ln > len(data):
            raise ValueError("truncated VID1 frame payload")
        frames.append(decode_image(data[off : off + ln]))
        off += ln
    if off != len(data):
        raise ValueError(f"trailing bytes after VID1 frames: {len(data) - off}")
    return frames


def _synth_videos(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic clip per doc: frame f's pixel (x, y) has
    r=(d+x+f)%256, g=(d+y+f)%256, b=(d+x*y+f)%256 — the +f drift gives
    every frame pair a non-trivial, analytically-integrable motion
    field."""
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
            w = 1 + int(nc) % VIDEO_MAX_W
            h = 1 + int(nc) % VIDEO_MAX_H
            frames = []
            for f in range(VIDEO_FRAMES):
                rgb = bytearray(w * h * 3)
                for y in range(h):
                    for x in range(w):
                        i = (y * w + x) * 3
                        rgb[i] = (int(d) + x + f) % 256
                        rgb[i + 1] = (int(d) + y + f) % 256
                        rgb[i + 2] = (int(d) + x * y + f) % 256
                frames.append(encode_bmp(w, h, bytes(rgb)))
            rows["doc_id"].append(int(d))
            rows["payload"].append(encode_video(frames))
        yield pd.DataFrame(rows)


_VIDEO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r_all", T.LongType()),
        T.StructField("motion", T.LongType()),
    ]
)


def _video_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode every frame through the real BMP codec, then reduce to the
    cross-frame statistics: total red mass and the motion field
    Σ_f Σ_px |r_f − r_{f−1}| (the shot-boundary / static-clip signal)."""
    for pdf in batches:
        rows = {f.name: [] for f in _VIDEO_STATS_SCHEMA.fields}
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            frames = decode_video(bytes(payload))
            w, h, _ = frames[0]
            reds = [f[2][0::3] for f in frames]
            motion = 0
            for a, b in zip(reds[:-1], reds[1:]):
                motion += sum(abs(p - q) for p, q in zip(a, b))
            rows["doc_id"].append(int(d))
            rows["n_frames"].append(len(frames))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sum_r_all"].append(sum(sum(r) for r in reds))
            rows["motion"].append(motion)
        yield pd.DataFrame(rows)


def multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_video: length-prefixed frame container → per-frame
    BMP decode → cross-frame motion statistics, across the same
    encode → Arrow/shuffle → decode topology as the image and audio
    legs.  All-integer outputs; the oracle integrates the generator
    formula (motion per pixel is |Δr| = 1 except at the %256 wrap,
    where it is 255 — a decoder that misorders frames or rows shifts
    the wrap count)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    vids = d.mapInPandas(_synth_videos, _SYNTH_SCHEMA)
    stats = vids.repartition("doc_id").mapInPandas(
        _video_stats, _VIDEO_STATS_SCHEMA
    )
    return stats.orderBy("doc_id")


MULTIMODAL_VIDEO_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         1 + n_chars % {VIDEO_MAX_W} AS w,
         1 + n_chars % {VIDEO_MAX_H} AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h, p.i % w AS x
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, w * h - 1)) AS i
  ) p
), fr AS (
  SELECT doc_id, w, h, x, f.f
  FROM px, LATERAL (
    SELECT unnest(generate_series(0, {VIDEO_FRAMES} - 1)) AS f
  ) f
)
SELECT doc_id,
       CAST({VIDEO_FRAMES} AS INTEGER) AS n_frames,
       CAST(MIN(w) AS INTEGER) AS width,
       CAST(MIN(h) AS INTEGER) AS height,
       CAST(SUM((doc_id + x + f) % 256) AS BIGINT) AS sum_r_all,
       CAST(SUM(CASE WHEN f = 0 THEN 0
                     WHEN (doc_id + x + f) % 256 = 0 THEN 255
                     ELSE 1 END) AS BIGINT) AS motion
FROM fr
GROUP BY doc_id
ORDER BY doc_id
"""


# --------------------------------------------- JPEG baseline (SOF0, 4:2:0)

#: MCU-grid fixture dims: width = 16·(1 + n_chars % JPEG_MCUS_W),
#: height = 16·(1 + n_chars % JPEG_MCUS_H) — whole-MCU images, so the
#: analytic twin needs no partial-edge terms.
JPEG_MCUS_W = 3
JPEG_MCUS_H = 2

#: Flat quantization value.  Each MCU is one constant YCbCr color, so
#: every block is DC-only: DC = 8·(c−128) and q=8 makes the quantize →
#: dequantize → IDCT chain EXACT (round(8·(c−128)/8)·8 / 8 = c−128) —
#: a lossy format pinned to a lossless fixture, which is what lets the
#: DuckDB oracle hash the decoder's output analytically.
_JPEG_Q = 8

#: Zigzag index → raster index (ITU T.81 Figure A.6, public spec).
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Huffman tables: DC tables are ITU T.81 Annex K.3 (the public spec's
#: typical tables); AC tables are minimal customs — the fixture emits
#: only EOB (run/size 0x00), one 1-bit code.  The decoder builds its
#: trees generally from whatever (bits, vals) the DHT segments carry.
_JPEG_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_EOB = ([1] + [0] * 15, [0x00])


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (a 0xFF data
    byte is followed by 0x00 so it can never read as a marker)."""

    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> None:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per T.81 F.1.2.3


def _huff_codes(bits, vals):
    """Canonical Huffman (code, length) per value from a DHT-style
    (bits, vals) pair."""
    codes, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


def _dc_category(diff: int) -> int:
    return 0 if diff == 0 else abs(diff).bit_length()


def encode_jpeg(
    width: int, height: int, mcu_colors, restart_interval: int = 0,
    quant: int = _JPEG_Q,
) -> bytes:
    """Minimal-but-conformant baseline JFIF stream: SOI, DQT ×2, SOF0
    (3 components, 4:2:0), DHT ×4, [DRI,] SOS, entropy-coded constant-
    color MCUs [with RSTn markers], EOI.  ``mcu_colors[my][mx] =
    (Y, Cb, Cr)``, dims whole MCUs.

    ``quant`` is the flat DQT value.  At the default ``_JPEG_Q`` (8)
    the DC quantization is the IDENTITY on constant blocks (the raw
    DC of a constant-c block is 8·(c−128), so quantized DC = c−128
    exactly — the property every hash-exact JPEG fixture rests on) and
    the emitted stream is byte-identical to the pre-``quant`` encoder.
    Larger values perform REAL lossy quantization (round-half-away of
    8·(c−128)/quant, reconstruction error ≤ quant/16 per pixel) — the
    knob the dHash lossy-chain measurement (VERDICT r15 task 4)
    turns."""
    import struct

    if not 1 <= quant <= 255:
        raise ValueError(f"quant {quant} outside the 8-bit DQT range")
    mcus_x, mcus_y = width // 16, height // 16
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    for tq in (0, 1):  # DQT: flat tables, luma + chroma
        seg(0xDB, bytes([tq]) + bytes([quant] * 64))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    seg(  # SOF0: Y 2×2 q0, Cb 1×1 q1, Cr 1×1 q1
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc_th, (bits, vals) in (
        (0x00, _JPEG_DC_LUMA),
        (0x01, _JPEG_DC_CHROMA),
        (0x10, _JPEG_AC_EOB),
        (0x11, _JPEG_AC_EOB),
    ):
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))  # SOS

    dc_l = _huff_codes(*_JPEG_DC_LUMA)
    dc_c = _huff_codes(*_JPEG_DC_CHROMA)
    ac = _huff_codes(*_JPEG_AC_EOB)
    bw = _BitWriter()
    pred = [0, 0, 0]  # per-component DC prediction

    def block(comp: int, c: int, table) -> None:
        # raw DC of a constant-c 8×8 block is 8·(c−128); quantized
        # round-half-away (matches _quantize_codes' convention).  At
        # quant=8 this is exactly c−128 — the historic identity path.
        raw = 8 * (c - 128)
        dc = (
            (2 * raw + quant) // (2 * quant)
            if raw >= 0
            else -((2 * -raw + quant) // (2 * quant))
        )
        diff = dc - pred[comp]
        pred[comp] = dc
        s = _dc_category(diff)
        code, length = table[s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        code, length = ac[0x00]  # EOB: all 63 AC coefficients zero
        bw.write(code, length)

    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                bw.flush()  # byte-align (1-padded), then a bare marker
                bw.out.extend(
                    bytes(
                        [0xFF, 0xD0 + ((mcu_n // restart_interval - 1) % 8)]
                    )
                )
                pred[0] = pred[1] = pred[2] = 0
            yy, cb, cr = mcu_colors[my][mx]
            for _ in range(4):  # 2×2 luma blocks, same constant
                block(0, yy, dc_l)
            block(1, cb, dc_c)
            block(2, cr, dc_c)
            mcu_n += 1
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    raises ValueError at markers/EOF mid-symbol (truncated stream)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG: entropy data truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed FF
                else:
                    raise ValueError(
                        f"JPEG: unexpected marker 0xFF{nxt:02X} inside "
                        "entropy data"
                    )
            self._acc, self._n = b, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(br: "_BitReader", tree: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        v = tree.get((code, length))
        if v is not None:
            return v
    raise ValueError("JPEG: invalid Huffman code (corrupt entropy data)")


def _idct_block(coeffs) -> list:
    """Float separable 8×8 inverse DCT (T.81 A.3.3), rounded + level-
    shifted + clamped — general, though the fixture's DC-only blocks
    make it exact (constant (c−128) + 128 = c)."""
    import math

    out = [0] * 64
    cu = [math.sqrt(0.5) if u == 0 else 1.0 for u in range(8)]
    cos = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
        for x in range(8)
    ]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    f = coeffs[v * 8 + u]
                    if f:
                        s += cu[u] * cu[v] * f * cos[x][u] * cos[y][v]
            val = int(round(s / 4.0)) + 128
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def decode_jpeg(data: bytes):
    """Baseline JPEG decoder: marker walk (APPn/COM skipped, DRI +
    restart markers honored), DQT/DHT/SOF0/SOS parse, Huffman entropy
    decode with per-component DC prediction, zigzag dequantization,
    IDCT, plane assembly.  Supports the two baseline layouts that cover
    scraped corpora — 4:2:0 (Y 2×2 + two 1×1 chroma) and 4:4:4 / single
    -component grayscale; anything else (progressive SOF2, arithmetic
    coding, other samplings) raises ValueError, the same loud contract
    as the PNG leg.

    Returns ``(width, height, planes)`` where ``planes`` is one list of
    sample values per component at its NATURAL resolution (chroma at
    quarter size under 4:2:0 — libjpeg's "raw" output; no upsampling,
    no color convert, so every downstream stat is integer-exact)."""
    import struct

    if data[:2] != b"\xff\xd8":
        raise ValueError(f"not a JPEG payload: {data[:2]!r}")
    pos = 2
    qt: dict[int, list] = {}
    huff: dict[tuple, dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("JPEG: truncated before SOS")
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede the
        # marker id — skip them so a conformant external file's fills
        # don't get read as a marker id (and then a bogus 2-byte
        # length).  A run of fills to EOF is a truncation.
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise ValueError("JPEG: truncated in marker fill bytes")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("JPEG: EOI before any scan")
        if marker == 0x01:  # TEM — standalone, no length segment
            continue
        if 0xD0 <= marker <= 0xD7:  # RSTn outside entropy data
            raise ValueError(
                f"JPEG: restart marker RST{marker - 0xD0} before SOS"
            )
        if pos + 2 > len(data):
            raise ValueError("JPEG: truncated before SOS")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if pos + seglen > len(data):
            raise ValueError("JPEG: segment length past end of data")
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: 16-bit DQT not baseline")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc_th = body[i]
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                codes = _huff_codes(bits, vals)
                huff[(tc_th >> 4, tc_th & 0x0F)] = {
                    cl: v for v, cl in codes.items()
                }
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("JPEG: only 8-bit precision")
            if not w or not h:
                raise ValueError("JPEG: zero image dimension")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: SOF{marker - 0xC0} not baseline sequential "
                "(only SOF0 supported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG: SOS before SOF0")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            break
        # APPn / COM / anything else with a length: skipped

    w, h, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    sampling = sorted((c[1], c[2]) for c in comps)
    if len(comps) == 3 and not (
        sampling == [(1, 1), (1, 1), (1, 1)]
        or sampling == [(1, 1), (1, 1), (2, 2)]
    ):
        raise ValueError("JPEG: only 4:2:0 / 4:4:4 sampling supported")
    if len(comps) not in (1, 3):
        raise ValueError("JPEG: only 1- or 3-component images")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes, pw, ph = [], [], []
    for _, ch, cv, _tq in comps:
        cw, chh = mcus_x * ch * 8, mcus_y * cv * 8
        planes.append([0] * (cw * chh))
        pw.append(cw)
        ph.append(chh)

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                # byte-align and consume the RSTn marker; DC resets
                br._n = 0
                if (
                    br.pos + 2 > len(data)
                    or data[br.pos] != 0xFF
                    or not 0xD0 <= data[br.pos + 1] <= 0xD7
                ):
                    raise ValueError("JPEG: missing restart marker")
                br.pos += 2
                pred = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                _, td, ta = next(s for s in scan if s[0] == cid)
                dct = huff.get((0, td))
                act = huff.get((1, ta))
                if dct is None or act is None or tq not in qt:
                    raise ValueError(
                        "JPEG: scan references undefined DQT/DHT table"
                    )
                for by in range(cv):
                    for bx in range(ch):
                        s = _huff_decode(br, dct)
                        diff = 0
                        if s:
                            diff = br.bits(s)
                            if diff < (1 << (s - 1)):
                                diff -= (1 << s) - 1
                        pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = pred[ci] * qt[tq][0]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, act)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = rs >> 4, rs & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "JPEG: AC run past block end"
                                )
                            coef = br.bits(size)
                            if coef < (1 << (size - 1)):
                                coef -= (1 << size) - 1
                            zz[k] = coef * qt[tq][k]
                            k += 1
                        raster = [0] * 64
                        for zi, co in enumerate(zz):
                            raster[_JPEG_ZIGZAG[zi]] = co
                        px = _idct_block(raster)
                        ox = (mx * ch + bx) * 8
                        oy = (my * cv + by) * 8
                        plane, cw = planes[ci], pw[ci]
                        for yy in range(8):
                            row = (oy + yy) * cw + ox
                            plane[row : row + 8] = px[yy * 8 : yy * 8 + 8]
            mcu_count += 1

    # crop each plane to its natural (unpadded) size
    out_planes = []
    for ci, (_, ch, cv, _tq) in enumerate(comps):
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        full_w = pw[ci]
        p = planes[ci]
        out_planes.append(
            [p[y * full_w + x] for y in range(chh) for x in range(cw)]
        )
    return w, h, out_planes


_JPEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("sum_y", T.LongType()),
        T.StructField("sum_cb", T.LongType()),
        T.StructField("sum_cr", T.LongType()),
    ]
)


def _synth_jpegs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic baseline JPEG per doc: MCU (mx, my) of doc d is the
    constant YCbCr color Y=(d+5mx+7my)%256, Cb=(3d+11mx+my)%256,
    Cr=(7d+mx+13my)%256 — constant MCUs make the lossy pipeline exact
    (see _JPEG_Q), so the SQL oracle integrates the formula."""
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d, nc in zip(pdf["doc_id"], pdf["n_chars"]):
            d, nc = int(d), int(nc)
            mw = 1 + nc % JPEG_MCUS_W
            mh = 1 + nc % JPEG_MCUS_H
            colors = [
                [
                    (
                        (d + 5 * mx + 7 * my) % 256,
                        (3 * d + 11 * mx + my) % 256,
                        (7 * d + mx + 13 * my) % 256,
                    )
                    for mx in range(mw)
                ]
                for my in range(mh)
            ]
            rows["doc_id"].append(d)
            rows["payload"].append(encode_jpeg(16 * mw, 16 * mh, colors))
        yield pd.DataFrame(rows)


def _jpeg_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {k.name: [] for k in _JPEG_SCHEMA.fields}
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, (py, pcb, pcr) = decode_jpeg(bytes(payload))
            rows["doc_id"].append(int(d))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(w * h)
            rows["sum_y"].append(sum(py))
            rows["sum_cb"].append(sum(pcb))
            rows["sum_cr"].append(sum(pcr))
        yield pd.DataFrame(rows)


def multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_multimodal_jpeg: baseline-JPEG encode → Arrow shuffle boundary
    → full decode (marker walk, Huffman, DC prediction, dequant, IDCT,
    4:2:0 plane assembly) reduced to exact integer plane sums — the
    codec family's compressed-photographic leg beside PNG (DEFLATE) and
    BMP/PPM (raw).  Same two-stage mapInPandas topology as the other
    decode keys; the constant-MCU fixture makes the lossy format
    hash-checkable (docstring of _synth_jpegs)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = d.mapInPandas(_synth_jpegs, _SYNTH_SCHEMA)
    stats = imgs.repartition("doc_id").mapInPandas(_jpeg_stats, _JPEG_SCHEMA)
    return stats.orderBy("doc_id")


#: Analytic twin: Y contributes 256 full-res samples per MCU, each
#: chroma 64 quarter-res samples (4:2:0, no upsampling) — any decoder
#: bug (wrong DC prediction, dequant slip, plane offset) shifts a sum.
MULTIMODAL_JPEG_SQL = f"""
WITH dims AS (
  SELECT doc_id,
         1 + n_chars % {JPEG_MCUS_W} AS mw,
         1 + n_chars % {JPEG_MCUS_H} AS mh
  FROM documents
), mcu AS (
  SELECT doc_id, mw, mh,
         p.i % mw  AS mx,
         p.i // mw AS my
  FROM dims, LATERAL (
    SELECT unnest(generate_series(0, mw * mh - 1)) AS i
  ) p
)
SELECT doc_id,
       CAST(MIN(mw) * 16 AS INTEGER)        AS width,
       CAST(MIN(mh) * 16 AS INTEGER)        AS height,
       CAST(MIN(mw) * MIN(mh) * 256 AS BIGINT) AS n_pixels,
       CAST(SUM(256 * ((doc_id + 5 * mx + 7 * my) % 256)) AS BIGINT)  AS sum_y,
       CAST(SUM(64 * ((3 * doc_id + 11 * mx + my) % 256)) AS BIGINT)  AS sum_cb,
       CAST(SUM(64 * ((7 * doc_id + mx + 13 * my) % 256)) AS BIGINT)  AS sum_cr
FROM mcu
GROUP BY doc_id
ORDER BY doc_id
"""


# ------------------------------------------- perceptual image dedup (dHash)
#
# The pipeline op a multimodal training corpus needs (VERDICT r13 #5):
# dedup on IMAGE CONTENT, not payload bytes — re-encoded/perturbed copies
# of a picture share a perceptual fingerprint even when their files don't
# share a single byte.  Composition of two existing assets: the codec
# family above decodes, then Hamming banding EXACTLY like q_dedup_simhash
# (dedup.py) buckets candidates — banded 16-bit exact-match join, never
# all-pairs, verify by full Hamming distance on the bucketed pairs only.

#: perturbed-duplicate fixture geometry: docs with the same
#: ``doc_id % PHASH_GROUPS`` carry noisy copies of one base image
PHASH_GROUPS = 25
#: pixels per dHash grid cell (image = 9×8 cells of BLOCK×BLOCK)
PHASH_BLOCK = 4
#: luminance step between adjacent dHash cells — must exceed twice the
#: per-pixel fixture noise bound (±5) so no comparison can flip
PHASH_STEP = 12
#: candidate pairs at Hamming distance above this are not duplicates.
#: MEASURED, not chosen (VERDICT r15 task 4, tools/phash_lossy.py):
#: through the repo's own lossy chains, true re-encoded duplicates
#: reach Hamming 10 (two group members BOTH JPEG-re-encoded at a flat
#: q=48 table; one-sided re-encode drift maxes at 7 through q=72, and
#: nearest-neighbor resize down to 18×16 drifts ≤ 1 even at ±8 pixel
#: noise), while the closest cross-pattern pair across every measured
#: chain is 14 — so 10 captures every supported lossy chain with zero
#: false positives and a 4-bit margin.  The old 6 left the q48
#: both-sides case at 0.977 recall for no FP benefit.  Beyond q≈112
#: (reconstruction error ≥ 7 luma levels vs the fixture's 12-step
#: cells) the hash itself degrades — no threshold fixes that regime.
PHASH_HAMMING_MAX = 10

#: band-probe radius for the candidate join (multi-index hashing,
#: Norouzi et al.'s public MIH recipe): side A's 16-bit band values are
#: expanded by every XOR mask of popcount ≤ r before the equi-join, so
#: ANY pair with some band within Hamming r becomes a candidate.
#: Pigeonhole: a pair at total Hamming ≤ 4·(r+1)−1 = 11 MUST have a
#: band at ≤ r=2 (4 bands all ≥ 3 ⇒ total ≥ 12) — so the candidate
#: stage is COMPLETE for the verify threshold above (r=0's guarantee
#: stopped at 3: measured operator recall was 0.93 at both-sides q48
#: and 0.76 at q72, tools/phash_lossy.py, review r15).  Cost knob,
#: measured: expansion is LINEAR (137 variants × 4 bands ≈ 548 rows
#: per doc on one join side — ~13 KB/doc, dwarfed by the decode the
#: operator exists to amortize) while the alternative 8×8-bit banding
#: with r=1 would be 7.6× cheaper to expand but makes ~25 % of CROSS
#: pairs candidates (9/256 per band over 8 bands) vs ~0.8 % here
#: (137/65536 over 4) — and the verify join is the quadratic-ish
#: stage, so 4×16 with r=2 is the right side of the trade.
PHASH_BAND_PROBE_R = 2


def _hamming_ball_masks(bits: int, radius: int) -> list:
    """All XOR masks of ``bits``-bit values with popcount ≤ radius
    (the Hamming ball around 0): 1 + C(16,1) + C(16,2) = 137 at the
    default geometry."""
    import itertools

    out = [0]
    for r in range(1, radius + 1):
        for pos in itertools.combinations(range(bits), r):
            m = 0
            for p in pos:
                m |= 1 << p
            out.append(m)
    return out


def _splitmix64(x: int) -> int:
    """SplitMix64 finalizer — a public-domain 64-bit mixer; gives each
    fixture group a well-separated bit pattern (min cross-group Hamming
    21 at PHASH_GROUPS=25, pytest-pinned ≥ 16 ≫ PHASH_HAMMING_MAX)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _phash_base_grid(group: int) -> list:
    """9×8 grid of cell luminances whose ADJACENT-CELL comparisons
    realize exactly the 64 bits of ``_splitmix64(group)``: walking each
    row left→right, a set bit steps the value DOWN by PHASH_STEP (so
    mean[c] > mean[c+1] ⇒ dHash bit set), a clear bit steps UP.  Start
    128, 8 steps of ±12 ⇒ values stay in [32, 224] — headroom for the
    ±5 pixel noise on both sides."""
    pattern = _splitmix64(group)
    grid = []
    for r in range(8):
        row = [128]
        for c in range(8):
            bit = (pattern >> (r * 8 + c)) & 1
            row.append(row[-1] - PHASH_STEP if bit else row[-1] + PHASH_STEP)
        grid.append(row)
    return grid


def _splitmix64_np(x):
    """Vectorized SplitMix64 over a uint64 ndarray (wraparound mul)."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _synth_phash_bmps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Perturbed-duplicate BMP per doc: the base 9×8 cell grid of the
    doc's group, rendered at PHASH_BLOCK×PHASH_BLOCK px per cell, plus
    DOC-SPECIFIC pixel noise in [-5, 5] — every group member is a
    DIFFERENT file (byte-exact dedup finds nothing) with the SAME
    dHash (no noise can flip a ±12-step comparison).  Noise is
    SplitMix64 of the global pixel index (doc·H·W + y·W + x), not a
    small linear congruence — an earlier ``(31d + …) % 11`` had period
    11 in doc_id, so same-group docs lcm(25, 11)=275 apart produced
    byte-IDENTICAL files, silently voiding the different-files claim
    at corpora ≥ 276 docs."""
    import numpy as np

    w, h = 9 * PHASH_BLOCK, 8 * PHASH_BLOCK
    for pdf in batches:
        rows = {"doc_id": [], "payload": []}
        for d in pdf["doc_id"]:
            d = int(d)
            grid = np.array(_phash_base_grid(d % PHASH_GROUPS))
            lum = np.repeat(
                np.repeat(grid, PHASH_BLOCK, axis=0), PHASH_BLOCK, axis=1
            )
            idx = np.arange(h * w, dtype=np.uint64) + np.uint64(d * h * w)
            noise = (
                (_splitmix64_np(idx) % np.uint64(11)).astype(np.int64) - 5
            ).reshape(h, w)
            lum = np.clip(lum + noise, 0, 255).astype(np.uint8)
            rgb = np.repeat(lum[:, :, None], 3, axis=2).tobytes()
            rows["doc_id"].append(d)
            rows["payload"].append(encode_bmp(w, h, rgb))
        yield pd.DataFrame(rows)


def dhash64(width: int, height: int, rgb: bytes) -> int:
    """64-bit difference hash of a decoded RGB image: average the first
    channel over a 9×8 cell grid (any dimensions — reduceat bins), set
    bit r*8+c iff cell (r,c) is brighter than cell (r,c+1).  Returned
    as a SIGNED 64-bit value so it rides a Spark LongType column."""
    import numpy as np

    if width < 9 or height < 8:
        raise ValueError(f"image {width}×{height} too small for dHash")
    xs = (
        np.frombuffer(rgb, np.uint8)
        .reshape(height, width, 3)[:, :, 0]
        .astype(np.float64)
    )
    r_edges = (np.arange(8) * height) // 8
    c_edges = (np.arange(9) * width) // 9
    sums = np.add.reduceat(np.add.reduceat(xs, r_edges, axis=0), c_edges, axis=1)
    r_n = np.diff(np.append(r_edges, height))
    c_n = np.diff(np.append(c_edges, width))
    means = sums / (r_n[:, None] * c_n[None, :])
    bits = means[:, :-1] > means[:, 1:]
    h64 = int(bits.flatten() @ (1 << np.arange(64, dtype=object)))
    return h64 - (1 << 64) if h64 >= (1 << 63) else h64


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _phash_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {"doc_id": [], "phash": []}
        for d, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, rgb = decode_image(bytes(payload))
            rows["doc_id"].append(int(d))
            rows["phash"].append(dhash64(w, h, rgb))
        yield pd.DataFrame(rows)


def multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_dedup_phash: perceptual image dedup — decode → dHash → banded
    candidate join → Hamming verify → duplicate pairs.

    Scale shape (the same discipline as q_dedup_simhash): the ONLY join
    is an exact-match equi-join on (band, 16-bit value) — 4 banded
    copies of (doc_id, phash) shuffle on the band key, buckets bound
    the pair blowup, and the Hamming verify (codegen ``bit_count(a ^
    b)``) runs on bucketed candidates only.  No all-pairs path at any
    corpus size.  Side A's band values are additionally expanded by the
    radius-``PHASH_BAND_PROBE_R`` Hamming ball (137 XOR masks — see the
    constant's cost math), so every pair at Hamming ≤ 4·(r+1)−1 = 11 ≥
    PHASH_HAMMING_MAX is GUARANTEED a candidate: the banded stage is
    complete for the verify threshold, and operator recall ≡ the
    measured hash-level recall of tools/phash_lossy.py (review r15 —
    plain exact-band matching guaranteed only Hamming ≤ 3 and measured
    0.93/0.76 operator recall at q48/q72).

    The fixture makes the output analytic: group members share a base
    image (different bytes, identical dHash ⇒ Hamming 0 — found in
    every band), groups are ≥ 21 bits apart (≫ PHASH_HAMMING_MAX ⇒ no
    false positive possible), so duplicates = within-group pairs, an
    oracle DuckDB derives from doc_id arithmetic alone."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = d.mapInPandas(_synth_phash_bmps, _SYNTH_SCHEMA)
    fp = imgs.repartition("doc_id").mapInPandas(_phash_stage, _PHASH_SCHEMA)
    # fp feeds BOTH sides of the banded self-join, and Spark's exchange
    # reuse only shares the shuffle BELOW the decode stage (the
    # repartition) — without a persist the image decode + dHash, the
    # dominant cost of this operator on a real corpus, executes once
    # per join side (VERDICT r14 #1).  Same discipline and storage
    # level as dedup.py's shingle pass: MEMORY_AND_DISK spills rather
    # than evicts (an eviction would silently re-decode the corpus),
    # and repeated calls re-use the one cache-manager entry (keyed on
    # the canonicalized plan).  The single-decode property is pinned by
    # a plan assertion (InMemoryTableScan on both join sides) in
    # tests/test_llm.py.
    from pyspark import StorageLevel

    fp = fp.persist(StorageLevel.MEMORY_AND_DISK)
    return _phash_banded_pairs(fp)


def _phash_banded_pairs(fp: DataFrame) -> DataFrame:
    """Banded multi-probe candidate join + Hamming verify over a
    ``(doc_id, phash)`` fingerprint table — factored out of
    :func:`multimodal_phash` so the completeness guarantee (every pair
    at Hamming ≤ PHASH_HAMMING_MAX is a candidate, review r15) is
    testable on hand-built adversarial fingerprints, not just the
    analytic fixture's Hamming-0 duplicates.

    Optimization r15 (guide §8: decide with small rows, attach payload
    ids last): the 137-mask multi-probe expansion runs over DISTINCT
    hash values, not over documents.  Hamming distance is a function of
    the HASH pair alone, so (a) documents sharing a fingerprint are
    Hamming-0 duplicates by construction — one equi-join on the 64-bit
    hash, no banding, no masks; (b) the banded multi-probe only has to
    decide which DISTINCT hash pairs sit within the threshold, and doc
    ids re-attach with two joins on the hash.  The expansion side
    shrinks from |docs|·4·137 rows to |distinct-hash|·4·137 — on a
    dup-heavy image corpus (the workload this operator exists for) that
    is the dup-factor, measured 110× fewer exploded rows at the sf0.1
    fixture (5 000 docs, 25 distinct hashes; 2.7 M → 13.7 k) and never
    MORE rows on a dup-free corpus.  Results are identical by
    construction: equal-hash pairs are exactly the Hamming-0 pairs the
    mask-0 probe found in every band, and cross-hash pairs carry the
    same bit_count verify."""
    # (a) identical fingerprints: every within-hash doc pair at Hamming
    # 0.  The self-join on the hash reuses one exchange (both sides are
    # the same cached table keyed the same way).
    same = (
        fp.select(F.col("doc_id").alias("doc_a"), "phash")
        .join(fp.select(F.col("doc_id").alias("doc_b"), "phash"), "phash")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.lit(0).cast("integer").alias("hamming"),
        )
    )
    # (b) cross-hash candidates over the distinct fingerprints only.
    hashes = fp.select("phash").distinct()
    bands = hashes.select(
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftrightunsigned("phash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("phash", "band.band_id", "band.band_val")
    # multi-probe expansion, side A only: one exact variant of A's
    # band value per ball mask, so a hash pair within band-Hamming r
    # matches exactly once in that band (the cross-band duplicates the
    # .distinct() below already folds).  One generator per select —
    # the mask array is a 137-int literal, built once into the plan.
    masks = F.lit(_hamming_ball_masks(16, PHASH_BAND_PROBE_R))
    a = (
        bands.select(
            F.col("phash").alias("ph_a"),
            "band_id",
            "band_val",
            F.explode(masks).alias("_mask"),
        )
        .withColumn(
            "band_val", F.col("band_val").bitwiseXOR(F.col("_mask"))
        )
        .drop("_mask")
    )
    b = bands.select(
        F.col("phash").alias("ph_b"), "band_id", "band_val"
    )
    hash_pairs = (
        a.join(b, ["band_id", "band_val"])
        # strict < also drops equal hashes — path (a) owns those
        .where(F.col("ph_a") < F.col("ph_b"))
        .select(
            "ph_a",
            "ph_b",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).alias(
                "hamming"
            ),
        )
        # verify BEFORE the dedup shuffle: hamming is a function of the
        # pair, so filtering first is result-identical and the distinct
        # (the candidate stage's one exchange) sees only surviving
        # pairs — on a real corpus the probe-radius candidates are
        # mostly rejects, so this keeps the multi-probe's extra
        # candidates out of the shuffle entirely
        .where(F.col("hamming") <= PHASH_HAMMING_MAX)
        .distinct()
    )
    # re-attach doc ids: each doc holds ONE hash, so a cross-hash doc
    # pair materializes exactly once; least/greatest restores the
    # doc_a < doc_b orientation the hash-level ordering cannot know.
    cross = (
        hash_pairs.join(
            fp.select(F.col("doc_id").alias("da"), F.col("phash").alias("ph_a")),
            "ph_a",
        )
        .join(
            fp.select(F.col("doc_id").alias("db"), F.col("phash").alias("ph_b")),
            "ph_b",
        )
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "hamming",
        )
    )
    # No final orderBy (optimization r15, guide §2.4): the global sort
    # of the full pair output was presentation-only — the driver's
    # value-hash is order-insensitive and every consumer (tests, the
    # gate paths) compares sets — and it cost a full range-partitioned
    # exchange+sort of the output (measured 0.47 s of the 0.77 s
    # post-decode wall at sf0.1; at corpus scale the pair output is the
    # largest relation this operator materializes).
    return same.unionByName(cross)


#: Analytic-fixture oracle: duplicates are exactly the within-group
#: pairs at Hamming 0 (identical base grid; noise cannot flip a
#: comparison; cross-group patterns are ≥ 21 bits apart).
MULTIMODAL_PHASH_SQL = f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 0 AS hamming
FROM documents a JOIN documents b
  ON a.doc_id % {PHASH_GROUPS} = b.doc_id % {PHASH_GROUPS}
 AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


QUERIES = {
    "q_multimodal_meta": multimodal_features,
    "q_multimodal_frames": multimodal_frames,
    "q_multimodal_decode": multimodal_decode,
    "q_multimodal_png": multimodal_png,
    "q_multimodal_audio": multimodal_audio,
    "q_multimodal_video": multimodal_video,
    "q_multimodal_resize": multimodal_resize,
    "q_multimodal_jpeg": multimodal_jpeg,
    "q_dedup_phash": multimodal_phash,
}
ORACLE = {
    "q_multimodal_meta": MULTIMODAL_META_SQL,
    "q_multimodal_frames": MULTIMODAL_FRAMES_SQL,
    "q_multimodal_decode": MULTIMODAL_DECODE_SQL,
    "q_multimodal_png": MULTIMODAL_PNG_SQL,
    "q_multimodal_audio": MULTIMODAL_AUDIO_SQL,
    "q_multimodal_video": MULTIMODAL_VIDEO_SQL,
    "q_multimodal_resize": MULTIMODAL_RESIZE_SQL,
    "q_multimodal_jpeg": MULTIMODAL_JPEG_SQL,
    "q_dedup_phash": MULTIMODAL_PHASH_SQL,
}
