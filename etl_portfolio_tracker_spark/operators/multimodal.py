"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed in Arrow batches via
mapInPandas (SURVEY §7 tier E / task brief).

Decode support (no image libraries exist in this container):
uncompressed formats with trivially parseable containers — binary
NetPBM (P5/P6) and 24-bpp uncompressed BMP — are decoded FOR REAL
(pure struct + numpy, `_decode_netpbm` / `_decode_bmp`: header dims +
Rec.601 mean luminance over the actual pixels). Compressed formats
(JPEG/PNG/audio/video) would need PIL/libvips/ffmpeg; for those and
for unknown payloads `_decode_image_bytes` falls back to a documented
deterministic fake so the plumbing stays testable on the harness's
synthetic blobs. A production deploy swaps the fallback for a codec
without touching the plan shape. The mapInPandas form is the correct
scale pattern: executors stream Arrow record batches through Python,
memory bounded by `maxRecordsPerBatch`, no per-row serialization.
"""

from __future__ import annotations

import struct

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media", T.BinaryType(), True),        # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("meta_width", T.IntegerType(), True),
    T.StructField("meta_height", T.IntegerType(), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("magic_hex", T.StringType()),
    T.StructField("decoded_width", T.IntegerType()),
    T.StructField("decoded_height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])

def _decode_netpbm(b: bytes) -> tuple[int, int, float]:
    """Binary NetPBM (P5 grayscale / P6 RGB): whitespace/comment-
    tolerant header parse, then one numpy pass for Rec.601 luma."""
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":                     # comment to EOL
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(int(b[i:j]))
        i = j
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit NetPBM not supported")
    i += 1                                         # single ws after maxval
    ch = 3 if b[:2] == b"P6" else 1
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * ch,
                       offset=i).astype(np.float64)
    if ch == 3:
        rgb = px.reshape(-1, 3)
        luma = 0.299 * rgb[:, 0] + 0.587 * rgb[:, 1] + 0.114 * rgb[:, 2]
    else:
        luma = px
    return w, h, float(luma.mean())


def _decode_bmp(b: bytes) -> tuple[int, int, float]:
    """24-bpp uncompressed BMP: little-endian header fields, 4-byte
    row padding stripped, BGR order; Rec.601 luma."""
    data_off = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h = abs(struct.unpack_from("<i", b, 22)[0])    # may be top-down
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bpp uncompressed BMP supported")
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)[:, :w * 3]
    bgr = rows.reshape(-1, 3).astype(np.float64)
    luma = 0.299 * bgr[:, 2] + 0.587 * bgr[:, 1] + 0.114 * bgr[:, 0]
    return w, h, float(luma.mean())


def _decode_image_bytes(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma). REAL decode for binary NetPBM and
    24-bpp BMP (see module docstring); a deterministic payload-derived
    fake for every other format — compressed codecs need external
    libraries this container doesn't ship, and the harness's synthetic
    blobs must keep flowing through the same plumbing either way."""
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, float(sum(payload[:16]) % 256))


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as an opaque binary
    payload (the harness has no real image bytes) with fake metadata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("media"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"))


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: streams Arrow batches, one Python process
    per task, emits typed features. Partition-parallel; no shuffle."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["media"]
            feats = [_decode_image_bytes(bytes(p)) if p is not None
                     else (None, None, None) for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(bytes(p)) if p is not None else 0
                            for p in payloads],
                "magic_hex": [bytes(p)[:4].hex() if p is not None else None
                              for p in payloads],
                "decoded_width": [f[0] for f in feats],
                "decoded_height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
            })
    return media.mapInPandas(_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("out_width", T.IntegerType()),
    T.StructField("out_height", T.IntegerType()),
    T.StructField("thumb", T.BinaryType()),
])


def resize_media(media: DataFrame, max_px: int = 64) -> DataFrame:
    """mapInPandas resize: fit the (stub-)decoded dims into a
    max_px box preserving aspect ratio, emit a thumbnail payload.
    Real implementation: PIL `Image.thumbnail((max_px, max_px))` →
    re-encode. Stub: scaled dims from the deterministic fake decode,
    thumbnail = every k-th byte of the payload (deterministic,
    size-proportional). 1→1 rows, partition-parallel, no shuffle."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "out_width": [], "out_height": [],
                   "thumb": []}
            for mid, p in zip(pdf["media_id"], pdf["media"]):
                if p is None:
                    row = (None, None, None)
                else:
                    b = bytes(p)
                    w, h, _ = _decode_image_bytes(b)
                    scale = max(1.0, max(w, h) / max_px)
                    step = max(1, len(b) // max(1, max_px * max_px // 8))
                    row = (int(w / scale), int(h / scale), b[::step])
                out["media_id"].append(mid)
                out["out_width"].append(row[0])
                out["out_height"].append(row[1])
                out["thumb"].append(row[2])
            yield pd.DataFrame(out)
    return media.mapInPandas(_batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
    T.StructField("frame_bytes", T.LongType()),
])


def frame_sample(media: DataFrame, frame_size: int = 256,
                 every_n: int = 4) -> DataFrame:
    """mapInPandas frame sampling: treat the payload as concatenated
    fixed-size frames (a real deploy hands ffmpeg the container and
    samples keyframes) and emit every n-th frame as its own row.

    This is the 1→MANY multimodal kernel — output cardinality differs
    from input, which rules out a scalar pandas UDF; mapInPandas lets
    one Arrow batch in yield any number of rows out while staying
    partition-parallel with bounded memory (frames stream per batch,
    never one giant per-video list pinned on an executor)."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame": [],
                   "frame_bytes": []}
            for mid, p in zip(pdf["media_id"], pdf["media"]):
                if p is None:
                    continue
                b = bytes(p)
                n_frames = max(1, (len(b) + frame_size - 1) // frame_size)
                for idx in range(0, n_frames, every_n):
                    fr = b[idx * frame_size:(idx + 1) * frame_size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame"].append(fr)
                    out["frame_bytes"].append(len(fr))
            yield pd.DataFrame(out)
    return media.mapInPandas(_batches, schema=FRAMES_SCHEMA)


def media_meta(media: DataFrame) -> DataFrame:
    """Pure-SQL metadata over binary payloads (no Python): byte length
    + content hash — the part of the multimodal path that stays
    JVM-side and is oracle-checkable."""
    return media.select(
        "media_id",
        F.length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("content_md5"))
