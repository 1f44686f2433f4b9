"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed in Arrow batches via
mapInPandas (SURVEY §7 tier E / task brief).

Decode support (no image/audio libraries exist in this container):
formats whose containers and codecs are parseable with the stdlib —
binary NetPBM (P5/P6), 24-bpp uncompressed BMP, 8-bit non-interlaced
PNG (DEFLATE via stdlib zlib + the five RFC 2083 row filters), and
RIFF/WAVE PCM audio — are decoded FOR REAL (struct + zlib + numpy:
header dims + Rec.601 mean luminance over the actual pixels; sample
rate / duration / RMS / peak over the actual samples). Entropy-coded
formats (JPEG/MP3/video) would need PIL/libvips/ffmpeg; for those and
for unknown payloads `_decode_image_bytes` falls back to a documented
deterministic fake so the plumbing stays testable on the harness's
synthetic blobs. A production deploy swaps the fallback for a codec
without touching the plan shape. The mapInPandas form is the correct
scale pattern: executors stream Arrow record batches through Python,
memory bounded by `maxRecordsPerBatch`, no per-row serialization.
"""

from __future__ import annotations

import struct
import zlib

from collections.abc import Iterator

import numpy as np
import pandas as pd

# every exception a malformed payload can raise out of the real
# decoders (truncated headers -> struct.error/IndexError, corrupt
# DEFLATE -> zlib.error, corrupt LZW -> KeyError, unsupported variant
# -> ValueError): the decode contract is fall-back, never task-crash,
# so all call sites catch this tuple.
DECODE_ERRORS = (ValueError, struct.error, zlib.error,
                 IndexError, KeyError, MemoryError)

from pyspark.sql import DataFrame, Window as W
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

def _decode_netpbm(b: bytes) -> np.ndarray:
    """Binary NetPBM (P5 grayscale / P6 RGB) → (h, w, 3) uint8 RGB:
    whitespace/comment-tolerant header parse, one numpy reshape."""
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
    if b[:2] == b"P6":
        return np.frombuffer(b, dtype=np.uint8, count=w * h * 3,
                             offset=i).reshape(h, w, 3)
    gray = np.frombuffer(b, dtype=np.uint8, count=w * h,
                         offset=i).reshape(h, w)
    return np.stack([gray] * 3, axis=-1)


def _decode_bmp(b: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP → (h, w, 3) uint8 RGB: little-endian
    header fields, 4-byte row padding stripped, BGR→RGB, bottom-up
    rows flipped."""
    data_off = struct.unpack_from("<I", b, 10)[0]
    w = struct.unpack_from("<i", b, 18)[0]
    h_raw = struct.unpack_from("<i", b, 22)[0]
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bpp uncompressed BMP supported")
    h = abs(h_raw)
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(b, dtype=np.uint8, count=row_bytes * h,
                         offset=data_off).reshape(h, row_bytes)[:, :w * 3]
    rgb = rows.reshape(h, w, 3)[:, :, ::-1]
    return rgb[::-1] if h_raw > 0 else rgb        # positive h = bottom-up


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(b: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (h, w, 3) uint8 RGB — a REAL decode
    with no image library: PNG's only compression is DEFLATE, which
    the Python stdlib ships (`zlib`), so the full decode is chunk
    walk → zlib.decompress → per-row filter reconstruction (the five
    PNG filters: None/Sub/Up/Average/Paeth, RFC 2083 §6) → channel
    mapping. Supports color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA) at bit depth 8; alpha is dropped for the luma kernel.
    Interlaced (Adam7) and 16-bit images raise → documented fallback.
    """
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(b):
        ln = struct.unpack_from(">I", b, pos)[0]
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln                                  # len+type+crc
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = meta
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    if w == 0 or h == 0 or w * h > 16_000_000:
        # zero-dim images would emit NaN luma; absurd dims are a
        # decompression-bomb tell — both take the fallback
        raise ValueError(f"unsupported PNG dimensions {w}x{h}")
    stride = w * channels
    want = h * (stride + 1)
    # bounded inflate: the expected pixel volume is known from the
    # header, so never let a crafted IDAT (DEFLATE expands ~1000:1)
    # allocate more than that — an unbounded zlib.decompress would
    # OOM the executor before any size check ran
    raw = zlib.decompressobj().decompress(b"".join(idat), want)
    if len(raw) < want:
        raise ValueError("truncated PNG pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels                                      # bytes per pixel
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=y * (stride + 1) + 1)
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:                                   # None
            out[y] = row
        elif ftype == 2:                                 # Up
            out[y] = row + prev
        elif ftype == 1:                                 # Sub — the
            # recurrence out[x] = row[x] + out[x-bpp] is a per-channel
            # prefix sum: vectorized cumsum mod 256 (Sub is the most
            # common cheap filter; no Python-level inner loop)
            out[y] = (row.reshape(w, bpp).astype(np.int64)
                      .cumsum(axis=0) % 256).astype(np.uint8).ravel()
        elif ftype in (3, 4):                            # sequential in
            # x AND coupled to the row above — genuinely serial
            cur = out[y]
            r = row.astype(np.int32)
            p = prev.astype(np.int32)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ftype == 3:                           # Average
                    cur[x] = (r[x] + ((a + p[x]) >> 1)) & 0xFF
                else:                                    # Paeth
                    c = int(out[y - 1][x - bpp]) \
                        if (x >= bpp and y > 0) else 0
                    pa, pb, pc = (abs(p[x] - c), abs(a - c),
                                  abs(a + p[x] - 2 * c))
                    pred = a if (pa <= pb and pa <= pc) \
                        else (p[x] if pb <= pc else c)
                    cur[x] = (r[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    px = out.reshape(h, w, channels)
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])            # 2 / 6


def _lzw_decode(min_code_size: int, data: bytes,
                n_pixels: int) -> list[int]:
    """GIF-variant LZW (GIF89a spec appendix F): variable code width
    starting at min+1 bits, LSB-first packing, CLEAR/END control
    codes, dictionary capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[int, tuple[int, ...]] = {i: (i,) for i in range(clear)}
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        byte_i = bitpos // 8
        chunk = int.from_bytes(data[byte_i:byte_i + 4], "little")
        code = (chunk >> (bitpos % 8)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            code_size = min_code_size + 1
            table = {i: (i,) for i in range(clear)}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + (prev[0],)
            else:
                raise ValueError("corrupt LZW stream")
            if next_code < 4096:      # 12-bit cap: table growth stops
                table[next_code] = prev + (entry[0],)   # here per spec
                next_code += 1
                if next_code == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out[:n_pixels]


def _decode_gif(b: bytes) -> list[np.ndarray]:
    """GIF87a/89a → list of (h, w, 3) uint8 RGB frames — REAL decode,
    no image library: the only compression in GIF is LZW, implemented
    above. Frames are composed draw-over onto the logical screen
    (disposal modes and GCE transparency are ignored — documented
    subset); interlaced images raise → fallback."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", b, 6)
    # decompression-bomb guard (mirrors _decode_png): header dims are
    # uint16, so a ~30-byte payload can claim 60000x60000 and force a
    # ~10.8 GB canvas allocation before any LZW data is read. Bound
    # the canvas like PNG does; the per-frame copy multiplies it, so
    # total decoded pixels across frames are bounded too (below).
    if w == 0 or h == 0 or w * h > 16_000_000:
        raise ValueError("zero-dimension or oversized GIF")
    packed, bg = b[10], b[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[bg % len(gct)]
    frames: list[np.ndarray] = []
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:                                 # trailer
            break
        if block == 0x21:                                 # extension
            pos += 2                                      # introducer+label
            while b[pos]:                                 # sub-blocks
                pos += 1 + b[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, iw, ih = struct.unpack_from("<HHHH", b, pos + 1)
        # per-descriptor bound: iw/ih are independent uint16s, so a
        # 1×1 logical screen passing the header guard could still
        # declare a 65535×65535 image block and drive _lzw_decode's
        # output toward 4.3e9 entries before any canvas check fires;
        # a descriptor must fit inside the declared screen
        if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
            raise ValueError("GIF image descriptor outside screen")
        ipacked = b[pos + 9]
        pos += 10
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image without a color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while b[pos]:
            ln = b[pos]
            data += b[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decode(min_code, bytes(data), iw * ih),
                       dtype=np.int64)
        if len(idx) < iw * ih:
            raise ValueError("truncated GIF frame")
        canvas[top:top + ih, left:left + iw] = \
            ct[idx % len(ct)].reshape(ih, iw, 3)
        # total-decoded-pixels bound: frames.append copies the whole
        # canvas, so an adversarial animation multiplies the canvas
        # cost per image block. Same 16M-pixel budget, spent across
        # all frames.
        if (len(frames) + 1) * w * h > 16_000_000:
            raise ValueError("GIF animation exceeds decode budget")
        frames.append(canvas.copy())
    if not frames:
        raise ValueError("GIF with no image blocks")
    return frames


def _decode_pixels(payload: bytes) -> np.ndarray | None:
    """(h, w, 3) uint8 RGB for REAL-decodable payloads (binary NetPBM,
    24-bpp BMP, 8-bit non-interlaced PNG, GIF first frame), None for
    anything the container genuinely cannot decode (JPEG/video —
    DCT/entropy codecs need external libraries)."""
    if payload[:2] in (b"P5", b"P6"):
        return _decode_netpbm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)[0]
    return None


def _mean_luma(px: np.ndarray) -> float:
    rgb = px.reshape(-1, 3).astype(np.float64)
    return float((0.299 * rgb[:, 0] + 0.587 * rgb[:, 1]
                  + 0.114 * rgb[:, 2]).mean())


def _encode_ppm(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(px).tobytes()


def _decode_image_bytes(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma). REAL decode for binary NetPBM,
    24-bpp BMP, and 8-bit PNG (see module docstring); a deterministic
    payload-derived fake for every other format — entropy codecs need
    external libraries this container doesn't ship, and the harness's
    synthetic blobs must keep flowing through the same plumbing
    either way."""
    try:
        px = _decode_pixels(payload)
    except DECODE_ERRORS:
        px = None                 # malformed/unsupported variant of a
        # known magic (truncation, 16-bit PNG, interlace, corrupt
        # DEFLATE/LZW) → fallback
    if px is not None:
        return px.shape[1], px.shape[0], _mean_luma(px)
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
    """mapInPandas resize: fit into a max_px box preserving aspect
    ratio, emit a thumbnail payload. 1→1 rows, partition-parallel, no
    shuffle.

    REAL-decodable payloads (NetPBM/24-bpp BMP) get a genuine
    nearest-neighbor downsample re-encoded as binary PPM; everything
    else keeps the deterministic fallback (scaled fake dims +
    every-k-th-byte thumbnail) so the harness blobs stay exercised."""
    def _resize_one(b: bytes):
        try:
            px = _decode_pixels(b)
        except DECODE_ERRORS:
            px = None             # unsupported variant → fallback path
        if px is not None:
            h, w = px.shape[:2]
            scale = max(1.0, max(w, h) / max_px)
            ow, oh = max(1, int(w / scale)), max(1, int(h / scale))
            yi = (np.arange(oh) * h) // oh        # nearest-neighbor
            xi = (np.arange(ow) * w) // ow
            return ow, oh, _encode_ppm(px[yi][:, xi])
        w, h, _ = _decode_image_bytes(b)
        scale = max(1.0, max(w, h) / max_px)
        step = max(1, len(b) // max(1, max_px * max_px // 8))
        return int(w / scale), int(h / scale), b[::step]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "out_width": [], "out_height": [],
                   "thumb": []}
            for mid, p in zip(pdf["media_id"], pdf["media"]):
                row = (None, None, None) if p is None \
                    else _resize_one(bytes(p))
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
    never one giant per-video list pinned on an executor).

    Animated GIF payloads get REAL frame sampling: every n-th decoded
    frame (LZW decode + draw-over composition, _decode_gif) re-encoded
    as binary PPM. Everything else keeps the byte-chunk treatment —
    genuine video containers need ffmpeg."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame": [],
                   "frame_bytes": []}

            def emit(mid, idx, fr):
                out["media_id"].append(mid)
                out["frame_idx"].append(idx)
                out["frame"].append(fr)
                out["frame_bytes"].append(len(fr))

            for mid, p in zip(pdf["media_id"], pdf["media"]):
                if p is None:
                    continue
                b = bytes(p)
                if b[:6] in (b"GIF87a", b"GIF89a"):
                    try:
                        frames = _decode_gif(b)
                    except DECODE_ERRORS:
                        frames = None
                    if frames is not None:
                        for idx in range(0, len(frames), every_n):
                            emit(mid, idx, _encode_ppm(frames[idx]))
                        continue
                n_frames = max(1, (len(b) + frame_size - 1) // frame_size)
                for idx in range(0, n_frames, every_n):
                    emit(mid, idx, b[idx * frame_size:(idx + 1) * frame_size])
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


AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
])


def _decode_wav(b: bytes):
    """RIFF/WAVE PCM parse — REAL audio decode, no codec library:
    walk the chunk list (fmt / data may be preceded by LIST etc.),
    then one numpy pass for RMS and peak of the normalized signal.
    Supports 8-bit unsigned and 16-bit signed PCM (format tag 1)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)              # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit PCM supported")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2",
                          count=len(data) // 2).astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    n_samples = len(x) // n_ch
    rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
    peak = float(np.abs(x).max()) if len(x) else 0.0
    return rate, n_ch, bits, n_samples, rms, peak


def audio_meta(media: DataFrame) -> DataFrame:
    """mapInPandas audio feature extraction: REAL decode for RIFF/WAVE
    PCM payloads (sample rate, channels, duration, RMS, peak); other
    payloads yield a deterministic fake (8 kHz mono, bytes as 8-bit
    samples) so the harness's synthetic blobs exercise the identical
    plumbing. Partition-parallel map, no shuffle — the audio twin of
    decode_media."""
    def _one(b: bytes):
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return _decode_wav(b)
        x = (np.frombuffer(b, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
        rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
        peak = float(np.abs(x).max()) if len(x) else 0.0
        return 8000, 1, 8, len(x), rms, peak

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "sample_rate", "n_channels",
                                   "bits_per_sample", "n_samples",
                                   "duration_ms", "rms", "peak")}
            for mid, p in zip(pdf["media_id"], pdf["media"]):
                out["media_id"].append(mid)
                if p is None:
                    for k in list(out)[1:]:
                        out[k].append(None)
                    continue
                rate, n_ch, bits, n, rms, peak = _one(bytes(p))
                out["sample_rate"].append(rate)
                out["n_channels"].append(n_ch)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(n)
                out["duration_ms"].append(1000.0 * n / rate if rate else None)
                out["rms"].append(rms)
                out["peak"].append(peak)
            yield pd.DataFrame(out)
    return media.mapInPandas(_batches, schema=AUDIO_SCHEMA)


# --- perceptual-hash image near-dup --------------------------------

PHASH_SIDE = 16          # synthesized image side (PHASH_SIDE² luma px)
PHASH_GRID = 8           # aHash grid (GRID² bits = 4 × 16-bit bands)
PHASH_PAD = 32           # pad byte for short texts (ASCII space)
PHASH_BANDS = 4          # pigeonhole bands over the 64-bit hash
PHASH_MAX_HAMMING = 6    # report pairs within this bit distance
PHASH_BUCKET_CAP = 50    # per-band bucket cap (MINHASH_BUCKET_CAP rule)

LUMA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("luma", T.ArrayType(T.IntegerType())),
])


def text_to_images(docs: DataFrame) -> DataFrame:
    """Deterministic image synthesis: the doc's ASCII-projected
    normalized text bytes become a PHASH_SIDE² grayscale raster,
    encoded as a REAL binary-PPM payload (P6). The container ships no
    image corpus, so this adapter manufactures one whose pixel
    content tracks the text — near-duplicate texts become
    near-duplicate images, which is what lets the phash pipeline
    demonstrate actual near-dup recall. The payload then flows
    through the REAL codec path (_encode_ppm -> _decode_pixels), so
    the plumbing under test is the same one real images would use."""
    side = PHASH_SIDE

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = side * side
        # r10-opt (guide §4.2 — vectorize inside the Python boundary):
        # the stride-sample was a 1024-iteration per-ROW Python loop
        # (~5M interpreter ops per 5k docs); one fancy-index per row
        # computes the identical bytes. np.repeat(.., 3) IS the
        # gray-RGB stack: P6 payload bytes are pixel-major RGB.
        base = np.arange(m, dtype=np.int64)
        hdr = b"P6\n%d %d\n255\n" % (side, side)
        pad = hdr + bytes([PHASH_PAD]) * (m * 3)
        for pdf in it:
            payloads = []
            for t in pdf["_canon"]:
                b = t.encode("ascii")
                n = len(b)
                # stride-sample the WHOLE text across the raster:
                # pixel i = byte floor(i·n/m), so the image reflects
                # the full document (a prefix raster would hash text
                # LENGTH, not content) and small edits only perturb
                # pixels near the edit's sampled positions
                if n:
                    samp = np.frombuffer(b, dtype=np.uint8)[
                        (base * n) // m]
                    payloads.append(hdr + np.repeat(samp, 3).tobytes())
                else:
                    payloads.append(pad)
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "media": payloads,
                                "mime": "image/x-portable-pixmap"})

    canon = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "),
        r"[^\x20-\x7E]", "?")
    src = docs.select(F.col("doc_id").alias("media_id"),
                      canon.alias("_canon"))
    return src.mapInPandas(_batches, schema=T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]))


def decode_luma(media: DataFrame) -> DataFrame:
    """mapInPandas REAL decode to a grayscale luma vector: codec work
    (and only codec work) happens Python-side in Arrow batches; all
    hash arithmetic stays JVM-side so the DuckDB oracle can mirror it
    exactly. Channels are averaged with an exact integer mean (the
    synthesized rasters are gray, so this is the identity on them)."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, ws, hs, lus = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["media"]):
                try:
                    px = _decode_pixels(bytes(p)) if p is not None else None
                except DECODE_ERRORS:
                    px = None
                if px is None:
                    continue
                ids.append(mid)
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                # r10-opt (§4.2): keep the luma vector as an int32
                # numpy array — same values (≤255 fits int32), but
                # Arrow list conversion skips 1024 boxed Python ints
                # per row
                lus.append((px.astype(np.int64).sum(axis=2) // 3)
                           .ravel().astype(np.int32))
            yield pd.DataFrame({"media_id": ids, "width": ws,
                                "height": hs, "luma": lus})
    return media.mapInPandas(_batches, schema=LUMA_SCHEMA)


def image_phash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over decoded luma:
    downsample the PHASH_SIDE² raster to an 8×8 grid of 2×2 block
    means, threshold each cell against the grid mean, and pack the 64
    bits into FOUR 16-bit band integers (band b carries bits
    16b..16b+15, bit k of the grid cell k = row*8 + col). Bands — not
    one 64-bit integer — because (a) bit 63 would overflow a signed
    BIGINT differently per engine and (b) the bands ARE the LSH keys
    downstream (Manku et al. WWW'07, the simhash_pairs precedent).

    Every arithmetic step is EXACT in IEEE doubles (2×2 block means
    are multiples of 0.25 below 2¹⁶, the grid mean is their /64 sum,
    also exact), so the fold order can't move a bit and the DuckDB
    twin reproduces the hash verbatim — a perceptual hash with an
    exact oracle. Emitted as (media_id, band0..band3, phash_hex)."""
    side, grid = PHASH_SIDE, PHASH_GRID
    cells = F.expr(
        f"transform(sequence(0, {grid * grid - 1}), k -> ("
        f"  luma[(k div {grid}) * 2 * {side} + (k % {grid}) * 2]"
        f" + luma[(k div {grid}) * 2 * {side} + (k % {grid}) * 2 + 1]"
        f" + luma[((k div {grid}) * 2 + 1) * {side} + (k % {grid}) * 2]"
        f" + luma[((k div {grid}) * 2 + 1) * {side} + (k % {grid}) * 2 + 1]"
        f") / 4.0D)")
    mean = F.expr(
        f"aggregate(_cells, 0.0D, (a, x) -> a + x) / {grid * grid}.0D")
    band = lambda b: F.expr(  # noqa: E731
        f"aggregate(sequence(0, 15), 0L, (a, k) -> a +"
        f" (CASE WHEN _cells[{16 * b} + k] > _mean THEN 1L ELSE 0L END)"
        f" * shiftleft(1L, k))").alias(f"band{b}")
    hashed = (decode_luma(media)
              .filter((F.col("width") == side) & (F.col("height") == side))
              .withColumn("_cells", cells)
              .withColumn("_mean", mean)
              .select("media_id", band(0), band(1), band(2), band(3)))
    hex4 = lambda c: F.lpad(F.hex(F.col(c)), 4, "0")  # noqa: E731
    return hashed.select(
        "media_id", "band0", "band1", "band2", "band3",
        F.concat(hex4("band0"), hex4("band1"),
                 hex4("band2"), hex4("band3")).alias("phash_hex"))


def image_phash_pairs(docs: DataFrame,
                      max_hamming: int = PHASH_MAX_HAMMING,
                      bucket_cap: int = PHASH_BUCKET_CAP) -> DataFrame:
    """Image near-dup pairs by perceptual hash: synthesize -> REAL
    decode -> aHash -> pigeonhole-band LSH -> exact Hamming verify.
    With 4 bands over 64 bits, any pair within Hamming 3 of EACH
    OTHER shares at least one untouched band (pigeonhole), and pairs
    up to `max_hamming` are still found whenever the damage clusters
    — same recall framing as simhash_pairs, applied to images.

    Scale: the hash is one mapInPandas (codec) + one map (bit math)
    per image; candidates come from 4 band-key equi-joins with a
    bucket cap (boilerplate rasters would otherwise explode a
    bucket); verify is a row-local bit_count on 4 XORs. Nothing
    pairwise beyond capped buckets.

    Recall domain (measured, honest): aHash is robust to
    SUBSTITUTION-style perturbation (noise, masking, recolor) and NOT
    to translation — exactly like real-image aHash, which survives
    noise but not cropping. The harness corpus's near-dup texts are
    insertion-style edits, which shift every stride-sampled pixel:
    at sf0.01 the text-dup candidate pairs land at Hamming 17-29, so
    this query correctly returns ZERO pairs there (the oracle
    verifies the empty set bit-exactly); recall on substitution
    edits is pinned by pytest on constructed rasters."""
    from ..functions.checkpoints import iter_checkpoint
    # the hash frame feeds THREE consumers (band keys + both verify
    # sides); checkpoint it so the mapInPandas codec chain runs once —
    # at scale this is the persisted phash index, not a recompute
    ph = iter_checkpoint(image_phash(text_to_images(docs)), eager=False)
    keys = ph.select(
        "media_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.col(f"band{b}").alias("key"))
            for b in range(PHASH_BANDS)])).alias("bk"))
    keys = keys.select("media_id", "bk.band", "bk.key")
    w_cap = W.partitionBy("band", "key")
    kept = (keys.withColumn("_bn", F.count(F.lit(1)).over(w_cap))
            .filter(F.col("_bn") <= bucket_cap)
            .drop("_bn"))
    a = kept.select(F.col("media_id").alias("doc_a"), "band", "key")
    b = kept.select(F.col("media_id").alias("doc_b"), "band", "key")
    cand = (a.join(b, ["band", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())
    ha = ph.select(F.col("media_id").alias("doc_a"),
                   *[F.col(f"band{i}").alias(f"_a{i}") for i in range(4)])
    hb = ph.select(F.col("media_id").alias("doc_b"),
                   *[F.col(f"band{i}").alias(f"_b{i}") for i in range(4)])
    ham = sum(F.bit_count(F.expr(f"_a{i} ^ _b{i}")) for i in range(4))
    return (cand.join(ha, "doc_a").join(hb, "doc_b")
            .select("doc_a", "doc_b",
                    ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .orderBy("doc_a", "doc_b"))
