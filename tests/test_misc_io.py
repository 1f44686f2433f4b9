"""S4 CSV universe reader, P9/P10 trade write path, U2 UDF parity."""

import datetime as dt

from pyspark.sql import functions as F

from etl_portfolio_tracker_spark import schemas
from etl_portfolio_tracker_spark.functions.udfs import (
    builtin_normalize, normalize_text_udf,
)
from etl_portfolio_tracker_spark.io import read_csv_universe
from etl_portfolio_tracker_spark.operators import trade_ops as TO


def test_csv_universe_alias_headers_and_bom(spark, tmp_path):
    # aliased headers (ticker/name/list) + UTF-8 BOM, like the
    # reference CSV (universe.py:11-15, encoding utf-8-sig)
    p = tmp_path / "uni.csv"
    p.write_bytes("﻿name;ticker;list\nInvestor B;INVE-B.ST;Large\nSCA B;SCA-B.ST;Large\n"
                  .encode("utf-8"))
    df = read_csv_universe(spark, str(p))
    rows = {r["name_display"]: r["yf_symbol"] for r in df.collect()}
    assert rows == {"Investor B": "INVE-B.ST", "SCA B": "SCA-B.ST"}


def test_csv_universe_missing_column_raises(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("foo;bar\n1;2\n")
    import pytest
    with pytest.raises(ValueError, match="missing required"):
        read_csv_universe(spark, str(p))


def _trades(spark, rows):
    data = [(i + 1, "demo", "TICK",
             dt.datetime(2025, 1, 1) + dt.timedelta(minutes=i),
             side, float(q), float(p), float(f))
            for i, (side, q, p, f) in enumerate(rows)]
    return spark.createDataFrame(data, schema=schemas.TRADES)


def test_validate_trades_flags(spark):
    bad = spark.createDataFrame(
        [(1, "", "TICK", dt.datetime(2025, 1, 1), "HOLD", 0.0, -5.0, -1.0)],
        schema=schemas.TRADES)
    r = TO.validate_trades(bad).collect()[0]
    assert r["bad_user"] and r["bad_side"] and r["bad_qty"]
    assert r["bad_price"] and r["bad_fee"] and not r["is_valid"]
    good = _trades(spark, [("BUY", 1, 10, 0)])
    assert TO.validate_trades(good).collect()[0]["is_valid"]


def test_oversell_guard_scenario_b(spark):
    # FIXTURES §2.2: BUY 10 → SELL 15 rejected → SELL 5 accepted
    t = _trades(spark, [("BUY", 10, 200, 0), ("SELL", 15, 210, 0),
                        ("SELL", 5, 210, 0)])
    out = {r["id"]: r["accepted"] for r in TO.reject_oversells(t).collect()}
    assert out == {1: True, 2: False, 3: True}


def test_record_trades_appends_only_accepted(spark):
    ledger = _trades(spark, [("BUY", 10, 200, 0)])
    batch = spark.createDataFrame(
        [(99, "demo", "TICK", dt.datetime(2025, 2, 1), "SELL", 50.0, 210.0, 0.0),
         (100, "demo", "TICK", dt.datetime(2025, 2, 2), "SELL", 10.0, 210.0, 0.0)],
        schema=schemas.TRADES)
    new_ledger = TO.record_trades(ledger, batch)
    ids = sorted(r["id"] for r in new_ledger.collect())
    assert ids == [1, 100]  # oversell of 50 rejected, full exit accepted


def test_udf_parity_with_builtin(spark):
    df = spark.createDataFrame(
        [("  HeLLo   World  ",), ("a\t b\n c",)], "s string")
    got = df.select(normalize_text_udf("s").alias("u"),
                    builtin_normalize(F.col("s")).alias("b")).collect()
    for r in got:
        assert r["u"] == r["b"]


def test_read_jsonl_explicit_schema_and_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T
    from etl_portfolio_tracker_spark import io as eio
    p = str(tmp_path / "docs.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "hello"}\n')
        f.write('{"doc_id": 2, "text": "world"}\n')
        f.write('this is not json\n')
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    out = eio.read_jsonl(spark, p, schema)
    rows = out.collect()
    good = {r["doc_id"]: r["text"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1: "hello", 2: "world"}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    from etl_portfolio_tracker_spark import io as eio
    import glob
    p = str(tmp_path / "many")
    spark.range(1000).repartition(20).write.parquet(p)
    assert len(glob.glob(f"{p}/part-*")) == 20
    eio.compact(spark, p, target_files=2)
    assert len(glob.glob(f"{p}/part-*")) == 2
    assert spark.read.parquet(p).count() == 1000
    assert not glob.glob(f"{p}._compact_*")


def test_compact_versioned_leaves_source_untouched(spark, tmp_path):
    # object-store mode: source dir is never renamed/deleted; caller
    # gets a new versioned directory and flips the pointer itself
    from etl_portfolio_tracker_spark import io as eio
    import glob
    p = str(tmp_path / "many2")
    spark.range(500).repartition(10).write.parquet(p)
    out = eio.compact(spark, p, target_files=1, in_place=False)
    assert out != p
    assert len(glob.glob(f"{p}/part-*")) == 10          # untouched
    assert len(glob.glob(f"{out}/part-*")) == 1
    assert spark.read.parquet(out).count() == 500


def test_wavg_cost_udaf_matches_builtin(spark):
    from pyspark.sql import functions as F
    from etl_portfolio_tracker_spark.functions.udfs import wavg_cost_udaf
    df = spark.createDataFrame(
        [("a", 2.0, 10.0), ("a", 3.0, 20.0), ("b", 1.0, 5.0)],
        "k string, qty double, price double")
    got = (df.groupBy("k").agg(wavg_cost_udaf("qty", "price").alias("w"))
           .orderBy("k").toPandas())
    ref = (df.groupBy("k")
           .agg((F.sum(F.col("qty") * F.col("price")) / F.sum("qty")).alias("w"))
           .orderBy("k").toPandas())
    assert list(got["w"]) == list(ref["w"])


def test_ngram_udtf_expands_rows(spark):
    from pyspark.sql.functions import udtf, lit
    from etl_portfolio_tracker_spark.functions.udfs import ngram_udtf_class
    cls, schema = ngram_udtf_class()
    fn = udtf(cls, returnType=schema)
    out = fn(lit("One  two three"), lit(2)).collect()
    assert [(r.pos, r.ngram) for r in out] == [
        (0, "one two"), (1, "two three")]


def _ppm6(w, h, pixels):
    return b"P6\n# c\n%d %d\n255\n" % (w, h) + bytes(pixels)


def test_decode_media_real_netpbm_and_bmp(spark):
    import struct
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_media)
    # 2x1 P6: red + green pixels
    ppm = _ppm6(2, 1, [255, 0, 0, 0, 255, 0])
    # 2x1 24bpp BMP, bottom-up, row padded to 8 bytes: blue + white
    px_row = bytes([255, 0, 0,  255, 255, 255, 0, 0])   # BGR BGR pad
    bmp = (b"BM" + struct.pack("<IHHI", 14 + 40 + len(px_row), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0,
                         len(px_row), 2835, 2835, 0, 0) + px_row)
    rows = [(1, bytearray(ppm), "image/x-portable-pixmap", None, None),
            (2, bytearray(bmp), "image/bmp", None, None),
            (3, bytearray(b"opaque-blob"), "application/octet-stream",
             None, None)]
    out = (decode_media(spark.createDataFrame(rows, MEDIA_SCHEMA))
           .toPandas().set_index("media_id"))
    assert (out.loc[1, "decoded_width"], out.loc[1, "decoded_height"]) == (2, 1)
    assert abs(out.loc[1, "mean_luma"]
               - (0.299 * 255 + 0.587 * 255) / 2) < 1e-9
    assert (out.loc[2, "decoded_width"], out.loc[2, "decoded_height"]) == (2, 1)
    # blue: .114*255 ; white: 255 -> mean
    assert abs(out.loc[2, "mean_luma"] - (0.114 * 255 + 255.0) / 2) < 1e-9
    # unknown payload keeps the deterministic fallback
    assert out.loc[3, "decoded_width"] == len(b"opaque-blob") % 640 + 1


def test_resize_media_real_thumbnail_roundtrip(spark):
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, _decode_netpbm, resize_media)
    # 4x2 P6 gradient
    pix = bytes(v for i in range(8) for v in (i * 30, 0, 255 - i * 30))
    ppm = _ppm6(4, 2, pix)
    rows = [(1, bytearray(ppm), "image/x-portable-pixmap", None, None)]
    out = (resize_media(spark.createDataFrame(rows, MEDIA_SCHEMA), max_px=2)
           .toPandas().iloc[0])
    assert (out["out_width"], out["out_height"]) == (2, 1)
    thumb = _decode_netpbm(bytes(out["thumb"]))
    assert thumb.shape == (1, 2, 3)
    # nearest-neighbor picks source pixels (0,0) and (0,2)
    assert list(thumb[0, 0]) == [0, 0, 255]
    assert list(thumb[0, 1]) == [60, 0, 195]


def _wav(rate, samples16):
    import struct as st
    data = b"".join(st.pack("<h", s) for s in samples16)
    fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(data)) + data)


def test_audio_meta_real_wav_decode(spark):
    import math
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, audio_meta)
    wav = _wav(8000, [0, 16384, -16384, 0])
    rows = [(1, bytearray(wav), "audio/wav", None, None),
            (2, bytearray(b"not-audio"), "application/octet-stream",
             None, None)]
    out = (audio_meta(spark.createDataFrame(rows, MEDIA_SCHEMA))
           .toPandas().set_index("media_id"))
    assert out.loc[1, "sample_rate"] == 8000
    assert out.loc[1, "n_channels"] == 1
    assert out.loc[1, "bits_per_sample"] == 16
    assert out.loc[1, "n_samples"] == 4
    assert abs(out.loc[1, "duration_ms"] - 0.5) < 1e-9
    assert abs(out.loc[1, "rms"] - math.sqrt(2 * 0.5 ** 2 / 4)) < 1e-9
    assert abs(out.loc[1, "peak"] - 0.5) < 1e-9
    # fallback path: bytes-as-8-bit-samples
    assert out.loc[2, "sample_rate"] == 8000
    assert out.loc[2, "n_samples"] == len(b"not-audio")


def test_docgen_datasource_deterministic_and_partitioned(spark):
    from etl_portfolio_tracker_spark.sources.docgen import register
    register(spark)
    df = (spark.read.format("docgen")
          .option("rows", 200).option("numPartitions", 5).load())
    a = df.orderBy("doc_id").toPandas()
    assert len(a) == 200
    assert list(a["doc_id"]) == list(range(200))
    assert df.rdd.getNumPartitions() == 5
    assert (a["n_chars"] == a["text"].str.len()).all()
    # deterministic under a different partitioning
    b = (spark.read.format("docgen")
         .option("rows", 200).option("numPartitions", 2).load()
         .orderBy("doc_id").toPandas())
    assert a.equals(b)
    # downstream operators run on generated rows
    from etl_portfolio_tracker_spark.operators import text as TX
    out = TX.token_stats(df).toPandas()
    assert len(out) == 200 and (out["n_ws_tokens"] >= 8).all()


def _png_encode(px, color_type, filters):
    """Minimal PNG writer for tests: applies the requested per-row
    filter FORWARD (the decoder must invert it), stdlib zlib only."""
    import struct as st
    import zlib
    import numpy as np
    h, w = px.shape[:2]
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    flat = px.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        enc = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = int(row[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if (x >= ch and y > 0) else 0
            if y == 0 and f in (2,):
                b = 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(row[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    def chunk(t, d):
        return (st.pack(">I", len(d)) + t + d
                + st.pack(">I", zlib.crc32(t + d)))
    ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_roundtrip_all_filters_and_colors():
    import numpy as np
    from etl_portfolio_tracker_spark.operators.multimodal import (
        _decode_png)
    rng = np.random.default_rng(7)
    for color_type, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = rng.integers(0, 256, size=(9, 7, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            blob = _png_encode(px, color_type, filters)
            got = _decode_png(blob)
            assert got.shape == (9, 7, 3)
            if color_type == 2:
                assert (got == px).all()
            elif color_type == 6:
                assert (got == px[:, :, :3]).all()
            else:  # gray / gray+alpha replicate channel 0
                assert (got == np.repeat(px[:, :, :1], 3, axis=2)).all()


def test_png_decode_in_media_pipeline(spark):
    import numpy as np
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_media, resize_media)
    px = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(16, 12, 3) % 251
    blob = _png_encode(px, 2, [0, 4])
    rows = [(1, bytearray(blob), "image/png", None, None),
            # unsupported 16-bit depth -> deterministic fallback, no raise
            (2, bytearray(blob[:8] + blob[8:]).replace(
                 b"\x08\x02", b"\x10\x02", 1), "image/png", None, None)]
    out = (decode_media(spark.createDataFrame(rows, MEDIA_SCHEMA))
           .toPandas().set_index("media_id"))
    assert out.loc[1, "decoded_width"] == 12
    assert out.loc[1, "decoded_height"] == 16
    rgb = px.reshape(-1, 3).astype(np.float64)
    want = (0.299 * rgb[:, 0] + 0.587 * rgb[:, 1]
            + 0.114 * rgb[:, 2]).mean()
    assert abs(out.loc[1, "mean_luma"] - want) < 1e-9
    assert out.loc[2, "decoded_width"] == len(rows[1][1]) % 640 + 1
    # resize path: real nearest-neighbor thumb from the PNG
    r = (resize_media(spark.createDataFrame(rows[:1], MEDIA_SCHEMA),
                      max_px=8).toPandas().iloc[0])
    assert (r["out_width"], r["out_height"]) == (6, 8)
    assert bytes(r["thumb"])[:2] == b"P6"


def _gif_encode(frames_idx, palette, w, h):
    """Minimal GIF89a writer for tests: global color table, one image
    block per frame, LZW stream in 'uncompressed' form (a CLEAR code
    before every literal pixel code keeps the table empty and the
    code width fixed) — a valid stream any conforming decoder accepts."""
    import struct as st
    n_colors = len(palette)
    ct_bits = max(1, (n_colors - 1).bit_length())
    ct_size = 1 << ct_bits
    out = bytearray(b"GIF89a")
    out += st.pack("<HH", w, h)
    out += bytes([0x80 | (ct_bits - 1), 0, 0])      # GCT flag + bg + aspect
    for i in range(ct_size):
        out += bytes(palette[i] if i < n_colors else (0, 0, 0))
    min_code = max(2, ct_bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_w = min_code + 1
    for idx in frames_idx:
        out += b"\x2c" + st.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        bits, nbits = 0, 0
        data = bytearray()
        def push(code):
            nonlocal bits, nbits
            bits |= code << nbits
            nbits += code_w
            while nbits >= 8:
                data.append(bits & 0xFF)
                bits >>= 8
                nbits -= 8
        for px in idx:
            push(clear)
            push(px)
        push(end)
        if nbits:
            data.append(bits & 0xFF)
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_gif_decode_frames_and_first_frame():
    import numpy as np
    from etl_portfolio_tracker_spark.operators.multimodal import (
        _decode_gif, _decode_pixels)
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    w, h = 4, 3
    f0 = [1] * (w * h)
    f1 = [(i % 4) for i in range(w * h)]
    blob = _gif_encode([f0, f1], palette, w, h)
    frames = _decode_gif(blob)
    assert len(frames) == 2
    assert (frames[0] == np.array([255, 0, 0], np.uint8)).all()
    want1 = np.array([palette[i % 4] for i in range(w * h)],
                     np.uint8).reshape(h, w, 3)
    assert (frames[1] == want1).all()
    assert (_decode_pixels(blob) == frames[0]).all()


def test_gif_real_frame_sampling(spark):
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, frame_sample)
    palette = [(10, 20, 30), (200, 100, 50)]
    w, h = 3, 2
    frames_idx = [[0] * 6, [1] * 6, [0, 1] * 3, [1, 0] * 3, [1] * 6]
    blob = _gif_encode(frames_idx, palette, w, h)
    rows = [(7, bytearray(blob), "image/gif", None, None)]
    out = (frame_sample(spark.createDataFrame(rows, MEDIA_SCHEMA),
                        every_n=2).toPandas())
    # frames 0, 2, 4 sampled; each a real PPM of the composed canvas
    assert list(out["frame_idx"]) == [0, 2, 4]
    first = bytes(out["frame"][0])
    assert first.startswith(b"P6\n3 2\n255\n")
    assert first.endswith(bytes(palette[0]) * 6)
    last = bytes(out["frame"][2])
    assert last.endswith(bytes(palette[1]) * 6)


def test_malformed_known_magic_payloads_fall_back(spark):
    # regression (r3 review): truncated/corrupt payloads with a known
    # magic raised struct.error / zlib.error / IndexError / KeyError
    # through the task instead of taking the documented fallback
    from etl_portfolio_tracker_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_media, frame_sample, resize_media)
    bad = [
        (1, b"GIF87a"),                      # truncated header
        (2, b"GIF89a" + b"\x00" * 4),        # 10-byte header
        (3, b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x02IHDR\x01\x02"),
        (4, b"\x89PNG\r\n\x1a\n"             # corrupt IDAT
            + b"\x00\x00\x00\x0dIHDR"
            + b"\x00\x00\x00\x02\x00\x00\x00\x02\x08\x02\x00\x00\x00"
            + b"\x00" * 4
            + b"\x00\x00\x00\x04IDAT" + b"\xde\xad\xbe\xef" + b"\x00" * 4),
        (5, b"BM" + b"\x00" * 8),            # truncated BMP
        (6, b"P6\n2 2\n255\n"),              # truncated NetPBM
    ]
    # also a corrupt-LZW GIF: valid header + image block, garbage codes
    gif = bytearray(b"GIF87a")
    import struct as st
    gif += st.pack("<HH", 2, 2) + bytes([0x80, 0, 0]) + b"\x01\x02\x03" * 2
    gif += b"\x2c" + st.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
    gif += bytes([2]) + bytes([2, 0xFF, 0xFF]) + b"\x00\x3b"
    bad.append((7, bytes(gif)))
    rows = [(i, bytearray(b), "x", None, None) for i, b in bad]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    assert decode_media(df).count() == len(bad)        # no task crash
    assert resize_media(df).count() == len(bad)
    frame_sample(df).count()                           # completes


def test_png_zero_dims_and_bounded_inflate():
    import struct as st
    import zlib
    import numpy as np
    from etl_portfolio_tracker_spark.operators.multimodal import (
        DECODE_ERRORS, _decode_gif, _decode_png)
    import pytest
    def png(w, h, idat):
        def chunk(t, d):
            return (st.pack(">I", len(d)) + t + d
                    + st.pack(">I", zlib.crc32(t + d)))
        ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", idat) + chunk(b"IEND", b""))
    # zero-dimension header -> ValueError (fallback), never NaN luma
    with pytest.raises(DECODE_ERRORS):
        _decode_png(png(0, 0, zlib.compress(b"")))
    with pytest.raises(DECODE_ERRORS):
        _decode_gif(b"GIF87a" + st.pack("<HH", 0, 0) + b"\x00\x00\x00\x3b")
    # decompression bomb: 1x2 gray image whose IDAT inflates to 50 MB;
    # the bounded inflate must read only the 6 header-implied bytes
    bomb = zlib.compress(b"\x00\x01\x00\x02" + b"\x00" * (50_000_000 - 4))
    px = _decode_png(png(1, 2, bomb))
    assert px.shape == (2, 1, 3)
    assert px[0, 0, 0] == 1 and px[1, 0, 0] == 2
    assert isinstance(px, np.ndarray)
    # GIF decompression bomb: a ~30-byte payload claiming 60000x60000
    # would allocate a ~10.8 GB canvas before any LZW data is read —
    # the header guard must reject it (same 16M-pixel budget as PNG)
    with pytest.raises(DECODE_ERRORS):
        _decode_gif(b"GIF87a" + st.pack("<HH", 60000, 60000)
                    + bytes([0x80, 0, 0]) + b"\x00\x00\x00" * 2
                    + b"\x3b")
    # MemoryError is in DECODE_ERRORS as the backstop for anything
    # that slips past the header guards
    assert MemoryError in DECODE_ERRORS


def test_gif_descriptor_outside_screen_rejected():
    # a 1x1 logical screen passes the header guard, but an image
    # DESCRIPTOR claiming 65535x65535 would drive the LZW output
    # toward 4.3e9 entries before any canvas check — the descriptor
    # must fit inside the declared screen
    import struct as st
    import pytest
    from etl_portfolio_tracker_spark.operators.multimodal import (
        DECODE_ERRORS, _decode_gif)
    gif = bytearray(b"GIF87a")
    gif += st.pack("<HH", 1, 1) + bytes([0x80, 0, 0]) + b"\x01\x02\x03" * 2
    gif += b"\x2c" + st.pack("<HHHH", 0, 0, 65535, 65535) + b"\x00"
    gif += bytes([2]) + bytes([2, 0xFF, 0xFF]) + b"\x00\x3b"
    with pytest.raises(DECODE_ERRORS):
        _decode_gif(bytes(gif))
    # offset pushing an in-bounds-sized frame past the edge: rejected
    gif2 = bytearray(b"GIF87a")
    gif2 += st.pack("<HH", 4, 4) + bytes([0x80, 0, 0]) + b"\x01\x02\x03" * 2
    gif2 += b"\x2c" + st.pack("<HHHH", 3, 3, 2, 2) + b"\x00"
    gif2 += bytes([2]) + bytes([2, 0xFF, 0xFF]) + b"\x00\x3b"
    with pytest.raises(DECODE_ERRORS):
        _decode_gif(bytes(gif2))
