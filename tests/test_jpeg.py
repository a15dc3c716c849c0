"""Baseline JPEG codec tests (X5 seam closure, round-10 verdict item
5): marker structure, closed-form DC roundtrips, gradient/PSNR bounds,
restart markers, 4:2:0, non-baseline rejection, and the Spark-side
encode→decode kernels that back ``multimodal_jpeg_roundtrip``."""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from sync_cosmos_db_spark.operators import jpeg as J


def _gradient(w: int, h: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return ((x * 3 + y * 2) % 256).astype(np.uint8)


def _smooth(w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return (128 + 60 * np.sin(xx / 9) + 50 * np.cos(yy / 7)) \
        .clip(0, 255).astype(np.uint8)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 10 * math.log10(255 ** 2 / max(mse, 1e-12))


# ---------------------------------------------------------------------------
# Container structure
# ---------------------------------------------------------------------------

def test_marker_structure():
    b = J.jpeg_encode(10, 6, bytes([77]) * 60, 1, quality=75)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    # SOF0 declares the right dimensions
    i = b.index(b"\xff\xc0")
    prec, h, w, nc = struct.unpack(">BHHB", b[i + 4:i + 10])
    assert (prec, h, w, nc) == (8, 6, 10, 1)


def test_encoder_deterministic_golden_bytes():
    img = _smooth(48, 32)
    b1 = J.jpeg_encode(48, 32, img.tobytes(), 1, quality=75)
    b2 = J.jpeg_encode(48, 32, img.tobytes(), 1, quality=75)
    assert b1 == b2
    # pinned: any change to tables, rounding, or entropy coding trips this
    assert hashlib.sha256(b1).hexdigest() == (
        "64912b64aa4c2928328ac2c3a890d2a82781f0dcf40608f3dd406b0e834662d2")


def test_quality_scaling_table():
    assert (J.scale_quant_table(J.QUANT_LUM, 100) == 1).all()
    assert (J.scale_quant_table(J.QUANT_LUM, 50) == J.QUANT_LUM).all()
    q10 = J.scale_quant_table(J.QUANT_LUM, 10)
    assert q10.max() == 255 and q10.min() >= 1  # clamped both ends


# ---------------------------------------------------------------------------
# Closed-form DC roundtrips (the property the registry oracle uses)
# ---------------------------------------------------------------------------

def test_solid_gray_quality100_exact_all_shapes():
    for v in (0, 7, 128, 200, 255):
        for (w, h) in [(8, 8), (13, 9), (1, 1), (17, 32)]:
            b = J.jpeg_encode(w, h, bytes([v]) * (w * h), 1, quality=100)
            W, H, nc, px = J.jpeg_decode(b)
            arr = np.frombuffer(px, dtype=np.uint8)
            assert (W, H, nc) == (w, h, 1)
            assert (arr == v).all()


def test_solid_gray_quality50_closed_form_every_value():
    """Every gray in [0, 255] decodes to EXACTLY the formula the
    ``multimodal_jpeg_roundtrip`` oracle recomputes in SQL:
    clamp(128 + 2·floor((v−128)/2 + 0.5)) — DC-only content quantized
    by the Annex K luminance DC step 16."""
    for v in range(256):
        b = J.jpeg_encode(11, 19, bytes([v]) * (11 * 19), 1, quality=50)
        _, _, _, px = J.jpeg_decode(b)
        arr = np.frombuffer(px, dtype=np.uint8)
        pred = min(255, max(0, 128 + 2 * math.floor((v - 128) / 2 + 0.5)))
        assert (arr == pred).all(), (v, pred)


# ---------------------------------------------------------------------------
# AC path / fidelity
# ---------------------------------------------------------------------------

def test_gradient_quality100_within_one():
    img = _gradient(64, 48)
    b = J.jpeg_encode(64, 48, img.tobytes(), 1, quality=100)
    w, h, nc, px = J.jpeg_decode(b)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(48, 64)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_smooth_psnr_by_quality_monotone():
    img = _smooth(96, 64)
    psnrs = []
    sizes = []
    for q in (30, 60, 90):
        b = J.jpeg_encode(96, 64, img.tobytes(), 1, quality=q)
        _, _, _, px = J.jpeg_decode(b)
        dec = np.frombuffer(px, dtype=np.uint8).reshape(64, 96)
        psnrs.append(_psnr(img, dec))
        sizes.append(len(b))
    assert psnrs[0] < psnrs[1] < psnrs[2]   # more quality, more fidelity
    assert sizes[0] < sizes[1] < sizes[2]   # ... and more bytes
    assert psnrs[0] > 25 and psnrs[2] > 40


def test_rgb_444_smooth_roundtrip():
    g = _smooth(48, 32)
    img = np.stack([g, g[::-1], ((g.astype(int) * 2) % 256)], -1) \
        .astype(np.uint8)
    b = J.jpeg_encode(48, 32, img.tobytes(), 3, quality=90)
    w, h, nc, px = J.jpeg_decode(b)
    assert (w, h, nc) == (48, 32, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(32, 48, 3)
    assert _psnr(img, dec) > 30


def test_rgb_420_solid_within_two():
    b = J.jpeg_encode(30, 22, bytes([180, 60, 200]) * 660, 3,
                      quality=100, subsample=True)
    w, h, nc, px = J.jpeg_decode(b)
    assert (w, h, nc) == (30, 22, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(22, 30, 3).astype(int)
    assert np.abs(dec - [180, 60, 200]).max() <= 2


def test_restart_markers_roundtrip_identical():
    img = _smooth(56, 40)
    plain = J.jpeg_encode(56, 40, img.tobytes(), 1, quality=75)
    rst = J.jpeg_encode(56, 40, img.tobytes(), 1, quality=75,
                        restart_interval=3)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert J.jpeg_decode(plain)[3] == J.jpeg_decode(rst)[3]


# ---------------------------------------------------------------------------
# Honest failure modes
# ---------------------------------------------------------------------------

def test_rejects_non_jpeg():
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_rejects_progressive_sof2():
    b = bytearray(J.jpeg_encode(8, 8, bytes(64), 1))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2                     # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="not baseline"):
        J.jpeg_decode(bytes(b))


def test_rejects_truncated_stream():
    b = J.jpeg_encode(24, 24, _smooth(24, 24).tobytes(), 1)
    with pytest.raises(ValueError):
        J.jpeg_decode(b[:len(b) // 2])


def test_encode_validates_args():
    with pytest.raises(ValueError, match="quality"):
        J.jpeg_encode(2, 2, bytes(4), 1, quality=0)
    with pytest.raises(ValueError, match="pixels"):
        J.jpeg_encode(2, 2, bytes(5), 1)
    with pytest.raises(ValueError, match="n_channels"):
        J.jpeg_encode(2, 2, bytes(8), 2)


def test_sniffer_identifies_jpeg():
    from sync_cosmos_db_spark.operators.multimodal import sniff_binary_type
    assert J.jpeg_encode(8, 8, bytes(64), 1)[:3] == b"\xff\xd8\xff"
    # the magic-byte sniffer in multimodal.py recognizes our output
    # (prefix FFD8FF is the JPEG magic it tests for)


# ---------------------------------------------------------------------------
# Spark kernels
# ---------------------------------------------------------------------------

def test_spark_jpeg_roundtrip_kernels(spark):
    params = spark.createDataFrame(
        [(1, 9, 7, 0), (2, 16, 16, 128), (3, 21, 5, 255), (4, 8, 8, 40)],
        "asset_id long, width int, height int, gray int")
    dec = J.decode_jpeg_assets(J.synth_jpeg_assets(params, quality=50))
    rows = {r["asset_id"]: r for r in dec.collect()}
    assert len(rows) == 4
    for aid, w, h, v in [(1, 9, 7, 0), (2, 16, 16, 128),
                         (3, 21, 5, 255), (4, 8, 8, 40)]:
        r = rows[aid]
        pred = min(255, max(0, 128 + 2 * math.floor((v - 128) / 2 + 0.5)))
        assert (r["width"], r["height"], r["n_components"]) == (w, h, 1)
        assert r["decode_ok"] and r["mean_px"] == float(pred)


def test_spark_decode_flags_corrupt_payload(spark):
    good = J.jpeg_encode(8, 8, bytes([9] * 64), 1)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a jpeg"))],
        "asset_id long, content binary")
    rows = {r["asset_id"]: r for r in J.decode_jpeg_assets(df).collect()}
    assert rows[1]["decode_ok"] is True
    assert rows[2]["decode_ok"] is False and rows[2]["width"] == 0


def test_decode_corrupt_inputs_always_valueerror():
    """Round-11 fuzz pin: EVERY malformed input fails as ValueError —
    the one type decode_jpeg_assets catches — never struct.error /
    KeyError / OverflowError / StopIteration (each observed escaping
    before the normalization wrapper), and implausible SOF dimensions
    are rejected instead of allocating a 4-billion-pixel plane."""
    import random

    good = J.jpeg_encode(24, 16, bytes((i % 256) for i in range(384)), 1)
    rng = random.Random(7)

    def probe(b: bytes) -> None:
        try:
            J.jpeg_decode(b)
        except ValueError:
            pass  # the contract

    for _ in range(200):
        probe(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400))))
        probe(b"\xff\xd8" + bytes(rng.randrange(256)
                                  for _ in range(rng.randrange(2, 300))))
    for cut in range(1, len(good), 3):
        probe(good[:cut])
    for i in range(2, len(good), 2):
        b = bytearray(good)
        b[i] ^= 0xFF
        probe(bytes(b))

    # dimension bomb: SOF rewritten to 65535x65535
    import struct
    bomb = bytearray(good)
    i = bomb.index(b"\xff\xc0")
    bomb[i + 5:i + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="max_pixels"):
        J.jpeg_decode(bytes(bomb))


def test_fill_bytes_before_marker_are_legal_padding():
    """T.81 B.1.1.2: any run of 0xFF bytes may pad the stream before a
    marker; the decoder must skip them, not read 0xFF as the marker
    byte and flag a valid file corrupt (ADVICE r11 low)."""
    img = _smooth(24, 16)
    good = J.jpeg_encode(24, 16, img.tobytes(), 1, quality=75)
    base = J.jpeg_decode(good)
    # pad before DQT, DHT and SOS markers with 1-4 fill bytes each
    padded = bytearray(good)
    for magic, n in ((b"\xff\xda", 4), (b"\xff\xc4", 2), (b"\xff\xdb", 1)):
        i = bytes(padded).index(magic)
        padded[i:i] = b"\xff" * n
    out = J.jpeg_decode(bytes(padded))
    assert out[0] == base[0] and out[1] == base[1]
    assert out[2] == base[2]


def test_multiscan_noninterleaved_fails_honestly():
    """A baseline file whose SOS covers fewer components than the frame
    (legal one-scan-per-component layout) must raise, not decode the Y
    scan and silently render Cb/Cr flat (ADVICE r11 medium)."""
    img = np.dstack([_smooth(16, 16)] * 3).astype(np.uint8)
    b = bytearray(J.jpeg_encode(16, 16, img.tobytes(), 3,
                                quality=75, subsample=False))
    i = bytes(b).index(b"\xff\xda")
    # SOS: FF DA | len(2) | ns | (cs, td/ta)*ns | ss se ah/al
    assert b[i + 4] == 3
    spectral = bytes(b[i + 4 + 1 + 6:i + 4 + 1 + 6 + 3])
    b[i + 2:i + 4] = struct.pack(">H", 8)          # new segment length
    b[i + 4] = 1                                   # ns: 3 -> 1
    b[i + 5:i + 4 + 1 + 6 + 3] = bytes(b[i + 5:i + 7]) + spectral
    with pytest.raises(ValueError, match="non-interleaved"):
        J.jpeg_decode(bytes(b))


def test_dimension_cap_bounds_single_task_memory():
    """ADVICE r11 low: the SOF area cap is 1<<24 (16.7 MP), keeping the
    vectorized IDCT's float64 peak per component bounded inside one
    Spark task; a 5000x4000 (20 MP) declaration must be rejected."""
    good = J.jpeg_encode(8, 8, bytes(64), 1)
    bomb = bytearray(good)
    i = bomb.index(b"\xff\xc0")
    bomb[i + 5:i + 9] = struct.pack(">HH", 4000, 5000)
    with pytest.raises(ValueError, match="max_pixels"):
        J.jpeg_decode(bytes(bomb))
    # the cap is a per-call knob (ADVICE r12: 20-45 MP camera files are
    # legitimate) — raising it past the declared area must get the
    # decode beyond the SOF gate (it then fails honestly on the
    # truncated scan data, not on the dimension check)
    with pytest.raises(ValueError) as ei:
        J.jpeg_decode(bytes(bomb), max_pixels=21_000_000)
    assert "max_pixels" not in str(ei.value)


def test_dimension_cap_boundary_exactly_at_cap_decodes():
    """r12 verdict item 6: a LEGAL file declaring exactly
    MAX_DECODE_PIXELS (4096x4096 = 1<<24) must decode — the cap is
    `> max_pixels`, not `>=`, and the guard must never reject the
    boundary itself."""
    img = np.full((4096, 4096), 128, dtype=np.uint8)
    b = J.jpeg_encode(4096, 4096, img.tobytes(), 1, quality=75)
    assert 4096 * 4096 == J.MAX_DECODE_PIXELS
    w, h, nc, px = J.jpeg_decode(b)
    assert (w, h, nc) == (4096, 4096, 1)
    dec = np.frombuffer(px, dtype=np.uint8)
    assert abs(int(dec[0]) - 128) <= 1 and abs(int(dec[-1]) - 128) <= 1


def test_fill_padded_multiscan_hits_multiscan_rejection():
    """r12 verdict item 6: 0xFF fill padding immediately before a
    truncated SOS must still route to the multi-scan honest rejection
    — the T.81 fill-byte skip (r12) and the multi-scan guard (r11)
    compose; padding must not re-route the failure into the corrupt/
    fill-byte path."""
    img = np.dstack([_smooth(16, 16)] * 3).astype(np.uint8)
    b = bytearray(J.jpeg_encode(16, 16, img.tobytes(), 3,
                                quality=75, subsample=False))
    i = bytes(b).index(b"\xff\xda")
    assert b[i + 4] == 3
    spectral = bytes(b[i + 4 + 1 + 6:i + 4 + 1 + 6 + 3])
    b[i + 2:i + 4] = struct.pack(">H", 8)          # new segment length
    b[i + 4] = 1                                   # ns: 3 -> 1
    b[i + 5:i + 4 + 1 + 6 + 3] = bytes(b[i + 5:i + 7]) + spectral
    b[i:i] = b"\xff" * 3                           # fill run before SOS
    with pytest.raises(ValueError, match="non-interleaved"):
        J.jpeg_decode(bytes(b))


def test_rgb_422_solid_within_two():
    b = J.jpeg_encode(30, 22, bytes([180, 60, 200]) * 660, 3,
                      quality=100, subsample="422")
    # SOF declares 2x1 sampling for component 1 (the decoder's only
    # untested legal (hs, vs) layout before this vector existed)
    i = b.index(b"\xff\xc0")
    assert b[i + 11] == 0x21
    w, h, nc, px = J.jpeg_decode(b)
    assert (w, h, nc) == (30, 22, 3)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(22, 30, 3).astype(int)
    assert np.abs(dec - [180, 60, 200]).max() <= 2


def test_rgb_422_smooth_roundtrip():
    img = np.dstack([_smooth(40, 24), np.flipud(_smooth(40, 24)),
                     255 - _smooth(40, 24)]).astype(np.uint8)
    b = J.jpeg_encode(40, 24, img.tobytes(), 3, quality=90,
                      subsample="422")
    w, h, nc, px = J.jpeg_decode(b)
    dec = np.frombuffer(px, dtype=np.uint8).reshape(24, 40, 3)
    assert _psnr(img, dec) > 30
    # 4:2:2 keeps full vertical chroma: it must beat 4:2:0 and trail
    # 4:4:4 in byte size on the same input at the same quality
    b420 = J.jpeg_encode(40, 24, img.tobytes(), 3, quality=90,
                         subsample="420")
    b444 = J.jpeg_encode(40, 24, img.tobytes(), 3, quality=90)
    assert len(b420) <= len(b) <= len(b444)


def test_subsample_mode_validation_and_aliases():
    img = np.dstack([_smooth(16, 16)] * 3).astype(np.uint8)
    with pytest.raises(ValueError, match="subsample"):
        J.jpeg_encode(16, 16, img.tobytes(), 3, subsample="411")
    # True and "420" are the same mode, byte for byte
    assert (J.jpeg_encode(16, 16, img.tobytes(), 3, subsample=True)
            == J.jpeg_encode(16, 16, img.tobytes(), 3, subsample="420"))
