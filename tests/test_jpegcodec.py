"""JPEG decoder tests: ANALYTIC goldens (hand-built streams whose IDCT
has a closed form evaluated independently with math.cos), round trips
against the independent test encoder (tools/jpeg_fixtures.py — its own
FDCT loop, its own bit writer), and the loud-reject envelope. No image
library exists in this container, so these two independent
implementations plus closed-form expectations ARE the golden source."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from pyield_spark.operators.imagecodec import decode_image_bytes, sniff_format
from pyield_spark.operators.jpegcodec import decode_jpeg
from tools.jpeg_fixtures import (
    K_AC_LUM,
    K_DC_LUM,
    ZIGZAG,
    _BitWriter,
    _codes,
    encode_jpeg,
)


def _minimal_gray_jpeg(emit_bits, q: int = 16, size: int = 8) -> bytes:
    """Hand-assemble a single-component baseline JPEG: flat quant table
    ``q``, standard Annex K luminance Huffman tables, one 8x8 block
    whose entropy bits ``emit_bits`` writes via the canonical codes."""
    out = bytearray(b"\xff\xd8")
    zz = bytes([0]) + bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", len(zz) + 2) + zz
    sof = struct.pack(">BHHB", 8, size, size, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (counts, symbols) in ((0, K_DC_LUM), (1, K_AC_LUM)):
        body = bytes([tc << 4]) + bytes(counts) + symbols
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    emit_bits(bw, _codes(*K_DC_LUM), _codes(*K_AC_LUM))
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_analytic_dc_only_block():
    """DC coefficient d with flat quant q decodes to the closed form
    clamp(floor(d*q/8 + 128.5)) on every pixel: d=+5, q=16 -> 138."""

    def emit(bw, dc, ac):
        c, ln = dc[3]  # category 3
        bw.put(c, ln)
        bw.put(0b101, 3)  # +5
        c, ln = ac[0x00]  # EOB
        bw.put(c, ln)

    img = decode_jpeg(_minimal_gray_jpeg(emit))
    assert (img.width, img.height, img.channels) == (8, 8, 1)
    px = np.frombuffer(img.pixels, np.uint8)
    assert (px == 138).all()  # floor(5*16/8 + 128 + .5)


def test_analytic_single_ac_coefficient():
    """S(0,1)=+2 with q=16: f(x,y) = (1/(2*sqrt(2)))*32*(1/2)*
    cos((2y+1)*pi/16) — columns follow the first DCT basis cosine,
    rows identical; expected computed independently here."""

    def emit(bw, dc, ac):
        c, ln = dc[0]  # DC category 0 (diff 0)
        bw.put(c, ln)
        c, ln = ac[0x02]  # run 0, size 2
        bw.put(c, ln)
        bw.put(0b10, 2)  # +2
        c, ln = ac[0x00]  # EOB
        bw.put(c, ln)

    img = decode_jpeg(_minimal_gray_jpeg(emit))
    px = np.frombuffer(img.pixels, np.uint8).reshape(8, 8)
    amp = 32.0 * (1.0 / (2.0 * math.sqrt(2.0))) * 0.5
    want = [
        int(min(255, max(0, math.floor(
            128.0 + amp * math.cos((2 * y + 1) * math.pi / 16.0) + 0.5
        ))))
        for y in range(8)
    ]
    assert px.tolist() == [want] * 8


def test_analytic_zigzag_placement():
    """A coefficient at zigzag position 2 must land at raster index 8 =
    S(1,0) — rows follow the cosine, columns identical (the transpose
    of the position-1 case): ZRL-free run of one zero then size 2."""

    def emit(bw, dc, ac):
        c, ln = dc[0]
        bw.put(c, ln)
        c, ln = ac[0x12]  # run 1 (skip zz pos 1), size 2
        bw.put(c, ln)
        bw.put(0b10, 2)  # +2 at zz pos 2 -> raster 8 -> S(1,0)
        c, ln = ac[0x00]
        bw.put(c, ln)

    assert ZIGZAG[2] == 8
    img = decode_jpeg(_minimal_gray_jpeg(emit))
    px = np.frombuffer(img.pixels, np.uint8).reshape(8, 8)
    amp = 32.0 * (1.0 / (2.0 * math.sqrt(2.0))) * 0.5
    want = [
        int(min(255, max(0, math.floor(
            128.0 + amp * math.cos((2 * x + 1) * math.pi / 16.0) + 0.5
        ))))
        for x in range(8)
    ]
    assert px.T.tolist() == [want] * 8


def _gradient(h, w):
    return ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 11) % 256
            ).astype(np.uint8)


def test_roundtrip_grayscale_odd_dims():
    img = _gradient(17, 24)  # exercises MCU padding + crop
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert (out.width, out.height, out.channels) == (24, 17, 1)
    dec = np.frombuffer(out.pixels, np.uint8).reshape(17, 24)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_roundtrip_quality100_flat_exact():
    flat = np.full((16, 16), 77, np.uint8)
    out = decode_jpeg(encode_jpeg(flat, quality=100))
    assert (np.frombuffer(out.pixels, np.uint8) == 77).all()


@pytest.mark.parametrize("subsample,bound", [("444", 8), ("420", 12)])
def test_roundtrip_color(subsample, bound):
    """Color round trip at high quality; chroma is constant per
    2x2-aligned cell so 4:2:0 box-averaging is lossless and the NN
    upsample reconstructs it exactly — the residual is pure chroma
    quantization (the cell steps are high-frequency in Cb/Cr, so the
    420 bound is a little looser than 444's)."""
    h, w = 18, 14
    rgb = np.zeros((h, w, 3), np.uint8)
    cell = ((np.arange(h)[:, None] // 2 * 3 + np.arange(w)[None, :] // 2 * 5)
            % 7)
    rgb[..., 0] = 60 + cell * 20
    rgb[..., 1] = 200 - cell * 15
    rgb[..., 2] = 30 + cell * 25
    out = decode_jpeg(encode_jpeg(rgb, quality=97, subsample=subsample))
    assert (out.width, out.height, out.channels) == (w, h, 3)
    dec = np.frombuffer(out.pixels, np.uint8).reshape(h, w, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= bound


def test_restart_intervals_match_plain():
    img = _gradient(17, 24)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    rst = decode_jpeg(encode_jpeg(img, quality=90, restart=2))
    assert plain.pixels == rst.pixels


def test_sniff_and_dispatch():
    data = encode_jpeg(_gradient(8, 8), quality=90)
    assert sniff_format(data) == "jpeg"
    img = decode_image_bytes(data)
    assert (img.width, img.height) == (8, 8)


def test_loud_rejects():
    base = encode_jpeg(_gradient(8, 8), quality=90)

    def swap_sof(marker):
        i = base.index(b"\xff\xc0")
        return base[:i] + b"\xff" + bytes([marker]) + base[i + 2:]

    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(swap_sof(0xC2))
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg(swap_sof(0xC9))
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg(swap_sof(0xC3))
    # 16-bit DQT
    i = base.index(b"\xff\xdb")
    bad = bytearray(base)
    bad[i + 4] = 0x10  # Pq=1
    with pytest.raises(ValueError, match="16-bit DQT"):
        decode_jpeg(bytes(bad))
    # 12-bit precision
    i = base.index(b"\xff\xc0")
    bad = bytearray(base)
    bad[i + 4] = 12
    with pytest.raises(ValueError, match="12-bit precision"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x00\x01\x02")
    # 4-component frame (e.g. Adobe CMYK)
    with pytest.raises(ValueError, match="4-component"):
        i = base.index(b"\xff\xc0")
        seglen = struct.unpack(">H", base[i + 2 : i + 4])[0]
        body = bytearray(base[i + 4 : i + 2 + seglen])
        body[5] = 4
        body += bytes([2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0])
        patched = (base[:i + 2] + struct.pack(">H", len(body) + 2)
                   + bytes(body) + base[i + 2 + seglen:])
        decode_jpeg(patched)


def test_unsupported_and_corrupt_jpegs_degrade_not_crash(spark):
    """The sniff envelope ('any JPEG') is wider than the decode
    envelope ('baseline Huffman'): a progressive JPEG or a truncated
    stream in the corpus must take the deterministic fallback inside
    the kernels, never kill the stage (review fix) — and raw
    decode_jpeg surfaces every corruption as ValueError, including the
    IndexError/struct.error classes a mid-parse failure raises."""
    from pyield_spark.operators.multimodal import (
        _fake_features,
        extract_features,
        resize_payload,
    )

    base = encode_jpeg(_gradient(8, 8), quality=90)
    i = base.index(b"\xff\xc0")
    progressive = base[:i] + b"\xff\xc2" + base[i + 2:]
    truncated = base[: len(base) // 2]
    for bad in (progressive, truncated, b"\xff\xd8\xff",
                b"\xff\xd8\xff\xdb\x00"):
        assert sniff_format(bad) == "jpeg"
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    df = spark.createDataFrame(
        [(1, bytearray(progressive)), (2, bytearray(truncated))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in
            extract_features(df, "payload", "doc_id").collect()}
    assert list(rows[1]["features"]) == list(_fake_features(progressive))
    assert list(rows[2]["features"]) == list(_fake_features(truncated))
    rz = {r["doc_id"]: bytes(r["resized"]) for r in
          resize_payload(df, "payload", "doc_id").collect()}
    assert rz[1] and rz[2]  # byte-thin fallback, stage alive


def test_extract_features_routes_jpeg(spark):
    """The multimodal kernel's sniff now routes JPEG payloads through
    the REAL decode path (features from true pixels, not the fake) —
    the r9 'all real corpora fall to the fake path' gap."""
    from pyield_spark.operators.multimodal import (
        _fake_features,
        extract_features,
    )

    data = encode_jpeg(_gradient(16, 16), quality=90)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, payload binary")
    row = extract_features(df, "payload", "doc_id").collect()[0]
    assert row["features"] is not None
    assert list(row["features"]) != list(_fake_features(data))
