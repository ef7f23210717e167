"""Stdlib image codec correctness (operators/imagecodec.py) and the
real decode path through the multimodal mapInPandas kernels — the
round-8 replacement for the round-7 NotImplementedError stubs.

Golden strategy: PNGs are HAND-BUILT in the tests with raw
zlib/struct (independent of encode_png), one per filter type, with
pixel values chosen so each filter's reconstruction is non-trivial;
BMPs likewise byte-by-byte per the spec. The decoder must reproduce
the exact pixel buffers.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from pyield_spark.operators.imagecodec import (
    RawImage,
    decode_bmp,
    decode_image_bytes,
    decode_png,
    encode_png,
    resize_nearest,
    sniff_format,
    split_png_stream,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def build_png(width, height, ctype, scanlines, plte=None) -> bytes:
    """Hand-build a PNG from explicit (filter_byte + filtered_bytes)
    scanlines — independent of the library's encoder."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(scanlines)
    out = PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_filter0_gray():
    # 2x2 gray, filter None: pixels as-is
    png = build_png(2, 2, 0, [b"\x00\x0a\x14", b"\x00\x1e\x28"])
    img = decode_png(png)
    assert (img.width, img.height, img.channels) == (2, 2, 1)
    assert img.pixels == bytes([10, 20, 30, 40])


def test_png_filter1_sub_rgb():
    # 2x1 RGB, filter Sub: second pixel stored as delta from first
    # raw: (10,20,30), stored second = (5,6,7) -> actual (15,26,37)
    line = bytes([1, 10, 20, 30, 5, 6, 7])
    img = decode_png(build_png(2, 1, 2, [line]))
    assert img.pixels == bytes([10, 20, 30, 15, 26, 37])


def test_png_filter2_up():
    # 1x2 gray: row0 filter0 = 100; row1 filter Up stored 28 -> 128
    img = decode_png(build_png(1, 2, 0, [bytes([0, 100]), bytes([2, 28])]))
    assert img.pixels == bytes([100, 128])


def test_png_filter3_average():
    # 2x2 gray. row0: filter0 [10, 20]. row1: filter3 (Average):
    # px(0,1): left=0, up=10 -> recon = stored + (0+10)//2
    #   stored 7 -> 12;  px(1,1): left=12, up=20 -> stored 4 -> 20
    img = decode_png(
        build_png(2, 2, 0, [bytes([0, 10, 20]), bytes([3, 7, 4])])
    )
    assert img.pixels == bytes([10, 20, 12, 20])


def test_png_filter4_paeth():
    # 2x2 gray. row0: [10, 20]. row1 Paeth:
    # px(0,1): a=0,b=10,c=0 -> paeth=10; stored 5 -> 15
    # px(1,1): a=15,b=20,c=10 -> p=25, pa=10,pb=5,pc=15 -> b=20; stored 3 -> 23
    img = decode_png(
        build_png(2, 2, 0, [bytes([0, 10, 20]), bytes([4, 5, 3])])
    )
    assert img.pixels == bytes([10, 20, 15, 23])


def test_png_palette_expands_to_rgb():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    png = build_png(3, 1, 3, [bytes([0, 0, 1, 2])], plte=plte)
    img = decode_png(png)
    assert img.channels == 3
    assert img.pixels == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])


def test_png_rgba_and_gray_alpha():
    img = decode_png(build_png(1, 1, 6, [bytes([0, 1, 2, 3, 4])]))
    assert (img.channels, img.pixels) == (4, bytes([1, 2, 3, 4]))
    img = decode_png(build_png(1, 1, 4, [bytes([0, 9, 8])]))
    assert (img.channels, img.pixels) == (2, bytes([9, 8]))


def build_png_hdr(width, height, depth, ctype, interlace, raw, plte=None,
                  trns=None) -> bytes:
    """Hand-build a PNG with full IHDR control (depth/interlace) from
    already-filtered raw bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, interlace)
    out = PNG_SIG + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", trns)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_rejects_unsupported():
    # every unsupported branch pins its EXACT error (the documented
    # loud-rejection contract — no silent wrong answers)
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(build_png_hdr(1, 1, 16, 0, 0, b"\x00\x00\x01"))
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(build_png_hdr(1, 1, 8, 0, 2, b"\x00\x01"))
    with pytest.raises(ValueError, match="color type"):
        decode_png(build_png_hdr(1, 1, 8, 5, 0, b"\x00\x01"))
    with pytest.raises(ValueError, match="filter type 7"):
        decode_png(build_png_hdr(1, 1, 8, 0, 0, b"\x07\x01"))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" * 4)
    with pytest.raises(ValueError, match="truncated chunk"):
        decode_png(PNG_SIG + struct.pack(">I", 99) + b"IHDRxx")
    with pytest.raises(ValueError, match="without PLTE"):
        decode_png(build_png_hdr(1, 1, 8, 3, 0, b"\x00\x00"))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(build_png_hdr(1, 1, 8, 3, 0, b"\x00\x05",
                                 plte=bytes([1, 2, 3])))
    # color-key tRNS on gray/RGB: outside the subset, loud
    with pytest.raises(ValueError, match="tRNS on color type 0"):
        decode_png(build_png_hdr(1, 1, 8, 0, 0, b"\x00\x01",
                                 trns=b"\x00\x01"))
    # data length mismatches
    with pytest.raises(ValueError, match="data length"):
        decode_png(build_png_hdr(2, 2, 8, 0, 0, b"\x00\x01\x02"))


def test_png_trns_palette_expands_to_rgba():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    trns = bytes([10, 200])  # entries 0,1 translucent; entry 2 opaque
    png = build_png_hdr(3, 1, 8, 3, 0, bytes([0, 0, 1, 2]),
                        plte=plte, trns=trns)
    img = decode_png(png)
    assert img.channels == 4
    assert img.pixels == bytes(
        [255, 0, 0, 10, 0, 255, 0, 200, 0, 0, 255, 255]
    )


def adam7_raw(pixels, width, height, bpp):
    """Gather the 7 Adam7 passes from a full pixel buffer as filter-0
    scanlines — an independent (gather-side) construction of the
    stream the decoder scatters back."""
    grid = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for xs, ys, xstep, ystep in grid:
        for y in range(ys, height, ystep):
            row = bytearray([0])
            for x in range(xs, width, xstep):
                o = (y * width + x) * bpp
                row += pixels[o : o + bpp]
            if len(row) > 1:
                raw += row
    return bytes(raw)


def test_png_adam7_roundtrip():
    import random

    rnd = random.Random(42)
    for w, h, ctype, bpp in [(8, 8, 2, 3), (5, 3, 0, 1), (1, 1, 0, 1),
                             (9, 2, 6, 4), (2, 9, 4, 2)]:
        pixels = bytes(rnd.randrange(256) for _ in range(w * h * bpp))
        png = build_png_hdr(w, h, 8, ctype, 1, adam7_raw(pixels, w, h, bpp))
        img = decode_png(png)
        assert (img.width, img.height, img.channels) == (w, h, bpp)
        assert img.pixels == pixels, f"adam7 mismatch at {w}x{h} ct{ctype}"


def test_png_adam7_truncated_rejected():
    raw = adam7_raw(bytes(range(64)), 8, 8, 1)
    with pytest.raises(ValueError, match="truncated interlaced"):
        decode_png(build_png_hdr(8, 8, 8, 0, 1, raw[:-5]))
    with pytest.raises(ValueError, match="interlaced data length"):
        decode_png(build_png_hdr(8, 8, 8, 0, 1, raw + b"\x00"))


def build_bmp24(width, height, rows_bgr_topdown) -> bytes:
    """Hand-build a bottom-up 24-bit BMP from top-down BGR rows."""
    stride = (width * 3 + 3) & ~3
    body = b""
    for row in reversed(rows_bgr_topdown):  # bottom-up storage
        body += row + b"\x00" * (stride - len(row))
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def test_bmp24_bottom_up_bgr_to_rgb():
    # 2x2: top row (R, G), bottom row (B, white) — stored bottom-up BGR
    top = bytes([0, 0, 255]) + bytes([0, 255, 0])       # BGR: red, green
    bot = bytes([255, 0, 0]) + bytes([255, 255, 255])   # BGR: blue, white
    img = decode_bmp(build_bmp24(2, 2, [top, bot]))
    assert (img.width, img.height, img.channels) == (2, 2, 3)
    assert img.pixels == bytes(
        [255, 0, 0, 0, 255, 0] + [0, 0, 255, 255, 255, 255]
    )


def test_sniff_and_dispatch():
    png = build_png(1, 1, 0, [bytes([0, 42])])
    bmp = build_bmp24(1, 1, [bytes([1, 2, 3])])
    assert sniff_format(png) == "png"
    assert sniff_format(bmp) == "bmp"
    assert sniff_format(b"hello world, this is text") is None
    assert decode_image_bytes(png).pixels == bytes([42])
    assert decode_image_bytes(bmp).pixels == bytes([3, 2, 1])
    with pytest.raises(ValueError, match="unsupported"):
        decode_image_bytes(b"plain text payload")


def test_encode_png_roundtrip_and_deterministic():
    img = RawImage(3, 2, 3, bytes(range(18)))
    data1, data2 = encode_png(img), encode_png(img)
    assert data1 == data2  # bit-stable
    back = decode_png(data1)
    assert (back.width, back.height, back.channels) == (3, 2, 3)
    assert back.pixels == img.pixels


def test_resize_nearest_floor_mapping():
    # 4x4 gray with distinct values; 2x2 nearest picks (0,0),(2,0),(0,2),(2,2)
    img = RawImage(4, 4, 1, bytes(range(16)))
    out = resize_nearest(img, 2, 2)
    assert out.pixels == bytes([0, 2, 8, 10])
    # upscale 1x1 -> 2x2 replicates
    up = resize_nearest(RawImage(1, 1, 1, b"\x07"), 2, 2)
    assert up.pixels == b"\x07" * 4


def test_split_png_stream():
    f1 = build_png(1, 1, 0, [bytes([0, 1])])
    f2 = build_png(1, 1, 0, [bytes([0, 2])])
    f3 = build_png(1, 1, 0, [bytes([0, 3])])
    frames = split_png_stream(f1 + f2 + f3)
    assert frames == [f1, f2, f3]
    with pytest.raises(ValueError, match="signature"):
        split_png_stream(f1 + b"garbage")


# === through the Spark kernels ============================================


def test_extract_features_decodes_real_images(spark):
    """Real PNG/BMP payloads route through the stdlib decode to pixel
    statistics; a text payload in the same frame takes the fake path.
    Feature values are pinned against a hand computation from PIXELS.
    """
    from pyield_spark.operators import multimodal as mm

    # 2x1 gray PNG: pixels [0, 255] -> mean .5, gh = 255/255 = 1
    png = build_png(2, 1, 0, [bytes([0, 0, 255])])
    bmp = build_bmp24(1, 1, [bytes([0, 0, 255])])  # one red pixel
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)), (3, b"plain text")],
        "doc_id BIGINT, payload BINARY",
    )
    feats = {r["doc_id"]: r["features"] for r in
             mm.extract_features(df, "payload", "doc_id").collect()}
    import math
    r8 = lambda v: math.floor(v * 1e8 + 0.5) / 1e8
    assert feats[1] == [
        0.5, 0.0, 0.0, 0.0, 1.0, 0.0,
        r8(2 / 3), r8(math.log2(3.0) / 32.0),
    ]
    assert feats[2][:4] == [1.0, 0.0, 0.0, 0.0]  # red channel mean 255/255
    assert feats[3] == mm._fake_features(b"plain text")


def test_sample_frames_demuxes_png_stream(spark):
    """A concatenated-PNG payload demuxes into complete decodable
    frames (stride applied); a text payload still byte-chunks."""
    from pyield_spark.operators import multimodal as mm

    f = [build_png(1, 1, 0, [bytes([0, v])]) for v in (10, 20, 30, 40, 50)]
    stream = b"".join(f)
    df = spark.createDataFrame(
        [(1, bytearray(stream)), (2, b"x" * 130)],
        "doc_id BIGINT, payload BINARY",
    )
    out = mm.sample_frames(df, "payload", "doc_id", frame_bytes=64, stride=2)
    rows = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in out.collect()}
    assert {(1, 0), (1, 2), (1, 4), (2, 0), (2, 2)} == set(rows)
    for idx, val in ((0, 10), (2, 30), (4, 50)):
        assert decode_png(rows[(1, idx)]).pixels == bytes([val])
    assert rows[(2, 0)] == b"x" * 64


def test_resize_payload_real_thumbnail(spark):
    """An image payload resizes through decode → nearest → PNG
    re-encode (decodable, exact pixels); text keeps byte-thinning."""
    from pyield_spark.operators import multimodal as mm

    img = RawImage(4, 4, 1, bytes(range(16)))
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img))), (2, b"abcdefgh" * 8)],
        "doc_id BIGINT, payload BINARY",
    )
    out = {r["doc_id"]: bytes(r["resized"]) for r in
           mm.resize_payload(df, "payload", "doc_id", target_bytes=32,
                             target_w=2, target_h=2).collect()}
    thumb = decode_png(out[1])
    assert (thumb.width, thumb.height) == (2, 2)
    assert thumb.pixels == bytes([0, 2, 8, 10])
    assert out[2] == (b"abcdefgh" * 8)[::2]  # fake path: ceil(64/32)=2
