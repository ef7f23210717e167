"""Stdlib-only image codecs for the multimodal operators.

Real decoders — no codec libraries, just ``zlib`` + ``struct``
(both guaranteed in any Python):

- :func:`decode_png` — PNG (RFC 2083): 8-bit depth, color types 0
  (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five
  scanline filters (None/Sub/Up/Average/Paeth). Interlaced (Adam7)
  and 16-bit images are rejected with a clear error — a documented
  subset, not a silent wrong answer.
- :func:`decode_bmp` — BMP (BITMAPINFOHEADER), 24/32-bit uncompressed,
  top-down or bottom-up.
- :func:`encode_png` — filter-0 PNG writer (deterministic bytes:
  fixed zlib level, no ancillary chunks) so resize output and test
  goldens round-trip bit-exactly.
- :func:`resize_nearest` — nearest-neighbor resample (the classic
  ``src_idx = floor(dst_idx * src / dst)`` mapping).

This replaces the round-7 ``NotImplementedError`` stubs
(reference parity target: the multimodal decode slot of
SURVEY.md §2's training-data extensions). The decode work itself is
pure CPU over the payload bytes and runs INSIDE the Arrow-batched
``mapInPandas`` kernels in ``multimodal.py`` — executor-side,
per-partition, never on the driver.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@dataclass
class RawImage:
    """Decoded pixels: ``pixels`` is row-major, ``channels``
    interleaved, 8 bits per sample (palette PNGs are expanded to
    RGB)."""

    width: int
    height: int
    channels: int
    pixels: bytes

    def row(self, y: int) -> bytes:
        stride = self.width * self.channels
        return self.pixels[y * stride : (y + 1) * stride]


def sniff_format(data: bytes) -> str | None:
    """Codec sniff from magic bytes: 'png', 'bmp', or None."""
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM" and len(data) >= 26:
        return "bmp"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse PNG scanline filtering. ``bpp`` = bytes per pixel."""
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG data length {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_off = -stride
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + left) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + up) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + off + i] if y else 0
                out[off + i] = (line[i] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = out[off + i - bpp] if i >= bpp else 0
                up = out[prev_off + off + i] if y else 0
                ul = out[prev_off + off + i - bpp] if (y and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype} on row {y}")
    return out


def decode_png(data: bytes) -> RawImage:
    """Decode an 8-bit PNG (color types 0/2/3/4/6, non-interlaced)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    depth = ctype = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("PNG: truncated chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body + crc
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if depth != 8:
        raise ValueError(f"PNG: only 8-bit depth supported, got {depth}")
    if interlace:
        raise ValueError("PNG: interlaced (Adam7) images not supported")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {ctype}")
    if not idat:
        raise ValueError("PNG: no IDAT data")
    bpp = _CHANNELS[ctype]
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, bpp)
    if ctype == 3:  # palette → RGB
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            if idx * 3 + 2 >= len(plte):
                raise ValueError(f"PNG: palette index {idx} out of range")
            rgb[i * 3 : i * 3 + 3] = plte[idx * 3 : idx * 3 + 3]
        return RawImage(width, height, 3, bytes(rgb))
    return RawImage(width, height, bpp, bytes(pixels))


def decode_bmp(data: bytes) -> RawImage:
    """Decode an uncompressed 24/32-bit BMP (BITMAPINFOHEADER)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (px_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"BMP: unsupported header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bits = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise ValueError(f"BMP: compression {compression} not supported")
    if bits not in (24, 32):
        raise ValueError(f"BMP: only 24/32-bit supported, got {bits}")
    top_down = height < 0
    height = abs(height)
    src_bpp = bits // 8
    row_stride = (width * src_bpp + 3) & ~3  # rows pad to 4 bytes
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        row_off = px_off + src_y * row_stride
        if row_off + width * src_bpp > len(data):
            raise ValueError("BMP: truncated pixel data")
        for x in range(width):
            o = (y * width + x) * 3
            i = row_off + x * src_bpp
            # BMP stores BGR(A)
            out[o] = data[i + 2]
            out[o + 1] = data[i + 1]
            out[o + 2] = data[i]
    return RawImage(width, height, 3, bytes(out))


def decode_image_bytes(data: bytes) -> RawImage:
    """Decode via magic-byte sniff; raises ValueError on unknown
    formats (callers that want a fallback sniff first)."""
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError("unsupported image format (not PNG/BMP)")


_CTYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def encode_png(img: RawImage) -> bytes:
    """Deterministic filter-0 PNG writer (fixed zlib level 6, chunks
    IHDR/IDAT/IEND only — byte-stable across runs and platforms)."""
    if img.channels not in _CTYPE_FOR_CHANNELS:
        raise ValueError(f"cannot encode {img.channels}-channel image")
    stride = img.width * img.channels
    if len(img.pixels) != stride * img.height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    for y in range(img.height):
        raw.append(0)
        raw += img.pixels[y * stride : (y + 1) * stride]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", img.width, img.height, 8,
        _CTYPE_FOR_CHANNELS[img.channels], 0, 0, 0,
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(img: RawImage, dst_w: int, dst_h: int) -> RawImage:
    """Nearest-neighbor resample: src index = dst_idx·src_dim // dst_dim
    (floor mapping — deterministic, no float arithmetic at all)."""
    if dst_w <= 0 or dst_h <= 0:
        raise ValueError("target dimensions must be positive")
    ch = img.channels
    src_stride = img.width * ch
    out = bytearray(dst_w * dst_h * ch)
    for y in range(dst_h):
        sy = y * img.height // dst_h
        for x in range(dst_w):
            sx = x * img.width // dst_w
            so = sy * src_stride + sx * ch
            do = (y * dst_w + x) * ch
            out[do : do + ch] = img.pixels[so : so + ch]
    return RawImage(dst_w, dst_h, ch, bytes(out))


def split_png_stream(data: bytes) -> list[bytes]:
    """Demux a CONCATENATED-PNG stream (frames appended back to back —
    the container-free multi-frame transport ``sample_frames`` treats
    as video) into its member PNG payloads by walking chunk lengths to
    each IEND. Raises on trailing garbage so corruption is loud."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 8] != _PNG_SIG:
            raise ValueError(f"PNG stream: bad signature at offset {pos}")
        p = pos + 8
        while True:
            if p + 8 > len(data):
                raise ValueError("PNG stream: truncated frame")
            (length,) = struct.unpack(">I", data[p : p + 4])
            tag = data[p + 4 : p + 8]
            p += 12 + length
            if tag == b"IEND":
                break
        frames.append(data[pos:p])
        pos = p
    return frames
