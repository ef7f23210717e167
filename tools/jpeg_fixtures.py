"""Test-fixture baseline JPEG ENCODER — deliberately independent of
``operators/jpegcodec.py`` (shares no code with the decoder beyond
numpy): ITU-T T.81 Annex K quantization + Huffman tables, libjpeg
quality scaling, forward DCT built from its own cosine loop, its own
canonical-code assignment and bit writer. Used by
``tests/test_jpegcodec.py`` for round-trip goldens (no image library
exists in this environment to generate fixtures) and by the PLANS.md
throughput lap to synthesize corpora.

Grayscale (1 component, 4:4:4) and color (3 components, 4:4:4 or
4:2:0 box-averaged chroma), optional restart intervals.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# T.81 Annex K.1 quantization tables (raster order)
K_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
K_CHR_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# T.81 Annex K.3 typical Huffman tables: (BITS counts[16], HUFFVAL)
K_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
K_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
K_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
K_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _codes(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def align(self):
        while self.nacc:
            self.put(1, 1)  # pad with 1-bits per T.81


def _fdct(block: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT from its own cosine loop (independent of the
    decoder's basis matrix)."""
    out = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for v in range(8):
            cv = math.sqrt(0.5) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * math.cos(
                        (2 * x + 1) * u * math.pi / 16
                    ) * math.cos((2 * y + 1) * v * math.pi / 16)
            out[u, v] = 0.25 * cu * cv * s
    return out


def _cat(v: int) -> int:
    """Magnitude category (bit length of |v|)."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magbits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(bw, coef_zz, pred, dc_codes, ac_codes):
    diff = coef_zz[0] - pred
    t = _cat(diff)
    c, ln = dc_codes[t]
    bw.put(c, ln)
    if t:
        bw.put(_magbits(diff, t), t)
    run = 0
    last = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last = k
            break
    for k in range(1, last + 1):
        v = coef_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        s = _cat(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(_magbits(v, s), s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return coef_zz[0]


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw))
    padded[:h, :w] = plane
    padded[h:, :w] = plane[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    return padded


def _dht_segment(tc, th, counts, symbols):
    body = bytes([(tc << 4) | th]) + bytes(counts) + symbols
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq, tbl_raster):
    zz = bytes(int(tbl_raster[ZIGZAG[i]]) for i in range(64))
    body = bytes([tq]) + zz
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF forward transform, floor(x+0.5) rounding (float in, float
    out in [0, 255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.floor(np.stack([y, cb, cr], axis=-1) + 0.5), 0.0, 255.0
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: str = "444",
    restart: int = 0,
) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG. ``subsample`` is '444' or '420' (box-averaged
    chroma). ``restart`` inserts RSTn markers every N MCUs."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = scaled_q(K_LUM_Q, quality)
    qc = scaled_q(K_CHR_Q, quality)

    if gray:
        planes = [img]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = rgb_to_ycbcr(img)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample == "444":
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsample == "420":
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            pad = np.empty((ph, pw, 2))
            pad[:h, :w, 0], pad[:h, :w, 1] = cb, cr
            pad[h:, :w] = pad[h - 1 : h, :w]
            pad[:, w:] = pad[:, w - 1 : w]
            half = pad.reshape(ph // 2, 2, pw // 2, 2, 2).mean(axis=(1, 3))
            planes = [
                y,
                np.floor(half[..., 0] + 0.5),
                np.floor(half[..., 1] + 0.5),
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError(f"subsample {subsample!r} not supported")
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qts = [ql, qc]

    # per-component zigzag-quantized blocks, MCU-padded
    comps = []
    for p, (hs, vs), qi in zip(planes, samp, qsel):
        padded = _plane_blocks(p)
        need_h, need_w = mcuy * vs * 8, mcux * hs * 8
        full = np.empty((need_h, need_w))
        ph, pw = padded.shape
        full[:ph, :pw] = padded
        full[ph:, :pw] = padded[ph - 1 : ph, :]
        full[:, pw:] = full[:, pw - 1 : pw]
        nby, nbx = need_h // 8, need_w // 8
        zzq = np.empty((nby, nbx, 64), dtype=np.int64)
        for byi in range(nby):
            for bxi in range(nbx):
                blk = full[byi * 8 : byi * 8 + 8, bxi * 8 : bxi * 8 + 8]
                s = _fdct(blk - 128.0)
                q = qts[qi].reshape(8, 8)
                sq = np.floor(np.abs(s) / q + 0.5) * np.sign(s)
                raster = sq.reshape(64).astype(np.int64)
                zzq[byi, bxi] = raster[ZIGZAG]
        comps.append({"h": hs, "v": vs, "blocks": zzq, "q": qi, "pred": 0})

    dc_l = _codes(*K_DC_LUM)
    ac_l = _codes(*K_AC_LUM)
    dc_c = _codes(*K_DC_CHR)
    ac_c = _codes(*K_AC_CHR)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    nf = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nf)
    for ci in range(nf):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, *K_DC_LUM)
    out += _dht_segment(1, 0, *K_AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, *K_DC_CHR)
        out += _dht_segment(1, 1, *K_AC_CHR)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sos = bytes([nf])
    for ci in range(nf):
        tsel = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, tsel])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                for c in comps:
                    c["pred"] = 0
            for ci, c in enumerate(comps):
                dc = dc_l if ci == 0 else dc_c
                ac = ac_l if ci == 0 else ac_c
                for byi in range(c["v"]):
                    for bxi in range(c["h"]):
                        blk = c["blocks"][my * c["v"] + byi, mx * c["h"] + bxi]
                        c["pred"] = _encode_block(bw, blk, c["pred"], dc, ac)
            mcu_count += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
