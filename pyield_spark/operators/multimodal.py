"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata structs.
The Spark-side schema, partitioning, and Arrow-batched UDF surface are
real, and — since round 8 — so is the image decode: PNG and BMP
payloads decode through the stdlib-only codecs in ``imagecodec.py``
(zlib + struct, no external libraries) inside the same mapInPandas
kernels. Payloads that do NOT sniff as a supported image (e.g. the
text-packed payloads the registered oracle queries use) take the
clearly-marked deterministic fake path, which keeps every registered
query oracle-expressible while real media flows through real pixels.

At 100 TB: binary payloads stay columnar in parquet (no driver
round-trips), decode/feature-extraction runs as ``mapInPandas`` over
Arrow batches (one python worker per partition, vectorized), and
metadata-only queries never touch the payload bytes thanks to parquet
column pruning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from pyield_spark.operators.imagecodec import (
    RawImage,
    decode_image_bytes,
    encode_png,
    resize_nearest,
    sniff_format,
    split_png_stream,
)

FEATURE_DIM = 8

# Stdlib PNG/JPEG/BMP codecs are always available (imagecodec.py needs only
# zlib + struct). The flag remains the deployment seam: tests and
# codec-richer images swap decode_image/featurize_image/sniff_format at
# the module level and the kernels capture them at plan-build time.
HAVE_IMAGE_CODECS = True


def pack_binary_expr(text: str | Column) -> Column:
    """Encode text as a binary payload (stand-in for raw media bytes)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.encode(c, "UTF-8")


def ascii_payload_expr(text: str | Column, context: str = "payload") -> Column:
    """``pack_binary_expr`` with an inline ASCII assertion.

    Oracles that equate payload BYTES with CHAR CODES only hold for
    ASCII text; this packs the payload with an ``assert_true`` woven
    into the expression itself, so column pruning cannot drop the check
    (a standalone assert column would be pruned away) and a future
    non-ASCII document fails loudly instead of silently desyncing.
    """
    c = F.col(text) if isinstance(text, str) else text
    # NULL text passes the assertion (assert_true throws on null input,
    # not just false) and packs to NULL — matching pack_binary_expr and
    # the oracle guard's CASE, which both pass NULL through
    ok = F.assert_true(
        c.isNull() | (F.octet_length(c) == F.char_length(c)),
        F.lit(f"{context}: non-ASCII text — byte/codepoint equivalence broken"),
    )
    return F.when(ok.isNull(), F.encode(c, "UTF-8"))


def media_metadata_exprs(payload: str | Column) -> dict[str, Column]:
    """Typed metadata computed without decoding: byte length, sha256,
    a fake 'format' sniffed from the first byte."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return {
        "n_bytes": F.octet_length(c).cast("bigint"),
        "sha256": F.sha2(c, 256),
        # null payload -> null format (review fix: the bare otherwise()
        # branch labeled rows with no media at all as valid 'webp',
        # inconsistent with the null-propagating n_bytes/sha256)
        "format": F.when(
            c.isNotNull(),
            F.when(F.ascii(F.substring(c.cast("string"), 1, 1)) % 3 == 0, "png")
            .when(F.ascii(F.substring(c.cast("string"), 1, 1)) % 3 == 1, "jpeg")
            .otherwise("webp"),
        ),
    }


def decode_image(payload: bytes) -> RawImage:
    """Decode one image payload through the stdlib PNG/JPEG/BMP codecs
    (``imagecodec.py`` — zlib/struct only, no codec libraries).
    Raises ``ValueError`` on formats outside the supported subset;
    ``extract_features`` sniffs first and falls back to the fake path
    for non-image payloads, so only corrupt actual-image bytes raise.

    Deployment seam: a codec-richer image swaps this (and
    ``featurize_image``/``sniff_format``) at the module level — the
    kernels capture them at plan-build time (seam exercised by
    tests/test_round4_fixes.py)."""
    return decode_image_bytes(bytes(payload))


def featurize_image(img: RawImage) -> list[float]:
    """Embed one DECODED image into FEATURE_DIM deterministic floats —
    real pixel statistics (not byte moments): per-channel means,
    horizontal/vertical gradient energy, aspect, log-area. A learned
    model's forward pass swaps in at the same seam; these are honest
    hand features computed from actual decoded pixels, integer-summed
    then divided once so every value is a portable IEEE double
    (half-away rounding at 8dp, same contract as the fake path).
    """
    w, h, ch = img.width, img.height, img.channels
    n = w * h
    # integer-domain numpy sums (exact — int64 never overflows at
    # image sizes), then one double division: identical values to the
    # old byte loops, ~2 orders of magnitude faster
    a = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, w, ch)
    ch_sums = a.sum(axis=(0, 1), dtype=np.int64)
    means = [0.0, 0.0, 0.0, 0.0]
    for c in range(min(ch, 4)):
        means[c] = int(ch_sums[c]) / (255.0 * n)
    # gradient energy: mean |horizontal diff| and |vertical diff| over
    # all channels (integer sums — exact)
    ai = a.astype(np.int32)
    gh = int(np.abs(np.diff(ai, axis=1)).sum(dtype=np.int64)) if w > 1 else 0
    gv = int(np.abs(np.diff(ai, axis=0)).sum(dtype=np.int64)) if h > 1 else 0
    feats = [
        means[0], means[1], means[2], means[3],
        gh / (255.0 * max(1, (w - 1) * h * ch)),
        gv / (255.0 * max(1, w * (h - 1) * ch)),
        w / (w + h),
        math.log2(1.0 + n) / 32.0,
    ]
    return [math.floor(v * 1e8 + 0.5) / 1e8 for v in feats]


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in feature vector: byte histogram moments.

    Marked FAKE: replaces decode→model-embed with a reproducible
    function of the bytes so the distributed plumbing (schema, batch
    shape, partitioning) is fully exercised. Rounding is the portable
    half-away pround (values are non-negative), not python round() —
    so a SQL engine can replay the exact doubles.
    """
    n = len(payload) or 1
    return [
        math.floor(sum(payload[i::FEATURE_DIM]) / (255.0 * n) * 1e8 + 0.5) / 1e8
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the whole batch columnar; the per-row work is
    the (stubbed) decode+embed. Output: id, feature array.

    The decode/featurize path is resolved at PLAN-BUILD time on the
    driver (``HAVE_IMAGE_CODECS`` plus the module-level ``decode_image``
    / ``featurize_image``) and captured into the kernel closure — so a
    codec-capable deployment (or a test-injected fake codec) reaches the
    executors through the serialized closure, not through worker-side
    module state.
    """
    out_schema = f"{id_col} bigint, features array<double>"
    if HAVE_IMAGE_CODECS:
        # plan-build-time resolution (monkeypatchable seam); per-row
        # SNIFF routing: real images decode to real pixels, anything
        # else (text-packed payloads — what the oracle queries ship)
        # takes the deterministic fake, so registered queries stay
        # oracle-expressible while media gets true decode
        decode, featurize, sniff = decode_image, featurize_image, sniff_format

        def row_features(b: bytes) -> list[float]:
            if sniff(b):
                try:
                    return featurize(decode(b))
                except ValueError:
                    # sniffed as an image but outside the decoders'
                    # envelope (e.g. progressive JPEG — the sniff is
                    # format-level, the JPEG decoder baseline-only) or
                    # corrupt: degrade to the deterministic fallback
                    # instead of killing the stage (review fix; the
                    # curation-pipeline norm is skip, not crash)
                    return _fake_features(b)
            return _fake_features(b)
    else:  # pragma: no cover - stdlib codecs are always importable
        row_features = _fake_features

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue  # empty partition: a 0-row frame types the
                # list column float64, which Arrow can't cast to array
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # null payload -> null features (review fix:
                    # bytes(None) raised and killed the stage)
                    "features": [
                        row_features(bytes(b)) if b is not None else None
                        for b in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(op, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    stride: int = 2,
) -> DataFrame:
    """Frame sampling over video payloads: one input row → one output
    row per sampled frame (id, frame_idx, frame payload).

    REAL demux for concatenated-PNG streams (the container-free
    multi-frame transport this engine standardizes on for video: PNG
    frames appended back to back — ``imagecodec.split_png_stream``
    walks chunk lengths to each IEND, so every emitted frame is a
    complete decodable image). Payloads that don't sniff as PNG fall
    back to fixed-size byte chunks (the clearly-marked FAKE the
    oracle-backed query uses — real containers like MP4 need a demuxer
    outside this image's stdlib envelope). Either way the distributed
    shape is the real one — ``mapInPandas`` expands Arrow batches
    row→many without any driver involvement, payload bytes never leave
    the executors, and downstream per-frame ops (hashing, features,
    ``extract_features`` on the emitted frames) stay columnar.
    ``stride`` keeps every stride-th frame (frame_idx 0, stride,
    2·stride, …), the every-Nth-frame sampling a training pipeline
    uses to thin video.
    """
    if frame_bytes <= 0 or stride <= 0:
        raise ValueError("frame_bytes and stride must be positive")
    out_schema = f"{id_col} bigint, frame_idx int, frame binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # no media, no frames (review fix:
                    # bytes(None) raised and killed the stage)
                b = bytes(payload)
                if sniff_format(b) == "png":
                    members = split_png_stream(b)
                    for i in range(0, len(members), stride):
                        ids.append(rid)
                        idxs.append(i)
                        frames.append(members[i])
                    continue
                for i in range(0, (len(b) + frame_bytes - 1) // frame_bytes, stride):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(op, out_schema)


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    target_bytes: int = 32,
    target_w: int = 8,
    target_h: int = 8,
) -> DataFrame:
    """Payload downsample — the resize slot of the pipeline
    (image → thumbnail).

    REAL resize for payloads that sniff as PNG/JPEG/BMP: decode through the
    stdlib codecs, nearest-neighbor resample to ``target_w×target_h``,
    re-encode as a deterministic filter-0 PNG (bit-stable output —
    fixed zlib level, no ancillary chunks). Non-image payloads keep
    the clearly-marked FAKE byte-thinning (every ceil(n/target)-th
    byte) the oracle-backed query pins. Same plumbing either way:
    Arrow-batched ``mapInPandas``, binary in/binary out, bounded
    output size.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    out_schema = f"{id_col} bigint, resized binary"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for payload in pdf[payload_col]:
                if payload is None:
                    outs.append(None)  # review fix: bytes(None) raised
                    continue
                b = bytes(payload)
                if sniff_format(b):
                    try:
                        img = decode_image_bytes(b)
                    except ValueError:
                        img = None  # unsupported-variant/corrupt image
                        # payloads degrade to the byte-thin fallback
                        # instead of killing the stage (review fix)
                    if img is not None:
                        outs.append(
                            encode_png(resize_nearest(img, target_w, target_h))
                        )
                        continue
                stride = max(1, -(-len(b) // target_bytes))
                outs.append(b[::stride])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": outs})

    return df.select(id_col, payload_col).mapInPandas(op, out_schema)
