"""Multimodal (image/audio/video) column plumbing.

Media ride as opaque ``binary`` columns with typed metadata structs —
the Spark-side schema, partitioning, and Arrow-batched UDF surface are
real; the actual decoders are stubbed (codec libraries are not in this
container) behind clearly-marked deterministic fakes so the pipeline
shape is testable end to end.

At 100 TB: binary payloads stay columnar in parquet (no driver
round-trips), decode/feature-extraction runs as ``mapInPandas`` over
Arrow batches (one python worker per partition, vectorized), and
metadata-only queries never touch the payload bytes thanks to parquet
column pruning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

FEATURE_DIM = 8

try:  # real decoders, if ever available in the deployment image
    import PIL.Image  # noqa: F401

    HAVE_IMAGE_CODECS = True
except Exception:  # pragma: no cover - container has no codec libs
    HAVE_IMAGE_CODECS = False


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


def decode_image(payload: bytes) -> object:
    """Decode one image payload. STUB: raises until codec libs exist.

    A codec-capable deployment replaces this (and ``featurize_image``)
    and sets ``HAVE_IMAGE_CODECS = True`` — ``extract_features`` then
    routes through the real path with NO other code change (the seam is
    exercised by tests/test_llm_ops.py's fake-codec test).
    """
    if not HAVE_IMAGE_CODECS:
        raise NotImplementedError(
            "image codecs not available in this container; "
            "extract_features uses the deterministic fake path"
        )
    raise NotImplementedError("real decode path not wired yet")


def featurize_image(img: object) -> list[float]:
    """Embed one decoded image into FEATURE_DIM floats. STUB: a real
    deployment swaps in the model forward pass (same seam as
    ``decode_image``)."""
    raise NotImplementedError("image embedding model not available")


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
        decode, featurize = decode_image, featurize_image

        def row_features(b: bytes) -> list[float]:
            return featurize(decode(b))
    else:
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

    FAKE decode: a "frame" is a fixed-size byte chunk of the payload
    (real containers need a demuxer this image lacks); the distributed
    shape is the real one — ``mapInPandas`` expands Arrow batches
    row→many without any driver involvement, payload bytes never leave
    the executors, and downstream per-frame ops (hashing, features)
    stay columnar. ``stride`` keeps every stride-th frame (frame_idx
    0, stride, 2·stride, …), the every-Nth-frame sampling a training
    pipeline uses to thin video.
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
) -> DataFrame:
    """Deterministic payload downsample — the resize slot of the
    pipeline (image → thumbnail).

    FAKE resize: keeps every ceil(n/target)-th byte (a real resize
    decodes and rescales pixels); the plumbing — Arrow-batched
    ``mapInPandas``, binary in/binary out, stable output size bound —
    is the real contract a decode-capable deployment drops into.
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
                stride = max(1, -(-len(b) // target_bytes))
                outs.append(b[::stride])
            yield pd.DataFrame({id_col: pdf[id_col], "resized": outs})

    return df.select(id_col, payload_col).mapInPandas(op, out_schema)
