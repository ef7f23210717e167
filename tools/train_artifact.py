"""Regenerate ``pyield_spark/queries/ann_artifact.py`` — the pinned
IVF+residual-PQ codebooks ``q_ivfpq_trained`` (and its DuckDB oracle)
serve from.

Deterministic by construction (``train_codebooks``: 4096 lowest-
xxhash64 sf0.01 vectors, 8 Lloyd iterations, residual PQ), so
re-running against unchanged testdata reproduces the file byte-for-
byte. Run from the repo root:

    PYTHONPATH=/root/repo python tools/train_artifact.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyield_spark.operators.similarity import train_codebooks
from pyield_spark.queries import tables
from pyield_spark.session import get_session

OUT = "/root/repo/pyield_spark/queries/ann_artifact.py"
SF_DIR = "/root/testdata/sf0.01"

HEADER = '''"""Pinned ANN model artifact: IVF coarse centroids + residual-PQ
sub-codebooks trained ONCE by ``train_codebooks`` (deterministic
bounded-sample Lloyd: the 4096 lowest-xxhash64 vectors of the
sf0.01 embeddings corpus, 8 iterations, ``by_residual=True``) and
checked in as repr-exact double literals — the offline *train*
half of the FAISS train/add/search split, serving as a fixed model
artifact at every scale factor (regenerate: tools/train_artifact.py).

Both the Spark query (``q_ivfpq_trained``) and its DuckDB oracle
consume THESE literals, so the trained serve path sits inside the
bit-exact correctness gate: repr() floats round-trip to the same
IEEE double in Python, py4j and the SQL parser.
"""
'''


def main() -> None:
    spark = get_session()
    emb = tables(spark, SF_DIR, "embeddings")
    cb = train_codebooks(
        emb, "vec_id", "embedding", n_centroids=16, m=4, ks=16,
        dim=64, sample=4096, iters=8, by_residual=True,
    )
    lines = [HEADER, "# 16 x 64 coarse centroids", "COARSE = ["]
    for c in cb.coarse:
        lines.append("    [" + ", ".join(repr(float(x)) for x in c) + "],")
    lines += ["]", "", "# 4 subspaces x 16 codewords x 16 dims (residual-trained)",
              "PQ = ["]
    for s in cb.pq:
        lines.append("    [")
        for w in s:
            lines.append("        [" + ", ".join(repr(float(x)) for x in w) + "],")
        lines.append("    ],")
    lines += ["]", "", "BY_RESIDUAL = True", ""]
    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(cb.coarse)} centroids, "
          f"{len(cb.pq)}x{len(cb.pq[0])} codewords")


if __name__ == "__main__":
    main()
