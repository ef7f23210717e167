"""ANN recall report: recall@k of the indexed routes vs the exact
brute-force top-k, on the real embeddings table.

Usage: PYTHONPATH=/root/repo python tools/ann_recall.py [sf_dir]

Reports, for the default 1%-of-corpus query set:

- ``ivf_topk`` at n_probe ∈ {2, 4, 8, 16} (16 = exhaustive ⇒ 1.0 by
  construction — the parity row);
- ``ivfpq_topk`` at the same probes with refine=20, plus refine=k
  (pure ADC ordering, no refine headroom) — the delta isolates how
  much the exact-refine stage recovers from quantization error.

The synthetic embeddings are near-orthogonal random vectors — the
WORST case for any bucketed ANN (no cluster structure to exploit), so
these are recall FLOORS: the information-free baseline for n_probe/C
coverage is n_probe/16, and anything above it is signal from the
coarse quantizer. Results for the committed table live in PLANS.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyield_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    ivfpq_topk,
    sq8_topk,
    train_codebooks,
)
from pyield_spark.session import get_session  # noqa: E402

K = 5


def pairs(df) -> set:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def clustered_corpus(spark, n=2000, k=16, dim=64):
    """Deterministic synthetic corpus WITH cluster structure (k
    well-separated centers + small per-vector jitter) — the regime
    real embedding corpora live in, where codebook TRAINING has signal
    to find. Built from spark.range so it is identical on every run."""
    from pyspark.sql import functions as F

    c = F.col("id") % k
    vec = F.array(*[
        (
            (100.0 * ((c * 13 + j) % 7)).cast("double")
            + ((F.col("id") * 31 + j * 17) % 23).cast("double") / 4.0
        )
        for j in range(dim)
    ])
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session("ann_recall")
    if sf_dir == "--clustered":
        emb = clustered_corpus(spark).localCheckpoint()
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = pairs(cosine_topk(emb, "vec_id", "embedding", k=K))
    print(f"corpus={emb.count()} queries={len(exact) // K} k={K}")

    # SQ8 (r9): per-dimension 8-bit scalar quantization — brute-force
    # compressed scan, so recall is probe-independent; report refine=20
    # and refine=K (pure quantized ordering) once
    r_sq20 = len(pairs(sq8_topk(emb, "vec_id", "embedding", k=K, refine=20))
                 & exact) / len(exact)
    r_sqk = len(pairs(sq8_topk(emb, "vec_id", "embedding", k=K, refine=K))
                & exact) / len(exact)
    print(f"sq8: refine20={r_sq20:.3f}  refineK={r_sqk:.3f}")
    # QT_4bit (r10): half the SQ8 scan payload, coarser codes — the
    # refine headroom matters more here (refineK isolates the raw
    # 4-bit ordering quality)
    r_s4_20 = len(pairs(sq8_topk(
        emb, "vec_id", "embedding", k=K, refine=20, bits=4)) & exact
    ) / len(exact)
    r_s4_k = len(pairs(sq8_topk(
        emb, "vec_id", "embedding", k=K, refine=K, bits=4)) & exact
    ) / len(exact)
    print(f"sq4: refine20={r_s4_20:.3f}  refineK={r_s4_k:.3f}")
    # RP (r10): Johnson–Lindenstrauss 64→16 projection — the
    # DIMS-reduction rung (scan does 16/64 of the multiply-adds);
    # refineK isolates the raw projected-space ordering
    from pyield_spark.operators.similarity import rp_topk

    r_rp20 = len(pairs(rp_topk(emb, "vec_id", "embedding", k=K, refine=20))
                 & exact) / len(exact)
    r_rpk = len(pairs(rp_topk(emb, "vec_id", "embedding", k=K, refine=K))
                & exact) / len(exact)
    r_rp8 = len(pairs(rp_topk(
        emb, "vec_id", "embedding", k=K, refine=20, out_dim=8)) & exact
    ) / len(exact)
    print(f"rp16: refine20={r_rp20:.3f}  refineK={r_rpk:.3f}  "
          f"rp8 refine20={r_rp8:.3f}")

    def recall(approx: set) -> float:
        return len(approx & exact) / len(exact)

    # trained codebooks: the FAISS train step (r8) — one bounded-sample
    # Lloyd per variant, then the same serve paths
    cb = train_codebooks(
        emb, "vec_id", "embedding", n_centroids=16, m=4, ks=16,
        sample=4096, iters=8,
    )
    cb_res = train_codebooks(
        emb, "vec_id", "embedding", n_centroids=16, m=4, ks=16,
        sample=4096, iters=8, by_residual=True,
    )
    # OPQ (r10): learned orthogonal rotation before the subspace split
    # (Ge 2013) on top of residual training — the rung that attacks the
    # PQ floor on dims the axis-aligned split leaves correlated
    cb_opq = train_codebooks(
        emb, "vec_id", "embedding", n_centroids=16, m=4, ks=16,
        sample=4096, iters=8, by_residual=True, opq_iters=4,
    )

    for n_probe in (2, 4, 8, 16):
        r_ivf = recall(pairs(ivf_topk(
            emb, "vec_id", "embedding", k=K,
            n_centroids=16, n_probe=n_probe,
        )))
        r_ivf_t = recall(pairs(ivf_topk(
            emb, "vec_id", "embedding", k=K, n_probe=n_probe, codebooks=cb,
        )))
        r_pq20 = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_centroids=16, n_probe=n_probe, m=4, ks=16, refine=20,
        )))
        r_pq20_t = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_probe=n_probe, m=4, refine=20, codebooks=cb,
        )))
        r_pq20_r = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_probe=n_probe, m=4, refine=20, codebooks=cb_res,
        )))
        r_pq20_o = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_probe=n_probe, m=4, refine=20, codebooks=cb_opq,
        )))
        r_pqk = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_centroids=16, n_probe=n_probe, m=4, ks=16, refine=K,
        )))
        r_pqk_r = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_probe=n_probe, m=4, refine=K, codebooks=cb_res,
        )))
        r_pqk_o = recall(pairs(ivfpq_topk(
            emb, "vec_id", "embedding", k=K,
            n_probe=n_probe, m=4, refine=K, codebooks=cb_opq,
        )))
        print(
            f"n_probe={n_probe:>2}  ivf={r_ivf:.3f}  ivf_trained={r_ivf_t:.3f}  "
            f"ivfpq20={r_pq20:.3f}  ivfpq20_trained={r_pq20_t:.3f}  "
            f"ivfpq20_resid={r_pq20_r:.3f}  ivfpq20_opq={r_pq20_o:.3f}  "
            f"ivfpqK={r_pqk:.3f}  ivfpqK_resid={r_pqk_r:.3f}  "
            f"ivfpqK_opq={r_pqk_o:.3f}"
        )


if __name__ == "__main__":
    main()
