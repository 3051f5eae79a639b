"""ANN recall harness: recall@k of the persistent IVF index against the
exact top-k, swept over nprobe — the quality meter behind SCALE.md §IVF's
recall table (round-12 verdict #5: ivf_search quality was pinned only on
deterministic gate geometry; a kernel change could degrade RECALL — not
just determinism — without any test noticing).

Geometry: Gaussian clusters with noise scaled relative to center
separation — the regime IVF is built for (SemDeDup/embedding-dedup
corpora cluster by construction; a geometry-free uniform corpus bounds
recall at nprobe/C no matter the implementation, which measures the
corpus, not the index). The quantizer is TRAINED (`ivf_build
n_clusters=`, the sample-trained spherical k-means path), deliberately
not the oracle labels — recall then includes quantizer quality, the
thing a production build actually ships. Ground truth is
:func:`cosine_topk` (exact GEMM + JVM fold re-rank).

Recall@k per query = |ivf top-k ∩ exact top-k| / k, averaged; ties at
the k-th boundary are broken identically (cos DESC, neighbor_id) in both
engines, so set intersection is fair.

Usage: PYTHONPATH=/root/repo python tools/ann_recall.py
Env:   ANN_RECALL_N (default 4000), ANN_RECALL_DIM (32),
       ANN_RECALL_CLUSTERS (16), ANN_RECALL_QUERIES (64),
       ANN_RECALL_K (10), ANN_RECALL_SEEDS (7,23),
       ANN_RECALL_NOISE (0.35 — fraction of the RMS center norm)
Prints one markdown table per seed plus a JSON line per (seed, nprobe).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NPROBES = (1, 2, 4, 8)


def synth_rows(seed: int, n: int, dim: int, n_centers: int, noise: float):
    """(vec_id, embedding) rows with Gaussian cluster structure; noise is
    relative to the RMS center norm so the geometry is scale-free."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim))
    sigma = noise * float(np.sqrt((centers**2).sum(axis=1).mean()))
    assign = rng.integers(n_centers, size=n)
    V = centers[assign] + rng.normal(size=(n, dim)) * sigma
    return [(i, [float(x) for x in V[i]]) for i in range(n)]


def recall_sweep(
    spark,
    seed: int,
    n: int = 4000,
    dim: int = 32,
    n_centers: int = 16,
    n_queries: int = 64,
    k: int = 10,
    noise: float = 0.35,
    nprobes=NPROBES,
    index_clusters: int | None = None,
) -> dict[int, float]:
    """Build corpus + trained-quantizer index, return {nprobe: recall@k}.

    Queries are the first ``n_queries`` corpus rows (self-match excluded
    by both engines, so each query's true neighbors are its cluster
    mates). ``index_clusters`` defaults to the generating center count —
    the honest setting; pass more/fewer to study quantizer mismatch.
    """
    from pyspark.sql import functions as F

    from php_ec_spark.operators.similarity import (
        cosine_topk,
        ivf_build,
        ivf_search,
    )

    if n_queries <= 0:
        raise ValueError(
            f"recall_sweep: n_queries must be positive, got {n_queries} "
            "(recall over zero queries is undefined)"
        )
    if index_clusters is not None and index_clusters <= 0:
        raise ValueError(
            f"recall_sweep: index_clusters must be positive, got "
            f"{index_clusters} (omit it to train n_centers clusters)"
        )
    rows = synth_rows(seed, n, dim, n_centers, noise)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)
    queries = df.filter(F.col("vec_id") < n_queries).localCheckpoint(
        eager=True
    )
    exact = {}
    for r in cosine_topk(df, queries, k=k).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)

    tmp = tempfile.mkdtemp(prefix=f"ann_recall_{seed}_")
    out: dict[int, float] = {}
    try:
        idx = f"{tmp}/idx"
        ccol = ivf_build(
            df, idx,
            n_clusters=index_clusters if index_clusters is not None
            else n_centers,
        )
        for nprobe in nprobes:
            got = {}
            for r in ivf_search(
                spark, idx, queries, k=k, nprobe=nprobe, cluster_col=ccol
            ).collect():
                got.setdefault(r.query_id, set()).add(r.neighbor_id)
            hits = sum(
                len(exact[q] & got.get(q, set())) for q in exact
            )
            out[nprobe] = hits / sum(len(v) for v in exact.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    from php_ec_spark.session import get_spark

    n = int(os.environ.get("ANN_RECALL_N", "4000"))
    dim = int(os.environ.get("ANN_RECALL_DIM", "32"))
    n_centers = int(os.environ.get("ANN_RECALL_CLUSTERS", "16"))
    n_queries = int(os.environ.get("ANN_RECALL_QUERIES", "64"))
    k = int(os.environ.get("ANN_RECALL_K", "10"))
    noise = float(os.environ.get("ANN_RECALL_NOISE", "0.35"))
    seeds = [
        int(s)
        for s in os.environ.get("ANN_RECALL_SEEDS", "7,23").split(",")
    ]

    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"| seed | n | dim | C | noise | "
        + " | ".join(f"recall@{k} np={p}" for p in NPROBES)
        + " |"
    )
    print("|---" * (5 + len(NPROBES)) + "|")
    for seed in seeds:
        rec = recall_sweep(
            spark, seed, n=n, dim=dim, n_centers=n_centers,
            n_queries=n_queries, k=k, noise=noise,
        )
        print(
            f"| {seed} | {n} | {dim} | {n_centers} | {noise} | "
            + " | ".join(f"{rec[p]:.3f}" for p in NPROBES)
            + " |"
        )
        for p in NPROBES:
            print(json.dumps({
                "seed": seed, "n": n, "dim": dim, "clusters": n_centers,
                "noise": noise, "k": k, "nprobe": p,
                "recall": round(rec[p], 4),
            }), file=sys.stderr)


if __name__ == "__main__":
    main()
