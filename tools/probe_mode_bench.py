"""Measure the IVF probe modes against each other as the query increment
grows — the evidence behind SCALE.md §IVF's distributed-probe paragraph.

Synthesizes a clustered corpus (the driver's embeddings tables are tiny and
geometry-free), builds one persistent index, then probes increments of
growing size through BOTH modes, asserting row-identical results and
reporting wall-clock. Measured outcome (recorded in SCALE.md): distributed
wins locally from ~2.5k queries up — broadcast's per-batch GEMM against
every probing query plus the collect/broadcast transits grow linearly in
the increment, while distributed sits on a scheduling floor — and, the
100 TB requirement, its cost has no driver-heap term at any size.

Usage: PYTHONPATH=/root/repo python tools/probe_mode_bench.py
Env:   PROBE_BENCH_CORPUS (default 200_000), PROBE_BENCH_DIM (64),
       PROBE_BENCH_CLUSTERS (64), PROBE_BENCH_SIZES (2500,10000,40000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def synth(spark, n: int, dim: int, n_clusters: int, seed: int, id_base: int):
    """Clustered vectors as (vec_id, embedding, label), executor-generated."""
    import numpy as np
    import pandas as pd

    centers = np.random.default_rng(seed).normal(size=(n_clusters, dim)) * 10.0
    bc = spark.sparkContext.broadcast(centers)

    def gen(batches):
        C = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue  # small sizes leave some of the 32 parts empty
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(seed * 1_000_003 + int(ids[0]))
            lab = (ids % n_clusters).astype("int32")
            V = C[lab] + rng.normal(size=(len(ids), C.shape[1])) * 0.5
            yield pd.DataFrame(
                {
                    "vec_id": ids + id_base,
                    "embedding": [row.tolist() for row in V],
                    "label": lab,
                }
            )

    return (
        spark.range(n)
        .repartition(32)
        .mapInPandas(gen, schema="vec_id long, embedding array<double>, label int")
    )


def main() -> None:
    from php_ec_spark.session import get_spark

    n_corpus = int(os.environ.get("PROBE_BENCH_CORPUS", "200000"))
    dim = int(os.environ.get("PROBE_BENCH_DIM", "64"))
    n_clusters = int(os.environ.get("PROBE_BENCH_CLUSTERS", "64"))
    sizes = [
        int(s)
        for s in os.environ.get("PROBE_BENCH_SIZES", "2500,10000,40000").split(",")
    ]
    spark = get_spark(app_name="probe-mode-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # the prefix does NOT match sweep_stale_ivf_dirs' php_ec_ivf_<pid>
    # pattern, so without the try/finally below every run would leak a
    # ~100 MB 200k-vector index dir in /tmp permanently (round-12 ADVICE)
    idx = tempfile.mkdtemp(prefix="probe_mode_bench_")
    try:
        _run(spark, idx, n_corpus, dim, n_clusters, sizes)
    finally:
        shutil.rmtree(idx, ignore_errors=True)


def _run(spark, idx, n_corpus, dim, n_clusters, sizes) -> None:
    from php_ec_spark.operators.similarity import ivf_build, ivf_search

    corpus = synth(spark, n_corpus, dim, n_clusters, seed=1, id_base=0)
    t0 = time.perf_counter()
    ivf_build(corpus, idx)
    print(f"# build: corpus={n_corpus} dim={dim} C={n_clusters} "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    rows = []
    for n_q in sizes:
        inc = synth(spark, n_q, dim, n_clusters, seed=7, id_base=10_000_000)
        inc = inc.select("vec_id", "embedding").localCheckpoint()
        timings = {}
        counts = {}
        for mode in ("broadcast", "distributed"):
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                counts[mode] = ivf_search(
                    spark, idx, inc, k=5, nprobe=2, mode=mode
                ).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[mode] = round(best, 2)
        # ROW-identical, not just count-identical: a mode-divergence bug
        # can keep top-k counts equal while ids/cosines differ (untimed
        # — runs after the measured iterations)
        rows_of = {
            mode: {
                (r.query_id, r.rank, r.neighbor_id, r.cos)
                for r in ivf_search(
                    spark, idx, inc, k=5, nprobe=2, mode=mode
                ).collect()
            }
            for mode in ("broadcast", "distributed")
        }
        assert rows_of["broadcast"] == rows_of["distributed"], (
            "mode divergence at increment=%d" % n_q
        )
        assert counts["broadcast"] == counts["distributed"], counts
        rows.append(
            {
                "increment": n_q,
                "rows": counts["broadcast"],
                "broadcast_s": timings["broadcast"],
                "distributed_s": timings["distributed"],
            }
        )
        print(f"# increment={n_q}: broadcast {timings['broadcast']}s, "
              f"distributed {timings['distributed']}s "
              f"({counts['broadcast']} result rows)", file=sys.stderr)
    print(json.dumps({"corpus": n_corpus, "dim": dim, "C": n_clusters,
                      "rows": rows}))


if __name__ == "__main__":
    main()
