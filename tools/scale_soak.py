"""Empirical scale soak for the heavy pipeline plans (SCALE.md generator).

The 100 TB design claims in VERDICT/PLANS rest on plan shape; this tool
turns them into measurements: it synthesizes m× copies of the sf0.1
`documents` corpus (perturbed so near-dup DENSITY stays constant — see
`synthesize`), runs the five heaviest pipeline queries at each scale,
and reports wall time, output rows, and the fitted scaling exponent
alpha where t ~ N^alpha (alpha ≈ 1 ⇒ linear, the scale-safe target;
alpha ≈ 2 ⇒ an all-pairs term survived somewhere).

Usage:
    PYTHONPATH=/root/repo python tools/scale_soak.py \
        [--scales 1,3,10] [--iters 3] [--sf-dir /root/testdata/sf0.1] \
        [--workdir /tmp/scale_soak] [--md SCALE.md]

Corpus synthesis keeps duplicate density constant across scales:
- copy 0 is the original corpus; doc_id -> doc_id*100 + copy keeps ids
  disjoint and deterministic.
- in copy c>0 every token at position i with i % 8 == c % 8 is replaced
  by a copy-salted token. Replacing ~1/8 of tokens kills ~3/8 of the
  3-token shingles shared with any other copy, dropping cross-copy
  Jaccard to ~0.45 — far below the 0.8 threshold — while each copy
  keeps its planted intra-copy duplicates verbatim (identical texts get
  identical perturbation within a copy). So pair/cluster COUNTS scale
  ~linearly with N by construction, and any super-linear runtime is the
  plan's doing, not the data's. (sf0.1 has no docs under 8 tokens, so
  every copy of every doc is perturbed — verified min 10 tokens.)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "pipe_jaccard_pairs",
    "pipe_minhash_lsh",
    "pipe_dedup_clusters",
    "pipe_simhash",
    "pipe_pack_sequences",
)


def synthesize(spark, sf_dir: str, scale: int, out_dir: str) -> str:
    """Write a scale× documents.parquet under out_dir/x{scale} and return
    that directory (other tables are not needed by the soaked queries)."""
    from pyspark.sql import functions as F

    dst = os.path.join(out_dir, f"x{scale}")
    dest_parquet = os.path.join(dst, "documents.parquet")
    if os.path.exists(dest_parquet):
        return dst
    os.makedirs(dst, exist_ok=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if scale == 1:
        docs.write.mode("overwrite").parquet(dest_parquet)
        return dst
    copies = spark.range(scale).withColumnRenamed("id", "copy")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    perturbed = F.array_join(
        F.transform(
            toks,
            lambda x, i: F.when(
                i % F.lit(8) == F.col("copy") % 8,
                F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("q"), x),
            ).otherwise(x),
        ),
        " ",
    )
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") * 100 + F.col("copy")).alias("doc_id"),
        F.when(F.col("copy") == 0, F.col("text"))
        .otherwise(perturbed)
        .alias("text"),
        "lang",
        "source",
        F.length(
            F.when(F.col("copy") == 0, F.col("text")).otherwise(perturbed)
        ).alias("n_chars"),
    )
    # spread write parallelism so the 10x read side starts well-partitioned
    big.repartition(32).write.mode("overwrite").parquet(dest_parquet)
    return dst


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/scale_soak")
    ap.add_argument("--md", default=None, help="write SCALE.md here")
    ap.add_argument("--keep", action="store_true", help="keep synthesized parquet")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from php_ec_spark.catalog import all_queries
    from php_ec_spark.session import get_spark, release_checkpoint_caches

    spark = get_spark(app_name="php-ec-spark-scale-soak")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    results: dict[str, dict[int, dict]] = {q: {} for q in QUERIES}
    n_docs: dict[int, int] = {}
    for scale in scales:
        sdir = synthesize(spark, args.sf_dir, scale, args.workdir)
        n_docs[scale] = spark.read.parquet(
            os.path.join(sdir, "documents.parquet")
        ).count()
        print(f"# scale {scale}x: {n_docs[scale]} docs", file=sys.stderr)
        for name in QUERIES:
            best, rows = None, 0
            for _ in range(args.iters):
                t0 = time.perf_counter()
                rows = qs[name].spark(spark, sdir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_checkpoint_caches(spark)
            results[name][scale] = {"sec": round(best, 3), "rows": rows}
            print(
                f"# {name} @ {scale}x: {best:.3f}s ({rows} rows)",
                file=sys.stderr,
            )

    lo, hi = scales[0], scales[-1]
    lines = [
        "# SCALE — measured scaling of the heavy pipeline plans",
        "",
        f"Generated by `tools/scale_soak.py` on a local[32] session; corpus = "
        f"sf0.1 `documents` replicated with constant duplicate density "
        f"(see the tool docstring for the perturbation scheme). Times are "
        f"min-of-{args.iters} seconds; `alpha` is the fitted exponent of "
        f"t ~ N^alpha between {lo}x ({n_docs[lo]} docs) and {hi}x "
        f"({n_docs[hi]} docs) — alpha <= ~1.1 means the plan grew linearly "
        f"with the corpus, the scale-safe target; output rows scale "
        f"linearly by construction, so a super-linear alpha would be the "
        f"plan's fault, not the data's.",
        "",
        "| query | " + " | ".join(f"{s}x sec (rows)" for s in scales) + " | alpha |",
        "|---|" + "---|" * (len(scales) + 1),
    ]
    summary = {}
    for name in QUERIES:
        r = results[name]
        alpha = math.log(r[hi]["sec"] / r[lo]["sec"]) / math.log(
            n_docs[hi] / n_docs[lo]
        )
        summary[name] = round(alpha, 3)
        cells = " | ".join(
            f"{r[s]['sec']:.2f} ({r[s]['rows']})" for s in scales
        )
        lines.append(f"| {name} | {cells} | {alpha:.2f} |")
    lines += [
        "",
        "Row counts growing ~x{:.0f} from {}x to {}x confirm constant dup "
        "density for the Jaccard-threshold queries (pairs/clusters scale "
        "with N, not N^2). pipe_simhash rows under-scale slightly by "
        "design: its hamming-1..3 'loose' pairs between non-identical "
        "docs drift apart under the copy perturbation, while exact-dup "
        "pairs replicate; runtime scaling is still the metric.".format(
            hi / lo, lo, hi
        ),
        "",
        "```json",
        json.dumps(
            {"n_docs": n_docs, "results": results, "alpha": summary},
            indent=2,
        ),
        "```",
        "",
    ]
    md = "\n".join(lines)
    print(md)
    if args.md:
        with open(args.md, "w") as f:
            f.write(md)
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
