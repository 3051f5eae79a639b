"""Dedup-at-the-door: the streaming front end of the curation pipeline.

examples/curation_pipeline.py sweeps a LANDED corpus; this example runs
the two ingest-side operators a crawl pipeline puts in front of it, over
a file-fed document stream (stand-in for the crawler's landing bucket):

  1. exact drop   (operators.dedup.streaming_exact_dedup) — byte-dups
     (normalized text, or a key tuple via key_cols=) never land twice
     within the horizon; state is one row per distinct digest, bounded
     by ingest-rate × horizon.
  2. near-dup flag (operators.dedup.streaming_minhash_dedup) — documents
     whose MinHash band bucket was seen within the horizon come out on a
     SIDE stream of (doc_id, band, bh, first_doc, ts) collision events.
     Flag, don't drop: LSH collisions are candidates; the batch
     minhash_lsh_pairs sweep (same band kernel) verifies them exactly.

Run:  python examples/ingest_dedup.py [sf_dir]
      (default /root/testdata/sf0.001)

The demo replays the documents table as timed micro-batches (one file
per trigger), runs both queries, and prints the funnel: docs in, docs
landed after the exact gate, near-dup flags raised, and how the flags
line up with the batch-verified pairs over the same window.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from php_ec_spark.operators.dedup import (
    minhash_lsh_pairs,
    streaming_exact_dedup,
    streaming_minhash_dedup,
)
from php_ec_spark.session import get_spark


def stage_stream(spark, sf_dir: str, src_dir: str, n_batches: int = 4) -> int:
    """Replay the documents table as n_batches NDJSON files with synthetic
    event times (one batch per minute), mtime-ordered so
    maxFilesPerTrigger=1 yields deterministic micro-batches. The final
    batch additionally RE-CRAWLS the first 20 documents under fresh ids
    (same bytes, new doc_id — the crawler-revisit shape), so the exact
    gate has real byte-duplicates to drop."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    per = max(1, (len(docs) + n_batches - 1) // n_batches)
    t0 = 1_700_000_000
    recrawl = [(r.doc_id + 1_000_000, r.text) for r in docs[:20]]
    staged = 0
    for b in range(n_batches):
        chunk = [(r.doc_id, r.text) for r in docs[b * per : (b + 1) * per]]
        if b == n_batches - 1:
            chunk = chunk + recrawl
        if not chunk:
            break
        path = os.path.join(src_dir, f"{b:03d}.json")
        with open(path, "w") as f:
            for doc_id, text in chunk:
                f.write(json.dumps({
                    "doc_id": doc_id,
                    "text": text,
                    "ts": f"2024-01-01T00:{b:02d}:00Z",
                }) + "\n")
        staged += len(chunk)
        os.utime(path, (t0 + 10 * b, t0 + 10 * b))
    return staged


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("ingest-dedup-example", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    work = tempfile.mkdtemp(prefix="ingest_dedup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    try:
        n_in = stage_stream(spark, sf_dir, src)
        reader = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )

        landed = streaming_exact_dedup(reader, ts_col="ts", horizon="1 hour")
        q1 = (
            landed.writeStream.format("memory").queryName("landed")
            .option("checkpointLocation", os.path.join(work, "ckpt_exact"))
            .trigger(availableNow=True).start()
        )
        flags = streaming_minhash_dedup(reader, ts_col="ts", horizon="1 hour")
        q2 = (
            flags.writeStream.format("memory").queryName("flags")
            .option("checkpointLocation", os.path.join(work, "ckpt_near"))
            .trigger(availableNow=True).start()
        )
        q1.awaitTermination(timeout=300)
        q2.awaitTermination(timeout=300)

        n_landed = spark.table("landed").count()
        flagged = {
            r.doc_id
            for r in spark.table("flags").select("doc_id").distinct().collect()
        }
        print(f"docs replayed        : {n_in}")
        print(f"landed (exact gate)  : {n_landed} "
              f"({n_in - n_landed} byte-dups dropped at the door)")
        print(f"near-dup flags       : {len(flagged)} docs")

        # the batch sweep the flags feed: exact-verified pairs over the
        # same corpus — every verified pair's later side must be flagged
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = minhash_lsh_pairs(docs, threshold=0.8).collect()
        later = {max(p.doc_a, p.doc_b) for p in pairs}
        confirmed = later & flagged
        print(f"batch-verified pairs : {len(pairs)} "
              f"(later sides: {len(later)}, of which flagged at ingest: "
              f"{len(confirmed)})")
        fp = len(flagged - later)
        print(f"flag false-positives : {fp} "
              "(LSH candidates the exact verify rejects — why we flag, "
              "not drop)")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
