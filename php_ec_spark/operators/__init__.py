"""Large-scale training-data pipeline operators.

Beyond the reference's CEP surface, these are the operations a 100 TB
training-data pipeline needs, each designed Spark-first:

- :mod:`.text` — tokenization stats, quality scoring, language-ID heuristic,
  polynomial document fingerprints. Pure column expressions (whole-stage
  codegen, no Python in the hot path).
- :mod:`.dedup` — exact dedup (hash groupBy), exact n-gram Jaccard pairs via
  an inverted shingle index (never all-pairs), MinHash+LSH banded candidate
  generation with exact verification, SimHash fingerprints, benchmark
  decontamination, and log-diameter connected components for cluster
  labeling.
- :mod:`.dedup_index` — the build-once / probe-many deployment of dedup:
  persistent bucketed digest + LSH-band tables; a crawl increment probes
  corpus history for exact and verified near duplicates with no
  stored-side shuffle and no corpus rescan, then appends idempotently.
- :mod:`.similarity` — brute-force cosine top-k (broadcast queries, one
  corpus pass), IVF-style partitioned ANN (persistent
  build/search/add/compact), SemDeDup-style semantic dedup over the same
  cluster geometry, and ``streaming_embedding_ingest`` — journaled
  exactly-once semantic dedup at the ingest door, probing each
  micro-batch against the growing index.
- :mod:`.sampling` — hash-stable stratified sampling and weighted corpus
  mixing (retry/partitioning-invariant keep decisions).
- :mod:`.packing` — concat-and-chunk sequence packing via a distributed
  two-pass prefix sum.
- :mod:`.multimodal` — opaque binary payload columns with typed metadata and
  Arrow-batched ``mapInPandas`` plumbing: decode + resize (codec-probed,
  deterministic stand-ins where no image/audio libraries exist — as in this
  container), codec-free byte-histogram feature extraction, video frame
  sampling.

See examples/curation_pipeline.py for the operators composed into the
full curation funnel (dedup → decontaminate → quality-gate → sample →
pack).
"""
