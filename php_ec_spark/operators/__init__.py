"""Large-scale training-data pipeline operators.

Beyond the reference's CEP surface, these are the operations a 100 TB
training-data pipeline needs, each designed Spark-first:

- :mod:`.text` — tokenization stats, quality scoring, language-ID heuristic,
  polynomial document fingerprints. Pure column expressions (whole-stage
  codegen, no Python in the hot path).
- :mod:`.dedup` — exact dedup (hash groupBy), exact n-gram Jaccard pairs via
  an inverted shingle index (never all-pairs), MinHash+LSH banded candidate
  generation with exact verification, SimHash fingerprints.
- :mod:`.similarity` — brute-force cosine top-k (broadcast queries, one
  corpus pass) and IVF-style partitioned ANN.
- :mod:`.multimodal` — opaque binary payload columns with typed metadata and
  Arrow-batched ``mapInPandas`` decode plumbing (actual codec decode is
  stubbed; the container ships no image/audio libraries).
"""
