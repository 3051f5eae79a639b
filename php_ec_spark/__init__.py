"""php_ec_spark — a PySpark-native event-correlation + analytics engine.

Re-implements the capability set of lucasnetau/php-ec (a PHP complex-event-
processing engine; see /root/reference) on top of Apache Spark:

- Declarative ``Rule`` API (sequence match, timeout/absence, continuous
  match, suppression, enrichment) compiled to Spark plans — a relational
  window/join fast path where semantics allow, a per-key ``applyInPandas``
  state machine for the general case, and Structured Streaming with
  ``applyInPandasWithState`` for live mode.
- A plain Spark SQL/DataFrame relational surface (the reference has none —
  Catalyst provides scans/filters/joins/aggs/windows for free).
- Large-scale training-data pipeline operators: dedup (exact, MinHash+LSH,
  SimHash, n-gram Jaccard), similarity search (cosine top-k, LSH-bucketed),
  text analysis (lang-id, quality, tokens, fingerprints), multimodal column
  plumbing.

Everything is designed for a real multi-executor cluster: high-cardinality
correlation keys partition the stateful path, small dimensions broadcast,
filters/projections stay in Catalyst so pushdown and whole-stage codegen
apply.
"""

__version__ = "0.1.0"
