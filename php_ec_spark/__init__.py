"""php_ec_spark — a PySpark-native event-correlation + analytics engine.

Re-implements the capability set of lucasnetau/php-ec (a PHP complex-event-
processing engine; see /root/reference) on top of Apache Spark:

- Declarative ``Rule`` API (sequence match, timeout/absence, continuous
  match, suppression, chaining, enrichment) compiled to Spark plans: pure
  window/aggregate fast paths for N-step sequences, gap sessions, single
  matches and keyless counters (`engine/relational.py`); a per-key
  Arrow-batched state machine for the general case (`engine/batch.py`);
  and live mode via ``applyInPandasWithState`` with event-time timers and
  checkpointed state (`engine/streaming.py`).
- A plain Spark SQL/DataFrame relational surface (the reference has none —
  Catalyst provides scans/filters/joins/aggs/windows for free), plus an
  as-of join composition Spark SQL lacks (`functions/`).
- Large-scale training-data pipeline operators (`operators/`): dedup
  (exact, MinHash+LSH banded, SimHash chunk-banded, exact n-gram Jaccard
  via inverted index), similarity search (broadcast cosine top-k, IVF
  cluster-pruned ANN), text analysis (token/quality stats, marker-token
  lang-id, rolling-hash fingerprints), multimodal binary-column plumbing
  (Arrow-batched mapInPandas; codec decode stubbed in this container).

Everything is designed for a real multi-executor cluster: high-cardinality
correlation keys partition the stateful path, small dimensions broadcast,
filters/projections stay in Catalyst so pushdown and whole-stage codegen
apply.
"""

__version__ = "0.1.0"
