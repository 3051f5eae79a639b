"""Data layout at warehouse scale: bucketing, partitioning, skew salting.

The driver's tables are plain parquet; at 100 TB the difference between a
usable and an unusable engine is mostly layout:

- **Bucketing** co-locates join/groupBy keys at WRITE time so the big
  fact-fact joins (orders ⋈ lineitem, events self-joins) skip the shuffle
  entirely — both sides read pre-hashed buckets. Spark only honors bucket
  metadata through the catalog (``saveAsTable``), not bare parquet paths.
- **Partition columns** (date, event_type) drive partition PRUNING: a
  filter on the partition column skips whole directories at file-listing
  time — this is how a 100 TB scan becomes a 1 TB scan.
- **Salting** splits a pathologically hot key into ``n`` sub-keys for
  aggregation (aggregate per salted key, then merge). Order-dependent CEP
  state cannot be salted — a hot correlation key is inherently serial
  (same as the reference's single thread); salting applies to the
  commutative aggregations around it.
- **Training shards** (:func:`export_training_shards`): the terminal
  stage of a curation pipeline — a globally shuffled, REPRODUCIBLE
  sharded copy of the curated corpus for the training loader. Shard
  membership and intra-shard order are pure functions of
  ``(id, salt)``, so re-running the export (or re-running it after a
  lost-executor retry) yields identical shards, and bumping ``salt``
  is a fresh epoch-level reshuffle without touching upstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (+ sorted) catalog table.

    Equal ``num_buckets`` on both sides of a join on the bucket columns
    lets Spark plan a shuffle-free sort-merge join; sorting within buckets
    additionally removes the sort. Size buckets so one bucket ≈ one task's
    worth of data at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def with_shard(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
    shard_col: str = "shard",
    ord_col: str = "ord",
) -> DataFrame:
    """Deterministic global-shuffle keys: ``shard`` (0..num_shards−1) and
    ``ord`` (intra-shard order), both pure functions of ``(id, salt)``.

    The key is the first 15 hex chars of ``md5(salt ':' id)`` read as an
    integer (< 2⁶⁰, exact in a long) — the repo's engine-portable hash
    convention (see SIMHASH_BITS in operators/dedup.py), so an external
    loader (or a DuckDB audit query) can recompute shard membership from
    the id alone: no row-position or partition-layout dependence
    anywhere. ``shard = key mod num_shards``; ordering by (``ord``, id)
    inside a shard is the epoch's document order. A different ``salt``
    is an independent reshuffle.
    """
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(salt)), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return df.withColumn(ord_col, key).withColumn(
        shard_col, F.pmod(F.col(ord_col), F.lit(num_shards)).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    salt: int = 0,
    mode: str = "error",
) -> None:
    """Write ``df`` as ``num_shards`` globally shuffled, reproducible
    training shards: ``path/shard=i/*.parquet``.

    This is the terminal pipeline stage after dedup/filter/mix: training
    loaders read one shard directory per worker and iterate it in
    ``ord`` order — a deterministic global permutation of the corpus
    (md5-keyed, so it is uncorrelated with crawl/source/time order; the
    "shuffle the corpus once at scale, stream it sequentially at
    training time" pattern).

    Shape at 100 TB: assignment is a scan-local column expression (no
    driver state), then ONE hash exchange on the shard column and a
    per-task sort — the same cost class as any keyed write. Size shards
    via ``num_shards`` ≈ corpus_bytes / target (1–10 GiB of parquet per
    shard keeps loader seeks long and file counts sane); a shard
    holding more than one task's worth of rows simply writes several
    ``ord``-ordered files under its directory. Reproducibility contract:
    per-shard MEMBERSHIP and the ``ord`` column are functions of
    ``(id, salt)`` only — re-exports, AQE re-plans, and task retries
    cannot change what a shard contains or the order a sorted reader
    sees.
    """
    d = with_shard(df, num_shards, id_col=id_col, salt=salt)
    (
        # Range partitioning, not hash: hashing the shard VALUE collides
        # several shards into one task while ~1/e of tasks stay empty, so
        # write parallelism and the per-task sort's memory degrade at large
        # exports. Ranging over 0..num_shards−1 gives ~one shard directory
        # per task (equal values never split across tasks); the extra
        # sampling pass is one cheap scan of the derived shard column.
        # Membership/order stay column-derived either way.
        d.repartitionByRange(num_shards, "shard")
        .sortWithinPartitions("shard", "ord", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def with_salt(
    df: DataFrame,
    n_salts: int,
    salt_col: str = "__salt",
    salt_from: str | None = None,
) -> DataFrame:
    """Add a per-row salt so any hot aggregation key spreads over
    ``n_salts`` reducers. The salt must be row-derived, NOT derived from
    the aggregation key — a key-derived salt would map each hot key to one
    salt value and do nothing for skew. Aggregate on (key, salt) first,
    then merge the partials on key — the second pass touches only
    n_salts rows/key.

    RETRY-STABILITY CAVEAT (default mode): ``monotonically_increasing_id``
    values depend on task/partition layout, so a task retry or AQE re-plan
    can assign a row a DIFFERENT salt. That is harmless inside
    :func:`salted_agg` (the merge phase is commutative, so the final
    result is identical), but it makes the raw salt column unusable as a
    persisted/stable key. For persisted use pass ``salt_from=<col>`` —
    the name of a row-identifying column (a doc/row id; NOT the hot
    aggregation key) — and the salt becomes the deterministic
    ``pmod(xxhash64(col), n_salts)``, reproducible across retries,
    re-plans, and re-runs."""
    if salt_from is not None:
        return df.withColumn(
            salt_col, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
        )
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salts: int = 16,
    salt_from: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) → groupBy(key).

    ``aggs`` maps column → 'sum'|'count'|'min'|'max' (the commutative,
    re-aggregatable ones). Equivalent to a plain groupBy for any data, but
    a single hot key costs n_salts parallel partials instead of one
    straggler task. The default row-id salt is retry-UNstable but safe
    here (commutative merge); pass ``salt_from=`` only if the phase-1
    partials themselves are persisted (see :func:`with_salt`).
    """
    salted = with_salt(df, n_salts, salt_from=salt_from)
    phase1 = salted.groupBy(key, "__salt").agg(
        *[
            (F.count(F.lit(1)) if how == "count" else getattr(F, how)(c)).alias(f"__p_{c}")
            for c, how in aggs.items()
        ]
    )
    merge = {
        "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
    }
    return phase1.groupBy(key).agg(
        *[merge[how](f"__p_{c}").alias(f"{how}_{c}") for c, how in aggs.items()]
    )
