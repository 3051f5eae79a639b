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


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Add a per-row salt so any hot aggregation key spreads over
    ``n_salts`` reducers. The salt is row-derived (monotonic row id), NOT
    key-derived — a key-derived salt would map each key to one salt value
    and do nothing for skew. Aggregate on (key, salt) first, then merge
    the partials on key — the second pass touches only n_salts rows/key."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: groupBy(key, salt) → groupBy(key).

    ``aggs`` maps column → 'sum'|'count'|'min'|'max' (the commutative,
    re-aggregatable ones). Equivalent to a plain groupBy for any data, but
    a single hot key costs n_salts parallel partials instead of one
    straggler task.
    """
    salted = with_salt(df, n_salts)
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
