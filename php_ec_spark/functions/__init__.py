"""Library functions: operators Spark lacks built-in, composed Spark-first.

- :func:`asof_join` — as-of (most-recent-prior) join via union + running
  window max: ONE shuffle on (key), no join node, no row explosion.
- :func:`validate_enrich_filter` — the reference's stateless
  Validate→Enrich→Filter pre-pipeline (Rule/ValidateEnrichFilter.php:22-94):
  failing any stage suppresses the event engine-wide.
- :func:`cron_fires` — batch-mode scheduled rules (Rule/Cron.php:32-234):
  fire rows at every interval boundary covered by the stream's event-time
  range, derived from a pure `sequence()` expression.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_inclusive(col: Column, lo, hi) -> Column:
    """min ≤ value ≤ max (reference src/Rule.php:27-37, F5)."""
    return col.between(lo, hi)


def range_exclusive(col: Column, lo, hi) -> Column:
    """min < value < max (reference src/Rule.php:39-48, F5)."""
    return (col > lo) & (col < hi)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_value_cols: Sequence[str] = ("ts", "event_id"),
    left_prefix: str = "",
    right_prefix: str = "asof_",
    tie_col: str = "event_id",
) -> DataFrame:
    """As-of join: for each left row, the most recent PRIOR right row.

    "Prior" is strict stream order: (on, tie_col) of the right row sorts
    before the left row's. Implemented as union + running window max of a
    struct — a single shuffle on ``by``, merge-scan within partitions, no
    join operator and no candidate explosion; this is the plan a dedicated
    as-of join physical operator would produce.

    Returns the left rows with ``right_prefix + c`` columns for each
    ``right_value_cols`` entry (null when no prior right row exists).
    """
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("__is_left"))
    r = right.select(
        *[F.col(c) if c in (on, by, tie_col) else F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols],
        F.lit(0).alias("__is_left"),
    )
    # carry the right row's values in one struct; left rows carry null
    rstruct = F.struct(*[F.col(c) for c in right_value_cols])
    l = l.withColumn("__rv", F.lit(None).cast(
        right.select(rstruct.alias("s")).schema["s"].dataType
    ))
    r = r.withColumn("__rv", rstruct)
    u = l.unionByName(r)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on), F.col(tie_col), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        u.withColumn("__last", F.max("__rv").over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__is_left", "__rv")
    )
    for c in right_value_cols:
        out = out.withColumn(f"{right_prefix}{c}", F.col(f"__last.{c}"))
    return out.drop("__last")


def validate_enrich_filter(
    events: DataFrame,
    validate: Optional[Column] = None,
    enrich: Optional[DataFrame] = None,
    enrich_on: Optional[Column] = None,
    filter_spec: Optional[Column] = None,
    broadcast_enrich: bool = True,
) -> DataFrame:
    """Validate → Enrich → Filter stateless pre-pipeline (F6).

    Mirrors reference Rule/ValidateEnrichFilter.php:22-94: an event failing
    ``validate`` or ``filter_spec`` (≈ returning null from validate()/
    filter()) is suppressed engine-wide — this stage runs before any rule.
    ``enrich`` is a dimension DataFrame joined on ``enrich_on`` (broadcast
    by default — enrichment dims are small).
    """
    out = events
    if validate is not None:
        out = out.filter(validate)
    if enrich is not None:
        dim = F.broadcast(enrich) if broadcast_enrich else enrich
        out = out.join(dim, enrich_on, "left") if enrich_on is not None else out.join(dim)
    if filter_spec is not None:
        out = out.filter(filter_spec)
    return out


def cron_fires(
    events: DataFrame,
    every: str = "1 hour",
    name: str = "cron",
    align: str = "hour",
) -> DataFrame:
    """Batch-mode cron rule: one 'scheduled' emission per interval boundary
    within the stream's event-time span (Rule/Cron.php:32-234; in batch
    replay the timeout mechanism IS the scheduler, next run = deadline).

    Pure relational: one tiny aggregate for the bounds, then ``sequence()``
    explodes the boundaries — no state machine, no Python.
    """
    bounds = events.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    first = F.date_trunc(align, F.col("lo"))
    fires = bounds.select(
        F.explode(
            F.sequence(first, F.col("hi"), F.expr(f"INTERVAL {every}"))
        ).alias("fire_ts")
    )
    return fires.select(
        F.lit(name).alias("rule"),
        F.lit(None).cast("string").alias("key"),
        F.lit("scheduled").alias("outcome"),
        F.col("fire_ts"),
        F.lit(None).cast("long").alias("start_event_id"),
        F.lit(None).cast("long").alias("last_event_id"),
        F.lit(None).cast("long").alias("n_events"),
        F.lit(None).cast("double").alias("value_sum"),
        F.lit(None).cast("string").alias("payload"),
    )
