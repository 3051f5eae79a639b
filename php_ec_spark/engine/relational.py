"""Relational fast path: compile simple sequence rules to window plans.

A 2-group sequence rule with timeout — the reference's canonical
CheckOrderPayment pattern (examples/online_shop/rules/CheckOrderPayment.php:
EVENTS [['shop:order:placed'],['shop:order:paid']], TIMEOUT 'PT20S', keyed by
orderid) — has fully relational semantics:

    for every A event e:  let f = first B event after e (same key)
        f exists and f.ts ≤ e.ts + timeout  → completed, fired at f.ts
        otherwise                            → timeout,   fired at e.ts + timeout

("first B after e" uses stream order (ts, event_id); the acceptEventTime
check (AEventProcessor.php:357-396) rejects any B after the deadline, and
since the FIRST B is the earliest one, later Bs can never complete an
instance the first B couldn't.)

This compiles to ONE window function over ONE shuffle on the key — no join,
no Python, whole-stage codegen throughout. At 100 TB this is the plan you
want: shuffle is proportional to the A/B event subset (type filter is pushed
to the parquet scan), and the per-key window is streamed, not materialized.

Requires group types to be distinct: for A→A sequences the reference's
per-class dedup (CorrelationEngine.php:252-254) pairs events disjointly,
which a window cannot express — those fall back to the state machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..rules.base import Rule
from .batch import EMISSION_SCHEMA


def is_relational_compilable(rule: Rule) -> bool:
    if is_keyless_counter(rule):
        return True
    if rule.emit_progress or rule.emit_final or rule.on_complete or rule.on_timeout:
        return False
    if is_single_match(rule):
        return True
    # chain trimming (trimEventChain, AEventProcessor.php:321-332) changes
    # n_events/start/value_sum of emissions — state-machine only.
    if rule.chain_limit is not None:
        return False
    if not rule.is_simple_sequence or len(rule.events) != 2:
        return False
    a, b = rule.events[0][0], rule.events[1][0]
    return a != b


def is_single_match(rule: Rule) -> bool:
    """MatchSingle (Rule/MatchSingle.php:22-33): one group, completes on the
    first accepted event — pure stateless filter, one emission per event.
    Keyless ('*'-style LogEverything) rules compile here too: no state means
    no partitioning requirement, so they stay an embarrassingly parallel
    scan instead of a single-partition state machine."""
    return (
        len(rule.events) == 1
        and not rule.continuous
        and not rule.suppress
        and rule.accept is None
    )


def is_keyless_counter(rule: Rule) -> bool:
    """Keyless continuous counter — the LogEverything/incrStat shape: one
    global instance consuming every matching event forever, reported once at
    end-of-stream. Compiles to a plain ``groupBy().agg()`` (map-side partial
    aggregation), NOT the single-partition ordered state machine — the scale
    fix for un-keyed wildcard rules."""
    return (
        rule.key is None
        and rule.continuous
        and rule.timeout_s is None
        and rule.chain_limit is None
        and len(rule.events) == 1
        and rule.accept is None
        and not rule.suppress
        and rule.emit_final
        and not rule.emit_progress
        and rule.on_complete is None
        and rule.on_timeout is None
    )


def _key_expr(rule: Rule):
    if rule.key is None:
        return F.lit(None).cast("string").alias("key")
    return F.col(rule.key).cast("string").alias("key")


def _type_filter(events: DataFrame, group) -> DataFrame:
    if "*" in group:
        return events
    return events.filter(F.col("event_type").isin(list(group)))


def compile_single_match(events: DataFrame, rule: Rule) -> DataFrame:
    """MatchSingle compiles to filter+project — stays fully in codegen."""
    src = _type_filter(events, rule.events[0])
    return src.select(
        F.lit(rule.name).alias("rule"),
        _key_expr(rule),
        F.lit("completed").alias("outcome"),
        F.col("ts").alias("fire_ts"),
        F.col("event_id").alias("start_event_id"),
        F.col("event_id").alias("last_event_id"),
        F.lit(1).cast("long").alias("n_events"),
        F.col("value").alias("value_sum"),
        F.lit(None).cast("string").alias("payload"),
    )


def compile_keyless_counter(events: DataFrame, rule: Rule) -> DataFrame:
    """Keyless continuous counter → global aggregate with partial combine.

    Matches the state machine's final emission exactly: one row with the
    chain length / value sum / first & last consumed event in stream order
    (ts, event_id), fired at the last consumed event's timestamp. Emits
    nothing on an empty input (no instance was ever started)."""
    src = _type_filter(events, rule.events[0])
    order = F.struct("ts", "event_id")
    agg = src.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.min_by("event_id", order).alias("start_event_id"),
        F.max_by("event_id", order).alias("last_event_id"),
        F.max("ts").alias("fire_ts"),
    )
    return agg.filter(F.col("n_events") > 0).select(
        F.lit(rule.name).alias("rule"),
        F.lit(None).cast("string").alias("key"),
        F.lit("final").alias("outcome"),
        F.col("fire_ts"),
        F.col("start_event_id"),
        F.col("last_event_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.col("value_sum").cast("double").alias("value_sum"),
        F.lit(None).cast("string").alias("payload"),
    )


def compile_two_step_sequence(events: DataFrame, rule: Rule) -> DataFrame:
    """Window-function plan for A→B sequence with optional timeout."""
    assert is_relational_compilable(rule), rule
    a, b = rule.events[0][0], rule.events[1][0]
    key = rule.key
    timeout_s = rule.timeout_s

    relevant = events.filter(F.col("event_type").isin([a, b])).select(
        key, "event_id", "ts", "event_type", "value"
    )
    # first B strictly after the current row in stream order (ts, event_id)
    w = (
        Window.partitionBy(key)
        .orderBy("ts", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    first_b = F.min(
        F.when(F.col("event_type") == b, F.struct("ts", "event_id", "value"))
    ).over(w)

    starts = (
        relevant.withColumn("first_b", first_b)
        .filter(F.col("event_type") == a)
    )

    if timeout_s is not None:
        deadline = F.col("ts") + F.make_interval(secs=F.lit(float(timeout_s)))
        completed = F.col("first_b").isNotNull() & (F.col("first_b.ts") <= deadline)
        fire_ts = F.when(completed, F.col("first_b.ts")).otherwise(deadline)
    else:
        completed = F.col("first_b").isNotNull()
        fire_ts = F.col("first_b.ts")  # never-times-out: no emission without a B
        starts = starts.filter(completed)

    out = starts.select(
        F.lit(rule.name).alias("rule"),
        F.col(key).cast("string").alias("key"),
        F.when(completed, F.lit("completed")).otherwise(F.lit("timeout")).alias("outcome"),
        fire_ts.cast("timestamp").alias("fire_ts"),
        F.col("event_id").alias("start_event_id"),
        F.when(completed, F.col("first_b.event_id")).otherwise(F.col("event_id")).alias("last_event_id"),
        F.when(completed, F.lit(2)).otherwise(F.lit(1)).cast("long").alias("n_events"),
        F.when(
            completed,
            # null only when both values are null (matches state-machine sum)
            F.when(
                F.col("value").isNotNull() | F.col("first_b.value").isNotNull(),
                F.coalesce(F.col("value"), F.lit(0.0))
                + F.coalesce(F.col("first_b.value"), F.lit(0.0)),
            ),
        ).otherwise(F.col("value")).alias("value_sum"),
        F.lit(None).cast("string").alias("payload"),
    )
    assert out.schema == EMISSION_SCHEMA or [f.name for f in out.schema] == [
        f.name for f in EMISSION_SCHEMA
    ]
    return out
