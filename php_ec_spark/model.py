"""Event data model — the Spark rendering of the reference's Event envelope.

The reference's Event is schemaless (dynamic properties, reference
src/Event.php:34-86). Our canonical envelope is a fixed-column DataFrame
schema with the dynamic payload in a JSON ``props`` column (matches the
driver's ``events`` table):

    event_id bigint, ts timestamp(UTC), user_id bigint,
    event_type string, value double, props string

Semantics preserved from the reference:

- UTC normalization of event time (Event.php:63-80) → session TZ pinned to
  UTC + ``to_utc_timestamp`` at ingest boundaries.
- Live-mode time-skew clamp: |server_now − event_ts| > 600 s ⇒ use server
  receive time (CorrelationEngine.php:105,181-190) → ``clamp_event_time``.
- In-band control messages (Scheduler.php:163-188) → ``CONTROL_*`` constants;
  rules can subscribe to them like any event type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Core envelope schema (driver events table shape).
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# Control messages are in-band events (reference Scheduler.php:163-188).
CONTROL_MSG_START = "PHP-EC:Engine:Start"
CONTROL_MSG_RESTORED = "PHP-EC:Engine:Restored"
CONTROL_MSG_STOP = "PHP-EC:Engine:Stop"
CONTROL_MSG_HEARTBEAT = "PHP-EC:Engine:Heartbeat"

# Live-mode skew tolerance, seconds (CorrelationEngine.php:105 MAX_TIME_VARIANCE).
MAX_TIME_VARIANCE_S = 600


def load_events(spark, sf_dir: str) -> DataFrame:
    """Read the driver's ``events.parquet`` robustly.

    The table stores TIMESTAMP(NANOS) which Spark's parquet reader rejects by
    default; read nanos as long and floor-divide to µs — identical to
    DuckDB's ns→µs truncation, so oracle value-hashes line up exactly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # µs timestamps without isAdjustedToUTC must read as UTC TIMESTAMP, not
    # TIMESTAMP_NTZ (DuckDB parity; keeps ts casts legal).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    from .session import read_parquet

    df = read_parquet(spark, f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def clamp_event_time(
    df: DataFrame,
    ts_col: str = "ts",
    now: Column | None = None,
    max_variance_s: int = MAX_TIME_VARIANCE_S,
) -> DataFrame:
    """Live-mode sanity clamp: events with |ts − now| > tolerance get `now`.

    Mirrors reference CorrelationEngine.php:181-190 (getDatetime() preferring
    receivedTime, Event.php:128-141). Pure column expression — stays inside
    whole-stage codegen, no UDF.
    """
    now = now if now is not None else F.current_timestamp()
    skewed = F.abs(F.col(ts_col).cast("double") - now.cast("double")) > float(max_variance_s)
    return df.withColumn(ts_col, F.when(skewed, now).otherwise(F.col(ts_col)))


def normalize_events(df: DataFrame, input_tz: str | None = None) -> DataFrame:
    """Project an arbitrary-ish input to the canonical envelope.

    Missing envelope columns are filled with defaults (generated event_id,
    null user_id/value/props); extra columns are dropped. Timestamps are
    parsed from strings or epoch numerics if needed and normalized to UTC
    (Event.php:62-81 accepts epoch ints, timestamps, and tz-suffixed strings).
    """
    cols = dict(df.dtypes)
    ts = F.col("ts")
    if cols.get("ts") == "string":
        # input_tz applies ONLY to zone-less strings: epoch numerics are
        # already absolute instants (timestamp_seconds yields the exact
        # UTC point), and a string carrying its own offset/Z is resolved
        # by to_timestamp — re-shifting either by input_tz would move
        # every event by the zone offset (Event.php:62-81 likewise only
        # assumes a zone when the input has none)
        ts = F.to_timestamp("ts")
        if input_tz:
            has_zone = F.col("ts").rlike(r"(Z|[+-]\d{2}:?\d{2})\s*$")
            ts = F.when(has_zone, ts).otherwise(F.to_utc_timestamp(ts, input_tz))
    elif cols.get("ts") in ("bigint", "int", "double"):
        ts = F.timestamp_seconds(F.col("ts"))
    elif input_tz:
        # a real timestamp column that was PARSED as zone-less wall time
        ts = F.to_utc_timestamp(ts, input_tz)
    out = df.withColumn("ts", ts)
    for name, field in [
        ("event_id", F.monotonically_increasing_id()),
        ("user_id", F.lit(None).cast("bigint")),
        ("value", F.lit(None).cast("double")),
        ("props", F.lit(None).cast("string")),
    ]:
        if name not in cols:
            out = out.withColumn(name, field)
    return out.select("event_id", "ts", "user_id", "event_type", "value", "props")


def with_control_messages(spark, df: DataFrame) -> DataFrame:
    """Prepend a Start row and append a Stop row (batch replay convention).

    Reference injects CONTROL_MSG_NEW_STATE at boot (Scheduler.php:730-737)
    and Stop at shutdown (Scheduler.php:988); rules like Cron subscribe to
    them (Rule/Cron.php:118-132).
    """
    epoch = F.to_timestamp(F.lit("1970-01-01 00:00:00"))
    bounds = df.agg(
        F.coalesce(F.min("ts"), epoch).alias("lo"),
        F.coalesce(F.max("ts"), epoch).alias("hi"),
        F.coalesce(F.min("event_id"), F.lit(0)).alias("mn"),
        F.coalesce(F.max("event_id"), F.lit(0)).alias("mx"),
    )
    # Start sorts BEFORE every real event in (ts, event_id) stream order —
    # the reference injects it at boot, ahead of all data (Scheduler.php:730-737);
    # Stop sorts after everything (Scheduler.php:988). BOTH control rows
    # come from ONE explode over the single bounds row — selecting start
    # and stop separately would embed (and execute) the full min/max
    # aggregate subtree twice per action on the result.
    ctrl = bounds.select(
        F.explode(
            F.array(
                F.struct(
                    (F.col("mn") - 1).alias("event_id"),
                    F.col("lo").alias("ts"),
                    F.lit(CONTROL_MSG_START).alias("event_type"),
                ),
                F.struct(
                    (F.col("mx") + 1).alias("event_id"),
                    F.col("hi").alias("ts"),
                    F.lit(CONTROL_MSG_STOP).alias("event_type"),
                ),
            )
        ).alias("c")
    ).select(
        F.col("c.event_id"),
        F.col("c.ts"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.col("c.event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    return ctrl.unionByName(df.select(*[f.name for f in EVENT_SCHEMA]))
