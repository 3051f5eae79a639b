"""Event sources (SURVEY S1-S5).

The reference fuses N child processes speaking NDJSON JSON-RPC into one
event stream (SourceExecutionCoordinator.php:194-346). Spark-native
equivalents:

- :func:`ndjson_dir_source` (S1) — external producers append NDJSON files
  to a directory; Spark's file stream source tails it with exactly-once
  offsets. This is the drop-in replacement for process-stdout pipes: run
  the same producer binary, point its stdout at rotating files. Offset
  tracking in the checkpoint replaces the `checkpoint` RPC (S5,
  functions.php:99-105).
- :func:`rate_event_source` (S3) — the GeneratorSource analog
  (Library/Source/GeneratorSource.php:11-57): a rate stream mapped into
  the event envelope; deterministic synthetic types/values.
- :func:`heartbeat_source` (W10) — periodic control heartbeat rows
  (Scheduler/Heartbeat.php:19-51) to union into the input.

In-process function sources (S2) are covered by writing NDJSON into the
watched directory from Python — the streaming tests do exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import CONTROL_MSG_HEARTBEAT, EVENT_SCHEMA


def ndjson_dir_source(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    clean_source: str | None = None,
) -> DataFrame:
    """Stream events from newline-delimited JSON files appearing in ``path``.

    Schema is the canonical envelope; ``ts`` accepts ISO-8601 strings.
    ``maxFilesPerTrigger`` is the backpressure knob (W13 — replaces the
    reference's SIGSTOP memory-pressure dance, Scheduler/MemoryManager.php).
    ``clean_source`` ("delete" | "archive" | "off") is the retention knob:
    Spark's file-source cleaner removes/archives input files once their
    batch commits, so a feedback directory (live chaining) or a busy spool
    dir doesn't grow without bound. Only committed files are touched —
    restart-from-checkpoint never needs them again.
    """
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if clean_source is not None:
        reader = reader.option("cleanSource", clean_source)
    return reader.json(path)


def rate_event_source(
    spark: SparkSession,
    rows_per_second: int = 100,
    event_types: tuple[str, ...] = ("click", "view", "purchase"),
    n_users: int = 100,
) -> DataFrame:
    """Deterministic generator source: rate stream → event envelope."""
    n = len(event_types)
    type_expr = F.array(*[F.lit(t) for t in event_types])[
        (F.col("value") % n).cast("int")
    ]
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % n_users).cast("long").alias("user_id"),
            type_expr.alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
            F.lit(None).cast("string").alias("props"),
        )
    )


def register_on_demand_source(
    dispatcher,
    rule_names: list[str],
    cmd: list[str],
    name: str = "on_demand_source",
) -> None:
    """On-demand source (S4): a rule emission launches a registered producer
    whose NDJSON output lands in the watched source directory and re-enters
    the engine on the next micro-batch.

    Mirrors the reference's ExecuteSource flow (Scheduler.php:823-838,
    Messages/ExecuteSource.php:21-73): rule emits 'source' → scheduler
    launches the autostart=false source with merged env. Here the emission
    batch is piped to ``cmd`` on stdin (one JSON object per emission); the
    command writes event files into the ndjson_dir_source directory.
    """
    dispatcher.register(name, cmd=cmd, rules=rule_names)


def heartbeat_source(spark: SparkSession, every_seconds: int = 10) -> DataFrame:
    """Heartbeat control events (W10): one row per interval, in-band."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1)
        .load()
        .filter(F.col("value") % every_seconds == 0)
        .select(
            (-F.col("value") - 1000).alias("event_id"),  # negative id space
            F.col("timestamp").alias("ts"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(CONTROL_MSG_HEARTBEAT).alias("event_type"),
            (F.col("value") / every_seconds).cast("double").alias("value"),  # seq
            F.lit(None).cast("string").alias("props"),
        )
    )
