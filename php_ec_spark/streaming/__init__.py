"""Streaming surface: sources, action sinks, lifecycle helpers.

Maps the reference's scheduler plumbing onto Structured Streaming:

- sources (S1-S5)   → :mod:`.sources` — NDJSON directory/process feeds,
  generator/rate sources, checkpointed offsets.
- action sinks (S6-S8) → :mod:`.sinks` — foreachBatch dispatcher with
  parameter validation, closure actions, idempotent replay behavior.
- engine lifecycle  → :func:`start_correlation` — wires source → correlate
  → sink with a checkpointLocation (replaces save-state/recovery,
  Scheduler.php:620-673/743-947).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..engine.streaming import correlate_stream
from ..rules.base import Rule
from .jsonrpc import JsonRpcActionProcess, JsonRpcProcessSource, jsonrpc_source
from .sinks import ActionDispatcher
from .sources import heartbeat_source, ndjson_dir_source, rate_event_source

__all__ = [
    "ActionDispatcher",
    "JsonRpcActionProcess",
    "JsonRpcProcessSource",
    "correlate_stream",
    "heartbeat_source",
    "jsonrpc_source",
    "ndjson_dir_source",
    "rate_event_source",
    "start_correlation",
]


def start_correlation(
    events: DataFrame,
    rules: Sequence[Rule],
    checkpoint_dir: str,
    dispatcher: Optional[ActionDispatcher] = None,
    watermark_delay: str = "0 seconds",
    query_name: str = "php-ec-correlation",
    trigger_once: bool = False,
    clock: str = "event",
) -> StreamingQuery:
    """Source → correlation engine → action sink, checkpointed.

    ``checkpoint_dir`` carries source offsets (S5), operator state (W11)
    and sink progress — the whole SaveHandler/RECOVERY subsystem of the
    reference (Scheduler.php:620-673, 766-884) in one Spark-native knob.
    Restarting with the same checkpoint resumes exactly where processing
    stopped. The dispatcher anchors its cross-run batch markers and
    errored-action journal under the same checkpoint dir (unless it was
    built with its own), so a replayed micro-batch is skipped instead of
    double-dispatching — the reference's errored-action replay + marker
    bookkeeping (W12, Scheduler.php:766-884).
    """
    emissions = correlate_stream(
        events, rules, watermark_delay=watermark_delay, clock=clock
    )
    dispatcher = dispatcher or ActionDispatcher()
    if dispatcher.checkpoint_dir is None:
        dispatcher.checkpoint_dir = checkpoint_dir
    dispatcher.replay_errored()
    writer = (
        emissions.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .foreachBatch(dispatcher)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
