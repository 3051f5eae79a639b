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

import os
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..engine.streaming import correlate_stream
from ..rules.base import Rule
from .jsonrpc import JsonRpcActionProcess, JsonRpcProcessSource, jsonrpc_source
from .sinks import ActionDispatcher
from .sources import heartbeat_source, ndjson_dir_source, rate_event_source

__all__ = [
    "ActionDispatcher",
    "CorrelationGroup",
    "JsonRpcActionProcess",
    "JsonRpcProcessSource",
    "correlate_stream",
    "heartbeat_source",
    "jsonrpc_source",
    "ndjson_dir_source",
    "rate_event_source",
    "start_correlation",
    "start_correlations",
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
    initial_state: Optional[DataFrame] = None,
) -> StreamingQuery:
    """Source → correlation engine → action sink, checkpointed.

    ``checkpoint_dir`` carries source offsets (S5), operator state (W11)
    and sink progress — the whole SaveHandler/RECOVERY subsystem of the
    reference (Scheduler.php:620-673, 766-884) in one Spark-native knob.
    Restarting with the same checkpoint resumes exactly where processing
    stopped. ``initial_state`` (an ``engine.snapshot_state`` DataFrame)
    warm-starts a FRESH checkpoint from a batch replay of history — the
    reference's restore-savefile-then-go-live boot (Scheduler.php:695-947);
    see correlate_stream's docstring for the quiet-key kick caveat.
    The dispatcher anchors its cross-run batch markers and
    errored-action journal under the same checkpoint dir (unless it was
    built with its own), so a replayed micro-batch is skipped instead of
    double-dispatching — the reference's errored-action replay + marker
    bookkeeping (W12, Scheduler.php:766-884).
    """
    emissions = correlate_stream(
        events,
        rules,
        watermark_delay=watermark_delay,
        clock=clock,
        initial_state=initial_state,
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


@dataclass
class CorrelationGroup:
    """Handle over one streaming query per correlation-key column.

    Spark allows a single ``applyInPandasWithState`` per streaming query,
    so a rule set keyed on several columns runs as several queries
    (see correlate_stream's guard). This groups them: per-key dispatchers,
    combined completed/failed views, await/stop across the set — the
    orchestration the reference scheduler does across its rule instances.
    """

    queries: dict[Optional[str], StreamingQuery] = field(default_factory=dict)
    dispatchers: dict[Optional[str], ActionDispatcher] = field(default_factory=dict)

    @property
    def completed(self) -> list:
        """(key_col, batch_id, action, n) across every query."""
        return [
            (k, *entry) for k, d in self.dispatchers.items() for entry in d.completed
        ]

    @property
    def failed(self) -> list:
        return [
            (k, *entry) for k, d in self.dispatchers.items() for entry in d.failed
        ]

    def await_all(self, timeout: Optional[float] = None) -> None:
        for q in self.queries.values():
            q.awaitTermination(timeout=timeout)

    def stop_all(self) -> None:
        for q in self.queries.values():
            q.stop()


def start_correlations(
    events: DataFrame,
    rules: Sequence[Rule],
    checkpoint_root: str,
    dispatcher_factory: Optional[Callable[[Optional[str]], ActionDispatcher]] = None,
    watermark_delay: str = "0 seconds",
    query_name: str = "php-ec-correlation",
    trigger_once: bool = False,
    clock: str = "event",
    history: Optional[DataFrame] = None,
) -> CorrelationGroup:
    """Start one correlation query PER KEY COLUMN in the rule set.

    Rules are partitioned by their correlation key column; each partition
    gets its own streaming query (Spark's one-stateful-op-per-query
    limit), its own checkpoint subdir under ``checkpoint_root``, and its
    own dispatcher (``dispatcher_factory(key_col)`` if given, else a fresh
    :class:`ActionDispatcher` — separate dispatchers keep per-query batch
    ids from colliding in the cross-run markers). Returns a
    :class:`CorrelationGroup` with combined emission bookkeeping.

    ``history`` (a BATCH DataFrame of past events) warm-starts every
    query: each key group batch-replays it via ``engine.snapshot_state``
    and seeds its state store, so live queries continue mid-sequence
    instead of starting cold — the reference's boot-time restore
    (Scheduler.php:695-947) across the whole rule set.
    """
    from ..engine.streaming_tws import snapshot_state

    by_key: dict[Optional[str], list[Rule]] = {}
    for r in rules:
        by_key.setdefault(r.key, []).append(r)
    group = CorrelationGroup()
    for key_col, group_rules in by_key.items():
        tag = key_col if key_col is not None else "__keyless__"
        dispatcher = (
            dispatcher_factory(key_col) if dispatcher_factory else ActionDispatcher()
        )
        group.dispatchers[key_col] = dispatcher
        group.queries[key_col] = start_correlation(
            events,
            group_rules,
            os.path.join(checkpoint_root, f"key_{tag}"),
            dispatcher=dispatcher,
            watermark_delay=watermark_delay,
            query_name=f"{query_name}-{tag}",
            trigger_once=trigger_once,
            clock=clock,
            initial_state=(
                snapshot_state(history, group_rules) if history is not None else None
            ),
        )
    return group
