"""Live-mode correlation on Spark 4's native ``transformWithState`` API.

Functionally equivalent to :mod:`engine.streaming` (the
``applyInPandasWithState`` backend) — same ``EngineCore`` semantics, same
emission schema — but built on the newer stateful-processing engine, which
adds the pieces the reference's scheduler had and the older API lacked:

- **initial state** (``transformWithStateInPandas(initialState=...)``): a
  batch DataFrame of per-key serialized engine state seeds the state store
  on the FIRST micro-batch. Combined with :func:`snapshot_state` this is
  the reference's boot sequence done natively: restore the save file, then
  go live (Scheduler::restoreState → run, Scheduler.php:695-738, 743-947).
  The applyInPandasWithState backend can only warm-start by replaying
  history through the stream itself.
- **first-class timers** (``registerTimer``/``deleteTimer``/``listTimers``)
  instead of the single implicit GroupState timeout — a direct analog of
  the reference's deadline list + earliest-deadline loop timer
  (CorrelationEngine.php:487-563). We keep the single-earliest-timer
  discipline: one armed timer per key, re-armed after every input batch /
  firing (W3).
- RocksDB state store (required by transformWithState) — incremental
  changelog checkpointing, the scale path for 100 TB state.

Clock semantics (W1/W2) mirror ``correlate_stream``: ``clock="event"``
fires timers on watermark advance (BatchClock, deterministic replay);
``clock="processing"`` fires on wall time (TickClock — live-ingest only,
see correlate_stream's docstring for the backfill trap).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessorHandle,
    TimerValues,
)

from ..rules.base import EVENT_MATCH_ANY, Rule
from .batch import EMISSION_SCHEMA, _rows_to_pdf, check_unique_rule_names
from .core import EngineCore

#: Per-key state: the serialized EngineCore (same blob as engine.streaming).
STATE_SCHEMA = "blob STRING"

#: Schema of a warm-start snapshot row (what :func:`snapshot_state` emits
#: and what ``initial_state`` expects).
SNAPSHOT_SCHEMA = "__key STRING, blob STRING"

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def _single_key_col(rules: Sequence[Rule]) -> Optional[str]:
    by_key = {r.key for r in rules}
    if len(by_key) > 1:
        raise ValueError(
            "rules must share one correlation key column per streaming query "
            f"(got {sorted(map(str, by_key))}); start one query per key column"
        )
    return next(iter(by_key))


def _project(events: DataFrame, rules: Sequence[Rule], prefilter_types: bool):
    """(projected df with string __key, keyless flag) — shared by the
    stream and the snapshot builder so keys always compare equal."""
    key_col = _single_key_col(rules)
    needed_types: set[str] = set()
    unrestricted = False
    for r in rules:
        for g in r.events:
            if EVENT_MATCH_ANY in g:
                unrestricted = True
            needed_types.update(g)
    src = events
    if prefilter_types and not unrestricted:
        src = src.filter(F.col("event_type").isin(sorted(needed_types)))
    key_expr = (
        F.col(key_col).cast("string")
        if key_col is not None
        else F.lit("__all__")
    )
    return (
        src.select(
            key_expr.alias("__key"), "event_id", "ts", "event_type", "value"
        ),
        key_col is None,
    )


class CorrelationProcessor(StatefulProcessor):
    """StatefulProcessor wrapping EngineCore per correlation key.

    One ValueState slot holds the serialized engine; one timer per key is
    armed at the earliest pending deadline (single-timer scheduling,
    CorrelationEngine.php:530-563).
    """

    def __init__(
        self,
        rules: Sequence[Rule],
        historical: bool = False,
        clock: str = "event",
        keyless: bool = False,
    ):
        self._rules = list(rules)
        self._historical = historical
        self._clock = clock
        self._keyless = keyless

    # -- plumbing ---------------------------------------------------------
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("engine", STATE_SCHEMA)

    def close(self) -> None:
        pass

    def _core(self, key: Any) -> EngineCore:
        blob = None
        if self._state.exists():
            got = self._state.get()
            blob = got[0] if got else None
        return EngineCore.from_state(
            self._rules,
            None if self._keyless else key[0],
            blob,
            historical=self._historical,
        )

    def _rearm(self, core: EngineCore, timers: TimerValues) -> None:
        """Persist state and re-arm the single earliest-deadline timer."""
        for t in list(self._handle.listTimers()):
            self._handle.deleteTimer(t)
        if core.has_live():
            self._state.update((core.to_state(),))
            nxt = core.next_deadline()
            if nxt is not None:
                nxt_ms = nxt // 1_000_000
                if self._clock == "processing":
                    floor_ms = timers.getCurrentProcessingTimeInMs() + 1
                else:
                    # event-time timers must sit above the current watermark
                    floor_ms = timers.getCurrentWatermarkInMs() + 1
                self._handle.registerTimer(max(nxt_ms, floor_ms))
        elif self._state.exists():
            self._state.clear()

    # -- callbacks --------------------------------------------------------
    def handleInitialState(
        self, key: Any, initialState: pd.DataFrame, timerValues: TimerValues
    ) -> None:
        """Warm start: seed the state store from a snapshot row (the
        reference's restoreState, Scheduler.php:695-738)."""
        if len(initialState) == 0:
            return
        blob = initialState["blob"].iloc[0]
        if blob is None:
            return
        core = EngineCore.from_state(
            self._rules,
            None if self._keyless else key[0],
            str(blob),
            historical=self._historical,
        )
        core.take_rows()  # defensive: seeding must not emit
        self._rearm(core, timerValues)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        # NOTE for whoever certifies this backend on a protobuf-enabled
        # host: streaming.py's round-6 handler rewrite (numpy lexsort on
        # i8 views with a sorted-skip, shared empty output frame, one-shot
        # tolist) cut per-key fixed cost 1.9 -> 0.6 ms and has NOT been
        # ported here — this module has never executed in this container,
        # so the port would be unverifiable. Port it alongside the
        # certification run if tws per-key overhead matters.
        core = self._core(key)
        frames = [pdf for pdf in rows if len(pdf)]
        if frames:
            batch = pd.concat(frames).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            ts_ns = batch["ts"].astype("int64").to_numpy()
            eids = batch["event_id"].to_numpy()
            etypes = batch["event_type"].to_numpy()
            values = batch["value"].to_numpy()
            for i in range(len(batch)):
                v = values[i]
                core.handle(
                    (int(eids[i]), int(ts_ns[i]), etypes[i], None if v != v else v)
                )
        self._rearm(core, timerValues)
        yield _rows_to_pdf(core.take_rows())

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        core = self._core(key)
        if self._clock == "processing":
            limit_ms = timerValues.getCurrentProcessingTimeInMs()
        else:
            wm = timerValues.getCurrentWatermarkInMs()
            limit_ms = wm if wm > 0 else expiredTimerInfo.getExpiryTimeInMs()
        core.fire_due(limit_ms * 1_000_000)
        self._rearm(core, timerValues)
        yield _rows_to_pdf(core.take_rows())


def snapshot_state(
    events: DataFrame, rules: Sequence[Rule], historical: bool = False
) -> DataFrame:
    """Batch-replay history and return per-key serialized engine state
    (``__key string, blob string``) WITHOUT the end-of-stream drain.

    This is the save file of the reference's SaveHandler (FileAdapter.php:
    73-233) computed from history: every in-flight instance (chain, group
    index, pending deadline) survives, so feeding the result to
    :func:`correlate_stream_tws` as ``initial_state`` continues matching
    exactly where the replay stopped — sequences half-matched in history
    complete on live events; deadlines armed in history still fire.

    Same physical shape as the batch engine: one shuffle on the key,
    per-partition consecutive-key iteration, Arrow-batched.

    Replays with ``prefilter_types=False`` — the same default as
    ``correlate_stream`` and for the same reason: the engine's clock
    advances on EVERY event (CorrelationEngine.php:199). Dropping
    unconsumed-type history would keep alive an instance whose deadline
    expired after the key's last consumed-type event; the uninterrupted
    engine fires-and-discards it during replay, so the snapshot must too —
    otherwise the warm-started query re-emits a timeout history already
    reported.
    """
    from ..session import shuffle_partitions

    check_unique_rule_names(rules)
    key_col = _single_key_col(rules)
    src, _keyless = _project(events, rules, prefilter_types=False)
    spark = events.sparkSession
    n_parts = shuffle_partitions(spark)
    part = src.repartition(n_parts, "__key").sortWithinPartitions(
        "__key", "ts", "event_id"
    )
    rules_list = list(rules)
    keyless = key_col is None

    def run(batches):
        core: Optional[EngineCore] = None
        cur_key = None
        out_keys: list = []
        out_blobs: list = []

        def flush(c: EngineCore, k) -> None:
            if c.has_live():
                out_keys.append(k)
                out_blobs.append(c.to_state())

        for pdf in batches:
            ts_ns = pdf["ts"].astype("int64").to_numpy()
            eids = pdf["event_id"].to_numpy()
            etypes = pdf["event_type"].to_numpy()
            values = pdf["value"].to_numpy()
            keys = pdf["__key"].to_numpy(dtype=object)
            for i in range(len(pdf)):
                k = keys[i]
                if core is None or k != cur_key:
                    if core is not None:
                        flush(core, cur_key)
                    core = EngineCore(
                        rules_list, None if keyless else k, historical=historical
                    )
                    cur_key = k
                v = values[i]
                core.handle(
                    (int(eids[i]), int(ts_ns[i]), etypes[i], None if v != v else v)
                )
                core.take_rows()  # snapshot wants state, not emissions
        if core is not None:
            flush(core, cur_key)
        yield pd.DataFrame({"__key": out_keys, "blob": out_blobs})

    return part.mapInPandas(run, schema=SNAPSHOT_SCHEMA)


def correlate_stream_tws(
    events: DataFrame,
    rules: Sequence[Rule],
    watermark_delay: str = "0 seconds",
    historical: bool = False,
    prefilter_types: bool = False,
    clock: str = "event",
    initial_state: Optional[DataFrame] = None,
) -> DataFrame:
    """``correlate_stream`` on the transformWithState engine, with optional
    warm start.

    ``initial_state`` is a batch DataFrame shaped like
    :func:`snapshot_state`'s output; its blobs seed the state store before
    the first micro-batch (restore-then-go-live, Scheduler.php:695-947).

    .. warning:: transformWithState requires the RocksDB state store
       provider. ``spark.sql.streaming.stateStore.providerClass`` is a
       SESSION-WIDE setting: if it is not already RocksDB, this function
       sets it (and emits a ``UserWarning``), which affects EVERY streaming
       query started on the session afterwards — including
       applyInPandasWithState queries, which also run fine on RocksDB but
       will no longer use the HDFS-backed default. Set the provider in the
       session builder to make the choice explicit and silence the warning.

    Keeps correlate_stream's clock contract: ``clock="event"`` for
    deterministic replay/backfill, ``clock="processing"`` for live absence
    detection on a quiet stream (never for backfill). Like the
    applyInPandasWithState backend, one streaming query handles one
    correlation-key column (use streaming.start_correlations to fan out).
    """
    try:
        import google.protobuf  # noqa: F401 — pyspark's TWS state protocol
    except ImportError as e:
        raise RuntimeError(
            "transformWithState's Python runtime needs the protobuf package, "
            "which this environment lacks — use "
            "engine.streaming.correlate_stream instead (it supports "
            "initial_state warm start too, with the kick-row caveat in its "
            "docstring)"
        ) from e
    if not rules:
        raise ValueError("correlate_stream_tws needs at least one rule")
    if clock not in ("event", "processing"):
        # the two backends default OPPOSITE ways on an unrecognized value
        # (this one checks == 'event', streaming.py checks ==
        # 'processing') — a typo would silently mix timer semantics
        raise ValueError(
            f"clock must be 'event' or 'processing', got {clock!r}"
        )
    check_unique_rule_names(rules)
    spark = events.sparkSession
    current = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    if current != _ROCKSDB:
        import warnings

        warnings.warn(
            "correlate_stream_tws is switching the SESSION-WIDE state store "
            f"provider ({current or 'default'} -> RocksDB); every streaming "
            "query started on this session afterwards uses RocksDB. Set "
            "spark.sql.streaming.stateStore.providerClass in the session "
            "builder to silence this.",
            UserWarning,
            stacklevel=2,
        )
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _ROCKSDB)

    src, keyless = _project(events, rules, prefilter_types)
    # watermark AFTER the projection so ts survives the select; the
    # prefilter caveat from correlate_stream applies (default off).
    src = src.withWatermark("ts", watermark_delay)
    grouped = src.groupBy("__key")
    init = initial_state.groupBy("__key") if initial_state is not None else None
    return grouped.transformWithStateInPandas(
        statefulProcessor=CorrelationProcessor(
            rules, historical=historical, clock=clock, keyless=keyless
        ),
        outputStructType=EMISSION_SCHEMA,
        outputMode="append",
        timeMode="eventTime" if clock == "event" else "processingTime",
        initialState=init,
    )
