"""Batch correlation engine.

Faithful re-expression of the reference's event loop
(CorrelationEngine.php:171-328) as a Spark job:

- Events are partitioned by the rule's correlation key (``groupBy(key)``)
  and processed in event-time order inside each partition — this preserves
  the reference's per-key serial semantics while giving data parallelism
  the single-threaded reference never had.
- Batch-clock timeout replay: before an event at time *t* is applied, every
  pending timeout with deadline ≤ *t* − 1 ms fires
  (CorrelationEngine.php:191-202) — deterministic, oracle-checkable.
- Rule priority and EVENT_SUPPRESS short-circuiting follow rule-list order
  (CorrelationEngine.php:231-236); per-class dedup: an event consumed by an
  existing instance of rule R does not start a new R instance
  (CorrelationEngine.php:252-254).

Two physical strategies:

1. ``compile_two_step_sequence`` (relational.py) — pure window-function plan
   for the common 2-group sequence+timeout rule. No Python in the hot path;
   one shuffle on the key; scales to arbitrary data.
2. ``correlate_state_machine`` — general path: ``applyInPandas`` running the
   state machine per key. Python, but Arrow-batched and embarrassingly
   parallel across keys (key cardinality grows with data scale — see
   TESTDATA: 150 users @ sf0.01 → 1 500 @ sf0.1). Skewed keys are handled
   by AQE; a pathological single hot key degrades to one task, same as the
   reference's single thread.

The engine picks strategy 1 automatically when semantics allow.
"""

from __future__ import annotations

import json
from typing import Iterable, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..rules.base import EVENT_MATCH_ANY, Rule

#: Output schema shared by every strategy (and the streaming engine).
EMISSION_SCHEMA = T.StructType(
    [
        T.StructField("rule", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("outcome", T.StringType()),  # completed|timeout|progress|final
        T.StructField("fire_ts", T.TimestampType()),
        T.StructField("start_event_id", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
        T.StructField("payload", T.StringType()),
    ]
)

_MS = 1_000_000  # 1 ms in ns


class _Instance:
    """One in-flight matcher instance (≈ one AEventProcessor object)."""

    __slots__ = ("rule", "gi", "chain", "deadline_ns", "seq", "no_timeout")

    def __init__(self, rule: Rule, seq: int, no_timeout: bool = False):
        self.rule = rule
        self.gi = 0  # index of the event group we are waiting on
        self.chain: list = []  # consumed events [(event_id, ts_ns, type, value), ...]
        self.deadline_ns: Optional[int] = None
        self.seq = seq  # arming order, tie-break for timeout firing
        # historical replay + HISTORICAL_IGNORE_TIMEOUT: the reference sets
        # the timeout to null (AEventProcessor.php:377-383), keeping the
        # instance alive so a late event can still complete it.
        self.no_timeout = no_timeout

    def wants(self, etype: str) -> bool:
        group = self.rule.events[self.gi]
        return etype in group or EVENT_MATCH_ANY in group

    def consume(self, ev: tuple) -> bool:
        """Consume one event; returns True when the instance completed."""
        self.chain.append(ev)
        limit = self.rule.chain_limit
        if limit is not None and len(self.chain) > limit:
            del self.chain[: len(self.chain) - limit]
        at_last_group = self.gi == len(self.rule.events) - 1
        if at_last_group and not self.rule.continuous:
            self.deadline_ns = None
            return True
        if not at_last_group:
            self.gi += 1
        timeout_s = self.rule.timeout_s
        self.deadline_ns = (
            ev[1] + int(timeout_s * 1e9)
            if timeout_s is not None and not self.no_timeout
            else None
        )
        return False


def _emit(rows: list, rule: Rule, key, outcome: str, fire_ns: int, inst: _Instance) -> None:
    chain = inst.chain
    values = [e[3] for e in chain if e[3] is not None and e[3] == e[3]]
    payload = None
    cb = rule.on_complete if outcome == "completed" else (
        rule.on_timeout if outcome == "timeout" else None
    )
    if cb is not None:
        payload = json.dumps(
            cb([_ev_dict(e) for e in chain], key), sort_keys=True, default=str
        )
    rows.append(
        (
            rule.name,
            None if key is None else str(key),
            outcome,
            fire_ns,
            chain[0][0] if chain else None,
            chain[-1][0] if chain else None,
            len(chain),
            float(sum(values)) if values else None,
            payload,
        )
    )


def _ev_dict(ev: tuple) -> dict:
    return {"event_id": ev[0], "ts_ns": ev[1], "event_type": ev[2], "value": ev[3]}


def _run_state_machines(pdf: pd.DataFrame, rules: Sequence[Rule], key_col: Optional[str],
                        historical: bool = False) -> pd.DataFrame:
    """The per-key event loop (CorrelationEngine::handle, php-ec semantics)."""
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    key = pdf[key_col].iloc[0] if key_col is not None and len(pdf) else None

    live: dict[str, List[_Instance]] = {r.name: [] for r in rules}
    rows: list = []
    seq = 0

    ts_ns = pdf["ts"].astype("int64").to_numpy()
    eids = pdf["event_id"].to_numpy()
    etypes = pdf["event_type"].to_numpy()
    values = pdf["value"].to_numpy() if "value" in pdf else [None] * len(pdf)

    def fire_due(limit_ns: Optional[int]) -> None:
        # single engine-wide deadline ordering (CorrelationEngine.php:517-521)
        due = [
            (inst.deadline_ns, inst.seq, r, inst)
            for r in rules
            for inst in live[r.name]
            if inst.deadline_ns is not None
            and (limit_ns is None or inst.deadline_ns <= limit_ns)
        ]
        for deadline, _, r, inst in sorted(due, key=lambda x: (x[0], x[1])):
            live[r.name].remove(inst)
            _emit(rows, r, key, "timeout", deadline, inst)

    for i in range(len(pdf)):
        t = int(ts_ns[i])
        # batch clock: fire timeouts up to t − 1 ms (CorrelationEngine.php:191-202)
        fire_due(t - _MS)
        ev = (int(eids[i]), t, etypes[i], None if values[i] != values[i] else values[i])
        suppressed = False
        for r in rules:
            if suppressed:
                break
            handled = False
            for inst in list(live[r.name]):
                if not inst.wants(ev[2]):
                    continue
                if inst.deadline_ns is not None and t > inst.deadline_ns:
                    # acceptEventTime failed ⇒ instance times out now
                    # (AEventProcessor.php:357-396); fire_ts is the deadline.
                    live[r.name].remove(inst)
                    _emit(rows, r, key, "timeout", inst.deadline_ns, inst)
                    continue
                if r.accept is not None and not r.accept(
                    _ev_dict(ev), [_ev_dict(e) for e in inst.chain]
                ):
                    continue
                handled = True
                if inst.consume(ev):
                    live[r.name].remove(inst)
                    _emit(rows, r, key, "completed", t, inst)
                elif r.emit_progress:
                    _emit(rows, r, key, "progress", t, inst)
            # per-class dedup (CorrelationEngine.php:252-254)
            group0 = r.events[0]
            if not handled and (ev[2] in group0 or EVENT_MATCH_ANY in group0):
                if r.accept is None or r.accept(_ev_dict(ev), []):
                    inst = _Instance(
                        r, seq, no_timeout=historical and r.historical_ignore_timeout
                    )
                    seq += 1
                    handled = True
                    if inst.consume(ev):
                        _emit(rows, r, key, "completed", t, inst)
                    else:
                        live[r.name].append(inst)
                        if r.emit_progress:
                            _emit(rows, r, key, "progress", t, inst)
            if handled and r.suppress:
                suppressed = True

    # end of stream ≈ Stop control message: drain remaining timeouts
    fire_due(None)
    for r in rules:
        if r.emit_final:
            for inst in live[r.name]:
                _emit(rows, r, key, "final", int(ts_ns[-1]) if len(pdf) else 0, inst)

    out = pd.DataFrame(
        rows,
        columns=[
            "rule", "key", "outcome", "fire_ts", "start_event_id",
            "last_event_id", "n_events", "value_sum", "payload",
        ],
    )
    if len(out):
        out["fire_ts"] = pd.to_datetime(out["fire_ts"], unit="ns")
    else:
        out["fire_ts"] = pd.Series([], dtype="datetime64[ns]")
    return out


def _make_runner(rules: Sequence[Rule], key_col: str, historical: bool):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _run_state_machines(pdf, rules, key_col, historical)

    return run


def correlate_state_machine(
    events: DataFrame, rules: Sequence[Rule], historical: bool = False
) -> DataFrame:
    """General path: group by correlation key, run the state machine per key.

    Rules sharing a key column run in ONE pass so suppression / rule-order
    semantics hold across them. Rules with different keys run in separate
    passes (suppression across differently-keyed rules is rejected — it
    would require a global serial order that does not scale).
    """
    if not rules:
        return events.sparkSession.createDataFrame([], EMISSION_SCHEMA)
    by_key: dict[Optional[str], list[Rule]] = {}
    for r in rules:
        by_key.setdefault(r.key, []).append(r)
    if len(by_key) > 1 and any(r.suppress for r in rules):
        raise ValueError("suppressing rules must share one correlation key column")

    outs = []
    for key_col, group_rules in by_key.items():
        needed_types = set()
        unrestricted = False
        for r in group_rules:
            for g in r.events:
                if EVENT_MATCH_ANY in g:
                    unrestricted = True
                needed_types.update(g)
        src = events
        if not unrestricted:
            # prune the scan: only event types any rule can consume
            src = src.filter(F.col("event_type").isin(sorted(needed_types)))
        cols = ["event_id", "ts", "event_type", "value"]
        if key_col is not None:
            src = src.select(key_col, *cols)
            grouped = src.groupBy(key_col)
        else:
            src = src.select(F.lit(1).alias("__k"), *cols)
            grouped = src.groupBy("__k")

        runner = _make_runner(
            list(group_rules), key_col if key_col is not None else "__k", historical
        )
        outs.append(grouped.applyInPandas(runner, schema=EMISSION_SCHEMA))

    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


def correlate(events: DataFrame, rules: Sequence[Rule], historical: bool = False) -> DataFrame:
    """Run rules over a batch event stream, choosing the best physical plan
    per rule: relational window plan for simple 2-step sequences, state
    machine otherwise. Emissions share EMISSION_SCHEMA across strategies."""
    from .relational import (
        compile_keyless_counter,
        compile_single_match,
        compile_two_step_sequence,
        is_keyless_counter,
        is_relational_compilable,
        is_single_match,
    )

    if not rules:
        return events.sparkSession.createDataFrame([], EMISSION_SCHEMA)
    if any(r.suppress for r in rules):
        # suppression makes rule-list order semantic across ALL rules
        # (CorrelationEngine.php:231-236) — one serial pass required
        return correlate_state_machine(events, rules, historical=historical)

    def _fast(r: Rule) -> bool:
        # historical replay with HISTORICAL_IGNORE_TIMEOUT keeps instances
        # alive past their deadline (AEventProcessor.php:377-383) — the
        # window plan can't express that, so route to the state machine.
        if historical and r.historical_ignore_timeout and r.timeout_s is not None:
            return False
        return is_relational_compilable(r)

    relational = [r for r in rules if _fast(r)]
    general = [r for r in rules if not _fast(r)]
    outs = [
        compile_keyless_counter(events, r) if is_keyless_counter(r)
        else compile_single_match(events, r) if is_single_match(r)
        else compile_two_step_sequence(events, r)
        for r in relational
    ]
    if general:
        outs.append(correlate_state_machine(events, general, historical=historical))
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
