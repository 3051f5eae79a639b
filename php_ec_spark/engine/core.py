"""Shared per-key event-loop core — used by both the batch state machine
(`engine.batch`, via applyInPandas) and the live streaming engine
(`engine.streaming`, via applyInPandasWithState).

Faithful to CorrelationEngine::handle (reference CorrelationEngine.php:
171-328): batch-clock timeout replay at t−1 ms, acceptEventTime deadline
check, per-class dedup, EVENT_SUPPRESS rule ordering, end-of-stream drain.
The streaming engine persists/restores `EngineCore` state across
micro-batches (the Spark state store replaces the reference's SaveHandler
subsystem, FileAdapter.php:73-233).
"""

from __future__ import annotations

import json
from typing import List, Optional, Sequence

from ..rules.base import Rule

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
        rule = self.rule
        return rule._group_any[self.gi] or etype in rule._group_sets[self.gi]

    def consume(self, ev: tuple) -> bool:
        """Consume one event; returns True when the instance completed."""
        rule = self.rule
        self.chain.append(ev)
        limit = rule.chain_limit
        if limit is not None and len(self.chain) > limit:
            del self.chain[: len(self.chain) - limit]
        at_last_group = self.gi == len(rule.events) - 1
        if at_last_group and not rule.continuous:
            self.deadline_ns = None
            return True
        if not at_last_group:
            self.gi += 1
        timeout_ns = rule._timeout_ns
        self.deadline_ns = (
            ev[1] + timeout_ns
            if timeout_ns is not None and not self.no_timeout
            else None
        )
        return False

    def to_state(self) -> dict:
        return {
            "rule": self.rule.name,
            "gi": self.gi,
            "chain": self.chain,
            "deadline_ns": self.deadline_ns,
            "seq": self.seq,
            "no_timeout": self.no_timeout,
        }

    @classmethod
    def from_state(cls, rule: Rule, d: dict) -> "_Instance":
        inst = cls(rule, d["seq"], no_timeout=d.get("no_timeout", False))
        inst.gi = d["gi"]
        inst.chain = [tuple(e) for e in d["chain"]]
        inst.deadline_ns = d["deadline_ns"]
        return inst


def _ev_dict(ev: tuple) -> dict:
    return {"event_id": ev[0], "ts_ns": ev[1], "event_type": ev[2], "value": ev[3]}


class EngineCore:
    """Per-key correlation engine: the reference's single-threaded event
    loop, scoped to one correlation-key partition."""

    def __init__(self, rules: Sequence[Rule], key, historical: bool = False):
        self.rules = rules
        self.key = key
        self.historical = historical
        self.live: dict[str, List[_Instance]] = {r.name: [] for r in rules}
        self.seq = 0
        self.rows: list = []
        # LOWER BOUND on the earliest live deadline (None = no deadlines).
        # fire_due early-returns on it — the common per-event call fires
        # nothing, and scanning every instance each event measured ~15% of
        # the hot loop. Staleness is only ever DOWNWARD (an instance leaving
        # without a scan leaves the bound low), which is safe: a low bound
        # causes a scan, never a missed firing. Every deadline assignment
        # must go through _note_deadline to preserve the invariant.
        self._min_deadline: Optional[int] = None

    def _note_deadline(self, d: Optional[int]) -> None:
        if d is not None and (self._min_deadline is None or d < self._min_deadline):
            self._min_deadline = d

    # -- emission ---------------------------------------------------------
    def _emit(self, rule: Rule, outcome: str, fire_ns: int, inst: _Instance) -> None:
        chain = inst.chain
        values = [e[3] for e in chain if e[3] is not None and e[3] == e[3]]
        payload = None
        cb = rule.on_complete if outcome == "completed" else (
            rule.on_timeout if outcome == "timeout" else None
        )
        if cb is not None:
            # The reference PANICS when a rule callback throws ("Rules must
            # not throw exceptions", Scheduler.php:339-349) — one bad rule
            # kills the engine. We quarantine instead: the emission survives
            # with outcome 'error' and the exception in the payload, scoped
            # to this instance; every other key/rule keeps processing.
            try:
                payload = json.dumps(
                    cb([_ev_dict(e) for e in chain], self.key),
                    sort_keys=True,
                    default=str,
                )
            except Exception as e:  # noqa: BLE001 - quarantine by design
                payload = json.dumps({"error": repr(e), "during": outcome})
                outcome = "error"
        self.rows.append(
            (
                rule.name,
                None if self.key is None else str(self.key),
                outcome,
                fire_ns,
                chain[0][0] if chain else None,
                chain[-1][0] if chain else None,
                len(chain),
                float(sum(values)) if values else None,
                payload,
            )
        )

    # -- clock ------------------------------------------------------------
    def fire_due(self, limit_ns: Optional[int]) -> None:
        """Fire every pending timeout with deadline ≤ limit (None = all) in
        single engine-wide deadline order (CorrelationEngine.php:517-521)."""
        md = self._min_deadline
        if md is None or (limit_ns is not None and md > limit_ns):
            return  # nothing can be due (md is a lower bound on all deadlines)
        due = [
            (inst.deadline_ns, inst.seq, r, inst)
            for r in self.rules
            for inst in self.live[r.name]
            if inst.deadline_ns is not None
            and (limit_ns is None or inst.deadline_ns <= limit_ns)
        ]
        for deadline, _, r, inst in sorted(due, key=lambda x: (x[0], x[1])):
            self.live[r.name].remove(inst)
            self._emit(r, "timeout", deadline, inst)
        remaining = [
            inst.deadline_ns
            for r in self.rules
            for inst in self.live[r.name]
            if inst.deadline_ns is not None
        ]
        self._min_deadline = min(remaining) if remaining else None

    def next_deadline(self) -> Optional[int]:
        """Earliest pending deadline — the streaming timer to arm
        (single-timer scheduling, CorrelationEngine.php:530-563)."""
        deadlines = [
            inst.deadline_ns
            for r in self.rules
            for inst in self.live[r.name]
            if inst.deadline_ns is not None
        ]
        return min(deadlines) if deadlines else None

    def has_live(self) -> bool:
        return any(self.live[r.name] for r in self.rules)

    def _safe_accept(self, rule: Rule, ev: tuple, chain: list) -> bool:
        """accept-predicate with quarantine: a throwing predicate rejects
        the event and surfaces one 'error' emission instead of killing the
        engine (deviation from Scheduler.php:339-349, by design)."""
        try:
            return bool(rule.accept(_ev_dict(ev), [_ev_dict(e) for e in chain]))
        except Exception as e:  # noqa: BLE001 - quarantine by design
            self.rows.append(
                (
                    rule.name,
                    None if self.key is None else str(self.key),
                    "error",
                    ev[1],
                    ev[0],
                    ev[0],
                    0,
                    None,
                    json.dumps({"error": repr(e), "during": "accept"}),
                )
            )
            return False

    # -- hot path ---------------------------------------------------------
    def handle(self, ev: tuple) -> None:
        """One event through every rule in declared order
        (CorrelationEngine.php:171-328). ev = (event_id, ts_ns, type, value)."""
        t = ev[1]
        etype = ev[2]
        # batch clock: fire timeouts up to t − 1 ms (CorrelationEngine.php:191-202)
        self.fire_due(t - _MS)
        suppressed = False
        for r in self.rules:
            if suppressed:
                break
            handled = False
            live_r = self.live[r.name]
            if live_r:
                # survivor-list rewrite instead of copy + O(n) remove():
                # instance churn (complete/timeout) is the common case for
                # short sequences, and list.remove scans measured on the
                # per-event hot path.
                survivors = []
                for inst in live_r:
                    if not inst.wants(etype):
                        survivors.append(inst)
                        continue
                    if inst.deadline_ns is not None and t > inst.deadline_ns:
                        # acceptEventTime failed ⇒ instance times out now
                        # (AEventProcessor.php:357-396); fire_ts is the deadline.
                        self._emit(r, "timeout", inst.deadline_ns, inst)
                        continue
                    if r.accept is not None and not self._safe_accept(r, ev, inst.chain):
                        survivors.append(inst)
                        continue
                    handled = True
                    if inst.consume(ev):
                        self._emit(r, "completed", t, inst)
                    else:
                        survivors.append(inst)
                        self._note_deadline(inst.deadline_ns)
                        if r.emit_progress:
                            self._emit(r, "progress", t, inst)
                self.live[r.name] = survivors
            # per-class dedup (CorrelationEngine.php:252-254)
            if not handled and (r._group_any[0] or etype in r._group_sets[0]):
                if r.accept is None or self._safe_accept(r, ev, []):
                    inst = _Instance(
                        r,
                        self.seq,
                        no_timeout=self.historical and r.historical_ignore_timeout,
                    )
                    self.seq += 1
                    handled = True
                    if inst.consume(ev):
                        self._emit(r, "completed", t, inst)
                    else:
                        self.live[r.name].append(inst)
                        self._note_deadline(inst.deadline_ns)
                        if r.emit_progress:
                            self._emit(r, "progress", t, inst)
            if handled and r.suppress:
                suppressed = True

    def finish(self, last_ts_ns: int) -> None:
        """End-of-stream: drain all timeouts, then report continuous state
        (emit_final) — the Stop-message epilogue."""
        self.fire_due(None)
        for r in self.rules:
            if r.emit_final:
                for inst in self.live[r.name]:
                    self._emit(r, "final", last_ts_ns, inst)

    def take_rows(self) -> list:
        rows, self.rows = self.rows, []
        return rows

    # -- state persistence (streaming) ------------------------------------
    def to_state(self) -> str:
        return json.dumps(
            {
                "seq": self.seq,
                "instances": [
                    inst.to_state() for r in self.rules for inst in self.live[r.name]
                ],
            }
        )

    @classmethod
    def from_state(
        cls, rules: Sequence[Rule], key, blob: Optional[str], historical: bool = False
    ) -> "EngineCore":
        core = cls(rules, key, historical=historical)
        if not blob:
            return core
        d = json.loads(blob)
        core.seq = d["seq"]
        by_name = {r.name: r for r in rules}
        for s in d["instances"]:
            rule = by_name.get(s["rule"])
            if rule is None:
                # dropped-rule state: the reference aliases UndefinedRule
                # (functions.php:159-166) — we drop the instance explicitly.
                continue
            inst = _Instance.from_state(rule, s)
            core.live[rule.name].append(inst)
            core._note_deadline(inst.deadline_ns)
        return core
