"""Differential fuzz for the round-7 EngineCore rewrite.

The bucket-dispatch + lazy-deadline-heap core must be OBSERVABLY
IDENTICAL to the flat algorithm it replaced: same emissions in the same
order, same serialized state, same next_deadline. `_FlatCore` below is a
faithful reimplementation of the pre-rewrite algorithm (survivor-list
scan per event, full-scan fire_due) — kept deliberately simple so it is
obviously correct — and hypothesis drives both through random rule sets
and event streams. No Spark session: thousands of examples run in
seconds, which is the point (the Spark-level parity fuzzes cover the
plan layer; this one pins the state machine itself).
"""

from __future__ import annotations

import pytest
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from php_ec_spark.engine.core import EngineCore, _ev_dict
from php_ec_spark.rules import Rule

_MS = 1_000_000


def _accept_has_value(ev, chain):
    """Deterministic accept predicate: only events carrying a real value
    (not None/NaN) are accepted — exercises the accept-reject re-append
    branch (engine/core.py bucket re-insertion ordering)."""
    v = ev["value"]
    return v is not None and v == v


def _accept_chain_under_2(ev, chain):
    """Deterministic accept predicate over the CHAIN argument: rejects
    once two events accumulated — the reject path fires mid-sequence."""
    return len(chain) < 2


class _FlatInstance:
    __slots__ = ("rule", "gi", "chain", "deadline_ns", "seq", "no_timeout")

    def __init__(self, rule, seq, no_timeout=False):
        self.rule = rule
        self.gi = 0
        self.chain = []
        self.deadline_ns = None
        self.seq = seq
        self.no_timeout = no_timeout

    def wants(self, etype):
        r = self.rule
        return r._group_any[self.gi] or etype in r._group_sets[self.gi]

    def consume(self, ev):
        r = self.rule
        self.chain.append(ev)
        if r.chain_limit is not None and len(self.chain) > r.chain_limit:
            del self.chain[: len(self.chain) - r.chain_limit]
        at_last = self.gi == len(r.events) - 1
        if at_last and not r.continuous:
            self.deadline_ns = None
            return True
        if not at_last:
            self.gi += 1
        tns = r._timeout_ns
        self.deadline_ns = (
            ev[1] + tns if tns is not None and not self.no_timeout else None
        )
        return False


class _FlatCore:
    """Pre-round-7 EngineCore algorithm, minus the perf machinery."""

    def __init__(self, rules, key, historical=False):
        self.rules = rules
        self.key = key
        self.historical = historical
        self.live = {r.name: [] for r in rules}
        self.seq = 0
        self.rows = []

    def _emit(self, rule, outcome, fire_ns, inst):
        chain = inst.chain
        values = [e[3] for e in chain if e[3] is not None and e[3] == e[3]]
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
                None,
            )
        )

    def fire_due(self, limit_ns):
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

    def next_deadline(self):
        ds = [
            i.deadline_ns
            for r in self.rules
            for i in self.live[r.name]
            if i.deadline_ns is not None
        ]
        return min(ds) if ds else None

    def handle(self, ev):
        t, etype = ev[1], ev[2]
        self.fire_due(t - _MS)
        suppressed = False
        for r in self.rules:
            if suppressed:
                break
            handled = False
            survivors = []
            for inst in self.live[r.name]:
                if not inst.wants(etype):
                    survivors.append(inst)
                    continue
                if inst.deadline_ns is not None and t > inst.deadline_ns:
                    self._emit(r, "timeout", inst.deadline_ns, inst)
                    continue
                if r.accept is not None and not r.accept(
                    _ev_dict(ev), [_ev_dict(e) for e in inst.chain]
                ):
                    # accept-reject: the instance SURVIVES untouched and
                    # the event does not count as handled by it
                    survivors.append(inst)
                    continue
                handled = True
                if inst.consume(ev):
                    self._emit(r, "completed", t, inst)
                else:
                    survivors.append(inst)
                    if r.emit_progress:
                        self._emit(r, "progress", t, inst)
            self.live[r.name] = survivors
            if not handled and (r._group_any[0] or etype in r._group_sets[0]):
                if r.accept is None or r.accept(_ev_dict(ev), []):
                    inst = _FlatInstance(
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
                        if r.emit_progress:
                            self._emit(r, "progress", t, inst)
            if handled and r.suppress:
                suppressed = True

    def finish(self, last_ts_ns):
        self.fire_due(None)
        for r in self.rules:
            if r.emit_final:
                for inst in self.live[r.name]:
                    self._emit(r, "final", last_ts_ns, inst)

    def to_state(self):
        return json.dumps(
            {
                "seq": self.seq,
                "instances": [
                    {
                        "rule": inst.rule.name,
                        "gi": inst.gi,
                        "chain": inst.chain,
                        "deadline_ns": inst.deadline_ns,
                        "seq": inst.seq,
                        "no_timeout": inst.no_timeout,
                    }
                    for r in self.rules
                    for inst in self.live[r.name]
                ],
            }
        )


# -- strategies -------------------------------------------------------------

_TYPES = ["a", "b", "c"]

_group = st.one_of(
    st.just(("*",)),
    st.lists(st.sampled_from(_TYPES), min_size=1, max_size=2, unique=True)
    .map(tuple),
)


@st.composite
def _rule(draw, idx: int):
    return Rule(
        name=f"r{idx}",
        events=tuple(draw(st.lists(_group, min_size=1, max_size=3))),
        key="user_id",
        timeout=draw(st.sampled_from([None, 3.0, 10.0, 45.0])),
        continuous=draw(st.booleans()),
        chain_limit=draw(st.sampled_from([None, 1, 2, 4])),
        suppress=draw(st.booleans()),
        emit_progress=draw(st.booleans()),
        emit_final=draw(st.booleans()),
        historical_ignore_timeout=draw(st.booleans()),
        accept=draw(
            st.sampled_from([None, _accept_has_value, _accept_chain_under_2])
        ),
    )


@st.composite
def _case(draw):
    n_rules = draw(st.integers(min_value=1, max_value=3))
    rules = [draw(_rule(i)) for i in range(n_rules)]
    # sorted (ts, event_id) stream with collisions, like the partition
    # runner delivers; seconds scale so the 3-45 s timeouts interleave
    offs = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=90),
                min_size=1,
                max_size=40,
            )
        )
    )
    events = [
        (
            i,
            s * 1_000_000_000,
            draw(st.sampled_from(_TYPES + ["z"])),  # z: no rule wants it
            draw(st.sampled_from([None, float("nan"), 1.5])),
        )
        for i, s in enumerate(offs)
    ]
    historical = draw(st.booleans())
    return rules, events, historical


@given(_case())
@settings(max_examples=2000, deadline=None)
@pytest.mark.slow
def test_rewritten_core_equals_flat_reference(case):
    rules, events, historical = case
    new = EngineCore(rules, "k1", historical=historical)
    old = _FlatCore(rules, "k1", historical=historical)
    for ev in events:
        new.handle(ev)
        old.handle(ev)
    # mid-stream observables agree
    assert new.next_deadline() == old.next_deadline()
    assert json.loads(new.to_state()) == json.loads(old.to_state())
    last = events[-1][1]
    new.finish(last)
    old.finish(last)
    assert new.take_rows() == old.rows  # emissions, INCLUDING order
    assert not new.has_live() or any(
        i["deadline_ns"] is None for i in json.loads(new.to_state())["instances"]
    )


@given(_case())
@settings(max_examples=500, deadline=None)
def test_state_roundtrip_mid_stream(case):
    """Serialize/restore halfway through the stream (what every streaming
    micro-batch does) and keep going: must equal the uninterrupted run."""
    rules, events, historical = case
    mid = len(events) // 2
    straight = EngineCore(rules, "k1", historical=historical)
    hopped = EngineCore(rules, "k1", historical=historical)
    for ev in events[:mid]:
        straight.handle(ev)
        hopped.handle(ev)
    rows_a = hopped.take_rows()
    assert rows_a == straight.take_rows()  # first halves agree
    hopped = EngineCore.from_state(
        rules, "k1", hopped.to_state(), historical=historical
    )
    for ev in events[mid:]:
        straight.handle(ev)
        hopped.handle(ev)
    last = events[-1][1]
    straight.finish(last)
    hopped.finish(last)
    assert hopped.take_rows() == straight.take_rows()
    assert json.loads(hopped.to_state()) == json.loads(straight.to_state())
