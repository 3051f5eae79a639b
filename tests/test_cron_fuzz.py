"""Randomized differential fuzz for the cron field matcher (W9).

The deterministic tests pin steps, ranges, macros, tz and the Vixie
day-OR rule (tests/test_model_and_compilers.py::TestCronExpressions),
and the hash gate runs cep_cron_hourly / cep_cron_expr against a DuckDB
oracle whose SQL re-implements the schedule — but both cover hand-picked
expressions. This fuzz sweeps RANDOM 5-field expressions over random
multi-day windows against an independent pure-Python minute matcher
(same spec grammar, deliberately different evaluation shape: per-minute
membership checks via datetime, no set materialization, no Spark), so a
parser bug that only bites an unusual field combination — a stepped
range in the day-of-month field under the Vixie OR, a dow list mixing 7
and 0, a month-restricted step — can't hide behind the pinned specs.

Seeded windows span month and DOW boundaries; specs are generated
within each field's valid domain (out-of-range specs raise by contract
and are pinned elsewhere).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest


def _part_matches(value: int, part: str, lo: int, hi: int) -> bool:
    """One comma-part of a cron field, checked directly per value."""
    step = 1
    stepped = "/" in part
    if stepped:
        part, step_s = part.split("/", 1)
        step = int(step_s)
    if part == "*":
        start, end = lo, hi
    elif "-" in part:
        a, b = part.split("-", 1)
        start, end = int(a), int(b)
    elif stepped:
        start, end = int(part), hi
    else:
        start = end = int(part)
    return start <= value <= end and (value - start) % step == 0


def _field_matches(value: int, spec: str, lo: int, hi: int,
                   dow: bool = False) -> bool:
    if spec == "*":
        return True
    for part in spec.split(","):
        if dow:
            # cron dow treats 7 as Sunday(0): check both namings by
            # testing the raw value and value+7 against the part (the
            # engine normalizes allowed VALUES % 7 instead — different
            # evaluation shape, same semantics)
            if _part_matches(value, part, lo, hi) or _part_matches(
                value + 7, part, lo, hi
            ):
                return True
        elif _part_matches(value, part, lo, hi):
            return True
    return False


def _reference_fires(start: datetime, end: datetime, fields: list) -> set:
    """Brute-force per-minute matcher with the Vixie day-OR rule."""
    out = set()
    t = start.replace(second=0, microsecond=0)
    if t < start:
        t += timedelta(minutes=1)
    minute_s, hour_s, dom_s, month_s, dow_s = fields
    while t <= end:
        ok = (
            _field_matches(t.minute, minute_s, 0, 59)
            and _field_matches(t.hour, hour_s, 0, 23)
            and _field_matches(t.month, month_s, 1, 12)
        )
        if ok:
            dom_ok = _field_matches(t.day, dom_s, 1, 31)
            # python weekday(): Mon=0; cron: Sun=0
            dow_ok = _field_matches((t.weekday() + 1) % 7, dow_s, 0, 7,
                                    dow=True)
            if dom_s != "*" and dow_s != "*":
                ok = dom_ok or dow_ok  # Vixie OR
            elif dom_s != "*":
                ok = dom_ok
            elif dow_s != "*":
                ok = dow_ok
        if ok:
            out.add(t)
        t += timedelta(minutes=1)
    return out


def _random_field(rng: random.Random, lo: int, hi: int) -> str:
    def one_part() -> str:
        kind = rng.randrange(4)
        if kind == 0:
            return str(rng.randint(lo, hi))
        if kind == 1:
            a = rng.randint(lo, hi - 1)
            return f"{a}-{rng.randint(a, hi)}"
        if kind == 2:
            a = rng.randint(lo, hi - 1)
            return f"{a}-{rng.randint(a, hi)}/{rng.randint(1, 20)}"
        return f"*/{rng.randint(1, 20)}"

    if rng.random() < 0.35:
        return "*"
    return ",".join(one_part() for _ in range(rng.randint(1, 3)))


def _random_expression(rng: random.Random) -> str:
    return " ".join((
        _random_field(rng, 0, 59),
        _random_field(rng, 0, 23),
        _random_field(rng, 1, 31),
        _random_field(rng, 1, 12),
        # dow admits 7 (=Sunday) in specs
        _random_field(rng, 0, 7),
    ))


@pytest.mark.parametrize("seed", [11, 42])
def test_cron_expression_fires_match_reference(spark, seed):
    from php_ec_spark.functions import cron_expression_fires

    rng = random.Random(seed)
    # window crossing a month boundary and several DOW cycles; minute
    # offsets keep the bounds off minute boundaries (the sequence start
    # truncation + >= lo filter is part of the contract under test)
    start = datetime(2024, 1, 25, 7, 13, 29) + timedelta(
        days=rng.randint(0, 300), minutes=rng.randint(0, 1440)
    )
    end = start + timedelta(days=rng.randint(3, 6), minutes=rng.randint(0, 600))
    ev = spark.createDataFrame(
        [(1, start, "tick"), (2, end, "tick")],
        "event_id long, ts timestamp, event_type string",
    )
    for _ in range(4):
        expr = _random_expression(rng)
        want = _reference_fires(start, end, expr.split())
        got = {
            r.fire_ts
            for r in cron_expression_fires(ev, expr).collect()
        }
        assert got == want, (
            f"seed={seed} expr={expr!r} window=[{start},{end}]: "
            f"{len(got - want)} spurious, {len(want - got)} missing "
            f"(of {len(want)} expected)"
        )
