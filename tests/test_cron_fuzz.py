"""Randomized differential fuzz for the cron field matcher (W9).

The deterministic tests pin steps, ranges, macros, tz and the Vixie
day-OR rule (tests/test_model_and_compilers.py::TestCronExpressions),
and the hash gate runs cep_cron_hourly / cep_cron_expr against a DuckDB
oracle whose SQL re-implements the schedule — but both cover hand-picked
expressions. This fuzz sweeps RANDOM 5-field expressions over random
multi-day windows against an independent pure-Python minute matcher
(same spec grammar, deliberately different evaluation shape: per-minute
membership checks via datetime, no set materialization, no Spark).

Coverage is GUARANTEED, not hoped-for (a review of the first version
found the committed seeds never generated the branches the docstring
claimed): every window crosses a month boundary by construction, every
random expression is regenerated until its expected fire set is
non-empty (an empty-vs-empty comparison catches nothing), and a
constructed block per seed always exercises the Vixie day-OR with a
stepped day-of-month, a dow list mixing 7 and 0, and the bare 'N/step'
(= N-max/step) form. Timestamps round-trip as session-timezone strings
on both sides, so the test is independent of the host process timezone.
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
        # bare 'N/step' means 'N-max/step' (the engine's dedicated branch)
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
    """Brute-force per-minute matcher with the Vixie day-OR rule.
    Returns formatted 'yyyy-mm-dd HH:MM' strings (tz-independent)."""
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
            out.add(t.strftime("%Y-%m-%d %H:%M"))
        t += timedelta(minutes=1)
    return out


def _random_field(rng: random.Random, lo: int, hi: int) -> str:
    def one_part() -> str:
        kind = rng.randrange(5)
        if kind == 0:
            return str(rng.randint(lo, hi))
        if kind == 1:
            a = rng.randint(lo, hi - 1)
            return f"{a}-{rng.randint(a, hi)}"
        if kind == 2:
            a = rng.randint(lo, hi - 1)
            return f"{a}-{rng.randint(a, hi)}/{rng.randint(1, 20)}"
        if kind == 3:
            # bare 'N/step' — the N-to-max stepped form
            return f"{rng.randint(lo, hi)}/{rng.randint(1, 20)}"
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


def _constructed_expressions(rng: random.Random, start: datetime) -> list:
    """Expressions the random grammar is not guaranteed to hit, anchored
    to the window so each one actually fires:

    - Vixie day-OR with a STEPPED day-of-month and a restricted dow
      (regression target: ANDing the two day fields);
    - a dow list mixing 7 and 0 (both = Sunday, the %7 normalization);
    - bare 'N/step' in the minute field (fires N, N+step, ... to 59).
    """
    dow_in_window = (start.weekday() + 2) % 7  # day 2 of the window
    return [
        f"0 */6 {start.day}-31/2 * {dow_in_window}",
        f"*/30 * * * 7,0,{dow_in_window}",
        f"{rng.randint(0, 20)}/13 */3 * * *",
    ]


@pytest.mark.parametrize("seed", [11, 42])
def test_cron_expression_fires_match_reference(spark, seed):
    import pyspark.sql.functions as F

    from php_ec_spark.functions import cron_expression_fires

    rng = random.Random(seed)
    # window GUARANTEED to cross a month boundary: start on day 27-29 of
    # a random month, span 3-6 days; minute offsets keep the bounds off
    # minute boundaries (the sequence-start truncation + >= lo filter is
    # part of the contract under test)
    start = datetime(
        2024, rng.randint(1, 12), rng.randint(27, 29),
        rng.randint(0, 23), rng.randint(0, 59), rng.randint(1, 59),
    )
    end = start + timedelta(days=rng.randint(3, 6), minutes=rng.randint(0, 600))
    assert start.month != end.month  # the boundary claim, pinned
    # timestamps enter as SESSION-TZ strings and leave via date_format —
    # no naive-datetime round trip through the host process timezone
    ev = spark.createDataFrame(
        [(1, start.strftime("%Y-%m-%d %H:%M:%S"), "tick"),
         (2, end.strftime("%Y-%m-%d %H:%M:%S"), "tick")],
        "event_id long, ts_s string, event_type string",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "event_type")

    exprs = []
    while len(exprs) < 4:
        expr = _random_expression(rng)
        if _reference_fires(start, end, expr.split()):
            exprs.append(expr)  # non-vacuous only: empty==empty pins nothing
    exprs += _constructed_expressions(rng, start)

    for expr in exprs:
        want = _reference_fires(start, end, expr.split())
        assert want, f"vacuous expression slipped through: {expr!r}"
        rows = (
            cron_expression_fires(ev, expr)
            .select(F.date_format("fire_ts", "yyyy-MM-dd HH:mm").alias("m"))
            .collect()
        )
        got = [r.m for r in rows]
        assert len(got) == len(set(got)), (
            f"seed={seed} expr={expr!r}: duplicate scheduled emissions"
        )
        assert set(got) == want, (
            f"seed={seed} expr={expr!r} window=[{start},{end}]: "
            f"{len(set(got) - want)} spurious, {len(want - set(got))} "
            f"missing (of {len(want)} expected)"
        )
