"""Live cron parity (W9 streaming, round-6 VERDICT item 7).

Two halves of Rule/Cron.php's live behavior:

- ``cron_stream_fires``: the 5-field schedule evaluated on a streaming
  tick source (heartbeat union) with per-minute dedup, plus the
  ``@reboot`` lifecycle trigger (Cron.php:38-51 initialAcceptedEvents).
- OnSchedule alarm-then-fire ordering (TimeoutRule.php:10-28) through
  the correlation engine itself under ``clock="processing"``: a
  scheduled rule ARMS a deadline (alarm), FIRES it as a timer when the
  tick clock passes it, and re-arms the next run through the live chain
  feedback loop (Cron.php:97-113 nextRun).
"""

from __future__ import annotations

import pytest
import json
import time
import uuid

from php_ec_spark.functions import cron_stream_fires
from php_ec_spark.model import CONTROL_MSG_START
from php_ec_spark.rules import match_single
from php_ec_spark.rules.base import Rule
from php_ec_spark.streaming import (
    ActionDispatcher,
    ndjson_dir_source,
    start_chained_correlation,
)


def _tick(eid, ts, etype=CONTROL_MSG_START):
    return {
        "event_id": eid, "ts": ts, "user_id": None,
        "event_type": etype, "value": None, "props": None,
    }


def _run_capture(spark, stream_df, ckpt) -> list:
    rows: list = []
    q = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .foreachBatch(lambda df, bid: rows.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    assert q.exception() is None
    return rows


def test_five_field_cron_fires_on_tick_stream(spark, tmp_path):
    """'*/15 * * * *' over a heartbeat-style tick stream: one 'scheduled'
    emission per matching MINUTE (duplicate ticks inside a minute dedup;
    fire_ts is the minute boundary — identical to the batch
    cron_expression_fires value, so replay and live line up)."""
    src = tmp_path / f"ticks-{uuid.uuid4().hex[:8]}"
    src.mkdir()
    hb = "PHP-EC:Engine:Heartbeat"
    with open(src / "ticks.json", "w") as f:
        for i, ts in enumerate([
            "2024-03-01T00:00:30Z",  # minute 0  -> fires 00:00
            "2024-03-01T00:07:10Z",  # no match
            "2024-03-01T00:15:05Z",  # minute 15 -> fires 00:15
            "2024-03-01T00:15:40Z",  # same minute: deduped
            "2024-03-01T00:30:00Z",  # minute 30 -> fires 00:30
            "2024-03-01T01:02:00Z",  # no match
        ]):
            f.write(json.dumps(_tick(-2000 - i, ts, hb)) + "\n")

    fires = cron_stream_fires(
        ndjson_dir_source(spark, str(src)), "*/15 * * * *", name="quarterly"
    )
    rows = _run_capture(spark, fires, tmp_path / "ck")
    assert [str(r["fire_ts"]) for r in sorted(rows, key=lambda r: r["fire_ts"])] == [
        "2024-03-01 00:00:00",
        "2024-03-01 00:15:00",
        "2024-03-01 00:30:00",
    ]
    assert {(r["rule"], r["outcome"]) for r in rows} == {("quarterly", "scheduled")}


def test_reboot_cron_fires_on_control_message(spark, tmp_path):
    """'@reboot' fires once per lifecycle Start/Restored control message,
    at the message's own ts (Cron.php initialAcceptedEvents)."""
    src = tmp_path / f"boot-{uuid.uuid4().hex[:8]}"
    src.mkdir()
    with open(src / "boot.json", "w") as f:
        f.write(json.dumps(_tick(-1, "2024-03-01T08:00:00Z")) + "\n")
        f.write(json.dumps(
            _tick(-2, "2024-03-01T08:00:01Z", "PHP-EC:Engine:Heartbeat")
        ) + "\n")

    fires = cron_stream_fires(
        ndjson_dir_source(spark, str(src)), "@reboot", name="boot_job"
    )
    rows = _run_capture(spark, fires, tmp_path / "ck")
    assert [(r["rule"], r["outcome"], str(r["fire_ts"])) for r in rows] == [
        ("boot_job", "scheduled", "2024-03-01 08:00:00"),
    ]


@pytest.mark.slow
def test_onschedule_alarm_then_fire_recurrence(spark, tmp_path):
    """OnSchedule through the live engine (TimeoutRule.php:10-28 +
    Cron.php:97-113 nextRun): the scheduled rule arms on @reboot's
    control message (alarm), FIRES as a processing-clock timer, and
    re-arms off its own derived timeout event through the chain feedback
    loop — each fire_ts exactly one period after the previous (the
    deadline ladder is event-time even though the TickClock drives the
    firing), and the @reboot rule completes before the first fire."""
    src = tmp_path / f"src-{uuid.uuid4().hex[:8]}"
    src.mkdir()
    boot_ts = "2024-01-01T00:00:00Z"
    with open(src / "boot.json", "w") as f:
        f.write(json.dumps(_tick(-1, boot_ts)) + "\n")

    rules = [
        match_single("reboot", [CONTROL_MSG_START], key=None),
        # arm on boot or on our own derived timeout; the second group's
        # type never arrives, so every armed instance times out at +1 s —
        # the OnSchedule fire — and the derived 'sched:timeout' event
        # re-arms the next run
        Rule(
            name="sched",
            events=[[CONTROL_MSG_START, "sched:timeout"], ["__never__"]],
            key=None,
            timeout="PT1S",
        ),
    ]
    seen: list = []
    d = ActionDispatcher()
    d.register("capture", fn=lambda rows: seen.extend(rows))
    q = start_chained_correlation(
        ndjson_dir_source(spark, str(src)),
        rules,
        checkpoint_dir=str(tmp_path / "ck"),
        chain_dir=str(tmp_path / "chain"),
        dispatcher=d,
        trigger_interval="300 milliseconds",
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if sum(r["rule"] == "sched" for r in seen) >= 3:
                break
            time.sleep(0.3)
    finally:
        q.stop()

    boots = [r for r in seen if r["rule"] == "reboot"]
    fires = sorted(
        (r for r in seen if r["rule"] == "sched"), key=lambda r: r["fire_ts"]
    )
    assert len(boots) == 1 and boots[0]["outcome"] == "completed"
    assert len(fires) >= 3
    assert all(r["outcome"] == "timeout" for r in fires)
    # alarm-then-fire: the boot (alarm trigger) precedes every fire
    assert str(boots[0]["fire_ts"]).startswith("2024-01-01 00:00:00")
    # nextRun ladder: each fire exactly one period after the previous
    expect = ["2024-01-01 00:00:0%d" % i for i in (1, 2, 3)]
    assert [str(r["fire_ts"])[:19] for r in fires[:3]] == expect
