"""Property-based STREAMING parity: random event streams pushed through
``correlate_stream`` (availableNow, real micro-batches, state-store
carry-over, event-time timers) must emit exactly what the batch engine
replay emits.

Each example costs a full streaming query lifecycle (~5 s), so examples
are few but adversarial: duplicate timestamps, interleaved users, chunk
splits forcing state carry-over across micro-batches. A far-future
sentinel event (consumed by no rule) closes every pending deadline in
BOTH engines — streaming by advancing the watermark, batch by the replay
clock — so end-of-stream epilogue differences (EngineCore.finish drains
ALL timers; an availableNow stream never "ends") don't enter the
comparison.
"""

from __future__ import annotations

import json
import time
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from php_ec_spark.engine import correlate_state_machine
from php_ec_spark.engine.streaming import correlate_stream
from php_ec_spark.rules import match_single_continuously, sequence_rule
from php_ec_spark.streaming import ndjson_dir_source

EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),   # seconds, with collisions
        st.integers(min_value=1, max_value=2),    # user
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=1,
    max_size=10,
)

RULES = lambda: [  # noqa: E731 — fresh Rule objects per engine run
    sequence_rule("seq", ["a", "b"], key="user_id", timeout="PT20S"),
    match_single_continuously("gap", ["a", "b", "c"], key="user_id",
                              timeout="PT15S"),
]

SENTINEL_TS = "2024-01-01T03:00:00Z"  # hours past every possible deadline


def _rows(collected):
    out = []
    for r in collected:
        out.append(
            (
                r["rule"], r["key"], r["outcome"], str(r["fire_ts"]),
                r["start_event_id"], r["last_event_id"], r["n_events"],
                None if r["value_sum"] is None else round(r["value_sum"], 6),
            )
        )
    return sorted(out, key=str)


def _stream_rows(spark, tmp, rows_json):
    """Write events as 2+ ndjson chunks split at a strict ts boundary (so
    late-vs-watermark drops can't differ from batch), run correlate_stream
    availableNow with one file per trigger, return collected emissions."""
    src = tmp / f"ev-{uuid.uuid4().hex[:8]}"
    src.mkdir()
    half = len(rows_json) // 2
    cut = next(
        (i for i in range(half, len(rows_json))
         if rows_json[i]["ts"] != rows_json[i - 1]["ts"]),
        len(rows_json),
    )
    chunks = [c for c in (rows_json[:cut], rows_json[cut:]) if c]
    chunks.append([{
        "event_id": len(rows_json), "ts": SENTINEL_TS, "user_id": 1,
        "event_type": "zzz", "value": 0.0, "props": None,
    }])
    for i, chunk in enumerate(chunks):
        with open(src / f"{i:02d}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
        time.sleep(0.05)  # distinct mtimes → deterministic file order

    emissions = correlate_stream(
        ndjson_dir_source(spark, str(src), max_files_per_trigger=1), RULES()
    )
    collected: list = []
    q = (
        emissions.writeStream
        .option("checkpointLocation", str(tmp / f"ck-{uuid.uuid4().hex[:8]}"))
        .outputMode("append")
        .foreachBatch(lambda df, _bid: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    return collected


@pytest.mark.slow
class TestStreamingParity:
    @settings(
        max_examples=4, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(evs=EVENTS)
    def test_availablenow_matches_batch_replay(self, spark, tmp_path, evs):
        # ids assigned in (ts, arrival) order so both engines tie-break alike
        evs = sorted(enumerate(evs), key=lambda p: (p[1][0], p[0]))
        rows_json = [
            {
                "event_id": i,
                "ts": f"2024-01-01T00:{s // 60:02d}:{s % 60:02d}Z",
                "user_id": u, "event_type": t, "value": float(i), "props": None,
            }
            for i, (_orig, (s, u, t)) in enumerate(evs)
        ]
        got_stream = _rows(_stream_rows(spark, tmp_path, rows_json))

        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        batch_rows = [
            (i, base + dt.timedelta(seconds=s), u, t, float(i), None)
            for i, (_orig, (s, u, t)) in enumerate(evs)
        ] + [(len(evs), base + dt.timedelta(hours=3), 1, "zzz", 0.0, None)]
        df = spark.createDataFrame(
            batch_rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        got_batch = _rows(correlate_state_machine(df, RULES()).collect())
        assert got_stream == got_batch
