"""Live rule chaining (J5): a rule's emission re-enters the SAME streaming
query as a derived event on a later trigger.

The scenario is the reference's canonical online-shop chain
(examples/online_shop): CheckOrderPayment times out → emits a derived
timeout event → OrderPaymentReminder consumes it. Here both rules run in
one processing-clock streaming query whose foreachBatch sink writes
derived events back into the unioned chain directory —
CorrelationEngine.php:372-391's futureTick re-injection as a checkpointed
file feedback loop.
"""

from __future__ import annotations

import pytest
import json
import os
import time
import uuid

from php_ec_spark.rules import match_single, sequence_rule
from php_ec_spark.streaming import (
    ActionDispatcher,
    ndjson_dir_source,
    start_chained_correlation,
)


class TestChainedStreaming:
    def test_timeout_chains_into_reminder(self, spark, tmp_path):
        src = tmp_path / f"src-{uuid.uuid4().hex[:8]}"
        chain = tmp_path / "chain"
        src.mkdir()
        # order placed, never paid; event time is past, so the processing
        # clock (TickClock — live mode) times it out on the next tick
        with open(src / "orders.json", "w") as f:
            f.write(json.dumps({
                "event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 42,
                "event_type": "order_placed", "value": 99.5, "props": None,
            }) + "\n")

        rules = [
            sequence_rule(
                "check_payment", ["order_placed", "payment"],
                key="user_id", timeout="PT20S",
            ),
            # consumes the DERIVED type '<rule>:<outcome>'
            match_single("reminder", ["check_payment:timeout"], key="user_id"),
        ]
        seen: list = []
        dispatcher = ActionDispatcher()
        dispatcher.register("capture", fn=lambda rows: seen.extend(rows))

        q = start_chained_correlation(
            ndjson_dir_source(spark, str(src)),
            rules,
            checkpoint_dir=str(tmp_path / "ck"),
            chain_dir=str(chain),
            dispatcher=dispatcher,
            trigger_interval="300 milliseconds",
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                if any(r["rule"] == "reminder" for r in seen):
                    break
                time.sleep(0.3)
        finally:
            q.stop()

        by_rule = {r["rule"]: r for r in seen}
        assert set(by_rule) == {"check_payment", "reminder"}
        t = by_rule["check_payment"]
        # fire_ts is the event-time deadline even under the processing clock
        assert t["outcome"] == "timeout" and str(t["fire_ts"]).startswith(
            "2024-01-01 00:00:20"
        )
        r = by_rule["reminder"]
        assert r["outcome"] == "completed" and r["key"] == "42"
        # the reminder consumed a DERIVED event: negative collision-free id
        assert r["last_event_id"] < 0

    def test_restart_resumes_chain_without_duplicates(self, spark, tmp_path):
        """Kill the chained query mid-chain (after the timeout fires, maybe
        before the reminder consumes the derived event) and restart on the
        same checkpoint + chain dir: the chain completes and the reminder
        fires EXACTLY once across both runs — deterministic derived-file
        names + the dispatcher's cross-run batch markers make replayed
        batches idempotent end to end."""
        src = tmp_path / "src"
        chain = tmp_path / "chain"
        src.mkdir()
        with open(src / "orders.json", "w") as f:
            f.write(json.dumps({
                "event_id": 1, "ts": "2024-01-01T00:00:00Z", "user_id": 42,
                "event_type": "order_placed", "value": 99.5, "props": None,
            }) + "\n")
        rules = lambda: [  # noqa: E731
            sequence_rule("check_payment", ["order_placed", "payment"],
                          key="user_id", timeout="PT20S"),
            match_single("reminder", ["check_payment:timeout"], key="user_id"),
        ]

        seen1: list = []
        d1 = ActionDispatcher()
        d1.register("capture", fn=seen1.extend)
        q1 = start_chained_correlation(
            ndjson_dir_source(spark, str(src)), rules(),
            checkpoint_dir=str(tmp_path / "ck"), chain_dir=str(chain),
            dispatcher=d1, trigger_interval="300 milliseconds",
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline and not any(
                r["rule"] == "check_payment" for r in seen1
            ):
                time.sleep(0.2)
        finally:
            q1.stop()  # mid-chain kill

        seen2: list = []
        d2 = ActionDispatcher()
        d2.register("capture", fn=seen2.extend)
        q2 = start_chained_correlation(
            ndjson_dir_source(spark, str(src)), rules(),
            checkpoint_dir=str(tmp_path / "ck"), chain_dir=str(chain),
            dispatcher=d2, trigger_interval="300 milliseconds",
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline and not any(
                r["rule"] == "reminder" for r in seen1 + seen2
            ):
                time.sleep(0.3)
        finally:
            q2.stop()

        every = seen1 + seen2
        reminders = [r for r in every if r["rule"] == "reminder"]
        timeouts = [r for r in every if r["rule"] == "check_payment"]
        assert len(reminders) == 1 and reminders[0]["outcome"] == "completed"
        assert len(timeouts) == 1 and timeouts[0]["outcome"] == "timeout"

    def test_high_volume_chain_no_driver_materialization(
        self, spark, tmp_path, monkeypatch
    ):
        """A batch emitting 100k derived events must flow back through the
        chain dir entirely executor-side: collect/toPandas/toLocalIterator
        are booby-trapped for the whole run, and the feedback is verified
        by the source's own progress (original n + re-injected n input
        rows). Afterwards cleanSource=delete must shrink the chain dir back
        — the feedback loop cannot grow without bound."""
        src = tmp_path / "src"
        chain = tmp_path / "chain"
        src.mkdir()
        n = 100_000
        # 1000 keys × 100 events: emission volume is per-EVENT (match_single
        # fires per click), group count stays realistic for the state op
        with open(src / "bulk.json", "w") as f:
            for i in range(n):
                f.write(json.dumps({
                    "event_id": i, "ts": "2024-01-01T00:00:00Z",
                    "user_id": i % 1000,
                    "event_type": "click", "value": 1.0, "props": None,
                }) + "\n")

        from pyspark.sql import DataFrame

        def boom(self, *a, **k):
            raise AssertionError("driver materialization in chain path")

        monkeypatch.setattr(DataFrame, "collect", boom)
        monkeypatch.setattr(DataFrame, "toPandas", boom)
        monkeypatch.setattr(DataFrame, "toLocalIterator", boom)

        q = start_chained_correlation(
            ndjson_dir_source(spark, str(src)),
            [match_single("m", ["click"], key="user_id")],
            checkpoint_dir=str(tmp_path / "ck"),
            chain_dir=str(chain),
            trigger_interval="300 milliseconds",
        )
        try:
            deadline = time.time() + 180
            total_in = 0
            while time.time() < deadline:
                assert q.exception() is None, q.exception()
                total_in = sum(
                    p["numInputRows"] for p in (q.recentProgress or [])
                )
                if total_in >= 2 * n:
                    break
                time.sleep(0.5)
            assert total_in >= 2 * n, total_in  # n original + n re-injected
            # retention: once the derived batch commits, the file-source
            # cleaner deletes the consumed part files (async, so poll)
            sweep_deadline = time.time() + 90
            while time.time() < sweep_deadline:
                parts = [
                    p for p in os.listdir(chain) if p.startswith("derived_")
                ]
                if not parts:
                    break
                time.sleep(0.5)
            assert not parts, parts
        finally:
            q.stop()

    @pytest.mark.slow
    def test_chain_dir_bounded_across_many_triggers(self, spark, tmp_path):
        """Retention under sustained chaining: ≥10 triggers each produce
        derived files; cleanSource=delete must keep the chain dir bounded
        WHILE the query runs (more distinct derived files must exist over
        the run than ever coexist), and drain it once quiet."""
        src = tmp_path / "src"
        chain = tmp_path / "chain"
        src.mkdir()
        n_files, per_file = 12, 2_000
        for fi in range(n_files):
            with open(src / f"bulk_{fi:02d}.json", "w") as f:
                for i in range(per_file):
                    f.write(json.dumps({
                        "event_id": fi * per_file + i,
                        "ts": "2024-01-01T00:00:00Z",
                        "user_id": i % 200,
                        "event_type": "click", "value": 1.0, "props": None,
                    }) + "\n")

        q = start_chained_correlation(
            ndjson_dir_source(spark, str(src), max_files_per_trigger=1),
            [match_single("m", ["click"], key="user_id")],
            checkpoint_dir=str(tmp_path / "ck"),
            chain_dir=str(chain),
            trigger_interval="200 milliseconds",
        )
        total = n_files * per_file
        seen_files: set = set()
        max_present = 0
        try:
            deadline = time.time() + 240
            while time.time() < deadline:
                assert q.exception() is None, q.exception()
                parts = [
                    p for p in os.listdir(chain) if p.startswith("derived_")
                ]
                seen_files.update(parts)
                max_present = max(max_present, len(parts))
                done = sum(
                    p["numInputRows"] for p in (q.recentProgress or [])
                )
                if done >= 2 * total and not parts:
                    break
                time.sleep(0.2)
            batches = {p["batchId"] for p in (q.recentProgress or [])}
            assert len(batches) >= 10, sorted(batches)
            # every source file fed a trigger that wrote derived files...
            assert len(seen_files) >= n_files, sorted(seen_files)
            # ...but they never accumulated: consumed batches were swept
            # while later ones were still being produced
            assert max_present < len(seen_files), (
                max_present, len(seen_files)
            )
            assert not [
                p for p in os.listdir(chain) if p.startswith("derived_")
            ]
        finally:
            q.stop()
