"""Runtime metrics (SURVEY step 9 ops parity): df.observe inline
counters + StreamingQueryListener progress ring with calcLoad horizons
(reference Counter.php:19-157, CorrelationEngine.php:790-813)."""

import json
import time

from php_ec_spark.metrics import (
    EngineMetrics,
    engine_metric_exprs,
    observe_batch,
    observe_stream,
)


class TestBatchObserve:
    def test_metrics_ride_the_existing_action(self, spark, events):
        df, obs = observe_batch(events)
        n = df.count()
        got = obs.get
        assert got["n_events"] == n
        assert got["n_event_types"] >= 1
        assert str(got["first_ts"]) <= str(got["max_ts"])

    def test_emission_stat_counters(self, spark, events):
        from php_ec_spark.engine import correlate
        from php_ec_spark.rules import sequence_rule

        rule = sequence_rule("pay", ["signup", "purchase"], key="user_id",
                             timeout="PT30M")
        em, obs = observe_batch(
            correlate(events, [rule]), engine_metric_exprs(), name="emit"
        )
        total = em.count()
        got = obs.get
        assert got["n_emissions"] == total
        assert got["n_completed"] + got["n_timeout"] == total  # seq rule: 2 outcomes
        assert got["n_progress"] == 0


class TestStreamingMetrics:
    def test_listener_ring_and_calc_load(self, spark, tmp_path):
        src = tmp_path / "events"
        src.mkdir()
        rows = [
            {"event_id": i, "ts": f"2024-01-01T00:00:{i:02d}Z", "user_id": 1,
             "event_type": "signup" if i % 2 == 0 else "purchase",
             "value": 1.0, "props": None}
            for i in range(10)
        ]
        with open(src / "01.json", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

        from php_ec_spark.engine.streaming import correlate_stream
        from php_ec_spark.rules import sequence_rule
        from php_ec_spark.streaming import ndjson_dir_source

        metrics = EngineMetrics()
        spark.streams.addListener(metrics)
        try:
            emissions = observe_stream(
                correlate_stream(
                    ndjson_dir_source(spark, str(src)),
                    [sequence_rule("pay", ["signup", "purchase"],
                                   key="user_id", timeout="PT1H")],
                )
            )
            q = (
                emissions.writeStream
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append")
                .format("noop")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout=120)
            # listener delivery is async; progress arrives shortly after stop
            deadline = time.time() + 30
            while time.time() < deadline and metrics.last_progress is None:
                time.sleep(0.2)
            assert metrics.last_progress is not None
            assert sum(p["num_input_rows"] for p in metrics._progress) == 10

            load = metrics.calc_load()
            assert set(load) == {60, 900, 3600}
            assert load[60] >= 10 / 60 * 0.99  # all rows in the last minute
            # observed incrStat counters surfaced through progress
            stats = metrics.stats()
            assert stats.get("n_emissions", 0) >= 1
            assert stats.get("n_completed", 0) >= 1
        finally:
            spark.streams.removeListener(metrics)
