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


class TestKeySkewTelemetry:
    def _skewed(self, spark, n=1000):
        # user 7 holds 50% of all rows; the rest spread over 100 users
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(seconds=i),
             7 if i % 2 == 0 else 1000 + (i % 100),  # 7 ∉ the cold-key range
             "click", 1.0, None)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )

    def test_key_skew_reports_hot_key_share(self, spark):
        from php_ec_spark.metrics import key_skew

        skew = key_skew(self._skewed(spark), "user_id")
        assert skew["total"] == 1000
        assert skew["top"][0][0] == 7 and skew["top"][0][1] == 500
        assert abs(skew["max_share"] - 0.5) < 1e-9

    def test_state_machine_warns_on_50pct_key(self, spark):
        import pytest as _pytest

        from php_ec_spark.engine.batch import correlate_state_machine
        from php_ec_spark.rules import match_single

        rules = [match_single("m", ["click"], key="user_id")]
        ev = self._skewed(spark)
        with _pytest.warns(UserWarning, match="user_id=7 .*50%.*with_salt"):
            correlate_state_machine(ev, rules, skew_warn_ratio=0.3)
        # balanced data at the same threshold stays quiet
        import warnings as _warnings

        balanced = ev.withColumn("user_id", (ev.event_id % 100).cast("long"))
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", UserWarning)
            correlate_state_machine(balanced, rules, skew_warn_ratio=0.3)


class TestManagementServer:
    def test_status_endpoint_serves_engine_state(self, spark):
        """S13: the stdlib management server serves the php-ec-shaped
        status document (Management/Server.php / Actions/Index.php) over
        HTTP — JSON at /status, HTML index at /."""
        import urllib.request

        from php_ec_spark.metrics import EngineMetrics, ManagementServer

        metrics = EngineMetrics()
        # seed one synthetic progress entry so stats/load are non-trivial
        metrics._progress.append(
            {"wall_ts": time.time(), "query": "q", "batch_id": 1,
             "num_input_rows": 120, "input_rows_per_second": 10.0,
             "processed_rows_per_second": 10.0,
             "observed": {"phpec": {"n_emissions": 3}}}
        )
        srv = ManagementServer(metrics, spark=spark)
        port = srv.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=10
            ) as r:
                doc = json.loads(r.read())
            assert doc["state"] == "RUNNING" and doc["uptime_msec"] >= 0
            assert set(doc["load"]) == {"60", "900", "3600"}
            assert doc["load"]["60"] >= 120 / 60 * 0.99
            assert doc["statistics"] == {"n_emissions": 3}
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10
            ) as r:
                html = r.read().decode()
            assert "spark-ec" in html and "n_emissions" in html
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=10
            ) as r:
                pass
        except urllib.error.HTTPError as e:
            assert e.code == 404
        finally:
            srv.stop()

    def test_html_index_escapes_user_strings(self, spark):
        """Stat keys / query names are user-defined; markup in them must
        not break or inject into the HTML index (the JSON /status
        endpoint is unaffected either way)."""
        import urllib.request

        from php_ec_spark.metrics import EngineMetrics, ManagementServer

        metrics = EngineMetrics()
        metrics._progress.append(
            {"wall_ts": time.time(), "query": "<script>alert(1)</script>",
             "batch_id": 1, "num_input_rows": 1,
             "input_rows_per_second": 1.0, "processed_rows_per_second": 1.0,
             "observed": {"phpec": {"<b>bold_stat</b>": 7}}}
        )
        srv = ManagementServer(metrics, spark=spark)
        port = srv.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=10
            ) as r:
                html = r.read().decode()
            assert "<script>" not in html and "<b>bold_stat</b>" not in html
            assert "&lt;b&gt;bold_stat&lt;/b&gt;" in html
        finally:
            srv.stop()


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


class TestCalcLoadCoverage:
    def test_divides_by_covered_span_not_horizon(self):
        """A query 30 s old with 300 rows runs at 10 eps — dividing by the
        full 3600 s horizon would report 0.083 eps (43x low)."""
        import time as _time

        from php_ec_spark.metrics import EngineMetrics

        m = EngineMetrics()
        now = _time.time()
        m._progress.append(
            {"wall_ts": now - 30, "num_input_rows": 300, "observed": {}}
        )
        load = m.calc_load((60, 3600))
        assert 8.0 <= load[60] <= 11.0, load
        assert 8.0 <= load[3600] <= 11.0, load

    def test_full_coverage_matches_horizon_division(self):
        import time as _time

        from php_ec_spark.metrics import EngineMetrics

        m = EngineMetrics()
        now = _time.time()
        for age in range(60, 0, -10):  # 60 s of history
            m._progress.append(
                {"wall_ts": now - age, "num_input_rows": 100, "observed": {}}
            )
        load = m.calc_load((60,))
        assert 9.0 <= load[60] <= 11.0, load  # 600 rows / 60 s
