"""Pins for bench.py's load-independent exec-metrics collector.

Round-14 verdict #1: the cross-round performance trend must not lean on
wall-clock alone (this box's neighbor contention leaves ±20% residual
even after calib normalization), so bench.py records per-query shuffle /
input / spill bytes and task counts off the JVM AppStatusStore. That
collector talks to Spark through a py4j signature
(``AppStatusStore.stageList(List, boolean, boolean, double[], List)``)
that a Spark upgrade could silently drift — in bench.py drift degrades
to ``metrics: null``; HERE it must fail loudly so the degradation is a
deliberate choice, not a surprise in the committed artifact.
"""

from __future__ import annotations

import bench


class TestExecMetrics:
    def test_mark_delta_attributes_a_known_job(self, spark):
        em = bench._ExecMetrics(spark)
        assert em._ok, "status-store probe failed — py4j signature drift"
        m0 = em.mark()
        (
            spark.range(0, 200_000, 1, 4)
            .selectExpr("id % 13 k", "id v")
            .groupBy("k")
            .sum("v")
            .collect()
        )
        got = em.delta(m0)
        assert got is not None
        # a groupBy is one exchange: bytes written by the map side equal
        # bytes read by the reduce side, both nonzero; 4 input tasks +
        # at least 1 reduce task; both stages attributed
        assert got["shuffle_write"] > 0
        assert got["shuffle_read"] == got["shuffle_write"]
        assert got["input_records"] == 200_000
        assert got["tasks"] >= 5
        assert got["stages"] >= 2
        assert got["spill_mem"] == 0 and got["spill_disk"] == 0

    def test_delta_is_scoped_to_the_window(self, spark):
        """Work done BEFORE mark() must not leak into delta(): the
        per-query attribution in bench.py depends on the stage-id fence
        plus the listener-bus drain on both sides."""
        em = bench._ExecMetrics(spark)
        # outside the window: a shuffling job
        spark.range(0, 100_000, 1, 4).selectExpr("id % 7 k").groupBy(
            "k"
        ).count().collect()
        m0 = em.mark()
        # inside the window: a genuinely shuffle-free scan+filter
        # (df.count() would NOT do — its global aggregate is itself a
        # two-stage exchange of partial counts)
        rows = spark.range(0, 50_000, 1, 2).where("id < 0").collect()
        assert rows == []
        got = em.delta(m0)
        assert got is not None
        assert got["shuffle_read"] == 0 and got["shuffle_write"] == 0
        assert got["input_records"] == 50_000
        assert got["stages"] == 1

    def test_disabled_collector_degrades_to_none(self, spark):
        em = bench._ExecMetrics(spark)
        em._disable(RuntimeError("simulated py4j drift"))
        assert em.mark() == -1
        assert em.delta(-1) is None


class TestRetryDecision:
    """Pins for the quiet-window hunt's pure retry gate — the piece that
    runs unattended in the driver and must never retry forever or past
    its wall budget."""

    def test_gate_matrix(self):
        WARM = 1.15
        # quiet window: never retry, whatever the budgets say
        assert not bench.should_retry(1.149, 1, 2, 0, 1200, WARM)
        # non-quiet with retries and budget left: retry
        assert bench.should_retry(1.15, 1, 2, 0, 1200, WARM)
        assert bench.should_retry(2.5, 2, 2, 600, 1200, WARM)
        # retry budget exhausted (attempt 3 completed, 2 retries max)
        assert not bench.should_retry(2.5, 3, 2, 600, 1200, WARM)
        # retries disabled entirely
        assert not bench.should_retry(2.5, 1, 0, 0, 1200, WARM)
        # wall budget exhausted
        assert not bench.should_retry(2.5, 1, 2, 1200, 1200, WARM)

    def test_worst_case_attempt_count_is_bounded(self):
        # simulate a permanently-loaded box: the loop must stop after
        # exactly 1 + max_retries attempts no matter what
        attempts, max_retries = 1, 2
        while bench.should_retry(9.9, attempts, max_retries, 0, 1e9, 1.15):
            attempts += 1
            assert attempts <= 10, "runaway retry loop"
        assert attempts == 1 + max_retries


class TestOutputSplit:
    """Round-15 postmortem: the inline ``metrics`` block grew the single
    stdout JSON line to 3,973 chars; the driver keeps only the LAST
    2000 chars of tail, so the committed BENCH_r15.json lost its totals
    / window / attempts (``parsed: null``) and poisoned the delta chain.
    These pins hold the new contract: bulky metrics ride a separate
    earlier line + committed sidecar, and the FINAL line stays compact
    enough to survive the tail capture with margin."""

    @staticmethod
    def _full_size_out():
        """Synthetic result dict at REAL size: the actual 13 headline
        query names + state_machine, every optional block populated the
        way a 3-attempt retried run populates them."""
        from php_ec_spark.catalog import all_queries

        names = sorted(n for n, q in all_queries().items() if q.headline)
        assert len(names) >= 13
        metrics = {
            n: {
                "shuffle_read": 123_456_789, "shuffle_write": 123_456_789,
                "spill_mem": 1_073_741_824, "spill_disk": 536_870_912,
                "input_bytes": 9_876_543_210, "input_records": 12_345_678,
                "output_bytes": 123_456, "tasks": 1234, "stages": 42,
            }
            for n in names + ["state_machine"]
        }
        out = {
            "metric": "headline_total_runtime",
            "value": 18.854,
            "value_normalized": 14.707,
            "unit": "sec",
            "queries": {n: 2.123 for n in names},
            "queries_normalized": {n: 1.656 for n in names},
            "state_machine_eps": 156829,
            "state_machine_eps_pure": 275123,
            "sf": 0.1,
            "loadavg": {"start": 0.52, "end": 14.37},
            "calib": {
                "sec": 0.554, "ref_sec": 0.49, "ratio": 1.131,
                "rounds": [round(0.6 + 0.01 * i, 3) for i in range(15)],
            },
            "window": "quiet",
            "retried": True,
            "attempts": [1.531, 1.402, 1.131],
            "metrics": metrics,
            "delta_vs_prev": {
                **{n: -0.123 for n in names},
                "state_machine_eps": 0.163,
                "state_machine_eps_pure": 0.042,
            },
            "delta_basis": {"queries": "normalized", "eps": "raw"},
            "delta_baseline": "BENCH_r14.json",
        }
        return out

    def test_final_line_survives_the_2000_char_tail(self):
        import json

        compact, side = bench.split_output(self._full_size_out())
        line = json.dumps(compact)
        assert len(line) <= 1800, (
            f"final stdout line is {len(line)} chars — the driver tail "
            "keeps 2000; headroom gone, move something off the line"
        )
        # the record fields the trend/delta machinery needs all survived
        for k in ("value", "value_normalized", "queries", "calib",
                  "window", "attempts", "delta_vs_prev"):
            assert k in compact
        assert "metrics" not in compact
        # ...and the metrics line carries the block + its window context
        assert side["metric"] == "exec_metrics"
        assert side["window"] == "quiet"
        assert side["calib_ratio"] == 1.131
        assert len(side["metrics"]) == 14

    def test_split_without_metrics_is_identity(self):
        out = self._full_size_out()
        out["metrics"] = None
        compact, side = bench.split_output(out)
        assert side is None
        assert "metrics" not in compact

    def test_sidecar_appends_parseable_lines(self, tmp_path):
        import json

        _, side = bench.split_output(self._full_size_out())
        p = tmp_path / "BENCH_METRICS.jsonl"
        bench.append_metrics_sidecar(side, str(p))
        bench.append_metrics_sidecar(side, str(p))
        lines = p.read_text().strip().splitlines()
        assert len(lines) == 2
        rec = json.loads(lines[-1])
        assert rec["utc"].startswith("20")
        assert rec["metrics"]["state_machine"]["tasks"] == 1234
        assert rec["value_normalized"] == 14.707


class TestDeltaBaseline:
    """The prev-artifact lookup must skip crippled artifacts — the
    committed BENCH_r15.json (parsed: null) would otherwise suppress
    delta_vs_prev for every future round."""

    @staticmethod
    def _write(root, n, parsed):
        import json

        (root / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "tail": "...", "parsed": parsed})
        )

    def test_skips_null_parsed_and_falls_back(self, tmp_path):
        good = {"value": 18.8, "queries": {"q": 1.0},
                "calib": {"ratio": 1.2}}
        self._write(tmp_path, 14, good)
        self._write(tmp_path, 15, None)
        got = bench.newest_parseable_artifact(str(tmp_path))
        assert got is not None
        name, parsed = got
        assert name == "BENCH_r14.json"
        assert parsed["value"] == 18.8

    def test_numeric_round_order(self, tmp_path):
        self._write(tmp_path, 9, {"value": 1.0, "queries": {"q": 1.0}})
        self._write(tmp_path, 15, {"value": 2.0, "queries": {"q": 2.0}})
        name, parsed = bench.newest_parseable_artifact(str(tmp_path))
        assert name == "BENCH_r15.json"

    def test_empty_dir_yields_none(self, tmp_path):
        assert bench.newest_parseable_artifact(str(tmp_path)) is None

    def test_unreadable_artifact_skipped(self, tmp_path):
        (tmp_path / "BENCH_r16.json").write_text("{not json")
        self._write(tmp_path, 15, {"value": 2.0, "queries": {"q": 2.0}})
        name, _ = bench.newest_parseable_artifact(str(tmp_path))
        assert name == "BENCH_r15.json"


class TestRetryProjection:
    """Round-15 ADVICE: the budget check must project the upcoming
    cooldown (and one attempt's duration) — a yes decided just under
    the cap used to overrun it by cooldown + a full interleaved set."""

    def test_projection_blocks_an_overrunning_retry(self):
        WARM = 1.15
        # bare elapsed fits, but cooldown + one attempt would overrun
        assert not bench.should_retry(
            2.5, 1, 2, 1000, 1200, WARM,
            next_cooldown=60, est_attempt=200,
        )
        # same elapsed, cheap attempt: projection fits, retry allowed
        assert bench.should_retry(
            2.5, 1, 2, 1000, 1200, WARM,
            next_cooldown=60, est_attempt=100,
        )

    def test_defaults_preserve_legacy_semantics(self):
        WARM = 1.15
        assert bench.should_retry(2.5, 1, 2, 1199, 1200, WARM)
        assert not bench.should_retry(2.5, 1, 2, 1200, 1200, WARM)


class TestTailCaptureRehearsal:
    """End-to-end rehearsal of the downstream capture: combined
    stdout+stderr stream -> keep the LAST 2000 chars -> extract the last
    parseable JSON line. Round 15 failed exactly this gauntlet (the
    committed tails show stage-progress stderr interleaved around the
    record, and the 3,973-char single line lost its head); this pin
    proves the r16 two-line contract survives it with margin."""

    def test_full_size_run_survives_capture(self):
        import json

        compact, side = bench.split_output(
            TestOutputSplit._full_size_out()
        )
        # the stream as the capture sees it: noisy stderr diagnostics
        # before, between-run progress, the metrics line, the final
        # line, and a late stderr straggler after
        stream = (
            "# pipe_simhash: 2.091s (271530 rows)\n"
            "[Stage 2665:=========>            (19 + 13) / 32]\r\r\n"
            + json.dumps(side) + "\n"
            + json.dumps(compact) + "\n"
            + "# late shutdown message\n"
        )
        tail = stream[-2000:]
        parsed = None
        for line in tail.splitlines():
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if isinstance(cand, dict):
                parsed = cand
        assert parsed is not None, "no parseable JSON line in the tail"
        # the record the driver needs, intact after capture
        assert parsed["metric"] == "headline_total_runtime"
        for k in ("value", "value_normalized", "queries", "calib",
                  "window", "attempts", "delta_vs_prev"):
            assert k in parsed, f"capture lost {k}"

    def test_each_line_fits_one_atomic_pipe_write(self):
        """Both stdout lines must stay under the 4096-byte PIPE_BUF
        atomicity bound individually (bench.py flushes them separately
        for exactly this guarantee) — a torn final line is the r15
        failure all over again."""
        import json

        compact, side = bench.split_output(
            TestOutputSplit._full_size_out()
        )
        assert len(json.dumps(compact)) + 1 < 4096
        assert len(json.dumps(side)) + 1 < 4096
