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
import pytest


@pytest.mark.slow
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
            "eps_normalized": 177373,
            "eps_pure_normalized": 311164,
            "plan_fp": "a1b2c3d4e5f6",
            "sf": 0.1,
            "master": "local[32]",
            "default_parallelism": 32,
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
        # queries_normalized is derivable (queries / calib.ratio) — it
        # rides the bulky line, never the tail-budgeted final line
        assert "queries_normalized" not in compact
        # ...and the metrics line carries the block + its window context
        assert side["metric"] == "exec_metrics"
        assert side["window"] == "quiet"
        assert side["calib_ratio"] == 1.131
        assert len(side["metrics"]) == 14
        assert len(side["queries_normalized"]) >= 13

    def test_split_without_metrics_keeps_the_failure_signal(self):
        """Round-16 ADVICE: popping a ``metrics: null`` silently turned
        the documented "status-store probe failed" signal into mere key
        absence — the compact line must carry an explicit marker."""
        out = self._full_size_out()
        out["metrics"] = None
        compact, side = bench.split_output(out)
        assert side is None
        assert "metrics" not in compact
        assert compact["metrics_probe_failed"] is True
        # ...and a populated-metrics run carries no marker
        compact2, _ = bench.split_output(self._full_size_out())
        assert "metrics_probe_failed" not in compact2

    def test_new_compact_fields_survive_the_split(self):
        """plan_fp and the normalized eps pair (round-16 verdict #1/#2)
        are HEADLINE fields — they must ride the compact final line, not
        the bulky metrics line."""
        compact, side = bench.split_output(self._full_size_out())
        assert compact["plan_fp"] == "a1b2c3d4e5f6"
        assert compact["eps_normalized"] == 177373
        assert compact["eps_pure_normalized"] == 311164
        # the effective core configuration must ride the compact line:
        # the driver's scaling lens needs proof of which core count took
        # effect, and plan_fp is core-count-specific (round-17 verdict #2)
        assert compact["master"] == "local[32]"
        assert compact["default_parallelism"] == 32
        # the sidecar line carries the fp too, so a sidecar-only reader
        # can match entries to rounds without the artifact
        assert side["plan_fp"] == "a1b2c3d4e5f6"

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


class TestPlanFingerprint:
    """Round-16 verdict #1: the compact headline line must carry a
    load-independent plan identity. The fingerprint reads ONLY the
    (shuffle_read, shuffle_write, tasks) triples — plan structure —
    never wall-times, spill, or telemetry extras."""

    M = {
        "qa": {"shuffle_read": 1_000, "shuffle_write": 1_000,
               "spill_mem": 0, "spill_disk": 0, "input_bytes": 5,
               "input_records": 5, "output_bytes": 0, "tasks": 8,
               "stages": 3},
        "qb": {"shuffle_read": 0, "shuffle_write": 0, "spill_mem": 9,
               "spill_disk": 9, "input_bytes": 0, "input_records": 0,
               "output_bytes": 0, "tasks": 4, "stages": 2},
    }

    def test_same_plan_same_fp_regardless_of_order_and_noise(self):
        import copy

        fp = bench.plan_fingerprint(self.M)
        assert isinstance(fp, str) and len(fp) == 12
        # key order must not matter (dict-order is an artifact of the
        # measurement loop, not of the plan)
        reordered = {k: self.M[k] for k in reversed(list(self.M))}
        assert bench.plan_fingerprint(reordered) == fp
        # spill / input / telemetry extras must not matter — they vary
        # with memory pressure and ride the same dict without being
        # plan structure (the jaccard cand_pairs telemetry lands there)
        noisy = copy.deepcopy(self.M)
        noisy["qa"]["spill_mem"] = 1 << 30
        noisy["qa"]["input_bytes"] = 42
        noisy["qa"]["cand_pairs"] = 123_456
        assert bench.plan_fingerprint(noisy) == fp

    def test_codec_jitter_does_not_flip_fp(self):
        """Round 18: identical runs measured shuffle bytes 18,831,322 vs
        18,831,367 (compressed-size jitter, ±2.4e-6 relative) and the
        raw-byte fp flipped between two values. The log-quantized basis
        must absorb sub-0.01%-relative byte noise."""
        import copy

        big = copy.deepcopy(self.M)
        big["qa"]["shuffle_read"] = 18_831_322
        big["qa"]["shuffle_write"] = 18_831_322
        fp = bench.plan_fingerprint(big)
        jit = copy.deepcopy(big)
        jit["qa"]["shuffle_read"] = 18_831_367
        jit["qa"]["shuffle_write"] = 18_831_367
        assert bench.plan_fingerprint(jit) == fp

    def test_plan_change_changes_fp(self):
        import copy

        fp = bench.plan_fingerprint(self.M)
        # byte changes at plan-regression scale (≥ percents) and ANY
        # task-count change flip the fp; sub-bucket byte noise does not
        # (see test_codec_jitter_does_not_flip_fp)
        for field, bump in (("shuffle_read", 100), ("shuffle_write", 100),
                            ("tasks", 1)):
            changed = copy.deepcopy(self.M)
            changed["qa"][field] += bump
            assert bench.plan_fingerprint(changed) != fp, field

    def test_degraded_collector_yields_none(self):
        assert bench.plan_fingerprint(None) is None
        assert bench.plan_fingerprint({}) is None
        assert bench.plan_fingerprint({"qa": None}) is None
        # a partially-degraded run still fingerprints what it has
        assert bench.plan_fingerprint(
            {"qa": self.M["qa"], "qb": None}
        ) == bench.plan_fingerprint({"qa": self.M["qa"]})


class TestDeltaNormalization:
    """Round-16 verdict #2: the committed warm artifact showed
    eps_pure −33.1% that was pure window (delta_basis.eps was "raw") —
    exactly the false-alarm shape the calib machinery exists to kill.
    Eps deltas now normalize by the calib ratio like query deltas,
    multiplying where times divide (a loaded window deflates
    throughput)."""

    def test_pure_window_eps_drop_reads_as_zero(self):
        # previous round: quiet window (ratio 1.0), eps 200k; this
        # round: loaded window (ratio 1.3) deflates raw eps to
        # 200k/1.3 ≈ 153.8k — a raw −23% that is 100% window
        prev = {
            "queries": {"qa": 1.3},
            "calib": {"ratio": 1.0},
            "state_machine_eps": 200_000,
            "state_machine_eps_pure": 300_000,
        }
        deltas, basis = bench.compute_deltas(
            timings={"qa": 1.69},       # raw +30%: also pure window
            eps=200_000 / 1.3,
            eps_pure=300_000 / 1.3,
            calib_ratio=1.3,
            prev=prev,
        )
        assert basis == {"queries": "normalized", "eps": "normalized"}
        assert abs(deltas["state_machine_eps"]) <= 0.001
        assert abs(deltas["state_machine_eps_pure"]) <= 0.001
        assert abs(deltas["qa"]) <= 0.001

    def test_real_regression_still_shows_through_the_window(self):
        prev = {
            "queries": {},
            "calib": {"ratio": 1.0},
            "state_machine_eps": 200_000,
        }
        # raw −30% under ratio 1.3: window explains −23.1% of it, the
        # rest is real — normalized reads −9%, not −30% and not 0
        deltas, _ = bench.compute_deltas(
            {}, 140_000, 0.0, 1.3, prev
        )
        assert -0.11 < deltas["state_machine_eps"] < -0.07

    def test_quiet_window_raw_improvement_cannot_flip_sign(self):
        """Round-17 verdict #3/#5: both r17 record runs measured ratio
        0.863-0.865 (the box hour ran under the committed quiet
        reference), and dividing by < 1 inflated normalized times enough
        to flip two raw improvements (simhash −18%, top2 −10% raw) into
        "+14%/+25%" normalized regressions. With the 1.0 clamp
        (calib.norm_ratio), a raw improvement measured in a
        quiet-or-better window (ratio ≤ 1) against a quiet-or-better
        baseline compares raw-to-raw and can never read as a normalized
        regression."""
        prev = {
            "queries": {"qa": 2.0},
            "calib": {"ratio": 0.9},
            "state_machine_eps": 100_000,
        }
        deltas, basis = bench.compute_deltas(
            timings={"qa": 1.8},        # raw −10%
            eps=110_000,                # raw +10%
            eps_pure=0.0,
            calib_ratio=0.863,
            prev=prev,
        )
        assert basis["queries"] == "normalized"
        assert deltas["qa"] == -0.1     # clamped: compares raw-to-raw
        assert deltas["state_machine_eps"] == 0.1
        # ...and a genuinely loaded current window still corrects: the
        # clamp only kills the sub-1 inflation, not the loaded deflation
        deltas2, _ = bench.compute_deltas(
            {"qa": 2.34}, 0.0, 0.0, 1.3, prev  # raw +17% at ratio 1.3
        )
        assert deltas2["qa"] == -0.1    # 2.34/1.3 = 1.8 vs prev raw 2.0

    def test_missing_ratio_falls_back_to_raw(self):
        prev = {
            "queries": {"qa": 2.0},
            "state_machine_eps": 100_000,
        }
        deltas, basis = bench.compute_deltas(
            {"qa": 1.0}, 120_000, 0.0, 1.3, prev
        )
        assert basis == {"queries": "raw", "eps": "raw"}
        assert deltas["qa"] == -0.5
        assert deltas["state_machine_eps"] == 0.2

    def test_no_prev_artifact_yields_empty(self):
        deltas, basis = bench.compute_deltas({"qa": 1.0}, 1.0, 1.0,
                                             1.2, None)
        assert deltas == {}
        assert basis == {"queries": "raw", "eps": "raw"}


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
