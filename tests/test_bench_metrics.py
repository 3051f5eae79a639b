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
