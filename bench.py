"""Benchmark harness: runs the headline queries and prints the compact
headline record as the FINAL stdout JSON line (preceded by one bulky
exec-metrics JSON line, also appended to BENCH_METRICS.jsonl).

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default all cores)

Each headline query is materialized via a count-ish action (``collect`` on
already-small results, ``count`` otherwise is avoided — collect forces full
result production, which is what a user would pay for).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _measure_pure_eps(iters: int) -> float:
    """NOISE-FREE companion metric (round-5 verdict ask #3): the stateful
    hot loop measured pure-Python single-thread — identical workload to
    tests/test_engine_perf.py's floor measurement. Runs BEFORE the
    SparkSession exists so the 32-thread JVM (GC/JIT threads) can't steal
    cycles from the single-thread measurement — measured in-JVM-shadow it
    reads ~35% low (91k vs 138k on the same box, same code).
    """
    import pandas as pd

    from php_ec_spark.engine.batch import _make_partition_runner
    from php_ec_spark.rules import match_single_continuously, sequence_rule

    rules = [
        match_single_continuously("roll", ["purchase"], key="user_id",
                                  chain_limit=5, emit_final=True),
        sequence_rule("seq", ["signup", "click", "purchase"], key="user_id",
                      timeout="PT12H"),
        match_single_continuously("gap", ["*"], key="user_id", timeout="PT6H"),
    ]
    n = 60_000
    types = ("signup", "click", "purchase", "view")
    rows = [
        (f"u{i % 200}", i, i * 1_000_000_000, types[(i * 7) % 4],
         float(i % 50))
        for i in range(n)
    ]
    rows.sort(key=lambda r: (r[0], r[2], r[1]))
    pdf = pd.DataFrame(
        rows, columns=["__key", "event_id", "ts", "event_type", "value"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ns")
    runner = _make_partition_runner(rules, False)
    list(runner([pdf]))  # interning/branch warmup
    eps_pure = 0.0
    for _ in range(max(iters, 3)):
        t0 = time.perf_counter()
        list(runner([pdf]))
        eps_pure = max(eps_pure, n / (time.perf_counter() - t0))
    print(f"# state-machine pure-Python: {eps_pure:,.0f} events/s "
          "(single-thread, pre-JVM)", file=sys.stderr)
    return eps_pure


def _settle() -> float:
    """Cooldown gate before any measurement (round-9 verdict bench-hygiene
    ask): a test suite or soak finishing just before bench leaves ~10 min
    of residual host load that depresses the single-thread pure-eps number
    ~35% and inflates query wall-times 15-45% UNIFORMLY — min-of-5 cannot
    save a window where every iteration is loaded. Wait (bounded) for the
    1-minute loadavg to drop below a quarter of the cores before starting;
    SPARK_GRAFT_BENCH_SETTLE=0 disables. Returns the loadavg at exit so
    the artifact records the measurement window's starting condition
    (round-10 verdict: two consecutive noisy artifacts needed human
    adjudication; a recorded loadavg makes a loaded window
    machine-detectable in the JSON itself).

    The cap default was raised 120 -> 300 s after round 12: the 120 s cap
    expired mid-load and the artifact recorded a 2.64x-inflated total
    (loadavg.start 5.15). Note loadavg only sees THIS host's runnable
    queue — neighbor contention that inflates Spark wall-times with
    loadavg ~0 is the calibration probe's job (see php_ec_spark/calib.py
    and the ``calib``/``window`` fields in the output)."""
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "300"))
    if max_wait <= 0:
        # explicitly disabled: no gate, no data-quality warning
        return os.getloadavg()[0]
    thresh = max((os.cpu_count() or 4) * 0.25, 2.0)
    t0 = time.time()
    while time.time() - t0 < max_wait:
        load = os.getloadavg()[0]
        if load < thresh:
            if time.time() - t0 > 1:
                print(f"# settle: waited {time.time() - t0:.0f}s "
                      f"(load {load:.1f} < {thresh:.1f})", file=sys.stderr)
            return load
        time.sleep(5)
    load = os.getloadavg()[0]
    print(f"# settle: gave up after {max_wait:.0f}s (load "
          f"{load:.1f} >= {thresh:.1f}) — numbers may read "
          "uniformly high", file=sys.stderr)
    return load


def should_retry(
    best_ratio: float, attempt: int, max_retries: int,
    elapsed: float, cap: float, warm_ratio: float,
    next_cooldown: float = 0.0, est_attempt: float = 0.0,
) -> bool:
    """Pure retry decision for the quiet-window hunt (unit-pinned so the
    loop cannot regress into retrying forever or past its wall budget in
    the driver's unattended run): retry only while the best window so
    far is non-quiet, extra attempts remain, and the wall budget holds.
    ``attempt`` counts COMPLETED attempts (1 = just the initial set).

    The budget check PROJECTS the cost of saying yes — the upcoming
    escalating cooldown plus an estimate of one measurement attempt —
    instead of comparing bare elapsed (round-15 ADVICE: a decision made
    just under the cap could overrun it by cooldown + a full interleaved
    set). Callers pass the fastest completed attempt's duration as the
    estimate: a retry cannot plausibly finish faster than the best
    attempt so far, and min avoids a loaded first attempt talking the
    hunt out of ever retrying."""
    return (
        best_ratio >= warm_ratio
        and attempt - 1 < max_retries
        and elapsed + next_cooldown + est_attempt < cap
    )


def plan_fingerprint(metrics: "dict | None") -> "str | None":
    """Load-independent plan fingerprint for the compact headline line
    (round-16 verdict #1): first 12 hex of md5 over the sorted per-query
    ``(shuffle_read, shuffle_write, tasks)`` triples — the byte metrics
    that are properties of the PLAN, not the measurement window. Same
    code + data ⇒ same fingerprint regardless of box load (r15→r16→judge
    runs were byte-identical across four differently-loaded sessions);
    a changed fingerprint means a plan changed (an extra exchange, a
    broadcast falling back to shuffle, an AQE flip) and the full
    per-query diff lives in BENCH_METRICS.jsonl via ``bench_trend
    --metrics``. Keys beyond the triple (spill, input, telemetry extras
    such as the jaccard candidate count) are deliberately excluded:
    spill varies with memory pressure and telemetry rides the same dict
    without being plan structure. None when the collector was disabled.

    Shuffle bytes enter the digest LOG-QUANTIZED (≈0.27%-relative
    buckets, ``round(256·log2(x+1))``): round 18's wider jaccard shuffle
    exposed ±45-byte COMPRESSED-size jitter between identical runs
    (lz4 framing is not byte-deterministic across task schedules), which
    flipped the raw-byte fp between two values and broke the
    "equal fp = zero drift" read. Sub-0.01%-relative codec noise now
    never moves a bucket, while any real byte regression (an extra
    exchange, a broadcast falling back — ≥ percents, usually ×s) always
    does; task counts stay exact.
    """
    if not metrics:
        return None
    import hashlib
    import math

    def qb(x: int) -> int:
        return round(256 * math.log2(x + 1))

    basis = {
        name: [qb(m["shuffle_read"]), qb(m["shuffle_write"]), m["tasks"]]
        for name, m in metrics.items()
        # a PARTIAL block (hand-salvaged legacy artifact, truncated
        # fragment) is skipped rather than crashing the caller — a
        # fingerprint over defaulted values would never match anything
        # real anyway, and bench.py's own collector always emits the
        # full triple
        if m is not None
        and all(k in m for k in ("shuffle_read", "shuffle_write", "tasks"))
    }
    if not basis:
        return None
    blob = json.dumps(basis, sort_keys=True).encode()
    return hashlib.md5(blob).hexdigest()[:12]


def compute_deltas(
    timings: dict,
    eps: float,
    eps_pure: float,
    calib_ratio: float,
    prev: "dict | None",
) -> "tuple[dict, dict]":
    """Per-query and eps deltas vs the previous round's parsed artifact,
    as ``(deltas, delta_basis)`` — pure so the normalization policy is
    unit-testable without running a bench.

    When BOTH artifacts carry a calib ratio, query deltas compare
    load-NORMALIZED values (t / ratio) and eps deltas compare
    ratio-MULTIPLIED values (a loaded window inflates wall-times, so it
    deflates throughput — the correction runs the other way); round 16's
    committed warm artifact read eps_pure −33.1% purely from window,
    exactly the false alarm the calib machinery exists to kill
    (round-16 verdict #2). Ratios are CLAMPED at 1.0 on both sides
    (round-17 verdict #3/#5, php_ec_spark.calib.norm_ratio): a window
    at-or-below the quiet reference has no load to correct for, and
    dividing by < 1 inflated r17's normalized times enough to flip two
    raw improvements into "+14%/+25%" regressions. ``delta_basis``
    records the basis per group; either side missing a ratio falls back
    to raw for that group. The
    32-core probe under-sees the contention a single-thread component
    rides (documented ±8% residual even between same-day quiet
    windows), so eps deltas under ~20% are window noise either way —
    plan regressions are adjudicated off ``plan_fp`` / byte metrics,
    never off eps."""
    deltas: dict = {}
    delta_basis = {"queries": "raw", "eps": "raw"}
    if not prev:
        return deltas, delta_basis
    # `or {}`: a payload carrying "queries": null has the key, so a
    # .get default alone would hand the membership test a None
    prev_q = prev.get("queries") or {}
    prev_ratio = (prev.get("calib") or {}).get("ratio") or 0
    cur_scale, prev_scale = 1.0, 1.0
    if prev_ratio and calib_ratio:
        delta_basis["queries"] = "normalized"
        delta_basis["eps"] = "normalized"
        # clamp (see docstring): quiet-or-better windows compare raw
        cur_scale = max(calib_ratio, 1.0)
        prev_scale = max(prev_ratio, 1.0)
    for name, t in timings.items():
        if name in prev_q and prev_q[name]:
            deltas[name] = round(
                (t / cur_scale) / (prev_q[name] / prev_scale) - 1.0, 3
            )
    if prev.get("state_machine_eps"):
        deltas["state_machine_eps"] = round(
            (eps * cur_scale) / (prev["state_machine_eps"] * prev_scale)
            - 1.0,
            3,
        )
    if prev.get("state_machine_eps_pure"):
        deltas["state_machine_eps_pure"] = round(
            (eps_pure * cur_scale)
            / (prev["state_machine_eps_pure"] * prev_scale)
            - 1.0,
            3,
        )
    return deltas, delta_basis


def split_output(out: dict) -> "tuple[dict, dict | None]":
    """Split the full result dict into the compact FINAL stdout line and
    a separate bulky exec-metrics line.

    The driver captures only the last 2000 chars of stdout and parses
    the final JSON line; round 15's inline ``metrics`` block pushed that
    line to 3,973 chars and the committed artifact lost its totals /
    window / attempts entirely (``parsed: null``). The headline record
    must stay compact no matter how many queries carry metrics — the
    metrics travel on their own EARLIER stdout line (truncation there
    costs nothing: the durable copy is the BENCH_METRICS.jsonl sidecar).
    tests/test_bench_metrics.py pins the final line ≤ 1800 chars on a
    synthetic full-size run."""
    compact = dict(out)
    # queries_normalized is REDUNDANT on the wire: every reader
    # (bench_trend, the delta machinery, the judge's normalization)
    # derives it as queries[q] / calib.ratio, and at 13 queries it costs
    # ~330 chars of the 2000-char tail budget — exactly the headroom the
    # round-17 plan_fp / eps_normalized fields need. It rides the bulky
    # metrics line instead (and the sidecar), never the final line.
    qn = compact.pop("queries_normalized", None)
    metrics = compact.pop("metrics", None)
    if metrics is None:
        # the documented "metrics: null = status-store probe failed"
        # signal must survive the split (round-16 ADVICE: popping the
        # key silently turned the deliberate null into mere absence) —
        # keep a compact marker instead of the bulky-or-null value
        compact["metrics_probe_failed"] = True
        return compact, None
    side = {
        "metric": "exec_metrics",
        "sf": out.get("sf"),
        "window": out.get("window"),
        "calib_ratio": (out.get("calib") or {}).get("ratio"),
        "value": out.get("value"),
        "value_normalized": out.get("value_normalized"),
        "plan_fp": out.get("plan_fp"),
        "queries_normalized": qn,
        "metrics": metrics,
    }
    return compact, side


def append_metrics_sidecar(side: dict, path: str) -> None:
    """Append one JSON line to the BENCH_METRICS.jsonl sidecar — the
    durable cross-round record of the load-independent plan metrics now
    that they no longer ride the (tail-truncated) driver artifact. The
    file is committed with the repo, so ``tools/bench_trend.py
    --metrics`` trends plan bytes across rounds from it.

    Every actor appends (builder, driver, judge — round-16 verdict #6),
    so the file grows monotonically without hygiene. Committed pruning
    policy: newest 8 entries per scale factor, trimmed with
    ``python tools/bench_trend.py --prune-sidecar=8`` whenever it
    drifts past that."""
    import datetime

    rec = {
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        )
    }
    rec.update(side)
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def newest_parseable_artifact(root: str) -> "tuple[str, dict] | None":
    """Newest ``BENCH_r*.json`` whose driver-parsed payload is usable for
    deltas — SKIPPING crippled artifacts (BENCH_r15.json's truncated
    tail left ``parsed: null``; taking the lexically-last file blindly
    silently killed ``delta_vs_prev`` for every later round). Numeric
    round sort, so r9 orders before r13 even unpadded."""
    import re

    cands = []
    for f in os.listdir(root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            cands.append((int(m.group(1)), f))
    for _, f in sorted(cands, reverse=True):
        try:
            with open(os.path.join(root, f)) as fh:
                parsed = json.load(fh).get("parsed")
            if parsed and (parsed.get("queries") or parsed.get("value")):
                return f, parsed
        except (OSError, ValueError, AttributeError):
            # unreadable, non-JSON, or non-dict shapes all mean "not a
            # usable baseline" — keep walking to an older artifact
            continue
    return None


class _ExecMetrics:
    """Load-independent per-query execution metrics off the JVM
    AppStatusStore (round-14 verdict #1): wall-clock on this box is
    hostage to invisible neighbor contention (three consecutive rounds
    committed non-quiet artifacts; the scalar calib normalization leaves
    ±20% residual), but shuffle/input/spill BYTES and task counts are
    properties of the plan, not the window — an extra exchange or a
    broadcast falling back to shuffle shows as a byte jump no load can
    fake or hide. ``mark()`` snapshots the max stage id, ``delta()``
    sums v1.StageData metrics over the stages the measured query
    submitted after it; both drain the listener bus first so a previous
    workload's in-flight stage events can't bleed across the boundary.

    Uses only public Spark surfaces (AppStatusStore backs the REST API /
    UI and exists in every session); any py4j signature drift disables
    the collector gracefully — the artifact then carries ``metrics:
    null`` instead of crashing the bench. Per-stage rows are subject to
    ``spark.ui.retainedStages`` (default 1000) — far above any single
    headline query here, noted in case one ever fans that wide."""

    FIELDS = (
        "shuffle_read", "shuffle_write", "spill_mem", "spill_disk",
        "input_bytes", "input_records", "output_bytes", "tasks", "stages",
    )

    def __init__(self, spark) -> None:
        self._ok = True
        try:
            sc = spark.sparkContext
            self._jssc = sc._jsc.sc()
            self._store = self._jssc.statusStore()
            jvm = sc._jvm
            # stageList(statuses, details, withSummaries, quantiles,
            # taskStatus) — empty statuses = all
            self._args = (
                jvm.java.util.ArrayList(), False, False,
                sc._gateway.new_array(jvm.double, 0),
                jvm.java.util.ArrayList(),
            )
            self._stages()  # probe the call shape once, up front
        except Exception as ex:  # noqa: BLE001 — degrade, don't crash
            self._disable(ex)

    def _disable(self, ex) -> None:
        if self._ok:
            print(f"# exec-metrics unavailable ({type(ex).__name__}: "
                  f"{ex}) — artifact will carry metrics=null",
                  file=sys.stderr)
        self._ok = False

    def _stages(self):
        return self._store.stageList(*self._args)

    def _drain(self) -> None:
        # AppStatusListener is fed by the async listener bus; without a
        # drain a just-finished stage may not be in the store yet (or a
        # PREVIOUS workload's stage may land inside the next window)
        try:
            self._jssc.listenerBus().waitUntilEmpty()
        except Exception:  # noqa: BLE001 — drain is best-effort
            pass

    def mark(self) -> int:
        """Max stage id currently known — the measurement window floor."""
        if not self._ok:
            return -1
        try:
            self._drain()
            st = self._stages()
            return max(
                (st.apply(i).stageId() for i in range(st.size())),
                default=-1,
            )
        except Exception as ex:  # noqa: BLE001
            self._disable(ex)
            return -1

    def delta(self, since: int) -> "dict | None":
        """Summed metrics over every stage submitted after ``since``."""
        if not self._ok:
            return None
        try:
            self._drain()
            st = self._stages()
            out = dict.fromkeys(self.FIELDS, 0)
            for i in range(st.size()):
                sd = st.apply(i)
                if sd.stageId() <= since:
                    continue
                out["shuffle_read"] += sd.shuffleReadBytes()
                out["shuffle_write"] += sd.shuffleWriteBytes()
                out["spill_mem"] += sd.memoryBytesSpilled()
                out["spill_disk"] += sd.diskBytesSpilled()
                out["input_bytes"] += sd.inputBytes()
                out["input_records"] += sd.inputRecords()
                out["output_bytes"] += sd.outputBytes()
                out["tasks"] += sd.numCompleteTasks()
                out["stages"] += 1
            return out
        except Exception as ex:  # noqa: BLE001
            self._disable(ex)
            return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))
    load_start = round(_settle(), 2)
    eps_pure = _measure_pure_eps(iters)

    from php_ec_spark.catalog import all_queries
    from php_ec_spark.session import get_spark

    spark = get_spark(app_name="php-ec-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = {n: q for n, q in all_queries().items() if q.headline}

    # JVM/codegen/shuffle warmup so per-query numbers reflect steady state,
    # not first-job class loading (not counted in the reported total)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(20000)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    (
        li.withColumn("rn", F.row_number().over(w))
        .groupBy("l_returnflag")
        .count()
        .count()
    )
    # ...join codegen paths too (BroadcastHashJoin + SortMergeJoin JIT):
    # without this, the first join-heavy query pays ~1-2s of one-time
    # compilation that no steady-state deployment would see
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20000)
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), (orders.o_custkey % 25) == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("l_extendedprice"))
        .count()
    )
    li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey).count()
    # ...and the array-HOF / generate / semi-join shapes the dedup pipeline
    # compiles (transform+slice+array_join+array_distinct+explode_outer):
    # their first-compile costs ~8 s that no steady-state deployment pays
    from php_ec_spark.operators.dedup import with_shingles

    docs_w = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(500)
    sh_w = with_shingles(docs_w).select(
        F.col("doc_id").alias("doc"), F.explode_outer("shingles").alias("s")
    )
    (
        sh_w.join(
            sh_w.groupBy("s").count().filter("count <= 100"), "s", "left_semi"
        )
        .groupBy("doc")
        .count()
        .count()
    )
    # ...and the Python/Arrow workers (spark.python.worker.reuse keeps them
    # alive session-wide, so first-spawn cost is session setup, not query
    # cost — same bucket as JVM classloading above)
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").count()
    print(f"# warmup: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    def clear_rdd_cache() -> None:
        # localCheckpoint()ed lineages (jaccard inverted index, cluster
        # propagation rounds, chain fixpoint rounds) stay pinned in the
        # block manager after their query finishes; dozens of benched
        # queries × iterations would stack gigabytes of dead cache and the
        # GC pressure bleeds into later measurements. A real deployment
        # runs one query per job — sweeping between queries measures that.
        from php_ec_spark.session import release_checkpoint_caches

        release_checkpoint_caches(spark)

    # stateful-path setup: the BASELINE comparison point (reference
    # claims "10M+ events/day" ≈ 116 events/s sustained; tests_adhoc/
    # speed_test.php measures a 3-rule in-process loop). Same shape here:
    # three state-machine rules over the full events table.
    from php_ec_spark.calib import (
        CALIB_REF_SEC,
        WARM_RATIO,
        calib_probe,
        norm_ratio,
        window_stamp,
    )
    from php_ec_spark.engine import correlate_state_machine
    from php_ec_spark.model import load_events
    from php_ec_spark.rules import match_single_continuously, sequence_rule

    events = load_events(spark, sf_dir)
    n_events = events.count()
    sm_rules = [
        match_single_continuously("roll", ["purchase"], key="user_id",
                                  chain_limit=5, emit_final=True),
        sequence_rule("seq", ["signup", "click", "purchase"], key="user_id",
                      timeout="PT12H"),
        match_single_continuously("gap", ["*"], key="user_id", timeout="PT6H"),
    ]
    # untimed warmup of the state-machine plan shape: the repartition→sort→
    # mapInPandas pipeline has its own whole-stage-codegen + Arrow-writer
    # compilation (~1.2 s one-time) that the generic warmup above does not
    # touch; with min-of-N a cold first run drags the reported eps ~25%
    # below steady state (the round-4 "regression" was exactly this —
    # measured: cold 1.9 s vs warm 0.45 s for the identical job).
    # Same for the calibration probe's first compile.
    correlate_state_machine(events, sm_rules).count()
    calib_probe(spark)

    # N measured iterations per query, INTERLEAVED (round-12 verdict #1):
    # round r times the calibration probe, then every headline query, then
    # the state-machine path, before round r+1 starts — so one query's N
    # samples are spread minutes apart across the whole bench window and a
    # transient load burst contaminates at most one sample of each instead
    # of all N of whichever query it landed on (the sequential per-query
    # loop let exactly that happen). Report the min: steady-state cost —
    # noisy-neighbor CPU on this box swings single runs by 2-4× (the same
    # jaccard job measured 9.7s cold-window vs 2.2s steady across minutes);
    # the min is the reproducible number a tuned deployment would see.
    # 5 rounds because 3 repeatedly let one bad host window inflate a
    # query 50-80% in the recorded artifact.
    #
    # The calibration probe (php_ec_spark/calib.py — a never-changing
    # synthetic 32-core job with a committed quiet reference time) makes a
    # loaded window machine-readable: this box's documented failure mode is
    # uniform +10-45% Spark inflation with loadavg ~0 (neighbor contention
    # loadavg cannot see), so the probe's min-of-rounds over CALIB_REF_SEC
    # is recorded as calib.ratio and the artifact stamps itself
    # window=loaded past LOADED_RATIO — no human adjudication needed.
    order = sorted(headline)
    samples: dict[str, list[float]] = {name: [] for name in order}
    metric_samples: dict[str, list] = {name: [] for name in order}
    rows_of: dict[str, int] = {}
    calib_rounds: list[float] = []
    sm_secs: list[float] = []
    sm_metrics: list = []
    em = _ExecMetrics(spark)

    def measure_rounds(n_rounds: int, attempt: int) -> None:
        for r in range(n_rounds):
            # min of a back-to-back pair: the first probe absorbs GC/JIT
            # debt left by the previous round's queries (observed: a lone
            # probe right after heavy query work reads ~10-20% high even
            # on a quiet box), the second measures the window.
            calib_rounds.append(round(min(calib_probe(spark),
                                          calib_probe(spark)), 3))
            for name in order:
                q = headline[name]
                # stage-id mark/delta straddles the timed window (both
                # outside it — the drain they do is not query cost);
                # every stage the query submits, including eager
                # checkpoint jobs inside operator construction, lands in
                # its metrics
                m0 = em.mark()
                t0 = time.perf_counter()
                df = q.spark(spark, sf_dir)
                n_rows = df.count()
                samples[name].append(time.perf_counter() - t0)
                metric_samples[name].append(em.delta(m0))
                # result determinism is part of the bench contract: a
                # row count that drifts between rounds/attempts would
                # otherwise be silently hidden (the artifact records one
                # count next to a min taken across all samples). An
                # explicit raise, not assert — `python -O` strips
                # asserts, and this guard must hold in any interpreter
                # the driver happens to use.
                if rows_of.setdefault(name, n_rows) != n_rows:
                    raise RuntimeError(
                        f"{name}: row count drifted across rounds "
                        f"({rows_of[name]} -> {n_rows}) — nondeterministic "
                        "query result; bench mins are incomparable"
                    )
                clear_rdd_cache()
            m0 = em.mark()
            t0 = time.perf_counter()
            correlate_state_machine(events, sm_rules).count()
            sm_secs.append(time.perf_counter() - t0)
            sm_metrics.append(em.delta(m0))
            print(f"# round {r + 1}/{n_rounds} (attempt {attempt}): "
                  f"calib {calib_rounds[-1]:.3f}s, "
                  f"queries {sum(s[-1] for s in samples.values()):.1f}s",
                  file=sys.stderr)

    t_measure0 = time.time()
    measure_rounds(iters, attempt=1)
    attempt_durations = [time.time() - t_measure0]

    def best_ratio() -> float:
        # same 3-decimal rounding as the final stamp, so a boundary
        # window cannot stamp past a threshold without having retried
        return round(min(calib_rounds) / CALIB_REF_SEC, 3)

    def attempt_ratio(start: int) -> float:
        return round(min(calib_rounds[start:]) / CALIB_REF_SEC, 3)

    # quiet-window hunt (round-14 verdict #2, extending round-13's
    # single retry-on-loaded): if even the min-of-rounds probe reads
    # NON-QUIET (warm included — three consecutive rounds committed
    # warm/loaded artifacts), every sample was taken in an inflated
    # window and min-of-N cannot rescue it. Re-settle with an
    # ESCALATING blind cooldown (the contention here is neighbor load
    # that loadavg cannot see, so the settle gate alone returns
    # immediately) and re-run the whole interleaved set, merging samples
    # so mins come from whichever window was quietest. Bounded: at most
    # SPARK_GRAFT_BENCH_RETRIES extra attempts (default 2) within a
    # SPARK_GRAFT_BENCH_RETRY_CAP wall budget (default 1200 s measured
    # from the first measured round), stopping early at the first quiet
    # stamp; the artifact records every attempt's ratio either way.
    attempt_ratios = [attempt_ratio(0)]
    max_retries = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "2"))
    retry_cap = float(os.environ.get("SPARK_GRAFT_BENCH_RETRY_CAP", "1200"))
    attempt = 1
    while should_retry(
        best_ratio(), attempt, max_retries,
        time.time() - t_measure0, retry_cap, WARM_RATIO,
        # project the cost of saying yes: the upcoming escalating
        # cooldown plus (at least) the fastest attempt's duration — a
        # bare elapsed check could greenlight a retry that overruns the
        # cap by cooldown + a full interleaved set (round-15 ADVICE)
        next_cooldown=60 * attempt,
        est_attempt=min(attempt_durations),
    ):
        attempt += 1
        cooldown = 60 * (attempt - 1)
        print(f"# window {window_stamp(best_ratio())} (ratio "
              f"{best_ratio():.2f}) — cooling down {cooldown}s, settling, "
              f"and retrying the interleaved set (attempt {attempt}, "
              f"budget {max_retries + 1})", file=sys.stderr)
        time.sleep(cooldown)
        _settle()
        n_before = len(calib_rounds)
        t_att = time.time()
        measure_rounds(iters, attempt=attempt)
        attempt_durations.append(time.time() - t_att)
        attempt_ratios.append(attempt_ratio(n_before))
    retried = attempt > 1

    timings = {name: round(min(samples[name]), 3) for name in order}
    total = sum(min(samples[name]) for name in order)

    # per-query exec metrics from the min-time sample (one run's
    # consistent snapshot; bytes are plan properties, so samples should
    # agree — a cross-round spread means AQE re-planned under pressure
    # and is worth a visible note, not a silent average)
    def pick_metrics(name: str, times: list, ms: list) -> "dict | None":
        if not any(ms):
            return None
        idx = times.index(min(times))
        chosen = ms[idx] if ms[idx] else next(m for m in ms if m)
        spread = {
            (m["shuffle_read"], m["shuffle_write"]) for m in ms if m
        }
        if len(spread) > 1:
            print(f"# {name}: shuffle bytes varied across samples "
                  f"{sorted(spread)} — AQE re-plan; recorded the "
                  "min-time sample's", file=sys.stderr)
        return chosen

    metrics_out: "dict | None" = {}
    for name in order:
        m = pick_metrics(name, samples[name], metric_samples[name])
        if m is not None:
            metrics_out[name] = m
    sm_m = pick_metrics("state_machine", sm_secs, sm_metrics)
    if sm_m is not None:
        metrics_out["state_machine"] = sm_m
    metrics_out = metrics_out or None
    # candidate-volume telemetry (round-16 verdict #7): candidates each
    # filter scheme admits to exact verification vs pairs emitted,
    # recorded in the metrics sidecar next to the plan bytes — the
    # prefix-filter and LSH-banding trades tracked by numbers.
    # Collected UNTIMED after all measured windows so the timed plans —
    # and plan_fp, which reads only the (shuffle, tasks) triples — stay
    # byte-identical to a telemetry-free run.
    from php_ec_spark.queries_pipeline import CANDIDATE_TELEMETRY

    for tname, collector in CANDIDATE_TELEMETRY.items():
        if not (metrics_out and metrics_out.get(tname)):
            continue
        try:
            jt = collector(spark, sf_dir)
            jt["out_rows"] = rows_of.get(tname)
            metrics_out[tname].update(jt)
            print(f"# {tname}: {jt['cand_pairs']} candidates -> "
                  f"{jt['out_rows']} verified pairs", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001 — telemetry, not the bench
            print(f"# {tname} telemetry failed: "
                  f"{type(ex).__name__}: {ex}", file=sys.stderr)
        finally:
            # even a failed count may have materialized pinned
            # checkpoints (inverted index, banded table) — sweep
            clear_rdd_cache()
    for name in order:
        print(f"# {name}: {timings[name]:.3f}s ({rows_of[name]} rows)",
              file=sys.stderr)
    eps = n_events / min(sm_secs)
    print(f"# state-machine path: {eps:,.0f} events/s ({n_events} events)",
          file=sys.stderr)

    calib_sec = min(calib_rounds)
    calib_ratio = round(calib_sec / CALIB_REF_SEC, 3)
    window = window_stamp(calib_ratio)
    # normalization divisor: the ratio clamped at 1.0 (round-17 verdict
    # #3/#5 — a quieter-than-reference window has no load to correct
    # for; dividing by < 1 inflated r17's normalized times and flipped
    # raw improvements into normalized regressions). The RAW ratio still
    # rides calib.ratio below for window classification and audit.
    nratio = norm_ratio(calib_ratio) if calib_ratio else 0.0
    print(f"# calib: {calib_sec:.3f}s vs ref {CALIB_REF_SEC:.3f}s -> "
          f"ratio {calib_ratio} ({window} window; per-round "
          f"{calib_rounds})", file=sys.stderr)

    # per-query delta vs the most recent BENCH_r{N}.json in the repo root,
    # so ±15% box-noise drifts are visible in the artifact itself instead
    # of needing a cross-round diff. Normalization policy (queries AND,
    # since round 17, eps — round-16 verdict #2) lives in compute_deltas.
    deltas: dict[str, float] = {}
    delta_basis = {"queries": "raw", "eps": "raw"}
    prev_path = None
    here = os.path.dirname(os.path.abspath(__file__))
    # basis = the newest PARSEABLE artifact — a crippled one (r15's
    # truncated tail, parsed null) is skipped, not silently fatal
    found = newest_parseable_artifact(here)
    if found:
        prev_path, prev = found
        deltas, delta_basis = compute_deltas(
            timings, eps, eps_pure, calib_ratio, prev
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_total_runtime",
        "value": round(total, 3),
        # load-normalized total (value / calib.ratio): the cross-round
        # trend number — raw totals from differently-loaded windows are
        # not comparable (round-13 verdict #2a). Read trend lines off
        # this field; read absolute cost off `value` + `window`.
        "value_normalized": round(total / nratio, 3) if nratio
        else None,
        "unit": "sec",
        "queries": timings,
        "queries_normalized": {
            name: round(t / nratio, 3) for name, t in timings.items()
        } if nratio else None,
        "state_machine_eps": round(eps),
        "state_machine_eps_pure": round(eps_pure),
        # window-corrected throughput (eps × calib.ratio — a loaded
        # window inflates wall-times, so it DEflates eps; the correction
        # multiplies where value_normalized divides). Round-16 verdict
        # #2: a warm committed artifact read raw eps 33% low and a trend
        # reader needed the sidecar to dismiss it. Residual caveat: the
        # 32-core probe under-sees what a single-thread component rides
        # (±8% spread between same-day quiet windows) — adjudicate
        # regressions off plan_fp/byte metrics, not eps.
        "eps_normalized": round(eps * nratio) if nratio
        else None,
        "eps_pure_normalized": round(eps_pure * nratio) if nratio
        else None,
        # 12-hex digest over sorted per-query (shuffle bytes, tasks) —
        # the load-INDEPENDENT plan identity, readable from the compact
        # artifact alone (round-16 verdict #1: the byte metrics lived
        # only in the sidecar; a reader of BENCH_rN.json saw nothing but
        # window-hostage seconds). Equal fp across rounds = zero plan
        # drift; bench_trend's default table flags changes. CORE-COUNT-
        # SPECIFIC: task counts encode the effective parallelism, so a
        # different $SPARK_GRAFT_CPUS run legitimately carries a
        # different fp — compare fps only between runs whose
        # default_parallelism matches (round-17 verdict #2).
        "plan_fp": plan_fingerprint(metrics_out),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # effective core configuration (round-17 verdict #2): the driver
        # re-runs the bench at a lower $SPARK_GRAFT_CPUS to measure
        # scaling, and its heuristic flagged the flat sf0.1 ratios as
        # "cpus ignored" — the artifact now PROVES which master /
        # parallelism actually took effect, so a flat ratio reads as
        # what it is (per-job overhead dominating at small SF), not as
        # a dishonored knob.
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        # external-load audit trail: a loaded window is machine-detectable
        # (load_start is the 1-min loadavg after the settle gate — the
        # bench's own 32-thread work dominates load_end, so load_start is
        # the clean-window signal; the documented noise band is ±15%)
        "loadavg": {"start": load_start, "end": round(os.getloadavg()[0], 2)},
        # self-adjudication (round-12 verdict #1): the fixed probe's
        # min-of-rounds over its committed quiet reference. ratio < 1.15 =
        # quiet (trustworthy record run); 1.15-1.3 = warm (mild upper
        # bounds); >= LOADED_RATIO stamps window=loaded and the
        # per-query numbers should be read as upper bounds. rounds shows
        # WHICH rounds were contaminated (the min-of-N escape hatch only
        # fails when every round was loaded — exactly when ratio is high).
        "calib": {
            "sec": round(calib_sec, 3),
            "ref_sec": CALIB_REF_SEC,
            "ratio": calib_ratio,
            "rounds": calib_rounds,
        },
        "window": window,
        "retried": retried,
        # quiet-hunt audit: one min-ratio per interleaved attempt (first
        # entry = attempt 1); len > 1 means the non-quiet retry fired
        "attempts": attempt_ratios,
        # load-INDEPENDENT per-query execution metrics (round-14 verdict
        # #1): summed v1.StageData bytes/tasks over the stages each
        # query submitted, from the min-time sample. Cross-round trend
        # reads THESE for plan regressions (an extra exchange, a
        # broadcast falling back to shuffle) — no loaded window can fake
        # or hide a byte-metric jump. tools/bench_trend.py --metrics
        # diffs them across rounds. null only if the status-store probe
        # failed (py4j signature drift after a Spark upgrade).
        # NOTE: split_output() moves this block OFF the final stdout
        # line — round 15's inline block grew the line past the
        # driver's 2000-char tail capture and destroyed the artifact.
        "metrics": metrics_out,
    }
    if deltas:
        out["delta_vs_prev"] = deltas
        out["delta_basis"] = delta_basis
        out["delta_baseline"] = os.path.basename(prev_path)
    compact, side = split_output(out)
    # flush=True per line: the capture combines stdout+stderr into one
    # stream (committed tails carry stage-progress stderr), and a single
    # deferred flush of both lines at exit would be one ~4.6 KB write —
    # past Linux's 4,096-byte PIPE_BUF atomicity bound, so stderr could
    # interleave mid-line at the kernel split point. Flushed separately,
    # each line is its own sub-PIPE_BUF atomic write and the FINAL line
    # (1.8 KB, length-pinned) can never be torn.
    if side is not None:
        # bulky metrics: own EARLIER stdout line (may be truncated out of
        # the driver's tail — that's fine) + durable committed sidecar
        print(json.dumps(side), flush=True)
        try:
            append_metrics_sidecar(
                side, os.path.join(here, "BENCH_METRICS.jsonl")
            )
        except OSError as ex:
            print(f"# metrics sidecar write failed: {ex}", file=sys.stderr)
    # the compact headline record is the FINAL line — the one the driver
    # parses out of its 2000-char tail
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
