"""Profile the live-path per-state-partition tax (VERDICT r5 item 1).

The applyInPandasWithState catch-up path costs ~0.5 s PER STATE PARTITION
per micro-batch on local mode (README "Performance envelope"). This tool
decomposes one availableNow micro-batch into its parts:

- query progress ``durationMs`` (addBatch vs walCommit vs planning),
- ``stateOperators[0]`` metrics (allUpdatesTimeMs, commitTimeMs, ...),
- in-handler wall time measured INSIDE the Python worker (written to a
  spool dir per task), which separates "Python handler runs" from
  "everything Spark does around it".

Run:  python tools/live_profile.py [events] [partition counts...]
Each experiment uses its own SparkSession config where the knob needs it
(a new JVM per worker-reuse flip is not attempted: that conf defaults on).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator, Tuple

import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: E402


def make_events_file(dirpath: str, n: int) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "bulk.json"), "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "event_id": i,
                "ts": f"2024-01-01T{(i // 3600) % 24:02d}:"
                      f"{(i // 60) % 60:02d}:{i % 60:02d}Z",
                "user_id": i % 500,
                "event_type": ["signup", "click", "purchase", "view"][(i * 7) % 4],
                "value": 1.0,
                "props": None,
            }) + "\n")


OUT_SCHEMA = T.StructType([
    T.StructField("k", T.StringType()),
    T.StructField("n", T.LongType()),
])
STATE_SCHEMA = T.StructType([T.StructField("blob", T.StringType())])


def make_trivial_handler(spool: str):
    """Counts rows per key; writes per-call wall time into spool."""
    def handle(key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
               ) -> Iterator[pd.DataFrame]:
        t0 = time.perf_counter()
        total = 0
        for pdf in pdfs:
            total += len(pdf)
        if state.exists:
            total += int(state.get[0] or 0)
        state.update((str(total),))
        dt = time.perf_counter() - t0
        with open(os.path.join(
                spool, f"{os.getpid()}_{time.monotonic_ns()}"), "w") as f:
            f.write(f"{dt}\n")
        yield pd.DataFrame({"k": [str(key[0])], "n": [total]})
    return handle


def run_stateful(spark, src_dir, ck, spool, partitions, handler=None,
                 timeout=GroupStateTimeout.NoTimeout):
    os.makedirs(spool, exist_ok=True)
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    df = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        ).json(src_dir)
        .withWatermark("ts", "1 hour")
        .select(F.col("user_id").cast("string").alias("__key"),
                "event_id", "ts", "event_type", "value")
    )
    out = df.groupBy("__key").applyInPandasWithState(
        handler or make_trivial_handler(spool),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
    t0 = time.perf_counter()
    q = (out.writeStream.outputMode("append")
         .option("checkpointLocation", ck)
         .foreachBatch(lambda bdf, bid: bdf.write.format("noop")
                       .mode("overwrite").save())
         .trigger(availableNow=True).start())
    q.awaitTermination()
    wall = time.perf_counter() - t0
    if q.exception() is not None:
        raise q.exception()
    progress = [p for p in (q.recentProgress or []) if p]
    handler_times = []
    for fn in os.listdir(spool):
        with open(os.path.join(spool, fn)) as f:
            handler_times.append(float(f.read().strip()))
    return wall, progress, handler_times


def summarize(tag, wall, progress, handler_times, n_events):
    batches = []
    for p in progress:
        d = p.get("durationMs", {})
        so = (p.get("stateOperators") or [{}])[0]
        batches.append({
            "rows": p.get("numInputRows"),
            "addBatch": d.get("addBatch"),
            "getBatch": d.get("getBatch"),
            "latestOffset": d.get("latestOffset"),
            "planning": d.get("queryPlanning"),
            "trigger": d.get("triggerExecution"),
            "walCommit": d.get("walCommit"),
            "commitOffsets": d.get("commitOffsets"),
            "st_updates_ms": so.get("allUpdatesTimeMs"),
            "st_removals_ms": so.get("allRemovalsTimeMs"),
            "st_commit_ms": so.get("commitTimeMs"),
            "st_rows": so.get("numRowsTotal"),
        })
    ht = sorted(handler_times)
    print(json.dumps({
        "tag": tag,
        "wall_s": round(wall, 2),
        "eps": round(n_events / wall),
        "handler_calls": len(ht),
        "handler_total_s": round(sum(ht), 2),
        "handler_max_s": round(ht[-1], 3) if ht else None,
        "batches": batches,
    }))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    parts_list = [int(x) for x in sys.argv[2:]] or [8, 32]

    work = tempfile.mkdtemp(prefix="liveprof_")
    src = os.path.join(work, "src")
    make_events_file(src, n)

    spark = (
        SparkSession.builder.appName("live-profile")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    print(json.dumps({
        "worker_reuse": spark.conf.get("spark.python.worker.reuse", "unset"),
        "provider": spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", "default"),
        "n_events": n,
    }))

    # ---- sweep partition counts, trivial handler ----
    for parts in parts_list:
        for rep in range(2):
            ck = os.path.join(work, f"ck_triv_{parts}_{rep}")
            spool = os.path.join(work, f"spool_triv_{parts}_{rep}")
            wall, prog, ht = run_stateful(spark, src, ck, spool, parts)
            summarize(f"trivial p={parts} rep={rep}", wall, prog, ht, n)

    # ---- same sweep with EventTimeTimeout (timer machinery on) ----
    for parts in parts_list:
        ck = os.path.join(work, f"ck_timer_{parts}")
        spool = os.path.join(work, f"spool_timer_{parts}")
        wall, prog, ht = run_stateful(
            spark, src, ck, spool, parts,
            timeout=GroupStateTimeout.EventTimeTimeout)
        summarize(f"timer p={parts}", wall, prog, ht, n)

    # ---- stateless control: same read + shuffle + noop, no state op ----
    for parts in parts_list:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        ck = os.path.join(work, f"ck_stateless_{parts}")
        df = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
            .json(src)
            .repartition(parts, "user_id")
        )
        t0 = time.perf_counter()
        q = (df.writeStream.option("checkpointLocation", ck)
             .foreachBatch(lambda bdf, bid: bdf.write.format("noop")
                           .mode("overwrite").save())
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = time.perf_counter() - t0
        summarize(f"stateless p={parts}", wall, q.recentProgress or [], [], n)

    # ---- RocksDB provider ----
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        for parts in parts_list:
            ck = os.path.join(work, f"ck_rocks_{parts}")
            spool = os.path.join(work, f"spool_rocks_{parts}")
            wall, prog, ht = run_stateful(spark, src, ck, spool, parts)
            summarize(f"rocksdb p={parts}", wall, prog, ht, n)
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
