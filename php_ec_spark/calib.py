"""Fixed calibration probe: a never-changing multi-core Spark job whose
committed quiet-window reference time turns any measurement window into a
machine-readable load ratio.

Why this exists (round-12 verdict #1): this box shows uniform +10-45%
inflation on multi-core Spark queries from NEIGHBOR contention that is
invisible to ``os.getloadavg()`` (loadavg.start ~0, single-thread
pure-Python eps healthy, every Spark wall-time high). BENCH_r12.json read
as a 2.64x regression and needed two human re-runs to adjudicate. The fix
is a canary measured in the same window as the numbers it adjudicates:
the probe's min-of-N over the run, divided by the committed quiet
reference, is the window's load ratio — recorded in the artifact so a
loaded window flags itself.

Contract: NEVER change :func:`calib_probe`'s job. Its shape is chosen to
be (a) deterministic and data-independent (``spark.range``), (b) wide
enough to occupy all 32 local cores (32 input partitions, string-hash +
modular arithmetic over 48M rows), (c) insensitive to session
shuffle-partition config — the aggregate is GLOBAL (keyless), so the
partials are map-side and the one exchange is SinglePartition regardless
of ``spark.sql.shuffle.partitions`` (a keyed groupBy variant measured
~18% slower at shuffle.partitions=8 vs 32 in the same window — the
floor tests run at 8, the bench at 32, so the probe must not see that
knob; the keyless form measured sp-identical mins, 0.354 vs 0.359, in
the same A/B), and (d) ~0.6 s quiet so contention moves it measurably
but N iterations cost little. If Spark itself is upgraded, re-measure and
update ``CALIB_REF_SEC`` in the same commit, with provenance here.

Provenance of the constant: see ``CALIB_REF_SEC``'s comment.
The reference is the quiet MIN because every consumer compares a
min-of-N against it.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: Quiet-window min of :func:`calib_probe` on the reference box.
#: Provenance: measured 2026-08-15 (round 13), 1-min loadavg 0.26,
#: 8 iterations after 2 warmups, pyspark 4.1.2 local[32]:
#: min 0.486 s / median 0.517 s at shuffle.partitions=32;
#: min 0.522 s at shuffle.partitions=8 (same window) — the ~7% residual
#: spread is within the quiet band LOADED_RATIO tolerates.
#: Re-baseline evaluated 2026-08-18 (round 18, verdict #5): the box's
#: quiet floor itself drifts between adjacent hours — dedicated 12-round
#: probes measured min 0.491 (loadavg 0.32) and 0.677 (loadavg 0.24)
#: back-to-back, vs 0.423 inside round 17's record window. Moving the
#: reference down to the all-time floor would stamp genuinely quiet
#: hours ``warm`` and fire futile retries in the driver's unattended
#: run; 0.49 remains the CENTRAL quiet value, and the ratio-< 1
#: over-correction that motivated the re-baseline ask is fixed
#: structurally by :func:`norm_ratio` instead.
CALIB_REF_SEC = 0.49

#: Ratio above which a window is stamped ``loaded`` (round-12 verdict's
#: ~1.3x canary threshold; quiet-window spread is ~1.0-1.15x).
LOADED_RATIO = 1.3

#: Ratio above which a window is stamped ``warm`` (round-13 verdict #3:
#: the 1.15-1.3 gray zone used to pass as ``quiet`` while visibly
#: inflating multi-core wall-times ~20%; the documented quiet spread is
#: 1.0-1.15, so anything above it is no longer a trustworthy record run
#: even though min-of-N may still rescue individual queries).
WARM_RATIO = 1.15


def norm_ratio(ratio: float) -> float:
    """Ratio to DIVIDE wall-times by (multiply throughput by) when
    normalizing: ``max(ratio, 1.0)``.

    A measured ratio below 1 means the window was at least as good as
    the quiet reference — there is no load to correct for, and dividing
    by < 1 INFLATES times. Round 17 committed two such windows (ratios
    0.863/0.865 — that hour's box floor ran ~14% under the reference;
    the floor itself drifts ±20% between adjacent hours, re-measured
    round 18: mins 0.423 / 0.491 / 0.677 across three windows), and the
    inflation flipped two genuinely-improved queries into "+14%/+25%"
    normalized regressions (round-17 verdict #3/#5). Clamping at 1.0
    makes normalization a pure loaded-window correction: quiet windows
    compare raw-to-raw, loaded windows deflate toward quiet — a raw
    improvement measured in a quiet-or-better window can never
    normalize into a regression. The RAW ratio still rides the artifact
    (``calib.ratio``) for window classification and audit."""
    return max(ratio, 1.0)


def window_stamp(ratio: float) -> str:
    """Three-tier window classification for a measured load ratio:
    ``quiet`` (< :data:`WARM_RATIO` — trustworthy record run), ``warm``
    (gray zone — numbers read as mild upper bounds, don't record floors
    or regressions off them), ``loaded`` (>= :data:`LOADED_RATIO` —
    uniformly inflated). The bench hunts a quiet window with a bounded
    multi-retry on any non-quiet stamp (bench.py, round 15)."""
    if ratio >= LOADED_RATIO:
        return "loaded"
    if ratio >= WARM_RATIO:
        return "warm"
    return "quiet"


def calib_probe(spark: SparkSession) -> float:
    """Run the fixed probe once and return its wall-clock seconds.

    The job: 48M-row ``range`` in 32 partitions -> string-hash + modular
    projection -> GLOBAL aggregate (map-side partials, SinglePartition
    exchange of 32 tiny rows) -> 1-row collect. All compute is JVM-side
    whole-stage-codegen; the collect payload is one row; no plan node
    reads ``spark.sql.shuffle.partitions``.
    DO NOT MODIFY — the committed :data:`CALIB_REF_SEC` is this job's
    unit. Callers should warm up once (``calib_probe(spark)`` discarded)
    before timing, same as any Spark measurement.
    """
    t0 = time.perf_counter()
    (
        spark.range(0, 48_000_000, 1, 32)
        .select(
            (F.hash(F.col("id").cast("string")) % 9973).alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        .agg(
            F.sum(F.col("k") * F.col("v")).alias("s"),
            F.count("*").alias("c"),
            F.approx_count_distinct("k").alias("d"),
        )
        .collect()
    )
    return time.perf_counter() - t0


def window_ratio(spark: SparkSession, iters: int = 2, warmup: bool = True) -> float:
    """Min-of-``iters`` probe time over :data:`CALIB_REF_SEC` — the
    window's load ratio (1.0 = quiet reference box; >= ``LOADED_RATIO``
    means multi-core Spark wall-times in this window read uniformly high
    and floors/records should be scaled or stamped accordingly)."""
    if warmup:
        calib_probe(spark)
    best = min(calib_probe(spark) for _ in range(max(iters, 1)))
    return best / CALIB_REF_SEC
