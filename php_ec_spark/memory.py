"""Collective Memory — shared namespaced KV state with TTL (J6/S10/S11).

Re-expresses the reference's MemoryEngine (src/Memory/MemoryEngine.php:26-186,
MemoryWrite.php:19-47, MemoryEntry.php:19-57):

- entries: (namespace, key, value JSON-string, expires_at nullable,
  persistent flag) — a small DataFrame, **broadcast** to rules for reads
  (the one true join analog in the reference, SURVEY J6).
- writes are applied centrally, last-write-wins per (namespace, key)
  (MemoryEngine::applyWrite), delete = null value.
- TTL purge drops expired entries (ArrayMemory.php:83-104; the scheduler
  purges every 30 s, Scheduler.php:913-915 — here purge is explicit or
  folded into reads).
- persistence: persistent entries round-trip through parquet
  (Memory/JsonFileBackend.php:38-108 → a columnar table instead of gzip
  JSON); preload scripts become seed DataFrames (Scheduler.php:509-539).

Memory stays small by contract (learned thresholds, dims, flags), so every
read-side join is a broadcast-hash join — no shuffle of the event stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEMORY_SCHEMA = T.StructType(
    [
        T.StructField("namespace", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.StringType()),  # JSON scalar/object, null = tombstone
        T.StructField("expires_at", T.TimestampType()),
        T.StructField("persistent", T.BooleanType()),
        T.StructField("generation", T.LongType()),  # apply_writes call number
        T.StructField("write_seq", T.LongType()),  # ordering within one call
    ]
)


class MemoryEngine:
    """Batch-mode collective memory over a small entries DataFrame."""

    def __init__(
        self, spark, entries: Optional[DataFrame] = None, generation: int = 0
    ):
        self.spark = spark
        self.generation = generation
        self.entries = (
            entries
            if entries is not None
            else spark.createDataFrame([], MEMORY_SCHEMA)
        )

    # -- writes ------------------------------------------------------------
    def apply_writes(self, writes: DataFrame) -> "MemoryEngine":
        """Last-write-wins upsert (MemoryEngine::applyWrite, :63-79).

        ``writes`` needs (namespace, key, value[, expires_at, persistent,
        write_seq]). A null value is a delete (tombstone removed here).
        Ordering is (generation, write_seq): each apply_writes call is a
        new generation that beats every earlier call; write_seq (default 0)
        breaks ties WITHIN a call. This keeps ordering total across calls —
        caller-supplied seqs from different calls are never compared."""
        gen = self.generation + 1
        w = writes.withColumn("generation", F.lit(gen).cast("long"))
        for col, default in (
            ("expires_at", F.lit(None).cast("timestamp")),
            ("persistent", F.lit(False)),
            ("write_seq", F.lit(0).cast("long")),
        ):
            if col not in w.columns:
                w = w.withColumn(col, default)
        merged = self.entries.select(*[f.name for f in MEMORY_SCHEMA]).unionByName(
            w.select(*[f.name for f in MEMORY_SCHEMA])
        )
        latest = (
            merged.withColumn(
                "__rn",
                F.row_number().over(
                    Window.partitionBy("namespace", "key").orderBy(
                        F.col("generation").desc(), F.col("write_seq").desc()
                    )
                ),
            )
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .filter(F.col("value").isNotNull())
        )
        return MemoryEngine(self.spark, latest, generation=gen)

    # -- reads -------------------------------------------------------------
    def live(self, now: Optional[Column] = None) -> DataFrame:
        """Entries that have not expired (TTL semantics, MemoryEntry.php:19-57)."""
        now = now if now is not None else F.current_timestamp()
        return self.entries.filter(
            F.col("expires_at").isNull() | (F.col("expires_at") > now)
        )

    def namespace(self, ns: str, now: Optional[Column] = None) -> DataFrame:
        return self.live(now).filter(F.col("namespace") == ns).select("key", "value")

    def get(self, ns: str, key: str, default=None):
        """Point read — the documented rules-side Memory interface
        (docs/knowledge.md:339-360: ``get``/``has``/``all``; rules are
        read-only by design). Driver-side convenience for rule callbacks
        and tests; high-volume reads belong in :meth:`enrich` (broadcast
        join — the scan-speed path). Returns the JSON-decoded value."""
        rows = (
            self.namespace(ns).filter(F.col("key") == key).select("value").take(1)
        )
        if not rows:
            return default
        import json as _json

        return _json.loads(rows[0]["value"])

    def has(self, ns: str, key: str) -> bool:
        """``has`` of the documented interface (docs/knowledge.md:352)."""
        return bool(
            self.namespace(ns).filter(F.col("key") == key).take(1)
        )

    def enrich(
        self,
        events: DataFrame,
        ns: str,
        on: Column,
        value_alias: str = "mem_value",
        now: Optional[Column] = None,
    ) -> DataFrame:
        """Rule-side memory read = broadcast-hash join (SURVEY J6): the
        event stream never shuffles; the small namespace broadcasts."""
        dim = F.broadcast(
            self.namespace(ns, now).select(
                F.col("key").alias("__mem_key"), F.col("value").alias(value_alias)
            )
        )
        return events.join(dim, on == F.col("__mem_key"), "left").drop("__mem_key")

    def purge_expired(self, now: Optional[Column] = None) -> "MemoryEngine":
        """Physically drop expired entries (ArrayBackend::purgeExpired) —
        ``live`` already filters them lazily; purging bounds the entries
        table between checkpoints."""
        return MemoryEngine(self.spark, self.live(now), generation=self.generation)

    def clear(self, ns: Optional[str] = None) -> "MemoryEngine":
        """Drop every entry, or one namespace (ArrayBackend::clear)."""
        kept = (
            self.entries.filter(F.col("namespace") != ns)
            if ns is not None
            else self.spark.createDataFrame([], MEMORY_SCHEMA)
        )
        return MemoryEngine(self.spark, kept, generation=self.generation)

    # -- persistence (S10) ---------------------------------------------------
    def save(self, path: str) -> None:
        """Persist persistent-flagged entries (JsonFileBackend.php:38-108 →
        parquet; atomicity comes from Spark's committed write)."""
        self.entries.filter(F.col("persistent")).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "MemoryEngine":
        df = spark.read.parquet(path)
        if "generation" not in df.columns:
            df = df.withColumn("generation", F.lit(0).cast("long"))
        gen = df.agg(F.coalesce(F.max("generation"), F.lit(0))).collect()[0][0]
        return cls(spark, df, generation=int(gen))

    @classmethod
    def preload(cls, spark, seed: DataFrame) -> "MemoryEngine":
        """Memory preload script analog (S11, Scheduler.php:509-539)."""
        return cls(spark).apply_writes(seed)


def writes_from_emissions(
    emissions: DataFrame,
    namespace_col: Column | str = "rule",
    ttl_seconds: Optional[int] = None,
) -> DataFrame:
    """Rule-emitted MemoryWrites (the emit('memory', …) channel,
    Scheduler.php:820 → MemoryEngine::applyWrite): each emission becomes a
    write keyed by its correlation key, valued with the payload (falling
    back to value_sum). Feed the result to :meth:`MemoryEngine.apply_writes`
    after a batch, or per micro-batch inside foreachBatch — the learned-
    thresholds / last-seen-state pattern from docs/knowledge.md.
    """
    ns = F.col(namespace_col) if isinstance(namespace_col, str) else namespace_col
    expires = (
        (F.col("fire_ts") + F.make_interval(secs=F.lit(float(ttl_seconds))))
        if ttl_seconds is not None
        else F.lit(None).cast("timestamp")
    )
    return emissions.select(
        ns.alias("namespace"),
        F.col("key"),
        F.coalesce(F.col("payload"), F.col("value_sum").cast("string")).alias("value"),
        expires.alias("expires_at"),
        F.lit(False).alias("persistent"),
        F.col("last_event_id").alias("write_seq"),
    ).filter(F.col("key").isNotNull())
