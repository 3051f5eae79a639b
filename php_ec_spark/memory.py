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

import json
import os
import threading
import time
from typing import Iterable, Optional

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


# ---------------------------------------------------------------------------
# Live-mode central memory loop (auto-wiring parity: Scheduler.php:820 routes
# rule-emitted MemoryWrites to MemoryEngine::applyWrite every tick, and
# Scheduler.php:913-915 purges expired entries every 30 s). The streaming
# sink feeds a MemoryHub per micro-batch; rule callbacks running inside the
# stateful operator read the current memory through live_memory() — writes
# land before the NEXT batch's reads, exactly the reference's tick loop.
# ---------------------------------------------------------------------------


class MemoryHub:
    """Driver-side collective memory for live queries.

    Memory is small by contract (learned thresholds, dims, flags —
    MemoryEngine.php keeps it in-process too), so the hub holds a plain
    dict and republishes an atomic JSON snapshot under the query
    checkpoint after every batch that wrote. Executors re-read the
    snapshot at most once per changed file (mtime+size keyed), which is
    the per-batch small-dim refresh a fixed streaming plan cannot get
    from a broadcast. On a real cluster the checkpoint dir is shared
    storage, so the snapshot is visible to every executor; the read is
    one small file per task, not per row.

    Not the batch :class:`MemoryEngine`: that one is a DataFrame for
    scan-side broadcast enrichment (J6); this one is the live write
    loop. ``snapshot_engine`` bridges to batch when needed.
    """

    def __init__(
        self,
        checkpoint_dir: Optional[str] = None,
        namespace_col: str = "rule",
        ttl_seconds: Optional[int] = None,
        purge_every_s: float = 30.0,
        rules: Optional[Iterable[str]] = None,
    ):
        self.namespace_col = namespace_col
        self.ttl_seconds = ttl_seconds
        self.purge_every_s = purge_every_s
        self.rules = set(rules) if rules is not None else None
        #: (ns, key) -> [value_json_str, expires_epoch_or_None, persistent]
        self._entries: dict = {}
        self._gen = 0
        #: generation basenames THIS hub published — safe to retire
        #: immediately (we swung past them); foreign files get an age
        #: grace so another writer's claimed-but-unswung file survives
        self._published: set = set()
        self._last_purge = time.monotonic()
        self._lock = threading.Lock()  # one hub may serve several queries
        #: deletions issued BEFORE bind(): a delete leaves no trace in
        #: _entries, so without this set bind()'s snapshot reload would
        #: resurrect the very key the operator explicitly dropped
        self._pre_bind_deletes: set = set()
        self.snapshot_path: Optional[str] = None
        if checkpoint_dir is not None:
            self.bind(checkpoint_dir)

    def bind(self, checkpoint_dir: str) -> None:
        """Anchor the snapshot under a query checkpoint (start_correlation
        binds an unbound hub automatically, like the dispatcher's marker
        dir). If a snapshot already exists there — a restart — its entries
        are LOADED (preload-style, Scheduler.php:509-539) so learned
        memory survives the restart; a fresh hub's explicit pre-bind
        writes win over same-key loaded entries."""
        if "://" in checkpoint_dir:
            # the snapshot is written with local-filesystem APIs on the
            # driver and os.stat'd inside executors — that requires a
            # shared POSIX mount (NFS/EFS/local). A URI checkpoint would
            # silently yield empty executor-side memory, so fail loud.
            raise ValueError(
                f"MemoryHub needs a POSIX path shared with executors, got "
                f"{checkpoint_dir!r}; keep the streaming checkpoint on "
                "object storage if you like, but construct the hub with "
                "MemoryHub(checkpoint_dir=<shared mount>)"
            )
        d = os.path.join(checkpoint_dir, "memory")
        os.makedirs(d, exist_ok=True)
        with self._lock:
            # the already-bound guard must sit INSIDE the lock: two
            # threads binding one shared hub concurrently could otherwise
            # each pass the check and the loser's snapshot_path would
            # point at a file the hub never republishes
            if self.snapshot_path is not None:
                return
            self.snapshot_path = os.path.join(d, "current.json")
            try:
                with open(self.snapshot_path) as f:
                    doc = json.load(f)
                self._gen = max(self._gen, int(doc.get("gen", 0)))
                for entry in doc.get("entries", []):
                    ns, key, val, exp = entry[:4]
                    persistent = bool(entry[4]) if len(entry) > 4 else False
                    if (ns, key) in self._pre_bind_deletes:
                        continue  # a pre-bind delete must STAY deleted
                    self._entries.setdefault(
                        (ns, key), [val, exp, persistent]
                    )
            except (OSError, ValueError):
                pass  # no/corrupt snapshot: start from this hub's state
            self._pre_bind_deletes.clear()
            # a restart may merge pre-bind writes into the loaded doc at
            # the SAME gen — bump so the republished snapshot gets a
            # fresh write-once generation file, never a rewrite of an
            # existing one
            self._gen += 1
            self._publish_locked()

    # -- write side -------------------------------------------------------
    def absorb(self, emissions: DataFrame) -> int:
        """Apply one micro-batch's memory-channel emissions; returns the
        number of writes applied. Call AFTER actions dispatch (the
        reference routes MemoryWrites after rule actions on the same
        tick); the snapshot republish makes them visible to the next
        batch's reads."""
        em = emissions
        if self.rules is not None:
            em = em.filter(F.col("rule").isin(sorted(self.rules)))
        rows = writes_from_emissions(
            em, namespace_col=self.namespace_col, ttl_seconds=self.ttl_seconds
        ).collect()  # bounded: rule firings, not events
        with self._lock:
            n = 0
            for r in sorted(rows, key=lambda r: (r["write_seq"] or 0)):
                self._apply_locked(
                    r["namespace"], r["key"], r["value"],
                    r["expires_at"].timestamp() if r["expires_at"] else None,
                    bool(r["persistent"]),
                )
                n += 1
            now = time.monotonic()
            if now - self._last_purge >= self.purge_every_s:
                self._purge_locked()
                self._last_purge = now
                n += 1  # force republish so deletions propagate
            if n:
                self._gen += 1
                self._publish_locked()
        return len(rows)

    def write(
        self,
        ns: str,
        key: str,
        value,
        ttl_seconds: Optional[int] = None,
        persistent: bool = False,
    ) -> None:
        """Manual/preload write (Scheduler.php:509-539 seeding); ``None``
        value deletes."""
        with self._lock:
            self._apply_locked(
                ns, key,
                None if value is None else json.dumps(value, sort_keys=True),
                time.time() + ttl_seconds if ttl_seconds is not None else None,
                persistent,
            )
            self._gen += 1
            self._publish_locked()

    def _apply_locked(self, ns, key, value, expires_epoch, persistent) -> None:
        if value is None:
            self._entries.pop((ns, key), None)  # tombstone
            if self.snapshot_path is None:
                self._pre_bind_deletes.add((ns, key))
        else:
            self._entries[(ns, key)] = [value, expires_epoch, persistent]

    def purge(self) -> None:
        """Explicit expired-entry purge + republish (the scheduler's 30 s
        sweep, Scheduler.php:913-915; absorb() runs this automatically
        every ``purge_every_s``)."""
        with self._lock:
            self._purge_locked()
            self._gen += 1
            self._publish_locked()

    def _purge_locked(self, now: Optional[float] = None) -> None:
        now = time.time() if now is None else now
        self._entries = {
            k: v for k, v in self._entries.items()
            if v[1] is None or v[1] > now
        }

    def _publish_locked(self) -> None:
        if self.snapshot_path is None:
            return
        doc = {
            "gen": self._gen,
            "entries": [
                [ns, key, v[0], v[1], v[2]]
                for (ns, key), v in self._entries.items()
            ],
        }
        # Write-once generation file + atomic symlink swing. Readers key
        # on the link TARGET NAME (one readlink, no data read): an
        # mtime+size signature can alias on storage with coarse mtime
        # granularity (same-size rewrite in the same second serves a
        # stale snapshot), but a new generation always gets a brand-new
        # immutable filename, so target-name change <=> content change.
        # O_EXCL makes the write-once invariant hold across WRITERS too:
        # a second hub bound to the same dir has its own _gen counter, and
        # without it could rewrite an existing .gN in place (torn reads;
        # name-keyed readers never re-read). On collision, leapfrog past
        # every generation present on disk and claim a fresh name.
        while True:
            data = f"{self.snapshot_path}.g{self._gen}"
            try:
                fd = os.open(data, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
                break
            except FileExistsError:
                self._gen = max(self._gen, self._max_gen_on_disk()) + 1
        with os.fdopen(fd, "w") as f:
            doc["gen"] = self._gen
            json.dump(doc, f)
        prev_target = None
        try:
            prev_target = os.readlink(self.snapshot_path)
        except OSError:
            pass  # first publish, or stat-signature fallback mode
        tmp = self.snapshot_path + ".lnk"
        try:
            try:
                os.unlink(tmp)  # leftover from a crashed publish
            except OSError:
                pass
            os.symlink(os.path.basename(data), tmp)
            os.replace(tmp, self.snapshot_path)  # atomic swing
        except OSError:
            # filesystem without symlink support: plain atomic rewrite
            # (readers fall back to the stat signature automatically)
            os.replace(data, self.snapshot_path)
            return
        # Retire older generations. The keep-set is EXPLICIT — the file
        # just swung to plus the link target it replaced — because with
        # multi-writer leapfrogging neither a numeric cutoff (`< _gen−1`
        # deletes a lower-numbered file another writer just published)
        # nor top-N-by-number (a stale writer's fresh .g5 next to an old
        # .g10 would lose its OWN current target) identifies them by
        # number alone. The top-2-by-number union guards the race where
        # a concurrent writer swings the link between our readlink and
        # this sweep: its target is the new disk maximum, so it survives.
        # ONE directory snapshot serves both the keep-set and the delete
        # loop: a second listing could see a file a concurrent writer
        # created in between, absent from the keep-set computed on the
        # first — and unlink the generation that writer is about to (or
        # just did) swing the link to.
        snapshot = self._gen_files()
        gens = sorted((n for n, _ in snapshot), reverse=True)
        keep = {f"{os.path.basename(self.snapshot_path)}.g{n}" for n in gens[:2]}
        keep.add(os.path.basename(data))
        if prev_target is not None:
            keep.add(prev_target)
        self._published.add(os.path.basename(data))
        now = time.time()
        for _n, path in snapshot:
            name = os.path.basename(path)
            if name in keep:
                continue
            try:
                # A FOREIGN low-numbered file may be another writer's
                # O_EXCL claim not yet swung to — indistinguishable from
                # garbage by name, but by AGE it is brand new (claims are
                # swung within milliseconds). Give foreign files a grace
                # window; our own retired generations (in _published) we
                # know we swung past, so they go immediately.
                if name not in self._published and (
                    now - os.stat(path).st_mtime < 10.0
                ):
                    continue
                os.unlink(path)
                self._published.discard(name)
            except OSError:
                pass

    def _gen_files(self) -> list:
        """[(N, path)] for every generation file next to snapshot_path —
        the single owner of the '<name>.gN' naming convention (used by
        the leapfrog probe and the retirement pass)."""
        base = os.path.basename(self.snapshot_path) + ".g"
        d = os.path.dirname(self.snapshot_path) or "."
        out = []
        try:
            for fn in os.listdir(d):
                if fn.startswith(base):
                    try:
                        out.append((int(fn[len(base):]), os.path.join(d, fn)))
                    except ValueError:
                        pass
        except OSError:
            pass
        return out

    def _max_gen_on_disk(self) -> int:
        """Highest generation number present next to snapshot_path (0 if
        none) — used to leapfrog a colliding writer's counter."""
        return max((n for n, _ in self._gen_files()), default=0)

    # -- read side (driver convenience; executors use live_memory()) ------
    def get(self, ns: str, key: str, default=None):
        with self._lock:
            v = self._entries.get((ns, key))
        if v is None or (v[1] is not None and v[1] <= time.time()):
            return default
        return json.loads(v[0])

    def has(self, ns: str, key: str) -> bool:
        sentinel = object()
        return self.get(ns, key, sentinel) is not sentinel

    def snapshot_engine(self, spark) -> MemoryEngine:
        """Bridge to the batch engine: current live entries as a
        MemoryEngine for broadcast enrichment of a batch frame."""
        with self._lock:
            # tz-AWARE UTC datetimes: TimestampType.toInternal converts
            # aware values via calendar.timegm (exact), while a naive
            # value goes through time.mktime — local-interpreted AND
            # fold-lossy (a repeated DST hour resolves to the wrong
            # occurrence, shifting the TTL by an hour)
            rows = [
                (ns, key, v[0],
                 None if v[1] is None else
                 __import__("datetime").datetime.fromtimestamp(
                     v[1], __import__("datetime").timezone.utc
                 ),
                 v[2], self._gen, 0)
                for (ns, key), v in self._entries.items()
            ]
        return MemoryEngine(
            spark, spark.createDataFrame(rows, MEMORY_SCHEMA), generation=self._gen
        )


# -- executor-side read interface (docs/knowledge.md:339-360 get/has/all) --

_LIVE_VIEW = {"path": None, "sig": None, "view": None}


class LiveMemoryView:
    """Read-only memory view for rule callbacks running inside the
    stateful operator — the documented rules-side interface (rules are
    read-only by design; writes go through emissions → MemoryHub)."""

    def __init__(self, entries: dict):
        self._entries = entries

    def get(self, ns: str, key: str, default=None):
        v = self._entries.get((ns, key))
        if v is None or (v[1] is not None and v[1] <= time.time()):
            return default  # TTL enforced at read (MemoryEntry.php:19-57)
        return json.loads(v[0])

    def has(self, ns: str, key: str) -> bool:
        sentinel = object()
        return self.get(ns, key, sentinel) is not sentinel

    def all(self, ns: str) -> dict:
        now = time.time()
        return {
            key: json.loads(v[0])
            for (n, key), v in self._entries.items()
            if n == ns and (v[1] is None or v[1] > now)
        }


_EMPTY_VIEW = LiveMemoryView({})


def set_live_memory_path(path: Optional[str]) -> None:
    """Point live_memory() at a hub snapshot — called by the stateful
    handler once per task when the query was started with a MemoryHub.
    Reload cost is one os.stat per call and one small-file parse per
    CHANGED snapshot."""
    if _LIVE_VIEW["path"] != path:
        _LIVE_VIEW.update(path=path, sig=None, view=None)


def live_memory() -> LiveMemoryView:
    """Current collective memory, as of the last published micro-batch.
    Returns an empty view outside a memory-wired query (so rule code is
    portable between batch and live runs)."""
    path = _LIVE_VIEW["path"]
    if path is None:
        return _EMPTY_VIEW
    try:
        # the hub publishes a symlink whose target name encodes the
        # generation — content-keyed, immune to mtime-granularity
        # aliasing (a same-size same-second rewrite still changes the
        # target name because generation files are write-once)
        sig = os.readlink(path)
    except OSError:
        try:  # plain-file publish (no-symlink filesystem fallback)
            st = os.stat(path)
        except OSError:
            return _EMPTY_VIEW
        sig = (st.st_mtime_ns, st.st_size)
    if sig != _LIVE_VIEW["sig"]:
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            return _LIVE_VIEW["view"] or _EMPTY_VIEW
        _LIVE_VIEW["view"] = LiveMemoryView(
            {
                (e[0], e[1]): [e[2], e[3], bool(e[4]) if len(e) > 4 else False]
                for e in doc["entries"]
            }
        )
        _LIVE_VIEW["sig"] = sig
    return _LIVE_VIEW["view"]
