"""Drop-in NDJSON JSON-RPC process protocol (SURVEY §4 DSv2 extension).

The reference's entire I/O surface speaks newline-delimited JSON-RPC 2.0
over stdio; this module implements the same wire protocol so an existing
php-ec source or action binary plugs in UNMODIFIED:

- **Sources** (SourceExecutionCoordinator.php:253-296): the child writes
  notifications to stdout — ``handle`` (params.event = the event object),
  ``checkpoint`` (params = opaque checkpoint state), ``log`` (logLevel /
  message / context). On restart the engine hands the last checkpoint back
  via the ``PHPEC_CHECKPOINT`` env var (Scheduler.php:74,
  SourceExecutionCoordinator.php:204). Implemented as a PySpark Python
  Data Source (:class:`JsonRpcProcessSource`) whose
  ``SimpleDataSourceStreamReader`` owns the child process, buffers events
  between micro-batches, persists checkpoints, and prunes on commit.
- **Actions** (ActionExecutionCoordinator.php:98-296, ActionHelper.php:
  42-220): the engine keeps ONE long-lived child per action, sends
  ``{"method": "run", "params": vars, "id": uid}`` requests on stdin, and
  tracks completed/failed per request id from the JSON-RPC responses on
  stdout. Implemented by :class:`JsonRpcActionProcess`; shutdown follows
  the reference contract (close stdin → child flushes and exits).

Events cross the source boundary as raw JSON strings (arbitrary key-value
payloads, like the reference's Event): parse downstream with
``F.from_json`` / :func:`php_ec_spark.model.events_from_json`.
"""

from __future__ import annotations

import json
import logging
import os
import shlex
import subprocess
import threading
import uuid
import zlib
from collections import deque
from typing import Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

log = logging.getLogger("php_ec_spark.jsonrpc")

#: Wire constants (Scheduler.php:206-218)
METHOD_HANDLE = "handle"
METHOD_CHECKPOINT = "checkpoint"
METHOD_LOG = "log"
METHOD_RUN = "run"
CHECKPOINT_VARNAME = "PHPEC_CHECKPOINT"

_LOG_LEVELS = {
    "debug": logging.DEBUG, "info": logging.INFO, "notice": logging.INFO,
    "warning": logging.WARNING, "error": logging.ERROR,
    "critical": logging.CRITICAL, "alert": logging.CRITICAL,
    "emergency": logging.CRITICAL,
}


def _forward_log(params: dict) -> None:
    level = _LOG_LEVELS.get(str(params.get("logLevel", "info")).lower(), logging.INFO)
    log.log(level, "%s %s", params.get("message"), params.get("context") or "")


def _ndjson_lines(stream, compressed: bool):
    """NDJSON lines from a binary stream, optionally inflating raw DEFLATE
    (RFC 1951 — what PHP's zlib.deflate stream filter produces, S12).

    Reads with ``read1`` (at-most-n, returns what's available) — a plain
    ``read(n)`` blocks until n bytes arrive, deadlocking interactive
    request/response pipes."""
    read = getattr(stream, "read1", stream.read)
    decomp = zlib.decompressobj(-zlib.MAX_WBITS) if compressed else None
    pending = b""
    while True:
        chunk = read(65536)
        if not chunk:
            if decomp is not None:
                pending += decomp.flush()
            if pending.strip():
                yield pending
            return
        pending += decomp.decompress(chunk) if decomp else chunk
        *lines, pending = pending.split(b"\n")
        yield from lines


class _JsonRpcSimpleReader(SimpleDataSourceStreamReader):
    """Owns the source child process for the lifetime of the query.

    Offsets are a dense per-event sequence number assigned as notifications
    arrive; events stay buffered until ``commit`` so an uncommitted batch
    can be replayed (``readBetweenOffsets``) after a failure — Spark's
    at-least-once replay window standing in for the reference's
    save-state/RECOVERY cycle.
    """

    def __init__(self, options: dict) -> None:
        raw_cmd = options["cmd"]
        self._cmd = (
            json.loads(raw_cmd) if raw_cmd.lstrip().startswith("[")
            else shlex.split(raw_cmd)
        )
        self._ckpt_file = options.get("checkpointfile")
        env = {**os.environ, **json.loads(options.get("env", "{}"))}
        # S12 parity: PHP's zlib.deflate stream filter is raw DEFLATE
        # (RFC 1951), signalled by PHPEC_RPC_COMPRESSION=1
        # (SourceExecutionCoordinator.php:238-245)
        self._compressed = env.get("PHPEC_RPC_COMPRESSION") == "1"
        ckpt = self._load_checkpoint()
        if ckpt is not None:
            env[CHECKPOINT_VARNAME] = json.dumps(ckpt)
        # Whether the child was handed a resume checkpoint — gates the
        # restart rebase in read(): only a checkpoint-resumed child is
        # guaranteed to emit NEW data from the first notification.
        self._resumed = ckpt is not None
        # Checkpoint-less restart semantics: the reader cannot KNOW
        # whether such a child re-emits its stream from the beginning
        # (a file reader — treat the first `offset` events as replays
        # and filter them) or emits only new data (tail -f, a socket —
        # filtering would silently DROP the first `offset` live events).
        # `restart=replay` filters; `restart=live` rebases (at-least-once:
        # a replaying child would re-deliver history). Either choice
        # silently loses/duplicates data when it's wrong for the child, so
        # there is NO default: an unset option raises in read() the moment
        # a checkpoint-less restart actually happens (s > 0), and any
        # other string is rejected here at query start.
        restart = options.get("restart")
        if restart is not None and restart not in ("replay", "live"):
            raise ValueError(
                f"invalid 'restart' option {restart!r}: expected 'replay' "
                "(child re-emits its stream from the beginning on restart) "
                "or 'live' (child emits only new data)"
            )
        self._restart = restart
        self._lock = threading.Lock()
        self._buf: deque[tuple[int, str]] = deque()
        self._seq = 0
        self._rebased = False  # becomes True at the first read() call
        self._proc = subprocess.Popen(
            self._cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env
        )
        threading.Thread(target=self._pump, daemon=True).start()

    # -- child stdout → buffer -------------------------------------------

    def _pump(self) -> None:
        for line in _ndjson_lines(self._proc.stdout, self._compressed):
            line = line.strip()
            if not line:
                continue
            try:
                rpc = json.loads(line)
            except ValueError:
                log.warning("source child wrote non-JSON line: %.200s", line)
                continue
            method = rpc.get("method")
            params = rpc.get("params") or {}
            if method == METHOD_HANDLE:
                event = params.get("event")
                if not isinstance(event, dict):
                    log.error("handle notification without event object: %.200s", line)
                    continue
                with self._lock:
                    self._seq += 1
                    self._buf.append((self._seq, json.dumps(event)))
            elif method == METHOD_CHECKPOINT:
                self._save_checkpoint(params)
            elif method == METHOD_LOG:
                _forward_log(params)
            else:
                log.error("unknown json-rpc method from source child: %r", method)

    # -- checkpoint file (PHPEC_CHECKPOINT round-trip) -------------------

    def _load_checkpoint(self):
        if self._ckpt_file and os.path.exists(self._ckpt_file):
            with open(self._ckpt_file) as f:
                return json.load(f)
        return None

    def _save_checkpoint(self, params) -> None:
        if not self._ckpt_file:
            return
        tmp = self._ckpt_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, self._ckpt_file)

    # -- SimpleDataSourceStreamReader contract ---------------------------

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        s = start["seq"]
        with self._lock:
            if not self._rebased:
                # RESTART path: this reader's counter starts at 0, but a
                # restarted query hands us the PREVIOUS run's committed
                # offset — without re-basing, every buffered row with
                # seq <= s is unreachable (filtered here, pruned by
                # commit) and the first s post-restart events are
                # silently lost. The child resumed from its own
                # PHPEC_CHECKPOINT, so everything buffered is NEW data:
                # renumber it to follow the committed offset. Rebase on
                # ANY s > 0, not only s > self._seq: a resumed child that
                # replays a backlog during query startup can push _seq
                # past the committed offset before the first read(), and
                # gating on s > self._seq would then skip the rebase and
                # silently drop the first s events of this run.
                #
                # Checkpoint-resumed children (_resumed) always rebase:
                # everything they buffer is new by construction. For a
                # checkpoint-less child the `restart` option decides
                # (see __init__): `replay` keeps the plain seq > s
                # filter — the first s replayed events dedupe against
                # the committed offset — while `live` rebases so a
                # child that emits only new data loses nothing. With the
                # option UNSET, guessing either way silently loses or
                # duplicates data, so the restart fails loudly instead:
                # the operator must declare which kind of child this is.
                if s > 0 and not self._resumed and self._restart is None:
                    raise ValueError(
                        f"checkpoint-less json-rpc source restarted at "
                        f"committed offset {s} without a 'restart' option. "
                        "Set restart='replay' if the child re-emits its "
                        "stream from the beginning (the first "
                        f"{s} events dedupe against the committed offset), "
                        "or restart='live' if it emits only new data "
                        "(nothing is filtered; at-least-once). Guessing "
                        "would silently lose or duplicate events."
                    )
                if s > 0 and not self._resumed and self._restart == "replay":
                    log.info(
                        "checkpoint-less source restarted at offset %d with "
                        "restart='replay': treating the first %d buffered "
                        "events as replays of committed data.",
                        s, s,
                    )
                if s > 0 and (self._resumed or self._restart == "live"):
                    self._buf = type(self._buf)(
                        (s + i, payload)
                        for i, (_, payload) in enumerate(self._buf, start=1)
                    )
                    self._seq = s + len(self._buf)
                self._rebased = True
            rows = [r for r in self._buf if r[0] > s]
        end = rows[-1][0] if rows else s
        return iter(rows), {"seq": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        with self._lock:
            return iter([r for r in self._buf if start["seq"] < r[0] <= end["seq"]])

    def commit(self, end: dict) -> None:
        e = end["seq"]
        with self._lock:
            while self._buf and self._buf[0][0] <= e:
                self._buf.popleft()

    def __del__(self) -> None:  # best-effort child teardown at query stop
        proc = getattr(self, "_proc", None)
        if proc is not None and proc.poll() is None:
            proc.terminate()

    # Spark pickles the reader into the executor-side read function; the
    # executor copy serves rows from Spark's prefetch cache, never from the
    # child — strip live handles (lock/process/buffer) from the pickle.
    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state.pop("_lock", None)
        state.pop("_proc", None)
        state["_buf"] = deque()
        return state

    def __setstate__(self, state: dict) -> None:
        self.__dict__.update(state)
        self._lock = threading.Lock()
        self._proc = None


class JsonRpcProcessSource(DataSource):
    """``spark.readStream.format("phpec_jsonrpc")`` — reference source
    binaries speak their native protocol into a Spark stream.

    Options: ``cmd`` (argv as a JSON array, or a shell-ish string),
    ``checkpointFile`` (where source checkpoint params persist and are
    handed back via PHPEC_CHECKPOINT on restart), ``env`` (JSON object of
    extra env vars), ``restart`` (checkpoint-less restart semantics:
    ``replay`` assumes the child re-emits its stream from the beginning
    and filters the first committed-offset events as replays; ``live``
    assumes the child emits only new data and renumbers it past the
    committed offset — at-least-once, nothing dropped. There is NO
    default — any other value is rejected at query start, and leaving it
    unset raises the moment a checkpoint-less restart actually happens,
    because a wrong guess silently loses or duplicates data). ``restart``
    is ignored when the child resumed from ``checkpointFile`` (its
    buffered data is new by construction)."""

    @classmethod
    def name(cls) -> str:
        return "phpec_jsonrpc"

    def schema(self) -> str:
        return "seq long, value string"

    def simpleStreamReader(self, schema) -> _JsonRpcSimpleReader:
        return _JsonRpcSimpleReader(self.options)


def jsonrpc_source(
    spark: SparkSession,
    cmd: list[str] | str,
    checkpoint_file: Optional[str] = None,
    env: Optional[dict] = None,
    restart: Optional[str] = None,
) -> DataFrame:
    """Streaming DataFrame of (seq, value-JSON) rows from a JSON-RPC source
    child — the drop-in for the reference's input process config
    (Scheduler::setInputProcesses). ``restart`` sets the checkpoint-less
    restart semantics (see :class:`JsonRpcProcessSource`): ``replay``
    filters the first committed-offset events as replays; ``live`` keeps
    every buffered event (the child emits only new data); ``None``
    (default) raises if a checkpoint-less restart ever happens — sources
    that run with ``checkpoint_file`` never need it."""
    spark.dataSource.register(JsonRpcProcessSource)
    reader = (
        spark.readStream.format("phpec_jsonrpc")
        .option("cmd", json.dumps(cmd) if isinstance(cmd, list) else cmd)
    )
    if checkpoint_file:
        reader = reader.option("checkpointFile", checkpoint_file)
    if env:
        reader = reader.option("env", json.dumps(env))
    if restart is not None:
        reader = reader.option("restart", restart)
    return reader.load()


class JsonRpcActionProcess:
    """ONE long-lived child per action with per-request bookkeeping —
    the reference's ActionExecutionCoordinator model (AEC.php:138-175):
    requests go out on stdin with unique ids; responses on stdout mark
    each request completed (result) or failed (error).
    """

    def __init__(self, cmd: list[str], env: Optional[dict] = None,
                 timeout: float = 30.0) -> None:
        self.timeout = timeout
        self.completed: int = 0
        self.failed: int = 0
        self._pending: dict[str, dict] = {}  # id -> {"done": Event, ...}
        self._lock = threading.Lock()
        # serializes stdin writes AND the shared deflate stream: two
        # foreachBatch threads (start_correlations runs one query per key
        # column) sharing one action child would otherwise interleave
        # partial writes > PIPE_BUF / interleave compressobj state and
        # corrupt the wire protocol
        self._write_lock = threading.Lock()
        full_env = {**os.environ, **(env or {})}
        # S12: compression applies to BOTH directions of the action pipe
        # (RPCCompressionTest: testActionWithCompressionExecutesSuccessfully)
        self._compressed = full_env.get("PHPEC_RPC_COMPRESSION") == "1"
        self._comp = (
            zlib.compressobj(wbits=-zlib.MAX_WBITS) if self._compressed else None
        )
        self._proc = subprocess.Popen(
            cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, env=full_env,
        )
        threading.Thread(target=self._pump, daemon=True).start()

    def _pump(self) -> None:
        for line in _ndjson_lines(self._proc.stdout, self._compressed):
            line = line.strip()
            if not line:
                continue
            try:
                rpc = json.loads(line)
            except ValueError:
                log.warning("action child wrote non-JSON line: %.200s", line)
                continue
            if rpc.get("method") == METHOD_LOG:  # notification, no id
                _forward_log(rpc.get("params") or {})
                continue
            rid = rpc.get("id")
            with self._lock:
                entry = self._pending.pop(rid, None)
            if entry is None:
                log.warning("action response for unknown request id %r", rid)
                continue
            entry["response"] = rpc
            entry["done"].set()

    def run(self, params: dict) -> object:
        """Send one ``run`` request and wait for its response (the
        reference is request-at-a-time per action child). Raises on
        JSON-RPC error, timeout, or child death — callers quarantine."""
        rid = uuid.uuid4().hex
        entry = {"done": threading.Event()}
        with self._lock:
            self._pending[rid] = entry
        req = {"jsonrpc": "2.0", "method": METHOD_RUN, "params": params, "id": rid}
        try:
            assert self._proc.stdin is not None
            raw = (json.dumps(req, default=str) + "\n").encode()
            with self._write_lock:
                data = raw
                if self._comp is not None:
                    data = self._comp.compress(raw) + self._comp.flush(
                        zlib.Z_SYNC_FLUSH
                    )
                self._proc.stdin.write(data)
                self._proc.stdin.flush()
        except (BrokenPipeError, ValueError) as e:
            with self._lock:
                self._pending.pop(rid, None)
            self.failed += 1
            raise RuntimeError(f"action child gone: {e!r}") from e
        if not entry["done"].wait(self.timeout):
            with self._lock:
                self._pending.pop(rid, None)
            self.failed += 1
            raise TimeoutError(f"action request {rid} timed out after {self.timeout}s")
        resp = entry["response"]
        if "error" in resp:
            self.failed += 1
            raise RuntimeError(f"action returned error: {resp['error']!r}")
        self.completed += 1
        return resp.get("result")

    def shutdown(self, grace: float = 5.0) -> None:
        """Close stdin (ActionHelper's shutdown signal: the child flushes
        and stops), then terminate if it lingers."""
        try:
            if self._proc.stdin is not None:
                self._proc.stdin.close()
        except OSError:
            pass
        try:
            self._proc.wait(grace)
        except subprocess.TimeoutExpired:
            self._proc.terminate()


#: long-lived action children, keyed by argv — module-level so picklable
#: ActionSpec instances (driver or executor side) share one child per
#: distinct command, like the reference's one-process-per-action model
_RPC_PROCS: dict[tuple, JsonRpcActionProcess] = {}
_RPC_PROCS_LOCK = threading.Lock()


def rpc_action_process(cmd: list[str], timeout: float = 30.0) -> JsonRpcActionProcess:
    key = tuple(cmd)
    with _RPC_PROCS_LOCK:
        proc = _RPC_PROCS.get(key)
        if proc is None or proc._proc.poll() is not None:
            proc = JsonRpcActionProcess(list(cmd), timeout=timeout)
            _RPC_PROCS[key] = proc
        return proc
