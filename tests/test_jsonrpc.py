"""Drop-in JSON-RPC protocol compatibility (SURVEY §4 extension).

A Python stand-in speaking the reference's exact wire protocol
(tests/scripts/Source/CountToTen.php, tests/scripts/Actions/
logToScheduler.php) runs unmodified against the engine: sources through
the `phpec_jsonrpc` Python Data Source, actions through the long-lived
JsonRpcActionProcess with per-request bookkeeping."""

import json
import os
import sys
import time

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "scripts")
COUNT_SOURCE = [sys.executable, os.path.join(SCRIPTS, "count_source.py")]
ECHO_ACTION = [sys.executable, os.path.join(SCRIPTS, "echo_action.py")]


def _collect_stream(spark, df, ckpt_dir, name, want, timeout=90):
    q = (
        df.writeStream.queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt_dir)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            got = spark.sql(f"SELECT * FROM {name}").count()
            if got >= want:
                break
            time.sleep(0.3)
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


class TestJsonRpcSource:
    def test_reference_protocol_source_end_to_end(self, spark, tmp_path):
        """CountToTen-equivalent child → handle notifications become stream
        rows; checkpoint notifications persist; log notifications forward."""
        from php_ec_spark.streaming.jsonrpc import jsonrpc_source

        ckpt_file = str(tmp_path / "source.ckpt")
        df = jsonrpc_source(spark, COUNT_SOURCE, checkpoint_file=ckpt_file)
        rows = _collect_stream(
            spark, df, str(tmp_path / "q1"), "jsonrpc_counts", want=10
        )
        events = sorted(json.loads(r.value)["value"] for r in rows)
        assert events == list(range(1, 11))
        # the child's checkpoint notifications reached the checkpoint file
        with open(ckpt_file) as f:
            assert json.load(f) == {"last": 10}

    def test_restart_hands_checkpoint_back_via_env(self, spark, tmp_path):
        """Second run resumes where the checkpoint left off — the
        PHPEC_CHECKPOINT round-trip (Scheduler.php:74, SEC.php:204)."""
        from php_ec_spark.streaming.jsonrpc import jsonrpc_source

        ckpt_file = str(tmp_path / "source.ckpt")
        with open(ckpt_file, "w") as f:
            json.dump({"last": 7}, f)
        df = jsonrpc_source(
            spark, COUNT_SOURCE, checkpoint_file=ckpt_file,
            env={"COUNT_LIMIT": "12"},
        )
        rows = _collect_stream(
            spark, df, str(tmp_path / "q2"), "jsonrpc_resume", want=5
        )
        events = sorted(json.loads(r.value)["value"] for r in rows)
        assert events == [8, 9, 10, 11, 12]  # resumed AFTER the checkpoint

    def test_deflate_compressed_stream(self, spark, tmp_path):
        """S12: PHPEC_RPC_COMPRESSION=1 → the child's stdout is raw DEFLATE
        (SourceExecutionCoordinator.php:238-245); the reader decompresses
        transparently."""
        from php_ec_spark.streaming.jsonrpc import jsonrpc_source

        df = jsonrpc_source(
            spark, COUNT_SOURCE,
            checkpoint_file=str(tmp_path / "c.ckpt"),
            env={"PHPEC_RPC_COMPRESSION": "1", "COUNT_LIMIT": "6"},
        )
        rows = _collect_stream(
            spark, df, str(tmp_path / "q3"), "jsonrpc_deflate", want=6
        )
        events = sorted(json.loads(r.value)["value"] for r in rows)
        assert events == [1, 2, 3, 4, 5, 6]


class TestJsonRpcAction:
    def test_long_lived_child_per_request_bookkeeping(self):
        from php_ec_spark.streaming.jsonrpc import JsonRpcActionProcess

        proc = JsonRpcActionProcess(ECHO_ACTION, timeout=15)
        try:
            assert proc.run({"note": "first"}) is True
            assert proc.run({"note": "second"}) is True
            with pytest.raises(RuntimeError, match="requested failure"):
                proc.run({"boom": True})
            assert proc.completed == 2 and proc.failed == 1
            assert proc._proc.poll() is None  # same child, still alive
        finally:
            proc.shutdown()
        assert proc._proc.poll() is not None  # stdin EOF → clean exit

    def test_dispatcher_routes_through_rpc_action(self, spark):
        from php_ec_spark.streaming.sinks import ActionDispatcher

        d = ActionDispatcher()
        d.register("php_action", cmd=ECHO_ACTION, rules=["r1"], rpc=True)
        df = spark.createDataFrame(
            [("r1", "a", "completed"), ("r1", "b", "completed")],
            "rule string, key string, outcome string",
        )
        d(df, batch_id=0)
        assert d.completed == [(0, "php_action", 2)] and not d.failed

    def test_dispatcher_quarantines_rpc_error(self, spark):
        from php_ec_spark.streaming.sinks import ActionDispatcher

        d = ActionDispatcher()
        d.register("php_action", cmd=ECHO_ACTION, rules=["r1"], rpc=True)
        df = spark.createDataFrame(
            [("r1", "a", "completed", True)],
            "rule string, key string, outcome string, boom boolean",
        )
        d(df, batch_id=0)
        assert d.completed == [] and len(d.failed) == 1
        assert "requested failure" in d.failed[0][3]


class TestReaderRobustness:
    """Direct SimpleDataSourceStreamReader contract tests — no Spark query,
    just the reader object against pathological children."""

    def _reader(self, script, env=None, ckpt=None):
        from php_ec_spark.streaming.jsonrpc import _JsonRpcSimpleReader

        opts = {"cmd": json.dumps([sys.executable, "-c", script])}
        if env:
            opts["env"] = json.dumps(env)
        if ckpt:
            opts["checkpointfile"] = ckpt
        return _JsonRpcSimpleReader(opts)

    def _drain(self, reader, want, timeout=20):
        rows, off = [], reader.initialOffset()
        deadline = time.time() + timeout
        while len(rows) < want and time.time() < deadline:
            it, off = reader.read(off)
            rows.extend(it)
            time.sleep(0.05)
        return rows, off

    def test_garbage_interleaved_with_valid(self):
        script = r'''
import json, sys
print("this is not json")
print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":1}}}))
print("{broken json")
print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":"not-a-dict"}}))
print(json.dumps({"jsonrpc":"2.0","method":"wat","params":{}}))
print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":2}}}))
'''
        r = self._reader(script)
        rows, _ = self._drain(r, want=2)
        assert [json.loads(v)["v"] for _s, v in rows] == [1, 2]

    def test_offsets_replay_and_commit_prune(self):
        script = r'''
import json
for i in range(5):
    print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":i}}}))
'''
        r = self._reader(script)
        rows, off = self._drain(r, want=5)
        assert off == {"seq": 5} and len(rows) == 5
        # replay window: uncommitted ranges must be re-readable
        replay = list(r.readBetweenOffsets({"seq": 1}, {"seq": 3}))
        assert [s for s, _v in replay] == [2, 3]
        r.commit({"seq": 3})
        assert [s for s, _v in list(r.readBetweenOffsets({"seq": 0}, {"seq": 5}))] == [4, 5]
        # reading past the end returns the same offset, empty iterator
        it, off2 = r.read({"seq": 5})
        assert list(it) == [] and off2 == {"seq": 5}

    def test_reader_pickles_without_live_handles(self):
        import pickle

        script = r'''
import json
print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":1}}}))
'''
        r = self._reader(script)
        self._drain(r, want=1)
        clone = pickle.loads(pickle.dumps(r))
        assert clone._proc is None
        assert list(clone._buf) == []  # executor copy serves from cache only
        it, off = clone.read({"seq": 0})
        assert list(it) == []

    def test_compressed_chunk_boundaries(self, tmp_path):
        # sync-flush between every record → decompressor must handle
        # records split across arbitrary chunk boundaries
        script = r'''
import json, os, sys, zlib
c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
out = sys.stdout.buffer
for i in range(20):
    data = (json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":i}}}) + "\n").encode()
    for b in (data[:7], data[7:]):
        out.write(c.compress(b))
    if i % 3 == 0:
        out.write(c.flush(zlib.Z_SYNC_FLUSH))
out.write(c.flush())
out.flush()
'''
        r = self._reader(script, env={"PHPEC_RPC_COMPRESSION": "1"})
        rows, _ = self._drain(r, want=20)
        assert [json.loads(v)["v"] for _s, v in rows] == list(range(20))


class TestRpcCompressionParity:
    """RPCCompressionTest analogs: sources and actions work with AND
    without PHPEC_RPC_COMPRESSION (the without- cases are covered by every
    other test in this file)."""

    def test_action_with_compression_executes(self):
        from php_ec_spark.streaming.jsonrpc import JsonRpcActionProcess

        proc = JsonRpcActionProcess(
            ECHO_ACTION, env={"PHPEC_RPC_COMPRESSION": "1"}, timeout=15
        )
        try:
            assert proc.run({"note": "compressed"}) is True
            with pytest.raises(RuntimeError, match="requested failure"):
                proc.run({"boom": True})
            assert proc.completed == 1 and proc.failed == 1
        finally:
            proc.shutdown()


class TestRestartRebase:
    """A restarted query constructs a FRESH reader (seq counter at 0) but
    reads from the PREVIOUS run's committed offset — without re-basing,
    the first `offset` post-restart events are silently dropped (buffered
    below the committed seq, pruned by commit, never delivered).

    The rebase is gated on the child having RESUMED from a checkpoint
    (only then is the buffered backlog guaranteed to be new data): these
    tests hand the reader a populated checkpoint file; the checkpoint-less
    restart (child replays from scratch → keep the seq-filter dedup) is
    pinned separately below."""

    def _reader(self, script, tmp_path=None):
        from php_ec_spark.streaming.jsonrpc import _JsonRpcSimpleReader

        opts = {"cmd": json.dumps([sys.executable, "-c", script])}
        if tmp_path is not None:
            ckpt = tmp_path / "source.ckpt"
            ckpt.write_text(json.dumps({"pos": 42}))
            opts["checkpointfile"] = str(ckpt)
        return _JsonRpcSimpleReader(opts)

    SCRIPT = r'''
import json
for i in range(4):
    print(json.dumps({"jsonrpc":"2.0","method":"handle","params":{"event":{"v":i}}}))
'''

    def test_read_from_committed_offset_delivers_new_events(self, tmp_path):
        # the restart: fresh reader, child resumed from its checkpoint
        r = self._reader(self.SCRIPT, tmp_path)
        rows, deadline = [], time.time() + 20
        off = {"seq": 5000}  # previous run's committed offset
        while len(rows) < 4 and time.time() < deadline:
            it, off = r.read(off)
            rows.extend(it)
            time.sleep(0.05)
        assert [json.loads(v)["v"] for _s, v in rows] == [0, 1, 2, 3]
        assert all(s > 5000 for s, _v in rows)  # renumbered past offset
        assert off == {"seq": 5004}
        # replay window still consistent post-rebase
        replay = list(r.readBetweenOffsets({"seq": 5001}, {"seq": 5003}))
        assert [s for s, _v in replay] == [5002, 5003]

    def test_backlog_larger_than_offset_still_rebases(self, tmp_path):
        """Child replays a backlog BIGGER than the committed offset before
        the first read() — the reader's own counter overtakes `s`, and a
        `s > self._seq` rebase gate would silently drop the first `s`
        events of this run (they'd keep seq <= s and be filtered)."""
        r = self._reader(self.SCRIPT, tmp_path)
        # Let the child push all 4 events into the buffer first, so the
        # internal counter (4) already exceeds the committed offset (2).
        deadline = time.time() + 20
        while time.time() < deadline:
            with r._lock:
                if len(r._buf) == 4:
                    break
            time.sleep(0.05)
        rows, off = [], {"seq": 2}  # previous run committed only 2
        while len(rows) < 4 and time.time() < deadline:
            it, off = r.read(off)
            rows.extend(it)
            time.sleep(0.05)
        # ALL 4 backlog events delivered — none swallowed below offset 2
        assert [json.loads(v)["v"] for _s, v in rows] == [0, 1, 2, 3]
        assert [s for s, _v in rows] == [3, 4, 5, 6]
        assert off == {"seq": 6}

    def test_checkpointless_restart_dedupes_replayed_backlog(self):
        """A source configured WITHOUT a checkpoint file replays its stream
        from scratch on restart. Renumbering that backlog past the
        committed offset would deterministically re-deliver every replayed
        event as a duplicate — so with restart='replay' (declared
        EXPLICITLY: there is no default) the rebase must NOT fire: the
        plain seq > s filter dedupes the first s replayed events, and only
        the genuinely-new tail is delivered."""
        from php_ec_spark.streaming.jsonrpc import _JsonRpcSimpleReader

        r = _JsonRpcSimpleReader({  # no checkpointfile
            "cmd": json.dumps([sys.executable, "-c", self.SCRIPT]),
            "restart": "replay",
        })
        deadline = time.time() + 20
        while time.time() < deadline:
            with r._lock:
                if len(r._buf) == 4:
                    break
            time.sleep(0.05)
        # previous run committed 2 events; the child replayed all 4
        rows, off = [], {"seq": 2}
        for _ in range(5):
            it, off = r.read(off)
            rows.extend(it)
            time.sleep(0.05)
        # the 2 already-committed replays are filtered, the tail delivered
        assert [json.loads(v)["v"] for _s, v in rows] == [2, 3]
        assert [s for s, _v in rows] == [3, 4]
        assert off == {"seq": 4}

    def test_checkpointless_restart_live_mode_loses_nothing(self):
        """restart='live' declares the child emits only NEW data (tail -f,
        a socket — nothing replays on restart). The replay filter would
        silently drop the first `offset` live events; live mode rebases
        instead, so all four events arrive renumbered past the committed
        offset (at-least-once)."""
        from php_ec_spark.streaming.jsonrpc import _JsonRpcSimpleReader

        opts = {
            "cmd": json.dumps([sys.executable, "-c", self.SCRIPT]),
            "restart": "live",
        }
        r = _JsonRpcSimpleReader(opts)
        deadline = time.time() + 20
        while time.time() < deadline:
            with r._lock:
                if len(r._buf) == 4:
                    break
            time.sleep(0.05)
        rows, off = [], {"seq": 5000}  # previous run's committed offset
        while len(rows) < 4 and time.time() < deadline:
            it, off = r.read(off)
            rows.extend(it)
            time.sleep(0.05)
        assert [json.loads(v)["v"] for _s, v in rows] == [0, 1, 2, 3]
        assert all(s > 5000 for s, _v in rows)
        assert off == {"seq": 5004}

    def test_checkpointless_restart_without_option_raises(self):
        """With `restart` UNSET, a checkpoint-less restart is ambiguous —
        guessing replay loses live events, guessing live duplicates
        replayed ones — so read() at a committed offset > 0 must fail
        loudly instead of picking either silently. A fresh start
        (offset 0) needs no declaration and proceeds."""
        r = self._reader(self.SCRIPT)  # no checkpointfile, no restart opt
        deadline = time.time() + 20
        while time.time() < deadline:
            with r._lock:
                if len(r._buf) == 4:
                    break
            time.sleep(0.05)
        with pytest.raises(ValueError, match="restart"):
            r.read({"seq": 2})
        # ...but the unset option is fine for a first run (no restart)
        r2 = self._reader(self.SCRIPT)
        rows, off = [], {"seq": 0}
        deadline = time.time() + 20
        while len(rows) < 4 and time.time() < deadline:
            it, off = r2.read(off)
            rows.extend(it)
            time.sleep(0.05)
        assert [json.loads(v)["v"] for _s, v in rows] == [0, 1, 2, 3]

    def test_invalid_restart_option_rejected_at_init(self):
        """Unknown option strings (e.g. 'Live') must not silently mean
        replay — the reader rejects them when the query starts."""
        from php_ec_spark.streaming.jsonrpc import _JsonRpcSimpleReader

        with pytest.raises(ValueError, match="invalid 'restart'"):
            _JsonRpcSimpleReader({
                "cmd": json.dumps([sys.executable, "-c", self.SCRIPT]),
                "restart": "Live",
            })
