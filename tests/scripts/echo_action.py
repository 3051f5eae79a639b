#!/usr/bin/env python3
"""Python stand-in for a reference action binary (ActionHelper protocol,
tests/scripts/Actions/logToScheduler.php): reads `run` JSON-RPC requests
on stdin, replies with responses (error when params ask for one), emits a
`log` notification per request, and exits cleanly on stdin EOF (the
ActionHelper shutdown contract). With PHPEC_RPC_COMPRESSION=1 both pipe
directions are raw DEFLATE, like the reference's zlib stream filters."""

import json
import os
import sys
import zlib

COMPRESSED = os.environ.get("PHPEC_RPC_COMPRESSION") == "1"
_out = sys.stdout.buffer
_comp = zlib.compressobj(wbits=-zlib.MAX_WBITS) if COMPRESSED else None


def emit(obj):
    data = (json.dumps(obj) + "\n").encode()
    if _comp is not None:
        data = _comp.compress(data) + _comp.flush(zlib.Z_SYNC_FLUSH)
    _out.write(data)
    _out.flush()


def lines():
    if not COMPRESSED:
        # readline, not iteration: the iterator's readahead buffering
        # deadlocks interactive request/response pipes
        yield from iter(sys.stdin.buffer.readline, b"")
        return
    decomp = zlib.decompressobj(-zlib.MAX_WBITS)
    pending = b""
    while True:
        chunk = sys.stdin.buffer.read1(65536)
        if not chunk:
            pending += decomp.flush()
            if pending.strip():
                yield pending
            return
        pending += decomp.decompress(chunk)
        *done, pending = pending.split(b"\n")
        yield from done


for line in lines():
    line = line.strip()
    if not line:
        continue
    rpc = json.loads(line)
    if rpc.get("method") != "run":
        continue
    params = rpc.get("params") or {}
    emit({
        "jsonrpc": "2.0", "method": "log",
        "params": {"logLevel": "info",
                   "message": "Action called : " + json.dumps(params)},
    })
    if params.get("boom"):
        emit({"jsonrpc": "2.0", "id": rpc["id"],
              "error": {"code": -32000, "message": "requested failure"}})
    else:
        emit({"jsonrpc": "2.0", "id": rpc["id"], "result": True})
