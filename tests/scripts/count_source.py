#!/usr/bin/env python3
"""Python stand-in for the reference's CountToTen.php source script
(tests/scripts/Source/CountToTen.php): emits `handle` notifications for a
counter, a `checkpoint` notification after each event, and one `log`
notification — the exact NDJSON JSON-RPC the reference scheduler consumes.
Honors PHPEC_CHECKPOINT (Scheduler.php:74) to resume after the last
checkpointed value."""

import json
import os
import sys
import zlib

start = 1
ckpt = os.environ.get("PHPEC_CHECKPOINT")
if ckpt:
    start = int(json.loads(ckpt).get("last", 0)) + 1
limit = int(os.environ.get("COUNT_LIMIT", "10"))

if os.environ.get("PHPEC_RPC_COMPRESSION") == "1":
    # raw DEFLATE (RFC 1951), like PHP's zlib.deflate stream filter
    _c = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    _out = sys.stdout.buffer

    class _W:
        def write(self, s):
            _out.write(_c.compress(s.encode()))

        def flush(self):
            _out.write(_c.flush(zlib.Z_SYNC_FLUSH))
            _out.flush()

    sys.stdout = _W()

sys.stdout.write(
    json.dumps({
        "jsonrpc": "2.0", "method": "log",
        "params": {"logLevel": "info", "message": f"counting {start}..{limit}"},
    }) + "\n"
)
for i in range(start, limit + 1):
    sys.stdout.write(
        json.dumps({
            "jsonrpc": "2.0", "method": "handle",
            "params": {"event": {"event": "Count", "value": i}},
        }) + "\n"
    )
    sys.stdout.write(
        json.dumps({
            "jsonrpc": "2.0", "method": "checkpoint", "params": {"last": i},
        }) + "\n"
    )
    sys.stdout.flush()
