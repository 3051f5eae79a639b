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

start = 1
ckpt = os.environ.get("PHPEC_CHECKPOINT")
if ckpt:
    start = int(json.loads(ckpt).get("last", 0)) + 1
limit = int(os.environ.get("COUNT_LIMIT", "10"))

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
