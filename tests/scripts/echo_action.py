#!/usr/bin/env python3
"""Python stand-in for a reference action binary (ActionHelper protocol,
tests/scripts/Actions/logToScheduler.php): reads `run` JSON-RPC requests
on stdin, replies with responses (error when params ask for one), emits a
`log` notification per request, and exits cleanly on stdin EOF (the
ActionHelper shutdown contract)."""

import json
import sys

for line in sys.stdin:
    line = line.strip()
    if not line:
        continue
    rpc = json.loads(line)
    if rpc.get("method") != "run":
        continue
    params = rpc.get("params") or {}
    sys.stdout.write(
        json.dumps({
            "jsonrpc": "2.0", "method": "log",
            "params": {"logLevel": "info",
                       "message": "Action called : " + json.dumps(params)},
        }) + "\n"
    )
    if params.get("boom"):
        resp = {"jsonrpc": "2.0", "id": rpc["id"],
                "error": {"code": -32000, "message": "requested failure"}}
    else:
        resp = {"jsonrpc": "2.0", "id": rpc["id"], "result": True}
    sys.stdout.write(json.dumps(resp) + "\n")
    sys.stdout.flush()
