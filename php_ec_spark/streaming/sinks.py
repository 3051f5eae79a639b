"""Action sinks (SURVEY S6-S8, W12).

The reference dispatches Actions to long-lived child processes over
JSON-RPC (ActionExecutionCoordinator.php:98-296) with optional JSON-schema
parameter validation (:229-239) and crash-replay of errored actions
(Scheduler.php:841-884). Spark-native rendering:

- :class:`ActionDispatcher` is a ``foreachBatch`` callable. Registered
  actions are either Python callables (closure actions, S7 —
  ClosureActionWrapper.php:24-93) or external commands fed NDJSON on stdin
  (process actions, S6 — one subprocess per batch, batch-vectorized where
  the reference is request-at-a-time).
- Parameter validation (S8) is a minimal typed-schema check (the container
  ships no jsonschema lib): ``{"field": type, ...}`` with required/optional
  markers.
- Idempotency/at-least-once (W12): foreachBatch may replay a batch after a
  crash; the dispatcher records the last completed ``batchId`` per action
  in the driver and skips duplicates within a run, while cross-run replay
  relies on idempotent action design — the same contract the reference's
  RECOVERY state imposes on action authors.
"""

from __future__ import annotations

import json
import subprocess
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame


class ActionValidationError(ValueError):
    pass


@dataclass
class ActionSpec:
    name: str
    fn: Optional[Callable[[list[dict]], None]] = None  # closure action (S7)
    cmd: Optional[list[str]] = None  # process action (S6): NDJSON on stdin
    schema: Optional[dict] = None  # S8: {"field": type | (type, "optional")}
    single_shot: bool = False  # new process per batch vs reuse

    def validate(self, row: dict) -> None:
        if not self.schema:
            return
        for fname, spec in self.schema.items():
            optional = isinstance(spec, tuple) and "optional" in spec[1:]
            typ = spec[0] if isinstance(spec, tuple) else spec
            if fname not in row or row[fname] is None:
                if optional:
                    continue
                raise ActionValidationError(
                    f"action {self.name}: missing required param {fname!r}"
                )
            if typ is not None and not isinstance(row[fname], typ):
                raise ActionValidationError(
                    f"action {self.name}: param {fname!r} expected "
                    f"{getattr(typ, '__name__', typ)}, got {type(row[fname]).__name__}"
                )


@dataclass
class ActionDispatcher:
    """foreachBatch sink: routes emission rows to registered actions.

    Rows are routed by their ``rule`` column (one action per rule name;
    ``default_action`` catches the rest). Called as ``dispatcher(df,
    batch_id)`` by Structured Streaming, or directly on a batch DataFrame.
    """

    actions: dict[str, ActionSpec] = field(default_factory=dict)
    default_action: Optional[ActionSpec] = None
    completed: list = field(default_factory=list)  # (batch_id, action, n) log
    failed: list = field(default_factory=list)
    _done_batches: set = field(default_factory=set)

    def register(
        self,
        name: str,
        fn: Optional[Callable[[list[dict]], None]] = None,
        cmd: Optional[list[str]] = None,
        schema: Optional[dict] = None,
        rules: Optional[list[str]] = None,
        single_shot: bool = False,
    ) -> "ActionDispatcher":
        """register_action analog (Scheduler.php:316-319 / AEC.php:89-92)."""
        spec = ActionSpec(name=name, fn=fn, cmd=cmd, schema=schema, single_shot=single_shot)
        if rules is None:
            self.default_action = spec
        else:
            for r in rules:
                self.actions[r] = spec
        return self

    def __call__(self, df: DataFrame, batch_id: int = -1) -> None:
        if batch_id >= 0 and batch_id in self._done_batches:
            return  # intra-run replay dedup (W12)
        rows = [r.asDict() for r in df.collect()]
        by_action: dict[str, list[dict]] = {}
        specs: dict[str, ActionSpec] = {}
        for row in rows:
            spec = self.actions.get(row.get("rule")) or self.default_action
            if spec is None:
                continue
            by_action.setdefault(spec.name, []).append(row)
            specs[spec.name] = spec
        for name, batch in by_action.items():
            spec = specs[name]
            try:
                for row in batch:
                    spec.validate(row)
                if spec.fn is not None:
                    spec.fn(batch)
                elif spec.cmd is not None:
                    payload = "".join(
                        json.dumps(r, default=str) + "\n" for r in batch
                    )
                    subprocess.run(
                        spec.cmd, input=payload.encode(), check=True, timeout=60
                    )
                self.completed.append((batch_id, name, len(batch)))
            except Exception as e:  # quarantine, don't kill the engine
                # (the reference PANICS on rule/action errors,
                # Scheduler.php:339-349 — we deliberately soften that)
                self.failed.append((batch_id, name, len(batch), repr(e)))
        if batch_id >= 0:
            self._done_batches.add(batch_id)
