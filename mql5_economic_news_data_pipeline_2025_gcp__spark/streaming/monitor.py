"""Streaming observability via ``StreamingQueryListener`` — the
operational telemetry surface every production stream runs with: batch
durations, input rates, and state-store size land in a driver-side
ring buffer (and optionally a JSONL file) as the engine emits progress
events, with zero changes to the queries being watched.

Why a listener and not polling ``lastProgress``: the listener sees
EVERY micro-batch (polling samples whatever happens to be latest),
including the terminal event with the failure reason — which is what
an SLA monitor needs (alert on rising batch duration / falling input
rate BEFORE the query dies, capture why when it does).

Scale note: the listener runs on the driver and must stay O(1) per
event — this one appends a dict to a bounded deque and (optionally)
one JSONL line; anything heavier (metrics backends, alerting) belongs
behind an async queue fed from here.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Bounded in-memory recorder of streaming progress events.

    ``records`` holds the last ``capacity`` per-batch summaries:
    (query id, batch id, input rows, processed rows/sec, batch duration
    ms, state rows). ``terminations`` holds (id, exception) for every
    stopped query — exception is None for clean stops."""

    def __init__(self, capacity: int = 256, jsonl_path: str | None = None):
        self.records: deque = deque(maxlen=capacity)
        self.starts: list = []
        self.terminations: list = []
        self._jsonl = jsonl_path

    # -- listener callbacks (engine threads; keep O(1)) --
    def onQueryStarted(self, event):
        self.starts.append({"id": str(event.id), "name": event.name})

    def onQueryProgress(self, event):
        p = event.progress
        rec = {
            "id": str(p.id),
            "batch_id": p.batchId,
            "n_input_rows": p.numInputRows,
            "rows_per_sec": p.processedRowsPerSecond,
            "batch_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
        }
        self.records.append(rec)
        if self._jsonl:
            with open(self._jsonl, "a") as fh:
                fh.write(json.dumps(rec) + "\n")

    def onQueryTerminated(self, event):
        self.terminations.append(
            {"id": str(event.id), "exception": event.exception}
        )

    def onQueryIdle(self, event):
        pass

    # -- readouts --
    def total_input_rows(self) -> int:
        return sum(r["n_input_rows"] or 0 for r in self.records)

    def slowest_batches(self, k: int = 5) -> list:
        return sorted(
            (r for r in self.records if r["batch_ms"] is not None),
            key=lambda r: -r["batch_ms"],
        )[:k]


def watch(spark, capacity: int = 256, jsonl_path: str | None = None):
    """Attach a fresh recorder to the session; caller owns detachment:

    >>> rec = watch(spark)
    >>> ...run streams...
    >>> spark.streams.removeListener(rec)
    """
    rec = ProgressRecorder(capacity=capacity, jsonl_path=jsonl_path)
    spark.streams.addListener(rec)
    return rec
