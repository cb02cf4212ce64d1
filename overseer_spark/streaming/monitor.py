"""Streaming observability: query-progress capture via StreamingQueryListener.

Batch pipelines gate on observed metrics (operators/observe.py); streaming
pipelines gate on PROGRESS — input rate, processed rate, batch duration,
state size. This listener collects each micro-batch's progress event into a
bounded in-memory ring so a monitor loop (worker.py X6 style) can alert on
falling throughput or growing state without polling Spark's UI/REST.

At scale this is the hook where progress rows get appended to a metrics
table (foreachBatch-style) — the capture path is identical; only `on_event`
changes.
"""

from __future__ import annotations

import collections
import json
import threading
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressMonitor(StreamingQueryListener):
    """Collects per-batch progress for all queries on a session."""

    def __init__(self, max_events: int = 1000, on_event: Callable | None = None):
        self._events: collections.deque = collections.deque(maxlen=max_events)
        self._lock = threading.Lock()
        self._on_event = on_event

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API name)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "duration_ms": dict(p.durationMs or {}),
            "state_rows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
        }
        with self._lock:
            self._events.append(row)
        if self._on_event is not None:
            self._on_event(row)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- accessors ----------------------------------------------------------
    def progress(self) -> list[dict[str, Any]]:
        with self._lock:
            return list(self._events)

    def totals(self) -> dict[str, Any]:
        rows = self.progress()
        return {
            "batches": len(rows),
            "input_rows": sum(r["num_input_rows"] or 0 for r in rows),
            "max_state_rows": max((r["state_rows"] for r in rows), default=0),
        }

    def to_json_lines(self) -> str:
        return "\n".join(json.dumps(r) for r in self.progress())


def attach(spark: SparkSession, **kwargs) -> ProgressMonitor:
    mon = ProgressMonitor(**kwargs)
    spark.streams.addListener(mon)
    return mon


def detach(spark: SparkSession, mon: ProgressMonitor) -> None:
    spark.streams.removeListener(mon)
