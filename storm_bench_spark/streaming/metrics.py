"""Streaming metrics exporter — the monitors/ analog (SURVEY.md §6).

The reference scrapes Kafka broker JMX one-minute rates and consumer
lag every 3 s (monitors/minavg/beans:1-3, monitors/offsets/
offsets_monitor.py:60-73). Structured Streaming exposes the same
signals natively on every micro-batch progress event:

- ``inputRowsPerSecond`` / ``processedRowsPerSecond``  ≙ broker
  MessagesInPerSec rates,
- ``numInputRows`` + source start/end offsets          ≙ offset lag,
- ``durationMs``                                       ≙ end-to-end latency.

``MetricsRecorder`` collects them per query into plain dicts (a JSON
line each — the metrics-server feed), so tests and the bench harness
can assert on throughput without any external scraper.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener


class MetricsRecorder(StreamingQueryListener):
    """Listener recording one summary dict per micro-batch progress."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.progress: list[dict] = []

    # StreamingQueryListener interface -----------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        row = {
            "query": p.get("name"),
            "batch_id": p.get("batchId"),
            "num_input_rows": p.get("numInputRows", 0),
            "input_rows_per_sec": p.get("inputRowsPerSecond", 0.0),
            "processed_rows_per_sec": p.get("processedRowsPerSecond", 0.0),
            "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "state_rows": sum(
                s.get("numRowsTotal", 0) for s in p.get("stateOperators", [])
            ),
        }
        with self._lock:
            self.progress.append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # convenience ---------------------------------------------------------
    def total_input_rows(self, query_name: str | None = None) -> int:
        with self._lock:
            return sum(
                r["num_input_rows"]
                for r in self.progress
                if query_name is None or r["query"] == query_name
            )

    def dump_jsonl(self) -> str:
        with self._lock:
            return "\n".join(json.dumps(r) for r in self.progress)
