"""Streaming job observability (SURVEY §2.1 S9 — the reference's
logging sink, `src/etl.py:14-21, 67-74`, re-expressed for a streaming
engine): a StreamingQueryListener that records per-batch progress
(rows/sec, batch duration, state-store size) so operators watch the
pipeline the way the reference's ETL log watched batch runs.

At scale this is the hook that feeds metrics to the actual sink
(StatsD/Prometheus/log shipper) — the listener runs on the driver and
receives one event per micro-batch, never per row.
"""

from __future__ import annotations

import logging

from pyspark.sql.streaming import StreamingQueryListener

log = logging.getLogger("etl_portfolio_tracker_spark.streaming")


class ProgressLog(StreamingQueryListener):
    """Collects micro-batch progress into `self.batches` (and the
    module logger). Attach with `spark.streams.addListener(...)`;
    detach with `removeListener` — tests assert the recorded rows."""

    def __init__(self) -> None:
        self.batches: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "query_id": p.id,
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "batch_duration_ms": p.batchDuration,
        }
        self.batches.append(row)
        log.info("stream progress %s", row)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)
