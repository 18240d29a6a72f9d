"""Streaming observability: a StreamingQueryListener that collects
per-micro-batch progress into plain dicts — the programmatic form of the
metrics a production streaming job exports (rows/sec, batch durations,
state-store size, watermark position).

Why a listener and not polling ``query.lastProgress``: the listener sees
EVERY batch (polling can miss fast availableNow batches), it works for all
queries on the session at once, and it is the documented hook the Spark UI
itself consumes — so what tests assert here is exactly what an operator
dashboard would chart at scale.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Collects lifecycle + progress events for every streaming query on
    the session.  ``progress`` is a list of plain dicts (one per completed
    micro-batch); ``terminated`` maps query id -> exception string or None.
    """

    def __init__(self):
        self.started: list[str] = []
        self.progress: list[dict] = []
        self.terminated: dict[str, str | None] = {}

    # -- listener contract --------------------------------------------------
    def onQueryStarted(self, event):
        self.started.append(str(event.id))

    def onQueryProgress(self, event):
        # event.progress is a StreamingQueryProgress; its json form is the
        # stable cross-version surface
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated[str(event.id)] = (
            str(event.exception) if event.exception else None)

    # -- convenience --------------------------------------------------------
    def batches_for(self, query_name: str) -> list[dict]:
        return [p for p in self.progress if p.get("name") == query_name]

    def total_input_rows(self, query_name: str) -> int:
        return sum(int(p.get("numInputRows", 0))
                   for p in self.batches_for(query_name))

    def summary(self, query_name: str) -> dict:
        batches = self.batches_for(query_name)
        state_rows = 0
        for p in batches:
            for so in p.get("stateOperators") or []:
                state_rows = max(state_rows, int(so.get("numRowsTotal", 0)))
        return {
            "n_batches": len(batches),
            "total_input_rows": self.total_input_rows(query_name),
            "max_state_rows": state_rows,
            "batch_duration_ms": [
                int(p.get("durationMs", {}).get("triggerExecution", 0))
                for p in batches],
        }


def attach_progress_listener(spark) -> ProgressCollector:
    """Register a fresh collector on the session; caller detaches with
    ``spark.streams.removeListener(collector)`` when done."""
    collector = ProgressCollector()
    spark.streams.addListener(collector)
    return collector
