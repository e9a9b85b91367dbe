"""ST9 — runtime monitoring (the reference's status() loop + error
counters, phone_message_producer.py:674-697, 294-296, 446-450).

Two complementary pieces:
- ``EngineQueryListener``: a StreamingQueryListener capturing per-batch
  progress (rows, duration, state size, watermark) and terminal errors —
  the engine-side analog of the reference's error_count/last_error.
- ``status_snapshot``: a point-in-time batch rollup over the detector
  output table, mirroring status()'s counts-by-status/carrier print.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryStats:
    batches: int = 0
    input_rows: int = 0
    busy_ms: int = 0
    last_watermark: str = ""
    state_rows: int = 0
    error_count: int = 0
    last_error: str | None = None


class EngineQueryListener(StreamingQueryListener):
    """Collects per-query progress; attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = {}
        self._id_to_name: dict[str, str] = {}

    def _for(self, name: str | None) -> QueryStats:
        return self.stats.setdefault(name or "<unnamed>", QueryStats())

    def onQueryStarted(self, event) -> None:
        self._id_to_name[str(event.id)] = event.name or "<unnamed>"
        self._for(event.name)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        s = self._for(p.name)
        s.batches += 1
        s.input_rows += int(p.numInputRows)
        s.busy_ms += int(p.durationMs.get("triggerExecution", 0))
        s.last_watermark = str(p.eventTime.get("watermark", ""))
        if p.stateOperators:
            s.state_rows = int(p.stateOperators[0].numRowsTotal)

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            # error bookkeeping (py:294-296, 446-450) — attributed to the
            # terminating query only, via the id→name map from start time
            name = self._id_to_name.get(str(event.id), "<unnamed>")
            s = self._for(name)
            s.error_count += 1
            s.last_error = str(event.exception)

    def onQueryIdle(self, event) -> None:
        pass


def status_snapshot(detector_output: DataFrame) -> DataFrame:
    """status() analog over the detector's output table: counts by kind
    and per-carrier alert counts in one grouping-sets pass."""
    return (
        detector_output.rollup("kind", "carrier")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("kind").asc_nulls_first(), F.col("carrier").asc_nulls_first())
    )
