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

    def _key(self, name: str | None, qid) -> str:
        # unnamed queries get per-id buckets: two concurrent anonymous
        # queries must not sum into one shared "<unnamed>" row
        return name if name else f"<unnamed:{qid}>"

    def _for(self, name: str | None, qid) -> QueryStats:
        return self.stats.setdefault(self._key(name, qid), QueryStats())

    def onQueryStarted(self, event) -> None:
        self._id_to_name[str(event.id)] = self._key(event.name, event.id)
        self._for(event.name, event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        s = self._for(p.name, p.id)
        s.batches += 1
        s.input_rows += int(p.numInputRows)
        s.busy_ms += int(p.durationMs.get("triggerExecution", 0))
        s.last_watermark = str(p.eventTime.get("watermark", ""))
        if p.stateOperators:
            # total across ALL stateful operators: a stream-stream join
            # plan carries several (dedups + join buffers) and [0] alone
            # hides the buffers that actually grow
            s.state_rows = sum(int(op.numRowsTotal) for op in p.stateOperators)

    def onQueryTerminated(self, event) -> None:
        if event.exception:
            # error bookkeeping (py:294-296, 446-450) — attributed to the
            # terminating query only, via the id→name map from start time
            key = self._id_to_name.get(str(event.id), f"<unnamed:{event.id}>")
            s = self.stats.setdefault(key, QueryStats())
            s.error_count += 1
            s.last_error = str(event.exception)
        # bound the id map: the query is gone
        self._id_to_name.pop(str(event.id), None)

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
