"""Per-micro-batch metrics & lineage (SURVEY.md 2.2 K5, 2.4 M5).

The reference samples atomic counters every 10 s (main.cpp:260-275:
processed events, matches, executed/failed actions). Here:

* ``observe()`` columns on the stream give exact per-batch row/match
  counters computed inside the query (no extra pass);
* a ``StreamingQueryListener`` appends one JSON line per micro-batch
  (rows/sec, batch duration, state-store size, watermark, observed
  counters) -- the machine-readable form of the reference's status
  line;
* per-partition row lineage is written by the sink
  (streaming/sink.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


def with_observed_counters(df: DataFrame, name: str = "engine_metrics") -> DataFrame:
    """Attach exact per-batch counters (processed rows, distinct rules
    fired) computed inline by the engine."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.approx_count_distinct("rule_id").alias("rules_fired"),
    )


class JsonProgressListener(StreamingQueryListener):
    """Appends one JSON line per micro-batch progress event."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        # defensive throughout: an exception here is silently swallowed
        # by the listener bus and the metrics line is lost
        try:
            p = event.progress
            observed = {}
            for name, row in (p.observedMetrics or {}).items():
                try:
                    observed[name] = row.asDict()
                except Exception:
                    observed[name] = str(row)
            rec = {
                "ts": time.time(),
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "processed_rows_per_sec": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
                "observed": observed,
                "state": [
                    {
                        "rows": s.numRowsTotal,
                        "updated": s.numRowsUpdated,
                        "mem_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
                "watermark": (p.eventTime or {}).get("watermark"),
            }
        except Exception as e:
            rec = {"ts": time.time(), "listener_error": repr(e)}
        with open(self.out_path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass
