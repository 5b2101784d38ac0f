"""§2.8 runtime metrics — the Prometheus-counters analog.

The reference exports swap/memory/DML/transaction counters through a
metrics plugin (/root/reference/src/common/metrics/Metrics.h:76-139,
documentation/user-manual: "metrics" config).  The Spark engine already
persists the *semantic* counters per epoch in the lineage table (op
counts, last-applied LSN per shard/table); this module adds the
*runtime* side: a StreamingQueryListener that captures every micro-batch
progress event (input rows, processing rate, per-stage durations) and
appends it driver-side via pyarrow — zero Spark jobs, the same
fixed-cost rule as lineage writes (BASELINE.md round 4).

On a real deployment the same rows would feed a PrometheusServlet or a
pushgateway; here they land in a parquet directory any DataFrame reader
(or the bundled `read_metrics`) can query next to the lineage table.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.listener import StreamingQueryListener

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("add_batch_ms", T.LongType()),
        T.StructField("get_batch_ms", T.LongType()),
    ]
)


class MetricsRecorder(StreamingQueryListener):
    """Append one row per micro-batch progress event to ``out_dir``.

    Events arrive on the listener bus thread; each write is a tiny
    single-file pyarrow append (one file per event, lexicographically
    ordered), so no state is shared with the query thread beyond a
    counter lock."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._n = 0
        self._lock = threading.Lock()
        os.makedirs(out_dir, exist_ok=True)

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = event.progress
        dur = p.durationMs or {}
        row = {
            "query_id": str(p.id),
            "batch_id": int(p.batchId),
            "timestamp": p.timestamp,
            "num_input_rows": int(p.numInputRows),
            "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
            "processed_rows_per_second": float(p.processedRowsPerSecond or 0.0),
            "batch_duration_ms": int(dur.get("triggerExecution", 0)),
            "add_batch_ms": int(dur.get("addBatch", 0)),
            "get_batch_ms": int(dur.get("getBatch", 0)),
        }
        schema = pa.schema(
            [
                pa.field("query_id", pa.string()),
                pa.field("batch_id", pa.int64()),
                pa.field("timestamp", pa.string()),
                pa.field("num_input_rows", pa.int64()),
                pa.field("input_rows_per_second", pa.float64()),
                pa.field("processed_rows_per_second", pa.float64()),
                pa.field("batch_duration_ms", pa.int64()),
                pa.field("add_batch_ms", pa.int64()),
                pa.field("get_batch_ms", pa.int64()),
            ]
        )
        with self._lock:
            i = self._n
            self._n += 1
        tmp = os.path.join(self.out_dir, f".m-{i:08d}.tmp")
        pq.write_table(
            pa.table({k: [v] for k, v in row.items()}, schema=schema), tmp
        )
        os.replace(tmp, os.path.join(self.out_dir, f"m-{i:08d}.parquet"))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def attach_metrics(spark: SparkSession, out_dir: str) -> MetricsRecorder:
    rec = MetricsRecorder(out_dir)
    spark.streams.addListener(rec)
    return rec


def detach_metrics(spark: SparkSession, rec: MetricsRecorder) -> None:
    spark.streams.removeListener(rec)


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    files = [
        os.path.join(out_dir, f)
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".parquet")
    ] if os.path.isdir(out_dir) else []
    if not files:
        return spark.createDataFrame([], METRICS_SCHEMA)
    return spark.read.schema(METRICS_SCHEMA).parquet(*files)
