"""Runtime metrics listener (§2.8 Prometheus-counters analog): per-batch
progress rows recorded driver-side next to the lineage table."""

import os
import time

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.streaming.job import run_stream
from openlogreplicator_spark.streaming.metrics import (
    attach_metrics,
    detach_metrics,
    read_metrics,
)


def test_metrics_recorder_captures_batches(spark, tmpdir_path):
    mdir = os.path.join(tmpdir_path, "metrics")
    rec = attach_metrics(spark, mdir)
    try:
        fb = FeedBuilder()
        t = fb.begin()
        t.ins("c1", 0, role="user", text="hello")
        fb.commit(t)
        fb.new_seq()
        t = fb.begin()
        t.upd("c1", 0, text="v2")
        fb.commit(t)
        fb.write_parquet(spark, os.path.join(tmpdir_path, "feed"))
        tbl = run_stream(
            spark,
            os.path.join(tmpdir_path, "feed"),
            os.path.join(tmpdir_path, "tbl"),
            os.path.join(tmpdir_path, "ckpt"),
            max_files_per_trigger=1,
        )
        assert tbl.read().count() == 1
        # listener events are delivered asynchronously on the bus thread
        for _ in range(40):
            rows = read_metrics(spark, mdir).collect()
            if {0, 1} <= {r["batch_id"] for r in rows} and (
                sum(r["num_input_rows"] for r in rows) >= 6
            ):
                break
            time.sleep(0.5)
        else:
            raise AssertionError(f"metrics incomplete: {rows}")
        by_batch = {r["batch_id"]: r for r in rows}
        assert set(by_batch) >= {0, 1}
        assert all(r["batch_duration_ms"] >= 0 for r in rows)
        # at least the 2 txns × 3 events arrived across the batches
        # (numInputRows is Spark's source-side accounting, not exact)
        assert sum(r["num_input_rows"] for r in rows) >= 6
        assert all(r["query_id"] for r in rows)
    finally:
        detach_metrics(spark, rec)
