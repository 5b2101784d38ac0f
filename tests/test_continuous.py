"""Continuous-trigger tail — the reference's steady-state online loop.

The reference alternates archived-log catch-up with an infinite online
tail (/root/reference/src/replicator/Replicator.cpp:245-268); availableNow
covers the former, ``processing_time`` covers the latter: the query keeps
polling the feed directory and applies new ``seq-*`` files as incremental
epochs while it runs.  The soak test appends a feed file WHILE the query
is live and asserts the new epoch lands, then stops cleanly.
"""

import os
import time
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.streaming.job import run_stream

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _poll(fn, deadline=120.0, interval=1.0):
    end = time.time() + deadline
    while time.time() < end:
        try:
            if fn():
                return True
        except Exception:
            pass  # table mid-commit / manifest not yet swapped
        time.sleep(interval)
    return False


def test_continuous_trigger_tail_appends_land(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="one", ts=TS)
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)

    table_path = os.path.join(tmpdir_path, "tbl")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    q = run_stream(spark, feed_dir, table_path, ckpt, n_buckets=2,
                   processing_time="1 seconds")
    try:
        assert _poll(
            lambda: LakeTable(spark, table_path).read().count() == 1
        ), "initial epoch never landed"

        # append a new log file while the query is live (atomic dir rename,
        # like an archived log appearing)
        fb2 = FeedBuilder(start_scn=5000)
        fb2._xid_counter = 50  # keep xids distinct from the first builder
        t = fb2.begin()
        t.upd("c1", 0, text="two")
        t.ins("c2", 0, role="assistant", text="late", ts=TS)
        fb2.commit(t)
        staging = os.path.join(tmpdir_path, "staging")
        fb2.write_parquet(spark, staging)
        os.rename(os.path.join(staging, "seq=00000"),
                  os.path.join(feed_dir, "seq=00001"))

        def new_epoch_applied():
            rows = {
                (r["conv_id"], r["turn_idx"]): r["text"]
                for r in LakeTable(spark, table_path).read().collect()
            }
            return rows.get(("c1", 0)) == "two" and ("c2", 0) in rows

        assert _poll(new_epoch_applied), "appended epoch never landed"
    finally:
        q.stop()
        q.awaitTermination()

    table = LakeTable(spark, table_path)
    expected = replay(fb.rows + fb2.rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()],
                         table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want
    # at least two epochs recorded, clean incremental lineage
    assert table.lineage().select("epoch_id").distinct().count() >= 2
