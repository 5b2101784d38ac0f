"""Filter operators (F3/F4/F6) and the transaction size cap (T6)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from helpers import run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.operators.filters import (
    first_data_lsn_filter,
    shard_filter,
    skip_xid_filter,
)
from openlogreplicator_spark.streaming.job import replay_batch

TS = datetime(2024, 3, 1, tzinfo=timezone.utc)


def test_skip_xid_filter(spark):
    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="keep", ts=TS)
    fb.commit(t1)
    t2 = fb.begin()
    t2.ins("c2", 0, role="user", text="skip me")
    fb.commit(t2)
    feed = fb.to_spark(spark)
    out = skip_xid_filter(feed, [t2.xid])
    assert out.filter(F.col("xid") == t2.xid).count() == 0
    assert out.filter(F.col("xid") == t1.xid).count() == 3


def test_shard_filter(spark):
    fb = FeedBuilder(n_shards=3)
    for s in range(3):
        t = fb.begin(shard=s)
        t.ins(f"c{s}", 0, role="user", text=f"shard {s}", ts=TS)
        fb.commit(t)
    feed = fb.to_spark(spark)
    assert shard_filter(feed, [1]).select("shard").distinct().collect() == [
        spark.createDataFrame([(1,)], ["shard"]).collect()[0]
    ]
    assert shard_filter(feed, None).count() == feed.count()


def test_first_data_lsn_filter(spark):
    fb = FeedBuilder(n_shards=2)
    a = fb.begin(shard=0)
    a.ins("c1", 0, role="user", text="old", ts=TS)
    fb.commit(a)
    b = fb.begin(shard=0)
    b.ins("c1", 1, role="user", text="new", ts=TS)
    fb.commit(b)
    feed = fb.to_spark(spark)
    # resume after shard 0 lsn 3 (a's commit) → only b's events remain
    out = first_data_lsn_filter(feed, {0: 3})
    assert out.count() == 3
    assert out.agg(F.min("lsn")).collect()[0][0] == 4


def test_txn_size_cap(spark, tmpdir_path):
    """T6 — oversize txns dropped whole and counted skipped."""
    fb = FeedBuilder()
    big = fb.begin()
    for i in range(50):
        big.ins("big", i, role="user", text=f"b{i}", ts=TS)
    fb.commit(big)
    small = fb.begin()
    small.ins("ok", 0, role="user", text="small txn", ts=TS)
    fb.commit(small)

    table = replay_batch(
        spark, fb.to_spark(spark), f"{tmpdir_path}/tbl", max_txn_ops=10
    )
    rows = [r["conv_id"] for r in table.read().collect()]
    assert rows == ["ok"]
    lin = table.lineage().collect()
    assert sum(r["n_skipped"] for r in lin) == 50


def test_dump_xid_trace(spark, tmpdir_path):
    """F3's trace twin (reference dumpXidList): named transactions are
    dumped as ordered JSON lines per epoch; the apply is unaffected."""
    import glob
    import json
    import os

    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="traced")
    fb.commit(t1)
    t2 = fb.begin()
    t2.ins("c2", 0, role="user", text="not traced")
    fb.commit(t2)

    path = os.path.join(tmpdir_path, "tbl")
    dump_dir = os.path.join(tmpdir_path, "dump")
    table = create_target(spark, path, n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j",
                dump_xids=[t1.xid], dump_dir=dump_dir)

    lines = []
    for f in sorted(glob.glob(os.path.join(dump_dir, "epoch=*/part-*"))):
        with open(f) as fh:
            lines += [json.loads(ln) for ln in fh if ln.strip()]
    assert lines and all(r["xid"] == t1.xid for r in lines)
    assert [r["op"] for r in lines] == ["begin", "ins", "commit"]  # scn order
    # both txns still applied — tracing is not skipping
    got = sorted((r["conv_id"], r["turn_idx"]) for r in table.read().collect())
    assert got == [("c1", 0), ("c2", 0)]
