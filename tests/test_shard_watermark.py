"""RAC-analog commit-SCN watermark: cross-shard delivery skew must not
apply commits out of global SCN order (reference:
Replicator.cpp:1142-1210 updateScnWatermark / emitWatermarkedTransactions).

Scenario: shard 1's txn B (higher commit SCN) is DELIVERED one epoch before
shard 0's txn A (lower commit SCN), both writing the same key.  Without the
gate, B applies in epoch 0 and A overwrites it in epoch 1 — stale final
state.  With the gate, B waits in pending until shard 0's frontier passes
its commit SCN; both then collapse in SCN order."""

import os
from datetime import datetime, timezone

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
from openlogreplicator_spark.streaming.job import run_stream

TS = datetime(2024, 3, 1, tzinfo=timezone.utc)


def _skewed_delivery_feed(spark, tmpdir):
    import glob
    import shutil
    import time

    fb = FeedBuilder(n_shards=2)
    a = fb.begin(shard=0)
    a.ins("k", 0, role="user", text="A: earlier commit", ts=TS)
    fb.commit(a)  # commit_scn lower
    b = fb.begin(shard=1)
    b.upd("k", 0, text="B: later commit wins")
    fb.commit(b)  # commit_scn higher
    # heartbeat: an empty txn on shard 0 AFTER b's commit — advances shard
    # 0's frontier past b (reference analog: per-LWN checkpoint records let
    # idle threads move the RAC watermark, 8.checkpointing.adoc:22-40)
    hb = fb.begin(shard=0)
    fb.commit(hb)

    df = fb.to_spark(spark)
    feed_dir = os.path.join(tmpdir, "feed")
    os.makedirs(feed_dir)

    def write_file(subdf, name):
        staging = os.path.join(tmpdir, f"stage-{name}")
        subdf.coalesce(1).write.parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(feed_dir, name))

    # delivery order flipped: shard 1's file lands first, then shard 0's
    write_file(df.filter(df.shard == 1), "seq-00000.parquet")
    time.sleep(1.1)  # distinct modTime → file source order = delivery order
    write_file(df.filter(df.shard == 0), "seq-00001.parquet")
    return feed_dir


def test_watermark_gates_out_of_order_shards(spark, tmpdir_path):
    feed_dir = _skewed_delivery_feed(spark, tmpdir_path)
    table = run_stream(
        spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
        os.path.join(tmpdir_path, "ck"), max_files_per_trigger=1,
        shard_watermark=True, expected_shards=[0, 1],
    )
    rows = table.read().collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "B: later commit wins"
    assert set(table.manifest["shard_frontier"]) == {"0", "1"}
    # only the heartbeat txn may remain pending: its own commit SCN is the
    # newest and therefore above the watermark (the last committer always
    # waits for the other shards to pass it)
    pend_xids = {
        r["xid"] for r in table.pending(CHANGE_EVENT_SCHEMA).select("xid").collect()
    }
    assert len(pend_xids) <= 1


def test_without_watermark_skewed_delivery_misorders(spark, tmpdir_path):
    """Documents WHY the gate exists: naive per-epoch apply of out-of-order
    shards yields the stale value (this is the contract the single-ordered-
    source default relies on the feed to uphold)."""
    feed_dir = _skewed_delivery_feed(spark, tmpdir_path)
    table = run_stream(
        spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
        os.path.join(tmpdir_path, "ck"), max_files_per_trigger=1,
    )
    rows = table.read().collect()
    assert rows[0]["text"] == "A: earlier commit"  # stale — by design here


def test_watermark_single_shard_passthrough(spark, tmpdir_path):
    """With one shard the watermark is the shard's own frontier — no
    gating, identical results to the default path."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 0, text="v2")
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table = run_stream(
        spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
        os.path.join(tmpdir_path, "ck"), shard_watermark=True,
    )
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "v2"
    pend = table.pending(CHANGE_EVENT_SCHEMA)
    assert pend.count() == 0
