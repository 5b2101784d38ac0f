"""Streaming-path tests: micro-batch replay, cross-batch transactions
(pending state), kill-and-resume, replay idempotence, DDL fencing.

Reference analogs: checkpoint resume (8.checkpointing.adoc), long-spanning
transaction across a log switch (@MID_SWITCH fixtures), writer replay dedup
(Writer.cpp:296-298)."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows, run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.lake import LakeTable
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.streaming.job import run_stream

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _spanning_feed():
    """A txn that spans a feed-file boundary → spans micro-batches when
    maxFilesPerTrigger=1 (long-spanning-txn scenario)."""
    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="batch0", ts=TS)
    long_txn = fb.begin()
    long_txn.ins("c2", 0, role="user", text="spans the switch", ts=TS)
    fb.commit(t1)
    fb.new_seq()  # ---- log switch: long_txn still open ----
    long_txn.upd("c2", 0, text="finished in batch1")
    fb.commit(long_txn)
    t3 = fb.begin()
    t3.ins("c1", 1, role="assistant", text="batch1", ts=TS)
    fb.commit(t3)
    return fb


def test_long_spanning_txn_streaming(spark, tmpdir_path):
    table, _ = run_and_compare(
        spark, _spanning_feed(), tmpdir_path, via="stream", max_files_per_trigger=1
    )
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c2", 0)]["text"] == "finished in batch1"
    assert len(rows) == 3


def test_streaming_matches_batch(spark, tmpdir_path):
    """Same feed through bounded replay and micro-batched streaming →
    identical state (micro-batching is an implementation detail)."""
    fb = _spanning_feed()
    t = fb.begin()
    t.delete("c1", 0)
    fb.commit(t)
    table, _ = run_and_compare(
        spark, fb, tmpdir_path, via="stream", max_files_per_trigger=1
    )


def test_kill_before_apply_and_resume(spark, tmpdir_path):
    """Crash BEFORE the epoch applies → restart replays it from the
    checkpoint; final state identical to the oracle."""
    fb = _spanning_feed()
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table_path = os.path.join(tmpdir_path, "tbl")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    try:
        run_stream(spark, feed_dir, table_path, ckpt, max_files_per_trigger=1,
                   fail_at_epoch=1, fail_after_apply=False)
        raise AssertionError("expected injected crash")
    except Exception as e:
        assert "injected crash" in str(e)

    table = run_stream(spark, feed_dir, table_path, ckpt, create=False,
                       max_files_per_trigger=1)
    expected = replay(fb.rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()], table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want


def test_kill_after_apply_and_resume(spark, tmpdir_path):
    """Crash AFTER apply but before the streaming checkpoint records the
    epoch → the replayed epoch is deduped by the manifest ledger
    (exactly-once across the sink boundary)."""
    fb = _spanning_feed()
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table_path = os.path.join(tmpdir_path, "tbl")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    try:
        run_stream(spark, feed_dir, table_path, ckpt, max_files_per_trigger=1,
                   fail_at_epoch=0, fail_after_apply=True)
        raise AssertionError("expected injected crash")
    except Exception as e:
        assert "injected crash" in str(e)

    table = run_stream(spark, feed_dir, table_path, ckpt, create=False,
                       max_files_per_trigger=1)
    expected = replay(fb.rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()], table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want
    # epoch 0 must appear exactly once in the ledger (no double apply)
    ledger = table.manifest["ledger"]["stream"]
    assert "0:done" in ledger


def test_replay_idempotence(spark, tmpdir_path):
    """Feed the same events twice (fresh checkpoint, same job) → identical
    final state (Writer.cpp:296-298 / Metadata.cpp:716-727 analog)."""
    fb = _spanning_feed()
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table_path = os.path.join(tmpdir_path, "tbl")

    t1 = run_stream(spark, feed_dir, table_path, os.path.join(tmpdir_path, "ck1"),
                    max_files_per_trigger=1)
    state1 = sorted(map(tuple, t1.read().collect()))
    # same feed again: new checkpoint, new job id → events re-enter the
    # pipeline; txns already applied produce identical net changes (puts of
    # the same values / deletes of absent keys) → state unchanged
    t2 = run_stream(spark, feed_dir, table_path, os.path.join(tmpdir_path, "ck2"),
                    create=False, job_id="replay2", max_files_per_trigger=1)
    state2 = sorted(map(tuple, t2.read().collect()))
    assert state1 == state2


def test_ddl_mid_stream(spark, tmpdir_path):
    """DDL lands in its own micro-batch position; later batches use the
    evolved schema; fencing keeps the ALTER between merges."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="pre", ts=TS)
    fb.commit(t)
    fb.new_seq()
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    fb.new_seq()
    t = fb.begin()
    t.upd("c1", 0, meta="post-ddl meta")
    fb.commit(t)
    table, _ = run_and_compare(
        spark, fb, tmpdir_path, via="stream", max_files_per_trigger=1
    )
    assert table.value_names[-1] == "meta"
    row = table.read().collect()[0]
    assert row["meta"] == "post-ddl meta"
    assert row["text"] == "pre"


def test_lineage_accumulates_per_epoch(spark, tmpdir_path):
    fb = _spanning_feed()
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table = run_stream(spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
                       os.path.join(tmpdir_path, "ck"), max_files_per_trigger=1)
    lin = table.lineage().orderBy("epoch_id").collect()
    epochs = {r["epoch_id"] for r in lin}
    assert epochs == {0, 1}
    # last_applied_lsn advances monotonically per shard
    by_shard = {}
    for r in lin:
        prev = by_shard.get(r["shard"], -1)
        assert r["last_applied_lsn"] >= prev
        by_shard[r["shard"]] = r["last_applied_lsn"]


def test_pending_state_snapshot(spark, tmpdir_path):
    """After a batch that leaves a txn open, the pending snapshot holds
    exactly that txn's events (TransactionBuffer state carry)."""
    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="closed", ts=TS)
    open_txn = fb.begin()
    open_txn.ins("c2", 0, role="user", text="never commits", ts=TS)
    fb.commit(t1)
    # open_txn never commits
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    table = run_stream(spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
                       os.path.join(tmpdir_path, "ck"))
    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA

    pend = table.pending(CHANGE_EVENT_SCHEMA).collect()
    assert {r["xid"] for r in pend} == {open_txn.xid}
    assert {r["op"] for r in pend} == {"begin", "ins"}
    assert table.read().count() == 1  # open txn not applied


def test_open_txn_expiry(spark, tmpdir_path):
    """An abandoned open transaction (begin + DML, commit never arrives)
    must stop riding the pending snapshot once its scn trails the feed by
    more than max_open_scn_lag, and count as skipped (reference: stale txn
    discard at forced checkpoint)."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb1 = FeedBuilder()
    t = fb1.begin()
    t.ins("c1", 0, role="user", text="committed", ts=TS)
    fb1.commit(t)
    orphan = fb1.begin()
    orphan.ins("c9", 0, role="user", text="never committed", ts=TS)
    # no commit — abandoned forever

    fb2 = FeedBuilder(start_scn=100000)
    t = fb2.begin()
    t.ins("c2", 0, role="user", text="later", ts=TS)
    fb2.commit(t)

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)
    apply_epoch(table, fb1.to_spark(spark), 0, job_id="j", max_open_scn_lag=1000)
    pend = table.pending(CHANGE_EVENT_SCHEMA)
    assert pend.filter(F.col("conv_id") == "c9").count() == 1  # still fresh

    apply_epoch(table, fb2.to_spark(spark), 1, job_id="j", max_open_scn_lag=1000)
    table.refresh()
    assert table.pending(CHANGE_EVENT_SCHEMA).count() == 0  # expired, gone
    skipped = (
        table.lineage().filter(F.col("epoch_id") == 1)
        .agg(F.sum("n_skipped").alias("s")).first()["s"]
    )
    assert skipped == 1
    rows = {(r["conv_id"], r["turn_idx"]) for r in table.read().collect()}
    assert rows == {("c1", 0), ("c2", 0)}


def test_watermark_gated_txn_never_expires(spark, tmpdir_path):
    """A committed txn held back by the shard watermark must NOT be expired
    by max_open_scn_lag — only commit-less orphans are."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    # shard 0 commits a txn; shard 1 is expected but silent → watermark
    # pins at 0 and the txn is gated into pending
    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=0)
    t.ins("c1", 0, role="user", text="gated", ts=TS)
    fb.commit(t)

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j",
                shard_watermark=True, expected_shards=[0, 1],
                max_open_scn_lag=1)
    assert table.read().count() == 0  # gated, not applied

    # next epoch: shard 1 still silent, scns advance far beyond the lag
    fb2 = FeedBuilder(n_shards=2, start_scn=100000)
    t = fb2.begin(shard=0)
    t.ins("c2", 0, role="user", text="more", ts=TS)
    fb2.commit(t)
    apply_epoch(table, fb2.to_spark(spark), 1, job_id="j",
                shard_watermark=True, expected_shards=[0, 1],
                max_open_scn_lag=1)
    table.refresh()
    # the gated committed txn is STILL pending (not expired)
    pend = table.pending(CHANGE_EVENT_SCHEMA)
    assert pend.filter(F.col("conv_id") == "c1").count() == 1
