"""Stateful-streaming assembly (applyInPandasWithState) — the state-store
architecture variant: per-xid state in Spark's checkpointed store, txns
emitted at commit, cross-batch transactions held in state."""

import json
import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.streaming.stateful import assemble_stateful

TS = datetime(2024, 3, 1, tzinfo=timezone.utc)


def _run_stateful(spark, fb, tmpdir, files_per_trigger=1):
    feed_dir = os.path.join(tmpdir, "feed")
    fb.write_parquet(spark, feed_dir)
    from openlogreplicator_spark.sources.feed import read_feed_stream

    stream = read_feed_stream(spark, feed_dir, files_per_trigger)
    emitted = assemble_stateful(stream)
    q = (
        emitted.writeStream.format("memory")
        .queryName("emitted_txns")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT * FROM emitted_txns").collect()


def test_stateful_emits_committed_txns(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.upd("c1", 0, text="hello v2")
    fb.commit(t)
    r = fb.begin()
    r.ins("c2", 0, role="user", text="rolled back")
    fb.rollback(r)
    rows = _run_stateful(spark, fb, tmpdir_path)
    assert {x["op"] for x in rows} == {"ins", "upd"}
    assert all(x["txn_commit_scn"] is not None for x in rows)
    assert not [x for x in rows if x["conv_id"] == "c2"]


def test_stateful_cross_batch_txn(spark, tmpdir_path):
    """Txn spanning feed files lives in the state store between batches."""
    fb = FeedBuilder()
    long_txn = fb.begin()
    long_txn.ins("c1", 0, role="user", text="opens in batch 0", ts=TS)
    fb.new_seq()
    long_txn.upd("c1", 0, text="commits in batch 1")
    fb.commit(long_txn)
    rows = _run_stateful(spark, fb, tmpdir_path, files_per_trigger=1)
    texts = sorted(
        json.loads(x["after_json"]).get("text") for x in rows if x["after_json"]
    )
    assert texts == ["commits in batch 1", "opens in batch 0"]


def test_stateful_partial_rollback(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="keep", ts=TS)
    t.upd("c1", 0, text="popped")
    t.prollback("c1", 0)
    fb.commit(t)
    rows = _run_stateful(spark, fb, tmpdir_path)
    assert len(rows) == 1
    assert json.loads(rows[0]["after_json"])["text"] == "keep"


def test_stateful_no_begin_dropped(spark, tmpdir_path):
    fb = FeedBuilder()
    orphan = fb.begin_without_begin_event()
    orphan.ins("ghost", 0, role="user", text="no")
    fb.commit(orphan)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="yes", ts=TS)
    fb.commit(t)
    rows = _run_stateful(spark, fb, tmpdir_path)
    assert [x["conv_id"] for x in rows] == ["c1"]


def test_stateful_carries_chunk_columns(spark, tmpdir_path):
    """Chunk events survive the state-store round trip with their
    chunk_no/chunk_text intact (they previously dropped silently), in
    seq_in_txn order even across Arrow chunks."""
    fb = FeedBuilder()
    t = fb.begin()
    t.chunk("c1", 0, 0, "AB")
    t.chunk("c1", 0, 1, "CD")
    t.ins("c1", 0, role="user", text="placeholder", ts=TS)
    fb.commit(t)
    rows = _run_stateful(spark, fb, tmpdir_path)
    chunks = sorted(
        (x["chunk_no"], x["chunk_text"]) for x in rows if x["op"] == "chunk"
    )
    assert chunks == [(0, "AB"), (1, "CD")]
    seqs = [x["seq_in_txn"] for x in sorted(rows, key=lambda r: r["seq_in_txn"])]
    assert seqs == sorted(seqs)


def test_stateful_under_rocksdb_provider(spark, tmpdir_path):
    """The production state-store config (session.build_session
    state_store="rocksdb"): the same cross-batch transaction assembles
    correctly with per-xid state in RocksDB (packed zlib'd binary blobs).
    providerClass is a runtime SQL conf read at query start, so the shared
    session can flip it per-query."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        fb = FeedBuilder()
        t = fb.begin()
        t.ins("c1", 0, role="user", text="v1", ts=TS)
        fb.new_seq()  # txn spans two micro-batches → state crosses batches
        t.upd("c1", 0, text="v2")
        fb.commit(t)
        rows = _run_stateful(spark, fb, tmpdir_path)
        got = sorted((r["op"], r["conv_id"], r["turn_idx"]) for r in rows)
        assert got == [("ins", "c1", 0), ("upd", "c1", 0)]
        assert all(r["txn_commit_scn"] is not None for r in rows)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
