"""Protobuf wire ingress (sources/protobuf_feed.py): a chained instance
replays the binary RedoResponse spool and converges to the source state —
the W7 builder's inverse, mirroring the JSON chaining loop."""

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.operators.assemble import (
    assemble_transactions,
    match_partial_rollbacks,
)
from openlogreplicator_spark.sources.network import write_protobuf_mirror
from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _rows(table):
    return normalize_rows(
        [r.asDict() for r in table.read().collect()], table.value_names
    )


def _committed_dml(spark, fb):
    committed = match_partial_rollbacks(
        assemble_transactions(fb.to_spark(spark))["committed"]
    )
    return committed.filter(F.col("op").isin("ins", "upd", "del"))


def test_protobuf_spool_roundtrip(spark, tmpdir_path):
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin(attrs={"username": "alice"})
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.ins("c1", 1, role="assistant", text="hi", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 0, text=None)       # set-to-NULL: unset oneof on the wire
    t.upd("c1", 1, tool="calc")
    t.ins("c2", 0, role="user", text="x", ts=TS)
    t.delete("c2", 0)
    fb.commit(t)

    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j")

    spool = os.path.join(tmpdir_path, "spool")
    write_protobuf_mirror(_committed_dml(spark, fb), spool, 0)

    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=4)
    apply_epoch(dst, read_protobuf_feed(spark, spool), 0, job_id="chain")

    assert _rows(dst) == _rows(src)
    row = {(r["conv_id"], r["turn_idx"]): r for r in dst.read().collect()}
    assert row[("c1", 0)]["text"] is None          # NULL survived the wire
    assert row[("c1", 0)]["role"] == "user"        # unchanged col kept
    assert row[("c1", 1)]["tool"] == "calc"
    assert ("c2", 0) not in row                    # delete keyed via before


def test_protobuf_ddl_on_the_wire(spark, tmpdir_path):
    """Committed DDL encodes as an op=ddl RedoResponse (Payload.ddl,
    Op enum 5) and the chained instance evolves its schema."""
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a", ts=TS)
    fb.commit(t)
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb.begin()
    t.upd("c1", 0, meta="m1")
    fb.commit(t)

    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j")

    committed = match_partial_rollbacks(
        assemble_transactions(fb.to_spark(spark))["committed"]
    )
    ddls = sorted(
        (r["txn_commit_scn"], r["seq_in_txn"], r["ddl_stmt"])
        for r in committed.filter(F.col("op") == "ddl")
        .select("txn_commit_scn", "seq_in_txn", "ddl_stmt").collect()
    )
    spool = os.path.join(tmpdir_path, "spool")
    write_protobuf_mirror(
        committed.filter(F.col("op").isin("ins", "upd", "del")), spool, 0,
        ddls=ddls,
    )
    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=2)
    apply_epoch(dst, read_protobuf_feed(spark, spool), 0, job_id="chain")
    assert "meta" in dst.value_names
    assert _rows(dst) == _rows(src)
    rows = dst.read().collect()
    assert rows[0]["meta"] == "m1"


def test_protobuf_fuzz_roundtrip(spark, tmpdir_path):
    from test_fuzz_differential import _random_feed

    for seed in (23, 777):
        base = os.path.join(tmpdir_path, f"s{seed}")
        fb = _random_feed(seed)
        src = create_target(spark, base + "/src", n_buckets=4)
        apply_epoch(src, fb.to_spark(spark), 0, job_id="j")
        spool = base + "/spool"
        # chunk ops reassemble before the wire; mirror the DML survivors
        from openlogreplicator_spark.operators.assemble import reassemble_chunks

        dml = reassemble_chunks(
            match_partial_rollbacks(
                assemble_transactions(fb.to_spark(spark))["committed"]
            ).filter(F.col("op").isin("ins", "upd", "del", "chunk"))
        ).filter(F.col("op") != "chunk")
        write_protobuf_mirror(dml, spool, 0)
        dst = create_target(spark, base + "/dst", n_buckets=2)
        apply_epoch(dst, read_protobuf_feed(spark, spool), 0, job_id="chain")
        assert _rows(dst) == _rows(src), f"seed {seed} diverged"


def test_chained_stream_tails_growing_protobuf_spool(spark, tmpdir_path):
    """run_chained_stream(wire_format="protobuf"): the downstream
    instance TAILS the growing binary spool with Structured Streaming —
    drains the backlog, resumes from its checkpoint when the spool
    grows, and committed DDL on the wire evolves the replica schema."""
    from openlogreplicator_spark.streaming.job import run_chained_stream

    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    spool = os.path.join(tmpdir_path, "spool")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    dst_path = os.path.join(tmpdir_path, "dst")

    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", ts=TS)
    fb.commit(t)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j")
    write_protobuf_mirror(_committed_dml(spark, fb), spool, 0)

    dst = run_chained_stream(spark, spool, dst_path, ckpt, n_buckets=2,
                             wire_format="protobuf")
    assert _rows(dst) == _rows(src)
    v_after_drain = dst.manifest["version"]

    # upstream keeps going: DDL + update ride the binary wire
    fb2 = FeedBuilder(start_scn=2000)
    fb2.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb2.begin()
    t.upd("c1", 0, meta="m1")
    t.ins("c2", 0, role="user", text="new", ts=TS)
    fb2.commit(t)
    apply_epoch(src, fb2.to_spark(spark), 1, job_id="j")
    committed = match_partial_rollbacks(
        assemble_transactions(fb2.to_spark(spark))["committed"]
    )
    ddls = sorted(
        (r["txn_commit_scn"], r["seq_in_txn"], r["ddl_stmt"])
        for r in committed.filter(F.col("op") == "ddl")
        .select("txn_commit_scn", "seq_in_txn", "ddl_stmt").collect()
    )
    write_protobuf_mirror(
        committed.filter(F.col("op").isin("ins", "upd", "del")), spool, 1,
        ddls=ddls,
    )

    dst = run_chained_stream(spark, spool, dst_path, ckpt, create=False,
                             n_buckets=2, wire_format="protobuf")
    assert "meta" in dst.value_names
    assert _rows(dst) == _rows(src)
    assert dst.manifest["version"] > v_after_drain
    # caught-up resume is a no-op (checkpoint remembers processed files)
    v_caught_up = dst.manifest["version"]
    dst = run_chained_stream(spark, spool, dst_path, ckpt, create=False,
                             n_buckets=2, wire_format="protobuf")
    assert dst.manifest["version"] == v_caught_up


def test_stream_spool_egress_feeds_tcp_replica(spark, tmpdir_path):
    """The whole W4/W7 loop off the epoch path: run_stream(
    protobuf_spool_dir=...) spools each epoch's committed ops (+DDL) as
    RedoResponse frames; RedoStreamServer serves them over TCP and
    replicate_from_stream merges them into a second lake that converges
    — with the schema evolution riding the wire."""
    from openlogreplicator_spark.sources.network import (
        RedoStreamServer,
        replicate_from_stream,
    )
    from openlogreplicator_spark.streaming.job import run_stream

    feed_dir = os.path.join(tmpdir_path, "feed")
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", ts=TS)
    fb.commit(t)
    fb.new_seq()
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb.begin()
    t.upd("c1", 0, meta="m1")
    t.ins("c2", 0, role="user", text="v2", ts=TS)
    fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    spool = os.path.join(tmpdir_path, "spool")
    src = run_stream(
        spark, feed_dir, os.path.join(tmpdir_path, "src"),
        os.path.join(tmpdir_path, "ckpt"), n_buckets=2,
        max_files_per_trigger=1, protobuf_spool_dir=spool,
    )
    assert len([d for d in os.listdir(spool) if d.startswith("epoch=")]) == 2

    replica = os.path.join(tmpdir_path, "replica")
    create_target(spark, replica, n_buckets=2)
    server = RedoStreamServer(spool, db_name="transcripts_feed")
    host, port = server.start()
    try:
        res = replicate_from_stream(
            spark, host, port, "transcripts_feed", replica,
        )
        assert res["frames"] > 0
    finally:
        server.stop()
    from openlogreplicator_spark.lake import LakeTable

    dst = LakeTable(spark, replica)
    assert "meta" in dst.value_names
    assert _rows(dst) == _rows(src)


def _multi_upstream(spark, tmpdir_path, spool):
    """Upstream catalog: two pre-registered tables + a mid-stream CREATE
    TABLE, epoch spooled as protobuf frames (protobuf_spool_dir egress)."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    src = Catalog.create(spark, os.path.join(tmpdir_path, "src"))
    for n in ("transcripts", "summaries"):
        src.create_table(n, n_buckets=2)
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="u", text="a", ts=TS)
    t.dml_other_table("summaries", "c2", 0, op="ins", role="s", text="b")
    fb.commit(t)
    fb.ddl_txn(
        "CREATE TABLE audit (role string, text string, tool string, ts timestamp)",
        ["role", "text", "tool", "ts"],
    )
    t = fb.begin()
    t.dml_other_table("audit", "c3", 0, op="ins", role="a", text="c")
    fb.commit(t)
    apply_epoch_multi(src, fb.to_spark(spark), 0, protobuf_spool_dir=spool)
    assert "audit" in src.table_names
    return src


def _catalog_states(cat):
    return {
        n: sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in cat.table(n).read().collect()
        )
        for n in cat.table_names
    }


def test_multi_table_tcp_replica(spark, tmpdir_path):
    """Multi-table replication over the reference's own TCP wire:
    replicate_from_stream(multi=True) routes frames to per-table
    LakeTables via the payload schema and CREATE TABLE DDL frames evolve
    the replica registry."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.sources.network import (
        RedoStreamServer,
        replicate_from_stream,
    )

    spool = os.path.join(tmpdir_path, "spool")
    src = _multi_upstream(spark, tmpdir_path, spool)

    dst = Catalog.create(spark, os.path.join(tmpdir_path, "dst"))
    for n in ("transcripts", "summaries"):
        dst.create_table(n, n_buckets=2)
    server = RedoStreamServer(spool, db_name="transcripts_feed")
    host, port = server.start()
    try:
        res = replicate_from_stream(
            spark, host, port, "transcripts_feed",
            os.path.join(tmpdir_path, "dst"), multi=True,
        )
        assert res["frames"] > 0
    finally:
        server.stop()
    dst.refresh()
    assert set(dst.table_names) == {"transcripts", "summaries", "audit"}
    assert _catalog_states(dst) == _catalog_states(src)


def test_multi_table_chained_protobuf_tail(spark, tmpdir_path):
    """run_chained_stream_multi(wire_format='protobuf'): a downstream
    CATALOG tails the binary spool; table routing + CREATE TABLE DDL
    ride the RedoResponse frames."""
    from openlogreplicator_spark.streaming.job import run_chained_stream_multi

    spool = os.path.join(tmpdir_path, "spool")
    src = _multi_upstream(spark, tmpdir_path, spool)
    dst = run_chained_stream_multi(
        spark, spool, os.path.join(tmpdir_path, "dst"),
        os.path.join(tmpdir_path, "ckpt"),
        tables=["transcripts", "summaries"], n_buckets=2,
        wire_format="protobuf",
    )
    assert set(dst.table_names) == {"transcripts", "summaries", "audit"}
    assert _catalog_states(dst) == _catalog_states(src)


def test_fuzz_multi_table_network_replica(spark, tmpdir_path):
    """Multi-table exactly-once over the TCP wire under confirm-state
    perturbation: random two-table op soup (incl. TRUNCATE DDL riding
    the wire), spooled in two epochs, drained into a Catalog replica
    with random chunk sizes; the confirm checkpoint is wiped or rewound
    between drains.  The applied frontier (catalog ledger) must keep the
    replica equal to the direct multi-table replay."""
    import random
    import time

    from test_fuzz_differential import _random_multi_feed

    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.sources.network import (
        RedoStreamServer,
        replicate_from_stream,
        write_protobuf_mirror,
    )
    from openlogreplicator_spark.streaming.job import replay_batch_multi

    def states(cat):
        return {
            n: sorted(
                (r["conv_id"], r["turn_idx"], r["text"])
                for r in cat.table(n).read().collect()
            )
            for n in cat.table_names
        }

    for seed in (7, 42):
        rng = random.Random(seed)
        base = os.path.join(tmpdir_path, f"s{seed}")
        fb = _random_multi_feed(seed)
        src = replay_batch_multi(
            spark, fb.to_spark(spark), base + "/src",
            tables=["transcripts", "summaries"], n_buckets=4,
        )
        expected = states(src)

        committed = match_partial_rollbacks(
            assemble_transactions(fb.to_spark(spark))["committed"]
        )
        dml = committed.filter(F.col("op").isin("ins", "upd", "del"))
        ddls = sorted(
            (r["txn_commit_scn"], r["seq_in_txn"], r["ddl_stmt"])
            for r in committed.filter(F.col("op") == "ddl")
            .select("txn_commit_scn", "seq_in_txn", "ddl_stmt").collect()
        )
        scns = sorted(
            r["txn_commit_scn"]
            for r in committed.select("txn_commit_scn").distinct().collect()
        )
        cut = scns[len(scns) // 2 - 1]
        spool = base + "/spool"
        write_protobuf_mirror(
            dml.filter(F.col("txn_commit_scn") <= cut), spool, 0,
            ddls=[d for d in ddls if d[0] <= cut],
        )
        write_protobuf_mirror(
            dml.filter(F.col("txn_commit_scn") > cut), spool, 1,
            ddls=[d for d in ddls if d[0] > cut],
        )

        dst_path = base + "/dst"
        dst = Catalog.create(spark, dst_path)
        for n in ("transcripts", "summaries"):
            dst.create_table(n, n_buckets=2)
        server = RedoStreamServer(spool, db_name="transcripts_feed")
        host, port = server.start()
        try:
            def drain():
                replicate_from_stream(
                    spark, host, port, "transcripts_feed", dst_path,
                    multi=True, chunk_frames=rng.choice([3, 9, 50]),
                )
                for _ in range(100):
                    if server.confirmed_scn() == max(scns):
                        return
                    time.sleep(0.05)
                raise AssertionError("final confirm never landed")

            drain()
            for _ in range(2):
                if rng.random() < 0.5:
                    os.remove(os.path.join(spool, "confirmed.json"))
                else:
                    server._record_confirm(rng.choice(scns))
                drain()
            assert states(dst.refresh()) == expected, (
                f"seed {seed}: multi replica diverged"
            )
        finally:
            server.stop()


def test_multi_payload_response_full_mode(spark, tmpdir_path):
    """RedoResponse.payload is REPEATED (OraProtoBuf.proto field 9): a
    MESSAGE_FORMAT::FULL producer packs a whole transaction into one
    response.  The ingress must iterate every payload (offsetting idx by
    position for intra-txn order), not just the first."""
    import pandas as pd

    from openlogreplicator_spark.functions.protobuf_output import (
        encode_payload,
        encode_redo_response,
    )
    from openlogreplicator_spark.streaming.job import replay_batch

    key = [("conv_id", "c1"), ("turn_idx", 1)]
    full_txn = encode_redo_response(
        2000, 0, "xA", "db", [
            encode_payload("ins", "APP", "transcripts", None, None,
                           key + [("role", "user"), ("text", "v1")]),
            encode_payload("upd", "APP", "transcripts", None, None,
                           key + [("text", "v2")]),
        ])
    single = encode_redo_response(
        2001, 0, "xB", "db", [
            encode_payload("ins", "APP", "transcripts", None, None,
                           [("conv_id", "c2"), ("turn_idx", 0),
                            ("role", "asst"), ("text", "solo")]),
        ])
    spool = os.path.join(tmpdir_path, "spool", "epoch=000000")
    os.makedirs(spool)
    pd.DataFrame(
        {"scn": [2000, 2001], "idx": [0, 0],
         "message": [full_txn, single]}
    ).to_parquet(os.path.join(spool, "part-0.parquet"))

    events = read_protobuf_feed(spark, os.path.join(tmpdir_path, "spool"))
    tbl = replay_batch(spark, events, os.path.join(tmpdir_path, "tbl"))
    got = {(r.conv_id, r.turn_idx): (r.text, r.role)
           for r in tbl.read().collect()}
    # the upd (payload #2) applied ON TOP of the ins (payload #1)
    assert got == {("c1", 1): ("v2", "user"), ("c2", 0): ("solo", "asst")}


def test_protobuf_full_message_mode(spark, tmpdir_path):
    """MESSAGE_FORMAT::FULL on the protobuf wire: one multi-payload
    RedoResponse per transaction; a chained replica converges to the same
    state as the one-op wire (the ingress iterates repeated payloads)."""
    from openlogreplicator_spark.functions.json_output import (
        MSG_FULL,
        WireFormat,
    )
    from openlogreplicator_spark.functions.protobuf_output import (
        build_protobuf_messages,
        decode_message,
    )

    fb = FeedBuilder(start_scn=3000)
    t = fb.begin(attrs={"username": "bob"})
    t.ins("f1", 0, role="user", text="q", ts=TS)
    t.ins("f1", 1, role="assistant", text="a", ts=TS)
    t.upd("f1", 0, text="q2")
    fb.commit(t)
    t = fb.begin()
    t.ins("f2", 0, role="user", text="solo", ts=TS)
    fb.commit(t)

    dml = _committed_dml(spark, fb)
    full_msgs = build_protobuf_messages(dml, full_txn=True).collect()
    # one message per transaction, ops as repeated payloads in seq order
    assert len(full_msgs) == 2
    n_payloads = sorted(
        len(decode_message(bytes(r.message)).get(9, [])) for r in full_msgs
    )
    assert n_payloads == [1, 3]

    # the FULL spool replays to the same state as the per-op spool
    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j")

    spool = os.path.join(tmpdir_path, "spool_full")
    write_protobuf_mirror(
        dml, spool, 0, fmt=WireFormat(message=MSG_FULL))

    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=4)
    apply_epoch(dst, read_protobuf_feed(spark, spool), 0, job_id="chain")
    assert _rows(dst) == _rows(src)
    row = {(r["conv_id"], r["turn_idx"]): r for r in dst.read().collect()}
    assert row[("f1", 0)]["text"] == "q2"   # intra-txn order preserved
