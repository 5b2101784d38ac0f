"""JSON wire-format ingress (sources/json_feed.py): a second engine
instance re-ingests the first instance's write_json_mirror output and
converges to the same lake state — the writer→reader chaining loop."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.sources.json_feed import read_json_feed
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
TS2 = datetime(2024, 3, 1, 12, 0, 5, tzinfo=timezone.utc)


def _rows(table):
    return normalize_rows(
        [r.asDict() for r in table.read().collect()], table.value_names
    )


def test_mirror_roundtrip_state_equality(spark, tmpdir_path):
    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=4)
    mirror = os.path.join(tmpdir_path, "mirror")

    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()  # multi-op transaction
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.ins("c1", 1, role="assistant", text="hi there", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.ins("c2", 0, role="user", text="other", ts=TS2)
    fb.commit(t)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j", json_mirror_dir=mirror)

    fb2 = FeedBuilder(start_scn=5000)
    t = fb2.begin(attrs={"username": "alice"})
    t.upd("c1", 0, text=None)        # set-to-NULL — needs the changed list
    t.upd("c1", 1, tool="calc")      # sparse update of a different column
    t.delete("c2", 0)
    fb2.commit(t)
    apply_epoch(src, fb2.to_spark(spark), 1, job_id="j", json_mirror_dir=mirror)

    # chain: re-ingest the mirror into a fresh engine instance
    feed2 = read_json_feed(spark, mirror)
    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=8)
    apply_epoch(dst, feed2, 0, job_id="chain")

    assert _rows(dst) == _rows(src)
    # the set-to-NULL survived the wire (after-image null + changed list)
    row = {(r["conv_id"], r["turn_idx"]): r for r in dst.read().collect()}
    assert row[("c1", 0)]["text"] is None
    assert row[("c1", 0)]["role"] == "user"          # unchanged col kept
    assert row[("c1", 1)]["tool"] == "calc"
    assert row[("c1", 1)]["text"] == "hi there"
    assert ("c2", 0) not in row


def test_ddl_on_the_wire_roundtrip(spark, tmpdir_path):
    """Committed DDL rides the mirror as its own message (the reference
    emits DDL statements on the output stream), so a chained instance
    evolves its schema and applies post-DDL column values."""
    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    mirror = os.path.join(tmpdir_path, "mirror")

    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a", ts=TS)
    fb.commit(t)
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb.begin()
    t.upd("c1", 0, meta="m1")
    t.ins("c2", 0, role="user", text="b", ts=TS, meta="m2")
    fb.commit(t)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j", json_mirror_dir=mirror)
    assert "meta" in src.value_names

    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=4)
    apply_epoch(dst, read_json_feed(spark, mirror), 0, job_id="chain")
    assert "meta" in dst.value_names
    assert _rows(dst) == _rows(src)
    got = {(r["conv_id"], r["turn_idx"]): r["meta"] for r in dst.read().collect()}
    assert got == {("c1", 0): "m1", ("c2", 0): "m2"}


def test_chained_stream_tails_growing_mirror(spark, tmpdir_path):
    """run_chained_stream: a downstream instance TAILS the upstream
    mirror with Structured Streaming — drains the backlog, then resumes
    from its checkpoint when the mirror grows (only new files read)."""
    from openlogreplicator_spark.streaming.job import run_chained_stream

    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    mirror = os.path.join(tmpdir_path, "mirror")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", ts=TS)
    fb.commit(t)
    apply_epoch(src, fb.to_spark(spark), 0, job_id="j", json_mirror_dir=mirror)

    dst_path = os.path.join(tmpdir_path, "dst")
    dst = run_chained_stream(spark, mirror, dst_path, ckpt, n_buckets=2)
    assert _rows(dst) == _rows(src)
    v_after_drain = dst.manifest["version"]

    # upstream keeps going; the tail resumes from the SAME checkpoint
    fb2 = FeedBuilder(start_scn=2000)
    t = fb2.begin()
    t.upd("c1", 0, text="v2")
    t.ins("c2", 0, role="user", text="new", ts=TS2)
    fb2.commit(t)
    apply_epoch(src, fb2.to_spark(spark), 1, job_id="j", json_mirror_dir=mirror)

    dst = run_chained_stream(spark, mirror, dst_path, ckpt, create=False, n_buckets=2)
    assert _rows(dst) == _rows(src)
    assert dst.manifest["version"] > v_after_drain
    # a further resume with NOTHING new upstream is a no-op (checkpoint
    # remembers the processed files — no re-drain, no version bump)
    v_caught_up = dst.manifest["version"]
    dst = run_chained_stream(spark, mirror, dst_path, ckpt, create=False, n_buckets=2)
    assert dst.manifest["version"] == v_caught_up
    assert _rows(dst) == _rows(src)


def test_multi_table_chained_tail(spark, tmpdir_path):
    """A downstream CATALOG tails the upstream catalog's mirror: table
    routing rides the payload schema, and a mid-stream CREATE TABLE rides
    the wire as DDL — the replica registry evolves and converges."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.job import run_chained_stream_multi
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    src = Catalog.create(spark, os.path.join(tmpdir_path, "src"))
    for n in ("transcripts", "summaries"):
        src.create_table(n, n_buckets=2)
    mirror = os.path.join(tmpdir_path, "mirror")

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
    apply_epoch_multi(src, fb.to_spark(spark), 0, json_mirror_dir=mirror)
    assert "audit" in src.table_names

    dst = run_chained_stream_multi(
        spark, mirror, os.path.join(tmpdir_path, "dst"),
        os.path.join(tmpdir_path, "ckpt"),
        tables=["transcripts", "summaries"], n_buckets=4,
    )
    assert set(dst.table_names) == {"transcripts", "summaries", "audit"}
    for n in dst.table_names:
        a = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in src.table(n).read().collect()
        )
        b = sorted(
            (r["conv_id"], r["turn_idx"], r["text"])
            for r in dst.table(n).read().collect()
        )
        assert a == b and a, f"table {n} diverged: {a} vs {b}"


def test_fuzz_mirror_roundtrip(spark, tmpdir_path):
    """Random op soup (multi-op txns, partial rollbacks, chunked LOBs,
    rollbacks, open txns) through replicate→mirror→re-ingest→replicate:
    the chained instance converges to the source state."""
    from test_fuzz_differential import _random_feed

    for seed in (7, 104):
        base = os.path.join(tmpdir_path, f"s{seed}")
        src = create_target(spark, base + "/src", n_buckets=4)
        mirror = base + "/mirror"
        apply_epoch(src, _random_feed(seed).to_spark(spark), 0, job_id="j",
                    json_mirror_dir=mirror)
        dst = create_target(spark, base + "/dst", n_buckets=2)
        apply_epoch(dst, read_json_feed(spark, mirror), 0, job_id="chain")
        assert _rows(dst) == _rows(src), f"seed {seed} diverged"


def test_ingress_drops_chkpt_and_orders_multi_epoch(spark, tmpdir_path):
    src = create_target(spark, os.path.join(tmpdir_path, "src"), n_buckets=2)
    mirror = os.path.join(tmpdir_path, "mirror")
    for e, text in enumerate(["v1", "v2", "v3"]):
        fb = FeedBuilder(start_scn=1000 * (e + 1))
        t = fb.begin()
        (t.ins if e == 0 else t.upd)(
            "c1", 0, **(dict(role="user", text=text, ts=TS) if e == 0 else dict(text=text))
        )
        fb.commit(t)
        apply_epoch(src, fb.to_spark(spark), e, job_id="j", json_mirror_dir=mirror)

    feed2 = read_json_feed(spark, mirror)
    # chkpt heartbeats are wire messages but not change events
    assert feed2.filter(~feed2.op.isin("begin", "commit", "ins", "upd", "del")).count() == 0
    # mirror epoch number came through as the redo seq
    assert feed2.select("seq").distinct().count() == 3
    dst = create_target(spark, os.path.join(tmpdir_path, "dst"), n_buckets=2)
    apply_epoch(dst, feed2, 0, job_id="chain")
    rows = dst.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "v3"
