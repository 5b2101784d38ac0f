"""Multi-table replication: N tracked tables under one epoch fence.

Reference scenarios: tests/sql/inputs/multi-table.sql and
rac-concurrent-tables.rac.sql (concurrent DML on several tracked tables in
interleaved transactions), plus CREATE/DROP TABLE DDL (Builder.cpp
DDL types 1/12).  Every test replays through the engine AND the sequential
multi-table oracle (oracle.replay_multi) and compares full per-table state.
"""

import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay_multi
from openlogreplicator_spark.streaming.job import replay_batch_multi, run_stream_multi

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def assert_catalog_matches(catalog, expected, names=None):
    for name in names or sorted(expected.tables):
        table = catalog.table(name)
        got = normalize_rows(
            [r.asDict() for r in table.read().collect()], table.value_names
        )
        want = normalize_rows(
            expected.as_records(name), expected.tables[name]["columns"]
        )
        assert expected.tables[name]["columns"] == table.value_names, (
            f"{name}: schema {table.value_names} != {expected.tables[name]['columns']}"
        )
        assert got == want, f"{name}: state mismatch\n got={got}\nwant={want}"


def _two_table_feed():
    """Interleaved txns over two tracked tables sharing the SAME key space
    (c1/c2 × 0/1) — the collision the per-table LakeTable design removes."""
    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="t-a", ts=TS)
    t1.dml_other_table("summaries", "c1", 0, op="ins", role="sys", text="s-a")
    t2 = fb.begin()
    t2.dml_other_table("summaries", "c2", 0, op="ins", role="sys", text="s-b")
    t1.upd("c1", 0, text="t-a2")
    fb.commit(t1)
    t2.ins("c2", 0, role="user", text="t-b", ts=TS)
    t2.dml_other_table("summaries", "c2", 0, op="upd", text="s-b2")
    fb.commit(t2)
    t3 = fb.begin()
    t3.dml_other_table("summaries", "c1", 0, op="del")
    t3.delete("c2", 0)
    fb.commit(t3)
    # rolled-back txn touching both tables → nothing applies
    t4 = fb.begin()
    t4.ins("c9", 0, role="x", text="gone")
    t4.dml_other_table("summaries", "c9", 0, op="ins", role="x", text="gone")
    fb.rollback(t4)
    return fb


def test_two_tracked_tables_batch(spark, tmpdir_path):
    fb = _two_table_feed()
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=4,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert_catalog_matches(cat, expected)
    # keys did NOT collide: transcripts keeps c1 turn 0, summaries keeps c2
    tr = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.table("transcripts").read().collect()}
    sm = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.table("summaries").read().collect()}
    assert tr == {("c1", 0): "t-a2"}
    assert sm == {("c2", 0): "s-b2"}


def test_prollback_and_chunks_route_per_table(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="keep-A", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="pop-me")
    # savepoint pops the LAST dml on (summaries, c1, 0) — not the transcript
    t.dml_other_table("summaries", "c1", 0, op="prollback")
    t.chunk("c1", 0, 0, "AB")
    t.chunk("c1", 0, 1, "CD")
    t.upd("c1", 0, text="placeholder")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=2,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert_catalog_matches(cat, expected)
    tr = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.table("transcripts").read().collect()}
    assert tr[("c1", 0)] == "ABCD"  # chunks landed on the transcript upd
    assert cat.table("summaries").read().count() == 0  # popped by prollback


def test_create_table_mid_stream(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="before", ts=TS)
    # DML for a table that does not exist yet → skipped (no dictionary entry)
    t.dml_other_table("audit", "c1", 0, op="ins", role="x", text="too-early")
    fb.commit(t)
    fb.ddl_txn("CREATE TABLE audit (role string, text string)",
               ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.dml_other_table("audit", "c2", 0, op="ins", role="a", text="in-audit")
    t.upd("c1", 0, text="after")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts"], n_buckets=2,
    )
    expected = replay_multi(fb.rows)
    assert set(cat.table_names) == {"transcripts", "audit"}
    assert cat.table("audit").value_names == ["role", "text"]
    assert_catalog_matches(cat, expected)
    audit = {(r["conv_id"], r["turn_idx"]): r["text"] for r in cat.table("audit").read().collect()}
    assert audit == {("c2", 0): "in-audit"}  # pre-create DML skipped


def test_drop_table_mid_stream(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="stays", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="doomed")
    fb.commit(t)
    fb.ddl_txn("DROP TABLE summaries", ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.dml_other_table("summaries", "c2", 0, op="ins", role="s", text="after-drop")
    t.upd("c1", 0, text="stays2")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=2,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert cat.table_names == ["transcripts"]
    assert "summaries" not in expected.tables
    assert_catalog_matches(cat, expected, names=["transcripts"])


def test_alter_routes_to_named_table(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="a", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="b")
    fb.commit(t)
    fb.ddl_txn("ALTER TABLE summaries ADD COLUMN meta string",
               ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.dml_other_table("summaries", "c1", 0, op="upd", meta="m1")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=2,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert cat.table("summaries").value_names == ["role", "text", "tool", "ts", "meta"]
    assert cat.table("transcripts").value_names == ["role", "text", "tool", "ts"]
    assert_catalog_matches(cat, expected)


def test_per_table_lineage(spark, tmpdir_path):
    fb = _two_table_feed()
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=4,
    )
    lin = cat.lineage().collect()
    per_table = {r["table_name"]: r for r in lin if r["table_name"] is not None}
    assert set(per_table) == {"transcripts", "summaries"}
    # net collapse counts: transcripts c1 ins+upd→1 reset-put, c2 ins then
    # del in later txn → same-epoch collapse nets (ins,del)→none... per-key
    # accounting is collapsed NET ops, assert totals are positive and the
    # feed-position row carries skips (rolled-back txn had 2 DML)
    assert per_table["transcripts"]["n_ins"] + per_table["transcripts"]["n_upd"] >= 1
    feed_rows = [r for r in lin if r["table_name"] is None]
    assert sum(r["n_skipped"] for r in feed_rows) == 2
    assert all(r["last_applied_lsn"] is not None for r in feed_rows)


def test_multi_table_streaming_crash_resume(spark, tmpdir_path):
    """Kill mid-stream, resume from checkpoint: exactly-once across BOTH
    tables (per-table ledgers + catalog epoch fence)."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    fb = _two_table_feed()
    fb.new_seq()
    t = fb.begin()
    t.ins("c5", 1, role="u", text="late", ts=TS)
    t.dml_other_table("summaries", "c5", 1, op="ins", role="s", text="late-s")
    fb.commit(t)

    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cat_path = os.path.join(tmpdir_path, "cat")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    with pytest.raises(StreamingQueryException):
        run_stream_multi(spark, feed_dir, cat_path, ckpt,
                         tables=["transcripts", "summaries"], n_buckets=4,
                         max_files_per_trigger=1, fail_at_epoch=1)
    cat = run_stream_multi(spark, feed_dir, cat_path, ckpt,
                           tables=["transcripts", "summaries"], n_buckets=4,
                           max_files_per_trigger=1)
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert_catalog_matches(cat, expected)


def test_multi_epoch_replay_is_idempotent(spark, tmpdir_path):
    """Re-applying a committed epoch (simulated foreachBatch replay) is a
    no-op for every table and the catalog."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = _two_table_feed()
    cat_path = os.path.join(tmpdir_path, "cat")
    cat = replay_batch_multi(spark, fb.to_spark(spark), cat_path,
                             tables=["transcripts", "summaries"], n_buckets=4)
    v_before = cat.manifest["version"]
    out = apply_epoch_multi(Catalog(spark, cat_path), fb.to_spark(spark), 0,
                            job_id="batch")
    assert out == {"applied": False, "reason": "epoch already committed"}
    assert Catalog(spark, cat_path).manifest["version"] == v_before


def test_catalog_vacuum_removes_dropped_table_and_old_state(spark, tmpdir_path):
    """Catalog.vacuum: per-table GC plus removal of DROP TABLE orphan dirs
    and superseded catalog pending/lineage snapshots."""
    import os as _os

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="a", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="b")
    fb.commit(t)
    fb.ddl_txn("DROP TABLE summaries", ["role", "text", "tool", "ts"])
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=2,
    )
    # a second epoch supersedes the first pending snapshot
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb2 = FeedBuilder(start_scn=9000)
    fb2._xid_counter = 50
    t = fb2.begin()
    t.upd("c1", 0, text="a2")
    fb2.commit(t)
    apply_epoch_multi(cat, fb2.to_spark(spark), 1, job_id="batch")

    assert _os.path.isdir(_os.path.join(cat.path, "tables", "summaries"))
    out = cat.vacuum()
    assert "tables/summaries" in out["removed"]["_catalog"]
    assert not _os.path.isdir(_os.path.join(cat.path, "tables", "summaries"))
    # live state survives and still reads
    rows = {(r["conv_id"], r["turn_idx"]): r["text"]
            for r in cat.table("transcripts").read().collect()}
    assert rows == {("c1", 0): "a2"}
    assert cat.lineage().count() >= 2


def test_multi_table_json_mirror(spark, tmpdir_path):
    """The wire mirror carries BOTH tables' committed ops with their own
    table names (reference: one output stream for all tracked tables)."""
    import json as _json

    from openlogreplicator_spark.functions.json_output import read_json_mirror
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = _two_table_feed()
    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    for n in ("transcripts", "summaries"):
        cat.create_table(n, n_buckets=2)
    mirror = os.path.join(tmpdir_path, "wire")
    apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j", json_mirror_dir=mirror)
    msgs = [_json.loads(m) for m in read_json_mirror(mirror)]
    tables = {p["schema"]["table"] for m in msgs for p in m.get("payload", [])
              if p.get("op") in ("c", "u", "d")}
    assert tables == {"transcripts", "summaries"}
    # commit order holds across the combined stream
    scns = [m["scn"] for m in msgs if m.get("payload", [{}])[0].get("op") != "chkpt"]
    assert scns == sorted(scns)


def test_multi_shard_watermark_gates_commit(spark, tmpdir_path):
    """RAC watermark in multi-table mode: a commit past the slowest shard's
    frontier rides the catalog pending snapshot; it applies once that shard
    catches up in a later epoch."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=0)
    t.ins("c1", 0, role="u", text="early", ts=TS)
    fb.commit(t)
    t2 = fb.begin(shard=1)
    t2.ins("c2", 0, role="u", text="s1", ts=TS)
    fb.commit(t2)
    t3 = fb.begin(shard=0)  # commits past shard 1's frontier → gated
    t3.dml_other_table("summaries", "c3", 0, op="ins", role="s", text="late")
    fb.commit(t3)

    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    for n in ("transcripts", "summaries"):
        cat.create_table(n, n_buckets=2)
    apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])
    assert cat.table("summaries").read().count() == 0  # gated
    tr = {r["conv_id"] for r in cat.table("transcripts").read().collect()}
    assert tr == {"c1", "c2"}  # pre-watermark commits applied

    # shard 1 catches up → the gated txn emerges from pending and applies
    fb2 = FeedBuilder(n_shards=2, start_scn=5000)
    fb2._xid_counter = 50
    t = fb2.begin(shard=1)
    t.ins("c4", 0, role="u", text="s1-later", ts=TS)
    fb2.commit(t)
    apply_epoch_multi(cat, fb2.to_spark(spark), 1, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])
    sm = {(r["conv_id"], r["text"]) for r in cat.table("summaries").read().collect()}
    assert sm == {("c3", "late")}


def test_multi_schemaless_mirrors_unregistered(spark, tmpdir_path):
    """schemaless mode in multi-table replication: committed DML of tables
    with no registry entry is emitted raw on the wire mirror instead of
    being dropped-and-counted (REDO_FLAGS::SCHEMALESS analog)."""
    import json as _json

    from openlogreplicator_spark.functions.json_output import read_json_mirror
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="tracked", ts=TS)
    t.dml_other_table("sidecar", "c9", 0, op="ins", role="x", text="raw")
    fb.commit(t)
    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    cat.create_table("transcripts", n_buckets=2)
    mirror = os.path.join(tmpdir_path, "wire")
    apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j",
                      json_mirror_dir=mirror, schemaless=True)
    msgs = [_json.loads(m) for m in read_json_mirror(mirror)]
    tables = {p["schema"]["table"] for m in msgs for p in m.get("payload", [])
              if p.get("op") in ("c", "u", "d")}
    assert tables == {"transcripts", "sidecar"}
    # the unregistered table never lands in the lake and is not skip-counted
    assert cat.table_names == ["transcripts"]
    feed_rows = [r for r in cat.lineage().collect() if r["table_name"] is None]
    assert sum(r["n_skipped"] for r in feed_rows) == 0


def test_crash_after_mid_epoch_create_replays_identically(spark, tmpdir_path):
    """Exactly-once under the ADVICE r3 crash window: a mid-epoch CREATE
    TABLE commits to the registry BEFORE the epoch's :done fence.  If the
    stream crashes in that window, the replayed epoch must still skip DML
    that committed before the CREATE (it has no dictionary entry in segment
    0) — the epoch-start registry snapshot, not the mutated live registry,
    seeds segment membership on replay."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="keep", ts=TS)
    # commits BEFORE the CREATE → must be skipped on clean run AND on replay
    t.dml_other_table("audit", "c1", 0, op="ins", role="x", text="too-early")
    fb.commit(t)
    fb.ddl_txn("CREATE TABLE audit (role string, text string)",
               ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.dml_other_table("audit", "c2", 0, op="ins", role="a", text="in-audit")
    fb.commit(t)

    cat_path = os.path.join(tmpdir_path, "cat")
    cat = Catalog.create(spark, cat_path)
    cat.create_table("transcripts", n_buckets=2)

    # crash simulation: every merge + the CREATE DDL apply, then die before
    # the :done catalog commit
    real_commit = Catalog.commit_epoch
    try:
        def boom(self, *a, **k):
            raise RuntimeError("injected crash before :done")

        Catalog.commit_epoch = boom
        import pytest

        with pytest.raises(RuntimeError, match="injected crash"):
            apply_epoch_multi(cat, fb.to_spark(spark), 7, job_id="j")
    finally:
        Catalog.commit_epoch = real_commit

    # the crash window is real: the registry already has the new table
    cat = Catalog(spark, cat_path)
    assert "audit" in cat.table_names
    assert cat.epoch_start_registry("j", "7") == {"transcripts": "tables/transcripts"}

    # replay the epoch (what foreachBatch does on restart)
    apply_epoch_multi(cat, fb.to_spark(spark), 7, job_id="j")

    expected = replay_multi(fb.rows)
    assert_catalog_matches(cat, expected)
    audit = {(r["conv_id"], r["turn_idx"]): r["text"]
             for r in cat.table("audit").read().collect()}
    assert audit == {("c2", 0): "in-audit"}  # pre-create DML still skipped
    # snapshot is pruned at the fence
    assert cat.epoch_start_registry("j", "7") is None


def test_crash_after_mid_epoch_drop_replays_identically(spark, tmpdir_path):
    """DROP TABLE twin of the crash window: segment-0 DML of the dropped
    table was merged on the clean run (table live then); the replay must
    route to the orphan directory (epoch-start snapshot path) where the
    ledger mark makes the re-merge a no-op — and the final state must show
    the table dropped, exactly like the clean run."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="stays", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="doomed")
    fb.commit(t)
    fb.ddl_txn("DROP TABLE summaries", ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.upd("c1", 0, text="stays2")
    fb.commit(t)

    cat_path = os.path.join(tmpdir_path, "cat")
    cat = Catalog.create(spark, cat_path)
    cat.create_table("transcripts", n_buckets=2)
    cat.create_table("summaries", n_buckets=2)

    real_commit = Catalog.commit_epoch
    try:
        def boom(self, *a, **k):
            raise RuntimeError("injected crash before :done")

        Catalog.commit_epoch = boom
        import pytest

        with pytest.raises(RuntimeError, match="injected crash"):
            apply_epoch_multi(cat, fb.to_spark(spark), 3, job_id="j")
    finally:
        Catalog.commit_epoch = real_commit

    cat = Catalog(spark, cat_path)
    assert cat.table_names == ["transcripts"]  # drop already committed
    apply_epoch_multi(cat, fb.to_spark(spark), 3, job_id="j")

    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert cat.table_names == ["transcripts"]
    assert "summaries" not in expected.tables
    assert_catalog_matches(cat, expected, names=["transcripts"])


def test_unparseable_create_columns_fall_back_to_default(spark, tmpdir_path):
    """A CREATE TABLE column list outside the supported grammar
    ('decimal(10,2)', 'not null' modifiers) must not kill the stream: the
    table is created with the default transcript columns (same policy as
    unknown DDL verbs — tolerated, counted, never fatal)."""
    from openlogreplicator_spark.streaming.multi import parse_ddl

    verb, name, arg = parse_ddl(
        "CREATE TABLE prices (amount decimal(10,2), note text not null)", None
    )
    assert (verb, name, arg) == ("create", "prices", None)

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="a", ts=TS)
    fb.commit(t)
    fb.ddl_txn("CREATE TABLE prices (amount decimal(10,2))",
               ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.dml_other_table("prices", "c2", 0, op="ins", role="p", text="1.99")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts"], n_buckets=2,
    )
    assert set(cat.table_names) == {"transcripts", "prices"}
    assert cat.table("prices").value_names == ["role", "text", "tool", "ts"]
    rows = {(r["conv_id"], r["text"]) for r in cat.table("prices").read().collect()}
    assert rows == {("c2", "1.99")}


def test_adaptive_auto_register_mode(spark, tmpdir_path):
    """Adaptive-schema mode (reference REDO_FLAGS::SCHEMALESS +
    Metadata::loadAdaptiveSchema, Metadata.cpp:676-706): committed DML of
    an UNREGISTERED table registers the table with default columns and
    applies, instead of being skip-counted — including DML that commits
    before the table's own CREATE TABLE (the adaptive semantic).  Replay
    of the committed epoch stays a no-op."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="tracked", ts=TS)
    t.dml_other_table("events_log", "c1", 0, op="ins", role="sys", text="auto!")
    fb.commit(t)
    t = fb.begin()
    t.dml_other_table("events_log", "c1", 0, op="upd", text="auto2")
    t.dml_other_table("audit", "c9", 0, op="ins", role="a", text="pre-create")
    fb.commit(t)
    fb.ddl_txn("CREATE TABLE audit (role string, text string)",
               ["role", "text", "tool", "ts"])

    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts"], n_buckets=2, auto_register=True,
    )
    expected = replay_multi(fb.rows, auto_register=True)
    assert set(cat.table_names) == {"transcripts", "events_log", "audit"}
    assert_catalog_matches(cat, expected)
    el = {(r["conv_id"], r["turn_idx"]): r["text"]
          for r in cat.table("events_log").read().collect()}
    assert el == {("c1", 0): "auto2"}
    # adaptive: the pre-CREATE DML applied (auto-registration at sighting)
    au = {(r["conv_id"], r["turn_idx"]): r["text"]
          for r in cat.table("audit").read().collect()}
    assert au == {("c9", 0): "pre-create"}
    # nothing skip-counted
    feed_rows = [r for r in cat.lineage().collect() if r["table_name"] is None]
    assert sum(r["n_skipped"] for r in feed_rows) == 0

    # committed-epoch replay is a no-op
    out = apply_epoch_multi(
        Catalog(spark, os.path.join(tmpdir_path, "cat")),
        fb.to_spark(spark), 0, job_id="batch", auto_register=True,
    )
    assert out == {"applied": False, "reason": "epoch already committed"}


def test_catalog_read_as_of(spark, tmpdir_path):
    """Consistent cross-table time travel: read_as_of(E) returns every
    table REGISTERED at epoch E's fence at its state as of E — a table
    created in a later epoch is absent, one dropped later still resolves,
    an untouched table keeps its older state, and a maintenance cluster()
    between epochs does not perturb the epoch addressing."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    cat.create_table("transcripts", n_buckets=2)
    cat.create_table("summaries", n_buckets=2)

    fb0 = FeedBuilder(start_scn=1000)
    t = fb0.begin()
    t.ins("c1", 0, role="u", text="e0", ts=TS)
    t.dml_other_table("summaries", "c1", 0, op="ins", role="s", text="s0")
    fb0.commit(t)
    apply_epoch_multi(cat, fb0.to_spark(spark), 0)

    fb1 = FeedBuilder(start_scn=2000)
    fb1.ddl_txn(
        "CREATE TABLE audit (role string, text string, tool string, ts timestamp)",
        ["role", "text", "tool", "ts"],
    )
    t = fb1.begin()
    t.upd("c1", 0, text="e1")
    t.dml_other_table("audit", "a1", 0, op="ins", role="a", text="audit1")
    fb1.commit(t)
    apply_epoch_multi(cat.refresh(), fb1.to_spark(spark), 1)

    cat.refresh().cluster()  # off-epoch maintenance must not shift epochs

    fb2 = FeedBuilder(start_scn=3000)
    fb2.ddl_txn("DROP TABLE audit", ["role", "text", "tool", "ts"])
    t = fb2.begin()
    t.upd("c1", 0, text="e2")
    t.dml_other_table("summaries", "c1", 0, op="del")
    fb2.commit(t)
    apply_epoch_multi(cat.refresh(), fb2.to_spark(spark), 2)
    cat.refresh()

    as0 = cat.read_as_of(0)
    assert set(as0) == {"transcripts", "summaries"}  # audit not yet created
    assert [(r["conv_id"], r["text"]) for r in as0["transcripts"].collect()] == [
        ("c1", "e0")
    ]
    assert [r["text"] for r in as0["summaries"].collect()] == ["s0"]

    as1 = cat.read_as_of(1)
    assert set(as1) == {"transcripts", "summaries", "audit"}
    assert [r["text"] for r in as1["transcripts"].collect()] == ["e1"]
    assert [r["text"] for r in as1["audit"].collect()] == ["audit1"]
    assert [r["text"] for r in as1["summaries"].collect()] == ["s0"]

    as2 = cat.read_as_of(2)
    assert set(as2) == {"transcripts", "summaries"}  # audit dropped
    assert [r["text"] for r in as2["transcripts"].collect()] == ["e2"]
    assert as2["summaries"].count() == 0


def test_rac_concurrent_tables_per_node(spark, tmpdir_path):
    """rac-concurrent-tables.rac.sql analog: each table written exclusively
    from a DIFFERENT RAC node (shard) in the same watermark window — node 1
    owns table 1's insert/update/delete stream, node 2 owns table 2's.  The
    shard watermark must interleave both nodes' commits by scn without one
    table's stream gating the other's already-safe commits."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=0)                       # node 1 → transcripts
    t.ins("r1", 0, role="u", text="T1-Alice", ts=TS)
    t.ins("r2", 0, role="u", text="T1-Bob", ts=TS)
    fb.commit(t)
    t = fb.begin(shard=1)                       # node 2 → summaries
    t.dml_other_table("summaries", "r1", 0, op="ins", role="u", text="T2-Charlie")
    t.dml_other_table("summaries", "r2", 0, op="ins", role="u", text="T2-Diana")
    fb.commit(t)
    t = fb.begin(shard=0)
    t.upd("r1", 0, text="T1-Alice-150")
    t.delete("r2", 0)
    fb.commit(t)
    t = fb.begin(shard=1)
    t.dml_other_table("summaries", "r1", 0, op="upd", text="T2-Charlie-350")
    t.dml_other_table("summaries", "r2", 0, op="del")
    fb.commit(t)

    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    for n in ("transcripts", "summaries"):
        cat.create_table(n, n_buckets=2)
    apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])
    # the window's globally-last commit (node 2's upd/del) sits past node
    # 1's frontier → gated in epoch 0; a node-1 heartbeat advances the
    # watermark and it applies (the reference's RAC min-SCN fence)
    hb = FeedBuilder(n_shards=2, start_scn=50_000)
    hb._xid_counter = 77
    t = hb.begin(shard=0)
    t.ins("hb1", 0, role="hb", text="x", ts=TS)
    hb.commit(t)
    apply_epoch_multi(cat, hb.to_spark(spark), 1, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])

    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    for name in ("transcripts", "summaries"):
        table = cat.table(name)
        got = normalize_rows(
            [r.asDict() for r in table.read().collect()
             if not r["conv_id"].startswith("hb")],
            table.value_names)
        want = normalize_rows(expected.as_records(name),
                              expected.tables[name]["columns"])
        assert got == want, f"{name}: state mismatch\n got={got}\nwant={want}"
    sm = {r["conv_id"]: r["text"] for r in cat.table("summaries").read().collect()}
    assert sm == {"r1": "T2-Charlie-350"}
