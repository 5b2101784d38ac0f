"""Merge-on-read mode (Iceberg v2 delete-file analog): merges append delta
files (O(changes) write cost), readers fold deltas onto the base, long
delta chains compact back to a plain base in the same commit."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows, run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _epoch_feed(start_scn, ops):
    fb = FeedBuilder(start_scn=start_scn)
    t = fb.begin()
    for op, conv, turn, kw in ops:
        getattr(t, op)(conv, turn, **kw)
    fb.commit(t)
    return fb


def test_mor_matches_cow_multi_epoch(spark, tmpdir_path):
    """Same multi-epoch feed through cow and mor tables → identical state;
    mor leaves the base untouched (delta-only writes) after bootstrap."""
    epochs = [
        _epoch_feed(1000, [("ins", "c1", 0, dict(role="user", text="a", ts=TS)),
                           ("ins", "c2", 0, dict(role="user", text="b", ts=TS))]),
        _epoch_feed(2000, [("upd", "c1", 0, dict(text="a2")),
                           ("ins", "c3", 0, dict(role="user", text="c", ts=TS))]),
        _epoch_feed(3000, [("delete", "c2", 0, dict()),
                           ("upd", "c3", 0, dict(tool="calc"))]),
        _epoch_feed(4000, [("ins", "c2", 0, dict(role="assistant", text="b2", ts=TS)),
                           ("upd", "c1", 0, dict(text=None))]),
    ]
    tables = {}
    for mode in ("cow", "mor"):
        path = os.path.join(tmpdir_path, f"tbl_{mode}")
        table = create_target(spark, path, n_buckets=4, mode=mode)
        for i, fb in enumerate(epochs):
            apply_epoch(table, fb.to_spark(spark), i, job_id="j")
        tables[mode] = table

    cols = tables["cow"].value_names
    rows_cow = normalize_rows([r.asDict() for r in tables["cow"].read().collect()], cols)
    rows_mor = normalize_rows([r.asDict() for r in tables["mor"].read().collect()], cols)
    assert rows_cow == rows_mor
    # mor: bootstrap wrote base, later epochs wrote only deltas
    m = tables["mor"].manifest
    assert any(m["deltas"].values()), "expected delta files after update epochs"
    base_versions = {d.split("/")[1] for ds in m["buckets"].values() for d in ds}
    assert base_versions == {"v000001"}, f"base rewritten: {base_versions}"


def test_mor_oracle_equality_and_delete_then_insert(spark, tmpdir_path):
    """MoR final state equals the sequential oracle across delete→reinsert
    and upsert-on-missing-key sequences."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", tool="t0", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.delete("c1", 0)
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 0, text="resurrected")      # upsert after delete
    t.upd("c9", 9, text="never existed")    # upsert on missing key
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path, mode="mor",
                               via="stream", max_files_per_trigger=1)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "resurrected"
    assert rows[("c1", 0)]["tool"] is None  # delete wiped the old row
    assert rows[("c9", 9)]["text"] == "never existed"


def test_mor_compaction(spark, tmpdir_path):
    """Crossing compact_threshold folds the delta chain into a new base and
    clears the deltas; state is preserved."""
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2, mode="cow")
    # recreate with mor + tiny threshold
    import shutil

    shutil.rmtree(path)
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.streaming.job import DEFAULT_VALUE_COLS, KEY_COLS

    table = LakeTable.create(spark, path, KEY_COLS, DEFAULT_VALUE_COLS,
                             n_buckets=2, mode="mor", compact_threshold=3)
    all_events = []
    for i in range(5):
        fb = _epoch_feed(1000 * (i + 1),
                         [("ins", "c1", i, dict(role="user", text=f"t{i}", ts=TS)),
                          ("upd", "c1", 0, dict(text=f"v{i}"))])
        all_events.extend(fb.rows)
        apply_epoch(table, fb.to_spark(spark), i, job_id="j")
    table.refresh()
    # threshold 3 → chains never exceed 3 after a commit
    assert all(len(ds) < 3 for ds in table.manifest["deltas"].values() or [[]])
    expected = replay(all_events)
    got = normalize_rows([r.asDict() for r in table.read().collect()], table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want


def test_mor_replay_idempotent(spark, tmpdir_path):
    """Replaying a committed epoch on a mor table appends no second delta."""
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2, mode="mor")
    fb0 = _epoch_feed(1000, [("ins", "c1", 0, dict(role="user", text="x", ts=TS))])
    fb1 = _epoch_feed(2000, [("upd", "c1", 0, dict(text="y"))])
    apply_epoch(table, fb0.to_spark(spark), 0, job_id="j")
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")
    table.refresh()
    deltas_before = dict(table.manifest["deltas"])
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")  # replay
    table.refresh()
    assert table.manifest["deltas"] == deltas_before
    rows = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert rows == {"c1": "y"}


def test_mor_ddl_add_column(spark, tmpdir_path):
    """Delta files written before an ADD COLUMN are read with the evolved
    vals struct (missing nested field → NULL), matching the oracle."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="pre", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 0, text="pre2")  # delta with v0 struct
    fb.commit(t)
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb.begin()
    t.upd("c1", 0, meta="m1")    # delta with v1 struct
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path, mode="mor",
                               via="stream", max_files_per_trigger=1)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "pre2"
    assert rows[("c1", 0)]["meta"] == "m1"


def test_vacuum_and_key_pruned_read(spark, tmpdir_path):
    """vacuum removes superseded snapshot dirs (old CoW versions) but never
    live ones; read_for_keys prunes to the key's bucket."""
    import glob
    import os

    fb0 = _epoch_feed(1000, [("ins", f"c{i}", 0, dict(role="user", text=f"t{i}", ts=TS))
                             for i in range(20)])
    fb1 = _epoch_feed(3000, [("upd", f"c{i}", 0, dict(text=f"v{i}")) for i in range(20)])
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=4)
    apply_epoch(table, fb0.to_spark(spark), 0, job_id="j")
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")  # rewrites buckets
    table.refresh()

    before = glob.glob(os.path.join(path, "data/v*/_bucket=*"))
    out = table.vacuum()
    assert out["removed"], "expected superseded epoch-0 bucket dirs removed"
    after = glob.glob(os.path.join(path, "data/v*/_bucket=*"))
    assert len(after) < len(before)
    # table still fully readable post-vacuum
    rows = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert rows == {f"c{i}": f"v{i}" for i in range(20)}

    # pruned point lookup
    got = {r["conv_id"]: r["text"] for r in table.read_for_keys(["c3", "c7"]).collect()}
    assert got == {"c3": "v3", "c7": "v7"}
    assert len(table.buckets_for_keys(["c3"])) == 1


def test_mor_kill_and_resume_exactly_once(spark, tmpdir_path):
    """Crash after the apply of an epoch, resume from the same checkpoint:
    the replayed epoch appends no duplicate delta and the final state is
    exact (ledger idempotence under merge-on-read)."""
    import pytest

    from openlogreplicator_spark.streaming.job import run_stream

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="e0", ts=TS)
    fb.commit(t)
    fb.new_seq()
    t = fb.begin()
    t.upd("c1", 0, text="e1")
    fb.commit(t)
    fb.new_seq()
    t = fb.begin()
    t.ins("c2", 0, role="user", text="e2", ts=TS)
    fb.commit(t)

    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    tbl_path = os.path.join(tmpdir_path, "tbl")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    with pytest.raises(Exception, match="injected crash"):
        run_stream(spark, feed_dir, tbl_path, ckpt, max_files_per_trigger=1,
                   mode="mor", fail_at_epoch=1, fail_after_apply=True)
    table = run_stream(spark, feed_dir, tbl_path, ckpt, max_files_per_trigger=1,
                       mode="mor", create=False)
    rows = {(r["conv_id"], r["turn_idx"]): r["text"] for r in table.read().collect()}
    assert rows == {("c1", 0): "e1", ("c2", 0): "e2"}
    # epoch 1's delta appears exactly once per bucket chain
    for ds in table.manifest["deltas"].values():
        assert len(ds) == len(set(ds))


def test_bootstrap_load_then_cdc(spark, tmpdir_path):
    """Snapshot bootstrap (start-from-SCN mode): load an existing table
    image once, then apply CDC on top; final state matches the oracle
    replay seeded with the same initial rows.  Bootstrap is ledgered —
    re-running it is a no-op."""
    import os

    from helpers import normalize_rows
    from openlogreplicator_spark.oracle import replay

    initial = [
        ("c0", 0, "user", "preexisting-0", None, TS),
        ("c1", 0, "user", "preexisting-1", "calc", TS),
    ]
    init_df = spark.createDataFrame(
        initial, "conv_id string, turn_idx int, role string, text string, "
                 "tool string, ts timestamp")

    fb = FeedBuilder()
    t = fb.begin()
    t.upd("c1", 0, text="updated-after-snapshot")
    t.delete("c0", 0)
    t.ins("c2", 0, role="assistant", text="new", ts=TS)
    fb.commit(t)

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=4, mode="mor")
    assert table.bootstrap_load(init_df) is True
    assert table.bootstrap_load(init_df) is False  # ledgered: no-op
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    table.refresh()

    init_rows = {
        (c, ti): {"role": r, "text": tx, "tool": tl, "ts": ts}
        for c, ti, r, tx, tl, ts in initial
    }
    expected = replay(fb.rows, initial_rows=init_rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()],
                         table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want


def test_time_travel_and_retention(spark, tmpdir_path):
    """Snapshot time travel: read(version=v) reconstructs the table as of
    an earlier manifest, vacuum(retain_last=N) keeps the data files those
    snapshots reference, and vacuum(retain_last=1) expires them (reference
    analog: the checkpoint refScn chain keeps history for late-client
    restarts, Metadata.cpp:586-613)."""
    import os
    from datetime import datetime, timezone

    import pytest
    from openlogreplicator_spark.feedgen import FeedBuilder
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    TS = datetime(2024, 3, 1, tzinfo=timezone.utc)
    table = create_target(spark, os.path.join(tmpdir_path, "tbl"), n_buckets=2)

    fb0 = FeedBuilder()
    t = fb0.begin()
    t.ins("c1", 0, role="u", text="v1", ts=TS)
    fb0.commit(t)
    apply_epoch(table, fb0.to_spark(spark), 0, job_id="j")
    v0 = table.manifest["version"]

    fb1 = FeedBuilder(start_scn=50_000)
    fb1._xid_counter = 100
    t = fb1.begin()
    t.upd("c1", 0, text="v2")
    t.ins("c2", 0, role="u", text="new", ts=TS)
    fb1.commit(t)
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")

    now = {(r["conv_id"], r["text"]) for r in table.read().collect()}
    assert now == {("c1", "v2"), ("c2", "new")}
    then = {(r["conv_id"], r["text"]) for r in table.read(version=v0).collect()}
    assert then == {("c1", "v1")}

    # retention window keeps the old snapshot's files
    removed = table.vacuum(retain_last=100)["removed"]
    then2 = {(r["conv_id"], r["text"]) for r in table.read(version=v0).collect()}
    assert then2 == {("c1", "v1")}

    # expiry: retain only the live snapshot → the old base is garbage
    removed = table.vacuum(retain_last=1)["removed"]
    assert removed, "expected the superseded snapshot's files to be removed"
    assert {(r["conv_id"], r["text"]) for r in table.read().collect()} == now

    with pytest.raises(ValueError, match="no snapshot"):
        table.read(version=10_000)
