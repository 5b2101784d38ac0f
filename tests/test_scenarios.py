"""Scenario corpus — mirrors the reference's fixture matrix
(/root/reference/PLAN.md:366-391, tests/sql/inputs/*.sql) mapped onto the
transcripts payload.  Each test builds a seeded feed, replays it through the
engine (bounded batch mode) AND the sequential oracle, and asserts final
state equality (per-turn text equality, stable turn ordering)."""

from datetime import datetime, timezone

import pytest

from helpers import run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_null_handling(spark, tmpdir_path):
    """null insert, value→null, null→value (null-handling.sql analog)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text=None, tool=None, ts=TS)
    t.ins("c1", 1, role=None, text="has text", tool="calc", ts=None)
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 1, tool=None)          # value → NULL (changed_cols carries it)
    t.upd("c1", 0, text="now set")     # NULL → value
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 1)]["tool"] is None
    assert rows[("c1", 1)]["text"] == "has text"  # untouched col kept
    assert rows[("c1", 0)]["text"] == "now set"


def test_full_rollback(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="kept", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.ins("c2", 0, role="user", text="discarded")
    t.upd("c1", 0, text="discarded too")
    fb.rollback(t)
    table, exp = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "kept"
    assert ("c2", 0) not in rows
    assert exp.n_txn_rolled_back == 1
    lin = table.lineage().collect()
    assert sum(r["n_skipped"] for r in lin) == 2  # the 2 rolled-back DMLs


def test_partial_rollback_savepoint(spark, tmpdir_path):
    """Savepoint pops: last matching op per key (Transaction.cpp:73-148)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v1", ts=TS)
    t.upd("c1", 0, text="v2")
    t.prollback("c1", 0)      # pops the upd → text stays v1
    t.ins("c1", 1, role="assistant", text="other", ts=TS)
    fb.commit(t)

    t = fb.begin()
    t.upd("c1", 1, text="e1")
    t.upd("c1", 1, text="e2")
    t.prollback("c1", 1)      # pops e2
    t.prollback("c1", 1)      # pops e1 → row untouched this txn
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "v1"
    assert rows[("c1", 1)]["text"] == "other"


def test_partial_rollback_then_more_ops(spark, tmpdir_path):
    """Pop is positional: later ops on the same key are unaffected."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a", ts=TS)
    t.upd("c1", 0, text="b")
    t.prollback("c1", 0)      # pops b
    t.upd("c1", 0, text="c")  # applies after the pop
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().collect()[0]["text"] == "c"


def test_prollback_of_insert_then_reinsert(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="first", ts=TS)
    t.prollback("c1", 0)      # pops the insert entirely
    t.ins("c1", 0, role="tool", text="second", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    row = table.read().collect()[0]
    assert (row["role"], row["text"]) == ("tool", "second")


def test_concurrent_updates_last_writer_wins(spark, tmpdir_path):
    """Same key updated across many rapid commits — last writer by
    (commit_scn, seq_in_txn) wins (concurrent-updates.sql analog)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("hot", 0, role="user", text="v0", ts=TS)
    fb.commit(t)
    for i in range(1, 30):
        t = fb.begin()
        t.upd("hot", 0, text=f"v{i}")
        fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().collect()[0]["text"] == "v29"


def test_interleaved_transactions(spark, tmpdir_path):
    """≥3 open txns with interleaved events; application follows commit
    order, not event order (interleaved-transactions.sql analog)."""
    fb = FeedBuilder()
    a, b, c = fb.begin(), fb.begin(), fb.begin()
    a.ins("x", 0, role="user", text="a1", ts=TS)
    b.ins("x", 1, role="user", text="b1", ts=TS)
    c.upd("x", 0, text="c-wins")      # c touches a's key
    a.upd("x", 1, text="a-first")     # a touches b's key
    b.upd("x", 0, text="b-mid")
    # commit order: a, b, c  → x0: a1 → b-mid → c-wins ; x1: a-first? NO:
    # a commits first, then b's ins of x1 overwrites (ins = row boundary)
    fb.commit(a)
    fb.commit(b)
    fb.commit(c)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("x", 0)]["text"] == "c-wins"
    assert rows[("x", 1)]["text"] == "b1"  # b's ins replaced a's earlier upd


def test_multi_table_tracking(spark, tmpdir_path):
    """Only tracked tables applied; untracked DML counted skipped (F1)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="tracked", ts=TS)
    t.dml_other_table("audit_log", "c1", 0, op="ins", role="x", text="untracked")
    t.dml_other_table("metrics", "c9", 5, op="ins", text="untracked2")
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().count() == 1
    lin = table.lineage().collect()
    assert sum(r["n_skipped"] for r in lin) == 2


def test_large_transaction(spark, tmpdir_path):
    """200+ ops in one commit (large-transaction.sql analog)."""
    fb = FeedBuilder()
    t = fb.begin()
    for i in range(120):
        t.ins("big", i, role="user", text=f"turn {i}", ts=TS)
    for i in range(0, 120, 3):
        t.upd("big", i, text=f"edited {i}")
    for i in range(0, 120, 10):
        t.delete("big", i)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().count() == 120 - 12


def test_no_begin_txn_dropped(spark, tmpdir_path):
    """Txn whose begin precedes feed start → dropped whole
    (Parser.cpp:865-872)."""
    fb = FeedBuilder()
    orphan = fb.begin_without_begin_event()
    orphan.ins("ghost", 0, role="user", text="must not appear")
    t = fb.begin()
    t.ins("c1", 0, role="user", text="real", ts=TS)
    fb.commit(t)
    orphan.upd("ghost", 0, text="still nothing")
    fb.commit(orphan)
    table, exp = run_and_compare(spark, fb, tmpdir_path)
    rows = [r["conv_id"] for r in table.read().collect()]
    assert rows == ["c1"]
    assert exp.n_txn_dropped_no_begin == 1
    assert sum(r["n_skipped"] for r in table.lineage().collect()) == 2


def test_special_chars(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    weird = 'quote" back\\slash\ttab\nnewline\r\ncrlf émoji 🦜 中文 \x00null'
    t.ins("c1", 0, role="user", text=weird, tool="a'b", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().collect()[0]["text"] == weird


def test_wide_rows(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="W" * 4000, ts=TS)
    t.upd("c1", 0, text="X" * 4000)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().collect()[0]["text"] == "X" * 4000


def test_chunked_text_reassembly(spark, tmpdir_path):
    """text delivered as ordered chunk events reassembled before apply
    (lob-operations.sql / LobCtx analog)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="assistant", text=None, ts=TS)
    t.chunk("c1", 0, 0, "Lorem ")
    t.chunk("c1", 0, 1, "ipsum ")
    t.chunk("c1", 0, 2, "dolor")
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 1, role="tool")
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "Lorem ipsum dolor"


def test_empty_transactions(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    fb.commit(t)
    t = fb.begin()
    fb.rollback(t)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="only real row", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().count() == 1


def test_multi_shard_interleaved(spark, tmpdir_path):
    """2 shards, independent per-shard LSNs, global commit_scn order
    (rac-interleaved analog, Replicator.cpp:1142-1210)."""
    fb = FeedBuilder(n_shards=2)
    a = fb.begin(shard=0)
    b = fb.begin(shard=1)
    a.ins("s", 0, role="user", text="from shard0", ts=TS)
    b.ins("s", 1, role="user", text="from shard1", ts=TS)
    b.upd("s", 0, text="shard1 wins s0")
    fb.commit(a)   # commit_scn lower
    fb.commit(b)   # commit_scn higher → b's upd applies after a's ins
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("s", 0)]["text"] == "shard1 wins s0"
    lin = {r["shard"]: r for r in table.lineage().collect()}
    assert lin[0]["last_applied_lsn"] == 3  # begin, ins, commit on shard 0
    assert lin[1]["last_applied_lsn"] == 4


def test_shard2_only(spark, tmpdir_path):
    """All DML on the non-primary shard (rac-thread2-only analog)."""
    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=1)
    t.ins("c1", 0, role="user", text="shard1", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.read().count() == 1


def test_skewed_hot_conversation(spark, tmpdir_path):
    """80% of events on one conv_id — correctness under skew; key
    granularity (conv_id, turn_idx) spreads the hot conversation."""
    fb = FeedBuilder()
    t = fb.begin()
    for i in range(10):
        t.ins("hot", i, role="user", text=f"h{i}", ts=TS)
        t.ins(f"cold-{i}", 0, role="user", text=f"c{i}", ts=TS)
    fb.commit(t)
    for r in range(8):
        t = fb.begin()
        for i in range(10):
            t.upd("hot", i, text=f"h{i}-r{r}")
        fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert len(rows) == 20
    assert rows[("hot", 3)]["text"] == "h3-r7"


def test_ddl_add_column_batch(spark, tmpdir_path):
    """Mid-feed DDL adds `meta`; later events use it; earlier rows read
    NULL (ddl-add-column.sql analog; Iceberg-style metadata-only ALTER)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="pre-ddl", ts=TS)
    fb.commit(t)
    fb.ddl_txn("ADD COLUMN meta string", ["role", "text", "tool", "ts", "meta"])
    t = fb.begin()
    t.ins("c1", 1, role="assistant", text="post-ddl", meta='{"model":"x"}', ts=TS)
    t.upd("c1", 0, meta='{"added":"later"}')
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.value_names == ["role", "text", "tool", "ts", "meta"]
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 1)]["meta"] == '{"model":"x"}'
    assert rows[("c1", 0)]["meta"] == '{"added":"later"}'
    assert rows[("c1", 0)]["text"] == "pre-ddl"


def test_meta_column_ignored_before_ddl(spark, tmpdir_path):
    """Events carrying a not-yet-added column must not leak it (dictionary
    gates decode, SystemTransaction analog)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x", ts=TS)
    # upd claims to set meta before the DDL exists → projected away
    t.upd("c1", 0, meta="should be ignored")
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.value_names == ["role", "text", "tool", "ts"]


@pytest.mark.parametrize("n_buckets", [1, 4, 32])
def test_bucket_count_invariance(spark, tmpdir_path, n_buckets):
    """Final state independent of physical bucketing."""
    fb = FeedBuilder()
    t = fb.begin()
    for i in range(20):
        t.ins(f"c{i % 5}", i, role="user", text=f"t{i}", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.delete("c0", 0)
    t.upd("c1", 1, text="edited")
    fb.commit(t)
    run_and_compare(spark, fb, tmpdir_path, n_buckets=n_buckets)


def test_ddl_truncate_mid_stream(spark, tmpdir_path):
    """TRUNCATE as a committed DDL wipes prior rows; later inserts survive
    (reference: Builder.cpp:1815 DDL type 85)."""
    fb = FeedBuilder()
    t = fb.begin()
    for i in range(5):
        t.ins("c1", i, role="user", text=f"pre-{i}", ts=TS)
    fb.commit(t)
    fb.ddl_txn("TRUNCATE TABLE transcripts", ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.ins("c2", 0, role="user", text="post-truncate", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert set(rows) == {("c2", 0)}
    assert rows[("c2", 0)]["text"] == "post-truncate"


def test_ddl_truncate_same_txn_dml_applies_first(spark, tmpdir_path):
    """DML committed at the same commit_scn as the truncate lands in the
    pre-DDL segment — the truncate wipes it (sequential-order semantics)."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="old", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.ins("c1", 1, role="user", text="same-txn", ts=TS)
    fb._emit(t, "ddl", ddl_stmt="TRUNCATE TABLE transcripts")
    fb.commit(t)
    t = fb.begin()
    t.ins("c3", 0, role="user", text="after", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]) for r in table.read().collect()}
    assert rows == {("c3", 0)}


def test_ddl_drop_column(spark, tmpdir_path):
    """DROP COLUMN is metadata-only: the column disappears from reads,
    earlier files keep their bytes, later inserts never set it."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="has tool", tool="calculator", ts=TS)
    fb.commit(t)
    fb.ddl_txn("DROP COLUMN tool", ["role", "text", "ts"])
    t = fb.begin()
    t.ins("c1", 1, role="assistant", text="post-drop", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.value_names == ["role", "text", "ts"]
    assert "tool" not in table.read().columns


def test_truncate_crash_replay_idempotent(spark, tmpdir_path):
    """Re-applying an epoch whose middle segment truncated must not wipe the
    data merged by the later segments (ledger-marked DDL)."""
    import os

    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="pre", ts=TS)
    fb.commit(t)
    fb.ddl_txn("TRUNCATE TABLE transcripts", ["role", "text", "tool", "ts"])
    t = fb.begin()
    t.ins("c2", 0, role="user", text="post", ts=TS)
    fb.commit(t)
    feed = fb.to_spark(spark)
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=4)
    apply_epoch(table, feed, 0, job_id="j")
    want = sorted((r["conv_id"], r["turn_idx"]) for r in table.read().collect())
    assert want == [("c2", 0)]

    # simulate a crash-replay of the same epoch with the :done marker absent
    table.refresh()
    m = dict(table.manifest)
    ledger = {k: dict(v) for k, v in m["ledger"].items()}
    ledger["j"].pop("0:done")
    m["ledger"] = ledger
    m["version"] = m["version"] + 1
    LakeTable._write_manifest_static(path, m)
    table.manifest = m
    apply_epoch(table, feed, 0, job_id="j")
    got = sorted((r["conv_id"], r["turn_idx"]) for r in table.read().collect())
    assert got == [("c2", 0)]  # post-truncate row survived the replay


def test_manifest_orphan_recovery(spark, tmpdir_path):
    """A manifest above the VERSION pointer (crash between manifest write
    and pointer swap) must be overwritten, not wedge the table."""
    import json
    import os

    from openlogreplicator_spark.streaming.job import create_target

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)
    v = table.manifest["version"]
    orphan = os.path.join(path, "manifest", f"v{v + 1:06d}.json")
    with open(orphan, "w") as f:
        f.write('{"version": ')  # truncated garbage — torn write
    table.alter_add_column("meta", "string")  # would crash before the fix
    table.refresh()
    assert table.manifest["version"] == v + 1
    with open(orphan) as f:
        assert json.load(f)["version"] == v + 1  # orphan replaced, parseable


def test_committed_epochs_with_segment_keys(spark, tmpdir_path):
    """committed_epochs must parse '{e}:{seg}' / '{e}:done' ledger keys
    written by apply_epoch (regression: int('0:1') ValueError)."""
    import os

    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x", ts=TS)
    fb.commit(t)
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 7, job_id="j")
    assert table.committed_epochs("j") == {7}
    assert table.committed_epochs("other-job") == set()


def test_multi_file_bucket_write(spark, tmpdir_path):
    """A hot bucket's rewrite spreads over multiple tasks/files (salted
    repartition), and reads stay correct."""
    import glob
    import os

    from helpers import normalize_rows
    from openlogreplicator_spark.oracle import replay
    from openlogreplicator_spark.streaming.job import replay_batch

    fb = FeedBuilder()
    t = fb.begin()
    for i in range(200):
        t.ins(f"c{i}", 0, role="user", text=f"t{i}", ts=TS)
    fb.commit(t)
    path = os.path.join(tmpdir_path, "tbl")
    table = replay_batch(spark, fb.to_spark(spark), path, n_buckets=1)
    files = glob.glob(os.path.join(path, "data", "*", "_bucket=*", "*.parquet"))
    assert len(files) > 1, "expected a multi-file bucket from the salted write"
    expected = replay(fb.rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()], table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want


def test_manifest_conflict_not_silently_overwritten(spark, tmpdir_path):
    """A PARSEABLE manifest above the pointer with different content is a
    concurrent writer mid-commit (or a diverged orphan) — committing over
    it would silently lose that commit's ledger; must raise instead.
    Identical content (deterministic crash-replay) must proceed (round-3
    advice on _write_manifest_static)."""
    import json
    import os

    import pytest

    from openlogreplicator_spark.streaming.job import create_target

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)
    v = table.manifest["version"]
    other = dict(table.manifest)
    other["version"] = v + 1
    other["ledger"] = {"other-writer": {"42": True}}
    orphan = os.path.join(path, "manifest", f"v{v + 1:06d}.json")
    with open(orphan, "w") as f:
        json.dump(other, f, indent=1)
    with pytest.raises(RuntimeError, match="manifest conflict"):
        table.alter_add_column("meta", "string")

    # identical content = deterministic crash-replay → proceeds
    os.unlink(orphan)
    m = dict(table.manifest)
    m["value_cols"] = m["value_cols"] + [{"name": "meta", "type": "string"}]
    m["version"] = v + 1
    with open(orphan, "w") as f:
        json.dump(m, f, indent=1)
    table.alter_add_column("meta", "string")
    table.refresh()
    assert table.manifest["version"] == v + 1
    assert any(c["name"] == "meta" for c in table.manifest["value_cols"])


def test_wide_schema_60_columns(spark, tmpdir_path):
    """many-columns fixture class (reference PLAN.md wide-schema scenarios,
    60+ columns): the table grows one ADD COLUMN at a time to 61 columns,
    then takes full CRUD touching early, middle, and late columns.  The
    engine's collapse derives its column universe from the feed's after
    struct, so every column gets its own conditional-max aggregate —
    map-side combinable, no row explosion."""
    wide = [f"col_{i:02d}" for i in range(57)]
    cols = ["role", "text", "tool", "ts"]
    fb = FeedBuilder(image_columns=["role", "text", "tool", "ts", "meta"] + wide)
    t = fb.begin()
    t.ins("c1", 0, role="user", text="v0", ts=TS)
    fb.commit(t)
    for w in wide:
        cols = cols + [w]
        fb.ddl_txn(f"ADD COLUMN {w} string", cols)
    # full CRUD across the widened schema
    t = fb.begin()
    t.upd("c1", 0, col_00="a", col_28="m", col_56="z")
    t.ins("c2", 0, role="bot", text="wide", col_13="x", col_55="y", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.upd("c2", 0, col_13=None, col_54="w")   # set-to-NULL on a wide column
    t.delete("c1", 0)
    t.ins("c1", 0, role="re", text="reborn", col_56="again", ts=TS)
    fb.commit(t)
    table, expected = run_and_compare(spark, fb, tmpdir_path)
    assert len(table.value_names) == 61
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c2", 0)]["col_13"] is None
    assert rows[("c2", 0)]["col_54"] == "w"
    assert rows[("c1", 0)]["col_56"] == "again"
    assert rows[("c1", 0)]["col_00"] is None  # delete+reinsert wiped it


def test_rac_same_row_cross_shard_same_window(spark, tmpdir_path):
    """rac-same-row fixture class: the SAME (conv, turn) updated from TWO
    shards whose commits land inside one watermark window — the collapse
    order key (commit_scn, seq_in_txn) alone must decide the winner,
    independent of arrival order or shard id.  The txn committing at the
    window's top edge rightly gates until the other shard's frontier
    passes it; a later heartbeat on that shard releases it."""
    import os

    from openlogreplicator_spark.oracle import replay
    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target
    from helpers import normalize_rows

    def contested_feed():
        fb = FeedBuilder(n_shards=2)
        t = fb.begin(shard=0)
        t.ins("c1", 0, role="u", text="base", ts=TS)
        fb.commit(t)
        # shard 1 updates first (lower commit scn), shard 0 second — both
        # commits inside one SCN window, touching the SAME row
        t1 = fb.begin(shard=1)
        t1.upd("c1", 0, text="from-s1")
        t0 = fb.begin(shard=0)
        t0.upd("c1", 0, tool="t-s0")
        fb.commit(t1)
        fb.commit(t0)
        return fb

    def heartbeat(shard, scn):
        hb = FeedBuilder(n_shards=2, start_scn=scn)
        hb._xid_counter = 50 + scn % 97
        t = hb.begin(shard=shard)
        t.ins(f"hb{scn}", 0, role="hb", text="x", ts=TS)
        hb.commit(t)
        return hb

    fb = contested_feed()
    expected = replay(fb.rows)

    # --- both shards in one epoch ---
    table = create_target(spark, os.path.join(tmpdir_path, "tbl"), n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j",
                shard_watermark=True, expected_shards=[0, 1])
    # shard 0's update committed at the window top → gated behind shard 1
    pend_xids = {r["xid"] for r in table.pending(CHANGE_EVENT_SCHEMA).collect()}
    assert len(pend_xids) == 1
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c1", 0)]["text"] == "from-s1" and rows[("c1", 0)]["tool"] is None

    # shard-1 heartbeat advances its frontier → the gated txn releases
    apply_epoch(table, heartbeat(1, 100_000).to_spark(spark), 1, job_id="j",
                shard_watermark=True, expected_shards=[0, 1])
    got = normalize_rows(
        [r.asDict() for r in table.read().collect()
         if not r["conv_id"].startswith("hb")],
        table.value_names,
    )
    assert got == normalize_rows(expected.as_records(), expected.columns)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    # column-wise LWW: text from shard 1's txn, tool from shard 0's — both
    # survive because they touched different columns of the same row
    assert rows[("c1", 0)]["text"] == "from-s1"
    assert rows[("c1", 0)]["tool"] == "t-s0"

    # --- arrival-order independence: shard 1's slice arrives FIRST ---
    fbA = contested_feed()
    by_shard = {s_: [r for r in fbA.rows if r["shard"] == s_] for s_ in (0, 1)}
    tbl2 = create_target(spark, os.path.join(tmpdir_path, "tbl2"), n_buckets=2)
    df1 = spark.createDataFrame(by_shard[1], schema=fbA.event_schema)
    apply_epoch(tbl2, df1, 0, job_id="j", shard_watermark=True,
                expected_shards=[0, 1])
    assert tbl2.read().count() == 0  # everything gated: shard 0 silent
    df0 = spark.createDataFrame(by_shard[0], schema=fbA.event_schema)
    apply_epoch(tbl2, df0, 1, job_id="j", shard_watermark=True,
                expected_shards=[0, 1])
    apply_epoch(tbl2, heartbeat(1, 200_000).to_spark(spark), 2, job_id="j",
                shard_watermark=True, expected_shards=[0, 1])
    got2 = normalize_rows(
        [r.asDict() for r in tbl2.read().collect()
         if not r["conv_id"].startswith("hb")],
        tbl2.value_names,
    )
    assert got2 == normalize_rows(expected.as_records(), expected.columns)


def _rac_ddl_feed():
    """rac-ddl-cross-node.rac.sql mapped onto transcripts: DML with the old
    schema on shard 0 → DDL (ADD COLUMN email) commits on shard 0 → shard 1
    streams DML USING the new column in the same watermark window → more
    new-schema DML back on shard 0.  The epoch fence must order everything
    by commit scn: pre-DDL rows apply under the old schema, the ALTER
    applies exactly once, and the cross-shard post-DDL DML lands with email
    populated."""
    fb = FeedBuilder(
        n_shards=2,
        image_columns=["role", "text", "tool", "ts", "email"],
        columns=["role", "text", "tool", "ts"],
    )
    t = fb.begin(shard=0)
    t.ins("r1", 0, role="u", text="Alice", ts=TS)
    t.ins("r2", 0, role="u", text="Bob", ts=TS)
    fb.commit(t)
    fb.ddl_txn("ADD COLUMN email string",
               ["role", "text", "tool", "ts", "email"], shard=0)
    t1 = fb.begin(shard=1)  # DDL redo came only from shard 0
    t1.ins("r3", 0, role="u", text="Charlie", email="charlie@test.com", ts=TS)
    t1.upd("r1", 0, email="alice@test.com")
    fb.commit(t1)
    t0 = fb.begin(shard=0)
    t0.upd("r2", 0, email="bob@test.com")
    t0.delete("r1", 0)
    fb.commit(t0)
    return fb


def test_rac_ddl_cross_node_batch(spark, tmpdir_path):
    """rac-ddl-cross-node, bounded batch: one epoch carrying the DDL fence
    and both shards' DML (reference fixture
    tests/sql/inputs/rac-ddl-cross-node.rac.sql)."""
    fb = _rac_ddl_feed()
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    assert table.value_names == ["role", "text", "tool", "ts", "email"]
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert ("r1", 0) not in rows  # deleted in phase 3
    assert rows[("r2", 0)]["email"] == "bob@test.com"
    assert rows[("r3", 0)]["email"] == "charlie@test.com"


def test_rac_ddl_cross_node_watermarked(spark, tmpdir_path):
    """Same fixture under the RAC commit-SCN watermark: shard 0's phase-3
    txn commits at the window's top edge and gates until shard 1's frontier
    passes it; the DDL (committed below both frontiers) applies in epoch 0
    so shard 1's new-schema DML is never mis-projected."""
    import os

    from helpers import normalize_rows
    from openlogreplicator_spark.oracle import replay
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = _rac_ddl_feed()
    expected = replay(fb.rows)
    table = create_target(spark, os.path.join(tmpdir_path, "tbl"), n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j",
                shard_watermark=True, expected_shards=[0, 1])
    # DDL already applied; phase 1+2 visible, phase 3 gated
    assert table.value_names == ["role", "text", "tool", "ts", "email"]
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("r1", 0)]["email"] == "alice@test.com"  # shard 1's update
    assert rows[("r2", 0)]["email"] is None  # phase 3 still gated

    hb = FeedBuilder(n_shards=2, start_scn=100_000,
                     image_columns=["role", "text", "tool", "ts", "email"],
                     columns=["role", "text", "tool", "ts", "email"])
    hb._xid_counter = 77
    t = hb.begin(shard=1)
    t.ins("hb1", 0, role="hb", text="x", ts=TS)
    hb.commit(t)
    apply_epoch(table, hb.to_spark(spark), 1, job_id="j",
                shard_watermark=True, expected_shards=[0, 1])
    got = normalize_rows(
        [r.asDict() for r in table.read().collect()
         if not r["conv_id"].startswith("hb")],
        table.value_names,
    )
    assert got == normalize_rows(expected.as_records(), expected.columns)


def test_rac_ddl_cross_node_multi_table(spark, tmpdir_path):
    """Multi-table variant: the ALTER commits on shard 0 against
    `summaries` while shard 2 streams new-column DML to the same table in
    the same watermark window; the other table is untouched."""
    import os

    from helpers import normalize_rows
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.oracle import replay_multi
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=0)
    t.dml_other_table("summaries", "s1", 0, op="ins", role="u", text="old")
    fb.commit(t)
    fb.ddl_txn("ALTER TABLE summaries ADD COLUMN meta string",
               ["role", "text", "tool", "ts"], shard=0)
    t1 = fb.begin(shard=1)
    t1.dml_other_table("summaries", "s2", 0, op="ins", role="u", text="new",
                       meta="m-new")
    t1.dml_other_table("summaries", "s1", 0, op="upd", meta="m-old")
    fb.commit(t1)
    t = fb.begin(shard=0)
    t.ins("c1", 0, role="u", text="transcript", ts=TS)
    fb.commit(t)

    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    cat.create_table("transcripts", n_buckets=2)
    cat.create_table("summaries", n_buckets=2)
    apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])
    hb = FeedBuilder(n_shards=2, start_scn=100_000)
    hb._xid_counter = 88
    t = hb.begin(shard=1)
    t.ins("hb2", 0, role="hb", text="x", ts=TS)
    hb.commit(t)
    apply_epoch_multi(cat, hb.to_spark(spark), 1, job_id="j",
                      shard_watermark=True, expected_shards=[0, 1])

    # the heartbeat itself commits at shard 1's frontier top and stays
    # gated — compare the fixture rows only
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert cat.table("summaries").value_names == [
        "role", "text", "tool", "ts", "meta"
    ]
    for name in ("transcripts", "summaries"):
        table = cat.table(name)
        got = normalize_rows(
            [r.asDict() for r in table.read().collect()
             if not r["conv_id"].startswith("hb")],
            table.value_names,
        )
        want = normalize_rows(
            expected.as_records(name), expected.tables[name]["columns"]
        )
        assert got == want, f"{name}: state mismatch\n got={got}\nwant={want}"


def test_partitioned_table_segments(spark, tmpdir_path):
    """partitioned-table.sql analog: DML arrives from DISTINCT partition
    segments (per-txn attrs carry the segment's obj/dataobj, the SysTabPart
    mapping) but all of it is ONE logical table — segment identity must not
    split routing, bucketing, or collapse.  Mirrors the fixture's
    insert-across-partitions / update / delete matrix."""
    fb = FeedBuilder()
    # inserts land in three different range-partition segments
    t = fb.begin(attrs={"obj": "71001", "dataobj": "71002", "part": "p_low"})
    t.ins("r10", 0, role="u", text="Low-A", ts=TS)
    t.ins("r50", 0, role="u", text="Low-B", ts=TS)
    fb.commit(t)
    t = fb.begin(attrs={"obj": "71001", "dataobj": "71003", "part": "p_mid"})
    t.ins("r150", 0, role="u", text="Mid-A", ts=TS)
    fb.commit(t)
    t = fb.begin(attrs={"obj": "71001", "dataobj": "71004", "part": "p_high"})
    t.ins("r250", 0, role="u", text="High-A", ts=TS)
    fb.commit(t)
    # updates touch rows in different segments within one transaction
    t = fb.begin(attrs={"obj": "71001", "dataobj": "71002", "part": "p_low"})
    t.upd("r10", 0, text="Low-A-v2")
    t.upd("r150", 0, text="Mid-A-v2")
    fb.commit(t)
    # deletes from two segments
    t = fb.begin(attrs={"obj": "71001", "dataobj": "71004", "part": "p_high"})
    t.delete("r50", 0)
    t.delete("r250", 0)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("r10", 0)]["text"] == "Low-A-v2"
    assert rows[("r150", 0)]["text"] == "Mid-A-v2"
    assert ("r50", 0) not in rows and ("r250", 0) not in rows


def test_partition_key_row_movement(spark, tmpdir_path):
    """Oracle row movement: an UPDATE that changes the partition key is
    logged as DELETE(old segment) + INSERT(new segment) inside the same
    transaction (partitioned-table.sql list-partition case).  The op
    lattice must fold del→ins on one key into the surviving new row, and
    a crossing pair split across two transactions must behave the same."""
    fb = FeedBuilder()
    t = fb.begin(attrs={"part": "p_east"})
    t.ins("row1", 0, role="u", text="EAST", tool="1000.50", ts=TS)
    fb.commit(t)
    # same-txn movement: del in old segment + ins in new segment
    t = fb.begin(attrs={"part": "p_east->p_west"})
    t.delete("row1", 0)
    t.ins("row1", 0, role="u", text="WEST", tool="1000.50", ts=TS)
    fb.commit(t)
    # cross-txn movement with an unrelated interleaved write
    t = fb.begin(attrs={"part": "p_west"})
    t.delete("row1", 0)
    fb.commit(t)
    t = fb.begin(attrs={"part": "p_other"})
    t.ins("row1", 0, role="u", text="NORTH", tool="3000.00", ts=TS)
    t.ins("row2", 0, role="u", text="WEST", tool="2000.75", ts=TS)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("row1", 0)]["text"] == "NORTH"
    assert rows[("row2", 0)]["text"] == "WEST"


def test_timestamp_variants(spark, tmpdir_path):
    """timestamp-variants.sql analog: sub-second precision (micros — Spark's
    native resolution; the fixture's FF9 values truncate the same way the
    wire's micro-resolution builder does), epoch/midnight, end-of-day
    .999999, NULL timestamps, NULL→value and value→value updates, delete."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("t1", 0, role="u", text="precise",
          ts=datetime(2025, 6, 15, 10, 30, 0, 123456, tzinfo=timezone.utc))
    t.ins("t2", 0, role="u", text="midnight",
          ts=datetime(2000, 1, 1, 0, 0, 0, 0, tzinfo=timezone.utc))
    t.ins("t3", 0, role="u", text="end-of-day",
          ts=datetime(2026, 12, 31, 23, 59, 59, 999999, tzinfo=timezone.utc))
    t.ins("t4", 0, role="u", text="nulls", ts=None)
    t.ins("t5", 0, role="u", text="pre-epoch",
          ts=datetime(1969, 12, 31, 23, 59, 59, 1, tzinfo=timezone.utc))
    fb.commit(t)
    t = fb.begin()
    t.upd("t1", 0, ts=datetime(2026, 3, 1, 8, 0, 0, 500000, tzinfo=timezone.utc))
    t.upd("t4", 0, ts=datetime(2025, 1, 15, 12, 0, 0, 1, tzinfo=timezone.utc))
    fb.commit(t)
    t = fb.begin()
    t.delete("t2", 0)
    fb.commit(t)
    table, _ = run_and_compare(spark, fb, tmpdir_path)
    rows = {r["conv_id"]: r.asDict() for r in table.read().collect()}
    # collected values are naive UTC (session TZ pinned)
    assert rows["t1"]["ts"] == datetime(2026, 3, 1, 8, 0, 0, 500000)
    assert rows["t3"]["ts"] == datetime(2026, 12, 31, 23, 59, 59, 999999)
    assert rows["t4"]["ts"] == datetime(2025, 1, 15, 12, 0, 0, 1)
    assert rows["t5"]["ts"] == datetime(1969, 12, 31, 23, 59, 59, 1)
    assert "t2" not in rows
