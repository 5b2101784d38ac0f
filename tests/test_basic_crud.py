"""basic-crud scenario (reference: tests/sql/inputs/basic-crud.sql —
3 inserts, an update, a delete, separate commits)."""

from datetime import datetime, timezone

from helpers import run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def build_basic_crud():
    fb = FeedBuilder()
    t1 = fb.begin()
    t1.ins("c1", 0, role="user", text="hello", tool=None, ts=TS)
    t1.ins("c1", 1, role="assistant", text="hi there", tool=None, ts=TS)
    t1.ins("c2", 0, role="user", text="question", tool="search", ts=TS)
    fb.commit(t1)

    t2 = fb.begin()
    t2.upd("c1", 1, text="hi there (edited)")
    fb.commit(t2)

    t3 = fb.begin()
    t3.delete("c2", 0)
    fb.commit(t3)
    return fb


def test_basic_crud_batch(spark, tmpdir_path):
    table, expected = run_and_compare(spark, build_basic_crud(), tmpdir_path)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert len(rows) == 2
    assert rows[("c1", 1)]["text"] == "hi there (edited)"
    assert rows[("c1", 1)]["role"] == "assistant"  # update kept unchanged cols
    assert ("c2", 0) not in rows
    assert expected.n_txn_committed == 3


def test_basic_crud_lineage(spark, tmpdir_path):
    table, _ = run_and_compare(spark, build_basic_crud(), tmpdir_path)
    lin = {r["shard"]: r.asDict() for r in table.lineage().collect()}
    assert lin[0]["n_ins"] == 2          # c1/0 and c1/1 net row-defining puts
    assert lin[0]["n_del"] == 1          # c2/0 inserted then deleted → net del
    assert lin[0]["n_skipped"] == 0
    assert lin[0]["last_applied_lsn"] == len(build_basic_crud().rows)
