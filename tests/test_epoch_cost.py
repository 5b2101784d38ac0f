"""Per-epoch fixed-cost guarantees (round-4 top item).

Round 3 measured ~49 s of fixed per-epoch overhead, almost all per-job
scheduling (~4 s/job on this box) multiplied by the number of Spark
actions apply_epoch issued.  These tests pin the action budget with the
status tracker (a job-group count is plan-shape truth, like the plan-gate
tests) and the incremental pending-carry contract (write cost ∝ this
epoch's NEW open events, never O(open set)).
"""

import glob
import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _count_jobs(spark, group, fn):
    """Spark ACTIONS issued by fn.  AQE materializes every shuffle stage as
    its own tracker job (stage re-plan), which measures plan depth, not
    driver round-trips — so the count runs with AQE off, where one action
    == one job.  The action count is identical either way."""
    sc = spark.sparkContext
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", old)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def _committed_feed(n_txns=6):
    fb = FeedBuilder()
    for i in range(n_txns):
        t = fb.begin()
        t.ins(f"c{i}", 0, role="user", text=f"v{i}", ts=TS)
        t.upd(f"c{i}", 0, text=f"v{i}b")
        fb.commit(t)
    return fb


def test_epoch_job_count_single_table(spark, tmpdir_path):
    """A plain epoch (no DDL, no open txns, no watermark/cap config) must
    cost exactly TWO actions: the fused stats+counts job (which also fills
    the collapse cache) and the merge write — the budget in apply.py's
    module docstring.  One slack slot for engine-version noise; 8+ means
    the round-3 job sprawl regressed."""
    fb = _committed_feed()
    table = create_target(spark, os.path.join(tmpdir_path, "tbl"), n_buckets=4)
    njobs = _count_jobs(
        spark, "epoch-cost-single",
        lambda: apply_epoch(table, fb.to_spark(spark), 0, job_id="j"),
    )
    assert njobs <= 3, f"single-table epoch ran {njobs} Spark jobs (budget 2+1 slack)"
    got = normalize_rows([r.asDict() for r in table.read().collect()], table.value_names)
    want = replay(fb.rows)
    assert got == normalize_rows(want.as_records(), want.columns)


def test_epoch_job_count_multi_table(spark, tmpdir_path):
    """Multi-table epochs collapse EVERY live table in ONE job with ONE
    counts collect; only the final per-table writes fan out.  Budget for T
    tables: stats + collapse/counts + T writes (+1 slack) — NOT the round-3
    O(T) collapse jobs + O(T) collects."""
    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    tables = ["transcripts", "summaries", "audit", "notes"]
    fb = FeedBuilder()
    for i, name in enumerate(tables * 2):
        t = fb.begin()
        if name == "transcripts":
            t.ins(f"c{i}", 0, role="user", text=f"v{i}", ts=TS)
        else:
            t.dml_other_table(name, f"c{i}", 0, op="ins", role="x", text=f"v{i}")
        fb.commit(t)
    cat = Catalog.create(spark, os.path.join(tmpdir_path, "cat"))
    for name in tables:
        cat.create_table(name, n_buckets=2)
    njobs = _count_jobs(
        spark, "epoch-cost-multi",
        lambda: apply_epoch_multi(cat, fb.to_spark(spark), 0, job_id="j"),
    )
    budget = 1 + len(tables) + 1
    assert njobs <= budget, (
        f"multi-table epoch over T={len(tables)} tables ran {njobs} Spark jobs "
        f"(budget {budget}); the driver-side fan-out loop is back"
    )
    for name in tables:
        assert cat.table(name).read().count() == 2


def test_pending_delta_carry_is_incremental(spark, tmpdir_path):
    """A months-open mega-transaction must cost O(this epoch's new events)
    per epoch, not O(open set): the pending state is delta-appended and the
    big epoch-1 snapshot is never rewritten (reference analog: swap-to-disk
    in MemoryManager.cpp — state is carried, not recopied)."""
    from pyspark.sql import functions as F

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)

    # epoch 0: mega-txn opens with 50 events; a sibling txn commits
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="u", text="committed", ts=TS)
    fb.commit(t)
    mega = fb.begin()
    for i in range(50):
        mega.ins("m", i, role="u", text=f"part{i}", ts=TS)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    dirs0 = list(table.manifest["pending_dirs"])
    assert len(dirs0) == 1
    assert table.manifest["pending_open_xids"] == [mega.xid]

    # epoch 1: 2 more events on the open txn → ONE new delta dir with
    # exactly 2 rows; the 51-row epoch-0 snapshot is untouched
    fb1 = FeedBuilder(start_scn=50_000)
    fb1._xid_counter = 500
    t1 = fb1.begin()
    t1.ins("c2", 0, role="u", text="committed2", ts=TS)
    fb1.commit(t1)
    cont = fb1.continue_txn(mega)
    cont.ins("m", 50, role="u", text="part50", ts=TS)
    cont.ins("m", 51, role="u", text="part51", ts=TS)
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")
    dirs1 = list(table.manifest["pending_dirs"])
    assert dirs1[0] == dirs0[0], "epoch-0 snapshot was rewritten"
    assert len(dirs1) == 2
    new_rows = spark.read.parquet(os.path.join(path, dirs1[1])).count()
    assert new_rows == 2, f"delta carried {new_rows} rows, wanted O(new)=2"

    # epoch 2: nothing new for the open txn → ZERO pending writes
    fb2 = FeedBuilder(start_scn=90_000)
    fb2._xid_counter = 900
    t2 = fb2.begin()
    t2.ins("c3", 0, role="u", text="committed3", ts=TS)
    fb2.commit(t2)
    apply_epoch(table, fb2.to_spark(spark), 2, job_id="j")
    assert list(table.manifest["pending_dirs"]) == dirs1

    # the carried state is the union of the deltas
    pend = table.pending(CHANGE_EVENT_SCHEMA)
    assert pend.count() == 53  # begin + 52 ins
    assert pend.filter(F.col("turn_idx") == 51).count() == 1

    # epoch 3: the mega-txn finally commits → applied whole, pending clear
    fb3 = FeedBuilder(start_scn=120_000)
    fb3._xid_counter = 1200
    fin = fb3.continue_txn(cont)
    fb3.commit(fin)
    apply_epoch(table, fb3.to_spark(spark), 3, job_id="j")
    assert table.manifest["pending_dirs"] == []
    assert table.pending(CHANGE_EVENT_SCHEMA).count() == 0
    rows = {(r["conv_id"], r["turn_idx"]) for r in table.read().collect()}
    assert ("m", 0) in rows and ("m", 51) in rows
    assert len([k for k in rows if k[0] == "m"]) == 52


def test_pending_closed_tombstone_filters_reader(spark, tmpdir_path):
    """When one of two open txns commits, the surviving delta files are NOT
    rewritten: the closed xid is tombstoned in the manifest and filtered at
    read time, and the applied rows land in the table exactly once."""
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)

    fb = FeedBuilder()
    a = fb.begin()
    a.ins("a", 0, role="u", text="txn-a", ts=TS)
    b = fb.begin()
    b.ins("b", 0, role="u", text="txn-b", ts=TS)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    dirs0 = list(table.manifest["pending_dirs"])
    assert sorted(table.manifest["pending_open_xids"]) == sorted([a.xid, b.xid])

    # txn a commits; txn b stays open with no new events
    fb1 = FeedBuilder(start_scn=50_000)
    fb1._xid_counter = 500
    fin = fb1.continue_txn(a)
    fb1.commit(fin)
    apply_epoch(table, fb1.to_spark(spark), 1, job_id="j")
    # no rewrite: same dirs... plus possibly a delta for a's commit event?
    # the commit event belongs to txn a which closed this epoch — it is
    # consumed, not carried — so NO new pending file at all
    assert list(table.manifest["pending_dirs"]) == dirs0
    assert table.manifest["pending_closed"] == [a.xid]
    assert table.manifest["pending_open_xids"] == [b.xid]
    pend = table.pending(CHANGE_EVENT_SCHEMA)
    assert {r["xid"] for r in pend.collect()} == {b.xid}
    rows = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert rows == {"a": "txn-a"}


def test_pending_compaction_bounds_delta_chain(spark, tmpdir_path):
    """The delta chain is bounded: once it reaches PENDING_COMPACT_DIRS the
    open set is rewritten as one snapshot (same lazy-compaction idea as the
    merge-on-read data path)."""
    from openlogreplicator_spark.streaming import apply as apply_mod

    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2)

    fb = FeedBuilder()
    mega = fb.begin()
    mega.ins("m", 0, role="u", text="p0", ts=TS)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")

    old = apply_mod.PENDING_COMPACT_DIRS
    apply_mod.PENDING_COMPACT_DIRS = 3
    try:
        for e in range(1, 5):
            fbe = FeedBuilder(start_scn=10_000 * (e + 1))
            fbe._xid_counter = 100 * e
            cont = fbe.continue_txn(mega)
            cont.ins("m", e, role="u", text=f"p{e}", ts=TS)
            apply_epoch(table, fbe.to_spark(spark), e, job_id="j")
        assert len(table.manifest["pending_dirs"]) <= 3
        pend = table.pending(CHANGE_EVENT_SCHEMA)
        assert pend.count() == 6  # begin + 5 ins survive compaction
    finally:
        apply_mod.PENDING_COMPACT_DIRS = old


def test_changes_cache_levels_state_equivalent(spark, tmpdir_path):
    """The OLR_CHANGES_CACHE dial (disk/memser/deser/none) only moves the
    per-epoch collapsed-changes temp between storage tiers — final table
    state must be identical under every level, including 'none' (merge
    recomputes the collapse plan instead of reading a cache)."""
    import openlogreplicator_spark.streaming.apply as apply_mod

    fb = _committed_feed(n_txns=8)
    want = replay(fb.rows)
    want_rows = normalize_rows(want.as_records(), want.columns)
    for level in ("disk", "memser", "deser", "none"):
        os.environ["OLR_CHANGES_CACHE"] = level
        try:
            table = create_target(
                spark, os.path.join(tmpdir_path, f"tbl_{level}"), n_buckets=4
            )
            apply_epoch(table, fb.to_spark(spark), 0, job_id=f"j_{level}")
            got = normalize_rows(
                [r.asDict() for r in table.read().collect()], table.value_names
            )
            assert got == want_rows, f"state diverged under OLR_CHANGES_CACHE={level}"
        finally:
            os.environ.pop("OLR_CHANGES_CACHE", None)
