"""W6 JSON message builder — wire-format mirror of the reference's output
(BuilderJson.cpp; golden shape tests/fixtures/expected/*/output.json)."""

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.functions.json_output import build_json_messages
from openlogreplicator_spark.operators.assemble import assemble_transactions

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_json_message_shape(spark):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.upd("c1", 0, text="hello v2")
    t.delete("c1", 0)
    fb.commit(t)
    committed = assemble_transactions(fb.to_spark(spark))["committed"]
    msgs = build_json_messages(
        committed.filter(F.col("op").isin("ins", "upd", "del"))
    ).orderBy("scn", "idx").collect()
    assert len(msgs) == 3
    parsed = [json.loads(m["message"]) for m in msgs]
    assert [p["payload"][0]["op"] for p in parsed] == ["c", "u", "d"]
    ins = parsed[0]
    assert set(ins) == {"scn", "idx", "tm", "xid", "db", "attributes", "payload"}
    assert ins["payload"][0]["schema"] == {"owner": "APP", "table": "transcripts"}
    assert ins["payload"][0]["after"]["text"] == "hello"
    assert len(ins["payload"][0]["rid"]) == 18
    # update carries only changed columns in a sparse after image
    assert parsed[1]["payload"][0]["after"]["text"] == "hello v2"
    assert parsed[1]["payload"][0]["after"]["role"] is None
    # identity is (commit scn, idx) — monotone within the txn
    assert [m["idx"] for m in msgs] == sorted(m["idx"] for m in msgs)


def test_json_mirror_end_to_end(spark, tmpdir_path):
    """W6 egress sink: the mirror's (file, line) order IS commit order, the
    message stream diff-matches the sequential oracle's emitted op stream,
    and each epoch ends with an op:"chkpt" heartbeat (WriterFile analog)."""
    import os

    from openlogreplicator_spark.functions.json_output import read_json_mirror
    from openlogreplicator_spark.oracle import replay
    from openlogreplicator_spark.streaming.job import run_stream

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.ins("c2", 0, role="user", text="popped", ts=TS)
    t.prollback("c2", 0)  # savepoint: c2 ins must not reach the wire
    fb.commit(t)
    fb.new_seq()
    t = fb.begin()
    t.upd("c1", 0, text="hello v2")
    t.delete("c1", 0)
    fb.commit(t)

    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    mirror_dir = os.path.join(tmpdir_path, "mirror")
    run_stream(
        spark, feed_dir, os.path.join(tmpdir_path, "tbl"),
        os.path.join(tmpdir_path, "ckpt"),
        max_files_per_trigger=1, json_mirror_dir=mirror_dir,
    )

    lines = read_json_mirror(mirror_dir)
    msgs = [json.loads(ln) for ln in lines]
    data = [m for m in msgs if m["payload"][0]["op"] != "chkpt"]
    chkpts = [m for m in msgs if m["payload"][0]["op"] == "chkpt"]
    assert len(chkpts) >= 1 and all("seq" in c["payload"][0] for c in chkpts)

    expected = replay(fb.rows)
    op_letter = {"ins": "c", "upd": "u", "del": "d"}
    want = [
        (op_letter[e["op"]], e["conv_id"], e["turn_idx"],
         (e["after"] or {}).get("text"))
        for e in expected.emitted
    ]
    # compare op letters + after.text in global order; key identity via rid
    # is engine-internal, so project the comparable fields
    got_full = [
        (m["payload"][0]["op"], (m["payload"][0]["after"] or {}).get("text"))
        for m in data
    ]
    want_full = [(w[0], w[3]) for w in want]
    assert got_full == want_full
    # scn order is monotone across files/epochs
    scns = [m["scn"] for m in data]
    assert scns == sorted(scns)


def test_session_attributes_flow(spark, tmpdir_path):
    """Session attributes (OpCode0513 analog) stamp every event of a txn,
    drive condition filters, and appear in output messages."""
    from openlogreplicator_spark.operators.filters import condition_filter

    fb = FeedBuilder()
    t = fb.begin(attrs={"username": "alice", "program": "app1"})
    t.ins("c1", 0, role="user", text="by alice", ts=TS)
    fb.commit(t)
    t = fb.begin(attrs={"username": "ignored_user"})
    t.ins("c2", 0, role="user", text="by ignored", ts=TS)
    fb.commit(t)
    feed = fb.to_spark(spark)

    # F2 condition on a session attribute — the reference's
    # "[login username]" filter expression analog
    kept = condition_filter(
        feed.filter(F.col("op") == "ins"),
        "attrs['username'] != 'ignored_user'",
    ).collect()
    assert [r["conv_id"] for r in kept] == ["c1"]

    committed = assemble_transactions(feed)["committed"]
    msgs = build_json_messages(
        committed.filter(F.col("op") == "ins")
    ).orderBy("scn").collect()
    parsed = [json.loads(m["message"]) for m in msgs]
    assert parsed[0]["attributes"] == {"username": "alice", "program": "app1"}
    assert parsed[1]["attributes"] == {"username": "ignored_user"}


def test_schemaless_mode_emits_untracked(spark, tmpdir_path):
    """REDO_FLAGS::SCHEMALESS analog: untracked-table DML reaches the JSON
    mirror as raw payloads and is NOT counted skipped."""
    import os

    from openlogreplicator_spark.functions.json_output import read_json_mirror
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="tracked", ts=TS)
    t.dml_other_table("audit_log", "c1", 0, op="ins", text="untracked row")
    fb.commit(t)

    path = os.path.join(tmpdir_path, "tbl")
    mirror = os.path.join(tmpdir_path, "mirror")
    table = create_target(spark, path, n_buckets=2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j",
                json_mirror_dir=mirror, schemaless=True)

    msgs = [json.loads(ln) for ln in read_json_mirror(mirror)]
    tables = {m["payload"][0]["schema"]["table"] for m in msgs
              if m["payload"][0]["op"] != "chkpt"}
    assert tables == {"transcripts", "audit_log"}
    assert table.lineage().agg(F.sum("n_skipped").alias("s")).first()["s"] == 0
    # the lake table itself stays transcripts-only
    assert {r["conv_id"] for r in table.read().collect()} == {"c1"}


def test_native_wire_byte_parity_with_reference_golden(spark):
    """Byte-exact reproduction of the reference's OWN e2e output fixture
    (tests/fixtures/expected/example-free-23/output.json, produced by
    BuilderJson against a real Oracle Free 23 database with format dials
    {scn:1, timestamp:7, xid:1} — tests/sql/scripts/drivers/base.sh:468).
    Same transaction (OLR_TEST.TEST_CDC insert ID=1/NAME='hello world',
    commit scn 2267707, xid 10.12.572) through OUR builder under
    native_keys must emit the same three wire lines, byte for byte."""
    import os

    golden_path = ("/root/reference/tests/fixtures/expected/"
                   "example-free-23/output.json")
    if not os.path.exists(golden_path):
        import pytest
        pytest.skip("reference fixture not present")
    golden = [l for l in open(golden_path).read().splitlines() if l]

    fb = FeedBuilder(table_name="TEST_CDC", start_scn=2267705,
                     columns=["ID", "NAME"], image_columns=["ID", "NAME"])
    t = fb.begin()
    t.ins("1", 0, ID="1", NAME="hello world")
    fb.commit(t)
    df = (
        fb.to_spark(spark)
        # pin the wire-visible identities to the fixture's values: xid
        # usn=10/slt=12/sqn=0x23c and record time 1772847880 (the scn is
        # pinned via start_scn: begin 2267705, ins ..06, commit ..07)
        .withColumn("xid", F.lit("10.012.0000023c"))
        .withColumn("ts", F.timestamp_seconds(F.lit(1772847880)))
        # the fixture's ID is Oracle NUMBER -> JSON numeric
        .withColumn("after", F.struct(
            F.col("after.ID").cast("int").alias("ID"), F.col("after.NAME")))
        .withColumn("before", F.when(
            F.col("before").isNotNull(),
            F.struct(F.col("before.ID").cast("int").alias("ID"),
                     F.col("before.NAME"))))
    )
    from openlogreplicator_spark.functions.json_output import WireFormat

    wire = WireFormat(message=0, scn=1, rid=0, timestamp=7, attributes=0,
                      column=0, schema=0, xid=1, db=0, native_keys=True)
    committed = assemble_transactions(df)["committed"]
    msgs = (
        build_json_messages(
            committed.filter(F.col("op").isin("ins", "upd", "del")),
            owner="OLR_TEST", fmt=wire)
        .orderBy("scn", "idx").collect()
    )
    assert [m["message"] for m in msgs] == golden


def test_xid_format_dials(spark):
    """XID_FORMAT renderings (BuilderJson.h:298-327) from the feed's
    'usn.slt.sqnhex' xid: hex, dec, packed numeric (key xidn), reversed."""
    from openlogreplicator_spark.functions.json_output import WireFormat

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x")
    fb.commit(t)
    df = fb.to_spark(spark).withColumn("xid", F.lit("10.012.0000023c"))
    committed = assemble_transactions(df)["committed"]
    dml = committed.filter(F.col("op") == "ins")

    def one(**kw):
        m = build_json_messages(dml, fmt=WireFormat(**kw)).collect()[0]
        return json.loads(m["message"])

    assert one(xid=0)["xid"] == "0x000a.00c.0000023c"
    assert one(xid=1)["xid"] == "10.12.572"
    packed = (10 << 48) | (12 << 32) | 572
    assert one(xid=2)["xidn"] == packed
    assert one(xid=3)["xid"] == f"{packed:016x}"[::-1]
    # default: feed xid verbatim
    assert one()["xid"].startswith("10.012.0000023c")
    # db dial: 0 hides the db field, default keeps it
    assert "db" not in one(db=0)
    assert "db" in one()
