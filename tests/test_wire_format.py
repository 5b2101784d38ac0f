"""W6 format dials — the reference's ``format`` config section applied to
the JSON builder (Format.h enums; BuilderJson.cpp:452-700 message
assembly).  Each dial is a plan-time choice compiled into the to_json
projection; round trips prove the chained ingress survives every shape."""

import json
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.config import ConfigError, plan_from_config
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.functions.json_output import (
    ATTR_BEGIN,
    ATTR_COMMIT,
    ATTR_DML,
    MSG_ADD_SEQUENCES,
    MSG_FULL,
    MSG_SKIP_BEGIN,
    MSG_SKIP_COMMIT,
    SCHEMA_FULL,
    WireFormat,
    build_json_messages,
)
from openlogreplicator_spark.operators.assemble import assemble_transactions

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _committed(spark, fb=None):
    if fb is None:
        fb = FeedBuilder()
        t = fb.begin(attrs={"login username": "U1"})
        t.ins("c1", 0, role="user", text="hello", ts=TS)
        t.upd("c1", 0, text="v2")
        fb.commit(t)
        t = fb.begin(attrs={"login username": "U2"})
        t.ins("c2", 0, role="asst", text="bye", ts=TS)
        fb.commit(t)
    committed = assemble_transactions(fb.to_spark(spark))["committed"]
    return committed.filter(F.col("op").isin("ins", "upd", "del"))


def _msgs(df, fmt):
    return [json.loads(r["message"])
            for r in build_json_messages(df, fmt=fmt).orderBy("scn", "idx").collect()]


def test_scn_hex_timestamp_iso_rid_skip_no_attributes(spark):
    """scn=1 (TEXT_HEX), timestamp=11 (ISO8601_TZ), rid=0 (SKIP),
    attributes=0: header renders per the dials, rid field absent."""
    fmt = WireFormat(scn=1, timestamp=11, rid=0, attributes=0)
    ms = _msgs(_committed(spark), fmt)
    assert all(m["scn"].startswith("0x") and len(m["scn"]) == 18 for m in ms)
    import re

    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", ms[0]["tm"])
    assert all("rid" not in m["payload"][0] for m in ms)
    assert all("attributes" not in m for m in ms)


def test_timestamp_scales(spark):
    d = _committed(spark)
    base = _msgs(d, WireFormat(timestamp=3))[0]["tm"]  # unix seconds
    for dial, scale in ((0, 10**9), (1, 10**6), (2, 10**3)):
        assert _msgs(d, WireFormat(timestamp=dial))[0]["tm"] == base * scale, dial
    # string variant
    assert _msgs(d, WireFormat(timestamp=7))[0]["tm"] == str(base)


def test_add_sequences_and_schema_full(spark):
    fmt = WireFormat(message=MSG_SKIP_BEGIN | MSG_SKIP_COMMIT | MSG_ADD_SEQUENCES,
                     schema=SCHEMA_FULL)
    ms = _msgs(_committed(spark), fmt)
    # "num" = intra-txn sequence; schema carries the column dictionary
    assert [m["payload"][0]["num"] for m in ms[:2]] == [1, 2]  # 1-based after begin
    cols = {c["name"]: c["type"] for c in ms[0]["payload"][0]["schema"]["columns"]}
    assert "text" in cols and cols["text"] == "string"


def test_begin_commit_markers(spark):
    """message=0 (reference default): begin/commit marker messages frame
    each transaction's ops in the (scn, idx) stream order."""
    fmt = WireFormat(message=0, attributes=ATTR_BEGIN | ATTR_COMMIT)
    ms = _msgs(_committed(spark), fmt)
    by_xid = {}
    for m in ms:
        by_xid.setdefault(m["xid"], []).append(m["payload"][0]["op"])
    for ops in by_xid.values():
        assert ops[0] == "begin" and ops[-1] == "commit"
        assert all(o in ("c", "u", "d") for o in ops[1:-1]) and len(ops) > 2
    # attributes ride begin/commit (bits set) but NOT the DML messages
    for m in ms:
        if m["payload"][0]["op"] in ("begin", "commit"):
            assert m["attributes"] and "login username" in m["attributes"]
        else:
            assert "attributes" not in m


def test_skip_begin_keep_commit(spark):
    ms = _msgs(_committed(spark), WireFormat(message=MSG_SKIP_BEGIN))
    ops = [m["payload"][0]["op"] for m in ms]
    assert "begin" not in ops and ops.count("commit") == 2


def test_full_mode_groups_transaction(spark):
    """MESSAGE_FORMAT::FULL — one message per txn, payload = all its ops
    in intra-txn order (BuilderJson processBegin opens the array,
    processCommit closes it)."""
    ms = _msgs(_committed(spark), WireFormat(message=MSG_FULL))
    assert len(ms) == 2  # two transactions
    big = next(m for m in ms if len(m["payload"]) == 2)
    assert [p["op"] for p in big["payload"]] == ["c", "u"]
    assert big["payload"][1]["after"]["text"] == "v2"


def test_full_and_skip_rejected():
    with pytest.raises(ValueError, match="FULL"):
        WireFormat(message=MSG_FULL | MSG_SKIP_BEGIN)
    cfg = {
        "version": "1.0", "state": {"path": "/tmp/x"},
        "source": [{"alias": "S", "name": "D",
                    "reader": {"type": "batch", "redo-log": ["/tmp/f"]},
                    "format": {"type": "json", "message": MSG_FULL | MSG_SKIP_COMMIT}}],
        "target": [{"alias": "T", "source": "S", "writer": {"type": "discard"}}],
    }
    with pytest.raises(ConfigError, match="FULL"):
        plan_from_config(cfg)
    cfg["source"][0]["format"]["message"] = 99
    with pytest.raises(ConfigError, match="message"):
        plan_from_config(cfg)


@pytest.mark.parametrize("fmt", [
    WireFormat(message=MSG_FULL, column=0, rid=0),       # reference-ish compact
    WireFormat(message=0, attributes=ATTR_DML, column=0),  # markers + compact
    WireFormat(message=MSG_FULL | MSG_ADD_SEQUENCES, scn=0, timestamp=3),
], ids=["full-compact", "markers-compact", "full-seq"])
def test_wire_dials_round_trip(spark, tmpdir_path, fmt):
    """Any dial combination round-trips through the chained ingress to the
    SAME replica state: FULL-mode multi-op payloads are posexploded,
    compact images recover set-to-NULL from the changed list, marker
    messages are filtered out."""
    from openlogreplicator_spark.functions.json_output import write_json_mirror
    from openlogreplicator_spark.oracle import replay
    from openlogreplicator_spark.sources.json_feed import read_json_feed
    from openlogreplicator_spark.streaming.job import replay_batch

    fb = FeedBuilder()
    t = fb.begin(attrs={"a": "1"})
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.upd("c1", 0, text=None)          # set-to-NULL: needs the changed list
    t.ins("c2", 0, role="user", text="gone", ts=TS)
    fb.commit(t)
    t = fb.begin()
    t.delete("c2", 0)
    t.upd("c1", 0, role="sys")
    fb.commit(t)

    committed = _committed(spark, fb)
    mirror = os.path.join(tmpdir_path, "mirror")
    write_json_mirror(committed, mirror, 0, fmt=fmt)

    events = read_json_feed(spark, mirror)
    tbl = replay_batch(spark, events, os.path.join(tmpdir_path, "replica"))
    got = {(r.conv_id, r.turn_idx): (r.text, r.role)
           for r in tbl.read().collect()}
    expected = replay(fb.rows)
    want = {k: (v.get("text"), v.get("role")) for k, v in expected.rows.items()}
    assert got == want


def test_config_format_section_shapes_the_wire(spark, tmpdir_path):
    """run_from_config honors the format dials: reference defaults (absent
    fields) produce begin/commit markers, compact images, no rid, unix-nano
    tm — the reference's own default output shape."""
    from openlogreplicator_spark.config import run_from_config
    from openlogreplicator_spark.functions.json_output import read_json_mirror

    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x", ts=TS)
    fb.commit(t)
    feed = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed)
    cfg = {
        "version": "1.0", "state": {"path": os.path.join(tmpdir_path, "st")},
        "source": [{"alias": "S", "name": "D",
                    "reader": {"type": "offline", "redo-log": [feed]},
                    "format": {"type": "json"}}],
        "target": [{"alias": "T", "source": "S",
                    "writer": {"type": "file",
                               "output": os.path.join(tmpdir_path, "m", "o.json")}}],
    }
    run_from_config(spark, cfg)
    msgs = [json.loads(ln)
            for ln in read_json_mirror(os.path.join(tmpdir_path, "m"))]
    ops = [m["payload"][0]["op"] for m in msgs if m["payload"][0]["op"] != "chkpt"]
    assert ops == ["begin", "c", "commit"]
    dml = next(m for m in msgs if m["payload"][0]["op"] == "c")
    assert "rid" not in dml["payload"][0]          # RID_FORMAT::SKIP default
    assert dml["tm"] % 10**9 == 0 and dml["tm"] > 10**17  # UNIX_NANO default
    assert "attributes" not in dml                  # ATTRIBUTES default 0
    assert "role" in dml["payload"][0]["after"]     # compact: changed only
