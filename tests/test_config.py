"""Reference-config compatibility: OpenLogReplicator.json → engine job.

The reference is driven by one JSON config (scripts/OpenLogReplicator-
example*.json, parsed in src/OpenLogReplicator.cpp:180-1230).  These tests
prove a user can point that same file at this engine: schema validation
matches the reference's strict field checking, the row-condition
mini-language translates to the same accept/reject decisions, and
run_from_config lands the same final state as the sequential oracle.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

import pytest

from openlogreplicator_spark.config import (
    ConfigError,
    load_config,
    plan_from_config,
    run_from_config,
    translate_condition,
)
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SCRIPTS = "/root/reference/scripts"


def _base_cfg(feed_dir, state_dir, reader_type="batch", writer=None,
              tables=None, **src_extra):
    src = {
        "alias": "S1",
        "name": "TESTDB",
        "reader": {"type": reader_type, "redo-log": [feed_dir]},
        "format": {"type": "json"},
        **src_extra,
    }
    if tables is not None:
        src["filter"] = {"table": tables, **src.get("filter", {})}
    return {
        "version": "1.9.0",
        "state": {"path": state_dir},
        "source": [src],
        "target": [{"alias": "T1", "source": "S1",
                    "writer": writer or {"type": "discard"}}],
    }


# ---------------------------------------------------------------------------
# Condition mini-language
# ---------------------------------------------------------------------------

def test_condition_full_example_translates():
    # the exact condition from OpenLogReplicator-example-full.json
    sql = translate_condition("!([op] == 'd' && [login username] == 'USER1')")
    assert sql == ("(NOT (((substr(op, 1, 1) = 'd') AND "
                   "(coalesce(attrs['login username'], '') = 'USER1'))))")


def test_condition_or_number_and_parens():
    sql = translate_condition("([a] == 5 || [b] != 'x')")
    assert sql == ("(((coalesce(attrs['a'], '') = '5') OR "
                   "(coalesce(attrs['b'], '') <> 'x')))")


def test_condition_errors():
    with pytest.raises(ConfigError):
        translate_condition("[op] ==")          # dangling comparison
    with pytest.raises(ConfigError):
        translate_condition("[op] 'd'")         # missing operator
    with pytest.raises(ConfigError):
        translate_condition("([op] == 'd'")     # unbalanced paren


def test_condition_evaluates_on_rows(spark):
    """The translated predicate reproduces the reference's evaluation:
    string compare, absent attribute == '', op char from the op column."""
    df = spark.createDataFrame(
        [("ins", {"login username": "USER1"}),
         ("del", {"login username": "USER1"}),
         ("del", {"login username": "USER2"}),
         ("del", None)],
        "op string, attrs map<string,string>",
    )
    sql = translate_condition("!([op] == 'd' && [login username] == 'USER1')")
    kept = [r.op + "/" + str((r.attrs or {}).get("login username"))
            for r in df.filter(sql).collect()]
    # only the USER1 delete is rejected; absent attrs -> '' != 'USER1'
    assert sorted(kept) == ["del/None", "del/USER2", "ins/USER1"]


# ---------------------------------------------------------------------------
# Schema validation
# ---------------------------------------------------------------------------

def test_unknown_field_rejected_strict_accepted_lenient(tmpdir_path):
    cfg = _base_cfg("/tmp/feed", tmpdir_path)
    cfg["source"][0]["reader"]["no-such-knob"] = 1
    with pytest.raises(ConfigError, match="no-such-knob"):
        load_config(cfg)
    assert load_config(cfg, strict=False)  # reference: DISABLE_CHECKS analog


def test_reference_example_configs_parse():
    """The shipped example configs parse under the same field vocabulary.
    Oracle-online examples plan only after redo-log paths exist, exactly
    like the reference needs a live database — the error must say so."""
    examples = sorted(glob.glob(os.path.join(REF_SCRIPTS, "*.json")))
    if not examples:
        pytest.skip("reference scripts not present")
    for path in examples:
        cfg = load_config(path)  # strict field check passes
        reader = cfg["source"][0]["reader"]
        writer = cfg["target"][0]["writer"]
        if not reader.get("redo-log"):
            with pytest.raises(ConfigError, match="live Oracle|redo-log"):
                plan_from_config(path)
        elif writer.get("type") == "zeromq":
            with pytest.raises(ConfigError, match="zeromq"):
                plan_from_config(path)
        else:
            plan = plan_from_config(path)
            assert plan.feed_paths


def test_plan_mapping_fields(tmpdir_path):
    cfg = _base_cfg(
        "/tmp/feed", tmpdir_path, reader_type="offline",
        tables=[{"owner": "O1", "table": "transcripts",
                 "key": "conv_id,turn_idx",
                 "condition": "!([op] == 'd')"},
                {"owner": "O1", "table": "TAB.*"}],
        **{"transaction-max-mb": 2},
    )
    cfg["source"][0]["filter"]["skip-xid"] = ["x1", "x2"]
    cfg["source"][0]["filter"]["dump-xid"] = ["x3"]
    cfg["source"][0]["reader"]["start-scn"] = 1000
    cfg["metrics"] = {"type": "prometheus", "bind": "127.0.0.1:8080"}
    plan = plan_from_config(cfg)
    assert plan.mode == "stream"
    assert plan.tracked_pattern == "^(transcripts|TAB.*)$"
    assert plan.multi_tables is None  # regex entry -> single-pattern mode
    assert plan.skip_xids == ["x1", "x2"] and plan.dump_xids == ["x3"]
    assert plan.start_scn == 1000
    assert plan.max_txn_ops == 2 * 4096
    assert plan.metrics
    assert plan.rules[0].key_cols == [("conv_id", "string"), ("turn_idx", "int")]
    # per-table condition guards only its table
    assert "table_name NOT RLIKE" in plan.condition_sql


def test_multi_table_literals_make_catalog_plan(tmpdir_path):
    cfg = _base_cfg("/tmp/feed", tmpdir_path,
                    tables=[{"table": "orders"}, {"table": "customers"}])
    plan = plan_from_config(cfg)
    assert plan.multi_tables == ["orders", "customers"]


# ---------------------------------------------------------------------------
# End-to-end: run_from_config lands the oracle's final state
# ---------------------------------------------------------------------------

def _feed(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin(attrs={"login username": "USER1"})
    t.ins("c1", 0, role="user", text="keep-me")
    fb.commit(t)
    t = fb.begin(attrs={"login username": "USER2"})
    t.ins("c2", 0, role="user", text="victim")
    fb.commit(t)
    fb.new_seq()
    t = fb.begin(attrs={"login username": "USER1"})
    t.delete("c1", 0)   # rejected by the condition: USER1 deletes filtered
    fb.commit(t)
    t = fb.begin(attrs={"login username": "USER2"})
    t.delete("c2", 0)   # passes: USER2 delete applies
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    return fb, feed_dir


def test_run_from_config_batch_with_condition(spark, tmpdir_path):
    fb, feed_dir = _feed(spark, tmpdir_path)
    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"),
        tables=[{"owner": "O1", "table": "transcripts",
                 "condition": "!([op] == 'd' && [login username] == 'USER1')"}],
    )
    table = run_from_config(spark, cfg)
    rows = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    # c1 survives (its delete was condition-rejected), c2 is gone
    assert rows == {("c1", 0): "keep-me"}


def test_run_from_config_stream_file_writer(spark, tmpdir_path):
    """offline reader + file writer: streams the feed and mirrors the
    committed ops as JSON wire messages, like the reference's file sink.
    A %t mask REQUIRES max-file-size (reference error 30007), so this
    config carries one; the rotated output file must hold the wire
    messages in commit order."""
    fb, feed_dir = _feed(spark, tmpdir_path)
    state = os.path.join(tmpdir_path, "state")
    out_dir = os.path.join(tmpdir_path, "rotated")
    cfg = _base_cfg(feed_dir, state, reader_type="offline",
                    writer={"type": "file",
                            "output": os.path.join(out_dir, "out-%t.json"),
                            "max-file-size": 10_000_000, "new-line": 1})
    table = run_from_config(spark, cfg)
    expected = replay(fb.rows, tracked_tables={"transcripts"})
    got = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    want = {(k[0], k[1]): v["text"] for k, v in expected.rows.items()}
    assert got == want
    rotated = [f for f in glob.glob(os.path.join(out_dir, "out-*.json"))
               if os.path.isfile(f)]
    assert rotated, "rotated file egress missing"
    lines = [json.loads(ln) for f in rotated for ln in open(f)
             if ln.strip()]
    data = [m for m in lines
            if m["payload"][0].get("op") in ("c", "u", "d")]
    assert len(data) == 4  # all four committed DML ops ride the wire
    scns = [m["scn"] for m in data]
    assert scns == sorted(scns), "rotated stream must be in commit order"


def test_run_from_config_rotation_mask_requires_size(spark, tmpdir_path):
    """%t without max-file-size is the reference's config error 30007 —
    rejected at parse time, before any job runs."""
    fb, feed_dir = _feed(spark, tmpdir_path)
    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "state"),
                    writer={"type": "file",
                            "output": os.path.join(tmpdir_path, "o-%t.json")})
    with pytest.raises(ConfigError, match="max file size"):
        plan_from_config(cfg)


def test_run_from_config_skip_xid(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a")
    fb.commit(t)
    skip = fb.begin()
    skip.ins("c9", 0, role="user", text="skipped")
    fb.commit(skip)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "state"))
    cfg["source"][0]["filter"] = {"skip-xid": [skip.xid]}
    table = run_from_config(spark, cfg)
    keys = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert keys == {("c1", 0)}


def test_debug_stop_bounds(spark, tmpdir_path):
    """debug.stop-transactions / stop-log-switches bound the drain the way
    the reference's countdown shutdown does (Parser.cpp:852): only the
    first N commits / first N redo sequences apply."""
    fb = FeedBuilder()
    for i in range(4):               # 4 txns, txn i inserts ("c{i}", 0)
        t = fb.begin()
        t.ins(f"c{i}", 0, role="user", text=f"v{i}")
        fb.commit(t)
        if i == 1:
            fb.new_seq()             # seq 0 holds txns 0-1, seq 1 holds 2-3
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)

    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "s1"))
    cfg["source"][0]["debug"] = {"stop-transactions": 3}
    got = {r.conv_id for r in run_from_config(spark, cfg).read().collect()}
    assert got == {"c0", "c1", "c2"}

    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "s2"))
    cfg["source"][0]["debug"] = {"stop-log-switches": 1}
    got = {r.conv_id for r in run_from_config(spark, cfg).read().collect()}
    assert got == {"c0", "c1"}

    plan = plan_from_config(cfg)
    assert plan.stop_log_switches == 1 and "source.debug" not in plan.ignored


def test_network_writer_serves_the_stream(spark, tmpdir_path):
    """writer type 'network': the config job spools protobuf RedoResponses
    AND binds the WriterStream server on writer.uri (the reference's
    network writer IS a server, WriterStream.cpp); a replicate_from_stream
    client drains it into a replica whose state matches the source."""
    from openlogreplicator_spark.sources.network import replicate_from_stream
    from openlogreplicator_spark.streaming.job import create_target

    fb, feed_dir = _feed(spark, tmpdir_path)
    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"),
        writer={"type": "network", "uri": "127.0.0.1:0"},
        # without the condition the feed's deletes empty the table; keep
        # USER1's row so the replica has non-trivial state to match
        tables=[{"owner": "O1", "table": "transcripts",
                 "condition": "!([op] == 'd' && [login username] == 'USER1')"}],
    )
    cfg["source"][0]["format"] = {"type": "protobuf"}
    table = run_from_config(spark, cfg)
    srv = getattr(table, "network_server", None)
    assert srv is not None, "network writer did not bind a server"
    try:
        host, port = srv.address
        replica_path = os.path.join(tmpdir_path, "replica")
        create_target(spark, replica_path, n_buckets=4)
        replicate_from_stream(spark, host, port, srv.db_name, replica_path)
        from openlogreplicator_spark.lake.table import LakeTable

        src = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
        got = {(r.conv_id, r.turn_idx): r.text
               for r in LakeTable(spark, replica_path).read().collect()}
        assert got == src and src  # non-trivial state replicated
    finally:
        srv.stop()


def test_keep_checkpoints_applies_retention(spark, tmpdir_path, monkeypatch):
    """state.keep-checkpoints -> vacuum(retain_last=N) after a bounded
    drain (vacuum semantics themselves are covered in
    test_merge_on_read.test_time_travel_and_retention)."""
    from openlogreplicator_spark.lake.table import LakeTable

    calls = {}
    orig = LakeTable.vacuum

    def spy(self, retain_last=1):
        calls["retain"] = retain_last
        return orig(self, retain_last=retain_last)

    monkeypatch.setattr(LakeTable, "vacuum", spy)
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a")
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "state"))
    cfg["state"]["keep-checkpoints"] = 3
    table = run_from_config(spark, cfg)
    assert calls["retain"] == 3
    assert table.read().count() == 1


def test_config_plan_cli():
    cfg = _base_cfg("/tmp/feed", "/tmp/state",
                    tables=[{"table": "transcripts"}])
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(cfg, f)
        path = f.name
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "job.py"), "config",
         "--file", path, "--plan"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr
    plan = json.loads(out.stdout)
    assert plan["tracked_pattern"] == "^(transcripts)$"
    os.unlink(path)


# ---------------------------------------------------------------------------
# source.flags (REDO_FLAGS bitmask, Ctx.h:86-105)
# ---------------------------------------------------------------------------

def test_flags_bits_parse():
    cfg = _base_cfg("/tmp/feed", "/tmp/state",
                    flags=(1 << 1) | (1 << 2) | (1 << 13) | (1 << 0) | (1 << 5))
    plan = plan_from_config(cfg)
    assert plan.schemaless and plan.adaptive_schema and plan.checkpoint_keep_all
    # unhonored set bits reported by NAME; honored ones NOT reported
    assert "flags.ARCH_ONLY" in plan.ignored
    assert "flags.SHOW_DDL" in plan.ignored
    assert not any(i in ("flags.SCHEMALESS", "flags.ADAPTIVE_SCHEMA",
                         "flags.CHECKPOINT_KEEP") for i in plan.ignored)
    # no flags field at all -> nothing reported, nothing honored
    plan0 = plan_from_config(_base_cfg("/tmp/feed", "/tmp/state"))
    assert not plan0.schemaless and not any(
        i.startswith("flags.") for i in plan0.ignored)


def test_flag_schemaless_rides_the_mirror(spark, tmpdir_path):
    """REDO_FLAGS::SCHEMALESS (flags bit 1): committed DML of untracked
    tables rides the JSON wire untyped instead of being dropped."""
    def run(flags, sub):
        fb = FeedBuilder()
        t = fb.begin()
        t.ins("c1", 0, role="user", text="x")
        t.dml_other_table("sidecar", "s1", 0, role="bot", text="side")
        fb.commit(t)
        feed_dir = os.path.join(tmpdir_path, sub, "feed")
        fb.write_parquet(spark, feed_dir)
        mirror = os.path.join(tmpdir_path, sub, "mirror")
        cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, sub, "state"),
                        writer={"type": "file",
                                "output": os.path.join(mirror, "out.json")},
                        **({"flags": flags} if flags else {}))
        run_from_config(spark, cfg)
        text = ""
        for p in glob.glob(os.path.join(mirror, "**", "*"), recursive=True):
            if os.path.isfile(p):
                with open(p) as f:
                    text += f.read()
        return text

    assert '"sidecar"' in run(1 << 1, "on")
    assert '"sidecar"' not in run(0, "off")


def test_flag_adaptive_schema_registers_sighted_tables(spark, tmpdir_path):
    """REDO_FLAGS::ADAPTIVE_SCHEMA (flags bit 2): multi-table jobs
    register unseen tables sighted in committed DML (no CREATE TABLE
    needed), the reference's dictionary-less adaptive mode."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x")
    t.dml_other_table("newtab", "n1", 0, role="bot", text="fresh")
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"),
        tables=[{"owner": "O1", "table": "transcripts"},
                {"owner": "O1", "table": "orders"}],
        flags=1 << 2)
    cat = run_from_config(spark, cfg)
    assert "newtab" in cat.table_names
    assert [r.conv_id for r in cat.table("newtab").read().collect()] == ["n1"]


def test_flag_checkpoint_keep_preserves_history(spark, tmpdir_path):
    """REDO_FLAGS::CHECKPOINT_KEEP (flags bit 13): checkpoint files are
    never pruned even under state.keep-checkpoints (the reference's
    deleteOldCheckpoints early-returns on the flag)."""
    from openlogreplicator_spark.state_compat import list_checkpoints

    def run_twice(flags, sub):
        feed_dir = os.path.join(tmpdir_path, sub, "feed")
        state = os.path.join(tmpdir_path, sub, "state")
        fb = FeedBuilder()
        t = fb.begin(); t.ins("c1", 0, role="user", text="a"); fb.commit(t)
        fb.write_parquet(spark, feed_dir)
        cfg = _base_cfg(feed_dir, state,
                        **({"flags": flags} if flags else {}))
        cfg["state"]["keep-checkpoints"] = 1
        run_from_config(spark, cfg)
        fb.new_seq()
        t = fb.begin(); t.ins("c2", 0, role="user", text="b"); fb.commit(t)
        fb.write_parquet(spark, feed_dir)
        run_from_config(spark, cfg)
        return list_checkpoints(state, "TESTDB")

    assert len(run_twice(1 << 13, "keep")) == 2   # flag: history survives
    assert len(run_twice(0, "prune")) == 1        # default: pruned to keep=1


def test_format_xid_db_native_keys_honored():
    """format.xid / format.db / native-keys (extension) are honored dials
    now, not ignored; out-of-range values rejected like the reference."""
    cfg = _base_cfg("/tmp/feed", "/tmp/state",
                    format={"type": "json", "xid": 1, "db": 0,
                            "native-keys": 1})
    plan = plan_from_config(cfg)
    assert plan.wire.xid == 1 and plan.wire.db == 0
    assert plan.wire.native_keys is True
    assert not any(i.startswith("format.") for i in plan.ignored)
    # absent fields keep the historical wire (verbatim xid, db shown)
    plan0 = plan_from_config(_base_cfg("/tmp/feed", "/tmp/state"))
    assert plan0.wire.xid == -1 and plan0.wire.db == -1
    assert plan0.wire.native_keys is False
    with pytest.raises(ConfigError):
        plan_from_config(_base_cfg("/tmp/feed", "/tmp/state",
                                   format={"type": "json", "xid": 9}))


def test_format_type_debezium_preset():
    """format.type debezium = the reference's dial preset over the JSON
    builder (OpenLogReplicator.cpp:695-709): full update images, db on
    messages, per-op sequence numbers, rids, schema dictionary, reversed
    xid; explicit fields override the preset; unmodeled preset pieces
    reported."""
    plan = plan_from_config(_base_cfg(
        "/tmp/feed", "/tmp/state", format={"type": "debezium"}))
    w = plan.wire
    assert (w.message, w.rid, w.column, w.xid) == (2, 1, 2, 3)
    assert w.db == 3 and w.schema == 7
    assert (w.scn_type, w.timestamp_type, w.user) == (14, 14, 15)
    assert w.native_keys is True
    assert plan.wire_format == "json"          # same builder, preset dials
    assert "format.debezium.interval-dts" in plan.ignored
    # explicit fields override the preset (the reference parses them after)
    plan2 = plan_from_config(_base_cfg(
        "/tmp/feed", "/tmp/state", format={"type": "debezium", "xid": 1}))
    assert plan2.wire.xid == 1 and plan2.wire.column == 2


def test_debezium_wire_end_to_end(spark, tmpdir_path):
    """A debezium-type config job emits the preset wire: begin/commit
    markers, per-op sequence numbers, rid, embedded schema dictionary,
    full null images, reversed-hex xid, db on messages."""
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="x")
    fb.commit(t)
    feed = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed)
    out = os.path.join(tmpdir_path, "mirror")
    cfg = _base_cfg(feed, os.path.join(tmpdir_path, "state"),
                    writer={"type": "file",
                            "output": os.path.join(out, "out.json")},
                    format={"type": "debezium"})
    run_from_config(spark, cfg)
    lines = []
    for p in glob.glob(os.path.join(out, "**", "part-*"), recursive=True):
        lines += [l for l in open(p).read().splitlines() if l]
    msgs = [json.loads(l) for l in lines]
    ops = [m["payload"][0]["op"] for m in msgs if "payload" in m]
    assert "begin" in ops and "commit" in ops and "c" in ops
    dml = next(m for m in msgs if m["payload"][0]["op"] == "c")
    p0 = dml["payload"][0]
    assert p0["num"] == 1 and len(p0["rid"]) == 18
    assert {c["name"] for c in p0["schema"]["columns"]} >= {"role", "text"}
    assert "tool" in p0["after"] and p0["after"]["tool"] is None  # full nulls
    assert dml["db"] and len(dml["xid"]) == 16  # reversed hex16 of packed xid
    # native header trio from the preset: message identity, begin/end scn,
    # per-DML scn/tm, begin/end tm, usr from session attributes
    assert dml["c_scn"] == dml["e_scn"] and dml["c_idx"] == 2
    assert dml["b_scn"] <= dml["scn"] <= dml["e_scn"]
    assert dml["b_tm"] <= dml["tm"] <= dml["e_tm"]
    assert "usr" in dml  # USER_TYPE::DEBEZIUM (null: no login attr set)
    begin = next(m for m in msgs if m["payload"][0]["op"] == "begin")
    assert begin["c_idx"] == 1 and "scn" in begin and "b_scn" in begin


def test_format_message_full_on_protobuf_wire(spark, tmpdir_path):
    """format {type: protobuf, message: 1} (MESSAGE_FORMAT::FULL): the
    spool carries one multi-payload RedoResponse per transaction and a
    chained replica still converges to the source state."""
    from openlogreplicator_spark.functions.protobuf_output import (
        decode_message,
    )
    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.sources.network import read_spool_messages
    from openlogreplicator_spark.sources.protobuf_feed import (
        read_protobuf_feed,
    )
    from openlogreplicator_spark.streaming.apply import apply_epoch
    from openlogreplicator_spark.streaming.job import create_target

    fb = FeedBuilder()
    t = fb.begin(attrs={"login username": "USER1"})   # 3-op transaction
    t.ins("c1", 0, role="user", text="q")
    t.ins("c1", 1, role="assistant", text="a")
    t.upd("c1", 0, text="q2")
    fb.commit(t)
    t = fb.begin()                                    # 1-op transaction
    t.ins("c2", 0, role="user", text="solo")
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"),
        writer={"type": "network", "uri": "127.0.0.1:0"},
    )
    cfg["source"][0]["format"] = {"type": "protobuf", "message": 1}
    table = run_from_config(spark, cfg)
    srv = getattr(table, "network_server", None)
    assert srv is not None
    try:
        frames = list(read_spool_messages(srv.spool_dir))
        counts = [len(decode_message(m).get(9, [])) for _, _, m in frames]
        # FULL mode: at least one frame packs >1 op; every op rides SOME
        # frame (total payloads == committed DML+DDL op count)
        assert max(counts) > 1

        replica_path = os.path.join(tmpdir_path, "replica")
        create_target(spark, replica_path, n_buckets=4)
        apply_epoch(
            LakeTable(spark, replica_path),
            read_protobuf_feed(spark, srv.spool_dir), 0, job_id="chain")
        src = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
        got = {(r.conv_id, r.turn_idx): r.text
               for r in LakeTable(spark, replica_path).read().collect()}
        assert got == src and src
    finally:
        srv.stop()
