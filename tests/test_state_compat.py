"""Reference state-directory compatibility (checkpoint files).

Covers both migration directions: import (resume_position mirrors
Metadata::readCheckpoints + the deserializer's min-tran preference) and
export (checkpoint_doc emits the strict SerializerJson vocabulary so the
reference can load the file back), plus the config-layer lifecycle:
resume gate on run, frontier export after a bounded drain, keep-
checkpoints pruning.
"""

import json
import os

import pytest

from openlogreplicator_spark.state_compat import (
    checkpoint_doc,
    delete_old_checkpoints,
    list_checkpoints,
    read_reference_checkpoint,
    resume_position,
    synthesize_dictionary,
    write_reference_checkpoint,
)

# The reference's strict top-level vocabulary (SerializerJson.cpp:570-616,
# checkJsonFields rejects any name outside this list).
_ALLOWED = {
    "activation", "big-endian", "con-id", "con-name", "context", "database",
    "db-block-checksum", "db-id", "db-recovery-file-dest", "db-timezone",
    "incarnations", "log-archive-dest", "log-archive-format", "min-tran",
    "nls-character-set", "nls-nchar-character-set", "offset", "online-redo",
    "resetlogs", "schema-ref-scn", "schema-scn", "scn", "seq",
    "supp-log-db-all", "supp-log-db-primary", "sys-ccol", "sys-cdef",
    "sys-col", "sys-deferredstg", "sys-ecol", "sys-lob", "sys-lob-comp-part",
    "sys-lob-frag", "sys-obj", "sys-tab", "sys-tabcompart", "sys-tabpart",
    "sys-tabsubpart", "sys-ts", "sys-user", "threads", "time", "users",
    "xdb-ttset",
}
# Required by the deserializer's unconditional getJsonField walk
# (SerializerJson.cpp:622-800, loadMetadata + loadSchema, schema stored).
_REQUIRED = {
    "database", "scn", "seq", "offset", "resetlogs", "activation",
    "big-endian", "context", "db-id", "con-id", "con-name",
    "db-recovery-file-dest", "db-block-checksum", "log-archive-format",
    "log-archive-dest", "nls-character-set", "nls-nchar-character-set",
    "supp-log-db-primary", "supp-log-db-all", "online-redo", "incarnations",
    "users", "schema-scn", "sys-user", "sys-obj", "sys-col", "sys-ccol",
    "sys-cdef", "sys-deferredstg", "sys-ecol", "sys-lob",
    "sys-lob-comp-part", "sys-lob-frag", "sys-tab", "sys-tabpart",
    "sys-tabcompart", "sys-tabsubpart", "sys-ts",
}

_TABLES = [("USR1", "transcripts",
            [("conv_id", "string"), ("turn_idx", "int"),
             ("role", "string"), ("ts", "timestamp")])]


# A checkpoint file the REFERENCE ITSELF wrote (its Oracle-Free-23 e2e
# fixture) — the strongest import-parity evidence: not our synthesis, the
# real artifact with the full SYS dictionary (411 sys-col rows), xdb-*
# packs, and an untracked-by-us NUMBER column (ID, no precision).
_REAL_CHKPT = ("/root/reference/tests/fixtures/schema/example-free-23/"
               "TEST-chkpt-2266634.json")


@pytest.mark.skipif(not os.path.exists(_REAL_CHKPT),
                    reason="reference fixture not present")
def test_import_genuine_reference_checkpoint(tmpdir_path):
    """resume_position + tables_from_checkpoint over the reference's own
    TEST-chkpt-2266634.json (written by SerializerJson::serialize against
    a real Oracle Free 23 database, not by us)."""
    import shutil

    from openlogreplicator_spark.state_compat import tables_from_checkpoint

    state = os.path.join(tmpdir_path, "state")
    os.makedirs(state)
    shutil.copy(_REAL_CHKPT, os.path.join(state, "TEST-chkpt-2266634.json"))

    assert list_checkpoints(state, "TEST") == [2266634]
    pos = resume_position(state, "TEST")
    assert pos["scn"] == 2266634 and pos["seq"] == 0
    assert pos["min_xid"] is None          # fixture has no min-tran section

    tabs = {t: (o, cols) for o, t, cols in pos["tables"]}
    # the user table, with Oracle NUMBER (no precision) -> double, and
    # VARCHAR2 -> string, ordered by seg-col
    assert tabs["TEST_CDC"] == ("OLR_TEST",
                                [("ID", "double"), ("NAME", "string")])
    # the dictionary's own SYS tables ride along (type 2 objects) — the
    # config layer excludes them via the job's tracked pattern, the same
    # way the reference routes SYS.% through system-object handling
    assert "OBJ$" in tabs and "COL$" in tabs
    import re
    assert [t for t in tabs if re.match(r"^(TEST_CDC)$", t)] == ["TEST_CDC"]


def test_doc_matches_reference_vocabulary():
    doc = checkpoint_doc("DB1", 5000, 7, tables=_TABLES)
    assert set(doc) <= _ALLOWED
    assert _REQUIRED <= set(doc)
    # nested shapes the reference validates: 2-element IntX arrays,
    # 18-char rowids, 1-based seg-col/int-col
    for row in doc["sys-col"]:
        assert len(row["row-id"]) == 18 and len(row["property"]) == 2
        assert row["col"] == row["seg-col"] == row["int-col"] >= 1
    for row in doc["sys-obj"]:
        assert len(row["flags"]) == 2 and row["type"] == 2
    assert doc["users"] == ["USR1"]
    assert doc["schema-scn"] == 5000
    # type mapping: VARCHAR2=1, NUMBER=2, TIMESTAMP=180
    by_name = {r["name"]: r["type"] for r in doc["sys-col"]}
    assert by_name == {"conv_id": 1, "turn_idx": 2, "role": 1, "ts": 180}


def test_doc_schema_ref_variant_and_offset_check():
    doc = checkpoint_doc("DB1", 6000, 8, schema_ref_scn=5000)
    assert doc["schema-ref-scn"] == 5000 and "sys-col" not in doc
    with pytest.raises(ValueError):
        checkpoint_doc("DB1", 1, 1, offset=100)  # not a 512 multiple


def test_dictionary_is_deterministic():
    assert synthesize_dictionary(_TABLES) == synthesize_dictionary(_TABLES)


def test_resume_position_selection(tmpdir_path):
    d = tmpdir_path
    for scn in (100, 300, 500):
        write_reference_checkpoint(d, checkpoint_doc("DB1", scn, scn // 100,
                                                     tables=_TABLES))
    # unrelated database + junk files are ignored
    write_reference_checkpoint(d, checkpoint_doc("OTHER", 900, 9,
                                                 tables=_TABLES))
    open(os.path.join(d, "DB1-chkpt-junk.json"), "w").write("{}")

    assert list_checkpoints(d, "DB1") == [100, 300, 500]
    assert resume_position(d, "DB1")["scn"] == 500          # newest wins
    assert resume_position(d, "DB1", start_scn=350)["scn"] == 300  # bounded
    assert resume_position(d, "DB1", start_scn=50) is None
    assert resume_position(os.path.join(d, "missing"), "DB1") is None


def test_resume_prefers_min_tran_position(tmpdir_path):
    doc = checkpoint_doc(
        "DB2", 800, 9, tables=_TABLES,
        min_tran={"thread": 1, "seq": 4, "offset": 1024,
                  "xid": "0x0001.002.00000003"})
    write_reference_checkpoint(tmpdir_path, doc)
    pos = resume_position(tmpdir_path, "DB2")
    # redo reading restarts at the oldest in-flight txn's seq/offset
    # (SerializerJson.cpp:624-632) while the data gate stays at scn
    assert {k: pos[k] for k in ("scn", "seq", "offset", "min_xid",
                                "threads")} == {
        "scn": 800, "seq": 4, "offset": 1024,
        "min_xid": "0x0001.002.00000003", "threads": []}
    assert pos["tables"] == _TABLES  # inline schema imported


def test_schema_round_trip_and_ref_chase(tmpdir_path):
    from openlogreplicator_spark.state_compat import tables_from_checkpoint

    tables = [("USR1", "wide",
               [("conv_id", "string"), ("turn_idx", "int"),
                ("n_long", "long"), ("x_double", "double"),
                ("d", "date"), ("ts", "timestamp"), ("raw", "binary")])]
    # export -> import preserves every Spark type (int/long ride
    # NUMBER(10)/NUMBER(19) precision like Oracle DDL would)
    doc = checkpoint_doc("DB4", 100, 1, tables=tables)
    assert tables_from_checkpoint(doc) == tables

    # a later checkpoint referencing the schema-storing one is chased
    # for the dictionary (Metadata::readCheckpoint two-file read)
    write_reference_checkpoint(tmpdir_path, doc)
    write_reference_checkpoint(
        tmpdir_path, checkpoint_doc("DB4", 200, 2, schema_ref_scn=100))
    pos = resume_position(tmpdir_path, "DB4")
    assert pos["scn"] == 200 and pos["tables"] == tables


def test_delete_old_checkpoints_keeps_schema_anchor(tmpdir_path):
    d = tmpdir_path
    # oldest stores schema; the rest only reference it
    write_reference_checkpoint(d, checkpoint_doc("DB3", 100, 1,
                                                 tables=_TABLES))
    for scn in (200, 300, 400, 500):
        write_reference_checkpoint(
            d, checkpoint_doc("DB3", scn, scn // 100, schema_ref_scn=100))
    dropped = delete_old_checkpoints(d, "DB3", keep=2)
    # newest 2 kept (500, 400); walking older files, the first
    # schema-storing one (100) anchors — only files BEYOND it drop.
    # 300 and 200 are ref-only but sit before the anchor is found, so
    # they are retained too: nothing beyond the anchor exists -> no drop.
    # (Metadata::deleteOldCheckpoints walks the same way.)
    assert dropped == [] and list_checkpoints(d, "DB3") == [100, 200, 300,
                                                            400, 500]
    # a schema-storing file BELOW the keep horizon anchors retention:
    # older ref-only files beyond it drop
    write_reference_checkpoint(d, checkpoint_doc("DB3", 600, 6,
                                                 tables=_TABLES))
    write_reference_checkpoint(
        d, checkpoint_doc("DB3", 700, 7, schema_ref_scn=600))
    dropped = delete_old_checkpoints(d, "DB3", keep=2)
    # walk: 700 kept (num<2), 600 = first at horizon AND stores schema
    # -> anchor; everything older (500..100) drops
    assert set(dropped) == {100, 200, 300, 400, 500}
    assert list_checkpoints(d, "DB3") == [600, 700]


# ---------------------------------------------------------------------------
# Config-layer lifecycle (Spark)
# ---------------------------------------------------------------------------

def _cfg(feed_dir, state_dir):
    return {
        "version": "1.9.0",
        "state": {"path": state_dir},
        "source": [{
            "alias": "S1", "name": "TESTDB",
            "reader": {"type": "batch", "redo-log": [feed_dir]},
            "format": {"type": "json"},
        }],
        "target": [{"alias": "T1", "source": "S1",
                    "writer": {"type": "discard"}}],
    }


def test_config_exports_then_resumes_from_checkpoint(spark, tmpdir_path):
    """Run 1 exports the applied frontier as a reference checkpoint; a
    later run over the SAME state dir (fresh lake) gates out everything
    at or below that scn — the migration loop closed end-to-end."""
    from openlogreplicator_spark.config import run_from_config
    from openlogreplicator_spark.feedgen import FeedBuilder

    feed_dir = os.path.join(tmpdir_path, "feed")
    state = os.path.join(tmpdir_path, "state")

    fb = FeedBuilder()
    t = fb.begin(); t.ins("c1", 0, role="user", text="old"); fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    t1 = run_from_config(spark, _cfg(feed_dir, state))
    assert {r.conv_id for r in t1.read().collect()} == {"c1"}

    scns = list_checkpoints(state, "TESTDB")
    assert len(scns) == 1 and scns[0] > 0
    doc = read_reference_checkpoint(state, "TESTDB", scns[0])
    assert set(doc) <= _ALLOWED and _REQUIRED <= set(doc)
    assert doc["seq"] == 0  # highest seq=N feed file (naming contract)
    assert {r["name"] for r in doc["sys-col"]} >= {"conv_id", "turn_idx",
                                                   "role", "text"}

    # new activity after the checkpoint
    fb.new_seq()
    t = fb.begin(); t.ins("c2", 0, role="user", text="new"); fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    # fresh lake, same state dir: only post-checkpoint data applies —
    # proof the resume GATE (not the lake ledger) did the skipping
    t2 = run_from_config(spark, _cfg(feed_dir, state),
                         table_path=os.path.join(tmpdir_path, "lake2"))
    assert {r.conv_id for r in t2.read().collect()} == {"c2"}

    # run 2 advanced the frontier -> a second checkpoint file appears
    scns2 = list_checkpoints(state, "TESTDB")
    assert len(scns2) == 2 and scns2[-1] > scns[0]
    assert read_reference_checkpoint(state, "TESTDB", scns2[-1])["seq"] == 1

    # idempotent: draining again with no new data neither applies rows
    # nor writes a duplicate checkpoint
    t3 = run_from_config(spark, _cfg(feed_dir, state),
                         table_path=os.path.join(tmpdir_path, "lake3"))
    assert t3.read().count() == 0
    assert list_checkpoints(state, "TESTDB") == scns2


def test_resume_continues_existing_lake_without_loss(spark, tmpdir_path):
    """Re-running the config against the SAME lake resumes it: the new
    slice merges as a fresh scn-keyed epoch instead of the batch mode's
    rebuilding overwrite, so pre-checkpoint rows survive."""
    from openlogreplicator_spark.config import run_from_config
    from openlogreplicator_spark.feedgen import FeedBuilder

    feed_dir = os.path.join(tmpdir_path, "feed")
    state = os.path.join(tmpdir_path, "state")

    fb = FeedBuilder()
    t = fb.begin(); t.ins("c1", 0, role="user", text="old"); fb.commit(t)
    fb.write_parquet(spark, feed_dir)
    run_from_config(spark, _cfg(feed_dir, state))

    fb.new_seq()
    t = fb.begin(); t.ins("c2", 0, role="user", text="new"); fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    t2 = run_from_config(spark, _cfg(feed_dir, state))  # same default lake
    assert {(r.conv_id, r.text) for r in t2.read().collect()} == {
        ("c1", "old"), ("c2", "new")}

    # and draining again with nothing new changes nothing
    t3 = run_from_config(spark, _cfg(feed_dir, state))
    assert t3.read().count() == 2


def test_schema_import_precreates_table(spark, tmpdir_path):
    """A reference-written checkpoint whose SYS dictionary carries an
    extra column shapes the created lake table — the migration brings
    the schema along, not just the position."""
    from openlogreplicator_spark.config import run_from_config
    from openlogreplicator_spark.feedgen import FeedBuilder
    from openlogreplicator_spark.state_compat import (
        checkpoint_doc as _doc, write_reference_checkpoint as _write)

    feed_dir = os.path.join(tmpdir_path, "feed")
    state = os.path.join(tmpdir_path, "state")
    os.makedirs(state)
    cols = [("conv_id", "string"), ("turn_idx", "int"), ("role", "string"),
            ("text", "string"), ("extra", "string")]
    _write(state, _doc("TESTDB", 1, 0,
                       tables=[("USR1", "transcripts", cols)]))

    fb = FeedBuilder(image_columns=["role", "text", "extra"],
                     columns=["role", "text", "extra"])
    t = fb.begin()
    t.ins("c9", 0, role="user", text="hi", extra="payload")
    fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    tbl = run_from_config(spark, _cfg(feed_dir, state))
    assert "extra" in tbl.value_names  # imported schema defined it
    rows = tbl.read().collect()
    assert len(rows) == 1 and rows[0].extra == "payload"


def test_explicit_start_scn_overrides_checkpoint(spark, tmpdir_path):
    """reader.start-scn in the config wins over the state dir — the
    reference's startScn parameter takes priority the same way."""
    from openlogreplicator_spark.config import run_from_config
    from openlogreplicator_spark.feedgen import FeedBuilder

    feed_dir = os.path.join(tmpdir_path, "feed")
    state = os.path.join(tmpdir_path, "state")
    os.makedirs(state)
    # a checkpoint claiming everything is applied
    write_reference_checkpoint(
        state, checkpoint_doc("TESTDB", 10**15, 99, tables=_TABLES))

    fb = FeedBuilder()
    t = fb.begin(); t.ins("c1", 0, role="user", text="x"); fb.commit(t)
    fb.write_parquet(spark, feed_dir)

    cfg = _cfg(feed_dir, state)
    cfg["source"][0]["reader"]["start-scn"] = 0
    tbl = run_from_config(spark, cfg)
    assert tbl.read().count() == 1  # checkpoint ignored, scn>=0 gate used
