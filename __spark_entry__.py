"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator from SURVEY.md §2 (or a
training-data-pipeline operator), runnable on the driver-generated parquet
tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.  The CDC
operators are exercised by DERIVING a change feed from the ``events`` table
with a deterministic, SQL-expressible mapping, so the engine's distributed
implementation is differentially tested against an independent sequential
SQL formulation — the same strategy as the reference's LogMiner comparison
(/root/reference/tests/sql/scripts/compare.py).

Derived-feed mapping (shared by Spark and the oracle):
    op:   signup → ins, error → del, else upd
    key:  (conv_id = 'u'||user_id, turn_idx = (props.k)::int % 4)
    ord:  event_id (globally unique, monotone)
    ins sets {role=event_type, text=props};  upd sets {text=props};  del removes.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Derived CDC feed over the `events` table
# ---------------------------------------------------------------------------

def _derived_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _load(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", "ins")
        .when(F.col("event_type") == "error", "del")
        .otherwise("upd")
    )
    return ev.select(
        F.col("event_id"),
        F.col("user_id"),
        op.alias("op"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.get_json_object("props", "$.k").cast("int") % 4).alias("turn_idx"),
        F.col("event_type"),
        F.col("props"),
        F.col("ts"),
    )


def _derived_feed(
    spark: SparkSession,
    sf_dir: str,
    multi_table: bool = False,
    rac_ddl_cut: int | None = None,
) -> DataFrame:
    """Full change-event feed (begin/dml/commit per source event) in the
    engine's wire schema — single-op auto-commit transactions.

    ``multi_table``: route each user's ops to one of TWO tracked tables
    (user_id parity) — the multi-table replication shape (reference fixture
    tests/sql/inputs/multi-table.sql).

    ``rac_ddl_cut``: the rac-ddl-cross-node shape (reference fixture
    tests/sql/inputs/rac-ddl-cross-node.rac.sql): events spread across TWO
    shards (user_id parity — the RAC nodes), an ``ADD COLUMN meta`` DDL
    txn committed on shard 0 at the event-id cut, and every post-cut DML
    (from BOTH shards, i.e. new-schema DML crossing the node that ran the
    DDL) sets the new column to its event_type.  The scn stride widens to
    4 so the DDL txn owns the free slot at cut*4+3 — strictly between the
    last pre-cut commit (cut*4+2) and the first post-cut begin (cut*4+4)."""
    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA

    ops = _derived_ops(spark, sf_dir)
    if multi_table:
        ops = ops.withColumn(
            "_tbl",
            F.when(F.col("user_id") % 2 == 0, "transcripts").otherwise("summaries"),
        )
    else:
        ops = ops.withColumn("_tbl", F.lit("transcripts"))
    base = ops.select(
        F.col("event_id"),
        F.col("user_id"),
        F.col("op"),
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("event_type"),
        F.col("props"),
        F.col("ts"),
        F.col("_tbl"),
    )
    stride = 3 if rac_ddl_cut is None else 4
    post = (
        F.lit(False) if rac_ddl_cut is None else F.col("event_id") > rac_ddl_cut
    )
    shard = (
        F.lit(0) if rac_ddl_cut is None else (F.col("user_id") % 2).cast("int")
    )

    def row(kind: str):
        scn = F.col("event_id") * stride + {"begin": 0, "dml": 1, "commit": 2}[kind]
        is_dml = kind == "dml"
        is_commit = kind == "commit"
        sets_meta = F.lit(is_dml) & post & F.col("op").isin("ins", "upd")
        after = F.when(
            F.lit(is_dml) & F.col("op").isin("ins", "upd"),
            F.struct(
                F.when(F.col("op") == "ins", F.col("event_type")).alias("role"),
                F.col("props").alias("text"),
                F.lit(None).cast("string").alias("tool"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.when(sets_meta, F.col("event_type")).alias("meta"),
            ),
        )
        changed = (
            F.when(
                F.lit(is_dml) & (F.col("op") == "ins") & post,
                F.array(F.lit("role"), F.lit("text"), F.lit("meta")),
            )
            .when(
                F.lit(is_dml) & (F.col("op") == "ins"),
                F.array(F.lit("role"), F.lit("text")),
            )
            .when(
                F.lit(is_dml) & (F.col("op") == "upd") & post,
                F.array(F.lit("text"), F.lit("meta")),
            )
            .when(F.lit(is_dml) & (F.col("op") == "upd"), F.array(F.lit("text")))
        )
        return base.select(
            scn.alias("lsn"),
            shard.alias("shard"),
            F.lit(0).cast("long").alias("seq"),
            scn.alias("scn"),
            F.when(F.lit(is_commit), scn).alias("commit_scn"),
            F.concat(F.lit("x"), F.col("event_id")).alias("xid"),
            F.lit({"begin": 0, "dml": 1, "commit": 2}[kind]).alias("seq_in_txn"),
            (F.lit(kind) if kind != "dml" else F.col("op")).alias("op"),
            F.when(F.lit(is_dml), F.col("_tbl")).alias("table_name"),
            F.when(F.lit(is_dml), F.col("conv_id")).alias("conv_id"),
            F.when(F.lit(is_dml), F.col("turn_idx")).alias("turn_idx"),
            F.lit(None).cast("struct<role:string,text:string,tool:string,ts:timestamp,meta:string>").alias("before"),
            after.alias("after"),
            changed.alias("changed_cols"),
            F.lit(None).cast("int").alias("chunk_no"),
            F.lit(None).cast("string").alias("chunk_text"),
            post.cast("int").alias("schema_version"),
            F.lit(None).cast("string").alias("ddl_stmt"),
            F.col("ts"),
            F.lit(None).cast("map<string,string>").alias("attrs"),
        )

    _ = CHANGE_EVENT_SCHEMA  # wire shape documented there
    feed = row("begin").unionByName(row("dml")).unionByName(row("commit"))
    if rac_ddl_cut is None:
        return feed
    # the DDL transaction itself: begin/ddl/commit on shard 0 at the cut
    ddl_scn = rac_ddl_cut * 4 + 3
    one = spark.range(1)

    def ddl_row(kind: str, seq_in_txn: int):
        return one.select(
            F.lit(ddl_scn).alias("lsn"),
            F.lit(0).alias("shard"),
            F.lit(0).cast("long").alias("seq"),
            F.lit(ddl_scn).cast("long").alias("scn"),
            (F.lit(ddl_scn) if kind == "commit" else F.lit(None)).cast("long").alias("commit_scn"),
            F.lit("xddl").alias("xid"),
            F.lit(seq_in_txn).alias("seq_in_txn"),
            F.lit(kind).alias("op"),
            (F.lit("transcripts") if kind == "ddl" else F.lit(None)).cast("string").alias("table_name"),
            F.lit(None).cast("string").alias("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit(None).cast("struct<role:string,text:string,tool:string,ts:timestamp,meta:string>").alias("before"),
            F.lit(None).cast("struct<role:string,text:string,tool:string,ts:timestamp,meta:string>").alias("after"),
            F.lit(None).cast("array<string>").alias("changed_cols"),
            F.lit(None).cast("int").alias("chunk_no"),
            F.lit(None).cast("string").alias("chunk_text"),
            F.lit(0).alias("schema_version"),
            (F.lit("ADD COLUMN meta string") if kind == "ddl" else F.lit(None)).cast("string").alias("ddl_stmt"),
            F.lit(None).cast("timestamp").alias("ts"),
            F.lit(None).cast("map<string,string>").alias("attrs"),
        )

    return (
        feed.unionByName(ddl_row("begin", 0))
        .unionByName(ddl_row("ddl", 1))
        .unionByName(ddl_row("commit", 2))
    )


_ORACLE_DERIVED = """
WITH ev AS (
  SELECT event_id,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS turn_idx,
         CASE WHEN event_type = 'signup' THEN 'ins'
              WHEN event_type = 'error' THEN 'del'
              ELSE 'upd' END AS op,
         event_type, props, ts
  FROM events
)
"""

# multi-table variant: each user's ops route to one of two tracked tables
_ORACLE_DERIVED_MT = """
WITH ev AS (
  SELECT event_id,
         CASE WHEN user_id % 2 = 0 THEN 'transcripts' ELSE 'summaries' END AS tbl,
         'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS turn_idx,
         CASE WHEN event_type = 'signup' THEN 'ins'
              WHEN event_type = 'error' THEN 'del'
              ELSE 'upd' END AS op,
         event_type, props, ts
  FROM events
)
"""


# ---------------------------------------------------------------------------
# CDC operator queries (SURVEY.md §2) — Spark side
# ---------------------------------------------------------------------------

def q_s6_cdc_replay_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full engine path (assemble → prollback match → collapse)
    over the derived feed; final table state (target starts empty).
    Exercises S6/T1-T4/T7-T9/T11/P3."""
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes

    feed = _derived_feed(spark, sf_dir)
    parts = assemble_transactions(feed)
    survivors = match_partial_rollbacks(parts["committed"])
    dml = survivors.filter(F.col("op").isin("ins", "upd", "del"))
    net = collapse_net_changes(dml, ["role", "text", "tool", "ts"])
    return net.filter(~F.col("is_delete")).select(
        "conv_id",
        "turn_idx",
        F.col("vals").getField("role").alias("role"),
        F.col("vals").getField("text").alias("text"),
    )


def q_d4_time_travel_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4/time travel — the checkpoint refScn-chain analog (reference:
    src/metadata/Metadata.cpp:586-613 keeps snapshot history so a late
    client restarts from an older confirmed position): the derived feed is
    applied in TWO epochs split at the event-id midpoint through the REAL
    lake sink (apply_epoch → LakeTable), then the table is read AS OF the
    post-epoch-0 snapshot — which must equal a replay of only the first
    half (the DuckDB oracle replays events with event_id <= max//2)."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    max_id = _load(spark, sf_dir, "events").agg(F.max("event_id").alias("m")).first()["m"]
    cut = int(max_id) // 2
    eid = F.substring(F.col("xid"), 2, 100).cast("long")  # xid = 'x' || event_id

    path = tempfile.mkdtemp(prefix="olr-tt-")
    table = LakeTable.create(
        spark, path,
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    apply_epoch(table, feed.filter(eid <= cut), 0, job_id="tt")
    v0 = table.manifest["version"]
    apply_epoch(table, feed.filter(eid > cut), 1, job_id="tt")
    return table.read(version=v0).select("conv_id", "turn_idx", "role", "text")


def q_d4_catalog_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 lifted to the CATALOG: the derived feed applies in two epochs
    through the multi-table path; ``Catalog.read_as_of(0)`` must return
    the transcripts table exactly as epoch 0's fence left it — the
    transactionally consistent cross-table snapshot (every table pinned
    to its own version_as_of under the one epoch fence).  Same oracle as
    the table-level time travel: DuckDB replays events with
    event_id <= max//2."""
    import tempfile

    from openlogreplicator_spark.lake.catalog import Catalog
    from openlogreplicator_spark.streaming.multi import apply_epoch_multi

    feed = _derived_feed(spark, sf_dir)
    max_id = _load(spark, sf_dir, "events").agg(F.max("event_id").alias("m")).first()["m"]
    cut = int(max_id) // 2
    eid = F.substring(F.col("xid"), 2, 100).cast("long")  # xid = 'x' || event_id

    catalog = Catalog.create(spark, tempfile.mkdtemp(prefix="olr-cat-"))
    catalog.create_table("transcripts", n_buckets=8)
    apply_epoch_multi(catalog, feed.filter(eid <= cut), 0, job_id="cat")
    apply_epoch_multi(catalog.refresh(), feed.filter(eid > cut), 1, job_id="cat")
    snap = catalog.refresh().read_as_of(0, job_id="cat")
    return snap["transcripts"].select("conv_id", "turn_idx", "role", "text")


def q_w6_roundtrip_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 + ingress — wire-format fidelity: the derived feed is applied
    through the lake sink WITH the JSON mirror egress (write_json_mirror,
    the WriterFile analog), the mirror is re-ingested by the inverse
    parser (sources/json_feed.read_json_feed — engine chaining, the
    reference's writer→reader network loop) and replayed into a SECOND
    table, whose final state must equal the DuckDB replay oracle: the
    JSON wire format is lossless for CDC state."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.sources.json_feed import read_json_feed
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    mirror = tempfile.mkdtemp(prefix="olr-mr-")
    cols = dict(
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    t1 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-rt1-"), **cols)
    apply_epoch(t1, feed, 0, job_id="rt", json_mirror_dir=mirror)
    t2 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-rt2-"), **cols)
    apply_epoch(t2, read_json_feed(spark, mirror), 0, job_id="rt2")
    return t2.read().select("conv_id", "turn_idx", "role", "text")


_CONFIG_COND = "!([op] == 'd' && [username] == 'user7') && [region] != ''"


def q_f2_config_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 through the CONFIG LANGUAGE — the reference's row-condition
    mini-language (OpenLogReplicator.json filter.table[].condition;
    tokenizer src/common/expression/Expression.cpp:27-143, evaluation
    BoolValue.cpp/StringValue.cpp) translated by
    openlogreplicator_spark.config.translate_condition and evaluated over
    derived rows with an attrs MAP (engine shape).  The oracle evaluates
    the SAME translator's output in column style, so the translation
    semantics themselves — op-char compare, absent attribute = '',
    string equality, ! && || precedence — are what the hash contracts."""
    from openlogreplicator_spark.config import translate_condition

    ev = _load(spark, sf_dir, "events")
    username = F.concat(F.lit("user"), (F.col("user_id") % 100).cast("string"))
    region = F.concat(F.lit("r"), (F.col("user_id") % 5).cast("string"))
    d = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", "del").otherwise("ins").alias("op"),
        # region attribute ABSENT for every third user — exercises the
        # absent-attribute-compares-as-'' rule
        F.when(F.col("user_id") % 3 == 0,
               F.create_map(F.lit("username"), username))
        .otherwise(F.create_map(F.lit("username"), username,
                                F.lit("region"), region)).alias("attrs"),
    )
    kept = d.filter(F.expr(translate_condition(_CONFIG_COND)))
    return kept.select(
        "event_id", "op",
        F.col("attrs")["username"].alias("username"),
        F.col("attrs")["region"].alias("region"),
    )


def q_w6_full_wire_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 format dials — the REFERENCE-shaped wire (MESSAGE_FORMAT::FULL
    txn-grouped payload arrays, COLUMN_FORMAT::CHANGED compact images,
    RID_FORMAT::SKIP; Format.h dials applied by
    functions/json_output.WireFormat) must be as lossless as the default
    shape: mirror written with the dials, re-ingested (payload arrays
    posexploded by sources/json_feed), replayed into a second table —
    same DuckDB replay oracle as w6_roundtrip_state."""
    import tempfile

    from openlogreplicator_spark.functions.json_output import (
        MSG_FULL,
        WireFormat,
    )
    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.sources.json_feed import read_json_feed
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    mirror = tempfile.mkdtemp(prefix="olr-mrf-")
    cols = dict(
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    t1 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-rf1-"), **cols)
    apply_epoch(t1, feed, 0, job_id="rf", json_mirror_dir=mirror,
                json_format=WireFormat(message=MSG_FULL, column=0, rid=0))
    t2 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-rf2-"), **cols)
    apply_epoch(t2, read_json_feed(spark, mirror), 0, job_id="rf2")
    return t2.read().select("conv_id", "turn_idx", "role", "text")


def q_w7_roundtrip_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 + ingress — BINARY wire fidelity: same loop as
    q_w6_roundtrip_state but over the protobuf RedoResponse spool
    (apply_epoch(protobuf_spool_dir=...) egress → sources/protobuf_feed.
    read_protobuf_feed inverse parse → second table).  The byte-level
    proto3 wire format (functions/protobuf_output.py, field numbers from
    the reference's proto/OraProtoBuf.proto) must be lossless for CDC
    state — same DuckDB replay oracle as the JSON wire."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    spool = tempfile.mkdtemp(prefix="olr-pb-")
    cols = dict(
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    t1 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-pb1-"), **cols)
    apply_epoch(t1, feed, 0, job_id="pbrt", protobuf_spool_dir=spool)
    t2 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-pb2-"), **cols)
    apply_epoch(t2, read_protobuf_feed(spark, spool), 0, job_id="pbrt2")
    return t2.read().select("conv_id", "turn_idx", "role", "text")


def q_w7_full_roundtrip_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 MESSAGE_FORMAT::FULL — one multi-payload RedoResponse per
    TRANSACTION on the wire (the reference's format.message=1 dial,
    Format.h:76-84): egress groups each txn's ops JVM-side
    (collect_list/array_sort) into a single response, the ingress fans
    the repeated payloads back out in intra-txn order.  Replaying the
    FULL wire must converge to the identical final state — same DuckDB
    replay oracle as the per-op wire (w7_roundtrip_state)."""
    import tempfile

    from openlogreplicator_spark.functions.json_output import (
        MSG_FULL,
        WireFormat,
    )
    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    spool = tempfile.mkdtemp(prefix="olr-pbf-")
    cols = dict(
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    t1 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-pbf1-"), **cols)
    apply_epoch(t1, feed, 0, job_id="pbfrt", protobuf_spool_dir=spool,
                json_format=WireFormat(message=MSG_FULL))
    t2 = LakeTable.create(spark, tempfile.mkdtemp(prefix="olr-pbf2-"), **cols)
    apply_epoch(t2, read_protobuf_feed(spark, spool), 0, job_id="pbfrt2")
    return t2.read().select("conv_id", "turn_idx", "role", "text")


def q_w2_clustered_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/maintenance — clustered point lookup: the derived feed is
    applied through the REAL lake sink, the table is OPTIMIZEd
    (LakeTable.cluster: range-partitioned rewrite + per-file key zone
    maps in the manifest — the Iceberg OPTIMIZE / data-skipping analog),
    then ``read_for_keys`` serves every conv_id ending in '7' from the
    file-pruned base.  Must equal the replay final state filtered to the
    same keys — proving the skip logic never drops a matching file."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="olr-cl-")
    table = LakeTable.create(
        spark, path,
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    apply_epoch(table, feed, 0, job_id="cl")
    table.cluster()
    keys = [
        r["conv_id"]
        for r in feed.select("conv_id").distinct()
        .filter(F.col("conv_id").like("%7")).collect()
    ]
    return table.read_for_keys(keys).select("conv_id", "turn_idx", "role", "text")


def q_w2_partial_cow_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/maintenance — file-level (partial) copy-on-write: the derived
    feed is split by KEY BAND — every transaction touching a conv_id in
    ['u1','u2') replays in a SECOND epoch after the table is OPTIMIZEd
    (per-key event order is preserved, so the final state must equal the
    one-shot replay).  The late epoch's key range intersects only a
    contiguous slice of each clustered bucket, so zone-map-disjoint base
    files survive the rewrite untouched (lake/table._plan_partial_cow, the
    Iceberg sparse-update analog); this contract proves survivors plus the
    rewritten hot files reassemble the exact oracle state — the partial
    rewrite is invisible to readers."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch

    feed = _derived_feed(spark, sf_dir)
    band = (F.col("conv_id") >= "u1") & (F.col("conv_id") < "u2")
    band_xids = feed.filter(band).select("xid").distinct()
    early = feed.join(band_xids, "xid", "left_anti")
    late = feed.join(band_xids, "xid", "left_semi")
    table = LakeTable.create(
        spark, tempfile.mkdtemp(prefix="olr-pcow-"),
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    apply_epoch(table, early, 0, job_id="pcow")
    table.cluster()
    apply_epoch(table, late, 1, job_id="pcow")
    return table.read().select("conv_id", "turn_idx", "role", "text")


def q_mt_multi_table_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table replication (reference: Schema::buildMaps,
    /root/reference/src/metadata/Schema.h:129-132; fixture
    tests/sql/inputs/multi-table.sql): the derived feed routed to TWO
    tracked tables; each table's final state computed by the shared
    assembly + per-table collapse (streaming/multi.apply_epoch_multi is the
    sink-side twin, exercised by tests/test_multi_table.py)."""
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes

    feed = _derived_feed(spark, sf_dir, multi_table=True)
    parts = assemble_transactions(feed)
    survivors = match_partial_rollbacks(parts["committed"])
    dml = survivors.filter(F.col("op").isin("ins", "upd", "del"))
    outs = []
    for t in ("transcripts", "summaries"):
        net = collapse_net_changes(
            dml.filter(F.col("table_name") == t), ["role", "text", "tool", "ts"]
        )
        outs.append(
            net.filter(~F.col("is_delete")).select(
                F.lit(t).alias("table_name"),
                "conv_id",
                "turn_idx",
                F.col("vals").getField("role").alias("role"),
                F.col("vals").getField("text").alias("text"),
            )
        )
    return outs[0].unionByName(outs[1])


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: nearest-of-8 deterministic coarse centroids buckets the
    corpus; each query probes its 3 nearest centroids (equi-join on cid,
    never all-pairs) — the 10^10-vector scale path; same centroid literals
    embedded in the DuckDB oracle."""
    from openlogreplicator_spark.functions.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return ivf_topk(corpus, queries, k=5, n_centroids=8, n_probe=3, dim=64)


_TRAINED_CENTROIDS: list | None = None


def _trained_ivf_centroids() -> list:
    """Spherical-k-means centroids trained ONCE on a deterministic,
    engine-independent sample (pyarrow + hashlib only) of a FIXED fixture
    (sf0.001 embeddings — always present, tiny).  Fixed-source training
    keeps the centroid literals identical between queries() and
    oracle_sql() at any contract SF; production would train on a sample of
    the live corpus the same way (functions/similarity.py
    train_ivf_centroids docstring)."""
    global _TRAINED_CENTROIDS
    if _TRAINED_CENTROIDS is None:
        from openlogreplicator_spark.functions.similarity import (
            sample_vectors_deterministic,
            train_ivf_centroids,
        )

        sample = sample_vectors_deterministic(
            "/root/testdata/sf0.001/embeddings.parquet", n=1024
        )
        _TRAINED_CENTROIDS = train_ivf_centroids(sample, n_centroids=8, iters=8)
    return _TRAINED_CENTROIDS


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with TRAINED coarse centroids (spherical k-means on a
    deterministic data sample) instead of the md5 pseudo-matrix — the
    production shape for clustered corpora (recall comparison in
    tests/test_ivf_trained.py); same trained literals embedded in the
    DuckDB oracle."""
    from openlogreplicator_spark.functions.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return ivf_topk(corpus, queries, k=5, n_probe=3, dim=64,
                    centroids=_trained_ivf_centroids())


def q_t11_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11 — keyed last-writer-wins dedup over the raw events."""
    from openlogreplicator_spark.functions.dedup import lww_dedup

    ops = _derived_ops(spark, sf_dir)
    last = lww_dedup(ops, ["conv_id", "turn_idx"], ["event_id"])
    return last.select("conv_id", "turn_idx", F.col("event_id").alias("last_event_id"),
                       F.col("event_type").alias("last_event_type"))


def q_t5_partial_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 — savepoint stack matching: 'error' events pop the latest prior
    unpopped non-error event of the same user; return survivors."""
    ev = _load(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.when(F.col("event_type") == "error", F.lit(1)).otherwise(F.lit(-1)).alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    s = F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0))
    min_prev = F.min(s).over(w.rowsBetween(Window.unboundedPreceding, -1))
    d = ev.withColumn("s", s).withColumn("mp", min_prev)
    popped = (F.col("s") - F.col("x")) > F.least(F.lit(0), F.coalesce(F.col("mp"), F.lit(0)))
    return d.filter((F.col("x") == -1) & ~popped).select("user_id", "event_id")


def q_t2_txn_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1-T4 — per-transaction grouping/stats (xid := event_id div 20)."""
    ev = _load(spark, sf_dir, "events")
    g = ev.groupBy(F.floor(F.col("event_id") / 20).cast("long").alias("xid"))
    return g.agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.min("event_id").alias("first_eid"),
        F.max("event_id").alias("last_eid"),
        # exact decimal aggregation (order-independent), then a final cast to
        # double so Spark and DuckDB render the identical IEEE value — decimal
        # *outputs* hash-diverge at the driver even when values are equal
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )


def q_t7_commit_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7/P1 — ordered emission: global sequence per user by (ts, event_id)
    (the LWN heap-sort analog as a window)."""
    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).alias("seq_no")
    )


def q_t9_op_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 — op-type coalescing per key: net op from first/last ops
    (INSERT+DELETE→none, else last op wins; Transaction.cpp:435-449)."""
    ops = _derived_ops(spark, sf_dir)
    g = ops.groupBy("conv_id", "turn_idx").agg(
        F.min_by("op", "event_id").alias("first_op"),
        F.max_by("op", "event_id").alias("last_op"),
    )
    net = (
        F.when((F.col("first_op") == "ins") & (F.col("last_op") == "del"), "none")
        .when(F.col("last_op") == "del", "del")
        .when(F.col("first_op") == "ins", "ins")
        .otherwise("upd")
    )
    return g.select("conv_id", "turn_idx", net.alias("net_op"))


def q_p9_chunk_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — LOB-style ordered reassembly: concat event_type per user in
    (ts, event_id) order (collect_list + array_sort + fold)."""
    ev = _load(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", F.col("event_type").alias("t")))
            ),
            F.lit(""),
            lambda acc, r: F.concat(acc, F.lit("|"), r["t"]),
        ).alias("event_chain")
    )
    return agg


def q_f2_condition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 — expression-language row filter (Expression.cpp analog)."""
    from openlogreplicator_spark.operators.filters import condition_filter

    ev = _load(spark, sf_dir, "events")
    out = condition_filter(ev, "event_type != 'error' AND value > 150.0")
    # raw double passthrough — identical parquet value on both sides
    return out.select("event_id", "user_id", "event_type", "value")


def q_f1_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 — regex table selection analog over event_type."""
    ev = _load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").rlike("^(click|view)$"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SKIP_XIDS = [f"x{i * 37}" for i in range(50)]
_F6_START_LSN = {0: 2000, 1: 5000, 2: 0, 3: 7500}


def q_f2_attrs_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 over SESSION ATTRIBUTES (reference: opcodes 5.19/5.20 session
    info feeding `[login username]`-style condition expressions,
    src/parser/OpCode0513.h): build the attrs map column the feed schema
    carries and filter on a map lookup through the same condition_filter
    path the engine uses."""
    from openlogreplicator_spark.operators.filters import condition_filter

    ev = _load(spark, sf_dir, "events")
    d = ev.select(
        "event_id",
        F.create_map(
            F.lit("username"),
            F.concat(F.lit("user"), (F.col("user_id") % 100).cast("string")),
        ).alias("attrs"),
        "event_type",
    )
    out = condition_filter(d, "attrs['username'] = 'user7' AND event_type <> 'error'")
    return out.select(
        "event_id", F.col("attrs")["username"].alias("username"), "event_type"
    )


def q_f3_skip_xid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — drop named transactions (TransactionBuffer.h:87-88)."""
    from openlogreplicator_spark.operators.filters import skip_xid_filter

    ops = _derived_ops(spark, sf_dir).select(
        "event_id", F.concat(F.lit("x"), F.col("event_id")).alias("xid"), "op"
    )
    return skip_xid_filter(ops, _SKIP_XIDS)


def q_f4_shard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — container/conId shard selection (shard := user_id % 4)."""
    from openlogreplicator_spark.operators.filters import shard_filter

    ev = _load(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 4).alias("shard"), "event_type"
    )
    return shard_filter(ev, [1, 3]).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("event_id").alias("max_eid")
    )


def q_f6_lsn_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — per-shard resume-LSN gate (Metadata::isNewData,
    Metadata.cpp:716-727); lsn := event_id, shard := user_id % 4."""
    from openlogreplicator_spark.operators.filters import first_data_lsn_filter

    ev = _load(spark, sf_dir, "events").select(
        (F.col("user_id") % 4).alias("shard"), F.col("event_id").alias("lsn")
    )
    out = first_data_lsn_filter(ev, _F6_START_LSN)
    return out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.min("lsn").alias("min_lsn")
    )


def q_t6_txn_size_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 — oversize transactions dropped whole (ctx->transactionSizeMax,
    Parser.cpp:610-620; engine path streaming/apply.py max_txn_ops):
    xid := user_id, cap = 66 ops (median per-user count, splits at all SFs)."""
    ev = _load(spark, sf_dir, "events").select(
        "event_id", F.col("user_id").alias("xid")
    )
    oversize = (
        ev.groupBy("xid").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 66)
        .select("xid")
    )
    return ev.join(oversize, "xid", "left_anti")


def q_dedup_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster resolution: LSH candidate pairs → connected components →
    (doc_id, rep_id, keep) verdict (completes the dedup pipeline)."""
    from openlogreplicator_spark.functions.dedup import (
        minhash_candidate_pairs,
        resolve_clusters,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, n_hashes=8, n_bands=4)
    return resolve_clusters(pairs, docs)


def q_p4_value_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4/P6 — typed value decode: decimal pinning + JSON field extraction."""
    from openlogreplicator_spark.functions.decode import decode_number, json_field

    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        # decimal pinning is the operator under test; final cast to double for
        # driver-hash-stable output (both engines round ties away from zero)
        decode_number(F.col("value")).cast("double").alias("value_dec"),
        json_field(F.col("props"), "k").cast("int").alias("k"),
    )


def q_p8_xid_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 — XID identity formatting (hex render)."""
    from openlogreplicator_spark.functions.decode import format_xid

    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        format_xid(
            F.col("user_id"), F.col("event_id") % 8, F.col("event_id")
        ).alias("xid_str"),
    )


def q_p7_rowid_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 — rowid surrogate encode: 18 base-64 chars from (dataObj, dba,
    slot) six-bit groups (reference alphabet RowId.h:31-70, layout
    OOOOOOFFFBBBBBBRRR)."""
    from openlogreplicator_spark.functions.decode import encode_rowid

    ev = _load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        encode_rowid(
            F.col("user_id") % 262144,
            F.col("event_id") % 16777216,
            (F.col("event_id") % 4096).cast("long"),
        ).alias("rid"),
    )


def q_w8_lineage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8/§2.8 — per-shard op counters (shard := user_id % 4)."""
    ops = _derived_ops(spark, sf_dir)
    return (
        ops.groupBy((F.col("user_id") % 4).alias("shard"))
        .agg(
            F.max("event_id").alias("last_lsn"),
            F.count(F.when(F.col("op") == "ins", 1)).alias("n_ins"),
            F.count(F.when(F.col("op") == "upd", 1)).alias("n_upd"),
            F.count(F.when(F.col("op") == "del", 1)).alias("n_del"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators
# ---------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.dedup import exact_dedup

    return exact_dedup(_load(spark, sf_dir, "documents"))


def q_dedup_minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.dedup import minhash_bands

    return minhash_bands(_load(spark, sf_dir, "documents"), n_hashes=8, n_bands=4)


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.dedup import minhash_candidate_pairs

    return minhash_candidate_pairs(
        _load(spark, sf_dir, "documents"), n_hashes=8, n_bands=4
    )


def q_dedup_jaccard_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.dedup import (
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = _load(spark, sf_dir, "documents")
    pairs = minhash_candidate_pairs(docs, n_hashes=8, n_bands=4)
    return ngram_jaccard_pairs(docs, pairs, threshold=0.5)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.dedup import simhash

    from openlogreplicator_spark.functions.text import tokens

    docs = _load(spark, sf_dir, "documents")
    # zero-token docs excluded to match the SQL twin (no unnested rows)
    return docs.filter(F.size(tokens(F.col("text"))) > 0).select(
        "doc_id", simhash(F.col("text"), 16).alias("simhash16")
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.text import quality_score, token_count

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        quality_score(F.col("text")).alias("quality"),
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.text import fingerprint

    docs = _load(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.text import lang_id

    docs = _load(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("pred_lang"))


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openlogreplicator_spark.functions.similarity import brute_force_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return brute_force_topk(corpus, queries, k=5)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via hyperplane LSH buckets + multi-probe; planes are
    plan-time literals (same md5 derivation embedded in the DuckDB oracle),
    recall additionally asserted in tests against brute force."""
    from openlogreplicator_spark.functions.similarity import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return lsh_topk(corpus, queries, k=5, n_planes=4, dim=64)


_TRAINED_PQ_BOOKS: list | None = None


def _trained_pq_codebooks() -> list:
    """PQ codebooks (M=8 subspaces × K=16 codewords over dim 64) trained
    ONCE on the same deterministic engine-independent sample as
    :func:`_trained_ivf_centroids` — fixed-source training keeps the
    codebook literals identical between queries() and oracle_sql() at any
    contract SF."""
    global _TRAINED_PQ_BOOKS
    if _TRAINED_PQ_BOOKS is None:
        from openlogreplicator_spark.functions.similarity import (
            sample_vectors_deterministic,
            train_pq_codebooks,
        )

        sample = sample_vectors_deterministic(
            "/root/testdata/sf0.001/embeddings.parquet", n=1024
        )
        _TRAINED_PQ_BOOKS = train_pq_codebooks(
            sample, n_subspaces=8, n_codes=16, iters=8
        )
    return _TRAINED_PQ_BOOKS


def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN: corpus vectors quantized to 8 codes (argmin-L2 against
    trained per-subspace codebooks, plan-time literals), scored by exact
    query vs reconstructed corpus cosine.  The production scan reads ONLY
    the code column (~32× less than the floats; ReadSchema plan-gated in
    tests/test_pq.py); same codebook literals embedded in the DuckDB
    oracle."""
    from openlogreplicator_spark.functions.similarity import pq_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return pq_topk(corpus, queries, _trained_pq_codebooks(), k=5, dim=64)


def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC shortlist (top-4k by quantized score) + EXACT cosine rerank —
    the standard billion-vector serving stack: quantization error only
    costs recall when a true neighbor misses the shortlist (recall lift
    measured in tests/test_pq.py)."""
    from openlogreplicator_spark.functions.similarity import pq_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    return pq_topk(corpus, queries, _trained_pq_codebooks(), k=5, dim=64,
                   rerank=4)


def q_dedup_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucket-scoped self-join (the
    quadratic verifier runs per bucket, never all-pairs); same plane
    literals embedded in the DuckDB oracle."""
    from openlogreplicator_spark.functions.dedup import embedding_near_dups
    from openlogreplicator_spark.functions.similarity import hyperplane_bucket

    emb = _load(spark, sf_dir, "embeddings")
    return embedding_near_dups(
        emb,
        threshold=0.25,
        bucket_col=hyperplane_bucket(F.col("v"), n_planes=4, dim=64),
    )


def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counting over documents — the cheap cost estimator every
    training-data pipeline runs first (pure column expressions)."""
    from openlogreplicator_spark.functions.text import token_count

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length(F.col("text")).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Classical operator inventory evidence (§2.7): agg / join / window / sort
# ---------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact decimal sums, double render (driver-hash-stable)
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            .alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension probe joins — the reference's obj→table dictionary lookups
    (broadcast hash in Spark)."""
    cust = _load(spark, sf_dir, "customer")
    nat = _load(spark, sf_dir, "nation")
    reg = _load(spark, sf_dir, "region")
    j = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return j.groupBy("r_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("sum_acctbal"),
    )


def q_setop_error_only_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set ops — EXCEPT (distinct) + global sort: users who errored
    but never purchased, ordered (the reference's dictionary-set reconcile
    analog)."""
    ev = _load(spark, sf_dir, "events")
    w = ev.filter(F.col("event_id") < 500)  # bounded window so sets differ
    errored = w.filter(F.col("event_type") == "error").select("user_id")
    purchased = w.filter(F.col("event_type") == "purchase").select("user_id")
    return errored.subtract(purchased).orderBy("user_id")  # EXCEPT DISTINCT


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_t13_stateful_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13 (state-store architecture) — the same flagship replay as s6,
    but transaction assembly runs through the applyInPandasWithState
    TransactionBuffer analog (streaming/stateful.py, the reference's
    src/parser/TransactionBuffer.h:54-109 as a bucket-sharded Spark state
    operator): derived feed → bounded stream → stateful assembly →
    collapse → final state.  Hash-contracted against the SAME DuckDB
    oracle as the batch path — the two architectures must agree bit-for-
    bit on the final table."""
    import tempfile
    import uuid

    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.sources.feed import read_feed_stream
    from openlogreplicator_spark.streaming.stateful import assemble_stateful

    tmp = tempfile.mkdtemp(prefix="olr-t13-")
    feed_dir = os.path.join(tmp, "feed")
    _derived_feed(spark, sf_dir).write.parquet(feed_dir)

    name = "t13_emitted_" + uuid.uuid4().hex[:12]
    q = (
        assemble_stateful(read_feed_stream(spark, feed_dir))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name)
    dml = emitted.filter(F.col("op").isin("ins", "upd", "del")).withColumn(
        "after",
        F.from_json(
            "after_json",
            "struct<role:string,text:string,tool:string,ts:timestamp,meta:string>",
        ),
    )
    net = collapse_net_changes(dml, ["role", "text", "tool", "ts"])
    return net.filter(~F.col("is_delete")).select(
        "conv_id",
        "turn_idx",
        F.col("vals").getField("role").alias("role"),
        F.col("vals").getField("text").alias("text"),
    )


def q_rac_ddl_cross_node_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/T7 cross-node DDL fence (reference fixture
    tests/sql/inputs/rac-ddl-cross-node.rac.sql): the derived feed spread
    over TWO shards, an ADD COLUMN DDL committed on shard 0 at the
    event-id midpoint, and post-cut DML from BOTH shards writing the new
    column — all in ONE epoch through the real lake sink.  apply_epoch
    must order the DDL against both shards' DML by commit scn: pre-cut
    rows apply under the old schema (meta NULL), the ALTER applies once,
    post-cut rows land with meta populated.  Oracle: the s6 replay with
    meta = event_type of the last surviving post-cut write per key."""
    import tempfile

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch

    max_id = _load(spark, sf_dir, "events").agg(F.max("event_id").alias("m")).first()["m"]
    cut = int(max_id) // 2
    feed = _derived_feed(spark, sf_dir, rac_ddl_cut=cut)

    path = tempfile.mkdtemp(prefix="olr-racddl-")
    table = LakeTable.create(
        spark, path,
        key_cols=[("conv_id", "string"), ("turn_idx", "int")],
        value_cols=[("role", "string"), ("text", "string"),
                    ("tool", "string"), ("ts", "timestamp")],
        n_buckets=8, overwrite=True,
    )
    apply_epoch(table, feed, 0, job_id="racddl")
    return table.read().select("conv_id", "turn_idx", "role", "text", "meta")


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay (derived feed → assembled transactions →
    net state) on sf0.001."""
    return q_s6_cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s6_cdc_replay_final_state": q_s6_cdc_replay_final_state,
        "w2_clustered_lookup": q_w2_clustered_lookup,
        "w2_partial_cow_state": q_w2_partial_cow_state,
        "w6_roundtrip_state": q_w6_roundtrip_state,
        "w6_full_wire_state": q_w6_full_wire_state,
        "f2_config_condition": q_f2_config_condition,
        "w7_roundtrip_state": q_w7_roundtrip_state,
        "w7_full_roundtrip_state": q_w7_full_roundtrip_state,
        "mt_multi_table_state": q_mt_multi_table_state,
        "d4_time_travel_as_of": q_d4_time_travel_as_of,
        "d4_catalog_as_of": q_d4_catalog_as_of,
        "t13_stateful_final_state": q_t13_stateful_final_state,
        "rac_ddl_cross_node_state": q_rac_ddl_cross_node_state,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_trained": q_ann_ivf_trained,
        "t11_lww_dedup": q_t11_lww_dedup,
        "t5_partial_rollback": q_t5_partial_rollback,
        "t2_txn_group_stats": q_t2_txn_group_stats,
        "t7_commit_order": q_t7_commit_order,
        "t9_op_lattice": q_t9_op_lattice,
        "p9_chunk_reassembly": q_p9_chunk_reassembly,
        "f1_regex_filter": q_f1_regex_filter,
        "f2_condition_filter": q_f2_condition_filter,
        "f2_attrs_condition": q_f2_attrs_condition,
        "f3_skip_xid": q_f3_skip_xid,
        "f4_shard_filter": q_f4_shard_filter,
        "f6_lsn_gate": q_f6_lsn_gate,
        "t6_txn_size_cap": q_t6_txn_size_cap,
        "p4_value_decode": q_p4_value_decode,
        "p8_xid_format": q_p8_xid_format,
        "p7_rowid_encode": q_p7_rowid_encode,
        "w8_lineage_counts": q_w8_lineage_counts,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_bands": q_dedup_minhash_bands,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_jaccard_verify": q_dedup_jaccard_verify,
        "dedup_simhash": q_dedup_simhash,
        "dedup_resolve": q_dedup_resolve,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "text_lang_id": q_text_lang_id,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_pq_adc": q_ann_pq_adc,
        "ann_pq_rerank": q_ann_pq_rerank,
        "dedup_embedding_neardup": q_dedup_embedding_neardup,
        "text_token_count": q_text_token_count,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_broadcast_dims": q_join_broadcast_dims,
        "window_topk_per_group": q_window_topk_per_group,
        "setop_error_only_users": q_setop_error_only_users,
    }


def oracle_sql() -> dict[str, str]:
    from openlogreplicator_spark.functions.similarity import (
        centroid_matrix,
        plane_matrix,
    )
    from openlogreplicator_spark.functions.text import STOPWORDS

    tok = (
        "list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' '),"
        " t -> t <> '')"
    )

    # the SAME plane literals the Spark plan embeds (similarity.plane_matrix)
    planes = plane_matrix(4, 64)

    def _bucket(col: str) -> str:
        terms = []
        for p in range(4):
            lit = "[" + ",".join(repr(w) for w in planes[p]) + "]"
            proj = (
                f"list_sum(list_transform(range(1, 65), i -> "
                f"CAST({col}[i] AS DOUBLE) * ({lit})[i]))"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** p} ELSE 0 END)")
        return "(" + " + ".join(terms) + ")"

    # the SAME centroid literals the Spark ivf_topk plan embeds
    cents = centroid_matrix(8, 64)
    tcents = _trained_ivf_centroids()

    def _cscores_for(cc):
        def f(col: str) -> str:
            terms = []
            for c in range(len(cc)):
                lit = "[" + ",".join(repr(w) for w in cc[c]) + "]"
                terms.append(
                    f"list_sum(list_transform(range(1, 65), i -> "
                    f"CAST({col}[i] AS DOUBLE) * ({lit})[i]))"
                )
            return "[" + ", ".join(terms) + "]"

        return f

    _cscores = _cscores_for(cents)
    _cscores_trained = _cscores_for(tcents)

    def _ivf_sql(csc):
        # shared IVF oracle shape; `csc` builds the 8-centroid score
        # array from either the md5 pseudo-centroids or the TRAINED
        # centroids (same literals the Spark plan embeds)
        return f"""
WITH q0 AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
), c0 AS (
  SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id >= 10
), cs AS (
  SELECT n_id, n_vec, {csc('n_vec')} AS s FROM c0
), cb AS (
  SELECT n_id, n_vec, list_position(s, list_max(s)) AS cid FROM cs
), qs AS (
  SELECT q_id, q_vec, {csc('q_vec')} AS s FROM q0
), q1 AS (
  SELECT q_id, q_vec, s, list_position(s, list_max(s)) AS p1 FROM qs
), q2 AS (
  SELECT q_id, q_vec, p1,
         list_transform(range(1, 9), i -> CASE WHEN i = p1 THEN -1e18 ELSE s[i] END) AS s2
  FROM q1
), q3 AS (
  SELECT q_id, q_vec, p1, s2, list_position(s2, list_max(s2)) AS p2 FROM q2
), q4 AS (
  SELECT q_id, q_vec, p1, p2,
         list_transform(range(1, 9), i -> CASE WHEN i = p2 THEN -1e18 ELSE s2[i] END) AS s3
  FROM q3
), q5 AS (
  SELECT q_id, q_vec, p1, p2, list_position(s3, list_max(s3)) AS p3 FROM q4
), qp AS (
  SELECT q_id, q_vec, unnest([p1, p2, p3]) AS cid FROM q5
), scored AS (
  SELECT qp.q_id, cb.n_id,
    round(
      list_sum(list_transform(range(1, len(cb.n_vec) + 1),
               i -> CAST(cb.n_vec[i] AS DOUBLE) * CAST(qp.q_vec[i] AS DOUBLE)))
      / greatest(
          sqrt(list_sum(list_transform(range(1, len(cb.n_vec) + 1),
               i -> CAST(cb.n_vec[i] AS DOUBLE) * CAST(cb.n_vec[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, len(qp.q_vec) + 1),
               i -> CAST(qp.q_vec[i] AS DOUBLE) * CAST(qp.q_vec[i] AS DOUBLE)))),
          1e-12), 6) AS cos_sim
  FROM cb JOIN qp ON cb.cid = qp.cid
)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored
) WHERE rank <= 5
"""

    # ---- PQ/ADC oracle: the SAME trained codebook literals the Spark
    # pq_encode/pq_reconstruct plans embed.  Score per (subspace, codeword)
    # is list_sum(products) - half_norm — the same association
    # (sum first, then subtract) the Spark expression computes, so
    # near-tie argmins agree bit-for-bit.
    books = _trained_pq_codebooks()
    pq_m = len(books)
    pq_d0 = len(books[0][0])

    def _pq_scores_sel(col: str) -> str:
        cols = []
        for i, book in enumerate(books):
            lo = i * pq_d0
            exprs = []
            for cw in book:
                lit = "[" + ",".join(repr(w) for w in cw) + "]"
                h = repr(0.5 * sum(w * w for w in cw))
                exprs.append(
                    f"(list_sum(list_transform(range(1, {pq_d0 + 1}), j -> "
                    f"CAST({col}[{lo} + j] AS DOUBLE) * ({lit})[j])) - ({h}))"
                )
            cols.append("[" + ", ".join(exprs) + "] AS s" + str(i))
        return ", ".join(cols)

    _pq_code = (
        "["
        + ", ".join(
            f"list_position(s{i}, list_max(s{i}))" for i in range(pq_m)
        )
        + "]"
    )
    _pq_cb_lits = [
        "[" + ",".join("[" + ",".join(repr(w) for w in cw) + "]" for cw in book) + "]"
        for book in books
    ]
    _pq_rec = (
        "flatten(["
        + ", ".join(f"({_pq_cb_lits[i]})[code[{i + 1}]]" for i in range(pq_m))
        + "])"
    )
    _pq_adc = """
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * rec[i]))
      / greatest(
          sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, 65), i -> rec[i] * rec[i]))),
          1e-12), 6)"""
    _pq_base = f"""
WITH q0 AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
), c0 AS (
  SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id >= 10
), cs AS (
  SELECT n_id, {_pq_scores_sel('n_vec')} FROM c0
), cd AS (
  SELECT n_id, {_pq_code} AS code FROM cs
), rc AS (
  SELECT n_id, {_pq_rec} AS rec FROM cd
), scored AS (
  SELECT q0.q_id, rc.n_id, {_pq_adc} AS adc_sim
  FROM rc CROSS JOIN q0
)"""
    _pq_exact_cos = """
    round(
      list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE)))
      / greatest(
          sqrt(list_sum(list_transform(range(1, 65), i -> CAST(q_vec[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(n_vec[i] AS DOUBLE) * CAST(n_vec[i] AS DOUBLE)))),
          1e-12), 6)"""

    def _neardup_cos(a: str, b: str) -> str:
        return f"""
    round(
      list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))
      / greatest(
          sqrt(list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, 65), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))),
          1e-12), 6)"""

    def _sw(lang: str) -> str:
        return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    def _hits(lang: str) -> str:
        return f"len(list_filter({tok}, t -> list_contains({_sw(lang)}, t)))"

    sql = {
        "s6_cdc_replay_final_state": _ORACLE_DERIVED + "\n, st AS (\n  SELECT conv_id, turn_idx,\n         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,\n         max(event_id) AS last_eid\n  FROM ev GROUP BY conv_id, turn_idx\n), last_op AS (\n  SELECT e.conv_id, e.turn_idx, e.op AS last_op\n  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n                      AND e.event_id = s.last_eid\n), surv AS (\n  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n  WHERE e.op <> 'del' AND e.event_id >= s.boundary\n), sv AS (\n  SELECT conv_id, turn_idx, max(event_id) AS me,\n         max(CASE WHEN op = 'ins' THEN event_type END) AS role\n  FROM surv GROUP BY conv_id, turn_idx\n)\nSELECT l.conv_id, l.turn_idx, s.role, e.props AS text\nFROM last_op l\nJOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx\nJOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me\nWHERE l.last_op <> 'del'\n",
        "w2_clustered_lookup": _ORACLE_DERIVED + "\n, st AS (\n  SELECT conv_id, turn_idx,\n         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,\n         max(event_id) AS last_eid\n  FROM ev GROUP BY conv_id, turn_idx\n), last_op AS (\n  SELECT e.conv_id, e.turn_idx, e.op AS last_op\n  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n                      AND e.event_id = s.last_eid\n), surv AS (\n  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n  WHERE e.op <> 'del' AND e.event_id >= s.boundary\n), sv AS (\n  SELECT conv_id, turn_idx, max(event_id) AS me,\n         max(CASE WHEN op = 'ins' THEN event_type END) AS role\n  FROM surv GROUP BY conv_id, turn_idx\n)\nSELECT l.conv_id, l.turn_idx, s.role, e.props AS text\nFROM last_op l\nJOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx\nJOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me\nWHERE l.last_op <> 'del' AND l.conv_id LIKE '%7'\n",
        "w6_roundtrip_state": _ORACLE_DERIVED + "\n, st AS (\n  SELECT conv_id, turn_idx,\n         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,\n         max(event_id) AS last_eid\n  FROM ev GROUP BY conv_id, turn_idx\n), last_op AS (\n  SELECT e.conv_id, e.turn_idx, e.op AS last_op\n  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n                      AND e.event_id = s.last_eid\n), surv AS (\n  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n  WHERE e.op <> 'del' AND e.event_id >= s.boundary\n), sv AS (\n  SELECT conv_id, turn_idx, max(event_id) AS me,\n         max(CASE WHEN op = 'ins' THEN event_type END) AS role\n  FROM surv GROUP BY conv_id, turn_idx\n)\nSELECT l.conv_id, l.turn_idx, s.role, e.props AS text\nFROM last_op l\nJOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx\nJOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me\nWHERE l.last_op <> 'del'\n",
        "w2_partial_cow_state": _ORACLE_DERIVED + "\n, st AS (\n  SELECT conv_id, turn_idx,\n         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,\n         max(event_id) AS last_eid\n  FROM ev GROUP BY conv_id, turn_idx\n), last_op AS (\n  SELECT e.conv_id, e.turn_idx, e.op AS last_op\n  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n                      AND e.event_id = s.last_eid\n), surv AS (\n  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n  WHERE e.op <> 'del' AND e.event_id >= s.boundary\n), sv AS (\n  SELECT conv_id, turn_idx, max(event_id) AS me,\n         max(CASE WHEN op = 'ins' THEN event_type END) AS role\n  FROM surv GROUP BY conv_id, turn_idx\n)\nSELECT l.conv_id, l.turn_idx, s.role, e.props AS text\nFROM last_op l\nJOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx\nJOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me\nWHERE l.last_op <> 'del'\n",
        "d4_time_travel_as_of": _ORACLE_DERIVED.replace("FROM events", "FROM events WHERE event_id <= (SELECT max(event_id) // 2 FROM events)") + "\n, st AS (\n  SELECT conv_id, turn_idx,\n         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,\n         max(event_id) AS last_eid\n  FROM ev GROUP BY conv_id, turn_idx\n), last_op AS (\n  SELECT e.conv_id, e.turn_idx, e.op AS last_op\n  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n                      AND e.event_id = s.last_eid\n), surv AS (\n  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx\n  WHERE e.op <> 'del' AND e.event_id >= s.boundary\n), sv AS (\n  SELECT conv_id, turn_idx, max(event_id) AS me,\n         max(CASE WHEN op = 'ins' THEN event_type END) AS role\n  FROM surv GROUP BY conv_id, turn_idx\n)\nSELECT l.conv_id, l.turn_idx, s.role, e.props AS text\nFROM last_op l\nJOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx\nJOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me\nWHERE l.last_op <> 'del'\n",
        "mt_multi_table_state": _ORACLE_DERIVED_MT + """
, st AS (
  SELECT conv_id, turn_idx,
         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,
         max(event_id) AS last_eid
  FROM ev GROUP BY conv_id, turn_idx
), last_op AS (
  SELECT e.conv_id, e.turn_idx, e.op AS last_op
  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx
                      AND e.event_id = s.last_eid
), surv AS (
  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx
  WHERE e.op <> 'del' AND e.event_id >= s.boundary
), sv AS (
  SELECT conv_id, turn_idx, max(event_id) AS me,
         max(CASE WHEN op = 'ins' THEN event_type END) AS role
  FROM surv GROUP BY conv_id, turn_idx
)
SELECT e.tbl AS table_name, l.conv_id, l.turn_idx, s.role, e.props AS text
FROM last_op l
JOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx
JOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me
WHERE l.last_op <> 'del'
""",
        "ann_ivf_topk": _ivf_sql(_cscores),
        "ann_ivf_trained": _ivf_sql(_cscores_trained),
        "ann_pq_adc": _pq_base + """
SELECT q_id, n_id, adc_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, n_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "ann_pq_rerank": _pq_base + f"""
, sl AS (
  SELECT q_id, n_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_sim DESC, n_id) AS arank
    FROM scored
  ) WHERE arank <= 20
), ex AS (
  SELECT sl.q_id, sl.n_id, {_pq_exact_cos} AS cos_sim
  FROM sl
  JOIN q0 ON q0.q_id = sl.q_id
  JOIN c0 ON c0.n_id = sl.n_id
)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM ex
) WHERE rank <= 5
""",
        "dedup_embedding_neardup": f"""
WITH e AS (
  SELECT vec_id, embedding AS v, {_bucket('embedding')} AS bkt FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_neardup_cos('a.v', 'b.v')} AS cos_sim
FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
WHERE {_neardup_cos('a.v', 'b.v')} >= 0.25
""",
        "text_token_count": f"""
SELECT doc_id, len({tok}) AS n_tokens, length(text) AS n_chars
FROM documents
""",
        "t11_lww_dedup": _ORACLE_DERIVED + """
SELECT conv_id, turn_idx, event_id AS last_event_id, event_type AS last_event_type
FROM (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY event_id DESC) AS rn
  FROM ev
) WHERE rn = 1
""",
        "t5_partial_rollback": """
WITH e AS (
  SELECT user_id, event_id,
         CASE WHEN event_type = 'error' THEN 1 ELSE -1 END AS x
  FROM events
), s1 AS (
  SELECT *,
    sum(x) OVER (PARTITION BY user_id ORDER BY event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM e
), w AS (
  SELECT *,
    min(s) OVER (PARTITION BY user_id ORDER BY event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
  FROM s1
)
SELECT user_id, event_id FROM w
WHERE x = -1 AND NOT ((s - x) > least(0, coalesce(mp, 0)))
""",
        "t2_txn_group_stats": """
SELECT CAST(floor(event_id / 20.0) AS BIGINT) AS xid,
       count(*) AS n_ops,
       min(event_id) AS first_eid,
       max(event_id) AS last_eid,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       count(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
FROM events GROUP BY 1
""",
        "t7_commit_order": """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq_no
FROM events
""",
        "t9_op_lattice": _ORACLE_DERIVED + """
, g AS (
  SELECT conv_id, turn_idx,
         min(event_id) AS fe, max(event_id) AS le
  FROM ev GROUP BY conv_id, turn_idx
), fl AS (
  SELECT g.conv_id, g.turn_idx, ef.op AS first_op, el.op AS last_op
  FROM g
  JOIN ev ef ON ef.conv_id = g.conv_id AND ef.turn_idx = g.turn_idx AND ef.event_id = g.fe
  JOIN ev el ON el.conv_id = g.conv_id AND el.turn_idx = g.turn_idx AND el.event_id = g.le
)
SELECT conv_id, turn_idx,
       CASE WHEN first_op = 'ins' AND last_op = 'del' THEN 'none'
            WHEN last_op = 'del' THEN 'del'
            WHEN first_op = 'ins' THEN 'ins'
            ELSE 'upd' END AS net_op
FROM fl
""",
        "p9_chunk_reassembly": """
SELECT user_id, '|' || string_agg(event_type, '|' ORDER BY ts, event_id) AS event_chain
FROM events GROUP BY user_id
""",
        "f1_regex_filter": """
SELECT event_type, count(*) AS n FROM events
WHERE regexp_matches(event_type, '^(click|view)$')
GROUP BY event_type
""",
        "f2_condition_filter": """
SELECT event_id, user_id, event_type, value
FROM events WHERE event_type <> 'error' AND value > 150.0
""",
        "f2_attrs_condition": """
SELECT event_id, 'user' || CAST(user_id % 100 AS VARCHAR) AS username, event_type
FROM events
WHERE 'user' || CAST(user_id % 100 AS VARCHAR) = 'user7' AND event_type <> 'error'
""",
        "f3_skip_xid": _ORACLE_DERIVED + f"""
SELECT event_id, 'x' || CAST(event_id AS VARCHAR) AS xid, op
FROM ev
WHERE 'x' || CAST(event_id AS VARCHAR) NOT IN ({", ".join(f"'{x}'" for x in _SKIP_XIDS)})
""",
        "f4_shard_filter": """
SELECT (user_id % 4) AS shard, count(*) AS n, max(event_id) AS max_eid
FROM events WHERE (user_id % 4) IN (1, 3)
GROUP BY 1
""",
        "f6_lsn_gate": f"""
WITH g AS (
  SELECT (user_id % 4) AS shard, event_id AS lsn FROM events
)
SELECT shard, count(*) AS n, min(lsn) AS min_lsn FROM g
WHERE NOT ({" OR ".join(f"(shard = {s} AND lsn <= {v})" for s, v in _F6_START_LSN.items())})
GROUP BY shard
""",
        "t6_txn_size_cap": """
SELECT user_id AS xid, event_id FROM events
WHERE user_id NOT IN (
  SELECT user_id FROM events GROUP BY user_id HAVING count(*) > 66
)
""",
        "dedup_resolve": f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(list_distinct({tok})) AS tok FROM documents
), sig AS (
  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS mh
  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, i // 2 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
  FROM sig GROUP BY doc_id, i // 2
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT reach.node, e.dst FROM reach JOIN edges e ON reach.r = e.src
), rep AS (
  SELECT node AS doc_id, min(r) AS rep_id FROM reach GROUP BY node
)
SELECT d.doc_id,
       coalesce(rep.rep_id, d.doc_id) AS rep_id,
       (coalesce(rep.rep_id, d.doc_id) = d.doc_id) AS keep
FROM documents d LEFT JOIN rep ON rep.doc_id = d.doc_id
""",
        "p4_value_decode": """
SELECT event_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value_dec,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
""",
        "p8_xid_format": """
SELECT event_id, printf('0x%04x.%03x.%08x', user_id, event_id % 8, event_id) AS xid_str
FROM events
""",
        "p7_rowid_encode": """
SELECT event_id, substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 30) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 24) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 18) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 12) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 6) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((user_id % 262144) >> 0) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 48) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 42) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 36) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 30) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 24) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 18) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 12) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 6) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 16777216) >> 0) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 4096) >> 12) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 4096) >> 6) & 63 AS INTEGER) + 1, 1) || substr('ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/', CAST(((event_id % 4096) >> 0) & 63 AS INTEGER) + 1, 1) AS rid
FROM events
""",
        "w8_lineage_counts": _ORACLE_DERIVED + """
SELECT (e2.user_id % 4) AS shard,
       max(e.event_id) AS last_lsn,
       count(CASE WHEN e.op = 'ins' THEN 1 END) AS n_ins,
       count(CASE WHEN e.op = 'upd' THEN 1 END) AS n_upd,
       count(CASE WHEN e.op = 'del' THEN 1 END) AS n_del
FROM ev e JOIN events e2 USING (event_id)
GROUP BY 1
""",
        "dedup_exact": """
SELECT md5(text) AS text_hash, min(doc_id) AS rep_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
        "dedup_minhash_bands": f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({tok})) AS tok FROM documents
), sig AS (
  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS mh
  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
  GROUP BY doc_id, i
)
SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
       md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
FROM sig GROUP BY doc_id, i // 2
""",
        "dedup_minhash_pairs": f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({tok})) AS tok FROM documents
), sig AS (
  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS mh
  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, i // 2 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
  FROM sig GROUP BY doc_id, i // 2
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
WHERE a.doc_id < b.doc_id
""",
        "dedup_jaccard_verify": f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({tok})) AS tok FROM documents
), sig AS (
  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || ':' || tok)) AS mh
  FROM toks CROSS JOIN (SELECT unnest(range(8)) AS i)
  GROUP BY doc_id, i
), bands AS (
  SELECT doc_id, i // 2 AS band, md5(string_agg(mh, '|' ORDER BY i)) AS band_hash
  FROM sig GROUP BY doc_id, i // 2
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
), inter AS (
  SELECT p.id_a, p.id_b, count(DISTINCT ta.tok) AS n_inter
  FROM pairs p
  JOIN toks ta ON ta.doc_id = p.id_a
  JOIN toks tb ON tb.doc_id = p.id_b AND tb.tok = ta.tok
  GROUP BY p.id_a, p.id_b
), sizes AS (
  SELECT doc_id, count(DISTINCT tok) AS n FROM toks GROUP BY doc_id
)
SELECT i.id_a, i.id_b,
       round(CAST(i.n_inter AS DOUBLE) /
             greatest(CAST(sa.n + sb.n - i.n_inter AS DOUBLE), 1.0), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / greatest(CAST(sa.n + sb.n - i.n_inter AS DOUBLE), 1.0) >= 0.5
""",
        "dedup_simhash": f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({tok})) AS tok FROM documents
), bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (CAST(floor((strpos('0123456789abcdef',
                       substr(md5(tok), CAST(b // 4 AS INTEGER) + 1, 1)) - 1)
                       / power(2, b % 4)) AS INTEGER) % 2) = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM toks CROSS JOIN (SELECT unnest(range(16)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN vote > 0 THEN CAST(power(2, b) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS simhash16
FROM bits GROUP BY doc_id
""",
        "text_quality": f"""
SELECT doc_id,
       len({tok}) AS n_tokens,
       round((
         0.4 * ((length(text) - (length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))))
                / greatest(CAST(length(text) AS DOUBLE), 1.0))
       + 0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
       + 0.2 * (1.0 - least(((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))
                / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 4, 1.0))
       ) * least(CAST(length(text) AS DOUBLE) / 20.0, 1.0), 6) AS quality
FROM documents
""",
        "text_fingerprint": f"""
SELECT doc_id, md5(array_to_string(list_sort(list_distinct({tok})), ' ')) AS fp
FROM documents
""",
        "text_lang_id": f"""
WITH s AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text, '[一-鿿]', '', 'g')) AS cjk,
         length(text) - length(regexp_replace(text, '[Ѐ-ӿ]', '', 'g')) AS cyr,
         length(text) - length(regexp_replace(text, '[؀-ۿ]', '', 'g')) AS ara,
         {_hits('en')} AS en,
         {_hits('es')} AS es,
         {_hits('de')} AS de,
         {_hits('fr')} AS fr
  FROM documents
)
SELECT doc_id,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN cyr > 0 THEN 'ru'
            WHEN ara > 0 THEN 'ar'
            WHEN es > en AND es >= de AND es >= fr THEN 'es'
            WHEN de > en AND de >= fr THEN 'de'
            WHEN fr > en THEN 'fr'
            ELSE 'en' END AS pred_lang
FROM s
""",
        "ann_lsh_topk": f"""
WITH q0 AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
), c0 AS (
  SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id >= 10
), cb AS (
  SELECT n_id, n_vec, {_bucket('n_vec')} AS bkt FROM c0
), qb AS (
  SELECT q_id, q_vec, {_bucket('q_vec')} AS bkt0 FROM q0
), qp AS (
  SELECT q_id, q_vec,
         unnest([bkt0, xor(bkt0, 1), xor(bkt0, 2), xor(bkt0, 4), xor(bkt0, 8)]) AS bkt
  FROM qb
), scored AS (
  SELECT qp.q_id, cb.n_id,
    round(
      list_sum(list_transform(range(1, len(cb.n_vec) + 1),
               i -> CAST(cb.n_vec[i] AS DOUBLE) * CAST(qp.q_vec[i] AS DOUBLE)))
      / greatest(
          sqrt(list_sum(list_transform(range(1, len(cb.n_vec) + 1),
               i -> CAST(cb.n_vec[i] AS DOUBLE) * CAST(cb.n_vec[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, len(qp.q_vec) + 1),
               i -> CAST(qp.q_vec[i] AS DOUBLE) * CAST(qp.q_vec[i] AS DOUBLE)))),
          1e-12), 6) AS cos_sim
  FROM cb JOIN qp ON cb.bkt = qp.bkt
)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "ann_cosine_topk": """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS n_id, embedding AS n_vec FROM embeddings WHERE vec_id >= 10
), scored AS (
  SELECT q.q_id, c.n_id,
    round(
      list_sum(list_transform(range(1, len(c.n_vec) + 1),
               i -> CAST(c.n_vec[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)))
      / greatest(
          sqrt(list_sum(list_transform(range(1, len(c.n_vec) + 1),
               i -> CAST(c.n_vec[i] AS DOUBLE) * CAST(c.n_vec[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(range(1, len(q.q_vec) + 1),
               i -> CAST(q.q_vec[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)))),
          1e-12), 6) AS cos_sim
  FROM c CROSS JOIN q
)
SELECT q_id, n_id, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rank
  FROM scored
) WHERE rank <= 5
""",
        "agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "join_broadcast_dims": """
SELECT r_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
        "setop_error_only_users": """
SELECT user_id FROM events WHERE event_type = 'error' AND event_id < 500
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase' AND event_id < 500
ORDER BY user_id
""",
        "window_topk_per_group": """
SELECT o_custkey, o_orderkey, o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
    }
    # W7 twin: the binary wire must land the same final state as the
    # JSON wire — identical replay oracle
    sql["w7_roundtrip_state"] = sql["w6_roundtrip_state"]
    sql["w7_full_roundtrip_state"] = sql["w6_roundtrip_state"]
    # dialed wire (FULL/compact/no-rid) must converge to the same state
    sql["w6_full_wire_state"] = sql["w6_roundtrip_state"]
    # config condition language: the SAME translate_condition output in
    # column style over equivalently-derived columns (region NULL where
    # the map omits the key)
    from openlogreplicator_spark.config import translate_condition as _tc

    sql["f2_config_condition"] = f"""
WITH d AS (
  SELECT event_id,
         CASE WHEN event_type = 'error' THEN 'del' ELSE 'ins' END AS op,
         'user' || CAST(user_id % 100 AS VARCHAR) AS "username",
         CASE WHEN user_id % 3 = 0 THEN NULL
              ELSE 'r' || CAST(user_id % 5 AS VARCHAR) END AS "region"
  FROM events
)
SELECT event_id, op, "username", "region"
FROM d
WHERE {_tc(_CONFIG_COND, attrs_style="column")}
"""
    # Catalog-level as-of twin: the cross-table snapshot at epoch 0 must
    # equal the single-table version-0 read — identical cutoff-replay oracle
    sql["d4_catalog_as_of"] = sql["d4_time_travel_as_of"]
    # state-store architecture twin: the applyInPandasWithState assembly
    # must land the exact state the batch path lands — identical oracle
    sql["t13_stateful_final_state"] = sql["s6_cdc_replay_final_state"]
    # rac-ddl-cross-node: s6 replay + meta = event_type of the last
    # surviving post-cut write per key (the ADD COLUMN fence at max//2)
    sql["rac_ddl_cross_node_state"] = _ORACLE_DERIVED + """
, st AS (
  SELECT conv_id, turn_idx,
         max(CASE WHEN op IN ('ins','del') THEN event_id ELSE -1 END) AS boundary,
         max(event_id) AS last_eid
  FROM ev GROUP BY conv_id, turn_idx
), last_op AS (
  SELECT e.conv_id, e.turn_idx, e.op AS last_op
  FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx
                      AND e.event_id = s.last_eid
), surv AS (
  SELECT e.* FROM ev e JOIN st s ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx
  WHERE e.op <> 'del' AND e.event_id >= s.boundary
), sv AS (
  SELECT conv_id, turn_idx, max(event_id) AS me,
         max(CASE WHEN op = 'ins' THEN event_type END) AS role
  FROM surv GROUP BY conv_id, turn_idx
), mx AS (
  SELECT max(event_id) // 2 AS cut FROM ev
), mm AS (
  SELECT s.conv_id, s.turn_idx, max(s.event_id) AS meid
  FROM surv s, mx WHERE s.event_id > mx.cut
  GROUP BY s.conv_id, s.turn_idx
)
SELECT l.conv_id, l.turn_idx, s.role, e.props AS text, me.event_type AS meta
FROM last_op l
JOIN sv s ON s.conv_id = l.conv_id AND s.turn_idx = l.turn_idx
JOIN surv e ON e.conv_id = s.conv_id AND e.turn_idx = s.turn_idx AND e.event_id = s.me
LEFT JOIN mm ON mm.conv_id = l.conv_id AND mm.turn_idx = l.turn_idx
LEFT JOIN surv me ON me.conv_id = mm.conv_id AND me.turn_idx = mm.turn_idx
                 AND me.event_id = mm.meid
WHERE l.last_op <> 'del'
"""
    return sql
