"""JSON wire-format ingress — the inverse of the W6 builder.

The reference's consumers read its JSON output stream and apply it to a
downstream store; OpenLogReplicator itself can also be CHAINED (one
instance's writer feeding another's reader over the network writer,
src/writer/WriterStream.cpp + src/stream/).  This module closes the same
loop Spark-side: `read_json_feed` parses a `write_json_mirror` output
directory (or any stream of messages in that wire shape) back into
CHANGE_EVENT_SCHEMA rows, so a second engine instance replays it into its
own lake table and converges to the SAME state — proven by
tests/test_json_ingress.py and the w6_roundtrip_state contract query.

Reconstruction notes:

* Messages carry COMMITTED ops only (the builder runs post-assembly), so
  the synthesized feed groups payload rows by (xid, scn) and re-emits one
  ``begin`` and one ``commit`` control row per transaction around the DML
  rows — single-pass, one tiny aggregation over O(txns) rows.
* Intra-transaction order is the message ``idx`` (= original seq_in_txn);
  cross-transaction order is the commit scn — exactly the (commit_scn,
  seq_in_txn) order key the collapse stage uses, so replay order is
  byte-identical to the source engine's.
* ``changed`` (emitted by our builder) distinguishes set-to-NULL from
  unchanged.  Messages from OTHER producers that omit it fall back to the
  standard sparse-image convention: non-null after keys = changed.
* chkpt heartbeat messages (op "chkpt") are dropped.
* Everything is JVM-side (`from_json` + column expressions); no Python in
  the per-row path — the ingress scales like any parquet feed scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import IMAGE_TYPE

# lsn = scn * 2^20 + slot keeps per-shard total order with room for the
# T6-capped transaction sizes (slot 0 = begin, 1..n = DML, 2^20-1 = commit)
_LSN_SHIFT = 1 << 20


def mirror_message_schema(image_type: T.StructType | None = None) -> T.StructType:
    image_type = image_type or IMAGE_TYPE
    payload = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField(
                "schema",
                T.StructType(
                    [
                        T.StructField("owner", T.StringType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
            T.StructField("rid", T.StringType()),
            T.StructField(
                "key",
                T.StructType(
                    [
                        T.StructField("conv_id", T.StringType()),
                        T.StructField("turn_idx", T.IntegerType()),
                    ]
                ),
            ),
            T.StructField("changed", T.ArrayType(T.StringType())),
            T.StructField("before", image_type),
            T.StructField("after", image_type),
            T.StructField("stmt", T.StringType()),  # ddl message field
            T.StructField("seq", T.LongType()),  # chkpt heartbeat field
        ]
    )
    return T.StructType(
        [
            T.StructField("scn", T.LongType()),
            T.StructField("idx", T.IntegerType()),
            T.StructField("tm", T.LongType()),
            T.StructField("xid", T.StringType()),
            T.StructField("db", T.StringType()),
            T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
            T.StructField("payload", T.ArrayType(payload)),
        ]
    )


def parse_json_messages(
    lines: DataFrame,
    image_type: T.StructType | None = None,
    seq_col=None,
) -> DataFrame:
    """Message lines (column ``value``) → CHANGE_EVENT_SCHEMA rows.

    ``seq_col``: optional Column giving the redo-sequence analog for each
    line (e.g. the mirror epoch number parsed from the file path); defaults
    to 0."""
    image_type = image_type or IMAGE_TYPE
    msg = F.from_json(F.col("value"), mirror_message_schema(image_type))
    seq = (seq_col if seq_col is not None else F.lit(0)).cast("long")

    # Oracle xids RECYCLE after commit (usn.slt slots are reused —
    # Xid.h:31), so one replayed batch can hold several transaction
    # INSTANCES of the same xid; the reference disambiguates by processing
    # sequentially (a commit closes the slot).  The batch ingress gets the
    # same identity by suffixing the commit scn — unique per instance,
    # stable across replays.
    xid = F.concat_ws("@", msg.getField("xid"), msg.getField("scn"))
    # posexplode, not element_at(1): MESSAGE_FORMAT::FULL groups a whole
    # transaction's ops into ONE payload array — intra-message position
    # offsets the idx so intra-txn order survives the round trip; for
    # one-op-per-message streams pos is 0 and idx is untouched.
    d = (
        lines.select(
            msg.getField("scn").alias("_scn"),
            msg.getField("idx").alias("_midx"),
            msg.getField("tm").alias("_tm"),
            xid.alias("xid"),
            msg.getField("attributes").alias("attrs"),
            seq.alias("seq"),
            F.posexplode_outer(msg.getField("payload")).alias("_pos", "_p"),
        )
        .withColumn("_idx", F.col("_midx") + F.col("_pos"))
        .filter(F.col("_p").getField("op").isin("c", "u", "d", "ddl"))
    )

    op = (
        F.when(F.col("_p.op") == "c", "ins")
        .when(F.col("_p.op") == "u", "upd")
        .when(F.col("_p.op") == "d", "del")
        .otherwise(F.col("_p.op"))  # "ddl" passes through
    )
    after = F.col("_p.after")
    # producers without an explicit changed list: sparse-image convention
    fallback_changed = F.array_compact(
        F.array(
            *[
                F.when(after.getField(f.name).isNotNull(), F.lit(f.name))
                for f in image_type.fields
            ]
        )
    )
    changed = F.coalesce(F.col("_p.changed"), fallback_changed)

    flat = d.select(
        "_scn", "_idx", "_tm", "xid", "attrs", "seq",
        op.alias("op"),
        F.col("_p.schema.table").alias("table_name"),
        F.col("_p.key.conv_id").alias("conv_id"),
        F.col("_p.key.turn_idx").alias("turn_idx"),
        F.col("_p.before").alias("before"),
        after.alias("after"),
        F.when(op.isin("ins", "upd"), changed).alias("changed_cols"),
        F.when(op == "ddl", F.col("_p.stmt")).alias("ddl_stmt"),
    )
    return flat_to_events(flat, image_type)


def flat_to_events(
    flat: DataFrame, image_type: T.StructType | None = None
) -> DataFrame:
    """Flat committed-op rows — one per wire message, columns (_scn, _idx,
    _tm, xid, attrs, seq, op, table_name, conv_id, turn_idx, before,
    after, changed_cols, ddl_stmt) — to CHANGE_EVENT_SCHEMA rows with one
    synthesized ``begin`` and ``commit`` control row per (xid, _scn)
    transaction instance.  Shared tail of the JSON and protobuf
    ingresses (sources/protobuf_feed.py).

    SINGLE-PASS shape: the old dml ∪ begin ∪ commit union evaluated the
    upstream parse THREE times (the subtrees are not deduped across union
    arms) — for the protobuf ingress that was three full Python decode
    passes, for JSON three ``from_json`` passes.  Instead, the per-txn
    control values (min/max idx, commit tm/seq, attrs) ride a window over
    (xid, _scn) and ONE row per group explodes into [begin, dml, commit]:
    one upstream evaluation plus one narrow-keyed exchange (guide §2.4)."""
    image_type = image_type or IMAGE_TYPE
    from pyspark.sql import Window

    w = Window.partitionBy("xid", "_scn")
    d = (
        flat.withColumn("_lo", F.min("_idx").over(w))
        .withColumn("_hi", F.max("_idx").over(w))
        .withColumn("_ctm", F.max("_tm").over(w))
        .withColumn("_cseq", F.max("seq").over(w))
        .withColumn("_cattrs", F.first("attrs", ignorenulls=True).over(w))
        .withColumn("_rn", F.row_number().over(w.orderBy(F.col("_idx"))))
    )

    def _ev(kind: str):
        """CHANGE_EVENT struct for one output row kind (identical field
        set/order/types across kinds so the explode array is well-typed)."""
        if kind == "dml":
            lsn = F.col("_scn") * _LSN_SHIFT + F.col("_idx")
            commit_scn = F.lit(None).cast("long")
            seq_in_txn = F.col("_idx")
            op = F.col("op")
            seq, tm, attrs = F.col("seq"), F.col("_tm"), F.col("attrs")
        else:
            slot = F.col("_lo") - 1 if kind == "begin" else F.lit(_LSN_SHIFT - 1)
            lsn = F.col("_scn") * _LSN_SHIFT + slot
            commit_scn = (
                F.col("_scn") if kind == "commit" else F.lit(None)
            ).cast("long")
            seq_in_txn = F.col("_lo") - 1 if kind == "begin" else F.col("_hi") + 1
            op = F.lit(kind)
            seq, tm, attrs = F.col("_cseq"), F.col("_ctm"), F.col("_cattrs")
        ctl = kind != "dml"
        return F.struct(
            lsn.cast("long").alias("lsn"),
            F.lit(0).alias("shard"),
            seq.cast("long").alias("seq"),
            F.col("_scn").alias("scn"),
            commit_scn.alias("commit_scn"),
            F.col("xid").alias("xid"),
            seq_in_txn.cast("int").alias("seq_in_txn"),
            op.alias("op"),
            (F.lit(None).cast("string") if ctl else F.col("table_name")).alias("table_name"),
            (F.lit(None).cast("string") if ctl else F.col("conv_id")).alias("conv_id"),
            (F.lit(None).cast("int") if ctl else F.col("turn_idx")).alias("turn_idx"),
            (F.lit(None).cast(image_type) if ctl else F.col("before")).alias("before"),
            (F.lit(None).cast(image_type) if ctl else F.col("after")).alias("after"),
            (F.lit(None).cast("array<string>") if ctl else F.col("changed_cols")).alias("changed_cols"),
            F.lit(None).cast("int").alias("chunk_no"),
            F.lit(None).cast("string").alias("chunk_text"),
            F.lit(0).alias("schema_version"),
            (F.lit(None).cast("string") if ctl else F.col("ddl_stmt")).alias("ddl_stmt"),
            F.to_timestamp(F.from_unixtime(tm)).alias("ts"),
            attrs.alias("attrs"),
        )

    rows = F.when(
        F.col("_rn") == 1, F.array(_ev("begin"), _ev("dml"), _ev("commit"))
    ).otherwise(F.array(_ev("dml")))
    return d.select(F.explode(rows).alias("_e")).select("_e.*")


def read_json_lines_stream(
    spark: SparkSession,
    mirror_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a GROWING mirror tree (live engine chaining: a
    downstream instance follows an upstream instance's JSON egress).

    Only the stateless part runs on the stream — a text scan with the
    epoch seq attached from the file path.  The per-transaction control
    row regroup in ``parse_json_messages`` is an aggregation, so the
    consumer must call it INSIDE foreachBatch (batch-local agg), not on
    the streaming frame (which would make it a stateful streaming agg) —
    ``streaming.job.run_chained_stream`` wires this up.

    Atomicity note: mirror messages carry only committed survivors (no
    rollback marks, no open transactions), so a transaction whose
    messages straddle two micro-batches applies in two epochs — the
    intermediate state is non-atomic, but the final state converges
    (same commit scn, last-writer-wins per column).  An availableNow
    drain with no file cap processes each upstream epoch whole."""
    r = spark.readStream
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    lines = r.text(os.path.join(mirror_dir, "epoch=*"))
    seq = F.regexp_extract(F.input_file_name(), r"epoch=(\d+)", 1).cast("long")
    return lines.select("value", seq.alias("_seq"))


def read_json_feed(
    spark: SparkSession, mirror_dir: str, image_type: T.StructType | None = None
) -> DataFrame:
    """Batch-read a write_json_mirror output tree back as a change-event
    feed.  The mirror's epoch number becomes the redo ``seq`` (log-switch
    analog), parsed from the file path — partition-style discovery, no
    listing job beyond the text scan itself."""
    epoch_dirs = sorted(
        os.path.join(mirror_dir, e)
        for e in os.listdir(mirror_dir)
        if e.startswith("epoch=")
    )
    if not epoch_dirs:
        from ..schema import CHANGE_EVENT_SCHEMA

        return spark.createDataFrame([], CHANGE_EVENT_SCHEMA)
    # whole-dir read: the zz-chkpt.json heartbeats parse as op="chkpt"
    # messages and are dropped by parse_json_messages' DML filter
    lines = spark.read.text(epoch_dirs)
    seq = F.regexp_extract(F.input_file_name(), r"epoch=(\d+)", 1).cast("long")
    return parse_json_messages(
        lines.select("value", seq.alias("_seq")),
        image_type,
        seq_col=F.col("_seq"),
    )
