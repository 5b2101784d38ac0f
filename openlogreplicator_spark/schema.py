"""Canonical schemas for the change feed and target tables.

The change-event row is the structured analog of the reference's
``RedoLogRecord`` (/root/reference/src/common/RedoLogRecord.h:34-158): one row
per change vector, carrying transaction identity (xid), total order (lsn per
shard, scn global, commit_scn per transaction), the row key, and
before/after images.

Identity / ordering columns (reference: src/common/types/{Scn,Seq,Xid}.h) are
plain longs/strings — monotone longs give Spark free range partitioning and
watermark semantics.

``changed_cols`` makes update images unambiguous: the reference encodes
"which columns are present in the redo vector" with per-column presence
bitmaps (COLUMN_FORMAT::CHANGED, src/common/Format.h:48-52); a nullable
struct alone cannot distinguish "column set to NULL" from "column untouched",
so we carry the set explicitly.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Columns of the target `transcripts` table (BASELINE.json input_hint), in
# dictionary order.  `meta` is NOT part of the v0 schema — it is added by the
# ddl-add-column scenario (reference analog: opcode 24.1 DDL capture,
# src/builder/Builder.cpp:1738-1830) — but the *feed* schema is a superset so
# one parquet schema covers every dictionary version; the engine projects to
# the active schema version exactly like the reference's dictionary gates
# column decode (src/builder/SystemTransaction.cpp).
TRANSCRIPT_COLUMNS_V0 = ["role", "text", "tool", "ts"]
TRANSCRIPT_COLUMNS_ALL = ["role", "text", "tool", "ts", "meta"]

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]

_IMAGE_FIELDS = [
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("meta", T.StringType()),
]

IMAGE_TYPE = T.StructType(_IMAGE_FIELDS)

# Ops (reference opcodes in parens):
#   begin (5.2)  commit (5.4)  rollback (5.4 w/ FLG_ROLLBACK_OP0504)
#   prollback (5.6/5.11 savepoint partial rollback)
#   ins (11.2 / 11.11 multi)  upd (11.5/11.6/11.16)  del (11.3 / 11.12 multi)
#   ddl (24.1)  chunk (LOB page write, 19.1/26.x — text chunk analog)
OPS = ["begin", "commit", "rollback", "prollback", "ins", "upd", "del", "ddl", "chunk"]

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),        # per-shard total order (RBA/FileOffset analog)
        T.StructField("shard", T.IntegerType(), False),   # RAC thread# analog (Reader.h:81)
        T.StructField("seq", T.LongType(), False),        # redo log sequence (Seq)
        T.StructField("scn", T.LongType(), False),        # record SCN (RedoLogRecord.h:83)
        T.StructField("commit_scn", T.LongType(), True),  # set on commit/rollback events only
        T.StructField("xid", T.StringType(), False),      # usn.slt.sqn (Xid.h:31)
        T.StructField("seq_in_txn", T.IntegerType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("before", IMAGE_TYPE, True),        # undo image (upd/del)
        T.StructField("after", IMAGE_TYPE, True),         # redo image (ins/upd)
        T.StructField("changed_cols", T.ArrayType(T.StringType()), True),
        T.StructField("chunk_no", T.IntegerType(), True),  # LOB page index analog
        T.StructField("chunk_text", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), False),
        T.StructField("ddl_stmt", T.StringType(), True),   # e.g. "ADD COLUMN meta string"
        T.StructField("ts", T.TimestampType(), False),     # event time (watermark column)
        # session attributes (reference: opcodes 5.19/5.20 session info,
        # src/parser/OpCode0513.h — feeds [login username]-style condition
        # filters and output message attributes)
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

TRANSCRIPTS_SCHEMA_V0 = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# lineage: per-shard per-epoch apply record (Prometheus DML counter analog,
# src/common/metrics/Metrics.h:76-87 "optionally per owner.table" + writer
# confirm checkpoint, src/writer/Writer.cpp:362-399).  ``table_name`` is the
# tracked table the counters belong to (single-table jobs stamp their tracked
# pattern; multi-table jobs one row per (shard, table)).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("shard", T.IntegerType(), True),
        T.StructField("table_name", T.StringType(), True),
        T.StructField("last_applied_lsn", T.LongType(), True),
        T.StructField("n_ins", T.LongType(), False),
        T.StructField("n_upd", T.LongType(), False),
        T.StructField("n_del", T.LongType(), False),
        T.StructField("n_skipped", T.LongType(), False),
    ]
)


def image_type_for(columns: list[str]) -> T.StructType:
    by_name = {f.name: f for f in _IMAGE_FIELDS}
    return T.StructType([by_name[c] for c in columns])


def change_event_schema_for(image_columns: list[str]) -> T.StructType:
    """CHANGE_EVENT schema with a CUSTOM image column set — the
    many-columns fixture class (reference PLAN.md wide-schema scenarios,
    60+ columns).  Known transcript columns keep their types; extras
    default to string.  The engine derives its per-collapse column
    universe from the frame's ``after`` struct, so a wide feed needs no
    engine changes — only this schema."""
    by_name = {f.name: f for f in _IMAGE_FIELDS}
    img = T.StructType(
        [
            by_name.get(c, T.StructField(c, T.StringType()))
            for c in image_columns
        ]
    )
    return T.StructType(
        [
            T.StructField(f.name, img, True) if f.name in ("before", "after") else f
            for f in CHANGE_EVENT_SCHEMA.fields
        ]
    )
