"""W6 — JSON output-message builder.

The reference's primary output is a zero-allocation streaming JSON message
per transaction op (/root/reference/src/builder/BuilderJson.cpp:503-541;
shape documented in documentation/user-manual/3.output-format.adoc:69-173
and the golden fixture tests/fixtures/expected/example-free-23/output.json):

    {"scn": ..., "tm": ..., "xid": "...", "db": "...",
     "payload": [{"op": "c|u|d", "schema": {"owner": ..., "table": ...},
                  "rid": "...", "before": {...}, "after": {...}}]}

Here the same message is one ``to_json(struct(...))`` column expression —
JVM-side, codegen'd — applied to assembled committed events.  The lake
table stays the primary sink (columns native); this mirror stream exists
for consumers that want the reference's wire format (e.g. Kafka egress).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decode import encode_rowid

_OP_CODE = {"ins": "c", "upd": "u", "del": "d"}  # reference op letters


def op_letter(op: Column) -> Column:
    return (
        F.when(op == "ins", "c").when(op == "upd", "u").when(op == "del", "d").otherwise(op)
    )


def build_json_messages(
    committed_dml: DataFrame,
    db_name: str = "transcripts_feed",
    owner: str = "APP",
) -> DataFrame:
    """committed DML events (with txn_commit_scn) → one JSON message per op,
    ordered identity (scn, idx) like BuilderMsg (Builder.h:72-105)."""
    d = committed_dml
    rid = encode_rowid(
        F.crc32(F.col("table_name")).bitwiseAND(F.lit(0x3FFFF)),
        F.crc32(F.col("conv_id")).bitwiseAND(F.lit(0xFFFFFF)),
        (F.coalesce(F.col("turn_idx"), F.lit(0)) % 4096).cast("long"),
    )
    payload = F.struct(
        op_letter(F.col("op")).alias("op"),
        F.struct(
            F.lit(owner).alias("owner"), F.col("table_name").alias("table")
        ).alias("schema"),
        rid.alias("rid"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
    )
    msg = F.struct(
        F.col("txn_commit_scn").alias("scn"),
        F.col("seq_in_txn").alias("idx"),
        F.unix_timestamp(F.col("ts")).alias("tm"),
        F.col("xid").alias("xid"),
        F.lit(db_name).alias("db"),
        F.array(payload).alias("payload"),
    )
    return d.select(
        F.col("txn_commit_scn").alias("scn"),
        F.col("seq_in_txn").alias("idx"),
        F.to_json(msg, {"ignoreNullFields": "false"}).alias("message"),
    )
