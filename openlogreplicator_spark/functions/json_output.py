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
        # key columns + changed-column list make the message SELF-CONTAINED
        # (the reference emits the key columns inside the row images —
        # 3.output-format.adoc:69-173; the explicit `changed` list also
        # disambiguates "set to NULL" from "unchanged", which the sparse
        # null-means-unchanged after image alone cannot) — required for the
        # ingress round trip (sources/json_feed.py)
        F.struct(
            F.col("conv_id").alias("conv_id"),
            F.col("turn_idx").alias("turn_idx"),
        ).alias("key"),
        F.col("changed_cols").alias("changed"),
        F.col("before").alias("before"),
        F.col("after").alias("after"),
    )
    msg = F.struct(
        F.col("txn_commit_scn").alias("scn"),
        F.col("seq_in_txn").alias("idx"),
        F.unix_timestamp(F.col("ts")).alias("tm"),
        F.col("xid").alias("xid"),
        F.lit(db_name).alias("db"),
        # session attributes (reference: "attributes" message field fed by
        # opcodes 5.19/5.20 session info, src/parser/OpCode0513.h)
        F.col("attrs").alias("attributes"),
        F.array(payload).alias("payload"),
    )
    return d.select(
        F.col("txn_commit_scn").alias("scn"),
        F.col("seq_in_txn").alias("idx"),
        F.to_json(msg, {"ignoreNullFields": "false"}).alias("message"),
    )


def write_json_mirror(
    committed_dml: DataFrame,
    out_dir: str,
    epoch_id: int | str,
    db_name: str = "transcripts_feed",
    owner: str = "APP",
    n_files: int | None = None,
    ddls: list[tuple] | None = None,
) -> None:
    """W2/W6 egress — the WriterFile analog
    (/root/reference/src/writer/WriterFile.cpp): the JSON message stream
    written to rotating plain-text files, one directory per epoch.

    * Global (scn, idx) order: messages are range-partitioned and sorted, so
      lexicographic (file, line) order IS commit order across part files —
      the distributed equivalent of WriterFile's sequential append.
    * Rotation: one part file per range partition (size-based rotation at
      scale = pick n_files from data volume; reference rotates by
      max-file-size/timestamp, WriterFile.cpp `checkFile`).
    * Exactly-once: the epoch directory is overwritten whole on replay,
      mirroring the lake ledger's idempotence.
    * Heartbeat: a trailing checkpoint message per epoch with op "chkpt"
      and the epoch's max commit scn (reference: Parser.cpp:1571
      processCheckpoint; message shape 3.output-format.adoc:86,156-167).
    """
    import json
    import os

    msgs = build_json_messages(committed_dml, db_name=db_name, owner=owner)
    spark = committed_dml.sparkSession
    if ddls:
        # committed DDL as its own wire message, interleaved at its commit
        # scn (the reference emits the DDL statement text on the stream —
        # Builder.cpp:1738-1830 DDL message types; without it a chained
        # consumer cannot evolve its schema).  O(ddls) driver-side rows.
        rows = [
            (
                int(scn),
                int(idx),
                json.dumps(
                    {
                        "scn": int(scn),
                        "idx": int(idx),
                        "tm": None,
                        "xid": f"ddl@{int(scn)}",
                        "db": db_name,
                        "attributes": None,
                        "payload": [
                            {
                                "op": "ddl",
                                "schema": {"owner": owner, "table": None},
                                "stmt": stmt,
                            }
                        ],
                    },
                    separators=(",", ":"),
                ),
            )
            for scn, idx, stmt in ddls
        ]
        msgs = msgs.unionByName(
            spark.createDataFrame(rows, "scn long, idx int, message string")
        )
    n = n_files or spark.sparkContext.defaultParallelism
    epoch_dir = os.path.join(out_dir, f"epoch={int(epoch_id):06d}")
    (
        msgs.repartitionByRange(n, "scn", "idx")
        .sortWithinPartitions("scn", "idx")
        .select("message")
        .write.mode("overwrite")
        .text(epoch_dir)
    )
    # checkpoint scn WITHOUT a second pass over the (unpersisted) message
    # DAG: the stream is globally (scn, idx)-sorted across part files, so
    # the max commit scn is the last line of the last non-empty part file —
    # one tiny driver-side file read instead of recomputing the whole
    # assemble→collapse plan for an agg.  Shape-sensitive fast path only:
    # if a compression codec or a changed part-naming scheme breaks the
    # plain-text read, fall back to the shape-agnostic aggregation.
    import glob

    max_scn = None
    try:
        for path in sorted(glob.glob(os.path.join(epoch_dir, "part-*")), reverse=True):
            last = None
            with open(path, encoding="utf-8") as pf:
                for line in pf:
                    if line.strip():
                        last = line
            if last is not None:
                max_scn = json.loads(last)["scn"]
                break
    except (UnicodeDecodeError, json.JSONDecodeError, KeyError, OSError):
        max_scn = None
    if max_scn is None:
        # unreadable part files OR none matched the naming assumption OR a
        # genuinely empty epoch — the agg distinguishes (None only when empty)
        max_scn = msgs.agg(F.max("scn").alias("m")).first()["m"]
    chkpt = {
        "scn": int(max_scn) if max_scn is not None else None,
        "db": db_name,
        "payload": [{"op": "chkpt", "seq": int(epoch_id)}],
    }
    tmp = os.path.join(epoch_dir, ".chkpt.tmp")
    with open(tmp, "w") as f:
        f.write(json.dumps(chkpt, separators=(",", ":")) + "\n")
    os.replace(tmp, os.path.join(epoch_dir, "zz-chkpt.json"))


def read_json_mirror(out_dir: str) -> list[str]:
    """Read mirror messages back in global commit order (test/consumer
    helper): epochs ascending, part files lexicographic, lines in order.
    The trailing zz-chkpt.json heartbeats sort after data files by name."""
    import glob
    import os

    out: list[str] = []
    for epoch_dir in sorted(glob.glob(os.path.join(out_dir, "epoch=*"))):
        for path in sorted(glob.glob(os.path.join(epoch_dir, "*"))):
            name = os.path.basename(path)
            if not (name.startswith("part-") or name == "zz-chkpt.json"):
                continue
            with open(path) as f:
                out.extend(line.rstrip("\n") for line in f if line.strip())
    return out
