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

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .decode import encode_rowid, format_xid, parse_xid

_OP_CODE = {"ins": "c", "upd": "u", "del": "d"}  # reference op letters

# MESSAGE_FORMAT bits (/root/reference/src/common/Format.h:76-84)
MSG_FULL = 1
MSG_ADD_SEQUENCES = 2
MSG_SKIP_BEGIN = 4
MSG_SKIP_COMMIT = 8
MSG_ADD_OFFSET = 16
# ATTRIBUTES_FORMAT bits (Format.h:28-33)
ATTR_BEGIN = 1
ATTR_DML = 2
ATTR_COMMIT = 4
# SCHEMA_FORMAT bits (Format.h:110-116)
SCHEMA_FULL = 1
# SCN_TYPE / TIMESTAMP_TYPE bits (Format.h:101-108,118-125 — same layout)
SCNT_COMMIT_VALUE = 1
SCNT_BEGIN = 2
SCNT_DML = 4
SCNT_COMMIT = 8
# USER_TYPE bits (Format.h:127-134)
USR_BEGIN = 1
USR_DML = 2
USR_COMMIT = 4


@dataclass(frozen=True)
class WireFormat:
    """The reference's ``format`` config-section dials, as builder options
    (enums in /root/reference/src/common/Format.h; applied per-message in
    BuilderJson.cpp processBeginMessage/processCommit/processInsert...).
    Every dial is a plan-time choice compiled into the ``to_json`` column
    expression — no per-row interpretation.

    Defaults preserve this engine's historical wire shape (DML-only
    stream, attributes on DML, full null images, numeric scn, unix-seconds
    tm, rid present).  ``from_config`` applies the REFERENCE defaults
    instead (begin/commit messages on, no attributes, compact images, no
    rid, unix-nano tm) so a reference config reproduces reference-shaped
    output.

    ``native_keys`` switches the HEADER to the reference's exact key
    naming and identity fields (BuilderJson.h appendHeader:232-327):
    ``scns``/``tms`` on the transaction's first message when the scn /
    timestamp dials pick string renderings (else ``scn``/``tm``), the
    ``c_scn``/``c_idx`` message identity on EVERY message, the ``xid``
    dial's rendering, and DB_FORMAT-gated ``db`` — byte-compatible with
    the reference wire (golden test vs its own e2e fixture
    tests/fixtures/expected/example-free-23/output.json).  The native
    wire drops this engine's self-containment extensions (``key`` /
    ``changed`` payload fields), so it is an EGRESS dial for reference
    consumers; chained replication (sources/json_feed.py ingress) needs
    the self-contained default shape.

    Not mapped (documented vacuities): ``char``/``char-set``
    — ingress-side (functions/charset.py); ``interval-*``/``unknown*`` —
    no such column types in the typed feed; ADD_OFFSET — no redo-file
    byte offsets exist here (the (scn, idx) identity replaces them).
    """

    message: int = MSG_SKIP_BEGIN | MSG_SKIP_COMMIT
    scn: int = 0          # SCN_FORMAT: 0 numeric, 1 text-hex
    rid: int = 1          # RID_FORMAT: 0 skip, 1 text
    timestamp: int = 3    # TIMESTAMP_FORMAT: 3 = unix seconds
    attributes: int = ATTR_DML
    column: int = 1       # COLUMN_FORMAT: 0 changed-only, >=1 full nulls
    schema: int = 0       # SCHEMA_FORMAT: bit 1 = embed column name/types
    xid: int = -1         # XID_FORMAT (Format.h:195-200): -1 = feed xid
                          # verbatim (historical); 0 hex / 1 dec / 2 packed
                          # numeric ("xidn") / 3 reversed hex
    db: int = -1          # DB_FORMAT: -1 = always shown (historical);
                          # else bit 1 = show on DML messages
    native_keys: bool = False
    # native-header-only dials (the historical wire always carries scn/tm
    # on every message — a superset — and session attributes ride the
    # `attributes` map, so these shape only the native header):
    scn_type: int = 0        # SCN_TYPE bits: +b_scn(s) / scn on DML / +e_scn(s)
    timestamp_type: int = 0  # TIMESTAMP_TYPE bits: +b_tm(s) / tm on DML / +e_tm(s)
    user: int = 0            # USER_TYPE bits: "usr" = attrs['login username']
                             # per message kind (null shows explicitly under
                             # FULL-null images; the reference omits it)

    def __post_init__(self):
        if self.message & MSG_FULL and self.message & (MSG_SKIP_BEGIN | MSG_SKIP_COMMIT):
            # same rejection as the reference config parser
            # (OpenLogReplicator.cpp:744-752)
            raise ValueError(
                'bad "message" value: BEGIN/COMMIT skip flags cannot be '
                "combined with FULL mode")

    @classmethod
    def from_config(cls, fmt: dict) -> "WireFormat":
        """Reference defaults for absent fields (Format.h enum zeros;
        timestamp default UNIX_NANO)."""
        return cls(
            message=int(fmt.get("message", 0)),
            scn=int(fmt.get("scn", 0)),
            rid=int(fmt.get("rid", 0)),
            timestamp=int(fmt.get("timestamp", 0)),
            attributes=int(fmt.get("attributes", 0)),
            column=int(fmt.get("column", 0)),
            schema=int(fmt.get("schema", 0)),
            # only explicit dials re-render: the absent-field reference
            # defaults (xid TEXT_HEX, db hidden) describe a packed binary
            # xid and a multi-tenant conName this feed doesn't have, so
            # the historical behaviors (verbatim xid, db always present)
            # stay the wire defaults and existing consumers keep their
            # bytes
            xid=int(fmt["xid"]) if "xid" in fmt else -1,
            db=int(fmt["db"]) if "db" in fmt else -1,
            # extension field (not in the reference vocabulary): opt into
            # the byte-compatible reference header.  Off by default so
            # config-driven wires stay self-contained (chained replicas).
            native_keys=bool(fmt.get("native-keys", 0)),
            scn_type=int(fmt.get("scn-type", 0)),
            timestamp_type=int(fmt.get("timestamp-type", 0)),
            user=int(fmt.get("user-type", 0)),
        )


#: the engine's historical default wire shape
DEFAULT_WIRE = WireFormat()


def _scn_expr(scn: Column, fmt: WireFormat) -> Column:
    if fmt.scn == 1:  # SCN_FORMAT::TEXT_HEX — BuilderJson appendHex path
        return F.format_string("0x%016x", scn)
    return scn


def _xid_expr(fmt: WireFormat) -> Column:
    """XID rendering (BuilderJson.h:298-327).  The feed xid is the
    'usn.slt.sqnhex' string (parse_xid's shape); a non-parseable xid
    falls back to verbatim so arbitrary upstream ids never render null."""
    if fmt.xid < 0:
        return F.col("xid").alias("xid")
    p = parse_xid(F.col("xid"))
    usn, slt, sqn = p.getField("usn"), p.getField("slt"), p.getField("sqn")
    if fmt.xid == 2:  # NUMERIC — packed usn<<48|slt<<32|sqn, key "xidn"
        packed = (F.shiftleft(usn, 48).bitwiseOR(F.shiftleft(slt, 32))
                  .bitwiseOR(sqn)).cast("long")
        return packed.alias("xidn")
    if fmt.xid == 1:  # TEXT_DEC
        rendered = F.format_string("%d.%d.%d", usn, slt, sqn)
    elif fmt.xid == 3:  # TEXT_REVERSED — hex16 of packed, reversed
        packed = (F.shiftleft(usn, 48).bitwiseOR(F.shiftleft(slt, 32))
                  .bitwiseOR(sqn)).cast("long")
        rendered = F.reverse(F.format_string("%016x", packed))
    else:  # TEXT_HEX
        rendered = format_xid(usn, slt, sqn)
    rendered = F.when(usn.isNotNull() & slt.isNotNull() & sqn.isNotNull(),
                      rendered).otherwise(F.col("xid"))
    return rendered.alias("xid")


_TS_ISO = {
    8: "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'", 9: "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    10: "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", 11: "yyyy-MM-dd'T'HH:mm:ss'Z'",
    12: "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS", 13: "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    14: "yyyy-MM-dd'T'HH:mm:ss.SSS", 15: "yyyy-MM-dd'T'HH:mm:ss",
}


def _tm_expr(ts: Column, fmt: WireFormat) -> Column:
    """TIMESTAMP_FORMAT (Format.h:136-153): 0-3 unix epoch at nano/micro/
    milli/second scale, 4-7 same as strings, 8-15 ISO-8601 (session TZ is
    pinned UTC, so the TZ variants carry 'Z')."""
    t = fmt.timestamp
    if t <= 7:
        scale = (1_000_000_000, 1_000_000, 1_000, 1)[t % 4]
        num = (F.unix_timestamp(ts).cast("long") * scale)
        return num.cast("string") if t >= 4 else num
    return F.date_format(ts, _TS_ISO[t])


def op_letter(op: Column) -> Column:
    return (
        F.when(op == "ins", "c").when(op == "upd", "u").when(op == "del", "d").otherwise(op)
    )


def build_json_messages(
    committed_dml: DataFrame,
    db_name: str = "transcripts_feed",
    owner: str = "APP",
    fmt: WireFormat | None = None,
) -> DataFrame:
    """committed DML events (with txn_commit_scn) → JSON wire messages,
    ordered identity (scn, idx) like BuilderMsg (Builder.h:72-105).

    ``fmt`` applies the reference's format dials (see :class:`WireFormat`):
    default mode emits one message per op (+ begin/commit markers unless
    skipped); FULL mode groups each transaction's ops into one message
    (BuilderJson.cpp:452-545).  All dials compile into the column
    expressions — the builder stays one JVM-side ``to_json`` projection
    (plus one groupBy in FULL mode).
    """
    fmt = fmt or DEFAULT_WIRE
    d = committed_dml
    rid = encode_rowid(
        F.crc32(F.col("table_name")).bitwiseAND(F.lit(0x3FFFF)),
        F.crc32(F.col("conv_id")).bitwiseAND(F.lit(0xFFFFFF)),
        (F.coalesce(F.col("turn_idx"), F.lit(0)) % 4096).cast("long"),
    )
    schema_fields = [F.lit(owner).alias("owner"), F.col("table_name").alias("table")]
    if fmt.schema & SCHEMA_FULL:
        # SCHEMA_FORMAT::FULL — embed the column dictionary (name + type)
        # in each message (BuilderJson.h appendSchema full branch); the
        # frame's after-struct IS the live table schema, so the list is a
        # plan-time literal.
        after_type = d.schema["after"].dataType
        schema_fields.append(
            F.array(*[
                F.struct(F.lit(f.name).alias("name"),
                         F.lit(f.dataType.simpleString()).alias("type"))
                for f in after_type.fields
            ]).alias("columns"))
    payload_fields = [
        op_letter(F.col("op")).alias("op"),
        F.struct(*schema_fields).alias("schema"),
    ]
    if fmt.message & MSG_ADD_SEQUENCES:
        # "num": message sequence within the transaction (BuilderJson ++num)
        payload_fields.append(F.col("seq_in_txn").alias("num"))
    if fmt.rid == 1:  # RID_FORMAT::TEXT
        payload_fields.append(rid.alias("rid"))
    if not fmt.native_keys:
        payload_fields += [
            # key columns + changed-column list make the message
            # SELF-CONTAINED (the reference emits the key columns inside
            # the row images — 3.output-format.adoc:69-173; the explicit
            # `changed` list also disambiguates "set to NULL" from
            # "unchanged", which the sparse null-means-unchanged after
            # image alone cannot) — required for the ingress round trip
            # (sources/json_feed.py).  The native wire drops them — it
            # matches the reference's bytes, and inherits the reference's
            # own set-to-NULL ambiguity on compact images.
            F.struct(
                F.col("conv_id").alias("conv_id"),
                F.col("turn_idx").alias("turn_idx"),
            ).alias("key"),
            F.col("changed_cols").alias("changed"),
        ]
    payload_fields += [
        F.col("before").alias("before"),
        F.col("after").alias("after"),
    ]
    payload = F.struct(*payload_fields)

    def header_fields(idx_expr, first: bool = True, attrs_bit: int = ATTR_DML,
                      kind: str = "dml", scn_rec=None, ts_rec=None,
                      b_scn=None, b_ts=None, e_ts=None):
        """``first``: this message opens its transaction on the wire —
        the reference emits scn/tm only there (appendHeader's ``first``,
        BuilderJson.h:238-289; true on begin messages and FULL-mode txn
        messages, false on DML and commit — BuilderJson.cpp:462,491,516).
        The first-message scn value is commit-anchored (SCN_TYPE::
        COMMIT_VALUE reading; in the reference's single-LWN transactions
        beginScn == lwnScn, the golden fixture's shape).  ``kind``
        (begin/dml/commit) gates the SCN_TYPE / TIMESTAMP_TYPE / USER_TYPE
        bit dials; the ``*_rec``/``b_*``/``e_*`` exprs are the per-kind
        record / txn-begin / txn-end value columns."""
        if fmt.native_keys:
            hexk = fmt.scn == 1
            strk = fmt.timestamp >= 4
            out = []
            if first or (kind == "dml" and fmt.scn_type & SCNT_DML):
                v = F.col("txn_commit_scn")
                if (kind == "dml" and scn_rec is not None
                        and not fmt.scn_type & SCNT_COMMIT_VALUE):
                    v = scn_rec
                out.append(_scn_expr(v, fmt).alias("scns" if hexk else "scn"))
            if fmt.scn_type & SCNT_BEGIN and b_scn is not None:
                out.append(_scn_expr(b_scn, fmt)
                           .alias("b_scns" if hexk else "b_scn"))
            if fmt.scn_type & SCNT_COMMIT:
                out.append(_scn_expr(F.col("txn_commit_scn"), fmt)
                           .alias("e_scns" if hexk else "e_scn"))
            if first or (kind == "dml" and fmt.timestamp_type & SCNT_DML):
                tv = F.col("ts")
                if (kind == "dml" and ts_rec is not None
                        and not fmt.timestamp_type & SCNT_COMMIT_VALUE):
                    tv = ts_rec
                out.append(_tm_expr(tv, fmt).alias("tms" if strk else "tm"))
            if fmt.timestamp_type & SCNT_BEGIN and b_ts is not None:
                out.append(_tm_expr(b_ts, fmt)
                           .alias("b_tms" if strk else "b_tm"))
            if fmt.timestamp_type & SCNT_COMMIT and e_ts is not None:
                out.append(_tm_expr(e_ts, fmt)
                           .alias("e_tms" if strk else "e_tm"))
            out += [
                # the LWN message identity, on EVERY message
                # (BuilderJson.h:291-293); our begin/dml/commit idx is
                # 0-based where lwnIdx counts from 1
                F.col("txn_commit_scn").alias("c_scn"),
                (idx_expr + F.lit(1)).cast("long").alias("c_idx"),
                _xid_expr(fmt),
            ]
            if fmt.db == -1 or fmt.db & 1:  # DB_FORMAT::ADD_DML
                out.append(F.lit(db_name).alias("db"))
            usr_bit = {"begin": USR_BEGIN, "dml": USR_DML,
                       "commit": USR_COMMIT}[kind]
            if fmt.user & usr_bit:  # appendHeader showUser → "usr"
                out.append(F.col("attrs").getItem("login username")
                           .alias("usr"))
            if fmt.attributes & attrs_bit:
                out.append(F.col("attrs").alias("attributes"))
            return out
        out = [
            _scn_expr(F.col("txn_commit_scn"), fmt).alias("scn"),
            idx_expr.alias("idx"),
            _tm_expr(F.col("ts"), fmt).alias("tm"),
            _xid_expr(fmt),
        ]
        if fmt.db == -1 or fmt.db & 1:  # explicit DB_FORMAT dial honored
            out.append(F.lit(db_name).alias("db"))
        # session attributes (reference: "attributes" message field fed by
        # opcodes 5.19/5.20 session info, src/parser/OpCode0513.h);
        # ATTRIBUTES_FORMAT bit gates which message kinds carry them
        if fmt.attributes & attrs_bit:
            out.append(F.col("attrs").alias("attributes"))
        return out

    # COLUMN_FORMAT::CHANGED drops null struct fields from the wire (the
    # compact row images; the changed list keeps set-to-NULL recoverable —
    # ingress takes after[col] for cols IN changed, absent = NULL);
    # FULL_INS_DEC/FULL_UPD emit explicit nulls for the whole row image.
    json_opts = {"ignoreNullFields": "true" if fmt.column == 0 else "false"}

    # some call sites project the per-event scn away before the mirror
    # (the lake epoch path keys everything on txn_commit_scn); the header
    # trio then falls back commit-anchored — the single-LWN reading where
    # record scn == begin scn == commit scn, the golden fixture's shape
    if "scn" not in d.columns:
        d = d.withColumn("scn", F.col("txn_commit_scn"))

    _txn_bounds = dict(b_scn=F.col("_b_scn"), b_ts=F.col("_b_ts"),
                       e_ts=F.col("_e_ts"))

    if fmt.message & MSG_FULL:
        # one message per transaction, payload = ops in intra-txn order
        grouped = (
            d.select(F.col("xid"), F.col("txn_commit_scn"), F.col("ts"),
                     F.col("scn"), F.col("attrs"), F.col("seq_in_txn"),
                     payload.alias("_p"))
            .groupBy("xid", "txn_commit_scn")
            .agg(F.min("ts").alias("ts"),
                 F.min("scn").alias("_b_scn"),
                 F.min("ts").alias("_b_ts"),
                 F.max("ts").alias("_e_ts"),
                 F.first("attrs", ignorenulls=True).alias("attrs"),
                 F.min("seq_in_txn").alias("_idx"),
                 F.array_sort(F.collect_list(
                     F.struct(F.col("seq_in_txn").alias("s"),
                              F.col("_p").alias("p")))).alias("_ops"))
        )
        msg = F.struct(*header_fields(F.col("_idx"), kind="begin",
                                      **_txn_bounds),
                       F.col("_ops").getField("p").alias("payload"))
        return grouped.select(
            F.col("txn_commit_scn").alias("scn"),
            F.col("_idx").alias("idx"),
            F.to_json(msg, json_opts).alias("message"),
        )

    # per-DML txn-bound values (b_scn/b_tm/e_tm header fields) need a
    # window over the transaction — computed ONLY when a dial asks
    if fmt.native_keys and (fmt.scn_type & SCNT_BEGIN
                            or fmt.timestamp_type & (SCNT_BEGIN | SCNT_COMMIT)):
        from pyspark.sql import Window

        w = Window.partitionBy("xid", "txn_commit_scn")
        d = (d.withColumn("_b_scn", F.min("scn").over(w))
             .withColumn("_b_ts", F.min("ts").over(w))
             .withColumn("_e_ts", F.max("ts").over(w)))
        dml_bounds = _txn_bounds
    else:
        dml_bounds = {}
    msg = F.struct(*header_fields(F.col("seq_in_txn"), first=False,
                                  kind="dml", scn_rec=F.col("scn"),
                                  ts_rec=F.col("ts"), **dml_bounds),
                   F.array(payload).alias("payload"))
    out = d.select(
        F.col("txn_commit_scn").alias("scn"),
        F.col("seq_in_txn").alias("idx"),
        F.to_json(msg, json_opts).alias("message"),
    )

    marker_kinds = []
    if not fmt.message & MSG_SKIP_BEGIN:
        # native c_idx counts from 1 (lwnIdx); the historical stream keeps
        # the -1 sentinel so existing (scn, idx) consumers see no change
        marker_kinds.append(
            ("begin", ATTR_BEGIN, F.lit(0) if fmt.native_keys else F.lit(-1),
             True))
    if not fmt.message & MSG_SKIP_COMMIT:
        marker_kinds.append(("commit", ATTR_COMMIT,
                             F.col("_max_seq") + F.lit(1), False))
    if marker_kinds:
        # begin/commit marker messages per transaction (processBeginMessage
        # / processCommit): payload [{"op":"begin"|"commit"}]; idx slots
        # them before/after the txn's ops in the (scn, idx) stream order
        txns = (
            d.groupBy("xid", "txn_commit_scn")
            .agg(F.min("ts").alias("ts"),
                 F.min("scn").alias("_b_scn"),
                 F.min("ts").alias("_b_ts"),
                 F.max("ts").alias("_e_ts"),
                 F.first("attrs", ignorenulls=True).alias("attrs"),
                 F.max("seq_in_txn").alias("_max_seq"))
        )
        for kind, attr_bit, idx_expr, is_first in marker_kinds:
            fields = header_fields(idx_expr, first=is_first,
                                   attrs_bit=attr_bit, kind=kind,
                                   **_txn_bounds)
            mmsg = F.struct(
                *fields,
                F.array(F.struct(F.lit(kind).alias("op"))).alias("payload"))
            out = out.unionByName(
                txns.select(
                    F.col("txn_commit_scn").alias("scn"),
                    idx_expr.cast("int").alias("idx"),
                    F.to_json(mmsg, json_opts).alias("message"),
                ))
    return out


def write_json_mirror(
    committed_dml: DataFrame,
    out_dir: str,
    epoch_id: int | str,
    db_name: str = "transcripts_feed",
    owner: str = "APP",
    n_files: int | None = None,
    ddls: list[tuple] | None = None,
    fmt: WireFormat | None = None,
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

    msgs = build_json_messages(committed_dml, db_name=db_name, owner=owner,
                               fmt=fmt)
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
    # repartitionByRange SAMPLES its input to pick range bounds — an extra
    # full evaluation of the assemble→to_json plan before the real pass.
    # Persist the built messages for the duration of the write so the
    # upstream plan runs ONCE (sampling and the shuffle both read the
    # cache); serialized level keeps the temp off the GC object graph
    # (guide §1.2 — same rationale as the collapsed-changes cache).
    from pyspark import StorageLevel

    msgs = msgs.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            msgs.repartitionByRange(n, "scn", "idx")
            .sortWithinPartitions("scn", "idx")
            .select("message")
            .write.mode("overwrite")
            .text(epoch_dir)
        )
        # checkpoint scn WITHOUT a second pass over the message DAG: the
        # stream is globally (scn, idx)-sorted across part files, so the
        # max commit scn is the last line of the last non-empty part file —
        # one tiny driver-side file read instead of recomputing the whole
        # assemble→collapse plan for an agg.  Shape-sensitive fast path
        # only: if a compression codec or a changed part-naming scheme
        # breaks the plain-text read, fall back to the shape-agnostic
        # aggregation (which reads the still-warm cache).
        import glob

        max_scn = None
        try:
            for path in sorted(glob.glob(os.path.join(epoch_dir, "part-*")),
                               reverse=True):
                last = None
                with open(path, encoding="utf-8") as pf:
                    for line in pf:
                        if line.strip():
                            last = line
                if last is not None:
                    max_scn = json.loads(last)["scn"]
                    if isinstance(max_scn, str):  # SCN_FORMAT::TEXT_HEX dial
                        max_scn = int(max_scn, 16)
                    break
        except (UnicodeDecodeError, json.JSONDecodeError, KeyError, OSError,
                ValueError, TypeError):
            max_scn = None
        if max_scn is None:
            # unreadable part files OR none matched the naming assumption OR
            # a genuinely empty epoch (agg distinguishes: None only if empty)
            max_scn = msgs.agg(F.max("scn").alias("m")).first()["m"]
    finally:
        msgs.unpersist()
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
