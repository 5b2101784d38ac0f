"""Protobuf wire-format ingress — the inverse of the W7 builder.

Parses ``write_protobuf_mirror`` spools (parquet of (scn, idx, message)
RedoResponse frames, sources/network.py) back into CHANGE_EVENT_SCHEMA
rows, so a chained instance replays the binary wire format the same way
the JSON ingress replays the mirror (sources/json_feed.py) — the
reference's protobuf consumers (`proto/OraProtoBuf.proto`) get a
round-trippable Spark twin.

Decode is the pure-Python generic proto3 decoder over Arrow batches
(mapInPandas) — the symmetric slow path to the builder's encode; all
set logic after decode is the shared JVM-side ``flat_to_events`` tail.
Wire facts the parser relies on (all encoder-guaranteed,
functions/protobuf_output.py):

* key columns (conv_id, turn_idx) ride the before/after Value lists like
  any table column — the message is self-contained;
* a Value with NO datum arm is SQL NULL (unset proto3 oneof), so
  set-to-NULL survives the wire;
* ``changed`` = the after-list names minus the key names.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import IMAGE_TYPE
from .json_feed import flat_to_events

_KEYS = ("conv_id", "turn_idx")

_FLAT_FIELDS = [
    T.StructField("_scn", T.LongType()),
    T.StructField("_idx", T.IntegerType()),
    T.StructField("_tm", T.LongType()),
    T.StructField("xid", T.StringType()),
    T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    T.StructField("seq", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
]


def _flat_schema(image_type: T.StructType) -> T.StructType:
    return T.StructType(
        _FLAT_FIELDS
        + [
            T.StructField("before", image_type),
            T.StructField("after", image_type),
            T.StructField("changed_cols", T.ArrayType(T.StringType())),
            T.StructField("ddl_stmt", T.StringType()),
        ]
    )


def _uvarint(buf, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, i


def _decode_values(blobs, decode_message) -> list[tuple]:
    """Value messages → [(name, python value | None)].

    Specialized single-pass parser for the Value layout (name=1
    len-delimited, oneof value_int=2 varint / value_string=5
    len-delimited) — this runs once per column per row, the hottest
    decode loop, so it avoids the generic decoder's per-field dict
    churn.  Any unexpected field number falls back to the generic
    decoder for that blob (forward compatibility with producers that
    fill other datum arms)."""
    out = []
    append = out.append
    for vb in blobs:
        name = ""
        val = None
        i = 0
        n = len(vb)
        while i < n:
            tag = vb[i]
            i += 1
            if tag == 0x0A:  # name (field 1, wire 2)
                ln, i = _uvarint(vb, i)
                name = vb[i:i + ln].decode("utf-8")
                i += ln
            elif tag == 0x10:  # value_int (field 2, varint)
                v, i = _uvarint(vb, i)
                val = v - (1 << 64) if v >= (1 << 63) else v
            elif tag == 0x2A:  # value_string (field 5, wire 2)
                ln, i = _uvarint(vb, i)
                val = vb[i:i + ln].decode("utf-8")
                i += ln
            else:  # other datum arm — generic fallback
                vd = decode_message(vb)
                name = vd.get(1, [b""])[0].decode("utf-8")
                if 2 in vd:
                    raw = vd[2][0]
                    val = raw - (1 << 64) if raw >= (1 << 63) else raw
                elif 5 in vd:
                    val = vd[5][0].decode("utf-8")
                else:
                    val = None
                break
        append((name, val))
    return out


def parse_protobuf_messages(
    msgs: DataFrame, image_type: T.StructType | None = None
) -> DataFrame:
    """(scn, idx, message[, seq]) RedoResponse frames → change events."""
    image_type = image_type or IMAGE_TYPE
    field_types = {f.name: f.dataType for f in image_type.fields}
    out_schema = _flat_schema(image_type)
    has_seq = "seq" in msgs.columns
    src = msgs if has_seq else msgs.withColumn("seq", F.lit(0).cast("long"))

    def decode_iter(batches):
        import pandas as pd

        from ..functions.protobuf_output import OP_ENUM, decode_message

        op_rev = {v: k for k, v in OP_ENUM.items()}

        # per-column coercion functions, resolved once (not per value)
        def _mk(t):
            if isinstance(t, T.TimestampType):
                return lambda v: pd.to_datetime(v, utc=True).to_pydatetime()
            if isinstance(t, (T.IntegerType, T.LongType)):
                return int
            if isinstance(t, T.DoubleType):
                return float
            if isinstance(t, T.BooleanType):
                return lambda v: bool(int(v))
            return str

        convs = {n: _mk(t) for n, t in field_types.items()}

        def conv(name, v):
            """Coerce a wire value to the image column's python type."""
            if v is None:
                return None
            return convs.get(name, str)(v)

        col_names = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            append = rows.append
            for msg, idx, seq in zip(
                pdf["message"].tolist(), pdf["idx"].tolist(),
                pdf["seq"].tolist(),
            ):
                d = decode_message(bytes(msg))
                scn = int(d[2][0])
                tm = int(d[4][0]) if 4 in d else None
                # recycled-xid instances disambiguated by commit scn, same
                # rule as the JSON ingress
                xid = (f"{d[6][0].decode('utf-8')}@{scn}" if 6 in d
                       else f"@{scn}")
                attrs = None
                if 12 in d:
                    attrs = {}
                    for e in d[12]:
                        ed = decode_message(e)
                        attrs[ed.get(1, [b""])[0].decode("utf-8")] = (
                            ed.get(2, [b""])[0].decode("utf-8"))
                    attrs = attrs or None
                # RedoResponse.payload is REPEATED (field 9,
                # OraProtoBuf.proto): a MESSAGE_FORMAT::FULL producer packs
                # a whole transaction's ops into one response — iterate all
                # of them, offsetting idx by position (one-op responses:
                # pos 0, idx untouched)
                for pos, pay_bytes in enumerate(d.get(9, [])):
                    pay = decode_message(pay_bytes)
                    op = op_rev.get(pay[1][0] if 1 in pay else 0)
                    if op not in ("ins", "upd", "del", "ddl"):
                        continue  # chkpt / control frames are not change events
                    schema = decode_message(pay[2][0]) if 2 in pay else {}
                    table = schema.get(2, [None])[0]
                    before = _decode_values(pay.get(4, []), decode_message)
                    after = _decode_values(pay.get(5, []), decode_message)
                    kv = dict(after or before)
                    img_b = {n: conv(n, v) for n, v in before if n not in _KEYS} or None
                    img_a = (
                        {n: conv(n, v) for n, v in after if n not in _KEYS}
                        if op in ("ins", "upd")
                        else None
                    )
                    turn = kv.get("turn_idx")
                    append((
                        scn,
                        int(idx) + pos,
                        tm,
                        xid,
                        attrs,
                        int(seq),
                        op,
                        table.decode("utf-8")
                        if isinstance(table, bytes) else table,
                        kv.get("conv_id"),
                        None if turn is None else int(turn),
                        img_b,
                        img_a,
                        [n for n, _ in after if n not in _KEYS]
                        if op in ("ins", "upd") else None,
                        (pay.get(6, [None])[0] or b"").decode("utf-8")
                        if op == "ddl" and 6 in pay else None,
                    ))
            yield pd.DataFrame(rows, columns=col_names)

    flat = src.select("scn", "idx", "message", "seq").mapInPandas(
        decode_iter, schema=out_schema
    )
    return flat_to_events(flat, image_type)


def read_protobuf_spool_stream(
    spark: SparkSession,
    spool_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a GROWING protobuf spool tree — the binary twin
    of ``json_feed.read_json_lines_stream`` (same contract: only the
    stateless scan runs on the stream; the consumer parses inside
    foreachBatch because the control-row regroup is an aggregation).
    The epoch seq attaches from the file path."""
    r = spark.readStream
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    msgs = r.schema("scn long, idx int, message binary").parquet(
        os.path.join(spool_dir, "epoch=*")
    )
    seq = F.regexp_extract(F.input_file_name(), r"epoch=(\d+)", 1).cast("long")
    return msgs.withColumn("seq", seq)


def read_protobuf_feed(
    spark: SparkSession, spool_dir: str, image_type: T.StructType | None = None
) -> DataFrame:
    """Batch-read a write_protobuf_mirror spool tree back as a
    change-event feed; the spool epoch number becomes the redo seq."""
    epoch_dirs = sorted(
        os.path.join(spool_dir, e)
        for e in os.listdir(spool_dir)
        if e.startswith("epoch=")
    )
    if not epoch_dirs:
        from ..schema import CHANGE_EVENT_SCHEMA

        return spark.createDataFrame([], CHANGE_EVENT_SCHEMA)
    msgs = spark.read.parquet(*epoch_dirs)
    seq = F.regexp_extract(F.input_file_name(), r"epoch=(\d+)", 1).cast("long")
    return parse_protobuf_messages(
        msgs.withColumn("seq", seq), image_type
    )
