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


def _decode_values(blobs, decode_message) -> list[tuple]:
    """Value messages → [(name, python value | None)]."""
    out = []
    for vb in blobs:
        vd = decode_message(vb)
        name = vd.get(1, [b""])[0].decode("utf-8")
        if 2 in vd:  # value_int (two's-complement varint)
            raw = vd[2][0]
            v = raw - (1 << 64) if raw >= (1 << 63) else raw
        elif 5 in vd:
            v = vd[5][0].decode("utf-8")
        else:
            v = None  # unset oneof = SQL NULL
        out.append((name, v))
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

        def conv(name, v):
            """Coerce a wire value to the image column's python type."""
            if v is None:
                return None
            t = field_types.get(name)
            if isinstance(t, T.TimestampType):
                return pd.to_datetime(v, utc=True).to_pydatetime()
            if isinstance(t, (T.IntegerType, T.LongType)):
                return int(v)
            if isinstance(t, T.DoubleType):
                return float(v)
            if isinstance(t, T.BooleanType):
                return bool(int(v))
            return str(v)

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = decode_message(bytes(r.message))
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
                    attrs = {
                        decode_message(e).get(1, [b""])[0].decode("utf-8"):
                        decode_message(e).get(2, [b""])[0].decode("utf-8")
                        for e in d.get(12, [])
                    } or None
                    rows.append(
                        {
                            "_scn": int(d[2][0]),
                            "_idx": int(r.idx) + pos,
                            "_tm": int(d[4][0]) if 4 in d else None,
                            # recycled-xid instances disambiguated by commit
                            # scn, same rule as the JSON ingress
                            "xid": f"{d[6][0].decode('utf-8')}@{int(d[2][0])}"
                            if 6 in d
                            else f"@{int(d[2][0])}",
                            "attrs": attrs,
                            "seq": int(r.seq),
                            "op": op,
                            "table_name": table.decode("utf-8")
                            if isinstance(table, bytes)
                            else table,
                            "conv_id": kv.get("conv_id"),
                            "turn_idx": None
                            if kv.get("turn_idx") is None
                            else int(kv["turn_idx"]),
                            "before": img_b,
                            "after": img_a,
                            "changed_cols": [n for n, _ in after if n not in _KEYS]
                            if op in ("ins", "upd")
                            else None,
                            "ddl_stmt": (pay.get(6, [None])[0] or b"").decode("utf-8")
                            if op == "ddl" and 6 in pay
                            else None,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in out_schema.fields]
            )

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
