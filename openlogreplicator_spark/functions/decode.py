"""Decode / projection helpers — the reference's opcode & value decoders
re-expressed as column expressions.

The reference spends ~4.5 kLoC parsing redo vectors byte-by-byte
(/root/reference/src/parser/OpCode*.h) and rendering typed values
(src/builder/Builder.cpp:89-614).  Our feed is typed, so "decode" collapses
to casts, JSON extraction, and identity formatting — all JVM-side,
whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference: base-64-ish rowid alphabet (src/common/types/RowId.h:31-70)
_ROWID_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"


def format_xid(usn: Column, slt: Column, sqn: Column) -> Column:
    """Hex XID render (reference: Xid.h:31-160; formats Format.h:195-200)."""
    return F.format_string("0x%04x.%03x.%08x", usn, slt, sqn)


def parse_xid(xid: Column) -> Column:
    """'usn.slt.sqn' string → struct of longs (our feed's xid shape)."""
    parts = F.split(xid, r"\.")
    return F.struct(
        parts.getItem(0).cast("long").alias("usn"),
        parts.getItem(1).cast("long").alias("slt"),
        F.conv(parts.getItem(2), 16, 10).cast("long").alias("sqn"),
    )


def encode_rowid(obj: Column, dba: Column, slot: Column) -> Column:
    """18-char rowid-shaped surrogate from (dataObj, dba, slot)
    (reference: RowId.h:71-120 emits base-64 groups OOOOOOFFFBBBBBBRRR).
    Six-bit groups rendered via the same alphabet."""
    def b64(value: Column, n_chars: int) -> Column:
        out = []
        for i in range(n_chars - 1, -1, -1):
            idx = F.shiftright(value, 6 * i).bitwiseAND(F.lit(63))
            out.append(F.substring(F.lit(_ROWID_ALPHABET), 1, 64).substr(idx + 1, F.lit(1)))
        return F.concat(*out)

    return F.concat(b64(obj.cast("long"), 6), b64(dba.cast("long"), 9), b64(slot.cast("long"), 3))


def json_field(props: Column, field: str) -> Column:
    """Scalar JSON extraction (reference: JSON type decode path,
    Builder.cpp:140-165) — stays in codegen via get_json_object."""
    return F.get_json_object(props, f"$.{field}")


def decode_number(raw: Column, scale: int = 2) -> Column:
    """Typed NUMBER render (reference: base-100 decode Builder.h:422-556;
    our feed carries doubles, so this is the precision-pinning cast)."""
    return raw.cast(f"decimal(18,{scale})")


def decode_timestamp_micros(micros: Column) -> Column:
    """Epoch-micros → timestamp (reference: 7/11-byte century-excess decode,
    Builder.cpp:210-252)."""
    return F.timestamp_micros(micros.cast("long"))


def changed_only_projection(after: Column, changed_cols: Column, columns: list[str]) -> Column:
    """Update payload with only changed columns non-null (reference:
    COLUMN_FORMAT::CHANGED, Format.h:48-52)."""
    return F.struct(
        *[
            F.when(F.array_contains(changed_cols, c), after.getField(c)).alias(c)
            for c in columns
        ]
    )


def decode_xmltype(xml: Column, xpath: str) -> Column:
    """P10 — XMLTYPE decode (experimental in the reference too:
    Builder.cpp:143-148 XmlCtx-gated XMLTYPE column emission).  Our feed
    carries XML payloads as strings (the reference reassembles them from
    LOB pages first — that half is reassemble_chunks here); extraction is
    Spark's native xpath machinery, JVM-side, no UDF."""
    return F.xpath_string(xml, F.lit(xpath))


def decode_xmltype_list(xml: Column, xpath: str) -> Column:
    """Repeated-node variant: array<string> of every xpath match."""
    return F.xpath(xml, F.lit(xpath))
