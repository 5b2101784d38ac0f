"""P5 — character-set conversion at feed ingress.

The reference ships ~34 kLoC of hand-built mapping tables
(/root/reference/src/locales/*, e.g. CharacterSetZHS16GBK.cpp,
CharacterSetJA16SJIS.cpp) because it decodes raw Oracle column bytes
in-process.  Our typed feed is UTF-8 by design (SURVEY §1.3), so the
conversion belongs at INGRESS: a feed whose producer exports raw bytes in
a database charset runs this operator once, before assembly — after it,
the engine never sees a non-UTF-8 byte, exactly like the reference's
Builder always emits UTF-8.

Python's codec registry already implements every charset the reference
supports (the tables the reference hand-rolls are the same mappings), so
the implementation is a NAME MAP plus one Arrow-batched decode pass —
mapInPandas over the binary columns, the standard slow-path containment:
charset decode is inherently per-byte work, but it runs once per ingested
byte, vectorized per Arrow batch, and scales embarrassingly (no shuffle).

Unmappable bytes follow the reference's policy dial
(documentation/user-manual/5.supported-features.adoc): 'replace' emits
U+FFFD (the reference's UNICODE_UNKNOWN_CHARACTER), 'strict' fails fast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Oracle charset name (reference src/locales class names) → Python codec.
# The reference's full list is documentation/user-manual/5.supported-features.adoc;
# these are the non-Unicode ones its fixtures exercise.
ORACLE_CHARSETS = {
    "AL32UTF8": "utf-8",
    "UTF8": "utf-8",
    "AL16UTF16": "utf-16-be",
    "WE8ISO8859P1": "latin-1",
    "WE8MSWIN1252": "cp1252",
    "EE8ISO8859P2": "iso8859-2",
    "CL8ISO8859P5": "iso8859-5",
    "AR8ISO8859P6": "iso8859-6",
    "EL8ISO8859P7": "iso8859-7",
    "IW8ISO8859P8": "iso8859-8",
    "WE8ISO8859P9": "iso8859-9",
    "NE8ISO8859P10": "iso8859-10",
    "WE8ISO8859P15": "iso8859-15",
    "BLT8ISO8859P13": "iso8859-13",
    "CEL8ISO8859P14": "iso8859-14",
    "ZHS16GBK": "gbk",
    "ZHS32GB18030": "gb18030",
    "ZHT16BIG5": "big5",
    "JA16SJIS": "shift_jis",
    "JA16EUC": "euc_jp",
    "KO16MSWIN949": "cp949",
    "KO16KSC5601": "euc_kr",
    "TH8TISASCII": "tis-620",
    "VN8MSWIN1258": "cp1258",
    "CL8MSWIN1251": "cp1251",
    "EL8MSWIN1253": "cp1253",
    "TR8MSWIN1254": "cp1254",
    "IW8MSWIN1255": "cp1255",
    "AR8MSWIN1256": "cp1256",
    "BLT8MSWIN1257": "cp1257",
    "EE8MSWIN1250": "cp1250",
    "US7ASCII": "ascii",
    # single-byte sets from the reference's matrix (src/locales/Locales.cpp)
    # whose mapping Python's codec registry already ships
    "CL8KOI8R": "koi8-r",
    "CL8KOI8U": "koi8-u",
    "US8PC437": "cp437",
    "WE8PC850": "cp850",
    "WE8PC858": "cp858",
    "N8PC865": "cp865",
    "RU8PC866": "cp866",
    "TR8PC857": "cp857",
    "EE8PC852": "cp852",
    "EL8PC737": "cp737",
    "EL8PC869": "cp869",
    "IS8PC861": "cp861",
    "BLT8PC775": "cp775",
    "CDN8PC863": "cp863",
    "CL8MACCYRILLICS": "mac-cyrillic",
    "EL8MACGREEKS": "mac-greek",
    "TR8MACTURKISHS": "mac-turkish",
    "IS8MACICELANDICS": "mac-iceland",
    "WE8MACROMAN8S": "mac-roman",
    "AZ8ISO8859P9E": "iso8859-9",
}


def python_codec(oracle_charset: str) -> str:
    try:
        return ORACLE_CHARSETS[oracle_charset.upper()]
    except KeyError:
        raise ValueError(
            f"unsupported charset {oracle_charset!r}; known: "
            f"{sorted(ORACLE_CHARSETS)}"
        ) from None


def decode_charset_events(
    raw_events: DataFrame,
    oracle_charset: str,
    binary_cols: list[str],
    errors: str = "replace",
) -> DataFrame:
    """Raw-bytes feed → UTF-8 typed feed: decode each binary column to a
    string column of the same name.  One mapInPandas pass, schema otherwise
    unchanged; run BEFORE assembly so the engine sees only UTF-8 (the
    reference converts at Builder decode time, Builder.cpp:129-133)."""
    codec = python_codec(oracle_charset)
    out_schema_parts = []
    for f in raw_events.schema.fields:
        if f.name in binary_cols:
            out_schema_parts.append(f"{f.name} string")
        else:
            out_schema_parts.append(f"{f.name} {f.dataType.simpleString()}")
    out_schema = ", ".join(out_schema_parts)

    def conv(batches):
        for pdf in batches:
            for c in binary_cols:
                pdf[c] = pdf[c].map(
                    lambda b: None if b is None else bytes(b).decode(codec, errors)
                )
            yield pdf

    return raw_events.mapInPandas(conv, out_schema)


def decode_charset_col(col: Column, oracle_charset: str) -> Column:
    """Single-column expression variant for charsets Spark's JVM decode
    already knows (UTF-8/UTF-16/ISO-8859-1/US-ASCII): stays in codegen,
    no Python.  Falls back to raising for charsets that need the pandas
    path — callers use :func:`decode_charset_events` there."""
    codec = python_codec(oracle_charset)
    jvm = {
        "utf-8": "UTF-8",
        "utf-16-be": "UTF-16BE",
        "latin-1": "ISO-8859-1",
        "ascii": "US-ASCII",
    }
    if codec not in jvm:
        raise ValueError(
            f"{oracle_charset} needs the mapInPandas path "
            "(decode_charset_events)"
        )
    return F.decode(col, jvm[codec])
