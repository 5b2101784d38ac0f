"""P5 charset conversion at ingress (reference: src/locales/*, 34 kLoC of
mapping tables — here Python's codec registry + one Arrow-batched pass)."""

import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.charset import (
    ORACLE_CHARSETS,
    decode_charset_col,
    decode_charset_events,
    python_codec,
)


def test_every_mapped_charset_is_a_real_codec():
    import codecs

    for ora, py in ORACLE_CHARSETS.items():
        codecs.lookup(py)  # raises LookupError if wrong


def test_gbk_and_sjis_round_trip(spark):
    rows = [
        (1, "中文测试".encode("gbk"), "ZHS16GBK"),
        (2, "日本語".encode("shift_jis"), "JA16SJIS"),
        (3, None, "ZHS16GBK"),
    ]
    df = spark.createDataFrame(rows, "id long, text binary, cs string")
    out = decode_charset_events(df.filter(F.col("cs") == "ZHS16GBK"),
                                "ZHS16GBK", ["text"])
    got = {r["id"]: r["text"] for r in out.collect()}
    assert got == {1: "中文测试", 3: None}
    assert dict(out.dtypes)["text"] == "string"

    out2 = decode_charset_events(df.filter(F.col("cs") == "JA16SJIS"),
                                 "JA16SJIS", ["text"])
    assert out2.collect()[0]["text"] == "日本語"


def test_unmappable_bytes_follow_policy(spark):
    df = spark.createDataFrame([(1, b"ok \xff\xfe bad")], "id long, text binary")
    # replace (default): U+FFFD like the reference's UNICODE_UNKNOWN_CHARACTER
    got = decode_charset_events(df, "US7ASCII", ["text"]).collect()[0]["text"]
    assert got == "ok �� bad"
    # strict: fail fast
    import py4j

    with pytest.raises(Exception):
        decode_charset_events(df, "US7ASCII", ["text"], errors="strict").collect()


def test_jvm_expression_fast_path(spark):
    df = spark.createDataFrame([( "héllo".encode("latin-1"),)], "b binary")
    got = df.select(decode_charset_col(F.col("b"), "WE8ISO8859P1").alias("s"))
    assert got.collect()[0]["s"] == "héllo"
    with pytest.raises(ValueError, match="mapInPandas"):
        decode_charset_col(F.col("b"), "ZHS16GBK")
    with pytest.raises(ValueError, match="unsupported charset"):
        python_codec("NOPE")


# ---- round-5 breadth: table-driven round-trip over EVERY mapped charset
# (reference matrix: src/locales/Locales.cpp; the map covers every name
# whose byte mapping Python's codec registry ships) ----

def _sample_for(py_codec: str) -> str:
    """A text exercising the target charset's non-ASCII range: from a
    pan-script candidate pool, keep exactly the characters the codec can
    encode — the round trip is then well-defined for every map entry."""
    pool = ("The quick brown fox 0123456789 "
            "\u00c4\u00e4\u00d6\u00f6\u00dc\u00fc\u00df\u00c9\u00e9\u00d1\u00f1\u00c7\u00e7\u00c5\u00e5\u00c6\u00e6\u00d8\u00f8 "
            "\u0104\u0105\u0116\u0117\u0160\u0161\u017d\u017e\u011e\u011f\u0130\u0131\u015e\u015f "
            "\u0416\u0436\u0418\u0438\u042f\u044f\u041f\u0440\u0438\u0432\u0435\u0442 "
            "\u0391\u03b1\u03a9\u03c9\u0395\u03bb\u03bb\u03ac\u03b4\u03b1 "
            "\u05e9\u05dc\u05d5\u05dd \u0645\u0631\u062d\u0628\u0627 "
            "\u0e44\u0e17\u0e22 \u4e2d\u6587 \u65e5\u672c\u8a9e \ud55c\uad6d\uc5b4")
    out = []
    for ch in pool:
        try:
            ch.encode(py_codec)
            out.append(ch)
        except (UnicodeError, ValueError):
            pass
    s = "".join(out).strip()
    assert s, f"candidate pool empty for {py_codec}"
    return s


@pytest.mark.parametrize("oracle_name", sorted(ORACLE_CHARSETS))
def test_round_trip_every_mapped_charset(spark, oracle_name):
    """Encode a charset-appropriate sample with the MAPPED codec, push the
    raw bytes through the engine's ingress decode, and require exact text
    equality — byte-mapping parity with the reference's per-charset
    decoder classes (src/locales/CharacterSet*.cpp)."""
    py = ORACLE_CHARSETS[oracle_name]
    text = _sample_for(py)
    raw = text.encode(py)
    df = spark.createDataFrame([(1, raw)], "id long, text binary")
    out = decode_charset_events(df, oracle_name, ["text"]).collect()
    assert out[0]["text"] == text


def test_unmapped_charset_name_fails_loud():
    """An Oracle charset outside the map must raise with the supported
    list, not silently mis-decode (the reference aborts on an unknown
    character set id the same way, Locales.cpp lookup)."""
    with pytest.raises(ValueError, match="unsupported charset"):
        python_codec("ZHT32EUC")  # real Oracle name, no Python codec
    with pytest.raises(ValueError, match="unsupported charset"):
        python_codec("TOTALLY_FAKE")
