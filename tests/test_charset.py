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
