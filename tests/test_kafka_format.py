"""Kafka wire-format layer: round-trip fidelity and engine equivalence —
a feed delivered 'through Kafka' (serialize → binary rows → parse) must
produce the identical final table (transport-agnostic engine)."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.sources.kafka import (
    events_from_kafka,
    events_to_kafka,
    messages_to_kafka,
)
from openlogreplicator_spark.streaming.job import replay_batch

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _feed():
    fb = FeedBuilder(n_shards=2)
    t = fb.begin(shard=0, attrs={"username": "alice"})
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.ins("c1", 1, role=None, text=None, tool="calc", ts=None)  # nulls survive
    t.prollback("c1", 1)
    fb.commit(t)
    t = fb.begin(shard=1)
    t.upd("c1", 0, text="v2")
    t.chunk("c2", 0, 0, "AB")
    t.chunk("c2", 0, 1, "CD")
    t.ins("c2", 0, role="assistant", text="placeholder", ts=TS)
    fb.commit(t)
    return fb


def test_kafka_round_trip_and_engine_equivalence(spark, tmpdir_path):
    fb = _feed()
    direct = fb.to_spark(spark)
    via_kafka = events_from_kafka(events_to_kafka(direct))

    # field-level round trip (sorted by global order)
    cols = direct.columns
    a = sorted(tuple(repr(v) for v in r) for r in direct.select(cols).collect())
    b = sorted(tuple(repr(v) for v in r) for r in via_kafka.select(cols).collect())
    assert a == b

    # engine equivalence: same final state as the oracle
    table = replay_batch(spark, via_kafka, os.path.join(tmpdir_path, "tbl"),
                         n_buckets=4)
    expected = replay(fb.rows)
    got = normalize_rows([r.asDict() for r in table.read().collect()],
                         table.value_names)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert got == want
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in table.read().collect()}
    assert rows[("c2", 0)]["text"] == "ABCD"  # chunks survived the wire


def test_kafka_poison_message_dropped(spark):
    fb = _feed()
    good = events_to_kafka(fb.to_spark(spark))
    poison = spark.createDataFrame(
        [(b"0", b"{not json", "cdc-transcripts", 0)],
        "key binary, value binary, topic string, partition int",
    )
    parsed = events_from_kafka(good.unionByName(poison))
    assert parsed.count() == len(fb.rows)  # poison dropped, stream alive


def test_kafka_egress_shape(spark):
    from pyspark.sql import functions as F

    from openlogreplicator_spark.functions.json_output import build_json_messages
    from openlogreplicator_spark.operators.assemble import assemble_transactions

    fb = _feed()
    committed = assemble_transactions(fb.to_spark(spark))["committed"]
    msgs = build_json_messages(committed.filter(F.col("op").isin("ins", "upd", "del")))
    out = messages_to_kafka(msgs).collect()
    assert {r["topic"] for r in out} == {"cdc-out"}
    assert all(isinstance(r["key"], (bytes, bytearray)) for r in out)
    import json

    payloads = [json.loads(bytes(r["value"]).decode()) for r in out]
    assert all("payload" in p for p in payloads)
