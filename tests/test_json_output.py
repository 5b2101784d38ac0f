"""W6 JSON message builder — wire-format mirror of the reference's output
(BuilderJson.cpp; golden shape tests/fixtures/expected/*/output.json)."""

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.functions.json_output import build_json_messages
from openlogreplicator_spark.operators.assemble import assemble_transactions

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_json_message_shape(spark):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="hello", ts=TS)
    t.upd("c1", 0, text="hello v2")
    t.delete("c1", 0)
    fb.commit(t)
    committed = assemble_transactions(fb.to_spark(spark))["committed"]
    msgs = build_json_messages(
        committed.filter(F.col("op").isin("ins", "upd", "del"))
    ).orderBy("scn", "idx").collect()
    assert len(msgs) == 3
    parsed = [json.loads(m["message"]) for m in msgs]
    assert [p["payload"][0]["op"] for p in parsed] == ["c", "u", "d"]
    ins = parsed[0]
    assert set(ins) == {"scn", "idx", "tm", "xid", "db", "payload"}
    assert ins["payload"][0]["schema"] == {"owner": "APP", "table": "transcripts"}
    assert ins["payload"][0]["after"]["text"] == "hello"
    assert len(ins["payload"][0]["rid"]) == 18
    # update carries only changed columns in a sparse after image
    assert parsed[1]["payload"][0]["after"]["text"] == "hello v2"
    assert parsed[1]["payload"][0]["after"]["role"] is None
    # identity is (commit scn, idx) — monotone within the txn
    assert [m["idx"] for m in msgs] == sorted(m["idx"] for m in msgs)
