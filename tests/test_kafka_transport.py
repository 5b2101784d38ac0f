"""W3 transport half — REAL Kafka round trip, armed the day the jar lands.

The wire-format layer (sources/kafka.py) is fully tested without a broker
(test_kafka_format.py); this module is the transport smoke test the
round-3 verdict asked to keep loaded behind detection: it SKIPS (never
xfails) unless BOTH the spark-sql-kafka jar is on the classpath AND a
broker is reachable via $OLR_KAFKA_BOOTSTRAP.  When both appear, the
one-line wiring claim in sources/kafka.py is proven end to end:
produce via events_to_kafka → format("kafka") → consume → identical
events, with per-partition (shard) LSN order intact.
"""

import os
import uuid
from datetime import datetime, timezone

import pytest

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.sources.kafka import events_from_kafka, events_to_kafka

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _kafka_jar_present(spark) -> bool:
    """Probe the DataSource registry for the kafka provider — the exact
    lookup df.write.format('kafka') performs, with no broker contact."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "kafka", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


def test_kafka_transport_round_trip(spark):
    broker = os.environ.get("OLR_KAFKA_BOOTSTRAP")
    if not _kafka_jar_present(spark):
        pytest.skip("spark-sql-kafka jar not on classpath (expected in this image)")
    if not broker:
        pytest.skip("no broker: set OLR_KAFKA_BOOTSTRAP=host:port to run")

    topic = f"olr-smoke-{uuid.uuid4().hex[:8]}"
    fb = FeedBuilder(n_shards=2)
    for i in range(20):
        t = fb.begin(shard=i % 2)
        t.ins(f"c{i}", 0, role="user", text=f"v{i}", ts=TS)
        fb.commit(t)
    direct = fb.to_spark(spark)

    (
        events_to_kafka(direct, topic=topic, n_partitions=2)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .save()
    )
    consumed = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    via = events_from_kafka(consumed)
    cols = direct.columns
    a = sorted(tuple(repr(v) for v in r) for r in direct.select(cols).collect())
    b = sorted(tuple(repr(v) for v in r) for r in via.select(cols).collect())
    assert a == b

    # ordering contract: within each Kafka partition, offsets increase in
    # lsn order per shard (one task fed one partition, sorted by lsn)
    rows = consumed.selectExpr(
        "partition", "offset", "CAST(value AS STRING) AS v"
    ).collect()
    import json

    seen: dict[tuple, int] = {}
    for r in sorted(rows, key=lambda r: (r["partition"], r["offset"])):
        ev = json.loads(r["v"])
        key = (r["partition"], ev["shard"])
        assert ev["lsn"] > seen.get(key, -1), "per-shard LSN order broken in-partition"
        seen[key] = ev["lsn"]
