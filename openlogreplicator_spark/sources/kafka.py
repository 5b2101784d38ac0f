"""Kafka wire-format layer — the message (de)serialization half of the
reference's Kafka reader/writer (/root/reference/src/writer/WriterKafka.cpp;
config documentation/json/3.target.adoc).

The kafka transport jar is not in this image, so this module implements
everything EXCEPT the socket: the exact (key, value, topic) row shape that
``df.write.format("kafka")`` / ``spark.readStream.format("kafka")``
produce and consume.  On a real cluster the wiring is one line each way:

    events_to_kafka(feed).write.format("kafka").option(...).save()
    events_from_kafka(spark.readStream.format("kafka").load())

and everything downstream (assembly → merge) is unchanged — the engine
never knows which transport delivered the batch.

Partitioning contract (the part that matters at 10^10 events): the key is
the SHARD id, so one Kafka partition carries one shard's LSN stream — the
same per-thread ordering contract the file source gets from `seq-*`
naming, and what the shard-watermark gate assumes.  Keying alone is NOT
enough for produce order on a cluster: parallel Spark tasks race the
producer, so the helpers also SHAPE the frame — all rows of a shard land
in ONE task (hash repartition on the key), sorted by their order column —
making task-sequential produce order == log order per shard, with no
global sort anywhere (a global orderBy is a full range shuffle AND still
doesn't order across tasks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import CHANGE_EVENT_SCHEMA


def events_to_kafka(
    events: DataFrame, topic: str = "cdc-transcripts", n_partitions: int | None = None
) -> DataFrame:
    """CHANGE_EVENT rows → Kafka producer rows (key/value binary, topic).

    key = shard (consumer-side routing identity); value = the event as JSON
    (nulls kept so changed_cols vs null-image semantics survive the wire).
    Shaped so a shard is produced by exactly one task in LSN order: hash
    repartition on shard + per-task sort, PLUS an explicit ``partition``
    column (= the Spark partition id) so the producer routes by OUR
    assignment instead of murmur2(key) — one task feeds one Kafka
    partition, making task-sequential produce order == log order per
    partition, with no global sort."""
    n = n_partitions or events.sparkSession.sparkContext.defaultParallelism
    events = events.repartition(n, "shard").sortWithinPartitions("shard", "lsn")
    return events.select(
        F.col("shard").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(*[F.col(f.name) for f in CHANGE_EVENT_SCHEMA.fields]),
            {"ignoreNullFields": "false"},
        ).cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("partition"),
    )


def events_from_kafka(kafka_rows: DataFrame) -> DataFrame:
    """Kafka consumer rows (binary value) → typed CHANGE_EVENT rows.

    Works identically on a batch frame or a readStream frame; bad records
    surface as all-null rows (from_json PERMISSIVE) and are dropped by the
    non-null op filter so one poison message cannot stall the stream."""
    parsed = kafka_rows.select(
        F.from_json(
            F.col("value").cast("string"), CHANGE_EVENT_SCHEMA
        ).alias("ev")
    )
    return parsed.select("ev.*").filter(F.col("op").isNotNull())


def messages_to_kafka(
    messages: DataFrame, topic: str = "cdc-out", n_partitions: int | None = None
) -> DataFrame:
    """W6 JSON output messages → Kafka producer rows (the WriterKafka
    egress path).  key = scn string so log-compacted consumers keep the
    newest state per commit position.  Shaping: hash repartition on key +
    per-task (scn, idx) sort, PLUS an explicit ``partition`` column (= the
    Spark partition id) overriding the producer's murmur2(key) routing —
    each Kafka partition is fed by exactly ONE task, so it receives its
    messages in (scn, idx) order (per-partition monotone scn), which is the
    only order Kafka can guarantee anyway.  Without the explicit partition
    the producer interleaves messages from many concurrent tasks and only
    the compaction guarantee (newest value per scn key) survives.  No
    global orderBy: that was a full range shuffle that still could not
    order produce across parallel tasks."""
    n = n_partitions or messages.sparkSession.sparkContext.defaultParallelism
    keyed = messages.withColumn("key", F.col("scn").cast("string").cast("binary"))
    return (
        keyed.repartition(n, "key")
        .sortWithinPartitions("scn", "idx")
        .select(
            "key",
            F.col("message").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.spark_partition_id().alias("partition"),
        )
    )
