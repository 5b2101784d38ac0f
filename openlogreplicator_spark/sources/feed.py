"""Change-feed sources — the reader layer.

Reference analog: the async filesystem redo reader + archived-log discovery
(/root/reference/src/reader/ReaderFilesystem.cpp,
src/replicator/Replicator.cpp:468-659 archGetLogPath/archGetLogList).  The
reference parses `%t_%s_%r` archive names to schedule files in sequence
order; our feed files are named `seq-*`/`seq=*` so lexicographic listing ==
replay order, and Structured Streaming's file source does discovery,
ordering (modTime, path) and admission (maxFilesPerTrigger = the bounded
ring buffer analog).

Ordering contract (same one the reference has on redo sequence numbers): a
transaction's commit event appears in the feed no earlier than its DML
events.  The pending-state carry in the apply layer tolerates any batch
split, but not reordering of commit before its payload.

A Kafka source would slot in here unchanged (readStream.format("kafka") →
from_json over the same CHANGE_EVENT_SCHEMA); the jar is not in this image.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schema import CHANGE_EVENT_SCHEMA


def read_feed_batch(spark: SparkSession, feed_dir: str) -> DataFrame:
    """Bounded read of the whole feed (ReplicatorBatch analog)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(feed_dir)


def read_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail: new `seq-*` files are discovered and admitted in
    order; maxFilesPerTrigger bounds per-epoch intake."""
    r = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("latestFirst", "false")
        .option("maxFilesPerTrigger", str(max_files_per_trigger or 1000))
    )
    return r.parquet(feed_dir)
