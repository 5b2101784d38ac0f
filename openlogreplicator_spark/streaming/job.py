"""Job wiring — the Replicator main loop rebuilt on Structured Streaming.

The reference alternates archived-log catch-up and online tailing on one
thread (/root/reference/src/replicator/Replicator.cpp:245-268); in Spark the
same loop is ONE streaming query: the file source discovers new ``seq-*``
feed files (archived-log analog), micro-batch admission
(maxFilesPerTrigger) replaces the bounded ring buffer, the engine
checkpoint directory replaces position checkpoints
(src/metadata/Metadata.cpp:457-509), and foreachBatch applies each epoch
exactly once via the lake manifest ledger.

``replay_batch`` is the bounded mode (reference: ReplicatorBatch.cpp:33-63)
used by tests and the throughput benchmark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..lake import LakeTable
from ..sources.feed import read_feed_batch, read_feed_stream
from .apply import apply_epoch

DEFAULT_VALUE_COLS = [
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]
KEY_COLS = [("conv_id", "string"), ("turn_idx", "int")]


def create_target(
    spark: SparkSession, table_path: str, n_buckets: int = 16, overwrite: bool = True,
    mode: str = "cow", compact_threshold: int = 8,
) -> LakeTable:
    return LakeTable.create(
        spark, table_path, KEY_COLS, DEFAULT_VALUE_COLS, n_buckets=n_buckets,
        overwrite=overwrite, mode=mode, compact_threshold=compact_threshold,
    )


def replay_batch(
    spark: SparkSession,
    feed: DataFrame | str,
    table_path: str,
    job_id: str = "batch",
    epoch_id: int = 0,
    tracked_pattern: str = "^transcripts$",
    n_buckets: int = 16,
    create: bool = True,
    max_txn_ops: int | None = None,
    mode: str = "cow",
    pre_filter=None,
    dump_xids: list[str] | None = None,
    dump_dir: str | None = None,
    json_mirror_dir: str | None = None,
    protobuf_spool_dir: str | None = None,
    json_format=None,
    schemaless: bool = False,
) -> LakeTable:
    """Bounded replay: whole feed as one epoch (ReplicatorBatch analog).

    ``pre_filter``: optional ``DataFrame -> DataFrame`` applied to the feed
    before the epoch — the config-driven predicate slot (skip-xid, row
    conditions, start-scn gate; see ``openlogreplicator_spark.config``).
    """
    if isinstance(feed, str):
        feed = read_feed_batch(spark, feed)
    if pre_filter is not None:
        feed = pre_filter(feed)
    if create:
        table = create_target(spark, table_path, n_buckets=n_buckets, mode=mode)
    else:
        table = LakeTable(spark, table_path)
    apply_epoch(table, feed, epoch_id, job_id=job_id, tracked_pattern=tracked_pattern,
                max_txn_ops=max_txn_ops, dump_xids=dump_xids, dump_dir=dump_dir,
                json_mirror_dir=json_mirror_dir,
                protobuf_spool_dir=protobuf_spool_dir, json_format=json_format,
                schemaless=schemaless)
    return table.refresh()


def run_stream(
    spark: SparkSession,
    feed_dir: str,
    table_path: str,
    checkpoint_dir: str,
    job_id: str = "stream",
    tracked_pattern: str = "^transcripts$",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    create: bool = True,
    fail_at_epoch: int | None = None,
    fail_after_apply: bool = False,
    max_txn_ops: int | None = None,
    shard_watermark: bool = False,
    expected_shards: list[int] | None = None,
    max_open_scn_lag: int | None = None,
    json_mirror_dir: str | None = None,
    protobuf_spool_dir: str | None = None,
    schemaless: bool = False,
    mode: str = "cow",
    processing_time: str | None = None,
    pre_filter=None,
    dump_xids: list[str] | None = None,
    dump_dir: str | None = None,
    json_format=None,
):
    """Streaming replay.  Default trigger is availableNow (drains the
    backlog then stops — the reference's archived-log catch-up,
    ReplicatorBatch.cpp).  ``processing_time`` (e.g. ``"1 seconds"``)
    switches to the CONTINUOUS tail — the reference's steady-state online
    loop (/root/reference/src/replicator/Replicator.cpp:245-268): the query
    keeps polling the feed directory for new ``seq-*`` files and returns the
    StreamingQuery handle immediately (caller stops it); availableNow
    returns the drained LakeTable.

    ``fail_at_epoch`` / ``fail_after_apply`` inject a crash for the
    kill-and-resume tests: before the apply (epoch fully replayed on
    restart) or after it (ledger makes the replay a no-op).
    """
    if create and not os.path.exists(os.path.join(table_path, "VERSION")):
        create_target(spark, table_path, n_buckets=n_buckets, mode=mode)

    reader = read_feed_stream(spark, feed_dir, max_files_per_trigger)

    def fb(batch_df: DataFrame, epoch_id: int):
        if fail_at_epoch is not None and epoch_id == fail_at_epoch and not fail_after_apply:
            raise RuntimeError(f"injected crash before apply of epoch {epoch_id}")
        table = LakeTable(spark, table_path)
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        apply_epoch(table, batch_df, epoch_id, job_id=job_id, tracked_pattern=tracked_pattern,
                    max_txn_ops=max_txn_ops, shard_watermark=shard_watermark,
                    expected_shards=expected_shards, max_open_scn_lag=max_open_scn_lag,
                    json_mirror_dir=json_mirror_dir,
                    protobuf_spool_dir=protobuf_spool_dir, schemaless=schemaless,
                    dump_xids=dump_xids, dump_dir=dump_dir,
                    json_format=json_format)
        if fail_at_epoch is not None and epoch_id == fail_at_epoch and fail_after_apply:
            raise RuntimeError(f"injected crash after apply of epoch {epoch_id}")

    writer = reader.writeStream.foreachBatch(fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        q = writer.trigger(processingTime=processing_time).start()
        return q  # caller polls LakeTable(spark, table_path) and stops q
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return LakeTable(spark, table_path)


def run_chained_stream(
    spark: SparkSession,
    mirror_dir: str,
    table_path: str,
    checkpoint_dir: str,
    job_id: str = "chain",
    tracked_pattern: str = "^transcripts$",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    create: bool = True,
    mode: str = "cow",
    processing_time: str | None = None,
    wire_format: str = "json",
):
    """Chained-instance tail: consume ANOTHER engine instance's JSON
    mirror — or, with ``wire_format="protobuf"``, its binary RedoResponse
    spool — as the change source (the reference's writer→reader chaining,
    where one OpenLogReplicator's network writer feeds the next's
    stream reader — src/writer/WriterStream.cpp + src/stream/).

    The stream is a stateless scan (sources/json_feed.
    read_json_lines_stream / sources/protobuf_feed.
    read_protobuf_spool_stream); each micro-batch is parsed back into
    change events — the control-row regroup is a batch-local aggregation
    inside foreachBatch — and applied through the normal exactly-once
    epoch path, so the downstream lake converges to the upstream state
    and a killed tail resumes from its checkpoint like any feed stream."""
    from pyspark.sql import functions as F

    if create and not os.path.exists(os.path.join(table_path, "VERSION")):
        create_target(spark, table_path, n_buckets=n_buckets, mode=mode)

    reader, parse = _wire_reader(spark, wire_format, mirror_dir,
                                 max_files_per_trigger)

    def fb(batch_df: DataFrame, epoch_id: int):
        table = LakeTable(spark, table_path)
        events = parse(batch_df)
        apply_epoch(table, events, epoch_id, job_id=job_id,
                    tracked_pattern=tracked_pattern)

    writer = reader.writeStream.foreachBatch(fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time).start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return LakeTable(spark, table_path)


def _wire_reader(spark, wire_format: str, mirror_dir: str,
                 max_files_per_trigger: int | None):
    """(streaming reader, batch-local parse fn) for a chained tail over
    either wire format."""
    from pyspark.sql import functions as F

    if wire_format == "json":
        from ..sources.json_feed import (
            parse_json_messages,
            read_json_lines_stream,
        )

        reader = read_json_lines_stream(spark, mirror_dir, max_files_per_trigger)
        return reader, lambda df: parse_json_messages(df, seq_col=F.col("_seq"))
    if wire_format == "protobuf":
        from ..sources.protobuf_feed import (
            parse_protobuf_messages,
            read_protobuf_spool_stream,
        )

        reader = read_protobuf_spool_stream(spark, mirror_dir, max_files_per_trigger)
        return reader, parse_protobuf_messages
    raise ValueError(f"unknown wire_format {wire_format!r}")


def replay_batch_multi(
    spark: SparkSession,
    feed: DataFrame | str,
    catalog_path: str,
    tables: list[str] | None = None,
    job_id: str = "batch",
    epoch_id: int = 0,
    n_buckets: int = 16,
    mode: str = "cow",
    max_txn_ops: int | None = None,
    auto_register: bool = False,
    pre_filter=None,
    **apply_kwargs,
):
    """Bounded multi-table replay: whole feed as one epoch into a Catalog
    (the reference's multi-table batch mode, fixtures multi-table.sql).
    ``auto_register``: adaptive-schema mode — unregistered tables sighted
    in committed DML register themselves (apply_epoch_multi docstring)."""
    from ..lake.catalog import Catalog
    from .multi import apply_epoch_multi

    if isinstance(feed, str):
        feed = read_feed_batch(spark, feed)
    if pre_filter is not None:
        feed = pre_filter(feed)
    catalog = Catalog.create(spark, catalog_path)
    for name in tables or []:
        catalog.create_table(name, n_buckets=n_buckets, mode=mode)
    apply_epoch_multi(catalog, feed, epoch_id, job_id=job_id,
                      max_txn_ops=max_txn_ops, auto_register=auto_register,
                      **apply_kwargs)
    return catalog.refresh()


def run_chained_stream_multi(
    spark: SparkSession,
    mirror_dir: str,
    catalog_path: str,
    checkpoint_dir: str,
    tables: list[str] | None = None,
    job_id: str = "chain",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    mode: str = "cow",
    processing_time: str | None = None,
    wire_format: str = "json",
    **apply_kwargs,
):
    """Multi-table chained tail: a downstream CATALOG follows an upstream
    instance's JSON mirror (or protobuf spool, ``wire_format=
    "protobuf"``).  Mirror messages carry the table name in the payload
    schema and committed DDL (incl. CREATE/DROP TABLE) as op=ddl
    messages, so the replica registry evolves with the upstream one; the
    per-batch parse runs inside foreachBatch like the single-table chain
    (run_chained_stream)."""
    from ..lake.catalog import Catalog
    from .multi import apply_epoch_multi

    catalog = Catalog.create(spark, catalog_path)
    for name in tables or []:
        catalog.create_table(name, n_buckets=n_buckets, mode=mode)

    reader, parse = _wire_reader(spark, wire_format, mirror_dir,
                                 max_files_per_trigger)

    def fb(batch_df: DataFrame, epoch_id: int):
        apply_epoch_multi(Catalog(spark, catalog_path), parse(batch_df),
                          epoch_id, job_id=job_id, **apply_kwargs)

    writer = reader.writeStream.foreachBatch(fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time).start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return Catalog(spark, catalog_path)


def run_stream_multi(
    spark: SparkSession,
    feed_dir: str,
    catalog_path: str,
    checkpoint_dir: str,
    tables: list[str] | None = None,
    job_id: str = "stream",
    max_files_per_trigger: int | None = None,
    n_buckets: int = 16,
    mode: str = "cow",
    fail_at_epoch: int | None = None,
    processing_time: str | None = None,
    pre_filter=None,
    **apply_kwargs,
):
    """Streaming multi-table replay into a Catalog.  availableNow drain by
    default; ``processing_time`` switches to the continuous online tail
    (same trigger contract as run_stream — returns the query handle)."""
    from ..lake.catalog import Catalog
    from .multi import apply_epoch_multi

    catalog = Catalog.create(spark, catalog_path)
    for name in tables or []:
        catalog.create_table(name, n_buckets=n_buckets, mode=mode)

    reader = read_feed_stream(spark, feed_dir, max_files_per_trigger)

    def fb(batch_df: DataFrame, epoch_id: int):
        if fail_at_epoch is not None and epoch_id == fail_at_epoch:
            raise RuntimeError(f"injected crash before apply of epoch {epoch_id}")
        if pre_filter is not None:
            batch_df = pre_filter(batch_df)
        apply_epoch_multi(Catalog(spark, catalog_path), batch_df, epoch_id,
                          job_id=job_id, **apply_kwargs)

    writer = reader.writeStream.foreachBatch(fb).option(
        "checkpointLocation", checkpoint_dir
    )
    if processing_time is not None:
        return writer.trigger(processingTime=processing_time).start()
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    return Catalog(spark, catalog_path)


def read_final_state(spark: SparkSession, table_path: str) -> DataFrame:
    return LakeTable(spark, table_path).read()
