"""spark-submit entry point.

Usage (cluster):
  spark-submit --py-files openlogreplicator_spark.zip job.py stream \\
      --feed /data/feed --table /lake/transcripts --checkpoint /ckpt/run1

  zip -r openlogreplicator_spark.zip openlogreplicator_spark/

Subcommands:
  gen-feed  — write a deterministic synthetic change feed
  replay    — bounded replay (ReplicatorBatch analog)
  stream    — tail the feed with Structured Streaming (availableNow by
              default; --continuous keeps the query running); with
              --from-mirror the feed is another instance's wire egress
              (--wire-format json|protobuf), multi-table with --tables
  show      — print final table state / lineage
  net-serve     — serve a protobuf spool over the WriterStream TCP protocol
  net-replicate — consume a redo stream over TCP into a replica table
  maintain      — off-epoch cluster() OPTIMIZE / retention vacuum
  config        — run a job from a reference-format OpenLogReplicator.json
                  (openlogreplicator_spark/config.py maps the schema)

In local mode the SparkSession is built here; under spark-submit an
existing session/conf is respected (getOrCreate).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    p = argparse.ArgumentParser(prog="openlogreplicator-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-feed")
    g.add_argument("--out", required=True)
    g.add_argument("--txns", type=int, default=10000)
    g.add_argument("--shards", type=int, default=4)
    g.add_argument("--files", type=int, default=16)
    g.add_argument("--skew", type=float, default=0.0)
    g.add_argument("--seed", type=int, default=42)

    for name in ("replay", "stream"):
        s = sub.add_parser(name)
        s.add_argument("--feed", required=True)
        s.add_argument("--table", required=True)
        s.add_argument("--tracked", default="^transcripts$")
        s.add_argument("--buckets", type=int, default=64)
        s.add_argument("--no-create", action="store_true")
        s.add_argument("--mode", choices=("cow", "mor"), default="cow",
                       help="copy-on-write or merge-on-read table")
        s.add_argument("--tables", nargs="*", default=None,
                       help="multi-table mode: tracked table names replicated "
                            "into a Catalog at --table (one LakeTable each)")
        if name == "stream":
            s.add_argument("--checkpoint", required=True)
            s.add_argument("--continuous", default=None, metavar="INTERVAL",
                           help="online tail: processingTime trigger (e.g. "
                                "'5 seconds') instead of availableNow drain")
            s.add_argument("--max-files-per-trigger", type=int, default=None)
            s.add_argument("--job-id", default="stream")
            s.add_argument("--json-mirror", default=None,
                           help="directory for the wire-format JSON egress")
            s.add_argument("--protobuf-spool", default=None,
                           help="directory for the binary RedoResponse "
                                "spool egress (feeds net-serve)")
            s.add_argument("--schemaless", action="store_true",
                           help="emit untracked tables on the mirror")
            s.add_argument("--max-txn-ops", type=int, default=None)
            s.add_argument("--max-open-scn-lag", type=int, default=None)
            s.add_argument("--shard-watermark", action="store_true")
            s.add_argument("--expected-shards", type=int, nargs="*", default=None)
            s.add_argument("--from-json-mirror", "--from-mirror",
                           dest="from_json_mirror", action="store_true",
                           help="treat --feed as another instance's wire "
                                "egress (JSON mirror or protobuf spool, see "
                                "--wire-format) and tail it (engine chaining)")
            s.add_argument("--wire-format", choices=("json", "protobuf"),
                           default="json",
                           help="wire format of the tailed mirror/spool")

    sh = sub.add_parser("show")
    sh.add_argument("--table", required=True)
    sh.add_argument("--lineage", action="store_true")

    ns = sub.add_parser("net-serve",
                        help="serve a protobuf spool over the WriterStream "
                             "TCP protocol (INFO/START/CONFIRM)")
    ns.add_argument("--spool", required=True)
    ns.add_argument("--db-name", default="transcripts_feed")
    ns.add_argument("--host", default="127.0.0.1")
    ns.add_argument("--port", type=int, default=7070)

    nr = sub.add_parser("net-replicate",
                        help="consume a redo stream over TCP into a replica "
                             "lake table (confirm-after-merge)")
    nr.add_argument("--host", default="127.0.0.1")
    nr.add_argument("--port", type=int, required=True)
    nr.add_argument("--db-name", default="transcripts_feed")
    nr.add_argument("--table", required=True)
    nr.add_argument("--buckets", type=int, default=64)
    nr.add_argument("--no-create", action="store_true")
    nr.add_argument("--job-id", default="netchain")
    nr.add_argument("--chunk-frames", type=int, default=100_000)

    cf = sub.add_parser("config",
                        help="run from a reference-format "
                             "OpenLogReplicator.json config file")
    cf.add_argument("--file", required=True)
    cf.add_argument("--table", default=None,
                    help="lake destination (default <state.path>/lake)")
    cf.add_argument("--checkpoint", default=None)
    cf.add_argument("--buckets", type=int, default=16)
    cf.add_argument("--continuous", default=None, metavar="INTERVAL")
    cf.add_argument("--plan", action="store_true",
                    help="print the translated JobPlan and exit (no Spark)")
    cf.add_argument("--lenient", action="store_true",
                    help="tolerate unknown config fields")

    mt = sub.add_parser("maintain",
                        help="off-epoch maintenance: cluster() OPTIMIZE "
                             "and/or retention vacuum")
    mt.add_argument("--table", required=True,
                    help="LakeTable path, or Catalog path with --catalog")
    mt.add_argument("--catalog", action="store_true")
    mt.add_argument("--cluster", action="store_true")
    mt.add_argument("--vacuum", type=int, default=None, metavar="RETAIN_LAST")

    args = p.parse_args(argv)

    if args.cmd == "config" and args.plan:
        from dataclasses import asdict

        from openlogreplicator_spark.config import plan_from_config

        plan = plan_from_config(args.file, strict=not args.lenient)
        import json as _json

        print(_json.dumps(asdict(plan), indent=2, default=str))
        return

    if args.cmd == "net-serve":
        from openlogreplicator_spark.sources.network import RedoStreamServer

        server = RedoStreamServer(args.spool, db_name=args.db_name,
                                  host=args.host, port=args.port)
        host, port = server.start()
        print(f"redo stream serving {args.spool} on {host}:{port} "
              f"(confirmed scn {server.confirmed_scn()}); Ctrl-C to stop")
        try:
            import time

            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return

    if args.cmd == "gen-feed":
        from openlogreplicator_spark.feedgen import generate_scaled_feed

        out = generate_scaled_feed(
            args.out, n_txns=args.txns, n_shards=args.shards,
            n_files=args.files, skew=args.skew, seed=args.seed,
        )
        print(f"feed written: {out}")
        return

    from openlogreplicator_spark.session import get_or_create

    spark = get_or_create("openlogreplicator-spark-job")

    if args.cmd == "config":
        from openlogreplicator_spark.config import run_from_config

        out = run_from_config(
            spark, args.file, table_path=args.table,
            checkpoint_dir=args.checkpoint, n_buckets=args.buckets,
            continuous=args.continuous, strict=not args.lenient,
        )
        if args.continuous is not None:
            print("configured tail running; Ctrl-C to stop")
            out.awaitTermination()
        elif hasattr(out, "table_names"):
            for name in out.table_names:
                print(f"{name}: rows={out.table(name).read().count()}")
        else:
            print(f"config job drained; table version "
                  f"{out.manifest['version']}, rows={out.read().count()}")
        return

    if args.cmd == "net-replicate":
        from openlogreplicator_spark.sources.network import replicate_from_stream
        from openlogreplicator_spark.streaming.job import create_target

        if not args.no_create:
            create_target(spark, args.table, n_buckets=args.buckets)
        res = replicate_from_stream(
            spark, args.host, args.port, args.db_name, args.table,
            job_id=args.job_id,
            chunk_frames=args.chunk_frames,
        )
        print(f"net replica drained: {res}")
    elif args.cmd == "maintain":
        if args.catalog:
            from openlogreplicator_spark.lake.catalog import Catalog

            target = Catalog(spark, args.table)
        else:
            from openlogreplicator_spark.lake import LakeTable

            target = LakeTable(spark, args.table)
        if args.cluster:
            print(f"cluster: {target.cluster()}")
        if args.vacuum is not None:
            print(f"vacuum: {target.vacuum(retain_last=args.vacuum)}")
    elif args.cmd == "replay" and args.tables:
        from openlogreplicator_spark.streaming.job import replay_batch_multi

        cat = replay_batch_multi(
            spark, args.feed, args.table, tables=args.tables,
            n_buckets=args.buckets, mode=args.mode,
        )
        for name in cat.table_names:
            print(f"{name}: rows={cat.table(name).read().count()}")
    elif args.cmd == "stream" and args.tables and args.from_json_mirror:
        from openlogreplicator_spark.streaming.job import run_chained_stream_multi

        out = run_chained_stream_multi(
            spark, args.feed, args.table, args.checkpoint, tables=args.tables,
            job_id=args.job_id, n_buckets=args.buckets, mode=args.mode,
            max_files_per_trigger=args.max_files_per_trigger,
            processing_time=args.continuous, wire_format=args.wire_format,
        )
        if args.continuous is not None:
            print(f"chained catalog tail running (trigger every "
                  f"{args.continuous}); Ctrl-C to stop")
            out.awaitTermination()
        else:
            for name in out.table_names:
                print(f"{name}: rows={out.table(name).read().count()}")
    elif args.cmd == "stream" and args.tables:
        from openlogreplicator_spark.streaming.job import run_stream_multi

        cat = run_stream_multi(
            spark, args.feed, args.table, args.checkpoint, tables=args.tables,
            job_id=args.job_id, n_buckets=args.buckets, mode=args.mode,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        for name in cat.table_names:
            print(f"{name}: rows={cat.table(name).read().count()}")
    elif args.cmd == "replay":
        from openlogreplicator_spark.streaming.job import replay_batch

        table = replay_batch(
            spark, args.feed, args.table, tracked_pattern=args.tracked,
            n_buckets=args.buckets, create=not args.no_create, mode=args.mode,
        )
        print(f"replayed; table version {table.manifest['version']}, "
              f"rows={table.read().count()}")
    elif args.cmd == "stream" and args.from_json_mirror:
        from openlogreplicator_spark.streaming.job import run_chained_stream

        out = run_chained_stream(
            spark, args.feed, args.table, args.checkpoint,
            job_id=args.job_id, tracked_pattern=args.tracked,
            max_files_per_trigger=args.max_files_per_trigger,
            n_buckets=args.buckets, create=not args.no_create, mode=args.mode,
            processing_time=args.continuous, wire_format=args.wire_format,
        )
        if args.continuous is not None:
            print(f"chained tail running (trigger every {args.continuous}); "
                  "Ctrl-C to stop")
            out.awaitTermination()
        else:
            print(f"mirror drained; table version {out.manifest['version']}, "
                  f"rows={out.read().count()}")
    elif args.cmd == "stream":
        from openlogreplicator_spark.streaming.job import run_stream

        out = run_stream(
            spark, args.feed, args.table, args.checkpoint,
            job_id=args.job_id, tracked_pattern=args.tracked,
            max_files_per_trigger=args.max_files_per_trigger,
            n_buckets=args.buckets, create=not args.no_create, mode=args.mode,
            json_mirror_dir=args.json_mirror,
            protobuf_spool_dir=args.protobuf_spool, schemaless=args.schemaless,
            max_txn_ops=args.max_txn_ops, max_open_scn_lag=args.max_open_scn_lag,
            shard_watermark=args.shard_watermark,
            expected_shards=args.expected_shards,
            processing_time=args.continuous,
        )
        if args.continuous is not None:
            print(f"online tail running (trigger every {args.continuous}); "
                  "Ctrl-C to stop")
            out.awaitTermination()
        else:
            print(f"stream drained; table version {out.manifest['version']}, "
                  f"rows={out.read().count()}")
    elif args.cmd == "show":
        from openlogreplicator_spark.lake import LakeTable

        t = LakeTable(spark, args.table)
        if args.lineage:
            t.lineage().orderBy("epoch_id", "shard").show(100, truncate=False)
        else:
            t.read().orderBy("conv_id", "turn_idx").show(50, truncate=False)


if __name__ == "__main__":
    main()
