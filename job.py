"""spark-submit entry point.

Usage (cluster):
  spark-submit --py-files openlogreplicator_spark.zip job.py stream \\
      --feed /data/feed --table /lake/transcripts --checkpoint /ckpt/run1

  zip -r openlogreplicator_spark.zip openlogreplicator_spark/

Subcommands:
  gen-feed  — write a deterministic synthetic change feed
  replay    — bounded replay (ReplicatorBatch analog)
  stream    — tail the feed with Structured Streaming (availableNow by
              default; --continuous keeps the query running)
  show      — print final table state / lineage

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
            s.add_argument("--schemaless", action="store_true",
                           help="emit untracked tables on the mirror")
            s.add_argument("--max-txn-ops", type=int, default=None)
            s.add_argument("--max-open-scn-lag", type=int, default=None)
            s.add_argument("--shard-watermark", action="store_true")
            s.add_argument("--expected-shards", type=int, nargs="*", default=None)
            s.add_argument("--from-json-mirror", action="store_true",
                           help="treat --feed as another instance's JSON "
                                "mirror output and tail it (engine chaining)")

    sh = sub.add_parser("show")
    sh.add_argument("--table", required=True)
    sh.add_argument("--lineage", action="store_true")

    args = p.parse_args(argv)

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

    if args.cmd == "replay" and args.tables:
        from openlogreplicator_spark.streaming.job import replay_batch_multi

        cat = replay_batch_multi(
            spark, args.feed, args.table, tables=args.tables,
            n_buckets=args.buckets, mode=args.mode,
        )
        for name in cat.table_names:
            print(f"{name}: rows={cat.table(name).read().count()}")
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
            processing_time=args.continuous,
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
            json_mirror_dir=args.json_mirror, schemaless=args.schemaless,
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
