"""Stage-level scaling profile of the full tail->merge path.

Runs ONE core count per invocation (fresh JVM) and prints a JSON line with
per-phase wall times so two invocations (N vs 4N cores) show WHICH phase
fails to scale:

  phase_parse    assemble + prollback match + collapse -> noop sink
  phase_persist  same collapse plan persisted + counted (the apply_epoch
                 optimistic-fusion materialization)
  phase_write    LakeTable.merge from the persisted changes (salted
                 bucket-partitioned parquet write)
  full_merge     the real replay_batch (best-of-2), for cross-checking

Usage: python tools/profile_merge.py [--cores 8] [--txns 2000000]
       [--workdir /dev/shm|/tmp] [--skip-full]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--txns", type=int, default=2_000_000)
    ap.add_argument("--shuffle", type=int, default=64)
    ap.add_argument("--workdir", default="/dev/shm")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--cache-level", default="MEMORY_AND_DISK",
                    help="StorageLevel name for the changes persist")
    args = ap.parse_args()

    import bench as benchmod
    from pyspark.sql import functions as F

    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch

    feed_dir = benchmod.feed_cache_dir(args.txns, 0.0)
    spark = build_session(
        "olr-profile", cores=args.cores, shuffle_partitions=args.shuffle
    )
    feed = read_feed_batch(spark, feed_dir)
    n_events = feed.count()

    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.streaming.job import create_target

    out: dict = {
        "cores": args.cores,
        "txns": args.txns,
        "n_events": n_events,
        "workdir": args.workdir,
    }

    def changes_plan():
        parts = assemble_transactions(feed)
        surv = match_partial_rollbacks(parts["committed"])
        return collapse_net_changes(
            surv.filter(F.col("op").isin("ins", "upd", "del")),
            ["role", "text", "tool", "ts"],
        )

    # warm codegen on a slice
    assemble_transactions(feed.limit(20000))["committed"].write.format(
        "noop"
    ).mode("overwrite").save()

    t0 = time.perf_counter()
    changes_plan().write.format("noop").mode("overwrite").save()
    out["phase_parse"] = round(time.perf_counter() - t0, 3)

    work = tempfile.mkdtemp(prefix="olrprof-", dir=args.workdir)
    try:
        from pyspark import StorageLevel

        lvl = getattr(StorageLevel, args.cache_level)
        table = create_target(spark, os.path.join(work, "tbl"), n_buckets=64)
        ch = changes_plan().withColumn("_bucket", table._bucket_expr()).persist(lvl)
        t0 = time.perf_counter()
        affected = [r["_bucket"] for r in ch.select("_bucket").distinct().collect()]
        out["phase_persist"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        table.merge(ch, 0, job_id="profile", affected=affected, lineage_rows=[])
        out["phase_write"] = round(time.perf_counter() - t0, 3)
        ch.unpersist()

        if not args.skip_full:
            from openlogreplicator_spark.streaming.job import replay_batch

            def merge_once(tag):
                t0 = time.perf_counter()
                replay_batch(
                    spark, feed, os.path.join(work, f"tbl{tag}"), n_buckets=64
                )
                return time.perf_counter() - t0

            out["full_merge"] = round(min(merge_once("_w0"), merge_once("_r")), 3)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
