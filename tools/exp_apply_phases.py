"""Phase attribution for the real apply_epoch on the 10M-event bench feed.

Re-plays apply_epoch's optimistic no-DDL path step by step with timers:
  t_stats   the ONE fused stats job (materializes the collapse cache too)
  t_merge   LakeTable.merge from the warm cache (the bucketed write)
  t_rest    everything else (manifest, planning, driver)
Compare against replay_batch wall to validate the split.

Usage: python tools/exp_apply_phases.py [--txns 1000000] [--cores 32]
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
    ap.add_argument("--txns", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench as benchmod
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
        reassemble_chunks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.operators.filters import split_tracked
    from openlogreplicator_spark.schema import CHANGE_EVENT_SCHEMA
    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch
    from openlogreplicator_spark.streaming.apply import _changes_cache_level
    from openlogreplicator_spark.streaming.job import create_target
    from openlogreplicator_spark.streaming.stats import (
        collapse_counts_branch,
        epoch_stats,
    )

    spark = build_session("exp-phases", cores=args.cores,
                          shuffle_partitions=args.cores)
    feed = read_feed_batch(spark, benchmod.feed_cache_dir(args.txns, 0.0))
    n_events = feed.count()
    # warm codegen
    assemble_transactions(feed.limit(20000))["committed"].write.format(
        "noop").mode("overwrite").save()

    out = {"cores": args.cores, "n_events": n_events}
    work = tempfile.mkdtemp(prefix="olrphase-", dir="/dev/shm")
    try:
        for trial in range(2):
            table = create_target(spark, os.path.join(work, f"tbl{trial}"),
                                  n_buckets=64)
            fields = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
            ev_schema = feed.select(*fields).schema
            pending = table.pending(ev_schema)
            events = (
                feed.select(*fields).withColumn("_pend", F.lit(False))
                .unionByName(
                    pending.select(*fields).withColumn("_pend", F.lit(True)))
            )
            t0 = time.perf_counter()
            parts = assemble_transactions(events)
            committed_all = parts["committed"].select(
                "lsn", "shard", "xid", "seq_in_txn", "op", "table_name",
                "conv_id", "turn_idx", "before", "after", "changed_cols",
                "chunk_no", "chunk_text", "ddl_stmt", "txn_commit_scn", "ts",
                "attrs",
            )
            surv0 = match_partial_rollbacks(committed_all, n_hint=0)
            tr0, _ = split_tracked(
                surv0.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
                "^transcripts$",
            )
            tdml0 = reassemble_chunks(tr0, n_hint=0).filter(F.col("op") != "chunk")
            changes0 = collapse_net_changes(tdml0, table.value_names).withColumn(
                "_bucket", table._bucket_expr()
            ).persist(_changes_cache_level())
            is_tracked = F.col("table_name").isNotNull() & F.col(
                "table_name").rlike("^transcripts$")
            t_plan = time.perf_counter() - t0

            t0 = time.perf_counter()
            stats = epoch_stats(
                feed, parts,
                untracked_cond=~F.coalesce(is_tracked, F.lit(False)),
                pending_flag="_pend",
                extra_branches=[collapse_counts_branch(changes0)],
                pending_events=events.filter(F.col("_pend")),
                events=events,
            )
            t_stats = time.perf_counter() - t0

            affected = sorted({b for (_t, _s, b) in stats["counts"]})
            t0 = time.perf_counter()
            table.merge(changes0, epoch_id="0:0", job_id="x",
                        affected=affected, lineage_rows=[])
            t_merge = time.perf_counter() - t0
            changes0.unpersist()
            out[f"trial{trial}"] = {
                "t_plan": round(t_plan, 3),
                "t_stats": round(t_stats, 3),
                "t_merge": round(t_merge, 3),
                "total": round(t_plan + t_stats + t_merge, 3),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
