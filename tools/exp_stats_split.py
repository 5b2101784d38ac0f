"""Split the fused stats job: branch-union cost vs collapse-persist cost.

  t_stats_only   epoch_stats WITHOUT the cnt branch (no collapse persist)
  t_collapse     persist+count of the collapse frame alone
  t_fused        the real fused job (cnt branch riding epoch_stats)

Usage: python tools/exp_stats_split.py [--txns 1000000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
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
    from openlogreplicator_spark.streaming.stats import (
        collapse_counts_branch,
        epoch_stats,
    )

    spark = build_session("exp-stats-split", cores=args.cores,
                          shuffle_partitions=args.cores)
    feed = read_feed_batch(spark, benchmod.feed_cache_dir(args.txns, 0.0))
    feed.count()
    assemble_transactions(feed.limit(20000))["committed"].write.format(
        "noop").mode("overwrite").save()

    fields = [f.name for f in CHANGE_EVENT_SCHEMA.fields]

    def build():
        events = feed.select(*fields).withColumn("_pend", F.lit(False))
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
        changes0 = collapse_net_changes(
            tdml0, ["role", "text", "tool", "ts"]
        ).withColumn("_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(64)).cast("int"))
        is_tracked = F.col("table_name").isNotNull() & F.col(
            "table_name").rlike("^transcripts$")
        return events, parts, changes0, is_tracked

    out = {"cores": args.cores}
    for trial in range(2):
        r = {}
        events, parts, changes0, is_tracked = build()
        t0 = time.perf_counter()
        epoch_stats(feed, parts,
                    untracked_cond=~F.coalesce(is_tracked, F.lit(False)),
                    pending_flag="_pend",
                    pending_events=events.filter(F.col("_pend")))
        r["t_stats_only"] = round(time.perf_counter() - t0, 3)

        ch = changes0.persist(_changes_cache_level())
        t0 = time.perf_counter()
        ch.groupBy("_bucket", "last_shard").agg(
            F.count(F.lit(1)).alias("n")).collect()
        r["t_collapse"] = round(time.perf_counter() - t0, 3)
        ch.unpersist()

        events, parts, changes0, is_tracked = build()
        ch = changes0.persist(_changes_cache_level())
        t0 = time.perf_counter()
        epoch_stats(feed, parts,
                    untracked_cond=~F.coalesce(is_tracked, F.lit(False)),
                    pending_flag="_pend",
                    extra_branches=[collapse_counts_branch(ch)],
                    pending_events=events.filter(F.col("_pend")))
        r["t_fused"] = round(time.perf_counter() - t0, 3)
        ch.unpersist()
        out[f"trial{trial}"] = r
    print(json.dumps(out))


if __name__ == "__main__":
    main()
