"""Phase attribution for the MoR update epoch: which stage fails to scale
2 -> 8 cores?

Phases (cumulative plans, each its own action, fresh JVM per invocation):
  collapse_cache  assemble + collapse -> persist(level) + count  (the fused
                  stats job's cache-fill half)
  delta_shuffle   cached changes -> repartition(64,_bucket) ->
                  sortWithinPartitions -> noop sink   (shuffle+sort, no write)
  delta_write     same plan -> parquet partitionBy(_bucket) to tmpfs (the
                  real delta write)
  delta_write_nosh same write WITHOUT the repartition (task-level sort only;
                  trades the full shuffle for more, smaller files)

Usage: python tools/exp_mor_phases.py --cores 8 [--cache memser]
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

UPD_TXNS = int(os.environ.get("EXP_UPD_TXNS", "2500000"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--cache", default="memser")
    args = ap.parse_args()
    os.environ["OLR_CHANGES_CACHE"] = args.cache

    import bench as benchmod
    from pyspark.sql import functions as F

    from openlogreplicator_spark.lake.table import LakeTable
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
        reassemble_chunks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.operators.filters import split_tracked
    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch
    from openlogreplicator_spark.streaming.apply import _changes_cache_level

    spark = build_session("olr-exp-phase", cores=args.cores,
                          shuffle_partitions=64)
    feed = read_feed_batch(spark, benchmod.feed_cache_dir(UPD_TXNS, 0.0))
    base = f"/dev/shm/olrexp_upd_c{args.cores}/base_mor"
    tbl = LakeTable(spark, base)

    out = {"cores": args.cores, "cache": args.cache}

    parts = assemble_transactions(feed)
    surv = match_partial_rollbacks(parts["committed"], n_hint=0)
    tr, _ = split_tracked(
        surv.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
        "^transcripts$",
    )
    tdml = reassemble_chunks(tr, n_hint=0).filter(F.col("op") != "chunk")
    changes = collapse_net_changes(tdml, tbl.value_names).withColumn(
        "_bucket", tbl._bucket_expr()
    )
    lvl = _changes_cache_level()
    t0 = time.perf_counter()
    if lvl is not None:
        changes = changes.persist(lvl)
    n = changes.count()
    out["collapse_cache"] = round(time.perf_counter() - t0, 3)
    out["n_changes"] = n

    key = tbl.key_names
    sel = changes.select(
        *key, "is_delete", "reset", "set_cols", "vals",
        F.lit(1).cast("long").alias("_seq"), "_bucket",
    )

    t0 = time.perf_counter()
    (sel.repartition(64, "_bucket").sortWithinPartitions("_bucket", *key)
        .write.format("noop").mode("overwrite").save())
    out["delta_shuffle_noop"] = round(time.perf_counter() - t0, 3)

    wdir = tempfile.mkdtemp(prefix="olrph-", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        (sel.repartition(64, "_bucket").sortWithinPartitions("_bucket", *key)
            .write.partitionBy("_bucket").mode("overwrite")
            .parquet(os.path.join(wdir, "d1")))
        out["delta_write"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        (sel.sortWithinPartitions("_bucket", *key)
            .write.partitionBy("_bucket").mode("overwrite")
            .parquet(os.path.join(wdir, "d2")))
        out["delta_write_nosh"] = round(time.perf_counter() - t0, 3)
        nf1 = sum(len(fs) for _, _, fs in os.walk(os.path.join(wdir, "d1")))
        nf2 = sum(len(fs) for _, _, fs in os.walk(os.path.join(wdir, "d2")))
        out["files_shuffle"] = nf1
        out["files_nosh"] = nf2
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
