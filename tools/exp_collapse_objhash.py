"""A/B: SortAggregate collapse (onesort) vs max_by/ObjectHashAggregate.

Checks both wall time AND result equality on the 10M bench feed.

Usage: python tools/exp_collapse_objhash.py [--txns 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def collapse_objhash(dml, active_columns, extra_group=None):
    """max_by formulation: identical results, hash-based aggregation (the
    TypedImperative max_by flips the plan to ObjectHashAggregate, which
    needs no sort)."""
    from pyspark.sql import functions as F

    KEY = ["conv_id", "turn_idx"]
    universe = [c for c in dml.schema["after"].dataType.names]
    gkey = (extra_group or []) + KEY
    d = dml.withColumn("_ord", F.struct(F.col("txn_commit_scn"), F.col("seq_in_txn")))
    is_write = F.col("op").isin("ins", "upd")
    aggs = [
        F.max_by(F.struct(F.col("_ord"), F.col("op"), F.col("shard")), F.col("_ord")).alias("_last"),
        F.max(F.when(F.col("op").isin("ins", "del"), F.col("_ord"))).alias("_boundary"),
        F.max(F.col("lsn")).alias("last_lsn"),
    ]
    for c in universe:
        if c in active_columns:
            sets_c = is_write & F.array_contains(
                F.coalesce(F.col("changed_cols"), F.array()), c
            )
        else:
            sets_c = F.lit(False)
        aggs.append(
            F.max_by(
                F.struct(F.col("_ord"), F.col("after").getField(c).alias("v")),
                F.when(sets_c, F.col("_ord")),
            ).alias(f"_m_{c}")
        )
    g = d.groupBy(*gkey).agg(*aggs)

    def gated(c):
        m = F.col(f"_m_{c}")
        return m.isNotNull() & (
            F.col("_boundary").isNull() | (m.getField("_ord") >= F.col("_boundary"))
        )

    set_cols = F.array_compact(
        F.array(*[F.when(gated(c), F.lit(c)) for c in universe])
    )
    vals = F.struct(
        *[F.when(gated(c), F.col(f"_m_{c}").getField("v")).alias(c) for c in universe]
    )
    return g.select(
        *gkey,
        (F.col("_last").getField("op") == "del").alias("is_delete"),
        F.col("_boundary").isNotNull().alias("reset"),
        set_cols.alias("set_cols"),
        vals.alias("vals"),
        F.col("_last").getField("shard").alias("last_shard"),
        F.col("last_lsn"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--txns", type=int, default=1_000_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    import bench as benchmod
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch

    spark = build_session("exp-objhash", cores=args.cores,
                          shuffle_partitions=args.cores)
    feed = read_feed_batch(spark, benchmod.feed_cache_dir(args.txns, 0.0))
    feed.count()
    assemble_transactions(feed.limit(20000))["committed"].write.format(
        "noop").mode("overwrite").save()

    def dml():
        surv = match_partial_rollbacks(
            assemble_transactions(feed)["committed"], n_hint=0)
        return surv.filter(F.col("op").isin("ins", "upd", "del"))

    cols = ["role", "text", "tool", "ts"]
    out = {}
    for name, fn in (
        ("onesort", lambda: collapse_net_changes(dml(), cols)),
        ("objhash", lambda: collapse_objhash(dml(), cols)),
        ("objhash_repart", lambda: collapse_objhash(
            dml().repartition("conv_id", "turn_idx"), cols)),
    ):
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = ts
    print(json.dumps(out))

    if args.check:
        a = collapse_net_changes(dml(), cols)
        b = collapse_objhash(dml(), cols)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(json.dumps({"diff_rows": diff}))


if __name__ == "__main__":
    main()
