"""A/B the status-join strategy on the 10M-event parse_assemble path.

Each variant runs in ITS OWN fresh JVM (subprocess) to keep codegen/GC
state comparable.  Usage: python tools/exp_join_conf.py            # all
       EXP_VARIANT=name python tools/exp_join_conf.py  # one (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VARIANTS = {
    "base": {},
    "aqe_bhj256": {"spark.sql.adaptive.autoBroadcastJoinThreshold": "256m"},
    "aqe_shj256": {"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "256m",
                   "spark.sql.join.preferSortMergeJoin": "false"},
    "both": {"spark.sql.adaptive.autoBroadcastJoinThreshold": "256m",
             "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "256m",
             "spark.sql.join.preferSortMergeJoin": "false"},
}


def run_one(name: str):
    from pyspark.sql import functions as F

    import bench as benchmod
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes
    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch

    spark = build_session(f"exp-join-{name}", cores=32, shuffle_partitions=32,
                          extra_conf=VARIANTS[name])
    feed = read_feed_batch(spark, benchmod.feed_cache_dir(1_000_000, 0.0))
    feed.count()

    def parse_assemble():
        parts = assemble_transactions(feed)
        surv = match_partial_rollbacks(parts["committed"])
        net = collapse_net_changes(
            surv.filter(F.col("op").isin("ins", "upd", "del")),
            ["role", "text", "tool", "ts"],
        )
        net.write.format("noop").mode("overwrite").save()

    # warmup on a slice, then best-of-2 like bench.py
    assemble_transactions(feed.limit(20000))["committed"].write.format(
        "noop").mode("overwrite").save()
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        parse_assemble()
        ts.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"variant": name, "times": ts, "best": min(ts)}))


if __name__ == "__main__":
    v = os.environ.get("EXP_VARIANT")
    if v:
        run_one(v)
    else:
        for name in VARIANTS:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=dict(os.environ, EXP_VARIANT=name),
                capture_output=True, text=True, timeout=900,
            )
            out = [l for l in p.stdout.splitlines() if l.startswith("{")]
            print(out[-1] if out else f"{name} FAILED: {p.stderr[-500:]}")
