"""Update-epoch scaling experiment: which OLR_CHANGES_CACHE level scales
best on the 4N leg of the MoR/CoW update epoch?

Context (round 5): the DISK_ONLY changes-cache default fixed the full
tail->merge leg (every post-fix draw >=0.837) but the MoR update epoch's
8-core throughput dropped ~383k -> 262k ev/s vs the pre-fix deserialized
cache.  The update epoch is cache-traffic-heavy relative to its compute
(the collapse is cheap -- mostly distinct keys -- so the serialize ->
tmpfs write -> read-back round trip is a bigger fraction than in the full
merge, where GC pressure dominated).  This tool measures apply_epoch wall
time per (cores, cache-level, mode) in a fresh JVM each, reusing one
bootstrap per (cores) via directory snapshot + cp.

Usage:
  python tools/exp_update_epoch.py prepare --cores 8   # bootstrap base tables
  python tools/exp_update_epoch.py trial --cores 8 --cache disk --mode mor
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_TXNS = int(os.environ.get("EXP_BASE_TXNS", "5000000"))
UPD_TXNS = int(os.environ.get("EXP_UPD_TXNS", "2500000"))


def root_dir(cores: int) -> str:
    return f"/dev/shm/olrexp_upd_c{cores}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["prepare", "trial"])
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--cache", default="disk")
    ap.add_argument("--mode", default="mor", choices=["mor", "cow"])
    args = ap.parse_args()

    import bench as benchmod
    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch

    rd = root_dir(args.cores)

    if args.cmd == "prepare":
        from openlogreplicator_spark.streaming.job import replay_batch

        spark = build_session("olr-exp-upd", cores=args.cores,
                              shuffle_partitions=64)
        feed = read_feed_batch(spark, benchmod.feed_cache_dir(BASE_TXNS, 0.0))
        os.makedirs(rd, exist_ok=True)
        for mode in ("cow", "mor"):
            base = os.path.join(rd, f"base_{mode}")
            if os.path.isdir(base):
                continue
            t0 = time.perf_counter()
            replay_batch(spark, feed, base, n_buckets=64, mode=mode)
            print(f"bootstrap {mode} {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr)
        print(json.dumps({"prepared": rd}))
        return

    os.environ["OLR_CHANGES_CACHE"] = args.cache
    from openlogreplicator_spark.lake import LakeTable
    from openlogreplicator_spark.streaming.apply import apply_epoch

    spark = build_session("olr-exp-upd", cores=args.cores,
                          shuffle_partitions=64)
    upd = read_feed_batch(spark, benchmod.feed_cache_dir(UPD_TXNS, 0.0))
    n_upd = upd.count()
    # NOTE: the single timed apply below includes cold codegen/JIT (no
    # warm-up epoch runs first), so absolute ev/s understates bench.py's
    # best-of-2 steady state; A/B ranking between variants stays fair
    # because every variant pays the same cold start
    base = os.path.join(rd, f"base_{args.mode}")
    trial = os.path.join(rd, f"trial_{args.mode}_{args.cache}")
    shutil.rmtree(trial, ignore_errors=True)
    shutil.copytree(base, trial)
    t0 = time.perf_counter()
    apply_epoch(LakeTable(spark, trial), upd, 1, job_id="batch")
    dt = time.perf_counter() - t0
    shutil.rmtree(trial, ignore_errors=True)
    print(json.dumps({
        "cores": args.cores, "cache": args.cache, "mode": args.mode,
        "sec": round(dt, 3), "n_events": n_upd,
        "evps": round(n_upd / dt, 1),
    }))


if __name__ == "__main__":
    main()
