#!/bin/bash
# Phase-level scaling experiments for the full tail->merge leg (the one
# sub-0.8 median in BENCH_SCALING.json).  Fresh JVM per invocation.
# Usage: bash tools/scaling_experiments.sh [txns]
set -u
TXNS=${1:-2000000}
cd "$(dirname "$0")/.."
OUT=/tmp/scaling_exp.jsonl
: > "$OUT"

phases() { # label cores cache-level
  local label=$1 cores=$2 lvl=$3
  echo "== phases $label cores=$cores" >&2
  python tools/profile_merge.py --cores "$cores" --txns "$TXNS" \
      --skip-full --cache-level "$lvl" 2>/dev/null \
    | python -c "import sys,json; d=json.loads(sys.stdin.read().strip().splitlines()[-1]); d['label']='$label'; print(json.dumps(d))" \
    | tee -a "$OUT"
}

full() { # label cores extra-env...
  local label=$1 cores=$2; shift 2
  echo "== full $label cores=$cores" >&2
  env "$@" python - "$TXNS" "$cores" "$label" <<'EOF' | tee -a "$OUT"
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, os.getcwd())
txns, cores, label = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import bench as benchmod
from openlogreplicator_spark.session import build_session
from openlogreplicator_spark.sources.feed import read_feed_batch
from openlogreplicator_spark.operators.assemble import assemble_transactions
from openlogreplicator_spark.streaming.job import replay_batch
feed_dir = benchmod.feed_cache_dir(txns, 0.0)
spark = build_session("olr-exp", cores=cores, shuffle_partitions=64)
feed = read_feed_batch(spark, feed_dir)
n = feed.count()
assemble_transactions(feed.limit(20000))["committed"].write.format("noop").mode("overwrite").save()
work = tempfile.mkdtemp(prefix="olrexp-", dir="/dev/shm")
try:
    def once(tag):
        t0 = time.perf_counter()
        replay_batch(spark, feed, os.path.join(work, f"t{tag}"), n_buckets=64)
        return time.perf_counter() - t0
    dt = min(once("_w0"), once("_r"))
    print(json.dumps({"label": label, "cores": cores, "full_merge": round(dt, 3),
                      "n_events": n, "evps": round(n / dt, 1)}))
finally:
    shutil.rmtree(work, ignore_errors=True)
EOF
}

phases disk_ph_2 2 DISK_ONLY
phases disk_ph_8 8 DISK_ONLY
full disk_2 2 OLR_CHANGES_CACHE=disk
full disk_8 8 OLR_CHANGES_CACHE=disk
full none_2 2 OLR_CHANGES_CACHE=none
full none_8 8 OLR_CHANGES_CACHE=none

echo "== summary" >&2
python - "$OUT" <<'EOF'
import json, sys
rows = {}
for l in open(sys.argv[1]):
    d = json.loads(l)
    rows[d["label"]] = d
a, b = rows.get("disk_ph_2"), rows.get("disk_ph_8")
if a and b:
    for ph in ("phase_parse", "phase_persist", "phase_write"):
        eff = a[ph] / (4 * b[ph]) if b.get(ph) else 0
        print(f"phases {ph:14s} 2c={a[ph]:8.2f}s 8c={b[ph]:8.2f}s eff={eff:.3f}")
for cfg in ("disk", "none"):
    a, b = rows.get(f"{cfg}_2"), rows.get(f"{cfg}_8")
    if a and b:
        eff = a["full_merge"] / (4 * b["full_merge"])
        print(f"full   {cfg:14s} 2c={a['full_merge']:8.2f}s 8c={b['full_merge']:8.2f}s eff={eff:.3f}")
EOF
