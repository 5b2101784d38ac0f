"""Scaling-efficiency evidence (BASELINE.json north_rule): run bench.py at
two parallelism levels (N=local[8], 4N=local[32]) on the SAME input in
fresh JVMs, report throughput at both plus efficiency (T_4N/T_N)/4.

Writes BENCH_SCALING.json and prints a markdown table for BASELINE.md.

Usage: python tools/bench_scaling.py [--txns 120000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, txns: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_TXNS=str(txns), BENCH_ONLY="cdc")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"bench.py failed at cpus={cpus}")
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--txns", type=int, default=120000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--n4", type=int, default=32)
    args = ap.parse_args()

    # warm the shared feed cache once so neither run pays generation
    sys.path.insert(0, REPO)
    import bench as benchmod

    benchmod.feed_cache_dir(args.txns, 0.0)
    benchmod.feed_cache_dir(max(args.txns // 2, 1000), 2.0)

    r_n = run_bench(args.n, args.txns)
    r_4n = run_bench(args.n4, args.txns)

    report = {"n_cpus": args.n, "n4_cpus": args.n4, "txns": args.txns,
              "runs": {"N": r_n, "4N": r_4n}, "efficiency": {}}
    rows = []
    for key in ("events_per_sec_parse_assemble", "events_per_sec_full_merge",
                "events_per_sec_skewed"):
        tn, t4 = r_n.get(key), r_4n.get(key)
        if not tn or not t4:
            continue
        eff = (t4 / tn) / (args.n4 / args.n)
        report["efficiency"][key] = round(eff, 3)
        rows.append((key, tn, t4, round(eff, 3)))

    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(report, f, indent=1)

    print("| metric | events/s @ local[%d] | events/s @ local[%d] | scaling efficiency |"
          % (args.n, args.n4))
    print("|---|---|---|---|")
    for k, tn, t4, eff in rows:
        print(f"| {k} | {tn:,.0f} | {t4:,.0f} | {eff} |")
    print(json.dumps(report["efficiency"]))


if __name__ == "__main__":
    main()
