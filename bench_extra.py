"""Extra benchmarks + plan dumps for the optimization round (guide §1).

NOT the driver bench — bench.py stays frozen.  This harness isolates each
expensive query with the noop sink so the computation is timed without the
sink, and dumps `.explain("formatted")` for the plan-shape record
(plans/r06/<query>_{before,after}.txt).

Usage:
  python bench_extra.py explain <tag>      # dump plans/r06/*_<tag>.txt
  python bench_extra.py time <name> [...]  # isolated noop timings
  python bench_extra.py all <tag>          # both

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_TXNS as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TXNS = int(os.environ.get("BENCH_TXNS", "1000000"))
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def _spark():
    from openlogreplicator_spark.session import build_session

    return build_session("olr-bench-extra", cores=CPUS, shuffle_partitions=CPUS)


def _feed(spark, n=None, skew=0.0):
    from bench import feed_cache_dir
    from openlogreplicator_spark.sources.feed import read_feed_batch

    return read_feed_batch(spark, feed_cache_dir(n or N_TXNS, skew))


def _frames(spark):
    """name -> lazily-built DataFrame for every declared query's compute
    core (the part worth a plan dump)."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.operators.collapse import collapse_net_changes

    out = {}

    def parse_assemble():
        feed = _feed(spark)
        parts = assemble_transactions(feed)
        surv = match_partial_rollbacks(parts["committed"])
        return collapse_net_changes(
            surv.filter(F.col("op").isin("ins", "upd", "del")),
            ["role", "text", "tool", "ts"],
        )

    out["cdc_parse_assemble"] = parse_assemble

    def assemble_committed():
        feed = _feed(spark)
        return assemble_transactions(feed)["committed"]

    out["assemble_committed"] = assemble_committed

    def minhash():
        from openlogreplicator_spark.functions.dedup import minhash_candidate_pairs

        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        return minhash_candidate_pairs(docs, n_hashes=8, n_bands=4)

    out["dedup_minhash_pairs"] = minhash

    def _wire_dml():
        from bench import feed_cache_dir
        from openlogreplicator_spark.sources.feed import read_feed_batch

        wf = read_feed_batch(spark, feed_cache_dir(max(N_TXNS // 10, 1000), 0.0))
        return match_partial_rollbacks(
            assemble_transactions(wf)["committed"]
        ).filter(F.col("op").isin("ins", "upd", "del"))

    def _mirror_dirs():
        """Build (once per process) the same wire mirrors bench.py builds,
        in /dev/shm, so the parse frames exist."""
        import shutil as _sh

        from openlogreplicator_spark.functions.json_output import write_json_mirror
        from openlogreplicator_spark.sources.network import write_protobuf_mirror

        base = "/dev/shm/olr_bx_wire" if os.path.isdir("/dev/shm") else "/tmp/olr_bx_wire"
        mdir, pdir = os.path.join(base, "mirror"), os.path.join(base, "spool")
        if not os.path.exists(os.path.join(base, "_DONE")):
            _sh.rmtree(base, ignore_errors=True)
            wdml = _wire_dml()
            write_json_mirror(wdml, mdir, 0)
            write_protobuf_mirror(wdml, pdir, 0)
            open(os.path.join(base, "_DONE"), "w").write("ok")
        return mdir, pdir

    def json_wire_parse():
        from openlogreplicator_spark.sources.json_feed import read_json_feed

        mdir, _ = _mirror_dirs()
        return read_json_feed(spark, mdir)

    out["cdc_json_wire_parse"] = json_wire_parse

    def pb_wire_parse():
        from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed

        _, pdir = _mirror_dirs()
        return read_protobuf_feed(spark, pdir)

    out["cdc_protobuf_wire_parse"] = pb_wire_parse

    def brute_small():
        from openlogreplicator_spark.functions.similarity import brute_force_topk

        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        q = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), "embedding"
        )
        return brute_force_topk(emb.filter(F.col("vec_id") >= 10), q, k=5)

    out["ann_cosine_topk"] = brute_small
    return out


def dump_plans(tag: str, only=None):
    os.makedirs(PLAN_DIR, exist_ok=True)
    spark = _spark()
    for name, build in _frames(spark).items():
        if only and name not in only:
            continue
        df = build()
        if df is None:
            continue
        p = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"wrote {p}")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_queries(names):
    spark = _spark()
    frames = _frames(spark)
    times = {}
    for name in names:
        build = frames.get(name)
        if build is None:
            print(f"skip unknown {name}")
            continue
        df = build()
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        for trial in range(2):
            t0 = time.perf_counter()
            _noop(df)
            dt = time.perf_counter() - t0
            times.setdefault(name, []).append(round(dt, 3))
        print(name, times[name])
    print(times)


def time_wire_writes():
    """Isolated wire-egress timings (the writes ARE the action — no noop):
    same frames and best-of-2 discipline as bench.py's 3d block."""
    import shutil as _sh
    import tempfile

    from pyspark.sql import functions as F

    from bench import feed_cache_dir
    from openlogreplicator_spark.functions.json_output import write_json_mirror
    from openlogreplicator_spark.operators.assemble import (
        assemble_transactions,
        match_partial_rollbacks,
    )
    from openlogreplicator_spark.sources.feed import read_feed_batch
    from openlogreplicator_spark.sources.network import write_protobuf_mirror

    spark = _spark()
    wf = read_feed_batch(spark, feed_cache_dir(max(N_TXNS // 10, 1000), 0.0))
    wdml = match_partial_rollbacks(
        assemble_transactions(wf)["committed"]
    ).filter(F.col("op").isin("ins", "upd", "del"))
    base = tempfile.mkdtemp(prefix="olr-bx-w-",
                            dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    times = {}
    try:
        for name, fn in (
            ("cdc_json_wire_write",
             lambda: write_json_mirror(wdml, os.path.join(base, "m"), 0)),
            ("cdc_protobuf_wire_write",
             lambda: write_protobuf_mirror(wdml, os.path.join(base, "s"), 0)),
        ):
            for _ in range(2):
                t0 = time.perf_counter()
                fn()
                times.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3))
            print(name, times[name])
    finally:
        _sh.rmtree(base, ignore_errors=True)
    print(times)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "explain"
    if mode == "explain":
        dump_plans(sys.argv[2] if len(sys.argv) > 2 else "before",
                   only=set(sys.argv[3:]) or None)
    elif mode == "time":
        time_queries(sys.argv[2:])
    elif mode == "timew":
        time_wire_writes()
    elif mode == "all":
        dump_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
