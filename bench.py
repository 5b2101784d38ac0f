"""Benchmark harness — prints ONE JSON line.

Headline: CDC replay throughput (the reference's discard-writer benchmark
analog plus the full tail→merge path) over a deterministic scaled feed,
plus the heaviest training-data operators at $SPARK_GRAFT_SF_DIR.

JVM isolation: the CDC suite and the side (training-data) queries run in
SEPARATE subprocess JVMs.  Round 2 measured the side queries 1.5-2.2×
slower when they shared a JVM with the 10M-event CDC suite (GC/page-cache
contamination, operators byte-identical) — fresh sessions make each number
reproducible in isolation.  Invoking with BENCH_GROUP set runs one group
and prints its JSON; without it, the orchestrator runs both and merges.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  BENCH_TXNS           override feed size (default 1,000,000 txns ≈ 10M
                       events — the SAME deterministic feed the scaling
                       harness (tools/bench_scaling.py) measures, so the
                       headline ev/s and BENCH_SCALING.json tell one story)
  BENCH_ONLY=cdc       skip the side group (scaling runs)
  BENCH_SKIP_SKEW=1    skip the skew/update measurements (scaling runs)
  BENCH_UPDATE=1       include the update-epoch (CoW vs MoR) measurements
                       even under BENCH_SKIP_SKEW (scaling runs measure the
                       merge-on-read steady-state update path)
  BENCH_UPDATE_TXNS    size of the update epoch in txns (default N_TXNS/10;
                       the scaling harness raises it so variable work
                       dominates the fixed per-epoch cost)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_TXNS = int(os.environ.get("BENCH_TXNS", "1000000"))
ONLY = os.environ.get("BENCH_ONLY", "")  # "cdc" → skip non-CDC queries (scaling runs)
SHUFFLE = int(os.environ.get("BENCH_SHUFFLE", "0"))  # 0 → default (= cpus)


def _work_base() -> str:
    d = os.environ.get("BENCH_WORK_DIR")
    if d:
        return d
    return "/dev/shm" if os.access("/dev/shm", os.W_OK) else None  # type: ignore[return-value]


def feed_cache_dir(n_txns: int, skew: float) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    d = f"{base}/olr_bench_feed_t{n_txns}_s{skew}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        from openlogreplicator_spark.feedgen import generate_scaled_feed

        generate_scaled_feed(
            d, n_txns=n_txns, avg_ops_per_txn=8, n_convs=max(n_txns // 10, 100),
            n_shards=4, n_files=32, skew=skew, seed=42,
        )
        open(marker, "w").write("ok")
    return d


_ANN_DIM = 64
_ANN_BLOCK = 4096


def _ann_n_clusters(n: int) -> int:
    """Cluster count scales with corpus size (~100 members each) so the
    intra-cluster top-k problem stays PQ-rankable at any n: a query's true
    neighbors are its ~100 cluster siblings (inter-cluster cosine ≈ 0 in
    64-d), so an ADC shortlist of a few hundred captures them all and the
    exact rerank restores order.  A fixed small K at n=10M would put 10k
    near-duplicates per cluster — ranking WITHIN the noise floor, which no
    coded index (or any real ANN benchmark corpus) is asked to do."""
    return max(1024, n // 100)


def _ann_center_block(cb: int):
    import numpy as np

    c = np.random.RandomState(777_001 + cb).randn(_ANN_BLOCK, _ANN_DIM)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _ann_centers_for(cids):
    """Unit cluster centers, generated block-deterministically (4096 per
    block) so executors materialize only the blocks their ids touch —
    no O(K) centers matrix shipped or rebuilt per task."""
    import numpy as np

    cids = np.asarray(cids, dtype=np.int64)
    out = np.empty((len(cids), _ANN_DIM))
    for cb in np.unique(cids // _ANN_BLOCK):
        blk = _ann_center_block(int(cb))
        sel = (cids // _ANN_BLOCK) == cb
        out[sel] = blk[cids[sel] - cb * _ANN_BLOCK]
    return out


def _ann_block_noise(blk: int):
    import numpy as np

    return np.random.RandomState(100_003 + blk).randn(_ANN_BLOCK, _ANN_DIM)


def _ann_vectors_for_ids(ids, n_clusters: int):
    """Deterministic clustered corpus row formula, independent of Arrow
    batching: vec(id) = unit(center[id % K] + r * noise_block[id]) with
    noise and centers drawn per aligned 4096-index block.  The noise is
    scaled so its VECTOR norm is ~0.25 (r = 0.25/sqrt(dim)) — a raw
    0.25*randn(64) term has norm ~2 and drowns the unit center (intra-
    cluster cosine ~0.2 vs inter ~0±0.12: no ANN structure to find).
    Tight ~100-member clusters (intra-cos ~0.97, inter ~0) are the
    realistic embedding-corpus shape ANN serving targets."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    noise = np.empty((len(ids), _ANN_DIM))
    for blk in np.unique(ids // _ANN_BLOCK):
        nb = _ann_block_noise(int(blk))
        sel = (ids // _ANN_BLOCK) == blk
        noise[sel] = nb[ids[sel] - blk * _ANN_BLOCK]
    v = (_ann_centers_for(ids % n_clusters)
         + (0.25 / np.sqrt(_ANN_DIM)) * noise)
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")


def ann_corpus_dir(spark, n: int) -> str:
    """Materialize (once, tmpfs-cached) the n-vector clustered corpus for
    the scale-honest ANN pair — synthesized deterministically, no external
    data (the sf tables top out at 2k vectors)."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    n_clusters = _ann_n_clusters(n)
    d = f"{base}/olr_bench_ann_n{n}_d{_ANN_DIM}_k{n_clusters}_t25"
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)

    def gen(batches):
        import pandas as pd

        for b in batches:
            ids = b["id"].to_numpy()
            v = _ann_vectors_for_ids(ids, n_clusters)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    (
        spark.range(n, numPartitions=64)
        .mapInPandas(gen, "vec_id long, embedding array<float>")
        .write.mode("overwrite")
        .parquet(os.path.join(d, "data"))
    )
    open(marker, "w").write("ok")
    return d


def _timed(times, name, fn, best_of: int = 1):
    """Record wall time; ``best_of > 1`` keeps the fastest run — the
    steady-state number for a long-running engine (first run pays one-time
    codegen/JIT), and the variance damper on a shared box (±30% run-to-run
    measured on identical code)."""
    best = None
    for _ in range(best_of):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    times[name] = round(best, 3)
    return out


def run_cdc_group() -> dict:
    from pyspark.sql import functions as F

    from openlogreplicator_spark.session import build_session
    from openlogreplicator_spark.sources.feed import read_feed_batch

    spark = build_session("olr-bench-cdc", cores=CPUS, shuffle_partitions=SHUFFLE or CPUS)
    times: dict[str, float] = {}
    extra: dict[str, float] = {}

    skip_skew = os.environ.get("BENCH_SKIP_SKEW") == "1"
    feed_dir = feed_cache_dir(N_TXNS, 0.0)
    feed = read_feed_batch(spark, feed_dir)
    n_events = feed.count()  # also warms the JVM / file listing

    # 1) parse+assemble only (Discard-writer analog): full assembly +
    #    collapse, noop sink — measures the engine minus the table rewrite
    def parse_assemble():
        from openlogreplicator_spark.operators.assemble import (
            assemble_transactions,
            match_partial_rollbacks,
        )
        from openlogreplicator_spark.operators.collapse import collapse_net_changes

        # NO persist here: measured — caching 10M wide rows costs ~3x more
        # than letting the savepoint probe re-scan the (tmpfs, pushed-down)
        # feed.  apply_epoch persists because it reuses committed 4+ times;
        # this path reuses it twice.
        parts = assemble_transactions(feed)
        surv = match_partial_rollbacks(parts["committed"])
        net = collapse_net_changes(
            surv.filter(F.col("op").isin("ins", "upd", "del")),
            ["role", "text", "tool", "ts"],
        )
        net.write.format("noop").mode("overwrite").save()

    # warm codegen/broadcast machinery on a slice so the measured run is
    # steady-state (the reference's numbers would equally exclude startup)
    def warmup():
        from openlogreplicator_spark.operators.assemble import assemble_transactions

        assemble_transactions(feed.limit(20000))["committed"].write.format(
            "noop"
        ).mode("overwrite").save()

    warmup()
    _timed(times, "cdc_parse_assemble", parse_assemble, best_of=2)

    # 2) full tail→merge into the lake table (one bounded epoch).
    # Work dir on tmpfs when available (BENCH_WORK_DIR overrides): the sink
    # write must land on the same storage tier as the shuffle — on this box
    # /tmp is a single spinning-rust-speed vda and its flush bandwidth
    # neither scales with cores nor stays stable across draws; on a real
    # cluster the sink is distributed storage whose bandwidth scales with
    # the executor count.
    work = tempfile.mkdtemp(prefix="olrbench-", dir=_work_base())

    # best-of-2: the engine is a long-running streaming job, so the
    # steady-state (warm-JVM) epoch cost is the honest headline — the first
    # run pays one-time codegen/classloading that a real deployment pays
    # once per process lifetime, not per epoch
    def merge_once(src_feed, tag):
        from openlogreplicator_spark.streaming.job import replay_batch

        t0 = time.perf_counter()
        replay_batch(spark, src_feed, os.path.join(work, f"tbl{tag}"), n_buckets=64)
        return time.perf_counter() - t0

    times["cdc_full_merge"] = round(
        min(merge_once(feed, "_w0"), merge_once(feed, "")), 3
    )
    extra["events_per_sec_full_merge"] = round(n_events / times["cdc_full_merge"], 1)
    extra["events_per_sec_parse_assemble"] = round(
        n_events / times["cdc_parse_assemble"], 1
    )
    extra["n_events"] = n_events

    # 3) skewed feed (hot conversation) — SAME event count as the uniform
    #    feed and best-of-2, so the skew ratio is apples-to-apples (the r2
    #    half-size single-shot skew number understated the ratio)
    if not skip_skew:
        skew_feed = read_feed_batch(spark, feed_cache_dir(N_TXNS, 2.0))
        n_skew = skew_feed.count()
        times["cdc_full_merge_skewed"] = round(
            min(merge_once(skew_feed, "_sk_w0"), merge_once(skew_feed, "_sk")), 3
        )
        extra["events_per_sec_skewed"] = round(n_skew / times["cdc_full_merge_skewed"], 1)
        extra["skew_ratio"] = round(
            extra["events_per_sec_skewed"] / extra["events_per_sec_full_merge"], 3
        )
        # same skewed feed under the documented skew dial (map-side-combine
        # collapse): the hot-feed operator setting, reported side by side —
        # default stays whatever OLR_COLLAPSE_MODE says (onesort)
        prev_mode = os.environ.get("OLR_COLLAPSE_MODE")
        os.environ["OLR_COLLAPSE_MODE"] = "combine"
        try:
            times["cdc_full_merge_skewed_combine"] = round(
                min(merge_once(skew_feed, "_skc_w0"), merge_once(skew_feed, "_skc")), 3
            )
        finally:
            if prev_mode is None:
                os.environ.pop("OLR_COLLAPSE_MODE", None)
            else:
                os.environ["OLR_COLLAPSE_MODE"] = prev_mode
        extra["events_per_sec_skewed_combine"] = round(
            n_skew / times["cdc_full_merge_skewed_combine"], 1
        )

    # 3a) multi-table replication: the same 10M events routed to TWO
    # tracked tables (conv-hash split) through the Catalog fan-out — the
    # breadth path's throughput, not just its correctness
    if not skip_skew:
        from openlogreplicator_spark.streaming.job import replay_batch_multi

        def mt_feed_for(names):
            # same 10M events hash-routed across len(names) tracked tables
            arms = F.array(*[F.lit(n) for n in names])
            return feed.withColumn(
                "table_name",
                F.when(
                    F.col("table_name").isNotNull(),
                    F.element_at(
                        arms,
                        (F.pmod(F.xxhash64("conv_id"), F.lit(len(names))) + 1).cast("int"),
                    ),
                ),
            )

        def multi_once(tag, names):
            t0 = time.perf_counter()
            replay_batch_multi(
                spark, mt_feed_for(names), os.path.join(work, f"cat{tag}"),
                tables=names, n_buckets=64,
            )
            return time.perf_counter() - t0

        t2 = ["transcripts", "summaries"]
        times["cdc_multi_table_merge"] = round(
            min(multi_once("_w0", t2), multi_once("", t2)), 3
        )
        extra["events_per_sec_multi_table"] = round(
            n_events / times["cdc_multi_table_merge"], 1
        )
        # breadth scaling: SAME events over 8 tracked tables must stay near
        # the T=2 cost (single-job collapse; only writes fan out)
        t8 = t2 + ["audit", "notes", "labels", "scores", "spans", "tags"]
        times["cdc_multi_table_merge_t8"] = round(
            min(multi_once("_t8_w0", t8), multi_once("_t8", t8)), 3
        )
        extra["multi_t8_over_t2"] = round(
            times["cdc_multi_table_merge_t8"] / times["cdc_multi_table_merge"], 3
        )

    # 3b) update-epoch cost: CoW (bucket rewrite) vs merge-on-read (delta
    # append) — the write-amplification story that decides 100 TB viability.
    # The update feed reuses a prefix of the main feed's conversation space,
    # so every update hits existing rows across all buckets.
    # BENCH_UPDATE_TXNS sizes the update epoch (default N/10 — a small
    # steady-state epoch); the scaling harness raises it so the variable
    # work dominates the ~5 s fixed per-epoch cost, the same w/c >> f rule
    # the main feed already follows (tools/bench_scaling.py).
    if not skip_skew or os.environ.get("BENCH_UPDATE") == "1":
        from openlogreplicator_spark.lake import LakeTable
        from openlogreplicator_spark.streaming.apply import apply_epoch
        from openlogreplicator_spark.streaming.job import replay_batch

        upd_txns = int(os.environ.get("BENCH_UPDATE_TXNS", "0")) or max(
            N_TXNS // 10, 1000)
        upd_dir = feed_cache_dir(upd_txns, 0.0)
        upd_feed = read_feed_batch(spark, upd_dir)
        n_upd = upd_feed.count()

        _timed(times, "cdc_update_epoch_cow", lambda: apply_epoch(
            LakeTable(spark, os.path.join(work, "tbl")), upd_feed, 1, job_id="batch"
        ))
        extra["n_update_events"] = n_upd

        replay_batch(spark, feed, os.path.join(work, "tbl_mor"), n_buckets=64,
                     mode="mor")  # untimed mor bootstrap (same as cow load)

        _timed(times, "cdc_update_epoch_mor", lambda: apply_epoch(
            LakeTable(spark, os.path.join(work, "tbl_mor")), upd_feed, 1, job_id="batch"
        ))
        extra["update_events_per_sec_cow"] = round(n_upd / times["cdc_update_epoch_cow"], 1)
        extra["update_events_per_sec_mor"] = round(n_upd / times["cdc_update_epoch_mor"], 1)

    # 3b'') point lookup before/after OPTIMIZE: cluster() range-rewrites
    # the bucket bases and records per-file key zone maps; read_for_keys
    # then skips every base file whose [min,max] excludes the keys.  The
    # serving-path data-skipping win, measured.
    if not skip_skew:
        from openlogreplicator_spark.lake import LakeTable

        tbl = LakeTable(spark, os.path.join(work, "tbl"))
        keys = sorted(
            r["conv_id"]
            for r in tbl.read().select("conv_id").distinct().limit(20).collect()
        )

        def lookup():
            (
                tbl.read_for_keys(keys)
                .write.format("noop").mode("overwrite").save()
            )

        _timed(times, "cdc_point_lookup_unclustered", lookup, best_of=2)
        t0 = time.perf_counter()
        cres = tbl.cluster()
        extra["cluster_secs"] = round(time.perf_counter() - t0, 3)
        extra["cluster_files"] = cres["files"]
        _timed(times, "cdc_point_lookup_clustered", lookup, best_of=2)
        extra["point_lookup_files_scanned"] = len(
            tbl.read_for_keys(keys).inputFiles()
        )
        extra["point_lookup_speedup"] = round(
            times["cdc_point_lookup_unclustered"]
            / max(times["cdc_point_lookup_clustered"], 1e-9),
            3,
        )

    # 3b''') key-localized update epoch on the clustered table: partial
    # (file-level) CoW vs the same epoch with the optimization off.  A
    # narrow-key-range epoch is the steady-state CDC shape (recent rows get
    # edited); base files whose zone map is disjoint from the epoch's key
    # range survive the rewrite unread and unrewritten, so the epoch costs
    # O(files hit), not O(touched buckets' data) — at 10^10 rows the
    # difference between a point update and a near-full-table rewrite.
    if not skip_skew:
        from openlogreplicator_spark.feedgen import FeedBuilder

        loc_ids = [
            r["conv_id"]
            for r in tbl.read()
            .select("conv_id")
            .distinct()
            .orderBy("conv_id")
            .limit(200)
            .collect()
        ]

        def localized_epoch(ids, epoch):
            fb = FeedBuilder(start_scn=100_000_000 + epoch * 1000)
            t = fb.begin()
            for k in ids:
                t.upd(k, 0, text="bench-localized-edit")
            fb.commit(t)
            apply_epoch(tbl, fb.to_spark(spark), epoch, job_id="batch")

        # partial first: a full rewrite drops the zone maps the partial
        # epoch needs (disjoint key sets keep the two epochs comparable)
        _timed(times, "cdc_update_epoch_cow_point_partial",
               lambda: localized_epoch(loc_ids[:100], 2))
        extra["partial_cow_files_kept"] = sum(
            os.path.isfile(os.path.join(tbl.path, e))
            for v in tbl.manifest["buckets"].values()
            for e in v
        )
        os.environ["OLR_PARTIAL_COW"] = "0"
        try:
            _timed(times, "cdc_update_epoch_cow_point_full",
                   lambda: localized_epoch(loc_ids[100:200], 3))
        finally:
            os.environ.pop("OLR_PARTIAL_COW", None)
        extra["partial_cow_speedup"] = round(
            times["cdc_update_epoch_cow_point_full"]
            / max(times["cdc_update_epoch_cow_point_partial"], 1e-9),
            3,
        )

    # 3c) stateful-variant assembly (applyInPandasWithState, T13) over the
    # ~1M-event feed — the state-store architecture measured next to the
    # pending-snapshot default (same feed as the update-epoch entries)
    if not skip_skew:
        from openlogreplicator_spark.sources.feed import read_feed_stream
        from openlogreplicator_spark.streaming.stateful import assemble_stateful

        st_dir = feed_cache_dir(max(N_TXNS // 10, 1000), 0.0)
        n_st = read_feed_batch(spark, st_dir).count()

        def stateful_once(tag):
            t0 = time.perf_counter()
            q = (
                assemble_stateful(read_feed_stream(spark, st_dir, None))
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(work, f"stck{tag}"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return time.perf_counter() - t0

        times["cdc_stateful_assemble"] = round(
            min(stateful_once("_w0"), stateful_once("")), 3
        )
        extra["stateful_events_per_sec"] = round(
            n_st / times["cdc_stateful_assemble"], 1
        )
        extra["n_stateful_events"] = n_st

    # 3d) wire chaining: JSON mirror egress write + full ingress parse
    # (read_json_feed → events, noop sink) over the ~1M-event feed's
    # committed DML — the chained-instance throughput numbers
    if not skip_skew:
        from pyspark.sql import functions as FF

        from openlogreplicator_spark.functions.json_output import write_json_mirror
        from openlogreplicator_spark.operators.assemble import (
            assemble_transactions,
            match_partial_rollbacks,
        )
        from openlogreplicator_spark.sources.json_feed import read_json_feed

        wf = read_feed_batch(spark, feed_cache_dir(max(N_TXNS // 10, 1000), 0.0))
        wdml = match_partial_rollbacks(
            assemble_transactions(wf)["committed"]
        ).filter(FF.col("op").isin("ins", "upd", "del"))
        mdir = os.path.join(work, "wire_mirror")

        def mirror_write():
            write_json_mirror(wdml, mdir, 0)

        _timed(times, "cdc_json_wire_write", mirror_write, best_of=2)

        def wire_parse():
            (
                read_json_feed(spark, mdir)
                .write.format("noop").mode("overwrite").save()
            )

        _timed(times, "cdc_json_wire_parse", wire_parse, best_of=2)
        n_wire = wdml.count()
        extra["wire_events_per_sec_parse"] = round(
            n_wire / times["cdc_json_wire_parse"], 1
        )
        extra["n_wire_messages"] = n_wire

        # protobuf twin: the reference docs call its protobuf output
        # ~2.5x slower than JSON (3.output-format.adoc) — measure ours
        from openlogreplicator_spark.sources.network import write_protobuf_mirror
        from openlogreplicator_spark.sources.protobuf_feed import read_protobuf_feed

        pdir = os.path.join(work, "wire_spool")

        def pb_write():
            write_protobuf_mirror(wdml, pdir, 0)

        _timed(times, "cdc_protobuf_wire_write", pb_write, best_of=2)

        def pb_parse():
            (
                read_protobuf_feed(spark, pdir)
                .write.format("noop").mode("overwrite").save()
            )

        _timed(times, "cdc_protobuf_wire_parse", pb_parse, best_of=2)
        extra["pb_over_json_write"] = round(
            times["cdc_protobuf_wire_write"]
            / max(times["cdc_json_wire_write"], 1e-9), 3
        )

    shutil.rmtree(work, ignore_errors=True)
    return {"queries": times, **extra}


def run_side_group() -> dict:
    """Training-data operators at SF_DIR in their own fresh JVM."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.session import build_session

    spark = build_session("olr-bench-side", cores=CPUS, shuffle_partitions=SHUFFLE or CPUS)
    times: dict[str, float] = {}

    docs_path = os.path.join(SF_DIR, "documents.parquet")
    if os.path.exists(docs_path):
        docs = spark.read.parquet(docs_path)
        docs.limit(1000).count()  # warm JVM/file listing

        def minhash():
            from openlogreplicator_spark.functions.dedup import minhash_candidate_pairs

            minhash_candidate_pairs(docs, n_hashes=8, n_bands=4).write.format(
                "noop"
            ).mode("overwrite").save()

        _timed(times, "dedup_minhash_pairs", minhash, best_of=2)

    emb_path = os.path.join(SF_DIR, "embeddings.parquet")
    if os.path.exists(emb_path):
        emb = spark.read.parquet(emb_path)

        def ann():
            from openlogreplicator_spark.functions.similarity import brute_force_topk

            q = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            brute_force_topk(emb.filter(F.col("vec_id") >= 10), q, k=5).write.format(
                "noop"
            ).mode("overwrite").save()

        _timed(times, "ann_cosine_topk", ann, best_of=2)

        def ann_ivf():
            from openlogreplicator_spark.functions.similarity import ivf_topk

            q = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            ivf_topk(emb.filter(F.col("vec_id") >= 10), q, k=5,
                     n_centroids=8, n_probe=3, dim=64).write.format(
                "noop"
            ).mode("overwrite").save()

        _timed(times, "ann_ivf_topk", ann_ivf, best_of=2)

        # trained centroids (offline step, untimed): same query shape,
        # data-following cells — the clustered-corpus recall fix
        from openlogreplicator_spark.functions.similarity import (
            sample_vectors_deterministic,
            train_ivf_centroids,
        )

        tcents = train_ivf_centroids(
            sample_vectors_deterministic(emb_path, n=2048), n_centroids=8, iters=8
        )

        def ann_ivf_trained():
            from openlogreplicator_spark.functions.similarity import ivf_topk

            q = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            ivf_topk(emb.filter(F.col("vec_id") >= 10), q, k=5, n_probe=3,
                     dim=64, centroids=tcents).write.format(
                "noop"
            ).mode("overwrite").save()

        _timed(times, "ann_ivf_topk_trained", ann_ivf_trained, best_of=2)

        # the production IVF shape: cell ids materialized at ingest
        # (untimed, once), queries join the stored inverted lists only
        from openlogreplicator_spark.functions.similarity import (
            assign_ivf_cells,
            ivf_topk,
        )

        pre_dir = tempfile.mkdtemp(prefix="olrbench-ivf-", dir=_work_base())
        assign_ivf_cells(
            emb.filter(F.col("vec_id") >= 10), n_centroids=8, dim=64
        ).write.mode("overwrite").parquet(pre_dir)
        pre = spark.read.parquet(pre_dir)

        def ann_ivf_pre():
            q = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            ivf_topk(pre, q, k=5, n_centroids=8, n_probe=3, dim=64,
                     precomputed_cell_col="ivf_cid").write.format(
                "noop"
            ).mode("overwrite").save()

        _timed(times, "ann_ivf_topk_precomputed", ann_ivf_pre, best_of=2)
        shutil.rmtree(pre_dir, ignore_errors=True)

        # PQ/ADC: codes materialized at ingest (untimed, once); the query
        # scan reads ONLY (id, code) and reranks its shortlist exactly —
        # the billion-vector memory shape (codes ~32× smaller than floats)
        from openlogreplicator_spark.functions.similarity import (
            pq_encode,
            pq_topk,
            train_pq_codebooks,
        )

        books = train_pq_codebooks(
            sample_vectors_deterministic(emb_path, n=2048),
            n_subspaces=8, n_codes=16, iters=8,
        )
        pq_dir = tempfile.mkdtemp(prefix="olrbench-pq-", dir=_work_base())
        pq_encode(
            emb.filter(F.col("vec_id") >= 10), books, dim=64
        ).write.mode("overwrite").parquet(pq_dir)
        pqc = spark.read.parquet(pq_dir)

        def ann_pq():
            q = emb.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("q_id"), "embedding"
            )
            pq_topk(pqc, q, books, k=5, dim=64,
                    precomputed_code_col="pq_code",
                    rerank=4).write.format("noop").mode("overwrite").save()

        _timed(times, "ann_pq_rerank_precomputed", ann_pq, best_of=2)
        shutil.rmtree(pq_dir, ignore_errors=True)

    extra: dict = {}
    # ---- scale-honest ANN pair (round-5 item #7): exact brute force vs
    # IVF-PQ(+rerank) over a 10M-vector clustered corpus — the regime
    # where the ADC code scan's ~32× I/O cut is a measured number, not an
    # extrapolation from 2k fixture vectors.  Ingest halves (cell ids +
    # codes) are materialized once, untimed, as in production.
    ann_n = int(os.environ.get("BENCH_ANN_N", "10000000"))
    if ann_n > 0:
        import numpy as np

        from openlogreplicator_spark.functions.similarity import (
            assign_ivf_cells,
            brute_force_topk,
            ivf_pq_topk,
            pq_encode,
            train_ivf_centroids,
            train_pq_codebooks,
        )

        d = ann_corpus_dir(spark, ann_n)
        corpus = spark.read.parquet(os.path.join(d, "data"))
        n_clusters = _ann_n_clusters(ann_n)
        # training sample = the corpus's own first 16384 rows, regenerated
        # driver-side from the deterministic formula (no 2.5 GB collect)
        sample = [list(map(float, r))
                  for r in _ann_vectors_for_ids(range(16384), n_clusters)]
        cents = train_ivf_centroids(sample, n_centroids=256, iters=6)
        books = train_pq_codebooks(sample, n_subspaces=8, n_codes=16, iters=6)
        enc = os.path.join(d, "enc_c256")
        if not os.path.exists(os.path.join(enc, "_SUCCESS")):
            # ingest halves on the vectorized engine: the interpreted
            # higher-order-function fold costs ~20 min at 10M x 256
            # centroids; the Arrow-batched BLAS path costs seconds
            pq_encode(
                assign_ivf_cells(corpus, dim=_ANN_DIM, centroids=cents,
                                 engine="numpy"),
                books, dim=_ANN_DIM, engine="numpy",
            ).write.mode("overwrite").parquet(enc)
        encoded = spark.read.parquet(enc)

        n_q, k = 8, 10
        qv = _ann_vectors_for_ids(
            [(i * 37 + 5) * _ANN_BLOCK + i for i in range(n_q)], n_clusters
        )
        queries = spark.createDataFrame(
            [(i, [float(x) for x in qv[i]]) for i in range(n_q)],
            "q_id long, embedding array<float>",
        )

        truth: dict = {}

        def brute():
            rows = brute_force_topk(corpus, queries, k=k).collect()
            truth.clear()
            for r in rows:
                truth.setdefault(r["q_id"], set()).add(r["n_id"])

        _timed(times, "ann_brute_10m", brute, best_of=2)

        got: dict = {}

        def ivfpq():
            rows = ivf_pq_topk(
                encoded, queries, books, k=k, dim=_ANN_DIM,
                centroids=cents, n_probe=8, rerank=16,
                precomputed_cell_col="ivf_cid",
                precomputed_code_col="pq_code",
            ).collect()
            got.clear()
            for r in rows:
                got.setdefault(r["q_id"], set()).add(r["n_id"])

        _timed(times, "ann_ivfpq_10m", ivfpq, best_of=2)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        extra["ann_10m_n"] = ann_n
        extra["ann_ivfpq_10m_recall"] = round(hits / max(len(truth) * k, 1), 4)
        extra["ann_ivfpq_10m_speedup"] = round(
            times["ann_brute_10m"] / max(times["ann_ivfpq_10m"], 1e-9), 3
        )

    li_path = os.path.join(SF_DIR, "lineitem.parquet")
    if os.path.exists(li_path):
        li = spark.read.parquet(li_path)

        def pricing():
            (
                li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    F.sum("l_quantity").alias("sum_qty"),
                    F.sum("l_extendedprice").alias("sum_base"),
                    F.count(F.lit(1)).alias("n"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        _timed(times, "agg_pricing_summary", pricing, best_of=2)

    return {"queries": times, **extra}


def _run_subprocess_group(group: str) -> dict:
    env = dict(os.environ, BENCH_GROUP=group)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
    if p.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench group {group} failed rc={p.returncode}:\n"
            f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _merge_cdc_draws(draws: list[dict]) -> dict:
    """Median-of-N fresh-JVM draws for the CDC group (this box swings
    ±30-40% between same-day draws of identical code — round-4 whipsawed
    cross-round comparisons on single draws).  Per-query time = median
    across draws (each draw already keeps best-of-2 in-JVM for JIT);
    ``spread`` = (max−min)/median per query.  Derived throughputs are
    recomputed from the median times; remaining scalars come from the
    draw whose headline (cdc_full_merge) is the median."""
    if len(draws) == 1:
        d = dict(draws[0])
        d["spread"] = {k: 0.0 for k in d["queries"]}
        d["n_draws"] = 1
        return d
    qnames = set()
    for d in draws:
        qnames.update(d["queries"])
    times = {}
    spread = {}
    for q in sorted(qnames):
        vals = [d["queries"][q] for d in draws if q in d["queries"]]
        med = _median(vals)
        times[q] = round(med, 3)
        spread[q] = round((max(vals) - min(vals)) / max(med, 1e-9), 3)
    # anchor draw: the one whose headline is the median
    headline = [d["queries"].get("cdc_full_merge", 0.0) for d in draws]
    anchor = draws[headline.index(_median(headline))] if len(draws) % 2 else draws[
        min(range(len(draws)), key=lambda i: abs(headline[i] - _median(headline)))
    ]
    out = {k: v for k, v in anchor.items() if k != "queries"}
    out["queries"] = times
    out["spread"] = spread
    out["n_draws"] = len(draws)
    n_events = out.get("n_events")
    n_upd = out.get("n_update_events")
    n_wire = out.get("n_wire_messages")
    if n_events:
        for key, q in (
            ("events_per_sec_full_merge", "cdc_full_merge"),
            ("events_per_sec_parse_assemble", "cdc_parse_assemble"),
            ("events_per_sec_skewed", "cdc_full_merge_skewed"),
            ("events_per_sec_multi_table", "cdc_multi_table_merge"),
        ):
            if q in times and key in out:
                out[key] = round(n_events / times[q], 1)
        if "events_per_sec_skewed" in out:
            out["skew_ratio"] = round(
                out["events_per_sec_skewed"] / out["events_per_sec_full_merge"], 3
            )
    if n_upd:
        if "cdc_update_epoch_cow" in times:
            out["update_events_per_sec_cow"] = round(n_upd / times["cdc_update_epoch_cow"], 1)
        if "cdc_update_epoch_mor" in times:
            out["update_events_per_sec_mor"] = round(n_upd / times["cdc_update_epoch_mor"], 1)
    n_st = out.get("n_stateful_events")
    if n_st and "cdc_stateful_assemble" in times:
        out["stateful_events_per_sec"] = round(n_st / times["cdc_stateful_assemble"], 1)
    if n_wire and "cdc_json_wire_parse" in times:
        out["wire_events_per_sec_parse"] = round(n_wire / times["cdc_json_wire_parse"], 1)
    if "cdc_multi_table_merge_t8" in times and "cdc_multi_table_merge" in times:
        out["multi_t8_over_t2"] = round(
            times["cdc_multi_table_merge_t8"] / times["cdc_multi_table_merge"], 3
        )
    if "cdc_protobuf_wire_write" in times and "cdc_json_wire_write" in times:
        out["pb_over_json_write"] = round(
            times["cdc_protobuf_wire_write"] / max(times["cdc_json_wire_write"], 1e-9), 3
        )
    if "cdc_point_lookup_unclustered" in times and "cdc_point_lookup_clustered" in times:
        out["point_lookup_speedup"] = round(
            times["cdc_point_lookup_unclustered"]
            / max(times["cdc_point_lookup_clustered"], 1e-9), 3
        )
    return out


def main():
    group = os.environ.get("BENCH_GROUP")
    if group == "cdc":
        print(json.dumps(run_cdc_group()))
        return
    if group == "side":
        print(json.dumps(run_side_group()))
        return

    # orchestrator: each group in its own JVM; the CDC group as
    # median-of-N fresh-JVM draws (BENCH_CDC_DRAWS, default 3)
    n_draws = int(os.environ.get("BENCH_CDC_DRAWS", "3"))
    draws = [_run_subprocess_group("cdc") for _ in range(max(1, n_draws))]
    merged = _merge_cdc_draws(draws)
    if ONLY != "cdc":
        side = _run_subprocess_group("side")
        merged["queries"].update(side["queries"])
        merged.update({k: v for k, v in side.items() if k != "queries"})

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "cdc_full_merge_sec",
        "value": merged["queries"]["cdc_full_merge"],
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        **{k: v for k, v in merged.items() if k != "queries"},
        "queries": merged["queries"],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
