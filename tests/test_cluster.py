"""cluster() maintenance (Iceberg OPTIMIZE analog): key-clustered bucket
rewrite + per-file zone maps in the manifest, and the file-skipping point
lookup in read_for_keys."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _load(spark, path, n_convs=200, mode="cow", n_buckets=4):
    table = create_target(spark, path, n_buckets=n_buckets, mode=mode)
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    for i in range(n_convs):
        t.ins(f"conv-{i:05d}", 0, role="user", text=f"hello {i}", ts=TS)
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    return table


def _rows(df, cols):
    return normalize_rows([r.asDict() for r in df.collect()], cols)


def test_cluster_preserves_content_and_records_stats(spark, tmpdir_path):
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    before = _rows(table.read(), table.value_names)
    res = table.cluster()
    assert res["clustered"] and res["files"] > 0
    fs = table.manifest["file_stats"]
    assert fs, "zone maps missing after cluster()"
    # every live bucket has maps keyed by root-relative file path under its
    # live dir, and every map is a valid [min, max]
    for b, dirs in table.manifest["buckets"].items():
        files = fs[b]["files"]
        assert files
        for path, mm in files.items():
            assert path.startswith(dirs[0] + "/")
            assert mm is None or mm[0] <= mm[1]
    assert _rows(table.read(), table.value_names) == before


def test_read_for_keys_skips_files(spark, tmpdir_path):
    """After cluster(), a point lookup's base scan reads a strict subset
    of the bucket's files (the zone maps actually skip)."""
    table = _load(spark, os.path.join(tmpdir_path, "t"), n_convs=400)
    table.cluster()
    total_files = sum(
        len(e["files"]) for e in table.manifest["file_stats"].values()
    )
    assert total_files > 4, "fixture too small to demonstrate skipping"
    key = "conv-00007"
    df = table.read_for_keys([key])
    got = [r["conv_id"] for r in df.collect()]
    assert got == [key]
    scanned = df.inputFiles()
    assert 0 < len(scanned) < total_files, (
        f"expected file-level skip: scanned {len(scanned)} of {total_files}"
    )


def test_merge_invalidates_stale_zone_maps(spark, tmpdir_path):
    """A CoW rewrite never leaves a stale map: every surviving map belongs
    to a live manifest entry, and the only maps covering the rewritten key
    are the FRESH ones collected from the rewrite's own output (survivor
    maps provably exclude it).  Lookups prune to the covering files and
    stay correct."""
    from openlogreplicator_spark.lake.table import LakeTable

    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    assert table.manifest["file_stats"]
    key = "conv-00003"
    b = table.buckets_for_keys([key])[0]
    maps_before = LakeTable._stats_files(table.manifest, b)
    fb = FeedBuilder(start_scn=9000)
    t = fb.begin()
    t.upd(key, 0, text="edited")
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 1, job_id="j")
    live = set(table.manifest["buckets"].get(str(b), []))
    covering = []
    for e, mm in LakeTable._stats_files(table.manifest, b).items():
        # live entry itself, or a file under a live rewrite-output dir
        assert e in live or os.path.dirname(e) in live
        if e in maps_before:  # survivor — its map must exclude the key
            assert mm is not None and (mm[1] < key or mm[0] > key)
        elif mm is not None and mm[0] <= key <= mm[1]:
            covering.append(e)  # fresh map on the rewrite output
    assert covering, "rewrite output should carry fresh maps covering the key"
    df = table.read_for_keys([key])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["text"] == "edited"
    # the lookup scanned only files whose fresh/survivor map allows the key
    scanned = {os.path.relpath(f.replace("file:", ""), table.path) for f in df.inputFiles()}
    assert scanned <= set(covering), (scanned, covering)


def test_cluster_folds_mor_deltas_and_lookup_sees_delta_tail(spark, tmpdir_path):
    """MoR: cluster() compacts delta chains in; a later delta append keeps
    the base zone maps valid and read_for_keys folds the fresh delta."""
    table = _load(spark, os.path.join(tmpdir_path, "t"), mode="mor")
    fb = FeedBuilder(start_scn=5000)
    t = fb.begin()
    t.upd("conv-00010", 0, text="v2")
    t.delete("conv-00011", 0)
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 1, job_id="j")
    assert any(table.manifest["deltas"].values())
    table.cluster()
    assert not any(table.manifest.get("deltas", {}).values())
    # post-cluster delta append: base maps survive, fold still applies
    fb2 = FeedBuilder(start_scn=6000)
    t2 = fb2.begin()
    t2.upd("conv-00010", 0, text="v3")
    fb2.commit(t2)
    apply_epoch(table, fb2.to_spark(spark), 2, job_id="j")
    b = str(table.buckets_for_keys(["conv-00010"])[0])
    assert b in table.manifest["file_stats"]
    rows = table.read_for_keys(["conv-00010", "conv-00011"]).collect()
    assert {r["conv_id"]: r["text"] for r in rows} == {"conv-00010": "v3"}


def test_fuzz_cluster_between_epochs(spark, tmpdir_path):
    """Random op soup applied epoch-by-epoch with cluster() OPTIMIZE runs
    interleaved between epochs: the maintenance rewrite must never change
    the observable state — final table equals the sequential oracle, and
    zone-mapped point lookups agree with the full read (CoW and MoR)."""
    from pyspark.sql import functions as F

    from helpers import normalize_rows
    from openlogreplicator_spark.oracle import replay
    from test_fuzz_differential import _random_feed

    for seed, mode in ((7, "cow"), (31, "mor")):
        fb = _random_feed(seed)
        expected = replay(fb.rows, tracked_tables={"transcripts"})
        path = os.path.join(tmpdir_path, f"t_{seed}_{mode}")
        table = create_target(spark, path, n_buckets=4, mode=mode)
        feed = fb.to_spark(spark)
        seqs = sorted(r["seq"] for r in feed.select("seq").distinct().collect())
        for i, s in enumerate(seqs):
            apply_epoch(table, feed.filter(F.col("seq") == s), i, job_id="j")
            if i % 2 == 1:
                table.cluster()
        got = _rows(table.read(), table.value_names)
        want = normalize_rows(expected.as_records(), expected.columns)
        assert got == want, f"seed {seed} mode {mode} diverged from oracle"
        keys = ["c1", "c3"]
        lk = _rows(table.read_for_keys(keys), table.value_names)
        full = _rows(
            table.read().filter(F.col("conv_id").isin(keys)), table.value_names
        )
        assert lk == full, f"seed {seed} mode {mode}: pruned lookup diverged"


def test_catalog_cluster_sweep(spark, tmpdir_path):
    """Catalog.cluster() OPTIMIZEs every registered table; state and
    pruned lookups are unchanged."""
    from openlogreplicator_spark.feedgen import FeedBuilder as FB
    from openlogreplicator_spark.streaming.job import replay_batch_multi

    fb = FB(start_scn=1000)
    t = fb.begin()
    for i in range(40):
        t.ins(f"conv-{i:03d}", 0, role="user", text=f"t{i}", ts=TS)
        t.dml_other_table("summaries", f"conv-{i:03d}", 0, op="ins",
                          role="sum", text=f"s{i}")
    fb.commit(t)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=4,
    )
    before = {n: _rows(cat.table(n).read(), cat.table(n).value_names)
              for n in cat.table_names}
    res = cat.cluster()
    assert set(res) == {"transcripts", "summaries"}
    assert all(r["files"] > 0 for r in res.values())
    for n in cat.table_names:
        tbl = cat.table(n)
        assert tbl.manifest["file_stats"]
        assert _rows(tbl.read(), tbl.value_names) == before[n]
        rows = tbl.read_for_keys(["conv-007"]).collect()
        assert [r["conv_id"] for r in rows] == ["conv-007"]


def test_cluster_then_vacuum_drops_old_base(spark, tmpdir_path):
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    before = _rows(table.read(), table.value_names)
    table.cluster()
    removed = table.vacuum(retain_last=1)["removed"]
    assert any(d.startswith("data/v000001") for d in removed)
    assert _rows(table.read(), table.value_names) == before
