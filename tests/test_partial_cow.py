"""File-level (partial) copy-on-write: after cluster(), an epoch's CoW
rewrite skips base files whose key zone map is disjoint from the epoch's
change-key range — the Iceberg sparse-update analog.  Survivors stay listed
in the manifest (as file entries), keep their zone maps, and are never read
or rewritten; vacuum honors file-level references."""

import os
from datetime import datetime, timezone

from helpers import normalize_rows
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.lake.table import LakeTable
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _load(spark, path, n_convs=400, n_buckets=4):
    table = create_target(spark, path, n_buckets=n_buckets, mode="cow")
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    for i in range(n_convs):
        t.ins(f"conv-{i:05d}", 0, role="user", text=f"hello {i}", ts=TS)
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")
    return table


def _rows(df, cols):
    return normalize_rows([r.asDict() for r in df.collect()], cols)


def _point_update(spark, table, key, epoch, text="edited"):
    fb = FeedBuilder(start_scn=9000 + epoch * 100)
    t = fb.begin()
    t.upd(key, 0, text=text)
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), epoch, job_id="j")


def test_partial_cow_keeps_cold_files(spark, tmpdir_path):
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    key = "conv-00007"
    b = table.buckets_for_keys([key])[0]
    maps_before = LakeTable._stats_files(table.manifest, b)
    hot_before = [
        e
        for e, mm in maps_before.items()
        if mm is None or mm[0] <= key <= mm[1]
    ]
    assert len(maps_before) > 2, "fixture too small to demonstrate skipping"

    _point_update(spark, table, key, epoch=1)

    entries = table.manifest["buckets"][str(b)]
    # survivors: pre-update FILES still listed (dir entries were expanded)
    survivors = [e for e in entries if e in maps_before]
    assert survivors, "expected cold files to survive the rewrite"
    # every survivor is an individual FILE whose map excluded the key
    for e in survivors:
        assert e.endswith(".parquet") or os.path.isfile(
            os.path.join(table.path, e)
        )
        mm = maps_before[e]
        assert mm is not None and (mm[1] < key or mm[0] > key)
    # the file that held the key was rewritten out of the manifest
    for e in hot_before:
        assert e not in entries
    # survivors keep their zone maps unchanged; the rewrite's OUTPUT files
    # carry fresh maps (collected from their own footers), so the whole
    # bucket stays mapped — nothing else is
    maps_after = LakeTable._stats_files(table.manifest, b)
    assert all(maps_after[e] == maps_before[e] for e in survivors)
    hot_dirs = [e for e in entries if not e.endswith(".parquet")]
    assert len(hot_dirs) == 1
    fresh = set(maps_after) - set(survivors)
    assert fresh, "rewrite output should be mapped"
    for e in fresh:
        assert e.startswith(hot_dirs[0] + "/") and e not in maps_before
        mm = maps_after[e]
        assert mm is None or mm[0] <= mm[1]
    # content is exactly what a full rewrite would have produced
    rows = table.read_for_keys([key]).collect()
    assert len(rows) == 1 and rows[0]["text"] == "edited"
    assert table.read().count() == 400
    got = sorted(
        r["text"] for r in table.read().filter("conv_id like 'conv-0000%'").collect()
    )
    assert got == sorted(
        ["edited"] + [f"hello {i}" for i in range(10) if i != 7]
    )


def test_partial_cow_untouched_buckets_unchanged(spark, tmpdir_path):
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    key = "conv-00007"
    b = table.buckets_for_keys([key])[0]
    other = {
        bb: ds for bb, ds in table.manifest["buckets"].items() if bb != str(b)
    }
    _point_update(spark, table, key, epoch=1)
    for bb, ds in other.items():
        assert table.manifest["buckets"][bb] == ds


def test_partial_cow_lookup_still_prunes(spark, tmpdir_path):
    """After a partial-CoW epoch, survivors' maps keep pruning point
    lookups: a cold key's lookup scans fewer entries than the bucket holds
    and stays correct."""
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    _point_update(spark, table, "conv-00007", epoch=1)
    b = table.buckets_for_keys(["conv-00007"])[0]
    total_files = len(
        table._expand_entries(table.manifest["buckets"][str(b)])
    )
    assert total_files > 2
    # pick a key living in a surviving (mapped) file of the same bucket
    maps = LakeTable._stats_files(table.manifest, b)
    cold_key = None
    for i in range(400):
        k = f"conv-{i:05d}"
        if table.buckets_for_keys([k])[0] == b and any(
            mm is not None and mm[0] <= k <= mm[1] for mm in maps.values()
        ):
            cold_key = k
            break
    assert cold_key is not None
    df = table.read_for_keys([cold_key])
    rows = df.collect()
    assert [r["conv_id"] for r in rows] == [cold_key]
    # scans the one matching survivor + the (unmapped) rewrite output —
    # strictly fewer files than the bucket holds
    assert 0 < len(df.inputFiles()) < total_files


def test_partial_cow_second_epoch_prunes_again(spark, tmpdir_path):
    """Survivor maps stay valid across epochs: a second point update in the
    same bucket again skips the (still-mapped) cold files."""
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    key1 = "conv-00007"
    b = table.buckets_for_keys([key1])[0]
    _point_update(spark, table, key1, epoch=1)
    maps_mid = LakeTable._stats_files(table.manifest, b)
    # second update: another key of the same bucket inside a surviving file
    key2 = None
    for i in range(399, -1, -1):
        k = f"conv-{i:05d}"
        if k != key1 and table.buckets_for_keys([k])[0] == b and any(
            mm is not None and mm[0] <= k <= mm[1] for mm in maps_mid.values()
        ):
            key2 = k
            break
    assert key2 is not None
    _point_update(spark, table, key2, epoch=2, text="edited2")
    maps_after = LakeTable._stats_files(table.manifest, b)
    assert maps_after, "expected survivors to stay mapped after epoch 2"
    rows = table.read_for_keys([key1, key2]).collect()
    texts = {r["conv_id"]: r["text"] for r in rows}
    assert texts == {key1: "edited", key2: "edited2"}
    assert table.read().count() == 400


def test_partial_cow_scattered_keys_prune_between(spark, tmpdir_path):
    """Per-FILE hit testing: an epoch touching two keys at OPPOSITE ends of
    a bucket's keyspace keeps only the two hit files hot — the files BETWEEN
    them survive (a bucket-wide [lo, hi] envelope would rewrite them all)."""
    table = _load(spark, os.path.join(tmpdir_path, "t"), n_buckets=1)
    table.cluster()
    maps = LakeTable._stats_files(table.manifest, 0)
    files = sorted(
        (e for e, mm in maps.items() if mm is not None),
        key=lambda e: maps[e][0],
    )
    assert len(files) > 2, "fixture too small for a between-files survivor"
    lo_key, hi_key = maps[files[0]][0], maps[files[-1]][1]

    fb = FeedBuilder(start_scn=9000)
    t = fb.begin()
    t.upd(lo_key, 0, text="edited-lo")
    t.upd(hi_key, 0, text="edited-hi")
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 1, job_id="j")

    entries = table.manifest["buckets"]["0"]
    # the middle files all survived; both end files were rewritten out
    for e in files[1:-1]:
        assert e in entries, f"between-file {e} should have survived"
    assert files[0] not in entries and files[-1] not in entries
    rows = {r["conv_id"]: r["text"] for r in table.read().collect()}
    assert len(rows) == 400
    assert rows[lo_key] == "edited-lo" and rows[hi_key] == "edited-hi"


def test_partial_cow_vacuum_keeps_referenced_files(spark, tmpdir_path):
    """vacuum() must not delete an old version dir that still holds
    file-level referenced survivors — and must drop the dead files inside
    it (per-file remove_orphan_files)."""
    table = _load(spark, os.path.join(tmpdir_path, "t"))
    table.cluster()
    key = "conv-00007"
    b = table.buckets_for_keys([key])[0]
    _point_update(spark, table, key, epoch=1)
    survivors = [
        e
        for e in table.manifest["buckets"][str(b)]
        if os.path.isfile(os.path.join(table.path, e))
    ]
    assert survivors
    res = table.vacuum(retain_last=1)
    for e in survivors:
        assert os.path.isfile(os.path.join(table.path, e)), e
    # the rewritten (dead) file of the survivors' dir was removed
    surv_dir = os.path.dirname(survivors[0])
    assert any(r.startswith(surv_dir + "/") for r in res["removed"]), res
    assert table.read().count() == 400
    rows = table.read_for_keys([key]).collect()
    assert len(rows) == 1 and rows[0]["text"] == "edited"


def test_partial_cow_delete_can_empty_hot_rewrite(spark, tmpdir_path):
    """Deleting every key of the hot file(s) leaves only cold survivors in
    the bucket (the rewrite emits nothing for it)."""
    table = _load(spark, os.path.join(tmpdir_path, "t"), n_buckets=1)
    table.cluster()
    maps = LakeTable._stats_files(table.manifest, 0)
    files = [e for e, mm in maps.items() if mm is not None]
    assert len(files) > 2
    lo, hi = maps[files[0]]
    doomed = [
        f"conv-{i:05d}"
        for i in range(400)
        if lo <= f"conv-{i:05d}" <= hi
    ]
    assert doomed
    fb = FeedBuilder(start_scn=9000)
    t = fb.begin()
    for k in doomed:
        t.delete(k, 0)
    fb.commit(t)
    apply_epoch(table, fb.to_spark(spark), 1, job_id="j")
    entries = table.manifest["buckets"]["0"]
    assert files[0] not in entries
    survivors = [e for e in entries if e in files]
    assert survivors, "cold files should survive the delete epoch"
    assert table.read().count() == 400 - len(doomed)
    assert table.read_for_keys(doomed[:3]).count() == 0
