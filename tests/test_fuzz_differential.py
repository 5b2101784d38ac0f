"""Randomized differential testing: seeded random op sequences through the
distributed engine AND the sequential oracle — the fixture corpus catches
designed cases, this catches the interactions nobody designed (reference
analog: the LogMiner comparison run over arbitrary workloads,
/root/reference/tests/sql/scripts/compare.py)."""

import random
from datetime import datetime, timezone

import pytest

from helpers import run_and_compare
from openlogreplicator_spark.feedgen import FeedBuilder

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def _random_feed(seed: int, n_txns: int = 25) -> FeedBuilder:
    rng = random.Random(seed)
    fb = FeedBuilder(n_shards=1)
    open_txns = []
    convs = [f"c{i}" for i in range(6)]
    for _ in range(n_txns):
        t = fb.begin()
        n_ops = rng.randint(1, 8)
        touched = []
        for _ in range(n_ops):
            conv, turn = rng.choice(convs), rng.randint(0, 3)
            op = rng.random()
            if op < 0.45:
                t.ins(conv, turn, role=rng.choice(["user", "assistant"]),
                      text=f"t{rng.randint(0, 999)}", ts=TS)
                touched.append((conv, turn))
            elif op < 0.75:
                t.upd(conv, turn, text=f"u{rng.randint(0, 999)}")
                touched.append((conv, turn))
            elif op < 0.85:
                t.delete(conv, turn)
                touched.append((conv, turn))
            elif op < 0.93 and touched:
                t.prollback(*rng.choice(touched))
            else:
                cn = rng.randint(0, 2)
                t.chunk(conv, turn, cn, f"CH{cn}-")
                if rng.random() < 0.8:
                    t.upd(conv, turn, text="placeholder")
                    touched.append((conv, turn))
        r = rng.random()
        if r < 0.8:
            fb.commit(t)
        elif r < 0.9:
            fb.rollback(t)
        else:
            open_txns.append(t)  # left open — rides pending / dropped
        if rng.random() < 0.15:
            fb.new_seq()
    return fb


@pytest.mark.parametrize("seed", [7, 23, 51, 104, 777])
def test_fuzz_batch(spark, tmpdir_path, seed):
    run_and_compare(spark, _random_feed(seed), tmpdir_path)


@pytest.mark.parametrize("seed", [31, 92])
def test_fuzz_streaming_mor(spark, tmpdir_path, seed):
    """Random feeds through micro-batched streaming onto a merge-on-read
    table — the pending-carry and delta-fold paths under random load."""
    run_and_compare(spark, _random_feed(seed), tmpdir_path,
                    via="stream", mode="mor", max_files_per_trigger=2)


def _random_multi_feed(seed: int, n_txns: int = 25) -> FeedBuilder:
    """Random interleaved ops across TWO tracked tables plus occasional
    table-qualified DDL — the multi-table engine vs oracle.replay_multi."""
    rng = random.Random(seed)
    fb = FeedBuilder(n_shards=1)
    convs = [f"c{i}" for i in range(5)]
    for _ in range(n_txns):
        if rng.random() < 0.08:
            fb.ddl_txn("TRUNCATE TABLE summaries", ["role", "text", "tool", "ts"])
            continue
        t = fb.begin()
        touched = []
        for _ in range(rng.randint(1, 7)):
            conv, turn = rng.choice(convs), rng.randint(0, 2)
            table = rng.choice(["transcripts", "summaries"])
            op = rng.random()
            if op < 0.5:
                kw = dict(role=rng.choice(["user", "sys"]),
                          text=f"t{rng.randint(0, 999)}")
                if table == "transcripts":
                    t.ins(conv, turn, ts=TS, **kw)
                else:
                    t.dml_other_table(table, conv, turn, op="ins", **kw)
                touched.append((table, conv, turn))
            elif op < 0.8:
                if table == "transcripts":
                    t.upd(conv, turn, text=f"u{rng.randint(0, 999)}")
                else:
                    t.dml_other_table(table, conv, turn, op="upd",
                                      text=f"u{rng.randint(0, 999)}")
                touched.append((table, conv, turn))
            elif op < 0.9:
                if table == "transcripts":
                    t.delete(conv, turn)
                else:
                    t.dml_other_table(table, conv, turn, op="del")
                touched.append((table, conv, turn))
            elif touched:
                tb, cv, tn = rng.choice(touched)
                if tb == "transcripts":
                    t.prollback(cv, tn)
                else:
                    t.dml_other_table(tb, cv, tn, op="prollback")
        if rng.random() < 0.85:
            fb.commit(t)
        else:
            fb.rollback(t)
        if rng.random() < 0.15:
            fb.new_seq()
    return fb


@pytest.mark.parametrize("seed", [11, 42, 300])
def test_fuzz_multi_table(spark, tmpdir_path, seed):
    import os

    from openlogreplicator_spark.oracle import replay_multi
    from openlogreplicator_spark.streaming.job import replay_batch_multi
    from test_multi_table import assert_catalog_matches

    fb = _random_multi_feed(seed)
    cat = replay_batch_multi(
        spark, fb.to_spark(spark), os.path.join(tmpdir_path, "cat"),
        tables=["transcripts", "summaries"], n_buckets=4,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert_catalog_matches(cat, expected)


@pytest.mark.parametrize("seed", [42])
def test_fuzz_multi_table_streaming(spark, tmpdir_path, seed):
    """Random two-table feed through micro-batched streaming (txns split
    across epochs ride the catalog pending snapshot) onto merge-on-read
    tables — the multi-table pending-carry under random interleavings."""
    import os

    from openlogreplicator_spark.oracle import replay_multi
    from openlogreplicator_spark.streaming.job import run_stream_multi
    from test_multi_table import assert_catalog_matches

    fb = _random_multi_feed(seed)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    cat = run_stream_multi(
        spark, feed_dir, os.path.join(tmpdir_path, "cat"),
        os.path.join(tmpdir_path, "ckpt"),
        tables=["transcripts", "summaries"], n_buckets=4, mode="mor",
        max_files_per_trigger=2,
    )
    expected = replay_multi(
        fb.rows,
        initial_tables={
            "transcripts": ["role", "text", "tool", "ts"],
            "summaries": ["role", "text", "tool", "ts"],
        },
    )
    assert_catalog_matches(cat, expected)
