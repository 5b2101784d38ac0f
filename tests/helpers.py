"""Shared assertions: run engine + oracle replay on the same feed, compare.

The comparison contract is the north-star invariant: per-turn text equality
under stable turn ordering — we sort both sides by (conv_id, turn_idx) and
compare full rows.
"""

from __future__ import annotations

import os

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.oracle import replay
from openlogreplicator_spark.streaming.job import replay_batch


def normalize_rows(rows, columns):
    out = []
    for r in rows:
        rec = (
            r["conv_id"],
            r["turn_idx"],
            *[
                (v.replace(tzinfo=None) if hasattr(v, "tzinfo") and v is not None and v.tzinfo else v)
                for v in (r.get(c) for c in columns)
            ],
        )
        out.append(rec)
    return sorted(out)


def run_and_compare(spark, fb: FeedBuilder, tmpdir, tracked=("transcripts",), via="batch",
                    n_buckets=8, mode="cow", **stream_kwargs):
    """Replay fb's feed through the engine and the sequential oracle; assert
    equal final state. Returns (table, oracle_result)."""
    table_path = os.path.join(tmpdir, "transcripts_tbl")
    expected = replay(fb.rows, tracked_tables=set(tracked))

    pattern = "^(" + "|".join(tracked) + ")$"
    if via == "batch":
        feed_df = fb.to_spark(spark)
        table = replay_batch(spark, feed_df, table_path, tracked_pattern=pattern,
                             n_buckets=n_buckets, mode=mode)
    else:
        from openlogreplicator_spark.streaming.job import run_stream

        feed_dir = os.path.join(tmpdir, "feed")
        fb.write_parquet(spark, feed_dir)
        ckpt = os.path.join(tmpdir, "ckpt")
        table = run_stream(spark, feed_dir, table_path, ckpt, tracked_pattern=pattern,
                           n_buckets=n_buckets, mode=mode, **stream_kwargs)

    got_cols = table.value_names
    got = normalize_rows([r.asDict() for r in table.read().collect()], got_cols)
    want = normalize_rows(expected.as_records(), expected.columns)
    assert expected.columns == got_cols, f"schema mismatch: {expected.columns} vs {got_cols}"
    assert got == want, f"state mismatch:\n got={got}\nwant={want}"
    return table, expected
