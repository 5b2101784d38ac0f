"""End-to-end composition: the CDC-replicated lake table IS the corpus for
the training-data operators.  A transcript feed (with duplicated and
updated turns) is replayed into a LakeTable, and the text-analysis /
dedup stages run directly over ``table.read()`` — the 100 TB pipeline
shape: replicate once, curate from the same snapshot, no export hop."""

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.functions import dedup, text
from openlogreplicator_spark.streaming.apply import apply_epoch
from openlogreplicator_spark.streaming.job import create_target

TS = datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc)


def test_curation_over_replicated_table(spark, tmpdir_path):
    table = create_target(spark, os.path.join(tmpdir_path, "t"), n_buckets=4)
    fb = FeedBuilder(start_scn=1000)
    t = fb.begin()
    boiler = "Please review the attached document and respond accordingly."
    for i in range(30):
        # 10 conversations share a boilerplate turn → exact duplicates
        txt = boiler if i % 3 == 0 else f"unique reply {i} with real content"
        t.ins(f"conv-{i:03d}", 0, role="user", text=txt, ts=TS)
        t.ins(f"conv-{i:03d}", 1, role="assistant",
              text=f"answer {i}: the result is {i * 7}", ts=TS)
    fb.commit(t)
    # an update epoch rewrites one boilerplate turn to unique content —
    # curation must see the POST-merge text, not the insert-time text
    fb.new_seq()
    t2 = fb.begin()
    t2.upd("conv-000", 0, text="rewritten: no longer boilerplate at all")
    fb.commit(t2)
    apply_epoch(table, fb.to_spark(spark), 0, job_id="j")

    corpus = (
        table.read()
        .filter(F.col("text").isNotNull())
        .select(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("doc_id"),
            "text",
        )
    )

    # text analysis columns over the replicated snapshot
    scored = corpus.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tok"),
        text.quality_score(F.col("text")).alias("quality"),
        text.lang_id(F.col("text")).alias("lang"),
        text.fingerprint(F.col("text")).alias("fp"),
    )
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert len(rows) == 60
    assert all(r["n_tok"] > 0 and r["lang"] is not None for r in rows.values())

    # exact dedup: 10 boilerplate inserts minus the 1 updated away → the
    # remaining 9 collapse into one group whose keeper is the min doc_id
    groups = dedup.exact_dedup(corpus, id_col="doc_id", text_col="text")
    assert groups.count() == 60 - (9 - 1)
    big = groups.filter(F.col("n_dups") > 1).collect()
    assert len(big) == 1
    assert big[0]["n_dups"] == 9 and big[0]["rep_id"] == "conv-003#0"
    # conv-000 turn 0 was updated away from the boilerplate → its own group
    assert groups.filter(F.col("rep_id") == "conv-000#0").count() == 1
