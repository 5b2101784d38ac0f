"""Per-epoch apply: the Writer + SystemTransaction analog.

One call per micro-batch (foreachBatch) or per bounded replay.  Pipeline:

    batch ∪ pending ──┬─ control events → txn status (broadcast)
                      ├─ committed payload → prollback match → chunk
                      │   reassembly → tracked split → net-change collapse
                      │   → LakeTable.merge (bucketed copy-on-write)
                      ├─ open txns → pending snapshot (state carry)
                      └─ dropped/untracked → lineage skip counters

DDL fencing (SURVEY.md §7.4 risk 4): committed DDLs split the epoch into
segments by commit_scn; each segment merges under the schema active at its
position, then the ALTER applies — never mid-merge.  Segment merges use
ledger keys "{epoch}:{i}" so a crash between segments replays idempotently
(re-merging identical net changes is a no-op by construction).

The reference serializes all of this on one writer thread
(/root/reference/src/writer/Writer.cpp:213-360) with a client-checkpoint
dedup (Writer.cpp:296-298); here foreachBatch gives the serialization and
the manifest ledger gives the dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake import LakeTable
from ..operators.assemble import (
    assemble_transactions,
    match_partial_rollbacks,
    reassemble_chunks,
)
from ..operators.collapse import collapse_net_changes, lineage_from_batch
from ..operators.filters import split_tracked
from ..schema import CHANGE_EVENT_SCHEMA


def apply_epoch(
    table: LakeTable,
    batch_df: DataFrame,
    epoch_id: int,
    job_id: str = "default",
    tracked_pattern: str = "^transcripts$",
) -> dict:
    """Apply one epoch of change events; returns apply stats."""
    spark = table.spark
    table.refresh()

    if f"{epoch_id}:done" in table.manifest["ledger"].get(job_id, {}):
        return {"applied": False, "reason": "epoch already committed"}

    pending = table.pending(CHANGE_EVENT_SCHEMA)
    events = batch_df.select(*[f.name for f in CHANGE_EVENT_SCHEMA.fields]).unionByName(
        pending
    )
    events = events.persist()
    try:
        parts = assemble_transactions(events)
        committed = parts["committed"].persist()
        survivors = match_partial_rollbacks(committed)
        tracked, untracked = split_tracked(
            survivors.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
            tracked_pattern,
        )
        tracked = reassemble_chunks(tracked).persist()

        # ---- DDL fence: segment the epoch at committed DDL commit_scns ----
        ddls = sorted(
            committed.filter(F.col("op") == "ddl")
            .select("txn_commit_scn", "ddl_stmt")
            .collect(),
            key=lambda r: r["txn_commit_scn"],
        )
        boundaries = [r["txn_commit_scn"] for r in ddls] + [None]

        from ..schema import TRANSCRIPT_COLUMNS_ALL

        lineage = lineage_from_batch(
            collapse_net_changes(
                tracked.filter(F.col("op") != "chunk"), TRANSCRIPT_COLUMNS_ALL
            ),
            parts["dropped"],
            untracked.filter(F.col("op").isin("ins", "upd", "del")),
            batch_df,
            epoch_id,
        )

        lo = None
        n_merged = 0
        for i, hi in enumerate(boundaries):
            seg = tracked.filter(F.col("op") != "chunk")
            if lo is not None:
                seg = seg.filter(F.col("txn_commit_scn") > lo)
            if hi is not None:
                seg = seg.filter(F.col("txn_commit_scn") <= hi)
            final = hi is None
            changes = collapse_net_changes(seg, table.value_names)
            applied = table.merge(
                changes,
                epoch_id=f"{epoch_id}:{i}",
                job_id=job_id,
                pending=parts["open"] if final else None,
                lineage=lineage if final else None,
            )
            if applied:
                n_merged += 1
            if not final:
                stmt = (ddls[i]["ddl_stmt"] or "").split()
                # supported DDL: "ADD COLUMN <name> <type>"
                if len(stmt) >= 4 and stmt[0].upper() == "ADD" and stmt[1].upper() == "COLUMN":
                    table.alter_add_column(stmt[2], stmt[3].lower())
            lo = hi

        # final marker: lets a replayed epoch short-circuit entirely
        table.refresh()
        m = dict(table.manifest)
        ledger = {k: dict(v) for k, v in m["ledger"].items()}
        ledger.setdefault(job_id, {})[f"{epoch_id}:done"] = True
        m["ledger"] = ledger
        m["version"] = m["version"] + 1
        LakeTable._write_manifest_static(table.path, m)
        table.manifest = m
        committed.unpersist()
        tracked.unpersist()
        return {"applied": True, "segments": len(boundaries), "merged": n_merged}
    finally:
        events.unpersist()
