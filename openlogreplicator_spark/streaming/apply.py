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

Action budget per epoch (scale-relevant): a handful of passes over the
batch∪pending events — each a pushed-down, codegen'd scan that is CHEAPER
to recompute than to cache on fast storage (measured: full merge 457k ev/s
uncached vs 157k with .persist(); flip OLR_PERSIST_EVENTS /
OLR_PERSIST_COMMITTED to "1" on slow object-store input) — one persisted
pass per segment for the collapsed changes (bucket discovery and the
rewrite share it), plus tiny driver collects (DDL list, per-shard counts ≤
shards, affected buckets ≤ n_buckets).  No O(rows) driver traffic
anywhere.

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
from ..operators.collapse import collapse_net_changes
from ..operators.filters import split_tracked
from ..schema import CHANGE_EVENT_SCHEMA, LINEAGE_SCHEMA


def apply_epoch(
    table: LakeTable,
    batch_df: DataFrame,
    epoch_id: int,
    job_id: str = "default",
    tracked_pattern: str = "^transcripts$",
    max_txn_ops: int | None = None,
    shard_watermark: bool = False,
    expected_shards: list[int] | None = None,
    max_open_scn_lag: int | None = None,
    json_mirror_dir: str | None = None,
    schemaless: bool = False,
    dump_xids: list[str] | None = None,
    dump_dir: str | None = None,
) -> dict:
    """Apply one epoch of change events; returns apply stats.

    ``dump_xids`` + ``dump_dir``: trace facility (reference dumpXidList,
    TransactionBuffer.h:87-88): the RAW events of the named transactions
    are written as JSON lines under ``dump_dir/epoch=N`` for debugging —
    a pushed-down ``xid IN (...)`` side scan; the apply itself is
    unaffected.

    ``shard_watermark``: enable the RAC-analog commit-SCN gate for feeds
    whose shards arrive from independent sources (per-shard topics/dirs):
    a transaction applies only when every known shard's read frontier has
    passed its commit SCN; gated transactions ride the pending snapshot.
    The per-shard frontier persists in the lake manifest, atomically with
    the data (reference: Replicator.cpp:1142-1210).

    ``max_open_scn_lag``: expiry horizon for abandoned open transactions
    (reference analog: stale uncommitted txns discarded at forced
    checkpoint).  An open txn whose newest event scn trails the batch's max
    scn by more than the lag — and which has NO commit event (so
    watermark-gated committed txns are never touched) — is dropped whole and
    counted skipped, instead of riding the pending snapshot forever.

    ``schemaless``: the REDO_FLAGS::SCHEMALESS analog (reference:
    Parser.cpp:705, Metadata.cpp:676-706): committed DML of untracked tables
    is emitted on the JSON mirror as raw payloads (their own table names,
    chunk reassembly not applied) instead of being dropped-and-counted.  The
    lake table remains transcripts-only — untracked rows have no typed home,
    exactly like the reference emits OBJ_xxx payloads without applying them
    to a dictionary.
    """
    spark = table.spark
    table.refresh()

    if f"{epoch_id}:done" in table.manifest["ledger"].get(job_id, {}):
        return {"applied": False, "reason": "epoch already committed"}

    pending = table.pending(CHANGE_EVENT_SCHEMA)
    events = batch_df.select(*[f.name for f in CHANGE_EVENT_SCHEMA.fields]).unionByName(
        pending
    )
    # Caching policy (measured on the 10M-event bench, local[32], tmpfs):
    # recomputing the pushed-down, codegen'd scans per reuse beats paying
    # the columnar-cache build — full merge 457k ev/s uncached vs 157k
    # cached.  On slow/remote input (object storage) flip the envs to "1":
    # there a re-scan costs more than the cache build.
    import os as _os0

    _persist_events = _os0.environ.get("OLR_PERSIST_EVENTS", "0") == "1"
    if _persist_events:
        events = events.persist()
    if dump_xids and dump_dir:
        from ..operators.filters import dump_xid_events

        (
            dump_xid_events(batch_df, dump_xids)
            .coalesce(1)  # trace output is tiny (named xids only)
            .sortWithinPartitions("scn")
            .write.mode("overwrite")
            .json(_os0.path.join(dump_dir, f"epoch={int(epoch_id):06d}"))
        )
    try:
        wm = None
        frontier = None
        if shard_watermark:
            old_front = {
                int(k): int(v)
                for k, v in table.manifest.get("shard_frontier", {}).items()
            }
            # shards that exist but have not delivered yet must pin the
            # watermark at 0 (reference: RAC thread list known upfront)
            for s_ in expected_shards or []:
                old_front.setdefault(int(s_), 0)
            for r in events.groupBy("shard").agg(F.max("scn").alias("m")).collect():
                s = int(r["shard"])
                old_front[s] = max(old_front.get(s, 0), int(r["m"]))
            frontier = old_front
            wm = min(frontier.values()) if frontier else None

        parts = assemble_transactions(events, commit_watermark=wm)
        open_events = parts["open"]
        expired_dml = None
        if max_open_scn_lag is not None:
            hz = batch_df.agg(F.max("scn").alias("m")).first()["m"]
            if hz is not None:
                stale = (
                    open_events.groupBy("xid")
                    .agg(
                        F.max("scn").alias("_m"),
                        F.max(F.when(F.col("op") == "commit", 1)).alias("_committed"),
                    )
                    .filter(
                        (F.col("_m") < hz - max_open_scn_lag)
                        & F.col("_committed").isNull()
                    )
                    .select("xid")
                )
                expired_dml = open_events.join(stale, "xid", "left_semi").filter(
                    F.col("op").isin("ins", "upd", "del")
                )
                open_events = open_events.join(stale, "xid", "left_anti")
        # cache only the columns downstream stages read (before-images,
        # raw scn/seq and schema_version are not needed past this point)
        committed = parts["committed"].select(
            "lsn", "shard", "xid", "seq_in_txn", "op", "table_name",
            "conv_id", "turn_idx", "before", "after", "changed_cols",
            "chunk_no", "chunk_text", "ddl_stmt", "txn_commit_scn", "ts",
            "attrs",
        )
        import os as _os

        _do_persist = _os.environ.get("OLR_PERSIST_COMMITTED", "0") == "1"
        if _do_persist:
            committed = committed.persist()

        oversize_dml = None
        if max_txn_ops is not None:
            # T6 — transaction size cap: oversize txns dropped whole and
            # counted skipped (reference: ctx->transactionSizeMax,
            # Parser.cpp:610-620, 716-726).  The per-xid count is a tiny
            # aggregate; the drop is a broadcast anti-join.
            dml_ops = F.col("op").isin("ins", "upd", "del")
            oversize = (
                committed.filter(dml_ops)
                .groupBy("xid")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > max_txn_ops)
                .select("xid")
            )
            # no forced broadcast: a pathological feed can make the
            # oversize set itself large; AQE converts at runtime when it
            # is small (the normal case)
            oversize_dml = committed.join(oversize, "xid", "left_semi").filter(dml_ops)
            committed = committed.join(oversize, "xid", "left_anti")

        survivors = match_partial_rollbacks(committed)
        tracked, untracked = split_tracked(
            survivors.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
            tracked_pattern,
        )
        tracked = reassemble_chunks(tracked)
        tracked_dml = tracked.filter(F.col("op") != "chunk")

        untracked_dml = untracked.filter(F.col("op").isin("ins", "upd", "del"))
        if json_mirror_dir is not None:
            # W6 wire-format egress: the committed op stream as JSON
            # messages (the reference's primary output), epoch-idempotent
            from ..functions.json_output import write_json_mirror

            mirror_src = tracked_dml
            if schemaless:
                mirror_src = mirror_src.unionByName(untracked_dml)
            write_json_mirror(mirror_src, json_mirror_dir, epoch_id)

        # ---- DDL fence: segment the epoch at committed DDL commit_scns ----
        ddls = sorted(
            committed.filter(F.col("op") == "ddl")
            .select("txn_commit_scn", "ddl_stmt")
            .collect(),
            key=lambda r: r["txn_commit_scn"],
        )
        boundaries = [r["txn_commit_scn"] for r in ddls] + [None]

        # per-shard skip counts + consumed-LSN frontier (one small agg each)
        skipped_src = parts["dropped"].select("shard")
        if not schemaless:
            # schemaless mode emits untracked DML instead of skipping it
            skipped_src = skipped_src.unionByName(untracked_dml.select("shard"))
        if oversize_dml is not None:
            skipped_src = skipped_src.unionByName(oversize_dml.select("shard"))
        if expired_dml is not None:
            skipped_src = skipped_src.unionByName(expired_dml.select("shard"))
        skip_rows = (
            skipped_src.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_skipped"))
            .collect()
        )
        last_rows = (
            batch_df.groupBy("shard").agg(F.max("lsn").alias("last_applied_lsn")).collect()
        )

        lo = None
        n_merged = 0
        seg_counts: dict[int, list[int]] = {}
        for i, hi in enumerate(boundaries):
            seg = tracked_dml
            if lo is not None:
                seg = seg.filter(F.col("txn_commit_scn") > lo)
            if hi is not None:
                seg = seg.filter(F.col("txn_commit_scn") <= hi)
            final = hi is None
            changes = collapse_net_changes(seg, table.value_names).persist()
            for r in changes.groupBy("last_shard").agg(
                F.sum(F.when(~F.col("is_delete") & F.col("reset"), 1).otherwise(0)).alias("n_ins"),
                F.sum(F.when(~F.col("is_delete") & ~F.col("reset"), 1).otherwise(0)).alias("n_upd"),
                F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("n_del"),
            ).collect():
                acc = seg_counts.setdefault(r["last_shard"], [0, 0, 0])
                acc[0] += r["n_ins"]
                acc[1] += r["n_upd"]
                acc[2] += r["n_del"]

            lineage = None
            if final:
                shards = (
                    {r["shard"] for r in last_rows}
                    | {r["shard"] for r in skip_rows}
                    | set(seg_counts)
                )
                skip_by = {r["shard"]: r["n_skipped"] for r in skip_rows}
                last_by = {r["shard"]: r["last_applied_lsn"] for r in last_rows}
                lineage = spark.createDataFrame(
                    [
                        (
                            int(epoch_id),
                            s,
                            tracked_pattern,
                            last_by.get(s),
                            *(seg_counts.get(s, [0, 0, 0])),
                            skip_by.get(s, 0),
                        )
                        for s in sorted(shards, key=lambda x: (x is None, x))
                    ],
                    LINEAGE_SCHEMA,
                )

            applied = table.merge(
                changes,
                epoch_id=f"{epoch_id}:{i}",
                job_id=job_id,
                pending=open_events if final else None,
                lineage=lineage,
                shard_frontier=frontier if final else None,
            )
            changes.unpersist()
            if applied:
                n_merged += 1
            if not final:
                # supported DDL verbs (reference: Builder.cpp:1738-1830):
                #   ADD COLUMN <name> <type>   — metadata-only widen
                #   DROP COLUMN <name>         — metadata-only removal
                #   TRUNCATE [TABLE <name>]    — empty the bucket map
                # Each applies at most once per epoch position (ledger mark
                # in the same atomic manifest commit) so a crash-replay of
                # the epoch cannot re-truncate data merged by later segments.
                mark = f"{epoch_id}:ddl{i}"
                if mark not in table.manifest["ledger"].get(job_id, {}):
                    stmt = (ddls[i]["ddl_stmt"] or "").split()
                    verb = stmt[0].upper() if stmt else ""
                    lm = (job_id, mark)
                    if verb == "ADD" and len(stmt) >= 4 and stmt[1].upper() == "COLUMN":
                        table.alter_add_column(stmt[2], stmt[3].lower(), ledger_mark=lm)
                    elif verb == "DROP" and len(stmt) >= 3 and stmt[1].upper() == "COLUMN":
                        table.alter_drop_column(stmt[2], ledger_mark=lm)
                    elif verb == "TRUNCATE":
                        table.truncate(ledger_mark=lm)
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
        if _do_persist:
            committed.unpersist()
        return {"applied": True, "segments": len(boundaries), "merged": n_merged}
    finally:
        if _persist_events:
            events.unpersist()
