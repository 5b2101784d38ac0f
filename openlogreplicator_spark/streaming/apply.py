"""Per-epoch apply: the Writer + SystemTransaction analog.

One call per micro-batch (foreachBatch) or per bounded replay.  Pipeline:

    batch ∪ pending ──┬─ control events → txn status (broadcast)
                      ├─ committed payload → prollback match → chunk
                      │   reassembly → tracked split → net-change collapse
                      │   → LakeTable.merge (bucketed copy-on-write)
                      ├─ open txns → incremental pending carry (state)
                      └─ dropped/untracked → lineage skip counters

DDL fencing (SURVEY.md §7.4 risk 4): committed DDLs split the epoch into
segments by commit_scn; each segment merges under the schema active at its
position, then the ALTER applies — never mid-merge.  Segment merges use
ledger keys "{epoch}:{i}" so a crash between segments replays idempotently
(re-merging identical net changes is a no-op by construction).

Action budget per epoch (the fixed-cost story — round-3 measured ~49 s of
per-epoch overhead at ~4 s/job on this box, BASELINE.md t(c)=f+w/c fit):

  1. ONE fused stats job (streaming/stats.py) for every driver scalar —
     DDL list, per-shard skip counts + LSN frontier + scn horizon,
     savepoint/chunk probe counts, the open-transaction set;
  2. per segment, ONE persisted collapse pass whose single counts collect
     yields BOTH the lineage counters and the affected buckets;
  3. the merge write itself;
  4. a pending DELTA write only when this batch added open events
     (O(new events), not O(open set) — and zero jobs when it didn't);
  5. lineage rows written driver-side via pyarrow — zero jobs;
plus config-gated extras (watermark pre-job; one skip-count job when a
txn cap / expiry / savepoint interplay invalidates the fused counters).
No O(rows) driver traffic anywhere — including the open set: per-xid
detail collects only up to stats.OPEN_DETAIL_CAP; past it the pending
carry, tombstones, and expiry all run as distributed joins
(plan_pending_update_large) and the driver sees aggregate counts only.

The reference serializes all of this on one writer thread
(/root/reference/src/writer/Writer.cpp:213-360) with a client-checkpoint
dedup (Writer.cpp:296-298); here foreachBatch gives the serialization and
the manifest ledger gives the dedup.
"""

from __future__ import annotations

import os

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
from ..schema import CHANGE_EVENT_SCHEMA
from .stats import epoch_stats

# pending-carry compaction dials: rewrite the full open-set snapshot when
# the delta chain or the tombstone list grows past these (same lazy-compact
# idea as the MoR data path)
PENDING_COMPACT_DIRS = 8
PENDING_CLOSED_CAP = 50_000


def _changes_cache_level():
    """StorageLevel for the per-epoch collapsed-changes cache.

    The frame is written once (the fused stats job materializes it) and
    scanned once (the merge) — a 1-write/1-read temp, not a hot cache.
    Deserialized on-heap rows (Spark's DataFrame default) make that temp
    O(epoch) JVM objects: GC pause time grows with epoch size and does NOT
    scale with cores (measured on the 20M-event bench epoch: the merge's
    extra-over-parse cost scaled at ~0.56 efficiency 2→8 cores while the
    pure-compute parse scaled ~0.9).  Serialized storage keeps the temp in
    compact Tungsten bytes off the GC's object graph — the write/read is
    sequential-bandwidth-bound, which a real cluster scales per-executor.

    OLR_CHANGES_CACHE: ``memser`` (default: MEMORY_AND_DISK, serialized
    columnar in storage memory with graceful disk spill — measured best on
    every path of the 25M-event update epoch AND the 50M-event full merge,
    round-5 tools/exp_update_epoch.py: MoR 313k vs disk's 288k ev/s at 8
    cores, ties at 2), ``disk`` (DISK_ONLY — spark.local.dir; the all-disk
    variant when executor storage memory is committed elsewhere), ``deser``
    (the old DataFrame default), ``none`` (no cache: the merge recomputes
    the collapse plan — 2× plan CPU, zero cache traffic)."""
    from pyspark import StorageLevel

    name = os.environ.get("OLR_CHANGES_CACHE", "memser").lower()
    return {
        "disk": StorageLevel.DISK_ONLY,
        "memser": StorageLevel.MEMORY_AND_DISK,
        "deser": StorageLevel.MEMORY_AND_DISK_DESER,
        "none": None,
    }[name]


def _pending_bytes(root: str, manifest: dict) -> int | None:
    """On-disk bytes of the open-transaction carry — the engine's analog of
    the reference's transaction-buffer swap usage (MemoryManager.cpp), fed
    to the swap_usage_mb / memory_used_mb{type=transactions} gauges.
    Driver-side os.stat over O(pending files); metrics-path only."""
    dirs = manifest.get("pending_dirs", [])
    if not dirs:
        return 0
    total = 0
    try:
        for d in dirs:
            p = os.path.join(root, d)
            if os.path.isdir(p):
                for f in os.listdir(p):
                    total += os.path.getsize(os.path.join(p, f))
    except OSError:
        return None
    return total


def plan_pending_update(
    manifest: dict, cur_open: set, n_new_events: int
) -> tuple[dict, bool]:
    """Decide this epoch's pending-state commit (see LakeTable.merge) —
    SMALL-open-set mode: the per-xid detail fit the stats collect cap, so
    tombstones live as a literal list in the manifest and a delta with no
    new events is a manifest-only commit (zero jobs).

    Returns (pending_update, needs_df): ``needs_df`` tells the caller
    whether the update requires the open-events frame (full snapshot or a
    non-empty delta).

    Reference analog: TransactionBuffer keeps open txns in place and spills
    incrementally (src/common/MemoryManager.cpp:1-410); rewriting the whole
    open set per epoch made a months-open mega-transaction cost O(open set)
    every epoch.
    """
    prev_dirs = manifest.get("pending_dirs", [])
    prev_closed = set(manifest.get("pending_closed", []))
    prev_open = manifest.get("pending_open_xids")

    if not cur_open:
        return {"mode": "clear"}, False
    closed_total = (prev_closed | (set(prev_open or []) - cur_open)) - cur_open
    if (
        prev_open is None  # legacy snapshot / large-mode exit: set unknown
        or manifest.get("pending_open_large")
        or manifest.get("pending_closed_dirs")
        or len(prev_dirs) >= PENDING_COMPACT_DIRS
        or len(closed_total) > PENDING_CLOSED_CAP
    ):
        return {"mode": "full", "open_xids": cur_open}, True
    upd = {"mode": "delta", "closed": closed_total, "open_xids": cur_open}
    return upd, n_new_events > 0


def plan_pending_update_large(
    manifest: dict,
    n_open_xids: int,
    n_new_events: int,
    n_closed_pending_rows: int,
    n_stale: int = 0,
) -> tuple[dict, bool]:
    """LARGE-open-set mode (the open set overflowed the stats detail cap,
    streaming/stats.py OPEN_DETAIL_CAP): no xid set ever touches the
    driver or the manifest.  Tombstones are parquet files of closed xids
    anti-joined at read time (read_pending_state), computed as a
    distributed anti-join by the caller when ``need_closed_df`` is set.

    Returns (pending_update, needs_df).  The caller attaches ``df`` when
    needs_df and ``closed_df`` when pending_update['need_closed_df'].
    """
    prev_dirs = manifest.get("pending_dirs", [])
    if n_open_xids <= 0:
        return {"mode": "clear"}, False
    if (
        not manifest.get("pending_open_large")  # entering large mode
        or len(prev_dirs) >= PENDING_COMPACT_DIRS
        or len(manifest.get("pending_closed_dirs", [])) >= PENDING_COMPACT_DIRS
    ):
        return {"mode": "full", "open_large": True}, True
    upd: dict = {"mode": "delta", "open_large": True}
    if n_closed_pending_rows > 0 or n_stale > 0:
        upd["need_closed_df"] = True
    return upd, n_new_events > 0


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
    protobuf_spool_dir: str | None = None,
    schemaless: bool = False,
    dump_xids: list[str] | None = None,
    dump_dir: str | None = None,
    json_format=None,
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
    counted skipped, instead of riding the pending state forever.

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

    fields = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
    # the event schema comes from the BATCH (a wide feed carries a wider
    # before/after struct than the transcript superset; the pending state
    # was written by the same feed and reads back with the same schema)
    ev_schema = batch_df.select(*fields).schema
    pending = table.pending(ev_schema)
    # _pend marks rows carried from the previous epoch's pending state —
    # the incremental pending writer persists only the ~_pend complement
    events = (
        batch_df.select(*fields)
        .withColumn("_pend", F.lit(False))
        .unionByName(pending.select(*fields).withColumn("_pend", F.lit(True)))
    )
    # Caching policy (measured on the 10M-event bench, local[32], tmpfs):
    # recomputing the pushed-down, codegen'd scans per reuse beats paying
    # the columnar-cache build — full merge 457k ev/s uncached vs 157k
    # cached.  On slow/remote input (object storage) flip the envs to "1":
    # there a re-scan costs more than the cache build.
    _persist_events = os.environ.get("OLR_PERSIST_EVENTS", "0") == "1"
    if _persist_events:
        events = events.persist()
    if dump_xids and dump_dir:
        from ..operators.filters import dump_xid_events

        (
            dump_xid_events(batch_df, dump_xids)
            .coalesce(1)  # trace output is tiny (named xids only)
            .sortWithinPartitions("scn")
            .write.mode("overwrite")
            .json(os.path.join(dump_dir, f"epoch={int(epoch_id):06d}"))
        )
    try:
        wm = None
        frontier = None
        if shard_watermark:
            # one batch-only pre-job: the watermark gates the assemble plan
            # itself, so it cannot ride the post-assemble stats job.
            # Pending rows' scns were folded into the persisted frontier
            # the epoch they arrived (monotone max), so batch-only is exact.
            old_front = {
                int(k): int(v)
                for k, v in table.manifest.get("shard_frontier", {}).items()
            }
            for s_ in expected_shards or []:
                old_front.setdefault(int(s_), 0)
            for r in batch_df.groupBy("shard").agg(F.max("scn").alias("m")).collect():
                s = int(r["shard"])
                old_front[s] = max(old_front.get(s, 0), int(r["m"]))
            frontier = old_front
            wm = min(frontier.values()) if frontier else None

        parts = assemble_transactions(events, commit_watermark=wm)
        committed_all = parts["committed"].select(
            "lsn", "shard", "xid", "seq_in_txn", "op", "table_name",
            "conv_id", "turn_idx", "before", "after", "changed_cols",
            "chunk_no", "chunk_text", "ddl_stmt", "txn_commit_scn", "ts",
            "attrs",
        )

        # ---- the ONE fused stats job (see module docstring) ----
        # OPTIMISTIC fusion: when no txn cap is configured, the whole-epoch
        # collapse (built assuming no savepoints/chunks/DDL — the common
        # feed) rides the stats job as a counter branch, so the stats
        # action ALSO fills the collapse persist cache and returns the
        # lineage counters + affected buckets: stats and counts become ONE
        # job.  If the stats then reveal savepoints, chunks, or DDL, the
        # optimistic frame is discarded and the exact per-segment path
        # below recomputes (rare; one extra pass).
        optimistic = max_txn_ops is None
        changes0 = None
        extra_branches = None
        if optimistic:
            surv0 = match_partial_rollbacks(committed_all, n_hint=0)
            tr0, _ = split_tracked(
                surv0.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
                tracked_pattern,
            )
            tdml0 = reassemble_chunks(tr0, n_hint=0).filter(F.col("op") != "chunk")
            changes0 = collapse_net_changes(tdml0, table.value_names).withColumn(
                "_bucket", table._bucket_expr()
            )
            _lvl = _changes_cache_level()
            if _lvl is not None:
                changes0 = changes0.persist(_lvl)
            from .stats import collapse_counts_branch

            extra_branches = [collapse_counts_branch(changes0)]
        is_tracked = F.col("table_name").isNotNull() & F.col("table_name").rlike(
            tracked_pattern
        )
        from .prometheus import get_registry

        registry = get_registry()
        stats = epoch_stats(
            batch_df,
            parts,
            untracked_cond=~F.coalesce(is_tracked, F.lit(False)),
            pending_flag="_pend",
            extra_branches=extra_branches,
            pending_events=events.filter(F.col("_pend")),
            dml_type_counts=registry is not None,
            events=events,
        )
        use_fused = (
            changes0 is not None
            and stats["n_prollback"] == 0
            and stats["n_chunks"] == 0
            and not stats["ddls"]
        )
        if changes0 is not None and not use_fused:
            changes0.unpersist()
            changes0 = None

        open_events = parts["open"]
        detail = stats["open_xids"]  # per-xid dict, or None past the cap
        osum = stats["open_summary"]
        n_open_xids = osum["n_xids"]
        cur_open = set(detail) if detail is not None else None
        expired_dml = None
        n_stale = 0
        if max_open_scn_lag is not None and stats["max_scn_by_shard"] and n_open_xids:
            hz = max(stats["max_scn_by_shard"].values())
            if detail is not None:
                stale = sorted(
                    x
                    for x, info in detail.items()
                    if info["max_scn"] < hz - max_open_scn_lag
                    and not info["has_commit"]
                )
                n_stale = len(stale)
                if stale:
                    expired_dml = open_events.filter(
                        F.col("xid").isin(stale) & F.col("op").isin("ins", "upd", "del")
                    )
                    open_events = open_events.filter(~F.col("xid").isin(stale))
                    cur_open -= set(stale)
            else:
                # large open set: the stale set is computed as a DataFrame
                # and applied by anti-join — per-xid rows never reach the
                # driver (one config-gated scalar count job)
                stale_xids = (
                    open_events.groupBy("xid")
                    .agg(
                        F.max("scn").alias("_mx"),
                        F.max(
                            F.when(F.col("op") == "commit", F.lit(1)).otherwise(F.lit(0))
                        ).alias("_hc"),
                    )
                    .filter(
                        (F.col("_mx") < F.lit(hz - max_open_scn_lag))
                        & (F.col("_hc") == 0)
                    )
                    .select("xid")
                )
                n_stale = stale_xids.count()
                if n_stale:
                    expired_dml = open_events.join(
                        stale_xids, "xid", "left_semi"
                    ).filter(F.col("op").isin("ins", "upd", "del"))
                    open_events = open_events.join(stale_xids, "xid", "left_anti")
            n_open_xids -= n_stale

        # only the columns downstream stages read (before-images, raw
        # scn/seq and schema_version are not needed past this point)
        committed = committed_all
        _do_persist = os.environ.get("OLR_PERSIST_COMMITTED", "0") == "1"
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

        survivors = match_partial_rollbacks(committed, n_hint=stats["n_prollback"])
        tracked, untracked = split_tracked(
            survivors.filter(F.col("op").isin("ins", "upd", "del", "chunk")),
            tracked_pattern,
        )
        tracked = reassemble_chunks(tracked, n_hint=stats["n_chunks"])
        tracked_dml = tracked.filter(F.col("op") != "chunk")

        untracked_dml = untracked.filter(F.col("op").isin("ins", "upd", "del"))
        if json_mirror_dir is not None or protobuf_spool_dir is not None:
            mirror_src = tracked_dml
            if schemaless:
                mirror_src = mirror_src.unionByName(untracked_dml)
        if json_mirror_dir is not None:
            # W6 wire-format egress: the committed op stream as JSON
            # messages (the reference's primary output), epoch-idempotent
            from ..functions.json_output import write_json_mirror

            write_json_mirror(mirror_src, json_mirror_dir, epoch_id,
                              ddls=stats["ddls"], fmt=json_format)
        if protobuf_spool_dir is not None:
            # W7 binary egress twin: RedoResponse spool, same rotation /
            # idempotence contract; feeds net-serve and the protobuf
            # chained tail
            from ..sources.network import write_protobuf_mirror

            write_protobuf_mirror(mirror_src, protobuf_spool_dir, epoch_id,
                                  ddls=stats["ddls"], fmt=json_format)

        # ---- per-shard skip counts, driver-side from the stats job ----
        skip_by = dict(stats["dropped_by_shard"])
        # the fused untracked counters are defined over committed rows
        # BEFORE savepoint matching / txn-cap drops; with either in play the
        # (rare-config) dedicated job below recounts post-matching
        fused_unt_valid = stats["n_prollback"] == 0 and max_txn_ops is None
        if fused_unt_valid and not schemaless:
            for s, n in stats["untracked_by_shard"].items():
                skip_by[s] = skip_by.get(s, 0) + n
        extra_skip = []
        if not fused_unt_valid and not schemaless:
            extra_skip.append(untracked_dml.select("shard"))
        if oversize_dml is not None:
            extra_skip.append(oversize_dml.select("shard"))
        if expired_dml is not None:
            extra_skip.append(expired_dml.select("shard"))
        if extra_skip:
            u = extra_skip[0]
            for e in extra_skip[1:]:
                u = u.unionByName(e)
            for r in u.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect():
                skip_by[r["shard"]] = skip_by.get(r["shard"], 0) + r["n"]

        last_by = stats["last_lsn_by_shard"]

        # ---- pending carry: delta-append, compact lazily ----
        if detail is not None:
            n_new = sum(detail[x]["n_new"] for x in cur_open)
            pending_update, needs_df = plan_pending_update(
                table.manifest, cur_open, n_new
            )
        else:
            pending_update, needs_df = plan_pending_update_large(
                table.manifest,
                n_open_xids,
                osum["n_new"],
                n_closed_pending_rows=(
                    int(stats["n_pending_rows"] or 0) - osum["n_pend_open_rows"]
                ),
                n_stale=n_stale,
            )
        if needs_df:
            df = open_events
            if pending_update["mode"] == "delta":
                df = df.filter(~F.col("_pend"))
            pending_update["df"] = df.select(*fields)
        if pending_update.get("need_closed_df"):
            # previously-pending xids that closed (or expired) this epoch —
            # a distributed anti-join, written as a parquet tombstone
            pending_update["closed_df"] = pending.select("xid").distinct().join(
                open_events.select("xid").distinct(), "xid", "left_anti"
            )

        # ---- DDL fence: segment the epoch at committed DDL commit_scns ----
        ddls = stats["ddls"]  # [(commit_scn, seq_in_txn, stmt)] sorted
        boundaries = [d[0] for d in ddls] + [None]

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
            affected = set()
            n_changes = 0
            if use_fused:
                # the stats job already materialized the collapse cache AND
                # collected its counters — zero extra jobs here
                changes = changes0
                for (_t, s, b), (ni, nu, nd) in stats["counts"].items():
                    affected.add(b)
                    n_changes += ni + nu + nd
                    acc = seg_counts.setdefault(s, [0, 0, 0])
                    acc[0] += ni
                    acc[1] += nu
                    acc[2] += nd
            else:
                # ONE persisted pass per segment: its single counts collect
                # feeds both the lineage counters AND the affected-bucket
                # list (merge skips its own discovery job)
                changes = collapse_net_changes(seg, table.value_names).withColumn(
                    "_bucket", table._bucket_expr()
                )
                _lvl = _changes_cache_level()
                if _lvl is not None:
                    changes = changes.persist(_lvl)
                for r in changes.groupBy("_bucket", "last_shard").agg(
                    F.sum(F.when(~F.col("is_delete") & F.col("reset"), 1).otherwise(0)).alias("n_ins"),
                    F.sum(F.when(~F.col("is_delete") & ~F.col("reset"), 1).otherwise(0)).alias("n_upd"),
                    F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("n_del"),
                ).collect():
                    affected.add(r["_bucket"])
                    n_changes += r["n_ins"] + r["n_upd"] + r["n_del"]
                    acc = seg_counts.setdefault(r["last_shard"], [0, 0, 0])
                    acc[0] += r["n_ins"]
                    acc[1] += r["n_upd"]
                    acc[2] += r["n_del"]

            lineage_rows = None
            if final:
                shards = set(last_by) | set(skip_by) | set(seg_counts)
                lineage_rows = [
                    (
                        int(epoch_id),
                        s,
                        tracked_pattern,
                        last_by.get(s),
                        *(seg_counts.get(s, [0, 0, 0])),
                        skip_by.get(s, 0),
                    )
                    for s in sorted(shards, key=lambda x: (x is None, x))
                ]

            applied = table.merge(
                changes,
                epoch_id=f"{epoch_id}:{i}",
                job_id=job_id,
                affected=sorted(affected),
                pending_update=pending_update if final else None,
                lineage_rows=lineage_rows,
                shard_frontier=frontier if final else None,
                n_changes=n_changes,
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
                    stmt = (ddls[i][2] or "").split()
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
        if registry is not None:
            registry.observe_epoch(
                dml_by_type=stats["dml_ops_by_type"],
                n_skipped=sum(skip_by.values()),
                n_commits=stats["n_commits"] or 0,
                n_rollbacks=stats["n_rollbacks"] or 0,
                ddls=stats["ddls"],
                had_changes=n_merged > 0,
                pending_bytes=_pending_bytes(table.path, m),
            )
        return {"applied": True, "segments": len(boundaries), "merged": n_merged}
    finally:
        if _persist_events:
            events.unpersist()
