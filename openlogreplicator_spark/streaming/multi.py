"""Multi-table per-epoch apply — N tracked tables under ONE epoch fence.

The reference replicates an arbitrary owner/table set concurrently: table
masks compile into dictionary maps (``Schema::buildMaps``,
/root/reference/src/metadata/Schema.h:129-132), every redo record routes to
its table, and DDL can create/drop tables mid-stream (DDL types 1/4/9
create, 8/12 drop — /root/reference/src/builder/Builder.cpp:1807-1830;
fixtures tests/sql/inputs/multi-table.sql, rac-concurrent-tables.rac.sql).

Here the same shape over a :class:`~..lake.catalog.Catalog`: the assembly
pipeline (status join → prollback match → chunk reassembly → collapse) is
shared — it is table-agnostic, every grouping already keys by table_name —
and only the SINK fans out.  Per DDL-fenced segment, ALL live tables
collapse in ONE aggregation job (grouped by (table_name, key); the
per-table bucket id is computed through a table→n_buckets literal map), a
single counts collect yields every table's lineage counters AND affected
buckets, and only the final per-table WRITES fan out over the one
persisted result — O(1) Spark jobs per segment plus one write per touched
table, instead of the round-3 O(tables) collapse jobs + O(tables) driver
collects that serialized a 50-table catalog.

Exactly-once composes: each per-table segment merge is idempotent under
that table's ledger (key ``{epoch}:{segment}``), each DDL is ledger-marked
atomically with its metadata commit, and the catalog's ``{epoch}:done``
marker commits LAST with the shared state (pending carry, shard frontier,
per-(shard, table) lineage) — a crash anywhere replays the epoch and every
committed piece no-ops.  Mid-epoch CREATE/DROP snapshot the epoch-start
registry (Catalog.create_table docstring) so replayed segments route
identically.

DDL verbs (superset of the single-table ones; bare verbs route to the
default table for single-table feed compatibility):

    CREATE TABLE <name> [(col type, ...)]
    DROP TABLE <name>
    ALTER TABLE <name> ADD COLUMN <col> <type>
    ALTER TABLE <name> DROP COLUMN <col>
    TRUNCATE [TABLE <name>]
    ADD COLUMN <col> <type> | DROP COLUMN <col>      (→ default table)

Registration is SEGMENT-scoped, like the reference's dictionary: DML that
commits before its table's CREATE TABLE commit (or after its DROP) has no
dictionary entry and is skip-counted, exactly like untracked tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.catalog import Catalog, parse_create_columns
from ..lake.table import LakeTable
from ..operators.assemble import (
    assemble_transactions,
    match_partial_rollbacks,
    reassemble_chunks,
)
from ..operators.collapse import collapse_net_changes
from ..schema import CHANGE_EVENT_SCHEMA
from .apply import (
    _changes_cache_level,
    plan_pending_update,
    plan_pending_update_large,
)
from .stats import epoch_stats


def _persist_changes(df: DataFrame) -> DataFrame:
    """Persist a per-epoch collapsed-changes temp at the shared policy
    (apply._changes_cache_level: DISK_ONLY default — serialized Tungsten
    bytes off the GC object graph; deser on-heap rows made the 1-write/
    N-read temp a GC bottleneck that did not scale with cores)."""
    lvl = _changes_cache_level()
    return df if lvl is None else df.persist(lvl)


def parse_ddl(stmt: str, default_table: str | None) -> tuple:
    """Normalize a DDL statement into (verb, table, arg).  Unknown verbs
    → ('noop', None, None) and are counted, not fatal (the reference
    tolerates unparsed DDL the same way: emitted, not applied)."""
    toks = (stmt or "").split()
    up = [t.upper() for t in toks]
    if len(up) >= 3 and up[0] == "CREATE" and up[1] == "TABLE":
        # tolerated, not fatal: a column list this parser can't express
        # ('decimal(10,2)', 'text not null', 'map<string,string>') falls back
        # to the default transcript columns instead of killing the stream —
        # the same policy as unknown DDL verbs (counted, not applied)
        try:
            cols = parse_create_columns(stmt)
        except ValueError:
            cols = None
        return ("create", toks[2].rstrip("("), cols)
    if len(up) >= 3 and up[0] == "DROP" and up[1] == "TABLE":
        return ("drop", toks[2], None)
    if len(up) >= 6 and up[0] == "ALTER" and up[1] == "TABLE" and up[3] == "ADD" and up[4] == "COLUMN":
        return ("add_col", toks[2], (toks[5], toks[6].lower() if len(toks) > 6 else "string"))
    if len(up) >= 6 and up[0] == "ALTER" and up[1] == "TABLE" and up[3] == "DROP" and up[4] == "COLUMN":
        return ("drop_col", toks[2], toks[5])
    if up and up[0] == "TRUNCATE":
        name = toks[2] if len(up) >= 3 and up[1] == "TABLE" else (
            toks[1] if len(up) >= 2 else default_table
        )
        return ("truncate", name or default_table, None)
    if len(up) >= 3 and up[0] == "ADD" and up[1] == "COLUMN":
        return ("add_col", default_table, (toks[2], toks[3].lower() if len(toks) > 3 else "string"))
    if len(up) >= 3 and up[0] == "DROP" and up[1] == "COLUMN":
        return ("drop_col", default_table, toks[2])
    return ("noop", None, None)


def _apply_ddl(
    catalog: Catalog,
    verb: str,
    name: str | None,
    arg,
    lm: tuple[str, str],
    registry_snapshot: tuple[str, str, dict] | None = None,
):
    """Route one fenced DDL; every mutation is ledger-marked atomically with
    its own metadata commit (catalog ledger for registry changes, the
    table's ledger for schema changes) so crash replay applies it once.
    ``registry_snapshot``: the epoch-start registry, persisted with the
    FIRST create/drop of the epoch (Catalog.create_table docstring) so a
    crash-replayed epoch routes segments exactly like the clean run."""
    job_id, mark = lm
    if verb in ("create", "drop"):
        if mark in catalog.manifest["ledger"].get(job_id, {}):
            return
        if verb == "create":
            catalog.create_table(
                name, value_cols=arg, ledger_mark=lm,
                registry_snapshot=registry_snapshot,
            )
        else:
            catalog.drop_table(
                name, ledger_mark=lm, registry_snapshot=registry_snapshot
            )
        return
    if name not in catalog.manifest["tables"]:
        return  # ALTER/TRUNCATE of an unknown table: tolerated, not fatal
    table = catalog.table(name)
    if mark in table.manifest["ledger"].get(job_id, {}):
        return
    if verb == "add_col":
        table.alter_add_column(arg[0], arg[1], ledger_mark=lm)
    elif verb == "drop_col":
        table.alter_drop_column(arg, ledger_mark=lm)
    elif verb == "truncate":
        table.truncate(ledger_mark=lm)


def _resolve_table(
    catalog: Catalog, name: str, start_registry: dict
) -> LakeTable | None:
    """A segment's merge target.  Normally the registered table; on a crash
    replay a table DROPPED mid-epoch is no longer registered, but its data
    directory (an orphan until vacuumed) still holds the ledger marks that
    make the replayed early-segment merges no-op — route to it by the
    epoch-start snapshot path."""
    if name in catalog.manifest["tables"]:
        return catalog.table(name)
    rel = start_registry.get(name, f"tables/{name}")
    p = os.path.join(catalog.path, rel)
    if os.path.exists(os.path.join(p, "VERSION")):
        return LakeTable(catalog.spark, p)
    return None


def apply_epoch_multi(
    catalog: Catalog,
    batch_df: DataFrame,
    epoch_id: int,
    job_id: str = "default",
    max_txn_ops: int | None = None,
    shard_watermark: bool = False,
    expected_shards: list[int] | None = None,
    max_open_scn_lag: int | None = None,
    json_mirror_dir: str | None = None,
    protobuf_spool_dir: str | None = None,
    schemaless: bool = False,
    default_table: str | None = None,
    auto_register: bool = False,
    json_format=None,
) -> dict:
    """Apply one epoch of change events across every registered table.

    Same contract as :func:`..streaming.apply.apply_epoch` (see its
    docstring for shard_watermark / max_open_scn_lag / schemaless), with the
    tracked set = the catalog registry as it evolves across the epoch's DDL
    fence instead of one regex pattern.  Same per-epoch action budget
    (apply.py module docstring): one fused stats job, one persisted
    collapse + one counts collect per segment (covering ALL live tables),
    per-table writes, an incremental pending delta, driver-side lineage.
    """
    spark = catalog.spark
    catalog.refresh()
    if f"{epoch_id}:done" in catalog.manifest["ledger"].get(job_id, {}):
        return {"applied": False, "reason": "epoch already committed"}
    # Epoch-start registry: on a CLEAN run this is the live registry; on a
    # CRASH REPLAY after a mid-epoch CREATE/DROP committed, the live
    # registry has already mutated — seed from the snapshot persisted with
    # that first mutation so early segments route exactly like the clean
    # run (DML committed before a CREATE stays skipped).
    start_registry = catalog.epoch_start_registry(job_id, str(epoch_id))
    if start_registry is None:
        start_registry = {
            n: catalog.manifest["tables"][n]["path"] for n in catalog.table_names
        }
    if default_table is None:
        default_table = sorted(start_registry)[0] if start_registry else None

    fields = [f.name for f in CHANGE_EVENT_SCHEMA.fields]
    # the event schema comes from the BATCH (a wide feed carries a wider
    # before/after struct than the transcript superset; the pending state
    # was written by the same feed and reads back with the same schema)
    ev_schema = batch_df.select(*fields).schema
    pending = catalog.pending(ev_schema)
    events = (
        batch_df.select(*fields)
        .withColumn("_pend", F.lit(False))
        .unionByName(pending.select(*fields).withColumn("_pend", F.lit(True)))
    )

    wm = None
    frontier = None
    if shard_watermark:
        # batch-only pre-job (see apply.py: pending scns are already folded
        # into the persisted frontier)
        old_front = {
            int(k): int(v)
            for k, v in catalog.manifest.get("shard_frontier", {}).items()
        }
        for s_ in expected_shards or []:
            old_front.setdefault(int(s_), 0)
        for r in batch_df.groupBy("shard").agg(F.max("scn").alias("m")).collect():
            old_front[int(r["shard"])] = max(old_front.get(int(r["shard"]), 0), int(r["m"]))
        frontier = old_front
        wm = min(frontier.values()) if frontier else None

    parts = assemble_transactions(events, commit_watermark=wm)
    committed_all = parts["committed"].select(
        "lsn", "shard", "xid", "seq_in_txn", "op", "table_name",
        "conv_id", "turn_idx", "before", "after", "changed_cols",
        "chunk_no", "chunk_text", "ddl_stmt", "txn_commit_scn", "ts", "attrs",
    )

    # ---- ONE fused stats job (stats.py): DDLs, frontier, skip counters,
    # probe counts, per-table DML counts, the open set — PLUS, optimistic
    # fusion (apply.py): the whole-epoch all-tables collapse rides along as
    # a counter branch when no txn cap is configured, so a no-DDL epoch
    # costs 1 stats job + T writes ----
    optimistic = max_txn_ops is None
    changes0 = None
    extra_branches = None
    cur_names = sorted(start_registry)
    pre_objs = {n: _resolve_table(catalog, n, start_registry) for n in cur_names}
    fused_ok0 = bool(cur_names) and all(
        t is not None and t.key_names == ["conv_id", "turn_idx"]
        for t in pre_objs.values()
    )
    if optimistic and fused_ok0:
        surv0 = match_partial_rollbacks(committed_all, n_hint=0)
        pay0 = surv0.filter(
            F.col("op").isin("ins", "upd", "del", "chunk")
            & F.col("table_name").isin(cur_names)
        )
        tdml0 = reassemble_chunks(pay0, n_hint=0).filter(F.col("op") != "chunk")
        ucols0 = [
            c
            for c in tdml0.schema["after"].dataType.names
            if any(c in pre_objs[n].value_names for n in cur_names)
        ]
        nbp0 = []
        for n in cur_names:
            nbp0 += [F.lit(n), F.lit(pre_objs[n].n_buckets)]
        bucket0 = F.pmod(
            F.xxhash64(F.col("conv_id")),
            F.element_at(F.create_map(*nbp0), F.col("table_name")),
        ).cast("int")
        changes0 = _persist_changes(
            collapse_net_changes(tdml0, ucols0, extra_group=["table_name"])
            .withColumn("_bucket", bucket0)
        )
        from .stats import collapse_counts_branch

        extra_branches = [collapse_counts_branch(changes0, per_table=True)]

    from .prometheus import get_registry

    registry = get_registry()
    # NOTE: the multi path deliberately keeps the LEGACY branch-union
    # stats (no ``events=`` fast path).  The narrow single-pass's level-1
    # aggregation keys on (xid, shard, table_name); with T tracked tables
    # a transaction's ops spread across tables, so the group count grows
    # ~T× (measured: T=8 epoch cost 1.5-1.8× the T=2 epoch, minutes of
    # hash-agg CPU at ~8M groups).  The legacy branches each aggregate
    # straight to O(shards·tables) rows with map-side combine over the
    # ReuseExchange'd status join — T-independent (r5-measured T8/T2 ≈
    # 1.04).  The single-table path keeps the narrow pass, where the
    # (xid, shard) grouping is bounded by the txn count.
    stats = epoch_stats(
        batch_df, parts, pending_flag="_pend", per_table_dml=True,
        extra_branches=extra_branches,
        pending_events=events.filter(F.col("_pend")),
        dml_type_counts=registry is not None,
    )
    # adaptive-schema mode (reference: REDO_FLAGS::SCHEMALESS +
    # Metadata::loadAdaptiveSchema, Metadata.cpp:676-706 — here the
    # stronger half: unregistered tables sighted in committed DML REGISTER
    # themselves with the default columns and their DML applies, instead of
    # being skip-counted).  Registration is ledger-marked per (epoch, name)
    # and carries the epoch-start snapshot, so crash replay registers and
    # routes identically; autos are live in EVERY segment (they exist from
    # the epoch's first sighting, not from a DDL fence position).
    autos: set[str] = set()
    if auto_register:
        autos = {
            t
            for (t, _s) in stats["dml_by_table_shard"]
            if t is not None and t not in start_registry
        }
        for name in sorted(autos):
            mark = f"{epoch_id}:auto:{name}"
            if mark not in catalog.manifest["ledger"].get(job_id, {}):
                catalog.create_table(
                    name,
                    ledger_mark=(job_id, mark),
                    registry_snapshot=(job_id, str(epoch_id), start_registry),
                )
    use_fused0 = (
        changes0 is not None
        and stats["n_prollback"] == 0
        and stats["n_chunks"] == 0
        and not stats["ddls"]
        and not autos  # the pre-built collapse excluded unseen tables
    )
    if changes0 is not None and not use_fused0:
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
                if info["max_scn"] < hz - max_open_scn_lag and not info["has_commit"]
            )
            n_stale = len(stale)
            if stale:
                expired_dml = open_events.filter(
                    F.col("xid").isin(stale) & F.col("op").isin("ins", "upd", "del")
                )
                open_events = open_events.filter(~F.col("xid").isin(stale))
                cur_open -= set(stale)
        else:
            # large open set: anti-join expiry, no per-xid driver traffic
            # (one config-gated scalar count job) — see apply.py
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
                expired_dml = open_events.join(stale_xids, "xid", "left_semi").filter(
                    F.col("op").isin("ins", "upd", "del")
                )
                open_events = open_events.join(stale_xids, "xid", "left_anti")
        n_open_xids -= n_stale

    committed = committed_all
    # Caching policy mirrors apply.py: recomputing the pushed-down codegen'd
    # scans beats paying the columnar-cache build on fast storage (measured
    # there); on slow/remote input flip the env to "1".
    _do_persist = os.environ.get("OLR_PERSIST_COMMITTED", "0") == "1"
    if _do_persist:
        committed = committed.persist()

    oversize_dml = None
    if max_txn_ops is not None:
        dml_ops = F.col("op").isin("ins", "upd", "del")
        oversize = (
            committed.filter(dml_ops)
            .groupBy("xid")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_txn_ops)
            .select("xid")
        )
        oversize_dml = committed.join(oversize, "xid", "left_semi").filter(dml_ops)
        committed = committed.join(oversize, "xid", "left_anti")

    survivors = match_partial_rollbacks(committed, n_hint=stats["n_prollback"])

    # ---- DDL fence + the registry's evolution across it ----
    ddls = stats["ddls"]  # [(commit_scn, seq_in_txn, stmt)] sorted
    parsed = [parse_ddl(stmt, default_table) for _, _, stmt in ddls]
    boundaries = [scn for scn, _, _ in ddls] + [None]
    names_now = set(start_registry) | autos
    names_at: list[set[str]] = []  # registry state during segment i
    for verb, name, _arg in [(None, None, None)] + parsed:
        if verb == "create" and name:
            names_now = names_now | {name}
        elif verb == "drop" and name:
            names_now = names_now - {name}
        names_at.append(set(names_now))
    names_any = set().union(*names_at) if names_at else set()

    # tracked = tables registered at ANY point this epoch (the exact
    # per-segment membership applies below); chunk patches only make sense
    # for tracked rows (untracked payloads mirror raw, like the reference's
    # schemaless OBJ_xxx output)
    payload = survivors.filter(F.col("op").isin("ins", "upd", "del", "chunk"))
    if names_any:
        tracked = payload.filter(F.col("table_name").isin(sorted(names_any)))
        untracked = payload.filter(
            ~F.coalesce(F.col("table_name").isin(sorted(names_any)), F.lit(False))
        )
    else:
        tracked = payload.filter(F.lit(False))
        untracked = payload
    tracked = reassemble_chunks(tracked, n_hint=stats["n_chunks"])
    tracked_dml = tracked.filter(F.col("op") != "chunk")
    untracked_dml = untracked.filter(F.col("op").isin("ins", "upd", "del"))

    if json_mirror_dir is not None or protobuf_spool_dir is not None:
        mirror_src = tracked_dml
        if schemaless:
            mirror_src = mirror_src.unionByName(untracked_dml)
    if json_mirror_dir is not None:
        from ..functions.json_output import write_json_mirror

        write_json_mirror(mirror_src, json_mirror_dir, epoch_id,
                          ddls=stats["ddls"], fmt=json_format)
    if protobuf_spool_dir is not None:
        from ..sources.network import write_protobuf_mirror

        write_protobuf_mirror(mirror_src, protobuf_spool_dir, epoch_id,
                              ddls=stats["ddls"])

    # ---- per-shard skip counts, driver-side from the stats job ----
    skip_by: dict = dict(stats["dropped_by_shard"])
    fused_unt_valid = stats["n_prollback"] == 0 and max_txn_ops is None
    if fused_unt_valid and not schemaless:
        for (tname, s), n in stats["dml_by_table_shard"].items():
            if tname not in names_any:
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

    # ---- pending carry (apply.py protocol) ----
    if detail is not None:
        n_new = sum(detail[x]["n_new"] for x in cur_open)
        pending_update, needs_df = plan_pending_update(
            catalog.manifest, cur_open, n_new
        )
    else:
        pending_update, needs_df = plan_pending_update_large(
            catalog.manifest,
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
        pending_update["closed_df"] = pending.select("xid").distinct().join(
            open_events.select("xid").distinct(), "xid", "left_anti"
        )

    # per-table sinks for every name live at some point this epoch (a table
    # CREATEd later this epoch resolves to None until its DDL applies)
    table_objs = {n: _resolve_table(catalog, n, start_registry) for n in names_any}
    fused_ok = all(
        t.key_names == ["conv_id", "turn_idx"]
        for t in table_objs.values()
        if t is not None
    )

    lo = None
    n_merged = 0
    seg_counts: dict[tuple, list[int]] = {}  # (table, shard) -> [ins, upd, del]
    for i, hi in enumerate(boundaries):
        seg = tracked_dml
        if lo is not None:
            seg = seg.filter(F.col("txn_commit_scn") > lo)
        if hi is not None:
            seg = seg.filter(F.col("txn_commit_scn") <= hi)
        final = hi is None
        live = sorted(n for n in names_at[i] if table_objs.get(n) is not None)
        if live and fused_ok:
            affected: dict[str, set] = {n: set() for n in live}
            n_changes_t: dict[str, int] = {n: 0 for n in live}
            if use_fused0:
                # stats job already materialized the all-tables collapse
                # cache AND collected its counters — zero extra jobs
                changes_all = changes0
                for (t_, s_, b_), (ni, nu, nd) in stats["counts"].items():
                    affected.setdefault(t_, set()).add(b_)
                    n_changes_t[t_] = n_changes_t.get(t_, 0) + ni + nu + nd
                    acc = seg_counts.setdefault((t_, s_), [0, 0, 0])
                    acc[0] += ni
                    acc[1] += nu
                    acc[2] += nd
            else:
                # ---- ONE collapse job for ALL live tables ----
                # union of live value columns: a per-table merge only
                # projects its own columns out of set_cols/vals, so the
                # union is safe (collapse_net_changes docstring); the bucket
                # id routes through a table→n_buckets literal map so
                # per-table bucket counts hold
                union_cols = [
                    c
                    for c in seg.schema["after"].dataType.names
                    if any(c in table_objs[n].value_names for n in live)
                ]
                nb_pairs = []
                for n in live:
                    nb_pairs += [F.lit(n), F.lit(table_objs[n].n_buckets)]
                bucket = F.pmod(
                    F.xxhash64(F.col("conv_id")),
                    F.element_at(F.create_map(*nb_pairs), F.col("table_name")),
                ).cast("int")
                changes_all = _persist_changes(
                    collapse_net_changes(
                        seg.filter(F.col("table_name").isin(live)),
                        union_cols,
                        extra_group=["table_name"],
                    )
                    .withColumn("_bucket", bucket)
                )
                for r in changes_all.groupBy("table_name", "_bucket", "last_shard").agg(
                    F.sum(F.when(~F.col("is_delete") & F.col("reset"), 1).otherwise(0)).alias("n_ins"),
                    F.sum(F.when(~F.col("is_delete") & ~F.col("reset"), 1).otherwise(0)).alias("n_upd"),
                    F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("n_del"),
                ).collect():
                    affected[r["table_name"]].add(r["_bucket"])
                    n_changes_t[r["table_name"]] = (
                        n_changes_t.get(r["table_name"], 0)
                        + r["n_ins"] + r["n_upd"] + r["n_del"]
                    )
                    acc = seg_counts.setdefault((r["table_name"], r["last_shard"]), [0, 0, 0])
                    acc[0] += r["n_ins"]
                    acc[1] += r["n_upd"]
                    acc[2] += r["n_del"]
            # per-table writes fan out CONCURRENTLY: each table's merge is
            # an independent Spark job over the shared persisted collapse
            # result plus its own manifest commit (disjoint directories, no
            # shared driver state) — Spark's scheduler overlaps the jobs,
            # so breadth no longer serializes through the driver.
            # Exactly-once is unaffected: commit ORDER across tables never
            # mattered (each table's ledger mark is independent; the
            # catalog :done fence still commits last, after every write).
            from concurrent.futures import ThreadPoolExecutor

            def _merge_one(name):
                ch_t = changes_all.filter(F.col("table_name") == name).drop("table_name")
                return table_objs[name].merge(
                    ch_t,
                    epoch_id=f"{epoch_id}:{i}",
                    job_id=job_id,
                    affected=sorted(affected[name]),
                    n_changes=n_changes_t.get(name, 0),
                )

            # pool width (OLR_MULTI_WRITE_POOL dials it): measured on the
            # 10M-event T=8 bench, local[32] — T8/T2 = 0.83 at pool 8,
            # 1.15 at 4, 1.35 at 2, 1.48 serial: concurrent merges overlap
            # each job's fixed cost and the shared-cache scans do NOT
            # contend, so the widest pool wins (round-4's 1.36 driver draw
            # was box variance, now damped by bench.py's median-of-3)
            pool = int(os.environ.get("OLR_MULTI_WRITE_POOL", "8"))
            if len(live) > 1 and pool > 1:
                with ThreadPoolExecutor(max_workers=min(pool, len(live))) as ex:
                    n_merged += sum(bool(a) for a in ex.map(_merge_one, live))
            else:
                n_merged += sum(bool(_merge_one(n)) for n in live)
            changes_all.unpersist()
        else:
            # heterogeneous key columns: per-table fallback (correct, O(T)
            # jobs — the fused path covers every DDL-created table, which
            # always uses the default keys)
            for name in live:
                table = table_objs[name]
                changes = _persist_changes(
                    collapse_net_changes(
                        seg.filter(F.col("table_name") == name), table.value_names
                    )
                    .withColumn("_bucket", table._bucket_expr())
                )
                affected_t: set = set()
                n_ch = 0
                for r in changes.groupBy("_bucket", "last_shard").agg(
                    F.sum(F.when(~F.col("is_delete") & F.col("reset"), 1).otherwise(0)).alias("n_ins"),
                    F.sum(F.when(~F.col("is_delete") & ~F.col("reset"), 1).otherwise(0)).alias("n_upd"),
                    F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("n_del"),
                ).collect():
                    affected_t.add(r["_bucket"])
                    n_ch += r["n_ins"] + r["n_upd"] + r["n_del"]
                    acc = seg_counts.setdefault((name, r["last_shard"]), [0, 0, 0])
                    acc[0] += r["n_ins"]
                    acc[1] += r["n_upd"]
                    acc[2] += r["n_del"]
                applied = table.merge(
                    changes,
                    epoch_id=f"{epoch_id}:{i}",
                    job_id=job_id,
                    affected=sorted(affected_t),
                    n_changes=n_ch,
                )
                changes.unpersist()
                if applied:
                    n_merged += 1
        # rows whose table has no registry entry DURING this segment are
        # skipped (reference: no dictionary entry → not applied); only
        # possible when a CREATE/DROP fenced this epoch
        if set(live) != names_any:
            seg_untracked = seg
            if live:
                seg_untracked = seg.filter(~F.col("table_name").isin(live))
            for r in seg_untracked.groupBy("shard").agg(
                F.count(F.lit(1)).alias("n")
            ).collect():
                skip_by[r["shard"]] = skip_by.get(r["shard"], 0) + r["n"]

        if not final:
            verb, name, arg = parsed[i]
            if verb != "noop":
                _apply_ddl(
                    catalog, verb, name, arg, (job_id, f"{epoch_id}:ddl{i}"),
                    registry_snapshot=(job_id, str(epoch_id), start_registry),
                )
                if verb == "create" and name and table_objs.get(name) is None:
                    table_objs[name] = _resolve_table(catalog, name, start_registry)
                elif (
                    verb in ("add_col", "drop_col", "truncate")
                    and table_objs.get(name) is not None
                ):
                    # _apply_ddl mutated the table through its own instance;
                    # refresh ours so later segments see the new schema and
                    # the manifest version chain stays linear
                    table_objs[name].refresh()
        lo = hi

    # lineage: per-shard feed rows (position + skips, table NULL) plus
    # per-(shard, table) DML counter rows — driver-side tuples, zero jobs
    last_by = stats["last_lsn_by_shard"]
    shards = set(last_by) | set(skip_by)
    lineage_rows = [
        (int(epoch_id), s, None, last_by.get(s), 0, 0, 0, skip_by.get(s, 0))
        for s in sorted(shards, key=lambda x: (x is None, x))
    ] + [
        (int(epoch_id), s, t, None, *cnt, 0)
        for (t, s), cnt in sorted(
            seg_counts.items(), key=lambda kv: (kv[0][0], (kv[0][1] is None, kv[0][1]))
        )
    ]

    # shared epoch state + the :done fence, ONE atomic catalog commit
    catalog.commit_epoch(
        job_id,
        marks=[f"{epoch_id}:done"],
        pending_update=pending_update,
        lineage_rows=lineage_rows,
        shard_frontier=frontier,
    )
    if _do_persist:
        committed.unpersist()
    if registry is not None:
        typed = {
            t: tuple(
                sum(v[i] for (t_, _s), v in
                    stats["dml_by_table_shard_typed"].items() if t_ == t)
                for i in range(3)
            )
            for t in {t_ for (t_, _s) in stats["dml_by_table_shard_typed"]}
            if t is not None
        }
        registry.observe_epoch(
            dml_by_type=stats["dml_ops_by_type"],
            dml_by_table_typed=typed,
            n_skipped=sum(skip_by.values()),
            n_commits=stats["n_commits"] or 0,
            n_rollbacks=stats["n_rollbacks"] or 0,
            ddls=stats["ddls"],
            had_changes=n_merged > 0,
        )
    return {"applied": True, "segments": len(boundaries), "merged": n_merged}
