"""Fused per-epoch statistics — ONE Spark job for every driver-side scalar.

Round-3 measurement (BASELINE.md t(c)=f+w/c fit) put the fixed per-epoch
cost at ~49 s, dominated by per-epoch JOB COUNT: the DDL list, per-shard
skip counts, consumed-LSN frontier, savepoint/chunk probes and the
open-set probe each ran as a SEPARATE action, and every one re-executed
the assemble plan (scan + the status-join shuffle) with ~4 s of fixed
scheduling overhead on this box.  Fusing them into one tagged-union
aggregation executes the status shuffle ONCE (Spark's ReuseExchange
dedups the identical exchange across the union's branches inside a single
job) and pays one job's overhead instead of six.

The reference pays none of this because it streams records once through a
single thread (Parser.cpp main loop) and counts as it goes — this module
is the batch-engine equivalent: count everything in one pass.

Rows of the union frame are tagged mini-streams; the group keys carry
identity for 'ddl'/'open'/'tnm' rows and are NULL elsewhere:

    tag   group keys         aggregates
    ddl   k_scn,k_seq,stmt   (one row per committed DDL)
    pos   shard              max(lsn), max(scn)   — frontier + lag horizon
    drop  shard              sum(n)               — rolled-back/no-begin DML
    unt   shard              sum(n)               — untracked DML (see caveat)
    tnm   stmt(=table),shard sum(n)               — committed DML per table
    npr   —                  sum(n)               — savepoint markers
    nch   —                  sum(n)               — chunk events
    open  xid                sum(n), sum(m=new)   — open set (m: this batch)

Caveat: 'unt'/'tnm' count committed DML BEFORE savepoint matching and
before the txn-size cap, so callers use them only when n_prollback == 0
and no cap is configured (the common case; the skip-count semantics are
defined post-matching) and fall back to a dedicated job otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DML = ("ins", "upd", "del")

# Driver-side open-set detail cap: per-xid open rows collect ONLY up to
# this many; past it the driver gets the aggregate summary row alone and
# callers switch to the distributed pending path (parquet tombstones,
# anti-join expiry — apply.py).  Bounds driver memory at O(cap) no matter
# how many transactions a pathological feed holds open (reference analog:
# the txn map lives off the hot path via MemoryManager swap,
# src/common/MemoryManager.cpp:1-410).
OPEN_DETAIL_CAP = 10_000


def _branch(df: DataFrame, tag: str, **cols) -> DataFrame:
    """Project a mini-stream onto the shared tagged-union schema."""
    defaults = {
        "shard": F.lit(None).cast("int"),
        "xid": F.lit(None).cast("string"),
        "k_scn": F.lit(None).cast("long"),
        "k_seq": F.lit(None).cast("long"),
        "stmt": F.lit(None).cast("string"),
        "n": F.lit(1).cast("long"),
        "m": F.lit(0).cast("long"),
        "o": F.lit(0).cast("long"),
        "lsn": F.lit(None).cast("long"),
        "scn": F.lit(None).cast("long"),
    }
    defaults.update(cols)
    return df.select(
        F.lit(tag).alias("tag"), *[v.alias(k) for k, v in defaults.items()]
    )


def collapse_counts_branch(changes: DataFrame, per_table: bool = False) -> DataFrame:
    """Net-change counter rows for the fused stats job: one input row per
    collapsed key, aggregating to per-(table?, shard, bucket) ins/upd/del
    sums (n/m/o slots; k_scn carries the bucket id).  Unioning this branch
    into epoch_stats makes the stats action ALSO materialize the persisted
    ``changes`` frame — the epoch's collapse output — so the driver gets
    stats + lineage counters + affected buckets in ONE job and the merge
    write reuses the now-warm cache: a no-DDL epoch costs 2 actions."""
    return _branch(
        changes,
        "cnt",
        shard=F.col("last_shard"),
        k_scn=F.col("_bucket").cast("long"),
        stmt=F.col("table_name") if per_table else F.lit(None).cast("string"),
        n=(~F.col("is_delete") & F.col("reset")).cast("long"),
        m=(~F.col("is_delete") & ~F.col("reset")).cast("long"),
        o=F.col("is_delete").cast("long"),
    )


def _single_pass_rows(
    events: DataFrame,
    status: DataFrame,
    untracked_cond: Column | None,
    pending_flag: str | None,
    per_table_dml: bool,
    pending_events: DataFrame | None,
    dml_type_counts: bool,
) -> DataFrame:
    """All counter streams EXCEPT 'ddl'/'cnt' from ONE narrow pass.

    The legacy branch union re-derived the payload⋈status join per counter
    stream — measured on the 10M-event bench, that was ~8 subplans re-
    scanning the feed and re-sorting the wide xid exchange (~60% of the
    fused job's core-seconds).  Here the engine makes ONE narrow
    projection (no text/image columns — guide §2.3), joins txn status
    once, aggregates per (xid, shard[, table]) once, and EXPLODES each
    group row into its tagged counter rows, which flow into the same
    final (tag, keys) aggregation as before.  Byte-identical outputs,
    one join and one narrow exchange instead of eight subplans."""
    pend = F.col(pending_flag) if pending_flag is not None else F.lit(False)
    ev = events.select(
        "xid", "shard", "table_name", "op", "lsn", "scn",
        pend.alias("_pf"),
    )
    j = ev.join(
        status.select("xid", "has_begin", "txn_commit_scn", "rolled_back"),
        "xid", "left",
    )
    closed = F.col("txn_commit_scn").isNotNull() | F.col("rolled_back").isNotNull()
    committed = (
        F.col("txn_commit_scn").isNotNull()
        & F.col("rolled_back").isNull()
        & (F.col("has_begin") == F.lit(True))
    )
    dml = F.col("op").isin(*_DML)
    dropped = (
        closed
        & (F.col("rolled_back").isNotNull() | F.col("has_begin").isNull())
        & dml
    )
    is_open = ~closed
    batch = ~F.col("_pf")

    def cnt(cond):
        return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("long")

    gkey = ["xid", "shard"] + (["table_name"] if per_table_dml else [])
    aggs = [
        cnt(batch).alias("_n_batch"),
        F.max(F.when(batch, F.col("lsn"))).alias("_b_lsn"),
        F.max(F.when(batch, F.col("scn"))).alias("_b_scn"),
        cnt(dropped).alias("_n_drop"),
        cnt(committed & (F.col("op") == "prollback")).alias("_n_npr"),
        cnt(committed & (F.col("op") == "chunk")).alias("_n_nch"),
        cnt(is_open).alias("_o_n"),
        (cnt(is_open & batch) if pending_flag is not None else F.lit(0).cast("long")).alias("_o_m"),
        (cnt(is_open & ~batch) if pending_flag is not None else F.lit(0).cast("long")).alias("_o_o"),
        F.max(F.when(is_open, F.col("scn"))).alias("_o_scn"),
        F.max(F.when(is_open & (F.col("op") == "commit"), F.lit(1)).cast("long")).alias("_o_hc"),
    ]
    if untracked_cond is not None:
        aggs.append(cnt(committed & dml & untracked_cond).alias("_n_unt"))
    if per_table_dml:
        aggs += [
            cnt(committed & dml).alias("_n_tnm"),
            cnt(committed & (F.col("op") == "ins")).alias("_m_tnm"),
            cnt(committed & (F.col("op") == "upd")).alias("_o_tnm"),
        ]
    if pending_events is not None:
        aggs.append(cnt(~batch).alias("_n_pnd"))
    if dml_type_counts:
        aggs += [
            cnt(committed & (F.col("op") == "ins")).alias("_d_ins"),
            cnt(committed & (F.col("op") == "upd")).alias("_d_upd"),
            cnt(committed & (F.col("op") == "del")).alias("_d_del"),
            cnt(batch & (F.col("op") == "commit")).alias("_t_cm"),
            cnt(batch & (F.col("op") == "rollback")).alias("_t_rb"),
        ]
    lvl1 = j.groupBy(*gkey).agg(*aggs)

    def tag_struct(tag, shard=None, xid=None, k_scn=None, k_seq=None,
                   stmt=None, n=None, m=None, o=None, lsn=None, scn=None):
        return F.struct(
            F.lit(tag).alias("tag"),
            (shard if shard is not None else F.lit(None)).cast("int").alias("shard"),
            (xid if xid is not None else F.lit(None)).cast("string").alias("xid"),
            (k_scn if k_scn is not None else F.lit(None)).cast("long").alias("k_scn"),
            (k_seq if k_seq is not None else F.lit(None)).cast("long").alias("k_seq"),
            (stmt if stmt is not None else F.lit(None)).cast("string").alias("stmt"),
            (n if n is not None else F.lit(1)).cast("long").alias("n"),
            (m if m is not None else F.lit(0)).cast("long").alias("m"),
            (o if o is not None else F.lit(0)).cast("long").alias("o"),
            (lsn if lsn is not None else F.lit(None)).cast("long").alias("lsn"),
            (scn if scn is not None else F.lit(None)).cast("long").alias("scn"),
        )

    c = F.col
    arms = [
        F.when(c("_n_batch") > 0, tag_struct(
            "pos", shard=c("shard"), n=c("_n_batch"), lsn=c("_b_lsn"), scn=c("_b_scn"))),
        F.when(c("_n_drop") > 0, tag_struct("drop", shard=c("shard"), n=c("_n_drop"))),
        F.when(c("_n_npr") > 0, tag_struct("npr", n=c("_n_npr"))),
        F.when(c("_n_nch") > 0, tag_struct("nch", n=c("_n_nch"))),
        F.when(c("_o_n") > 0, tag_struct(
            "open", xid=c("xid"), n=c("_o_n"), m=c("_o_m"), o=c("_o_o"),
            lsn=c("_o_hc"), scn=c("_o_scn"))),
    ]
    if untracked_cond is not None:
        arms.append(F.when(c("_n_unt") > 0, tag_struct(
            "unt", shard=c("shard"), n=c("_n_unt"))))
    if per_table_dml:
        arms.append(F.when(c("_n_tnm") > 0, tag_struct(
            "tnm", shard=c("shard"), stmt=c("table_name"),
            n=c("_n_tnm"), m=c("_m_tnm"), o=c("_o_tnm"))))
    if pending_events is not None:
        arms.append(F.when(c("_n_pnd") > 0, tag_struct("pnd", n=c("_n_pnd"))))
    if dml_type_counts:
        arms.append(F.when((c("_d_ins") + c("_d_upd") + c("_d_del")) > 0, tag_struct(
            "dmt", n=c("_d_ins"), m=c("_d_upd"), o=c("_d_del"))))
        arms.append(F.when((c("_t_cm") + c("_t_rb")) > 0, tag_struct(
            "txn", n=c("_t_cm"), m=c("_t_rb"))))
    return lvl1.select(
        F.explode(F.array_compact(F.array(*arms))).alias("_r")
    ).select("_r.*")


def epoch_stats(
    batch_df: DataFrame,
    parts: dict[str, DataFrame],
    untracked_cond: Column | None = None,
    pending_flag: str | None = None,
    per_table_dml: bool = False,
    extra_branches: list[DataFrame] | None = None,
    pending_events: DataFrame | None = None,
    open_detail_cap: int | None = None,
    dml_type_counts: bool = False,
    events: DataFrame | None = None,
) -> dict:
    """Collect every driver-side epoch scalar in one aggregation job.

    ``untracked_cond``: boolean column over committed rows marking DML of
    untracked tables (enables the 'unt' stream).  ``pending_flag``: name of
    a boolean column on the open stream that is True for rows carried from
    the previous epoch's pending snapshot — its complement counts the
    epoch's NEW open events (the incremental pending-carry delta size).
    ``per_table_dml``: emit per-(table, shard) committed-DML counts ('tnm').

    ``dml_type_counts``: add two metric arms to the SAME job (job count
    unchanged — more union branches, not more actions): 'dmt' = committed
    DML split by op type, 'txn' = commit/rollback marker counts from the
    raw batch.  Off by default so the job's row traffic is byte-identical
    when the Prometheus registry is disabled.

    ``pending_events``: the carried-pending subset of the event union (rows
    with the pending flag) — enables the 'pnd' total-pending-rows counter,
    which with the open summary's still-open-pending-rows count tells the
    caller whether any previously-pending transaction CLOSED this epoch
    (→ a tombstone is due) without any per-xid driver traffic.

    Driver-memory contract: the per-xid open detail (``open_xids``) is
    collected only while the open set fits ``open_detail_cap``; past the
    cap ``open_xids`` is None and only ``open_summary`` (aggregate counts,
    O(1) rows) comes back — the collect is O(cap) in the worst case, never
    O(open transactions).
    """
    if open_detail_cap is None:
        open_detail_cap = OPEN_DETAIL_CAP
    committed, dropped, open_ev = parts["committed"], parts["dropped"], parts["open"]
    if events is not None and parts.get("status") is not None:
        # fast path: every stream except ddl comes from ONE narrow pass
        # (see _single_pass_rows); ddl keeps its own arm — the op='ddl'
        # filter pushes to the scan, so it is near-free, and it must carry
        # the per-event (commit_scn, seq, stmt) identity the grouped pass
        # cannot.
        branches = [
            _single_pass_rows(
                events, parts["status"], untracked_cond, pending_flag,
                per_table_dml, pending_events, dml_type_counts,
            ),
            _branch(
                committed.filter(F.col("op") == "ddl"),
                "ddl",
                k_scn=F.col("txn_commit_scn"),
                k_seq=F.col("seq_in_txn").cast("long"),
                stmt=F.col("ddl_stmt"),
            ),
        ]
        branches.extend(extra_branches or [])
        return _finish_stats(
            branches, untracked_cond, per_table_dml, pending_events,
            dml_type_counts, open_detail_cap,
        )
    branches = [
        _branch(
            committed.filter(F.col("op") == "ddl"),
            "ddl",
            k_scn=F.col("txn_commit_scn"),
            k_seq=F.col("seq_in_txn").cast("long"),
            stmt=F.col("ddl_stmt"),
        ),
        _branch(batch_df, "pos", shard=F.col("shard"), lsn=F.col("lsn"), scn=F.col("scn")),
        _branch(dropped, "drop", shard=F.col("shard")),
        _branch(committed.filter(F.col("op") == "prollback"), "npr"),
        _branch(committed.filter(F.col("op") == "chunk"), "nch"),
        _branch(
            open_ev,
            "open",
            xid=F.col("xid"),
            m=(
                (~F.col(pending_flag)).cast("long")
                if pending_flag is not None
                else F.lit(0).cast("long")
            ),
            # carried-pending rows still open (o slot): total pending minus
            # this tells the caller how many pending rows CLOSED this epoch
            o=(
                F.col(pending_flag).cast("long")
                if pending_flag is not None
                else F.lit(0).cast("long")
            ),
            # staleness inputs for the open-txn expiry horizon: newest scn
            # per xid (scn slot) and has-a-commit-event (lsn slot, 0/1) —
            # watermark-GATED committed txns ride open with a commit event
            # and must never be expired
            scn=F.col("scn"),
            lsn=F.when(F.col("op") == "commit", F.lit(1)).cast("long"),
        ),
    ]
    if pending_events is not None:
        branches.append(_branch(pending_events, "pnd"))
    if untracked_cond is not None:
        branches.append(
            _branch(
                committed.filter(untracked_cond & F.col("op").isin(*_DML)),
                "unt",
                shard=F.col("shard"),
            )
        )
    if per_table_dml:
        # n stays the total (existing consumers); m/o carry the by-type
        # split (m=insert, o=update, delete = n-m-o) for per-table metrics
        branches.append(
            _branch(
                committed.filter(F.col("op").isin(*_DML)),
                "tnm",
                shard=F.col("shard"),
                stmt=F.col("table_name"),
                m=(F.col("op") == "ins").cast("long"),
                o=(F.col("op") == "upd").cast("long"),
            )
        )
    if dml_type_counts:
        branches.append(
            _branch(
                committed.filter(F.col("op").isin(*_DML)),
                "dmt",
                n=(F.col("op") == "ins").cast("long"),
                m=(F.col("op") == "upd").cast("long"),
                o=(F.col("op") == "del").cast("long"),
            )
        )
        branches.append(
            _branch(
                batch_df.filter(F.col("op").isin("commit", "rollback")),
                "txn",
                n=(F.col("op") == "commit").cast("long"),
                m=(F.col("op") == "rollback").cast("long"),
            )
        )

    branches.extend(extra_branches or [])
    return _finish_stats(
        branches, untracked_cond, per_table_dml, pending_events,
        dml_type_counts, open_detail_cap,
    )


def _finish_stats(
    branches: list[DataFrame],
    untracked_cond,
    per_table_dml: bool,
    pending_events,
    dml_type_counts: bool,
    open_detail_cap: int,
) -> dict:
    """Shared tail: union the tagged streams, aggregate once, cap the open
    detail, collect, and fold into the stats dict."""
    u = branches[0]
    for b in branches[1:]:
        u = u.unionByName(b)
    agg = u.groupBy("tag", "shard", "xid", "k_scn", "k_seq", "stmt").agg(
        F.sum("n").alias("n"),
        F.sum("m").alias("m"),
        F.sum("o").alias("o"),
        F.max("lsn").alias("lsn"),
        F.max("scn").alias("scn"),
    )
    # Same single action: the non-open groups (all config-bounded counts)
    # union the open detail CAPPED at open_detail_cap+1 rows and one
    # 'osum' aggregate row (n=open events, m=new events, o=still-open
    # pending rows, k_scn=distinct open xids).  The grouped exchange is
    # computed once and reused across the three branches; the driver never
    # receives more than O(cap) open rows.
    open_rows = agg.filter(F.col("tag") == "open")
    osum = open_rows.agg(
        F.lit("osum").alias("tag"),
        F.lit(None).cast("int").alias("shard"),
        F.lit(None).cast("string").alias("xid"),
        F.count(F.lit(1)).alias("k_scn"),
        F.lit(None).cast("long").alias("k_seq"),
        F.lit(None).cast("string").alias("stmt"),
        F.sum("n").alias("n"),
        F.sum("m").alias("m"),
        F.sum("o").alias("o"),
        F.lit(None).cast("long").alias("lsn"),
        F.lit(None).cast("long").alias("scn"),
    )
    rows = (
        agg.filter(F.col("tag") != "open")
        .unionByName(open_rows.limit(open_detail_cap + 1))
        .unionByName(osum)
        .collect()
    )

    out = {
        "counts": {},  # (table|None, shard, bucket) -> [n_ins, n_upd, n_del]
        "ddls": [],
        "last_lsn_by_shard": {},
        "max_scn_by_shard": {},
        "dropped_by_shard": {},
        "untracked_by_shard": {} if untracked_cond is not None else None,
        "dml_by_table_shard": {} if per_table_dml else None,
        "dml_by_table_shard_typed": {} if per_table_dml else None,
        "dml_ops_by_type": (0, 0, 0) if dml_type_counts else None,
        "n_commits": 0 if dml_type_counts else None,
        "n_rollbacks": 0 if dml_type_counts else None,
        "n_prollback": 0,
        "n_chunks": 0,
        "open_xids": {},
        "open_summary": {"n_xids": 0, "n_events": 0, "n_new": 0,
                         "n_pend_open_rows": 0},
        "n_pending_rows": 0 if pending_events is not None else None,
    }
    for r in rows:
        t = r["tag"]
        if t == "ddl":
            out["ddls"].append((r["k_scn"], r["k_seq"], r["stmt"]))
        elif t == "pos":
            out["last_lsn_by_shard"][r["shard"]] = r["lsn"]
            out["max_scn_by_shard"][r["shard"]] = r["scn"]
        elif t == "drop":
            out["dropped_by_shard"][r["shard"]] = r["n"]
        elif t == "unt":
            out["untracked_by_shard"][r["shard"]] = r["n"]
        elif t == "tnm":
            out["dml_by_table_shard"][(r["stmt"], r["shard"])] = r["n"]
            out["dml_by_table_shard_typed"][(r["stmt"], r["shard"])] = (
                int(r["m"]), int(r["o"]), int(r["n"] - r["m"] - r["o"]))
        elif t == "dmt":
            out["dml_ops_by_type"] = (int(r["n"]), int(r["m"]), int(r["o"]))
        elif t == "txn":
            out["n_commits"] = int(r["n"])
            out["n_rollbacks"] = int(r["m"])
        elif t == "npr":
            out["n_prollback"] += r["n"]
        elif t == "nch":
            out["n_chunks"] += r["n"]
        elif t == "pnd":
            out["n_pending_rows"] = r["n"]
        elif t == "osum":
            out["open_summary"] = {
                "n_xids": int(r["k_scn"] or 0),
                "n_events": int(r["n"] or 0),
                "n_new": int(r["m"] or 0),
                "n_pend_open_rows": int(r["o"] or 0),
            }
        elif t == "open":
            out["open_xids"][r["xid"]] = {
                "n": r["n"],
                "n_new": r["m"],
                "max_scn": r["scn"],
                "has_commit": r["lsn"] == 1,
            }
        elif t == "cnt":
            out["counts"][(r["stmt"], r["shard"], int(r["k_scn"]))] = [
                r["n"], r["m"], r["o"]
            ]
    out["ddls"].sort(key=lambda x: (x[0], x[1]))
    if len(out["open_xids"]) > open_detail_cap:
        # detail overflowed the cap — callers must use open_summary and the
        # distributed pending/expiry path (the collect stays O(cap))
        out["open_xids"] = None
    return out
