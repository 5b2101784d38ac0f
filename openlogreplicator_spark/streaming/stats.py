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


def epoch_stats(
    batch_df: DataFrame,
    parts: dict[str, DataFrame],
    untracked_cond: Column | None = None,
    pending_flag: str | None = None,
    per_table_dml: bool = False,
    extra_branches: list[DataFrame] | None = None,
) -> dict:
    """Collect every driver-side epoch scalar in one aggregation job.

    ``untracked_cond``: boolean column over committed rows marking DML of
    untracked tables (enables the 'unt' stream).  ``pending_flag``: name of
    a boolean column on the open stream that is True for rows carried from
    the previous epoch's pending snapshot — its complement counts the
    epoch's NEW open events (the incremental pending-carry delta size).
    ``per_table_dml``: emit per-(table, shard) committed-DML counts ('tnm').
    """
    committed, dropped, open_ev = parts["committed"], parts["dropped"], parts["open"]
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
            # staleness inputs for the open-txn expiry horizon: newest scn
            # per xid (scn slot) and has-a-commit-event (lsn slot, 0/1) —
            # watermark-GATED committed txns ride open with a commit event
            # and must never be expired
            scn=F.col("scn"),
            lsn=F.when(F.col("op") == "commit", F.lit(1)).cast("long"),
        ),
    ]
    if untracked_cond is not None:
        branches.append(
            _branch(
                committed.filter(untracked_cond & F.col("op").isin(*_DML)),
                "unt",
                shard=F.col("shard"),
            )
        )
    if per_table_dml:
        branches.append(
            _branch(
                committed.filter(F.col("op").isin(*_DML)),
                "tnm",
                shard=F.col("shard"),
                stmt=F.col("table_name"),
            )
        )

    branches.extend(extra_branches or [])
    u = branches[0]
    for b in branches[1:]:
        u = u.unionByName(b)
    rows = (
        u.groupBy("tag", "shard", "xid", "k_scn", "k_seq", "stmt")
        .agg(
            F.sum("n").alias("n"),
            F.sum("m").alias("m"),
            F.sum("o").alias("o"),
            F.max("lsn").alias("lsn"),
            F.max("scn").alias("scn"),
        )
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
        "n_prollback": 0,
        "n_chunks": 0,
        "open_xids": {},
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
        elif t == "npr":
            out["n_prollback"] += r["n"]
        elif t == "nch":
            out["n_chunks"] += r["n"]
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
    return out
