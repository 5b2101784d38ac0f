"""Net-change collapse — last-writer-wins per key, column-wise, skew-proof.

The reference applies each transaction's ops sequentially and relies on an
op-type lattice to merge row pieces (INSERT+DELETE→UPDATE etc.,
/root/reference/src/parser/Transaction.cpp:435-492); its writer then emits
ops one at a time.  A set-oriented MERGE applies a batch at once, so every
key must be collapsed to ONE net change first (SURVEY.md §7.4 risk 1).

Sequential-apply equivalence, per key over ops ordered by
(commit_scn, seq_in_txn):

* the last ``ins`` or ``del`` is a ROW BOUNDARY — it discards everything
  before it (ins defines the whole row; del removes it);
* a column's net value comes from the last op at/after the boundary that
  *set* that column (``changed_cols`` carries presence — the
  COLUMN_FORMAT::CHANGED analog, reference src/common/Format.h:48-52);
* the net op is delete iff the last op is ``del``;
* ``reset`` (row replace, not coalesce-with-target) iff a boundary exists.

Skew design: this stage is ONE ALGEBRAIC AGGREGATION — no window, no
join.  The shipped default (``onesort``) pre-partitions by the group key
and plans a single complete SortAggregate: one sort instead of the
partial+final pair's two full-data sorts, measured faster and
better-scaling on realistic (~2 events/key) feeds.  The TRADE-OFF is
that onesort disables map-side combine, so a pathological hot key (one
key carrying more than ~1/n_partitions of an epoch) serializes one
reducer; ``OLR_COLLAPSE_MODE=combine`` restores the partial+final
map-side-combine plan — the built-in equivalent of salted two-level
aggregation, collapsing a hot key to one row per input partition before
the shuffle — at the cost of the second sort.  Either way a window
formulation would be worse: it ships AND sorts every row of the hot key
on one reducer with no combine option at all.

Single-pass boundary gating: the boundary test ("setter must be at/after
the last ins/del") can be applied AFTER aggregation, because a column's
max-ord setter is the only candidate that can ever pass it — every other
setter has lower ord, so if the max setter precedes the boundary, no
setter follows it.  Aggregate {boundary, per-column max setter, last op}
in one pass, gate in the projection.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["conv_id", "turn_idx"]


def _collapse_mode() -> str:
    """``onesort`` (default) pre-partitions the DML by the group key so the
    aggregation plans as ONE complete SortAggregate after the exchange —
    the partial/final split would SORT the full text-heavy frame twice
    (map side + reduce side) to save only the ~10% of shuffle bytes that
    map-side combine removes at the typical ~2 events/key.  Measured on the
    25M-event update epoch (tools/exp_*): 2→8-core stage efficiency 0.59 →
    0.83 and −23% wall at 8 cores; sorts get cache-miss-bound as cores
    grow, exchanges keep scaling.

    ``combine`` restores the partial+final map-side-combine plan: the
    pathological-skew armor.  A key carrying more than ~1/n_partitions of
    the epoch's events serializes one reducer under ``onesort``; combine
    collapses it to one row per map partition before the shuffle.  The
    bench's skew=2.0 feed puts ~1% on the hottest key — far below a task's
    average share — so onesort is the right default; flip this dial for
    feeds where single conversations dominate whole epochs."""
    mode = os.environ.get("OLR_COLLAPSE_MODE", "onesort").lower()
    if mode not in ("onesort", "combine"):
        import warnings

        warnings.warn(
            f"unknown OLR_COLLAPSE_MODE {mode!r}; using 'combine' plan "
            "(valid: onesort, combine)", stacklevel=2,
        )
    return mode


def _ord():
    # (commit_scn, seq_in_txn) is a total order per key: commit_scn is
    # unique per txn, seq_in_txn orders within (reference: drainPendingBelow
    # commit sort + chunk append order)
    return F.struct(F.col("txn_commit_scn"), F.col("seq_in_txn"))


def collapse_net_changes(
    dml: DataFrame, active_columns: list[str], extra_group: list[str] | None = None
) -> DataFrame:
    """dml: surviving committed ins/upd/del rows of ONE tracked table with
    ``txn_commit_scn`` attached.  Returns one row per key:
    (conv_id, turn_idx, is_delete, reset, set_cols, vals, last_shard,
    last_lsn).

    ``extra_group``: extra grouping columns BEFORE the key — multi-table
    replication passes ``["table_name"]`` to collapse EVERY tracked table
    in one aggregation job (per-table key spaces stay disjoint through the
    group key); the per-table sinks then filter their slice of the one
    persisted result.  ``active_columns`` is then the UNION of the live
    tables' columns — safe because a per-table merge only reads its own
    value columns out of ``set_cols``/``vals`` (extraneous entries are
    never projected).

    The column UNIVERSE (the vals struct fields) is the input frame's
    ``after`` struct — not a hardcoded list — so wide schemas (the
    reference's many-columns fixture class, 60+ columns) collapse with one
    conditional-max aggregate per column and zero code changes; columns in
    ``active_columns`` missing from the feed struct are simply never set."""
    universe = [
        c for c in dml.schema["after"].dataType.names
    ]
    gkey_pre = (extra_group or []) + KEY
    if _collapse_mode() == "onesort":
        # hash-exchange on the group key BEFORE aggregating: the agg then
        # plans as one COMPLETE SortAggregate (single sort) instead of
        # partial+final (two full-data sorts) — see _collapse_mode.  No
        # partition count pinned: spark.sql.shuffle.partitions + AQE size
        # it (small streaming epochs coalesce, big replays spread).
        dml = dml.repartition(*gkey_pre)
    d = dml.withColumn("_ord", _ord())
    is_write = F.col("op").isin("ins", "upd")

    aggs = [
        F.max(F.struct(F.col("_ord"), F.col("op"), F.col("shard"))).alias("_last"),
        F.max(F.when(F.col("op").isin("ins", "del"), F.col("_ord"))).alias("_boundary"),
        F.max(F.col("lsn")).alias("last_lsn"),
    ]
    for c in universe:
        if c in active_columns:
            sets_c = is_write & F.array_contains(
                F.coalesce(F.col("changed_cols"), F.array()), c
            )
        else:
            sets_c = F.lit(False)
        # max over structs is lexicographic on (_ord, value); _ord is unique
        # per key, so this is exactly "value of the max-ord setter"
        aggs.append(
            F.max(
                F.when(sets_c, F.struct(F.col("_ord"), F.col("after").getField(c).alias("v")))
            ).alias(f"_m_{c}")
        )

    gkey = (extra_group or []) + KEY
    g = d.groupBy(*gkey).agg(*aggs)

    def gated(c: str):
        m = F.col(f"_m_{c}")
        ok = m.isNotNull() & (
            F.col("_boundary").isNull() | (m.getField("_ord") >= F.col("_boundary"))
        )
        return ok

    set_cols = F.array_compact(
        F.array(*[F.when(gated(c), F.lit(c)) for c in universe])
    )
    vals = F.struct(
        *[
            F.when(gated(c), F.col(f"_m_{c}").getField("v")).alias(c)
            for c in universe
        ]
    )
    return g.select(
        *gkey,
        (F.col("_last").getField("op") == "del").alias("is_delete"),
        F.col("_boundary").isNotNull().alias("reset"),
        set_cols.alias("set_cols"),
        vals.alias("vals"),
        F.col("_last").getField("shard").alias("last_shard"),
        F.col("last_lsn"),
    )


def lineage_from_batch(
    net_changes: DataFrame,
    dropped: DataFrame,
    untracked: DataFrame,
    batch_events: DataFrame,
    epoch_id: int,
) -> DataFrame:
    """Per-shard lineage row for this epoch (reference analog: DML counters
    src/common/metrics/Metrics.h:76-87 + confirmedScn advance
    src/writer/Writer.cpp:362-399).

    Counts are NET ops (what the merge actually does): n_ins = row-defining
    puts, n_upd = coalescing puts, n_del = deletes.  n_skipped = DML events
    dropped before the sink (rolled back, no-begin, untracked table).
    last_applied_lsn = max lsn consumed from each shard this epoch.
    """
    counts = net_changes.groupBy(F.col("last_shard").alias("shard")).agg(
        F.sum(F.when(~F.col("is_delete") & F.col("reset"), 1).otherwise(0)).alias("n_ins"),
        F.sum(F.when(~F.col("is_delete") & ~F.col("reset"), 1).otherwise(0)).alias("n_upd"),
        F.sum(F.when(F.col("is_delete"), 1).otherwise(0)).alias("n_del"),
    )
    skipped = (
        dropped.select("shard")
        .unionByName(untracked.select("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n_skipped"))
    )
    last = batch_events.groupBy("shard").agg(F.max("lsn").alias("last_applied_lsn"))

    out = (
        last.join(counts, "shard", "left")
        .join(skipped, "shard", "left")
        .select(
            F.lit(epoch_id).cast("long").alias("epoch_id"),
            F.col("shard"),
            F.lit(None).cast("string").alias("table_name"),
            F.col("last_applied_lsn"),
            F.coalesce(F.col("n_ins"), F.lit(0)).cast("long").alias("n_ins"),
            F.coalesce(F.col("n_upd"), F.lit(0)).cast("long").alias("n_upd"),
            F.coalesce(F.col("n_del"), F.lit(0)).cast("long").alias("n_del"),
            F.coalesce(F.col("n_skipped"), F.lit(0)).cast("long").alias("n_skipped"),
        )
    )
    return out
