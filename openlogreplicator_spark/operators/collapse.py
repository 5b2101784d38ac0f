"""Net-change collapse — last-writer-wins per key, column-wise.

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

All of this is one window + one aggregation on the SAME key, so Catalyst
plans a single hash exchange on (conv_id, turn_idx).  That key granularity
is also the skew defense: a hot conversation fans out across its turn_idx
values (north-star "salted repartition on conv_id" — the turn dimension is
the salt, and the final merge re-aggregates per bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import TRANSCRIPT_COLUMNS_ALL

KEY = ["conv_id", "turn_idx"]


def collapse_net_changes(dml: DataFrame, active_columns: list[str]) -> DataFrame:
    """dml: surviving committed ins/upd/del rows of ONE tracked table with
    ``txn_commit_scn`` attached.  Returns one row per key:
    (conv_id, turn_idx, is_delete, reset, set_cols, vals, last_shard,
    last_lsn)."""
    ordk = F.struct(F.col("txn_commit_scn"), F.col("seq_in_txn")).alias("_ord")
    d = dml.withColumn("_ord", ordk)

    w = Window.partitionBy(*KEY)
    boundary = F.max(
        F.when(F.col("op").isin("ins", "del"), F.col("_ord"))
    ).over(w)
    d = d.withColumn("_boundary", boundary)

    is_write = F.col("op").isin("ins", "upd")
    after_boundary = F.col("_boundary").isNull() | (F.col("_ord") >= F.col("_boundary"))

    aggs = [
        F.max_by(F.col("op"), F.col("_ord")).alias("_last_op"),
        F.max(F.when(F.col("op").isin("ins", "del"), F.lit(1)).otherwise(F.lit(0))).alias("_has_boundary"),
        F.max_by(F.col("shard"), F.col("_ord")).alias("last_shard"),
        F.max(F.col("lsn")).alias("last_lsn"),
    ]
    for c in TRANSCRIPT_COLUMNS_ALL:
        active = c in active_columns
        set_here = (
            is_write
            & after_boundary
            & F.array_contains(F.coalesce(F.col("changed_cols"), F.array()), c)
            & F.lit(active)
        )
        # max_by skips rows whose ordering value is NULL → only rows that
        # actually set column c compete
        aggs.append(
            F.max_by(F.col("after").getField(c), F.when(set_here, F.col("_ord"))).alias(f"_v_{c}")
        )
        aggs.append(F.max(F.when(set_here, F.lit(1)).otherwise(F.lit(0))).alias(f"_s_{c}"))

    g = d.groupBy(*KEY).agg(*aggs)

    set_cols = F.array_compact(
        F.array(
            *[
                F.when(F.col(f"_s_{c}") == 1, F.lit(c))
                for c in TRANSCRIPT_COLUMNS_ALL
            ]
        )
    )
    vals = F.struct(*[F.col(f"_v_{c}").alias(c) for c in TRANSCRIPT_COLUMNS_ALL])
    return g.select(
        *KEY,
        (F.col("_last_op") == "del").alias("is_delete"),
        (F.col("_has_boundary") == 1).alias("reset"),
        set_cols.alias("set_cols"),
        vals.alias("vals"),
        F.col("last_shard"),
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
            F.col("last_applied_lsn"),
            F.coalesce(F.col("n_ins"), F.lit(0)).cast("long").alias("n_ins"),
            F.coalesce(F.col("n_upd"), F.lit(0)).cast("long").alias("n_upd"),
            F.coalesce(F.col("n_del"), F.lit(0)).cast("long").alias("n_del"),
            F.coalesce(F.col("n_skipped"), F.lit(0)).cast("long").alias("n_skipped"),
        )
    )
    return out
