"""Transaction assembly — the TransactionBuffer rebuilt declaratively.

The reference buffers (undo,redo) pairs per XID in a hash map and flushes at
commit (/root/reference/src/parser/TransactionBuffer.cpp:62-200,
src/parser/Transaction.cpp:199-560).  Here the same semantics are a handful
of DataFrame ops over a batch of change events:

* transaction status  = groupBy(xid) over the (tiny) control events
  (begin/commit/rollback) — broadcast back onto the payload events;
* commit-ordered emission = the commit_scn joined onto every payload row
  (reference: drainPendingBelow sorts committedPending by commitScn,
  TransactionBuffer.cpp:323-340 — for us a sort key, not a physical sort:
  the collapse stage orders by (commit_scn, seq_in_txn) per key);
* "transaction with no begin" (started before the feed) is dropped whole
  (Parser.cpp:865-872);
* rolled-back transactions are dropped whole (FLG_ROLLBACK_OP0504,
  Parser.cpp:792-889);
* savepoint partial rollback (opcodes 5.6/5.11, Transaction.cpp:73-148
  rollbackLastOp) — "pop the last unmatched DML on the same key" — is a
  *stack* per (xid, key).  We solve it with pure window functions instead of
  per-group Python: scanning events in reverse, a counter c follows
  c' = max(0, c + x) with x=+1 for a rollback mark and x=-1 for a DML, and
  a DML is popped iff the counter before it is > 0.  That recurrence has the
  closed form c_prev = s_prev - min(0, running_min(s)), with s the plain
  reverse running sum — two window aggregates, fully JVM-side, no shuffle
  beyond the one hash partition on (xid, key).

Scale notes: control events are ~2 rows/txn — the status side of the join is
orders of magnitude smaller than the payload and Spark broadcasts it (AQE
converts to broadcast-hash below the threshold).  All groupings are keyed at
(xid) or (xid, conv_id, turn_idx) granularity, which spreads hot
conversations across many keys (the turn/txn dimension is the built-in salt;
see also collapse_net_changes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DML_OPS = ("ins", "upd", "del")


def _null_image(image_type=None):
    """All-NULL image struct.  The field set comes from the caller's frame
    (wide schemas keep working); the static schema is only a fallback."""
    if image_type is None:
        from ..schema import IMAGE_TYPE as image_type

    return F.struct(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in image_type.fields]
    )


def transaction_status(events: DataFrame) -> DataFrame:
    """One row per xid seen in control events: (xid, has_begin, commit_scn,
    rolled_back)."""
    ctl = events.filter(F.col("op").isin("begin", "commit", "rollback"))
    return ctl.groupBy("xid").agg(
        F.max(F.when(F.col("op") == "begin", F.lit(True))).alias("has_begin"),
        F.max(F.when(F.col("op") == "commit", F.col("commit_scn"))).alias("txn_commit_scn"),
        F.max(F.when(F.col("op") == "rollback", F.lit(True))).alias("rolled_back"),
    )


def assemble_transactions(
    events: DataFrame, commit_watermark: int | None = None
) -> dict[str, DataFrame]:
    """Split a batch (new events ∪ pending events) into:

    - ``committed``: payload events (dml/prollback/chunk/ddl) of committed
      begun transactions, with ``txn_commit_scn`` attached;
    - ``open``: ALL events of transactions not yet closed (carried to the
      next epoch as pending state);
    - ``dropped``: payload DML events of rolled-back or no-begin-committed
      transactions (for skip accounting only).

    ``commit_watermark``: RAC-analog SCN gate (reference:
    Replicator.cpp:1142-1210 updateScnWatermark / emitWatermarkedTransactions
    — a transaction is emitted only once every shard has read past its
    commit SCN).  Transactions with commit_scn above the watermark are
    treated as still open: they ride the pending snapshot into the next
    epoch, so cross-shard delivery skew can never apply commits out of
    global SCN order.  None (default) = single-ordered-source contract.
    """
    status = transaction_status(events)
    if commit_watermark is not None:
        status = status.withColumn(
            "txn_commit_scn",
            F.when(
                F.col("txn_commit_scn") <= F.lit(commit_watermark),
                F.col("txn_commit_scn"),
            ),
        )
    payload = events.filter(F.col("op").isin("ins", "upd", "del", "prollback", "chunk", "ddl"))

    # status has one row per txn.  Strategy (guide §3.1, measured r6):
    # for SMALL epochs (streaming micro-batches, update epochs) the
    # broadcast hint removes the wide payload-by-xid exchange outright —
    # the payload never shuffles for this join at all.  For BIG epochs the
    # hint is a net LOSS: the status side is O(txns) rows, the static
    # BroadcastExchange collects it single-threaded on the driver (6.6 s
    # for 1M txns, measured), the hint does not reach cached subplans
    # (the persisted collapse build keeps its sort-merge join either way),
    # and AQE's runtime SMJ→BHJ conversion (session.py sets
    # spark.sql.adaptive.autoBroadcastJoinThreshold=256m) already converts
    # the un-hinted join from the MEASURED status stage size without the
    # driver collect.  Measured on the 10M-event feed: hint cost the
    # multi-table epoch +45% wall and bought the single-table merge ≤3%.
    # The decision is driver-side and job-free: the planner's scan-bytes
    # estimate of the input bounds the txn count, so feeds under
    # OLR_STATUS_BCAST_CAP (default 128m ≈ a ~1M-event epoch) broadcast;
    # bigger epochs keep the shuffle join + AQE runtime conversion.
    # OLR_STATUS_JOIN=shuffle|bcast overrides either way.
    st = status
    mode = os.environ.get("OLR_STATUS_JOIN", "auto")
    if mode == "bcast":
        st = F.broadcast(status)
    elif mode == "auto":
        cap = int(os.environ.get("OLR_STATUS_BCAST_CAP", str(128 << 20)))
        try:
            est = int(events._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:
            est = cap + 1
        if est <= cap:
            st = F.broadcast(status)
    joined = payload.join(st, "xid", "left")

    closed = F.col("txn_commit_scn").isNotNull() | F.col("rolled_back").isNotNull()
    committed = joined.filter(
        F.col("txn_commit_scn").isNotNull()
        & F.col("rolled_back").isNull()
        & (F.col("has_begin") == F.lit(True))
    )
    dropped = joined.filter(
        closed
        & (F.col("rolled_back").isNotNull() | F.col("has_begin").isNull())
        & F.col("op").isin(*DML_OPS)
    )

    open_events = events.join(
        st.filter(
            F.col("txn_commit_scn").isNotNull() | F.col("rolled_back").isNotNull()
        ).select("xid"),
        "xid",
        "left_anti",
    )
    # "status" (the possibly-broadcast frame) rides along so the fused
    # stats job (streaming/stats.py fast path) can reuse the SAME exchange
    # or broadcast instead of re-deriving txn state per counter branch.
    return {"committed": committed, "open": open_events, "dropped": dropped,
            "status": st}


def match_partial_rollbacks(
    committed: DataFrame,
    broadcast_key_limit: int = 1_000_000,
    n_hint: int | None = None,
) -> DataFrame:
    """Remove DMLs popped by savepoint partial rollbacks, and the prollback
    markers themselves.  Pure window formulation (see module docstring).

    Scale shape: the stack-matching window shuffles only the (xid, key)
    groups that actually CONTAIN a prollback — located by semi/anti joins
    on the (filter-pushdown) prollback key set.  The broadcast decision is
    made from MEASURED size, not a blind hint: a short-circuiting
    ``limit(N+1).count()`` over the pushed-down ``op='prollback'`` scan
    bounds the key-set size.  Below the limit the key set is broadcast and
    the payload never shuffles (the common case — savepoints are rare);
    above it the joins fall back to shuffle, which is the only shape that
    survives a savepoint-heavy feed (an unconditional broadcast there is a
    driver OOM).  Zero prollbacks short-circuits to a plain filter.

    ``n_hint``: prollback count already measured by the caller (the fused
    epoch-stats job, streaming/stats.py) — skips the probe job.  A count
    taken BEFORE caller-side row drops is safe: zero stays zero, and an
    over-count only makes the broadcast decision more conservative."""
    w_key = ["xid", "table_name", "conv_id", "turn_idx"]
    pr_events = committed.filter(F.col("op") == "prollback")
    n_pr = n_hint if n_hint is not None else pr_events.limit(broadcast_key_limit + 1).count()
    if n_pr == 0:
        return committed.filter(F.col("op") != "prollback")

    affected = committed.filter(F.col("op").isin("ins", "upd", "del", "prollback"))
    passthrough = committed.filter(~F.col("op").isin("ins", "upd", "del", "prollback"))

    pr_keys = pr_events.select(*w_key).distinct()
    if n_pr <= broadcast_key_limit:
        pr_keys = F.broadcast(pr_keys)
    untouched = affected.join(pr_keys, w_key, "left_anti")
    contested = affected.join(pr_keys, w_key, "left_semi")

    x = F.when(F.col("op") == "prollback", F.lit(1)).otherwise(F.lit(-1))
    w = Window.partitionBy(*w_key).orderBy(F.col("seq_in_txn").desc())
    s = F.sum(x).over(w.rowsBetween(Window.unboundedPreceding, 0))
    s_prev = s - x
    min_prev = F.min(s).over(w.rowsBetween(Window.unboundedPreceding, -1))
    threshold = F.least(F.lit(0), F.coalesce(min_prev, F.lit(0)))
    popped = (F.col("op") != "prollback") & (s_prev > threshold)

    survivors = (
        contested.withColumn("_popped", popped)
        .filter((F.col("op") != "prollback") & ~F.col("_popped"))
        .drop("_popped")
    )
    return survivors.unionByName(untouched).unionByName(passthrough)


def reassemble_chunks(
    survivors: DataFrame,
    broadcast_key_limit: int = 1_000_000,
    n_hint: int | None = None,
) -> DataFrame:
    """LOB-analog text reassembly (reference: LobCtx page maps,
    src/common/LobCtx.cpp; invocation Transaction.cpp:286-420).

    Chunks of a (xid, key) concatenate in (seq_in_txn, chunk_no) order and
    become the ``text`` of the LAST surviving ins/upd on that key in the
    same transaction.  Built-ins only: collect_list → array_sort → reduce.

    Scale shape: zero chunks short-circuits to a plain filter (one
    pushed-down op='chunk' probe).  Otherwise the DML stream is split by a
    semi/anti join on the NARROW chunk key set — broadcast when a
    short-circuiting count proves it small, shuffle when not — and only the
    ``contested`` rows (groups that actually have chunks) join the patch.
    The patch carries the fully-reassembled chunk text — the largest values
    in the feed — and is NEVER broadcast: its join partner is the already-
    small contested set, so that join is a small shuffle regardless of how
    fat the text is.  The untouched bulk never shuffles at all.

    ``n_hint``: chunk count already measured by the caller's fused
    epoch-stats job (chunk events pass through savepoint matching
    untouched, so a pre-matching count is exact).
    """
    chunk_events = survivors.filter(F.col("op") == "chunk")
    n_chunks = n_hint if n_hint is not None else chunk_events.limit(broadcast_key_limit + 1).count()
    if n_chunks == 0:
        return survivors.filter(F.col("op") != "chunk")

    rest = survivors.filter(F.col("op") != "chunk")

    gk = ["xid", "table_name", "conv_id", "turn_idx"]
    agg = chunk_events.groupBy(*gk).agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("seq_in_txn"),
                        F.coalesce(F.col("chunk_no"), F.lit(0)).alias("chunk_no"),
                        F.coalesce(F.col("chunk_text"), F.lit("")).alias("chunk_text"),
                    )
                )
            ),
            F.lit(""),
            lambda acc, c: F.concat(acc, c["chunk_text"]),
        ).alias("_chunked_text")
    )

    keys = agg.select(*gk)
    if n_chunks <= broadcast_key_limit:
        keys = F.broadcast(keys)
    untouched = rest.join(keys, gk, "left_anti")
    contested = rest.join(keys, gk, "left_semi")

    # last surviving write per chunked group — aggregated over the small
    # contested set only
    last_write = (
        contested.filter(F.col("op").isin("ins", "upd"))
        .groupBy(*gk)
        .agg(F.max("seq_in_txn").alias("_last_write_seq"))
    )
    patch = agg.join(last_write, gk)

    patched = (
        contested.join(patch, gk, "left")
        .withColumn(
            "_take_chunk",
            F.col("_chunked_text").isNotNull()
            & F.col("op").isin("ins", "upd")
            & (F.col("seq_in_txn") == F.col("_last_write_seq")),
        )
        .withColumn(
            "after",
            F.when(
                F.col("_take_chunk"),
                F.coalesce(
                    F.col("after"), _null_image(survivors.schema["after"].dataType)
                ).withField("text", F.col("_chunked_text")),
            ).otherwise(F.col("after")),
        )
        .withColumn(
            "changed_cols",
            F.when(
                F.col("_take_chunk") & ~F.array_contains(F.coalesce(F.col("changed_cols"), F.array()), "text"),
                F.concat(F.coalesce(F.col("changed_cols"), F.array()), F.array(F.lit("text"))),
            ).otherwise(F.col("changed_cols")),
        )
        .drop("_chunked_text", "_last_write_seq", "_take_chunk")
    )
    return untouched.unionByName(patched)
