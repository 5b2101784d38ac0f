"""Stateful-streaming transaction assembly — the TransactionBuffer as a
Spark state-store operator.

This is the alternative architecture to the pending-snapshot carry in
apply.py: per-XID state lives in Spark's checkpointed state store
(``groupBy(xid).applyInPandasWithState``), the direct analog of the
reference's ``unordered_map<XidMap, Transaction*>``
(/root/reference/src/parser/TransactionBuffer.h:54-109) with swap-to-disk
(src/common/MemoryManager.cpp) replaced by the state-store backend
(RocksDB in production).

Events of one xid accumulate in state until the commit/rollback marker
arrives, then the transaction's surviving DMLs are emitted with
``txn_commit_scn`` attached (partial rollbacks applied in-order here, since
the group is already an ordered pandas frame — the stack loop is
per-transaction, bounded, and Arrow-batched).  Open transactions expire via
processing-time timeout — the analog of the reference's forced checkpoint
discard of stale transactions.

The emitted stream feeds the same collapse→merge sink (foreachBatch).
Trade-off vs apply.py: state lives in the engine (no manifest atomicity
with the table), so exactly-once still relies on the epoch ledger; the
pending-snapshot design keeps ALL state in one committable place, which is
why it is the default.  This module exists for parity with the
watermarked-stateful-groupBy architecture and for feeds where open
transactions are too large to rewrite per epoch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

# emitted rows: the committed-payload shape collapse_net_changes consumes
EMITTED_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("xid", T.StringType()),
        T.StructField("seq_in_txn", T.IntegerType()),
        T.StructField("op", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("after_json", T.StringType()),
        T.StructField("changed_cols", T.ArrayType(T.StringType())),
        T.StructField("chunk_no", T.IntegerType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("txn_commit_scn", T.LongType()),
    ]
)

# state: accumulated raw events of the open txn, packed as one binary blob
# (zlib-compressed JSON — compact on the wire and in the store; the
# reference's swap-chunk serialization analog, TransactionBuffer chunk
# lists).  Ceiling: one transaction's events must fit one state value —
# with compression ~5-10× more headroom than the raw JSON string this
# replaced, but a multi-GB transaction still belongs to the DEFAULT
# pending-snapshot architecture (apply.py), which spills to parquet; this
# state-store variant trades that for engine-managed state (RocksDB via
# session.build_session(state_store="rocksdb") keeps it off-heap).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_begin", T.BooleanType()),
        T.StructField("events_blob", T.BinaryType()),
    ]
)


def assemble_stateful(events: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """events: streaming DataFrame in CHANGE_EVENT_SCHEMA.  Returns the
    stream of committed DML events.

    ``timeout_ms``: expiry for stale open transactions.  Only set it for
    continuously-running deployments — a registered processing-time timeout
    keeps an availableNow (bounded drain) query spinning until the timeout
    fires, so bounded replays must use the default (no timeout)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import json

        if state.hasTimedOut:
            # stale open transaction — discard (reference: old uncommitted
            # txns dropped at forced checkpoint)
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in EMITTED_SCHEMA.fields])
            return

        import zlib

        (xid,) = key
        if state.exists:
            has_begin, events_blob = state.get
            buf = json.loads(zlib.decompress(bytes(events_blob)))
        else:
            has_begin, buf = False, []

        commit_scn = None
        rolled_back = False
        # applyInPandasWithState guarantees NO ordering across Arrow chunks
        # of a group: accumulate every chunk first, sort ONCE by seq_in_txn,
        # then replay — otherwise a txn spanning batches can interleave and
        # prollback stack-matching pops the wrong DML.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            whole = pd.concat(chunks, ignore_index=True).sort_values(["seq_in_txn"])
            for r in whole.itertuples(index=False):
                if r.op == "begin":
                    has_begin = True
                elif r.op == "commit":
                    commit_scn = int(r.commit_scn)
                elif r.op == "rollback":
                    rolled_back = True
                elif r.op == "prollback":
                    # pop last unpopped DML on same key (stack, in-order)
                    for prior in reversed(buf):
                        if (
                            not prior["popped"]
                            and prior["op"] in ("ins", "upd", "del")
                            and prior["table_name"] == r.table_name
                            and prior["conv_id"] == r.conv_id
                            and prior["turn_idx"] == (None if pd.isna(r.turn_idx) else int(r.turn_idx))
                        ):
                            prior["popped"] = True
                            break
                else:
                    buf.append(
                        dict(
                            lsn=int(r.lsn),
                            shard=int(r.shard),
                            seq_in_txn=int(r.seq_in_txn),
                            op=r.op,
                            table_name=r.table_name,
                            conv_id=r.conv_id,
                            turn_idx=None if pd.isna(r.turn_idx) else int(r.turn_idx),
                            after_json=r.after_json,
                            changed_cols=list(r.changed_cols) if r.changed_cols is not None else None,
                            chunk_no=None if pd.isna(r.chunk_no) else int(r.chunk_no),
                            chunk_text=None if not isinstance(r.chunk_text, str) else r.chunk_text,
                            popped=False,
                        )
                    )

        if rolled_back or (commit_scn is not None and not has_begin):
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in EMITTED_SCHEMA.fields])
        elif commit_scn is not None:
            out = [
                {
                    "lsn": e["lsn"],
                    "shard": e["shard"],
                    "xid": xid,
                    "seq_in_txn": e["seq_in_txn"],
                    "op": e["op"],
                    "table_name": e["table_name"],
                    "conv_id": e["conv_id"],
                    "turn_idx": e["turn_idx"],
                    "after_json": e["after_json"],
                    "changed_cols": e["changed_cols"],
                    "chunk_no": e.get("chunk_no"),
                    "chunk_text": e.get("chunk_text"),
                    "txn_commit_scn": commit_scn,
                }
                for e in buf
                if not e["popped"]
            ]
            state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in EMITTED_SCHEMA.fields])
        else:
            state.update(
                (has_begin, zlib.compress(json.dumps(buf).encode("utf-8"), 1))
            )
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(columns=[f.name for f in EMITTED_SCHEMA.fields])

    prepared = events.withColumn("after_json", F.to_json(F.col("after"))).select(
        "lsn", "shard", "xid", "seq_in_txn", "op", "table_name", "conv_id",
        "turn_idx", "after_json", "changed_cols", "chunk_no", "chunk_text",
        "commit_scn",
    )
    return prepared.groupBy("xid").applyInPandasWithState(
        fn,
        outputStructType=EMITTED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
