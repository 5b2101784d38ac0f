"""Deterministic synthetic change-feed generation.

Two layers:

* :class:`FeedBuilder` — an imperative scenario builder for test fixtures,
  mirroring the reference's SQL fixture corpus
  (/root/reference/tests/sql/inputs/*.sql, scenario table at
  /root/reference/PLAN.md:366-391): you open transactions, interleave DML
  calls, and commit/rollback; the builder assigns SCNs in call order exactly
  like the redo log serializes changes in time order.

* :func:`generate_scaled_feed` — a vectorized numpy generator for benchmark
  feeds (millions of events), with zipf-skewed conversation choice to model
  the hot-conversation skew the north star requires us to survive.

Everything is seeded and deterministic.  Events are written as one or more
parquet files per log "sequence" (the redo-log-file analog,
/root/reference/src/reader/Reader.cpp): file ``seq=K`` holds a contiguous
LSN range, so Structured Streaming's file source replays them in the same
order the reference replays archived logs.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from .schema import CHANGE_EVENT_SCHEMA, TRANSCRIPT_COLUMNS_ALL

BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)

_IMG_COLS = TRANSCRIPT_COLUMNS_ALL  # role, text, tool, ts, meta


def _image(**kwargs):
    """Build an image dict over the full (superset) image struct."""
    img = {c: None for c in _IMG_COLS}
    for k, v in kwargs.items():
        if k not in img:
            raise KeyError(f"unknown transcript column {k!r}")
        img[k] = v
    return img


class TxnHandle:
    def __init__(self, builder: "FeedBuilder", xid: str, shard: int,
                 attrs: dict | None = None):
        self._b = builder
        self.xid = xid
        self.shard = shard
        self.seq_in_txn = 0
        self.open = True
        # session attributes (OpCode0513 analog) stamped on every event of
        # this transaction
        self.attrs = attrs

    def _next_seq(self) -> int:
        s = self.seq_in_txn
        self.seq_in_txn += 1
        return s

    def ins(self, conv_id: str, turn_idx: int, **cols):
        """Insert: sets every schema column (unspecified → NULL)."""
        after = self._b.image_dict(**cols)
        changed = list(self._b.active_columns)
        self._b._emit(self, "ins", conv_id=conv_id, turn_idx=turn_idx,
                      after=after, changed_cols=changed)
        return self

    def upd(self, conv_id: str, turn_idx: int, **cols):
        """Update: sets exactly the given columns (value may be None —
        changed_cols carries presence, COLUMN_FORMAT::CHANGED analog)."""
        after = self._b.image_dict(**cols)
        changed = sorted(cols.keys())
        self._b._emit(self, "upd", conv_id=conv_id, turn_idx=turn_idx,
                      after=after, changed_cols=changed)
        return self

    def delete(self, conv_id: str, turn_idx: int):
        self._b._emit(self, "del", conv_id=conv_id, turn_idx=turn_idx)
        return self

    def prollback(self, conv_id: str, turn_idx: int):
        """Savepoint partial rollback: pops the last not-yet-popped DML of
        this txn on the same key (reference: opcodes 5.6/5.11,
        Transaction.cpp:73-148 rollbackLastOp)."""
        self._b._emit(self, "prollback", conv_id=conv_id, turn_idx=turn_idx)
        return self

    def chunk(self, conv_id: str, turn_idx: int, chunk_no: int, text: str):
        """LOB-style text chunk (reference: LobCtx page writes)."""
        self._b._emit(self, "chunk", conv_id=conv_id, turn_idx=turn_idx,
                      chunk_no=chunk_no, chunk_text=text)
        return self

    def dml_other_table(self, table_name: str, conv_id: str, turn_idx: int, op: str = "ins", **cols):
        """DML on a non-tracked table (multi-table scenario, filter F1)."""
        after = self._b.image_dict(**cols) if op in ("ins", "upd") else None
        changed = sorted(cols.keys()) if op == "upd" else (list(self._b.active_columns) if op == "ins" else None)
        self._b._emit(self, op, table_name=table_name, conv_id=conv_id,
                      turn_idx=turn_idx, after=after, changed_cols=changed)
        return self


class FeedBuilder:
    def __init__(self, n_shards: int = 1, table_name: str = "transcripts",
                 start_scn: int = 1000, columns: list[str] | None = None,
                 image_columns: list[str] | None = None):
        # image_columns: widen the feed's before/after struct beyond the
        # transcript superset (many-columns scenario) — the engine derives
        # its column universe from the frame, so this is feed-side only
        self.image_columns = list(image_columns) if image_columns else None
        self.n_shards = n_shards
        self.table_name = table_name
        self.rows: list[dict] = []
        self._scn = start_scn
        self._lsn = {s: 0 for s in range(n_shards)}
        self._xid_counter = 0
        self.schema_version = 0
        self.active_columns = list(columns or ["role", "text", "tool", "ts"])
        self._seq_marks: list[int] = []  # row indices where a new seq file starts

    # -- low level ---------------------------------------------------------
    def _emit(self, txn: TxnHandle, op: str, table_name: str | None = None,
              conv_id: str | None = None, turn_idx: int | None = None,
              after=None, before=None, changed_cols=None, chunk_no=None,
              chunk_text=None, commit_scn=None, ddl_stmt=None):
        assert txn.open, f"txn {txn.xid} already closed"
        scn = self._scn
        self._scn += 1
        self._lsn[txn.shard] += 1
        self.rows.append(
            dict(
                lsn=self._lsn[txn.shard],
                shard=txn.shard,
                seq=len(self._seq_marks),
                scn=scn,
                commit_scn=commit_scn,
                xid=txn.xid,
                seq_in_txn=txn._next_seq(),
                op=op,
                table_name=table_name or (self.table_name if op in ("ins", "upd", "del", "prollback", "chunk") else None),
                conv_id=conv_id,
                turn_idx=turn_idx,
                before=before,
                after=after,
                changed_cols=changed_cols,
                chunk_no=chunk_no,
                chunk_text=chunk_text,
                schema_version=self.schema_version,
                ddl_stmt=ddl_stmt,
                ts=BASE_TS + timedelta(seconds=scn),
                attrs=txn.attrs,
            )
        )

    # -- txn control --------------------------------------------------------
    def begin(self, shard: int = 0, attrs: dict | None = None) -> TxnHandle:
        xid = f"{shard}.{self._xid_counter:03d}.{self._xid_counter + 7:08x}"
        self._xid_counter += 1
        t = TxnHandle(self, xid, shard, attrs=attrs)
        self._emit(t, "begin")
        return t

    def begin_without_begin_event(self, shard: int = 0) -> TxnHandle:
        """A txn whose begin precedes feed start → must be dropped whole
        (reference: Parser.cpp:865-872 'skipping transaction with no
        beginning')."""
        xid = f"{shard}.{self._xid_counter:03d}.{self._xid_counter + 7:08x}"
        self._xid_counter += 1
        return TxnHandle(self, xid, shard)

    def commit(self, txn: TxnHandle):
        self._emit(txn, "commit", commit_scn=self._scn)
        txn.open = False

    def rollback(self, txn: TxnHandle):
        self._emit(txn, "rollback", commit_scn=self._scn)
        txn.open = False

    def ddl_txn(self, ddl_stmt: str, new_columns: list[str], shard: int = 0):
        """DDL as its own committed txn; subsequent events carry the bumped
        schema_version (reference: SystemTransaction commit rebuilds the
        dictionary, src/builder/SystemTransaction.cpp:729-757)."""
        t = self.begin(shard)
        self._emit(t, "ddl", ddl_stmt=ddl_stmt)
        self.commit(t)
        self.schema_version += 1
        self.active_columns = list(new_columns)

    def continue_txn(self, txn: TxnHandle, shard: int | None = None) -> TxnHandle:
        """Continue a transaction begun in ANOTHER builder — the
        long-spanning-transaction scenario (a txn alive across several
        epochs/log files; reference fixture @MID_SWITCH + the pending-state
        carry).  Same xid; seq_in_txn resumes from the donor handle so
        intra-txn order stays total."""
        t = TxnHandle(self, txn.xid,
                      shard if shard is not None else txn.shard, attrs=txn.attrs)
        t.seq_in_txn = txn.seq_in_txn
        return t

    def new_seq(self):
        """Start a new log file (sequence) at the current position —
        long-spanning-txn scenario (@MID_SWITCH analog)."""
        self._seq_marks.append(len(self.rows))

    @property
    def event_schema(self):
        if self.image_columns is None:
            return CHANGE_EVENT_SCHEMA
        from .schema import change_event_schema_for

        return change_event_schema_for(self.image_columns)

    def image_dict(self, **kwargs):
        cols = self.image_columns or _IMG_COLS
        img = {c: None for c in cols}
        for k, v in kwargs.items():
            if k not in img:
                raise KeyError(f"unknown column {k!r} for this feed")
            img[k] = v
        return img

    # -- output -------------------------------------------------------------
    def to_pandas(self) -> pd.DataFrame:
        df = pd.DataFrame(self.rows)
        return df

    def to_spark(self, spark):
        return spark.createDataFrame(self.rows, schema=self.event_schema)

    def write_parquet(self, spark, out_dir: str):
        """One parquet file per seq (log-file analog), named so
        lexicographic listing == replay order."""
        os.makedirs(out_dir, exist_ok=True)
        marks = [0] + self._seq_marks + [len(self.rows)]
        for k in range(len(marks) - 1):
            part = self.rows[marks[k]: marks[k + 1]]
            if not part:
                continue
            pdf = spark.createDataFrame(part, schema=self.event_schema)
            pdf.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"seq={k:05d}")
            )
        return out_dir


# ---------------------------------------------------------------------------
# Scaled generator (bench feeds)
# ---------------------------------------------------------------------------

def generate_scaled_feed(
    out_dir: str,
    n_txns: int = 50_000,
    avg_ops_per_txn: int = 8,
    n_convs: int = 5_000,
    max_turns: int = 64,
    n_shards: int = 4,
    n_files: int = 16,
    skew: float = 0.0,          # 0 = uniform; >0 = zipf-ish exponent on conv choice
    p_upd: float = 0.55,
    p_del: float = 0.05,
    text_len: int = 160,
    seed: int = 42,
) -> str:
    """Vectorized deterministic feed: interleaved txns, optional hot-conv skew.

    Interleaving model: each txn gets a random start position and a random
    per-op stride; events across txns are globally sorted by position and
    SCNs assigned in that order — the same shape the reference sees when many
    sessions write the redo log concurrently.
    """
    rng = np.random.default_rng(seed)

    ops_per_txn = rng.poisson(avg_ops_per_txn, n_txns).clip(1, avg_ops_per_txn * 6)
    total_dml = int(ops_per_txn.sum())
    txn_of = np.repeat(np.arange(n_txns), ops_per_txn)

    # positions: txn start + op index * stride → interleaved global order
    start = rng.uniform(0, 1000.0 * n_txns, n_txns)
    stride = rng.uniform(0.5, 50.0, n_txns)
    # vectorized ragged-range: global index minus each txn's start offset
    starts = np.concatenate([[0], np.cumsum(ops_per_txn)[:-1]])
    op_idx_in_txn = np.arange(total_dml) - np.repeat(starts, ops_per_txn)
    pos_dml = start[txn_of] + (op_idx_in_txn + 1) * stride[txn_of]
    pos_begin = start
    pos_commit = start + (ops_per_txn + 1) * stride

    # conversation choice: uniform or power-law (hot conversations)
    if skew > 0:
        # power law: rank = floor(n * u^(1+skew)) concentrates mass on low
        # ranks (conv-0 is the hot conversation) — north-star skew scenario
        u = rng.random(total_dml)
        conv = np.minimum((n_convs * u ** (1.0 + skew)).astype(np.int64), n_convs - 1)
    else:
        conv = rng.integers(0, n_convs, total_dml)
    turn = rng.integers(0, max_turns, total_dml).astype(np.int32)

    r = rng.random(total_dml)
    op = np.where(r < p_del, "del", np.where(r < p_del + p_upd, "upd", "ins"))

    # assemble the full event table
    n_total = total_dml + 2 * n_txns
    kind = np.concatenate([
        np.zeros(n_txns, np.int8),           # begin
        np.ones(total_dml, np.int8),         # dml
        np.full(n_txns, 2, np.int8),         # commit
    ])
    pos = np.concatenate([pos_begin, pos_dml, pos_commit])
    txn_all = np.concatenate([np.arange(n_txns), txn_of, np.arange(n_txns)])
    seq_in_txn = np.concatenate([
        np.zeros(n_txns, np.int64),
        op_idx_in_txn + 1,
        ops_per_txn + 1,
    ]).astype(np.int32)

    order = np.argsort(pos, kind="stable")
    kind, txn_all, seq_in_txn = kind[order], txn_all[order], seq_in_txn[order]

    scn = np.arange(n_total, dtype=np.int64) + 1000
    shard = (txn_all % n_shards).astype(np.int32)
    # per-shard lsn = running count within shard
    lsn = np.zeros(n_total, dtype=np.int64)
    for s in range(n_shards):
        m = shard == s
        lsn[m] = np.arange(1, int(m.sum()) + 1)

    # scatter dml payloads back through the sort
    dml_slot = np.full(n_total, -1, np.int64)
    dml_positions = np.nonzero(kind == 1)[0]
    # events with kind==1 appear in pos-sorted order; map them to original dml rows
    orig_dml_index = order[dml_positions] - n_txns  # index into dml arrays
    conv_s = np.full(n_total, -1, np.int64)
    turn_s = np.full(n_total, -1, np.int32)
    conv_s[dml_positions] = conv[orig_dml_index]
    turn_s[dml_positions] = turn[orig_dml_index]
    op_s = np.full(n_total, "", dtype=object)
    op_s[kind == 0] = "begin"
    op_s[kind == 2] = "commit"
    op_s[dml_positions] = op[orig_dml_index]

    # commit_scn per txn = scn of its commit event
    commit_scn_of_txn = np.zeros(n_txns, np.int64)
    commit_scn_of_txn[txn_all[kind == 2]] = scn[kind == 2]
    commit_scn_col = np.where(kind == 2, scn, 0)

    xid = np.char.add(np.char.add(shard.astype(str), "."), txn_all.astype(str))

    pad = "x" * max(text_len - 24, 0)
    is_dml = kind == 1
    is_write = is_dml & (op_s != "del")
    is_ins = is_dml & (op_s == "ins")

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n_total, n_files + 1).astype(int)
    roles = np.array(["user", "assistant", "tool", "system"], dtype=object)
    ts_us_all = (scn - 1000) * 1_000_000 + int(BASE_TS.timestamp() * 1_000_000)
    schema = _arrow_schema()

    # build per file (seq analog): string/struct materialization is the
    # memory hog, so it happens on bounded slices — 100M+-event feeds
    # generate in O(file) memory
    for k in range(n_files):
        sl = slice(bounds[k], bounds[k + 1])
        n = bounds[k + 1] - bounds[k]
        if n == 0:
            continue
        w = is_write[sl]
        d = is_dml[sl]
        i_ = is_ins[sl]
        scn_k = scn[sl]
        op_k = op_s[sl]

        def str_arr(values, valid):
            return pa.array(values, pa.string(), mask=~valid)

        null_str = pa.nulls(n, pa.string())
        null_ts = pa.nulls(n, pa.timestamp("us", tz="UTC"))
        after_role = roles[scn_k % 4]
        after_text = np.char.add(np.char.add("t-", scn_k.astype(str)), pad).astype(object)
        after = pa.StructArray.from_arrays(
            [str_arr(after_role, w), str_arr(after_text, w), null_str, null_ts, null_str],
            names=["role", "text", "tool", "ts", "meta"],
            mask=pa.array(~w),
        )

        # changed_cols ListArray from a row-major token mask:
        # ins → [role,text,tool,ts], upd → [role,text], others → empty
        token_matrix = np.broadcast_to(
            np.array(["role", "text", "tool", "ts"], dtype=object), (n, 4)
        )
        tok_mask = np.zeros((n, 4), dtype=bool)
        tok_mask[w, :2] = True
        tok_mask[i_, 2:] = True
        tok_values = pa.array(token_matrix[tok_mask], pa.string())
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(tok_mask.sum(axis=1, dtype=np.int32), out=offsets[1:])
        changed_cols = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), tok_values)

        table = pa.table(
            {
                "lsn": pa.array(lsn[sl], pa.int64()),
                "shard": pa.array(shard[sl], pa.int32()),
                "seq": pa.array(np.full(n, k, np.int64), pa.int64()),
                "scn": pa.array(scn_k, pa.int64()),
                "commit_scn": pa.array(scn_k, pa.int64(), mask=kind[sl] != 2),
                "xid": pa.array(xid[sl].astype(object), pa.string()),
                "seq_in_txn": pa.array(seq_in_txn[sl], pa.int32()),
                "op": pa.array(op_k, pa.string()),
                "table_name": str_arr(np.full(n, "transcripts", dtype=object), d),
                "conv_id": str_arr(
                    np.char.add("conv-", conv_s[sl].astype(str)).astype(object), d
                ),
                "turn_idx": pa.array(turn_s[sl], pa.int32(), mask=~d),
                "before": pa.nulls(n, after.type),
                "after": after,
                "changed_cols": changed_cols,
                "chunk_no": pa.nulls(n, pa.int32()),
                "chunk_text": null_str,
                "schema_version": pa.array(np.zeros(n, np.int32), pa.int32()),
                "ddl_stmt": null_str,
                "ts": pa.array(ts_us_all[sl], pa.timestamp("us", tz="UTC")),
                "attrs": pa.nulls(n, pa.map_(pa.string(), pa.string())),
            }
        ).cast(schema)
        pq.write_table(table, os.path.join(out_dir, f"seq-{k:05d}.parquet"))
    return out_dir


def _arrow_schema():
    import pyarrow as pa
    image = pa.struct([
        ("role", pa.string()), ("text", pa.string()), ("tool", pa.string()),
        ("ts", pa.timestamp("us", tz="UTC")), ("meta", pa.string()),
    ])
    return pa.schema([
        ("lsn", pa.int64()), ("shard", pa.int32()), ("seq", pa.int64()),
        ("scn", pa.int64()), ("commit_scn", pa.int64()), ("xid", pa.string()),
        ("seq_in_txn", pa.int32()), ("op", pa.string()),
        ("table_name", pa.string()), ("conv_id", pa.string()),
        ("turn_idx", pa.int32()), ("before", image), ("after", image),
        ("changed_cols", pa.list_(pa.string())), ("chunk_no", pa.int32()),
        ("chunk_text", pa.string()), ("schema_version", pa.int32()),
        ("ddl_stmt", pa.string()), ("ts", pa.timestamp("us", tz="UTC")),
        ("attrs", pa.map_(pa.string(), pa.string())),
    ])
