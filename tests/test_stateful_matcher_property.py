"""Property tests for the vectorized savepoint matcher in
streaming/stateful.py (`_match_prollbacks_pd`) — pure pandas/numpy, no
Spark session.

The closed form (reverse running-sum stack matching, the same algebra as
operators/assemble.py match_partial_rollbacks) must equal the obvious
forward stack simulator: within one (xid, table, conv, turn) key, scanning
in seq order, a DML pushes and a prollback pops the most recent surviving
DML (an unmatched prollback pops nothing); prollback markers never survive
(reference: OpCode 11.x partial-rollback pairing,
src/parser/TransactionBuffer.cpp rollback chain).

Also pins CONFLUENCE: matching a prefix, carrying only its survivors, then
matching survivors+suffix equals matching the whole buffer at once — the
exact property the cross-batch state carry in assemble_stateful relies on
(state holds only survivors between micro-batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from openlogreplicator_spark.streaming.stateful import (
    _PR_KEY,
    _match_prollbacks_pd,
)

_DML = ("ins", "upd", "del")
_OPS = _DML + ("prollback", "begin", "chunk")


def _mk_buf(ops_per_key: dict[tuple, list[str]]) -> pd.DataFrame:
    """One txn per xid; seq_in_txn interleaves keys in round-robin so the
    frame exercises non-contiguous key groups within an xid."""
    rows = []
    seqs: dict[str, int] = {}
    pending = {k: list(v) for k, v in ops_per_key.items()}
    while any(pending.values()):
        for key in list(pending):
            if not pending[key]:
                continue
            xid, table, conv, turn = key
            seqs[xid] = seqs.get(xid, 0) + 1
            rows.append(
                {
                    "xid": xid,
                    "table_name": table,
                    "conv_id": conv,
                    "turn_idx": turn,
                    "op": pending[key].pop(0),
                    "seq_in_txn": seqs[xid],
                }
            )
    buf = pd.DataFrame(
        rows,
        columns=["xid", "table_name", "conv_id", "turn_idx", "op", "seq_in_txn"],
    )
    return buf.sort_values(["xid", "seq_in_txn"], kind="stable").reset_index(
        drop=True
    )


def _simulate(buf: pd.DataFrame) -> pd.DataFrame:
    """Forward per-key stack simulator over the frame's row positions."""
    stacks: dict[tuple, list[int]] = {}
    keep = np.ones(len(buf), dtype=bool)
    for pos, row in enumerate(buf.itertuples(index=False)):
        key = (row.xid, row.table_name, row.conv_id, row.turn_idx)
        if row.op in _DML:
            stacks.setdefault(key, []).append(pos)
        elif row.op == "prollback":
            keep[pos] = False
            stack = stacks.get(key)
            if stack:
                keep[stack.pop()] = False
    return buf.loc[keep]


_key_st = st.tuples(
    st.sampled_from(["x1", "x2"]),
    st.sampled_from(["transcripts"]),
    st.sampled_from(["c1", "c2"]),
    st.integers(0, 1),
)
_ops_st = st.dictionaries(
    _key_st, st.lists(st.sampled_from(_OPS), min_size=0, max_size=12),
    min_size=1, max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(_ops_st)
def test_matcher_equals_stack_simulator(ops_per_key):
    buf = _mk_buf(ops_per_key)
    got = _match_prollbacks_pd(buf).reset_index(drop=True)
    want = _simulate(buf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@settings(max_examples=200, deadline=None)
@given(_ops_st, st.integers(0, 40))
def test_matcher_is_confluent_across_batch_splits(ops_per_key, cut):
    """match(match(prefix) + suffix) == match(whole) for any split point —
    so carrying only survivors between micro-batches loses nothing."""
    buf = _mk_buf(ops_per_key)
    cut = min(cut, len(buf))
    whole = _match_prollbacks_pd(buf).reset_index(drop=True)

    carried = _match_prollbacks_pd(buf.iloc[:cut])
    rejoined = pd.concat([carried, buf.iloc[cut:]]).sort_values(
        ["xid", "seq_in_txn"], kind="stable"
    )
    incremental = _match_prollbacks_pd(rejoined).reset_index(drop=True)
    pd.testing.assert_frame_equal(incremental, whole)


def test_matcher_key_isolation():
    """A prollback only pops DMLs of ITS (xid, table, conv, turn) key."""
    buf = _mk_buf(
        {
            ("x1", "transcripts", "c1", 0): ["ins", "prollback"],
            ("x1", "transcripts", "c2", 0): ["ins"],
        }
    )
    out = _match_prollbacks_pd(buf)
    assert list(out["conv_id"]) == ["c2"]
    assert set(out["op"]) == {"ins"}


def test_matcher_unmatched_prollback_is_consumed():
    buf = _mk_buf({("x1", "transcripts", "c1", 0): ["prollback", "ins"]})
    out = _match_prollbacks_pd(buf)
    assert list(out["op"]) == ["ins"]


def test_pack_unpack_roundtrip():
    from openlogreplicator_spark.streaming.stateful import _pack, _unpack

    buf = _mk_buf(
        {("x1", "transcripts", "c1", 0): ["ins", "upd", "prollback", "del"]}
    )
    assert _PR_KEY == ["xid", "table_name", "conv_id", "turn_idx"]
    out = _unpack(_pack(buf))
    pd.testing.assert_frame_equal(out, buf)
