"""Feed filters — reference's config-driven predicates, one line each here.

The reference implements a tokenizer + recursive-descent expression compiler
for row conditions (/root/reference/src/common/expression/Expression.cpp) and
regex table selection (documentation/json/6.table.adoc) — Spark SQL *is*
that expression language, so each becomes a Catalyst-pushable filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tracked_tables_filter(df: DataFrame, pattern: str = "^transcripts$") -> DataFrame:
    """F1 — owner/table regex selection (Schema::buildMaps analog).
    Control ops (begin/commit/...) have NULL table_name and always pass."""
    return df.filter(F.col("table_name").isNull() | F.col("table_name").rlike(pattern))


def split_tracked(df: DataFrame, pattern: str = "^transcripts$") -> tuple[DataFrame, DataFrame]:
    """Payload rows split into (tracked, untracked) for skip accounting
    (reference: checkTableDict routing, Parser.cpp:594-608)."""
    is_tracked = F.col("table_name").isNotNull() & F.col("table_name").rlike(pattern)
    return df.filter(is_tracked), df.filter(~F.coalesce(is_tracked, F.lit(False)))


def condition_filter(df: DataFrame, condition_sql: str) -> DataFrame:
    """F2 — user row condition; the reference's mini expression language
    (Expression.cpp:27-280) maps 1:1 onto a SQL boolean expression."""
    return df.filter(F.expr(condition_sql))


def skip_xid_filter(df: DataFrame, skip_xids: list[str]) -> DataFrame:
    """F3 — drop named transactions (TransactionBuffer.h:87-88)."""
    if not skip_xids:
        return df
    return df.filter(~F.col("xid").isin(skip_xids))


def shard_filter(df: DataFrame, shards: list[int] | None) -> DataFrame:
    """F4 — container/conId analog: keep only the given shards."""
    if not shards:
        return df
    return df.filter(F.col("shard").isin(shards))


def first_data_lsn_filter(df: DataFrame, start_lsn_by_shard: dict[int, int]) -> DataFrame:
    """F6 — restart gate: drop events at/below the per-shard resume LSN
    (Metadata::isNewData, Metadata.cpp:716-727)."""
    if not start_lsn_by_shard:
        return df
    cond = None
    for shard, lsn in start_lsn_by_shard.items():
        c = (F.col("shard") == shard) & (F.col("lsn") <= lsn)
        cond = c if cond is None else (cond | c)
    return df.filter(~cond)


def dump_xid_events(df: DataFrame, dump_xids: list[str]) -> DataFrame:
    """F3's trace twin — the reference keeps BOTH a skip list and a dump
    list of named transactions (/root/reference/src/parser/
    TransactionBuffer.h:87-88 skipXidList/dumpXidList): dumped xids are
    TRACED (raw events emitted for debugging), not dropped.  A pushed-down
    `xid IN (...)` scan — zero cost for non-matching feeds."""
    if not dump_xids:
        return df.filter(F.lit(False))
    return df.filter(F.col("xid").isin(dump_xids))
