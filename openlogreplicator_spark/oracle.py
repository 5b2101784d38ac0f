"""Sequential reference replay — the test oracle.

Plays the change feed one event at a time in SCN order, exactly the way the
reference's single parser thread does (/root/reference/src/parser/Parser.cpp
analyzeLwn → appendToTransaction* → Transaction::flush at commit), and
produces the expected final table state.  This is our analog of the
reference's LogMiner differential oracle
(/root/reference/tests/sql/scripts/compare.py): an independent, obviously
correct implementation the distributed engine must match.

Pure Python on purpose — O(events), used only at fixture scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class _Txn:
    has_begin: bool = False
    ops: list = field(default_factory=list)  # events incl. chunk; popped ones flagged


@dataclass
class ReplayResult:
    rows: dict                 # (conv_id, turn_idx) -> {col: value}
    columns: list              # active schema columns at end
    n_applied: dict            # op -> count of DML ops actually applied
    n_skipped: int             # events skipped (no-begin, rolled back, untracked)
    n_txn_committed: int = 0
    n_txn_rolled_back: int = 0
    n_txn_dropped_no_begin: int = 0
    # the committed op stream (W6 wire-mirror expectation): every surviving
    # tracked DML in commit order, chunk patches applied
    emitted: list = field(default_factory=list)

    def as_records(self) -> list[dict]:
        out = []
        for (conv_id, turn_idx), cols in sorted(self.rows.items()):
            rec = {"conv_id": conv_id, "turn_idx": turn_idx}
            for c in self.columns:
                rec[c] = cols.get(c)
            out.append(rec)
        return out


def replay(
    events: list[dict],
    tracked_tables: set[str] | None = None,
    initial_columns: list[str] | None = None,
    schema_columns_by_version: dict[int, list[str]] | None = None,
    initial_rows: dict | None = None,
) -> ReplayResult:
    """events: list of dicts shaped like CHANGE_EVENT_SCHEMA rows, any order
    (sorted here by scn)."""
    tracked = tracked_tables or {"transcripts"}
    columns = list(initial_columns or ["role", "text", "tool", "ts"])
    versions = dict(schema_columns_by_version or {})
    versions.setdefault(0, list(columns))

    table: dict = dict(initial_rows or {})
    txns: dict[str, _Txn] = {}
    n_applied = {"ins": 0, "upd": 0, "del": 0}
    n_skipped = 0
    n_commit = n_rb = n_nobegin = 0
    emitted: list = []

    for ev in sorted(events, key=lambda e: e["scn"]):
        op = ev["op"]
        xid = ev["xid"]
        if op == "begin":
            txns.setdefault(xid, _Txn()).has_begin = True
        elif op in ("ins", "upd", "del", "chunk", "ddl"):
            txns.setdefault(xid, _Txn()).ops.append(dict(ev, _popped=False))
        elif op == "prollback":
            # pop last unpopped DML on same (table, key) in this txn
            # (Transaction.cpp:73-148 rollbackLastOp searches from the end)
            t = txns.setdefault(xid, _Txn())
            key = (ev.get("table_name"), ev.get("conv_id"), ev.get("turn_idx"))
            for prior in reversed(t.ops):
                if (
                    not prior["_popped"]
                    and prior["op"] in ("ins", "upd", "del")
                    and (prior.get("table_name"), prior.get("conv_id"), prior.get("turn_idx")) == key
                ):
                    prior["_popped"] = True
                    break
        elif op == "rollback":
            t = txns.pop(xid, _Txn())
            n_rb += 1
            n_skipped += sum(1 for o in t.ops if o["op"] in ("ins", "upd", "del"))
        elif op == "commit":
            t = txns.pop(xid, _Txn())
            if not t.has_begin:
                # txn began before feed start → dropped whole
                # (Parser.cpp:865-872)
                n_nobegin += 1
                n_skipped += sum(1 for o in t.ops if o["op"] in ("ins", "upd", "del"))
                continue
            n_commit += 1
            _apply_txn(t, table, tracked, columns, versions, n_applied,
                       skipped=lambda: None,
                       emitted=emitted, xid=xid,
                       commit_scn=ev.get("commit_scn"))
            # count skipped untracked within _apply_txn via closure is
            # awkward; recount here:
            n_skipped += sum(
                1 for o in t.ops
                if o["op"] in ("ins", "upd", "del") and not o["_popped"]
                and o.get("table_name") not in tracked
            )
            # DDL inside this txn applies after its DML (the engine's
            # segment fence puts same-commit DML in the pre-DDL segment)
            for o in t.ops:
                if o["op"] == "ddl":
                    parts = (o.get("ddl_stmt") or "").split()
                    verb = parts[0].upper() if parts else ""
                    if verb == "TRUNCATE":
                        table.clear()
                        continue
                    new_ver = o["schema_version"] + 1
                    if new_ver in versions:
                        columns[:] = versions[new_ver]
                    elif verb == "ADD" and len(parts) >= 3:
                        # "ADD COLUMN <name> <type>"
                        columns.append(parts[2])
                        versions[new_ver] = list(columns)
                    elif verb == "DROP" and len(parts) >= 3:
                        # "DROP COLUMN <name>"
                        if parts[2] in columns:
                            columns.remove(parts[2])
                        versions[new_ver] = list(columns)
        # other ops ignored

    return ReplayResult(
        rows=table,
        columns=columns,
        n_applied=n_applied,
        n_skipped=n_skipped,
        n_txn_committed=n_commit,
        n_txn_rolled_back=n_rb,
        n_txn_dropped_no_begin=n_nobegin,
        emitted=emitted,
    )


def _apply_txn(t: _Txn, table: dict, tracked, columns, versions, n_applied, skipped,
               emitted=None, xid=None, commit_scn=None):
    ops = [o for o in t.ops if not o["_popped"]]

    # chunk reassembly: chunks for a key concat in (seq_in_txn, chunk_no)
    # order and become the text of the LAST surviving ins/upd on that key
    # (LobCtx page-map analog; our text column plays the CLOB role)
    chunks: dict = {}
    for o in ops:
        if o["op"] == "chunk":
            key = (o.get("table_name"), o["conv_id"], o["turn_idx"])
            chunks.setdefault(key, []).append(o)
    for key, cs in chunks.items():
        cs.sort(key=lambda o: (o["seq_in_txn"], o.get("chunk_no") or 0))
        text = "".join(c["chunk_text"] or "" for c in cs)
        target = None
        for o in ops:
            if o["op"] in ("ins", "upd") and (o.get("table_name"), o["conv_id"], o["turn_idx"]) == key:
                target = o
        if target is not None:
            after = dict(target.get("after") or {})
            after["text"] = text
            target["after"] = after
            cc = list(target.get("changed_cols") or [])
            if "text" not in cc:
                cc.append("text")
            target["changed_cols"] = cc

    for o in ops:
        if o["op"] not in ("ins", "upd", "del"):
            continue
        if o.get("table_name") not in tracked:
            continue
        if emitted is not None:
            emitted.append(
                {
                    "xid": xid,
                    "commit_scn": commit_scn,
                    "seq_in_txn": o["seq_in_txn"],
                    "op": o["op"],
                    "table_name": o.get("table_name"),
                    "conv_id": o["conv_id"],
                    "turn_idx": o["turn_idx"],
                    "after": o.get("after"),
                    "changed_cols": o.get("changed_cols"),
                }
            )
        key = (o["conv_id"], o["turn_idx"])
        if o["op"] == "del":
            if key in table:
                del table[key]
                n_applied["del"] += 1
            continue
        after = o.get("after") or {}
        changed = [c for c in (o.get("changed_cols") or []) if c in columns]
        if o["op"] == "ins":
            # insert defines the whole row: unset active columns → NULL
            row = {c: None for c in columns}
            for c in changed:
                row[c] = after.get(c)
            table[key] = row
            n_applied["ins"] += 1
        else:  # upd — upsert semantics on missing key
            row = table.get(key)
            if row is None:
                row = {c: None for c in columns}
                table[key] = row
            for c in changed:
                row[c] = after.get(c)
            n_applied["upd"] += 1


# ---------------------------------------------------------------------------
# Multi-table replay (reference: multi-table.sql / rac-concurrent-tables
# fixtures; Schema::buildMaps routing, src/metadata/Schema.h:129-132)
# ---------------------------------------------------------------------------

@dataclass
class MultiReplayResult:
    tables: dict               # name -> {"rows": {(conv,turn): {col: v}}, "columns": [...]}
    n_skipped: int             # DML skipped (no-begin, rolled back, unregistered table)
    n_txn_committed: int = 0
    n_txn_rolled_back: int = 0

    def as_records(self, name: str) -> list[dict]:
        t = self.tables[name]
        out = []
        for (conv_id, turn_idx), cols in sorted(t["rows"].items()):
            rec = {"conv_id": conv_id, "turn_idx": turn_idx}
            for c in t["columns"]:
                rec[c] = cols.get(c)
            out.append(rec)
        return out


def replay_multi(
    events: list[dict],
    initial_tables: dict[str, list[str]] | None = None,
    default_table: str | None = None,
    auto_register: bool = False,
) -> MultiReplayResult:
    """Sequential multi-table oracle: one event at a time in SCN order;
    registry evolves via CREATE/DROP TABLE DDL; DML routes to its table's
    own key space.  DDL verbs mirror streaming/multi.parse_ddl.  DML whose
    table has no registry entry at its COMMIT position is skipped (the
    reference's 'no dictionary entry' path) — unless ``auto_register``
    (the adaptive-schema mode, Metadata::loadAdaptiveSchema analog):
    an unregistered table sighted in committed DML registers itself with
    the default columns before the transaction applies."""
    from .streaming.multi import parse_ddl

    tables: dict = {
        name: {"rows": {}, "columns": list(cols)}
        for name, cols in (initial_tables or {"transcripts": ["role", "text", "tool", "ts"]}).items()
    }
    if default_table is None:
        default_table = sorted(tables)[0] if tables else None

    txns: dict[str, _Txn] = {}
    n_skipped = 0
    n_commit = n_rb = 0

    def apply_committed(t: _Txn):
        nonlocal n_skipped
        if auto_register:
            # sighting-based (pre-savepoint-pop), matching the engine's
            # stats-driven registration over all committed DML
            for o in t.ops:
                tn = o.get("table_name")
                if o["op"] in ("ins", "upd", "del") and tn and tn not in tables:
                    tables[tn] = {"rows": {}, "columns": ["role", "text", "tool", "ts"]}
        ops = [o for o in t.ops if not o["_popped"]]

        # chunk reassembly per (table, key), exactly like single-table
        chunks: dict = {}
        for o in ops:
            if o["op"] == "chunk":
                key = (o.get("table_name"), o["conv_id"], o["turn_idx"])
                chunks.setdefault(key, []).append(o)
        for key, cs in chunks.items():
            cs.sort(key=lambda o: (o["seq_in_txn"], o.get("chunk_no") or 0))
            text = "".join(c["chunk_text"] or "" for c in cs)
            target = None
            for o in ops:
                if o["op"] in ("ins", "upd") and (
                    o.get("table_name"), o["conv_id"], o["turn_idx"]
                ) == key:
                    target = o
            if target is not None:
                after = dict(target.get("after") or {})
                after["text"] = text
                target["after"] = after
                cc = list(target.get("changed_cols") or [])
                if "text" not in cc:
                    cc.append("text")
                target["changed_cols"] = cc

        # DML first, DDL after — the engine's segment fence puts a txn's
        # DML in the pre-DDL segment (apply.py boundary is <= ddl commit scn)
        for o in ops:
            if o["op"] not in ("ins", "upd", "del"):
                continue
            tname = o.get("table_name")
            if tname not in tables:
                n_skipped += 1
                continue
            tbl = tables[tname]
            key = (o["conv_id"], o["turn_idx"])
            if o["op"] == "del":
                tbl["rows"].pop(key, None)
                continue
            after = o.get("after") or {}
            changed = [c for c in (o.get("changed_cols") or []) if c in tbl["columns"]]
            if o["op"] == "ins":
                row = {c: None for c in tbl["columns"]}
                for c in changed:
                    row[c] = after.get(c)
                tbl["rows"][key] = row
            else:
                row = tbl["rows"].setdefault(key, {c: None for c in tbl["columns"]})
                for c in changed:
                    row[c] = after.get(c)

        for o in ops:
            if o["op"] != "ddl":
                continue
            verb, name, arg = parse_ddl(o.get("ddl_stmt") or "", default_table)
            if verb == "create" and name and name not in tables:
                cols = [c for c, _t in (arg or [])] or ["role", "text", "tool", "ts"]
                tables[name] = {"rows": {}, "columns": cols}
            elif verb == "drop" and name in tables:
                del tables[name]
            elif verb == "add_col" and name in tables:
                if arg[0] not in tables[name]["columns"]:
                    tables[name]["columns"].append(arg[0])
            elif verb == "drop_col" and name in tables:
                if arg in tables[name]["columns"]:
                    tables[name]["columns"].remove(arg)
            elif verb == "truncate" and name in tables:
                tables[name]["rows"].clear()

    for ev in sorted(events, key=lambda e: e["scn"]):
        op = ev["op"]
        xid = ev["xid"]
        if op == "begin":
            txns.setdefault(xid, _Txn()).has_begin = True
        elif op in ("ins", "upd", "del", "chunk", "ddl"):
            txns.setdefault(xid, _Txn()).ops.append(dict(ev, _popped=False))
        elif op == "prollback":
            t = txns.setdefault(xid, _Txn())
            key = (ev.get("table_name"), ev.get("conv_id"), ev.get("turn_idx"))
            for prior in reversed(t.ops):
                if (
                    not prior["_popped"]
                    and prior["op"] in ("ins", "upd", "del")
                    and (prior.get("table_name"), prior.get("conv_id"), prior.get("turn_idx")) == key
                ):
                    prior["_popped"] = True
                    break
        elif op == "rollback":
            t = txns.pop(xid, _Txn())
            n_rb += 1
            n_skipped += sum(1 for o in t.ops if o["op"] in ("ins", "upd", "del"))
        elif op == "commit":
            t = txns.pop(xid, _Txn())
            if not t.has_begin:
                n_skipped += sum(1 for o in t.ops if o["op"] in ("ins", "upd", "del"))
                continue
            n_commit += 1
            apply_committed(t)

    return MultiReplayResult(
        tables=tables,
        n_skipped=n_skipped,
        n_txn_committed=n_commit,
        n_txn_rolled_back=n_rb,
    )
