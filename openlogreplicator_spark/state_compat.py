"""Reference state-directory compatibility: ``<db>-chkpt-<scn>.json``.

The reference persists its restart position and schema dictionary as
checkpoint files named ``<database>-chkpt-<scn>.json`` in the state
directory (writer ``src/metadata/Metadata.cpp:457-510``, selection on
restart ``Metadata.cpp:511-617``, JSON layout
``src/metadata/SerializerJson.cpp:52-560`` with the strict field
vocabulary of ``SerializerJson.cpp:560-850``).  This module reads and
writes that exact layout so a deployment can migrate between the
reference and this engine in EITHER direction without replaying history:

* **import** — ``resume_position`` resolves the restart scn the way
  ``Metadata::readCheckpoints`` does (newest checkpoint, bounded by the
  requested start scn when one is given; ``min-tran`` position preferred
  over the top-level one, ``SerializerJson.cpp:624-641``), so a job
  pointed at a reference state dir continues where the reference left
  off.
* **export** — ``write_reference_checkpoint`` emits a structurally
  complete file: every field the reference's strict ``checkJsonFields``
  walk demands, including a minimal synthesized SYS dictionary
  (SYS.USER$/OBJ$/COL$/TAB$ rows for the tracked tables, empty arrays
  for the partition/LOB packs our typed feed never populates) — enough
  for ``deserialize(loadMetadata=true, loadSchema=true)`` to accept the
  file and rebuild the table map, so the user can hand the state dir
  BACK to the reference.

Everything here is driver-side metadata (a checkpoint file is O(schema),
not O(data)); no Spark job is involved, so it adds nothing to the
per-epoch cost at any scale.
"""

from __future__ import annotations

import json
import os
import re


_ROWID_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

# SysCol::COLTYPE codes (reference src/system/SysCol.h): VARCHAR2=1,
# NUMBER=2, DATE=12, RAW=23, CHAR=96, CLOB=112, BLOB=113, TIMESTAMP=180.
# (type, length, precision, scale); integer widths ride NUMBER
# precision/scale the way Oracle DDL does (NUMBER(10)=int, NUMBER(19)=
# long), so an export→import round trip preserves the Spark type.
# boolean exports as NUMBER(1) and imports as int — the one documented
# lossy pair (Oracle pre-23c has no boolean column type).
_ORACLE_TYPE = {
    "string": (1, 4000, -1, -1),
    "int": (2, 22, 10, 0),
    "long": (2, 22, 19, 0),
    "bigint": (2, 22, 19, 0),
    "double": (2, 22, -1, -1),
    "float": (2, 22, -1, -1),
    "boolean": (2, 22, 1, 0),
    "decimal": (2, 22, 38, 10),
    "date": (12, 7, -1, -1),
    "timestamp": (180, 11, -1, -1),
    "binary": (23, 2000, -1, -1),
}


def _spark_type(otype: int, precision: int, scale: int) -> str:
    """SysCol (type, precision, scale) -> Spark type string; the reverse
    of ``_ORACLE_TYPE`` for files WE wrote, and the natural projection
    for files the reference wrote from a real database (value-decode
    twin: functions/decode.py P4/P6 map the same classes)."""
    if otype in (1, 96, 112):          # VARCHAR2 / CHAR / CLOB
        return "string"
    if otype == 12:                    # DATE
        return "date"
    if otype in (180, 181, 231):       # TIMESTAMP [WITH [LOCAL] TZ]
        return "timestamp"
    if otype in (23, 24, 113):         # RAW / LONG RAW / BLOB
        return "binary"
    if otype == 2:                     # NUMBER(p,s)
        if scale == 0:
            return "int" if 0 <= precision <= 10 else "long"
        return "double"
    return "string"                    # unknown classes decode as text

_CHKPT_RE = re.compile(r"^(?P<db>.+)-chkpt-(?P<scn>\d+)\.json$")


def _rowid(data_obj: int, row_no: int) -> str:
    """18-char OOOOOOFFFBBBBBBRRR surrogate, same base-64 alphabet as
    ``functions.decode.encode_rowid`` (RowId.h:71-120), driver-side."""
    out = []
    for value, n in ((data_obj, 6), (0, 9), (row_no, 3)):
        for i in range(n - 1, -1, -1):
            out.append(_ROWID_ALPHABET[(value >> (6 * i)) & 63])
    return "".join(out)


def synthesize_dictionary(
    tables: list[tuple[str, str, list[tuple[str, str]]]],
    base_obj: int = 100000,
) -> dict:
    """Minimal SYS dictionary for ``(owner, table, [(col, sparktype)])``.

    Object numbers are deterministic (``base_obj + index``) so repeated
    exports of the same registry produce byte-identical files.  Field
    values mirror what the reference requires structurally:
    2-element IntX arrays for spare1/flags/property
    (SerializerJson.cpp:851-1340), ``seg-col``/``int-col`` equal to the
    1-based column position (no hidden/virtual columns in a typed feed),
    charset 873 (AL32UTF8) for character columns.
    """
    owners: dict[str, int] = {}
    sys_user, sys_obj, sys_col, sys_tab = [], [], [], []
    for i, (owner, table, columns) in enumerate(tables):
        if owner not in owners:
            uid = 100 + len(owners)
            owners[owner] = uid
            sys_user.append({
                "row-id": _rowid(uid, 1), "user": uid, "name": owner,
                "spare1": [0, 0], "single": 0,
            })
        obj = base_obj + i
        sys_obj.append({
            "row-id": _rowid(obj, 1), "owner": owners[owner], "obj": obj,
            "data-obj": obj, "type": 2,  # SysObj::OBJTYPE::TABLE
            "name": table, "flags": [0, 0], "single": 0,
        })
        sys_tab.append({
            "row-id": _rowid(obj, 2), "obj": obj, "data-obj": obj, "ts": 4,
            "clu-cols": 0, "flags": [0, 0], "property": [536870912, 0],
        })
        for c, (name, coltype) in enumerate(columns, start=1):
            otype, length, precision, scale = _ORACLE_TYPE.get(
                coltype.split("(")[0].lower(), (1, 4000, -1, -1))
            charform = 1 if otype in (1, 96, 112) else 0
            sys_col.append({
                "row-id": _rowid(obj, 2 + c), "obj": obj, "col": c,
                "seg-col": c, "int-col": c, "name": name, "type": otype,
                "length": length, "precision": precision, "scale": scale,
                "charset-form": charform,
                "charset-id": 873 if charform else 0,
                "null": 1, "property": [0, 0],
            })
    return {"sys-user": sys_user, "sys-obj": sys_obj, "sys-col": sys_col,
            "sys-tab": sys_tab}


def checkpoint_doc(
    database: str,
    scn: int,
    seq: int,
    *,
    offset: int = 0,
    time: int = 0,
    threads: list[dict] | None = None,
    min_tran: dict | None = None,
    tables: list[tuple[str, str, list[tuple[str, str]]]] | None = None,
    schema_ref_scn: int | None = None,
    con_id: int = 0,
    db_id: int = 0,
) -> dict:
    """Reference-shaped checkpoint document (SerializerJson::serialize
    field-for-field; header SerializerJson.cpp:52-100).

    ``offset`` must be a multiple of 512 (MIN_BLOCK_SIZE, enforced by the
    reference at SerializerJson.cpp:645).  Exactly one of ``tables``
    (store the schema inline, ``schema-scn``) or ``schema_ref_scn``
    (point at an earlier checkpoint that stored it, the reference's
    schema-interval optimization) shapes the schema section.
    """
    if offset % 512:
        raise ValueError(f"offset {offset} is not a multiple of 512")
    doc: dict = {
        "database": database, "scn": int(scn), "resetlogs": 1,
        "activation": 0, "time": int(time), "seq": int(seq),
        "offset": int(offset),
    }
    if threads:
        doc["threads"] = [
            {"thread": int(t["thread"]), "seq": int(t["seq"]),
             "offset": int(t.get("offset", 0)),
             **({"lwn-scn": int(t["lwn-scn"])} if "lwn-scn" in t else {})}
            for t in threads
        ]
    if min_tran is not None:
        doc["min-tran"] = {
            "thread": int(min_tran.get("thread", 1)),
            "seq": int(min_tran["seq"]),
            "offset": int(min_tran.get("offset", 0)),
            "xid": str(min_tran.get("xid", "0x0000.000.00000000")),
        }
    owners = sorted({o for o, _, _ in (tables or [])})
    doc.update({
        "big-endian": 0, "context": "", "db-id": int(db_id),
        "con-id": int(con_id), "con-name": "", "db-timezone": "+00:00",
        "db-recovery-file-dest": "", "db-block-checksum": "FALSE",
        "log-archive-format": "o1_mf_%t_%s_%h_.arc", "log-archive-dest": "",
        "nls-character-set": "AL32UTF8",
        "nls-nchar-character-set": "AL16UTF16",
        "supp-log-db-primary": 1, "supp-log-db-all": 1,
        "online-redo": [], "incarnations": [], "users": owners,
    })
    if schema_ref_scn is not None:
        doc["schema-ref-scn"] = int(schema_ref_scn)
    else:
        doc["schema-scn"] = int(scn)
        doc.update(synthesize_dictionary(tables or []))
        for pack in ("sys-ccol", "sys-cdef", "sys-deferredstg", "sys-ecol",
                     "sys-lob", "sys-lob-comp-part", "sys-lob-frag",
                     "sys-tabpart", "sys-tabcompart", "sys-tabsubpart",
                     "sys-ts"):
            doc.setdefault(pack, [])
        doc["sys-ts"] = [{"row-id": _rowid(4, 1), "ts": 4, "name": "USERS",
                          "block-size": 8192}]
    return doc


def write_reference_checkpoint(state_dir: str, doc: dict) -> str:
    """Atomically write ``<database>-chkpt-<scn>.json`` (tmp+rename, the
    same no-torn-file property the reference gets from StateDisk)."""
    os.makedirs(state_dir, exist_ok=True)
    name = f"{doc['database']}-chkpt-{doc['scn']}.json"
    path = os.path.join(state_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
    os.replace(tmp, path)
    return path


def list_checkpoints(state_dir: str, database: str) -> list[int]:
    """Ascending checkpoint scns for ``database`` (readCheckpoints's
    name scan, Metadata.cpp:518-537; non-matching files ignored)."""
    if not os.path.isdir(state_dir):
        return []
    out = []
    for name in os.listdir(state_dir):
        m = _CHKPT_RE.match(name)
        if m and m.group("db") == database:
            out.append(int(m.group("scn")))
    return sorted(out)


def read_reference_checkpoint(state_dir: str, database: str, scn: int) -> dict:
    with open(os.path.join(state_dir, f"{database}-chkpt-{scn}.json")) as f:
        return json.load(f)


def tables_from_checkpoint(doc: dict) -> list[tuple[str, str, list[tuple[str, str]]]]:
    """Table definitions from a checkpoint's SYS dictionary:
    ``[(owner, table, [(column, spark_type)])]``.

    The inverse of ``synthesize_dictionary``, and the migration entry
    point for checkpoints the REFERENCE wrote: sys-obj rows of type 2
    (TABLE) joined to their owner's sys-user name, columns ordered by
    ``seg-col`` exactly as ``Schema::buildMaps`` orders them; hidden /
    virtual columns (seg-col 0 in real dictionaries) are skipped the way
    the reference skips them for column counting."""
    users = {u["user"]: u["name"] for u in doc.get("sys-user", [])}
    cols: dict[int, list] = {}
    for c in doc.get("sys-col", []):
        if int(c.get("seg-col", 0)) <= 0:
            continue
        cols.setdefault(int(c["obj"]), []).append(c)
    out = []
    for o in doc.get("sys-obj", []):
        if int(o.get("type", 0)) != 2:
            continue
        obj = int(o["obj"])
        ordered = sorted(cols.get(obj, []), key=lambda c: int(c["seg-col"]))
        out.append((
            users.get(int(o["owner"]), "UNKNOWN"),
            o["name"],
            [(c["name"], _spark_type(int(c["type"]), int(c.get("precision", -1)),
                                     int(c.get("scale", -1))))
             for c in ordered],
        ))
    return out


def resume_position(
    state_dir: str, database: str, start_scn: int | None = None,
) -> dict | None:
    """Resolve the restart position from a (possibly reference-written)
    state directory, or None when no checkpoint applies.

    Mirrors ``Metadata::readCheckpoints`` + the deserializer's position
    rules: newest checkpoint wins, bounded above by ``start_scn`` when
    given (Metadata.cpp:547-556); the redo READING position is
    ``min-tran``'s seq/offset when present (oldest in-flight transaction,
    SerializerJson.cpp:624-632) else the top-level seq/offset; data at or
    below the checkpoint scn has already been delivered downstream, so
    the DATA gate is ``scn > checkpoint scn``.

    Returns ``{"scn", "seq", "offset", "min_xid", "threads", "tables"}``;
    ``tables`` is the imported schema (``tables_from_checkpoint``) — when
    the selected file carries ``schema-ref-scn`` instead of an inline
    schema, the referenced checkpoint is chased for it, exactly the
    two-file read of ``Metadata::readCheckpoint`` (Metadata.cpp:586-613);
    None when neither file yields one.
    """
    scns = list_checkpoints(state_dir, database)
    if start_scn is not None:
        scns = [s for s in scns if s <= start_scn]
    if not scns:
        return None
    doc = read_reference_checkpoint(state_dir, database, scns[-1])
    tables = None
    if "schema-scn" in doc:
        tables = tables_from_checkpoint(doc) or None
    elif "schema-ref-scn" in doc:
        try:
            ref = read_reference_checkpoint(state_dir, database,
                                            int(doc["schema-ref-scn"]))
            tables = tables_from_checkpoint(ref) or None
        except (OSError, ValueError, KeyError):
            tables = None
    mt = doc.get("min-tran")
    return {
        "scn": int(doc["scn"]),
        "seq": int(mt["seq"] if mt else doc["seq"]),
        "offset": int(mt["offset"] if mt else doc.get("offset", 0)),
        "min_xid": (mt or {}).get("xid"),
        "threads": doc.get("threads", []),
        "tables": tables,
    }


def delete_old_checkpoints(
    state_dir: str, database: str, keep: int = 100,
) -> list[int]:
    """Prune old checkpoint files, keeping the newest ``keep`` — and
    never pruning past the newest file that still STORES a schema, so a
    surviving ``schema-ref-scn`` pointer can always be chased
    (Metadata::deleteOldCheckpoints, Metadata.cpp:617-660).  Returns the
    scns dropped."""
    scns = list_checkpoints(state_dir, database)
    dropped = []
    found_schema = False
    for num, scn in enumerate(reversed(scns), start=1):
        if num < keep:
            continue
        if not found_schema:
            doc = read_reference_checkpoint(state_dir, database, scn)
            if "schema-scn" in doc:
                found_schema = True
            continue
        os.remove(os.path.join(state_dir, f"{database}-chkpt-{scn}.json"))
        dropped.append(scn)
    return dropped
