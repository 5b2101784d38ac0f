"""Reference-config compatibility layer — OpenLogReplicator.json → this engine.

The reference is configured entirely through one JSON file
(``scripts/OpenLogReplicator-example*.json``; parsed and strictly validated
in /root/reference/src/OpenLogReplicator.cpp:180-1230).  This module parses
the SAME schema — same section names, same allowed-field lists, same
reader/writer/format type vocabulary, same row-condition mini-language —
and maps it onto this engine's job parameters, so an existing config file
runs here with ``job.py config --file OpenLogReplicator.json``:

    source[].reader.type  batch            -> replay_batch (bounded epoch)
                          offline          -> run_stream (availableNow drain,
                                              or continuous with --continuous)
                          online           -> same, when redo-log paths are
                                              given; a ``server`` connection
                                              needs a live Oracle -> error
    source[].reader.redo-log               -> feed path(s)
    source[].reader.start-scn / start-seq  -> pushed-down scan gate
    source[].format.type  json | protobuf | debezium -> wire egress format
                          (W6 / W7; debezium = the reference's dial preset
                          over the JSON builder, OpenLogReplicator.cpp:695)
    source[].filter.table[]                -> tracked pattern or Catalog
                                              tables; per-entry ``key`` ->
                                              lake key columns, ``condition``
                                              -> translated row predicate
    source[].filter.skip-xid / dump-xid    -> skip_xid_filter / dump trace
    source[].transaction-max-mb            -> max_txn_ops cap (see below)
    state.path                             -> checkpoint + default lake root
    state.keep-checkpoints                 -> vacuum(retain_last=N)
    metrics.type prometheus                -> MetricsRecorder (metrics table)
    target[].writer.type  file             -> JSON mirror egress (W6)
                          network          -> protobuf spool + net-serve bind
                          kafka            -> Kafka sink rows (W3 format
                                              layer; transport needs the jar)
                          discard          -> no egress (W5)
                          zeromq           -> unsupported here (no libzmq)

Fields that configure the reference's manual memory management (``memory``,
buffer sizes, sleeps) have no analog — Spark manages memory and
scheduling — and are accepted but recorded in ``JobPlan.ignored`` instead
of silently dropped.  ``source.flags`` (Ctx.h:86-105 REDO_FLAGS) is
decoded bit-by-bit: SCHEMALESS, ADAPTIVE_SCHEMA, and CHECKPOINT_KEEP are
honored (untracked DML on the wire / multi-table self-registration /
no checkpoint pruning); other set bits are reported by name.  Unknown fields are an error, exactly like the
reference's ``Ctx::checkJsonFields`` (unless ``strict=False``).

The row-condition mini-language (``!([op] == 'd' && [login username] ==
'USER1')``; tokenizer in /root/reference/src/common/expression/
Expression.cpp:27-143, evaluation in BoolValue.cpp / StringValue.cpp) is
translated to a Spark SQL boolean expression: ``[op]`` is the one-char
operation code ('i'/'u'/'d' — Builder.cpp calls matchesCondition with the
op char), ``[name]`` is a session-attribute lookup that yields '' when the
attribute is absent, string compares throughout.  The translated predicate
is a Catalyst-pushable filter — no interpreter in the hot path.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

__all__ = [
    "ConfigError",
    "JobPlan",
    "TableRule",
    "load_config",
    "plan_from_config",
    "run_from_config",
    "translate_condition",
]


class ConfigError(ValueError):
    """Invalid or unsupported OpenLogReplicator.json content (the analog of
    the reference's ConfigurationException error 30001)."""


# ---------------------------------------------------------------------------
# Allowed-field lists — copied VOCABULARY (not code) from the strict schema
# check in /root/reference/src/OpenLogReplicator.cpp (checkJsonFields call
# sites at lines 196, 263, 373, 431, 486, 514, 694, 1130).
# ---------------------------------------------------------------------------

_TOP_FIELDS = {"dump-path", "dump-raw-data", "dump-redo-log", "log-level",
               "memory", "metrics", "source", "state", "target", "trace",
               "version"}
_MEMORY_FIELDS = {"max-mb", "min-mb", "read-buffer-max-mb",
                  "read-buffer-min-mb", "swap-mb", "swap-path",
                  "unswap-buffer-min-mb", "write-buffer-max-mb",
                  "write-buffer-min-mb"}
_METRICS_FIELDS = {"bind", "tag-names", "type"}
_STATE_FIELDS = {"interval-mb", "interval-s", "keep-checkpoints", "path",
                 "schema-force-interval", "type"}
_SOURCE_FIELDS = {"alias", "arch", "arch-read-sleep-us", "arch-read-tries",
                  "debug", "filter", "flags", "format", "memory", "name",
                  "reader", "redo-read-sleep-us", "redo-verify-delay-us",
                  "refresh-interval-us", "state", "transaction-max-mb"}
_READER_FIELDS = {"db-timezone", "disable-checks", "host-timezone",
                  "log-archive-format", "log-timezone", "password",
                  "path-mapping", "redo-copy-path", "redo-log", "server",
                  "start-scn", "start-seq", "start-time", "start-time-rel",
                  "type", "user"}
_FORMAT_FIELDS = {"attributes", "char", "char-set", "column", "db",
                  "flush-buffer", "interval-dts", "interval-ytm", "message",
                  "rid", "redo-thread", "schema", "scn", "scn-type",
                  "timestamp", "timestamp-metadata", "timestamp-type",
                  "timestamp-tz", "type", "unknown", "unknown-type",
                  "user-type", "xid",
                  # extension (not in the reference vocabulary): reference-
                  # native header keys (scns/tms/c_scn/c_idx) on the wire
                  "native-keys"}
_FILTER_FIELDS = {"dump-xid", "separator", "skip-xid", "table"}
_TABLE_FIELDS = {"condition", "key", "owner", "table", "tag"}
_DEBUG_FIELDS = {"owner", "stop-checkpoints", "stop-log-switches",
                 "stop-transactions", "table"}
_TARGET_FIELDS = {"alias", "source", "writer"}
_WRITER_FIELDS = {"append", "max-file-size", "max-message-mb", "new-line",
                  "output", "poll-interval-us", "properties", "queue-size",
                  "timestamp-format", "topic", "type", "uri",
                  "write-buffer-flush-size", "brokers"}

# Reference knobs with no Spark analog: accepted, reported, not applied.
_IGNORED_SOURCE = {"arch-read-sleep-us", "arch-read-tries",
                   "memory", "redo-read-sleep-us", "redo-verify-delay-us",
                   "refresh-interval-us"}

# source.flags bit names (Ctx.h:86-105 REDO_FLAGS).  Three bits map onto
# engine behaviors and are HONORED: SCHEMALESS (untracked DML rides the
# wire untyped), ADAPTIVE_SCHEMA (multi-table: unregistered tables
# sighted in committed DML register themselves), CHECKPOINT_KEEP (never
# prune checkpoint history).  The rest describe byte-level decode or
# display choices the typed feed makes vacuous; set bits among them are
# reported by NAME in JobPlan.ignored.
_FLAG_NAMES = [
    "ARCH_ONLY", "SCHEMALESS", "ADAPTIVE_SCHEMA", "DIRECT_DISABLE",
    "IGNORE_DATA_ERRORS", "SHOW_DDL", "SHOW_HIDDEN_COLUMNS",
    "SHOW_GUARD_COLUMNS", "SHOW_NESTED_COLUMNS", "SHOW_UNUSED_COLUMNS",
    "SHOW_INCOMPLETE_TRANSACTIONS", "SHOW_SYSTEM_TRANSACTIONS",
    "SHOW_CHECKPOINT", "CHECKPOINT_KEEP", "VERIFY_SCHEMA",
    "RAW_COLUMN_DATA", "EXPERIMENTAL_XMLTYPE", "EXPERIMENTAL_JSON",
    "EXPERIMENTAL_NOT_NULL_MISSING",
]
_FLAG_SCHEMALESS = 1 << 1
_FLAG_ADAPTIVE_SCHEMA = 1 << 2
_FLAG_CHECKPOINT_KEEP = 1 << 13
_HONORED_FLAGS = (_FLAG_SCHEMALESS | _FLAG_ADAPTIVE_SCHEMA
                  | _FLAG_CHECKPOINT_KEEP)
_IGNORED_READER = {"db-timezone", "disable-checks", "host-timezone",
                   "log-archive-format", "log-timezone", "password",
                   "path-mapping", "redo-copy-path", "user",
                   "start-time", "start-time-rel"}

# transaction-max-mb -> max_txn_ops: the reference caps by buffered BYTES;
# this engine caps by op COUNT (T6).  One redo op here is a small struct +
# text payload — 256 B/op (4096 ops/MB) is the documented conversion; the
# point is a same-order-of-magnitude guard, not byte parity.
OPS_PER_MB = 4096


def _check_fields(section: str, obj: dict, allowed: set, strict: bool):
    if not strict:
        return
    unknown = set(obj) - allowed
    if unknown:
        raise ConfigError(
            f'bad JSON, unknown field(s) in "{section}": '
            + ", ".join(sorted(unknown)))


# ---------------------------------------------------------------------------
# Row-condition mini-language -> Spark SQL (also valid ANSI / DuckDB SQL)
# ---------------------------------------------------------------------------

_TOK_RE = re.compile(
    r"""\s*(?:
        (?P<lbr>\[(?P<ident>[^\]]*)\])     |
        (?P<str>'(?P<sval>[^']*)')         |
        (?P<num>[0-9][0-9.eE]*|\.[0-9][0-9.eE]*) |
        (?P<op>==|!=|&&|\|\||!)            |
        (?P<lp>\()                         |
        (?P<rp>\))
    )""",
    re.VERBOSE,
)


def _cond_tokens(cond: str) -> list[tuple[str, str]]:
    """Tokenize per the reference grammar (Expression.cpp:27-143):
    ``[identifier]`` (attribute name, or the special ``op``), single-quoted
    strings, numbers, ``== != && || !``, parentheses."""
    out, pos = [], 0
    while pos < len(cond):
        m = _TOK_RE.match(cond, pos)
        if m is None:
            if cond[pos:].strip() == "":
                break
            raise ConfigError(
                f"bad condition, unparsable at offset {pos}: {cond[pos:]!r}")
        pos = m.end()
        if m.group("lbr"):
            out.append(("ident", m.group("ident")))
        elif m.group("str") is not None:
            out.append(("str", m.group("sval")))
        elif m.group("num"):
            out.append(("num", m.group("num")))
        elif m.group("op"):
            out.append(("op", m.group("op")))
        elif m.group("lp"):
            out.append(("lp", "("))
        else:
            out.append(("rp", ")"))
    return out


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def translate_condition(cond: str, op_col: str = "op",
                        attrs_col: str = "attrs",
                        attrs_style: str = "map") -> str:
    """Translate a reference row condition to a SQL boolean expression.

    Semantics matched to BoolValue.cpp / StringValue.cpp evaluation:
    ``[op]`` -> the one-char op code (this engine's ops are 'ins'/'upd'/
    'del', so ``substr(op, 1, 1)`` IS the reference's 'i'/'u'/'d');
    ``[name]`` -> ``coalesce(attrs['name'], '')`` (absent attribute
    compares as empty string); numbers compare as their string form
    (Token::evaluateToString returns the literal text).

    ``attrs_style``: "map" (default) renders attribute lookups against the
    engine's ``attrs`` map column; "column" renders them as quoted plain
    column references (``coalesce("name", '')``) — portable to engines
    whose map subscript is not scalar-valued (DuckDB), used by the
    contract oracle so BOTH engines evaluate the same translated
    predicate shape.
    """
    toks = _cond_tokens(cond)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else (None, None)

    def take(kind=None, val=None):
        nonlocal pos
        k, v = peek()
        if k is None or (kind and k != kind) or (val and v != val):
            raise ConfigError(
                f"bad condition {cond!r}: expected {val or kind}, got {v!r}")
        pos += 1
        return v

    def operand() -> str:
        k, v = peek()
        if k == "ident":
            take()
            if v == "op":
                return f"substr({op_col}, 1, 1)"
            if attrs_style == "column":
                return 'coalesce("' + v.replace('"', '""') + "\", '')"
            return f"coalesce({attrs_col}[{_sq(v)}], '')"
        if k == "str":
            take()
            return _sq(v)
        if k == "num":
            take()
            return _sq(v)  # string-compare semantics
        raise ConfigError(f"bad condition {cond!r}: expected operand, got {v!r}")

    def primary() -> str:
        k, v = peek()
        if k == "op" and v == "!":
            take()
            return f"(NOT {primary()})"
        if k == "lp":
            take()
            e = or_expr()
            take("rp")
            return f"({e})"
        left = operand()
        k, v = peek()
        if k == "op" and v in ("==", "!="):
            take()
            right = operand()
            return f"({left} {'=' if v == '==' else '<>'} {right})"
        raise ConfigError(
            f"bad condition {cond!r}: operand {left} needs == or != comparison")

    def and_expr() -> str:
        e = primary()
        while peek() == ("op", "&&"):
            take()
            e = f"({e} AND {primary()})"
        return e

    def or_expr() -> str:
        e = and_expr()
        while peek() == ("op", "||"):
            take()
            e = f"({e} OR {and_expr()})"
        return e

    if not toks:
        return "true"
    result = or_expr()
    if pos != len(toks):
        raise ConfigError(f"bad condition {cond!r}: trailing tokens")
    return result


# ---------------------------------------------------------------------------
# Plan
# ---------------------------------------------------------------------------

_REGEX_CHARS = re.compile(r"[.*+?^$|()\[\]{}\\]")

# Key-column types when a filter entry names its own ``key`` columns: the
# reference learns types from the database dictionary; this engine's feed
# is typed, so only the known feed columns have non-string types.
_KEY_TYPES = {"conv_id": "string", "turn_idx": "int"}


@dataclass
class TableRule:
    """One ``filter.table[]`` entry, translated."""
    owner: str
    table: str                       # regex, as in the reference
    key_cols: list[tuple[str, str]] | None = None
    condition_sql: str | None = None
    tag: str | None = None
    is_literal: bool = False         # no regex metacharacters in ``table``


@dataclass
class JobPlan:
    """Everything run_from_config needs, extracted from one config file."""
    mode: str                        # "batch" | "stream"
    feed_paths: list[str]
    source_name: str = ""
    wire_format: str = "json"        # format.type
    wire: object | None = None       # WireFormat dials (format.message/scn/...)
    rules: list[TableRule] = field(default_factory=list)
    tracked_pattern: str = "^transcripts$"
    multi_tables: list[str] | None = None   # literal table set -> Catalog
    condition_sql: str | None = None        # combined per-table predicate
    skip_xids: list[str] = field(default_factory=list)
    dump_xids: list[str] = field(default_factory=list)
    start_scn: int | None = None
    start_seq: int | None = None
    stop_transactions: int | None = None   # debug.stop-transactions
    stop_log_switches: int | None = None   # debug.stop-log-switches
    max_txn_ops: int | None = None
    state_path: str | None = None
    keep_checkpoints: int | None = None
    schemaless: bool = False         # flags bit 1, REDO_FLAGS::SCHEMALESS
    adaptive_schema: bool = False    # flags bit 2, REDO_FLAGS::ADAPTIVE_SCHEMA
    checkpoint_keep_all: bool = False  # flags bit 13, REDO_FLAGS::CHECKPOINT_KEEP
    metrics: bool = False
    metrics_bind: str | None = None       # prometheus: "host:port" scrape addr
    metrics_tag_names: str = "none"       # none|filter|sys|all (Metrics.h)
    writer_type: str = "discard"
    writer_output: str | None = None        # file: output path
    writer_max_file_size: int = 0           # file: rotation size budget
    writer_timestamp_format: str = "%F_%T"  # file: %t mask strftime
    writer_new_line: int = 1                # file: 0 none / 1 LF / 2 CRLF
    writer_append: int = 1                  # file: resume vs next-number
    writer_uri: str | None = None           # network: bind host:port
    kafka_topic: str | None = None
    kafka_brokers: str | None = None
    ignored: list[str] = field(default_factory=list)

    def rotating_writer(self):
        """The reference-semantics rotating file sink when the config asks
        for one (rotation mask in ``output`` or ``max-file-size`` set);
        None when the plain distributed mirror is the egress."""
        if self.writer_type != "file":
            return None
        from .sources.file_writer import writer_from_plan

        return writer_from_plan(
            self.writer_output or "",
            timestamp_format=self.writer_timestamp_format,
            max_file_size=self.writer_max_file_size,
            new_line=self.writer_new_line,
            append=self.writer_append,
        )

    def pre_filter(self):
        """The config-driven predicate as one pushed-down DataFrame filter
        (skip-xid + start-scn/seq gate + per-table row conditions); None
        when the config carries none of them."""
        from pyspark.sql import functions as F

        parts = []
        if self.skip_xids:
            parts.append(~F.col("xid").isin(self.skip_xids))
        if self.start_scn is not None:
            parts.append(F.col("scn") >= self.start_scn)
        if self.start_seq is not None:
            parts.append(F.col("seq") >= self.start_seq)
        if self.condition_sql:
            # Conditions only guard DML rows; control ops always pass
            # (the reference evaluates matchesCondition per i/u/d emit).
            parts.append(F.expr(
                f"op NOT IN ('ins', 'upd', 'del') OR ({self.condition_sql})"))
        if not parts:
            return None
        pred = parts[0]
        for p in parts[1:]:
            pred = pred & p

        def _filter(df):
            return df.filter(pred)

        return _filter


def load_config(source: str | dict, strict: bool = True) -> dict:
    """Parse + validate an OpenLogReplicator.json document (path, JSON
    string, or already-parsed dict).  Validation mirrors the reference's
    checkJsonFields: unknown fields raise, known-but-inapplicable fields
    pass through (plan_from_config reports them as ignored)."""
    if isinstance(source, dict):
        cfg = source
    elif os.path.exists(source):
        with open(source) as f:
            cfg = json.load(f)
    else:
        cfg = json.loads(source)
    if not isinstance(cfg, dict):
        raise ConfigError("bad JSON: top level must be an object")

    _check_fields("(top level)", cfg, _TOP_FIELDS, strict)
    if "version" not in cfg:
        raise ConfigError('bad JSON, missing "version"')
    for sec, fields_ in (("memory", _MEMORY_FIELDS), ("metrics", _METRICS_FIELDS),
                         ("state", _STATE_FIELDS)):
        if sec in cfg:
            _check_fields(sec, cfg[sec], fields_, strict)

    sources = cfg.get("source", [])
    if len(sources) != 1:
        raise ConfigError(
            f'bad JSON, invalid "source" value: {len(sources)} elements, '
            "expected: 1 element")
    src = sources[0]
    _check_fields("source", src, _SOURCE_FIELDS, strict)
    for key in ("alias", "name", "reader", "format"):
        if key not in src:
            raise ConfigError(f'bad JSON, missing "{key}" in source')
    _check_fields("reader", src["reader"], _READER_FIELDS, strict)
    _check_fields("format", src["format"], _FORMAT_FIELDS, strict)
    if "filter" in src:
        _check_fields("filter", src["filter"], _FILTER_FIELDS, strict)
        for t in src["filter"].get("table", []):
            _check_fields("filter.table", t, _TABLE_FIELDS, strict)
    if "debug" in src:
        _check_fields("debug", src["debug"], _DEBUG_FIELDS, strict)

    targets = cfg.get("target", [])
    if len(targets) != 1:
        raise ConfigError(
            f'bad JSON, invalid "target" value: {len(targets)} elements, '
            "expected: 1 element")
    tgt = targets[0]
    _check_fields("target", tgt, _TARGET_FIELDS, strict)
    if "writer" not in tgt:
        raise ConfigError('bad JSON, missing "writer" in target')
    _check_fields("writer", tgt["writer"], _WRITER_FIELDS, strict)
    if tgt.get("source", src["alias"]) != src["alias"]:
        raise ConfigError(
            f'bad JSON, target source "{tgt.get("source")}" does not match '
            f'source alias "{src["alias"]}"')
    return cfg


def plan_from_config(cfg: str | dict, strict: bool = True) -> JobPlan:
    """Translate a validated config into a JobPlan."""
    cfg = load_config(cfg, strict=strict)
    src = cfg["source"][0]
    reader = src["reader"]
    fmt = src["format"]
    writer = cfg["target"][0]["writer"]
    ignored: list[str] = []

    # ---- reader ----------------------------------------------------------
    rtype = reader.get("type")
    if rtype not in ("online", "offline", "batch"):
        raise ConfigError(
            f'bad JSON, invalid "type" value: {rtype}, expected: one of '
            '{"online", "offline", "batch"}')
    feed_paths = list(reader.get("redo-log", []))
    if not feed_paths:
        if rtype == "online" and "server" in reader:
            raise ConfigError(
                'reader type "online" with a database "server" connection '
                "needs a live Oracle instance, which this engine does not "
                'have; point "redo-log" at the change-feed directory instead '
                '(reader type "offline"/"batch" semantics)')
        raise ConfigError('bad JSON, missing "redo-log" paths in reader')
    mode = "batch" if rtype == "batch" else "stream"
    for k in sorted(set(reader) & _IGNORED_READER):
        ignored.append(f"reader.{k}")
    for k in sorted(set(src) & _IGNORED_SOURCE):
        ignored.append(f"source.{k}")
    flags = int(src.get("flags", 0) or 0)
    for bit, name in enumerate(_FLAG_NAMES):
        if flags & (1 << bit) and not ((1 << bit) & _HONORED_FLAGS):
            ignored.append(f"flags.{name}")
    for k in ("memory", "dump-path", "dump-raw-data", "dump-redo-log",
              "log-level", "trace"):
        if k in cfg:
            ignored.append(k)
    # debug stop bounds (Ctx.h:229-231; decremented per txn / log switch in
    # Parser.cpp:852,1583): honored as bounded-drain gates; the remaining
    # debug knobs (owner/table stop-object, stop-checkpoints — our
    # checkpoints are epochs, bounded drains already stop) are reported.
    dbg = src.get("debug", {})
    stop_txns = dbg.get("stop-transactions")
    stop_seqs = dbg.get("stop-log-switches")
    for k in sorted(set(dbg) - {"stop-transactions", "stop-log-switches"}):
        ignored.append(f"debug.{k}")

    # ---- format ----------------------------------------------------------
    ftype = fmt.get("type", "json")
    if ftype not in ("json", "protobuf", "debezium"):
        raise ConfigError(
            f'bad JSON, invalid format "type" value: {ftype}, expected: one '
            'of {"json", "protobuf", "debezium"}')
    if ftype == "debezium":
        # the reference's debezium type is a dial PRESET over the same
        # JSON builder (OpenLogReplicator.cpp:695-709), overridable by
        # explicit fields below: full update images, db on all messages,
        # per-op sequence numbers, rids, full schema dictionary, reversed
        # xid, the b_scn/e_scn + b_tm/e_tm + usr header trio (SCN_TYPE /
        # TIMESTAMP_TYPE / USER_TYPE ::DEBEZIUM), on the reference-native
        # header.  The interval formats and timestamp-metadata pieces of
        # the preset aren't modeled (no interval column types in the
        # typed feed) and are reported.
        fmt = {"message": 2, "rid": 1, "column": 2, "db": 3, "xid": 3,
               "schema": 7, "scn-type": 14, "timestamp-type": 14,
               "user-type": 15, "native-keys": 1,
               **{k: v for k, v in fmt.items() if k != "type"},
               "type": "json"}
        ignored += ["format.debezium.interval-dts",
                    "format.debezium.interval-ytm",
                    "format.debezium.timestamp-metadata"]
        ftype = "json"
    _HONORED_FMT = {"message", "scn", "rid", "timestamp", "attributes",
                    "column", "schema", "xid", "db", "native-keys",
                    "scn-type", "timestamp-type", "user-type"}
    for name, hi in (("message", 31), ("scn", 1), ("rid", 1),
                     ("timestamp", 15), ("attributes", 7), ("column", 2),
                     ("schema", 7), ("xid", 3), ("db", 3),
                     ("native-keys", 1), ("scn-type", 15),
                     ("timestamp-type", 15), ("user-type", 15)):
        if name in fmt and not (isinstance(fmt[name], int)
                                and 0 <= fmt[name] <= hi):
            raise ConfigError(
                f'bad JSON, invalid "{name}" value: {fmt[name]}, expected: '
                f"one of {{0 .. {hi}}}")
    from .functions.json_output import WireFormat

    try:
        wire = WireFormat.from_config(fmt)
    except ValueError as e:  # FULL + SKIP_BEGIN/COMMIT, as in the reference
        raise ConfigError(str(e)) from e
    for k in sorted(set(fmt) - {"type"} - _HONORED_FMT):
        # remaining dials (xid renderings, charset, interval/unknown types)
        # are vacuous on the typed feed — WireFormat docstring explains each
        ignored.append(f"format.{k}")

    # ---- filter ----------------------------------------------------------
    flt = src.get("filter", {})
    rules: list[TableRule] = []
    for t in flt.get("table", []):
        if "table" not in t:
            raise ConfigError('bad JSON, missing "table" in filter.table entry')
        pat = t["table"]
        key_cols = None
        if "key" in t and t["key"]:
            key_cols = [
                (c.strip().lower(),
                 _KEY_TYPES.get(c.strip().lower(), "string"))
                for c in t["key"].split(",")
            ]
        cond = translate_condition(t["condition"]) if t.get("condition") else None
        rules.append(TableRule(
            owner=t.get("owner", ""), table=pat, key_cols=key_cols,
            condition_sql=cond, tag=t.get("tag"),
            is_literal=not _REGEX_CHARS.search(pat),
        ))
    if not rules:
        rules = [TableRule(owner="", table="transcripts", is_literal=True)]

    # lowercase literal names — this engine's table_name domain is lowercase
    tracked_pattern = "^(" + "|".join(
        (r.table.lower() if r.is_literal else r.table) for r in rules) + ")$"
    multi_tables = ([r.table.lower() for r in rules]
                    if len(rules) > 1 and all(r.is_literal for r in rules)
                    else None)

    conds = [
        f"(table_name NOT RLIKE {_sq('^(' + r.table.lower() + ')$') if r.is_literal else _sq('^(' + r.table + ')$')}"
        f" OR ({r.condition_sql}))"
        for r in rules if r.condition_sql
    ]
    condition_sql = " AND ".join(conds) if conds else None

    # ---- state / metrics -------------------------------------------------
    state = cfg.get("state", {})
    for k in ("interval-mb", "interval-s", "schema-force-interval", "type"):
        if k in state:
            ignored.append(f"state.{k}")
    metrics_cfg = cfg.get("metrics", {})
    if metrics_cfg and metrics_cfg.get("type") not in (None, "prometheus"):
        raise ConfigError(
            f'bad JSON, invalid metrics "type" value: {metrics_cfg.get("type")}'
            ', expected: one of {"prometheus"}')
    tag_names = metrics_cfg.get("tag-names", "none")
    if tag_names not in ("none", "filter", "sys", "all"):
        # reference error text: OpenLogReplicator.cpp:393-395
        raise ConfigError(
            f'bad JSON, invalid "tag-names" value: {tag_names}, expected: '
            'one of {"all", "filter", "none", "sys"}')

    # ---- writer ----------------------------------------------------------
    wtype = writer.get("type")
    if wtype not in ("file", "discard", "kafka", "network", "zeromq"):
        raise ConfigError(
            f'bad JSON, invalid writer "type" value: {wtype}, expected: one '
            'of {"file", "discard", "kafka", "zeromq", "network"}')
    if wtype == "zeromq":
        raise ConfigError(
            'writer type "zeromq" needs libzmq, which this image does not '
            'ship; use "network" (the same redo-stream protocol over plain '
            "TCP) or \"file\"")
    # file-writer rotation dials (OpenLogReplicator.cpp:1135-1175): honored
    # for type "file" (sources/file_writer.py), validated here so a bad
    # config fails at parse time like the reference's 30001/30005-30007
    _file_dials = {"max-file-size", "timestamp-format", "new-line", "append",
                   "write-buffer-flush-size"}
    w_max_file_size = int(writer.get("max-file-size", 0) or 0)
    w_ts_format = writer.get("timestamp-format", "%F_%T")
    w_new_line = int(writer.get("new-line", 1))
    w_append = int(writer.get("append", 1))
    if wtype == "file":
        if w_new_line > 2 or w_new_line < 0:
            raise ConfigError(
                f'bad JSON, invalid "new-line" value: {w_new_line}, '
                "expected: one of {0 .. 2}")
        if w_append not in (0, 1):
            raise ConfigError(
                f'bad JSON, invalid "append" value: {w_append}, '
                "expected: one of {0, 1}")
        if w_max_file_size and not writer.get("output"):
            raise ConfigError(
                'bad JSON, invalid "output" value: , expected: to be set '
                f'when "max-file-size" is set ({w_max_file_size})')
        flush_size = int(writer.get("write-buffer-flush-size", 1048576))
        if flush_size > 1048576 or flush_size < 0:
            raise ConfigError(
                'bad JSON, invalid "write-buffer-flush-size" value: '
                f"{flush_size}, expected: one of {{0 .. 1048576}}")
        if "write-buffer-flush-size" in writer:
            # range-validated for parity; Python file objects buffer
            ignored.append("writer.write-buffer-flush-size")
        from .sources.file_writer import FileWriterConfigError, writer_from_plan

        try:  # mask grammar errors surface at parse time (30005-30007)
            writer_from_plan(writer.get("output") or "",
                             timestamp_format=w_ts_format,
                             max_file_size=w_max_file_size,
                             new_line=w_new_line, append=w_append)
        except FileWriterConfigError as e:
            raise ConfigError(str(e)) from e
    else:
        _file_dials = set()
    for k in sorted(set(writer) - {"type", "output", "uri", "topic",
                                   "properties", "brokers"} - _file_dials):
        ignored.append(f"writer.{k}")

    max_txn_mb = src.get("transaction-max-mb")
    plan = JobPlan(
        mode=mode,
        feed_paths=feed_paths,
        source_name=src.get("name", ""),
        wire_format=ftype,
        wire=wire,
        rules=rules,
        tracked_pattern=tracked_pattern,
        multi_tables=multi_tables,
        condition_sql=condition_sql,
        skip_xids=list(flt.get("skip-xid", [])),
        dump_xids=list(flt.get("dump-xid", [])),
        start_scn=reader.get("start-scn"),
        start_seq=reader.get("start-seq"),
        stop_transactions=stop_txns,
        stop_log_switches=stop_seqs,
        max_txn_ops=(int(max_txn_mb) * OPS_PER_MB) if max_txn_mb else None,
        state_path=state.get("path"),
        keep_checkpoints=state.get("keep-checkpoints"),
        schemaless=bool(flags & _FLAG_SCHEMALESS),
        adaptive_schema=bool(flags & _FLAG_ADAPTIVE_SCHEMA),
        checkpoint_keep_all=bool(flags & _FLAG_CHECKPOINT_KEEP),
        metrics=bool(metrics_cfg),
        metrics_bind=metrics_cfg.get("bind"),
        metrics_tag_names=tag_names,
        writer_type=wtype,
        writer_output=writer.get("output"),
        writer_max_file_size=w_max_file_size,
        writer_timestamp_format=w_ts_format,
        writer_new_line=w_new_line,
        writer_append=w_append,
        writer_uri=writer.get("uri"),
        kafka_topic=writer.get("topic"),
        kafka_brokers=(writer.get("brokers")
                       or writer.get("properties", {}).get("bootstrap.servers")),
        ignored=ignored,
    )
    return plan


def _writer_dirs(plan: JobPlan, lake_root: str) -> tuple[str | None, str | None]:
    """(json_mirror_dir, protobuf_spool_dir) for the planned egress."""
    if plan.writer_type == "file":
        out = plan.writer_output or "output.json"
        if plan.rotating_writer() is not None:
            # rotation requested: the mirror becomes an internal spool
            # under the lake root; the user's output path receives ONLY
            # the rotated files the reference would produce
            d = os.path.join(lake_root, "mirror")
        else:
            # "output.json"-style plain names: the mirror dir sits next
            # to the named file (documented divergence: the distributed
            # egress is a directory of ordered part files)
            d = os.path.dirname(out) if ("%" in os.path.basename(out)
                                         or out.endswith(".json")) else out
            d = d or os.path.join(lake_root, "mirror")
        if plan.wire_format == "protobuf":
            return None, d
        return d, None
    if plan.writer_type == "network":
        return None, os.path.join(lake_root, "spool")
    return None, None


def run_from_config(
    spark,
    cfg: str | dict,
    *,
    table_path: str | None = None,
    checkpoint_dir: str | None = None,
    n_buckets: int = 16,
    continuous: str | None = None,
    strict: bool = True,
):
    """Execute the configured replication job.

    ``table_path`` (the lake destination — a concept the reference's config
    does not carry, its sinks are message streams) defaults to
    ``<state.path>/lake``; ``checkpoint_dir`` to ``<state.path>/checkpoint``.
    Returns the LakeTable (single-table) or Catalog (multi-table) after an
    availableNow drain; with ``continuous`` (e.g. ``"5 seconds"``) returns
    the StreamingQuery handle like run_stream.
    """
    plan = plan_from_config(cfg, strict=strict)

    root = plan.state_path or table_path
    if root is None:
        raise ConfigError(
            'no destination: give the config a state.path or pass table_path=')
    lake_root = table_path or os.path.join(plan.state_path, "lake")
    ckpt = checkpoint_dir or os.path.join(
        plan.state_path or os.path.dirname(lake_root) or ".", "checkpoint")

    if plan.writer_type == "kafka" and not _kafka_jar_present(spark):
        raise ConfigError(
            'writer type "kafka" needs the spark-sql-kafka package on the '
            "cluster (not in this image); the format layer is "
            "sources/kafka.py and activates with the jar")

    json_mirror_dir, protobuf_spool_dir = _writer_dirs(plan, lake_root)
    pre = _with_debug_bounds(spark, plan, plan.pre_filter())

    # Reference state-dir RESUME: when the config names no explicit start
    # position, adopt the newest reference-format checkpoint file for this
    # database from state.path (Metadata::readCheckpoints semantics,
    # state_compat.resume_position) — a deployment migrating off the
    # reference continues where it left off instead of replaying history.
    # Data at or below the checkpoint scn was already delivered, so the
    # gate is strict (scn > chkpt scn); it composes with the rest of the
    # config predicate and pushes down to the scan like any other filter.
    fresh_create = True
    resume_scn = None
    feed_schema = None
    if (plan.start_scn is None and plan.start_seq is None
            and plan.state_path and plan.source_name):
        from .state_compat import resume_position

        _resume = resume_position(plan.state_path, plan.source_name)
        if _resume is not None:
            resume_scn = int(_resume["scn"])
            from pyspark.sql import functions as F

            _gate = F.col("scn") > int(_resume["scn"])
            _base_pre = pre

            def pre(df, _b=_base_pre, _g=_gate):  # noqa: F811
                return (_b(df) if _b is not None else df).filter(_g)

            # Schema IMPORT: the checkpoint's SYS dictionary defines the
            # destination table the way the reference rebuilds its table
            # map from the file (readCheckpoint -> buildMaps).  Single-
            # table jobs only (multi-table registries evolve via DDL);
            # the tracked-pattern match picks the table, our feed's key
            # pair stays the key, remaining dictionary columns become
            # value columns.  replay_batch's create=True is a rebuilding
            # overwrite, so a pre-created import flows with create=False.
            if _resume.get("tables") and not plan.multi_tables:
                match = [t for t in _resume["tables"]
                         if re.match(plan.tracked_pattern, t[1])]
                if match:
                    _, _tname, _cols = match[0]
                    from .lake.table import LakeTable
                    from .streaming.job import DEFAULT_VALUE_COLS, KEY_COLS

                    key_names = [k for k, _ in KEY_COLS]
                    imported = dict(_cols)
                    if all(k in imported for k in key_names):
                        keys = [(k, imported[k]) for k in key_names]
                        vals = [(n, t) for n, t in _cols
                                if n not in key_names]
                        if vals != DEFAULT_VALUE_COLS:
                            # the dictionary widens/narrows the image
                            # struct: read the feed with the matching
                            # wide-schema variant, not the static default
                            from .schema import change_event_schema_for

                            feed_schema = change_event_schema_for(
                                [n for n, _ in vals])
                        if not os.path.exists(
                                os.path.join(lake_root, "VERSION")):
                            LakeTable.create(spark, lake_root, keys, vals,
                                             n_buckets=n_buckets)
                            fresh_create = False

    recorder = None
    prom_srv = None
    registry = None
    if plan.metrics:
        from .streaming.metrics import attach_metrics

        recorder = attach_metrics(spark, os.path.join(lake_root, "_metrics"))
        # Prometheus endpoint (MetricsPrometheus.cpp; metrics.adoc): the
        # registry makes the apply paths fold their driver-side epoch
        # scalars into reference-vocabulary counters; "bind" exposes them
        from .streaming import prometheus

        registry = prometheus.enable(plan.metrics_tag_names)
        # per-table series carry the config's {owner, table} labels
        # (MetricsPrometheus.cpp:368-460 emit variants)
        registry.owner_map = {
            (r.table.lower() if r.is_literal else r.table): r.owner
            for r in plan.rules
        }
        registry.set_state("initializing")
        if plan.metrics_bind:
            prom_srv = prometheus.PrometheusServer(plan.metrics_bind, registry)

    from .streaming.job import (
        replay_batch,
        replay_batch_multi,
        run_stream,
        run_stream_multi,
    )

    def _retention(target):
        # state.keep-checkpoints -> snapshot retention (the reference GCs
        # checkpoint files beyond keep-checkpoints, Checkpoint.cpp; here
        # the manifest snapshots ARE the checkpoints — vacuum keeps the
        # same-depth time-travel window).  Bounded drains only: a
        # continuous tail must not race its own maintenance.
        if (plan.keep_checkpoints and continuous is None
                and not plan.checkpoint_keep_all):
            # REDO_FLAGS::CHECKPOINT_KEEP: never prune history
            # (Metadata::deleteOldCheckpoints early-returns on the flag)
            target.vacuum(retain_last=int(plan.keep_checkpoints))
        if plan.state_path and plan.source_name and continuous is None:
            _export_reference_checkpoint(spark, plan, target)
        if json_mirror_dir is not None and continuous is None:
            # rotation tail (WriterFile semantics): drain the ordered
            # mirror into the user's rotated output files; the .writer-pos
            # cursor makes re-drains exactly-once
            rot = plan.rotating_writer()
            if rot is not None:
                with rot:
                    rot.drain_mirror(json_mirror_dir)
        if plan.writer_type == "network" and protobuf_spool_dir is not None:
            # the reference's network writer IS a server clients connect
            # to (WriterStream binds target[].writer.uri); serve the spool
            # with the INFO/START/CONFIRM protocol.  Attached as
            # ``.network_server`` (already started; caller stops it) —
            # ``replicate_from_stream`` on the other end completes the
            # reference's writer->client pair.
            from .sources.network import RedoStreamServer

            host, port = "127.0.0.1", 0
            if plan.writer_uri and ":" in plan.writer_uri:
                h, p = plan.writer_uri.rsplit(":", 1)
                host, port = (h or "127.0.0.1"), int(p)
            srv = RedoStreamServer(protobuf_spool_dir, host=host, port=port)
            srv.address = srv.start()  # actual (host, port) after bind
            try:
                target.network_server = srv
            except AttributeError:  # slotted/frozen result object
                srv.stop()
        if registry is not None:
            # drain-level counters the epoch hook can't see: redo bytes
            # consumed and log switches (feed seq files) — driver-side
            # os.stat, no jobs
            n_seq, n_bytes = _feed_footprint(plan.feed_paths)
            registry.inc("log_switches", n_seq, type="archived"
                         if continuous is None else "online")
            registry.inc("bytes_read", n_bytes)
            registry.inc("bytes_parsed", n_bytes)
            registry.set_state(
                "replicating" if continuous is not None else "finishing")
            if prom_srv is not None:
                target.prometheus_server = prom_srv
                target.metrics_registry = registry
        return target

    try:
        if registry is not None:
            registry.set_state("starting")
        if plan.multi_tables:
            if plan.mode == "batch":
                feed = _read_paths(spark, plan.feed_paths)
                return _retention(replay_batch_multi(
                    spark, feed, lake_root, tables=plan.multi_tables,
                    n_buckets=n_buckets, max_txn_ops=plan.max_txn_ops,
                    auto_register=plan.adaptive_schema,
                    schemaless=plan.schemaless,
                    json_mirror_dir=json_mirror_dir,
                    protobuf_spool_dir=protobuf_spool_dir,
                    json_format=plan.wire,
                    pre_filter=pre))
            return _retention(run_stream_multi(
                spark, _single_dir(plan), lake_root, ckpt,
                tables=plan.multi_tables, n_buckets=n_buckets,
                max_txn_ops=plan.max_txn_ops, pre_filter=pre,
                processing_time=continuous,
                auto_register=plan.adaptive_schema,
                schemaless=plan.schemaless,
                json_mirror_dir=json_mirror_dir,
                protobuf_spool_dir=protobuf_spool_dir,
                json_format=plan.wire))
        if plan.mode == "batch":
            feed = _read_paths(spark, plan.feed_paths, schema=feed_schema)
            # Resuming INTO an existing lake continues it: no rebuilding
            # overwrite (create=False), and the epoch id is the resume
            # frontier scn so the new slice commits under a fresh ledger
            # key (replaying the same slice stays a no-op) — the same
            # scn-keyed-epoch idempotency the TCP replica uses.
            batch_create, batch_epoch = fresh_create, 0
            if (resume_scn is not None
                    and os.path.exists(os.path.join(lake_root, "VERSION"))):
                batch_create, batch_epoch = False, resume_scn
            return _retention(replay_batch(
                spark, feed, lake_root, tracked_pattern=plan.tracked_pattern,
                create=batch_create, epoch_id=batch_epoch,
                schemaless=plan.schemaless,
                n_buckets=n_buckets, max_txn_ops=plan.max_txn_ops,
                pre_filter=pre, dump_xids=plan.dump_xids or None,
                dump_dir=(os.path.join(lake_root, "_dump")
                          if plan.dump_xids else None),
                json_mirror_dir=json_mirror_dir,
                protobuf_spool_dir=protobuf_spool_dir,
                json_format=plan.wire))
        return _retention(run_stream(
            spark, _single_dir(plan), lake_root, ckpt,
            tracked_pattern=plan.tracked_pattern, n_buckets=n_buckets,
            schemaless=plan.schemaless,
            max_txn_ops=plan.max_txn_ops, pre_filter=pre,
            json_mirror_dir=json_mirror_dir,
            protobuf_spool_dir=protobuf_spool_dir,
            processing_time=continuous,
            dump_xids=plan.dump_xids or None,
            dump_dir=(os.path.join(lake_root, "_dump")
                      if plan.dump_xids else None),
            json_format=plan.wire))
    except BaseException:
        if registry is not None:
            registry.set_state("aborting")
        if prom_srv is not None:
            prom_srv.close()
        raise
    finally:
        if recorder is not None and continuous is None:
            from .streaming.metrics import detach_metrics

            detach_metrics(spark, recorder)


def _feed_footprint(paths: list[str]) -> tuple[int, int]:
    """(sequence count, total bytes) of the feed directories — the
    log_switches / bytes_read counter inputs.  Driver-side os.walk."""
    n_seq, n_bytes = 0, 0
    for p in paths or []:
        if not os.path.isdir(p):
            continue
        for entry in os.listdir(p):
            if re.search(r"seq[-=](\d+)", entry):
                n_seq += 1
            full = os.path.join(p, entry)
            if os.path.isfile(full):
                n_bytes += os.path.getsize(full)
            elif os.path.isdir(full):
                for f in os.listdir(full):
                    fp = os.path.join(full, f)
                    if os.path.isfile(fp):
                        n_bytes += os.path.getsize(fp)
    return n_seq, n_bytes


def _max_feed_seq(paths: list[str]) -> int:
    """Highest redo sequence visible in the feed directories, from the
    ``seq-N`` / ``seq=N`` file-naming contract (S4 archived-log
    discovery) — free, no Spark job."""
    mx = 0
    for p in paths:
        if os.path.isdir(p):
            for n in os.listdir(p):
                m = re.search(r"seq[-=](\d+)", n)
                if m:
                    mx = max(mx, int(m.group(1)))
    return mx


def _export_reference_checkpoint(spark, plan: JobPlan, target) -> str | None:
    """After a bounded drain, write the applied frontier back to
    state.path as a reference-format ``<db>-chkpt-<scn>.json`` — the
    return leg of the migration path: a state dir this engine maintained
    can be handed BACK to the reference (Metadata::writeCheckpoint
    lifecycle, incl. keep-checkpoints pruning).  Driver-side metadata
    only; the one lineage fallback collect is O(epochs), not O(rows)."""
    from .state_compat import (
        checkpoint_doc,
        delete_old_checkpoints,
        list_checkpoints,
        write_reference_checkpoint,
    )

    if plan.stop_transactions is not None or plan.stop_log_switches is not None:
        return None  # a debug-truncated run does not advance migration state

    frontier = target.manifest.get("shard_frontier") or {}
    threads = None
    if frontier:
        # watermark mode tracks the exact per-shard scn frontier; the
        # checkpoint scn is the safe LWM across shards (the reference's
        # checkpointScn is likewise the multi-thread minimum)
        scn = min(int(v) for v in frontier.values())
        threads = [{"thread": int(k), "seq": 0, "lwn-scn": int(v)}
                   for k, v in sorted(frontier.items(), key=lambda kv: int(kv[0]))]
    else:
        # a completed bounded drain processed the whole feed (applied or
        # filtered — both advance the confirmed position, like the
        # reference confirming past skipped transactions), so the
        # frontier is the feed's max scn; parquet column stats make this
        # single-column agg a metadata-cheap job
        from pyspark.sql import functions as F

        row = _read_paths(spark, plan.feed_paths).agg(
            F.max("scn").alias("m")).collect()
        scn = int(row[0]["m"]) if row and row[0]["m"] is not None else 0
    if scn <= 0:
        return None
    if scn in list_checkpoints(plan.state_path, plan.source_name):
        return None  # already checkpointed at this frontier (idempotent rerun)

    owners = {r.table: r.owner for r in plan.rules if r.table and r.owner}
    default_owner = next(iter(owners.values()), "USR1")

    def _cols(tbl) -> list[tuple[str, str]]:
        return [(c["name"], c["type"])
                for c in tbl.manifest["key_cols"] + tbl.manifest["value_cols"]]

    if hasattr(target, "table_names"):   # Catalog
        tables = [(owners.get(n, default_owner), n, _cols(target.table(n)))
                  for n in target.table_names]
    else:
        name = plan.multi_tables[0] if plan.multi_tables else (
            plan.rules[0].table if plan.rules and plan.rules[0].table
            and plan.rules[0].is_literal else "transcripts")
        tables = [(owners.get(name, default_owner), name, _cols(target))]

    doc = checkpoint_doc(
        plan.source_name, scn, _max_feed_seq(plan.feed_paths),
        threads=threads, tables=tables,
    )
    path = write_reference_checkpoint(plan.state_path, doc)
    if plan.keep_checkpoints and not plan.checkpoint_keep_all:
        delete_old_checkpoints(plan.state_path, plan.source_name,
                               keep=int(plan.keep_checkpoints))
    return path


def _with_debug_bounds(spark, plan: JobPlan, base_pre):
    """debug.stop-transactions / stop-log-switches → bounded-drain gates.

    The reference decrements a counter per committed transaction / log
    switch and soft-shuts-down at zero (Parser.cpp:852-870, Ctx.h:229-231);
    the declarative equivalent is a pushed-down bound computed ONCE from a
    tiny batch scan of the feed's control rows (O(N)-row collects, debug
    facility only — never on the hot path): the first N redo sequences,
    and the xid set of the first N commits in scn order.  Later events —
    including their begin/commit markers and any later DDL — are excluded,
    exactly what a reference shutdown at that point leaves unprocessed.
    """
    if plan.stop_transactions is None and plan.stop_log_switches is None:
        return base_pre
    from pyspark.sql import functions as F

    feed = _read_paths(spark, plan.feed_paths)
    parts = []
    if plan.stop_log_switches is not None:
        seqs = [r[0] for r in feed.select("seq").distinct()
                .orderBy("seq").limit(int(plan.stop_log_switches)).collect()]
        parts.append(F.col("seq") <= (max(seqs) if seqs else -1))
    if plan.stop_transactions is not None:
        xids = [r[0] for r in feed.filter(F.col("op") == "commit")
                .orderBy("scn").limit(int(plan.stop_transactions))
                .select("xid").collect()]
        parts.append(F.col("xid").isin(xids) | F.col("xid").isNull())
    pred = parts[0]
    for p in parts[1:]:
        pred = pred & p

    def _filter(df):
        out = df.filter(pred)
        return base_pre(out) if base_pre is not None else out

    return _filter


def _single_dir(plan: JobPlan) -> str:
    if len(plan.feed_paths) != 1:
        raise ConfigError(
            "streaming readers tail ONE feed directory; got "
            f"{len(plan.feed_paths)} redo-log paths (use reader type "
            '"batch" for a fixed file list)')
    return plan.feed_paths[0]


def _read_paths(spark, paths: list[str], schema=None):
    from .sources.feed import read_feed_batch

    if schema is not None:
        dfs = [spark.read.schema(schema).parquet(p) for p in paths]
    else:
        dfs = [read_feed_batch(spark, p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _kafka_jar_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider")
        return True
    except Exception:
        return False
