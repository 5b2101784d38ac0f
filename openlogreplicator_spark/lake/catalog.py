"""Catalog — a registry of LakeTables replicated under ONE epoch fence.

The reference tracks an arbitrary set of owner/table pairs concurrently —
``Schema::buildMaps`` compiles the config's table masks into dictionary
maps and every redo record is routed to its table's metadata
(/root/reference/src/metadata/Schema.h:129-132; multi-table fixtures
tests/sql/inputs/multi-table.sql, rac-concurrent-tables.rac.sql).  The
single-table ``LakeTable`` keys every row by (conv_id, turn_idx); two
tracked tables would collide in one key space, so multi-table replication
needs one LakeTable PER tracked table plus shared per-epoch state:

* **Registry** — the catalog manifest maps table name → subdirectory; each
  table is a full LakeTable (own buckets, deltas, schema evolution,
  ledger).  CREATE/DROP TABLE DDL (reference DDL types 1/12,
  src/builder/Builder.cpp:1807-1830) mutate the registry, ledger-marked
  for idempotent crash replay.
* **One epoch fence** — per-table merges are individually idempotent
  (each table's own ledger keys ``{epoch}:{segment}``); the catalog's
  ``{epoch}:done`` marker commits LAST, so a crash anywhere inside the
  epoch replays it and every already-committed piece no-ops.  This is the
  same exactly-once recipe the single-table path uses, lifted one level.
* **Shared state** — open-transaction pending snapshots, the RAC shard
  frontier, and per-(shard, table) lineage live in the catalog manifest:
  they belong to the FEED, not to any one table.

Layout::

    <path>/VERSION, manifest/v*.json      catalog snapshots (atomic swap)
    <path>/tables/<name>/...              one LakeTable per tracked table
    <path>/pending/v*, lineage/v*         shared epoch state (parquet)
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .table import LakeTable

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_.$-]*$")

DEFAULT_KEY_COLS = [("conv_id", "string"), ("turn_idx", "int")]
DEFAULT_VALUE_COLS = [
    ("role", "string"),
    ("text", "string"),
    ("tool", "string"),
    ("ts", "timestamp"),
]


def parse_create_columns(stmt_tail: str) -> list[tuple[str, str]] | None:
    """Parse the ``(col type, col type, ...)`` tail of CREATE TABLE; None if
    absent (caller falls back to the transcript default).  Raises ValueError
    for specs outside the supported grammar — including types the lake
    cannot store — callers treat that as "no parseable column list"."""
    from .table import _TYPE_MAP

    m = re.search(r"\((.*)\)", stmt_tail, re.S)
    if not m:
        return None
    cols = []
    for part in m.group(1).split(","):
        toks = part.split()
        if len(toks) != 2:
            raise ValueError(f"bad column spec {part!r} in CREATE TABLE")
        if toks[1].lower() not in _TYPE_MAP:
            raise ValueError(f"unsupported column type {toks[1]!r} in CREATE TABLE")
        cols.append((toks[0], toks[1].lower()))
    return cols


class Catalog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest = self._read_manifest()

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(cls, spark: SparkSession, path: str, overwrite: bool = False) -> "Catalog":
        if os.path.exists(os.path.join(path, "VERSION")):
            if not overwrite:
                return cls(spark, path)
            import shutil

            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "manifest"), exist_ok=True)
        manifest = {
            "version": 0,
            "tables": {},
            "ledger": {},
            "pending_dirs": [],
            "lineage_dirs": [],
        }
        LakeTable._write_manifest_static(path, manifest)
        return cls(spark, path)

    def create_table(
        self,
        name: str,
        key_cols: list[tuple[str, str]] | None = None,
        value_cols: list[tuple[str, str]] | None = None,
        n_buckets: int = 16,
        mode: str = "cow",
        compact_threshold: int = 8,
        ledger_mark: tuple[str, str] | None = None,
        registry_snapshot: tuple[str, str, dict] | None = None,
    ) -> LakeTable:
        """Register + create a tracked table (reference: DDL type 1 CREATE
        TABLE, Builder.cpp:1807).  Idempotent: an existing registration
        returns the live table.  An UNREGISTERED leftover directory (a
        dropped table's orphan, or a crash between the LakeTable files
        landing and the registry commit — in both cases no merge has
        targeted it since, because merges only route to registered names)
        is overwritten so CREATE always yields an empty table.

        ``registry_snapshot=(job_id, epoch_key, {name: path})``: the
        registry as it stood at EPOCH START, persisted in the SAME atomic
        commit as the first registry mutation of the epoch (and never
        overwritten) — a crash-replayed epoch seeds its segment membership
        from this snapshot, not from the already-mutated live registry, so
        DML that committed before this CREATE stays skipped on replay
        exactly as it was on the clean run."""
        if not _NAME_RE.match(name):
            raise ValueError(f"bad table name {name!r}")
        if name in self.manifest["tables"]:
            return self.table(name)
        rel = f"tables/{name}"
        LakeTable.create(
            self.spark,
            os.path.join(self.path, rel),
            key_cols or DEFAULT_KEY_COLS,
            value_cols or DEFAULT_VALUE_COLS,
            n_buckets=n_buckets,
            mode=mode,
            compact_threshold=compact_threshold,
            overwrite=True,
        )
        m = dict(self.manifest)
        m["tables"] = dict(self.manifest["tables"], **{name: {"path": rel}})
        self._record_registry_snapshot(m, registry_snapshot)
        self._commit(m, ledger_mark)
        return self.table(name)

    def drop_table(
        self,
        name: str,
        ledger_mark: tuple[str, str] | None = None,
        registry_snapshot: tuple[str, str, dict] | None = None,
    ):
        """Deregister a table (reference: DDL type 12 DROP TABLE).  The data
        directory becomes an orphan (restorable until vacuumed), exactly
        like Iceberg's DROP TABLE without PURGE.  ``registry_snapshot``:
        see :meth:`create_table`."""
        if name not in self.manifest["tables"]:
            return
        m = dict(self.manifest)
        m["tables"] = {k: v for k, v in self.manifest["tables"].items() if k != name}
        self._record_registry_snapshot(m, registry_snapshot)
        self._commit(m, ledger_mark)

    @staticmethod
    def _record_registry_snapshot(m: dict, snap: tuple[str, str, dict] | None):
        if snap is None:
            return
        job_id, epoch_key, names = snap
        reg = {k: dict(v) for k, v in m.get("epoch_registry", {}).items()}
        reg.setdefault(job_id, {})
        if epoch_key not in reg[job_id]:  # first mutation of the epoch wins
            reg[job_id][epoch_key] = dict(names)
        m["epoch_registry"] = reg

    def epoch_start_registry(self, job_id: str, epoch_key: str) -> dict | None:
        """The registry (name → path) as it stood when this epoch first
        mutated it, or None if this epoch has not (yet) applied any
        CREATE/DROP — in which case the live registry IS the epoch-start
        registry."""
        return self.manifest.get("epoch_registry", {}).get(job_id, {}).get(epoch_key)

    # ---------------------------------------------------------------- access
    @property
    def table_names(self) -> list[str]:
        return sorted(self.manifest["tables"])

    def table(self, name: str) -> LakeTable:
        rel = self.manifest["tables"][name]["path"]
        return LakeTable(self.spark, os.path.join(self.path, rel))

    def refresh(self) -> "Catalog":
        self.manifest = self._read_manifest()
        return self

    # ------------------------------------------------------ shared epoch state
    def pending(self, schema: T.StructType) -> DataFrame:
        from .table import read_pending_state

        return read_pending_state(self.spark, self.path, self.manifest, schema)

    def lineage(self) -> DataFrame:
        from ..schema import LINEAGE_SCHEMA

        dirs = [os.path.join(self.path, d) for d in self.manifest["lineage_dirs"]]
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(*dirs)

    def commit_epoch(
        self,
        job_id: str,
        marks: list[str],
        pending: DataFrame | None = None,
        lineage: DataFrame | None = None,
        shard_frontier: dict | None = None,
        pending_update: dict | None = None,
        lineage_rows: list[tuple] | None = None,
    ):
        """One atomic catalog commit carrying the epoch's shared state: the
        pending-transaction state, the lineage append, the shard frontier,
        and the ledger marks (``{epoch}:done`` last in ``marks``).  Parquet
        lands BEFORE the manifest swap (crash → orphans, never a torn
        snapshot), the same write discipline as LakeTable.merge.

        ``pending_update`` / ``lineage_rows``: the zero-extra-job epoch
        state protocol — same contract as LakeTable.merge (incremental
        pending deltas + driver-side pyarrow lineage)."""
        from .table import write_lineage_parquet

        version = self.manifest["version"] + 1
        m = dict(self.manifest)

        if pending_update is not None:
            from .table import apply_pending_update, set_pending_fields

            set_pending_fields(
                m,
                apply_pending_update(
                    self.path, self.manifest, pending_update, version
                ),
            )
        elif pending is not None:
            prel = f"pending/v{version:06d}"
            pending.write.mode("overwrite").parquet(os.path.join(self.path, prel))
            m["pending_dirs"] = [prel]
            m["pending_closed"] = []
            m.pop("pending_open_xids", None)
            m.pop("pending_closed_dirs", None)
            m.pop("pending_open_large", None)
        if lineage is not None:
            lrel = f"lineage/v{version:06d}"
            lineage.write.mode("overwrite").parquet(os.path.join(self.path, lrel))
            m["lineage_dirs"] = list(self.manifest["lineage_dirs"]) + [lrel]
        elif lineage_rows is not None:
            lrel = f"lineage/v{version:06d}"
            write_lineage_parquet(os.path.join(self.path, lrel), lineage_rows)
            m["lineage_dirs"] = list(self.manifest["lineage_dirs"]) + [lrel]
        if shard_frontier is not None:
            m["shard_frontier"] = {str(k): int(v) for k, v in shard_frontier.items()}

        ledger = {k: dict(v) for k, v in m["ledger"].items()}
        for mark in marks:
            ledger.setdefault(job_id, {})[mark] = True
        m["ledger"] = ledger
        # the epoch is fenced — its start-registry snapshot (crash-replay
        # seed, see create_table) is no longer needed
        if m.get("epoch_registry", {}).get(job_id):
            reg = {k: dict(v) for k, v in m["epoch_registry"].items()}
            reg[job_id] = {}
            m["epoch_registry"] = reg
        m["version"] = version
        LakeTable._write_manifest_static(self.path, m)
        self.manifest = m

    def cluster(self, tables: list[str] | None = None) -> dict:
        """Catalog-wide OPTIMIZE: run ``LakeTable.cluster`` (range-
        clustered rewrite + per-file key zone maps) on every registered —
        or the named — tables.  The maintenance sweep a scheduler would
        run off the epoch path; per-table results keyed by name."""
        names = self.table_names if tables is None else [
            n for n in tables if n in self.table_names
        ]
        return {n: self.table(n).cluster() for n in names}

    def vacuum(self, retain_last: int = 1) -> dict:
        """Catalog-wide GC: vacuum every registered table (honoring the
        same time-travel retention window), then remove catalog-level
        pending/lineage dirs not referenced by the current manifest AND
        unregistered table directories (DROP TABLE orphans) — the
        expire_snapshots + remove_orphan_files analog one level up."""
        import glob
        import shutil

        removed: dict[str, list[str]] = {}
        for name in self.table_names:
            removed[name] = self.table(name).vacuum(retain_last=retain_last)["removed"]

        ref = set(self.manifest["pending_dirs"]) | set(self.manifest["lineage_dirs"])
        cat_removed: list[str] = []
        for pattern in ("pending/v*", "lineage/v*"):
            for path in glob.glob(os.path.join(self.path, pattern)):
                rel = os.path.relpath(path, self.path).replace(os.sep, "/")
                if rel not in ref:
                    shutil.rmtree(path, ignore_errors=True)
                    cat_removed.append(rel)
        live = {t["path"] for t in self.manifest["tables"].values()}
        for path in glob.glob(os.path.join(self.path, "tables", "*")):
            rel = os.path.relpath(path, self.path).replace(os.sep, "/")
            if rel not in live:
                shutil.rmtree(path, ignore_errors=True)
                cat_removed.append(rel)
        removed["_catalog"] = sorted(cat_removed)
        return {"removed": removed}

    def manifest_as_of(self, epoch: int, job_id: str = "default") -> dict:
        """The greatest CATALOG snapshot untouched by any epoch > ``epoch``
        for ``job_id`` — the registry (and shared state pointers) exactly as
        they stood at that epoch's ``:done`` fence.  Ledgers only grow, so
        the first hit walking down from the current version is the answer."""
        import json

        v = self.manifest["version"]
        while v >= 0:
            mpath = os.path.join(self.path, "manifest", f"v{v:06d}.json")
            with open(mpath) as f:
                m = json.load(f)
            if LakeTable._ledger_max_epoch(m, job_id) <= epoch:
                return m
            v -= 1
        raise ValueError(f"no catalog snapshot at or before epoch {epoch}")

    def read_as_of(self, epoch: int, job_id: str = "default") -> dict:
        """CONSISTENT cross-table time travel: {table name → DataFrame} of
        every table REGISTERED as of epoch ``epoch``'s fence, each read at
        its own ``version_as_of`` that epoch — the multi-table analog of
        ``LakeTable.read(version=)`` (Iceberg VERSION AS OF; reference
        checkpoint refScn chain, src/metadata/Metadata.cpp:586-613).  The
        single epoch fence makes the set transactionally consistent: no
        table shows a later epoch than any other.  Tables dropped AFTER
        ``epoch`` still resolve (their directories are orphans until
        vacuumed); data files vacuumed past the retention window raise on
        read, same contract as the single-table path."""
        m = self.manifest_as_of(epoch, job_id)
        out = {}
        for name, ent in m["tables"].items():
            t = LakeTable(self.spark, os.path.join(self.path, ent["path"]))
            out[name] = t.read(version=t.version_as_of(epoch, job_id))
        return out

    def committed_epochs(self, job_id: str = "default") -> set[int]:
        out: set[int] = set()
        for k in self.manifest["ledger"].get(job_id, {}):
            s = str(k)
            if s.isdigit():
                out.add(int(s))
            elif s.endswith(":done"):
                out.add(int(s.split(":", 1)[0]))
        return out

    # ------------------------------------------------------------- internal
    def _commit(self, m: dict, ledger_mark: tuple[str, str] | None = None):
        if ledger_mark is not None:
            job_id, mark = ledger_mark
            ledger = {k: dict(v) for k, v in m["ledger"].items()}
            ledger.setdefault(job_id, {})[mark] = True
            m["ledger"] = ledger
        m["version"] = self.manifest["version"] + 1
        LakeTable._write_manifest_static(self.path, m)
        self.manifest = m

    def _read_manifest(self) -> dict:
        import json

        with open(os.path.join(self.path, "VERSION")) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.path, "manifest", f"v{v:06d}.json")) as f:
            return json.load(f)
