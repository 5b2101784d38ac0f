"""LakeTable — a snapshot-versioned, bucket-partitioned parquet table.

The iceberg-spark-runtime jar is not in this image, so this module provides
the minimal Iceberg-shaped surface the CDC sink needs, built on parquet +
JSON manifests.  It deliberately mirrors Iceberg's design so a production
deployment can swap `LakeTable.merge` for a real `MERGE INTO` on Iceberg:

* **Snapshots** — every commit writes an immutable manifest
  ``manifest/v{N}.json`` listing the current data file set per bucket; a
  ``VERSION`` pointer file is swapped atomically (os.replace).  Readers see
  a consistent snapshot; a crash before the pointer swap leaves only orphan
  data files (harmless), never a torn table.
* **Bucket partitioning** — rows hash into ``n_buckets`` by key
  (``pmod(xxhash64(conv_id), n)``, Iceberg's ``bucket(n, conv_id)``
  transform).  A merge reads and rewrites only the buckets its batch
  touches: partition pruning for copy-on-write.
* **Merge-on-read mode** (``mode="mor"``, Iceberg v2 delete-file analog) —
  a merge appends the epoch's collapsed change set as *delta files* per
  touched bucket instead of rewriting the bucket: write cost is O(changes),
  not O(bucket).  Readers fold deltas onto the base with one per-key
  aggregation (no iteration); when a bucket accumulates
  ``compact_threshold`` deltas it is compacted back to a plain base in the
  same commit.  This is the 100 TB path for update-heavy CDC — at 10^10
  rows a hot epoch touches every bucket, and CoW would rewrite the world
  every epoch.
* **Epoch ledger** — the manifest carries ``{job_id: {epoch: max_lsn}}``.
  ``merge`` is a no-op for an already-committed epoch, which together with
  Structured Streaming's deterministic epoch replay gives exactly-once
  sink semantics (reference analog: writer client checkpoint + isNewData,
  /root/reference/src/writer/Writer.cpp:296-298,
  src/metadata/Metadata.cpp:716-727).
* **Pending-transaction state** — events of still-open transactions are
  snapshotted per commit (copy-on-write, usually tiny) so the engine's
  transaction buffer (reference: src/parser/TransactionBuffer.h) survives
  restarts in the SAME atomic commit as the data — state and data can
  never diverge.
* **Schema evolution** — the manifest owns the column list; ADD COLUMN is
  a metadata-only commit; old files are read with the new schema and
  missing columns surface as NULL (Iceberg semantics).
* **Lineage** — per-epoch per-shard apply records appended as parquet,
  registered in the manifest (reference analog: Prometheus DML counters,
  src/common/metrics/Metrics.h:76-139).

Single-writer by design (the foreachBatch driver callback is serialized);
the manifest write refuses to overwrite an existing version file.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "boolean": T.BooleanType(),
}


def _schema_from_manifest(cols: list[dict]) -> T.StructType:
    return T.StructType(
        [T.StructField(c["name"], _TYPE_MAP[c["type"]], True) for c in cols]
    )


def read_pending_state(
    spark: SparkSession, root: str, manifest: dict, schema: T.StructType
) -> DataFrame:
    """Open-transaction pending state = union of the manifest's pending
    delta files minus the tombstoned xids (transactions that closed since a
    file was written — see LakeTable.merge pending_update).  Small open
    sets tombstone as a literal IN-list in the manifest (pushed down to the
    parquet scan — no join); past the stats detail cap tombstones are
    parquet files of closed xids applied as an anti-join (broadcast by AQE
    when small) so NO xid set ever lives driver-side."""
    dirs = [os.path.join(root, d) for d in manifest["pending_dirs"]]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*dirs)
    closed = manifest.get("pending_closed") or []
    if closed:
        df = df.filter(~F.col("xid").isin(list(closed)))
    cdirs = [os.path.join(root, d) for d in manifest.get("pending_closed_dirs", [])]
    cdirs = [d for d in cdirs if os.path.isdir(d)]
    if cdirs:
        tomb = spark.read.parquet(*cdirs).select("xid").distinct()
        df = df.join(tomb, "xid", "left_anti")
    return df


def apply_pending_update(root: str, manifest: dict, pending_update: dict,
                         version: int) -> dict:
    """Apply one epoch's pending-state commit decision (see
    streaming/apply.py plan_pending_update / plan_pending_update_large):
    writes this version's pending delta / tombstone parquet under ``root``
    and returns the new manifest pending fields.  Shared by LakeTable.merge
    and Catalog.commit_epoch."""
    dirs = list(manifest.get("pending_dirs", []))
    closed = list(manifest.get("pending_closed", []))
    closed_dirs = list(manifest.get("pending_closed_dirs", []))
    open_x = manifest.get("pending_open_xids")
    large = bool(manifest.get("pending_open_large", False))
    pmode = pending_update["mode"]
    if pmode == "clear":
        dirs, closed, closed_dirs, open_x, large = [], [], [], [], False
    elif pmode == "full":
        prel = f"pending/v{version:06d}"
        pending_update["df"].write.mode("overwrite").parquet(
            os.path.join(root, prel)
        )
        dirs, closed, closed_dirs = [prel], [], []
        if pending_update.get("open_large"):
            large, open_x = True, None
        else:
            large, open_x = False, sorted(pending_update.get("open_xids", []))
    elif pmode == "delta":
        if pending_update.get("df") is not None:
            prel = f"pending/v{version:06d}"
            pending_update["df"].write.mode("overwrite").parquet(
                os.path.join(root, prel)
            )
            dirs.append(prel)
        if pending_update.get("closed_df") is not None:
            crel = f"pending/v{version:06d}_closed"
            pending_update["closed_df"].write.mode("overwrite").parquet(
                os.path.join(root, crel)
            )
            closed_dirs.append(crel)
        if pending_update.get("open_large"):
            # large mode: no xid lists; legacy literal tombstones (written
            # while the set was still small) stay applied at read
            large, open_x = True, None
        else:
            large = False
            closed = sorted(pending_update.get("closed", []))
            open_x = sorted(pending_update.get("open_xids", []))
    else:
        raise ValueError(f"bad pending_update mode {pmode!r}")
    return {
        "pending_dirs": dirs,
        "pending_closed": closed,
        "pending_closed_dirs": closed_dirs,
        "pending_open_xids": open_x,
        "pending_open_large": large,
    }


def set_pending_fields(m: dict, fields: dict) -> None:
    """Fold apply_pending_update's result into a manifest dict (absent
    optional fields are removed, not left stale)."""
    m["pending_dirs"] = fields["pending_dirs"]
    m["pending_closed"] = fields["pending_closed"]
    if fields["pending_closed_dirs"]:
        m["pending_closed_dirs"] = fields["pending_closed_dirs"]
    else:
        m.pop("pending_closed_dirs", None)
    if fields["pending_open_large"]:
        m["pending_open_large"] = True
        m.pop("pending_open_xids", None)
    else:
        m.pop("pending_open_large", None)
        if fields["pending_open_xids"] is not None:
            m["pending_open_xids"] = fields["pending_open_xids"]
        else:
            m.pop("pending_open_xids", None)


def write_lineage_parquet(dirpath: str, rows: list[tuple]) -> None:
    """Per-epoch lineage rows written DRIVER-side via pyarrow: they are
    O(shards + tables) tuples already living on the driver, so a Spark job
    (≈4 s fixed overhead on this box) per epoch to write them is pure
    fixed-cost waste.  The file is schema-compatible with LINEAGE_SCHEMA
    (spark.read.schema(...) reconciles by name + identical physical
    types)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            pa.field("epoch_id", pa.int64(), nullable=False),
            pa.field("shard", pa.int32()),
            pa.field("table_name", pa.string()),
            pa.field("last_applied_lsn", pa.int64()),
            pa.field("n_ins", pa.int64(), nullable=False),
            pa.field("n_upd", pa.int64(), nullable=False),
            pa.field("n_del", pa.int64(), nullable=False),
            pa.field("n_skipped", pa.int64(), nullable=False),
        ]
    )
    cols = list(zip(*rows)) if rows else [[] for _ in range(len(schema))]
    table = pa.table(
        {f.name: list(c) for f, c in zip(schema, cols)}, schema=schema
    )
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "part-00000.parquet"))


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.manifest = self._read_manifest()

    # ------------------------------------------------------------------ DDL
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: list[tuple[str, str]],
        value_cols: list[tuple[str, str]],
        n_buckets: int = 64,
        overwrite: bool = False,
        mode: str = "cow",
        compact_threshold: int = 8,
    ) -> "LakeTable":
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        if os.path.exists(os.path.join(path, "VERSION")):
            if not overwrite:
                return cls(spark, path)
            import shutil

            shutil.rmtree(path)
        os.makedirs(os.path.join(path, "manifest"), exist_ok=True)
        manifest = {
            "version": 0,
            "n_buckets": n_buckets,
            "mode": mode,
            "compact_threshold": compact_threshold,
            "key_cols": [{"name": n, "type": t} for n, t in key_cols],
            "value_cols": [{"name": n, "type": t} for n, t in value_cols],
            "buckets": {},
            "deltas": {},
            "ledger": {},
            "pending_dirs": [],
            "lineage_dirs": [],
        }
        cls._write_manifest_static(path, manifest)
        return cls(spark, path)

    def _ddl_commit(self, m: dict, ledger_mark: tuple[str, str] | None = None):
        """Commit a metadata mutation; optionally record a ledger mark in the
        SAME atomic manifest write so non-idempotent DDL (truncate) replays
        exactly once on crash-recovery."""
        if ledger_mark is not None:
            job_id, mark = ledger_mark
            ledger = {k: dict(v) for k, v in m["ledger"].items()}
            ledger.setdefault(job_id, {})[mark] = True
            m["ledger"] = ledger
        m["version"] = self.manifest["version"] + 1
        self._write_manifest_static(self.path, m)
        self.manifest = m

    def alter_add_column(
        self, name: str, coltype: str, ledger_mark: tuple[str, str] | None = None
    ):
        """Metadata-only schema evolution (Iceberg ADD COLUMN analog)."""
        if any(c["name"] == name for c in self.manifest["value_cols"]):
            return
        m = dict(self.manifest)
        m["value_cols"] = self.manifest["value_cols"] + [{"name": name, "type": coltype}]
        self._ddl_commit(m, ledger_mark)

    def alter_drop_column(
        self, name: str, ledger_mark: tuple[str, str] | None = None
    ):
        """Metadata-only column removal (Iceberg DROP COLUMN analog):
        existing data files keep the bytes, the read schema stops selecting
        them.  Key columns cannot be dropped.  Reference: DDL opcode routing
        in Builder.cpp:1738-1830 (alter variants)."""
        if name in self.key_names:
            raise ValueError(f"cannot drop key column {name!r}")
        if not any(c["name"] == name for c in self.manifest["value_cols"]):
            return
        m = dict(self.manifest)
        m["value_cols"] = [c for c in self.manifest["value_cols"] if c["name"] != name]
        self._ddl_commit(m, ledger_mark)

    def truncate(self, ledger_mark: tuple[str, str] | None = None):
        """Remove all rows: a metadata-only commit that empties the bucket
        file map (old files become unreferenced orphans, like Iceberg's
        truncate snapshot).  Open-transaction pending state is untouched.
        Reference: DDL type 85 TRUNCATE at Builder.cpp:1815."""
        m = dict(self.manifest)
        m["buckets"] = {}
        m["deltas"] = {}
        self._ddl_commit(m, ledger_mark)

    # ---------------------------------------------------------------- reads
    @property
    def key_names(self) -> list[str]:
        return [c["name"] for c in self.manifest["key_cols"]]

    @property
    def value_names(self) -> list[str]:
        return [c["name"] for c in self.manifest["value_cols"]]

    @property
    def n_buckets(self) -> int:
        return self.manifest["n_buckets"]

    def row_schema(self) -> T.StructType:
        return _schema_from_manifest(
            self.manifest["key_cols"] + self.manifest["value_cols"]
        )

    def _bucket_expr(self):
        return F.pmod(F.xxhash64(F.col(self.key_names[0])), F.lit(self.n_buckets)).cast("int")

    def _read_base(
        self, buckets: list[int] | None = None, m: dict | None = None
    ) -> DataFrame:
        m = m if m is not None else self.manifest
        schema = _schema_from_manifest(m["key_cols"] + m["value_cols"])
        sel = m["buckets"]
        if buckets is not None:
            want = {str(b) for b in buckets}
            sel = {b: d for b, d in sel.items() if b in want}
        dirs = [os.path.join(self.path, d) for ds in sel.values() for d in ds]
        if not dirs:
            return self.spark.createDataFrame([], schema)
        # explicit schema → files written before an ADD COLUMN yield NULLs
        return self.spark.read.schema(schema).parquet(*dirs)

    def _delta_schema(self, m: dict | None = None) -> T.StructType:
        m = m if m is not None else self.manifest
        key_fields = _schema_from_manifest(m["key_cols"]).fields
        vals_type = _schema_from_manifest(m["value_cols"])
        return T.StructType(
            [
                *key_fields,
                T.StructField("is_delete", T.BooleanType(), True),
                T.StructField("reset", T.BooleanType(), True),
                T.StructField("set_cols", T.ArrayType(T.StringType()), True),
                T.StructField("vals", vals_type, True),
                T.StructField("_seq", T.LongType(), False),
            ]
        )

    def _read_deltas(
        self,
        buckets: list[int] | None = None,
        dmap: dict | None = None,
        m: dict | None = None,
    ) -> DataFrame | None:
        m = m if m is not None else self.manifest
        sel = dmap if dmap is not None else m.get("deltas", {})
        if buckets is not None:
            want = {str(b) for b in buckets}
            sel = {b: d for b, d in sel.items() if b in want}
        dirs = [os.path.join(self.path, d) for ds in sel.values() for d in ds]
        if not dirs:
            return None
        return self.spark.read.schema(self._delta_schema(m)).parquet(*dirs)

    def _fold_deltas(
        self, base: DataFrame, deltas: DataFrame, m: dict | None = None
    ) -> DataFrame:
        """Apply ordered per-key net-change deltas onto base rows with ONE
        aggregation + one join (no iteration): sequential-apply semantics —
        is_delete removes, reset redefines, set_cols overwrite — expressed
        as 'value of the last delta setting the column at/after the last
        boundary (delete/reset)'."""
        m = m if m is not None else self.manifest
        key = [c["name"] for c in m["key_cols"]]
        vals = [c["name"] for c in m["value_cols"]]

        def set_cond(c: str):
            return F.array_contains(F.coalesce(F.col("set_cols"), F.array()), c)

        agg = [
            F.max_by("is_delete", "_seq").alias("_last_del"),
            F.max(
                F.when(F.col("is_delete") | F.col("reset"), F.col("_seq"))
            ).alias("_bnd"),
        ]
        for c in vals:
            agg.append(
                F.max_by(
                    F.col("vals").getField(c), F.when(set_cond(c), F.col("_seq"))
                ).alias(f"_v_{c}")
            )
            agg.append(F.max(F.when(set_cond(c), F.col("_seq"))).alias(f"_s_{c}"))
        d = deltas.groupBy(*key).agg(*agg)

        # explicit presence flags, NOT key-null tests: the join is eqNullSafe
        # (null keys are legal rows), so "first key col is null" must not be
        # conflated with "no row on this side"
        t = base.withColumn("_t", F.lit(True)).alias("t")
        dd = d.withColumn("_d", F.lit(True)).alias("d")
        cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}")) for k in key]
        j = t.join(dd, cond, "full_outer")
        has_d = F.col("d._d").isNotNull()
        has_t = F.col("t._t").isNotNull()
        keep = F.when(has_d, ~F.col("d._last_del")).otherwise(has_t)

        def out_col(c: str):
            set_valid = F.col(f"d._s_{c}").isNotNull() & (
                F.col("d._bnd").isNull() | (F.col(f"d._s_{c}") >= F.col("d._bnd"))
            )
            # boundary (reset) or insert-into-absent wipes unset columns
            wiped = F.col("d._bnd").isNotNull() | ~has_t
            from_d = F.when(set_valid, F.col(f"d._v_{c}")).otherwise(
                F.when(wiped, F.lit(None)).otherwise(F.col(f"t.{c}"))
            )
            return F.when(has_d, from_d).otherwise(F.col(f"t.{c}")).alias(c)

        out_key = [F.coalesce(F.col(f"t.{k}"), F.col(f"d.{k}")).alias(k) for k in key]
        return j.filter(keep).select(*out_key, *[out_col(c) for c in vals])

    def read(
        self, buckets: list[int] | None = None, version: int | None = None
    ) -> DataFrame:
        """Snapshot read; optional bucket pruning; merge-on-read deltas
        folded onto the base (one agg + one join).

        ``version``: TIME TRAVEL — read the table as of an earlier manifest
        snapshot (Iceberg ``VERSION AS OF`` / the reference's checkpoint
        refScn chain, src/metadata/Metadata.cpp:586-613, which keeps
        history so a late client can restart from an older confirmed
        position).  Valid for any version whose data files are still
        retained (``vacuum(retain_last=N)``)."""
        m = self.manifest if version is None else self.manifest_at(version)
        base = self._read_base(buckets, m=m)
        deltas = self._read_deltas(buckets, m=m)
        if deltas is None:
            return base
        return self._fold_deltas(base, deltas, m=m)

    def manifest_at(self, version: int) -> dict:
        """Load a historical manifest snapshot (the time-travel index —
        manifests are tiny JSON and are never vacuumed)."""
        mpath = os.path.join(self.path, "manifest", f"v{version:06d}.json")
        if not os.path.exists(mpath):
            raise ValueError(
                f"no snapshot v{version} (current {self.manifest['version']})"
            )
        with open(mpath) as f:
            return json.load(f)

    @staticmethod
    def _ledger_max_epoch(m: dict, job_id: str) -> int:
        """Greatest epoch number appearing in this snapshot's ledger for
        ``job_id`` (plain ``{e}``, ``{e}:{seg}``, ``{e}:done``,
        ``{e}:ddl{i}`` marks all count; non-numeric marks are epoch-
        agnostic and ignored); -1 when no epoch has touched it."""
        mx = -1
        for k in m.get("ledger", {}).get(job_id, {}):
            head = str(k).split(":", 1)[0]
            if head.isdigit():
                mx = max(mx, int(head))
        return mx

    def version_as_of(self, epoch: int, job_id: str = "default") -> int:
        """EPOCH-addressed time travel: the greatest snapshot version whose
        ledger contains no mark from an epoch > ``epoch`` — i.e. the table
        exactly as it stood after epoch ``epoch``'s fence (maintenance
        rewrites that happened before the next epoch are included; they are
        state-identical by contract).  Ledgers only grow, so the first hit
        walking down from the current version is the answer."""
        v = self.manifest["version"]
        while v >= 0:
            if self._ledger_max_epoch(self.manifest_at(v), job_id) <= epoch:
                return v
            v -= 1
        raise ValueError(f"no snapshot at or before epoch {epoch}")

    # ---------------------------------------------------------------- merge
    def merge(
        self,
        changes: DataFrame,
        epoch_id: int,
        job_id: str = "default",
        pending: DataFrame | None = None,
        lineage: DataFrame | None = None,
        shard_frontier: dict | None = None,
        affected: list[int] | None = None,
        lineage_rows: list[tuple] | None = None,
        pending_update: dict | None = None,
        n_changes: int | None = None,
    ) -> bool:
        """Apply one epoch of net changes atomically; idempotent by epoch.

        ``changes`` schema: key cols + ``is_delete`` boolean + ``reset``
        boolean + ``set_cols`` array<string> + ``vals`` struct over the
        current value columns.  One row per key (pre-collapsed — the engine
        guarantees last-writer-wins before the sink, the same contract the
        reference's Builder gives its Writer).

        Merge semantics per key (sequential-apply equivalent):
          - is_delete              → row removed
          - reset (ins-led)       → row replaced: set cols, others NULL
          - else (upd-only)       → set cols overwrite, others keep target
          - key absent in target  → insert (set cols, others NULL)

        Per-epoch job-count controls (the fixed-cost story, BASELINE.md):

        ``affected``: the touched bucket ids, already measured by the
        caller's fused counts job over a PERSISTED ``changes`` frame that
        carries ``_bucket`` — skips this method's persist + distinct job.

        ``lineage_rows``: lineage tuples (LINEAGE_SCHEMA order) written
        driver-side via pyarrow — a per-epoch lineage append costs zero
        Spark jobs (the rows are O(shards), already on the driver).

        ``n_changes``: the change-row count, when the caller already
        measured it (the fused counts job) — lets a small CoW epoch swap
        the full-outer sort-merge of the whole touched base for broadcast
        probes (see the decomposition in the merge body).

        ``pending_update``: incremental pending-state commit (reference
        analog: TransactionBuffer swap-to-disk, MemoryManager.cpp:1-410 —
        the open set is carried, not rewritten).  One of:
          {"mode": "clear"}                      — open set empty: drop all
          {"mode": "full", "df", "open_xids"}    — full snapshot rewrite
          {"mode": "delta", "df"|None, "closed", "open_xids"} — append only
              this epoch's NEW open events (df None = nothing new); xids in
              ``closed`` are tombstoned out of earlier pending files at
              read time.  Cost per epoch: O(new events), not O(open set).
        """
        ledger = self.manifest["ledger"].get(job_id, {})
        if str(epoch_id) in ledger:
            return False  # already committed — exactly-once replay guard

        key = self.key_names
        vals = self.value_names
        version = self.manifest["version"] + 1
        mode = self.manifest.get("mode", "cow")
        deltas_map = {k: list(v) for k, v in self.manifest.get("deltas", {}).items()}
        cold_by_bucket: dict[int, list[str]] = {}

        bexpr = self._bucket_expr()
        caller_persisted = affected is not None
        if caller_persisted:
            ch = changes  # already bucketed + persisted by the caller
        else:
            # persist: the changes plan is the whole assemble+collapse DAG;
            # it feeds both the bucket discovery and the rewrite — never
            # run twice
            ch = changes.withColumn("_bucket", bexpr).persist()
            affected = [r["_bucket"] for r in ch.select("_bucket").distinct().collect()]

        new_dirs: dict[str, list[str]] = {}
        touched_existing = [
            b for b in affected
            if str(b) in self.manifest["buckets"] or deltas_map.get(str(b))
        ]
        mor_delta = mode == "mor" and affected and bool(touched_existing)
        if mor_delta:
            # ---- merge-on-read: append the change set as delta files ----
            delta_rel = f"delta/v{version:06d}"
            (
                ch.select(
                    *key,
                    "is_delete",
                    "reset",
                    "set_cols",
                    "vals",
                    F.lit(version).cast("long").alias("_seq"),
                    "_bucket",
                )
                .repartition(max(len(affected), 1), "_bucket")
                # key-sorted within each bucket file: parquet row-group
                # stats then prune MoR point lookups over the delta tail
                # for free (satisfies the writer's required _bucket-prefix
                # ordering, so no extra sort is inserted)
                .sortWithinPartitions("_bucket", *key)
                .write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(os.path.join(self.path, delta_rel))
            )
            for b in affected:
                d = f"{delta_rel}/_bucket={b}"
                if os.path.isdir(os.path.join(self.path, d)):
                    deltas_map.setdefault(str(b), []).append(d)
            result = None
            # lazy compaction: buckets whose delta chain got long are folded
            # back to a plain base IN THIS COMMIT (bounded read-amp)
            threshold = self.manifest.get("compact_threshold", 8)
            base_write_buckets = [
                b for b in affected if len(deltas_map.get(str(b), [])) >= threshold
            ]
            if base_write_buckets:
                deltas = self._read_deltas(base_write_buckets, dmap=deltas_map)
                folded = self._fold_deltas(self._read_base(base_write_buckets), deltas)
                result = folded.withColumn("_bucket", bexpr)
        elif affected and not touched_existing:
            base_write_buckets = affected
            # fast path — none of the touched buckets has data yet (initial
            # load / pure-insert epochs): no join, just project the puts
            result = ch.filter(~F.col("is_delete")).select(
                *key,
                *[
                    F.when(
                        F.array_contains(F.col("set_cols"), v),
                        F.col("vals").getField(v),
                    ).alias(v)
                    for v in vals
                ],
                F.col("_bucket"),
            )
        elif affected:
            base_write_buckets = affected
            # file-level (partial) CoW — Iceberg-style sparse update: base
            # files whose key zone map is DISJOINT from this epoch's
            # change-key range survive the rewrite untouched (they stay
            # listed in the manifest and are neither read nor rewritten).
            # One tiny agg over the persisted changes buys skipping an
            # arbitrarily large fraction of the bucket's data I/O; at
            # 10^10 rows a point update rewrites O(files hit), not O(bucket).
            cold_by_bucket, hot_entries = self._plan_partial_cow(
                ch, touched_existing, deltas_map
            )
            if not cold_by_bucket:
                target = self.read(touched_existing).withColumn("_bucket", bexpr)
            else:
                base = self._read_paths(hot_entries)
                deltas = self._read_deltas(touched_existing, dmap=deltas_map)
                folded = (
                    base if deltas is None else self._fold_deltas(base, deltas)
                )
                target = folded.withColumn("_bucket", bexpr)
            # flat unique names so the small-changes decomposition below
            # can union the two join legs (eqNullSafe → null keys legal)
            t = target.select(
                *[F.col(k).alias(f"_tk{i}") for i, k in enumerate(key)],
                *[F.col(v).alias(f"_tv_{v}") for v in vals],
                F.lit(True).alias("_t"),
                F.col("_bucket").alias("_tb"),
            )
            c = ch.select(
                *[F.col(k).alias(f"_ck{i}") for i, k in enumerate(key)],
                "is_delete", "reset", "set_cols", "vals",
                F.lit(True).alias("_c"),
                F.col("_bucket").alias("_cb"),
            )
            cond = [
                F.col(f"_tk{i}").eqNullSafe(F.col(f"_ck{i}"))
                for i in range(len(key))
            ]
            small_cap = int(os.environ.get("OLR_MERGE_BCAST_ROWS", "200000"))
            if n_changes is not None and n_changes <= small_cap:
                # A full_outer join can NEVER broadcast, so a point epoch
                # (a handful of changed keys) sort-merge-shuffles the whole
                # touched-bucket base.  With the change-row count known
                # (the fused counts job already measured it), decompose:
                #   A = target LEFT OUTER broadcast(changes)   (all target
                #       rows, with their matching change if any)
                #   M = target LEFT SEMI broadcast(changes)    (keys that
                #       matched — ≤ n_changes rows)
                #   B = changes LEFT ANTI broadcast(M)         (pure
                #       inserts: change keys absent from the target)
                # A ∪ B is row-for-row the full_outer output, and every
                # join is a broadcast probe over the base scan — zero
                # shuffle/sort of the base (guide §3.1; the 100-key
                # localized epoch's merge was one big sort before this).
                cb = F.broadcast(c)
                a_leg = t.join(cb, cond, "left_outer")
                m = F.broadcast(
                    t.join(cb, cond, "left_semi").select(
                        *[F.col(f"_tk{i}") for i in range(len(key))]
                    )
                )
                b_anti = c.join(
                    m,
                    [
                        F.col(f"_ck{i}").eqNullSafe(F.col(f"_tk{i}"))
                        for i in range(len(key))
                    ],
                    "left_anti",
                )
                kdts = dict(zip([f"_tk{i}" for i in range(len(key))],
                                [f.dataType for f in target.select(*key).schema.fields]))
                vdts = {v: target.schema[v].dataType for v in vals}
                b_leg = b_anti.select(
                    *[F.lit(None).cast(kdts[f"_tk{i}"]).alias(f"_tk{i}")
                      for i in range(len(key))],
                    *[F.lit(None).cast(vdts[v]).alias(f"_tv_{v}") for v in vals],
                    F.lit(None).cast("boolean").alias("_t"),
                    F.lit(None).cast("int").alias("_tb"),
                    *b_anti.columns,
                )
                j = a_leg.unionByName(b_leg)
            else:
                j = t.join(c, cond, "full_outer")

            has_change = F.col("_c").isNotNull()
            has_target = F.col("_t").isNotNull()
            keep = ~(has_change & F.col("is_delete"))

            def out_col(v: str):
                set_v = F.array_contains(F.col("set_cols"), v)
                from_change = F.when(set_v, F.col("vals").getField(v)).otherwise(
                    F.when(F.col("reset") | ~has_target, F.lit(None)).otherwise(
                        F.col(f"_tv_{v}")
                    )
                )
                return F.when(has_change, from_change).otherwise(
                    F.col(f"_tv_{v}")).alias(v)

            out_key = [
                F.coalesce(F.col(f"_tk{i}"), F.col(f"_ck{i}")).alias(k)
                for i, k in enumerate(key)
            ]
            out_bucket = F.coalesce(F.col("_tb"), F.col("_cb")).alias("_bucket")
            result = j.filter(keep).select(*out_key, *[out_col(v) for v in vals], out_bucket)

        if affected and result is not None:
            data_rel = f"data/v{version:06d}"
            out_path = os.path.join(self.path, data_rel)
            # Parallelism decoupled from bucket count: rows are salted
            # within their bucket (second-level key hash) so a hot bucket's
            # rewrite spreads over many tasks instead of funneling through
            # one, while the shuffle keeps per-epoch file counts bounded
            # (one file per bucket×salt).  A shuffle-free direct
            # partitionBy write was measured SLOWER here (35-51s vs 22s on
            # the 10M bench): dynamic-partition task-local sorts plus
            # input_partitions×buckets small files cost more than one
            # clean shuffle of the collapsed rows.
            n_bw = max(len(base_write_buckets), 1)
            par = self.spark.sparkContext.defaultParallelism
            salt_n = max(1, (2 * par) // n_bw)
            salt = F.pmod(
                F.xxhash64(*[F.col(k) for k in key], F.lit(1)), F.lit(salt_n)
            ).alias("_salt")
            (
                result.withColumn("_salt", salt)
                .repartition(n_bw * salt_n, "_bucket", "_salt")
                .drop("_salt")
                .write.partitionBy("_bucket")
                .mode("overwrite")
                .parquet(out_path)
            )
            for b in base_write_buckets:
                d = f"{data_rel}/_bucket={b}"
                keep = cold_by_bucket.get(b, [])  # partial-CoW survivors
                if os.path.isdir(os.path.join(self.path, d)):
                    new_dirs[str(b)] = [d] + keep
                else:
                    # rewrite emitted nothing (bucket emptied by deletes) —
                    # only the untouched cold files remain, if any
                    new_dirs[str(b)] = keep
                if mor_delta:
                    deltas_map[str(b)] = []  # compacted into the new base

        if not caller_persisted:
            ch.unpersist()

        # pending-transaction state (see docstring; legacy `pending` is a
        # full copy-on-write snapshot)
        pending_fields = None
        if pending_update is not None:
            pending_fields = apply_pending_update(
                self.path, self.manifest, pending_update, version
            )
        elif pending is not None:
            prel = f"pending/v{version:06d}"
            pending.write.mode("overwrite").parquet(os.path.join(self.path, prel))
            pending_fields = {
                "pending_dirs": [prel],
                "pending_closed": [],
                "pending_closed_dirs": [],
                # unknown xid set → next delta decision rewrites
                "pending_open_xids": None,
                "pending_open_large": False,
            }

        lineage_dirs = list(self.manifest["lineage_dirs"])
        if lineage is not None:
            lrel = f"lineage/v{version:06d}"
            lineage.write.mode("overwrite").parquet(os.path.join(self.path, lrel))
            lineage_dirs.append(lrel)
        elif lineage_rows is not None:
            lrel = f"lineage/v{version:06d}"
            write_lineage_parquet(os.path.join(self.path, lrel), lineage_rows)
            lineage_dirs.append(lrel)

        buckets = dict(self.manifest["buckets"])
        file_stats = dict(self.manifest.get("file_stats", {}))
        for b, dirs in new_dirs.items():
            if dirs:
                buckets[b] = dirs
            else:
                buckets.pop(b, None)
            # a rewrite (CoW / compaction) replaces the clustered base —
            # its zone maps are stale; MoR delta appends keep them (the
            # base files are untouched and deltas are never file-pruned).
            # Partial-CoW survivors were NOT rewritten: their maps stay
            # valid and keep pruning both point lookups and later epochs.
            kept_maps = {
                e: mm
                for e, mm in self._stats_files(self.manifest, b).items()
                if e in cold_by_bucket.get(int(b), [])
            }
            if kept_maps:
                # map the partial rewrite's OUTPUT files too (one driver
                # footer scan, O(files this epoch)) — consecutive localized
                # epochs on different keys then prune each other's outputs,
                # so the table stays file-pruned without re-clustering
                hot_dir = next((d for d in dirs if not d.endswith(".parquet")), None)
                if hot_dir is not None:
                    fresh = self._collect_file_stats(hot_dir)
                    if fresh is not None:
                        kept_maps.update(
                            {f"{hot_dir}/{f}": mm for f, mm in fresh.items()}
                        )
                file_stats[b] = {"files": kept_maps}
            else:
                file_stats.pop(b, None)

        m = dict(self.manifest)
        m["version"] = version
        m["buckets"] = buckets
        m["file_stats"] = file_stats
        m["deltas"] = {b: ds for b, ds in deltas_map.items() if ds}
        if pending_fields is not None:
            set_pending_fields(m, pending_fields)
        m["lineage_dirs"] = lineage_dirs
        if shard_frontier is not None:
            # per-shard read frontier (RAC SCN watermark state) — atomic
            # with the data commit
            m["shard_frontier"] = {str(k): int(v) for k, v in shard_frontier.items()}
        new_ledger = {k: dict(v) for k, v in self.manifest["ledger"].items()}
        new_ledger.setdefault(job_id, {})[str(epoch_id)] = True
        m["ledger"] = new_ledger
        self._write_manifest_static(self.path, m)
        self.manifest = m
        return True

    def bootstrap_load(self, rows: DataFrame, job_id: str = "bootstrap") -> bool:
        """Initial snapshot load — the reference's start-from-SCN online
        mode against a pre-existing table (Replicator start parameters,
        documentation/json/2.source.adoc): load the current table image
        once, then apply the change feed from the resume position
        (filters.first_data_lsn_filter is the gate).

        ``rows``: key + value columns.  Implemented as a reset-style merge
        under the ledger (epoch 'snapshot'), so a crashed/re-run bootstrap
        is exactly-once like any other epoch."""
        key = self.key_names
        vals = self.value_names
        changes = rows.select(
            *key,
            F.lit(False).alias("is_delete"),
            F.lit(True).alias("reset"),
            F.array(*[F.lit(v) for v in vals]).alias("set_cols"),
            F.struct(*[F.col(v).alias(v) for v in vals]).alias("vals"),
        )
        return self.merge(changes, epoch_id="snapshot", job_id=job_id)

    # ---------------------------------------------------------- maintenance
    def cluster(self, buckets: list[int] | None = None) -> dict:
        """OPTIMIZE: rewrite bucket bases key-clustered and record per-file
        key zone maps (min/max of the first key column, read driver-side
        from the parquet footers) in the manifest.

        The hot merge path deliberately salts rows within a bucket for
        write parallelism, so base files span the whole key range and a
        point lookup must scan every file of its bucket.  This maintenance
        pass is the Iceberg ``OPTIMIZE`` / Delta ``ZORDER`` analog: a
        range-partitioned rewrite gives files DISJOINT key ranges, and
        ``read_for_keys`` then skips every file whose [min, max] cannot
        contain a requested key — at 10^10 rows a bucket holds thousands
        of files and a lookup touches O(keys) of them, not all.  MoR delta
        chains of the clustered buckets are folded in (compaction).

        Scale shape: one shuffle (repartitionByRange over (bucket, key) —
        the range sampler splits hot buckets across many tasks, so
        parallelism is NOT capped at the bucket count), footer stats are
        O(files) tiny reads on the driver.  Runs as a background
        maintenance commit, never on the epoch hot path.
        """
        m = self.manifest
        live = {int(b) for b, ds in m["buckets"].items() if ds}
        live |= {int(b) for b, ds in m.get("deltas", {}).items() if ds}
        bs = sorted(live if buckets is None else live & {int(b) for b in buckets})
        if not bs:
            return {"clustered": [], "files": 0}
        version = m["version"] + 1
        key = self.key_names
        folded = self.read(bs).withColumn("_bucket", self._bucket_expr())
        par = self.spark.sparkContext.defaultParallelism
        n_out = max(len(bs), par)
        data_rel = f"data/v{version:06d}"
        (
            folded.repartitionByRange(n_out, "_bucket", *[F.col(k) for k in key])
            .sortWithinPartitions("_bucket", *key)
            .write.partitionBy("_bucket")
            .mode("overwrite")
            # bloom filter on the first key column: inside a surviving
            # file, pushed-down key-equality predicates skip row groups
            # the zone map alone cannot exclude (parquet-level, read by
            # any engine — the third pruning tier after bucket and file)
            .option(f"parquet.bloom.filter.enabled#{key[0]}", "true")
            .parquet(os.path.join(self.path, data_rel))
        )

        new_buckets = dict(m["buckets"])
        deltas_map = {k: list(v) for k, v in m.get("deltas", {}).items()}
        file_stats = dict(m.get("file_stats", {}))
        n_files = 0
        for b in bs:
            d = f"{data_rel}/_bucket={b}"
            if os.path.isdir(os.path.join(self.path, d)):
                new_buckets[str(b)] = [d]
                stats = self._collect_file_stats(d)
                if stats is not None:
                    file_stats[str(b)] = {
                        "files": {f"{d}/{f}": mm for f, mm in stats.items()}
                    }
                    n_files += len(stats)
                else:
                    file_stats.pop(str(b), None)
            else:
                new_buckets.pop(str(b), None)  # bucket emptied by deletes
                file_stats.pop(str(b), None)
            deltas_map[str(b)] = []

        m2 = dict(m)
        m2["version"] = version
        m2["buckets"] = new_buckets
        m2["deltas"] = {b: ds for b, ds in deltas_map.items() if ds}
        m2["file_stats"] = file_stats
        self._write_manifest_static(self.path, m2)
        self.manifest = m2
        return {"clustered": bs, "files": n_files}

    def _collect_file_stats(self, rel_dir: str) -> dict | None:
        """Per-file [min, max] of the first key column from parquet
        footers — a driver-side O(files) metadata scan, no Spark job.
        Returns None when the key type has no orderable zone map."""
        k0 = self.key_names[0]
        ktype = next(c["type"] for c in self.manifest["key_cols"] if c["name"] == k0)
        if ktype not in ("string", "int", "long"):
            return None
        import pyarrow.parquet as pq

        full = os.path.join(self.path, rel_dir)
        out: dict[str, list] = {}
        for fname in sorted(os.listdir(full)):
            if not fname.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(full, fname))
            idx = pf.schema_arrow.get_field_index(k0)
            mn = mx = None
            ok = True
            for rg in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    ok = False  # e.g. all-null group — keep the file always
                    break
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    except UnicodeDecodeError:
                        ok = False
                        break
                if isinstance(lo, str) and (len(lo) >= 1024 or len(hi) >= 1024):
                    ok = False  # possible writer-side stats truncation —
                    break       # a truncated max is not a valid upper bound
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            out[fname] = [mn, mx] if ok and mn is not None else None
        return out

    @staticmethod
    def _stats_files(m: dict, b) -> dict:
        """Flat ``{relpath: [min, max] | None}`` zone-map view of a bucket's
        file stats.  Canonical layout keys by path relative to the table
        root; the legacy ``{"dir": d, "files": {fname: mm}}`` layout (pre
        partial-CoW manifests) is normalized on read.  Staleness is
        intrinsic: a map only applies to a path still listed in
        ``manifest["buckets"]`` — rewritten paths simply stop matching."""
        ent = m.get("file_stats", {}).get(str(b))
        if not ent:
            return {}
        d = ent.get("dir")
        if d is not None:
            return {f"{d}/{f}": mm for f, mm in ent.get("files", {}).items()}
        return dict(ent.get("files", {}))

    def _read_paths(self, entries: list[str], m: dict | None = None) -> DataFrame:
        """Read an explicit list of manifest entries (bucket dirs and/or
        individual parquet files) with the table schema."""
        m = m if m is not None else self.manifest
        schema = _schema_from_manifest(m["key_cols"] + m["value_cols"])
        if not entries:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(
            *[os.path.join(self.path, e) for e in entries]
        )

    def _plan_partial_cow(
        self, ch: DataFrame, touched: list[int], deltas_map: dict
    ) -> tuple[dict, list[str] | None]:
        """Decide which base entries a CoW rewrite may SKIP.

        For each touched bucket that (a) has zone maps and (b) no pending
        delta chain, a file is HOT iff some change key of this epoch lands
        inside its zone-map [min, max] — tested by one broadcast hash join
        of the persisted changes frame against the O(files) range list
        (equi-key ``_bucket``, range as join filter), distinct-collecting
        only the hit PATHS.  A file no change key hits provably has no
        full-outer-join partner, and inserts of new keys inside a cold
        file's range are impossible (such a key would be a hit), so it is
        carried forward untouched.  Per-FILE testing beats the bucket-wide
        [lo, hi] envelope for scattered epochs — two hot conversations at
        opposite ends of the keyspace keep exactly two files hot instead
        of spanning the whole bucket.  A NULL change key in a bucket
        matches every mapped file of that bucket (null keys are legal
        rows, the merge join is eqNullSafe, and nulls have no orderable
        range), reproducing the conservative whole-bucket rewrite.
        Reference analog: the reference's writer always streams the full
        change image (Builder → Writer); file-level scoping is the
        lake-side equivalent of Iceberg's copy-on-write delete-file
        granularity.

        Returns ``(cold_by_bucket, hot_entries)``; ``({}, None)`` when
        nothing can be pruned (whole-bucket rewrite — identical plan and
        job count to the non-clustered path).  ``OLR_PARTIAL_COW=0``
        disables the optimization (bench A/B + operational safety valve)."""
        if os.environ.get("OLR_PARTIAL_COW", "1") == "0":
            return {}, None
        m = self.manifest
        k0 = self.key_names[0]
        stats = {b: self._stats_files(m, b) for b in touched}
        prunable: list[int] = []
        files_by_bucket: dict[int, list[str]] = {}
        ranges: list[tuple] = []
        for b in touched:
            if not stats[b] or deltas_map.get(str(b)):
                continue
            files = self._expand_entries(m["buckets"].get(str(b), []))
            if files is None:
                continue  # an entry vanished from disk — rewrite whole
            mapped = [(p, stats[b].get(p)) for p in files]
            if not any(mm is not None for _, mm in mapped):
                continue
            prunable.append(b)
            files_by_bucket[b] = files
            ranges.extend(
                (int(b), p, mm[0], mm[1]) for p, mm in mapped if mm is not None
            )
        if not ranges:
            return {}, None
        ktype = next(c["type"] for c in m["key_cols"] if c["name"] == k0)
        kdt = _TYPE_MAP[ktype]
        rng_df = self.spark.createDataFrame(
            ranges,
            T.StructType(
                [
                    T.StructField("_pb", T.IntegerType(), False),
                    T.StructField("_pf", T.StringType(), False),
                    T.StructField("_plo", kdt, False),
                    T.StructField("_phi", kdt, False),
                ]
            ),
        )
        k = F.col(k0)
        hit = (F.col("_bucket") == F.col("_pb")) & (
            k.isNull() | ((k >= F.col("_plo")) & (k <= F.col("_phi")))
        )
        hot_paths = {
            r["_pf"]
            for r in ch.filter(F.col("_bucket").isin(prunable))
            .select("_bucket", k0)
            .join(F.broadcast(rng_df), hit, "inner")
            .select("_pf")
            .distinct()
            .collect()
        }
        cold_by_bucket: dict[int, list[str]] = {}
        hot_by_bucket: dict[int, list[str]] = {}
        for b in prunable:
            cold, hot = [], []
            for p in files_by_bucket[b]:
                if stats[b].get(p) is not None and p not in hot_paths:
                    cold.append(p)
                else:
                    hot.append(p)  # hit or unmapped → must read
            if cold:
                cold_by_bucket[b] = cold
                hot_by_bucket[b] = hot
        if not cold_by_bucket:
            return {}, None
        hot_entries: list[str] = []
        for b in touched:
            if b in hot_by_bucket:
                hot_entries.extend(hot_by_bucket[b])
            else:
                hot_entries.extend(m["buckets"].get(str(b), []))
        return cold_by_bucket, hot_entries

    def _expand_entries(self, entries: list[str]) -> list[str] | None:
        """Expand manifest bucket entries to individual parquet FILE paths
        (relative to the table root).  Dir entries (the layout cluster()
        and whole-bucket rewrites produce) are enumerated on the driver —
        O(files) listdir, the same cost class as the footer-stat read.
        Returns None if any entry is missing from disk (caller falls back
        to the whole-bucket plan and lets the read fail loudly there)."""
        out: list[str] = []
        for e in entries:
            full = os.path.join(self.path, e)
            if os.path.isfile(full):
                out.append(e)
            elif os.path.isdir(full):
                out.extend(
                    f"{e}/{f}"
                    for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")
                )
            else:
                return None
        return out

    def _read_base_pruned(self, buckets: list[int], keys: list) -> DataFrame:
        """Base read for a point lookup: each bucket's entries (dirs and
        files) are kept only when no zone map excludes every requested key;
        unmapped entries are always scanned."""
        m = self.manifest
        vals = [k for k in keys if k is not None]
        paths: list[str] = []
        for b in buckets:
            fs = self._stats_files(m, b)
            entries = m["buckets"].get(str(b), [])
            files = self._expand_entries(entries) if fs else None
            for entry in files if files is not None else entries:
                mm = fs.get(entry)
                if mm is not None and not any(mm[0] <= k <= mm[1] for k in vals):
                    continue
                paths.append(entry)
        return self._read_paths(paths)

    def buckets_for_keys(self, keys: list) -> list[int]:
        """Bucket ids for a list of first-key values — point-lookup pruning
        (Iceberg bucket-transform partition pruning analog).  One tiny local
        job so the hash is computed by the SAME engine expression that
        bucketed the data (xxhash64 has no portable Python twin)."""
        k0 = self.key_names[0]
        ktype = next(c["type"] for c in self.manifest["key_cols"] if c["name"] == k0)
        schema = T.StructType([T.StructField(k0, _TYPE_MAP[ktype], True)])
        df = self.spark.createDataFrame([(k,) for k in keys], schema)
        return sorted({r["b"] for r in df.select(self._bucket_expr().alias("b")).collect()})

    def read_for_keys(self, keys: list) -> DataFrame:
        """Pruned point lookup: scans only the buckets the keys hash into;
        within a clustered bucket (see ``cluster``) only the FILES whose
        zone map may contain a key; then filters exactly (parquet
        row-group stats prune further).  Deltas of the selected buckets
        are always read in full — they are the recent, small tail; the
        zone maps cover the large clustered base."""
        k0 = self.key_names[0]
        bs = self.buckets_for_keys(keys)
        base = self._read_base_pruned(bs, keys)
        deltas = self._read_deltas(bs)
        df = base if deltas is None else self._fold_deltas(base, deltas)
        return df.filter(F.col(k0).isin(keys))

    def vacuum(self, retain_last: int = 1) -> dict:
        """Delete data/delta/pending/lineage directories not referenced by
        the last ``retain_last`` manifest snapshots — the Iceberg
        expire_snapshots + remove_orphan_files analog.  ``retain_last=1``
        keeps only the live snapshot; larger values keep a time-travel
        window: ``read(version=v)`` works for every v whose manifest is
        inside the retained range (reference analog: the checkpoint refScn
        chain keeps history for late-client restarts,
        src/metadata/Metadata.cpp:586-613).  Readers of snapshots OUTSIDE
        the window must finish before vacuuming (same caveat as Iceberg)."""
        import glob
        import shutil

        ref: set[str] = set()
        cur = self.manifest["version"]
        for v in range(max(0, cur - max(retain_last, 1) + 1), cur + 1):
            try:
                m = self.manifest_at(v) if v != cur else self.manifest
            except ValueError:
                continue
            for ds in m["buckets"].values():
                ref.update(ds)
            for ds in m.get("deltas", {}).values():
                ref.update(ds)
            ref.update(m["pending_dirs"])
            ref.update(m.get("pending_closed_dirs", []))
            ref.update(m["lineage_dirs"])

        removed: list[str] = []
        for pattern in ("data/v*/_bucket=*", "delta/v*/_bucket=*",
                        "pending/v*", "lineage/v*"):
            for path in glob.glob(os.path.join(self.path, pattern)):
                rel = os.path.relpath(path, self.path).replace(os.sep, "/")
                # partial-CoW manifests reference individual FILES inside a
                # bucket dir — a dir survives while any file under it is live
                if rel not in ref and not any(
                    r.startswith(rel + "/") for r in ref
                ):
                    shutil.rmtree(path, ignore_errors=True)
                    removed.append(rel)
                elif rel not in ref:
                    # dir survives only via file-level refs — drop the files
                    # nothing references (per-file remove_orphan_files)
                    for f in os.listdir(path):
                        frel = f"{rel}/{f}"
                        fp = os.path.join(path, f)
                        if (
                            os.path.isfile(fp)
                            and not f.startswith(("_", "."))
                            and frel not in ref
                        ):
                            os.remove(fp)
                            removed.append(frel)
        # drop version dirs that now hold only writer marker FILES
        # (_SUCCESS, .crc) — live `_bucket=*` subdirectories disqualify
        for vd in glob.glob(os.path.join(self.path, "data/v*")) + glob.glob(
            os.path.join(self.path, "delta/v*")
        ):
            entries = os.listdir(vd)
            if all(
                os.path.isfile(os.path.join(vd, e)) and e.startswith(("_", "."))
                for e in entries
            ):
                shutil.rmtree(vd, ignore_errors=True)
        return {"removed": sorted(removed)}

    # ------------------------------------------------------------- metadata
    def pending(self, schema: T.StructType) -> DataFrame:
        return read_pending_state(self.spark, self.path, self.manifest, schema)

    def lineage(self) -> DataFrame:
        from ..schema import LINEAGE_SCHEMA

        dirs = [os.path.join(self.path, d) for d in self.manifest["lineage_dirs"]]
        dirs = [d for d in dirs if os.path.isdir(d)]
        if not dirs:
            return self.spark.createDataFrame([], LINEAGE_SCHEMA)
        return self.spark.read.schema(LINEAGE_SCHEMA).parquet(*dirs)

    def committed_epochs(self, job_id: str = "default") -> set[int]:
        """Epochs fully committed for a job.  Ledger keys are either plain
        epoch numbers or ``{epoch}:{segment}`` / ``{epoch}:done`` markers
        (segmented applies); an epoch counts only when plain or ``:done``."""
        out: set[int] = set()
        for k in self.manifest["ledger"].get(job_id, {}):
            s = str(k)
            if s.isdigit():
                out.add(int(s))
            elif s.endswith(":done"):
                out.add(int(s.split(":", 1)[0]))
        return out

    # ------------------------------------------------------------- internal
    def _read_manifest(self) -> dict:
        with open(os.path.join(self.path, "VERSION")) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.path, "manifest", f"v{v:06d}.json")) as f:
            return json.load(f)

    def refresh(self) -> "LakeTable":
        self.manifest = self._read_manifest()
        return self

    @staticmethod
    def _write_manifest_static(path: str, manifest: dict):
        v = manifest["version"]
        mdir = os.path.join(path, "manifest")
        mpath = os.path.join(mdir, f"v{v:06d}.json")
        os.makedirs(mdir, exist_ok=True)
        # Crash-safe + single-writer: the manifest is fully written to a temp
        # file, then *linked* into place — link fails if the snapshot exists
        # (concurrent-writer guard) and a crash mid-write leaves only the
        # ignored temp file, never a truncated v{N}.json.
        tmp_m = os.path.join(mdir, f".tmp.{uuid.uuid4().hex}")
        with open(tmp_m, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp_m, mpath)
        except FileExistsError:
            # A manifest at or below the VERSION pointer is a live snapshot:
            # hard conflict.  Above the pointer it is EITHER a crash orphan
            # (link succeeded, pointer swap did not) or a concurrent writer
            # mid-commit — indistinguishable by position alone, so decide by
            # CONTENT: a deterministic crash-replay regenerates the same
            # manifest (dir names are version-derived, not random) and may
            # proceed; different content means another writer's in-flight
            # commit (or a diverged orphan) and silently overwriting it would
            # lose that commit's ledger/bucket map — raise instead.
            vfile = os.path.join(path, "VERSION")
            current = -1
            if os.path.exists(vfile):
                with open(vfile) as vf:
                    current = int(vf.read().strip())
            if v <= current:
                os.unlink(tmp_m)
                raise
            try:
                with open(mpath) as ef:
                    existing = json.load(ef)
            except (json.JSONDecodeError, OSError):
                existing = None  # torn/unreadable → safe to replace
            if existing is not None and existing != manifest:
                os.unlink(tmp_m)
                raise RuntimeError(
                    f"manifest conflict at {mpath}: an unpointed manifest with "
                    "DIFFERENT content exists (concurrent writer mid-commit, or "
                    "a diverged crash orphan); refusing to overwrite — resolve "
                    "by removing the orphan or serializing writers"
                )
            os.replace(tmp_m, mpath)
        else:
            os.unlink(tmp_m)
        tmp = os.path.join(path, f".VERSION.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(path, "VERSION"))  # atomic pointer swap
