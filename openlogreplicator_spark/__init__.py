"""openlogreplicator_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the *pipeline semantics* of
rophy/OpenLogReplicator (reference at /root/reference, C++): tail a WAL-style
change feed of transcript mutations, assemble interleaved transactions in
commit order, deduplicate, and MERGE the net changes into a lake table with
exactly-once semantics, schema evolution, checkpoint resume, and
per-partition lineage.

This is NOT a port.  The reference is a single-threaded byte-level redo-log
parser (see SURVEY.md); this engine is declarative PySpark: DataFrame ops +
window functions + Structured Streaming.  Every stage is expressed so
Catalyst can push filters into the parquet scan, prune columns, and pick
broadcast joins; the only Python in the hot path is vectorized Arrow
(pandas) UDFs, and those only where built-ins genuinely cannot express the
semantics.

Module map (reference analogs cited per file):
  schema.py             feed / table / lineage schemas (RedoLogRecord analog)
  session.py            tuned SparkSession builders
  feedgen.py            deterministic synthetic change-feed generator
  oracle.py             sequential reference replay (the "LogMiner oracle")
  lake/table.py         snapshot-versioned bucketed lake table (Iceberg stand-in)
  operators/assemble.py transaction assembly (TransactionBuffer analog)
  operators/collapse.py net-change collapse / last-writer-wins (Builder analog)
  operators/filters.py  tracked-table / condition / xid filters
  streaming/job.py      Structured Streaming wiring (Replicator analog)
  streaming/apply.py    per-epoch apply: DDL fence, MERGE, ledger (Writer analog)
  functions/            decode helpers + training-data-pipeline operators
"""

__version__ = "0.1.0"
