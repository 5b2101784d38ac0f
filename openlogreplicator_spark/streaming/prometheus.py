"""Prometheus metrics endpoint — the reference's MetricsPrometheus analog.

The reference exposes runtime counters/gauges over an HTTP endpoint that
Prometheus scrapes (src/common/metrics/MetricsPrometheus.cpp:24-279,
documentation/metrics/metrics.adoc), configured as
``{"metrics": {"type": "prometheus", "bind": "host:port", "tag-names": ...}}``
(src/OpenLogReplicator.cpp:365-412).  This module replicates the metric
VOCABULARY — the same names, types, and label sets — fed from counters the
Spark engine already holds driver-side after each epoch (lineage counters,
fused epoch stats, wire-writer frame counts), so enabling metrics adds ZERO
Spark actions; rendering is a pure in-memory scrape.

Name-by-name mapping (metrics.adoc order; "vacuous" = the quantity does not
exist in the Spark execution model and stays 0):

* ``bytes_confirmed`` / ``messages_confirmed`` — network-writer CONFIRM
  frames processed (sources/network.py).
* ``bytes_parsed`` / ``bytes_read`` — parquet feed bytes consumed by a
  drain (equal here: the typed feed has no non-data filler blocks).
* ``bytes_sent`` / ``messages_sent`` — wire egress (network stream frames,
  rotating-file writer lines).
* ``checkpoints{filter=out|skip}`` — epoch ledger commits; ``skip`` = an
  epoch that carried no net changes (the reference skips checkpoint
  records for fully-filtered stretches).
* ``checkpoint_lag`` — seconds between the newest commit timestamp applied
  and the wall clock at commit, when the feed carries timestamps.
* ``ddl_ops{type=alter|create|drop|other|purge|truncate}`` — committed DDL
  by verb.
* ``dml_ops{type=insert|update|delete, filter=out}`` — committed DML ops
  processed (pre-collapse, the reference counts operations, not net
  changes).  ``filter=skip`` is the dropped/untracked row count; the op
  type of skipped rows is not attributable post-pushdown (we filter before
  decode), so skips are reported under ``type="unknown"`` — documented
  deviation.
* ``log_switches{type=archived|online}`` — feed sequence directories
  drained (bounded drain = archived, continuous tail = online).
* ``log_switches_lag`` — vacuous (feed files carry no file-close
  timestamp).
* ``memory_allocated_mb`` / ``memory_used_total_mb`` — driver RSS peak /
  current (resource.getrusage).
* ``memory_used_mb{type=transactions}`` — pending-state (open transaction
  carry) bytes on disk; builder/parser/reader module splits are vacuous
  (Spark executors own that memory).
* ``swap_operations_mb{type=read|write|discard}`` / ``swap_usage_mb`` —
  the pending-state spill IS the reference's transaction-buffer swap
  (MemoryManager.cpp): write = pending delta bytes written, read = pending
  bytes re-read next epoch, discard = compacted/expired bytes dropped.
* ``transactions{type=commit|rollback, filter=out}`` — transaction
  outcomes observed in the epoch's control stream.
* ``service_state{state=...}`` — one-hot lifecycle gauge
  (initializing/ready/starting/replicating/finishing/aborting), same
  states as Metrics.h:76-139.

``tag-names`` (Metrics.h TAG_NAMES bits): ``filter`` adds per-table
``{owner, table}`` labeled dml_ops series next to the totals (the
reference's emitDmlOps*(counter, owner, table) variants,
MetricsPrometheus.cpp:368-460); ``sys`` would add system-object series —
the typed feed carries no SYS.* DML, so the bit is accepted and vacuous;
``all`` = both; ``none`` = totals only.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# metric name -> (type, help) — the full vocabulary from metrics.adoc so a
# scrape always advertises every series the reference documents.
METRICS: dict[str, tuple[str, str]] = {
    "bytes_confirmed": ("counter", "Number of bytes confirmed as processed by the output subsystem."),
    "bytes_parsed": ("counter", "Number of bytes parsed that contained redo-log data."),
    "bytes_read": ("counter", "Number of bytes read from redo log files."),
    "bytes_sent": ("counter", "Number of bytes sent to outputs."),
    "checkpoints": ("counter", "Total number of checkpoint records emitted."),
    "checkpoint_lag": ("gauge", "Processing lag of the last checkpoint in seconds."),
    "ddl_ops": ("counter", "Number of DDL operations observed, grouped by type."),
    "dml_ops": ("counter", "Number of DML operations observed."),
    "log_switches": ("counter", "Number of redo log switches."),
    "log_switches_lag": ("gauge", "Lag in seconds between the last operation in a redo log file and its processing."),
    "memory_allocated_mb": ("gauge", "Total memory allocated by the process in megabytes."),
    "memory_used_total_mb": ("gauge", "Total memory currently in use in megabytes."),
    "memory_used_mb": ("gauge", "Memory used by a specific module (in megabytes)."),
    "messages_confirmed": ("counter", "Number of messages confirmed by the output subsystem."),
    "messages_sent": ("counter", "Number of messages sent to outputs."),
    "service_state": ("gauge", "Service lifecycle state (one-hot)."),
    "swap_operations_mb": ("counter", "Swap space activity in megabytes."),
    "swap_usage_mb": ("gauge", "Current swap usage in megabytes."),
    "transactions": ("counter", "Number of transactions observed."),
}

SERVICE_STATES = (
    "initializing", "ready", "starting", "replicating", "finishing", "aborting",
)

_TAG_BITS = {"none": 0, "filter": 1, "sys": 4, "all": 5}


class MetricsRegistry:
    """Thread-safe counter/gauge store rendering Prometheus text format.

    One instance per engine run; apply paths and wire writers call
    :meth:`inc` / :meth:`set_gauge` with values they already hold
    driver-side.  ``enabled`` gates every hook so a disabled registry costs
    one attribute read per epoch.
    """

    def __init__(self, tag_names: str = "none"):
        if tag_names not in _TAG_BITS:
            raise ValueError(
                f'bad JSON, invalid "tag-names" value: {tag_names}, '
                'expected: one of {"all", "filter", "none", "sys"}')
        self.tag_bits = _TAG_BITS[tag_names]
        self.enabled = True
        # table -> owner (config filter.table[] entries); per-table series
        # label as {owner=<owner>, table=<name>} like the reference's
        # emitDmlOps*(counter, owner, table)
        self.owner_map: dict[str, str] = {}
        self._lock = threading.Lock()
        self._counters: dict[tuple, float] = {}
        self._gauges: dict[tuple, float] = {}
        self._state = "initializing"

    @property
    def tag_names_filter(self) -> bool:
        return bool(self.tag_bits & 1)

    # -- write side -----------------------------------------------------
    @staticmethod
    def _key(name: str, labels: dict | None) -> tuple:
        return (name, tuple(sorted((labels or {}).items())))

    def inc(self, name: str, value: float = 1.0, **labels) -> None:
        if value == 0:
            return
        k = self._key(name, labels)
        with self._lock:
            self._counters[k] = self._counters.get(k, 0.0) + value

    def set_gauge(self, name: str, value: float, **labels) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def set_state(self, state: str) -> None:
        """One-hot service_state, Metrics.h emitServiceState* semantics."""
        if state not in SERVICE_STATES:
            raise ValueError(f"unknown service state: {state}")
        with self._lock:
            self._state = state

    def counter_value(self, name: str, **labels) -> float:
        with self._lock:
            return self._counters.get(self._key(name, labels), 0.0)

    def gauge_value(self, name: str, **labels) -> float:
        with self._lock:
            return self._gauges.get(self._key(name, labels), 0.0)

    # -- scrape side ------------------------------------------------------
    @staticmethod
    def _render_labels(labels: tuple) -> str:
        if not labels:
            return ""
        esc = lambda v: str(v).replace("\\", r"\\").replace('"', r"\"")
        return "{" + ",".join(f'{k}="{esc(v)}"' for k, v in labels) + "}"

    def render(self) -> str:
        """Prometheus text exposition (v0.0.4): every documented metric
        advertised with # HELP/# TYPE; zero-valued unlabeled series are
        rendered explicitly (the reference registers all families at
        initialize(), MetricsPrometheus.cpp:41-279)."""
        with self._lock:
            counters = dict(self._counters)
            gauges = dict(self._gauges)
            state = self._state
        for s in SERVICE_STATES:
            gauges[("service_state", (("state", s),))] = 1.0 if s == state else 0.0
        out = []
        for name, (mtype, help_) in sorted(METRICS.items()):
            out.append(f"# HELP {name} {help_}")
            out.append(f"# TYPE {name} {mtype}")
            store = counters if mtype == "counter" else gauges
            series = sorted(
                (labels, v) for (n, labels), v in store.items() if n == name
            )
            if not series:
                series = [((), 0.0)]
            for labels, v in series:
                val = ("%d" % v) if float(v).is_integer() else repr(float(v))
                out.append(f"{name}{self._render_labels(labels)} {val}")
        return "\n".join(out) + "\n"

    # -- epoch hook -------------------------------------------------------
    def observe_epoch(
        self,
        counts: dict | None = None,
        dml_by_type: tuple[int, int, int] | None = None,
        dml_by_table_typed: dict | None = None,
        n_skipped: int = 0,
        n_commits: int = 0,
        n_rollbacks: int = 0,
        ddls: list | None = None,
        had_changes: bool = True,
        checkpoint_lag_s: float | None = None,
        pending_bytes: int | None = None,
        pending_written_bytes: int = 0,
        pending_read_bytes: int = 0,
        pending_discarded_bytes: int = 0,
    ) -> None:
        """Fold one applied epoch's driver-side scalars into the registry.

        ``dml_by_type`` is (ins, upd, del) pre-collapse op counts; when the
        caller only has collapsed net changes it may pass ``counts`` (the
        stats 'cnt' map) instead and the fold sums it — documented as net
        semantics in that configuration.
        """
        if not self.enabled:
            return
        if dml_by_type is None and counts:
            ins = sum(v[0] for v in counts.values())
            upd = sum(v[1] for v in counts.values())
            dele = sum(v[2] for v in counts.values())
            dml_by_type = (ins, upd, dele)
        if dml_by_type is not None:
            ins, upd, dele = dml_by_type
            self.inc("dml_ops", ins, type="insert", filter="out")
            self.inc("dml_ops", upd, type="update", filter="out")
            self.inc("dml_ops", dele, type="delete", filter="out")
        if self.tag_names_filter and dml_by_table_typed:
            for table, (ins, upd, dele) in dml_by_table_typed.items():
                owner, _, tname = str(table).rpartition(".")
                owner = owner or self.owner_map.get(tname, "")
                lbl = {"owner": owner, "table": tname, "filter": "out"}
                self.inc("dml_ops", ins, type="insert", **lbl)
                self.inc("dml_ops", upd, type="update", **lbl)
                self.inc("dml_ops", dele, type="delete", **lbl)
        self.inc("dml_ops", n_skipped, type="unknown", filter="skip")
        self.inc("transactions", n_commits, type="commit", filter="out")
        self.inc("transactions", n_rollbacks, type="rollback", filter="out")
        for d in ddls or []:
            stmt = (d[-1] or "") if isinstance(d, tuple) else str(d)
            verb = stmt.strip().split(None, 1)[0].lower() if stmt.strip() else ""
            if verb == "truncate":
                t = "truncate"
            elif verb == "purge":
                t = "purge"
            elif verb in ("create", "drop", "alter"):
                t = verb
            else:
                t = "other"
            self.inc("ddl_ops", 1, type=t)
        self.inc("checkpoints", 1, filter="out" if had_changes else "skip")
        if checkpoint_lag_s is not None:
            self.set_gauge("checkpoint_lag", round(checkpoint_lag_s, 3))
        if pending_bytes is not None:
            self.set_gauge("memory_used_mb", round(pending_bytes / 2**20, 3),
                           type="transactions")
            self.set_gauge("swap_usage_mb", round(pending_bytes / 2**20, 3))
        self.inc("swap_operations_mb", round(pending_written_bytes / 2**20, 6),
                 type="write")
        self.inc("swap_operations_mb", round(pending_read_bytes / 2**20, 6),
                 type="read")
        self.inc("swap_operations_mb", round(pending_discarded_bytes / 2**20, 6),
                 type="discard")
        self._observe_process_memory()

    def _observe_process_memory(self) -> None:
        try:
            import resource

            peak_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            self.set_gauge("memory_allocated_mb", round(peak_kb / 1024, 1))
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            self.set_gauge(
                "memory_used_total_mb", round(rss_pages * 4096 / 2**20, 1))
        except Exception:
            pass  # non-Linux: the gauges simply stay at their last value


# -- process-wide default registry -------------------------------------------
_default: MetricsRegistry | None = None
_default_lock = threading.Lock()


def get_registry() -> MetricsRegistry | None:
    """The active registry, or None when metrics are disabled (hooks must
    treat None as a no-op)."""
    return _default


def enable(tag_names: str = "none") -> MetricsRegistry:
    global _default
    with _default_lock:
        _default = MetricsRegistry(tag_names)
    return _default


def disable() -> None:
    global _default
    with _default_lock:
        _default = None


class PrometheusServer:
    """Scrape endpoint: GET /metrics renders the registry.

    stdlib ThreadingHTTPServer on a daemon thread — the reference links
    prometheus-cpp's Exposer (MetricsPrometheus.cpp:279); the exposition
    text is what Prometheus actually consumes, so the wire contract is the
    text format, not the library."""

    def __init__(self, bind: str, registry: MetricsRegistry):
        host, _, port = bind.rpartition(":")
        self.registry = registry
        reg = registry

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib casing)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = reg.render().encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # silence per-scrape stderr lines
                pass

        self._srv = ThreadingHTTPServer((host or "0.0.0.0", int(port)), Handler)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(
            target=self._srv.serve_forever, name="prometheus-exposer", daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        self._thread.join(timeout=5)
