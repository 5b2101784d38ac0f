"""Prometheus metrics endpoint — reference MetricsPrometheus analog.

Covers the metric vocabulary (documentation/metrics/metrics.adoc), the
``{"metrics": {"type": "prometheus", "bind", "tag-names"}}`` config dial
(src/OpenLogReplicator.cpp:365-412), the text exposition endpoint, and the
epoch-fold correctness of dml_ops / transactions / ddl_ops / checkpoints
against feed-known counts.
"""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from openlogreplicator_spark.config import (
    ConfigError,
    plan_from_config,
    run_from_config,
)
from openlogreplicator_spark.feedgen import FeedBuilder
from openlogreplicator_spark.streaming import prometheus
from openlogreplicator_spark.streaming.prometheus import (
    MetricsRegistry,
    PrometheusServer,
)

from test_config import _base_cfg


@pytest.fixture(autouse=True)
def _clean_registry():
    yield
    prometheus.disable()


# ---------------------------------------------------------------------------
# Registry / renderer units (no Spark)
# ---------------------------------------------------------------------------

def test_render_advertises_full_vocabulary():
    reg = MetricsRegistry()
    text = reg.render()
    # every documented family appears with HELP+TYPE even before traffic
    for name, (mtype, _) in prometheus.METRICS.items():
        assert f"# TYPE {name} {mtype}" in text
    # unlabeled zero series rendered explicitly
    assert "\nbytes_read 0" in text
    # service_state is one-hot on initializing
    assert 'service_state{state="initializing"} 1' in text
    assert 'service_state{state="replicating"} 0' in text


def test_counter_and_gauge_rendering():
    reg = MetricsRegistry()
    reg.inc("dml_ops", 3, type="insert", filter="out")
    reg.inc("dml_ops", 3, type="insert", filter="out")
    reg.set_gauge("checkpoint_lag", 1.5)
    reg.set_state("replicating")
    text = reg.render()
    assert 'dml_ops{filter="out",type="insert"} 6' in text
    assert "checkpoint_lag 1.5" in text
    assert 'service_state{state="replicating"} 1' in text
    assert 'service_state{state="initializing"} 0' in text


def test_tag_names_validation():
    with pytest.raises(ValueError, match="tag-names"):
        MetricsRegistry("bogus")
    for ok in ("none", "filter", "sys", "all"):
        MetricsRegistry(ok)
    # config parse uses the reference's error text (OpenLogReplicator.cpp:393)
    cfg = _base_cfg("/tmp/feed", "/tmp/state")
    cfg["metrics"] = {"type": "prometheus", "tag-names": "wat"}
    with pytest.raises(ConfigError, match='invalid "tag-names" value: wat'):
        plan_from_config(cfg)


def test_observe_epoch_ddl_verbs_and_skips():
    reg = MetricsRegistry()
    reg.observe_epoch(
        dml_by_type=(5, 2, 1),
        n_skipped=4,
        n_commits=3,
        n_rollbacks=1,
        ddls=[(10, 0, "ALTER TABLE t ADD COLUMN x"),
              (11, 0, "create table u (a int)"),
              (12, 0, "TRUNCATE TABLE t"),
              (13, 0, "COMMENT ON TABLE t IS 'hi'")],
        had_changes=True,
    )
    assert reg.counter_value("dml_ops", type="insert", filter="out") == 5
    assert reg.counter_value("dml_ops", type="update", filter="out") == 2
    assert reg.counter_value("dml_ops", type="delete", filter="out") == 1
    assert reg.counter_value("dml_ops", type="unknown", filter="skip") == 4
    assert reg.counter_value("transactions", type="commit", filter="out") == 3
    assert reg.counter_value("transactions", type="rollback", filter="out") == 1
    assert reg.counter_value("ddl_ops", type="alter") == 1
    assert reg.counter_value("ddl_ops", type="create") == 1
    assert reg.counter_value("ddl_ops", type="truncate") == 1
    assert reg.counter_value("ddl_ops", type="other") == 1
    assert reg.counter_value("checkpoints", filter="out") == 1


def test_http_endpoint_scrape():
    reg = MetricsRegistry()
    reg.inc("messages_sent", 7)
    srv = PrometheusServer("127.0.0.1:0", reg)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/metrics") as resp:
            assert resp.status == 200
            assert "version=0.0.4" in resp.headers["Content-Type"]
            body = resp.read().decode()
        assert "messages_sent 7" in body
        # non-metrics path 404s
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.close()


# ---------------------------------------------------------------------------
# End-to-end: config-driven run folds epoch counters, endpoint serves them
# ---------------------------------------------------------------------------

def _metrics_feed(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a")
    t.ins("c1", 1, role="assistant", text="b")
    fb.commit(t)
    t = fb.begin()
    t.upd("c1", 0, text="a2")
    fb.commit(t)
    t = fb.begin()
    t.ins("zz", 0, role="user", text="discard-me")
    fb.rollback(t)          # rollback txn: its DML must NOT count as out
    fb.new_seq()
    t = fb.begin()
    t.delete("c1", 1)
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)
    return fb, feed_dir


def _scrape(port: int) -> dict[str, float]:
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as resp:
        body = resp.read().decode()
    out = {}
    for line in body.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        out[name] = float(val)
    return out


def test_run_from_config_prometheus_endpoint(spark, tmpdir_path):
    fb, feed_dir = _metrics_feed(spark, tmpdir_path)
    cfg = _base_cfg(feed_dir, os.path.join(tmpdir_path, "state"))
    cfg["metrics"] = {"type": "prometheus", "bind": "127.0.0.1:0"}
    table = run_from_config(spark, cfg)
    srv = table.prometheus_server
    try:
        m = _scrape(srv.port)
        # feed-known op counts: 3 committed inserts... the rolled-back
        # insert is dropped pre-commit, so out = 2 ins, 1 upd, 1 del
        assert m['dml_ops{filter="out",type="insert"}'] == 2
        assert m['dml_ops{filter="out",type="update"}'] == 1
        assert m['dml_ops{filter="out",type="delete"}'] == 1
        # 3 commits + 1 rollback observed in the control stream
        assert m['transactions{filter="out",type="commit"}'] == 3
        assert m['transactions{filter="out",type="rollback"}'] == 1
        assert m['checkpoints{filter="out"}'] >= 1
        # two seq dirs drained (bounded drain = archived)
        assert m['log_switches{type="archived"}'] == 2
        assert m["bytes_read"] > 0
        assert m["bytes_parsed"] == m["bytes_read"]
        # bounded batch run finished
        assert m['service_state{state="finishing"}'] == 1
        assert m["memory_used_total_mb"] > 0
    finally:
        srv.close()
    # the final lake state is unaffected by metrics (2 rows: c1/0 upd, c1/1
    # deleted)
    rows = {(r.conv_id, r.turn_idx): r.text for r in table.read().collect()}
    assert rows == {("c1", 0): "a2"}


def test_tag_names_filter_per_table_series(spark, tmpdir_path):
    fb = FeedBuilder()
    t = fb.begin()
    t.ins("c1", 0, role="user", text="a")
    t.dml_other_table("summaries", "s1", 0, op="ins", text="s")
    fb.commit(t)
    feed_dir = os.path.join(tmpdir_path, "feed")
    fb.write_parquet(spark, feed_dir)

    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"),
        tables=[{"owner": "O1", "table": "transcripts"},
                {"owner": "O1", "table": "summaries"}])
    cfg["metrics"] = {"type": "prometheus", "bind": "127.0.0.1:0",
                      "tag-names": "filter"}
    catalog = run_from_config(spark, cfg)
    srv = catalog.prometheus_server
    try:
        m = _scrape(srv.port)
        # totals AND per-table series (MetricsPrometheus.cpp:368-460)
        assert m['dml_ops{filter="out",type="insert"}'] == 2
        assert m['dml_ops{filter="out",owner="O1",table="transcripts",type="insert"}'] == 1
        assert m['dml_ops{filter="out",owner="O1",table="summaries",type="insert"}'] == 1
    finally:
        srv.close()


def test_file_writer_counts_messages(spark, tmpdir_path):
    fb, feed_dir = _metrics_feed(spark, tmpdir_path)
    out_dir = os.path.join(tmpdir_path, "out")
    os.makedirs(out_dir)
    cfg = _base_cfg(
        feed_dir, os.path.join(tmpdir_path, "state"), reader_type="offline",
        writer={"type": "file", "output": os.path.join(out_dir, "o-%5i.json"),
                "max-file-size": 1 << 20})
    cfg["metrics"] = {"type": "prometheus", "bind": "127.0.0.1:0"}
    table = run_from_config(spark, cfg)
    srv = table.prometheus_server
    try:
        m = _scrape(srv.port)
        n_lines = 0
        for f in os.listdir(out_dir):
            with open(os.path.join(out_dir, f)) as fh:
                n_lines += sum(1 for ln in fh if ln.strip())
        assert n_lines > 0
        assert m["messages_sent"] == n_lines
        assert m["messages_confirmed"] == n_lines
        assert m["bytes_sent"] > 0
    finally:
        srv.close()
