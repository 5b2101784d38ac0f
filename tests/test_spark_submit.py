"""Delivery-mode proof: the engine runs as `spark-submit --py-files
openlogreplicator_spark.zip job.py …` with the package resolved ONLY from
the zip (job.py is copied to a neutral directory so the repo checkout is
not on sys.path).  This is the cluster deployment path from README /
SURVEY §7 — the same invocation works against a real master URL."""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(spark, tmpdir_path):
    from openlogreplicator_spark.feedgen import generate_scaled_feed
    from openlogreplicator_spark.lake import LakeTable

    feed = os.path.join(tmpdir_path, "feed")
    generate_scaled_feed(feed, n_txns=300, n_convs=80, n_files=4, n_shards=2)

    # package the engine exactly as the README instructs
    stage = os.path.join(tmpdir_path, "stage")
    os.makedirs(stage)
    zip_path = os.path.join(stage, "openlogreplicator_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(REPO, "openlogreplicator_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    shutil.copy(os.path.join(REPO, "job.py"), stage)

    table = os.path.join(tmpdir_path, "tbl")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(stage, "job.py"),
            "stream", "--feed", feed, "--table", table,
            "--checkpoint", ckpt, "--buckets", "4",
        ],
        cwd=stage,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    assert "stream drained" in proc.stdout

    # the submitted job and an in-process reader see the same committed state
    t = LakeTable(spark, table)
    n = t.read().count()
    assert n > 0
    assert f"rows={n}" in proc.stdout
    assert t.lineage().count() > 0
