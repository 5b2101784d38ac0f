"""Trained IVF centroids vs md5 pseudo-centroids on a CLUSTERED corpus.

Round-3 verdict honest-gap: md5 centroids partition space uniformly, so on
a clustered real corpus the inverted lists don't follow the data's density
and recall at fixed n_probe suffers.  This test builds a corpus with
planted clusters (the adversarial case for uniform centroids), trains
spherical k-means on a deterministic sample, and asserts trained recall
>= md5 recall at equal n_probe — plus determinism of the training itself
(the property that makes the DuckDB oracle embeddable).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from openlogreplicator_spark.functions.similarity import (
    brute_force_topk,
    centroid_matrix,
    ivf_topk,
    train_ivf_centroids,
)

DIM = 32
K_CLUSTERS = 8
PER_CLUSTER = 150


def _clustered_corpus():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(K_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(K_CLUSTERS):
        pts = centers[c] + 0.15 * rng.normal(size=(PER_CLUSTER, DIM))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for p in pts:
            rows.append((vid, [float(x) for x in p]))
            vid += 1
    return rows


def _recall(spark, corpus_df, queries_df, truth, centroids, n_probe):
    approx = ivf_topk(
        corpus_df, queries_df, k=5, n_centroids=K_CLUSTERS, n_probe=n_probe,
        dim=DIM, centroids=centroids,
    )
    got = {}
    for r in approx.collect():
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    return hits / total


def test_trained_centroids_beat_md5_on_clustered_corpus(spark):
    rows = _clustered_corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    corpus = df
    truth = {}
    for r in brute_force_topk(corpus, queries, k=5).collect():
        truth.setdefault(r["q_id"], set()).add(r["n_id"])

    sample = [v for _, v in rows[:: max(1, len(rows) // 1000)]]
    trained = train_ivf_centroids(sample, n_centroids=K_CLUSTERS, iters=10)
    md5 = centroid_matrix(K_CLUSTERS, DIM)

    r_trained = _recall(spark, corpus, queries, truth, trained, n_probe=2)
    r_md5 = _recall(spark, corpus, queries, truth, md5, n_probe=2)
    assert r_trained >= r_md5, (r_trained, r_md5)
    # trained centroids should essentially recover the planted clusters
    assert r_trained >= 0.9, r_trained


def test_training_is_deterministic_and_oracle_reproducible():
    rows = _clustered_corpus()
    sample = [v for _, v in rows[::7]]
    a = train_ivf_centroids(sample, n_centroids=4, iters=6)
    b = train_ivf_centroids(list(sample), n_centroids=4, iters=6)
    assert a == b
    assert len(a) == 4 and all(len(c) == DIM for c in a)
    # unit-norm centroids (spherical k-means invariant)
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_deterministic_sample_matches_engine_free_path(tmp_path):
    """sample_vectors_deterministic is pyarrow-only: the oracle side can
    reproduce the exact training set (and therefore the exact centroid
    literals) with no Spark/DuckDB in the loop."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openlogreplicator_spark.functions.similarity import (
        sample_vectors_deterministic,
    )

    rows = _clustered_corpus()[:50]
    t = pa.table(
        {
            "vec_id": [r[0] for r in rows],
            "embedding": [r[1] for r in rows],
        }
    )
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    s1 = sample_vectors_deterministic(p, n=10)
    s2 = sample_vectors_deterministic(p, n=10)
    assert s1 == s2 and len(s1) == 10
    import hashlib

    order = sorted(
        range(len(rows)), key=lambda i: hashlib.md5(str(rows[i][0]).encode()).hexdigest()
    )
    want = [[pytest.approx(x, abs=1e-6) for x in rows[i][1]] for i in order[:10]]
    for got, exp in zip(s1, want):
        assert got == exp
