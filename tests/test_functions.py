"""Unit tests for the training-data-pipeline operators and decode helpers."""

import os

from pyspark.sql import functions as F

from openlogreplicator_spark.functions.dedup import (
    exact_dedup,
    hamming_distance,
    lww_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from openlogreplicator_spark.functions.similarity import (
    brute_force_topk,
    cosine,
    lsh_topk,
)
from openlogreplicator_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (2, "the quick brown fox jumps over the lazy dog in the evening sun"),  # near-dup of 1
    (3, "completely different content about machine learning and spark pipelines"),
    (4, "the quick brown fox jumps over the lazy dog in the morning sun"),  # exact dup of 1
    (5, "der hund und die katze sind mit dem ball von der wiese"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark)).collect()
    groups = {r["rep_id"]: r["n_dups"] for r in out}
    assert groups[1] == 2  # docs 1 and 4
    assert len(out) == 4


def test_minhash_finds_near_dups(spark):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(_docs(spark), n_hashes=16, n_bands=8).collect()
    }
    assert (1, 4) in pairs            # exact dups always collide
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dups share most bands
    assert (1, 3) not in pairs and (3, 5) not in pairs


def test_jaccard_verifier(spark):
    docs = _docs(spark)
    pairs = minhash_candidate_pairs(docs, n_hashes=16, n_bands=8)
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, pairs, threshold=0.5).collect()
    }
    assert verified[(1, 4)] == 1.0
    assert 0.5 <= verified[(1, 2)] < 1.0


def test_simhash_distance(spark):
    df = _docs(spark).select("doc_id", simhash(F.col("text"), 16).alias("sh"))
    rows = {r["doc_id"]: r["sh"] for r in df.collect()}
    d = spark.createDataFrame(
        [(rows[1], rows[2]), (rows[1], rows[3]), (rows[1], rows[4])], ["a", "b"]
    ).select(hamming_distance(F.col("a"), F.col("b"), 16).alias("h")).collect()
    near, far, exact = d[0]["h"], d[1]["h"], d[2]["h"]
    assert exact == 0
    assert near < far


def test_lww_dedup(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], ["k", "v", "x"]
    )
    out = {r["k"]: r["x"] for r in lww_dedup(df, ["k"], ["v"]).collect()}
    assert out == {1: "b", 2: "c"}


def test_cosine_and_topk(spark):
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.9, 0.1]), (12, [0.0, 1.0]), (13, [-1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame([(1, [1.0, 0.0])], ["q_id", "embedding"])
    out = brute_force_topk(corpus, queries, k=2).orderBy("rank").collect()
    assert [r["n_id"] for r in out] == [10, 11]
    assert out[0]["cos_sim"] == 1.0


def test_lsh_topk_recall(spark, tmpdir_path):
    """LSH ANN recall@5 vs brute force on the synthetic embeddings.

    These vectors are near-uniform random — the LSH worst case (no cluster
    structure for the hyperplanes to exploit), so the bar is modest; with
    real embedding manifolds recall at the same cost is far higher."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r["q_id"], r["n_id"]) for r in brute_force_topk(c, q, k=5).collect()}
    approx = {(r["q_id"], r["n_id"]) for r in lsh_topk(c, q, k=5, n_planes=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_text_functions(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox, it is that good for the win and of it."),
            (2, "la de el que y en los del se las casa"),
            (3, "这是一个中文文档"),
            (4, "x"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n"),
            quality_score(F.col("text")).alias("q"),
            lang_id(F.col("text")).alias("lang"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "es"
    assert out[3]["lang"] == "zh"
    assert out[1]["n"] == 14
    assert 0.0 <= out[4]["q"] < out[1]["q"] <= 1.0
    # fingerprint is word-order / punctuation independent
    df2 = spark.createDataFrame(
        [(1, "good the for quick IT brown fox is that and win of it!!!")],
        ["doc_id", "text"],
    )
    fp2 = df2.select(fingerprint(F.col("text")).alias("fp")).collect()[0]["fp"]
    assert fp2 == out[1]["fp"]


def test_decode_helpers(spark):
    from openlogreplicator_spark.functions.decode import (
        encode_rowid,
        format_xid,
        json_field,
        parse_xid,
    )

    df = spark.createDataFrame([(7, 3, 255, '{"k": 42}', "7.3.000000ff")],
                               ["usn", "slt", "sqn", "props", "xid"])
    r = df.select(
        format_xid(F.col("usn"), F.col("slt"), F.col("sqn")).alias("xid_str"),
        json_field(F.col("props"), "k").cast("int").alias("k"),
        parse_xid(F.col("xid")).alias("px"),
        encode_rowid(F.lit(1234), F.lit(567890), F.lit(12)).alias("rid"),
    ).collect()[0]
    assert r["xid_str"] == "0x0007.003.000000ff"
    assert r["k"] == 42
    assert r["px"]["usn"] == 7 and r["px"]["sqn"] == 255
    assert len(r["rid"]) == 18


def test_resolve_clusters_topology(spark):
    """Connected components on a known graph: chain a-b-c, pair d-e,
    singleton f (via docs) — representatives are component minima."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("d", "e")], ["id_a", "id_b"]
    )
    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("f",)], ["doc_id"]
    )
    got = {
        r["doc_id"]: (r["rep_id"], r["keep"])
        for r in resolve_clusters(pairs, docs).collect()
    }
    assert got == {
        "a": ("a", True), "b": ("a", False), "c": ("a", False),
        "d": ("d", True), "e": ("d", False), "f": ("f", True),
    }


def test_resolve_clusters_long_chain(spark):
    """A 20-node path graph (worst-case diameter) still converges within
    the pointer-jumping round budget."""
    from openlogreplicator_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(19)], ["id_a", "id_b"]
    )
    rows = resolve_clusters(pairs).collect()
    assert len(rows) == 20
    assert {r["rep_id"] for r in rows} == {"n00"}
    assert sum(r["keep"] for r in rows) == 1


def test_resolve_clusters_reliable_checkpoint(spark, tmpdir_path):
    """With a context checkpoint dir set, lineage truncation switches to
    reliable .checkpoint() (survives executor loss on a real cluster) and
    the result is identical to the localCheckpoint path."""
    from openlogreplicator_spark.functions.dedup import resolve_clusters

    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("d", "e")], ["id_a", "id_b"]
    )
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckdir = os.path.join(tmpdir_path, "rdd-ckpt")
    sc.setCheckpointDir(ckdir)
    try:
        got = {
            r["doc_id"]: (r["rep_id"], r["keep"])
            for r in resolve_clusters(pairs).collect()
        }
        assert got == {
            "a": ("a", True), "b": ("a", False), "c": ("a", False),
            "d": ("d", True), "e": ("d", False),
        }
        assert os.listdir(ckdir)  # reliable checkpoint files were written
    finally:
        # restore: other tests expect no checkpoint dir ($-named scala
        # setter is not reachable by attribute syntax, hence getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))


def test_embedding_near_dups_requires_bucket(spark):
    """All-pairs cross join must be an explicit opt-in."""
    import pytest

    from openlogreplicator_spark.functions.dedup import embedding_near_dups

    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [1.0, 0.01])],
                               ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        embedding_near_dups(df)
    out = embedding_near_dups(df, threshold=0.9, allow_cross_join=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]


def test_lsh_dim_contract_and_shuffle_path(spark):
    """Fixed-dim contract: vectors whose length != dim get a NULL bucket and
    drop out of candidate generation (round-3 advice: mismatched lengths
    must not silently collapse into bucket 0).  Also exercises the
    measured-broadcast fallback: with broadcast_query_limit=0 the query
    side goes through the shuffle equi-join and results are identical."""
    from openlogreplicator_spark.functions.similarity import hyperplane_bucket

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    c = emb.filter(F.col("vec_id") >= 10)

    # a 3-component vector against dim=64 planes → NULL bucket
    odd = spark.createDataFrame([(99, [1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    b = odd.select(hyperplane_bucket(F.col("embedding"), 4, 64).alias("b")).first()["b"]
    assert b is None

    # mismatched corpus rows never appear as neighbors
    mixed = c.select("vec_id", "embedding").unionByName(
        odd.select(F.col("vec_id"), F.col("embedding").cast("array<float>"))
    )
    got = lsh_topk(mixed, q, k=5, n_planes=3).collect()
    assert all(r["n_id"] != 99 for r in got)

    # shuffle path (query side measured too big to broadcast) ≡ broadcast path
    bc = {(r["q_id"], r["n_id"]) for r in lsh_topk(c, q, k=5, n_planes=3).collect()}
    sh = {(r["q_id"], r["n_id"])
          for r in lsh_topk(c, q, k=5, n_planes=3, broadcast_query_limit=0).collect()}
    assert bc == sh


def test_ivf_topk_recall(spark):
    """IVF centroid-bucketed ANN recall@5 vs brute force (same modest bar
    as LSH on near-uniform random vectors: no cluster structure for the
    coarse quantizer to exploit; real embedding manifolds do far better)."""
    from openlogreplicator_spark.functions.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    c = emb.filter(F.col("vec_id") >= 10)
    exact = {(r["q_id"], r["n_id"]) for r in brute_force_topk(c, q, k=5).collect()}
    approx = {(r["q_id"], r["n_id"])
              for r in ivf_topk(c, q, k=5, n_centroids=8, n_probe=4, dim=64).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    # probing more centroids strictly widens the candidate set
    approx2 = {(r["q_id"], r["n_id"])
               for r in ivf_topk(c, q, k=5, n_centroids=8, n_probe=8, dim=64).collect()}
    recall2 = len(exact & approx2) / len(exact)
    assert recall2 >= recall


def test_ivf_precomputed_cells_match_inline(spark):
    """assign_ivf_cells at ingest + ivf_topk(precomputed_cell_col=...) must
    return exactly the inline-assignment results (the production shape:
    cell id stored once, queries skip the corpus scan)."""
    from openlogreplicator_spark.functions.similarity import (
        assign_ivf_cells,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("q_id"), "embedding")
    c = emb.filter(F.col("vec_id") >= 10)
    inline = {(r["q_id"], r["n_id"], r["rank"])
              for r in ivf_topk(c, q, k=5, n_centroids=8, n_probe=3, dim=64).collect()}
    pre = assign_ivf_cells(c, n_centroids=8, dim=64)
    stored = {(r["q_id"], r["n_id"], r["rank"])
              for r in ivf_topk(pre, q, k=5, n_centroids=8, n_probe=3, dim=64,
                                precomputed_cell_col="ivf_cid").collect()}
    assert inline == stored and len(inline) == 50


def test_decode_xmltype(spark):
    """P10 XMLTYPE extraction (reference Builder.cpp:143-148, experimental
    there as well): XML payloads as strings + native xpath extraction."""
    from pyspark.sql import functions as F

    from openlogreplicator_spark.functions.decode import (
        decode_xmltype,
        decode_xmltype_list,
    )

    df = spark.createDataFrame(
        [("<doc><title>t1</title><tag>a</tag><tag>b</tag></doc>",),
         ("<doc><title>t2</title></doc>",),
         (None,)],
        "x string",
    )
    out = df.select(
        decode_xmltype(F.col("x"), "/doc/title/text()").alias("title"),
        decode_xmltype_list(F.col("x"), "/doc/tag/text()").alias("tags"),
    ).collect()
    assert [r["title"] for r in out] == ["t1", "t2", None]
    assert out[0]["tags"] == ["a", "b"] and out[1]["tags"] == []
