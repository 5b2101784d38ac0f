"""Similarity search over embedding columns (array<float>).

* ``cosine`` / ``dot`` — pure column expressions (F.zip_with + F.aggregate),
  JVM-side, no UDF.
* ``brute_force_topk`` — exact baseline: query-set broadcast cross join +
  per-query top-k window.  Right answer, O(N·Q) — the verifier for the
  approximate path and fine when Q is small.
* ``hyperplane_bucket`` / ``lsh_topk`` — the scale path: random-hyperplane
  LSH (sign bits of dot products with deterministic pseudo-random planes)
  buckets the corpus; top-k search joins only within the query's bucket
  (plus optional multi-probe).  At 10^10 vectors you'd add IVF centroids;
  the plumbing (bucket → co-partitioned join) is the same.

Planes are derived deterministically from md5, not an RNG, so results are
reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id") -> DataFrame:
    """Exact top-k by cosine for each query vector.  The query side is
    broadcast (small); ties broken by neighbor id for determinism."""
    c = corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    q = queries.select(F.col(q_id_col), F.col(vec_col).alias("q_vec"))
    j = c.crossJoin(F.broadcast(q))
    sim = F.round(cosine(F.col("n_vec"), F.col("q_vec")), 6).alias("cos_sim")
    scored = j.select(q_id_col, "n_id", sim).filter(F.col("n_id").isNotNull())
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, component p,i in [-0.5, 0.5)
    derived from md5(f"{p}:{i}") first 6 hex digits.  Computed ONCE in Python
    and embedded as literals in the plan — determinism does not require
    per-row hashing (the round-1 version evaluated n_planes*dim md5 calls per
    row; this removes them without changing a single bucket assignment)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:6], 16) / 16777216.0 - 0.5
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """LSH bucket id: integer of sign bits of <vec, plane_p>.  Plane weights
    are plan-time literals; the per-row cost is n_planes fused
    multiply-accumulate passes over the vector (whole-stage codegen)."""
    planes = plane_matrix(n_planes, dim)
    out = F.lit(0)
    for p in range(n_planes):
        lits = F.array(*[F.lit(w) for w in planes[p]])
        proj = F.aggregate(
            F.zip_with(vec, lits, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return out.cast("int")


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 6, id_col: str = "vec_id",
             vec_col: str = "embedding", q_id_col: str = "q_id",
             multiprobe: bool = True, dim: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket;
    the join is an equi-join on bucket (shuffle by bucket, not all-pairs).
    Multi-probe expands each query to its bucket plus all hamming-1
    neighbors (n_planes+1 probes) — the standard recall/cost dial; recall is
    verified in tests against brute_force_topk."""
    if dim is None:
        # one tiny plan-time job against the (small) query side
        dim = queries.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bkt"),
    )
    q = queries.select(
        F.col(q_id_col),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), n_planes, dim).alias("bkt0"),
    )
    if multiprobe:
        probes = F.array(
            F.col("bkt0"),
            *[F.col("bkt0").bitwiseXOR(F.lit(2**p)) for p in range(n_planes)],
        )
        q = q.select(q_id_col, "q_vec", F.explode(probes).alias("bkt"))
    else:
        q = q.withColumnRenamed("bkt0", "bkt")
    j = c.join(F.broadcast(q), "bkt")
    sim = F.round(cosine(F.col("n_vec"), F.col("q_vec")), 6).alias("cos_sim")
    scored = j.select(q_id_col, "n_id", sim)
    w = Window.partitionBy(q_id_col).orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
