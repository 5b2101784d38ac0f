"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes:
* exact            — one hash-groupBy; map-side partial agg; no skew (hash keys)
* minhash          — signature is ROW-LOCAL (array exprs, no explode/shuffle);
                     LSH banding turns near-dup search into an equi-join on
                     band hashes — the only shuffle is by band key
* simhash          — row-local bit aggregation over tokens, then banding or
                     hamming verify on candidates
* n-gram jaccard   — verification joins run only on LSH candidate pairs,
                     never all-pairs

Hash choice: lexicographic min of md5(seed || ':' || token) — portable to
the DuckDB oracle bit-for-bit (Spark md5 == DuckDB md5), uniform enough for
banding.  At production scale you'd swap in xxhash64 for speed; the operator
shape is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Representative (min id) + count per exact text hash."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signature(text: Column, n_hashes: int = 16) -> Column:
    """Array of n minhash values — computed row-locally (nested array
    transforms, zero shuffle): sig[i] = min over tokens of
    md5(i || ':' || token)."""
    toks = F.array_distinct(tokens(text))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(i.cast("string"), F.lit(":"), t)))
        ),
    )


def minhash_bands(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n_hashes: int = 16, n_bands: int = 4) -> DataFrame:
    """(id, band, band_hash): band_hash = md5 of the band's signature slice.
    Docs sharing a band_hash are near-dup candidates (classic LSH)."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signature(F.col(text_col), n_hashes)
    # zero-token docs have no signature — excluded (matches the SQL twin,
    # where unnest of an empty token list yields no rows)
    out = df.filter(F.size(tokens(F.col(text_col))) > 0).select(
        F.col(id_col), sig.alias("sig")
    )
    return out.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            "|",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select(id_col, F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))


def minhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", n_hashes: int = 16,
                            n_bands: int = 4) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing ≥1 LSH band.  The self-join
    shuffles on band_hash only; hot buckets (boilerplate docs) are the skew
    risk — AQE skew-join splits them.

    Skew shape (r6, guide §2.5): a boilerplate cluster of H docs emits H²
    pairs out of ONE bucket, so the probe work concentrates wherever that
    bucket's probe rows sit.  When the bands frame is small enough to
    broadcast, the probe side is round-robin repartitioned so every task
    generates an even slice of each hot bucket's pairs (per-row probing
    spreads a bucket's quadratic output across ALL its probe rows) — on
    the sf0.1 documents corpus (4 buckets of ~3-4k docs → 47M raw pairs)
    that took the pair generation off 2 scan partitions and onto every
    core, 14.1 s → 4.9 s.  Past the broadcast cap the plan stays the plain
    shuffle self-join where AQE's skew split is the armor."""
    bands = minhash_bands(df, id_col, text_col, n_hashes, n_bands)
    a = bands
    b = bands
    try:
        est = int(bands._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        est = None
    if est is not None and est <= 64 << 20:
        sc = df.sparkSession.sparkContext
        a = bands.repartition(2 * sc.defaultParallelism)
        b = F.broadcast(bands)
    a = a.alias("a")
    b = b.alias("b")
    return (
        a.join(b, ["band", "band_hash"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5) -> DataFrame:
    """Verify candidate pairs with exact token-set Jaccard (the n-gram
    Jaccard verifier; unigram token sets here — swap `tokens` for shingles
    to widen n).  Joins only the candidate ids against the corpus
    (broadcast when candidates are small)."""
    tok = df.select(
        F.col(id_col), F.array_distinct(tokens(F.col(text_col))).alias("toks")
    )
    j = (
        pairs.join(tok.withColumnRenamed(id_col, "id_a").withColumnRenamed("toks", "toks_a"), "id_a")
        .join(tok.withColumnRenamed(id_col, "id_b").withColumnRenamed("toks", "toks_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b"))).cast("double")
    union = F.size(F.array_union(F.col("toks_a"), F.col("toks_b"))).cast("double")
    return (
        j.select(
            "id_a",
            "id_b",
            F.round(inter / F.greatest(union, F.lit(1.0)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(text: Column, n_bits: int = 16) -> Column:
    """Row-local SimHash: for each bit b, sum ±1 over tokens according to
    bit b of md5(token); sign → bit.  Bits derived from hex nibbles so the
    DuckDB oracle reproduces them exactly.  n_bits ≤ 32 keeps the nibble
    arithmetic in ints."""
    toks = F.array_distinct(tokens(text))

    def bit_of(tok: Column, b: int) -> Column:
        # nibble = hex digit (b // 4) of md5(tok); bit = (nibble >> (b%4)) & 1
        ch = F.substring(F.md5(tok), b // 4 + 1, 1)
        nib = F.instr(F.lit("0123456789abcdef"), ch) - 1
        return F.floor(nib / (2 ** (b % 4))) % 2

    def bit_vote(b: int) -> Column:
        votes = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc + (bit_of(t, b) * 2 - 1).cast("int"),
        )
        return F.when(votes > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**b)

    out = F.lit(0)
    for b in range(n_bits):
        out = out + bit_vote(b)
    return out.cast("long")


def hamming_distance(a: Column, b: Column, n_bits: int = 16) -> Column:
    x = a.bitwiseXOR(b)
    out = F.lit(0)
    for b_ in range(n_bits):
        out = out + F.shiftright(x, b_).bitwiseAND(F.lit(1))
    return out


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", threshold: float = 0.95,
                        bucket_col: Column | None = None,
                        allow_cross_join: bool = False) -> DataFrame:
    """Embedding-cosine near-dup pairs over a bucketed self-join.

    ``bucket_col`` (e.g. an LSH sign-bucket from
    similarity.hyperplane_bucket) scopes the quadratic verifier per bucket.
    Without it the self-join is ALL-PAIRS — O(N²) and never acceptable at
    scale — so it must be explicitly opted into with
    ``allow_cross_join=True`` (tiny corpora / testing only)."""
    from .similarity import cosine

    work = df.select(F.col(id_col), F.col(vec_col).alias("v"))
    if bucket_col is not None:
        work = work.withColumn("_bkt", bucket_col)
        cond = ["_bkt"]
        a, b = work.alias("a"), work.alias("b")
        j = a.join(b, cond)
    else:
        if not allow_cross_join:
            raise ValueError(
                "embedding_near_dups without bucket_col is an all-pairs "
                "cross join; pass bucket_col (hyperplane_bucket) or set "
                "allow_cross_join=True for tiny corpora"
            )
        a, b = work.alias("a"), work.alias("b")
        j = a.crossJoin(b)
    j = j.filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    sim = cosine(F.col("a.v"), F.col("b.v"))
    return j.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(sim, 6).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)


def lww_dedup(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """Generic keyed last-writer-wins dedup (T11 analog as a standalone
    operator): keep the max-order row per key."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def resolve_clusters(pairs: DataFrame, docs: DataFrame | None = None,
                     id_col: str = "doc_id", max_iters: int = 15) -> DataFrame:
    """Cluster resolution: candidate/verified pairs → connected components →
    a (doc_id, rep_id, keep) verdict per document, completing the dedup
    pipeline (pairs alone don't say which copy to drop).

    Algorithm: distributed min-label propagation with pointer jumping —
    each round a node takes the min of (its label, its neighbors' labels,
    its label's label).  The extra label-of-label hop halves path lengths,
    so convergence is O(log diameter) rounds, each round two equi-joins on
    node id (no all-pairs anywhere).  Plans are truncated per round to keep
    the iterative lineage from exploding: reliable ``.checkpoint()`` when
    ``spark.sparkContext.setCheckpointDir`` has been called (survives
    executor loss — the 1000-executor mode), else ``localCheckpoint()``
    (executor-local blocks; fine on local[*], lose-an-executor restarts
    the job).

    ``docs``: pass the full corpus to include singleton documents
    (keep=true, rep=self); otherwise only paired docs are returned.
    """
    sc = pairs.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()

    edges = pairs.select(F.col("id_a").alias("n"), F.col("id_b").alias("m"))
    edges = edges.unionByName(
        edges.select(F.col("m").alias("n"), F.col("n").alias("m"))
    ).distinct().persist()

    labels = edges.select("n").distinct().withColumn("lbl", F.col("n"))
    labels = _truncate(labels)
    for _ in range(max_iters):
        nbr_min = (
            edges.join(labels.withColumnRenamed("n", "m"), "m")
            .groupBy("n")
            .agg(F.min("lbl").alias("_nbr"))
        )
        jumped = (
            labels.join(
                labels.select(F.col("n").alias("lbl"), F.col("lbl").alias("_jump")),
                "lbl",
                "left",
            )
        )
        new_labels = (
            jumped.join(nbr_min, "n", "left")
            .select(
                "n",
                F.least(
                    F.col("lbl"),
                    F.coalesce(F.col("_nbr"), F.col("lbl")),
                    F.coalesce(F.col("_jump"), F.col("lbl")),
                ).alias("lbl"),
            )
        )
        new_labels = _truncate(new_labels)
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "n")
            .filter(F.col("a.lbl") != F.col("b.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()

    resolved = labels.select(F.col("n").alias(id_col), F.col("lbl").alias("rep_id"))
    if docs is not None:
        resolved = (
            docs.select(id_col)
            .join(resolved, id_col, "left")
            .select(
                id_col,
                F.coalesce(F.col("rep_id"), F.col(id_col)).alias("rep_id"),
            )
        )
    return resolved.withColumn("keep", F.col("rep_id") == F.col(id_col))
