"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an IVF (inverted-file)
variant as the scale path: centroid assignment turns the O(Q x N) cross
join into O(Q x N/C x nprobe). All vector math is native (zip_with +
aggregate fold, JVM-side); a vectorized numpy path via mapInPandas exists
for wide batches where the fold dominates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def ann_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query.

    Physical plan: BROADCAST the (small) query set against the (huge)
    corpus — the corpus is scanned once, no shuffle of vectors; the only
    shuffle is the per-query top-k (rows = |corpus| x |queries| reduced by
    partial top-k via window over query_id)."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    # precompute each corpus vector's norm once: scoring per (row, query)
    # pair is then just the dot fold (same float math as cosine())
    joined = corpus.withColumn("__cn", norm(F.col(vec_col))).crossJoin(
        F.broadcast(q)
    )
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            dot(F.col(vec_col), F.col("__qvec")) / (F.col("__cn") * F.col("__qn")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def kmeans_like_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """Deterministic centroid pick: the n lowest-id vectors (a seeded sample
    stand-in; swap for k-means|| when MLlib is allowed). Returned small —
    intended for broadcast. centroid_id = dense 0..n-1 rank by id
    (row_number, NOT monotonically_increasing_id — the latter is assigned
    post-shuffle and is only accidentally contiguous)."""
    return (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            (
                F.row_number().over(Window.orderBy(F.col(id_col))) - 1
            ).alias("centroid_id"),
            F.col(vec_col).alias("centroid_vec"),
        )
    )


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast centroids,
    one pass, no shuffle)."""
    joined = corpus.crossJoin(F.broadcast(centroids))
    scored = joined.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("centroid_vec")).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(id_col, vec_col, "centroid_id")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: only the nprobe nearest centroid buckets are
    scanned per query. At 1000-executor scale the assignment is a cached
    bucketed table and each query touches nprobe/C of the corpus."""
    cents = kmeans_like_centroids(corpus, id_col, vec_col, n_centroids)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    qjoined = queries.crossJoin(F.broadcast(cents))
    qscored = qjoined.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        F.col("centroid_id"),
        cosine(F.col(vec_col), F.col("centroid_vec")).alias("csim"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.desc("csim"), F.col("centroid_id"))
    probes = (
        qscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(query_id_col, "__qvec", "centroid_id")
    )

    cand = assigned.withColumn("__cn", norm(F.col(vec_col))).join(
        F.broadcast(probes.withColumn("__qn", norm(F.col("__qvec")))),
        on="centroid_id",
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(
            dot(F.col(vec_col), F.col("__qvec")) / (F.col("__cn") * F.col("__qn")), 6
        ).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, bucketed by IVF centroid.

    Scale path (replaces the round-1 all-pairs crossJoin): assign every
    vector to its nearest centroid (broadcast centroids, one narrow pass),
    then self-join WITHIN buckets only and exact-cosine filter. Work is
    O(N^2 / C) instead of O(N^2); buckets parallelize across executors.

    Semantics: deterministic-approximate — a pair is reported iff both
    vectors share a primary centroid AND cosine >= threshold. Recall is
    governed by C (raise n_centroids for smaller/faster buckets, lower for
    recall); the bucketing is fully deterministic (lowest-id centroids,
    rank-stable assignment), so results are reproducible and SQL-oracle
    checkable."""
    cents = kmeans_like_centroids(df, id_col, vec_col, n_centroids)
    # carry each vector's norm: cosine per pair then needs only the dot fold
    # (norms would otherwise be re-folded for every one of a vector's ~N/C
    # partners). dot/(na*nb) is bit-identical to cosine() — oracle-safe.
    assigned = ivf_assign(df, cents, id_col, vec_col).withColumn(
        "__n", norm(F.col(vec_col))
    )
    # block-salt the self-join: C centroid keys alone bound parallelism at C
    # tasks (the per-pair scoring is the expensive part). Side A hashes into
    # `blocks` sub-buckets, side B replicates across them — pairs form and
    # score across C x blocks tasks, no post-join shuffle of vector pairs.
    blocks = max(2, df.sparkSession.sparkContext.defaultParallelism)
    a = assigned.select(
        F.col("centroid_id"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("__n").alias("na"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("__blk"),
    )
    b = assigned.select(
        F.col("centroid_id"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("__n").alias("nb"),
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(blocks)])).alias(
            "__blk"
        ),
    )
    return (
        a.join(b, on=["centroid_id", "__blk"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ),
        )
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
