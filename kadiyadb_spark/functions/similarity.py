"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. Query set
  broadcast; scan side stays partitioned, so at 100 TB this is a single
  map-side pass + per-query top-k (no all-to-all shuffle).
- ivf_topk: IVF-style approximate search — assign vectors to the nearest of
  C deterministic centroids at index time; probe only the query's nearest
  ``nprobe`` centroid buckets. Turns full scans into bucket scans
  (~C/nprobe x less work), the standard ANN scale path.

All vector math is built-in higher-order functions (zip_with/aggregate),
JVM-side; deterministic so the DuckDB oracle can replicate bit-for-bit
decisions (modulo float rounding, handled by round()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kadiyadb_spark.functions.num import round4_expr


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force cosine top-k per query. ``queries`` is small ->
    broadcast; ranking by (cosine desc, id asc) for determinism."""
    # Norms are computed ONCE per row and carried through the join as
    # columns; per-pair work is a single dot product. dot/(qn*vn) is
    # bitwise identical to cosine_expr (same sqrt factors), but three
    # stacked higher-order aggregates per pair fall off Spark's fast path
    # (~20x slower measured) — never compute norms inside the pair loop.
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")).withColumn(
        "_vn", norm_expr(F.col("_v"))
    )
    qs = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_q")
    ).withColumn("_qn", norm_expr(F.col("_q")))
    scored = base.crossJoin(F.broadcast(qs)).select(
        query_id_col,
        id_col,
        (dot_expr(F.col("_q"), F.col("_v")) / (F.col("_qn") * F.col("_vn"))).alias("_cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.col("rank").cast("long").alias("rank"),
            round4_expr(F.col("_cos")).alias("cosine"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (ties -> lowest
    centroid id). Centroids are broadcast; output adds ``centroid_id``."""
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")).withColumn(
        "_vn", norm_expr(F.col("_v"))
    )
    cents = centroids.select(
        F.col("centroid_id"), F.col("centroid_vec").cast("array<double>").alias("_c")
    ).withColumn("_cn", norm_expr(F.col("_c")))
    scored = base.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_v",
        "centroid_id",
        (dot_expr(F.col("_v"), F.col("_c")) / (F.col("_vn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, F.col("_v").alias(vec_col), "centroid_id")
    )


def deterministic_centroids(
    emb: DataFrame, num: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic pseudo-centroids: the ``num`` lowest-id vectors. (A real
    system would k-means; determinism matters more here so the oracle can
    reproduce the assignment.)"""
    return (
        emb.orderBy(F.col(id_col).asc())
        .limit(num)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("centroid_vec"),
        )
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: search only the ``nprobe`` centroid buckets nearest
    to each query."""
    cents = deterministic_centroids(emb, num_centroids, id_col, vec_col)
    assigned = ivf_assign(emb, cents, id_col, vec_col)

    qs = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_q")
    ).withColumn("_qn", norm_expr(F.col("_q")))
    qscored = qs.crossJoin(F.broadcast(cents)).select(
        query_id_col,
        "_q",
        "_qn",
        "centroid_id",
        (dot_expr(F.col("_q"), F.col("centroid_vec"))
         / (F.col("_qn") * norm_expr(F.col("centroid_vec")))).alias("_cos"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col("centroid_id").asc())
    probes = qscored.withColumn("_rn", F.row_number().over(wq)).filter(F.col("_rn") <= nprobe).select(
        query_id_col, "_q", "_qn", "centroid_id"
    )

    assigned_n = assigned.withColumn("_an", norm_expr(F.col(vec_col).cast("array<double>")))
    scored = probes.join(assigned_n, on="centroid_id").select(
        query_id_col,
        id_col,
        (dot_expr(F.col("_q"), F.col(vec_col).cast("array<double>"))
         / (F.col("_qn") * F.col("_an"))).alias("_cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            F.col("rank").cast("long").alias("rank"),
            round4_expr(F.col("_cos")).alias("cosine"),
        )
    )
