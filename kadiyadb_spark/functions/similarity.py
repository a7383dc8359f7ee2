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


def dot_expr(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product. With ``dim`` known, unrolls to a flat element_at sum —
    higher-order functions (aggregate/zip_with) are ALWAYS interpreted, never
    whole-stage-codegen'd, which measured ~10-50x slower per pair inside join
    loops; the unrolled form compiles. Both forms sum left-to-right, so
    results are bit-identical."""
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            e = F.element_at(a, i)
            out = out + e * e
        return F.sqrt(out)
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width from the first row (one tiny job); None on empty input."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return None if row is None else int(row["d"])


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    """Driver-side (ids, float64 matrix) of a SMALL frame (query sets,
    centroids, or one IVF bucket). Callers must not pass an unbounded table."""
    import numpy as np

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    return ids, mat


def cosine_scores_pandas(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """All (query, base) cosine scores via an Arrow-batched mapInPandas
    kernel: the query matrix is broadcast, each base partition computes one
    numpy matmul. This is the vectorized-UDF fast path — per-pair JVM
    expression evaluation (interpreted higher-order functions, or unrolled
    expressions past the JIT's huge-method limit) measured ~6us/pair;
    numpy does the whole block at memory bandwidth."""
    import numpy as np

    spark = base.sparkSession
    q_ids, q = _collect_matrix(queries, query_id_col, query_vec_col)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, qn))

    def score(batches):
        import pandas as pd

        qi, qmat = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            s = vn @ qmat.T  # (batch, queries)
            b, nq = s.shape
            yield pd.DataFrame(
                {
                    query_id_col: np.tile(qi, b),
                    id_col: np.repeat(pdf[id_col].to_numpy(), nq),
                    "_cos": s.ravel(),
                }
            )

    return base.mapInPandas(
        score, schema=f"{query_id_col} long, {id_col} long, _cos double"
    )


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
    """Exact brute-force cosine top-k per query: numpy-scored via
    cosine_scores_pandas (queries broadcast, one matmul per base partition),
    ranked (cosine desc, id asc) for determinism."""
    scored = cosine_scores_pandas(emb, queries, id_col, vec_col, query_id_col, query_vec_col)
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
    dim = infer_dim(emb, vec_col)
    base = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")).withColumn(
        "_vn", norm_expr(F.col("_v"), dim)
    )
    cents = centroids.select(
        F.col("centroid_id"), F.col("centroid_vec").cast("array<double>").alias("_c")
    ).withColumn("_cn", norm_expr(F.col("_c"), dim))
    scored = base.crossJoin(F.broadcast(cents)).select(
        id_col,
        "_v",
        "centroid_id",
        (dot_expr(F.col("_v"), F.col("_c"), dim) / (F.col("_vn") * F.col("_cn"))).alias("_cos"),
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

    dim = infer_dim(emb, vec_col)
    qs = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("_q")
    ).withColumn("_qn", norm_expr(F.col("_q"), dim))
    qscored = qs.crossJoin(F.broadcast(cents)).select(
        query_id_col,
        "_q",
        "_qn",
        "centroid_id",
        (dot_expr(F.col("_q"), F.col("centroid_vec"), dim)
         / (F.col("_qn") * norm_expr(F.col("centroid_vec"), dim))).alias("_cos"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("_cos").desc(), F.col("centroid_id").asc())
    probes = qscored.withColumn("_rn", F.row_number().over(wq)).filter(F.col("_rn") <= nprobe).select(
        query_id_col, "_q", "_qn", "centroid_id"
    )

    assigned_n = assigned.withColumn("_an", norm_expr(F.col(vec_col).cast("array<double>"), dim))
    scored = probes.join(assigned_n, on="centroid_id").select(
        query_id_col,
        id_col,
        (dot_expr(F.col("_q"), F.col(vec_col).cast("array<double>"), dim)
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
