"""Distributed k-means (Lloyd) over embedding columns — integer-exact.

The clustering primitive behind semantic dedup (SemDeDup: cluster, then
dedup within clusters), corpus topic balancing, and IVF coarse quantizer
training at full-corpus scale (similarity.py's PQ codebooks train on a
bounded driver SAMPLE; this trains on EVERY vector, distributed).

Determinism is the hard part: naive float sums make both the assignment
(argmin ties) and the centroid update partition-order-dependent — the
exact class of bug the r06 driver gate redlined. Every fold here is
integer-exact instead:

- distances: each squared term quantizes to a scaled long
  (floor(t*1e8+0.5)) BEFORE summation — the per-vector distance is an
  exact integer, identical at any parallelism, and argmin ties resolve to
  the lowest centroid id via first-match array_position;
- centroid update: components quantize to scaled longs (1e6) and fold as
  exact integer sums; the new component is ONE double division
  (sum/(1e6*n)) — identical IEEE on both gate engines;
- inertia: the exact long distance sum, one double division + 4dp floor
  at output.

Scale shape per iteration: assignment is FULLY map-side (a broadcast
numpy kernel since r13 — the centroid literals stay the spec twin); the
update is FUSED into the same kernel (r13), which emits at most k*d
exact decimal partial rows PER TASK into the groupBy(cluster, dim) — the
shuffle is KBs regardless of corpus size; the driver holds k*d doubles
(a bounded collect, documented like similarity._collect_matrix). Both
sums are RUNTIME-GUARDED
(num.py:guarded_scaled_sum — decimal(38,0) accumulation asserted within
2^53 before the one double division): a corpus wide enough to overflow
fails loudly instead of drifting.

Reference parity: none (the reference has no vector ops); north-star
LLM-pipeline surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kadiyadb_spark.functions.num import guarded_scaled_sum

_DQ = 1e8  # squared-term quantum (distance grid)
_CQ = 1e6  # component quantum (centroid-update grid)
# Plan-literal assignment ceiling: centroids ride the plan as k*d literal
# Columns, which is the whole exactness device — past this k the Catalyst
# tree itself becomes the bottleneck (review finding: auto-k at corpus
# scale would build millions of literals and hang/OOM the DRIVER before
# any executor work). Fail loudly with guidance instead.
_MAX_PLAN_K = 512


def _dist_q(vec_dbl: Column, centroid: "list[float]") -> Column:
    """Exact quantized squared L2 distance to one literal centroid."""
    lit = F.array(*[F.lit(float(v)) for v in centroid])
    terms = F.zip_with(
        vec_dbl,
        lit,
        lambda x, y: F.floor((x - y) * (x - y) * F.lit(_DQ) + F.lit(0.5)).cast(
            "long"
        ),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda acc, t: acc + t)


def _assign_cols(vec_dbl: Column, centroids: "list[list[float]]"):
    dists = F.array(*[_dist_q(vec_dbl, c) for c in centroids])
    # first-match position = lowest cluster id on exact-integer ties
    cid = (F.array_position(dists, F.array_min(dists)) - 1).cast("long")
    return cid, F.array_min(dists)


def _argmin_q(v, C):
    """Shared numpy device of the exact assignment: quantized int64
    distances (same IEEE-754 ops as ``_dist_q``) and first-minimum argmin
    (= ``array_position`` lowest-centroid-id tie rule). Used by both the
    assignment kernel and the fused update kernel so the two cannot
    drift. Returns (cid[n], dists[n, k])."""
    import numpy as np

    n = v.shape[0]
    dists = np.empty((n, C.shape[0]), dtype=np.int64)
    for j in range(C.shape[0]):  # k passes of n x d keeps memory O(n*d)
        d = v - C[j]
        # same evaluation order as _dist_q: ((x-y)*(x-y))*_DQ + 0.5
        dists[:, j] = np.floor(d * d * _DQ + 0.5).astype(np.int64).sum(axis=1)
    return dists.argmin(axis=1).astype("int64"), dists  # first min = lowest id


def _assign_map(
    base: DataFrame,
    centroids: "list[list[float]]",
    with_id: bool = False,
    with_vec: bool = False,
    with_dq: bool = False,
) -> DataFrame:
    """Vectorized twin of ``_assign_cols``: the SAME quantized-integer
    distances and first-minimum argmin, computed by a numpy kernel over
    Arrow batches instead of a k*d-literal Catalyst tree.

    Why (r13 optimization, guide §4.2/§1.2): the plan-literal form embeds
    k x d literal columns per distance — at semdedup's sf0.1 auto-k
    (k=16, d=64) that is 1024 literals inside nested zip_with/aggregate
    lambdas, and Catalyst analysis + whole-stage codegen of that tree
    measured SECONDS per iteration (three distinct plans per run: each
    iteration's centroid values differ, so nothing is cache-shared) while
    the arithmetic itself is microseconds. The kernel keeps the exactness
    device bit-for-bit: float64 ``(x-y)*(x-y)*1e8 + 0.5`` and ``floor``
    are the same IEEE-754 operations Catalyst evaluates, each quantized
    term is an exact integer under ``_lloyd``'s grid guard, the int64 term
    sum matches the JVM long fold, and ``np.argmin`` returns the FIRST
    minimum — the ``array_position`` lowest-centroid-id tie rule. No
    shuffle is introduced (mapInPandas is map-side), so the one-shuffle
    plan contracts of kmeans/semdedup hold unchanged.

    Output columns (in order): ``_id`` (if ``with_id``), ``_v`` (if
    ``with_vec``), ``_cid``, ``_dq`` (if ``with_dq``). Only the needed
    input columns cross the Python boundary (guide §4.1)."""
    cents = [[float(x) for x in c] for c in centroids]
    in_cols = (["_id"] if with_id else []) + ["_v"]
    fields = []
    if with_id:
        fields.append("_id " + base.schema["_id"].dataType.simpleString())
    if with_vec:
        fields.append("_v array<double>")
    fields.append("_cid long")
    if with_dq:
        fields.append("_dq long")

    def kernel(batches):
        import numpy as np
        import pandas as pd

        C = np.asarray(cents, dtype=np.float64)  # k x d, built once per task
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            v = np.array(pdf["_v"].tolist(), dtype=np.float64)  # n x d
            cid, dists = _argmin_q(v, C)
            out = {}
            if with_id:
                out["_id"] = pdf["_id"]
            if with_vec:
                out["_v"] = pdf["_v"]
            out["_cid"] = cid
            if with_dq:
                out["_dq"] = dists[np.arange(n), cid]
            yield pd.DataFrame(out)

    return base.select(*in_cols).mapInPandas(kernel, schema=", ".join(fields))


def _update_partials(base: DataFrame, centroids: "list[list[float]]") -> DataFrame:
    """Fused assignment + centroid-update PARTIALS (r13, guide §4.2 do
    the heavy lifting in native code / §4.1 ship fewer columns across the
    boundary). The posexplode shape already bounded the SHUFFLE to k*d
    rows per partition (map-side partial agg); what it could not avoid
    was per-task volume: n*d doubles crossing Arrow back OUT of the
    assignment kernel, then n*d generated rows each paying a decimal
    conversion + hash-aggregate probe. This kernel folds the quantized
    components ``floor(x*_CQ + 0.5)`` per (cluster, dim) in numpy inside
    the same pass that assigns, so at most k*d exact decimal rows leave
    the kernel per task and the JVM aggregate folds partials only.
    Measured flat at sf0.1 (min-of-5: semdedup 2.88 -> 2.84 s,
    embedding_kmeans 2.03 -> 2.20 s — noise; the n*d term is tiny at
    10k x 64); kept for the per-task shape at corpus scale, where the
    n*d explosion dominates each iteration.

    Exactness (the reason this fusion is safe):

    - the assignment is ``_argmin_q`` — the same device ``_assign_map``
      uses, bit-for-bit;
    - per-BATCH folds run in int64: ``_lloyd``'s grid guard bounds every
      component to |x| <= grid_max < 2^13, so |floor(x*_CQ+0.5)| < 2^33,
      and an Arrow batch holds < 2^31 rows — a batch partial can never
      wrap int64;
    - cross-batch accumulation uses PYTHON ints (unbounded) and emits
      decimal(38,0), so a task of any size stays exact;
    - the downstream ``guarded_scaled_sum`` folds the partials in
      decimal(38,0) and asserts the SAME +/-2^53 bound on the SAME true
      total — values and abort behavior are identical to the posexplode
      path (pinned by test_update_partials_matches_posexplode).

    Empty clusters emit no rows, exactly like the posexplode path
    (callers keep the previous centroid)."""
    cents = [[float(x) for x in c] for c in centroids]

    def kernel(batches):
        import numpy as np
        import pandas as pd
        from decimal import Decimal

        C = np.asarray(cents, dtype=np.float64)  # k x d, built once per task
        d = C.shape[1]
        sums: dict[int, list] = {}  # cid -> per-dim Python-int partials
        counts: dict[int, int] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array(pdf["_v"].tolist(), dtype=np.float64)  # n x d
            cid, _ = _argmin_q(v, C)
            q = np.floor(v * _CQ + 0.5).astype(np.int64)  # exact under the grid guard
            for j in np.unique(cid):
                sel = q[cid == j]
                ps = sel.sum(axis=0)  # int64 batch partial — bounded, see above
                j = int(j)
                if j in sums:
                    s = sums[j]
                    for t in range(d):
                        s[t] += int(ps[t])
                    counts[j] += int(sel.shape[0])
                else:
                    sums[j] = [int(x) for x in ps]
                    counts[j] = int(sel.shape[0])
        if sums:
            out = {"_cid": [], "_dim": [], "_ps": [], "_n": []}
            for j in sorted(sums):
                for t in range(d):
                    out["_cid"].append(j)
                    out["_dim"].append(t)
                    out["_ps"].append(Decimal(sums[j][t]))
                    out["_n"].append(counts[j])
            yield pd.DataFrame(out)

    return base.select("_v").mapInPandas(
        kernel, schema="_cid long, _dim int, _ps decimal(38,0), _n long"
    )


def _base_frame(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    vec_dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # materialize ONCE: every consumer makes iters+2..3 full passes (init
    # collect, per-iteration update jobs, final assignment) — without this
    # each pass re-scans and re-casts the source (review finding); the
    # checkpointed RDD is context-cleaned when the result is dropped
    return emb.select(F.col(id_col).alias("_id"), vec_dbl.alias("_v")).localCheckpoint(
        eager=False
    )


def _lloyd(base: DataFrame, k: int, iters: int) -> "list[list[float]]":
    """The shared Lloyd recursion: deterministic init (k lowest ids), then
    ``iters`` exact quantized assignment+update rounds. Returns the final
    centroid list (k x d Python floats — the only driver state)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    if k > _MAX_PLAN_K:
        raise ValueError(
            f"k={k} exceeds the plan-literal assignment ceiling "
            f"({_MAX_PLAN_K}): the exact-replay device embeds k*d literal "
            "columns in the plan. For larger k use the sampled trainers "
            "(similarity.kmeans_centroids / pq_codebooks) whose assignment "
            "runs as a broadcast numpy kernel."
        )
    init_rows = base.orderBy(F.col("_id").asc()).limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(f"need >= {k} vectors to init k-means, got {len(init_rows)}")
    centroids = [[float(x) for x in r["_v"]] for r in init_rows]
    dim = len(centroids[0])
    # One validation pass over the (checkpointed) base: ragged vectors
    # otherwise surface as driver IndexError/None-cid TypeError mid-run,
    # and components past the quantization grid silently lose per-term
    # exactness / can wrap the long distance fold (review finding — the
    # centroid sums are runtime-guarded, the distance fold was not).
    import math

    chk = base.agg(
        F.min(F.size("_v")).alias("_mn"),
        F.max(F.size("_v")).alias("_mx"),
        F.max(
            F.aggregate(F.col("_v"), F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
        ).alias("_amax"),
    ).collect()[0]
    if chk["_mn"] != dim or chk["_mx"] != dim:
        raise ValueError(
            f"ragged embedding column: sizes {chk['_mn']}..{chk['_mx']} "
            f"vs init dim {dim}"
        )
    grid_max = min(
        math.sqrt(float(1 << 53) / _DQ) / 2.0,
        math.sqrt(float(1 << 63) / (_DQ * max(dim, 1))) / 2.0,
    )
    if chk["_amax"] is not None and chk["_amax"] > grid_max:
        raise ValueError(
            f"component magnitude {chk['_amax']:.3g} exceeds the exact "
            f"distance grid bound {grid_max:.3g} at dim {dim} — scale the "
            "vectors (the quantized fold would silently lose exactness)"
        )

    for _ in range(iters):
        sums = (
            # r13 fusion: assignment + per-task update partials in ONE
            # kernel (see _update_partials) — the old shape posexploded
            # n*d (cid, dim, val) rows through the shuffle and shipped _v
            # back across Arrow; the guarded decimal fold + 2^53 assert
            # (num.py:guarded_scaled_sum) still runs on the same true total
            _update_partials(base, centroids)
            .groupBy("_cid", "_dim")
            .agg(
                guarded_scaled_sum(F.col("_ps"), dp=6).alias("_s"),
                F.sum("_n").cast("long").alias("_n"),
            )
            .collect()  # bounded: exactly k*dim rows, independent of corpus size
        )
        nxt = [list(c) for c in centroids]  # empty cluster -> keep previous
        acc: dict[int, list] = {}
        for r in sums:
            acc.setdefault(r["_cid"], [None] * dim)[r["_dim"]] = (
                float(r["_s"]) / (_CQ * r["_n"])
            )
        for c, comps in acc.items():
            nxt[c] = comps
        centroids = nxt
    return centroids


def lloyd_centroids(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained Lloyd centroids as the (centroid_id, centroid_vec)
    frame ivf_assign / resolve_centroids consume — unlike Spark ML's
    KMeans|| (similarity.kmeans_centroids), this recursion is
    integer-exact, so a SQL oracle replays the centroids bit-identically
    (sum/(1e6*n) is one IEEE division of exact integers on both
    engines)."""
    base = _base_frame(emb, id_col, vec_col)
    cents = _lloyd(base, k, iters)
    return emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        schema="centroid_id long, centroid_vec array<double>",
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from a deterministic init (the ``k``
    lowest-``id_col`` vectors), then report the final assignment:
    (cluster_id, n_vecs, inertia) with inertia = 4dp-rounded exact sum of
    quantized squared distances. Empty clusters keep their previous
    centroid (both gate engines implement the same rule)."""
    base = _base_frame(emb, id_col, vec_col)
    centroids = _lloyd(base, k, iters)

    return (
        _assign_map(base, centroids, with_dq=True)
        .select(F.col("_cid").alias("cluster_id"), "_dq")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # exact guarded long sum; ONE double division + 4dp floor
            (
                F.floor(
                    guarded_scaled_sum(F.col("_dq"), dp=8) / F.lit(1e4) + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("inertia"),
        )
    )


def semdedup_prune(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public method):
    k-means-cluster the embedding space, then score cosine similarity
    only WITHIN clusters and drop every vector that has a semantic
    duplicate keeping a deterministic representative. Clustering bounds
    the quadratic: pairs are per-bucket, never corpus-wide — the same
    scale valve as embedding_near_duplicates, with buckets that follow
    the embedding distribution instead of arbitrary low-id seeds.

    Determinism/gate design: clustering + assignment use the exact
    quantized Lloyd recursion above (assignment distances are exact
    integers — no FP tie risk, and a SQL oracle replays centroid and
    assignment bit-identically). Keeper rule (r13, ADVICE r12): ITERATIVE
    GREEDY per cluster in id order — keep the lowest id, drop its
    duplicates, repeat on the survivors. Unlike the r12 "dominated by ANY
    lower id" rule this is transitivity-safe: a vector whose only
    dominator was itself dropped stays KEPT, so non-duplicates are never
    silently discarded (SemDeDup's keep-one-per-group intent; the paper
    keeps the vector closest to the centroid — the id order is the
    layout-proof stand-in, documented deviation). Still deterministic and
    SQL-replayable (recursive CTE). Output: (id, cluster_id, kept 0/1)
    for EVERY input vector.

    Scale shape: ONE shuffle keyed cluster_id; per-bucket upper-triangle
    numpy matmul at memory bandwidth (per-pair JVM array expressions
    measured ~6us/pair — see embedding_near_duplicates).

    ``target_bucket`` (VERDICT r12 item 6) derives ``k`` from the corpus
    automatically: k = max(k, ceil(n / target_bucket)), one cheap count
    before training, so the per-bucket n^2 stays memory-bounded as the
    corpus grows instead of silently inflating at a fixed k. The bound
    targets the AVERAGE bucket; k-means keeps roughly-isotropic corpora
    near-balanced (property-pinned at 10x in tests/test_cluster.py), but a
    pathologically collapsed embedding distribution can still concentrate
    a bucket — the documented escape is raising k / pre-sharding, same as
    the paper's. The SQL oracle replays the same integer-ceil k from its
    own count, so auto-k stays value-hash-gated."""
    if not (-1.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (-1, 1], got {threshold}")
    import numpy as np

    base = _base_frame(emb, id_col, vec_col)
    if target_bucket is not None:
        if target_bucket <= 0:
            raise ValueError(f"target_bucket must be positive, got {target_bucket}")
        n = base.count()
        k = max(k, -(-n // target_bucket))  # integer ceil, SQL-replayable
    centroids = _lloyd(base, k, iters)
    assigned = _assign_map(base, centroids, with_id=True, with_vec=True).select(
        "_id", "_v", F.col("_cid").alias("cluster_id")
    )

    def bucket_flags(pdf):
        import pandas as pd

        ids = pdf["_id"].to_numpy()
        if len(pdf) < 2:
            return pd.DataFrame(
                {"id": ids, "cluster_id": pdf["cluster_id"], "kept": [1] * len(pdf)}
            )
        v = np.array(pdf["_v"].tolist(), dtype=np.float64)
        # zero-norm guard (code-review r12): an all-zero embedding must not
        # poison the bucket with NaN rows (NaN >= t is False, silently
        # exempting it from dedup) — normalize by 1 instead, giving it
        # cosine 0 against everything: kept, deterministically, no warning
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        vn = v / np.where(norms == 0.0, 1.0, norms)
        s = vn @ vn.T
        # iterative greedy in id order: each time the scan reaches an
        # undropped member it is KEPT and its duplicates drop — one s-row
        # sweep per kept member, O(#kept * bucket), far below the matmul
        order = np.argsort(ids, kind="stable")
        dropped = np.zeros(len(ids), dtype=bool)
        kept = np.zeros(len(ids), dtype=bool)
        for i in order:
            if dropped[i]:
                continue
            kept[i] = True
            # STRICTLY greater id only: equal-id rows never dominate each
            # other, so the outcome is layout-proof even with duplicate
            # ids (review finding — the stable argsort alone fell back to
            # partition-arrival order on ties; the SQL replay's kept
            # filter states the same x.id < m.id rule)
            dropped |= (s[i] >= threshold) & ~kept & (ids > ids[i])
        return pd.DataFrame(
            {
                "id": ids,
                "cluster_id": pdf["cluster_id"],
                "kept": kept.astype("int64"),
            }
        )

    idt = emb.schema[id_col].dataType.simpleString()  # generic id type
    out = assigned.groupBy("cluster_id").applyInPandas(
        bucket_flags, schema=f"id {idt}, cluster_id long, kept long"
    )
    return out.select(F.col("id").alias(id_col), "cluster_id", "kept")
