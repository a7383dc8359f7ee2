"""DuckDB oracle SQL for the driver correctness gate — embedding similarity: brute-force, IVF, PQ, IVFPQ, quantization.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations



def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # Mirrors the engine's IVF centroid blocking: assign each vector to its
    # nearest of the 8 lowest-id centroids (ties -> lowest centroid id), then
    # score pairs only WITHIN a bucket.
    o["dedup_embedding"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (SELECT vec_id AS centroid_id, e AS cv FROM v ORDER BY vec_id ASC LIMIT 8),
assign_scored AS (
  SELECT v.vec_id, v.e, cents.centroid_id,
         row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(v.e, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM v CROSS JOIN cents
),
assigned AS (SELECT vec_id, e, centroid_id FROM assign_scored WHERE rn = 1)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor((list_cosine_similarity(a.e, b.e)) * 10000 + 0.5) / 10000 AS cosine
FROM assigned a JOIN assigned b
  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.35
"""

    # ---- similarity ----
    o["embedding_stats"] = """
WITH n AS (
  SELECT label,
         floor(sqrt(list_sum([x * x for x in embedding::DOUBLE[]]))
               * 10000 + 0.5) / 10000 AS nn
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vectors,
       floor((sum(CAST(round(nn * 10000) AS BIGINT))
              / (10000.0 * count(nn))) * 10000 + 0.5) / 10000 AS avg_norm,
       min(nn) AS min_norm,
       max(nn) AS max_norm
FROM n GROUP BY label
"""

    o["sim_hard_negatives"] = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, label AS ql
           FROM embeddings WHERE vec_id < 5),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v, label
         FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, base.vec_id, base.label,
         list_cosine_similarity(q.qv, base.v) AS cos
  FROM q CROSS JOIN base
  WHERE base.label != q.ql
),
ranked AS (
  SELECT query_id, vec_id, label, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, CAST(label AS BIGINT) AS label,
       CAST(rnk AS BIGINT) AS rank, floor((cos) * 10000 + 0.5) / 10000 AS cosine
FROM ranked WHERE rnk <= 5
"""

    # MaxSim replay: per (query token, doc) max cosine rounds to a 4dp
    # scaled long BEFORE the per-query sum (order-free integer fold), so
    # ranking on (s4 desc, doc_id asc) is engine- and layout-exact.
    o["sim_maxsim"] = """
WITH qt AS (
  SELECT vec_id // 8 AS query_id, vec_id AS qtid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < 16
),
dt AS (
  SELECT vec_id // 8 AS doc_id, embedding::DOUBLE[] AS dv
  FROM embeddings WHERE vec_id >= 16
),
pertok AS (
  SELECT qt.query_id, qt.qtid, dt.doc_id,
         CAST(floor(max(list_cosine_similarity(qt.qv, dt.dv)) * 10000 + 0.5) AS BIGINT) AS m4
  FROM qt CROSS JOIN dt
  GROUP BY 1, 2, 3
),
score AS (
  SELECT query_id, doc_id, CAST(sum(m4) AS BIGINT) AS s4
  FROM pertok GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, s4,
         row_number() OVER (PARTITION BY query_id ORDER BY s4 DESC, doc_id ASC) AS rnk
  FROM score
)
SELECT query_id, doc_id, CAST(rnk AS BIGINT) AS rank, s4 / 10000.0 AS maxsim
FROM ranked WHERE rnk <= 5
"""

    o["sim_cosine_topk"] = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, base.vec_id, list_cosine_similarity(q.qv, base.v) AS cos
  FROM q CROSS JOIN base
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank, floor((cos) * 10000 + 0.5) / 10000 AS cosine
FROM ranked WHERE rnk <= 5
"""

    # knn graph: assignment mirrors ivf_assign (argmax -> lowest centroid id
    # on ties); ranks order on the 4dp-ROUNDED cosine with neighbor-id ties
    # (the PQ-ranker device), so engine-ULP cosine differences cannot flip
    # a rank
    o["sim_knn_graph"] = """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign_scored AS (
  SELECT base.vec_id, base.v, cents.centroid_id,
         row_number() OVER (PARTITION BY base.vec_id
             ORDER BY list_cosine_similarity(base.v, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM base CROSS JOIN cents
),
assigned AS (SELECT vec_id, v, centroid_id FROM assign_scored WHERE rn = 1),
pairs AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id,
         floor(list_cosine_similarity(a.v, b.v) * 10000 + 0.5) / 10000 AS r4
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id != b.vec_id
),
ranked AS (
  SELECT vec_id, neighbor_id, r4,
         CAST(row_number() OVER (PARTITION BY vec_id
             ORDER BY r4 DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM pairs
)
SELECT vec_id, neighbor_id, rank, r4 AS cosine FROM ranked WHERE rank <= 5
"""

    # embedding_outliers replay: assignment (ties -> lowest centroid id),
    # cos4 = round(cos*1e4), per-centroid exact decile cut at rank
    # (n-1)//10 (+ rem interpolation), flag as the INTEGER inequality
    # 10*c4 < (10-rem)*lo + rem*hi — no double ever decides the flag.
    o["sim_outliers"] = """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
  FROM embeddings ORDER BY vec_id ASC LIMIT 8
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
asg AS (
  SELECT base.vec_id, cents.centroid_id,
         CAST(round(list_cosine_similarity(base.v, cents.cv) * 10000) AS BIGINT) AS c4,
         row_number() OVER (PARTITION BY base.vec_id
             ORDER BY list_cosine_similarity(base.v, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM base CROSS JOIN cents
),
a AS (SELECT vec_id, centroid_id, c4 FROM asg WHERE rn = 1),
rk AS (
  SELECT vec_id, centroid_id, c4,
         row_number() OVER (PARTITION BY centroid_id ORDER BY c4, vec_id) AS rn,
         count(*) OVER (PARTITION BY centroid_id) AS n
  FROM a
),
cut AS (
  SELECT centroid_id, max(n) AS n,
         max(CASE WHEN rn = (n-1) // 10 + 1 THEN c4 END) AS lo,
         max(CASE WHEN rn = (n-1) // 10 + 2 THEN c4 END) AS hi
  FROM rk GROUP BY centroid_id
)
SELECT r.vec_id, r.centroid_id,
       r.c4 / 10000.0 AS cosine,
       floor((CAST((10 - (c.n-1) % 10) * c.lo + ((c.n-1) % 10) * coalesce(c.hi, c.lo) AS DOUBLE) / 100000.0) * 10000 + 0.5) / 10000 AS cut,
       10 * r.c4 < (10 - (c.n-1) % 10) * c.lo + ((c.n-1) % 10) * coalesce(c.hi, c.lo) AS is_outlier
FROM rk r JOIN cut c USING (centroid_id)
"""

    o["sim_ivf_topk"] = """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id >= 5 ORDER BY vec_id ASC LIMIT 8
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5),
assign_scored AS (
  SELECT base.vec_id, base.v, cents.centroid_id,
         row_number() OVER (PARTITION BY base.vec_id
             ORDER BY list_cosine_similarity(base.v, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM base CROSS JOIN cents
),
assigned AS (SELECT vec_id, v, centroid_id FROM assign_scored WHERE rn = 1),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
probe_scored AS (
  SELECT q.query_id, q.qv, cents.centroid_id,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM q CROSS JOIN cents
),
probes AS (SELECT query_id, qv, centroid_id FROM probe_scored WHERE rn <= 2),
scored AS (
  SELECT p.query_id, a.vec_id, list_cosine_similarity(p.qv, a.v) AS cos
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank, floor((cos) * 10000 + 0.5) / 10000 AS cosine
FROM ranked WHERE rnk <= 5
"""

    # Mirrors lsh_topk: hyperplanes = the 6 lowest-id base vectors; bucket =
    # sign bits of the inner products (bit j from the j-th lowest hyperplane
    # id); each query probes its bucket and every single-bit flip.
    o["sim_ivf_index"] = o["sim_ivf_topk"]
    # build(<300) + add(>=300) + compact must equal the one-shot index: the
    # deterministic centroids (8 lowest base ids) live in the build subset.
    o["sim_ivf_add"] = o["sim_ivf_topk"]

    o["sim_lsh_topk"] = """
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5),
hyper AS (SELECT vec_id AS hid, v AS hv FROM base ORDER BY vec_id ASC LIMIT 6),
hb AS (SELECT hid, hv, row_number() OVER (ORDER BY hid ASC) - 1 AS bit FROM hyper),
vb AS (
  SELECT b.vec_id, b.v,
         CAST(sum(CASE WHEN list_inner_product(b.v, hb.hv) >= 0 THEN (1 << hb.bit) ELSE 0 END) AS BIGINT) AS bkt
  FROM base b CROSS JOIN hb GROUP BY b.vec_id, b.v
),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
qb AS (
  SELECT q.query_id, q.qv,
         CAST(sum(CASE WHEN list_inner_product(q.qv, hb.hv) >= 0 THEN (1 << hb.bit) ELSE 0 END) AS BIGINT) AS bkt
  FROM q CROSS JOIN hb GROUP BY q.query_id, q.qv
),
probes AS (
  SELECT query_id, qv, bkt AS pb FROM qb
  UNION ALL
  SELECT qb.query_id, qb.qv, xor(qb.bkt, CAST(1 << hb.bit AS BIGINT)) FROM qb CROSS JOIN hb
),
scored AS (
  SELECT p.query_id, vb.vec_id, list_cosine_similarity(p.qv, vb.v) AS cos
  FROM probes p JOIN vb ON vb.bkt = p.pb
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank, floor((cos) * 10000 + 0.5) / 10000 AS cosine
FROM ranked WHERE rnk <= 5
"""

    # IVF-PQ composition: sim_ivf_topk's bucket assignment + probe sets
    # select the candidates; sim_pq_topk's codes + lookup tables score them.
        # shared IVFPQ pipeline (centroids -> codes -> probes -> ADC ranking);
    # sim_ivfpq_topk emits the ADC top-5, sim_ivfpq_refined extends it with
    # the exact-cosine re-rank of the 15-candidate shortlist (rank on the
    # 4dp-ROUNDED cosine + id tie so engine-ULP noise cannot flip ranks)
    _ivfpq_with = """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id >= 5 ORDER BY vec_id ASC LIMIT 8
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5),
assign_scored AS (
  SELECT base.vec_id, base.v, cents.centroid_id,
         row_number() OVER (PARTITION BY base.vec_id
             ORDER BY list_cosine_similarity(base.v, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM base CROSS JOIN cents
),
assigned AS (SELECT vec_id, centroid_id FROM assign_scored WHERE rn = 1),
cb_src AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) AS BIGINT) - 1 AS code
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id ASC LIMIT 8)
),
subspaces AS (SELECT unnest(range(4)) AS m),
cb AS (
  SELECT s.m, c.code, list_slice(c.v, CAST(s.m*16 + 1 AS INT), CAST(s.m*16 + 16 AS INT)) AS cent
  FROM subspaces s CROSS JOIN cb_src c
),
dists AS (
  SELECT b.vec_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(b.v, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
  FROM base b CROSS JOIN cb c
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
    FROM dists) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
),
probe_scored AS (
  SELECT q.query_id, cents.centroid_id,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM q CROSS JOIN cents
),
probes AS (SELECT query_id, centroid_id FROM probe_scored WHERE rn <= 2),
qn AS (SELECT query_id, sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
tables AS (
  SELECT q.query_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(q.qv, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> x[1] * x[2])) AS t,
         list_sum(list_transform(c.cent, x -> x*x)) AS n2
  FROM q CROSS JOIN cb c
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
),
scored AS (
  SELECT cd.vec_id, cd.query_id, sum(tb.t) AS adot, sqrt(greatest(sum(tb.n2), 1e-300)) AS rnorm
  FROM cand cd
  JOIN codes co ON co.vec_id = cd.vec_id
  JOIN tables tb ON tb.query_id = cd.query_id AND co.m = tb.m AND co.code = tb.code
  GROUP BY cd.vec_id, cd.query_id
),
ranked AS (
  SELECT s.query_id, s.vec_id,
         floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 AS ac,
         row_number() OVER (PARTITION BY s.query_id
             ORDER BY floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 DESC,
                      s.vec_id ASC) AS rnk
  FROM scored s JOIN qn USING (query_id)
)"""

    o["sim_ivfpq_topk"] = _ivfpq_with + """
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank,
       floor(ac * 10000 + 0.5) / 10000 AS approx_cos
FROM ranked WHERE rnk <= 5
"""

    o["sim_ivfpq_refined"] = _ivfpq_with + """,
shortlist AS (SELECT query_id, vec_id FROM ranked WHERE rnk <= 15),
rescored AS (
  SELECT s.query_id, s.vec_id,
         floor(list_cosine_similarity(q.qv, b.v) * 10000 + 0.5) / 10000 AS cos4
  FROM shortlist s
  JOIN q ON q.query_id = s.query_id
  JOIN base b ON b.vec_id = s.vec_id
),
reranked AS (
  SELECT query_id, vec_id, cos4,
         row_number() OVER (PARTITION BY query_id ORDER BY cos4 DESC, vec_id ASC) AS rnk
  FROM rescored
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank, cos4 AS cosine
FROM reranked WHERE rnk <= 5
"""

    # the persisted index path is gated by the SAME truth: identical
    # centroids/codebooks/tie-breaks as the one-shot operator
    o["sim_ivfpq_search"] = o["sim_ivfpq_topk"]

    # INT8 scalar quantization: symmetric absmax, codes =
    # floor(x/(amax/127) + 0.5) — every step elementwise double math on
    # identical operands, replayed exactly. Checksums CAST to BIGINT
    # (DuckDB list_sum widens); arithmetic literals ::DOUBLE (bare
    # decimals parse as DECIMAL and flip floor(+0.5) boundaries).
    # Matryoshka truncation: 16-dim prefix, sequential-fold norm (Spark's
    # aggregate starts at 0.0; 0.0 + x == x for non-negative squares, so
    # list_reduce's first-element seed folds identically), elementwise
    # renorm divisions on identical operands, 4dp-quantized checksums.
    o["embedding_matryoshka"] = """
WITH t AS (
  SELECT vec_id, (embedding::DOUBLE[])[1:16] AS x FROM embeddings),
n AS (
  SELECT vec_id, x,
         sqrt(list_reduce(list_transform(x, e -> e * e), (a, b) -> a + b)) AS nrm
  FROM t),
r AS (
  SELECT vec_id, nrm,
         CASE WHEN nrm = 0 THEN x
              ELSE list_transform(x, e -> e / nrm) END AS v
  FROM n)
SELECT vec_id,
       floor(nrm * 10000 + 0.5) / 10000 AS norm4,
       CAST(list_sum(list_transform(v,
            e -> CAST(floor(e * 10000 + 0.5) AS BIGINT))) AS BIGINT) AS code_sum,
       CAST(list_sum(list_transform(v,
            e -> abs(CAST(floor(e * 10000 + 0.5) AS BIGINT)))) AS BIGINT) AS code_abs_sum
FROM r
"""

    o["embedding_quantize"] = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
a AS (SELECT vec_id, x, list_max(list_transform(x, e -> abs(e))) AS amax FROM v),
q AS (
  SELECT vec_id, x, amax,
    CASE WHEN amax = 0
      THEN list_transform(x, e -> CAST(0 AS BIGINT))
      ELSE list_transform(x, e -> CAST(floor(e / (amax / 127.0::DOUBLE) + 0.5::DOUBLE) AS BIGINT))
    END AS codes
  FROM a
)
SELECT vec_id,
  floor(amax * 10000 + 0.5) / 10000 AS amax4,
  CAST(list_sum(codes) AS BIGINT) AS codes_sum,
  CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS codes_abs_sum,
  floor(list_max(list_transform(list_zip(x, codes),
        p -> abs(p[1] - p[2] * (amax / 127.0::DOUBLE)))) * 10000 + 0.5) / 10000 AS max_err4
FROM q
"""

    # RESIDUAL-coded IVF-PQ: shared scaffolding for the det- and
    # Lloyd-trained-codebook twins — same centroid / probe / ranking shape
    # as sim_ivfpq_topk, but codes quantize the RESIDUAL v - centroid(v)
    # and the ADC score carries the residual cross terms:
    # adot = sum_j T[j,code_j] + dot(q, centroid_b) and
    # |reconstruction|^2 = |centroid|^2 + 2*sum_j dot(centroid_sub_j,
    # cb[j,code_j]) + sum_j |cb[j,code_j]|^2 (similarity.ivfpq_topk's
    # residual branch, lookup-table form). 2.0::DOUBLE guards the DuckDB
    # bare-decimal DECIMAL trap; greatest(..., 1e-300) mirrors the
    # kernel's zero-norm clamp. The two entries differ ONLY in the CTE
    # that yields cb(m, code, cent).
    _res_head = """
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
  FROM embeddings WHERE vec_id >= 5 ORDER BY vec_id ASC LIMIT 8
),
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5),
assign_scored AS (
  SELECT base.vec_id, base.v, cents.centroid_id, cents.cv,
         row_number() OVER (PARTITION BY base.vec_id
             ORDER BY list_cosine_similarity(base.v, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM base CROSS JOIN cents
),
assigned AS (SELECT vec_id, centroid_id, cv FROM assign_scored WHERE rn = 1),
subspaces AS (SELECT unnest(range(4)) AS m),
"""
    _res_tail = """
resid AS (
  SELECT b.vec_id, a.centroid_id,
         list_transform(list_zip(b.v, a.cv), x -> x[1] - x[2]) AS r
  FROM base b JOIN assigned a ON a.vec_id = b.vec_id
),
dists AS (
  SELECT rr.vec_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(rr.r, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
  FROM resid rr CROSS JOIN cb c
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
    FROM dists) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
),
probe_scored AS (
  SELECT q.query_id, cents.centroid_id,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, cents.cv) DESC, cents.centroid_id ASC) AS rn
  FROM q CROSS JOIN cents
),
probes AS (SELECT query_id, centroid_id FROM probe_scored WHERE rn <= 2),
qn AS (SELECT query_id, sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
tables AS (
  SELECT q.query_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(q.qv, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> x[1] * x[2])) AS t,
         list_sum(list_transform(c.cent, x -> x*x)) AS n2
  FROM q CROSS JOIN cb c
),
btab AS (
  SELECT ct.centroid_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(ct.cv, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> x[1] * x[2])) AS b
  FROM cents ct CROSS JOIN cb c
),
cn2 AS (SELECT centroid_id, list_sum(list_transform(cv, x -> x*x)) AS cnorm2 FROM cents),
qc AS (
  SELECT q.query_id, ct.centroid_id,
         list_sum(list_transform(list_zip(q.qv, ct.cv), x -> x[1] * x[2])) AS qcdot
  FROM q CROSS JOIN cents ct
),
cand AS (
  SELECT p.query_id, a.vec_id, a.centroid_id
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
),
scored AS (
  SELECT cd.vec_id, cd.query_id,
         sum(tb.t) + any_value(qq.qcdot) AS adot,
         sqrt(greatest(any_value(c2.cnorm2) + 2.0::DOUBLE * sum(bt.b) + sum(tb.n2),
                       1e-300)) AS rnorm
  FROM cand cd
  JOIN codes co ON co.vec_id = cd.vec_id
  JOIN tables tb ON tb.query_id = cd.query_id AND co.m = tb.m AND co.code = tb.code
  JOIN btab bt ON bt.centroid_id = cd.centroid_id AND bt.m = co.m AND bt.code = co.code
  JOIN cn2 c2 ON c2.centroid_id = cd.centroid_id
  JOIN qc qq ON qq.query_id = cd.query_id AND qq.centroid_id = cd.centroid_id
  GROUP BY cd.vec_id, cd.query_id
),
ranked AS (
  SELECT s.query_id, s.vec_id,
         floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 AS ac,
         row_number() OVER (PARTITION BY s.query_id
             ORDER BY floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 DESC,
                      s.vec_id ASC) AS rnk
  FROM scored s JOIN qn USING (query_id)
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank,
       floor(ac * 10000 + 0.5) / 10000 AS approx_cos
FROM ranked WHERE rnk <= 5
"""

    # det codebooks: subspace slices of the first-8 residuals (engine:
    # similarity.pq_codebooks_residual_det) — no training, pure SQL.
    o["sim_ivfpq_residual_det"] = _res_head + """cb_src AS (
  SELECT list_transform(list_zip(b.v, a.cv), x -> x[1] - x[2]) AS r,
         CAST(row_number() OVER (ORDER BY b.vec_id ASC) AS BIGINT) - 1 AS code
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id ASC LIMIT 8) b
  JOIN assigned a ON a.vec_id = b.vec_id
),
cb AS (
  SELECT s.m, c.code, list_slice(c.r, CAST(s.m*16 + 1 AS INT), CAST(s.m*16 + 16 AS INT)) AS cent
  FROM subspaces s CROSS JOIN cb_src c
),""" + _res_tail

    # TRAINED codebooks (sim_ivfpq_residual, VERDICT r12 item 2): replay
    # similarity._lloyd_subspaces_q's quantized per-subspace Lloyd EXACTLY —
    # sample = the 1024 lowest base ids, residuals vs their (cosine-argmax)
    # centroid, then per subspace a greedy maximin init (cent0 = the lowest
    # sample row; cent_i = the row with the MAX running min quantized
    # distance, first-max ties -> lowest row) and 3 Lloyd iterations. Every
    # distance is the exact integer sum of floor((a-b)^2*1e8+0.5) terms and
    # every centroid update is exact integer sums of floor(v*1e6+0.5) with
    # ONE double division (s / (1e6 * n)) — the same cross-engine-exact
    # device as _kmeans_ctes, so init, assignment and updates are
    # bit-identical in numpy and DuckDB. Empty codes keep their center
    # (COALESCE). Generated programmatically like the PCA iterations.
    def _dqq(x: str, c: str) -> str:
        # exact-int quantized squared L2 over one dsub=16 subvector
        return (
            "list_sum(list_transform(range(1, 17), j -> "
            f"CAST(floor(({x}[j] - {c}[j]) * ({x}[j] - {c}[j]) * 1e8 + 0.5) AS BIGINT)))"
        )

    _lloyd_cb = """samp AS MATERIALIZED (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) AS BIGINT) AS srn
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id ASC LIMIT 1024)),
sres AS (
  SELECT s.srn, list_transform(list_zip(s.v, a.cv), x -> x[1] - x[2]) AS r
  FROM samp s JOIN assigned a ON a.vec_id = s.vec_id),
sub AS MATERIALIZED (
  SELECT sr.srn, ss.m, list_slice(sr.r, CAST(ss.m*16 + 1 AS INT), CAST(ss.m*16 + 16 AS INT)) AS x
  FROM sres sr CROSS JOIN subspaces ss),
ic0 AS (SELECT m, x AS c FROM sub WHERE srn = 1),
imd0 AS MATERIALIZED (SELECT s.srn, s.m, {d0} AS mind FROM sub s JOIN ic0 c ON c.m = s.m),
""".format(d0=_dqq("s.x", "c.c"))
    for i in range(1, 8):
        _lloyd_cb += """ic{i} AS MATERIALIZED (SELECT m, x AS c FROM (
  SELECT s.m, s.x, row_number() OVER (PARTITION BY s.m ORDER BY d.mind DESC, s.srn ASC) AS pk
  FROM sub s JOIN imd{p} d ON d.srn = s.srn AND d.m = s.m) WHERE pk = 1),
""".format(i=i, p=i - 1)
        if i < 7:  # the running min is never read after the last pick
            _lloyd_cb += """imd{i} AS MATERIALIZED (SELECT s.srn, s.m, least(d.mind, {dq}) AS mind
  FROM sub s JOIN imd{p} d ON d.srn = s.srn AND d.m = s.m JOIN ic{i} c ON c.m = s.m),
""".format(i=i, p=i - 1, dq=_dqq("s.x", "c.c"))
    _lloyd_cb += "cb0 AS MATERIALIZED (" + "\n  UNION ALL ".join(
        f"SELECT m, CAST({i} AS BIGINT) AS code, c FROM ic{i}" for i in range(8)
    ) + "),\n"
    for t in range(1, 4):
        _lloyd_cb += """ld{t} AS (SELECT s.srn, s.m, cb.code, {dq} AS d
  FROM sub s JOIN cb{p} cb ON cb.m = s.m),
la{t} AS (SELECT srn, m, code FROM (
  SELECT srn, m, code, row_number() OVER (PARTITION BY srn, m ORDER BY d ASC, code ASC) AS pk
  FROM ld{t}) WHERE pk = 1),
ls{t} AS (SELECT m, code, dim,
  CAST(sum(CAST(floor(val * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sm,
  CAST(count(*) AS BIGINT) AS n
  FROM (SELECT a.m, a.code, unnest(s.x) AS val, generate_subscripts(s.x, 1) AS dim
        FROM la{t} a JOIN sub s ON s.srn = a.srn AND s.m = a.m)
  GROUP BY m, code, dim),
lu{t} AS (SELECT m, code, list(sm / (1e6 * n) ORDER BY dim) AS c FROM ls{t} GROUP BY m, code),
cb{t} AS MATERIALIZED (SELECT p.m, p.code, COALESCE(u.c, p.c) AS c
  FROM cb{p} p LEFT JOIN lu{t} u ON u.m = p.m AND u.code = p.code),
""".format(t=t, p=t - 1, dq=_dqq("s.x", "cb.c"))
    _lloyd_cb += "cb AS (SELECT m, code, c AS cent FROM cb3),"
    o["sim_ivfpq_residual"] = _res_head + _lloyd_cb + _res_tail


    # PQ/ADC mirror: same deterministic codebooks (subvectors of the 8
    # lowest BASE ids), same L2 assignment (ties -> lowest code), same
    # cos(q, reconstruction) score, same (score desc, vec_id asc) ranking.
    o["sim_pq_topk"] = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id >= 5
),
cb_src AS (
  SELECT vec_id, v, CAST(row_number() OVER (ORDER BY vec_id ASC) AS BIGINT) - 1 AS code
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id ASC LIMIT 8)
),
subspaces AS (SELECT unnest(range(4)) AS m),
cb AS (
  SELECT s.m, c.code, list_slice(c.v, CAST(s.m*16 + 1 AS INT), CAST(s.m*16 + 16 AS INT)) AS cent
  FROM subspaces s CROSS JOIN cb_src c
),
dists AS (
  SELECT b.vec_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(b.v, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
  FROM base b CROSS JOIN cb c
),
codes AS (
  SELECT vec_id, m, code FROM (
    SELECT vec_id, m, code,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d2 ASC, code ASC) AS rn
    FROM dists) WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5
),
qn AS (SELECT query_id, sqrt(list_sum(list_transform(qv, x -> x*x))) AS qnorm FROM q),
tables AS (
  SELECT q.query_id, c.m, c.code,
         list_sum(list_transform(
           list_zip(list_slice(q.qv, CAST(c.m*16 + 1 AS INT), CAST(c.m*16 + 16 AS INT)), c.cent),
           x -> x[1] * x[2])) AS t,
         list_sum(list_transform(c.cent, x -> x*x)) AS n2
  FROM q CROSS JOIN cb c
),
scored AS (
  SELECT co.vec_id, tb.query_id, sum(tb.t) AS adot, sqrt(greatest(sum(tb.n2), 1e-300)) AS rnorm
  FROM codes co JOIN tables tb ON co.m = tb.m AND co.code = tb.code
  GROUP BY co.vec_id, tb.query_id
),
ranked AS (
  SELECT s.query_id, s.vec_id,
         floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 AS ac,
         row_number() OVER (PARTITION BY s.query_id
             ORDER BY floor(s.adot / (qn.qnorm * s.rnorm) * 10000 + 0.5) / 10000 DESC,
                      s.vec_id ASC) AS rnk
  FROM scored s JOIN qn USING (query_id)
)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank,
       floor(ac * 10000 + 0.5) / 10000 AS approx_cos
FROM ranked WHERE rnk <= 5
"""
    # embedding_pca: 3 unrolled power-iteration rounds, each an exact
    # integer fold (HUGEINT internally, cast at the boundaries) with the
    # renormalize quantize floor(s/n*1e4+0.5) — mirrors
    # similarity.power_iteration_top_pc's python-driver arithmetic
    # operation for operation (int->double conversions are correctly
    # rounded in both runtimes).
    pca_iters = "".join(
        f""",
d{i} AS (SELECT vec_id, CAST(sum(v * w) AS BIGINT) AS dot
         FROM ek JOIN w{i} USING (dim) GROUP BY vec_id),
s{i} AS (SELECT dim, sum(CAST(v AS HUGEINT) * dot) AS s
         FROM ek JOIN d{i} USING (vec_id) GROUP BY dim),
n{i} AS (SELECT sqrt(CAST(sum(s * s) AS DOUBLE)) AS n FROM s{i}),
w{i + 1} AS (SELECT dim, CAST(floor(CAST(s AS DOUBLE) / n * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS w
             FROM s{i}, n{i})"""
        for i in range(1, 4)
    )
    o["embedding_pca"] = f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)) AS e4
  FROM embeddings),
ek AS (
  SELECT vec_id, CAST(k AS INT) AS dim, e4[CAST(k AS INT) + 1] AS v
  FROM e, unnest(range(64)) AS t(k)),
w1 AS (SELECT CAST(k AS INT) AS dim, CAST(10000 AS BIGINT) AS w FROM range(64) t(k)){pca_iters}
SELECT CAST(dim AS BIGINT) AS dim, w AS pc4 FROM w4
"""

    # embedding_kmeans/semdedup: the IDENTICAL quantized Lloyd recursion
    # in DuckDB list ops — init = the k lowest vec_ids (k_sql is a SQL
    # expression so semdedup can replay auto-k = max(4, ceil(n/125)) from
    # its own count, VERDICT r12 item 6), every distance term
    # floor-quantized to a scaled BIGINT before summation, centroid
    # updates as exact integer sums with ONE double division, empty
    # clusters keep the previous centroid, final assignment reported.
    def _kmeans_ctes(k_sql="4", recursive=False):
        # recursive=True emits WITH RECURSIVE so callers can append a
        # recursive CTE (semdedup's greedy-keeper replay)
        return f"""
WITH {"RECURSIVE " if recursive else ""}e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
init AS (
  SELECT cid, c FROM (
    SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, v AS c,
           row_number() OVER (ORDER BY vec_id) AS rn
    FROM e) WHERE rn <= ({k_sql})),
d1 AS (
  SELECT e.vec_id, e.v, i.cid,
         list_sum(list_transform(range(1, 65), j -> CAST(floor((e.v[j] - i.c[j]) * (e.v[j] - i.c[j]) * 1e8 + 0.5) AS BIGINT))) AS dq
  FROM e e CROSS JOIN init i),
a1 AS (
  SELECT vec_id, v, cid, dq FROM (
    SELECT vec_id, v, cid, dq,
           row_number() OVER (PARTITION BY vec_id ORDER BY dq ASC, cid ASC) AS rn
    FROM d1)
  WHERE rn = 1),
s1 AS (
  SELECT cid, dim,
         CAST(sum(CAST(floor(val * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a1)
  GROUP BY cid, dim),
u1 AS (
  SELECT cid, list(s / (1e6 * n) ORDER BY dim) AS c FROM s1 GROUP BY cid),
cent1 AS (
  SELECT p.cid, COALESCE(u1.c, p.c) AS c
  FROM init p LEFT JOIN u1 USING (cid)),
d2 AS (
  SELECT e.vec_id, e.v, i.cid,
         list_sum(list_transform(range(1, 65), j -> CAST(floor((e.v[j] - i.c[j]) * (e.v[j] - i.c[j]) * 1e8 + 0.5) AS BIGINT))) AS dq
  FROM e e CROSS JOIN cent1 i),
a2 AS (
  SELECT vec_id, v, cid, dq FROM (
    SELECT vec_id, v, cid, dq,
           row_number() OVER (PARTITION BY vec_id ORDER BY dq ASC, cid ASC) AS rn
    FROM d2)
  WHERE rn = 1),
s2 AS (
  SELECT cid, dim,
         CAST(sum(CAST(floor(val * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM a2)
  GROUP BY cid, dim),
u2 AS (
  SELECT cid, list(s / (1e6 * n) ORDER BY dim) AS c FROM s2 GROUP BY cid),
cent2 AS (
  SELECT p.cid, COALESCE(u2.c, p.c) AS c
  FROM cent1 p LEFT JOIN u2 USING (cid)),
d3 AS (
  SELECT e.vec_id, e.v, i.cid,
         list_sum(list_transform(range(1, 65), j -> CAST(floor((e.v[j] - i.c[j]) * (e.v[j] - i.c[j]) * 1e8 + 0.5) AS BIGINT))) AS dq
  FROM e e CROSS JOIN cent2 i),
a3 AS (
  SELECT vec_id, v, cid, dq FROM (
    SELECT vec_id, v, cid, dq,
           row_number() OVER (PARTITION BY vec_id ORDER BY dq ASC, cid ASC) AS rn
    FROM d3)
  WHERE rn = 1)"""

    o["embedding_kmeans"] = _kmeans_ctes() + """
SELECT cid AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       floor(CAST(sum(dq) AS BIGINT) / 1e4 + 0.5) / 1e4 AS inertia
FROM a3 GROUP BY cid
"""

    # semdedup: the SAME exact quantized Lloyd recursion (shared CTEs — a3
    # is the final assignment vs cent2, identical to the engine's), then
    # within-cluster cosine pairs and the deterministic lowest-id keeper.
    # auto-k (VERDICT r12 item 6): the engine derives k = max(4,
    # ceil(n/125)) from its own count; the replay computes the identical
    # integer ceil from the table. Keeper (r13, ADVICE r12): ITERATIVE
    # GREEDY in id order, replayed as a recursive CTE stepping one member
    # per cluster per level and carrying the kept set as a list — a member
    # is kept iff no ALREADY-KEPT member scores >= threshold against it
    # (transitivity-safe, unlike the r12 any-lower-id dominance).
    _semdedup_k = "greatest(4, (CAST((SELECT count(*) FROM e) AS BIGINT) + 124) // 125)"
    o["semdedup"] = _kmeans_ctes(_semdedup_k, recursive=True) + """,
mem AS (
  SELECT cid, vec_id, v,
         row_number() OVER (PARTITION BY cid ORDER BY vec_id) AS rn
  FROM a3),
nmax AS (SELECT cid, max(rn) AS mx FROM mem GROUP BY cid),
g AS (
  SELECT cid, rn, [struct_pack(id := vec_id, v := v)] AS kept
  FROM mem WHERE rn = 1
  UNION ALL
  SELECT m.cid, m.rn,
         CASE WHEN len(list_filter(g.kept,
                x -> x.id < m.vec_id
                     AND list_cosine_similarity(x.v, m.v) >= 0.35)) > 0
              THEN g.kept
              ELSE list_append(g.kept, struct_pack(id := m.vec_id, v := m.v))
         END
  FROM g JOIN mem m ON m.cid = g.cid AND m.rn = g.rn + 1),
keptids AS (
  SELECT g.cid, unnest(list_transform(g.kept, x -> x.id)) AS vec_id
  FROM g JOIN nmax ON g.cid = nmax.cid AND g.rn = nmax.mx),
counts AS (
  SELECT a.cid AS cluster_id,
         CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(count(k.vec_id) AS BIGINT) AS n_kept
  FROM a3 a LEFT JOIN keptids k ON k.cid = a.cid AND k.vec_id = a.vec_id
  GROUP BY a.cid)
SELECT cluster_id, n_vecs, n_kept, n_vecs - n_kept AS n_dropped
FROM counts
"""
    return o
