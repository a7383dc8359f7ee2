"""DuckDB oracle SQL for the driver correctness gate — document dedup: minhash-LSH, simhash, winnowing, fuzzy, clusters, index.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.functions import text as TX
from kadiyadb_spark.oracles.fragments import (
    SEC,
    T0,
    _SHINGLES8,
    _DOC_NORM,
    _TOKENS,
    _MINHASH_SIG,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    b = T0 + 3600 * SEC

    stop = TX.EN_STOPWORDS

    # ---- dedup ----
    # NULL rule twin (_content_fp): a NULL-text doc fingerprints uniquely
    o["dedup_exact"] = f"""
SELECT CASE WHEN text IS NULL THEN '__null__' || CAST(doc_id AS VARCHAR)
       ELSE md5({_DOC_NORM}) END AS fp,
       min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1 HAVING count(*) >= 2
"""

    band_keys = ", ".join(
        f"CAST(m{2 * b} AS VARCHAR) || '|' || CAST(m{2 * b + 1} AS VARCHAR) AS bk{b}"
        for b in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, bk{b} AS band_key FROM sigs" for b in range(4)
    )

    _minhash_pairs_cte = f"""d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
sh AS (SELECT doc_id, {_SHINGLES8} AS sh FROM d),
hsx AS (SELECT doc_id, sh, [CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) for s in sh] AS hs FROM sh),
mh AS (SELECT doc_id, sh, {_MINHASH_SIG} FROM hsx),
sigs AS (SELECT doc_id, {band_keys} FROM mh),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
jac AS (
  SELECT c.id_a, c.id_b,
         floor((CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(x.sh, y.sh)))) * 10000 + 0.5) / 10000 AS jaccard
  FROM cand c JOIN sh x ON c.id_a = x.doc_id JOIN sh y ON c.id_b = y.doc_id
)"""
    o["dedup_minhash_lsh"] = f"""
WITH {_minhash_pairs_cte}
SELECT id_a, id_b, jaccard FROM jac WHERE jaccard >= 0.1
"""

    o["cross_source_dups"] = f"""
WITH {_minhash_pairs_cte},
p2 AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.1),
src AS (SELECT doc_id, source FROM documents),
resolved AS (
  SELECT least(sa.source, sb.source) AS source_a,
         greatest(sa.source, sb.source) AS source_b
  FROM p2 JOIN src sa ON p2.id_a = sa.doc_id
          JOIN src sb ON p2.id_b = sb.doc_id
)
SELECT source_a, source_b, count(*) AS n_pairs
FROM resolved GROUP BY source_a, source_b
"""

    # Incremental index probe: corpus = doc_id < 400, batch = doc_id >= 400;
    # candidates from band collision, scored by signature agreement (the
    # MinHash Jaccard estimator — the index stores signatures, not shingles).
    _sig_eq_sum = " + ".join(f"(CASE WHEN x.m{i} = y.m{i} THEN 1 ELSE 0 END)" for i in range(8))
    o["dedup_index_query"] = f"""
WITH d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
sh AS (SELECT doc_id, {_SHINGLES8} AS sh FROM d),
hsx AS (SELECT doc_id, [CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) for s in sh] AS hs FROM sh),
mh AS (SELECT doc_id, {_MINHASH_SIG} FROM hsx),
sigs AS (SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, {band_keys} FROM mh),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS index_id
  FROM banded a JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
  WHERE a.doc_id < 400 AND b.doc_id >= 400
),
est AS (
  SELECT c.new_id, c.index_id,
         floor((({_sig_eq_sum}) / 8.0) * 10000 + 0.5) / 10000 AS est_jaccard
  FROM cand c JOIN sigs x ON c.new_id = x.doc_id JOIN sigs y ON c.index_id = y.doc_id
)
SELECT new_id, index_id, est_jaccard FROM est WHERE est_jaccard >= 0.5
"""

    # Incremental ADD: the Spark side builds on <300, appends 300-399, then
    # probes >=400 — the oracle is the very same one-shot corpus<400 query,
    # asserting build+add is indistinguishable from indexing up front.
    o["dedup_index_add"] = o["dedup_index_query"]

    # Streaming two-batch acceptance cascade: batch 1 ([166,332)) is checked
    # against the seeded index (<166, all accepted); batch 2 (>=332) against
    # the seed PLUS batch 1's survivors. Same banding + signature-agreement
    # estimate >= 0.5 as the index itself.
    o["streaming_index_dedup"] = f"""
WITH d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
sh AS (SELECT doc_id, {_SHINGLES8} AS sh FROM d),
hsx AS (SELECT doc_id, [CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) for s in sh] AS hs FROM sh),
mh AS (SELECT doc_id, {_MINHASH_SIG} FROM hsx),
sigs AS (SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, {band_keys} FROM mh),
banded AS ({band_union}),
grp AS (SELECT doc_id,
               CASE WHEN doc_id < 166 THEN 0 WHEN doc_id < 332 THEN 1 ELSE 2 END AS g
        FROM d),
cand AS (
  SELECT DISTINCT a.doc_id AS idx_id, b.doc_id AS new_id
  FROM banded a
  JOIN banded b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
  JOIN grp ga ON ga.doc_id = a.doc_id
  JOIN grp gb ON gb.doc_id = b.doc_id
  WHERE ga.g < gb.g
),
mtch AS (
  SELECT c.idx_id, c.new_id
  FROM cand c JOIN sigs x ON c.new_id = x.doc_id JOIN sigs y ON c.idx_id = y.doc_id
  WHERE floor((({_sig_eq_sum}) / 8.0) * 10000 + 0.5) / 10000 >= 0.5
),
m1 AS (
  SELECT new_id, count(*) AS n_dups FROM mtch
  WHERE new_id >= 166 AND new_id < 332 AND idx_id < 166
  GROUP BY new_id
),
a1 AS (
  SELECT doc_id FROM grp
  WHERE g = 1 AND doc_id NOT IN (SELECT new_id FROM m1)
),
m2 AS (
  SELECT new_id, count(*) AS n_dups FROM mtch
  WHERE new_id >= 332
    AND (idx_id < 166 OR idx_id IN (SELECT doc_id FROM a1))
  GROUP BY new_id
),
allm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
SELECT g.doc_id,
       CAST(CASE WHEN allm.new_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS accepted,
       CAST(coalesce(allm.n_dups, 0) AS BIGINT) AS n_dups
FROM grp g LEFT JOIN allm ON allm.new_id = g.doc_id
WHERE g.g >= 1
"""

    o["dedup_winnow_pairs"] = f"""
WITH d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
h AS (SELECT doc_id,
        list_sort(list_distinct(
          [CAST(('0x' || substr(md5(substr(norm, i, 8)), 1, 8)) AS BIGINT)
           for i in range(1, greatest(len(norm) - 7, 1) + 1)])) AS hs
      FROM d),
mins AS (SELECT doc_id, unnest([hs[1 + (0 % len(hs))], hs[1 + (1 % len(hs))],
                                hs[1 + (2 % len(hs))], hs[1 + (3 % len(hs))]]) AS hv FROM h),
dmins AS (SELECT DISTINCT doc_id, hv FROM mins)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM dmins a JOIN dmins b ON a.hv = b.hv AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""

    # containment: shingle STRINGS join directly (no hash needed); the
    # max_df stoplist defines the profile on BOTH engines; threshold
    # compares the FLOORED 4dp ratios (0.5 dyadic -> exact)
    o["dedup_containment"] = f"""
WITH d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
e AS (
  SELECT doc_id, unnest(list_distinct(
           [substr(norm, i, 8) for i in range(1, greatest(len(norm) - 7, 1) + 1)])) AS sh
  FROM d
),
freq AS (SELECT sh, count(*) AS df FROM e GROUP BY sh),
rare AS (SELECT e.doc_id, e.sh FROM e JOIN freq USING (sh) WHERE df <= 10),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rare GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
c AS (
  SELECT id_a, id_b, n_shared, sa.n AS size_a, sb.n AS size_b,
         floor((CAST(n_shared AS DOUBLE) / CAST(sa.n AS DOUBLE)) * 10000 + 0.5) / 10000 AS cont_a,
         floor((CAST(n_shared AS DOUBLE) / CAST(sb.n AS DOUBLE)) * 10000 + 0.5) / 10000 AS cont_b
  FROM inter JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
)
SELECT * FROM c WHERE greatest(cont_a, cont_b) >= 0.5::DOUBLE
"""

    # Keep-best over the same cluster graph: per cluster, the highest
    # 4dp-scaled quality wins, ties to the lowest id (the same qual CTE as
    # pipeline_curate — term order matters for FP identity)
    o["dedup_keep_best"] = f"""
WITH RECURSIVE {_minhash_pairs_cte},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.1),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
clus AS (SELECT n AS node, least(n, min(m)) AS cluster_id FROM reach GROUP BY n),
tq AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents),
qual AS (
  SELECT doc_id,
         floor((0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
               + 0.25 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(len(text), 1))
               + 0.25 * least((CAST(len(list_filter(toks, x -> list_contains({stop!r}, x))) AS DOUBLE) / greatest(len(toks), 1)) * 5.0, 1.0)
               ) * 10000 + 0.5) / 10000 AS quality
  FROM tq
),
j AS (SELECT c.cluster_id, c.node, CAST(round(q.quality * 10000) AS BIGINT) AS s4i
      FROM clus c LEFT JOIN qual q ON q.doc_id = c.node),
r AS (SELECT cluster_id, node, s4i,
             CAST(row_number() OVER (PARTITION BY cluster_id
                 ORDER BY s4i DESC NULLS LAST, node ASC) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
      FROM j)
SELECT cluster_id, node AS keeper_id, n_members, s4i / 10000.0 AS quality
FROM r WHERE rn = 1
"""

    # Transitive closure of the SAME pair graph: min reachable id per node.
    # UNION (distinct) terminates the recursion on cycles.
    o["dedup_clusters"] = f"""
WITH RECURSIVE {_minhash_pairs_cte},
pairs AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.1),
edges AS (SELECT id_a AS s, id_b AS d FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
)
SELECT n AS node, least(n, min(m)) AS cluster_id FROM reach GROUP BY n
"""

    bit_sum = " + ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(32)
    )
    o["text_simhash"] = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({_TOKENS})) AS tok FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM t)
SELECT doc_id, CAST({bit_sum} AS BIGINT) AS simhash FROM h GROUP BY doc_id
"""

    # 4 chunks of 8 bits — sound for max_hamming 3 < 4 (r13: the entry
    # dropped from the unsound hamming<=6-over-4-chunks ask; see
    # q_dedup_simhash_pairs)
    chunk_union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS chunk_idx, (simhash >> {i * 8}) & 255 AS chunk_val FROM sh"
        for i in range(4)
    )
    o["dedup_simhash_pairs"] = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({_TOKENS})) AS tok FROM documents),
hh AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) AS h FROM t),
sh AS (SELECT doc_id, CAST({bit_sum} AS BIGINT) AS simhash FROM hh GROUP BY doc_id),
chunked AS ({chunk_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.simhash AS sa, b.simhash AS sb
  FROM chunked a JOIN chunked b
    ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""

    o["dedup_ngram_jaccard"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                  for i in range(1, len(toks) - 2 + 1)])
              ELSE [] END AS sh
  FROM t
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS sa, b.sh AS sb
  FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
)
SELECT id_a, id_b,
       floor((CAST(len(list_intersect(sa, sb)) AS DOUBLE)
             / len(list_distinct(list_concat(sa, sb)))) * 10000 + 0.5) / 10000 AS jaccard
FROM pairs
"""

    # fuzzy near-dup: the oracle deliberately brute-forces every pair inside
    # the w1 token block — Spark's same+adjacent length-bucket scheme must
    # produce the identical pair set, proving the blocking lossless
    o["dedup_fuzzy"] = """
WITH k AS (
  SELECT doc_id AS id,
         lower(substr(text, 1, 32)) AS head,
         split_part(lower(substr(text, 1, 32)), ' ', 1) AS w1
  FROM documents
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
FROM k a JOIN k b ON a.w1 = b.w1 AND a.id < b.id
WHERE levenshtein(a.head, b.head) <= 8
"""
    return o
