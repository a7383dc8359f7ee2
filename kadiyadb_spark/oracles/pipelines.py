"""DuckDB oracle SQL for the driver correctness gate — composed end-to-end curate/pack/quality/mix pipelines.

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

    band_keys = ", ".join(
        f"CAST(m{2 * b} AS VARCHAR) || '|' || CAST(m{2 * b + 1} AS VARCHAR) AS bk{b}"
        for b in range(4)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, bk{b} AS band_key FROM sigs" for b in range(4)
    )

    stop = TX.EN_STOPWORDS
    def _mh_cte(src: str) -> str:
        return f"""d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM {src}),
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

    # Full curation pipeline: exact dedup -> near-dup cluster reps (the same
    # minhash CTE, over the exact-dedup survivors) -> quality filter ->
    # per-source token budget. Term order in the quality sum matches the
    # Spark expression exactly (FP addition is order-sensitive).
    o["pipeline_curate"] = f"""
WITH RECURSIVE
fp0 AS (SELECT doc_id, md5({_DOC_NORM}) AS f FROM documents),
kept_exact AS (SELECT min(doc_id) AS doc_id FROM fp0 GROUP BY f),
dd AS (SELECT d0.* FROM documents d0 JOIN kept_exact USING (doc_id)),
{_mh_cte('dd')},
p2 AS (SELECT id_a, id_b FROM jac WHERE jaccard >= 0.1),
edges AS (SELECT id_a AS s, id_b AS d FROM p2 UNION SELECT id_b, id_a FROM p2),
reach(n, m) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON e.s = r.m
),
clusters AS (SELECT n AS doc_id, least(n, min(m)) AS cluster_id FROM reach GROUP BY n),
reps AS (
  SELECT dd.doc_id, dd.source FROM dd LEFT JOIN clusters c USING (doc_id)
  WHERE c.cluster_id IS NULL OR c.cluster_id = dd.doc_id
),
tq AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents),
qual AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         floor((0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
               + 0.25 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(len(text), 1))
               + 0.25 * least((CAST(len(list_filter(toks, x -> list_contains({stop!r}, x))) AS DOUBLE) / greatest(len(toks), 1)) * 5.0, 1.0)
               ) * 10000 + 0.5) / 10000 AS quality
  FROM tq
),
final AS (
  SELECT r.source, q.n_tokens, q.quality
  FROM reps r JOIN qual q USING (doc_id)
  WHERE q.quality >= 0.5
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       floor((sum(CAST(round(quality * 10000) AS BIGINT)) / (10000.0 * count(*))) * 10000 + 0.5) / 10000 AS avg_quality
FROM final GROUP BY source
"""

    # Exact dedup + quality floor + concat-and-chunk packing: the fp0/qual
    # fragments mirror pipeline_curate's, the packing CTEs pack_sequences'.
    o["pipeline_pack"] = f"""
WITH fp0 AS (SELECT doc_id, md5({_DOC_NORM}) AS f FROM documents),
kept_exact AS (SELECT min(doc_id) AS doc_id FROM fp0 GROUP BY f),
tq AS (
  SELECT d.doc_id, d.text, {_TOKENS} AS toks
  FROM documents d JOIN kept_exact USING (doc_id)
),
qual AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
         floor((0.25 * least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
               + 0.25 * (CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1))
               + 0.25 * (CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / greatest(len(text), 1))
               + 0.25 * least((CAST(len(list_filter(toks, x -> list_contains({stop!r}, x))) AS DOUBLE) / greatest(len(toks), 1)) * 5.0, 1.0)
               ) * 10000 + 0.5) / 10000 AS quality
  FROM tq
),
c AS (
  SELECT doc_id, doc_id % 8 AS shard, n_tok,
         sum(n_tok) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS end_off
  FROM qual WHERE quality >= 0.5 AND n_tok > 0
),
e AS (
  SELECT doc_id, shard, n_tok, end_off - n_tok AS start_off, end_off,
         unnest(generate_series(CAST((end_off - n_tok) // 512 AS BIGINT),
                                CAST((end_off - 1) // 512 AS BIGINT))) AS chunk_id
  FROM c
)
SELECT CAST(shard AS BIGINT) AS shard, chunk_id,
       count(*) AS n_docs,
       CAST(sum(least(end_off, (chunk_id + 1) * 512)
                - greatest(start_off, chunk_id * 512)) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM e GROUP BY shard, chunk_id
"""

    o["pipeline_quality"] = f"""
WITH t0 AS (SELECT doc_id, source, text, {_TOKENS} AS toks FROM documents),
m AS (
  SELECT doc_id, source, toks,
         len(toks) AS n,
         greatest(len(toks), 1)::DOUBLE AS n_d,
         coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0)::DOUBLE AS tot_len,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS n_symbols,
         len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]')))::DOUBLE AS n_alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits,
         CASE WHEN len(toks) > 0
              THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END AS dupfrac
  FROM t0
),
surv AS (
  SELECT doc_id, source, toks FROM m
  WHERE n >= 30 AND n <= 100000
    AND tot_len / n_d >= 3.0 AND tot_len / n_d <= 10.0
    AND n_symbols / n_d <= 0.1
    AND n_alpha / n_d >= 0.80
    AND stop_hits >= 1
    AND dupfrac <= 0.8
),
tok AS (SELECT doc_id, source, unnest(toks) AS token FROM surv),
f AS (SELECT token, count(*)::DOUBLE AS cnt FROM tok GROUP BY token),
tot AS (SELECT sum(cnt) AS total FROM f),
lp AS (SELECT token, floor((-ln(cnt / total)) * 10000 + 0.5) / 10000 AS nlp4 FROM f, tot),
d AS (
  SELECT tok.doc_id, tok.source, count(*) AS n_tokens,
         floor((sum(CAST(round(lp.nlp4 * 10000) AS BIGINT))
                / (10000.0 * count(*))) * 10000 + 0.5) / 10000 AS ce
  FROM tok JOIN lp USING (token) GROUP BY tok.doc_id, tok.source
),
dr AS (SELECT source, n_tokens, floor(exp(ce) * 10000 + 0.5) / 10000 AS ppl FROM d)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       floor((sum(CAST(round(ppl * 10000) AS BIGINT))
              / (10000.0 * count(ppl))) * 10000 + 0.5) / 10000 AS avg_ppl
FROM dr GROUP BY source
"""

    o["pipeline_mix"] = f"""
WITH t0 AS (SELECT doc_id, source, text, {_TOKENS} AS toks FROM documents),
m AS (
  SELECT doc_id, source, toks,
         len(toks) AS n,
         greatest(len(toks), 1)::DOUBLE AS n_d,
         coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0)::DOUBLE AS tot_len,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS n_symbols,
         len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]')))::DOUBLE AS n_alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits,
         CASE WHEN len(toks) > 0
              THEN 1.0 - len(list_distinct(toks))::DOUBLE / len(toks)
              ELSE 0.0 END AS dupfrac
  FROM t0
),
surv AS (
  SELECT doc_id, source, toks FROM m
  WHERE n >= 30 AND n <= 100000
    AND tot_len / n_d >= 3.0 AND tot_len / n_d <= 10.0
    AND n_symbols / n_d <= 0.1
    AND n_alpha / n_d >= 0.80
    AND stop_hits >= 1
    AND dupfrac <= 0.8
),
per AS (SELECT source, sum(len(toks)) AS n_tokens FROM surv GROUP BY source),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per),
wp AS (SELECT per.source, n_tokens / total AS p FROM per, tot),
ws AS (SELECT sum(pow(p, 0.5)) AS wsum FROM wp),
bo AS (SELECT source,
              floor(((pow(p, 0.5) / wsum) / p) * 10000 + 0.5) / 10000 AS boost
       FROM wp, ws),
mx AS (SELECT max(boost) AS mb FROM bo),
th AS (SELECT source, CAST(floor(boost / mb * 10000 + 0.5) AS BIGINT) AS thr FROM bo, mx),
b AS (
  SELECT s.doc_id, s.source,
         CAST(('0x' || substr(md5('kdb' || CAST(s.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 10000 AS bucket
  FROM surv s
)
SELECT b.source, count(*) AS n_kept, min(b.doc_id) AS first_doc, max(b.doc_id) AS last_doc
FROM b JOIN th ON b.source = th.source
WHERE b.bucket < th.thr
GROUP BY b.source
"""
    return o
