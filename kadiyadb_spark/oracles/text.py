"""DuckDB oracle SQL for the driver correctness gate — text quality, decontamination, retrieval, language ID, LM scores.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.functions import text as TX
from kadiyadb_spark.oracles.fragments import (
    _DOC_NORM,
    _TOKENS,
    _lang_case,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # ---- text ----
    o["text_token_stats"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks, text FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\v\\f\\r]')) AS BIGINT) AS n_subwords,
       floor((CAST(list_sum([len(x) for x in toks]) AS DOUBLE) / greatest(len(toks), 1)) * 10000 + 0.5) / 10000 AS avg_token_len
FROM t
"""

    score_exprs = ", ".join(
        f"CAST(len(list_intersect(toks, {TX.LANG_MARKERS[c]!r})) AS BIGINT) AS score_{c}"
        for c in TX.LANG_PRIORITY
    )
    mx = "greatest(" + ", ".join(f"score_{c}" for c in TX.LANG_PRIORITY) + ")"
    o["text_language_id"] = f"""
WITH t AS (SELECT doc_id, list_distinct({_TOKENS}) AS toks FROM documents),
s AS (SELECT doc_id, {score_exprs} FROM t),
m AS (SELECT *, {mx} AS mx FROM s)
SELECT doc_id, {_lang_case()} AS lang_pred,
       score_en, score_de, score_es, score_fr
FROM m
"""

    stop = TX.EN_STOPWORDS
    o["text_quality"] = f"""
WITH t AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents),
c AS (
  SELECT doc_id,
         len(toks) AS n,
         CAST(len(list_filter(toks, x -> list_contains({stop!r}, x))) AS DOUBLE)
           / greatest(len(toks), 1) AS stop_ratio,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS uniq_ratio,
         CAST(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
           / greatest(len(text), 1) AS alpha_ratio,
         least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) AS len_score
  FROM t
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
       floor((stop_ratio) * 10000 + 0.5) / 10000 AS stopword_ratio,
       floor((uniq_ratio) * 10000 + 0.5) / 10000 AS unique_ratio,
       floor((alpha_ratio) * 10000 + 0.5) / 10000 AS alpha_ratio,
       floor((0.25 * len_score + 0.25 * uniq_ratio + 0.25 * alpha_ratio
             + 0.25 * least(stop_ratio * 5.0, 1.0)) * 10000 + 0.5) / 10000 AS quality
FROM c
"""

    # char_entropy: per-character terms quantized ONCE to exact longs
    # (term4 = floor(c*log2(c)*1e4 + 0.5)); the per-doc total is an
    # order-free LONG sum, one final double expression mirrored verbatim
    # from text.py:char_entropy. The Spark side folds sorted runs
    # shuffle-free; this replay groups — same integers either way.
    o["text_char_entropy"] = """
WITH c AS (
  SELECT doc_id, unnest([substr(text, i, 1) for i in range(1, len(text) + 1)]) AS ch
  FROM documents WHERE len(text) > 0
),
rc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt FROM c GROUP BY 1, 2),
a AS (SELECT doc_id,
             CAST(sum(CAST(floor(cnt * log2(cnt) * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS ent4,
             CAST(sum(cnt) AS BIGINT) AS n_chars,
             CAST(count(*) AS BIGINT) AS n_distinct_chars
      FROM rc GROUP BY 1)
SELECT doc_id, n_chars, n_distinct_chars,
       floor((log2(n_chars) - (ent4 / 10000.0) / n_chars) * 10000 + 0.5) / 10000 AS char_entropy
FROM a
"""

    o["text_fingerprint"] = f"""
SELECT doc_id, md5({_DOC_NORM}) AS fp FROM documents
"""

    # Word 5-grams as a DuckDB list comprehension over the shared token
    # fragment; docs with < 5 tokens yield an empty gram list (mirrors
    # word_ngrams_expr's short-doc guard).
    _GRAMS5 = (
        "[array_to_string(toks[i : i + 4], ' ') for i in range(1, greatest(len(toks) - 3, 1))]"
    )
    o["text_decontaminate"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
g AS (SELECT DISTINCT doc_id, unnest({_GRAMS5}) AS gram FROM t),
b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
SELECT g.doc_id, count(*) AS n_hits
FROM g JOIN b USING (gram) GROUP BY g.doc_id
"""

    # The Bloom probe is a pure prefilter (false positives die in the exact
    # verify join), so the bloom entry's truth IS the exact operator's.
    o["decontaminate_bloom"] = o["text_decontaminate"]

    # decontaminate_spans mirror: positioned grams -> hit word ranges ->
    # every overlapped 10-word span dropped -> ordered reconstruction;
    # all docs visible (fully-dirty/token-less -> '')
    o["text_decontaminate_spans"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
b AS (SELECT DISTINCT gram
      FROM (SELECT unnest({_GRAMS5}) AS gram FROM t WHERE doc_id % 50 = 0)),
g AS (
  SELECT doc_id, pr.p - 1 AS gidx, pr.g AS gram
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 3),
                      i -> {{'p': i, 'g': array_to_string(toks[CAST(i AS INT) : CAST(i AS INT) + 4], ' ')}})) AS pr
        FROM t WHERE len(toks) >= 5)
),
hits AS (SELECT DISTINCT doc_id, gidx FROM g JOIN b USING (gram)),
dirty AS (
  SELECT DISTINCT doc_id,
         unnest(range(gidx // 10, (gidx + 4) // 10 + 1)) AS span_idx
  FROM hits
),
spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS span_idx,
         array_to_string(toks[CAST(i * 10 + 1 AS INT) : CAST(i * 10 + 10 AS INT)], ' ') AS span
  FROM (SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS i
        FROM t WHERE len(toks) > 0)
),
agg AS (
  SELECT s.doc_id,
         string_agg(CASE WHEN d.span_idx IS NULL THEN s.span END, ' ' ORDER BY s.span_idx) AS text,
         CAST(count(CASE WHEN d.span_idx IS NULL THEN 1 END) AS BIGINT) AS n_spans_kept,
         CAST(count(d.span_idx) AS BIGINT) AS n_spans_removed
  FROM spans s LEFT JOIN dirty d USING (doc_id, span_idx)
  GROUP BY s.doc_id
)
SELECT doc_id,
       coalesce(text, '') AS text,
       coalesce(n_spans_kept, 0) AS n_spans_kept,
       coalesce(n_spans_removed, 0) AS n_spans_removed
FROM (SELECT DISTINCT doc_id FROM documents) LEFT JOIN agg USING (doc_id)
"""

    o["text_repetition"] = f"""
WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0
              THEN floor((1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)) * 10000 + 0.5) / 10000
              ELSE 0.0 END AS dup_token_frac,
         CASE WHEN len(g) > 0
              THEN floor((1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)) * 10000 + 0.5) / 10000
              ELSE 0.0 END AS dup_bigram_frac
  FROM (SELECT doc_id, toks,
               [array_to_string(toks[i : i + 1], ' ') for i in range(1, greatest(len(toks), 1))] AS g
        FROM t)
),
cnt AS (SELECT doc_id, tok, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2),
top AS (SELECT doc_id, floor(CAST(max(c) AS DOUBLE) / sum(c) * 10000 + 0.5) / 10000 AS top_token_frac
        FROM cnt GROUP BY doc_id)
SELECT base.doc_id, n_tokens, dup_token_frac,
       coalesce(top_token_frac, 0.0) AS top_token_frac, dup_bigram_frac
FROM base LEFT JOIN top USING (doc_id)
"""

    # Corpus span dedup: a span survives only at its globally-first
    # (doc_id, span_idx); docs rebuilt from survivors in span order.
    o["text_span_dedup"] = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), t -> t != '') AS tk FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS span_idx,
         array_to_string(tk[(i*10+1):(i*10+10)], ' ') AS span
  FROM toks, unnest(range(CAST(ceil(len(tk)/10.0) AS BIGINT))) AS t(i)
),
ranked AS (
  SELECT doc_id, span_idx, span,
         row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
  FROM spans
)
SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text,
       count(*) AS n_spans_kept
FROM ranked WHERE rn = 1 GROUP BY doc_id
"""

    o["text_chunk"] = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), t -> t != '') AS tk FROM documents),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         tk[(i*12+1):(i*12+16)] AS w
  FROM toks, unnest(range(CAST(greatest(1, ceil(len(tk)/12.0)) AS BIGINT))) AS t(i)
  WHERE i*12 < len(tk) AND (i = 0 OR (i-1)*12 + 16 < len(tk))
)
SELECT doc_id, chunk_idx, array_to_string(w, ' ') AS chunk,
       CAST(len(w) AS BIGINT) AS n_tokens
FROM c
"""

    o["rag_hashed_retrieval"] = """
WITH toks0 AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), t -> t != '') AS tk FROM documents WHERE doc_id >= 10),
chunks AS (
  SELECT doc_id*1000 + CAST(i AS BIGINT) AS vec_id,
         array_to_string(tk[(i*12+1):(i*12+16)], ' ') AS chunk
  FROM toks0, unnest(range(CAST(greatest(1, ceil(len(tk)/12.0)) AS BIGINT))) AS t(i)
  WHERE i*12 < len(tk) AND (i = 0 OR (i-1)*12 + 16 < len(tk))
),
cb AS (
  SELECT vec_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT vec_id, unnest(string_split(lower(chunk), ' ')) AS tok FROM chunks)
  WHERE tok <> '' GROUP BY 1, 2
),
qb AS (
  SELECT doc_id AS query_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\v\\f\\r]+'), t -> t != '')) AS tok
        FROM documents WHERE doc_id < 3)
  WHERE tok <> '' GROUP BY 1, 2
),
cn AS (SELECT vec_id, sqrt(sum(c*c)) AS n FROM cb GROUP BY vec_id),
qn AS (SELECT query_id, sqrt(sum(c*c)) AS n FROM qb GROUP BY query_id),
dots AS (
  SELECT q.query_id, v.vec_id, sum(q.c * v.c) AS d
  FROM qb q JOIN cb v ON q.b = v.b GROUP BY 1, 2
),
allpairs AS (
  SELECT q.query_id, v.vec_id
  FROM (SELECT DISTINCT query_id FROM qb) q CROSS JOIN (SELECT DISTINCT vec_id FROM cb) v
),
cosd AS (
  SELECT a.query_id, a.vec_id,
         floor((COALESCE(d.d, 0) / (qn.n * cn.n)) * 10000 + 0.5) / 10000 AS cosine
  FROM allpairs a
  LEFT JOIN dots d ON a.query_id = d.query_id AND a.vec_id = d.vec_id
  JOIN qn ON a.query_id = qn.query_id JOIN cn ON a.vec_id = cn.vec_id
)
SELECT query_id, vec_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS BIGINT) AS rank,
       cosine
FROM cosd
QUALIFY rank <= 5
"""

    o["text_boilerplate"] = """
WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \\t\\n\\v\\f\\r]+'), t -> t != '') AS tk FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS span_idx,
         array_to_string(tk[(i*3+1):(i*3+3)], ' ') AS span
  FROM toks, unnest(range(CAST(ceil(len(tk)/3.0) AS BIGINT))) AS t(i)
),
f AS (SELECT span, count(DISTINCT doc_id) AS nd FROM spans GROUP BY span)
SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) AS text,
       count(*) AS n_spans_kept
FROM spans JOIN f USING (span)
WHERE f.nd < 2 GROUP BY doc_id
"""

    o["pii_redact"] = """
WITH salted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call +1 555 000 ' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END
         AS text
  FROM documents),
r AS (
  SELECT doc_id, text AS t0,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM salted),
r2 AS (SELECT *, regexp_replace(t1, '\\+?[0-9][0-9()\\- ]{6,14}[0-9]', '<PHONE>', 'g') AS t2 FROM r),
r3 AS (SELECT *, regexp_replace(t2, '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g') AS t3 FROM r2)
SELECT doc_id, t3 AS redacted,
       CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '\\+?[0-9][0-9()\\- ]{6,14}[0-9]')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t2, '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips
FROM r3
"""

    o["text_vocab"] = f"""
WITH t AS (SELECT doc_id, unnest({_TOKENS}) AS token FROM documents)
SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq, count(*) AS coll_freq
FROM t GROUP BY token ORDER BY doc_freq DESC, token ASC LIMIT 50
"""

    o["text_tfidf"] = f"""
WITH t AS (SELECT doc_id, unnest({_TOKENS}) AS token FROM documents),
dfx AS (SELECT token, count(DISTINCT doc_id) AS df FROM t GROUP BY token),
n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM t WHERE doc_id < 20 GROUP BY 1, 2),
scored AS (
  SELECT tf.doc_id, tf.token,
         tf.tf * ln((n.nd + 1.0) / (dfx.df + 1.0)) AS tfidf
  FROM tf CROSS JOIN n JOIN dfx ON tf.token = dfx.token
),
ranked AS (
  SELECT doc_id, token, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rnk
  FROM scored
)
SELECT doc_id, token, CAST(rnk AS BIGINT) AS rnk,
       floor(tfidf * 10000 + 0.5) / 10000 AS tfidf
FROM ranked WHERE rnk <= 3
"""

    o["text_winnow"] = f"""
WITH d AS (SELECT doc_id, {_DOC_NORM} AS norm FROM documents),
h AS (SELECT doc_id,
        list_sort(list_distinct(
          [CAST(('0x' || substr(md5(substr(norm, i, 8)), 1, 8)) AS BIGINT)
           for i in range(1, greatest(len(norm) - 7, 1) + 1)])) AS hs
      FROM d)
SELECT doc_id,
       hs[1 + (0 % len(hs))] AS min0, hs[1 + (1 % len(hs))] AS min1,
       hs[1 + (2 % len(hs))] AS min2, hs[1 + (3 % len(hs))] AS min3 FROM h
"""

    # BM25: per-term score mirrored as the IDENTICAL double expression over
    # exact integer operands (dyadic k1=1.25 / b=0.75; ::DOUBLE on every
    # literal — DuckDB parses bare decimals as DECIMAL), quantized at 4dp,
    # exact long fold per doc, rank on the long
    o["bm25_retrieval"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x != '')) AS term
  FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS N,
              (SELECT CAST(count(*) AS BIGINT) FROM toks) AS T),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       WHERE term IN ('filter', 'merge', 'window') GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         floor((ln(1.0::DOUBLE
                   + (CAST(st.N - dfq.df AS DOUBLE) + 0.5::DOUBLE)
                     / (CAST(dfq.df AS DOUBLE) + 0.5::DOUBLE))
                * (CAST(tf.tf AS DOUBLE) * 2.25::DOUBLE)
                / (CAST(tf.tf AS DOUBLE)
                   + 1.25::DOUBLE * (0.25::DOUBLE
                       + 0.75::DOUBLE * (CAST(dl.dl * st.N AS DOUBLE)
                                         / CAST(st.T AS DOUBLE)))))
               * 10000 + 0.5) / 10000 AS s4
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
               sum(CAST(round(s4 * 10000) AS BIGINT)) AS s4i
        FROM sc GROUP BY doc_id),
r AS (SELECT doc_id, n_matched, s4i,
             CAST(row_number() OVER (ORDER BY s4i DESC, doc_id ASC) AS BIGINT) AS rank
      FROM agg)
SELECT doc_id, n_matched, rank, floor((s4i / 10000.0) * 10000 + 0.5) / 10000 AS score
FROM r WHERE rank <= 20
"""

    # RRF hybrid fusion: the BM25 CTE chain is the bm25_retrieval oracle
    # verbatim; the cosine chain is the rag_hashed_retrieval device with
    # the query as a literal token list; both rankings fuse with the
    # integer contribution 1000000 // (60 + rank) — no doubles survive
    # into the fused output (HUGEINT folds cast back per the r08 doctrine)
    o["rag_rrf_fusion"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x != '')) AS term
  FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
st AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS N,
              (SELECT CAST(count(*) AS BIGINT) FROM toks) AS T),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       WHERE term IN ('filter', 'merge', 'window') GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         floor((ln(1.0::DOUBLE
                   + (CAST(st.N - dfq.df AS DOUBLE) + 0.5::DOUBLE)
                     / (CAST(dfq.df AS DOUBLE) + 0.5::DOUBLE))
                * (CAST(tf.tf AS DOUBLE) * 2.25::DOUBLE)
                / (CAST(tf.tf AS DOUBLE)
                   + 1.25::DOUBLE * (0.25::DOUBLE
                       + 0.75::DOUBLE * (CAST(dl.dl * st.N AS DOUBLE)
                                         / CAST(st.T AS DOUBLE)))))
               * 10000 + 0.5) / 10000 AS s4
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
lexagg AS (SELECT doc_id, sum(CAST(round(s4 * 10000) AS BIGINT)) AS s4i
           FROM sc GROUP BY doc_id),
lexr AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY s4i DESC, doc_id ASC) AS BIGINT) AS rank
         FROM lexagg QUALIFY rank <= 20),
cb AS (
  SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM toks GROUP BY 1, 2),
qb AS (
  SELECT CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 64 AS b,
         CAST(count(*) AS DOUBLE) AS c
  FROM (SELECT unnest(['merge', 'filter', 'window']) AS tok) GROUP BY 1),
cn AS (SELECT doc_id, sqrt(sum(c*c)) AS n FROM cb GROUP BY doc_id),
qn AS (SELECT sqrt(sum(c*c)) AS n FROM qb),
dots AS (
  SELECT v.doc_id, sum(q.c * v.c) AS d
  FROM qb q JOIN cb v ON q.b = v.b GROUP BY 1),
cosd AS (
  SELECT cn.doc_id,
         floor((COALESCE(d.d, 0) / (qn.n * cn.n)) * 10000 + 0.5) / 10000 AS cosine
  FROM cn LEFT JOIN dots d ON cn.doc_id = d.doc_id CROSS JOIN qn),
denser AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY cosine DESC, doc_id ASC) AS BIGINT) AS rank
           FROM cosd QUALIFY rank <= 20),
u AS (SELECT doc_id, 1000000 // (60 + rank) AS c FROM lexr
      UNION ALL SELECT doc_id, 1000000 // (60 + rank) AS c FROM denser),
f AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sources,
             CAST(sum(c) AS BIGINT) AS rrf_micros
      FROM u GROUP BY doc_id)
SELECT doc_id, n_sources, rrf_micros,
       CAST(row_number() OVER (ORDER BY rrf_micros DESC, doc_id ASC) AS BIGINT) AS rank
FROM f QUALIFY rank <= 10
"""

    o["text_keywords"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            x -> x != '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
st AS (SELECT CAST(count(*) AS BIGINT) AS N FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(round(floor((CAST(tf.tf AS DOUBLE)
                           * ln((CAST(st.N AS DOUBLE) + 1.0::DOUBLE)
                                / (CAST(dfq.df AS DOUBLE) + 1.0::DOUBLE)))
                          * 10000 + 0.5) / 10000 * 10000) AS BIGINT) AS s4i
  FROM tf JOIN dfq USING (term) CROSS JOIN st),
r AS (SELECT doc_id, term, tf, s4i,
             CAST(row_number() OVER (PARTITION BY doc_id
                 ORDER BY s4i DESC, term ASC) AS BIGINT) AS rank
      FROM sc)
SELECT doc_id, term, tf, s4i / 10000.0 AS tfidf, rank FROM r WHERE rank <= 3
"""

    o["quality_gopher"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS toks, text FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n,
         greatest(len(toks), 1)::DOUBLE AS n_d,
         coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0)::DOUBLE AS tot_len,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS n_symbols,
         len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]')))::DOUBLE AS n_alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM t
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       floor((tot_len / n_d) * 10000 + 0.5) / 10000 AS avg_word_len,
       floor((n_symbols / n_d) * 10000 + 0.5) / 10000 AS symbol_ratio,
       floor((n_alpha / n_d) * 10000 + 0.5) / 10000 AS alpha_word_frac,
       CAST(stop_hits AS BIGINT) AS stopword_hits,
       CAST(CASE WHEN n >= 50 AND n <= 100000
                  AND tot_len / n_d >= 3.0 AND tot_len / n_d <= 10.0
                  AND n_symbols / n_d <= 0.1
                  AND n_alpha / n_d >= 0.80
                  AND stop_hits >= 2
            THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM m
"""

    # quality_model: full replay of the closed-form centroid distillation
    # (VERDICT r12 item 4) — Gopher gate labels, md5(id)%5 holdout split,
    # EXACT integer class-sum centroids over md5-hashed token buckets, then
    # cosine margins with the same IEEE op tree the Spark side evaluates:
    # d / (sqrt(xx) * norm). Integer sums are exact in both engines; sqrt/
    # division/subtraction are correctly rounded on identical operands, so
    # the doubles match bit-for-bit before the floor(x*1e4+0.5) grid.
    o["quality_model"] = f"""
WITH t AS (
  SELECT doc_id, {_TOKENS} AS toks, text FROM documents
),
m AS (
  SELECT doc_id,
         len(toks) AS n,
         greatest(len(toks), 1)::DOUBLE AS n_d,
         coalesce(list_sum(list_transform(toks, tk -> length(tk))), 0)::DOUBLE AS tot_len,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS n_symbols,
         len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]')))::DOUBLE AS n_alpha,
         len(list_intersect(list_distinct(toks),
             ['the','be','to','of','and','that','have','with'])) AS stop_hits
  FROM t
),
gate AS (
  SELECT doc_id,
         CASE WHEN n >= 50 AND n <= 100000
               AND tot_len / n_d >= 3.0 AND tot_len / n_d <= 10.0
               AND n_symbols / n_d <= 0.1
               AND n_alpha / n_d >= 0.80
               AND stop_hits >= 2
         THEN 1 ELSE 0 END AS label
  FROM m
),
tk AS (SELECT doc_id, unnest(toks) AS tok FROM t),
cb AS (
  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 512 AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM tk GROUP BY 1, 2
),
split AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 5 AS sp
  FROM documents
),
cent AS (
  SELECT g.label AS y, cb.b, CAST(sum(cb.c) AS BIGINT) AS s
  FROM cb JOIN gate g USING (doc_id) JOIN split USING (doc_id)
  WHERE sp != 0 GROUP BY 1, 2
),
nrm AS (SELECT y, sqrt(CAST(sum(s * s) AS DOUBLE)) AS nv FROM cent GROUP BY y),
dots AS (
  SELECT cb.doc_id,
         CAST(sum(cb.c * coalesce(c1.s, 0)) AS BIGINT) AS d1,
         CAST(sum(cb.c * coalesce(c0.s, 0)) AS BIGINT) AS d0,
         CAST(sum(cb.c * cb.c) AS BIGINT) AS xx
  FROM cb
  LEFT JOIN (SELECT b, s FROM cent WHERE y = 1) c1 USING (b)
  LEFT JOIN (SELECT b, s FROM cent WHERE y = 0) c0 USING (b)
  GROUP BY 1
),
n1 AS (SELECT coalesce((SELECT nv FROM nrm WHERE y = 1), 0.0::DOUBLE) AS v),
n0 AS (SELECT coalesce((SELECT nv FROM nrm WHERE y = 0), 0.0::DOUBLE) AS v),
sc AS (
  SELECT d.doc_id,
         CASE WHEN dd.xx IS NULL OR dd.xx = 0 THEN 0.0::DOUBLE
              ELSE (CASE WHEN n1.v > 0 THEN CAST(dd.d1 AS DOUBLE) / (sqrt(CAST(dd.xx AS DOUBLE)) * n1.v) ELSE 0.0::DOUBLE END)
                 - (CASE WHEN n0.v > 0 THEN CAST(dd.d0 AS DOUBLE) / (sqrt(CAST(dd.xx AS DOUBLE)) * n0.v) ELSE 0.0::DOUBLE END)
         END AS margin
  FROM documents d LEFT JOIN dots dd ON d.doc_id = dd.doc_id, n1, n0
)
SELECT doc_id,
       floor(margin * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0 AS quality_score,
       CAST(CASE WHEN margin > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_pass
FROM sc
"""

    o["text_collocations"] = f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
doc_bg AS (
  SELECT unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bg
  FROM toks WHERE len(t) >= 2
),
uni AS (SELECT unnest(t) AS w FROM toks),
unic AS (SELECT w, CAST(count(*) AS BIGINT) AS cw FROM uni GROUP BY w),
tu AS (SELECT CAST(count(*) AS BIGINT) AS Tu FROM uni),
bgc AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM doc_bg
        GROUP BY bg HAVING count(*) >= 5),
tb AS (SELECT CAST(count(*) AS BIGINT) AS Tb FROM doc_bg),
sc AS (
  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2, cb,
         CAST(round(floor((ln(CAST(cb AS DOUBLE) * CAST(Tu AS DOUBLE) * CAST(Tu AS DOUBLE)
                              / (CAST(Tb AS DOUBLE) * CAST(u1.cw AS DOUBLE) * CAST(u2.cw AS DOUBLE))))
                          * 10000 + 0.5) / 10000 * 10000) AS BIGINT) AS s4i
  FROM bgc
  JOIN unic u1 ON split_part(bg, ' ', 1) = u1.w
  JOIN unic u2 ON split_part(bg, ' ', 2) = u2.w
  CROSS JOIN tu CROSS JOIN tb
),
r AS (SELECT w1, w2, cb, s4i,
             CAST(row_number() OVER (ORDER BY s4i DESC, w1 ASC, w2 ASC) AS BIGINT) AS rank
      FROM sc)
SELECT w1, w2, cb AS n_pair, s4i / 10000.0 AS pmi, rank FROM r WHERE rank <= 25
"""

    o["text_bigram_lm"] = f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
doc_bg AS (
  SELECT doc_id, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS bg
  FROM toks WHERE len(t) >= 2
),
uni AS (SELECT unnest(t) AS w FROM toks),
unic AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
tot AS (SELECT count(*) AS T FROM uni),
bgc AS (SELECT bg, count(*) AS cb FROM doc_bg GROUP BY bg),
w1c AS (SELECT split_part(bg, ' ', 1) AS w1, sum(cb) AS c1 FROM bgc GROUP BY 1),
prob AS (
  SELECT b.bg,
         floor((-ln(0.75::DOUBLE * (CAST(b.cb AS DOUBLE) / CAST(w.c1 AS DOUBLE))
                    + 0.25::DOUBLE * (CAST(u.cw AS DOUBLE) / CAST(tot.T AS DOUBLE)))) * 10000 + 0.5) / 10000 AS s4
  FROM bgc b
  JOIN w1c w ON split_part(b.bg, ' ', 1) = w.w1
  JOIN unic u ON split_part(b.bg, ' ', 2) = u.w
  CROSS JOIN tot
),
scored AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         floor((sum(CAST(round((p.s4) * 10000) AS BIGINT)) / (10000.0 * count(p.s4))) * 10000 + 0.5) / 10000 AS cross_entropy
  FROM doc_bg d JOIN prob p ON d.bg = p.bg
  GROUP BY d.doc_id
)
SELECT doc_id, n_bigrams, cross_entropy,
       floor((exp(cross_entropy)) * 10000 + 0.5) / 10000 AS perplexity
FROM scored
"""

    o["unigram_lm"] = f"""
WITH t AS (SELECT doc_id, unnest({_TOKENS}) AS token FROM documents),
f AS (SELECT token, count(*)::DOUBLE AS cnt FROM t GROUP BY token),
tot AS (SELECT sum(cnt) AS total FROM f),
lp AS (SELECT token, floor((-ln(cnt / total)) * 10000 + 0.5) / 10000 AS nlp4 FROM f, tot),
d AS (
  SELECT t.doc_id, count(*) AS n_tokens,
         floor((sum(CAST(round(lp.nlp4 * 10000) AS BIGINT))
                / (10000.0 * count(*))) * 10000 + 0.5) / 10000 AS ce
  FROM t JOIN lp USING (token) GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ce AS cross_entropy,
       floor(exp(ce) * 10000 + 0.5) / 10000 AS perplexity
FROM d
"""
    # text_normalize: the salt is rebuilt with chr() (DuckDB quoted strings
    # do not interpret \\u escapes), then the IDENTICAL chain: control-strip
    # regex, the _NORM_MAP replaces in order, the explicit whitespace class
    # (never \\s — Java and RE2 disagree on \\x0B), trim.
    o["text_normalize"] = r"""
WITH salted AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(8220) || 'quoted' || chr(8221) ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' caf' || chr(233) || chr(160) || 'menu' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN chr(8212) || 'dash' || chr(8230) || chr(7) || '  double  spaced' ELSE '' END
         AS text
  FROM documents),
c AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw,
             regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g') AS t
      FROM salted),
r AS (SELECT doc_id, n_chars_raw,
             replace(replace(replace(replace(replace(replace(replace(replace(t,
               chr(8216), ''''), chr(8217), ''''), chr(8220), '"'), chr(8221), '"'),
               chr(8211), '-'), chr(8212), '-'), chr(160), ' '), chr(8230), '...') AS t
      FROM c),
w AS (SELECT doc_id, n_chars_raw,
             trim(regexp_replace(t, '[ \t\r\n]+', ' ', 'g')) AS text
      FROM r)
SELECT doc_id, text, n_chars_raw, CAST(length(text) AS BIGINT) AS n_chars_norm FROM w
"""

    # url_domain_census: identical salt construction (list literal indexed
    # by doc_id % 7), dialect-shared parse regexes. The registrable domain
    # is a HAND-DERIVED per-host PSL-algorithm ground truth (r12, like
    # url_psl_census) — an independent spec replay of the full-snapshot
    # default path, NOT a code mirror: shop.example.co.uk -> example.co.uk
    # (exact depth-2 rule), www.pref.aichi.jp -> pref.aichi.jp (jp
    # prefecture rule: aichi.jp is public, three-label registrable),
    # foo.bar.ck -> foo.bar.ck (*.ck wildcard: bar.ck is public), and the
    # gTLD hosts resolve by the default last-two-labels rule.
    o["url_domain_census"] = """
WITH u AS (
  SELECT doc_id, n_chars,
         'https://'
         || (['news.example.com', 'cdn.example.org', 'blog.sample.net', 'www.example.com', 'shop.example.co.uk', 'www.pref.aichi.jp', 'foo.bar.ck'])[CAST(doc_id % 7 AS INT) + 1]
         || '/p/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 2 = 1 THEN '?ref=rss' ELSE '' END AS url
  FROM documents),
p AS (
  SELECT doc_id, n_chars, url,
         regexp_replace(regexp_replace(
             regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
             '^.*@', ''), ':[0-9]+$', '') AS host,
         CASE WHEN contains(split_part(url, '#', 1), '?') THEN 1 ELSE 0 END AS has_query
  FROM u),
d AS (
  SELECT doc_id, n_chars, host, has_query,
         CASE host
              WHEN 'news.example.com' THEN 'example.com'
              WHEN 'cdn.example.org' THEN 'example.org'
              WHEN 'blog.sample.net' THEN 'sample.net'
              WHEN 'www.example.com' THEN 'example.com'
              WHEN 'shop.example.co.uk' THEN 'example.co.uk'
              WHEN 'www.pref.aichi.jp' THEN 'pref.aichi.jp'
              WHEN 'foo.bar.ck' THEN 'foo.bar.ck'
         END AS registrable_domain
  FROM p)
SELECT registrable_domain,
       count(*) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(sum(has_query) AS BIGINT) AS n_query_urls,
       CAST(sum(n_chars) AS BIGINT) AS total_n_chars
FROM d GROUP BY registrable_domain
"""
    # dedup_url_canonical: identical salt construction, identical
    # canonicalization chain (lower scheme/host, strip tracking params,
    # sort survivors, trim one trailing slash) in DuckDB list ops.
    o["dedup_url_canonical"] = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
         || (CASE WHEN doc_id % 3 = 0 THEN 'News.Example.com' ELSE 'news.example.com' END)
         || '/p/' || CAST(doc_id // 4 AS VARCHAR)
         || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=7'
                  WHEN doc_id % 4 = 1 THEN '/?id=7&utm_medium=x'
                  WHEN doc_id % 4 = 2 THEN '?id=7'
                  ELSE '?ref=rss' END) AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path0,
         regexp_extract(split_part(url, '#', 1), '[?](.*)$', 1) AS q
  FROM u),
canon AS (
  SELECT doc_id,
         scheme || '://' || host
         || (CASE WHEN regexp_matches(path0, '^/+$') THEN '/'
                  ELSE regexp_replace(path0, '/+$', '') END)
         || (CASE WHEN len(ps) > 0 THEN '?' || array_to_string(ps, '&') ELSE '' END)
         AS canonical_url
  FROM (
    SELECT doc_id, scheme, host, path0,
           list_sort(list_filter(string_split(q, '&'),
             p -> p != '' AND NOT list_contains(
               ['utm_source','utm_medium','utm_campaign','utm_term','utm_content',
                'ref','fbclid','gclid'], split_part(p, '=', 1)))) AS ps
    FROM parts))
SELECT canonical_url, count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM canon GROUP BY canonical_url HAVING count(*) >= 2
"""

    # privacy_luhn: identical salt construction and the identical
    # Luhn fold (reverse -> positional doubled-digit table -> mod 10)
    # as a DuckDB list_transform over the digit positions.
    o["privacy_luhn"] = """
WITH u AS (
  SELECT doc_id, source,
         lpad(CAST(doc_id * 37 % 1000000000000000 AS VARCHAR), 15, '0')
         || CAST(doc_id % 10 AS VARCHAR) AS num
  FROM documents),
t AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 4 = 0 THEN 'order ref ' || num || ' thanks'
              WHEN doc_id % 4 = 1 THEN 'card ' || num || ' on file'
              WHEN doc_id % 4 = 2 THEN 'ids 1234567890123456 then 4111111111111111 end'
              ELSE 'track 123456789012345678901234 no card' END AS text
  FROM u),
c AS (
  SELECT source,
         list_filter(regexp_extract_all(text, '[0-9]+'),
                     r -> length(r) BETWEEN 13 AND 19) AS runs
  FROM t),
v AS (
  SELECT source,
         CASE WHEN len(runs) > 0 THEN 1 ELSE 0 END AS has_cand,
         CASE WHEN len(list_filter(runs, cand -> (list_sum(list_transform(range(1, length(cand) + 1), i -> CASE WHEN i % 2 = 0 THEN CASE WHEN (ascii(substring(reverse(cand), i, 1)) - 48) * 2 > 9 THEN (ascii(substring(reverse(cand), i, 1)) - 48) * 2 - 9 ELSE (ascii(substring(reverse(cand), i, 1)) - 48) * 2 END ELSE ascii(substring(reverse(cand), i, 1)) - 48 END))) % 10 = 0)) > 0 THEN 1 ELSE 0 END AS valid
  FROM c)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(has_cand) AS BIGINT) AS n_candidates,
       CAST(sum(valid) AS BIGINT) AS n_luhn_valid,
       CAST(sum(has_cand) - sum(valid) AS BIGINT) AS n_luhn_invalid
FROM v GROUP BY source
"""

    # text_script_census: identical salts (literal code points) and
    # LITERAL code-point ranges via len(regexp_extract_all(..)) —
    # the construct RE2 and Java regex read identically.
    o["text_script_census"] = """
WITH s AS (
  SELECT doc_id, source,
         substring(text, 1, 40)
         || CASE WHEN doc_id % 4 = 1 THEN ' ' || repeat('пример ', 10)
                 WHEN doc_id % 4 = 2 THEN ' ' || repeat('λόγος ', 10)
                 WHEN doc_id % 4 = 3 THEN ' ' || repeat('中文字 ', 15)
                 ELSE '' END AS text
  FROM documents),
c AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
         CAST(len(regexp_extract_all(text, '[Ѐ-ӿ]')) AS BIGINT) AS n_cyrillic,
         CAST(len(regexp_extract_all(text, '[Ͱ-Ͽ]')) AS BIGINT) AS n_greek,
         CAST(len(regexp_extract_all(text, '[一-鿿]')) AS BIGINT) AS n_cjk,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
  FROM s),
d AS (
  SELECT *,
         CASE WHEN n_latin IS NULL OR n_latin + n_cyrillic + n_greek + n_cjk = 0 THEN 'none'
              WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND n_latin >= n_cjk THEN 'latin'
              WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_cjk THEN 'cyrillic'
              WHEN n_greek >= n_cjk THEN 'greek'
              ELSE 'cjk' END AS dominant_script
  FROM c)
SELECT source, dominant_script,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_latin) AS BIGINT) AS n_latin,
       CAST(sum(n_cyrillic) AS BIGINT) AS n_cyrillic,
       CAST(sum(n_greek) AS BIGINT) AS n_greek,
       CAST(sum(n_cjk) AS BIGINT) AS n_cjk,
       CAST(sum(n_digit) AS BIGINT) AS n_digit
FROM d GROUP BY source, dominant_script
"""

    # url_psl_census: HAND-DERIVED PSL-algorithm ground truth per host
    # shape (rules: com, co.uk, *.ck, !www.ck, uk). Derivations:
    #  shop.example.co.uk: longest public suffix co.uk -> example.co.uk
    #  a.b.example.com:    suffix com                 -> example.com
    #  foo.bar.ck:         wildcard *.ck makes bar.ck public -> foo.bar.ck
    #  www.ck:             exception !www.ck IS registrable  -> www.ck
    #  sub.www.ck:         public suffix www.ck? exception names are NOT
    #                      public suffixes; *.ck matches www.ck but the
    #                      exception overrides -> registrable www.ck
    #  nomatch.zz:         default rule (TLD public)  -> nomatch.zz
    o["url_psl_census"] = """
WITH m AS (
  SELECT doc_id,
         (['shop.example.co.uk', 'a.b.example.com', 'foo.bar.ck',
           'www.ck', 'sub.www.ck', 'nomatch.zz'])[CAST(doc_id % 6 AS INT) + 1] AS host
  FROM documents),
r AS (
  SELECT doc_id, host,
         CASE host
           WHEN 'shop.example.co.uk' THEN 'example.co.uk'
           WHEN 'a.b.example.com'    THEN 'example.com'
           WHEN 'foo.bar.ck'         THEN 'foo.bar.ck'
           WHEN 'www.ck'             THEN 'www.ck'
           WHEN 'sub.www.ck'         THEN 'www.ck'
           ELSE 'nomatch.zz' END AS registrable_domain
  FROM m)
SELECT registrable_domain,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM r GROUP BY registrable_domain
"""
    return o
