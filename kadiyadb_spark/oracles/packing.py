"""DuckDB oracle SQL for the driver correctness gate — sequence packing, sharding, sampling and mixture weighting.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    _BPE_MERGES,
    _TOKENS,
    _bpe_oracle_ctes,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # Tolerance oracle (approx_distinct pattern): exact values + a flag the
    # sketch estimate must satisfy; the oracle asserts the flag TRUE.
    # Recursive replay of next-fit decreasing: rn orders each shard's docs
    # (tokens DESC, id ASC); the recursion threads (bin_idx, used) through
    # rn+1 joins — linear per shard, parallel across shards.
    o["pack_nosplit"] = f"""
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id % 8 AS shard, CAST(len({_TOKENS}) AS BIGINT) AS n_tok
  FROM documents
),
f AS (
  SELECT doc_id, shard, n_tok,
         CAST(row_number() OVER (PARTITION BY shard ORDER BY n_tok DESC, doc_id ASC) AS BIGINT) AS rn
  FROM t WHERE n_tok > 0 AND n_tok <= 512
),
r AS (
  SELECT shard, rn, doc_id, n_tok, CAST(0 AS BIGINT) AS bin_idx, n_tok AS used
  FROM f WHERE rn = 1
  UNION ALL
  SELECT f.shard, f.rn, f.doc_id, f.n_tok,
         CASE WHEN r.used + f.n_tok <= 512 THEN r.bin_idx ELSE r.bin_idx + 1 END,
         CASE WHEN r.used + f.n_tok <= 512 THEN r.used + f.n_tok ELSE f.n_tok END
  FROM r JOIN f ON f.shard = r.shard AND f.rn = r.rn + 1
)
SELECT CAST(shard AS BIGINT) AS shard, bin_idx,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(512 - sum(n_tok) AS BIGINT) AS padding
FROM r GROUP BY shard, bin_idx
"""

    # Concat-and-chunk packing: shard-partitioned cumsum offsets, chunk ids
    # by integer division, per-chunk token accounting via interval overlap —
    # the WHERE filters zero-token docs BEFORE the window, like the Spark
    # side (functions/packing.py).
    o["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len({_TOKENS}) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS end_off
  FROM t WHERE n_tok > 0
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

    # Split boundaries partition [0, 10000) in SORTED split-name order
    # (test < 500, train < 9500, val = rest) — sampling.split_assign.
    o["dataset_split"] = """
WITH b AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
  FROM documents)
SELECT CASE WHEN bucket < 500 THEN 'test'
            WHEN bucket < 9500 THEN 'train'
            ELSE 'val' END AS split,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1
"""

    # Hash-rank quota sample: same 60-bit key family as corpus_shuffle,
    # salt 'spg' (sampling.sample_per_group).
    o["sample_per_source"] = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(('0x' || substr(md5('spg' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    doc_id
         ) AS rn
  FROM documents)
SELECT doc_id, source FROM r WHERE rn <= 5
"""

    # Same 60-bit md5 key arithmetic as sampling.shuffle_key_expr (15 hex
    # chars: 16 would overflow signed int64).
    o["corpus_shuffle"] = """
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
  FROM documents
)
SELECT doc_id, CAST(skey % 8 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY skey % 8 ORDER BY skey, doc_id) AS BIGINT) AS pos
FROM k
"""

    o["shard_writer"] = """
WITH k AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS skey
  FROM documents
)
SELECT CAST(skey % 8 AS BIGINT) AS shard, count(*) AS n_rows
FROM k GROUP BY 1
"""

    o["mixture_sample"] = """
WITH b AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('kdb' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000 AS bucket
  FROM documents)
SELECT source, count(*) AS n_kept, min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b
WHERE bucket < CASE source WHEN 'src0' THEN 10000 WHEN 'src1' THEN 5000
                           WHEN 'src2' THEN 2500 ELSE 0 END
GROUP BY source
"""

    o["sample_token_budget"] = r"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x != '')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents),
c AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM t)
SELECT source, doc_id, n_tokens FROM c WHERE before < 800
"""

    # pack_ids mirror: the encode construction (doc_id < 100), then doc
    # lengths -> per-shard offsets -> integer chunk math, full chunks only
    o["pack_ids"] = f"""
{_bpe_oracle_ctes(_BPE_MERGES)},
vocab AS (
  SELECT CAST(row_number() OVER (ORDER BY token) - 1 AS BIGINT) AS token_id, token
  FROM (SELECT DISTINCT unnest(syms) AS token FROM w{_BPE_MERGES})
),
wt AS (
  SELECT word, pr.p AS tpos, pr.t AS token
  FROM (SELECT word,
               unnest(list_transform(range(1, len(syms) + 1),
                      i -> {{'p': i, 't': syms[CAST(i AS INT)]}})) AS pr
        FROM w{_BPE_MERGES})
),
occ AS (
  SELECT doc_id, pr.p AS wpos, pr.w AS word
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(wa) + 1),
                      i -> {{'p': i, 'w': wa[CAST(i AS INT)]}})) AS pr
        FROM (SELECT doc_id,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x != '') AS wa
              FROM documents WHERE doc_id < 100))
),
enc AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, tpos) - 1
              AS BIGINT) AS pos,
         token_id
  FROM occ JOIN wt USING (word) JOIN vocab USING (token)
),
lens AS (
  SELECT doc_id, CAST(doc_id % 4 AS BIGINT) AS shard,
         CAST(max(pos) + 1 AS BIGINT) AS n
  FROM enc GROUP BY doc_id
),
offs AS (
  SELECT doc_id, shard, n,
         sum(n) OVER (PARTITION BY shard ORDER BY doc_id) AS end_off
  FROM lens
),
tot AS (SELECT shard, max(end_off) AS shard_total FROM offs GROUP BY shard),
placed AS (
  SELECT o.shard, e.doc_id, e.token_id,
         (o.end_off - o.n + e.pos) AS g, t.shard_total
  FROM enc e JOIN offs o USING (doc_id) JOIN tot t ON o.shard = t.shard
)
SELECT shard, CAST(g // 128 AS BIGINT) AS chunk_id,
       CAST(g % 128 AS BIGINT) AS pos_in_chunk, doc_id, token_id
FROM placed WHERE (g // 128 + 1) * 128 <= shard_total
"""

    o["mixture_temperature"] = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs, sum(len({_TOKENS})) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total FROM per),
wp AS (SELECT per.*, CASE WHEN total > 0 THEN n_tokens / total ELSE 0.0 END AS p
       FROM per, tot),
ws AS (SELECT sum(pow(p, 0.5)) AS wsum FROM wp)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       floor(p * 10000 + 0.5) / 10000 AS p,
       floor((pow(p, 0.5) / wsum) * 10000 + 0.5) / 10000 AS weight,
       CASE WHEN p > 0
            THEN floor(((pow(p, 0.5) / wsum) / p) * 10000 + 0.5) / 10000 END AS boost
FROM wp, ws
"""
    # weighted sampling: the exponential-key selection replayed verbatim —
    # u is an exact dyadic (52 md5 bits + 0.5), so both engines compute the
    # same IEEE keys; output columns carry no floats (ids + long weights)
    o["sample_weighted"] = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
              + 0.5::DOUBLE) / 4503599627370496.0)
           / CAST(n_chars AS DOUBLE) AS key
  FROM documents WHERE n_chars > 0 AND doc_id IS NOT NULL
)
SELECT doc_id, n_chars FROM keyed ORDER BY key, doc_id LIMIT 40
"""

    return o
