"""DuckDB oracle SQL for the driver correctness gate — BPE training / tokenization replays.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations

from kadiyadb_spark.oracles.fragments import (
    _BPE_MERGES,
    _bpe_oracle_ctes,
)


def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # Byte-centered fake PCM: sample = ord(char) - 128 (fixtures are ASCII,
    # so char position == byte position); full 64-wide windows at stride 32.
    _bpe_union = "\nUNION ALL\n".join(
        f'SELECT CAST({i - 1} AS BIGINT) AS rank, l AS "left", r AS "right", cnt AS freq FROM b{i}'
        for i in range(1, _BPE_MERGES + 1)
    )

    o["bpe_train"] = f"""
{_bpe_oracle_ctes(_BPE_MERGES)}
SELECT * FROM ({_bpe_union})
"""

    o["bpe_tokenize"] = f"""
{_bpe_oracle_ctes(_BPE_MERGES)},
tok AS (SELECT word, CAST(len(syms) AS BIGINT) AS n_tok FROM w{_BPE_MERGES}),
occ AS (SELECT source,
               unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x != '')) AS word
        FROM documents),
counts AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(n_tok) AS BIGINT) AS nt
  FROM occ JOIN tok USING (word)
  GROUP BY source)
SELECT b.source AS source,
       coalesce(nw, 0) AS n_words,
       coalesce(nt, 0) AS n_tokens
FROM (SELECT DISTINCT source FROM documents) b
LEFT JOIN counts c ON b.source IS NOT DISTINCT FROM c.source
"""

    # encode_ids mirror: corpus-wide vocab (distinct tokens of the fully
    # merged word table, ids by lexicographic row_number), per-word token
    # positions, doc positions by the unique (wpos, tpos) composite
    o["bpe_encode_ids"] = f"""
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
              FROM documents WHERE doc_id < 50))
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY wpos, tpos) - 1
            AS BIGINT) AS pos,
       token,
       token_id
FROM occ JOIN wt USING (word) JOIN vocab USING (token)
"""

    # INDEPENDENT oracle — no merge replay: decode(encode(x)) must equal
    # whitespace-normalized x (the round-trip theorem), so the twin is
    # plain normalization of the source text. Any defect anywhere in the
    # train -> encode -> decode machine breaks the hash.
    o["bpe_decode_roundtrip"] = r"""
SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
FROM documents WHERE doc_id < 50 AND trim(text) != ''
"""

    # Same marker construction as bpe.gpt2_pretokens_expr: \x01 inserted
    # before the last space of every whitespace->nonspace boundary, then a
    # lookahead-free extract whose classes exclude the marker.
    o["bpe_gpt2_pretok"] = r"""
SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
FROM (
  SELECT unnest(regexp_extract_all(
    regexp_replace(text, '(\s)(\S)', chr(1) || '\1\2', 'g'),
    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}\x01]+|\s+')) AS t
  FROM documents)
WHERE t != ''
GROUP BY t
"""
    return o
