"""Shared fixture constants and SQL fragments for the oracle corpus.

Every driver-gate oracle module under kadiyadb_spark/oracles/ builds its
DuckDB SQL from these; __spark_entry__.py imports the same constants so the
Spark queries and their oracles can never drift apart. Moved verbatim out
of __spark_entry__.py (r09, VERDICT r08 item 6).
"""

from __future__ import annotations

from kadiyadb_spark.functions import dedup as D
from kadiyadb_spark.functions import text as TX

SEC = 1_000_000_000
RES = 60 * SEC  # 1 minute slots
DUR = 3600 * SEC  # 1 hour epochs
T0 = 1_704_067_200 * SEC  # 2024-01-01T00:00:00Z
T_END = T0 + 31 * 24 * 3600 * SEC
WEEK0 = T0 + 4 * 24 * 3600 * SEC  # 2024-01-05
WEEK1 = WEEK0 + 7 * 24 * 3600 * SEC

_RFM_NOW = 1706745600 * SEC  # 2024-02-01T00:00Z, just past the fixture range

_BPE_MERGES = 8


def _bpe_oracle_ctes(k: int) -> str:
    """The k-stage DuckDB replay of train_bpe: w0 = word/freq/symbol table,
    then per merge i: pair counts p{i} -> argmax b{i} (count desc, lex asc)
    -> folded word table w{i} (list_reduce, non-overlapping left-to-right,
    same as the Spark aggregate())."""
    parts = [r"""
w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         list_concat(list_transform(range(1, length(word) + 1),
                                    i -> substr(word, CAST(i AS INT), 1)),
                     ['</w>']) AS syms
  FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x != '')) AS word
        FROM documents)
  GROUP BY word
)"""]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f"""
p{i} AS (
  SELECT pr.l AS l, pr.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq,
               unnest(list_transform(range(1, len(syms)),
                      j -> {{'l': syms[CAST(j AS INT)],
                             'r': syms[CAST(j AS INT) + 1]}})) AS pr
        FROM w{p})
  GROUP BY pr.l, pr.r
),
b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
w{i} AS (
  SELECT word, freq,
         list_reduce(list_transform(w{p}.syms, x -> [x]),
           (acc, s) -> CASE WHEN len(acc) > 0 AND acc[-1] = b{i}.l AND s[1] = b{i}.r
                       THEN list_append(acc[1:-2], b{i}.l || b{i}.r)
                       ELSE list_concat(acc, s) END) AS syms
  FROM w{p} CROSS JOIN b{i}
)""")
    return "WITH " + ",".join(parts)





# --------------------------------------------------------------------------
# DuckDB oracles. Shared SQL fragments keep the two sides in lockstep.
# --------------------------------------------------------------------------

_EV_CUBE = f"""
  ev AS (
    SELECT (epoch_ns(ts) // {RES}) * {RES} AS bucket,
           event_type AS f1, CAST(user_id AS VARCHAR) AS f2, value
    FROM events
  ),
  cube2 AS (
    SELECT (bucket // {DUR}) * {DUR} AS epoch, bucket, f1, f2,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3, 4
  ),
  cube1 AS (
    SELECT (bucket // {DUR}) * {DUR} AS epoch, bucket, f1,
           (CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) / 10000.0) AS total, CAST(count(*) AS DOUBLE) AS cnt
    FROM ev GROUP BY 1, 2, 3
  )
"""


def _fetch_oracle(pattern_f1, f2: str | None, from_ns: int, to_ns: int, depth: int) -> str:
    """Dense zero-filled fetch oracle with per-epoch series membership.
    f2=None -> depth-1 prefix; f2='*' -> wildcard; else exact. pattern_f1
    may be a LIST of values (the IN matcher) or {"re": pattern} (the
    anchored Re matcher — regexp_full_match twins Spark's ^(?:…)$ rlike)."""
    e_from = (from_ns // DUR) * DUR
    e_to = ((to_ns - RES) // DUR) * DUR
    if isinstance(pattern_f1, dict):
        f1_cond = f"regexp_full_match(f1, '{pattern_f1['re']}')"
    elif isinstance(pattern_f1, (list, tuple)):
        f1_cond = "f1 IN (" + ", ".join(f"'{v}'" for v in pattern_f1) + ")"
    else:
        f1_cond = f"f1 = '{pattern_f1}'"
    if depth == 1:
        src = f"SELECT epoch, bucket, f1, total, cnt FROM cube1 WHERE {f1_cond}"
        keycols = "f1"
        joink = "c.f1 = m.f1"
    else:
        cond = f1_cond + ("" if f2 == "*" else f" AND f2 = '{f2}'")
        src = f"SELECT epoch, bucket, f1, f2, total, cnt FROM cube2 WHERE {cond}"
        keycols = "f1, f2"
        joink = "c.f1 = m.f1 AND c.f2 = m.f2"
    return f"""
WITH {_EV_CUBE},
src AS ({src}),
members AS (
  SELECT DISTINCT epoch, {keycols} FROM src
  WHERE epoch >= {e_from} AND epoch <= {e_to}
),
axis AS (
  SELECT b AS bucket, (b // {DUR}) * {DUR} AS epoch
  FROM (SELECT unnest(range({from_ns}, {to_ns}, {RES})) AS b)
),
dense AS (
  SELECT m.epoch, {', '.join('m.' + k for k in keycols.split(', '))}, a.bucket,
         coalesce(c.total, 0.0) AS total, coalesce(c.cnt, 0.0) AS cnt
  FROM members m
  JOIN axis a ON a.epoch = m.epoch
  LEFT JOIN src c ON {joink} AND c.bucket = a.bucket
)
SELECT epoch, {keycols}, bucket, floor((total) * 10000 + 0.5) / 10000 AS total, cnt FROM dense
"""


_SHINGLES8 = (
    "list_distinct([substr(norm, i, 8) for i in range(1, greatest(len(norm) - 7, 1) + 1)])"
)

# explicit whitespace class (RE2 \s lacks \x0B; \v == \x0B) — twins
# functions/text.py WS_CLASS
_WS = "[ \\t\\n\\v\\f\\r]"
_DOC_NORM = f"trim(regexp_replace(lower(text), '{_WS}+', ' ', 'g'))"

_TOKENS = f"list_filter(regexp_split_to_array(lower(text), '{_WS}+'), t -> t != '')"

# Same universal-hash family as dedup.minhash_signature: one md5 base hash
# per shingle, h_i = (A[i]*base + B[i]) % P in exact int64 arithmetic.
_MINHASH_SIG = ", ".join(
    f"list_min([({D.MINHASH_A[i]} * h + {D.MINHASH_B[i]}) % {D.MINHASH_P} for h in hs]) AS m{i}"
    for i in range(8)
)

_LANG_SCORES = {
    lang: f"len(list_intersect(toks, {words!r}))".replace("'", "'")
    for lang, words in TX.LANG_MARKERS.items()
}


def _lang_case() -> str:
    cases = " ".join(
        f"WHEN score_{c} = mx THEN '{c}'" for c in TX.LANG_PRIORITY
    )
    return f"CASE WHEN mx <= 0 THEN 'und' {cases} END"

