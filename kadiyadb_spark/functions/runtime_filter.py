"""Runtime Bloom-filter join pruning — the explicit semi-join reduction.

The 100 TB join problem this solves: a selective dimension filter (say
0.3% of ``orders``) joined against a huge fact table (``lineitem``) still
SHUFFLES the entire fact side before the join discards 99.7% of it. Spark's
own runtime filters (DPP / InjectRuntimeFilter) fire only for favorable
shapes; this module is the same idea as an explicit, composable operator:

  1. ``bloom_build``   — fold the filtered build-side keys into an m-bit
     Bloom bitset, represented as ONE row holding ``array<long>`` words.
     Pure JVM fold: each key fans out to ``n_hashes`` bit positions
     map-side, one ``bit_or`` groupBy combines them (at most ``m_bits/64``
     counter rows leave any partition — the shuffle is bitset-sized, never
     key-count-sized), and a map densifies to the word array. No driver
     collect anywhere.
  2. ``bloom_probe``   — broadcast the one-row bitset and keep only fact
     rows whose ``n_hashes`` probe bits are all set. Map-side, before any
     shuffle: the join that follows shuffles only surviving rows.

Correctness contract: a Bloom filter has NO false negatives — every true
join partner survives the probe — so ``probe ⋈ build == fact ⋈ build``
exactly; false positives (rate ~(1-e^{-kn/m})^k) cost only wasted shuffle
rows and are removed by the real join. Both sides of the equality are
gated (entry ``bloom_join_prune`` vs a plain-join SQL oracle).

Determinism: positions come from the cross-engine 60-bit md5 device
(``conv(substr(md5(key || ':' || i), 1, 15), 16, 10) % m_bits``), so the
bitset — and therefore the surviving row set — is a pure function of the
build keys, reproducible bit-for-bit in any engine or partition layout.

Reference parity note: kadiyadb has no join engine at all (fetch is a
single-table scan, index/index.go:26-126); this operator belongs to the
north-star analytics surface, not the ported core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(key_col: str, m_bits: int, n_hashes: int) -> list:
    """The n_hashes deterministic bit positions of one key (long columns).

    60 md5 hex digits -> conv base16 is exact below 2^60 (the established
    cross-engine hash device: never touches the sign bit, identical in
    DuckDB via ('0x' || substr(md5(..),1,15))::BIGINT)."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col(key_col).cast("string"), F.lit(f":{i}")
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m_bits),
        )
        for i in range(n_hashes)
    ]


def _validate(m_bits: int, n_hashes: int) -> None:
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    if not (1 <= n_hashes <= 16):
        raise ValueError(f"n_hashes must be in [1, 16], got {n_hashes}")


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Fold ``keys[key_col]`` into a one-row Bloom bitset DataFrame with a
    single ``bloom_words`` column (``array<long>``, ``m_bits/64`` words).

    Shape: explode to n_hashes positions map-side, ONE bit_or groupBy
    (partial aggregation bounds any partition's output at m_bits/64 rows
    regardless of key count), then map_from_entries + transform densify —
    all JVM expressions, no collect. An empty build side yields the all-
    zero bitset (probe keeps nothing), the correct degenerate semantics.
    Size m_bits to the expected distinct-key count: FP rate
    ~(1 - e^{-kn/m})^k, e.g. n=10^6 keys in m=2^23 bits at k=5 -> ~2%.
    """
    _validate(m_bits, n_hashes)
    n_words = m_bits // 64
    pos = keys.select(
        F.explode(F.array(*_positions(key_col, m_bits, n_hashes))).alias("_pos")
    )
    words = (
        pos.select(
            F.expr("_pos div 64").alias("_w"),
            F.expr("cast(_pos % 64 as int)").alias("_b"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(shiftleft(1L, _b))").alias("_word"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("_w", "_word"))).alias("_m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
                lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0).cast("long")),
            ).alias("bloom_words")
        )
    )
    return words


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 17,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep only rows of ``df`` whose key MAY be in the Bloom set (all
    ``n_hashes`` probe bits set). ``m_bits``/``n_hashes`` must match the
    build call. The one-row bitset broadcasts (a BroadcastNestedLoopJoin
    over exactly one row — m_bits/8 bytes per executor, no shuffle), and
    the filter is evaluated map-side so everything downstream — the real
    join, its Exchange — sees only surviving rows. Null keys never match
    (a Bloom set cannot contain SQL NULL)."""
    _validate(m_bits, n_hashes)
    probed = df.crossJoin(F.broadcast(bloom))
    checks = None
    for p in _positions(key_col, m_bits, n_hashes):
        word = F.element_at(
            F.col("bloom_words"), F.floor(p / F.lit(64)).cast("int") + F.lit(1)
        )
        hit = F.getbit(word, p % F.lit(64)) == 1
        checks = hit if checks is None else (checks & hit)
    return probed.filter(checks).drop("bloom_words")
