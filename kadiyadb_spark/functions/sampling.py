"""Deterministic sampling operators for corpus mixture construction.

Training-data pipelines sample each source at a configured rate to hit a
target mixture (and to downsample over-represented crawls). Random sampling
is not reproducible across runs/engines, so the standard trick is HASH
sampling: a row is kept iff a stable hash of its id lands under the
stratum's rate. Properties that matter at 100 TB:

- map-only: the keep-decision is a per-row expression — no shuffle, no
  state, embarrassingly parallel, and it composes under predicate pushdown;
- reproducible: the same (salt, id) always samples the same way, across
  engines (the md5 arithmetic has a 1:1 DuckDB twin, oracle-gated);
- nested: rate 0.1 keeps a subset of rate 0.2's sample (buckets are a fixed
  permutation), so growing a mixture never resamples disjoint data.

Reference parity note: kadiyadb has no sampling surface (SURVEY §2); this is
north-star LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000  # rate resolution 0.01%


def md5_prefix_long(c: Column, salt: str, n_hex: int) -> Column:
    """First ``n_hex`` hex chars of md5(salt||value) as a long — THE salted
    hash-addressing device behind bucket / shuffle / weighted-sample keys.
    One definition (review finding: three hand-rolled near-copies had to
    stay bit-identical for the DuckDB twins' established
    `CAST(('0x' || substr(md5(..),1,n)) AS BIGINT)` form to hold)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), c.cast("string")).cast("binary")), 1, n_hex
        ),
        16,
        10,
    ).cast("long")


def sample_bucket_expr(id_col: Column | str, salt: str = "kdb") -> Column:
    """Stable bucket in [0, BUCKETS): first 32 md5 bits of salt||id, mod
    BUCKETS."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_prefix_long(c, salt, 8) % F.lit(BUCKETS)


def shuffle_key_expr(id_col: Column | str, salt: str = "shuf") -> Column:
    """Stable 60-bit shuffle key: first 15 hex chars of md5(salt||id) (15,
    not 16 — 16 hex digits can overflow SIGNED int64; 60 bits keep the key
    positive on both engines)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5_prefix_long(c, salt, 15)


def deterministic_shuffle(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuf",
) -> DataFrame:
    """Reproducible global corpus shuffle: every row gets a (shard, pos)
    address that is a pseudo-random but DETERMINISTIC permutation of the
    corpus — the training-order randomization step of a data pipeline,
    reproducible across runs and engines (no rand(), no seed plumbing).

    Shape at 100 TB: shard = hash-key mod num_shards (map-only, uniform by
    construction), pos = row_number over the key WITHIN each shard — one
    shuffle, parallel across shards, no global sort. Downstream training
    reads shards in any order and rows by pos; to materialize the layout,
    ``repartition(num_shards, "shard").sortWithinPartitions("pos")`` and
    write. Changing ``salt`` yields an independent permutation (new epoch
    ordering) without touching the data.
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    from pyspark.sql import Window

    key = shuffle_key_expr(id_col, salt)
    d = df.withColumn("_skey", key).withColumn(
        "shard", F.pmod(F.col("_skey"), F.lit(num_shards)).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return d.withColumn("pos", F.row_number().over(w).cast("long")).drop("_skey")


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test/...) by hash
    bucket: split boundaries partition [0, BUCKETS) in sorted-name order,
    so the assignment is a map-only expression — deterministic across runs
    and engines, stable under corpus growth (a doc's split never changes
    when other docs arrive), and disjoint+exhaustive by construction.
    Fractions must sum to 1 (±1 bucket of rounding is absorbed by the last
    split's upper bound).

    This is how a 100 TB corpus is split: no sort, no sampling pass, no
    state — the split IS a pure function of the id.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for split {name!r} must be in [0, 1], got {frac}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.when(
        F.col(id_col).isNull(),
        F.raise_error(
            F.lit(
                "split_assign: NULL id has no stable split address — the "
                "split would silently be NULL and the row lost from every "
                "split (disjoint+exhaustive contract)"
            )
        ).cast("long"),
    ).otherwise(sample_bucket_expr(id_col, salt))
    expr = None
    hi = 0
    names = sorted(fractions)
    for i, name in enumerate(names):
        hi = BUCKETS if i == len(names) - 1 else hi + int(round(fractions[name] * BUCKETS))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def sample_per_group(
    df: DataFrame,
    k: int,
    group_col: str,
    id_col: str = "doc_id",
    salt: str = "spg",
) -> DataFrame:
    """Deterministic uniform-ish sample of ``k`` rows per group: rank rows
    within each group by a stable hash of their id and keep the first
    ``k``. The reproducible form of per-group reservoir sampling — same
    rows every run, exact per-group quota (unlike rate sampling), and
    growing a group only ever swaps members in/out by hash order.

    Scale: one shuffle (window by group). Skew note: a single monster
    group funnels through one task; for quota sampling of pathological
    groups pre-filter with ``stratified_hash_sample`` at a few times the
    target rate, then quota-cut the survivors.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    key = shuffle_key_expr(id_col, salt)
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        # NULL ids hash to a NULL key, and ascending sort is NULLS FIRST —
        # they would unconditionally occupy the k slots (review finding);
        # an id-addressed sample cannot address them: excluded, documented
        df.filter(F.col(id_col).isNotNull())
        .withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "kdb",
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its id-bucket < rates[s] * BUCKETS.
    Strata absent from ``rates`` are dropped (rate 0). Expected kept fraction
    per stratum is the configured rate (exact in distribution over ids, not
    per-stratum quota — quota sampling needs a sort; this needs nothing)."""
    if not rates:
        raise ValueError(
            "stratified_hash_sample: empty rates would silently drop every "
            "row (strata absent from rates sample at 0)"
        )
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    bucket = sample_bucket_expr(id_col, salt)
    threshold: Column | None = None
    for s, r in sorted(rates.items()):
        cond, val = F.col(strata_col) == s, F.lit(int(round(r * BUCKETS)))
        threshold = F.when(cond, val) if threshold is None else threshold.when(cond, val)
    threshold = F.lit(0) if threshold is None else threshold.otherwise(F.lit(0))
    return df.filter(bucket < threshold)


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights: w_i ∝ p_i^alpha where p_i is
    source i's share of corpus tokens — the standard multilingual/multi-
    source rebalancing rule (alpha=1 keeps natural proportions, alpha→0
    approaches uniform; mT5/XLM-R train at alpha≈0.3, public literature).
    Returns per source: n_docs, n_tokens, the natural share ``p``, the
    temperature weight ``weight``, and ``boost`` = weight/p (the up/down-
    sampling factor a sampler like stratified_hash_sample should apply).

    Scale shape: ONE corpus-sized aggregation (token counts are computed
    map-side inside the partial agg — the text column never shuffles, only
    per-source partial sums), then two 1-row/handful-of-rows aggregates
    cross-joined back via broadcast. Output is sources-count rows."""
    from kadiyadb_spark.functions.text import tokens_expr

    per = docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens_expr(F.col(text_col)))).cast("long").alias("n_tokens"),
    )
    total = per.agg(F.sum("n_tokens").cast("double").alias("_total"))
    # zero-token sources (and an all-empty corpus) must not DIVIDE_BY_ZERO
    # under ANSI (review finding, confirmed live): p = 0 for them, and the
    # boost below is NULL where p = 0 (no meaningful up/down factor)
    with_p = per.crossJoin(F.broadcast(total)).withColumn(
        "_p",
        F.when(F.col("_total") > 0, F.col("n_tokens") / F.col("_total")).otherwise(
            F.lit(0.0)
        ),
    )
    wsum = with_p.agg(F.sum(F.pow(F.col("_p"), F.lit(alpha))).alias("_wsum"))
    from kadiyadb_spark.functions.num import round4_expr

    return (
        with_p.crossJoin(F.broadcast(wsum))
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            round4_expr(F.col("_p")).alias("p"),
            round4_expr(F.pow(F.col("_p"), F.lit(alpha)) / F.col("_wsum")).alias("weight"),
            round4_expr(
                F.when(
                    F.col("_p") > 0,
                    (F.pow(F.col("_p"), F.lit(alpha)) / F.col("_wsum")) / F.col("_p"),
                )
            ).alias("boost"),
        )
    )


def sample_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-group TOKEN-budget sampling — mixture quotas the
    way a trainer actually budgets them (tokens, not rows; the C4/Pile
    recipe step "take N tokens of source X"). Docs are ordered inside each
    group by (md5(salt||id) HEX-STRING order, id) — reproducible, and
    ``salt`` yields independent re-draws like every other sampler (note:
    this is hex-string order, not shuffle_key_expr's numeric 60-bit key;
    the DuckDB twin replays the hex form) — and a doc is kept while the running token total of
    everything BEFORE it is under the budget; the first doc to cross keeps
    the budget reachable for every nonempty group (budget overshoot is at
    most one document, deterministic). Re-running on a grown corpus keeps
    the previously-sampled prefix stable except where new docs hash into
    it — same stability contract as stratified_hash_sample.

    ``token_count_col`` uses a precomputed per-doc count; default counts
    whitespace tokens map-side (text never shuffles: only id/group/count
    enter the window). ONE shuffle: the per-group window ordering.
    """
    if budget_tokens < 1:
        raise ValueError(f"need budget_tokens >= 1, got {budget_tokens}")
    from pyspark.sql import Window

    from kadiyadb_spark.functions.text import tokens_expr

    # NULL token counts (null text / null count col) coalesce to 0 so such
    # docs behave exactly like empty docs — kept while under budget,
    # consuming nothing — instead of passing the window predicate forever
    # while summing as nothing (unbounded overshoot, review finding)
    n_tok = F.coalesce(
        (
            F.col(token_count_col)
            if token_count_col
            else F.size(tokens_expr(F.col(text_col)))
        ).cast("long"),
        F.lit(0),
    )
    slim = docs.select(
        group_col,
        F.col(id_col),
        n_tok.alias("_n_tok"),
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))).alias("_h"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("_n_tok").over(w), F.lit(0))
    return (
        slim.withColumn("_before", before)
        .where(F.col("_before") < F.lit(int(budget_tokens)))
        .select(group_col, id_col, F.col("_n_tok").alias("n_tokens"))
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws a stable uniform u from md5(salt||id)
    and the k smallest exponential keys ``-ln(u)/w`` win — exactly the
    distribution of sequentially drawing k rows with probability
    proportional to ``weight_col``, but as ONE stateless expression. The
    pipeline use: "keep 1M documents sampled by quality score" with a
    result that is reproducible across runs AND engines (u is the first
    52 md5 bits + 0.5, an exact dyadic, so both engines compute the same
    IEEE key; the DuckDB twin is one ln()).

    Scale shape: the keep-decision is map-only; the global smallest-k is
    ``ORDER BY key LIMIT k`` which Spark plans as TakeOrderedAndProject —
    k rows per partition, k at the driver, NO global sort of the corpus.
    Non-positive weights are excluded (they have zero selection
    probability by definition).

    Returns the sampled rows (id_col, weight_col)."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    h = md5_prefix_long(F.col(id_col), salt, 13)
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        # null ids have no stable draw (NULL key sorts FIRST and would
        # unconditionally occupy the sample — review finding, confirmed
        # live); the id tiebreak makes key ties at the k boundary
        # layout-proof like every other sampler here
        df.filter(F.col(weight_col) > 0)
        .filter(F.col(id_col).isNotNull())
        .select(id_col, weight_col, key.alias("_key"))
        .orderBy("_key", id_col)
        .limit(k)
        .drop("_key")
    )
