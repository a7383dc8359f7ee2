"""Mergeable-sketch rollups: pre-aggregated DISTINCT counts.

The cube's (total, cnt) Point works because sum/count are decomposable —
partials fold exactly (SURVEY §1.1). COUNT(DISTINCT) is not: the reference
has no answer for it, and at 100 TB re-scanning raw events per distinct
query is the single most common analytics cost sink. The standard fix is a
MERGEABLE sketch: store one Apache DataSketches HLL per (bucket, group) at
write time; any rollup (day→month, one group→all groups) is a lossless
union of sketches — the same write-time-rollup philosophy as the cube's
prefix sums, extended to the one aggregate that cannot be pre-summed.

Error model: relative standard error ≈ 1.04 / sqrt(2^lgk) (~1.6% at the
lgk=12 default, ~1 KB per sketch). Sketches are deterministic functions of
the input SET (register maxima — order-independent), so rollup reads are
reproducible; they are NOT bit-portable to other HLL implementations, so
the correctness entry (`hll_distinct_rollup`) gates a TOLERANCE contract
instead: exact counts + a within-3×RSE flag the SQL oracle pins TRUE, and
merge losslessness is pinned by pytest (day→month union estimate equals
the direct whole-range sketch exactly).

All three ops are one Spark aggregation each: partial sketches build
map-side and merge in the reduce — a distinct-count rollup never shuffles
raw keys, only ~KB sketches per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_rollup(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch of ``key_col`` per group — the write-time form a
    deployment persists next to the cube (binary column, ~2^lgk bytes).
    Map-side partial sketches; only sketches reach the shuffle."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias(sketch_col),
        F.count("*").cast("long").alias("n_rows"),
    )


def hll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Union persisted sketches up a hierarchy (day→month, type→all):
    lossless — the merged sketch equals the sketch of the unioned inputs,
    so rollup estimates never degrade with the number of merge levels.
    Precision note: the union downgrades to the MINIMUM lgConfigK of the
    inputs (allowDifferentLgConfigK) — it is set at hll_sketch time, not
    here (an lgk parameter used to sit unused in this signature implying
    otherwise — review finding)."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_sketches"),
    )


def hll_estimate(sketch: Column) -> Column:
    """Distinct-count estimate of a sketch column (long)."""
    return F.hll_sketch_estimate(sketch).cast("long")


def heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    threshold_frac: float,
    k: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (keys with frequency > threshold_frac of all
    rows) via the standard two-pass sketch-pruned design — the frequent-
    items query a 100 TB corpus cannot answer with a raw groupBy when the
    key space is huge (user ids, URLs, shingles) and only the head matters:

    Pass 1 — per-partition Misra-Gries summaries with k counters inside
    Arrow batches: a key whose GLOBAL frequency exceeds n/k must exceed
    n_p/k in at least one partition (pigeonhole), so the union of the
    per-partition summaries is a guaranteed SUPERSET of every true heavy
    hitter — only partitions x k candidate rows ever shuffle, never the
    raw keys.

    Pass 2 — exact recount of the candidate set only (semi join pruned
    before the count shuffle), filtered by the exact global threshold
    ``floor(threshold_frac * n)`` — so the OUTPUT is exact (keys and
    counts), which is what lets a plain GROUP BY / HAVING SQL oracle
    hash-gate it; the sketch only prunes, it never answers.

    ``k`` defaults to ceil(2 / threshold_frac) (the MG bound 1/frac with
    2x headroom for skewed partition sizes); the candidate broadcast is
    bounded by partitions x k rows. For a CROSS-ENGINE-exact threshold use
    a dyadic fraction (1/2^m): exact in binary doubles AND decimals, so
    ``int(threshold_frac * n)`` is the same floor in any engine. Returns
    (key_cols..., cnt, frac), unordered (callers sort)."""
    if not 0.0 < threshold_frac < 1.0:
        raise ValueError(f"threshold_frac must be in (0, 1), got {threshold_frac}")
    if not key_cols:
        raise ValueError("heavy_hitters needs at least one key column")
    import math

    min_k = math.ceil(1.0 / threshold_frac)
    if k is None:
        kk = max(2, math.ceil(2.0 / threshold_frac))
    else:
        kk = int(k)
        if kk < min_k:
            # below 1/frac counters the MG superset guarantee is VOID and
            # true heavy hitters silently vanish from EXACT-labelled
            # output (review finding)
            raise ValueError(
                f"k={kk} < ceil(1/threshold_frac)={min_k}: the Misra-Gries "
                "superset guarantee needs at least 1/frac counters"
            )

    from collections.abc import Iterator

    import pandas as pd

    # Keys cross the Arrow boundary AS STRINGS: a nullable long column
    # arrives in pandas as float64, mangling keys past 2^53 so the semi
    # join matched nothing (review finding — the class ADVICE-r09 fixed
    # for kmv group cols). NULL keys survive the cast as NULL, count as a
    # key like the SQL GROUP BY does, and join back null-safely.
    keyed = df.select(
        *[F.col(c).cast("string").alias(c) for c in key_cols]
    )
    cols = list(key_cols)

    def _mg(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        # one Misra-Gries summary across ALL batches of this partition,
        # plus the partition's ROW COUNT (rides as _rows on a sentinel
        # row, so the exact total needs no third full scan)
        counters: dict[tuple, int] = {}
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            for tup in zip(*(pdf[c] for c in cols)):
                t = tuple(tup)
                if t in counters:
                    counters[t] += 1
                elif len(counters) < kk:
                    counters[t] = 1
                else:
                    dead = [key for key in counters if counters[key] == 1]
                    for key in counters:
                        counters[key] -= 1
                    for key in dead:
                        del counters[key]
        rows = [{**dict(zip(cols, key)), "_rows": 0} for key in counters]
        rows.append({**{c: None for c in cols}, "_rows": n_part})
        yield pd.DataFrame(rows, columns=[*cols, "_rows"])

    out_schema = ", ".join(f"{c} string" for c in cols) + ", _rows long"
    summary = keyed.mapInPandas(_mg, schema=out_schema).localCheckpoint(
        eager=False
    )  # candidates + the total read it once
    n = int(summary.agg(F.sum("_rows")).collect()[0][0] or 0)
    candidates = summary.filter(F.col("_rows") == 0).select(*key_cols).distinct()
    floor_thresh = int(threshold_frac * n)
    cond = None
    for c in key_cols:
        e = df[c].cast("string").eqNullSafe(candidates[c])
        cond = e if cond is None else cond & e
    exact = (
        df.join(F.broadcast(candidates), on=cond, how="left_semi")
        .groupBy(*[df[c] for c in key_cols])
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") > floor_thresh)
    )
    from kadiyadb_spark.functions.num import round4_expr

    return exact.select(
        *key_cols,
        "cnt",
        round4_expr(F.col("cnt") / F.lit(float(n))).alias("frac"),
    )


def value_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bounds: list[float],
) -> DataFrame:
    """Write-time MERGEABLE value histogram: per group, long-format
    (le, cnt) bucket counts over a fixed ``bounds`` ladder plus the +Inf
    tail — the quantile analog of the HLL rollup above. Bucket counts are
    plain sums, so any rollup (day -> month, one group -> all) is a
    LOSSLESS groupBy-sum (``histogram_merge``), and
    ``query.histogram_quantile`` reads the merged rows with Prometheus
    semantics. Error model: quantiles are exact up to the ladder width —
    chosen at write time, never degraded by merging (unlike sampled
    sketches). One aggregation; only (groups x buckets) rows shuffle."""
    if not bounds or sorted(bounds) != list(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"bounds must be strictly increasing and non-empty: {bounds}")
    le = F.lit(float("inf"))
    for b in reversed(bounds):  # innermost WHEN = smallest bound
        le = F.when(F.col(value_col) <= float(b), F.lit(float(b))).otherwise(le)
    # NULL/NaN are NOT observations (review finding: the when-chain's NULL
    # comparison fell through to the +Inf bucket, inflating n_obs and
    # shifting every quantile — exact_quantiles already excludes them)
    return (
        df.filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double")))
        .groupBy(*group_cols, le.alias("le"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_merge(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold histograms up a hierarchy (drop finer group columns, sum bucket
    counts) — LOSSLESS: merged counts equal the histogram computed directly
    at the coarse grain, so quantiles never degrade with merge depth
    (pinned by the histogram_rollup_merge gate)."""
    return df.groupBy(*group_cols, "le").agg(F.sum("cnt").cast("long").alias("cnt"))


def distribution_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    bounds: list[float],
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column over a fixed bucket ladder — the drift monitor a 100 TB
    training pipeline runs between corpus versions ("did document lengths
    / quality scores shift since the last crawl"; PSI > 0.25 is the
    classic retrain trigger). Shares ``value_histogram``'s ladder
    semantics (le-buckets + the +Inf tail).

    Engine-default-free: bucket counts are integers; add-one (Laplace)
    smoothing keeps every operand an exact integer while making zero
    bins well-defined (no epsilon literals to disagree on); each bucket's
    share is ONE long/double division; the PSI term
    ``(p - q) * ln(p / q)`` is one double expression quantized at 4dp;
    the total is an exact scaled-long fold of the quantized terms (the
    bigram-LM device). Scale shape: two histogram aggregations (only
    buckets x 1 rows shuffle), a bucket-axis left join so empty buckets
    participate, and broadcast scalar totals.

    Output: one row per bucket (le, cnt_a, cnt_b, p_a, p_b, psi_term)
    plus the same ``psi_total`` on every row."""
    if not bounds or sorted(bounds) != list(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"bounds must be strictly increasing and non-empty: {bounds}")
    from kadiyadb_spark.functions.num import round4_expr

    k = len(bounds) + 1  # ladder + the +Inf tail
    spark = a.sparkSession
    axis = spark.createDataFrame(
        [(float(x),) for x in [*bounds, float("inf")]], "le double"
    )
    ha = value_histogram(a, value_col, [], bounds).withColumnRenamed("cnt", "cnt_a")
    hb = value_histogram(b, value_col, [], bounds).withColumnRenamed("cnt", "cnt_b")
    j = (
        axis.join(ha, "le", "left")
        .join(hb, "le", "left")
        .select(
            "le",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    totals = j.agg(
        F.sum("cnt_a").alias("_na"), F.sum("cnt_b").alias("_nb")
    )
    p = (F.col("cnt_a") + F.lit(1)).cast("double") / (F.col("_na") + F.lit(k)).cast(
        "double"
    )
    q = (F.col("cnt_b") + F.lit(1)).cast("double") / (F.col("_nb") + F.lit(k)).cast(
        "double"
    )
    terms = j.crossJoin(F.broadcast(totals)).select(
        "le",
        "cnt_a",
        "cnt_b",
        round4_expr(p).alias("p_a"),
        round4_expr(q).alias("p_b"),
        round4_expr((p - q) * F.log(p / q)).alias("psi_term"),
    )
    total = terms.agg(
        round4_expr(
            F.sum(F.round(F.col("psi_term") * 10000).cast("long")) / F.lit(10000.0)
        ).alias("psi_total")
    )
    return terms.crossJoin(F.broadcast(total))


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 128,
    salt: str = "kmv",
    sketch_col: str = "kmv",
) -> DataFrame:
    """K-MINIMUM-VALUES (theta) distinct sketch per group: the k smallest
    DISTINCT 60-bit md5 hashes of ``key_col``. The mergeable distinct
    sketch that — unlike HLL's register maxima — supports INTERSECTION
    estimates, because the bottom-k hashes are a uniform θ-sample of the
    key space under multiset operations (Beyer et al., SIGMOD 2007, "On
    synopses for distinct value estimation under multiset operations";
    the DataSketches "theta sketch" deployment shape).

    Deterministic end to end: the hash is the established cross-engine
    md5 form (sampling.shuffle_key_expr — 60 bits keeps int64 positive in
    both engines), min-k is a pure order statistic, and every estimate
    derived from the sketch is one IEEE division of exact integers — so
    sketches AND estimates are SQL-replayable and value-hash gateable
    with NO tolerance flag (accuracy is pinned separately in pytest
    against exact counts).

    Scale shape (the heavy_hitters two-pass doctrine): pass 1 keeps a
    bounded per-group min-k inside Arrow batches (memory: groups × k
    int64), so only partitions × groups × k candidate hashes ever
    shuffle — never the raw keys; pass 2 merges candidates with built-in
    array ops. The union of per-partition min-k sets is a guaranteed
    SUPERSET of the global min-k (any global bottom-k hash is in its own
    partition's bottom-k — pigeonhole), so the reduction is lossless:
    the result is EXACTLY the sketch a single-node pass would build,
    which is what the SQL oracle replays. Returns group_cols +
    ``sketch_col`` (ascending array<long>, size <= k; size < k means the
    group's EXACT distinct hash set)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not group_cols:
        raise ValueError("kmv_sketch needs at least one group column")

    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from kadiyadb_spark.functions.sampling import shuffle_key_expr

    # null KEYS drop (COUNT(DISTINCT) semantics — and a null md5 would
    # reach the int64 kernel as NaN); null GROUPS are kept as groups
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, shuffle_key_expr(key_col, salt).alias("_h")
    )
    # Group values cross the Arrow boundary as ONE lossless JSON token,
    # never as raw columns: Arrow→pandas turns a nullable long group
    # column into float64 with NaN (mangling values past 2^53 and
    # breaking the cast back to the declared LongType on output —
    # ADVICE r09). The token is a plain non-null string in pandas
    # (ignoreNullFields=false keeps null group values as JSON nulls),
    # and from_json restores the original types exactly after the
    # kernel. NaN/Infinity double group keys remain out of contract.
    gstruct = T.StructType([hashed.schema[c] for c in group_cols])
    tokenized = hashed.select(
        F.to_json(F.struct(*group_cols), {"ignoreNullFields": "false"}).alias(
            "_gk"
        ),
        "_h",
    )
    out_schema = T.StructType(
        [
            T.StructField("_gk", T.StringType(), False),
            T.StructField("_cand", T.ArrayType(T.LongType()), False),
        ]
    )

    def _mink(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        acc: dict[str, np.ndarray] = {}
        for pdf in batches:
            for key, sub in pdf.groupby("_gk", sort=False):
                hs = np.unique(sub["_h"].to_numpy(dtype=np.int64))[:k]
                prev = acc.get(key)
                acc[key] = hs if prev is None else np.union1d(prev, hs)[:k]
        if acc:
            yield pd.DataFrame(
                {"_gk": list(acc), "_cand": [a.tolist() for a in acc.values()]}
            )

    cand = (
        tokenized.mapInPandas(_mink, schema=out_schema)
        .select(F.from_json("_gk", gstruct).alias("_g"), "_cand")
        .select(F.col("_g.*"), "_cand")
    )
    return cand.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_cand")))),
            1,
            k,
        ).alias(sketch_col)
    )


def kmv_merge(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    sketch_col: str = "kmv",
) -> DataFrame:
    """Union KMV sketches up a hierarchy (day→month, type→all): min-k of
    the merged hash sets. Min-k union is a SEMILATTICE (associative,
    commutative, idempotent), so partial merges at any tree shape yield
    the identical sketch — pytest pins merge(per-day) == sketch(whole
    range) EXACTLY, a stronger contract than HLL's estimate-level
    losslessness. Only ≤ k longs per input row reach the shuffle."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
            1,
            k,
        ).alias(sketch_col)
    )


def kmv_estimate_expr(sketch: Column, k: int) -> Column:
    """Distinct estimate off a KMV sketch column: EXACT |sketch| when the
    group never saturated k (the sketch is the whole hash set); else the
    bottom-k estimator (k-1)/θ with θ = h_k / 2^60 — computed as the
    exactly-representable double (k-1)·2^60 divided by h_k, ONE IEEE
    division identical in any engine at any parallelism."""
    num = float((k - 1) * (1 << 60))  # (k-1) has << 53 bits: product is exact
    return F.when(
        F.size(sketch) >= k, F.lit(num) / F.element_at(sketch, k).cast("double")
    ).otherwise(F.size(sketch).cast("double"))


def kmv_setop_exprs(a: Column, b: Column, k: int) -> "dict[str, Column]":
    """Union / intersection / Jaccard estimates from two KMV sketches.

    The min-k of the concatenated hash sets is a valid KMV of the union;
    every merged hash is ≤ min(θ_a, θ_b), so its membership in each input
    SKETCH decides true membership in each input SET — matches/K is the
    intersection fraction of a uniform bottom-θ sample (Beyer et al.
    2007). est_intersect = matches·est_union/K, est_jaccard = matches/K.
    Every output is a deterministic function of the two integer arrays:
    same multiplication/division order on both engines → identical
    doubles. Returns exprs keyed union/intersect/jaccard/matches."""
    merged = F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)
    km = F.size(merged)
    est_u = kmv_estimate_expr(merged, k)
    matches = F.size(F.array_intersect(F.array_intersect(merged, a), b))
    est_i = F.when(
        km > 0, matches.cast("double") * est_u / km.cast("double")
    ).otherwise(F.lit(0.0))
    jac = F.when(km > 0, matches.cast("double") / km.cast("double")).otherwise(
        F.lit(0.0)
    )
    return {"union": est_u, "intersect": est_i, "jaccard": jac, "matches": matches}


def _cm_bucket_expr(key: Column, j: int, width: int, salt: str) -> Column:
    """Row-j Count-Min bucket of ``key``: the established cross-engine
    60-bit md5 key (sampling.shuffle_key_expr form, salted per hash row)
    mod ``width``. Both operands are non-negative, so Spark ``pmod`` and
    DuckDB ``%`` agree. DuckDB twin:
    ``CAST(('0x' || substr(md5('<salt>' || '<j>' || ':' || CAST(key AS
    VARCHAR)), 1, 15)) AS BIGINT) % width``."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}{j}:"), key.cast("string")
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cm_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    width: int = 64,
    depth: int = 4,
    salt: str = "cm",
    sketch_col: str = "cm",
) -> DataFrame:
    """COUNT-MIN sketch per group (Cormode & Muthukrishnan, J.Alg 2005):
    a depth×width counter matrix answering "how often did key x occur?"
    in O(depth) lookups with a one-sided guarantee — the estimate NEVER
    undercounts and overcounts by ≤ εN (ε = e/width) with probability
    1−e^−depth. The frequency sibling of the family's distinct sketches
    (HLL counts distinct, KMV intersects, Misra-Gries finds the top — CM
    answers POINT frequency queries for keys chosen after the scan, the
    per-key rate-limit / feature-frequency shape a training pipeline
    asks at serving time).

    Spark-first and exact-integer end to end — NO Python kernel: each
    row fans to ``depth`` (j, bucket) increments map-side (the bucket is
    the established cross-engine md5, so the whole matrix is
    SQL-replayable and value-hash gateable), ONE groupBy folds them with
    map-side partial aggregation — at most groups × depth × width
    counter rows leave any partition, never raw keys — and a second
    groups-sized aggregation densifies to the array layout. Returns
    group_cols + ``sketch_col``: array<long> of length depth·width,
    counts[j·width + b] = row-j bucket-b counter. Null keys drop
    (COUNT(x) semantics). Row sums are each exactly N(group) — the
    invariant pytest pins alongside merge==whole and layout invariance."""
    if width < 2 or depth < 1:
        raise ValueError(f"need width >= 2, depth >= 1 (got {width}x{depth})")
    if not group_cols:
        raise ValueError("cm_sketch needs at least one group column")
    key = F.col(key_col)
    cells = df.filter(key.isNotNull()).select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    (F.lit(j * width) + _cm_bucket_expr(key, j, width, salt))
                    for j in range(depth)
                ]
            )
        ).alias("_cell"),
    )
    counts = cells.groupBy(*group_cols, "_cell").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    # densify: collect the sparse cells into a map per group (bounded at
    # depth*width entries), then one map lookup over the full cell range;
    # absent cells are 0
    sparse = counts.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_cell", "_cnt"))).alias("_m")
    )
    return sparse.select(
        *group_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(depth * width - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("_m"), i), F.lit(0).cast("long")
            ),
        ).alias(sketch_col),
    )


def cm_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "cm",
) -> DataFrame:
    """Fold Count-Min sketches up a hierarchy (day→month, type→all) by
    element-wise addition — counters are a commutative MONOID, so any
    merge tree yields byte-identical arrays to the direct whole-range
    build (the gated entry exercises exactly this: Spark merges per-day
    sketches, the oracle builds the whole range directly, and the
    value-hash agrees). Only one array per input row reaches the
    shuffle."""
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    merged = grouped.agg(F.collect_list(sketch_col).alias("_parts"))
    # degenerate guards (review finding): collect_list DROPS null sketches,
    # so an all-null group yields an empty _parts — slice(len-1=-1) and
    # element_at(1) then die under ANSI with an opaque error; and
    # mixed-shape sketches zip-pad with nulls, silently corrupting
    # counters. Fail with real messages instead.
    bad_empty = F.size("_parts") == 0
    bad_shape = F.size(F.array_distinct(F.transform("_parts", F.size))) > 1
    checked = F.when(
        bad_empty,
        F.raise_error(F.lit("cm_merge: group has no non-null sketches")),
    ).when(
        bad_shape,
        F.raise_error(
            F.lit("cm_merge: sketches in one group have different widths/depths")
        ),
    ).otherwise(F.col("_parts"))
    return merged.select(
        *group_cols,
        F.aggregate(
            F.slice(checked, F.lit(2), F.greatest(F.size(checked) - 1, F.lit(0))),
            F.element_at(checked, 1),
            lambda acc, sk: F.zip_with(acc, sk, lambda x, y: x + y),
        ).alias(sketch_col),
    )


def cm_estimate_expr(
    sketch: Column,
    key: Column,
    width: int,
    depth: int,
    salt: str = "cm",
) -> Column:
    """Point-frequency estimate for ``key`` off a Count-Min sketch
    column: min over the depth row counters the key hashes to — exact
    longs, identical in any engine at any parallelism (the ≥-truth
    one-sided bound is pinned in pytest against exact counts)."""
    return F.array_min(
        F.array(
            *[
                F.element_at(
                    sketch,
                    (F.lit(j * width + 1) + _cm_bucket_expr(key, j, width, salt)).cast("int"),
                )
                for j in range(depth)
            ]
        )
    )


def cm_inner_product_expr(
    a: Column,
    b: Column,
    width: int,
    depth: int,
) -> Column:
    """JOIN-SIZE estimate from two Count-Min sketches (Cormode &
    Muthukrishnan 2005 §4.2): |A ⋈ B| on the sketched key equals the
    inner product Σ_key fA(key)·fB(key), and min over the depth rows of
    Σ_bucket a[j,b]·b[j,b] estimates it with the same one-sided
    guarantee — NEVER an underestimate, within εN·M with probability
    1−e^−depth. This is the query-optimizer primitive: estimate a join's
    output cardinality from two per-relation sketches without touching
    either table. Exact integer arithmetic (products and sums of longs),
    so estimates value-hash gate with no tolerance flag. Overflow: row
    sums are the relation sizes, so each term ≤ N·M — longs hold to
    N·M < 9.2e18."""
    row_dots = F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda j: F.aggregate(
            F.zip_with(
                F.slice(a, j * width + 1, width),
                F.slice(b, j * width + 1, width),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return F.array_min(row_dots)
