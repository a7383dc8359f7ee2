"""Table profiling — the data-quality census a pipeline runs before and
after every curation stage (row counts, null counts, exact distinct
cardinality, min/max per column).

Single-pass design: ONE aggregation job computes every column's metrics
(Catalyst plans the multiple DISTINCT aggregates with one Expand — a
constant small blow-up factor, still one scan + one reduce), then a
``stack`` unpivot reshapes the 1-row wide result into the long
(col_name, metrics) form tooling consumes. The unpivot runs on ONE row —
free.

At 100 TB exact ``countDistinct`` on a high-cardinality key is the one
expensive term (the Expand row for that column shuffles per distinct
value); ``approx=True`` swaps in HyperLogLog ``approx_count_distinct``
(fixed 2^p-register sketch per column, pure map-side merge) — the form a
routine scheduled census should run. Exact is the default because the
cross-engine oracle gate needs bit-equal answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """Per-column profile of ``cols``: (col_name, n_rows, n_nulls,
    n_distinct, min_val, max_val) with min/max rendered as strings (profile
    output is heterogeneous by nature; values are computed in the native
    type first, so ordering is numeric/temporal, not lexical).

    For quantile columns in a profile, prefer ``exact_quantiles`` (below)
    when group sizes are bounded — it replays the (n-1)*p linear
    interpolation in exact integer arithmetic, identical in any engine at
    any parallelism, where an engine-native percentile aggregate can
    legitimately round either way at a 4dp boundary (SURVEY §16.12). The
    GK sketch (functions/sketch.py) remains the scheduled form when a
    single group spans the corpus."""
    nd = F.approx_count_distinct if approx else F.countDistinct
    # r13 (guide §1.2/§7.2): min/max run in a SEPARATE global aggregation.
    # min/max over string/date columns have immutable aggregation buffers,
    # so mixing them into the multi-distinct Expand plan forced the WHOLE
    # 6x-expanded row set through SortAggregate with two full sorts
    # (measured 8 s of the entry's 8.8 s at sf0.1). Split, the distinct
    # phase hash-aggregates the Expand and the min/max phase is a global
    # (grouping-free — no sort inserted) partial-agg scan; the two 1-row
    # results cross-join for free. Values are the identical aggregates.
    cnt_aggs = [F.count(F.lit(1)).alias("_n_rows")]
    mm_aggs = []
    for c in cols:
        cnt_aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            nd(F.col(c)).alias(f"_nd_{c}"),
        ]
        mm_aggs += [
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*cnt_aggs).crossJoin(df.agg(*mm_aggs))
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}, _mn_{c}, _mx_{c}" for c in cols
    )
    return wide.selectExpr(
        "_n_rows",
        f"stack({len(cols)}, {stacked}) AS (col_name, _nn, n_distinct, min_val, max_val)",
    ).select(
        "col_name",
        F.col("_n_rows").cast("long").alias("n_rows"),
        (F.col("_n_rows") - F.col("_nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_val",
        "max_val",
    )


def column_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise PEARSON correlation over numeric columns — the profiling
    census that catches redundant features and broken joins (a corr that
    jumps between corpus versions is a schema drift alarm; pair with
    sketch.distribution_drift per column). Nulls in either column drop
    per pair (pairwise deletion, the SQL ``corr`` convention).

    Engine-default-free where ``F.corr`` is not: every input quantizes to
    a 4dp scaled long RE-CENTERED about the column minimum (exact long
    subtraction; the conditioning lesson of the variance family), the
    five pair sums (n, Sx, Sy, Sxx, Syy, Sxy) fold as DECIMAL(38,0) —
    exact integers at any parallelism, far past int64 (price-scale d²
    sums overflow a long in thousands of rows) — and the correlation is
    ONE double expression over those exact operands: the decimal->double
    cast is correctly rounded in both engines, so both see identical
    IEEE inputs. Spark/DuckDB's own ``corr`` accumulates doubles in
    partition order — the class the r07 gate redlined.

    Scale shape: ONE aggregation pass computes every pair's sums
    (c + 3·c(c-1)/2 decimal aggregates over one scan) after a 1-row
    min/max broadcast; the unpivot runs on one row. Precision bound:
    |d4| <= 1e9 over ~1e20 rows stays inside 38 digits for Sxx; past
    that, raise the fold to decimal(38,0) chunked or drop to the
    documented approximate ``F.corr``. Zero-variance columns yield null.

    Output: (col_a, col_b, n, corr) for each unordered pair, col_a <
    col_b by the caller's list order."""
    if len(cols) < 2:
        raise ValueError("need at least two columns to correlate")
    if len(set(cols)) != len(cols):
        raise ValueError(f"columns must be distinct, got {cols}")
    mins = df.agg(
        *[F.min(F.round(F.col(c).cast("double") * 10000).cast("long")).alias(f"_m_{c}") for c in cols]
    )
    base = df.crossJoin(F.broadcast(mins)).select(
        *[
            (
                F.round(F.col(c).cast("double") * 10000).cast("long") - F.col(f"_m_{c}")
            ).alias(f"_d_{c}")
            for c in cols
        ]
    )
    dec = "decimal(38,0)"
    aggs = []
    pairs = [(cols[i], cols[j]) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    for a, b in pairs:
        da, db = F.col(f"_d_{a}"), F.col(f"_d_{b}")
        both = da.isNotNull() & db.isNotNull()
        da_, db_ = F.when(both, da), F.when(both, db)
        tag = f"{a}__{b}"
        aggs += [
            F.count(da_).alias(f"_n_{tag}"),
            F.sum(da_.cast(dec)).alias(f"_sx_{tag}"),
            F.sum(db_.cast(dec)).alias(f"_sy_{tag}"),
            F.sum((da_ * da).cast(dec)).alias(f"_sxx_{tag}"),
            F.sum((db_ * db).cast(dec)).alias(f"_syy_{tag}"),
            F.sum((da_ * db).cast(dec)).alias(f"_sxy_{tag}"),
        ]
    wide = base.agg(*aggs)
    from kadiyadb_spark.functions.num import round4_expr

    rows = []
    for a, b in pairs:
        tag = f"{a}__{b}"
        nd = F.col(f"_n_{tag}").cast("double")
        sx = F.col(f"_sx_{tag}").cast("double")
        sy = F.col(f"_sy_{tag}").cast("double")
        sxx = F.col(f"_sxx_{tag}").cast("double")
        syy = F.col(f"_syy_{tag}").cast("double")
        sxy = F.col(f"_sxy_{tag}").cast("double")
        vx = nd * sxx - sx * sx
        vy = nd * syy - sy * sy
        corr = F.when(
            (F.col(f"_n_{tag}") >= 2) & (vx > 0) & (vy > 0),
            (nd * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
        )
        rows.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"_n_{tag}").alias("n"),
                round4_expr(corr).alias("corr"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("_r")).select("_r.*")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: "list[tuple[int, int]]" = ((1, 4), (1, 2), (3, 4)),
    names: "list[str] | None" = None,
) -> DataFrame:
    """Exact linear-interpolated quantiles WITHOUT the engine's
    ``percentile()`` — the last engine-semantics dependency on the gated
    surface (SURVEY residue (c)): engines agree on the (n-1)*p rank
    definition, but the value is computed inside their aggregate in their
    own double arithmetic. Here the definition is replayed explicitly in
    EXACT integer arithmetic: probs are rationals (num, den), the rank
    splits as pos = (n-1)*num, k = pos div den, rem = pos mod den (all
    longs), the order statistics at ranks k+1 / k+2 come off one
    series-sorted window, and the interpolated value is the exact
    integer ((den-rem)*lo4 + rem*hi4) with ONE final double division by
    den*1e4 — identical in any engine at any parallelism.

    Shape: one sort-shuffle per group column set (the unavoidable cost of
    an exact quantile; the 100 TB scheduled form is the GK sketch in
    functions/sketch.py), then the groups collapse to one row each.

    Returns group_cols + one column per prob (default p25/p50/p75) + n."""
    from pyspark.sql import Window

    from kadiyadb_spark.functions.num import round4_expr, scale4_expr

    if names is None:
        names = [f"p{int(100 * num / den)}" for num, den in probs]
    # values are 4dp-quantized by scale4 (lossless for <=4dp data like the
    # 2dp prices); ties in _x4 are interchangeable for order statistics
    w = Window.partitionBy(*group_cols).orderBy("_x4")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # NULLs are excluded BEFORE ranking: engine percentile()/quantile_cont
    # ignore nulls, but Spark's window ordering sorts them FIRST and
    # count(*) includes them — without this filter any null row silently
    # shifts every rank (ADVICE r09). n counts non-null values only.
    st = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols, scale4_expr(F.col(value_col)).alias("_x4")
    )
    st = st.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(wfull)
    )
    aggs = []
    for (num, den), name in zip(probs, names):
        pos = (F.col("_n") - F.lit(1)) * F.lit(num)
        k = F.expr(f"(( _n - 1 ) * {num}) div {den}")
        rem = pos % F.lit(den)
        lo = F.max(F.when(F.col("_rn") == k + 1, F.col("_x4")))
        hi = F.max(F.when(F.col("_rn") == k + 2, F.col("_x4")))
        r = F.max(F.when(F.col("_rn") == 1, rem))  # per-group constant
        val = (
            ((F.lit(den) - r) * lo + r * F.coalesce(hi, lo)).cast("double")
            / F.lit(float(den) * 10000.0)
        )
        aggs.append(round4_expr(val).alias(name))
    return st.groupBy(*group_cols).agg(*aggs, F.count("*").alias("n"))
