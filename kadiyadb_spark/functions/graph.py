"""Iterative graph scoring over edge DataFrames: deterministic PageRank.

Why this lives in a training-data engine: web-scale curation pipelines
use link-graph authority as a document quality prior (Common Crawl's
domain ranks; RefinedWeb and CCNet both gate on domain reputation) — the
score is computed once over the crawl graph and joined onto documents as
a feature. The reference engine has no graph surface at all; this is the
kind of batch scoring job its users run NEXT to it, so the Spark-native
engine carries it as a first-class operator alongside the dedup family's
connected components (functions/dedup.py).

Determinism doctrine (the repo invariant: no engine-default FP on any
gated surface): ranks are SCALED LONGS and every update is integer
arithmetic — per-edge weight shares are quantized once to 4dp
(share4 = w·10^4 // W_out, a defined construction, not an approximation
of one), per-edge contributions are ``r·share4 // 10^4``, and the
damping fold is ``base + d_num·Σ // d_den`` — so iteration k's rank
vector is a pure integer function of the edge list, identical in any
engine at any partition layout, and the SQL oracle replays it by
unrolling the same k updates as CTEs.

Scale shape: the rank vector and edge list stay DataFrames end to end
(no driver collect — node count is unbounded); one iteration is one
src-keyed join (ranks × edges) plus one dst-keyed aggregation, i.e. two
key shuffles over |E| rows, the canonical distributed-PageRank plan.
Iterations are a fixed small K (authority priors use 3–10); each round
reuses the same join keys so AQE/exchange reuse keeps the plan tight.
Overflow audit: share4 ≤ 10^4 and Σ ranks ≤ |V|·scale grows by at most
d_num/d_den per round, so contributions stay ≤ |V|·scale·10^4 — with
the default scale 10^6 that holds |V| ≤ ~9·10^8 nodes inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iters: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**6,
    rank_col: str = "rank",
) -> DataFrame:
    """Weighted PageRank with exact integer updates (see module doc).

    ``edges`` is a directed edge list; parallel edges fold into one edge
    whose weight is the sum (unweighted input: weight 1 per row). Nodes
    are every distinct endpoint. Dangling nodes (no out-edges) emit no
    mass — the standard "drop dangling mass" variant, documented rather
    than redistributed: an authority PRIOR cares about relative order,
    and the variant keeps every update a local integer fold.

    Returns (node, ``rank_col``) with ranks as scaled longs (node value
    ``scale`` = the uniform start). Divide by ``scale`` for display; the
    gated entry keeps the longs — exact is hashable, quotients are not.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_num < damping_den:
        raise ValueError("need 0 < damping_num < damping_den")
    if scale % damping_den:
        raise ValueError("scale must be divisible by damping_den for an exact base term")

    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.groupBy(
        F.col(src).alias("_src"), F.col(dst).alias("_dst")
    ).agg(F.sum(w).alias("_w"))
    # runtime guard: a non-positive folded weight makes the share
    # construction meaningless (and _wout could reach 0) — fail loudly at
    # the executor rather than emit silent nulls
    e = e.withColumn(
        "_w",
        F.when(F.col("_w") > 0, F.col("_w")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pagerank: non-positive edge weight for src="),
                    F.col("_src").cast("string"),
                )
            )
        ),
    )
    # quantized out-share: share4 = w * 10^4 // W_out  (exact integers;
    # a zero share — w < W_out/10^4 — is a defined drop, like dangling)
    tot = e.groupBy("_src").agg(F.sum("_w").alias("_wout"))
    # `div` is Spark's long/long integer division — `/` would detour
    # through double and corrupt past 2^53 (repo-wide doctrine)
    e4 = e.join(tot, "_src").select(
        "_src", "_dst", F.expr("(_w * 10000) div _wout").alias("_share4")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    base = scale * (damping_den - damping_num) // damping_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("_r"))
    for _ in range(iters):
        contrib = (
            ranks.join(e4, ranks["node"] == e4["_src"])
            .select(
                F.col("_dst").alias("node"),
                F.expr("(_r * _share4) div 10000").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .withColumn("_in", F.coalesce("_in", F.lit(0).cast("long")))
            .select(
                "node",
                F.expr(
                    f"CAST({base} AS BIGINT) + (_in * {damping_num}) div {damping_den}"
                ).alias("_r"),
            )
        )
    return ranks.select("node", F.col("_r").alias(rank_col))


def triangle_count(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact per-node triangle counts over an undirected simple graph —
    the clustering-structure primitive beside connected components
    (community detection, spam-farm detection in link graphs, graph
    health metrics). Input is an edge list in any form: direction,
    duplicates and self-loops are normalized away first.

    Algorithm: degree orientation (the MapReduce-standard trick — Suri &
    Vassilvitskii, WWW 2011): orient each undirected edge from its
    lower-(degree, id) endpoint to the higher one; every triangle then
    has EXACTLY one vertex with two out-edges in it, so counting
    (u->v, u->w) wedges closed by an oriented v->w edge counts each
    triangle once. Out-degrees under this orientation are O(sqrt(m)), so
    the wedge join generates at most m^(3/2) candidates REGARDLESS of
    skew — a hub of degree 10^6 contributes no wedges because its edges
    all point INTO it. Two equi-joins, both on edge keys; all integer.

    Output: (node, n_triangles) for every node in >= 1 triangle.
    """
    # Node ids keep their NATIVE type (r10 ADVICE): least/greatest, the
    # orientation tie-break and every join below only need a total order,
    # which any Spark atomic type has — a cast("long") here turned string
    # ids into NULLs and silently emptied the result instead of failing.
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.select(F.least(a, b).alias("_a"), F.greatest(a, b).alias("_b"))
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    deg = (
        und.select(F.col("_a").alias("_n"))
        .unionByName(und.select(F.col("_b").alias("_n")))
        .groupBy("_n")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    da = deg.select(F.col("_n").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_n").alias("_b"), F.col("_d").alias("_db"))
    # orient from the lower-(degree, id) endpoint to the higher one
    j = und.join(da, "_a").join(db, "_b")
    lower_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    oriented = j.select(
        F.when(lower_first, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(lower_first, F.col("_b")).otherwise(F.col("_a")).alias("_v"),
    )
    e1 = oriented.select(F.col("_u"), F.col("_v").alias("_x"))
    e2 = oriented.select(F.col("_u"), F.col("_v").alias("_y"))
    wedges = e1.join(e2, "_u").filter(F.col("_x") < F.col("_y"))
    # close the wedge against the UNDIRECTED edge set (already normalized
    # least/greatest, and wedges have _x < _y) — a pure EQUI-join on the
    # edge key, never a BNLJ
    tri = wedges.join(
        und,
        (F.col("_a") == F.col("_x")) & (F.col("_b") == F.col("_y")),
        "left_semi",
    ).select("_u", "_x", "_y")
    nodes = (
        tri.select(F.col("_u").alias("node"))
        .unionByName(tri.select(F.col("_x").alias("node")))
        .unionByName(tri.select(F.col("_y").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
