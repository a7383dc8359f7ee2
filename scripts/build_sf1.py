"""Build the sf1 scale-rehearsal fixture: a 10x KEY-SHIFTED replication
of sf0.1 (SURVEY §17.1's method, now committed instead of ad hoc).

More users/docs/orders in the SAME time window — the realistic scale
axis for this engine (a store's cardinality grows much faster than its
retention). PERF-ONLY: never a correctness fixture (the driver gate and
check_oracle stay at sf0.01); nothing here feeds an oracle.

Each replica i shifts every join key by i*OFF so the replicas join only
within themselves (orders ⋈ lineitem ⋈ customer/supplier stay consistent
per replica); nation/region are dimensions and copy once, so e.g. the
nation trade graph keeps 25 nodes with 10x edge weights. Embedding
QUERIES (vec_id < 16) exist only in replica 0 — 10x docs, same queries.

Document TEXT is PERTURBED per replica (r12, VERDICT r11 item 1): the
r11 mirror fixture put 10 IDENTICAL copies of every text in the corpus,
so every LSH/simhash/winnow bucket grew 10x and candidate pairs ~100x —
a quadratic blowup no real 10x crawl has, which made the dedup family's
sf1 ratios (14-33x) fixture artifacts that would MASK a genuine plan
regression. The verdict's suggested 2-5% word-substitution rate was
MEASURED INSUFFICIENT for this engine's parameters (char-8-gram
shingles + bands=4/r=2: one word edit breaks only ~13 of ~290 shingles,
so 3% edits leave median J=0.88 and band-collision P=0.997 — still a
candidate AND still a true near-dup at the entries' threshold=0.1; at
50% substitution median J=0.13, P(candidate)=0.067). Rates per replica,
positions/replacements keyed by xxhash64(doc_id, i, idx) — fully
deterministic, no RNG; every replica appends a tag token so no
cross-replica EXACT mirror survives:
  - replica 1: 3% edits — a genuine cross-replica NEAR-DUP cohort (a
    real crawl does contain some lightly-edited reposts), ~2x pairs for
    those families;
  - replicas 2-9: 50%..78% edits — same-vocabulary but genuinely
    different text, below LSH candidate range, like the mostly-unrelated
    new documents of a real 10x corpus.
Within-replica near-dup structure (the sf0.1 corpus's own families) is
preserved exactly, once per replica, so total pairs and bucket sizes
grow ~linearly (~10-12x). n_chars is recomputed.

EMBEDDINGS are perturbed the same way (code-review r12: text-only
perturbation left every vector mirrored 10x with cosine exactly 1.0 —
the identical artifact for the embedding-dedup family): replica i>0
blends each vector with xxhash64-keyed uniform noise scaled to the
fixture's component std (unit-norm 64-dim, comp std 0.125). Replica 1
uses blend a=0.05 (cos ~ 0.999 — a true semantic-dup cohort); replicas
2-9 use a=0.80..0.94 (median cos ~ 0.27 -> 0.1, below the entries' 0.35
near-dup range). Embedding QUERY vectors (vec_id < 16) still exist only
in replica 0.

Usage: python scripts/build_sf1.py [src_sf_dir] [dst_dir]
       (defaults /root/testdata/sf0.1 -> /root/repo/.scratch/sf1)
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from kadiyadb_spark.session import ensure_engine_confs, get_spark

REPLICAS = 10
OFF = 10**9  # far above any sf0.1 key

SHIFTS = {
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_suppkey", "l_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],  # dimensions: copy once
    "region": [],
}


def perturbed_text(i: int):
    """Replica-i text: substitute words at xxhash64-chosen positions with
    synthetic vocab tokens, then append a replica tag so no cross-replica
    pair is ever an EXACT mirror. Replica 1 is a light-edit near-dup
    cohort; replicas 2-9 are heavy rewrites (rates derived empirically —
    see module docstring). Pure JVM expressions — deterministic across
    runs."""
    rate = 30 if i == 1 else 500 + 40 * (i - 2)  # permille: 3%; 50..78%
    words = F.split(F.col("text"), " ")
    edited = F.transform(
        words,
        lambda w, idx: F.when(
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i), idx), 1000) < rate,
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.xxhash64(F.col("doc_id"), F.lit(i), idx, F.lit("sub")),
                    50000,
                ).cast("string"),
            ),
        ).otherwise(w),
    )
    return F.concat(F.array_join(edited, " "), F.lit(f" r{i}"))


def perturbed_embedding(i: int):
    """Replica-i embedding: v*(1-a) + a*r with r = xxhash64-keyed uniform
    noise matched to the fixture's component std (0.125) — deterministic,
    no RNG; cosine(v, v') calibrated per the module docstring."""
    a = 0.05 if i == 1 else 0.80 + 0.02 * (i - 2)
    return F.transform(
        F.col("embedding"),
        lambda x, j: x * F.lit(1.0 - a)
        + F.lit(a * 0.433)
        * (
            F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i), j), 1000).cast("double")
            / F.lit(1000.0)
            - F.lit(0.5)
        ),
    ).cast("array<float>")


def main(src: str, dst: str) -> None:
    spark = get_spark()
    ensure_engine_confs(spark)
    for table, keys in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if keys:
            parts = []
            for i in range(REPLICAS):
                p = df
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(i * OFF))
                if table == "documents" and i > 0:
                    p = p.withColumn("text", perturbed_text(i)).withColumn(
                        "n_chars", F.length("text")
                    )
                if table == "embeddings" and i > 0:
                    p = p.withColumn("embedding", perturbed_embedding(i))
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = df
        out.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"wrote {table}: {out.count()} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        a[0] if a else "/root/testdata/sf0.1",
        a[1] if len(a) > 1 else "/root/repo/.scratch/sf1",
    )
