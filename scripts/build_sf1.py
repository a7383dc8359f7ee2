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
