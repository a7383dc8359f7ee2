"""sf1 scale rehearsal runner (SURVEY §17.1 method, committed):
time a named set of entries at sf0.1 and at the key-shifted sf1 fixture
(scripts/build_sf1.py) in ONE warm session — sf0.001 codegen warmup
first, then back-to-back sf0.1 / sf1 per entry. Prints one JSON line
per entry; merge into BENCH_sf1.json by hand with provenance notes.

Usage: python scripts/rehearse_sf1.py <sf1_dir> <entry> [entry ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from kadiyadb_spark.session import get_spark


def run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main(sf1_dir: str, names: list[str]) -> None:
    spark = get_spark(app_name="kdb-sf1-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    for name in names:
        try:
            run(qs[name](spark, "/root/testdata/sf0.001"))  # codegen warmup
        except Exception as e:  # noqa: BLE001
            print(f"warmup {name} failed: {e}", file=sys.stderr)
        spark.catalog.clearCache()
        out = {"entry": name}
        for label, d in (("sf0.1_sec", "/root/testdata/sf0.1"), ("sf1_sec", sf1_dir)):
            t0 = time.perf_counter()
            try:
                run(qs[name](spark, d))
                out[label] = round(time.perf_counter() - t0, 2)
            except Exception as e:  # noqa: BLE001
                out[label] = -1.0
                out[f"{label}_error"] = str(e)[:300]
            spark.catalog.clearCache()
        if out.get("sf0.1_sec", 0) > 0 and out.get("sf1_sec", 0) > 0:
            out["ratio"] = round(out["sf1_sec"] / out["sf0.1_sec"], 2)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
