"""Python worker daemon that preloads the heavy scientific stack.

Spark forks ONE Python daemon per worker factory and forks each task
worker from it, so anything imported here is inherited by every worker
via copy-on-write — imported once per factory instead of once per worker.

Why this exists (r13, guide §4.5): the stock daemon imports only pyspark;
each forked worker then imports numpy/pandas/pyarrow on first use, ~1-2 s
of CPU per worker. A 253-query bench session constantly rebuilds worker
pools (a bounded collect/take downstream of an Arrow kernel terminates
the stream early, which kills the worker instead of returning it to the
reuse pool), so the next Arrow-kernel query pays 32 fresh imports —
measured as multimodal_avi_real reading 8-16 s in full-session runs vs
~1.1 s with a warm pool, with the same plan and the same data. Preloading
here cuts a pool rebuild to bare forks.

Every import is best-effort: a missing optional package must not take
down the daemon (that would fail ALL Python queries), so only pyspark
itself is a hard dependency.

TOP-LEVEL module by design (ADVICE r13): as a package submodule,
``python -m kadiyadb_spark.pydaemon`` would execute the package
``__init__`` first, which hard-imports half the engine (pyspark.sql,
pandas via functions/multimodal) — any import failure there would crash
the daemon and with it EVERY Python worker, defeating the "only pyspark
is a hard dependency" guarantee. Living at the repo root, ``python -m
kdb_pydaemon`` imports nothing but this file and pyspark.daemon.
"""

import importlib

for _mod in ("numpy", "pandas", "pyarrow", "pyarrow.compute"):
    try:
        importlib.import_module(_mod)
    except Exception:  # noqa: BLE001 - preload is opportunistic, never fatal
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
