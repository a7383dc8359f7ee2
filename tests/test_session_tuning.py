"""Pins for the r13 session tuning (driver heap per task slot, daemon
preload) — the two session-level knobs changes 12-13 introduced.

These tests pin the PURE logic (no Spark session): the heap derivation's
floor/cap/override contract and the daemon module's import safety. The
live-session behavior (workers actually forked from the preloaded daemon)
is exercised end to end by every Arrow-kernel test in the suite once a
get_spark session is in play, and was verified against the full oracle
sweep at the introducing commit.
"""

import importlib
import os
from unittest import mock

from kadiyadb_spark.session import _default_driver_mem


def _with_cpus(val):
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_CPUS"}
    if val is not None:
        env["SPARK_GRAFT_CPUS"] = val
    return mock.patch.dict(os.environ, env, clear=True)


def test_driver_mem_floor_holds_at_small_core_counts():
    # 8 cores -> the old 16g default, NOT 8g: small hosts are unchanged.
    with _with_cpus("8"):
        assert _default_driver_mem() == "16g"


def test_driver_mem_scales_with_cores_up_to_ram_cap():
    with _with_cpus("32"):
        got = int(_default_driver_mem().rstrip("g"))
    try:
        ram_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") >> 30
    except (ValueError, OSError, AttributeError):
        ram_gb = 64
    assert got == max(16, min(32, ram_gb // 4))


def test_driver_mem_garbage_cpus_falls_back_to_host_cores():
    with _with_cpus("not-a-number"):
        val = _default_driver_mem()
    assert val.endswith("g") and int(val.rstrip("g")) >= 16


def test_pydaemon_importable_and_wraps_stock_manager():
    # The daemon module must import cleanly (a failure here would take down
    # EVERY Python worker) and re-export pyspark.daemon.manager unchanged.
    mod = importlib.import_module("kadiyadb_spark.pydaemon")
    from pyspark.daemon import manager as stock_manager

    assert mod.manager is stock_manager


def test_pydaemon_preload_survives_missing_optional_package():
    # Simulate an environment without pandas: re-executing the module body
    # must not raise (imports are opportunistic by design).
    import kadiyadb_spark.pydaemon as pd_mod

    real_import = importlib.import_module

    def flaky(name, *a, **kw):
        if name in ("pandas", "pyarrow", "pyarrow.compute"):
            raise ImportError(name)
        return real_import(name, *a, **kw)

    with mock.patch.object(importlib, "import_module", side_effect=flaky):
        importlib.reload(pd_mod)
    importlib.reload(pd_mod)  # restore a fully-loaded module for siblings
    assert pd_mod.manager is not None
