"""Back-compat shim: the daemon moved to the top-level ``kdb_pydaemon``
module (ADVICE r13 — a package submodule executes the package __init__
on ``python -m``, making every optional heavy import a daemon-fatal
dependency). Sessions configured with the old module name keep working
through this alias; it re-exports the stock manager unchanged."""

from kdb_pydaemon import manager  # noqa: F401

if __name__ == "__main__":
    manager()
