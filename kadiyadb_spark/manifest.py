"""Generation-manifest protocol for index/side-table storage.

The same commit primitive ``Database`` uses for the cube (database.py:
_commit_manifest) factored for the auxiliary stores that previously relied
on directory renames: the LSH/IVF index live-directory pointer and the
streaming decisions log. A store directory holds

    <dir>/manifest-<gen 12-digit>.json     -- the committed states
    <dir>/<data dirs / segment dirs>       -- invisible until referenced

and the LATEST manifest (lexical max == numeric max on zero-padded names)
is the truth. Commit = atomic create of the next generation file
(write-to-temp + rename-to-fresh-name; atomic on HDFS/POSIX, all-or-nothing
per object on S3A for these byte-sized files — fs.py module doc). A crash
at ANY point leaves either the previous generation fully readable or the
new one — never a half-state: staged data directories are pure orphans
until a manifest names them.

This is deliberately a dumb string->json keyed log: each store decides its
own manifest fields (``live`` data-dir for indexes; ``segments``/``hwm``
for the decisions log).

Reference parity: the reference's index persists via snapshot files +
logfile replay (index/index.go:66-125); the generation manifest is that
durability contract on object-store semantics.
"""

from __future__ import annotations

from typing import Any

from kadiyadb_spark.fs import HadoopFS

_PREFIX = "manifest-"


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this generation first (single-writer
    deployments should never see this; it exists so a misconfigured second
    writer fails loudly instead of corrupting the store)."""


class GenLog:
    """Latest-generation-wins manifest log over one directory.

    ``prefix`` names the manifest files (the cube's historical spelling is
    ``MANIFEST-``; auxiliary stores use the default) — since late r08 this
    class IS the one commit primitive: ``Database`` delegates its manifest
    protocol here instead of carrying a second copy."""

    def __init__(self, spark, path: str, keep: int = 3, prefix: str = _PREFIX):
        self.fs = HadoopFS(spark, path)
        self.path = path
        self.keep = keep
        self.prefix = prefix

    def _names(self) -> list[str]:
        return sorted(
            f
            for f in self.fs.list_files(self.path, suffix=".json")
            if f.startswith(self.prefix)
        )

    def read(self, at_gen: int | None = None) -> dict[str, Any]:
        """Latest committed manifest, or the RETAINED manifest of a pinned
        older generation (``at_gen``); ``{"gen": -1}`` when none exists.

        The log keeps the newest ``keep`` manifest files, so a reader can
        pin up to ``keep - 1`` generations behind the head — the snapshot
        contract that lets a long scan survive a concurrent compaction's
        generation swap (the store's data-dir GC retains every directory a
        retained manifest references; see ``live_dirs``)."""
        names = self._names()
        if at_gen is None:
            if not names:
                return {"gen": -1}
            # list-then-read race (code-review r12): a concurrent commit
            # with keep=1 (expire: data deletion collapses retention) can
            # delete names[-1] between the listing and the read even though
            # a valid NEWER head exists — re-list and retry instead of
            # surfacing a spurious FileNotFound. Bounded: each retry only
            # happens when the head ADVANCED, and a vanished head with no
            # replacement re-raises.
            for _ in range(5):
                try:
                    return self.fs.read_json(HadoopFS.join(self.path, names[-1]))
                except Exception:
                    newer = self._names()
                    if not newer or newer[-1] == names[-1]:
                        raise
                    names = newer
            return self.fs.read_json(HadoopFS.join(self.path, names[-1]))
        name = f"{self.prefix}{at_gen:012d}.json"
        if name not in names:
            raise ValueError(
                f"generation {at_gen} not retained in {self.path} "
                f"(have {self.retained()})"
            )
        return self.fs.read_json(HadoopFS.join(self.path, name))

    def retained(self) -> list[int]:
        """Generation numbers whose manifests are still on disk (ascending);
        any of them is a valid ``read(at_gen=...)`` pin."""
        return [int(n[len(self.prefix) : -len(".json")]) for n in self._names()]

    def live_dirs(self, key: str = "live") -> set[str]:
        """Data-dir names referenced by ANY retained manifest — the set a
        store's GC must keep so pinned generation reads stay serviceable.
        Manifests without ``key`` (e.g. segment-list logs) contribute
        nothing."""
        out: set[str] = set()
        for n in self._names():
            v = self.fs.read_json(HadoopFS.join(self.path, n)).get(key)
            if v is not None:
                out.add(v)
        return out

    def commit(self, m: dict[str, Any], prev_gen: int, keep: int | None = None) -> int:
        """Atomically publish generation ``prev_gen + 1``; returns it.

        Raises on a lost commit race (the generation file already exists) —
        single-writer is the maintenance assumption, so a race means two
        writers and silent last-wins would corrupt either's view.

        ``keep`` overrides the log's retention for THIS commit: data-DELETING
        commits pass 1 so deleted data is not resurrectable through an older
        snapshot (the cube's expire/merge_replace contract)."""
        gen = prev_gen + 1
        m = dict(m)
        m["gen"] = gen
        self.fs.mkdirs(self.path)
        name = f"{self.prefix}{gen:012d}.json"
        if not self.fs.write_json_atomic(HadoopFS.join(self.path, name), m):
            raise ConcurrentWriteError(
                f"manifest generation {gen} already exists in {self.path} "
                "(concurrent writer?)"
            )
        for old in self._names()[: -(self.keep if keep is None else keep)]:
            self.fs.delete(HadoopFS.join(self.path, old))
        return gen
