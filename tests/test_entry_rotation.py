"""Gate-rotation contract for __spark_entry__.queries().

The driver's correctness gate evaluates the FIRST 50 entries of the
queries() dict each round, so the dict's ORDER is load-bearing: a stray
reorder silently un-gates entries. Since r11 (VERDICT r10 item 1) the
contract is ROUND-AGNOSTIC: the whole dict must equal the order derived
from the staleness ledger — (last driver-green round ASC, name ASC), with
never-driver-gated borns LAST (their evidence, the current round's local
all-entry oracle run, is the freshest there is; the stalest DRIVER evidence
gates first). No per-round constants: these tests stay green when the
driver drops a new CORRECTNESS artifact (the derivation reads git-TRACKED
artifacts only) and when a new round's builder commits it and re-runs
scripts/staleness_ledger.py. Structural invariants (oracle twins, DuckDB
output types the driver can hash, corpus partition) are cheap enough for
every pytest run — no SparkSession needed.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from scripts.staleness_ledger import ROWS_ONLY, last_green_rounds

CAP = 50
NEVER = 10**9  # borns sort last; any real round is far below this


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


@pytest.fixture(scope="module")
def oracles():
    return entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ledger():
    return last_green_rounds()


def test_order_is_pure_function_of_ledger(qs, ledger):
    """The ENTIRE queries() order equals the ledger-derived queue: oldest
    driver evidence first (ties name-sorted), never-gated borns last. The
    cap (first 50) is therefore exactly the stalest-50 by construction —
    no entry can be starved, no born can silently skip the queue, and the
    worst-case re-gate latency bound below holds without any hand-curated
    plan constants."""
    expected = sorted(qs, key=lambda q: (ledger.get(q, NEVER), q))
    assert list(qs) == expected, (
        "queries() order diverges from the ledger-derived queue; first "
        "mismatch: "
        + next(
            f"pos {i}: have {a!r}, want {b!r}"
            for i, (a, b) in enumerate(zip(qs, expected))
            if a != b
        )
    )


def test_cap_is_the_stalest_window(qs, ledger):
    """Every gated entry inside the cap is at least as stale as every gated
    entry outside it (boundary-round ties broken by name, which the full
    order test already pins). Redundant with the full-order test but states
    the driver-facing property directly."""
    head, tail = list(qs)[:CAP], list(qs)[CAP:]
    gated_head = [ledger[q] for q in head if q in ledger]
    gated_tail = [ledger[q] for q in tail if q in ledger]
    if gated_head and gated_tail:
        assert max(gated_head) <= min(gated_tail)
    # a born entry may appear in the cap only by reaching the queue head
    # (i.e. when every gated entry is fresher) — with any gated backlog
    # present, borns live in the tail:
    borns_in_head = [q for q in head if q not in ledger]
    if gated_tail:
        assert not borns_in_head, (
            f"never-gated entries jumped the queue: {borns_in_head}"
        )


def test_staleness_ledger_artifact_current():
    """STALENESS.md is the committed ledger; it must match what the
    derivation produces from the git-TRACKED CORRECTNESS artifacts. An
    untracked artifact freshly dropped by the driver does NOT invalidate
    this (VERDICT r10 item 1) — the next round's builder commits it and
    re-runs scripts/staleness_ledger.py as its first act."""
    import os

    from scripts.staleness_ledger import REPO, render

    path = os.path.join(REPO, "STALENESS.md")
    assert os.path.exists(path), "run scripts/staleness_ledger.py"
    assert open(path).read() == render(), (
        "STALENESS.md out of date — re-run scripts/staleness_ledger.py"
    )


def test_worst_case_regate_latency_bound(qs):
    """The documented bound: at the current census and a 50-entry cap the
    oldest-first queue re-gates every entry within ceil(N/50) rounds. This
    pins the CLAIM to the census so growing the corpus updates the docs."""
    n = len(qs)
    bound = -(-n // CAP)
    assert bound <= 6, (
        f"census {n} pushes worst-case re-gate latency to {bound} rounds; "
        f"update STALENESS.md's documented bound and this test together"
    )


def test_every_entry_has_oracle_or_documented_rows_only(qs, oracles):
    undocumented = set(qs) - set(oracles) - ROWS_ONLY
    assert not undocumented, (
        f"entries without an oracle and not in the documented rows-only "
        f"set: {sorted(undocumented)}"
    )
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracles without a queries() entry: {sorted(orphans)}"


def test_no_duplicate_or_empty_entries(qs):
    assert len(qs) == len(set(qs))
    assert all(callable(fn) for fn in qs.values())


def test_oracle_output_types_driver_hashable(oracles):
    """r08 post-mortem: DuckDB HUGEINT/DECIMAL outputs hash differently at
    the driver than Spark BIGINT/DOUBLE while being invisible to
    .fetchall()-based local checks. Bind every oracle's plan (no execution)
    and reject those types outright."""
    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)
        cols = [
            c for c, ty in zip(rel.columns, rel.types)
            if any(b in str(ty).upper() for b in ("HUGEINT", "UHUGEINT", "DECIMAL"))
        ]
        if cols:
            bad[name] = cols
    assert not bad, (
        f"oracles with driver-unhashable output types (CAST them AS "
        f"BIGINT/DOUBLE): {bad}"
    )


def test_oracle_modules_partition_the_corpus(oracles):
    """The per-family split (kadiyadb_spark/oracles/) must PARTITION the
    oracle corpus: modules pairwise key-disjoint (all_oracles raises on
    overlap — exercise it) and their union exactly the gated dict the
    driver sees via oracle_sql()."""
    from kadiyadb_spark.oracles import _MODULES, all_oracles

    union: dict[str, str] = {}
    for m in _MODULES:
        part = m.oracles()
        assert part, f"{m.__name__} contributes no oracles"
        dup = union.keys() & part.keys()
        assert not dup, f"{m.__name__} redefines {sorted(dup)}"
        union.update(part)
    assert union == all_oracles() == oracles


def test_derivation_ignores_untracked_artifacts(tmp_path, monkeypatch):
    """VERDICT r10 item 1's Done criterion, executable: drop a synthetic
    CORRECTNESS artifact for a FUTURE round into the repo (untracked) and
    assert the ledger derivation does not move — so the suite stays green
    across the driver's post-session artifact drop."""
    import json
    import os

    from scripts.staleness_ledger import REPO

    before = last_green_rounds()
    fake = os.path.join(REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(fake)
    try:
        with open(fake, "w") as f:
            json.dump({"anti_join": {"rows_match": True, "schema_match": True,
                                     "hash_match": True}}, f)
        assert last_green_rounds() == before
    finally:
        os.remove(fake)
