"""Gate-rotation contract for __spark_entry__.queries().

The driver's correctness gate evaluates the FIRST 50 entries of the
queries() dict each round, so the dict's ORDER is load-bearing: a stray
reorder silently un-gates entries. These tests pin the r10 cap membership
(SURVEY §16.8 cap math / VERDICT r09 item 1), assert the post-cap section
is the OLDEST-FIRST staleness queue (VERDICT r09 item 4 — the executable
replacement for the dead two-round claim), check the committed STALENESS.md
ledger matches its derivation, and keep the structural invariants (every
entry resolves, oracle twins exist, no oracle output type the driver hash
cannot canonicalize) cheap enough for every pytest run — no SparkSession
needed.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from scripts.staleness_ledger import ROWS_ONLY, last_green_rounds

CAP = 50

# The r10 gate plan: the six r09-born entries lead (none has ever had a
# driver row), then the 43-entry head of the r08-cap backlog, then entries
# born in r10 (birth-round rule). Keep in sync when adding entries.
R10_BORN_LEADS = [
    "fetch_cusum", "sketch_kmv_setops", "fetch_regex", "fetch_multi",
    "bpe_decode_roundtrip", "sim_outliers",
]
R10_NEW = ["fetch_multi_mixed", "multimodal_gif_frames", "fetch_absent",
           "embedding_matryoshka", "sketch_countmin", "graph_pagerank",
           "fetch_subquery", "sim_maxsim", "fetch_irate",
           "fetch_rule_group", "sketch_cm_joinsize", "fetch_group_share",
           "sql_over_cube",
           # session 3 borns:
           "rag_rrf_fusion", "bloom_join_prune", "text_normalize",
           "url_domain_census", "scd2_history", "cdc_merge_apply",
           "fetch_histogram_fraction", "embedding_pca",
           "asof_tolerance", "dedup_url_canonical", "privacy_k_anonymity",
           "db_forget", "graph_triangles", "multimodal_scene_cuts",
           "privacy_pseudonymize"]
# The §16.8 spills: stable r08 greens displaced by the birth-round
# rule; they re-gate via the staleness queue (r08 block), not the cap.
R10_DOCUMENTED_SPILL = {
    "topk_per_group", "window_daily_running", "window_frames",
    "pivot_event_matrix", "q10_returned_items", "q14_promo_ratio",
    "q15_top_supplier", "q17_small_quantity", "q19_disjunctive",
    "q21_waiting_suppliers", "q22_waiting_customers", "q8_market_share",
    "q9_product_profit",
    # session-3 displacements (four borns entered the cap):
    "q4_order_priority", "q5_local_supplier_volume", "q6_selective_scan",
    "q7_nation_volume", "q1_pricing_summary", "q3_top_revenue_orders",
    "histogram_rollup_merge", "pack_nosplit", "fetch_binop",
    "fetch_seasonal", "text_bigram_lm", "cohort_retention",
    "sim_hard_negatives", "funnel_windowed", "funnel_counts",
}


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


@pytest.fixture(scope="module")
def oracles():
    return entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ledger():
    return last_green_rounds()


def test_cap_leads_with_r10_plan(qs, ledger):
    head = list(qs)[:CAP]
    # the six never-gated r09 borns lead so a first-gate red is visible
    # immediately
    assert head[: len(R10_BORN_LEADS)] == R10_BORN_LEADS
    # every r10-born entry gates in its birth round
    missing_new = set(R10_NEW) - set(head)
    assert not missing_new, f"r10-born entries outside the cap: {missing_new}"
    # every never-driver-gated entry (except documented rows-only) is in
    # the cap — nothing can be born and silently never gated
    never = {q for q in qs if q not in ledger} - ROWS_ONLY
    assert never <= set(head), f"never-gated entries outside the cap: {never - set(head)}"
    # the backlog fill is exclusively r08-green entries (the §16.8 order):
    # nothing fresher than r08 may occupy a cap slot this round
    for q in head[len(R10_BORN_LEADS):]:
        if q in ledger:
            assert ledger[q] == 8, (
                f"cap slot wasted on {q} (last green r{ledger[q]:02d}; the "
                f"r10 cap admits only never-gated and r08-green entries)"
            )


def test_post_cap_is_oldest_first_staleness_queue(qs, ledger):
    """VERDICT r09 item 4: beyond the cap, entries are ordered by their
    last driver-green round ASCENDING (ties by name), so every future cap
    takes new borns + the queue head and worst-case re-gate latency is
    bounded by ceil(N/cap) rounds BY CONSTRUCTION. The r05-aged block —
    including the six the verdict names — therefore leads the r11 gate."""
    tail = list(qs)[CAP:]
    rounds = [ledger[q] for q in tail if q in ledger]
    assert all(q in ledger for q in tail), (
        f"non-gated entries must live inside the cap, found in queue: "
        f"{[q for q in tail if q not in ledger]}"
    )
    assert rounds == sorted(rounds), "staleness queue is not oldest-first"
    within_round = {}
    for q in tail:
        within_round.setdefault(ledger[q], []).append(q)
    for rnd, names in within_round.items():
        assert names == sorted(names), f"r{rnd:02d} block not name-sorted"
    # the verdict-named r05-aged six sit inside the next round's cap window
    aged_six = {"anti_join", "approx_distinct", "distinct_users",
                "text_quality", "text_fingerprint", "bucketed_join"}
    assert aged_six <= set(tail[:CAP]), (
        "the r05-aged six must lead the r11 gate (first CAP queue slots)"
    )
    # the documented spill four are in the queue (they re-gate from the
    # r08 block), not lost
    assert R10_DOCUMENTED_SPILL <= set(tail)


def test_staleness_ledger_artifact_current():
    """STALENESS.md is the committed ledger; it must match what the
    derivation produces from the CORRECTNESS artifacts on disk."""
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
    assert bound <= 5, (
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
