"""Gate-rotation contract for __spark_entry__.queries().

The driver's correctness gate evaluates the FIRST 50 entries of the
queries() dict each round, so the dict's ORDER is load-bearing: a stray
reorder silently un-gates entries. These tests pin the r09 cap membership
to the plan in SURVEY §15.5 / VERDICT r08 item 3, and keep the structural
invariants (every entry resolves, oracle twins exist, no oracle output
type the driver hash cannot canonicalize) cheap enough for every pytest
run — no SparkSession needed.
"""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

CAP = 50

# The r09 gate plan (SURVEY §15.5): 3 CAST-fixed r08 hash-reds, the 35
# never-driver-gated entries, the late-r08 fetch_anomaly rewrite re-proof,
# the 5 displaced sweep re-gates, 6 r05-aged fillers. New entries added
# during r09 go inside the cap displacing the aged fillers (keep this set
# in sync when that happens).
R09_REDS = ["q12_shipmode", "q20_potential_promotion", "fetch_downsample"]
R09_NEVER_GATED = [
    "fetch_agg_by", "fetch_topk_instant", "fetch_count_values",
    "path_transitions", "fetch_stddev_window", "fetch_alerts",
    "fetch_quantile_by", "streaming_alerts", "db_clone", "bpe_encode_ids",
    "fetch_share", "fetch_remap", "pack_ids", "text_decontaminate_spans",
    "ngram_heavy_hitters", "fetch_burn_rate", "dedup_fuzzy",
    "bm25_retrieval", "fetch_last_write", "text_keywords",
    "dedup_keep_best", "funnel_time", "rfm_segments",
    "fetch_seasonal_anomaly", "drift_psi", "fetch_mad_anomaly",
    "active_users", "attribution_last_touch", "text_collocations",
    "sim_knn_graph", "track_rejects", "dedup_containment",
    "profile_correlations", "streaming_rejects", "fetch_outlier_fences",
]
# New r09 entries gate in their birth round (displacing aged fillers):
R09_NEW = [
    "sim_ivfpq_residual_det", "embedding_quantize", "text_char_entropy",
    "multimodal_gif_real", "sample_weighted", "sim_ivfpq_refined",
]
R09_REQUIRED_IN_CAP = (
    set(R09_REDS) | set(R09_NEVER_GATED) | set(R09_NEW) | {"fetch_anomaly"}
)
R09_DISPLACED_REGATES = {
    "json_source_agg", "csv_source_agg", "zorder_layout", "date_extract",
    "rollup_revenue",
}

# Entries that are rows-only BY DESIGN (no SQL-expressible oracle); the
# driver records a weaker rows-only check for these and the judge sees it.
ROWS_ONLY = {"sim_ivfpq_residual", "quality_model"}


@pytest.fixture(scope="module")
def qs():
    return entry_mod.queries()


@pytest.fixture(scope="module")
def oracles():
    return entry_mod.oracle_sql()


def test_cap_leads_with_r09_plan(qs):
    head = list(qs)[:CAP]
    missing = R09_REQUIRED_IN_CAP - set(head)
    assert not missing, (
        f"r09 gate plan violated: {sorted(missing)} fell out of the "
        f"first-{CAP} cap (SURVEY §15.5: reds + never-gated + "
        f"fetch_anomaly must all gate this round)"
    )
    # the reds lead the gate so a recurrence is visible immediately
    assert head[:3] == R09_REDS


def test_cap_regates_displaced_entries(qs):
    head = set(list(qs)[:CAP])
    missing = R09_DISPLACED_REGATES - head
    assert not missing, (
        f"displaced r08 sweep re-gates missing from the cap: {sorted(missing)}"
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
