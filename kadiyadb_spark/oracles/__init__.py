"""The driver-gate oracle corpus: DuckDB ANSI-SQL twins for every gated
``queries()`` entry, split per family (VERDICT r08 item 6 — the oracle text
used to live in one 8k-line ``__spark_entry__.py``).

Each module exposes ``oracles() -> dict[str, str]``; :func:`all_oracles`
merges them in a fixed order and asserts key-disjointness, so a copy-paste
duplicate key fails loudly instead of silently shadowing a gate."""

from __future__ import annotations

from kadiyadb_spark.oracles import (
    cube,
    dedup,
    events,
    fetch,
    multimodal,
    packing,
    pipelines,
    profile,
    relational,
    similarity,
    text,
    tokenize,
    tpch,
)

_MODULES = (
    cube, fetch, events, tpch, relational, profile, packing,
    text, tokenize, dedup, similarity, multimodal, pipelines,
)


def all_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    for m in _MODULES:
        part = m.oracles()
        dup = o.keys() & part.keys()
        if dup:
            raise AssertionError(f"duplicate oracle keys across modules: {sorted(dup)}")
        o.update(part)
    return o
