"""North-star data-pipeline operators (BASELINE.json): deduplication,
similarity search, text analysis, multimodal column plumbing.

These are new surface beyond the reference (SURVEY §7 step 5); each is
designed oracle-checkable (same computation expressible in ANSI SQL) and
scale-minded (built-in functions, no row-at-a-time Python in hot paths,
blocking/LSH instead of quadratic self-joins).
"""

from kadiyadb_spark.functions import (  # noqa: F401
    analytics,
    cdc,
    dedup,
    graph,
    multimodal,
    privacy,
    runtime_filter,
    sampling,
    similarity,
    sketch,
    skew,
    text,
    timeops,
    web,
)
