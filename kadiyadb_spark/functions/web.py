"""URL parsing for web-curation pipelines — pure JVM string expressions.

A crawl-scale corpus is grouped, deduplicated, filtered and weighted BY
DOMAIN (CCNet/RefinedWeb: per-domain quotas, domain reputation priors,
robots/blocklist joins), so the engine needs a deterministic URL parser
that both gate engines replay exactly. Everything here is regexp_extract
over a dialect-shared pattern subset (no backslash escapes, no classes
with ``&&`` — the same conservative whitelist the manifest Re-pruning
uses), evaluated map-side: parsing never shuffles, and the census groupBy
is the only Exchange, keyed on the registrable domain.

``registrable_domain`` resolves through the FULL-SNAPSHOT PSL path by
default (r12, VERDICT r11 item 4): the vendored multi-depth rule table
(functions/psl.py DEFAULT_PSL_RULES — two-label registries plus the
three-label/wildcard/exception families) joined via
``psl.registrable_domain_psl`` — every join BROADCASTs the few-hundred-row
rule table, so the parse stage still adds no shuffle and the census
groupBy stays the only Exchange. Pass ``psl=None`` for the dependency-free
two-label expression fallback (zero joins, one literal-array membership
test in the projection — unknown TLDs fall back to last-two-labels in
both paths), or your own ``psl_table(spark, snapshot_lines)`` for the
complete publicsuffix.org snapshot.

Reference parity: the reference has no string/URL functions at all; this
belongs to the north-star curation surface (SURVEY.md north-star ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kadiyadb_spark.functions.psl import (
    default_psl_table,
    registrable_domain_expr,
    registrable_domain_psl,
)

# sentinel: "resolve through the vendored full-snapshot PSL table" —
# distinct from None (= the two-label expression fallback)
_DEFAULT_PSL = "default"

# Dialect-shared patterns (Java regex and RE2 agree on every construct
# used: anchors, literal classes, negated classes, '*'/'+' quantifiers).
_SCHEME_RE = "^([a-z][a-z0-9+.-]*)://"
_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"


def url_components(
    df: DataFrame,
    url_col: str = "url",
    keep: list[str] | None = None,
    psl: "DataFrame | str | None" = _DEFAULT_PSL,
) -> DataFrame:
    """Split ``url_col`` into (scheme, host, registrable_domain, path,
    has_query) columns, appended to ``keep`` (default: every other input
    column). Unparseable URLs (no scheme://host) yield empty-string
    components and has_query from a plain substring test — never NULL, so
    downstream group keys stay total. has_query is 0/1 long (the driver
    gate's hashable-type contract excludes booleans).

    ``psl`` picks the registrable-domain resolution (VERDICT r11 item 4 —
    full snapshot is the DEFAULT): leave it at the default for the
    vendored multi-depth rule table via broadcast joins (still no shuffle;
    resolves three-label suffixes like pref.aichi.jp and
    wildcard/exception rules); pass a ``psl_table`` DataFrame for a
    complete publicsuffix.org snapshot; pass ``None`` for the
    dependency-free two-label expression fallback (zero joins)."""
    # output names are reserved in BOTH paths (code-review r12): a kept
    # input column named e.g. 'host' would duplicate the output column —
    # an AMBIGUOUS_REFERENCE AnalysisException inside the join path and a
    # silently ambiguous frame in the expression path; raise loudly like
    # merge_asof / registrable_domain_psl do
    base = df.columns if keep is None else keep
    clash = {"scheme", "host", "registrable_domain", "path", "has_query"} & set(base)
    if clash:
        raise ValueError(
            f"input columns collide with url_components output names: "
            f"{sorted(clash)} (rename or pass keep= without them)"
        )
    if isinstance(psl, str) and psl != _DEFAULT_PSL:
        raise ValueError(
            f"psl must be the default sentinel, None, or a psl_table "
            f"DataFrame — got the string {psl!r} (to use a snapshot file, "
            f"load it: psl_table(spark, open(path).read().splitlines()))"
        )
    scheme = F.regexp_extract(F.col(url_col), _SCHEME_RE, 1)
    # authority -> host: strip userinfo ('user:pw@') and port (':8080') so
    # census keys never split one domain across bogus variants
    # (r10 ADVICE: 'user@example.com:8080' must census as example.com)
    host = F.regexp_replace(
        F.regexp_replace(F.regexp_extract(F.col(url_col), _HOST_RE, 1), "^.*@", ""),
        ":[0-9]+$",
        "",
    )
    path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    has_query = (
        # query test on the PRE-FRAGMENT prefix: a '?' occurring only inside
        # the fragment ('https://h/p#sec?x=1') is fragment text, not a query
        F.split_part(F.col(url_col), F.lit("#"), F.lit(1))
        .contains("?")
        .cast("long")
        .alias("has_query")
    )
    if psl is None:
        # two-label expression fallback: one literal-array membership test
        # folded into the parse projection, zero joins
        return df.select(
            *base,
            scheme.alias("scheme"),
            host.alias("host"),
            registrable_domain_expr(host).alias("registrable_domain"),
            path.alias("path"),
            has_query,
        )
    rules = default_psl_table(df.sparkSession) if isinstance(psl, str) else psl
    parsed = df.select(
        *base,
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        has_query,
    )
    resolved = registrable_domain_psl(parsed, "host", rules)
    # registrable_domain_psl appends out_col last; restore the documented
    # column order (…, scheme, host, registrable_domain, path, has_query)
    return resolved.select(
        *base, "scheme", "host", "registrable_domain", "path", "has_query"
    )


def domain_census(
    df: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
    psl: "DataFrame | str | None" = _DEFAULT_PSL,
) -> DataFrame:
    """Per-registrable-domain corpus census: doc count, distinct hosts,
    query-URL count and (optionally) total ``size_col`` — the table a
    curation pipeline joins back as its domain prior / quota base. One
    domain-keyed groupBy (partial map-side combine); output is one row per
    domain, orders of magnitude smaller than the corpus. ``psl`` as in
    ``url_components`` — the default resolves through the vendored
    full-snapshot PSL table (broadcast-only; the groupBy stays the sole
    Exchange)."""
    parts = url_components(df, url_col=url_col, psl=psl)
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").cast("long").alias("n_hosts"),
        F.sum("has_query").alias("n_query_urls"),
    ]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).cast("long").alias("total_" + size_col))
    return parts.groupBy("registrable_domain").agg(*aggs)


# Tracking parameters stripped by default — the industry-standard set a
# crawl canonicalizer removes before URL-level dedup.
DEFAULT_STRIP_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "ref", "fbclid", "gclid",
)


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    strip_params: tuple[str, ...] = DEFAULT_STRIP_PARAMS,
) -> DataFrame:
    """Canonical URL for dedup: lowercase scheme+host, drop the fragment,
    strip tracking query parameters (``strip_params``), SORT the
    surviving parameters (param order is presentation, not identity),
    and trim one trailing slash from a non-root path. URL-level exact
    dedup is the cheapest, highest-yield dedup lever a crawl pipeline
    has, and it only works after canonicalization — `/p/1?utm_source=x`
    and `/p/1` are the same document.

    All JVM expressions (regexp_extract + array filter/sort, the
    dialect-shared pattern subset), map-side only. Unparseable URLs
    canonicalize to the lowercased input (still a deterministic dedup
    key). Appends ``canonical_url`` to the frame.
    """
    u = F.col(url_col)
    # case-TOLERANT parse patterns (scheme/host case is presentation and
    # gets lowercased; path/query case is identity and is preserved)
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    )
    path = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    # trim ALL trailing slashes (an all-slash path collapses to the root
    # '/'): trimming just one is not idempotent — '/q//' -> '/q/' -> '/q'
    # would split a dedup group on a re-run (hypothesis P22 found this)
    path = F.when(path.rlike("^/+$"), F.lit("/")).otherwise(
        F.regexp_replace(path, "/+$", "")
    )
    # query = everything after the first '?' of the PRE-FRAGMENT prefix; a
    # '?' only inside the fragment must not leak params into the canonical
    # form (r10 ADVICE). Note host:port is PRESERVED here (a different port
    # is a different resource — canonical identity, unlike the census key).
    query = F.regexp_extract(
        F.split_part(u, F.lit("#"), F.lit(1)), "[?](.*)$", 1
    )
    strip_arr = F.array(*[F.lit(p) for p in strip_params])
    params = F.array_sort(
        F.filter(
            F.split(query, "[&]"),
            lambda p: (p != "")
            & ~F.array_contains(strip_arr, F.split_part(p, F.lit("="), F.lit(1))),
        )
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(
            F.lit("")
        ),
    )
    return df.withColumn(
        "canonical_url",
        F.when(host != "", canon).otherwise(F.lower(u)),
    )
