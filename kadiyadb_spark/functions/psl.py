"""Public-suffix registrable-domain resolution (VERDICT r10 item 4).

The last-two-labels rule mis-censuses every co.uk / com.au-class host:
``shop.example.co.uk`` must census as ``example.co.uk``, not ``co.uk``.
The correct rule is the Mozilla Public Suffix List algorithm: find the
LONGEST matching public suffix, then registrable domain = that suffix plus
one more label.

Two execution paths, both shuffle-free:

- ``registrable_domain_expr`` (default everywhere): a pure JVM expression
  against ``PSL_TWO_LEVEL`` — a VENDORED SUBSET of the PSL's two-label
  rules covering the ccTLD second-level registries a web corpus actually
  hits (co.uk, com.au, co.jp, ...; ~170 rules, public knowledge from
  publicsuffix.org). The set membership test is one literal-array
  ``array_contains`` folded into the projection: zero joins, zero
  shuffles, evaluated map-side inside the same whole-stage codegen span
  as the URL parse. Hosts under unknown TLDs fall back to last-two-labels
  — exactly the pre-PSL behavior, so the upgrade is strictly monotone.

- ``registrable_domain_psl`` (the 100 TB / full-snapshot path): takes the
  complete ~15k-rule PSL as a DataFrame (columns rule/is_exception) and
  resolves via ≤``max_depth`` BROADCAST hash joins — one per candidate
  suffix depth, each map-side (the PSL is a few hundred KB), never an
  explode + re-group. Wildcard rules (``*.ck``) match through a second
  join key per depth; exception rules (``!www.ck``) mark the matched name
  itself registrable, per the PSL spec. No shuffle is introduced: every
  join broadcasts the rule table and the deepest-match pick is a
  when-cascade in the projection.

Reference parity: the reference has no URL functions; this is north-star
curation surface (SURVEY.md) shared by functions/web.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Vendored subset of publicsuffix.org two-label ICANN rules — the
# second-level ccTLD registries (suffix -> registrable is the THIRD label
# from the right). A full snapshot belongs in the registrable_domain_psl
# table; this literal set is the dependency-free default and covers the
# co.uk-class domains a mixed crawl actually contains.
PSL_TWO_LEVEL: tuple[str, ...] = tuple(sorted({
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz",
    # Japan
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    # Mexico
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za", "edu.za",
    # Argentina
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "mil.ar", "int.ar",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "bel.tr", "k12.tr",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "ms.kr", "hs.kr", "es.kr", "sc.kr", "kg.kr", "mil.kr",
    # Singapore
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    # Hong Kong
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    # Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "club.tw",
    # Malaysia
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    # Indonesia
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "mil.id", "biz.id", "my.id", "desa.id", "ponpes.id",
    # Philippines
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "i.ph",
    # Vietnam
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # Thailand
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th", "mi.th",
    # Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il", "idf.il",
    "k12.il",
    # Ukraine
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    # Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl",
    # Portugal
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    # Spain
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    # Colombia
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co", "mil.co",
    # Peru
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "nom.pe", "mil.pe",
    # Venezuela
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "info.ve", "web.ve",
    # Uruguay
    "com.uy", "edu.uy", "gub.uy", "net.uy", "org.uy", "mil.uy",
    # Ecuador
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "info.ec",
    "fin.ec", "k12.ec", "med.ec", "pro.ec", "mil.ec",
    # Egypt
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg", "sci.eg",
    # Nigeria
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng", "sch.ng",
    "i.ng", "mobi.ng",
    # Kenya
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    # Ghana
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    # Pakistan
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "fam.pk", "biz.pk",
    "web.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    # Bangladesh
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd", "mil.bd",
    # Sri Lanka
    "com.lk", "org.lk", "edu.lk", "gov.lk", "net.lk", "int.lk", "ngo.lk",
    "soc.lk", "web.lk", "ltd.lk", "assn.lk", "grp.lk", "hotel.lk",
    # Nepal
    "com.np", "org.np", "edu.np", "gov.np", "net.np", "mil.np", "aero.np",
    # Saudi Arabia
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "pub.sa",
    # United Arab Emirates
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    # Russia (PSL ICANN section keeps a few second-level .ru rules)
    "com.ru", "msk.ru", "spb.ru",
    # Greece
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    # Cyprus / Malta-style
    "com.cy", "org.cy", "net.cy", "ac.cy", "gov.cy",
    "com.mt", "edu.mt", "net.mt", "org.mt",
}))


# Vendored MULTI-DEPTH rules beyond the two-label subset (VERDICT r11
# item 4): the publicsuffix.org ICANN-section families where the correct
# registrable domain needs depth>2 resolution or wildcard/exception
# semantics — exactly what the two-label expression cannot express. All
# public knowledge from publicsuffix.org; a deployment can swap in the
# complete snapshot via psl_table(spark, open('public_suffix_list.dat')
# .read().splitlines()) — the resolution path is identical.
PSL_MULTI_RULES: tuple[str, ...] = tuple(
    # Japan geographic: the 47 prefecture second-level suffixes — a
    # `www.pref.aichi.jp`-class government host censuses as
    # `pref.aichi.jp`, a THREE-label registrable the two-label rule
    # truncates to `aichi.jp`.
    sorted(
        f"{p}.jp"
        for p in (
            "aichi akita aomori chiba ehime fukui fukuoka fukushima gifu "
            "gunma hiroshima hokkaido hyogo ibaraki ishikawa iwate kagawa "
            "kagoshima kanagawa kochi kumamoto kyoto mie miyagi miyazaki "
            "nagano nagasaki nara niigata oita okayama okinawa osaka saga "
            "saitama shiga shimane shizuoka tochigi tokushima tokyo "
            "tottori toyama wakayama yamagata yamaguchi yamanashi"
        ).split()
    )
    # Japan designated cities: every label under them is public EXCEPT
    # the city government's own `city.<name>.jp`.
    + sorted(
        f"*.{c}.jp"
        for c in "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama".split()
    )
    + sorted(
        f"!city.{c}.jp"
        for c in "kawasaki kitakyushu kobe nagoya sapporo sendai yokohama".split()
    )
    # Cook Islands: wildcard TLD with the canonical exception.
    + ["*.ck", "!www.ck", "*.bd"]
    # UK schools: any label under sch.uk is public.
    + ["*.sch.uk"]
    # US locality namespace: state 2LDs plus the k12/cc/lib registries.
    + sorted(
        rule
        for st in (
            "ak al ar az ca co ct dc de fl ga hi ia id il in ks ky la ma "
            "md me mi mn mo ms mt nc nd ne nh nj nm nv ny oh ok or pa ri "
            "sc sd tn tx ut va vt wa wi wv wy"
        ).split()
        for rule in (f"{st}.us", f"k12.{st}.us", f"cc.{st}.us", f"lib.{st}.us")
    )
)

# The default full-snapshot rule set: the two-label registry subset plus
# the multi-depth families above. Plain TLD rules (com, uk, jp, ...) are
# intentionally absent — registrable_domain_psl's default rule (`*`,
# last-two-labels fallback) already yields the correct answer for them,
# so listing them would only grow the broadcast table.
DEFAULT_PSL_RULES: tuple[str, ...] = PSL_TWO_LEVEL + PSL_MULTI_RULES


def default_psl_table(spark) -> DataFrame:
    """The vendored-snapshot rule table ``url_components``/``domain_census``
    resolve through by default (VERDICT r11 item 4: a crawl census should
    default to the full-snapshot path). A few hundred rows — broadcast to
    every executor, never shuffled."""
    return psl_table(spark, list(DEFAULT_PSL_RULES))


def registrable_domain_expr(host: Column) -> Column:
    """Registrable domain of an already-cleaned ``host`` column (lowercase,
    no userinfo/port) via the vendored two-label rule subset — one
    array_contains against a plan literal, zero joins/shuffles.

    n>=3 labels whose last TWO form a known public suffix -> last three
    labels; else n>=2 -> last two; else the host itself (single-label
    hosts like ``localhost`` are their own registrable domain)."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffixes = F.array(*[F.lit(s) for s in PSL_TWO_LEVEL])
    return (
        F.when((n >= 3) & F.array_contains(suffixes, last2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def psl_table(spark, rules: "list[str]") -> DataFrame:
    """Materialize raw PSL lines into the rule table the join path
    consumes: comments/empty lines dropped, ``!`` exception rules flagged,
    rules lowercased. Feed it the full publicsuffix.org snapshot (one rule
    per line) for production; tests feed a handful."""
    cleaned = []
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        is_exc = r.startswith("!")
        cleaned.append((r[1:] if is_exc else r, is_exc))
    if not cleaned:
        raise ValueError("empty PSL rule set")
    return spark.createDataFrame(cleaned, "rule string, is_exception boolean")


def registrable_domain_psl(
    df: DataFrame,
    host_col: str,
    psl: DataFrame,
    out_col: str = "registrable_domain",
    max_depth: int = 4,
) -> DataFrame:
    """Full-snapshot PSL resolution: ≤``max_depth`` BROADCAST joins, one
    per candidate suffix depth, each matching both the exact suffix and
    the ``*.``-wildcard form; the deepest match wins (PSL algorithm) and
    an exception match makes the matched name itself registrable. All
    joins are map-side against the broadcast rule table — this operator
    adds NO shuffle to the surrounding plan at any corpus size.

    Depth here counts suffix LABELS: depth d tests the host's last d
    labels against exact rules and its last d labels against wildcard
    rules ``*.<last d-1 labels>``. ``max_depth=4`` covers every ICANN
    rule in the current PSL.
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    # the FULL scratch-column family is reserved (ADVICE r11): cleanup at
    # the end drops exactly these names, so an input column named e.g.
    # "_hit2" or "_w3" would either corrupt the join bookkeeping or be
    # silently dropped — reject it up front like merge_asof does
    scratch = {
        f"{p}{d}"
        for d in range(1, max_depth + 1)
        for p in ("_sfx", "_hit", "_exc", "_w", "_whit")
    }
    reserved = {out_col} | scratch
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"input columns collide with reserved names: {sorted(clash)}")

    labels = F.split(F.col(host_col), "[.]")
    n = F.size(labels)
    out = df
    for d in range(1, max_depth + 1):
        sfx = F.concat_ws(
            ".", *[F.element_at(labels, -(d - i)) for i in range(d)]
        )  # last d labels, left-to-right
        out = out.withColumn(f"_sfx{d}", F.when(n >= d, sfx))
    for d in range(1, max_depth + 1):
        exact = psl.select(
            F.col("rule").alias(f"_sfx{d}"),
            F.lit(True).alias(f"_hit{d}"),
            F.col("is_exception").alias(f"_exc{d}"),
        )
        out = out.join(F.broadcast(exact), f"_sfx{d}", "left")
        if d >= 2:
            wild = psl.filter(F.col("rule").startswith("*.")).select(
                F.expr("substring(rule, 3)").alias(f"_w{d}"),
                F.lit(True).alias(f"_whit{d}"),
            )
            # a wildcard '*.<parent>' makes the last d labels public when
            # the parent is the last d-1 labels
            out = out.withColumn(f"_w{d}", F.col(f"_sfx{d - 1}"))
            out = out.join(F.broadcast(wild), f"_w{d}", "left").withColumn(
                f"_whit{d}",
                F.col(f"_whit{d}") & F.col(f"_sfx{d}").isNotNull(),
            )
    # deepest-match-wins cascade: exception -> the matched name IS the
    # registrable domain; public suffix at depth d -> suffix_{d+1}
    result = None
    for d in range(max_depth, 0, -1):
        exc_hit = F.col(f"_hit{d}").isNotNull() & F.col(f"_exc{d}")
        pub_hit = (F.col(f"_hit{d}").isNotNull() & ~F.col(f"_exc{d}")) | (
            F.coalesce(F.col(f"_whit{d}"), F.lit(False))
            if d >= 2
            else F.lit(False)
        )
        one_more = F.when(
            n >= d + 1,
            F.concat_ws(
                ".", *[F.element_at(labels, -(d + 1 - i)) for i in range(d + 1)]
            ),
        )
        branch = F.when(exc_hit, F.col(f"_sfx{d}")).when(pub_hit, one_more)
        result = branch if result is None else F.coalesce(result, branch)
    # no rule matched: PSL default rule '*' = the TLD itself is public ->
    # registrable is the last two labels (single-label hosts stay as-is)
    fallback = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(F.col(host_col))
    out = out.withColumn(out_col, F.coalesce(result, fallback))
    # drop exactly the scratch names this function added (reserved above) —
    # never a prefix sweep that could eat caller columns
    return out.drop(*[c for c in out.columns if c in scratch])
