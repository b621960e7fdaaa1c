"""URL/domain-level corpus curation — registered-domain extraction,
per-domain rollups, and domain blocklist gates.

Beyond-reference pipeline tier (C4 / RefinedWeb / Gopher-style web
curation operates per registered domain: dedup budgets, quality priors,
and blocklists are all keyed by eTLD+1, not by raw host). Everything
here is built-in string/array expressions — host parsing and suffix
matching are pure per-row Catalyst exprs (zero shuffles, scan speed);
only the rollup aggregates shuffle, and those are map-side-combinable
counts keyed by the ~millions-of-domains key space, never by document.

Registered-domain semantics: the host's last label pair, except when
that pair is a known multi-label public suffix (``co.uk`` and friends),
in which case one more label is kept. The built-in suffix set is the
pragmatic high-traffic subset of the Public Suffix List — pass
``extra_suffixes`` to extend it (the full PSL is a data file, not an
algorithm; production deployments broadcast-join their own copy).
IPv4 hosts are their own registered domain.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: high-traffic multi-label public suffixes (PSL subset; extensible)
MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "co.za", "org.za",
    "com.mx", "com.ar", "com.tr", "com.tw", "com.sg", "com.hk",
    "co.nz", "org.nz",
]

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://"
_HOST_RE = r"^(?:[^/?#@]*@)?([^/:?#]+)"
_IPV4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def host_of(url: Column) -> Column:
    """Lower-cased host of a URL (userinfo and port stripped; trailing
    dot normalized away). Scheme-less input (``www.example.com/x``) is
    treated as a bare host+path — real crawl metadata routinely drops
    the scheme, and silently yielding ``''`` would let such rows bypass
    every domain gate downstream. Truly host-less strings (``/path``,
    ``://x``) still yield ``''``, which :func:`domain_blocklist` flags
    rather than passes."""
    stripped = F.regexp_replace(url, _SCHEME_RE, "")
    h = F.lower(F.regexp_extract(stripped, _HOST_RE, 1))
    return F.regexp_replace(h, r"\.$", "")


def registered_domain(
    host: Column, extra_suffixes: Optional[Iterable[str]] = None
) -> Column:
    """eTLD+1 of a host column (see module docstring for semantics).

    Hosts with fewer than 2 labels (e.g. ``localhost``) and IPv4
    literals return themselves.
    """
    suffixes = sorted(set(MULTI_LABEL_SUFFIXES) | set(extra_suffixes or []))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(host.rlike(_IPV4_RE), host)
        .when(n <= 2, host)
        .when(last2.isin(suffixes), last3)
        .otherwise(last2)
    )


def extract_domains(
    docs: DataFrame,
    url_col: str = "url",
    extra_suffixes: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(doc_id, host, domain) — host + registered domain per document.

    Pure per-row expressions: at 100 TB this is scan speed, and the
    ``domain`` column is the curation key every downstream rollup,
    blocklist, and per-domain dedup budget groups on.
    """
    h = host_of(F.col(url_col))
    return docs.select(
        "doc_id",
        h.alias("host"),
        registered_domain(h, extra_suffixes).alias("domain"),
    )


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    extra_suffixes: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(domain, n_docs, n_tokens, doc_share) — per-registered-domain
    corpus rollup: document count, whitespace-token total, and the
    domain's share of all documents.

    The table every web-curation report starts from (C4's per-domain
    counts, RefinedWeb's domain concentration audit). One
    map-side-combinable groupBy on the domain key; the share division
    uses a broadcast scalar, not a second shuffle. Exact integers until
    the final rounded division.
    """
    from kafka_graphs_spark.pipeline.text import tokens

    h = host_of(F.col(url_col))
    per = docs.select(
        registered_domain(h, extra_suffixes).alias("domain"),
        F.size(tokens(F.col(text_col))).cast("long").alias("_t"),
    )
    from pyspark.sql.window import Window

    agg = per.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_t").cast("long").alias("n_tokens"),
    )
    # corpus total via a window over the ALREADY-aggregated per-domain
    # frame: one corpus scan total (a broadcast-join formulation would
    # re-execute the aggregation subplan — Spark does not dedupe common
    # subtrees — and a docs.count() branch would re-scan the corpus).
    # The unpartitioned window funnels only the per-domain rows (one row
    # per registered domain) through one task — fine up to ~100M
    # domains, far beyond any real web corpus.
    total = F.sum("n_docs").over(Window.partitionBy())
    return agg.select(
        "domain",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs").cast("double") / total, 6).alias(
            "doc_share"
        ),
    )


def domain_quality_profile(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    extra_suffixes: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(domain, score, n_docs) — per-registered-domain histogram of the
    heuristic quality score (C4-style domain quality audit: which
    domains ship high/low-quality text).

    ONE pass: domain extraction and the quality expressions are computed
    in the same projection (no self-join of two corpus scans), then one
    map-side-combinable groupBy on (domain, score). The score is a sum
    of band constants, so grouping on it is exact; counts are exact
    ints.
    """
    from kafka_graphs_spark.pipeline.text import quality_exprs

    h = host_of(F.col(url_col))
    _, _, _, score = quality_exprs(text_col)
    per = docs.select(
        registered_domain(h, extra_suffixes).alias("domain"),
        score.alias("score"),
    )
    return per.groupBy("domain", "score").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


#: query parameters that never change page content — the C4/RefinedWeb
#: canonicalization strip set (prefix-matched for the ``utm_`` family)
TRACKING_PARAMS = [
    "gclid", "fbclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "referrer", "source", "spm", "yclid", "_ga",
]


def canonical_url(url: Column, extra_params: Optional[Iterable[str]] = None) -> Column:
    """Canonical form of a URL for URL-level deduplication — the
    pre-content-dedup key C4/RefinedWeb-style pipelines group on before
    any shingling happens (URL dedup removes the bulk of crawl
    duplicates at scan cost; content dedup then only pays for what's
    left).

    Rules (all pure per-row Catalyst expressions — zero shuffles):

    - scheme dropped (``http``/``https`` mirrors collapse), userinfo and
      port dropped, host lower-cased, one leading ``www.`` stripped;
    - fragment dropped; trailing ``index.html``/``index.htm``/
      ``index.php``/``default.asp(x)`` dropped; duplicate slashes
      collapsed; trailing slash dropped;
    - tracking parameters removed — the ``utm_*`` family by prefix plus
      :data:`TRACKING_PARAMS` (extend with ``extra_params``) — and the
      surviving query parameters SORTED so ``?a=1&b=2`` and ``?b=2&a=1``
      collapse; an emptied query string drops its ``?``.

    Path case is preserved (paths are case-sensitive; hosts aren't).
    Host-less input canonicalizes to ``''`` — feed it to
    :func:`url_dedup`, which refuses to merge host-less rows.
    """
    drop = {str(p).lower() for p in TRACKING_PARAMS}
    drop |= {str(p).lower() for p in (extra_params or [])}
    stripped = F.regexp_replace(url, _SCHEME_RE, "")
    host = F.regexp_replace(host_of(url), r"^www\.", "")
    # everything after the authority, fragment dropped
    rest = F.regexp_replace(stripped, r"^[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(
        path, r"/(index\.html?|index\.php|default\.aspx?)$", "/"
    )
    path = F.regexp_replace(path, r"/$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).startswith("utm_")
        & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).isin(sorted(drop)),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.when(host == "", F.lit("")).otherwise(
        F.concat(
            host,
            path,
            F.when(canon_q == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), canon_q)
            ),
        )
    )


def canonicalize_urls(
    docs: DataFrame,
    url_col: str = "url",
    extra_params: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(doc_id, url, canonical_url) — per-document canonical URL key."""
    return docs.select(
        "doc_id",
        F.col(url_col).alias("url"),
        canonical_url(F.col(url_col), extra_params).alias("canonical_url"),
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    extra_params: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(doc_id, canonical_url, keep) — URL-level deduplication: one
    document survives per canonical URL (the lowest doc_id — stable,
    engine-portable tie-break), the rest are flagged ``keep = false``.
    Host-less rows (canonical key ``''``) are never merged with each
    other: an unparseable URL is no evidence two documents are the same
    page, so each keeps itself.

    ONE shuffle keyed by canonical URL (a min-aggregate with map-side
    combine, then an equi-join back) — at 100 TB this is the cheap gate
    that runs BEFORE shingle-based content dedup and typically removes
    the bulk of crawl duplicates at a fraction of the cost.
    """
    canon = canonicalize_urls(docs, url_col, extra_params)
    winners = (
        canon.filter(F.col("canonical_url") != "")
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    return (
        canon.join(winners, on="canonical_url", how="left")
        .select(
            "doc_id",
            "canonical_url",
            (
                F.col("_keep_id").isNull()  # host-less: keeps itself
                | (F.col("doc_id") == F.col("_keep_id"))
            ).alias("keep"),
        )
    )


def domain_blocklist(
    docs: DataFrame,
    blocked: Sequence[str],
    url_col: str = "url",
) -> DataFrame:
    """(doc_id, host, matched_domain, keep) — C4-style domain blocklist
    gate: a document is blocked when its host IS a blocked domain or is
    a subdomain of one (label-boundary suffix match, so ``news.com``
    never blocks ``fakenews.com``). Rows are never dropped — emit
    flags, keep rejects auditable (same contract as
    :func:`~kafka_graphs_spark.pipeline.text.blocklist_filter`).

    Rows whose URL yields no host at all get ``keep = NULL`` (not
    ``True``): a malformed URL can't be cleared by a domain gate, and a
    safety filter must surface the bypass rather than silently pass it
    (``curate(blocked_domains=...)`` and any boolean filter treat NULL
    as not-keep).

    The blocklist is compiled into the plan (fine for the typical
    thousands-of-domains list; for very large lists broadcast-join a
    domain table against :func:`extract_domains` output instead). Zero
    shuffles.
    """
    h = host_of(F.col(url_col))
    matched = F.lit(None).cast("string")
    # most-specific entry wins (label count desc, then name) so
    # matched_domain is deterministic under overlapping blocklist entries
    entries = sorted(
        {str(x).lower().strip(".") for x in blocked},
        key=lambda b: (-b.count("."), b),
    )
    for b in reversed(entries):
        hit = (h == F.lit(b)) | h.endswith("." + b)
        matched = F.when(hit, F.lit(b)).otherwise(matched)
    return docs.select(
        "doc_id",
        h.alias("host"),
        matched.alias("matched_domain"),
        F.when(h == "", F.lit(None).cast("boolean"))
        .otherwise(matched.isNull())
        .alias("keep"),
    )


def domain_token_budget(
    docs: DataFrame,
    max_tokens: int,
    url_col: str = "url",
    text_col: str = "text",
    salt: str = "dombudget",
    extra_suffixes: Optional[Iterable[str]] = None,
) -> DataFrame:
    """(doc_id, domain, n_tokens, cum_before, keep) — RefinedWeb-style
    per-registered-domain token budget: within each domain, documents
    are ranked in deterministic hash order (engine-portable
    ``hash_fraction``, ties by doc_id) and kept while the token mass of
    the PRECEDING kept-candidates stays under ``max_tokens``
    (``keep = cum_before < max_tokens``). The exclusive cumsum means
    every domain keeps at least one document and overshoots the budget
    by at most one document — the "no domain dominates the mixture"
    rule keyed by eTLD+1 instead of the source label, applied by token
    mass rather than document count (a domain of a few huge pages caps
    the same as one of many small pages).

    Host-less documents (registered domain ``''``) are kept
    unconditionally — an unparseable URL attributes no token mass to
    any domain (the :func:`url_dedup` host-less policy). Rows are never
    dropped: flags + the audit columns come back for every input row.

    Scale shape: per-row domain extraction + token count at scan speed,
    then ONE shuffle keyed by domain; the window carries a running sum
    only (O(1) state per task). A single pathologically hot domain
    sorts within one task — the same honest bound as
    :func:`~kafka_graphs_spark.pipeline.sample.cap_per_group`; a corpus
    that is mostly ONE domain should budget it with the two-level
    cumsum of :func:`~kafka_graphs_spark.pipeline.shards.assign_shards`
    instead.
    """
    from pyspark.sql.window import Window

    from kafka_graphs_spark.pipeline.sample import hash_fraction
    from kafka_graphs_spark.pipeline.text import tokens

    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    h = host_of(F.col(url_col))
    per = docs.select(
        "doc_id",
        registered_domain(h, extra_suffixes).alias("domain"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("domain")
        .orderBy(hash_fraction(F.col("doc_id"), salt).asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return per.select(
        "doc_id",
        "domain",
        "n_tokens",
        cum_before.alias("cum_before"),
        (
            (F.col("domain") == "")
            | (cum_before < F.lit(int(max_tokens)))
        ).alias("keep"),
    )
