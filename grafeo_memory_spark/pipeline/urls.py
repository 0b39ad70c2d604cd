"""URL / domain curation for web corpora (RefinedWeb/CCNet-style):
parse, canonicalize, registered-domain extraction, domain allow/block
filtering, and URL-level dedup keys.

All pure Column codegen (regexp + string builtins — no Python in the
scan path), so at 100 TB each op is a map over the corpus: the only
shuffle any of these introduce is the groupBy inside
``domain_stats``, keyed on registered domain (web corpora have
millions of domains — a healthy aggregation key; the hot-domain skew
a crawl exhibits is partial-aggregated map-side before the shuffle).

Canonicalization contract of :func:`normalize_url` (the common
crawl-dedup form):

- scheme and host lowercased; ``www.`` prefix dropped from the host
- default ports (``:80`` http, ``:443`` https) dropped
- fragment dropped
- tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_cid``, ``mc_eid``, ``igshid``, ``ref``); an
  emptied query string loses its ``?``
- trailing ``/`` dropped from a non-root path

Registered-domain extraction uses a compact public-suffix heuristic
(exact two labels, or three when the middle label is a known
second-level registry under a two-letter ccTLD — ``co.uk`` family).
The full Public Suffix List is a data file, not an algorithm change:
``SECOND_LEVEL_SUFFIXES`` is the injection point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAMS",
    "SECOND_LEVEL_SUFFIXES",
    "url_host",
    "normalize_url",
    "url_dedup_key",
    "registered_domain",
    "filter_domains",
    "filter_domains_table",
    "domain_stats",
]

#: query parameters stripped by normalize_url (analytics/click IDs)
TRACKING_PARAMS = [
    "utm_[a-z]+",
    "gclid",
    "fbclid",
    "msclkid",
    "mc_cid",
    "mc_eid",
    "igshid",
    "ref",
]

#: second-level registry labels that pull one extra label into the
#: registered domain when under a 2-letter ccTLD (co.uk, com.au, ...)
SECOND_LEVEL_SUFFIXES = ["ac", "co", "com", "edu", "gov", "net", "org"]

_HOSTPORT_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host (no port, no credentials) of an absolute URL;
    NULL when the value has no ``scheme://`` prefix."""
    hostport = F.regexp_extract(F.lower(_c(col)), _HOSTPORT_RE, 1)
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^[^@]*@", ""), r":\d+$", ""
    )
    return F.when(host != "", host)


def normalize_url(col: Column | str) -> Column:
    """Canonical URL string per the module contract; NULL for
    non-absolute input. Pure codegen: a regexp cascade, no UDF."""
    u = F.trim(_c(col))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://(.*)$", 1)
    # split off fragment first (dropped), then query
    rest = F.regexp_replace(rest, r"#.*$", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(
        F.regexp_replace(hostport, r"^[^@]*@", ""), r":\d+$", ""
    )
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    # drop tracking params wherever they sit in the & list
    for p in TRACKING_PARAMS:
        query = F.regexp_replace(query, rf"(^|&){p}=[^&]*", "$1")
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        keep_port,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when((scheme != "") & (host != ""), out)


def url_dedup_key(col: Column | str) -> Column:
    """md5 of the canonical URL — the URL-level exact-dedup key
    (pre-content dedup on crawl frontiers); NULL propagates."""
    return F.md5(normalize_url(col))


def registered_domain(col: Column | str, *, is_host: bool = False) -> Column:
    """Registrable domain of a URL (or bare host with
    ``is_host=True``): last two labels, or last three under the
    ``co.uk``-family suffixes. Single-label hosts (``localhost``)
    return as-is; NULL input/unparseable URLs stay NULL."""
    host = _c(col) if is_host else url_host(col)
    host = F.lower(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tld = F.element_at(labels, -1)
    second = F.element_at(labels, -2)
    sl = F.array(*[F.lit(s) for s in SECOND_LEVEL_SUFFIXES])
    take3 = (
        (n >= 3)
        & (F.length(tld) == 2)
        & F.array_contains(sl, second)
    )
    last2 = F.concat_ws(".", second, tld)
    last3 = F.concat_ws(".", F.element_at(labels, -3), second, tld)
    return F.when(host.isNull(), F.lit(None)).when(
        n <= 1, host
    ).when(take3, last3).otherwise(last2)


def filter_domains(
    df: DataFrame,
    url_col: str,
    domains: list[str],
    *,
    mode: str = "block",
) -> DataFrame:
    """Drop (``mode='block'``) or keep (``mode='allow'``) rows whose
    registered domain is in ``domains``. The list is an inlined literal
    array — driver-sized, shipped with the plan (no join, no shuffle);
    rows with unparseable URLs are dropped in allow mode and kept in
    block mode (NULL never matches a blocklist)."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    dom = registered_domain(F.col(url_col))
    wanted = F.array(*[F.lit(d.lower()) for d in domains])
    hit = F.array_contains(wanted, dom)
    if mode == "block":
        return df.where(~F.coalesce(hit, F.lit(False)))
    return df.where(F.coalesce(hit, F.lit(False)))


def filter_domains_table(
    df: DataFrame,
    url_col: str,
    domains: DataFrame,
    *,
    mode: str = "block",
    broadcast: bool = True,
) -> DataFrame:
    """Table-driven twin of :func:`filter_domains` for blocklists too
    large to inline as a plan literal (a production crawl blocklist is
    millions of domains). ``domains`` carries one lowercase ``domain``
    column; the corpus side computes its registered domain map-side
    and the membership test is a broadcast semi-join (``allow``) /
    anti-join (``block``) — the corpus is never shuffled either way.
    NULL domains (unparseable URLs) keep filter_domains' semantics:
    dropped in allow mode, kept in block mode (an anti-join keeps
    NULL-keyed rows by construction). Blocklists past broadcast size
    (~hundreds of MB): pass ``broadcast=False`` — the join becomes a
    plain semi/anti shuffle join keyed on domain, which only shuffles
    the corpus's join key plus surviving payload columns after column
    pruning (still never a corpus-payload hash repartition)."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    dom = registered_domain(F.col(url_col))
    lst = domains.select(F.lower(F.col("domain")).alias("_block_dom")).distinct()
    if broadcast:
        lst = F.broadcast(lst)
    # Collision-proof staging column: the join key must not silently
    # shadow (and then drop) a caller column of the same name.
    key = "_dom"
    while key in df.columns:
        key += "_"
    keyed = df.withColumn(key, dom)
    joined = keyed.join(
        lst,
        keyed[key] == lst["_block_dom"],
        "left_semi" if mode == "allow" else "left_anti",
    )
    return joined.drop(key)


def domain_stats(
    df: DataFrame,
    url_col: str,
    *,
    domain_col: str | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain rollup: page count and distinct canonical
    URLs — the crawl-curation audit table (over-represented domains →
    candidates for per-key caps via ``sampling.take_per_key``). One
    shuffle on the domain key. Callers that already materialized the
    canonicalization cascade pass ``domain_col``/``key_col`` so the
    regexp chain is not re-evaluated per consumer (r9)."""
    dom = (
        F.col(domain_col)
        if domain_col
        else registered_domain(F.col(url_col))
    )
    key = F.col(key_col) if key_col else url_dedup_key(F.col(url_col))
    return (
        df.select(dom.alias("domain"), key.alias("key"))
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("key").alias("n_urls"),
        )
    )
