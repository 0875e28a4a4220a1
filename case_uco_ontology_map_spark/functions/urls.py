"""URL canonicalization — pure JVM Column expressions (no UDF).

Common-Crawl-scale curation needs a deterministic url → canonical-url key:
the same page arrives as `HTTP://WWW.Example.com/a?utm_source=x&b=2&a=1#f`
and `http://example.com/a?a=1&b=2`, and exact-dedup/fingerprint joins on
the raw string miss the equivalence. The normalizer below applies the
conservative, precisely-specified subset of RFC 3986 + tracker-stripping
that web pipelines actually agree on:

  1. scheme lowercased
  2. host lowercased; one leading ``www.`` stripped; default ports
     (``:80``/``:443``) stripped
  3. fragment dropped
  4. query: tracking params removed (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``), the rest SORTED (byte order) and rejoined; an emptied
     query drops its ``?``
  5. empty path → ``/``

Every rule is a regexp/array expression — whole-stage codegen, ~free per
row at 100 TB, and replayable in ANSI-ish SQL (the contract oracle runs
the identical rules in DuckDB). ``url_host`` / ``url_registered_domain``
feed per-domain grouping (the hot-domain skew key); the registered-domain
cut is the naive last-two-labels rule plus an explicit multi-part-suffix
set — a documented approximation, NOT a full public-suffix list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid)(=.*)?$"

# explicit multi-part suffixes recognized by url_registered_domain —
# extend as needed; anything else uses the last-two-labels rule
MULTIPART_SUFFIXES = ("co.uk", "com.au", "co.jp", "com.br", "co.in")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with one leading www. and any default port
    stripped (the userinfo@ prefix, rare in crawls, is also dropped)."""
    authority = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    no_user = F.regexp_replace(authority, r"^[^@]*@", "")
    no_port = F.regexp_replace(no_user, r":(80|443)$", "")
    return F.regexp_replace(no_port, r"^www\.", "")


def host_registered_domain(host: Column) -> Column:
    """Registered domain of an ALREADY-normalized host (``url_host``
    output): last two labels, or three when the last two form a known
    multi-part suffix (MULTIPART_SUFFIXES). Approximation documented in
    the module header."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_multi = last2.isin(*MULTIPART_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def url_registered_domain(url: Column) -> Column:
    """``host_registered_domain`` over the url's normalized host."""
    return host_registered_domain(url_host(url))


def _normalized_query(url: Column) -> Column:
    """Sorted, tracker-stripped query string ('' when nothing survives)."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.concat_ws("&", F.array_sort(params))


def url_normalize(url: Column) -> Column:
    """The canonical-url key (rules 1-5 in the module header). Input must
    carry an explicit scheme; rows without one pass through with only
    fragment/query handling skipped (no scheme → no authority split)."""
    scheme = url_scheme(url)
    host_raw = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(
        F.regexp_replace(host_raw, r"^[^@]*@", ""), r":(80|443)$", ""
    )
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = _normalized_query(url)
    return F.when(
        scheme == "",
        url,
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def host_suffixes(host: Column, max_labels: int = 10) -> Column:
    """All dot-suffixes of a host, longest first bounded at
    ``max_labels``: ``a.b.c`` → ``[a.b.c, b.c, c]`` — the key set a
    domain-blocklist join matches against (an entry blocks itself and
    every subdomain). Pure JVM array expressions."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    ks = F.sequence(F.least(n, F.lit(max_labels)), F.lit(1), F.lit(-1))
    return F.transform(
        ks, lambda k: F.concat_ws(".", F.slice(labels, n - k + 1, k))
    )


def blocklist_hits(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Rows of ``df`` whose url host falls under a blocked domain
    (UT1-style curation list semantics: an entry blocks the exact host
    and every subdomain). Returns ``(url_col, matched_domain)`` distinct.

    Scale shape: the suffix chain (≤ ~6 entries/host) explodes map-side
    and meets the blocklist in a BROADCAST equi-join — blocklists are
    10^4–10^6 rows, never the corpus — so no url ever crosses a shuffle
    here; the distinct dedups hosts matching several entries."""
    sfx = df.select(
        F.col(url_col).alias("_url"),
        F.explode(host_suffixes(url_host(F.col(url_col)))).alias("_sfx"),
    )
    b = F.broadcast(
        blocked.select(F.col(domain_col).alias("_sfx")).distinct()
    )
    return (
        sfx.join(b, on="_sfx")
        .select(
            F.col("_url").alias(url_col),
            F.col("_sfx").alias("matched_domain"),
        )
        .distinct()
    )


def blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop every row whose url host is the blocked domain or one of its
    subdomains — one broadcast suffix join + one anti-join on the url."""
    hits = blocklist_hits(df, blocked, url_col, domain_col).select(url_col)
    return df.join(hits.distinct(), on=url_col, how="left_anti")
