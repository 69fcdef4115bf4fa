"""URL canonicalization + host keys (beyond-reference; r12 VERDICT ask #5).

CommonCrawl-style corpus pipelines key nearly everything on a
canonical URL / host: per-host crawl stats, host-level dedup and
quality priors, URL-based decontamination. The reference has no URL
handling at all; this module adds the canonicalizer as PURE Catalyst
expression work — regexp_extract/replace, a higher-order filter +
array_sort over the query params — so normalization fuses into the
scan projection, and host aggregation is one host-keyed agg (the only
shuffle a per-host report needs at 100 TB).

Canonical form (each step an explicit, engine-portable rule):
- fragment dropped;
- scheme lowercased; host lowercased, leading ``www.`` stripped;
- default ports removed (``:80`` http, ``:443`` https), other ports
  kept;
- path: runs of ``/`` collapsed, trailing ``/`` stripped, empty path
  becomes ``/``;
- query: params split on ``&``, empties and tracking params
  (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``) dropped, the rest
  byte-order sorted (both engines compare strings as binary UTF-8)
  and re-joined;
- no scheme or no host ⇒ NULL (not a normalizable absolute URL).

Every rule has a verbatim DuckDB twin in :func:`normalize_url_sql`
(same RE2-safe patterns — no backreferences, backslashes shipped
verbatim per the CLAUDE.md escaping rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid)="


def _base(col: Column) -> Column:
    return F.regexp_replace(col, "#.*", "")


def url_scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(_base(col), _SCHEME_RE, 1))


def url_host(col: Column) -> Column:
    """Lowercased host, port and leading www. removed; '' if absent."""
    hostport = F.regexp_extract(_base(col), _HOSTPORT_RE, 1)
    host = F.lower(F.regexp_replace(hostport, ":[0-9]*$", ""))
    return F.regexp_replace(host, r"^www\.", "")


def _port_part(col: Column) -> Column:
    hostport = F.regexp_extract(_base(col), _HOSTPORT_RE, 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    scheme = url_scheme(col)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    return F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))


def url_path(col: Column) -> Column:
    """Slash-collapsed, trailing-slash-stripped path; '/' when empty."""
    p = F.regexp_extract(_base(col), _PATH_RE, 1)
    p = F.regexp_replace(p, "/{2,}", "/")
    p = F.regexp_replace(p, "/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_query(col: Column) -> Column:
    """Tracking-stripped, byte-order-sorted query string ('' if none)."""
    q = F.regexp_extract(_base(col), r"\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    return F.array_join(F.array_sort(params), "&")


def normalize_url(col: Column) -> Column:
    """The canonical URL, or NULL when `col` is not an absolute URL
    (missing scheme or host) — one fused projection, no Python."""
    scheme, host = url_scheme(col), url_host(col)
    q = url_query(col)
    return F.when(
        (scheme == "") | (host == ""), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            _port_part(col),
            url_path(col),
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        )
    )


def normalize_url_sql(expr: str) -> dict[str, str]:
    """DuckDB twins over an arbitrary URL SQL expression: the same
    patterns, the same rules. Returns exprs for 'url_norm' and
    'host'."""
    base = f"regexp_replace({expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        f"regexp_extract({base}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)"
    )
    host = (
        r"regexp_replace(lower(regexp_replace("
        + hostport
        + r", ':[0-9]*$', '')), '^www\.', '')"
    )
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} = '' OR ({scheme} = 'http' AND {port} = '80') "
        f"OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    raw_path = (
        f"regexp_extract({base}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1)"
    )
    path = (
        f"CASE WHEN regexp_replace(regexp_replace({raw_path}, '/{{2,}}', '/', "
        f"'g'), '/+$', '') = '' THEN '/' ELSE "
        f"regexp_replace(regexp_replace({raw_path}, '/{{2,}}', '/', 'g'), "
        f"'/+$', '') END"
    )
    q = (
        "list_aggregate(list_sort(list_filter(string_split("
        + f"regexp_extract({base}, '\\?(.*)$', 1), '&'), "
        + "p -> p <> '' AND NOT regexp_matches(p, "
        + "'^(utm_[a-z]+|fbclid|gclid|msclkid)=')), 'ASC'), "
        + "'string_agg', '&')"
    )
    # list_sort default + string_agg over empty list -> NULL: coalesce
    q_part = (
        f"CASE WHEN coalesce({q}, '') = '' THEN '' ELSE '?' || {q} END"
    )
    url_norm = (
        f"CASE WHEN {scheme} = '' OR {host} = '' THEN NULL "
        f"ELSE {scheme} || '://' || {host} || {port_part} || {path} "
        f"|| {q_part} END"
    )
    return {"url_norm": url_norm, "host": host}
