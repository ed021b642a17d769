"""URL column expressions for web-corpus curation: host extraction,
registered-domain (eTLD+1) heuristic, and URL canonicalization.

Everything is pure Catalyst regex/array arithmetic — no UDF, no parsing
library — for the same reason as the scalar family (functions/scalar.py):
the expressions stay inside whole-stage codegen at 100 TB, and any SQL
engine can reproduce the result exactly for auditing (the DuckDB oracle
mirrors these recipes verbatim in q34).

The registered-domain heuristic carries a small built-in list of common
two-level public suffixes rather than the full Public Suffix List: the PSL
is a moving external artifact, and for dedup/blocklist grouping the penalty
for an unlisted two-level suffix is only a slightly-too-coarse group. Pass
``extra_suffixes`` where a corpus needs more.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Common second-level public suffixes (grouping heuristic, not the PSL).
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "sch.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "com.br", "com.mx", "com.ar", "com.tr", "com.cn", "com.tw",
    "com.sg", "com.hk", "com.my",
    "co.in", "co.za", "co.kr", "co.id", "co.th",
)

#: Query-parameter names dropped by canonical_url: tracking/session noise
#: whose presence makes byte-identical pages look distinct to exact dedup.
_TRACKING_KEYS = (r"utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|mc_cid"
                  r"|ref|ref_src|igshid|spm")
#: Matches one whole tracking parameter (with its leading separator) inside
#: a query string; '(?=&|$)' keeps 'ref' from eating 'referer=x'.
TRACKING_PARAM_RE = rf"(^|&)({_TRACKING_KEYS})(=[^&]*)?(?=&|$)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str, strip_www: bool = True) -> Column:
    """Lowercased host from an absolute URL: authority minus userinfo and
    port, optionally minus a leading ``www.``; a trailing FQDN dot
    (``example.com.``) is canonicalized away — it denotes the same host,
    and the empty last label would otherwise corrupt registered_domain's
    label arithmetic (every ``x.com.`` host would group under ``com.``).
    NULL when the value has no ``scheme://host`` shape (relative links,
    garbage)."""
    u = F.regexp_replace(_c(col), "#.*", "")
    auth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    host = F.lower(F.regexp_replace(F.regexp_replace(auth, "^[^@]*@", ""),
                                    ":[0-9]*$", ""))
    host = F.regexp_replace(host, r"\.$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return F.when(host != "", host)


def registered_domain(host: Column | str,
                      extra_suffixes: Iterable[str] = ()) -> Column:
    """eTLD+1 grouping key from a host: last two labels, or last three when
    the final two form a known second-level public suffix (``co.uk`` →
    ``example.co.uk``). Single-label hosts (``localhost``) pass through.

    This is the leakage/blocklist boundary for web corpora — subdomains of
    one registrant (cdn.example.com, blog.example.com) collapse to one key,
    which is what dataset_split/filter_domains should be keyed on."""
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(".", F.element_at(parts, -3), F.element_at(parts, -2),
                        F.element_at(parts, -1))
    suffixes = list(SECOND_LEVEL_SUFFIXES) + list(extra_suffixes)
    return (
        F.when(h.isNull() | (n <= 1), h)
        .when((n >= 3) & last2.isin(suffixes), last3)
        .otherwise(last2)
    )


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an absolute URL for exact/URL-level dedup:

    - fragment stripped;
    - scheme and host lowercased; userinfo, ``www.`` and the scheme's OWN
      default port (``:80`` for http, ``:443`` for https) dropped;
    - trailing slashes trimmed off the path;
    - tracking query parameters (``TRACKING_PARAM_RE``) removed and the
      survivors SORTED, so parameter order never splits a dedup group.

    NULL when the value has no ``scheme://host`` shape. Any other port is
    preserved — including ``http://host:443`` and ``https://host:80``,
    which are NON-default for their scheme and address a different origin
    than the portless URL."""
    raw = _c(col)
    u = F.regexp_replace(raw, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTHORITY_RE, 1)
    hostport = F.lower(F.regexp_replace(auth, "^[^@]*@", ""))
    hostport = (F.when(scheme == "http",
                       F.regexp_replace(hostport, ":80$", ""))
                .when(scheme == "https",
                      F.regexp_replace(hostport, ":443$", ""))
                .otherwise(hostport))
    # same FQDN-dot canonicalization as url_host, handling the form with
    # a retained non-default port ('example.com.:8080')
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    hostport = F.regexp_replace(hostport, r"\.(:\d+)?$", "$1")
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    # Tracking-param removal and cleanup run at STRING level (regex chain),
    # not as a higher-order filter(lambda): HOF lambdas are CodegenFallback
    # — interpreted per element — and measurably dominate this function's
    # cost. Only the final sort touches an array, via sort_array (a plain
    # expression, no lambda).
    q1 = F.regexp_replace(query, TRACKING_PARAM_RE, "")
    q2 = F.regexp_replace(F.regexp_replace(q1, "&&+", "&"), "^&+|&+$", "")
    qs = F.array_join(F.sort_array(F.split(q2, "&")), "&")
    out = F.concat(
        scheme, F.lit("://"), hostport, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")))
    return F.when((scheme != "") & (hostport != ""), out)
