"""URL canonicalization — the dedup-identity normalizer the reference
lacks (its key is the raw url string, model/CrawlDatum.java:239-245, so
`HTTP://Host/` and `http://host/` crawl twice). At 10^10-frontier scale
aliased URLs multiply the frontier and defeat the URL-seen filter, so
the graft adds an opt-in canonical form used as the CrawlDatum `key`
while the raw `url` is preserved for fetching.

Rules (the common crawl-canonicalization core, all order-independent):
  * scheme and host lowercased (path case preserved — it is significant)
  * default port stripped (`:80` for http, `:443` for https)
  * fragment dropped
  * empty path -> "/"
  * query parameters sorted bytewise (`?b=2&a=1` == `?a=1&b=2`)

Three mirrored implementations, kept in lockstep by tests:
  * `canonical_url_col` — pure JVM built-ins (regexp + array_sort), the
    hot path: stays inside whole-stage codegen, no Python worker.
  * `canonicalize_url` — plain Python twin for driver-side use and the
    replay oracle.
  * `CANON_SQL_TEMPLATE` — the DuckDB rendering used by the registry
    oracle (`url_canonicalize`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"://([^/?#]*)"
_PATH_RE = r"://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#]*\?([^#]*)"


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute URL as a JVM expression.

    Non-absolute inputs (relative links, mailto:, javascript:) pass
    through unchanged, exactly like the Python twin — without the guard
    every such string would collapse to the same garbage key and
    distinct links would dedup into one frontier row.

    Intentional divergence from RFC 3986: the WHOLE authority is
    case-folded, including any userinfo component (which the RFC says
    is case-sensitive) — so http://User@h/ and http://user@h/ collapse
    to one frontier key. For dedup identity this is the desired
    behavior (the same resource should not be crawled twice because a
    link embedded credentials in a different case); userinfo URLs are
    vanishingly rare in crawl frontiers and fetching strips the
    userinfo anyway. All three twins (this column expression, the
    Python `canonicalize_url`, and the `url_canonicalize` oracle SQL)
    share the rule, so the invariant is mutually consistent."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )
    return F.when(url.rlike(_SCHEME_RE), canon).otherwise(url)


def canonicalize_url(url: str) -> str:
    """Plain-Python twin of `canonical_url_col` (identical rules)."""
    import re

    m = re.match(_SCHEME_RE, url)
    if not m:
        return url  # not an absolute URL; leave untouched
    scheme = m.group(1).lower()
    auth = re.search(_AUTH_RE, url)
    auth = auth.group(1).lower() if auth else ""
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    pm = re.search(_PATH_RE, url)
    path = pm.group(1) if pm else ""
    if path == "":
        path = "/"
    qm = re.match(_QUERY_RE, url)
    query = qm.group(1) if qm else ""
    out = f"{scheme}://{auth}{path}"
    if query:
        out += "?" + "&".join(sorted(query.split("&")))
    return out


# DuckDB rendering of the same rules; `{u}` is the raw-URL SQL expression.
# Assumes absolute URLs (the registry query constructs them); it has no
# pass-through branch for non-absolute inputs.
CANON_SQL_TEMPLATE = """
    lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) || '://' ||
    CASE lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      WHEN 'http'  THEN regexp_replace(lower(regexp_extract({u}, '://([^/?#]*)', 1)), ':80$', '')
      WHEN 'https' THEN regexp_replace(lower(regexp_extract({u}, '://([^/?#]*)', 1)), ':443$', '')
      ELSE lower(regexp_extract({u}, '://([^/?#]*)', 1)) END ||
    CASE WHEN regexp_extract({u}, '://[^/?#]*([^?#]*)', 1) = '' THEN '/'
         ELSE regexp_extract({u}, '://[^/?#]*([^?#]*)', 1) END ||
    CASE WHEN regexp_extract({u}, '^[^#]*\\?([^#]*)', 1) = '' THEN ''
         ELSE '?' || array_to_string(list_sort(string_split(
                  regexp_extract({u}, '^[^#]*\\?([^#]*)', 1), '&')), '&') END
"""


_HEX_RUN = r"[0-9a-f]{16,}"
_DIGIT_RUN = r"[0-9]+"


def url_template_col(url: Column) -> Column:
    """Path+query template of an absolute URL as a JVM expression:
    scheme://authority stripped, long hex runs (session ids, digests)
    collapsed to `{H}` FIRST, then digit runs to `{D}` — the collapse
    crawl-trap detection groups by (plans/queries.py
    `url_trap_templates`; Manku-era trap heuristics all reduce to
    template cardinality). Hex before digits, or every hex run with a
    digit in it would be shredded into `{D}x{D}...` fragments and the
    same session-id space would fan out into many templates."""
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    raw = F.concat(
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.regexp_replace(
        F.regexp_replace(raw, _HEX_RUN, "{H}"), _DIGIT_RUN, "{D}"
    )


def url_template(url: str) -> str:
    """Plain-Python twin of `url_template_col` (identical rules) — for
    the picklable per-link NextFilter seam (operators/traps.py)."""
    import re

    pm = re.search(_PATH_RE, url)
    path = pm.group(1) if pm else ""
    if path == "":
        path = "/"
    qm = re.match(_QUERY_RE, url)
    query = qm.group(1) if qm else ""
    raw = path + ("?" + query if query else "")
    return re.sub(_DIGIT_RUN, "{D}", re.sub(_HEX_RUN, "{H}", raw))
