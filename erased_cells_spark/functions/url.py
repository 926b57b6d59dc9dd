"""URL canonicalization for web-crawl dedup, pure JVM expressions.

Crawls see the same page under many spellings — scheme/host case, default
ports, `www.` prefixes, tracking parameters, fragments. Canonicalizing
BEFORE exact/near dedup is what makes url-level dedup work at all; at
100 TB it must be a scan-side row expression (regexp_extract /
regexp_replace, whole-stage codegen — same shape as functions/pii.py).

Canonical form produced by `canonical_url`:
  lower(scheme) :// lower(host without leading www.) [:port unless the
  scheme default] path (empty -> /) [?query without tracking params]
Fragments always drop. Tracking params dropped: utm_*, gclid, fbclid.

Every regex is Java ∩ RE2 portable; the `sql_*` helpers emit the DuckDB
twin expressions so the `url_canonicalize` oracle proves both dialects
produce byte-identical canonical strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^/:?#]+)"
_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?[^/:?#]+:([0-9]+)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY = r"\?([^#]*)"
_TRACK = r"(^|&)(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&]*"

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def url_scheme(col: Column) -> Column:
    return F.lower(F.regexp_extract(col, _SCHEME, 1))


def url_host(col: Column) -> Column:
    """Lowercased host, leading `www.` stripped, userinfo skipped."""
    h = F.lower(F.regexp_extract(col, _HOST, 1))
    return F.regexp_replace(h, r"^www\.", "")


def url_port(col: Column) -> Column:
    """Explicit port as a string; '' when absent."""
    return F.regexp_extract(col, _PORT, 1)


def url_path(col: Column) -> Column:
    return F.regexp_extract(col, _PATH, 1)


def url_query(col: Column) -> Column:
    """Query string (no '?'), tracking params removed, '' when none left."""
    q = F.regexp_extract(col, _QUERY, 1)
    q = F.regexp_replace(q, _TRACK, "")
    return F.regexp_replace(q, r"^&+", "")


def canonical_url(col: Column) -> Column:
    scheme = url_scheme(col)
    port = url_port(col)
    is_default = (
        ((scheme == "http") & (port == _DEFAULT_PORTS["http"]))
        | ((scheme == "https") & (port == _DEFAULT_PORTS["https"]))
        | (port == "")
    )
    portpart = F.when(is_default, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    path = url_path(col)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = url_query(col)
    qpart = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), url_host(col), portpart, path, qpart)


# ------------------------------------------------------- DuckDB twins ------
def sql_url_scheme(e: str) -> str:
    return f"lower(regexp_extract({e}, '{_SCHEME}', 1))"


def sql_url_host(e: str) -> str:
    return (
        f"regexp_replace(lower(regexp_extract({e}, '{_HOST}', 1)), "
        "'^www\\.', '')"
    )


def sql_url_port(e: str) -> str:
    return f"regexp_extract({e}, '{_PORT}', 1)"


def sql_url_path(e: str) -> str:
    return f"regexp_extract({e}, '{_PATH}', 1)"


def sql_url_query(e: str) -> str:
    q = f"regexp_extract({e}, '{_QUERY}', 1)"
    q = f"regexp_replace({q}, '{_TRACK}', '', 'g')"
    return f"regexp_replace({q}, '^&+', '')"


def sql_canonical_url(e: str) -> str:
    scheme = sql_url_scheme(e)
    port = sql_url_port(e)
    portpart = (
        f"CASE WHEN ({scheme} = 'http' AND {port} = '80') OR "
        f"({scheme} = 'https' AND {port} = '443') OR {port} = '' "
        f"THEN '' ELSE ':' || {port} END"
    )
    path = f"CASE WHEN {sql_url_path(e)} = '' THEN '/' ELSE {sql_url_path(e)} END"
    q = sql_url_query(e)
    qpart = f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
    return f"({scheme} || '://' || {sql_url_host(e)} || {portpart} || {path} || {qpart})"
