"""Text sanitization / normalization expressions.

Re-expresses the reference's string helpers:
- `sanitizeField` — strip CR/LF/NUL, collapse whitespace, trim
  (reference `scripts/feeds/exportGoogleMerchantFeed.mjs:84-99`)
- header normalization — trim, lower, whitespace→`_`, strip non-word
  (reference `scripts/pricing/01_import_pricecharting_csv.js:92-98`)
- slug/URL building (reference `exportGoogleMerchantFeed.mjs:23-27,115-118`)
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_field(col: Column) -> Column:
    """Strip control chars, collapse runs of whitespace, trim."""
    no_ctl = F.regexp_replace(col, r"[\x00-\x1F\x7F]", " ")
    collapsed = F.regexp_replace(no_ctl, r"\s+", " ")
    return F.trim(collapsed)


def slugify(col: Column) -> Column:
    """Lowercase, non-alphanumeric runs → '-', trim dashes (slug
    GENERATION — for building new URL-safe slugs from titles)."""
    lowered = F.lower(col)
    dashed = F.regexp_replace(lowered, r"[^a-z0-9]+", "-")
    return F.regexp_replace(dashed, r"^-+|-+$", "")


def encode_uri_component(col: Column) -> Column:
    """JS `encodeURIComponent` semantics (mjs:115-118) as expressions.

    Spark's `url_encode` is Java URLEncoder (form encoding): space→'+'
    and !'()*~ get percent-encoded. The standard fix-up chain converts
    its output to encodeURIComponent's exactly (both UTF-8 underneath):
    '+'→%20 and un-encode !'()*~ — the characters encodeURIComponent
    leaves literal.
    """
    encoded = F.url_encode(col)
    for src, dst in (
        ("+", "%20"),
        ("%21", "!"),
        ("%27", "'"),
        ("%28", "("),
        ("%29", ")"),
        ("%2A", "*"),
        ("%7E", "~"),
    ):
        encoded = F.replace(encoded, F.lit(src), F.lit(dst))
    return encoded


def product_url(site_base: str, slug_col: Column) -> Column:
    """`https://site/products/<slug>` (mjs:115-118)."""
    return F.concat(F.lit(site_base.rstrip("/") + "/products/"), slug_col)


def normalize_header(name: str) -> str:
    """Driver-side (Python) CSV header normalization (01:92-98)."""
    out = name.strip().lower()
    out = re.sub(r"\s+", "_", out)
    out = re.sub(r"[^a-z0-9_]", "", out)
    return out


#: query params that never change page content — strip before dedup.
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "gclid",
    "fbclid",
    "ref",
    "sessionid",
)


def canonical_url(col: Column) -> Column:
    """Canonicalize an absolute URL for corpus-level dedup: crawls reach
    the same page via scheme/case/tracking-param/fragment variants, and
    URL-keyed dedup only works on the canonical form.

    Structure-first: the URL splits into (scheme, host, path, query)
    and each rule applies to its own component — lowercase scheme+host,
    http→https, drop the fragment and a default port, collapse
    duplicate slashes and strip the trailing slash IN THE PATH ONLY
    (query values keep their slashes), and drop tracking params by
    FILTERING the split parameter list (`TRACKING_PARAMS`) — so
    duplicate or reordered params cannot survive a pass and the
    function is idempotent (property-tested). Inputs without a
    `scheme://` prefix pass through trimmed and unchanged (this is an
    absolute-URL canonicalizer, not a resolver). Everything is either
    codegen regex/string ops or a per-row filter over a tiny param
    array; the identical chain runs in DuckDB (`canonical_url_sql`).
    """
    u = F.trim(col)
    is_abs = u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    orig_scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    scheme = F.regexp_replace(orig_scheme, r"^http$", "https")
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    # Default-port strip is SCHEME-GATED: for the WEB schemes (which
    # the http→https upgrade already treats as one origin) both default
    # web ports strip — the only idempotent choice under the upgrade
    # (http://h:443 → https://h:443 must not strip differently on a
    # second pass). For any other scheme the port is semantic
    # (ftp://h:80 is NOT ftp's default) and survives.
    host = F.when(
        orig_scheme.isin("http", "https"),
        F.regexp_replace(host, r":(80|443)$", ""),
    ).otherwise(host)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_replace(rest, r"[?].*$", "")
    path = F.regexp_replace(path, r"//+", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    tracked = "|".join(TRACKING_PARAMS)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(f"^({tracked})="),
    )
    q_out = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(scheme, F.lit("://"), host, path, q_out)
    return F.when(is_abs, canon).otherwise(u)


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of `canonical_url` (oracle strings) — the SAME
    component chain, kept adjacent so the two evolve together."""
    tracked = "|".join(TRACKING_PARAMS)
    u = f"trim({expr})"
    is_abs = f"regexp_matches({u}, '^[A-Za-z][A-Za-z0-9+.-]*://')"
    orig_scheme = (
        f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    )
    scheme = f"regexp_replace({orig_scheme}, '^http$', 'https')"
    raw_host = (
        f"lower(regexp_extract({u}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )
    host = (
        f"CASE WHEN {orig_scheme} IN ('http', 'https') "
        f"THEN regexp_replace({raw_host}, ':(80|443)$', '') "
        f"ELSE {raw_host} END"
    )
    rest = (
        f"regexp_replace(regexp_replace({u}, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''), '#.*$', '')"
    )
    path = (
        f"regexp_replace(regexp_replace(regexp_replace({rest}, "
        "'[?].*$', ''), '//+', '/', 'g'), '/$', '')"
    )
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (
        f"list_filter(string_split({query}, '&'), "
        f"__p -> __p <> '' AND NOT regexp_matches(__p, '^({tracked})='))"
    )
    q_out = (
        f"CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    canon = f"({scheme} || '://' || {host} || {path} || {q_out})"
    return f"CASE WHEN {is_abs} THEN {canon} ELSE {u} END"
