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
    """Canonicalize a URL for corpus-level dedup: crawls reach the same
    page via scheme/case/tracking-param/fragment variants, and URL-keyed
    dedup only works on the canonical form.

    Steps: lowercase scheme+host, http→https, drop the fragment, drop a
    default port, drop known tracking params (`TRACKING_PARAMS`), drop
    an empty '?', collapse duplicate slashes in the path (via a
    sentinel around '://' — RE2 has no lookbehind), and strip a
    trailing path slash (treating host/ == host). Every pattern is
    RE2-safe (no lookaround/backrefs in the MATCH side) so the DuckDB
    oracle runs the identical chain. Pure whole-stage-codegen column
    expressions — a scan-stage projection, no shuffle.
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(scheme, F.lit("://"), host, rest)
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    u = F.regexp_replace(u, r"^(https://[^/?#:]+):(80|443)($|[/?#])", r"$1$3")
    for p in TRACKING_PARAMS:
        u = F.regexp_replace(u, rf"([?&]){p}=[^&#]*&", r"$1")  # mid-query
        u = F.regexp_replace(u, rf"[?&]{p}=[^&#]*$", "")       # last param
    u = F.regexp_replace(u, r"\?$", "")                        # bare '?'
    u = F.replace(u, F.lit("://"), F.lit("\x01"))              # protect
    u = F.regexp_replace(u, r"//+", "/")                       # path //
    u = F.replace(u, F.lit("\x01"), F.lit("://"))
    u = F.regexp_replace(u, r"/$", "")                         # trailing /
    u = F.regexp_replace(u, r"/\?", "?")                       # '/?'
    return u


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of `canonical_url` (oracle strings) — the SAME
    step chain, with RE2 'g' flags and \\1-style replacements. Kept
    adjacent to the Spark implementation so the two evolve together."""
    u = f"trim({expr})"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    out = f"({scheme} || '://' || {host} || {rest})"
    out = f"regexp_replace({out}, '^http://', 'https://')"
    out = f"regexp_replace({out}, '#.*$', '')"
    out = (
        f"regexp_replace({out}, "
        r"'^(https://[^/?#:]+):(80|443)($|[/?#])', '\1\3')"
    )
    for p in TRACKING_PARAMS:
        out = f"regexp_replace({out}, '([?&]){p}=[^&#]*&', '\\1', 'g')"
        out = f"regexp_replace({out}, '[?&]{p}=[^&#]*$', '')"
    out = f"regexp_replace({out}, '\\?$', '')"
    out = f"replace({out}, '://', chr(1))"
    out = f"regexp_replace({out}, '//+', '/', 'g')"
    out = f"replace({out}, chr(1), '://')"
    out = f"regexp_replace({out}, '/$', '')"
    out = f"regexp_replace({out}, '/\\?', '?')"
    return out
