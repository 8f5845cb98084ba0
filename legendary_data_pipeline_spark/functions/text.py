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
