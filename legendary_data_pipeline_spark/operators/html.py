"""HTML → text extraction with block-level boilerplate removal.

The reference's payload columns are JSON, but a real LLM corpus starts
from markup — this is the missing front door of the curation pipeline
(reference parity: the closest analogue is the sanitize/normalize layer
of 02_normalize_prices.js:47-76, which cleans field-level strings; this
module lifts the same "clean before you compute" stage to documents).

Design: a tag-density/text-block heuristic in the jusText/readability
shape, but expressed ENTIRELY in JVM regex/higher-order-function column
expressions — no DOM, no Python on the data plane, zero shuffles:

1. Drop non-content subtrees: ``<script>``/``<style>``/``<title>``
   bodies and HTML comments.
2. Convert block-level tag boundaries (``p div h1-6 li ul ol tr table
   br nav footer header section article``) into block separators and
   split — each block keeps its inline markup (``<a>``, ``<b>``, …).
3. Per block, measure LINK DENSITY (chars of ``<a>…</a>`` anchor text
   over total text chars — the jusText "good block" signal) and word
   count after stripping tags, decoding the common entities
   (``&lt; &gt; &quot; &#39; &nbsp;`` then ``&amp;`` LAST, so
   double-escapes don't double-decode), and collapsing whitespace.
4. Keep blocks with ≥ `min_block_words` words and link density ≤
   `max_link_density`; navigation bars, footers, and link farms drop
   out, content paragraphs survive. ``text`` is the kept blocks joined
   with newlines — ready for `c4_gates`/`gopher_gates` downstream.

Every regex is RE2-compatible (no backreferences, no lookaround), so
the DuckDB oracle replays the exact chain. At 100 TB this is the
canonical map-only operator: one projection, whole-stage codegen,
parallelism = input splits, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Block-level boundaries (open or close, any attributes).
BLOCK_TAG_RE = (
    r"(?i)</?(p|div|h[1-6]|li|ul|ol|tr|table|br|nav|footer|header"
    r"|section|article|blockquote|td|th)\b[^>]*>"
)
#: Non-content subtrees, removed bodily. Two patterns (RE2 has no
#: backreferences, so no <(script|style)>…</\1> shortcut).
SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
TITLE_RE = r"(?is)<title\b[^>]*>.*?</title>"
COMMENT_RE = r"(?s)<!--.*?-->"
#: Anchor inner text (group 1) — the link-density numerator.
ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
#: Any remaining tag.
TAG_RE = r"<[^>]*>"

#: Entity decode order matters: named/numeric entities first, the bare
#: ampersand LAST (``&amp;lt;`` must become ``&lt;``, not ``<``).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _strip_inline(col: Column) -> Column:
    """Inline markup → plain normalized text: strip tags, decode
    entities, collapse whitespace."""
    out = F.regexp_replace(col, TAG_RE, " ")
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "raw_html",
    min_block_words: int = 3,
    max_link_density: float = 0.5,
) -> DataFrame:
    """Extract main text from an HTML column (see module docstring).

    Returns one row per input row: `n_blocks`, `n_kept_blocks`,
    `text` (kept blocks joined by ``\\n``), `text_len`, and
    `boilerplate_frac` (fraction of extracted characters that sat in
    dropped blocks — the removal pressure signal).
    """
    no_sub = F.col(html_col)
    for pat in (SCRIPT_RE, STYLE_RE, TITLE_RE, COMMENT_RE):
        no_sub = F.regexp_replace(no_sub, pat, " ")
    # \x02 never occurs in text content; it marks block boundaries.
    raw_blocks = F.split(
        F.regexp_replace(no_sub, BLOCK_TAG_RE, "\x02"), "\x02", -1
    )

    def block_struct(b: Column) -> Column:
        txt = _strip_inline(b)
        link_txt = _strip_inline(
            F.array_join(F.regexp_extract_all(b, F.lit(ANCHOR_RE), 1), " ")
        )
        n_chars = F.length(txt)
        n_words = F.when(txt == "", F.lit(0)).otherwise(
            F.size(F.split(txt, " ", -1))
        )
        density = F.when(n_chars == 0, F.lit(1.0)).otherwise(
            F.length(link_txt).cast("double") / n_chars.cast("double")
        )
        return F.struct(
            txt.alias("txt"),
            n_chars.cast("long").alias("n_chars"),
            n_words.cast("long").alias("n_words"),
            density.alias("density"),
        )

    base = df.withColumn(
        "__blocks",
        F.filter(
            F.transform(raw_blocks, block_struct),
            lambda s: s["n_chars"] > 0,
        ),
    ).withColumn(
        "__kept",
        F.filter(
            F.col("__blocks"),
            lambda s: (s["n_words"] >= min_block_words)
            & (s["density"] <= max_link_density),
        ),
    )
    total_chars = F.aggregate(
        F.col("__blocks"), F.lit(0).cast("long"), lambda a, s: a + s["n_chars"]
    )
    kept_chars = F.aggregate(
        F.col("__kept"), F.lit(0).cast("long"), lambda a, s: a + s["n_chars"]
    )
    text = F.array_join(
        F.transform(F.col("__kept"), lambda s: s["txt"]), "\n"
    )
    return base.select(
        F.col(id_col),
        F.size("__blocks").cast("long").alias("n_blocks"),
        F.size("__kept").cast("long").alias("n_kept_blocks"),
        text.alias("text"),
        F.length(text).cast("long").alias("text_len"),
        (
            (total_chars - kept_chars).cast("double")
            / F.nullif(total_chars.cast("double"), F.lit(0.0))
        ).alias("boilerplate_frac"),
    )
