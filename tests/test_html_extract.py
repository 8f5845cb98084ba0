"""Boilerplate-removal contracts for html_extract against hand-labeled
pages: nav/footer/link-farm drop, content survives, entities decode,
script/style/title/comment subtrees vanish, malformed input is safe.
"""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.html import html_extract


def _extract(spark, html, **kw):
    df = spark.createDataFrame([(1, html)], "doc_id long, raw_html string")
    return html_extract(df, **kw).first()


FULL_PAGE = (
    "<html><head><title>Ignore This Long Title Entirely</title>"
    "<style>p { color: red; }</style>"
    "<script>var tracker = 1; if (a<b) { track(); }</script></head><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/b">Contact</a></nav>'
    "<h1>The Actual Headline Here</h1>"
    "<p>This is the <b>main</b> content paragraph with enough words.</p>"
    "<p>Entities &amp; more &lt;escaped&gt; &quot;stuff&quot; here today.</p>"
    "<!-- a comment with <p>fake tags</p> inside -->"
    '<div class="footer"><a href="/p">Privacy Policy</a> | '
    '<a href="/t">Terms of Use</a></div></body></html>'
)

# Hand-labeled expectation for FULL_PAGE.
FULL_PAGE_TEXT = (
    "The Actual Headline Here\n"
    "This is the main content paragraph with enough words.\n"
    'Entities & more <escaped> "stuff" here today.'
)


def test_hand_labeled_page(spark):
    r = _extract(spark, FULL_PAGE)
    assert r["text"] == FULL_PAGE_TEXT
    assert r["n_kept_blocks"] == 3
    assert 0.0 < r["boilerplate_frac"] < 1.0


def test_link_density_drops_navigation_not_content(spark):
    html = (
        '<div><a href="/1">One</a> <a href="/2">Two</a> <a href="/3">Three</a>'
        " sep</div>"
        '<p>A real paragraph that happens to cite <a href="/ref">one link</a>'
        " among many ordinary words of running text.</p>"
    )
    r = _extract(spark, html)
    assert r["n_blocks"] == 2 and r["n_kept_blocks"] == 1
    assert r["text"].startswith("A real paragraph")
    # The cited link's anchor TEXT is retained inside the kept block.
    assert "one link" in r["text"]


def test_subtree_removal_is_total(spark):
    html = (
        "<script>document.write('<p>injected paragraph of words</p>')</script>"
        "<style>.x { font: bold; } body { margin: 0; }</style>"
        "<title>six words of head title text</title>"
        "<!-- hidden comment words that look like content -->"
        "<p>Only this visible sentence of words survives the page.</p>"
    )
    r = _extract(spark, html)
    assert r["text"] == "Only this visible sentence of words survives the page."
    assert "injected" not in r["text"]


def test_malformed_and_empty_inputs(spark):
    # Plain text with no markup at all = one kept block.
    r = _extract(spark, "Just some plain text with no markup at all.")
    assert r["n_blocks"] == 1 and r["n_kept_blocks"] == 1
    # Unclosed tags don't crash; tag fragments are stripped.
    r = _extract(spark, "<p>An unclosed paragraph of several words <b>bold")
    assert "unclosed paragraph" in r["text"]
    # Empty page.
    r = _extract(spark, "")
    assert r["n_blocks"] == 0 and r["text"] == ""
    assert r["boilerplate_frac"] is None
    # NULL page.
    df = spark.createDataFrame([(1, None)], "doc_id long, raw_html string")
    row = html_extract(df).first()
    assert row["n_blocks"] == -1 or row["n_blocks"] is None or row["text"] is None


def test_thresholds_are_tunable(spark):
    html = "<p>short one</p><p>a much longer paragraph with many words</p>"
    strict = _extract(spark, html, min_block_words=5)
    loose = _extract(spark, html, min_block_words=2)
    assert strict["n_kept_blocks"] == 1 and loose["n_kept_blocks"] == 2


def test_feeds_c4_gates_downstream(spark):
    from legendary_data_pipeline_spark.operators.curation import c4_gates

    df = spark.createDataFrame(
        [(1, FULL_PAGE)], "doc_id long, raw_html string"
    )
    text = html_extract(df).select("doc_id", "text")
    r = c4_gates(text).first()
    # Extraction output is directly consumable: three ≥5-word lines,
    # all terminal-punctuated except the headline.
    assert r["n_lines"] == 3 and r["n_kept_lines"] == 2
