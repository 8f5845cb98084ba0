"""Per-rule contracts for the C4 cleaning recipe (Raffel et al. 2020
§2.2): line retention (terminal punctuation, ≥5 words, javascript),
page rules (curly brace, lorem ipsum, bad words, ≥3 sentences), and the
corpus-wide three-sentence-span dedup accounting.
"""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.curation import (
    c4_gates,
    c4_span_stats,
)

GOOD = (
    "This is the first full sentence of the page. "
    "Here comes another proper sentence with many words. "
    "And a third sentence closes the page nicely."
)


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_gates(df, **kw).first()


def test_clean_page_passes_everything(spark):
    r = _one(spark, GOOD)
    assert r["c4_keep"]
    assert r["n_kept_lines"] == 1 and r["n_sentences"] == 3
    assert r["clean_text"] == GOOD.strip()


def test_line_rules(spark):
    text = "\n".join(
        [
            "A proper line with enough words ends here.",  # kept
            "Too short ends.",  # < 5 words → dropped
            "This line has plenty of words but no terminal punct",  # dropped
            "Please enable JavaScript to view the comments powered here.",  # dropped
            "Quoted lines that end in a quotation mark also count.\"",  # kept
            "",  # dropped
        ]
    )
    r = _one(spark, text)
    assert r["n_lines"] == 6
    assert r["n_kept_lines"] == 2
    assert r["clean_text"].count("\n") == 1
    assert "JavaScript" not in r["clean_text"]


def test_page_rules_fire_independently(spark):
    curly = GOOD + " An object literal { lurks here."
    r = _one(spark, curly)
    assert not r["pass_no_curly"] and not r["c4_keep"]
    assert r["pass_no_lorem"] and r["pass_min_sentences"]

    lorem = GOOD + " Lorem Ipsum has been the industry standard."
    r = _one(spark, lorem)
    assert not r["pass_no_lorem"] and not r["c4_keep"]
    assert r["pass_no_curly"]

    # One retained line = one sentence < 3 → min-sentences rule fires.
    r = _one(spark, "Just one proper sentence lives on this page.")
    assert not r["pass_min_sentences"] and not r["c4_keep"]

    # Bad word as a WHOLE word only: 'pornography' must not match 'porn'.
    bw = ("porn",)
    r = _one(spark, GOOD + " This mentions porn explicitly once.", bad_words=bw)
    assert not r["pass_no_bad_words"] and not r["c4_keep"]
    r = _one(spark, GOOD + " A paper about pornography research.", bad_words=bw)
    assert r["pass_no_bad_words"]


def test_null_text_fails_closed(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = c4_gates(df).first()
    assert not r["c4_keep"]


def test_span_stats_counts_duplicates_across_docs(spark):
    s = ["Alpha one two three. ", "Beta four five six. ", "Gamma seven. ",
         "Delta eight nine. ", "Epsilon ten. "]
    rows = [
        (1, "".join(s[0:4])),        # spans: (0,1,2), (1,2,3)
        (2, "".join(s[0:3]) + s[4]), # spans: (0,1,2)[dup], (1,2,eps)
        (3, "".join(s[0:2])),        # only 2 sentences → 0 spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in c4_span_stats(df).collect()}
    assert got[1]["n_spans"] == 2 and got[1]["n_dup_spans"] == 0
    assert got[2]["n_spans"] == 2 and got[2]["n_dup_spans"] == 1
    assert got[2]["dup_span_frac"] == 0.5
    assert got[3]["n_spans"] == 0 and got[3]["n_dup_spans"] == 0
    assert got[3]["dup_span_frac"] is None


def test_span_canonical_is_first_by_id_then_position(spark):
    # The same span appears at different positions; the (doc_id,
    # span_idx) minimum is canonical, so doc 1 keeps it and doc 2 dups.
    text = "One two three four five. Six seven eight nine ten. Eleven twelve."
    df = spark.createDataFrame(
        [(2, text), (1, text)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in c4_span_stats(df).collect()}
    assert got[1]["n_dup_spans"] == 0
    assert got[2]["n_dup_spans"] == 1
