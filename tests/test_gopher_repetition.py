"""Contracts for the full Gopher repetition suite (X178,
operators/curation.py `gopher_repetition_suite`)."""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.curation import (
    GOPHER_REP_THRESHOLDS,
    gopher_repetition_suite,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_lines_counted(spark):
    # 4 lines, "spam" appears 3x → dup_line_frac = (4-2)/4 = 0.5;
    # REPEAT-occurrence chars = (3-1)*4 = 8 of len(text) = 21 chars
    # (reference semantics: occurrences beyond the first, over the
    # full document length including newlines)
    text = "spam\nspam\nspam\nunique"
    out = gopher_repetition_suite(_docs(spark, [(1, text)])).collect()[0]
    assert out.n_lines == 4
    assert out.dup_line_frac == 0.5
    assert out.dup_line_char_frac == 8.0 / 21.0
    assert out.rep_keep is False  # 0.5 > 0.30


def test_clean_doc_keeps(spark):
    text = "the quick brown fox jumps over a lazy dog near the river bank"
    out = gopher_repetition_suite(_docs(spark, [(1, text)])).collect()[0]
    assert out.dup_line_frac == 0.0
    assert out.rep_keep is True


def test_top_ngram_char_fraction(spark):
    # "ab cd" repeated: the top 2-gram "ab cd" (5 chars) occurs 4x in
    # "ab cd ab cd ab cd ab cd" (23 chars); occurrences of the 2-gram
    # "ab cd" = 4 → top_2gram_char_frac = 20/23
    text = "ab cd ab cd ab cd ab cd"
    out = gopher_repetition_suite(_docs(spark, [(1, text)])).collect()[0]
    assert out.top_2gram_char_frac == 20.0 / 23.0
    assert out.rep_keep is False  # 0.87 > 0.20


def test_dup_ngram_char_fraction_exact(spark):
    # 12 identical tokens "x": the 5-gram "x x x x x" (9 chars) occurs
    # 8 times → REPEAT occurrences = 8-1 = 7 → dup_5gram chars =
    # 7*9 = 63 over 23 text chars (12 tokens + 11 spaces) → 63/23.
    # Uncapped: overlapping repeats all count (documented deviation
    # from the reference's sequential skip-n scan — ours is >= it).
    text = " ".join(["x"] * 12)
    out = gopher_repetition_suite(_docs(spark, [(1, text)])).collect()[0]
    assert out.dup_5gram_char_frac == 63.0 / 23.0
    assert out.rep_keep is False


def test_short_and_empty_docs_pass_vacuously(spark):
    # fewer than 2 tokens → no n-grams; empty text → no lines: NULL
    # signals pass (repetition says nothing; the word-count gate owns
    # emptiness)
    rows = [(1, "word"), (2, ""), (3, None)]
    out = {r.doc_id: r for r in gopher_repetition_suite(_docs(spark, rows)).collect()}
    for d in (1, 2, 3):
        assert out[d].rep_keep is True
    assert out[1].top_2gram_char_frac is None
    assert out[2].n_lines == 0 and out[2].dup_line_frac is None


def test_all_rows_present_and_thresholds_cover_all_signals(spark):
    rows = [(i, f"doc number {i} with some text") for i in range(20)]
    out = gopher_repetition_suite(_docs(spark, rows))
    assert out.count() == 20
    sig_cols = set(out.columns) - {"doc_id", "n_lines", "rep_keep"}
    assert set(GOPHER_REP_THRESHOLDS) == sig_cols
