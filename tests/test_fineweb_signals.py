"""Contracts for the FineWeb line-shape gates (X179,
operators/curation.py `fineweb_line_signals`)."""

from __future__ import annotations

from legendary_data_pipeline_spark.operators.curation import (
    fineweb_line_signals,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prose_passes_nav_menu_fails(spark):
    prose = (
        "This is a well formed sentence that ends with punctuation.\n"
        "Another full sentence follows it, also properly terminated.\n"
        "And a third one to round out the paragraph nicely!"
    )
    nav = "Home\nAbout\nProducts\nContact\nLogin\nRegister\nHelp"
    out = {
        r.doc_id: r
        for r in fineweb_line_signals(
            _docs(spark, [(1, prose), (2, nav)])
        ).collect()
    }
    assert out[1].punct_line_frac == 1.0
    assert out[1].fineweb_keep is True
    # every nav line is short and unpunctuated
    assert out[2].punct_line_frac == 0.0
    assert out[2].short_line_frac == 1.0
    assert out[2].fineweb_keep is False


def test_bullet_detection(spark):
    text = (
        "- first bullet item here\n"
        "* second bullet item here\n"
        "1. numbered item in the list\n"
        "2) another numbered item too\n"
        "A normal sentence that ends with a period."
    )
    out = fineweb_line_signals(_docs(spark, [(1, text)])).collect()[0]
    assert out.n_lines == 5
    assert out.bullet_line_frac == 0.8


def test_short_line_fraction_exact(spark):
    text = "tiny\n" + ("x" * 40 + ".\n") + "also tiny"
    out = fineweb_line_signals(_docs(spark, [(1, text)])).collect()[0]
    assert out.short_line_frac == 2.0 / 3.0


def test_empty_docs_fail(spark):
    rows = [(1, ""), (2, None), (3, "\n\n  \n")]
    out = fineweb_line_signals(_docs(spark, rows)).collect()
    for r in out:
        assert r.n_lines == 0
        assert r.punct_line_frac is None
        assert r.fineweb_keep is False
