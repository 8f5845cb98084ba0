"""Sentence segmentation contracts: known splits, offset correctness,
JVM-expression ↔ UDTF parity, and SQL LATERAL usage of the UDTF.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.textstats import (
    register_udtfs,
    split_sentences_expr,
)

_TEXT = "One sentence. Two!  Three?\nFour has no end"


def test_expr_known_split(spark):
    df = spark.createDataFrame([(_TEXT,)], "text string")
    got = df.select(split_sentences_expr(F.col("text")).alias("s")).first()["s"]
    assert got == ["One sentence.", "Two!", "Three?", "Four has no end"]


def test_expr_trailing_whitespace_parity(spark):
    """Text ending in terminal punctuation + whitespace (the common
    '.\\n' doc tail) must NOT yield a trailing empty sentence — the
    expr form matches the UDTF, which drops empty pieces."""
    cases = [
        ("One. Two. ", ["One.", "Two."]),
        ("Ends clean.\n", ["Ends clean."]),
        ("Tabs too.\t\t", ["Tabs too."]),
        ("No trailing ws!", ["No trailing ws!"]),
        ("", []),
    ]
    df = spark.createDataFrame(cases, "text string, want array<string>")
    got = df.select(
        "want", split_sentences_expr(F.col("text")).alias("s")
    ).collect()
    for r in got:
        assert r["s"] == r["want"]


def test_udtf_offsets_and_parity(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, _TEXT), (2, None), (3, "No terminal punctuation at all")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("sdocs")
    rows = spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence, s.start_char, s.n_chars
        FROM sdocs, LATERAL split_sentences(text) s
        ORDER BY doc_id, sent_idx
        """
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # NULL text emits nothing.
    assert 2 not in by_doc
    assert [r["sentence"] for r in by_doc[3]] == [
        "No terminal punctuation at all"
    ]
    # Offsets slice the original text exactly.
    for r in by_doc[1]:
        assert _TEXT[r["start_char"] : r["start_char"] + r["n_chars"]] == (
            r["sentence"]
        )
    # Parity with the JVM expression.
    expr = (
        spark.createDataFrame([(_TEXT,)], "text string")
        .select(split_sentences_expr(F.col("text")).alias("s"))
        .first()["s"]
    )
    assert [r["sentence"] for r in by_doc[1]] == expr


def test_udtf_on_documents_table(spark, sf_dir):
    register_udtfs(spark)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    docs.createOrReplaceTempView("sdocs2")
    out = spark.sql(
        "SELECT doc_id, s.* FROM sdocs2, LATERAL split_sentences(text) s"
    )
    assert out.count() >= 20
    assert out.filter("n_chars <= 0").count() == 0
