"""SimHash packed-counter overflow contract (ANSI mode).

Spark 4 defaults to spark.sql.ansi.enabled=true, where a plain `sum`
over the packed counters raises ARITHMETIC_OVERFLOW as soon as one
document's counter total pushes the top packed field past Long.MAX.
The operator's contract: such documents get a NULL fingerprint (via
`try_sum` + the token-count capacity guard) and the query survives.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.operators.dedup import simhash

# pack=4 → 16-bit fields, top field owns the sign bit → capacity 32767.
PACK4_CAPACITY = (1 << 15) - 1


def _corpus(spark, repeats: int):
    # One normal doc + one doc of `repeats` identical tokens (identical
    # tokens all push the same counter signs — the worst case for the
    # packed running sum).
    return spark.createDataFrame(
        [
            (1, "a short normal document"),
            (2, " ".join(["boom"] * repeats)),
        ],
        "doc_id long, text string",
    )


def test_over_capacity_doc_gets_null_fingerprint_not_crash(spark):
    docs = _corpus(spark, PACK4_CAPACITY + 1)
    rows = {r["doc_id"]: r for r in simhash(docs).collect()}
    assert rows[1]["simhash"] is not None
    assert rows[2]["simhash"] is None
    # token_count is still reported for the overflowed doc.
    assert rows[2]["token_count"] == PACK4_CAPACITY + 1


def test_at_capacity_doc_keeps_fingerprint(spark):
    docs = _corpus(spark, PACK4_CAPACITY)
    rows = {r["doc_id"]: r for r in simhash(docs).collect()}
    assert rows[2]["simhash"] is not None
    assert rows[2]["token_count"] == PACK4_CAPACITY
