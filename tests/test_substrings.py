"""Exact duplicated-substring dedup: span-merge semantics on built data.

The oracle harness (test_queries_oracle) checks engine parity on the
fixture corpus; these tests pin the operator CONTRACT on documents
constructed to exercise each rule: overlap merging, intra-document
repetition, sub-threshold runs, full-document duplication, and
shorter-than-n documents.
"""

from __future__ import annotations

import pytest

from legendary_data_pipeline_spark.operators import substrings as S

N = 4  # small window so fixtures stay readable


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    # shared = an 6-token phrase duplicated across docs 1 and 2
    shared = "the quick brown fox jumps high"
    rows = [
        # doc 1: unique prefix + shared run + unique suffix
        (1, f"alpha beta {shared} gamma delta"),
        # doc 2: shared run at the start
        (2, f"{shared} epsilon zeta eta theta"),
        # doc 3: internally repeated 4-token run (intra-doc duplication)
        (3, "one two three four x y z one two three four"),
        # doc 4: a 3-token overlap with doc 1 — BELOW the n=4 threshold
        (4, "alpha beta the unrelated tail words here now"),
        # doc 5: shorter than n tokens
        (5, "tiny doc"),
        # docs 6/7: exact duplicates of each other
        (6, "full copy document body with many tokens inside"),
        (7, "full copy document body with many tokens inside"),
    ]
    return _docs(spark, rows)


def test_spans_merge_overlapping_windows(spark, corpus):
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"])
        for r in S.duplicated_spans(corpus, n=N).collect()
        if r["doc_id"] in (1, 2)
    }
    # doc 1: tokens 3..8 are the shared phrase -> three overlapping
    # 4-gram windows (starts 3,4,5) merge into ONE span [3, 8].
    assert spans[1] == (3, 8)
    # doc 2: same phrase at positions 1..6.
    assert spans[2] == (1, 6)


def test_intra_document_repeat_detected(spark, corpus):
    rows = [
        r
        for r in S.duplicated_spans(corpus, n=N).collect()
        if r["doc_id"] == 3
    ]
    # "one two three four" occurs twice WITHIN doc 3 (positions 1..4 and
    # 8..11): min_count counts total occurrences, not distinct docs.
    got = sorted((r["span_start"], r["span_end"]) for r in rows)
    assert got == [(1, 4), (8, 11)]


def test_sub_threshold_overlap_ignored(spark, corpus):
    ids = {r["doc_id"] for r in S.duplicated_spans(corpus, n=N).collect()}
    assert 4 not in ids  # 3-token overlap < n=4 -> not a duplicate
    assert 5 not in ids  # shorter than the window -> no shingles at all


def test_strip_rebuilds_and_counts(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in S.strip_duplicated_substrings(corpus, n=N).collect()
    }
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[1]["n_removed"] == 6
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    # doc 3 keeps only the middle filler between its two repeats
    assert out[3]["clean_text"] == "x y z"
    # untouched docs come back whitespace-normalized but intact
    assert out[4]["clean_text"] == corpus.filter("doc_id = 4").collect()[0][
        "text"
    ]
    assert out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == "tiny doc"
    # full duplicates are stripped to empty on BOTH sides (all
    # occurrences removed — the documented deviation from keep-first)
    assert out[6]["clean_text"] == "" and out[7]["clean_text"] == ""
    assert out[6]["n_removed"] == 8


def test_stats_fraction(spark, corpus):
    stats = {
        r["doc_id"]: r for r in S.dup_span_stats(corpus, n=N).collect()
    }
    assert stats[6]["dup_frac"] == 1.0
    assert stats[1]["n_dup_spans"] == 1
    assert stats[1]["dup_tokens"] == 6
    assert stats[1]["n_tokens"] == 10
    assert stats[1]["dup_frac"] == 0.6
    assert 4 not in stats and 5 not in stats


def test_adjacent_but_disjoint_spans_stay_separate(spark):
    # Two duplicated runs separated by ONE unique token: windows never
    # overlap across the gap, so two spans (not one) must come back.
    df = _docs(
        spark,
        [
            (1, "a b c d X e f g h"),
            (2, "a b c d Y e f g h"),
        ],
    )
    rows = S.duplicated_spans(df, n=N).filter("doc_id = 1").collect()
    got = sorted((r["span_start"], r["span_end"]) for r in rows)
    assert got == [(1, 4), (6, 9)]


# ---------------------------------------------------------------------------
# property: span construction matches a pure-Python reference
# ---------------------------------------------------------------------------

def _ref_spans(docs: dict[int, list[str]], n: int, min_count: int = 2):
    """Reference ExactSubstr spans: count n-grams, mark positions whose
    gram occurs >= min_count corpus-wide, merge overlapping windows."""
    from collections import defaultdict

    counts: dict[str, int] = defaultdict(int)
    per_doc: dict[int, list[tuple[int, str]]] = {}
    for did, toks in docs.items():
        lst = []
        for p in range(len(toks) - n + 1):
            g = " ".join(toks[p : p + n])
            counts[g] += 1
            lst.append((p + 1, g))
        per_doc[did] = lst
    out = {}
    for did, lst in per_doc.items():
        spans = []
        for p, g in lst:  # positions ascending
            if counts[g] < min_count:
                continue
            if spans and p <= spans[-1][1] + 1:  # overlaps or abuts
                spans[-1] = (spans[-1][0], p + n - 1)
            else:
                spans.append((p, p + n - 1))
        if spans:
            out[did] = spans
    return out


def test_spans_match_python_reference_property(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    N = 3
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )

    # Batch all hypothesis examples into ONE union frame: tokens are
    # prefixed with the example index, so n-grams never collide across
    # examples and corpus-level frequency stays per-example.
    examples: list[list[list[str]]] = []

    @settings(max_examples=25, deadline=None)
    @given(corpus_strategy)
    def collect(corpus):
        examples.append(corpus)

    collect()

    docs = {}
    rows = []
    for ei, corpus in enumerate(examples):
        for di, toks in enumerate(corpus):
            did = ei * 1000 + di
            tagged = [f"e{ei}_{t}" for t in toks]
            docs[did] = tagged
            rows.append((did, " ".join(tagged)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, list[tuple[int, int]]] = {}
    for r in S.duplicated_spans(df, n=N).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _ref_spans(docs, N)


def test_abutting_windows_merge_into_one_span(spark):
    # n=4: windows at pos 1 and pos 5 cover tokens 1-4 and 5-8 — they
    # abut without overlapping, and must merge into ONE maximal span.
    df = _docs(
        spark,
        [
            (1, "a b c d e f g h"),
            (2, "a b c d Q Q Q e f g h"),
        ],
    )
    rows = S.duplicated_spans(df, n=N).filter("doc_id = 1").collect()
    got = sorted((r["span_start"], r["span_end"]) for r in rows)
    assert got == [(1, 8)]


def test_strip_preserves_untouched_text_when_not_normalizing(spark):
    df = _docs(
        spark,
        [
            (1, "unique  doc   with   odd    spacing"),
            (2, "the quick brown fox jumps high over fences"),
            (3, "the quick brown fox jumps high over walls"),
        ],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in S.strip_duplicated_substrings(
            df, n=N, normalize_untouched=False
        ).collect()
    }
    # untouched doc keeps its original whitespace byte-for-byte
    assert out[1] == "unique  doc   with   odd    spacing"
    # stripped docs are rebuilt (token-joined) minus the shared run —
    # docs 2 and 3 share the 7-token prefix "the … over", so only the
    # final unique token survives
    assert out[2] == "fences" and out[3] == "walls"
