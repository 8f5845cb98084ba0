"""Property tests: round-7 statistics vs brute-force Python references
on randomized (seeded, deterministic) datasets — the O(n²)/sorted-form
definitions the distributed operators must reproduce exactly."""

from __future__ import annotations

import math
import random

import pytest


def _rng(seed):
    return random.Random(seed)


# ---------------------------------------------------------------------------
# references
# ---------------------------------------------------------------------------


def _avg_ranks(values):
    s = sorted(values)
    first = {}
    count = {}
    for i, v in enumerate(s):
        first.setdefault(v, i + 1)
        count[v] = count.get(v, 0) + 1
    return [first[v] + (count[v] - 1) / 2.0 for v in values]


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = n * sxy - sx * sy
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    return None if den == 0 else num / den


def _spearman_ref(xs, ys):
    return _pearson(_avg_ranks(xs), _avg_ranks(ys))


def _kendall_ref(xs, ys):
    n = len(xs)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            a = (xs[i] > xs[j]) - (xs[i] < xs[j])
            b = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if a == 0 and b == 0:
                tx += 1
                ty += 1
            elif a == 0:
                tx += 1
            elif b == 0:
                ty += 1
            elif a == b:
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    den = math.sqrt((n0 - (tx + 0)) * (n0 - (ty + 0)))
    # tx above counts pairs tied in x (incl. both-tied), ty in y
    return c, d, None if den == 0 else (c - d) / den


def _gini_ref(vals):
    s = sorted(vals)
    n = len(s)
    tot = sum(s)
    if tot == 0:
        return None
    w = sum((i + 1) * v for i, v in enumerate(s))
    return (2 * w - (n + 1) * tot) / (n * tot)


# ---------------------------------------------------------------------------
# properties
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_spearman_matches_reference(spark, seed):
    from legendary_data_pipeline_spark.operators.stats import spearman_matrix

    r = _rng(seed)
    # heavy ties on x (8 levels), moderately correlated y
    rows = []
    for _ in range(120):
        x = float(r.randrange(8))
        y = float(x + r.randrange(5))
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    got = spearman_matrix(df, ["x", "y"]).collect()[0]
    ref = _spearman_ref([a for a, _ in rows], [b for _, b in rows])
    assert got["rho"] == pytest.approx(ref, abs=2e-6)


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_kendall_matches_pair_enumeration(spark, seed):
    from legendary_data_pipeline_spark.operators.stats import kendall_tau_b

    r = _rng(seed)
    rows = [(r.randrange(6), r.randrange(4)) for _ in range(90)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = kendall_tau_b(df, "a", "b").collect()[0]
    c, d, tau = _kendall_ref([a for a, _ in rows], [b for _, b in rows])
    assert int(got["concordant"]) == c
    assert int(got["discordant"]) == d
    assert got["tau_b"] == pytest.approx(tau, abs=2e-6)


@pytest.mark.parametrize("seed", [7, 8, 9])
def test_gini_matches_sorted_form(spark, seed):
    from legendary_data_pipeline_spark.operators.stats import (
        gini_concentration,
    )

    r = _rng(seed)
    vals = [r.randrange(0, 1000) for _ in range(150)]
    # inject heavy ties
    vals += [vals[0]] * 20
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = gini_concentration(df, "v").collect()[0]
    assert got["gini"] == pytest.approx(_gini_ref(vals), abs=2e-6)
    assert got["n"] == len(vals) and got["total"] == sum(vals)


@pytest.mark.parametrize("seed", [10, 11])
def test_novelty_matches_counting_reference(spark, seed):
    from legendary_data_pipeline_spark.operators.textstats import (
        ngram_novelty,
    )

    r = _rng(seed)
    vocab = [f"w{k}" for k in range(12)]
    docs = []
    for i in range(25):
        words = [vocab[r.randrange(len(vocab))] for _ in range(r.randrange(2, 12))]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r_["doc_id"]: r_ for r_ in ngram_novelty(df, shingle_n=2).collect()}

    def shingles(t):
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    all_sh = {}
    for i, t in docs:
        for s in shingles(t):
            all_sh.setdefault(s, set()).add(i)
    for i, t in docs:
        sh = shingles(t)
        expect_n = len(sh)
        expect_novel = sum(1 for s in sh if len(all_sh[s]) == 1)
        assert got[i]["n_shingles"] == expect_n
        assert got[i]["n_novel"] == expect_novel
