"""Property-based tests (hypothesis): invariants a single example can miss.

Batched: each property collects its examples driver-side first, then runs
ONE Spark job over all of them — hypothesis drives data generation, Spark
evaluates the column expressions being tested.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.functions.money import (
    cents_to_display,
    parse_money_to_cents,
)
from legendary_data_pipeline_spark.operators.upsert import upsert


# ---------------------------------------------------------------------------
# money round-trip: render cents → parse back → identical cents
# ---------------------------------------------------------------------------

def test_money_roundtrip_property(spark):
    cents_list = st.lists(
        st.integers(min_value=0, max_value=10**13), min_size=1, max_size=200
    )

    @settings(max_examples=20, deadline=None)
    @given(cents_list)
    def check(values):
        df = spark.createDataFrame([(v,) for v in values], "cents long")
        out = df.select(
            "cents",
            parse_money_to_cents(
                F.regexp_replace(cents_to_display(F.col("cents")), " USD", "")
            ).alias("back"),
        )
        assert all(r.cents == r.back for r in out.collect())

    check()


def test_money_parse_matches_python_decimal(spark):
    money_strings = st.lists(
        st.one_of(
            st.from_regex(r"\$?[0-9]{1,9}(\.[0-9]{1,4})?", fullmatch=True),
            st.just("N/A"),
            st.just(""),
            st.just("12,345.67"),
            st.just("$0.005"),
        ),
        min_size=1,
        max_size=100,
    )

    def expected(s: str) -> int | None:
        cleaned = s.strip().replace("$", "").replace(",", "")
        import re

        if not re.fullmatch(r"-?\d+(\.\d+)?", cleaned):
            return None
        return int(
            (Decimal(cleaned) * 100).quantize(Decimal("1"), ROUND_HALF_UP)
        )

    @settings(max_examples=20, deadline=None)
    @given(money_strings)
    def check(strings):
        df = spark.createDataFrame([(s,) for s in strings], "s string")
        got = [
            r.cents
            for r in df.select(parse_money_to_cents(F.col("s")).alias("cents"))
            .collect()
        ]
        assert got == [expected(s) for s in strings]

    check()


# ---------------------------------------------------------------------------
# upsert laws: updates win, idempotent, key-complete
# ---------------------------------------------------------------------------

def test_upsert_laws_property(spark):
    rows = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # key
            st.integers(min_value=0, max_value=10**6),  # value
        ),
        min_size=0,
        max_size=40,
    )

    @settings(max_examples=15, deadline=None)
    @given(rows, rows)
    def check(existing_rows, update_rows):
        schema = "k int, v int"
        existing = spark.createDataFrame(existing_rows or [(None, None)], schema)
        if not existing_rows:
            existing = existing.filter(F.col("k").isNotNull())
        updates = spark.createDataFrame(update_rows or [(None, None)], schema)
        if not update_rows:
            updates = updates.filter(F.col("k").isNotNull())

        tie = [F.col("v").desc()]
        merged = {
            r.k: r.v
            for r in upsert(existing, updates, ["k"], tie).collect()
        }

        update_keys = {k for k, _ in update_rows}
        existing_keys = {k for k, _ in existing_rows}
        # key-complete
        assert set(merged) == update_keys | existing_keys
        for k, v in merged.items():
            if k in update_keys:
                # updates win; deterministic pick = max v within updates
                assert v == max(uv for uk, uv in update_rows if uk == k)
            else:
                assert v == max(ev for ek, ev in existing_rows if ek == k)

        # idempotent: applying the same updates again changes nothing
        merged_df = upsert(existing, updates, ["k"], tie)
        again = {
            r.k: r.v for r in upsert(merged_df, updates, ["k"], tie).collect()
        }
        assert again == merged

    check()


def test_canonical_url_is_idempotent(spark):
    """A canonicalizer must be a projection: applying it twice equals
    applying it once, over a generator covering every rule interaction
    (case, ports, dup slashes, trailing slash, tracking params,
    fragments, multiple query params)."""
    from itertools import product

    from pyspark.sql import functions as F

    from legendary_data_pipeline_spark.functions.text import canonical_url

    urls = []
    for scheme, port, path, trail, qs, frag in product(
        ("http://", "HTTPS://"),
        ("", ":80", ":443", ":8080"),
        ("/a//b", "/a/b", ""),
        ("", "/"),
        ("", "?q=1", "?utm_source=x&q=1", "?q=1&gclid=g&r=2", "?utm_campaign=c"),
        ("", "#frag"),
    ):
        urls.append(f"{scheme}Ex.COM{port}{path}{trail}{qs}{frag}")
    # Review-found adversarial cases: duplicated tracking params (must
    # vanish in ONE pass), slashes inside query values (must survive),
    # scheme-less inputs (must pass through unchanged).
    urls += [
        "https://ex.com/p?utm_source=a&utm_source=b&utm_source=c&q=1",
        "https://ex.com/p?next=/a//b/",
        "https://ex.com/p?q=foo/",
        "example.com/a",
        "/relative/path?utm_source=x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = canonical_url(F.col("u"))
    out = df.select(
        once.alias("c1"), canonical_url(once).alias("c2")
    ).collect()
    diffs = [(r["c1"], r["c2"]) for r in out if r["c1"] != r["c2"]]
    assert not diffs, f"non-idempotent on {diffs[:5]}"
    # Every ABSOLUTE canonical form is https with a lowercase host.
    assert all(
        r["c1"].startswith("https://ex.com")
        for r in out
        if "://" in r["c1"]
    )
    forms = {r["c1"] for r in out}
    assert "https://ex.com/p?q=1" in forms      # all dup params gone
    assert "https://ex.com/p?next=/a//b/" in forms  # query slashes kept
    assert "example.com/a" in forms             # scheme-less passthrough


def test_scd2_replay_matches_reference_model(spark):
    """SCD2 state machine vs a dict reference model: after applying K
    random batches in sequence, (a) the current rows equal the model's
    final state, (b) every live key has exactly one current row,
    (c) per-key validity windows chain contiguously (each closed row's
    valid_to is the next version's valid_from), and (d) replaying the
    last batch is a no-op."""
    from legendary_data_pipeline_spark.operators.upsert import scd2_apply

    batch_strategy = st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),        # key
                st.integers(min_value=0, max_value=3),        # price
            ),
            min_size=1,
            max_size=5,
            unique_by=lambda t: t[0],                         # key-unique
        ),
        min_size=1,
        max_size=4,
    )

    @settings(max_examples=10, deadline=None)
    @given(batch_strategy)
    def check(batches):
        dim = spark.createDataFrame(
            [],
            "k int, price int, valid_from string, valid_to string,"
            " is_current boolean",
        )
        model: dict[int, int] = {}
        for i, batch in enumerate(batches):
            eff = f"2024-01-{i + 1:02d}"
            updates = spark.createDataFrame(
                [(k, p, eff) for k, p in batch],
                "k int, price int, effective_date string",
            )
            dim = scd2_apply(dim, updates, ["k"], ["price"])
            for k, p in batch:
                model[k] = p
        rows = dim.collect()
        current = {r.k: r.price for r in rows if r.is_current}
        assert current == model
        # One current row per live key.
        from collections import Counter

        cur_counts = Counter(r.k for r in rows if r.is_current)
        assert all(c == 1 for c in cur_counts.values())
        # Windows chain: sort versions per key by valid_from; each closed
        # row hands off exactly at the next row's valid_from, and only
        # the last is open.
        by_key: dict[int, list] = {}
        for r in rows:
            by_key.setdefault(r.k, []).append(r)
        for k, versions in by_key.items():
            versions.sort(key=lambda r: r.valid_from)
            for a, b in zip(versions, versions[1:]):
                assert a.valid_to == b.valid_from, (k, a, b)
                assert not a.is_current
            assert versions[-1].is_current and versions[-1].valid_to is None
        # Replay of the final batch is a pure no-op.
        last_eff = f"2024-01-{len(batches):02d}"
        replay = spark.createDataFrame(
            [(k, p, last_eff) for k, p in batches[-1]],
            "k int, price int, effective_date string",
        )
        again = scd2_apply(dim, replay, ["k"], ["price"])
        key = lambda r: (r.k, r.valid_from)
        assert {key(r): tuple(r) for r in again.collect()} == {
            key(r): tuple(r) for r in rows
        }

    check()


def test_versioned_upsert_replay_matches_reference_model(spark, tmp_path):
    """Versioned-table merge vs a dict model: after K random keyed
    batches, the latest snapshot equals the model, EVERY historical
    version equals the model's state at that point, and rollback to any
    version reproduces it exactly."""
    import shutil

    from legendary_data_pipeline_spark.sources.versioned import (
        read_version,
        rollback,
        upsert_version,
    )

    batch_strategy = st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=4),
                st.integers(min_value=0, max_value=2),
            ),
            min_size=1,
            max_size=4,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=3,
    )

    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(batch_strategy)
    def check(batches):
        counter[0] += 1
        table = str(tmp_path / f"t{counter[0]}")
        shutil.rmtree(table, ignore_errors=True)
        model: dict[int, int] = {}
        states = []
        for batch in batches:
            df = spark.createDataFrame(batch, "k int, v int")
            upsert_version(df, table, ["k"])
            model.update(dict(batch))
            states.append(dict(model))
        for version, snapshot in enumerate(states, start=1):
            got = {
                r.k: r.v for r in read_version(spark, table, version).collect()
            }
            assert got == snapshot, (version, got, snapshot)
        rb = rollback(spark, table, 1)
        got = {r.k: r.v for r in read_version(spark, table, rb).collect()}
        assert got == states[0]

    check()
