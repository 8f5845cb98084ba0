"""Custom Python DataSource: deterministic synthetic corpus generator.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets the
engine expose first-class `spark.read.format(...)` sources written in
Python. This one generates a seeded synthetic `documents`-shaped corpus
WITHOUT any files on disk — the tool for load tests, shuffle/skew
experiments, and benchmarking operators at arbitrary scale (think
Spark's built-in `rate` source, but batch, corpus-shaped, and
bit-reproducible).

Scale design: generation is partition-parallel — `partitions()` splits
the row range into `numPartitions` disjoint slices and each task
generates only its slice, so a 10^9-row corpus is produced by 10^3
independent tasks with zero driver involvement beyond planning. Every
row is a pure function of (seed, row index): two reads with the same
options are bit-identical, reads with more partitions produce the SAME
rows (partitioning only changes task boundaries) — the property the
determinism test pins.

Rows deliberately mirror `/root/testdata`'s `documents` schema
(doc_id, text, lang, source, n_chars) so every text operator in the
engine can run against a generated corpus unchanged. Vocabulary is
drawn per-row from a small closed word list via a splitmix64-style
integer mix — no Python `random` (hidden global state), so rows are
reproducible regardless of task scheduling.

Usage:
    register_synthetic_source(spark)   # ships the package + registers
    df = (spark.read.format("synthetic_docs")
          .option("numRows", 100_000)
          .option("numPartitions", 32)
          .option("seed", 7)
          .load())

Use `register_synthetic_source`, not a bare
`spark.dataSource.register`: the DataSource class pickles BY REFERENCE
(module path), so executor workers must be able to import this package
— the helper routes through `session.ship_package` first, which is
what makes registration work from a foreign cwd / external driver.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

_LANGS = ["en", "de", "fr", "es", "it"]
_WORDS = [
    "data", "spark", "query", "join", "shuffle", "filter", "column",
    "window", "stream", "batch", "token", "model", "train", "sample",
    "hash", "merge", "scan", "sort", "group", "count",
]

_MASK = (1 << 64) - 1


def _mix(x: int) -> int:
    """splitmix64 finalizer — a bijective 64-bit mix; the per-row PRNG."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _base_words(seed: int, i: int, vocab_size: int) -> list[str]:
    """The word list of row i BEFORE any duplicate substitution — a pure
    function of (seed, i), so any row can regenerate any other row's
    base text locally (what makes planted near-dups partition-parallel).

    vocab_size == 0 → the legacy closed 20-word list (uniform draw).
    vocab_size > 0  → synthetic words w0000..w{V-1} with a power-law-ish
    rank bias (square of a uniform draw concentrates mass on low ranks),
    approximating natural-text Zipf so shingle document-frequencies have
    a realistic head/tail instead of a uniform grid.
    """
    h = _mix((seed << 32) ^ i)
    n_words = 5 + (h & 0x3F)  # 5..68 words
    words = []
    w = h
    for _ in range(n_words):
        w = _mix(w)
        if vocab_size > 0:
            u = w / float(_MASK + 1)  # uniform [0, 1)
            words.append(f"w{int(vocab_size * u * u):04d}")
        else:
            words.append(_WORDS[w % len(_WORDS)])
    return words


def _row(seed: int, i: int, vocab_size: int = 0, dup_ppm: int = 0):
    """Row i. With dup_ppm > 0, ~dup_ppm/1e6 of rows (i > 0) are planted
    NEAR-duplicates: the base text of an earlier row within a 1000-row
    window with exactly one word substituted — high-Jaccard pairs at a
    controlled, natural-corpus-like rate (vs. the pathological 10×
    verbatim replica the old sf1 bench fixture used)."""
    h = _mix((seed << 32) ^ i)
    d = _mix(h ^ 0xD0D0)
    if i > 0 and dup_ppm > 0 and (d % 1_000_000) < dup_ppm:
        j = i - 1 - (_mix(d) % min(i, 1000))
        words = _base_words(seed, j, vocab_size)
        words[_mix(d ^ 1) % len(words)] = (
            f"w{_mix(d ^ 2) % max(vocab_size, 1):04d}"
            if vocab_size > 0
            else _WORDS[_mix(d ^ 2) % len(_WORDS)]
        )
    else:
        words = _base_words(seed, i, vocab_size)
    text = " ".join(words)
    lang = _LANGS[(h >> 8) % len(_LANGS)]
    source = f"src{(h >> 16) % 8}"
    return (i, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class _SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("numRows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 0))
        # 0 → legacy 20-word closed vocabulary (back-compat default)
        self.vocab_size = int(options.get("vocabSize", 0))
        # planted near-duplicate rate in parts-per-million of rows
        self.dup_ppm = int(options.get("dupPpm", 0))

    def partitions(self):
        if self.n_rows <= 0:
            # One empty-range partition: an empty read, not a
            # range(step=0) ValueError. (An empty list is not an option
            # — Spark still schedules one task with partition=None.)
            return [_RangePartition(0, 0, self.seed)]
        n = max(1, min(self.n_parts, self.n_rows))
        step = -(-self.n_rows // n)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.n_rows), self.seed)
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i, self.vocab_size, self.dup_ppm)


class SyntheticDocsDataSource(DataSource):
    """`spark.read.format("synthetic_docs")` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticDocsReader(self.options)


def register_synthetic_source(spark) -> None:
    """Register the source on `spark`, shipping the package to executor
    Python workers first (see module docstring)."""
    from legendary_data_pipeline_spark.session import ship_package

    ship_package(spark)
    spark.dataSource.register(SyntheticDocsDataSource)
