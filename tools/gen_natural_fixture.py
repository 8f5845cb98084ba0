#!/usr/bin/env python
"""Generate the NATURAL-distribution scale fixtures (round 7).

The old scale fixture (benchdata/sf1) is a 10x VERBATIM replica of
/root/testdata/sf0.1 — fine for shuffle-volume probes, pathological for
anything duplicate-sensitive (every row has 9 exact copies, inflating
the dup graph ~45x). These fixtures instead use the seeded synthetic
corpus source (sources/synthetic.py) with an open Zipf-ish vocabulary
and a controlled 2% planted near-duplicate rate, at two scales with the
SAME distribution:

    benchdata/natural/sf01/documents.parquet   —  5,000 docs
    benchdata/natural/sf1/documents.parquet    — 50,000 docs (10x)

so a probe ratio between them measures the PLAN's scaling, not a
fixture artifact. Usage:  python tools/gen_natural_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legendary_data_pipeline_spark.session import get_spark  # noqa: E402
from legendary_data_pipeline_spark.sources.synthetic import (  # noqa: E402
    register_synthetic_source,
)

OUT_BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata",
    "natural",
)
SEED = 20260814
VOCAB = 1500
DUP_PPM = 20_000  # 2% planted near-dups


def main() -> None:
    spark = get_spark(
        app_name="gen-natural-fixture",
        master="local[16]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    register_synthetic_source(spark)
    for name, n_rows, n_parts in (("sf01", 5_000, 8), ("sf1", 50_000, 16)):
        out = os.path.join(OUT_BASE, name)
        df = (
            spark.read.format("synthetic_docs")
            .option("numRows", n_rows)
            .option("numPartitions", n_parts)
            .option("seed", SEED)
            .option("vocabSize", VOCAB)
            .option("dupPpm", DUP_PPM)
            .load()
        )
        df.coalesce(max(1, n_parts // 4)).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        print(f"{name}: {n_rows} docs -> {out}/documents.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
