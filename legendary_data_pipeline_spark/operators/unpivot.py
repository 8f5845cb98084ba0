"""Unpivot: wide columns → (key, value) rows (SURVEY.md §2.3 J2, §2.7 U1).

The reference turns one JSONB row into ≤5 (currency, price_type, value)
rows with `CROSS JOIN LATERAL (VALUES ...)`
(`scripts/pricing/02_normalize_scryfall_prices.js:101-153`).

Spark-first: `inline(array(struct(...)))` — a generator expression
evaluated inline per input row (no shuffle, no join), the direct
equivalent of the lateral VALUES.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot(
    df: DataFrame,
    id_cols: Sequence[str],
    spec: Sequence[tuple[str, Column]],
    key_name: str = "metric",
    value_name: str = "value",
    drop_null_values: bool = True,
) -> DataFrame:
    """Unpivot `spec` = [(key_literal, value_expr), ...] into rows."""
    entries = F.array(
        *[
            F.struct(F.lit(key).alias(key_name), value_expr.alias(value_name))
            for key, value_expr in spec
        ]
    )
    out = df.select(*[F.col(c) for c in id_cols], F.inline(entries))
    if drop_null_values:
        out = out.filter(F.col(value_name).isNotNull())
    return out
