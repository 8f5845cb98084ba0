#!/usr/bin/env python
"""Engine-environment probe (round-9 VERDICT #6).

Prints the library versions and a canary row of representation-fragile
values pushed through BOTH engines (Spark and DuckDB), each rendered as
raw bits (float.hex) so a cross-environment diff is a one-line compare
instead of a mystery red driver cell (the r8 `st_kendall_tau_qty_discount`
lesson: both engines agreed bit-for-bit locally, yet the driver's
environment hashed a different value for a `round(double, 6)` output).

Canaries, chosen to exercise every canonicalization path the gate uses:
  d_round6     round(ln(3), 6)           -> DOUBLE (the fragile form)
  d_e6         cast(round(ln(3)*1e6) as bigint) -> exact integer form
  d_fmt        printf/format_string('%.6f', ln(3)) -> string form
  dec38        sum of two large decimal(38,0) literals -> exact decimal
  d_div        1.0/3.0                   -> raw IEEE division bits

Usage: python tools/envprobe.py  (records a compact JSON line)
"""

from __future__ import annotations

import json
import math
import platform
import struct
import sys


def _bits(v) -> str:
    if isinstance(v, float):
        return struct.pack(">d", v).hex()
    return repr(v)


def main() -> None:
    out: dict = {"python": platform.python_version()}
    for mod in ("pyspark", "duckdb", "pyarrow", "pandas", "numpy"):
        try:
            m = __import__(mod)
            out[mod] = getattr(m, "__version__", "?")
        except Exception as exc:  # pragma: no cover - probe must not die
            out[mod] = f"import-failed: {exc}"

    import duckdb

    duck = duckdb.sql(
        """
        SELECT round(ln(3.0), 6) AS d_round6,
               CAST(round(ln(3.0) * 1e6) AS BIGINT) AS d_e6,
               printf('%.6f', ln(3.0)) AS d_fmt,
               CAST('99999999999999999999' AS DECIMAL(38,0))
                 + CAST('1' AS DECIMAL(38,0)) AS dec38,
               1.0 / 3.0 AS d_div
        """
    ).fetchall()[0]

    from legendary_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="ldp-envprobe",
                      extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    srow = spark.sql(
        """
        SELECT round(ln(3.0), 6) AS d_round6,
               CAST(round(ln(3.0) * 1e6) AS BIGINT) AS d_e6,
               format_string('%.6f', ln(3.0)) AS d_fmt,
               CAST('99999999999999999999' AS DECIMAL(38,0))
                 + CAST('1' AS DECIMAL(38,0)) AS dec38,
               CAST(1.0 AS DOUBLE) / CAST(3.0 AS DOUBLE) AS d_div
        """
    ).collect()[0]
    out["java"] = spark.sparkContext._jvm.java.lang.System.getProperty(
        "java.version"
    )

    names = ["d_round6", "d_e6", "d_fmt", "dec38", "d_div"]
    out["canary"] = {
        n: {"duckdb": _bits(duck[i]), "spark": _bits(srow[i]),
            "match": _bits(duck[i]) == _bits(srow[i])}
        for i, n in enumerate(names)
    }
    out["python_round6"] = _bits(round(math.log(3.0), 6))
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
