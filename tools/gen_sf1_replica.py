#!/usr/bin/env python
"""Rebuild the RELATIONAL tables of the benchdata/sf1 scale fixture.

benchdata/sf1 is the gitignored 10x replica of /root/testdata/sf0.1
used by the per-round scale probes (SCALE.md). The corpus axes
(documents / embeddings / events) have their own rebuild recipes with
per-axis perturbation stories (NOTES.md r10-r13) and are NOT touched
here unless --all is given; this script (re)builds the TPC-H-ish
relational tables the r14 promotions probe against:

  orders, lineitem, customer, part  — 10x with coherent key offsets,
      +i-cent price perturbation per replica i (so distinct-value rank
      frames grow ~10x like a natural corpus, the r9 lesson), and
      name suffixes on customer/part (so name-keyed blocking/ER frames
      grow instead of collapsing onto 9 exact copies);
  supplier, nation, region          — copied verbatim (small dims).

Dates/timestamps are NOT shifted: the replica grows the RATE axis
(10x rows, same span), which is what day-grain operators claim to be
bounded by. Usage: python tools/gen_sf1_replica.py [--all]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "benchdata",
    "sf1",
)
REPLICAS = 10


def _copy(sql: str, table: str) -> None:
    out = os.path.join(DST, f"{table}.parquet")
    duckdb.sql(
        f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
    )
    n = duckdb.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows -> {out}")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    rng = f"range({REPLICAS})"  # replica index i = 0..9; i=0 is verbatim

    ok = duckdb.sql(
        f"SELECT max(o_orderkey) FROM '{SRC}/orders.parquet'"
    ).fetchone()[0] + 1
    ck = duckdb.sql(
        f"SELECT max(c_custkey) FROM '{SRC}/customer.parquet'"
    ).fetchone()[0] + 1
    pk = duckdb.sql(
        f"SELECT max(p_partkey) FROM '{SRC}/part.parquet'"
    ).fetchone()[0] + 1

    _copy(
        f"""
        SELECT o_orderkey + i * {ok} AS o_orderkey,
               o_custkey + i * {ck} AS o_custkey,
               o_orderstatus,
               o_totalprice + i * 0.01 AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet', (SELECT range AS i FROM {rng})
        """,
        "orders",
    )
    _copy(
        f"""
        SELECT l_orderkey + i * {ok} AS l_orderkey,
               l_partkey + i * {pk} AS l_partkey,
               l_suppkey, l_linenumber, l_quantity,
               l_extendedprice + i * 0.01 AS l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet', (SELECT range AS i FROM {rng})
        """,
        "lineitem",
    )
    _copy(
        f"""
        SELECT c_custkey + i * {ck} AS c_custkey,
               CASE WHEN i = 0 THEN c_name
                    ELSE c_name || ' r' || CAST(i AS VARCHAR) END AS c_name,
               c_nationkey,
               c_acctbal + i * 0.01 AS c_acctbal,
               c_mktsegment
        FROM '{SRC}/customer.parquet', (SELECT range AS i FROM {rng})
        """,
        "customer",
    )
    _copy(
        f"""
        SELECT p_partkey + i * {pk} AS p_partkey,
               CASE WHEN i = 0 THEN p_name
                    ELSE p_name || ' r' || CAST(i AS VARCHAR) END AS p_name,
               p_brand, p_type, p_size,
               p_retailprice + i * 0.01 AS p_retailprice
        FROM '{SRC}/part.parquet', (SELECT range AS i FROM {rng})
        """,
        "part",
    )
    for dim in ("supplier", "nation", "region"):
        _copy(f"SELECT * FROM '{SRC}/{dim}.parquet'", dim)

    if "--all" in sys.argv:
        # Corpus axes (r16: committed here instead of living as
        # git-history snippets — the r10–r13 replica constructions,
        # verbatim):
        #   events — RATE growth (10x rows, SAME span): user/event id
        #     offsets per replica, +i-cent value perturbation, +i us
        #     ts jitter (ts is integer nanos).
        #   documents — 10x verbatim with offset doc_ids (verbatim
        #     duplication is the deliberate dup-graph stress).
        #   embeddings — offset vec_ids + per-replica first-coordinate
        #     perturbation (so replicas are near- but not exact dups).
        ek = duckdb.sql(
            f"SELECT max(event_id) FROM '{SRC}/events.parquet'"
        ).fetchone()[0] + 1
        uk = duckdb.sql(
            f"SELECT max(user_id) FROM '{SRC}/events.parquet'"
        ).fetchone()[0] + 1
        _copy(
            f"""
            SELECT event_id + i * {ek} AS event_id,
                   ts + i * INTERVAL 1 MICROSECOND AS ts,
                   user_id + i * {uk} AS user_id,
                   event_type,
                   value + i * 0.01 AS value,
                   props
            FROM '{SRC}/events.parquet', (SELECT range AS i FROM {rng})
            """,
            "events",
        )
        dk = duckdb.sql(
            f"SELECT max(doc_id) FROM '{SRC}/documents.parquet'"
        ).fetchone()[0] + 1
        _copy(
            f"""
            SELECT doc_id + i * {dk} AS doc_id, text, lang, source, n_chars
            FROM '{SRC}/documents.parquet', (SELECT range AS i FROM {rng})
            """,
            "documents",
        )
        vk = duckdb.sql(
            f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'"
        ).fetchone()[0] + 1
        _copy(
            f"""
            SELECT vec_id + i * {vk} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_concat(
                            [CAST(embedding[1] + i * 0.0001 AS FLOAT)],
                            embedding[2:]) END AS embedding,
                   label
            FROM '{SRC}/embeddings.parquet', (SELECT range AS i FROM {rng})
            """,
            "embeddings",
        )


if __name__ == "__main__":
    main()
