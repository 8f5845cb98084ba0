"""Named query registry — the driver-contract surface.

Each entry pairs a PySpark DataFrame program with the equivalent ANSI SQL
(run by DuckDB on the same parquet) so the correctness driver can
hash-compare results at sf0.01. Names reference SURVEY.md §2 operator ids.

Cross-engine determinism conventions (why the queries look the way they
do — the driver compares order-insensitive VALUE HASHES, so every output
cell must be bit-identical across Spark and DuckDB):

- Money: parse/compute in DecimalType, emit integer cents (LongType).
  Never sum raw doubles (float addition order differs across engines).
- Temporal: emit formatted strings (`yyyy-MM-dd`) — avoids tz/precision
  representation differences. `events.ts` is handled as integer
  nanoseconds end-to-end (Spark cannot read TIMESTAMP(NANOS) parquet
  natively; DuckDB can — integer math sidesteps both).
- Ranking: every window ordering is a total order (unique tie-breaker
  columns appended) so row_number picks identical rows in both engines.
- Percentiles: `percentile()` (exact) matches DuckDB `quantile_cont`
  bit-for-bit on doubles — verified, and covered by tests.
- Statistics (round-9 e6 convention): any value that would end in a
  FRACTIONAL `round(double, k)` is emitted instead as the exact
  integer `round(x * 1e6)` BIGINT (`_e6` / `_e6_sql`). Fractional
  double rounding is not engine-version-canonical — DuckDB changed its
  algorithm across releases, which is what turned the r8
  `st_kendall_tau_qty_discount` driver cell red while every local run
  was bit-identical. Scale-0 rounding is nearest-integer everywhere,
  and integers survive any harness canonicalization. Raw doubles are
  still fine when they are one shared IEEE expression tree over exact
  inputs (ratios of integers, sqrt/div of decimal moments) — IEEE
  mandates correct rounding for + - * / sqrt, so those match
  bit-for-bit WITHOUT any rounding; the rule is "never let an engine's
  fractional round be the last op before the driver hash".
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from legendary_data_pipeline_spark.catalog import load_table
from legendary_data_pipeline_spark.functions.money import (
    cents_to_display,
    parse_money_to_cents,
)
from legendary_data_pipeline_spark.functions.priority import priority_rank
from legendary_data_pipeline_spark.functions.text import sanitize_field
from legendary_data_pipeline_spark.operators.ranking import best_of_group
from legendary_data_pipeline_spark.operators.unpivot import unpivot
from legendary_data_pipeline_spark.operators.upsert import upsert
from legendary_data_pipeline_spark.session import ensure_engine_confs

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""
    # Scan-multiplicity budget (r11 verdict #3, standing gate): the max
    # number of parquet FileScans in this query's executed-plan string
    # as captured by tools/scan_audit.py — a pre-AQE-reuse count, i.e.
    # conservative (runtime exchange reuse can only lower it, and the
    # r11 audit lesson is that reuse is not a guarantee).
    # None → the default budget of 2 (one corpus scan + one
    # auxiliary side). A query whose contract NEEDS more (multi-source
    # coalesce, exact-vs-sketch harness, single-column FK probes) must
    # declare the higher budget here WITH the rationale in `doc` — the
    # declaration is the machine-readable by-contract marker that
    # tests/test_scan_budget.py enforces for every newly-registered
    # query (the r11 registry-wide audit found 13 silent corpus
    # re-reads; this keeps new ones from landing).
    scan_budget: int | None = None


REGISTRY: dict[str, QuerySpec] = {}

# Driver-contract budget: the correctness gate records rows for the FIRST
# 50 registry entries only (observed round 1: bench ran all 51 queries,
# CORRECTNESS_r01 recorded exactly the first 50 in registration order and
# dropped the 51st). Entries beyond the cap would silently get no
# correctness row, so the driver-visible registry is curated to ≤50 and
# everything else lives in SHADOW_REGISTRY — same QuerySpec shape, same
# DuckDB-oracle pytest coverage (tests/test_queries_oracle.py), just not
# exported through __spark_entry__.queries().
DRIVER_QUERY_CAP = 50

SHADOW_REGISTRY: dict[str, QuerySpec] = {}


def _make_spec(
    name: str,
    fn: SparkQuery,
    oracle: str | None,
    doc: str,
    scan_budget: int | None = None,
) -> QuerySpec:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_engine_confs(spark)
        return fn(spark, sf_dir)

    return QuerySpec(name, wrapped, oracle, doc, scan_budget)


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    scan_budget: int | None = None,
):
    def deco(fn: SparkQuery) -> SparkQuery:
        spec = _make_spec(name, fn, oracle, doc, scan_budget)
        REGISTRY[name] = spec
        return spec.spark_fn

    return deco


def register_shadow(
    name: str,
    oracle: str | None,
    doc: str = "",
    scan_budget: int | None = None,
):
    """Register a query for pytest-only oracle verification (not exported
    to the driver gate — see DRIVER_QUERY_CAP)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        spec = _make_spec(name, fn, oracle, doc, scan_budget)
        SHADOW_REGISTRY[name] = spec
        return spec.spark_fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }


# ---------------------------------------------------------------------------
# shared expression snippets
# ---------------------------------------------------------------------------

def _cents(col_name: str) -> F.Column:
    """Exact double→integer-cents conversion (money convention)."""
    return (
        F.round(F.col(col_name).cast("decimal(18,2)") * 100, 0).cast("long")
    )


def _cents_sql(expr: str) -> str:
    return f"CAST(round(CAST({expr} AS DECIMAL(18,2)) * 100, 0) AS BIGINT)"


def _e6(col: F.Column) -> F.Column:
    """Canonical micro-scaled integer for a double statistic.

    Round-9 representation convention for driver-gate outputs: a
    fractional `round(x, 6)` DOUBLE is NOT engine-version-canonical
    (DuckDB changed its double-round algorithm across releases — the r8
    `st_kendall_tau_qty_discount` red cell; see NOTES.md §Round-9), so
    gate statistics leave the engine as `round(x * 1e6)` BIGINT instead:
    scale-0 rounding of a double is nearest-integer in every engine, a
    1-ulp upstream difference (libm ln/exp, round path) cannot move the
    integer except on exact .5 ties, and integers hash identically under
    any harness canonicalization. Pair with `_e6_sql` in the oracle.
    """
    return F.round(col.cast("double") * F.lit(1e6)).cast("long")


def _e6_sql(expr: str) -> str:
    """DuckDB twin of `_e6` — same expression tree, same semantics."""
    return f"CAST(round((CAST({expr} AS DOUBLE)) * 1e6) AS BIGINT)"


# ---------------------------------------------------------------------------
# W1/W2/A4 — priority-ranked best-of-group (the reference's flagship)
# ---------------------------------------------------------------------------

_W1_SRC_LADDER = {"N": 10, "A": 20, "R": 30}
_W1_TYPE_LADDER = {"O": 10, "F": 20}


@register(
    "w1_priority_best_of_day",
    f"""
    WITH ranked AS (
      SELECT l_orderkey, l_returnflag, l_linestatus, l_extendedprice, l_linenumber,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY CASE l_returnflag WHEN 'N' THEN 10 WHEN 'A' THEN 20 WHEN 'R' THEN 30 ELSE 99 END ASC,
                        CASE l_linestatus WHEN 'O' THEN 10 WHEN 'F' THEN 20 ELSE 90 END ASC,
                        l_extendedprice DESC, l_linenumber ASC) AS rn
      FROM lineitem)
    SELECT l_orderkey,
           l_returnflag AS best_source,
           l_linestatus AS best_type,
           {_cents_sql('l_extendedprice')} AS value_cents
    FROM ranked WHERE rn = 1
    """,
    doc="Priority-ladder best-of-group (reference 03_build_market_price_daily.js:107-170): "
    "rank rows per group by two CASE ladders then value DESC, keep rn=1.",
)
def w1_priority_best_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    src_rank = priority_rank(F.col("l_returnflag"), _W1_SRC_LADDER, 99)
    type_rank = priority_rank(F.col("l_linestatus"), _W1_TYPE_LADDER, 90)
    best = best_of_group(
        li,
        ["l_orderkey"],
        [
            src_rank.asc(),
            type_rank.asc(),
            F.col("l_extendedprice").desc(),
            F.col("l_linenumber").asc(),
        ],
    )
    return best.select(
        "l_orderkey",
        F.col("l_returnflag").alias("best_source"),
        F.col("l_linestatus").alias("best_type"),
        _cents("l_extendedprice").alias("value_cents"),
    )


# ---------------------------------------------------------------------------
# A1/A2/A6/J9/P6 — percentile rollup over a trailing window + last-sale
# ---------------------------------------------------------------------------

@register(
    "a1_percentile_rollup_180d",
    """
    WITH cutoff AS (SELECT max(l_shipdate) - INTERVAL 180 DAY AS c FROM lineitem),
    w AS (SELECT l.* FROM lineitem l, cutoff WHERE l.l_shipdate >= cutoff.c),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag, l_linestatus
        ORDER BY l_shipdate DESC, l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      FROM w),
    stats AS (
      SELECT l_returnflag, l_linestatus,
             quantile_cont(l_extendedprice, 0.25) AS p25,
             quantile_cont(l_extendedprice, 0.5)  AS p50,
             quantile_cont(l_extendedprice, 0.75) AS p75,
             COUNT(*) AS sales_count,
             strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship,
             max(CASE WHEN rn = 1 THEN l_extendedprice END) AS last_sale_price
      FROM ranked GROUP BY l_returnflag, l_linestatus)
    SELECT *, CASE WHEN sales_count >= 10 THEN 'A' WHEN sales_count >= 5 THEN 'B'
                   WHEN sales_count >= 2 THEN 'C' ELSE 'D' END AS confidence
    FROM stats
    """,
    doc="Percentile stats + deterministic last-sale over a 180-day lookback "
    "(reference 10_rollup_market_values_daily.mjs:33-92). The correlated "
    "LIMIT-1 subquery becomes a window top-1 in the same shuffle as the agg.",
)
def a1_percentile_rollup_180d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.operators.rollup import percentile_rollup

    li = load_table(spark, sf_dir, "lineitem")
    max_ship = li.agg(F.max("l_shipdate").alias("max_ship"))
    windowed = li.join(F.broadcast(max_ship)).filter(
        F.col("l_shipdate") >= F.col("max_ship") - F.expr("INTERVAL 180 DAYS")
    )
    rolled = percentile_rollup(
        windowed,
        ["l_returnflag", "l_linestatus"],
        value_col="l_extendedprice",
        ts_col="l_shipdate",
        tie_breakers=["l_extendedprice", "l_orderkey", "l_linenumber"],
    )
    return rolled.select(
        "l_returnflag",
        "l_linestatus",
        "p25",
        "p50",
        "p75",
        "sales_count",
        F.date_format("last_ts", "yyyy-MM-dd").alias("last_ship"),
        F.col("last_value").alias("last_sale_price"),
        "confidence",
    )


# ---------------------------------------------------------------------------
# A3 — per-user totals (replaces the reference's driver-side Map loop)
# ---------------------------------------------------------------------------

@register(
    "a3_user_event_totals",
    """
    SELECT user_id,
           COUNT(*) AS events,
           CAST(SUM(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)) AS BIGINT)
             AS total_value_cents,
           COUNT(DISTINCT event_type) AS distinct_event_types
    FROM events GROUP BY user_id
    """,
    doc="Per-user aggregation (reference revalueCollection.mjs:56-103): the "
    "single-threaded JS Map accumulator becomes one groupBy with map-side "
    "partial aggregation. Money summed as integer cents.",
)
def a3_user_event_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum(_cents("value")).alias("total_value_cents"),
        F.countDistinct("event_type").alias("distinct_event_types"),
    )


# ---------------------------------------------------------------------------
# J1 — cast-bridged equi join
# ---------------------------------------------------------------------------

@register(
    "j1_cast_bridged_join",
    f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS orders,
           CAST(SUM({_cents_sql('o.o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders o
    JOIN customer c ON CAST(o.o_custkey AS VARCHAR) = CAST(c.c_custkey AS VARCHAR)
    GROUP BY c.c_mktsegment
    """,
    doc="Cast-bridged inner equi join (reference 02_normalize_scryfall_prices.js:84-85: "
    "`scr.id::text = mi.canonical_id`).",
)
def j1_cast_bridged_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        customer,
        orders["o_custkey"].cast("string") == customer["c_custkey"].cast("string"),
        "inner",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("orders"),
        F.sum(_cents("o_totalprice")).alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# J3/J4/J5 — compound-predicate left outer join
# ---------------------------------------------------------------------------

@register(
    "j3_compound_left_join",
    """
    SELECT o.o_orderkey, o.o_orderstatus, c.c_name
    FROM orders o
    LEFT JOIN customer c ON o.o_orderstatus = 'O' AND o.o_custkey = c.c_custkey
    """,
    doc="Left join with a compound predicate mixing a constant filter into the "
    "join condition (reference exportGoogleMerchantFeed.mjs:271-281: "
    "`p.game='pokemon' AND tcg.id = p.card_id`).",
)
def j3_compound_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        customer,
        (orders["o_orderstatus"] == "O")
        & (orders["o_custkey"] == customer["c_custkey"]),
        "left",
    ).select("o_orderkey", "o_orderstatus", "c_name")


# ---------------------------------------------------------------------------
# J6/P8 — null-safe anti join (insert-missing)
# ---------------------------------------------------------------------------

@register(
    "j6_anti_join_missing",
    """
    SELECT l.l_orderkey, l.l_linenumber
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderstatus = 'F'
        AND o.o_orderkey IS NOT DISTINCT FROM l.l_orderkey)
    """,
    doc="Anti join via NOT EXISTS with null-safe key equality (reference "
    "02_normalize_scryfall_prices.js:183-192 + IS NOT DISTINCT FROM at :172).",
)
def j6_anti_join_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    target = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return li.join(
        target, li["l_orderkey"].eqNullSafe(target["o_orderkey"]), "left_anti"
    ).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# J7/J8/F12/U2 — broadcast multi-source price resolution with fallback
# ---------------------------------------------------------------------------

@register(
    "j7_price_resolution_coalesce",
    f"""
    WITH tp AS (
      SELECT p_partkey, {_cents_sql('p_retailprice')} AS tp_cents
      FROM part WHERE p_size % 3 <> 0),
    eb AS (
      SELECT p_partkey, ({_cents_sql('p_retailprice')} * 9) // 10 AS eb_cents
      FROM part WHERE p_size % 2 = 0)
    SELECT l.l_orderkey, l.l_linenumber,
           COALESCE(tp.tp_cents, eb.eb_cents) AS resolved_cents,
           CASE WHEN tp.tp_cents IS NOT NULL THEN 'tcgplayer'
                WHEN eb.eb_cents IS NOT NULL THEN 'ebay'
                ELSE 'none' END AS price_source
    FROM lineitem l
    LEFT JOIN tp ON tp.p_partkey = l.l_partkey
    LEFT JOIN eb ON eb.p_partkey = l.l_partkey
    """,
    doc="Multi-source price resolution (reference revalueCollection.mjs:50-54,"
    "186-290): the driver-side hash Maps become broadcast hash joins; the "
    "eBay-fallback-when-absent rule (mjs:214-224) becomes COALESCE over "
    "left-join results.",
)
def j7_price_resolution_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    tp = part.filter(F.col("p_size") % 3 != 0).select(
        F.col("p_partkey").alias("tp_key"), _cents("p_retailprice").alias("tp_cents")
    )
    eb = part.filter(F.col("p_size") % 2 == 0).select(
        F.col("p_partkey").alias("eb_key"),
        F.expr(
            "(CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT) * 9) DIV 10"
        ).alias("eb_cents"),
    )
    resolved = (
        li.join(F.broadcast(tp), li["l_partkey"] == tp["tp_key"], "left")
        .join(F.broadcast(eb), li["l_partkey"] == eb["eb_key"], "left")
    )
    return resolved.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("tp_cents"), F.col("eb_cents")).alias("resolved_cents"),
        F.when(F.col("tp_cents").isNotNull(), "tcgplayer")
        .when(F.col("eb_cents").isNotNull(), "ebay")
        .otherwise("none")
        .alias("price_source"),
    )


# ---------------------------------------------------------------------------
# J2/U1/P4 — lateral unpivot
# ---------------------------------------------------------------------------

@register(
    "j2_unpivot_part_metrics",
    f"""
    SELECT * FROM (
      SELECT p_partkey, 'retail_cents' AS metric,
             {_cents_sql('p_retailprice')} AS value FROM part
      UNION ALL
      SELECT p_partkey, 'size' AS metric, CAST(p_size AS BIGINT) AS value FROM part
    ) u WHERE value IS NOT NULL AND value > 0
    """,
    doc="Wide→long unpivot (reference 02_normalize_scryfall_prices.js:101-153 "
    "CROSS JOIN LATERAL (VALUES ...)): inline generator per row, no shuffle; "
    "null/non-positive values dropped (P4, 02:154-155).",
)
def j2_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    long_df = unpivot(
        part,
        ["p_partkey"],
        [
            ("retail_cents", _cents("p_retailprice")),
            ("size", F.col("p_size").cast("long")),
        ],
        key_name="metric",
        value_name="value",
        drop_null_values=True,
    )
    return long_df.filter(F.col("value") > 0)


# ---------------------------------------------------------------------------
# F1 — money-string parsing (reference centsFromMoney)
# ---------------------------------------------------------------------------

@register(
    "f1_money_parse_cents",
    f"""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber = 7 THEN NULL
                ELSE {_cents_sql('l_extendedprice')} END AS parsed_cents
    FROM lineitem
    """,
    doc="Money-string → integer cents (reference 01_import_pricecharting_csv.js:78-90). "
    "Spark side renders '$1,234.56' strings (integer string-building) then "
    "parses them back; the oracle computes the expected cents directly, so "
    "this checks the full parse path incl. junk rejection.",
)
def f1_money_parse_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    whole = F.floor(cents / 100).cast("long")
    frac = F.lpad((cents % 100).cast("string"), 2, "0")
    # Thousands separators on the whole part exercise the '[$,]' strip.
    # format_number on the integer part groups with commas exactly (no
    # float rounding involved) and avoids a quadratic lookahead regex.
    with_commas = F.format_number(whole, 0)
    money_str = F.when(F.col("l_linenumber") == 7, F.lit("N/A")).otherwise(
        F.concat(F.lit("$"), with_commas, F.lit("."), frac)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        parse_money_to_cents(money_str).alias("parsed_cents"),
    )


# ---------------------------------------------------------------------------
# F4 — cents → display money string
# ---------------------------------------------------------------------------

@register(
    "f4_cents_display",
    f"""
    SELECT o_orderkey,
           CAST({_cents_sql('o_totalprice')} // 100 AS VARCHAR) || '.' ||
           lpad(CAST({_cents_sql('o_totalprice')} % 100 AS VARCHAR), 2, '0') ||
           ' USD' AS display_price
    FROM orders
    """,
    doc="Integer-cents → '1234.56 USD' display string (reference "
    "exportGoogleMerchantFeed.mjs:78-82) with pure integer string building.",
)
def f4_cents_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        cents_to_display(_cents("o_totalprice")).alias("display_price"),
    )


# ---------------------------------------------------------------------------
# F5 — field sanitization + token counting
# ---------------------------------------------------------------------------

@register(
    "f5_sanitize_documents",
    r"""
    SELECT doc_id,
           substr(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
                                      '\s+', ' ', 'g')), 1, 60) AS head,
           length(trim(regexp_replace(regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
                                      '\s+', ' ', 'g'))) AS clean_len,
           len(regexp_split_to_array(trim(text), '\s+')) AS token_count
    FROM documents
    """,
    doc="Field sanitization (reference exportGoogleMerchantFeed.mjs:84-99): "
    "strip control chars, collapse whitespace, trim; plus whitespace "
    "tokenization stats.",
)
def f5_sanitize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    clean = sanitize_field(F.col("text"))
    return docs.select(
        "doc_id",
        F.substring(clean, 1, 60).alias("head"),
        F.length(clean).cast("long").alias("clean_len"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("token_count"),
    )


# ---------------------------------------------------------------------------
# F8/F9/P3/P9 — JSON extraction with guarded casts
# ---------------------------------------------------------------------------

@register(
    "f8_json_extract_events",
    """
    SELECT event_type,
           COUNT(*) AS events,
           CAST(SUM(CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$')
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS BIGINT)
             AS sum_k,
           CAST(MAX(CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$')
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS BIGINT)
             AS max_k
    FROM events GROUP BY event_type
    """,
    doc="JSON path extraction + regex-guarded numeric cast (reference "
    "02_normalize_scryfall_prices.js:82-88 `payload->...`; guard pattern from "
    "revalueCollection.mjs:196-200).",
)
def f8_json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object(F.col("props"), "$.k")
    k = F.when(k_str.rlike("^[0-9]+$"), k_str).cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# J9/O3 — latest row per group (correlated LIMIT-1 → window top-1)
# ---------------------------------------------------------------------------

@register(
    "o3_latest_order_per_customer",
    f"""
    WITH ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
    SELECT o_custkey,
           strftime(o_orderdate, '%Y-%m-%d') AS last_order_date,
           {_cents_sql('o_totalprice')} AS last_total_cents
    FROM ranked WHERE rn = 1
    """,
    doc="Latest-row-per-group: the reference's correlated `ORDER BY sold_at "
    "DESC LIMIT 1` subquery (10_rollup_market_values_daily.mjs:69-75) as a "
    "window top-1 with a deterministic tie-breaker.",
)
def o3_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    latest = best_of_group(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return latest.select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_order_date"),
        _cents("o_totalprice").alias("last_total_cents"),
    )


# ---------------------------------------------------------------------------
# S5/S6/S8 — upsert semantics as a pure (oracle-checkable) query
# ---------------------------------------------------------------------------

@register(
    "s5_upsert_semantics",
    f"""
    WITH target AS (
      SELECT l_orderkey, l_linenumber, {_cents_sql('l_extendedprice')} AS value_cents
      FROM lineitem WHERE l_linenumber <= 4),
    src AS (
      SELECT l_orderkey, l_linenumber, {_cents_sql('l_extendedprice')} * 2 AS value_cents
      FROM lineitem WHERE l_linenumber >= 4),
    unioned AS (
      SELECT *, 0 AS prec FROM src
      UNION ALL
      SELECT *, 1 AS prec FROM target),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_orderkey, l_linenumber
        ORDER BY prec ASC, value_cents DESC) AS rn
      FROM unioned)
    SELECT l_orderkey, l_linenumber, value_cents FROM ranked WHERE rn = 1
    """,
    doc="Keyed upsert (reference `INSERT ... ON CONFLICT DO UPDATE`, "
    "01:171-186 / 03:191-197 / 10:85-92) as union + key-window dedup with "
    "updates taking precedence — the plain-parquet MERGE fallback.",
)
def s5_upsert_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    target = li.filter(F.col("l_linenumber") <= 4).select(
        "l_orderkey", "l_linenumber", _cents("l_extendedprice").alias("value_cents")
    )
    src = li.filter(F.col("l_linenumber") >= 4).select(
        "l_orderkey",
        "l_linenumber",
        (_cents("l_extendedprice") * 2).alias("value_cents"),
    )
    # The synthetic data contains duplicate (orderkey, linenumber) keys, so
    # a within-source tie-break keeps the merged pick deterministic.
    return upsert(
        target,
        src,
        ["l_orderkey", "l_linenumber"],
        order_within_source=[F.col("value_cents").desc()],
    )


# ---------------------------------------------------------------------------
# O1 — global ordering with NULLS LAST + rank
# ---------------------------------------------------------------------------

@register(
    "o1_rank_nulls_last",
    """
    WITH src AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderdate END AS d
      FROM orders),
    ranked AS (
      SELECT o_orderkey, d,
             ROW_NUMBER() OVER (ORDER BY d ASC NULLS LAST, o_orderkey ASC) AS rn
      FROM src)
    SELECT rn, o_orderkey, strftime(d, '%Y-%m-%d') AS order_date
    FROM ranked WHERE rn <= 100
    """,
    doc="Total ordering with explicit null placement (reference "
    "exportGoogleMerchantFeed.mjs:311 `ORDER BY created_at ASC NULLS LAST, "
    "title ASC`), materialized as a rank so the result set is checkable. "
    "Scale-safe: rather than a global row_number window (single-partition "
    "sort of the whole table), the top-100 is taken with orderBy().limit() "
    "— Spark's TakeOrderedAndProject keeps a bounded per-partition heap "
    "and merges 100 rows per partition on the driver — and only the 100 "
    "surviving rows are ranked (a window over ≤limit rows by contract).",
)
def o1_rank_nulls_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    order_spec = [F.asc_nulls_last("d"), F.asc("o_orderkey")]
    src = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 10 == 0, None)
        .otherwise(F.col("o_orderdate"))
        .alias("d"),
    )
    top = src.orderBy(*order_spec).limit(100)
    window = Window.orderBy(*order_spec)
    return top.select(
        F.row_number().over(window).cast("long").alias("rn"),
        "o_orderkey",
        F.date_format("d", "yyyy-MM-dd").alias("order_date"),
    )


# ---------------------------------------------------------------------------
# U2 — union-by-name of tagged sources
# ---------------------------------------------------------------------------

@register(
    "u2_union_tagged_sources",
    f"""
    SELECT 'customer' AS source, CAST(c_custkey AS BIGINT) AS entity_id,
           c_name AS name, {_cents_sql('c_acctbal')} AS acctbal_cents
    FROM customer
    UNION ALL
    SELECT 'supplier' AS source, CAST(s_suppkey AS BIGINT) AS entity_id,
           s_name AS name, {_cents_sql('s_acctbal')} AS acctbal_cents
    FROM supplier
    """,
    doc="Union of per-source tables tagged with a literal source column "
    "(reference revalueCollection.mjs:50-54,279-290: three per-game price "
    "loaders merged by game dispatch → unionByName with a `game` literal).",
)
def u2_union_tagged_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = customer.select(
        F.lit("customer").alias("source"),
        F.col("c_custkey").cast("long").alias("entity_id"),
        F.col("c_name").alias("name"),
        _cents("c_acctbal").alias("acctbal_cents"),
    )
    s = supplier.select(
        F.lit("supplier").alias("source"),
        F.col("s_suppkey").cast("long").alias("entity_id"),
        F.col("s_name").alias("name"),
        _cents("s_acctbal").alias("acctbal_cents"),
    )
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# F7 — URL/slug building
# ---------------------------------------------------------------------------

@register(
    "f7_url_slug_link",
    """
    SELECT p_partkey,
           'https://example.com/products/' ||
           regexp_replace(regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g'),
                          '(^-)|(-$)', '', 'g') AS link
    FROM part
    """,
    doc="Product URL building from a name (reference "
    "exportGoogleMerchantFeed.mjs:23-27,115-118: origin + encoded slug "
    "path): lowercase slugification + origin concat, all JVM-side regex.",
)
def f7_url_slug_link(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    slug = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("p_name"))), "[^a-z0-9]+", "-"),
        "(^-)|(-$)",
        "",
    )
    return part.select(
        "p_partkey",
        F.concat(F.lit("https://example.com/products/"), slug).alias("link"),
    )


# ---------------------------------------------------------------------------
# F10/F11 — conditional feed mapping + sale-price swap
# ---------------------------------------------------------------------------

@register(
    "f10_conditional_feed_mapping",
    f"""
    WITH src AS (
      SELECT l_orderkey, l_linenumber, l_linestatus, l_quantity,
             {_cents_sql('l_extendedprice')} AS price_cents,
             CASE WHEN l_orderkey % 3 = 0
                  THEN ({_cents_sql('l_extendedprice')} * 11) // 10
                  ELSE ({_cents_sql('l_extendedprice')} * 9) // 10 END AS compare_at_cents
      FROM lineitem)
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linestatus = 'F' OR l_quantity <= 0
                THEN 'out_of_stock' ELSE 'in_stock' END AS availability,
           CASE WHEN l_quantity >= 25 THEN 'true' ELSE 'false' END AS is_bundle,
           CASE WHEN compare_at_cents > price_cents
                THEN compare_at_cents ELSE price_cents END AS display_price_cents,
           CASE WHEN compare_at_cents > price_cents
                THEN price_cents END AS sale_price_cents
    FROM src
    """,
    doc="Conditional feed mapping (reference exportGoogleMerchantFeed.mjs:"
    "120-151 availability/bundle CASE chains) + the sale-price swap "
    "(mjs:324-338: when compare_at > price, display compare_at and mark "
    "price as the sale price).",
)
def f10_conditional_feed_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = _cents("l_extendedprice")
    compare_at = F.when(
        F.col("l_orderkey") % 3 == 0,
        F.floor(price * 11 / 10).cast("long"),
    ).otherwise(F.floor(price * 9 / 10).cast("long"))
    src = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_linestatus",
        "l_quantity",
        price.alias("price_cents"),
        compare_at.alias("compare_at_cents"),
    )
    swap = F.col("compare_at_cents") > F.col("price_cents")
    return src.select(
        "l_orderkey",
        "l_linenumber",
        F.when(
            (F.col("l_linestatus") == "F") | (F.col("l_quantity") <= 0),
            "out_of_stock",
        )
        .otherwise("in_stock")
        .alias("availability"),
        F.when(F.col("l_quantity") >= 25, "true")
        .otherwise("false")
        .alias("is_bundle"),
        F.when(swap, F.col("compare_at_cents"))
        .otherwise(F.col("price_cents"))
        .alias("display_price_cents"),
        F.when(swap, F.col("price_cents")).alias("sale_price_cents"),
    )


# ---------------------------------------------------------------------------
# F14 — provenance JSON construction
# ---------------------------------------------------------------------------

@register(
    "f14_provenance_json",
    f"""
    SELECT l_orderkey, l_linenumber,
           CAST(to_json(list_value(struct_pack(
             source := l_returnflag,
             price_type := l_linestatus,
             value_cents := {_cents_sql('l_extendedprice')}))) AS VARCHAR)
             AS sources_used
    FROM lineitem
    """,
    doc="Provenance JSON construction (reference jsonb_build_object/array, "
    "02_normalize_scryfall_prices.js:111 + 03:159-166): "
    "to_json(array(struct(...))) — compact JSON is byte-identical across "
    "Spark and DuckDB for string/integer fields.",
)
def f14_provenance_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_json(
            F.array(
                F.struct(
                    F.col("l_returnflag").alias("source"),
                    F.col("l_linestatus").alias("price_type"),
                    _cents("l_extendedprice").alias("value_cents"),
                )
            )
        ).alias("sources_used"),
    )


# ---------------------------------------------------------------------------
# J11 — semi join (EXISTS): the complement of J6's anti join
# ---------------------------------------------------------------------------

@register(
    "j11_semi_join_exists",
    """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    doc="Left semi join (EXISTS): customers with at least one open order. "
    "The reference only has NOT EXISTS (J6); the semi form completes the "
    "existence-join family — no duplication of the left side, right side "
    "never projected.",
)
def j11_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return customer.join(
        open_orders,
        customer["c_custkey"] == open_orders["o_custkey"],
        "left_semi",
    ).select("c_custkey", "c_name", "c_mktsegment")


# ---------------------------------------------------------------------------
# W5 — ntile deciles (price-tier bucketing)
# ---------------------------------------------------------------------------

@register(
    "w5_price_deciles",
    f"""
    WITH t AS (
      SELECT p_partkey, {_cents_sql('p_retailprice')} AS price_cents,
             NTILE(10) OVER (ORDER BY p_retailprice ASC, p_partkey ASC) AS decile
      FROM part)
    SELECT CAST(decile AS INTEGER) AS decile,
           COUNT(*) AS parts,
           MIN(price_cents) AS min_cents,
           MAX(price_cents) AS max_cents
    FROM t GROUP BY decile
    """,
    doc="NTILE decile bucketing over retail price (market price-tier "
    "segmentation; decile/tier shape of reference "
    "10_rollup_market_values_daily.mjs:39-48) with a total-order "
    "tie-break, aggregated per decile. Scale-safe: a naive global "
    "NTILE window is a single-partition funnel — this plan instead "
    "computes an exact distributed global row_number (percentile-sketch "
    "bucket bounds → per-bucket rank → broadcast cumulative offsets) "
    "and derives "
    "the NTILE bucket arithmetically (floor((rn−1)·k/N)+1, the SQL "
    "standard's assignment), which the NTILE oracle matches exactly. "
    "Every window in the plan is bounded: per-range-bucket ranks plus "
    "a metadata-sized (one row per partition) offset pass.",
)
def w5_price_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.operators.ranking import (
        global_row_number,
        ntile_from_rank,
    )

    part = load_table(spark, sf_dir, "part")
    t = part.select(
        _cents("p_retailprice").alias("price_cents"),
        F.col("p_retailprice"),
        F.col("p_partkey"),
    )
    ranked = global_row_number(
        t,
        bucket_by=F.col("p_retailprice"),
        order_by=[F.asc("p_retailprice"), F.asc("p_partkey")],
        rn_col="__rn",
        total_col="__n",
    )
    deciled = ranked.select(
        "price_cents",
        ntile_from_rank(F.col("__rn"), F.col("__n"), 10).alias("decile"),
    )
    return deciled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("parts"),
        F.min("price_cents").alias("min_cents"),
        F.max("price_cents").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# J12 — full outer join (both-sides-preserved reconciliation)
# ---------------------------------------------------------------------------

@register(
    "j12_full_outer_reconcile",
    f"""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS customers,
             CAST(SUM({_cents_sql('c_acctbal')}) AS BIGINT) AS cust_bal_cents
      FROM customer WHERE c_acctbal > 0 GROUP BY 1),
    s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS suppliers,
             CAST(SUM({_cents_sql('s_acctbal')}) AS BIGINT) AS supp_bal_cents
      FROM supplier WHERE s_acctbal > 0 GROUP BY 1)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.customers, 0) AS customers,
           COALESCE(s.suppliers, 0) AS suppliers,
           COALESCE(c.cust_bal_cents, 0) AS cust_bal_cents,
           COALESCE(s.supp_bal_cents, 0) AS supp_bal_cents
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
    doc="Full outer join: reconcile two aggregates keeping keys present "
    "on either side (the vendor-price reconciliation shape used inside "
    "resolve_prices' eBay fallback). Not in the reference's join "
    "repertoire — completes inner/left/semi/anti/full-outer coverage.",
)
def j12_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = (
        customer.filter(F.col("c_acctbal") > 0)
        .groupBy(F.col("c_nationkey").alias("c_key"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum(_cents("c_acctbal")).alias("cust_bal_cents"),
        )
    )
    s = (
        supplier.filter(F.col("s_acctbal") > 0)
        .groupBy(F.col("s_nationkey").alias("s_key"))
        .agg(
            F.count(F.lit(1)).alias("suppliers"),
            F.sum(_cents("s_acctbal")).alias("supp_bal_cents"),
        )
    )
    joined = c.join(s, c["c_key"] == s["s_key"], "full_outer")
    return joined.select(
        F.coalesce(F.col("c_key"), F.col("s_key")).alias("nationkey"),
        F.coalesce(F.col("customers"), F.lit(0)).alias("customers"),
        F.coalesce(F.col("suppliers"), F.lit(0)).alias("suppliers"),
        F.coalesce(F.col("cust_bal_cents"), F.lit(0)).alias("cust_bal_cents"),
        F.coalesce(F.col("supp_bal_cents"), F.lit(0)).alias("supp_bal_cents"),
    )


# ---------------------------------------------------------------------------
# U3 — pivot (long → wide): the inverse of J2's unpivot
# ---------------------------------------------------------------------------

@register(
    "u3_pivot_wide",
    f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN {_cents_sql('l_extendedprice')} END) AS BIGINT)
             AS open_cents,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN {_cents_sql('l_extendedprice')} END) AS BIGINT)
             AS finished_cents,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Pivot long→wide (inverse of J2's unpivot): one output column per "
    "pivot value via conditional aggregation — explicit value list, so no "
    "extra distinct-values pass and a stable schema at any scale.",
)
def u3_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cents = _cents("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "O", cents)).alias("open_cents"),
        F.sum(F.when(F.col("l_linestatus") == "F", cents)).alias(
            "finished_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# F8 typed variant — from_json with an explicit schema (the preferred
# production idiom: one parse per row into a struct, then field access)
# ---------------------------------------------------------------------------

@register_shadow(
    "f8_typed_json_struct",
    """
    SELECT event_type,
           COUNT(*) AS events,
           CAST(SUM(CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$')
                         THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS BIGINT)
             AS sum_k,
           COUNT(json_extract_string(props, '$.s')) AS with_s,
           COUNT(DISTINCT json_extract_string(props, '$.s')) AS distinct_s
    FROM events GROUP BY event_type
    """,
    doc="Typed JSON extraction: from_json(props, schema) parses ONCE per "
    "row into a struct (vs one get_json_object walk per field in f8) — "
    "the production idiom for hot JSON paths (SURVEY §2.8 F8/F9; "
    "hard-part (d): prefer typed from_json schemas per source).",
)
def f8_typed_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json(F.col("props"), "k string, s string")
    )
    k = F.when(F.col("p.k").rlike("^[0-9]+$"), F.col("p.k")).cast("long")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum(k).alias("sum_k"),
        F.count("p.s").alias("with_s"),
        F.countDistinct("p.s").alias("distinct_s"),
    )


# ---------------------------------------------------------------------------
# F2 — SQL-style money cleaning (strip everything but digits/dot/minus)
# ---------------------------------------------------------------------------

@register(
    "f2_sql_money_clean",
    f"""
    WITH dirty AS (
      SELECT p_partkey,
             CASE p_partkey % 4
               WHEN 0 THEN 'EUR ' || CAST(p_retailprice AS VARCHAR) || ' kr'
               WHEN 1 THEN '$' || CAST(p_retailprice AS VARCHAR)
               WHEN 2 THEN 'ca. ' || CAST(p_retailprice AS VARCHAR) || ' USD'
               ELSE '' END AS raw
      FROM part),
    cleaned AS (
      SELECT p_partkey, raw,
             regexp_replace(raw, '[^0-9.\\-]', '', 'g') AS c
      FROM dirty)
    SELECT p_partkey, raw,
           CAST(round(CAST(CASE WHEN regexp_matches(c, '^-?[0-9]+(\\.[0-9]+)?$')
                                THEN c END AS DECIMAL(24,6)) * 100, 0) AS BIGINT)
             AS value_cents
    FROM cleaned
    """,
    doc="SQL-style money cleaning (reference 02_normalize_scryfall_prices"
    ".js:108-109): strip non-[0-9.-], NULLIF empty, cast, ROUND(*100) to "
    "integer cents — junk-tolerant vendor-price normalization.",
)
def f2_sql_money_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from legendary_data_pipeline_spark.functions.money import (
        sql_money_clean_cents,
    )

    part = load_table(spark, sf_dir, "part")
    price_str = F.col("p_retailprice").cast("string")
    raw = (
        F.when(F.col("p_partkey") % 4 == 0, F.concat(F.lit("EUR "), price_str, F.lit(" kr")))
        .when(F.col("p_partkey") % 4 == 1, F.concat(F.lit("$"), price_str))
        .when(F.col("p_partkey") % 4 == 2, F.concat(F.lit("ca. "), price_str, F.lit(" USD")))
        .otherwise(F.lit(""))
    )
    src = part.select("p_partkey", raw.alias("raw"))
    return src.select(
        "p_partkey", "raw", sql_money_clean_cents(F.col("raw")).alias("value_cents")
    )


# ---------------------------------------------------------------------------
# Beyond-reference window analytics: rolling frames, lag, grouping sets.
# The reference has none of these (SURVEY §2.5/§2.4 notes); a complete
# engine surface needs them, and each is exactly oracle-checkable.
# ---------------------------------------------------------------------------

@register(
    "w3_rolling_7d_stats",
    f"""
    WITH daily AS (
      SELECT l_returnflag,
             CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS epoch_day,
             CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS day_cents,
             COUNT(*) AS day_rows
      FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag, epoch_day, day_cents,
           CAST(SUM(day_cents) OVER w AS BIGINT) AS rolling_7d_cents,
           CAST(SUM(day_rows) OVER w AS BIGINT) AS rolling_7d_rows
    FROM daily
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY epoch_day
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling 7-day totals per group: RANGE frame over integer epoch "
    "days — the sliding-window analytic missing from the reference "
    "(its 180-day lookback is a filter, not a frame). Pre-aggregating "
    "to one row per (group, day) BEFORE the window keeps frame state "
    "tiny at scale.",
)
def w3_rolling_7d_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01"))
        .cast("long")
        .alias("epoch_day"),
    ).agg(
        F.sum(_cents("l_extendedprice")).alias("day_cents"),
        F.count(F.lit(1)).alias("day_rows"),
    )
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("epoch_day")
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "l_returnflag",
        "epoch_day",
        "day_cents",
        F.sum("day_cents").over(w).alias("rolling_7d_cents"),
        F.sum("day_rows").over(w).alias("rolling_7d_rows"),
    )


@register(
    "w4_day_over_day_lag",
    f"""
    WITH daily AS (
      SELECT l_returnflag,
             strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
             CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS day_cents
      FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag, ship_day, day_cents,
           lag(day_cents) OVER (PARTITION BY l_returnflag ORDER BY ship_day)
             AS prev_day_cents,
           day_cents - lag(day_cents) OVER (PARTITION BY l_returnflag ORDER BY ship_day)
             AS delta_cents
    FROM daily
    """,
    doc="Day-over-day deltas via lag(): the price-movement analytic a "
    "market-price engine needs on top of the daily snapshot tables "
    "(market_price_daily day-over-day is the production use).",
)
def w4_day_over_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
    ).agg(F.sum(_cents("l_extendedprice")).alias("day_cents"))
    w = Window.partitionBy("l_returnflag").orderBy("ship_day")
    prev = F.lag("day_cents").over(w)
    return daily.select(
        "l_returnflag",
        "ship_day",
        "day_cents",
        prev.alias("prev_day_cents"),
        (F.col("day_cents") - prev).alias("delta_cents"),
    )


@register_shadow(
    "a8_cube_grouping_id",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grouping_id,
           CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="Full CUBE with grouping_id disambiguation: all 2^2 grouping-set "
    "combinations in one pass — grouping_id tells a NULL group value "
    "apart from a NULL subtotal marker.",
)
def a8_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("grouping_id"),
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register_shadow(
    "a7_rollup_totals",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="Hierarchical subtotals via ROLLUP (group, group+status, grand "
    "total) — one pass, no self-union; the reporting shape the "
    "reference would need N queries for.",
)
def a7_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "a7_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS grouping_id,
           CAST(SUM({_cents_sql('l_extendedprice')}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="Explicit GROUPING SETS (detail, per-flag subtotal, grand total) "
    "with grouping_id disambiguating NULL group values from NULL subtotal "
    "markers — one pass over the fact table for every reporting level. "
    "Subsumes the ROLLUP/CUBE pair (a7_rollup_totals / a8_cube_grouping_id, "
    "kept oracle-verified in the shadow registry): grouping-set expansion "
    "is a single Expand node feeding one partial-aggregated shuffle, the "
    "same plan shape at any scale.",
)
def a7_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("long").alias("grouping_id"),
        F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# Extension query modules register themselves on import (kept at the tail
# so `register` and the core entries above are fully defined first).
from legendary_data_pipeline_spark import queries_llm  # noqa: E402,F401
from legendary_data_pipeline_spark import queries_curation  # noqa: E402,F401
from legendary_data_pipeline_spark import queries_analytics  # noqa: E402,F401
from legendary_data_pipeline_spark import queries_mleval  # noqa: E402,F401
from legendary_data_pipeline_spark import queries_streaming  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Round-6 driver-gate rotation (see NOTES.md §Round-6)
# ---------------------------------------------------------------------------
# The driver's independent correctness harness only checks the first
# DRIVER_QUERY_CAP registry entries, and that set had been frozen since
# round 3 — every analytics/DQ/sketch/ER operator added since was only
# verified by the (identical, but locally-run) shadow harness. Rotate 10
# redundant early entries out (each stays oracle-verified in the shadow
# suite, and each has a near-identical sibling still in the gate) and
# promote the 10 highest-risk round-4/5 shadow queries so the driver's
# DuckDB oracle exercises the new surface. Bench comparability across
# rounds is preserved via the pinned 40-query intersection subset
# recorded in NOTES.md.
_DEMOTE_R6 = [
    "f4_cents_display",  # sibling in gate: f1_money_parse_cents
    "f2_sql_money_clean",  # sibling: f1_money_parse_cents
    "f7_url_slug_link",  # sibling: f5_sanitize_documents
    "u2_union_tagged_sources",  # sibling: j12_full_outer_reconcile
    "o1_rank_nulls_last",  # siblings: w1 ranking, w5 global order
    "f14_provenance_json",  # sibling: f8_json_extract_events
    "w4_day_over_day_lag",  # sibling: w3_rolling_7d_stats
    "dedup_minhash_signatures",  # subsumed by dedup_minhash_lsh_pairs
    "dedup_simhash",  # subsumed by dedup_simhash_pairs
    "a3_user_event_totals",  # sibling: e_daily_event_rollup
]
_PROMOTE_R6 = [
    "dq_table_checksum",
    "sk_hll_distinct_users",
    "sk_theta_audience_overlap",
    "er_fuzzy_pairs_part_names",
    "e_funnel_conversion",
    "curation_bloom_cross_corpus",
    "curation_nb_quality_score",
    "curation_leakage_safe_split",
    "e_incremental_daily_rollup",
    "st_mad_outliers",
]
# Guard against the partial-import trap: importing a query SUBMODULE
# (queries_llm, queries_analytics, ...) before this module finishes
# leaves that submodule half-registered when the rotation below runs.
# Fail with the fix spelled out instead of a bare KeyError.
_missing = [
    _n
    for _n in (*_DEMOTE_R6, *_PROMOTE_R6)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R6:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R6:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)

# Round-6b swap: the trained-IVF query is rows-only checkable (Lloyd
# codebook — no SQL replay); the fixed-codebook variant carries a FULL
# hash oracle over the same index mechanics. Swapping lifts the driver
# gate from 48 to 49 oracle-paired entries out of 50. The trained form
# keeps its recall-curve contracts as a shadow
# (tests/test_similarity_recall.py).
SHADOW_REGISTRY["sim_ivf_topk"] = REGISTRY.pop("sim_ivf_topk")
REGISTRY["sim_ivf_fixed_topk"] = SHADOW_REGISTRY.pop("sim_ivf_fixed_topk")

# ---------------------------------------------------------------------------
# Round-7 driver-gate rotation (see NOTES.md §Round-7)
# ---------------------------------------------------------------------------
# Same policy as round 6, which immediately paid off (the rotation
# surfaced the dq_table_checksum canonicalization bug): promote the 10
# round-6 shadow queries the driver's independent harness has never
# exercised, demoting gate entries whose semantics a near-identical
# sibling still covers. Every demoted entry keeps its full DuckDB
# oracle in the shadow suite; bench comparability is preserved by the
# pinned intersection subset bench.py now emits itself.
_DEMOTE_R7 = [
    "j11_semi_join_exists",  # sibling: j6_anti_join_missing (semi/anti mirror)
    "j3_compound_left_join",  # siblings: j1 equi, j12 full-outer predicates
    "u3_pivot_wide",  # siblings: j2_unpivot (inverse), a7_grouping_sets
    "w3_rolling_7d_stats",  # sibling: st_mad_outliers (windowed robust stats)
    "sim_topk_bruteforce",  # siblings: sim_lsh_bucket_topk, sim_ivf_fixed_topk
    "dedup_embedding_cosine",  # siblings: dedup_* family + sim_lsh_bucket_topk
    "text_bpe_token_count",  # sibling: text_token_stats_by_lang
    "t2_range_join_purchase_session",  # sibling: t1_asof_purchase_click
    "e_incremental_daily_rollup",  # sibling: e_daily_event_rollup
    "f10_conditional_feed_mapping",  # siblings: f1 money path, j7 coalesce
]
_PROMOTE_R7 = [
    "curation_c4_gates",
    "curation_c4_span_dedup",
    "ss_prefix_jaccard_pairs",
    "sk_cms_partkey_freq",
    "ml_auc_by_segment",
    "curation_html_extract",
    "gr_copurchase_triangles",
    "st_correlation_matrix",
    "ret_rrf_fusion",
    "ml_langid_confusion",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R7, *_PROMOTE_R7)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-7 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R7:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R7:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)

# ---------------------------------------------------------------------------
# Round-8 driver-gate rotation (see NOTES.md §Round-8)
# ---------------------------------------------------------------------------
# Same rotation policy (it caught real harness bugs in rounds 5 and 6):
# promote 10 queries the independent driver oracle has never run, biased
# toward representation-fragile outputs — survival curves (libm log/exp),
# rank statistics, PSI/WOE logs, CUSUM accumulation, SCD2 timestamp
# intervals, unicode script profiling, and exact water-filling
# allocation. Every demoted entry has a near-identical sibling still in
# the gate AND a green driver row from an earlier round; all keep their
# full DuckDB oracles in the shadow suite.
_DEMOTE_R8 = [
    "sk_theta_audience_overlap",  # sibling: sk_hll_distinct_users (sketch distinct)
    "er_fuzzy_pairs_part_names",  # sibling: ss_prefix_jaccard_pairs (fuzzy pairs)
    "dedup_simhash_pairs",  # sibling: dedup_minhash_lsh_pairs (banded near-dup)
    "dedup_ngram_jaccard",  # siblings: ss_prefix_jaccard_pairs, dedup_minhash_lsh_pairs
    "text_langid",  # sibling: ml_langid_confusion (same langid kernel)
    "text_fingerprint",  # sibling: dedup_exact_sha (hash projection)
    "f5_sanitize_documents",  # sibling: curation_html_extract (text cleaning)
    "j1_cast_bridged_join",  # siblings: j7 broadcast join, j12 full outer
    "e_daily_event_rollup",  # sibling: a1_percentile_rollup_180d (grouped rollup)
    "curation_nb_quality_score",  # sibling: text_quality_score (doc scoring)
]
_PROMOTE_R8 = [
    "sv_user_retention_km",
    "sv_logrank_user_segments",
    "dq_psi_drift_orders_priority",
    "ml_woe_iv",
    "st_kendall_tau_qty_discount",
    "st_gini_order_value",
    "ts_cusum_daily_value",
    "curation_mixture_allocation",
    "scd2_user_event_state",
    "tx_script_profile",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R8, *_PROMOTE_R8)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-8 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R8:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R8:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)

# ---------------------------------------------------------------------------
# Round-9 driver-gate rotation (see NOTES.md §Round-9)
# ---------------------------------------------------------------------------
# 107 of 191 registry queries had never seen the independent driver
# oracle entering this round, and two of the three harness bugs to date
# (r6 dq_table_checksum, r8 st_kendall_tau_qty_discount) were caught
# ONLY by rotation. Promote 10 more never-driver-checked queries, again
# biased toward representation-fragile outputs (rank statistics, KS/chi²
# drift, mutual information, z-scores, calibration fractions, Benford
# log-expected frequencies, time-weighted averages, surprisal filters);
# demote 10 rows with a green r8 driver row AND a near-identical sibling
# still in the gate. Demoted entries keep their full DuckDB oracles in
# the shadow suite (test_queries_oracle.py runs all of them every time).
_DEMOTE_R9 = [
    "w5_price_deciles",  # sibling: a1_percentile_rollup_180d (percentiles)
    "j12_full_outer_reconcile",  # siblings: j6 anti, j7 broadcast joins
    "a7_grouping_sets",  # sibling: a1_percentile_rollup_180d (grouped rollup)
    "mm_media_meta",  # sibling: mm_frame_sample (multimodal mapInPandas)
    "e_funnel_conversion",  # sibling: e_sessionize_batch (event ordering)
    "dedup_exact_sha",  # sibling: dedup_minhash_lsh_pairs (dedup family)
    "text_token_stats_by_lang",  # sibling: text_quality_score (doc stats)
    "curation_html_extract",  # siblings: curation_c4_gates / c4_span_dedup
    "o3_latest_order_per_customer",  # sibling: w1_priority_best_of_day (top-1)
    "s5_upsert_semantics",  # sibling: scd2_user_event_state (keyed state)
]
_PROMOTE_R9 = [
    "st_spearman_matrix",
    "dq_ks_order_totals_drift",
    "st_chi_square_independence",
    "st_numeric_mi_qty_price",
    "ts_zscore_anomalies",
    "ml_calibration_bins",
    "ret_maxsim_topk",
    "dq_benford_order_totals",
    "ts_twap_event_values",
    "curation_unigram_surprisal",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R9, *_PROMOTE_R9)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-9 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R9:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R9:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)

# ---------------------------------------------------------------------------
# Round-10 driver-gate rotation (see NOTES.md §Round-10)
# ---------------------------------------------------------------------------
# POLICY CHANGE (r9 verdict #6): the never-driver-checked tail was
# GROWING — rotation retired 10/round while rounds add ~15-20 new
# queries (118 of 212 never checked entering r10). From this round the
# rotation swaps FIFTEEN: ten bias-picked toward the newest operator
# families and representation-fragile outputs, plus a five-slot
# round-robin "sweep" band that cycles the oldest never-checked
# shadows. Every demoted entry has >=2 green driver rows (most have 9)
# AND a near-identical sibling still in the gate; all keep their full
# DuckDB oracles in the always-run shadow suite.
# st_kendall_tau_qty_discount deliberately STAYS in the gate: the
# round-10 all-BIGINT output must earn a green INDEPENDENT driver row
# before it can ever be demoted.
_DEMOTE_R10 = [
    "a1_percentile_rollup_180d",  # siblings: st_mad_outliers, dq_equal_freq_bins_price (quantiles)
    "corpus_curation_pipeline",  # siblings: curation_c4_gates, curation_c4_span_dedup
    "dedup_minhash_lsh_pairs",  # sibling: ss_prefix_jaccard_pairs (banded set-sim pairs)
    "f1_money_parse_cents",  # siblings: j7 coalesce/cents path, f8 extraction
    "j6_anti_join_missing",  # sibling: j7_price_resolution_coalesce (join family)
    "sim_lsh_bucket_topk",  # sibling: sim_ivf_fixed_topk (bucketed ANN top-k)
    "text_quality_score",  # siblings: tx_script_profile, tx_bpe_fertility_by_lang
    "e_sessionize_batch",  # sibling: scd2_user_event_state (per-user ordered state)
    "sk_hll_distinct_users",  # sibling: sk_cms_partkey_freq (mergeable sketches)
    "st_mad_outliers",  # sibling: ts_zscore_anomalies (robust outlier flags)
    "dq_table_checksum",  # siblings: dq_ks/dq_psi/dq_benford (DQ suite)
    "curation_bloom_cross_corpus",  # sibling: curation_semantic_decontamination
    "st_correlation_matrix",  # sibling: st_spearman_matrix (exact moment matrix)
    "ml_langid_confusion",  # siblings: ml_auc_by_segment, ml_calibration_bins
    "ret_rrf_fusion",  # siblings: ret_maxsim_topk, ret_rbo_exact_vs_lsh
]
_PROMOTE_R10 = [
    # ten bias-picked (r9 verdict #2): the round-9 operator families
    "ht_mann_whitney_qty_flag",
    "ht_wilcoxon_customer_value_shift",
    "ts_theil_sen_daily_value",
    "curation_gopher_repetition",
    "gr_link_prediction_topk",
    "er_golden_record_customers",
    "an_source_js_divergence",
    "ret_rbo_exact_vs_lsh",
    "curation_semantic_decontamination",
    "curation_token_budget_head",
    # five-slot sweep band: oldest never-checked, family-diverse
    "ht_kruskal_value_by_priority",
    "curation_fineweb_line_signals",
    "dq_equal_freq_bins_price",
    "ts_ewma_daily_anomalies",
    "tx_bpe_fertility_by_lang",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R10, *_PROMOTE_R10)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-10 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R10:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R10:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)

# ---------------------------------------------------------------------------
# Round-11 driver-gate rotation (see NOTES.md §Round-11)
# ---------------------------------------------------------------------------
# r10 verdict #1: the never-driver-checked tail GREW 118→127 because 25
# new queries landed against 15 rotations. This round uses both levers:
# rotate TWENTY (ten bias-picked from the round-10 operator cohort
# X187–X211 — nonparametric tests, time-series decomposition/ACF, corpus
# vocabulary/entropy, calibration error, Lorenz — plus a TEN-slot sweep
# band cycling the oldest never-checked shadows, family-diverse), and
# hold new-operator additions below the rotation rate. Every demoted
# entry has >=1 green driver row (the round-10 promotions earned theirs
# on first exposure in CORRECTNESS_r10; the rest have 2–10) AND a
# near-identical sibling still in the gate; all keep their full DuckDB
# oracles in the always-run shadow suite.
# st_kendall_tau_qty_discount is demoted per r10 verdict #2: it stayed
# in the r10 gate to earn an independent green for the all-BIGINT fix
# and has it now (CORRECTNESS_r10 hash-green).
_DEMOTE_R11 = [
    "st_kendall_tau_qty_discount",  # sibling: st_spearman_matrix (rank stats)
    "ht_mann_whitney_qty_flag",  # sibling: ht_cliffs_delta_qty_flag (two-group rank)
    "ht_wilcoxon_customer_value_shift",  # sibling: ht_friedman_daily_event_ranks (paired ranks)
    "ht_kruskal_value_by_priority",  # sibling: ht_friedman_daily_event_ranks (k-group ranks)
    "ts_theil_sen_daily_value",  # sibling: ts_mann_kendall_daily_value (Kendall-family trend)
    "ts_ewma_daily_anomalies",  # sibling: ts_zscore_anomalies (anomaly flags, stays)
    "ts_cusum_daily_value",  # sibling: ts_mann_kendall_daily_value (change/trend detection)
    "tx_bpe_fertility_by_lang",  # siblings: tx_vocab_richness, tx_corpus_entropy (corpus text)
    "tx_script_profile",  # siblings: tx_vocab_richness, tx_corpus_entropy
    "ml_calibration_bins",  # sibling: ml_expected_calibration_error (calibration)
    "st_gini_order_value",  # sibling: st_lorenz_order_value (same cum-share construction)
    "st_chi_square_independence",  # sibling: st_numeric_mi_qty_price (contingency grids, stays)
    "curation_semantic_decontamination",  # sibling: curation_decontaminate (n-gram decontam)
    "curation_token_budget_head",  # sibling: curation_pack_sequences (token budgets/packing)
    "curation_gopher_repetition",  # sibling: curation_fineweb_line_signals (doc-quality gates, stays)
    "an_source_js_divergence",  # sibling: dq_psi_drift_orders_priority (distribution divergence, stays)
    "ret_rbo_exact_vs_lsh",  # siblings: ret_bm25_topk (incoming), ret_maxsim_topk (stays)
    "scd2_user_event_state",  # sibling: s9_scd2_part_prices (SCD2 versioned state)
    "t1_asof_purchase_click",  # sibling: t3_asof_forward_next_purchase (as-of join)
    "mm_frame_sample",  # sibling: mm_audio_windows (multimodal mapInPandas)
]
_PROMOTE_R11 = [
    # ten bias-picked (r10 verdict #1a): the round-10 operator cohort
    "ht_cliffs_delta_qty_flag",
    "ht_friedman_daily_event_ranks",
    "ts_mann_kendall_daily_value",
    "ts_seasonal_decompose_daily",
    "ts_acf_daily_value",
    "tx_vocab_richness",
    "tx_corpus_entropy",
    "st_trimmed_mean_price_by_flag",
    "ml_expected_calibration_error",
    "st_lorenz_order_value",
    # ten-slot sweep band: oldest never-checked shadows, family-diverse
    # (first-commit order; see NOTES.md §Round-11 for the age table)
    "curation_decontaminate",
    "curation_pack_sequences",
    "curation_pii_scrub",
    "dedup_cluster_components",
    "mm_audio_windows",
    "skew_salted_user_totals",
    "t3_asof_forward_next_purchase",
    "text_unicode_fold",
    "s9_scd2_part_prices",
    "ret_bm25_topk",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R11, *_PROMOTE_R11)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-11 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R11:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R11:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# ---------------------------------------------------------------------------
# Round-12 driver-gate rotation (see NOTES.md §Round-12)
# ---------------------------------------------------------------------------
# r11 verdict #1: keep the rotation at 20 and drive the never-checked
# tail below 100 (115 entering r12). Same two-band policy: the 7-slot
# bias band takes the entire r11 operator cohort (X212–X219 minus CvM's
# sibling — all 7 foreign-cwd oracle-green at sf0.01 before this
# rotation committed), the 13-slot sweep band cycles the oldest
# never-checked shadows, family-diverse (the NOTES "Round-12 rotation
# prep" list, verified end of r11 and re-verified this session).
# Demotions: 18 of the 20 r11 promotions (each earned a hash-green row
# in CORRECTNESS_r11 on first exposure) plus the two survival queries
# (multi-round greens; their incoming sibling sv_nelson_aalen is the
# Kaplan–Meier/logrank family's additive companion).
# mm_audio_windows and skew_salted_user_totals stay a second round —
# they are the gate's ONLY multimodal / skew-handling representatives.
_DEMOTE_R12 = [
    "ht_cliffs_delta_qty_flag",  # sibling: ht_kendalls_w_daily_event_ranks (rank effect size)
    "ht_friedman_daily_event_ranks",  # siblings: ht_page_trend + ht_kendalls_w (shared _complete_block_ranks prologue)
    "ts_mann_kendall_daily_value",  # sibling: ht_page_trend_daily_event_ranks (Kendall-family trend)
    "ts_seasonal_decompose_daily",  # sibling: ts_zscore_anomalies (daily-series windows, stays)
    "ts_acf_daily_value",  # sibling: ts_zscore_anomalies (stays)
    "tx_vocab_richness",  # sibling: curation_vocab_topk (incoming; vocabulary aggregation)
    "tx_corpus_entropy",  # sibling: curation_unigram_surprisal (corpus LM stats, stays)
    "st_trimmed_mean_price_by_flag",  # sibling: dq_equal_freq_bins_price (hoisted-threshold rank intervals, stays)
    "ml_expected_calibration_error",  # sibling: ml_brier_decomposition (incoming; calibration decomposition)
    "st_lorenz_order_value",  # sibling: ml_cumulative_gains (incoming; the lorenz plan on the negated key)
    "curation_decontaminate",  # sibling: curation_c4_span_dedup (shingle spans, stays)
    "curation_pack_sequences",  # sibling: curation_chunk_sequences (incoming; token-budget packing)
    "curation_pii_scrub",  # sibling: curation_fineweb_line_signals (doc text gates, stays)
    "dedup_cluster_components",  # sibling: dedup_keep_canonical (incoming; dedup-cluster consumer)
    "t3_asof_forward_next_purchase",  # sibling: ts_twap_event_values (event-time ordered scan, stays)
    "text_unicode_fold",  # sibling: text_bpe_segment (incoming; text transforms)
    "s9_scd2_part_prices",  # sibling: er_golden_record_customers (keyed reconciliation, stays)
    "ret_bm25_topk",  # sibling: ret_maxsim_topk (stays)
    "sv_user_retention_km",  # sibling: sv_nelson_aalen_user_tenure (incoming; KM's additive companion)
    "sv_logrank_user_segments",  # sibling: sv_nelson_aalen_user_tenure (incoming; survival family)
]
_PROMOTE_R12 = [
    # seven bias-picked (r11 verdict #1): the round-11 operator cohort
    "ht_cochran_armitage_status_by_priority",
    "sv_nelson_aalen_user_tenure",
    "gr_basket_pair_lift",
    "ml_brier_decomposition",
    "ml_cumulative_gains",
    "ht_page_trend_daily_event_ranks",
    "ht_kendalls_w_daily_event_ranks",
    # thirteen-slot sweep band: oldest never-checked shadows,
    # family-diverse (NOTES.md "Round-12 rotation prep" list)
    "curation_repetition_quality",
    "curation_stratified_sample",
    "curation_cap_per_source",
    "curation_vocab_topk",
    "dedup_keep_canonical",
    "curation_chunk_sequences",
    "dedup_incremental_exact",
    "curation_boilerplate_stats",
    "curation_weighted_sample",
    "emb_centroid_outliers",
    "text_bpe_segment",
    "curation_url_dedup",
    "curation_domain_pagerank",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R12, *_PROMOTE_R12)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-12 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R12:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R12:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# ---------------------------------------------------------------------------
# Round-13 driver-gate rotation (see NOTES.md §Round-13)
# ---------------------------------------------------------------------------
# r12 verdict #2: keep the rotation at 20 and drive the never-checked
# tail to ≤83 (103 entering r13). Same two-band policy: the 8-slot bias
# band takes the entire r12 operator cohort (X220–X227 — all
# foreign-cwd oracle-green at sf0.001 AND sf0.01 at the end of r12,
# NOTES "Round-13 rotation prep"), the 12-slot sweep band cycles the
# oldest never-checked shadows in first-commit order, family-diverse.
# Demotions: all 20 r12 promotions — every one earned a full hash-green
# driver row in CORRECTNESS_r12 on first exposure (re-checked before
# this rotation committed).
_DEMOTE_R13 = [
    "ht_cochran_armitage_status_by_priority",  # sibling: dq_quality_score_psi_by_source (incoming; scored-bucket drift)
    "sv_nelson_aalen_user_tenure",  # survival family rests this round (KM/logrank/NA all driver-green r12 or earlier)
    "gr_basket_pair_lift",  # sibling: er_blocking_health_report (incoming; pair-frame consumer)
    "ml_brier_decomposition",  # sibling: ml_nb_quality_calibration (incoming; calibration readout)
    "ml_cumulative_gains",  # sibling: ml_nb_quality_calibration (incoming; score-quality readout)
    "ht_page_trend_daily_event_ranks",  # hypothesis-test family rests (3 driver-green rows in r12)
    "ht_kendalls_w_daily_event_ranks",  # hypothesis-test family rests
    "curation_repetition_quality",  # sibling: curation_strip_boilerplate (incoming; doc text gates)
    "curation_stratified_sample",  # sibling: curation_stratified_take_n (incoming; stratified sampling)
    "curation_cap_per_source",  # sibling: curation_stratified_take_n (incoming; per-group caps)
    "curation_vocab_topk",  # sibling: curation_dsir_select (incoming; vocabulary/importance weights)
    "dedup_keep_canonical",  # sibling: dedup_token_savings_report (incoming; same closure + drop-set plan)
    "curation_chunk_sequences",  # sibling: curation_pack_composite_shards (incoming; token-budget packing)
    "dedup_incremental_exact",  # sibling: dedup_strip_substrings (incoming; exact-hash dedup family)
    "curation_boilerplate_stats",  # sibling: curation_strip_boilerplate (incoming; boilerplate family)
    "curation_weighted_sample",  # sibling: curation_stratified_take_n (incoming; sampling family)
    "emb_centroid_outliers",  # sibling: emb_random_projection (incoming; embedding hygiene)
    "text_bpe_segment",  # sibling: dedup_bpe_ngram_jaccard (incoming; frozen-BPE consumer)
    "curation_url_dedup",  # sibling: curation_overlap_matrix (incoming; cross-source dedup views)
    "curation_domain_pagerank",  # sibling: curation_gopher_gates (incoming; domain-level curation)
]
_PROMOTE_R13 = [
    # eight bias-picked (r12 verdict #2): the round-12 operator cohort
    "dedup_token_savings_report",
    "dedup_bpe_ngram_jaccard",
    "ml_nb_quality_calibration",
    "dq_quality_score_psi_by_source",
    "er_blocking_health_report",
    "dedup_threshold_sensitivity",
    "sim_ivf_recall_at_k",
    "dedup_winnow_pairs",
    # twelve-slot sweep band: oldest never-checked shadows,
    # family-diverse (NOTES.md "Round-13 rotation prep" list)
    "curation_stratified_take_n",
    "curation_pack_composite_shards",
    "curation_contamination_score",
    "curation_strip_boilerplate",
    "curation_overlap_matrix",
    "t4_click_attribution",
    "curation_dsir_select",
    "curation_gopher_gates",
    "dedup_dup_span_stats",
    "dedup_strip_substrings",
    "emb_random_projection",
    "curation_length_winsorize",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R13, *_PROMOTE_R13)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-13 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R13:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R13:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# Round-13 addition-coverage band: the six X228–X233 readouts
# registered THIS round take gate slots immediately (each foreign-cwd
# oracle-verified at sf0.001 AND sf0.01 before this rotation committed),
# so the never-driver-checked tail still lands at the r12 verdict's
# ≤83 target COUNTING the additions. The six demotions are the gate's
# most-driver-checked members (7–12 green rows each, recomputed from
# CORRECTNESS_r01–r12 before demoting), every family keeps a gate
# representative, and four of them (f8/j2/j7/w1) are PINNED_R1 bench
# anchors whose min-of-3 timing series continues regardless of gate
# membership.
_DEMOTE_R13B = [
    "f8_json_extract_events",  # 12 greens; JSON family: j7 coalesce chain demoted too — f8's oracle re-runs in every pytest
    "j2_unpivot_part_metrics",  # 12 greens; unpivot/VALUES core row keeps its shadow oracle
    "j7_price_resolution_coalesce",  # 12 greens; coalesce-priority family
    "w1_priority_best_of_day",  # 12 greens; window family (PINNED_R1 series continues in bench)
    "curation_leakage_safe_split",  # 7 greens; curation family amply represented (funnel incoming)
    "sim_ivf_fixed_topk",  # 7 greens; IVF family: recall@k stays, list-balance incoming
]
_PROMOTE_R13B = [
    "curation_gate_funnel",
    "dedup_cluster_size_profile",
    "dedup_keeper_policy_delta",
    "curation_mix_bias_report",
    "sim_ivf_list_balance",
    "curation_pack_efficiency",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R13B, *_PROMOTE_R13B)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-13 addition-coverage "
        f"rotation (missing {_missing}): import "
        "legendary_data_pipeline_spark.queries FIRST."
    )
for _n in _DEMOTE_R13B:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R13B:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# ---------------------------------------------------------------------------
# Round-14 driver-gate rotation (see NOTES.md §Round-14)
# ---------------------------------------------------------------------------
# r13 verdict #1: execute the prepped rotation and drive the
# never-driver-checked tail 83 → ≤63. The r13 operator cohort
# (X228–X233) is already driver-checked, so no bias band this round: a
# pure 20-slot sweep of the oldest never-checked shadows (first-commit
# order, family-diverse — the exact list pre-verified oracle-green at
# sf0.001 AND sf0.01 from a foreign-cwd session at the end of r13,
# NOTES "Round-14 rotation prep"). Demotions: 20 of the 26 r13
# promotions — every one earned a full hash-green driver row in
# CORRECTNESS_r13 on first exposure (re-checked before this rotation
# committed); the three kept members each hold a family seat the
# incoming sweep does not re-cover (sim_ivf_recall_at_k: ANN/IVF;
# dedup_cluster_size_profile: pair-closure dedup; curation_gate_funnel:
# gate-attrition readout).
_DEMOTE_R14 = [
    "dedup_token_savings_report",  # sibling: dedup_cluster_size_profile (kept; same verified-pair closure)
    "dedup_bpe_ngram_jaccard",  # siblings: ss_prefix_jaccard_pairs (gate), dedup_keep_longest (incoming)
    "ml_nb_quality_calibration",  # siblings: ml_auc_by_segment, ml_woe_iv (gate; score-quality readouts)
    "dq_quality_score_psi_by_source",  # siblings: dq_psi_drift_orders_priority (gate), dq_drift_orders_priority (incoming)
    "er_blocking_health_report",  # siblings: er_sorted_neighborhood, er_best_match_part_names (incoming)
    "dedup_threshold_sensitivity",  # sibling: dedup_cluster_size_profile (kept; same closure + threshold frames)
    "dedup_winnow_pairs",  # siblings: ss_prefix_jaccard_pairs (gate), dedup_keep_longest (incoming)
    "curation_stratified_take_n",  # sibling: st_systematic_weighted_sample (incoming; weighted/stratified draws)
    "curation_pack_composite_shards",  # sibling: curation_sliding_chunks (incoming; token-budget chunk/pack family)
    "curation_contamination_score",  # siblings: curation_c4_span_dedup (gate), u4_intersect_except_cohorts (incoming)
    "curation_strip_boilerplate",  # sibling: curation_fineweb_line_signals (gate; line-level gates)
    "curation_overlap_matrix",  # sibling: u4_intersect_except_cohorts (incoming; cross-source set overlap)
    "t4_click_attribution",  # sibling: e_event_transitions (incoming; event-sequence temporal ops)
    "curation_dsir_select",  # sibling: curation_temperature_mix (incoming; mixture-weight selection)
    "curation_gopher_gates",  # sibling: curation_c4_gates (gate; doc-quality gate family)
    "dedup_dup_span_stats",  # sibling: dedup_keep_longest (incoming; dup-structure readouts)
    "dedup_strip_substrings",  # sibling: dedup_keep_longest (incoming; exact-hash dedup family)
    "emb_random_projection",  # sibling: sim_ivf_recall_at_k (kept; embedding-column consumers)
    "curation_length_winsorize",  # sibling: st_hist_order_totalprice (incoming; distribution shaping/binning)
    "dedup_keeper_policy_delta",  # sibling: dedup_cluster_size_profile (kept; same keeper windows)
]
_PROMOTE_R14 = [
    "curation_mixture_repeat",
    "curation_shuffle_shard",
    "curation_temperature_mix",
    "dedup_keep_longest",
    "e_retention_cohorts",
    "e_event_transitions",
    "curation_sliding_chunks",
    "dq_constraint_report_orders",
    "dq_profile_lineitem",
    "er_best_match_part_names",
    "skew_heavy_hitters_users",
    "st_hist_order_totalprice",
    "st_systematic_weighted_sample",
    "st_trend_event_value_daily",
    "dq_drift_orders_priority",
    "er_sorted_neighborhood",
    "skew_join_forecast_order_pairs",
    "u4_intersect_except_cohorts",
    "w6_percent_rank_cume_dist",
    "dq_event_calendar_gaps",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R14, *_PROMOTE_R14)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-14 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R14:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R14:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# Round-14 addition-coverage band: the three X234–X236 streaming-parity
# readouts registered THIS round (queries_streaming.py) take gate slots
# immediately — the streaming family's first driver-oracle exposure
# (r13 verdict #7) — so the never-driver-checked tail still lands at
# the ≤63 target COUNTING the additions (83 − 20 sweep − 3 additions
# + 3 registrations = 63). The three demotions complete the r13-
# promotion demotion set (all 26 green in CORRECTNESS_r13; each keeps
# its full shadow oracle).
_DEMOTE_R14B = [
    "curation_mix_bias_report",  # sibling: curation_mixture_allocation (gate; mixture readouts)
    "sim_ivf_list_balance",  # sibling: sim_ivf_recall_at_k (kept; same _ivf_fixed_assign kernel)
    "curation_pack_efficiency",  # sibling: curation_sliding_chunks (incoming; packing readouts)
]
_PROMOTE_R14B = [
    "stream_rollup_parity",
    "stream_dedup_parity",
    "stream_maint_parity",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R14B, *_PROMOTE_R14B)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-14 addition-coverage "
        f"rotation (missing {_missing}): import "
        "legendary_data_pipeline_spark.queries FIRST."
    )
for _n in _DEMOTE_R14B:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R14B:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# Round-14 second addition-coverage band: X237 (streaming CMS
# maintenance parity) and X238 (gate-disagreement matrix), registered
# later in r14 — same policy: additions take gate slots immediately so
# the never-checked tail stays at the ≤63 target counting them. The
# two demotions are 7-green veterans whose semantics an incoming
# addition re-covers; both stay in the PINNED_LEGACY bench basket
# (timed every round) and keep their full shadow oracles.
_DEMOTE_R14C = [
    "sk_cms_partkey_freq",  # 7 greens; sibling: stream_cms_parity (incoming; same cell arithmetic + probe shape)
    "curation_c4_span_dedup",  # 7 greens; siblings: curation_c4_gates (gate), curation_gate_disagreement (incoming; C4-verdict consumer)
]
_PROMOTE_R14C = [
    "stream_cms_parity",
    "curation_gate_disagreement",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R14C, *_PROMOTE_R14C)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-14 second "
        f"addition-coverage rotation (missing {_missing}): import "
        "legendary_data_pipeline_spark.queries FIRST."
    )
for _n in _DEMOTE_R14C:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R14C:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# ---------------------------------------------------------------------------
# Round-15 driver-gate rotation (see NOTES.md §Round-15)
# ---------------------------------------------------------------------------
# r14 verdict #1: execute the prepped rotation and drive the
# never-driver-checked tail 63 → ≤43. A pure 20-slot sweep of the
# oldest never-checked shadows (first-commit order, family-diverse —
# the exact list pre-verified oracle-green at sf0.001 AND sf0.01 from
# a foreign-cwd session at the end of r14, AND sf1-probed a round
# early; NOTES "Round-15 rotation prep"). Demotions: all 25 r14
# promotions — every one earned a full hash-green driver row in
# CORRECTNESS_r14 on first exposure (re-checked before this rotation
# committed). The r14 streaming-parity cohort's family seat passes to
# the FIVE r15 addition parities (X239–X243: EWMA anomaly,
# stream-stream attribution, quality monitor, PSI monitor,
# sessionization — the remaining never-oracled runtime surfaces),
# promoted in the R15B band below.
_DEMOTE_R15 = [
    "curation_mixture_repeat",  # sibling: curation_mixture_allocation (gate; mixture-weight family)
    "curation_shuffle_shard",  # sibling: curation_c4_gates (gate; corpus-curation family)
    "curation_temperature_mix",  # sibling: curation_mixture_allocation (gate; temperature/mixture draws)
    "dedup_keep_longest",  # sibling: ss_prefix_jaccard_pairs (gate; dedup/similarity family)
    "e_retention_cohorts",  # sibling: ts_user_streaks (incoming; per-user temporal behavior)
    "e_event_transitions",  # sibling: ts_interarrival_gaps (incoming; event-sequence temporal ops)
    "curation_sliding_chunks",  # sibling: curation_c4_gates (gate; token-budget chunking family)
    "dq_constraint_report_orders",  # sibling: stream_quality_parity (incoming R15B; same check_constraints kernel)
    "dq_profile_lineitem",  # sibling: dq_functional_dependencies (incoming; profiling family)
    "er_best_match_part_names",  # sibling: er_name_clusters (incoming; entity-resolution family)
    "skew_heavy_hitters_users",  # sibling: sk_rolling_distinct_users (incoming; per-user frequency readouts)
    "st_hist_order_totalprice",  # sibling: sk_quantile_rollup (incoming; distribution binning family)
    "st_systematic_weighted_sample",  # sibling: an_rfm_segmentation (incoming; per-customer stratification)
    "st_trend_event_value_daily",  # sibling: ts_seasonal_profile (incoming; daily-series readouts)
    "dq_drift_orders_priority",  # siblings: dq_psi_drift_orders_priority (gate), dq_numeric_drift_order_totals (incoming)
    "er_sorted_neighborhood",  # sibling: er_name_clusters (incoming; blocking/clustering family)
    "skew_join_forecast_order_pairs",  # sibling: dq_table_diff (incoming; two-sided join readouts)
    "u4_intersect_except_cohorts",  # sibling: an_rfm_segmentation (incoming; cohort set ops)
    "w6_percent_rank_cume_dist",  # sibling: st_brand_revenue_concentration (incoming; rank/cume distribution)
    "dq_event_calendar_gaps",  # sibling: ts_interarrival_gaps (incoming; same gap algebra, per-user grain)
    "stream_rollup_parity",  # seat → X239–X243 streaming parities (R15B)
    "stream_dedup_parity",  # seat → X239–X243 streaming parities (R15B)
    "stream_maint_parity",  # seat → X239–X243 streaming parities (R15B)
    "stream_cms_parity",  # seat → X239–X243 streaming parities (R15B)
    "curation_gate_disagreement",  # sibling: curation_c4_gates (gate; gate-verdict family)
]
_PROMOTE_R15 = [
    "txt_collocations",
    "dq_functional_dependencies",
    "dq_numeric_drift_order_totals",
    "er_name_clusters",
    "ts_cusum_changepoint",
    "ts_interarrival_gaps",
    "ts_seasonal_profile",
    "ab_purchase_conversion_ztest",
    "st_brand_revenue_concentration",
    "mb_association_rules",
    "dq_k_anonymity_customers",
    "sk_quantile_rollup",
    "ts_user_streaks",
    "sim_hard_negatives",
    "sk_rolling_distinct_users",
    "sk_theta_core_audience",
    "st_mutual_information",
    "an_rfm_segmentation",
    "dq_table_diff",
    "an_contribution_topn",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R15, *_PROMOTE_R15)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-15 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R15:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R15:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# Round-15 addition-coverage band: the five X239–X243 streaming-parity
# readouts registered THIS round (queries_streaming.py) take gate slots
# immediately — first driver-oracle exposure for the remaining
# never-oracled streaming runtime surfaces (stateful EWMA scoring, the
# stream-stream interval join, the continuous quality + PSI monitors,
# gap-based sessionization; r14 verdict #6). With the 25 demotions and
# 20 sweep promotions above, the gate lands back at exactly 50 and the
# never-driver-checked tail at the ≤43 target COUNTING the additions
# (63 − 20 sweep − 5 additions + 5 registrations = 43).
_PROMOTE_R15B = [
    "stream_ewma_parity",
    "stream_attribution_parity",
    "stream_quality_parity",
    "stream_psi_parity",
    "stream_session_parity",
]
_missing = [_n for _n in _PROMOTE_R15B if _n not in SHADOW_REGISTRY]
if _missing:
    raise ImportError(
        "query registry incomplete during round-15 addition-coverage "
        f"rotation (missing {_missing}): import "
        "legendary_data_pipeline_spark.queries FIRST."
    )
for _n in _PROMOTE_R15B:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing

# ---------------------------------------------------------------------------
# Round-16 driver-gate rotation (see NOTES.md §Round-16)
# ---------------------------------------------------------------------------
# r15 verdict #8: continue the rotation with optimization hygiene —
# demotions >= additions, every first-exposure row pre-verified, tail
# shrinking 43 -> 23. A pure 20-slot sweep of the oldest never-checked
# shadows (first-commit order, family capped at 4) — the exact list
# pre-verified oracle-green at sf0.001 AND sf0.01 from a FOREIGN-CWD
# vanilla session during r15 (48/48 including alternates) AND
# sf1-probed a round early (SCALE.md "Round-15 EARLY probe"; the probe
# caught and fixed the ranked-retrieval fixed-fraction quadratic and
# the semdedup unsalted-join nondeterminism before first exposure).
# Demotions: the 20 r15 SWEEP promotions — every one earned a full
# hash-green driver row in CORRECTNESS_r15 on first exposure
# (re-checked before this rotation committed). The five X239–X243
# streaming parities stay in the gate a second round ON PURPOSE: they
# are this optimization round's primary target (r15 verdict #3), and
# their driver-window timings are the before/after evidence.
_DEMOTE_R16 = [
    "txt_collocations",  # siblings: tx_keywords_tf_rarity / tx_ngram_novelty (incoming; corpus text statistics)
    "dq_functional_dependencies",  # sibling: dq_ks_order_totals_drift (gate; DQ structural checks)
    "dq_numeric_drift_order_totals",  # sibling: dq_psi_drift_orders_priority (gate; drift family)
    "er_name_clusters",  # sibling: er_golden_record_customers (gate; entity-resolution family)
    "ts_cusum_changepoint",  # sibling: ts_zscore_anomalies (gate; anomaly-detection family)
    "ts_interarrival_gaps",  # sibling: ts_user_activity_coverage (incoming; event-gap algebra)
    "ts_seasonal_profile",  # sibling: ts_gap_fill_daily (incoming; daily-series readouts)
    "ab_purchase_conversion_ztest",  # sibling: ml_two_proportion_test (incoming; same two-proportion kernel)
    "st_brand_revenue_concentration",  # sibling: st_did_urgent_orders (incoming; order-measure statistics)
    "mb_association_rules",  # sibling: gr_copurchase_triangles (gate; co-purchase co-occurrence)
    "dq_k_anonymity_customers",  # sibling: curation_domain_gates (incoming; threshold-gate readouts)
    "sk_quantile_rollup",  # sibling: sk_cms_join_size (incoming; sketch family)
    "ts_user_streaks",  # sibling: ts_user_activity_coverage (incoming; per-user temporal behavior)
    "sim_hard_negatives",  # sibling: dedup_semdedup_fixed (incoming; embedding-similarity family)
    "sk_rolling_distinct_users",  # sibling: sk_cms_join_size (incoming; sketch family)
    "sk_theta_core_audience",  # sibling: sk_cms_join_size (incoming; sketch family)
    "st_mutual_information",  # sibling: st_numeric_mi_qty_price (gate; MI/contingency family)
    "an_rfm_segmentation",  # sibling: an_temporal_embargo_split (incoming; per-entity stratification)
    "dq_table_diff",  # sibling: dq_ks_order_totals_drift (gate; two-sided reconciliation/drift)
    "an_contribution_topn",  # sibling: an_source_vocab_overlap (incoming; analytics readouts)
]
_PROMOTE_R16 = [
    "ts_gap_fill_daily",
    "an_temporal_embargo_split",
    "ml_pr_at_thresholds",
    "ml_stratified_split",
    "ret_mrr_at_10",
    "ret_ndcg_at_10",
    "tx_keywords_tf_rarity",
    "tx_readability",
    "curation_domain_gates",
    "sk_cms_join_size",
    "ml_target_encoding",
    "gr_clustering_coefficient",
    "an_source_vocab_overlap",
    "curation_cluster_fixed_sample",
    "dedup_semdedup_fixed",
    "emb_quality_report",
    "tx_ngram_novelty",
    "ts_user_activity_coverage",
    "ml_two_proportion_test",
    "st_did_urgent_orders",
]
_missing = [
    _n
    for _n in (*_DEMOTE_R16, *_PROMOTE_R16)
    if _n not in REGISTRY and _n not in SHADOW_REGISTRY
]
if _missing:
    raise ImportError(
        "query registry incomplete during round-16 rotation (missing "
        f"{_missing}): import legendary_data_pipeline_spark.queries "
        "FIRST — importing a queries_* submodule directly re-enters "
        "this module before its registrations finish."
    )
for _n in _DEMOTE_R16:
    SHADOW_REGISTRY[_n] = REGISTRY.pop(_n)
for _n in _PROMOTE_R16:
    REGISTRY[_n] = SHADOW_REGISTRY.pop(_n)
del _n, _missing
