"""legendary_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference `troywoldridge/legendary-data-pipeline`
(a Node.js + PostgreSQL batch ETL pipeline), re-expressed Spark-first:

- DataFrame / Spark SQL plans everywhere (Catalyst optimizes; no hand scheduling)
- money as integer cents / DecimalType (never float money arithmetic)
- every writer idempotent by key (upsert via window-dedup + dynamic
  partition overwrite; the reference uses `INSERT ... ON CONFLICT`)
- date-partitioned daily snapshot tables (partition column `as_of_date`)
- LLM-data-pipeline extensions (dedup, similarity, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Package layout:
- ``session``    SparkSession factory (AQE, Arrow, UTC, sane shuffle sizing)
- ``catalog``    loaders for the testdata warehouse
- ``functions``  reusable column-expression library (SURVEY.md §2.8)
- ``operators``  relational + extension operators (SURVEY.md §2)
- ``sources``    readers/writers incl. idempotent sinks (SURVEY.md §2.1)
- ``plans``      pipeline parity jobs recomposing the reference scripts
- ``streaming``  Structured Streaming analogues of the snapshot logic
- ``queries``    registry of named queries + DuckDB oracle SQL (driver contract)
"""

__version__ = "0.1.0"
