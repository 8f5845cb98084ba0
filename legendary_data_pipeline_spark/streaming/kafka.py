"""Kafka stream source/sink configuration (production path).

No broker exists in the test environment, so this module is a pure
option builder (unit-testable) plus thin reader/writer appliers — the
same pattern as `sources.jdbc`. The file-based `read_events_stream`
(snapshots.py) is the tested local stand-in; swapping in Kafka changes
ONLY the source:

    raw = read_kafka_stream(spark, "broker:9092", "events")
    events = parse_event_payload(raw)          # value json -> columns
    rolled = daily_event_rollup_stream(events) # unchanged

Scale notes:
- `minPartitions` splits large Kafka partitions across tasks (source
  parallelism beyond the topic's partition count).
- `maxOffsetsPerTrigger` bounds micro-batch size — backpressure for
  catch-up reads.
- exactly-once to an idempotent sink = checkpoint + the foreachBatch
  keyed upsert (streaming/snapshots.upsert_sink); at-least-once
  delivery collapses to effective exactly-once on the keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_JSON_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> dict[str, str]:
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def read_kafka_stream(
    spark: SparkSession, bootstrap_servers: str, topic: str, **kwargs
) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for key, value in kafka_options(bootstrap_servers, topic, **kwargs).items():
        reader = reader.option(key, value)
    return reader.load()


def parse_event_payload(raw: DataFrame) -> DataFrame:
    """Kafka (key, value, ...) → typed event columns (value is JSON)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), EVENT_JSON_SCHEMA).alias("e")
    ).select("e.*")
