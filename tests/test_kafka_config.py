"""Kafka source wrapper: option builder + payload parsing.

No broker exists in this environment, so the reader itself can't run —
but the two pure pieces (option dict construction and the JSON value →
typed-columns projection) are fully testable on batch frames, and they
are everything that differs from the tested file-stream path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from legendary_data_pipeline_spark.streaming.kafka import (
    kafka_options,
    parse_event_payload,
)


def test_kafka_options_required_and_optional():
    opts = kafka_options("broker-1:9092,broker-2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
    }
    tuned = kafka_options(
        "b:9092", "events",
        starting_offsets="earliest",
        max_offsets_per_trigger=100_000,
        min_partitions=64,
    )
    assert tuned["startingOffsets"] == "earliest"
    assert tuned["maxOffsetsPerTrigger"] == "100000"
    assert tuned["minPartitions"] == "64"


def test_parse_event_payload_roundtrip(spark):
    payload = (
        '{"event_id": 7, "ts": 1700000000000000000, "user_id": 42, '
        '"event_type": "purchase", "value": 12.34, "props": "{}"}'
    )
    raw = spark.createDataFrame(
        [(b"k", payload.encode("utf-8"))], "key binary, value binary"
    )
    rows = parse_event_payload(raw).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["event_id"], r["user_id"], r["event_type"]) == (7, 42, "purchase")
    assert r["ts"] == 1700000000000000000
    assert abs(r["value"] - 12.34) < 1e-9


def test_parse_event_payload_malformed_is_null_row(spark):
    raw = spark.createDataFrame(
        [(None, b"not json at all")], "key binary, value binary"
    )
    rows = parse_event_payload(raw).collect()
    assert len(rows) == 1
    assert rows[0]["event_id"] is None
