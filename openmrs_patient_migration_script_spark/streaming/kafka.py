"""Kafka source parity for the streaming surface.

The harness has no Kafka broker (and no spark-sql-kafka package), so —
exactly like sources/jdbc.py — the wrappers are covered by option-assembly
unit tests; the value-parsing transform is pure DataFrame code and IS
testable (tests/test_sinks_and_jdbc.py) by applying it to a synthesized
(key, value, timestamp) frame shaped like Kafka's output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 100_000,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Option map for a Kafka stream read. ``maxOffsetsPerTrigger`` is the
    backpressure lever: it bounds micro-batch size so one lagging consumer
    restart doesn't produce a giant catch-up batch that OOMs executors."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_event_values(kafka_df: DataFrame) -> DataFrame:
    """Kafka's (key, value, timestamp, ...) frame → typed event rows.

    The JSON payload parses against the pinned events schema (minus ts,
    which rides in the envelope) — a malformed record yields nulls rather
    than killing the stream (from_json's PERMISSIVE default), the right
    trade for an at-scale ingest path.
    """
    payload_schema = "event_id LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"
    return kafka_df.select(
        F.from_json(F.col("value").cast("string"), payload_schema).alias("e"),
        F.col("timestamp").alias("ts"),
    ).select("e.event_id", "ts", "e.user_id", "e.event_type", "e.value", "e.props")


def read_events_kafka(spark: SparkSession, bootstrap_servers: str, topic: str, **kw) -> DataFrame:
    """events as a Kafka stream (requires the spark-sql-kafka package on the
    cluster; not present in this harness)."""
    raw = (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap_servers, topic, **kw))
        .load()
    )
    return parse_event_values(raw)
