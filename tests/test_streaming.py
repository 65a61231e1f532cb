"""Structured Streaming parity tests (SURVEY.md §2.10): each readStream
pipeline runs to completion (availableNow trigger → memory sink) and must
produce exactly the rows of its batch twin — the property that makes the
batch DuckDB oracles valid checks of the streaming logic."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.sources import load_table
from openmrs_patient_migration_script_spark.streaming.pipelines import (
    dedup_stream,
    read_events_stream,
    session_counts,
    sliding_counts,
    stateful_user_totals,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


def _run_to_memory(stream_df, output_mode: str) -> str:
    name = "mem_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    return name


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize(
    "pipeline,mode",
    [(tumbling_counts, "complete"), (sliding_counts, "complete")],
    ids=["tumbling", "sliding"],
)
def test_windowed_stream_matches_batch(spark, pipeline, mode):
    stream = pipeline(read_events_stream(spark, SF))
    name = _run_to_memory(stream, mode)
    batch = pipeline(load_table(spark, SF, "events"))
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(spark.table(name), cols) == _rows(batch, cols)


def test_session_stream_matches_batch(spark):
    stream = session_counts(read_events_stream(spark, SF))
    name = _run_to_memory(stream, "complete")
    batch = session_counts(load_table(spark, SF, "events"))
    cols = ["session_start", "user_id", "n_events", "last_ts"]
    assert _rows(spark.table(name), cols) == _rows(batch, cols)


def test_dedup_stream_one_row_per_key(spark):
    stream = dedup_stream(read_events_stream(spark, SF))
    name = _run_to_memory(stream, "append")
    out = spark.table(name)
    # exactly one survivor per (user_id, event_type), covering every key
    # present in the batch table
    batch_keys = (
        load_table(spark, SF, "events").select("user_id", "event_type").distinct()
    )
    assert out.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0
    assert out.count() == batch_keys.count()


def test_stateful_stream_totals_match_batch(spark):
    stream = stateful_user_totals(read_events_stream(spark, SF))
    name = _run_to_memory(stream, "update")
    # final state per user (availableNow → single batch → one row per user)
    out = spark.table(name)
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )
    got = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["last_ts"])
        for r in out.collect()
    }
    want = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6), r["last_ts"])
        for r in batch.collect()
    }
    assert got == want
