"""Delimited/JSON-lines file sources and sinks.

Same contract as the parquet source: **explicit schema, fail loud**. Schema
inference is banned in production paths — it costs an extra full scan at
100 TB and silently drifts types between runs; a malformed row is an error
(``FAILFAST``), not a silent NULL (``PERMISSIVE``'s default), matching the
engine's fail-loud read policy (tests/test_sources.py pins both).

CSV/JSON scans are row-oriented (no column pruning on disk, no predicate
pushdown into the file) — fine for ingest boundaries, wrong for iterative
analytics; pipelines land them into parquet once and query that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.option("header", True).option("timestampFormat", TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").csv(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC: the other columnar format Spark ships a vectorized reader for.

    Unlike CSV/JSON, ORC keeps the parquet-grade scan properties — column
    pruning, predicate pushdown into stripe/row-group stats — so it is a
    landing format, not just an ingest boundary. Schema stays explicit for
    the same fail-loud reasons as every other source here.
    """
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").orc(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", TS_FMT)
        .json(path)
    )


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.option("timestampFormat", TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").json(path)
