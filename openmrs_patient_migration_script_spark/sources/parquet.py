"""Parquet sources (harness stand-in for the reference's MySQL source,
/root/reference/README.md:5).

Reads go through the vectorized parquet reader with explicit schemas so
Catalyst can prune columns and push predicates down to the scan — the
``.explain()`` plan for any engine query should show ``PushedFilters`` and a
narrow ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.schemas import TABLE_SCHEMAS


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table with its explicit schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = TABLE_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk, scanned as ns-since-epoch long
        # (spark.sql.legacy.parquet.nanosAsLong). Convert with integer
        # division — ns epochs (~1.7e18) overflow double's 53-bit mantissa,
        # so `/ 1000` would corrupt low-order digits; `div` is exact.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several harness tables at once: ``t = load_tables(...); t['orders']``."""
    return {n: load_table(spark, sf_dir, n) for n in names}
