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

from functools import lru_cache

from openmrs_patient_migration_script_spark.schemas import (
    TABLE_SCHEMAS,
    events_read_schema,
)


def parquet_ts_unit(path: str, column: str = "ts") -> str:
    """On-disk time unit ('us'/'ns') of a parquet timestamp column.

    Footer-only metadata probe (no data pages) on the driver, cached per
    (path, mtime) — the harness has shipped `events.ts` as both
    TIMESTAMP(MICROS) and TIMESTAMP(NANOS) across testdata regenerations,
    and reading one as the other silently shifts every epoch by 1000x.
    Keying the cache on the file's mtime means a rewritten file re-probes
    instead of serving the stale unit for the process's lifetime.
    """
    target = path
    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet") and not n.startswith("_")
        )
        if not names:
            return "us"
        target = os.path.join(path, names[0])
    return _ts_unit_cached(target, os.path.getmtime(target), column)


@lru_cache(maxsize=64)
def _ts_unit_cached(target: str, _mtime: float, column: str) -> str:
    import pyarrow.parquet as pq

    return pq.ParquetFile(target).schema_arrow.field(column).type.unit


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one harness table with its explicit schema."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = TABLE_SCHEMAS.get(name)
    if name == "events":
        unit = parquet_ts_unit(path)
        df = spark.read.schema(events_read_schema(unit)).parquet(path)
        if unit == "ns":
            # NANOS scans as ns-since-epoch long
            # (spark.sql.legacy.parquet.nanosAsLong). Convert with integer
            # division — ns epochs (~1.7e18) overflow double's 53-bit
            # mantissa, so `/ 1000` would corrupt low-order digits; `div`
            # is exact.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several harness tables at once: ``t = load_tables(...); t['orders']``."""
    return {n: load_table(spark, sf_dir, n) for n in names}


def load_evolved(
    spark: SparkSession, path: str, target_schema=None
) -> DataFrame:
    """Read a parquet table whose files were written under SEVERAL schema
    versions (columns added over time) — the schema-evolution read a
    long-lived 100 TB table accumulates.

    ``mergeSchema`` unions the per-file schemas at planning time: files
    missing a newer column surface NULLs for it, and files carrying a
    column the reader doesn't project still prune normally (column
    pruning + pushdown are per-file, unaffected by the merge). The merge
    pass reads FOOTERS of all files — a planning cost worth paying only
    on evolved tables, which is why the default `load_table` path pins
    one explicit schema instead.

    ``target_schema``: optionally coerce the merged frame to a pinned
    StructType afterwards (select + cast, fail-loud on a missing
    column) — the stable-contract read for downstream plans that must
    not drift when yet another column lands.
    """
    df = spark.read.option("mergeSchema", True).parquet(path)
    if target_schema is not None:
        missing = [f.name for f in target_schema.fields if f.name not in df.columns]
        if missing:
            raise ValueError(
                f"evolved table at {path} lacks contract columns {missing}"
            )
        df = df.select(
            *[F.col(f.name).cast(f.dataType) for f in target_schema.fields]
        )
    return df
