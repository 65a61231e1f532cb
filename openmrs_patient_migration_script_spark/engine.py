"""User-facing façade: one object giving a reference user everything the
script gave them — plus the analytics surface — without touching module
internals.

    from openmrs_patient_migration_script_spark import Engine

    eng = Engine.local(sf_dir="/data/sf0.1")
    eng.table("orders")                     # schema-pinned DataFrame
    eng.sql("SELECT count(*) FROM orders")  # ANSI SQL over all tables
    eng.query("etl_registration")           # any declared operator
    eng.query_names()                       # the SURVEY §2 inventory

SQL runs through temp views registered with the same explicit schemas as
the DataFrame path, so both surfaces see identical types and both get full
Catalyst optimization (the views are lazy scans, not materialized copies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmrs_patient_migration_script_spark.schemas import TABLE_NAMES
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "openmrs-spark-engine") -> "Engine":
        return cls(get_spark(app_name), sf_dir)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_tables(self) -> None:
        """Register every harness table as a temp view (lazy, schema-pinned
        scans — filters in SQL still push down to parquet)."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)

    def sql(self, statement: str) -> DataFrame:
        # re-register per call: temp views live on the SHARED SparkSession,
        # so a "registered once" flag would serve another Engine's sf_dir
        # after two engines interleave. Registration is driver-side
        # metadata (lazy scans) — re-doing it costs microseconds.
        self.register_tables()
        return self.spark.sql(statement)

    def query(self, name: str) -> DataFrame:
        """Run a declared operator from the SURVEY §2 inventory."""
        from openmrs_patient_migration_script_spark.plans import QUERIES

        return QUERIES[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from openmrs_patient_migration_script_spark.plans import QUERIES

        return sorted(QUERIES)

    def explain(self, name: str, mode: str = "formatted") -> str:
        """Physical plan of a declared query as a string — the per-query
        form of the tools/explain_all.py audit (modes: simple, extended,
        codegen, cost, formatted)."""
        df = self.query(name)
        jmode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            mode
        )
        return df._jdf.queryExecution().explainString(jmode)

    # -- table maintenance (operators/layout.py) ---------------------------

    def compact(
        self,
        path: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_cols: list[str] | None = None,
    ) -> tuple[int, int]:
        """Bin-pack a fragmented parquet table; returns (files_before,
        files_after)."""
        from openmrs_patient_migration_script_spark.operators.layout import (
            compact_table,
        )

        return compact_table(self.spark, path, target_file_bytes, partition_cols)

    def cluster(self, name_or_df, cols: list[str], n_files: int) -> DataFrame:
        """Range-cluster a table (or DataFrame) for row-group skipping on
        ``cols``; write the result wherever the pipeline lands it."""
        from openmrs_patient_migration_script_spark.operators.layout import (
            cluster_by_range,
        )

        df = self.table(name_or_df) if isinstance(name_or_df, str) else name_or_df
        return cluster_by_range(df, cols, n_files)
