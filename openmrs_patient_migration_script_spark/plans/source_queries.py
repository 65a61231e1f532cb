"""Declared connector queries (SURVEY.md §2.1 S6) — the custom Python
DataSource surfaced in the graded correctness matrix, not just in
runtime tests.

The legacy-enrollment connector derives every field from
``md5('enrollment:' || client_id)`` (sources/custom.py::enrollment_row),
which DuckDB can reconstruct in pure SQL (hex-substring byte math + list
indexing + make_date) — so the ENTIRE connector read path (schema,
partition planning, per-task generation, Arrow hand-off) is
value-for-value hash-checked against an engine that never runs the
connector at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmrs_patient_migration_script_spark.plans.registry import query

_ROWS = 1000


@query(
    "source_custom_extract",
    oracle=f"""
    WITH ids AS (SELECT range AS cid FROM range(0, {_ROWS})),
    h AS (SELECT cid, md5('enrollment:' || cid) AS hx FROM ids),
    b AS (
      SELECT cid,
        ('0x' || substr(hx, 1, 2))::INT AS b0,
        ('0x' || substr(hx, 3, 2))::INT AS b1,
        ('0x' || substr(hx, 5, 2))::INT AS b2,
        ('0x' || substr(hx, 7, 2))::INT AS b3,
        ('0x' || substr(hx, 9, 2))::INT AS b4,
        ('0x' || substr(hx, 11, 2))::INT AS b5,
        ('0x' || substr(hx, 13, 2))::INT AS b6,
        ('0x' || substr(hx, 15, 8))::BIGINT AS nid_num
      FROM h
    )
    SELECT cid AS client_id,
      (['Alice','Brian','Chiku','Daudi','Esther','Frank','Grace','Hawa'])[b0 % 8 + 1]
       || ' ' ||
      (['Abdalla','Banda','Chacha','Dlamini','Erasto','Fakih','Gicheru'])[b1 % 7 + 1]
        AS full_name,
      (['F','M'])[b2 % 2 + 1] AS gender,
      make_date(1960 + b3 % 46, 1 + b4 % 12, 1 + b5 % 28) AS birthdate,
      CASE WHEN b6 % 5 = 0 THEN NULL
           ELSE 'NID' || lpad(nid_num::VARCHAR, 10, '0') END AS national_id
    FROM b
    """,
)
def source_custom_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 graded: read the legacy extract through the custom Python
    DataSource (`format("legacy_enrollment")`, 4-way range-partitioned).
    The oracle re-derives every row from the same md5 recurrence in pure
    DuckDB SQL, so a drift anywhere in the connector path — partition
    planning, the per-task generator, Arrow conversion, the schema —
    breaks the hash. ``sf_dir`` is unused: the connector is its own data
    (fixed {_ROWS}-row extract, deterministic by construction)."""
    from openmrs_patient_migration_script_spark.sources.custom import (
        LegacyEnrollmentDataSource,
    )

    spark.dataSource.register(LegacyEnrollmentDataSource)
    return (
        spark.read.format("legacy_enrollment")
        .option("rows", _ROWS)
        .option("numPartitions", 4)
        .load()
    )
