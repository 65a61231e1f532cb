"""Differential tests: every declared query vs its DuckDB oracle at sf0.001
(SURVEY.md §5 strategy 1 — the same check the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from openmrs_patient_migration_script_spark.plans import ORACLES, QUERIES
from tools.verify_local import compare, dtype_problems

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    """Value parity AND Arrow-dtype-class parity. The dtype gate is the
    one compare() is blind to (it int64-normalizes and stringifies) and
    exactly the class behind the three r4 driver hash-fails — fetching
    the oracle via .arrow() makes the int32-vs-int64 / DATE-vs-TIMESTAMP
    skew fail here in CI, not only in the manual verify_local sweep."""
    spark_df = QUERIES[name](spark, sf_dir)
    spark_pdf = spark_df.toPandas()
    duck_tbl = duck.execute(ORACLES[name]).arrow()
    problems = dtype_problems(spark_df, duck_tbl) + compare(
        name, spark_pdf, duck_tbl.to_pandas()
    )
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_dtype_gate_catches_planted_width_skew(spark, duck):
    """Pin the strictness of the differential gate itself: an int32 Spark
    column vs an int64 oracle column must FAIL even though the values are
    numerically identical (compare() alone passes it — that blindness
    cost rounds 3-4 three driver grades)."""
    s32 = spark.range(3).selectExpr("CAST(id AS INT) AS v")
    d64 = duck.execute("SELECT range::BIGINT AS v FROM range(3)").arrow()
    assert dtype_problems(s32, d64), "int32-vs-int64 skew must be flagged"
    s_date = spark.sql("SELECT DATE '2024-01-01' AS d")
    d_ts = duck.execute("SELECT TIMESTAMP '2024-01-01' AS d").arrow()
    assert dtype_problems(s_date, d_ts), "DATE-vs-TIMESTAMP skew must be flagged"
    s64 = spark.range(3).selectExpr("CAST(id AS BIGINT) AS v")
    assert not dtype_problems(s64, d64), "matching types must pass"


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    # every key in queries() that claims an oracle must have one and vice versa
    assert set(m.oracle_sql()) <= set(m.queries())
