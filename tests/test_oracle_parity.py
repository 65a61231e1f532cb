"""Differential tests: every declared query vs its DuckDB oracle at sf0.001
(SURVEY.md §5 strategy 1 — the same check the driver runs at sf0.01)."""

from __future__ import annotations

import pytest

from openmrs_patient_migration_script_spark.plans import ORACLES, QUERIES
from tools.verify_local import compare

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    duck_pdf = duck.execute(ORACLES[name]).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs and has a stable schema
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    # every key in queries() that claims an oracle must have one and vice versa
    assert set(m.oracle_sql()) <= set(m.queries())
