"""Session-factory contract: SPARK_DRIVER_MEM must survive a wrapper that
pre-sets PYSPARK_SUBMIT_ARGS (r2's setdefault silently dropped it)."""

from __future__ import annotations

from openmrs_patient_migration_script_spark.session import merged_submit_args


def test_unset_env_gets_driver_memory():
    assert merged_submit_args("8g", None) == "--driver-memory 8g pyspark-shell"


def test_wrapper_args_without_memory_get_memory_prepended():
    out = merged_submit_args("12g", "--conf spark.foo=1 pyspark-shell")
    assert out == "--driver-memory 12g --conf spark.foo=1 pyspark-shell"


def test_wrapper_pinned_memory_wins():
    pre = "--driver-memory 4g pyspark-shell"
    assert merged_submit_args("8g", pre) == pre
