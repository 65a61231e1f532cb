"""Exact-integer output helpers.

Engine dtype policy (learned the hard way across rounds 6-8): exact
integer fractions beat floats in output rows — floats hash differently
per engine representation — but DECIMAL(38,0) must never *leave* the
plan either. The correctness driver's value-hash canonicalizes decimal
columns differently per engine: in CORRECTNESS_r06 and _r07, every
declared query whose output schema contained ``decimal(38,0)`` hash-
mismatched (rows and schema matched; strict local Arrow-value compare
passed), while all 254 queries emitting only
bigint/int/double/string/date/timestamp/bool matched. So the rule is:

* **intermediates** in DECIMAL(19,0)/DECIMAL(38,0) for overflow safety,
* **output rows** final-cast to BIGINT via :func:`dec_to_long`, which
  guards the cast with an in-plan ``assert_true`` so a value that ever
  leaves the ±2**62 headroom band fails the job loudly instead of
  silently wrapping (measured max |value| of the four affected queries
  at sf0.1 is ~5.0e12 vs int64 max 9.2e18 — ≥1e6× headroom).

Enforced by tests/test_output_dtypes.py (no registered query may emit a
DecimalType column) and tools/verify_local.py (hard-fails decimal
outputs with a pointer to this module).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2**62: half the int64 range — a full order-of-magnitude-class safety
#: margin under the true max, so the guard trips long before wrap-around.
_LONG_SAFE_ABS = 4611686018427387904


def dec_to_long(col: Column, name: str = "value") -> Column:
    """Final-cast an exact DECIMAL intermediate to BIGINT for the output row.

    ``name`` labels the assert_true failure message. The guard rides the
    same projection as the cast — zero extra scans, row-local. A NULL
    input passes through as NULL: assert_true treats a NULL condition as
    a failure, and a global aggregate over zero rows legitimately emits
    NULL sums (caught by test_empty_inputs on ab_paired_ttest).

    Caveat: under non-ANSI mode Spark yields NULL (not an error) when a
    DECIMAL(38,0) intermediate itself overflows past 1e38, and that NULL
    passes this guard the same way an empty-aggregate NULL does. The
    2^62 guard therefore protects the DECIMAL->BIGINT cast, not the
    upstream DECIMAL arithmetic; callers whose inputs could push an
    exact intermediate past ~1e38 (none of the registered queries —
    cents/1e6-grid scaling keeps per-row magnitudes <= ~1e15, so even
    quadrillion-row sums stay < 1e38… with many orders to spare) must
    assert non-empty input or bound the intermediate if a silent NULL
    would be indistinguishable from empty-input.
    """
    guard = F.assert_true(
        col.isNull() | (F.abs(col) < F.lit(_LONG_SAFE_ABS).cast("decimal(38,0)")),
        F.concat(
            F.lit(f"{name} exceeds the BIGINT-safe band (|x| >= 2^62): "),
            col.cast("string"),
        ),
    )
    return F.when(guard.isNull(), col.cast("long"))
