"""ANSI-mode parity gate (round-4 hardening).

The engine session pins ``spark.sql.ansi.enabled=false`` (session.py), but
the DRIVER's correctness gate runs Spark 4's default ANSI-on session — in
round 3 `ts_resample` crashed ONLY under the driver
(INVALID_ARRAY_INDEX_IN_ELEMENT_AT: a 1-past-the-end `element_at` that is
NULL when permissive, an error under ANSI) because nothing in the suite
ever executed the declared surface with ANSI on. This module closes that
class of gap:

- every ORACLE-declared query runs once with ANSI on and must produce
  byte-identical results to the engine's own ANSI-off run — catching both
  hard crashes and silent semantic divergence (permissive casts returning
  NULL where ANSI's try_* variants would, etc.);
- every rows-only query (streaming shapes and other non-SQL-expressible
  ops) must at least EXECUTE under ANSI on.

The flag is flipped per-test on the shared session and always restored —
``ansi.enabled`` is a runtime SQL conf, and the queries build their plans
inside the flipped window so analysis-time ANSI rules apply too.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest

from openmrs_patient_migration_script_spark.plans import ORACLES, QUERIES
from tools.verify_local import compare

#: slow tier (r12): whole-surface ANSI-mode parity sweep (~7 min) — excluded from the
#: default driver-window run; `-m "slow or not slow"` runs it.
pytestmark = pytest.mark.slow

ORACLE_NAMES = sorted(ORACLES)
ROWS_ONLY_NAMES = sorted(set(QUERIES) - set(ORACLES))


@contextmanager
def ansi(spark, enabled: bool):
    key = "spark.sql.ansi.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true" if enabled else "false")
    try:
        yield spark
    finally:
        spark.conf.set(key, old)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_identical_under_ansi(spark, sf_dir, name):
    with ansi(spark, True):
        on_pdf = QUERIES[name](spark, sf_dir).toPandas()
    with ansi(spark, False):
        off_pdf = QUERIES[name](spark, sf_dir).toPandas()
    problems = compare(name, on_pdf, off_pdf)
    assert not problems, f"{name} diverges between ANSI on/off: {problems}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_query_executes_under_ansi(spark, sf_dir, name):
    with ansi(spark, True):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0
