"""Identifier functions.

The reference generates a fresh random ``CHAR(38)`` UUID per inserted row
(/root/reference/README.md:19). Random UUIDs fight Spark's execution model:
task retries and speculative execution would mint different values for the
same logical row, re-runs are not idempotent, and differential testing is
impossible. Engine policy (SURVEY.md §1.2, §4): UUIDs are **derived
deterministically from the natural key** by default; ``random_uuid`` is kept
only as a parity mode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_uuid(*cols: Column | str, namespace: str = "") -> Column:
    """UUID-formatted md5 of the natural key columns.

    Deterministic, collision-resistant for ETL purposes, and exactly
    reproducible in ANSI SQL (``md5`` is available in DuckDB/Postgres/MySQL),
    which keeps the oracle check byte-exact. Layout is the standard
    8-4-4-4-12 grouping of the 32 hex chars.
    """
    key = F.concat_ws("|", F.lit(namespace), *[F.col(c) if isinstance(c, str) else c for c in cols])
    h = F.md5(key)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def deterministic_uuid_sql(cols_sql: str, namespace: str = "") -> str:
    """The ANSI-SQL twin of :func:`deterministic_uuid` (same bytes out).

    ``cols_sql`` is a comma-separated column expression list, e.g.
    ``"c_custkey, c_name"``.
    """
    key = f"concat_ws('|', '{namespace}', {cols_sql})"
    h = f"md5({key})"
    return (
        "concat_ws('-', "
        f"substring({h}, 1, 8), substring({h}, 9, 4), substring({h}, 13, 4), "
        f"substring({h}, 17, 4), substring({h}, 21, 12))"
    )


def random_uuid() -> Column:
    """Reference-parity mode: nondeterministic per-row UUID
    (/root/reference/README.md:19). Not used in declared queries."""
    return F.expr("uuid()")
