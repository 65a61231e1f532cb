"""Registry wiring declared queries (SURVEY.md §2 '✔/◐' rows) to oracles.

Each query is a callable ``(spark, sf_dir) -> DataFrame``; each oracle is an
ANSI-SQL string DuckDB runs against the same parquet tables. A query
registered with ``oracle=None`` gets the driver's weaker rows-only check
(reserved for non-SQL-expressible operators).

Float policy: any column produced by reassociative float aggregation (SUM /
AVG over doubles) is ``round()``-ed identically on both sides — Spark's
partial-aggregation order is nondeterministic across partitions, so raw
float sums differ from a serial engine in final ulps. Counts, keys, strings,
dates and row-level arithmetic are left exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register a declared query and (optionally) its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
