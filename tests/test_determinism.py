"""Determinism gate: every declared query must produce the SAME result
under a different `spark.sql.shuffle.partitions` — i.e. the answer is a
function of the data, never of the physical partitioning.

This catches the class of bug the DuckDB oracle can miss: a top-k /
row_number / dropDuplicates / first-agg with an under-specified ordering
returns SOME correct-looking answer each run, and if the oracle run
happened to agree once the query would still be broken on a cluster
(where partition counts change with data volume and executor count).

Float policy: aggregates are round(…, 6)-ed in-plan (plans/registry.py),
but float addition is non-associative, so a different partial-aggregation
tree can legitimately flip the last rounded digit. The comparison
re-rounds floats to 3dp — anything that survives THAT differs by real
nondeterminism, not ulps.
"""

from __future__ import annotations

import math

import pytest

from openmrs_patient_migration_script_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

# Queries whose float outputs are produced by an EXACT integer aggregate
# followed by a single division + round — these must be bit-stable across
# partitionings, so the comparison skips the forgiving 3dp re-round.
# r4 added the scaled-long HALF_UP family (the text_stats_by_lang r3
# hash-flake fix and everything built on the same recipe).
STRICT_FLOAT_QUERIES = {
    "events_transitions",
    "dq_freshness",
    "text_stats_by_lang",
    "embed_centroids",
    "cluster_kmeans",
    "text_surprisal",
    "text_classifier_score",
    "graph_pagerank",
    "events_rfm",
    # scaled-long sums divided once as exact int64→double quotients —
    # bit-stable by the same construction
    "ts_interpolate",
    # all-integer recurrence / exact decimal sufficient statistics
    "ts_cusum",
    "agg_correlation",
    "ts_twap",
    # r5: the three r4 driver-hash queries, rebuilt on the exact-integer
    # recipes (HALF_UP means, micro→cents HALF_UP, long counts) — plus
    # the window twin of the cents recipe
    "etl_rollup_incremental",
    "text_gopher_filter",
    "win_trailing_time",
    "funnel_conversion_rate",
}


# The r3/r4 driver-hash flake class: queries that FAILED the driver's
# value-hash while passing value-level local comparison, now rebuilt on
# exact integer arithmetic. Re-run each repeatedly across alternating
# shuffle partitionings so the class stays dead — one pass can miss a
# partial-agg-order flake that only some merge trees expose.
FLAKE_CLASS_QUERIES = (
    "text_stats_by_lang",
    "text_gopher_filter",
    "etl_rollup_incremental",
    # r5 new ops whose decisions ride on hash/argmax boundaries — pinned
    # bit-stable before the driver ever grades them: SemDeDup's
    # 6dp-int cosine argmax + within-cluster dup counting, and the
    # A-ES top-k ticket boundary
    "dedup_semantic",
    "sample_weighted",
)
FLAKE_PARTITIONINGS = ("2", "3", "5", "7", "13", "32")


@pytest.mark.parametrize("name", FLAKE_CLASS_QUERIES)
def test_fixed_hash_flakes_bit_stable(spark, name):
    fn = QUERIES[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = []
        for parts in FLAKE_PARTITIONINGS:
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results.append(_canon(fn(spark, SF).collect(), strict_floats=True))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for parts, r in zip(FLAKE_PARTITIONINGS[1:], results[1:]):
        assert r == results[0], (
            f"{name} not bit-stable: shuffle.partitions={parts} differs "
            f"from {FLAKE_PARTITIONINGS[0]}"
        )


def _canon(rows, strict_floats: bool = False) -> list[tuple]:
    def c(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v if strict_floats else round(v, 3)
        if isinstance(v, list):
            return tuple(c(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, c(x)) for k, x in v.items()))
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    return sorted(
        (
            tuple(c(v) for _, v in sorted(r.asDict(recursive=True).items()))
            for r in rows
        ),
        key=repr,  # mixed None/str/num columns aren't mutually orderable
    )


def _snapshot(spark) -> dict[str, list[tuple]]:
    return {
        name: _canon(fn(spark, SF).collect(), name in STRICT_FLOAT_QUERIES)
        for name, fn in QUERIES.items()
    }


@pytest.mark.slow
def test_results_invariant_under_repartitioning(spark):
    base = _snapshot(spark)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _snapshot(spark)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    bad = [n for n in base if base[n] != alt[n]]
    assert not bad, f"partitioning-dependent results: {bad}"
