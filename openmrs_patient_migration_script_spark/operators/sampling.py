"""Deterministic hash-based sampling (builder-brief training-data op).

A 100 TB corpus pipeline cannot use ``DataFrame.sample``: its output depends
on the seed *and* the partition layout, so re-runs, retried tasks, and
repartitioned inputs all select different rows. The scale-correct pattern is
content-addressed sampling — bucket each row by a stable hash of its natural
key and keep buckets below a per-stratum threshold. That makes the sample

- reproducible (same rows on every run, any cluster size, any partitioning),
- consistent across tables (the same key always lands in the same split —
  a joinable sample), and
- a narrow scan-projection + filter: zero shuffles, fully pushed past
  column pruning.

md5-derived buckets keep the DuckDB oracle exact; swap ``xxhash64`` for the
cheapest JVM hash when cross-engine parity is not required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, buckets: int = 1000) -> Column:
    """Stable per-row bucket in [0, buckets): first 8 md5 hex chars → int.

    Identical in DuckDB as ``('0x' || substr(md5(k::VARCHAR),1,8))::BIGINT
    % buckets`` — used by the oracles and by split assignment in tests.
    """
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 0,
    buckets: int = 1000,
) -> DataFrame:
    """Keep rows whose hash bucket falls under their stratum's rate (per
    mille). E.g. ``{"en": 500, "zh": 100}`` keeps ~50% of English and ~10%
    of Chinese rows — the standard language-rebalancing step of an LLM
    data mix, deterministic end-to-end."""
    threshold: Column = F.lit(default_permille)
    for stratum, permille in sorted(rates_permille.items()):
        threshold = (
            F.when(F.col(strata_col) == stratum, F.lit(permille)).otherwise(threshold)
        )
    bucket = hash_bucket(F.col(key_col), buckets)
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < threshold)
