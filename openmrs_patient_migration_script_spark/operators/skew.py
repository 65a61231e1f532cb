"""Skew mitigations (SURVEY.md §4 scale levers).

AQE's skew-join splitting covers JOINS; it cannot split a WINDOW
partition — `row_number() OVER (PARTITION BY hot_key)` puts every row of
the hot key in one task, and one key with 10^9 rows is one task sorting
10^9 rows. For the common top-k-per-key shape the fix is algebraic:
top-k is a semigroup, so take a partial top-k per (key, salt) first —
bounding every task at (rows-of-key / salts) — then merge the k x salts
survivors per key. Same result, two bounded shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per key, skew-safe.

    Phase 1 ranks within (key, salt) — salt = hash of ``salt_cols``
    (default: every non-key column) mod ``salts``, so the hot key's rows
    spread over ``salts`` tasks; survivors per key: at most k x salts
    rows. Phase 2 re-ranks the survivors per key. ``order_cols`` must be
    a total order (include a tiebreaker) or the result is
    nondeterministic — same contract as any top-k.
    """
    if salt_cols is None:
        salt_cols = [c for c in df.columns if c not in key_cols]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salts))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    w2 = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= k)
        .drop("_salt", "_r1", "_r2")
    )
