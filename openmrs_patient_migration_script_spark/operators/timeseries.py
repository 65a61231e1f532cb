"""Time-series regularization: gap-filling resample with forward fill
(builder brief extension — the feature-engineering step that turns an
irregular event log into the fixed-cadence grid sequence models train on).

Scale shape: the raw event log is aggregated FIRST (one shuffle, map-side
partial combine), so the dense grid is generated from per-key bounds —
its size is keys × buckets, independent of the event count. The fill is
a running `last(ignorenulls)` window per key sharing the grid join's
partitioning. Skew only if one key spans a vastly longer time range than
the rest; cap `max_buckets` to bound that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
    interval: str = "interval 1 hour",
    max_buckets: int | None = 100_000,
) -> DataFrame:
    """(key, bucket, value_sum, observed) on a dense per-key time grid;
    buckets with no events carry the previous observed value forward
    (NULL before the first observation). ``max_buckets`` fails loudly if
    one key would explode the grid (a data bug at 100 TB, not a workload)."""
    obs = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.round(F.sum(value_col), 6).alias("v"))
    )
    bounds = obs.groupBy("key").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    grid = bounds.select(
        "key",
        F.explode(F.expr(f"sequence(mn, mx, {interval})")).alias("bucket"),
    )
    if max_buckets is not None:
        n = bounds.select(
            F.max(
                F.expr(f"size(sequence(mn, mx, {interval}))")
            ).alias("n")
        ).collect()[0].n
        if n is not None and n > max_buckets:
            raise ValueError(
                f"grid would emit {n} buckets for one key (> {max_buckets})"
            )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(obs, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.last("v", ignorenulls=True).over(w).alias("value_sum"),
            F.col("v").isNotNull().alias("observed"),
        )
    )
