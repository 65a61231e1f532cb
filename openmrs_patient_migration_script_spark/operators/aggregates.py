"""Aggregation helpers with enforceable contracts (SURVEY.md §2.4).

`listagg` (A10) buffers and sorts the WHOLE group per key — fine on a
bounded dimension rollup, an OOM on an unbounded fact key. r2 documented
that hazard in a docstring; r3 makes it enforceable: the bounded form
carries an in-plan `assert_true` on the group size (computed inside the
SAME hash aggregate — zero extra passes, zero extra shuffles), so an
oversized group fails the job loudly instead of silently concentrating
memory on one task. The unbounded alternative stays what SURVEY.md §2.4
prescribes: top-k per key first (O2/O3), then concat the bounded
survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def listagg_bounded(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    sep: str = ",",
    max_group_size: int = 10_000,
    out_col: str = "agg_list",
) -> DataFrame:
    """Ordered LISTAGG with a fail-loud group-size contract.

    The group count rides the same partial-combinable hash aggregate as
    the listagg buffer; the `assert_true` filter on top is row-local over
    the (already tiny) aggregated output. Groups over ``max_group_size``
    raise with the offending group key in the message — the same guard
    shape `resample_ffill` uses for runaway key spans
    (operators/timeseries.py).
    """
    agged = df.groupBy(*group_cols).agg(
        F.expr(
            f"listagg({value_col}, '{sep}') WITHIN GROUP (ORDER BY {value_col})"
        ).alias(out_col),
        F.count("*").alias("_grp_n"),
    )
    key_desc: Column = F.concat_ws(
        "/", *[F.col(c).cast("string") for c in group_cols]
    )
    guard = F.assert_true(
        F.col("_grp_n") <= max_group_size,
        F.concat(
            F.lit("listagg group "),
            key_desc,
            F.lit(" has "),
            F.col("_grp_n").cast("string"),
            F.lit(f" rows (> {max_group_size}): use top-k-then-concat"),
        ),
    )
    return agged.where(guard.isNull()).drop("_grp_n")
