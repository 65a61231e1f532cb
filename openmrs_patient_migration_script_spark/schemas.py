"""Explicit StructType schemas for every harness table (FIXTURES.md §A).

The reference assumes pre-initialized fixed schemas rather than inferring
them (/root/reference/README.md:27); we mirror that policy: production reads
always pass an explicit schema so a drifted file fails loudly at analysis
time instead of silently changing types.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


TABLE_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # NOTE: this is the *published* (post-load) schema: ts is always a
    # TimestampType (µs). On disk the harness has shipped `events.ts` as
    # both TIMESTAMP(MICROS) and TIMESTAMP(NANOS) across regenerations;
    # sources/parquet.py probes the parquet footer and pins the matching
    # read schema (NANOS scans as LongType under
    # spark.sql.legacy.parquet.nanosAsLong, then converts) — see
    # events_read_schema().
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)


def events_read_schema(ts_unit: str) -> StructType:
    """The pinned *read* schema for `events` given the on-disk ts unit.

    ``us`` files scan straight into TimestampType; ``ns`` files scan as a
    raw LongType epoch (spark.sql.legacy.parquet.nanosAsLong) that the
    loader converts with exact integer division — see
    sources/parquet.py::load_table.
    """
    if ts_unit == "ns":
        # derive from the published schema with only ts swapped, so a
        # column added to TABLE_SCHEMAS["events"] can't silently go
        # missing from the ns read path
        return StructType(
            [
                StructField("ts", LongType(), f.nullable) if f.name == "ts" else f
                for f in TABLE_SCHEMAS["events"].fields
            ]
        )
    return TABLE_SCHEMAS["events"]
