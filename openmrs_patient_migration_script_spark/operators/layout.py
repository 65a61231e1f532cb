"""Storage layout & table maintenance — the write-side half of a 100 TB
engine.

A long-lived table's read performance is mostly decided *before* any query
runs, by three layout properties this module manages:

1. **File sizing** (``compact_table``): streaming ingest and fine-grained
   partitioned writes leave thousands of tiny files per partition; at
   100 TB the driver-side file listing and per-file open cost dominate the
   scan. Compaction bin-packs a table back to ~``target_file_bytes`` files.
2. **Partition layout** (``write_partitioned``): directory partitioning on
   a low-cardinality predicate column (date, region) turns matching
   ``WHERE`` clauses into partition pruning — files outside the predicate
   are never listed, let alone read — and joins against a filtered dim into
   *dynamic* partition pruning (Catalyst builds the partition filter from
   the dim side at runtime). tests/test_layout.py pins both plans.
3. **Row-group clustering** (``cluster_by_range``): parquet stores per
   row-group min/max stats; readers skip row groups whose [min, max] band
   misses the predicate. Stats only help if each file covers a *narrow*
   band — global range partitioning + an intra-partition sort gives every
   file a tight, nearly disjoint key range (a 1-D Z-order). The pyarrow
   footer check in tests proves the bands tightened.

All three are plain DataFrame writes — no custom file formats, no sidecar
metadata — so they compose with every source in ``sources/``.

The reference migrates into MySQL (/root/reference/README.md:7-17) and has
no table-maintenance story; this surface is engine capability mandated by
the 100 TB design brief (/root/repo/BASELINE.json:6).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a directory-partitioned parquet table.

    ``partition_cols`` should be low-cardinality predicate columns (a date
    bucket, a region) — every distinct combination becomes a directory, and
    100k+ directories of tiny files is the anti-pattern ``compact_table``
    exists to fix. ``max_records_per_file`` caps file size without an extra
    shuffle (the writer rolls files as it goes).
    """
    w = df.write
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def table_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a parquet table's data files.

    Uses the same Hadoop FileSystem API a cluster run would (works for
    hdfs:// and s3a:// paths, not just local disk), recursing through
    partition directories and skipping _SUCCESS/metadata sidecars.
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    files, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.startswith("_") or name.startswith("."):
            continue
        files += 1
        total += status.getLen()
    return files, total


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: list[str] | None = None,
) -> tuple[int, int]:
    """Rewrite a fragmented parquet table into ~``target_file_bytes`` files.

    Returns (files_before, files_after). File count is sized from the
    table's *actual* on-disk bytes, so repeated runs converge: the first
    pass also sheds per-file overhead (footers, per-file dictionary pages),
    which can shrink the table below the pre-compaction byte count, so the
    stable file count is reached from the second pass on.

    For a partitioned table pass ``partition_cols``: rows are hashed to
    writer tasks *by partition column* so each output partition directory
    is written by as few tasks as possible (repartition by a random-ish
    column would scatter every directory across every task and regenerate
    the small-file problem being fixed).

    The rewrite stages into ``<path>__compact_tmp``, renames the old table
    aside, promotes the staged copy, then deletes the old data — a reader
    never observes a HALF-WRITTEN table, and no point in the sequence can
    lose data (a crash between the two renames leaves the table briefly
    absent but fully recoverable from ``<path>__compact_old``). True
    atomic swap is the transactional-commit step a table format
    (Iceberg/Delta) or a metastore owns; the sizing and clustering logic
    stays the same.
    """
    files_before, total_bytes = table_file_stats(spark, path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact_tmp"
    if partition_cols:
        # one writer task per output partition-dir slice
        df.repartition(n_files, *partition_cols).write.partitionBy(
            *partition_cols
        ).mode("overwrite").parquet(tmp)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(tmp)

    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    # rename-aside, promote, then delete: the old data survives every
    # crash point (delete-then-rename would lose the table if the driver
    # died between the two calls)
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compact_old")
    if fs.exists(old):  # debris from a previous crashed run
        fs.delete(old, True)
    fs.rename(jpath, old)
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)
    fs.delete(old, True)

    files_after, _ = table_file_stats(spark, path)
    return files_before, files_after


def cluster_by_range(
    df: DataFrame, cols: list[str], n_files: int
) -> DataFrame:
    """Range-cluster ``df`` so each output file covers a tight key band.

    ``repartitionByRange`` samples the key distribution and assigns each
    task a contiguous range; ``sortWithinPartitions`` orders rows inside the
    task so parquet's per-row-group min/max stats are tight too. The result
    is written with a plain ``.write`` — the clustering lives in the data
    layout, not in metadata, so any reader benefits.

    At 100 TB this is the difference between a point-lookup query reading
    one file and reading all of them: predicate ``k = x`` matches exactly
    one file's [min, max] band after clustering.
    """
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, n_files: int, bits: int = 8
) -> DataFrame:
    """Two-dimensional clustering via a Morton (Z-order) curve.

    ``cluster_by_range`` gives perfect bands on its *leading* column and
    none on any other; a table queried by both ``(customer)`` and
    ``(order value)`` needs each file to cover a small *rectangle* in the
    2-D key space. Z-ordering gets there by interleaving the bits of the
    two keys and range-clustering on the interleaved value — files then
    hold contiguous runs of the space-filling curve, so per-file min/max
    stats are tight in BOTH dimensions (quadratically worse than perfect
    per dimension, instead of one perfect + one useless).

    Each key is first scaled to ``bits`` bits against its observed min/max
    (one 2-row aggregate job — the same pre-pass ``repartitionByRange``'s
    sampler already pays). Interleaving is pure JVM arithmetic
    (``shiftleft``/``bitwiseOR``) unrolled ``bits`` times into one
    codegen'd expression — no UDF, no extra shuffle beyond the one
    clustering exchange every layout rewrite pays anyway.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if lo_a is None or lo_b is None:  # empty table or all-NULL key column
        return df  # nothing to cluster; a no-op beats float(None) crashing
    max_code = (1 << bits) - 1

    def scaled(c, lo, hi):
        span = max(float(hi) - float(lo), 1e-12)
        return F.least(
            F.lit(max_code),
            ((F.col(c).cast("double") - float(lo)) / span * max_code).cast("long"),
        )

    a, b = scaled(col_a, lo_a, hi_a), scaled(col_b, lo_b, hi_b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def rowgroup_bands(path: str, column: str) -> list[tuple[object, object]]:
    """Per-file (min, max) bands for ``column`` from parquet footers.

    Reads footer metadata only (no data pages) via pyarrow — the same stats
    a Spark scan consults when deciding which row groups to skip. Used by
    tests to *prove* ``cluster_by_range`` tightened the bands rather than
    trusting that it should have.
    """
    import pyarrow.parquet as pq

    bands = []
    for root, _dirs, names in os.walk(path):
        for name in sorted(names):
            if not name.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, name)).metadata
            idx = meta.schema.names.index(column)
            lo, hi = None, None
            for rg in range(meta.num_row_groups):
                stats = meta.row_group(rg).column(idx).statistics
                if stats is None or not stats.has_min_max:
                    continue
                lo = stats.min if lo is None else min(lo, stats.min)
                hi = stats.max if hi is None else max(hi, stats.max)
            if lo is not None:
                bands.append((lo, hi))
    return bands
