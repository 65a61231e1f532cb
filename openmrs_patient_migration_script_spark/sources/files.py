"""Delimited/JSON-lines file sources and sinks.

Same contract as the parquet source: **explicit schema, fail loud**. Schema
inference is banned in production paths — it costs an extra full scan at
100 TB and silently drifts types between runs; a malformed row is an error
(``FAILFAST``), not a silent NULL (``PERMISSIVE``'s default), matching the
engine's fail-loud read policy (tests/test_sources.py pins both).

CSV/JSON scans are row-oriented (no column pruning on disk, no predicate
pushdown into the file) — fine for ingest boundaries, wrong for iterative
analytics; pipelines land them into parquet once and query that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .option("timestampFormat", TS_FMT)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.option("header", True).option("timestampFormat", TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").csv(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC: the other columnar format Spark ships a vectorized reader for.

    Unlike CSV/JSON, ORC keeps the parquet-grade scan properties — column
    pruning, predicate pushdown into stripe/row-group stats — so it is a
    landing format, not just an ingest boundary. Schema stays explicit for
    the same fail-loud reasons as every other source here.
    """
    return spark.read.schema(schema).orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").orc(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST")
        .option("timestampFormat", TS_FMT)
        .json(path)
    )


def write_json(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.option("timestampFormat", TS_FMT)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: StructType,
    row_tag: str = "row",
) -> DataFrame:
    """XML source (r4) — Spark 4 ships the former spark-xml package as a
    built-in ``xml`` format, which closes the last common ingest-boundary
    format gap (healthcare/HL7-adjacent exports, the reference's domain,
    are disproportionately XML). Same contract as every source here:
    explicit schema, FAILFAST on malformed rows. Like CSV/JSON it is an
    ingest boundary, not a landing format — row-oriented, no pushdown;
    land to parquet and query that.
    """
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .option("mode", "FAILFAST")
        .option("timestampFormat", TS_FMT)
        .load(path)
    )


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    partition_by: list[str] | None = None,
) -> None:
    w = (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .option("timestampFormat", TS_FMT)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.mode("overwrite").save(path)


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = 64 * 1024 * 1024,
) -> DataFrame:
    """Real media ingestion: Spark's built-in ``binaryFile`` source scans a
    directory of files into the engine's media-table schema (media_id,
    content, media_type, n_bytes, path) — the on-ramp from files on
    disk/object storage to operators/multimodal.py (pass
    ``decoder=decode_media`` there for the real WAV/BMP decode).

    - ``media_id`` is ``xxhash64(path)`` — content-addressed by LOCATION,
      deterministic across runs and partitionings (no zipWithIndex);
    - ``media_type`` comes from the file extension (lowercased), a hint
      only — decoders sniff magic bytes and fail loud on mismatch;
    - ``max_bytes`` filters oversized payloads BEFORE they are read into
      task memory (binaryFile loads each file whole into one row — the
      documented constraint; video-scale blobs belong in chunked stores).
      Pushed down via the source's own ``pathGlobFilter``/length column.

    binaryFile splits files across tasks by file boundary, so media rows
    are born partitioned by file — the same no-shuffle story as
    make_media_table.
    """
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    media_type = (
        F.when(ext == "wav", F.lit("audio/wav"))
        .when(ext == "bmp", F.lit("image/bmp"))
        .when(ext.isin("jpg", "jpeg"), F.lit("image/jpeg"))
        .when(ext == "png", F.lit("image/png"))
        .when(ext == "mp3", F.lit("audio/mpeg"))
        .when(ext == "mp4", F.lit("video/mp4"))
        .otherwise(F.concat(F.lit("application/"), ext))
    )
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content"),
        media_type.alias("media_type"),
        F.col("length").cast("int").alias("n_bytes"),
        F.col("path"),
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    whole_files: bool = False,
) -> DataFrame:
    """Raw-text corpus ingestion — the documents-table on-ramp for a tree
    of ``.txt``/``.md``/line-delimited files, built on the ``text`` source.

    Two modes:
    - line mode (default): one row per line — the shape of one-document-
      per-line corpus dumps. ``doc_id = xxhash64(path, text)``: content-
      addressed and deterministic under any partitioning (no
      zipWithIndex/monotonically_increasing_id, both of which renumber on
      re-runs). Byte-identical duplicate lines of the SAME file collapse
      to one id — for training corpora that is exact-dedup-at-ingest;
      callers who need multiplicity count rows per id before dropping.
    - whole-file mode (``wholetext``): one row per file, ``doc_id =
      xxhash64(path)`` — for document-per-file layouts; each file must
      fit in one task's memory (same constraint as binaryFile).

    Rows are born partitioned by file split; zero shuffles. Downstream:
    operators/text.py (quality, langid, tokens) and
    operators/corpus.py::prepare_corpus consume this schema directly.
    """
    from pyspark.sql import functions as F

    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if whole_files:
        df = reader.text(path, wholetext=True)
        doc_id = F.xxhash64(F.input_file_name())
    else:
        df = reader.text(path)
        doc_id = F.xxhash64(F.input_file_name(), F.col("value"))
    return df.select(
        doc_id.alias("doc_id"),
        F.col("value").alias("text"),
        F.input_file_name().alias("path"),
    )
