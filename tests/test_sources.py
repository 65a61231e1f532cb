"""CSV/JSON file source/sink parity: exact roundtrips with pinned schemas
and fail-loud malformed-row behavior (sources/files.py)."""

from __future__ import annotations

import pytest

from openmrs_patient_migration_script_spark.sources import (
    load_table,
    read_csv,
    read_json,
    read_orc,
    read_xml,
    write_csv,
    write_json,
    write_orc,
    write_xml,
)


def _rowset(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "xml"])
def test_roundtrip_is_exact(spark, sf_dir, tmp_path, fmt):
    # orders exercises long/string/double/timestamp columns
    orig = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / f"orders_{fmt}")
    if fmt == "csv":
        write_csv(orig, path)
        back = read_csv(spark, path, orig.schema)
    elif fmt == "json":
        write_json(orig, path)
        back = read_json(spark, path, orig.schema)
    elif fmt == "xml":
        write_xml(orig, path)
        back = read_xml(spark, path, orig.schema)
    else:
        write_orc(orig, path)
        back = read_orc(spark, path, orig.schema)
    assert back.schema == orig.schema
    assert _rowset(back) == _rowset(orig)


def test_orc_scan_keeps_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """ORC is a landing format: filters must reach the scan (PushedFilters)
    and the read schema must shrink to the projection, same as parquet."""
    orig = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orig, path)
    q = (
        read_orc(spark, path, orig.schema)
        .filter("o_totalprice > 100000.0")
        .select("o_orderkey")
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = q._jdf.queryExecution().explainString(mode)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in scan_schema and "o_comment" not in scan_schema


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orig = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_csv(orig.select("o_orderkey", "o_totalprice", "o_orderstatus"), path,
              partition_by=["o_orderstatus"])
    import os

    dirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"} <= dirs


def test_malformed_csv_fails_loud(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "part.csv").write_text("k,v\n1,2\nnot_a_number,3\n")
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv(spark, str(p), schema).collect()


def test_malformed_xml_fails_loud(spark, tmp_path):
    """FAILFAST must hold for the XML boundary too: a row whose typed
    field can't parse is an error, not a silent NULL."""
    p = tmp_path / "badxml"
    p.mkdir()
    (p / "part.xml").write_text(
        "<rows><row><k>1</k><v>2</v></row>"
        "<row><k>not_a_number</k><v>3</v></row></rows>"
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_xml(spark, str(p), schema).collect()


class TestPythonDataSource:
    """Spark 4 Python DataSource API hosting a driver-less legacy
    connector (sources/custom.py)."""

    def _read(self, spark, rows=500, parts=8):
        from openmrs_patient_migration_script_spark.sources.custom import (
            LegacyEnrollmentDataSource,
        )

        spark.dataSource.register(LegacyEnrollmentDataSource)
        return (
            spark.read.format("legacy_enrollment")
            .option("rows", rows)
            .option("numPartitions", parts)
            .load()
        )

    def test_row_count_and_schema(self, spark):
        df = self._read(spark)
        assert df.count() == 500
        assert [f.name for f in df.schema.fields] == [
            "client_id", "full_name", "gender", "birthdate", "national_id",
        ]

    def test_partition_planning_fans_out(self, spark):
        df = self._read(spark, rows=500, parts=8)
        assert df.rdd.getNumPartitions() == 8

    def test_deterministic_and_matches_generator(self, spark):
        from openmrs_patient_migration_script_spark.sources.custom import (
            enrollment_row,
        )

        got = {r.client_id: r for r in self._read(spark, rows=50, parts=3).collect()}
        assert len(got) == 50
        for cid in (0, 7, 49):
            exp = enrollment_row(cid)
            r = got[cid]
            assert (r.client_id, r.full_name, r.gender, r.birthdate, r.national_id) == exp
        # identifier-fallback population exists (reference README.md:15)
        assert any(r.national_id is None for r in got.values())

    def test_feeds_registration_build(self, spark):
        """The custom source slots into the same registration ETL the
        parquet/JDBC paths use — connector swap, same plan."""
        df = self._read(spark, rows=200, parts=4)
        out = df.selectExpr(
            "client_id",
            "upper(full_name) AS name_norm",
            "coalesce(national_id, concat('GEN-', client_id)) AS identifier",
        )
        rows = out.collect()
        assert len(rows) == 200
        assert all(r.identifier is not None for r in rows)

    def test_zero_rows_yields_empty_frame(self, spark):
        df = self._read(spark, rows=0, parts=4)
        assert df.count() == 0


def test_read_text_corpus_line_and_wholefile_modes(spark, tmp_path):
    """Raw text ingestion: line mode yields one row per line with
    content-addressed ids stable across re-reads; whole-file mode yields
    one row per file; glob filters; duplicate lines within a file
    collapse to one id (exact-dedup-at-ingest, documented)."""
    from openmrs_patient_migration_script_spark.sources.files import (
        read_text_corpus,
    )

    (tmp_path / "a.txt").write_text("alpha doc\nbeta doc\nalpha doc\n")
    (tmp_path / "b.txt").write_text("gamma doc\n")
    (tmp_path / "skip.log").write_text("not a doc\n")

    lines = read_text_corpus(spark, str(tmp_path), glob="*.txt")
    rows = lines.collect()
    assert {r.text for r in rows} == {"alpha doc", "beta doc", "gamma doc"}
    assert len(rows) == 4  # the duplicate alpha line is two ROWS, one id
    ids = {r.text: set() for r in rows}
    for r in rows:
        ids[r.text].add(r.doc_id)
    assert all(len(s) == 1 for s in ids.values())
    again = {(r.doc_id, r.text) for r in read_text_corpus(spark, str(tmp_path), glob="*.txt").collect()}
    assert again == {(r.doc_id, r.text) for r in rows}

    whole = read_text_corpus(spark, str(tmp_path), glob="*.txt", whole_files=True)
    wrows = whole.collect()
    assert len(wrows) == 2
    by_file = {r.path.rsplit("/", 1)[-1]: r.text for r in wrows}
    assert by_file["a.txt"] == "alpha doc\nbeta doc\nalpha doc\n"
    assert by_file["b.txt"].startswith("gamma doc")


class TestCustomStreamingSource:
    """S6-stream: the same custom Python connector as a CHANGE FEED —
    full DataSourceStreamReader (executor-side partitioned reads, not the
    driver-side Simple variant), offsets as plain dicts in the standard
    checkpoint offset log."""

    def test_stream_drains_to_batch_equality(self, spark):
        import time

        from openmrs_patient_migration_script_spark.sources.custom import (
            LegacyEnrollmentDataSource,
        )

        spark.dataSource.register(LegacyEnrollmentDataSource)
        q = (
            spark.readStream.format("legacy_enrollment")
            .option("rows", 300)
            .option("numPartitions", 3)
            .load()
            .writeStream.format("memory")
            .queryName("enrollment_feed")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                n = spark.sql(
                    "SELECT count(*) c FROM enrollment_feed"
                ).collect()[0]["c"]
                if n >= 300:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        streamed = spark.sql("SELECT * FROM enrollment_feed")
        # exactly-once drain: every id exactly once, rows identical to the
        # batch reader over the same id range (replayable-source contract)
        assert streamed.count() == 300
        assert streamed.select("client_id").distinct().count() == 300
        batch = (
            spark.read.format("legacy_enrollment").option("rows", 300).load()
        )
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0

    def test_restart_from_checkpoint_is_exactly_once(self, spark, tmp_path):
        """Kill the stream, restart from the same checkpoint: the offset
        log must resume the feed without duplicating or dropping a row
        (replayable-by-range + restart-monotone latestOffset — a reader
        whose offset regresses below the checkpoint replays ranges, the
        bug this test pins out)."""
        import time

        from openmrs_patient_migration_script_spark.sources.custom import (
            LegacyEnrollmentDataSource,
        )

        spark.dataSource.register(LegacyEnrollmentDataSource)
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")

        def start():
            return (
                spark.readStream.format("legacy_enrollment")
                .option("rows", 400)
                .option("numPartitions", 3)
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )

        q = start()
        q.awaitTermination(120)
        n_first = spark.read.parquet(sink).count()
        # restart against the same checkpoint: nothing new to ship
        q2 = start()
        q2.awaitTermination(120)
        time.sleep(0.5)
        out = spark.read.parquet(sink)
        assert n_first == 400
        assert out.count() == 400
        assert out.select("client_id").distinct().count() == 400


class TestPythonDataSourceSink:
    """The WRITE half of the Python DataSource surface
    (sources/custom.py::DestinationSinkDataSource): staged task files +
    manifest publish = two-phase commit in batch, batch-id-idempotent
    manifests in streaming."""

    SCHEMA = "client_id bigint, full_name string"

    def _register(self, spark):
        from openmrs_patient_migration_script_spark.sources.custom import (
            DestinationSinkDataSource,
        )

        spark.dataSource.register(DestinationSinkDataSource)

    def test_batch_write_publishes_exactly_the_input(self, spark, tmp_path):
        from openmrs_patient_migration_script_spark.sources.custom import (
            read_committed_sink,
        )

        self._register(spark)
        dest = str(tmp_path / "dest")
        df = spark.createDataFrame(
            [(i, f"client-{i}") for i in range(100)], self.SCHEMA
        ).repartition(4)
        df.write.format("destination_sink").option("path", dest).mode(
            "append"
        ).save()
        back = read_committed_sink(spark, dest, self.SCHEMA)
        assert {tuple(r) for r in back.collect()} == {
            (i, f"client-{i}") for i in range(100)
        }

    def test_staged_without_manifest_is_invisible(self, spark, tmp_path):
        """The two-phase contract: a task file that was staged but never
        committed (crash debris) must NOT surface to readers."""
        import os

        from openmrs_patient_migration_script_spark.sources.custom import (
            read_committed_sink,
        )

        self._register(spark)
        dest = str(tmp_path / "dest")
        spark.createDataFrame([(1, "a")], self.SCHEMA).write.format(
            "destination_sink"
        ).option("path", dest).mode("append").save()
        with open(os.path.join(dest, "_staged", "task-orphan.jsonl"), "w") as f:
            f.write('{"client_id": 999, "full_name": "ghost"}\n')
        back = read_committed_sink(spark, dest, self.SCHEMA)
        assert [tuple(r) for r in back.collect()] == [(1, "a")]

    def test_stream_write_and_replay_is_exactly_once(self, spark, tmp_path):
        """availableNow stream into the sink, then re-run with the SAME
        checkpoint: no new batches fire, and a simulated replay of an
        already-committed batch id rewrites its manifest instead of
        duplicating it — the committed row set is stable."""
        import glob
        import os

        from openmrs_patient_migration_script_spark.sources.custom import (
            LegacyEnrollmentDataSource,
            read_committed_sink,
        )

        self._register(spark)
        spark.dataSource.register(LegacyEnrollmentDataSource)
        dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")
        os.makedirs(dest, exist_ok=True)

        def run_once():
            q = (
                spark.readStream.format("legacy_enrollment")
                .option("rows", 120)
                .option("numPartitions", 3)
                .load()
                .selectExpr("client_id", "full_name")
                .writeStream.format("destination_sink")
                .option("path", dest)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        first = {tuple(r) for r in read_committed_sink(spark, dest, self.SCHEMA).collect()}
        assert len(first) == 120
        manifests_before = sorted(glob.glob(os.path.join(dest, "manifest-*.json")))

        run_once()  # same checkpoint: everything already processed
        second = {tuple(r) for r in read_committed_sink(spark, dest, self.SCHEMA).collect()}
        assert second == first
        assert sorted(glob.glob(os.path.join(dest, "manifest-*.json"))) == manifests_before


def test_load_evolved_merges_schema_versions(spark, tmp_path):
    """Schema-evolution read (sources/parquet.py::load_evolved): files
    written under older schemas surface NULL for later-added columns;
    the merged read sees the union; the target-schema contract coerces
    and fails loud on a missing contract column."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from openmrs_patient_migration_script_spark.sources.parquet import load_evolved

    path = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "id long, name string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)

    merged = load_evolved(spark, path)
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}

    contract = StructType(
        [
            StructField("id", LongType()),
            StructField("score", DoubleType()),
        ]
    )
    coerced = load_evolved(spark, path, target_schema=contract)
    assert [f.name for f in coerced.schema.fields] == ["id", "score"]

    bad = StructType([StructField("nope", StringType())])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="nope"):
        load_evolved(spark, path, target_schema=bad)
