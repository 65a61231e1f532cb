import pytest



@pytest.mark.slow
def test_stream_components_maintain_equals_full_recompute_and_replays(
    spark, tmp_path
):
    """ST11 (r10): after folding three micro-batches of pairs, the
    maintained index must equal the one-shot components over the FULL
    pair history (the dedup_clusters_incremental invariant, now under
    foreachBatch) — including a cross-batch merge (batch 2's bridge 3-10
    fuses batch 0's chain with batch 1's pair) and an indexed singleton
    carried through untouched. A replay on the same checkpoint rewrites
    nothing."""
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from openmrs_patient_migration_script_spark.operators.graph import (
        connected_components,
    )
    from openmrs_patient_migration_script_spark.streaming.pipelines import (
        stream_components_maintain,
        stream_components_read,
    )

    schema = StructType(
        [StructField("key_a", LongType()), StructField("key_b", LongType())]
    )
    b0 = [(1, 2), (2, 3), (7, 7)]       # chain + a self-loop singleton
    b1 = [(10, 11), (20, 21)]
    b2 = [(3, 10)]                      # bridges b0's chain to b1's pair
    src = str(tmp_path / "src")
    for i, chunk in enumerate([b0, b1, b2]):
        p = f"{src}/f{i}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1000 + i * 100, 1000 + i * 100))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = stream_components_maintain(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*"),
            out,
            ckpt,
        )
        q.awaitTermination(120)

    run()
    want = {
        r["node"]: r["cluster"]
        for r in connected_components(
            spark.createDataFrame(b0 + b1 + b2, schema)
        ).collect()
    }
    got = {
        r["node"]: r["cluster"]
        for r in stream_components_read(spark, out).collect()
    }
    assert got == want
    assert got[10] == 1 and got[11] == 1  # the cross-batch merge happened
    assert got[7] == 7  # the singleton survived two incremental folds
    snapshot = sorted(
        os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs
    )
    run()  # replay: no new input, nothing rewritten
    assert sorted(
        os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs
    ) == snapshot
    # a crashed in-flight snapshot is invisible to readers
    os.remove(f"{out}/_index_v=2/_SUCCESS")
    partial = {
        r["node"]: r["cluster"]
        for r in stream_components_read(spark, out).collect()
    }
    assert 10 in partial and partial[10] == 10  # v1: bridge not yet folded


@pytest.mark.slow
def test_stream_ann_buckets_maintain_equals_full_rebuild_and_replays(
    spark, tmp_path
):
    """ST12 (r11): after folding three micro-batches of embeddings, the
    maintained SRP bucket index must equal the one-shot `srp_hashed`
    over the FULL corpus (planes are content-addressed, so an indexed
    vector's buckets never change — the fold is append-shaped). A
    replay on the same checkpoint rewrites nothing; a crashed snapshot
    is invisible to readers."""
    import os

    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from openmrs_patient_migration_script_spark.operators.similarity import (
        srp_hashed,
    )
    from openmrs_patient_migration_script_spark.streaming.pipelines import (
        stream_ann_buckets_maintain,
        stream_ann_buckets_read,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(12)
    ]
    chunks = [rows[:4], rows[4:9], rows[9:]]
    src = str(tmp_path / "src")
    for i, chunk in enumerate(chunks):
        p = f"{src}/f{i}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1000 + i * 100, 1000 + i * 100))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = stream_ann_buckets_maintain(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/f*"),
            out,
            ckpt,
            num_planes=4,
            num_tables=8,
            hash_mode="md5",
        )
        q.awaitTermination(120)

    run()
    full = spark.createDataFrame(rows, schema)
    want = sorted(
        map(
            tuple,
            srp_hashed(full, "vec_id", 4, 8, "embedding", "md5").collect(),
        )
    )
    got = sorted(map(tuple, stream_ann_buckets_read(spark, out).collect()))
    assert got == want
    assert len(got) == 12 * 8  # L rows per indexed vector
    snapshot = sorted(
        os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs
    )
    run()  # replay: no new input, nothing rewritten
    assert sorted(
        os.path.join(d, f) for d, _, fs in os.walk(out) for f in fs
    ) == snapshot
    # a crashed in-flight snapshot is invisible to readers
    os.remove(f"{out}/_ann_v=2/_SUCCESS")
    partial = stream_ann_buckets_read(spark, out)
    assert partial.count() == 9 * 8  # v1: batches 0+1 only
