

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
