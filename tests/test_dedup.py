

def test_minhash_quality_exact_duplicates_agree_fully(spark):
    """An exact duplicate pair must report mh_matches == 16 (identical
    signatures) AND n_inter == n_union (true Jaccard 1); a near-dup pair
    reports true intersection/union counts that reconstruct its shingle
    Jaccard exactly."""
    import os
    import tempfile

    from openmrs_patient_migration_script_spark.plans import QUERIES

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " extra tail words here"
    rows = [(1, base, "en", "web", len(base)),
            (2, base, "en", "web", len(base)),
            (3, near, "en", "web", len(near))]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            (r["key_a"], r["key_b"]): r
            for r in QUERIES["dedup_minhash_quality"](spark, d).collect()
        }
    exact = out[(1, 2)]
    assert exact["mh_matches"] == 16
    assert exact["n_inter"] == exact["n_union"]
    # the near pair (if banded together) must carry the true set sizes:
    # base has 10 3-shingles, near has 14, sharing all 10 of base's
    for key in [(1, 3), (2, 3)]:
        if key in out:
            r = out[key]
            assert (r["n_inter"], r["n_union"]) == (10, 14)
