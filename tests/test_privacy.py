"""Privacy operator invariants with planted PII (the fixture corpus is
synthetic and PII-free, so the declared query only pins mechanics — these
tests assert actual redaction behavior)."""

from __future__ import annotations

from openmrs_patient_migration_script_spark.operators.privacy import (
    k_anonymity_audit,
    pseudonym,
    pseudonymize,
    scrub_text,
)

from pyspark.sql import functions as F


def test_scrub_redacts_planted_pii(spark):
    df = spark.createDataFrame(
        [
            (1, "contact john.doe@example.com or call 5551234567 now"),
            (2, "mrn 00012345 seen 2026 01 12 id 9"),
            (3, "no personal information here"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in scrub_text(df).collect()}
    assert rows[1].scrubbed_text == "contact <EMAIL> or call <NUM> now"
    assert rows[1].n_emails == 1 and rows[1].n_numbers == 1
    # 2026 is a 3+ digit run; "9" (single digit) is kept
    assert rows[2].scrubbed_text == "mrn <NUM> seen <NUM> 01 12 id 9"
    assert rows[2].n_numbers == 2
    assert rows[3].scrubbed_text == "no personal information here"
    assert rows[3].n_emails == 0 and rows[3].n_numbers == 0


def test_pseudonym_is_stable_and_salt_sensitive(spark):
    df = spark.range(1, 100).select(F.col("id"))
    a = df.select(pseudonym(F.col("id"), "s1").alias("p")).collect()
    b = df.select(pseudonym(F.col("id"), "s1").alias("p")).collect()
    c = df.select(pseudonym(F.col("id"), "s2").alias("p")).collect()
    assert a == b  # deterministic across runs
    assert {r.p for r in a}.isdisjoint({r.p for r in c})  # salt changes all
    assert len({r.p for r in a}) == 99  # no collisions here


def test_pseudonymize_drops_raw_identifiers(spark):
    df = spark.createDataFrame(
        [(7, "Patient#007", 2229.54, "HEALTH")],
        ["pid", "name", "balance", "segment"],
    )
    out = pseudonymize(
        df, "pid", "salt", name_col="name",
        band_cols={"balance": 100}, keep_cols=["segment"],
    )
    assert set(out.columns) == {
        "pseudo_id", "name_redacted", "balance_band", "segment"
    }
    row = out.collect()[0]
    assert row.name_redacted == "Patient####"
    assert row.balance_band == 2200
    assert "7" not in row.pseudo_id or row.pseudo_id != "7"


def test_kanon_audit_flags_small_groups_only(spark):
    rows = [("a", 1)] * 5 + [("b", 2)] * 2
    df = spark.createDataFrame(rows, ["q1", "q2"])
    flagged = k_anonymity_audit(df, ["q1", "q2"], k=5).collect()
    assert len(flagged) == 1
    assert flagged[0].q1 == "b" and flagged[0].group_size == 2


def test_l_diversity_flags_homogeneous_groups_k_anon_misses(spark):
    """A big group with one sensitive value passes k-anonymity yet fails
    l-diversity — the disclosure class the audit exists to catch."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        k_anonymity_audit,
        l_diversity_audit,
    )

    rows = (
        # group A: 6 rows, all the same diagnosis — k=5 ok, l=3 FAIL
        [(1, "a", "flu")] * 6
        # group B: 6 rows, 3 distinct diagnoses — both pass
        + [(2, "b", d) for d in ["flu", "cold", "covid"] * 2]
        # group C: 2 rows, 2 distinct — k FAIL, l FAIL
        + [(3, "c", d) for d in ["flu", "cold"]]
    )
    df = spark.createDataFrame(rows, ["zip", "band", "diagnosis"])
    k_flagged = {(r.zip, r.band) for r in
                 k_anonymity_audit(df, ["zip", "band"], k=5).collect()}
    l_flagged = {(r.zip, r.band): (r.group_size, r.n_sensitive) for r in
                 l_diversity_audit(df, ["zip", "band"], "diagnosis", l=3).collect()}
    assert k_flagged == {(3, "c")}
    assert l_flagged == {(1, "a"): (6, 1), (3, "c"): (2, 2)}


def test_t_closeness_flags_concentration_k_and_l_both_miss(spark):
    """A group can be large (passes k) and hold 3 distinct values
    (passes l) while being wildly concentrated vs the population — the
    leak only the distribution distance sees. A group mirroring the
    global mix must NOT flag."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        k_anonymity_audit,
        l_diversity_audit,
        t_closeness_audit,
    )

    # global mix engineered ~uniform over flu/cold/covid
    skew = (
        [(1, "flu")] * 28 + [(1, "cold")] + [(1, "covid")]  # 93% flu
    )
    fair = [(2, d) for d in ["flu", "cold", "covid"] * 10]
    # balance the population so 'fair' matches the global distribution
    rest = [(3, d) for d in ["cold", "covid"] * 14] + [(3, "flu")] * 2
    df = spark.createDataFrame(skew + fair + rest, ["zip", "diagnosis"])
    assert not k_anonymity_audit(df, ["zip"], k=5).collect()
    assert not l_diversity_audit(df, ["zip"], "diagnosis", l=3).collect()
    flagged = {r.zip: r.tvd for r in
               t_closeness_audit(df, ["zip"], "diagnosis", t=0.2).collect()}
    assert 1 in flagged and flagged[1] > 0.4
    assert 2 not in flagged


def test_enforce_kanon_suppresses_exactly_the_audited_groups(spark):
    from openmrs_patient_migration_script_spark.operators.privacy import (
        enforce_k_anonymity,
        k_anonymity_audit,
    )

    rows = [(1, "a")] * 6 + [(2, "b")] * 3 + [(3, "c")] * 5
    df = spark.createDataFrame(rows, ["zip", "band"])
    out = enforce_k_anonymity(df, ["zip", "band"], k=5)
    assert out.count() == 11  # the 3-row group is suppressed whole
    assert out.filter("zip = 2").count() == 0
    # released table passes its own audit by construction
    assert not k_anonymity_audit(out, ["zip", "band"], k=5).collect()
    # columns unchanged (no helper leakage)
    assert out.columns == df.columns


def test_generalize_to_k_picks_finest_satisfying_level(spark):
    from pyspark.sql import functions as F

    from openmrs_patient_migration_script_spark.operators.privacy import (
        generalize_to_k,
    )

    # 12 rows in city A, 3 in city B: city-level k=5 fails (B has 3),
    # region-level groups are {R1: 15} -> level 1 chosen for ALL rows
    rows = [(i, "A") for i in range(12)] + [(100 + i, "B") for i in range(3)]
    df = spark.createDataFrame(rows, ["id", "city"])
    out = generalize_to_k(
        df,
        "id",
        levels=[
            {"city_g": F.col("city")},
            {"city_g": F.lit("R1")},
            {"city_g": F.lit("*")},
        ],
        k=5,
    ).collect()
    assert all(r["level"] == 1 and r["city_g"] == "R1" for r in out)
    # k=13: city (12,3) and a split region (12,3) both fail; the ladder
    # must bottom out at '*' (15 rows >= 13, so the release is legal)
    out2 = generalize_to_k(
        df,
        "id",
        levels=[
            {"city_g": F.col("city")},
            {"city_g": F.when(F.col("city") == "A", "R1").otherwise("R2")},
            {"city_g": F.lit("*")},
        ],
        k=13,
    ).collect()
    assert all(r["level"] == 2 and r["city_g"] == "*" for r in out2)
    # k=3: the finest level already satisfies -> no generalization
    out3 = generalize_to_k(
        df, "id",
        levels=[{"city_g": F.col("city")}, {"city_g": F.lit("*")}], k=3,
    ).collect()
    assert all(r["level"] == 0 for r in out3)


def test_generalize_to_k_fails_loud_when_unsatisfiable(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from openmrs_patient_migration_script_spark.operators.privacy import (
        generalize_to_k,
    )

    df = spark.createDataFrame([(i, "A") for i in range(10)], ["id", "city"])
    with _pytest.raises(Exception, match="no ladder level satisfies"):
        generalize_to_k(
            df, "id",
            levels=[{"c": F.col("city")}, {"c": F.lit("*")}], k=25,
        ).collect()


def test_k_map_population_vs_sample_risk(spark, tmp_path):
    """k-map semantics on a planted registry: a released class that is
    large in the population is safe even when its sample count is tiny,
    and a class whose POPULATION is small is at risk even though every
    one of its members was released (sample-side k-anonymity would pass
    it)."""
    from openmrs_patient_migration_script_spark.plans import QUERIES

    cust = []
    # class A: nation 1 / AUTO, population 12, 3 released
    for i in range(12):
        cust.append((i, f"c{i}", 1, 0.0, "AUTO"))
    # class B: nation 2 / BIKE, population 2, both released
    cust.append((100, "c100", 2, 0.0, "BIKE"))
    cust.append((101, "c101", 2, 0.0, "BIKE"))
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_nationkey int, "
              "c_acctbal double, c_mktsegment string"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    import datetime as dt

    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    orders = [
        (k, c, "O", 1.0, dt.datetime(2024, 1, 1), "1-URGENT")
        for k, c in enumerate([0, 1, 2, 100, 101])
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = {(r.nation, r.segment): r for r in
           QUERIES["privacy_k_map"](spark, str(tmp_path)).collect()}
    a, b = out[(1, "AUTO")], out[(2, "BIKE")]
    assert a.n_sample == 3 and a.n_population == 12 and not a.at_risk
    assert b.n_sample == 2 and b.n_population == 2 and b.at_risk


def test_dp_histogram_full_grid_and_determinism(spark):
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_histogram,
    )

    df = spark.createDataFrame(
        [(v,) for v in [5, 5, 5, 15, 15, 95]], "cents long"
    )
    out1 = {
        r.bucket: (r.bin_lo_cents, r.noisy_count)
        for r in dp_histogram(
            df, F.col("cents"), 0, 10, 10, "s1", repeats=2
        ).collect()
    }
    # FULL grid: all 10 buckets present, including the 7 empty ones
    assert set(out1) == set(range(10))
    assert [out1[b][0] for b in range(10)] == [b * 10 for b in range(10)]
    # noise bounded: |sum of 2 (Binomial(60,.5)-30)| <= 60
    true = {0: 3, 1: 2, 9: 1}
    for b in range(10):
        assert abs(out1[b][1] - true.get(b, 0)) <= 60
    # content-addressed: rerun identical, new salt differs somewhere
    out2 = {
        r.bucket: r.noisy_count
        for r in dp_histogram(
            df, F.col("cents"), 0, 10, 10, "s1", repeats=2
        ).collect()
    }
    assert out2 == {b: v for b, (_, v) in out1.items()}
    other = {
        r.bucket: r.noisy_count
        for r in dp_histogram(
            df, F.col("cents"), 0, 10, 10, "s2", repeats=2
        ).collect()
    }
    assert other != out2
    # clamping: out-of-range values land in edge buckets, count preserved
    wild = spark.createDataFrame([(-500,), (10_000,)], "cents long")
    w = {
        r.bucket: r.noisy_count
        for r in dp_histogram(wild, F.col("cents"), 0, 10, 10, "sx").collect()
    }
    assert set(w) == set(range(10))


def test_dp_quantile_tracks_true_quartiles(spark):
    """1000 uniform values over the grid: the exponential mechanism's
    released quartile buckets must land within 2 buckets of the true
    quartiles (weights decay 2x per rank, so mass far from the target
    is astronomically small), and reruns replay identically."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_quantile,
    )

    df = spark.createDataFrame([(v,) for v in range(1000)], "cents long")
    out = {
        r.quantile_pct: r.bucket
        for r in dp_quantile(
            df, F.col("cents"), 0, 100, 10, "q1", (25, 50, 75)
        ).collect()
    }
    assert set(out) == {25, 50, 75}
    # true quartile buckets are 2, 5, 7 (target ranks 250/500/750)
    for pct, true_b in [(25, 2), (50, 5), (75, 7)]:
        assert abs(out[pct] - true_b) <= 2, (pct, out[pct])
    rerun = {
        r.quantile_pct: r.bucket
        for r in dp_quantile(
            df, F.col("cents"), 0, 100, 10, "q1", (25, 50, 75)
        ).collect()
    }
    assert rerun == out
