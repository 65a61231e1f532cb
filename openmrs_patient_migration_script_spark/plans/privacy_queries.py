"""Declared privacy queries (operators/privacy.py): de-identified export,
text PII scrub, k-anonymity audit. All value-checked against DuckDB —
the regex patterns are restricted to explicit character classes so the
Java and RE2 engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.privacy import (
    EMAIL_RE,
    LONG_NUM_RE,
    k_anonymity_audit,
    l_diversity_audit,
    pseudonymize,
    scrub_text,
)
from openmrs_patient_migration_script_spark.plans.registry import query
from openmrs_patient_migration_script_spark.sources import load_table

_SALT = "migration-2026"


@query(
    "etl_pseudonymize",
    oracle=f"""
    SELECT substr(md5('{_SALT}' || ':' || c_custkey::VARCHAR), 1, 16)
             AS pseudo_id,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS c_name_redacted,
           CAST(floor(c_acctbal / 100) * 100 AS BIGINT) AS c_acctbal_band,
           c_mktsegment, c_nationkey
    FROM customer
    """,
)
def etl_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-identified patient export: salted deterministic pseudonym
    (stable across tables, so downstream joins survive), digit-redacted
    name, banded balance, quasi-identifiers passed through. Row-local —
    zero shuffles at any scale."""
    c = load_table(spark, sf_dir, "customer")
    return pseudonymize(
        c,
        "c_custkey",
        _SALT,
        name_col="c_name",
        band_cols={"c_acctbal": 100},
        keep_cols=["c_mktsegment", "c_nationkey"],
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH lowered AS (SELECT doc_id, lower(text) AS t FROM documents),
    no_email AS (
      SELECT doc_id,
             len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
             regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g') AS t
      FROM lowered
    )
    SELECT doc_id,
           regexp_replace(t, '{LONG_NUM_RE}', '<NUM>', 'g') AS scrubbed_text,
           n_emails,
           len(regexp_extract_all(t, '{LONG_NUM_RE}')) AS n_numbers
    FROM no_email
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus PII scrub: emails then 3+-digit runs replaced by typed
    sentinels, with per-doc redaction counts (quarantine signal). The
    harness corpus is synthetic, so counts are mostly zero here — the
    planted-PII unit tests (tests/test_privacy.py) exercise the actual
    redaction; this query pins the full-corpus mechanics and schema."""
    return scrub_text(load_table(spark, sf_dir, "documents"))


@query(
    "privacy_kanon",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
           count(*) AS group_size
    FROM customer
    GROUP BY 1, 2, 3
    HAVING count(*) < 5
    """,
)
def privacy_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (nation, segment, balance band): the groups a de-identified release
    must suppress or generalize further. One partial-combined hash agg."""
    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity_audit(c, ["c_nationkey", "c_mktsegment", "bal_band"], k=5)


@query(
    "privacy_l_diversity",
    oracle="""
    SELECT c_nationkey,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
           count(*) AS group_size,
           count(DISTINCT c_mktsegment) AS n_sensitive
    FROM customer
    GROUP BY 1, 2
    HAVING count(DISTINCT c_mktsegment) < 3
    """,
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (l=3) over quasi-identifiers (nation, balance
    band) with market segment as the sensitive attribute
    (operators/privacy.py::l_diversity_audit) — the attribute-disclosure
    complement of `privacy_kanon`: a group can be large enough for k=5
    yet expose every member's segment if all rows share it. One hash agg;
    the single-column distinct keeps the plan Expand-free."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    return l_diversity_audit(
        c, ["c_nationkey", "bal_band"], "c_mktsegment", l=3
    )


@query(
    "privacy_dp_counts",
    oracle="""
    WITH counts AS (
      SELECT lang, source, count(*) AS true_count
      FROM documents GROUP BY 1, 2
    ),
    noised AS (
      SELECT lang, source,
             true_count
             + (bit_count(('0x' || substr(md5('dp-release-1:0:'
                 || coalesce(len(lang)::VARCHAR || ':' || lang, 'N') || ':'
                 || coalesce(len(source)::VARCHAR || ':' || source, 'N')),
                                          1, 15))::BIGINT) - 30)
             + (bit_count(('0x' || substr(md5('dp-release-1:1:'
                 || coalesce(len(lang)::VARCHAR || ':' || lang, 'N') || ':'
                 || coalesce(len(source)::VARCHAR || ':' || source, 'N')),
                                          1, 15))::BIGINT) - 30)
               AS noisy_count
      FROM counts
    )
    SELECT lang, source, noisy_count FROM noised WHERE noisy_count >= 10
    """,
)
def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially private histogram release of documents per
    (lang, source) via the seeded binomial mechanism
    (operators/privacy.py::dp_noisy_counts; two 60-bit draws, sigma ~ 5.5)
    with noisy-threshold suppression at 10. Content-addressed noise makes
    the whole mechanism — not just the true counts — exactly replayable
    by the oracle. One hash agg; noise is row-local post-agg."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_noisy_counts,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dp_noisy_counts(
        docs, ["lang", "source"], salt="dp-release-1", repeats=2, threshold=10
    )


@query(
    "privacy_t_closeness",
    oracle="""
    WITH b AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
             c_mktsegment AS s
      FROM customer
    ),
    c AS (SELECT c_nationkey, bal_band, s, count(*) AS c
          FROM b GROUP BY 1, 2, 3),
    n_g AS (SELECT c_nationkey, bal_band, sum(c) AS n FROM c GROUP BY 1, 2),
    q AS (SELECT s, sum(c) AS cs FROM c GROUP BY 1),
    bn AS (SELECT sum(cs) AS bign FROM q),
    fulld AS (
      SELECT g.c_nationkey, g.bal_band, g.n, q.s, q.cs, bn.bign,
             coalesce(c.c, 0) AS c
      FROM n_g g CROSS JOIN q CROSS JOIN bn
      LEFT JOIN c ON c.c_nationkey = g.c_nationkey
                 AND c.bal_band = g.bal_band AND c.s = q.s
    ),
    agged AS (
      SELECT c_nationkey, bal_band, n, bign,
             sum(CAST(abs(CAST(c AS DECIMAL(19,0)) * CAST(bign AS DECIMAL(19,0))
                          - CAST(cs AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                      AS DECIMAL(38,0))) AS num
      FROM fulld GROUP BY 1, 2, 3, 4
    )
    SELECT c_nationkey, bal_band, n::BIGINT AS group_size,
           round(num::DOUBLE / (2.0 * n::DOUBLE * bign::DOUBLE), 6) AS tvd
    FROM agged
    WHERE num::DOUBLE / (2.0 * n::DOUBLE * bign::DOUBLE) > 0.2
    """,
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third rung of the privacy-audit ladder
    (operators/privacy.py::t_closeness_audit): groups whose market-
    segment DISTRIBUTION sits more than t=0.2 total-variation distance
    from the population's — the concentration leak a group can carry
    while passing both k-anonymity (size) and l-diversity (cardinality).
    The TVD numerator is exact integer arithmetic over counts (one
    closing division), so the audit is partition-order free and the
    oracle exact; the full sensitive domain materializes per group so
    missing values contribute their |0 − q| term."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        t_closeness_audit,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    return t_closeness_audit(
        c, ["c_nationkey", "bal_band"], "c_mktsegment", t=0.2
    )


@query(
    "privacy_enforce_kanon",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
           c_custkey
    FROM (
      SELECT c_nationkey, c_mktsegment, c_acctbal, c_custkey,
             count(*) OVER (
               PARTITION BY c_nationkey, c_mktsegment,
                            CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT)
             ) AS gs
      FROM customer
    ) WHERE gs >= 5
    """,
)
def privacy_enforce_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION `privacy_kanon` implies
    (operators/privacy.py::enforce_k_anonymity): suppress every row
    whose quasi-group is smaller than k=5, so the released table passes
    its own audit by construction (pinned). One quasi-keyed Exchange —
    the group size rides in as a window count over the partitioning the
    filter consumes, not a count-aggregate-plus-join second pass."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        enforce_k_anonymity,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
        "c_custkey",
    )
    return enforce_k_anonymity(
        c, ["c_nationkey", "c_mktsegment", "bal_band"], k=5
    )


@query(
    "privacy_generalize_ladder",
    oracle="""
    WITH l0 AS (SELECT min(c) AS m FROM (
           SELECT count(*) AS c FROM customer
           GROUP BY c_nationkey, floor(c_acctbal / 1000))),
    l1 AS (SELECT min(c) AS m FROM (
           SELECT count(*) AS c FROM customer
           GROUP BY c_nationkey, floor(c_acctbal / 5000))),
    l2 AS (SELECT min(c) AS m FROM (
           SELECT count(*) AS c FROM customer
           GROUP BY c_nationkey // 5, floor(c_acctbal / 5000))),
    lvl AS (SELECT CASE WHEN l0.m >= 25 THEN 0
                        WHEN l1.m >= 25 THEN 1
                        WHEN l2.m >= 25 THEN 2
                        ELSE 3 END AS lvl
            FROM l0, l1, l2)
    SELECT c_custkey AS key,
           CASE WHEN lvl <= 1 THEN CAST(c_nationkey AS VARCHAR)
                WHEN lvl = 2 THEN 'R' || CAST(c_nationkey // 5 AS VARCHAR)
                ELSE '*' END AS nation_g,
           CASE WHEN lvl = 0
                  THEN 'B' || CAST(CAST(floor(c_acctbal / 1000) AS BIGINT)
                                   AS VARCHAR)
                WHEN lvl IN (1, 2)
                  THEN 'B' || CAST(CAST(floor(c_acctbal / 5000) AS BIGINT)
                                   AS VARCHAR)
                ELSE '*' END AS bal_g,
           CAST(lvl AS BIGINT) AS level
    FROM customer, lvl
    """,
)
def privacy_generalize_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14g: k-anonymity by full-domain generalization (Samarati/Sweeney
    ladder) — coarsen quasi-identifiers (balance band width, nation →
    region → '*') up the ladder until min group size reaches k=25,
    instead of suppressing rows (`privacy_enforce_kanon`). The chosen
    level is data-dependent — finer at bigger scale factors — and both
    engines derive it from the same per-level min-group scalars, so the
    hash check proves the whole decision procedure, not one frozen
    level (operators/privacy.py::generalize_to_k)."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        generalize_to_k,
    )

    c = load_table(spark, sf_dir, "customer")
    nat = F.col("c_nationkey").cast("string")
    reg = F.concat(F.lit("R"), F.expr("CAST(c_nationkey div 5 AS STRING)"))
    b1000 = F.concat(
        F.lit("B"), F.floor(F.col("c_acctbal") / 1000).cast("long").cast("string")
    )
    b5000 = F.concat(
        F.lit("B"), F.floor(F.col("c_acctbal") / 5000).cast("long").cast("string")
    )
    star = F.lit("*")
    return generalize_to_k(
        c,
        "c_custkey",
        levels=[
            {"nation_g": nat, "bal_g": b1000},
            {"nation_g": nat, "bal_g": b5000},
            {"nation_g": reg, "bal_g": b5000},
            {"nation_g": star, "bal_g": star},
        ],
        k=25,
    )


@query(
    "privacy_reid_risk",
    oracle="""
    WITH g AS (
      SELECT count(*)::BIGINT AS k
      FROM customer
      GROUP BY c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT)
    )
    SELECT least(k, 21) AS k_bucket,
           count(*)::BIGINT AS n_groups,
           sum(k)::BIGINT AS n_records
    FROM g GROUP BY 1
    """,
)
def privacy_reid_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14g (r7): prosecutor re-identification risk profile over the
    `privacy_kanon` quasi-identifier tuple — the DISTRIBUTION the k=5
    audit thresholds: for each equivalence-class size k (capped at 21,
    the `graph_degree_dist` bounded-domain move), how many groups and
    records sit at that size. Prosecutor risk for a record in a size-k
    class is exactly 1/k (El Emam, public literature), so this table IS
    the risk histogram — k_bucket=1 rows are unique records (risk 1),
    and Σ n_records·(1/k) integrates to the expected re-identification
    count, derivable downstream from exact integers without this query
    ever emitting a float. One partial-combined hash agg to equivalence
    classes, then a second bounded agg over class sizes — the k
    distribution is ≤21 rows at any scale."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
    )
    g = c.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    return (
        g.select(
            F.least(F.col("k"), F.lit(21).cast("long")).alias("k_bucket"), "k"
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("k").cast("long").alias("n_records"),
        )
    )


@query(
    "privacy_class_size_dist",
    oracle="""
    WITH classes AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
             count(*)::BIGINT AS sz
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(length(bin(sz)) - 1 AS INTEGER) AS size_bin,
           CAST(2 ** (length(bin(sz)) - 1) AS BIGINT) AS bin_lo,
           count(*)::BIGINT AS n_classes,
           sum(sz)::BIGINT AS n_records,
           min(sz)::BIGINT AS min_size, max(sz)::BIGINT AS max_size,
           coalesce(sum(CASE WHEN sz < 5 THEN sz END), 0)::BIGINT
             AS n_records_below_k
    FROM classes GROUP BY 1, 2
    """,
)
def privacy_class_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14j (r8): log2-binned equivalence-class SIZE distribution over
    the k-anonymity quasi-identifier tuple — the how-far-from-k-anonymous
    curve: `privacy_kanon` lists the violating classes and
    `privacy_enforce_kanon` suppresses them, but the release decision
    (generalize further? suppress? accept the loss?) reads the whole
    size distribution — many size-1 classes mean generalization is
    needed, a few size-4 stragglers mean suppression is cheap. Per
    log2 bin: class count, record mass, min/max size, and the record
    mass below k=5 (the `graph_degree_dist` binary-length bin rule —
    exact integer binning, no float log).

    Scale: one partial-combined hash agg to classes (the `privacy_kanon`
    shape), then a ~32-row re-agg of class sizes."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        (F.floor(F.col("c_acctbal") / 1000) * 1000).cast("long").alias("bal_band"),
    )
    classes = c.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    bin_idx = (F.length(F.conv(F.col("sz"), 10, 2)) - 1).cast("int")
    return (
        classes.select("sz", bin_idx.alias("size_bin"))
        .groupBy("size_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("sz").cast("long").alias("n_records"),
            F.min("sz").cast("long").alias("min_size"),
            F.max("sz").cast("long").alias("max_size"),
            F.coalesce(F.sum(F.when(F.col("sz") < 5, F.col("sz"))), F.lit(0))
            .cast("long")
            .alias("n_records_below_k"),
        )
        .select(
            "size_bin",
            F.pow(F.lit(2.0), F.col("size_bin")).cast("long").alias("bin_lo"),
            "n_classes",
            "n_records",
            "min_size",
            "max_size",
            "n_records_below_k",
        )
    )


@query(
    "privacy_k_map",
    oracle="""
    WITH pop AS (
      SELECT c_nationkey::BIGINT AS nation, c_mktsegment AS segment,
             count(*)::BIGINT AS n_population
      FROM customer GROUP BY 1, 2
    ),
    sample AS (
      SELECT c_nationkey::BIGINT AS nation, c_mktsegment AS segment,
             count(*)::BIGINT AS n_sample
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      GROUP BY 1, 2
    )
    SELECT s.nation, s.segment, s.n_sample, p.n_population,
           p.n_population < 10 AS at_risk
    FROM sample s JOIN pop p USING (nation, segment)
    """,
)
def privacy_k_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14i (r8): k-map re-identification risk — `privacy_kanon` asks
    "how many records in the RELEASED data share my quasi-identifiers";
    k-map asks the question an attacker actually faces: "how many people
    in the POPULATION do" (Sweeney's k-map; the estimator behind
    HIPAA-style expert determination). Released sample = customers with
    at least one order (a semi join, the typical 'active users' export);
    population = the full customer registry. A QI class can easily be
    k-anonymous in the sample yet unique in the population or vice
    versa — this emits, per released class, the sample and population
    sizes and the at-risk verdict (population class < 10).

    Scale: two QI-keyed aggs (bounded |nations|x|segments| outputs) +
    one left-semi join on the population key before the sample agg;
    nothing joins fact rows to fact rows. The class-key join at the end
    is bounded-table x bounded-table."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pop = cust.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_population"))
    released = cust.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_semi",
    )
    sample = released.groupBy(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_sample"))
    return sample.join(pop, ["nation", "segment"]).select(
        "nation",
        "segment",
        "n_sample",
        "n_population",
        (F.col("n_population") < 10).alias("at_risk"),
    )


def _dp_nation_key_sql() -> str:
    """The length-prefixed single-column key encoding for c_nationkey,
    as `_dp_key_str` emits it (digits only, never NULL in the fixture,
    but the coalesce mirrors the engine expression exactly)."""
    return (
        "coalesce(len(c_nationkey::VARCHAR)::VARCHAR || ':' "
        "|| c_nationkey::VARCHAR, 'N')"
    )


def _dp_mean_noise_sql(stream: str, r: int) -> str:
    return (
        f"(bit_count(('0x' || substr(md5('dp-mean-1:{stream}:{r}:' || "
        f"{_dp_nation_key_sql()}), 1, 15))::BIGINT) - 30)"
    )


@query(
    "privacy_dp_mean",
    oracle=f"""
    WITH agg AS (
      SELECT c_nationkey,
             sum(least(greatest(CAST(round(c_acctbal * 100) AS BIGINT),
                                0), 500000))::BIGINT AS ts,
             count(*)::BIGINT AS tc
      FROM customer GROUP BY c_nationkey
    ),
    noised AS (
      SELECT c_nationkey,
             (ts + 500000 * ({_dp_mean_noise_sql("sum", 0)}
                             + {_dp_mean_noise_sql("sum", 1)}))::BIGINT
               AS noisy_sum_cents,
             (tc + {_dp_mean_noise_sql("cnt", 0)}
                 + {_dp_mean_noise_sql("cnt", 1)})::BIGINT AS noisy_count
      FROM agg
    )
    SELECT c_nationkey, noisy_sum_cents, noisy_count,
           ((10 * noisy_sum_cents) // noisy_count)::BIGINT AS mean_milli
    FROM noised WHERE noisy_count >= 10
    """,
)
def privacy_dp_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14l (r10): differentially private MEAN release — per nation the
    mean account balance, clamped to [0, $5000] (the clamp IS the
    sensitivity bound one record contributes to the sum) with two
    independently addressed binomial noise streams on the clamped sum
    (sensitivity-scaled) and the count, released as their exact integer
    quotient (operators/privacy.py::dp_noisy_mean). Counts alone
    (`privacy_dp_counts`) rarely satisfy an analyst; this is the
    standard clamp/noise-sum-and-count construction next to it, same
    content-addressed mechanism so the oracle replays the RELEASE, not
    just the true statistics. One hash agg (map-side combined); noise
    is row-local over the group key post-agg."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_noisy_mean,
    )

    c = load_table(spark, sf_dir, "customer")
    return dp_noisy_mean(
        c,
        ["c_nationkey"],
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"),
        clamp_cents=500_000,
        salt="dp-mean-1",
        repeats=2,
        threshold=10,
    )


# --- DP histogram + DP quantile (r11) ---------------------------------------

_DP_GRID_LO = -100_000
_DP_GRID_W = 50_000
_DP_GRID_N = 22  # covers acctbal cents in [-100000, 999999]


def _dp_bucket_noise_sql(salt: str, r: int) -> str:
    """The `_binomial_noise` replay for a bucket-id key under
    `_dp_key_str`'s length-prefixed encoding (bucket is never NULL in
    the released grid)."""
    key = "len(bucket::VARCHAR)::VARCHAR || ':' || bucket::VARCHAR"
    return (
        f"(bit_count(('0x' || substr(md5('{salt}:{r}:' || {key}), 1, 15))"
        f"::BIGINT) - 30)"
    )


_DP_GRID_SQL = f"""
    vals AS (
      SELECT ((least(greatest(CAST(round(c_acctbal * 100) AS BIGINT),
                              {_DP_GRID_LO}),
                     {_DP_GRID_LO + _DP_GRID_W * _DP_GRID_N - 1})
               - {_DP_GRID_LO}) // {_DP_GRID_W})::BIGINT AS bucket
      FROM customer
    ),
    cnt AS (SELECT bucket, count(*)::BIGINT AS c FROM vals GROUP BY bucket),
    grid AS (
      SELECT g::BIGINT AS bucket
      FROM UNNEST(generate_series(0, {_DP_GRID_N - 1})) AS t(g)
    ),
    fullgrid AS (
      SELECT grid.bucket, coalesce(cnt.c, 0)::BIGINT AS c
      FROM grid LEFT JOIN cnt USING (bucket)
    )"""


@query(
    "privacy_dp_histogram",
    oracle=f"""
    WITH {_DP_GRID_SQL.strip()}
    SELECT bucket,
           ({_DP_GRID_LO} + bucket * {_DP_GRID_W})::BIGINT AS bin_lo_cents,
           (c + {_dp_bucket_noise_sql("dp-hist-1", 0)}
              + {_dp_bucket_noise_sql("dp-hist-1", 1)})::BIGINT
             AS noisy_count
    FROM fullgrid
    """,
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14m (r11): differentially private HISTOGRAM release
    (operators/privacy.py::dp_histogram) — account balances clamped
    into a fixed 22x$500 grid, binomial noise per bucket, released over
    the FULL grid including empty buckets (emitting only observed
    buckets would leak emptiness — a presence disclosure no noise
    fixes). Sensitivity 1 (clamp -> one record, one bucket) and
    PARALLEL composition: the whole histogram costs one count-release
    budget. Same content-addressed mechanism as `privacy_dp_counts`,
    so the oracle replays the released values bit-for-bit. One
    bucket-keyed hash agg + a grid-sized join; 22 rows out."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_histogram,
    )

    c = load_table(spark, sf_dir, "customer")
    return dp_histogram(
        c,
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"),
        lo_cents=_DP_GRID_LO,
        width_cents=_DP_GRID_W,
        n_buckets=_DP_GRID_N,
        salt="dp-hist-1",
        repeats=2,
    )


def _dp_quantile_sel_sql(pct: int) -> str:
    return f"""(
      SELECT {pct}::BIGINT AS quantile_pct, bucket,
             ({_DP_GRID_LO} + bucket * {_DP_GRID_W})::BIGINT AS bin_lo_cents
      FROM (
        SELECT bucket,
               sum(w) OVER (ORDER BY bucket) AS cumw,
               sum(w) OVER () AS tw
        FROM (
          SELECT bucket,
                 (1::BIGINT << (greatest(
                    -abs(cum - (({pct} * n) // 100)), -60) + 60)::INT
                 )::HUGEINT AS w
          FROM cumgrid
        )
      )
      WHERE cumw > (('0x' || substr(md5('dp-q-1:{pct}'), 1, 15))::BIGINT % tw)
      ORDER BY bucket LIMIT 1
    )"""


@query(
    "privacy_dp_quantile",
    oracle=f"""
    WITH {_DP_GRID_SQL.strip()},
    cumgrid AS MATERIALIZED (
      SELECT bucket,
             sum(c) OVER (ORDER BY bucket)::BIGINT AS cum,
             sum(c) OVER ()::BIGINT AS n
      FROM fullgrid
    )
    SELECT * FROM {_dp_quantile_sel_sql(25)}
    UNION ALL SELECT * FROM {_dp_quantile_sel_sql(50)}
    UNION ALL SELECT * FROM {_dp_quantile_sel_sql(75)}
    """,
)
def privacy_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14n (r11): differentially private QUANTILES via the exponential
    mechanism (operators/privacy.py::dp_quantile) — quartiles of the
    clamped balance distribution over the `privacy_dp_histogram` grid,
    in the fully integer-decidable seeded form: utility
    -|cumcount - target| clamped at -60, base-2 weights 2^(u+60) as
    exact shiftleft integers, one content-addressed 60-bit draw per
    percentile, released bucket = inverse-CDF selection (first
    cumulative weight past the draw). Epsilon: base 2 = exp(eps*u/2)
    with eps = 2 ln 2; delta_u <= 2, so ~2.77 per released percentile,
    3 sequential releases. Every window runs on the 22-row grid; the
    only corpus-sized step is the bucket-count agg. The oracle replays
    utilities, HUGEINT weights, the md5 draw, and the selection."""
    from openmrs_patient_migration_script_spark.operators.privacy import (
        dp_quantile,
    )

    c = load_table(spark, sf_dir, "customer")
    return dp_quantile(
        c,
        F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"),
        lo_cents=_DP_GRID_LO,
        width_cents=_DP_GRID_W,
        n_buckets=_DP_GRID_N,
        salt="dp-q-1",
        quantile_pcts=(25, 50, 75),
    )
