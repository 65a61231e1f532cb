"""Declared ETL-composite queries (SURVEY.md §2.11) — the reference's actual
workload (patient registration, surrogate keys, attribute unpivot, client→
patient mapping; /root/reference/README.md:2,7-19) replayed on the harness
star schema per the FIXTURES.md §B mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.functions.ids import deterministic_uuid_sql
from openmrs_patient_migration_script_spark.operators.etl import (
    assign_surrogate_keys,
    max_id_offset,
    registration_build,
    unpivot_attributes,
)
from openmrs_patient_migration_script_spark.plans.registry import query
from openmrs_patient_migration_script_spark.sources import load_table

# The enrollment synthesis (operators/etl.py::synthesize_enrollment) as a SQL
# CTE, reused by several oracles below.
_ENROLLMENT_CTE = """
    e AS (
      SELECT c_custkey AS client_id,
             'Customer' AS given_name,
             regexp_extract(c_name, '#(\\d+)$', 1) AS family_name,
             CASE WHEN c_custkey % 2 = 0 THEN 'M' ELSE 'F' END AS gender,
             DATE '1970-01-01' + CAST(c_custkey % 18250 AS INT) AS birthdate,
             n_name AS county,
             c_mktsegment AS village,
             CASE WHEN c_custkey % 3 <> 0
                  THEN 'NAT-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS national_id,
             CASE WHEN c_custkey % 2 <> 0
                  THEN 'BC-' || lpad(CAST(c_custkey AS VARCHAR), 9, '0') END AS birth_cert_no,
             c_acctbal AS acctbal
      FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    )
"""


@query(
    "etl_registration",
    oracle=f"""
    WITH {_ENROLLMENT_CTE}
    SELECT client_id,
           upper(trim(given_name)) AS given_name,
           family_name, gender, birthdate, county, village,
           coalesce(national_id, birth_cert_no,
                    'GEN-' || lpad(CAST(client_id AS VARCHAR), 9, '0')) AS identifier,
           CASE WHEN national_id IS NOT NULL THEN 'NATIONAL_ID'
                WHEN birth_cert_no IS NOT NULL THEN 'BIRTH_CERTIFICATE'
                ELSE 'GENERATED' END AS identifier_type,
           {deterministic_uuid_sql("client_id", namespace="person")} AS person_uuid,
           {deterministic_uuid_sql("client_id", namespace="patient")} AS patient_uuid,
           0 AS voided, 1 AS preferred
    FROM e
    """,
)
def etl_registration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 flagship: the full patient-registration build — person core,
    address, identifier-with-precedence, deterministic UUIDs, audit flags
    (/root/reference/README.md:7-19). One broadcast join, zero shuffles."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    out = registration_build(customer, nation)
    # int literals: Spark lit(0) is INT; align to oracle's INTEGER
    return out.withColumn("voided", F.col("voided").cast("int")).withColumn(
        "preferred", F.col("preferred").cast("int")
    )


@query(
    "etl_surrogate_keys",
    oracle="""
    SELECT c_custkey AS client_id,
           (SELECT max(o_orderkey) FROM orders)
             + row_number() OVER (ORDER BY c_custkey) AS person_id
    FROM customer
    """,
)
def etl_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 (+A1): dense surrogate keys at scale — range partition +
    per-partition offsets instead of a single-partition global window
    (SURVEY §4). The offset is the scalar MAX over the destination table
    (`orders` plays the already-populated OpenMRS table), the reference's
    no-collision rule (/root/reference/README.md:15)."""
    c = load_table(spark, sf_dir, "customer")
    existing = load_table(spark, sf_dir, "orders")
    offset = max_id_offset(existing, "o_orderkey")
    keyed = assign_surrogate_keys(c, "c_custkey", id_col="person_id", offset=offset)
    return keyed.select(F.col("c_custkey").alias("client_id"), "person_id")


@query(
    "etl_unpivot",
    oracle="""
    WITH j AS (SELECT c_custkey, c_mktsegment, n_name
               FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey)
    SELECT c_custkey AS person_id, 'mktsegment' AS attribute_type,
           c_mktsegment AS value FROM j WHERE c_mktsegment IS NOT NULL
    UNION ALL
    SELECT c_custkey AS person_id, 'county' AS attribute_type,
           n_name AS value FROM j WHERE n_name IS NOT NULL
    """,
)
def etl_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: wide attributes → (person, attribute_type, value) rows — the
    person_attribute fan-out (README.md:11) via the `stack` generator."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left").select(
        "c_custkey", "c_mktsegment", "n_name"
    )
    return unpivot_attributes(
        j, "c_custkey", {"mktsegment": "c_mktsegment", "county": "n_name"}
    )


@query(
    "etl_mapping",
    oracle=f"""
    WITH keyed AS (
      SELECT c_custkey AS client_id,
             20000 + row_number() OVER (ORDER BY c_custkey) AS patient_id
      FROM customer
    )
    SELECT client_id, patient_id,
           {deterministic_uuid_sql("client_id", namespace="mapping")} AS uuid
    FROM keyed
    """,
)
def etl_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: client_id → patient_id mapping rows — the reference's
    dreams_client_patient_mapping sink (README.md:17).

    The mapping is a pure projection of the keyed registrations — no join:
    `operators/etl.py::build_mapping` exists for the general case (separate
    registration and key feeds), but re-joining a table to itself here would
    pay a full shuffle for an identity operation."""
    from openmrs_patient_migration_script_spark.functions.ids import deterministic_uuid

    c = load_table(spark, sf_dir, "customer")
    keyed = assign_surrogate_keys(c, "c_custkey", id_col="patient_id", offset=20000).select(
        F.col("c_custkey").alias("client_id"), "patient_id"
    )
    return keyed.withColumn("uuid", deterministic_uuid("client_id", namespace="mapping"))


@query(
    "dedup_exact",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact key dedup — keep the first row per key. Expressed as the
    scale-safe row_number()==1 form (dropDuplicates is the API sugar; this
    form controls WHICH duplicate survives)."""
    from openmrs_patient_migration_script_spark.operators.dedup import dedup_exact_keep_first

    d = load_table(spark, sf_dir, "documents")
    return dedup_exact_keep_first(d, ["lang", "source"], order_by="doc_id").select(
        "doc_id", "lang", "source"
    )


@query(
    "etl_scd2_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             lag(ts) OVER w AS pts,
             lag(event_type) OVER w AS ptype
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_type)
    ),
    kept AS (
      SELECT user_id, ts, event_type FROM ordered
      WHERE pts IS NULL OR event_type IS DISTINCT FROM ptype
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to,
           row_number() OVER w2 AS version
    FROM kept
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_type)
    """,
)
def etl_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5d: SCD2 dimension CONSTRUCTION from a change log
    (operators/etl.py::scd2_build) — the event stream treated as typed
    state changes per user: consecutive same-value changes collapse
    (no-op/heartbeat upserts mint no versions), survivors stitch into
    disjoint [valid_from, valid_to) intervals with a version ordinal and
    an open current version. Completes the SCD2 suite: `etl_scd2_delta`
    detects, this builds, `join_scd2_lookup` consumes. ONE
    key-partitioned Exchange — all window passes share the (key, ts)
    sort."""
    from openmrs_patient_migration_script_spark.operators.etl import scd2_build

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return scd2_build(e, "user_id", "ts", ["event_type"])


@query(
    "join_scd2_lookup",
    oracle="""
    WITH dim AS (
      SELECT c_custkey AS dim_key,
             CAST(DATE '2024-01-01' AS TIMESTAMP) AS valid_from,
             CAST(DATE '2024-01-01'
                  + ((c_custkey % 20)::INT + 5) * INTERVAL 1 DAY
                  AS TIMESTAMP) AS valid_to,
             c_mktsegment AS segment
      FROM customer
      UNION ALL
      SELECT c_custkey,
             CAST(DATE '2024-01-01'
                  + ((c_custkey % 20)::INT + 5) * INTERVAL 1 DAY
                  AS TIMESTAMP),
             NULL,
             c_mktsegment || '*'
      FROM customer
    )
    SELECT e.event_id, e.user_id, e.ts, d.segment
    FROM events e LEFT JOIN dim d
      ON e.user_id = d.dim_key
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    """,
)
def join_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5c: point-in-time SCD2 dimension lookup
    (operators/etl.py::scd2_lookup) — every event joins the dimension
    VERSION current at the event's own timestamp, so reprocessing
    history reproduces what the pipeline knew then (version 1 before
    each key's deterministic change date, the starred version 2 after).
    The business key keeps this an EQUI join (one key shuffle; zero
    when bucketed) with the validity interval as a residual predicate —
    never a range-join explosion, and SCD2's disjoint intervals mean at
    most one match per fact, no dedup pass."""
    from openmrs_patient_migration_script_spark.operators.etl import scd2_lookup

    c = load_table(spark, sf_dir, "customer")
    boundary = F.expr(
        "timestamp(date_add(date'2024-01-01', cast(c_custkey % 20 as int) + 5))"
    )
    dim = (
        c.select(
            F.col("c_custkey").alias("dim_key"),
            boundary.alias("_b"),
            "c_mktsegment",
        )
        .select(
            "dim_key",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("2024-01-01 00:00:00")
                        .cast("timestamp")
                        .alias("valid_from"),
                        F.col("_b").alias("valid_to"),
                        F.col("c_mktsegment").alias("segment"),
                    ),
                    F.struct(
                        F.col("_b").alias("valid_from"),
                        F.lit(None).cast("timestamp").alias("valid_to"),
                        F.concat(F.col("c_mktsegment"), F.lit("*")).alias(
                            "segment"
                        ),
                    ),
                )
            ).alias("v"),
        )
        .select("dim_key", "v.valid_from", "v.valid_to", "v.segment")
    )
    facts = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return scd2_lookup(facts, dim, "user_id", "ts", "dim_key").select(
        "event_id", "user_id", "ts", "segment"
    )


@query(
    "etl_scd2_delta",
    oracle="""
    WITH prev AS (
      SELECT c_custkey AS client_id,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS acctbal
      FROM customer WHERE c_custkey % 97 <> 0
    ),
    cur AS (SELECT c_custkey AS client_id, c_acctbal AS acctbal FROM customer)
    SELECT coalesce(cur.client_id, prev.client_id) AS client_id,
           CASE WHEN prev.client_id IS NULL THEN 'insert'
                WHEN cur.client_id IS NULL THEN 'close'
                ELSE 'update' END AS action,
           prev.acctbal AS old_value, cur.acctbal AS new_value
    FROM cur FULL OUTER JOIN prev ON cur.client_id = prev.client_id
    WHERE prev.client_id IS NULL OR cur.client_id IS NULL
       OR prev.acctbal <> cur.acctbal
    """,
)
def etl_scd2_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5b: slowly-changing-dimension change detection — the incremental
    form of the migration: a full outer join of current source vs the
    previously-loaded dimension emits exactly the rows that need action
    (insert new keys, close removed keys, version changed values);
    unchanged rows never leave the join. One co-partitioned shuffle on the
    business key; at 100 TB both sides would be bucketed on it so the join
    needs no exchange at all (tests/test_plan_quality.py proves that
    layout). The previous snapshot is synthesized deterministically
    (every 10th key's balance drifted, every 97th key absent)."""
    c = load_table(spark, sf_dir, "customer")
    prev = (
        c.filter(F.col("c_custkey") % 97 != 0)
        .select(
            F.col("c_custkey").alias("p_client_id"),
            F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0)
            .otherwise(F.col("c_acctbal"))
            .alias("old_value"),
        )
    )
    cur = c.select(
        F.col("c_custkey").alias("c_client_id"), F.col("c_acctbal").alias("new_value")
    )
    j = cur.join(prev, cur.c_client_id == prev.p_client_id, "full_outer")
    return (
        j.filter(
            F.col("p_client_id").isNull()
            | F.col("c_client_id").isNull()
            | (F.col("old_value") != F.col("new_value"))
        )
        .select(
            F.coalesce("c_client_id", "p_client_id").alias("client_id"),
            F.when(F.col("p_client_id").isNull(), F.lit("insert"))
            .when(F.col("c_client_id").isNull(), F.lit("close"))
            .otherwise(F.lit("update"))
            .alias("action"),
            "old_value",
            "new_value",
        )
    )


@query(
    "etl_merge_upsert",
    oracle="""
    WITH target AS (
      SELECT c_custkey AS client_id,
             CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END AS acctbal
      FROM customer WHERE c_custkey % 97 <> 0
    ),
    source AS (SELECT c_custkey AS client_id, c_acctbal AS acctbal FROM customer)
    SELECT coalesce(source.client_id, target.client_id) AS client_id,
           CASE WHEN source.client_id IS NOT NULL THEN source.acctbal
                ELSE target.acctbal END AS acctbal,
           CASE WHEN target.client_id IS NULL THEN 'inserted'
                WHEN source.client_id IS NULL THEN 'kept'
                WHEN source.acctbal IS DISTINCT FROM target.acctbal
                  THEN 'updated'
                ELSE 'unchanged' END AS merge_action
    FROM source FULL OUTER JOIN target ON source.client_id = target.client_id
    """,
)
def etl_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5c: MERGE INTO applied — upserts the current source over the
    previously-loaded dimension (the same synthesized snapshot as
    etl_scd2_delta: that query DETECTS the change set, this one APPLIES
    it) and keeps target-only keys. One co-partitioned full-outer shuffle
    (operators/etl.py::merge_upsert)."""
    from openmrs_patient_migration_script_spark.operators.etl import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 97 != 0).select(
        F.col("c_custkey").alias("client_id"),
        F.when(F.col("c_custkey") % 10 == 0, F.col("c_acctbal") + 100.0)
        .otherwise(F.col("c_acctbal"))
        .alias("acctbal"),
    )
    source = c.select(
        F.col("c_custkey").alias("client_id"), F.col("c_acctbal").alias("acctbal")
    )
    return merge_upsert(target, source, "client_id", ["acctbal"])


@query(
    "etl_cdc_apply",
    oracle="""
    WITH latest AS (
      SELECT o_custkey AS ck, op, new_bal FROM (
        SELECT o_custkey,
               CASE o_orderstatus WHEN 'O' THEN 'update'
                                  WHEN 'F' THEN 'insert'
                                  ELSE 'delete' END AS op,
               round(o_totalprice, 2) AS new_bal,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    )
    SELECT client_id, acctbal, cdc_action FROM (
      SELECT coalesce(c.c_custkey, l.ck) AS client_id,
             CASE WHEN l.op IS NULL OR l.op = 'delete'
                  THEN round(c.c_acctbal, 2) ELSE l.new_bal END AS acctbal,
             CASE WHEN l.op IS NULL THEN 'kept'
                  WHEN l.op = 'delete' THEN 'deleted'
                  WHEN c.c_custkey IS NULL THEN 'inserted'
                  ELSE 'updated' END AS cdc_action
      FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.ck
    ) WHERE cdc_action != 'deleted'
    """,
)
def etl_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14: full CDC apply — a change feed with INSERT/UPDATE/DELETE ops
    (synthesized from orders: each customer's LATEST order by
    (date, orderkey) maps status O/F/P to update/insert/delete of the
    account balance) applied over the customer dimension
    (operators/etl.py::apply_cdc). Last-change-wins is an arg-extrema
    REDUCTION (`max_by` on the sequence struct — no per-key window sort),
    the apply is one co-partitioned full-outer join, deletes drop rows,
    and idempotent-replay semantics resolve mislabeled ops by key
    presence. The delete/op surface `etl_merge_upsert` (upsert-only)
    does not cover."""
    from openmrs_patient_migration_script_spark.operators.etl import apply_cdc

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    target = c.select(
        F.col("c_custkey").alias("client_id"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    changes = o.select(
        F.col("o_custkey").alias("client_id"),
        F.when(F.col("o_orderstatus") == "O", "update")
        .when(F.col("o_orderstatus") == "F", "insert")
        .otherwise("delete")
        .alias("op"),
        F.round("o_totalprice", 2).alias("acctbal"),
        "o_orderdate",
        "o_orderkey",
    )
    out = apply_cdc(
        target,
        changes,
        key="client_id",
        seq_cols=["o_orderdate", "o_orderkey"],
        op_col="op",
        payload_cols=["acctbal"],
    )
    return out.select("client_id", "acctbal", "cdc_action")


@query(
    "etl_rollup_incremental",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           count(*)::BIGINT AS n,
           sum((2 * CAST(round(value * 1000000) AS BIGINT) + 10000)
               // 20000)::BIGINT AS sum_cents,
           sum((2 * CAST(round(value * 1000000) AS BIGINT) + 10000)
               // 20000)::DOUBLE / (100.0 * count(*)) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def etl_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance
    (operators/etl.py::rollup_partial + combine_rollups): the daily
    (day, event_type) rollup is built as TWO partials — history before
    Jan 16 (standing for the stored aggregate table) and the delta after
    it (today's increment) — then merged by groupBy-sum of the
    decomposable (n, exact scaled-cents sum) state. The oracle rescans
    ALL events in one pass, so the hash match PROVES incremental ==
    full-rescan — the invariant that lets a 100 TB pipeline maintain its
    rollups by scanning only the delta. avg derives at read time from
    merged state (one deterministic division of exact ints)."""
    from openmrs_patient_migration_script_spark.operators.etl import (
        combine_rollups,
        rollup_partial,
    )

    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    # day is DATE on BOTH engines (the r4 hash-fail: Spark date_trunc emits
    # TIMESTAMP while DuckDB's returns DATE), and cents derive from the
    # exact 6dp-scaled long by integer HALF_UP — round(value*100) rounds
    # the shortest-decimal repr on Spark but the binary double on DuckDB,
    # which splits on .5-cent boundaries. micro→cents is engine-identical.
    grp = [F.to_date(F.col("ts")).alias("day"), F.col("event_type")]
    cents = F.expr(
        "(2 * cast(round(value * 1000000) as long) + 10000) div 20000"
    )
    hist = rollup_partial(e.filter(F.col("ts") < cut), grp, cents)
    delta = rollup_partial(e.filter(F.col("ts") >= cut), grp, cents)
    merged = combine_rollups([hist, delta], ["day", "event_type"])
    return merged.select(
        "day", "event_type", "n", "sum_cents",
        (F.col("sum_cents").cast("double") / (F.lit(100.0) * F.col("n"))).alias("avg_value"),
    )


@query(
    "etl_bitemporal_lookup",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, o_totalprice
      FROM orders
    ),
    versions AS (
      SELECT o_orderkey, od AS valid_from, od AS tx_from,
             o_totalprice AS amount, 0 AS version FROM base
      UNION ALL
      SELECT o_orderkey, od, od + 30, o_totalprice + 1000.0, 1
      FROM base WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, od - 10, od + 60, o_totalprice - 500.0, 2
      FROM base WHERE o_orderkey % 5 = 0
    ),
    known AS (
      SELECT * FROM versions
      WHERE tx_from <= DATE '1996-07-31'
        AND valid_from <= DATE '1996-06-30'
    )
    SELECT o_orderkey, CAST(version AS BIGINT) AS version,
           valid_from, tx_from, amount
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY o_orderkey
               ORDER BY valid_from DESC, tx_from DESC, version DESC
             ) AS rn
      FROM known
    ) WHERE rn = 1
    """,
)
def etl_bitemporal_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E17: bitemporal point-in-time lookup — the two-axis extension of
    `join_scd2_lookup`: VALID time (when the fact was true in the world)
    × TRANSACTION time (when the system learned it). The migration-audit
    question it answers: "what did we believe on T about the state at
    V?" — late corrections (same validity, later tx) and retroactive
    backdated changes (earlier validity, later tx) both resolve without
    touching rows recorded after T, so a replayed audit is reproducible
    forever. Version history is synthesized deterministically from
    orders (every 3rd key restated 30 days later, every 5th backdated);
    the lookup is one row-local explode + row-local axis filters + ONE
    key-window argmax — the same single-Exchange shape as the SCD2
    lookup, amounts row-local doubles (no reassociation)."""
    o = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    base = o.select("o_orderkey", od.alias("od"), "o_totalprice")
    ver = F.array(
        F.struct(
            F.col("od").alias("valid_from"),
            F.col("od").alias("tx_from"),
            F.col("o_totalprice").alias("amount"),
            F.lit(0).alias("version"),
        ),
        F.when(
            F.col("o_orderkey") % 3 == 0,
            F.struct(
                F.col("od").alias("valid_from"),
                F.date_add("od", 30).alias("tx_from"),
                (F.col("o_totalprice") + 1000.0).alias("amount"),
                F.lit(1).alias("version"),
            ),
        ),
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.struct(
                F.date_add("od", -10).alias("valid_from"),
                F.date_add("od", 60).alias("tx_from"),
                (F.col("o_totalprice") - 500.0).alias("amount"),
                F.lit(2).alias("version"),
            ),
        ),
    )
    from pyspark.sql import Window

    known = (
        base.select(
            "o_orderkey",
            F.explode(F.filter(ver, lambda v: v.isNotNull())).alias("v"),
        )
        .select("o_orderkey", "v.*")
        .filter(
            (F.col("tx_from") <= F.lit("1996-07-31").cast("date"))
            & (F.col("valid_from") <= F.lit("1996-06-30").cast("date"))
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("valid_from").desc(), F.col("tx_from").desc(), F.col("version").desc()
    )
    return (
        known.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            F.col("version").cast("long").alias("version"),
            "valid_from",
            "tx_from",
            "amount",
        )
    )
