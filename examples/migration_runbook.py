"""End-to-end migration runbook — the reference script's full workflow
(/root/reference/README.md:2-19) re-expressed on this engine, runnable
against the harness parquet fixtures.

The reference's flow, step by step, with the operator that replaces it:

  reference behavior (README.md line)     engine operator
  -----------------------------------     -----------------------------------
  connect to source/dest MySQL (R:5)      sources/jdbc.py (Derby-tested) or
                                          parquet loaders (here)
  read legacy enrollment rows (R:5)       synthesize_enrollment / load_table
  person+name+address+attrs (R:9-11)      registration_build (E1)
  National ID / Birth Cert /              identifier_with_fallback (P3)
    generated fallback (R:13-15)
  new non-colliding patient ids (R:15)    max_id_offset + assign_surrogate_keys
  skip already-migrated (re-run) (R:17)   idempotent_new_rows (J5 anti-join)
  client_id -> patient_id mapping (R:17)  build_mapping (E4)
  dynamic uuids everywhere (R:19)         deterministic_uuid (F4)
  insert into ~6 OpenMRS tables (R:7)     fan_out_registration + write_multi_sink

Run:  python examples/migration_runbook.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmrs_patient_migration_script_spark.operators.etl import (
    assign_surrogate_keys,
    build_mapping,
    idempotent_new_rows,
    max_id_offset,
    registration_build,
    write_multi_sink,
)
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="migration_")
    spark = get_spark("migration-runbook")

    # 1. source scan (the legacy enrollment table; parquet stands in for
    #    the JDBC read — swap load_table for read_jdbc_partitioned in a
    #    MySQL deployment)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # 2. destination state: existing ids (so new ids never collide) and
    #    already-migrated keys (so re-runs insert zero duplicates)
    existing = load_table(spark, sf_dir, "orders")
    offset = max_id_offset(existing, "o_orderkey")
    print(f"max existing id -> surrogate offset {offset}")

    # 3. full registration build: rename/normalize, identifier fallback,
    #    deterministic uuids
    reg = registration_build(customer, nation)

    # 4. idempotency: drop rows whose client_id is already migrated
    already = reg.limit(0)  # first run: nothing migrated yet
    fresh = idempotent_new_rows(reg, already, "client_id")

    # 5. dense non-colliding patient ids
    keyed = assign_surrogate_keys(fresh, "client_id", id_col="patient_id", offset=offset)

    # 6. client_id -> patient_id mapping (the dreams_client_patient_mapping
    #    sink) and the multi-table fan-out
    mapping = build_mapping(fresh, keyed)
    paths = write_multi_sink(keyed, out_dir)

    n = mapping.count()
    print(f"migrated {n} clients; sinks written under {out_dir}:")
    for table, path in sorted(paths.items()):
        print(f"  {table}: {path}")


if __name__ == "__main__":
    main()
