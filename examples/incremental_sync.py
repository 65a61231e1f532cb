"""Steady-state incremental sync — what the reference's one-shot script
(`python migrate_patients.py`, /root/reference/README.md:52) becomes once
the first full migration has landed and the job runs DAILY:

  1. watermark extract      -> only rows newer than the loaded high-water
                               mark leave the source (R:17 idempotence)
  2. change detection       -> SCD2 delta: inserts / closes / updates vs
                               the previously-loaded dimension
  3. change application     -> full CDC apply: last change per key wins,
                               deletes drop rows, replays are no-ops
  4. duplicate containment  -> fuzzy match -> connected components ->
                               golden-record survivorship (one master row
                               per duplicate cluster)

Each step is a declared, oracle-checked query — this runbook only
sequences them through the Engine facade.

Run:  python examples/incremental_sync.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="incremental-sync")

    n_new = eng.query("etl_incremental_watermark").count()
    print(f"== 1. watermark extract: {n_new} rows newer than the loaded mark ==")

    print("== 2. change detection (SCD2 delta) ==")
    for r in (
        eng.query("etl_scd2_delta")
        .groupBy("action")
        .count()
        .orderBy("action")
        .collect()
    ):
        print(f"  {r.action:10s} {r['count']}")

    print("== 3. change application (CDC apply) ==")
    applied = eng.query("etl_cdc_apply")
    for r in (
        applied.groupBy("cdc_action").count().orderBy("cdc_action").collect()
    ):
        print(f"  {r.cdc_action:10s} {r['count']}")
    print(f"  surviving rows: {applied.count()}")

    print("== 4. duplicate containment (golden records) ==")
    golden = eng.query("etl_golden_record").collect()
    merged_away = sum(r.n_members - 1 for r in golden)
    print(
        f"  {len(golden)} duplicate clusters -> {len(golden)} survivors "
        f"({merged_away} rows superseded)"
    )
    print("sync: DONE")


if __name__ == "__main__":
    main()
