"""Pre-migration data-quality audit — the assessment pass a migration team
runs BEFORE the runbook (examples/migration_runbook.py), against the same
source tables, via the Engine facade.

Order mirrors real practice:

  1. profile the source        -> dq columns worth mapping, null landmines
  2. validate business rules   -> rows the precedence logic (R:13-15) would
                                  mishandle
  3. audit FK integrity        -> orphans that would break the fan-out writes
  4. hunt numeric outliers     -> MAD robust z (r4): survives the heavy
                                  tails that saturate a plain z-score
  5. plan the incremental load -> what a re-run would actually ship (R:17)

Run:  python examples/quality_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="quality-audit")

    print("== 1. source profile ==")
    for r in eng.query("dq_profile").collect():
        print(
            f"  {r.column_name:14s} nulls={r.null_count:<6d} "
            f"distinct={r.distinct_count:<7d} min={r.min_value} max={r.max_value}"
        )

    print("== 2. validation rules ==")
    dirty = 0
    for r in eng.query("dq_rules").collect():
        print(f"  {r.rule:20s} violations={r.violations}/{r.total_rows}")
        dirty += r.violations

    print("== 3. referential integrity ==")
    orphans = 0
    for r in eng.query("dq_referential").collect():
        print(f"  {r.relation:20s} orphans={r.orphan_rows}/{r.child_rows}")
        orphans += r.orphan_rows

    n_outliers = eng.query("dq_anomaly_mad").count()
    print(f"== 4. robust outliers: {n_outliers} events beyond 3 MAD z-units ==")

    n_incr = eng.query("etl_incremental_watermark").count()
    print(f"== 5. incremental plan: {n_incr} rows newer than the watermark ==")

    verdict = "CLEAN" if orphans == 0 else "DIRTY"
    print(f"audit: {verdict} (rule violations={dirty}, orphans={orphans})")


if __name__ == "__main__":
    main()
