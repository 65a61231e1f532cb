"""Feed observability — the data-quality family composed the way an
on-call runbook actually walks it, from cheap to expensive:

  1. is the feed ARRIVING?       -> per-user calendar gaps
                                    (events_coverage_gaps): silent days
                                    produce no rows, only a spine sees them
  2. is the content INTACT?      -> per-slice digests (dq_checksum):
                                    compare #slices rows source vs target,
                                    recurse only into disagreements
  3. are the keys SOUND?         -> composite-key audit (dq_pk_violations):
                                    duplicate tuples + NULL key parts
  4. are the values SANE?        -> season-aware anomalies
                                    (ts_anomaly_seasonal): normal-for-3am
                                    never alarms at 3am
  5. what is trending NOW?       -> per-window top-k (stream_trending_topk):
                                    the serving read over maintained counts

Every stage is a declared, oracle-checked query; this runbook only
demonstrates composition and the read-side triage order.

Run:  python examples/observability_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="observability-pipeline")

    print("== 1. arrival: calendar coverage gaps ==")
    gaps = eng.query("events_coverage_gaps")
    n_gaps = gaps.count()
    worst = (
        gaps.groupBy("user_id").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "user_id").limit(3).collect()
    )
    print(f"  silent user-days: {n_gaps}")
    for r in worst:
        print(f"    user {r.user_id}: {r.n} missing days")

    print("== 2. integrity: per-slice content digests ==")
    digests = eng.query("dq_checksum")
    print(f"  slices digested: {digests.count()} (compare against the target's)")

    print("== 3. keys: composite-key violations ==")
    pk = eng.query("dq_pk_violations")
    dup_tuples = pk.filter(F.col("l_orderkey").isNotNull()).count()
    print(f"  duplicate key tuples: {dup_tuples}")
    if dup_tuples:
        print("  NOTE: the source does NOT honor the assumed composite key —")
        print("  a migration keyed on it would silently merge rows")

    print("== 4. values: season-aware anomalies ==")
    anoms = eng.query("ts_anomaly_seasonal")
    n_anoms = anoms.count()
    print(f"  residual anomalies past 5 MADs: {n_anoms}")
    for r in anoms.orderBy(F.desc("deviation")).limit(3).collect():
        print(
            f"    user {r.user_id} event {r.event_id}: resid {r.resid:+.2f} "
            f"(threshold {r.threshold:.2f})"
        )

    print("== 5. now: trending event types per hour ==")
    trend = eng.query("stream_trending_topk")
    top_now = trend.orderBy(F.desc("window_start"), "rank").limit(3).collect()
    for r in top_now:
        print(f"    {r.window_start} #{r.rank}: {r.event_type} ({r.n_events})")

    print("observability: READY")


if __name__ == "__main__":
    main()
