"""Sequence-model feature engineering over the event log — the r4
time-series family composed end-to-end, the way a training pipeline
would actually chain them:

  1. monitor the feed          -> CUSUM drift alarms (ts_cusum): a mean
                                  shift upstream poisons every feature
                                  built below, so gate on it FIRST
  2. robust per-user level     -> time-weighted average (ts_twap): the
                                  sampling-rate-proof mean
  3. regularize the series     -> hourly grid, forward-fill for
                                  state-like reading (ts_resample) and
                                  linear ramp for flow-like (ts_interpolate)
  4. behavioral features       -> event-type entropy (events_entropy) +
                                  funnel pattern hits (events_pattern_match)
  5. assemble the feature row  -> one frame per user, ready for a model

Every stage is a declared, oracle-checked query; this runbook only
demonstrates composition and the read-side joins.

Run:  python examples/feature_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="feature-pipeline")

    print("== 1. feed drift monitor (CUSUM) ==")
    alarms = eng.query("ts_cusum").filter("alarm").count()
    total = eng.query("ts_cusum").count()
    print(f"  alarm rows: {alarms}/{total}")
    if alarms:
        print("  NOTE: sustained drift present — features downstream of the")
        print("  shift point would train on a different regime")

    print("== 2. per-user level (TWAP vs naive mean) ==")
    twap = eng.query("ts_twap")
    for r in twap.orderBy("user_id").limit(3).collect():
        print(f"  user {r.user_id}: twap={r.twap:.3f} over {r.n_segments} segments")

    print("== 3. regularized grids ==")
    ff = eng.query("ts_resample")
    li = eng.query("ts_interpolate")
    n_ff, n_li = ff.count(), li.count()
    observed = ff.filter("observed").count()
    print(f"  grid rows: {n_ff} (ffill) == {n_li} (interp); observed={observed}")
    assert n_ff == n_li, "both regularizers emit the same dense grid"

    print("== 4. behavioral features ==")
    ent = eng.query("events_entropy").select(
        "user_id", "entropy", "n_types"
    )
    pat = eng.query("events_pattern_match").select(
        F.col("key").alias("user_id"), "n_contig", "has_subseq"
    )
    features = (
        twap.select("user_id", "twap")
        .join(ent, "user_id")
        .join(pat, "user_id")
    )
    rows = features.orderBy("user_id").limit(5).collect()
    for r in rows:
        print(
            f"  user {r.user_id}: twap={r.twap:.2f} H={r.entropy:.3f} "
            f"types={r.n_types} vcp_runs={r.n_contig} funnel={r.has_subseq}"
        )

    print(f"feature rows -> {features.count()} users")
    print("features: READY")


if __name__ == "__main__":
    main()
