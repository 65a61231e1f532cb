"""Scheduled-job-count profile of the headline bench queries — the
deterministic signal the r11 round used when wall-clock was window-noisy:
for each query, run the noop sink once (after one warmup execution of the
first query) and record how many Spark jobs the action scheduled via
statusTracker job-id deltas. Writes JSON {query: n_jobs} plus wall seconds.

Usage:
  python tools/job_profile.py [out.json] [query ...]   # default: all headline
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402
from openmrs_patient_migration_script_spark.plans import QUERIES  # noqa: E402
from openmrs_patient_migration_script_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/job_profile.json"
    names = sys.argv[2:] or [n for n in HEADLINE if n in QUERIES]
    spark = get_spark("job_profile")
    sc = spark.sparkContext
    # warmup (JVM/codegen; not recorded)
    QUERIES[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    prof: dict[str, dict] = {}
    for n in names:
        ids0 = set(sc.statusTracker().getJobIdsForGroup(None))
        before = max(ids0) if ids0 else -1
        t0 = time.time()
        sc.setJobDescription(f"profile:{n}")
        QUERIES[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        sc.setJobDescription(None)
        wall = time.time() - t0
        ids1 = set(sc.statusTracker().getJobIdsForGroup(None))
        n_jobs = len([i for i in ids1 if i > before])
        prof[n] = {"jobs": n_jobs, "wall": round(wall, 3)}
        print(f"{n}: {n_jobs} jobs, {wall:.2f}s", flush=True)
    total_jobs = sum(v["jobs"] for v in prof.values())
    total_wall = round(sum(v["wall"] for v in prof.values()), 3)
    Path(out_path).write_text(
        json.dumps(
            {"total_jobs": total_jobs, "total_wall": total_wall, "queries": prof},
            indent=1,
        )
        + "\n"
    )
    print(f"TOTAL: {total_jobs} jobs, {total_wall}s -> {out_path}")


if __name__ == "__main__":
    main()
