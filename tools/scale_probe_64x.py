"""64x scaling probe for the two ~linear shapes (VERDICT r5 task #5):
triangle_count (exp 0.97 over 16x) and fellegi_sunter (0.90) — confirm
the exponent holds past 16x, and probe both under PLANTED skew (a hot
block key in linkage, a hub vertex in triangles), recording the final
AQE-replanned physical plan's skew markers and the salted-block lever's
effect.

Run ALONE on an idle box (concurrent Spark jobs contaminate timings —
see the probe-hygiene rule). Appends a `## 64x probe` section to
SCALING.md.

Usage: python tools/scale_probe_64x.py
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openmrs_patient_migration_script_spark.session import get_spark  # noqa: E402
from openmrs_patient_migration_script_spark.sources import load_table  # noqa: E402
from tools.scale_probe import (  # noqa: E402
    KEY_SHIFT,
    _fuzzy_edges,
    _linkage_shape,
    replicate,
    timed,
)

SF_DIR = "/root/testdata/sf0.1"
FACTORS = [1, 4, 16, 64]
HOT = 3000  # planted hot-block / hub size


def _triangles(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        triangle_count,
    )

    return triangle_count(_fuzzy_edges(c_k))


def _triangles_hub(c_k):
    """Fuzzy-pair graph PLUS a degree-HOT hub (vertex 0 linked to HOT
    distinct vertices — a boilerplate record matching everything, the
    worst-case wedge shape). Degree orientation must keep the hub's
    out-neighborhood arboricity-bounded."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        triangle_count,
    )

    spokes = c_k.sparkSession.range(1, HOT + 1).select(
        F.lit(0).cast("long").alias("key_a"),
        (F.col("id") * 7 + 3).alias("key_b"),
    )
    base = _fuzzy_edges(c_k).select("key_a", "key_b")
    return triangle_count(base.unionByName(spokes))


def _skewed_linkage(c_k, salt_blocks: int = 1):
    """Linkage with a planted hot block: ~2% of records forced into ONE
    block key (the classic empty-postcode block) -> B² comparator pairs
    on a single shuffle key."""
    from openmrs_patient_migration_script_spark.operators.dedup import (
        fellegi_sunter_pairs,
    )

    name = F.translate(
        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
        "0123456789",
        "abcdefghij",
    )
    a = c_k.select(
        F.col("c_custkey").alias("rid"), name.alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_custkey") % 100 < 2, F.lit("HOTBLOCK"))
        .otherwise(F.substring(name, 1, 10))
        .alias("blk"),
    )
    b = a.withColumn("rid", F.col("rid") + 100 * KEY_SHIFT)
    return fellegi_sunter_pairs(
        a, b, "rid", ["blk"],
        fields=[
            {"col": "name", "w_match": 4000, "w_miss": -1500, "close": (1, 2500)},
            {"col": "nation", "w_match": 1200, "w_miss": -800},
            {"col": "segment", "w_match": 700, "w_miss": -600},
        ],
        salt_blocks=salt_blocks,
    )


def _run_with_plan(df) -> tuple[float, str]:
    """Execute via count (so THIS Dataset's QueryExecution is the one
    AQE finalizes), return (wall seconds, skew-marker summary of the
    final physical plan)."""
    t0 = time.time()
    n = df.count()
    dt = time.time() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = sorted(
        {
            tok
            for ln in plan.splitlines()
            for tok in ("skew=true", "REBALANCE", "CustomShuffleReader")
            if tok.lower() in ln.lower()
        }
    )
    ev = ", ".join(hits) if hits else "no skew markers"
    return dt, f"{ev} (rows={n})"


def main() -> None:
    spark = get_spark("scale-probe-64x")
    customer = load_table(spark, SF_DIR, "customer").localCheckpoint(eager=True)

    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        c_k = replicate(customer, ["c_custkey"], k, KEY_SHIFT)
        if k > 1:
            c_k = c_k.localCheckpoint(eager=True)
        for name, thunk in {
            "fellegi_sunter": lambda: _linkage_shape(c_k),
            "triangle_count": lambda: _triangles(c_k),
        }.items():
            results.setdefault(name, {})[k] = timed(thunk)
            print(f"k={k:2d} {name}: {results[name][k]:.2f}s", flush=True)

    c16 = replicate(customer, ["c_custkey"], 16, KEY_SHIFT).localCheckpoint(
        eager=True
    )
    link_plain_t, link_plain_ev = _run_with_plan(_skewed_linkage(c16))
    print(f"skewed linkage 16x plain: {link_plain_t:.2f}s | {link_plain_ev}",
          flush=True)
    link_salt_t, link_salt_ev = _run_with_plan(
        _skewed_linkage(c16, salt_blocks=16)
    )
    print(f"skewed linkage 16x salt16: {link_salt_t:.2f}s | {link_salt_ev}",
          flush=True)
    tri_hub_t, tri_hub_ev = _run_with_plan(_triangles_hub(c16))
    print(f"hub triangles 16x: {tri_hub_t:.2f}s | {tri_hub_ev}", flush=True)

    span = math.log(FACTORS[-1] / FACTORS[0])
    lines = [
        "",
        "## 64x probe (tools/scale_probe_64x.py — r6)",
        "",
        "The two ~linear shapes re-probed past 16x, alone on an idle box,",
        "plus planted-skew runs at 16x (final AQE-replanned plan inspected",
        "for skew markers; linkage also with the salt_blocks lever).",
        "",
        "| shape | " + " | ".join(f"{k}x sec" for k in FACTORS)
        + " | exp (64x span) |",
        "|---|" + "---|" * (len(FACTORS) + 1),
    ]
    for name, ts in results.items():
        exp = math.log(ts[FACTORS[-1]] / ts[FACTORS[0]]) / span
        lines.append(
            "| " + name + " | "
            + " | ".join(f"{ts[k]:.2f}" for k in FACTORS)
            + f" | {exp:.2f} |"
        )
    lines += [
        "",
        f"Planted skew at 16x — linkage hot block ({HOT}+-record block):",
        f"plain {link_plain_t:.2f}s ({link_plain_ev}); salt_blocks=16",
        f"{link_salt_t:.2f}s ({link_salt_ev}). Triangles + degree-{HOT}",
        f"hub: {tri_hub_t:.2f}s ({tri_hub_ev}).",
        "",
    ]
    with open(Path(__file__).resolve().parent.parent / "SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALING.md", flush=True)


if __name__ == "__main__":
    main()
