"""64x scaling probe for the steepest 16x-exponent shapes.

r6 run (VERDICT r5 task #5): triangle_count + fellegi_sunter, plus
planted-skew runs (hot linkage block, hub vertex) with AQE plan
inspection — that section is in SCALING.md history.

r9 run (VERDICT r8 task #2): the five shapes whose 16x fitted exponent
is >= ~0.8 — triangle_count (0.92), fellegi_sunter (0.89),
corr_matrix_onepass (0.85), profile_multi_distinct (0.81),
band_sweep_4cfg (0.79) — re-laddered to 64x to record whether the
exponent holds below 1.0 past the span the r8 fit used.

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
    _band_sweep_shape,
    _corrmatrix_shape,
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
    lineitem = load_table(spark, SF_DIR, "lineitem").localCheckpoint(eager=True)
    orders = load_table(spark, SF_DIR, "orders").localCheckpoint(eager=True)
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)

    from openmrs_patient_migration_script_spark.operators.quality import (
        profile_columns,
    )

    results: dict[str, dict[int, float]] = {}
    for k in FACTORS:
        c_k = replicate(customer, ["c_custkey"], k, KEY_SHIFT)
        li_k = replicate(lineitem, ["l_orderkey"], k, KEY_SHIFT)
        o_k = replicate(orders, ["o_orderkey", "o_custkey"], k, KEY_SHIFT)
        if k > 1:
            c_k = c_k.localCheckpoint(eager=True)
            li_k = li_k.localCheckpoint(eager=True)
            o_k = o_k.localCheckpoint(eager=True)
        for name, thunk in {
            "fellegi_sunter": lambda: _linkage_shape(c_k),
            "triangle_count": lambda: _triangles(c_k),
            "corr_matrix_onepass": lambda: _corrmatrix_shape(li_k),
            "profile_multi_distinct": lambda: profile_columns(
                o_k, ["o_custkey", "o_orderstatus", "o_totalprice"]
            ),
            "band_sweep_4cfg": lambda: _band_sweep_shape(docs, k),
        }.items():
            results.setdefault(name, {})[k] = timed(thunk)
            print(f"k={k:2d} {name}: {results[name][k]:.2f}s", flush=True)
        # release this factor's checkpoint blocks BEFORE building the
        # next (4x bigger) set: the four replicated tables at 64x would
        # otherwise share the unified pool with 1-16x leftovers and
        # starve execution memory (observed: UNABLE_TO_ACQUIRE_MEMORY at
        # 64x with the cumulative blocks resident). GC lets the
        # ContextCleaner drop the orphaned checkpoint RDDs.
        import gc

        del c_k, li_k, o_k
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    span = math.log(FACTORS[-1] / FACTORS[0])
    lines = [
        "",
        "## 64x probe (tools/scale_probe_64x.py — r9 rerun)",
        "",
        "The five steepest 16x-exponent shapes (r8 fits 0.79-0.92)",
        "re-laddered to 64x, alone on an idle box, at the r9 tree.",
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
    lines.append("")
    with open(Path(__file__).resolve().parent.parent / "SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALING.md", flush=True)


if __name__ == "__main__":
    main()
