"""64x scaling probe for the r11-touched graph family (r12 run, VERDICT
r11 task #5): the r11 optimization round cut these shapes' shuffle-write
bytes 2.6-5.4x via broadcast gates + removed driver actions, but sf0.1
wall is scheduler-bound (8 cores beats 32), so the byte cuts could not
be read off local wall. This ladders

- graph_louvain's guarded passes (the planted clique-block fixture),
- graph_truss_decomposition's chained support peels (post r12 oriented
  materialization),
- graph_edge_support (one support pass, zero-restore),
- graph_sssp / graph_pagerank / graph_bfs's per-round loops,

at [1, 4, 16, 64]x of the sf0.1 declared fixtures (edges replicated
key-shifted so every replica replays the same rounds; seeds re-derived
as key % 97 = 0 over the replicated universe, preserving seed density).
The broadcast gates stay ON their defaults: the probe records where the
5M-row / 128 MiB byte gate flips each shape to its shuffle fallback.

Run ALONE on an idle box. Appends a `## r12 64x probe` section to
SCALING.md.

Usage: python tools/scale_probe_r12.py [max_factor]
"""

from __future__ import annotations

import gc
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openmrs_patient_migration_script_spark.session import get_spark  # noqa: E402
from openmrs_patient_migration_script_spark.sources import load_table  # noqa: E402
from tools.scale_probe import KEY_SHIFT, replicate, timed  # noqa: E402
from tools.scale_probe_r11 import _truss_edges  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _fuzzy_edges(spark):
    """The declared fuzzy-pair graph every loop query rides (blocked
    levenshtein self-join), built once and checkpointed."""
    from openmrs_patient_migration_script_spark.plans.dedup_queries import (
        dedup_fuzzy,
    )

    return dedup_fuzzy(spark, SF_DIR)


def _louvain_edges(spark):
    """graph_louvain's planted clique-block + bridge fixture."""
    c = load_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("k")
    )
    c2 = c.select(F.col("k").alias("k2"))
    clique = c.join(
        c2,
        (F.col("k2") > F.col("k"))
        & (F.expr("k div 10") == F.expr("k2 div 10")),
    ).select(F.col("k").alias("key_a"), F.col("k2").alias("key_b"))
    bridge = c.join(
        c2,
        (F.col("k2") == F.col("k") + 1)
        & (F.expr("k div 10") != F.expr("k2 div 10")),
    ).select(F.col("k").alias("key_a"), F.col("k2").alias("key_b"))
    return clique.unionByName(bridge)


def _seeds(edges_k):
    return edges_k.select(F.col("key_a").alias("node")).filter(
        F.col("node") % 97 == 0
    ).distinct()


def main() -> None:
    from openmrs_patient_migration_script_spark.operators.graph import (
        bfs_hops,
        edge_support,
        louvain,
        pagerank,
        sssp_bounded,
        truss_decomposition,
    )

    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    factors = [k for k in (1, 4, 16, 64) if k <= max_factor]
    spark = get_spark("scale-probe-r12")
    fuzzy = _fuzzy_edges(spark).localCheckpoint(eager=True)
    truss_e = _truss_edges(spark).localCheckpoint(eager=True)
    louv_e = _louvain_edges(spark).localCheckpoint(eager=True)

    results: dict[str, dict[int, float]] = {}
    for k in factors:
        reps = {
            "fuzzy": replicate(fuzzy, ["key_a", "key_b"], k, KEY_SHIFT * 100),
            "truss": replicate(truss_e, ["key_a", "key_b"], k, KEY_SHIFT * 100),
            "louv": replicate(louv_e, ["key_a", "key_b"], k, KEY_SHIFT * 100),
        }
        if k > 1:
            reps = {n: d.localCheckpoint(eager=True) for n, d in reps.items()}
        f_k, t_k, l_k = reps["fuzzy"], reps["truss"], reps["louv"]
        w_k = f_k.select(
            "key_a",
            "key_b",
            (1 + (F.col("key_a") + F.col("key_b")) % 7).cast("long").alias("w"),
        )
        shapes = {
            "louvain": lambda: louvain(l_k, n_passes=3),
            "truss_decomposition": lambda: truss_decomposition(
                t_k, max_k=5, n_rounds=3
            ),
            "edge_support": lambda: edge_support(t_k),
            "sssp_bounded": lambda: sssp_bounded(w_k, _seeds(f_k), max_hops=3),
            "pagerank": lambda: pagerank(f_k),
            "bfs_hops": lambda: bfs_hops(f_k, _seeds(f_k), max_hops=3),
        }
        for name, thunk in shapes.items():
            try:
                results.setdefault(name, {})[k] = min(
                    timed(thunk) for _ in range(2)
                )
                print(f"k={k:2d} {name}: {results[name][k]:.2f}s", flush=True)
            except Exception as exc:  # noqa: BLE001 — ladder survives a cell
                print(f"k={k:2d} {name}: FAILED ({exc})", flush=True)
        del reps, f_k, t_k, l_k, w_k
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    span = math.log(factors[-1] / factors[0]) if len(factors) > 1 else 1.0
    lines = [
        "",
        f"## r12 {factors[-1]}x probe (tools/scale_probe_r12.py)",
        "",
        "The six r11-touched graph shapes (broadcast gates + removed",
        "driver actions) laddered on key-shifted replicas of their",
        "declared sf0.1 fixtures, alone on an idle box at the r12 tree,",
        "min-of-2 per cell. Gates stay on defaults, so the ladder also",
        "records where each shape crosses its broadcast gate into the",
        "shuffle fallback.",
        "",
        "| shape | " + " | ".join(f"{k}x sec" for k in factors)
        + " | exp (span) |",
        "|---|" + "---|" * (len(factors) + 1),
    ]
    for name, ts in results.items():
        cells = " | ".join(
            f"{ts[k]:.2f}" if k in ts else "FAILED" for k in factors
        )
        if factors[0] in ts and factors[-1] in ts and span:
            exp = f"{math.log(ts[factors[-1]] / ts[factors[0]]) / span:.2f}"
        else:
            exp = "n/a"
        lines.append("| " + name + " | " + cells + f" | {exp} |")
    lines.append("")
    with open(Path(__file__).resolve().parent.parent / "SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALING.md", flush=True)


if __name__ == "__main__":
    main()
