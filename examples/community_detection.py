"""Community detection, end to end — the three X9 community operators
composed on one graph, showing WHY the r11 Louvain exists next to LPA:

    fuzzy candidate pairs → label_propagation (fast, no objective)
                          → louvain (modularity-OPTIMIZING, guarded)
                          → modularity (the exact audit BOTH are scored by)

LPA labels a graph by neighborhood majority — quick and shuffle-light,
but nothing says its partition is GOOD. Louvain moves nodes by the exact
integer modularity gain and contracts, with every pass gated on the
exact Q numerator (rejected passes revert), so its ledger is a
monotonically non-decreasing audit trail. The `modularity` operator
prices both partitions in the same exact-fraction currency.

Run:  python examples/community_detection.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.graph import (
    label_propagation,
    louvain,
    modularity,
)
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


def _q(edges, labels) -> float:
    """Exact Q = sum(q_num) / q_den from the integer decomposition."""
    row = (
        modularity(edges, labels, src="key_a", dst="key_b")
        .agg(
            F.sum(F.col("q_num").cast("decimal(38,0)")).alias("n"),
            F.max("q_den").alias("d"),
        )
        .collect()[0]
    )
    return float(row["n"]) / float(row["d"]) if row["d"] else 0.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("community-detection")

    # the planted clique-block graph (the graph_louvain fixture): every
    # same-block customer-key pair is an edge, consecutive blocks share
    # one bridge — the dense near-clique shape of dedup-candidate graphs
    c = load_table(spark, sf_dir, "customer").select(
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
    edges = clique.unionByName(bridge).localCheckpoint(eager=True)
    n_edges = edges.count()

    lpa = label_propagation(edges, n_iter=3).select(
        "node", "community"
    ).localCheckpoint(eager=True)
    q_lpa = _q(edges, lpa)
    n_lpa = lpa.select("community").distinct().count()

    louv, ledger = louvain(edges, n_passes=3, return_ledger=True)
    louv = louv.localCheckpoint(eager=True)
    q_louv = _q(edges, louv)
    n_louv = louv.select("community").distinct().count()

    print(f"graph: {n_edges} edges over {lpa.count()} nodes "
          f"(planted blocks of 10)")
    print(f"LPA (3 sync rounds):     {n_lpa:4d} communities, Q = {q_lpa:.4f}")
    print(f"Louvain (3 passes):      {n_louv:4d} communities, Q = {q_louv:.4f}")
    print("Louvain guard ledger (q_num over constant q_den = 4m^2):")
    for p, qnum, acc in ledger:
        print(f"  pass {p}: q_num_sum = {qnum:>14d}  "
              f"{'accepted' if acc else 'REVERTED'}")
    qs = [q for _, q, a in ledger if a]
    assert qs == sorted(qs), "guard guarantees non-decreasing Q"
    assert q_louv >= q_lpa - 1e-12, (
        "on the planted block graph the optimizer should not lose to "
        "the majority heuristic"
    )
    print("community detection: DONE (Louvain >= LPA on Q, ledger monotone)")
    spark.stop()


if __name__ == "__main__":
    main()
