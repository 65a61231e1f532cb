"""Iterative graph operators — connected components for dedup clustering.

Near-dup pipelines emit PAIRS (fuzzy/minhash/jaccard candidates); merging
pairs into duplicate CLUSTERS is a connected-components problem. This is
the engine's iterative-algorithm surface: a driver-side convergence loop
over DataFrame ops, with the two patterns iterative Spark lives or dies by:

- **lineage truncation**: each iteration localCheckpoints its result —
  without it the plan doubles every iteration and the job dies on
  analysis/stack depth long before it dies on data;
- **convergence by aggregate**: the loop exits on a changed-row count,
  one tiny action per iteration.

Min-label propagation converges in O(graph diameter) iterations — fine
for dedup graphs (dense little clusters, tiny diameter). For web-scale
graphs with long chains, the Small-Star/Large-Star alternating algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") halves
the rounds; same DataFrame skeleton, different message rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "key_a",
    dst: str = "key_b",
    max_iter: int = 25,
) -> DataFrame:
    """Cluster id (= min member key) per node of the undirected pair graph.

    Returns (node, cluster) for every node that appears in an edge.
    Each iteration: one shuffle join (neighbor labels) + one aggregation
    (min per node); work per round is O(|E|), rounds = graph diameter.
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.unionByName(
        sym.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node"])
            .select(F.col("b").alias("node"), "cluster")
            .groupBy("node")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        # carry the old label through the update so the convergence count
        # is a filter on the checkpointed result, not another shuffle join
        upd = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("cluster").alias("old_cluster"),
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        changed = upd.filter(F.col("cluster") != F.col("old_cluster")).count()
        labels = upd.select("node", "cluster")
        if changed == 0:
            break
    return labels
