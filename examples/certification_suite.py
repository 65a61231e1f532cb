"""The round-6 certification suite — every approximate, heuristic, or
pruned path in the engine paired with its EXACT auditable number, run as
one report. This is the operational answer to "can I trust the fast
path at 100 TB": each row is an exact metric a regulator (or an SRE at
3am) can recompute from first principles, and each is hash-checked
against an independent DuckDB replay in the correctness gate.

  ANN recall@k        - what the LSH / PQ / IVF index LOSES vs the
                        exact brute-force top-k (sim_*_recall)
  blocking quality    - reduction ratio + pairs-completeness of the
                        fuzzy-dedup blocking scheme (dq_blocking_quality)
  community fit       - exact Newman-Girvan modularity of the label-
                        propagation communities (graph_modularity)
  drift tripwires     - binned two-sample KS vs PSI on the same grid,
                        the Zipf head slope of the corpus
  mix dependence      - per-cell mutual information lang x source
  sketch error        - HLL profile distincts within band of exact
                        (dq_profile_hll_audit); production theta/KLL
                        estimates inside their error brackets
                        (sketch_error_audit)
  minhash fidelity    - estimated vs true Jaccard per LSH candidate
                        pair (dedup_minhash_quality)
  pipeline funnel     - stage-by-stage document counts through the
                        corpus-prep chain (corpus_dedup_funnel)

Run:  python examples/certification_suite.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.plans import QUERIES
from openmrs_patient_migration_script_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("certification-suite")

    for name, path in (
        ("sim_ann_recall", "LSH"),
        ("sim_pq_recall", "PQ"),
        ("sim_ivf_recall", "IVF"),
    ):
        r = (
            QUERIES[name](spark, sf_dir)
            .agg(
                (F.sum("n_hits") / F.sum("n_exact")).alias("recall"),
                F.count(F.lit(1)).alias("queries"),
            )
            .collect()[0]
        )
        print(f"ann recall@k [{path:3s}]: {r['recall']:.3f} over {r['queries']} queries")

    bq = QUERIES["dq_blocking_quality"](spark, sf_dir).collect()[0]
    cols = set(bq.asDict())
    rr = next(c for c in cols if "reduction" in c)
    pc = next(c for c in cols if "complete" in c)
    print(f"blocking: reduction={bq[rr]} pairs_completeness={bq[pc]}")

    mod = QUERIES["graph_modularity"](spark, sf_dir)
    # q_num/q_den are exact DECIMAL(38,0); Q = sum(q_num) / q_den
    mrow = mod.agg(
        F.sum("q_num").alias("num"), F.max("q_den").alias("den")
    ).collect()[0]
    q = round(float(mrow["num"]) / float(mrow["den"]), 4)
    n_comm = mod.count()
    print(f"communities: {n_comm} with modularity Q = {q}")

    ks = (
        QUERIES["dq_drift_ks"](spark, sf_dir)
        .agg(
            F.max(
                F.when(F.col("gap_den") > 0, F.col("gap_num") / F.col("gap_den"))
                .otherwise(F.lit(0.0))
            ).alias("ks")
        )
        .collect()[0]["ks"]
    )
    psi = (
        QUERIES["dq_drift_psi"](spark, sf_dir)
        .agg(F.round(F.sum("psi_term"), 4).alias("psi"))
        .collect()[0]["psi"]
    )
    print(f"drift: KS={ks} PSI={psi} (same slice, same grid)")

    zipf = QUERIES["text_zipf_fit"](spark, sf_dir).collect()[0]
    print(f"corpus zipf slope: {zipf['slope']} over top {zipf['n_tokens']} tokens")

    mi = (
        QUERIES["agg_mutual_info"](spark, sf_dir)
        .agg(F.round(F.sum("mi_term"), 4).alias("mi"))
        .collect()[0]["mi"]
    )
    print(f"lang x source mutual information: {mi} nats")

    hll = QUERIES["dq_profile_hll_audit"](spark, sf_dir).collect()
    n_ok = sum(1 for r in hll if r["hll_within_band"])
    print(f"hll profile audit: {n_ok}/{len(hll)} columns within 10% of exact")

    sk = QUERIES["sketch_error_audit"](spark, sf_dir).collect()
    for r in sk:
        print(
            f"sketch audit [{r['audit']}]: exact={r['exact_value']:.1f} "
            f"within_bound={r['within_bound']}"
        )

    mq = (
        QUERIES["dedup_minhash_quality"](spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("pairs"),
            F.round(F.avg(F.col("mh_matches") / 16.0), 4).alias("est_j"),
            F.round(
                F.avg(F.col("n_inter") / F.col("n_union")), 4
            ).alias("true_j"),
        )
        .collect()[0]
    )
    print(
        f"minhash fidelity: {mq['pairs']} candidate pairs, "
        f"mean est J={mq['est_j']} vs true J={mq['true_j']}"
    )

    for r in QUERIES["corpus_dedup_funnel"](spark, sf_dir).collect():
        print(f"funnel [{r['stage_idx']}] {r['stage']}: {r['n_docs']} docs")
    print("certification: COMPLETE")


if __name__ == "__main__":
    main()
