"""Embedding index storage design — the three pruning axes priced with
exact numbers before anyone builds the index, composed the way a
capacity-planning review actually reads them:

  1. precision axis   -> per-dim int8 ledger (embed_quantize_int8):
                         saturation and error energy say whether absmax
                         scaling is safe, BEFORE the recall question
  2. precision recall -> exact-vs-int8 top-k overlap
                         (embed_quantize_recall): what the 4x memory
                         cut costs in retrieval quality
  3. dimension recall -> full-vs-prefix top-k overlap
                         (embed_matryoshka_eval): what a 4x dimension
                         cut would cost instead
  4. training export  -> hard negatives (sim_hard_negatives): the
                         contrastive pairs that would RETRAIN the
                         embedding if neither cut is acceptable

Every stage is a declared, oracle-checked query; this runbook only
composes them into the design decision.

Run:  python examples/index_design.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="index-design")

    print("== 1. int8 quantization ledger (precision axis) ==")
    ledger = eng.query("embed_quantize_int8")
    agg = ledger.agg(
        F.sum("n_sat").alias("sat"),
        F.sum("sum_abs_code").alias("mass"),
        F.sum("n").alias("cells"),
    ).collect()[0]
    print(
        f"  {agg.cells} quantized cells, {agg.sat} saturated, "
        f"mean |code| {agg.mass / agg.cells:.1f}/127"
    )

    print("== 2. recall cost of int8 (keep 64 dims, cut precision) ==")
    q8 = eng.query("embed_quantize_recall")
    k8 = q8.agg(F.sum("n_overlap"), F.count("*")).collect()[0]
    print(f"  int8 keeps {k8[0]}/{k8[1] * 5} of the exact top-5 slots")

    print("== 3. recall cost of truncation (keep fp, cut to 16 dims) ==")
    mr = eng.query("embed_matryoshka_eval")
    km = mr.agg(F.sum("n_overlap"), F.count("*")).collect()[0]
    print(f"  16-dim prefix keeps {km[0]}/{km[1] * 5} of the exact top-5")

    verdict = "int8" if k8[0] >= km[0] else "16-dim prefix"
    print(f"  -> cheaper 4x cut on this corpus: {verdict}")

    print("== 4. hard negatives (the retraining export) ==")
    hn = eng.query("sim_hard_negatives")
    n_pairs = hn.count()
    top = hn.orderBy(F.desc("cos_sim")).limit(3).collect()
    for r in top:
        print(
            f"  query {r.query_id} vs {r.vec_id}: cos {r.cos_sim:.4f} "
            "(near, but cross-label)"
        )
    print(f"index design: {n_pairs} contrastive pairs staged")
    print("index design: READY")


if __name__ == "__main__":
    main()
