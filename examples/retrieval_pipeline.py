"""Embedding retrieval serving path — the similarity family composed
end-to-end, the way a RAG/serving pipeline would actually chain it:

  1. hygiene the index        -> embedding near-dup pairs
                                 (dedup_embedding): near-copies in the
                                 index waste every top-k slot they fill
  2. pick the ANN tier        -> recall of LSH / IVF / PQ candidates
                                 against the exact top-k baseline
                                 (sim_ann_* vs sim_cosine_topk): the
                                 speed/recall dial, measured not assumed
  3. diversify the answer     -> MMR re-rank (sim_mmr_rerank): the k
                                 slots go to k neighborhoods instead of
                                 k copies of the best hit
  4. label what you return    -> per-doc keywords (text_keywords): the
                                 display tags for the returned context

Every stage is a declared, oracle-checked query; this runbook only
demonstrates composition and the read-side measurements.

Run:  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.engine import Engine


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine.local(sf_dir, app_name="retrieval-pipeline")

    print("== 1. index hygiene: embedding near-dups ==")
    pairs = eng.query("dedup_embedding").count()
    print(f"  near-dup pairs above threshold: {pairs}")

    print("== 2. ANN tier recall vs exact top-k ==")
    exact = eng.query("sim_cosine_topk").select("query_id", "vec_id")
    truth = exact.count()
    for tier in ("sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq"):
        hits = (
            eng.query(tier).select("query_id", "vec_id").join(
                exact, ["query_id", "vec_id"]
            ).count()
        )
        print(f"  {tier}: recall {hits}/{truth} = {hits / truth:.2f}")

    print("== 3. diversified answers (MMR) ==")
    mmr = eng.query("sim_mmr_rerank")
    # how often does MMR's slot order diverge from pure relevance order?
    moved = mmr.filter(
        F.col("mmr_score") < F.round(F.col("cos_sim") * 1e6).cast("long") / 1e6
    ).count()
    total = mmr.count()
    print(f"  picks paying a similarity penalty: {moved}/{total}")

    print("== 4. display tags for returned context ==")
    tags = eng.query("text_keywords").filter(F.col("kw_rank") == 1)
    for r in tags.orderBy("doc_id").limit(3).collect():
        print(f"  doc {r.doc_id}: '{r.token}' (tf={r.tf}, df={r.df})")

    print(f"retrieval surface: {total} diversified slots ready")
    print("retrieval: READY")


if __name__ == "__main__":
    main()
