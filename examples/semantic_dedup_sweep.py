"""The layered dedup sweep a 100 TB corpus actually runs — each layer
catches what the previous one cannot, cheapest first:

    1. exact content hash         (identical bytes)
    2. paragraph first-occurrence (shared boilerplate INSIDE distinct docs)
    3. MinHash/LSH near-dup       (edited copies, syntactic)
    4. SemDeDup embedding dedup   (paraphrases — same meaning, new words)

Layers 1-3 work on tokens (documents table); layer 4 works on the
embedding space (embeddings table). The point of the ordering: every
layer shrinks the next layer's input, and only layer 4 pays
vector arithmetic — on the survivors only, never the raw corpus.

Run:  python examples/semantic_dedup_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.dedup import (
    dedup_exact_keep_first,
    minhash_candidate_pairs,
    paragraph_dedup,
)
from openmrs_patient_migration_script_spark.operators.graph import (
    connected_components,
)
from openmrs_patient_migration_script_spark.operators.similarity import (
    semantic_dedup,
)
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("semantic-dedup-sweep")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact: one hash shuffle
    docs = docs.withColumn("_h", F.xxhash64("text"))
    docs = dedup_exact_keep_first(docs, ["_h"], "doc_id").drop("_h")
    n1 = docs.count()

    # 2. paragraph-level: drop repeated paragraphs, keep docs that still
    #    have ANY original content (CCNet rule)
    paras = paragraph_dedup(docs, "doc_id", "text", para_tokens=10)
    docs = (
        docs.join(paras.filter("n_kept > 0").select("key"),
                  docs.doc_id == F.col("key"), "left_semi")
    )
    n2 = docs.count()

    # 3. syntactic near-dup: LSH candidates -> components -> keep min id
    pairs = minhash_candidate_pairs(docs, "doc_id", "text", 16, 4)
    comp = connected_components(pairs, "key_a", "key_b")
    losers = comp.filter("node != cluster").select("node")
    docs = docs.join(losers, docs.doc_id == losers.node, "left_anti")
    n3 = docs.count()

    # 4. semantic: embedding-space SemDeDup. In this harness the
    # embeddings table is keyed independently (vec_id has no doc_id
    # linkage), so the layer runs on the whole vector corpus; in a real
    # pipeline the first three layers' survivors gate it:
    #   emb.join(docs.select(F.col("doc_id").alias("vec_id")), "vec_id",
    #            "left_semi")
    emb = load_table(spark, sf_dir, "embeddings")
    sem = semantic_dedup(emb, n_clusters=16, threshold=0.4)
    kept = sem.filter("kept").count()
    n4 = sem.count()

    print(f"exact:     {n0} -> {n1}")
    print(f"paragraph: {n1} -> {n2}")
    print(f"minhash:   {n2} -> {n3}")
    print(f"semantic:  {n4} vectors -> {kept} kept")


if __name__ == "__main__":
    main()
