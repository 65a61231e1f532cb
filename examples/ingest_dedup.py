"""Daily corpus-ingest dedup — the round-5 cross-corpus surface chained
the way an ingest pipeline actually runs it against an INDEXED corpus:

  1. exact containment    -> content-hash anti-join vs the index (a
                             byte-identical re-crawl never costs more
                             than a hash lookup)
  2. near-dup containment -> minhash_pairs_against: the new batch bands
                             against the corpus's signature table — only
                             the batch pays shingle→minhash, the join is
                             batch×index, never corpus×corpus
  3. boilerplate gate     -> repeated_span_stats over (survivors ∪ a
                             corpus sample): docs that are mostly
                             spans recurring elsewhere are license
                             blocks / templates, not content
  4. admit                -> what survives all three joins the corpus

Every operator here is a declared, oracle-checked query shape; this
runbook only sequences them. The harness `documents` table stands in for
both sides: even doc_ids = the indexed corpus, odd = today's batch.

Run:  python examples/ingest_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.dedup import (
    minhash_pairs_against,
    repeated_span_stats,
)
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("ingest-dedup")
    docs = load_table(spark, sf_dir, "documents")
    index = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    n_batch = batch.count()
    print(f"== ingest: {n_batch} new docs vs {index.count()} indexed ==")

    # 1. exact: drop byte-identical re-crawls (anti-join on content hash)
    idx_hashes = index.select(F.md5("text").alias("_h")).distinct()
    fresh = batch.withColumn("_h", F.md5("text")).join(
        idx_hashes, "_h", "left_anti"
    ).drop("_h").localCheckpoint(eager=True)
    n_fresh = fresh.count()
    print(f"== 1. exact containment: {n_batch - n_fresh} exact re-crawls dropped ==")

    # 2. near-dup: band the survivors against the corpus signature table
    pairs = minhash_pairs_against(index, fresh, "doc_id", "text")
    dup_keys = pairs.select(
        F.col("batch_key").alias("doc_id")
    ).distinct()
    kept = fresh.join(dup_keys, "doc_id", "left_anti")
    print(f"== 2. near-dup containment: {dup_keys.count()} batch docs "
          f"collide with the index ==")

    # 3. boilerplate gate: spans recurring across the pool are templates
    pool = kept.unionByName(index.select(*kept.columns))
    flagged = (
        repeated_span_stats(pool, "doc_id", "text", flag_pct=60)
        .filter(F.col("flagged"))
        .select(F.col("key").alias("doc_id"))
    )
    admitted = kept.join(flagged, "doc_id", "left_anti")
    n_admit = admitted.count()
    print(f"== 3. boilerplate gate: {kept.count() - n_admit} mostly-"
          f"repeated docs dropped ==")

    print(f"== 4. admitted {n_admit} of {n_batch} new docs ==")
    print("ingest: DONE")


if __name__ == "__main__":
    main()
