"""Training-corpus preparation in one call — the engine's LLM-data
surface (operators/corpus.py) over the harness `documents` table.

    quality filter → language ID → exact dedup → MinHash near-dup
    cluster removal → deterministic train/val/test split

Run:  python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.corpus import prepare_corpus
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.count()

    out = prepare_corpus(docs)  # production hash defaults (xxhash64 LSH)
    summary = (
        out.groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("split")
        .collect()
    )
    n_out = sum(r.docs for r in summary)
    print(f"{n_in} documents in -> {n_out} kept after quality/dedup filters")
    for r in summary:
        print(f"  {r.split:5s}: {r.docs:6d} docs, avg quality {r.avg_quality}")


if __name__ == "__main__":
    main()
