"""Training-corpus preparation in one call — the engine's LLM-data
surface (operators/corpus.py) over the harness `documents` table.

    quality filter → language ID → exact dedup → repeated-span
    boilerplate gate → MinHash near-dup cluster removal →
    deterministic train/val/test split

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

    # production hash defaults (xxhash64 LSH); the opt-in repeated-span
    # gate additionally drops docs that are >=60% cross-document 5-gram
    # material (license blocks / boilerplate that document-level near-dup
    # passes miss — the Lee et al. exact-substring signal)
    out = prepare_corpus(docs, max_repeated_pct=60)
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

    # post-split hygiene: repetition filter, eval-set decontamination,
    # and temperature rebalancing of the training mix
    from openmrs_patient_migration_script_spark.operators.sampling import (
        temperature_resample,
    )
    from openmrs_patient_migration_script_spark.operators.text import (
        ngram_contamination,
        repetition_metrics,
    )

    kept = out.join(docs.select(F.col("doc_id").alias("key"), "text"), "key")
    rep = repetition_metrics(kept, "key", "text").filter(
        F.col("tok_distinct_ratio") >= 0.2
    )
    # several counts + the anti-join + the resample all consume this —
    # materialize once (same pattern prepare_corpus uses for survivors)
    kept = kept.join(rep.select("key"), "key", "left_semi").localCheckpoint(
        eager=True
    )

    train = kept.filter(F.col("split") == "train")
    evalset = kept.filter(F.col("split") != "train")
    # synthetic docs draw from a tiny vocabulary, so short shingles
    # collide by chance — use longer shingles + a higher hit floor (real
    # corpora use 8-13 gram exact-match for the same reason)
    leaked = ngram_contamination(
        train, evalset, "key", "text", shingle_n=4, min_hits=2
    ).localCheckpoint(eager=True)
    clean_train = train.join(leaked.select("key"), "key", "left_anti")
    print(
        f"repetition filter kept {kept.count()}; decontamination dropped "
        f"{leaked.count()} leaked train docs -> {clean_train.count()} train"
    )

    mix = temperature_resample(
        clean_train, "predicted_lang", "key", alpha=0.5, target_frac=0.5
    )
    for r in mix.groupBy("predicted_lang").count().orderBy("predicted_lang").collect():
        print(f"  final mix {r.predicted_lang}: {r['count']} docs")

    # r4 quality lenses over the final mix — the rule battery, the LM
    # surprisal filter and the hashed classifier score, all row-local or
    # broadcast-joined (no extra corpus shuffles beyond their aggs)
    from openmrs_patient_migration_script_spark.operators.text import (
        gopher_rules,
        hashed_linear_score,
        unigram_surprisal,
    )

    g = gopher_rules(mix, key_col="key", text_col="text")
    n_pass = g.filter("passes").count()
    print(f"gopher rule battery: {n_pass}/{g.count()} of the mix pass")
    surp = unigram_surprisal(mix, key_col="key", text_col="text")
    hi = surp.orderBy(F.desc("avg_surprisal")).limit(3).collect()
    print("highest-surprisal (most atypical) docs:",
          [(r.key, float(r.avg_surprisal)) for r in hi])
    score = hashed_linear_score(mix, key_col="key", text_col="text")
    stats = score.agg(
        F.round(F.min("score"), 4).alias("lo"),
        F.round(F.max("score"), 4).alias("hi"),
    ).collect()[0]
    print(f"classifier score range over the mix: [{stats.lo}, {stats.hi}]")


if __name__ == "__main__":
    main()
