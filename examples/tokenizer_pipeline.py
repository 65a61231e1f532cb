"""Tokenizer training end-to-end — the LLM-data arc the engine completed
in rounds 8-10, composed as one runnable pipeline:

    corpus prep (quality -> langid -> exact dedup -> LSH clusters ->
    leak-proof split) → BPE merge-table training on the TRAIN split
    (operators/text.py::bpe_train — corpus collapses to vocabulary,
    rounds are vocab-sized) → doc-wide zero-shuffle encode
    (bpe_token_count_col) → GPT-style sequence packing
    (pack_sequences, 32 independent hash-ordered streams).

Only the train split trains the tokenizer (the same leak discipline as
model training); every split is encoded and packed with the SAME merge
table. Step 5 trains the r11 UNIGRAM-LM vocabulary on the same split
and compares both tokenizer families' compression on the same corpus.

Run:  python examples/tokenizer_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.corpus import prepare_corpus
from openmrs_patient_migration_script_spark.operators.text import (
    bpe_token_count_col,
    bpe_train,
    pack_sequences,
    unigram_token_count_col,
    unigram_train,
)
from openmrs_patient_migration_script_spark.session import get_spark
from openmrs_patient_migration_script_spark.sources import load_table

SEQ_TOKENS = 64
MERGE_ROUNDS = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    # 1. corpus preparation: the prepared set carries (key, split, ...)
    prepared = prepare_corpus(docs).select(
        F.col("key").alias("doc_id"), "split"
    )
    kept = docs.join(prepared, "doc_id").localCheckpoint(eager=True)
    n_train = kept.filter(F.col("split") == "train").count()
    print(f"corpus: {docs.count()} docs in -> {kept.count()} kept, "
          f"{n_train} train")

    # 2. train the merge table on the TRAIN split only
    merges = bpe_train(
        kept.filter(F.col("split") == "train"), n_rounds=MERGE_ROUNDS
    )
    print(f"merge table ({len(merges)} rounds learned):")
    for rank, a, b, freq in merges:
        print(f"  {rank:2d}. {a!r} + {b!r}  (pair_freq {freq})")

    # 3. encode EVERY split with the learned table — a zero-shuffle
    # row-local projection after training
    pair_list = [(a, b) for _, a, b, _ in merges]
    encoded = kept.select(
        "doc_id",
        "split",
        bpe_token_count_col("text", pair_list).alias("n_bpe_tokens"),
    ).localCheckpoint(eager=True)  # feeds the stats agg AND packing
    stats = (
        encoded.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_bpe_tokens").alias("bpe_tokens"),
        )
        .orderBy("split")
        .collect()
    )
    for r in stats:
        print(f"  {r['split']:5s}: {r['docs']:5d} docs, "
              f"{r['bpe_tokens']:8d} BPE tokens")

    # 4. pack the train split into fixed-length training sequences
    packed = pack_sequences(
        encoded.filter(F.col("split") == "train"),
        key_cols=["doc_id"],
        count_col="n_bpe_tokens",
        seq_tokens=SEQ_TOKENS,
    )
    # sequences per stream = ceil(stream tokens / SEQ_TOKENS): a piece may
    # straddle cuts, so counting distinct seq_ids would undercount
    row = (
        packed.join(encoded.select("doc_id", "n_bpe_tokens"), "doc_id")
        .groupBy("bucket")
        .agg(F.sum("n_bpe_tokens").alias("toks"))
        .agg(
            F.sum(F.ceil(F.col("toks") / SEQ_TOKENS)).alias("n_seq"),
            F.sum("toks").alias("total"),
        )
        .collect()[0]
    )
    print(f"packed train split: {row['n_seq']} sequences of {SEQ_TOKENS} "
          f"tokens across 32 streams ({row['total']} tokens laid "
          f"end-to-end, zero padding waste)")
    # 5. the OTHER mainstream family: unigram-LM (SentencePiece-style,
    # r11) trained on the same split — seed-big, EM re-estimate, prune —
    # and the two families' compression compared on identical text
    ledger = unigram_train(kept.filter(F.col("split") == "train"))
    final_round = max((r for r, *_ in ledger), default=0)
    vocab = [(p, c) for r, _, p, c in ledger if r == final_round]
    print(f"unigram vocabulary (round {final_round}, {len(vocab)} pieces): "
          + ", ".join(repr(p) for p, _ in vocab[:8]) + " ...")
    compare = kept.select(
        bpe_token_count_col("text", pair_list).alias("bpe"),
        unigram_token_count_col("text", vocab).alias("uni"),
        F.length(F.lower("text")).cast("long").alias("chars"),
    ).agg(F.sum("bpe").alias("bpe"), F.sum("uni").alias("uni"),
          F.sum("chars").alias("chars")).collect()[0]
    print(f"compression on the kept corpus: {compare['chars']} chars -> "
          f"{compare['bpe']} BPE tokens / {compare['uni']} unigram tokens")
    print("tokenizer: READY")
    spark.stop()


if __name__ == "__main__":
    main()
