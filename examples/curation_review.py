"""The round-8 curation review — the report a training-data owner reads
BEFORE committing a corpus snapshot to an expensive run, built entirely
from declared (hash-checked) queries:

  mix concentration   - per-language Herfindahl index of source shares:
                        is any language one-source dominated?
                        (agg_concentration_hhi)
  vocabulary growth   - Heaps'-law curve over corpus prefixes: a beta
                        collapsing toward 0 means template/boilerplate
                        saturation (text_heaps_fit)
  banding tune        - the LSH bands/rows sweep: candidate volume,
                        hot-bucket size, and the s-curve threshold each
                        config buys (dedup_minhash_band_sweep)
  cluster separation  - pairwise cosine between label-centroid
                        directions: are the embedding clusters real?
                        (embed_centroid_separation)
  value reconcile     - header-vs-detail exact-cents drift across the
                        order/lineitem grain (dq_header_detail_reconcile)
  domain drift        - enum values that appeared or vanished between
                        periods — invisible to binned monitors
                        (dq_new_categories)
  concentration       - top-decile revenue share via exact global
                        quantile SELECTION, no global sort
                        (agg_pareto_share)

Run:  python examples/curation_review.py [sf_dir]
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
    spark = get_spark("curation-review")

    print("== mix concentration (HHI per language) ==")
    for r in (
        QUERIES["agg_concentration_hhi"](spark, sf_dir)
        .orderBy(F.desc("hhi"))
        .collect()
    ):
        flag = "  <- one-source dominated" if r.hhi > 0.5 else ""
        print(
            f"  {r.lang}: hhi={r.hhi:.4f} over {r.n_sources} sources "
            f"({r.n_docs} docs){flag}"
        )

    print("== vocabulary growth (Heaps) ==")
    for r in QUERIES["text_heaps_fit"](spark, sf_dir).orderBy("bucket").collect():
        print(
            f"  prefix {r.bucket}: N={r.n_tokens_cum} tokens, "
            f"V={r.vocab_cum} types, local beta={r.beta_local:.3f}"
        )

    print("== LSH banding sweep ==")
    for r in (
        QUERIES["dedup_minhash_band_sweep"](spark, sf_dir)
        .orderBy("bands")
        .collect()
    ):
        print(
            f"  bands={r.bands} rows={r.rows_per_band}: t*={r.threshold_star:.3f}, "
            f"{r.n_candidate_pairs} candidates, max bucket {r.max_bucket_docs}, "
            f"join workload {r.n_bucket_pairs} pairs"
        )

    print("== embedding cluster separation (worst 3 label pairs) ==")
    for r in (
        QUERIES["embed_centroid_separation"](spark, sf_dir)
        .orderBy(F.desc("cos_centroid"))
        .limit(3)
        .collect()
    ):
        print(
            f"  labels {r.label_a} vs {r.label_b}: centroid cos "
            f"{r.cos_centroid:.4f} (n={r.n_a}/{r.n_b})"
        )

    print("== header/detail reconcile ==")
    r = QUERIES["dq_header_detail_reconcile"](spark, sf_dir).collect()[0]
    print(
        f"  {r.n_orders} orders: {r.n_exact_match} exact, "
        f"{r.n_mismatch} drifted (max {r.max_abs_diff_cents}c, "
        f"total {r.total_abs_diff_cents}c), {r.n_orders_no_lines} without lines"
    )

    print("== categorical domain drift ==")
    r = QUERIES["dq_new_categories"](spark, sf_dir).collect()[0]
    print(
        f"  {r.column_name}: {r.n_new} new ({r.n_new_rows} rows: "
        f"'{r.new_categories}'), {r.n_vanished} vanished, "
        f"domain {r.n_ref_categories} -> {r.n_cur_categories}"
    )

    print("== revenue concentration ==")
    r = QUERIES["agg_pareto_share"](spark, sf_dir).collect()[0]
    print(
        f"  top decile ({r.n_top} of {r.n_customers} customers, cut at "
        f"{r.p90_cents}c) holds {r.top_share:.1%} of revenue"
    )

    print("curation review complete")


if __name__ == "__main__":
    main()
