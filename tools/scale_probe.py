"""Scaling probe: time the engine's core operator shapes at 1x/4x/16x the
sf0.1 data (synthetic in-memory replication with key-shifted copies, so
join/group keys stay consistent) and record how wall time grows.

The point is evidence for the 100 TB question: a shape whose time grows
~linearly in rows on fixed cores keeps working when rows and cores scale
together; super-linear growth (quadratic pair explosions, single-partition
chokepoints) shows up here as exponent >> 1.

Usage: python tools/scale_probe.py   (writes SCALING.md)
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from openmrs_patient_migration_script_spark.session import get_spark  # noqa: E402
from openmrs_patient_migration_script_spark.sources import load_table  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
FACTORS = [1, 4, 16]
KEY_SHIFT = 10_000_000


def replicate(df, key_cols, k: int, shift: int):
    """k key-shifted copies: copy r adds r*shift to every key column, so
    equi-joins between tables replicated with the SAME shift stay
    consistent and selectivity is preserved."""
    if k == 1:
        return df
    rep = df.sparkSession.range(k).withColumnRenamed("id", "_rep")
    out = df.crossJoin(rep)
    for c in key_cols:
        out = out.withColumn(c, F.col(c) + F.col("_rep") * shift)
    return out.drop("_rep")


def _perturbed_copies(emb, k: int):
    """k key-shifted copies of the embeddings table whose vectors get a
    per-(copy, dim) SIGN FLIP (parity of xxhash64(copy, dim)): sign flips
    preserve every within-copy pairwise cosine exactly while decorrelating
    copies (cross-copy pairs land near orthogonal), so true-pair volume
    stays linear in k. (An additive shift per copy would do the opposite —
    x + c makes all of copy c's vectors nearly parallel to the all-ones
    direction, planting n² near-dup pairs per copy.)"""
    from functools import reduce

    copies = [
        emb.select(
            (F.col("vec_id") + F.lit(i * KEY_SHIFT)).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size("embedding") - 1),
                lambda x, d: F.when(
                    F.pmod(F.xxhash64(F.lit(1000 + i), d), 2) == 0, x
                ).otherwise(-x),
            ).alias("embedding"),
        )
        for i in range(k)
    ]
    return reduce(lambda a, b: a.unionByName(b), copies)


def _funnel(ev):
    """The funnel shape: three stacked window mins on one user_id
    partitioning + a global distinct-count agg."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    df = (
        ev.withColumn(
            "first_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "first_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") > F.col("first_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return df.agg(
        F.countDistinct("user_id"),
        F.countDistinct(F.when(F.col("first_click").isNotNull(), F.col("user_id"))),
    )


def timed(df) -> float:
    t0 = time.time()
    if callable(df):
        df = df()  # deferred shapes: construction runs jobs — time them
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _interval_shape(o_k):
    """Same-customer overlapping 14-day order windows (join_interval_overlap
    declared shape) on the replicated orders."""
    from openmrs_patient_migration_script_spark.operators.joins import (
        interval_overlap_join,
    )

    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1990-01-01").cast("date")
    )
    w = o_k.select(
        "o_custkey",
        "o_orderkey",
        days.cast("long").alias("s"),
        (days + 14).cast("long").alias("e"),
    )
    a = w.select(
        "o_custkey",
        F.col("o_orderkey").alias("okey_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
    )
    b = w.select(
        "o_custkey",
        F.col("o_orderkey").alias("okey_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
    )
    return interval_overlap_join(
        a, b, "s_a", "e_a", "s_b", "e_b", bin_width=14.0, on=["o_custkey"]
    ).filter(F.col("okey_a") < F.col("okey_b"))


def _simhash_pairs_shape(docs, k: int):
    """Banded Hamming pair search over k XOR-masked fingerprint copies.
    Base fingerprints are computed ONCE per factor (constant cost); each
    copy XORs a fixed random 60-bit mask — XOR preserves within-copy
    Hamming distances exactly and randomizes cross-copy distances (~30
    bits), so the true-pair volume stays linear in k."""
    import random
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        simhash,
        simhash_pairs,
    )

    fps = simhash(docs, "doc_id", "text", bits=60).localCheckpoint(eager=True)
    rng = random.Random(42)
    masks = [0] + [rng.getrandbits(60) for _ in range(k - 1)]
    copies = [
        fps.select(
            (F.col("key") + F.lit(i * KEY_SHIFT)).alias("key"),
            F.col("simhash").bitwiseXOR(F.lit(m).cast("long")).alias("simhash"),
        )
        for i, m in enumerate(masks)
    ]
    fps_k = reduce(lambda a, b: a.unionByName(b), copies)
    return simhash_pairs(fps_k, bits=60, max_hamming=3)


def _jaccard_shape(docs, k: int):
    """Inverted-index n-gram Jaccard at k copies. Key-shifting doc_ids is
    NOT enough here: copies sharing their shingle text would meet in the
    shingle join and candidate volume would grow k² (every cross-copy
    pair is a perfect near-dup). Each copy therefore suffixes its tokens
    with the copy tag — every shingle becomes copy-local, so true-pair
    volume stays linear while shingle cardinality scales with rows (the
    honest growth mode for a corpus that grows by NEW documents)."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    return ngram_jaccard_pairs(d_k, "doc_id", "text", min_shared=2, max_df=50)


def _ewma_shape(ev_k):
    from openmrs_patient_migration_script_spark.operators.timeseries import ewma

    return ewma(ev_k, "user_id", ["ts", "event_id"], "value", alpha=0.5)


def _bitmap_shape(o_k):
    from openmrs_patient_migration_script_spark.operators.sketches import (
        bitmap_slices,
        rollup_bitmap_distinct,
    )

    b = bitmap_slices(o_k, ["o_orderpriority", "o_orderstatus"], "o_custkey")
    return rollup_bitmap_distinct(b, ["o_orderpriority"])


def _fuzzy_edges(c_k):
    from openmrs_patient_migration_script_spark.operators.dedup import (
        fuzzy_dedup_pairs,
    )

    named = c_k.select(
        F.col("c_custkey").alias("key"),
        F.translate(
            F.lpad(F.col("c_custkey").cast("string"), 9, "0"),
            "0123456789",
            "abcdefghij",
        ).alias("name"),
    )
    return fuzzy_dedup_pairs(
        named, "key", "name", [F.substring("name", 1, 7)], max_distance=1
    )


def _triangles_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        triangle_count,
    )

    return triangle_count(_fuzzy_edges(c_k))


def _star_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        connected_components_star,
    )

    return connected_components_star(_fuzzy_edges(c_k))


def _pagerank_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import pagerank

    return pagerank(_fuzzy_edges(c_k), src="key_a", dst="key_b", n_iter=4)


def _labelprop_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        label_propagation,
    )

    return label_propagation(_fuzzy_edges(c_k), src="key_a", dst="key_b", n_iter=3)


def _seasonal_shape(ev_k):
    from openmrs_patient_migration_script_spark.operators.timeseries import (
        seasonal_decompose,
    )

    return seasonal_decompose(ev_k, "user_id", "ts", "event_id", "value")


def _surprisal_shape(docs, k: int):
    """Unigram surprisal at k copies — tokens copy-tagged like the
    jaccard shape, so the vocabulary (and its broadcast) grows with
    rows: the honest mode for a corpus growing by new documents."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.text import (
        unigram_surprisal,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    return unigram_surprisal(d_k)


def _containment_shape(docs, k: int):
    """Asymmetric containment pairs at k copies — copy-tagged tokens like
    the jaccard shape (same inverted index, same linear true-pair
    argument); the orientation fan-out is row-local, so it adds output
    rows but no shuffle."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        containment_pairs,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    return containment_pairs(d_k, "doc_id", "text", min_shared=2, max_df=50)


def _repeated_spans_shape(docs, k: int):
    """Cross-doc repeated-span audit at k copies — token-suffix-tagged
    copies like the containment shape, so cross-copy shingles never
    match and repeated-shingle volume stays linear in k; cost is the
    shingle-vocab DF agg + the occurrence join + one doc-keyed window."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        repeated_span_stats,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    return repeated_span_stats(d_k, "doc_id", "text", span_tokens=5)


def _pq_shape(emb, k: int):
    """PQ ADC scan over sign-flip-decorrelated copies (the
    cosine_pairs_lsh replication rule): codebooks seed from the grown
    corpus, 10 fixed queries table-scan every row — output rows are
    10·n, the honest linear growth of a batch ADC pass."""
    from openmrs_patient_migration_script_spark.operators.similarity import pq_topk

    e_k = _perturbed_copies(emb, k)
    q10 = emb.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    return pq_topk(e_k, q10, k=5, rerank_n=50)


def _nearest_shape(ev_k):
    from openmrs_patient_migration_script_spark.operators.joins import (
        asof_join_nearest,
    )

    purchases = ev_k.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
    )
    views = ev_k.filter("event_type = 'view'").select(
        F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
    )
    return asof_join_nearest(
        purchases, views, ["user_id"], "pts", "vts",
        right_payload=["vid", "vts"], right_id="vid",
    )


def _winsorize_shape(li_k):
    from openmrs_patient_migration_script_spark.operators.quality import winsorize

    return winsorize(
        li_k, "l_extendedprice", ["l_orderkey", "l_linenumber"], 0.01, 0.99
    )


def _mad_shape(ev_k):
    from openmrs_patient_migration_script_spark.operators.quality import (
        robust_anomalies,
    )

    return robust_anomalies(
        ev_k, key_col="user_id", value_col="value", id_cols=["event_id"]
    )


def _paragraph_shape(docs, k: int):
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        paragraph_dedup,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    return paragraph_dedup(d_k, "doc_id", "text", para_tokens=10)


def _linkage_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.dedup import (
        fellegi_sunter_pairs,
    )

    name = F.translate(
        F.lpad(F.col("c_custkey").cast("string"), 12, "0"),
        "0123456789",
        "abcdefghij",
    )
    a = c_k.select(
        F.col("c_custkey").alias("rid"), name.alias("name"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.substring(name, 1, 10).alias("blk"),
    )
    b = a.withColumn("rid", F.col("rid") + 100 * KEY_SHIFT)
    return fellegi_sunter_pairs(
        a, b, "rid", ["blk"],
        fields=[
            {"col": "name", "w_match": 4000, "w_miss": -1500, "close": (1, 2500)},
            {"col": "nation", "w_match": 1200, "w_miss": -800},
            {"col": "segment", "w_match": 700, "w_miss": -600},
        ],
    )


def _bloom_shape(li_k, o_k):
    from openmrs_patient_migration_script_spark.operators.joins import (
        bloom_semi_join,
    )

    build = o_k.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 250000)
    )
    return bloom_semi_join(li_k, build, "l_orderkey", "o_orderkey")


def _semdedup_shape(emb, k: int):
    from openmrs_patient_migration_script_spark.operators.similarity import (
        semantic_dedup,
    )

    return semantic_dedup(_perturbed_copies(emb, k), n_clusters=64 * k)


def _kcore_shape(customer, k: int):
    from openmrs_patient_migration_script_spark.operators.graph import k_core

    mx = customer.agg(F.max("c_custkey")).collect()[0][0]
    e = customer.filter(F.col("c_custkey") * 2 <= mx).select(
        F.col("c_custkey").alias("key_a"),
        (F.col("c_custkey") * 2).alias("key_b"),
    ).unionByName(
        customer.filter(F.col("c_custkey") * 3 <= mx).select(
            F.col("c_custkey").alias("key_a"),
            (F.col("c_custkey") * 3).alias("key_b"),
        )
    )
    e_k = replicate(e, ["key_a", "key_b"], k, KEY_SHIFT)
    return k_core(e_k, k=2, n_rounds=6)


def _knn_lsh_shape(emb, k: int):
    import math as _math

    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_lsh,
        knn_graph,
    )

    e_k = _perturbed_copies(emb, k)
    cand = cosine_pairs_lsh(
        e_k,
        threshold=0.5,
        num_planes=8 + round(_math.log2(k)),
        num_tables=8,
    )
    return knn_graph(e_k, k=5, candidates=cand)


def _gaps_shape(li_k):
    from pyspark.sql import Window

    li = li_k.select("l_orderkey", "l_linenumber").filter(
        ~((F.col("l_linenumber") == 3) & (F.col("l_orderkey") % 7 == 0))
    )
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    prev = F.coalesce(F.lag("l_linenumber").over(w), F.lit(0))
    return (
        li.withColumn("prev", prev)
        .filter(F.col("l_linenumber") - F.col("prev") > 1)
        .select("l_orderkey", (F.col("prev") + 1).alias("gap_start"))
    )


def _weighted_sample_shape(d_k):
    from openmrs_patient_migration_script_spark.operators.sampling import (
        weighted_sample,
    )

    return weighted_sample(
        d_k, "doc_id", F.lit(1) + F.col("n_chars") % 5, k=100
    )



def _modularity_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        label_propagation,
        modularity,
    )

    edges = _fuzzy_edges(c_k).localCheckpoint(eager=True)
    return modularity(edges, label_propagation(edges, n_iter=3))


def _sssp_shape(c_k):
    from openmrs_patient_migration_script_spark.operators.graph import (
        sssp_bounded,
    )

    edges = _fuzzy_edges(c_k).select(
        "key_a",
        "key_b",
        (1 + (F.col("key_a") + F.col("key_b")) % 7).cast("long").alias("w"),
    )
    seeds = c_k.select(F.col("c_custkey").alias("node")).filter(
        F.col("c_custkey") % 97 == 0
    )
    return sssp_bounded(edges, seeds, max_hops=3)


def _ks_shape(o_k):
    from openmrs_patient_migration_script_spark.operators.quality import ks_drift

    return ks_drift(
        o_k,
        "o_totalprice",
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"),
        lo=0.0,
        width=60000.0,
        n_bins=10,
    )


def _corrmatrix_shape(li_k):
    from openmrs_patient_migration_script_spark.operators.aggregates import (
        corr_matrix,
    )

    return corr_matrix(
        li_k,
        {
            "qty": F.round(F.col("l_quantity")),
            "price_c": F.round(F.col("l_extendedprice") * 100),
            "disc_c": F.round(F.col("l_discount") * 100),
            "tax_c": F.round(F.col("l_tax") * 100),
        },
    )


def _cuped_shape(ev_k):
    from openmrs_patient_migration_script_spark.operators.aggregates import cuped

    cents = F.round(F.col("value") * 100).cast("long")
    cutoff = F.lit("2024-01-16").cast("timestamp")
    units = ev_k.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("arm"),
        F.coalesce(F.sum(F.when(F.col("ts") < cutoff, cents)), F.lit(0))
        .cast("long")
        .alias("x"),
        F.coalesce(F.sum(F.when(F.col("ts") >= cutoff, cents)), F.lit(0))
        .cast("long")
        .alias("y"),
    )
    return cuped(units)


def _zipf_shape(docs, k: int):
    """Zipf fit at k copies — tokens copy-tagged like the surprisal
    shape so the vocabulary grows with rows (new documents, not
    replayed ones)."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.text import zipf_fit

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace("text", r"(\w+)", f"$1x{i}").alias("text"),
        )
        for i in range(k)
    ]
    return zipf_fit(reduce(lambda a, b: a.unionByName(b), copies), top_r=500)


def _mi_shape(d_k):
    from openmrs_patient_migration_script_spark.operators.aggregates import (
        mutual_information,
    )

    return mutual_information(d_k, "lang", "source")


def _stratified_shape(d_k):
    from openmrs_patient_migration_script_spark.operators.sampling import (
        proportional_stratified_sample,
    )

    return proportional_stratified_sample(d_k, "doc_id", "lang", pct=10)


def _fk_inference_shape(li_k, o_k):
    from openmrs_patient_migration_script_spark.operators.quality import (
        inclusion_audit,
    )

    return inclusion_audit(
        li_k, "l_orderkey", o_k, "o_orderkey", "lineitem->orders"
    )


def _minhash_quality_shape(docs, k: int):
    """Estimate-vs-truth minhash audit at k copies — tokens copy-tagged
    (the ngram_jaccard trick) so shingles stay disjoint across copies:
    candidate pairs, signature compares and true-Jaccard joins all stay
    linear in k instead of colliding quadratically in shared buckets."""
    from functools import reduce

    from openmrs_patient_migration_script_spark.operators.dedup import (
        _band_buckets,
        _shingles,
        minhash_signatures,
    )

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace("text", r"(\w+)", f"$1x{i}").alias("text"),
        )
        for i in range(k)
    ]
    d_k = reduce(lambda a, b: a.unionByName(b), copies)
    sig = minhash_signatures(d_k, "doc_id", "text", num_hashes=16).localCheckpoint(
        eager=True
    )
    buckets = _band_buckets(sig, 16, 4, hash_buckets=True)
    pairs = (
        buckets.select(F.col("key").alias("key_a"), "band", "bucket")
        .join(
            buckets.select(F.col("key").alias("key_b"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .distinct()
        .localCheckpoint(eager=True)
    )
    matches = sum(
        (F.col(f"a.mh_{i}") == F.col(f"b.mh_{i}")).cast("long") for i in range(16)
    )
    mm = (
        pairs.join(sig.alias("a"), pairs["key_a"] == F.col("a.key"))
        .join(sig.alias("b"), pairs["key_b"] == F.col("b.key"))
        .select("key_a", "key_b", matches.alias("mh_matches"))
    )
    sh = d_k.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(F.col("text"), 3))).alias("shingle"),
    )
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("key_a"), "shingle"), "key_a")
        .join(
            sh.select(F.col("doc_id").alias("key_b"), "shingle"),
            ["key_b", "shingle"],
        )
        .groupBy("key_a", "key_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return mm.join(inter, ["key_a", "key_b"], "left")


def _theil_sen_shape(ev_k):
    """Pairwise-day robust-slope shape (ts_theil_sen): one conditional-agg
    scan to the BOUNDED day table, then the O(days**2) pair join and rank
    on metadata — row count should only move the scan term."""
    from pyspark.sql import Window as W

    daily = (
        ev_k.select(
            F.datediff(
                F.to_date("ts"), F.lit("1970-01-01").cast("date")
            ).alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("x"),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        .localCheckpoint(eager=True)
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.d") < F.col("b.d")).select(
        (F.col("b.s") - F.col("a.s")).alias("dn"),
        (F.col("b.d") - F.col("a.d")).alias("dd"),
    )
    w = W.orderBy(F.col("dn").cast("double") / F.col("dd"), "dn", "dd")
    return pairs.select(F.row_number().over(w).alias("rn")).groupBy().agg(
        F.max("rn")
    )


def _tagged_doc_copies(docs, k: int):
    """Selectivity-preserving document replication: copy i suffixes every
    token with `_i`, so cross-copy shingles never collide — the text-side
    equivalent of `replicate`'s key shift. Without it, k plain copies
    give every doc k−1 exact twins and any similarity shape's TRUE pair
    workload grows quadratically in k (a fixture artifact, not a plan
    property — r9 caught `band_sweep_4cfg` crossing exponent 1.0 on
    plain copies while the tagged ladder stays sublinear)."""
    from functools import reduce

    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * KEY_SHIFT)).alias("doc_id"),
            F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias("text"),
        )
        for i in range(k)
    ]
    return reduce(lambda a, b: a.unionByName(b), copies)


def _band_sweep_shape(docs, k: int):
    """4-config LSH banding sweep over ONE shared signature build
    (dedup_minhash_band_sweep): candidate counts per (bands, rows).
    Copy-tagged tokens (see `_tagged_doc_copies`) keep bucket sizes —
    and so the bucket-pair workload the sweep exists to measure —
    proportional to the data, matching every other similarity shape."""
    from openmrs_patient_migration_script_spark.operators.dedup import (
        _band_buckets,
        minhash_signatures,
    )

    d_k = _tagged_doc_copies(docs, k)

    md5_pair = lambda c: (  # noqa: E731
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long"),
        F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("long"),
    )
    sig = minhash_signatures(
        d_k, "doc_id", "text", num_hashes=16, double_hash=md5_pair
    ).localCheckpoint(eager=True)
    out = None
    for bands in (2, 4, 8, 16):
        bb = _band_buckets(sig, 16, bands, hash_buckets=False)
        a = bb.select(F.col("key").alias("key_a"), "band", "bucket")
        b2 = bb.select(F.col("key").alias("key_b"), "band", "bucket")
        one = (
            a.join(b2, ["band", "bucket"])
            .filter(F.col("key_a") < F.col("key_b"))
            .select("key_a", "key_b")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(bands).alias("bands"), "n")
        )
        out = one if out is None else out.unionByName(one)
    return out


def _centroid_sep_shape(e_k):
    """labels x dims integer-sum agg + label-pair join
    (embed_centroid_separation): shuffle carries labels*dims rows."""
    ex = e_k.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        "dim",
        F.round(F.col("v").cast("double") * 1000000).cast("long").alias("sv"),
    )
    s = (
        ex.groupBy("label", "dim")
        .agg(F.sum("sv").cast("long").alias("s"))
        .localCheckpoint(eager=True)
    )
    a, b = s.alias("a"), s.alias("b")
    dec = "decimal(19,0)"
    return (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(F.col("a.label"), F.col("b.label"))
        .agg(F.sum(F.col("a.s").cast(dec) * F.col("b.s").cast(dec)).alias("dot"))
    )


def _pareto_shape(o_k):
    """Histogram-selection exact global p90 + share pass (agg_pareto_share):
    ~3 agg scans of the checkpointed per-customer table, no sort."""
    from openmrs_patient_migration_script_spark.operators.aggregates import (
        exact_global_quantile,
    )

    rev = (
        o_k.groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("r")
        )
        .localCheckpoint(eager=True)
    )
    v_star = exact_global_quantile(rev, "r", 90)
    top = F.col("r") >= F.lit(v_star)
    return rev.agg(
        F.count(F.when(top, 1)).alias("n_top"), F.sum("r").alias("total")
    )


def _quantize_shape(e_k):
    """int8 quantization ledger (embed_quantize_int8): posexplode + one
    64-key absmax agg, broadcast back, one more 64-key agg — two passes
    over the exploded column, map-side combine both times."""
    ex = e_k.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim",
        F.round(F.col("v").cast("double") * 1000000).cast("long").alias("sv"),
    )
    amax = ex.groupBy("dim").agg(F.max(F.abs("sv")).alias("amax_micro"))
    j = ex.join(F.broadcast(amax), "dim")
    code = F.expr(
        "if(amax_micro = 0, 0, if(sv < 0, -1, 1) * "
        "((254 * abs(sv) + amax_micro) div (2 * amax_micro)))"
    )
    return (
        j.select("dim", "sv", "amax_micro", code.alias("code"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs("code")).alias("mass"),
            F.sum(
                (F.lit(127) * F.col("sv") - F.col("code") * F.col("amax_micro"))
                .cast("decimal(19,0)")
                * (F.lit(127) * F.col("sv") - F.col("code") * F.col("amax_micro"))
                .cast("decimal(19,0)")
            ).alias("sse"),
        )
    )


def _sprt_shape(ev_k):
    """Per-arm SPRT prefix scan (ab_sequential_sprt): one arm-keyed
    cumulative window (checkpointed scan), then totals + first-crossing
    aggs over the cached result. Per-arm streams are sequential by the
    statistic's definition — the probe measures the constant-arm-count
    form the batch audit uses."""
    from pyspark.sql import Window

    from openmrs_patient_migration_script_spark.operators.sampling import (
        hash_bucket,
    )

    t = ev_k.select(
        (hash_bucket(F.col("user_id")) % 2).alias("arm"),
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("succ"),
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id")
    scan = t.select(
        "arm",
        "succ",
        F.row_number().over(w).alias("rn"),
        F.sum(
            F.when(F.col("succ") == 1, F.lit(510825624)).otherwise(
                F.lit(-125163143)
            )
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("llr"),
    ).localCheckpoint(eager=True)
    return scan.filter(
        (F.col("llr") >= 2944438979) | (F.col("llr") <= -2944438979)
    ).groupBy("arm").agg(F.min("rn"), F.min_by("llr", "rn"))


def _curriculum_shape(d_k):
    """Token-budget curriculum (corpus_curriculum): one doc scan to the
    101-cell score histogram; thresholds/deciles/cumulative all run on
    bounded metadata rows."""
    toks = "filter(split(lower(text), ' '), t -> t != '')"
    scored = d_k.select(
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(
            f"((size({toks}) - size(filter({toks}, t -> t = 'the' OR "
            f"t = 'a' OR t = 'of'))) * 100) div greatest(size({toks}), 1)"
        ).alias("q"),
    )
    return scored.groupBy("q").agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_tokens").alias("tk")
    )


def _candidate_keys_shape(o_k):
    """Candidate-key audit (dq_candidate_keys): one aggregate carrying
    six COUNT(DISTINCT ...) measures — Catalyst Expand replicates the
    scan |candidates|x into a single shuffle."""
    return o_k.agg(
        F.count(F.lit(1)),
        F.countDistinct("o_orderkey"),
        F.countDistinct("o_custkey"),
        F.countDistinct("o_orderdate"),
        F.countDistinct("o_orderpriority"),
        F.countDistinct("o_custkey", "o_orderdate"),
        F.countDistinct("o_custkey", "o_orderdate", "o_totalprice"),
    )


def main() -> None:
    spark = get_spark("scale-probe")
    li = load_table(spark, SF_DIR, "lineitem").localCheckpoint(eager=True)
    orders = load_table(spark, SF_DIR, "orders").localCheckpoint(eager=True)
    events = load_table(spark, SF_DIR, "events").localCheckpoint(eager=True)
    docs = load_table(spark, SF_DIR, "documents").localCheckpoint(eager=True)
    customer = load_table(spark, SF_DIR, "customer").localCheckpoint(eager=True)
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)

    def shapes(k: int):
        li_k = replicate(li, ["l_orderkey"], k, KEY_SHIFT)
        o_k = replicate(orders, ["o_orderkey", "o_custkey"], k, KEY_SHIFT)
        ev_k = replicate(events, ["event_id", "user_id"], k, KEY_SHIFT)
        d_k = replicate(docs, ["doc_id"], k, KEY_SHIFT)
        c_k = replicate(customer, ["c_custkey"], k, KEY_SHIFT)
        from openmrs_patient_migration_script_spark.operators.corpus import (
            prepare_corpus,
        )
        from openmrs_patient_migration_script_spark.operators.dedup import (
            minhash_candidate_pairs,
        )
        from openmrs_patient_migration_script_spark.operators.joins import (
            asof_join,
            banded_join,
        )
        from openmrs_patient_migration_script_spark.operators.privacy import scrub_text
        from openmrs_patient_migration_script_spark.operators.quality import (
            profile_columns,
            referential_orphans,
        )
        from openmrs_patient_migration_script_spark.operators.etl import (
            assign_surrogate_keys,
        )
        from openmrs_patient_migration_script_spark.operators.similarity import (
            cosine_pairs_lsh,
            cosine_topk_vectorized,
        )
        from openmrs_patient_migration_script_spark.operators.timeseries import (
            resample_ffill,
        )

        e_k = replicate(emb, ["vec_id"], k, KEY_SHIFT)
        q10 = emb.limit(10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )

        purchases = ev_k.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("pts")
        )
        views = ev_k.filter("event_type = 'view'").select(
            F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("vts")
        )
        return {
            "scan_filter_agg (Q1 shape)": li_k.filter(
                "l_shipdate <= TIMESTAMP '1998-09-02'"
            )
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*")),
            "sortmerge_join+agg": li_k.join(
                o_k, li_k.l_orderkey == o_k.o_orderkey
            )
            .groupBy("o_orderpriority")
            .agg(F.count("*")),
            "window_per_key": o_k.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
                        "o_custkey"
                    ).orderBy("o_orderdate", "o_orderkey")
                ),
            ),
            "asof_join": asof_join(
                purchases, views, ["user_id"], "pts", "vts",
                right_payload=["vid", "vts"], right_id="vid",
            ),
            "minhash_lsh": minhash_candidate_pairs(d_k, "doc_id", "text", 16, 4),
            "cosine_topk_vectorized": cosine_topk_vectorized(e_k, q10, k=5),
            "funnel_windows": _funnel(ev_k),
            "tumbling_window": ev_k.groupBy(
                F.window("ts", "1 hour"), "event_type"
            ).agg(F.count("*"), F.sum("value")),
            # deferred (lambda) shapes: construction itself runs jobs
            # (localCheckpoints, iterative rounds) that must be timed too
            "ts_resample_ffill": lambda: resample_ffill(
                ev_k, "user_id", "ts", "value"
            ),
            "pii_scrub": scrub_text(d_k),
            "corpus_prep_pipeline": lambda: prepare_corpus(d_k),
            "banded_join (bin equi rewrite)": banded_join(
                replicate(
                    orders.select("o_orderkey", "o_totalprice"),
                    ["o_totalprice"],  # shift VALUES: copies can't cross-match,
                    k,                 # so matches (and output) stay linear in k
                    KEY_SHIFT,
                ),
                replicate(
                    li.select("l_extendedprice"), ["l_extendedprice"], k, KEY_SHIFT
                ),
                "o_totalprice",
                "l_extendedprice",
                0.05,
            ).select("o_orderkey", "l_extendedprice"),
            "fk_audit (left join + cond agg)": referential_orphans(
                li_k, o_k, "l_orderkey", "o_orderkey", "lineitem->orders"
            ),
            "profile_multi_distinct (Expand)": profile_columns(
                o_k, ["o_custkey", "o_orderstatus", "o_totalprice"]
            ),
            # r3: literal-cut surrogate keys (histogram pass + counts +
            # bucket-local window; construction runs the driver jobs)
            "surrogate_keys (literal cuts)": lambda: assign_surrogate_keys(
                o_k.select("o_orderkey"), "o_orderkey", id_col="sid"
            ),
            # r3: LSH near-dup pair path at a REAL near-dup threshold.
            # Copies are sign-flip decorrelated (see _perturbed_copies),
            # and planes grow with corpus size (8 + log2(k)) — the
            # documented LSH tuning rule: constant expected bucket
            # occupancy keeps candidate volume ~linear in rows; with
            # FIXED planes, in-bucket pair volume is inherently n²/2^m.
            "cosine_pairs_lsh (0.95)": lambda: cosine_pairs_lsh(
                _perturbed_copies(emb, k),
                threshold=0.95,
                num_planes=8 + round(math.log2(k)),
                num_tables=8,
            ),
            # r3 second wave ------------------------------------------------
            # interval-overlap join: order windows per customer; custkey
            # shift keeps matches within copies => linear output
            "interval_overlap_join": _interval_shape(o_k),
            # banded simhash pair search: base fingerprints computed once
            # (constant cost), copies XOR-masked — XOR preserves every
            # within-copy Hamming distance and randomizes cross-copy ones,
            # so true-pair volume stays linear in k
            "simhash_banded_pairs": lambda: _simhash_pairs_shape(docs, k),
            # EWMA fold: one key shuffle + sequential array fold per key
            "ewma_fold": _ewma_shape(ev_k),
            # exact bitmap distinct rollup: bucketed bitmap state
            "bitmap_distinct_rollup": _bitmap_shape(o_k),
            # inverted-index jaccard (the shuffle-heaviest headline query);
            # copy-tagged tokens keep cross-copy shingles disjoint
            "ngram_jaccard": lambda: _jaccard_shape(docs, k),
            # degree-oriented triangle count over the fuzzy pair graph
            "triangle_count": lambda: _triangles_shape(c_k),
            # Small-Star/Large-Star components (iterative; rounds ~O(log n))
            "components_star": lambda: _star_shape(c_k),
            # r4: fixed-point PageRank (4 node-keyed iterations)
            "pagerank_fixed_point": lambda: _pagerank_shape(c_k),
            # r4: unigram surprisal — vocab agg + broadcast + per-doc agg
            "unigram_surprisal": lambda: _surprisal_shape(docs, k),
            # r4: MAD robust outliers — two exact-median sort-aggs, one key
            "mad_outliers": _mad_shape(ev_k),
            # r4 second session ---------------------------------------------
            # linear-interpolation grid: observations-only shuffle like ffill
            "ts_interpolate": lambda: __import__(
                "openmrs_patient_migration_script_spark.operators.timeseries",
                fromlist=["interpolate_linear"],
            ).interpolate_linear(ev_k, "user_id", "ts", "value"),
            # all-int64 CUSUM fold (ewma's plan, integer arithmetic)
            "cusum_fold": lambda: __import__(
                "openmrs_patient_migration_script_spark.operators.timeseries",
                fromlist=["cusum"],
            ).cusum(ev_k, "user_id", ["ts", "event_id"], "value", 50.0, 10.0, 200.0),
            # dual-frame nearest asof: one Exchange, one Window
            "asof_nearest": _nearest_shape(ev_k),
            # asymmetric containment over the inverted index
            "containment_pairs": lambda: _containment_shape(docs, k),
            # PQ integer-ADC full scan + top-50 exact re-rank
            "pq_adc_scan": lambda: _pq_shape(emb, k),
            # percentile-broadcast winsorize (two passes over the column)
            "winsorize_capping": _winsorize_shape(li_k),
            # r4 third session ----------------------------------------------
            # sync label propagation: 3 rounds x (join + two-level argmax)
            "label_propagation": lambda: _labelprop_shape(c_k),
            # checkpointed RANGE-window trend + broadcast seasonal profile
            "seasonal_decompose": lambda: _seasonal_shape(ev_k),
            # r5: exact-substring repeated-span audit (inverted index +
            # doc-keyed interval-merge window)
            "repeated_spans": lambda: _repeated_spans_shape(docs, k),
            # r5 second session ----------------------------------------------
            # paragraph-level dedup: copy-tagged tokens keep cross-copy
            # paragraphs disjoint, so first-occurrence volume is linear
            "paragraph_dedup": lambda: _paragraph_shape(docs, k),
            # Fellegi-Sunter blocked linkage: key-shifted copies form new
            # blocks of the same bounded size — comparator volume linear
            "fellegi_sunter": lambda: _linkage_shape(c_k),
            # bloom-prefiltered semi join: same-shift fact+build copies
            "bloom_semi_join": lambda: _bloom_shape(li_k, o_k),
            # SemDeDup: sign-flip copies preserve within-copy cosines;
            # clusters grow with the corpus (the paper's rule), so the
            # per-cluster quadratic stays bounded
            "semantic_dedup": lambda: _semdedup_shape(emb, k),
            # 2-core peeling: the base doubling graph replicated as k
            # DISJOINT key-shifted edge lists — identical topology per copy
            "k_core_peeling": lambda: _kcore_shape(customer, k),
            # A-ES weighted sample: bounded explode + max agg + top-k
            "weighted_sample": lambda: _weighted_sample_shape(d_k),
            # k-NN graph via the LSH-candidates hook — the 100 TB
            # construction (the exact block-grid form is Θ(n²·d) BY
            # CONTRACT and is not a scaling shape); planes grow with the
            # corpus, the cosine_pairs_lsh tuning rule
            "knn_graph_lsh": lambda: _knn_lsh_shape(emb, k),
            # per-key sequence-gap lag audit: one keyed window
            "sequence_gap_audit": _gaps_shape(li_k),
            # --- r6 shapes ---
            # modularity: two node-keyed label joins + community aggs
            "modularity_audit": lambda: _modularity_shape(c_k),
            # Bellman-Ford rounds: tentative-dist join + min agg per hop
            "sssp_relaxation": lambda: _sssp_shape(c_k),
            # one conditional-agg scan; window over n_bins+2 rows only
            "ks_drift_binned": _ks_shape(o_k),
            # 15 exact counters in ONE scan, row-local explode
            "corr_matrix_onepass": _corrmatrix_shape(li_k),
            # user-keyed agg to units, arm-keyed power sums, 2-row re-agg
            "cuped_readout": _cuped_shape(ev_k),
            # vocab agg + distributed sort-limit head (grows w/ corpus)
            "zipf_head_fit": lambda: _zipf_shape(docs, k),
            # one data agg to cells; marginals re-agg the cell table
            "mutual_info_cells": _mi_shape(d_k),
            # count broadcast + one per-stratum rank window
            "stratified_exact_sample": _stratified_shape(d_k),
            # --- r7 shapes ---
            # IND discovery: distinct-project both sides, one semi join,
            # three one-row counts — nothing carries fact rows. Deferred:
            # the distinct-project stage runs two eager localCheckpoints
            # at construction (the shape's dominant cost), which must be
            # inside timed() like the other checkpoint-at-construction
            # shapes above (r7 probe recorded only the cheap post-
            # checkpoint counts for this row).
            "fk_inference_ind": lambda: _fk_inference_shape(li_k, o_k),
            # minhash estimate-vs-truth audit: candidate-bounded signature
            # compare + shingle intersection (copy-tagged tokens)
            "minhash_quality_audit": lambda: _minhash_quality_shape(docs, k),
            # --- r8 shapes (all deferred: construction checkpoints) ---
            # bounded-day pair join: post-scan cost fixed by day count
            "theil_sen_pairs": lambda: _theil_sen_shape(ev_k),
            # one signature build, 4 banding configs of bucket joins
            "band_sweep_4cfg": lambda: _band_sweep_shape(docs, k),
            # labels x dims agg + label-pair join, vectors never shuffle
            "centroid_separation": lambda: _centroid_sep_shape(e_k),
            # exact global p90 by histogram selection (multi-scan, no sort)
            "pareto_selection": lambda: _pareto_shape(o_k),
            # --- r8 second session (all deferred so any construction
            # work lands inside timed(); only sprt_prefix_scan actually
            # checkpoints at construction, the other three are lazy) ---
            # posexplode + two 64-key aggs, broadcast scale table back
            "quantize_ledger": lambda: _quantize_shape(e_k),
            # arm-keyed prefix-sum window (checkpoint at construction)
            "sprt_prefix_scan": lambda: _sprt_shape(ev_k),
            # one doc scan into a 101-cell histogram; rest is metadata
            "curriculum_histogram": lambda: _curriculum_shape(d_k),
            # 6 exact distincts in one agg: Expand x6 into one shuffle
            "candidate_keys_expand": lambda: _candidate_keys_shape(o_k),
        }

    results: dict[str, dict[int, float]] = {}
    rows: dict[int, int] = {}
    for k in FACTORS:
        rows[k] = replicate(li, ["l_orderkey"], k, KEY_SHIFT).count()
        for name, df in shapes(k).items():
            results.setdefault(name, {})[k] = timed(df)
            print(f"k={k:2d} {name}: {results[name][k]:.2f}s", flush=True)

    lines = [
        "# Scaling probe (generated by tools/scale_probe.py)",
        "",
        f"Core operator shapes on synthetic {FACTORS}x replications of the",
        f"sf0.1 tables (lineitem rows: {', '.join(str(rows[k]) for k in FACTORS)}),",
        "local[32], key-shifted copies so join selectivity is preserved.",
        "",
        "`exp` = fitted growth exponent of wall time vs data size over the",
        "16x span (1.0 = linear; <1 = fixed-overhead-dominated; >>1 = a",
        "shape that would NOT survive a 100x scale-up on proportional",
        "hardware).",
        "",
        "| shape | " + " | ".join(f"{k}x sec" for k in FACTORS) + " | exp |",
        "|---|" + "---|" * (len(FACTORS) + 1),
    ]
    span = math.log(FACTORS[-1] / FACTORS[0])
    for name, ts in results.items():
        exp = math.log(ts[FACTORS[-1]] / ts[FACTORS[0]]) / span
        lines.append(
            f"| {name} | "
            + " | ".join(f"{ts[k]:.2f}" for k in FACTORS)
            + f" | {exp:.2f} |"
        )
    lines += [
        "",
        "Reading the exponents: every shape is sublinear over the span —",
        "wall time grows slower than data while the hardware stays fixed at",
        "local[32], because fixed per-job overhead (JVM, planning, task",
        "launch) still amortizes. The highest rows (triangle_count and the",
        "iterative graph loops, profile_multi_distinct) approach linear",
        "soonest: their shuffle volume is proportional to input (wedge rows;",
        "per-partition distinct values under the Expand), so data cost",
        "dominates overhead earliest. fk_audit, the one at-linear shape in",
        "the round-4 probe (1.04), now pre-aggregates its child side to",
        "distinct keys and fits well sublinear. The top rows — triangle",
        "counting (wedge volume, the documented arboricity-bounded shape)",
        "and fellegi_sunter — are constant work per WEDGE / per CANDIDATE",
        "PAIR: volume grows exactly with rows, so wall time tracks data on",
        "fixed cores; the linkage comparator already short-circuits its",
        "Levenshtein behind the cheap-field threshold guard (91 s -> ~28 s",
        "at 16x), and both parallelize on their shuffle key.",
        "That is the expected asymptote — on a real cluster where executors",
        "scale WITH data, a ~1.0 exponent at fixed hardware translates to",
        "~flat wall time; an exponent well above 1.0 here would indicate a",
        "shape (all-pairs join, driver collect, single-partition sort) that",
        "no amount of hardware rescues. None appears. The per-shape scale",
        "levers (AQE skew split, HLL swap for exact distincts, salting)",
        "are documented in the operator docstrings and SHUFFLE.md.",
    ]
    # Preserve the separately-generated 64x section (scale_probe_64x.py)
    # across regens — this tool only re-times the 1x/4x/16x table.
    out_path = Path("SCALING.md")
    extra = ""
    if out_path.exists():
        prev = out_path.read_text()
        marker = "## 64x probe"
        if marker in prev:
            extra = "\n" + prev[prev.index(marker):]
    out_path.write_text("\n".join(lines) + "\n" + extra)
    print("wrote SCALING.md")


if __name__ == "__main__":
    main()
