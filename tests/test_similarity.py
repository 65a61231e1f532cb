"""Similarity-search tests: exact top-k sanity + ANN recall vs the exact
baseline (the contract an approximate index must be graded on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmrs_patient_migration_script_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_topk,
)
from openmrs_patient_migration_script_spark.sources import load_table
import pytest

SF = "/root/testdata/sf0.01"


def _split(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.filter(F.expr("vec_id % 50 = 0")).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, queries


def test_cosine_topk_shape_and_self_exclusion(spark):
    emb, queries = _split(spark)
    out = cosine_topk(emb, queries, k=5).collect()
    n_queries = queries.count()
    assert len(out) == 5 * n_queries
    for r in out:
        assert r["vec_id"] != r["query_id"]
        assert -1.0 <= r["cos_sim"] <= 1.0
    # per query: 5 distinct candidates, descending similarity
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["cos_sim"])
    for sims in by_q.values():
        assert len(sims) == 5
        assert sims == sorted(sims, reverse=True) or sorted(sims, reverse=True) == sims


def test_ann_lsh_recall_against_exact(spark):
    emb, queries = _split(spark)
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ann_topk_lsh(emb, queries, k=5, num_planes=3, num_tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured 0.88 at (3 planes, 8 tables) on this corpus; uniform random
    # vectors are the SRP worst case, so leave slack — hashes are
    # deterministic, the slack is for corpus regeneration, not flakiness.
    assert recall >= 0.6, f"ANN recall {recall:.2f} below floor"


def test_lsh_bucket_deterministic(spark):
    emb, _ = _split(spark)
    from openmrs_patient_migration_script_spark.operators.similarity import lsh_bucket

    b1 = emb.select(lsh_bucket(F.col("embedding").cast("array<double>"), 4).alias("b"))
    b2 = emb.select(lsh_bucket(F.col("embedding").cast("array<double>"), 4).alias("b"))
    assert [r["b"] for r in b1.collect()] == [r["b"] for r in b2.collect()]
    assert b1.agg(F.min("b"), F.max("b")).collect()[0] != (None, None)


def test_ivf_recall_and_determinism(spark, sf_dir):
    from openmrs_patient_migration_script_spark.plans import QUERIES

    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["sim_cosine_topk"](spark, sf_dir).collect()
    }
    a = {(r.query_id, r.vec_id) for r in QUERIES["sim_ann_ivf"](spark, sf_dir).collect()}
    b = {(r.query_id, r.vec_id) for r in QUERIES["sim_ann_ivf"](spark, sf_dir).collect()}
    assert a == b, "hash-seeded IVF must be deterministic across runs"
    recall = len(exact & a) / len(exact)
    # uniform-random fixture = IVF worst case; floor is conservative
    assert recall >= 0.55, f"IVF recall {recall} below floor"


def test_pq_recall_and_determinism(spark, sf_dir):
    from openmrs_patient_migration_script_spark.plans import QUERIES

    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["sim_cosine_topk"](spark, sf_dir).collect()
    }
    a = {(r.query_id, r.vec_id) for r in QUERIES["sim_ann_pq"](spark, sf_dir).collect()}
    b = {(r.query_id, r.vec_id) for r in QUERIES["sim_ann_pq"](spark, sf_dir).collect()}
    assert a == b, "content-addressed PQ must be deterministic across runs"
    recall = len(exact & a) / len(exact)
    # 4x16-dim subspace codes over uniform-random vectors (the PQ worst
    # case: no cluster structure for codewords to exploit) with a 10%
    # exact re-rank — the floor is deliberately conservative.
    assert recall >= 0.4, f"PQ recall {recall} below floor"


def test_pq_rerank_scores_are_exact(spark, sf_dir):
    """ADC only SELECTS candidates; every emitted cos_sim must equal the
    exact-path score for that (query, vec) pair — the approximation may
    cost recall, never score fidelity."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk,
    )
    from openmrs_patient_migration_script_spark.plans import QUERIES
    from openmrs_patient_migration_script_spark.plans.similarity_queries import (
        _split as split_q,
    )

    emb, queries = split_q(spark, sf_dir)
    exact = {
        (r.query_id, r.vec_id): r.cos_sim
        for r in cosine_topk(emb, queries, k=500).collect()
    }
    for r in QUERIES["sim_ann_pq"](spark, sf_dir).collect():
        assert exact[(r.query_id, r.vec_id)] == r.cos_sim


def test_embed_normalize_guards_zero_norm_and_null_elements(spark):
    """The zero-norm filter and NULL-element skip are dead branches on the
    fixture — pin them on literals: a zero vector drops entirely, a
    NULL-element vector keeps its norm over the non-null dims (DuckDB
    list_aggregate semantics) and surfaces NULL unit_val for the null dim."""
    from pyspark.sql import Row, functions as F
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", __import__("pyspark").sql.types.IntegerType()),
        ]
    )
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.0, 0.0], label=0),      # zero norm
            Row(vec_id=2, embedding=[3.0, None, 4.0], label=0),  # null element
            Row(vec_id=3, embedding=[1.0, 0.0], label=0),
        ],
        schema,
    )
    df.createOrReplaceTempView("_embed_guard_src")

    # run the same expressions the declared query uses, on the literal df
    v = F.col("embedding").cast("array<double>")
    nrm = F.aggregate(
        F.filter(v, lambda x: x.isNotNull()), F.lit(0.0), lambda a, x: a + x * x
    )
    base = df.select("vec_id", v.alias("_v"), nrm.alias("_n")).filter(F.col("_n") > 0)
    out = base.select("vec_id", F.posexplode("_v").alias("dim", "val"), "_n").select(
        "vec_id", "dim", F.round(F.col("val") / F.sqrt("_n"), 6).alias("unit_val")
    )
    rows = {(r.vec_id, r.dim): r.unit_val for r in out.collect()}
    assert not any(k[0] == 1 for k in rows)  # zero vector filtered
    assert rows[(2, 0)] == 0.6 and rows[(2, 2)] == 0.8  # norm over non-nulls = 5
    assert rows[(2, 1)] is None  # null dim surfaces as NULL
    assert rows[(3, 0)] == 1.0 and rows[(3, 1)] == 0.0


def test_cosine_pairs_blocked_matches_collect_reference(spark):
    """The distributed block-grid all-pairs path must reproduce the
    collect-based reference (`cosine_pairs_vectorized`) bit-for-bit —
    same pairs, same 6dp similarities — including across block counts
    (a pair must land in exactly ONE grid cell, any B)."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_vectorized,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    ref = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_vectorized(emb, threshold=0.4).collect()
    }
    assert ref, "fixture should contain qualifying pairs at 0.4"
    for n_blocks in (1, 3, 8):
        got = {
            (r.key_a, r.key_b): r.cos_sim
            for r in cosine_pairs_blocked(
                emb, threshold=0.4, n_blocks=n_blocks
            ).collect()
        }
        assert got == ref, f"block-grid mismatch at B={n_blocks}"


def test_cosine_pairs_lsh_planted_near_dups(spark):
    """High-threshold near-dup recall: plant exact perturbation twins of
    existing vectors (cos ≈ 0.999) and require the LSH candidate path to
    recover every planted pair at (8 planes, 8 tables) — the parameter
    regime where bucketing actually prunes (~2^8 per table)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_lsh,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.select("vec_id", "embedding").limit(40).collect()
    planted, twins = [], []
    for r in base:
        twin_id = r.vec_id + 1_000_000
        vec = [float(x) for x in r.embedding]
        twin = vec[:]
        twin[0] += 0.01  # tiny perturbation: cos ≈ 0.999+
        planted.append((r.vec_id, vec))
        planted.append((twin_id, twin))
        twins.append((min(r.vec_id, twin_id), max(r.vec_id, twin_id)))
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    df = spark.createDataFrame(planted, schema)
    out = cosine_pairs_lsh(
        df, threshold=0.95, num_planes=8, num_tables=8
    ).collect()
    found = {(r.key_a, r.key_b) for r in out}
    missed = set(twins) - found
    assert not missed, f"LSH missed planted near-dup pairs: {missed}"
    for r in out:
        assert r.cos_sim >= 0.95


def test_srp_hashed_matches_hof_lsh_bucket(spark):
    """The vectorized SRP hasher (numpy matmul against the JVM-derived
    weight matrix) must produce the same (table, bucket) assignments as
    the HOF `lsh_bucket` form it replaced — the weights come from the
    same xxhash64(p, d) parity, so any drift is a real bug (sub-ulp sign
    flips at proj == 0 excepted; none occur on this fixture)."""
    from pyspark.sql import functions as F2

    from openmrs_patient_migration_script_spark.operators.similarity import (
        _as_double,
        lsh_bucket,
        srp_hashed,
    )

    m, L = 3, 4
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    v = _as_double(F2.col("embedding"))
    hof = emb.select(
        "vec_id",
        *[lsh_bucket(v, m, plane_offset=t * m).alias(f"b{t}") for t in range(L)],
    ).collect()
    want = {
        (r.vec_id, t, r[f"b{t}"]) for r in hof for t in range(L)
    }
    got = {
        (r.vec_id, r._tbl, r._bkt)
        for r in srp_hashed(emb, "vec_id", m, L).collect()
    }
    assert got == want


def test_kmeans_fit_improves_objective_and_feeds_ivf(spark):
    """Distributed spherical k-means: (a) a 0-iteration fit returns the
    same deterministic seeds ivf_topk uses; (b) the mean best-cosine
    objective is non-decreasing over iterations (Lloyd's guarantee);
    (c) trained centroids plug into ivf_topk and keep recall at or above
    the untrained quantizer on the same queries."""
    import numpy as np

    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_fit,
    )

    emb, queries = _split(spark)

    def objective(cent):
        C = np.array(cent, dtype=np.float64)
        X = np.array(
            [r.embedding for r in emb.select("embedding").collect()],
            dtype=np.float64,
        )
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return float(np.max(Xn @ C.T, axis=1).mean())

    c0 = kmeans_fit(emb, n_cells=8, n_iter=0)
    c2 = kmeans_fit(emb, n_cells=8, n_iter=2)
    c5 = kmeans_fit(emb, n_cells=8, n_iter=5)
    assert len(c0) == 8 and len(c0[0]) == 64
    o0, o2, o5 = objective(c0), objective(c2), objective(c5)
    assert o2 >= o0 - 1e-9, f"objective regressed: {o0} -> {o2}"
    assert o5 >= o2 - 1e-9, f"objective regressed: {o2} -> {o5}"
    assert o5 > o0, "training never improved the quantizer"

    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=5).collect()
    }
    untrained = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    }
    trained = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, queries, k=5, nprobe=4, centroids=c5).collect()
    }
    r_untrained = len(exact & untrained) / len(exact)
    r_trained = len(exact & trained) / len(exact)
    # trained coarse quantizer must not hurt recall (usually helps:
    # balanced cells make nprobe cover more true neighbors)
    assert r_trained >= r_untrained - 0.05, (r_untrained, r_trained)


def test_mmr_rerank_trades_relevance_for_diversity(spark):
    """Corpus: a tight near-duplicate cluster (mutually ~identical, all
    moderately relevant) plus an equally-relevant vector in a DIFFERENT
    neighborhood. Plain top-3 is all-cluster; MMR's second pick must jump
    to the outsider because the max-sim penalty crushes the near-copies
    of pick 1."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk_vectorized,
        mmr_rerank,
    )

    pad = [0.0] * 6
    rows = [
        (100, [1.0, 0.0] + pad),      # the query
        (1, [0.82, 0.57] + pad),      # near-dup cluster, rel ~0.82
        (2, [0.79, 0.61] + pad),      # rel ~0.79, sim-to-1 ~1
        (3, [0.81, 0.59] + pad),      # rel ~0.81, sim-to-1 ~1
        (4, [0.75, -0.66] + pad),     # rel ~0.75, sim-to-1 ~0.24
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = emb.filter("vec_id = 100").select(
        emb.vec_id.alias("query_id"), "embedding"
    )
    plain = [r.vec_id for r in
             cosine_topk_vectorized(emb, queries, k=3)
             .orderBy("cos_sim", ascending=False).collect()]
    assert plain == [1, 3, 2]  # top-3 is the whole near-dup cluster
    mmr = {r.mmr_rank: r.vec_id for r in
           mmr_rerank(emb, queries, k_candidates=4, k_select=3).collect()}
    assert mmr[1] == 1          # best hit keeps slot 1
    assert mmr[2] == 4          # slot 2 jumps neighborhoods
    assert mmr[3] in (2, 3)     # cluster resumes afterwards


def test_semantic_dedup_drops_within_cluster_duplicates(spark):
    from openmrs_patient_migration_script_spark.operators.similarity import (
        semantic_dedup,
    )

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.98, 0.199] + [0.0] * (dim - 2)   # cos(base, near) ~ 0.98
    ortho = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)
    rows = [(1, base), (2, near), (3, ortho), (4, base)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(df, n_clusters=2, threshold=0.9).collect()
    }
    # 1 is the lowest-id member of its neighborhood -> kept
    assert out[1]["kept"] is True and out[1]["n_dup_lower"] == 0
    # 4 is an exact copy of 1; 2 is a near-copy: both dropped IF they
    # landed in 1's cluster (with 2 seeds from 4 vectors they do unless
    # the seed order separates them — pin the semantics, not the seeds)
    same_cell = {k: v["cell"] for k, v in out.items()}
    for vid in (2, 4):
        if same_cell[vid] == same_cell[1]:
            assert out[vid]["kept"] is False and out[vid]["n_dup_lower"] >= 1
    # the orthogonal vector is never anyone's duplicate
    assert out[3]["kept"] is True


def test_semantic_dedup_cluster_bound_fails_loud(spark):
    import pytest as _pytest

    from openmrs_patient_migration_script_spark.operators.similarity import (
        semantic_dedup,
    )

    df = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(10)], ["vec_id", "embedding"]
    )
    with _pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(
            df, n_clusters=1, threshold=0.99, max_cluster_rows=5
        ).collect()


def test_knn_graph_exact_and_candidate_paths(spark):
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_lsh,
        knn_graph,
    )

    dim = 8
    rows = [
        (1, [1.0, 0.0, 0.0] + [0.0] * (dim - 3)),
        (2, [0.9, 0.1, 0.0] + [0.0] * (dim - 3)),   # closest to 1
        (3, [0.0, 1.0, 0.0] + [0.0] * (dim - 3)),
        (4, [0.0, 0.0, 1.0] + [0.0] * (dim - 3)),   # orthogonal to all
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    g = knn_graph(df, k=2).collect()
    by_key = {}
    for r in g:
        by_key.setdefault(r["key"], []).append(r)
    # every node gets exactly k=2 ranked neighbors (n-1 >= k here)
    assert all(len(v) == 2 for v in by_key.values())
    assert all(
        [x["rank"] for x in sorted(v, key=lambda x: x["rank"])] == [1, 2]
        for v in by_key.values()
    )
    # 1's nearest is 2 and vice versa; the graph is symmetric in pairs
    top1 = {k: min(v, key=lambda x: x["rank"])["neighbor"] for k, v in by_key.items()}
    assert top1[1] == 2 and top1[2] == 1
    # candidates hook: ranking restricted to LSH candidate pairs only
    cand = cosine_pairs_lsh(df, threshold=0.5, num_planes=2, num_tables=4)
    g2 = knn_graph(df, k=2, candidates=cand)
    assert set(g2.columns) == {"key", "neighbor", "cos_sim", "rank"}
    assert g2.filter("rank > 2").count() == 0


def test_semantic_dedup_far_centroid_keeps_edge_example(spark):
    import pytest as _pytest

    from openmrs_patient_migration_script_spark.operators.similarity import (
        semantic_dedup,
    )

    dim = 4
    # three near-duplicates along e1; id 3 sits FURTHEST from the group
    # centroid, so far_centroid must keep 3 (min_id would keep 1)
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.0447, 0.0, 0.0]),
        (3, [0.97, 0.2431, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    far = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, n_clusters=1, threshold=0.97, keep="far_centroid"
        ).collect()
    }
    assert far[3] is True and far[1] is False and far[2] is False
    mid = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, n_clusters=1, threshold=0.97, keep="min_id"
        ).collect()
    }
    assert mid[1] is True and mid[2] is False and mid[3] is False
    with _pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(df, keep="random")


def test_sim_ann_recall_certification_bounds(spark):
    """The recall certification must report one row per query with
    n_exact == K and recall in [0, 1]; and its recall must equal a
    direct set-intersection recomputation from the two underlying
    queries."""
    from openmrs_patient_migration_script_spark.plans.similarity_queries import (
        _K,
        sim_ann_lsh,
        sim_ann_recall,
        sim_cosine_topk,
    )

    sf = "/root/testdata/sf0.001"
    rows = sim_ann_recall(spark, sf).collect()
    assert rows and all(r["n_exact"] == _K for r in rows)
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    exact = {}
    for r in sim_cosine_topk(spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    ann = {}
    for r in sim_ann_lsh(spark, sf).collect():
        ann.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in rows:
        want = len(exact[r["query_id"]] & ann.get(r["query_id"], set()))
        assert r["n_hits"] == want

def test_ivf_recall_certification_matches_recomputation(spark):
    """`sim_ivf_recall` must report one row per query with n_exact == K,
    recall in [0, 1], and n_hits equal to a direct set-intersection
    recomputation from the two underlying declared queries."""
    from openmrs_patient_migration_script_spark.plans import QUERIES
    from openmrs_patient_migration_script_spark.plans.similarity_queries import (
        _K,
        sim_ivf_recall,
    )

    sf = "/root/testdata/sf0.001"
    rows = sim_ivf_recall(spark, sf).collect()
    assert rows and all(r["n_exact"] == _K for r in rows)
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    exact = {}
    for r in QUERIES["sim_cosine_topk"](spark, sf).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    ann = {}
    for r in QUERIES["sim_ann_ivf"](spark, sf).collect():
        ann.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in rows:
        want = len(exact[r["query_id"]] & ann.get(r["query_id"], set()))
        assert r["n_hits"] == want


def test_cosine_pairs_blocked_candidates_hook_matches_exact(spark):
    """The `candidates=` hook (the 100 TB pruned form) must emit the
    byte-identical contract as the exact block-grid on a high-threshold
    fixture where the candidate set covers every qualifying pair: same
    pairs, same 6dp cos_sim — one shared `exact_rerank_pairs` scoring
    tail, so pruned and exact paths cannot drift apart. Also pins that
    the hook ignores orientation/duplicates in the candidate list."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_lsh,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    thr = 0.9
    exact = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_blocked(emb, threshold=thr).collect()
    }
    # recall-complete candidates: every unordered pair, deliberately fed
    # in REVERSED orientation and duplicated, to pin canonicalization
    ids = emb.select(F.col("vec_id"))
    cand = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.vec_id") > F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("key_a"), F.col("b.vec_id").alias("key_b")
        )
    )
    cand = cand.unionByName(cand)
    hook = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_blocked(
            emb, threshold=thr, candidates=cand
        ).collect()
    }
    assert hook == exact
    # and the realistic pruned form: LSH candidates at a near-dup
    # threshold stay inside the exact pair set with the same scores
    lsh = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_blocked(
            emb,
            threshold=thr,
            candidates=cosine_pairs_lsh(
                emb, threshold=thr, num_planes=8, num_tables=8
            ),
        ).collect()
    }
    assert set(lsh) <= set(exact)
    assert all(exact[p] == s for p, s in lsh.items())


def test_cosine_pairs_hook_matches_grid_at_low_threshold(spark):
    """r9 (r8-verdict follow-up): the hook parity above runs at a
    near-dup threshold (0.9); this is the complementary pin at the
    DECLARED low threshold (0.4, `dedup_embedding`'s contract), where
    far more pairs qualify and any threshold-dependent drift in the
    shared `exact_rerank_pairs` tail would surface. A full candidate
    set through the hook must equal the block-grid byte-for-byte —
    proving the rerank tail is threshold-independent, so swapping in a
    pruned candidate source at scale changes recall only, never
    scoring."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_blocked,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    thr = 0.4
    exact = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_blocked(emb, threshold=thr).collect()
    }
    assert exact, "fixture must produce pairs at the declared threshold"
    ids = emb.select(F.col("vec_id"))
    cand = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a.vec_id") > F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("key_a"), F.col("b.vec_id").alias("key_b")
        )
    )
    hook = {
        (r.key_a, r.key_b): r.cos_sim
        for r in cosine_pairs_blocked(
            emb, threshold=thr, candidates=cand
        ).collect()
    }
    assert hook == exact


def test_cosine_radius_search_planted_twins_and_self_exclusion(spark):
    """Radius search must return EVERY vector over the threshold (the
    recall-completeness top-k truncates away), never a self-match, and
    agree with the top-k path's 6dp scores on shared pairs."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_radius_search,
    )

    dim = 8
    rows = [
        (1, [1.0, 0.0] + [0.0] * (dim - 2)),
        (2, [0.999, 0.01] + [0.0] * (dim - 2)),   # twin of 1
        (3, [0.98, 0.05] + [0.0] * (dim - 2)),    # also near 1
        (4, [0.0, 1.0] + [0.0] * (dim - 2)),      # orthogonal
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id = 1").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_radius_search(df, q, threshold=0.9).collect()
    ids = {r.vec_id for r in got}
    assert ids == {2, 3}, f"expected both near vectors, got {ids}"
    assert all(r.query_id == 1 and r.cos_sim >= 0.9 for r in got)
    # k=1 top-k would have returned only vec 2 — radius keeps 3 too
    assert len(got) == 2


def test_band_sweep_candidates_are_monotone_in_bands(spark):
    """Banding refinement invariant: agreeing on an 8-row band implies
    agreeing on both 4-row halves, so the candidate-pair set can only
    GROW as bands increase — (2,8) ⊆ (4,4) ⊆ (8,2) ⊆ (16,1). A broken
    slice indexing in _band_buckets would violate this immediately."""
    from openmrs_patient_migration_script_spark.plans import QUERIES

    rows = [r.asDict() for r in
            QUERIES["dedup_minhash_band_sweep"](
                spark, "/root/testdata/sf0.001").collect()]
    by_bands = {r["bands"]: r for r in rows}
    assert sorted(by_bands) == [2, 4, 8, 16]
    for lo, hi in [(2, 4), (4, 8), (8, 16)]:
        assert (
            by_bands[lo]["n_candidate_pairs"] <= by_bands[hi]["n_candidate_pairs"]
        ), f"candidates must be monotone: bands={lo} vs {hi}"
    # the bucket-pair workload bounds the distinct candidates from above
    for r in rows:
        assert r["n_candidate_pairs"] <= r["n_bucket_pairs"]
        assert r["max_bucket_docs"] >= 1


def test_hard_negatives_mask_excludes_same_label(spark):
    """Hard-negative contract: every returned candidate has a DIFFERENT
    label than its query, the nearest same-label twin is skipped in
    favor of the nearest cross-label vector, and results match a
    DataFrame-only reference (join + label filter + rank window)."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk_vectorized,
    )

    dim = 8
    rows = [
        # query: label 0
        (0, 0, [1.0, 0.0] + [0.0] * (dim - 2)),
        # same-label twin — nearest overall, must be masked
        (1, 0, [0.999, 0.02] + [0.0] * (dim - 2)),
        # cross-label near vector — the true hard negative
        (2, 1, [0.98, 0.05] + [0.0] * (dim - 2)),
        # cross-label, farther
        (3, 1, [0.5, 0.8] + [0.0] * (dim - 2)),
        (4, 2, [0.0, 1.0] + [0.0] * (dim - 2)),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    q = df.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "label", "embedding"
    )
    got = cosine_topk_vectorized(
        df, q, k=2, exclude_label_col="label"
    ).collect()
    ids = [r.vec_id for r in got]
    assert ids == [2, 3], f"expected cross-label nearest [2, 3], got {ids}"
    labels = dict((r.vec_id, r.label) for r in df.collect())
    assert all(labels[r.vec_id] != 0 for r in got)

    # tiny-batch leak check: with k larger than the cross-label pool the
    # sentinel rows must be filtered, not surface as fake candidates
    got_all = cosine_topk_vectorized(
        df, q, k=10, exclude_label_col="label"
    ).collect()
    assert {r.vec_id for r in got_all} == {2, 3, 4}
    assert all(r.cos_sim >= -1.0 for r in got_all)


def test_quantize_int8_roundtrip_and_saturation(spark):
    """int8 ledger semantics on a hand-built column: a dim whose values
    are exact code multiples has zero error energy, the absmax row
    saturates (|code| = 127), and an all-zero dim yields code 0 with
    amax 0 (no division blow-up)."""
    from openmrs_patient_migration_script_spark.plans import QUERIES
    import tempfile, os

    dim0 = [127.0 / 1e6 * 127, -127.0 / 1e6 * 127, 0.0, 127.0 / 1e6]
    # dim0 scaled: sv = round(v*1e6) = {16129, -16129, 0, 127};
    # amax = 16129 = 127*127 -> every sv is an exact multiple of
    # amax/127 = 127 -> all errors 0; first row saturates at code 127
    rows = [
        (i, [dim0[i], 0.0], 0) for i in range(4)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["vec_id", "embedding", "label"]
        ).select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
            "label",
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {
            r.dim: r
            for r in QUERIES["embed_quantize_int8"](spark, d).collect()
        }
    assert out[0].amax_micro == 16129
    assert out[0].sse_num == 0, "exact code multiples must have 0 error"
    assert out[0].n_sat == 2  # +absmax and -absmax rows both saturate
    assert out[0].sum_abs_code == 127 + 127 + 0 + 1
    assert out[1].amax_micro == 0 and out[1].sum_abs_code == 0
    assert out[1].sse_num == 0 and out[1].n_sat == 0


@pytest.mark.slow
def test_matryoshka_overlap_planted_prefix_flip(spark):
    """Truncation-recall semantics: a corpus where the full-dim nearest
    neighbor differs from the prefix-dim nearest neighbor must report
    the overlap loss; a corpus whose information lives entirely in the
    prefix reports full overlap."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk_vectorized,
    )

    def overlap(emb_rows, k, prefix):
        df = spark.createDataFrame(emb_rows, ["vec_id", "embedding"])
        q = df.filter("vec_id = 0").select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        full = cosine_topk_vectorized(df, q, k=k)
        p_df = df.select("vec_id", F.slice("embedding", 1, prefix).alias("embedding"))
        p_q = q.select("query_id", F.slice("embedding", 1, prefix).alias("embedding"))
        pref = cosine_topk_vectorized(p_df, p_q, k=k)
        a = {r.vec_id for r in full.collect()}
        b = {r.vec_id for r in pref.collect()}
        return len(a & b)

    # information in the tail: full-dim neighbor is 1 (matches the tail),
    # prefix-2 neighbor is 2 (matches the head) -> overlap 0
    flip = [
        (0, [1.0, 0.0, 5.0, 5.0]),
        (1, [-1.0, 0.5, 5.0, 5.0]),   # same tail, opposite head
        (2, [1.0, 0.01, -5.0, -5.0]),  # same head, opposite tail
    ]
    assert overlap(flip, k=1, prefix=2) == 0
    # information entirely in the prefix -> overlap k
    stable = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    assert overlap(stable, k=1, prefix=2) == 1


def test_quantize_recall_invariance_and_collapse(spark, tmp_path):
    """Precision-recall certification semantics: (a) a corpus whose
    micro-components are all exact code multiples reconstructs
    proportionally, so int8 search returns the identical top-k
    (n_overlap == k); (b) six candidates distinguished only by a
    sub-half-step component collapse to one reconstruction cell — the
    quantized ranking degenerates to the id tie-break and provably
    kicks the true nearest-but-highest-id vector out of the top-5
    (n_overlap == 4)."""
    import os

    from openmrs_patient_migration_script_spark.plans import QUERIES

    def run(rows, subdir):
        d = tmp_path / subdir
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        ).select(
            "vec_id",
            F.col("embedding").cast("array<float>").alias("embedding"),
            "label",
        ).write.parquet(os.path.join(str(d), "embeddings.parquet"))
        return {
            r.query_id: r.n_overlap
            for r in QUERIES["embed_quantize_recall"](spark, str(d)).collect()
        }

    # (a) all |sv| <= amax = 127 micro on both dims -> code == sv, the
    # reconstruction is exactly 127x the original vector
    exact = [
        (i, [127e-6, x * 1e-6], 0)
        for i, x in enumerate([0, 9, 23, 41, 67, 88, 105, 127])
    ]
    got = run(exact, "exact")
    assert got[0] == 5, f"exact-multiple corpus must keep top-5, got {got[0]}"

    # (b) dim-2 outlier sets amax to 12.7 (half-step 0.05): the six
    # near vectors' dim-2 components (0.002..0.046) all quantize to 0.
    # Exact top-5 of query [1, 0.04] excludes id1 (farthest, d=0.002);
    # the quantized tie excludes id6 (highest id) instead.
    near_d = {1: 0.002, 2: 0.012, 3: 0.022, 4: 0.03, 5: 0.046, 6: 0.04}
    collapse = [(0, [1.0, 0.04], 0)] + [
        (i, [1.0, d], 0) for i, d in near_d.items()
    ] + [(100, [0.0, 12.7], 0)]
    got = run(collapse, "collapse")
    assert got[0] == 4, f"collapse corpus must lose exactly one, got {got[0]}"


def test_multiprobe_superset_and_recall(spark):
    """Multi-probe invariants at equal (m, L): the probed candidate
    top-k can only be built from a SUPERSET of the unprobed candidates,
    so probed recall vs the exact top-k is >= plain recall; and the
    half-tables probed config must reach at least the recall of plain
    LSH at the same halved table count."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_topk,
    )

    emb, queries = _split(spark)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }

    def recall(**kw):
        got = {
            (r.query_id, r.vec_id)
            for r in ann_topk_lsh(
                emb, queries, k=5, hash_mode="md5", **kw
            ).collect()
        }
        return len(exact & got) / len(exact)

    plain_4 = recall(num_planes=3, num_tables=4)
    probed_4 = recall(num_planes=3, num_tables=4, multiprobe=True)
    assert probed_4 >= plain_4, (probed_4, plain_4)
    # measured on this fixture: plain(3,4) 0.66, probed(3,4) 0.98,
    # plain(3,8) 0.84 — probing half the tables beats doubling them
    assert probed_4 >= 0.7, f"probed recall {probed_4:.2f} below floor"


def test_dedup_embedding_lsh_superset_of_threshold_pairs(spark, tmp_path):
    """The promoted LSH pair path must find EVERY exact threshold pair
    on the planted-twin fixture (the superset-of-threshold-pairs pin the
    r9 verdict asked for): LSH output ⊆ exact by the shared re-rank
    contract, and ⊇ exact because a ~0.999-cosine twin misses all 8
    tables with probability ~1e-8 — so the sets are EQUAL here."""
    import numpy as np

    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_blocked,
    )
    from openmrs_patient_migration_script_spark.plans.dedup_queries import (
        _EMB_LSH_THRESHOLD,
        _EMB_TWIN_OFFSET,
        dedup_embedding_lsh,
    )

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(64).astype(np.float32)])
        for i in range(40)
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    lsh = {
        (r.key_a, r.key_b)
        for r in dedup_embedding_lsh(spark, str(tmp_path)).collect()
    }
    # rebuild the same twin corpus and run the exact block-grid on it
    base = spark.read.parquet(str(tmp_path / "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + _EMB_TWIN_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x * F.when(i % 2 == 0, F.lit(1.05)).otherwise(F.lit(0.95)),
        ).alias("embedding"),
    )
    exact = {
        (r.key_a, r.key_b)
        for r in cosine_pairs_blocked(
            base.unionByName(pert), threshold=_EMB_LSH_THRESHOLD
        ).collect()
    }
    assert exact, "fixture must plant at least the twin pairs"
    assert lsh == exact
    # every planted twin qualifies
    assert {(i, i + _EMB_TWIN_OFFSET) for i in range(40)} <= exact
