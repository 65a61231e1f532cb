"""r11 optimization-round pins: every change is a plan/job-count
optimization that must be RESULT-INVISIBLE. Each test compares the
optimized path against the semantics it memoizes or gates:

- fixpoint early-stops (ktruss / k_core / sssp_bounded) return
  bit-identical tables at any round count past convergence;
- louvain's broadcast gate fallback (threshold 0 = never broadcast)
  changes nothing but the join strategy;
- inclusion_audit's lazy one-action form reports the same exact counts;
- knn_graph's candidates_materialized flag only skips a redundant
  checkpoint.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ktruss_early_stop_matches_deep_round_count(spark):
    """The stride fixture converges in <= 3 peels; 30 rounds must return
    the identical support table (early-stop = pure memoization)."""
    from openmrs_patient_migration_script_spark.operators.graph import ktruss

    edges = [(u, u + d) for u in range(1, 60) for d in (1, 2, 3)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    a = _rows(ktruss(df, k=4, n_rounds=3))
    b = _rows(ktruss(df, k=4, n_rounds=30))
    assert a == b and len(a) > 0


def test_k_core_early_stop_matches_deep_round_count(spark):
    """A 5-clique with a pendant chain: the chain peels in 2 rounds and
    the clique survives; 60 rounds must equal 6."""
    from openmrs_patient_migration_script_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    chain = [(5, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(clique + chain, "key_a long, key_b long")
    a = _rows(k_core(df, k=2, n_rounds=6))
    b = _rows(k_core(df, k=2, n_rounds=60))
    assert a == b
    assert {r[0] for r in a} == {1, 2, 3, 4, 5}


def test_k_core_assume_canonical_matches_default(spark):
    from openmrs_patient_migration_script_spark.operators.graph import k_core

    canon = [(1, 2), (1, 3), (2, 3), (3, 4)]
    df = spark.createDataFrame(canon, "key_a long, key_b long")
    messy = spark.createDataFrame(
        canon + [(2, 1), (3, 1), (4, 4)], "key_a long, key_b long"
    )
    assert _rows(
        k_core(df, k=2, n_rounds=4, assume_canonical=True)
    ) == _rows(k_core(messy, k=2, n_rounds=4))


def test_sssp_early_stop_matches_deep_hop_count(spark):
    """A 4-node path converges in 3 relaxations; 30 hops must return the
    identical distance table."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        sssp_bounded,
    )

    df = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (3, 4, 2), (1, 3, 10)],
        "key_a long, key_b long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    a = _rows(sssp_bounded(df, seeds, max_hops=3))
    b = _rows(sssp_bounded(df, seeds, max_hops=30))
    assert a == b
    got = dict(a)
    assert got == {1: 0, 2: 5, 3: 6, 4: 8}


def test_louvain_no_broadcast_gate_matches_default(spark):
    """broadcast_threshold=0 forces the shuffle-join fallback on every
    node-sized attach; labels and ledger must be bit-identical."""
    from openmrs_patient_migration_script_spark.operators.graph import louvain

    edges = (
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
        + [(4, 5)]
    )
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    out_b, led_b = louvain(df, n_passes=3, return_ledger=True)
    out_s, led_s = louvain(
        df, n_passes=3, return_ledger=True, broadcast_threshold=0
    )
    assert _rows(out_b) == _rows(out_s)
    assert led_b == led_s == [(1, 162, True), (2, 286, True), (3, 286, True)]


def test_inclusion_audit_exact_counts(spark):
    """The lazy one-action form reports the same exact counts the
    checkpointed form did (3 contained of 4 distinct child keys; NULLs
    excluded on both sides)."""
    from openmrs_patient_migration_script_spark.operators.quality import (
        inclusion_audit,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (9,), (None,)], "k long"
    )
    parent = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (None,)], "p long"
    )
    row = inclusion_audit(child, "k", parent, "p", "c->p").collect()[0]
    assert (
        row["n_child_distinct"],
        row["n_parent_distinct"],
        row["n_contained"],
        row["is_inclusion"],
    ) == (4, 4, 3, False)
    full = inclusion_audit(
        child.filter("k < 9"), "k", parent, "p", "ok"
    ).collect()[0]
    assert full["is_inclusion"] is True


def test_knn_graph_materialized_flag_is_result_invisible(spark):
    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_pairs_lsh,
        knn_graph,
    )

    import math

    vecs = [
        (i, [math.cos(i * 0.7 + d) for d in range(8)]) for i in range(12)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cand = cosine_pairs_lsh(
        emb, threshold=-1.0, num_planes=2, num_tables=4, hash_mode="md5"
    ).localCheckpoint(eager=True)
    a = _rows(knn_graph(emb, k=3, candidates=cand))
    b = _rows(knn_graph(emb, k=3, candidates=cand, candidates_materialized=True))
    assert a == b and len(a) > 0


def test_wedge_family_broadcast_gate_is_result_invisible(spark):
    """The r11 wedge-machinery broadcast gate (edge_support /
    triangle_count / clustering_coefficient / common_neighbors /
    truss_decomposition): threshold 0 (never broadcast, the pure
    shuffle-join regime) must return bit-identical tables to the
    default gated path on a mixed-density fixture."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        clustering_coefficient,
        common_neighbors,
        edge_support,
        triangle_count,
        truss_decomposition,
    )

    edges = [(u, u + d) for u in range(1, 40) for d in (1, 2, 3)]
    edges += [(u, 2 * u) for u in range(1, 20)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    for op, kw in [
        (edge_support, {}),
        (triangle_count, {}),
        (clustering_coefficient, {}),
        (common_neighbors, {"max_degree": None}),
        (truss_decomposition, {"max_k": 4, "n_rounds": 2}),
    ]:
        gated = _rows(op(df, **kw))
        shuffled = _rows(op(df, broadcast_threshold=0, **kw))
        assert gated == shuffled and len(gated) > 0, op.__name__


def test_edge_support_gate_broadcasts_under_and_shuffles_over(spark):
    """Plan pin: under the gate the wedge joins are BroadcastHashJoin;
    with threshold 0 the same joins carry Exchange hashpartitioning."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        edge_support,
    )

    edges = [(u, u + d) for u in range(1, 30) for d in (1, 2)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    plan_on = edge_support(df)._jdf.queryExecution().executedPlan().toString()
    plan_off = (
        edge_support(df, broadcast_threshold=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan_on
    assert "SortMergeJoin" in plan_off or "ShuffledHashJoin" in plan_off


def test_iterative_family_broadcast_gate_is_result_invisible(spark):
    """The r11 iterative-loop broadcast gate (pagerank / sssp_bounded /
    bfs_hops / k_core): threshold 0 (never broadcast, the pure
    shuffle-join regime) must return bit-identical tables to the
    default gated path on a mixed-density fixture with seeds."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        bfs_hops,
        k_core,
        pagerank,
        sssp_bounded,
    )

    edges = [(u, u + d) for u in range(1, 40) for d in (1, 2, 3)]
    edges += [(u, 2 * u) for u in range(1, 20)]
    df = spark.createDataFrame(edges, "key_a long, key_b long")
    wdf = df.withColumn(
        "w", (F.col("key_a") + F.col("key_b")) % 5 + F.lit(1)
    )
    seeds = df.select(F.col("key_a").alias("node")).filter(
        F.col("node") % 7 == 0
    )
    for name, run in [
        ("pagerank", lambda t: pagerank(df, n_iter=3, broadcast_threshold=t)),
        (
            "ppr",
            lambda t: pagerank(
                df, n_iter=3, seeds=seeds, broadcast_threshold=t
            ),
        ),
        (
            "sssp",
            lambda t: sssp_bounded(
                wdf, seeds, max_hops=3, broadcast_threshold=t
            ),
        ),
        ("bfs", lambda t: bfs_hops(df, seeds, max_hops=3, broadcast_threshold=t)),
        ("k_core", lambda t: k_core(df, k=3, n_rounds=4, broadcast_threshold=t)),
    ]:
        gated = _rows(run(5_000_000))
        shuffled = _rows(run(0))
        assert gated == shuffled and len(gated) > 0, name


def test_modularity_fused_agg_matches_manual_recompute(spark):
    """The r11 fused degree/intra aggregation in `modularity`: one
    explode-based community agg must equal a hand-computed per-community
    (n_nodes, degree_sum, intra_edges) on a planted two-community
    fixture with a bridge edge."""
    from openmrs_patient_migration_script_spark.operators.graph import (
        modularity,
    )

    # K4 on {1..4}, K3 on {10..12}, bridge 4-10
    block = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    block += [(a, b) for a in range(10, 13) for b in range(a + 1, 13)]
    block += [(4, 10)]
    edges = spark.createDataFrame(block, "key_a long, key_b long")
    labels = spark.createDataFrame(
        [(n, 1) for n in range(1, 5)] + [(n, 2) for n in range(10, 13)],
        "node long, community long",
    )
    got = {
        r["community"]: (r["n_nodes"], r["degree_sum"], r["intra_edges"])
        for r in modularity(edges, labels).collect()
    }
    # m=10; community 1: 4 nodes, degrees 3+3+3+4=13, intra=6 (K4);
    # community 2: 3 nodes, degrees 3+2+2=7, intra=3 (K3)
    assert got == {1: (4, 13, 6), 2: (3, 7, 3)}


def test_mmr_candidates_passthrough_is_result_invisible(spark):
    """The r11 shared-scoring-pass rewrite of `sim_mmr_diversity`:
    mmr_rerank fed a precomputed (checkpointed) exact candidate table
    must equal mmr_rerank computing the same table internally."""
    import math

    from openmrs_patient_migration_script_spark.operators.similarity import (
        cosine_topk_vectorized,
        mmr_rerank,
    )

    vecs = [
        (i, [math.cos(i * 0.9 + d * 0.3) for d in range(6)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 9 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cands = cosine_topk_vectorized(emb, queries, k=8).localCheckpoint(
        eager=True
    )
    a = _rows(mmr_rerank(emb, queries, k_candidates=8, k_select=4))
    b = _rows(
        mmr_rerank(emb, queries, k_candidates=8, k_select=4, candidates=cands)
    )
    assert a == b and len(a) > 0


def test_normalized_binding_matches_naive_division(spark):
    """The r11 one-element-binding rewrite of `normalized()`: binding the
    norm once per row must emit the exact doubles of the naive
    transform(v, x -> x / n) form (same IEEE divisions, only the
    evaluation count changes)."""
    from openmrs_patient_migration_script_spark.operators.similarity import (
        _as_double,
        normalized,
    )

    vecs = [
        (i, [((i * 7 + d * 3) % 13) - 6.0 for d in range(16)])
        for i in range(1, 200)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    v = _as_double(F.col("embedding"))
    n = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x
        )
    )
    naive = df.select("vec_id", F.transform(v, lambda x: x / n).alias("nv"))
    opt = df.select("vec_id", normalized(F.col("embedding")).alias("nv"))
    assert _rows(opt) == _rows(naive)


def test_interpolate_segment_binding_matches_inline_form(spark):
    """The r11 hoist of interpolate_linear's per-segment length: grid
    values must equal the pre-hoist inline-size(sequence(...)) form
    bit-for-bit (identical int64 numerators, one double division)."""
    from pyspark.sql import functions as F2

    from openmrs_patient_migration_script_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = []
    for key in (1, 2):
        for h, val in [(0, 10.0), (5, 4.5), (6, -2.25), (13, 100.0)]:
            rows.append((key, f"2024-03-01 0{h}:17:00" if h < 10
                         else f"2024-03-01 {h}:17:00", val + key))
    df = spark.createDataFrame(rows, "user_id long, ts string, value double")
    df = df.select("user_id", F2.to_timestamp("ts").alias("ts"), "value")
    got = interpolate_linear(df, "user_id", "ts", "value")
    interval = "interval 1 hour"
    obs = df.groupBy(
        F2.col("user_id").alias("key"),
        F2.date_trunc("hour", F2.col("ts")).alias("bucket"),
    ).agg(
        F2.sum(F2.round(F2.col("value") * F2.lit(1_000_000)).cast("long")).alias("vs")
    )
    per_key = obs.groupBy("key").agg(
        F2.sort_array(F2.collect_list(F2.struct("bucket", "vs"))).alias("obs_arr")
    )
    inline = F2.expr(
        f"""
        flatten(transform(obs_arr, (o, i) ->
          CASE WHEN try_element_at(obs_arr, i + 2) IS NULL THEN
            array(struct(o.bucket AS bucket,
                         cast(o.vs AS double) / 1000000.0D AS value_interp,
                         true AS observed))
          ELSE
            transform(
              sequence(o.bucket,
                       try_element_at(obs_arr, i + 2).bucket - {interval},
                       {interval}),
              (b, j) -> struct(
                b AS bucket,
                cast(o.vs * (size(sequence(o.bucket,
                                           try_element_at(obs_arr, i + 2).bucket,
                                           {interval})) - 1 - j)
                     + try_element_at(obs_arr, i + 2).vs * j AS double)
                / (cast(size(sequence(o.bucket,
                                      try_element_at(obs_arr, i + 2).bucket,
                                      {interval})) - 1 AS double) * 1000000.0D)
                AS value_interp,
                j = 0 AS observed))
          END))
        """
    )
    expected = per_key.select("key", F2.explode(inline).alias("g")).select(
        "key", "g.bucket", "g.value_interp", "g.observed"
    )
    assert _rows(got) == _rows(expected)
    # the 06:17 -> 13:17 gap spans 7 buckets: interpolation really ramps
    interp_vals = [r for r in got.collect() if not r["observed"]]
    assert len(interp_vals) > 0


def test_chunked_history_fold_matches_monolithic_fold(spark):
    """The r11 chunked rewrite of the sequential history folds: folding
    in fixed-size chunks with carried state must emit the exact values
    (and order) of the monolithic aggregate — across chunk boundaries,
    with a partial final chunk, and through the NULL-seeded first step.
    Exercised with chunk=7 (many boundaries) and the ewma step."""
    from openmrs_patient_migration_script_spark.operators.timeseries import (
        _chunked_history_fold,
    )

    a = 0.5
    n = 39  # 5 full chunks of 7 + a partial chunk of 4
    df = spark.range(1, n + 1).select(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("id").alias("o"),
                    ((F.col("id") * 13 % 29) / 3.0).alias("v"),
                )
            )
        ).alias("seq")
    )

    def step(acc, x):
        nxt = F.when(acc["prev"].isNull(), x["v"]).otherwise(
            F.lit(a) * x["v"] + F.lit(1.0 - a) * acc["prev"]
        )
        return F.struct(
            F.concat(acc["arr"], F.array(nxt)).alias("arr"),
            nxt.alias("prev"),
        )

    mono = F.aggregate(
        F.col("seq"),
        F.struct(
            F.array().cast("array<double>").alias("arr"),
            F.lit(None).cast("double").alias("prev"),
        ),
        step,
        lambda acc: acc["arr"],
    )
    chunked = _chunked_history_fold(
        F.col("seq"),
        [("prev", F.lit(None).cast("double"))],
        step,
        "double",
        chunk=7,
    )
    row = df.select(mono.alias("m"), chunked.alias("c")).collect()[0]
    assert row["m"] == row["c"] and len(row["m"]) == n


def test_chunked_fold_operators_cross_default_chunk_boundary(spark):
    """Operator-level pin: a key longer than the default 512-chunk must
    still satisfy the recurrences exactly (spot-checked against a pure
    Python replay of ewma and cusum)."""
    from openmrs_patient_migration_script_spark.operators.timeseries import (
        cusum,
        ewma,
    )

    n = 1200
    vals = [((i * 13) % 29) / 3.0 for i in range(1, n + 1)]
    df = spark.createDataFrame(
        [(1, i + 1, v) for i, v in enumerate(vals)], "k long, o long, v double"
    )
    got = {r["o"]: r["ewma"] for r in ewma(df, "k", ["o"], "v").collect()}
    s = None
    for i, v in enumerate(vals):
        s = v if s is None else 0.5 * v + 0.5 * s
        assert got[i + 1] == s  # bit-exact: same IEEE op order
    got_c = {
        r["o"]: (r["cusum_hi"], r["cusum_lo"])
        for r in cusum(
            df, "k", ["o"], "v", target=4.0, slack=0.5, threshold=9.0
        ).collect()
    }
    sh = sl = 0
    for i, v in enumerate(vals):
        vs = round(v * 1_000_000)
        sh = max(0, sh + (vs - 4_500_000))
        sl = max(0, sl + (3_500_000 - vs))
        assert got_c[i + 1] == (sh / 1e6, sl / 1e6)
