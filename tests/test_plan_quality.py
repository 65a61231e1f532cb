"""Physical-plan regression tests: the 100 TB properties each operator is
designed around (pushdown, pruning, broadcast, shuffle counts, no
cartesian products) asserted against the optimized plan — so a regression
shows up as a test failure, not as a slow cluster job."""

from __future__ import annotations

import re

import pytest

from openmrs_patient_migration_script_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def nodes(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        m = re.match(r"^\(\d+\) (\S+)", line.strip())
        if m:
            out.append(m.group(1))
    return out


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "filter_pred")
    assert "PushedFilters: [" in plan
    # at least one concrete predicate pushed (not the empty list)
    assert not re.search(r"PushedFilters: \[\]", plan.split("PushedFilters")[1][:200])


def test_column_pruning_scan_project(spark):
    plan = plan_of(spark, "scan_project")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert set(cols) == {"c_custkey", "c_name", "c_mktsegment", "c_acctbal"}


def test_broadcast_join_is_broadcast(spark):
    plan = plan_of(spark, "join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sim_cosine_topk_no_cartesian(spark):
    plan = plan_of(spark, "sim_cosine_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast query batch
    assert "WindowGroupLimit" in plan  # top-k pushed below the full sort


def test_join_asof_single_shuffle_single_window(spark):
    plan = plan_of(spark, "join_asof")
    ns = nodes(plan)
    shuffles = [n for n in ns if n == "Exchange"]
    windows = [n for n in ns if n == "Window"]
    assert len(shuffles) == 1, ns
    assert len(windows) == 1, ns


def test_etl_registration_zero_shuffles(spark):
    """The flagship is a scan-project pipeline: its only exchange is the
    nation broadcast — any plain shuffle Exchange is a regression."""
    ns = nodes(plan_of(spark, "etl_registration"))
    assert "Exchange" not in ns, ns
    assert "BroadcastHashJoin" in ns


def test_text_tfidf_single_corpus_scan(spark):
    """tf is checkpointed: the corpus parquet must be scanned at most once
    per plan (the checkpointed RDD feeds both the tf and doc-freq sides)."""
    plan = plan_of(spark, "text_tfidf")
    assert plan.count("Scan parquet") == 0
    assert "BroadcastHashJoin" in plan


def test_no_python_udfs_in_relational_plans(spark):
    """Everything outside the explicit Pandas-UDF surface (stream_stateful,
    multimodal) stays JVM-side — BatchEvalPython/ArrowEvalPython in a
    relational plan means a Python UDF leaked into the hot path."""
    for name in ["agg_group", "join_multiway", "win_running", "dedup_fuzzy",
                 "text_tokens", "stream_tumbling", "sim_cosine_topk"]:
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, name
