"""The examples/ scripts must stay runnable — they are the user-facing
switch-over story (reference workflow -> this engine)."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path
import pytest

#: slow tier (r12): end-to-end example pipelines (integration breadth, ~7 min) — excluded from the
#: default driver-window run; `-m "slow or not slow"` runs it.
pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parent.parent


def _run(script: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, str(ROOT / "examples" / script), *args],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_migration_runbook(tmp_path):
    stdout = _run("migration_runbook.py", "/root/testdata/sf0.001", str(tmp_path))
    assert "migrated 150 clients" in stdout
    assert (tmp_path / "person").exists()
    assert (tmp_path / "mapping").exists()


def test_corpus_pipeline():
    stdout = _run("corpus_pipeline.py")
    assert "documents in ->" in stdout
    assert "train" in stdout


def test_quality_audit():
    stdout = _run("quality_audit.py")
    assert "audit: CLEAN" in stdout  # fixtures have no orphans
    assert "acctbal_nonnegative" in stdout
    assert "incremental plan:" in stdout


def test_incremental_sync():
    stdout = _run("incremental_sync.py")
    assert "watermark extract:" in stdout
    assert "change detection" in stdout
    assert "surviving rows:" in stdout
    assert "duplicate clusters ->" in stdout
    assert "sync: DONE" in stdout


def test_feature_pipeline():
    stdout = _run("feature_pipeline.py")
    assert "alarm rows:" in stdout
    assert "(ffill) == " in stdout
    assert "features: READY" in stdout


def test_retrieval_pipeline():
    stdout = _run("retrieval_pipeline.py")
    assert "retrieval: READY" in stdout
    assert "recall" in stdout


def test_observability_pipeline():
    stdout = _run("observability_pipeline.py")
    assert "observability: READY" in stdout
    assert "duplicate key tuples" in stdout


def test_ingest_dedup():
    stdout = _run("ingest_dedup.py")
    assert "exact containment:" in stdout
    assert "near-dup containment:" in stdout
    assert "boilerplate gate:" in stdout
    assert "admitted" in stdout
    assert "ingest: DONE" in stdout


def test_semantic_dedup_sweep():
    stdout = _run("semantic_dedup_sweep.py")
    # every layer line reports, and no layer grows the corpus
    import re

    exact = re.search(r"exact:\s+(\d+) -> (\d+)", stdout)
    para = re.search(r"paragraph:\s+(\d+) -> (\d+)", stdout)
    mh = re.search(r"minhash:\s+(\d+) -> (\d+)", stdout)
    sem = re.search(r"semantic:\s+(\d+) vectors -> (\d+) kept", stdout)
    assert exact and para and mh and sem
    for m in (exact, para, mh, sem):
        assert int(m.group(2)) <= int(m.group(1))
    assert int(sem.group(2)) > 0


def test_certification_suite():
    stdout = _run("certification_suite.py")
    for path in ("LSH", "PQ ", "IVF"):
        assert f"ann recall@k [{path}]" in stdout
    assert "modularity Q =" in stdout
    assert "drift: KS=" in stdout
    assert "zipf slope:" in stdout
    assert "certification: COMPLETE" in stdout


def test_curation_review():
    stdout = _run("curation_review.py")
    assert "mix concentration" in stdout
    assert "LSH banding sweep" in stdout
    assert "bands=16" in stdout
    assert "top decile" in stdout
    assert "curation review complete" in stdout


def test_index_design():
    stdout = _run("index_design.py")
    assert "index design: READY" in stdout
    assert "contrastive pairs staged" in stdout
    assert "cheaper 4x cut on this corpus" in stdout


def test_tokenizer_pipeline():
    stdout = _run("tokenizer_pipeline.py")
    assert "merge table (8 rounds learned):" in stdout
    assert "train" in stdout and "BPE tokens" in stdout
    assert "zero padding waste" in stdout
    assert "tokenizer: READY" in stdout


def test_streaming_dedup_index():
    stdout = _run("streaming_dedup_index.py")
    assert "ST8 admitted [11, 21]" in stdout
    assert "ST8 replay: no new bytes" in stdout
    assert "maintained index == full-history recompute" in stdout
    assert "ST11 replay: no new bytes" in stdout
    assert "ST12 maintained ANN buckets == one-shot rebuild" in stdout
    assert "ST12 replay: no new bytes" in stdout
    assert "streaming dedup index: DONE" in stdout


def test_community_detection():
    stdout = _run("community_detection.py")
    assert "planted blocks of 10" in stdout
    assert "Louvain (3 passes):" in stdout
    assert "community detection: DONE" in stdout


def test_tokenizer_pipeline_unigram_stage():
    """The r11 unigram stage of the tokenizer example (split out so the
    BPE assertions above stay r10-comparable)."""
    stdout = _run("tokenizer_pipeline.py")
    assert "unigram vocabulary (round" in stdout
    assert "compression on the kept corpus:" in stdout
