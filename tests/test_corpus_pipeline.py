"""Training-corpus pipeline: end-to-end run, snapshot resume, invariants."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-corpus-test", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_corpus_pipeline_runs_and_resumes(spark, tmp_path):
    import corpus_pipeline

    wd = str(tmp_path / "run")
    stats = corpus_pipeline.run(spark, SF, wd)
    assert stats["clean"] <= stats["unique"] <= stats["kept"] <= stats["input"]
    assert stats["clean"] > 0 and stats["langs"] > 0
    assert stats["audit_rows"] >= 4  # one per audited stage

    # resume: identical stats, replayed from snapshots (no recompute)
    again = corpus_pipeline.run(spark, SF, wd)
    assert again == stats


def test_verified_near_dup_rejects_false_candidates(spark):
    """Exact-Jaccard verification must drop LSH bucket collisions: every
    surviving pair's jaccard is >= the threshold, and the survivors are a
    subset of the raw LSH candidates."""
    from s2spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cand = dedup.minhash_candidate_pairs(docs)
    verified = dedup.verified_near_dup_pairs(docs, threshold=0.8)
    n_cand = cand.count()
    v = verified.collect()
    assert all(r["jaccard"] >= 0.8 for r in v)
    assert len(v) <= n_cand
    sub = {(r["id_a"], r["id_b"]) for r in v}
    allc = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert sub <= allc
