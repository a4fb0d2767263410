"""Executed-plan regression tests: lock the SCALE contracts of the
headline operators into pytest, so a refactor that silently degrades a
plan (row-Python in the hot path, a lost broadcast, a new shuffle in a
map-only operator) fails CI — not just the per-round plan audit tool.

These assert plan SHAPE, not results (results are covered by the oracle
gate and fixture tests)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from s2spark.plans.session import build_session
    s = build_session(app_name="s2spark-plan-contracts", master="local[4]",
                      shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_pip_is_broadcast_join_no_row_python(spark):
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["s2_point_in_polygon"](spark, SF))
    assert "BroadcastHashJoin" in plan          # covering side broadcast
    assert "BatchEvalPython" not in plan        # refine is Arrow, not row
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan          # probe side never sorts


def test_minhash_signatures_map_only(spark):
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["dedup_minhash_signatures"](spark, SF))
    # one Exchange is the test-data repartition fan-out (_docs_par);
    # the signature computation itself must add none
    assert plan.count("Exchange") <= 1
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan        # pure JVM higher-order fns


def test_map_only_text_family(spark):
    import __spark_entry__ as entry
    qs = entry.queries()
    for name in ("text_token_count", "text_fingerprint", "text_quality",
                 "corpus_sample_stratified"):
        plan = plan_of(qs[name](spark, SF))
        # allowance of one Exchange: the test-data fan-out repartition
        assert plan.count("Exchange") <= 1, name
        assert "BatchEvalPython" not in plan, name


def test_corridor_join_broadcast_no_python(spark):
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["s2_corridor_join"](spark, SF))
    assert "BroadcastHashJoin" in plan          # buffered covering broadcast
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan        # residual is codegen


def test_encode_whole_stage_codegen_no_python(spark):
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["s2_encode_tokens"](spark, SF))
    assert "Exchange" not in plan               # map-only
    assert "Python" not in plan                 # fully JVM
    assert "*(" in plan                         # whole-stage codegen marker


def test_stream_pip_plan_is_broadcast_join_no_row_python(spark):
    """The STREAMING micro-batch plan (not the memory-sink table) must be
    the same shape as the batch broadcast join: stream-static
    BroadcastHashJoin enrichment, Arrow-only Python.  The plan is captured
    from the executed StreamingQuery (explainInternal) and attached to the
    returned DataFrame for the audit tooling."""
    import __spark_entry__ as entry
    df = entry.queries()["stream_point_in_polygon"](spark, SF)
    plan = getattr(df, "_s2spark_stream_plan", None)
    assert plan, "streaming plan was not captured"
    assert "BroadcastHashJoin" in plan          # stream-static broadcast
    assert "BatchEvalPython" not in plan        # refine is Arrow, not row
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan          # stateless enrichment: no sort


def test_lsh_pairs_no_cross_join(spark):
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["dedup_lsh_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_edge_crossing_join_plan_shape(spark):
    """Lock the flagship edge-join plan (round 5): the self-join fast
    path shares ONE cell-UDF+explode checkpoint between both join sides,
    so the executed plan carries at most 3 Exchanges and at most 2 Arrow
    stages (shared cell UDF + exact refine), with the candidate joins as
    hash joins — never a nested-loop/cartesian fallback — and no
    row-at-a-time Python anywhere."""
    import __spark_entry__ as entry
    plan = plan_of(entry.queries()["s2_edge_crossing_join"](spark, SF))
    assert plan.count("Exchange") <= 3
    assert 1 <= plan.count("ArrowEvalPython") <= 2
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
