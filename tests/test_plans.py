"""Physical-plan regression pins for the PLANS.md audit claims.

PLANS.md documents plan properties (filter pushdown, broadcast joins,
single-exchange GEMM, shuffle-free lineage) that were verified by hand
with .explain("formatted"). These tests pin them programmatically so a
refactor that silently de-optimizes a plan (drops a pushdown, turns a
broadcast into a sort-merge join, adds an exchange) fails CI instead of
surfacing as a 100TB regression."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(spark, name: str, sf_dir: str) -> str:
    df = entrymod.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_partial_agg(spark, sf_dir):
    plan = _plan(spark, "q01_pushdown_agg", sf_dir)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters:")[1][:200]
    # map-side combine: two HashAggregates (partial + final)
    assert plan.count("HashAggregate") >= 2


def test_q14_broadcasts_not_sortmerge(spark, sf_dir):
    plan = _plan(spark, "q14_broadcast_join", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q30_single_task_exchange_gemm(spark, sf_dir):
    plan = _plan(spark, "q30_emb_neardup", sf_dir)
    assert "FlatMapGroupsInPandas" in plan
    # the one hash exchange on the block-pair task key, and NO cartesian
    assert "hashpartitioning(_task" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q47_lineage_is_shuffle_free(spark, sf_dir):
    plan = _plan(spark, "q47_fetch_lineage", sf_dir)
    assert "Exchange" not in plan  # folds into one codegen'd projection
    assert "*(" in plan  # whole-stage-codegen span marker in toString()


def test_q35_fused_pick_uses_broadcast_offsets(spark, sf_dir):
    plan = _plan(spark, "q35_frontier_pick", sf_dir)
    assert "BroadcastHashJoin" in plan  # analytic offsets join, not SMJ
    assert "SortMergeJoin" not in plan
    # both politeness windows present: salted stage-1 + host stage-2
    assert "_salt" in plan


def test_q49_no_python_in_robots_match(spark, sf_dir):
    plan = _plan(spark, "q49_robots_match", sf_dir)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan  # pure JVM path


@pytest.mark.parametrize("name", ["q01_pushdown_agg", "q08_topk_per_group",
                                  "q26_quality", "q48_api_filters"])
def test_no_row_at_a_time_python_anywhere(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "BatchEvalPython" not in plan  # row-at-a-time F.udf marker
