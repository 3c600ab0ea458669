"""Physical-plan audits: the properties that make the engine scale are
asserted, not assumed (SURVEY §4, prompt: 'iterate until it's the plan
you'd want'). These tests fail if a regression turns a pushed filter into a
post-scan filter, a broadcast join into a shuffle join, a top-k into a
global sort, or a candidate join back into a cross product.
"""

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

QUERIES = entry_mod.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q2_time_filter_reaches_parquet(spark):
    """The incremental lower-bound (S2) must push down to the parquet scan
    via the raw int64 nanosecond column, engaging row-group statistics."""
    plan = _plan(QUERIES["q2"](spark, SF_SMOKE))
    assert "PushedFilters" in plan
    assert "_ts_ns" in plan.split("PushedFilters", 1)[1].split("\n", 1)[0] or (
        "GreaterThanOrEqual(ts" in plan
    )


def test_q1_scan_prunes_columns(spark):
    """A 4-column projection must not read the whole events schema."""
    plan = _plan(QUERIES["q1"](spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "props" not in read_schema and "event_type" not in read_schema


def test_dimension_joins_broadcast(spark):
    """Catalog/dimension routing joins (J1/q6, q14) must broadcast the
    small side - never shuffle the fact table on the join key."""
    for name in ("q6", "q14"):
        plan = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan, f"{name}: dimension join not broadcast"


def test_q12_topk_is_take_ordered(spark):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort."""
    plan = _plan(QUERIES["q12"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_dedup_queries_have_no_cross_product(spark):
    """Every similarity/dedup pipeline is candidate-bucketed: a cartesian
    or nested-loop join anywhere in these plans is a scale regression."""
    for name in ("dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
                  "dedup_embedding", "sim_ann_lsh"):
        plan = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: nested-loop join"


def test_ivf_assignment_broadcasts_centroids(spark):
    """IVF cell assignment is a broadcast of the tiny centroid table (the
    corpus side must stream); the probe join must not be a cross product."""
    plan = _plan(QUERIES["sim_ann_ivf"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q29_single_aggregation(spark):
    """The type-dispatched summary is ONE grouped aggregation (partial +
    final), not a per-kind job fan-out: exactly one shuffle by group key."""
    plan = _plan(QUERIES["q29"](spark, SF_SMOKE))
    n_aggs = plan.count("HashAggregate")
    assert n_aggs <= 4  # partial+final (+ AQE wrappers), single groupBy
