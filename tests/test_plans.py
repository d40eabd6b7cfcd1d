"""Plan-quality tests: the 100 TB scale contract (SURVEY.md §4).

Correctness tests prove the answers match; these prove the *plans* are the
ones that survive a 1000-executor scale-up: filters reach the parquet scan,
small dims broadcast, top-k never global-sorts, rank filters push into the
window operator, and aggregations partial-aggregate map-side.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from bitcoin_price_etl_spark.registry import load_all
from tests.conftest import SF_SMOKE


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def q(spark, key):
    return load_all()[key].fn(spark, SF_SMOKE)


def test_scan_parquet_pushdown(spark):
    plan = plan_of(q(spark, "scan_parquet"))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_quantity,30.0)" in plan, plan
    # column pruning: the 11-column table is read as exactly the 5 needed
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read_schema
    assert read_schema.count("l_") == 5  # 4 projected + shipdate filter col


def test_join_broadcast_is_broadcast(spark):
    plan = plan_of(q(spark, "join_broadcast"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_join_shuffle_adapts_to_size(spark):
    """At tiny SF Catalyst correctly broadcasts the filtered orders side; at
    scale (broadcast disabled to simulate an over-threshold side) the same
    declarative plan must degrade to a shuffle join — the property that
    makes the operator safe at 100 TB."""
    plan_small = plan_of(q(spark, "join_shuffle"))
    assert "BroadcastHashJoin" in plan_small or "SortMergeJoin" in plan_small
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_big = plan_of(q(spark, "join_shuffle"))
        assert ("SortMergeJoin" in plan_big) or ("ShuffledHashJoin" in plan_big)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_join_asof_no_fact_side_shuffle(spark):
    """The as-of join must be a broadcast of the banded rate series —
    never a sort-merge (which would shuffle every event) and never an
    unpartitioned global window over the fact side."""
    plan = plan_of(q(spark, "join_asof"))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    # the only Window is over the tiny aggregated rate series: it must sit
    # above the purchase-side aggregate, not above the click scan
    assert plan.count("Window") >= 1


def test_sort_limit_is_take_ordered(spark):
    plan = plan_of(q(spark, "sort_limit"))
    assert "TakeOrderedAndProject" in plan
    # no global Sort node: each partition keeps top-k only
    assert "Sort [l_extendedprice" not in plan.replace("TakeOrderedAndProject", "")


def test_topk_group_window_limit_pushdown(spark):
    """Spark 3.5+/4.x pushes rank<=k into WindowGroupLimit so partitions
    retain k rows instead of materializing the full rank."""
    plan = plan_of(q(spark, "win_topk_group"))
    assert "WindowGroupLimit" in plan


def test_agg_hash_partial_aggregation(spark):
    """Two-phase hash aggregation: map-side partial before the exchange, so
    the shuffle carries one row per (partition × group)."""
    plan = plan_of(q(spark, "agg_hash"))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan
    assert "Exchange" in plan


def test_sim_search_broadcast_not_cartesian(spark):
    plan = plan_of(q(spark, "llm_sim_search"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_flagship_single_shuffle(spark):
    """The flagship plan: one exchange for the hourly agg, broadcast for the
    rate enrichment — no second data shuffle of the aggregated stream."""
    plan = plan_of(q(spark, "flagship_hourly_enriched"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    fact_exchanges = [
        l
        for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "SinglePartition" not in l
    ]
    assert len(fact_exchanges) <= 2, plan  # agg exchange (+AQE variants)
