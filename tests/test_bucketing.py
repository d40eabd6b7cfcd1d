"""Bucketed-table co-located join: with both sides bucketed on the join key,
the join plan must contain no Exchange on either side — the repeated-join
layout for 100 TB fact-fact joins (SURVEY.md §4)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.sources.sinks import write_bucketed
from tests.conftest import SF_SMOKE


def test_bucketed_join_no_exchange(spark):
    li = load(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "li_bucketed", "l_orderkey")
    write_bucketed(o, "o_bucketed", "o_orderkey")

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        a = spark.table("li_bucketed")
        b = spark.table("o_bucketed")
        joined = a.join(b, a.l_orderkey == b.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")
