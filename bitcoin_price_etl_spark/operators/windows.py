"""Window-function operators (SURVEY.md §2.2 — natural extensions of the
reference's hourly time-series model, §1.1; no direct reference precedent).

Determinism discipline: every ORDER BY carries a unique-key tiebreak so the
window order is total — otherwise rank/lag results are partition-order
dependent and the oracle hash flaps. Frame sums use the decimal cast so the
frame aggregation is exact (exprs.py).

Scale notes: all windows here are PARTITION BY'd on a high-cardinality key
(user_id, event_type, custkey, orderstatus), so state is bounded per key and
Spark distributes partitions across executors. No unpartitioned global
windows on big tables anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import DEC
from bitcoin_price_etl_spark.registry import query


@query(
    "win_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank over a totally-ordered window."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@query(
    "win_lag_price_change",
    oracle="""
    SELECT event_id, event_type, value,
           value - LAG(value) OVER (PARTITION BY event_type ORDER BY ts, event_id)
               AS value_change
    FROM events
    """,
)
def win_lag_price_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag()-based change vs previous observation — the hour-over-hour price
    delta of the reference's hourly BPI series (SURVEY.md §1.1), generalized
    to per-type event streams."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("value_change"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS {DEC})) OVER w AS DOUBLE) / COUNT(value) OVER w
               AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 4-row mean per user (frame-spec window aggregate)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    mov = F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)
    return ev.select("event_id", "user_id", mov.alias("mov_avg"))


@query(
    "win_topk_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number + filter.

    At scale Spark pushes the rank filter into the window operator
    (WindowGroupLimit in 3.5+/4.x), so each partition only keeps k rows —
    verified in tests/test_plans.py.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )
