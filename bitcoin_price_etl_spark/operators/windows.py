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
        # cast to long: DuckDB window functions return BIGINT, and the
        # driver compares schemas as well as values
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
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
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_dist",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    percent_rank = (rank-1)/(n-1) and cume_dist = rank/n are ratios of
    identical integers in both engines — exact double division, no float
    discipline needed.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_value",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           FIRST_VALUE(o_orderkey) OVER w AS biggest_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
           LAST_VALUE(o_orderkey) OVER w_full AS smallest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w_full AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first_value / nth_value / last_value with
    explicit frames (the default growing frame makes last_value a footgun —
    pinned to the full partition here, identically in both engines)."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_full = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.first("o_orderkey").over(w).alias("biggest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.last("o_orderkey").over(w_full).alias("smallest_order"),
    )


@query(
    "win_range_between",
    oracle=f"""
    SELECT event_id, event_type,
           CAST(SUM(CAST(value AS {DEC})) OVER w AS DOUBLE) AS hour_sum,
           COUNT(*) OVER w AS hour_n
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: trailing 1-hour sum/count per event type — the
    time-windowed form of the reference's hourly cadence (R19) as a window
    frame rather than a groupBy bucket.

    Ordered on epoch MICROS as a numeric range (Spark's rangeBetween takes
    longs, DuckDB takes its ordering type) so both engines bound the frame
    on identical integers. No tiebreak needed: RANGE frames include all
    peers of the boundary row, so duplicate timestamps are deterministic —
    unlike ROWS frames, where peer order would leak partition order.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("hour_sum"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@query(
    "win_gaps_islands",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        > 1800000000
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    )
    SELECT user_id, event_id,
           CAST(SUM(new_session) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
    FROM flagged
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization: the batch-SQL twin of
    session_window() — lag() flags a >30-min gap as a session start, a
    running sum numbers the sessions per user.

    The canonical two-window composition (lag + cumulative sum over the
    SAME partition/order): the sum consumes lag's output so the two Window
    operators stack, but they share ONE exchange and ONE sort — no second
    shuffle of the fact (pinned in test_plans). Gap arithmetic on epoch
    micros, same integer-domain trick as win_range_between."""
    ev = load(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum(new_session).over(run).cast("long").alias("session_id"),
    )
