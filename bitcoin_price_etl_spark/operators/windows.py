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

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import DEC, davg, davg_sql, dsum
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
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    """,
)
def win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist.

    percent_rank = (rank-1)/(n-1) and cume_dist = rank/n are ratios of
    identical integers in both engines — exact double division, no float
    discipline needed.

    NULL placement is pinned EXPLICITLY (unmeasured rows rank lowest):
    ascending defaults diverge — Spark puts NULLS FIRST, DuckDB NULLS
    LAST — which silently shifts every real row's rank. Any ORDER BY on
    a nullable column must state its NULL end on both sides.
    """
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc_nulls_first("o_totalprice"), "o_orderkey"
    )
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

    Density adjudication (r8 skew probe): Spark re-aggregates sliding
    frames per row (no incremental remove), so per-row cost is the
    frame's EVENT DENSITY — a 10×-denser hot series measured 3.7× wall
    at equal corpus size (SKEW_PROBE_r08.json), correctness unaffected.
    This key certifies the RANGE-frame SEMANTICS surface; for dense
    feeds at scale, the rollup form (stream_tumbling / the hourly
    groupBy bucket) is the linear-cost path for trailing-window stats.
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


# Interpolation gap budget: fill holes up to one week of missing hourly
# points; anything longer is a void to REPORT (ts_gap_report), not to
# fabricate data across. Also the grid-size bound under corrupt clocks:
# grid rows <= n_observed * (budget + 1) regardless of timestamp range.
INTERP_MAX_GAP_HOURS = 168


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, {davg_sql('value', 'v')}
        FROM events GROUP BY 1
    ), keyed AS (
        SELECT h, v, CAST(epoch(h) AS BIGINT) / 3600 AS hidx FROM hourly
    ), obs AS (
        SELECT h, v, hidx FROM keyed WHERE hidx % 5 <> 2
    ), isl AS (
        SELECT h, v, hidx,
               CASE WHEN lag(hidx) OVER (ORDER BY h) IS NULL
                     OR hidx - lag(hidx) OVER (ORDER BY h)
                        > {INTERP_MAX_GAP_HOURS}
                    THEN 1 ELSE 0 END AS st
        FROM obs
    ), isl2 AS (
        SELECT h, v,
               SUM(st) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING)
                   AS island
        FROM isl
    ), bounds AS (
        SELECT island, min(h) AS lo, max(h) AS hi
        FROM isl2 GROUP BY island
    ), grid AS (
        SELECT island,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), j AS (
        SELECT g.island, g.h, o.v FROM grid g
        LEFT JOIN isl2 o ON g.h = o.h
    ), w AS (
        SELECT h, v,
               last_value(v IGNORE NULLS) OVER
                   (PARTITION BY island ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               first_value(v IGNORE NULLS) OVER
                   (PARTITION BY island ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               last_value(CASE WHEN v IS NOT NULL THEN CAST(epoch(h) AS BIGINT) END
                          IGNORE NULLS) OVER
                   (PARTITION BY island ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(CASE WHEN v IS NOT NULL THEN CAST(epoch(h) AS BIGINT) END
                           IGNORE NULLS) OVER
                   (PARTITION BY island ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(CAST(epoch(h) AS BIGINT) - pt AS DOUBLE)
                        / CAST(nt - pt AS DOUBLE)) END AS value_filled,
           v IS NULL AS was_gap
    FROM w
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of gaps in an hourly series — the time-series
    repair step between the reference's hourly polls (a missed poll leaves
    a hole; forward-fill (join_asof) biases flat, linear interpolation is
    the standard repair for slowly-moving rates). Gaps are synthesized
    deterministically (every 5th hour index) so the operator exercises
    real holes at any SF.

    ISLAND-BOUNDED (r8 clockskew probe): the grid is built per island of
    consecutive observations no more than INTERP_MAX_GAP_HOURS (168 = one
    week) apart, never across the full min→max span. The unbounded form
    detonates on corrupt clocks — ONE pre-epoch or far-future tick made
    the grid span 61 years (534K rows through a single-partition window;
    a 2262-dated tick would be 2.5M), and interpolating across a void
    that size is fabrication, not repair. Voids longer than the budget
    are left UNFILLED: no grid rows exist between islands (use
    ts_gap_report — which correctly reports the void — to find them).
    Grid size is now bounded by n_observed × 168 whatever the clocks
    say, and the fill windows partition by island. One unpartitioned
    window does remain: the island-assignment pass (wseq below — lag +
    running sum ordered by hour) runs a single global ordered pass over
    the HOURLY AGGREGATE (~9k rows/year, never the event corpus), which
    is fine for one series; the many-series generalization must
    partition that window by series id too, exactly like the fill
    windows.

    Shape: aggregate to the hourly series first (partial-agg, exact davg),
    THEN run the islanded interpolation windows — the window's input is
    the hourly aggregate (~9k rows/year), never the event corpus
    (partition by series id × island when interpolating many series).

    Parity: base values come from the exact decimal average; prev/next
    picks move identical doubles; the interpolation weight divides exact
    integer second deltas — every arithmetic step sees identical operands
    in both engines, so results are bit-equal with no quantization needed."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value", "v")
    )
    keyed = hourly.withColumn(
        "hidx", (F.unix_timestamp("h") / 3600).cast("long")
    )
    obs = keyed.filter(F.col("hidx") % 5 != 2).select("h", "v", "hidx")
    wseq = Window.orderBy("h")
    start = F.when(
        F.lag("hidx").over(wseq).isNull()
        | ((F.col("hidx") - F.lag("hidx").over(wseq)) > INTERP_MAX_GAP_HOURS),
        1,
    ).otherwise(0)
    isl = obs.select(
        "h",
        "v",
        F.sum(start)
        .over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    bounds = isl.groupBy("island").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "island",
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("h"),
    )
    j = grid.join(isl.select("h", "v"), "h", "left")
    t = F.unix_timestamp("h").cast("long")
    # BOTH fill directions run as growing UNBOUNDED-PRECEDING frames —
    # the only frame shape Spark evaluates incrementally for aggregate
    # window functions (an unbounded-FOLLOWING frame re-aggregates per
    # row, O(island²); the funnel_windowed suffix-min rule). The "next
    # observation at-or-after h" is the "last at-or-before" of the
    # DESCENDING order.
    w_prev = (
        Window.partitionBy("island")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("island")
        .orderBy(F.col("h").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = j.select(
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(F.when(F.col("v").isNotNull(), t), ignorenulls=True)
        .over(w_prev)
        .alias("pt"),
        F.last(F.when(F.col("v").isNotNull(), t), ignorenulls=True)
        .over(w_next)
        .alias("nt"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((t - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")).cast("double"))
        )
    )
    return marked.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        filled.alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "ts_interpolate_multi",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type AS series, date_trunc('hour', ts) AS h,
               {davg_sql('value', 'v')}
        FROM events GROUP BY 1, 2
    ), keyed AS (
        SELECT series, h, v, CAST(epoch(h) AS BIGINT) / 3600 AS hidx
        FROM hourly
    ), obs AS (
        SELECT series, h, v, hidx FROM keyed WHERE hidx % 5 <> 2
    ), isl AS (
        SELECT series, h, v, hidx,
               CASE WHEN lag(hidx) OVER (PARTITION BY series ORDER BY h)
                        IS NULL
                     OR hidx - lag(hidx) OVER (PARTITION BY series ORDER BY h)
                        > {INTERP_MAX_GAP_HOURS}
                    THEN 1 ELSE 0 END AS st
        FROM obs
    ), isl2 AS (
        SELECT series, h, v,
               SUM(st) OVER (PARTITION BY series ORDER BY h
                             ROWS UNBOUNDED PRECEDING) AS island
        FROM isl
    ), bounds AS (
        SELECT series, island, min(h) AS lo, max(h) AS hi
        FROM isl2 GROUP BY series, island
    ), grid AS (
        SELECT series, island,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        FROM bounds
    ), j AS (
        SELECT g.series, g.island, g.h, o.v FROM grid g
        LEFT JOIN isl2 o ON g.series = o.series AND g.h = o.h
    ), w AS (
        SELECT series, h, v,
               last_value(v IGNORE NULLS) OVER
                   (PARTITION BY series, island ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               first_value(v IGNORE NULLS) OVER
                   (PARTITION BY series, island ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               last_value(CASE WHEN v IS NOT NULL
                               THEN CAST(epoch(h) AS BIGINT) END
                          IGNORE NULLS) OVER
                   (PARTITION BY series, island ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
               first_value(CASE WHEN v IS NOT NULL
                                THEN CAST(epoch(h) AS BIGINT) END
                           IGNORE NULLS) OVER
                   (PARTITION BY series, island ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM j
    )
    SELECT series, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv)
                     * (CAST(CAST(epoch(h) AS BIGINT) - pt AS DOUBLE)
                        / CAST(nt - pt AS DOUBLE)) END AS value_filled,
           v IS NULL AS was_gap
    FROM w
    """,
)
def ts_interpolate_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANY-SERIES linear interpolation — ts_interpolate_linear
    generalized to one series per key (event_type here; a metric id /
    symbol / sensor id in production), with EVERY window partitioned by
    series: the island-assignment pass (lag + running sum) runs per
    (series), the fill passes per (series, island). This ships the 100 TB
    form the single-series docstring only asserted (VERDICT r9 item 3):
    no single global ordered pass exists anywhere in this plan — a
    million independent series interpolate as a million independent
    window partitions, and skew is bounded per series by the same
    n_observed × (INTERP_MAX_GAP_HOURS+1) island-grid cap.

    Everything else is ts_interpolate_linear verbatim (same deterministic
    hidx%5 gap synthesis, same island budget, same growing-frame-only
    fill discipline — the DESCENDING trick keeps the "next observation"
    pass an incrementally-evaluated UNBOUNDED-PRECEDING frame), so the
    parity argument carries over: exact decimal hourly means, integer
    second deltas, identical doubles in both engines, no quantization.
    """
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("series"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(davg("value", "v"))
    keyed = hourly.withColumn(
        "hidx", (F.unix_timestamp("h") / 3600).cast("long")
    )
    obs = keyed.filter(F.col("hidx") % 5 != 2).select(
        "series", "h", "v", "hidx"
    )
    wseq = Window.partitionBy("series").orderBy("h")
    start = F.when(
        F.lag("hidx").over(wseq).isNull()
        | ((F.col("hidx") - F.lag("hidx").over(wseq)) > INTERP_MAX_GAP_HOURS),
        1,
    ).otherwise(0)
    isl = obs.select(
        "series",
        "h",
        "v",
        F.sum(start)
        .over(wseq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    bounds = isl.groupBy("series", "island").agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        "series",
        "island",
        F.explode(F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")).alias("h"),
    )
    j = grid.join(isl.select("series", "h", "v"), ["series", "h"], "left")
    t = F.unix_timestamp("h").cast("long")
    w_prev = (
        Window.partitionBy("series", "island")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("series", "island")
        .orderBy(F.col("h").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = j.select(
        "series",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last("v", ignorenulls=True).over(w_next).alias("nv"),
        F.last(F.when(F.col("v").isNotNull(), t), ignorenulls=True)
        .over(w_prev)
        .alias("pt"),
        F.last(F.when(F.col("v").isNotNull(), t), ignorenulls=True)
        .over(w_next)
        .alias("nt"),
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                (t - F.col("pt")).cast("double")
                / (F.col("nt") - F.col("pt")).cast("double")
            )
        )
    )
    return marked.select(
        "series",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        filled.alias("value_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "ts_resample_ohlc",
    oracle="""
    WITH base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS bar_date,
               ts, event_id, value
        FROM events
        WHERE value IS NOT NULL
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_date
                                  ORDER BY ts, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_date
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM base
    )
    SELECT event_type, bar_date,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS close,
           COUNT(*) AS n_ticks,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS volume
    FROM ranked GROUP BY event_type, bar_date
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream to daily OHLC bars per series — the
    classic market-data rollup of exactly the reference's domain (hourly
    BTC rates → daily candles; the hypertable/time-bucket rollup of
    TimescaleDB/kdb re-expressed as one Spark aggregate).

    Scale shape: ONE partial-aggregated groupBy. min_by/max_by carry a
    single (value, key-struct) candidate per map partition through the
    exchange — constant reducer state per (series, day) no matter how many
    ticks land in a bar, so a hot trading day costs nothing extra (the
    window-rank formulation the oracle uses would shuffle every tick to
    its bar's reducer; Spark gets the O(1)-state form, DuckDB the
    independently-shaped check). The struct-typed pick key makes the agg
    buffer non-mutable, so Spark plans SortAggregate instead of
    HashAggregate — still partial+final with O(1) group state; the
    per-partition sort is the price of a total-order tie pin (dropping to
    min_by(value, ts) restores hash agg but lets tied timestamps flap).

    Parity: open/high/low/close are RAW input doubles picked by total
    order (ts, event_id) — no arithmetic, so bit-exact; volume goes
    through the exact decimal sum; ties cannot flap because the pick key
    is unique per row (struct ordering pin, the agg_minmax_by rule).

    NULL semantics (r8 nulls probe): bars are built from MEASURED ticks
    only — a NULL tick at a bar boundary would otherwise make open/close
    NULL and poison every downstream indicator's rolling fold (the
    engines disagree on list-vs-collect_list NULL retention). The filter
    is here, at the family root: all 18 bar-family indicators and the
    shared _BARS_ORACLE CTE inherit it, so the whole family stays
    mutually consistent. A day with zero measurements has no bar.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pick = F.struct("ts", "event_id")
    return (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("bar_date"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("event_type", "bar_date")
        .agg(
            F.min_by("value", pick).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", pick).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
            dsum("value", "volume"),
        )
    )


@query(
    "ts_anomaly_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.event_id, e.value, m.med,
               ABS(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    ),
    scored AS (
        SELECT d.event_type, d.event_id,
               CASE WHEN m.mad > 0
                    THEN CAST(CAST(0.6745 * (d.value - d.med) / m.mad
                              AS DECIMAL(12,6)) AS DOUBLE)
                    ELSE CAST(NULL AS DOUBLE) END AS z_robust,
               m.mad, d.value, d.med
        FROM dev d JOIN mad m USING (event_type)
    )
    SELECT event_type, event_id, z_robust
    FROM scored
    WHERE (mad > 0 AND ABS(z_robust) > 3.5)
       OR (mad = 0 AND value <> med)
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: flag events whose modified z-score
    0.6745·(x−median)/MAD exceeds 3.5 (Iglewicz-Hoadley) — median/MAD
    instead of mean/stddev so the outliers being hunted can't poison the
    estimator that hunts them. The monitoring pass a production feed of
    the reference's price stream needs (a fat-fingered rate spike must
    not silently enter the warehouse; cf. validate_quarantine's schema
    gate — this is the STATISTICAL gate).

    Two-pass shape: per-series exact median (tiny frame) broadcast back,
    absolute deviations, per-series exact MAD broadcast back, then a
    codegen'd score-and-filter — the fact table is scanned, never
    globally sorted, and both join probes are broadcast hashes. Spark's
    exact percentile buffers each group's values (O(group) agg state —
    the parity anchor, same contract as llm_embed_centroids_exact); at
    100 TB swap approx_percentile(value, 0.5, 1e-4): constant-state
    sketch, partial-aggregable, and the 3.5σ gate is insensitive to a
    1e-4 quantile shift.

    Parity: medians interpolate on arbitrary doubles, where the engines'
    a+(b−a)·f forms can drift an ulp — the score is QUANTIZED through
    DECIMAL(12,6) on both sides (6 orders over ulp noise, the agg_corr
    rule), and the >3.5 gate compares post-quantization values, so both
    engines gate identical numbers and the flag set cannot flap.

    Degenerate guard (r8 degenerate-corpus probe): a flat-lined series
    has MAD exactly 0 and the score divides by zero (ANSI crash). The
    scale is undefined there, but deviation from a zero-dispersion
    baseline is the MOST anomalous case a monitor sees — so mad = 0
    rows flag iff value <> median, carrying a NULL score (identical
    CASE + filter in both engines; fixtures all have mad > 0, so
    certified output is unchanged).
    """
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    # dev feeds both the MAD aggregate and the scoring pass — MAD is
    # inherently two passes over the deviations, so checkpoint them once
    # (r5 plan audit: 4 event scans -> 2; at warehouse scale this is the
    # persist-deviations-to-disk shape)
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    ).transform(stage)
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    scored = dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "event_id",
        F.expr(
            """CASE WHEN mad > 0D
               THEN CAST(CAST(0.6745 * (value - med) / mad
                         AS DECIMAL(12,6)) AS DOUBLE)
               ELSE CAST(NULL AS DOUBLE) END"""
        ).alias("z_robust"),
        "mad",
        "value",
        "med",
    )
    return scored.filter(
        "(mad > 0D AND ABS(z_robust) > 3.5) OR (mad = 0D AND value <> med)"
    ).select("event_type", "event_id", "z_robust")


@query(
    "ts_vwap",
    oracle="""
    SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
           COUNT(*) AS n_trades,
           CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) AS total_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))
                    * CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE) AS vwap
    FROM lineitem
    GROUP BY ship_month
    """,
)
def ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per month — THE market-microstructure
    rollup of the reference's domain (its hourly close is an unweighted
    point sample; VWAP is what a trading desk actually benchmarks
    against), computed as Σ(price·qty)/Σ(qty) from decimal-exact sums.

    Parity: the price·qty cross-moment multiplies in decimal at natural
    scales (9,2)×(4,1) — the agg_corr input-first rule, at the narrowest
    provably-safe precisions (r12: p1+p2+1 ≤ 18 keeps the multiply a
    long multiply; accumulator ceilings at 100 TB lineitem ~8.7e11 rows:
    qty sum (18,1) cap 1e17 vs 4.4e13, product sum (24,3) cap 1e21 vs
    4.6e18 — values are exact integers in quantum units at any width) —
    and both exact sums cast to double BEFORE the division, so both
    engines divide identical doubles (never divide decimals: result
    scales differ between engines, the tpch_q14 lesson).

    Scale shape: one partial-aggregated groupBy on the (year, month)
    INTEGER pair — three fixed-width accumulators per group; the month
    STRING renders after aggregation on dozens of rows instead of a
    per-row date_format (r12, guide §1.2: identical text by
    construction for 4-digit years — concat(year, '-', lpad(month)) ==
    date_format 'yyyy-MM'). Month cardinality is tiny so AQE coalesces
    the post-shuffle partitions.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.year("l_shipdate").alias("__y"),
            F.month("l_shipdate").alias("__m"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.expr(
                "CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE)"
            ).alias("total_qty"),
            (
                F.expr(
                    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))"
                    " * CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE)"
                )
                / F.expr(
                    "CAST(SUM(CAST(l_quantity AS DECIMAL(8,1))) AS DOUBLE)"
                )
            ).alias("vwap"),
        )
        .select(
            F.concat(
                F.col("__y").cast("string"),
                F.lit("-"),
                F.lpad(F.col("__m").cast("string"), 2, "0"),
            ).alias("ship_month"),
            "n_trades",
            "total_qty",
            "vwap",
        )
    )


EWMA_DECAY = 0.8  # (1 - alpha), alpha = 0.2
EWMA_HORIZON = 20  # finite window: bounded state AND bounded exponents


@query(
    "ts_ewma",
    oracle=f"""
    WITH framed AS (
        SELECT event_type, ts, event_id, value,
               list(value) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN {EWMA_HORIZON - 1} PRECEDING
                                          AND CURRENT ROW) AS raw_lv
        FROM events
    ),
    f2 AS (
        SELECT event_type, ts, event_id, value,
               list_filter(raw_lv, x -> x IS NOT NULL) AS lv
        FROM framed
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value,
           CASE WHEN len(lv) > 0 THEN CAST(CAST(
               list_reduce(list_transform(list_zip(lv,
                   list_transform(generate_series(1, len(lv)),
                       k -> pow({EWMA_DECAY}, len(lv) - k))),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                   (s, x) -> s + x)
               / list_reduce(list_transform(generate_series(1, len(lv)),
                   k -> pow({EWMA_DECAY}, len(lv) - k)),
                   (s, x) -> s + x)
           AS DECIMAL(18,6)) AS DOUBLE)
           ELSE CAST(NULL AS DOUBLE) END AS ewma
    FROM f2
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon exponentially-weighted moving average per series —
    the denoised price track of every market-data stack (the reference's
    hourly BTC series smoothed), in the 20-observation truncated form.

    Why truncated: the textbook recursive EWMA needs either a sequential
    scan (not distributed) or exponent terms like (1-a)^(-rownum) that
    overflow doubles after a few thousand rows. A 20-tap horizon keeps
    weights in [0.8^19, 1], carries bounded per-row state (the same
    reason production stream processors cap EWMA lookback), and changes
    the value by < 0.8^20 ≈ 1.2e-2 relative — inside the smoothing noise.

    Scale shape: ONE exchange (the series window); the frame list is ≤20
    doubles per row, assembled in sort order within the partition — no
    second shuffle, no unbounded state.

    Parity: both engines build the frame list oldest-first under the
    same (ts, event_id) total order, apply identical pow(0.8, k) weights
    (libm-identical inputs), and fold sequentially from index 0; the one
    division is quantized through DECIMAL(18,6) against residual drift.

    NULL semantics (r8 nulls probe): the EWMA IGNORES NULL ticks — the
    weights re-index over the surviving observations (Spark's
    collect_list drops NULLs; the oracle list_filters to match), and an
    all-NULL frame has no average → NULL, never an ANSI 0/0.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_HORIZON - 1), 0)
    )
    framed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.collect_list("value").over(w).alias("lv"),
    )
    # r11 (guide §1.2 "per-task work"): the weight vector and the
    # denominator depend ONLY on the frame length (≤ EWMA_HORIZON), so
    # both are precomputed ONCE into literal arrays indexed by size(lv)
    # instead of re-deriving pow(decay, L-k) per element per row and
    # re-folding the denominator per row. The pow values are taken FROM
    # Spark itself (one OneRowRelation control-plane collect — no scan,
    # no shuffle) so they are the very doubles the old per-row pow()
    # produced, and the denominator is folded sequentially in Python
    # (IEEE adds on those exact doubles == the retired aggregate fold).
    # The numerator keeps the sequential zip_with fold over the row's
    # own values. Verified exceptAll-identical both ways vs the old
    # expression on the full sf0.1 frame; oracle unchanged. Warm-best at
    # sf0.1: 1.01 s → 0.63 s for the post-window projection.
    pow_row = spark.range(1).select(
        *[
            F.expr(f"pow({EWMA_DECAY}D, {j})").alias(f"p{j}")
            for j in range(EWMA_HORIZON)
        ]
    ).collect()[0]
    pw = [float(pow_row[f"p{j}"]) for j in range(EWMA_HORIZON)]
    wts = [[pw[L - k] for k in range(1, L + 1)] for L in range(1, EWMA_HORIZON + 1)]
    dens = []
    for L in range(1, EWMA_HORIZON + 1):
        s = 0.0
        for x in wts[L - 1]:
            s += x
        dens.append(s)
    w_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in wts])
    den_lit = F.array(*[F.lit(x) for x in dens])
    num = F.aggregate(
        F.zip_with(
            "lv",
            F.element_at(w_lit, F.size("lv")),
            lambda x, wt: x * wt,
        ),
        F.lit(0.0),
        lambda s, p: s + p,
    )
    ewma = (
        F.when(
            F.size("lv") > 0,
            (num / F.element_at(den_lit, F.size("lv")))
            .cast("decimal(18,6)")
            .cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return framed.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
        ewma.alias("ewma"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN row_number() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_of_type
        FROM events
    )
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, event_type,
           CAST(SUM(first_of_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen
    FROM flagged
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count — how many distinct event types each user
    has seen up to each event. COUNT(DISTINCT) OVER a running frame is
    unsupported in both engines (and inherently O(n·distinct) done
    naively); the standard rewrite flags each (user, type)'s FIRST
    occurrence with one rank window, then running-sums the 0/1 flags.

    Scale shape: ONE exchange — but only with the explicit
    repartition(user_id) FIRST. Left alone, Catalyst partitions the rank
    window on its own (user, type) key, which the second window's
    user-only clustering cannot reuse (subset rule runs the other way),
    costing a second full shuffle (observed). Pre-partitioning on the
    COARSER key satisfies both windows — HashPartitioning(user) ⊆
    {user, type} — so the plan is Exchange → Sort → Window → Sort →
    Window, no second shuffle (locked in the plan snapshot). State per
    row is one counter.

    Parity: (ts, event_id) is a unique total order; flags and their
    running sum are exact integers.
    """
    ev = load(spark, sf_dir, "events").repartition("user_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_user = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.row_number().over(w_type) == 1, 1).otherwise(0).alias(
            "first_of_type"
        ),
    )
    return flagged.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "event_type",
        F.sum("first_of_type").over(w_user).cast("bigint").alias(
            "n_types_seen"
        ),
    )


ROLL_TAPS = 21  # rolling-median / z-score window width


@query(
    "win_rolling_median",
    oracle=f"""
    WITH framed AS (
        SELECT event_type, ts, event_id, value,
               list(value) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN {ROLL_TAPS - 1} PRECEDING
                                          AND CURRENT ROW) AS lv
        FROM events
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value,
           CASE WHEN len(list_filter(lv, x -> x IS NOT NULL)) > 0
                THEN list_sort(list_filter(lv, x -> x IS NOT NULL))
                     [CAST((len(list_filter(lv, x -> x IS NOT NULL)) + 1)
                           // 2 AS BIGINT)]
                ELSE CAST(NULL AS DOUBLE) END AS rolling_median
    FROM framed
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median filter per series (21-tap) — the robust despike
    pass market-data pipelines run before derived analytics (a single
    bad tick moves a rolling MEAN for 21 rows; the median ignores it).

    No native windowed median exists in either engine; the portable form
    sorts the bounded frame list and picks the lower middle (exact for
    odd frames; the deterministic convention for the partition-head
    short frames). The picked value is a RAW input double — no
    arithmetic at all, so cross-engine parity is trivial.

    Scale shape: identical to ts_ewma — one exchange, ≤21 doubles of
    per-row state, sort cost 21·log 21 per row inside the partition.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_TAPS - 1), 0)
    )
    framed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.collect_list("value").over(w).alias("lv"),
    )
    return framed.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
        # NULL semantics (r8 nulls probe): the median IGNORES NULL ticks
        # (Spark's collect_list drops them; the oracle list_filters to
        # match - DuckDB's windowed list() KEEPS NULLs), and an all-NULL
        # frame has no median -> NULL, not an element_at(arr, 0) crash.
        F.expr(
            """CASE WHEN size(lv) > 0
               THEN element_at(array_sort(lv),
                               CAST((size(lv) + 1) DIV 2 AS INT))
               ELSE CAST(NULL AS DOUBLE) END"""
        ).alias("rolling_median"),
    )


@query(
    "ts_zscore_rolling",
    oracle=f"""
    WITH framed AS (
        SELECT event_type, ts, event_id, value,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER w AS DOUBLE)
                   AS s1,
               CAST(SUM(CAST(CAST(value AS DECIMAL(19,4))
                             * CAST(value AS DECIMAL(19,4))
                             AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s2,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {ROLL_TAPS - 1} PRECEDING
                              AND CURRENT ROW)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN CAST(CAST(
                     (value - s1 / n)
                     / sqrt((s2 - s1 * s1 / n) / (n - 1))
                     AS DECIMAL(18,6)) AS DOUBLE)
                ELSE CAST(0.0 AS DOUBLE) END AS zscore
    FROM framed
    """,
)
def ts_zscore_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score per series (21-tap): each tick scored against its
    own trailing window's mean/stddev — the online anomaly gate
    complementing ts_anomaly_mad's global two-pass form.

    Parity: the window moment sums (Σx, Σx²) go through the decimal
    discipline so the frame sums are bit-identical; mean/stddev then use
    a fixed IEEE expression tree with one libm sqrt, and the final score
    is quantized through DECIMAL(18,6) (the agg_corr rule — ratios of
    exact moments still carry last-ulp division noise). Degenerate
    frames emit 0 by the same guard in both engines; the guard tests
    the COMPUTED double variance (s2 − s1²/n) > 0, not the exact-moment
    inequality s2·n > s1² — near-constant windows (10 copies of one
    value, a flat-lined sensor) can satisfy the exact inequality while
    catastrophic cancellation rounds the double variance to exactly 0,
    and x/sqrt(0) is an ANSI DIVIDE_BY_ZERO crash (caught by the r8
    midpoint-hunt octave at 10× sf0.1; guard flips zero rows at any
    fixture SF, so certified hashes are unchanged).

    Scale shape: one exchange, two running decimal accumulators +
    a count per row — O(1) state, no frame list at all (contrast
    win_rolling_median, which must hold the frame).
    """
    ev = load(spark, sf_dir, "events")
    framed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.expr(
            f"""CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN {ROLL_TAPS - 1} PRECEDING AND CURRENT ROW)
                AS DOUBLE)"""
        ).alias("s1"),
        F.expr(
            f"""CAST(SUM(CAST(CAST(value AS DECIMAL(19,4))
                              * CAST(value AS DECIMAL(19,4))
                              AS DECIMAL(38,8))) OVER (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN {ROLL_TAPS - 1} PRECEDING AND CURRENT ROW)
                AS DOUBLE)"""
        ).alias("s2"),
        F.expr(
            f"""CAST(COUNT(*) OVER (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN {ROLL_TAPS - 1} PRECEDING AND CURRENT ROW)
                AS BIGINT)"""
        ).alias("n"),
    )
    return framed.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
        F.expr(
            """CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0D
               THEN CAST(CAST(
                    (value - s1 / n)
                    / sqrt((s2 - s1 * s1 / n) / (n - 1))
                    AS DECIMAL(18,6)) AS DOUBLE)
               ELSE CAST(0.0D AS DOUBLE) END"""
        ).alias("zscore"),
    )


@query(
    "win_pareto_abc",
    oracle="""
    WITH ranked AS (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
                    PARTITION BY o_orderstatus
                    ORDER BY o_totalprice DESC, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,4)) AS cum_dec,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
                    PARTITION BY o_orderstatus) AS DECIMAL(38,4)) AS tot_dec
        FROM orders
    )
    SELECT o_orderstatus, o_orderkey, o_totalprice,
           CAST(cum_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE)
               AS cum_share,
           CASE WHEN cum_dec * 100 <= tot_dec * 80 THEN 'A'
                WHEN cum_dec * 100 <= tot_dec * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def win_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification: orders ranked by value within their
    status; each row carries its running share of the partition total
    and an A/B/C class (top 80% of value / next 15% / tail) — the
    inventory-analysis classic.

    Parity: the running and total sums are exact decimals; the share is
    ONE division of bit-identical doubles; the class boundaries compare
    cum·100 ≤ tot·80 IN DECIMAL — exact cross-multiplication, so a row
    sitting precisely on the 80% line classifies identically in both
    engines (a double share ≤ 0.8 comparison could not promise that).

    Scale shape: one exchange on the partition key; two window passes
    over the same sort (running + partition total) with O(1) state.
    """
    o = load(spark, sf_dir, "orders")
    w_run = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("o_orderstatus")
    cum_dec = F.expr(
        "SUM(CAST(o_totalprice AS DECIMAL(38,4)))"
    ).over(w_run).cast("decimal(38,4)")
    tot_dec = F.expr(
        "SUM(CAST(o_totalprice AS DECIMAL(38,4)))"
    ).over(w_all).cast("decimal(38,4)")
    ranked = o.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        cum_dec.alias("cum_dec"),
        tot_dec.alias("tot_dec"),
    )
    return ranked.select(
        "o_orderstatus",
        "o_orderkey",
        "o_totalprice",
        (
            F.col("cum_dec").cast("double") / F.col("tot_dec").cast("double")
        ).alias("cum_share"),
        F.when(
            F.col("cum_dec") * 100 <= F.col("tot_dec") * 80, "A"
        )
        .when(F.col("cum_dec") * 100 <= F.col("tot_dec") * 95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


M4_BUCKET_SECONDS = 21600  # 6-hour pixel buckets


@query(
    "ts_downsample_m4",
    oracle=f"""
    WITH base AS (
        SELECT event_type, value, ts, event_id,
               CAST(floor(epoch_us(ts) / ({M4_BUCKET_SECONDS} * 1000000.0))
                    AS BIGINT) AS bucket
        FROM events
        WHERE value IS NOT NULL
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts, event_id) AS rn_first,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY ts DESC, event_id DESC) AS rn_last,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY value, ts, event_id) AS rn_min,
               row_number() OVER (PARTITION BY event_type, bucket
                                  ORDER BY value DESC, ts DESC, event_id DESC)
                   AS rn_max
        FROM base
    )
    SELECT event_type, bucket,
           count(*) AS n_points,
           MAX(CASE WHEN rn_first = 1 THEN value END) AS v_first,
           MAX(CASE WHEN rn_min = 1
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS t_min,
           MIN(value) AS v_min,
           MAX(CASE WHEN rn_max = 1
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS t_max,
           MAX(value) AS v_max,
           MAX(CASE WHEN rn_last = 1 THEN value END) AS v_last
    FROM ranked GROUP BY event_type, bucket
    """,
)
def ts_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per series and fixed
    time bucket keep exactly the first/last/min/max points — the four
    values a pixel column of a line chart can ever show, so a billion-row
    series renders from bucket-count rows with zero visual error. The
    time-series sibling of ts_resample_ohlc (OHLC keeps the same four
    picks for candlesticks; M4 additionally surfaces WHEN the extremes
    happened, which drives drill-down).

    Scale shape: ONE partial-aggregated groupBy, O(1) state per (series,
    bucket) — min/max are plain aggregates, the positional picks ride
    min_by/max_by with a unique struct pick key, so a hot bucket costs
    nothing extra and the exchange carries one candidate per map
    partition. The oracle uses the window-rank formulation instead (four
    rank passes) — independently shaped, same picks.

    Parity: all emitted values are RAW input doubles or formatted
    timestamps picked by total order — no arithmetic at all; bucket ids
    are exact integer floor-division of microseconds.

    NULL semantics (r8 nulls probe): a point IS a measurement — NULL
    ticks are gaps, not points (they cannot be a pixel's min/max, and
    leaving them in diverges the positional picks: Spark's min_by sorts
    the NULL struct field first, DuckDB ranks NULLS LAST). Filtered
    identically on both sides; n_points counts measured points.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pick = F.struct("ts", "event_id")
    vpick = F.struct("value", "ts", "event_id")
    return (
        ev.select(
            "event_type",
            "value",
            "ts",
            "event_id",
            F.floor(
                F.unix_micros("ts") / (M4_BUCKET_SECONDS * 1_000_000.0)
            ).cast("long").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min_by("value", pick).alias("v_first"),
            F.date_format(
                F.min_by("ts", vpick), "yyyy-MM-dd HH:mm:ss"
            ).alias("t_min"),
            F.min("value").alias("v_min"),
            F.date_format(
                F.max_by("ts", vpick), "yyyy-MM-dd HH:mm:ss"
            ).alias("t_max"),
            F.max("value").alias("v_max"),
            F.max_by("value", pick).alias("v_last"),
        )
    )


@query(
    "ts_max_drawdown",
    oracle="""
    WITH runmax AS (
        SELECT event_type, ts, event_id, value,
               max(value) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS peak
        FROM events
        WHERE value IS NOT NULL
    ), dd AS (
        SELECT event_type, ts, event_id, value, peak,
               value / peak - 1.0 AS drawdown
        FROM runmax
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY drawdown, ts, event_id) AS rn
        FROM dd
    )
    SELECT event_type,
           count(*) AS n_points,
           MIN(drawdown) AS max_drawdown,
           MAX(CASE WHEN rn = 1 THEN peak END) AS peak_value,
           MAX(CASE WHEN rn = 1 THEN value END) AS trough_value,
           MAX(CASE WHEN rn = 1
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS trough_ts
    FROM ranked
    GROUP BY event_type
    """,
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series — the canonical risk metric of exactly
    the reference's price-feed domain (worst peak-to-trough loss an
    investor holding through the series could suffer), plus WHERE it
    happened (peak value, trough value, trough timestamp).

    Scale shape: one running-max window (the same single exchange +
    in-partition sort every per-series window here pays) and one grouped
    aggregate that reuses the window's partitioning — the argmin pick
    rides min_by with a (drawdown, ts, event_id) struct, O(1) state, so
    the trough identification adds no second pass (the oracle uses the
    rank formulation — independently shaped, same pick).

    Parity: drawdown = value/peak - 1 is two IEEE ops on bit-identical
    operands (value raw, peak a MAX pick of raw doubles), so every
    drawdown is bit-identical across engines; MIN/comparisons over
    identical doubles cannot diverge, and the tie-break key (ts,
    event_id) is unique.

    NULL semantics (r8 nulls probe): NULL ticks are gaps — an investor
    cannot transact at an unmeasured price, so they carry no drawdown
    (and a NULL drawdown would win Spark's NULLS-FIRST argmin struct
    while losing DuckDB's NULLS-LAST rank). Filtered identically on
    both sides; the running peak carries across the gap unchanged.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dd = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.max("value").over(w).alias("peak"),
    ).withColumn("drawdown", F.col("value") / F.col("peak") - 1.0)
    pick = F.struct("drawdown", "ts", "event_id")
    return dd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("drawdown").alias("max_drawdown"),
        F.min_by("peak", pick).alias("peak_value"),
        F.min_by("value", pick).alias("trough_value"),
        F.date_format(F.min_by("ts", pick), "yyyy-MM-dd HH:mm:ss").alias(
            "trough_ts"
        ),
    )


@query(
    "ts_autocorr",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                    / COUNT(value) AS DECIMAL(18,6)) AS vq
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), lagged AS (
        SELECT event_type, vq AS y,
               lag(vq, 1) OVER w AS x1,
               lag(vq, 2) OVER w AS x2,
               lag(vq, 3) OVER w AS x3
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), long AS (
        SELECT event_type, CAST(t.k AS INTEGER) AS lag,
               CASE t.k WHEN 1 THEN x1 WHEN 2 THEN x2 ELSE x3 END AS x, y
        FROM lagged, unnest([1, 2, 3]) AS t(k)
        WHERE CASE t.k WHEN 1 THEN x1 WHEN 2 THEN x2 ELSE x3 END
              IS NOT NULL
    ), m AS (
        SELECT event_type, lag, COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM long GROUP BY event_type, lag
    )
    SELECT event_type, lag, n AS n_pairs,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(CAST((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                     AS DECIMAL(10,6)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END AS autocorr
    FROM m
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) of each series' HOURLY mean —
    the mean-reversion / momentum diagnostic for any metric stream (an
    ACF near zero says the series is noise; sustained positive lags say
    trend-following features are worth building). Pearson correlation of
    the hourly series against its own lag, per (series, lag), long
    format.

    Scale shape (reworked per VERDICT r4 item 6 — the raw-event form's
    per-series window sort capped parallelism at the series count, 3.1×
    wall at 8× data): the corpus collapses to the hourly grid FIRST via
    one partial-aggregated groupBy (the exchange carries one row per
    (series × hour × task); raw events never reach a window), then the
    lag window, stack fan-out, and moment aggregate all ride the
    DOMAIN-bounded grid — hours × series, invariant to row count, the
    same bounded-grid discipline as ts_cusum_changepoint/ts_ewma. The
    hourly grain is the semantic the diagnostic wants at scale anyway:
    per-event ACF of an irregular stream conflates arrival density with
    signal.

    Parity: the hourly mean is exact-decimal-sum / count (one correctly
    rounded division on identical operands) quantized through
    DECIMAL(18,6) — the certified ts_cusum_changepoint grain rule — so
    every lag/moment input is an exact 6-decimal value; moments multiply
    decimals exactly (18,6 × 18,6 stays inside precision 38) and sum
    associatively; the final ratio quantizes through DECIMAL(10,6) then
    back to double."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.expr(
            """CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
               / COUNT(value) AS DECIMAL(18,6))"""
        ).alias("vq")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        F.col("vq").alias("y"),
        F.lag("vq", 1).over(w).alias("x1"),
        F.lag("vq", 2).over(w).alias("x2"),
        F.lag("vq", 3).over(w).alias("x3"),
    )
    long = lagged.select(
        "event_type",
        "y",
        F.expr("stack(3, 1, x1, 2, x2, 3, x3) AS (lag, x)"),
    ).filter(F.col("x").isNotNull())
    m = long.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(x * x) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(y * y) AS DOUBLE)").alias("syy"),
        F.expr("CAST(SUM(x * y) AS DOUBLE)").alias("sxy"),
    )
    # Degenerate guard (r8 degenerate-corpus probe): a flat-lined hourly
    # series zeroes both variance moments and x/sqrt(0) crashes under
    # ANSI; the ACF is undefined there → NULL on the same computed-double
    # inequalities in both engines (agg_corr pattern).
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(dx) * F.sqrt(dy)
    )
    return m.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        F.when(
            (dx > F.lit(0.0)) & (dy > F.lit(0.0)),
            corr.cast("decimal(10,6)").cast("double"),
        ).alias("autocorr"),
    )


@query(
    "ts_cusum_changepoint",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DECIMAL(18,4)) AS s
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), m AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               CAST(COUNT(*) AS DECIMAL(6,0)) AS nd,
               CAST(SUM(s) AS DECIMAL(18,4)) AS t
        FROM hourly GROUP BY event_type
    ), dev AS (
        SELECT h0.event_type, h0.h, m.n_hours,
               CAST(m.nd * h0.s - m.t AS DECIMAL(26,4)) AS d
        FROM hourly h0 JOIN m USING (event_type)
    ), c AS (
        SELECT event_type, h, n_hours,
               SUM(d) OVER (PARTITION BY event_type ORDER BY h) AS cusum
        FROM dev
    ), ranked AS (
        SELECT event_type, h, n_hours, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(cusum) DESC, h) AS rn
        FROM c
    )
    SELECT event_type, n_hours,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS changepoint_hour,
           CAST(cusum AS DOUBLE) / CAST(n_hours AS DOUBLE)
               AS max_abs_cusum
    FROM ranked WHERE rn = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per series: the hour where the
    running cumulative deviation of hourly VOLUME (the hourly value sum)
    from its per-series mean peaks in absolute value — the classic
    level-shift locator (a mean shift makes the CUSUM path a tent whose
    apex IS the change point; a flat series random-walks near zero).

    Parity: this operator went through THREE formulations before the
    exact one (the r7 sf0.1 audit story). (1) Quantizing the computed
    hourly means to DECIMAL(18,6) hit the rule-9 shortest-repr midpoint
    class per element at sf0.1. (2) Sequential fold over the hr-sorted
    hourly array (the xcorr fix) was CORRECT on the Spark side but
    unusable as an oracle: DuckDB 1.0's list_reduce returned
    NONDETERMINISTIC results on multi-row ~700-element list folds (two
    of three identical runs agreed, the third differed — recorded in
    BASELINE.md). (3) Shipped: scale through by N so every checked
    quantity is an EXACT DECIMAL — the deviation of hour i is
    D_i = N·S_i − T (S_i = exact hourly decimal sum, T = ΣS_i, both
    lossless DECIMAL(18,4)), the cusum is a plain window SUM of exact
    decimals (associative — partial-agg order cannot change it), the
    apex argmax compares exact decimals with the tie pinned to the
    EARLIER hour, and the only float op is the final
    CAST(cusum AS DOUBLE)/N on identical operands (scaled ints stay
    far under 2^53 at every fixture scale). N·(S_i − T/N) = D_i, so
    the reported value is the classic volume-basis cusum exactly.

    Scale shape: the corpus collapses to the hourly series first (one
    partial-aggregated groupBy — the window never sees raw events), the
    per-series (N, T) attaches via a tiny broadcastable join, and ONE
    running-sum window per series walks the hourly frame (~9k rows/year
    per series). The apex pick is an O(1)-state rank window."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DECIMAL(18,4))"
        ).alias("s")
    )
    m = hourly.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_hours"),
        F.expr("CAST(COUNT(*) AS DECIMAL(6,0))").alias("nd"),
        F.expr("CAST(SUM(s) AS DECIMAL(18,4))").alias("t"),
    )
    dev = hourly.join(F.broadcast(m), "event_type").select(
        "event_type",
        "h",
        "n_hours",
        F.expr("CAST(nd * s - t AS DECIMAL(26,4))").alias("d"),
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = dev.select(
        "event_type", "h", "n_hours", F.sum("d").over(w).alias("cusum")
    )
    # max_by on (abs, h) would tie-break toward the LATER hour; the
    # oracle pins the EARLIER one, so rank explicitly
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("cusum"))), "h"
    )
    ranked = c.withColumn("rn", F.row_number().over(wr))
    return ranked.filter(F.col("rn") == 1).select(
        "event_type",
        "n_hours",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("changepoint_hour"),
        (
            F.col("cusum").cast("double")
            / F.col("n_hours").cast("double")
        ).alias("max_abs_cusum"),
    )


# Seasonal-naive horizon: predict each hour by the same hour one week
# earlier (168 hourly lags).
FC_SEASON_HOURS = 168


@query(
    "ts_forecast_backtest",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS v
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ), pred AS (
        SELECT event_type, h, v,
               lag(v, {FC_SEASON_HOURS}) OVER (PARTITION BY event_type
                                               ORDER BY h) AS yhat
        FROM hourly
    ), err AS (
        SELECT event_type, v, yhat, v - yhat AS e
        FROM pred WHERE yhat IS NOT NULL
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_forecasts,
           CAST(CAST(SUM(abs(e)) / count(*) AS DECIMAL(14,6)) AS DOUBLE)
               AS mae,
           CAST(CAST(SUM(e) / count(*) AS DECIMAL(14,6)) AS DOUBLE)
               AS bias,
           CAST(CAST(sqrt(SUM(e * e) / count(*)) AS DECIMAL(14,6))
                AS DOUBLE) AS rmse,
           CAST(CAST(SUM(abs(e) / abs(v)) / count(*)
                     AS DECIMAL(14,6)) AS DOUBLE) AS mape
    FROM err GROUP BY event_type
    """,
)
def ts_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hour of every
    series with the value 168 hours (one week) earlier and report
    MAE / bias / RMSE / MAPE per series — the baseline every real
    forecasting model must beat, and the shape of any backtest harness
    (prediction column = some lag/model, error rollup identical).

    Scale shape: the corpus collapses to the hourly series first (one
    partial aggregate), ONE lag window per series produces the
    prediction, and the error report is one more partial aggregate —
    the window walks ~9k hourly rows per series-year, never raw events
    (the ts_cusum_changepoint stance).

    Parity: hourly means are bit-identical davg doubles and the error
    e = v − ŷ subtracts identical doubles (exact IEEE); error SUMS are
    partial-agg order-sensitive at the last ulp, so every reported
    metric quantizes through DECIMAL(14,6) then back to double (noise
    ~1e-12, quantum 1e-6)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(davg("value", "v"))
    w = Window.partitionBy("event_type").orderBy("h")
    pred = hourly.withColumn(
        "yhat", F.lag("v", FC_SEASON_HOURS).over(w)
    ).filter(F.col("yhat").isNotNull())
    e = F.col("v") - F.col("yhat")
    n = F.count(F.lit(1))
    return pred.groupBy("event_type").agg(
        n.alias("n_forecasts"),
        (F.sum(F.abs(e)) / n)
        .cast("decimal(14,6)")
        .cast("double")
        .alias("mae"),
        (F.sum(e) / n).cast("decimal(14,6)").cast("double").alias("bias"),
        F.sqrt(F.sum(e * e) / n)
        .cast("decimal(14,6)")
        .cast("double")
        .alias("rmse"),
        (F.sum(F.abs(e) / F.abs(F.col("v"))) / n)
        .cast("decimal(14,6)")
        .cast("double")
        .alias("mape"),
    )


# Seasonal decomposition: centered moving-average window (hours) and the
# hour-of-day season length. 11-preceding/12-following ≈ a centered 24h
# frame (even season length needs the off-by-one split).
SEAS_PRE = 11
SEAS_POST = 12


@query(
    "ts_seasonal_decompose",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, date_trunc('hour', ts)
    ),
    trended AS (
        SELECT event_type, hr, y,
               list_reduce(list(y) OVER w, (s, x) -> s + x)
                   / COUNT(y) OVER w AS trend
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN {SEAS_PRE} PRECEDING
                     AND {SEAS_POST} FOLLOWING)
    ),
    seasonal AS (
        SELECT event_type, CAST(extract(hour FROM hr) AS BIGINT) AS hod,
               list_reduce(list(y - trend ORDER BY hr), (s, x) -> s + x)
                   / COUNT(*) AS s_idx
        FROM trended GROUP BY event_type, extract(hour FROM hr)
    )
    SELECT t.event_type, strftime(t.hr, '%Y-%m-%d %H:%M:%S') AS hr,
           t.y, t.trend, s.s_idx AS seasonal,
           t.y - t.trend - s.s_idx AS remainder
    FROM trended t
    JOIN seasonal s ON s.event_type = t.event_type
                   AND s.hod = extract(hour FROM t.hr)
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition (the moving-average STL
    ancestor): per-series hourly values split into trend (centered 24h
    moving average), hour-of-day seasonal index (mean detrended value per
    hod), and remainder — the anomaly-vs-seasonality disentangler behind
    every "is this spike real or just 9am" question, on exactly the
    reference's hourly-price domain.

    Scale shape: resample is one partial-combined aggregate; the trend
    is ONE window over the (series)-partitioned hourly frame (already
    thousands× smaller than the event stream); the seasonal index is a
    24-row-per-series aggregate that broadcast-joins back. Partition =
    series key throughout — one exchange for the window, one tiny
    broadcast back; an all-hours-one-series skew sorts one partition
    (same posture as ts_ewma, bounded by hours-per-series, not events).

    Parity: the raw resample is the davg discipline (exact scale-4
    DECIMAL sum, ONE double divide), but the derived stages NEVER
    re-enter decimal: y and y−trend are quotient doubles whose shortest
    decimal reprs systematically terminate ON a rounding boundary, and
    Spark casts double→decimal by rounding that repr HALF_UP while
    DuckDB rounds the binary value — measured at sf0.01, ~0.3% of
    detrended values flipped the last DECIMAL(28,12) digit (and the
    first draft's quantized avg() flipped DECIMAL(18,6) the same way).
    Instead, trend and seasonal are SEQUENTIAL IEEE folds in a pinned
    order (frame order for the 24-tap trend, hr order for the seasonal
    index — Spark aggregate() over a collected frame ≡ DuckDB
    list_reduce, the ts_ewma/llm_embed_normalize pattern), so both
    engines add bit-identical operands in the identical sequence; one
    divide by the count lands the mean. The frame list is 24 elements;
    the hod list is bounded by the calendar (n_days per series), not
    the corpus. Edge bars fold their partial frame in BOTH engines
    (same ROWS-frame semantics); hr is unique per series so both fold
    orders are total.

    NULL semantics (r8 nulls probe): NULL ticks are gaps; an hour with
    ZERO measurements is no observation at all — filtered at the source
    so it never becomes a NULL y that DuckDB's list fold propagates but
    Spark's collect_list silently drops."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)"
                " / COUNT(value)"
            ).alias("y")
        )
    )
    wtrend = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-SEAS_PRE, SEAS_POST)
    )
    # one resample+window pass, two consumers (seasonal agg + final join)
    trended = (
        hourly.withColumn("yl", F.collect_list("y").over(wtrend))
        .withColumn(
            "trend",
            F.aggregate("yl", F.lit(0.0), lambda s, x: s + x)
            / F.size("yl"),
        )
        .drop("yl")
        .transform(stage)
    )
    seasonal = (
        trended.withColumn("yd", F.col("y") - F.col("trend"))
        .groupBy("event_type", F.hour("hr").alias("hod"))
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list("
                "struct(hr, yd))), p -> p.yd),"
                " CAST(0.0 AS DOUBLE), (s, x) -> s + x) / COUNT(*)"
            ).alias("s_idx")
        )
    )
    t = trended.alias("t")
    s = seasonal.select(
        F.col("event_type").alias("s_event_type"), "hod", "s_idx"
    )
    return (
        t.join(
            F.broadcast(s),
            (F.col("t.event_type") == F.col("s_event_type"))
            & (F.hour(F.col("t.hr")) == F.col("hod")),
        )
        .select(
            F.col("t.event_type").alias("event_type"),
            F.date_format("t.hr", "yyyy-MM-dd HH:mm:ss").alias("hr"),
            "y",
            "trend",
            F.col("s_idx").alias("seasonal"),
            (F.col("y") - F.col("trend") - F.col("s_idx")).alias("remainder"),
        )
    )


RSI_TAPS = 14  # classic 14-period RSI lookback


@query(
    "ts_rsi",
    oracle=f"""
    WITH diffed AS (
        SELECT event_type, ts, event_id, value,
               value - lag(value) OVER (PARTITION BY event_type
                                        ORDER BY ts, event_id) AS d
        FROM events
    ),
    framed AS (
        SELECT event_type, ts, event_id, value,
               SUM(CAST(CASE WHEN d > 0 THEN d ELSE 0 END
                        AS DECIMAL(38,4))) OVER w AS g,
               SUM(CAST(CASE WHEN d < 0 THEN -d ELSE 0 END
                        AS DECIMAL(38,4))) OVER w AS l,
               CAST(COUNT(d) OVER w AS BIGINT) AS n_diffs
        FROM diffed
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN {RSI_TAPS - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value, n_diffs,
           CASE WHEN n_diffs = 0 THEN CAST(NULL AS DOUBLE)
                WHEN g + l = 0 THEN CAST(50.0 AS DOUBLE)
                ELSE CAST(100 * g AS DOUBLE) / CAST(g + l AS DOUBLE)
                END AS rsi
    FROM framed
    """,
)
def ts_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index per series (simple 14-tap form): each tick's
    up-move vs down-move balance over its trailing window, the canonical
    momentum oscillator of exactly the reference's domain (hourly BTC rates
    -> overbought/oversold signal; reference stores the raw hourly rows,
    bpi_etl_bigquery.py:63-88 — the indicator is the natural next query).

    RSI = 100 * sum(gains) / (sum(gains) + sum(losses)) over the frame —
    algebraically 100 - 100/(1+RS) with the average-gain/average-loss RS,
    but the n-divides cancel, so the exact decimal frame sums feed ONE
    double quotient (fewer rounding sites than the textbook form). The
    Wilder-smoothed variant is recursive (EWMA of gains) — ts_ewma's
    bounded-tap pattern covers that shape; this is the windowed-sum form.

    Parity: lag-diffs are IEEE-exact on identical operands; gain/loss split
    then decimal-sums at scale 4 (tick deltas are money-like, far from any
    conversion boundary — exprs.py). The checked rsi is ONE correctly-
    rounded double division of two EXACT decimals (num = 100·g, den = g+l,
    both exact decimal arithmetic, scaled ints far under 2^53 — identical
    doubles on both engines with NO quantization). The previous
    quantize-then-double at DECIMAL(18,6) was DISPROVEN by the r7 sf0.1
    audit: one row's quotient had a shortest-repr ending exactly at the
    1e-7 midpoint (55.3578125), and Spark's shortest-repr double→decimal
    rounds HALF-UP where DuckDB's exact-binary expansion rounds down —
    the memory rule-9 class; re-quantizing a computed quotient is never
    safe, emit it raw when rule 1 applies. Flat series (g+l=0, exact
    decimal compare) pin to 50; the first tick of each series (no diff
    yet) emits NULL identically in both engines.

    Scale shape: identical to ts_zscore_rolling — ONE exchange on the
    series key, two running decimal accumulators + a count per row, O(1)
    window state, no frame list. 100 TB verdict: bounded by ticks/series
    per partition, never corpus-wide.
    """
    ev = load(spark, sf_dir, "events")
    frame = (
        f"PARTITION BY event_type ORDER BY ts, event_id "
        f"ROWS BETWEEN {RSI_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    diffed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.expr(
            "value - lag(value) OVER ("
            "PARTITION BY event_type ORDER BY ts, event_id)"
        ).alias("d"),
    )
    # Frame-local gain/loss sums: bounded by taps x max|delta|, so the
    # long-backed DECIMAL(18,4) exact-sum fast path applies (see
    # win_rolling_beta / BASELINE.md A/B).
    framed = diffed.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.expr(
            f"SUM(CAST(CASE WHEN d > 0 THEN d ELSE 0 END "
            f"AS DECIMAL(18,4))) OVER ({frame})"
        ).alias("g"),
        F.expr(
            f"SUM(CAST(CASE WHEN d < 0 THEN -d ELSE 0 END "
            f"AS DECIMAL(18,4))) OVER ({frame})"
        ).alias("l"),
        F.expr(f"CAST(COUNT(d) OVER ({frame}) AS BIGINT)").alias("n_diffs"),
    )
    return framed.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
        "n_diffs",
        F.expr(
            """CASE WHEN n_diffs = 0 THEN CAST(NULL AS DOUBLE)
               WHEN g + l = 0 THEN CAST(50.0D AS DOUBLE)
               ELSE CAST(100 * g AS DOUBLE) / CAST(g + l AS DOUBLE) END"""
        ).alias("rsi"),
    )


BETA_TAPS = 30  # rolling-OLS lookback (rows per frame)


@query(
    "win_rolling_beta",
    oracle=f"""
    WITH framed AS (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER w
                    AS DECIMAL(18,4)) AS sxd,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) OVER w
                    AS DECIMAL(18,4)) AS syd,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                             * CAST(l_quantity AS DECIMAL(19,4))
                             AS DECIMAL(38,8))) OVER w
                    AS DECIMAL(18,8)) AS sxxd,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(19,4))
                             * CAST(l_extendedprice AS DECIMAL(19,4))
                             AS DECIMAL(38,8))) OVER w
                    AS DECIMAL(18,8)) AS sxyd,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber,
                              l_quantity, l_extendedprice
                     ROWS BETWEEN {BETA_TAPS - 1} PRECEDING AND CURRENT ROW)
    ),
    exact AS (
        SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, n,
               sxd, syd, sxxd, sxyd,
               CAST(CAST(n AS DECIMAL(9,0)) * sxyd - sxd * syd
                    AS DECIMAL(38,4)) AS num4,
               CAST(CAST(n AS DECIMAL(9,0)) * sxxd - sxd * sxd
                    AS DECIMAL(38,4)) AS den4
        FROM framed
    )
    SELECT l_suppkey,
           strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ship_str,
           l_orderkey, l_linenumber, n,
           CASE WHEN n < 2 OR den4 <= 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE)
                END AS beta
    FROM exact
    """,
)
def win_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS slope per supplier (30-row frame): the trailing
    hedge-ratio of price on quantity over each supplier's last 30
    shipments — agg_linreg's windowed sibling (global fit there, online
    per-row fit here; the quant-finance rolling-beta shape applied to the
    lineitem fact).

    Partition-key choice IS the scale design: the first formulation
    partitioned by l_returnflag (3 values) and the 1x/4x/8x probe measured
    it LINEAR (7.6x wall at 8x — three single-task sorts own the whole
    fact table). Per-supplier series are the realistic grain AND bound
    each window partition to that entity's rows; the probe re-run confirms
    the flat shape.

    beta = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2): the numerator and denominator
    run ENTIRELY in exact decimal arithmetic (frame moments are exact at
    scale ≤8; the product-difference never touches doubles, so no FMA
    shape exists), downscale losslessly to scale 4 (q·p carries 4
    decimals; scaled ints stay under 2^53 for DuckDB's single-rounded
    decimal→double), and the checked beta is ONE correctly-rounded double
    division — no quantization. The previous DECIMAL(18,6)
    quantize-of-the-quotient was DISPROVEN by the r7 sf0.1 audit (the
    ts_rsi rule-9 midpoint class). Degenerate frames (n<2 or zero
    x-variance, checked on the exact decimal denominator) emit NULL in
    both engines.

    Scale shape: one exchange on the high-cardinality supplier key, four
    O(1) decimal accumulators + a count per row — the zscore/RSI state
    pattern with two cross-moments. No frame list, no second pass. 100 TB
    verdict: per-partition cost is rows-per-supplier, which grows with
    fact volume per entity, not corpus size; a pathological mega-supplier
    gets the ts_sessionize salting treatment.
    """
    li = load(spark, sf_dir, "lineitem")
    frame = (
        f"PARTITION BY l_suppkey "
        f"ORDER BY l_shipdate, l_orderkey, l_linenumber, "
        f"l_quantity, l_extendedprice "
        f"ROWS BETWEEN {BETA_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    # Frame-LOCAL sums are bounded by taps x max|value| no matter the
    # corpus size, so precision-18 decimals (long-backed, single 64-bit
    # lane) are exact here and 2.1x faster than the 128-bit DECIMAL(38,*)
    # path the unbounded-sum aggregates need (A/B in BASELINE.md); the
    # values are bit-identical, so the wide-decimal oracle stands.
    framed = li.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.expr(
            f"CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER ({frame})"
            f" AS DECIMAL(18,4))"
        ).alias("sxd"),
        F.expr(
            f"CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) "
            f"OVER ({frame}) AS DECIMAL(18,4))"
        ).alias("syd"),
        F.expr(
            f"""CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(8,4))
                              * CAST(l_quantity AS DECIMAL(8,4))
                              AS DECIMAL(18,8))) OVER ({frame})
                 AS DECIMAL(18,8))"""
        ).alias("sxxd"),
        F.expr(
            f"""CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(8,4))
                              * CAST(l_extendedprice AS DECIMAL(10,4))
                              AS DECIMAL(18,8))) OVER ({frame})
                 AS DECIMAL(18,8))"""
        ).alias("sxyd"),
        F.expr(f"CAST(COUNT(*) OVER ({frame}) AS BIGINT)").alias("n"),
    )
    # EXACT decimal numerator/denominator (frame moments are exact at
    # scale ≤8 and the OLS shape is products-of-sums): the whole
    # product-difference runs in decimal — no FMA shape, no quantize —
    # then ONE correctly-rounded double division on identical operands.
    # Scale-4 downscale is lossless (q·p has 4 decimals), keeping the
    # scaled ints under 2^53 so DuckDB's decimal→double is single-rounded
    # (exprs.py rule 8). n casts to DECIMAL(9,0) so the product precision
    # stays ≤38 on the Spark side (a raw BIGINT operand would trip
    # allowPrecisionLoss scale reduction).
    exact = framed.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        "n",
        F.expr(
            "CAST(CAST(n AS DECIMAL(9,0)) * sxyd - sxd * syd"
            " AS DECIMAL(38,4))"
        ).alias("num4"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(9,0)) * sxxd - sxd * sxd"
            " AS DECIMAL(38,4))"
        ).alias("den4"),
    )
    return exact.select(
        "l_suppkey",
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("ship_str"),
        "l_orderkey",
        "l_linenumber",
        "n",
        F.expr(
            """CASE WHEN n < 2 OR den4 <= 0 THEN CAST(NULL AS DOUBLE)
               ELSE CAST(num4 AS DOUBLE) / CAST(den4 AS DOUBLE) END"""
        ).alias("beta"),
    )


@query(
    "ts_obv",
    oracle="""
    WITH parsed AS (
        SELECT event_type, ts, event_id, value,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS vol
        FROM events
    ),
    signed AS (
        SELECT event_type, ts, event_id, value, vol,
               CASE WHEN value > lag(value) OVER w THEN vol
                    WHEN value < lag(value) OVER w THEN -vol
                    ELSE CAST(0 AS BIGINT) END AS flow
        FROM parsed
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           event_id, value, vol,
           CAST(SUM(flow) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
    FROM signed
    """,
)
def ts_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-Balance Volume per series: the running signed-volume accumulator
    (volume flows IN on up-ticks, OUT on down-ticks) — the classic
    volume-confirmation indicator beside ts_rsi's momentum and
    ts_resample_ohlc's bars, with the per-event `k` payload (parsed from
    the JSON props column) standing in for trade volume.

    Parity: ZERO float arithmetic in the checked value — the tick
    direction is a three-way comparison of raw input doubles (exact on
    identical operands), volume is an integer, and OBV is an unbounded
    cumulative BIGINT sum over a total order (ts, event_id) — bit-exact
    by construction, no decimal or quantize discipline needed. First
    tick of each series contributes 0 flow (lag is NULL -> ELSE branch)
    identically in both engines.

    Scale shape: one exchange on the series key; the running sum is one
    long of window state (Spark evaluates UNBOUNDED PRECEDING running
    frames incrementally, not by re-scanning the frame). The JSON parse
    is a map-side projection riding the same scan. Same posture as
    ts_zscore_rolling; per-series ordering cost only.
    """
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
    )
    signed = parsed.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        "vol",
        F.expr(
            """CASE WHEN value > lag(value) OVER (
                        PARTITION BY event_type ORDER BY ts, event_id)
                    THEN vol
                    WHEN value < lag(value) OVER (
                        PARTITION BY event_type ORDER BY ts, event_id)
                    THEN -vol
                    ELSE CAST(0 AS BIGINT) END"""
        ).alias("flow"),
    )
    return signed.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "event_id",
        "value",
        "vol",
        F.expr(
            """CAST(SUM(flow) OVER (PARTITION BY event_type
               ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT)"""
        ).alias("obv"),
    )


# Shared daily-bar CTE for the indicator family layered on OHLC bars
# (ts_atr, ts_candle_patterns): the ts_resample_ohlc oracle body with the
# same rank-pick discipline (open/close picked by total (ts, event_id)
# order, volume through the exact decimal sum).
_BARS_ORACLE = """
    base AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS bar_date,
               ts, event_id, value
        FROM events
        WHERE value IS NOT NULL
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_date
                                  ORDER BY ts, event_id) AS rn_first,
               ROW_NUMBER() OVER (PARTITION BY event_type, bar_date
                                  ORDER BY ts DESC, event_id DESC) AS rn_last
        FROM base
    ), bars AS (
        SELECT event_type, bar_date,
               MAX(CASE WHEN rn_first = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_last = 1 THEN value END) AS close
        FROM ranked GROUP BY event_type, bar_date
    )
"""

ATR_TAPS = 14


@query(
    "ts_atr",
    oracle=f"""
    WITH {_BARS_ORACLE},
    tr_calc AS (
        SELECT event_type, bar_date, high, low, close,
               lag(close) OVER (PARTITION BY event_type
                                ORDER BY bar_date) AS prev_close
        FROM bars
    ),
    tr AS (
        SELECT event_type, bar_date, close,
               CASE WHEN prev_close IS NULL THEN high - low
                    ELSE greatest(high - low, abs(high - prev_close),
                                  abs(low - prev_close)) END AS true_range
        FROM tr_calc
    )
    SELECT event_type, bar_date, close, true_range,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_bars,
           CAST(CAST(
                CAST(SUM(CAST(true_range AS DECIMAL(38,4))) OVER w
                     AS DOUBLE)
                / COUNT(*) OVER w
                AS DECIMAL(18,6)) AS DOUBLE) AS atr
    FROM tr
    WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                 ROWS BETWEEN {ATR_TAPS - 1} PRECEDING AND CURRENT ROW)
    """,
)
def ts_atr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average True Range over daily bars: the volatility gauge that
    completes the indicator family on the reference's domain (OHLC bars →
    candles, RSI → momentum, OBV → volume, ATR → range). True range folds
    inter-day gaps into the bar range (max of high-low, |high-prev_close|,
    |low-prev_close|); ATR is its 14-bar windowed mean.

    Built ON ts_resample_ohlc's certified bars (same rank-pick
    open/close, same engine twin) — operator composition, not a new bar
    definition.

    Parity: bar values are raw picked inputs, so TR is a fixed IEEE
    max/abs/subtract tree on identical operands; the frame mean divides
    the exact decimal TR sum by the frame count and quantizes through
    DECIMAL(18,6). The /14 small-integer quotient cannot terminate ON the
    quantize boundary digit (a reduced denominator carrying the factor 7
    either cancels — quotient terminates at the sum's own 4-digit scale,
    far left of the boundary — or never terminates), so the exprs.py
    round-4 quotient caveat does not bite. bar_date alone is a total
    order per series (one row per calendar day by construction).

    Scale shape: the OHLC partial agg absorbs the tick volume first
    (O(1) reducer state per bar); both windows then ride the SAME
    (event_type) exchange over bars — days-per-series rows, not ticks.
    Flat at any tick rate; grows only with calendar span.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "high", "low", "close"
    )
    tr_calc = bars.select(
        "event_type",
        "bar_date",
        "high",
        "low",
        "close",
        F.expr(
            "lag(close) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("prev_close"),
    )
    tr = tr_calc.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(
            """CASE WHEN prev_close IS NULL THEN high - low
               ELSE greatest(high - low, abs(high - prev_close),
                             abs(low - prev_close)) END"""
        ).alias("true_range"),
    )
    w = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {ATR_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    return tr.select(
        "event_type",
        "bar_date",
        "close",
        "true_range",
        F.expr(f"CAST(COUNT(*) OVER ({w}) AS BIGINT)").alias("n_bars"),
        # bounded 14-bar frame: the long-backed DECIMAL(18,4) exact-sum
        # fast path (see win_rolling_beta / BASELINE.md A/B)
        F.expr(
            f"""CAST(CAST(
                CAST(SUM(CAST(true_range AS DECIMAL(18,4))) OVER ({w})
                     AS DOUBLE)
                / COUNT(*) OVER ({w})
                AS DECIMAL(18,6)) AS DOUBLE)"""
        ).alias("atr"),
    )


@query(
    "ts_candle_patterns",
    oracle=f"""
    WITH {_BARS_ORACLE},
    lagged AS (
        SELECT event_type, bar_date, open, high, low, close,
               lag(open) OVER w AS prev_open,
               lag(close) OVER w AS prev_close
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date)
    )
    SELECT event_type, bar_date, open, high, low, close,
           abs(close - open) * 10.0 <= (high - low) AS is_doji,
           (close > open AND prev_close < prev_open
            AND open <= prev_close AND close >= prev_open)
               AS is_bull_engulfing,
           (close < open AND prev_close > prev_open
            AND open >= prev_close AND close <= prev_open)
               AS is_bear_engulfing,
           ((least(open, close) - low) >= 2.0 * abs(close - open)
            AND (high - greatest(open, close)) <= abs(close - open))
               AS is_hammer
    FROM lagged
    """,
)
def ts_candle_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick pattern flags over daily bars: doji (body within 10% of
    the range), bull/bear engulfing (body swallows the prior bar's body),
    and hammer (long lower shadow, capped upper shadow) — the chart-pattern
    screen a market-analytics user runs directly on ts_resample_ohlc's
    output.

    Parity: every flag is a comparison tree over raw picked bar values
    and their IEEE differences — identical operands in both engines, so
    the booleans are bit-exact with NO decimal or quantize machinery
    (the doji threshold is written |body|*10 <= range rather than
    |body| <= 0.1*range so the only literal is exactly representable).
    First bar of each series: engulfing flags are NULL (lag is NULL)
    identically in both engines.

    Scale shape: the OHLC partial agg absorbs tick volume; one lag window
    over bars on the same series exchange. Flags are free projections.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "open", "high", "low", "close"
    )
    lagged = bars.select(
        "event_type",
        "bar_date",
        "open",
        "high",
        "low",
        "close",
        F.expr(
            "lag(open) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("prev_open"),
        F.expr(
            "lag(close) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("prev_close"),
    )
    return lagged.select(
        "event_type",
        "bar_date",
        "open",
        "high",
        "low",
        "close",
        F.expr("abs(close - open) * 10.0D <= (high - low)").alias("is_doji"),
        F.expr(
            """close > open AND prev_close < prev_open
               AND open <= prev_close AND close >= prev_open"""
        ).alias("is_bull_engulfing"),
        F.expr(
            """close < open AND prev_close > prev_open
               AND open >= prev_close AND close <= prev_open"""
        ).alias("is_bear_engulfing"),
        F.expr(
            """(least(open, close) - low) >= 2.0D * abs(close - open)
               AND (high - greatest(open, close)) <= abs(close - open)"""
        ).alias("is_hammer"),
    )


# MACD geometry: classic (12, 26, 9) in the truncated-EWMA form ts_ewma
# establishes (decay = 1 - 2/(n+1), window = n taps). Decays are written
# as exact-quotient expressions so both engines derive the identical
# double before pow().
MACD_FAST, MACD_SLOW, MACD_SIGNAL = 12, 26, 9
_D_FAST = "(11.0D / 13.0D)"     # 1 - 2/13
_D_SLOW = "(25.0D / 27.0D)"     # 1 - 2/27
_D_SIG = "(4.0D / 5.0D)"        # 1 - 2/10
_D_FAST_DUCK = "(11.0 / 13.0)"
_D_SLOW_DUCK = "(25.0 / 27.0)"
_D_SIG_DUCK = "(4.0 / 5.0)"


def _tewma_spark(lst: str, decay: str) -> str:
    """Truncated-EWMA fold over a frame list (the ts_ewma discipline):
    oldest-first weights pow(decay, n-k), sequential fold, one division,
    quantized through DECIMAL(18,6)."""
    return f"""CAST(CAST(
        aggregate(zip_with({lst},
            transform(sequence(1, size({lst})),
                k -> pow({decay}, size({lst}) - k)),
            (x, wt) -> x * wt),
            0.0D, (s, p) -> s + p)
        / aggregate(transform(sequence(1, size({lst})),
                k -> pow({decay}, size({lst}) - k)),
            0.0D, (s, p) -> s + p)
    AS DECIMAL(18,6)) AS DOUBLE)"""


def _tewma_duck(lst: str, decay: str) -> str:
    return f"""CAST(CAST(
        list_reduce(list_transform(list_zip({lst},
            list_transform(generate_series(1, len({lst})),
                k -> pow({decay}, len({lst}) - k))),
            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
            (s, x) -> s + x)
        / list_reduce(list_transform(generate_series(1, len({lst})),
            k -> pow({decay}, len({lst}) - k)),
            (s, x) -> s + x)
    AS DECIMAL(18,6)) AS DOUBLE)"""


@query(
    "ts_macd",
    oracle=f"""
    WITH {_BARS_ORACLE},
    emas AS (
        SELECT event_type, bar_date, close,
               {_tewma_duck(f"list(close) OVER (PARTITION BY event_type ORDER BY bar_date ROWS BETWEEN {MACD_FAST - 1} PRECEDING AND CURRENT ROW)", _D_FAST_DUCK)} AS ema_fast,
               {_tewma_duck(f"list(close) OVER (PARTITION BY event_type ORDER BY bar_date ROWS BETWEEN {MACD_SLOW - 1} PRECEDING AND CURRENT ROW)", _D_SLOW_DUCK)} AS ema_slow
        FROM bars
    ),
    macd_t AS (
        SELECT event_type, bar_date, close, ema_fast, ema_slow,
               ema_fast - ema_slow AS macd
        FROM emas
    )
    SELECT event_type, bar_date, close, macd,
           {_tewma_duck(f"list(macd) OVER (PARTITION BY event_type ORDER BY bar_date ROWS BETWEEN {MACD_SIGNAL - 1} PRECEDING AND CURRENT ROW)", _D_SIG_DUCK)} AS signal,
           macd - {_tewma_duck(f"list(macd) OVER (PARTITION BY event_type ORDER BY bar_date ROWS BETWEEN {MACD_SIGNAL - 1} PRECEDING AND CURRENT ROW)", _D_SIG_DUCK)} AS histogram
    FROM macd_t
    """,
)
def ts_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD (12, 26, 9) over daily bars — the convergence/divergence
    capstone of the indicator family (bars -> RSI -> OBV -> ATR ->
    candles -> MACD), in the truncated-EWMA form ts_ewma establishes:
    macd = EMA12(close) - EMA26(close), signal = EMA9(macd), histogram =
    macd - signal.

    Nesting discipline: each truncated EWMA quantizes through
    DECIMAL(18,6) at its own edge, so the INTERMEDIATE series (macd) is
    bit-identical across engines before the second window layer folds it
    — quantized intermediates are what make a two-level windowed
    indicator hash-exact (raw-double EWMAs would carry last-ulp drift
    into the signal fold and amplify). Decay bases are exact-quotient
    doubles fed to libm pow on identical inputs (the ts_ewma parity
    argument).

    Scale shape: the OHLC partial agg absorbs tick volume; BOTH window
    layers share the (event_type) x bar_date sort, so Spark plans one
    exchange and stacked Window nodes over days-per-series rows. Frame
    lists are <= 26 doubles. Flat at any tick rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    def w(taps: int, col: str) -> str:
        return (
            f"collect_list({col}) OVER (PARTITION BY event_type "
            f"ORDER BY bar_date ROWS BETWEEN {taps - 1} PRECEDING "
            f"AND CURRENT ROW)"
        )
    emas = bars.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(_tewma_spark(w(MACD_FAST, "close"), _D_FAST)).alias(
            "ema_fast"
        ),
        F.expr(_tewma_spark(w(MACD_SLOW, "close"), _D_SLOW)).alias(
            "ema_slow"
        ),
    )
    macd_t = emas.select(
        "event_type",
        "bar_date",
        "close",
        (F.col("ema_fast") - F.col("ema_slow")).alias("macd"),
    )
    sig = F.expr(_tewma_spark(w(MACD_SIGNAL, "macd"), _D_SIG))
    return macd_t.select(
        "event_type",
        "bar_date",
        "close",
        "macd",
        sig.alias("signal"),
        (F.col("macd") - sig).alias("histogram"),
    )


STOCH_TAPS = 14  # %K lookback
STOCH_SMOOTH = 3  # %D smoothing bars


@query(
    "ts_stochastic",
    oracle=f"""
    WITH {_BARS_ORACLE},
    ranges AS (
        SELECT event_type, bar_date, close,
               MIN(low) OVER w AS ll,
               MAX(high) OVER w AS hh
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {STOCH_TAPS - 1} PRECEDING
                              AND CURRENT ROW)
    ),
    k AS (
        SELECT event_type, bar_date, close,
               CASE WHEN hh = ll THEN CAST(50.0 AS DOUBLE)
                    ELSE CAST(CAST(100.0 * (close - ll) / (hh - ll)
                              AS DECIMAL(18,6)) AS DOUBLE) END AS pct_k
        FROM ranges
    )
    SELECT event_type, bar_date, close, pct_k,
           CASE WHEN COUNT(*) OVER d = {STOCH_SMOOTH}
                THEN CAST(CAST(
                     CAST(SUM(CAST(pct_k AS DECIMAL(38,6))) OVER d
                          AS DOUBLE) / {STOCH_SMOOTH}
                     AS DECIMAL(18,6)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END AS pct_d
    FROM k
    WINDOW d AS (PARTITION BY event_type ORDER BY bar_date
                 ROWS BETWEEN {STOCH_SMOOTH - 1} PRECEDING AND CURRENT ROW)
    """,
)
def ts_stochastic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator (14, 3) over daily bars: %K locates the close
    inside its trailing 14-bar high-low range, %D is its 3-bar smoothing —
    the overbought/oversold gauge that pairs with RSI (momentum of price
    deltas there, position-in-range here).

    Parity: the range bounds are raw MIN/MAX picks (exact); %K is one
    IEEE quotient on identical operands quantized through DECIMAL(18,6)
    (non-terminating denominator class — safe); %D sums the QUANTIZED %K
    values exactly in decimal and divides by the constant 3 — and is
    deliberately NULL until the smoothing frame is full, because the /2
    partial-frame quotient of a scale-6 decimal TERMINATES exactly on the
    scale-7 quantize boundary for every odd numerator (the exprs.py
    round-4 quotient class, ~50% of second bars), while /3 and /1 cannot
    terminate there. Degenerate flat ranges (hh = ll) pin %K to 50.

    Scale shape: the OHLC partial agg absorbs tick volume; the range,
    %K, and %D windows all share the (event_type) x bar_date sort — one
    exchange, stacked Window nodes over days-per-series rows, O(1) state
    each. Flat at any tick rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "high", "low", "close"
    )
    w = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {STOCH_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    d = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {STOCH_SMOOTH - 1} PRECEDING AND CURRENT ROW"
    )
    ranges = bars.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(f"MIN(low) OVER ({w})").alias("ll"),
        F.expr(f"MAX(high) OVER ({w})").alias("hh"),
    )
    k = ranges.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(
            """CASE WHEN hh = ll THEN CAST(50.0D AS DOUBLE)
               ELSE CAST(CAST(100.0D * (close - ll) / (hh - ll)
                         AS DECIMAL(18,6)) AS DOUBLE) END"""
        ).alias("pct_k"),
    )
    return k.select(
        "event_type",
        "bar_date",
        "close",
        "pct_k",
        # bounded 3-bar frame of values in [0, 100]: long-backed
        # DECIMAL(18,6) exact-sum fast path
        F.expr(
            f"""CASE WHEN COUNT(*) OVER ({d}) = {STOCH_SMOOTH}
                THEN CAST(CAST(
                     CAST(SUM(CAST(pct_k AS DECIMAL(18,6))) OVER ({d})
                          AS DOUBLE) / {STOCH_SMOOTH}
                     AS DECIMAL(18,6)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END"""
        ).alias("pct_d"),
    )


KELTNER_MULT = 2  # band half-width in ATR units


@query(
    "ts_keltner",
    oracle=f"""
    WITH {_BARS_ORACLE},
    tr_calc AS (
        SELECT event_type, bar_date, high, low, close,
               lag(close) OVER (PARTITION BY event_type
                                ORDER BY bar_date) AS prev_close
        FROM bars
    ),
    tr AS (
        SELECT event_type, bar_date, close,
               CASE WHEN prev_close IS NULL THEN high - low
                    ELSE greatest(high - low, abs(high - prev_close),
                                  abs(low - prev_close)) END AS true_range
        FROM tr_calc
    ),
    layered AS (
        SELECT event_type, bar_date, close,
               {_tewma_duck(f"list(close) OVER (PARTITION BY event_type ORDER BY bar_date ROWS BETWEEN {EWMA_HORIZON - 1} PRECEDING AND CURRENT ROW)", str(EWMA_DECAY))} AS center,
               CAST(CAST(
                    CAST(SUM(CAST(true_range AS DECIMAL(38,4))) OVER a
                         AS DOUBLE) / COUNT(*) OVER a
                    AS DECIMAL(18,6)) AS DOUBLE) AS atr
        FROM tr
        WINDOW a AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {ATR_TAPS - 1} PRECEDING
                              AND CURRENT ROW)
    )
    SELECT event_type, bar_date, close, center, atr,
           center + {KELTNER_MULT} * atr AS upper_band,
           center - {KELTNER_MULT} * atr AS lower_band,
           close > center + {KELTNER_MULT} * atr AS breakout_up,
           close < center - {KELTNER_MULT} * atr AS breakout_down
    FROM layered
    """,
)
def ts_keltner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keltner channels over daily bars: a truncated-EWMA centerline with
    bands at +/-2 ATR, plus breakout flags — the volatility-envelope
    screen composing the family's two certified primitives (ts_ewma's
    bounded-tap smoothing and ts_atr's true-range mean) into one plan.

    Parity: center and atr are each quantized through DECIMAL(18,6) at
    their own edge (the ts_macd nesting discipline), so the band
    arithmetic and breakout comparisons are fixed IEEE trees on
    bit-identical operands — no further quantization needed.

    Scale shape: the OHLC partial agg absorbs tick volume; the lag, EWMA,
    and ATR windows all share the (event_type) x bar_date sort — one
    exchange, stacked Window nodes over days-per-series rows; frame state
    is <=20 doubles (EWMA list) plus two accumulators (ATR). Flat at any
    tick rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "high", "low", "close"
    )
    tr_calc = bars.select(
        "event_type",
        "bar_date",
        "high",
        "low",
        "close",
        F.expr(
            "lag(close) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("prev_close"),
    )
    tr = tr_calc.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(
            """CASE WHEN prev_close IS NULL THEN high - low
               ELSE greatest(high - low, abs(high - prev_close),
                             abs(low - prev_close)) END"""
        ).alias("true_range"),
    )
    a = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {ATR_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    ewma_list = (
        f"collect_list(close) OVER (PARTITION BY event_type "
        f"ORDER BY bar_date ROWS BETWEEN {EWMA_HORIZON - 1} PRECEDING "
        f"AND CURRENT ROW)"
    )
    layered = tr.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(_tewma_spark(ewma_list, f"{EWMA_DECAY}D")).alias("center"),
        F.expr(
            f"""CAST(CAST(
                CAST(SUM(CAST(true_range AS DECIMAL(18,4))) OVER ({a})
                     AS DOUBLE) / COUNT(*) OVER ({a})
                AS DECIMAL(18,6)) AS DOUBLE)"""
        ).alias("atr"),
    )
    m = KELTNER_MULT
    return layered.select(
        "event_type",
        "bar_date",
        "close",
        "center",
        "atr",
        F.expr(f"center + {m} * atr").alias("upper_band"),
        F.expr(f"center - {m} * atr").alias("lower_band"),
        F.expr(f"close > center + {m} * atr").alias("breakout_up"),
        F.expr(f"close < center - {m} * atr").alias("breakout_down"),
    )


BOLL_TAPS = 20  # Bollinger lookback
BOLL_K = 2      # band half-width in stddevs


@query(
    "ts_bollinger",
    oracle=f"""
    WITH {_BARS_ORACLE},
    framed AS (
        SELECT event_type, bar_date, close,
               CAST(SUM(CAST(close AS DECIMAL(38,4))) OVER w AS DOUBLE)
                   AS s1,
               CAST(SUM(CAST(CAST(close AS DECIMAL(19,4))
                             * CAST(close AS DECIMAL(19,4))
                             AS DECIMAL(38,8))) OVER w AS DOUBLE) AS s2,
               CAST(COUNT(*) OVER w AS BIGINT) AS n
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {BOLL_TAPS - 1} PRECEDING
                              AND CURRENT ROW)
    )
    SELECT event_type, bar_date, close, n,
           s1 / n AS ma,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN sqrt((s2 - s1 * s1 / n) / (n - 1))
                ELSE CAST(0.0 AS DOUBLE) END AS sigma,
           s1 / n + {BOLL_K} * (CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN sqrt((s2 - s1 * s1 / n) / (n - 1))
                ELSE CAST(0.0 AS DOUBLE) END) AS upper_band,
           s1 / n - {BOLL_K} * (CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN sqrt((s2 - s1 * s1 / n) / (n - 1))
                ELSE CAST(0.0 AS DOUBLE) END) AS lower_band,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN (close - (s1 / n - {BOLL_K} * sqrt((s2 - s1 * s1 / n)
                                                        / (n - 1))))
                     / (2 * {BOLL_K} * sqrt((s2 - s1 * s1 / n) / (n - 1)))
                ELSE CAST(0.5 AS DOUBLE) END AS pct_b
    FROM framed
    """,
)
def ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands over daily bars: 20-bar moving average with bands
    at +/-2 sample standard deviations and %B (the close's position
    inside the band) — the mean-reversion envelope completing the
    indicator family next to Keltner's ATR envelope.

    Parity WITHOUT quantization: the frame moments (s1, s2, n) are exact
    decimal/integer, and every downstream operator — divide, subtract,
    multiply, sqrt — is IEEE correctly-rounded, so identical operands
    give bit-identical doubles in both engines with NO decimal quantize
    at any edge. (Quantize-then-double exists for non-correctly-rounded
    libm — pow/ln/exp — and for operands that differ by construction,
    e.g. partial-agg double sums; neither applies here. Contrast ts_ewma,
    whose pow() weights force the quantize.) Degenerate frames (n=1 or
    zero computed variance) pin sigma to 0 and %B to 0.5 identically —
    the guard tests the COMPUTED double variance (s2 − s1²/n) > 0, not
    the exact-moment inequality, because near-constant frames can pass
    s2·n > s1² while cancellation rounds the double variance to 0 and
    %B's division by 2K·sigma crashes under ANSI (the ts_zscore_rolling
    r8 octave catch; zero rows flip at any fixture SF).

    Scale shape: the OHLC partial agg absorbs tick volume; one exchange,
    two decimal accumulators + a count per row over bars (the
    ts_zscore_rolling state pattern on the bar grain). Flat at any tick
    rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    w = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {BOLL_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    framed = bars.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(
            f"CAST(SUM(CAST(close AS DECIMAL(18,4))) OVER ({w}) AS DOUBLE)"
        ).alias("s1"),
        F.expr(
            f"""CAST(SUM(CAST(CAST(close AS DECIMAL(9,4))
                              * CAST(close AS DECIMAL(9,4))
                              AS DECIMAL(18,8))) OVER ({w}) AS DOUBLE)"""
        ).alias("s2"),
        F.expr(f"CAST(COUNT(*) OVER ({w}) AS BIGINT)").alias("n"),
    )
    sigma = """CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
               THEN sqrt((s2 - s1 * s1 / n) / (n - 1))
               ELSE CAST(0.0D AS DOUBLE) END"""
    return framed.select(
        "event_type",
        "bar_date",
        "close",
        "n",
        F.expr("s1 / n").alias("ma"),
        F.expr(sigma).alias("sigma"),
        F.expr(f"s1 / n + {BOLL_K} * ({sigma})").alias("upper_band"),
        F.expr(f"s1 / n - {BOLL_K} * ({sigma})").alias("lower_band"),
        F.expr(
            f"""CASE WHEN n > 1 AND (s2 - s1 * s1 / n) > 0
                THEN (close - (s1 / n - {BOLL_K} * sqrt((s2 - s1 * s1 / n)
                                                        / (n - 1))))
                     / (2 * {BOLL_K} * sqrt((s2 - s1 * s1 / n) / (n - 1)))
                ELSE CAST(0.5D AS DOUBLE) END"""
        ).alias("pct_b"),
    )


ICHI_TENKAN, ICHI_KIJUN, ICHI_SPAN_B = 9, 26, 52
ICHI_SHIFT = 26


@query(
    "ts_ichimoku",
    oracle=f"""
    WITH {_BARS_ORACLE},
    lines AS (
        SELECT event_type, bar_date, close,
               (MAX(high) OVER t + MIN(low) OVER t) / 2 AS tenkan,
               (MAX(high) OVER k + MIN(low) OVER k) / 2 AS kijun,
               (MAX(high) OVER s + MIN(low) OVER s) / 2 AS span_b_raw
        FROM bars
        WINDOW t AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {ICHI_TENKAN - 1} PRECEDING
                              AND CURRENT ROW),
               k AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {ICHI_KIJUN - 1} PRECEDING
                              AND CURRENT ROW),
               s AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {ICHI_SPAN_B - 1} PRECEDING
                              AND CURRENT ROW)
    )
    SELECT event_type, bar_date, close, tenkan, kijun,
           lag((tenkan + kijun) / 2, {ICHI_SHIFT})
               OVER w AS senkou_a,
           lag(span_b_raw, {ICHI_SHIFT}) OVER w AS senkou_b,
           lead(close, {ICHI_SHIFT}) OVER w AS chikou,
           CASE WHEN lag((tenkan + kijun) / 2, {ICHI_SHIFT}) OVER w
                     IS NULL THEN CAST(NULL AS BOOLEAN)
                ELSE close > greatest(
                     lag((tenkan + kijun) / 2, {ICHI_SHIFT}) OVER w,
                     lag(span_b_raw, {ICHI_SHIFT}) OVER w) END
               AS above_cloud
    FROM lines
    WINDOW w AS (PARTITION BY event_type ORDER BY bar_date)
    """,
)
def ts_ichimoku(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ichimoku cloud over daily bars: conversion/base lines (midpoints of
    the 9- and 26-bar high-low ranges), the two cloud spans as seen at
    each bar (the (tenkan+kijun)/2 and 52-bar midpoints plotted 26 bars
    forward, i.e. lagged 26 when read at the current bar), the lagging
    close, and the above-cloud flag.

    Parity: every value is exact-pick MAX/MIN arithmetic — midpoints are
    one add + one halving (correctly-rounded IEEE on identical operands,
    the ts_bollinger zero-quantization argument), and the span shifts are
    pure lag/lead row moves. No decimal machinery anywhere. Rows inside
    the 26-bar warm-up window emit NULL spans/flags identically in both
    engines.

    Scale shape: the OHLC partial agg absorbs tick volume; all four
    window frames and the shift window share the (event_type) x bar_date
    sort — one exchange, O(1) state per frame. Flat at any tick rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "high", "low", "close"
    )
    def mid(taps: int) -> str:
        f = (
            f"PARTITION BY event_type ORDER BY bar_date "
            f"ROWS BETWEEN {taps - 1} PRECEDING AND CURRENT ROW"
        )
        return f"(MAX(high) OVER ({f}) + MIN(low) OVER ({f})) / 2"
    lines = bars.select(
        "event_type",
        "bar_date",
        "close",
        F.expr(mid(ICHI_TENKAN)).alias("tenkan"),
        F.expr(mid(ICHI_KIJUN)).alias("kijun"),
        F.expr(mid(ICHI_SPAN_B)).alias("span_b_raw"),
    )
    w = "PARTITION BY event_type ORDER BY bar_date"
    sa = f"lag((tenkan + kijun) / 2, {ICHI_SHIFT}) OVER ({w})"
    sb = f"lag(span_b_raw, {ICHI_SHIFT}) OVER ({w})"
    return lines.select(
        "event_type",
        "bar_date",
        "close",
        "tenkan",
        "kijun",
        F.expr(sa).alias("senkou_a"),
        F.expr(sb).alias("senkou_b"),
        F.expr(f"lead(close, {ICHI_SHIFT}) OVER ({w})").alias("chikou"),
        F.expr(
            f"""CASE WHEN {sa} IS NULL THEN CAST(NULL AS BOOLEAN)
                ELSE close > greatest({sa}, {sb}) END"""
        ).alias("above_cloud"),
    )


_THEILSEN_CAP = 128  # pairwise work is capped at 128^2/2 slopes per group


@query(
    "ts_theilsen",
    oracle=f"""
    WITH pts AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               epoch_us(ts) AS t_us, value,
               row_number() OVER (
                   PARTITION BY event_type, CAST(ts AS DATE)
                   ORDER BY ts, event_id
               ) AS rn
        FROM events
        WHERE value IS NOT NULL
    ),
    capped AS (SELECT * FROM pts WHERE rn <= {_THEILSEN_CAP}),
    slopes AS (
        SELECT a.event_type, a.day,
               (b.value - a.value)
               / (CAST(b.t_us - a.t_us AS DOUBLE) / 1000000.0) AS s
        FROM capped a JOIN capped b
          ON a.event_type = b.event_type AND a.day = b.day
         AND a.rn < b.rn AND b.t_us > a.t_us
    ),
    ranked AS (
        SELECT event_type, day, s,
               row_number() OVER (
                   PARTITION BY event_type, day ORDER BY s
               ) AS sr,
               COUNT(*) OVER (PARTITION BY event_type, day) AS np
        FROM slopes
    )
    SELECT event_type, day,
           CAST(MAX(np) AS BIGINT) AS n_pairs,
           CAST(AVG(s) AS DOUBLE) AS slope_per_sec,
           CAST(AVG(s) * 3600.0 AS DOUBLE) AS slope_per_hour
    FROM ranked
    WHERE sr IN ((np + 1) // 2, (np + 2) // 2)
    GROUP BY event_type, day
    """,
)
def ts_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per (event_type, day): the median of all
    pairwise slopes of value-vs-time — the estimator monitoring uses when
    a day's trend must not be dragged by outlier spikes (up to 29%
    contamination tolerance, vs OLS's zero; complements agg_linreg the
    way ts_anomaly_mad complements z-scores).

    Scale shape: points are capped DETERMINISTICALLY at the first
    128 per group (row_number over the total order (ts, event_id) —
    WindowGroupLimit pushes the cap into the sort), so the pairwise
    self-join is Sigma-bounded at 128^2/2 slopes per group — the
    join_fuzzy_blocked discipline: equi-join on the (event_type, day)
    block key, never an uncapped n^2. One more window ranks slopes
    within the group, and the median is the mean of the middle one or
    two by EXPLICIT rank selection.

    Parity: each slope is one subtraction and one division of identical
    operands (correctly-rounded IEEE, bit-identical — no libm, nothing
    to quantize); selecting the middle ranks by integer arithmetic
    sidesteps percentile-interpolation formula differences between
    engines entirely, and AVG over the selected 1-2 slopes is sum/count
    in both. Slope ties make row_number nondeterministic BETWEEN equal
    values only — rank selection still lands on the same values.

    NULL semantics (r8 nulls probe): a point IS a measurement — NULL
    ticks form no pairs (a NULL slope would also rank NULLS FIRST in
    Spark vs NULLS LAST in DuckDB, shifting the median rank). Filtered
    identically on both sides before the deterministic 128-point cap.
    """
    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pts = (
        e.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.unix_micros("ts").alias("t_us"),
            "value",
            F.expr(
                """row_number() OVER (
                       PARTITION BY event_type, CAST(ts AS DATE)
                       ORDER BY ts, event_id
                   )"""
            ).alias("rn"),
        )
        .filter(F.col("rn") <= _THEILSEN_CAP)
    )
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") == F.col("b.day"))
        & (F.col("a.rn") < F.col("b.rn"))
        & (F.col("b.t_us") > F.col("a.t_us")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.day").alias("day"),
        (
            (F.col("b.value") - F.col("a.value"))
            / (
                (F.col("b.t_us") - F.col("a.t_us")).cast("double")
                / F.lit(1000000.0)
            )
        ).alias("s"),
    )
    ranked = slopes.select(
        "event_type",
        "day",
        "s",
        F.expr(
            "row_number() OVER (PARTITION BY event_type, day ORDER BY s)"
        ).alias("sr"),
        F.expr("COUNT(*) OVER (PARTITION BY event_type, day)").alias("np"),
    )
    return (
        ranked.filter(
            F.expr("sr IN (CAST((np + 1) / 2 AS INT), CAST((np + 2) / 2 AS INT))")
        )
        .groupBy("event_type", "day")
        .agg(
            F.expr("CAST(MAX(np) AS BIGINT)").alias("n_pairs"),
            F.expr("CAST(AVG(s) AS DOUBLE)").alias("slope_per_sec"),
            F.expr("CAST(AVG(s) * 3600.0D AS DOUBLE)").alias("slope_per_hour"),
        )
    )


_PGRAM_K = 8  # harmonics 1..8 over each series' hourly grid
_PI_LIT = "3.141592653589793"  # pinned double literal: engine pi() not trusted


@query(
    "ts_periodogram",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS y
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    idx AS (
        SELECT event_type, y,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hr
               ) - 1 AS t,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM hourly
    ),
    terms AS (
        SELECT i.event_type, i.n, k.k,
               CAST(i.y * cos(2.0 * {_PI_LIT} * k.k * i.t / i.n)
                    AS DECIMAL(18,8)) AS c_term,
               CAST(i.y * sin(2.0 * {_PI_LIT} * k.k * i.t / i.n)
                    AS DECIMAL(18,8)) AS s_term
        FROM idx i CROSS JOIN (
            SELECT unnest(range(1, {_PGRAM_K + 1})) AS k
        ) k
    )
    SELECT event_type, CAST(k AS BIGINT) AS k,
           CAST(MAX(n) AS BIGINT) AS n_obs,
           CAST(SUM(c_term) AS DOUBLE) AS cos_sum,
           CAST(SUM(s_term) AS DOUBLE) AS sin_sum,
           CAST(CAST(SUM(c_term) AS DOUBLE) * CAST(SUM(c_term) AS DOUBLE)
                + CAST(SUM(s_term) AS DOUBLE) * CAST(SUM(s_term) AS DOUBLE)
                AS DOUBLE) AS power
    FROM terms GROUP BY event_type, k
    """,
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram per event series: spectral power at
    harmonics k = 1..8 of each event_type's hourly mean-value series —
    the seasonality detector that finds daily/weekly cycles numerically
    where ts_seasonal_decompose assumes the period and ts_autocorr scans
    lags (a peak at k = n_hours/24 means a daily cycle).

    Parity: hourly means are exact decimal sums over doubles divided
    once; the DFT angle 2*pi*k*t/n is a chain of correctly-rounded IEEE
    ops on identical operands (pi pinned to the same double LITERAL in
    both engines — never each engine's pi()); cos/sin are libm calls
    that differ in the last ulp, so each y*cos / y*sin product term
    QUANTIZES through DECIMAL(18,8) before the exact decimal per-series
    sums (the llm_diversity_index per-term rule); the final power is two
    multiplies and an add on identical doubles.

    Scale shape: the corpus collapses to the O(types x hours) hourly
    grid first (one partial-aggregated groupBy); the k-expansion is a
    bounded x8 map-side cross join OVER GRID ROWS (never over raw
    events), and the spectrum agg re-partitions by (type, k) — a few
    thousand groups at any scale. Flat in corpus size; linear in grid
    length only.
    """
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(value)"
        ).alias("y")
    )
    idx = hourly.select(
        "event_type",
        "y",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY hr) - 1"
        ).alias("t"),
        F.expr("COUNT(*) OVER (PARTITION BY event_type)").alias("n"),
    )
    terms = idx.select(
        "event_type",
        "n",
        F.explode(F.expr(f"sequence(1, {_PGRAM_K})")).alias("k"),
        "y",
        "t",
    ).select(
        "event_type",
        "n",
        "k",
        F.expr(
            f"CAST(y * cos(2.0D * {_PI_LIT}D * k * t / n) AS DECIMAL(18,8))"
        ).alias("c_term"),
        F.expr(
            f"CAST(y * sin(2.0D * {_PI_LIT}D * k * t / n) AS DECIMAL(18,8))"
        ).alias("s_term"),
    )
    return terms.groupBy("event_type", "k").agg(
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_obs"),
        F.expr("CAST(SUM(c_term) AS DOUBLE)").alias("cos_sum"),
        F.expr("CAST(SUM(s_term) AS DOUBLE)").alias("sin_sum"),
        F.expr(
            """CAST(CAST(SUM(c_term) AS DOUBLE) * CAST(SUM(c_term) AS DOUBLE)
               + CAST(SUM(s_term) AS DOUBLE) * CAST(SUM(s_term) AS DOUBLE)
               AS DOUBLE)"""
        ).alias("power"),
    ).select(
        "event_type",
        F.col("k").cast("bigint").alias("k"),
        "n_obs",
        "cos_sum",
        "sin_sum",
        "power",
    )


_VOL_TAPS = 20
_LN2_LIT = "0.6931471805599453"      # ln 2 pinned to the double literal
_GK_COEF = "0.3862943611198906"      # 2 ln 2 - 1, pinned likewise


@query(
    "ts_volatility_ohlc",
    oracle=f"""
    WITH {_BARS_ORACLE},
    terms AS (
        SELECT event_type, bar_date,
               CAST(ln(high / low) * ln(high / low)
                    AS DECIMAL(18,8)) AS p_term,
               CAST(0.5 * ln(high / low) * ln(high / low)
                    - {_GK_COEF} * ln(close / open) * ln(close / open)
                    AS DECIMAL(18,8)) AS gk_term
        FROM bars
        WHERE low > 0 AND open > 0
    )
    SELECT event_type, bar_date,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_bars,
           CAST(SUM(p_term) OVER w AS DOUBLE)
               / (4.0 * CAST({_LN2_LIT} AS DOUBLE) * (COUNT(*) OVER w))
               AS parkinson_var,
           CAST(SUM(gk_term) OVER w AS DOUBLE)
               / (COUNT(*) OVER w) AS garman_klass_var
    FROM terms
    WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                 ROWS BETWEEN {_VOL_TAPS - 1} PRECEDING AND CURRENT ROW)
    """,
)
def ts_volatility_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-based volatility per series: rolling 20-bar Parkinson and
    Garman-Klass variance estimators from the daily OHLC grid — the
    high-low estimators a trading desk prefers over close-to-close
    because the intraday range carries ~5x the information of one close
    print (Parkinson 1980; Garman & Klass 1980). Completes the indicator
    family: ATR gives the range in PRICE units; these give variance in
    RETURN units.

    Built ON ts_resample_ohlc's certified bars (operator composition).

    Parity: each bar's log-range term carries libm ln, so the whole
    term (including its square and the GK linear combination) QUANTIZES
    through DECIMAL(18,8) before the exact decimal frame sums; ln 2 and
    2 ln 2 - 1 are pinned double LITERALS (never each engine's ln(2));
    the final normalizations divide identical doubles by exact integer
    products — correctly-rounded IEEE, bit-identical.

    Scale shape: the OHLC partial agg absorbs tick volume (O(1) reducer
    state per bar); one exchange on event_type; the bounded 20-tap frame
    keeps long-backed decimal window state (the round-4e fast path).
    Flat at any tick rate.
    """
    bars = (
        ts_resample_ohlc(spark, sf_dir)
        .select("event_type", "bar_date", "open", "high", "low", "close")
        # a zero tick makes the log-range undefined; real OHLC feeds
        # drop halted/invalid bars the same way
        .filter(F.expr("low > 0 AND open > 0"))
    )
    terms = bars.select(
        "event_type",
        "bar_date",
        F.expr(
            "CAST(ln(high / low) * ln(high / low) AS DECIMAL(18,8))"
        ).alias("p_term"),
        F.expr(
            f"""CAST(0.5D * ln(high / low) * ln(high / low)
                - {_GK_COEF}D * ln(close / open) * ln(close / open)
                AS DECIMAL(18,8))"""
        ).alias("gk_term"),
    )
    w = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {_VOL_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    return terms.select(
        "event_type",
        "bar_date",
        F.expr(f"CAST(COUNT(*) OVER ({w}) AS BIGINT)").alias("n_bars"),
        F.expr(
            f"""CAST(SUM(p_term) OVER ({w}) AS DOUBLE)
                / (4.0D * {_LN2_LIT}D * (COUNT(*) OVER ({w})))"""
        ).alias("parkinson_var"),
        F.expr(
            f"""CAST(SUM(gk_term) OVER ({w}) AS DOUBLE)
                / (COUNT(*) OVER ({w}))"""
        ).alias("garman_klass_var"),
    )


_MK_CAP = 128  # bars per series entering the pairwise sign sum


@query(
    "ts_mann_kendall",
    oracle=f"""
    WITH {_BARS_ORACLE},
    capped AS (
        SELECT event_type, bar_date, close,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY bar_date
               ) AS rn
        FROM bars
        QUALIFY rn <= {_MK_CAP}
    ),
    s AS (
        SELECT a.event_type,
               CAST(SUM(CASE WHEN b.close > a.close THEN 1
                             WHEN b.close < a.close THEN -1
                             ELSE 0 END) AS BIGINT) AS s_stat
        FROM capped a JOIN capped b
          ON a.event_type = b.event_type AND a.rn < b.rn
        GROUP BY a.event_type
    ),
    nn AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM capped GROUP BY event_type
    ),
    ties AS (
        SELECT event_type,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_corr
        FROM (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
            FROM capped GROUP BY event_type, close
        ) GROUP BY event_type
    )
    SELECT nn.event_type, nn.n, s.s_stat,
           CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_corr
                AS DOUBLE) / 18.0 AS var_s,
           CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1)
                    / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ties.tie_corr AS DOUBLE) / 18.0)
                WHEN s.s_stat < 0 THEN (s.s_stat + 1)
                    / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ties.tie_corr AS DOUBLE) / 18.0)
                ELSE CAST(0.0 AS DOUBLE) END AS z_stat
    FROM nn JOIN s USING (event_type) JOIN ties USING (event_type)
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test per series: the nonparametric is-there-a-
    monotone-trend significance test over the daily close series — the
    inference companion to ts_theilsen's slope estimate (the standard
    pairing: MK says WHETHER the trend is real, Theil-Sen says HOW
    STEEP), distribution-free where agg_linreg's t-stat assumes
    Gaussian residuals. S = Sigma sign(close_j - close_i) over ordered
    pairs; variance tie-corrected: [n(n-1)(2n+5) - Sigma t(t-1)(2t+5)]/18.

    Parity: S and both variance terms are EXACT integer arithmetic
    (sign comparisons never compute differences); the only float ops
    are one /18.0, one sqrt, one division — correctly-rounded IEEE on
    identical operands, bit-identical. The continuity correction
    (S -/+ 1) branches on the exact integer sign. No quantization.

    Scale shape: the OHLC collapse absorbs tick volume; the pairwise
    sign join runs over the 128-bar capped grid (the ts_theilsen
    discipline — Sigma-bounded at 128^2/2 per series); ties and counts
    are grid aggregates. Flat in corpus size.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    # capped (a ≤128-bar grid) feeds FOUR consumers (both self-join
    # sides, n, ties): checkpoint so the tick-absorbing OHLC collapse
    # runs once instead of once per consumer (r5 plan audit: 4 -> 1)
    capped = (
        bars.select(
            "event_type",
            "close",
            F.expr(
                "row_number() OVER"
                " (PARTITION BY event_type ORDER BY bar_date)"
            ).alias("rn"),
        )
        .filter(F.col("rn") <= _MK_CAP)
        .transform(stage)
    )
    a, b = capped.alias("a"), capped.alias("b")
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.rn") < F.col("b.rn")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.expr(
                """CAST(SUM(CASE WHEN b.close > a.close THEN 1
                   WHEN b.close < a.close THEN -1 ELSE 0 END) AS BIGINT)"""
            ).alias("s_stat")
        )
    )
    nn = capped.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    ties = (
        capped.groupBy("event_type", "close")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("t"))
        .groupBy("event_type")
        .agg(
            F.expr(
                "CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)"
            ).alias("tie_corr")
        )
    )
    var_expr = (
        "CAST(n * (n - 1) * (2 * n + 5) - tie_corr AS DOUBLE) / 18.0D"
    )
    return (
        nn.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n",
            "s_stat",
            F.expr(var_expr).alias("var_s"),
            F.expr(
                f"""CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt({var_expr})
                    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt({var_expr})
                    ELSE CAST(0.0D AS DOUBLE) END"""
            ).alias("z_stat"),
        )
    )


_SAX_SEGMENTS = 8
_SAX_BP = "0.6745"  # N(0,1) quartile breakpoint for a 4-letter alphabet


@query(
    "ts_sax_symbolize",
    oracle=f"""
    WITH {_BARS_ORACLE},
    idx AS (
        SELECT event_type, bar_date, close,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY bar_date
               ) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(SUM(CAST(close AS DECIMAL(38,4)))
                    OVER (PARTITION BY event_type) AS DOUBLE) AS sx,
               CAST(SUM(CAST(close AS DECIMAL(38,4))
                        * CAST(close AS DECIMAL(38,4)))
                    OVER (PARTITION BY event_type) AS DOUBLE) AS sxx
        FROM bars
    ),
    z AS (
        SELECT event_type,
               ((rn - 1) * {_SAX_SEGMENTS}) // n AS segment,
               CASE WHEN n > 1 AND (sxx - n * (sx / n) * (sx / n)) > 0
                    THEN CAST((close - sx / n)
                         / sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1))
                         AS DECIMAL(18,8))
                    ELSE CAST(0 AS DECIMAL(18,8)) END AS z_q
        FROM idx
    )
    SELECT event_type, CAST(segment AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(z_q) AS DOUBLE) / COUNT(*) AS paa,
           CASE WHEN CAST(SUM(z_q) AS DOUBLE) / COUNT(*)
                     < -CAST({_SAX_BP} AS DOUBLE) THEN 'a'
                WHEN CAST(SUM(z_q) AS DOUBLE) / COUNT(*)
                     < 0.0 THEN 'b'
                WHEN CAST(SUM(z_q) AS DOUBLE) / COUNT(*)
                     < CAST({_SAX_BP} AS DOUBLE) THEN 'c'
                ELSE 'd' END AS symbol
    FROM z GROUP BY event_type, segment
    """,
)
def ts_sax_symbolize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic approximation per series (Lin et al. 2003): z-
    normalize the daily close series, average into 8 equal PAA segments,
    and map each segment mean onto a 4-letter alphabet by the N(0,1)
    quartile breakpoints — the representation motif-mining, similarity
    indexing, and anomaly dictionaries run on, turning a numeric series
    into a short word ('bcaddcab') that hashes and joins like text.

    Parity: series mean/variance come from exact DECIMAL(38,4) moments
    (order-insensitive), so each z-score is a correctly-rounded IEEE
    chain on identical operands; z QUANTIZES through DECIMAL(18,8)
    per element before the segment sums (partial-agg double sums would
    differ by regrouping — rule 2b), and the PAA mean divides the exact
    decimal sum once. Segment ids are pure integer arithmetic
    ((rn-1)*8 DIV n — never floor() on an inexact double), and the
    breakpoint literal CASTs to DOUBLE in the oracle (the decimal-
    literal trap). Breakpoint comparisons run on identical doubles.

    Degenerate guard (r8 degenerate-corpus probe): a constant series
    (or a 1-bar series) has zero computed variance and the z-divide
    crashes under ANSI; the SAX convention for a constant series is
    all-zero z (every segment symbolizes to the same mid letter), so
    z pins to 0 on the same guard in both engines.

    Scale shape: the OHLC collapse absorbs ticks; both window passes
    ride ONE (event_type) exchange over bar rows; the segment agg is a
    partial-agg'd groupBy on the bounded (series x 8) grid. Flat.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    idx = bars.select(
        "event_type",
        "close",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("rn"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("n"),
        F.expr(
            """CAST(SUM(CAST(close AS DECIMAL(38,4)))
               OVER (PARTITION BY event_type) AS DOUBLE)"""
        ).alias("sx"),
        F.expr(
            """CAST(SUM(CAST(close AS DECIMAL(38,4))
                        * CAST(close AS DECIMAL(38,4)))
               OVER (PARTITION BY event_type) AS DOUBLE)"""
        ).alias("sxx"),
    )
    z = idx.select(
        "event_type",
        F.expr(f"((rn - 1) * {_SAX_SEGMENTS}) DIV n").alias("segment"),
        F.expr(
            """CASE WHEN n > 1 AND (sxx - n * (sx / n) * (sx / n)) > 0D
               THEN CAST((close - sx / n)
                    / sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1))
                    AS DECIMAL(18,8))
               ELSE CAST(0 AS DECIMAL(18,8)) END"""
        ).alias("z_q"),
    )
    paa = "CAST(SUM(z_q) AS DOUBLE) / COUNT(*)"
    return z.groupBy(
        "event_type", F.col("segment").cast("bigint").alias("segment")
    ).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_obs"),
        F.expr(paa).alias("paa"),
        F.expr(
            f"""CASE WHEN {paa} < -{_SAX_BP}D THEN 'a'
                WHEN {paa} < 0.0D THEN 'b'
                WHEN {paa} < {_SAX_BP}D THEN 'c'
                ELSE 'd' END"""
        ).alias("symbol"),
    )


_HURST_WS = (5, 10, 15)  # block sizes for the R/S log-log regression


@query(
    "ts_hurst_rs",
    oracle=f"""
    WITH {_BARS_ORACLE},
    idx AS (
        SELECT event_type, close,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY bar_date
               ) AS rn
        FROM bars
    ),
    blocks AS (
        SELECT i.event_type, w.w, i.close,
               (i.rn - 1) // w.w AS blk,
               row_number() OVER (
                   PARTITION BY i.event_type, w.w, (i.rn - 1) // w.w
                   ORDER BY i.rn
               ) AS brn
        FROM idx i CROSS JOIN (
            SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w
        ) w
    ),
    full_blocks AS (
        SELECT event_type, w, blk, close, brn,
               CAST(SUM(CAST(close AS DECIMAL(38,4)))
                    OVER (PARTITION BY event_type, w, blk) AS DOUBLE) AS bs,
               COUNT(*) OVER (PARTITION BY event_type, w, blk) AS bc
        FROM blocks
        QUALIFY bc = w
    ),
    devs AS (
        SELECT event_type, w, blk,
               CAST(close - bs / w AS DECIMAL(18,8)) AS dev_q,
               CAST((close - bs / w) * (close - bs / w)
                    AS DECIMAL(18,8)) AS dev2_q,
               brn
        FROM full_blocks
    ),
    cums AS (
        SELECT event_type, w, blk,
               SUM(dev_q) OVER (
                   PARTITION BY event_type, w, blk ORDER BY brn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum,
               CAST(SUM(dev2_q) OVER (PARTITION BY event_type, w, blk)
                    AS DOUBLE) AS ss
        FROM devs
    ),
    rs AS (
        SELECT event_type, w, blk,
               CAST(CAST(MAX(cum) - MIN(cum) AS DOUBLE)
                    / sqrt(CAST(MAX(ss) AS DOUBLE) / w)
                    AS DECIMAL(18,8)) AS rs_q
        FROM cums
        GROUP BY event_type, w, blk
        HAVING CAST(MAX(ss) AS DOUBLE) > 0.0
    ),
    pts AS (
        SELECT event_type, w,
               CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(18,8)) AS x_q,
               CAST(ln(CAST(SUM(rs_q) AS DOUBLE) / COUNT(*))
                    AS DECIMAL(18,8)) AS y_q,
               CAST(COUNT(*) AS BIGINT) AS n_blocks
        FROM rs GROUP BY event_type, w
    )
    SELECT event_type, CAST(w AS BIGINT) AS w, n_blocks,
           CAST(y_q AS DOUBLE) AS ln_rs,
           CAST(CAST((COUNT(*) OVER (PARTITION BY event_type)
                  * CAST(SUM(x_q * y_q)
                     OVER (PARTITION BY event_type) AS DOUBLE)
                 - CAST(SUM(x_q) OVER (PARTITION BY event_type) AS DOUBLE)
                   * CAST(SUM(y_q) OVER (PARTITION BY event_type) AS DOUBLE))
                / (COUNT(*) OVER (PARTITION BY event_type)
                   * CAST(SUM(x_q * x_q) OVER (PARTITION BY event_type)
                          AS DOUBLE)
                   - CAST(SUM(x_q) OVER (PARTITION BY event_type) AS DOUBLE)
                     * CAST(SUM(x_q) OVER (PARTITION BY event_type)
                            AS DOUBLE))
                AS DECIMAL(12,6)) AS DOUBLE) AS hurst
    FROM pts
    """,
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis per series: split the
    daily close series into blocks of 5/10/15 bars, compute each block's
    R/S (range of cumulative mean-deviations over its std), and read H
    as the log-log slope of mean R/S vs block size — the long-memory
    diagnostic (H > 0.5 trending, < 0.5 mean-reverting) quant research
    runs before choosing momentum vs reversion models (Hurst 1951;
    Mandelbrot's R/S form).

    Parity: block sums are exact decimals; per-element deviations and
    their squares QUANTIZE to DECIMAL(18,8) so the ordered cumulative
    sum and the block sum-of-squares are exact decimal arithmetic
    (window-internal double summation order is NOT cross-engine-stable —
    rule 2b); R/S divides exact-decimal-derived doubles, re-quantizes;
    ln(mean R/S) and ln(w) quantize (libm); the slope's moment algebra
    runs in exact decimal products cast to double for ONE final division
    (never decimal/decimal — result scales differ, the tpch_q14
    lesson), and the slope QUANTIZES through DECIMAL(12,6): the a*b-c*d
    product-difference is FMA-contractable in a C engine (one rounding)
    but not on the JVM (two) — a genuine 1-ulp divergence class distinct
    from libm, observed here and absorbed by the quantize. Degenerate
    constant blocks (S = 0) are excluded in both engines.

    Scale shape: OHLC collapse absorbs ticks; the x3 block-size expand
    rides the bar grid map-side; every window partitions by
    (series, w, block) — bounded frames, one exchange. Flat.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    idx = bars.select(
        "event_type",
        "close",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("rn"),
    )
    blocks = idx.select(
        "event_type",
        F.explode(
            F.expr(f"array({', '.join(str(w) for w in _HURST_WS)})")
        ).alias("w"),
        "close",
        "rn",
    ).select(
        "event_type",
        "w",
        "close",
        F.expr("(rn - 1) DIV w").alias("blk"),
        F.expr(
            """row_number() OVER (
                   PARTITION BY event_type, w, (rn - 1) DIV w ORDER BY rn
               )"""
        ).alias("brn"),
    )
    full_blocks = blocks.select(
        "*",
        F.expr(
            """CAST(SUM(CAST(close AS DECIMAL(38,4)))
               OVER (PARTITION BY event_type, w, blk) AS DOUBLE)"""
        ).alias("bs"),
        F.expr("COUNT(*) OVER (PARTITION BY event_type, w, blk)").alias("bc"),
    ).filter(F.expr("bc = w"))
    devs = full_blocks.select(
        "event_type",
        "w",
        "blk",
        "brn",
        F.expr("CAST(close - bs / w AS DECIMAL(18,8))").alias("dev_q"),
        F.expr(
            "CAST((close - bs / w) * (close - bs / w) AS DECIMAL(18,8))"
        ).alias("dev2_q"),
    )
    cums = devs.select(
        "event_type",
        "w",
        "blk",
        F.expr(
            """SUM(dev_q) OVER (
                   PARTITION BY event_type, w, blk ORDER BY brn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )"""
        ).alias("cum"),
        F.expr(
            """CAST(SUM(dev2_q) OVER (PARTITION BY event_type, w, blk)
               AS DOUBLE)"""
        ).alias("ss"),
    )
    rs = (
        cums.groupBy("event_type", "w", "blk")
        .agg(
            F.expr(
                """CAST(CAST(MAX(cum) - MIN(cum) AS DOUBLE)
                   / sqrt(CAST(MAX(ss) AS DOUBLE) / w)
                   AS DECIMAL(18,8))"""
            ).alias("rs_q"),
            F.expr("CAST(MAX(ss) AS DOUBLE)").alias("ss_max"),
        )
        .filter(F.col("ss_max") > 0.0)
    )
    pts = rs.groupBy("event_type", "w").agg(
        F.expr("CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(18,8))").alias("x_q"),
        F.expr(
            "CAST(ln(CAST(SUM(rs_q) AS DOUBLE) / COUNT(*)) AS DECIMAL(18,8))"
        ).alias("y_q"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_blocks"),
    )
    slope = (
        "CAST((COUNT(*) OVER (PARTITION BY event_type)"
        " * CAST(SUM(x_q * y_q) OVER (PARTITION BY event_type) AS DOUBLE)"
        " - CAST(SUM(x_q) OVER (PARTITION BY event_type) AS DOUBLE)"
        " * CAST(SUM(y_q) OVER (PARTITION BY event_type) AS DOUBLE))"
        " / (COUNT(*) OVER (PARTITION BY event_type)"
        " * CAST(SUM(x_q * x_q) OVER (PARTITION BY event_type) AS DOUBLE)"
        " - CAST(SUM(x_q) OVER (PARTITION BY event_type) AS DOUBLE)"
        " * CAST(SUM(x_q) OVER (PARTITION BY event_type) AS DOUBLE))"
        " AS DECIMAL(12,6))"
    )
    return pts.select(
        "event_type",
        F.col("w").cast("bigint").alias("w"),
        "n_blocks",
        F.expr("CAST(y_q AS DOUBLE)").alias("ln_rs"),
        F.expr(f"CAST({slope} AS DOUBLE)").alias("hurst"),
    )


_LN_K_LIT = "2.0794415416798357"  # ln(8): pinned double literal


@query(
    "ts_spectral_entropy",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS y
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    idx AS (
        SELECT event_type, y,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY hr
               ) - 1 AS t,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM hourly
    ),
    terms AS (
        SELECT i.event_type, k.k,
               CAST(i.y * cos(2.0 * {_PI_LIT} * k.k * i.t / i.n)
                    AS DECIMAL(18,8)) AS c_term,
               CAST(i.y * sin(2.0 * {_PI_LIT} * k.k * i.t / i.n)
                    AS DECIMAL(18,8)) AS s_term
        FROM idx i CROSS JOIN (
            SELECT unnest(range(1, {_PGRAM_K + 1})) AS k
        ) k
    ),
    spectrum AS (
        SELECT event_type, k,
               CAST(CAST(SUM(c_term) AS DOUBLE) * CAST(SUM(c_term) AS DOUBLE)
                    + CAST(SUM(s_term) AS DOUBLE) * CAST(SUM(s_term) AS DOUBLE)
                    AS DECIMAL(18,6)) AS power_q
        FROM terms GROUP BY event_type, k
    ),
    normed AS (
        SELECT event_type, k, power_q,
               CAST(SUM(power_q) OVER (PARTITION BY event_type) AS DOUBLE)
                   AS total
        FROM spectrum
    ),
    ent AS (
        SELECT event_type,
               SUM(CASE WHEN CAST(power_q AS DOUBLE) > 0.0 THEN
                   CAST(-(CAST(power_q AS DOUBLE) / total)
                        * ln(CAST(power_q AS DOUBLE) / total)
                        AS DECIMAL(18,8))
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS h_sum,
               CAST(COUNT(*) AS BIGINT) AS n_freqs
        FROM normed GROUP BY event_type
    )
    SELECT event_type, n_freqs,
           CAST(h_sum AS DOUBLE) AS entropy_nats,
           CAST(h_sum AS DOUBLE) / CAST({_LN_K_LIT} AS DOUBLE)
               AS entropy_norm
    FROM ent
    """,
)
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy per series: Shannon entropy of the normalized
    periodogram power distribution — THE forecastability score (low
    entropy = power concentrated in few frequencies = strongly seasonal
    and predictable; ~1 = white noise), the feature the forecasting
    literature (tsfeatures / Hyndman) ranks series by before choosing
    models. Composes the certified ts_periodogram spectrum.

    Parity: the spectrum re-derives bit-identically (per-term quantized
    cos/sin, exact decimal sums, pinned pi); each power QUANTIZES to
    DECIMAL(18,6) so the normalizing total is an exact decimal sum;
    each share p = power/total divides identical doubles; -p ln p
    quantizes per term (libm); ln(8) is a pinned literal CAST to
    DOUBLE in the oracle (decimal-literal trap). Zero-power bins
    contribute exactly 0 in both engines.

    Scale shape: identical to ts_periodogram (grid collapse, bounded
    x8 expand) plus one window + one agg over the (series x 8)
    spectrum grid. Flat.
    """
    spectrum = ts_periodogram(spark, sf_dir).select(
        "event_type",
        "k",
        F.expr("CAST(power AS DECIMAL(18,6))").alias("power_q"),
    )
    normed = spectrum.select(
        "event_type",
        "k",
        "power_q",
        F.expr(
            "CAST(SUM(power_q) OVER (PARTITION BY event_type) AS DOUBLE)"
        ).alias("total"),
    )
    ent = normed.groupBy("event_type").agg(
        F.expr(
            """SUM(CASE WHEN CAST(power_q AS DOUBLE) > 0.0D THEN
               CAST(-(CAST(power_q AS DOUBLE) / total)
                    * ln(CAST(power_q AS DOUBLE) / total)
                    AS DECIMAL(18,8))
               ELSE CAST(0 AS DECIMAL(18,8)) END)"""
        ).alias("h_sum"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_freqs"),
    )
    return ent.select(
        "event_type",
        "n_freqs",
        F.expr("CAST(h_sum AS DOUBLE)").alias("entropy_nats"),
        F.expr(f"CAST(h_sum AS DOUBLE) / {_LN_K_LIT}D").alias("entropy_norm"),
    )


_XCORR_MAX_LAG = 3
_XCORR_A, _XCORR_B = "click", "purchase"


@query(
    "ts_lead_lag_xcorr",
    oracle=f"""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS y
        FROM events
        WHERE event_type IN ('{_XCORR_A}', '{_XCORR_B}')
        GROUP BY event_type, date_trunc('hour', ts)
    ),
    xs AS (SELECT hr, y AS x FROM hourly WHERE event_type = '{_XCORR_A}'),
    ys AS (SELECT hr, y FROM hourly WHERE event_type = '{_XCORR_B}'),
    lags AS (SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1}))
                 AS lag),
    pairs AS (
        SELECT l.lag, xs.hr, xs.x, ys.y
        FROM lags l
        JOIN xs ON TRUE
        JOIN ys ON ys.hr = xs.hr + to_hours(CAST(l.lag AS BIGINT))
    ),
    ps AS MATERIALIZED (
        -- MATERIALIZED: the recursive folds below re-scan this frame
        -- once per element; without the hint DuckDB inlines the whole
        -- upstream pipeline into every iteration
        SELECT lag, x, y,
               ROW_NUMBER() OVER (PARTITION BY lag ORDER BY hr) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY lag) AS BIGINT) AS n
        FROM pairs
    ),
    f1 AS (
        -- strict sequential left fold via recursion (BASELINE.md DuckDB
        -- hazard rule 2: list_reduce over multi-row ~700-element lists
        -- was observed nondeterministic; a window SUM is deterministic
        -- but segment-tree-ordered, 1 ulp off the fold — measured).
        -- Seed 0.0 + x mirrors Spark's aggregate(p, 0D, ...) exactly.
        SELECT lag, n, rn AS i, 0.0::DOUBLE + x AS sx, 0.0::DOUBLE + y AS sy
        FROM ps WHERE rn = 1
        UNION ALL
        SELECT p.lag, p.n, p.rn, f.sx + p.x, f.sy + p.y
        FROM f1 f JOIN ps p ON p.lag = f.lag AND p.rn = f.i + 1
    ),
    m AS (SELECT lag, n, sx / n AS mx, sy / n AS my FROM f1 WHERE i = n),
    centered AS MATERIALIZED (
        -- centered products at ROW level (the ts_cusum_changepoint
        -- DuckDB-1.0 lesson: never capture an outer column inside a
        -- list lambda when the query carries multiple list rows)
        SELECT p.lag, p.rn, p.n,
               (p.x - m.mx) * (p.y - m.my) AS cxy,
               (p.x - m.mx) * (p.x - m.mx) AS cxx,
               (p.y - m.my) * (p.y - m.my) AS cyy
        FROM ps p JOIN m USING (lag)
    ),
    f2 AS (
        SELECT lag, n, rn AS i, 0.0::DOUBLE + cxy AS sxy,
               0.0::DOUBLE + cxx AS sxx, 0.0::DOUBLE + cyy AS syy
        FROM centered WHERE rn = 1
        UNION ALL
        SELECT c.lag, c.n, c.rn, f.sxy + c.cxy, f.sxx + c.cxx,
               f.syy + c.cyy
        FROM f2 f JOIN centered c ON c.lag = f.lag AND c.rn = f.i + 1
    ),
    folded AS (SELECT lag, sxy, sxx, syy FROM f2 WHERE i = n)
    SELECT CAST(f.lag AS BIGINT) AS lag, m.n AS n_pairs,
           CASE WHEN f.sxx > 0 AND f.syy > 0
                THEN f.sxy / (sqrt(f.sxx) * sqrt(f.syy))
                ELSE CAST(NULL AS DOUBLE) END AS xcorr
    FROM folded f JOIN m USING (lag)
    """,
)
def ts_lead_lag_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the click and purchase hourly
    series at lags -3..+3 hours: does engagement LEAD conversion (peak
    at positive lag) or move with it — the lead-lag discovery scan a
    growth/quant team runs before building any predictive feature on a
    companion series (the cross-series generalization of ts_autocorr).

    Parity: hourly means are decimal-exact; each lag's pair means come
    from quantized exact decimal sums divided once; per-element
    CENTERED products quantize to DECIMAL(18,8) before exact decimal
    sums (partial-agg double order — rule 2b), and the final
    correlation is Sxy / (sqrt(Sxx) * sqrt(Syy)) — a divide of a
    product of sqrts on identical operands, a shape that CANNOT
    FMA-contract (no a*b+c), so no final quantize is needed
    (the centered-moments algebra avoids the hurst slope's
    product-difference entirely).

    Scale shape: the corpus collapses to two hourly series first; the
    x7 lag expand joins grid rows on shifted hour keys (equi-join,
    bounded by 7 x grid length); means broadcast back per lag. Flat in
    event volume; linear in calendar span.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_XCORR_A, _XCORR_B)
    )
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(value)"
        ).alias("y")
    )
    # hourly (a bounded grid) feeds both series branches, and pairs
    # feeds both the means and the centered moments: checkpoint each so
    # the event stream is scanned once and the lag fan-out built once
    # (r5 plan audit: 4 event scans -> 1)
    hourly = hourly.transform(stage)
    xs = hourly.filter(F.col("event_type") == _XCORR_A).select(
        "hr", F.col("y").alias("x")
    )
    ys = hourly.filter(F.col("event_type") == _XCORR_B).select("hr", "y")
    lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    xs_l = xs.crossJoin(F.broadcast(lags)).select(
        "lag",
        "x",
        F.col("hr").alias("x_hr"),
        F.expr("hr + make_interval(0, 0, 0, 0, CAST(lag AS INT), 0, 0)").alias(
            "y_hr"
        ),
    )
    pairs = xs_l.join(ys.withColumnRenamed("hr", "y_hr"), "y_hr").select(
        "lag", F.col("x_hr").alias("h"), "x", "y"
    )
    # Each lag's moments are SEQUENTIAL FOLDS over its hr-sorted pair
    # array (calendar-bounded: ~hours-in-span elements per lag at ANY
    # corpus size) — Spark aggregate ≡ DuckDB list_reduce, IEEE-identical,
    # ZERO quantization. The previous form quantized COMPUTED doubles
    # (hourly means to DECIMAL(18,6), centered products to DECIMAL(18,8)):
    # the r7 sf0.1 audit caught the rule-9 class per element — every lag's
    # xcorr drifted at the 12th digit once one element hit a shortest-repr
    # midpoint.
    grouped = pairs.groupBy("lag").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.sort_array(F.collect_list(F.struct("h", "x", "y"))).alias("p"),
    )
    m = grouped.select(
        "lag",
        "n",
        "p",
        F.expr("aggregate(p, 0D, (s, e) -> s + e.x) / n").alias("mx"),
        F.expr("aggregate(p, 0D, (s, e) -> s + e.y) / n").alias("my"),
    )
    # Degenerate guard (r8 degenerate-corpus probe): a flat-lined series
    # folds sxx (a sum of NON-NEGATIVE squares — no cancellation) to
    # exactly 0, and x/sqrt(0) is an ANSI DIVIDE_BY_ZERO crash; the
    # correlation is undefined there, so emit NULL on the same fold
    # values in both engines.
    moments = m.select(
        "lag",
        "n",
        F.expr(
            "aggregate(p, 0D, (s, e) -> s + (e.x - mx) * (e.y - my))"
        ).alias("sxy"),
        F.expr(
            "aggregate(p, 0D, (s, e) -> s + (e.x - mx) * (e.x - mx))"
        ).alias("sxx"),
        F.expr(
            "aggregate(p, 0D, (s, e) -> s + (e.y - my) * (e.y - my))"
        ).alias("syy"),
    )
    return moments.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.expr(
            """CASE WHEN sxx > 0D AND syy > 0D
               THEN sxy / (sqrt(sxx) * sqrt(syy))
               ELSE CAST(NULL AS DOUBLE) END"""
        ).alias("xcorr"),
    )


_ADX_TAPS = 14


@query(
    "ts_adx",
    oracle=f"""
    WITH {_BARS_ORACLE},
    moves AS (
        SELECT event_type, bar_date, high, low, close,
               lag(high) OVER w AS ph, lag(low) OVER w AS pl,
               lag(close) OVER w AS pc
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date)
    ),
    dm AS (
        SELECT event_type, bar_date,
               CAST(CASE WHEN ph IS NULL THEN NULL
                    WHEN high - ph > pl - low AND high - ph > 0
                        THEN high - ph ELSE 0 END AS DECIMAL(18,6)) AS pdm,
               CAST(CASE WHEN ph IS NULL THEN NULL
                    WHEN pl - low > high - ph AND pl - low > 0
                        THEN pl - low ELSE 0 END AS DECIMAL(18,6)) AS ndm,
               CAST(CASE WHEN pc IS NULL THEN high - low
                    ELSE greatest(high - low, abs(high - pc), abs(low - pc))
                    END AS DECIMAL(18,6)) AS tr
        FROM moves
    ),
    sums AS (
        SELECT event_type, bar_date,
               CAST(SUM(pdm) OVER w AS DOUBLE) AS s_pdm,
               CAST(SUM(ndm) OVER w AS DOUBLE) AS s_ndm,
               CAST(SUM(tr) OVER w AS DOUBLE) AS s_tr,
               COUNT(pdm) OVER w AS n_dm
        FROM dm
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {_ADX_TAPS - 1} PRECEDING AND CURRENT ROW)
    ),
    di AS (
        SELECT event_type, bar_date, n_dm,
               100.0 * s_pdm / s_tr AS di_plus,
               100.0 * s_ndm / s_tr AS di_minus,
               CASE WHEN s_pdm + s_ndm = 0 THEN CAST(0.0 AS DECIMAL(18,8))
                    ELSE CAST(100.0 * abs(s_pdm - s_ndm) / (s_pdm + s_ndm)
                         AS DECIMAL(18,8)) END AS dx_q
        FROM sums WHERE n_dm >= {_ADX_TAPS} AND s_tr > 0
    )
    SELECT event_type, bar_date,
           CAST(di_plus AS DOUBLE) AS di_plus,
           CAST(di_minus AS DOUBLE) AS di_minus,
           CAST(dx_q AS DOUBLE) AS dx,
           CAST(SUM(dx_q) OVER w2 AS DOUBLE) / (COUNT(*) OVER w2) AS adx
    FROM di
    WINDOW w2 AS (PARTITION BY event_type ORDER BY bar_date
                  ROWS BETWEEN {_ADX_TAPS - 1} PRECEDING AND CURRENT ROW)
    """,
)
def ts_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average Directional Index (Wilder 1978, SMA variant) over daily
    bars: directional movement (+DM/-DM), 14-bar directional indicators
    DI+/DI-, their normalized spread DX, and ADX as the 14-bar mean of
    DX — the trend-STRENGTH gauge that tells a strategy whether
    ts_macd/ts_theilsen trend signals are worth acting on (ADX < 20 =
    no trend regardless of direction). Completes the Wilder set beside
    ts_rsi and ts_atr.

    Parity: +DM/-DM/TR are fixed IEEE compare/subtract trees on raw
    picked bars, quantized to DECIMAL(18,6) so the 14-tap frame sums
    are exact long-backed decimals; DI ratios divide identical doubles
    (100.0 is binary-exact); DX = 100|a-b|/(a+b) is subtract/add/divide
    on identical operands — no a*b+c shape, nothing FMA-contractable —
    and quantizes to DECIMAL(18,8) ONLY so the ADX frame mean sums
    exactly (rule 2b); warmup rows (fewer than 14 DMs) and zero-range
    frames are excluded identically in both engines.

    Scale shape: OHLC collapse absorbs ticks; all three window passes
    (lag, DM sums, ADX mean) ride ONE (event_type) exchange over bar
    rows with bounded frames. Flat at any tick rate.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "high", "low", "close"
    )
    w = "PARTITION BY event_type ORDER BY bar_date"
    moves = bars.select(
        "event_type",
        "bar_date",
        "high",
        "low",
        "close",
        F.expr(f"lag(high) OVER ({w})").alias("ph"),
        F.expr(f"lag(low) OVER ({w})").alias("pl"),
        F.expr(f"lag(close) OVER ({w})").alias("pc"),
    )
    dm = moves.select(
        "event_type",
        "bar_date",
        F.expr(
            """CAST(CASE WHEN ph IS NULL THEN NULL
               WHEN high - ph > pl - low AND high - ph > 0
                   THEN high - ph ELSE 0 END AS DECIMAL(18,6))"""
        ).alias("pdm"),
        F.expr(
            """CAST(CASE WHEN ph IS NULL THEN NULL
               WHEN pl - low > high - ph AND pl - low > 0
                   THEN pl - low ELSE 0 END AS DECIMAL(18,6))"""
        ).alias("ndm"),
        F.expr(
            """CAST(CASE WHEN pc IS NULL THEN high - low
               ELSE greatest(high - low, abs(high - pc), abs(low - pc))
               END AS DECIMAL(18,6))"""
        ).alias("tr"),
    )
    wf = (
        f"PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {_ADX_TAPS - 1} PRECEDING AND CURRENT ROW"
    )
    sums = dm.select(
        "event_type",
        "bar_date",
        F.expr(f"CAST(SUM(pdm) OVER ({wf}) AS DOUBLE)").alias("s_pdm"),
        F.expr(f"CAST(SUM(ndm) OVER ({wf}) AS DOUBLE)").alias("s_ndm"),
        F.expr(f"CAST(SUM(tr) OVER ({wf}) AS DOUBLE)").alias("s_tr"),
        F.expr(f"COUNT(pdm) OVER ({wf})").alias("n_dm"),
    )
    di = sums.filter(
        F.expr(f"n_dm >= {_ADX_TAPS} AND s_tr > 0")
    ).select(
        "event_type",
        "bar_date",
        F.expr("100.0D * s_pdm / s_tr").alias("di_plus"),
        F.expr("100.0D * s_ndm / s_tr").alias("di_minus"),
        F.expr(
            """CASE WHEN s_pdm + s_ndm = 0 THEN CAST(0.0 AS DECIMAL(18,8))
               ELSE CAST(100.0D * abs(s_pdm - s_ndm) / (s_pdm + s_ndm)
               AS DECIMAL(18,8)) END"""
        ).alias("dx_q"),
    )
    return di.select(
        "event_type",
        "bar_date",
        "di_plus",
        "di_minus",
        F.expr("CAST(dx_q AS DOUBLE)").alias("dx"),
        F.expr(
            f"CAST(SUM(dx_q) OVER ({wf}) AS DOUBLE) / (COUNT(*) OVER ({wf}))"
        ).alias("adx"),
    )


@query(
    "ts_var_es",
    oracle=f"""
    WITH {_BARS_ORACLE},
    rets AS (
        SELECT event_type, bar_date,
               close / lag(close) OVER (
                   PARTITION BY event_type ORDER BY bar_date
               ) - 1.0 AS r
        FROM bars
        QUALIFY r IS NOT NULL
    ),
    ret_ranked AS (
        SELECT event_type, r,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY r
               ) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM rets
    ),
    var_pick AS (
        SELECT event_type, n,
               MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN r END) AS var_5
        FROM ret_ranked GROUP BY event_type, n
    )
    SELECT k.event_type, k.n AS n_returns,
           CAST(k.var_5 AS DOUBLE) AS var_5pct,
           CAST(SUM(CASE WHEN t.r <= k.var_5
                    THEN CAST(t.r AS DECIMAL(18,10))
                    ELSE CAST(0 AS DECIMAL(18,10)) END) AS DOUBLE)
               / SUM(CASE WHEN t.r <= k.var_5 THEN 1 ELSE 0 END)
               AS es_5pct,
           CAST(SUM(CASE WHEN t.r <= k.var_5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tail
    FROM var_pick k JOIN rets t ON k.event_type = t.event_type
    GROUP BY k.event_type, k.n, k.var_5
    """,
)
def ts_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per series: the
    5% worst daily simple return by EXACT nearest-rank selection, and
    the mean of the tail at or beyond it — the risk pair every desk
    reports (VaR says the threshold; ES says how bad the tail actually
    is, the Basel-preferred coherent measure). Daily returns come from
    the certified OHLC closes.

    Parity: each return is one division and subtraction of identical
    operands (bit-identical); the VaR pick uses the integer
    nearest-rank arithmetic ((5n+99) DIV 100 — the agg_winsorized_mean
    rule, never percentile interpolation); tail membership compares
    identical doubles against the picked value; the ES mean QUANTIZES
    each tail return to DECIMAL(18,10) for an exact decimal sum
    (partial-agg order — rule 2b) divided by the exact tail count.

    Scale shape: OHLC collapse absorbs ticks; the rank window rides the
    per-series bar grid; the tail aggregation re-joins the picked
    threshold (a |series|-row broadcast) onto the return grid. Flat.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    rets = bars.select(
        "event_type",
        F.expr(
            """close / lag(close) OVER (
                   PARTITION BY event_type ORDER BY bar_date
               ) - 1.0D"""
        ).alias("r"),
    ).filter(F.col("r").isNotNull())
    ranked = rets.select(
        "event_type",
        "r",
        F.expr(
            "row_number() OVER (PARTITION BY event_type ORDER BY r)"
        ).alias("rn"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("n"),
    )
    var_pick = ranked.groupBy("event_type", "n").agg(
        F.expr("MAX(CASE WHEN rn = (5 * n + 99) DIV 100 THEN r END)").alias(
            "var_5"
        )
    )
    return (
        rets.join(F.broadcast(var_pick), "event_type")
        .groupBy("event_type", "n", "var_5")
        .agg(
            F.expr(
                """CAST(SUM(CASE WHEN r <= var_5
                   THEN CAST(r AS DECIMAL(18,10))
                   ELSE CAST(0 AS DECIMAL(18,10)) END) AS DOUBLE)
                   / SUM(CASE WHEN r <= var_5 THEN 1 ELSE 0 END)"""
            ).alias("es_5pct"),
            F.expr(
                "CAST(SUM(CASE WHEN r <= var_5 THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_tail"),
        )
        .select(
            "event_type",
            F.col("n").alias("n_returns"),
            F.expr("CAST(var_5 AS DOUBLE)").alias("var_5pct"),
            "es_5pct",
            "n_tail",
        )
    )


_PEAK_WING = 6  # prominence window: 6 hours each side


@query(
    "ts_peak_detection",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS y
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    ctx AS (
        SELECT event_type, hr, y,
               lag(y) OVER w AS y_prev,
               lead(y) OVER w AS y_next,
               MIN(y) OVER (w ROWS BETWEEN {_PEAK_WING} PRECEDING
                            AND 1 PRECEDING) AS left_min,
               MIN(y) OVER (w ROWS BETWEEN 1 FOLLOWING
                            AND {_PEAK_WING} FOLLOWING) AS right_min
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr)
    )
    SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hr_str, y,
           CAST(y - greatest(left_min, right_min) AS DOUBLE) AS prominence
    FROM ctx
    WHERE y_prev IS NOT NULL AND y_next IS NOT NULL
      AND left_min IS NOT NULL AND right_min IS NOT NULL
      AND y > y_prev AND y > y_next
      AND y - greatest(left_min, right_min) > 0
    """,
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection with windowed prominence over each hourly
    series: a peak is strictly above both neighbors, and its prominence
    is the rise above the higher of the two flanking 6-hour minima —
    the spike-finder behind alerting ("traffic peaked at 14:00, 3.2
    units above its surroundings") and event labeling, giving
    ts_anomaly_mad's global outlier score a LOCAL, shape-aware
    companion.

    Parity: hourly means are decimal-exact; neighbors and flanking
    minima are exact value PICKS over the (event_type, hr) total order
    (hr is unique per series); the prominence is one subtraction of a
    greatest() of identical doubles — all correctly-rounded IEEE,
    nothing to quantize. Boundary rows (missing neighbor or wing) are
    excluded identically in both engines.

    Scale shape: the corpus collapses to the hourly grid first; all
    four window functions share ONE (event_type) exchange with bounded
    frames. Flat in event volume.
    """
    e = load(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.expr(
            "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) / COUNT(value)"
        ).alias("y")
    )
    w = "PARTITION BY event_type ORDER BY hr"
    ctx = hourly.select(
        "event_type",
        "hr",
        "y",
        F.expr(f"lag(y) OVER ({w})").alias("y_prev"),
        F.expr(f"lead(y) OVER ({w})").alias("y_next"),
        F.expr(
            f"""MIN(y) OVER ({w} ROWS BETWEEN {_PEAK_WING} PRECEDING
                AND 1 PRECEDING)"""
        ).alias("left_min"),
        F.expr(
            f"""MIN(y) OVER ({w} ROWS BETWEEN 1 FOLLOWING
                AND {_PEAK_WING} FOLLOWING)"""
        ).alias("right_min"),
    )
    return ctx.filter(
        F.expr(
            """y_prev IS NOT NULL AND y_next IS NOT NULL
               AND left_min IS NOT NULL AND right_min IS NOT NULL
               AND y > y_prev AND y > y_next
               AND y - greatest(left_min, right_min) > 0"""
        )
    ).select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hr_str"),
        "y",
        F.expr("CAST(y - greatest(left_min, right_min) AS DOUBLE)").alias(
            "prominence"
        ),
    )


_ES_WING = 3  # event-study window: 3 days each side


@query(
    "ts_event_study_car",
    oracle=f"""
    WITH {_BARS_ORACLE},
    vols AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS bar_date,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS day_vol
        FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
    ),
    rets AS (
        SELECT b.event_type, b.bar_date, v.day_vol,
               b.close / lag(b.close) OVER (
                   PARTITION BY b.event_type ORDER BY b.bar_date
               ) - 1.0 AS r,
               row_number() OVER (
                   PARTITION BY b.event_type ORDER BY b.bar_date
               ) AS day_idx
        FROM bars b JOIN vols v
          ON b.event_type = v.event_type AND b.bar_date = v.bar_date
        QUALIFY r IS NOT NULL
    ),
    vol_ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY day_vol DESC, bar_date
               ) AS vrn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM rets
    ),
    events_d AS (
        SELECT event_type, day_idx AS event_idx
        FROM vol_ranked WHERE vrn * 10 <= n
    ),
    mu AS (
        SELECT event_type,
               CAST(SUM(CAST(r AS DECIMAL(18,10))) AS DOUBLE) / COUNT(*)
                   AS mean_r
        FROM rets GROUP BY event_type
    ),
    panel AS (
        SELECT r.event_type,
               CAST(r.day_idx - e.event_idx AS BIGINT) AS evt_offset,
               CAST((r.r - m.mean_r) AS DECIMAL(18,10)) AS ar_q
        FROM rets r
        JOIN events_d e ON r.event_type = e.event_type
         AND r.day_idx BETWEEN e.event_idx - {_ES_WING}
                           AND e.event_idx + {_ES_WING}
        JOIN mu m ON r.event_type = m.event_type
    ),
    by_offset AS (
        SELECT event_type, evt_offset,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM(ar_q) AS DOUBLE) / COUNT(*) AS mean_ar
        FROM panel GROUP BY event_type, evt_offset
    ),
    arrs AS (
        SELECT event_type,
               list_sort(list(struct_pack(
                   o := evt_offset, m := mean_ar, n := n_obs))) AS a
        FROM by_offset GROUP BY event_type
    )
    SELECT event_type,
           a[i].o AS evt_offset,
           a[i].n AS n_obs,
           a[i].m AS mean_ar,
           CAST(list_reduce(list_transform(list_slice(a, 1, i),
                x -> x.m), (s, x) -> s + x) AS DOUBLE) AS car
    FROM arrs, (SELECT unnest(range(1, 8)) AS i) idx
    WHERE i <= len(a)
    """,
)
def ts_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around high-volume days: mean abnormal return (vs the
    series mean) at each offset in a +/-3-day window around top-decile
    volume days, and the cumulative abnormal return path — the
    MacKinlay (1997) design behind 'does X move the price', applied
    here to volume shocks; the causal-analysis complement to
    ts_lead_lag_xcorr's symmetric correlation scan.

    Parity: returns are correctly-rounded chains on picked closes;
    event days come from an EXACT integer rank rule (vrn*10 <= n —
    total-ordered on (volume DESC, date)); abnormal returns quantize to
    DECIMAL(18,10) before the exact panel sums (rule 2b); the CAR
    cumulative folds the bounded 7-offset mean array SEQUENTIALLY in
    offset order in both engines (Spark aggregate / DuckDB list_reduce
    — the llm_sim_search discipline), because re-quantizing a computed
    double mean hits the shortest-repr-vs-exact-binary double->decimal
    divergence (the exprs.py hazard, observed here at 1 decimal ulp).

    Scale shape: tick volume collapses to daily bars/volumes first; the
    event join fans out a bounded 7-day window per event day over the
    bar grid (equi-join on series + range on the integer day index —
    never a cross join); the offset panel is a bounded (series x 7)
    grid. Flat in tick volume.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    e = load(spark, sf_dir, "events")
    vols = e.groupBy(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("bar_date"),
    ).agg(
        F.expr(
            "CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT))"
            " AS BIGINT)"
        ).alias("day_vol")
    )
    # rets (a bounded daily-bar grid) feeds THREE consumers — the event
    # ranking, the series mean, and the offset panel: checkpoint so the
    # two event-stream aggregations behind it run once instead of once
    # per consumer (r5 plan audit: 6 event scans -> 2)
    rets = (
        bars.join(vols, ["event_type", "bar_date"])
        .select(
            "event_type",
            "bar_date",
            "day_vol",
            F.expr(
                """close / lag(close) OVER (
                       PARTITION BY event_type ORDER BY bar_date
                   ) - 1.0D"""
            ).alias("r"),
            F.expr(
                """row_number() OVER (
                       PARTITION BY event_type ORDER BY bar_date
                   )"""
            ).alias("day_idx"),
        )
        .filter(F.col("r").isNotNull())
        .transform(stage)
    )
    vol_ranked = rets.select(
        "*",
        F.expr(
            """row_number() OVER (
                   PARTITION BY event_type ORDER BY day_vol DESC, bar_date
               )"""
        ).alias("vrn"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("n"),
    )
    events_d = vol_ranked.filter(F.expr("vrn * 10 <= n")).select(
        "event_type", F.col("day_idx").alias("event_idx")
    )
    mu = rets.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CAST(r AS DECIMAL(18,10))) AS DOUBLE) / COUNT(*)"
        ).alias("mean_r")
    )
    panel = (
        rets.join(F.broadcast(events_d), "event_type")
        .filter(
            F.expr(
                f"day_idx BETWEEN event_idx - {_ES_WING}"
                f" AND event_idx + {_ES_WING}"
            )
        )
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type",
            F.expr("CAST(day_idx - event_idx AS BIGINT)").alias("evt_offset"),
            F.expr("CAST((r - mean_r) AS DECIMAL(18,10))").alias("ar_q"),
        )
    )
    by_offset = panel.groupBy("event_type", "evt_offset").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_obs"),
        F.expr("CAST(SUM(ar_q) AS DOUBLE) / COUNT(*)").alias("mean_ar"),
    )
    arrs = by_offset.groupBy("event_type").agg(
        F.expr(
            "sort_array(collect_list("
            "struct(evt_offset AS o, mean_ar AS m, n_obs AS n)))"
        ).alias("a")
    )
    return arrs.select(
        "event_type",
        F.posexplode(F.expr("sequence(1, size(a))")).alias("i0", "i"),
        "a",
    ).select(
        "event_type",
        F.expr("a[i - 1].o").alias("evt_offset"),
        F.expr("a[i - 1].n").alias("n_obs"),
        F.expr("a[i - 1].m").alias("mean_ar"),
        F.expr(
            """CAST(aggregate(transform(slice(a, 1, i), x -> x.m),
               0D, (s, x) -> s + x) AS DOUBLE)"""
        ).alias("car"),
    )


BETA_FRAME = 10
_BETA_SCALE = 10000  # 1e4 fixed-point: DECIMAL(12,4)-exact close prices


@query(
    "ts_rolling_beta",
    oracle=f"""
    WITH {_BARS_ORACLE},
    px AS (
        SELECT event_type, bar_date,
               CAST(CAST(close AS DECIMAL(12,4)) * {_BETA_SCALE} AS BIGINT)
                   AS close_i
        FROM bars
    ),
    d AS (
        SELECT event_type, bar_date,
               close_i - lag(close_i) OVER (PARTITION BY event_type
                                            ORDER BY bar_date) AS di
        FROM px
    ),
    dd AS (SELECT event_type, bar_date, di FROM d WHERE di IS NOT NULL),
    mkt AS (
        SELECT bar_date, CAST(SUM(di) AS BIGINT) AS mi
        FROM dd GROUP BY bar_date
    ),
    j AS (
        SELECT dd.event_type, dd.bar_date, dd.di, mkt.mi
        FROM dd JOIN mkt USING (bar_date)
    ),
    fr AS (
        SELECT event_type, bar_date,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_bars,
               CAST(SUM(di * mi) OVER w AS BIGINT) AS sxy,
               CAST(SUM(di) OVER w AS BIGINT) AS sx,
               CAST(SUM(mi) OVER w AS BIGINT) AS sm,
               CAST(SUM(mi * mi) OVER w AS BIGINT) AS smm
        FROM j
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {BETA_FRAME - 1} PRECEDING
                     AND CURRENT ROW)
    )
    SELECT event_type, bar_date, n_bars,
           CAST(n_bars * sxy - sx * sm AS BIGINT) AS beta_num,
           CAST(n_bars * smm - sm * sm AS BIGINT) AS beta_den,
           CASE WHEN n_bars * smm - sm * sm = 0 THEN NULL
                ELSE CAST(n_bars * sxy - sx * sm AS DOUBLE)
                     / CAST(n_bars * smm - sm * sm AS DOUBLE) END AS beta
    FROM fr WHERE n_bars = {BETA_FRAME}
    """,
)
def ts_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling market beta per series: trailing-10-bar OLS slope of a
    series' daily price moves against the total market move (the sum of
    all series' moves that day) — the systematic-exposure gauge a quant
    desk computes per instrument, here over the engine's daily bars
    (composes the certified ts_resample_ohlc, like ts_atr).
    win_rolling_beta is the within-entity sibling (price-on-quantity per
    supplier); this one is CROSS-series — the regressor is a market
    aggregate built from all series and joined back, which is what makes
    it a different operator shape, not a re-keyed copy.

    Beta is the uncentered-sums OLS form (n·Σxy − Σx·Σm) / (n·Σmm − (Σm)²)
    over the trailing frame; only FULL frames emit (n = 10, BETA_FRAME), and a
    zero-variance market frame yields NULL rather than a division blowup.

    Parity: the llm_kmeans_train scaled-int64 discipline — closes quantize
    through the exact DECIMAL(12,4) cast (fixture prices carry ≤2
    decimals) onto a 1e4 fixed-point BIGINT grid, so diffs, the market
    sum, every product, every frame sum, and both OLS sums are EXACT
    integer arithmetic in both engines (magnitudes ≤ ~1e16 at 10× this
    fixture — far inside int64); the single double division at the end
    divides identical operands (correctly-rounded IEEE, no quantize
    needed). beta_num/beta_den are emitted as exact BIGINTs so the hash
    check is integer-exact on all but the final column.

    Scale shape: the event corpus collapses to the (series × day) bar
    grid FIRST (ts_resample_ohlc's one exchange); the market series is
    one grouped agg on that bounded grid, joined back on bar_date (AQE
    broadcasts it); the rolling frame is one bounded window per series.
    Flat in event volume; linear in calendar span × series count.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type",
        "bar_date",
        F.expr(
            f"CAST(CAST(close AS DECIMAL(12,4)) * {_BETA_SCALE} AS BIGINT)"
        ).alias("close_i"),
    )
    d = bars.select(
        "event_type",
        "bar_date",
        F.expr(
            "close_i - lag(close_i) OVER (PARTITION BY event_type"
            " ORDER BY bar_date)"
        ).alias("di"),
    ).filter(F.col("di").isNotNull())
    mkt = d.groupBy("bar_date").agg(
        F.expr("CAST(SUM(di) AS BIGINT)").alias("mi")
    )
    j = d.join(mkt, "bar_date").select("event_type", "bar_date", "di", "mi")
    w = (
        f"(PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {BETA_FRAME - 1} PRECEDING AND CURRENT ROW)"
    )
    fr = j.select(
        "event_type",
        "bar_date",
        F.expr(f"CAST(COUNT(*) OVER {w} AS BIGINT)").alias("n_bars"),
        F.expr(f"CAST(SUM(di * mi) OVER {w} AS BIGINT)").alias("sxy"),
        F.expr(f"CAST(SUM(di) OVER {w} AS BIGINT)").alias("sx"),
        F.expr(f"CAST(SUM(mi) OVER {w} AS BIGINT)").alias("sm"),
        F.expr(f"CAST(SUM(mi * mi) OVER {w} AS BIGINT)").alias("smm"),
    ).filter(F.col("n_bars") == BETA_FRAME)
    return fr.select(
        "event_type",
        "bar_date",
        "n_bars",
        F.expr("CAST(n_bars * sxy - sx * sm AS BIGINT)").alias("beta_num"),
        F.expr("CAST(n_bars * smm - sm * sm AS BIGINT)").alias("beta_den"),
        F.expr(
            """CASE WHEN n_bars * smm - sm * sm = 0 THEN NULL
               ELSE CAST(n_bars * sxy - sx * sm AS DOUBLE)
                    / CAST(n_bars * smm - sm * sm AS DOUBLE) END"""
        ).alias("beta"),
    )


@query(
    "ts_holt_linear",
    oracle=f"""
    WITH RECURSIVE {_BARS_ORACLE},
    y AS (
        SELECT event_type, close,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY bar_date) AS t
        FROM bars
    ),
    n AS (SELECT event_type, CAST(MAX(t) AS BIGINT) AS n_bars
          FROM y GROUP BY event_type),
    hw AS (
        SELECT y1.event_type, 1 AS t,
               y1.close AS l,
               y2.close - y1.close AS b
        FROM y y1 JOIN y y2
          ON y2.event_type = y1.event_type AND y2.t = 2
        WHERE y1.t = 1
        UNION ALL
        SELECT h.event_type, h.t + 1,
               CAST(0.5 AS DOUBLE) * ((yt.close + h.l) + h.b),
               CAST(0.5 AS DOUBLE) * ((
                   CAST(0.5 AS DOUBLE) * ((yt.close + h.l) + h.b)
                   - h.l) + h.b)
        FROM hw h
        JOIN y yt ON yt.event_type = h.event_type AND yt.t = h.t + 1
        JOIN n ON n.event_type = h.event_type
        WHERE h.t < n.n_bars
    )
    SELECT hw.event_type, n.n_bars,
           hw.l AS level, hw.b AS trend,
           hw.l + hw.b AS forecast_1,
           ((((((hw.l + hw.b) + hw.b) + hw.b) + hw.b) + hw.b) + hw.b)
               + hw.b AS forecast_7
    FROM hw JOIN n ON n.event_type = hw.event_type
    WHERE hw.t = n.n_bars
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per series (level + trend) over
    the daily bars, with 1-step and 7-step-ahead forecasts — the
    trend-aware upgrade of ts_ewma's single smoothing, and the simplest
    forecast ts_forecast_backtest's seasonal-naive baseline is meant to
    be beaten by.

    Smoothing constants are PINNED DYADIC (alpha = beta = 0.5), which
    collapses both recursions to single-multiply-by-0.5 forms:
    l_t = 0.5*((y_t + l_{{t-1}}) + b_{{t-1}}),
    b_t = 0.5*((l_t - l_{{t-1}}) + b_{{t-1}}).
    Multiplying by 0.5 is EXACT in IEEE (power of two), every addition
    is correctly rounded on identical operands with pinned parentheses,
    and no sum-of-two-products shape exists for DuckDB to FMA-contract
    (the ts_hurst_rs class) — so the sequential recursion is
    bit-identical across engines with zero quantization. The 7-step
    forecast is an explicit add-chain for the same reason (l + 7*b is
    an a*b+c FMA shape; seven pinned adds are not). The 0.5 literal is
    CAST to DOUBLE in the oracle (DuckDB's bare-literal DECIMAL trap,
    ts_volatility_ohlc).

    Engine side runs the recursion as a sequential fold over each
    series' sorted bounded bar array (the ts_event_study_car
    discipline: 30 daily closes per series — a bounded frame, not a
    corpus collect); the oracle runs the SAME arithmetic as a
    recursive CTE (the sql_recursive_cte pattern), making the two
    implementations structurally independent.

    Scale shape: the event corpus collapses to the (series x day) bar
    grid first (one exchange); the fold is per-series map work on a
    calendar-bounded array. Flat in event volume; linear in calendar
    span. Init l_1 = y_1, b_1 = y_2 - y_1; series with fewer than 2
    bars are dropped in both engines (the init join).
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    arr = bars.groupBy("event_type").agg(
        F.expr(
            "sort_array(collect_list(struct(bar_date, close)))"
        ).alias("a")
    )
    new_l = "CAST(0.5 AS DOUBLE) * ((y.close + acc.l) + acc.b)"
    folded = arr.filter(F.expr("size(a) >= 2")).select(
        "event_type",
        F.expr("CAST(size(a) AS BIGINT)").alias("n_bars"),
        F.expr(
            f"""aggregate(
                slice(a, 2, size(a) - 1),
                named_struct('l', a[0].close,
                             'b', a[1].close - a[0].close),
                (acc, y) -> named_struct(
                    'l', {new_l},
                    'b', CAST(0.5 AS DOUBLE) * (({new_l} - acc.l) + acc.b)
                ))"""
        ).alias("hw"),
    )
    return folded.select(
        "event_type",
        "n_bars",
        F.expr("hw.l").alias("level"),
        F.expr("hw.b").alias("trend"),
        F.expr("hw.l + hw.b").alias("forecast_1"),
        F.expr(
            "((((((hw.l + hw.b) + hw.b) + hw.b) + hw.b) + hw.b) + hw.b)"
            " + hw.b"
        ).alias("forecast_7"),
    )


@query(
    "ts_gap_report",
    oracle="""
    WITH obs AS (
        SELECT event_type, date_trunc('hour', ts) AS h
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    bounds AS (
        SELECT event_type, MIN(h) AS mn, MAX(h) AS mx,
               CAST(COUNT(*) AS BIGINT) AS n_observed
        FROM obs GROUP BY event_type
    ),
    expected AS (
        SELECT b.event_type,
               unnest(generate_series(b.mn, b.mx,
                                      INTERVAL '1 hour')) AS h
        FROM bounds b
    ),
    missing AS (
        SELECT e.event_type, e.h,
               date_diff('hour', TIMESTAMP '1970-01-01 00:00:00', e.h)
                   AS hi
        FROM expected e
        LEFT JOIN obs o
          ON o.event_type = e.event_type AND o.h = e.h
        WHERE o.h IS NULL
    ),
    runs AS (
        SELECT event_type,
               hi - ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY hi) AS island,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_missing
        FROM missing
    ),
    islands AS (
        SELECT event_type, island, MAX(n_missing) AS n_missing,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM runs GROUP BY event_type, island
    ),
    gap_stats AS (
        SELECT event_type, MAX(n_missing) AS n_missing,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               MAX(run_len) AS max_gap_hours
        FROM islands GROUP BY event_type
    )
    SELECT b.event_type,
           CAST(1 + date_diff('hour', b.mn, b.mx) AS BIGINT)
               AS n_expected,
           b.n_observed,
           COALESCE(g.n_missing, CAST(0 AS BIGINT)) AS n_missing,
           COALESCE(g.n_gaps, CAST(0 AS BIGINT)) AS n_gaps,
           COALESCE(g.max_gap_hours, CAST(0 AS BIGINT)) AS max_gap_hours,
           CAST(b.n_observed AS DOUBLE)
               / CAST(1 + date_diff('hour', b.mn, b.mx) AS DOUBLE)
               AS completeness
    FROM bounds b LEFT JOIN gap_stats g ON g.event_type = b.event_type
    """,
)
def ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-completeness audit: per series, the expected hourly grid
    between its first and last observation vs the hours actually seen —
    missing-hour count, number of gaps, LONGEST consecutive gap
    (the win_gaps_islands technique applied to the missing set), and a
    completeness ratio. The monitoring twin of ts_interpolate_linear:
    that operator repairs holes, this one reports them — the freshness/
    completeness check the reference's hourly poll pipeline needs when a
    scheduler outage silently drops polls (its catchup=False stance
    makes missed hours permanent).

    Parity: everything is exact timestamp/integer arithmetic — grid
    sizes, anti-join survivors, island run lengths — and completeness
    divides identical exact BIGINTs once (correctly-rounded IEEE).

    Scale shape: the corpus collapses to the distinct (series, hour)
    grid FIRST (one partial-agg exchange; the exchange carries grid
    rows, never events); the expected grid explodes off the 5-row
    bounds frame, bounded by calendar span; the anti-join and the
    islands window run on grid-sized inputs. Flat in event volume,
    linear in calendar span.
    """
    ev = load(spark, sf_dir, "events")
    # obs (the distinct hourly grid) feeds both the bounds aggregate and
    # the anti-join probe: checkpoint so the event stream collapses once
    # (r5 plan audit: 3 event scans -> 1)
    obs = ev.select(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).distinct().transform(stage)
    bounds = obs.groupBy("event_type").agg(
        F.expr("MIN(h)").alias("mn"),
        F.expr("MAX(h)").alias("mx"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_observed"),
    )
    expected = bounds.select(
        "event_type",
        F.explode(
            F.expr("sequence(mn, mx, interval 1 hour)")
        ).alias("h"),
    )
    missing = (
        expected.join(obs, ["event_type", "h"], "left_anti")
        .select(
            "event_type",
            F.expr(
                "CAST(unix_timestamp(h) AS BIGINT) DIV 3600"
            ).alias("hi"),
        )
    )
    runs = missing.select(
        "event_type",
        F.expr(
            """hi - ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY hi)"""
        ).alias("island"),
        F.expr(
            "CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)"
        ).alias("n_missing"),
    )
    islands = runs.groupBy("event_type", "island").agg(
        F.expr("MAX(n_missing)").alias("n_missing"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("run_len"),
    )
    gap_stats = islands.groupBy("event_type").agg(
        F.expr("MAX(n_missing)").alias("n_missing"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_gaps"),
        F.expr("MAX(run_len)").alias("max_gap_hours"),
    )
    n_exp = "CAST(1 + (CAST(unix_timestamp(mx) AS BIGINT) DIV 3600" \
            " - CAST(unix_timestamp(mn) AS BIGINT) DIV 3600) AS BIGINT)"
    return (
        bounds.join(F.broadcast(gap_stats), "event_type", "left")
        .select(
            "event_type",
            F.expr(n_exp).alias("n_expected"),
            "n_observed",
            F.expr("COALESCE(n_missing, CAST(0 AS BIGINT))").alias(
                "n_missing"
            ),
            F.expr("COALESCE(n_gaps, CAST(0 AS BIGINT))").alias("n_gaps"),
            F.expr(
                "COALESCE(max_gap_hours, CAST(0 AS BIGINT))"
            ).alias("max_gap_hours"),
            F.expr(
                f"CAST(n_observed AS DOUBLE) / CAST({n_exp} AS DOUBLE)"
            ).alias("completeness"),
        )
    )


@query(
    "ts_runs_test",
    oracle=f"""
    WITH {_BARS_ORACLE},
    d AS (
        SELECT event_type, bar_date,
               CASE WHEN close > lag(close) OVER w THEN 1
                    WHEN close < lag(close) OVER w THEN -1
                    ELSE 0 END AS sgn,
               lag(close) OVER w AS pc
        FROM bars
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date)
    ),
    s AS (
        SELECT event_type, bar_date, sgn,
               lag(sgn) OVER (PARTITION BY event_type
                              ORDER BY bar_date) AS prev_sgn
        FROM d WHERE pc IS NOT NULL AND sgn <> 0
    ),
    agg AS (
        SELECT event_type,
               CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_up,
               CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
               CAST(SUM(CASE WHEN prev_sgn IS NULL
                             OR sgn <> prev_sgn THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_runs
        FROM s GROUP BY event_type
    )
    SELECT event_type, n_up, n_down, n_runs,
           CAST(1 AS DOUBLE)
               + CAST(2 * n_up * n_down AS DOUBLE)
                 / CAST(n_up + n_down AS DOUBLE) AS expected_runs,
           (CAST(n_runs AS DOUBLE)
            - (CAST(1 AS DOUBLE)
               + CAST(2 * n_up * n_down AS DOUBLE)
                 / CAST(n_up + n_down AS DOUBLE)))
           / sqrt(CAST(2 * n_up * n_down
                       * (2 * n_up * n_down - n_up - n_down) AS DOUBLE)
                  / CAST((n_up + n_down) * (n_up + n_down)
                         * (n_up + n_down - 1) AS DOUBLE)) AS z_score
    FROM agg
    WHERE n_up > 0 AND n_down > 0 AND n_up + n_down > 1
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per series: are the daily up/down moves
    random, or do they streak (momentum) / alternate (mean-reversion)?
    Counts sign runs in the daily-bar move sequence and reports the
    normal-approximation z-score against the randomness null — the
    randomness screen that complements ts_autocorr (linear dependence)
    and ts_mann_kendall (monotone trend) with a nonparametric
    sign-pattern test. Flat days (close unchanged) are excluded, the
    standard tie treatment.

    Parity: run/up/down counts are exact integer window+agg arithmetic;
    E[R] and Var[R] are ratios of EXACT BIGINT products (n = 30 bars —
    tiny magnitudes), each evaluated as ONE division of identical
    operands; z composes subtract / sqrt / divide on identical doubles —
    every step correctly-rounded IEEE on both engines, and no
    sum-of-products shape exists to FMA-contract (the denominators are
    single CAST-to-double divisions, pinned parentheses).

    Scale shape: the corpus collapses to the (series x day) bar grid
    first; the sign/lag windows and the final agg run on the bounded
    grid. Flat in event volume; linear in calendar span.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type", "bar_date", "close"
    )
    d = bars.select(
        "event_type",
        "bar_date",
        F.expr(
            """CASE WHEN close > lag(close) OVER (PARTITION BY event_type
                        ORDER BY bar_date) THEN 1
                    WHEN close < lag(close) OVER (PARTITION BY event_type
                        ORDER BY bar_date) THEN -1
                    ELSE 0 END"""
        ).alias("sgn"),
        F.expr(
            "lag(close) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("pc"),
    )
    s = d.filter("pc IS NOT NULL AND sgn <> 0").select(
        "event_type",
        "bar_date",
        "sgn",
        F.expr(
            "lag(sgn) OVER (PARTITION BY event_type ORDER BY bar_date)"
        ).alias("prev_sgn"),
    )
    agg = s.groupBy("event_type").agg(
        F.expr(
            "CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_up"),
        F.expr(
            "CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_down"),
        F.expr(
            """CAST(SUM(CASE WHEN prev_sgn IS NULL
                         OR sgn <> prev_sgn THEN 1 ELSE 0 END) AS BIGINT)"""
        ).alias("n_runs"),
    )
    return agg.filter("n_up > 0 AND n_down > 0 AND n_up + n_down > 1").select(
        "event_type",
        "n_up",
        "n_down",
        "n_runs",
        F.expr(
            """CAST(1 AS DOUBLE)
               + CAST(2 * n_up * n_down AS DOUBLE)
                 / CAST(n_up + n_down AS DOUBLE)"""
        ).alias("expected_runs"),
        F.expr(
            """(CAST(n_runs AS DOUBLE)
                - (CAST(1 AS DOUBLE)
                   + CAST(2 * n_up * n_down AS DOUBLE)
                     / CAST(n_up + n_down AS DOUBLE)))
               / sqrt(CAST(2 * n_up * n_down
                           * (2 * n_up * n_down - n_up - n_down) AS DOUBLE)
                      / CAST((n_up + n_down) * (n_up + n_down)
                             * (n_up + n_down - 1) AS DOUBLE))"""
        ).alias("z_score"),
    )


SMA_TAPS = 5


@query(
    "ts_sma_crossover_backtest",
    oracle=f"""
    WITH {_BARS_ORACLE},
    px AS (
        SELECT event_type, bar_date,
               CAST(CAST(close AS DECIMAL(12,4)) * {_BETA_SCALE} AS BIGINT)
                   AS close_i,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY bar_date) AS t
        FROM bars
    ),
    sig AS (
        SELECT event_type, bar_date, t, close_i,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_frame,
               CAST(SUM(close_i) OVER w AS BIGINT) AS sma_sum,
               lead(close_i) OVER (PARTITION BY event_type
                                   ORDER BY bar_date) - close_i
                   AS next_move
        FROM px
        WINDOW w AS (PARTITION BY event_type ORDER BY bar_date
                     ROWS BETWEEN {SMA_TAPS - 1} PRECEDING
                     AND CURRENT ROW)
    ),
    pos AS (
        SELECT event_type, next_move,
               CASE WHEN n_frame = {SMA_TAPS}
                         AND {SMA_TAPS} * close_i > sma_sum
                    THEN 1 ELSE 0 END AS long_pos
        FROM sig WHERE next_move IS NOT NULL
    ),
    pnl AS (
        SELECT event_type,
               CAST(SUM(long_pos * next_move) AS BIGINT)
                   AS strat_pnl_cents,
               CAST(SUM(next_move) AS BIGINT) AS hold_pnl_cents,
               CAST(SUM(long_pos) AS BIGINT) AS n_long_days,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM pos GROUP BY event_type
    )
    SELECT event_type, n_days, n_long_days,
           strat_pnl_cents, hold_pnl_cents,
           CAST(strat_pnl_cents - hold_pnl_cents AS BIGINT)
               AS excess_cents
    FROM pnl
    """,
)
def ts_sma_crossover_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMA-crossover strategy backtest per series, as ONE Catalyst plan on
    the daily bars: hold long on any day the close sits above its
    trailing-5-bar simple moving average, earn the NEXT day's move while
    long, and compare against buy-and-hold — the canonical first momentum
    backtest a quant runs on the reference's price series, composed
    entirely from certified primitives (OHLC bars, bounded frames, lead).

    EVERYTHING is exact integer arithmetic on the ts_rolling_beta cents
    grid: the crossover signal avoids the SMA division entirely
    (5*close > frame_sum is the same predicate on exact BIGINTs), the
    held move is an exact lead-difference, and both PnL legs are exact
    BIGINT sums — the checked output contains no floating point at all.
    Warmup days (frame < 5 bars) and the last day (no next move) are
    flat by construction in both engines.

    Scale shape: one corpus collapse to the (series x day) bar grid,
    then one window pass (frame sum + lead share the partition sort) and
    one grouped agg on the grid. Flat in event volume; linear in
    calendar span.
    """
    bars = ts_resample_ohlc(spark, sf_dir).select(
        "event_type",
        "bar_date",
        F.expr(
            f"CAST(CAST(close AS DECIMAL(12,4)) * {_BETA_SCALE} AS BIGINT)"
        ).alias("close_i"),
    )
    w = (
        f"(PARTITION BY event_type ORDER BY bar_date "
        f"ROWS BETWEEN {SMA_TAPS - 1} PRECEDING AND CURRENT ROW)"
    )
    sig = bars.select(
        "event_type",
        F.expr(f"CAST(COUNT(*) OVER {w} AS BIGINT)").alias("n_frame"),
        F.expr(f"CAST(SUM(close_i) OVER {w} AS BIGINT)").alias("sma_sum"),
        "close_i",
        F.expr(
            """lead(close_i) OVER (PARTITION BY event_type
               ORDER BY bar_date) - close_i"""
        ).alias("next_move"),
    )
    pos = sig.filter(F.col("next_move").isNotNull()).select(
        "event_type",
        "next_move",
        F.expr(
            f"""CASE WHEN n_frame = {SMA_TAPS}
                     AND {SMA_TAPS} * close_i > sma_sum
                THEN 1 ELSE 0 END"""
        ).alias("long_pos"),
    )
    pnl = pos.groupBy("event_type").agg(
        F.expr("CAST(SUM(long_pos * next_move) AS BIGINT)").alias(
            "strat_pnl_cents"
        ),
        F.expr("CAST(SUM(next_move) AS BIGINT)").alias("hold_pnl_cents"),
        F.expr("CAST(SUM(long_pos) AS BIGINT)").alias("n_long_days"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
    )
    return pnl.select(
        "event_type",
        "n_days",
        "n_long_days",
        "strat_pnl_cents",
        "hold_pnl_cents",
        F.expr(
            "CAST(strat_pnl_cents - hold_pnl_cents AS BIGINT)"
        ).alias("excess_cents"),
    )
