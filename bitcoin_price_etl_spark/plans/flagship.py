"""Phase-0 flagship pipeline (SURVEY.md §7 Phase 0).

One query exercising the reference's entire semantic core — scan →
window-bucketing → aggregation → scalar-broadcast join enrichment →
snake_case projection → sort (R9-R16 + the R19 hourly cadence):

    hourly event aggregates, enriched with a single scalar "exchange rate"
    derived from a second source — the engine generalization of the
    reference's one-row BPI × USD→IDR enrichment
    (dags/bpi_etl/bpi_etl_bigquery.py:223-225).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import davg, davg_sql, dsum, dsum_sql
from bitcoin_price_etl_spark.registry import query


@query(
    "flagship_hourly_enriched",
    oracle=f"""
    WITH hourly AS (
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               COUNT(*) AS n_events,
               {dsum_sql('value', 'sum_value')}
        FROM events
        GROUP BY 1, 2
    ),
    rate AS (
        SELECT {davg_sql('value', 'usd_rate')}
        FROM events WHERE event_type = 'purchase'
    )
    SELECT h.hour_start, h.event_type, h.n_events, h.sum_value,
           h.sum_value * r.usd_rate AS sum_value_usd
    FROM hourly h CROSS JOIN rate r
    """,
)
def flagship_hourly_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour aggregate over `events`, enriched by a 1-row broadcast
    rate (R13/R14 pattern), snake_cased and deterministic.

    Plan shape at scale: one shuffle for the hourly aggregation (map-side
    partial agg first), then a broadcast cross join with a 1-row table —
    no second shuffle, no sort (order-insensitive hash check).
    """
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    rate = ev.filter(F.col("event_type") == "purchase").agg(davg("value", "usd_rate"))
    return hourly.crossJoin(F.broadcast(rate)).select(
        "hour_start",
        "event_type",
        "n_events",
        "sum_value",
        (F.col("sum_value") * F.col("usd_rate")).alias("sum_value_usd"),
    )
