"""Streaming operators — batch twins for oracle checks (SURVEY.md §2.2
"Streaming", §5 "Streaming tests").

Reference precedent: the whole reference pipeline is an hourly incremental
micro-batch (R19, dags/bpi_etl/bpi_etl_bigquery.py:26-30) appending to a
serving table (R18, :277-291); `catchup=False` (:29) is the
discard-stale/late-data stance the watermark twin generalizes.

Every key here is the *batch expression* of the streaming semantics, so the
DuckDB oracle can check it; the real `readStream`/`writeStream` jobs with
watermarks and checkpoints live in streaming/jobs.py and are exercised by
tests/test_streaming.py. `stream_foreachbatch_append` runs a real
Trigger.AvailableNow stream inside the query callable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.paths import scratch_dir
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import dsum, dsum_sql
from bitcoin_price_etl_spark.registry import query


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate (R19's hourly cadence as a window).

    Streaming form: readStream → withWatermark('ts', ...) → groupBy(window)
    (streaming/jobs.py); the batch twin is bit-identical because tumbling
    windows partition the timeline.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
    SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 900) * 900 AS BIGINT)
                                 - g.g * 900), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM events, (SELECT unnest(range(4)) AS g) g
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour / 15 min slide): each event lands in exactly 4
    overlapping windows. The oracle twin expands the 4 windows arithmetically
    (floor-to-slide minus k·slide), which is the definitional semantics of
    Spark's sliding window assignment."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session",
    oracle=f"""
    WITH gapped AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gapped
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           {dsum_sql('value', 'sum_value')}
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via session_window().

    The oracle twin is the classic gaps-and-islands construction: a session
    break whenever the gap to the previous event exceeds 30 minutes; the
    session start (MIN ts) equals session_window().start.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_watermark_late",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM events
    WHERE ts >= (SELECT max(ts) - INTERVAL 2 HOUR FROM events)
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics as a batch twin: drop events older than
    2 hours behind the max observed event time — exactly what
    withWatermark('ts','2 hours') admits at end-of-stream (the reference's
    catchup=False discard-stale stance, bpi_etl_bigquery.py:29).

    The real stateful watermark behavior (mid-stream eviction) is asserted
    in tests/test_streaming.py.
    """
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 2 HOURS"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
    FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest observation — the deterministic form
    of streaming dropDuplicates-within-watermark (the reference's idempotent
    re-run concern, slides p.6 "graceful recovery").

    dropDuplicates() keeps an arbitrary row; the engine pins "first by event
    time" via row_number so re-runs are bit-identical (and so the oracle can
    check it). The streaming form (dropDuplicates after withWatermark) is
    asserted rows-only in tests/test_streaming.py.
    """
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        )
    )


@query(
    "stream_foreachbatch_append",
    oracle="""
    SELECT event_id, event_type, value FROM events
    """,
)
def stream_foreachbatch_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Structured Streaming run: parquet file source →
    Trigger.AvailableNow → foreachBatch append to a parquet sink with
    checkpointing — the R18+R19 lifecycle (hourly WRITE_APPEND with
    exactly-once-ish bookkeeping, bpi_etl_bigquery.py:277-291) with the
    checkpoint replacing XCom locator state.

    The readback must equal the source — proven against the oracle.
    """
    from bitcoin_price_etl_spark.streaming.jobs import stage_stream_dir

    tmp = scratch_dir("stream_append_twin")
    sink = tmp + "/sink"
    ckpt = tmp + "/ckpt"

    # file streaming sources need a directory; stage the table file into one
    src_dir, ev_schema = stage_stream_dir(spark, sf_dir, "events")
    stream = (
        spark.readStream.schema(ev_schema)
        .parquet(src_dir)
        .select("event_id", "event_type", "value")
    )

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(sink)

    (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    return spark.read.schema(
        "event_id long, event_type string, value double"
    ).parquet(sink)


@query(
    "stream_stateful_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen_str
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator end-to-end: the
    applyInPandasWithState running-count job (streaming/jobs.py —
    per-user event count + last-seen, arbitrary keyed state) run under
    Trigger.AvailableNow against a parquet sink, then read back.

    The single-file fixture yields one micro-batch, so the final emitted
    state per user equals the batch aggregate — which makes this the rare
    ARBITRARY-STATE op with an exact SQL oracle. With multi-batch input the
    per-batch emissions would be a superset; the production contract is
    'latest row per user wins' (dedup on user_id by last_seen downstream).
    """
    from bitcoin_price_etl_spark.streaming.jobs import stateful_user_counts_job

    tmp = scratch_dir("stream_stateful_twin")
    sink = tmp + "/sink"
    ckpt = tmp + "/ckpt"
    stateful_user_counts_job(spark, sf_dir, sink, ckpt).awaitTermination(120)
    out = spark.read.schema("user_id long, n_events long, last_seen timestamp").parquet(
        sink
    )
    return out.select(
        "user_id",
        "n_events",
        F.date_format("last_seen", "yyyy-MM-dd HH:mm:ss").alias("last_seen_str"),
    )


@query(
    "stream_static_join",
    oracle=f"""
    SELECT strftime(date_trunc('hour', e.ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           c.c_mktsegment,
           COUNT(*) AS n_events,
           {dsum_sql('e.value', 'sum_value')}
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join: enrich the event stream with a slowly-changing
    dimension (customer market segment) before windowed aggregation — the
    canonical streaming-enrichment pattern (clickstream × user dim).

    Streaming form (streaming/jobs.py stream_static_enrich_job): the
    static side is a plain batch DataFrame joined into the stream; Spark
    re-plans it per micro-batch, broadcasting the dim — the stream side
    never shuffles for the join, state is only the windowed agg. The batch
    twin is identical relational algebra, so the oracle checks it
    exactly."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream interval join: clicks joined to same-user purchases
    within the following 30 minutes — attribution, the canonical
    double-stream stateful operator. The streaming form
    (streaming/jobs.py stream_stream_join_job) watermarks BOTH sides and
    carries the time-range predicate so Spark bounds each side's join
    state (click state expires once no purchase can still match —
    watermark + upper bound); without the interval condition the state
    would grow forever.

    Batch twin: the identical equi-join on user_id plus the time-band
    theta condition — an equi-join with a range residual, NEVER a pure
    theta join (the user_id key is what shards state/work at 100 TB)."""
    ev = load(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").alias("c")
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    return (
        c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            F.col("c.user_id").alias("user_id"),
            F.date_format("c.ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.date_format("p.ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        )
    )
