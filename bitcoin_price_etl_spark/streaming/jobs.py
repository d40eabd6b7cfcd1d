"""Real Structured Streaming jobs (SURVEY.md §7 Phase 5) — the engine twin
of the reference's hourly incremental lifecycle: Airflow @hourly schedule +
WRITE_APPEND load (R19+R18, dags/bpi_etl/bpi_etl_bigquery.py:26-30,277-291)
becomes readStream → event-time windows + watermark → foreachBatch append
with checkpointing.

These run under Trigger.AvailableNow in tests (bounded input, same code path
as a live trigger(processingTime='1 hour') deployment). Batch twins of each
aggregation are oracle-checked via streaming/twins.py; this module asserts
the *stateful* behaviors the oracle can't see: watermark eviction, late-row
drop, keyed dedup state.

Arbitrary keyed state uses applyInPandasWithState. Spark 4's successor API
(transformWithStateInPandas) is present but unusable in this container: its
driver-side runner requires protobuf, whose install here is broken
(`ImportError: cannot import name 'descriptor' from 'google.protobuf'`,
probed 2026-08-13) and the environment forbids pip installs. On a healthy
cluster the RunningCounts processor ports 1:1 (getValueState + per-key
handleInputRows).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter, StreamingQuery

from bitcoin_price_etl_spark.catalog import load_raw, normalize_events
from bitcoin_price_etl_spark.paths import scratch_dir


def stage_stream_dir(spark: SparkSession, sf_dir: str, name: str):
    """Stage a single-file table into a directory (file streaming sources
    require a basePath directory) and return (dir, schema). In production
    the source is already a directory of hourly files — this shim exists
    only for the single-file test fixtures. The staging dir is a FIXED
    per-table scratch path wiped on each call (mkdtemp-per-run leaked
    unbounded /tmp data across bench/driver runs — round-1 ADVICE)."""
    src_dir = scratch_dir(f"stream_src_{name}")
    shutil.copy(f"{sf_dir}/{name}.parquet", src_dir)
    return src_dir, load_raw(spark, sf_dir, name).schema


def _with_trigger(
    writer: DataStreamWriter, processing_interval: str | None
) -> DataStreamWriter:
    """availableNow (bounded test/backfill pass) vs processingTime (the
    live deployment cadence — R19's @hourly schedule,
    reference dags/bpi_etl/bpi_etl_bigquery.py:26-30, becomes
    processing_interval='1 hour'). Same plan, same state, same sink
    semantics either way; only the trigger differs."""
    if processing_interval is None:
        return writer.trigger(availableNow=True)
    return writer.trigger(processingTime=processing_interval)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema declared, R3 stance:
    contracts are explicit, never inferred, at ingest). The nanos→timestamp
    normalization is the same expression the batch catalog applies."""
    src_dir, schema = stage_stream_dir(spark, sf_dir, "events")
    return normalize_events(spark.readStream.schema(schema).parquet(src_dir))


def hourly_tumbling_job(
    spark: SparkSession,
    sf_dir: str,
    sink: str,
    ckpt: str,
    processing_interval: str | None = None,
) -> StreamingQuery:
    """R19's hourly micro-batch as a watermarked tumbling-window stream.

    Default is the bounded availableNow pass (tests/backfills); pass
    processing_interval='1 hour' for the live scheduled deployment — the
    engine form of the reference's Airflow @hourly DAG cadence
    (bpi_etl_bigquery.py:26-30). Tests exercise the live trigger at a
    short interval; only the cadence changes, never the semantics."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
    )
    return _with_trigger(writer, processing_interval).start()


def dedup_stream_job(
    spark: SparkSession, sf_dir: str, sink: str, ckpt: str
) -> StreamingQuery:
    """Stateful streaming dedup by event_id within the watermark — the
    idempotent-re-run guarantee of slides p.6, as engine state."""
    ev = read_events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])
    return (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def session_window_job(
    spark: SparkSession, sf_dir: str, sink: str, ckpt: str
) -> StreamingQuery:
    """Session windows (30-min gap) per user as a streaming stateful agg."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def stateful_user_counts_job(
    spark: SparkSession, sf_dir: str, sink: str, ckpt: str
) -> StreamingQuery:
    """Custom stateful streaming operator via applyInPandasWithState: a
    running per-user event count + last-seen timestamp, with event-time
    timeout — the arbitrary-state API for operators that windows/dedup
    can't express (SURVEY.md §2.2 'custom stateful streaming')."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")

    def update_counts(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            (count,) = state.get
        else:
            count = 0
        max_ts = None
        for pdf in pdf_iter:
            count += len(pdf)
            batch_max = pdf["ts"].max()
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        state.update((count,))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [count], "last_seen": [max_ts]}
        )

    counted = ev.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id long, n_events long, last_seen timestamp",
        stateStructType="count long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        counted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def stream_static_enrich_job(
    spark: SparkSession, sf_dir: str, sink: str, ckpt: str
) -> StreamingQuery:
    """Stream–static enrichment: the event stream joins the static customer
    dimension (re-read and broadcast per micro-batch — how Spark handles
    slowly-changing dims without restart), then aggregates per
    (hour window, market segment) under the watermark. The batch twin is
    registry key `stream_static_join`."""
    from bitcoin_price_etl_spark.catalog import load

    ev = read_events_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.withWatermark("ts", "2 hours")
        .join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "c_mktsegment", "n_events")
    )
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
    )
    return _with_trigger(writer, None).start()


def stream_stream_join_job(
    spark: SparkSession, sf_dir: str, sink: str, ckpt: str
) -> StreamingQuery:
    """Stream–stream interval join (click → purchase attribution within 30
    minutes): both sides watermarked, the time-band predicate in the join
    condition so Spark can expire click state once no future purchase can
    match. Batch twin: registry key `stream_stream_join`."""
    ev = read_events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withWatermark("ts", "2 hours")
        .alias("c")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .alias("p")
    )
    joined = clicks.join(
        purchases,
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") >= F.col("c.ts"))
        & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("c.user_id").alias("user_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.ts").alias("purchase_ts"),
    )
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
    )
    return _with_trigger(writer, None).start()


def idempotent_foreachbatch_job(
    spark: SparkSession,
    src_dir: str,
    schema,
    sink: str,
    ckpt: str,
    crash_after_batch: int | None = None,
) -> StreamingQuery:
    """The crash-safe form of the R18+R19 append lifecycle
    (bpi_etl_bigquery.py:277-291 WRITE_APPEND; slides p.6 graceful
    recovery / idempotent re-run): foreachBatch writes each micro-batch to
    its OWN batch_id partition with overwrite, so a batch replayed after a
    crash that landed between the sink write and the checkpoint commit
    overwrites its own output instead of appending a duplicate — the
    standard idempotent foreachBatch recipe, and the reason blind
    `mode("append")` inside foreachBatch is only at-least-once.

    maxFilesPerTrigger=1 keeps one source file per micro-batch so tests
    can crash between batches deterministically. crash_after_batch=N
    raises AFTER batch N's sink write completes but BEFORE Spark commits
    the epoch — the exact window where naive appends double-write.
    """

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
        .select("event_id", "event_type", "value")
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{sink}/batch_id={batch_id}")
        if crash_after_batch is not None and batch_id >= crash_after_batch:
            raise RuntimeError("injected crash after sink write, pre-commit")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
