"""SparkSession factory — the engine's single config posture.

Config rationale (SURVEY.md §4 "Config posture for 100 TB"):
- AQE on (runtime re-plan: partition coalescing, SMJ→BHJ demotion, skew split).
- Session timezone pinned UTC: the reference mixes tz-aware parse with
  tz-dropping reformat (reference dags/bpi_etl/bpi_etl_bigquery.py:231-232);
  the engine normalizes to UTC internally and formats at the edges.
- Arrow enabled for any pandas interchange (vectorized UDF path).
- Shuffle partitions default to local core count; on a real cluster this is
  set to ~2-3× total cores (or left to AQE coalescing from a high initial).

Multi-consumer staging policy — localCheckpoint vs persist (ADVICE r5,
central statement; the ~53 `.localCheckpoint()` sites across operators
reference this):

The engine stages multi-consumer / iterative frames (posting lists,
frontier sets, per-iteration graph state) with EAGER `localCheckpoint()`.
What that buys and costs:

- BUYS: lineage truncation (iterative plans stop growing — pagerank/k-hop
  would otherwise double the plan per round) and a single materialization
  shared by all consumers (A/B-measured per site; one sweep candidate was
  REVERTED when three barriers lost to pipelined rescans — funnel_conversion,
  git c14d6f4).
- COSTS: (1) the job runs at DataFrame-CONSTRUCTION time, so even
  schema-only consumers pay full execution; (2) blocks are executor-local
  and NON-REPLICATED, so on a multi-executor cluster losing an executor
  makes downstream actions fail-fast rather than recompute (lineage is
  gone).

On local[N] (this harness: one JVM, no executor loss) the costs are nil
and localCheckpoint is strictly the right tool. At warehouse scale,
swap sites on long-running jobs to `persist(StorageLevel.DISK_ONLY)` +
a count() barrier (recomputable, spill-backed, survives executor loss)
or `checkpoint()` to a reliable store for multi-hour lineage cuts.
The semantics of every operator are unchanged by the swap; only
failure-recovery economics move — EXCEPT lineage truncation:
persist() keeps the full logical plan, so LOOP-INTERIOR staging
(pagerank per-iteration, k-hop frontier/visited, label propagation,
k-means centroids) must still cut lineage in persist_disk mode or the
analyzed plan doubles per round. Those sites call `stage_iter()`
below, which maps persist_disk to a reliable checkpoint() when a
checkpoint dir is configured (the cluster deployment) and
localCheckpoint otherwise (ADVICE r7).

The swap is MECHANICAL (VERDICT r6 item 8): every staging site calls
`.transform(stage)` (straight-line multi-consumer frames) or
`.transform(stage_iter)` (loop-interior frames) below, and both read
the `spark.graft.staging` session conf — the 100 TB deployment flips
one config, not ~46 sites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def stage(df: DataFrame) -> DataFrame:
    """Materialize a multi-consumer / iterative frame once and cut its
    lineage — the engine's single staging point (module docstring has the
    full localCheckpoint-vs-persist trade-off). Used as `.transform(stage)`
    so call sites keep their chain form.

    Mode comes from the `spark.graft.staging` session conf:

    - "localCheckpoint" (default): eager executor-local blocks — strictly
      right on local[N] (one JVM, no executor loss).
    - "persist_disk": persist(DISK_ONLY) + count() barrier — recomputable,
      spill-backed, survives executor loss; the long-running-cluster swap.
    - "checkpoint": reliable checkpoint() — multi-hour lineage cuts;
      requires sparkContext.setCheckpointDir to a durable store.
    """
    try:
        mode = df.sparkSession.conf.get("spark.graft.staging", "localCheckpoint")
    except Exception:  # conf unreadable (exotic session wrapper) → default
        mode = "localCheckpoint"
    if mode == "persist_disk":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        out.count()  # barrier: materialize now, same eager contract
        return out
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    return df.localCheckpoint()


def stage_iter(df: DataFrame) -> DataFrame:
    """Loop-interior staging: like stage(), but ALWAYS truncates lineage.

    Iterative operators (pagerank, k-hop reach, dedup-cluster label
    propagation, IVF k-means) stage the carried frame each round
    precisely for plan-growth control — persist(DISK_ONLY) materializes
    the data but keeps the full logical plan, so under persist_disk the
    analyzed plan would double per round and never unpersist (ADVICE
    r7). Mapping here:

    - "localCheckpoint" (default): localCheckpoint — cuts lineage.
    - "persist_disk": reliable checkpoint() when a checkpoint dir is
      set (the long-running-cluster shape: survives executor loss AND
      cuts lineage); localCheckpoint otherwise — on local[N] there is
      no executor loss, so the persist_disk economics argument doesn't
      apply to loop frames and lineage control wins.
    - "checkpoint": reliable checkpoint().
    """
    try:
        mode = df.sparkSession.conf.get("spark.graft.staging", "localCheckpoint")
    except Exception:
        mode = "localCheckpoint"
    if mode == "checkpoint":
        return df.checkpoint(eager=True)
    if mode == "persist_disk":
        try:
            has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
        except Exception:
            has_dir = False
        if has_dir:
            return df.checkpoint(eager=True)
    return df.localCheckpoint()


def get_spark(app_name: str = "bitcoin-price-etl-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # The driver's events.parquet stores TIMESTAMP(NANOS), which Spark's
        # parquet reader rejects by default; read as long and convert in the
        # catalog (catalog.normalize_events).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
