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
or `checkpoint()` to a reliable store for multi-hour lineage cuts —
several operator docstrings note the swap inline. The semantics of every
operator are unchanged by the swap; only failure-recovery economics move.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


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
