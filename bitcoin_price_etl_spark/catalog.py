"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

Loads are plain `spark.read.parquet` — Catalyst gets full pushdown/pruning
(SURVEY.md §4). At 100 TB these would be partitioned/bucketed external
tables; the loader keeps a single entry point so that swap is one function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (region and
# nation are fixed-cardinality in TPC-H-style generators; supplier is tiny
# here). Used by operators/joins.py to pick broadcast strategy explicitly.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType (LTZ) whatever the fixture
    generation wrote:

    - TIMESTAMP(NANOS) parquet is read as long
      (spark.sql.legacy.parquet.nanosAsLong); integer-truncate to micros —
      the same truncation DuckDB applies narrowing TIMESTAMP_NS, so both
      engines see identical instants. DIV is integer division: nanos exceed
      2^53, so a double division would corrupt low bits.
    - timestamp[us] with no tz flag is read as TIMESTAMP_NTZ; cast to
      TIMESTAMP because Structured Streaming's withWatermark only accepts
      LTZ event time. The session timezone is pinned UTC (session.py), so
      the cast re-labels the same wall-clock instant — DuckDB's naive
      TIMESTAMP and the canonicalized pandas values are unchanged.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); set the read conf here
        # (it is a dynamic SQL conf) so the engine works on any caller's
        # SparkSession, not just ones built by session.get_spark.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = load_raw(spark, sf_dir, name)
    if name == "events":
        df = normalize_events(df)
    return df


def parquet_num_rows(sf_dir: str, name: str):
    """Exact row count from local parquet FOOTER metadata — pure
    driver-side, no Spark job (a `df.count()` at DataFrame-construction
    time makes every schema-only consumer pay an action; ADVICE r6).
    Returns None when the path is not a local file/dir of parquet parts
    (e.g. an object-store URI at cluster scale) — callers fall back to a
    Spark count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    try:
        if os.path.isdir(path):
            total = 0
            n_parts = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        fp = os.path.join(root, f)
                        total += pq.ParquetFile(fp).metadata.num_rows
                        n_parts += 1
            # A dir with zero parquet parts (only _SUCCESS, or a partial
            # write) is "unknown", not "empty" — returning 0 here would
            # make size-adaptive planners (llm_semdedup K, dedup_embed
            # blocking) plan against n=0; fall back to a Spark count.
            return total if n_parts else None
        return pq.ParquetFile(path).metadata.num_rows
    except (OSError, ValueError, pa.lib.ArrowException):
        return None


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (used by spark.sql-based queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
