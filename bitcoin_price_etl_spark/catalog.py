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
    """events.ts is TIMESTAMP(NANOS) in parquet; Spark reads it as long
    (spark.sql.legacy.parquet.nanosAsLong). Convert to TimestampType by
    integer-truncating to micros — the same truncation DuckDB applies when
    narrowing TIMESTAMP_NS to its micro TIMESTAMP, so both engines see
    identical instants. DIV is integer division: nanos exceed 2^53, so a
    double division would corrupt low bits.
    """
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
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


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (used by spark.sql-based queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
