"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in bitcoin_price_etl_spark/ (see SURVEY.md §2.2 for the
inventory); this module is a thin adapter over its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bitcoin_price_etl_spark.registry import load_all, ordered_keys

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Phase-0 slice (SURVEY.md §7): hourly event aggregates enriched with a
    1-row broadcast rate — scan → window agg → broadcast join → project.
    """
    registry = load_all()
    return registry["flagship_hourly_enriched"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Key order is deliberate: the driver's correctness gate records a
    bounded prefix of this dict per round, so never-driver-verified keys
    come first (registry.ordered_keys) and keys already green in a prior
    CORRECTNESS_r{N}.json come last — rotating the whole registry through
    the gate across rounds."""
    registry = load_all()
    return {key: registry[key].fn for key in ordered_keys(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys without SQL twins (custom
    stateful/sketch ops) are omitted → driver records rows-only checks."""
    registry = load_all()
    return {
        key: registry[key].oracle
        for key in ordered_keys(registry)
        if registry[key].oracle is not None
    }
