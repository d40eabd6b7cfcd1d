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

from bitcoin_price_etl_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Phase-0 slice (SURVEY.md §7): hourly event aggregates enriched with a
    1-row broadcast rate — scan → window agg → broadcast join → project.
    """
    registry = load_all()
    return registry["flagship_hourly_enriched"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: spec.fn for key, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key; keys without SQL twins (custom
    stateful/sketch ops) are omitted → driver records rows-only checks."""
    return {
        key: spec.oracle for key, spec in load_all().items() if spec.oracle is not None
    }
