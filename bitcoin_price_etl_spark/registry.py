"""Query registry — the driver-facing inventory (SURVEY.md §2.2).

Every operator the engine implements registers here with:
- key: the `queries()` name in __spark_entry__.py
- fn(spark, sf_dir) -> DataFrame: the Spark-native implementation
- oracle: equivalent DuckDB SQL over the pre-registered parquet views, or
  None for non-SQL-expressible ops (driver then records rows-only).

Parity discipline (SURVEY.md §5, §7 hard-parts):
- every computed column aliased identically in Spark and oracle SQL;
- no raw timestamp/decimal outputs — format timestamps to strings, cast
  decimals to double at the edge;
- float aggregations go through exprs.decimal-sum so partial-agg order can
  never change the answer (double sums are order-sensitive; decimal sums
  are exact and associative).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    oracle: Optional[str]
    doc: str = ""


def query(key: str, oracle: Optional[str] = None):
    """Decorator: register fn under key with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in REGISTRY:
            raise ValueError(f"duplicate query key {key!r}")
        REGISTRY[key] = QuerySpec(key=key, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so decorators run; return the registry."""
    from bitcoin_price_etl_spark.operators import (  # noqa: F401
        aggregates,
        joins,
        projections,
        setops,
        windows,
    )
    from bitcoin_price_etl_spark.functions import scalars  # noqa: F401
    from bitcoin_price_etl_spark.sources import scans, sinks  # noqa: F401
    from bitcoin_price_etl_spark.plans import (  # noqa: F401
        flagship,
        golden,
        sqlapi,
        subqueries,
        tpch,
        validate,
    )
    from bitcoin_price_etl_spark.streaming import twins  # noqa: F401
    from bitcoin_price_etl_spark.llm import (  # noqa: F401
        curation,
        dedup,
        multimodal,
        simsearch,
        textstats,
    )
    from bitcoin_price_etl_spark import udfs  # noqa: F401

    return REGISTRY
