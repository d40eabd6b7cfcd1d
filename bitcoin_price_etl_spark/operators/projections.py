"""Projection / filter / flatten operators.

Reference precedents (SURVEY.md §2.1):
- R10 projection by column-name predicate (reference
  dags/bpi_etl/bpi_etl_bigquery.py:198-212)
- R11 bulk camelCase→snake_case rename (bpi_etl_bigquery.py:216-219)
- R9 nested-struct flatten via pd.json_normalize (bpi_etl_bigquery.py:195)
- R3/R4 constraint-gate predicates (common_module/pydantic_models.py:26-70)

Scale notes: pure narrow transformations — no shuffle, fully pipelined
inside WholeStageCodegen; filters and projections reach the parquet scan
(PushedFilters / ReadSchema), so at 100 TB these are scan-bound only on the
columns actually referenced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query


@query(
    "project_rename",
    oracle="""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_number,
           l_returnflag AS return_flag,
           l_linestatus AS line_status,
           l_quantity AS quantity,
           l_extendedprice AS extended_price
    FROM lineitem
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + bulk snake_case rename (R10+R11 generalized)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_returnflag").alias("return_flag"),
        F.col("l_linestatus").alias("line_status"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extended_price"),
    )


@query(
    "project_regex",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    """,
)
def project_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column selection by name-regex (R10, bpi_etl_bigquery.py:204-212).

    The reference builds a regex over flattened column names and filters the
    pandas column index; Spark's native equivalent is ``df.colRegex``. Unlike
    the reference's buggy ungrouped alternation (SURVEY.md §2.1 "latent
    bugs"), the pattern is anchored and grouped.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        li.colRegex("`^l_.*(?:price|discount)$`"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 50000.0 AND 400000.0
      AND o_orderpriority LIKE '%-%'
      AND NOT (o_orderpriority = '5-LOW')
      AND o_custkey IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row predicates: comparison, isin, like, null checks, conjunction (R3/R4)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(50000.0, 400000.0)
        & F.col("o_orderpriority").like("%-%")
        & ~(F.col("o_orderpriority") == "5-LOW")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "flatten_struct",
    oracle="""
    SELECT event_id,
           event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS props_k
    FROM events
    """,
)
def flatten_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct flatten to snake columns (R9, bpi_etl_bigquery.py:195).

    Parses the ``props`` JSON payload into a typed struct, then flattens it
    with ``select('s.*')``-style recursion — the Spark-native replacement for
    pd.json_normalize.
    """
    ev = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    parsed = ev.withColumn("props_struct", F.from_json("props", schema))
    return parsed.select(
        "event_id",
        "event_type",
        F.col("props_struct.k").alias("props_k"),
    )
