"""Sort / limit / set operators (SURVEY.md §2.2).

Reference precedent: `set_union` generalizes R18's WRITE_APPEND semantics
(dags/bpi_etl/bpi_etl_bigquery.py:280) — appending snapshot batches is a
union of micro-batches.

Scale notes: orderBy().limit(k) compiles to TakeOrderedAndProject — each
partition keeps only its top-k, the driver merges k·P rows, never a global
sort. intersect/exceptAll shuffle on the full row as key; at 100 TB these
are used on pre-projected narrow columns (as here) so the shuffle payload
stays minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query


@query(
    "sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort at any scale).

    The ORDER BY carries the (l_orderkey, l_linenumber) primary key as a
    tiebreak so the selected top-100 set is deterministic.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(100)
    )


@query(
    "set_union",
    oracle="""
    SELECT c_name AS name, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS side FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName of two projections (R18 append-as-union semantics)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "set_intersect",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (distinct semantics, matching SQL INTERSECT)."""
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


@query(
    "set_except",
    oracle="""
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL — multiplicity-preserving, the
    DuckDB-parity hazard called out in SURVEY.md §7 phase 3)."""
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    return r.exceptAll(a)


@query(
    "set_intersect_all",
    oracle="""
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT ALL
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): each part key appears
    min(multiplicity-in-R, multiplicity-in-A) times — the
    multiplicity-preserving twin of set_intersect, completing the
    multiset algebra beside set_except's EXCEPT ALL. Spark lowers
    intersectAll to a count-paired aggregate + generate, not an n^2
    join; the shuffle carries (key, count) pairs.

    Parity: integer keys and integer multiplicities — nothing to
    quantize. Scale: two partial-aggregated counts co-partitioned on
    the key, one equi-join, one bounded replicate — flat in row width,
    linear in distinct keys.
    """
    li = load(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersectAll(a)
