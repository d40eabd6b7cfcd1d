"""Subquery operators (SURVEY.md §2.2 relational completeness tier).

The reference's only subquery-shaped computation is the scalar lookup +
broadcast enrichment (R12/R13, dags/bpi_etl/bpi_etl_bigquery.py:223-225):
pull ONE value out of a keyed document and apply it to every row. These
operators generalize that pattern to the three subquery families a SQL user
of the engine needs — uncorrelated scalar, correlated scalar, and IN-set —
each expressed Spark-first (aggregate + broadcast join), never as a
driver-side collect-then-filter loop.

Scale notes: an uncorrelated scalar subquery is a 1-row aggregate cross-
joined via broadcast — O(1) exchange regardless of fact size. A correlated
scalar subquery decorrelates into an aggregate-then-join on the correlation
key (exactly what Catalyst's RewriteCorrelatedScalarSubquery does); the
group-side shuffle moves one row per key. IN-sets become broadcast semi
joins when the set is small. Nothing here collects fact data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import davg, davg_sql, dsum, dsum_sql
from bitcoin_price_etl_spark.registry import query


@query(
    "subquery_scalar",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,4))) AS DOUBLE) / COUNT(c_acctbal)
        FROM customer
    )
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: customers above the global mean balance.

    The R13 pattern generalized (bpi_etl_bigquery.py:223-225): a 1-row
    aggregate broadcast against the full table. The mean uses the decimal
    discipline (exprs.py) so the threshold is bit-identical in both engines
    and the filter can never disagree on a boundary row.
    """
    c = load(spark, sf_dir, "customer")
    global_avg = c.agg(davg("c_acctbal", "global_avg"))
    return (
        c.crossJoin(F.broadcast(global_avg))
        .filter(F.col("c_acctbal") > F.col("global_avg"))
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "subquery_correlated",
    oracle=f"""
    WITH nat AS (
        SELECT c_nationkey, {davg_sql('c_acctbal', 'nat_avg')}
        FROM customer
        GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal, nat.nat_avg
    FROM customer c JOIN nat ON c.c_nationkey = nat.c_nationkey
    WHERE c.c_acctbal > nat.nat_avg
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery, decorrelated: customers above their OWN
    nation's mean balance (`WHERE c_acctbal > (SELECT AVG(..) .. WHERE
    c2.c_nationkey = c.c_nationkey)`).

    Built as aggregate-per-key + broadcast equi-join — the same plan
    Catalyst's subquery decorrelation produces, written explicitly so the
    shape is visible. Per-key aggregate is one row per nation (25), so the
    join side broadcasts at any scale factor.
    """
    c = load(spark, sf_dir, "customer")
    nat = c.groupBy("c_nationkey").agg(davg("c_acctbal", "nat_avg"))
    return (
        c.join(F.broadcast(nat), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nat_avg")
    )


@query(
    "subquery_in_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p.p_partkey
        FROM part p,
             (SELECT min(p_retailprice) AS mn, max(p_retailprice) AS mx
              FROM part) b
        WHERE p.p_retailprice > b.mn + 0.9 * (b.mx - b.mn)
    )
    GROUP BY l_returnflag
    """,
)
def subquery_in_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery over a computed key set: revenue from premium parts only.

    The IN set is the top decile of the OBSERVED retail-price band
    (min + 0.9·(max−min)) — relative on purpose: the fixture's price
    ceiling varies by SF (919.9 at sf0.001, 999.9 above), so any fixed
    cutoff is either empty or trivial at some scale (the original 1500
    sat above every ceiling and made the whole query empty — a vacuous
    hash check). min/max and the threshold arithmetic are single IEEE
    ops, bit-identical across engines. The set is a filtered dimension —
    Spark plans the membership test as a broadcast LEFT SEMI join, so
    the fact scan streams once and never shuffles on the probe side.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    bounds = part.agg(
        F.min("p_retailprice").alias("mn"), F.max("p_retailprice").alias("mx")
    )
    premium = (
        part.crossJoin(F.broadcast(bounds))
        .filter(F.col("p_retailprice") > F.expr("mn + 0.9D * (mx - mn)"))
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(premium), li.l_partkey == premium.p_partkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )


@query(
    "subquery_lateral",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey <= 50
    """,
)
def subquery_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's two largest orders —
    the per-row-subquery SQL surface (every modern warehouse exposes it;
    Catalyst plans it as DomainJoin → decorrelated window/limit, never a
    per-row re-execution loop).

    Scale shape: Catalyst decorrelates the lateral limit into a
    partitioned rank over the join of the filtered customer keys with
    orders — the same plan win_topk_group gets by hand. The semantics a
    user writes per-row, the engine executes set-at-a-time.

    Parity: identical SQL text semantics in DuckDB (which also plans
    lateral as a dependent join); picked prices are raw doubles with a
    (price DESC, orderkey) total-order pin so ties cannot flap.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_custkey <= 50
        """
    )
