"""Graph analytics over relational edge lists.

The engine's graph story runs on DataFrames, not a graph runtime: an edge
list is a two-column frame, one iteration of any message-passing algorithm
is join → aggregate → join, and a FIXED number of iterations unrolls into
a plain Catalyst plan that the oracle can mirror CTE-for-CTE. The family's
other member — connected components via min-label propagation — lives with
its use case in llm/dedup.py (llm_dedup_cluster, certified against a
recursive-CTE oracle); this module holds the rank-style algorithms.

Scale posture: every iteration's heavy step is an equi-join on the edge
key and a partial-aggregated sum keyed by destination — the classic
Pregel-on-MapReduce shape. Ranks are a |V|-row frame (tiny next to |E|);
edges partition once and every iteration reuses that exchange. Hot
destinations (a supplier every customer buys from) partial-combine
map-side, so skew costs one combiner pass, not a hot reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration as oracle CTE text."""
    p = i - 1
    return f"""c{i} AS (
        SELECT e.dst, CAST(r.rank / o.deg AS DECIMAL(38,12)) AS c
        FROM edges e
        JOIN r{p} r ON e.src = r.node
        JOIN outdeg o ON e.src = o.src
    ), s{i} AS (
        SELECT dst, CAST(SUM(c) AS DOUBLE) AS s FROM c{i} GROUP BY dst
    ), r{i} AS (
        SELECT node,
               0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s, 0.0) AS rank
        FROM nodes LEFT JOIN s{i} ON node = dst
    )"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT concat('c', CAST(o_custkey AS VARCHAR)) AS src,
                        concat('s', CAST(l_suppkey AS VARCHAR)) AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ), nn AS (
        SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
    ), outdeg AS (
        SELECT src, count(*) AS deg FROM edges GROUP BY src
    ), r0 AS (
        SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
    ), {', '.join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
    SELECT node, rank FROM r{PR_ITERS}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer→supplier purchase graph (who supplies
    the best-connected demand), {PR_ITERS} fixed damped iterations, no
    dangling-mass redistribution (lost-mass variant: sink nodes leak
    their rank, which both engines compute identically — the variant
    choice is semantics, not error; redistribution adds one scalar
    broadcast per iteration when wanted).

    Scale shape: the edge list partitions ONCE on src; each iteration is
    edge⋈rank (src-keyed, rank frame is |V| rows — broadcastable far
    longer than edges fit anywhere) + a dst-keyed partial-aggregated sum
    + a left join back to nodes. Fixed iteration count unrolls into one
    declarative plan per iteration with a localCheckpoint between rounds
    (plan-growth control, same move as llm_dedup_cluster's propagation
    loop). A 100 TB edge list runs the identical loop with persist-to-
    disk checkpoints; hot destinations partial-combine map-side.

    Parity: contributions quantize to DECIMAL(38,12) BEFORE the sum
    (rank ~1e-4 → quantum/ulp ≈ 1e8, far above the conversion-disagree
    zone; sum exact and associative), and the damped update is IEEE
    mul/add on bit-identical operands; the oracle unrolls the same
    {PR_ITERS} iterations CTE-for-CTE.
    """
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(PR_ITERS):
        contrib = (
            edges.join(r, edges.src == r.node)
            .join(outdeg, "src")
            .select(
                "dst",
                (F.col("rank") / F.col("deg"))
                .cast("decimal(38,12)")
                .alias("c"),
            )
        )
        sums = contrib.groupBy("dst").agg(
            F.expr("CAST(SUM(c) AS DOUBLE)").alias("s")
        )
        r = nodes.join(sums, nodes.node == sums.dst, "left").select(
            "node",
            (
                F.lit(0.15 / n)
                + F.lit(0.85) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        # checkpoint BETWEEN rounds only: plan-growth control without
        # hiding the final iteration's shape from the plan snapshot
        if it < PR_ITERS - 1:
            r = r.localCheckpoint()
    return r
