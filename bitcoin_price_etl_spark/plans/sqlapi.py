"""The SQL entry path: the engine's second API surface (SURVEY.md §3.4).

Every other registry key drives the DataFrame API; this one registers the
catalog as temp views and submits ANSI SQL via ``spark.sql`` — proving a
reference user who writes SQL (the reference serves BigQuery SQL consumers —
dags/bpi_etl/bpi_etl_bigquery.py:280, slides p.18) can run the same text on
this engine. The CTE text is dialect-shared: the identical string runs on
Spark and DuckDB except for the decimal-sum discipline, which both accept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import dsum_sql
from bitcoin_price_etl_spark.registry import query

_SQL = f"""
    WITH cust_orders AS (
        SELECT c.c_custkey, c.c_nationkey, o.o_orderkey
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus <> 'F'
    ),
    order_rev AS (
        SELECT l_orderkey,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        GROUP BY l_orderkey
    )
    SELECT n.n_name,
           COUNT(DISTINCT co.c_custkey) AS n_customers,
           {dsum_sql("r.revenue", "total_revenue")}
    FROM cust_orders co
    JOIN order_rev r ON r.l_orderkey = co.o_orderkey
    JOIN nation n ON n.n_nationkey = co.c_nationkey
    GROUP BY n.n_name
"""


@query("sql_cte_pipeline", oracle=_SQL)
def sql_cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE SQL pipeline submitted as text: fact-fact join on a
    pre-aggregated CTE, dimension broadcast, multi-distinct count.

    The oracle IS the submitted text — one string, two engines, a direct
    dialect-compatibility proof for the SQL surface. Catalyst plans it
    identically to the DataFrame form (same Exchange/broadcast structure):
    SQL text gets the optimizer for free, per the declarative-plan
    posture.

    Parity subtlety: `revenue` is summed per order at DECIMAL(38,4), cast
    to DOUBLE, then re-summed through the same decimal discipline — the
    second sum's inputs are already exactly-representable 4-decimal
    doubles, so the re-quantization is lossless in both engines."""
    for t in ("customer", "orders", "lineitem", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE tree AS (
        SELECT CAST(0 AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT d.doc_id, t.depth + 1
        FROM documents d JOIN tree t
          ON (d.doc_id - 1) {div} 2 = t.doc_id
        WHERE d.doc_id BETWEEN 1 AND 126
    )
    SELECT t.doc_id, t.depth,
           CAST((t.doc_id - 1) {div} 2 AS BIGINT) AS parent_id
    FROM tree t
"""


@query(
    "sql_recursive_cte",
    oracle=_RECURSIVE_SQL.format(div="//").replace(
        "CAST((t.doc_id - 1) // 2 AS BIGINT) AS parent_id",
        "CAST(CASE WHEN t.doc_id = 0 THEN NULL"
        " ELSE (t.doc_id - 1) // 2 END AS BIGINT) AS parent_id",
    ),
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE transitive closure (Spark 4 recursive CTEs): walk
    a 127-node parent tree derived from doc_ids (heap rule: parent =
    (id−1)÷2) and emit every node's depth and parent — the org-chart/
    BOM/reachability SQL surface. llm_dedup_cluster implements the same
    fixpoint manually with a driver loop; this is the declarative form
    the engine now executes natively (iterative UNION materialization
    inside one statement).

    Scale shape: each recursion step is an equi-join of the frontier
    against the child relation on the parent key — co-partitionable, and
    the iteration count is the DEPTH of the hierarchy (7 here, log n for
    a balanced tree), not its size.

    Parity: DuckDB runs the same recursive CTE text (integer division
    spelled // vs DIV); depths and parent ids are exact integers.
    """
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _RECURSIVE_SQL.format(div="DIV").replace(
            "CAST((t.doc_id - 1) DIV 2 AS BIGINT) AS parent_id",
            "CAST(CASE WHEN t.doc_id = 0 THEN NULL"
            " ELSE (t.doc_id - 1) DIV 2 END AS BIGINT) AS parent_id",
        )
    )


# Parameterized threshold: the "large order" floor the dashboard user
# tweaks per run. Bound server-side via spark.sql named args — never
# string interpolation.
PARAM_MIN_TOTAL = 150000.0
PARAM_STATUS = "O"


@query(
    "sql_parameterized",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS total_value
    FROM orders
    WHERE o_totalprice >= {PARAM_MIN_TOTAL} AND o_orderstatus = '{PARAM_STATUS}'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (Spark 4 `spark.sql(text, args={...})`): the
    query text carries `:min_total` / `:status` placeholders and values
    bind server-side — the injection-safe re-run surface a BI tool or a
    scheduled report uses (the reference's consumers query BigQuery with
    the same mechanism). The oracle inlines the same constants: binding
    must be semantically invisible.

    Scale shape: parameters bind BEFORE optimization, so Catalyst sees
    literals — the o_totalprice predicate pushes down to the parquet
    scan exactly as a hard-coded literal would (no plan-cache genericity
    penalty; same aggregate plan as agg_hash)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
                   AS total_value
        FROM orders
        WHERE o_totalprice >= :min_total AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_total": PARAM_MIN_TOTAL, "status": PARAM_STATUS},
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
               AS sum_qty
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    LIMIT 10
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.x `|>` operators, the GoogleSQL
    pipe-query form): the same scan → filter → aggregate → order chain a
    DataFrame user writes, expressed as linear SQL stages. Proves the
    engine's THIRD query surface (DataFrame, ANSI SQL, pipe SQL) plans
    identically — the pipe text lowers to the same Catalyst logical plan,
    so pushdown/partial-agg behavior is byte-for-byte the ANSI plan's.

    The oracle is the equivalent ANSI text (DuckDB has no pipe syntax —
    the point is exactly that surface syntax is not semantics)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= DATE '1995-01-01'
        |> AGGREGATE COUNT(*) AS n_lines,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                         AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_lines, sum_qty
        |> ORDER BY l_returnflag, l_linestatus
        |> LIMIT 10
        """
    )
