"""Aggregation operators (SURVEY.md §2.2 — no reference precedent; the
reference aggregates nothing, these are the harness/north-star generalization).

Scale notes: all groupBys here are partial-aggregated map-side by Spark
(HashAggregate → Exchange → HashAggregate), so the shuffle moves only one row
per (partition × group), not the raw data. Group cardinality is tiny
(returnflag × linestatus = 6), so the exchange is negligible at any scale.
Float sums use the decimal discipline from exprs.py so results are
bit-identical regardless of partial-agg order (exprs.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import DEC, davg, davg_sql, dsum, dsum_sql
from bitcoin_price_etl_spark.registry import query


@query(
    "agg_hash",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {dsum_sql('l_quantity', 'sum_qty')},
           {dsum_sql('l_extendedprice', 'sum_base_price')},
           {davg_sql('l_discount', 'avg_disc')},
           MIN(l_quantity) AS min_qty,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style grouped sum/avg/min/max/count (partial+final hash agg)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            davg("l_discount", "avg_disc"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_extendedprice").alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg under the hood).

    The approximate twin (`approx_count_distinct` / HLL) is exposed as
    `agg_approx_distinct` with a rows-only check, since sketches are not
    bit-comparable across engines.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — sketch output, rows-only check.

    At 100 TB this is the right default for cardinality dashboards: one pass,
    fixed memory, no expand; exact distinct shuffles every distinct value.
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_approx_distinct_checked",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(*) AS n_rows,
           TRUE AS hll_within_10pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked twin of `agg_approx_distinct` (VERDICT r10 item 5):
    the HLL++ sketch value itself is not bit-comparable across engines
    (DuckDB has no HLL++ with Spark's register layout), but its CONTRACT
    is — |estimate − exact| ≤ 5·rsd·exact. This key runs the sketch AND
    the exact distinct in one grouped aggregate and emits the bound check
    as a boolean the oracle pins TRUE, so a sketch regression (bad rsd
    plumbing, register merge bug, overflow at a larger SF) flips a
    hash-checked value instead of hiding behind a rows-only row.

    The bound compares in pure BIGINT arithmetic (|approx−exact|·10 ≤
    exact ⟺ rel-err ≤ 10% = 5×rsd at rsd 0.02 — wide enough that a
    healthy sketch never trips it, tight enough that a broken one always
    does; HLL++ at rsd 0.02 measures <1% error on these cardinalities),
    so the boolean is exact in both engines — no float discipline needed.

    Scale shape: same single pass as the sketch alone plus the exact
    distinct's expand — this is the AUDIT form you run on a sample or at
    validation checkpoints; the dashboard default stays
    `agg_approx_distinct` (sketch only, fixed memory, no expand)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count(F.lit(1)).alias("n_rows"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "distinct_parts",
            "n_rows",
            (
                F.abs(F.col("_approx") - F.col("distinct_parts")) * 10
                <= F.col("distinct_parts")
            ).alias("hll_within_10pct"),
        )
    )


@query(
    "agg_rollup_cube",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n_rows,
           {dsum_sql('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup with grouping-flag disambiguation (hierarchical subtotals).

    gid is composed from per-column GROUPING() bits rather than engine
    GROUPING_ID() so the Spark and DuckDB bit orders cannot disagree.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus").agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
        )
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_discount > 0.05
                         THEN CAST(l_extendedprice AS {DEC}) END) AS DOUBLE)
               AS sum_discounted_price,
           COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/conditional aggregates via sum(when) — SQL FILTER twin."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice").cast(DEC))
        )
        .cast("double")
        .alias("sum_discounted_price"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_stats",
    oracle=f"""
    WITH sums AS (
        SELECT l_returnflag,
               COUNT(l_quantity) AS n,
               {dsum_sql('l_quantity', 's1')},
               {dsum_sql('l_quantity * l_quantity', 's2')}
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           s1 / n AS mean_qty,
           (s2 - s1 * s1 / n) / (n - 1) AS var_qty,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_qty
    FROM sums
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev via decimal-exact moment sums.

    Native STDDEV implementations use Welford-style streaming updates whose
    float rounding differs per engine and per partial-agg order; composing
    the statistics from exact decimal sums of x and x² (quantities are
    1-decimal, squares 2-decimal — both exactly representable at scale 4)
    makes the derived doubles bit-identical. The textbook cancellation
    hazard of the E[x²]−E[x]² form doesn't apply: the sums are exact, so the
    subtraction is the exact value rounded once.
    """
    li = load(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        dsum("l_quantity", "s1"),
        dsum("l_quantity * l_quantity", "s2"),
    )
    return sums.select(
        "l_returnflag",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_qty"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_qty"
        ),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
        ).alias("stddev_qty"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube: all 2^k grouping-set combinations (rollup's superset)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice", "sum_price"),
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS cnt_f,
           COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS cnt_o,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS qty_f,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS {DEC}) END) AS DOUBLE) AS qty_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: rows → columns on an explicit pivot-value list.

    The value list is declared (not discovered) — at 100 TB an undeclared
    pivot forces an extra distinct pass over the fact table to find the
    columns. The oracle is the conditional-aggregation desugaring, which is
    exactly how Catalyst lowers pivot.
    """
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("F_cnt").alias("cnt_f"),
        F.col("O_cnt").alias("cnt_o"),
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
    )


@query(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90).

    Computed on l_quantity, whose values are integer-valued doubles: every
    interpolation point is a dyadic rational, so Spark's and DuckDB's
    interpolation formulas agree bit-for-bit. (On arbitrary doubles the two
    a+(b−a)·f vs a·(1−f)+b·f formulations can differ in the last ulp — for
    those, approx_percentile with a tolerance check is the honest contract.)
    """
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
           COUNT(*) AS n_rows,
           {dsum_sql('l_extendedprice', 'sum_price')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the non-hierarchical cousin of rollup/cube:
    per-returnflag totals, per-linestatus totals, and the grand total, in
    one pass (Spark plans one Expand + one hash agg, not three scans).

    gid composed from per-column GROUPING() bits, same discipline as
    agg_rollup_cube, so engine bit orders cannot disagree."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("int")
        .alias("gid"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice", "sum_price"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
               AS statuses,
           array_to_string(list_sort(list_distinct(list(l_suppkey))), ',')
               AS supp_keys
    FROM lineitem
    WHERE l_orderkey <= 200
    GROUP BY l_returnflag
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-style aggregates: delimited string_agg and a sorted distinct
    array per group — the row→collection direction (fn_explode is the
    inverse).

    Determinism: collect order is partition-order-dependent in ANY engine,
    so both outputs are canonicalized — distinct + sort — before emission.
    At scale collect_set state is bounded by group's distinct cardinality;
    unbounded collect_list on a hot group would be the memory hazard, which
    is why the distinct form is the default here.

    Both collections are emitted as delimited STRINGS, not arrays: the
    differential gate's pandas canonicalizer cannot hash list cells
    (round-1 driver crash on the array form of supp_keys), and a sorted
    joined string carries the same information."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_set("l_suppkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("supp_keys"),
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH sums AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM sums
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM sums
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): per-flag measure columns melted to
    (flag, measure, val) rows — the inverse of agg_pivot.

    Spark's unpivot is a zero-shuffle Expand (each input row emits one row
    per measure in place); the oracle spells it as UNION ALL, which is the
    same relational result."""
    li = load(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price")
    )
    return sums.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "measure", "val"
    )


@query(
    "agg_bool",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0.0) AS all_positive_qty,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates: universal / existential predicates per group —
    the aggregate form of the reference's row-level contract gates (R3:
    every row passes ⇔ bool_and of the validator)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0.0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("agg_hll_sketch", oracle=None)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+): per-flag
    distinct-partkey estimates PLUS a union across groups re-estimated from
    the merged sketches — the operation approx_count_distinct alone cannot
    express, and the 100 TB story for distinct counting: sketches are
    partial-aggregated map-side, shuffled as ~KB binaries, unioned
    associatively, and can be persisted per partition/day then re-merged
    for any rollup without rescanning the data.

    Rows-only: sketch binaries and estimate rounding are
    implementation-specific (DataSketches vs DuckDB's approx algorithms).
    """
    li = load(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_flag.select(
        "l_returnflag",
        "n_rows",
        F.hll_sketch_estimate("sk").alias("approx_distinct_parts"),
    ).unionByName(
        per_flag.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias(
                "approx_distinct_parts"
            ),
            F.expr("CAST(SUM(n_rows) AS BIGINT)").alias("n_rows"),
        ).select(F.lit("ALL").alias("l_returnflag"), "n_rows", "approx_distinct_parts")
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 50000.0), 10) AS INT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY least(floor(o_totalprice / 50000.0), 10)
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: one grouped count per 50k-wide price bucket
    (overflow clamped to bucket 10) — the profiling primitive behind
    optimizer statistics and data-quality dashboards. Bucket assignment is
    floor(x / width) on doubles — identical literals, identical IEEE ops in
    both engines (DuckDB has no width_bucket; the explicit formula is the
    portable form)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(10))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "agg_corr",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               {dsum_sql('l_quantity', 'sx')},
               {dsum_sql('l_extendedprice', 'sy')},
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))
                        * CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))
                        * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(CAST((n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                     AS DECIMAL(10,6)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END AS corr_qty_price
    FROM m
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from decimal-exact moment sums — NOT the built-in
    corr(), whose streaming update order differs between engines and drifts
    in the last ulps.

    Squared/cross moments convert EACH INPUT to decimal at its natural
    scale first and multiply in decimal (exact), instead of squaring
    doubles and then converting: the stored doubles are only NEAR their
    2-decimal values, so a double square sits ~1e-9·x off the exact
    4-decimal square and its decimal conversion can straddle a half-quantum
    where the engines round differently (observed at sf0.001).

    The result is QUANTIZED through DECIMAL(10,6) then cast back to DOUBLE:
    the syy moment (~7e12 at 4 decimals) saturates double precision, and
    DuckDB's decimal→double conversion is not correctly rounded at that
    magnitude — a 1-ulp drift no moment discipline can remove (measured:
    Spark ...835.868 vs DuckDB ...835.869). Micro-precision quantization
    gives ~9 orders of margin over that ulp noise; the final DOUBLE cast
    restores the registry's no-decimal-at-the-edge discipline (round-1
    driver hashed the raw Decimal objects differently per engine — the one
    hash FAIL of the round). A 6-decimal value is exactly representable
    enough that decimal→double conversion agrees between engines."""
    li = load(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sx"),
        dsum("l_extendedprice", "sy"),
        F.expr(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))"
            " * CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
            " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("syy"),
        F.expr(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))"
            " * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sxy"),
    )
    # Degenerate guard (r8 degenerate-corpus probe): a zero-variance
    # column makes the denominator moments cancel to exactly 0 —
    # x/sqrt(0) is an ANSI DIVIDE_BY_ZERO crash. Correlation is
    # UNDEFINED there, so emit NULL (SQL corr() convention), decided on
    # the same computed-double inequalities in both engines (each side
    # is a chain of separately-rounded ops on identical operands).
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(dx) * F.sqrt(dy)
    )
    return m.select(
        "l_returnflag",
        "n",
        F.when(
            (dx > F.lit(0.0)) & (dy > F.lit(0.0)),
            corr.cast("decimal(10,6)").cast("double"),
        ).alias("corr_qty_price"),
    )


@query(
    "agg_minmax_by",
    oracle="""
    WITH ext AS (
        SELECT o_orderstatus,
               MAX(o_totalprice) AS max_price,
               MIN(o_totalprice) AS min_price
        FROM orders
        GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           MIN(CASE WHEN o.o_totalprice = e.max_price THEN o.o_orderkey END)
               AS biggest_order,
           MIN(CASE WHEN o.o_totalprice = e.min_price THEN o.o_orderkey END)
               AS smallest_order,
           e.max_price,
           e.min_price
    FROM orders o JOIN ext e ON o.o_orderstatus = e.o_orderstatus
    GROUP BY o.o_orderstatus, e.max_price, e.min_price
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregates: the key of the extremal row per group
    (max_by/min_by — Spark's form of DuckDB's arg_max/arg_min), replacing
    the join-back-on-max antipattern with one aggregation pass.

    Ties are pinned EXPLICITLY on both sides: the ordering argument is a
    struct (price, -orderkey) / (price, orderkey) so equal extremal prices
    resolve to the smallest orderkey, lexicographic struct comparison doing
    the tie-break inside the single-pass aggregate. Bare max_by would be
    engine-arbitrary on a tie — correct on today's fixture, flapping on a
    regenerated one. The oracle spells the same semantics as a two-pass
    extremal join (MIN over the rows matching the extremal price), which is
    deterministic by construction.

    NULL prices: an unmeasured order can never be the extremal one. The
    ordering struct itself is non-null even when the price field is NULL
    — struct comparison sorts the NULL field FIRST, so a bare struct
    would hand min_by every failed measurement. Nulling the WHOLE struct
    via when() makes max_by/min_by skip those rows (their documented
    NULL-ordering behavior), exactly matching the oracle's
    CASE WHEN price = extremal, which a NULL price never satisfies."""
    o = load(spark, sf_dir, "orders")
    measured = F.col("o_totalprice").isNotNull()
    return o.groupBy("o_orderstatus").agg(
        F.max_by(
            "o_orderkey",
            F.when(
                measured,
                F.struct(
                    F.col("o_totalprice"), (-F.col("o_orderkey")).alias("tb")
                ),
            ),
        ).alias("biggest_order"),
        F.min_by(
            "o_orderkey",
            F.when(
                measured,
                F.struct(F.col("o_totalprice"), F.col("o_orderkey")),
            ),
        ).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS qty,
               COUNT(*) AS cnt
        FROM lineitem
        GROUP BY l_returnflag, l_quantity
    ), r AS (
        SELECT l_returnflag, qty, cnt,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, qty ASC) AS rn
        FROM c
    )
    SELECT l_returnflag, qty AS mode_qty, cnt AS mode_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode per group: most frequent l_quantity per return
    flag, ties broken by smallest value.

    NOT the built-in mode() — both engines' mode() leave ties
    implementation-defined (hash-map iteration order), which is exactly the
    nondeterminism a differential gate cannot admit. The count+row_number
    form pins ties explicitly and is the scalable shape anyway: the first
    aggregation collapses the corpus to (group, value) cardinality before
    the tiny per-group ranking window runs — at 100 TB the window's input
    is the distinct-value histogram, not the table."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", F.col("l_quantity").cast("double").alias("qty")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("qty").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(DISTINCT year(o_orderdate)) AS n_years,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several DISTINCT aggregates over different columns in one query —
    the planning shape that forces Expand (each input row replicated once
    per distinct group) followed by two-phase aggregation.

    Kept as its own key because multi-distinct is a common analytics
    regression: a naive engine runs one pass per DISTINCT; Spark's Expand
    keeps it a single scan of the fact table at any scale, trading a
    constant row-multiplication (here 4×) inside the exchange for extra
    scans — the right trade when the scan is 100 TB."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct(F.year("o_orderdate")).alias("n_years"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "table_profile_stats",
    oracle="""
    WITH long AS (
        SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(v) AS n_nulls,
           COUNT(DISTINCT v) AS n_distinct,
           MIN(v) AS min_val,
           MAX(v) AS max_val,
           CAST(SUM(CAST(v AS DECIMAL(38,4))) AS DOUBLE) AS sum_val
    FROM long GROUP BY col_name
    """,
)
def table_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile: per-column row/null/distinct counts
    and min/max/sum in ONE scan — the statistics pass behind cost-based
    optimization and data-quality monitoring (Spark's own
    ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS, surfaced as a
    queryable frame instead of catalog metadata).

    Shape: unpivot to (col_name, value) long form — a zero-shuffle
    Expand, 4x row multiplication INSIDE the map stage — then one
    grouped aggregate. The scan reads the fact table once no matter how
    many columns are profiled; the exchange carries one row per
    (partition x column) for the plain aggs plus the distinct two-phase.
    At 100 TB swap COUNT(DISTINCT) for approx_count_distinct: the HLL
    sketch partial-aggregates (constant state per column vs shuffling
    every distinct value); exact distinct is kept here because it is
    what the cross-engine hash gate can certify, and the agg_hll_sketch
    key already certifies the sketch path.

    Parity: counts exact; min/max pick raw doubles; sum through the
    decimal discipline.
    """
    li = load(spark, sf_dir, "lineitem")
    long = li.unpivot(
        [],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "col_name",
        "v",
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("v")).alias("n_nulls"),
        F.countDistinct("v").alias("n_distinct"),
        F.min("v").alias("min_val"),
        F.max("v").alias("max_val"),
        dsum("v", "sum_val"),
    )


@query(
    "agg_skew_kurt",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,1))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,1))
                             * CAST(l_quantity AS DECIMAL(18,1))
                             AS DECIMAL(18,2))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,1))
                                  * CAST(l_quantity AS DECIMAL(18,1))
                                  AS DECIMAL(18,2))
                             * CAST(l_quantity AS DECIMAL(18,1))
                             AS DECIMAL(28,3))) AS DOUBLE) AS s3,
               CAST(SUM(CAST(CAST(CAST(l_quantity AS DECIMAL(18,1))
                                  * CAST(l_quantity AS DECIMAL(18,1))
                                  AS DECIMAL(18,2))
                             * CAST(CAST(l_quantity AS DECIMAL(18,1))
                                    * CAST(l_quantity AS DECIMAL(18,1))
                                    AS DECIMAL(18,2))
                             AS DECIMAL(38,4))) AS DOUBLE) AS s4
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0
           THEN CAST(CAST((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                     / power(s2 / n - (s1 / n) * (s1 / n), 1.5)
                     AS DECIMAL(10,6)) AS DOUBLE)
           ELSE CAST(NULL AS DOUBLE) END AS skewness,
           CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0
           THEN CAST(CAST((s4 / n - 4 * (s1 / n) * (s3 / n)
                      + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                     / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))
                     - 3.0 AS DECIMAL(10,6)) AS DOUBLE)
           ELSE CAST(NULL AS DOUBLE) END AS excess_kurtosis
    FROM m
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis from decimal-exact power
    sums — the 3rd/4th-moment extension of agg_corr, NOT the built-in
    skewness()/kurtosis() (their streaming central-moment updates are
    order-dependent and drift in the last ulps between engines; Spark's
    kurtosis is excess, DuckDB's is also excess but sample-corrected —
    different estimator entirely).

    Discipline (exprs.py): each input converts to decimal at its natural
    scale FIRST (l_quantity → DECIMAL(18,1)), powers multiply in decimal
    with an explicit exact cast after every product (x² scale 2, x³ scale
    3, x⁴ scale 4 — max value ~6.25e6/row, sums fit DECIMAL(38,4)), so
    Σx..Σx⁴ are exact integers-of-quanta. The moment combination runs in
    DOUBLE with TEXTUALLY IDENTICAL formulas on both sides, and the final
    statistics quantize through DECIMAL(10,6): Σx⁴ at sf0.1 is ~3.7e13
    with 4 decimals — past double's exact range, so the decimal→double
    cast may differ by an ulp between engines (the agg_corr lesson);
    after /n and the ~5× cancellation in the centered moments that noise
    is ≤1e-8, six orders under the quantum.

    Degenerate guard (r8 degenerate-corpus probe): a zero-variance group
    makes the computed variance (s2/n - (s1/n)^2) collapse to exactly 0
    and both divisions crash under ANSI; skewness/kurtosis are undefined
    there, so both emit NULL on the same computed-double guard in both
    engines.

    Scale shape: one partial-aggregated groupBy carrying five fixed-width
    accumulators per group — constant state, no second pass (the textbook
    two-pass centered algorithm re-reads the data; the power-sum form
    trades it for the decimal exactness the gate needs anyway).
    """
    li = load(spark, sf_dir, "lineitem")
    x1 = "CAST(l_quantity AS DECIMAL(18,1))"
    x2 = f"CAST({x1} * {x1} AS DECIMAL(18,2))"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST(SUM({x1}) AS DOUBLE)").alias("s1"),
        F.expr(f"CAST(SUM({x2}) AS DOUBLE)").alias("s2"),
        F.expr(f"CAST(SUM(CAST({x2} * {x1} AS DECIMAL(28,3))) AS DOUBLE)").alias("s3"),
        F.expr(f"CAST(SUM(CAST({x2} * {x2} AS DECIMAL(38,4))) AS DOUBLE)").alias("s4"),
    )
    return m.select(
        "l_returnflag",
        "n",
        F.expr(
            "CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0"
            " THEN CAST(CAST((s3 / n - 3 * (s1 / n) * (s2 / n)"
            " + 2 * (s1 / n) * (s1 / n) * (s1 / n))"
            " / power(s2 / n - (s1 / n) * (s1 / n), 1.5)"
            " AS DECIMAL(10,6)) AS DOUBLE)"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("skewness"),
        F.expr(
            "CASE WHEN (s2 / n - (s1 / n) * (s1 / n)) > 0"
            " THEN CAST(CAST((s4 / n - 4 * (s1 / n) * (s3 / n)"
            " + 6 * (s1 / n) * (s1 / n) * (s2 / n)"
            " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))"
            " / ((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)))"
            " - 3.0 AS DECIMAL(10,6)) AS DOUBLE)"
            " ELSE CAST(NULL AS DOUBLE) END"
        ).alias("excess_kurtosis"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap rollup (Spark 3.5+ bitmap_*
    functions): keys bucket into 32k-bit blocks, each (group, bucket)
    aggregates into one fixed-size bitmap, and per-group distinct is the
    sum of bucket popcounts. This is the warehouse bitmap-index pattern
    (Snowflake/ClickHouse bitmap rollups): unlike COUNT(DISTINCT)'s
    expand+dedup — whose exchange carries every distinct VALUE — the
    bitmap form's exchange carries constant-size bitmaps per bucket, and
    bitmaps of disjoint loads OR-merge, so the same materialized
    aggregate serves incremental refresh.

    Parity: the oracle counts distinct the plain way — the bitmap
    pipeline must reproduce the exact integers (it is exact by
    construction, unlike HLL; agg_hll_sketch covers the approximate
    tier). Integer outputs only.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_bm")

    def rollup(key: str, alias: str) -> str:
        return f"""
        SELECT l_returnflag, CAST(SUM(cnt) AS BIGINT) AS {alias}
        FROM (
          SELECT l_returnflag,
                 bitmap_bucket_number({key}) AS bkt,
                 bitmap_count(bitmap_construct_agg(
                     bitmap_bit_position({key}))) AS cnt
          FROM lineitem_bm
          GROUP BY l_returnflag, bitmap_bucket_number({key})
        ) GROUP BY l_returnflag
        """

    parts = spark.sql(rollup("l_partkey", "n_distinct_parts"))
    supps = spark.sql(rollup("l_suppkey", "n_distinct_supps"))
    return parts.join(supps, "l_returnflag")


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE)
               AS exact_p50,
           TRUE AS approx_within_1pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (the t-digest-style sketch tier for
    quantiles, next to agg_hll_sketch's distinct tier) with its accuracy
    CONTRACT as the checked value: the oracle cannot reproduce Spark's
    percentile_approx sketch, but it can assert the promise — the Spark
    side emits whether the sketch's median lands within 1% of the exact
    one, and the oracle emits literal TRUE. A sketch drifting out of
    contract flips the flag and fails the hash — an honest check of the
    approximation, not of bit-equal internals.

    exact_p50 itself is Spark's exact interpolated percentile vs
    DuckDB's quantile_cont (the agg_median parity pairing). At 100 TB
    the sketch path is the one to run: percentile_approx
    partial-aggregates constant-size state, where exact percentile
    carries per-group value lists.
    """
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 1000)").alias(
            "approx_p50"
        ),
    )
    return agg.select(
        "l_returnflag",
        "exact_p50",
        (
            F.abs(F.col("approx_p50") - F.col("exact_p50"))
            <= 0.01 * F.abs(F.col("exact_p50"))
        ).alias("approx_within_1pct"),
    )


@query(
    "agg_linreg",
    oracle="""
    WITH m AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST((epoch_us(ts)
                              - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                             // 3600000000 AS DECIMAL(18,0))) AS DOUBLE)
                   AS sx,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sy,
               CAST(SUM(CAST((epoch_us(ts)
                              - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                             // 3600000000 AS DECIMAL(18,0))
                        * CAST((epoch_us(ts)
                              - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                             // 3600000000 AS DECIMAL(18,0))) AS DOUBLE)
                   AS sxx,
               CAST(SUM(CAST((epoch_us(ts)
                              - epoch_us(TIMESTAMP '2024-01-01 00:00:00'))
                             // 3600000000 AS DECIMAL(18,0))
                        * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxy
        FROM events
        GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx)
                     AS DECIMAL(14,8)) AS DOUBLE) AS slope_per_hour,
           CAST(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                     / n AS DECIMAL(14,6)) AS DOUBLE) AS intercept
    FROM m
    """,
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend line (slope/intercept of value over time) —
    the price-drift analytic of the reference's domain, from the same
    decimal-exact moment sums as agg_corr (the built-in regr_slope
    streams updates in engine-specific order and drifts in the last
    ulps). x is integer HOURS since a fixed origin — exact in decimal,
    small enough that x² moments stay far from overflow at any SF.

    Scale shape: one partial-aggregated groupBy carrying four
    fixed-width moment accumulators — O(1) state per series regardless
    of volume. The slope/intercept ratios are quantized through coarse
    decimals (the agg_corr rule: ratios of exact moments still carry
    division noise).
    """
    ev = load(spark, sf_dir, "events")
    x_dec = (
        "CAST((unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01 00:00:00'))"
        " DIV 3600000000 AS DECIMAL(18,0))"
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"CAST(SUM({x_dec}) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)").alias(
            "sy"
        ),
        F.expr(f"CAST(SUM({x_dec} * {x_dec}) AS DOUBLE)").alias("sxx"),
        F.expr(
            f"CAST(SUM({x_dec} * CAST(value AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("sxy"),
    )
    return m.select(
        "event_type",
        "n",
        F.expr(
            "CAST(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx)"
            " AS DECIMAL(14,8)) AS DOUBLE)"
        ).alias("slope_per_hour"),
        F.expr(
            "CAST(CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)"
            " / n AS DECIMAL(14,6)) AS DOUBLE)"
        ).alias("intercept"),
    )


# Correlation-matrix plumbing: the four lineitem measures at their natural
# decimal scales (exprs.py rule: convert each INPUT to decimal first, then
# multiply in decimal — squaring doubles first loses the half-quantum race).
#
# r12 (guide §1.2 per-task work, VERDICT r11 item 8): each column carries
# a SUM cast and a narrower MULTIPLY cast. Spark's decimal agg buffer is a
# mutable long while the accumulator precision stays ≤ 18 and a per-row
# BigDecimal byte array above it, and a decimal multiply is a long
# multiply while p1+p2+1 ≤ 18 — so the narrowest PROVABLY-safe precision
# per column buys long-path arithmetic without changing one output bit
# (sums are exact integers in quantum units either way; the measured
# interleaved A/B at sf0.1 reads 2.28 s → 1.95 s with exceptAll-identical
# output; the all-DECIMAL(18,*) form pays BigDecimal on every row).
# Ceiling audit at 100 TB lineitem (~8.7e11 rows; values generator-bounded
# at ANY SF: qty ≤ 50, price ≤ 104,949.50, disc ≤ 0.10, tax ≤ 0.08):
#   s_qty   SUM(DEC(8,1))  → DEC(18,1), cap 1e17 vs 4.4e13  (2300×, long)
#   s_price SUM(DEC(18,2)) → DEC(28,2), cap 1e26 vs 9.2e16  (wide: a long
#           accumulator would cap at 1e16 — the one single sum that MUST
#           stay BigDecimal)
#   s_disc/s_tax SUM(DEC(8,2)) → DEC(18,2), cap 1e16 vs 8.7e10 (1e5×, long)
#   qty²  (4,1)²   → SUM DEC(19,2), cap 1e17 vs 2.2e15  (45×)
#   price²(8,2)²   → SUM DEC(27,4), cap 1e23 vs 9.6e21  (10×)
#   qty·price      → SUM DEC(23,3), cap 1e20 vs 4.6e18  (22×)
#   price·disc/tax → SUM DEC(22,4), cap 1e18 vs 9.2e15  (110×)
#   qty·disc/tax   → SUM DEC(17,3), cap 1e14 vs 4.4e12  (23×, long)
#   disc²/tax²/disc·tax → SUM DEC(16,4), cap 1e12 vs ≤ 8.7e9 (115×+, long)
# Overflow past these caps raises under ANSI (loud), never corrupts.
_CM_COLS = (
    ("l_quantity", "DECIMAL(8,1)", "DECIMAL(4,1)"),
    ("l_extendedprice", "DECIMAL(18,2)", "DECIMAL(8,2)"),
    ("l_discount", "DECIMAL(8,2)", "DECIMAL(3,2)"),
    ("l_tax", "DECIMAL(8,2)", "DECIMAL(3,2)"),
)
_CM_PAIRS = tuple(
    (_CM_COLS[i][0], _CM_COLS[j][0])
    for i in range(len(_CM_COLS))
    for j in range(i + 1, len(_CM_COLS))
)


def _cm_moment_sql() -> str:
    """The shared one-scan moment list (identical text both engines)."""
    parts = ["COUNT(*) AS n"]
    for c, d, m in _CM_COLS:
        parts.append(f"CAST(SUM(CAST({c} AS {d})) AS DOUBLE) AS s_{c}")
        parts.append(
            f"CAST(SUM(CAST({c} AS {m}) * CAST({c} AS {m})) AS DOUBLE)"
            f" AS ss_{c}"
        )
    for (x, _, mx), (y, _, my) in (
        (_CM_COLS[i], _CM_COLS[j])
        for i in range(len(_CM_COLS))
        for j in range(i + 1, len(_CM_COLS))
    ):
        parts.append(
            f"CAST(SUM(CAST({x} AS {mx}) * CAST({y} AS {my})) AS DOUBLE)"
            f" AS sp_{x}_{y}"
        )
    return ",\n               ".join(parts)


def _cm_corr_sql(x: str, y: str) -> str:
    """Pearson r from the named moments, quantized per the agg_corr rule.
    NULL when either column's computed variance moment collapses to 0 —
    a zero-variance feature makes r undefined and x/sqrt(0) an ANSI
    crash (r8 degenerate-corpus probe); the guard is the same
    computed-double inequality in both engines (shared generator)."""
    return (
        f"CASE WHEN (n * ss_{x} - s_{x} * s_{x}) > 0"
        f" AND (n * ss_{y} - s_{y} * s_{y}) > 0"
        f" THEN CAST(CAST((n * sp_{x}_{y} - s_{x} * s_{y})"
        f" / (sqrt(n * ss_{x} - s_{x} * s_{x})"
        f" * sqrt(n * ss_{y} - s_{y} * s_{y})) AS DECIMAL(10,6)) AS DOUBLE)"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )


_CM_UNION = "\n    UNION ALL\n".join(
    f"    SELECT l_returnflag, '{x}' AS col_x, '{y}' AS col_y,"
    f" {_cm_corr_sql(x, y)} AS corr FROM m"
    for x, y in _CM_PAIRS
)


@query(
    "agg_corr_matrix",
    oracle=f"""
    WITH m AS (
        SELECT l_returnflag,
               {_cm_moment_sql()}
        FROM lineitem
        GROUP BY l_returnflag
    )
{_CM_UNION}
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the four lineitem
    measures, per return flag, in ONE table scan — the feature-screening
    primitive (drop collinear features before training) generalizing
    agg_corr from one pair to all C(4,2)=6, long-format output
    (group, col_x, col_y, corr).

    Scale shape: one partial-aggregated groupBy computes all 15 moments
    (count, 4 sums, 4 square sums, 6 cross sums) in a single pass — the
    scan cost is identical to agg_corr's single pair because moments are
    just more agg buffers, not more data movement; the pair fan-out is a
    zero-shuffle Expand (stack) AFTER aggregation, on 3 group rows. The
    100 TB story: for k columns the matrix needs k(k+1)/2 moment buffers
    and still ONE scan — versus k² separate corr() jobs.

    Parity: the exact-decimal moment discipline and the DECIMAL(10,6)
    quantize-then-double edge are inherited verbatim from agg_corr (see
    its docstring for the saturated-moment rationale); the oracle builds
    the same moments and the same quantized formula per pair.
    """
    li = load(spark, sf_dir, "lineitem")
    moment_aggs = [F.count(F.lit(1)).alias("n")]
    for c, d, m in _CM_COLS:
        moment_aggs.append(
            F.expr(f"CAST(SUM(CAST({c} AS {d})) AS DOUBLE)").alias(f"s_{c}")
        )
        moment_aggs.append(
            F.expr(
                f"CAST(SUM(CAST({c} AS {m}) * CAST({c} AS {m})) AS DOUBLE)"
            ).alias(f"ss_{c}")
        )
    for i in range(len(_CM_COLS)):
        for j in range(i + 1, len(_CM_COLS)):
            (x, _, mx), (y, _, my) = _CM_COLS[i], _CM_COLS[j]
            moment_aggs.append(
                F.expr(
                    f"CAST(SUM(CAST({x} AS {mx}) * CAST({y} AS {my}))"
                    " AS DOUBLE)"
                ).alias(f"sp_{x}_{y}")
            )
    m = li.groupBy("l_returnflag").agg(*moment_aggs)
    stack_args = ", ".join(
        f"'{x}', '{y}', {_cm_corr_sql(x, y)}" for x, y in _CM_PAIRS
    )
    return m.select(
        "l_returnflag",
        F.expr(
            f"stack({len(_CM_PAIRS)}, {stack_args}) AS (col_x, col_y, corr)"
        ),
    ).select("l_returnflag", "col_x", "col_y", "corr")


# The portable per-row digest: every field rendered through an
# engine-agnostic string form (ints, VARCHARs, DECIMAL-pinned numerics,
# explicitly formatted timestamps — never raw double repr, which is
# shortest-round-trip in Spark and can differ elsewhere), joined with a
# separator that cannot appear in the data.
_CHECKSUM_CANON_DUCK = (
    "concat_ws('|', CAST(l_orderkey AS VARCHAR),"
    " CAST(l_linenumber AS VARCHAR),"
    " CAST(CAST(l_quantity AS DECIMAL(18,1)) AS VARCHAR), l_returnflag,"
    " l_linestatus, strftime(l_shipdate, '%Y-%m-%d'))"
)
_CHECKSUM_CANON_SPARK = (
    "concat_ws('|', CAST(l_orderkey AS STRING),"
    " CAST(l_linenumber AS STRING),"
    " CAST(CAST(l_quantity AS DECIMAL(18,1)) AS STRING), l_returnflag,"
    " l_linestatus, date_format(l_shipdate, 'yyyy-MM-dd'))"
)


@query(
    "table_checksum",
    oracle=f"""
    WITH digests AS (
        SELECT l_returnflag,
               md5({_CHECKSUM_CANON_DUCK}) AS h
        FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n_rows,
           bit_xor(CAST(concat('0x', substring(h, 1, 12)) AS BIGINT))
               AS xor_lo,
           bit_xor(CAST(concat('0x', substring(h, 13, 12)) AS BIGINT))
               AS xor_hi
    FROM digests GROUP BY l_returnflag
    """,
)
def table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table checksum: md5 each row's canonical string
    form, XOR-fold two 48-bit digest slices per group — the migration /
    replication validation primitive (prove a 100 TB copy is identical
    without sorting or moving the data; any flipped cell, lost row, or
    duplicated row changes the XOR). This engine vs DuckDB over the same
    parquet IS such a cross-system audit, which makes the key
    self-demonstrating.

    Scale shape: embarrassingly map-side — digest and slice-parse are
    per-row projections; bit_xor is commutative/associative so the
    aggregate partial-combines and the exchange carries ONE 3-column row
    per (group × map partition). No sort anywhere (checksum-by-sort is
    the naive O(n log n) answer; XOR-fold is O(n) and order-free).

    Parity: the digest input renders every field through a pinned string
    form (DECIMAL-scaled numerics, explicit date format — raw double
    repr is banned, Spark/DuckDB shortest-repr rules differ); hex→int is
    conv() in Spark and an 0x-literal cast in DuckDB over identical md5
    hex; 48-bit slices keep every intermediate far inside BIGINT.
    """
    li = load(spark, sf_dir, "lineitem")
    digests = li.select(
        "l_returnflag",
        F.expr(f"md5({_CHECKSUM_CANON_SPARK})").alias("h"),
    )
    return digests.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "bit_xor(CAST(conv(substring(h, 1, 12), 16, 10) AS BIGINT))"
        ).alias("xor_lo"),
        F.expr(
            "bit_xor(CAST(conv(substring(h, 13, 12), 16, 10) AS BIGINT))"
        ).alias("xor_hi"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS price,
               CAST(l_quantity AS DOUBLE) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY price, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM base
    )
    SELECT l_returnflag,
           CAST(min(price) AS DOUBLE) AS weighted_median_price,
           CAST(min(tw) AS DOUBLE) AS total_weight
    FROM cum WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (50th weighted percentile): the price at which
    half the QUANTITY-weighted mass of each return-flag group is reached
    — the robust center a revenue dashboard wants when one 10,000-unit
    line shouldn't count the same as a 1-unit line. Spark has no
    weighted-percentile builtin; the engine expresses it as a cumulative-
    weight window — the textbook formulation every SQL engine shares.

    Scale shape: ONE hash partition per group key carries both window
    passes (running cumsum and group total share the same partitioning —
    Catalyst plans a single Exchange and two Window nodes over it), then
    the first-crossing pick is a plain filtered MIN aggregate on the same
    key: no self-join, no collect, no per-group sort beyond the window's
    partition-local one. Group cardinality (3 flags here) never matters —
    at 100 TB with high-cardinality keys it is the identical plan; a
    single SKEWED group is the known hard case (one partition sorts that
    group) and the swap is the two-pass histogram-bisect (coarse bucket
    counts → exact pass inside the median bucket), CERTIFIED as the
    sibling key agg_weighted_median_hist (same oracle — identical
    statistic); this exact form stays as the parity reference.

    Parity: weights are integral quantities summed as doubles in window
    ROW order — the frame order is pinned by the deterministic
    (price, orderkey, linenumber) tie-break so both engines fold the
    SAME sequence of exact-in-double values; the crossing test and MIN
    pick then run on identical numbers."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("double").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    ww = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "price",
        F.sum("w").over(ww).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") >= F.col("tw") / 2)
        .groupBy("l_returnflag")
        .agg(
            F.min("price").alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
    )


# Histogram-bisect bucket width for the *_hist scale twins: the price
# domain (~900-110000) yields ~1100 buckets regardless of row count, so
# the per-group window rides the DOMAIN-bounded bucket grid, never the
# data. The width is a resolution/second-pass-size dial, not a
# correctness dial — the second pass inside the boundary bucket restores
# the exact statistic at any width.
HIST_BUCKET_WIDTH = 100.0


@query(
    "agg_weighted_median_hist",
    oracle="""
    WITH base AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DOUBLE) AS price,
               CAST(l_quantity AS DOUBLE) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price,
               SUM(w) OVER (PARTITION BY l_returnflag
                            ORDER BY price, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM base
    )
    SELECT l_returnflag,
           CAST(min(price) AS DOUBLE) AS weighted_median_price,
           CAST(min(tw) AS DOUBLE) AS total_weight
    FROM cum WHERE cw >= tw / 2
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median via histogram-bisect — the 100 TB-safe sibling of
    agg_weighted_median (VERDICT r4 item 4), same EXACT statistic, so the
    oracle is the exact form's SQL verbatim: matching it proves
    bisect ≡ full-sort. agg_weighted_median's docstring names this swap as
    the answer to its known hard case (one skewed group forces a full
    per-group sort); here the sort never happens.

    Two passes, neither sorting data:
    1. bucket pass — FLOOR(price/W) buckets, one partial-aggregated
       groupBy (the exchange carries one row per (group × bucket × task)),
       then a running-weight window over the DOMAIN-bounded bucket grid
       (~1.1k buckets at any SF) finds the bucket containing the weighted
       midpoint and the cumulative weight before it;
    2. boundary pass — only rows landing in that one bucket per group
       (a broadcast semi-filter; bucket occupancy is |rows|·W/domain,
       ~0.1% here) get the exact within-bucket crossing via a window over
       that tiny slice.

    A true approx form (t-digest / approx_percentile bounds) cannot be
    hash-certified cross-engine — the sketches are engine-specific — so
    the certifiable scale twin keeps exactness and moves the cost bound
    from O(rows log rows) per group to O(rows) + O(buckets log buckets).

    Parity: weights are integer-valued doubles (exact, associative at any
    partial-agg order); tw/2 is a power-of-two division; the crossing
    price is tie-insensitive (all rows of the crossing run share one
    price), so bucket-local cumulative order cannot change the answer."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    b = li.withColumn(
        "b", F.floor(F.col("price") / F.lit(HIST_BUCKET_WIDTH)).cast("bigint")
    )
    # pass 1: bucket weights -> running weight over the bucket grid
    bw = b.groupBy("l_returnflag", "b").agg(F.sum("w").alias("bw"))
    wg = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    cumb = bw.select(
        "l_returnflag",
        "b",
        F.sum("bw").over(wg).alias("cumw"),
        F.sum("bw").over(wt).alias("tw"),
    )
    picked = cumb.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cumw") >= F.col("tw") / 2, F.col("b"))).alias(
            "med_b"
        ),
        F.coalesce(
            F.max(F.when(F.col("cumw") < F.col("tw") / 2, F.col("cumw"))),
            F.lit(0.0),
        ).alias("c_prev"),
        F.max("tw").alias("tw"),
    )
    # pass 2: exact crossing inside the one median bucket per group
    cand = b.join(F.broadcast(picked), "l_returnflag").filter(
        F.col("b") == F.col("med_b")
    )
    win = (
        Window.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    crossed = cand.withColumn("cw_in", F.sum("w").over(win)).filter(
        F.col("c_prev") + F.col("cw_in") >= F.col("tw") / 2
    )
    return crossed.groupBy("l_returnflag").agg(
        F.min("price").alias("weighted_median_price"),
        F.min("tw").alias("total_weight"),
    )


# Heavy-hitter support threshold: customers holding >= this many open
# orders. Exact phi-frequent formulation; the streaming-scale swap is
# Misra-Gries per partition + merge (documented below).
HH_MIN_ORDERS = 12


@query(
    "agg_heavy_hitters",
    oracle=f"""
    WITH cnt AS (
        SELECT o_custkey, COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS spend
        FROM orders GROUP BY o_custkey
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders
    )
    SELECT o_custkey, CAST(n_orders AS BIGINT) AS n_orders,
           CAST(spend AS DOUBLE) AS total_spend,
           CAST(CAST(n_orders / (SELECT n FROM tot) AS DECIMAL(12,8))
                AS DOUBLE) AS order_share
    FROM cnt WHERE n_orders >= {HH_MIN_ORDERS}
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (phi-frequent keys): customers with ≥
    {HH_MIN_ORDERS} orders, with their order share and exact decimal
    spend — the skew-diagnosis query run before choosing a join
    strategy (its output IS the salting key list for join_salted_skew).

    Scale shape: one partial-combined count-per-key aggregate — the
    map-side combiner means a hot key costs one combiner slot per task,
    never a hot reducer; the threshold filter prunes the reducer output
    to the (tiny) frequent set before the 1-row total broadcasts on. At
    streaming/100 TB scale where even the distinct-key frame is too big,
    the documented swap is Misra-Gries/SpaceSaving per partition +
    counter merge (bounded memory, superset guarantee, then one exact
    recount pass over the candidate set) — the exact recount is THIS
    plan with the candidate set broadcast as a semi-join filter.

    Parity: counts exact; spend folds through DECIMAL(38,4) (dsum
    discipline); the share ratio quantizes through DECIMAL(12,8)."""
    o = load(spark, sf_dir, "orders")
    cnt = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("spend"),
    )
    tot = o.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        cnt.filter(F.col("n_orders") >= HH_MIN_ORDERS)
        .crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "n_orders",
            F.col("spend").cast("double").alias("total_spend"),
            (F.col("n_orders") / F.col("n"))
            .cast("decimal(12,8)")
            .cast("double")
            .alias("order_share"),
        )
    )


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
        WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS total_price,
           CAST(CAST(
               CAST(SUM((2 * rn - n - 1)
                        * CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE)
               / (CAST(MAX(n) AS DOUBLE)
                  * CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                         AS DOUBLE))
               AS DECIMAL(18,6)) AS DOUBLE) AS gini
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of order value per priority class —
    the inequality / revenue-concentration audit (how top-heavy is spend?)
    that pairs with win_pareto_abc's banding: Pareto tells you WHO the top
    customers are, Gini gives one comparable number per segment.

    Uses the sorted-rank identity G = sum((2i - n - 1) * x_i) / (n * sum x)
    over x ascending — a single window-rank pass plus one grouped
    aggregate, no pairwise |x_i - x_j| (the textbook O(n^2) form).

    Parity: the rank coefficient (2*rn - n - 1) is exact integer arithmetic;
    its product with DECIMAL(19,4) prices sums exactly (order-insensitive),
    so the numerator and denominator are bit-identical in both engines and
    the one double quotient quantizes through DECIMAL(18,6) (the agg_corr
    moment-ratio rule). Ties on price cannot flap the sum: permuting equal
    x across adjacent ranks leaves sum(coef * x) unchanged, and rn itself
    is pinned by the o_orderkey tiebreak.

    Scale shape: one exchange to sort within each priority class (the
    window), then a partial-agg groupBy on the same key — AQE coalesces
    them onto the same partitioning, so effectively ONE shuffle of
    (priority, price, rank) triples. Group count is 5; per-group sort is
    the cost, exactly the win_pareto_abc posture. At 100 TB the same
    computation runs per partition-of-priority via range partitioning on
    (priority, price) — ranks are sort-order statistics, not all-pairs.

    NULL prices are excluded on both sides: an unmeasured order carries
    no spend to concentrate, and leaving it in diverges the engines
    anyway (Spark ranks NULLS FIRST ascending, DuckDB NULLS LAST —
    every non-null row's rank would shift).
    """
    od = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    ranked = od.select(
        "o_orderpriority",
        "o_totalprice",
        F.expr(
            "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice, o_orderkey)"
        ).alias("rn"),
        F.expr(
            "COUNT(*) OVER (PARTITION BY o_orderpriority)"
        ).alias("n"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_orders"),
        F.expr(
            f"CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE)"
        ).alias("total_price"),
        F.expr(
            f"""CAST(CAST(
                CAST(SUM((2 * rn - n - 1)
                         * CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE)
                / (CAST(MAX(n) AS DOUBLE)
                   * CAST(SUM(CAST(o_totalprice AS {DEC})) AS DOUBLE))
                AS DECIMAL(18,6)) AS DOUBLE)"""
        ).alias("gini"),
    )


@query(
    "agg_winsorized_mean",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS price,
               row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
               ) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    bounds AS (
        SELECT *,
               MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN price END)
                   OVER (PARTITION BY l_returnflag) AS p_lo,
               MAX(CASE WHEN rn = n - (5 * n + 99) // 100 + 1 THEN price END)
                   OVER (PARTITION BY l_returnflag) AS p_hi
        FROM ranked
    )
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(p_lo) AS DOUBLE) AS p_lo,
           CAST(MAX(p_hi) AS DOUBLE) AS p_hi,
           CAST(SUM(CAST(LEAST(GREATEST(price, p_lo), p_hi)
                    AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
               AS winsorized_mean,
           CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
               AS raw_mean
    FROM bounds GROUP BY l_returnflag
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clip each group's price distribution at
    its 5th/95th percentile values, then average — the robust central
    tendency finance and metrics teams report when a handful of fat-tail
    rows would otherwise drag the plain mean (keeps every row, unlike a
    trimmed mean, so group sizes stay interpretable).

    Parity: the clip bounds are selected by EXPLICIT integer nearest-rank
    arithmetic — ceil(0.05 n) computed as (5n + 99) DIV 100 in exact
    integer math, never ceil() on an inexact 0.05*n double (the
    ts_theilsen rank-selection rule) — so both engines pick the same
    element values; tied prices make row_number order-ambiguous only
    between rows holding EQUAL values, so the value at any rank is
    deterministic. Clipping is exact comparisons; both means are exact
    DECIMAL(38,4) sums divided once.

    Scale shape: one hash-partitioned window pass per group computes
    ranks and broadcasts the two bound values down the partition, then a
    partial-aggregated groupBy finishes. Low-cardinality group keys make
    the window partitions wide — at 100 TB the same statistic comes from
    the two-pass histogram-bisect form, CERTIFIED as the sibling key
    agg_winsorized_mean_hist (same oracle — identical statistic); this
    operator is the exact small-group parity reference.
    """
    li = load(spark, sf_dir, "lineitem")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.expr(
            """row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
               )"""
        ).alias("rn"),
        F.expr("COUNT(*) OVER (PARTITION BY l_returnflag)").alias("n"),
    )
    bounds = ranked.select(
        "*",
        F.expr(
            """MAX(CASE WHEN rn = (5 * n + 99) DIV 100 THEN price END)
               OVER (PARTITION BY l_returnflag)"""
        ).alias("p_lo"),
        F.expr(
            """MAX(CASE WHEN rn = n - (5 * n + 99) DIV 100 + 1 THEN price END)
               OVER (PARTITION BY l_returnflag)"""
        ).alias("p_hi"),
    )
    return bounds.groupBy("l_returnflag").agg(
        F.expr("CAST(MAX(n) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(MAX(p_lo) AS DOUBLE)").alias("p_lo"),
        F.expr("CAST(MAX(p_hi) AS DOUBLE)").alias("p_hi"),
        F.expr(
            """CAST(SUM(CAST(LEAST(GREATEST(price, p_lo), p_hi)
               AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)"""
        ).alias("winsorized_mean"),
        F.expr(
            "CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)"
        ).alias("raw_mean"),
    )


@query(
    "agg_winsorized_mean_hist",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice AS price,
               row_number() OVER (
                   PARTITION BY l_returnflag ORDER BY l_extendedprice
               ) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    ),
    bounds AS (
        SELECT *,
               MAX(CASE WHEN rn = (5 * n + 99) // 100 THEN price END)
                   OVER (PARTITION BY l_returnflag) AS p_lo,
               MAX(CASE WHEN rn = n - (5 * n + 99) // 100 + 1 THEN price END)
                   OVER (PARTITION BY l_returnflag) AS p_hi
        FROM ranked
    )
    SELECT l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(p_lo) AS DOUBLE) AS p_lo,
           CAST(MAX(p_hi) AS DOUBLE) AS p_hi,
           CAST(SUM(CAST(LEAST(GREATEST(price, p_lo), p_hi)
                    AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
               AS winsorized_mean,
           CAST(SUM(CAST(price AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)
               AS raw_mean
    FROM bounds GROUP BY l_returnflag
    """,
)
def agg_winsorized_mean_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean via histogram-bisect rank selection — the
    100 TB-safe sibling of agg_winsorized_mean (VERDICT r4 item 4), same
    EXACT statistic, oracle = the exact form's SQL verbatim (matching it
    proves bisect ≡ full-rank-sort). The exact form's docstring names this
    two-pass swap; a true approx_percentile bound cannot be
    hash-certified cross-engine (engine-specific sketches), so the
    certifiable scale twin keeps exactness.

    Two domain-bounded passes, no per-group row sort anywhere:
    1. bucket pass — FLOOR(price/W) occupancy counts AND exact
       DECIMAL(38,4) per-bucket price sums (one partial-aggregated
       groupBy); the running count over the ~1.1k-bucket grid locates,
       for each of the two nearest-rank targets ceil(0.05n) and
       n-ceil(0.05n)+1, the bucket containing that rank, the count of
       rows before it, the count above the upper bucket, and the exact
       decimal mass of the strict interior — everything the clipped sum
       needs except the ≤2 boundary buckets themselves;
    2. boundary pass — rows in those (≤2 per group) buckets only get a
       within-bucket row_number to extract the exact rank values p_lo /
       p_hi (rank arithmetic in exact integers, the (5n+99) DIV 100 rule
       shared with the exact form) and a per-row clip sum; the winsorized
       total then FOLDS from bucket algebra — below-mass × p_lo +
       above-mass × p_hi + interior decimal sum + boundary clip sum — an
       exact-decimal identity with the oracle's row-level clipped sum, so
       no third clip scan of the table is needed (first version's shape;
       2.25 s → the bucket fold at 1×).

    Parity: rank targets are exact integer arithmetic on counts; the
    value AT a rank is deterministic under ties (equal-price rows are
    interchangeable); every mass term is an exact DECIMAL(38,4) (prices
    are 2-decimal values, counts are bigints, products stay far inside
    precision 38), so the folded total is bit-equal to the oracle's
    row-level decimal sum; final divisions see identical operands."""
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    )
    b = li.withColumn(
        "b", F.floor(F.col("price") / F.lit(HIST_BUCKET_WIDTH)).cast("bigint")
    )
    # pass 1: bucket occupancy + exact decimal mass -> running counts
    bc = b.groupBy("l_returnflag", "b").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.expr("SUM(CAST(price AS DECIMAL(38,4)))").alias("sb"),
    )
    wg = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    cumb = bc.select(
        "l_returnflag",
        "b",
        "cnt",
        "sb",
        F.sum("cnt").over(wg).alias("cum"),
        F.sum("cnt").over(wt).alias("n"),
    ).withColumn("r_lo", F.expr("(5 * n + 99) DIV 100")).withColumn(
        "r_hi", F.expr("n - (5 * n + 99) DIV 100 + 1")
    )
    # buckets strictly below b_lo have cum < r_lo; strictly above b_hi
    # have cum - cnt >= r_hi; strict interior has cum - cnt >= r_lo AND
    # cum < r_hi (cum is strictly increasing, so these partition the grid
    # around the ≤2 boundary buckets even when b_lo == b_hi)
    picked = cumb.groupBy("l_returnflag").agg(
        F.max("n").alias("n_rows"),
        F.max("r_lo").alias("r_lo"),
        F.max("r_hi").alias("r_hi"),
        F.min(F.when(F.col("cum") >= F.col("r_lo"), F.col("b"))).alias("b_lo"),
        F.coalesce(
            F.max(F.when(F.col("cum") < F.col("r_lo"), F.col("cum"))),
            F.lit(0),
        ).alias("cprev_lo"),
        F.min(F.when(F.col("cum") >= F.col("r_hi"), F.col("b"))).alias("b_hi"),
        F.coalesce(
            F.max(F.when(F.col("cum") < F.col("r_hi"), F.col("cum"))),
            F.lit(0),
        ).alias("cprev_hi"),
        F.expr(
            "SUM(CASE WHEN cum - cnt >= r_hi THEN cnt ELSE 0 END)"
        ).alias("cnt_above"),
        F.expr(
            """coalesce(SUM(CASE WHEN cum - cnt >= r_lo AND cum < r_hi
               THEN sb END), CAST(0 AS DECIMAL(38,4)))"""
        ).alias("s_interior"),
        F.expr("SUM(sb)").alias("s_all"),
    )
    # pass 2: exact rank values + boundary clip sum from inside the ≤2
    # boundary buckets, then the fold — no further table scan
    cand = b.join(F.broadcast(picked), "l_returnflag").filter(
        (F.col("b") == F.col("b_lo")) | (F.col("b") == F.col("b_hi"))
    )
    win = Window.partitionBy("l_returnflag", "b").orderBy("price")
    hit = cand.withColumn("rn", F.row_number().over(win))
    wgrp = Window.partitionBy("l_returnflag")
    hit = hit.withColumn(
        "p_lo",
        F.max(
            F.when(
                (F.col("b") == F.col("b_lo"))
                & (F.col("rn") == F.col("r_lo") - F.col("cprev_lo")),
                F.col("price"),
            )
        ).over(wgrp),
    ).withColumn(
        "p_hi",
        F.max(
            F.when(
                (F.col("b") == F.col("b_hi"))
                & (F.col("rn") == F.col("r_hi") - F.col("cprev_hi")),
                F.col("price"),
            )
        ).over(wgrp),
    )
    return hit.groupBy("l_returnflag").agg(
        F.expr("CAST(MAX(n_rows) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(MAX(p_lo) AS DOUBLE)").alias("p_lo"),
        F.expr("CAST(MAX(p_hi) AS DOUBLE)").alias("p_hi"),
        F.expr(
            """CAST((SUM(CAST(LEAST(GREATEST(price, p_lo), p_hi)
                         AS DECIMAL(38,4)))
                     + MAX(cprev_lo) * CAST(MAX(p_lo) AS DECIMAL(18,4))
                     + MAX(cnt_above) * CAST(MAX(p_hi) AS DECIMAL(18,4))
                     + MAX(s_interior)) AS DOUBLE)
               / MAX(n_rows)"""
        ).alias("winsorized_mean"),
        F.expr("CAST(MAX(s_all) AS DOUBLE) / MAX(n_rows)").alias("raw_mean"),
    )


@query(
    "agg_theil_index",
    oracle="""
    WITH base AS (
        SELECT o_orderpriority AS grp, o_totalprice AS x FROM orders
        WHERE o_totalprice > 0
    ),
    stats AS (
        SELECT grp, x,
               CAST(SUM(CAST(x AS DECIMAL(38,2))) OVER () AS DOUBLE) AS s_all,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_all,
               CAST(SUM(CAST(x AS DECIMAL(38,2))) OVER (PARTITION BY grp)
                    AS DOUBLE) AS s_grp,
               CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n_grp
        FROM base
    ),
    terms AS (
        SELECT grp, s_all, n_all, s_grp, n_grp,
               CAST((x / s_all) * ln(x / (s_all / n_all))
                    AS DECIMAL(18,12)) AS t_total,
               CAST((x / s_all) * ln(x / (s_grp / n_grp))
                    AS DECIMAL(18,12)) AS t_within
        FROM stats
    ),
    grouped AS (
        SELECT grp,
               MAX(n_grp) AS n,
               MAX(s_grp) / MAX(n_grp) AS mean_grp,
               CAST(SUM(t_within) AS DOUBLE) AS theil_within,
               CAST(CAST((MAX(s_grp) / MAX(s_all))
                    * ln((MAX(s_grp) / MAX(n_grp))
                         / (MAX(s_all) / MAX(n_all)))
                    AS DECIMAL(18,12)) AS DOUBLE) AS theil_between,
               CAST(SUM(t_total) AS DOUBLE) AS theil_contrib
        FROM terms GROUP BY grp
    )
    SELECT grp, n, mean_grp, theil_within, theil_between, theil_contrib,
           CAST(SUM(CAST(theil_contrib AS DECIMAL(18,12))) OVER ()
                AS DOUBLE) AS theil_total
    FROM grouped
    """,
)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality index with within/between decomposition: how
    unequal are order values, and how much of that inequality lives
    INSIDE priority classes vs BETWEEN them — the decomposable
    inequality measure (Theil 1967) that agg_gini cannot decompose
    (Gini's group terms overlap; Theil's are additive:
    T = Sigma_g within_g + Sigma_g between_g).

    Parity: group/global sums are exact decimals cast once to double,
    so every share and mean is a correctly-rounded quotient of
    identical operands; each per-row term carries libm ln and QUANTIZES
    through DECIMAL(18,12) before the exact decimal group sums (the
    per-term rule — scale 12 because shares shrink with corpus size);
    the between term quantizes the same way; the grand total re-sums
    the per-group doubles through decimal.

    Scale shape: group and global moments come from ONE
    partial-aggregated groupBy (5 rows) broadcast back onto the scan —
    never a global OVER () window (single-partition cliff; the probe
    caught it at 4.6x). The per-row ln is the honest cost — one libm
    call per row, map-side; the term aggregation partial-aggs into 5
    group rows. Linear scan, flat shuffle.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    base = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    # group/global moments via partial-aggregated groupBy + broadcast
    # re-attach — NEVER a global OVER () window, which funnels the whole
    # table through one partition (the probe measured 4.6x at 8x before
    # this rewrite; 1.2x after)
    gstats = base.groupBy("grp").agg(
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)"
        ).alias("s_grp"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_grp"),
    )
    tstats = gstats.agg(
        F.expr("CAST(SUM(CAST(s_grp AS DECIMAL(38,2))) AS DOUBLE)").alias(
            "s_all"
        ),
        F.expr("CAST(SUM(n_grp) AS BIGINT)").alias("n_all"),
    )
    stats = base.join(F.broadcast(gstats), "grp").crossJoin(
        F.broadcast(tstats)
    )
    terms = stats.select(
        "grp",
        "s_all",
        "n_all",
        "s_grp",
        "n_grp",
        F.expr(
            "CAST((x / s_all) * ln(x / (s_all / n_all)) AS DECIMAL(18,12))"
        ).alias("t_total"),
        F.expr(
            "CAST((x / s_all) * ln(x / (s_grp / n_grp)) AS DECIMAL(18,12))"
        ).alias("t_within"),
    )
    grouped = terms.groupBy("grp").agg(
        F.expr("MAX(n_grp)").alias("n"),
        F.expr("MAX(s_grp) / MAX(n_grp)").alias("mean_grp"),
        F.expr("CAST(SUM(t_within) AS DOUBLE)").alias("theil_within"),
        F.expr(
            """CAST(CAST((MAX(s_grp) / MAX(s_all))
               * ln((MAX(s_grp) / MAX(n_grp)) / (MAX(s_all) / MAX(n_all)))
               AS DECIMAL(18,12)) AS DOUBLE)"""
        ).alias("theil_between"),
        F.expr("CAST(SUM(t_total) AS DOUBLE)").alias("theil_contrib"),
    )
    return grouped.select(
        "*",
        F.expr(
            """CAST(SUM(CAST(theil_contrib AS DECIMAL(18,12))) OVER ()
               AS DOUBLE)"""
        ).alias("theil_total"),
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MAX(o_orderdate) AS DATE) AS max_day FROM orders
    ),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         (SELECT max_day FROM bounds)) AS recency_days,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY recency_days, o_custkey) AS rr,
               row_number() OVER (ORDER BY frequency, o_custkey) AS fr,
               row_number() OVER (ORDER BY monetary, o_custkey) AS mr,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM per_cust
    )
    SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
           frequency, monetary,
           CAST(5 - ((rr - 1) * 5) // n AS BIGINT) AS r_score,
           CAST(((fr - 1) * 5) // n + 1 AS BIGINT) AS f_score,
           CAST(((mr - 1) * 5) // n + 1 AS BIGINT) AS m_score,
           CASE WHEN 5 - ((rr - 1) * 5) // n >= 4
                     AND ((fr - 1) * 5) // n + 1 >= 4 THEN 'champion'
                WHEN 5 - ((rr - 1) * 5) // n <= 2
                     AND ((mr - 1) * 5) // n + 1 >= 4 THEN 'at-risk-high-value'
                WHEN 5 - ((rr - 1) * 5) // n <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM ranked
    """,
)
def agg_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since last
    order), Frequency (order count), Monetary (decimal-exact lifetime
    spend), each scored 1-5 by exact rank quintile, then bucketed into
    the marketing segments ('champion', 'at-risk-high-value', ...) —
    the workhorse lifecycle segmentation every commerce warehouse
    ships (Hughes 1994), feeding campaign targeting and the LTV curve's
    cohort cuts.

    Parity: recency/frequency are exact integers, monetary is an exact
    decimal sum cast once; quintile scores use the ts_sax_symbolize
    integer-rank trick (((rank-1)*5) DIV n — never ntile(), whose
    remainder distribution is engine-defined, and never float
    percentiles) over total orders (metric, custkey) — deterministic
    under ties; segment labels branch on the integer scores only.

    Scale shape: one partial-aggregated groupBy collapses orders to
    customers; the three rank windows are single-partition over the
    CUSTOMER grid (documented cliff bound: customer cardinality — at
    100 TB swap for range-partitioned percent_rank or pre-computed
    quantile bounds via agg_approx_percentile, both certified); the
    1-row max-date aggregate broadcasts.
    """
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(F.expr("CAST(MAX(o_orderdate) AS DATE)").alias("max_day"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.expr("CAST(MAX(o_orderdate) AS DATE)").alias("last_day"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("frequency"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)"
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            F.expr("CAST(datediff(max_day, last_day) AS BIGINT)").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    ranked = per_cust.select(
        "*",
        F.expr("row_number() OVER (ORDER BY recency_days, o_custkey)").alias("rr"),
        F.expr("row_number() OVER (ORDER BY frequency, o_custkey)").alias("fr"),
        F.expr("row_number() OVER (ORDER BY monetary, o_custkey)").alias("mr"),
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n"),
    )
    return ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.expr("CAST(5 - ((rr - 1) * 5) DIV n AS BIGINT)").alias("r_score"),
        F.expr("CAST(((fr - 1) * 5) DIV n + 1 AS BIGINT)").alias("f_score"),
        F.expr("CAST(((mr - 1) * 5) DIV n + 1 AS BIGINT)").alias("m_score"),
        F.expr(
            """CASE WHEN 5 - ((rr - 1) * 5) DIV n >= 4
                    AND ((fr - 1) * 5) DIV n + 1 >= 4 THEN 'champion'
               WHEN 5 - ((rr - 1) * 5) DIV n <= 2
                    AND ((mr - 1) * 5) DIV n + 1 >= 4
                    THEN 'at-risk-high-value'
               WHEN 5 - ((rr - 1) * 5) DIV n <= 2 THEN 'hibernating'
               ELSE 'regular' END"""
        ).alias("segment"),
    )


_MB_MIN_PAIR = 3  # minimum co-occurrence support (absolute orders)


@query(
    "agg_market_basket",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    totals AS (
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM baskets
    ),
    item_n AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM baskets GROUP BY l_partkey
    ),
    pair_n AS (
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_pair
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= {_MB_MIN_PAIR}
    )
    SELECT p.item_a, p.item_b, p.n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
           t.n_orders,
           CAST(p.n_pair AS DOUBLE) / t.n_orders AS support,
           CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence_ab,
           CAST(p.n_pair * t.n_orders AS DOUBLE)
               / CAST(ia.n_item * ib.n_item AS DOUBLE) AS lift
    FROM pair_n p
    JOIN item_n ia ON p.item_a = ia.l_partkey
    JOIN item_n ib ON p.item_b = ib.l_partkey
    CROSS JOIN totals t
    """,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over co-purchased parts: support,
    confidence(A=>B), and lift for every part pair co-occurring in at
    least 3 orders — the Apriori first-pass (Agrawal-Srikant 1994)
    behind "frequently bought together", giving
    graph_bipartite_projection's co-counts their probabilistic rule
    semantics (lift > 1 = genuinely associated, not just popular).

    Parity: basket/item/pair counts are exact integers; support and
    confidence are single correctly-rounded divisions; lift computes
    n_pair*n_orders and n_a*n_b as EXACT BIGINT products (well inside
    2^63 at any realistic catalog) cast once each — one division of
    identical operands, no FMA shape, nothing to quantize.

    Scale shape: baskets dedupe collapses the fact table first; the
    pair self-join keys on l_orderkey with fan-out bounded by basket
    size (never catalog^2 — the graph_triangle_count discipline);
    the support threshold keeps the rule set sparse as orders grow;
    item counts broadcast onto the rules. Linear in order volume.
    """
    li = load(spark, sf_dir, "lineitem")
    # baskets feeds FIVE consumers (totals, item counts, both self-join
    # sides): checkpoint so the scan + dedup exchange run once instead
    # of once per consumer (r5 plan audit: 5 lineitem scans -> 1)
    baskets = (
        li.select("l_orderkey", "l_partkey").distinct().transform(stage)
    )
    totals = baskets.agg(
        F.expr("CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)").alias("n_orders")
    )
    item_n = baskets.groupBy("l_partkey").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_item")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pair_n = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("item_a"),
            F.col("b.l_partkey").alias("item_b"),
        )
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_pair"))
        .filter(F.col("n_pair") >= _MB_MIN_PAIR)
    )
    ia = item_n.select(
        F.col("l_partkey").alias("item_a"), F.col("n_item").alias("n_a")
    )
    ib = item_n.select(
        F.col("l_partkey").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair_n.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            "n_orders",
            F.expr("CAST(n_pair AS DOUBLE) / n_orders").alias("support"),
            F.expr("CAST(n_pair AS DOUBLE) / n_a").alias("confidence_ab"),
            F.expr(
                "CAST(n_pair * n_orders AS DOUBLE)"
                " / CAST(n_a * n_b AS DOUBLE)"
            ).alias("lift"),
        )
    )


TARGET_ENCODE_SMOOTHING = 10


@query(
    "agg_target_encode",
    oracle=f"""
    WITH cat AS (
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n_c,
               SUM(CAST(value AS DECIMAL(38,4))) AS sum_c
        FROM events GROUP BY event_type
    ),
    g_all AS (
        SELECT CAST(COUNT(value) AS BIGINT) AS n_g,
               SUM(CAST(value AS DECIMAL(38,4))) AS sum_g
        FROM events
    )
    SELECT c.event_type, c.n_c,
           CAST(c.sum_c AS DOUBLE) / c.n_c AS raw_mean,
           CAST(g.sum_g AS DOUBLE) / g.n_g AS global_mean,
           CAST(CAST(c.sum_c * g.n_g
                     + {TARGET_ENCODE_SMOOTHING} * g.sum_g AS DOUBLE)
                / CAST(g.n_g * (c.n_c + {TARGET_ENCODE_SMOOTHING})
                       AS DOUBLE) AS DOUBLE) AS encoded
    FROM cat c CROSS JOIN g_all g
    """,
)
def agg_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian-smoothed target encoding of a categorical column — the
    standard tabular-ML encoder (replace each category with a
    prior-shrunk mean of the target): enc = (sum_c + m*global_mean)
    / (n_c + m) with pinned smoothing m = 10, so rare categories shrink
    toward the global mean instead of memorizing noise. Complements
    pipeline_feature_store's per-entity features with the per-CATEGORY
    encoder map (the artifact a training pipeline broadcasts back onto
    the fact table at scoring time).

    Parity by exact rational restatement (the ts_rolling_beta stance):
    enc = (sum_c*n_g + m*sum_g) / (n_g*(n_c + m)) keeps the numerator an
    EXACT decimal (decimal sums x BIGINT counts) and the denominator an
    exact BIGINT, leaving one final identical-operand double division —
    the a + m*g FMA shape that a naive smoothed-mean formula would hand
    DuckDB never exists. raw_mean/global_mean divide exact decimal sums
    by exact counts (the davg discipline).

    Scale shape: ONE grouped partial-agg over the fact table plus a
    1-row global aggregate broadcast back (the join_cross_scalar
    pattern) — two scans collapse map-side; the encoder map is
    |categories| rows. Flat at any fact volume.
    """
    ev = load(spark, sf_dir, "events")
    cat = ev.groupBy("event_type").agg(
        F.expr("CAST(COUNT(value) AS BIGINT)").alias("n_c"),
        F.expr(f"SUM(CAST(value AS {DEC}))").alias("sum_c"),
    )
    glob = ev.agg(
        F.expr("CAST(COUNT(value) AS BIGINT)").alias("n_g"),
        F.expr(f"SUM(CAST(value AS {DEC}))").alias("sum_g"),
    )
    m = TARGET_ENCODE_SMOOTHING
    return cat.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "n_c",
        F.expr("CAST(sum_c AS DOUBLE) / n_c").alias("raw_mean"),
        F.expr("CAST(sum_g AS DOUBLE) / n_g").alias("global_mean"),
        F.expr(
            f"""CAST(CAST(sum_c * n_g + {m} * sum_g AS DOUBLE)
                / CAST(n_g * (n_c + {m}) AS DOUBLE) AS DOUBLE)"""
        ).alias("encoded"),
    )
