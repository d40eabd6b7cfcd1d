"""Constraint-gate validation with pass/quarantine split (SURVEY.md §2.2
`validate_quarantine`; Phase 4).

The engine twin of the reference's Pydantic raise-on-violation gate
(dags/bpi_etl/bpi_etl_bigquery.py:66,133; models
common_module/pydantic_models.py:18-70): instead of raising and aborting the
run, rows are routed to pass/quarantine streams — at 100 TB a single bad
record must not kill the pipeline.

The constraint set mirrors the reference's validator styles:
- closed domain (Literal['Bitcoin'], pydantic_models.py:49) → isin
- length-constrained code (constr 3 chars, pydantic_models.py:37) → length+trim
- numeric sanity (epoch validator, pydantic_models.py:67-70) → range check
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import literal_rows_df
from bitcoin_price_etl_spark.registry import query

_ALLOWED_LANGS = ("en", "es", "de", "fr", "zh")

# Shared SQL text for the oracle twins — the predicate must be literally
# identical between pass and quarantine so the split is a partition.
_PRED_SQL = (
    "lang IN ('en', 'es', 'de', 'fr', 'zh') "
    "AND length(trim(source)) = 5 "
    "AND n_chars >= 150 AND n_chars <= 400 "
    "AND text IS NOT NULL AND length(text) > 0"
)


def _pred() -> Column:
    return (
        F.col("lang").isin(*_ALLOWED_LANGS)
        & (F.length(F.trim(F.col("source"))) == 5)
        & (F.col("n_chars") >= 150)
        & (F.col("n_chars") <= 400)
        & F.col("text").isNotNull()
        & (F.length("text") > 0)
    )


@query(
    "validate_pass",
    oracle=f"SELECT doc_id, lang, source, n_chars FROM documents WHERE {_PRED_SQL}",
)
def validate_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows satisfying the ingest contract — the validated stream."""
    d = load(spark, sf_dir, "documents")
    return d.filter(_pred()).select("doc_id", "lang", "source", "n_chars")


@query(
    "validate_quarantine",
    oracle=f"SELECT doc_id, lang, source, n_chars FROM documents WHERE NOT ({_PRED_SQL})",
)
def validate_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows violating the contract — the quarantine stream (never dropped:
    the reference *raises*; the engine preserves evidence)."""
    d = load(spark, sf_dir, "documents")
    return d.filter(~_pred()).select("doc_id", "lang", "source", "n_chars")


@query(
    "validate_expectations",
    oracle="""
    WITH li AS (
        SELECT count(*) AS n,
               sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS v_null,
               sum(CASE WHEN l_quantity < 1 OR l_quantity > 30
                        THEN 1 ELSE 0 END) AS v_range,
               sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                        THEN 1 ELSE 0 END) AS v_accept,
               sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS v_pos
        FROM lineitem
    ), uq AS (
        SELECT count(*) AS n_groups,
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS v_dup
        FROM (SELECT l_orderkey, l_linenumber, count(*) AS c
              FROM lineitem GROUP BY l_orderkey, l_linenumber)
    ), fk AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS v_orphan
        FROM lineitem li LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
    ), ords AS (
        SELECT count(*) AS n,
               sum(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-5]-')
                        THEN 1 ELSE 0 END) AS v_regex,
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_tp
        FROM orders
    )
    SELECT rule_name, table_name,
           CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations,
           n_violations = 0 AS passed
    FROM (
        SELECT 'not_null_orderkey' AS rule_name, 'lineitem' AS table_name,
               n AS n_checked, v_null AS n_violations FROM li
        UNION ALL
        SELECT 'quantity_range_1_30', 'lineitem', n, v_range FROM li
        UNION ALL
        SELECT 'returnflag_accepted_values', 'lineitem', n, v_accept FROM li
        UNION ALL
        SELECT 'extendedprice_positive', 'lineitem', n, v_pos FROM li
        UNION ALL
        SELECT 'unique_order_line', 'lineitem', n_groups, v_dup FROM uq
        UNION ALL
        SELECT 'fk_lineitem_orders', 'lineitem', n, v_orphan FROM fk
        UNION ALL
        SELECT 'priority_format', 'orders', n, v_regex FROM ords
        UNION ALL
        SELECT 'totalprice_positive', 'orders', n, v_tp FROM ords
    )
    """,
)
def validate_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations report (the dbt-test / Great
    Expectations surface): a rule suite — not-null, range, accepted
    values, positivity, compound-key uniqueness, referential integrity,
    regex format — evaluated in bulk, one report row per rule with
    checked/violation counts and a pass verdict. Complements
    validate_quarantine (row-level routing) with the suite-level audit a
    warehouse gate actually alerts on; on this corpus the range and
    uniqueness rules genuinely fail (~4% oversized quantities, duplicate
    (orderkey, linenumber) pairs), so both verdict branches are
    exercised at every SF.

    Scale shape: all four row-level lineitem rules ride ONE scan and ONE
    partial aggregate (a rule is just another CASE-sum buffer — the
    llm_quality_ensemble stance), the uniqueness rule is one
    key-partitioned groupBy collapsed to two counters, referential
    integrity is one key equi-join counted, and the orders rules share
    one more scan. The report union is 8 one-row frames — control-plane
    sized. Adding a rule at 100 TB costs one more agg buffer, not one
    more scan.

    Parity: every measure is an exact integer count; the regex ASCII
    class behaves identically in both engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias(
            "v_null"
        ),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 30), 1
            ).otherwise(0)
        ).alias("v_range"),
        F.sum(
            F.when(~F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(
                0
            )
        ).alias("v_accept"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0)).alias(
            "v_pos"
        ),
    )
    li_rules = li_agg.select(
        F.expr(
            "stack(4,"
            " 'not_null_orderkey', n, v_null,"
            " 'quantity_range_1_30', n, v_range,"
            " 'returnflag_accepted_values', n, v_accept,"
            " 'extendedprice_positive', n, v_pos"
            ") AS (rule_name, n_checked, n_violations)"
        ),
        F.lit("lineitem").alias("table_name"),
    )
    uq = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias(
                "n_violations"
            ),
        )
        .select(
            F.lit("unique_order_line").alias("rule_name"),
            "n_checked",
            "n_violations",
            F.lit("lineitem").alias("table_name"),
        )
    )
    fk = (
        li.join(
            o.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(
                F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
            ).alias("n_violations"),
        )
        .select(
            F.lit("fk_lineitem_orders").alias("rule_name"),
            "n_checked",
            "n_violations",
            F.lit("lineitem").alias("table_name"),
        )
    )
    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                ~F.col("o_orderpriority").rlike("^[1-5]-"), 1
            ).otherwise(0)
        ).alias("v_regex"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias(
            "v_tp"
        ),
    )
    o_rules = o_agg.select(
        F.expr(
            "stack(2,"
            " 'priority_format', n, v_regex,"
            " 'totalprice_positive', n, v_tp"
            ") AS (rule_name, n_checked, n_violations)"
        ),
        F.lit("orders").alias("table_name"),
    )
    cols = ["rule_name", "table_name", "n_checked", "n_violations"]
    report = (
        li_rules.select(*cols)
        .unionAll(uq.select(*cols))
        .unionAll(fk.select(*cols))
        .unionAll(o_rules.select(*cols))
    )
    return report.select(
        "rule_name",
        "table_name",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


@query(
    "validate_observe_metrics",
    oracle="""
    SELECT 'orders_ingest' AS pipeline,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)
               AS total_value,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_nonpositive,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
           CAST(COUNT(*) FILTER (o_totalprice >= 100000) AS BIGINT)
               AS n_large_kept
    FROM orders
    """,
)
def validate_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-cost pipeline observability via DataFrame.observe: health
    counters (row count, exact value total, nonpositive-amount and
    bad-status violation counts) ride the SAME scan as the real work —
    no second pass, no separate audit query. The op runs a
    representative job (count the large orders) with an Observation
    attached, then returns the observed metrics plus the job's own
    result as one audit row — exactly what a production ingest emits to
    its metrics sink per batch.

    Scale shape: observe() compiles to CollectMetrics inside the same
    physical plan — the counters partial-aggregate alongside the scan,
    cost O(1) extra state per task, and the job's filter/count is
    unchanged. This is the engine's answer to the reference's
    row-count/validation logging (R3's gate) at 100 TB: observability
    that never re-reads.

    Parity: counts exact; the total is the dsum discipline. The
    metrics row is assembled driver-side from the Observation result —
    control-plane by definition (the numbers themselves were computed
    distributed, inside the scan)."""
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("orders_ingest")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE)"
        ).alias("total_value"),
        F.sum(
            F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)
        ).alias("n_nonpositive"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(
                0
            )
        ).alias("n_bad_status"),
    )
    n_large = observed.filter(F.col("o_totalprice") >= 100000).count()
    m = obs.get
    # JVM-side literal result row, NOT spark.createDataFrame(list): the
    # python-RDD path parallelizes one audit row into default-parallelism
    # tasks, each a Python worker round trip — measured 2-12 s for this
    # single row mid-bench-session (the r9 "8.3x regression" that wasn't:
    # the scan and observe were always fast, the result-row materialization
    # was the cost). See exprs.literal_rows_df.
    return literal_rows_df(
        spark,
        [
            (
                "orders_ingest",
                m["n_rows"],
                float(m["total_value"]),
                m["n_nonpositive"],
                m["n_bad_status"],
                n_large,
            )
        ],
        "pipeline string, n_rows long, total_value double,"
        " n_nonpositive long, n_bad_status long, n_large_kept long",
    )


@query(
    "validate_benford",
    oracle="""
    WITH digits AS (
        SELECT CAST(substring(CAST(
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders
        WHERE o_totalprice > 0
    ),
    obs AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
        GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
    scored AS (
        SELECT digit, n_obs,
               CAST(CAST(log10(1.0 + 1.0 / digit) AS DECIMAL(18,8))
                    AS DOUBLE) AS p_benford,
               CAST(CAST(n_total AS DECIMAL(19,0))
                    * CAST(log10(1.0 + 1.0 / digit) AS DECIMAL(18,8))
                    AS DOUBLE) AS n_expected
        FROM obs CROSS JOIN tot
    )
    SELECT digit, n_obs, p_benford, n_expected,
           (n_obs - n_expected) * (n_obs - n_expected) / n_expected
               AS chi2_term
    FROM scored
    """,
)
def validate_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the money column: observed
    leading-digit counts vs the log10(1 + 1/d) expectation, with the
    per-digit chi-square contribution — the classic fabricated-data /
    broken-upstream detector for financial facts (a feed that suddenly
    clips, pads, or synthesizes amounts shifts this distribution long
    before row counts move). Complements validate_expectations' rule
    checks with a distributional check.

    Parity: the leading digit is extracted in SCALED-INTEGER space
    (floor(x*100 + 0.5) -> BIGINT -> first character), never via double
    formatting or log10-of-data, so digit assignment is bit-exact in both
    engines (exprs.py round-4 note 2). The nine Benford constants are
    libm log10 calls that may differ in the last ulp between JVM and C —
    each is quantized through DECIMAL(18,8) BEFORE use (both sides).
    Downstream of that quantize every operand is exact and identical,
    so the expectation is an EXACT decimal product
    (BIGINT n_total x DECIMAL(18,8) p, single cast to double) and the
    n_total operand is cast to DECIMAL(19,0) — NOT (20,0) — so the
    Spark product type is DECIMAL(38,8) (19+18+1 = 38, inside the
    38-digit cap). At (20,0) the nominal result precision was 39 and
    Spark silently demoted to DECIMAL(38,7) with a HALF_UP re-round at
    the 7th decimal, while DuckDB kept the exact (38,8) product: for
    n_total = 1437, Spark read 139.2596844 vs DuckDB 139.25968437 — a
    latent cross-engine divergence for any n_total not a multiple of 10
    (r9 ADVICE, fixed r10; regression test in test_plans.py). The
    chi-square term is a plain IEEE chain on identical operands — NO edge
    re-quantize. The original DECIMAL(18,4)/(18,6) re-quantizes were the
    rule-11 LATENT-BUG class (exprs.py round-7 note): they ADDED the
    midpoint-lottery divergence where none existed, caught for real by
    the r9 NULLS-at-sf0.1 probe — n_total = 145000 put
    n_total x p(4) = 14051.95145 exactly on a half-quantum and Spark's
    repr-HALF_UP split from DuckDB's exact-binary rounding (digits 4, 5
    and 9 all diverged). Exact restatement, not tolerance.

    Scale shape: a map-side digit projection + ONE partial-agg groupBy to
    9 rows; the grand total is an unpartitioned window over the 9-row
    aggregate (NOT a second agg off the source — that planned a second
    full scan of orders, caught in the plan snapshot). 100 TB verdict:
    the exchange carries 9 x n_partitions partial counts, the global
    window moves 9 rows — both free.
    """
    od = load(spark, sf_dir, "orders")
    p_q = (
        "CAST(CAST(log10(1.0D + 1.0D / digit) AS DECIMAL(18,8)) AS DOUBLE)"
    )
    obs = (
        od.filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substring(CAST("
                "  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
                " AS STRING), 1, 1) AS INT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_obs"))
    )
    with_tot = obs.withColumn(
        "n_total", F.expr("CAST(SUM(n_obs) OVER () AS BIGINT)")
    )
    scored = with_tot.select(
        "digit",
        "n_obs",
        F.expr(p_q).alias("p_benford"),
        F.expr(
            "CAST(CAST(n_total AS DECIMAL(19,0))"
            " * CAST(log10(1.0D + 1.0D / digit) AS DECIMAL(18,8))"
            " AS DOUBLE)"
        ).alias("n_expected"),
    )
    return scored.select(
        "digit",
        "n_obs",
        "p_benford",
        "n_expected",
        (
            (F.col("n_obs") - F.col("n_expected"))
            * (F.col("n_obs") - F.col("n_expected"))
            / F.col("n_expected")
        ).alias("chi2_term"),
    )


K_ANON_THRESHOLD = 5
K_ANON_CHAR_BUCKET = 100


@query(
    "validate_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(n_chars // {K_ANON_CHAR_BUCKET} AS BIGINT) AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) < {K_ANON_THRESHOLD} AS at_risk
    FROM documents
    GROUP BY lang, source, n_chars // {K_ANON_CHAR_BUCKET}
    """,
)
def validate_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the corpus's quasi-identifiers: group by the
    attribute combination an adversary could link externally (language,
    provenance, bucketed document length) and flag equivalence classes
    smaller than k — the re-identification risk screen a privacy review
    runs before a corpus release (k-anonymity, Sweeney 2002), beside
    llm_pii_scrub's content-level redaction.

    Parity: pure integer arithmetic — the length bucket is integer
    division of a BIGINT, group sizes are counts, the flag is an integer
    comparison. Nothing to quantize.

    Scale shape: ONE partial-aggregated groupBy on the quasi-identifier
    tuple; the exchange carries one count per (partition x class). At
    100 TB the class grid is bounded by the attribute domains, not the
    corpus. Suppression/generalization (the fix for flagged classes) is a
    filter or coarser bucket on the same plan.
    """
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.expr(
                f"CAST(n_chars DIV {K_ANON_CHAR_BUCKET} AS BIGINT)"
            ).alias("size_bucket"),
        )
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("group_size"))
        .select(
            "lang",
            "source",
            "size_bucket",
            "group_size",
            (F.col("group_size") < K_ANON_THRESHOLD).alias("at_risk"),
        )
    )


_RI_EDGES = [
    # (edge label, child table, fk col, parent table, pk col)
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


@query(
    "validate_referential_integrity",
    oracle="""
    """ + "\nUNION ALL\n".join(
        f"""
        SELECT '{label}' AS edge,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}) AS child_rows,
               (SELECT CAST(COUNT(DISTINCT {fk}) AS BIGINT) FROM {child}
                WHERE {fk} IS NOT NULL) AS child_keys,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {child}
                WHERE {fk} IS NOT NULL
                  AND {fk} NOT IN (SELECT {pk} FROM {parent})) AS orphan_rows,
               (SELECT CAST(COUNT(DISTINCT {fk}) AS BIGINT) FROM {child}
                WHERE {fk} IS NOT NULL
                  AND {fk} NOT IN (SELECT {pk} FROM {parent})) AS orphan_keys,
               (SELECT COUNT(*) FROM {child}
                WHERE {fk} IS NOT NULL
                  AND {fk} NOT IN (SELECT {pk} FROM {parent})) = 0 AS ri_ok
        """
        for (label, child, fk, parent, pk) in _RI_EDGES
    ),
)
def validate_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: one row per declared foreign-key edge
    of the warehouse star schema, counting child rows, distinct child
    keys, and orphans (child keys with no matching parent) — the FK
    health check a pipeline runs after every load, since Spark (like most
    lakehouse engines) does not enforce FK constraints on write. Joins
    validate_expectations' column-level rules with a cross-table rule.

    Scale shape: per edge, the child collapses to a key-grid FIRST
    (groupBy(fk) partial-aggregated count, NULL group kept — the
    exchange carries one (key, count) pair per child key, never child
    rows), then ONE broadcast left-outer join against the parent key
    column marks orphanhood per key and a single aggregate folds all
    four statistics (child rows, child keys, orphan rows, orphan keys)
    out of the grid — the child is scanned ONCE per edge touching only
    its FK column (r12; the previous shape paid a second full child
    scan for the COUNT/COUNT DISTINCT stats pass). Parent key frames
    are dimension-sized (broadcast). The 5 per-edge one-row summaries
    union into a 5-row report.

    Parity: all-integer counts and an equality flag. Nothing to quantize.
    NULL FKs are excluded from both key counts and orphan counts in both
    engines (NOT IN with NULLs is the classic SQL trap — the oracle
    filters IS NOT NULL before the NOT IN for identical semantics).
    """
    # r12 (guide §6 — scan once): each child table used to be scanned
    # TWICE per edge (key grid for orphans + a separate COUNT/COUNT
    # DISTINCT stats pass). One groupBy WITH the NULL group now yields
    # every statistic from a single scan: child_rows = Σ per-key counts
    # over all groups (incl. the NULL-fk group), child_keys = COUNT of
    # non-NULL groups, and orphanhood resolves per key through a
    # broadcast LEFT OUTER against the (distinct) parent key column —
    # __pk IS NULL on a non-NULL __fk is exactly the old left_anti
    # membership test, so all four counts fold in ONE aggregate over the
    # key grid. Values are identical by construction: the same per-key
    # counts are summed/counted, only the number of passes changed.
    out = None
    for label, child, fk, parent, pk in _RI_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("__pk")).distinct()
        keyed = c.groupBy(F.col(fk).alias("__fk")).agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("__n")
        )
        marked = keyed.join(
            F.broadcast(p), keyed["__fk"] == p["__pk"], "left_outer"
        )
        row = marked.agg(
            F.expr("CAST(COALESCE(SUM(__n), 0) AS BIGINT)").alias("child_rows"),
            F.expr(
                "CAST(COUNT(CASE WHEN __fk IS NOT NULL THEN 1 END)"
                " AS BIGINT)"
            ).alias("child_keys"),
            F.expr(
                "CAST(COALESCE(SUM(CASE WHEN __fk IS NOT NULL"
                " AND __pk IS NULL THEN __n END), 0) AS BIGINT)"
            ).alias("orphan_rows"),
            F.expr(
                "CAST(COUNT(CASE WHEN __fk IS NOT NULL"
                " AND __pk IS NULL THEN 1 END) AS BIGINT)"
            ).alias("orphan_keys"),
        ).select(
            F.lit(label).alias("edge"),
            "child_rows",
            "child_keys",
            "orphan_rows",
            "orphan_keys",
            (F.col("orphan_rows") == 0).alias("ri_ok"),
        )
        out = row if out is None else out.unionByName(row)
    return out


_VOL_DRIFT_PCT = "0.5"  # flag days whose volume is >50% off the trailing median
_VOL_WARMUP = 3  # need at least 3 trailing days before judging


@query(
    "validate_volume_anomaly",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    trail AS (
        SELECT day, n_rows,
               median(n_rows) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
               ) AS trailing_median,
               COUNT(*) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
               ) AS n_trailing
        FROM daily
    )
    SELECT day, n_rows,
           CAST(trailing_median AS DOUBLE) AS trailing_median,
           CAST(n_trailing AS BIGINT) AS n_trailing,
           CASE WHEN n_trailing < {_VOL_WARMUP} THEN NULL
                ELSE abs(CAST(n_rows AS DOUBLE) / trailing_median - 1.0)
                     > {_VOL_DRIFT_PCT}
           END AS is_anomalous
    FROM trail
    """,
)
def validate_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-volume drift monitor: daily ingest row counts vs the trailing
    7-day median, flagging days whose volume deviates more than 50% —
    the missed-load / double-load / upstream-outage alarm every
    production pipeline schedules after each batch (a robust-median twin
    of the mean-based ts_anomaly_mad, applied to pipeline operations
    rather than prices). Days with under 3 trailing observations return
    NULL (warmup — no verdict).

    Parity: daily counts are exact longs; median-at-0.5 of integers is
    the midpoint of the two middle values — exact in IEEE (x.0 or x.5)
    and computed identically by Spark's exact percentile() and DuckDB's
    median(); the ratio is ONE correctly-rounded division of exact
    operands, and the threshold compare happens on that identical double
    (no libm, nothing to quantize — the ts_bollinger rule).

    Scale shape: ONE partial-aggregated groupBy collapses the fact table
    to the O(days) daily grid; the trailing window runs over grid rows
    (single-partition is fine — 100 TB is still only ~10^4 days; were the
    grid per-source it would partition by source). Bounded 7-row frame.
    """
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"))
    )
    trail = daily.select(
        "day",
        "n_rows",
        F.expr(
            """percentile(n_rows, 0.5D) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
               )"""
        ).alias("trailing_median"),
        F.expr(
            """CAST(COUNT(*) OVER (
                   ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
               ) AS BIGINT)"""
        ).alias("n_trailing"),
    )
    return trail.select(
        "day",
        "n_rows",
        F.expr("CAST(trailing_median AS DOUBLE)").alias("trailing_median"),
        "n_trailing",
        F.expr(
            f"""CASE WHEN n_trailing < {_VOL_WARMUP} THEN NULL
                ELSE abs(CAST(n_rows AS DOUBLE) / trailing_median - 1.0D)
                     > {_VOL_DRIFT_PCT}D
                END"""
        ).alias("is_anomalous"),
    )


_PSI_BIN_W = 50  # fixed-width n_chars bins: deterministic, engine-neutral


@query(
    "validate_psi_drift",
    oracle=f"""
    WITH binned AS (
        SELECT n_chars // {_PSI_BIN_W} AS bin,
               doc_id % 2 = 0 AS is_ref
        FROM documents
    ),
    counts AS (
        SELECT bin,
               CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_ref,
               CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_new
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT bin, c_ref, c_new,
               CAST(SUM(c_ref) OVER () AS BIGINT) AS n_ref,
               CAST(SUM(c_new) OVER () AS BIGINT) AS n_new,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_bins
        FROM counts
    ),
    terms AS (
        SELECT bin, c_ref, c_new,
               (CAST(c_ref AS DOUBLE) + 0.5)
                   / (CAST(n_ref AS DOUBLE) + 0.5 * n_bins) AS p,
               (CAST(c_new AS DOUBLE) + 0.5)
                   / (CAST(n_new AS DOUBLE) + 0.5 * n_bins) AS q,
               CAST(((CAST(c_ref AS DOUBLE) + 0.5)
                         / (CAST(n_ref AS DOUBLE) + 0.5 * n_bins)
                     - (CAST(c_new AS DOUBLE) + 0.5)
                         / (CAST(n_new AS DOUBLE) + 0.5 * n_bins))
                    * ln(((CAST(c_ref AS DOUBLE) + 0.5)
                          / (CAST(n_ref AS DOUBLE) + 0.5 * n_bins))
                         / ((CAST(c_new AS DOUBLE) + 0.5)
                            / (CAST(n_new AS DOUBLE) + 0.5 * n_bins)))
                    AS DECIMAL(18,8)) AS psi_term
        FROM tot
    )
    SELECT CAST(bin AS BIGINT) AS bin, c_ref, c_new,
           CAST(p AS DOUBLE) AS p_ref,
           CAST(q AS DOUBLE) AS p_new,
           CAST(psi_term AS DOUBLE) AS psi_term,
           CAST(SUM(psi_term) OVER () AS DOUBLE) AS psi_total,
           CAST(SUM(psi_term) OVER () AS DOUBLE) > 0.2 AS drift_flag
    FROM terms
    """,
)
def validate_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-Stability-Index drift monitor: the document-length
    distribution of the incoming batch (odd doc_ids stand in for the new
    snapshot) against the reference snapshot (even doc_ids), binned at a
    fixed width, PSI = Sigma (p-q) ln(p/q) with Laplace-smoothed
    proportions so empty bins stay finite — the standard model-ops gate
    (PSI > 0.2 = investigate) between ingest and training, per feature.
    Complements validate_volume_anomaly (row VOLUME drift) with SHAPE
    drift.

    Parity: bin ids and counts are exact integers; 0.5 and the bin
    width are binary-exact literals, so the smoothed proportions are
    correctly-rounded quotients of identical operands; each PSI term
    carries libm ln and QUANTIZES through DECIMAL(18,8) before the
    exact decimal total (the per-term rule); the 0.2 threshold compares
    a decimal-exact double.

    Scale shape: one partial-aggregated groupBy collapses the corpus to
    the bounded bin grid (value-range / width bins); the window total
    rides grid rows. Flat at any corpus size. A real deployment keys
    this by (feature, day) — same plan with two more group columns.
    """
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.expr(f"n_chars DIV {_PSI_BIN_W}").alias("bin"),
            F.expr("doc_id % 2 = 0").alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("c_ref"),
            F.expr(
                "CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)"
            ).alias("c_new"),
        )
    )
    tot = counts.select(
        "bin",
        "c_ref",
        "c_new",
        F.expr("CAST(SUM(c_ref) OVER () AS BIGINT)").alias("n_ref"),
        F.expr("CAST(SUM(c_new) OVER () AS BIGINT)").alias("n_new"),
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n_bins"),
    )
    p = "((c_ref + 0.5D) / (n_ref + 0.5D * n_bins))"
    q = "((c_new + 0.5D) / (n_new + 0.5D * n_bins))"
    terms = tot.select(
        "bin",
        "c_ref",
        "c_new",
        F.expr(f"CAST({p} AS DOUBLE)").alias("p_ref"),
        F.expr(f"CAST({q} AS DOUBLE)").alias("p_new"),
        F.expr(
            f"CAST(({p} - {q}) * ln({p} / {q}) AS DECIMAL(18,8))"
        ).alias("psi_term_d"),
    )
    return terms.select(
        "bin",
        "c_ref",
        "c_new",
        "p_ref",
        "p_new",
        F.expr("CAST(psi_term_d AS DOUBLE)").alias("psi_term"),
        F.expr("CAST(SUM(psi_term_d) OVER () AS DOUBLE)").alias("psi_total"),
        F.expr(
            "CAST(SUM(psi_term_d) OVER () AS DOUBLE) > 0.2D"
        ).alias("drift_flag"),
    )


_PK_TABLES = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("nation", "n_nationkey"),
    ("region", "r_regionkey"),
]


@query(
    "validate_pk_uniqueness",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{t}' AS table_name,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}) AS n_rows,
               (SELECT CAST(COUNT(DISTINCT {pk}) AS BIGINT) FROM {t})
                   AS n_keys,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}
                WHERE {pk} IS NULL) AS n_null_keys,
               (SELECT COUNT(*) FROM {t})
                   = (SELECT COUNT(DISTINCT {pk}) FROM {t})
                 AND (SELECT COUNT(*) FROM {t} WHERE {pk} IS NULL) = 0
                   AS pk_ok
        """
        for t, pk in _PK_TABLES
    ),
)
def validate_pk_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: one row per warehouse table
    asserting its declared key is unique and non-null — the PK half of
    the constraint audit (validate_referential_integrity is the FK
    half), run after every load because lakehouse engines enforce
    neither. A duplicate or NULL key here breaks every downstream
    merge/SCD2/point-in-time join silently.

    Parity: all-integer counts and boolean algebra. Nothing to
    quantize.

    Scale shape: per table, one partial-aggregated pass computes
    (count, distinct count, null count) — the distinct collapses to a
    key grid before the exchange; the 6 one-row summaries union into
    the report. Each table is scanned once touching only its key
    column.
    """
    out = None
    for t, pk in _PK_TABLES:
        df = load(spark, sf_dir, t)
        row = df.agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
            F.expr(f"CAST(COUNT(DISTINCT {pk}) AS BIGINT)").alias("n_keys"),
            F.expr(
                f"CAST(SUM(CASE WHEN {pk} IS NULL THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias("n_null_keys"),
        ).select(
            F.lit(t).alias("table_name"),
            "n_rows",
            "n_keys",
            "n_null_keys",
            F.expr("n_rows = n_keys AND n_null_keys = 0").alias("pk_ok"),
        )
        out = row if out is None else out.unionByName(row)
    return out
