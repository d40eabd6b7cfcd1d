"""Join operators (SURVEY.md §2.2).

Reference precedents: the reference's only joins are R13, the 1-row
scalar-broadcast enrichment (dags/bpi_etl/bpi_etl_bigquery.py:223-225), and
R14, the as-of-date alignment between the BPI and XR sources
(bpi_etl_bigquery.py:294,118,125-127). Everything else is the required
generalization to N-row tables.

Scale notes per strategy:
- broadcast joins: dims (region/nation/supplier, rate tables) are
  fixed-cardinality — broadcast them explicitly so no shuffle of the fact
  side ever happens, at any scale factor.
- shuffle joins: large-large equi-joins shuffle both sides on the key;
  AQE handles skew splitting. At 100 TB the production answer is bucketing
  both tables on the join key (see sinks.py), which this code path picks up
  automatically once the tables are bucketed.
- the as-of join deliberately avoids a global window over the big side:
  the rate series is small (one row per day/hour), so it is banded with
  lead() driver-side-small and broadcast — the big side stays unshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    literal_rows_df,
)
from bitcoin_price_etl_spark.registry import query


@query(
    "join_broadcast",
    oracle=f"""
    SELECT r.r_name,
           n.n_name,
           COUNT(*) AS n_customers,
           {dsum_sql('c.c_acctbal', 'sum_acctbal')}
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim equi-join with explicit broadcast (R13 generalized).

    nation (25 rows) and region (5 rows) are fixed-cardinality regardless of
    scale factor — broadcasting them keeps the customer side map-side only.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "sum_acctbal"),
        )
    )


@query(
    "join_shuffle",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice, o.o_orderpriority
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi-join (sort-merge / shuffled-hash under AQE)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderkey", "l_linenumber", "l_quantity", "o_totalprice", "o_orderpriority"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join — emits each left row at most once (no fanout)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence join (NOT EXISTS) — customers with no order in 1997H1. The
    date bound keeps the check non-vacuous: the fixture gives every
    customer at least one lifetime order at every SF, so the unbounded
    form returned zero rows and its hash check proved nothing."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000.0
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched left rows as nulls."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000.0)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_cross_scalar",
    oracle=f"""
    SELECT l.l_orderkey,
           l.l_linenumber,
           l.l_extendedprice / s.avg_price AS price_ratio
    FROM lineitem l
    CROSS JOIN (SELECT {davg_sql('l_extendedprice', 'avg_price')} FROM lineitem) s
    """,
)
def join_cross_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join with a 1-row derived table — exactly the reference's R13
    scalar-broadcast enrichment (bpi_etl_bigquery.py:223-225): every row is
    multiplied/divided by a single scalar fetched in a separate step."""
    li = load(spark, sf_dir, "lineitem")
    scalar = li.agg(davg("l_extendedprice", "avg_price"))
    return li.crossJoin(F.broadcast(scalar)).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("avg_price")).alias("price_ratio"),
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT p.p_partkey, p.p_size, b.band_name
    FROM part p
    JOIN (VALUES ('small', 1, 10), ('medium', 11, 25), ('large', 26, 50))
         AS b(band_name, lo, hi)
      ON p.p_size BETWEEN b.lo AND b.hi
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join against a small banding table.

    The band table is broadcast, so the non-equi predicate runs as a
    broadcast nested-loop over 3 rows — O(1) per fact row, no shuffle.
    """
    p = load(spark, sf_dir, "part")
    # literal_rows_df, not createDataFrame: the 3-row band table must not
    # cost 32 Python-worker tasks to build (r9 control-plane-row finding)
    bands = literal_rows_df(
        spark,
        [("small", 1, 10), ("medium", 11, 25), ("large", 26, 50)],
        "band_name string, lo int, hi int",
    )
    cond = (p.p_size >= bands.lo) & (p.p_size <= bands.hi)
    return p.join(F.broadcast(bands), cond).select("p_partkey", "p_size", "band_name")


@query(
    "join_asof",
    oracle=f"""
    WITH rates AS (
        SELECT date_trunc('hour', ts) AS rate_ts,
               {davg_sql('value', 'rate')}
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY date_trunc('hour', ts)
    )
    SELECT e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           r.rate AS asof_rate
    FROM (SELECT * FROM events WHERE event_type = 'click') e
    ASOF LEFT JOIN rates r ON e.ts >= r.rate_ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click event picks the latest hourly purchase-rate at
    or before its timestamp — the general form of the reference's R14
    as-of-date source alignment (bpi_etl_bigquery.py:294,118,125-127), where
    the XR rate is fetched *for the BPI run's date*.

    Implementation: the rate series is banded with lead() — the window runs
    only over the tiny aggregated series — then GAP-FILLED to one row per
    hour (sequence+explode over each [rate_ts, next_rate_ts) band, bounded
    by the corpus max hour), so the probe is a broadcast HASH join on the
    hour bucket. A raw non-equi band join would plan as
    BroadcastNestedLoopJoin — O(clicks × bands) comparisons (measured 3×
    slower at sf0.1 and growing with the time span); the filled series keeps
    O(clicks) probes while staying exactly as-of. The big (event) side is
    never shuffled and never globally sorted, which is what makes this hold
    at 100 TB; the union+window emulation would single-partition the fact.
    """
    ev = load(spark, sf_dir, "events")
    rates = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("rate_ts"))
        .agg(davg("value", "rate"))
    )
    # fill horizon: the latest hour any probe row could ask for
    bounds = ev.agg(F.date_trunc("hour", F.max("ts")).alias("max_h"))
    w = Window.orderBy("rate_ts")
    banded = rates.withColumn("next_rate_ts", F.lead("rate_ts").over(w))
    filled = (
        banded.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence(
                    "rate_ts",
                    F.coalesce(
                        F.col("next_rate_ts") - F.expr("INTERVAL 1 HOUR"),
                        F.greatest("max_h", "rate_ts"),
                    ),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("h"),
            "rate",
        )
    )
    clicks = ev.filter(F.col("event_type") == "click")
    return clicks.join(
        F.broadcast(filled), F.date_trunc("hour", clicks.ts) == filled.h, "left"
    ).select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("rate").alias("asof_rate"),
    )


@query(
    "join_outer_full",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nk, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    s AS (
        SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           c.n_customers,
           s.n_suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates — rows surviving from either side
    (nations with only customers, only suppliers, or both)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


SKEW_SALTS = 8


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join: identical RESULT to a plain join, different
    physical distribution — the manual answer when one join key dominates
    (a hot customer taking 30% of orders would put 30% of the shuffle on
    one task).

    Mechanism: the skewed (fact) side gets a deterministic salt in [0, S)
    from xxhash64 of its primary key; the dim side is replicated S× with
    every salt value; the join key becomes (key, salt), splitting each hot
    key across S tasks. AQE's skewJoin handles moderate skew automatically
    (session.py enables it); explicit salting is for pathological keys and
    for aggregations, where AQE can't split. Salt is derived, never random:
    re-runs must be identical (slides p.6 re-run concern).
    """
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(SKEW_SALTS)).cast("int")
    )
    c = (
        load(spark, sf_dir, "customer")
        .withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(SKEW_SALTS)])))
    )
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt)
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name, p_type, p_size FROM part
    )
    SELECT a.p_type, a.p_size,
           a.p_partkey AS left_key, b.p_partkey AS right_key,
           a.p_name AS left_name, b.p_name AS right_name,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
    FROM p a JOIN p b
      ON a.p_type = b.p_type AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy join (entity resolution): find near-duplicate part
    names — edit distance ≤ 3 — without comparing every pair. The
    record-linkage generalization of the reference's single-document
    identity matching (it never needs one: one source row per run,
    bpi_etl_bigquery.py:118), and the string-side sibling of the LLM
    family's MinHash/SimHash dedup (llm/dedup.py): same
    block-then-refine shape, cheap key to bound candidates, expensive
    measure only within blocks.

    Scale shape: ONE shuffle on the blocking key (p_type, p_size), then a
    within-block self-equi-join — candidate pairs are Σ block² (6.9k at
    sf0.01) instead of n² (2M), and levenshtein (the O(len²) refine) runs
    only on candidates. The a<b key inequality halves the pair space and
    dedups mirrored pairs. At 100 TB the blocking key is the design
    decision: it must bound the largest block (here max block = 16 rows);
    a skewed block is handled exactly like a skewed join key — salt the
    block and re-merge, or tighten the key (add a name-prefix or
    length-bucket component). Both sides are the same table, so the
    exchange is planned once and reused.

    Parity: levenshtein is an INTEGER and both engines implement the
    standard unit-cost edit distance — exact, no float discipline needed.
    """
    p = load(spark, sf_dir, "part").select("p_partkey", "p_name", "p_type", "p_size")
    a, b = p.alias("a"), p.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_type") == F.col("b.p_type"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(lev <= 3)
        .select(
            F.col("a.p_type").alias("p_type"),
            F.col("a.p_size").alias("p_size"),
            F.col("a.p_partkey").alias("left_key"),
            F.col("b.p_partkey").alias("right_key"),
            F.col("a.p_name").alias("left_name"),
            F.col("b.p_name").alias("right_name"),
            lev.alias("edit_dist"),
        )
    )


RANGE_BIN_SECONDS = 900  # ±15-min attribution window and bin width


@query(
    "join_range_binned",
    oracle=f"""
    WITH errors AS (
        SELECT event_id, ts FROM events WHERE event_type = 'error'
    ), purchases AS (
        SELECT ts FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           count(p.ts) AS n_nearby_purchases
    FROM errors e
    LEFT JOIN purchases p
      ON abs(epoch_us(e.ts) - epoch_us(p.ts))
         <= {RANGE_BIN_SECONDS} * 1000000
    GROUP BY e.event_id, e.ts
    """,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval join via binning: for every error event, count
    purchase events within ±15 minutes. The naive form is a non-equi
    theta join — quadratic BNLJ between two FACT-sized sides (the
    broadcast-banding trick of join_theta_range only works when one side
    is a dim). The scale path: quantize time into bins as wide as the
    match radius, explode each purchase into the 2-3 bins its ±radius
    interval can touch, and equi-join on bin — candidates are then only
    same-bin pairs (linear in data for any fixed radius), re-filtered by
    the exact predicate. Each true pair survives exactly once because the
    error's own bin is a single value.

    Scale shape: one shuffle of each side on the 8-byte bin key (the
    explode is ≤3× row growth of the (bin, ts) pair — the payload never
    fans out), a co-partitioned count per error, and a user-side left
    join to restore zero-match errors. No BNLJ node in the plan
    (plan-tested) — contrast join_theta_range, whose BNLJ is the right
    call only against a broadcastable side.

    Parity: all bin and distance math is exact integer microseconds;
    counts are integers. The oracle states the plain quadratic predicate
    (DuckDB plans its own IEJoin) — independent formulation, same rows.
    """
    bin_us = RANGE_BIN_SECONDS * 1_000_000
    ev = load(spark, sf_dir, "events")
    # Bin ids via integer DIV, never double division: epoch micros exceed
    # 2^50, where a double quotient can round across the bin boundary and
    # silently drop a true pair.
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", F.expr(f"unix_micros(ts) DIV {bin_us}").alias("bin")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("p_us")
    )
    purch_binned = purchases.select(
        "p_us",
        F.explode(
            F.sequence(
                F.expr(f"(p_us - {bin_us}) DIV {bin_us}"),
                F.expr(f"(p_us + {bin_us}) DIV {bin_us}"),
            )
        ).alias("bin"),
    )
    counts = (
        errors.join(purch_binned, "bin")
        .filter(
            F.abs(F.unix_micros("ts") - F.col("p_us")) <= F.lit(bin_us)
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_nearby_purchases"))
    )
    return (
        errors.select("event_id", "ts")
        .join(counts, "event_id", "left")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
            F.coalesce("n_nearby_purchases", F.lit(0)).alias(
                "n_nearby_purchases"
            ),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH rates AS (
        SELECT date_trunc('hour', ts) AS rate_ts,
               CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)
                   / COUNT(value) AS rate
        FROM events WHERE event_type = 'purchase'
        GROUP BY date_trunc('hour', ts)
    ), clicks AS (
        SELECT event_id, ts FROM events WHERE event_type = 'click'
    ), cand AS (
        SELECT c.event_id, c.ts, r.rate_ts, r.rate,
               row_number() OVER (
                   PARTITION BY c.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(r.rate_ts)),
                            r.rate_ts) AS rn
        FROM clicks c JOIN rates r
          ON abs(epoch_us(c.ts) - epoch_us(r.rate_ts))
             <= CAST(43200000000 AS BIGINT)
    )
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           rate AS nearest_rate,
           strftime(rate_ts, '%Y-%m-%d %H:%M:%S') AS rate_ts_str
    FROM cand WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: each click picks the temporally
    CLOSEST hourly purchase-rate, before or after, within a 12-hour
    search radius (tie → earlier mark) — the other as-of flavor kdb/
    QuestDB users reach for when the quote can legitimately arrive after
    the trade. join_asof covers the classic backward-only form.

    Scale shape: the rate series is time-bucketed — its cardinality is
    hours-in-span, FIXED regardless of fact volume — so it broadcasts at
    any SF and the candidate scan is O(|rates within ±12 h|) ≈ 25 per
    click via a broadcast nested loop, then a per-click argmin that
    combines map-side. This is the right plan ONLY because one side is
    bucket-bounded; a fact-fact nearest join is join_range_binned's
    territory.

    Parity: distances are exact integer microseconds; the picked rate is
    the decimal-exact hourly mean both engines derive; argmin tie-pins
    on rate_ts.
    """
    ev = load(spark, sf_dir, "events")
    rates = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", "ts").alias("rate_ts"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE)"
                " / COUNT(value)"
            ).alias("rate")
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "ts")
    dist = F.abs(F.unix_micros("ts") - F.unix_micros("rate_ts"))
    cand = clicks.join(
        F.broadcast(rates), dist <= 12 * 3600 * 1_000_000
    ).select("event_id", "ts", "rate_ts", "rate", dist.alias("d_us"))
    best = cand.groupBy("event_id").agg(
        F.min(F.struct("d_us", "rate_ts", "rate", "ts")).alias("b")
    )
    return best.select(
        "event_id",
        F.date_format("b.ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.col("b.rate").alias("nearest_rate"),
        F.date_format("b.rate_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "rate_ts_str"
        ),
    )


@query(
    "join_scd2_pointintime",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment, c_acctbal AS bal, 1 AS version_no,
               TIMESTAMP '1990-01-01' AS valid_from,
               CASE WHEN c_custkey % 3 = 0
                    THEN TIMESTAMP '1997-01-01' END AS valid_to
        FROM customer
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal + 50.0, 2,
               TIMESTAMP '1997-01-01',
               CASE WHEN c_custkey % 6 = 0 THEN TIMESTAMP '1999-01-01' END
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, c_acctbal + 100.0, 3,
               TIMESTAMP '1999-01-01', CAST(NULL AS TIMESTAMP)
        FROM customer WHERE c_custkey % 6 = 0
    ), f AS (
        SELECT o_orderkey, o_custkey, o_orderdate FROM orders
        WHERE o_orderkey % 100 < 5
    )
    SELECT f.o_orderkey, f.o_custkey,
           strftime(f.o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts,
           d.version_no,
           d.c_mktsegment AS segment_at_order,
           d.bal AS acctbal_at_order
    FROM f JOIN dim d ON f.o_custkey = d.c_custkey
      AND f.o_orderdate >= d.valid_from
      AND (d.valid_to IS NULL OR f.o_orderdate < d.valid_to)
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup: join each fact to THE version of
    an SCD2 dimension that was valid at the fact's timestamp — the read
    side of sink_scd2's versioned history (reporting "the customer's
    segment AS OF the order date", the query that makes keeping history
    worth it, and the same no-leakage discipline as
    llm_training_examples applied to dimensions). The versioned dim is
    derived deterministically from customer (every key has version 1;
    key%3==0 re-versions in 1997; key%6==0 again in 1999) so all three
    interval shapes — open-ended, closed, chained — are exercised at
    any SF.

    Scale shape: an EQUI-join on the dimension key with the validity
    interval as residual predicates — never a theta/interval join: a
    key's version chain is short (here ≤3; real dims ~tens), so the
    residual scans a handful of versions per fact row inside the
    matched key group. Both sides shuffle once on custkey; at 100 TB
    the fact side dominates and a small hot dim broadcasts instead.
    The version explosion is an inline array fan-out (zero-shuffle
    Expand) — the oracle builds the same dim via a three-way UNION,
    an independent formulation.

    Parity: interval predicates compare exact timestamps; balance
    shifts are exact double adds (+50.0/+100.0); the matched version is
    picked, not computed."""
    c = load(spark, sf_dir, "customer")
    ver = c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.explode(
            F.expr(
                """
                filter(array(
                  named_struct(
                    'version_no', 1,
                    'valid_from', TIMESTAMP '1990-01-01',
                    'valid_to', CASE WHEN c_custkey % 3 = 0
                                     THEN TIMESTAMP '1997-01-01' END,
                    'bal_shift', 0.0D),
                  CASE WHEN c_custkey % 3 = 0 THEN named_struct(
                    'version_no', 2,
                    'valid_from', TIMESTAMP '1997-01-01',
                    'valid_to', CASE WHEN c_custkey % 6 = 0
                                     THEN TIMESTAMP '1999-01-01' END,
                    'bal_shift', 50.0D) END,
                  CASE WHEN c_custkey % 6 = 0 THEN named_struct(
                    'version_no', 3,
                    'valid_from', TIMESTAMP '1999-01-01',
                    'valid_to', CAST(NULL AS TIMESTAMP),
                    'bal_shift', 100.0D) END
                ), x -> x IS NOT NULL)
                """
            )
        ).alias("v"),
    )
    dim = ver.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + F.col("v.bal_shift")).alias("bal"),
        F.col("v.version_no").alias("version_no"),
        F.col("v.valid_from").alias("valid_from"),
        F.col("v.valid_to").alias("valid_to"),
    ).alias("d")
    f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 < 5)
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .alias("f")
    )
    return f.join(
        dim,
        (F.col("f.o_custkey") == F.col("d.c_custkey"))
        & (F.col("f.o_orderdate") >= F.col("d.valid_from"))
        & (
            F.col("d.valid_to").isNull()
            | (F.col("f.o_orderdate") < F.col("d.valid_to"))
        ),
    ).select(
        "f.o_orderkey",
        "f.o_custkey",
        F.date_format("f.o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
            "order_ts"
        ),
        "d.version_no",
        F.col("d.c_mktsegment").alias("segment_at_order"),
        F.col("d.bal").alias("acctbal_at_order"),
    )


# Synthetic planar coordinates (no geo column in the driver schema):
# two co-prime multipliers scatter custkeys uniformly over a 20k x 20k
# integer grid. Cell size == radius, so true neighbors are never more
# than one cell apart in either axis.
SPATIAL_MOD = 20_000
SPATIAL_RADIUS = 1_000
SPATIAL_CELL = 1_000


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH pts AS (
        SELECT c_custkey AS id,
               (c_custkey * 7919) % {SPATIAL_MOD} AS x,
               (c_custkey * 104729) % {SPATIAL_MOD} AS y
        FROM customer
    ), cand AS (
        SELECT (a.x - b.x) * (a.x - b.x)
               + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a JOIN pts b ON a.id < b.id
          AND abs(a.x // {SPATIAL_CELL} - b.x // {SPATIAL_CELL}) <= 1
          AND abs(a.y // {SPATIAL_CELL} - b.y // {SPATIAL_CELL}) <= 1
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
           CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(sum(CASE WHEN d2 <= {SPATIAL_RADIUS * SPATIAL_RADIUS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
           CAST(min(CASE WHEN d2 <= {SPATIAL_RADIUS * SPATIAL_RADIUS}
                         THEN d2 END) AS BIGINT) AS min_d2,
           CAST(max(CASE WHEN d2 <= {SPATIAL_RADIUS * SPATIAL_RADIUS}
                         THEN d2 END) AS BIGINT) AS max_d2
    FROM cand
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial self-join: all point pairs within a fixed
    radius, found by hashing points into radius-sized grid cells and
    probing only the 3×3 cell neighborhood — the standard
    distance-join shape (geohash/S2/H3 pipelines are this exact plan
    with spherical cells). Coordinates are synthesized deterministically
    from custkey (the driver schema has no geo column); distances are
    exact integer squared-Euclidean, so no libm enters the predicate.

    Scale shape: the probe side EXPLODES each point to its 9 neighbor
    cells (bounded fan-out) and equi-joins on the cell id against the
    build side's single cell — candidates are Σ cell-pair products,
    never n² (measured here: the cell filter admits ~2% of the n²
    pairs); cell size == radius guarantees no true pair is missed. The
    oracle states the same candidate set declaratively on an id-ordered
    n² join — an independent formulation. Per-cell density is the skew
    dial: a hot cell takes the salting treatment, and the final rollup
    is one partial aggregate. (The probe's pair growth is quadratic in
    density by definition — fixed space, more points; real corpora grow
    AREA with volume.)

    Parity: every output is an exact integer; the id order halves pairs
    identically in both engines."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 7919) % SPATIAL_MOD).alias("x"),
        ((F.col("c_custkey") * 104729) % SPATIAL_MOD).alias("y"),
    ).transform(stage)
    build = pts.select(
        F.col("id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        (F.col("x") / SPATIAL_CELL).cast("long").alias("cell_x"),
        (F.col("y") / SPATIAL_CELL).cast("long").alias("cell_y"),
    )
    probe = (
        pts.select(
            F.col("id").alias("a_id"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            F.explode(F.expr("sequence(-1, 1)")).alias("dx"),
        )
        .select(
            "*", F.explode(F.expr("sequence(-1, 1)")).alias("dy")
        )
        .select(
            "a_id",
            "ax",
            "ay",
            ((F.col("ax") / SPATIAL_CELL).cast("long") + F.col("dx")).alias(
                "cell_x"
            ),
            ((F.col("ay") / SPATIAL_CELL).cast("long") + F.col("dy")).alias(
                "cell_y"
            ),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    r2 = SPATIAL_RADIUS * SPATIAL_RADIUS
    cand = (
        probe.join(build, ["cell_x", "cell_y"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(d2.alias("d2"))
    )
    stats = cand.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.when(F.col("d2") <= r2, 1).otherwise(0))
        .cast("long")
        .alias("n_pairs"),
        F.min(F.when(F.col("d2") <= r2, F.col("d2"))).alias("min_d2"),
        F.max(F.when(F.col("d2") <= r2, F.col("d2"))).alias("max_d2"),
    )
    npts = pts.agg(F.count(F.lit(1)).alias("n_points"))
    return F.broadcast(npts).crossJoin(stats).select(
        "n_points", "n_candidates", "n_pairs", "min_d2", "max_d2"
    )


@query(
    "join_skyline_pareto",
    oracle="""
    WITH best_at_price AS (
        SELECT p_retailprice,
               CAST(MIN(p_size) AS BIGINT) AS msize
        FROM part GROUP BY p_retailprice
    ),
    frontier AS (
        SELECT p_retailprice, msize,
               MIN(msize) OVER (
                   ORDER BY p_retailprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS prev_min
        FROM best_at_price
    )
    SELECT p.p_partkey, p.p_name, p.p_retailprice,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p JOIN frontier f ON p.p_retailprice = f.p_retailprice
    WHERE p.p_size = f.msize
      AND (f.prev_min IS NULL OR f.prev_min > p.p_size)
    """,
)
def join_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-frontier) query: the parts no other part dominates
    on (price, size) — cheaper-and-not-bigger wins (Borzsony et al.,
    "The Skyline Operator", ICDE 2001) — the multi-criteria shortlist
    behind "show me the options that aren't strictly worse than
    something else".

    NOT the naive NOT EXISTS self-join (n^2): the 2-D skyline falls out
    of a sorted prefix-scan — collapse to the best size per distinct
    price (one partial-aggregated groupBy), take the running strict-
    prefix minimum over the price order, and a row survives iff it holds
    its price's best size AND beats every cheaper price's best
    (prev_min > size; ties on both dims are mutually non-dominating and
    all survive). Dominance semantics: p' <= p AND s' <= s with at
    least one strict.

    Parity: all comparisons are exact (double price equality groups the
    same rows in both engines — no arithmetic touches the values;
    integer sizes) — nothing to quantize. The equi-join back to part
    broadcasts the frontier grid.

    Scale shape: one groupBy collapses the table to the distinct-price
    grid, the frontier window runs single-partition over grid rows
    (bounded by price cardinality, not rows — and at 100 TB a first
    coarse map-side min per partition would pre-shrink it), and the
    re-attach is a broadcast hash join. d>2 dims would swap in the
    block-nested-loop-with-presort form; 2-D is the common case and
    stays n log n.
    """
    p = load(spark, sf_dir, "part")
    best = p.groupBy("p_retailprice").agg(
        F.expr("CAST(MIN(p_size) AS BIGINT)").alias("msize")
    )
    frontier = best.select(
        "p_retailprice",
        "msize",
        F.expr(
            """MIN(msize) OVER (
                   ORDER BY p_retailprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               )"""
        ).alias("prev_min"),
    )
    return (
        p.join(F.broadcast(frontier), "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("msize"))
            & (F.col("prev_min").isNull() | (F.col("prev_min") > F.col("p_size")))
        )
        .select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.col("p_size").cast("bigint").alias("p_size"),
        )
    )


_EXISTENCE_SQL = """
SELECT c_custkey, c_mktsegment,
       CASE WHEN EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderstatus = 'O')
            THEN TRUE ELSE FALSE END AS has_open_order,
       c_custkey IN (SELECT o_custkey FROM orders
                     WHERE o_totalprice > 200000.0) AS has_big_order
FROM customer c
"""


@query(
    "join_existence_flag",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CASE WHEN EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderstatus = 'O')
                THEN TRUE ELSE FALSE END AS has_open_order,
           c_custkey IN (SELECT o_custkey FROM orders
                         WHERE o_totalprice > 200000.0) AS has_big_order
    FROM customer c
    """,
)
def join_existence_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence-flag joins: EXISTS and IN subqueries in the PROJECTION
    (not the WHERE clause), so every left row survives and carries a
    boolean mark — the segmentation shape behind "tag customers with
    has_open_order / has_big_order" columns. This is a DISTINCT physical
    join from join_semi/join_anti: Catalyst plans a mark in the join
    (ExistenceJoin-style exists#N flags in the hash join) instead of
    filtering rows, a shape no other registry key exercises.

    Parity: both flags are exact boolean marks over equi-matches and an
    exact-comparison predicate (o_totalprice > 200000.0 on raw doubles
    — identical comparison in both engines); no arithmetic at all in
    the checked output.

    Scale shape: both subquery sides collapse to DISTINCT custkeys
    before joining (the optimizer's aggregate-below-join rewrite), and
    the flag joins broadcast the collapsed key sets against the customer
    scan at any realistic dim/fact ratio. The customer table is never
    duplicated or re-scanned per flag.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTENCE_SQL)


_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # thresholds are directional: the CREATION side must be SMALLER than
    # its threshold (keep roomy), the APPLICATION side LARGER than its
    # scan-size threshold (default 10GB — drop to 1 byte so the shape
    # this key exists for is demonstrable at fixture scale)
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
        "100MB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "1",
    # force a shuffle join: broadcast joins never need the runtime filter
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@query(
    "join_runtime_bloom",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
               AS sum_price
    FROM lineitem l
    JOIN (SELECT p.p_partkey
          FROM part p,
               (SELECT min(p_retailprice) AS mn, max(p_retailprice) AS mx
                FROM part) b
          WHERE p.p_retailprice
                > b.mn + CAST(0.9 AS DOUBLE) * (b.mx - b.mn)) p
      ON p.p_partkey = l.l_partkey
    GROUP BY l.l_returnflag
    """,
)
def join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the non-partitioned sibling of
    scan_dpp_join: when a shuffle join's build side carries a selective
    filter (premium parts), Catalyst injects a bloom filter of the
    surviving join keys into the probe side's scan stage
    (might_contain(...) below the exchange), so a 100 TB fact drops
    non-matching rows BEFORE shuffling them — the shuffle carries ~the
    selectivity fraction instead of the whole table.

    The query itself is conf-clean (the driver's vanilla session plans
    it as an ordinary join; at production scan sizes Spark's default
    thresholds inject the filter on their own). The injected-filter
    plan shape is certified by tests/test_plans.py, which lowers the
    fixture-size thresholds in _BLOOM_CONFS around the plan build and
    restores them — correctness is bloom-transparent either way (false
    positives only pass extra rows that the join then drops), so the
    oracle is the plain join. Payload parity: exact counts + the
    standard decimal sum; the premium-part gate is the subquery_in_agg
    relative threshold (top decile of the observed price band — a fixed
    cutoff is vacuous at some SF ceilings), a single IEEE comparison on
    identically-computed operands.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_extendedprice"
    )
    part = load(spark, sf_dir, "part")
    # control-plane: a 2-value band collect so the build side stays a
    # SIMPLE selective scan filter — InjectRuntimeFilter rejects build
    # sides carrying joins/aggregates, so the threshold must be a
    # literal. Python float arithmetic is the same IEEE double chain as
    # the oracle's CAST(0.9 AS DOUBLE) expression — identical threshold.
    mn, mx = part.agg(
        F.expr("min(p_retailprice)"), F.expr("max(p_retailprice)")
    ).collect()[0]
    p = part.filter(
        F.col("p_retailprice") > F.lit(mn + 0.9 * (mx - mn))
    ).select("p_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_returnflag")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)))"
                " AS DOUBLE)"
            ).alias("sum_price"),
        )
    )
