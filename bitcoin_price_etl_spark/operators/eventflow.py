"""Event-flow analytics: sessionization, funnel conversion, cohort retention.

The reference's domain is a single hourly price feed (dags/bpi_etl/
bpi_etl_bigquery.py:280-301 — one row per hour), but any engine fed by its
event stream needs the classic user-behavior rollups the moment more than
one entity emits events. These are the three canonical ones, each expressed
as a declarative Catalyst plan whose shuffle count is pinned by plan tests.

Scale posture (100 TB): all three operators key their heavy work on
`user_id`. The first exchange hash-partitions events by user; every later
per-user step (session numbering, funnel joins, cohort join-back) reuses
that partitioning — Spark's ClusteredDistribution is satisfied by any
subset of the grouping keys, so `groupBy(user_id, session_seq)` after a
`Window.partitionBy(user_id)` adds NO second exchange. Skew risk is a
hot user (bot traffic); the mitigation at scale is the same salting
pattern as join_salted_skew, not a different algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.exprs import dsum, dsum_sql
from bitcoin_price_etl_spark.registry import query

SESSION_GAP_SECONDS = 1800  # 30 min inactivity closes a session


# Shared by ts_sessionize and its bounded-state twin ts_sessionize_fragments:
# both must produce EXACTLY this result (the twin differs only in physical
# distribution), so they certify against the same oracle.
_SESSIONIZE_ORACLE = f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id, value, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS session_seq
        FROM gaps
    )
    SELECT user_id, session_seq,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_event_types,
           {dsum_sql('value', 'total_value')}
    FROM numbered
    GROUP BY user_id, session_seq
    """


@query("ts_sessionize", oracle=_SESSIONIZE_ORACLE)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after 30 min of user
    inactivity; emit one row per session with bounds and totals.

    Scale shape: ONE exchange. The window hash-partitions events by
    user_id and sorts (ts, event_id) within partitions; the session-level
    groupBy clusters on (user_id, session_seq), which the existing
    user_id partitioning already satisfies, so Catalyst plans the final
    aggregate with no second shuffle (plan-tested). Gap detection uses
    integer microsecond arithmetic (unix_micros), not double seconds —
    exact in both engines, no boundary flap at the 30-min edge.

    Parity: (ts, event_id) is a unique total order, so lag() picks the
    same predecessor in both engines; session numbering is a running sum
    of 0/1 ints (exact); total_value goes through the decimal sum.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    numbered = ev.withColumn(
        "session_seq",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").alias("n_event_types"),
        dsum("value", "total_value"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH t1 AS (
        SELECT user_id, min(ts) AS ts1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
        SELECT e.user_id, min(e.ts) AS ts2
        FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.ts1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), t3 AS (
        SELECT e.user_id, min(e.ts) AS ts3
        FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.ts2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT count(t1.user_id) AS n_viewed,
           count(t2.user_id) AS n_clicked_after_view,
           count(t3.user_id) AS n_purchased_after_click,
           CASE WHEN count(t1.user_id) > 0
                THEN CAST(count(t2.user_id) AS DOUBLE) / count(t1.user_id)
                ELSE CAST(NULL AS DOUBLE) END AS view_to_click_rate,
           CASE WHEN count(t1.user_id) > 0
                THEN CAST(count(t3.user_id) AS DOUBLE) / count(t1.user_id)
                ELSE CAST(NULL AS DOUBLE) END AS view_to_purchase_rate
    FROM t1
    LEFT JOIN t2 ON t1.user_id = t2.user_id
    LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel view → click → purchase: a user counts at
    stage N only with an event of that type strictly after their stage-N-1
    time. One summary row with stage counts and conversion rates.

    Scale shape: every join and aggregate keys on user_id, so after the
    first exchange the per-stage frames are co-partitioned; the stage
    joins shuffle no event text, only (user_id, ts) pairs. The funnel is
    sequential by definition (stage N needs stage N-1's timestamp), so
    three narrow user-keyed frames — not a per-event window over the
    whole stream — is the minimal-state formulation. The stage frames
    t1/t2 each feed two consumers, so the plan re-reads the pushed-
    filter event scan per consumer (6 narrow scans); checkpointing them
    instead was MEASURED WORSE at bench scale (r5: 1.57x vs a 1.27x
    load band — three sequential materialization barriers beat six
    column-pruned scans that pipeline in one DAG). At warehouse scale
    the stage frames would persist to disk asynchronously instead.

    Parity: stage times are raw min(ts) picks; rates are single IEEE
    divisions of small integer counts — bit-identical across engines, no
    quantization needed.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("ts1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("ts2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ts3"))
    )
    joined = t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    n1 = F.count("ts1")
    n2 = F.count("ts2")
    n3 = F.count("ts3")
    # Degenerate guard (r8 sparse-corpus probe): a feed with no 'view'
    # events has an EMPTY funnel top — the rates are undefined (NULL in
    # both engines), not a divide-by-zero crash.
    return joined.agg(
        n1.alias("n_viewed"),
        n2.alias("n_clicked_after_view"),
        n3.alias("n_purchased_after_click"),
        F.when(n1 > 0, n2.cast("double") / n1).alias("view_to_click_rate"),
        F.when(n1 > 0, n3.cast("double") / n1).alias(
            "view_to_purchase_rate"
        ),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), sizes AS (
        SELECT cohort_week, count(*) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ), activity AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset,
               e.user_id
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    ), retained AS (
        SELECT cohort_week, week_offset,
               count(DISTINCT user_id) AS n_active
        FROM activity GROUP BY cohort_week, week_offset
    )
    SELECT strftime(r.cohort_week, '%Y-%m-%d') AS cohort_week,
           r.week_offset, r.n_active, s.cohort_size,
           CAST(r.n_active AS DOUBLE) / s.cohort_size AS retention_rate
    FROM retained r JOIN sizes s ON r.cohort_week = s.cohort_week
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort, week-offset), how many came back.

    Scale shape: the firsts frame is one exchange on user_id; the
    activity join-back reuses that partitioning (user-keyed equi-join, no
    event payload shuffled — only user_id/ts). The (cohort, offset)
    distinct-count is the second exchange, over |cohorts|×|offsets| keys.
    The cohort-sizes frame is |cohorts| rows — broadcast into the final
    rate join, never shuffled.

    Parity: week truncation is date_trunc('week') (ISO Monday start) in
    both engines; the offset is integer day-diff / 7; the rate is one
    IEEE division of small ints — all exact.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    # firsts feeds both the cohort sizes and the activity join-back:
    # checkpoint so the first-touch collapse scans events once
    # (r5 plan audit: 3 event scans -> 2)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    ).transform(stage)
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_size"))
    activity = ev.join(firsts, "user_id").select(
        "cohort_week",
        (
            F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
        )
        .cast("bigint")
        .alias("week_offset"),
        "user_id",
    )
    retained = activity.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    return (
        retained.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention_rate"
            ),
        )
    )


FUNNEL_WINDOW_SECONDS = 86400  # 24 h from the entry event

# Shared by funnel_windowed and its skew-salted twin funnel_windowed_salted:
# salting changes only the physical distribution, so both certify against
# the same oracle.
_FUNNEL_WINDOWED_ORACLE = f"""
    WITH v AS (
        SELECT user_id, event_id AS v_id, epoch_us(ts) AS v_us
        FROM events WHERE event_type = 'view'
    ), c AS (
        SELECT user_id, epoch_us(ts) AS c_us
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ), vc AS (
        SELECT v.user_id, v.v_id, v.v_us, min(c.c_us) AS first_c
        FROM v LEFT JOIN c
          ON v.user_id = c.user_id
         AND c.c_us > v.v_us
         AND c.c_us <= v.v_us + CAST({FUNNEL_WINDOW_SECONDS} AS BIGINT)
                                * 1000000
        GROUP BY v.user_id, v.v_id, v.v_us
    ), vcp AS (
        SELECT vc.user_id, vc.v_id, vc.v_us, vc.first_c,
               min(p.p_us) AS first_p
        FROM vc LEFT JOIN p
          ON vc.user_id = p.user_id
         AND vc.first_c IS NOT NULL
         AND p.p_us > vc.first_c
         AND p.p_us <= vc.v_us + CAST({FUNNEL_WINDOW_SECONDS} AS BIGINT)
                                 * 1000000
        GROUP BY vc.user_id, vc.v_id, vc.v_us, vc.first_c
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_entries,
           CAST(sum(CASE WHEN first_c IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reached_click,
           CAST(sum(CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_reached_purchase
    FROM vcp GROUP BY user_id
    """


@query("funnel_windowed", oracle=_FUNNEL_WINDOWED_ORACLE)
def funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (ClickHouse windowFunnel semantics): EVERY view
    event opens a 24-hour window; within it, count whether a click
    follows the view and then a purchase follows that click — per-entry
    chains, not funnel_conversion's one-strict-sequence-per-user. The
    retention metric behind "of N impressions, how many converted within
    a day".

    SUFFIX-MIN FORMULATION (r8 skew probe): the original per-user
    equi-join materialized views×clicks candidate pairs — "bounded by
    per-user activity", which the skew probe showed is exactly the
    unbounded case: one bot user holding 50% of a 90%-click corpus made
    the INTERMEDIATE pair frame ~10^9 rows for a linear-sized output
    (10.4× wall at equal row count; salting only spreads those pairs,
    it cannot shrink them — the salted twin read 12.8×). This is
    ClickHouse's own sequential-scan semantics, so compute it that way:
    the earliest click strictly after a view is the SUFFIX-MIN of click
    times — and the only window frame Spark evaluates incrementally for
    a non-invertible aggregate like MIN is the growing
    UNBOUNDED-PRECEDING prefix (sliding and unbounded-FOLLOWING frames
    re-aggregate per row: a first draft with MIN over RANGE (1, window]
    measured 27× on the skew corpus, WORSE than the join). So both
    suffix-mins run as prefix-mins over ONE DESCENDING (user, us) sort:
    next_c/next_p = MIN(click/purchase us) OVER (ORDER BY us DESC RANGE
    UNBOUNDED PRECEDING TO -1) — strictly-later rows only, O(n) per
    partition after the sort. first_c applies the window cap to next_c;
    the purchase step reads the single click row at first_c (slim
    equi-join on (user_id, first_c), ≤1 match per view) and caps
    next_p ≤ v_us + win. Re-measured on the skew corpus: 10.4× → 0.9×.
    The pair-join formulation survives in funnel_windowed_salted as the
    salting demonstration, certified against this same oracle.

    Step equivalence: the earliest click after v_us either lands inside
    the 24h cap (then it IS the windowed min — nothing earlier exists)
    or the view reached no click; same argument for the purchase after
    first_c. NULL first_c views keep their entry row via the left join.

    Parity: all time math is integer microseconds; counts are integers;
    the argmin picks are min() over exact integers (the oracle keeps
    the independently-shaped join formulation).
    """
    win_us = FUNNEL_WINDOW_SECONDS * 1_000_000
    ev = load(spark, sf_dir, "events")
    e = ev.filter(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    # descending order makes "strictly later in time" = "strictly
    # preceding in frame", so the prefix grows monotonically (add-only
    # incremental evaluation); RANGE ... TO -1 excludes us-ties exactly
    # like the original c_us > v_us residual
    w_suffix = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    scored = e.select(
        "user_id",
        "event_type",
        "event_id",
        "us",
        F.min(F.when(F.col("event_type") == "click", F.col("us")))
        .over(w_suffix)
        .alias("next_c"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us")))
        .over(w_suffix)
        .alias("next_p"),
    )
    views = scored.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.col("us").alias("v_us"),
        F.when(
            F.col("next_c") <= F.col("us") + win_us, F.col("next_c")
        ).alias("first_c"),
    )
    # clicks sharing a (user, us) tie have identical frames — group to a
    # unique join key so each view meets at most one row; the key is
    # renamed (c_user/c_us) so this shared-lineage self-join references
    # structurally distinct attributes instead of leaning on Spark's
    # dataset-id ambiguous-self-join resolution
    clicks = (
        scored.filter(F.col("event_type") == "click")
        .groupBy(
            F.col("user_id").alias("c_user"), F.col("us").alias("c_us")
        )
        .agg(F.min("next_p").alias("next_p"))
    )
    vcp = views.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("first_c") == F.col("c_us")),
        "left",
    ).select(
        "user_id",
        "v_id",
        "v_us",
        "first_c",
        F.when(
            F.col("next_p") <= F.col("v_us") + win_us, F.col("next_p")
        ).alias("first_p"),
    )
    return vcp.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.when(F.col("first_c").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reached_click"),
        F.sum(F.when(F.col("first_p").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reached_purchase"),
    )


SESSION_BUCKET = "day"  # fragment boundary; any unit >= the session gap works


@query("ts_sessionize_fragments", oracle=_SESSIONIZE_ORACLE)
def ts_sessionize_fragments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state sessionization — EXACTLY ts_sessionize's result via a
    two-phase plan whose per-task state is capped by (user, day), not by a
    user's full history. This is the promised hot-user treatment from
    ts_sessionize's docstring made concrete: a bot emitting events for
    months puts its whole timeline in ONE window partition under the
    single-pass plan; here phase 1 sessionizes WITHIN (user_id, day)
    buckets (state = one user-day, bounded by definition), emitting
    session FRAGMENTS (start/end/count/decimal-sum/type-set), and phase 2
    runs the same gaps-and-islands pass over fragments — a frame that is
    orders of magnitude smaller than events (≤ sessions + one boundary
    fragment per user-day), so its per-user window is trivially cheap.

    Correctness of the stitch: ties in ts share a bucket (bucketing is by
    ts), so the (ts, event_id) total order never straddles a boundary
    mid-tie; a bucket's first event starts a fragment, and phase 2 merges
    fragments whose start follows the previous fragment's end within the
    gap — precisely the lag() test the single-pass plan applies to that
    event pair. Aggregates combine losslessly: counts add, decimal sums
    add exactly (associative — the reason exprs.py mandates them),
    distinct event types union via flattened fragment sets (bounded: a
    handful of types × fragments per session), and the double cast
    happens once at the edge.

    Scale shape: one event-level exchange on (user_id, bucket) — finer
    than user_id alone, so hot users spread across tasks — then one
    fragment-level exchange on user_id. Both later aggregates reuse their
    window's partitioning (no extra shuffle, plan-snapshot-pinned).
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "bucket", F.date_trunc(SESSION_BUCKET, F.col("ts"))
    )
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(wb))
    is_new_frag = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    frags = (
        ev.withColumn(
            "frag_seq",
            F.sum(is_new_frag).over(
                wb.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "bucket", "frag_seq")
        .agg(
            F.min("ts").alias("frag_start"),
            F.max("ts").alias("frag_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.collect_set("event_type").alias("etypes"),
            F.expr("SUM(CAST(value AS DECIMAL(38,4)))").alias("value_dec"),
        )
    )
    wu = Window.partitionBy("user_id").orderBy("frag_start")
    stitch_gap = F.unix_micros(F.col("frag_start")) - F.unix_micros(
        F.lag("frag_end").over(wu)
    )
    is_new_session = F.when(
        stitch_gap.isNull() | (stitch_gap > SESSION_GAP_SECONDS * 1_000_000),
        1,
    ).otherwise(0)
    sessions = frags.withColumn(
        "session_seq",
        F.sum(is_new_session)
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.date_format(F.min("frag_start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.max("frag_end"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.sum("n_events").cast("long").alias("n_events"),
        F.size(F.array_distinct(F.flatten(F.collect_list("etypes")))).cast(
            "long"
        ).alias("n_event_types"),
        F.expr("CAST(SUM(value_dec) AS DOUBLE)").alias("total_value"),
    )


FUNNEL_SALTS = 8


@query("funnel_windowed_salted", oracle=_FUNNEL_WINDOWED_ORACLE)
def funnel_windowed_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted windowed funnel — EXACTLY funnel_windowed's result with
    the hot-user mitigation its docstring promises made concrete (the
    join_salted_skew pattern applied to a chained per-user join). A bot
    user with 10^6 views puts every candidate pair on one task under the
    plain user_id equi-join; here the VIEW side carries a deterministic
    salt in [0, S) from xxhash64 of its entry event id, the much smaller
    click/purchase sides replicate S times, and both chain joins key on
    (user_id, salt) — splitting a hot user's entries across S tasks while
    every view still meets every one of that user's clicks exactly once.

    The per-entry argmin groupBys key on (user_id, v_id, ...), which the
    (user_id, salt) partitioning already satisfies (salt is a pure
    function of v_id), so no extra exchange appears between join and
    aggregate. Salt is derived, never random: re-runs are identical.
    The final per-user rollup is the only step that re-keys on bare
    user_id — counts, not events, cross that exchange.
    """
    win_us = FUNNEL_WINDOW_SECONDS * 1_000_000
    salts = F.array(*[F.lit(s) for s in range(FUNNEL_SALTS)])
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_id"),
        F.unix_micros("ts").alias("v_us"),
        F.pmod(F.xxhash64("event_id"), F.lit(FUNNEL_SALTS))
        .cast("int")
        .alias("salt"),
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("c_us"))
        .withColumn("salt", F.explode(salts))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .withColumn("salt", F.explode(salts))
    )
    vc = (
        v.join(c, ["user_id", "salt"], "left")
        .groupBy("user_id", "salt", "v_id", "v_us")
        .agg(
            F.min(
                F.when(
                    (F.col("c_us") > F.col("v_us"))
                    & (F.col("c_us") <= F.col("v_us") + win_us),
                    F.col("c_us"),
                )
            ).alias("first_c")
        )
    )
    vcp = (
        vc.join(p, ["user_id", "salt"], "left")
        .groupBy("user_id", "v_id", "v_us", "first_c")
        .agg(
            F.min(
                F.when(
                    F.col("first_c").isNotNull()
                    & (F.col("p_us") > F.col("first_c"))
                    & (F.col("p_us") <= F.col("v_us") + win_us),
                    F.col("p_us"),
                )
            ).alias("first_p")
        )
    )
    return vcp.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.when(F.col("first_c").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reached_click"),
        F.sum(F.when(F.col("first_p").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_reached_purchase"),
    )


# Attribution lookback: touches within 3 days before a purchase share
# the conversion credit.
ATTRIB_WINDOW_SECONDS = 3 * 86400
_ATTRIB_CHANNELS = ("view", "click", "signup")


@query(
    "attribution_channels",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS label_id, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT user_id, event_type AS channel, ts AS tts,
               event_id AS touch_id
        FROM events WHERE event_type IN {_ATTRIB_CHANNELS!r}
    ), pairs AS (
        SELECT p.label_id, t.channel, t.tts, t.touch_id
        FROM p JOIN t ON p.user_id = t.user_id
         AND t.tts < p.pts
         AND t.tts >= p.pts - INTERVAL {ATTRIB_WINDOW_SECONDS} SECOND
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY label_id
                                  ORDER BY tts DESC, touch_id DESC)
                   AS rn_last,
               row_number() OVER (PARTITION BY label_id
                                  ORDER BY tts, touch_id) AS rn_first
        FROM pairs
    ), per_purchase AS (
        SELECT label_id,
               MAX(CASE WHEN rn_last = 1 THEN channel END) AS last_channel,
               MAX(CASE WHEN rn_first = 1 THEN channel END) AS first_channel
        FROM ranked GROUP BY label_id
    ), per_chan AS (
        SELECT label_id, channel, count(*) AS n_ch
        FROM pairs GROUP BY label_id, channel
    )
    SELECT c.channel,
           CAST(sum(c.n_ch) AS BIGINT) AS total_touches,
           CAST(count(*) AS BIGINT) AS touched_conversions,
           CAST(sum(CASE WHEN c.channel = pp.last_channel
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch_conversions,
           CAST(sum(CASE WHEN c.channel = pp.first_channel
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch_conversions,
           CAST(sum(CASE WHEN c.channel <> pp.last_channel
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS assisted_conversions
    FROM per_chan c JOIN per_purchase pp ON c.label_id = pp.label_id
    GROUP BY c.channel
    """,
)
def attribution_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-attribution channel report: every purchase's preceding
    touches (view/click/signup within a 3-day lookback) share the
    conversion — per channel, total touches, conversions touched,
    last-touch wins, first-touch wins, and assists (touched but not
    last). The first/last-touch models are the two poles every
    attribution debate runs between; assists quantify what last-touch
    alone hides.

    Scale shape: one user-keyed equi-join with the lookback band as
    residual (the llm_training_examples join shape — per-purchase
    fan-out bounded by one user's 3-day activity), then TWO label-keyed
    aggregates — per-(purchase, channel) touch counts and per-purchase
    first/last picks via O(1)-state min_by/max_by (no window sort in
    the Spark plan; the oracle's rank formulation is independently
    shaped) — joined back on the SAME label key (co-partitioned, AQE
    reuses the exchange), and a final channel rollup over channel-count
    rows. Hot users take the funnel_windowed_salted treatment at scale.

    Parity: every output is an exact integer; first/last picks are
    tie-pinned by the unique (ts, event_id)."""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("label_id"),
        "user_id",
        F.col("ts").alias("pts"),
    ).alias("p")
    t = ev.filter(F.col("event_type").isin(*_ATTRIB_CHANNELS)).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("touch_id"),
    ).alias("t")
    pairs = p.join(
        t,
        (F.col("p.user_id") == F.col("t.user_id"))
        & (F.col("t.tts") < F.col("p.pts"))
        & (
            F.col("t.tts")
            >= F.col("p.pts")
            - F.expr(f"INTERVAL {ATTRIB_WINDOW_SECONDS} SECOND")
        ),
    ).select("p.label_id", "t.channel", "t.tts", "t.touch_id")
    # The touch-pair frame feeds BOTH label-keyed aggregates below, but do
    # NOT checkpoint it: the frame is density-quadratic (64x rows at 8x
    # event density) while the band join that produces it is cheap —
    # materializing it lost the A/B at BOTH scales (1x: 1.38 vs 1.05 s;
    # 8x: 6.2 vs 2.5 s, and worse under accumulated block pressure), the
    # same verdict as funnel_conversion's reverted checkpoint (r5). The
    # two consumers recompute the join; their partial aggs absorb the
    # pair volume map-side. The llm_dedup_ngram shared-frame stance
    # applies only when the shared frame is expensive to build and small
    # to store — here it is the opposite on both counts.
    pick = F.struct("tts", "touch_id")
    per_purchase = pairs.groupBy("label_id").agg(
        F.max_by("channel", pick).alias("last_channel"),
        F.min_by("channel", pick).alias("first_channel"),
    )
    per_chan = pairs.groupBy("label_id", "channel").agg(
        F.count(F.lit(1)).alias("n_ch")
    )
    joined = per_chan.join(per_purchase, "label_id")
    return joined.groupBy("channel").agg(
        F.sum("n_ch").alias("total_touches"),
        F.count(F.lit(1)).alias("touched_conversions"),
        F.sum(
            F.when(F.col("channel") == F.col("last_channel"), 1).otherwise(0)
        ).cast("long").alias("last_touch_conversions"),
        F.sum(
            F.when(F.col("channel") == F.col("first_channel"), 1).otherwise(
                0
            )
        ).cast("long").alias("first_touch_conversions"),
        F.sum(
            F.when(F.col("channel") != F.col("last_channel"), 1).otherwise(0)
        ).cast("long").alias("assisted_conversions"),
    )


# Path analysis keeps the first K steps of each session — the bounded
# prefix that makes per-session state O(1) for arbitrarily long sessions.
PATH_MAX_STEPS = 5


@query(
    "path_analysis_sessions",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessioned AS (
        SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS session_seq
        FROM marked
    ), stepped AS (
        SELECT user_id, session_seq, event_type,
               row_number() OVER (PARTITION BY user_id, session_seq
                                  ORDER BY ts, event_id) AS step,
               count(*) OVER (PARTITION BY user_id, session_seq) AS sess_len
        FROM sessioned
    ), paths AS (
        SELECT user_id, session_seq,
               string_agg(event_type, '>' ORDER BY step) AS path,
               MAX(sess_len) AS sess_len
        FROM stepped WHERE step <= {PATH_MAX_STEPS}
        GROUP BY user_id, session_seq
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN sess_len > {PATH_MAX_STEPS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 25
    """,
)
def path_analysis_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path analysis: the top session paths (ordered
    event-type prefixes like 'view>click>purchase') with session/user
    counts — the Sankey-diagram feed of product analytics, built on the
    same 30-min gap sessions as ts_sessionize.

    Scale shape: the gap-mark, session-number, and step-rank windows all
    share ONE user_id partitioning (a single exchange); the path then
    assembles from the first {PATH_MAX_STEPS} steps ONLY — rows beyond
    the prefix are filtered BEFORE any aggregation, so per-session state
    is a ≤{PATH_MAX_STEPS}-element string no matter how long a hot
    user's session runs (the bounded-prefix discipline; sess_len rides
    along as a pre-computed count, not a carried list). The final path
    rollup is a tiny distinct-paths frame; top-25 is
    TakeOrderedAndProject.

    Parity: paths are exact ordered string concatenations tie-pinned by
    (ts, event_id); all measures are integer counts."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    sessioned = marked.withColumn(
        "session_seq",
        F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    stepped = sessioned.select(
        "user_id",
        "session_seq",
        "event_type",
        F.row_number().over(ws).alias("step"),
        F.count(F.lit(1))
        .over(
            Window.partitionBy("user_id", "session_seq").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("sess_len"),
    )
    prefix = stepped.filter(F.col("step") <= PATH_MAX_STEPS)
    paths = prefix.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.array_sort(
                F.collect_list(F.struct("step", "event_type"))
            ).getField("event_type"),
            ">",
        ).alias("path"),
        F.max("sess_len").alias("sess_len"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.when(F.col("sess_len") > PATH_MAX_STEPS, 1).otherwise(0)
            )
            .cast("long")
            .alias("n_truncated"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(25)
    )


_US_PER_DAY = 86_400_000_000


@query(
    "win_interval_concurrency",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {SESSION_GAP_SECONDS} * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS session_seq
        FROM gaps
    ), sess AS (
        SELECT user_id, session_seq,
               epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
        FROM numbered GROUP BY user_id, session_seq
    ), d AS (
        SELECT start_us AS ts, 1 AS delta FROM sess
        UNION ALL
        SELECT end_us + 1, -1 FROM sess
    ), r AS (
        SELECT ts, delta,
               SUM(delta) OVER (ORDER BY ts, delta
                                ROWS UNBOUNDED PRECEDING) AS conc
        FROM d
    ), dd AS (
        SELECT ts // {_US_PER_DAY} AS day_idx, ts, delta, conc FROM r
    ), mx AS (
        SELECT day_idx, MAX(conc) AS peak FROM dd GROUP BY day_idx
    )
    SELECT strftime(DATE '1970-01-01'
                    + CAST(dd.day_idx AS INTEGER), '%Y-%m-%d') AS day,
           CAST(mx.peak AS BIGINT) AS peak_concurrency,
           strftime(make_timestamp(MIN(CASE WHEN dd.conc = mx.peak
                                            THEN dd.ts END)),
                    '%Y-%m-%d %H:%M:%S') AS peak_at,
           CAST(SUM(CASE WHEN dd.delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starts
    FROM dd JOIN mx ON dd.day_idx = mx.day_idx
    GROUP BY dd.day_idx, mx.peak
    """,
)
def win_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity gauge every
    serving/licensing/staffing question reduces to ("how many sessions
    were open AT ONCE, and when?"). Sessions come from the same 30-min
    gap rule as ts_sessionize; concurrency is the classic sweep line:
    +1 at session start, −1 one microsecond after session end, peak =
    max running sum.

    Scale shape: the DISTRIBUTED sweep line — a global running sum looks
    inherently serial, but it two-levels exactly like any prefix scan:
    each day partition sweeps its own deltas independently (one
    day-partitioned window), day TOTALS aggregate to a frame with one
    row per day whose exclusive prefix sum (a window over ~365 rows —
    control-plane) is each day's carry-in offset, and per-event
    concurrency = carry-in + local prefix. No single-partition pass ever
    touches event-scale data; the oracle runs the single-level global
    sweep as the independent formulation. Days with no session boundary
    report nothing (their gauge is flat at the carry-in).

    Parity: all integer microsecond arithmetic; within equal (ts, delta)
    sort keys every delta is identical, so the SET of achieved prefix
    values — hence each day's peak and earliest peak instant — is
    invariant to engine tie order."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    sess = (
        ev.withColumn(
            "session_seq",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("start_us"),
            F.unix_micros(F.max("ts")).alias("end_us"),
        )
        # the session frame feeds both delta branches AND the day-total /
        # local-sweep consumers — checkpoint it once so the event-scale
        # sessionize window never re-runs (llm_dedup_ngram stance)
        .transform(stage)
    )
    deltas = sess.select(
        F.col("start_us").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        sess.select(
            (F.col("end_us") + 1).alias("ts"), F.lit(-1).alias("delta")
        )
    ).withColumn("day_idx", (F.col("ts") / _US_PER_DAY).cast("long"))
    w_day = Window.partitionBy("day_idx").orderBy("ts", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = deltas.withColumn("run", F.sum("delta").over(w_day))
    day_totals = deltas.groupBy("day_idx").agg(
        F.sum("delta").alias("day_total")
    )
    w_carry = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = day_totals.withColumn(
        "carry_in", F.coalesce(F.sum("day_total").over(w_carry), F.lit(0))
    ).select("day_idx", "carry_in")
    conc = local.join(F.broadcast(carry), "day_idx").withColumn(
        "conc", F.col("carry_in") + F.col("run")
    )
    w_max = Window.partitionBy("day_idx")
    peaked = conc.withColumn("peak", F.max("conc").over(w_max))
    return peaked.groupBy("day_idx", "peak").agg(
        F.min(
            F.when(F.col("conc") == F.col("peak"), F.col("ts"))
        ).alias("peak_us"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_starts"),
    ).select(
        F.date_format(
            F.timestamp_micros(F.col("day_idx") * _US_PER_DAY), "yyyy-MM-dd"
        ).alias("day"),
        F.col("peak").cast("long").alias("peak_concurrency"),
        F.date_format(
            F.timestamp_micros(F.col("peak_us")), "yyyy-MM-dd HH:mm:ss"
        ).alias("peak_at"),
        "n_starts",
    )


@query(
    "cohort_survival_km",
    oracle="""
    WITH raw AS (
        SELECT user_id,
               date_diff('day', CAST(MIN(ts) AS DATE),
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END)) AS conv_days
        FROM events GROUP BY user_id
    ),
    per_user AS (
        SELECT user_id,
               CASE WHEN conv_days IS NOT NULL AND conv_days <= 3
                    THEN conv_days ELSE 3 END AS duration_days,
               conv_days IS NOT NULL AND conv_days <= 3 AS churned
        FROM raw
    ),
    grid AS (
        SELECT duration_days,
               CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_churned,
               CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_censored
        FROM per_user GROUP BY duration_days
    ),
    risk AS (
        SELECT duration_days, n_churned, n_censored,
               CAST(SUM(n_churned + n_censored) OVER ()
                    - COALESCE(SUM(n_churned + n_censored) OVER (
                          ORDER BY duration_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) AS BIGINT) AS n_risk
        FROM grid
    ),
    terms AS (
        SELECT *,
               CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,8))
                    WHEN n_churned < n_risk THEN CAST(ln(
                        1.0 - CAST(n_churned AS DOUBLE) / n_risk
                    ) AS DECIMAL(18,8))
                    ELSE CAST(0 AS DECIMAL(18,8)) END AS term,
               MAX(CASE WHEN n_churned = n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY duration_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS zeroed
        FROM risk
    )
    SELECT duration_days, n_risk, n_churned, n_censored,
           CASE WHEN zeroed = 1 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(CAST(exp(CAST(SUM(term) OVER (
                         ORDER BY duration_days
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
           END AS survival
    FROM terms
    """,
)
def cohort_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-conversion curve: duration = days from a
    user's first event to their first purchase within a 3-day horizon;
    users not converted by the horizon are right-CENSORED there
    (administrative censoring) — the product-limit
    estimator (Kaplan & Meier 1958) growth teams read conversion latency
    from, counting the still-unconverted correctly where a naive
    avg(days-to-purchase) silently drops them. (KM's "event observed"
    flag is named churned in the plan; here the event is conversion.)

    Parity: risk counts are exact integer window cumsums; each hazard
    term 1 - d/n is one correctly-rounded division of exact longs; the
    product-limit runs as exp(Sigma ln(term)) with each ln QUANTIZED
    through DECIMAL(18,8) before the exact decimal cumulative sum and
    exp re-quantized at the edge (the llm_diversity_index per-term rule
    — ln/exp differ in the last ulp between libms). The everyone-dies
    tail (d = n, ln 0 undefined) pins survival to exactly 0 by an
    integer flag in both engines.

    Scale shape: one partial-aggregated groupBy collapses events to
    per-user rows (the exchange carries (user, min, max) triples), a
    second collapses users to the O(distinct durations) grid; the KM
    windows run single-partition over grid rows (bounded by the horizon
    — the validate_volume_anomaly argument). Deaths count before
    same-time censors (the standard KM tie convention) because censored
    rows at t never enter earlier risk subtractions.
    """
    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.expr(
                """datediff(
                       MIN(CASE WHEN event_type = 'purchase'
                           THEN CAST(ts AS DATE) END),
                       CAST(MIN(ts) AS DATE))"""
            ).alias("conv_days"),
        )
        .select(
            F.expr(
                """CAST(CASE WHEN conv_days IS NOT NULL AND conv_days <= 3
                   THEN conv_days ELSE 3 END AS BIGINT)"""
            ).alias("duration_days"),
            F.expr("conv_days IS NOT NULL AND conv_days <= 3").alias("churned"),
        )
    )
    grid = per_user.groupBy("duration_days").agg(
        F.expr(
            "CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("n_churned"),
        F.expr(
            "CAST(SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)"
        ).alias("n_censored"),
    )
    risk = grid.select(
        "duration_days",
        "n_churned",
        "n_censored",
        F.expr(
            """CAST(SUM(n_churned + n_censored) OVER ()
               - COALESCE(SUM(n_churned + n_censored) OVER (
                     ORDER BY duration_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS BIGINT)"""
        ).alias("n_risk"),
    )
    terms = risk.select(
        "*",
        F.expr(
            """CASE WHEN n_churned = 0 THEN CAST(0 AS DECIMAL(18,8))
               WHEN n_churned < n_risk THEN CAST(ln(
                   1.0D - CAST(n_churned AS DOUBLE) / n_risk
               ) AS DECIMAL(18,8))
               ELSE CAST(0 AS DECIMAL(18,8)) END"""
        ).alias("term"),
        F.expr(
            """MAX(CASE WHEN n_churned = n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY duration_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )"""
        ).alias("zeroed"),
    )
    return terms.select(
        "duration_days",
        "n_risk",
        "n_churned",
        "n_censored",
        F.expr(
            """CASE WHEN zeroed = 1 THEN CAST(0.0D AS DOUBLE)
               ELSE CAST(CAST(exp(CAST(SUM(term) OVER (
                        ORDER BY duration_days
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) AS DOUBLE)) AS DECIMAL(18,6)) AS DOUBLE)
               END"""
        ).alias("survival"),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), sizes AS (
        SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ), revenue AS (
        SELECT f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT)
                   AS week_offset,
               SUM(CASE WHEN e.event_type = 'purchase'
                        THEN CAST(e.value AS DECIMAL(38,2))
                        ELSE CAST(0 AS DECIMAL(38,2)) END) AS wk_rev
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY f.cohort_week, 2
    ), cum AS (
        SELECT cohort_week, week_offset,
               CAST(wk_rev AS DOUBLE) AS wk_revenue,
               CAST(SUM(wk_rev) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS cum_revenue
        FROM revenue
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           c.week_offset, s.cohort_size, c.wk_revenue, c.cum_revenue,
           c.cum_revenue / s.cohort_size AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per signup-week
    cohort by week-of-life, normalized per cohort member — the
    lifetime-value readout growth finance pairs with cohort_retention
    (retention counts WHO came back; LTV sums WHAT they spent), and the
    payback-period input (LTV curve vs acquisition cost).

    Parity: weekly revenue is an exact DECIMAL(38,2) sum; the cohort
    cumulative runs IN DECIMAL over the ordered offset frame (exact,
    order-insensitive) and casts to double once; the per-user division
    is one correctly-rounded quotient by an exact integer. Week
    truncation and offsets are the cohort_retention discipline.

    Scale shape: the firsts frame is one user_id exchange; the revenue
    join-back reuses it; the weekly grid aggregate is the second
    exchange over |cohorts| x |offsets| keys; the cumulative window and
    the broadcast size join ride grid rows. Event payloads never
    shuffle twice.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value")
    # firsts feeds both the cohort sizes and the revenue join-back:
    # checkpoint so the first-touch collapse scans events once
    # (r5 plan audit: 3 event scans -> 2)
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    ).transform(stage)
    sizes = firsts.groupBy("cohort_week").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("cohort_size")
    )
    revenue = (
        ev.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "event_type",
            "value",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(
            F.expr(
                """SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(38,2))
                   ELSE CAST(0 AS DECIMAL(38,2)) END)"""
            ).alias("wk_rev")
        )
    )
    cum = revenue.select(
        "cohort_week",
        "week_offset",
        F.expr("CAST(wk_rev AS DOUBLE)").alias("wk_revenue"),
        F.expr(
            """CAST(SUM(wk_rev) OVER (
                   PARTITION BY cohort_week ORDER BY week_offset
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE)"""
        ).alias("cum_revenue"),
    )
    return (
        cum.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "cohort_size",
            "wk_revenue",
            "cum_revenue",
            F.expr("cum_revenue / cohort_size").alias("ltv_per_user"),
        )
    )


@query(
    "path_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS from_type, event_type AS to_type,
               CAST(COUNT(*) AS BIGINT) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    outdeg AS (
        SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
        FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n_trans, o.n_from,
           CAST(t.n_trans AS DOUBLE) / o.n_from AS p_transition
    FROM trans t JOIN outdeg o ON t.from_type = o.from_type
    """,
)
def path_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next event type | current event type) estimated from every
    consecutive pair in each user's (ts, event_id)-ordered history —
    the behavior model behind next-action prediction, anomaly scoring
    (improbable transitions), and simulation, giving path_analysis_
    sessions' top-paths view its generative counterpart.

    Parity: the (ts, event_id) total order makes lag() pick the same
    predecessor in both engines; transition and out-degree counts are
    exact integers; each probability is ONE correctly-rounded division
    — bit-identical, nothing to quantize.

    Scale shape: one user_id exchange for the lag window (the
    ts_sessionize posture — event text never shuffles, only type/ts/id
    triples), then a partial-aggregated groupBy onto the bounded
    |types|^2 transition grid; out-degrees broadcast back. Flat in
    event volume.
    """
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    seq = ev.select(
        "event_type",
        F.expr(
            """lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )"""
        ).alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_trans"))
    )
    outdeg = trans.groupBy("from_type").agg(
        F.expr("CAST(SUM(n_trans) AS BIGINT)").alias("n_from")
    )
    return trans.join(F.broadcast(outdeg), "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        "n_from",
        F.expr("CAST(n_trans AS DOUBLE) / n_from").alias("p_transition"),
    )


@query(
    "pipeline_feature_store",
    oracle=f"""
    WITH order_f AS (
        SELECT o_custkey AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)
                   AS total_spend,
               CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_order_day
        FROM orders GROUP BY o_custkey
    ),
    event_f AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_views,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clicks,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(38,2))
                    ELSE CAST(0 AS DECIMAL(38,2)) END) AS DOUBLE)
                   AS event_revenue
        FROM events GROUP BY user_id
    ),
    session_f AS (
        SELECT user_id, CAST(MAX(session_seq) AS BIGINT) AS n_sessions
        FROM (
            SELECT user_id,
                   SUM(CASE WHEN prev_ts IS NULL
                            OR epoch_us(ts) - epoch_us(prev_ts)
                               > {SESSION_GAP_SECONDS} * 1000000
                       THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM (
                SELECT user_id, ts, event_id,
                       lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_ts
                FROM events
            )
        ) GROUP BY user_id
    )
    SELECT e.user_id, e.n_events, e.n_views, e.n_clicks, e.n_purchases,
           e.event_revenue, s.n_sessions,
           COALESCE(o.n_orders, 0) AS n_orders,
           CAST(COALESCE(o.total_spend, 0.0) AS DOUBLE) AS total_spend,
           e.n_purchases > 0 AS converted,
           CASE WHEN e.n_clicks = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(e.n_purchases AS DOUBLE) / e.n_clicks
           END AS purchase_per_click
    FROM event_f e
    JOIN session_f s ON e.user_id = s.user_id
    LEFT JOIN order_f o ON e.user_id = o.user_id
    """,
)
def pipeline_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store materialization: ONE Catalyst plan assembling the
    per-user ML feature vector — event volumes by type, decimal-exact
    revenue, gap-based session count (the ts_sessionize discipline
    inlined), order history joined across the warehouse, conversion
    label, and a rate feature — the nightly batch that feeds churn/LTV
    models, and the analytics-side sibling of pipeline_curate_corpus
    (many certified operators composed into one declarative plan, not
    a chain of materialized steps).

    Parity: counts are exact; revenues are exact decimal sums; the
    session count reuses the exact integer-microsecond gap rule; the
    one rate feature is a single correctly-rounded division with an
    integer-guarded zero branch. Nothing to quantize.

    Scale shape: the event features and the session window BOTH key on
    user_id — Catalyst reuses one user exchange for the window, the
    aggregate, and the joins (ClusteredDistribution subset rule, the
    eventflow module posture); the order features arrive partial-
    aggregated on the customer key. Event payloads shuffle once.
    """
    ev = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    order_f = o.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
        F.expr(
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE)"
        ).alias("total_spend"),
    )
    event_f = ev.groupBy("user_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_views"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_clicks"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("n_purchases"),
        F.expr(
            """CAST(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(38,2))
               ELSE CAST(0 AS DECIMAL(38,2)) END) AS DOUBLE)"""
        ).alias("event_revenue"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    session_f = (
        ev.withColumn(
            "session_seq",
            F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id")
        .agg(F.expr("CAST(MAX(session_seq) AS BIGINT)").alias("n_sessions"))
    )
    return (
        event_f.join(session_f, "user_id")
        .join(order_f, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_views",
            "n_clicks",
            "n_purchases",
            "event_revenue",
            "n_sessions",
            F.expr("COALESCE(n_orders, 0)").alias("n_orders"),
            F.expr("CAST(COALESCE(total_spend, 0.0D) AS DOUBLE)").alias(
                "total_spend"
            ),
            F.expr("n_purchases > 0").alias("converted"),
            F.expr(
                """CASE WHEN n_clicks = 0 THEN CAST(0.0D AS DOUBLE)
                   ELSE CAST(n_purchases AS DOUBLE) / n_clicks END"""
            ).alias("purchase_per_click"),
        )
    )
