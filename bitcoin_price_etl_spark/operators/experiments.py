"""Experimentation analytics: the A/B-test readout pipeline — sample-ratio
sanity, Welch's t-test, and CUPED variance reduction.

No reference precedent (the reference is a single-feed ETL; SURVEY.md
§2.1): these are the rollups any event-producing product runs the moment
it ships its first experiment. Everything is expressed as closed-form
moment algebra so the corpus is touched once per operator: an experiment
readout at 100 TB is a per-user aggregate (the unit of analysis — user-
level aggregation first prevents pseudo-replication, the classic A/B
mistake of treating events as independent samples) followed by per-variant
moment buffers, never a per-event statistical pass.

Variant assignment is user_id % 2 — deterministic, layout-independent,
and the same bucketing discipline as llm_sample_hash's md5 draws (a real
assignment service hashes (user, experiment) the same way).

Parity: counts and decimal-summed moments are exact; final test
statistics divide exact operands and quantize through coarse DECIMAL on
both sides (the agg_corr rule) because sqrt/division noise is
libm-adjacent at the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.session import stage
from bitcoin_price_etl_spark.catalog import load
from bitcoin_price_etl_spark.registry import query

# Pre/post boundary for CUPED's covariate window (events span Jan 2024).
CUPED_SPLIT = "2024-01-16 00:00:00"


@query(
    "ab_srm_check",
    oracle="""
    WITH units AS (
        SELECT DISTINCT user_id, user_id % 2 AS variant FROM events
    ), counts AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_control,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_treatment
        FROM units
    )
    SELECT n_control, n_treatment,
           CAST((n_control - n_treatment) * (n_control - n_treatment)
                AS DOUBLE) / (n_control + n_treatment) AS chi2_stat,
           CAST((n_control - n_treatment) * (n_control - n_treatment)
                AS DOUBLE) / (n_control + n_treatment) > 3.841 AS srm_flag
    FROM counts
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check: does the observed control/treatment
    unit split match the designed 50/50? A significant chi-square here
    invalidates the experiment BEFORE any metric is read — the first
    gate of every A/B readout. For a 2-cell 50/50 design the chi-square
    collapses to (n0-n1)²/(n0+n1), one exact integer expression.

    Scale shape: one distinct-user aggregate (partial-agg'd) collapsed
    to two counters; the statistic is control-plane arithmetic.

    Parity: the statistic is a single IEEE division of exact integers —
    bit-identical, no quantization needed."""
    ev = load(spark, sf_dir, "events")
    units = ev.select(
        "user_id", (F.col("user_id") % 2).alias("variant")
    ).distinct()
    counts = units.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treatment"),
    )
    diff = F.col("n_control") - F.col("n_treatment")
    chi2 = (diff * diff).cast("double") / (
        F.col("n_control") + F.col("n_treatment")
    )
    return counts.select(
        "n_control",
        "n_treatment",
        chi2.alias("chi2_stat"),
        (chi2 > 3.841).alias("srm_flag"),
    )


_USER_METRIC_DUCK = """
    SELECT user_id, user_id % 2 AS variant,
           CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)
               AS y
    FROM events GROUP BY user_id
"""


@query(
    "ab_ttest_welch",
    oracle=f"""
    WITH m AS ({_USER_METRIC_DUCK}),
    v AS (
        SELECT variant, COUNT(*) AS n,
               CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS s,
               CAST(SUM(CAST(y AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS ss
        FROM m GROUP BY variant
    ), w AS (
        SELECT
          MAX(CASE WHEN variant = 0 THEN n END) AS n0,
          MAX(CASE WHEN variant = 1 THEN n END) AS n1,
          MAX(CASE WHEN variant = 0 THEN s / n END) AS m0,
          MAX(CASE WHEN variant = 1 THEN s / n END) AS m1,
          MAX(CASE WHEN variant = 0 AND n > 1
                   THEN (ss - s * s / n) / (n - 1) END) AS v0,
          MAX(CASE WHEN variant = 1 AND n > 1
                   THEN (ss - s * s / n) / (n - 1) END) AS v1
        FROM v
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treatment,
           CAST(CAST(m0 AS DECIMAL(18,6)) AS DOUBLE) AS mean_control,
           CAST(CAST(m1 AS DECIMAL(18,6)) AS DOUBLE) AS mean_treatment,
           CASE WHEN (v0 / n0 + v1 / n1) > 0
                THEN CAST(CAST((m1 - m0) / sqrt(v0 / n0 + v1 / n1)
                          AS DECIMAL(12,6)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END AS t_stat,
           CASE WHEN ((v0 / n0) * (v0 / n0) / (n0 - 1)
                      + (v1 / n1) * (v1 / n1) / (n1 - 1)) > 0
                THEN CAST(CAST((v0 / n0 + v1 / n1) * (v0 / n0 + v1 / n1)
                          / ((v0 / n0) * (v0 / n0) / (n0 - 1)
                             + (v1 / n1) * (v1 / n1) / (n1 - 1))
                          AS DECIMAL(12,4)) AS DOUBLE)
                ELSE CAST(NULL AS DOUBLE) END AS welch_df
    FROM w
    """,
)
def ab_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user purchase revenue,
    control (user_id%2=0) vs treatment — THE A/B significance readout.
    The metric aggregates to the USER first (unit of analysis;
    event-level testing pseudo-replicates and overstates significance),
    users without purchases count as zeros.

    Scale shape: one user-keyed aggregate builds the unit metrics, one
    variant-keyed aggregate carries three O(1) moment buffers each, and
    the t statistic + Welch–Satterthwaite df are closed-form control-
    plane arithmetic on six numbers. Nothing statistical ever walks the
    event stream.

    Parity: metrics and moments are exact decimal sums; the t-stat and
    df quantize through DECIMAL(12,6)/DECIMAL(12,4) (sqrt + chained
    division noise, the agg_corr rule)."""
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.expr(
            "CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'"
            " THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"
        ).alias("y")
    ).withColumn("variant", F.col("user_id") % 2)
    v = m.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE)").alias("s"),
        F.expr(
            "CAST(SUM(CAST(y AS DECIMAL(18,2))"
            " * CAST(y AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("ss"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(
            F.when(F.col("variant") == 0, F.col("s") / F.col("n"))
        ).alias("m0"),
        F.max(
            F.when(F.col("variant") == 1, F.col("s") / F.col("n"))
        ).alias("m1"),
        F.max(
            F.when(
                (F.col("variant") == 0) & (F.col("n") > 1),
                (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1),
            )
        ).alias("v0"),
        F.max(
            F.when(
                (F.col("variant") == 1) & (F.col("n") > 1),
                (F.col("ss") - F.col("s") * F.col("s") / F.col("n"))
                / (F.col("n") - 1),
            )
        ).alias("v1"),
    )
    se2 = F.col("v0") / F.col("n0") + F.col("v1") / F.col("n1")
    df = (se2 * se2) / (
        (F.col("v0") / F.col("n0")) * (F.col("v0") / F.col("n0"))
        / (F.col("n0") - 1)
        + (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1"))
        / (F.col("n1") - 1)
    )
    return w.select(
        F.col("n0").cast("long").alias("n_control"),
        F.col("n1").cast("long").alias("n_treatment"),
        F.col("m0").cast("decimal(18,6)").cast("double").alias(
            "mean_control"
        ),
        F.col("m1").cast("decimal(18,6)").cast("double").alias(
            "mean_treatment"
        ),
        # Degenerate guards (r8 sparse-corpus probe): a metric with zero
        # variance in both arms (e.g. a feed with no purchase events at
        # all - every per-user y is exactly 0) has an undefined t and
        # df: NULL, not an ANSI crash; single-unit arms leave the
        # variance itself NULL (n > 1 guard above), which propagates.
        F.when(se2 > 0, (F.col("m1") - F.col("m0")) / F.sqrt(se2))
        .cast("decimal(12,6)")
        .cast("double")
        .alias("t_stat"),
        F.when(
            (F.col("v0") / F.col("n0")) * (F.col("v0") / F.col("n0"))
            / (F.col("n0") - 1)
            + (F.col("v1") / F.col("n1")) * (F.col("v1") / F.col("n1"))
            / (F.col("n1") - 1)
            > 0,
            df,
        )
        .cast("decimal(12,4)")
        .cast("double")
        .alias("welch_df"),
    )


@query(
    "ab_cuped_adjust",
    oracle=f"""
    WITH m AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(coalesce(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                     THEN CAST(value AS DECIMAL(38,2)) END), 0.0)
                    AS DOUBLE) AS x,
               CAST(coalesce(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                     THEN CAST(value AS DECIMAL(38,2)) END), 0.0)
                    AS DOUBLE) AS y
        FROM events GROUP BY user_id
    ), g AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(18,2))
                        * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(18,2))
                        * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM m
    ), v AS (
        SELECT variant, COUNT(*) AS nv,
               CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) AS svx,
               CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS svy
        FROM m GROUP BY variant
    )
    SELECT variant, CAST(nv AS BIGINT) AS n_users,
           CAST(CAST(svy / nv AS DECIMAL(18,6)) AS DOUBLE) AS mean_post,
           CAST(CAST(svy / nv
                     - coalesce(
                           CASE WHEN g.n * g.sxx - g.sx * g.sx <> 0
                                THEN (g.n * g.sxy - g.sx * g.sy)
                                     / (g.n * g.sxx - g.sx * g.sx) END,
                           0.0)
                       * (svx / nv - g.sx / g.n)
                     AS DECIMAL(18,6)) AS DOUBLE) AS mean_cuped,
           CAST(CAST(CASE WHEN (g.n * g.sxx - g.sx * g.sx)
                               * (g.n * g.syy - g.sy * g.sy) <> 0
                          THEN (g.n * g.sxy - g.sx * g.sy)
                               * (g.n * g.sxy - g.sx * g.sy)
                               / ((g.n * g.sxx - g.sx * g.sx)
                                  * (g.n * g.syy - g.sy * g.sy)) END
                     AS DECIMAL(12,8)) AS DOUBLE) AS var_reduction
    FROM v, g
    """,
)
def ab_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: adjust each variant's post-period mean
    with the pre-period covariate (theta = cov(pre, post)/var(pre),
    pooled), and report the variance fraction removed (= corr²) — the
    industry-standard move that shrinks A/B confidence intervals without
    more traffic. Pre/post split at {CUPED_SPLIT}; units are users, both
    windows decimal-summed per user.

    Scale shape: ONE user-keyed aggregate builds (x, y) per unit, then
    two tiny moment aggregates (global theta, per-variant means) —
    closed-form: mean_cuped = ȳ_v − θ(x̄_v − x̄) needs no second pass
    over units, so the event stream is scanned once.

    Parity: moments are exact decimal sums (agg_corr discipline);
    adjusted means and the reduction ratio quantize through coarse
    DECIMAL before the double edge."""
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        F.expr(
            f"CAST(coalesce(SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'"
            " THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"
        ).alias("x"),
        F.expr(
            f"CAST(coalesce(SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'"
            " THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"
        ).alias("y"),
    ).withColumn("variant", F.col("user_id") % 2)
    m = m.transform(stage)  # feeds the global AND per-variant aggregates
    g = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE)").alias("sy"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(18,2))"
            " * CAST(x AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sxx"),
        F.expr(
            "CAST(SUM(CAST(y AS DECIMAL(18,2))"
            " * CAST(y AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("syy"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(18,2))"
            " * CAST(y AS DECIMAL(18,2))) AS DOUBLE)"
        ).alias("sxy"),
    )
    v = m.groupBy("variant").agg(
        F.count(F.lit(1)).alias("nv"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)").alias(
            "svx"
        ),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE)").alias(
            "svy"
        ),
    )
    j = v.crossJoin(F.broadcast(g))
    theta_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    theta_den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # Degenerate guard (r11 sparse-at-sf0.1 probe catch): a zero-variance
    # pre-period covariate (every unit's x identical — e.g. a corpus
    # whose events all land on one side of the split) makes theta 0/0.
    # With a constant covariate the adjustment term is identically zero
    # (x̄_v − x̄ = 0 for every variant), so the CUPED estimate falls back
    # to the plain post mean: theta := 0, not a crash. corr² is genuinely
    # undefined there (and when var(y) = 0): NULL. Mirrored in the oracle.
    theta = F.coalesce(
        F.when(theta_den != 0, theta_num / theta_den), F.lit(0.0)
    )
    vr_den = theta_den * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return j.select(
        "variant",
        F.col("nv").cast("long").alias("n_users"),
        (F.col("svy") / F.col("nv"))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("mean_post"),
        (
            F.col("svy") / F.col("nv")
            - theta * (F.col("svx") / F.col("nv") - F.col("sx") / F.col("n"))
        )
        .cast("decimal(18,6)")
        .cast("double")
        .alias("mean_cuped"),
        F.when(vr_den != 0, theta_num * theta_num / vr_den)
        .cast("decimal(12,8)")
        .cast("double")
        .alias("var_reduction"),
    )


_RATIO_USER_DUCK = """
    SELECT user_id, user_id % 2 AS variant,
           CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)
               AS x,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS y
    FROM events GROUP BY user_id
"""


@query(
    "ab_ratio_delta_ci",
    oracle=f"""
    WITH units AS ({_RATIO_USER_DUCK}),
    m AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) AS sx,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,2)) * CAST(x AS DECIMAL(38,2)))
                    AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(CAST(x AS DECIMAL(38,2)) * y) AS DOUBLE) AS sxy
        FROM units GROUP BY variant
    ),
    d AS (
        SELECT variant, n, sx, sy,
               sx / sy AS ratio,
               sx / n AS xbar, sy / n AS ybar,
               (sxx - n * (sx / n) * (sx / n)) / (n - 1) AS vx,
               (syy - n * (sy / n) * (sy / n)) / (n - 1) AS vy,
               (sxy - n * (sx / n) * (sy / n)) / (n - 1) AS cxy
        FROM m
    )
    SELECT CAST(variant AS BIGINT) AS variant, n,
           sx AS sum_revenue, sy AS sum_clicks, ratio,
           (vx - 2.0 * ratio * cxy + ratio * ratio * vy)
               / (n * ybar * ybar) AS var_delta,
           sqrt((vx - 2.0 * ratio * cxy + ratio * ratio * vy)
               / (n * ybar * ybar)) AS se,
           ratio - CAST(1.96 AS DOUBLE)
               * sqrt((vx - 2.0 * ratio * cxy + ratio * ratio * vy)
                      / (n * ybar * ybar)) AS ci_lo,
           ratio + CAST(1.96 AS DOUBLE)
               * sqrt((vx - 2.0 * ratio * cxy + ratio * ratio * vy)
                      / (n * ybar * ybar)) AS ci_hi
    FROM d
    """,
)
def ab_ratio_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (revenue per
    click) per variant — the readout for metrics whose numerator and
    denominator vary per user, where naive SE formulas are wrong because
    ratio metrics aren't averages of i.i.d. units (Deng et al., KDD'18
    "Applying the Delta Method in Metric Analytics"). Var(X̄/Ȳ) ≈
    (Sx² − 2R·Sxy + R²·Sy²) / (n·Ȳ²), clustered at the user.

    Parity: per-user x (decimal-exact revenue) and integer click counts
    feed exact decimal moment sums (the agg_corr input-first rule:
    multiply in decimal at natural scales, cast once to double); every
    downstream step — means, variances, the delta expression, sqrt, the
    1.96 half-width — is a correctly-rounded IEEE chain on identical
    operands, MIRRORED in op order between engines; 1.96 is CAST to
    double in the oracle (DuckDB parses bare literals as DECIMAL — the
    ts_volatility_ohlc trap). No quantization needed.

    Scale shape: the corpus collapses to per-user units in ONE
    partial-aggregated pass, then to two 6-number moment buffers. The
    statistics are control-plane arithmetic. Flat at any event volume.
    """
    ev = load(spark, sf_dir, "events")
    units = ev.groupBy("user_id").agg(
        F.expr(
            """CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"""
        ).alias("x"),
        F.expr(
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
            " AS BIGINT)"
        ).alias("y"),
    ).select(F.expr("user_id % 2").alias("variant"), "x", "y")
    m = units.groupBy("variant").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(y) AS DOUBLE)").alias("sy"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(38,2)) * CAST(x AS DECIMAL(38,2)))"
            " AS DOUBLE)"
        ).alias("sxx"),
        F.expr("CAST(SUM(y * y) AS DOUBLE)").alias("syy"),
        F.expr(
            "CAST(SUM(CAST(x AS DECIMAL(38,2)) * y) AS DOUBLE)"
        ).alias("sxy"),
    )
    d = m.select(
        "variant",
        "n",
        "sx",
        "sy",
        F.expr("sx / sy").alias("ratio"),
        F.expr("sx / n").alias("xbar"),
        F.expr("sy / n").alias("ybar"),
        F.expr("(sxx - n * (sx / n) * (sx / n)) / (n - 1)").alias("vx"),
        F.expr("(syy - n * (sy / n) * (sy / n)) / (n - 1)").alias("vy"),
        F.expr("(sxy - n * (sx / n) * (sy / n)) / (n - 1)").alias("cxy"),
    )
    var_delta = (
        "(vx - 2.0D * ratio * cxy + ratio * ratio * vy) / (n * ybar * ybar)"
    )
    return d.select(
        F.col("variant").cast("bigint").alias("variant"),
        "n",
        F.col("sx").alias("sum_revenue"),
        F.col("sy").alias("sum_clicks"),
        "ratio",
        F.expr(var_delta).alias("var_delta"),
        F.expr(f"sqrt({var_delta})").alias("se"),
        F.expr(f"ratio - 1.96D * sqrt({var_delta})").alias("ci_lo"),
        F.expr(f"ratio + 1.96D * sqrt({var_delta})").alias("ci_hi"),
    )


@query(
    "ab_power_mde",
    oracle=f"""
    WITH units AS ({_USER_METRIC_DUCK}),
    m AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(y AS DECIMAL(38,2)) * CAST(y AS DECIMAL(38,2)))
                    AS DOUBLE) AS syy
        FROM units GROUP BY variant
    )
    SELECT CAST(variant AS BIGINT) AS variant, n,
           sy / n AS mean_y,
           (syy - n * (sy / n) * (sy / n)) / (n - 1) AS var_y,
           CAST(CAST(
               (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
               * sqrt(2.0 * ((syy - n * (sy / n) * (sy / n)) / (n - 1)) / n)
               AS DECIMAL(18,8)) AS DOUBLE) AS mde_abs,
           CASE WHEN sy / n <> 0.0 THEN CAST(CAST(
               (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
               * sqrt(2.0 * ((syy - n * (sy / n) * (sy / n)) / (n - 1)) / n)
               / (sy / n)
               AS DECIMAL(18,8)) AS DOUBLE)
           ELSE CAST(NULL AS DOUBLE) END AS mde_rel
    FROM m
    """,
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum detectable effect at 80% power / 5% two-sided alpha for
    the per-user revenue metric, per variant: MDE = (z_a + z_b) *
    sqrt(2 sigma^2 / n) — the experiment-DESIGN calculator every A/B
    platform shows before launch ("with this traffic, what lift could
    we even see?"), completing the readout suite (ab_ttest_welch
    analyzes; this sizes).

    Parity: moments are exact decimal sums; z constants are pinned
    literals CAST to DOUBLE in the oracle (decimal-literal trap); the
    variance expression is the ab_ratio_delta_ci mirrored chain, and
    the final MDE — which multiplies a sum of constants by a sqrt (an
    a*b shape adjacent to the variance's product-difference) —
    QUANTIZES through DECIMAL(18,8) on both sides to blanket any
    contraction of the inner n*(sy/n)*(sy/n) term (the ts_hurst_rs
    class; var_y itself matched raw in ab_ratio_delta_ci, the quantize
    here is defense in depth on the composed expression).

    Scale shape: per-user collapse then two 3-number moment buffers —
    control-plane arithmetic. Flat.
    """
    ev = load(spark, sf_dir, "events")
    units = ev.groupBy("user_id").agg(
        F.expr(
            """CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"""
        ).alias("y"),
    ).select(F.expr("user_id % 2").alias("variant"), "y")
    m = units.groupBy("variant").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE)").alias("sy"),
        F.expr(
            "CAST(SUM(CAST(y AS DECIMAL(38,2)) * CAST(y AS DECIMAL(38,2)))"
            " AS DOUBLE)"
        ).alias("syy"),
    )
    mde_core = (
        "(1.96D + 0.8416D)"
        " * sqrt(2.0D * ((syy - n * (sy / n) * (sy / n)) / (n - 1)) / n)"
    )
    return m.select(
        F.col("variant").cast("bigint").alias("variant"),
        "n",
        F.expr("sy / n").alias("mean_y"),
        F.expr("(syy - n * (sy / n) * (sy / n)) / (n - 1)").alias("var_y"),
        F.expr(f"CAST(CAST({mde_core} AS DECIMAL(18,8)) AS DOUBLE)").alias(
            "mde_abs"
        ),
        # Degenerate guard (r8 sparse-corpus probe): a zero-mean metric
        # (no purchase events) has no relative MDE - NULL, not an ANSI
        # divide-by-zero.
        F.expr(
            f"CASE WHEN sy / n <> 0.0D THEN"
            f" CAST(CAST({mde_core} / (sy / n) AS DECIMAL(18,8)) AS DOUBLE)"
            f" ELSE CAST(NULL AS DOUBLE) END"
        ).alias("mde_rel"),
    )


@query(
    "ab_ks_two_sample",
    oracle=f"""
    WITH units AS ({_USER_METRIC_DUCK}),
    pts AS (
        SELECT y,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) OVER (
                   ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) OVER (
                   ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS c1,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) OVER ()
                   AS BIGINT) AS n0,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) OVER ()
                   AS BIGINT) AS n1
        FROM units
    ),
    gaps AS (
        SELECT n0, n1,
               abs(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) AS gap
        FROM pts
    )
    SELECT MAX(n0) AS n0, MAX(n1) AS n1,
           CAST(MAX(gap) AS DOUBLE) AS ks_d,
           CAST(CAST(1.358 AS DOUBLE)
                * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
                       / (CAST(MAX(n0) AS DOUBLE) * MAX(n1)))
                AS DOUBLE) AS crit_5pct,
           CAST(MAX(gap) AS DOUBLE)
               > CAST(1.358 AS DOUBLE)
                 * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
                        / (CAST(MAX(n0) AS DOUBLE) * MAX(n1)))
               AS reject_5pct
    FROM gaps
    """,
)
def ab_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on the per-user revenue
    distributions of control vs treatment: D = max ECDF gap, compared
    against the 5% asymptotic critical value 1.358*sqrt((n0+n1)/(n0*n1))
    — the DISTRIBUTION-level A/B check that catches shape changes
    (variance, tails, bimodality) a mean test like ab_ttest_welch is
    blind to.

    Tie handling (RESTATED r8 — the degenerate-corpus probe caught the
    old ROWS-framed cumulative): the ECDF is a function of the VALUE,
    so cumulative counts must include the entire tied run at every tie
    row — RANGE framing (peers included), the tie-collapsed ECDF. The
    previous ROWS framing made mid-run counts depend on the engine's
    arbitrary ordering of tied rows, which could both overstate D
    (spurious mid-run gaps — a false rejection risk on tie-heavy
    metrics like zero-revenue users) and diverge between engines (it
    did, on the constant-value corpus). Pre-r8 driver rows are
    disavowed (registry.DISAVOWED_THROUGH).

    Parity: cumulative counts are exact integer window sums, now
    order-independent by construction (RANGE frames see identical peer
    sets in both engines); each ECDF step is one correctly-rounded
    division; the
    critical value's literals are CAST to DOUBLE in the oracle and its
    sqrt chain has no FMA shape. Nothing to quantize.

    Scale shape: the per-user collapse absorbs event volume; the pooled
    cumulative rides the user grid single-partition (documented bound:
    users-per-experiment; at 100 TB swap the exact ECDF for the binned
    one, CERTIFIED as the sibling key ab_ks_binned — a domain grid in
    the validate_psi_drift style, losing nothing at the 1e-3 D
    resolution a readout needs). One exchange.
    """
    ev = load(spark, sf_dir, "events")
    units = ev.groupBy("user_id").agg(
        F.expr(
            """CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"""
        ).alias("y"),
    ).select(F.expr("user_id % 2").alias("variant"), "y")
    pts = units.select(
        F.expr(
            """CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) OVER (
               ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT)"""
        ).alias("c0"),
        F.expr(
            """CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) OVER (
               ORDER BY y RANGE BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS BIGINT)"""
        ).alias("c1"),
        F.expr(
            "CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) OVER ()"
            " AS BIGINT)"
        ).alias("n0"),
        F.expr(
            "CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) OVER ()"
            " AS BIGINT)"
        ).alias("n1"),
    )
    gaps = pts.select(
        "n0",
        "n1",
        F.expr(
            "abs(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)"
        ).alias("gap"),
    )
    crit = (
        "CAST(1.358D * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)"
        " / (CAST(MAX(n0) AS DOUBLE) * MAX(n1))) AS DOUBLE)"
    )
    return gaps.agg(
        F.expr("MAX(n0)").alias("n0"),
        F.expr("MAX(n1)").alias("n1"),
        F.expr("CAST(MAX(gap) AS DOUBLE)").alias("ks_d"),
        F.expr(crit).alias("crit_5pct"),
        F.expr(f"CAST(MAX(gap) AS DOUBLE) > {crit}").alias("reject_5pct"),
    )


# Binned-ECDF resolution for ab_ks_binned: the per-user revenue metric
# lives in [0, ~2000], so 25-unit bins bound the ECDF grid at ~80 cells
# regardless of user count — the D statistic is then resolved to the max
# within-bin ECDF movement, far finer than the 1e-3 a readout needs.
KS_BIN_WIDTH = 25.0


@query(
    "ab_ks_binned",
    oracle=f"""
    WITH units AS ({_USER_METRIC_DUCK}),
    binned AS (
        SELECT CAST(FLOOR(y / {KS_BIN_WIDTH}) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS b0,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS b1
        FROM units GROUP BY 1
    ),
    cum AS (
        SELECT CAST(SUM(b0) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c0,
               CAST(SUM(b1) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c1,
               CAST(SUM(b0) OVER () AS BIGINT) AS n0,
               CAST(SUM(b1) OVER () AS BIGINT) AS n1
        FROM binned
    ),
    gaps AS (
        SELECT n0, n1,
               abs(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) AS gap
        FROM cum
    )
    SELECT MAX(n0) AS n0, MAX(n1) AS n1,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM binned) AS n_bins,
           CAST(MAX(gap) AS DOUBLE) AS ks_d,
           CAST(CAST(1.358 AS DOUBLE)
                * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
                       / (CAST(MAX(n0) AS DOUBLE) * MAX(n1)))
                AS DOUBLE) AS crit_5pct,
           CAST(MAX(gap) AS DOUBLE)
               > CAST(1.358 AS DOUBLE)
                 * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)
                        / (CAST(MAX(n0) AS DOUBLE) * MAX(n1)))
               AS reject_5pct
    FROM gaps
    """,
)
def ab_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS — the 100 TB-safe sibling of ab_ks_two_sample
    (VERDICT r4 item 4), evaluating the ECDF gap at fixed
    {KS_BIN_WIDTH}-unit bin edges instead of at every pooled observation.
    ab_ks_two_sample's docstring names exactly this swap for the scale
    where the pooled single-partition cumulative becomes the bound; the
    statistic it computes (sup gap over bin edges) is a deterministic
    lower bound of exact D with resolution = the largest within-bin ECDF
    movement, which a fixed domain grid makes arbitrarily tunable.

    Scale shape: the per-user collapse absorbs event volume (partial-agg
    exchange on user_id), the bin collapse absorbs user volume (partial-agg
    exchange on ~80 DOMAIN-bounded bins), and the only unpartitioned
    window rides that bin grid — O(domain/width) rows regardless of data
    size, the same bounded-grid discipline as validate_psi_drift. Exact
    ECDF parallelism never enters.

    Parity: bin ids are FLOOR on identical correctly-rounded doubles; all
    counts and cumulatives are exact integers; each ECDF step is one
    correctly-rounded division on identical operands; the critical-value
    chain matches ab_ks_two_sample's pinned-literal form. Nothing to
    quantize."""
    ev = load(spark, sf_dir, "events")
    units = ev.groupBy("user_id").agg(
        F.expr(
            """CAST(coalesce(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(38,2)) END), 0.0) AS DOUBLE)"""
        ).alias("y"),
    ).select(F.expr("user_id % 2").alias("variant"), "y")
    binned = units.groupBy(
        F.expr(f"CAST(FLOOR(y / {KS_BIN_WIDTH}) AS BIGINT)").alias("b")
    ).agg(
        F.expr(
            "CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("b0"),
        F.expr(
            "CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("b1"),
    )
    cum = binned.select(
        F.expr(
            "CAST(SUM(b0) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)"
            " AS BIGINT)"
        ).alias("c0"),
        F.expr(
            "CAST(SUM(b1) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)"
            " AS BIGINT)"
        ).alias("c1"),
        F.expr("CAST(SUM(b0) OVER () AS BIGINT)").alias("n0"),
        F.expr("CAST(SUM(b1) OVER () AS BIGINT)").alias("n1"),
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n_bins"),
    )
    gaps = cum.select(
        "n0",
        "n1",
        "n_bins",
        F.expr(
            "abs(CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)"
        ).alias("gap"),
    )
    crit = (
        "CAST(1.358D * sqrt(CAST(MAX(n0) + MAX(n1) AS DOUBLE)"
        " / (CAST(MAX(n0) AS DOUBLE) * MAX(n1))) AS DOUBLE)"
    )
    return gaps.agg(
        F.expr("MAX(n0)").alias("n0"),
        F.expr("MAX(n1)").alias("n1"),
        F.expr("MAX(n_bins)").alias("n_bins"),
        F.expr("CAST(MAX(gap) AS DOUBLE)").alias("ks_d"),
        F.expr(crit).alias("crit_5pct"),
        F.expr(f"CAST(MAX(gap) AS DOUBLE) > {crit}").alias("reject_5pct"),
    )
