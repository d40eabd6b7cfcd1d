"""Golden reference-fidelity pipeline (SURVEY.md §5 "Golden pipeline test").

Reproduces the reference's transform chain end-to-end on replayed API
documents, in the exact operator order of
dags/bpi_etl/bpi_etl_bigquery.py:195-234:

    flatten (R9, :195) → name-predicate projection (R10, :198-212) →
    snake_case rename (R11, :216-219) → scalar IDR enrichment BEFORE datetime
    conversion (R13, :223-225) → datetime reformat dropping tz (R15,
    :229-232) → audit column (R16, :234)

producing the 15-column `bpi_xr_hourly` schema of SURVEY.md §1.4, with only
`disclaimer`/`chart_name` nullable (R17, :242).

Where the reference processes ONE document per run, the engine processes a
batch of N snapshots in one DataFrame — the generalization SURVEY.md §1.5
prescribes. The as-of-date XR alignment (R14, :294,:118) becomes a
date-keyed equi-join instead of a per-run scalar fetch.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bitcoin_price_etl_spark.exprs import literal_rows_df
from bitcoin_price_etl_spark.naming import snake_case
from bitcoin_price_etl_spark.registry import query
from bitcoin_price_etl_spark.sources.scans import BPI_SCHEMA, OER_SCHEMA, synth_bpi_documents

# Fixed audit timestamp for determinism: the reference stamps now() at
# transform time (bpi_etl_bigquery.py:234); the engine takes batch time as a
# parameter (R16 "deterministic variant").
BATCH_TIME = "2022-12-18 23:59:59"


def synth_oer_documents() -> list[str]:
    """One OER historical doc for the BPI run date (R14: XR is fetched for
    the BPI run's date key, bpi_etl_bigquery.py:118,125-127)."""
    return [
        json.dumps(
            {
                "disclaimer": "synthetic oer fixture",
                "license": "https://openexchangerates.org/license",
                "timestamp": 1671321600,
                "base": "USD",
                "rates": {"IDR": 15600.5},
                "_date": "2022-12-18",
            }
        )
    ]


def bpi_flat(spark: SparkSession) -> DataFrame:
    """Validated BPI ingest → flatten → projection → rename (R3, R9-R11)."""
    raw = literal_rows_df(
        spark, [(d,) for d in synth_bpi_documents()], "payload string"
    )
    doc = raw.select(F.from_json("payload", BPI_SCHEMA).alias("d"))

    # R10: fixed meta list + per-currency (code, description, rate_float) —
    # the semantic intent of the reference's name-regex (its literal regex is
    # buggy, SURVEY.md §2.1 "latent bugs"; the engine uses the exact list).
    meta = [
        ("d.time.updated", "time.updated"),
        ("d.time.updatedISO", "time.updatedISO"),
        ("d.disclaimer", "disclaimer"),
        ("d.chartName", "chartName"),
    ]
    per_ccy = [
        (f"d.bpi.{ccy}.{field}", f"bpi.{ccy}.{field}")
        for ccy in ("USD", "GBP", "EUR")
        for field in ("code", "description", "rate_float")
    ]
    # R11 snake_case applied to the dotted flattened names, as the reference
    # renames the json_normalize output.
    return doc.select(
        *[F.col(src).alias(snake_case(dotted)) for src, dotted in meta + per_ccy]
    )


def oer_rates(spark: SparkSession) -> DataFrame:
    """Validated OER ingest → (date, idr_rate) lookup table (R12)."""
    raw = literal_rows_df(
        spark, [(d,) for d in synth_oer_documents()], "payload string"
    )
    doc = raw.select(F.from_json("payload", OER_SCHEMA).alias("d"))
    return doc.select(
        F.date_format(F.timestamp_seconds(F.col("d.timestamp")), "yyyy-MM-dd").alias(
            "rate_date"
        ),
        F.element_at(F.col("d.rates"), "IDR").alias("idr_rate"),
    )


def golden_pipeline(spark: SparkSession) -> DataFrame:
    """The full reference transform chain on a batch of snapshots."""
    flat = bpi_flat(spark)
    rates = oer_rates(spark)

    # R14 as-of-date alignment: join each snapshot to its date's rate.
    keyed = flat.withColumn(
        "rate_date",
        F.date_format(F.to_timestamp("time_updated_iso"), "yyyy-MM-dd"),
    )
    enriched = keyed.join(F.broadcast(rates), "rate_date", "left")

    # R13 scalar enrichment BEFORE datetime conversion (order preserved:
    # bpi_etl_bigquery.py:223-225 precedes :229-232).
    enriched = enriched.withColumn(
        "bpi_idr_rate_float", F.col("bpi_usd_rate_float") * F.col("idr_rate")
    )

    # R15 datetime reformat, tz discarded (bpi_etl_bigquery.py:229-232).
    # 'updated' is 'MMM DD, YYYY HH:mm:ss z'; 'updatedISO' is ISO-8601.
    enriched = enriched.withColumn(
        "time_updated",
        F.date_format(
            F.to_timestamp("time_updated", "MMM dd, yyyy HH:mm:ss z"),
            "yyyy-MM-dd HH:mm:ss",
        ),
    ).withColumn(
        "time_updated_iso",
        F.date_format(F.to_timestamp("time_updated_iso"), "yyyy-MM-dd HH:mm:ss"),
    )

    # R16 audit column (deterministic batch-time variant).
    enriched = enriched.withColumn("last_updated", F.lit(BATCH_TIME))

    # Final 15-column schema in reference order (SURVEY.md §1.4).
    return enriched.select(
        "time_updated",
        "time_updated_iso",
        "disclaimer",
        "chart_name",
        "bpi_usd_code",
        "bpi_usd_description",
        "bpi_usd_rate_float",
        "bpi_gbp_code",
        "bpi_gbp_description",
        "bpi_gbp_rate_float",
        "bpi_eur_code",
        "bpi_eur_description",
        "bpi_eur_rate_float",
        "bpi_idr_rate_float",
        "last_updated",
    )


# DuckDB twin of the golden frame (VERDICT r4 item 8): the pipeline's
# inputs are DETERMINISTIC literals (synth_bpi_documents' fixed ramp
# usd = 17000.0 + 13.25*h for h in 0..23, one OER doc with IDR 15600.5,
# pinned BATCH_TIME), so the expected 15-column output is re-derivable in
# pure SQL with no tables — hash-class evidence for the reference-fidelity
# chain instead of rows-only. Float parity is exact by construction: every
# checked double is either bit-exact (17000.0 + 13.25*h — all operands and
# results exactly representable) or ONE correctly-rounded IEEE multiply on
# identical operands (usd*0.82, usd*0.94, usd*15600.5), identical across
# engines with no quantization needed; the oracle forces DOUBLE arithmetic
# up front so DuckDB's decimal-literal inference can't change the path.
_GOLDEN_ORACLE = """
WITH base AS (
    SELECT CAST(h AS BIGINT) AS h,
           CAST(17000.0 AS DOUBLE) + CAST(13.25 AS DOUBLE) * h AS usd
    FROM range(0, 24) t(h)
)
SELECT
    '2022-12-18 ' || printf('%02d', h) || ':00:00' AS time_updated,
    '2022-12-18 ' || printf('%02d', h) || ':00:00' AS time_updated_iso,
    'synthetic replay fixture' AS disclaimer,
    'Bitcoin' AS chart_name,
    'USD' AS bpi_usd_code,
    'United States Dollar' AS bpi_usd_description,
    CAST(usd AS DOUBLE) AS bpi_usd_rate_float,
    'GBP' AS bpi_gbp_code,
    'British Pound Sterling' AS bpi_gbp_description,
    CAST(usd * CAST(0.82 AS DOUBLE) AS DOUBLE) AS bpi_gbp_rate_float,
    'EUR' AS bpi_eur_code,
    'Euro' AS bpi_eur_description,
    CAST(usd * CAST(0.94 AS DOUBLE) AS DOUBLE) AS bpi_eur_rate_float,
    CAST(usd * CAST(15600.5 AS DOUBLE) AS DOUBLE) AS bpi_idr_rate_float,
    '2022-12-18 23:59:59' AS last_updated
FROM base
"""


@query("pipeline_golden", oracle=_GOLDEN_ORACLE)
def pipeline_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry. Inputs are replay fixtures (not driver views), but
    the fixtures are deterministic literals, so a table-free DuckDB twin
    re-derives the expected golden frame and the driver gets hash-class
    evidence (upgraded from rows-only, VERDICT r4 item 8). Exact
    field-by-field assertions additionally live in tests/test_golden.py."""
    return golden_pipeline(spark)
