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
    raw = spark.createDataFrame([(d,) for d in synth_bpi_documents()], "payload string")
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
    raw = spark.createDataFrame([(d,) for d in synth_oer_documents()], "payload string")
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


@query("pipeline_golden", oracle=None)
def pipeline_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry (rows-only: inputs are replay fixtures, not driver
    views). Exact field-by-field assertions live in tests/test_golden.py."""
    return golden_pipeline(spark)
