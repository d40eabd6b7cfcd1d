"""Golden reference-fidelity test (SURVEY.md §5): the replayed BPI/OER
pipeline must reproduce the reference's 15-column bpi_xr_hourly schema and
values exactly (reference dags/bpi_etl/bpi_etl_bigquery.py:195-242)."""

from __future__ import annotations

from bitcoin_price_etl_spark.plans.golden import BATCH_TIME, golden_pipeline

EXPECTED_COLUMNS = [
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
]


def test_golden_schema_order(spark):
    df = golden_pipeline(spark)
    assert df.columns == EXPECTED_COLUMNS


def test_golden_values_first_row(spark):
    rows = {r["time_updated"]: r for r in golden_pipeline(spark).collect()}
    assert len(rows) == 24
    r0 = rows["2022-12-18 00:00:00"]
    # R15: both time columns reformatted to '%Y-%m-%d %H:%M:%S', tz dropped
    assert r0["time_updated_iso"] == "2022-12-18 00:00:00"
    # projection keeps code/description/rate_float, drops symbol/rate (R10)
    assert r0["bpi_usd_code"] == "USD"
    assert r0["bpi_usd_description"] == "United States Dollar"
    assert r0["bpi_usd_rate_float"] == 17000.0
    assert r0["bpi_gbp_rate_float"] == 17000.0 * 0.82
    assert r0["bpi_eur_rate_float"] == 17000.0 * 0.94
    # R13 scalar enrichment: usd_rate × rates.IDR (bpi_etl_bigquery.py:225)
    assert r0["bpi_idr_rate_float"] == 17000.0 * 15600.5
    # R16 audit column (deterministic batch-time variant)
    assert r0["last_updated"] == BATCH_TIME
    assert r0["chart_name"] == "Bitcoin"


def test_golden_nullability_pins(spark):
    """Only disclaimer/chart_name may be nullable downstream (R17,
    bpi_etl_bigquery.py:242): every other column must be fully populated."""
    df = golden_pipeline(spark)
    non_nullable = [c for c in EXPECTED_COLUMNS if c not in ("disclaimer", "chart_name")]
    for c in non_nullable:
        assert df.filter(df[c].isNull()).count() == 0, f"{c} has nulls"


def test_quarantine_fixtures(spark):
    """Each malformed document (FIXTURES.md §B quarantine fixtures) must be
    caught by the matching constraint, mirroring the Pydantic validators
    (common_module/pydantic_models.py:26-34,37,49,62-70)."""
    import json

    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.sources.scans import BPI_SCHEMA, OER_SCHEMA

    good = {
        "time": {
            "updated": "Dec 18, 2022 07:00:00 UTC",
            "updatedISO": "2022-12-18T07:00:00+00:00",
        },
        "disclaimer": "x",
        "chartName": "Bitcoin",
        "bpi": {
            "USD": {"code": "USD", "description": "d", "rate_float": 1.0},
            "GBP": {"code": "GBP", "description": "d", "rate_float": 1.0},
            "EUR": {"code": "EUR", "description": "d", "rate_float": 1.0},
        },
    }
    bad_code = json.loads(json.dumps(good))
    bad_code["bpi"]["USD"]["code"] = "US"
    bad_chart = json.loads(json.dumps(good))
    bad_chart["chartName"] = "Ethereum"
    bad_updated = json.loads(json.dumps(good))
    bad_updated["time"]["updated"] = "2022/12/18 07:00"

    docs = [(json.dumps(d),) for d in (good, bad_code, bad_chart, bad_updated)]
    raw = spark.createDataFrame(docs, "payload string")
    parsed = raw.select(F.from_json("payload", BPI_SCHEMA).alias("d"))
    # the constraint gate of plans/validate.py, applied to the BPI contract
    # try_to_timestamp: ANSI mode (Spark 4 default) raises on parse failure;
    # a constraint gate must classify, not crash (the engine stance of
    # plans/validate.py vs the reference's Pydantic raise)
    ok = parsed.filter(
        (F.length(F.trim("d.bpi.USD.code")) == 3)
        & (F.col("d.chartName") == "Bitcoin")
        & F.try_to_timestamp(
            F.col("d.time.updated"), F.lit("MMM dd, yyyy HH:mm:ss z")
        ).isNotNull()
    )
    assert ok.count() == 1

    # OER contract: literal license URL + epoch int + IDR present
    oer_good = {
        "disclaimer": "x",
        "license": "https://openexchangerates.org/license",
        "timestamp": 1671321600,
        "base": "USD",
        "rates": {"IDR": 15600.5},
    }
    oer_bad_license = dict(oer_good, license="https://example.com")
    oer_missing_idr = dict(oer_good, rates={"USD": 1.0})
    raw2 = spark.createDataFrame(
        [(json.dumps(d),) for d in (oer_good, oer_bad_license, oer_missing_idr)],
        "payload string",
    )
    parsed2 = raw2.select(F.from_json("payload", OER_SCHEMA).alias("d"))
    ok2 = parsed2.filter(
        (F.col("d.license") == "https://openexchangerates.org/license")
        & F.col("d.timestamp").isNotNull()
        & F.element_at("d.rates", "IDR").isNotNull()
    )
    assert ok2.count() == 1
