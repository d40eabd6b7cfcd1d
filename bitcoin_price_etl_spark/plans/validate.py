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
