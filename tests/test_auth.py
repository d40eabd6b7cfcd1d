"""Authenticated-source secret handling (R2): credential resolution,
masking, and the server-side symbols projection — the reference's
auth_params shape (bpi_etl_bigquery.py:120-128) as engine protocol."""

from __future__ import annotations

import json

import pytest

from bitcoin_price_etl_spark.sources.auth import (
    OER_APP_ID_ENV,
    RestAuth,
    fetch_oer_historical,
    rest_auth_from_env,
)


SECRET = "sk-live-abcd1234wxyz"


def test_env_credential_reaches_request_params_only(monkeypatch):
    monkeypatch.setenv(OER_APP_ID_ENV, SECRET)
    auth = rest_auth_from_env(symbols=("IDR",))
    assert auth.request_params() == {"app_id": SECRET, "symbols": "IDR"}


def test_masked_views_never_contain_the_secret(monkeypatch):
    monkeypatch.setenv(OER_APP_ID_ENV, SECRET)
    auth = rest_auth_from_env(symbols=("IDR", "EUR"))
    assert SECRET not in repr(auth)  # dataclass repr excludes the field
    assert SECRET not in str(auth.masked())
    assert auth.masked() == {"app_id": "****wxyz", "symbols": "IDR,EUR"}


def test_fixture_key_offline_default(monkeypatch):
    monkeypatch.delenv(OER_APP_ID_ENV, raising=False)
    auth = rest_auth_from_env()
    assert auth.request_params()["app_id"]  # hermetic sandbox still works


def test_missing_credential_is_rejected():
    with pytest.raises(PermissionError):
        fetch_oer_historical("2022-12-18", RestAuth(app_id="", symbols=("IDR",)))


def test_symbols_projection_filters_server_side():
    """The response must contain ONLY the projected symbols — proof the
    pipeline runs against the filtered payload (REST pushdown), not the
    full upstream rates table."""
    doc = json.loads(
        fetch_oer_historical("2022-12-18", RestAuth(app_id="k", symbols=("IDR", "JPY")))
    )
    assert set(doc["rates"]) == {"IDR", "JPY"}
    solo = json.loads(
        fetch_oer_historical("2022-12-18", RestAuth(app_id="k", symbols=("EUR",)))
    )
    assert set(solo["rates"]) == {"EUR"}


def test_source_rest_authed_rows(spark):
    """End-to-end: the registry key parses the authed fetch into the
    (rate_date, symbol, rate) lookup shape with exactly the projected
    symbols (value parity vs the literal oracle runs in the parity suite)."""
    from bitcoin_price_etl_spark.registry import load_all
    from tests.conftest import SF_SMOKE

    rows = {
        (r.rate_date, r.symbol, r.rate)
        for r in load_all()["source_rest_authed"].fn(spark, SF_SMOKE).collect()
    }
    assert rows == {
        ("2022-12-18", "IDR", 15600.5),
        ("2022-12-18", "EUR", 0.94),
    }
