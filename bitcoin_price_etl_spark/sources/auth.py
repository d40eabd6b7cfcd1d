"""Authenticated-source secret handling (R2).

The reference authenticates its Open Exchange Rates fetch with a secret
pulled from a masked store and a server-side symbol projection
(reference dags/bpi_etl/bpi_etl_bigquery.py:120-127:
``auth_params = {'app_id': Variable.get('oer_api_key'), 'symbols': 'IDR'}``
— Airflow masks ``oer_api_key`` in logs). The engine equivalent:

- the secret resolves from the ENVIRONMENT at call time
  (``SPARK_GRAFT_OER_APP_ID``) — the sandbox stand-in for Secret
  Manager / cluster-injected secrets; storage config already works this
  way (paths.py / SPARK_GRAFT_STORAGE_BASE), sources now match;
- it is carried in a frozen ``RestAuth`` whose ``repr`` and ``masked()``
  NEVER contain the key, so accidental logging cannot leak it;
- ``symbols`` is a SERVER-SIDE projection: it goes on the wire so the
  endpoint filters before responding. At scale that is the difference
  between shipping ~170 currency rates × every poll and shipping exactly
  the ones the pipeline joins on — pushdown, applied to a REST source.

Offline, ``fetch_oer_historical`` replays a deterministic fixture and
applies the symbol projection exactly as the server would; swapping the
fixture call for ``requests.get(url, params=auth.request_params())`` is
the only production delta.
"""

from __future__ import annotations

import json
import os

from dataclasses import dataclass, field

OER_APP_ID_ENV = "SPARK_GRAFT_OER_APP_ID"

# Deterministic offline stand-in for the secret store value. Real runs set
# the env var; the fixture key keeps the sandbox hermetic.
_FIXTURE_APP_ID = "offline-fixture-app-id"

# The full upstream rates table the "server" holds; the symbols projection
# selects from this before the response leaves the (emulated) server.
_FIXTURE_RATES = {
    "IDR": 15600.5,
    "GBP": 0.82,
    "EUR": 0.94,
    "JPY": 136.7,
    "CHF": 0.929,
}


@dataclass(frozen=True)
class RestAuth:
    """Request auth + projection for an authenticated REST source."""

    app_id: str = field(repr=False)  # never in repr/str — masked only
    symbols: tuple[str, ...] = ("IDR",)

    def request_params(self) -> dict[str, str]:
        """What actually goes on the wire — mirrors the reference's
        auth_params shape (app_id + comma-joined symbols)."""
        return {"app_id": self.app_id, "symbols": ",".join(self.symbols)}

    def masked(self) -> dict[str, str]:
        """Loggable view: key reduced to its last 4 chars behind stars."""
        tail = self.app_id[-4:] if len(self.app_id) >= 4 else ""
        return {"app_id": f"****{tail}", "symbols": ",".join(self.symbols)}


def rest_auth_from_env(
    symbols: tuple[str, ...] = ("IDR",), env: os._Environ | dict = os.environ
) -> RestAuth:
    """Resolve the OER credential the way paths.py resolves storage: env
    var if set (production / driver-injected secret), fixture key
    otherwise (hermetic sandbox)."""
    return RestAuth(app_id=env.get(OER_APP_ID_ENV, _FIXTURE_APP_ID), symbols=symbols)


def fetch_oer_historical(date: str, auth: RestAuth) -> str:
    """Offline twin of ``GET /api/historical/{date}.json?app_id=..&symbols=..``
    (reference :127-128). Enforces the two server behaviors that matter:
    a request without a credential is rejected, and the response contains
    ONLY the projected symbols — so downstream code demonstrably works
    against the filtered payload, not the full table."""
    params = auth.request_params()
    if not params.get("app_id"):
        raise PermissionError("oer: missing app_id (HTTP 401 twin)")
    wanted = [s for s in params["symbols"].split(",") if s]
    rates = {s: _FIXTURE_RATES[s] for s in wanted if s in _FIXTURE_RATES}
    return json.dumps(
        {
            "disclaimer": "synthetic oer fixture (authed path)",
            "license": "https://openexchangerates.org/license",
            "timestamp": 1671321600,
            "base": "USD",
            "rates": rates,
        }
    )
