"""Column-naming and write-key utilities.

Re-expresses two reference behaviors:
- bulk camelCase→snake_case rename (reference
  dags/bpi_etl/bpi_etl_bigquery.py:216-219): '.' → '_', underscore inserted
  at lower→upper boundaries, lowercased. The reference applies this with a
  pandas rename lambda; here it is a pure function applied via df.toDF.
- content-hash + timestamp write prefix (reference
  dags/bpi_etl/bpi_etl_bigquery.py:8-23): md5(bytes)[:6] + '-' + timestamp,
  used to salt object-store keys so lexicographic hot-spotting can't defeat
  store autoscaling. The engine keeps the same recipe for file sinks and
  generalizes the *purpose* to salted partition columns for writes.
"""

from __future__ import annotations

import hashlib
import re

_CAMEL_BOUNDARY = re.compile(r"([a-z0-9])([A-Z])")


def snake_case(name: str) -> str:
    """camelCase / dotted.path → snake_case (reference rename semantics)."""
    name = name.replace(".", "_")
    name = _CAMEL_BOUNDARY.sub(r"\1_\2", name)
    return name.lower()


def snake_case_columns(df):
    """Bulk-rename every column of a DataFrame to snake_case."""
    return df.toDF(*[snake_case(c) for c in df.columns])


def salted_prefix(payload: bytes, ts_str: str) -> str:
    """md5(payload)[:6] + '-' + timestamp — anti-hotspot write key (R8)."""
    return hashlib.md5(payload).hexdigest()[:6] + "-" + ts_str
