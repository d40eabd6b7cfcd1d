"""Merge a driver CORRECTNESS_r{N}.json into the verified-key set.

Usage: python -m tools.merge_verified CORRECTNESS_r02.json [...]

A key counts as driver-verified when its row is a full pass
(rows+schema+hash match) or a rows-only-by-design check (err ==
"no_oracle" with a non-null spark row count — the maximal check for keys
without an oracle). Results are unioned into
bitcoin_price_etl_spark/driver_verified.json, which registry.py reads at
import; registry.ordered_keys then rotates the remaining never-verified
keys into the driver's bounded correctness window next round.
"""

from __future__ import annotations

import json
import os
import re
import sys

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "bitcoin_price_etl_spark")
OUT = os.path.join(PKG, "driver_verified.json")


def green_keys(correctness: dict, rnd: int = 0) -> set[str]:
    from bitcoin_price_etl_spark.registry import DISAVOWED_THROUGH

    out = set()
    for key, row in correctness.items():
        if rnd <= DISAVOWED_THROUGH.get(key, -1):
            continue
        full_pass = (
            row.get("rows_match") and row.get("schema_match")
            and row.get("hash_match") and not row.get("err")
        )
        rows_only = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        if full_pass or rows_only:
            out.add(key)
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    existing: set[str] = set()
    if os.path.exists(OUT):
        with open(OUT) as f:
            existing = set(json.load(f))
    added: set[str] = set()
    for path in sys.argv[1:]:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        with open(path) as f:
            added |= green_keys(json.load(f), rnd)
    merged = sorted(existing | added)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"{OUT}: {len(existing)} existing + {len(added - existing)} new "
          f"= {len(merged)} file-tracked verified keys")


if __name__ == "__main__":
    main()
