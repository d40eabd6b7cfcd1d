"""Plan-shape snapshot: per-registry-key physical-plan properties locked
into plans_snapshot.json.

Timing regressions hide in host noise (BASELINE.md: ±20-50% per session);
plan-SHAPE regressions don't — an extra Exchange, a BroadcastHashJoin
degrading to BroadcastNestedLoopJoin, or a new CartesianProduct is
deterministic at fixed Spark version/config/data. This tool extracts those
counts for every registry key at sf0.001; tests/test_plan_snapshot.py
fails on any drift so a plan change must be intentional (regenerate with
`python -m tests.plan_snapshot_tool`).

Counts parse the detail section of explain("formatted") — lines of the
form `(N) NodeName …` name each physical node exactly once, so the
recorded numbers ARE node counts (the earlier substring scheme counted
every node twice and let ReusedExchange inflate the Exchange total —
round-2 ADVICE). ReusedExchange is tracked as its own property so a
Reuse→real-Exchange regression changes TWO counters and cannot cancel
out.
"""

from __future__ import annotations

import io
import json
import os
import re
from contextlib import redirect_stdout

SNAPSHOT_PATH = os.path.join(os.path.dirname(__file__), "plans_snapshot.json")

# node types worth locking: data movement + join strategy + scan count.
# Labels are matched as whole node names at line starts, so "Exchange"
# never absorbs BroadcastExchange/ReusedExchange and "Window" never
# absorbs WindowGroupLimit.
PROPS = (
    "Exchange",
    "BroadcastExchange",
    "ReusedExchange",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "HashAggregate",
    "SortAggregate",
    "Window",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "Scan parquet",
)

# keys whose fn() is driver-interactive (iterative loops, collected control
# plane, real streaming/side-effecting sinks): their plan is assembled from
# multiple jobs, so a single final-frame snapshot under-describes them —
# still locked, just noted.
SF_DIR = "/root/testdata/sf0.001"


def plan_props(df) -> dict[str, int]:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    counts = {}
    for p in PROPS:
        # detail-section node headers: "(12) NodeName" (optionally followed
        # by "[codegen id : n]", a table identifier, etc.); the negative
        # lookahead keeps prefixes from matching longer node names
        pat = re.compile(rf"^\(\d+\) {re.escape(p)}(?![A-Za-z])", re.M)
        counts[p] = len(pat.findall(plan))
    return {k: v for k, v in counts.items() if v}


def build_snapshot(spark) -> dict[str, dict[str, int]]:
    from bitcoin_price_etl_spark.registry import load_all

    snap = {}
    for key, spec in sorted(load_all().items()):
        snap[key] = plan_props(spec.fn(spark, SF_DIR))
    return snap


def main() -> None:
    from bitcoin_price_etl_spark.session import get_spark

    spark = get_spark("plan-snapshot", cpus=8)
    snap = build_snapshot(spark)
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snap, f, indent=1, sort_keys=True)
    print(f"wrote {SNAPSHOT_PATH} ({len(snap)} keys)")
    spark.stop()


if __name__ == "__main__":
    main()
