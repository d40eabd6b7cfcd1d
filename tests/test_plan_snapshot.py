"""Plan-shape lock: every registry key's physical-plan movement/join/agg
node counts must match plans_snapshot.json exactly. Timing noise can't
trip this; only a real plan change can — regenerate deliberately with
`python -m tests.plan_snapshot_tool` and review the diff."""

from __future__ import annotations

import json

import pytest

from bitcoin_price_etl_spark.registry import load_all
from tests.plan_snapshot_tool import SNAPSHOT_PATH, SF_DIR, plan_props


def _snapshot() -> dict:
    with open(SNAPSHOT_PATH) as f:
        return json.load(f)


def test_snapshot_covers_registry():
    snap = _snapshot()
    missing = sorted(set(load_all()) - set(snap))
    assert not missing, f"regenerate plans_snapshot.json; missing: {missing}"


@pytest.mark.parametrize("key", sorted(load_all()))
def test_plan_shape_unchanged(spark, key):
    snap = _snapshot()
    if key not in snap:
        pytest.skip("new key; regenerate snapshot")
    actual = plan_props(load_all()[key].fn(spark, SF_DIR))
    assert actual == snap[key], (
        f"{key}: plan shape drifted.\n  locked: {snap[key]}\n  actual: {actual}\n"
        "If intentional: python -m tests.plan_snapshot_tool"
    )
