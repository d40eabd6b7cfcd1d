"""Regression tests for the three round-10 ADVICE items, fixed in round 11.

1. (low) llm_sim_search_route's NULL-ch_ratio branch routed the
   n <= k_cells degenerate (with K >= 2) to 'banded' while the docstring
   pinned 'K < 2 or n <= K -> exact'. Parity held (both engines agreed),
   but documented behavior and code disagreed. Fixed by splitting the
   branch in BOTH engines: NULL ch with (K >= 2 AND n > K) -> 'banded'
   (the within=0 perfectly-clustered pin), anything else NULL -> 'exact'.
2. (low) tools/midpoint_hunt_thin.stage() reused the /tmp staging dir
   across runs and copied side tables only if absent, so re-running with
   a different --src could mix fixtures; and an empty thin table crashed
   opaquely (pc.max on zero rows -> unit None). Now rmtree-then-stage and
   an explicit SystemExit on the empty case.
3. (low) operators/graph.py's clustering-ratio comment claimed DECIMAL
   headroom 'up to 1e28 triangles' that the upstream BIGINT counts can
   never reach; comment tightened to the BIGINT-bounded range (comment-
   only — no test).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _stage_fixture_with_embeddings(tmp_path, rows):
    """tmp sf-dir: symlink every smoke table, replace embeddings with the
    given (vec_id, embedding, label) rows in the fixture's exact schema."""
    for f in os.listdir(SF_SMOKE):
        os.symlink(os.path.join(SF_SMOKE, f), str(tmp_path / f))
    os.unlink(str(tmp_path / "embeddings.parquet"))
    t = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    return str(tmp_path)


def test_route_n_le_k_degenerate_is_exact(spark, tmp_path):
    """n = K = 3 (one row per label, spread points so within > 0 is moot:
    each singleton cell has within = 0, so ch_ratio is NULL). The old
    branch read K >= 2 -> 'banded'; the documented pin — and now the
    code, in BOTH engines — is n <= K -> 'exact'. Differential parity
    plus a direct route assertion so the guard holds even if the oracle
    SQL were edited in the same bad direction."""
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 1),
        (3, [0.0, 0.0, 1.0, 0.0], 2),
    ]
    sf = _stage_fixture_with_embeddings(tmp_path, rows)

    from tests.oracle import compare_to_oracle

    compare_to_oracle(spark, "llm_sim_search_route", sf)

    from bitcoin_price_etl_spark.registry import load_all

    out = load_all()["llm_sim_search_route"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 3
    assert out[0]["k_cells"] == 3
    assert out[0]["ch_ratio"] is None
    assert out[0]["route"] == "exact"


def test_route_within_zero_n_gt_k_stays_banded(spark, tmp_path):
    """The within = 0 pin with n > K must still read 'banded' (perfectly
    clustered, CH = +inf): two labels, two identical points per label."""
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.0, 1.0], 1),
    ]
    sf = _stage_fixture_with_embeddings(tmp_path, rows)

    from tests.oracle import compare_to_oracle

    compare_to_oracle(spark, "llm_sim_search_route", sf)

    from bitcoin_price_etl_spark.registry import load_all

    out = load_all()["llm_sim_search_route"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 4
    assert out[0]["k_cells"] == 2
    assert out[0]["ch_ratio"] is None
    assert out[0]["route"] == "banded"


def test_midpoint_thin_stage_restages_clean(tmp_path):
    """stage() must rmtree a pre-existing output dir (no stale side-table
    mixing) and die loudly on an empty thin table."""
    from tools.midpoint_hunt_thin import stage

    out = tmp_path / "staged"
    src = SF_SMOKE
    meta = stage(src, mult=2, suppliers=10, out=out)
    assert meta["staged_rows"] == 2 * meta["thin_rows"]

    # plant a sentinel file; a clean re-stage must remove it
    sentinel = out / "stale_marker"
    sentinel.write_text("stale")
    stage(src, mult=2, suppliers=10, out=out)
    assert not sentinel.exists()

    # empty thin table (no supplier below the min key) -> explicit
    # SystemExit instead of the old opaque None-arithmetic crash
    with pytest.raises(SystemExit):
        stage(src, mult=2, suppliers=-1, out=out)
