"""Regression tests for round-11 degenerate-axis catches.

The sparse axis staged FROM sf0.1 (VERDICT r10 item 3 —
DEGENERATE_SPARSE_sf01_r11.json) found one real crash the fixture-scale
sparse corpus could not reach: `ab_cuped_adjust` divided by the
pre-period covariate's variance unguarded, and the sf0.1-staged skeletal
corpus's 200 surviving events all land on one side of the CUPED split —
every unit's x identical, theta = 0/0, ANSI DIVIDE_BY_ZERO. The repair
(operators/experiments.py): theta falls back to 0 when var(x) = 0 (a
constant covariate carries no information and its adjustment term is
identically zero, so mean_cuped degenerates to mean_post — the standard
CUPED convention), and corr² is NULL when either variance is zero.
These tests pin the guard on a purpose-built constant-covariate corpus,
in both engines.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from tests.oracle import compare_to_oracle

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
)


def _stage_post_only_events(out_dir):
    """All events shifted AFTER the CUPED split: every unit's pre-period
    covariate x is exactly 0 — the zero-variance regime that crashed."""
    ev = pq.read_table(f"{SRC}/events.parquet")
    idx = ev.schema.get_field_index("ts")
    shifted = pc.assume_timezone(
        pa.array(
            [pa.scalar("2025-06-01 00:00:00").cast(pa.timestamp("us"))]
            * len(ev)
        ).cast(pa.timestamp("us")),
        "UTC",
    ).cast(ev.field(idx).type)
    ev = ev.set_column(idx, ev.field(idx), shifted)
    pq.write_table(ev, f"{out_dir}/events.parquet")
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
    return str(out_dir)


def test_cuped_zero_variance_covariate_no_crash(spark, tmp_path):
    d = _stage_post_only_events(tmp_path)
    from bitcoin_price_etl_spark.registry import load_all

    rows = load_all()["ab_cuped_adjust"].fn(spark, d).collect()
    assert len(rows) == 2  # both variants survive
    for r in rows:
        # constant covariate => zero adjustment, undefined corr²
        assert r["mean_cuped"] == r["mean_post"], r
        assert r["var_reduction"] is None, r


def test_cuped_zero_variance_covariate_oracle_parity(spark, tmp_path):
    d = _stage_post_only_events(tmp_path)
    compare_to_oracle(spark, "ab_cuped_adjust", d)


def test_cuped_unchanged_on_plain_fixture(spark, sf_dir):
    """The guard must not move any value where variances are healthy —
    plain-fixture parity is the no-regression half of the fix."""
    compare_to_oracle(spark, "ab_cuped_adjust", sf_dir)
