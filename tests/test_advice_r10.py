"""Regression tests for the three round-9 ADVICE items, fixed in round 10.

1. (high) validate_benford's n_total cast was DECIMAL(20,0): the Spark
   product type 20+18+1 = 39 digits overflowed the 38-digit cap, so Spark
   silently demoted to DECIMAL(38,7) and HALF_UP-rounded at the 7th
   decimal while the DuckDB oracle kept the exact DECIMAL(38,8) product —
   a latent cross-engine divergence for any n_total not a multiple of 10
   (all prior fixtures happened to end in 00). Fixed by casting to
   DECIMAL(19,0) on BOTH sides (product type (38,8), no demotion).
2. (low) exprs.literal_rows_df raised AnalysisException on an empty rows
   list (inline over a zero-element array<null>); now returns the same
   empty frame createDataFrame([], schema) would.
3. (low) llm_sim_search_ivf_escalate could probe FEWER cells than base
   IVF on a skewed corpus whose top cell holds >= the 0.6 mass cap;
   now floored at min(3, n_cells) cells (_escalate_probe_labels).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import SF_SMOKE


def _stage_fixture_with_orders(tmp_path, prices):
    """tmp sf-dir: symlink every smoke table, replace orders with a
    1-column o_totalprice frame (validate_benford and its oracle touch
    only that column)."""
    for f in os.listdir(SF_SMOKE):
        os.symlink(os.path.join(SF_SMOKE, f), str(tmp_path / f))
    os.unlink(str(tmp_path / "orders.parquet"))
    t = pa.table({"o_totalprice": pa.array(prices, pa.float64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_benford_nonround_total_matches_oracle(spark, tmp_path):
    """n_total = 1437 (the ADVICE counterexample: not a multiple of 10,
    digit-4 expectation 1437 x 0.09691001 = 139.25968437 lands past the
    7th decimal). Full differential parity vs the DuckDB oracle PLUS a
    direct assertion of the exact expected double, so the guard holds
    even if the oracle SQL is edited in the same bad direction."""
    n = 1437
    # spread leading digits 1..9; all > 0 so every row counts in n_total
    prices = [float((1 + i % 9) * 10 ** (i % 3)) + 0.25 for i in range(n)]
    sf = _stage_fixture_with_orders(tmp_path, prices)

    from tests.oracle import compare_to_oracle

    compare_to_oracle(spark, "validate_benford", sf)

    from bitcoin_price_etl_spark.registry import load_all

    rows = load_all()["validate_benford"].fn(spark, sf).collect()
    by_digit = {r["digit"]: r for r in rows}
    # p(4) = log10(1.25) quantized to DECIMAL(18,8) = 0.09691001 exactly;
    # 1437 * 0.09691001 = 139.25968437 exactly in DECIMAL(38,8). The
    # old (20,0) cast demoted to (38,7) and read 139.2596844.
    assert by_digit[4]["n_expected"] == 139.25968437
    assert by_digit[4]["p_benford"] == 0.09691001


def test_literal_rows_df_empty_rows(spark):
    """Drop-in parity with createDataFrame for the zero-row case."""
    from bitcoin_price_etl_spark.exprs import literal_rows_df

    schema = "a INT, b STRING, c DOUBLE"
    df = literal_rows_df(spark, [], schema)
    assert df.count() == 0
    assert df.schema == spark.createDataFrame([], schema).schema


def test_literal_rows_df_nonempty_schema_and_values(spark):
    """The non-empty path still matches createDataFrame values/columns."""
    from bitcoin_price_etl_spark.exprs import literal_rows_df

    schema = "a INT, b STRING, c DOUBLE"
    rows = [(1, "x", 2.5), (None, None, None)]
    got = literal_rows_df(spark, rows, schema)
    want = spark.createDataFrame(rows, schema)
    assert got.columns == want.columns
    assert [f.dataType for f in got.schema.fields] == [
        f.dataType for f in want.schema.fields
    ]
    assert sorted(map(tuple, got.collect()), key=repr) == sorted(
        map(tuple, want.collect()), key=repr
    )


def test_escalate_probe_floor_on_skewed_cells():
    """The ADVICE counterexample, unit-level: top-ranked cell alone holds
    70% of mass (>= the 0.6 cap) — a pure mass cut probes 1 cell; the
    floored selector must probe min(3, n_cells) so escalate's cell set
    is a superset of base IVF's nprobe=3 prefix."""
    from bitcoin_price_etl_spark.llm.simsearch import _escalate_probe_labels

    ranked = [(0, 280), (1, 40), (2, 40), (3, 40)]
    got = _escalate_probe_labels(ranked, 400)
    assert got == [0, 1, 2]

    # balanced cells: mass cap binds AFTER the floor (4 of 8 cells = 0.5
    # < 0.6 -> takes a 5th), floor never truncates the escalation
    ranked = [(i, 100) for i in range(8)]
    assert _escalate_probe_labels(ranked, 800) == [0, 1, 2, 3, 4]

    # fewer cells than the base nprobe: floor clamps to n_cells
    assert _escalate_probe_labels([(7, 10)], 10) == [7]

    # recall-monotonicity property: for any skew profile the probed set
    # is a superset of the base nprobe=3 ranking prefix
    for counts in ([900, 50, 25, 25], [10, 10, 10, 970], [250] * 4):
        ranked = list(enumerate(counts))
        got = _escalate_probe_labels(ranked, sum(counts))
        assert got[: min(3, len(ranked))] == [
            label for label, _ in ranked[: min(3, len(ranked))]
        ]


def test_escalate_skewed_corpus_end_to_end(spark, tmp_path):
    """End-to-end on a corpus built to trip the old bug: label 0 holds
    70% of rows clustered around the query vector, labels 1-3 hold 10%
    each around far centroids. Escalate must return full TOP_K rows and
    its recall vs exact top-k must be >= base IVF's (the property the
    floor restores by construction)."""
    rng = np.random.RandomState(3)
    dim, n0, nrest = 64, 280, 120
    cent = rng.standard_normal((4, dim))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    labels = np.concatenate(
        [np.zeros(n0, np.int32), np.repeat([1, 2, 3], nrest // 3).astype(np.int32)]
    )
    emb = (cent[labels] + 0.03 * rng.standard_normal((len(labels), dim))).astype(
        np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(labels)), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    from bitcoin_price_etl_spark.registry import load_all

    reg = load_all()
    exact = [
        r["vec_id"] for r in reg["llm_sim_search"].fn(spark, str(tmp_path)).collect()
    ]
    ivf = {
        r["vec_id"]
        for r in reg["llm_sim_search_ivf"].fn(spark, str(tmp_path)).collect()
    }
    esc_rows = reg["llm_sim_search_ivf_escalate"].fn(spark, str(tmp_path)).collect()
    esc = {r["vec_id"] for r in esc_rows}
    assert len(esc_rows) == 10
    r_ivf = len(ivf & set(exact)) / len(exact)
    r_esc = len(esc & set(exact)) / len(exact)
    assert r_esc >= r_ivf, (r_esc, r_ivf)
