"""Round-11 optimization guards: every rewrite that moved an operator from
interpreted Catalyst folds to Arrow/numpy must be BIT-identical to the fold
it replaced — these tests pin the equivalences the rewrites rely on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bitcoin_price_etl_spark.llm.simsearch import _emb_matrix, _seq_dot


def _py_fold_dot(a, b) -> float:
    """The reference semantics: aggregate(zip_with(a, b, (x, y) -> x*y),
    0D, (s, v) -> s + v) — a strict sequential left fold from 0.0."""
    s = 0.0
    for x, y in zip(a, b):
        s += float(x) * float(y)
    return s


def test_seq_dot_is_bitexact_sequential_fold():
    """np.cumsum accumulates strictly left-to-right, so _seq_dot must equal
    the per-element Python fold bit-for-bit — including on adversarial
    magnitude mixes where any pairwise/SIMD re-association would differ."""
    rng = np.random.default_rng(7)
    for trial in range(50):
        n = int(rng.integers(1, 513))
        scale = 10.0 ** float(rng.integers(-12, 13))
        a = (rng.random(n) - 0.5) * scale
        b = (rng.random(n) - 0.5) / scale
        want = _py_fold_dot(a, b)
        got = float(_seq_dot(a[None, :], b[None, :])[0])
        assert got == want or (np.isnan(got) and np.isnan(want))
    # 2-D row-wise and 3-D pair-block forms agree with the 1-D fold
    M = (rng.random((64, 33)) - 0.5) * 1e6
    row = _seq_dot(M, M)
    blk = _seq_dot(M[:, None, :], M[None, :, :])
    for i in range(64):
        assert row[i] == _py_fold_dot(M[i], M[i])
        for j in range(0, 64, 17):
            assert blk[i, j] == _py_fold_dot(M[i], M[j])


def test_seq_dot_float32_inputs_match_cast_to_double_fold():
    """Embeddings are array<float>: the fold casts each element to DOUBLE
    before multiplying; _emb_matrix's astype(float64) must reproduce that
    exactly (float32 -> float64 is value-preserving)."""
    rng = np.random.default_rng(11)
    a32 = (rng.random(64, dtype=np.float32) - np.float32(0.5))
    emb = pd.Series([a32, a32[::-1].copy()])
    M = _emb_matrix(emb, 64)
    assert M.dtype == np.float64
    got = _seq_dot(M, M)
    for i, v in enumerate([a32, a32[::-1]]):
        assert got[i] == _py_fold_dot(v.astype(np.float64), v.astype(np.float64))


def test_emb_matrix_null_and_ragged_rows_become_nan():
    """NULL / ragged embeddings map to all-NaN rows: argmin then picks
    index 0 (the smallest cid — the fold form's NULL-dist2 struct-min
    pick) and any cosine involving the row fails the `denom > 0` guard,
    exactly the retired JVM branch's NULL algebra."""
    emb = pd.Series([np.array([1.0, 2.0], dtype=np.float32), None,
                     np.array([3.0], dtype=np.float32)])
    M = _emb_matrix(emb, 2)
    assert M.shape == (3, 2)
    assert np.array_equal(M[0], [1.0, 2.0])
    assert np.isnan(M[1]).all() and np.isnan(M[2]).all()
    d = np.vstack([_seq_dot(M - c, M - c) for c in (M[0], M[0] + 1)]).T
    assert int(np.argmin(d[1])) == 0  # all-NaN row -> first (smallest cid)


def test_semdedup_matches_retired_fold_form(spark):
    """End-to-end pin: the unified Arrow path must reproduce the retired
    crossJoin + Catalyst-fold implementation row-for-row on the smoke
    fixture (cell assignment AND kept flags)."""
    from pyspark.sql import functions as F

    from bitcoin_price_etl_spark.catalog import load
    from bitcoin_price_etl_spark.llm.simsearch import (
        KMEANS_K,
        SEMDEDUP_CELL_TARGET,
        SEMDEDUP_TAU,
    )
    from bitcoin_price_etl_spark.registry import load_all

    sf = "/root/testdata/sf0.001"
    got = {
        r.vec_id: (r.cell, r.kept)
        for r in load_all()["llm_semdedup"].fn(spark, sf).collect()
    }

    # the retired fold-form reference, verbatim
    e = load(spark, sf, "embeddings")
    n = e.count()
    k = max(KMEANS_K, n // SEMDEDUP_CELL_TARGET)
    cent = (
        e.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    diff2 = F.expr(
        "aggregate(zip_with(embedding, cvec,"
        " (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"
        " * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),"
        " 0.0D, (s, x) -> s + x)"
    )
    norm = F.expr(
        "sqrt(aggregate(transform(embedding,"
        " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
        " 0D, (s, v) -> s + v))"
    )
    best = (
        e.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", diff2.alias("dist2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist2", "cid")).alias("b"))
        .select("vec_id", F.col("b.cid").alias("cell"))
    )
    assigned = (
        e.join(best, "vec_id")
        .select("vec_id", "cell", "embedding", norm.alias("norm"))
        .localCheckpoint()
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (s, v) -> s + v)"
    )
    dup = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("b.vec_id") < F.col("a.vec_id")))
        .filter(
            F.when(F.col("a.norm") * F.col("b.norm") > F.lit(0.0),
                   dot / (F.col("a.norm") * F.col("b.norm")))
            .otherwise(F.lit(0.0)) > SEMDEDUP_TAU
        )
        .select(F.col("a.vec_id").alias("vec_id")).distinct()
    )
    dup_ids = {r.vec_id for r in dup.collect()}
    want = {
        r.vec_id: (r.cell, r.vec_id not in dup_ids)
        for r in assigned.select("vec_id", "cell").collect()
    }
    assert got == want
