"""Round-12 optimization guards.

The SemDeDup assignment control plane became chunkable (VERDICT r11 item 3:
no unbounded driver collect above SEMDEDUP_ASSIGN_K_CAP, slabs ship as
broadcasts) and its per-batch argmin became blocked-vectorized — these tests
pin that the chunked/blocked path is BIT-identical to the full-matrix argmin
it generalizes, and that the end-to-end key is row-identical under a forced
multi-slab broadcast plane.
"""

from __future__ import annotations

import numpy as np
import pytest

from bitcoin_price_etl_spark.llm.simsearch import (
    _blocked_argmin,
    _emb_matrix,
    _seq_dot,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _reference_argmin(M: np.ndarray, cids: np.ndarray, C: np.ndarray):
    """The retired r11 single-matrix form: K columns of _seq_dot diff²,
    one np.argmin over the whole row (first-hit ties, NaN rows -> col 0)."""
    d = np.empty((M.shape[0], len(cids)))
    for k in range(len(cids)):
        diff = M - C[k]
        d[:, k] = _seq_dot(diff, diff)
    return cids[np.argmin(d, axis=1)]


def _slabbed(cids, C, slab_rows):
    return [
        (cids[i : i + slab_rows], C[i : i + slab_rows])
        for i in range(0, len(cids), slab_rows)
    ]


def test_seq_dot_zero_width_is_fold_initial_value():
    """dim=0 input (None/empty vectors) must return the fold's initial
    value 0.0 — the empty-array aggregate — not IndexError (ADVICE r11)."""
    out = _seq_dot(np.zeros((3, 0)), np.zeros((3, 0)))
    assert out.shape == (3,) and (out == 0.0).all()
    out3 = _seq_dot(np.zeros((2, 4, 0)), np.zeros((2, 4, 0)))
    assert out3.shape == (2, 4) and (out3 == 0.0).all()


@pytest.mark.parametrize("slab_rows", [1, 2, 3, 7, 1000])
def test_blocked_argmin_matches_full_matrix(slab_rows, monkeypatch):
    """Chunked + block-vectorized argmin == the retired full-matrix argmin
    bit-for-bit: same _seq_dot distances, first-hit tie rule across slab
    and block boundaries, NaN rows keep the smallest cid."""
    from bitcoin_price_etl_spark.llm import simsearch

    # force many numpy blocks inside each slab too
    monkeypatch.setattr(simsearch, "_ASSIGN_BLOCK_ELEMS", 16)
    rng = np.random.default_rng(12)
    for trial in range(20):
        n, k, dim = 17, int(rng.integers(1, 23)), 5
        cids = np.sort(rng.choice(10_000, size=k, replace=False)).astype(np.int64)
        C = rng.integers(-3, 4, size=(k, dim)).astype(np.float64)
        M = rng.integers(-3, 4, size=(n, dim)).astype(np.float64)
        # engineered exact ties: several centroids identical, and a few
        # rows placed exactly on a centroid
        if k >= 3:
            C[1] = C[0]
            C[k - 1] = C[k // 2]
        M[0] = C[0]
        M[1] = C[k - 1]
        M[2] = np.nan  # NULL embedding row
        want = _reference_argmin(M, cids, C)
        got = simsearch._blocked_argmin(
            M, _slabbed(cids, C, slab_rows), lambda s: s
        )
        assert (got == want).all(), (slab_rows, trial)


def test_blocked_argmin_zero_dim_plane():
    """A dim=0 plane (every cvec None/empty) assigns every row to the
    smallest cid — distances are all the empty fold's 0.0."""
    cids = np.array([5, 9, 11], dtype=np.int64)
    C = np.zeros((3, 0))
    M = np.zeros((4, 0))
    got = _blocked_argmin(M, _slabbed(cids, C, 2), lambda s: s)
    assert (got == 5).all()


def test_semdedup_multislab_broadcast_plane_is_row_identical(spark, monkeypatch):
    """Forcing SEMDEDUP_ASSIGN_K_CAP below K exercises the corpus-grown-K
    path (toLocalIterator slabs + broadcast shipping): the key's output
    must be row-identical to the default closure-shipped plane."""
    from bitcoin_price_etl_spark.llm import simsearch
    from bitcoin_price_etl_spark.registry import load_all

    fn = load_all()["llm_semdedup"].fn
    base = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    monkeypatch.setattr(simsearch, "SEMDEDUP_ASSIGN_K_CAP", 3)
    multi = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert multi == base
