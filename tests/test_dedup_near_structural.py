"""Structural cross-engine verification for llm_dedup_near (VERDICT r8
item 6).

The key is rows-only at the driver gate because its minhash signatures
are xxhash64-derived and DuckDB has no xxhash64 twin — the exact output
is not SQL-computable. But the LSH pipeline's *invariants* ARE
cross-checkable: DuckDB recomputes the exact shingle-set Jaccard for
every pair (independent implementation: str_split / list slicing, no
Spark expression shared), and the emitted candidate set must satisfy
the deterministic and probabilistic-with-margin properties of
16-perm / 4-band / 4-row MinHash-LSH:

  D1. every emitted pair is canonical (doc_a < doc_b) with
      n_band_collisions in [1, 4] and est_jaccard >= 4/16 (one full
      band match implies >= 4 equal minhash components);
  D2. every emitted pair shares at least one shingle (a band collision
      without any common shingle requires an xxhash64 collision,
      probability ~2^-64 — treated as impossible);
  D3. every pair with exact shingle-set Jaccard == 1.0 is emitted with
      all 4 bands colliding and est_jaccard == 1.0 (identical shingle
      sets give identical signatures deterministically);
  P1. per-pair |est_jaccard - exact_jaccard| <= 0.5 (binomial sd of the
      16-perm estimator is sqrt(J(1-J)/16) <= 0.125; 0.5 = 4 sigma, and
      the fixture is deterministic so a pass is stable, not flaky);
  P2. among pairs with exact Jaccard >= 0.85 the emitted fraction is
      >= 0.7 (theoretical recall at J = 0.85 is
      1 - (1 - 0.85^4)^4 ~= 0.95; 0.7 leaves margin for a small pair
      population while still falsifying a broken banding join).

Two corpora: a purpose-built near-dup fixture with controlled Jaccard
structure (exact clones, ~0.9 / ~0.7 / ~0.4 perturbations, unrelated
noise docs), and the shipped sf0.001 documents table (D1-D3 only — its
near-dup population is not controlled).

Reference precedent: the reference pipeline has no near-dup operator at
all (bpi_etl_bigquery.py is a 1-row-per-hour ETL); this guards the
engine's own SURVEY §2.2 llm_dedup_near contract.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from bitcoin_price_etl_spark.llm.dedup import SHINGLE_WORDS
from bitcoin_price_etl_spark.registry import load_all

WORDS = [f"w{i:03d}" for i in range(400)]


def _doc(words: list[str]) -> str:
    return " ".join(words)


def _fixture_docs() -> list[tuple[int, str]]:
    """Deterministic near-dup corpus: 8 families x (base, exact clone,
    1-word edit ~J0.88, 3-word edit ~J0.65, 10-word edit ~J0.3,
    30-word edit ~J0.05) + 20 unrelated noise docs. 80-word documents
    so a single-word edit lands in the s-curve's high-recall region
    (1 word perturbs <= 5 of 76 shingles). All word choices are index
    arithmetic — no RNG, same corpus every run."""
    docs: list[tuple[int, str]] = []
    doc_id = 0
    for fam in range(8):
        base = [WORDS[(fam * 37 + k * 3) % 400] for k in range(80)]
        edits = (0, 1, 3, 10, 30)  # words swapped per variant
        docs.append((doc_id, _doc(base)))
        doc_id += 1
        for vi, n_edit in enumerate(edits):
            v = list(base)
            for j in range(n_edit):
                v[(7 + j * (80 // max(n_edit, 1))) % 80] = WORDS[
                    (fam * 37 + 200 + vi * 40 + j) % 400
                ]
            docs.append((doc_id, _doc(v)))
            doc_id += 1
    for n in range(20):
        noise = [WORDS[(n * 17 + k * 7 + 123) % 400] for k in range(30)]
        docs.append((doc_id, _doc(noise)))
        doc_id += 1
    return docs


@pytest.fixture(scope="module")
def neardup_dir(spark, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("neardup_fixture"))
    rows = [
        (did, text, "en", "synthetic", len(text))
        for did, text in _fixture_docs()
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def _exact_jaccard(sf_dir: str) -> dict[tuple[int, int], float]:
    """Independent DuckDB computation of exact distinct-shingle Jaccard
    for every pair sharing >= 1 shingle. No DF cap — this is ground
    truth, not the engine's capped candidate path."""
    con = duckdb.connect()
    doc_glob = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(doc_glob):
        doc_glob = os.path.join(doc_glob, "*.parquet")
    rows = con.execute(
        f"""
        WITH tok AS (
            SELECT doc_id, str_split(text, ' ') AS t
            FROM read_parquet('{doc_glob}') WHERE text IS NOT NULL
        ),
        sh AS (
            SELECT doc_id, unnest(list_distinct(list_transform(
                range(1, greatest(len(t) - {SHINGLE_WORDS - 1}, 1) + 1),
                i -> array_to_string(t[i:i + {SHINGLE_WORDS - 1}], ' ')
            ))) AS shingle
            FROM tok
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM sh a JOIN sh b ON a.shingle = b.shingle
                                AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT c.doc_a, c.doc_b,
               CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c) AS j
        FROM common c
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b
        """
    ).fetchall()
    con.close()
    return {(a, b): j for a, b, j in rows}


def _emitted(spark, sf_dir: str) -> dict[tuple[int, int], tuple[int, float]]:
    fn = load_all()["llm_dedup_near"].fn
    return {
        (r["doc_a"], r["doc_b"]): (r["n_band_collisions"], r["est_jaccard"])
        for r in fn(spark, sf_dir).collect()
    }


def _check_deterministic(emitted, exact):
    # D1: canonical pairs, sane collision counts, est floor
    for (a, b), (nbc, est) in emitted.items():
        assert a < b, f"non-canonical pair ({a},{b})"
        assert 1 <= nbc <= 4, f"({a},{b}): n_band_collisions={nbc}"
        assert est >= 4 / 16 - 1e-12, f"({a},{b}): est={est} < one-band floor"
        assert est <= 1.0 + 1e-12
    # D2: emitted subset-of pairs with >= 1 common shingle
    ghosts = set(emitted) - set(exact)
    assert not ghosts, f"pairs emitted with zero common shingles: {sorted(ghosts)[:5]}"
    # D3: exact duplicates always emitted, fully colliding
    for pair, j in exact.items():
        if j >= 1.0 - 1e-12:
            assert pair in emitted, f"exact-dup pair {pair} missed"
            nbc, est = emitted[pair]
            assert nbc == 4 and abs(est - 1.0) < 1e-12, (
                f"exact-dup pair {pair}: nbc={nbc} est={est}"
            )


def test_neardup_structural_fixture(spark, neardup_dir):
    exact = _exact_jaccard(neardup_dir)
    emitted = _emitted(spark, neardup_dir)
    # the fixture must actually exercise the interesting regimes
    assert sum(1 for j in exact.values() if j >= 1.0 - 1e-12) >= 8
    high = {p for p, j in exact.items() if j >= 0.85}
    assert len(high) >= 8, "fixture lost its high-similarity population"

    _check_deterministic(emitted, exact)

    # P1: estimator within 4 sigma of exact Jaccard on every emitted pair
    for pair, (nbc, est) in emitted.items():
        j = exact[pair]
        assert abs(est - j) <= 0.5, f"{pair}: est={est:.3f} exact={j:.3f}"

    # P2: high-similarity recall
    rec = sum(1 for p in high if p in emitted) / len(high)
    assert rec >= 0.7, f"recall@J>=0.85 = {rec:.2f} over {len(high)} pairs"


def test_neardup_structural_shipped_corpus(spark):
    sf_dir = "/root/testdata/sf0.001"
    exact = _exact_jaccard(sf_dir)
    emitted = _emitted(spark, sf_dir)
    _check_deterministic(emitted, exact)
    for pair, (nbc, est) in emitted.items():
        assert abs(est - exact[pair]) <= 0.5
