"""ANN-router mid-band calibration (VERDICT r10 item 4).

Round 10 shipped llm_sim_search_route with thresholds {LO=2, HI=20}
anchored by only two measured regimes (noise CH~1.0, clustered CH~2239)
— nothing measured sat inside the decision band. Round 11 charted the
band with five sigma-controlled corpora (llm/evalsets.py generator,
deterministic seed) and recorded CH / per-method recall@10 / escalation
probed-mass into ROUTE_CALIBRATION_r11.json:

    sigma 1.40 -> CH  2.14   recall: lsh .4 multiprobe 1.0 ivf .5 esc .8
    sigma 1.00 -> CH  3.18   recall: lsh .4 multiprobe 1.0 ivf .5 esc .8
    sigma 0.60 -> CH  6.88   recall: lsh .5 multiprobe 1.0 ivf .5 esc .9
    sigma 0.35 -> CH 17.93   recall: lsh .5 multiprobe .9  ivf .7 esc .9
    sigma 0.25 -> CH 33.90   recall: lsh .6 multiprobe 1.0 ivf 1.0 esc 1.0

The escalated family (multiprobe/escalate) dominates the base banded
family throughout [2, 20) and the base-IVF crossover to 1.0 lands inside
(17.9, 33.9) — bracketing HI=20 — so the thresholds are VALIDATED by the
middle regime, not just extrapolated from the extremes. These tests pin
(a) the recorded measurements' internal consistency (router arm ==
measured-best family on every corpus), (b) live router agreement with
the committed artifact on boundary corpora, and (c) the per-corpus-
snapshot statistic cache (hit, miss, and mtime invalidation).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(HERE, "ROUTE_CALIBRATION_r11.json")

# route -> the arm family that routing decision commits to
BANDED_ARMS = ("lsh", "ivf")
ESCALATED_ARMS = ("lsh_multiprobe", "ivf_escalate")


def _artifact():
    with open(ARTIFACT, encoding="utf-8") as fh:
        return json.load(fh)


def test_recorded_routes_are_measured_best():
    """On every calibration corpus the router's arm must be the one the
    recorded recall/mass table justifies: 'banded' only where a base
    pruned arm already reads >= 0.9; 'escalated' where the escalated
    family beats the base family and reaches >= 0.8; 'exact' only where
    escalation's probed mass makes pruning pointless (>= 0.5 of the
    corpus scanned anyway — recall bought at near-exhaustive cost)."""
    art = _artifact()
    assert len(art["corpora"]) >= 6
    for name, rec in art["corpora"].items():
        recall = rec["recall_at_10"]
        best_banded = max(recall[a] for a in BANDED_ARMS)
        best_escalated = max(recall[a] for a in ESCALATED_ARMS)
        if rec["route"] == "banded":
            assert best_banded >= 0.9, (name, rec)
        elif rec["route"] == "escalated":
            assert best_escalated >= 0.8, (name, rec)
            assert best_escalated >= best_banded, (name, rec)
        else:
            assert rec["route"] == "exact", (name, rec)
            # exact is the honest arm exactly when the escalation path's
            # mass cap means "recall via near-full scan"
            assert rec["escalate_mass"] >= 0.5, (name, rec)


def test_ch_band_brackets_hi_threshold():
    """The base-IVF recall crossover (the quantity HI=20 models) must sit
    between the highest measured 'escalated' CH and the lowest measured
    'banded' CH — i.e. the threshold is inside the measured bracket, so
    neither side of the band is routed against its measurements."""
    art = _artifact()
    esc = [
        r["ch_ratio"]
        for r in art["corpora"].values()
        if r["route"] == "escalated"
    ]
    banded = [
        r["ch_ratio"]
        for r in art["corpora"].values()
        if r["route"] == "banded"
    ]
    assert esc and banded
    from bitcoin_price_etl_spark.llm.simsearch import ROUTE_CH_HI, ROUTE_CH_LO

    assert max(esc) < ROUTE_CH_HI < min(banded)
    assert all(c >= ROUTE_CH_LO for c in esc)


def test_live_router_matches_artifact_on_boundary_corpora(spark, tmp_path):
    """Rebuild the two boundary corpora (just above LO: sigma=1.4; above
    HI: sigma=0.25) from the deterministic generator and assert the live
    router reproduces the committed artifact bit-for-bit — fixture drift
    or a threshold/quantization change fails loudly here."""
    from bitcoin_price_etl_spark.llm.evalsets import write_clustered_embeddings
    from bitcoin_price_etl_spark.registry import load_all

    art = _artifact()
    fn = load_all()["llm_sim_search_route"].fn
    for sigma in (1.4, 0.25):
        rec = art["corpora"][f"clustered_sigma{sigma}"]
        d = str(tmp_path / f"s{sigma}")
        write_clustered_embeddings(d, sigma=sigma)
        row = fn(spark, d).collect()[0]
        assert row["route"] == rec["route"], (sigma, row)
        assert row["ch_ratio"] == rec["ch_ratio"], (sigma, row)


def test_route_cached_hit_miss_and_invalidation(spark, tmp_path, monkeypatch):
    """The snapshot cache must (1) compute-and-store on first sight, (2)
    serve the stored record without recompute on an unchanged snapshot —
    proven by tampering the cache entry and seeing the tampered value —
    and (3) invalidate when the corpus file's mtime/size changes."""
    from bitcoin_price_etl_spark.registry import load_all

    cache_dir = str(tmp_path / "cache")
    monkeypatch.setenv("GRAFT_ROUTE_STATS_DIR", cache_dir)
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    src = "/root/testdata/sf0.001/embeddings.parquet"
    dst = os.path.join(corpus, "embeddings.parquet")
    shutil.copy(src, dst)

    fn = load_all()["llm_sim_search_route_cached"].fn
    r1 = fn(spark, corpus).collect()[0]
    entries = os.listdir(cache_dir)
    assert len(entries) == 1

    # tamper: a hit must read the stored record, not recompute
    cpath = os.path.join(cache_dir, entries[0])
    rec = json.load(open(cpath, encoding="utf-8"))
    rec["route"] = "tampered"
    json.dump(rec, open(cpath, "w", encoding="utf-8"))
    r2 = fn(spark, corpus).collect()[0]
    assert r2["route"] == "tampered"

    # rewrite the corpus (new mtime) -> new key -> recompute, true value
    shutil.copy(src, dst)
    os.utime(dst)
    r3 = fn(spark, corpus).collect()[0]
    assert r3["route"] == r1["route"] != "tampered"
    assert r3["ch_ratio"] == r1["ch_ratio"]
    assert len(os.listdir(cache_dir)) == 2


def test_route_cached_oracle_parity(spark, tmp_path, monkeypatch):
    """Both the miss path (live compute + store) and the hit path
    (literal frame from the stored record) must hash-match the shared
    route oracle — cached values are byte-identical by construction."""
    from tests.oracle import compare_to_oracle

    monkeypatch.setenv("GRAFT_ROUTE_STATS_DIR", str(tmp_path / "cache"))
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    compare_to_oracle(spark, "llm_sim_search_route_cached", sf)  # miss
    compare_to_oracle(spark, "llm_sim_search_route_cached", sf)  # hit
