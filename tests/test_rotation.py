"""Driver-window rotation invariants (registry.ordered_keys).

The round-3 VERDICT's one process hazard was the verified-set merge not
running between rounds, which would re-certify the same ~50-key head
forever. registry now auto-folds every CORRECTNESS_r*.json at import;
these tests pin the invariants that make the rotation self-healing.
"""

from __future__ import annotations

import json
import os

from bitcoin_price_etl_spark.registry import (
    DISAVOWED_THROUGH,
    DRIVER_PRIORITY,
    DRIVER_VERIFIED,
    load_all,
    ordered_keys,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_rows(path):
    with open(path) as f:
        rows = json.load(f)
    for key, row in rows.items():
        full = (
            row.get("rows_match") and row.get("schema_match")
            and row.get("hash_match") and not row.get("err")
        )
        rows_only = (
            row.get("err") == "no_oracle"
            and row.get("spark_rows") is not None
        )
        if full or rows_only:
            yield key


def test_autofold_absorbs_every_correctness_file():
    """Every non-disavowed green row of every driver CORRECTNESS file must
    be in DRIVER_VERIFIED even if the merge tool was never run — the
    self-healing property."""
    import glob
    import re

    missing = []
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for key in _green_rows(path):
            if rnd <= DISAVOWED_THROUGH.get(key, -1):
                continue
            if key not in DRIVER_VERIFIED:
                missing.append((os.path.basename(path), key))
    assert not missing, missing


def test_window_head_is_all_never_verified():
    """Every never-verified key must occupy the exact head of the window —
    verified keys may back-fill only the slots AFTER the backlog is
    exhausted (round-6 endgame: backlog shrank below the 50-key window,
    so "first 50 contain zero verified" became unsatisfiable; the real
    invariant is that no backlog key is displaced by a verified one)."""
    reg = load_all()
    ok = ordered_keys(reg)
    backlog = [k for k in ok if k not in DRIVER_VERIFIED]
    head = ok[: len(backlog)]
    assert set(head) == set(backlog), (
        sorted(set(backlog) - set(head)),
        [k for k in head if k in DRIVER_VERIFIED],
    )


def test_window_backfill_refreshes_oldest_certifications_first():
    """Once the backlog no longer fills the ~50-key window, the back-fill
    slots must be verified keys in non-decreasing certification-round
    order, so the driver's spare capacity refreshes the stalest evidence
    (round-6 VERDICT item 3)."""
    from bitcoin_price_etl_spark.registry import DRIVER_VERIFIED_ROUND

    reg = load_all()
    ok = ordered_keys(reg)
    backlog = [k for k in ok if k not in DRIVER_VERIFIED]
    tail = ok[len(backlog):]
    assert all(k in DRIVER_VERIFIED for k in tail)
    rounds = [DRIVER_VERIFIED_ROUND.get(k, 0) for k in tail]
    assert rounds == sorted(rounds), "verified tail is not oldest-first"


def test_ordered_keys_is_a_permutation():
    reg = load_all()
    ok = ordered_keys(reg)
    assert sorted(ok) == sorted(reg)
    assert len(ok) == len(set(ok))


def test_disavowed_keys_rotate_back_into_window():
    """A disavowed-but-not-yet-recertified key must sit inside the next
    ~50-key window (it is in DRIVER_PRIORITY precisely to re-certify).
    Once a LATER round's CORRECTNESS file certifies it, it leaves the
    head — both states satisfy this test."""
    reg = load_all()
    ok = ordered_keys(reg)
    for key in DISAVOWED_THROUGH:
        if key not in reg:
            continue
        if key in DRIVER_VERIFIED:
            continue  # re-certified by a later round — done
        assert key in DRIVER_PRIORITY, key
        assert ok.index(key) < 50, (key, ok.index(key))


def test_committed_probe_records_are_full_and_clean():
    """Any PROBE_r*.json committed at the repo root is round-close gate
    evidence (VERIFY_ROUND.md): it must be a FULL-registry run
    (full_registry flag, n_keys == n_registry) with zero bad keys —
    a partial or red record must never be committed as the gate."""
    import glob

    for path in glob.glob(os.path.join(ROOT, "PROBE_r*.json")):
        with open(path) as f:
            rec = json.load(f)
        name = os.path.basename(path)
        assert rec.get("full_registry") is True, f"{name}: partial record"
        assert rec["n_keys"] == rec["n_registry"], name
        assert rec["bad"] == 0, f"{name}: has red keys"
        assert rec["ok"] == rec["n_keys"], name
