#!/usr/bin/env python
"""100x-octave midpoint hunt for the two sites cost-excluded from
MIDPOINT_HUNT_100X_r09.json (VERDICT r9 item 2): graph_triangle_count and
win_rolling_beta, on a REDUCED key-shift fixture.

Why a thin fixture is the right instrument here (the r9 VERDICT's own
suggestion): the full 100x staging pays for JOIN/SORT volume, but the
midpoint-lottery axis is the set of NOVEL quantize/divide operands, and
key-shift copies create those through FRAME MIXING, not through raw volume
— shifted copies interleave inside each window partition's
(shipdate, orderkey, ...) order, so every 30-row frame mixes rows from
many copies and produces frame sums (and betas) that exist at no smaller
mult. Thinning lineitem to a supplier subset BEFORE shifting keeps that
mixing intact at the full mult=100 octave while cutting the sort/join
volume ~100x.

Adjudications recorded alongside the runs:

* graph_triangle_count — the site is ELIMINATED, not just hunted: r10
  restated the one quantized value (global_clustering, formerly
  CAST(3.0*t/w AS DECIMAL(14,8))) as exact integer arithmetic,
  round_half_up(3e8*t/w) = (6e8*t + w) DIV (2w), in BOTH engines
  (operators/graph.py). No double->decimal conversion remains anywhere in
  the key, so there is no rounding discretion for ANY (t, w) at ANY
  scale; the 100x run below exercises the restatement on 100x-octave
  wedge counts as a belt-and-braces check.

* win_rolling_beta — operand-range proof, scale-invariant: (a) the input
  quantizes CAST(l_quantity/l_extendedprice AS DECIMAL(18,4)) act on
  integral quantities (1..50) and 2dp money (<= 105000), whose doubles
  sit ~1e-13 from the 4dp grid CENTER — eight orders of magnitude from
  the half-quantum boundary where the Spark(shortest-repr-HALF_UP) vs
  DuckDB(exact-binary) split can open, and this is a per-VALUE property
  of the TPC-H domain, independent of corpus size; (b) every downstream
  decimal is frame-local (30 taps) and exact by range (sxyd <=
  30*50*105000 = 1.575e8 at scale 8 -> 1.575e16 < 2^53; num4/den4 <=
  4.7e9 at scale 4 -> 4.7e13 < 2^53), bounds set by the tap count and
  value domain, not the corpus; (c) beta is ONE correctly-rounded IEEE
  division on bit-identical operands. Scale multiplies the number of
  draws of (c), which has no discretion. The 100x thin run is the
  empirical leg of the same claim.

Usage: python tools/midpoint_hunt_thin.py [--mult 100] [--suppliers 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KEYS = ("graph_triangle_count", "win_rolling_beta")


def stage(src: str, mult: int, suppliers: int, out: Path) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    # rmtree first: re-running with a different --src used to rewrite
    # lineitem but keep stale copies of the other nine tables (r10
    # ADVICE) — the staged dir must be all-one-fixture or the probe
    # silently mixes sources.
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True, exist_ok=True)
    li = pq.read_table(f"{src}/lineitem.parquet")
    thin = li.filter(pc.less_equal(li.column("l_suppkey"), suppliers))
    if len(thin) == 0:
        raise SystemExit(
            f"no lineitem rows with l_suppkey <= {suppliers} in {src}; "
            "raise --suppliers (empty thin table would stage a vacuous probe)"
        )
    unit = pc.max(thin.column("l_orderkey")).as_py() + 1
    idx = thin.schema.get_field_index("l_orderkey")
    copies = []
    for i in range(mult):
        shifted = pc.add(thin.column("l_orderkey"), pa.scalar(i * unit, pa.int64()))
        copies.append(thin.set_column(idx, thin.field(idx), shifted))
    staged = pa.concat_tables(copies)
    pq.write_table(staged, out / "lineitem.parquet")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "events", "documents", "embeddings"):
        dst = out / f"{t}.parquet"
        if not dst.exists():
            shutil.copy(f"{src}/{t}.parquet", dst)
    return {"thin_rows": len(thin), "staged_rows": len(staged),
            "suppliers": suppliers, "orderkey_unit": unit}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--suppliers", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--record", default=os.path.join(REPO, "MIDPOINT_HUNT_100X_r10.json"))
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    out = Path(f"/tmp/spark_graft_midpoint_thin_{args.mult}x_s{args.suppliers}")
    meta = stage(args.src, args.mult, args.suppliers, out)
    print(f"staged {meta}", flush=True)

    from bitcoin_price_etl_spark.session import get_spark
    from tests.oracle import compare_to_oracle

    spark = get_spark("midpoint-hunt-thin")
    record: dict[str, dict] = {}
    bad = 0
    for k in KEYS:
        t0 = time.perf_counter()
        try:
            compare_to_oracle(spark, k, str(out))
            record[k] = {"status": "exact_eq",
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: EXACT-EQ ({record[k]['sec']}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            bad += 1
            record[k] = {"status": f"fail:{type(ex).__name__}",
                         "detail": str(ex)[:300],
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: FAIL {str(ex)[:200]}", flush=True)

    doc = {
        "mult": args.mult,
        "src": args.src,
        "staging": meta,
        "selector": (
            "the two sites excluded for cost from MIDPOINT_HUNT_100X_r09 "
            "(VERDICT r9 item 2), hunted on a thin-supplier key-shift "
            "fixture: lineitem filtered to l_suppkey <= "
            f"{args.suppliers} then orderkey-shift-concatenated x"
            f"{args.mult} — full-octave frame mixing (novel frame-sum / "
            "wedge-count operands) at ~1/100 the join/sort volume"
        ),
        "adjudications": {
            "graph_triangle_count": (
                "site ELIMINATED in r10: global_clustering restated as "
                "exact integer round_half_up — (6e8*t + n_wedges) DIV "
                "(2*n_wedges) — in BOTH engines (operators/graph.py); no "
                "double->decimal conversion remains, so no rounding "
                "discretion exists at any scale. Run below is "
                "belt-and-braces on 100x-octave wedge counts."
            ),
            "win_rolling_beta": (
                "operand-range proof (scale-invariant): input quantizes "
                "act on integral/2dp doubles ~1e-13 from the 4dp grid "
                "center (never near the half-quantum boundary); all "
                "frame decimals exact by 30-tap domain bounds "
                "(sxyd<=1.575e8@s8, num4/den4<=4.7e9@s4, all scaled "
                "ints < 2^53); beta is one correctly-rounded division "
                "on bit-identical operands. Corpus scale multiplies "
                "only the draw count of the discretion-free division."
            ),
        },
        "ok": len(KEYS) - bad,
        "bad": bad,
        "keys": record,
    }
    with open(args.record, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.record}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
