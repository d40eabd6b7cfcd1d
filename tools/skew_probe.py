#!/usr/bin/env python
"""Key-skew probe (round 8): correctness AND wall-clock under hot keys.

Every shuffle in the engine hashes on some key; the 100 TB failure mode
is not wrong answers but a reducer (or window partition) that receives
half the corpus. The registry's designs CLAIM skew-safety — salted
composites (funnel_windowed_salted, join_salted_skew), bucket caps
(DF_CAP, PHASH_BUCKET_CAP), partial aggregation, AQE skew-join — and
this probe measures the claim instead of trusting it.

Corpus: the uniform fixture with its distribution keys made hostile,
row counts unchanged —
  - events.user_id: 50% of rows collapse onto user 0 (event_id % 2)
  - events.event_type: 90% of rows collapse onto 'click'
    (event_id % 10 != 0) — the per-series WINDOW partitions go hot,
    not just groupBy reducers
  - orders.o_custkey: 50% of orders collapse onto the smallest custkey
FKs stay valid (user ids are freestanding; the hot custkey exists).

Two checks per key:
  1. CORRECTNESS on the skew corpus at --sf (default sf0.01): the
     DuckDB oracle runs on the SAME skewed parquet, so hash parity
     certifies hot-key behavior (ties in hot groups, argmin/argmax
     pins, window frames over 90%-of-corpus partitions).
  2. WALL ratio skew/uniform at --timing-sf (default sf0.1): each key
     runs twice per corpus (min of 2, cold first), uniform then skew.
     ratio >> rows_ratio (1.0 here) means a skew-fragile plan.

Usage:
    python tools/skew_probe.py [--keys a,b] [--record PATH]
                               [--sf DIR] [--timing-sf DIR] [--no-timing]
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Shuffle-heavy keys on the skewed columns: user_id sessionization /
# funnels / cohorts (incl. the salted twins whose whole point is this
# corpus), event_type-partitioned windows (one partition = 90% of the
# corpus), custkey joins, and the biggest multi-join aggregates.
DEFAULT_KEYS = [
    # user_id groupBys / windows
    "funnel_conversion", "funnel_windowed", "funnel_windowed_salted",
    "cohort_retention", "cohort_survival_km", "cohort_ltv_curve",
    "ts_sessionize", "ts_sessionize_fragments", "path_analysis_sessions",
    "join_salted_skew",
    # event_type-partitioned series windows (hot window partition)
    "ts_ewma", "win_rolling_median", "ts_zscore_rolling",
    "ts_max_drawdown", "ts_resample_ohlc", "ts_seasonal_decompose",
    "ts_interpolate_multi", "agg_hash", "agg_distinct",
    # custkey / multi-join aggregates
    "join_shuffle", "join_broadcast", "tpch_q13", "tpch_q18",
    # custkey skew turns the (custkey, partkey) edge list into a hub
    # graph — the degree-ordered orientation / frontier bounds face
    # their worst case
    "graph_pagerank", "graph_triangle_count", "graph_bipartite_projection",
    "graph_khop_reach", "graph_assortativity",
    # sliding RANGE frame: per-row cost is frame density (Spark
    # re-aggregates sliding frames; no incremental remove) — measured
    # under a 10x-denser hot series
    "win_range_between",
]

# Adjudicated-kept DEMONSTRATION keys (BASELINE.md r8 skew adjudication;
# VERDICT r10 item 6): their skew ratios are the documented property the
# key exists to demonstrate, not a regression — recorded in a separate
# block carrying the adjudication inline, so the main block's flatness
# IS the probe's headline and no future reader re-investigates these.
DEMONSTRATIONS: dict[str, str] = {
    "funnel_windowed_salted": (
        "KEPT, adjudicated (BASELINE.md r8): the pair-join formulation "
        "is retained as the salting demonstration — its cost is the pair "
        "count itself (workload-quadratic in the hot user's steps); the "
        "salt only spreads it. funnel_windowed (suffix-min form, ~1.0x "
        "under the same skew) is the scale default."
    ),
    "win_range_between": (
        "KEPT, adjudicated frame-density-bound (BASELINE.md r8): Spark "
        "re-aggregates sliding RANGE frames per row (no incremental "
        "remove), so per-row cost is the 1-hour frame's event density — "
        "10x-denser hot series => ~2-4x wall, correctness unaffected. "
        "The key certifies the RANGE-frame semantics surface; dense "
        "feeds take the rollup form (docstring steer)."
    ),
}


def stage_skew(src: str, out: Path) -> None:
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    ev = pq.read_table(f"{src}/events.parquet")
    eid = ev.column("event_id").to_numpy(zero_copy_only=False)
    hot_user = pa.array((eid % 2) == 0)
    hot_type = pa.array((eid % 10) != 0)
    u_idx = ev.schema.get_field_index("user_id")
    ev = ev.set_column(
        u_idx, ev.field(u_idx),
        pc.if_else(hot_user, pa.scalar(0, ev.field(u_idx).type),
                   ev.column("user_id")),
    )
    t_idx = ev.schema.get_field_index("event_type")
    ev = ev.set_column(
        t_idx, ev.field(t_idx),
        pc.if_else(hot_type, pa.scalar("click"), ev.column("event_type")),
    )
    pq.write_table(ev, out / "events.parquet")

    orders = pq.read_table(f"{src}/orders.parquet")
    okey = orders.column("o_orderkey").to_numpy(zero_copy_only=False)
    hot_cust = pa.array((okey % 2) == 0)
    min_cust = pc.min(orders.column("o_custkey")).as_py()
    c_idx = orders.schema.get_field_index("o_custkey")
    orders = orders.set_column(
        c_idx, orders.field(c_idx),
        pc.if_else(hot_cust,
                   pa.scalar(min_cust, orders.field(c_idx).type),
                   orders.column("o_custkey")),
    )
    pq.write_table(orders, out / "orders.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "documents", "embeddings"):
        shutil.copy(f"{src}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (skew of {src})", flush=True)


def _wall(fn, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        gc.collect()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="")
    ap.add_argument("--record", default="")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--timing-sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-timing", action="store_true")
    args = ap.parse_args()
    if args.record:
        args.record = os.path.abspath(args.record)

    sys.path.insert(0, REPO)
    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark
    from tests.oracle import compare_to_oracle

    skew_small = Path("/tmp/spark_graft_skew_small")
    stage_skew(args.sf, skew_small)
    if not args.no_timing:
        skew_big = Path("/tmp/spark_graft_skew_big")
        stage_skew(args.timing_sf, skew_big)

    reg = load_all()
    keys = [k for k in args.keys.split(",") if k] or DEFAULT_KEYS
    spark = get_spark("skew-probe")
    record: dict[str, dict] = {}
    bad = []
    for k in keys:
        row: dict = {}
        t0 = time.perf_counter()
        try:
            if reg[k].oracle is not None:
                compare_to_oracle(spark, k, str(skew_small))
                row["correctness"] = "exact_eq"
            else:
                reg[k].fn(spark, str(skew_small)).collect()
                row["correctness"] = "rows_only_ok"
        except Exception as ex:  # noqa: BLE001 — probe must keep going
            row["correctness"] = f"fail:{type(ex).__name__}"
            row["detail"] = str(ex)[:300]
            bad.append(k)
        row["correctness_sec"] = round(time.perf_counter() - t0, 3)

        if not args.no_timing and not row["correctness"].startswith("fail"):
            try:
                uni = _wall(reg[k].fn, spark, args.timing_sf)
                skw = _wall(reg[k].fn, spark, str(skew_big))
                row["uniform_sec"] = round(uni, 3)
                row["skew_sec"] = round(skw, 3)
                row["ratio"] = round(skw / uni, 2) if uni > 0 else None
            except Exception as ex:  # noqa: BLE001
                row["timing"] = f"fail:{type(ex).__name__}"
                row["detail_timing"] = str(ex)[:300]
                bad.append(k)
        if k in DEMONSTRATIONS:
            row["adjudication"] = DEMONSTRATIONS[k]
        record[k] = row
        print(f"{k}: {row}", flush=True)

    main_block = {k: v for k, v in record.items() if k not in DEMONSTRATIONS}
    demo_block = {k: v for k, v in record.items() if k in DEMONSTRATIONS}
    worst = sorted(
        ((k, v.get("ratio")) for k, v in main_block.items()
         if v.get("ratio") is not None),
        key=lambda t: -t[1],
    )[:5]
    print(
        f"SUMMARY bad={len(bad)} {bad} worst_main_ratios={worst} "
        f"demonstrations={[(k, v.get('ratio')) for k, v in demo_block.items()]}",
        flush=True,
    )
    if args.record:
        with open(args.record, "w") as f:
            json.dump(
                {
                    "corpus": (
                        "hot-key skew (50% of events on user 0, 90% on "
                        "event_type 'click', 50% of orders on one "
                        "custkey; row counts unchanged)"
                    ),
                    "correctness_sf": args.sf,
                    "timing_sf": None if args.no_timing else args.timing_sf,
                    "n_keys": len(keys),
                    "bad": len(bad),
                    "keys": main_block,
                    "demonstrations": demo_block,
                },
                f,
                indent=1,
            )
        print(f"record written: {args.record}", flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
