#!/usr/bin/env python
"""Midpoint-quantization hunt above sf0.1 (VERDICT r7 item 3).

The r7 sf0.1 oracle-parity audit proved the quantize-of-a-COMPUTED-double
divergence class is SCALE-REVEALED: four keys diverged at sf0.1 that were
green at sf0.001/0.01, because more computed values mean more draws in the
midpoint lottery (a double landing within an ulp of a decimal half-quantum
rounds differently through Spark's shortest-repr-then-HALF_UP cast than
through DuckDB's exact-binary rounding). exprs.py rule-11 classifies the
remaining quantize sites as rule-2-NECESSARY (libm/differing operands)
with the residual midpoint risk accepted — this tool pressure-tests that
acceptance one octave up.

Mechanism: stage an sf1-equivalent corpus (mult x sf0.1) with the
scale_probe.py key-shift discipline — orders+lineitem share a
join-consistent orderkey shift, events shift event_id (so every hourly
group gets mult x values: exactly the midpoint-lottery axis), documents
shift doc_id + copy-tag the text head, embeddings shift vec_id — then run
the registry's quantize-bearing oracle keys (every fn whose source casts
to a sub-38-precision DECIMAL) Spark-vs-DuckDB EXACT on the staged dir.
A mismatch here is a real cross-engine divergence at 10x the audited
scale; fix by exact restatement (exprs.py rule-11 recipes), never by
tolerance.

Staging is pure pyarrow (single parquet files — DuckDB-readable with the
same view DDL as the raw fixtures; no Spark job at staging time).

Usage:
    python tools/midpoint_hunt.py [--mult 10] [--src /root/testdata/sf0.1]
                                  [--keys a,b] [--record PATH]
"""

from __future__ import annotations

import argparse
import gc
import inspect
import json
import os
import re
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUANTIZE_PAT = re.compile(r"DECIMAL\(1[0-9],\s*[0-9]\)", re.I)

# The four r7 restatements re-audited at every octave regardless of the
# static selector (regression guard for the class's known members).
ALWAYS = ("ts_rsi", "win_rolling_beta", "ts_lead_lag_xcorr",
          "ts_cusum_changepoint")

_COPIED = ("region", "nation", "customer", "supplier", "part")


def _shift_concat(table, col: str, unit: int, mult: int):
    import pyarrow as pa
    import pyarrow.compute as pc

    copies = []
    for i in range(mult):
        idx = table.schema.get_field_index(col)
        shifted = pc.add(table.column(col), pa.scalar(i * unit, pa.int64()))
        copies.append(table.set_column(idx, table.field(idx), shifted))
    return pa.concat_tables(copies)


def stage(src: str, mult: int, out: Path) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import shutil

    marker = out / f".staged_mult{mult}"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    # orders + lineitem: JOIN-CONSISTENT orderkey shift (the key-space
    # unit of the owning table), custkey/suppkey/partkey fixed — every
    # copy's lineitems still find exactly their order while each
    # dimension serves mult x more facts (scale_probe.py discipline)
    orders = pq.read_table(f"{src}/orders.parquet")
    unit = pc.max(orders.column("o_orderkey")).as_py() + 1
    pq.write_table(
        _shift_concat(orders, "o_orderkey", unit, mult),
        out / "orders.parquet",
    )
    li = pq.read_table(f"{src}/lineitem.parquet")
    pq.write_table(
        _shift_concat(li, "l_orderkey", unit, mult), out / "lineitem.parquet"
    )
    del orders, li
    gc.collect()

    # events: event_id-shifted copies keep user_id/ts — every hourly
    # group's value population grows mult x (the midpoint-lottery axis)
    ev = pq.read_table(f"{src}/events.parquet")
    pq.write_table(
        _shift_concat(ev, "event_id", len(ev), mult), out / "events.parquet"
    )
    del ev
    gc.collect()

    # documents: shift doc_ids AND tag each copy's text head so every
    # copy keeps its internal near-dup structure with no cross-copy
    # duplicates (identical-text copies would cap-filter the corpus)
    docs = pq.read_table(f"{src}/documents.parquet")
    n_docs = len(docs)
    copies = []
    for i in range(mult):
        tag = f"copytag{i} "
        t = docs.set_column(
            docs.schema.get_field_index("doc_id"),
            docs.field(docs.schema.get_field_index("doc_id")),
            pc.add(docs.column("doc_id"), pa.scalar(i * n_docs, pa.int64())),
        )
        t = t.set_column(
            t.schema.get_field_index("text"),
            t.field(t.schema.get_field_index("text")),
            pc.binary_join_element_wise(
                pa.array([tag] * n_docs, pa.string()),
                t.column("text").combine_chunks(),
                "",
            ),
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            t.field(t.schema.get_field_index("n_chars")),
            pc.add(t.column("n_chars"), pa.scalar(len(tag), pa.int64())),
        )
        copies.append(t)
    pq.write_table(pa.concat_tables(copies), out / "documents.parquet")
    del docs, copies
    gc.collect()

    emb = pq.read_table(f"{src}/embeddings.parquet")
    pq.write_table(
        _shift_concat(emb, "vec_id", len(emb), mult), out / "embeddings.parquet"
    )
    del emb
    gc.collect()

    for t in _COPIED:
        shutil.copy(f"{src}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (mult={mult})", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keys", default="")
    ap.add_argument("--record", default="")
    args = ap.parse_args()
    if args.record:
        args.record = os.path.abspath(args.record)

    sys.path.insert(0, REPO)
    out = Path(f"/tmp/spark_graft_midpoint_{args.mult}x")
    stage(args.src, args.mult, out)

    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark
    from tests.oracle import compare_to_oracle

    reg = load_all()
    if args.keys:
        keys = [k for k in args.keys.split(",") if k]
    else:
        keys = sorted(
            k
            for k, s in reg.items()
            if s.oracle
            and (QUANTIZE_PAT.search(inspect.getsource(s.fn)) or k in ALWAYS)
        )
    print(f"hunting {len(keys)} quantize-bearing oracle keys at "
          f"{args.mult}x sf0.1", flush=True)

    spark = get_spark("midpoint-hunt")
    ok, bad = 0, []
    record: dict[str, dict] = {}
    for k in keys:
        gc.collect()
        t0 = time.perf_counter()
        try:
            compare_to_oracle(spark, k, str(out))
            ok += 1
            record[k] = {"status": "exact_eq",
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: EXACT-EQ", flush=True)
        except Exception as ex:  # noqa: BLE001 — hunt must keep going
            bad.append((k, type(ex).__name__))
            record[k] = {"status": f"fail:{type(ex).__name__}",
                         "detail": str(ex)[:300],
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
    print(f"SUMMARY ok={ok} bad={len(bad)} {bad}", flush=True)
    if args.record:
        with open(args.record, "w") as f:
            json.dump(
                {
                    "mult": args.mult,
                    "src": args.src,
                    "n_keys": len(keys),
                    "selector": "sub-38-precision DECIMAL cast in fn source"
                                " + r7 restatements",
                    "ok": ok,
                    "bad": len(bad),
                    "keys": record,
                },
                f,
                indent=1,
            )
        print(f"record written: {args.record}", flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
