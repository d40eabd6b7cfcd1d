#!/usr/bin/env python
"""Degenerate-corpus robustness probe (round 8).

The 10x-octave midpoint hunt caught ts_zscore_rolling crashing with an
ANSI DIVIDE_BY_ZERO on near-constant windows — a hazard class the normal
fixtures can never reach: divisions by COMPUTED spreads (rolling
variance, sqrt-product denominators, max-min ranges) that collapse to
exactly 0 when a series flat-lines. At 100 TB flat-lined sensors,
zero-variance cohorts, and constant-price SKUs are routine, so "works on
the fixture" is not "works on real data".

This probe builds the hostile corpus deliberately: every numeric VALUE
column is constant (events.value, lineitem quantity/price/discount/tax,
orders.o_totalprice, embeddings a constant non-zero vector), while keys,
timestamps, FK structure, and document text are untouched — so every
group/window/frame has ZERO variance but all joins and grids still
resolve. Then every registry key must EXECUTE (crash-freedom), and every
oracle-bearing key must still match DuckDB EXACTLY (the degenerate
defaults — 0 z-scores, 0.5 %%B, guard fallbacks — must be the SAME
degenerate defaults in both engines, or the guard is a parity bug).

Two corpus variants:

- `constant` (default): every numeric value column constant — the
  zero-variance axis (rolling variance, correlation denominators, MAD,
  entropy products).
- `zerovec`: all OTHER tables untouched (varied values), but embeddings
  rows 0-4 are all-zero vectors (failed-embedding rows — and vec_ids 0+
  are exactly the centroid/query seeds, the harshest placement) and
  documents 0-4 carry empty/whitespace-only text — the undefined-cosine
  / empty-tokenization axis.

Usage:
    python tools/degenerate_probe.py [--variant constant|zerovec]
                                     [--keys a,b] [--record PATH]
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
SRC = "/root/testdata/sf0.001"
OUT = Path("/tmp/spark_graft_degenerate")

# value columns forced constant, per table (keys/dates/text untouched)
CONST_COLS = {
    "events": {"value": 100.0},
    "lineitem": {
        "l_quantity": 25.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
    },
    "orders": {"o_totalprice": 5000.0},
}
COPY = ("region", "nation", "customer", "supplier", "part", "documents")
EMB_CONST = 3  # constant non-zero component (norm > 0: cosine defined)


def stage_zerovec(out: Path) -> None:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    idx = emb.schema.get_field_index("embedding")
    vecs = emb.column("embedding").to_pylist()
    dim = len(vecs[0])
    for i in range(min(5, len(vecs))):
        vecs[i] = [0.0] * dim
    emb = emb.set_column(
        idx, emb.field(idx), pa.array(vecs, emb.field(idx).type)
    )
    pq.write_table(emb, out / "embeddings.parquet")

    docs = pq.read_table(f"{SRC}/documents.parquet")
    t_idx = docs.schema.get_field_index("text")
    texts = docs.column("text").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    for i, did in enumerate(ids):
        if did in (0, 1, 2):
            texts[i] = ""
        elif did in (3, 4):
            texts[i] = "   "
    docs = docs.set_column(
        t_idx, docs.field(t_idx), pa.array(texts, pa.string())
    )
    n_idx = docs.schema.get_field_index("n_chars")
    import pyarrow.compute as pc  # noqa: F401 — keep n_chars consistent

    nchars = [len(t) for t in texts]
    docs = docs.set_column(
        n_idx, docs.field(n_idx),
        pa.array(nchars, docs.field(n_idx).type),
    )
    pq.write_table(docs, out / "documents.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (zerovec)", flush=True)


def stage_sparse(out: Path) -> None:
    """Skeletal corpus: every table tiny, events reduced to a SINGLE
    event type — the empty-group / empty-frame axis (a cross-series
    operator sees one series and zero pairs; control-plane collect()s
    see empty or 1-row frames; windows see groups smaller than their
    taps). FK pairs are kept consistent (lineitem filtered to surviving
    orderkeys) so join semantics stay honest."""
    import shutil

    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    ev = pq.read_table(f"{SRC}/events.parquet")
    only = pc.equal(ev.column("event_type"), "click")
    pq.write_table(ev.filter(only).slice(0, 200), out / "events.parquet")

    orders = pq.read_table(f"{SRC}/orders.parquet").slice(0, 200)
    pq.write_table(orders, out / "orders.parquet")
    keep = set(orders.column("o_orderkey").to_pylist())
    li = pq.read_table(f"{SRC}/lineitem.parquet")
    mask = pc.is_in(
        li.column("l_orderkey"),
        value_set=orders.column("o_orderkey").combine_chunks(),
    )
    pq.write_table(li.filter(mask), out / "lineitem.parquet")

    pq.write_table(
        pq.read_table(f"{SRC}/documents.parquet").slice(0, 30),
        out / "documents.parquet",
    )
    pq.write_table(
        pq.read_table(f"{SRC}/embeddings.parquet").slice(0, 10),
        out / "embeddings.parquet",
    )
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (sparse)", flush=True)


def stage_nulls(out: Path) -> None:
    """NULL-bearing corpus: events.value NULL on event_id % 20 == 0 (a
    feed with failed measurements), documents.text NULL on
    doc_id % 25 == 0 (failed fetches), orders.o_totalprice NULL on
    o_orderkey % 30 == 0. Keys/timestamps/types untouched. The axis
    probes NULL propagation (aggregates skip, expressions propagate) and
    — the known latent class — ORDER BY on a nullable column: Spark
    defaults NULLS FIRST ascending, DuckDB NULLS LAST."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    def null_out(table, key: str, col: str, mod: int):
        keys = table.column(key).to_numpy(zero_copy_only=False)
        mask = pa.array((keys % mod) == 0)
        idx = table.schema.get_field_index(col)
        nulled = pc.if_else(
            mask, pa.scalar(None, table.field(idx).type), table.column(col)
        )
        return table.set_column(idx, table.field(idx), nulled)

    ev = pq.read_table(f"{SRC}/events.parquet")
    pq.write_table(null_out(ev, "event_id", "value", 20),
                   out / "events.parquet")
    docs = pq.read_table(f"{SRC}/documents.parquet")
    pq.write_table(null_out(docs, "doc_id", "text", 25),
                   out / "documents.parquet")
    orders = pq.read_table(f"{SRC}/orders.parquet")
    pq.write_table(null_out(orders, "o_orderkey", "o_totalprice", 30),
                   out / "orders.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (nulls)", flush=True)


# Fifth axis: adversarial text CONTENT (a 100 TB crawl corpus contains
# all of these). Each stride class targets a structural assumption:
#  - CJK without spaces: whitespace tokenizers see ONE giant token
#    (shingle short-circuits, BPE \w is ASCII-only in BOTH Java and RE2)
#  - emoji / ZWJ sequences / astral plane: code-point-vs-byte length,
#    substring boundaries, md5 over 4-byte UTF-8
#  - combining marks + RTL: NFC/NFD byte differences, direction marks
#  - C0 control chars: JSON escaping conventions (\\u0001 form) differ
#    between engines more often than printable text
#  - embedded tab/newline: framing of line-oriented exports (scan_text,
#    JSONL) — the round-trip must escape or document, never corrupt
_HOSTILE = {
    0: "星期一火车站很大数据处理引擎快速排序合并分区窗口小哈希扫描连接",
    5: "data 🚀🚀 pipeline 👩‍👩‍👧‍👦 test 𝄞 clef mixed",
    10: "café café עברית ascii tail",
    15: "ctl\x01\x02 bell\x07 esc\x1b unit\x1f end",
    20: "col1\tcol2\nline2 word\ttrailing",
}


def stage_hostiletext(out: Path) -> None:
    """Adversarial text content on doc_id % 25 strides (suffix keeps
    each doc unique so the dedup families don't see a fabricated
    clique); n_chars is re-derived as Python len == code points, the
    same unit Spark's length() and DuckDB's length() count."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs.column("text").to_pylist()
    ids = docs.column("doc_id").to_pylist()
    for i, did in enumerate(ids):
        body = _HOSTILE.get(did % 25)
        if body is not None:
            texts[i] = f"{body} id{did}"
    t_idx = docs.schema.get_field_index("text")
    docs = docs.set_column(
        t_idx, docs.field(t_idx), pa.array(texts, pa.string())
    )
    n_idx = docs.schema.get_field_index("n_chars")
    docs = docs.set_column(
        n_idx, docs.field(n_idx),
        pa.array([len(t) for t in texts], docs.field(n_idx).type),
    )
    pq.write_table(docs, out / "documents.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (hostiletext)", flush=True)


def stage_clockskew(out: Path) -> None:
    """Sixth axis: corrupt clocks — routine at 100 TB (NTP drift, retry
    storms, unset RTCs). events.ts rewritten on event_id % 20 strides:
      0  -> far future (2030-06-15 + id-spread seconds): a grid/gapfill
            between min and max hour must survive a 6-year span
      5  -> pre-epoch (1969-07-20 + id-spread): negative epoch micros
            through unix_micros/date arithmetic/strftime
      10 -> exact DUPLICATE of the previous event's ts (retry delivery):
            every ORDER BY ts needs its event_id tiebreak to be real
      15 -> microsecond boundary (.999999): truncation vs rounding at
            the hour/day edge
    Values/keys untouched; other tables copied."""
    import datetime
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = out / ".staged"
    if marker.exists():
        print(f"stage: reusing {out}", flush=True)
        return
    out.mkdir(parents=True, exist_ok=True)

    ev = pq.read_table(f"{SRC}/events.parquet")
    ids = ev.column("event_id").to_pylist()
    tss = ev.column("ts").to_pylist()
    future = datetime.datetime(2030, 6, 15, 0, 0, 0)
    past = datetime.datetime(1969, 7, 20, 20, 17, 40)
    for i, eid in enumerate(ids):
        m = eid % 20
        if m == 0:
            tss[i] = future + datetime.timedelta(seconds=eid % 997)
        elif m == 5:
            tss[i] = past + datetime.timedelta(seconds=eid % 997)
        elif m == 10 and i > 0:
            tss[i] = tss[i - 1]
        elif m == 15:
            tss[i] = tss[i].replace(microsecond=999999)
    t_idx = ev.schema.get_field_index("ts")
    ev = ev.set_column(
        t_idx, ev.field(t_idx), pa.array(tss, ev.field(t_idx).type)
    )
    pq.write_table(ev, out / "events.parquet")

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", out / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {out} (clockskew)", flush=True)


def stage() -> None:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    marker = OUT / ".staged"
    if marker.exists():
        print(f"stage: reusing {OUT}", flush=True)
        return
    OUT.mkdir(parents=True, exist_ok=True)
    for t, consts in CONST_COLS.items():
        tab = pq.read_table(f"{SRC}/{t}.parquet")
        for col, v in consts.items():
            idx = tab.schema.get_field_index(col)
            typ = tab.field(idx).type
            tab = tab.set_column(
                idx, tab.field(idx), pa.array([v] * len(tab), typ)
            )
        pq.write_table(tab, OUT / f"{t}.parquet")
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    dim = len(emb.column("embedding")[0])
    idx = emb.schema.get_field_index("embedding")
    const_vec = pa.array(
        [[float(EMB_CONST)] * dim] * len(emb), emb.field(idx).type
    )
    emb = emb.set_column(idx, emb.field(idx), const_vec)
    pq.write_table(emb, OUT / "embeddings.parquet")
    for t in COPY:
        shutil.copy(f"{SRC}/{t}.parquet", OUT / f"{t}.parquet")
    marker.touch()
    print(f"stage: wrote {OUT}", flush=True)


def main() -> None:
    global OUT, SRC
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="")
    ap.add_argument("--record", default="")
    ap.add_argument("--variant", default="constant",
                    choices=("constant", "zerovec", "sparse", "nulls",
                             "hostiletext", "clockskew"))
    ap.add_argument("--src", default=SRC,
                    help="fixture dir to degrade (default sf0.001; r9 "
                    "VERDICT item 4 runs the nulls axis at sf0.1 to "
                    "scale-check the guard CASE wrappers)")
    args = ap.parse_args()
    if args.record:
        args.record = os.path.abspath(args.record)

    sys.path.insert(0, REPO)
    # non-default source gets its own staging dirs (the .staged marker
    # would otherwise silently reuse a corpus staged from another SF)
    suffix = ""
    if args.src != SRC:
        SRC = args.src
        suffix = "_" + Path(args.src.rstrip("/")).name
    if args.variant == "zerovec":
        OUT = Path(f"/tmp/spark_graft_degenerate_zerovec{suffix}")
        stage_zerovec(OUT)
    elif args.variant == "sparse":
        OUT = Path(f"/tmp/spark_graft_degenerate_sparse{suffix}")
        stage_sparse(OUT)
    elif args.variant == "nulls":
        OUT = Path(f"/tmp/spark_graft_degenerate_nulls{suffix}")
        stage_nulls(OUT)
    elif args.variant == "hostiletext":
        OUT = Path(f"/tmp/spark_graft_degenerate_hostiletext{suffix}")
        stage_hostiletext(OUT)
    elif args.variant == "clockskew":
        OUT = Path(f"/tmp/spark_graft_degenerate_clockskew{suffix}")
        stage_clockskew(OUT)
    else:
        OUT = Path(f"/tmp/spark_graft_degenerate{suffix}")
        stage()

    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark
    from tests.oracle import compare_to_oracle

    reg = load_all()
    keys = [k for k in args.keys.split(",") if k] or list(reg)
    spark = get_spark("degenerate-probe")
    ok, bad = 0, []
    record: dict[str, dict] = {}
    for k in keys:
        gc.collect()
        t0 = time.perf_counter()
        try:
            if reg[k].oracle is not None:
                compare_to_oracle(spark, k, str(OUT))
                status, cls = "exact_eq", "oracle"
            else:
                rows = reg[k].fn(spark, str(OUT)).collect()
                status, cls = "ok", "rows_only"
            ok += 1
            record[k] = {"class": cls, "status": status,
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: {status.upper()}", flush=True)
        except Exception as ex:  # noqa: BLE001 — probe must keep going
            bad.append((k, type(ex).__name__))
            record[k] = {
                "class": "oracle" if reg[k].oracle else "rows_only",
                "status": f"fail:{type(ex).__name__}",
                "detail": str(ex)[:300],
                "sec": round(time.perf_counter() - t0, 3),
            }
            print(f"{k}: FAIL {type(ex).__name__}: {str(ex)[:200]}",
                  flush=True)
    print(f"SUMMARY ok={ok} bad={len(bad)} {bad}", flush=True)
    if args.record:
        with open(args.record, "w") as f:
            json.dump(
                {
                    "corpus": (
                        "constant-value degenerate (zero variance "
                        "everywhere, structure intact)"
                        if args.variant == "constant"
                        else "zerovec/empty-text degenerate (zero-norm "
                             "embedding rows 0-4 incl. centroid/query "
                             "seeds; empty + whitespace-only documents "
                             "0-4; other tables untouched)"
                        if args.variant == "zerovec"
                        else "sparse/skeletal (single event type, tiny "
                             "tables, FK-consistent) — the empty-group/"
                             "empty-frame axis"
                        if args.variant == "sparse"
                        else "null-bearing (events.value / documents.text"
                             " / orders.o_totalprice NULL on key strides)"
                        if args.variant == "nulls"
                        else "hostile text content (CJK no-space, emoji/"
                             "ZWJ/astral, combining+RTL, C0 controls, "
                             "embedded tab/newline on doc_id strides)"
                        if args.variant == "hostiletext"
                        else "clock skew (far-future/pre-epoch ts, exact"
                             " duplicate ts, microsecond-boundary ts on"
                             " event_id strides)"
                    ),
                    "variant": args.variant,
                    "src": SRC,
                    "n_keys": len(keys),
                    "full_registry": len(keys) == len(reg),
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
