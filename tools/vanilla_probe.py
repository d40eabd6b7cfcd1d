#!/usr/bin/env python
"""Driver-environment simulation: run registry keys on a BARE SparkSession
from a working directory OUTSIDE the repo, with the repo reachable only via
a driver-side sys.path insert — the harshest launch shape a harness can use.

This is the probe that caught the round-5 worker-portability bug (UDF
helpers and the Python DataSource pickling by reference, so python workers
needed the repo on their own sys.path). The in-repo pytest suite can never
see that class: its workers inherit the repo CWD.

Usage (from anywhere):
    python /root/repo/tools/vanilla_probe.py [--start N] [--count M] [--keys a,b]
                                             [--record PATH]
Compares oracle-bearing keys differentially against DuckDB at sf0.01
(exact, order-insensitive, column-name-sorted — the driver's check) and
runs rows-only keys for execution + stable schema.

--record PATH writes a JSON artifact (per-key class/status + summary).
This is the ROUND-CLOSE GATE (VERDICT r5 item 2): before ending a round,
run the FULL registry with --record PROBE_r{N}.json and commit the record
next to the driver's CORRECTNESS files — see VERIFY_ROUND.md. The local
pytest parity suite defaults to sf0.001; this probe is the recorded
sf0.01 (driver-scale) evidence for every key, not just the ~50 the
driver window certifies per round.
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=10_000)
    ap.add_argument("--keys", default="")
    ap.add_argument("--record", default="", help="write JSON record here")
    ap.add_argument(
        "--staging",
        default="",
        choices=("", "localCheckpoint", "persist_disk", "checkpoint"),
        help="set spark.graft.staging for the whole probe (VERDICT r7 "
        "item 1: the cluster staging sweep); persist_disk/checkpoint "
        "also get a scratch checkpoint dir so stage_iter's reliable "
        "path is the one exercised",
    )
    args = ap.parse_args()
    if args.record:
        # resolve against the LAUNCH cwd before the hostile chdir below —
        # otherwise a relative --record PROBE_r{N}.json lands in /tmp and
        # the round-close commit step can't find it (bit r7)
        args.record = os.path.abspath(args.record)

    # simulate the hostile launch: cwd outside the repo, path insert only
    os.chdir("/tmp")
    sys.path.insert(0, REPO)

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if args.staging:
        spark.conf.set("spark.graft.staging", args.staging)
        if args.staging in ("persist_disk", "checkpoint"):
            import tempfile

            spark.sparkContext.setCheckpointDir(
                tempfile.mkdtemp(prefix="graft_probe_ck_")
            )
    qs, osql = m.queries(), m.oracle_sql()
    keys = (
        [k for k in args.keys.split(",") if k]
        or list(qs)[args.start:args.start + args.count]
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    # warm the JVM/scan path once so the first key's recorded `sec` is the
    # key's own cost, not session spin-up (PROBE_r06 first-key read 7.5 s
    # for a 0.6 s operator before this)
    spark.read.parquet(f"{SF}/region.parquet").collect()

    ok = 0
    bad: list[tuple[str, str]] = []
    record: dict[str, dict] = {}
    for k in keys:
        # release prior keys' localCheckpoint blocks so late-position
        # `sec` readings aren't inflated by accumulated block pressure
        gc.collect()
        t0 = time.perf_counter()
        try:
            sdf = qs[k](spark, SF)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            if k not in osql:
                assert scols, f"{k}: empty schema"
                ok += 1
                record[k] = {"class": "rows_only", "status": "ok",
                             "spark_rows": len(srows),
                             "sec": round(time.perf_counter() - t0, 3)}
                print(f"{k}: rows-only OK ({len(srows)} rows)", flush=True)
                continue
            res = con.sql(osql[k])
            drows = res.fetchall()
            dcols = sorted(res.columns)
            order = {c: i for i, c in enumerate(sdf.columns)}
            dorder = {c: i for i, c in enumerate(res.columns)}
            sn = sorted(
                (tuple(r[order[c]] for c in scols) for r in srows), key=repr
            )
            dn = sorted(
                (tuple(r[dorder[c]] for c in dcols) for r in drows), key=repr
            )
            if scols == dcols and len(sn) == len(dn) and sn == dn:
                ok += 1
                record[k] = {"class": "oracle", "status": "exact_eq",
                             "spark_rows": len(sn),
                             "sec": round(time.perf_counter() - t0, 3)}
                print(f"{k}: EXACT-EQ ({len(sn)} rows)", flush=True)
            else:
                bad.append((k, "mismatch"))
                record[k] = {"class": "oracle", "status": "mismatch",
                             "spark_rows": len(sn), "oracle_rows": len(dn),
                             "sec": round(time.perf_counter() - t0, 3)}
                print(f"{k}: MISMATCH", flush=True)
        except Exception as ex:  # noqa: BLE001 - probe must keep going
            bad.append((k, type(ex).__name__))
            record[k] = {"class": "oracle" if k in osql else "rows_only",
                         "status": f"error:{type(ex).__name__}",
                         "sec": round(time.perf_counter() - t0, 3)}
            print(f"{k}: ERROR {type(ex).__name__}: {str(ex)[:160]}", flush=True)
    print(f"SUMMARY ok={ok} bad={len(bad)} {bad}")
    if args.record:
        import json

        with open(args.record, "w") as f:
            json.dump(
                {
                    "sf_dir": SF,
                    "n_keys": len(keys),
                    "n_registry": len(qs),
                    # a partial record must be self-identifying: the
                    # round-close gate (VERIFY_ROUND.md) requires
                    # full_registry == true, so a --keys/--start/--count
                    # subset run can never masquerade as the gate artifact
                    "full_registry": len(keys) == len(qs),
                    "args": {
                        "start": args.start,
                        "count": args.count,
                        "keys": args.keys,
                        "staging": args.staging,
                    },
                    "ok": ok,
                    "bad": len(bad),
                    "keys": record,
                },
                f,
                indent=1,
            )
        print(f"record written: {args.record}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
