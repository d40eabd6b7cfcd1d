#!/usr/bin/env python
"""Capture .explain('formatted') output for registry keys into plans/r11/.

Usage: python tools/capture_plans.py --keys a,b,c --suffix before
       (default sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1)

The optimization-round deliverable: the judge checks plan claims in
OPTIMIZATION_r11.md against these committed files (guide §1/§7.2).
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", required=True)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r11"))
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    from bitcoin_price_etl_spark.registry import load_all
    from bitcoin_price_etl_spark.session import get_spark

    spark = get_spark("bpe-plan-capture")
    registry = load_all()
    os.makedirs(args.outdir, exist_ok=True)
    for key in [k for k in args.keys.split(",") if k]:
        df = registry[key].fn(spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.outdir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
