"""Dump explain('formatted') for named queries into plans/<outdir>/.

Usage: python tools/dump_plans.py --out plans/r14 --suffix _before q1 q2 ...
Checkpointed segment plans are appended (materialize.SEGMENT_PLANS),
since the final plan alone shows only `Scan ExistingRDD` for them.
"""
from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from nchu_bigdata_spark import materialize
from nchu_bigdata_spark.registry import load_all_queries
from nchu_bigdata_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r14")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    materialize.CAPTURE_SEGMENT_PLANS = True
    spark = get_session("dump_plans")
    specs = load_all_queries()
    for name in args.queries:
        if name not in specs:
            print(f"?? unknown {name}")
            continue
        materialize.SEGMENT_PLANS.clear()
        df = specs[name].fn(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue()
        for tag, seg in materialize.SEGMENT_PLANS.items():
            text += f"\n\n===== checkpointed segment: {tag} =====\n{seg}"
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
