"""Synthetic 10× scale probe for the TRUE streaming runner (VERDICT
r11 item 8: streaming/runner.py was the one module whose scale claims
rested on plan-shape argument alone — the §2.B-9 ids were probed only
in their BATCH form by tools/scale_probe.py).

What this measures: the full Structured Streaming execution — file
source discovery, microbatch scheduling, state-store maintenance, sink
commit protocol — of every STREAM_TRANSFORMS operator plus the
foreachBatch CDC upsert, at 1× and 10× input, draining AvailableNow
into the noop sink (zero driver materialization; the memory sink the
parity tests use would time the driver's collect instead).

Blow-up construction (same scheme as tools/scale_probe.py): 10 copies
of sf0.1 events with event_id/user_id shifted by i×10⁷ — per-user
streams replicate, so session/dedup/stateful key cardinality is ×10
with no new hot keys, and windowed-agg state is unchanged per key
group. Timestamps are untouched: watermarks and window boundaries see
identical event-time distributions at both scales. File counts scale
with data (8 → 80 input files) so microbatch mechanics scale the same
way a production backlog drain does.

Gate: 10×/1× runtime ratio < 25 (quadratic would be ~100; linear ~10;
state-store ops carry a per-key constant so sublinear ratios are
common on a 32-core box that is underutilized at 1×).

Usage:
    python tools/stream_probe.py [--reps 2] [--ops op1,op2,...]

Prints a markdown table (paste into SCALE_PROBE.md); exits non-zero on
a gate breach.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.session import get_session
from nchu_bigdata_spark.streaming import STREAM_TRANSFORMS
from nchu_bigdata_spark.streaming import runner as R

BASE_SF = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10_000_000
GATE_RATIO = 25.0

SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "stream_probe",
)


def build_inputs(spark) -> tuple[str, str]:
    """Write 1× and 10× event corpora as multi-file parquet dirs."""
    one = os.path.join(SCRATCH, "ev1x")
    ten = os.path.join(SCRATCH, "ev10x")
    ev = table(spark, BASE_SF, "events")
    if not os.path.exists(os.path.join(one, "_SUCCESS")):
        ev.repartition(8).write.mode("overwrite").parquet(one)
    if not os.path.exists(os.path.join(ten, "_SUCCESS")):
        big = None
        for i in range(COPIES):
            c = ev.select(
                (F.col("event_id") + F.lit(i * SHIFT)).alias("event_id"),
                (F.col("user_id") + F.lit(i * SHIFT)).alias("user_id"),
                "event_type",
                "ts",
                "value",
                *[c for c in ev.columns if c not in
                  ("event_id", "user_id", "event_type", "ts", "value")],
            )
            big = c if big is None else big.unionByName(c)
        big.repartition(80).write.mode("overwrite").parquet(ten)
    return one, ten


def run_one(spark, name: str, path: str) -> tuple[float, int]:
    """One drained streaming run; returns (secs, max state rows)."""
    t0 = time.perf_counter()
    if name == "stream_cdc_upsert":
        tgt = os.path.join(SCRATCH, "cdc_target")
        shutil.rmtree(tgt, ignore_errors=True)
        R.run_events_cdc_upsert(spark, path, tgt).write.mode(
            "overwrite"
        ).format("noop").save()
    else:
        transform, mode = STREAM_TRANSFORMS[name]
        R.run_events_stream_to_noop(spark, path, transform, output_mode=mode)
    secs = time.perf_counter() - t0
    state = 0
    for p in R.last_run_progress:
        for so in p.get("stateOperators", []) or []:
            state = max(state, int(so.get("numRowsTotal", 0)))
    return secs, state


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--ops", type=str, default="")
    args = ap.parse_args()
    ops = (
        [o.strip() for o in args.ops.split(",") if o.strip()]
        if args.ops
        else [*STREAM_TRANSFORMS, "stream_cdc_upsert"]
    )
    spark = get_session("stream-probe")
    one, ten = build_inputs(spark)

    rows = []
    breach = False
    for name in ops:
        t1 = min(run_one(spark, name, one)[0] for _ in range(args.reps))
        # capture state rows from the LAST 1x run deliberately after
        # timing; rerun once for the telemetry pair
        _, s1 = run_one(spark, name, one)
        t10 = min(run_one(spark, name, ten)[0] for _ in range(args.reps))
        _, s10 = run_one(spark, name, ten)
        ratio = t10 / t1 if t1 else float("inf")
        rows.append((name, t1, t10, ratio, s1, s10))
        if ratio >= GATE_RATIO:
            breach = True
        print(
            f"  {name}: 1x {t1:.2f}s  10x {t10:.2f}s  ratio {ratio:.1f}x"
            f"  state {s1} -> {s10}",
            file=sys.stderr,
        )

    print("| op | 1x sec | 10x sec | ratio | 1x state rows | 10x state rows |")
    print("|---|---|---|---|---|---|")
    for name, t1, t10, ratio, s1, s10 in rows:
        print(
            f"| {name} | {t1:.2f} | {t10:.2f} | {ratio:.1f}x | {s1} | {s10} |"
        )
    if breach:
        print(f"GATE BREACH: ratio >= {GATE_RATIO}", file=sys.stderr)
        return 1
    print(f"all ratios < {GATE_RATIO} (quadratic would be ~100x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
