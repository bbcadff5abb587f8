"""Per-query profiler for the optimization rounds (guide §1).

For each named query, separates where the wall-clock goes:

  * build   — Python-side DataFrame construction (py4j + analysis)
  * segs    — each eager ``shared_intermediate``/``shared_partitioned``
              materialization job inside the build, by tag
  * exec    — the final noop-sink execution (full computation)

Methodology matches bench.py (warm session, noop sink, N reps, min).

Usage:
    python tools/profile_query.py [--sf DIR] [--reps N] query [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from nchu_bigdata_spark import materialize
from nchu_bigdata_spark.registry import load_all_queries
from nchu_bigdata_spark.session import get_session

SEG_TIMES: list[tuple[str, float]] = []

_orig_si = materialize.shared_intermediate
_orig_sp = materialize.shared_partitioned


def _timed_si(tag, df, eager=True):
    t0 = time.perf_counter()
    out = _orig_si(tag, df, eager)
    SEG_TIMES.append((tag, time.perf_counter() - t0))
    return out


def _timed_sp(tag, df):
    t0 = time.perf_counter()
    out = _orig_sp(tag, df)
    SEG_TIMES.append((tag + " [persist]", time.perf_counter() - t0))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--rank-build",
        type=int,
        default=0,
        metavar="N",
        help="sweep EVERY registered query, time one DataFrame "
        "construction (py4j + analysis; eager freeze segments "
        "subtracted), print the top N by pure build time — the "
        "VERDICT r14 item-9 plan-construction-tail ranking",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if not args.rank_build and not args.queries:
        ap.error("name queries to profile, or pass --rank-build N")

    materialize.shared_intermediate = _timed_si
    materialize.shared_partitioned = _timed_sp

    spark = get_session("profile")
    specs = load_all_queries()
    # operators import the helpers by name; patch those references AFTER
    # load_all_queries so late imports get patched refs too (this loop
    # subsumes a pre-load pass — ADVICE r14)
    for mod in list(sys.modules.values()):
        if mod is None or not getattr(mod, "__name__", "").startswith(
            "nchu_bigdata_spark"
        ):
            continue
        for attr in ("shared_intermediate", "shared_partitioned"):
            if getattr(mod, attr, None) in (_orig_si, _orig_sp):
                setattr(
                    mod,
                    attr,
                    _timed_si if attr == "shared_intermediate" else _timed_sp,
                )

    # warm the runtime like bench.warm does (cheap subset)
    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    if args.rank_build:
        ranked = []
        for name in sorted(specs):
            SEG_TIMES.clear()
            spark.sparkContext.setJobDescription(f"rank-build:{name}")
            t0 = time.perf_counter()
            try:
                specs[name].fn(spark, args.sf)
            except Exception as e:  # streaming-only ops etc.
                print(f"?? {name}: build failed: {e}")
                continue
            wall = time.perf_counter() - t0
            seg = sum(s for _, s in SEG_TIMES)
            ranked.append((wall - seg, seg, name))
        ranked.sort(reverse=True)
        print("| query | pure build s | freeze segs s |")
        print("|---|---|---|")
        for pure, seg, name in ranked[: args.rank_build]:
            print(f"| {name} | {pure:.3f} | {seg:.3f} |")
        total = sum(p for p, _, _ in ranked)
        print(f"(swept {len(ranked)} queries, total pure build {total:.1f}s)")
        return

    for name in args.queries:
        if name not in specs:
            print(f"?? unknown query {name}")
            continue
        rows = []
        for _ in range(args.reps):
            SEG_TIMES.clear()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, args.sf)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, list(SEG_TIMES)))
        rows.sort(key=lambda r: r[0] + r[1])
        build, execu, segs = rows[0]
        seg_total = sum(s for _, s in segs)
        print(
            f"{name}: total={build + execu:.3f}s  build={build:.3f}s "
            f"(segments {seg_total:.3f}s)  exec={execu:.3f}s"
        )
        for tag, s in segs:
            print(f"    seg {tag}: {s:.3f}s")


if __name__ == "__main__":
    main()
