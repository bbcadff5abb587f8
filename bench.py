"""Headline benchmark — the driver runs this per-round at sf0.1 and
records the JSON line against BASELINE.md.

Each headline query is forced end-to-end with the `noop` sink (full
computation, no driver-side materialization — collect() would make the
driver the bottleneck and measure the wrong thing).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nchu_bigdata_spark.registry import load_all_queries
from nchu_bigdata_spark.session import get_session

# Representative per family: scan+agg, 3-way join, window, session
# window, grouped pandas UDF, and the LLM-data ops as they land.
HEADLINE = [
    "agg_hash",
    "join_shuffle",
    "win_running_total",
    "stream_session",
    "udtf_apply_in_pandas",
    "dedup_minhash",
    "sim_topk",
    "kmeans_fit",
    "text_tokenize_tfidf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_session("bench")
    specs = load_all_queries()
    names = [n for n in HEADLINE if n in specs]

    # Warm the JVM/codegen once on a trivial action so q1 isn't charged
    # for session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
