"""Data-profiling / catalog-statistics operators (SURVEY.md §2.B-4
extension): the ANALYZE TABLE surface every engine with a cost-based
optimizer needs — per-column row counts, null counts, exact NDV, and
key ranges, emitted as a tidy statistics table.

The reference has no statistics at all (no optimizer — §4); Spark's
own `ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS` produces exactly
this shape into the catalog. Exposing it as a QUERY makes the stats
pipeline testable cross-engine and reusable for data-quality
monitoring (null-rate drift, NDV drift between loads).

Scale (100 TB): ONE scan. The multi-column distinct aggregate compiles
to Catalyst's Expand strategy — each input row fans out once per
DISTINCT group internally, but partial aggregation collapses
map-side before the single shuffle, so wire volume is bounded by
Σ per-column NDV, not row count. min/max ride the same pass for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register

# Profiled columns of `orders`; (name, is_bigint_key) — key ranges are
# emitted only for exact-integer columns (portable bit-for-bit; float/
# timestamp extremes as strings would reintroduce the formatting
# divergence compat.py exists to avoid).
_PROFILE_COLS = [
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", False),
    ("o_orderdate", False),
    ("o_orderpriority", False),
]


def _profile_oracle() -> str:
    legs = []
    for c, is_key in _PROFILE_COLS:
        mn = f"CAST(MIN({c}) AS BIGINT)" if is_key else "CAST(NULL AS BIGINT)"
        mx = f"CAST(MAX({c}) AS BIGINT)" if is_key else "CAST(NULL AS BIGINT)"
        legs.append(
            f"""SELECT '{c}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
                   {mn} AS min_key, {mx} AS max_key
            FROM orders"""
        )
    return "\nUNION ALL\n".join(legs)


@register("stats_profile", tags=("b4",), oracle=_profile_oracle())
def stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column table statistics for `orders`: total rows, null
    count, EXACT NDV, and min/max for integer key columns — the
    ANALYZE-TABLE / data-quality-profiling primitive (module doc).

    Plan: ONE wide aggregate computes every column's stats in a single
    scan (Catalyst rewrites the multi-column DISTINCT set into one
    Expand + two-level hash agg — asserted free of per-column rescans),
    then a `stack` projection tidies the 1-row result into one row per
    column. The sketch-based companion is `agg_approx`
    (approx_count_distinct) when exact NDV is too expensive; this is
    the exact calibration side."""
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c, is_key in _PROFILE_COLS:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"null_{c}"))
        aggs.append(F.countDistinct(c).alias(f"ndv_{c}"))
        if is_key:
            aggs.append(F.min(c).cast("long").alias(f"min_{c}"))
            aggs.append(F.max(c).cast("long").alias(f"max_{c}"))
    one = o.agg(*aggs)
    stack_args = []
    for c, is_key in _PROFILE_COLS:
        mn = f"min_{c}" if is_key else "CAST(NULL AS BIGINT)"
        mx = f"max_{c}" if is_key else "CAST(NULL AS BIGINT)"
        stack_args.append(f"'{c}', null_{c}, ndv_{c}, {mn}, {mx}")
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {', '.join(stack_args)}) "
            "AS (col_name, n_null, ndv, min_key, max_key)"
        ),
        "n",
    ).select("col_name", "n", "n_null", "ndv", "min_key", "max_key")
