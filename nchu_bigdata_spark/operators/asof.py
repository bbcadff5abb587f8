"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key (SURVEY.md §2.B-3 ``join_asof``).

The reference has no temporal joins (its only join-like op is the
k×N centroid cross-compare, ``hadoop_tutorial/src/Kmeans.java:62-77``);
this generalizes that capability to the time axis per the north star.

Spark-first design — the *union + carry-forward window* formulation:
tag both inputs, union them, and run ``last(value, ignorenulls=True)``
over ``partitionBy(key).orderBy(ts, tag)`` with an unbounded-preceding
row frame; keep only left rows. Versus a pandas ``merge_asof`` per
group, this

  * is pure JVM/codegen (no Python, no Arrow transfer);
  * costs exactly ONE shuffle (by key) + one sort within partitions —
    the same cost as any keyed window, so it scales to 100 TB the way
    window functions do;
  * holds O(1) running state per key (the carried value), never
    buffering a group.

Right rows sort before left rows at equal timestamps, giving inclusive
"at or before" semantics (matches DuckDB ``ASOF JOIN ... ON l.ts >=
r.ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.compat import dround, ts_micros
from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register

_RIGHT, _LEFT = 0, 1  # sort order on ties: right first => inclusive


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left ⟕ most-recent right (r.ts <= l.ts) per
    ``by`` key. Right's ``value_cols`` appear suffixed; unmatched left
    rows keep NULLs (left-outer semantics).

    Requires (by, ts) unique within ``right`` for determinism.
    """
    out_vals = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(_RIGHT).alias("_src"),
        *[F.col(c).alias(o) for c, o in zip(value_cols, out_vals)],
    )
    l = left.withColumn("_src", F.lit(_LEFT))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for o in out_vals:
        u = u.withColumn(o, F.last(o, ignorenulls=True).over(w))
    return u.filter(F.col("_src") == _LEFT).drop("_src")


@register(
    "join_asof",
    tags=("b3",),
    oracle="""
        SELECT l.event_id,
               epoch_us(l.ts) AS ts_us,
               l.user_id,
               CAST(ROUND(l.value, 4) AS DECIMAL(18,4)) AS click_value,
               CAST(ROUND(r.value, 4) AS DECIMAL(18,4)) AS purchase_value_asof,
               epoch_us(r.ts) AS purchase_ts_asof_us
        FROM (SELECT * FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at or before
    it (classic trade⟕quote shape)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases.withColumnRenamed("value", "purchase_value")
        .withColumn("purchase_ts", F.col("ts")),
        by="user_id",
        ts_col="ts",
        value_cols=["purchase_value", "purchase_ts"],
    )
    return joined.select(
        "event_id",
        ts_micros("ts").alias("ts_us"),
        "user_id",
        dround("value", 4).alias("click_value"),
        dround("purchase_value_asof", 4).alias("purchase_value_asof"),
        ts_micros("purchase_ts_asof").alias("purchase_ts_asof_us"),
    )
