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
from nchu_bigdata_spark.materialize import range_pid_frozen
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


# --------------------------------------------------------------------------
# join_asof_nearest — nearest-in-time as-of variant (round 8)
# --------------------------------------------------------------------------

def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str,
) -> DataFrame:
    """Nearest-in-time as-of join: for each left row the right row (per
    ``by`` key) minimizing |Δts|, ties resolved to the EARLIER right row
    (deterministic). Built from the backward carry-forward window plus
    its mirrored forward pass — still ONE shuffle: both window frames
    share the same (key, ts) sort order, so Catalyst plans a single
    exchange+sort with two Window operators over it.

    Returns left columns + ``near_ts`` (matched right timestamp,
    NULL when the key has no right rows)."""
    r = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(_RIGHT).alias("_src"),
        F.col(ts_col).alias("_rts"),
    )
    l = left.withColumn("_src", F.lit(_LEFT))
    u = l.unionByName(r, allowMissingColumns=True)
    # backward: right rows sort BEFORE left at equal ts (inclusive <=)
    wb = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: the SAME sort order read the other way — right rows at
    # equal ts already matched backward, so the exclusive "after" read
    # is correct and no second tagging is needed
    wf = (
        Window.partitionBy(by)
        .orderBy(ts_col, "_src")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn("_b", F.last("_rts", ignorenulls=True).over(wb))
    u = u.withColumn("_f", F.first("_rts", ignorenulls=True).over(wf))
    lt = F.col(ts_col)
    db = F.when(F.col("_b").isNotNull(), lt.cast("long") - F.col("_b").cast("long"))
    df_ = F.when(F.col("_f").isNotNull(), F.col("_f").cast("long") - lt.cast("long"))
    near = (
        F.when(F.col("_b").isNull(), F.col("_f"))
        .when(F.col("_f").isNull(), F.col("_b"))
        .when(db <= df_, F.col("_b"))  # tie -> earlier (backward) row
        .otherwise(F.col("_f"))
    )
    return (
        u.filter(F.col("_src") == _LEFT)
        .withColumn("near_ts", near)
        .drop("_src", "_rts", "_b", "_f")
    )


@register(
    "join_asof_nearest",
    tags=("b3",),
    oracle="""
        -- nearest-in-time variant: DuckDB has no NEAREST asof, so the
        -- oracle composes the backward and forward ASOF joins and
        -- picks the smaller |Δt| (tie -> the earlier/backward row) —
        -- exactly the decomposition the engine's single-sort window
        -- form implements.
        WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
             r AS (SELECT * FROM events WHERE event_type = 'purchase'),
             b AS (
                SELECT l.event_id, r.ts AS bts
                FROM l ASOF LEFT JOIN r
                  ON l.user_id = r.user_id AND l.ts >= r.ts
             ),
             f AS (
                SELECT l.event_id, r.ts AS fts
                FROM l ASOF LEFT JOIN r
                  ON l.user_id = r.user_id AND l.ts < r.ts
             )
        SELECT l.event_id,
               epoch_us(l.ts) AS ts_us,
               l.user_id,
               epoch_us(CASE
                   WHEN bts IS NULL THEN fts
                   WHEN fts IS NULL THEN bts
                   WHEN epoch_us(l.ts) - epoch_us(bts)
                        <= epoch_us(fts) - epoch_us(l.ts) THEN bts
                   ELSE fts END) AS near_purchase_ts_us,
               CASE
                   WHEN bts IS NULL AND fts IS NULL THEN NULL
                   WHEN bts IS NULL THEN epoch_us(fts) - epoch_us(l.ts)
                   WHEN fts IS NULL THEN epoch_us(l.ts) - epoch_us(bts)
                   ELSE LEAST(epoch_us(l.ts) - epoch_us(bts),
                              epoch_us(fts) - epoch_us(l.ts)) END
                   AS near_dt_us
        FROM l JOIN b USING (event_id) JOIN f USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's NEAREST purchase in time —
    either direction, ties to the earlier one. The sensor-fusion /
    event-alignment variant of `join_asof` (pandas merge_asof
    direction='nearest', QuestDB/kdb nearest-asof): backward-only
    as-of is right for trade⟕quote causality, nearest is right for
    aligning two clocks that both jitter.

    Plan/scale: the backward carry-forward window and its mirrored
    forward read share ONE (user, ts)-sorted exchange — two Window
    operators, one shuffle, O(1) state per key; the oracle decomposes
    into DuckDB's backward + forward ASOF joins and picks the smaller
    gap, proving the window form equals the join form."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    j = asof_join_nearest(clicks, purchases, by="user_id", ts_col="ts")
    lt, nt = ts_micros("ts"), ts_micros("near_ts")
    return j.select(
        "event_id",
        lt.alias("ts_us"),
        "user_id",
        nt.alias("near_purchase_ts_us"),
        F.when(F.col("near_ts").isNotNull(), F.abs(lt - nt))
        .alias("near_dt_us")
        .cast("long"),
    )

# --------------------------------------------------------------------------
# join_asof_tolerance — bounded-staleness as-of variant (round 8)
# --------------------------------------------------------------------------

_TOL_US = 3 * 86_400_000_000  # 3 days: quotes staler than this don't match


@register(
    "join_asof_tolerance",
    tags=("b3",),
    oracle=f"""
        -- bounded-staleness as-of (pandas merge_asof `tolerance`):
        -- the backward match is kept only when it is at most 3 days
        -- old; staler matches are nulled, NOT re-searched (the
        -- tolerance bounds how stale a carried value may be, it does
        -- not change which row is the candidate).
        SELECT l.event_id,
               epoch_us(l.ts) AS ts_us,
               l.user_id,
               CASE WHEN r.ts IS NOT NULL
                     AND epoch_us(l.ts) - epoch_us(r.ts) <= {_TOL_US}
                    THEN epoch_us(r.ts) END AS purchase_ts_us,
               CASE WHEN r.ts IS NOT NULL
                     AND epoch_us(l.ts) - epoch_us(r.ts) <= {_TOL_US}
                    THEN epoch_us(l.ts) - epoch_us(r.ts) END AS dt_us,
               CAST(CASE WHEN r.ts IS NOT NULL
                          AND epoch_us(l.ts) - epoch_us(r.ts) <= {_TOL_US}
                         THEN 1 ELSE 0 END AS BIGINT) AS matched
        FROM (SELECT * FROM events WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a staleness tolerance: each click takes
    the user's most recent prior purchase ONLY if it is ≤ 3 days old —
    pandas ``merge_asof(tolerance=...)`` / kdb ``wj`` with a window
    bound. The bounded-staleness form is what production feature
    pipelines actually need (a price quote from last month must NOT
    leak into today's feature row).

    Semantics: tolerance FILTERS the backward candidate, it never
    re-searches further back — so the plan is the same ONE-shuffle
    carry-forward window as `join_asof`, plus a codegen'd conditional
    null-out. O(1) state per key; identical cost at 100 TB."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    j = asof_join(
        clicks, purchases, by="user_id", ts_col="ts",
        value_cols=["purchase_ts"],
    )
    lt, pt = ts_micros("ts"), ts_micros("purchase_ts_asof")
    ok = F.col("purchase_ts_asof").isNotNull() & ((lt - pt) <= F.lit(_TOL_US))
    return j.select(
        "event_id",
        lt.alias("ts_us"),
        "user_id",
        F.when(ok, pt).alias("purchase_ts_us"),
        F.when(ok, lt - pt).alias("dt_us"),
        ok.cast("long").alias("matched"),
    )


# --------------------------------------------------------------------------
# events_conversion_lag — click→purchase latency profile (round 8)
# --------------------------------------------------------------------------


@register(
    "events_conversion_lag",
    tags=("b3",),
    oracle="""
        -- conversion-latency profile: every purchase matched to the
        -- user's most recent PRIOR click (backward as-of), the gap
        -- rolled into exact integer order statistics (min / med2 =
        -- 2x median / p90 ceil-rank / max — the events_inter_arrival
        -- policy). The time-to-convert readout attribution windows
        -- are calibrated against.
        WITH g AS (
            SELECT epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        ),
        r AS (
            SELECT gap_us,
                   ROW_NUMBER() OVER (ORDER BY gap_us) AS rk,
                   COUNT(*) OVER () AS n
            FROM g
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases
            FROM events WHERE event_type = 'purchase'
        )
        SELECT tot.n_purchases,
               CAST(MAX(r.n) AS BIGINT) AS n_converted,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                             THEN gap_us ELSE 0 END)
                    * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                           THEN 2 ELSE 1 END AS BIGINT) AS med2_gap_us,
               CAST(MAX(CASE WHEN rk = (9 * n + 9) // 10
                             THEN gap_us END) AS BIGINT) AS p90_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM r, tot
        GROUP BY tot.n_purchases
    """,
)
def events_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion-latency profile: every purchase
    matched to the user's most recent PRIOR click (the causal
    backward as-of — `join_asof`'s machinery with the sides swapped),
    gaps rolled into exact integer order statistics (min / med2 /
    p90 / max, the `events_inter_arrival` doubled-median policy).
    This is the number attribution windows are calibrated against:
    `events_attribution`'s last-touch window should sit above p90
    here, or it undercredits.

    Plan/scale: ONE (user, ts)-sorted exchange for the carry-forward
    window (inner-matched purchases only); the gap stream then
    collapses to its SUPPORT (one map-side-combined groupBy per
    distinct gap value — the events_ks_test framing). gap_us is
    microsecond-resolution, so the support approaches MATCH
    cardinality and is NOT structurally bounded (ADVICE r9) — the
    cumulative count therefore uses the DISTRIBUTED two-pass pattern
    over the frozen range partitioning (``range_pid_frozen``): per-pid
    cnt subtotals broadcast back as value offsets, cum = offset +
    partition-local running sum; the only unpartitioned window left
    runs over the #partitions-row offset table. Every order statistic
    is read off the support row whose cumulative range covers its
    rank (value at rank k = the support row with cum−cnt < k ≤ cum) —
    exact integer stats, no bucketing compromise. The r8 form ranked
    raw matches — a single-task sort of purchase cardinality. The
    unmatched count rides the same rollup via the 1-row
    purchases-total broadcast."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    j = asof_join(
        purchases, clicks, by="user_id", ts_col="ts",
        value_cols=["click_ts"],
    )
    g = j.filter(F.col("click_ts_asof").isNotNull()).select(
        (ts_micros("ts") - ts_micros("click_ts_asof")).alias("gap_us")
    )
    c = g.groupBy("gap_us").agg(F.count(F.lit(1)).alias("cnt"))
    pid = range_pid_frozen("events_conversion_lag.pid", c, "gap_us")
    pc = pid.groupBy("pid").agg(F.sum("cnt").alias("pn"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = pc.select(
        "pid", F.coalesce(F.sum("pn").over(w_off), F.lit(0)).alias("off")
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("gap_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = (
        pid.withColumn("cloc", F.sum("cnt").over(w_local))
        .join(F.broadcast(off), "pid")
        .select("gap_us", "cnt", (F.col("off") + F.col("cloc")).alias("cum"))
    )
    nm = pid.agg(F.sum("cnt").cast("long").alias("n"))
    tot = ev.filter(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases")
    )
    # med2 = val(lo) + val(hi) (= 2*val when the ranks coincide or tie
    # into one support row): each indicator picks the covering row.
    return (
        s.join(F.broadcast(nm))
        .join(F.broadcast(tot))
        .groupBy("n_purchases")
        .agg(
            F.max("n").cast("long").alias("n_converted"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.expr(
                "CAST(sum(gap_us * ("
                "(CASE WHEN cum - cnt < (n + 1) div 2"
                " AND (n + 1) div 2 <= cum THEN 1 ELSE 0 END)"
                " + (CASE WHEN cum - cnt < n div 2 + 1"
                " AND n div 2 + 1 <= cum THEN 1 ELSE 0 END)"
                ")) AS BIGINT)"
            ).alias("med2_gap_us"),
            F.expr(
                "CAST(max(CASE WHEN cum - cnt < (9 * n + 9) div 10 "
                "AND (9 * n + 9) div 10 <= cum THEN gap_us END) AS BIGINT)"
            ).alias("p90_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
        .select(
            "n_purchases", "n_converted", "min_gap_us", "med2_gap_us",
            "p90_gap_us", "max_gap_us",
        )
    )
