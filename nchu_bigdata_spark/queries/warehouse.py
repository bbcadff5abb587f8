"""Warehouse temporal operators (SURVEY.md §2.B-3/§2.B-4 extensions):
SCD-2 history construction and a big-big interval-overlap join.

  * ``scd2_history`` — slowly-changing-dimension type-2 versioning:
    turn an event-log table (orders per customer) into versioned rows
    with [valid_from, valid_to) ranges and an is_current flag. The
    companion to ``merge_upsert`` (SCD-1) in ``queries/joins.py``.
  * ``join_interval_overlap`` — interval × point overlap join where
    BOTH sides are fact-sized. The naive form is a non-equi theta join
    (nested loop, O(n²) per key at scale); the engine's form bins the
    time axis so the join becomes an EQUI join on (key, month-bin)
    with the exact range predicate as a residual — the standard
    bin/bucket decomposition every distributed range-join implements
    (Spark's own storage-partitioned range joins, DuckDB's IEJoin
    literature). Each interval explodes into the ≤3 calendar months it
    covers; each point lands in exactly 1 bin, so no pair is counted
    twice and no dedup pass is needed.

Scale (100 TB): ``scd2_history`` is one hash shuffle on the dimension
key + a per-key sort (bounded by versions-per-entity, never global).
``join_interval_overlap`` shuffles both sides on (custkey, month) —
per-group size is orders-per-customer-per-month, so group width is
bounded and skew-resistant regardless of total volume; the 30-day span
bounds the explode factor at 3×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register


@register(
    "scd2_history",
    tags=("b3",),
    oracle="""
        SELECT o_custkey,
               CAST(ROW_NUMBER() OVER w AS INT) AS version,
               o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               strftime(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS valid_to,
               (LEAD(o_orderdate) OVER w IS NULL) AS is_current,
               o_totalprice
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each customer's order stream becomes
    versioned rows with half-open validity ranges — ``valid_from`` =
    the change date, ``valid_to`` = the NEXT change date (NULL while
    current), plus a monotone version number. This is the windowed
    plan a warehouse MERGE-with-history compiles to, and the batch
    form of CDC snapshot reconstruction.

    Plan: ONE shuffle on the entity key, then rank/lead share a single
    per-key sort (same window frame ⇒ one Window operator). Validity
    bounds are emitted as 'yyyy-MM-dd' strings per the compat policy
    (compat.py module doc: never compare raw timestamps across
    engines). Ties on the change date break on o_orderkey, so
    versioning is deterministic."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.row_number().over(w).alias("version"),
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        nxt.isNull().alias("is_current"),
        "o_totalprice",
    )


# Overlap window length in days: o2 overlaps o1 iff
# o1.date <= o2.date < o1.date + _SPAN_DAYS.
_SPAN_DAYS = 30


def _month_id(c: Column) -> Column:
    """Calendar month as a dense int (year*12 + month-1) — the bin key."""
    return F.year(c) * 12 + F.month(c) - 1


@register(
    "join_interval_overlap",
    tags=("b3",),
    oracle=f"""
        SELECT o1.o_custkey AS c_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_overlaps
        FROM orders o1
        JOIN orders o2
          ON o1.o_custkey = o2.o_custkey
         AND o1.o_orderkey <> o2.o_orderkey
         AND o2.o_orderdate >= o1.o_orderdate
         AND o2.o_orderdate <  o1.o_orderdate + INTERVAL {_SPAN_DAYS} DAY
        GROUP BY o1.o_custkey
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact×fact interval-overlap join, binned: per customer, count
    ordered pairs of orders whose 30-day fulfillment windows overlap
    (order j placed inside order i's window).

    The oracle states the naive theta join; the engine NEVER executes
    that shape (the plan audit forbids nested-loop here). Instead the
    time axis is binned by calendar month:

      * interval side: each order explodes into the months its
        [date, date+30d) window touches — ≤3 bins, via
        sequence(month(start), month(start+30d−1µs)) (the last INSTANT
        of the half-open window, so time-of-day starts can't leak past
        the top bin).
      * point side: each order keys by the single month of its date.

    The join is then EQUI on (custkey, month) — a plain shuffled hash
    join — with the exact range test as a residual filter. A point's
    bin is unique, so every qualifying (i, j) pair matches in exactly
    one bin: no double counting, no distinct pass. This is the
    bin-decomposed range join that stays O(rows-per-key-per-month) at
    100 TB where the theta form is O(rows-per-key²)."""
    orders = table(spark, sf_dir, "orders")
    start = F.col("o_orderdate")
    # Bins must cover through the last INSTANT inside the half-open
    # window, i.e. month(start + 30d − 1µs) — NOT month(start + 29d):
    # with a time-of-day component (TimestampType permits it), a window
    # starting Jan 30 23:00 admits points up to Mar 1 22:59:59.999999,
    # one month beyond start+29d (= Feb 28 23:00). Deriving the high
    # bin from start+29d silently drops those pairs (review finding,
    # reproduced with non-midnight fixtures). Still ≤3 months: two full
    # interior months would need a ≥59-day span.
    last = (
        start
        + F.expr(f"INTERVAL {_SPAN_DAYS} DAYS")
        - F.expr("INTERVAL 1 MICROSECOND")
    )
    iv = orders.select(
        F.col("o_custkey").alias("i_custkey"),
        F.col("o_orderkey").alias("i_orderkey"),
        start.alias("i_start"),
        F.explode(F.sequence(_month_id(start), _month_id(last))).alias("bin"),
    )
    pt = orders.select(
        F.col("o_custkey").alias("j_custkey"),
        F.col("o_orderkey").alias("j_orderkey"),
        F.col("o_orderdate").alias("j_date"),
        _month_id(F.col("o_orderdate")).alias("bin"),
    )
    pairs = iv.join(
        pt, (iv.i_custkey == pt.j_custkey) & (iv.bin == pt.bin)
    ).filter(
        (F.col("j_orderkey") != F.col("i_orderkey"))
        & (F.col("j_date") >= F.col("i_start"))
        & (F.col("j_date") < F.col("i_start") + F.expr(f"INTERVAL {_SPAN_DAYS} DAYS"))
    )
    return pairs.groupBy(F.col("i_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("n_overlaps")
    )


# --------------------------------------------------------------------------
# ts_resample — gap-filled fixed-interval resampling with LOCF (round 7)
# --------------------------------------------------------------------------

_RS_STEP_US = 3_600_000_000  # 1-hour buckets


@register(
    "ts_resample",
    tags=("b4",),
    oracle=f"""
        -- Epoch-us integer bucketing throughout (rollup_hypertable's
        -- TZ-invariance policy); the spine is a per-series
        -- generate_series over [min, max] bucket, inclusive on both
        -- ends exactly like Spark's sequence().
        WITH agg AS (
            SELECT event_type,
                   (epoch_us(ts) // {_RS_STEP_US}) * {_RS_STEP_US} AS bu,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(value AS DECIMAL(20,6))) AS sv
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(bu) AS lo, MAX(bu) AS hi
            FROM agg GROUP BY 1
        ),
        spine AS (
            SELECT b.event_type, g.bu
            FROM bounds b,
                 unnest(generate_series(b.lo, b.hi, {_RS_STEP_US})) AS g(bu)
        ),
        joined AS (
            SELECT s.event_type, s.bu AS bucket_us,
                   COALESCE(a.n, 0) AS n_events, a.sv
            FROM spine s
            LEFT JOIN agg a ON a.event_type = s.event_type AND a.bu = s.bu
        )
        SELECT event_type, bucket_us,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(sv AS DECIMAL(38,6)) AS sum_value,
               CAST(LAST_VALUE(sv IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_us
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DECIMAL(38,6)) AS locf_sum
        FROM joined
    """,
)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval resampling with GAP FILLING: hourly buckets per
    event series, a dense per-series time spine (every hour between
    that series' first and last event), empty buckets emitted with
    ``n_events = 0`` and the last observed sum carried forward
    (``locf_sum``) — the time_bucket_gapfill / date-spine idiom every
    time-series warehouse needs before charting or windowed ML
    featurization (``win_fill_forward`` repairs nulls in EXISTING rows;
    this one MANUFACTURES the missing rows first).

    Plan/scale: raw events collapse to (series, bucket) partial counts
    in ONE hash agg (map-side combine; bucket count is time-range/1h —
    bounded by the calendar, not the corpus). The spine explodes a
    per-series ``sequence(lo, hi, step)`` — spine cardinality is again
    calendar-bounded, never corpus-sized. The gap-fill left join and
    the LOCF window both key on (series, bucket): one shuffle each
    over bucket-cardinality rows, and the window sort is per-series
    over its own spine, never a global sort. All-integer epoch-us
    bucketing keeps both engines TZ-invariant; sums follow the decimal
    policy (``compat.py``)."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type",
        # integer DIV, not `/` (double division can land an ulp under
        # the bucket edge and truncate into the previous bucket)
        F.expr(
            f"(unix_micros(ts) DIV {_RS_STEP_US}) * {_RS_STEP_US}"
        ).alias("bu"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("sv"),
    )
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("bu").alias("lo"), F.max("bu").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.lit(_RS_STEP_US))
            ).alias("bucket_us"),
        )
    )
    joined = spine.join(
        agg.withColumnRenamed("bu", "bucket_us"),
        ["event_type", "bucket_us"],
        "left",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket_us",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        F.col("sv").cast("decimal(38,6)").alias("sum_value"),
        F.last("sv", ignorenulls=True).over(w).cast("decimal(38,6)").alias("locf_sum"),
    )


# --------------------------------------------------------------------------
# table_diff — snapshot differencing / CDC extraction (round 7)
# --------------------------------------------------------------------------


def _orders_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simulated "next snapshot" of orders, derived deterministically
    so both engines build the identical v2: key%10==0 rows deleted,
    key%7==0 rows get their price doubled (exact in binary FP — no
    rounding hazard), and key%13==0 rows re-enter as inserts under the
    collision-free key -(k+1) (orderkeys start at 0, so plain negation
    would collide on 0)."""
    v1 = table(spark, sf_dir, "orders")
    updated = v1.filter(F.col("o_orderkey") % 10 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    inserted = v1.filter(F.col("o_orderkey") % 13 == 0).withColumn(
        "o_orderkey", -(F.col("o_orderkey") + 1)
    )
    return updated.unionByName(inserted)


@register(
    "table_diff",
    tags=("b3",),
    oracle="""
        WITH v2 AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 10 <> 0
            UNION ALL
            SELECT -(o_orderkey + 1), o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderkey % 13 = 0
        )
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN a.o_orderkey IS NULL THEN 'I'
                    WHEN b.o_orderkey IS NULL THEN 'D'
                    ELSE 'U' END AS change_type,
               a.o_totalprice AS old_price,
               b.o_totalprice AS new_price
        FROM orders a
        FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
        WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
           OR a.o_custkey      IS DISTINCT FROM b.o_custkey
           OR a.o_orderstatus  IS DISTINCT FROM b.o_orderstatus
           OR a.o_totalprice   IS DISTINCT FROM b.o_totalprice
           OR a.o_orderdate    IS DISTINCT FROM b.o_orderdate
           OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing: given two versions of a table, emit each
    changed key once, classified I/U/D — the CDC-extraction /
    lakehouse-snapshot-diff primitive (what `MERGE` consumes upstream,
    the inverse of ``merge_upsert``'s apply side; ``scd2_history``
    would ingest exactly this feed).

    Change detection compares EVERY column with null-safe equality
    (``<=>`` / IS DISTINCT FROM) rather than a row hash: hash functions
    are engine-specific, column comparisons are portable, and at scale
    the comparison cost is identical (both read every column once).
    Identical rows vanish from the output — a diff of identical
    snapshots is empty, which is the property the test pins.

    Plan/scale: ONE full-outer sort-merge join keyed on the primary
    key — the canonical shape; both snapshots shuffle once on the key,
    per-key width is 1x1, skew-free by construction. v2 derives from
    v1 narrowly (filter + projection, no extra shuffle), standing in
    for reading a second snapshot's files."""
    v1 = table(spark, sf_dir, "orders")
    v2 = _orders_v2(spark, sf_dir)
    a = v1.alias("a")
    b = v2.alias("b")
    ak, bk = F.col("a.o_orderkey"), F.col("b.o_orderkey")
    same = (
        F.col("a.o_custkey").eqNullSafe(F.col("b.o_custkey"))
        & F.col("a.o_orderstatus").eqNullSafe(F.col("b.o_orderstatus"))
        & F.col("a.o_totalprice").eqNullSafe(F.col("b.o_totalprice"))
        & F.col("a.o_orderdate").eqNullSafe(F.col("b.o_orderdate"))
        & F.col("a.o_orderpriority").eqNullSafe(F.col("b.o_orderpriority"))
    )
    return (
        a.join(b, ak == bk, "full_outer")
        .filter(ak.isNull() | bk.isNull() | ~same)
        .select(
            F.coalesce(ak, bk).alias("o_orderkey"),
            F.when(ak.isNull(), "I")
            .when(bk.isNull(), "D")
            .otherwise("U")
            .alias("change_type"),
            F.col("a.o_totalprice").alias("old_price"),
            F.col("b.o_totalprice").alias("new_price"),
        )
    )


# --------------------------------------------------------------------------
# ts_ewma — dyadic exponentially-weighted moving average (round 8)
# --------------------------------------------------------------------------

_EWMA_H = 8  # trailing horizon (rows); alpha = 1/2 => dyadic weights


def _ewma_terms(lag_fn, exists_fn) -> tuple[str, str]:
    """(numerator, denominator) SQL fragments: Σ 2^(H-1-k)·lag_k over
    the lags that exist. Shared verbatim by the Spark expression and
    the DuckDB oracle so the arithmetic cannot drift."""
    nums, dens = [], []
    for k in range(_EWMA_H):
        w = 1 << (_EWMA_H - 1 - k)
        nums.append(f"{w} * {lag_fn(k)}")
        dens.append(f"{w} * {exists_fn(k)}")
    return " + ".join(nums), " + ".join(dens)


def _ewma_sql_over(over: str) -> tuple[str, str]:
    return _ewma_terms(
        lambda k: f"COALESCE(lag(cents, {k}) OVER {over}, 0)",
        lambda k: f"(CASE WHEN lag(cents, {k}) OVER {over} IS NULL"
        " THEN 0 ELSE 1 END)",
    )


@register(
    "ts_ewma",
    tags=("b4",),
    oracle=(
        lambda n, d: f"""
        WITH c AS (
            SELECT user_id, event_id, ts,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT user_id, event_id,
               CAST({n} AS BIGINT) AS ewma_num,
               CAST({d} AS BIGINT) AS ewma_den,
               CAST(({n}) // ({d}) AS BIGINT) AS ewma_cents
        FROM c
    """
    )(*_ewma_sql_over("(PARTITION BY user_id ORDER BY ts, event_id)")),
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event values per user —
    the trend-smoothing primitive (monitoring dashboards, per-entity
    rate limiting, anomaly baselines). α = 1/2 over a trailing
    8-row horizon, which makes every weight a POWER OF TWO: the
    weighted sum is exact integer arithmetic on cents, bit-identical
    across engines — no float pow(), no compounding rounding, the
    boundary-straddle policy applied to a recurrence. (Truncating the
    tail below 2⁻⁸ changes the value by < 1 cent·2⁻⁸ — inside the
    integer floor anyway; leading rows renormalize over the lags that
    exist, the standard adjust=True EWMA.)

    Plan/scale: 8 ``lag`` calls share ONE user-keyed window sort (one
    shuffle, per-user sort — never global); emitted num/den are the
    exact integers, the smoothed value their single floor division.
    At 100 TB this is the same shape as ``win_lag_lead`` — state is 8
    rows per partition cursor, nothing driver-side."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    over = "(PARTITION BY user_id ORDER BY ts, event_id)"
    n, d = _ewma_sql_over(over)
    return ev.select(
        "user_id",
        "event_id",
        F.expr(f"CAST({n} AS BIGINT)").alias("ewma_num"),
        F.expr(f"CAST({d} AS BIGINT)").alias("ewma_den"),
        F.expr(f"CAST(({n}) div ({d}) AS BIGINT)").alias("ewma_cents"),
    )


# --------------------------------------------------------------------------
# rollup_incremental — incremental aggregate maintenance (round 8)
# --------------------------------------------------------------------------

# The "already materialized" horizon: event days strictly before this
# epoch-day are the existing aggregate table; the day(s) at/after it
# are the newly-arrived partition being folded in.
_RI_CUT_DAY = 19_750  # 2024-01-28


@register(
    "rollup_incremental",
    tags=("b4",),
    oracle=f"""
        -- the invariant being demonstrated: merging the pre-computed
        -- aggregate with the new partition's partials must equal the
        -- full recompute — so the oracle IS the full recompute.
        SELECT epoch_us(ts) // 86400000000 AS epoch_day,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        GROUP BY 1, 2
    """,
)
def rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance — the REFRESH
    step of a continuous aggregate (`rollup_hypertable`'s companion):
    a daily (day, event_type) aggregate table already exists for the
    history; a new day's partition arrives; the engine folds ONLY the
    new partition's partials into the existing aggregate instead of
    recomputing history. Correctness rests on the aggregates being
    associative & re-aggregable (counts and exact integer cent sums —
    the same property `agg_bitmap_distinct`/`agg_sketch_merge` provide
    for distinct counts), which the oracle PROVES by full recompute:
    merged-incremental must hash-equal the from-scratch answer.

    Plan/scale: the "existing" side aggregates only pre-horizon days
    (in production: read back from the materialized table — zero
    recompute; simulated here by date-sliced aggregation of the same
    source), the delta side aggregates only the new partition (
    partition-pruned scan), and the merge is one re-agg over
    day×type cardinality rows — history is never rescanned. This is
    the batch mirror of `stream_cdc_upsert`'s merge discipline,
    applied to additive aggregates."""
    ev = table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("epoch_day"),
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def day_agg(df: DataFrame) -> DataFrame:
        return df.groupBy("epoch_day", "event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )

    existing = day_agg(ev.filter(F.col("epoch_day") < _RI_CUT_DAY))
    delta = day_agg(ev.filter(F.col("epoch_day") >= _RI_CUT_DAY))
    # merge: re-aggregate the union of partials (same-key rows can
    # only collide if a day straddles the horizon, which the slice
    # prevents — but the re-agg keeps the merge correct even if a
    # late-arriving partial lands for an existing day).
    return (
        existing.unionAll(delta)
        .groupBy("epoch_day", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
    )


# --------------------------------------------------------------------------
# ts_interpolate — linear gap interpolation on the daily spine (round 8)
# --------------------------------------------------------------------------

_TI_STEP_US = 3_600_000_000  # hourly


@register(
    "ts_interpolate",
    tags=("b4",),
    oracle=f"""
        -- linear interpolation across missing hours: observed buckets
        -- carry their exact cents; manufactured gap buckets take the
        -- integer-exact weighted average of the bracketing
        -- observations, (prev*(nd-d) + next*(d-pd)) // (nd-pd), in
        -- millicents so the floor loses less than 1/1000 cent. All
        -- legs are non-negative integers, so // (floor) and Spark's
        -- div (truncate) agree; HUGEINT <-> decimal(38,0) keeps the
        -- cross-multiplies exact at any corpus size.
        WITH agg AS (
            SELECT event_type,
                   epoch_us(ts) // {_TI_STEP_US} AS d,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(d) AS lo, MAX(d) AS hi
            FROM agg GROUP BY 1
        ),
        spine AS (
            SELECT b.event_type, g.d
            FROM bounds b, unnest(generate_series(b.lo, b.hi)) AS g(d)
        ),
        j AS (
            SELECT s.event_type, s.d, a.cents,
                   LAST_VALUE(a.cents IGNORE NULLS) OVER wp AS prev_c,
                   LAST_VALUE(CASE WHEN a.cents IS NOT NULL
                                   THEN s.d END IGNORE NULLS)
                       OVER wp AS prev_d,
                   FIRST_VALUE(a.cents IGNORE NULLS) OVER wn AS next_c,
                   FIRST_VALUE(CASE WHEN a.cents IS NOT NULL
                                    THEN s.d END IGNORE NULLS)
                       OVER wn AS next_d
            FROM spine s
            LEFT JOIN agg a
              ON a.event_type = s.event_type AND a.d = s.d
            WINDOW
              wp AS (PARTITION BY s.event_type ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              wn AS (PARTITION BY s.event_type ORDER BY s.d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, CAST(d AS BIGINT) AS bucket_idx,
               CAST(cents IS NOT NULL AS BIGINT) AS observed,
               CAST(COALESCE(cents, 0) AS BIGINT) AS cents,
               CAST(CASE WHEN cents IS NOT NULL THEN cents * 1000
                    ELSE (CAST(prev_c AS HUGEINT) * (next_d - d)
                          + CAST(next_c AS HUGEINT) * (d - prev_d))
                         * 1000 // (next_d - prev_d)
                    END AS BIGINT) AS interp_millicents
        FROM j
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over time-series gaps: the hourly
    revenue-cents series per event type, densified to every hour in
    the series' span, with missing days filled by the exact
    integer-weighted average of the bracketing observed buckets —
    the step past `ts_resample`'s LOCF (carry-forward repeats the
    last level; interpolation draws the line the chart and the
    downstream seasonal model actually want).

    Determinism: classic float lerp (`prev + (next-prev)*frac`)
    diverges across engines in the last ulp; the weighted-average
    form ``(prev*(nd-d) + next*(d-pd)) div (nd-pd)`` in millicents is
    pure integer arithmetic — exact, associative, identical. Interior
    spine buckets always have both brackets (the spine spans min..max
    of OBSERVED buckets), so no NULL branch survives; the hourly grain
    leaves real gaps (~6% of the sf0.01 spine), so the interpolation
    branch is genuinely exercised by the oracle check.

    Plan/scale: events collapse to (series, bucket) partials in one
    map-side-combined agg (calendar-bounded cardinality); the spine
    explode and both bracket windows key on the series, so after the
    one agg shuffle everything is partition-local per series; the two
    opposite-direction frames share one sort order (Spark runs them
    in a single Window operator pass over the spine)."""
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_TI_STEP_US}").alias("d"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("d"),
        )
    )
    j = spine.join(agg, ["event_type", "d"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("cents").isNotNull(), F.col("d"))
    br = j.select(
        "event_type",
        "d",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("prev_c"),
        F.last(obs_d, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("cents", ignorenulls=True).over(wn).alias("next_c"),
        F.first(obs_d, ignorenulls=True).over(wn).alias("next_d"),
    )
    interp = F.expr(
        "(CAST(prev_c AS decimal(38,0)) * (next_d - d)"
        " + CAST(next_c AS decimal(38,0)) * (d - prev_d))"
        " * 1000 div (next_d - prev_d)"
    )
    return br.select(
        "event_type",
        F.col("d").cast("long").alias("bucket_idx"),
        F.col("cents").isNotNull().cast("long").alias("observed"),
        F.coalesce("cents", F.lit(0)).cast("long").alias("cents"),
        F.when(F.col("cents").isNotNull(), F.col("cents") * 1000)
        .otherwise(interp)
        .cast("long")
        .alias("interp_millicents"),
    )


# --------------------------------------------------------------------------
# orders_cohort_ltv — acquisition-cohort lifetime-value matrix (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_cohort_ltv",
    tags=("b4",),
    oracle="""
        -- cohort LTV: customers grouped by first-order month, revenue
        -- tracked by months-since-acquisition, with the running
        -- (cumulative) value each cohort has produced at every age —
        -- the retention-economics matrix behind every LTV model.
        -- Month index = year*12+month (calendar field arithmetic on
        -- the UTC-pinned clock; no epoch division, months aren't
        -- fixed-length).
        WITH fo AS (
            SELECT o_custkey,
                   MIN(year(o_orderdate) * 12 + month(o_orderdate))
                       AS m0
            FROM orders GROUP BY 1
        ),
        cells AS (
            SELECT fo.m0,
                   (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                       - fo.m0 AS age,
                   COUNT(DISTINCT o.o_custkey) AS n_active,
                   SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                       AS cents
            FROM orders o JOIN fo ON fo.o_custkey = o.o_custkey
            GROUP BY 1, 2
        ),
        sizes AS (
            SELECT m0, COUNT(*) AS cohort_n FROM fo GROUP BY 1
        )
        SELECT CAST(c.m0 AS BIGINT) AS cohort_month,
               CAST(c.age AS BIGINT) AS age_months,
               CAST(s.cohort_n AS BIGINT) AS cohort_size,
               CAST(c.n_active AS BIGINT) AS n_active,
               CAST(c.cents AS BIGINT) AS revenue_cents,
               CAST(SUM(c.cents) OVER (
                        PARTITION BY c.m0 ORDER BY c.age
                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_revenue_cents
        FROM cells c JOIN sizes s ON s.m0 = c.m0
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort lifetime value: customers cohorted by their
    first-order month; every later order lands in a (cohort,
    months-since-acquisition) cell carrying active-customer count,
    exact-cents revenue, and the cohort's cumulative value at that
    age — the matrix LTV curves, payback-period and retention-decay
    analyses all read. `events_retention` answers "do they come
    back?"; this answers "what are they worth over time?".

    Plan/scale: the first-order agg and the cell agg both key on
    custkey — ONE shuffle feeds both (the join reuses the
    partitioning); cells and cohort sizes are calendar-bounded
    (months × ages), so the cumulative window runs over a tiny table
    partitioned by cohort. Month arithmetic is calendar-field based
    on the UTC-pinned session clock — months aren't fixed-length, so
    no epoch division is safe here."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "year(o_orderdate) * 12 + month(o_orderdate)"
        ).alias("m"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    fo = o.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    cells = (
        o.join(fo, "o_custkey")
        .groupBy("m0", (F.col("m") - F.col("m0")).alias("age"))
        .agg(
            F.countDistinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("cents"),
        )
    )
    sizes = fo.groupBy("m0").agg(F.count(F.lit(1)).alias("cohort_n"))
    w = (
        Window.partitionBy("m0")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return cells.join(F.broadcast(sizes), "m0").select(
        F.col("m0").cast("long").alias("cohort_month"),
        F.col("age").cast("long").alias("age_months"),
        F.col("cohort_n").cast("long").alias("cohort_size"),
        F.col("n_active").cast("long"),
        F.col("cents").cast("long").alias("revenue_cents"),
        F.sum("cents").over(w).cast("long").alias("cum_revenue_cents"),
    )


# --------------------------------------------------------------------------
# ts_autocorr — lag-1 autocorrelation of the hourly revenue series (round 8)
# --------------------------------------------------------------------------

_AC_STEP_US = 3_600_000_000  # hourly slots


@register(
    "ts_autocorr",
    tags=("b4",),
    oracle=f"""
        -- lag-1 autocorrelation per series: Pearson corr between the
        -- hourly revenue cell and its predecessor cell (pairs where
        -- BOTH slots were observed). The memory/persistence diagnostic
        -- that separates trending series from white noise — and the
        -- statistic that justifies (or kills) the ts_ewma smoothing
        -- horizon per series. agg_corr's exact-co-moment discipline
        -- applied to a self-join: HUGEINT legs, IEEE-exact derivation,
        -- no float tolerance anywhere.
        WITH c AS (
            SELECT event_type,
                   epoch_us(ts) // {_AC_STEP_US} AS b,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT a.event_type,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(CAST(a.cents AS HUGEINT)) AS sx,
                   SUM(CAST(p.cents AS HUGEINT)) AS sy,
                   SUM(CAST(a.cents AS HUGEINT) * p.cents) AS sxy,
                   SUM(CAST(a.cents AS HUGEINT) * a.cents) AS sxx,
                   SUM(CAST(p.cents AS HUGEINT) * p.cents) AS syy
            FROM c a JOIN c p
              ON p.event_type = a.event_type AND p.b = a.b - 1
            GROUP BY a.event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_pairs,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS lag1_corr
        FROM m
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each series' hourly revenue: collapse
    events to calendar cells, pair every cell with its predecessor
    slot (both observed — no imputation), and derive Pearson r from
    EXACT integer co-moment sums. High lag-1 r means the series has
    memory (smoothing and seasonal-naive baselines will work); r near
    zero means white noise. Completes the ts_* family: resample →
    smooth (ewma) → interpolate → now measure whether smoothing is
    even justified.

    Determinism: the six co-moment legs are decimal(38,0) sums of
    int64-cent products (exact, order-independent); r is derived from
    those identical integers with IEEE-exact cast/mul/sub/div/sqrt —
    bit-identical across engines, the agg_corr discipline. Headroom:
    cents ~1e9/hour and 1e6 slots put n·sxy ~1e30, inside 38 digits.

    Plan/scale: one map-side-combined agg to cells, an EQUI self-join
    on (series, slot−1) over cell-cardinality rows, a series-sized
    rollup. Same shape as events_forecast_snaive — no window, no
    global sort."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_AC_STEP_US}").alias("b"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    p = c.select(
        "event_type",
        (F.col("b") + 1).alias("b"),
        F.col("cents").alias("pcents"),
    )
    m = (
        c.join(p, ["event_type", "b"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("pcents").cast("decimal(38,0)")).alias("sy"),
            F.sum(F.expr("CAST(cents AS decimal(38,0)) * pcents")).alias(
                "sxy"
            ),
            F.sum(F.expr("CAST(cents AS decimal(38,0)) * cents")).alias(
                "sxx"
            ),
            F.sum(F.expr("CAST(pcents AS decimal(38,0)) * pcents")).alias(
                "syy"
            ),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    denx = (n * sxx - sx * sx).cast("double")
    deny = (n * syy - sy * sy).cast("double")
    return m.select(
        "event_type",
        n.cast("long").alias("n_pairs"),
        (num / F.sqrt(denx * deny)).alias("lag1_corr"),
    )


# --------------------------------------------------------------------------
# orders_fulfillment_lag — order→ship latency profile (round 8)
# --------------------------------------------------------------------------

_FL_DAY_US = 86_400_000_000


def _fl_rank_val(frac_num: int, frac_den: int, idiv: str = "div") -> str:
    """SQL fragment: the lag-day value at exact lower rank
    (n-1)·num idiv den — nearest-rank-down order statistic, pure
    integers; identical expression tree on both engines, only the
    integer-division token differs (Spark ``div``, DuckDB ``//``)."""
    return (
        f"MAX(CASE WHEN rn - 1 = (n - 1) * {frac_num} {idiv} {frac_den}"
        " THEN lag_days END)"
    )


@register(
    "orders_fulfillment_lag",
    tags=("b11",),
    oracle=f"""
        -- order→ship latency profile per priority class: exact integer
        -- day lags from order date to each line's ship date, profiled
        -- as min / p50 / p90 / max by nearest-rank-down order
        -- statistics (the value AT integer rank (n−1)·k div 100 — no
        -- interpolation, no floats; the VALUE at a rank is unique even
        -- when row_number breaks ties arbitrarily because the sort key
        -- IS the value). The SLA dashboard every fulfillment org runs.
        WITH l AS (
            SELECT o.o_orderpriority,
                   (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                       // {_FL_DAY_US} AS lag_days
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        r AS (
            SELECT o_orderpriority, lag_days,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY lag_days) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM l
        )
        SELECT o_orderpriority,
               CAST(MAX(n) AS BIGINT) AS n_lines,
               CAST(MIN(lag_days) AS BIGINT) AS min_days,
               CAST({_fl_rank_val(50, 100, "//")} AS BIGINT) AS p50_days,
               CAST({_fl_rank_val(90, 100, "//")} AS BIGINT) AS p90_days,
               CAST(MAX(lag_days) AS BIGINT) AS max_days
        FROM r GROUP BY o_orderpriority
    """,
)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency profile per priority class: integer day lag
    from ``o_orderdate`` to each line's ``l_shipdate``, summarized as
    min / p50 / p90 / max where the percentiles are NEAREST-RANK-DOWN
    order statistics (the value at rank (n−1)·k div 100) — exact
    integers end to end, the agg_percentile_exact discipline without
    even the interpolation legs. Answers "does PRIORITY actually ship
    faster?", the first SLA question a fulfillment warehouse gets.

    Plan/scale: the fact join is orderkey-equi (AQE broadcasts orders'
    two columns when small; shuffles on the shared key otherwise); the
    rank pass is a PER-PRIORITY window sort (5 parallel partitions,
    never a global sort) that collapses immediately into a 5-row
    conditional agg. At 100 TB the window input is the full line
    count per class — the documented exact-percentile trade; the
    approx path (agg_approx) is the default at that scale and this is
    its calibration query."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.expr(
                # l_shipdate/o_orderdate surface as TIMESTAMP_NTZ; the
                # UTC-pinned session makes the wall-clock cast exact.
                "(unix_micros(cast(l_shipdate AS timestamp))"
                " - unix_micros(cast(o_orderdate AS timestamp)))"
                f" div {_FL_DAY_US}"
            ).alias("lag_days"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("lag_days")
    r = lag.select(
        "o_orderpriority",
        "lag_days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lines"),
        F.min("lag_days").cast("long").alias("min_days"),
        F.expr(_fl_rank_val(50, 100)).cast("long").alias("p50_days"),
        F.expr(_fl_rank_val(90, 100)).cast("long").alias("p90_days"),
        F.max("lag_days").cast("long").alias("max_days"),
    )


# --------------------------------------------------------------------------
# ts_drawdown — peak-to-trough slump per revenue series (round 8)
# --------------------------------------------------------------------------

_DD_DAY_US = 86_400_000_000


@register(
    "ts_drawdown",
    tags=("b4",),
    oracle=f"""
        -- max drawdown per series: daily revenue cells (observed days
        -- only — a zero-filled day would make every drawdown equal the
        -- peak, which measures the calendar, not the series), running
        -- peak via a cumulative-max window, drawdown = peak − value,
        -- worst day = earliest day attaining the max drawdown (total
        -- order, engine-independent). The slump diagnostic ops teams
        -- read before declaring an incident window.
        WITH c AS (
            SELECT event_type, epoch_us(ts) // {_DD_DAY_US} AS day,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT event_type, day, cents,
                   MAX(cents) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS peak
            FROM c
        ),
        w AS (
            SELECT event_type, day, cents, peak, peak - cents AS dd,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY peak - cents DESC, day) AS rk
            FROM r
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(peak) AS BIGINT) AS peak_cents,
               CAST(MAX(dd) AS BIGINT) AS max_drawdown_cents,
               CAST(MAX(CASE WHEN rk = 1 THEN day END) AS BIGINT)
                   AS worst_day
        FROM w GROUP BY event_type
    """,
)
def ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each series' daily revenue: running peak
    (cumulative max over observed days), drawdown = peak − today, and
    the earliest day attaining the worst slump. The
    peak-to-trough diagnostic behind incident retros and SLO budget
    reviews — completes the ts_* family's measurement arc (resample →
    smooth → interpolate → autocorr → now worst-case excursion).
    Exact integer cents end to end; the worst-day tiebreak (earliest)
    makes the argmax a total order, never engine iteration order.

    Plan/scale: one map-side-combined agg to (series, day) cells; the
    cumulative max and the rank share ONE series-keyed window sort
    over DAY-cardinality rows (calendar-bounded, never the raw event
    stream — the ts_ewma shape); final rollup is series-sized."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_DD_DAY_US}").alias("day"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    wpeak = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = c.select(
        "event_type",
        "day",
        "cents",
        F.max("cents").over(wpeak).alias("peak"),
    ).withColumn("dd", F.col("peak") - F.col("cents"))
    w = r.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("dd").desc(), F.col("day")
            )
        ),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.max("peak").cast("long").alias("peak_cents"),
        F.max("dd").cast("long").alias("max_drawdown_cents"),
        F.max(F.when(F.col("rk") == 1, F.col("day")))
        .cast("long")
        .alias("worst_day"),
    )


# --------------------------------------------------------------------------
# fn_surrogate_key — deterministic key minting + collision audit (round 8)
# --------------------------------------------------------------------------


@register(
    "fn_surrogate_key",
    tags=("b6",),
    oracle="""
        -- deterministic surrogate keys: 60-bit ints minted from
        -- md5(natural key) — unlike monotonically_increasing_id /
        -- sequences, a PURE FUNCTION of the business key: stable
        -- across runs, engines, and incremental rebuilds (the
        -- sample_split determinism argument applied to warehouse
        -- keys). The collision audit rides along: n_shared > 1 rows
        -- are natural-key duplicates OR 60-bit hash collisions, both
        -- of which must be 0 before the key ships as a join key.
        WITH k AS (
            SELECT c_custkey,
                   ('0x' || substr(md5(c_name || '#'
                        || CAST(c_nationkey AS VARCHAR)), 1, 15))::BIGINT
                       AS skey
            FROM customer
        )
        SELECT c_custkey, skey,
               CAST(COUNT(*) OVER (PARTITION BY skey) AS BIGINT)
                   AS n_shared
        FROM k
    """,
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key minting for dimension loads: a
    60-bit integer key from md5 of the natural key (name + nation) —
    a PURE FUNCTION of the business key, so re-loads, backfills, and
    cross-engine rebuilds mint the SAME key (what
    ``monotonically_increasing_id`` and sequences can never promise),
    plus the collision audit (rows sharing a minted key = natural-key
    dupes or hash collisions; either must be 0 before the key ships).

    60 bits (15 hex chars) keeps the key a plain positive int64 while
    putting the birthday bound at ~2⁻⁶⁰·n²/2 — one-in-a-million at
    a billion rows; the audit column is the proof, not the prayer.

    Plan/scale: one codegen'd projection + one skey-keyed window
    count (the audit's only shuffle) — dimension-cardinality, not
    fact-cardinality."""
    c = table(spark, sf_dir, "customer")
    k = c.select(
        "c_custkey",
        F.expr(
            "CAST(conv(substr(md5(concat(c_name, '#',"
            " CAST(c_nationkey AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        ).alias("skey"),
    )
    w = Window.partitionBy("skey")
    return k.select(
        "c_custkey",
        "skey",
        F.count(F.lit(1)).over(w).cast("long").alias("n_shared"),
    )


# --------------------------------------------------------------------------
# orders_backlog — end-of-month open-order backlog via event differencing
# --------------------------------------------------------------------------


@register(
    "orders_backlog",
    tags=("b3",),
    oracle="""
        -- end-of-month open-order backlog by EVENT DIFFERENCING: an
        -- order is open from o_orderdate until its fulfillment date
        -- (max l_shipdate over its lines); instead of the interval
        -- join "orders x months WHERE open <= eom < close" (fact x
        -- time-axis blowup), emit +1 at the open month and -1 at the
        -- close month and running-sum the tiny month axis. The two
        -- prefix sums telescope to exactly the interval-join count.
        WITH oc AS (
            SELECT l_orderkey, MAX(l_shipdate) AS ship_d
            FROM lineitem GROUP BY l_orderkey
        ),
        c AS (
            -- close = greatest(open, last ship): the synthetic data
            -- carries ship dates before the order date (and 257
            -- line-less orders that never close -- they stay in the
            -- backlog, the "ghost backlog" ops wants surfaced); the
            -- clamp keeps close >= open so the telescoping below is
            -- exactly the interval definition
            SELECT strftime(GREATEST(ship_d, o_orderdate), '%Y-%m') AS mo,
                   CAST(COUNT(*) AS BIGINT) AS n_closed
            FROM orders JOIN oc ON o_orderkey = l_orderkey
            GROUP BY 1
        ),
        o AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS mo,
                   CAST(COUNT(*) AS BIGINT) AS n_opened
            FROM orders GROUP BY 1
        )
        SELECT COALESCE(o.mo, c.mo) AS mo,
               CAST(COALESCE(n_opened, 0) AS BIGINT) AS n_opened,
               CAST(COALESCE(n_closed, 0) AS BIGINT) AS n_closed,
               CAST(SUM(COALESCE(n_opened, 0) - COALESCE(n_closed, 0))
                    OVER (ORDER BY COALESCE(o.mo, c.mo)
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS backlog_eom
        FROM o FULL OUTER JOIN c ON o.mo = c.mo
    """,
)
def orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-month open-order backlog curve — #orders placed but not
    yet fully shipped at each month boundary (open = o_orderdate,
    close = max l_shipdate over the order's lines). The ops
    dashboard number behind "is fulfillment keeping up with demand".

    The naive formulation is an interval x time-axis join (every order
    row repeated for every month it spans — O(orders x months) shuffle
    volume, the shape `join_interval_overlap` had to bin to survive).
    This operator uses EVENT DIFFERENCING instead: each order
    contributes +1 to its open month and -1 to its close month
    (close clamped to greatest(open, last ship) -- the synthetic data
    carries ship dates before the order date; line-less orders never
    close and stay in the curve, the "ghost backlog"), and an
    end-of-month running sum over the MONTH AXIS (dozens of rows,
    regardless of fact volume) reconstructs the exact backlog:
    backlog(M) = sum_{m<=M} opens(m) - closes(m)
               = #{open <= eom(M)} - #{close <= eom(M)}.
    At 100 TB the fact-sized work is one map-side-combined hash agg
    (lineitem by l_orderkey for the last ship date) + one orderkey
    equi join against orders for the clamp — no month replication,
    no interval join. The
    global running-sum window runs over month cardinality only, so the
    single-partition WindowExec is a deliberate tiny-axis choice.

    Cross-engine: counts are exact BIGINT; months compare as
    'yyyy-MM' strings (lexicographic == chronological)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    oc = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("ship_d"))
    closes = (
        orders.join(oc, orders.o_orderkey == oc.l_orderkey)
        .groupBy(
            F.date_format(
                F.greatest("ship_d", "o_orderdate"), "yyyy-MM"
            ).alias("mo")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_closed"))
    )
    opens = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("mo")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_opened"))
    merged = opens.join(closes, "mo", "full_outer").select(
        "mo",
        F.coalesce("n_opened", F.lit(0)).cast("long").alias("n_opened"),
        F.coalesce("n_closed", F.lit(0)).cast("long").alias("n_closed"),
    )
    w = (
        Window.orderBy("mo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return merged.select(
        "mo",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed"))
        .over(w)
        .cast("long")
        .alias("backlog_eom"),
    )


# --------------------------------------------------------------------------
# orders_reorder_rate — repeat-purchase rate per part (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_reorder_rate",
    tags=("b3",),
    oracle="""
        -- per-part repeat-purchase profile: of the customers who ever
        -- bought part p, how many came back for it in a LATER order —
        -- the retention signal behind replenishment recommendations
        -- and "subscribe & save" eligibility (Instacart's reorder
        -- models start from exactly this table). Repeat = distinct
        -- ORDERS per (customer, part) >= 2, so multi-line or
        -- multi-quantity single orders don't inflate it.
        WITH cp AS (
            SELECT o.o_custkey, l.l_partkey,
                   CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT)
                       AS n_orders
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey, l.l_partkey
        )
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_buyers,
               CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_repeat_buyers,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders_total,
               CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
                    * 10000 // COUNT(*) AS BIGINT) AS repeat_bp
        FROM cp GROUP BY l_partkey
    """,
)
def orders_reorder_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part repeat-purchase profile: of the customers who ever
    bought part p, how many came back for it in a LATER order. The
    retention signal behind replenishment recommendations and
    "subscribe & save" eligibility — and the natural prior for
    `graph_link_predict`'s candidates (a part nobody re-buys makes a
    poor recommendation no matter its graph score). Repeat counts
    DISTINCT ORDERS per (customer, part), so a single order with
    multiple lines or quantity 7 is still one purchase event.

    Exactness: pure integer counts and one floor-div basis-point
    rate — nothing to straddle.

    Plan/scale: one orderkey equi join attaches the customer to each
    line (both sides fact-sized — the join every star schema pays),
    then the (cust, part) distinct-order agg combines map-side and
    the part rollup is a second keyed agg. Skewed mega-parts spread
    over the (cust, part) key space in pass one, so no single
    reducer sees a part's full history."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("n_orders"))
    )
    return cp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_buyers"),
        F.sum((F.col("n_orders") >= 2).cast("long"))
        .cast("long")
        .alias("n_repeat_buyers"),
        F.sum("n_orders").cast("long").alias("n_orders_total"),
        F.expr(
            "CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) "
            "* 10000 div count(*) AS BIGINT)"
        ).alias("repeat_bp"),
    )


# --------------------------------------------------------------------------
# table_fingerprint — order-independent table checksums (round 8)
# --------------------------------------------------------------------------


@register(
    "table_fingerprint",
    tags=("b3",),
    oracle="""
        -- order-independent per-table fingerprints: row count + the
        -- SUM (mod 2^60) of a 60-bit md5 over each row's business
        -- columns (modular addition is commutative, so partitioning /
        -- scan order can't change the digest; the 128-bit accumulator
        -- never overflows before the modulus, and the int64 digest
        -- survives the decimal->double compat layer exactly). The
        -- cheap companion to table_diff: compare fingerprints first,
        -- run the full I/U/D diff only on tables whose digests moved
        -- — at 100 TB that's one agg versus a full-table join.
        WITH o AS (
            SELECT 'orders' AS tbl,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(('0x' || substr(md5(
                        o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR
                        || '|' || o_orderstatus || '|'
                        || strftime(o_orderdate, '%Y-%m-%d')), 1, 15)
                        )::BIGINT)::HUGEINT
                        % 1152921504606846976 AS BIGINT) AS checksum
            FROM orders
        ),
        c AS (
            SELECT 'customer' AS tbl,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(('0x' || substr(md5(
                        c_custkey::VARCHAR || '|' || c_name || '|'
                        || c_nationkey::VARCHAR), 1, 15)
                        )::BIGINT)::HUGEINT
                        % 1152921504606846976 AS BIGINT) AS checksum
            FROM customer
        ),
        s AS (
            SELECT 'supplier' AS tbl,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(('0x' || substr(md5(
                        s_suppkey::VARCHAR || '|' || s_name || '|'
                        || s_nationkey::VARCHAR), 1, 15)
                        )::BIGINT)::HUGEINT
                        % 1152921504606846976 AS BIGINT) AS checksum
            FROM supplier
        )
        SELECT * FROM o UNION ALL SELECT * FROM c
        UNION ALL SELECT * FROM s
    """,
)
def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints: per table, the row count
    plus the SUM (mod 2^60) of a 60-bit md5 digest over each row's
    business columns. Modular addition is commutative and associative,
    so scan order, partitioning, and merge order cannot change the
    digest — the 128-bit accumulator never overflows before the final
    modulus, and the int64 result survives the driver's
    decimal→double compat layer EXACTLY — which is what lets two
    INDEPENDENT systems (prod vs replica, engine vs engine, today vs
    yesterday's snapshot) agree on "identical table" without moving
    any data. The cheap companion to `table_diff`: compare
    fingerprints first, run the full I/U/D join diff only on tables
    whose digest moved. A sum survives single-row changes
    arithmetically (old row out, new row in shifts the digest), and
    the 60-bit space keeps collision odds at the `fn_surrogate_key`
    birthday bound.

    Plan/scale: one projection + one map-side-combined agg PER TABLE,
    no join, no shuffle beyond the 1-row agg merges; the three 1-row
    results union driver-free."""

    def fp(df: DataFrame, tbl: str, key_expr: str) -> DataFrame:
        return df.select(
            F.expr(
                f"CAST(conv(substr(md5({key_expr}), 1, 15), 16, 10)"
                " AS decimal(28,0)) AS h"
            )
        ).agg(
            F.lit(tbl).alias("tbl"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr(
                "CAST(sum(h) % 1152921504606846976 AS BIGINT)"
            ).alias("checksum"),
        ).select("tbl", "n_rows", "checksum")

    o = fp(
        table(spark, sf_dir, "orders"),
        "orders",
        "concat(CAST(o_orderkey AS STRING), '|', CAST(o_custkey AS STRING),"
        " '|', o_orderstatus, '|', date_format(o_orderdate, 'yyyy-MM-dd'))",
    )
    c = fp(
        table(spark, sf_dir, "customer"),
        "customer",
        "concat(CAST(c_custkey AS STRING), '|', c_name, '|',"
        " CAST(c_nationkey AS STRING))",
    )
    s = fp(
        table(spark, sf_dir, "supplier"),
        "supplier",
        "concat(CAST(s_suppkey AS STRING), '|', s_name, '|',"
        " CAST(s_nationkey AS STRING))",
    )
    return o.unionAll(c).unionAll(s)


# --------------------------------------------------------------------------
# join_pit_scd2 — point-in-time dimensional version lookup (round 8)
# --------------------------------------------------------------------------


@register(
    "join_pit_scd2",
    tags=("b3",),
    oracle="""
        -- point-in-time SCD-2 lookup: for every order, which VERSION
        -- of its customer's history was current when the order's LAST
        -- line shipped, vs the version the order itself created —
        -- versions_advanced is the dimension-staleness readout
        -- ("the customer changed N times while this order was in
        -- fulfillment"), the question every as-of/PIT join in a
        -- warehouse exists to answer. Versions collapse to one per
        -- (customer, day) — max version wins — so the as-of pick is
        -- unambiguous on same-day changes; ship-before-order lines
        -- (a real defect in this data, see dq_referential_integrity)
        -- surface as matched = 0 or negative advancement instead of
        -- being silently absorbed.
        WITH v AS (
            SELECT o_custkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS version,
                   o_orderkey, o_orderdate
            FROM orders
        ),
        vd AS (
            SELECT o_custkey, o_orderdate AS vfrom,
                   MAX(version) AS version
            FROM v GROUP BY o_custkey, o_orderdate
        ),
        ls AS (
            SELECT l_orderkey, MAX(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey
        ),
        probe AS (
            SELECT v.o_orderkey, v.o_custkey,
                   CAST(v.version AS BIGINT) AS own_version,
                   ls.last_ship
            FROM v JOIN ls ON ls.l_orderkey = v.o_orderkey
        )
        SELECT p.o_orderkey, p.o_custkey, p.own_version,
               CAST(vd.version AS BIGINT) AS version_at_ship,
               CAST(vd.version - p.own_version AS BIGINT)
                   AS versions_advanced,
               CAST(vd.version IS NOT NULL AS INT) AS matched
        FROM probe p
        ASOF LEFT JOIN vd
          ON p.o_custkey = vd.o_custkey AND p.last_ship >= vd.vfrom
    """,
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD-2 lookup: join every order (probing at its
    LAST ship date) to the customer-history VERSION current at that
    moment, and report how far the dimension advanced past the
    version the order itself created. This is THE dimensional-
    warehouse temporal join — "facts must join the dimension row
    valid AT fact time, not the current one" — executed as a
    carry-forward as-of over the `scd2_history` versioning scheme.
    ``versions_advanced`` is the staleness readout a reporting team
    checks before trusting any current-dimension join; negative
    values and matched = 0 surface this dataset's genuine
    ship-before-order defects (`dq_referential_integrity`) instead
    of silently absorbing them.

    As-of mechanics (the `join_asof` union trick, dimension-keyed):
    version rows (one per (customer, day), max version wins — so
    same-day changes are unambiguous) and probe rows union into one
    stream, ONE (custkey)-keyed window sorted by (date, kind) carries
    the last version forward onto each probe; version rows sort
    before probes on the same date, giving the >= as-of bound.

    Plan/scale: version numbering and the carry-forward share the
    custkey partitioning; the last-ship agg is map-side combined;
    no broadcast assumption — a billion-customer dimension
    hash-partitions like any other as-of here."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    w_v = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    v = o.select(
        "o_custkey",
        F.row_number().over(w_v).alias("version"),
        "o_orderkey",
        "o_orderdate",
    )
    vd = v.groupBy(
        "o_custkey", F.col("o_orderdate").alias("d")
    ).agg(F.max("version").alias("ver"))
    ls = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    probe = v.join(ls, v.o_orderkey == ls.l_orderkey).select(
        "o_orderkey",
        "o_custkey",
        F.col("version").cast("long").alias("own_version"),
        F.col("last_ship").alias("d"),
    )
    stream = vd.select(
        "o_custkey", "d", F.lit(0).alias("kind"), "ver",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("own_version"),
    ).unionAll(
        probe.select(
            "o_custkey", "d", F.lit(1).alias("kind"),
            F.lit(None).cast("int").alias("ver"),
            "o_orderkey", "own_version",
        )
    )
    w_cf = (
        Window.partitionBy("o_custkey")
        .orderBy("d", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = stream.select(
        "*", F.last("ver", ignorenulls=True).over(w_cf).alias("cur_ver")
    ).filter(F.col("kind") == 1)
    return carried.select(
        "o_orderkey",
        "o_custkey",
        "own_version",
        F.col("cur_ver").cast("long").alias("version_at_ship"),
        (F.col("cur_ver") - F.col("own_version"))
        .cast("long")
        .alias("versions_advanced"),
        F.col("cur_ver").isNotNull().cast("int").alias("matched"),
    )


# --------------------------------------------------------------------------
# orders_margin_waterfall — monthly revenue decomposition (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_margin_waterfall",
    tags=("b3",),
    oracle="""
        -- monthly revenue WATERFALL: gross list price, minus the
        -- discount give-back, plus the tax pass-through, down to
        -- charged revenue — the finance bridge that explains "why is
        -- net not gross" month by month (TPC-H Q1's sums, given the
        -- time axis and the decomposition structure a revenue team
        -- actually reads). All sums ride the exact decimal policy
        -- (compat.dsum), and the derived columns are decimal
        -- SUBTRACTIONS of those sums — no second rounding grid.
        SELECT strftime(o_orderdate, '%Y-%m') AS mo,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6)))
                    AS DECIMAL(38,6)) AS gross,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6)))
                         AS DECIMAL(38,6))
                    - CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(20,6))) AS DECIMAL(38,6))
                    AS DECIMAL(38,6)) AS discount_amt,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(20,6))) AS DECIMAL(38,6))
                   AS net_of_discount,
               CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) AS DECIMAL(20,6)))
                         AS DECIMAL(38,6))
                    - CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                    AS DECIMAL(20,6))) AS DECIMAL(38,6))
                    AS DECIMAL(38,6)) AS tax_amt,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             * (1 + l_tax) AS DECIMAL(20,6)))
                    AS DECIMAL(38,6)) AS charged
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def orders_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue waterfall: gross list price → minus discount
    give-back → plus tax pass-through → charged revenue, per order
    month. TPC-H Q1 computes these sums as a flat profile; the
    waterfall arranges them as the BRIDGE a finance review actually
    reads — each column is a step, adjacent steps reconcile exactly
    (gross − discount_amt = net_of_discount; net + tax_amt =
    charged), and a month whose discount step suddenly widens is the
    promo-leak alarm.

    Exactness: all three base sums ride the compat decimal policy
    (per-row cast to DECIMAL(20,6), decimal addition — associative,
    order-independent); the two step columns are decimal
    SUBTRACTIONS of those sums, so the reconciliation identities
    hold to the last digit on both engines, not just approximately.

    Plan/scale: one orderkey equi join for the month key + ONE
    map-side-combined hash agg carrying all five sums in a single
    pass; month-cardinality output."""
    from nchu_bigdata_spark.compat import dsum

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charged = disc * (1 + F.col("l_tax"))
    agg = j.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("mo")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        dsum("l_extendedprice").alias("gross"),
        dsum(disc).alias("net_of_discount"),
        dsum(charged).alias("charged"),
    )
    return agg.select(
        "mo",
        "n_lines",
        "gross",
        (F.col("gross") - F.col("net_of_discount"))
        .cast("decimal(38,6)")
        .alias("discount_amt"),
        "net_of_discount",
        (F.col("charged") - F.col("net_of_discount"))
        .cast("decimal(38,6)")
        .alias("tax_amt"),
        "charged",
    )


# --------------------------------------------------------------------------
# orders_supplier_scorecard — multi-metric supplier mart (round 8)
# --------------------------------------------------------------------------

_SLA_DAYS = 30  # ship within 30 days of the order date or it's late


@register(
    "orders_supplier_scorecard",
    tags=("b3",),
    oracle=f"""
        -- supplier scorecard: revenue, breadth (distinct parts /
        -- customers served), volume, and the {_SLA_DAYS}-day SLA
        -- late-ship rate, with a dense revenue rank — the vendor-
        -- management mart that decides quarterly business reviews.
        -- Revenue rides the exact decimal policy; the late rate is
        -- an integer bp; rank ties break on revenue only (DENSE_RANK
        -- gives equal revenue equal rank on both engines).
        WITH l AS (
            SELECT l.l_suppkey, l.l_partkey, o.o_custkey,
                   l.l_extendedprice * (1 - l.l_discount) AS rev,
                   CASE WHEN l.l_shipdate
                             > o.o_orderdate + INTERVAL {_SLA_DAYS} DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        s AS (
            SELECT l_suppkey,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(SUM(CAST(rev AS DECIMAL(20,6)))
                        AS DECIMAL(38,6)) AS revenue,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
                       AS n_parts,
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                       AS n_customers,
                   CAST(SUM(late) * 10000 // COUNT(*) AS BIGINT)
                       AS late_bp
            FROM l GROUP BY l_suppkey
        )
        SELECT sup.s_name, s.*, 
               CAST(DENSE_RANK() OVER (ORDER BY s.revenue DESC)
                    AS BIGINT) AS revenue_rank
        FROM s JOIN supplier sup ON sup.s_suppkey = s.l_suppkey
    """,
)
def orders_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard: per supplier, the revenue (exact decimal),
    assortment breadth (distinct parts), customer reach, line volume,
    the {d}-day SLA late-ship rate in bp, and a dense revenue rank —
    the vendor-management mart behind quarterly business reviews,
    and the first consumer of the supplier dimension beyond TPC-H's
    own queries. One table answers "who ships late", "who
    concentrates our revenue", and "who is a single-part vendor"
    (churn risk) at once.

    Exactness: revenue rides `compat.dsum` decimals; the late rate
    is pure integer bp; DENSE_RANK over revenue gives equal revenue
    equal rank deterministically (no arbitrary tie order leaks into
    the output).

    Plan/scale: one orderkey equi join (the star-schema toll), one
    supplier-keyed agg carrying all metrics in a single pass
    (distincts expand partials map-side); the rank window runs
    DIRECTLY over that supplier-cardinality aggregate (r9: moved
    below the name join so the window input is structurally the agg,
    not a join the audit can't bound), then one dimension-sized name
    join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    from nchu_bigdata_spark.compat import dsum

    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        "l_partkey",
        "o_custkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), _SLA_DAYS)
        )
        .cast("long")
        .alias("late"),
    )
    s = l.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        dsum("rev").alias("revenue"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        F.expr(
            "CAST(sum(late) * 10000 div count(*) AS BIGINT)"
        ).alias("late_bp"),
    )
    ranked = s.withColumn(
        "revenue_rank",
        F.dense_rank()
        .over(Window.orderBy(F.desc("revenue")))
        .cast("long"),
    )
    return ranked.join(sup, ranked.l_suppkey == sup.s_suppkey).select(
        "s_name",
        "l_suppkey",
        "n_lines",
        "revenue",
        "n_parts",
        "n_customers",
        "late_bp",
        "revenue_rank",
    )


# --------------------------------------------------------------------------
# orders_aging_wip — open-order aging snapshot by priority (round 8)
# --------------------------------------------------------------------------

_WIP_SNAP = "1998-06-01"  # snapshot date (mid-range of the order stream)


@register(
    "orders_aging_wip",
    tags=("b3",),
    oracle=f"""
        -- aging WIP report at a pinned snapshot: every order OPEN at
        -- {_WIP_SNAP} (placed on/before, not fully shipped after —
        -- the orders_backlog clamp semantics, line-less orders never
        -- close), bucketed by age and priority with counts, value,
        -- and the oldest age — the ops report that turns "backlog is
        -- up" into "WHICH orders, HOW old, at WHAT priority". An
        -- URGENT order in the 91+ bucket is the escalation list.
        WITH oc AS (
            SELECT l_orderkey, MAX(l_shipdate) AS ship_d
            FROM lineitem GROUP BY l_orderkey
        ),
        open_o AS (
            SELECT o.o_orderpriority, o.o_totalprice,
                   (DATE '{_WIP_SNAP}' - o.o_orderdate::DATE) AS age_d
            FROM orders o LEFT JOIN oc ON oc.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate <= TIMESTAMP '{_WIP_SNAP} 00:00:00'
              AND (oc.ship_d IS NULL OR
                   GREATEST(oc.ship_d, o.o_orderdate)
                       > TIMESTAMP '{_WIP_SNAP} 00:00:00')
        )
        SELECT o_orderpriority,
               CASE WHEN age_d <= 7 THEN '0-7'
                    WHEN age_d <= 30 THEN '8-30'
                    WHEN age_d <= 90 THEN '31-90'
                    ELSE '91+' END AS age_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6)))
                    AS DECIMAL(38,6)) AS open_value,
               CAST(MAX(age_d) AS BIGINT) AS oldest_age_days
        FROM open_o
        GROUP BY o_orderpriority, 2
    """,
)
def orders_aging_wip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging WIP report at a pinned snapshot date: every order OPEN at
    {d} (placed on/before it, not fully shipped after it — the
    `orders_backlog` clamp semantics, with line-less orders never
    closing), bucketed by age band and order priority, with counts,
    open value (exact decimal), and the oldest age per cell. This is
    the report that turns `orders_backlog`'s one "backlog is up"
    number into WHICH orders, HOW old, at WHAT priority — an URGENT
    order sitting in the 91+ band IS the escalation list, and the
    line-less never-closers accumulate in exactly that corner.

    Plan/scale: the close date is the same one fact agg + orderkey
    join the backlog op pays; the snapshot filter then collapses
    everything to open-order cardinality before the
    (priority x band) rollup. Exactness: ages are integer day
    differences of DATE values, value rides compat decimals."""
    oc = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship_d"))
    )
    o = table(spark, sf_dir, "orders")
    snap_ts = F.lit(_WIP_SNAP).cast("timestamp")
    open_o = (
        o.join(oc, o.o_orderkey == oc.l_orderkey, "left")
        .filter(
            (F.col("o_orderdate") <= snap_ts)
            & (
                F.col("ship_d").isNull()
                | (F.greatest("ship_d", "o_orderdate") > snap_ts)
            )
        )
        .select(
            "o_orderpriority",
            "o_totalprice",
            F.datediff(
                F.lit(_WIP_SNAP).cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("age_d"),
        )
    )
    from nchu_bigdata_spark.compat import dsum

    bucket = (
        F.when(F.col("age_d") <= 7, "0-7")
        .when(F.col("age_d") <= 30, "8-30")
        .when(F.col("age_d") <= 90, "31-90")
        .otherwise("91+")
    )
    return open_o.groupBy(
        "o_orderpriority", bucket.alias("age_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        dsum("o_totalprice").alias("open_value"),
        F.max("age_d").cast("long").alias("oldest_age_days"),
    )


# --------------------------------------------------------------------------
# orders_pvm_variance — price/volume/mix bridge between years (round 8)
# --------------------------------------------------------------------------

_PVM_Y0, _PVM_Y1 = 1996, 1997


@register(
    "orders_pvm_variance",
    tags=("b3",),
    oracle=f"""
        -- price/volume/mix revenue bridge {_PVM_Y0}->{_PVM_Y1} per
        -- brand, EXACTLY reconciling by construction: per carried
        -- part, m = floor(r0*q1/q0) (the baseline revenue at new
        -- volume); price_effect = r1 - m and volume_effect = m - r0
        -- share the SAME floored m, so their sum telescopes to
        -- r1 - r0 with zero rounding residue. New parts land in
        -- new_effect (+r1), discontinued in exit_effect (-r0) —
        -- total_delta = sum of the four effects, to the cent. The
        -- FP&A bridge behind every "why did revenue move" review.
        WITH y AS (
            SELECT p.p_brand, l.l_partkey,
                   CAST(year(l.l_shipdate) AS INT) AS yr,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS r,
                   CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT))
                        AS BIGINT) AS q
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE year(l.l_shipdate) IN ({_PVM_Y0}, {_PVM_Y1})
            GROUP BY p.p_brand, l.l_partkey, year(l.l_shipdate)
        ),
        w AS (
            SELECT p_brand, l_partkey,
                   MAX(CASE WHEN yr = {_PVM_Y0} THEN r END) AS r0,
                   MAX(CASE WHEN yr = {_PVM_Y0} THEN q END) AS q0,
                   MAX(CASE WHEN yr = {_PVM_Y1} THEN r END) AS r1,
                   MAX(CASE WHEN yr = {_PVM_Y1} THEN q END) AS q1
            FROM y GROUP BY p_brand, l_partkey
        ),
        eff AS (
            SELECT p_brand,
                   COALESCE(r0, 0) AS r0, COALESCE(r1, 0) AS r1,
                   CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                        THEN r1 - (CAST(r0 AS HUGEINT) * q1 // q0)
                        ELSE 0 END AS price_eff,
                   CASE WHEN r0 IS NOT NULL AND r1 IS NOT NULL
                        THEN (CAST(r0 AS HUGEINT) * q1 // q0) - r0
                        ELSE 0 END AS vol_eff,
                   CASE WHEN r0 IS NULL THEN r1 ELSE 0 END AS new_eff,
                   CASE WHEN r1 IS NULL THEN -r0 ELSE 0 END AS exit_eff
            FROM w
        )
        SELECT p_brand,
               CAST(SUM(r0) AS BIGINT) AS rev0_cents,
               CAST(SUM(r1) AS BIGINT) AS rev1_cents,
               CAST(SUM(price_eff) AS BIGINT) AS price_effect,
               CAST(SUM(vol_eff) AS BIGINT) AS volume_effect,
               CAST(SUM(new_eff) AS BIGINT) AS new_effect,
               CAST(SUM(exit_eff) AS BIGINT) AS exit_effect
        FROM eff GROUP BY p_brand
    """,
)
def orders_pvm_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix revenue bridge between {y0} and {y1}, per
    brand — the FP&A decomposition behind every "why did revenue
    move" review: for each part carried in both years, the baseline
    revenue AT NEW VOLUME m = floor(r0·q1/q0) splits the change into
    a price effect (r1 − m: same volume, new realized price) and a
    volume effect (m − r0: same price, new volume); parts that only
    exist in one year land in new/exit effects. The floor convention
    is chosen so the bridge RECONCILES EXACTLY: price and volume
    effects share the same floored m, so their sum telescopes to
    r1 − r0 with zero rounding residue, and
    rev1 − rev0 = price + volume + new + exit to the cent — the
    property a finance bridge is useless without (and the one float
    PVM implementations silently lose).

    Exactness: integer cents and unit counts; the one division is
    the floored 128-bit cross product r0·q1 div q0 (events_rfm
    decimal policy).

    Plan/scale: one partkey-keyed join to the part dim, one
    (brand, part, year) agg, a part-level pivot, and a brand rollup
    — fact-scan bounded, output = brand cardinality."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    y = (
        li.filter(F.year("l_shipdate").isin(_PVM_Y0, _PVM_Y1))
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            "l_partkey",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            )
            .cast("long")
            .alias("r"),
            F.sum(F.round("l_quantity").cast("long"))
            .cast("long")
            .alias("q"),
        )
    )
    w = y.groupBy("p_brand", "l_partkey").agg(
        F.max(F.when(F.col("yr") == _PVM_Y0, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("yr") == _PVM_Y0, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == _PVM_Y1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("yr") == _PVM_Y1, F.col("q"))).alias("q1"),
    )
    m = F.expr("CAST(CAST(r0 AS decimal(38,0)) * q1 div q0 AS BIGINT)")
    carried = F.col("r0").isNotNull() & F.col("r1").isNotNull()
    eff = w.select(
        "p_brand",
        F.coalesce("r0", F.lit(0)).alias("r0"),
        F.coalesce("r1", F.lit(0)).alias("r1"),
        F.when(carried, F.col("r1") - m).otherwise(0).alias("price_eff"),
        F.when(carried, m - F.col("r0")).otherwise(0).alias("vol_eff"),
        F.when(F.col("r0").isNull(), F.col("r1"))
        .otherwise(0)
        .alias("new_eff"),
        F.when(F.col("r1").isNull(), -F.col("r0"))
        .otherwise(0)
        .alias("exit_eff"),
    )
    return eff.groupBy("p_brand").agg(
        F.sum("r0").cast("long").alias("rev0_cents"),
        F.sum("r1").cast("long").alias("rev1_cents"),
        F.sum("price_eff").cast("long").alias("price_effect"),
        F.sum("vol_eff").cast("long").alias("volume_effect"),
        F.sum("new_eff").cast("long").alias("new_effect"),
        F.sum("exit_eff").cast("long").alias("exit_effect"),
    )


# --------------------------------------------------------------------------
# orders_xyz_class — demand-variability classification (round 8)
# --------------------------------------------------------------------------

# CV^2 thresholds in bp of 1.0: X (steady) < 0.25, Y < 1.0, Z above —
# the squared versions of the classic CV 0.5/1.0 cuts, kept in exact
# cross-multiplied integers.
_XYZ_X_CV2_BP = 2_500
_XYZ_Y_CV2_BP = 10_000


@register(
    "orders_xyz_class",
    tags=("b3",),
    oracle=f"""
        -- XYZ demand-variability classification per part: the
        -- coefficient of variation of MONTHLY demand decides whether
        -- a part is forecastable (X: steady), seasonal-ish (Y), or
        -- erratic (Z: order-driven) — the inventory-policy axis that
        -- pairs with orders_abc_class's value axis into the classic
        -- ABC/XYZ planning matrix. Exact: cv2_bp = 10^4·(n·Σq²−S²)
        -- div S² — CV² fully cross-multiplied, zero months count as
        -- zero demand via the calendar densified span.
        WITH m AS (
            SELECT l_partkey,
                   (year(l_shipdate) * 12 + month(l_shipdate) - 1)
                       AS mo,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                        AS BIGINT) AS q
            FROM lineitem GROUP BY 1, 2
        ),
        span AS (
            SELECT CAST(MAX(mo) - MIN(mo) + 1 AS BIGINT) AS n_months
            FROM m
        ),
        s AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n_active,
                   CAST(SUM(q) AS BIGINT) AS sq,
                   CAST(SUM(q * q) AS BIGINT) AS sqq
            FROM m GROUP BY l_partkey
        )
        SELECT l_partkey, span.n_months, s.n_active, s.sq AS total_qty,
               CAST((span.n_months * s.sqq - s.sq * s.sq) * 10000
                    // (s.sq * s.sq) AS BIGINT) AS cv2_bp,
               CASE WHEN (span.n_months * s.sqq - s.sq * s.sq) * 10000
                         < {_XYZ_X_CV2_BP} * s.sq * s.sq THEN 'X'
                    WHEN (span.n_months * s.sqq - s.sq * s.sq) * 10000
                         < {_XYZ_Y_CV2_BP} * s.sq * s.sq THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM s, span
    """,
)
def orders_xyz_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification per part: the
    coefficient of variation of MONTHLY demand over the corpus' full
    month span decides whether a part is forecastable (X: steady
    demand, stock to forecast), intermittent (Y), or erratic (Z:
    order-driven, stock to order) — the variability axis that pairs
    with `orders_abc_class`'s value axis into the classic ABC/XYZ
    inventory planning matrix. Months with no demand COUNT AS ZERO
    (over the densified span — the `ts_densify` lesson): skipping
    them is the textbook mistake that misclassifies intermittent
    demand as steady.

    Exactness: CV² fully cross-multiplied — with n = span months,
    S = Σq, P = Σq², population CV² = (n·P − S²)/S², so cv2_bp =
    10⁴·(n·P − S²) div S² and the class cuts compare the same
    integer products. Zero-month handling rides the algebra (absent
    months contribute 0 to both S and P), so no grid join is even
    needed.

    Plan/scale: one (part, month) map-side agg, one part-keyed
    moment agg, a 1-row span broadcast — part-cardinality output,
    no window, no join."""
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1).alias(
            "mo"
        ),
    ).agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("q"))
    span = m.agg(
        (F.max("mo") - F.min("mo") + 1).cast("long").alias("n_months")
    )
    s = m.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("q").cast("long").alias("sq"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sqq"),
    )
    num = F.col("n_months") * F.col("sqq") - F.col("sq") * F.col("sq")
    den = F.col("sq") * F.col("sq")
    return s.join(F.broadcast(span)).select(
        "l_partkey",
        "n_months",
        "n_active",
        F.col("sq").alias("total_qty"),
        F.expr(
            "CAST((n_months * sqq - sq * sq) * 10000"
            " div (sq * sq) AS BIGINT)"
        ).alias("cv2_bp"),
        F.when(num * 10000 < _XYZ_X_CV2_BP * den, "X")
        .when(num * 10000 < _XYZ_Y_CV2_BP * den, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )


# --------------------------------------------------------------------------
# orders_returns_rate — return-share dashboard (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_returns_rate",
    tags=("b3",),
    oracle="""
        -- return-rate dashboard per (brand, ship year): returned
        -- lines (l_returnflag = 'R') and returned revenue share in
        -- exact bp — the quality/fit signal merchandising watches by
        -- brand and the finance contra-revenue input; a brand whose
        -- return share CLIMBS across years is a listing-quality or
        -- sizing defect surfacing as logistics cost.
        SELECT p.p_brand,
               CAST(year(l.l_shipdate) AS INT) AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_returned,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                             THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS return_line_bp,
               CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                             THEN CAST(ROUND(l.l_extendedprice * 100, 0)
                                       AS BIGINT) ELSE 0 END) * 10000
                    // SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                                AS BIGINT)) AS BIGINT)
                   AS return_value_bp
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, year(l.l_shipdate)
    """,
)
def orders_returns_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate dashboard per (brand, ship year): the share of
    lines AND of revenue flagged returned (l_returnflag = 'R'), in
    exact basis points. Line share and value share diverge exactly
    when expensive items return disproportionately — the signal that
    separates "customers return cheap add-ons" (annoying) from
    "customers return the flagship" (a product defect) — and a brand
    whose return share climbs across years is a listing-quality or
    sizing problem surfacing as logistics cost. The returned-value
    column is also finance's contra-revenue input, which is why it
    rides integer cents, not a float ratio.

    Plan/scale: one partkey join to the dimension + ONE map-side
    (brand, year) agg carrying all four sums; brand × year output."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    ret = (F.col("l_returnflag") == "R").cast("long")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(ret).cast("long").alias("n_returned"),
            F.expr(
                "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
                " * 10000 div count(*) AS BIGINT)"
            ).alias("return_line_bp"),
            F.expr(
                "CAST(sum(CASE WHEN l_returnflag = 'R' THEN"
                " CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
                " ELSE 0 END) * 10000"
                " div sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))"
                " AS BIGINT)"
            ).alias("return_value_bp"),
        )
    )


# --------------------------------------------------------------------------
# orders_interval_merge — merge overlapping fulfillment windows (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_interval_merge",
    tags=("b11",),
    oracle="""
        -- Merge overlapping intervals (the gaps-and-islands UNION
        -- form): each order's fulfillment window [orderdate,
        -- max(shipdate)] per customer, coalesced into maximal
        -- non-overlapping activity windows -- the interval-union
        -- primitive behind "total days under active fulfillment"
        -- (billable-coverage / SLA-exposure math, where summing raw
        -- durations double-counts overlaps). Island detection: a new
        -- island starts when this start exceeds the running max END
        -- of all PRECEDING intervals (strictly-before frame).
        WITH iv AS (
            SELECT o_custkey AS ck, o_orderkey AS ok,
                   epoch_us(o_orderdate) // 86400000000 AS s,
                   MAX(epoch_us(l_shipdate) // 86400000000) AS e
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_custkey, o_orderkey, o_orderdate
        ),
        m AS (
            SELECT ck, ok, s, e,
                   MAX(e) OVER (
                       PARTITION BY ck ORDER BY s, e, ok
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max_e
            FROM iv
        ),
        isl AS (
            SELECT ck, s, e,
                   SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY ck ORDER BY s, e, ok
                   ) AS island
            FROM m
        ),
        w AS (
            SELECT ck, island, MIN(s) AS ws, MAX(e) AS we,
                   COUNT(*) AS n_orders
            FROM isl GROUP BY ck, island
        )
        SELECT ck AS o_custkey,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(n_orders) AS BIGINT) AS n_orders,
               CAST(SUM(we - ws + 1) AS BIGINT) AS covered_days,
               CAST(MAX(we) - MIN(ws) + 1 AS BIGINT) AS span_days
        FROM w GROUP BY ck
    """,
)
def orders_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals — the gaps-and-islands UNION form:
    each order's fulfillment window [orderdate, max(shipdate)] per
    customer, coalesced into maximal non-overlapping activity windows.
    The interval-union primitive behind "total days under active
    fulfillment": billable-coverage / SLA-exposure math where summing
    raw durations double-counts overlaps (`join_interval_overlap`
    finds PAIRS that overlap; this REMOVES the overlap). covered_days
    < span_days exposes the idle gaps between windows.

    Mechanics: an island starts exactly when this interval's start
    exceeds the running MAX END of all preceding intervals (the
    strictly-before ROWS frame) — the standard reduction that handles
    nested and chained overlaps alike; island id = running sum of
    start flags. All integer epoch days.

    Plan/scale: the per-order rollup collapses lineitem map-side;
    then ONE custkey-partitioned sort serves the running-max window,
    the island-id window, and both rollups partition-locally — the
    sessionize shape (no global sort, parallel across customers)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate")
        .agg(
            F.max(
                F.expr(
                    "unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                    " div 86400000000"
                )
            ).alias(
                "e"
            )
        )
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("o_orderkey").alias("ok"),
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            ).alias("s"),
            "e",
        )
    )
    w_ord = Window.partitionBy("ck").orderBy("s", "e", "ok")
    m = iv.withColumn(
        "prev_max_e",
        F.max("e").over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    isl = m.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0)
        ).over(w_ord),
    )
    w = isl.groupBy("ck", "island").agg(
        F.min("s").alias("ws"),
        F.max("e").alias("we"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return w.groupBy(F.col("ck").alias("o_custkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum(F.col("we") - F.col("ws") + 1).cast("long").alias("covered_days"),
        (F.max("we") - F.min("ws") + 1).cast("long").alias("span_days"),
    )


# --------------------------------------------------------------------------
# orders_perfect_rate — perfect-order composite KPI (round 8)
# --------------------------------------------------------------------------

_PERFECT_SLA_DAYS = 30


@register(
    "orders_perfect_rate",
    tags=("b11",),
    oracle=f"""
        -- Perfect-order rate: the supply-chain composite KPI -- an
        -- order is PERFECT only if EVERY line shipped within
        -- {_PERFECT_SLA_DAYS} days AND no line came back as a return
        -- ('R'). Composites multiply: two 95% components make a
        -- ~90% composite, which is why the perfect rate is reported
        -- beside its components (on-time rate, return-free rate) --
        -- the decomposition says WHICH leg to fix. Monthly, floor bp.
        WITH l AS (
            SELECT o_orderkey, o_orderdate,
                   epoch_us(o_orderdate) // 86400000000 AS od,
                   BOOL_AND(epoch_us(l_shipdate) // 86400000000
                            - epoch_us(o_orderdate) // 86400000000
                            <= {_PERFECT_SLA_DAYS}) AS on_time,
                   BOOL_AND(l_returnflag <> 'R') AS return_free
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY o_orderkey, o_orderdate
        )
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN on_time THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS on_time_bp,
               CAST(SUM(CASE WHEN return_free THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS return_free_bp,
               CAST(SUM(CASE WHEN on_time AND return_free
                             THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS perfect_bp
        FROM l GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def orders_perfect_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfect-order rate — the supply-chain composite KPI: an order
    is PERFECT only if EVERY line shipped within {d} days AND no line
    came back as a return. Composites multiply (two 95% components ≈
    a 90% composite), so the operator reports the components beside
    the composite — the decomposition that says WHICH leg to fix,
    monthly, in floor bp. The all-lines quantifier is the point:
    `orders_fulfillment_lag` profiles line lag; this demands the
    WHOLE order clear both bars.

    Exactness: epoch-day integer lag; BOOL_AND per order; floor-bp
    shares.

    Plan/scale: ONE orderkey-keyed join + map-side-combined BOOL_AND
    rollup collapses lineitem to |orders| rows; the monthly rollup is
    month-cardinality. The quantifier runs as an aggregate, never a
    correlated subquery per order."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    l = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.expr(
                "BOOL_AND(unix_micros(CAST(l_shipdate AS TIMESTAMP))"
                " div 86400000000"
                " - unix_micros(CAST(o_orderdate AS TIMESTAMP))"
                f" div 86400000000 <= {_PERFECT_SLA_DAYS})"
            ).alias("on_time"),
            F.expr("BOOL_AND(l_returnflag <> 'R')").alias("return_free"),
        )
    )
    return l.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.expr(
            "CAST(SUM(CASE WHEN on_time THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("on_time_bp"),
        F.expr(
            "CAST(SUM(CASE WHEN return_free THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) AS BIGINT)"
        ).alias("return_free_bp"),
        F.expr(
            "CAST(SUM(CASE WHEN on_time AND return_free THEN 1 ELSE 0 END)"
            " * 10000 div COUNT(*) AS BIGINT)"
        ).alias("perfect_bp"),
    )


# --------------------------------------------------------------------------
# orders_rank_stability — leaderboard churn via exact Spearman (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_rank_stability",
    tags=("b11",),
    oracle="""
        -- Leaderboard stability: Spearman rank correlation between
        -- consecutive months' brand-revenue rankings -- rho near 1e4
        -- means the league table barely moved, low/negative means
        -- churn (assortment shifts, promo shocks). Exact: ranks are
        -- integers (revenue ties broken by brand), and rho =
        -- 1 - 6*sum(d^2)/(n(n^2-1)) exports as the exact scaled
        -- integer ((D - 6*sum(d^2)) * 10000) // D with D = n(n^2-1)
        -- -- sign-split for the rare negative.
        WITH b AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS mo, p_brand,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                       AS cents
            FROM orders
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN part ON p_partkey = l_partkey
            GROUP BY 1, 2
        ),
        pair AS (
            SELECT a.mo AS mo_from, c.mo AS mo_to, a.p_brand,
                   a.cents AS cents_a, c.cents AS cents_b
            FROM b a
            JOIN b c ON c.p_brand = a.p_brand
                    AND c.mo = strftime(
                        (a.mo || '-01')::DATE + INTERVAL 1 MONTH, '%Y-%m')
        ),
        p AS (
            -- rank WITHIN the common brand set (both sides must be
            -- permutations of the same set or 1 - 6*sum(d^2)/D is not
            -- a correlation at all)
            SELECT mo_from, mo_to,
                   CAST(ROW_NUMBER() OVER (
                            PARTITION BY mo_from, mo_to
                            ORDER BY cents_a DESC, p_brand)
                        - ROW_NUMBER() OVER (
                            PARTITION BY mo_from, mo_to
                            ORDER BY cents_b DESC, p_brand)
                        AS HUGEINT) AS d
            FROM pair
        ),
        s AS (
            SELECT mo_from, mo_to,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(d * d) AS HUGEINT) AS sd2
            FROM p GROUP BY mo_from, mo_to
        )
        SELECT mo_from, mo_to, CAST(n AS BIGINT) AS n_brands,
               CAST(CASE WHEN n * (n * n - 1) - 6 * sd2 >= 0
                    THEN ((n * (n * n - 1) - 6 * sd2) * 10000)
                         // (n * (n * n - 1))
                    ELSE -(((6 * sd2 - n * (n * n - 1)) * 10000)
                           // (n * (n * n - 1))) END AS BIGINT)
                   AS spearman_e4
        FROM s WHERE n >= 2
    """,
)
def orders_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability — Spearman rank correlation between
    consecutive months' brand-revenue rankings: ρ ≈ 1 means the
    league table barely moved, low or negative means churn
    (assortment shifts, promo shocks). The longitudinal companion to
    `win_topn_ties` (which pins a single month's cut semantics) and
    `orders_market_share` (which tracks one brand's movement): this
    scores the WHOLE ranking's month-over-month persistence in one
    number.

    Exactness: ranks are integers (revenue DESC, brand tie-break)
    computed WITHIN each month-pair's COMMON brand set — both sides
    must be permutations of the same set or the closed form is not a
    correlation (the first cut ranked each month over all its brands
    and ρ escaped [−1, 1] on the fixture — caught by the replay
    test's bound assertion);
    ρ = 1 − 6Σd²/(n(n²−1)) exports as the exact scaled integer
    ((D − 6Σd²)·10⁴) div D with D = n(n²−1), sign-split for the
    (rare) negative — no float, the `embed_pca_power` division
    convention.

    Plan/scale: facts collapse to (month, brand) — dimension × time
    cardinality; per-month ranks ride month-partitioned windows over
    ~|brands| rows; the month-pair self join is keyed on brand with
    the month-successor as an equality (pre-computed key), not a
    range."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("mo"), "p_brand"
        )
        .agg(
            F.sum(
                F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    nxt = b.select(
        F.expr(
            "date_format(add_months(to_date(concat(mo, '-01')), -1),"
            " 'yyyy-MM')"
        ).alias("mo_prev"),
        F.col("mo").alias("mo_to"),
        F.col("p_brand").alias("brand2"),
        F.col("cents").alias("cents_b"),
    )
    pair = b.join(
        nxt,
        (F.col("p_brand") == F.col("brand2")) & (F.col("mo") == F.col("mo_prev")),
    ).select(
        F.col("mo").alias("mo_from"),
        "mo_to",
        "p_brand",
        F.col("cents").alias("cents_a"),
        "cents_b",
    )
    # rank WITHIN the common brand set: both sides must be
    # permutations of the same set or the closed form is not a
    # correlation at all (rho escaped [-1, 1] on the first cut).
    wa = Window.partitionBy("mo_from", "mo_to").orderBy(
        F.col("cents_a").desc(), "p_brand"
    )
    wb = Window.partitionBy("mo_from", "mo_to").orderBy(
        F.col("cents_b").desc(), "p_brand"
    )
    p = pair.select(
        "mo_from",
        "mo_to",
        (F.row_number().over(wa) - F.row_number().over(wb))
        .cast("decimal(38,0)")
        .alias("d"),
    )
    s = p.groupBy("mo_from", "mo_to").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.expr("d * d")).alias("sd2"),
    )
    return s.filter(F.col("n") >= 2).select(
        "mo_from",
        "mo_to",
        F.col("n").cast("long").alias("n_brands"),
        F.expr(
            "CAST(CASE WHEN n * (n * n - 1) - 6 * sd2 >= 0"
            " THEN ((n * (n * n - 1) - 6 * sd2) * 10000)"
            " div (n * (n * n - 1))"
            " ELSE -(((6 * sd2 - n * (n * n - 1)) * 10000)"
            " div (n * (n * n - 1))) END AS BIGINT)"
        ).alias("spearman_e4"),
    )


# --------------------------------------------------------------------------
# orders_revenue_recognition — straight-line recognition ledger (round 14)
# --------------------------------------------------------------------------


@register(
    "orders_revenue_recognition",
    tags=("b4",),
    oracle="""
        -- Straight-line revenue recognition: each line item's charge
        -- is recognized evenly across the calendar months from order
        -- to ship (inclusive), in EXACT integer cents with the
        -- accountant's remainder rule (every month gets cents // k;
        -- the FINAL month absorbs the remainder, so the ledger sums
        -- to the invoice to the cent by construction). The per-month
        -- recognized ledger is the deferred-revenue waterfall a
        -- finance warehouse reports; exactness is the whole game --
        -- a float split leaks cents and the books don't close.
        WITH li AS (
            SELECT (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS m0,
                   GREATEST(
                     (year(l_shipdate) * 12 + month(l_shipdate) - 1)
                     - (year(o_orderdate) * 12 + month(o_orderdate) - 1),
                     0) AS span,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        x AS (
            SELECT m0 + j AS m, span + 1 AS k, j, cents
            FROM li, unnest(generate_series(0, span)) AS t(j)
        )
        SELECT CAST((m // 12) * 100 + m % 12 + 1 AS BIGINT) AS ym,
               CAST(COUNT(*) AS BIGINT) AS n_slices,
               CAST(SUM(CASE WHEN j < k - 1 THEN cents // k
                             ELSE cents - (k - 1) * (cents // k)
                        END) AS BIGINT) AS recognized_cents
        FROM x
        GROUP BY 1
    """,
)
def orders_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straight-line revenue recognition ledger: every line item's
    extended price is recognized evenly across the calendar months
    from order date to ship date inclusive, in EXACT integer cents
    with the accountant's remainder rule — each month takes
    ``cents div k`` and the final month absorbs the remainder, so the
    recognized ledger reconciles to invoiced revenue to the cent BY
    CONSTRUCTION (a float split leaks cents and the books don't
    close). The deferred-revenue waterfall behind
    `orders_backlog`/`orders_aging_wip`: those measure what is open;
    this states when the revenue hits the books.

    Exactness: month arithmetic is pure integer (y*12+m indexing,
    inverted by div/mod), the split is integer floor division, and
    the ship-before-order guard (GREATEST(span,0)) pins both engines
    to the same one-month collapse — Spark's sequence() would emit a
    DESCENDING range for a negative span where DuckDB's
    generate_series emits empty, so the guard is load-bearing for
    cross-engine agreement, not just hygiene.

    Plan/scale: one orderkey-equi join (both sides shuffle on the
    natural key, AQE-coalesced), then a scan-side sequence explode
    bounded by the order→ship span (≤ 5 months in TPC-H shape — the
    fan-out is a small constant, not data-dependent), then one
    month-cardinality rollup that combines map-side. No windows, no
    collects; at 100 TB the explode factor stays the calendar
    constant."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate) - 1").alias("m0"),
        F.expr(
            "GREATEST((year(l_shipdate) * 12 + month(l_shipdate) - 1)"
            " - (year(o_orderdate) * 12 + month(o_orderdate) - 1), 0)"
        ).alias("span"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    x = j.select(
        "m0",
        (F.col("span") + 1).alias("k"),
        "cents",
        F.explode(F.sequence(F.lit(0), F.col("span"))).alias("jj"),
    )
    return (
        x.select(
            F.expr("CAST((m0 + jj) div 12 * 100 + (m0 + jj) % 12 + 1"
                   " AS BIGINT)").alias("ym"),
            F.expr(
                "CASE WHEN jj < k - 1 THEN cents div k"
                " ELSE cents - (k - 1) * (cents div k) END"
            ).alias("recognized"),
        )
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_slices"),
            F.sum("recognized").cast("long").alias("recognized_cents"),
        )
    )
