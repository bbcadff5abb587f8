"""Composite event analytics: ordered funnels and cohort retention
(SURVEY.md §2.B-ext — capability extensions over the ``events`` table).

The reference has no event-sequence surface at all (its one workload is
k-means over daily vectors, ``hadoop_tutorial/src/Kmeans.java``); these
add the two product-analytics staples every event warehouse answers,
expressed as plain DataFrame aggregations so Catalyst plans them.

Scale notes (100 TB):
  * ``events_funnel`` — three conditional hash-aggs keyed on user_id
    with two user-keyed joins between them: every shuffle shares the
    SAME key, so AQE reuses the exchange layout, and each agg collapses
    map-side to one row per user. No window over the raw event stream,
    no per-user event sorting — first-timestamp semantics come from
    ``min`` with a predicate, which is partial-aggregable.
  * ``events_retention`` — per-user first-activity cohort assignment is
    one min-agg; per-(user, week) activity is a distinct-agg; both
    shuffle only user-keyed partials. The cohort×offset matrix at the
    end is tiny (weeks² rows).

Timestamps are compared as epoch microseconds; week buckets use
``date_trunc('week', …)`` (ISO Monday) which Spark and DuckDB agree on,
and week offsets are exact integer arithmetic on aligned boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.materialize import range_pid_frozen
from nchu_bigdata_spark.registry import register

_WEEK_US = 7 * 86400 * 1_000_000
_CONV_WINDOW_US = 24 * 3600 * 1_000_000  # funnel conversion window
# 1970-01-01 was a Thursday; the first Monday is 1970-01-05 (day 4).
# Week truncation is done in pure epoch arithmetic aligned to this
# offset so both engines agree regardless of the host/session TimeZone
# (DuckDB's date_trunc('week', TIMESTAMPTZ) truncates in session TZ).
_EPOCH_MONDAY_US = 4 * 86400 * 1_000_000


@register(
    "events_funnel",
    tags=("bext",),
    oracle=f"""
        WITH v AS (
            SELECT user_id, MIN(ts) AS v_ts
            FROM events WHERE event_type = 'view'
            GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS c_ts
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > v.v_ts
              AND epoch_us(e.ts) <= epoch_us(v.v_ts) + {_CONV_WINDOW_US}
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS p_ts
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
              AND epoch_us(e.ts) <= epoch_us(c.c_ts) + {_CONV_WINDOW_US}
            GROUP BY e.user_id
        )
        SELECT stage, n_users FROM (
            SELECT 1 AS ord, 'view' AS stage,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_users
            UNION ALL
            SELECT 2, 'click_after_view',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
            UNION ALL
            SELECT 3, 'purchase_after_click',
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
        ) ORDER BY ord
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view → click → purchase) with a 24-hour
    conversion window: a user counts for a stage only if the stage's
    FIRST qualifying event happens strictly after — and within the
    window of — the previous stage's first qualifying event. Ordering
    and recency both matter (plain existence would be ``join_semi``);
    at sf0.01 the funnel reads 150 → 60 → 25 users. Window arithmetic
    is integer epoch-microseconds, identical on both engines.

    Three user-keyed conditional min-aggs chained by joins; see module
    docstring for the scale shape."""
    ev = table(spark, sf_dir, "events")
    in_window = lambda prev: (F.col("ts") > F.col(prev)) & (  # noqa: E731
        F.unix_micros("ts") <= F.unix_micros(prev) + _CONV_WINDOW_US
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(in_window("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(in_window("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    stages = [
        (1, "view", v),
        (2, "click_after_view", c),
        (3, "purchase_after_click", p),
    ]
    out = None
    for ordn, name, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(ordn).alias("ord"), F.lit(name).alias("stage"), "n_users"
        )
        out = row if out is None else out.union(row)
    return out.orderBy("ord").select("stage", "n_users")


@register(
    "events_retention",
    tags=("bext",),
    oracle=f"""
        WITH first AS (
            SELECT user_id,
                   (epoch_us(MIN(ts)) - {_EPOCH_MONDAY_US}) // {_WEEK_US}
                       * {_WEEK_US} + {_EPOCH_MONDAY_US} AS cohort_week_us
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   (epoch_us(ts) - {_EPOCH_MONDAY_US}) // {_WEEK_US}
                       * {_WEEK_US} + {_EPOCH_MONDAY_US} AS week_us
            FROM events
        )
        SELECT f.cohort_week_us AS cohort_week_us,
               CAST((a.week_us - f.cohort_week_us)
                    // {_WEEK_US} AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM first f JOIN activity a ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the ISO week of their
    first event (cohort), counted in every week they were active,
    keyed by offset from their cohort week — the warehouse query behind
    every retention curve.

    One min-agg (cohort), one distinct-agg (activity weeks), one
    user-keyed join, and a tiny final agg over (cohort, offset); week
    truncation AND offsets are exact integer math on Monday-aligned
    microsecond epochs (no engine date_trunc), so both engines agree
    bit-for-bit in ANY session TimeZone."""
    ev = table(spark, sf_dir, "events")

    def trunc_week_us(col):
        # floor-to-Monday in pure integer epoch space: long % long is
        # exact in Spark, so `shifted - shifted % week` is the floor
        # multiple with NO double-precision round-trip (a `/` quotient
        # would pass through DOUBLE and can misround one microsecond
        # before a boundary once quotients grow large). Matches the
        # oracle's integer `//`. (The week_offset division below stays
        # a plain `/`: its numerator is an exact multiple of the week,
        # and exact-multiple ÷ divisor is exact in IEEE doubles.)
        shifted = F.unix_micros(col) - F.lit(_EPOCH_MONDAY_US)
        return shifted - (shifted % F.lit(_WEEK_US)) + F.lit(_EPOCH_MONDAY_US)

    first = ev.groupBy("user_id").agg(
        trunc_week_us(F.min("ts")).alias("cohort_week_us")
    )
    activity = ev.select(
        "user_id", trunc_week_us(F.col("ts")).alias("week_us")
    ).distinct()
    return (
        first.join(activity, "user_id")
        .groupBy(
            "cohort_week_us",
            (
                (F.col("week_us") - F.col("cohort_week_us"))
                / F.lit(_WEEK_US)
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select("cohort_week_us", "week_offset", "n_users")
    )


# --------------------------------------------------------------------------
# events_anomaly — per-key z-score outlier detection (exact integer test)
# --------------------------------------------------------------------------

# Minimum per-key sample size before a z-score is meaningful; keys with
# fewer observations are skipped (their sample std is noise).
_ANOM_MIN_N = 10
_ANOM_Z = 3  # threshold in standard deviations (integer, used squared)


@register(
    "events_anomaly",
    tags=("b12",),
    oracle=f"""
        WITH c AS (
            SELECT user_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        stats AS (
            SELECT user_id, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(cents AS HUGEINT)) AS s1,
                   SUM(CAST(cents AS HUGEINT) * cents) AS s2
            FROM c GROUP BY user_id, event_type
        )
        SELECT c.user_id, c.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_anomalies,
               CAST(MAX(ABS(s.n * c.cents - s.s1)) AS BIGINT) AS max_dev_scaled
        FROM c
        JOIN stats s ON s.user_id = c.user_id AND s.event_type = c.event_type
        WHERE s.n >= {_ANOM_MIN_N}
          AND (s.n * c.cents - s.s1) * (s.n * c.cents - s.s1) * (s.n - 1)
              > {_ANOM_Z * _ANOM_Z} * s.n * (s.n * s.s2 - s.s1 * s.s1)
        GROUP BY c.user_id, c.event_type
    """,
)
def events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) z-score outlier detection: flag events
    more than 3 sample standard deviations from their key's mean, and
    report anomaly count + the worst scaled deviation per key — the
    metrics-monitoring staple (fraud spikes, sensor faults, bot bursts).

    The z-test runs in EXACT integer arithmetic (review finding: a
    float z rounded to any grid can still straddle the threshold when
    each engine computes mu/sd with its own summation order). Values
    have 2 decimals, so cents are exact int64; the test
    ``|x − mu| > z·sd`` is squared and cleared of denominators into
        (n·c − S1)² · (n−1)  >  z² · n · (n·S2 − S1²)
    over integer sums S1=Σc, S2=Σc² — 128-bit-safe as DECIMAL(38,0) on
    Spark and HUGEINT on DuckDB, bit-identical on both, no float
    anywhere. ``max_dev_scaled`` = max |n·c − S1| (= n·|x−mu| in
    cents) is likewise exact; a float z is display-only derivable
    downstream.

    Plan: per-key integer sums are ONE hash-agg (map-side combinable);
    the tiny stats table joins back on the SAME key — the event stream
    shuffles once total."""
    dec = "decimal(38,0)"
    ev = table(spark, sf_dir, "events")
    c = ev.select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # Sums in DECIMAL(38,0) from the start (review finding: int64
    # Σcents² wraps silently under ANSI-off once |value| ≈ $10M with
    # 10+ rows per key; DuckDB promotes to HUGEINT, so wrap there
    # would DIVERGE, not error-match). The zero-variance guard the
    # first version carried was redundant — constant values give
    # dev = 0, so lhs > rhs already fails.
    stats = c.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("s1"),
        F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("s2"),
    )
    dev = F.col("n").cast(dec) * F.col("cents") - F.col("s1")
    lhs = dev * dev * (F.col("n") - 1).cast(dec)
    rhs = (
        F.lit(_ANOM_Z * _ANOM_Z).cast(dec)
        * F.col("n").cast(dec)
        * (F.col("n").cast(dec) * F.col("s2") - F.col("s1") * F.col("s1"))
    )
    return (
        c.join(stats, ["user_id", "event_type"])
        .filter((F.col("n") >= _ANOM_MIN_N) & (lhs > rhs))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_anomalies"),
            F.max(F.abs(dev)).cast("long").alias("max_dev_scaled"),
        )
    )


# --------------------------------------------------------------------------
# events_markov — event-type transition matrix (first-order Markov)
# --------------------------------------------------------------------------


@register(
    "events_markov",
    tags=("b12",),
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev
            FROM events
        ),
        cnt AS (
            SELECT prev AS from_type, event_type AS to_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM seq WHERE prev IS NOT NULL
            GROUP BY prev, event_type
        ),
        tot AS (
            SELECT from_type, CAST(SUM(n) AS BIGINT) AS t
            FROM cnt GROUP BY from_type
        )
        SELECT c.from_type, c.to_type, c.n,
               CAST(c.n * 10000 // t.t AS INT) AS p_bp
        FROM cnt c JOIN tot t USING (from_type)
    """,
)
def events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: counts and row-normalized probabilities of event_type A
    being followed by event_type B — the sequence-analytics staple
    behind next-action prediction, funnel leak diagnosis, and bot
    detection (bots have unnaturally peaked transition rows).

    Determinism: transition order is (ts, event_id) — total, no tie
    ambiguity; probabilities are emitted as integer BASIS POINTS
    (n·10⁴ div total) per the engine's integer-math policy, never a
    rounded float division.

    Plan: ONE user-keyed window (lag over each user's stream — state
    is per-user, sort is per-user, never global), then the transition
    counts collapse in a types²-sized hash agg; the row-total join is
    a types-sized broadcast. The raw stream shuffles once."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        cnt.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("CAST(n * 10000 DIV t AS INT)").alias("p_bp"),
        )
    )


# --------------------------------------------------------------------------
# events_rfm — mean-split RFM customer segmentation (round 7)
# --------------------------------------------------------------------------


@register(
    "events_rfm",
    tags=("b12",),
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MAX(epoch_us(ts)) AS last_ts_us,
                   CAST(COUNT(*) AS BIGINT) AS freq,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY user_id
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                   SUM(CAST(last_ts_us AS HUGEINT)) AS s_ts,
                   SUM(CAST(freq AS HUGEINT)) AS s_f,
                   SUM(CAST(cents AS HUGEINT)) AS s_c
            FROM per_user
        )
        -- LHS products in HUGEINT (matching the Spark side's
        -- decimal(38,0)): epoch-us x user-count overflows int64 past
        -- ~5k users, and DuckDB's checked BIGINT multiply would error
        SELECT u.user_id,
               CAST(u.last_ts_us AS BIGINT) AS last_ts_us,
               u.freq, u.cents,
               CAST(CASE WHEN CAST(u.last_ts_us AS HUGEINT) * t.n_users
                              >= t.s_ts
                         THEN 1 ELSE 0 END AS INT) AS r_flag,
               CAST(CASE WHEN CAST(u.freq AS HUGEINT) * t.n_users >= t.s_f
                         THEN 1 ELSE 0 END AS INT) AS f_flag,
               CAST(CASE WHEN CAST(u.cents AS HUGEINT) * t.n_users >= t.s_c
                         THEN 1 ELSE 0 END AS INT) AS m_flag,
               CAST(CASE WHEN CAST(u.last_ts_us AS HUGEINT) * t.n_users
                              >= t.s_ts
                         THEN 4 ELSE 0 END
                  + CASE WHEN CAST(u.freq AS HUGEINT) * t.n_users >= t.s_f
                         THEN 2 ELSE 0 END
                  + CASE WHEN CAST(u.cents AS HUGEINT) * t.n_users >= t.s_c
                         THEN 1 ELSE 0 END AS INT) AS segment
        FROM per_user u, tot t
    """,
)
def events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary), the
    classic marketing-analytics composite, in its MEAN-SPLIT form: each
    user scores above/below the population mean on each axis, yielding
    8 segments (champions = 7 down to dormant = 0).

    Mean-split rather than quartile ntile is a deliberate SCALE choice:
    ntile over all users is a single-partition global sort (the
    accidental-serialization trap ``sort_zorder`` documents), while
    mean cutoffs are one extra 1-row aggregate and a broadcast — the
    whole plan is two map-side-combining hash aggs and a per-row
    comparison, embarrassingly parallel at any user cardinality.
    Comparisons are cross-multiplied integers (``metric·N >= Σmetric``)
    — zero division, zero floats, bit-identical across engines
    (HUGEINT/decimal sums so Σts_us·N can't overflow int64).

    Recency uses last-activity epoch-us directly (bigger = more
    recent = better), so all three axes read "1 is good"."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("last_ts_us").cast("decimal(38,0)")).alias("s_ts"),
        F.sum(F.col("freq").cast("decimal(38,0)")).alias("s_f"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_c"),
    )
    j = per_user.crossJoin(F.broadcast(tot))
    r = (F.col("last_ts_us").cast("decimal(38,0)") * F.col("n_users") >= F.col("s_ts")).cast("int")
    f = (F.col("freq").cast("decimal(38,0)") * F.col("n_users") >= F.col("s_f")).cast("int")
    m = (F.col("cents").cast("decimal(38,0)") * F.col("n_users") >= F.col("s_c")).cast("int")
    return j.select(
        "user_id",
        "last_ts_us",
        "freq",
        "cents",
        r.alias("r_flag"),
        f.alias("f_flag"),
        m.alias("m_flag"),
        (r * 4 + f * 2 + m).cast("int").alias("segment"),
    )


# --------------------------------------------------------------------------
# events_ab_test — A/B variant comparison with exact-integer lift (round 8)
# --------------------------------------------------------------------------


@register(
    "events_ab_test",
    tags=("b11",),
    oracle="""
        -- variant assignment is deterministic (user_id % 2): the
        -- experiment-analysis readout every product warehouse runs.
        -- Money in exact cents; lift as integer basis points of B over
        -- A (floor division) — no float share anywhere.
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN user_id % 2 = 0
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_a,
               CAST(SUM(CASE WHEN user_id % 2 = 1
                             THEN CAST(ROUND(value * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS cents_b,
               CAST(CASE WHEN SUM(CASE WHEN user_id % 2 = 0
                                  THEN CAST(ROUND(value * 100) AS BIGINT)
                                  ELSE 0 END) = 0 THEN NULL
                    ELSE CAST(SUM(CASE WHEN user_id % 2 = 1
                                  THEN CAST(ROUND(value * 100) AS BIGINT)
                                  ELSE 0 END) AS HUGEINT) * 10000
                         // SUM(CASE WHEN user_id % 2 = 0
                                THEN CAST(ROUND(value * 100) AS BIGINT)
                                ELSE 0 END)
                    END AS BIGINT) AS lift_bp
        FROM events
        GROUP BY event_type
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over the event stream: per event type,
    event counts and value totals for the two deterministic variants
    (``user_id % 2`` — the hash-bucket assignment real experiment
    frameworks use, rerun-stable), plus B-over-A lift in integer basis
    points. The statistical-significance companion is
    ``events_anomaly``'s exact integer z-test; this is the effect-size
    readout.

    Determinism: value cents are exact ints, conditional sums ride ONE
    hash agg, the lift is a single integer floor-division routed
    through decimal(38,0)/HUGEINT (the ADVICE r7 overflow policy —
    cents × 10⁴ wraps int64 past ~9e14 cents), NULL when variant A has
    no revenue.

    Plan/scale: one map-side-combining hash agg over event_type
    cardinality — one scan, one tiny shuffle; variant assignment is a
    pure projection, so the stream is never duplicated per variant."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    is_a = F.col("user_id") % 2 == 0
    agg = ev.groupBy("event_type").agg(
        F.sum(F.when(is_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(is_a, cents).otherwise(0)).cast("long").alias("cents_a"),
        F.sum(F.when(~is_a, cents).otherwise(0)).cast("long").alias("cents_b"),
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        "cents_a",
        "cents_b",
        F.when(F.col("cents_a") == 0, F.lit(None))
        .otherwise(
            F.expr("CAST(cents_b AS decimal(38,0)) * 10000 div cents_a")
        )
        .cast("long")
        .alias("lift_bp"),
    )


# --------------------------------------------------------------------------
# events_active_users — DAU + rolling 7-day distinct actives (round 8)
# --------------------------------------------------------------------------


@register(
    "events_active_users",
    tags=("b11",),
    oracle="""
        -- rolling distinct is the product-analytics staple SQL windows
        -- can't express (COUNT(DISTINCT) OVER RANGE unsupported); the
        -- exact rewrite: dedup to user-days, CONTRIBUTE each user-day
        -- to the 7 day-windows it falls in, count distinct per window.
        -- Day arithmetic in integer epoch-MICROS (TZ-invariant; never
        -- float epoch: DuckDB's // on DOUBLE does not floor, so
        -- CAST(epoch(ts)//86400 ...) rounds late-evening rows into
        -- the next day).
        WITH ud AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events
        ),
        daily AS (
            SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d
        ),
        contrib AS (
            SELECT user_id, d + i AS wd
            FROM ud, unnest(range(0, 7)) AS r(i)
        ),
        rolling AS (
            SELECT wd AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau7
            FROM contrib GROUP BY wd
        )
        SELECT daily.d AS epoch_day, daily.dau, rolling.wau7
        FROM daily JOIN rolling ON rolling.d = daily.d
    """,
)
def events_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Active-user curves: exact DAU and rolling 7-day distinct actives
    (WAU) per day — THE product-analytics daily, and a window SQL
    cannot express (`COUNT(DISTINCT) OVER RANGE` is unsupported
    everywhere; re-aggregating daily distincts undercounts users
    active on several days).

    Exact rewrite that stays linear: dedup the stream to (user, day)
    rows once, then each user-day CONTRIBUTES to the 7 trailing
    day-windows containing it (a constant 7× explode of the
    user-day table, NOT of the raw stream), and one hash agg counts
    distinct users per window day. Day arithmetic is integer
    epoch-days on the UTC session clock — TZ-invariant, no date
    formatting to straddle.

    Output keeps only days with actual activity (join with daily),
    matching the dashboard convention.

    Plan/scale: raw stream → one (user, day) dedup shuffle (map-side
    combined); the 7× explode runs post-dedup over the much smaller
    user-day table; two distinct-aggs hash-partition by day. The
    rolling distinct never holds per-window user sets in one task
    beyond that day's actives — same bound a per-day GROUP BY has.
    The sketch alternative at extreme scale is `hll_union_agg` over
    daily sketches (`agg_sketch_merge`'s mergeable pattern) — this is
    the exact calibration side."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).distinct()
    daily = ud.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    contrib = ud.select(
        "user_id", F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("wd")
    )
    rolling = contrib.groupBy(F.col("wd").alias("d")).agg(
        F.countDistinct("user_id").alias("wau7")
    )
    return (
        daily.join(rolling, "d")
        .select(F.col("d").alias("epoch_day"), "dau", "wau7")
    )


# --------------------------------------------------------------------------
# events_gap_detect — per-user activity-gap profile (round 8)
# --------------------------------------------------------------------------


@register(
    "events_gap_detect",
    tags=("b11",),
    oracle="""
        -- classic sequence-gap detection over per-user active DAYS:
        -- span vs distinct actives gives missing days; the largest
        -- single gap comes from lag over the per-user day sequence.
        -- integer epoch-micros day bucketing (the active_users policy).
        WITH ud AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d
            FROM events
        ),
        g AS (
            SELECT user_id, d,
                   d - lag(d) OVER (PARTITION BY user_id ORDER BY d) - 1
                       AS gap
            FROM ud
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_days_active,
               CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS n_days_span,
               CAST(MAX(d) - MIN(d) + 1 - COUNT(*) AS BIGINT)
                   AS n_days_missing,
               CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_days
        FROM g
        GROUP BY user_id
    """,
)
def events_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-GAP profile: active days, calendar span,
    missing days inside the span, and the largest single gap — the
    sequence-completeness / data-quality diagnostic (sensor dropouts,
    churn-risk dormancy windows, missing ingestion days) that
    complements ``events_active_users``'s corpus-level curves with a
    per-entity view.

    Day arithmetic is integer epoch-micros division (the
    `events_active_users` policy — float epoch banned); the gap column
    is a single lag over the per-user day sequence, so both engines
    compute identical integers end-to-end.

    Plan/scale: one (user, day) dedup shuffle (map-side combined),
    one user-keyed window sort over DAY-cardinality rows (not raw
    events), one hash agg on the same key — the window and the agg
    share the user partitioning, so AQE plans a single effective
    exchange for both."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = ud.withColumn("gap", F.col("d") - F.lag("d").over(w) - 1)
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days_active"),
        (F.max("d") - F.min("d") + 1).cast("long").alias("n_days_span"),
        (F.max("d") - F.min("d") + 1 - F.count(F.lit(1)))
        .cast("long")
        .alias("n_days_missing"),
        F.coalesce(F.max("gap"), F.lit(0)).cast("long").alias("max_gap_days"),
    )


# --------------------------------------------------------------------------
# events_inter_arrival — inter-event-time profile (round 8)
# --------------------------------------------------------------------------


@register(
    "events_inter_arrival",
    tags=("b11",),
    oracle="""
        -- burstiness profile: gaps between consecutive SAME-(user,
        -- type) events, summarized per type with exact integer order
        -- statistics: med2 = sum of the two middle gaps (2x median,
        -- no .5 float - the win_rolling_median policy) and p90 as the
        -- ceil-rank order statistic. All micros integers end-to-end.
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        ),
        r AS (
            SELECT event_type, gap_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY gap_us
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM g WHERE gap_us IS NOT NULL
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
               CAST(SUM(CASE WHEN rk = (n + 1) // 2
                              OR rk = n // 2 + 1
                             THEN gap_us ELSE 0 END)
                    * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                           THEN 2 ELSE 1 END
                    AS BIGINT) AS med2_gap_us,
               CAST(MAX(CASE WHEN rk = (9 * n + 9) // 10
                             THEN gap_us END) AS BIGINT) AS p90_gap_us
        FROM r
        GROUP BY event_type
    """,
)
def events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time profile per event type: exact min / median /
    p90 / max of the gaps between consecutive same-(user, type)
    events — the burstiness diagnostic behind rate-limit tuning, bot
    detection (impossibly small p50), and session-gap calibration
    (``stream_session``'s 30-minute gap should sit far above p90).

    Exactness: gaps are integer MICROSECONDS from one lag window;
    median is emitted as ``med2`` (sum of the two middle order
    statistics — 2× median, never a .5 float; `win_rolling_median`'s
    policy) and p90 as the ceil-rank single order statistic — no
    interpolation arithmetic at all, both engines pick identical
    integers. (The odd-n case doubles the single middle gap so med2
    is always 2× the median.)

    Plan/scale: one (user, type)-keyed lag window over the raw stream
    (bounded per-key groups), then the `agg_percentile_exact` shape:
    type-partitioned window ranks — each type's gap population sorts
    in parallel after ONE hash exchange, never a global sort — and a
    final ≤types-row hash agg."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    wl = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wl)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us")
    wn = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med_pick = F.when(
        (F.col("rk") == F.expr("(n + 1) div 2"))
        | (F.col("rk") == F.expr("n div 2 + 1")),
        F.col("gap_us"),
    ).otherwise(0)
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        (
            F.sum(med_pick)
            * F.expr(
                "CASE WHEN (max(n) + 1) div 2 = max(n) div 2 + 1"
                " THEN 2 ELSE 1 END"
            )
        )
        .cast("long")
        .alias("med2_gap_us"),
        F.max(
            F.when(
                F.col("rk") == F.expr("(9 * n + 9) div 10"),
                F.col("gap_us"),
            )
        )
        .cast("long")
        .alias("p90_gap_us"),
    )


# --------------------------------------------------------------------------
# events_seasonality — day-of-week × hour-of-day activity matrix (round 8)
# --------------------------------------------------------------------------


@register(
    "events_seasonality",
    tags=("b11",),
    oracle="""
        -- seasonality heatmap: per-type activity by (day-of-week,
        -- hour-of-day) with each cell's share of the type's total in
        -- exact integer basis points. Calendar buckets are pure epoch
        -- integer arithmetic (day 0 = 1970-01-01 = Thursday; dow 0 =
        -- Sunday), immune to both engines' TZ/locale week rules.
        WITH c AS (
            SELECT event_type,
                   CAST((epoch_us(ts) // 86400000000 + 4) % 7
                        AS BIGINT) AS dow,
                   CAST((epoch_us(ts) % 86400000000) // 3600000000
                        AS BIGINT) AS hod,
                   COUNT(*) AS n
            FROM events
            GROUP BY 1, 2, 3
        )
        SELECT event_type, dow, hod,
               CAST(n AS BIGINT) AS n_events,
               CAST(n * 10000 //
                    SUM(n) OVER (PARTITION BY event_type)
                    AS BIGINT) AS share_bp
        FROM c
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: the day-of-week × hour-of-day activity
    matrix per event type, each cell carrying its share of the type's
    traffic in exact integer basis points — capacity planning, bot
    cadence detection, and send-time optimization all read this
    heatmap.

    Calendar bucketing is integer epoch arithmetic end-to-end (the
    `events_gap_detect` day policy, extended with the epoch-Thursday
    dow offset): no engine week-start/locale/TZ rule can diverge, and
    the share is the floor cross-multiply `n·10⁴ div total` — both
    engines integer-divide, no float share to straddle.

    Plan/scale: one map-side-combined hash agg collapses the stream to
    ≤ types·7·24 cells; the share window runs over that literal-sized
    cell table, not raw events. One real shuffle at any scale."""
    ev = table(spark, sf_dir, "events")
    c = (
        ev.select(
            "event_type",
            F.expr(
                "(unix_micros(ts) div 86400000000 + 4) % 7"
            ).alias("dow"),
            F.expr(
                "(unix_micros(ts) % 86400000000) div 3600000000"
            ).alias("hod"),
        )
        .groupBy("event_type", "dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return c.select(
        "event_type",
        F.col("dow").cast("long"),
        F.col("hod").cast("long"),
        F.col("n").cast("long").alias("n_events"),
        F.expr("n * 10000 div sum(n) over (partition by event_type)")
        .cast("long")
        .alias("share_bp"),
    )


# --------------------------------------------------------------------------
# events_attribution — last-touch conversion attribution (round 8)
# --------------------------------------------------------------------------

_ATTR_WINDOW_US = 24 * 3600 * 1_000_000  # last-touch lookback


@register(
    "events_attribution",
    tags=("b11",),
    oracle="""
        -- last-touch attribution: each purchase credits the most
        -- recent PRECEDING non-purchase event by the same user within
        -- a 24h lookback, else the 'direct' channel. The two
        -- IGNORE-NULLS last_value calls share one CASE condition, so
        -- they read the same touch row; (ts, event_id) ordering makes
        -- equal-timestamp sequences deterministic.
        WITH t AS (
            SELECT user_id, event_type, value,
                   epoch_us(ts) AS us,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN epoch_us(ts) END IGNORE NULLS)
                       OVER w AS touch_us,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER w AS touch_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING)
        )
        SELECT CASE WHEN touch_us IS NULL
                      OR us - touch_us > 86400000000
                    THEN 'direct' ELSE touch_type END AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM t
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH conversion attribution — the marketing-analytics
    staple: every purchase credits the user's most recent preceding
    non-purchase event inside a 24h lookback, falling back to the
    'direct' channel; rollup = conversions + exact-cents revenue per
    channel.

    The touch row is recovered with two IGNORE-NULLS ``last`` calls
    over ONE shared predicate and frame (rows unbounded-preceding →
    1-preceding), so timestamp and type always come from the same
    event; (ts, event_id) ordering pins equal-timestamp runs, and the
    lookback compares integer epoch micros. Revenue sums
    round-to-cents BIGINTs — the events_rfm money policy — so no
    float crosses the engines.

    Plan/scale: one user-keyed window sort (the inherent cost of
    sequence attribution) feeding a tiny channel-cardinality hash agg;
    no self-join of the event stream against itself (the naive
    formulation is events×events per user). At 100 TB the window
    shuffles each user's events once — same key a sessionizer already
    uses, so AQE shares the exchange with upstream event pipelines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    t = ev.select(
        "event_type",
        "value",
        F.expr("unix_micros(ts)").alias("us"),
        F.last(
            F.when(non_purchase, F.expr("unix_micros(ts)")), ignorenulls=True
        )
        .over(w)
        .alias("touch_us"),
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return (
        t.where(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("touch_us").isNull()
                | (F.col("us") - F.col("touch_us") > _ATTR_WINDOW_US),
                F.lit("direct"),
            )
            .otherwise(F.col("touch_type"))
            .alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("revenue_cents"),
        )
    )


# --------------------------------------------------------------------------
# basket_rules — size-2 association rules (support/confidence/lift) (rd 8)
# --------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 3  # orders containing the pair


@register(
    "basket_rules",
    tags=("b11",),
    oracle=f"""
        -- market-basket association rules for item PAIRS: support,
        -- both directed confidences, and lift — all as exact integer
        -- ratios. The lift cross-multiply routes through HUGEINT /
        -- decimal(38,0) (pair·N·1000 can pass int64 at corpus scale —
        -- the sample_importance ADVICE closure, applied up front).
        WITH op AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
        item AS (
            SELECT l_partkey AS p, COUNT(*) AS c FROM op GROUP BY 1
        ),
        pair AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS c
            FROM op a
            JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
        )
        SELECT pair.u, pair.v,
               CAST(pair.c AS BIGINT) AS n_pair,
               CAST(iu.c AS BIGINT) AS n_u,
               CAST(iv.c AS BIGINT) AS n_v,
               CAST(pair.c * 10000 // iu.c AS BIGINT) AS conf_uv_bp,
               CAST(pair.c * 10000 // iv.c AS BIGINT) AS conf_vu_bp,
               CAST(CAST(pair.c AS HUGEINT) * tot.n * 1000
                    // (CAST(iu.c AS HUGEINT) * iv.c)
                    AS BIGINT) AS lift_milli
        FROM pair, tot
        JOIN item iu ON iu.p = pair.u
        JOIN item iv ON iv.p = pair.v
    """,
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-2 MARKET-BASKET association rules — support, both directed
    confidences, and lift per co-purchased part pair above a minimum
    support — the classic frequent-itemset surface (recommenders,
    cross-sell, assortment planning) that the co-purchase GRAPH ops
    read structurally and this op reads statistically.

    All three statistics are exact integer ratios: confidences are
    int64 floor cross-multiplies (pair·10⁴ div item ≤ N·10⁴ — safe to
    ~9e14 orders), and lift's pair·N·1000 numerator — which CAN pass
    int64 at corpus scale — goes through decimal(38,0) `div` on the
    engine and HUGEINT `//` on the oracle (both exact integer floor
    division; the sample_importance overflow closure applied at birth
    rather than in review).

    Plan/scale: (order, part) dedup (one shuffle, map-side combined);
    per-order part sets expand to C(basket,2) pairs inside codegen
    (the _copurchase_edges derivation, but COUNTING per pair instead
    of distinct edges); the min-support HAVING prunes the long tail
    BEFORE the two item-count joins, so the rule table joined is
    frequent-pairs-only. Baskets are bounded (≤7 lines here; a retail
    cap would slice the set) — fan-out is C(basket,2), never N²."""
    li = table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    tot = op.agg(F.countDistinct("l_orderkey").alias("n"))
    item = op.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("c")
    )
    sets = op.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pair = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(least(x, y) AS u, greatest(x, y) AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= _BASKET_MIN_SUPPORT)
    )
    iu = item.select(F.col("p").alias("pu"), F.col("c").alias("cu"))
    iv = item.select(F.col("p").alias("pv"), F.col("c").alias("cv"))
    j = (
        pair.join(iu, pair.u == iu.pu)
        .join(iv, pair.v == iv.pv)
        .crossJoin(F.broadcast(tot))
    )
    dec = "decimal(38,0)"
    return j.select(
        "u",
        "v",
        F.col("c").cast("long").alias("n_pair"),
        F.col("cu").cast("long").alias("n_u"),
        F.col("cv").cast("long").alias("n_v"),
        F.expr("c * 10000 div cu").cast("long").alias("conf_uv_bp"),
        F.expr("c * 10000 div cv").cast("long").alias("conf_vu_bp"),
        F.expr(
            f"(CAST(c AS {dec}) * CAST(n AS {dec}) * CAST(1000 AS {dec}))"
            f" div (CAST(cu AS {dec}) * CAST(cv AS {dec}))"
        )
        .cast("long")
        .alias("lift_milli"),
    )


# --------------------------------------------------------------------------
# events_overlap_matrix — same-day cross-feature audience overlap (round 8)
# --------------------------------------------------------------------------


@register(
    "events_overlap_matrix",
    tags=("b11",),
    oracle="""
        -- audience-overlap matrix: for every unordered pair of event
        -- types, how many (user, day) cells saw BOTH — plus each
        -- type's own cell count and the exact Jaccard in basis
        -- points. The oracle states the naive self-join; the engine
        -- never executes that shape (set-explode instead).
        WITH c AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS d,
                   event_type
            FROM events
        ),
        pairs AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*) AS n_both
            FROM c a
            JOIN c b
              ON a.user_id = b.user_id AND a.d = b.d
             AND a.event_type < b.event_type
            GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type, COUNT(*) AS n FROM c GROUP BY 1
        )
        SELECT p.type_a, p.type_b,
               CAST(p.n_both AS BIGINT) AS n_both,
               CAST(ma.n AS BIGINT) AS n_a,
               CAST(mb.n AS BIGINT) AS n_b,
               CAST(p.n_both * 10000 // (ma.n + mb.n - p.n_both)
                    AS BIGINT) AS jaccard_bp
        FROM pairs p
        JOIN m ma ON ma.event_type = p.type_a
        JOIN m mb ON mb.event_type = p.type_b
    """,
)
def events_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-feature audience overlap: for every pair of event types,
    the number of (user, day) activity cells where BOTH occurred, each
    type's own cell count, and the exact Jaccard similarity in basis
    points — the feature-correlation / cross-sell matrix product teams
    read before bundling features.

    The oracle is the naive cell×cell self-join; the engine instead
    reuses the co-purchase edge-derivation shape (`graph.py`): one
    distinct collapses events to (user, day, type) cells, per-cell
    sorted type-sets build in a map-side-combined ``collect_set`` agg,
    and all C(k,2) pairs generate inside codegen via nested
    ``transform`` over the ≤|types| array — per-cell fanout is bounded
    by the type-vocabulary, never by corpus size. Pair counts and the
    tiny per-type marginals meet in a broadcast join; every division
    is a floor cross-multiply.

    Plan/scale: two map-side-combined hash aggs (cell distinct, pair
    count) + one broadcast join — no self-join of the cell table, no
    window, nothing keyed wider than (user, day)."""
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "user_id",
            F.expr("unix_micros(ts) div 86400000000").alias("d"),
            "event_type",
        )
        .distinct()
    )
    sets = cells.groupBy("user_id", "d").agg(
        F.array_sort(F.collect_set("event_type")).alias("ts")
    )
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ts, (a, i) ->"
                    " transform(slice(ts, i + 2, size(ts)), b ->"
                    " struct(a AS type_a, b AS type_b))))"
                )
            ).alias("pr")
        )
        .select("pr.type_a", "pr.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    m = cells.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ma = m.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    mb = m.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_both").cast("long"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.expr("n_both * 10000 div (n_a + n_b - n_both)")
            .cast("long")
            .alias("jaccard_bp"),
        )
    )


# --------------------------------------------------------------------------
# events_forecast_snaive — seasonal-naive backtest (round 8)
# --------------------------------------------------------------------------

_SN_STEP_US = 3_600_000_000  # hourly slots
_SN_LAG = 168  # one week of hourly slots


@register(
    "events_forecast_snaive",
    tags=("b11",),
    oracle=f"""
        -- seasonal-naive backtest: forecast every hourly slot with the
        -- value from the same slot one week earlier, score the slots
        -- where both sides were observed — exact integer MAE and bias
        -- per series. The baseline every real forecasting model must
        -- beat before it earns cluster time.
        WITH c AS (
            SELECT event_type,
                   epoch_us(ts) // {_SN_STEP_US} AS b,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
            FROM events GROUP BY 1, 2
        )
        SELECT a.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_scored,
               CAST(SUM(ABS(a.cents - f.cents)) AS BIGINT)
                   AS sum_abs_err_cents,
               CAST(SUM(a.cents - f.cents) AS BIGINT) AS bias_cents,
               -- HUGEINT leg: the abs-error sum scales with corpus
               -- revenue, so *10^3 would overflow checked BIGINT at
               -- 100 TB while Spark's int64 wraps (events_rfm policy)
               CAST(CAST(SUM(ABS(a.cents - f.cents)) AS HUGEINT)
                    * 1000 // COUNT(*) AS BIGINT) AS mae_millicents
        FROM c a
        JOIN c f
          ON f.event_type = a.event_type AND f.b = a.b - {_SN_LAG}
        GROUP BY a.event_type
    """,
)
def events_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each hourly slot's
    revenue with the SAME slot one week earlier and score the exact
    integer error per series (MAE in millicents + signed bias). This
    is the canonical forecasting baseline — a model that can't beat
    "last week, same hour" hasn't learned the seasonality
    `events_seasonality` displays — and the backtest join is the same
    shape any horizon would use.

    Only slots observed on BOTH sides score (no imputation inside a
    baseline); everything is integer cents, the MAE division is a
    floor cross-multiply.

    Plan/scale: events collapse to calendar-bounded (series, slot)
    cells in one map-side-combined agg; the week-shifted self-join is
    EQUI on (series, slot-168) — a hash join over cell-cardinality
    rows (AQE picks broadcast when the cell table is small); the
    final rollup is series-sized. No window, no spine, no range
    join."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_SN_STEP_US}").alias("b"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("cents")
    )
    f = c.select(
        "event_type",
        (F.col("b") + _SN_LAG).alias("b"),
        F.col("cents").alias("fcents"),
    )
    scored = c.join(f, ["event_type", "b"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.sum(F.abs(F.col("cents") - F.col("fcents")))
        .cast("long")
        .alias("sum_abs_err_cents"),
        F.sum(F.col("cents") - F.col("fcents"))
        .cast("long")
        .alias("bias_cents"),
        F.expr(
            "CAST(sum(abs(cents - fcents)) AS decimal(38,0))"
            " * 1000 div count(1)"
        )
        .cast("long")
        .alias("mae_millicents"),
    )


# --------------------------------------------------------------------------
# events_trigram_paths — top 3-step behavioural paths (round 8)
# --------------------------------------------------------------------------

_TRI_TOP = 20


@register(
    "events_trigram_paths",
    tags=("b11",),
    oracle=f"""
        -- top 3-step paths: per-user consecutive event-type trigrams
        -- (ordered by time, event_id tiebreak), counted corpus-wide,
        -- top {_TRI_TOP} with a full lexicographic tiebreak so the cut
        -- is deterministic. events_markov is the 1-step transition
        -- matrix; this is the 3-step path mining on top of it.
        WITH s AS (
            SELECT user_id, event_type AS e1,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        c AS (
            SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
            FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
            GROUP BY e1, e2, e3
        )
        SELECT e1, e2, e3, n_paths FROM (
            SELECT *, row_number() OVER (
                ORDER BY n_paths DESC, e1, e2, e3) AS rk
            FROM c
        ) WHERE rk <= {_TRI_TOP}
    """,
)
def events_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioural paths: consecutive event-type trigrams
    per user (time order, event_id tiebreak), counted corpus-wide,
    top-20 under a total order (count DESC, then path lexicographic)
    so the cut never depends on engine iteration order. The
    path-mining step product analytics runs after `events_markov`'s
    one-step matrix — three steps is where "view→cart→purchase"
    funnels become visible without hand-declaring them.

    Plan/scale: ONE user-keyed window sort produces both leads (shared
    sort, same shape as win_lag_lead); the trigram count collapses to
    ≤ |event_type|³ rows with map-side combine; the final top-k window
    runs over that vocabulary-sized table only — the single-partition
    sort touches ≤ cubed-vocabulary rows, never the event stream."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    cnt = tri.groupBy("e1", "e2", "e3").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    rk = F.row_number().over(
        Window.orderBy(
            F.col("n_paths").desc(), F.col("e1"), F.col("e2"), F.col("e3")
        )
    )
    return (
        cnt.withColumn("rk", rk)
        .where(F.col("rk") <= _TRI_TOP)
        .drop("rk")
    )


# --------------------------------------------------------------------------
# events_burstiness — Fano factor of the hourly arrival process (round 8)
# --------------------------------------------------------------------------

_BF_STEP_US = 3_600_000_000  # hourly slots


@register(
    "events_burstiness",
    tags=("b11",),
    oracle=f"""
        -- burstiness per series: Fano factor (variance-to-mean ratio)
        -- of hourly event counts over the series' full calendar span,
        -- empty slots counted as zero. Fano 1000 (milli) = Poisson;
        -- above = bursty, below = regular — the dispersion diagnostic
        -- behind rate-limiter sizing and anomaly thresholds.
        -- Exact integer legs: with S slots and per-slot counts c,
        -- fano_milli = (S·Σc² − (Σc)²)·1000 // (S·Σc), HUGEINT
        -- intermediates (Σc² ~ 1e18 already wraps int64 cross-terms
        -- at 100 TB).
        WITH c AS (
            SELECT event_type,
                   epoch_us(ts) // {_BF_STEP_US} AS b,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        g AS (
            SELECT event_type,
                   MAX(b) - MIN(b) + 1 AS n_slots,
                   SUM(n) AS n_events,
                   SUM(CAST(n AS HUGEINT) * n) AS sum_n2
            FROM c GROUP BY event_type
        )
        SELECT event_type,
               CAST(n_slots AS BIGINT) AS n_slots,
               CAST(n_events AS BIGINT) AS n_events,
               CAST((CAST(n_slots AS HUGEINT) * sum_n2
                     - CAST(n_events AS HUGEINT) * n_events) * 1000
                    // (CAST(n_slots AS HUGEINT) * n_events)
                    AS BIGINT) AS fano_milli
        FROM g
    """,
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor, variance-to-mean of hourly arrival
    counts) per event series, with empty hours inside the series'
    calendar span counted as zero — WITHOUT materializing the empty
    slots: with S spanned slots, Σc and Σc² over observed cells alone
    determine the population variance (zeros add nothing), so
    fano = (S·Σc² − (Σc)²) / (S·Σc), emitted in exact milli units via
    a decimal(38,0) floor cross-multiply. Fano ≈ 1.0 is Poisson;
    higher means bursty traffic — the statistic that sizes
    rate-limiters and anomaly thresholds per series.

    Plan/scale: one map-side-combined hash agg to calendar cells, one
    series-sized rollup. No spine join for the empty slots (the
    algebra above absorbs them), no window, no join."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type",
        F.expr(f"unix_micros(ts) div {_BF_STEP_US}").alias("b"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = c.groupBy("event_type").agg(
        (F.max("b") - F.min("b") + F.lit(1)).alias("n_slots"),
        F.sum("n").alias("n_events"),
        F.sum(F.expr("CAST(n AS decimal(38,0)) * n")).alias("sum_n2"),
    )
    return g.select(
        "event_type",
        F.col("n_slots").cast("long").alias("n_slots"),
        F.col("n_events").cast("long").alias("n_events"),
        F.expr(
            "(CAST(n_slots AS decimal(38,0)) * sum_n2"
            " - CAST(n_events AS decimal(38,0)) * n_events) * 1000"
            " div (CAST(n_slots AS decimal(38,0)) * n_events)"
        )
        .cast("long")
        .alias("fano_milli"),
    )


# --------------------------------------------------------------------------
# events_stickiness — DAU/MAU engagement ratio (round 8)
# --------------------------------------------------------------------------

_ST_DAY_US = 86_400_000_000
_ST_MAU_DAYS = 28


@register(
    "events_stickiness",
    tags=("b11",),
    oracle=f"""
        -- stickiness = DAU / trailing-28-day distinct actives, the
        -- engagement ratio every growth team tracks (a DAU spike with
        -- flat stickiness is acquisition; rising stickiness is habit).
        -- COUNT(DISTINCT) OVER RANGE is unsupported SQL everywhere and
        -- re-aggregated daily distincts undercount — the exact linear
        -- rewrite is events_active_users' constant-fanout explode of
        -- the (user, day) cell table, widened to 28 days, with the
        -- ratio as an integer-bp floor cross-multiply. Only full
        -- windows report (the leading ramp is a partial-data
        -- artifact, not a metric).
        WITH cells AS (
            SELECT DISTINCT user_id, epoch_us(ts) // {_ST_DAY_US} AS day
            FROM events
        ),
        bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM cells),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM cells
            GROUP BY day
        ),
        mau AS (
            SELECT t.tday AS day,
                   CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS mau
            FROM (
                SELECT c.user_id, c.day,
                       unnest(range(c.day, c.day + {_ST_MAU_DAYS}))
                           AS tday
                FROM cells c
            ) t
            JOIN cells c ON c.user_id = t.user_id AND c.day = t.day
            GROUP BY t.tday
        )
        SELECT d.day, d.dau, m.mau,
               d.dau * 10000 // m.mau AS stickiness_bp
        FROM dau d
        JOIN mau m ON m.day = d.day, bounds b
        WHERE d.day >= b.d0 + {_ST_MAU_DAYS} - 1 AND d.day <= b.d1
    """,
)
def events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day: daily distinct actives over
    trailing-28-day distinct actives, in integer basis points. The
    habit metric growth teams steer by — and SQL's awkward corner:
    `COUNT(DISTINCT) OVER RANGE` doesn't exist and summing daily
    distincts double-counts, so the engine uses the exact linear
    rewrite proven by `events_active_users`: each (user, day) cell
    contributes to the 28 target days it can influence (constant 28×
    explode of the CELL table, never the raw stream), then one
    distinct agg per target day. Only days with a full trailing
    window report.

    Plan/scale: (user, day) dedup is one hash agg; the explode is
    codegen'd constant fanout; the distinct-per-day agg shuffles
    user-day-cell volume once. Min/max bounds are a 1-row broadcast.
    No window function at all — the rewrite IS the scale plan."""
    ev = table(spark, sf_dir, "events")
    cells = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_ST_DAY_US}").alias("day"),
    ).distinct()
    bounds = cells.groupBy().agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    dau = cells.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    mau = (
        cells.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"), F.col("day") + _ST_MAU_DAYS - 1
                )
            ).alias("day"),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("mau"))
        .withColumnRenamed("day", "mday")
    )
    return (
        dau.join(mau, dau.day == F.col("mday"))
        .join(F.broadcast(bounds))
        .where(
            (F.col("day") >= F.col("d0") + _ST_MAU_DAYS - 1)
            & (F.col("day") <= F.col("d1"))
        )
        .select(
            "day",
            "dau",
            "mau",
            F.expr("dau * 10000 div mau").alias("stickiness_bp"),
        )
    )


# --------------------------------------------------------------------------
# events_concurrency — sweep-line peak concurrency (round 8)
# --------------------------------------------------------------------------

_HOLD_S = 900  # each event holds a slot for 15 minutes (half-open)


@register(
    "events_concurrency",
    tags=("b11",),
    oracle=f"""
        -- sweep-line peak concurrency: every event occupies a slot for
        -- the half-open interval [s, s+{_HOLD_S}) seconds; the delta
        -- stream (+1 at start, -1 at end) is COMPRESSED per (type,
        -- second) before the running sum, so the window input is
        -- distinct-second cardinality, not event cardinality. Peak per
        -- (type, day) plus the earliest second attaining it.
        WITH base AS (
            SELECT event_type, epoch_us(ts) // 1000000 AS s FROM events
        ),
        d AS (
            SELECT event_type, s, 1 AS d FROM base
            UNION ALL
            SELECT event_type, s + {_HOLD_S}, -1 FROM base
        ),
        comp AS (
            SELECT event_type, s, CAST(SUM(d) AS BIGINT) AS d
            FROM d GROUP BY event_type, s
        ),
        r AS (
            SELECT event_type, s,
                   SUM(d) OVER (PARTITION BY event_type ORDER BY s) AS run
            FROM comp
        ),
        p AS (
            SELECT event_type, s // 86400 AS day, s, run,
                   MAX(run) OVER (
                       PARTITION BY event_type, s // 86400
                   ) AS peak
            FROM r
        )
        SELECT event_type,
               CAST(day AS BIGINT) AS day,
               CAST(MAX(peak) AS BIGINT) AS peak_concurrent,
               CAST(MIN(s) AS BIGINT) AS peak_at_s
        FROM p WHERE run = peak
        GROUP BY event_type, day
    """,
)
def events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per (event_type, day) — the classic
    sweep-line: each event occupies a slot for the half-open interval
    [ts, ts+15min), deltas (+1 start / −1 end) are summed in one
    running window, and the per-day maximum plus the earliest second
    attaining it is reported (capacity planning, rate-limit sizing,
    license-seat audits).

    Exactness: everything is integer seconds and integer counts; the
    delta stream is pre-aggregated per (type, second) so the running
    sum's ORDER BY s is a TOTAL order — no tie policy can diverge.

    Plan/scale: the groupBy compresses the 2×N delta rows map-side to
    ≤ types × distinct-seconds before any shuffle; the per-type running
    sum is then a window over TIME-BUCKET cardinality (86 400 rows per
    type-day, independent of event volume) with O(1) carried state —
    the same per-key-sequential shape as `stream_stateful`. The peak
    window and final agg share the type partitioning (AQE reuses the
    exchange)."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_type", F.expr("unix_micros(ts) div 1000000").alias("s")
    )
    deltas = base.select("event_type", "s", F.lit(1).alias("d")).unionByName(
        base.select(
            "event_type", (F.col("s") + _HOLD_S).alias("s"),
            F.lit(-1).alias("d"),
        )
    )
    comp = deltas.groupBy("event_type", "s").agg(
        F.sum("d").cast("long").alias("d")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = comp.select(
        "event_type", "s", F.sum("d").over(w_run).alias("run")
    ).withColumn("day", F.expr("s div 86400"))
    w_day = Window.partitionBy("event_type", "day")
    p = r.withColumn("peak", F.max("run").over(w_day))
    return (
        p.filter(F.col("run") == F.col("peak"))
        .groupBy("event_type", "day")
        .agg(
            F.max("peak").cast("long").alias("peak_concurrent"),
            F.min("s").cast("long").alias("peak_at_s"),
        )
    )


# --------------------------------------------------------------------------
# orders_market_share — monthly segment share + rank movement (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_market_share",
    tags=("bext",),
    oracle="""
        -- monthly market share by customer segment: exact-cents
        -- revenue, share of month in floor basis points (HUGEINT /
        -- decimal(38,0) cross-multiplication), deterministic rank
        -- (cents DESC, segment), and the rank movement vs the
        -- segment's previous month (positive = climbed).
        WITH seg AS (
            SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                   c_mktsegment AS segment,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS revenue_cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        r AS (
            SELECT ym, segment, revenue_cents,
                   CAST(revenue_cents * 10000
                        // SUM(revenue_cents) OVER (PARTITION BY ym)
                        AS BIGINT) AS share_bp,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY ym
                       ORDER BY revenue_cents DESC, segment
                   ) AS BIGINT) AS rnk
            FROM seg
        )
        SELECT CAST(ym AS BIGINT) AS ym, segment, revenue_cents,
               share_bp, rnk,
               CAST(lag(rnk) OVER (PARTITION BY segment ORDER BY ym)
                    - rnk AS BIGINT) AS rank_delta
        FROM r
    """,
)
def orders_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue market share per customer segment, with the
    share of that month's total in basis points, the deterministic
    in-month rank, and the rank movement vs the segment's previous
    month — the competitive-dynamics BI staple (who gained share last
    month, and from whom).

    Exactness: revenue in integer cents; share as a floor-division
    basis-point leg routed through decimal(38,0) ↔ HUGEINT (the
    `events_rfm` overflow policy — int64 cents×10⁴ wraps at corpus
    scale under ANSI-off while DuckDB errors); ranks by (cents DESC,
    segment) so ties can't diverge.

    Plan/scale: the orders⋈customer join shuffles on custkey (AQE
    broadcasts the dim at small SF); everything after the first
    groupBy runs over months×segments rows — the windows (share-of-
    month, rank, previous-month lag) are all over AGGREGATED
    cardinality, never the raw fact stream."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.expr(
                "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"
            ).alias("ym"),
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("ym", "segment")
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )
    w_m = Window.partitionBy("ym")
    w_rnk = Window.partitionBy("ym").orderBy(
        F.col("revenue_cents").desc(), "segment"
    )
    r = seg.select(
        "ym",
        "segment",
        "revenue_cents",
        F.expr(
            "CAST(CAST(revenue_cents AS decimal(38,0)) * 10000 AS decimal(38,0))"
        ).alias("_num"),
        F.sum("revenue_cents").over(w_m).cast("decimal(38,0)").alias("_tot"),
        F.row_number().over(w_rnk).cast("long").alias("rnk"),
    ).select(
        "ym",
        "segment",
        "revenue_cents",
        F.expr("CAST(_num div _tot AS BIGINT)").alias("share_bp"),
        "rnk",
    )
    w_seg = Window.partitionBy("segment").orderBy("ym")
    return r.select(
        "ym",
        "segment",
        "revenue_cents",
        "share_bp",
        "rnk",
        (F.lag("rnk").over(w_seg) - F.col("rnk")).cast("long").alias("rank_delta"),
    )


# --------------------------------------------------------------------------
# events_bounce — landing-type bounce rate over sessionized events (round 8)
# --------------------------------------------------------------------------


@register(
    "events_bounce",
    tags=("bext",),
    oracle="""
        -- bounce rate per landing event type: sessions built with the
        -- win_sessionize gap rule (10-min inactivity), a session's
        -- landing = its first event (ts, event_id order), bounce = a
        -- single-event session. The web-analytics staple, here over
        -- the gaps-and-islands form so batch and stream_session
        -- cross-validate.
        WITH seq AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             > 600000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT user_id, event_type,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                   ) AS session_id,
                   ts_us, event_id
            FROM seq
        ),
        landed AS (
            SELECT user_id, session_id,
                   FIRST_VALUE(event_type) OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY ts_us, event_id
                   ) AS landing
            FROM tagged
        ),
        sess AS (
            SELECT user_id, session_id, landing, COUNT(*) AS n_events
            FROM landed GROUP BY user_id, session_id, landing
        )
        SELECT landing,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bounces,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS bounce_bp
        FROM sess GROUP BY landing
    """,
)
def events_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per landing event type: sessionize with the same
    10-minute inactivity gap as `win_sessionize`, take each session's
    FIRST event as its landing, and report how many sessions ended
    after that single event — the engagement-quality readout behind
    every landing-page decision.

    Determinism: the landing is the arg-min of (ts_us, event_id) — a
    total order; bounce share is a floor-division bp leg on exact
    counts.

    Plan/scale: ONE shuffle on user_id serves the gap-lag window, the
    running-sum session id, and the per-session agg (all share the
    per-user sort); the landing rollup then runs over SESSION
    cardinality. Same cost envelope as `win_sessionize` plus one
    vocabulary-sized agg."""
    from nchu_bigdata_spark.queries.streaming_batch import _10M_US

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    prev = F.lag(ts_us).over(w)
    new_sess = F.when(prev.isNull() | ((ts_us - prev) > _10M_US), 1).otherwise(0)
    tagged = ev.select(
        "user_id",
        "event_type",
        ts_us.alias("ts_us"),
        "event_id",
        F.sum(new_sess).over(w).alias("session_id"),
    )
    # landing via first_value over the SAME per-user sort (no extra
    # exchange), then one per-session agg
    w_s = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    sess = (
        tagged.withColumn("landing", F.first("event_type").over(w_s))
        .groupBy("user_id", "session_id", "landing")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return sess.groupBy("landing").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("long")
        .alias("n_bounces"),
        F.expr(
            "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("bounce_bp"),
    )


# --------------------------------------------------------------------------
# ts_mad_anomaly — median/MAD robust outlier days (round 8)
# --------------------------------------------------------------------------

_MAD_K = 3  # flag |x - median| > K * MAD (division-free integer test)


@register(
    "ts_mad_anomaly",
    tags=("b11",),
    oracle=f"""
        -- robust outlier days per event series: median/MAD instead of
        -- events_anomaly's mean/stddev z-score (one wild day inflates
        -- a stddev and masks itself; the median absolute deviation
        -- doesn't). All order statistics use the doubled-integer
        -- policy (med2 = sum of the two middle values = 2x median;
        -- mad4 = med2 of the doubled deviations = 4x MAD), so the
        -- flag test 2*dev2 > {_MAD_K}*mad4 is exact int64 — no .5
        -- floats, no division. mad4 = 0 degrades to "any deviation
        -- flags", the correct robust limit.
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY n_events, day
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM cell
        ),
        med AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                                 THEN n_events ELSE 0 END)
                        * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                               THEN 2 ELSE 1 END AS BIGINT) AS med2
            FROM r GROUP BY event_type
        ),
        dev AS (
            SELECT cell.event_type, day, n_events, med2,
                   ABS(2 * n_events - med2) AS dev2
            FROM cell JOIN med ON cell.event_type = med.event_type
        ),
        dr AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY dev2, day
                   ) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                                 THEN dev2 ELSE 0 END)
                        * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                               THEN 2 ELSE 1 END AS BIGINT) AS mad4
            FROM dr GROUP BY event_type
        )
        SELECT dev.event_type, CAST(day AS BIGINT) AS day, n_events,
               med2, CAST(dev2 AS BIGINT) AS dev2, mad4
        FROM dev JOIN mad ON dev.event_type = mad.event_type
        WHERE 2 * dev2 > {_MAD_K} * mad4
    """,
)
def ts_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier days per event series: flag days whose count
    deviates from the series MEDIAN by more than {K}× the median
    absolute deviation — the breakdown-resistant counterpart to
    `events_anomaly`'s mean/stddev z-score (one wild day inflates a
    stddev enough to mask itself; it barely moves a median).

    Exactness: both order statistics use the doubled-integer policy
    (`events_inter_arrival` / `win_rolling_median`): med2 = 2×median,
    mad4 = 4×MAD, and the flag test 2·dev2 > K·mad4 is pure int64 —
    no .5, no division, no consistency-constant float. mad4 = 0
    (over half the days identical) degrades to "any deviation flags",
    the correct robust limit.

    Plan/scale: the cell agg collapses events to (type, day)
    cardinality map-side; the two ranking windows and the two tiny
    per-type rollup joins all key on event_type, so after the cell
    shuffle everything is partition-local over DAY-cardinality rows;
    the per-type med2/mad4 tables are vocabulary-sized broadcasts."""
    ev = table(spark, sf_dir, "events")
    cell = (
        ev.groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )

    # med2 per type (sum of the two middle values; odd n doubles the
    # single middle so med2 is always 2x the median)
    w_r = Window.partitionBy("event_type").orderBy("n_events", "day")
    w_n = Window.partitionBy("event_type")
    r = cell.select(
        "event_type",
        "n_events",
        F.row_number().over(w_r).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med = r.groupBy("event_type").agg(
        F.expr(
            "CAST(sum(CASE WHEN rk = (n + 1) div 2 OR rk = n div 2 + 1 "
            "THEN n_events ELSE 0 END) "
            "* CASE WHEN (max(n) + 1) div 2 = max(n) div 2 + 1 "
            "THEN 2 ELSE 1 END AS BIGINT)"
        ).alias("med2")
    )
    dev = cell.join(med, "event_type").select(
        "event_type",
        "day",
        "n_events",
        "med2",
        F.abs(2 * F.col("n_events") - F.col("med2")).alias("dev2"),
    )
    w_dr = Window.partitionBy("event_type").orderBy("dev2", "day")
    dr = dev.select(
        "event_type",
        "dev2",
        F.row_number().over(w_dr).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    mad = dr.groupBy("event_type").agg(
        F.expr(
            "CAST(sum(CASE WHEN rk = (n + 1) div 2 OR rk = n div 2 + 1 "
            "THEN dev2 ELSE 0 END) "
            "* CASE WHEN (max(n) + 1) div 2 = max(n) div 2 + 1 "
            "THEN 2 ELSE 1 END AS BIGINT)"
        ).alias("mad4")
    )
    return (
        dev.join(mad, "event_type")
        .filter(2 * F.col("dev2") > _MAD_K * F.col("mad4"))
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            "n_events",
            "med2",
            F.col("dev2").cast("long").alias("dev2"),
            "mad4",
        )
    )


# --------------------------------------------------------------------------
# events_session_hist — log2 session-duration histogram (round 8)
# --------------------------------------------------------------------------


@register(
    "events_session_hist",
    tags=("bext",),
    oracle="""
        -- log2-bucketed session-duration histogram: sessions from the
        -- win_sessionize 10-min gap rule, duration in whole seconds,
        -- bucket = floor(log2(dur_s + 1)) via the binary-string-length
        -- idiom (graph_degree_distribution policy — no float log2).
        -- Bucket 0 = instant sessions, bucket b covers [2^b - 1,
        -- 2^(b+1) - 2] seconds.
        WITH seq AS (
            SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                   CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                             > 600000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT user_id, ts_us,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_us, event_id
                   ) AS session_id
            FROM seq
        ),
        sess AS (
            SELECT user_id,
                   (MAX(ts_us) - MIN(ts_us)) // 1000000 AS dur_s,
                   COUNT(*) AS n_events
            FROM tagged GROUP BY user_id, session_id
        )
        SELECT CAST(length(bin(dur_s + 1)) - 1 AS BIGINT) AS bucket,
               CAST(2 ** (length(bin(dur_s + 1)) - 1) - 1 AS BIGINT)
                   AS lo_s,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(n_events) AS BIGINT) AS total_events
        FROM sess GROUP BY 1, 2
    """,
)
def events_session_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed session-duration histogram: how long do sessions
    last, on the scale that matters (durations are heavy-tailed, so
    equi-width bins waste 90% of their cells) — the engagement-depth
    readout beside `events_bounce`'s single-event rate.

    Exactness: durations in whole integer seconds; the bucket is
    floor(log₂(dur_s+1)) computed from the BINARY STRING length
    (`graph_degree_distribution`'s idiom — never float log2, whose
    boundary cells flip between engines). Bucket 0 = instant
    sessions; bucket b covers [2^b − 1, 2^(b+1) − 2] seconds.

    Plan/scale: the same single user_id exchange as `win_sessionize`
    serves gap-lag, session-id running sum, and the per-session agg;
    the histogram rollup then touches SESSION-cardinality rows and
    collapses to ≤ ~40 buckets map-side."""
    from nchu_bigdata_spark.queries.streaming_batch import _10M_US

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros("ts")
    prev = F.lag(ts_us).over(w)
    new_sess = F.when(prev.isNull() | ((ts_us - prev) > _10M_US), 1).otherwise(0)
    tagged = ev.select(
        "user_id",
        ts_us.alias("ts_us"),
        F.sum(new_sess).over(w).alias("session_id"),
    )
    sess = tagged.groupBy("user_id", "session_id").agg(
        F.expr("(max(ts_us) - min(ts_us)) div 1000000").alias("dur_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bucket = (F.length(F.bin(F.col("dur_s") + 1)) - 1).cast("long")
    return (
        sess.select(bucket.alias("bucket"), "user_id", "n_events")
        .withColumn(
            "lo_s",
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1 "
                "AS BIGINT)"
            ),
        )
        .groupBy("bucket", "lo_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("total_events"),
        )
    )


# --------------------------------------------------------------------------
# orders_abc_class — ABC revenue classification (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_abc_class",
    tags=("bext",),
    oracle="""
        -- ABC (Pareto) inventory classification: parts ranked by
        -- revenue cents (partkey tie-break), cumulative-share cut at
        -- 80% / 95% — A carries the first 80%, C the tail. The
        -- inventory-policy staple. Flooring discipline: the class
        -- test is a pure integer cross-multiply (cum*10 <= tot*8),
        -- never a float share.
        WITH pr AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM lineitem GROUP BY l_partkey
        ),
        r AS (
            SELECT cents,
                   SUM(cents) OVER (
                       ORDER BY cents DESC, l_partkey
                   ) AS cum,
                   SUM(cents) OVER () AS tot
            FROM pr
        ),
        cls AS (
            SELECT cents,
                   CASE WHEN cum * 10 <= tot * 8 THEN 'A'
                        WHEN cum * 20 <= tot * 19 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM r
        )
        SELECT abc_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents,
               CAST(SUM(cents) * 10000 // (SELECT SUM(cents) FROM pr)
                    AS BIGINT) AS share_bp
        FROM cls GROUP BY abc_class
    """,
)
def orders_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: rank parts by
    exact-cents revenue, cut the cumulative share at 80% (class A) and
    95% (class B) — the inventory-policy readout ("count the A items
    daily, the C items yearly").

    The global running revenue sum uses the DISTRIBUTED two-pass
    pattern (`win_lorenz`, extended from count offsets to VALUE
    offsets): range-repartition on (cents DESC, partkey), per-
    partition cents subtotals broadcast back as prefix offsets, cum =
    offset + partition-local running sum. No single-task window over
    part cardinality, ever. Class membership is an integer cross-
    multiply (cum·10 ≤ tot·8) routed through decimal(38,0)/HUGEINT —
    no float shares.

    Boundary-partition nondeterminism is irrelevant to the OUTPUT
    *given the r10 freeze* (``materialize.range_pid_frozen`` — both
    branches read one localCheckpointed partitioning, ADVICE r9 high):
    the sort is a total order, so cum per row is invariant to where
    the frozen boundaries fell."""
    li = table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents")
    )
    pid = range_pid_frozen(
        "orders_abc_class.pid",
        pr,
        F.col("cents").desc(),
        F.col("l_partkey"),
    )
    pc = pid.groupBy("pid").agg(F.sum("cents").alias("psum"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = pc.select(
        "pid",
        F.coalesce(F.sum("psum").over(w_off), F.lit(0)).alias("coff"),
        F.sum("psum").over(Window.partitionBy()).alias("tot"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        F.col("cents").desc(), "l_partkey"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cls = (
        pid.withColumn("clocal", F.sum("cents").over(w_local))
        .join(F.broadcast(off), "pid")
        .select(
            "cents",
            F.expr(
                "CASE WHEN CAST(coff + clocal AS decimal(38,0)) * 10"
                "       <= CAST(tot AS decimal(38,0)) * 8 THEN 'A' "
                "WHEN CAST(coff + clocal AS decimal(38,0)) * 20"
                "       <= CAST(tot AS decimal(38,0)) * 19 THEN 'B' "
                "ELSE 'C' END"
            ).alias("abc_class"),
            "tot",
        )
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            F.max("tot").alias("_tot"),
        )
        .select(
            "abc_class",
            "n_parts",
            "revenue_cents",
            F.expr(
                "CAST(CAST(revenue_cents AS decimal(38,0)) * 10000"
                " div _tot AS BIGINT)"
            ).alias("share_bp"),
        )
    )


# --------------------------------------------------------------------------
# events_new_vs_returning — daily acquisition split (round 8)
# --------------------------------------------------------------------------


@register(
    "events_new_vs_returning",
    tags=("bext",),
    oracle="""
        -- daily new-vs-returning actives: a user's first-ever active
        -- day marks them "new" that day, returning after — the
        -- acquisition-vs-retention split on every growth dashboard.
        WITH ud AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // 86400000000 AS day
            FROM events
        ),
        fd AS (
            SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id
        )
        SELECT CAST(ud.day AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN ud.day = fd.first_day
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN ud.day = fd.first_day
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_returning,
               CAST(SUM(CASE WHEN ud.day = fd.first_day
                             THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS new_bp
        FROM ud JOIN fd ON ud.user_id = fd.user_id
        GROUP BY ud.day
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning active-user split: a user counts as
    "new" on their first-ever active day and "returning" on every
    later one — the acquisition/retention decomposition on every
    growth dashboard (complements `events_retention`'s cohort matrix
    with a per-day operational view).

    Plan/scale: the (user, day) dedup agg and the per-user min-day
    agg share the user_id key — ONE effective exchange serves both
    plus the equi join between them; the day rollup then runs over
    (user, day) CELL cardinality. Integer day arithmetic; floor-bp
    share."""
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).distinct()
    fd = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(fd, "user_id")
    is_new = (F.col("day") == F.col("first_day")).cast("long")
    return j.groupBy(F.col("day").cast("long").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(is_new).cast("long").alias("n_new"),
        (F.count(F.lit(1)) - F.sum(is_new)).cast("long").alias("n_returning"),
        F.expr(
            "CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("new_bp"),
    )


# --------------------------------------------------------------------------
# orders_hhi — Herfindahl-Hirschman concentration index (round 8)
# --------------------------------------------------------------------------


@register(
    "orders_hhi",
    tags=("bext",),
    oracle="""
        -- monthly Herfindahl-Hirschman index over customer-segment
        -- revenue shares: HHI = sum of squared shares, here in floor
        -- basis points (share_bp^2 // 10000, max 10000 = monopoly) —
        -- the antitrust-grade concentration readout one level above
        -- orders_market_share's per-segment rows.
        WITH seg AS (
            SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
                   c_mktsegment AS segment,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
        ),
        sh AS (
            SELECT ym, segment, cents,
                   cents * 10000 // SUM(cents) OVER (PARTITION BY ym)
                       AS share_bp
            FROM seg
        )
        SELECT CAST(ym AS BIGINT) AS ym,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(MAX(share_bp) AS BIGINT) AS top_share_bp,
               CAST(SUM(share_bp * share_bp) // 10000 AS BIGINT) AS hhi_bp
        FROM sh GROUP BY ym
    """,
)
def orders_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Herfindahl-Hirschman concentration index over customer-
    segment revenue: HHI = Σ share², reported in floor basis points
    (10000 = monopoly, 10000/n = perfect split) plus the top segment's
    share — the is-revenue-concentrating trend readout one level above
    `orders_market_share`'s per-segment rows.

    Exactness: shares floor to integer bp FIRST (decimal(38,0) ↔
    HUGEINT cross-multiply), then HHI squares and floors those
    integers — floor-of-floor is identical on both engines by
    construction; share_bp² ≤ 10⁸ so the sum sits far inside int64.

    Plan/scale: identical join+agg shape to `orders_market_share`
    (fact⋈dim on custkey, then everything over months×segments); the
    share window and final rollup share the ym partitioning."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    seg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.expr(
                "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"
            ).alias("ym"),
            F.col("c_mktsegment").alias("segment"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("ym", "segment")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w_m = Window.partitionBy("ym")
    sh = seg.select(
        "ym",
        F.expr(
            "CAST(CAST(cents AS decimal(38,0)) * 10000 AS decimal(38,0))"
        ).alias("_num"),
        F.sum("cents").over(w_m).cast("decimal(38,0)").alias("_tot"),
    ).select("ym", F.expr("CAST(_num div _tot AS BIGINT)").alias("share_bp"))
    return sh.groupBy("ym").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.max("share_bp").cast("long").alias("top_share_bp"),
        F.expr("CAST(sum(share_bp * share_bp) div 10000 AS BIGINT)").alias(
            "hhi_bp"
        ),
    )


# --------------------------------------------------------------------------
# orders_customer_migration — value-tier transition matrix (round 8)
# --------------------------------------------------------------------------

_MIG_SPLIT_YM = 199800  # orders before 1998 = period 1, after = period 2
_MIG_TIERS = 3


@register(
    "orders_customer_migration",
    tags=("bext",),
    oracle=f"""
        -- customer value-tier migration matrix: rank customers by
        -- exact-cents revenue within each period (before/after the
        -- 1998 boundary), cut into {_MIG_TIERS} equi-depth tiers with
        -- the closed-form (rank-1)*{_MIG_TIERS} // n (win_lorenz's
        -- cut — computable by a DISTRIBUTED rank), and count every
        -- (tier_then, tier_now) cell. Customers absent from a period
        -- land in tier 0 ("inactive") — churn and win-back are cells
        -- of the same matrix, not special cases.
        WITH cr AS (
            SELECT o_custkey,
                   CASE WHEN year(o_orderdate) * 100 + month(o_orderdate)
                             < {_MIG_SPLIT_YM} THEN 1 ELSE 2 END AS period,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
            FROM orders GROUP BY 1, 2
        ),
        r AS (
            SELECT o_custkey, period,
                   CAST((ROW_NUMBER() OVER (
                       PARTITION BY period
                       ORDER BY cents DESC, o_custkey
                   ) - 1) * {_MIG_TIERS} // COUNT(*) OVER (
                       PARTITION BY period) + 1 AS BIGINT) AS tier
            FROM cr
        ),
        p1 AS (SELECT o_custkey, tier FROM r WHERE period = 1),
        p2 AS (SELECT o_custkey, tier FROM r WHERE period = 2),
        allc AS (
            SELECT o_custkey FROM p1
            UNION
            SELECT o_custkey FROM p2
        )
        SELECT COALESCE(p1.tier, 0) AS tier_then,
               COALESCE(p2.tier, 0) AS tier_now,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM allc a
        LEFT JOIN p1 ON p1.o_custkey = a.o_custkey
        LEFT JOIN p2 ON p2.o_custkey = a.o_custkey
        GROUP BY 1, 2
    """,
)
def orders_customer_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-tier migration matrix: tercile tiers by revenue
    within each of two periods (the 1998 boundary), every customer
    assigned a (tier_then, tier_now) cell — tier 0 meaning inactive
    that period, so churn and win-back are ordinary cells of the same
    matrix. The lifecycle readout behind win-back targeting and
    value-upgrade attribution.

    Tier cuts use the closed-form equi-depth formula
    (rank−1)·3 div n (`win_lorenz`) over the DISTRIBUTED rank: range
    repartition on (cents DESC, custkey) per period, per-partition
    counts broadcast as offsets, rank = offset + local row_number —
    never a single-task window over customer cardinality.

    Plan/scale: one custkey-keyed rollup; two per-period rank passes
    over CUSTOMER-cardinality rows; the matrix join is custkey-equi
    (full-outer via the union spine) and the final agg collapses to
    ≤ (tiers+1)² cells."""
    o = table(spark, sf_dir, "orders")
    cr = o.groupBy(
        "o_custkey",
        F.expr(
            f"CASE WHEN year(o_orderdate) * 100 + month(o_orderdate)"
            f" < {_MIG_SPLIT_YM} THEN 1 ELSE 2 END"
        ).alias("period"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias(
            "cents"
        )
    )
    pid = range_pid_frozen(
        "orders_customer_migration.pid",
        cr,
        "period",
        F.col("cents").desc(),
        F.col("o_custkey"),
    )
    pc = pid.groupBy("period", "pid").agg(F.count(F.lit(1)).alias("pn"))
    w_off = (
        Window.partitionBy("period")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = pc.select(
        "period",
        "pid",
        F.coalesce(F.sum("pn").over(w_off), F.lit(0)).alias("off"),
        F.sum("pn").over(Window.partitionBy("period")).alias("n"),
    )
    w_local = Window.partitionBy("period", "pid").orderBy(
        F.col("cents").desc(), "o_custkey"
    )
    ranked = (
        pid.withColumn("rlocal", F.row_number().over(w_local))
        .join(F.broadcast(off), ["period", "pid"])
        .select(
            "o_custkey",
            "period",
            F.expr(
                f"CAST((off + rlocal - 1) * {_MIG_TIERS} div n + 1 AS BIGINT)"
            ).alias("tier"),
        )
    )
    p1 = ranked.filter(F.col("period") == 1).select(
        "o_custkey", F.col("tier").alias("tier_then")
    )
    p2 = ranked.filter(F.col("period") == 2).select(
        "o_custkey", F.col("tier").alias("tier_now")
    )
    allc = p1.select("o_custkey").union(p2.select("o_custkey")).distinct()
    return (
        allc.join(p1, "o_custkey", "left")
        .join(p2, "o_custkey", "left")
        .groupBy(
            F.coalesce("tier_then", F.lit(0)).cast("long").alias("tier_then"),
            F.coalesce("tier_now", F.lit(0)).cast("long").alias("tier_now"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# events_lateness_profile — out-of-order arrival diagnostic (round 8)
# --------------------------------------------------------------------------

_LATE_WM_US = 600_000_000  # the streaming ops' 10-minute watermark


@register(
    "events_lateness_profile",
    tags=("b11",),
    oracle=f"""
        -- out-of-order arrival profile per stream: replaying arrival
        -- order (event_id), how far does event time run behind the
        -- running high-water mark, and how many events would the
        -- streaming ops' 10-minute watermark have DROPPED? The batch
        -- diagnostic that calibrates stream_watermark_late's bound
        -- before deployment.
        WITH a AS (
            SELECT event_type,
                   epoch_us(ts) AS ts_us,
                   MAX(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS hwm
            FROM events
        ),
        d AS (
            SELECT event_type,
                   CASE WHEN hwm IS NULL OR ts_us >= hwm
                        THEN 0 ELSE hwm - ts_us END AS late_us
            FROM a
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_out_of_order,
               CAST(MAX(late_us) AS BIGINT) AS max_late_us,
               CAST(SUM(CASE WHEN late_us > {_LATE_WM_US}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped_by_wm,
               CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000
                    // COUNT(*) AS BIGINT) AS ooo_bp
        FROM d GROUP BY event_type
    """,
)
def events_lateness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order arrival profile per stream: replay arrival order
    (event_id as the arrival sequence), track the running event-time
    high-water mark, and measure how many events arrive behind it —
    and how many the streaming ops' 10-minute watermark
    (`stream_watermark_late`) would have dropped. This is the batch
    calibration every watermark bound needs BEFORE deployment: set the
    bound below max_late_us and n_dropped_by_wm is your data loss.

    Exactness: integer micros; the high-water mark window excludes
    the current row (1 PRECEDING) so an event is late only vs events
    that arrived strictly before it; event_id is a total order.

    Plan/scale: ONE window sort per event_type over arrival order +
    one hash agg on the same key. The per-type running max is
    inherently sequential state — the same per-key O(1) cursor the
    streaming engine itself maintains; types are the stream's
    partition key, exactly as in `stream_stateful`."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros("ts")
    a = ev.select(
        "event_type",
        ts_us.alias("ts_us"),
        F.max(ts_us).over(w).alias("hwm"),
    )
    late = F.when(
        F.col("hwm").isNull() | (F.col("ts_us") >= F.col("hwm")), 0
    ).otherwise(F.col("hwm") - F.col("ts_us"))
    d = a.select("event_type", late.alias("late_us"))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((F.col("late_us") > 0).cast("long"))
        .cast("long")
        .alias("n_out_of_order"),
        F.max("late_us").cast("long").alias("max_late_us"),
        F.sum((F.col("late_us") > _LATE_WM_US).cast("long"))
        .cast("long")
        .alias("n_dropped_by_wm"),
        F.expr(
            "CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("ooo_bp"),
    )


# --------------------------------------------------------------------------
# ts_changepoint — max-|CUSUM| level-shift estimate (round 8)
# --------------------------------------------------------------------------


@register(
    "ts_changepoint",
    tags=("b11",),
    oracle="""
        -- single changepoint estimate for the daily event-count
        -- series by the classic max-|CUSUM| statistic: with n days
        -- and total S, the scaled cumulative deviation at day t is
        -- C_t = n*prefix_t - t*S  (= n * sum_{i<=t}(x_i - S/n),
        -- cleared of the 1/n fraction so it is EXACT int64 on both
        -- engines); the level-shift point is argmax |C_t|, earliest
        -- day on ties. Segment means are exact centi-events
        -- (100*sum div days). The last day is never the argmax
        -- (C_n = 0 identically), so days_after >= 1 and the mean
        -- divisions are total. The 128-bit products follow the
        -- events_rfm decimal(38,0) policy.
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s
            FROM daily
        ),
        pref AS (
            SELECT day, n, s,
                   SUM(x) OVER (ORDER BY day
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS ps,
                   ROW_NUMBER() OVER (ORDER BY day) AS t
            FROM daily, tot
        ),
        c AS (
            SELECT day, n, s, ps, t,
                   CAST(CAST(n AS HUGEINT) * ps
                        - CAST(t AS HUGEINT) * s AS BIGINT) AS cusum
            FROM pref WHERE t < n
        )
        SELECT CAST(day AS BIGINT) AS cp_day,
               CAST(n AS BIGINT) AS n_days,
               CAST(s AS BIGINT) AS total_events,
               cusum AS cusum_cp,
               CAST(t AS BIGINT) AS days_before,
               CAST(100 * ps // t AS BIGINT) AS mean_before_x100,
               CAST(100 * (s - ps) // (n - t) AS BIGINT) AS mean_after_x100
        FROM c
        ORDER BY ABS(cusum) DESC, day
        LIMIT 1
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single level-shift estimate for the daily event-count series:
    the classic max-|CUSUM| changepoint statistic (Page 1954 /
    Pettitt's location form). With n days and grand total S, the
    cumulative deviation at day t is sum_{i<=t}(x_i - mean); scaling
    by n clears the 1/n fraction — C_t = n*prefix_t - t*S — so the
    whole statistic is EXACT integer arithmetic, bit-identical
    cross-engine, and the argmax day is the point where the series
    most decisively splits into a before-mean and an after-mean
    (reported as exact centi-event integers, 100*sum div days).
    This is the monitoring primitive behind "did traffic step-change,
    and when" — the complement of `ts_mad_anomaly`'s single-day
    outliers (a level SHIFT is invisible to per-day z/MAD tests).

    Exactness and totality: C_n = n*S - n*S = 0 identically, so the
    last day can never win argmax (ties break to the EARLIEST day and
    t < n rows always include a smaller-or-equal |C|) — it is
    excluded up front, making days_after >= 1 and both mean divisions
    total. The n*prefix product runs in decimal(38,0)/HUGEINT per the
    `events_rfm` 128-bit policy (int64 would cap at ~9e18 = n_days x
    total_events; 128-bit never wraps first).

    Plan/scale: ONE map-side-combined hash agg collapses the fact
    table to day cardinality; everything after (prefix window, 1-row
    tot broadcast, TakeOrdered limit 1) runs over the TINY day axis —
    the single-partition window is a deliberate tiny-axis choice,
    same as `orders_backlog`."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pref = daily.join(F.broadcast(tot)).select(
        "day",
        "n",
        "s",
        F.sum("x").over(w).alias("ps"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    c = pref.filter(F.col("t") < F.col("n")).select(
        "day",
        "n",
        "s",
        "ps",
        "t",
        F.expr(
            "CAST(CAST(n AS decimal(38,0)) * ps"
            " - CAST(t AS decimal(38,0)) * s AS BIGINT)"
        ).alias("cusum"),
    )
    return (
        c.select(
            F.col("day").cast("long").alias("cp_day"),
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("total_events"),
            F.col("cusum").alias("cusum_cp"),
            F.col("t").cast("long").alias("days_before"),
            F.expr("CAST(100 * ps div t AS BIGINT)").alias(
                "mean_before_x100"
            ),
            F.expr("CAST(100 * (s - ps) div (n - t) AS BIGINT)").alias(
                "mean_after_x100"
            ),
        )
        .orderBy(F.abs(F.col("cusum_cp")).desc(), "cp_day")
        .limit(1)
    )


# --------------------------------------------------------------------------
# ts_decompose — additive trend/seasonal/residual split (round 8)
# --------------------------------------------------------------------------

# Offset added before the per-dow mean's integer division so the
# numerator is always positive: Spark `div` and DuckDB `//` both
# truncate toward zero, but truncation and floor DIVERGE on negative
# operands, so any floor-semantics replayer (Python //, standard SQL
# FLOOR conventions) would disagree with the engines there. Shifting
# into positive territory makes all conventions coincide — the spec
# is unambiguous instead of engine-pair-specific. |detrended_x100| is
# bounded by 100*max_daily_count, so 1e9 clears any realistic series;
# the shift cancels exactly ((a + n*M) div n - M == floor(a/n) for
# a > -n*M).
_DECOMP_M = 1_000_000_000


@register(
    "ts_decompose",
    tags=("b11",),
    oracle=f"""
        -- classical additive decomposition of the daily event series:
        -- trend = centered 7-day moving average (full windows only),
        -- seasonal = per-day-of-week mean of the detrended series,
        -- residual = series - trend - seasonal. All three components
        -- in exact centi-events: the MA is (100*sum) div 7 over a
        -- 7-row frame, and the per-dow mean runs through a +{_DECOMP_M}
        -- shift so floor-vs-truncate integer division can't diverge
        -- on negative detrended values. The anomaly triage view:
        -- ts_mad_anomaly flags residual spikes, ts_changepoint moves
        -- the trend, this separates the two.
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        ma AS (
            SELECT day, x,
                   ROW_NUMBER() OVER (ORDER BY day) AS rk,
                   COUNT(*) OVER () AS n,
                   CAST(100 * SUM(x) OVER (ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) // 7
                        AS BIGINT) AS trend_x100
            FROM daily
        ),
        det AS (
            SELECT day, x, trend_x100,
                   (day + 4) % 7 AS dow,
                   100 * x - trend_x100 AS det_x100
            FROM ma WHERE rk > 3 AND rk <= n - 3
        ),
        seas AS (
            SELECT dow,
                   CAST(SUM(det_x100 + {_DECOMP_M}) // COUNT(*)
                        - {_DECOMP_M} AS BIGINT) AS seasonal_x100
            FROM det GROUP BY dow
        )
        SELECT CAST(det.day AS BIGINT) AS day, det.x,
               CAST(det.dow AS BIGINT) AS dow, det.trend_x100,
               seas.seasonal_x100,
               CAST(det.det_x100 - seas.seasonal_x100 AS BIGINT)
                   AS resid_x100
        FROM det JOIN seas ON det.dow = seas.dow
    """,
)
def ts_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily event-count
    series: trend (centered 7-day moving average), seasonal (per-
    day-of-week mean of the detrended series, epoch-Thursday dow
    convention), residual (what's left) — each in exact centi-event
    integers. This is the anomaly TRIAGE view the other ts operators
    feed on: `ts_mad_anomaly` flags residual spikes, `ts_changepoint`
    moves the trend, and a weekday dip is just the seasonal term —
    decomposing first stops each from masquerading as the others.

    Exactness: the MA is (100·Σx) div 7 over a full 7-row frame
    (edge days with partial frames are excluded — a 4-day "average"
    biases the trend); the per-dow mean shifts its numerator by +{M}
    before the integer division: the engines both truncate toward
    zero, but truncation and floor diverge on negatives, so the shift
    moves the division into positive territory where EVERY convention
    coincides — the spec stays replayer-independent. The shift
    cancels exactly.

    Plan/scale: one map-side-combined fact→day agg; the MA window,
    dow agg, and final dow-keyed join all run over DAY/7 cardinality
    — tiny-axis work, same deliberate single-partition window as
    `orders_backlog`."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w_ma = Window.orderBy("day").rowsBetween(-3, 3)
    w_rk = Window.orderBy("day")
    w_all = Window.partitionBy()
    ma = daily.select(
        "day",
        "x",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.expr(
            "CAST(100 * sum(x) OVER (ORDER BY day "
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div 7 AS BIGINT)"
        ).alias("trend_x100"),
    )
    det = ma.filter(
        (F.col("rk") > 3) & (F.col("rk") <= F.col("n") - 3)
    ).select(
        "day",
        "x",
        ((F.col("day") + 4) % 7).alias("dow"),
        "trend_x100",
        (100 * F.col("x") - F.col("trend_x100")).alias("det_x100"),
    )
    seas = det.groupBy("dow").agg(
        F.expr(
            f"CAST(sum(det_x100 + {_DECOMP_M}) div count(*) "
            f"- {_DECOMP_M} AS BIGINT)"
        ).alias("seasonal_x100")
    )
    return det.join(seas, "dow").select(
        F.col("day").cast("long").alias("day"),
        "x",
        F.col("dow").cast("long").alias("dow"),
        "trend_x100",
        "seasonal_x100",
        (F.col("det_x100") - F.col("seasonal_x100"))
        .cast("long")
        .alias("resid_x100"),
    )


# --------------------------------------------------------------------------
# events_hazard_rate — discrete-time conversion hazard table (round 8)
# --------------------------------------------------------------------------


@register(
    "events_hazard_rate",
    tags=("b3",),
    oracle="""
        -- discrete-time hazard table for first purchase: for each day
        -- k since a user's first event, h(k) = P(convert on day k |
        -- still unconverted and still observed at k), with
        -- right-censoring at the observation end for never-converters
        -- — the life-table construction that makes "day-3 is where we
        -- lose people" a number instead of a guess. Unlike the
        -- Kaplan-Meier product (a float cascade), the hazard table is
        -- pure integer counts + one floor-div bp ratio per row —
        -- hash-exact, and S(k) is recoverable downstream.
        WITH d AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS day,
                   event_type
            FROM events
        ),
        obs AS (SELECT MAX(day) AS obs_end FROM d),
        u AS (
            SELECT user_id, MIN(day) AS first_day,
                   MIN(CASE WHEN event_type = 'purchase' THEN day END)
                       AS conv_day
            FROM d GROUP BY user_id
        ),
        per AS (
            SELECT CASE WHEN conv_day IS NOT NULL
                        THEN conv_day - first_day
                        ELSE obs.obs_end - first_day END AS k,
                   CASE WHEN conv_day IS NOT NULL THEN 1 ELSE 0 END
                       AS converted
            FROM u, obs
        ),
        hist AS (
            SELECT k,
                   CAST(SUM(converted) AS BIGINT) AS n_converted,
                   CAST(SUM(1 - converted) AS BIGINT) AS n_censored
            FROM per GROUP BY k
        )
        SELECT CAST(k AS BIGINT) AS k, 
               CAST(SUM(n_converted + n_censored) OVER (
                        ORDER BY k DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS n_at_risk,
               n_converted, n_censored,
               CAST(n_converted * 10000
                    // SUM(n_converted + n_censored) OVER (
                        ORDER BY k DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS hazard_bp
        FROM hist
    """,
)
def events_hazard_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time hazard table for first purchase: for each day k
    since a user's first event, h(k) = P(convert on day k | still
    unconverted and still observed at k), with RIGHT-CENSORING at the
    observation end for users who never convert — the life-table
    construction that turns "when do we lose people" into per-day
    numbers, and the honest way to use never-converters (dropping
    them biases conversion fast; counting them as failures biases it
    slow; censoring is the third option survival analysis exists
    for). The Kaplan-Meier curve is the cumulative product of
    (1 − h(k)) — deliberately NOT computed here, because a float
    product cascade is engine-order-dependent while this table is
    pure integer counts + one floor-div bp ratio per row, hash-exact,
    and S(k) is recoverable downstream to any precision.

    At-risk accounting: n_at_risk(k) = users whose conversion or
    censoring day is ≥ k — a single DESCENDING running sum over the
    (converted + censored) day histogram. A user converting on day k
    was at risk through k; a user censored at c was observed through
    c inclusive (the standard life-table convention).

    Plan/scale: one fact→(user) agg (map-side combined), a 1-row
    observation-end broadcast, then everything — histogram, suffix
    sums, ratios — runs over the DAYS-SINCE axis (≤ observation
    window length), the `orders_backlog` tiny-axis pattern."""
    ev = table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        "event_type",
    )
    obs = d.agg(F.max("day").alias("obs_end"))
    u = d.groupBy("user_id").agg(
        F.min("day").alias("first_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("day"))
        ).alias("conv_day"),
    )
    per = u.join(F.broadcast(obs)).select(
        F.when(
            F.col("conv_day").isNotNull(),
            F.col("conv_day") - F.col("first_day"),
        )
        .otherwise(F.col("obs_end") - F.col("first_day"))
        .alias("k"),
        F.col("conv_day").isNotNull().cast("int").alias("converted"),
    )
    hist = per.groupBy("k").agg(
        F.sum("converted").cast("long").alias("n_converted"),
        F.sum(1 - F.col("converted")).cast("long").alias("n_censored"),
    )
    w = (
        Window.orderBy(F.desc("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    at_risk = F.sum(F.col("n_converted") + F.col("n_censored")).over(w)
    return hist.select(
        F.col("k").cast("long").alias("k"),
        at_risk.cast("long").alias("n_at_risk"),
        "n_converted",
        "n_censored",
        F.expr(
            "CAST(n_converted * 10000 div (sum(n_converted + n_censored) "
            "OVER (ORDER BY k DESC ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW)) AS BIGINT)"
        ).alias("hazard_bp"),
    )


# --------------------------------------------------------------------------
# win_cusum_chart — one-sided CUSUM control chart (round 8)
# --------------------------------------------------------------------------

# x8 integer scaling: d8 = 8x - 4*med2 - mad4 is exactly
# 8*(x - median - MAD/2) — the classic CUSUM slack k = MAD/2 — and the
# alarm S8 > 10*mad4 is exactly S > 5*MAD. All int64.
_CUSUM_H_MAD4 = 10


# Shared CUSUM CTE chain (calibration + prefix + running-min):
# win_cusum_chart SELECTs the per-day chart from it;
# events_incidents re-aggregates the SAME chain into alarm islands
# (the _SQL_CC_CHAIN composition pattern).
_SQL_CUSUM_CHAIN = f"""

        -- one-sided upper CUSUM control chart per event series:
        -- S_t = max(0, S_t-1 + (x_t - median - MAD/2)) with alarm at
        -- 5*MAD — the ONLINE sequential detector (Page 1954) that
        -- catches small sustained upward shifts per-day tests miss
        -- (complement of ts_changepoint's retrospective argmax and
        -- ts_mad_anomaly's single-day spikes). The recursion is NOT
        -- window-expressible, but its closed form is:
        -- S_t = P_t - min(0, min_j<=t P_j) with P the prefix sum of
        -- deviations — two running windows. x8 integer scaling makes
        -- slack and threshold exact (d8 = 8x - 4*med2 - mad4; alarm
        -- S8 > {_CUSUM_H_MAD4}*mad4).
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY x, day) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM cell
        ),
        med AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                                 THEN x ELSE 0 END)
                        * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                               THEN 2 ELSE 1 END AS BIGINT) AS med2
            FROM r GROUP BY event_type
        ),
        dev AS (
            SELECT cell.event_type, day, x, med2,
                   ABS(2 * x - med2) AS dev2
            FROM cell JOIN med ON cell.event_type = med.event_type
        ),
        dr AS (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY dev2, day) AS rk,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM dev
        ),
        mad AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                                 THEN dev2 ELSE 0 END)
                        * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                               THEN 2 ELSE 1 END AS BIGINT) AS mad4
            FROM dr GROUP BY event_type
        ),
        p AS (
            SELECT dev.event_type, day, x, med2, mad4,
                   SUM(8 * x - 4 * med2 - mad4) OVER (
                       PARTITION BY dev.event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS p8
            FROM dev JOIN mad ON dev.event_type = mad.event_type
        ),
        q AS (
            SELECT *, MIN(p8) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS minp8
            FROM p
        )
"""


@register(
    "win_cusum_chart",
    tags=("b11",),
    oracle=f"""
        {_SQL_CUSUM_CHAIN}
        SELECT event_type, CAST(day AS BIGINT) AS day, x, mad4,
               CAST(p8 - LEAST(0, minp8) AS BIGINT) AS s8,
               CAST(p8 - LEAST(0, minp8)
                    > {_CUSUM_H_MAD4} * mad4 AS INT) AS alarm
        FROM q
    """,
)
def win_cusum_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided upper CUSUM control chart per event series: the
    ONLINE sequential detector (Page 1954) — S_t = max(0, S_{t-1} +
    (x_t − median − MAD/2)), alarm at 5·MAD — that catches small
    SUSTAINED upward shifts long before any single day trips a
    z/MAD test. Completes the monitoring triptych: `ts_mad_anomaly`
    flags single-day spikes, `ts_changepoint` locates one shift
    retrospectively, this one raises the alarm IN SEQUENCE, day by
    day, robust-calibrated off the same med2/mad4 integers.

    The max(0, ·) recursion is not window-expressible — but its
    closed form is: S_t = P_t − min(0, min_{j≤t} P_j), with P the
    prefix sum of slack-adjusted deviations. Two stacked running
    windows (a running sum, then a running min OVER it) replace the
    recursion exactly. x8 integer scaling (d8 = 8x − 4·med2 − mad4)
    makes the MAD/2 slack and the 5·MAD threshold exact int64 — no
    halves, no floats, no divisions at all.

    Plan/scale: the cell agg collapses facts map-side; the two
    calibration rollups and both running windows all key on
    event_type — after one shuffle, everything is partition-local
    over day cardinality, and per-series window state is O(1)."""
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    w_n = Window.partitionBy("event_type")
    r = cell.select(
        "event_type",
        "x",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("x", "day"))
        .alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med2_expr = (
        "CAST(sum(CASE WHEN rk = (n + 1) div 2 OR rk = n div 2 + 1 "
        "THEN {v} ELSE 0 END) "
        "* CASE WHEN (max(n) + 1) div 2 = max(n) div 2 + 1 "
        "THEN 2 ELSE 1 END AS BIGINT)"
    )
    med = r.groupBy("event_type").agg(
        F.expr(med2_expr.format(v="x")).alias("med2")
    )
    dev = cell.join(med, "event_type").select(
        "event_type",
        "day",
        "x",
        "med2",
        F.abs(2 * F.col("x") - F.col("med2")).alias("dev2"),
    )
    dr = dev.select(
        "event_type",
        "dev2",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("dev2", "day"))
        .alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    mad = dr.groupBy("event_type").agg(
        F.expr(med2_expr.format(v="dev2")).alias("mad4")
    )
    w8 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d8 = 8 * F.col("x") - 4 * F.col("med2") - F.col("mad4")
    p = dev.join(mad, "event_type").select(
        "event_type",
        "day",
        "x",
        "mad4",
        F.sum(d8).over(w8).alias("p8"),
    )
    p = p.select("*", F.min("p8").over(w8).alias("minp8"))
    s8 = F.col("p8") - F.least(F.lit(0), F.col("minp8"))
    return p.select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        "x",
        "mad4",
        s8.cast("long").alias("s8"),
        (s8 > _CUSUM_H_MAD4 * F.col("mad4")).cast("int").alias("alarm"),
    )


# --------------------------------------------------------------------------
# events_did — difference-in-differences estimator (round 8)
# --------------------------------------------------------------------------

# Pinned design: treatment = odd md5 bucket of user_id (deterministic
# pseudo-random assignment, the sample_hash family); post-period
# starts 2024-01-16 (epoch day 19738), the series midpoint.
_DID_POST_DAY = 19_738


@register(
    "events_did",
    tags=("b3",),
    oracle=f"""
        -- difference-in-differences on purchase value: the 2x2
        -- (treatment x period) cell means in exact centi-cents
        -- (sum*100 div n of integer cents), and the DiD estimate
        -- (T_post - T_pre) - (C_post - C_pre) — the causal-inference
        -- workhorse when randomization is per-USER but the outcome
        -- shifts over TIME (seasonality cancels in the control
        -- difference). Deterministic hash assignment makes the whole
        -- table a pure function of the data — rerunnable, auditable,
        -- engine-exact.
        WITH base AS (
            SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR),
                             1, 8))::BIGINT % 2 = 1
                        THEN 'treatment' ELSE 'control' END AS grp,
                   CASE WHEN epoch_us(ts) // 86400000000
                             >= {_DID_POST_DAY}
                        THEN 'post' ELSE 'pre' END AS period,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        cell AS (
            SELECT grp, period,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents,
                   CAST(SUM(cents) * 100 // COUNT(*) AS BIGINT)
                       AS mean_x100
            FROM base GROUP BY grp, period
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN grp = 'treatment' AND period = 'post'
                         THEN mean_x100 END) AS tp,
                MAX(CASE WHEN grp = 'treatment' AND period = 'pre'
                         THEN mean_x100 END) AS tr,
                MAX(CASE WHEN grp = 'control' AND period = 'post'
                         THEN mean_x100 END) AS cp,
                MAX(CASE WHEN grp = 'control' AND period = 'pre'
                         THEN mean_x100 END) AS cr
            FROM cell
        )
        SELECT cell.grp, cell.period, cell.n, cell.sum_cents,
               cell.mean_x100,
               CAST((wide.tp - wide.tr) - (wide.cp - wide.cr)
                    AS BIGINT) AS did_x100
        FROM cell, wide
    """,
)
def events_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on purchase value: the 2x2
    (treatment x period) design — treatment assigned by deterministic
    md5(user_id) parity, post-period from the series midpoint — with
    cell means in exact centi-cents and the DiD estimate
    (T_post − T_pre) − (C_post − C_pre) on every row. DiD is the
    causal-inference workhorse when assignment is per-USER but the
    outcome drifts over TIME: the control group's pre→post change
    absorbs seasonality/trend, so what survives the double
    difference is the treatment effect (under parallel trends —
    which `events_ab_test`'s simple lift silently assumes away).
    Deterministic hash assignment (the `sample_hash` family) makes
    the whole table a pure function of the data: rerunnable,
    auditable, engine-exact — no experiment framework state needed
    to reproduce the readout.

    Exactness: integer cents, mean = sum·100 div n (all cells
    non-empty by construction at every SF), DiD derived from the
    four integer means — no floats anywhere.

    Plan/scale: one filtered projection + one 4-cell hash agg
    (map-side combined); the 4-row pivot and the DiD broadcast are
    constant-size. Nothing scales with anything but the scan."""
    ev = table(spark, sf_dir, "events")
    base = ev.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.expr(
                "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT) % 2"
            )
            == 1,
            "treatment",
        )
        .otherwise("control")
        .alias("grp"),
        F.when(
            F.expr("unix_micros(ts) div 86400000000") >= _DID_POST_DAY,
            "post",
        )
        .otherwise("pre")
        .alias("period"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cell = base.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.expr("CAST(sum(cents) * 100 div count(*) AS BIGINT)").alias(
            "mean_x100"
        ),
    )
    wide = cell.agg(
        F.max(
            F.when(
                (F.col("grp") == "treatment") & (F.col("period") == "post"),
                F.col("mean_x100"),
            )
        ).alias("tp"),
        F.max(
            F.when(
                (F.col("grp") == "treatment") & (F.col("period") == "pre"),
                F.col("mean_x100"),
            )
        ).alias("tr"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "post"),
                F.col("mean_x100"),
            )
        ).alias("cp"),
        F.max(
            F.when(
                (F.col("grp") == "control") & (F.col("period") == "pre"),
                F.col("mean_x100"),
            )
        ).alias("cr"),
    )
    return cell.join(F.broadcast(wide)).select(
        "grp",
        "period",
        "n",
        "sum_cents",
        "mean_x100",
        (
            (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr"))
        )
        .cast("long")
        .alias("did_x100"),
    )


# --------------------------------------------------------------------------
# events_incidents — alarm stream → incident islands (round 8)
# --------------------------------------------------------------------------


@register(
    "events_incidents",
    tags=("b11",),
    oracle=f"""
        -- incident extraction over the CUSUM alarm stream: collapse
        -- consecutive alarm days per series into INCIDENTS (start,
        -- end, duration, peak severity) — what an on-call pager
        -- actually wants (one page per incident, not one per alarm
        -- day), and the flap-suppression step every alerting system
        -- ships. Islands via the day - ROW_NUMBER() constant-within-
        -- a-run trick (win_streak), over the SAME shared CUSUM chain
        -- the chart op certifies — incidents can't drift from alarms.
        {_SQL_CUSUM_CHAIN},
        alarms AS (
            SELECT event_type, day,
                   CAST(p8 - LEAST(0, minp8) AS BIGINT) AS s8
            FROM q WHERE p8 - LEAST(0, minp8) > 10 * mad4
        ),
        isl AS (
            SELECT event_type, day, s8,
                   day - ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY day) AS grp
            FROM alarms
        )
        SELECT event_type,
               CAST(MIN(day) AS BIGINT) AS start_day,
               CAST(MAX(day) AS BIGINT) AS end_day,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(MAX(s8) AS BIGINT) AS peak_s8
        FROM isl GROUP BY event_type, grp
    """,
)
def events_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident extraction over the CUSUM alarm stream: consecutive
    alarm days per series collapse into INCIDENTS with start/end,
    duration, and peak severity — what an on-call pager actually
    wants (one page per incident, not one per alarm day), and the
    flap-suppression step every alerting pipeline ships between
    detection and notification. Gaps-and-islands does the collapse:
    within a consecutive run, day − row_number() is constant
    (the `win_streak` trick), so one window + one agg per series
    turns the alarm stream into an incident table.

    Composition is literal (the `dedup_cluster_stats` pattern): the
    engine filters and re-aggregates the registered `win_cusum_chart`
    output UNCHANGED, and the oracle runs islands over the SAME
    shared CUSUM chain (`_SQL_CUSUM_CHAIN`) — incidents cannot drift
    from the alarms they summarize.

    Plan/scale: alarm rows are a tiny filtered slice of the
    day-cardinality chart; the island window and rollup key on
    event_type — everything past the chart's one fact shuffle is
    alarm-cardinality."""
    chart = win_cusum_chart(spark, sf_dir)
    alarms = chart.filter(F.col("alarm") == 1).select(
        "event_type", "day", "s8"
    )
    isl = alarms.select(
        "event_type",
        "day",
        "s8",
        (
            F.col("day")
            - F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")
            )
        ).alias("grp"),
    )
    return (
        isl.groupBy("event_type", "grp")
        .agg(
            F.min("day").cast("long").alias("start_day"),
            F.max("day").cast("long").alias("end_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.max("s8").cast("long").alias("peak_s8"),
        )
        .select("event_type", "start_day", "end_day", "n_days", "peak_s8")
    )


# --------------------------------------------------------------------------
# ts_densify — calendar gap-filling with imputation flags (round 8)
# --------------------------------------------------------------------------


@register(
    "ts_densify",
    tags=("b11",),
    oracle="""
        -- calendar densification: complete every (event_type, day)
        -- cell over each series' own [min_day, max_day] span,
        -- zero-filling missing days with an is_imputed marker — the
        -- prerequisite every downstream window op silently assumes
        -- (a 7-day moving average over a gappy series averages the
        -- wrong 7 days; ts_decompose, win_rolling_regression, and
        -- win_cusum_chart all index by ROW position). Spark generates
        -- the grid with sequence(); the oracle replays it with
        -- generate_series off the same per-series bounds.
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT event_type, MIN(day) AS lo, MAX(day) AS hi
            FROM cell GROUP BY event_type
        ),
        grid AS (
            SELECT event_type, UNNEST(generate_series(lo, hi)) AS day
            FROM span
        )
        SELECT g.event_type, CAST(g.day AS BIGINT) AS day,
               CAST(COALESCE(c.x, 0) AS BIGINT) AS x,
               CAST(c.x IS NULL AS INT) AS is_imputed
        FROM grid g
        LEFT JOIN cell c
          ON c.event_type = g.event_type AND c.day = g.day
    """,
)
def ts_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: complete every (event_type, day) cell
    over each series' own [min_day, max_day] span, zero-filling
    missing days and marking them ``is_imputed`` — the prerequisite
    every row-positional window op silently assumes (a "7-day" moving
    average over a gappy series averages the wrong 7 days;
    `ts_decompose` / `win_rolling_regression` / `win_cusum_chart`
    all index by ROW position, so gaps quietly stretch their
    frames). Densify first, and the imputation flag keeps zero-fill
    honest downstream (a zero-filled day in a MAD calibration is a
    choice, not an accident).

    Plan/scale: the fact table collapses to (type, day) map-side;
    per-series spans are a vocabulary-sized agg whose
    ``sequence(lo, hi)`` grid explodes inside codegen (rows =
    span-days x series — the DENSE axis, which is the output anyway)
    and left-joins the sparse cells on the (type, day) key. No
    per-day driver loop, no calendar table to maintain."""
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    span = cell.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    return grid.join(cell, ["event_type", "day"], "left").select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        F.col("x").isNull().cast("int").alias("is_imputed"),
    )


# --------------------------------------------------------------------------
# events_decay_attribution — time-decay credit histogram (round 8)
# --------------------------------------------------------------------------

# Exponential half-life of one day, window capped at 7 days: a click
# k days before the purchase earns 10^6 div 2^k ppm of raw credit.
_DECAY_MAX_DAYS = 7
_DECAY_PPM = 1_000_000


@register(
    "events_decay_attribution",
    tags=("b3",),
    oracle=f"""
        -- time-decay attribution calibration: every (click -> later
        -- purchase) pair within {_DECAY_MAX_DAYS} days, bucketed by
        -- age k in days, with exponential half-life-1-day credit
        -- {_DECAY_PPM} div 2^k ppm — the histogram that shows where
        -- decayed credit actually lands, read against
        -- events_attribution's winner-takes-all last touch and
        -- events_conversion_lag's p90 (if most credit lands at k=0-1,
        -- a long window only adds noise). Exact: day-integer ages,
        -- power-of-two divisions, integer credit sums.
        WITH p AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS pday
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, epoch_us(ts) // 86400000000 AS cday
            FROM events WHERE event_type = 'click'
        ),
        pair AS (
            SELECT p.pday - c.cday AS k
            FROM p JOIN c ON p.user_id = c.user_id
            WHERE p.pday - c.cday BETWEEN 0 AND {_DECAY_MAX_DAYS}
        ),
        hist AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(COUNT(*) * ({_DECAY_PPM} // POW(2, k)::BIGINT)
                        AS BIGINT) AS credit_ppm
            FROM pair GROUP BY k
        ),
        tot AS (SELECT CAST(SUM(credit_ppm) AS BIGINT) AS t FROM hist)
        SELECT CAST(k AS BIGINT) AS k, n_pairs, credit_ppm,
               CAST(credit_ppm * 10000 // tot.t AS BIGINT)
                   AS credit_share_bp
        FROM hist, tot
    """,
)
def events_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay attribution calibration: every click→purchase pair
    within {d} days (same user, click first), bucketed by age k, each
    pair earning exponential half-life-one-day credit ({ppm} div 2^k
    ppm). The output histogram shows WHERE decayed credit actually
    lands by age — the calibration read against
    `events_attribution`'s winner-takes-all last touch and
    `events_conversion_lag`'s p90: if ≥80% of credit sits at k ≤ 1,
    a long lookback window only adds noise to the model, and the
    marketing-mix debate settles on data instead of taste.

    Exactness: ages are integer day differences, the decay is a
    power-of-two integer division (no float exp), credit sums and
    the share bp are exact int64.

    Plan/scale: purchases and clicks collapse to (user, day)
    projections; ONE user-keyed equi join with the k-range residual
    (per-user width = that user's click×purchase days within a week
    — bounded by activity, the `events_conversion_lag` join shape),
    then day-axis-sized aggregation."""
    ev = table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", day.alias("pday")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", day.alias("cday")
    )
    pair = (
        p.join(c, "user_id")
        .select((F.col("pday") - F.col("cday")).alias("k"))
        .filter(F.col("k").between(0, _DECAY_MAX_DAYS))
    )
    hist = pair.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.expr(
            f"CAST(count(*) * ({_DECAY_PPM} div CAST(pow(2, k) AS BIGINT))"
            " AS BIGINT)"
        ).alias("credit_ppm"),
    )
    tot = hist.agg(F.sum("credit_ppm").cast("long").alias("t"))
    return hist.join(F.broadcast(tot)).select(
        F.col("k").cast("long").alias("k"),
        "n_pairs",
        "credit_ppm",
        F.expr("CAST(credit_ppm * 10000 div t AS BIGINT)").alias(
            "credit_share_bp"
        ),
    )


# --------------------------------------------------------------------------
# events_slo_burn — error-budget burn rate (round 8)
# --------------------------------------------------------------------------

# SLO: 99% of events succeed => error budget = 100 bp of traffic.
_SLO_BUDGET_BP = 100
_BURN_WINDOW = 7  # trailing days for the burn-rate reading


@register(
    "events_slo_burn",
    tags=("b11",),
    oracle=f"""
        -- SRE error-budget accounting against a 99%-success SLO: per
        -- day, the error rate, the trailing-{_BURN_WINDOW}-day burn
        -- RATE as a multiple of budget (x100: 100 = burning exactly
        -- at budget; 200 = 2x — the page threshold), and the
        -- cumulative share of the period's total budget already
        -- consumed. Pure integer cross-multiplications: burn_x100 =
        -- 100·10000·err_w div ({_SLO_BUDGET_BP}·tot_w).
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN event_type = 'error'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_errors
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT day, n_total, n_errors,
                   SUM(n_total) OVER tw AS tot_w,
                   SUM(n_errors) OVER tw AS err_w,
                   SUM(n_total) OVER cum AS tot_c,
                   SUM(n_errors) OVER cum AS err_c
            FROM d
            WINDOW tw AS (ORDER BY day
                          ROWS BETWEEN {_BURN_WINDOW - 1} PRECEDING
                               AND CURRENT ROW),
                   cum AS (ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
        )
        SELECT CAST(day AS BIGINT) AS day, n_total, n_errors,
               CAST(n_errors * 10000 // n_total AS BIGINT) AS err_bp,
               CAST(1000000 * err_w
                    // ({_SLO_BUDGET_BP} * tot_w) AS BIGINT)
                   AS burn_x100,
               CAST(1000000 * err_c
                    // ({_SLO_BUDGET_BP} * tot_c) AS BIGINT)
                   AS budget_used_x100,
               CAST(1000000 * err_w
                    > 2 * {_SLO_BUDGET_BP} * tot_w AS INT) AS page
        FROM w
    """,
)
def events_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget accounting against a 99%-success SLO: per day,
    the raw error rate, the trailing-{w}-day burn RATE as a multiple
    of budget (x100 — 100 means burning exactly at budget, 200 means
    the budget dies in half the period: the standard multiwindow
    page threshold from the Google SRE workbook), and the cumulative
    share of the period's budget already consumed. Error-budget math
    is how "five nines or four?" becomes an engineering dial instead
    of a slogan — and the burn MULTIPLE is what pages, because a raw
    error-rate threshold either flaps on quiet days or sleeps
    through slow leaks.

    Exactness: every output is a cross-multiplied integer —
    burn_x100 = 10^6·err_w div (budget_bp·tot_w) — no rate division
    ever happens in float, and the page flag is an exact integer
    comparison (strictly above 2x budget).

    Plan/scale: the fact table collapses to the day axis map-side;
    both running windows share one tiny-axis sort (the
    `orders_backlog` deliberate single-partition choice)."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("n_errors"),
    )
    tw = (
        Window.orderBy("day")
        .rowsBetween(-(_BURN_WINDOW - 1), Window.currentRow)
    )
    cum = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w = d.select(
        "day",
        "n_total",
        "n_errors",
        F.sum("n_total").over(tw).alias("tot_w"),
        F.sum("n_errors").over(tw).alias("err_w"),
        F.sum("n_total").over(cum).alias("tot_c"),
        F.sum("n_errors").over(cum).alias("err_c"),
    )
    return w.select(
        F.col("day").cast("long").alias("day"),
        "n_total",
        "n_errors",
        F.expr("CAST(n_errors * 10000 div n_total AS BIGINT)").alias(
            "err_bp"
        ),
        F.expr(
            f"CAST(1000000 * err_w div ({_SLO_BUDGET_BP} * tot_w)"
            " AS BIGINT)"
        ).alias("burn_x100"),
        F.expr(
            f"CAST(1000000 * err_c div ({_SLO_BUDGET_BP} * tot_c)"
            " AS BIGINT)"
        ).alias("budget_used_x100"),
        F.expr(
            f"CAST(1000000 * err_w > 2 * {_SLO_BUDGET_BP} * tot_w"
            " AS INT)"
        ).alias("page"),
    )


# --------------------------------------------------------------------------
# events_bot_flags — composite automation screen (round 8)
# --------------------------------------------------------------------------

# Rule thresholds (all exact integer tests):
#   clockwork: median inter-arrival gap under 60s across >= 50 events
#   always_on: active in >= 20 distinct hours-of-day
#   nocturnal: > 40% of events between 00:00 and 05:59 UTC
_BOT_MIN_EVENTS = 50
_BOT_GAP_US = 60_000_000
_BOT_HOURS = 20
_BOT_NIGHT_BP = 4_000


@register(
    "events_bot_flags",
    tags=("b3",),
    oracle=f"""
        -- composite automation screen per user: three independent
        -- integer rules — CLOCKWORK (median gap < 60s over >= {_BOT_MIN_EVENTS}
        -- events: humans don't act on a metronome), ALWAYS_ON
        -- (>= {_BOT_HOURS} distinct active hours-of-day: humans
        -- sleep), NOCTURNAL (> 40% of traffic 00-05 UTC) — OR-ed into
        -- a bot flag. Rules beat a single score because each flag
        -- names its evidence (the med2 doubled-median policy keeps
        -- the gap test exact).
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS ts_us,
                   (epoch_us(ts) // 3600000000) % 24 AS hod
            FROM events
        ),
        gaps AS (
            SELECT user_id,
                   ts_us - LAG(ts_us) OVER (
                       PARTITION BY user_id ORDER BY ts_us) AS gap
            FROM g
        ),
        r AS (
            SELECT user_id, gap,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY gap) AS rk,
                   COUNT(*) OVER (PARTITION BY user_id) AS n
            FROM gaps WHERE gap IS NOT NULL
        ),
        med AS (
            SELECT user_id,
                   CAST(SUM(CASE WHEN rk = (n + 1) // 2 OR rk = n // 2 + 1
                                 THEN gap ELSE 0 END)
                        * CASE WHEN (MAX(n) + 1) // 2 = MAX(n) // 2 + 1
                               THEN 2 ELSE 1 END AS BIGINT) AS med2_gap
            FROM r GROUP BY user_id
        ),
        act AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT hod) AS BIGINT) AS active_hours,
                   CAST(SUM(CASE WHEN hod < 6 THEN 1 ELSE 0 END)
                        * 10000 // COUNT(*) AS BIGINT) AS night_bp
            FROM g GROUP BY user_id
        )
        SELECT act.user_id, act.n_events, act.active_hours,
               act.night_bp, med.med2_gap,
               CAST(act.n_events >= {_BOT_MIN_EVENTS}
                    AND med.med2_gap < 2 * {_BOT_GAP_US} AS INT)
                   AS clockwork,
               CAST(act.active_hours >= {_BOT_HOURS} AS INT)
                   AS always_on,
               CAST(act.night_bp > {_BOT_NIGHT_BP} AS INT) AS nocturnal,
               CAST((act.n_events >= {_BOT_MIN_EVENTS}
                     AND med.med2_gap < 2 * {_BOT_GAP_US})
                    OR act.active_hours >= {_BOT_HOURS}
                    OR act.night_bp > {_BOT_NIGHT_BP} AS INT) AS is_bot
        FROM act JOIN med ON med.user_id = act.user_id
    """,
)
def events_bot_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite automation screen per user: three independent
    integer rules — CLOCKWORK (median inter-arrival gap under 60s
    across ≥{n} events: humans don't act on a metronome), ALWAYS_ON
    (active in ≥{h} distinct hours of the day: humans sleep),
    NOCTURNAL (>40% of traffic between 00:00–05:59 UTC) — OR-ed into
    an ``is_bot`` flag with every sub-flag and its evidence columns
    exposed. Named rules beat one opaque score in a fraud screen
    because each positive names WHAT fired and the threshold it
    cleared — the difference between an appealable decision and a
    black box. Downstream, `dedup_clusters`-style removal of flagged
    users is what keeps `events_markov` / `events_funnel` /
    `events_retention` describing humans.

    Exactness: the gap median uses the doubled-integer policy
    (med2 < 2·threshold), hour buckets are integer epoch arithmetic,
    the night share is a floor-div bp — no floats.

    Plan/scale: ONE (user, ts) sort serves the lag window; the gap
    median rank window and both per-user rollups key on user_id —
    everything after the first shuffle is partition-local, per-user
    state bounded by that user's events."""
    ev = table(spark, sf_dir, "events")
    g = ev.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("ts_us"),
        F.expr("(unix_micros(ts) div 3600000000) % 24").alias("hod"),
    )
    w_lag = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = g.select(
        "user_id",
        (F.col("ts_us") - F.lag("ts_us").over(w_lag)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    w_rk = Window.partitionBy("user_id").orderBy("gap")
    w_n = Window.partitionBy("user_id")
    r = gaps.select(
        "user_id",
        "gap",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    med = r.groupBy("user_id").agg(
        F.expr(
            "CAST(sum(CASE WHEN rk = (n + 1) div 2 OR rk = n div 2 + 1 "
            "THEN gap ELSE 0 END) "
            "* CASE WHEN (max(n) + 1) div 2 = max(n) div 2 + 1 "
            "THEN 2 ELSE 1 END AS BIGINT)"
        ).alias("med2_gap")
    )
    act = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("hod").cast("long").alias("active_hours"),
        F.expr(
            "CAST(sum(CASE WHEN hod < 6 THEN 1 ELSE 0 END) * 10000 "
            "div count(*) AS BIGINT)"
        ).alias("night_bp"),
    )
    j = act.join(med, "user_id")
    clockwork = (F.col("n_events") >= _BOT_MIN_EVENTS) & (
        F.col("med2_gap") < 2 * _BOT_GAP_US
    )
    always_on = F.col("active_hours") >= _BOT_HOURS
    nocturnal = F.col("night_bp") > _BOT_NIGHT_BP
    return j.select(
        "user_id",
        "n_events",
        "active_hours",
        "night_bp",
        "med2_gap",
        clockwork.cast("int").alias("clockwork"),
        always_on.cast("int").alias("always_on"),
        nocturnal.cast("int").alias("nocturnal"),
        (clockwork | always_on | nocturnal).cast("int").alias("is_bot"),
    )


# --------------------------------------------------------------------------
# events_srm_check — sample-ratio-mismatch guardrail (round 8)
# --------------------------------------------------------------------------

# chi-square critical value at alpha=0.05, 1 dof, scaled x10000:
# flag iff 10000 * (na - nb)^2 > 38415 * (na + nb) — the exact
# cross-multiplied form of (na-nb)^2/(na+nb) > 3.8415.
_SRM_CRIT_X10000 = 38_415


@register(
    "events_srm_check",
    tags=("b3",),
    oracle=f"""
        -- Sample Ratio Mismatch guardrail for the A/B split: under
        -- the 50/50 user_id-parity assignment events_ab_test uses,
        -- the unit-count chi-square is (na-nb)^2/(na+nb); a
        -- significant mismatch means the ASSIGNMENT is broken
        -- (logging loss, bot skew, redirect bugs) and every lift
        -- readout downstream is invalid — the first check an
        -- experimentation platform runs, per day and overall. Exact
        -- cross-multiplied test: 10^4*(na-nb)^2 > {_SRM_CRIT_X10000}*(na+nb).
        WITH d AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(SUM(CASE WHEN user_id % 2 = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(SUM(CASE WHEN user_id % 2 = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS nb
            FROM events GROUP BY 1
        )
        SELECT CAST(day AS BIGINT) AS day, na, nb,
               CAST((na - nb) * (na - nb) * 10000
                    // (na + nb) AS BIGINT) AS chi2_x10000,
               CAST(10000 * (na - nb) * (na - nb)
                    > {_SRM_CRIT_X10000} * (na + nb) AS INT) AS srm_flag
        FROM d
    """,
)
def events_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample Ratio Mismatch guardrail for the A/B split: under the
    50/50 user_id-parity assignment `events_ab_test` uses, the daily
    unit counts should be statistically even; the 1-dof chi-square
    (na−nb)²/(na+nb) against the 0.05 critical value flags days
    where they aren't. SRM is THE most-cited silent killer of A/B
    results — a significant mismatch means the ASSIGNMENT mechanism
    is broken (logging loss, bot traffic skewing one arm, redirect
    bugs), and every lift readout downstream is invalid no matter
    how significant it looks — so the platform runs this check
    before anyone reads `events_ab_test` or `events_did`.

    Exactness: the test runs entirely cross-multiplied in int64 —
    10⁴·(na−nb)² > {c}·(na+nb) — and chi2_x10000 is the floor-scaled
    statistic; no float chi-square anywhere. (na−nb)² caps at
    traffic², so int64 holds to ~3e9 events/day; past that the
    events_rfm decimal policy applies.

    Plan/scale: one map-side-combined fact→day agg; everything else
    is day-axis arithmetic."""
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.sum((F.col("user_id") % 2 == 0).cast("long"))
        .cast("long")
        .alias("na"),
        F.sum((F.col("user_id") % 2 == 1).cast("long"))
        .cast("long")
        .alias("nb"),
    )
    return d.select(
        F.col("day").cast("long").alias("day"),
        "na",
        "nb",
        F.expr(
            "CAST((na - nb) * (na - nb) * 10000 div (na + nb) AS BIGINT)"
        ).alias("chi2_x10000"),
        F.expr(
            f"CAST(10000 * (na - nb) * (na - nb)"
            f" > {_SRM_CRIT_X10000} * (na + nb) AS INT)"
        ).alias("srm_flag"),
    )


# --------------------------------------------------------------------------
# events_growth_accounting — MAU waterfall decomposition (round 8)
# --------------------------------------------------------------------------


@register(
    "events_growth_accounting",
    tags=("b3",),
    oracle="""
        -- growth accounting: each month's active users decompose into
        -- NEW (first month ever), RETAINED (also active last month),
        -- RESURRECTED (active before, but not last month), with
        -- CHURNED = last month's actives who went dark — the identity
        -- mau = new + retained + resurrected holds exactly, and
        -- net = mau - prev_mau = new + resurrected - churned. This
        -- is the standard growth-accounting waterfall: "MAU is up"
        -- means nothing until you know whether churn fell or
        -- resurrection spiked.
        WITH um AS (
            SELECT DISTINCT user_id,
                   (year(ts) * 12 + month(ts) - 1) AS mo
            FROM events
        ),
        f AS (
            SELECT user_id, mo,
                   MIN(mo) OVER (PARTITION BY user_id) AS first_mo,
                   LAG(mo) OVER (PARTITION BY user_id ORDER BY mo)
                       AS prev_active_mo
            FROM um
        ),
        cls AS (
            SELECT mo,
                   CAST(SUM(CASE WHEN mo = first_mo
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
                   CAST(SUM(CASE WHEN mo > first_mo
                                 AND prev_active_mo = mo - 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_retained,
                   CAST(SUM(CASE WHEN mo > first_mo
                                 AND prev_active_mo < mo - 1
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_resurrected,
                   CAST(COUNT(*) AS BIGINT) AS mau
            FROM f GROUP BY mo
        ),
        ch AS (
            SELECT mo + 1 AS mo, CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM (
                SELECT user_id, mo,
                       LEAD(mo) OVER (PARTITION BY user_id ORDER BY mo)
                           AS next_mo
                FROM um
            )
            WHERE next_mo IS NULL OR next_mo > mo + 1
            GROUP BY mo + 1
        )
        SELECT CAST(cls.mo AS BIGINT) AS mo, cls.mau, cls.n_new,
               cls.n_retained, cls.n_resurrected,
               CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
        FROM cls LEFT JOIN ch ON ch.mo = cls.mo
    """,
)
def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting waterfall: each month's active users
    decompose into NEW (first month ever), RETAINED (also active the
    previous month), and RESURRECTED (active before, but skipped last
    month), with CHURNED = the previous month's actives who went
    dark. Two identities hold EXACTLY and are the point:
    mau = new + retained + resurrected, and net MoM growth =
    new + resurrected − churned — "MAU is up" means nothing until
    you know whether churn fell or resurrection spiked, and this
    table is how consumer growth teams (the a16z/Social Capital
    growth-accounting standard) tell the difference.

    Plan/scale: the fact table collapses to DISTINCT (user, month)
    map-side; first-month, prev-month, and next-month all ride ONE
    user-keyed sort (three window functions, same partitioning); the
    month rollup and the churn-offset join are month-axis tiny."""
    ev = table(spark, sf_dir, "events")
    um = ev.select(
        "user_id",
        (F.year("ts") * 12 + F.month("ts") - 1).alias("mo"),
    ).distinct()
    w_u = Window.partitionBy("user_id")
    w_seq = Window.partitionBy("user_id").orderBy("mo")
    f = um.select(
        "user_id",
        "mo",
        F.min("mo").over(w_u).alias("first_mo"),
        F.lag("mo").over(w_seq).alias("prev_active_mo"),
        F.lead("mo").over(w_seq).alias("next_mo"),
    )
    cls = f.groupBy("mo").agg(
        F.count(F.lit(1)).cast("long").alias("mau"),
        F.sum((F.col("mo") == F.col("first_mo")).cast("long"))
        .cast("long")
        .alias("n_new"),
        F.sum(
            (
                (F.col("mo") > F.col("first_mo"))
                & (F.col("prev_active_mo") == F.col("mo") - 1)
            ).cast("long")
        )
        .cast("long")
        .alias("n_retained"),
        F.sum(
            (
                (F.col("mo") > F.col("first_mo"))
                & (F.col("prev_active_mo") < F.col("mo") - 1)
            ).cast("long")
        )
        .cast("long")
        .alias("n_resurrected"),
    )
    ch = (
        f.filter(
            F.col("next_mo").isNull() | (F.col("next_mo") > F.col("mo") + 1)
        )
        .groupBy((F.col("mo") + 1).alias("mo"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return cls.join(ch, "mo", "left").select(
        F.col("mo").cast("long").alias("mo"),
        "mau",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
    )


# --------------------------------------------------------------------------
# events_cuped — CUPED variance-reduced A/B means (round 8)
# --------------------------------------------------------------------------


@register(
    "events_cuped",
    tags=("b3",),
    oracle=f"""
        -- CUPED (Deng et al. 2013): adjust each variant's post-period
        -- purchase mean by theta * (pre-period deviation), theta =
        -- pooled Cov(pre, post)/Var(pre) — the industry-standard
        -- variance-reduction that lets the same traffic detect ~2x
        -- smaller effects. Pre/post split at the events_did midpoint;
        -- variant = the events_ab_test user parity. All sums are
        -- exact integer cents; theta and the adjusted means derive
        -- from those integers with a FIXED IEEE expression tree
        -- (agg_regression policy) — bit-identical cross-engine.
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 AS INT) AS variant,
                   CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000
                                      < {_DID_POST_DAY}
                                 THEN CAST(ROUND(value * 100, 0)
                                           AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000
                                      >= {_DID_POST_DAY}
                                 THEN CAST(ROUND(value * 100, 0)
                                           AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS y
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        pool AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                   CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
            FROM u
        ),
        v AS (
            SELECT variant,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y
            FROM u GROUP BY variant
        )
        SELECT v.variant, v.n_users, v.sum_x, v.sum_y,
               CAST(pool.n * pool.sxy - pool.sx * pool.sy AS DOUBLE)
                   / CAST(pool.n * pool.sxx - pool.sx * pool.sx
                          AS DOUBLE) AS theta,
               CAST(v.sum_y AS DOUBLE) / v.n_users AS mean_y,
               CAST(v.sum_y AS DOUBLE) / v.n_users
               - (CAST(pool.n * pool.sxy - pool.sx * pool.sy AS DOUBLE)
                  / CAST(pool.n * pool.sxx - pool.sx * pool.sx
                         AS DOUBLE))
                 * (CAST(v.sum_x AS DOUBLE) / v.n_users
                    - CAST(pool.sx AS DOUBLE) / CAST(pool.n AS DOUBLE))
                   AS adj_mean_y
        FROM v, pool
    """,
)
def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): each
    variant's post-period purchase mean is adjusted by
    θ·(pre-period deviation from the pooled pre-mean), with θ =
    pooled Cov(pre, post)/Var(pre). CUPED is the industry-standard
    experimentation upgrade — pre-period behavior explains much of
    the outcome variance, and removing it lets the same traffic
    detect roughly √(1−ρ²)-smaller effects — and it composes the
    engine's experiment family: `events_srm_check` validates the
    split, `events_ab_test` reads the raw lift, this reads the
    variance-reduced one, `events_did` handles the time axis.

    Determinism (the `agg_regression` policy): every sum is an exact
    integer (cents, 128-bit co-moments); θ and the adjusted means
    derive from those integers through a FIXED IEEE expression tree
    — each division and multiply correctly rounded, identical
    structure on both engines, so the doubles are bit-identical with
    no tolerance anywhere.

    Plan/scale: one fact→user agg (map-side), a 1-row pooled
    co-moment broadcast, a 2-row variant rollup."""
    ev = table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(day < _DID_POST_DAY, cents).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(day >= _DID_POST_DAY, cents).otherwise(0))
            .cast("long")
            .alias("y"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"), "x", "y"
        )
    )
    pool = u.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(x AS decimal(38,0)) * y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.expr("CAST(x AS decimal(38,0)) * x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("sum_x"),
        F.sum("y").cast("long").alias("sum_y"),
    )
    theta = F.expr(
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(n * sxx - sx * sx AS DOUBLE)"
    )
    mean_y = F.expr("CAST(sum_y AS DOUBLE) / n_users")
    adj = F.expr(
        "CAST(sum_y AS DOUBLE) / n_users"
        " - (CAST(n * sxy - sx * sy AS DOUBLE)"
        "    / CAST(n * sxx - sx * sx AS DOUBLE))"
        "   * (CAST(sum_x AS DOUBLE) / n_users"
        "      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    )
    return v.join(F.broadcast(pool)).select(
        "variant",
        "n_users",
        "sum_x",
        "sum_y",
        theta.alias("theta"),
        mean_y.alias("mean_y"),
        adj.alias("adj_mean_y"),
    )


# --------------------------------------------------------------------------
# events_mann_whitney — rank-sum nonparametric A/B test (round 8)
# --------------------------------------------------------------------------


@register(
    "events_mann_whitney",
    tags=("b3",),
    oracle="""
        -- Mann-Whitney U on purchase values by variant: the
        -- NONPARAMETRIC A/B test — rank-based, so one whale order
        -- can't buy significance the way it can under a t-test on
        -- heavy-tailed revenue. Doubled midranks keep ties exact
        -- (midrank2 = 2a + cnt - 1 for a tie group occupying ranks
        -- [a, a+cnt-1]); U2 = 2U = R2_A - nA(nA+1); the normal-
        -- approx significance runs fully cross-multiplied:
        -- z^2 > 3.8415  <=>  3*10^4*(U2-nA*nB)^2 >
        -- 38415*nA*nB*(n+1)  (no tie-variance correction — the
        -- documented, conservative-on-cents convention).
        WITH p AS (
            SELECT CAST(user_id % 2 AS INT) AS variant,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT variant, cents,
                   RANK() OVER (ORDER BY cents) AS a,
                   COUNT(*) OVER (PARTITION BY cents) AS cnt
            FROM p
        ),
        s AS (
            SELECT
                CAST(SUM(CASE WHEN variant = 0
                              THEN 2 * a + cnt - 1 ELSE 0 END)
                     AS HUGEINT) AS r2a,
                CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                     AS HUGEINT) AS na,
                CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                     AS HUGEINT) AS nb
            FROM r
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
               CAST((r2a - na * (na + 1)) - na * nb AS BIGINT)
                   AS u2_centered,
               CAST(3 * 10000
                    * ((r2a - na * (na + 1)) - na * nb)
                    * ((r2a - na * (na + 1)) - na * nb)
                    > 38415 * na * nb * (na + nb + 1) AS INT)
                   AS significant
        FROM s
    """,
)
def events_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test on purchase values by variant — the
    NONPARAMETRIC A/B read: rank-based, so a single whale order
    cannot buy significance the way it can under a t-test on
    heavy-tailed revenue (the reason experimentation platforms run
    rank tests beside the mean test; `events_ab_test` gives the
    lift, this says whether the DISTRIBUTIONS differ). Completes the
    experiment family: SRM validates the split, CUPED shrinks the
    variance, DiD handles time, U handles tails.

    Exactness: ties use DOUBLED midranks (a tie group occupying
    ranks [a, a+cnt−1] contributes midrank2 = 2a + cnt − 1 per row —
    integer, the med2 policy for ranks); U2 = 2U stays integer; and
    the normal-approximation significance test is fully
    cross-multiplied — 3·10⁴·(U2 − nAnB)² > 38415·nAnB·(n+1) is
    exactly z² > 3.8415 with no square root and no float, 128-bit
    intermediates. No tie-variance correction, by documented
    convention (conservative; cents values rarely tie).

    Plan/scale: the `events_ks_test` framing — the ONLY row-volume
    shuffle is a map-side-combined groupBy on cents (distinct-value
    cardinality, bounded by the price domain, NOT row cardinality);
    the rank window then runs over that bounded support table. Ranks
    are exactly derivable from the support rollup: a tie group at
    value c with tot ties starting at rank a = 1 + (rows below c)
    contributes doubled midrank 2a + tot − 1 = 2·cum − tot + 1 per
    row, where cum is the inclusive running total — so R2_A is a
    weighted sum over the support, never a per-row rank."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    c = p.groupBy("cents").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("a_cnt"),
        F.sum((F.col("variant") == 1).cast("long")).alias("b_cnt"),
    )
    w = c.select(
        "a_cnt",
        "b_cnt",
        (F.col("a_cnt") + F.col("b_cnt")).alias("tot"),
        F.sum(F.col("a_cnt") + F.col("b_cnt"))
        .over(Window.orderBy("cents"))
        .alias("cum"),
    )
    # doubled midrank per tied row = 2*cum - tot + 1 (integer, exact)
    s = w.agg(
        F.sum(
            F.col("a_cnt") * (2 * F.col("cum") - F.col("tot") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2a"),
        F.sum("a_cnt").cast("decimal(38,0)").alias("na"),
        F.sum("b_cnt").cast("decimal(38,0)").alias("nb"),
    )
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr("CAST(r2a - na * (na + 1) AS BIGINT)").alias("u2_a"),
        F.expr(
            "CAST((r2a - na * (na + 1)) - na * nb AS BIGINT)"
        ).alias("u2_centered"),
        F.expr(
            "CAST(3 * 10000"
            " * ((r2a - na * (na + 1)) - na * nb)"
            " * ((r2a - na * (na + 1)) - na * nb)"
            " > 38415 * na * nb * (na + nb + 1) AS INT)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# events_ks_test — exact two-sample Kolmogorov–Smirnov by variant (round 8)
# --------------------------------------------------------------------------


@register(
    "events_ks_test",
    tags=("b3",),
    oracle="""
        -- Two-sample Kolmogorov-Smirnov on purchase values by variant:
        -- the DISTRIBUTION-SHAPE A/B test. Mann-Whitney reads a
        -- location shift; KS reads ANY divergence between the two
        -- empirical CDFs (tails, variance, bimodality), which is why
        -- experiment platforms run both. Fully integer: with
        -- per-value cumulative counts ca/cb and arm sizes na/nb,
        -- D = max|ca/na - cb/nb| = max|ca*nb - cb*na| / (na*nb), kept
        -- as the scaled integer d_scaled = D*na*nb; the alpha=0.05
        -- asymptotic test D > 1.358*sqrt((na+nb)/(na*nb)) is
        -- cross-multiplied square-free:
        --   10^6 * d_scaled^2 > 1844164 * na*nb*(na+nb)
        -- (1.358^2 = 1.844164) -- no sqrt, no float, 128-bit.
        WITH p AS (
            SELECT CAST(user_id % 2 AS INT) AS variant,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT cents,
                   SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS a,
                   SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS b
            FROM p GROUP BY cents
        ),
        w AS (
            SELECT CAST(SUM(a) OVER (ORDER BY cents) AS HUGEINT) AS ca,
                   CAST(SUM(b) OVER (ORDER BY cents) AS HUGEINT) AS cb,
                   CAST(SUM(a) OVER () AS HUGEINT) AS na,
                   CAST(SUM(b) OVER () AS HUGEINT) AS nb
            FROM c
        ),
        d AS (
            SELECT MAX(ABS(ca * nb - cb * na)) AS ds,
                   MAX(na) AS na, MAX(nb) AS nb
            FROM w
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               CAST(ds AS BIGINT) AS d_scaled,
               CAST(1000000 * ds * ds
                    > 1844164 * na * nb * (na + nb) AS INT)
                   AS significant
        FROM d
    """,
)
def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test on purchase values by
    variant — the DISTRIBUTION-SHAPE A/B read completing the
    experiment family: `events_ab_test` reads the mean lift,
    `events_mann_whitney` a location shift; KS flags ANY divergence
    between the two empirical CDFs (tail weight, variance,
    bimodality) — the test that catches "same average, different
    customers".

    Exactness: D = max|F_A − F_B| is carried as the scaled integer
    d_scaled = D·nA·nB = max|ca·nb − cb·na| over per-value cumulative
    counts — exact, no division. The α=0.05 asymptotic decision
    D > 1.358·√((nA+nB)/(nA·nB)) is squared and cross-multiplied:
    10⁶·d_scaled² > 1844164·nA·nB·(nA+nB) — no sqrt, no float.
    128-bit envelope (the `events_mann_whitney` convention): exact
    through per-arm n ≲ 10⁸; beyond that the comparison needs the
    same decimal-splitting treatment as the repo's HUGEINT notes.

    Plan/scale: the shuffle is ONE map-side-combined groupBy on cents
    (distinct-value cardinality, bounded by the price domain — NOT
    row cardinality); the CDF windows then run over that bounded
    support, the established exact-order-statistic framing."""
    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    c = p.groupBy("cents").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("a"),
        F.sum((F.col("variant") == 1).cast("long")).alias("b"),
    )
    w = c.select(
        F.sum("a")
        .over(Window.orderBy("cents"))
        .cast("decimal(38,0)")
        .alias("ca"),
        F.sum("b")
        .over(Window.orderBy("cents"))
        .cast("decimal(38,0)")
        .alias("cb"),
        F.sum("a").over(Window.partitionBy()).cast("decimal(38,0)").alias("na"),
        F.sum("b").over(Window.partitionBy()).cast("decimal(38,0)").alias("nb"),
    )
    d = w.agg(
        F.max(F.expr("abs(ca * nb - cb * na)")).alias("ds"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return d.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.col("ds").cast("long").alias("d_scaled"),
        F.expr(
            "CAST(1000000 * ds * ds"
            " > 1844164 * na * nb * (na + nb) AS INT)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# ts_cross_correlation — lead/lag correlation between two series (round 8)
# --------------------------------------------------------------------------


@register(
    "ts_cross_correlation",
    tags=("b6",),
    oracle="""
        -- Cross-correlation function between daily VIEW volume and
        -- daily PURCHASE volume at lags -3..+3: the lead-lag detector
        -- ("views today predict purchases in k days") behind demand
        -- forecasting features and marketing-lag attribution. The
        -- agg_corr policy per lag: exact integer co-moments (counts
        -- are integers; sums 128-bit), then ONE IEEE-exact derivation
        -- (cast/mul/div/sqrt are correctly rounded on both engines) --
        -- bit-identical doubles, no rounding grid.
        WITH daily AS (
            SELECT epoch_us(ts) // 86400000000 AS day,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS x,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS y
            FROM events GROUP BY 1
        ),
        j AS (
            SELECT l.lag AS lag, a.x AS x, b.y AS y
            FROM daily a
            CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) l
            JOIN daily b ON b.day = a.day + l.lag
        ),
        m AS (
            SELECT lag,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(x) AS HUGEINT) AS sx,
                   CAST(SUM(y) AS HUGEINT) AS sy,
                   CAST(SUM(x * y) AS HUGEINT) AS sxy,
                   CAST(SUM(x * x) AS HUGEINT) AS sxx,
                   CAST(SUM(y * y) AS HUGEINT) AS syy
            FROM j GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n_days,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS xcorr
        FROM m
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function (CCF) between daily view volume and
    daily purchase volume at lags −3..+3 — the lead-lag detector
    behind "views today predict purchases in k days": the argmax lag
    is the conversion latency to build forecast features on, and a
    flat CCF says the series don't couple. Completes the time-series
    family: `ts_autocorr` reads a series against itself, this reads
    one series against another.

    Exactness — the `agg_corr` policy per lag: daily counts are
    integers, so all six co-moment sums are exact decimal(38,0); each
    lag's Pearson r derives from those identical integers with
    IEEE-exact ops only (cast/mul/div/sqrt, correctly rounded on both
    engines) — bit-identical doubles, no ROUND grid.

    Plan/scale: facts collapse map-side to (day, x, y) — date
    cardinality, not row cardinality; the 7-lag spine is an explode
    (×7 of the TINY daily table, never a cartesian of facts); one
    equi-join on shifted day; ONE hash agg keyed on lag (7 groups)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("day")
    ).agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("y"),
    )
    xl = daily.select(
        "day", "x", F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("lag")
    ).withColumn("jday", F.col("day") + F.col("lag"))
    j = xl.join(
        daily.select(F.col("day").alias("jday"), "y"), "jday"
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(x AS decimal(38,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS decimal(38,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS decimal(38,0)) * y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = (n * sxy - sx * sy).cast("double")
    denx = (n * sxx - sx * sx).cast("double")
    deny = (n * syy - sy * sy).cast("double")
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        n.cast("long").alias("n_days"),
        (num / F.sqrt(denx * deny)).alias("xcorr"),
    )


# --------------------------------------------------------------------------
# events_sample_size — Lehr's-rule A/B power planning (round 8)
# --------------------------------------------------------------------------


@register(
    "events_sample_size",
    tags=("b3",),
    oracle="""
        -- Sample-size planning per metric (Lehr's rule): n per arm =
        -- 16*sigma^2/delta^2 for 80% power at alpha=0.05 two-sided,
        -- with the MDE delta pinned at 5% of the metric mean. Fully
        -- integer: with exact cents moments, 16*sigma^2/delta^2 =
        -- 6400*n*(n*sxx - sx^2) / ((n-1)*sx^2), and the ceiling of
        -- that rational is (num + den - 1) // den -- no float until
        -- the reported mean (one IEEE-exact division, agg_corr
        -- policy).
        WITH m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                        AS HUGEINT) AS sx,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                            * CAST(ROUND(value * 100, 0) AS BIGINT))
                        AS HUGEINT) AS sxx
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_obs,
               CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                   AS mean_value,
               CAST((6400 * n * (n * sxx - sx * sx)
                     + (n - 1) * sx * sx - 1)
                    // ((n - 1) * sx * sx) AS BIGINT)
                   AS n_required
        FROM m
    """,
)
def events_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planning per event metric — Lehr's rule
    n/arm = 16σ²/δ² (80% power, α=0.05 two-sided) with the minimum
    detectable effect pinned at 5% of the metric mean: the pre-launch
    answer to "how long must this experiment run". Completes the
    experiment family's PLANNING side (SRM validates the split, CUPED
    shrinks variance, the tests read the result; this sizes the test
    before it starts).

    Exactness: with exact integer cents moments, 16σ²/δ² =
    6400·n·(n·sxx − sx²) / ((n−1)·sx²) — one rational; its ceiling is
    (num + den − 1) div den, so n_required is EXACT integer end to
    end. The reported mean is the single IEEE-exact division of the
    same integers (`agg_corr` policy). 128-bit envelope: exact
    through per-group n ≲ 10⁸ (the `events_mann_whitney` convention).

    Plan/scale: ONE map-side-combined hash agg carrying three sums;
    the derivation is a 5-row projection."""
    ev = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    m = ev.select("event_type", cents.alias("c")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("sx"),
        F.sum(F.expr("CAST(c AS decimal(38,0)) * c")).alias("sxx"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_obs"),
        (
            F.col("sx").cast("double") / F.col("n").cast("double") / F.lit(100.0)
        ).alias("mean_value"),
        F.expr(
            "CAST((6400 * n * (n * sxx - sx * sx)"
            " + (n - 1) * sx * sx - 1)"
            " div ((n - 1) * sx * sx) AS BIGINT)"
        ).alias("n_required"),
    )


# --------------------------------------------------------------------------
# events_velocity_flags — trailing-window velocity rule (round 8)
# --------------------------------------------------------------------------

_VEL_WINDOW_S = 86_399  # trailing 24h (inclusive range frame)
_VEL_THRESHOLD = 4


@register(
    "events_velocity_flags",
    tags=("b3",),
    oracle=f"""
        -- Velocity rule (fraud/rate-limit screening): flag every
        -- event whose user produced >= {_VEL_THRESHOLD} events in the
        -- trailing 24h INCLUDING it, then roll offenders up to one
        -- row per user (flag count, peak burst, first-flag second).
        -- The time-based sibling of events_bot_flags' volume screen:
        -- velocity reads the CLOCK, not the daily calendar, so a
        -- burst straddling midnight still trips it.
        WITH p AS (
            SELECT user_id, epoch_us(ts) // 1000000 AS s FROM events
        ),
        w AS (
            SELECT user_id, s,
                   COUNT(*) OVER (
                       PARTITION BY user_id ORDER BY s
                       RANGE BETWEEN {_VEL_WINDOW_S} PRECEDING
                                 AND CURRENT ROW
                   ) AS burst
            FROM p
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_flagged,
               CAST(MAX(burst) AS BIGINT) AS max_burst,
               CAST(MIN(s) AS BIGINT) AS first_flag_s
        FROM w WHERE burst >= {_VEL_THRESHOLD}
        GROUP BY user_id
    """,
)
def events_velocity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Velocity rule — the fraud / rate-limit screen: flag every event
    whose user produced ≥ {t} events in the trailing 24 hours
    including it, rolled up to one row per offending user (flag
    count, peak burst size, first flagged second). The time-based
    sibling of `events_bot_flags`' daily-volume screen: velocity
    reads the CLOCK, not the calendar, so a burst straddling midnight
    still trips it — which is exactly the evasion pattern calendar
    buckets miss.

    Exactness: pure integer second arithmetic; the RANGE frame is
    value-based (seconds), so tied timestamps count each other
    symmetrically on both engines.

    Plan/scale: ONE user-keyed sort window (the sessionize shape —
    partition by the natural entity key, so no global sort and no
    skew beyond the hottest single user); the offender rollup reuses
    the same partitioning, and output is |flagged users| rows. The
    streaming twin is `stream_stateful`'s running per-key state —
    this is the batch/backfill form."""
    ev = table(spark, sf_dir, "events")
    p = ev.select(
        "user_id", F.expr("unix_micros(ts) div 1000000").alias("s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s")
        .rangeBetween(-_VEL_WINDOW_S, 0)
    )
    burst = p.select(
        "user_id", "s", F.count(F.lit(1)).over(w).alias("burst")
    )
    return (
        burst.filter(F.col("burst") >= _VEL_THRESHOLD)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_flagged"),
            F.max("burst").cast("long").alias("max_burst"),
            F.min("s").cast("long").alias("first_flag_s"),
        )
    )


# --------------------------------------------------------------------------
# ts_theil_sen — robust median-slope trend (round 8)
# --------------------------------------------------------------------------

_TS_SLOPE_SCALE = 1_000_000


@register(
    "ts_theil_sen",
    tags=("b6",),
    oracle=f"""
        -- Theil-Sen robust trend per event type: the MEDIAN of all
        -- pairwise day-to-day slopes -- one wild outlier day barely
        -- moves it, where the OLS slope (win_rolling_regression's
        -- fit) chases it; the trend estimator monitoring teams
        -- deploy when a single bad ingest day must not flip the
        -- alert. Slopes are sign-split floor-scaled integers
        -- (embed_pca_power's negative-safe division); the median is
        -- the exact lower order statistic over the bounded
        -- date-pair set.
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CASE WHEN b.y < a.y
                        THEN -(((a.y - b.y) * {_TS_SLOPE_SCALE})
                               // (b.day - a.day))
                        ELSE ((b.y - a.y) * {_TS_SLOPE_SCALE})
                             // (b.day - a.day) END AS slope_scaled
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND b.day > a.day
        ),
        r AS (
            SELECT event_type, slope_scaled,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY slope_scaled
                   ) AS i,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM pairs
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_pairs,
               CAST(MIN(CASE WHEN 2 * i >= n + 1
                             THEN slope_scaled END) AS BIGINT)
                   AS theil_sen_slope_scaled
        FROM r GROUP BY event_type
    """,
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the MEDIAN of all
    pairwise day-to-day slopes: one wild outlier day barely moves it
    where the OLS slope (`win_rolling_regression`) chases it; the
    estimator monitoring teams deploy when a single bad ingest day
    must not flip a trend alert. The robust sibling completing the
    trend family (OLS fits, CUSUM detects shifts, Theil–Sen reads
    the level-free slope).

    Exactness: each pairwise slope Δy/Δx is a sign-split floor-scaled
    integer (Δy·10⁶ div Δx with `embed_pca_power`'s negative-safe
    split, so truncation direction can never diverge across engines);
    the median is the exact LOWER order statistic (2i ≥ n+1) over the
    pair set.

    Plan/scale: the pair space is DATE-cardinality squared per series
    — bounded by the calendar (≈30 days → ≤435 pairs here), NOT by
    row count; facts collapse map-side to (type, day) first, the
    self-join and rank windows run over that bounded rollup. At long
    horizons production caps the pair window (e.g. trailing 90 days)
    — same plan, clamped spine."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    b = daily.select(
        F.col("event_type").alias("et2"),
        F.col("day").alias("day2"),
        F.col("y").alias("y2"),
    )
    pairs = daily.join(
        b,
        (F.col("et2") == F.col("event_type")) & (F.col("day2") > F.col("day")),
    ).select(
        "event_type",
        F.expr(
            f"CASE WHEN y2 < y THEN"
            f" -(((y - y2) * {_TS_SLOPE_SCALE}) div (day2 - day))"
            f" ELSE ((y2 - y) * {_TS_SLOPE_SCALE}) div (day2 - day) END"
        ).alias("slope_scaled"),
    )
    w_r = Window.partitionBy("event_type").orderBy("slope_scaled")
    w_n = Window.partitionBy("event_type")
    r = pairs.select(
        "event_type",
        "slope_scaled",
        F.row_number().over(w_r).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("n"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_pairs"),
        F.min(
            F.expr("CASE WHEN 2 * i >= n + 1 THEN slope_scaled END")
        )
        .cast("long")
        .alias("theil_sen_slope_scaled"),
    )


# --------------------------------------------------------------------------
# ts_runs_test — Wald–Wolfowitz randomness check (round 8)
# --------------------------------------------------------------------------


@register(
    "ts_runs_test",
    tags=("b6",),
    oracle="""
        -- Wald-Wolfowitz runs test per event type: is the daily
        -- volume series RANDOM around its median, or does it cluster
        -- (trend/regime) or alternate (overcorrection)? Days above
        -- the median are 1, below are 0 (exact-median days drop,
        -- documented); R = observed runs; significance is the
        -- cross-multiplied z-squared test
        --   10^4 * (R*n - 2*n1*n2 - n)^2 * (n - 1)
        --     > 38415 * 2*n1*n2 * (2*n1*n2 - n)
        -- (z^2 > 3.8415 with mu = 2n1n2/n + 1 and the classical
        -- sigma^2, fully integer -- the events_mann_whitney
        -- convention).
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2
        ),
        med AS (
            SELECT event_type, y, day,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY y
                   ) AS i,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM daily
        ),
        m2 AS (
            SELECT event_type,
                   MIN(CASE WHEN 2 * i >= cnt + 1 THEN y END) AS med_y
            FROM med GROUP BY event_type
        ),
        s AS (
            SELECT d.event_type, d.day,
                   CASE WHEN d.y > m.med_y THEN 1 ELSE 0 END AS up
            FROM daily d JOIN m2 m ON m.event_type = d.event_type
            WHERE d.y <> m.med_y
        ),
        f AS (
            SELECT event_type, day, up,
                   LAG(up) OVER (
                       PARTITION BY event_type ORDER BY day
                   ) AS prev
            FROM s
        ),
        agg AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN prev IS NULL OR up <> prev
                                 THEN 1 ELSE 0 END) AS HUGEINT) AS r,
                   CAST(SUM(up) AS HUGEINT) AS n1,
                   CAST(SUM(1 - up) AS HUGEINT) AS n2,
                   CAST(COUNT(*) AS HUGEINT) AS n
            FROM f GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               CAST(r AS BIGINT) AS n_runs,
               CAST(10000 * (r * n - 2 * n1 * n2 - n)
                          * (r * n - 2 * n1 * n2 - n) * (n - 1)
                    > 38415 * 2 * n1 * n2 * (2 * n1 * n2 - n)
                    AS INT) AS nonrandom
        FROM agg
    """,
)
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test per event type — is the daily volume
    series RANDOM around its median, or does it cluster (trend /
    regime changes → too few runs) or alternate (overcorrection /
    oscillation → too many)? The randomness check that belongs
    BEFORE any trend estimator: `ts_theil_sen` reports a slope
    whether or not one exists; this says whether the series is even
    non-random. Days above the exact median are 1, below 0,
    exact-median days drop (documented convention).

    Exactness: R (runs), n1, n2 are integers; the α=0.05 decision is
    the fully cross-multiplied z² test
    10⁴·(Rn − 2n1n2 − n)²·(n−1) > 38415·2n1n2·(2n1n2 − n) — the
    `events_mann_whitney` convention: no σ, no sqrt, no float.

    Plan/scale: facts collapse map-side to (type, day); the median,
    the lag flags, and the rollup all ride type-partitioned windows
    over DATE cardinality."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    w_r = Window.partitionBy("event_type").orderBy("y")
    w_n = Window.partitionBy("event_type")
    med = daily.select(
        "event_type",
        "y",
        F.row_number().over(w_r).alias("i"),
        F.count(F.lit(1)).over(w_n).alias("cnt"),
    )
    m2 = med.groupBy("event_type").agg(
        F.min(F.expr("CASE WHEN 2 * i >= cnt + 1 THEN y END")).alias("med_y")
    )
    s = daily.join(m2, "event_type").filter(
        F.col("y") != F.col("med_y")
    ).select(
        "event_type",
        "day",
        (F.col("y") > F.col("med_y")).cast("int").alias("up"),
    )
    f = s.withColumn(
        "prev",
        F.lag("up").over(Window.partitionBy("event_type").orderBy("day")),
    )
    dec = "decimal(38,0)"
    agg = f.groupBy("event_type").agg(
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("up") != F.col("prev")), 1
            ).otherwise(0)
        )
        .cast(dec)
        .alias("r"),
        F.sum("up").cast(dec).alias("n1"),
        F.sum(1 - F.col("up")).cast(dec).alias("n2"),
        F.count(F.lit(1)).cast(dec).alias("n"),
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("r").cast("long").alias("n_runs"),
        F.expr(
            "CAST(10000 * (r * n - 2 * n1 * n2 - n)"
            " * (r * n - 2 * n1 * n2 - n) * (n - 1)"
            " > 38415 * 2 * n1 * n2 * (2 * n1 * n2 - n) AS INT)"
        ).alias("nonrandom"),
    )


# --------------------------------------------------------------------------
# ts_ema_crossover — dual-EWMA golden/death crosses (round 8)
# --------------------------------------------------------------------------

_EMAX_FAST_H = 8  # alpha = 1/2, weights 2^(H-1-k)
_EMAX_SLOW_H = 12  # alpha = 1/4, weights 3^k * 4^(H-1-k)


def _emax_terms(lag_fn, exists_fn, horizon, wnum, wden):
    """(numerator, denominator) fragments for an EWMA with rational
    decay wnum/wden over ``horizon`` trailing rows: weight of lag k =
    wnum^k * wden^(H-1-k) — exact integers (the ts_ewma dyadic scheme
    generalized to any rational alpha)."""
    nums, dens = [], []
    for k in range(horizon):
        w = (wnum ** k) * (wden ** (horizon - 1 - k))
        nums.append(f"{w} * {lag_fn(k)}")
        dens.append(f"{w} * {exists_fn(k)}")
    return " + ".join(nums), " + ".join(dens)


def _emax_sql(over: str) -> str:
    """Crossover-state expression: sign(fast − slow) computed
    CROSS-MULTIPLIED over the two exact num/den pairs — no division
    anywhere, so the state is an exact integer in {-1, 0, 1}."""
    lag = lambda k: f"COALESCE(lag(x, {k}) OVER {over}, 0)"  # noqa: E731
    ex = (  # noqa: E731
        lambda k: f"(CASE WHEN lag(x, {k}) OVER {over} IS NULL"
        " THEN 0 ELSE 1 END)"
    )
    fn, fd = _emax_terms(lag, ex, _EMAX_FAST_H, 1, 2)
    sn, sd = _emax_terms(lag, ex, _EMAX_SLOW_H, 3, 4)
    diff = (
        f"(CAST({fn} AS DECIMAL(38,0)) * ({sd})"
        f" - CAST({sn} AS DECIMAL(38,0)) * ({fd}))"
    )
    return f"(CASE WHEN {diff} > 0 THEN 1 WHEN {diff} < 0 THEN -1 ELSE 0 END)"


@register(
    "ts_ema_crossover",
    tags=("b6",),
    oracle=f"""
        -- MACD-style dual-EWMA crossover detection on daily revenue
        -- per return flag: a GOLDEN cross (fast EWMA rises above the
        -- slow) signals momentum turning up, a DEATH cross the
        -- reverse -- the trend-following alarm pair. Both EWMAs ride
        -- exact rational weights (fast alpha=1/2: 2^(H-1-k); slow
        -- alpha=1/4: 3^k*4^(H-1-k)); the state sign is
        -- cross-multiplied fast_num*slow_den - slow_num*fast_den --
        -- NO division, so every crossover is an exact integer event.
        WITH daily AS (
            SELECT l_returnflag AS flag,
                   epoch_us(l_shipdate) // 86400000000 AS day,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                       AS x
            FROM lineitem GROUP BY 1, 2
        ),
        s AS (
            SELECT flag, day,
                   {_emax_sql("(PARTITION BY flag ORDER BY day)")} AS st
            FROM daily
        ),
        f AS (
            SELECT flag, day, st,
                   LAG(st) OVER (PARTITION BY flag ORDER BY day) AS prev
            FROM s
        )
        SELECT flag AS l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND st > 0
                              AND prev <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_golden,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND st < 0
                              AND prev >= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_death,
               CAST(MIN(CASE WHEN prev IS NOT NULL AND
                             ((st > 0 AND prev <= 0)
                              OR (st < 0 AND prev >= 0))
                             THEN day END) AS BIGINT) AS first_cross_day
        FROM f GROUP BY flag
    """,
)
def ts_ema_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD-style dual-EWMA crossover detection on daily revenue per
    return flag — a GOLDEN cross (fast EWMA rising above the slow)
    flags momentum turning up, a DEATH cross the reverse: the
    trend-FOLLOWING alarm pair, where `win_bollinger` mean-reverts
    and `ts_ema`'s single average just smooths. Completes the
    technical family: smooth (`ts_ewma`), band (`win_bollinger`),
    crossover (this).

    Exactness — `ts_ewma`'s dyadic scheme generalized to any rational
    α: fast α=1/2 carries weights 2^(H−1−k), slow α=1/4 carries
    3^k·4^(H−1−k) — all exact integers; the crossover state is the
    SIGN of fast−slow computed cross-multiplied
    (fast_num·slow_den − slow_num·fast_den, decimal(38,0)) — no
    division anywhere, so a crossover is an exact integer event, not
    a float comparison that flaps in the last ulp.

    Plan/scale: facts collapse map-side to (flag, day); all 20 lags +
    the state lag share ONE flag-partitioned sort (single Window
    node). State per partition cursor is 20 rows — the
    `win_lag_lead` shape."""
    li = table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    ).agg(
        F.sum(F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")).alias(
            "x"
        )
    )
    st = daily.select(
        "flag",
        "day",
        F.expr(_emax_sql("(PARTITION BY flag ORDER BY day)")).alias("st"),
    )
    f = st.withColumn(
        "prev", F.lag("st").over(Window.partitionBy("flag").orderBy("day"))
    )
    return f.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(
            F.expr(
                "CASE WHEN prev IS NOT NULL AND st > 0 AND prev <= 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_golden"),
        F.sum(
            F.expr(
                "CASE WHEN prev IS NOT NULL AND st < 0 AND prev >= 0"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_death"),
        F.min(
            F.expr(
                "CASE WHEN prev IS NOT NULL AND ((st > 0 AND prev <= 0)"
                " OR (st < 0 AND prev >= 0)) THEN day END"
            )
        )
        .cast("long")
        .alias("first_cross_day"),
    )


# --------------------------------------------------------------------------
# events_weekend_lift — weekend-vs-weekday lift with exact t-test (round 8)
# --------------------------------------------------------------------------


@register(
    "events_weekend_lift",
    tags=("b3",),
    oracle="""
        -- Weekend lift per event type: weekend vs weekday mean daily
        -- volume, the lift in floor bp, and a pooled two-sample
        -- t-test on the daily counts -- "is the weekend REALLY
        -- different, or is 30 days of noise talking". The
        -- events_mann_whitney convention end to end: with A =
        -- sx1*n2 - sx2*n1 and B_i = n_i*sxx_i - sx_i^2, the alpha=.05
        -- decision is
        --   10^4 * A^2 * (n1+n2-2) > 38415 * (n1+n2) * (n2*B1 + n1*B2)
        -- -- fully cross-multiplied, no variance, no sqrt, no float.
        -- (dayofweek: DuckDB epoch-day 0 = 1970-01-01 = Thursday, so
        -- weekend = day % 7 IN (2, 3) -- Sat, Sun -- same key both
        -- engines.)
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2
        ),
        g AS (
            SELECT event_type,
                   CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END AS we,
                   y
            FROM daily
        ),
        m AS (
            SELECT event_type,
                   CAST(SUM(we) AS HUGEINT) AS n1,
                   CAST(SUM(1 - we) AS HUGEINT) AS n2,
                   CAST(SUM(CASE WHEN we = 1 THEN y ELSE 0 END)
                        AS HUGEINT) AS sx1,
                   CAST(SUM(CASE WHEN we = 0 THEN y ELSE 0 END)
                        AS HUGEINT) AS sx2,
                   CAST(SUM(CASE WHEN we = 1 THEN y * y ELSE 0 END)
                        AS HUGEINT) AS sxx1,
                   CAST(SUM(CASE WHEN we = 0 THEN y * y ELSE 0 END)
                        AS HUGEINT) AS sxx2
            FROM g GROUP BY event_type
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n_weekend_days,
               CAST(n2 AS BIGINT) AS n_weekday_days,
               CAST(sx1 * n2 * 10000 // (sx2 * n1) AS BIGINT)
                   AS lift_bp,
               CAST(10000 * (sx1 * n2 - sx2 * n1)
                          * (sx1 * n2 - sx2 * n1) * (n1 + n2 - 2)
                    > 38415 * (n1 + n2)
                      * (n2 * (n1 * sxx1 - sx1 * sx1)
                         + n1 * (n2 * sxx2 - sx2 * sx2)) AS INT)
                   AS significant
        FROM m
    """,
)
def events_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekend lift per event type — weekend vs weekday mean daily
    volume as a floor-bp lift, with a pooled two-sample t-test on the
    daily counts deciding whether the weekend is REALLY different or
    a month of noise is talking. `events_seasonality` draws the
    dow×hour profile; this one READS it statistically — the
    profile-vs-test split the experiment family uses everywhere
    (heatmap describes, test decides).

    Exactness — the `events_mann_whitney` convention end to end: with
    A = sx₁n₂ − sx₂n₁ and Bᵢ = nᵢ·sxxᵢ − sxᵢ², the α=0.05 decision is
    10⁴·A²·(n₁+n₂−2) > 38415·(n₁+n₂)·(n₂B₁ + n₁B₂) — fully
    cross-multiplied pooled t², no variance materialized, no sqrt, no
    float. The weekend key is epoch-day mod 7 ∈ {2,3} (day 0 =
    1970-01-01 = Thursday) — the same pure-integer key on both
    engines, immune to locale dayofweek conventions.

    Plan/scale: facts collapse map-side to (type, day); ONE hash agg
    carries all six arm sums; the decision is a 5-row projection."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    g = daily.select(
        "event_type",
        F.expr("CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END").alias("we"),
        "y",
    )
    dec = "decimal(38,0)"
    m = g.groupBy("event_type").agg(
        F.sum("we").cast(dec).alias("n1"),
        F.sum(1 - F.col("we")).cast(dec).alias("n2"),
        F.sum(F.expr("CASE WHEN we = 1 THEN y ELSE 0 END"))
        .cast(dec)
        .alias("sx1"),
        F.sum(F.expr("CASE WHEN we = 0 THEN y ELSE 0 END"))
        .cast(dec)
        .alias("sx2"),
        F.sum(F.expr("CASE WHEN we = 1 THEN y * y ELSE 0 END"))
        .cast(dec)
        .alias("sxx1"),
        F.sum(F.expr("CASE WHEN we = 0 THEN y * y ELSE 0 END"))
        .cast(dec)
        .alias("sxx2"),
    )
    return m.select(
        "event_type",
        F.col("n1").cast("long").alias("n_weekend_days"),
        F.col("n2").cast("long").alias("n_weekday_days"),
        F.expr("CAST(sx1 * n2 * 10000 div (sx2 * n1) AS BIGINT)").alias(
            "lift_bp"
        ),
        F.expr(
            "CAST(10000 * (sx1 * n2 - sx2 * n1)"
            " * (sx1 * n2 - sx2 * n1) * (n1 + n2 - 2)"
            " > 38415 * (n1 + n2)"
            " * (n2 * (n1 * sxx1 - sx1 * sx1)"
            " + n1 * (n2 * sxx2 - sx2 * sx2)) AS INT)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# events_peak_days — local maxima with shoulder height (round 8)
# --------------------------------------------------------------------------


@register(
    "events_peak_days",
    tags=("b3",),
    oracle="""
        -- Local-maximum detection per event type: days strictly above
        -- BOTH calendar neighbors, with the height above the higher
        -- shoulder -- the spike-shape detector (campaign days, incident
        -- days) that complements the family's other lenses: anomaly
        -- reads global deviation, Bollinger local bands, changepoint
        -- level shifts; a PEAK is a shape (up-down), not a level. Gap
        -- days break peaks by definition (a missing neighbor
        -- disqualifies -- spine-edge days can't be certified as peaks).
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   COUNT(*) AS y
            FROM events GROUP BY 1, 2
        ),
        n AS (
            SELECT d.event_type, d.day, d.y,
                   l.y AS y_prev, r.y AS y_next
            FROM daily d
            LEFT JOIN daily l ON l.event_type = d.event_type
                             AND l.day = d.day - 1
            LEFT JOIN daily r ON r.event_type = d.event_type
                             AND r.day = d.day + 1
        ),
        p AS (
            SELECT event_type, day, y,
                   y - CASE WHEN y_prev > y_next THEN y_prev
                            ELSE y_next END AS height
            FROM n
            WHERE y_prev IS NOT NULL AND y_next IS NOT NULL
              AND y > y_prev AND y > y_next
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_peaks,
               CAST(MAX(y) AS BIGINT) AS tallest_peak,
               CAST(MAX(height) AS BIGINT) AS max_height,
               CAST(MIN(day) AS BIGINT) AS first_peak_day
        FROM p GROUP BY event_type
    """,
)
def events_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-maximum detection per event type — days strictly above
    BOTH calendar neighbors, with the height above the higher
    shoulder: the spike-SHAPE detector (campaign days, incident days,
    payday effects). Complements the detector family along the shape
    axis: `events_anomaly` reads global deviation, `win_bollinger`
    local bands, `ts_changepoint` level shifts — a peak is an up-down
    SHAPE, not a level. Calendar neighbors, not row neighbors: a gap
    day disqualifies (a peak can't be certified against a missing
    shoulder), which row-wise lag/lead would silently get wrong.

    Exactness: integer counts and epoch days; the shoulder max and
    height are plain integer arithmetic.

    Plan/scale: facts collapse map-side to (type, day); neighbors
    come from two SELF EQUI JOINS on day±1 (date-cardinality, both
    sides the same tiny rollup) rather than a window with a
    value-based frame — the joins keep the 'calendar neighbor'
    semantics explicit and prune to peak rows before the rollup."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    l = daily.select(
        F.col("event_type").alias("et_l"),
        (F.col("day") + 1).alias("day_l"),
        F.col("y").alias("y_prev"),
    )
    r = daily.select(
        F.col("event_type").alias("et_r"),
        (F.col("day") - 1).alias("day_r"),
        F.col("y").alias("y_next"),
    )
    n = daily.join(
        l, (F.col("et_l") == F.col("event_type")) & (F.col("day_l") == F.col("day")), "left"
    ).join(
        r, (F.col("et_r") == F.col("event_type")) & (F.col("day_r") == F.col("day")), "left"
    )
    p = n.filter(
        F.col("y_prev").isNotNull()
        & F.col("y_next").isNotNull()
        & (F.col("y") > F.col("y_prev"))
        & (F.col("y") > F.col("y_next"))
    ).select(
        "event_type",
        "day",
        "y",
        (
            F.col("y")
            - F.when(
                F.col("y_prev") > F.col("y_next"), F.col("y_prev")
            ).otherwise(F.col("y_next"))
        ).alias("height"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_peaks"),
        F.max("y").cast("long").alias("tallest_peak"),
        F.max("height").cast("long").alias("max_height"),
        F.min("day").cast("long").alias("first_peak_day"),
    )


# --------------------------------------------------------------------------
# ts_mann_kendall — exact Mann-Kendall trend test per series (round 11)
# --------------------------------------------------------------------------

# z²·10⁴ for the two-sided 5% level (1.96² = 3.8416) — enters the
# significance test as an integer cross-multiply, never as a float.
_MK_Z2_E4 = 38_416


@register(
    "ts_mann_kendall",
    tags=("analytics",),
    oracle=f"""
        -- Mann-Kendall trend test per event series (Mann 1945 /
        -- Kendall's tau): S = sum over day pairs i<j of
        -- sign(n_j - n_i); under H0 Var(S) = [n(n-1)(2n+5)
        -- - sum_ties t(t-1)(2t+5)] / 18. The monotone-trend detector
        -- hydrology/monitoring uses because it needs no distribution
        -- and no float math: here the significance test is the exact
        -- integer cross-multiply 18 * 10^4 * S^2 > z^2*10^4 * var18
        -- (var18 = 18*Var, an integer by construction). No continuity
        -- correction (documented definition, same on both engines).
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT a.event_type,
                   SUM(CASE WHEN b.n_events > a.n_events THEN 1
                            WHEN b.n_events < a.n_events THEN -1
                            ELSE 0 END) AS s_stat
            FROM cell a JOIN cell b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type
        ),
        nn AS (SELECT event_type, COUNT(*) AS n FROM cell GROUP BY 1),
        ties AS (
            SELECT event_type,
                   COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS tie_adj
            FROM (SELECT event_type, n_events, COUNT(*) AS t
                  FROM cell GROUP BY 1, 2) g
            WHERE t > 1
            GROUP BY event_type
        )
        SELECT nn.event_type,
               CAST(nn.n AS BIGINT) AS n_days,
               CAST(s.s_stat AS BIGINT) AS s_stat,
               CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                    - COALESCE(ties.tie_adj, 0) AS BIGINT) AS var18,
               CAST(CASE WHEN 180000 * s.s_stat * s.s_stat >
                              {_MK_Z2_E4} * (nn.n * (nn.n - 1)
                              * (2 * nn.n + 5)
                              - COALESCE(ties.tie_adj, 0))
                         THEN CASE WHEN s.s_stat > 0 THEN 1 ELSE -1 END
                         ELSE 0 END AS BIGINT) AS trend
        FROM nn JOIN s USING (event_type)
        LEFT JOIN ties USING (event_type)
    """,
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event series — the
    distribution-free standard in hydrology/monitoring, here in EXACT
    integer arithmetic end-to-end: S = Σ_{{i<j}} sign(n_j − n_i) over
    day pairs, tie-adjusted Var(S) kept as the integer var18 = 18·Var,
    and the 5% two-sided verdict as the cross-multiply
    18·10⁴·S² > z²·10⁴·var18 (z²·10⁴ = {_MK_Z2_E4} enters as a literal
    — no sqrt, no float, no continuity correction by documented
    definition). Complements `events_mann_whitney` (two-sample
    location) and `ts_theil_sen` (trend MAGNITUDE — Theil-Sen is the
    slope the MK test gates).

    Plan/scale: events collapse map-side to (type, day) cells — the
    module's cell convention — so the pairwise stage is a self-join
    over DAY-cardinality rows per type (n ≤ a few hundred days ⇒
    ≤ n²/2 comparisons per type, partition-local after ONE
    event_type exchange shared by S, n, and the tie table). At 100 TB
    the series dimension (days) grows with calendar time, not corpus
    size — the O(n²) pair stage is bounded by the retention window,
    and a longer-horizon deployment would swap in the O(n log n)
    merge-sort inversion count with identical semantics."""
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    b = cell.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("n_events").alias("b_n"),
    )
    s = (
        cell.join(
            b,
            (cell.event_type == b.b_type) & (cell.day < F.col("b_day")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("b_n") > F.col("n_events"), 1)
                .when(F.col("b_n") < F.col("n_events"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    nn = cell.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        cell.groupBy("event_type", "n_events")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_adj")
        )
    )
    return (
        nn.join(s, "event_type")
        .join(ties, "event_type", "left")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            F.expr(
                "CAST(n * (n - 1) * (2 * n + 5)"
                " - coalesce(tie_adj, 0) AS BIGINT)"
            ).alias("var18"),
            F.expr(
                f"""CAST(CASE WHEN 180000 * s_stat * s_stat >
                    {_MK_Z2_E4} * (n * (n - 1) * (2 * n + 5)
                    - coalesce(tie_adj, 0))
                    THEN CASE WHEN s_stat > 0 THEN 1 ELSE -1 END
                    ELSE 0 END AS BIGINT)"""
            ).alias("trend"),
        )
    )


# --------------------------------------------------------------------------
# events_wilson_ctr — Wilson lower-bound success-rate ranking (round 11)
# --------------------------------------------------------------------------

# z²·10⁴ at the two-sided 5% level (1.96² = 3.8416), and the constants
# it induces in the scaled Wilson algebra: z²/2·10⁴ = 19208,
# z⁴/4·10⁸ = 368 947 264. All enter as integer literals.
_W_Z2_E4 = 38_416
_W_Z2_HALF_E4 = 19_208
_W_Z4_QTR_E8 = 368_947_264


@register(
    "events_wilson_ctr",
    tags=("analytics",),
    oracle=f"""
        -- Wilson score lower bound (Wilson 1927; the "how not to sort
        -- by average rating" ranking): per item, the 95% lower
        -- confidence bound on the success rate, exact to the
        -- documented integer grid. With n trials / s successes and
        -- z² = {_W_Z2_E4}/1e4:
        --   lb = (s + z²/2 - sqrt(z²·s(n-s)/n + z⁴/4)) / (n + z²)
        -- The radicand is floored to an integer (a < 1e-4 effect on
        -- the e6 output, same floor on both engines), sqrt is the one
        -- float op, and the final lb·1e6 is an exact integer floor
        -- division. Magnitude envelope (cf. agg_chi_square /
        -- sample_neyman_alloc): rad <= z²·1e8·n/4 stays under 2^53 —
        -- so FLOOR(SQRT(double)) is exact — for per-item trial counts
        -- n <~ 9·10⁷; beyond that the value remains cross-engine
        -- bit-stable (same double in, IEEE sqrt) but not provably
        -- integer-exact.
        WITH i AS (
            SELECT user_id % 100 AS item,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS s
            FROM events GROUP BY 1
        ),
        w AS (
            SELECT item, n, s,
                   ({_W_Z2_E4} * 10000 * s * (n - s)) // n
                       + {_W_Z4_QTR_E8} AS rad
            FROM i
        ),
        lb AS (
            SELECT item, n, s,
                   (1000000 * (10000 * s + {_W_Z2_HALF_E4}
                       - CAST(FLOOR(SQRT(CAST(rad AS DOUBLE)))
                              AS HUGEINT)))
                   // (10000 * n + {_W_Z2_E4}) AS lb_e6
            FROM w
        )
        SELECT CAST(item AS BIGINT) AS item,
               CAST(n AS BIGINT) AS n_trials,
               CAST(s AS BIGINT) AS n_success,
               CAST(lb_e6 AS BIGINT) AS wilson_lb_e6,
               CAST(RANK() OVER (ORDER BY lb_e6 DESC, item)
                    AS BIGINT) AS lb_rank
        FROM lb
    """,
)
def events_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score lower-bound ranking — the binomial-uncertainty-
    aware way to rank items by success rate (a 3/3 item must NOT beat
    a 97/100 item, which naive rate sorting does). Per item (user_id
    mod 100 here; any item key in production), n trials and successes
    (value > 50) collapse out of ONE map-side-combined hash agg; the
    bound is computed in the scaled-integer algebra documented in the
    oracle — z²·10⁴ = {_W_Z2_E4} as a literal, radicand floored to an
    integer via exact decimal(38,0) floor division, ONE IEEE
    correctly-rounded sqrt, and an exact integer floor division for
    lb·10⁶. Magnitude envelope: the radicand ≈ z²·10⁸·n/4 stays under
    2⁵³ (FLOOR(SQRT) provably exact) for per-item trials n ≲ 9·10⁷;
    past that it stays cross-engine bit-stable but not
    integer-exact. Complements
    `events_ab_test` (two-arm comparison) and `agg_ratio_pin` (exact
    rate grids): this is the per-item RANKING under uncertainty.

    Plan/scale: one full-data hash agg (partial-aggregable), then all
    algebra and the rank run on |items| rows — the unpartitioned rank
    window sits over a collapsed aggregate, which the repo's
    single-task-window audit rule explicitly sanctions (bounded
    input)."""
    ev = table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    i = ev.groupBy(F.expr("user_id % 100").alias("item")).agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.expr("CASE WHEN value > 50.0D THEN 1 ELSE 0 END"))
        .cast(dec)
        .alias("s"),
    )
    w = i.withColumn(
        "rad",
        F.expr(
            f"({_W_Z2_E4} * 10000 * s * (n - s)) div n"
            f" + {_W_Z4_QTR_E8}"
        ),
    )
    lb = w.withColumn(
        "lb_e6",
        F.expr(
            f"(1000000 * (10000 * s + {_W_Z2_HALF_E4}"
            f" - CAST(FLOOR(SQRT(CAST(rad AS DOUBLE))) AS {dec})))"
            f" div (10000 * n + {_W_Z2_E4})"
        ),
    )
    win = Window.orderBy(F.desc("lb_e6"), F.asc("item"))
    return lb.select(
        F.col("item").cast("long").alias("item"),
        F.col("n").cast("long").alias("n_trials"),
        F.col("s").cast("long").alias("n_success"),
        F.col("lb_e6").cast("long").alias("wilson_lb_e6"),
        F.rank().over(win).cast("long").alias("lb_rank"),
    )


# --------------------------------------------------------------------------
# ts_ljung_box — portmanteau whiteness test, exact ints (round 11)
# --------------------------------------------------------------------------

_LB_LAGS = 7  # portmanteau horizon
# chi-square 5% critical value at df = 7, scaled e4 (14.0671... -> the
# standard table value 14.067): enters as an integer literal so the
# verdict is an exact integer comparison.
_LB_CRIT_E4 = 140_671


@register(
    "ts_ljung_box",
    tags=("analytics",),
    oracle=f"""
        -- Ljung-Box portmanteau test per event series: are the lag
        -- 1..{_LB_LAGS} autocorrelations of the daily-count series
        -- jointly zero? Q = n(n+2) * sum_k rho_k^2/(n-k), rejected at
        -- 5% when Q > chi2_0.95(df={_LB_LAGS}) = {_LB_CRIT_E4}/1e4.
        -- Exactness convention (documented, same on both engines):
        -- rho_k is floored to the e6 grid first via the exact HUGEINT
        -- cross-multiply sign-floor(1e6 * num_k / den) with
        -- c_t = n*x_t - S (mean centering scaled by n, which cancels
        -- in the ratio), then Q_e12 = sum_k (n*(n+2)*rho_e6_k^2) //
        -- (n-k) is pure int64 arithmetic and q_e4 = Q_e12 // 1e8.
        -- The series index is the rank of OBSERVED days (documented:
        -- gaps close up, as in standard returns-series practice).
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        m AS (
            -- guard (ADVICE r11): Q divides by (n - k) for k=1..7, so
            -- a series with n <= 7 days would hit a zero/negative
            -- divisor, where Spark div (NULL on zero) and DuckDB //
            -- (error) disagree. Short series carry no lag-7 evidence;
            -- drop them before ANY window work (same filter both
            -- engines), mirroring events_welch_ttest's n >= 2 guard.
            SELECT event_type, COUNT(*) AS n, SUM(x) AS s
            FROM cell GROUP BY 1
            HAVING COUNT(*) > {_LB_LAGS}
        ),
        c AS (
            SELECT cell.event_type,
                   m.n,
                   CAST(m.n AS HUGEINT) * x - m.s AS ct,
                   ROW_NUMBER() OVER (PARTITION BY cell.event_type
                                      ORDER BY day) AS t
            FROM cell JOIN m USING (event_type)
        ),
        lagged AS (
            SELECT event_type, n, ct,
                   {", ".join(
                       f"LAG(ct, {k}) OVER (PARTITION BY event_type"
                       f" ORDER BY t) AS l{k}" for k in range(1, 8)
                   )}
            FROM c
        ),
        sums AS (
            SELECT event_type, MIN(n) AS n,
                   SUM(ct * ct) AS den,
                   {", ".join(
                       f"SUM(ct * l{k}) AS num{k}"
                       for k in range(1, 8)
                   )}
            FROM lagged GROUP BY event_type
        ),
        rho AS (
            -- den = SUM(ct*ct) = 0 iff the series is CONSTANT (every
            -- day the same count): zero autocorrelation evidence, and
            -- the engines disagree on integer division by zero (Spark
            -- div -> NULL, DuckDB // -> NULL here but error semantics
            -- differ by version) - drop it, same filter both engines.
            SELECT event_type, n, den,
                   {", ".join(
                       f"CASE WHEN num{k} >= 0 THEN"
                       f" CAST((1000000 * num{k}) // den AS BIGINT)"
                       f" ELSE CAST(-((1000000 * (-num{k})) // den)"
                       f" AS BIGINT) END AS r{k}"
                       for k in range(1, 8)
                   )}
            FROM sums WHERE den > 0
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               r1 AS rho1_e6,
               CAST(({" + ".join(
                   f"(CAST(n AS HUGEINT) * (n + 2) * r{k} * r{k})"
                   f" // (n - {k})"
                   for k in range(1, 8)
               )}) // 100000000 AS BIGINT) AS q_e4,
               CAST(CASE WHEN ({" + ".join(
                   f"(CAST(n AS HUGEINT) * (n + 2) * r{k} * r{k})"
                   f" // (n - {k})"
                   for k in range(1, 8)
               )}) // 100000000 > {_LB_CRIT_E4}
                    THEN 1 ELSE 0 END AS BIGINT) AS rejected
        FROM rho
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test per event series — are
    the first {m} autocorrelations of the daily-count series jointly
    zero? The standard residual-diagnostic (Box/Jenkins) that gates
    forecasting-model adequacy; complements `ts_autocorr` (single
    lag), `ts_runs_test` (sign runs), and `ts_mann_kendall`
    (monotone trend) with the JOINT short-memory verdict.

    Exactness convention (documented, both engines identical): mean
    centering is scaled by n (cₜ = n·xₜ − S — the n² factor cancels
    in every ratio), ρ_k is floored to the e6 grid via one exact
    decimal(38,0) cross-multiply per lag, Q_e12 = Σ_k
    (n(n+2)·ρe6_k²) div (n−k) runs in decimal(38,0) ↔ HUGEINT (the
    n(n+2)·10¹² product leaves int64 past ~3000 days), q_e4 = Q_e12
    div 10⁸,
    and the 5% verdict is the integer comparison against the χ²
    df={m} literal {crit}. Series with ≤ {m} observed days are
    dropped before any window work (both engines): the (n−k)
    divisors require n > lags, and Spark div / DuckDB // diverge on
    non-positive divisors. Magnitude envelope: |num_k| ≤ n³·x̄² —
    within decimal(38,0) for day-count series to ~10⁶ days.

    Plan/scale: events collapse map-side to (type, day) cells; ONE
    partitioned sort+window pass produces all {m} lag columns
    (Catalyst stacks the lags in one WindowExec over one exchange);
    ONE same-key agg folds the co-moment sums; all remaining algebra
    is per-type scalar projection. The series dimension is bounded by
    the retention window, not corpus size."""
    ev = table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    cell = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    m = (
        cell.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
        # n > lags guard — see the oracle's HAVING comment: protects
        # the (n - k) divisors and drops short series before the
        # window pass on both engines identically.
        .filter(F.col("n") > _LB_LAGS)
    )
    w = Window.partitionBy("event_type").orderBy("day")
    c = (
        cell.join(F.broadcast(m), "event_type")
        .select(
            "event_type",
            "n",
            F.expr(f"CAST(n AS {dec}) * x - s").alias("ct"),
            "day",
        )
        .withColumn("t", F.row_number().over(w))
    )
    wl = Window.partitionBy("event_type").orderBy("t")
    lagged = c.select(
        "event_type",
        "n",
        "ct",
        *[F.lag("ct", k).over(wl).alias(f"l{k}") for k in range(1, 8)],
    )
    sums = lagged.groupBy("event_type").agg(
        F.min("n").alias("n"),
        F.sum(F.expr("ct * ct")).alias("den"),
        *[
            F.sum(F.expr(f"ct * l{k}")).alias(f"num{k}")
            for k in range(1, 8)
        ],
    )
    # den > 0 guard — see the oracle's rho comment (constant series).
    rho = sums.filter(F.col("den") > 0).select(
        "event_type",
        "n",
        *[
            F.expr(
                f"CASE WHEN num{k} >= 0 THEN"
                f" CAST((1000000 * num{k}) div den AS BIGINT)"
                f" ELSE CAST(-((1000000 * (-num{k})) div den)"
                f" AS BIGINT) END"
            ).alias(f"r{k}")
            for k in range(1, 8)
        ],
    )
    q_expr = " + ".join(
        f"(CAST(n AS decimal(38,0)) * (n + 2) * r{k} * r{k})"
        f" div (n - {k})"
        for k in range(1, 8)
    )
    return rho.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("r1").alias("rho1_e6"),
        F.expr(f"CAST(({q_expr}) div 100000000 AS BIGINT)").alias(
            "q_e4"
        ),
        F.expr(
            f"CAST(CASE WHEN ({q_expr}) div 100000000 > {_LB_CRIT_E4}"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("rejected"),
    )


# --------------------------------------------------------------------------
# ts_kendall_tau — exact Kendall tau-b between two daily measures (round 11)
# --------------------------------------------------------------------------


@register(
    "ts_kendall_tau",
    tags=("analytics",),
    oracle="""
        -- Kendall tau-b rank association per event series between the
        -- two daily measures (event count, value cents sum) — the
        -- distribution-free complement to agg_corr's Pearson r.
        -- Exact integers: concordant-minus-discordant S over day
        -- pairs, tie-adjusted denominator legs T0-T1 and T0-T2, and
        -- ONE IEEE sqrt for the denominator (radicand = exact integer
        -- product, < 2^53 for day-bounded series); tau_b*1e6 is a
        -- sign-split integer floor division. Same day-cell convention
        -- and pair-stage bound as ts_mann_kendall.
        WITH cell AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT a.event_type,
                   SUM(CASE WHEN (b.x > a.x AND b.y > a.y)
                             OR (b.x < a.x AND b.y < a.y) THEN 1
                            WHEN (b.x > a.x AND b.y < a.y)
                             OR (b.x < a.x AND b.y > a.y) THEN -1
                            ELSE 0 END) AS s_stat
            FROM cell a JOIN cell b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type
        ),
        nn AS (SELECT event_type, COUNT(*) AS n FROM cell GROUP BY 1),
        tx AS (
            SELECT event_type,
                   COALESCE(SUM(t * (t - 1) / 2), 0) AS t1
            FROM (SELECT event_type, x, COUNT(*) AS t
                  FROM cell GROUP BY 1, 2) g
            WHERE t > 1 GROUP BY event_type
        ),
        ty AS (
            SELECT event_type,
                   COALESCE(SUM(t * (t - 1) / 2), 0) AS t2
            FROM (SELECT event_type, y, COUNT(*) AS t
                  FROM cell GROUP BY 1, 2) g
            WHERE t > 1 GROUP BY event_type
        ),
        legs AS (
            SELECT nn.event_type, nn.n, s.s_stat,
                   nn.n * (nn.n - 1) / 2 - COALESCE(tx.t1, 0) AS lx,
                   nn.n * (nn.n - 1) / 2 - COALESCE(ty.t2, 0) AS ly
            FROM nn JOIN s USING (event_type)
            LEFT JOIN tx USING (event_type)
            LEFT JOIN ty USING (event_type)
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               CAST(s_stat AS BIGINT) AS s_stat,
               CAST(CASE WHEN lx = 0 OR ly = 0 THEN NULL
                    WHEN s_stat >= 0 THEN
                        (1000000 * s_stat)
                        // CAST(FLOOR(SQRT(CAST(lx * ly AS DOUBLE)))
                                AS BIGINT)
                    ELSE
                        -((1000000 * (-s_stat))
                        // CAST(FLOOR(SQRT(CAST(lx * ly AS DOUBLE)))
                                AS BIGINT))
               END AS BIGINT) AS tau_b_e6
        FROM legs
    """,
)
def ts_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b per event series between the two daily measures
    (count, revenue cents) — does a busier day mean a richer day,
    measured rank-wise? The distribution-free complement to
    `agg_corr` (Pearson on raw values) and the ASSOCIATION sibling of
    `ts_mann_kendall` (whose S statistic is Kendall-vs-time).
    Exactness: S = Σ sign products over day pairs (exact ints),
    tie-adjusted legs lx/ly exact, ONE IEEE correctly-rounded sqrt of
    lx·ly (< 2⁵³ for retention-window series), sign-split e6 floor
    division; degenerate legs (all-tied measure) emit NULL.

    Plan/scale: identical envelope to ts_mann_kendall — events
    collapse map-side to (type, day) cells; the pair stage is
    day-cardinality per type (bounded by the retention window, not
    corpus size), partition-local after ONE type-keyed exchange
    shared by S, n, and both tie tables."""
    ev = table(spark, sf_dir, "events")
    cell = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("y"),
    )
    b = cell.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
    )
    s = (
        cell.join(
            b,
            (cell.event_type == b.b_type) & (cell.day < F.col("b_day")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(
                    ((F.col("bx") > F.col("x")) & (F.col("by") > F.col("y")))
                    | ((F.col("bx") < F.col("x")) & (F.col("by") < F.col("y"))),
                    1,
                )
                .when(
                    ((F.col("bx") > F.col("x")) & (F.col("by") < F.col("y")))
                    | ((F.col("bx") < F.col("x")) & (F.col("by") > F.col("y"))),
                    -1,
                )
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    nn = cell.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def tie_leg(col: str, alias: str) -> DataFrame:
        return (
            cell.groupBy("event_type", col)
            .agg(F.count(F.lit(1)).alias("t"))
            .filter(F.col("t") > 1)
            .groupBy("event_type")
            .agg(
                F.coalesce(
                    F.sum(F.expr("t * (t - 1) div 2")), F.lit(0)
                ).alias(alias)
            )
        )

    legs = (
        nn.join(s, "event_type")
        .join(tie_leg("x", "t1"), "event_type", "left")
        .join(tie_leg("y", "t2"), "event_type", "left")
        .select(
            "event_type",
            "n",
            "s_stat",
            F.expr(
                "n * (n - 1) div 2 - coalesce(t1, 0)"
            ).alias("lx"),
            F.expr(
                "n * (n - 1) div 2 - coalesce(t2, 0)"
            ).alias("ly"),
        )
    )
    isq = "CAST(FLOOR(SQRT(CAST(lx * ly AS DOUBLE))) AS BIGINT)"
    return legs.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("s_stat").cast("long").alias("s_stat"),
        F.expr(
            f"CAST(CASE WHEN lx = 0 OR ly = 0 THEN NULL"
            f" WHEN s_stat >= 0 THEN (1000000 * s_stat) div {isq}"
            f" ELSE -((1000000 * (-s_stat)) div {isq})"
            f" END AS BIGINT)"
        ).alias("tau_b_e6"),
    )


# --------------------------------------------------------------------------
# events_welch_ttest — unequal-variance mean test, exact ints (round 11)
# --------------------------------------------------------------------------

# z²·10⁴ at the two-sided 5% level (large-sample cutoff; at these per-
# variant n the Welch df is in the thousands and t ≈ z).
_WT_Z2_E4 = 38_416


@register(
    "events_welch_ttest",
    tags=("analytics",),
    oracle=f"""
        -- Welch's unequal-variance t-test on the per-variant mean
        -- value (variants = user_id % 2, events_ab_test's hash-bucket
        -- assignment): the PARAMETRIC significance companion to
        -- events_mann_whitney (rank-based) and events_ab_test (effect
        -- size only). Entirely rational arithmetic — the t² statistic
        -- reduces to
        --   t² = (Sa·nb − Sb·na)²·(na−1)·(nb−1)
        --        / (Da·nb²·(nb−1) + Db·na²·(na−1))
        -- with D_i = n_i·Σxᵢ² − (Σxᵢ)² (all exact HUGEINT), so NO
        -- sqrt, NO floats anywhere; t²·10⁴ is an exact floor via the
        -- quotient/remainder split and the 5% verdict is the integer
        -- compare t2_e4 > {_WT_Z2_E4} (z² large-sample cutoff — df is
        -- in the thousands here, documented definition).
        WITH m AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS na,
                   CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS HUGEINT) AS nb,
                   CAST(SUM(CASE WHEN user_id % 2 = 0
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS HUGEINT) AS sa,
                   CAST(SUM(CASE WHEN user_id % 2 = 1
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS HUGEINT) AS sb,
                   CAST(SUM(CASE WHEN user_id % 2 = 0
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                                 * CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS HUGEINT) AS qa,
                   CAST(SUM(CASE WHEN user_id % 2 = 1
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                                 * CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END) AS HUGEINT) AS qb
            FROM events GROUP BY 1
        ),
        legs AS (
            SELECT event_type, na, nb, sa, sb,
                   na * qa - sa * sa AS da,
                   nb * qb - sb * sb AS db,
                   sa * nb - sb * na AS sd
            FROM m WHERE na >= 2 AND nb >= 2
        ),
        t AS (
            SELECT event_type, na, nb, sd,
                   sd * sd * (na - 1) * (nb - 1) AS num,
                   da * nb * nb * (nb - 1)
                       + db * na * na * (na - 1) AS den
            FROM legs
        )
        SELECT event_type,
               CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(CASE WHEN sd >= 0
                    THEN (100 * sd) // (na * nb)
                    ELSE -((100 * (-sd)) // (na * nb))
               END AS BIGINT) AS mean_diff_cents_e2,
               CAST(CASE WHEN den = 0 THEN NULL ELSE
                    (num // den) * 10000
                    + ((num - (num // den) * den) * 10000) // den
               END AS BIGINT) AS t2_e4,
               CAST(CASE WHEN den = 0 THEN 0
                    WHEN (num // den) * 10000
                         + ((num - (num // den) * den) * 10000) // den
                         > {_WT_Z2_E4}
                    THEN 1 ELSE 0 END AS BIGINT) AS significant
        FROM t
    """,
)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on the per-variant mean value —
    the parametric significance verdict for the A/B split
    (`events_ab_test` reads the effect SIZE, `events_mann_whitney`
    the rank-based verdict; this is the textbook mean test that
    tolerates unequal variances). Entirely rational: t² reduces to
    (Sa·nb − Sb·na)²(na−1)(nb−1) / (Da·nb²(nb−1) + Db·na²(na−1))
    with D = n·Σx² − (Σx)² — exact decimal(38,0) end-to-end, NO sqrt,
    NO floats; t²·10⁴ is an exact quotient/remainder floor and the 5%
    verdict the integer compare vs the z² literal {z} (large-sample
    cutoff — per-variant n is in the thousands here, so Welch df ≈ z;
    documented definition). Degenerate variance (den = 0) emits NULL
    t², verdict 0; variants below n = 2 are suppressed. Magnitude
    envelope: (Sa·nb)²·n² stays within 38 digits for per-type variant
    sums to ~10¹² cents·rows at these grids.

    Plan/scale: ONE map-side-combined hash agg over event_type
    carries all six conditional moments in a single column-pruned
    scan (the variant flag is a projection — the stream is never
    duplicated); everything after is per-type scalar algebra."""
    ev = table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    c = "CAST(ROUND(value * 100) AS BIGINT)"
    m = ev.groupBy("event_type").agg(
        F.sum(F.expr("CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END"))
        .cast(dec)
        .alias("na"),
        F.sum(F.expr("CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END"))
        .cast(dec)
        .alias("nb"),
        F.sum(F.expr(f"CASE WHEN user_id % 2 = 0 THEN {c} ELSE 0 END"))
        .cast(dec)
        .alias("sa"),
        F.sum(F.expr(f"CASE WHEN user_id % 2 = 1 THEN {c} ELSE 0 END"))
        .cast(dec)
        .alias("sb"),
        F.sum(
            F.expr(
                f"CASE WHEN user_id % 2 = 0"
                f" THEN CAST({c} AS {dec}) * {c} ELSE 0 END"
            )
        ).alias("qa"),
        F.sum(
            F.expr(
                f"CASE WHEN user_id % 2 = 1"
                f" THEN CAST({c} AS {dec}) * {c} ELSE 0 END"
            )
        ).alias("qb"),
    )
    legs = m.filter(F.expr("na >= 2 AND nb >= 2")).select(
        "event_type",
        "na",
        "nb",
        "sa",
        "sb",
        F.expr("na * qa - sa * sa").alias("da"),
        F.expr("nb * qb - sb * sb").alias("db"),
        F.expr("sa * nb - sb * na").alias("sd"),
    )
    t = legs.select(
        "event_type",
        "na",
        "nb",
        "sd",
        F.expr("sd * sd * (na - 1) * (nb - 1)").alias("num"),
        F.expr(
            "da * nb * nb * (nb - 1) + db * na * na * (na - 1)"
        ).alias("den"),
    )
    t2 = (
        "(num div den) * 10000"
        " + ((num - (num div den) * den) * 10000) div den"
    )
    return t.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.expr(
            "CAST(CASE WHEN sd >= 0 THEN (100 * sd) div (na * nb)"
            " ELSE -((100 * (-sd)) div (na * nb)) END AS BIGINT)"
        ).alias("mean_diff_cents_e2"),
        F.expr(
            f"CAST(CASE WHEN den = 0 THEN NULL ELSE {t2} END AS BIGINT)"
        ).alias("t2_e4"),
        F.expr(
            f"CAST(CASE WHEN den = 0 THEN 0"
            f" WHEN {t2} > {_WT_Z2_E4} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# events_alert_debounce — hysteresis alerting automaton (round 14)
# --------------------------------------------------------------------------

_DEB_N = 3  # consecutive breach days to FIRE
_DEB_M = 2  # consecutive clear days to RESOLVE


@register(
    "events_alert_debounce",
    tags=("b11",),
    oracle=f"""
        -- Debounced alerting automaton per event type: a day BREACHES
        -- when its volume exceeds 110% of the series' spine mean
        -- (cross-multiplied: 10*n*span > 11*total); an alert FIRES
        -- only after {_DEB_N} consecutive breach days and RESOLVES
        -- only after {_DEB_M} consecutive clears -- the hysteresis
        -- that separates pages from flaps. The automaton's recurrence
        -- decomposes exactly: fire points = breach runs reaching
        -- length {_DEB_N}, resolve points = clear runs reaching
        -- {_DEB_M}, active(t) = most recent fire beats most recent
        -- resolve, episodes = fires from the inactive state. Days are
        -- densified over the series span (a data gap is a CLEAR day
        -- -- row-wise "consecutive" would lie across gaps).
        WITH daily AS (
            SELECT event_type, epoch_us(ts) // 86400000000 AS d,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(d) AS d0, MAX(d) AS d1,
                   MAX(d) - MIN(d) + 1 AS span, SUM(n) AS total
            FROM daily GROUP BY 1
        ),
        grid AS (
            SELECT b.event_type, s.d, b.span, b.total
            FROM bounds b,
                 unnest(generate_series(b.d0, b.d1)) AS s(d)
        ),
        spine AS (
            SELECT g.event_type, g.d, g.span, g.total,
                   COALESCE(dl.n, 0) AS n
            FROM grid g
            LEFT JOIN daily dl
              ON dl.event_type = g.event_type AND dl.d = g.d
        ),
        flagged AS (
            SELECT event_type, d,
                   CASE WHEN 10 * n * span > 11 * total
                        THEN 1 ELSE 0 END AS f
            FROM spine
        ),
        runs AS (
            SELECT event_type, d, f,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
                   - ROW_NUMBER() OVER (PARTITION BY event_type, f
                                        ORDER BY d) AS rid
            FROM flagged
        ),
        marked AS (
            SELECT event_type, d, f,
                   CASE WHEN f = 1 AND ROW_NUMBER() OVER (
                            PARTITION BY event_type, f, rid ORDER BY d
                        ) = {_DEB_N} THEN 1 ELSE 0 END AS fire,
                   CASE WHEN f = 0 AND ROW_NUMBER() OVER (
                            PARTITION BY event_type, f, rid ORDER BY d
                        ) = {_DEB_M} THEN 1 ELSE 0 END AS resolve
            FROM runs
        ),
        state AS (
            SELECT event_type, d, f, fire, resolve,
                   MAX(CASE WHEN fire = 1 THEN d END) OVER w AS last_fire,
                   MAX(CASE WHEN resolve = 1 THEN d END) OVER w AS last_res
            FROM marked
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS UNBOUNDED PRECEDING)
        ),
        act AS (
            SELECT event_type, d, f, fire,
                   CASE WHEN last_fire IS NOT NULL AND
                             (last_res IS NULL OR last_fire > last_res)
                        THEN 1 ELSE 0 END AS active
            FROM state
        ),
        epi AS (
            SELECT event_type, d, f, fire, active,
                   CASE WHEN fire = 1 AND COALESCE(LAG(active) OVER (
                            PARTITION BY event_type ORDER BY d
                        ), 0) = 0 THEN 1 ELSE 0 END AS episode_start
            FROM act
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS span_days,
               CAST(SUM(f) AS BIGINT) AS n_breach_days,
               CAST(SUM(fire) AS BIGINT) AS n_fires,
               CAST(SUM(episode_start) AS BIGINT) AS n_episodes,
               CAST(SUM(active) AS BIGINT) AS n_active_days,
               CAST(MAX(CASE WHEN active = 1 THEN d END) AS BIGINT)
                   AS last_active_day
        FROM epi
        GROUP BY event_type
    """,
)
def events_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounced alerting with hysteresis — the automaton between a
    threshold and a page: a day breaches when volume exceeds 110% of
    the series' densified-span mean, but an alert FIRES only after
    N=3 consecutive breach days and RESOLVES only after M=2
    consecutive clear days, so one spiky day never pages and one
    quiet day never closes a real incident. `events_incidents`
    extracts simple threshold episodes; this is the flap-suppressed
    form real alertmanagers (hysteresis / for-duration clauses) run.

    The sequential recurrence state(t) = g(state(t-1), x_t)
    DECOMPOSES exactly into window algebra: fire points are breach
    runs reaching length N (gaps-and-islands run ids), resolve points
    clear runs reaching M, active(t) = most-recent-fire beats
    most-recent-resolve (running MAX over marked days), and episode
    starts are fires from the inactive state (LAG of active) — no
    iteration, no UDF, every comparison integer
    (cross-multiplied threshold, epoch-day arithmetic, calendar
    densification so a data gap counts as a clear day).

    Plan/scale: facts collapse to (type, day) map-side first;
    everything after runs on the densified day spine — series ×
    span_days rows. All five window layers share ONE (event_type, d)
    sort (same partitioning, consecutive-ordered), so the spine is
    sorted once. At 100 TB the fact scan dominates and the automaton
    cost is calendar-sized."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    bounds = daily.groupBy("event_type").agg(
        F.min("d").alias("d0"),
        F.max("d").alias("d1"),
        (F.max("d") - F.min("d") + 1).alias("span"),
        F.sum("n").alias("total"),
    )
    spine = (
        bounds.select(
            "event_type",
            "span",
            "total",
            F.explode(F.sequence("d0", "d1")).alias("d"),
        )
        .join(daily, ["event_type", "d"], "left")
        .select(
            "event_type",
            "d",
            "span",
            "total",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    flagged = spine.select(
        "event_type",
        "d",
        F.expr(
            "CASE WHEN 10 * n * span > 11 * total THEN 1 ELSE 0 END"
        ).alias("f"),
    )
    w_all = Window.partitionBy("event_type").orderBy("d")
    w_flag = Window.partitionBy("event_type", "f").orderBy("d")
    runs = flagged.select(
        "*",
        (F.row_number().over(w_all) - F.row_number().over(w_flag)).alias(
            "rid"
        ),
    )
    w_run = Window.partitionBy("event_type", "f", "rid").orderBy("d")
    marked = runs.select(
        "event_type",
        "d",
        "f",
        F.row_number().over(w_run).alias("rl"),
    ).select(
        "event_type",
        "d",
        "f",
        F.expr(
            f"CASE WHEN f = 1 AND rl = {_DEB_N} THEN 1 ELSE 0 END"
        ).alias("fire"),
        F.expr(
            f"CASE WHEN f = 0 AND rl = {_DEB_M} THEN 1 ELSE 0 END"
        ).alias("resolve"),
    )
    w_run_cum = w_all.rowsBetween(Window.unboundedPreceding, 0)
    state = marked.select(
        "*",
        F.max(F.when(F.col("fire") == 1, F.col("d"))).over(w_run_cum).alias(
            "last_fire"
        ),
        F.max(F.when(F.col("resolve") == 1, F.col("d")))
        .over(w_run_cum)
        .alias("last_res"),
    )
    act = state.select(
        "event_type",
        "d",
        "f",
        "fire",
        F.expr(
            "CASE WHEN last_fire IS NOT NULL AND"
            " (last_res IS NULL OR last_fire > last_res)"
            " THEN 1 ELSE 0 END"
        ).alias("active"),
    )
    epi = act.select(
        "*",
        F.expr(
            "CASE WHEN fire = 1 AND"
            " COALESCE(LAG(active) OVER"
            " (PARTITION BY event_type ORDER BY d), 0) = 0"
            " THEN 1 ELSE 0 END"
        ).alias("episode_start"),
    )
    return epi.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("span_days"),
        F.sum("f").cast("long").alias("n_breach_days"),
        F.sum("fire").cast("long").alias("n_fires"),
        F.sum("episode_start").cast("long").alias("n_episodes"),
        F.sum("active").cast("long").alias("n_active_days"),
        F.max(F.when(F.col("active") == 1, F.col("d")))
        .cast("long")
        .alias("last_active_day"),
    )
