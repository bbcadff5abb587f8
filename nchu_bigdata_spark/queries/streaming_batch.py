"""B-9 Streaming operators — batch-equivalent forms (SURVEY.md §2.B-9).

Structured Streaming reuses the batch engine (incrementalized Catalyst
plans), so each streaming operator is registered here in its
oracle-checkable batch form; ``nchu_bigdata_spark.streaming.runner``
re-runs the same plans as true ``readStream`` queries and the test suite
asserts batch↔stream parity (SURVEY.md §5.3).

Window starts are compared as epoch microseconds: Spark's ``window()``
buckets align to the Unix epoch, which is exactly
``floor(epoch_us/width)*width`` on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nchu_bigdata_spark.compat import dsum
from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register

_5M_US = 5 * 60 * 1_000_000
_10M_US = 10 * 60 * 1_000_000


@register(
    "stream_tumbling",
    tags=("b9",),
    oracle=f"""
        SELECT (epoch_us(ts) // {_5M_US}) * {_5M_US} AS wstart_us,
               event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window count/sum keyed by event_type."""
    return tumbling_transform(table(spark, sf_dir, "events"))


def tumbling_transform(ev: DataFrame) -> DataFrame:
    """Core tumbling-window plan — shared verbatim by the batch query
    and the Structured Streaming runner (parity tested, SURVEY.md §5.3)."""
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("wstart_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_sliding",
    tags=("b9",),
    oracle=f"""
        WITH buckets AS (
            SELECT UNNEST([
                       (epoch_us(ts) // {_5M_US}) * {_5M_US},
                       (epoch_us(ts) // {_5M_US}) * {_5M_US} - {_5M_US}
                   ]) AS wstart_us,
                   event_type, value
            FROM events
        )
        SELECT wstart_us, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_value
        FROM buckets
        GROUP BY 1, 2
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute length, 5-minute slide): every event
    lands in exactly two windows; the oracle materializes both bucket
    starts explicitly."""
    return sliding_transform(table(spark, sf_dir, "events"))


def sliding_transform(ev: DataFrame) -> DataFrame:
    """Core sliding-window plan — shared by batch query and streaming
    runner."""
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.unix_micros("w.start").alias("wstart_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_session",
    tags=("b9",),
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_10M_US}
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(epoch_us(ts)) AS session_start_us,
               MAX(epoch_us(ts)) + {_10M_US} AS session_end_us,
               COUNT(*) AS n_events
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session window (10-minute gap). Spark's native
    ``session_window`` (start = first event, end = last event + gap);
    the oracle emulates it with gaps-and-islands SQL."""
    return session_transform(table(spark, sf_dir, "events"))


def session_transform(ev: DataFrame) -> DataFrame:
    """Core session-window plan — shared by batch query and streaming
    runner."""
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("session_start_us"),
            F.unix_micros("sw.end").alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "stream_dedup",
    tags=("b9",),
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful dropDuplicates, batch form — the streaming runner runs
    this exact plan as a stateful streaming dedup (parity-tested). At
    100 TB the production deployment adds ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` so key state expires instead of
    accumulating forever; that variant trades exact global dedup for
    bounded state, so the parity-tested form here keeps the exact
    semantics."""
    return dedup_transform(table(spark, sf_dir, "events"))


def dedup_transform(ev: DataFrame) -> DataFrame:
    """Core stateful-dedup plan — shared by batch query and streaming
    runner."""
    return ev.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )


@register(
    "stream_watermark_late",
    tags=("b9",),
    # Watermarking is a no-op in batch mode, so the shared transform's
    # batch form IS oracle-checkable (tumbling count per window/type).
    # The watermark's real teeth — late rows measurably dropped — are
    # asserted by the streaming parity test, which the oracle cannot
    # express (test_streaming_parity.test_watermark_drops_late_rows).
    oracle=f"""
        SELECT (epoch_us(ts) // {_5M_US}) * {_5M_US} AS wstart_us,
               event_type,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
    """,
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling agg with a 10-minute watermark declared. In batch this
    matches stream_tumbling; in the streaming runner the watermark
    bounds state and drops late rows (tests assert the drop)."""
    return watermark_transform(table(spark, sf_dir, "events"))


def watermark_transform(ev: DataFrame) -> DataFrame:
    """Core watermarked tumbling plan — in streaming the watermark
    bounds state and drops late rows (asserted by the parity tests)."""
    return (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_micros("w.start").alias("wstart_us"), "event_type", "n")
    )


_30M_US = 30 * 60 * 1_000_000


@register(
    "stream_stream_join",
    tags=("b9",),
    oracle=f"""
        SELECT c.user_id,
               c.event_id AS click_id,
               e.event_id AS next_id,
               e.event_type AS next_type,
               epoch_us(c.ts) AS click_us,
               epoch_us(e.ts) AS next_us
        FROM events c JOIN events e
          ON e.user_id = c.user_id
         AND c.event_type = 'click'
         AND e.event_id <> c.event_id
         AND epoch_us(e.ts) >= epoch_us(c.ts)
         AND epoch_us(e.ts) <= epoch_us(c.ts) + {_30M_US}
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch form: every event a user
    produces inside the 30-minute post-click attribution window (the
    funnel/attribution join every event pipeline runs). The streaming
    runner executes the identical transform as a true watermarked
    stream-stream self-join (parity-tested) — Spark buffers both sides
    in the state store and the watermark + time-range condition bound
    how long a row waits for matches, so state is finite at 100 TB/day
    event volumes."""
    return stream_join_transform(table(spark, sf_dir, "events"))


def stream_join_transform(ev: DataFrame) -> DataFrame:
    """Core interval self-join plan — shared by the batch query and the
    streaming runner. Watermarks are declared AFTER the rename so the
    event-time tag rides the joined column name on each branch; they are
    no-ops in batch mode. The join key leads with ``user_id`` so the
    state-store partitioning (and the batch shuffle) hashes on the user,
    and the time bounds let streaming evict buffered rows once the other
    side's watermark passes ``click_ts + 30 minutes``."""
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    nxt = (
        ev.select(
            F.col("user_id").alias("n_user_id"),
            F.col("event_id").alias("next_id"),
            F.col("event_type").alias("next_type"),
            F.col("ts").alias("next_ts"),
        )
        .withWatermark("next_ts", "10 minutes")
    )
    return clicks.join(
        nxt,
        [
            F.col("user_id") == F.col("n_user_id"),
            F.col("next_id") != F.col("click_id"),
            F.col("next_ts") >= F.col("click_ts"),
            F.col("next_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"),
        ],
    ).select(
        "user_id",
        "click_id",
        "next_id",
        "next_type",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("next_ts").alias("next_us"),
    )


@register(
    "stream_stateful",
    tags=("b9",),
    oracle="""
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS val_sum_scaled,
               MAX(epoch_us(ts)) AS max_ts_us
        FROM events
        GROUP BY user_id
    """,
)
def stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful per-key tracker, batch form: per user the event
    count, cent-scaled value sum, and latest event time. The streaming
    runner computes the identical result with a hand-written
    ``applyInPandasWithState`` operator (``stateful_transform``) whose
    per-key state lives in the state store; the parity test asserts the
    two agree. Sums are integer cents end-to-end so state accumulation
    order can't produce float drift."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "val_sum_scaled"
        ),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )


def stateful_transform(ev: DataFrame) -> DataFrame:
    """Streaming-only form of ``stream_stateful``: arbitrary stateful
    processing via ``applyInPandasWithState`` (SURVEY.md §2.B-9; the
    engine's escape hatch for operators windowed aggs can't express).

    Per-key state is a (count, cent_sum, max_ts_us) triple in the state
    store — constant size per user, partitioned across executors, and
    checkpointable; each microbatch emits the updated running totals
    (update mode), so the final row per key equals the batch aggregate.
    Rounding is explicit half-up to match Spark's ``F.round`` (BigDecimal
    HALF_UP) — pandas' default ``round`` is half-even and would drift on
    exact cent boundaries. The half-up is computed by *comparing* the
    fractional part against 0.5 (``frac >= 0.5``), not by adding 0.5:
    ``floor(x + 0.5)`` is lossy at the double edge case where ``x*100``
    lands on ``k.49999999999999994`` (adding 0.5 rounds the sum up to
    ``k+1.0`` in float, one cent more than F.round emits)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        n, s, mx = state.get if state.exists else (0, 0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            cents = pdf["value"].to_numpy() * 100
            whole = np.floor(cents)
            s += int((whole + (cents - whole >= 0.5)).sum())
            ts_us = pdf["ts"].astype("int64").to_numpy() // 1_000
            mx = max(mx, int(ts_us.max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "val_sum_scaled": [s],
                "max_ts_us": [mx],
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType="user_id long, n long, val_sum_scaled long, "
        "max_ts_us long",
        stateStructType="n long, s long, mx long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_cdc_upsert",
    tags=("b9",),
    oracle="""
        SELECT user_id,
               event_type,
               CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
               CAST(event_id AS BIGINT) AS last_event_id,
               value AS last_value
        FROM events
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC, value DESC
        ) = 1
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC streaming upsert, run as a REAL Structured Streaming query
    (foreachBatch + ordered merge into a ping-pong parquet target; see
    ``streaming.runner.run_events_cdc_upsert`` for mechanics and the
    100 TB notes). The oracle states the end-state invariant — the
    target holds exactly the latest (by ts, then event_id, then value)
    row per (user_id, event_type) — which the struct-max merge
    guarantees regardless of micro-batch boundaries or arrival order.
    The ``value DESC`` leg mirrors the merge struct's third field
    (ADVICE r6): event_id IS unique in the fixture, but the parity no
    longer silently relies on that — a hypothetical duplicate
    (ts, event_id) with two values resolves identically (max value) on
    both sides. The unit test additionally forces multi-batch
    out-of-order delivery."""
    import os

    from nchu_bigdata_spark.queries.relational import scratch_dir
    from nchu_bigdata_spark.streaming.runner import run_events_cdc_upsert

    # The file streaming source needs a DIRECTORY; stage the events
    # parquet into one via symlink (same trick as the parity tests).
    # scratch_dir keys on the sf-dir BASENAME only and .scratch
    # persists across runs, so a pre-existing link may point at a
    # DIFFERENT sf dir with the same basename (silent stale read) or
    # dangle (os.path.exists follows the link → False → symlink raises
    # FileExistsError). Check the link itself (lexists) and retarget.
    src_dir = scratch_dir(sf_dir, "cdc_src")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if os.path.lexists(link) and (
        not os.path.islink(link) or os.readlink(link) != target
    ):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    return run_events_cdc_upsert(
        spark, src_dir, scratch_dir(sf_dir, "cdc_target")
    )


# --------------------------------------------------------------------------
# stream_enrich_static — stream-static broadcast enrichment (round 8)
# --------------------------------------------------------------------------

# Static dimension: user tier by hash bucket. Deliberately a LITERAL
# table (not a fixture read) so the transform is self-contained for the
# streaming runner; a production job would spark.read the dimension —
# identical plan (static side broadcast into every microbatch).
_TIERS = [(0, "free"), (1, "free"), (2, "pro"), (3, "pro"), (4, "enterprise")]


def _tier_dim(spark: SparkSession) -> DataFrame:
    from nchu_bigdata_spark.io import local_rows

    return local_rows(
        spark, [(b, t) for b, t in _TIERS], "bucket long, tier string"
    )


def enrich_static_transform(ev: DataFrame) -> DataFrame:
    """Core stream-static enrichment plan — shared by the batch query
    and the Structured Streaming runner. The static dim joins against
    the (possibly streaming) event source as a broadcast hash join:
    stream-static joins are STATELESS (no watermark, no state store —
    each microbatch probes the broadcast), which is why this is the
    first-choice enrichment shape at scale; only stream-stream joins
    pay state."""
    spark = ev.sparkSession
    dim = _tier_dim(spark)
    enriched = ev.withColumn("bucket", F.col("user_id") % 5).join(
        F.broadcast(dim), "bucket"
    )
    # no countDistinct here: distinct aggregates are unsupported on
    # streaming DataFrames (state would be unbounded per group); the
    # distinct-user view of this stream is events_active_users (batch)
    # or an approx_count_distinct sketch in streaming.
    return (
        enriched.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
    )


@register(
    "stream_enrich_static",
    tags=("b9",),
    oracle=f"""
        -- the literal tier dimension replayed as a CASE
        SELECT CASE user_id % 5
                 {' '.join(f"WHEN {b} THEN '{t}'" for b, t in _TIERS)}
               END AS tier,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM events
        GROUP BY 1
    """,
)
def stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment — the missing B-9 join
    shape: a streaming fact source joined to a STATIC dimension
    (user → tier) with per-tier rollups. Stream-static joins are
    stateless (the static side broadcasts into every microbatch; no
    watermark, no state store), making them the default enrichment
    mechanism before reaching for stateful stream-stream joins.

    Batch form is oracle-checked (dim replayed as a CASE); the true
    Structured-Streaming run is parity-tested against it via the
    shared transform (`tests/test_streaming_parity.py`), like every
    other §2.B-9 id.

    Plan/scale: broadcast hash join (no shuffle of the stream) + one
    map-side-combining hash agg over tier cardinality."""
    return enrich_static_transform(table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# stream_topk — streaming windowed top-k (round 8)
# --------------------------------------------------------------------------

_TK_K = 3
_TK_WIN_US = 3_600_000_000  # 1-hour leaderboard windows


def topk_counts_transform(ev: DataFrame) -> DataFrame:
    """The STREAMING half of windowed top-k: maintain per-(window,
    type) counts incrementally. Ranking is NOT here by design — a rank
    over a streaming aggregate would be a second stateful operator
    (unsupported chained aggregation, and semantically unstable until
    the window closes); production top-k dashboards run exactly this
    split: the stream maintains the count table, the reader ranks it."""
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros("w.start").alias("wstart_us"), "event_type", "n"
        )
    )


def rank_topk(counts: DataFrame) -> DataFrame:
    """The READ half: top-k per window under a total order
    (count DESC, then type — deterministic across engines)."""
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("wstart_us").orderBy(
            F.col("n").desc(), F.col("event_type")
        )
    )
    return counts.withColumn("rk", rk).where(F.col("rk") <= _TK_K).drop("rk")


@register(
    "stream_topk",
    tags=("b9",),
    oracle=f"""
        -- end-state invariant of the streaming windowed top-k: once
        -- the stream drains, the count table equals the batch window
        -- counts, so the ranked read is this plain SQL.
        WITH c AS (
            SELECT (epoch_us(ts) // {_TK_WIN_US}) * {_TK_WIN_US}
                       AS wstart_us,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT wstart_us, event_type, n FROM (
            SELECT *, row_number() OVER (
                PARTITION BY wstart_us
                ORDER BY n DESC, event_type) AS rk
            FROM c
        ) WHERE rk <= {_TK_K}
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k over a REAL Structured Streaming run (the
    stream_cdc_upsert precedent: the registered fn IS the streaming
    query, not a batch stand-in): a 1-hour tumbling count table is
    maintained incrementally by the stream (complete-mode memory
    sink), then the top-3 types per window are ranked AT READ TIME
    over the tiny window×type table. The split matters: rank over a
    streaming aggregate would chain two stateful operators
    (unsupported, and meaningless mid-window); count-then-rank is how
    every streaming leaderboard actually ships.

    Plan/scale: streaming state = one count row per (window, type) —
    vocabulary-sized, bounded by watermark eviction in a live
    deployment; the rank pass runs over that state-table cardinality,
    never the stream. The oracle states the drained end-state
    invariant (stream counts ≡ batch counts ⇒ ranked read is plain
    SQL)."""
    import os

    from nchu_bigdata_spark.queries.relational import scratch_dir
    from nchu_bigdata_spark.streaming.runner import run_events_stream

    # Stage the single events parquet into a directory for the file
    # source (cdc's lexists/retarget discipline: .scratch persists and
    # keys on basename, so a stale link may point elsewhere or dangle).
    src_dir = scratch_dir(sf_dir, "topk_src")
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "events.parquet")
    target = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if os.path.lexists(link) and (
        not os.path.islink(link) or os.readlink(link) != target
    ):
        os.remove(link)
    if not os.path.lexists(link):
        os.symlink(target, link)
    counts = run_events_stream(
        spark, src_dir, topk_counts_transform, output_mode="complete"
    )
    return rank_topk(counts)


# --------------------------------------------------------------------------
# stream_ohlc — streaming OHLC bars (round 8)
# --------------------------------------------------------------------------


def ohlc_transform(ev: DataFrame) -> DataFrame:
    """Core 5-minute OHLC plan — shared verbatim by the batch query and
    the Structured Streaming runner (parity tested). Open/close use
    min_by/max_by over the full (ts, event_id) struct — the same
    deterministic tie-break `win_ohlc_bars` uses, but as ALGEBRAIC
    aggregates (mergeable partials), which is what lets the identical
    plan run incrementally under streaming state."""
    cents = F.round(F.col("value") * 100, 0).cast("long")
    ord_ = F.struct(F.unix_micros("ts").alias("t"), F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.min_by(cents, ord_).alias("open_cents"),
            F.max(cents).alias("high_cents"),
            F.min(cents).alias("low_cents"),
            F.max_by(cents, ord_).alias("close_cents"),
            F.sum(cents).cast("long").alias("volume_cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.unix_micros("w.start").alias("wstart_us"),
            "event_type",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "volume_cents",
            "n",
        )
    )


@register(
    "stream_ohlc",
    tags=("b9",),
    oracle=f"""
        -- 5-minute OHLC bars, the streaming-capable formulation:
        -- open/close as arg-min/arg-max by (ts, event_id) — replayed
        -- here with rank windows — high/low/volume as plain aggs, all
        -- in integer cents. The SAME transform runs under Structured
        -- Streaming (state-mergeable min_by/max_by partials) and in
        -- batch; the parity test proves they agree bar for bar.
        WITH c AS (
            SELECT (epoch_us(ts) // {_5M_US}) * {_5M_US} AS wstart_us,
                   event_type, epoch_us(ts) AS ts_us, event_id,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events
        ),
        r AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY wstart_us, event_type
                       ORDER BY ts_us, event_id) AS rk_a,
                   ROW_NUMBER() OVER (
                       PARTITION BY wstart_us, event_type
                       ORDER BY ts_us DESC, event_id DESC) AS rk_z
            FROM c
        )
        SELECT CAST(wstart_us AS BIGINT) AS wstart_us, event_type,
               CAST(MAX(CASE WHEN rk_a = 1 THEN cents END) AS BIGINT)
                   AS open_cents,
               CAST(MAX(cents) AS BIGINT) AS high_cents,
               CAST(MIN(cents) AS BIGINT) AS low_cents,
               CAST(MAX(CASE WHEN rk_z = 1 THEN cents END) AS BIGINT)
                   AS close_cents,
               CAST(SUM(cents) AS BIGINT) AS volume_cents,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM r GROUP BY wstart_us, event_type
    """,
)
def stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute OHLC bars in the STREAMING-CAPABLE formulation:
    `win_ohlc_bars` gets open/close from rank windows, which cannot
    run incrementally — this operator states them as min_by/max_by
    over the (ts, event_id) struct instead, ALGEBRAIC aggregates
    whose partials merge, so the identical transform runs under
    Structured Streaming windowed state (live price/metric bars) and
    in batch (backfill) with bar-for-bar parity — the
    Kappa-architecture property (one definition, two runtimes) that
    kills an entire class of "batch says X, stream says Y"
    reconciliation bugs. Same deterministic tie-break, same integer
    cents; the parity test runs the real file-source stream.

    Plan/scale: batch = one (window, type)-keyed hash agg combining
    map-side; streaming = the same agg over windowed state, state
    size = open bars x series, O(1) per event."""
    return ohlc_transform(table(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# stream_range_join — grid-cell interval join, dual-runtime (round 13)
# --------------------------------------------------------------------------


def range_join_transform(ev: DataFrame) -> DataFrame:
    """Grid-cell interval join shared by the batch query and the
    streaming runner — the streaming face of
    `join_range_partitioned`'s strategy (queries/joins.py): every
    'error' event opens a 120 s incident window; emit each event
    landing inside each window.

    The time axis is cut into 128 s cells (> window length, so an
    interval overlaps at most 2 cells and a point exactly 1 — no pair
    can be produced twice, no dedup pass). The cell becomes the EQUI
    conjunct: in batch Catalyst co-partitions both sides on it; under
    Structured Streaming it is the state-store key, so each task's
    buffered state is one 128 s slice of the stream, not the corpus.
    The range residual stays on the RAW event-time columns (not
    derived bigints) — that is what lets the streaming planner derive
    state-eviction bounds from the two watermarks: an incident row can
    be dropped once the event-side watermark passes inc_ts + 120 s,
    keeping state finite at any volume. Inner join + stateless
    projection → each match emits exactly once → append mode."""
    from nchu_bigdata_spark.queries.joins import _RP_CELL_US, _RP_WIN_US

    inc = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("inc_ts"),
        )
        .withWatermark("inc_ts", "10 minutes")
        .select(
            "incident_id",
            "inc_ts",
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(inc_ts) div {_RP_CELL_US}"),
                    F.expr(
                        f"(unix_micros(inc_ts) + {_RP_WIN_US} - 1)"
                        f" div {_RP_CELL_US}"
                    ),
                )
            ).alias("cell"),
        )
    )
    pts = (
        ev.select(
            F.col("event_id").alias("pt_id"),
            F.col("user_id").alias("pt_user"),
            F.col("ts").alias("pt_ts"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("pt_cents"),
        )
        .withWatermark("pt_ts", "10 minutes")
        .withColumn("pt_cell", F.expr(f"unix_micros(pt_ts) div {_RP_CELL_US}"))
    )
    joined = inc.join(
        pts,
        [
            F.col("cell") == F.col("pt_cell"),
            F.col("pt_ts") >= F.col("inc_ts"),
            F.col("pt_ts")
            < F.col("inc_ts") + F.expr("INTERVAL 120 SECONDS"),
        ],
    )
    return joined.select(
        "incident_id",
        F.col("pt_id").alias("event_id"),
        F.col("pt_user").alias("user_id"),
        F.unix_micros("pt_ts").alias("us"),
        F.col("pt_cents").alias("cents"),
    )


@register(
    "stream_range_join",
    tags=("b9",),
    oracle="""
        -- pair-level incident-window join: every event inside the
        -- 120 s window opened by each 'error' event (window includes
        -- its opening event). The aggregated face of the same shape
        -- is join_range_partitioned; this is the streaming-capable
        -- pair emission (append mode).
        WITH e AS (
            SELECT event_id, user_id, epoch_us(ts) AS us,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        i AS (
            SELECT event_id AS incident_id, epoch_us(ts) AS lo
            FROM events WHERE event_type = 'error'
        )
        SELECT i.incident_id, e.event_id, e.user_id, e.us, e.cents
        FROM i JOIN e
          ON e.us >= i.lo AND e.us < i.lo + 120000000
    """,
)
def stream_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-window interval join in the DUAL-RUNTIME formulation
    (stream_ohlc precedent): `join_range_partitioned` proves the
    grid-cell strategy in batch with an aggregated result; this
    operator emits the raw (incident, event) pairs through the SAME
    cell transform, so the identical plan object runs as a true
    watermarked stream-stream join (parity-tested by the streaming
    runner) and as a batch backfill. One definition, two runtimes —
    the reconciliation property that matters when the incident feed is
    live PagerDuty traffic and the backfill is last quarter's 100 TB.

    Plan/scale: batch = cell-equi join, per-task probe space one
    128 s slice; streaming = state keyed by cell, eviction bound =
    watermark + 120 s window (see range_join_transform)."""
    return range_join_transform(table(spark, sf_dir, "events"))
