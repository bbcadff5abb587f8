"""Run the B-9 operators as true Structured Streaming queries.

Design: ``readStream`` file source over the same parquet → the exact
batch transform → memory sink, ``Trigger.AvailableNow`` so the query
drains all available input and stops. Because every transform is the
same DataFrame plan object the batch query uses, parity is structural —
Structured Streaming is the batch engine incrementalized.

Scale notes:
  * The file source is only the test harness's ingress; in production
    the same transforms run unchanged over Kafka/queue sources — the
    plan below the source node is identical.
  * Stateful operators (windowed aggs, session windows, dedup) keep
    their state in the state store, partitioned by grouping key across
    executors; watermarks bound that state — see
    ``test_streaming_parity.py`` for the late-data-drop demonstration.
  * The memory sink collects to the driver — test-only; production
    sinks (kafka/parquet/foreachBatch) stay distributed.
"""

from __future__ import annotations

from collections.abc import Callable
from uuid import uuid4

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nchu_bigdata_spark.queries.streaming_batch import (
    dedup_transform,
    enrich_static_transform,
    ohlc_transform,
    range_join_transform,
    session_transform,
    sliding_transform,
    stateful_transform,
    stream_join_transform,
    tumbling_transform,
    watermark_transform,
)

# Parquet stores events.ts as TIMESTAMP(NANOS); how a session surfaces
# it varies (raw int64 nanos under legacy nanosAsLong, TIMESTAMP_NTZ on
# Spark 4.x, plain int64 in synthetic test fixtures). The streaming
# source needs the schema up front, so ``_probe_ts_type`` batch-reads
# the path's footer once (schema only, no data job) and the decode
# branch normalizes to microsecond TimestampType — same policy as
# ``nchu_bigdata_spark.io.table``.


#: Telemetry from the most recent streaming run in this process: the
#: query's recentProgress entries as plain dicts. This is what an
#: operator of a stateful stream watches at scale — stateOperators'
#: numRowsTotal (state-store size), numRowsDroppedByWatermark (late
#: data), per-batch numInputRows — surfaced so tests can PIN the
#: watermark-eviction and late-drop claims instead of inferring them
#: from output rows alone (VERDICT r8 item 6).
last_run_progress: list[dict] = []


def _capture_progress(q) -> None:
    import json

    global last_run_progress
    last_run_progress = [
        json.loads(p.json) if hasattr(p, "json") else p
        for p in q.recentProgress
    ]


def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def _probe_ts_type(spark: SparkSession, path: str) -> T.DataType:
    from nchu_bigdata_spark.io import read_events_parquet

    return read_events_parquet(spark, path).schema["ts"].dataType

# transform + required sink output mode for each streaming query id
STREAM_TRANSFORMS: dict[str, tuple[Callable[[DataFrame], DataFrame], str]] = {
    "stream_tumbling": (tumbling_transform, "complete"),
    "stream_sliding": (sliding_transform, "complete"),
    "stream_session": (session_transform, "complete"),
    "stream_dedup": (dedup_transform, "append"),
    "stream_watermark_late": (watermark_transform, "complete"),
    # stream-stream inner joins emit each match exactly once → append
    "stream_stream_join": (stream_join_transform, "append"),
    # grid-cell interval join (round 13): state keyed on the 128 s
    # cell, eviction bound = watermark + 120 s window
    "stream_range_join": (range_join_transform, "append"),
    # update mode: each microbatch emits the refreshed running totals
    # per key; the LAST emission per key equals the batch aggregate.
    "stream_stateful": (stateful_transform, "update"),
    # stream-static broadcast enrichment: stateless join, complete-mode
    # agg on top
    "stream_enrich_static": (enrich_static_transform, "complete"),
    # OHLC bars: algebraic min_by/max_by open/close — the same plan
    # runs incrementally (complete mode) and in batch
    "stream_ohlc": (ohlc_transform, "complete"),
}


def _decode_ts(raw: DataFrame) -> DataFrame:
    dt = raw.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        # raw int64 nanos (legacy flag or synthetic fixture)
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    elif isinstance(dt, T.TimestampType):
        ts = F.col("ts")
    else:
        # TIMESTAMP_NTZ under the UTC session clock (io.py rationale)
        ts = F.col("ts").cast(T.TimestampType())
    return raw.withColumn("ts", ts).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of an events parquet path (file or directory
    glob), decoded to the engine's canonical events schema."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = _events_raw_schema(_probe_ts_type(spark, path))
    raw = spark.readStream.schema(schema).parquet(path)
    return _decode_ts(raw)


def run_events_stream_to_parquet(
    spark: SparkSession,
    path: str,
    transform: Callable[[DataFrame], DataFrame],
    sink_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Production-shaped sink: ``writeStream`` to parquet (append mode)
    with a checkpoint location. Re-invoking with the same checkpoint
    resumes from the recorded source offsets — already-committed input
    files are not reprocessed, so the sink stays exactly-once across
    restarts (asserted by the recovery test). Drains available input
    (AvailableNow) and returns when the query stops."""
    # Pin the session clock BEFORE the schema probe: when the source
    # surfaces ts as TIMESTAMP_NTZ, _decode_ts's NTZ->Timestamp cast
    # resolves against the session TZ, so a hostile caller default would
    # otherwise write shifted instants to the parquet sink. The pin is
    # scoped to this call: AvailableNow blocks until the sink drains, so
    # the caller's TZ is restored before control returns and their
    # subsequent TZ-sensitive queries keep their own semantics.
    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key, None)
    spark.conf.set(tz_key, "UTC")
    try:
        src = spark.readStream.schema(_events_raw_schema(_probe_ts_type(spark, path)))
        if max_files_per_trigger is not None:
            src = src.option("maxFilesPerTrigger", max_files_per_trigger)
        df = transform(_decode_ts(src.parquet(path)))
        q = (
            df.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _capture_progress(q)
    finally:
        if prev_tz is None:
            spark.conf.unset(tz_key)
        else:
            spark.conf.set(tz_key, prev_tz)


def run_events_stream(
    spark: SparkSession,
    path: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Run ``transform`` over a streaming scan of ``path`` until all
    currently-available input is drained (AvailableNow), and return the
    materialized result (memory sink table).

    ``max_files_per_trigger`` splits input files into multiple
    microbatches — used by tests to advance the watermark between
    batches and observe late-data drops."""
    name = f"stream_result_{uuid4().hex[:12]}"
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = spark.readStream.schema(_events_raw_schema(_probe_ts_type(spark, path)))
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    df = transform(_decode_ts(src.parquet(path)))
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _capture_progress(q)
    return spark.table(name)


def run_events_stream_to_noop(
    spark: SparkSession,
    path: str,
    transform: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain a streaming run into the ``noop`` sink — full streaming
    execution (source → state store → sink commit protocol) with zero
    driver-side materialization. This is the measurement harness the
    10× probe uses (tools/stream_probe.py): the memory sink would make
    the driver collect the output and time the wrong thing, exactly
    like bench.py's batch noop rationale. Progress telemetry still
    lands in ``last_run_progress`` so state-store size and row counts
    are observable without materializing rows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = spark.readStream.schema(_events_raw_schema(_probe_ts_type(spark, path)))
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    df = transform(_decode_ts(src.parquet(path)))
    q = (
        df.writeStream.format("noop")
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _capture_progress(q)


def run_events_cdc_upsert(
    spark: SparkSession,
    path: str,
    target_root: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CDC-style streaming upsert: consume the events stream as a feed
    of upserts keyed by (user_id, event_type) and maintain a compacted
    parquet target holding each key's LATEST row — ordered by
    (ts, event_id), so a late-arriving older change can never clobber
    newer state (the correctness property blind last-write-wins merges
    violate; pinned by the out-of-order test).

    Mechanics: ``foreachBatch`` + ordered merge. Each micro-batch
    first compacts itself (one hash-agg: ``max(struct(ts, id, val))``
    per key), then full-merges with the live target generation via the
    same struct-max — associative and commutative, so the final state
    is independent of batch boundaries and arrival order. The target
    ping-pongs between two generation dirs because overwriting the
    parquet dir a lazy plan is reading from would destroy its own
    input mid-job.

    Scale notes: per batch this is |batch| + |target| scanned, one
    shuffle on the merge key — the standard compacting-upsert pattern
    (what Delta/Hudi MERGE does per commit, minus file-level skipping).
    At 100 TB the target would be bucketed by the merge key so the
    merge shuffle touches only the buckets a batch hits; the ping-pong
    becomes table versions (snapshot isolation) in a real table
    format. State here lives in the TARGET, not the state store, so
    unbounded key cardinality never pressures executor memory.

    Each invocation starts fresh (wipes ``target_root``), making the
    registered query deterministic and idempotent."""
    import os
    import shutil

    shutil.rmtree(target_root, ignore_errors=True)
    os.makedirs(target_root, exist_ok=True)
    gens = [os.path.join(target_root, f"gen{i}") for i in (0, 1)]
    ckpt = os.path.join(target_root, "_ckpt")
    live = {"cur": -1}  # index of the live generation; -1 = empty target

    def _packed(df: DataFrame) -> DataFrame:
        return df.select(
            "user_id",
            "event_type",
            F.struct("last_ts_us", "last_event_id", "last_value").alias("s"),
        )

    # Merge order contract: rows compete on the FULL struct
    # (last_ts_us, last_event_id, last_value) — the third leg makes the
    # winner well-defined even for a duplicate (ts, event_id) carrying
    # two different values (max value wins), so end-state parity with
    # the SQL oracle (ORDER BY ts DESC, event_id DESC, value DESC)
    # never silently relies on event_id uniqueness (ADVICE r6).
    def merge(batch: DataFrame, epoch_id: int) -> None:
        latest = (
            batch.select(
                "user_id",
                "event_type",
                F.struct(
                    F.unix_micros("ts").alias("last_ts_us"),
                    F.col("event_id").cast("long").alias("last_event_id"),
                    F.col("value").alias("last_value"),
                ).alias("s"),
            )
            .groupBy("user_id", "event_type")
            .agg(F.max("s").alias("s"))
        )
        if live["cur"] >= 0:
            tgt = _packed(batch.sparkSession.read.parquet(gens[live["cur"]]))
            latest = (
                tgt.unionByName(latest)
                .groupBy("user_id", "event_type")
                .agg(F.max("s").alias("s"))
            )
        nxt = (live["cur"] + 1) % 2
        latest.select(
            "user_id", "event_type", "s.last_ts_us", "s.last_event_id", "s.last_value"
        ).write.mode("overwrite").parquet(gens[nxt])
        live["cur"] = nxt

    src = spark.readStream.schema(_events_raw_schema(_probe_ts_type(spark, path)))
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    tz_key = "spark.sql.session.timeZone"
    prev_tz = spark.conf.get(tz_key, None)
    spark.conf.set(tz_key, "UTC")
    try:
        q = (
            _decode_ts(src.parquet(path))
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _capture_progress(q)
    finally:
        if prev_tz is None:
            spark.conf.unset(tz_key)
        else:
            spark.conf.set(tz_key, prev_tz)
    if live["cur"] < 0:  # no input at all
        return spark.createDataFrame(
            [],
            "user_id long, event_type string, last_ts_us long, "
            "last_event_id long, last_value double",
        )
    return spark.read.parquet(gens[live["cur"]])
