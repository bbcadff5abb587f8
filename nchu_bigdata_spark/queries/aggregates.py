"""B-4 Aggregations (SURVEY.md §2.B-4).

Generalizes the reference's group-by-key + per-group vector mean
(``hadoop_tutorial/src/Kmeans.java:79,101-112`` — Hadoop shuffle with NO
combiner, whole group buffered in reducer RAM). Spark's hash aggregate
does partial (map-side) + final aggregation automatically, so none of
these queries move raw rows across the shuffle — only partial states.
At 100 TB that's the difference between shuffling terabytes and
megabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nchu_bigdata_spark.compat import (
    davg,
    dround,
    dsum,
    sql_davg,
    sql_dsum,
)
from nchu_bigdata_spark.io import parallel_table, table
from nchu_bigdata_spark.materialize import shared_intermediate
from nchu_bigdata_spark.registry import register


@register(
    "agg_hash",
    tags=("b4", "flagship"),
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_disc_price,
            CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_charge,
            CAST(ROUND(AVG(l_quantity), 4) AS DECIMAL(18,4)) AS avg_qty,
            CAST(ROUND(AVG(l_extendedprice), 4) AS DECIMAL(18,4)) AS avg_price,
            CAST(ROUND(AVG(l_discount), 4) AS DECIMAL(18,4)) AS avg_disc,
            COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query.

    Scan → filter (pushed to parquet) → hash agg (partial+final) on two
    low-cardinality keys. Generalizes ref A9/A10
    (``src/Kmeans.java:79,101-112``).

    Parallelism-guarded scan: the 7 decimal partial aggregates are the
    dominant CPU and they run *before* the (tiny, 6-group) final-agg
    shuffle, so they're bound by scan splits (A/B at sf0.1: 1.5→0.9s).
    Catalyst still pushes the shipdate filter below the round-robin
    exchange into the parquet scan — verified in the plan audit.
    """
    li = parallel_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    tags=("b4",),
    oracle="""
        SELECT
            l_returnflag,
            COUNT(DISTINCT l_orderkey) AS n_orders,
            COUNT(DISTINCT l_suppkey) AS n_suppliers,
            ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(l_linestatus))), ',') AS statuses
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + collect_set (sorted, then serialized to a
    ``,``-joined string — raw array output crashes the driver's pandas
    canonicalizer, see compat.py)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
    )


@register(
    "agg_approx",
    tags=("b4", "rows-only"),
    oracle=None,  # nondeterministic sketches — verified by property test
    doc="approx_count_distinct (HLL++) + approx percentiles; rows-only.",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — sketch-based, scale path for 100 TB
    cardinality/quantile estimation. Accuracy asserted by pytest property
    (within rsd of exact), not by the DuckDB oracle. Quartiles are three
    scalar columns (an array output would crash the driver's pandas
    canonicalizer even on this rows-only check)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.25, 10000).alias("price_p25"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("price_p50"),
        F.percentile_approx("l_extendedprice", 0.75, 10000).alias("price_p75"),
    )


@register(
    "agg_grouping_sets",
    tags=("b4",),
    oracle="""
        SELECT
            o_orderstatus,
            o_orderpriority,
            COUNT(*) AS n,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS total,
            CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
            CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING markers (subtotal + grand-total rows)."""
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
    )


@register(
    "agg_pivot",
    tags=("b4",),
    oracle="""
        SELECT
            l_returnflag,
            CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS F,
            CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS O
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide (ref §1: the PM2.5 24-hour wide layout is a pivot
    of the tidy form). Pivot values are enumerated explicitly — at scale,
    letting Spark infer them costs an extra full pass."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
    )


@register(
    "agg_vector_mean",
    tags=("b4", "b10"),
    oracle="""
        WITH ex AS (
            SELECT label,
                   generate_subscripts(embedding, 1) AS pos,
                   CAST(UNNEST(embedding) AS DOUBLE) AS v
            FROM embeddings
        )
        SELECT label,
               CAST(pos AS INT) AS pos,
               CAST(ROUND(AVG(v), 4) AS DECIMAL(18,4)) AS mv
        FROM ex GROUP BY label, pos
    """,
)
def agg_vector_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise mean of an array column per group (ref A10: per-cluster
    centroid mean, ``src/Kmeans.java:101-112``).

    posexplode → (label, pos) hash agg, emitted in tidy form — one row
    per (group, dimension), 1-based ``pos`` matching SQL subscripts.
    Fully shuffle-parallel: no single reducer ever sees a whole group's
    raw vectors, unlike the reference's reducer which buffers the entire
    cluster in RAM (``src/Kmeans.java:93-97``). The tidy output (rather
    than reassembled arrays) is deliberate: array columns crash the
    driver's pandas canonicalizer; `operators/kmeans.py` shows the
    array-native composition where vectors stay internal.
    """
    emb = table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    ).withColumn("v", F.col("v").cast("double"))
    return exploded.groupBy("label", (F.col("pos") + 1).cast("int").alias("pos")).agg(
        davg("v").alias("mv")
    )


@register(
    "rollup_hypertable",
    tags=("b4",),
    oracle="""
        -- TZ-free epoch arithmetic throughout (like the streaming
        -- oracles): time_bucket/date_trunc on TIMESTAMPTZ truncate in
        -- DuckDB's SESSION TimeZone, so on a non-UTC driver host the
        -- '1h'/'1d' buckets would shift against Spark's UTC-pinned
        -- date_trunc. Integer flooring of epoch_us is engine- and
        -- TZ-invariant (events are post-1970, so // floors exactly).
        WITH fine AS (
            SELECT event_type,
                   (epoch_us(ts) // 900000000) * 900000000 AS bu,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(value AS DECIMAL(20,6))) AS sv
            FROM events GROUP BY 1, 2
        ),
        hr AS (
            SELECT event_type, (bu // 3600000000) * 3600000000 AS bu,
                   SUM(n) AS n, SUM(sv) AS sv
            FROM fine GROUP BY 1, 2
        ),
        dy AS (
            SELECT event_type, (bu // 86400000000) * 86400000000 AS bu,
                   SUM(n) AS n, SUM(sv) AS sv
            FROM hr GROUP BY 1, 2
        )
        SELECT '15m' AS granularity, event_type, bu AS bucket_us,
               CAST(n AS BIGINT) AS n_events,
               CAST(sv AS DECIMAL(38,6)) AS sum_value
        FROM fine
        UNION ALL
        SELECT '1h', event_type, bu, CAST(n AS BIGINT),
               CAST(sv AS DECIMAL(38,6))
        FROM hr
        UNION ALL
        SELECT '1d', event_type, bu, CAST(n AS BIGINT),
               CAST(sv AS DECIMAL(38,6))
        FROM dy
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass over raw
    events builds the finest (15-minute) buckets; hourly and daily
    levels RE-AGGREGATE the next-finer level's partial states (exact
    decimal sums are associative, so re-agg == direct agg).

    This is the 100 TB time-series pattern: raw data is scanned exactly
    once (the fine level is materialized via a tagged eager
    ``localCheckpoint``, ``materialize.py`` — the stand-in for a
    persisted continuous aggregate); each coarser level
    aggregates ~bucket-count rows, not the corpus. Bucket alignment is
    engine-neutral because 15 minutes divides the hour."""
    ev = table(spark, sf_dir, "events")
    fine = (
        ev.groupBy("event_type", F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("sv"),
        )
        .select("event_type", F.col("w.start").alias("b"), "n", "sv")
    )
    fine = shared_intermediate("rollup_hypertable.fine", fine)
    hr = (
        fine.groupBy("event_type", F.date_trunc("hour", "b").alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )
    dy = (
        hr.groupBy("event_type", F.date_trunc("day", "b").alias("b"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    )

    def level(df: DataFrame, g: str) -> DataFrame:
        return df.select(
            F.lit(g).alias("granularity"),
            "event_type",
            F.unix_micros("b").alias("bucket_us"),
            F.col("n").cast("long").alias("n_events"),
            F.col("sv").cast("decimal(38,6)").alias("sum_value"),
        )

    return level(fine, "15m").unionAll(level(hr, "1h")).unionAll(
        level(dy, "1d")
    )


# --------------------------------------------------------------------------
# agg_sketch_merge — mergeable HLL sketches (shard partials → union)
# --------------------------------------------------------------------------


@register(
    "agg_sketch_merge",
    tags=("b4", "rows-only"),
    oracle=None,  # sketch estimates — bounded-checked in the sweep
    doc="Apache DataSketches HLL: per-shard partial sketches unioned to "
    "group totals; merged estimate must equal the direct estimate.",
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality sketches — THE 100 TB counting pattern:
    each shard/day builds a tiny HLL sketch of its keys once
    (``hll_sketch_agg``), and any later rollup unions the binary
    sketches (``hll_union_agg``) without touching raw data again.
    Demonstrated per l_returnflag with ship-month shards, estimating
    the same cardinality twice: once directly, once through the
    shard-union path. DataSketches HLL is NOT bit-identical across the
    two paths (sparse-mode coupons promote to dense registers at
    different points, and unions widen HLL_4 targets to HLL_8), so the
    honest invariant — certified by the sweep's bounded check and
    pytest — is that merged and direct agree within a few sketch
    standard deviations of each other AND both sit within ±5σ of
    DuckDB's exact distinct count (lgConfigK=12 → rsd ≈ 1.6%).
    Measured at sf0.01 the two paths differ by ~0.1%.

    Plan: two hash-aggs over sketch partials (map-side combined binary
    states, never raw keys on the wire) + one direct sketch agg; at
    scale the month shards would be persisted once and every later
    query reads ONLY sketches — this query is the re-aggregation
    shape, the cardinality analog of ``rollup_hypertable``."""
    li = table(spark, sf_dir, "lineitem")
    shard = li.groupBy(
        "l_returnflag", F.date_trunc("month", "l_shipdate").alias("shard")
    ).agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
    merged = shard.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_merged"),
        F.count(F.lit(1)).alias("n_shards"),
    )
    direct = li.groupBy("l_returnflag").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias(
            "est_direct"
        )
    )
    return merged.join(direct, "l_returnflag").select(
        "l_returnflag", "n_shards", "est_merged", "est_direct"
    )


# --------------------------------------------------------------------------
# agg_percentile_exact — exact interpolated percentiles per group
# --------------------------------------------------------------------------


@register(
    "agg_percentile_exact",
    tags=("b4",),
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(quantile_cont(l_quantity, 0.5), 4) AS DOUBLE) AS p50_qty,
               CAST(ROUND(quantile_cont(l_quantity, 0.95), 4) AS DOUBLE) AS p95_qty,
               CAST(ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS DOUBLE) AS p50_price,
               CAST(ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS DOUBLE) AS p99_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group percentiles (linear interpolation between order
    statistics — the PERCENTILE_CONT definition both engines share),
    complementing ``agg_approx``'s sketch path: approx is the 100 TB
    default, exact is what you run to calibrate the sketch's error on
    a sample, and both now live in the same engine.

    Plan: Spark's ``percentile`` is a typed-aggregate: per-partition
    partial state (value buffer) merges at the final agg — one shuffle
    keyed by group, no global sort of the table (contrast a naive
    row_number-over-full-sort implementation). Exact percentiles
    buffer each group's values, so at 100 TB this is for
    bounded-cardinality groups or sampled calibration — precisely how
    it's framed vs agg_approx. Interpolated results are rounded to 4dp
    (compat.py policy) since the interpolation arithmetic is float."""
    li = table(spark, sf_dir, "lineitem")

    def pct(col: str, p: float, alias: str):
        return F.round(F.percentile(col, F.lit(p)), 4).cast("double").alias(alias)

    return li.groupBy("l_returnflag").agg(
        pct("l_quantity", 0.5, "p50_qty"),
        pct("l_quantity", 0.95, "p95_qty"),
        pct("l_extendedprice", 0.5, "p50_price"),
        pct("l_extendedprice", 0.99, "p99_price"),
    )


# --------------------------------------------------------------------------
# agg_corr — per-group correlation / covariance moments
# --------------------------------------------------------------------------


@register(
    "agg_corr",
    tags=("b4",),
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(corr(l_quantity, l_extendedprice), 4) AS DOUBLE)
                   AS qty_price_corr,
               CAST(ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE)
                   AS qty_price_cov,
               CAST(ROUND(stddev_samp(l_quantity), 4) AS DOUBLE) AS qty_std
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group second-moment statistics: Pearson correlation, sample
    covariance, and sample stddev — the profiling pass behind feature
    selection and drift monitoring.

    Plan: all three are DECLARED co-moment aggregates (count/mean/M2
    partial states merged associatively), so one partial+final hash agg
    computes everything — no two-pass mean-then-residual dance and no
    window. Results round to a fixed grid (compat.py): the co-moment
    merge order differs between engines only in final ulps."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4)
        .cast("double")
        .alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
        .cast("double")
        .alias("qty_price_cov"),
        F.round(F.stddev_samp("l_quantity"), 4).cast("double").alias("qty_std"),
    )


# --------------------------------------------------------------------------
# agg_bitmap_distinct — exact distinct counting via mergeable bitmaps
# --------------------------------------------------------------------------


@register(
    "agg_bitmap_distinct",
    tags=("b4",),
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bucketed roaring-style bitmaps —
    the warehouse bitmap-index pattern (Doris/ClickHouse/StarRocks
    `bitmap_union_count`): keys map to (bucket, bit position), each
    shard builds per-bucket bitmaps, shards merge with a cheap
    bitwise OR, and the count is the sum of per-bucket popcounts.

    Next to the two other distinct paths the engine carries this
    completes the trade-off triangle: `agg_distinct` (shuffle raw
    keys — exact, wide), `agg_approx`/`agg_sketch_merge` (sketches —
    tiny state, bounded error), and THIS (exact AND mergeable state:
    bitmap bytes are a constant factor of the key range per bucket,
    and re-aggregation across shards/days is an OR, not a re-scan —
    the pattern that makes exact daily→monthly distinct rollups
    feasible at 100 TB). The deliberate extra shard level below proves
    the merge path (bitmap_or_agg), mirroring agg_sketch_merge's
    shape with an exact answer the oracle can hash-check.

    Plan: two hash-agg levels + final sum — all map-side combinable;
    the only wide rows are the per-(group, bucket) bitmaps."""
    li = table(spark, sf_dir, "lineitem")
    bucketed = li.select(
        "l_returnflag",
        F.bitmap_bucket_number("l_orderkey").alias("bkt"),
        F.bitmap_bit_position("l_orderkey").alias("pos"),
        (F.col("l_orderkey") % 4).alias("shard"),
    )
    shard_maps = bucketed.groupBy("l_returnflag", "bkt", "shard").agg(
        F.bitmap_construct_agg("pos").alias("bm")
    )
    merged = shard_maps.groupBy("l_returnflag", "bkt").agg(
        F.bitmap_or_agg("bm").alias("bm")
    )
    return merged.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).alias("n_distinct")
    )


# --------------------------------------------------------------------------
# agg_regression — per-group OLS moments (slope/intercept/r²)
# --------------------------------------------------------------------------


@register(
    "agg_regression",
    tags=("b4",),
    oracle="""
        SELECT l_returnflag,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
               CAST(ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS DOUBLE)
                   AS slope,
               CAST(ROUND(regr_intercept(l_extendedprice, l_quantity), 2) AS DOUBLE)
                   AS intercept,
               CAST(ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS DOUBLE) AS r2
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares moments (price ~ quantity):
    the SQL-standard REGR_* family — slope, intercept, r² — computed
    as declared co-moment aggregates, completing `agg_corr`'s
    second-moment profile with the fitted-line view (drift dashboards,
    quick elasticity probes).

    Plan: like `agg_corr`, everything reduces to (n, Σx, Σy, Σxy, Σx²,
    Σy²) partials merged associatively — ONE partial+final hash agg,
    no second pass. Fixed-grid rounding per compat.py."""
    li = table(spark, sf_dir, "lineitem")
    y, x = "l_extendedprice", "l_quantity"
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).alias("n"),
        F.round(F.regr_slope(y, x), 4).cast("double").alias("slope"),
        F.round(F.regr_intercept(y, x), 2).cast("double").alias("intercept"),
        F.round(F.regr_r2(y, x), 4).cast("double").alias("r2"),
    )
