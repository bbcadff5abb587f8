"""Query registry — the single source of truth wiring the engine's
operator surface (SURVEY.md §2.B) to the driver contract in
``__spark_entry__.py``.

Every operator the engine claims is registered here with
  * a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
  * (when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.

Determinism contract (the driver hashes values order-insensitively but
exactly): every registered query must produce a bit-stable row multiset.
See ``compat.py`` for the decimal/rounding helpers that make float
aggregates reproducible across Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")

        # Driver-compat output layer (compat.py module doc): every
        # registered query's final DECIMAL columns become DOUBLE on both
        # engines so the driver's pandas canonicalizer sees identical
        # dtypes. No-op for queries without decimal outputs.
        from nchu_bigdata_spark.compat import finalize_oracle, finalize_output

        def final_fn(spark: SparkSession, sf_dir: str, _fn: QueryFn = fn) -> DataFrame:
            # Queries run under caller-owned sessions (the driver's);
            # pin the runtime confs that change result SEMANTICS so
            # behavior can't drift with the caller's defaults: UTC
            # session clock (timestamp bucketing/formatting), ANSI off
            # (permissive casts, matching both the reference's
            # Double.parseDouble semantics and the DuckDB oracles as
            # written), Arrow on (the pandas-UDF operators assume
            # vectorized transfer).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.ansi.enabled", "false")
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            return finalize_output(_fn(spark, sf_dir))

        final_fn.__name__ = fn.__name__
        final_fn.__doc__ = fn.__doc__
        final_fn.__wrapped__ = fn

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=final_fn,
            oracle=finalize_oracle(oracle) if oracle is not None else None,
            tags=tags,
            doc=doc or (fn.__doc__ or ""),
        )
        return fn

    return deco


# Driver presentation order. The driver checks the FIRST 50 registered
# queries each round; rotating this list is how every SURVEY §2.B id
# accumulates a driver CORRECTNESS row across rounds. Round 1 checked
# the relational/join/agg/fn/stream/sub family; round 2 checked the
# window/UDF/dedup/similarity/kmeans/text/multimodal/pipeline family
# (47 pass + 3 rows-only, 0 fail). Round 3 checked the remaining 34 —
# 41 pass + 2 rows-only, but the 7 events-table queries below errored
# because the round-3 session (pyspark 4.1.2) reads parquet
# TIMESTAMP(NANOS) as TIMESTAMP_NTZ, which io.table() then mishandled.
# That is fixed (io.py branches on the actual ts dtype); round 4
# front-loads those 7, then refreshes the 34 ids whose latest driver
# signal is round-2, then re-confirms 9 round-3 greens.
DRIVER_ORDER = [
    # -- errored in r3 (TIMESTAMP_NTZ events read, since fixed) --
    "stream_sliding",
    "scan_json",
    "fn_json",
    "stream_session",
    "stream_dedup",
    "stream_stateful",
    "stream_watermark_late",  # rows-only by design
    # -- new in round 4 (never driver-checked) --
    "stream_stream_join",
    "multimodal_decode_meta",
    # -- latest driver signal is round-2 (green); refresh under r4 --
    "tpch_q5",
    "agg_hash",
    "agg_distinct",
    "agg_approx",
    "fn_map",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_vector_mean",
    "rollup_hypertable",
    "join_shuffle",
    "join_outer",
    "join_theta_range",
    "join_bucketed",
    "join_skew_salted",
    "join_dpp",
    "stream_tumbling",
    "win_rank",
    "win_lag_lead",
    "win_frame_avg",
    "win_argmin",
    "win_running_total",
    "win_range_frame",
    "win_ntile",
    "udaf_grouped_pandas",
    "udtf_apply_in_pandas",
    "join_asof",
    "text_tokenize_tfidf",
    "text_stats",
    "text_langid",
    "text_quality",
    "text_token_count",
    "text_fingerprint",
    "multimodal_cols",
    "multimodal_framesample",
    # -- round-3 greens, re-confirmed with the remaining window slots --
    "dedup_exact",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embed_cosine",
    "dedup_clusters",
    "decontam_ngram",
    # -- 50-entry window ends here --
    "pack_sequences",
    "curate_corpus",
    "sample_stratified",
    "text_repetition",
    "sim_topk",
    "sim_ann_ivf",
    "kmeans_assign",
    "kmeans_fit",
    "multimodal_decode",
    "tpch_q3",
    "tpch_q6",
    "udf_scalar_pandas",
    "join_cross_argmin",
    "fn_math",
    "fn_array",
    "scan_csv",
    "scan_orc",
    "sink_partitioned",
    "project_select",
    "scan_parquet",
    "filter_pred",
    "lateral_explode",
    "sample_hash",
    "join_broadcast",
    "join_semi",
    "join_anti",
    "sort_limit",
    "topk_per_group",
    "set_union",
    "set_intersect",
    "set_except",
    "fn_string",
    "fn_date",
    "sub_exists",
    "sub_scalar",
    "sub_in",
]


def ordered_specs() -> dict[str, QuerySpec]:
    """Registry in driver presentation order (DRIVER_ORDER first, any
    unlisted registrations appended alphabetically so nothing is ever
    silently dropped)."""
    specs = load_all_queries()
    ordered = [n for n in DRIVER_ORDER if n in specs]
    ordered += sorted(n for n in specs if n not in DRIVER_ORDER)
    return {n: specs[n] for n in ordered}


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query/operator module (triggering registration) and
    return the registry."""
    # Imports are deferred so `import nchu_bigdata_spark` stays cheap and
    # circular imports are impossible.
    from nchu_bigdata_spark import queries as _q  # noqa: F401
    from nchu_bigdata_spark import operators as _o  # noqa: F401

    return REGISTRY
