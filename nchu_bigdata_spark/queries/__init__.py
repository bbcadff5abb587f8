"""Query families (SURVEY.md §2.B). Importing this package registers
every query in ``nchu_bigdata_spark.registry.REGISTRY``."""

from nchu_bigdata_spark.queries import (  # noqa: F401
    aggregates,
    analytics,
    geo,
    joins,
    profiling,
    relational,
    scalar_fns,
    scale,
    sets_sorts,
    streaming_batch,
    subqueries,
    tpch_more,
    udfs,
    warehouse,
    windows,
)
