"""Round-14 op tests: shared_partitioned materialization + the
graph_random_walk co-partitioned SHUFFLE_HASH rework (VERDICT r13
item 8)."""

import re

from pyspark.sql import functions as F

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


def _final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# --------------------------------------------------------------------------
# shared_partitioned
# --------------------------------------------------------------------------


def test_shared_partitioned_bounded_and_partitioning_preserved(spark):
    """(a) One live generation per tag: a repeat call unpersists the
    previous generation (its storage level drops to NONE) — including
    the same-plan rebuild case, where an unpersist AFTER the new
    persist would evict the cache entry the new generation just
    registered (cache manager keys by analyzed plan); (b) the cached
    segment's hashpartitioning survives into consumer joins: a
    SHUFFLE_HASH join against the pre-partitioned cached side
    exchanges ONLY the probe side."""
    from nchu_bigdata_spark.materialize import _LIVE_DF, shared_partitioned

    base = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("payload")
    )
    gen1 = shared_partitioned("t14_seg", base.repartition("k"))
    assert gen1.storageLevel.useMemory
    # same-plan rebuild: the NEW generation must hold live storage
    gen2 = shared_partitioned("t14_seg", base.repartition("k"))
    assert gen2.storageLevel.useMemory
    assert gen2.count() == 10_000  # cache not evicted by gen1 release
    # different-plan rebuild releases the old generation's storage
    gen3 = shared_partitioned(
        "t14_seg", base.filter(F.col("k") < 50).repartition("k")
    )
    assert gen3.storageLevel.useMemory
    assert not gen2.storageLevel.useMemory  # previous generation freed
    assert list(_LIVE_DF) .count("t14_seg") == 1

    probe = spark.range(0, 1_000).select((F.col("id") % 100).alias("k"))
    joined = probe.hint("shuffle_hash").join(gen3, "k")
    joined.collect()
    plan = _final_plan(joined)
    assert "ShuffledHashJoin" in plan, plan
    assert "InMemoryTableScan" in plan, plan
    # exactly ONE EXECUTING exchange below the join: the probe side.
    # The cached side's hashpartitioning(k) satisfies the join
    # requirement, so no exchange sits between the join and
    # InMemoryTableScan — the plan string also prints the cached
    # relation's BUILD-TIME exchange inside the InMemoryRelation
    # subtree, so restrict the count to the executing region above it.
    exec_region = plan.split("InMemoryRelation")[0]
    assert (
        len(re.findall(r"Exchange hashpartitioning\(k", exec_region)) == 1
    ), plan
    shared_partitioned("t14_seg", base.limit(1))  # cheap final gen
    from nchu_bigdata_spark.materialize import release_all

    release_all()
    assert "t14_seg" not in _LIVE_DF


# --------------------------------------------------------------------------
# graph_random_walk — co-partitioned SHJ plan shape
# --------------------------------------------------------------------------


def test_random_walk_shj_plan(spark, sf_dir):
    """Every step joins frontier x edges as a ShuffledHashJoin (no
    sort-merge, no window, no cartesian product) and the cached edge
    side scans as InMemoryTableScan — the shape where only the
    |V|-row frontier shuffles per step."""
    df = SPECS["graph_random_walk"].fn(spark, sf_dir)
    df.collect()
    plan = _final_plan(df)
    from nchu_bigdata_spark.operators.graph import _WALK_STEPS

    assert len(re.findall(r"ShuffledHashJoin", plan)) == _WALK_STEPS, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "InMemoryTableScan" in plan, plan


def test_random_walk_cache_does_not_leak(spark, sf_dir):
    """Repeated walk builds keep ONE live edges generation — the r14
    persist switch must not reintroduce the round-1 storage leak
    (VERDICT r1: unreleased blocks accumulated over bench reps)."""
    jsc = spark.sparkContext._jsc
    SPECS["graph_random_walk"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    n1 = jsc.getPersistentRDDs().size()
    for _ in range(2):
        SPECS["graph_random_walk"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
    assert jsc.getPersistentRDDs().size() == n1
