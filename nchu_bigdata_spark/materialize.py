"""Shared-intermediate materialization with bounded storage.

Multi-consumer queries (MinHash shingles feeding 4 consumers, the
hypertable's fine level feeding 2 coarser rollups) need an intermediate
computed once, not once per consumer — and not once per *concurrent*
consumer: with a lazy persist, Spark schedules independent consumer
stages in parallel and each recomputes the partitions before any block
lands in the cache ("Block already exists" warnings = duplicated work).

Mechanism choice (measured, sf0.1 MinHash shingles, warm session):

* eager ``localCheckpoint`` — RDD-level block store: **2.2 s/run,
  stable**;
* ``persist(MEMORY_AND_DISK)`` + eager materialization — SQL columnar
  cache: **10-44 s/run, erratic** (building compressed columnar batches
  for millions of short strings costs more than the query itself).

Re-measured after the Spark 4.1.2 upgrade (round 4, dedup_minhash sf0.1,
3 warm reps): localCheckpoint 1.9-2.4 s vs eager persist 2.1-2.9 s —
the gap narrowed (the 4.x cache builder is much faster) but checkpoint
still wins; decision stands.

So: eager ``localCheckpoint``, with the leak the advisor flagged fixed —
round 1 never released checkpoint blocks, so repeated invocations
(bench reps, plan-audit sweeps, oracle runs) accumulated executor
storage for the session lifetime. ``shared_intermediate`` keeps **one
live generation per tag**: it diffs the JVM persistent-RDD map around
the checkpoint to learn which RDD ids the new generation owns, and
unpersists the previous generation's ids on the next call (or via
``release_all`` in teardown). Storage is bounded at one copy per query
no matter how many times the query is rebuilt.

The build-time job eager checkpointing runs is deliberate: one pass to
materialize beats 2-4 concurrent consumer recomputes, and a production
pipeline would persist this table (or stage it) anyway — the point is
the storage has an owner with a release path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# tag -> persistent RDD ids owned by the live generation
_LIVE: dict[str, list[int]] = {}

# Plan-audit hook (tools/explain_audit.py, VERDICT r9 item 5): a
# checkpointed segment's physical plan is INVISIBLE in the consumer
# query's explain (it shows only Scan ExistingRDD), so a fact-
# cardinality single-task window hidden inside a frozen segment would
# escape the structural audit and surface only as WindowExec WARN
# noise at execution. When the audit enables this flag, every
# shared_intermediate call also records the segment's formatted plan
# under its tag for the same structural walk the final plans get.
# Off by default: production/bench builds pay zero extra planning.
CAPTURE_SEGMENT_PLANS = False
SEGMENT_PLANS: dict[str, str] = {}


def _persistent_ids(sc) -> set[int]:
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet()}


def _release(sc, rdd_ids: list[int]) -> None:
    jmap = sc._jsc.getPersistentRDDs()
    for rid in rdd_ids:
        rdd = jmap.get(rid)
        if rdd is not None:
            rdd.unpersist(False)


def shared_intermediate(tag: str, df: DataFrame, eager: bool = True) -> DataFrame:
    """Eagerly ``localCheckpoint`` ``df`` as the single live generation
    for ``tag``, releasing the previous generation's blocks."""
    sc = df.sparkSession.sparkContext
    if CAPTURE_SEGMENT_PLANS:
        import io as _io
        from contextlib import redirect_stdout

        buf = _io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        SEGMENT_PLANS[tag] = buf.getvalue()
    before = _persistent_ids(sc)
    out = df.localCheckpoint(eager=eager)
    new_ids = sorted(_persistent_ids(sc) - before)
    prev = _LIVE.pop(tag, None)
    if prev:
        try:
            _release(sc, prev)
        except Exception:  # pragma: no cover - session already stopped
            pass
    _LIVE[tag] = new_ids
    return out


# tag -> live persisted DataFrame (shared_partitioned generations)
_LIVE_DF: dict[str, DataFrame] = {}


def shared_partitioned(tag: str, df: DataFrame) -> DataFrame:
    """Persist (SQL columnar cache) instead of ``localCheckpoint`` for
    the rare shared segment whose OUTPUT PARTITIONING downstream
    consumers must see: a checkpointed segment scans back as
    ``Scan ExistingRDD`` with unknown partitioning, so every consumer
    join re-shuffles it, while ``InMemoryTableScan`` reports its
    child's ``hashpartitioning`` and a co-partitioned SHUFFLE_HASH
    join streams the cached side in place (graph_random_walk r14: 4
    walk steps re-exchanged the 2.4M-row edge table once per step
    under the checkpoint; cached + pre-partitioned, only the |V|-row
    frontier moves). The general default stays ``shared_intermediate``
    — the module-docstring measurements (columnar-cache build cost on
    string-heavy millions-of-rows segments) still hold; use THIS only
    when a preserved partitioning pays for the cache build.

    Same bounded-storage contract: one live generation per tag. The
    previous generation is unpersisted BEFORE the new persist — the
    cache manager keys entries by analyzed plan, so for the common
    rebuild-the-same-plan case an unpersist after the new persist
    would evict the block the new generation just registered."""
    spark = df.sparkSession
    if CAPTURE_SEGMENT_PLANS:
        import io as _io
        from contextlib import redirect_stdout

        buf = _io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        SEGMENT_PLANS[tag] = buf.getvalue()
    prev = _LIVE_DF.pop(tag, None)
    if prev is not None:
        try:
            prev.unpersist(False)
        except Exception:  # pragma: no cover - session already stopped
            pass
    out = df.persist()
    # eager: one materialization pass beats N concurrent consumer
    # recomputes racing the cache (same rationale as the eager
    # localCheckpoint above)
    out.count()
    _LIVE_DF[tag] = out
    return out


def range_pid_frozen(tag: str, df: DataFrame, *sort_cols) -> DataFrame:
    """Range-repartition ``df`` on ``sort_cols``, stamp
    ``spark_partition_id`` and FREEZE the result (eager
    ``localCheckpoint`` via :func:`shared_intermediate`).

    The distributed two-pass rank (win_lorenz pattern) fans the
    range-partitioned frame into two branches — per-pid counts (→
    running offsets) and per-pid local ``row_number`` — and adds them
    back together. ``repartitionByRange`` samples its boundaries with a
    per-execution seed and column pruning makes the two branch subtrees
    non-identical, so on Spark 4.1.2 the physical plan contains TWO
    independent rangepartitioning exchanges and no ReusedExchange: the
    offset branch and the row-number branch can observe *different*
    partitionings, silently corrupting every global rank (ADVICE r9,
    high). Freezing the pid-stamped frame pins ONE sampled partitioning
    that both branches then read from the RDD block store; downstream
    plans show ``Scan ExistingRDD`` and zero rangepartitioning
    exchanges (asserted by tests/test_two_pass_rank.py).

    At 100 TB this materializes only the post-rollup key frame (the
    pattern is always applied after a groupBy shrank the input to
    entity cardinality), the same storage class as every other
    ``shared_intermediate`` site.
    """
    from pyspark.sql import functions as F

    nparts = df.sparkSession.sparkContext.defaultParallelism
    srt = df.repartitionByRange(nparts, *sort_cols)
    return shared_intermediate(
        tag, srt.withColumn("pid", F.spark_partition_id())
    )


def release_all() -> None:
    """Unpersist every live intermediate (test teardown hook)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        _LIVE.clear()
        _LIVE_DF.clear()
        return
    for tag in list(_LIVE):
        try:
            _release(spark.sparkContext, _LIVE.pop(tag))
        except Exception:  # pragma: no cover
            pass
    for tag in list(_LIVE_DF):
        try:
            _LIVE_DF.pop(tag).unpersist(False)
        except Exception:  # pragma: no cover
            pass
