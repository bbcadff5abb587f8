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


def release_all() -> None:
    """Unpersist every live intermediate (test teardown hook)."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        _LIVE.clear()
        return
    for tag in list(_LIVE):
        try:
            _release(spark.sparkContext, _LIVE.pop(tag))
        except Exception:  # pragma: no cover
            pass
