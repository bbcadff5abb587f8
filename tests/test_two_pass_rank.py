"""Distributed two-pass rank — the frozen-partitioning contract.

ADVICE r9 (high): the two-pass rank fans one range-partitioned frame
into a per-pid-counts branch and a per-pid row_number branch. Without
materialization, Spark 4.1.2 compiles TWO independent rangepartitioning
exchanges (column pruning makes the subtrees non-identical, so no
ReusedExchange) whose boundaries are sampled with per-execution seeds —
the branches can observe different partitionings and the global ranks
silently corrupt. ``materialize.range_pid_frozen`` pins ONE sampled
partitioning via eager localCheckpoint; these tests enforce both the
plan shape (no rangepartitioning survives into the consumer plan, the
pid source is the frozen RDD) and rank correctness against a
single-window reference on the small fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.materialize import range_pid_frozen
from nchu_bigdata_spark.registry import load_all_queries

# every query built on the two-pass rank pattern
TWO_PASS_IDS = [
    "win_lorenz",
    "agg_gini",
    "orders_abc_class",
    "orders_customer_migration",
    "sample_curriculum",
    "events_conversion_lag",  # r10: gap-support cumulative, same freeze
    "text_heaps_law",  # r11: doc-rank spine, same freeze
]


@pytest.mark.parametrize("name", TWO_PASS_IDS)
def test_no_duplicate_range_exchange(spark, sf_dir, name):
    """The consumer plan must read the frozen RDD — zero
    rangepartitioning exchanges downstream of the freeze. One
    rangepartitioning in this plan means the freeze was dropped; two
    would be the silent-corruption shape the fix removed."""
    specs = load_all_queries()
    df = specs[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan, name
    assert "ExistingRDD" in plan, name


def test_frozen_rank_matches_single_window_reference(spark, sf_dir):
    """Global rank from (offset + partition-local row_number) over the
    frozen pid frame must equal the plain unpartitioned row_number on
    the same total order (small fixture, so the single-task window
    reference is fine here)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(
            "1000 * octet_length(replace(text, ' ', ''))"
            " div size(split(text, ' '))"
        ).alias("d"),
    )
    pid = range_pid_frozen("test_two_pass.pid", docs, "d", "doc_id")
    pc = pid.groupBy("pid").agg(F.count(F.lit(1)).alias("pn"))
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = pc.select(
        "pid", F.coalesce(F.sum("pn").over(w_off), F.lit(0)).alias("off")
    )
    w_local = Window.partitionBy("pid").orderBy("d", "doc_id")
    got = (
        pid.withColumn("rl", F.row_number().over(w_local))
        .join(F.broadcast(off), "pid")
        .select("doc_id", (F.col("off") + F.col("rl")).alias("rnk"))
    )
    ref = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("d", "doc_id")).alias("rnk"),
    )
    diff = got.join(ref, "doc_id").filter(got.rnk != ref.rnk).count()
    assert diff == 0


def test_pid_frame_is_stable_across_consumers(spark, sf_dir):
    """Reading the frozen frame twice yields identical (doc_id, pid)
    assignments — the property the two branches rely on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("d")
    )
    pid = range_pid_frozen("test_two_pass.stable", docs, "d", "doc_id")
    a = {r["doc_id"]: r["pid"] for r in pid.select("doc_id", "pid").collect()}
    b = {r["doc_id"]: r["pid"] for r in pid.select("doc_id", "pid").collect()}
    assert a == b
