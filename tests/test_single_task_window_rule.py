"""The explain-audit single-task-window rule (round 9, VERDICT r8 #1).

An unpartitioned Window moves its whole input to ONE task. The audit
rule must flag exactly the dangerous shape — unpartitioned window over
a non-collapsed (fact-cardinality) subtree — while passing the ~30
legitimate tiny-axis uses (windows over aggregates, heaps, literal
ladders, and joins/unions of those). These tests pin the rule against
live plans so a parser regression (e.g. the double-space scan-name bug
found while building it) cannot silently disable the gate.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tools.explain_audit import (  # noqa: E402
    SINGLE_TASK_WINDOW_OK,
    _is_unpartitioned,
    _parse_trees,
    single_task_window_violations,
)


def _violations(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return single_task_window_violations(buf.getvalue())


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def test_flags_global_rank_over_scan(li):
    bad = li.select(
        "l_orderkey",
        F.rank().over(Window.orderBy("l_extendedprice")).alias("r"),
    )
    assert _violations(bad)


def test_flags_global_frame_over_scan(li):
    # the 1-group Arguments form: sum() over () with no order spec
    bad = li.select(
        "l_orderkey",
        F.sum("l_extendedprice").over(Window.partitionBy()).alias("s"),
    )
    assert _violations(bad)


def test_passes_window_over_aggregate(li):
    agg = li.groupBy("l_returnflag").count()
    ok = agg.select(
        "l_returnflag", F.rank().over(Window.orderBy("count")).alias("r")
    )
    assert _violations(ok) == []


def test_passes_partitioned_window_over_scan(li):
    ok = li.select(
        "l_orderkey",
        F.rank()
        .over(Window.partitionBy("l_orderkey").orderBy("l_extendedprice"))
        .alias("r"),
    )
    assert _violations(ok) == []


def test_passes_window_over_join_of_aggregates(li):
    a = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    b = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("q"))
    ok = a.join(b, "l_returnflag").select(
        "l_returnflag", F.rank().over(Window.orderBy("n")).alias("r")
    )
    assert _violations(ok) == []


def test_flags_window_over_join_with_fact_side(li, spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    bad = j.select(
        "l_orderkey",
        F.rank().over(Window.orderBy("l_extendedprice")).alias("r"),
    )
    assert _violations(bad)


def test_scan_leaves_are_parsed(li):
    # regression: "Scan parquet  (1)" prints a trailing space in the
    # node name; losing the leaf made every chain end at a childless
    # Exchange and silently pass
    buf = io.StringIO()
    with redirect_stdout(buf):
        li.explain("formatted")
    nodes, _children = _parse_trees(buf.getvalue())
    assert any(t == "Scan" for _id, t in nodes.values())


def test_is_unpartitioned_classifier():
    assert _is_unpartitioned(["[fns]", "[x ASC NULLS FIRST]"])
    assert _is_unpartitioned(["[fns]"])
    assert not _is_unpartitioned(["[fns]", "[k]", "[x ASC NULLS FIRST]"])
    # partition spec without order: 2 groups but no ASC/DESC marker
    assert not _is_unpartitioned(["[fns]", "[k#12L]"])


def test_whitelist_stays_empty():
    # every registered query currently satisfies the rule structurally;
    # additions to the whitelist need a documented justification AND a
    # conscious edit here
    assert SINGLE_TASK_WINDOW_OK == {}
