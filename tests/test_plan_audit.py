"""Physical-plan regression gate (SURVEY.md §4): pushdown, broadcast,
bucketing, and no-cartesian assertions over every registered query.

Correctness alone isn't the bar — a query that passes its oracle but
plans a cartesian product or loses its parquet pushdown would fall over
at 100 TB. ``tools/explain_audit.py`` holds the per-query expectations;
this test keeps them green.
"""

from __future__ import annotations

import pytest

from nchu_bigdata_spark.registry import load_all_queries

from tools.explain_audit import EXPECT, audit

SPECS = load_all_queries()

# Queries with explicit plan expectations get their own test ids; the
# rest are covered by the default checks in one sweep.
EXPLICIT = sorted(set(EXPECT) & set(SPECS))


@pytest.mark.parametrize("name", EXPLICIT)
def test_plan_expectations(name, spark, sf_dir):
    errs = audit(name, SPECS[name].fn(spark, sf_dir))
    assert not errs, f"{name}: {errs}"


def test_no_query_plans_cartesian_or_rowwise_scan(spark, sf_dir):
    failures = {}
    for name, spec in sorted(SPECS.items()):
        if name in EXPECT:
            continue
        try:
            df = spec.fn(spark, sf_dir)
        except Exception:  # side-effect setup problems surface elsewhere
            continue
        errs = audit(name, df)
        if errs:
            failures[name] = errs
    assert not failures, failures
