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


# Queries whose builder is ALLOWED to raise during the sweep (setup
# side effects that need scratch state unavailable here). Anything else
# that raises is lost plan coverage and fails the test — a silent skip
# would let a broken query drop out of the gate while staying green.
EXPECTED_SKIPS: set[str] = set()


# Pair-graph cardinality is data-dependent (O(N) on boilerplate-heavy
# corpora), so the dedup family must never FORCE a broadcast with a
# hint — broadcast decisions belong to AQE, which sees actual sizes.
# Hints survive analysis as ResolvedHint nodes in the logical plan.
DEDUP_FAMILY = [
    "dedup_minhash",
    "dedup_clusters",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_exact",
]


@pytest.mark.parametrize("name", DEDUP_FAMILY)
def test_dedup_family_has_no_unconditional_broadcast(name, spark, sf_dir):
    df = SPECS[name].fn(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, (
        f"{name}: broadcast hint on an unbounded-cardinality table"
    )


def test_no_query_plans_cartesian_or_rowwise_scan(spark, sf_dir):
    failures = {}
    skipped = set()
    for name, spec in sorted(SPECS.items()):
        if name in EXPECT:
            continue
        try:
            df = spec.fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            skipped.add(name)
            if name not in EXPECTED_SKIPS:
                failures[name] = [f"builder raised: {type(e).__name__}: {e}"]
            continue
        errs = audit(name, df)
        if errs:
            failures[name] = errs
    assert not failures, failures
    assert skipped <= EXPECTED_SKIPS, f"unexpected skips: {skipped}"
