"""Connected-components unit tests on synthetic graphs — shapes the
corpus near-dup data never exercises (long chains forcing multi-round
convergence, disjoint components, singleton pairs). The corpus-level
``dedup_clusters`` query itself is covered by the auto-generated
oracle-differential sweep (test_queries_oracle.py, DuckDB recursive
CTE)."""

from __future__ import annotations

import pytest

from nchu_bigdata_spark.operators.dedup import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df, **kw).collect()
    return {r.doc_id: (r.cluster_id, r.cluster_size, r.is_canonical) for r in rows}


def test_transitive_closure_merges_chained_pairs(spark):
    # A~B, B~C with no A~C pair must still land in ONE cluster — the
    # whole reason clusters exist on top of pairwise dedup output.
    got = _cc(spark, [(1, 2), (2, 3)])
    assert got == {1: (1, 3, 1), 2: (1, 3, 0), 3: (1, 3, 0)}


def test_long_chain_needs_multiple_rounds(spark):
    # 0-1-2-...-9 path: min label walks one hop per round, so this
    # needs ~9 propagation rounds — exercises the loop, the alternating
    # checkpoint generations, and the convergence diff.
    chain = [(i, i + 1) for i in range(9)]
    got = _cc(spark, chain)
    assert set(got) == set(range(10))
    assert all(v == (0, 10, int(k == 0)) for k, v in got.items())


def test_disjoint_components_and_edge_direction(spark):
    # Two components; edges given high->low to check symmetrization.
    got = _cc(spark, [(5, 4), (4, 6), (20, 10)])
    assert got[4] == (4, 3, 1) and got[5] == (4, 3, 0) and got[6] == (4, 3, 0)
    assert got[10] == (10, 2, 1) and got[20] == (10, 2, 0)


def test_iteration_cap_raises_instead_of_partial_result(spark):
    chain = [(i, i + 1) for i in range(9)]
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, chain, max_iters=3)
