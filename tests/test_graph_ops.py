"""Semantics tests for the graph operators (graph_pagerank,
graph_triangles) and the round-6 source/sampling additions
(scan_text, sample_reservoir) on hand-computable fixtures.

The registry-wide oracle differential proves Spark↔DuckDB agreement on
the synthetic corpus; these pin the algorithms themselves: the exact
scaled-int PageRank recurrence against an independent Python replay,
triangle counts on graphs with known closed forms, input-order
invariance of the reservoir sample, and tab-preservation in the text
round trip.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

_PR_SCALE = 1_000_000_000
_PR_BASE = 150_000_000


def _write_lineitem_orders(path, orders: dict[int, list[int]]) -> None:
    """orders: {orderkey: [partkeys]} — minimal lineitem fixture."""
    ok, pk = [], []
    for o, parts in orders.items():
        for p in parts:
            ok.append(o)
            pk.append(p)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        str(path / "lineitem.parquet"),
    )


def _pagerank_replay(edges: set[tuple[int, int]], iters: int = 5) -> dict[int, int]:
    """Independent integer-recurrence replay (symmetrized edges in)."""
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    deg = {u: len(vs) for u, vs in out.items()}
    r = {u: _PR_SCALE for u in deg}
    for _ in range(iters):
        acc: dict[int, int] = defaultdict(int)
        for u, vs in out.items():
            c = r[u] // deg[u]
            for v in vs:
                acc[v] += c
        r = {v: _PR_BASE + (85 * s) // 100 for v, s in acc.items()}
    return r


def _sym(pairs):
    s = set()
    for a, b in pairs:
        s.add((a, b))
        s.add((b, a))
    return s


def test_pagerank_matches_integer_replay(spark, tmp_path):
    # path-with-hub: orders chain parts 1-2, 2-3, 3-4 plus a hub order
    # {1, 5, 6} — irregular degrees so ranks differ per node
    _write_lineitem_orders(
        tmp_path, {10: [1, 2], 11: [2, 3], 12: [3, 4], 13: [1, 5, 6]}
    )
    edges = _sym([(1, 2), (2, 3), (3, 4), (1, 5), (1, 6), (5, 6)])
    expect = _pagerank_replay(edges)
    got = {
        r.p_partkey: r.rank_scaled
        for r in SPECS["graph_pagerank"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    # the hub (part 1, degree 4) must outrank every leaf
    assert got[1] == max(got.values())


def test_triangles_closed_forms(spark, tmp_path):
    # one K4 order (C(4,3)=4 triangles) + a disjoint path 10-11-12
    # (0 triangles) + an order that closes 10-11-12 into a K3 (+1)
    _write_lineitem_orders(
        tmp_path,
        {1: [1, 2, 3, 4], 2: [10, 11], 3: [11, 12], 4: [10, 11, 12]},
    )
    row = SPECS["graph_triangles"].fn(spark, str(tmp_path)).collect()[0]
    assert row.n_nodes == 7
    assert row.n_edges == 6 + 3  # K4 + K3(10,11,12)
    assert row.n_triangles == 4 + 1


def _write_documents(path, rows) -> None:
    """rows: (doc_id, lang, text)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[2] for r in rows]),
                "lang": pa.array([r[1] for r in rows]),
                "source": pa.array(["s"] * len(rows)),
                "n_chars": pa.array([len(r[2]) for r in rows], pa.int32()),
            }
        ),
        str(path / "documents.parquet"),
    )


def test_sample_reservoir_sizes_and_order_invariance(spark, tmp_path):
    big = [(i, "en", f"doc {i}") for i in range(40)]
    small = [(100 + i, "fr", "petit") for i in range(3)]

    d1 = tmp_path / "a"
    d1.mkdir()
    _write_documents(d1, big + small)
    r1 = sorted(
        (r.lang, r.doc_id, r.rk)
        for r in SPECS["sample_reservoir"].fn(spark, str(d1)).collect()
    )
    # exactly k=5 for the big stratum, ALL 3 for the small one
    assert sum(1 for t in r1 if t[0] == "en") == 5
    assert sum(1 for t in r1 if t[0] == "fr") == 3

    # same data, reversed input order -> identical sample (the order
    # key is a function of the data, not the execution)
    d2 = tmp_path / "b"
    d2.mkdir()
    _write_documents(d2, list(reversed(big + small)))
    r2 = sorted(
        (r.lang, r.doc_id, r.rk)
        for r in SPECS["sample_reservoir"].fn(spark, str(d2)).collect()
    )
    assert r1 == r2


def test_scan_text_survives_hostile_content(spark, tmp_path):
    # tabs, embedded NEWLINES (review finding: a raw line sink split
    # them into orphan records), and CRs must all survive the armored
    # round trip as single records with exact char lengths
    texts = {
        1: "left\tright",
        2: "line one\nline two\nline three",
        3: "cr\r\nlf mix",
        4: "plain words",
    }
    _write_documents(tmp_path, [(k, "en", v) for k, v in texts.items()])
    rows = SPECS["scan_text"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == len(texts)  # no orphan records
    got = {r.doc_id: r.n_chars_rt for r in rows}
    assert got == {k: len(v) for k, v in texts.items()}


def test_bfs_chain_distances_and_depth_cutoff(spark, tmp_path):
    # chain 1-2-3-4-5-6 plus a disconnected pair {10, 11}: source is
    # MIN(u)=1, so depth<=3 reaches exactly {1:0, 2:1, 3:2, 4:3};
    # 5 and 6 lie past the cutoff and 10/11 are unreachable
    _write_lineitem_orders(
        tmp_path,
        {1: [1, 2], 2: [2, 3], 3: [3, 4], 4: [4, 5], 5: [5, 6], 6: [10, 11]},
    )
    got = {
        r.p_partkey: r.dist
        for r in SPECS["graph_bfs"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_dist_on_cycle(spark, tmp_path):
    # 5-cycle 1-2-3-4-5-1: node 4 is reachable both ways (1-2-3-4 at
    # dist 3 and 1-5-4 at dist 2) — frontier anti-join must keep the
    # SHORTER hop count, and nothing is ever reported twice
    _write_lineitem_orders(
        tmp_path, {1: [1, 2], 2: [2, 3], 3: [3, 4], 4: [4, 5], 5: [5, 1]}
    )
    got = {
        r.p_partkey: r.dist
        for r in SPECS["graph_bfs"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}
