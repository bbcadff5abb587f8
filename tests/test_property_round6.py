"""Hypothesis property tests for the round-6 warehouse/graph operators:
engine output vs independent Python replays on ARBITRARY inputs (not
just the hand-picked fixtures), including the shapes the review flagged
— non-midnight timestamps for the interval join, irregular multigraphs
for PageRank.

Example counts are deliberately small: every example pays a parquet
write + Spark job (~1s); 8 adversarial examples per property beats 200
cheap ones that never touch a boundary.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# minute-resolution instants across month/February boundaries
_INSTANTS = st.integers(min_value=0, max_value=200 * 24 * 60).map(
    lambda m: datetime(2023, 1, 15) + timedelta(minutes=7 * m)
)
_ORDERS = st.lists(
    st.tuples(st.integers(1, 4), _INSTANTS),  # (custkey, order instant)
    min_size=2,
    max_size=40,
)


def _write_orders_ts(path, rows):
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(rows)), pa.int64()),
                "o_custkey": pa.array([c for c, _ in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([1.0] * len(rows), pa.float64()),
                "o_orderdate": pa.array([t for _, t in rows], pa.timestamp("us")),
                "o_orderpriority": pa.array(["5-LOW"] * len(rows)),
            }
        ),
        str(path / "orders.parquet"),
    )


@settings(**_SETTINGS)
@given(rows=_ORDERS)
def test_interval_overlap_property(spark, tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("iv")
    _write_orders_ts(d, rows)
    expect: Counter[int] = Counter()
    for i, (ci, ti) in enumerate(rows):
        for j, (cj, tj) in enumerate(rows):
            if i != j and ci == cj and ti <= tj < ti + timedelta(days=30):
                expect[ci] += 1
    got = {
        r.c_custkey: r.n_overlaps
        for r in SPECS["join_interval_overlap"].fn(spark, str(d)).collect()
    }
    assert got == dict(expect)


_GRAPH_ORDERS = st.dictionaries(
    keys=st.integers(1, 20),  # orderkey
    values=st.lists(st.integers(1, 12), min_size=1, max_size=5),  # partkeys
    min_size=1,
    max_size=12,
).filter(lambda d: any(len(set(ps)) >= 2 for ps in d.values()))


def _write_lineitem(path, orders):
    ok = [o for o, ps in orders.items() for _ in ps]
    pk = [p for ps in orders.values() for p in ps]
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "l_partkey": pa.array(pk, pa.int64()),
            }
        ),
        str(path / "lineitem.parquet"),
    )


def _edges_of(orders):
    e = set()
    for ps in orders.values():
        ps = list(set(ps))
        for a in ps:
            for b in ps:
                if a != b:
                    e.add((a, b))
    return e


@settings(**_SETTINGS)
@given(orders=_GRAPH_ORDERS)
def test_pagerank_property(spark, tmp_path_factory, orders):
    d = tmp_path_factory.mktemp("pr")
    _write_lineitem(d, orders)
    edges = _edges_of(orders)
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    deg = {u: len(vs) for u, vs in out.items()}
    r = {u: 1_000_000_000 for u in deg}
    for _ in range(5):
        acc: dict[int, int] = defaultdict(int)
        for u, vs in out.items():
            c = r[u] // deg[u]
            for v in vs:
                acc[v] += c
        r = {v: 150_000_000 + (85 * s) // 100 for v, s in acc.items()}
    got = {
        row.p_partkey: row.rank_scaled
        for row in SPECS["graph_pagerank"].fn(spark, str(d)).collect()
    }
    assert got == r


@settings(**_SETTINGS)
@given(orders=_GRAPH_ORDERS)
def test_triangles_property(spark, tmp_path_factory, orders):
    d = tmp_path_factory.mktemp("tri")
    _write_lineitem(d, orders)
    und = {(a, b) for a, b in _edges_of(orders) if a < b}
    nodes = {n for e in und for n in e}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tris = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if a < b < c
    )
    row = SPECS["graph_triangles"].fn(spark, str(d)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (
        len(nodes),
        len(und),
        tris,
    )
