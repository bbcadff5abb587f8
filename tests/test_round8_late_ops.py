"""Unit tests for the late round-8 operators (born after the driver
window filled): independent Python/DuckDB replays of the semantics the
oracle hash alone can't localize — attribution's touch selection,
division's coverage rule, prefix blocking's normalization, neighbor
Jaccard's set arithmetic, and digest portability against hashlib."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


# --------------------------------------------------------------------------
# sub_division
# --------------------------------------------------------------------------


def test_sub_division_covers_exactly_the_full_coverage_customers(
    spark, sf_dir, duck
):
    got = {
        r.custkey: (r.n_orders, r.n_priorities)
        for r in SPECS["sub_division"].fn(spark, sf_dir).collect()
    }
    rows = duck.execute(
        "SELECT o_custkey, COUNT(DISTINCT o_orderpriority), COUNT(*) "
        "FROM orders GROUP BY 1"
    ).fetchall()
    total = duck.execute(
        "SELECT COUNT(DISTINCT o_orderpriority) FROM orders"
    ).fetchone()[0]
    want = {ck: (n, np) for ck, np, n in rows if np == total}
    assert got == want
    # and the fixture actually exercises BOTH branches
    assert want and len(want) < len(rows)


# --------------------------------------------------------------------------
# agg_string_agg
# --------------------------------------------------------------------------


def test_string_agg_csv_is_sorted_and_complete(spark, sf_dir, duck):
    for r in SPECS["agg_string_agg"].fn(spark, sf_dir).collect():
        parts = r.priorities_csv.split(",")
        assert parts == sorted(parts), "concatenation order must be declared"
        assert len(parts) == r.n_priorities
        want = {
            p
            for (p,) in duck.execute(
                "SELECT DISTINCT o_orderpriority FROM orders "
                "WHERE o_orderstatus = ?",
                [r.o_orderstatus],
            ).fetchall()
        }
        assert set(parts) == want


# --------------------------------------------------------------------------
# fn_hash
# --------------------------------------------------------------------------


def test_fn_hash_matches_hashlib_over_utf8(spark, sf_dir, duck):
    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents LIMIT 50").fetchall()
    )
    rows = [
        r
        for r in SPECS["fn_hash"].fn(spark, sf_dir).collect()
        if r.doc_id in texts
    ]
    assert rows
    for r in rows:
        raw = texts[r.doc_id].encode("utf-8")
        assert r.md5_hex == hashlib.md5(raw).hexdigest()
        assert r.sha256_hex == hashlib.sha256(raw).hexdigest()
        assert r.route256 == r.md5_hex[:2]


# --------------------------------------------------------------------------
# dq_constraints
# --------------------------------------------------------------------------


def test_dq_constraints_fixture_is_referentially_clean(spark, sf_dir, duck):
    rows = {
        r.check_name: r
        for r in SPECS["dq_constraints"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "orders_pk_unique",
        "orders_fk_customer",
        "lineitem_fk_orders",
        "orders_status_domain",
        "lineitem_qty_range",
        "customer_acctbal_notnull",
    }
    # the generated TPC-H-ish fixture is referentially clean — every
    # structural check must report zero violations (a nonzero here
    # means the CHECK is wrong, not the data)
    for name in (
        "orders_pk_unique",
        "orders_fk_customer",
        "lineitem_fk_orders",
    ):
        assert rows[name].n_violations == 0, name
    n_orders = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    n_li = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert rows["orders_pk_unique"].n_checked == n_orders
    assert rows["lineitem_fk_orders"].n_checked == n_li


# --------------------------------------------------------------------------
# events_seasonality
# --------------------------------------------------------------------------


def test_seasonality_cells_and_shares_replay(spark, sf_dir, duck):
    out = SPECS["events_seasonality"].fn(spark, sf_dir).collect()
    cells = defaultdict(int)
    for et, us in duck.execute(
        "SELECT event_type, epoch_us(ts) FROM events"
    ).fetchall():
        cells[(et, (us // 86_400_000_000 + 4) % 7, us % 86_400_000_000 // 3_600_000_000)] += 1
    totals = defaultdict(int)
    for (et, _, _), n in cells.items():
        totals[et] += n
    assert {(r.event_type, r.dow, r.hod): r.n_events for r in out} == dict(
        cells
    )
    for r in out:
        assert 0 <= r.dow <= 6 and 0 <= r.hod <= 23
        assert r.share_bp == r.n_events * 10000 // totals[r.event_type]


# --------------------------------------------------------------------------
# events_attribution
# --------------------------------------------------------------------------


def test_attribution_python_replay(spark, sf_dir, duck):
    ev = duck.execute(
        "SELECT user_id, event_type, value, epoch_us(ts), event_id "
        "FROM events ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for u, et, v, us, eid in ev:
        by_user[u].append((us, eid, et, v))
    want = defaultdict(lambda: [0, 0])
    for seq in by_user.values():
        last_touch = None  # (us, type) of last non-purchase so far
        for us, _eid, et, v in seq:
            if et == "purchase":
                if last_touch is None or us - last_touch[0] > 86_400_000_000:
                    ch = "direct"
                else:
                    ch = last_touch[1]
                want[ch][0] += 1
                want[ch][1] += round(v * 100)
            else:
                last_touch = (us, et)
    got = {
        r.channel: [r.n_purchases, r.revenue_cents]
        for r in SPECS["events_attribution"].fn(spark, sf_dir).collect()
    }
    assert got == dict(want)
    # purchases never self-attribute
    assert "purchase" not in got


# --------------------------------------------------------------------------
# dedup_prefix
# --------------------------------------------------------------------------


def test_dedup_prefix_blocking_python_replay(spark, sf_dir, duck):
    buckets = defaultdict(list)
    for doc_id, text in duck.execute(
        "SELECT doc_id, text FROM documents"
    ).fetchall():
        key = hashlib.md5(
            re.sub(r"\s+", " ", text.lower()).strip()[:64].encode("utf-8")
        ).hexdigest()
        buckets[key].append(doc_id)
    want = {
        k: (len(v), min(v), max(v))
        for k, v in buckets.items()
        if len(v) > 1
    }
    got = {
        r.prefix_key: (r.n_docs, r.keep_doc_id, r.max_doc_id)
        for r in SPECS["dedup_prefix"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# graph_neighbor_jaccard
# --------------------------------------------------------------------------


def test_neighbor_jaccard_python_replay(spark, sf_dir, duck):
    pairs = duck.execute(
        """
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        """
    ).fetchall()
    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
    want = {}
    for u, v in pairs:
        if u < v:
            c = len(adj[u] & adj[v])
            want[(u, v)] = (
                c,
                len(adj[u]),
                len(adj[v]),
                c * 10000 // (len(adj[u]) + len(adj[v]) - c),
            )
    got = {
        (r.u, r.v): (
            r.common_neighbors,
            r.degree_u,
            r.degree_v,
            r.jaccard_bp,
        )
        for r in SPECS["graph_neighbor_jaccard"].fn(spark, sf_dir).collect()
    }
    assert got == want
