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


# --------------------------------------------------------------------------
# scan_nested_json
# --------------------------------------------------------------------------


def test_nested_json_round_trip_inverts_construction(spark, sf_dir, duck):
    rows = SPECS["scan_nested_json"].fn(spark, sf_dir).collect()
    base = {
        eid: (u, round(v * 100), et)
        for eid, u, v, et in duck.execute(
            "SELECT event_id, user_id, value, event_type FROM events"
        ).fetchall()
    }
    assert len(rows) == 2 * len(base)
    for r in rows:
        u, cents, et = base[r.event_id]
        assert (r.user_id, r.value_cents) == (u, cents)
        assert r.tag == (et if r.ord == 1 else et[:1])


# --------------------------------------------------------------------------
# fn_regex
# --------------------------------------------------------------------------


def test_fn_regex_matches_python_re(spark, sf_dir, duck):
    texts = dict(
        duck.execute("SELECT doc_id, text FROM documents LIMIT 40").fetchall()
    )
    rows = [
        r
        for r in SPECS["fn_regex"].fn(spark, sf_dir).collect()
        if r.doc_id in texts
    ]
    assert rows
    for r in rows:
        t = texts[r.doc_id]
        assert r.n_numbers == len(re.findall(r"[0-9]+", t))
        assert r.n_capitalized == len(re.findall(r"[A-Z][a-z]+", t))
        assert r.first3_words == ",".join(re.findall(r"[a-z]+", t)[:3])
        assert r.masked_head == re.sub(r"[aeiou]", "*", t[:40])


# --------------------------------------------------------------------------
# agg_weighted
# --------------------------------------------------------------------------


def test_agg_weighted_is_ratio_of_sums_not_avg_of_products(
    spark, sf_dir, duck
):
    rows = {
        r.l_returnflag: r
        for r in SPECS["agg_weighted"].fn(spark, sf_dir).collect()
    }
    for flag, r in rows.items():
        num, den = duck.execute(
            "SELECT SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)"
            "           * CAST(ROUND(l_quantity) AS BIGINT)),"
            "       SUM(CAST(ROUND(l_quantity) AS BIGINT))"
            " FROM lineitem WHERE l_returnflag = ?",
            [flag],
        ).fetchone()
        assert (r.wsum_cents, r.wsum) == (num, den)
        assert r.wavg_price_cents == num // den
        # weighted mean ≠ plain mean on this data (the trap is real)
        plain = duck.execute(
            "SELECT CAST(AVG(l_extendedprice)*100 AS BIGINT) "
            "FROM lineitem WHERE l_returnflag = ?",
            [flag],
        ).fetchone()[0]
        assert abs(r.wavg_price_cents - plain) > 100


# --------------------------------------------------------------------------
# multimodal_audio_stats
# --------------------------------------------------------------------------


def test_audio_stats_spec_replay(spark, sf_dir, duck):
    out = {
        r.doc_id: r
        for r in SPECS["multimodal_audio_stats"].fn(spark, sf_dir).collect()
    }
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1"
    ).fetchall()
    assert set(out) == {d for d, _ in docs}
    for doc_id, text in docs[:40]:
        s = [(b - 128) * 256 for b in (text.encode("utf-8") or b"\x80")]
        r = out[doc_id]
        assert r.n_samples == len(s)
        assert r.peak_abs == max(abs(x) for x in s)
        assert r.sum_samples == sum(s)
        assert r.energy == sum(x * x for x in s)
        assert r.zero_crossings == sum(
            1 for a, b in zip(s, s[1:]) if a * b < 0
        )


# --------------------------------------------------------------------------
# basket_rules
# --------------------------------------------------------------------------


def test_basket_rules_python_replay(spark, sf_dir, duck):
    op = duck.execute(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
    ).fetchall()
    baskets = defaultdict(set)
    item = defaultdict(int)
    for o, p in op:
        baskets[o].add(p)
        item[p] += 1
    n = len(baskets)
    pair = defaultdict(int)
    for ps in baskets.values():
        sp = sorted(ps)
        for i, u in enumerate(sp):
            for v in sp[i + 1 :]:
                pair[(u, v)] += 1
    want = {}
    for (u, v), c in pair.items():
        if c >= 3:
            want[(u, v)] = (
                c,
                item[u],
                item[v],
                c * 10000 // item[u],
                c * 10000 // item[v],
                c * n * 1000 // (item[u] * item[v]),
            )
    got = {
        (r.u, r.v): (
            r.n_pair,
            r.n_u,
            r.n_v,
            r.conf_uv_bp,
            r.conf_vu_bp,
            r.lift_milli,
        )
        for r in SPECS["basket_rules"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# agg_cube
# --------------------------------------------------------------------------


def test_agg_cube_lattice_is_complete_and_consistent(spark, sf_dir, duck):
    rows = SPECS["agg_cube"].fn(spark, sf_dir).collect()
    n_status = duck.execute(
        "SELECT COUNT(DISTINCT o_orderstatus) FROM orders"
    ).fetchone()[0]
    n_prio = duck.execute(
        "SELECT COUNT(DISTINCT o_orderpriority) FROM orders"
    ).fetchone()[0]
    # full lattice: cells + both marginals + grand total
    assert len(rows) == (n_status + 1) * (n_prio + 1)
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r.gid].append(r)
    total = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    (gt,) = by_gid[3]
    assert (gt.o_orderstatus, gt.o_orderpriority, gt.n) == (None, None, total)
    # every marginal slice re-sums to the grand total
    for gid in (0, 1, 2, 3):
        assert sum(r.n for r in by_gid[gid]) == total
        assert sum(r.total_cents for r in by_gid[gid]) == gt.total_cents


# --------------------------------------------------------------------------
# sample_negatives
# --------------------------------------------------------------------------


def test_sample_negatives_ring_replay_and_invariants(spark, sf_dir, duck):
    out = SPECS["sample_negatives"].fn(spark, sf_dir).collect()
    ids = [
        d for (d,) in duck.execute("SELECT doc_id FROM documents").fetchall()
    ]
    # pure-Python ring replay
    ring = defaultdict(list)
    for d in ids:
        h = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
        ring[h % 8].append((h, d))
    want = set()
    for bucket in ring.values():
        bucket.sort()
        n = len(bucket)
        for i, (_, d) in enumerate(bucket):
            for j in (1, 2, 3):
                want.add((d, j, bucket[(i + j) % n][1]))
    got = {(r.doc_id, r.neg_rank, r.neg_doc_id) for r in out}
    assert got == want
    # invariants: k rows per anchor, never self, distinct per anchor
    per = defaultdict(set)
    for d, _j, nd in got:
        assert nd != d
        per[d].add(nd)
    assert all(len(v) == 3 for v in per.values())
    assert set(per) == set(ids)
