"""Unit tests for the round-8 extra operators: independent pure-Python
replays of the semantics the oracle hash alone can't localize — the
trigram path miner against a dict-of-Counters walk, the Fano factor
against a literal zero-filled slot vector, lag-1 autocorrelation
against Python's exact fractions, and the nearest-rank percentile
against a sorted-list index."""

from __future__ import annotations

from collections import Counter, defaultdict
from fractions import Fraction

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

HOUR_US = 3_600_000_000


# --------------------------------------------------------------------------
# events_trigram_paths
# --------------------------------------------------------------------------


def _user_sequences(duck):
    seqs = defaultdict(list)
    for u, et in duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall():
        seqs[u].append(et)
    return seqs


def test_trigram_paths_replay(spark, sf_dir, duck):
    cnt = Counter()
    for seq in _user_sequences(duck).values():
        for i in range(len(seq) - 2):
            cnt[tuple(seq[i : i + 3])] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(
        (((r.e1, r.e2, r.e3), r.n_paths) for r in
         SPECS["events_trigram_paths"].fn(spark, sf_dir).collect()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == list(want)


def test_trigram_paths_count_conservation(spark, sf_dir, duck):
    # total trigram occurrences = Σ max(len(seq)-2, 0) over users
    seqs = _user_sequences(duck)
    total = sum(max(len(s) - 2, 0) for s in seqs.values())
    rows = SPECS["events_trigram_paths"].fn(spark, sf_dir).collect()
    assert len(rows) <= 20
    # top-20 can't exceed the corpus total and must be positive
    assert 0 < sum(r.n_paths for r in rows) <= total


# --------------------------------------------------------------------------
# events_burstiness
# --------------------------------------------------------------------------


def test_burstiness_zero_filled_replay(spark, sf_dir, duck):
    cells = defaultdict(dict)
    for et, b, n in duck.execute(
        f"SELECT event_type, epoch_us(ts)//{HOUR_US}, COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall():
        cells[et][b] = n
    want = {}
    for et, m in cells.items():
        lo, hi = min(m), max(m)
        xs = [m.get(b, 0) for b in range(lo, hi + 1)]  # literal zero-fill
        S, sc, sc2 = len(xs), sum(xs), sum(x * x for x in xs)
        want[et] = (S, sc, (S * sc2 - sc * sc) * 1000 // (S * sc))
    got = {
        r.event_type: (r.n_slots, r.n_events, r.fano_milli)
        for r in SPECS["events_burstiness"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# ts_autocorr
# --------------------------------------------------------------------------


def test_autocorr_exact_fraction_replay(spark, sf_dir, duck):
    cells = defaultdict(dict)
    for et, b, c in duck.execute(
        f"SELECT event_type, epoch_us(ts)//{HOUR_US}, "
        "SUM(CAST(ROUND(value*100) AS BIGINT)) FROM events GROUP BY 1, 2"
    ).fetchall():
        cells[et][b] = c
    rows = SPECS["ts_autocorr"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        m = cells[r.event_type]
        pairs = [(m[b], m[b - 1]) for b in sorted(m) if b - 1 in m]
        assert r.n_pairs == len(pairs)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        num = Fraction(n * sxy - sx * sy)
        den2 = Fraction(n * sxx - sx * sx) * (n * syy - sy * sy)
        # exact-fraction check: corr² matches to float precision and the
        # sign matches exactly (corr itself involves one irrational sqrt)
        assert (num > 0) == (r.lag1_corr > 0)
        assert abs(float(num * num / den2) - r.lag1_corr**2) < 1e-9


def test_autocorr_in_unit_interval(spark, sf_dir):
    for r in SPECS["ts_autocorr"].fn(spark, sf_dir).collect():
        assert -1.0 <= r.lag1_corr <= 1.0


# --------------------------------------------------------------------------
# orders_fulfillment_lag
# --------------------------------------------------------------------------


def test_fulfillment_lag_sorted_index_replay(spark, sf_dir, duck):
    lags = defaultdict(list)
    for pri, d in duck.execute(
        "SELECT o.o_orderpriority, "
        "(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 "
        "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
    ).fetchall():
        lags[pri].append(d)
    want = {}
    for pri, xs in lags.items():
        xs.sort()
        n = len(xs)
        want[pri] = (
            n, xs[0], xs[(n - 1) * 50 // 100], xs[(n - 1) * 90 // 100], xs[-1]
        )
    got = {
        r.o_orderpriority: (
            r.n_lines, r.min_days, r.p50_days, r.p90_days, r.max_days
        )
        for r in SPECS["orders_fulfillment_lag"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_fulfillment_lag_monotone_profile(spark, sf_dir):
    rows = SPECS["orders_fulfillment_lag"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.min_days <= r.p50_days <= r.p90_days <= r.max_days
        assert r.n_lines > 0


# --------------------------------------------------------------------------
# text_k_anonymity
# --------------------------------------------------------------------------


def test_k_anonymity_replay(spark, sf_dir, duck):
    classes = Counter()
    for lang, src, b in duck.execute(
        "SELECT lang, source, n_chars // 100 FROM documents"
    ).fetchall():
        classes[(lang, src, b)] += 1
    released = {q: n for q, n in classes.items() if n >= 5}
    suppressed = sum(n for q, n in classes.items() if n < 5)
    rows = SPECS["text_k_anonymity"].fn(spark, sf_dir).collect()
    got_rel = {
        (r.lang, r.source, r.len_bucket): r.class_n
        for r in rows
        if r.released
    }
    got_sup = [r for r in rows if not r.released]
    assert got_rel == released
    if suppressed:
        assert len(got_sup) == 1
        assert got_sup[0].class_n == suppressed
        assert (got_sup[0].lang, got_sup[0].source) == ("*", "*")
    else:
        assert not got_sup
    # every released class really is k-anonymous
    assert all(n >= 5 for n in got_rel.values())


# --------------------------------------------------------------------------
# agg_countmin
# --------------------------------------------------------------------------


def test_countmin_replay(spark, sf_dir, duck):
    import hashlib

    toks = [
        w
        for (t,) in duck.execute("SELECT text FROM documents").fetchall()
        for w in t.split(" ")
    ]
    cells = Counter()
    for w in toks:
        for d in range(4):
            h = hashlib.md5(f"{w}#{d}".encode()).hexdigest()
            cells[(d, int(h[:8], 16) % 64)] += 1
    wc = Counter(toks)
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {}
    for w, n in top:
        est = min(
            cells[(d, int(hashlib.md5(f"{w}#{d}".encode()).hexdigest()[:8], 16) % 64)]
            for d in range(4)
        )
        want[w] = (n, est)
    got = {
        r.word: (r.true_n, r.cm_est)
        for r in SPECS["agg_countmin"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_countmin_never_undercounts(spark, sf_dir):
    for r in SPECS["agg_countmin"].fn(spark, sf_dir).collect():
        assert r.cm_est >= r.true_n
        assert r.overcount == r.cm_est - r.true_n >= 0


# --------------------------------------------------------------------------
# sample_temperature
# --------------------------------------------------------------------------


def test_temperature_replay(spark, sf_dir, duck):
    import math

    counts = dict(
        duck.execute(
            "SELECT source, COUNT(*) FROM documents GROUP BY source"
        ).fetchall()
    )
    ws = {s: math.floor(math.sqrt(n * 1_000_000)) for s, n in counts.items()}
    tot_n, tot_w = sum(counts.values()), sum(ws.values())
    rows = SPECS["sample_temperature"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(counts)
    for r in rows:
        assert r.n_docs == counts[r.source]
        assert r.w_milli == ws[r.source]
        assert r.alloc_prop == 1000 * counts[r.source] // tot_n
        assert r.alloc_temp == 1000 * ws[r.source] // tot_w


def test_temperature_flattens_mixture(spark, sf_dir):
    rows = SPECS["sample_temperature"].fn(spark, sf_dir).collect()
    small = min(rows, key=lambda r: r.n_docs)
    big = max(rows, key=lambda r: r.n_docs)
    if small.n_docs < big.n_docs:
        # temperature gives the tail at least its proportional share
        # and strictly shrinks the head's share
        assert small.alloc_temp >= small.alloc_prop
        assert big.alloc_temp <= big.alloc_prop


# --------------------------------------------------------------------------
# graph_kcore_peel
# --------------------------------------------------------------------------


def _sym_edges(duck):
    return duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a "
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey"
    ).fetchall()


def test_kcore_peel_replay(spark, sf_dir, duck):
    edges = _sym_edges(duck)
    deg = Counter(u for u, _ in edges)
    n = len(deg)
    k = (3 * sum(deg.values()) + 4 * n - 1) // (4 * n)
    alive = {u for u, d in deg.items() if d >= k}
    cur = edges
    for _ in range(3):
        cur = [(u, v) for u, v in cur if u in alive and v in alive]
        deg = Counter(u for u, _ in cur)
        alive = {u for u, d in deg.items() if d >= k}
    want = {u: d for u, d in deg.items() if d >= k}
    got = {
        r.part_key: r.core_deg
        for r in SPECS["graph_kcore_peel"].fn(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # the cascade leaves a non-empty backbone at test sf


def test_kcore_survivor_degrees_bounded(spark, sf_dir, duck):
    edges = _sym_edges(duck)
    deg0 = Counter(u for u, _ in edges)
    rows = SPECS["graph_kcore_peel"].fn(spark, sf_dir).collect()
    for r in rows:
        # residual degree can only shrink vs the full graph
        assert 0 < r.core_deg <= deg0[r.part_key]


# --------------------------------------------------------------------------
# dedup_url
# --------------------------------------------------------------------------


def test_dedup_url_collapses_five_to_one(spark, sf_dir, duck):
    (n_docs,) = duck.execute("SELECT COUNT(*) FROM documents").fetchone()
    rows = SPECS["dedup_url"].fn(spark, sf_dir).collect()
    assert sum(r.n_dups for r in rows) == n_docs
    # groups are doc_id div 5 — every cluster collapses fully
    for r in rows:
        assert r.n_dups == len(
            [d for d in range(r.keep_doc_id, r.keep_doc_id + 5)]
        ) or r.n_dups <= 5
        assert r.keep_doc_id % 5 == 0  # keeper is the group's min id


def test_dedup_url_canonical_form(spark, sf_dir):
    for r in SPECS["dedup_url"].fn(spark, sf_dir).collect():
        u = r.canonical_url
        assert u.startswith("https://www.example.com/page/")
        assert ":443" not in u
        assert "utm" not in u
        assert "/?" not in u and not u.endswith("/")
        # canonical id survives: ?id=<gid> intact
        assert "?id=" in u


# --------------------------------------------------------------------------
# ts_drawdown
# --------------------------------------------------------------------------


def test_drawdown_replay(spark, sf_dir, duck):
    cells = defaultdict(dict)
    for et, d, c in duck.execute(
        "SELECT event_type, epoch_us(ts)//86400000000, "
        "SUM(CAST(ROUND(value*100) AS BIGINT)) FROM events GROUP BY 1, 2"
    ).fetchall():
        cells[et][d] = c
    want = {}
    for et, m in cells.items():
        peak, best_dd, worst_day = None, -1, None
        for d in sorted(m):
            peak = m[d] if peak is None else max(peak, m[d])
            dd = peak - m[d]
            if dd > best_dd:
                best_dd, worst_day = dd, d
        want[et] = (len(m), peak, best_dd, worst_day)
    got = {
        r.event_type: (r.n_days, r.peak_cents, r.max_drawdown_cents, r.worst_day)
        for r in SPECS["ts_drawdown"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# events_stickiness
# --------------------------------------------------------------------------


def test_stickiness_replay(spark, sf_dir, duck):
    cells = set(
        duck.execute(
            "SELECT DISTINCT user_id, epoch_us(ts)//86400000000 FROM events"
        ).fetchall()
    )
    days = sorted({d for _, d in cells})
    d0, d1 = days[0], days[-1]
    by_day = defaultdict(set)
    for u, d in cells:
        by_day[d].add(u)
    want = {}
    for d in range(d0 + 27, d1 + 1):
        dau = len(by_day.get(d, ()))
        mau = len(set().union(*[by_day.get(x, set()) for x in range(d - 27, d + 1)]))
        if d in by_day:  # DAU join side requires the day observed
            want[d] = (dau, mau, dau * 10000 // mau)
    got = {
        r.day: (r.dau, r.mau, r.stickiness_bp)
        for r in SPECS["events_stickiness"].fn(spark, sf_dir).collect()
    }
    assert got == want
    for dau, mau, bp in got.values():
        assert 0 < dau <= mau and 0 < bp <= 10000


# --------------------------------------------------------------------------
# join_asof_nearest
# --------------------------------------------------------------------------


def test_asof_nearest_replay(spark, sf_dir, duck):
    import bisect

    purchases = defaultdict(list)
    for u, t in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events "
        "WHERE event_type='purchase' ORDER BY 2"
    ).fetchall():
        purchases[u].append(t)
    rows = SPECS["join_asof_nearest"].fn(spark, sf_dir).collect()
    clicks = duck.execute(
        "SELECT event_id, user_id, epoch_us(ts) FROM events "
        "WHERE event_type='click'"
    ).fetchall()
    assert len(rows) == len(clicks)
    byid = {r.event_id: r for r in rows}
    for eid, u, t in clicks:
        ps = purchases.get(u, [])
        r = byid[eid]
        if not ps:
            assert r.near_purchase_ts_us is None and r.near_dt_us is None
            continue
        i = bisect.bisect_right(ps, t)
        cand = []
        if i > 0:
            cand.append((t - ps[i - 1], ps[i - 1]))
        if i < len(ps):
            cand.append((ps[i] - t, ps[i]))
        # tie -> earlier (backward) row: sort by (dt, ts) ascending
        dt, ts_best = min(cand)
        assert r.near_dt_us == dt
        assert r.near_purchase_ts_us == ts_best or (
            # equal-dt tie must resolve to the EARLIER candidate
            r.near_dt_us == dt and r.near_purchase_ts_us == min(c[1] for c in cand if c[0] == dt)
        )


# --------------------------------------------------------------------------
# dq_drift
# --------------------------------------------------------------------------


def test_dq_drift_replay(spark, sf_dir, duck):
    days = [
        d for (d,) in duck.execute(
            "SELECT epoch_us(ts)//86400000000 FROM events"
        ).fetchall()
    ]
    mid = (min(days) + max(days) + 1) // 2
    cells = defaultdict(lambda: [0, 0])
    for et, hh, day in duck.execute(
        "SELECT event_type, (epoch_us(ts) % 86400000000)//3600000000, "
        "epoch_us(ts)//86400000000 FROM events"
    ).fetchall():
        cells[(et, hh)][0 if day < mid else 1] += 1
    types = {et for et, _ in cells}
    want = {}
    for et in types:
        np_ = sum(v[0] for (t, _), v in cells.items() if t == et)
        nq = sum(v[1] for (t, _), v in cells.items() if t == et)
        devs = {
            hh: abs(v[0] * nq - v[1] * np_)
            for (t, hh), v in cells.items()
            if t == et
        }
        tv = sum(devs.values()) * 10000 // (2 * np_ * nq)
        worst = min(h for h, d in devs.items() if d == max(devs.values()))
        want[et] = (np_, nq, tv, worst)
    got = {
        r.event_type: (r.n_early, r.n_late, r.tv_bp, r.worst_hour)
        for r in SPECS["dq_drift"].fn(spark, sf_dir).collect()
    }
    assert got == want
    for np_, nq, tv, _ in got.values():
        assert 0 <= tv <= 10000 and np_ > 0 and nq > 0


# --------------------------------------------------------------------------
# embed_outliers
# --------------------------------------------------------------------------


def test_embed_outliers_replay(spark, sf_dir, duck):
    vecs = duck.execute(
        "SELECT vec_id, label, embedding::DOUBLE[] FROM embeddings"
    ).fetchall()
    q = {vid: [round(x * 1000) for x in v] for vid, _, v in vecs}
    labels = {vid: lb for vid, lb, _ in vecs}
    n = len(q)
    dims = len(next(iter(q.values())))
    sums = [sum(v[d] for v in q.values()) for d in range(dims)]
    dist = {
        vid: sum((n * v[d] - sums[d]) ** 2 for d in range(dims))
        for vid, v in q.items()
    }
    want = sorted(dist.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = SPECS["embed_outliers"].fn(spark, sf_dir).collect()
    got = [(r.vec_id, int(r.dist2_scaled)) for r in rows]
    assert [(v, d) for v, d in want] == sorted(
        got, key=lambda kv: (-kv[1], kv[0])
    )
    for r in rows:
        assert r.label == labels[r.vec_id]
