"""Pure-Python replays for the round-8 'more' batch: the tolerance
as-of join against a per-user sorted-list bisect, the sweep-line peak
concurrency against a literal Counter walk, the market-share ranks
against dict arithmetic, and the freshness audit against direct scans.
These localize semantics the oracle hash alone can't (the oracle and
the engine could share a misreading; the replay can't)."""

from __future__ import annotations

from bisect import bisect_right
from collections import defaultdict

from nchu_bigdata_spark.operators.similarity import _HARD_NEG_CAP
from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

DAY_US = 86_400_000_000
TOL_US = 3 * DAY_US
HOLD_S = 900


# --------------------------------------------------------------------------
# join_asof_tolerance
# --------------------------------------------------------------------------


def test_asof_tolerance_replay(spark, sf_dir, duck):
    purchases = defaultdict(list)
    for u, ts in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events "
        "WHERE event_type = 'purchase' ORDER BY user_id, ts"
    ).fetchall():
        purchases[u].append(ts)
    want = {}
    for eid, u, ts in duck.execute(
        "SELECT event_id, user_id, epoch_us(ts) FROM events "
        "WHERE event_type = 'click'"
    ).fetchall():
        arr = purchases.get(u, [])
        i = bisect_right(arr, ts)
        if i and ts - arr[i - 1] <= TOL_US:
            want[eid] = (arr[i - 1], ts - arr[i - 1], 1)
        else:
            want[eid] = (None, None, 0)
    got = {
        r.event_id: (r.purchase_ts_us, r.dt_us, r.matched)
        for r in SPECS["join_asof_tolerance"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_asof_tolerance_never_exceeds_plain_asof(spark, sf_dir):
    plain = {
        r.event_id: r.purchase_ts_asof_us
        for r in SPECS["join_asof"].fn(spark, sf_dir).collect()
    }
    tol = SPECS["join_asof_tolerance"].fn(spark, sf_dir).collect()
    for r in tol:
        if r.matched:
            # a tolerated match is exactly the plain backward match
            assert r.purchase_ts_us == plain[r.event_id]
            assert 0 <= r.dt_us <= TOL_US
        else:
            # nulled only when unmatched or stale
            assert (
                plain[r.event_id] is None
                or r.ts_us - plain[r.event_id] > TOL_US
            )


# --------------------------------------------------------------------------
# events_concurrency
# --------------------------------------------------------------------------


def test_concurrency_replay(spark, sf_dir, duck):
    deltas = defaultdict(lambda: defaultdict(int))
    for et, s in duck.execute(
        "SELECT event_type, epoch_us(ts) // 1000000 FROM events"
    ).fetchall():
        deltas[et][s] += 1
        deltas[et][s + HOLD_S] -= 1
    want = {}
    for et, dd in deltas.items():
        run = 0
        best = {}  # day -> (peak, earliest_s)
        for s in sorted(dd):
            run += dd[s]
            day = s // 86400
            if day not in best or run > best[day][0]:
                best[day] = (run, s)
        for day, (peak, at_s) in best.items():
            want[(et, day)] = (peak, at_s)
    got = {
        (r.event_type, r.day): (r.peak_concurrent, r.peak_at_s)
        for r in SPECS["events_concurrency"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_concurrency_bounds(spark, sf_dir, duck):
    # peak can never exceed the count of events in any 15-min-padded
    # day window, and is at least 1 on any day with a start delta
    n_by_type = dict(
        duck.execute(
            "SELECT event_type, COUNT(*) FROM events GROUP BY 1"
        ).fetchall()
    )
    rows = SPECS["events_concurrency"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.peak_concurrent <= n_by_type[r.event_type]
        assert r.peak_at_s // 86400 == r.day


# --------------------------------------------------------------------------
# orders_market_share
# --------------------------------------------------------------------------


def test_market_share_replay(spark, sf_dir, duck):
    cells = defaultdict(int)
    for ym, seg, cents in duck.execute(
        "SELECT year(o_orderdate) * 100 + month(o_orderdate), c_mktsegment,"
        " SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
        " FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2"
    ).fetchall():
        cells[(int(ym), seg)] = int(cents)
    months = defaultdict(list)
    for (ym, seg), cents in cells.items():
        months[ym].append((seg, cents))
    want = {}
    prev_rank = {}
    for ym in sorted(months):
        tot = sum(c for _, c in months[ym])
        ranked = sorted(months[ym], key=lambda x: (-x[1], x[0]))
        for i, (seg, cents) in enumerate(ranked, start=1):
            delta = prev_rank[seg] - i if seg in prev_rank else None
            want[(ym, seg)] = (cents, cents * 10000 // tot, i, delta)
        for i, (seg, _) in enumerate(ranked, start=1):
            prev_rank[seg] = i
    got = {
        (r.ym, r.segment): (r.revenue_cents, r.share_bp, r.rnk, r.rank_delta)
        for r in SPECS["orders_market_share"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_market_share_sums_to_month(spark, sf_dir):
    rows = SPECS["orders_market_share"].fn(spark, sf_dir).collect()
    by_m = defaultdict(list)
    for r in rows:
        by_m[r.ym].append(r)
    for ym, rs in by_m.items():
        # floor-division shares undershoot by < n_segments bp
        s = sum(r.share_bp for r in rs)
        assert 10000 - len(rs) < s <= 10000
        assert sorted(r.rnk for r in rs) == list(range(1, len(rs) + 1))


# --------------------------------------------------------------------------
# dq_freshness
# --------------------------------------------------------------------------


def test_freshness_replay(spark, sf_dir, duck):
    rows_by_type = defaultdict(list)
    for et, us in duck.execute(
        "SELECT event_type, epoch_us(ts) FROM events"
    ).fetchall():
        rows_by_type[et].append(us)
    global_max = max(max(v) for v in rows_by_type.values())
    want = {}
    for et, uss in rows_by_type.items():
        days = {u // DAY_US for u in uss}
        span = max(days) - min(days) + 1
        want[et] = (
            len(uss),
            max(uss),
            global_max - max(uss),
            span,
            len(days),
            len(days) * 10000 // span,
        )
    got = {
        r.event_type: (
            r.n_rows,
            r.last_ts_us,
            r.staleness_us,
            r.span_days,
            r.active_days,
            r.coverage_bp,
        )
        for r in SPECS["dq_freshness"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_freshness_invariants(spark, sf_dir):
    rows = SPECS["dq_freshness"].fn(spark, sf_dir).collect()
    assert rows
    assert min(r.staleness_us for r in rows) == 0  # someone is freshest
    for r in rows:
        assert 1 <= r.active_days <= r.span_days
        assert 0 < r.coverage_bp <= 10000


# --------------------------------------------------------------------------
# events_bounce
# --------------------------------------------------------------------------


def test_bounce_replay(spark, sf_dir, duck):
    GAP = 600_000_000
    sessions = []
    cur_user, cur = None, None
    for u, ts, et in duck.execute(
        "SELECT user_id, epoch_us(ts), event_type FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall():
        if u != cur_user or ts - cur[-1][0] > GAP:
            cur = []
            sessions.append(cur)
            cur_user = u
        cur.append((ts, et))
    from collections import defaultdict

    stats = defaultdict(lambda: [0, 0])
    for s in sessions:
        landing = s[0][1]
        stats[landing][0] += 1
        stats[landing][1] += len(s) == 1
    want = {
        k: (n, b, b * 10000 // n) for k, (n, b) in stats.items()
    }
    got = {
        r.landing: (r.n_sessions, r.n_bounces, r.bounce_bp)
        for r in SPECS["events_bounce"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_bounce_session_totals_match_sessionize(spark, sf_dir):
    n_sessions = sum(
        r.n_sessions
        for r in SPECS["events_bounce"].fn(spark, sf_dir).collect()
    )
    assert n_sessions == SPECS["win_sessionize"].fn(spark, sf_dir).count()


# --------------------------------------------------------------------------
# ts_mad_anomaly
# --------------------------------------------------------------------------


def _med2(vals):
    s = sorted(vals)
    n = len(s)
    lo, hi = s[(n - 1) // 2], s[n // 2]
    return lo + hi  # == 2 * median, integer always


def test_mad_anomaly_replay(spark, sf_dir, duck):
    from collections import defaultdict

    cells = defaultdict(dict)
    for et, day, n in duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall():
        cells[et][day] = n
    want = {}
    for et, dd in cells.items():
        med2 = _med2(dd.values())
        dev2 = {day: abs(2 * n - med2) for day, n in dd.items()}
        mad4 = _med2(dev2.values())
        for day, d2 in dev2.items():
            if 2 * d2 > 3 * mad4:
                want[(et, day)] = (dd[day], med2, d2, mad4)
    got = {
        (r.event_type, r.day): (r.n_events, r.med2, r.dev2, r.mad4)
        for r in SPECS["ts_mad_anomaly"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_mad_masks_less_than_zscore(spark, sf_dir):
    # robustness sanity: med2/mad4 are attained values, flag test holds
    for r in SPECS["ts_mad_anomaly"].fn(spark, sf_dir).collect():
        assert 2 * r.dev2 > 3 * r.mad4
        assert r.dev2 == abs(2 * r.n_events - r.med2)


# --------------------------------------------------------------------------
# agg_benford
# --------------------------------------------------------------------------


def test_benford_replay(spark, sf_dir, duck):
    from collections import Counter

    cnt = Counter()
    for (p,) in duck.execute(
        "SELECT o_totalprice FROM orders WHERE o_totalprice > 0"
    ).fetchall():
        cnt[int(str(round(p * 100))[0])] += 1
    total = sum(cnt.values())
    bp = {1: 3010, 2: 1760, 3: 1249, 4: 969, 5: 791,
          6: 669, 7: 579, 8: 511, 9: 457}
    want = {
        d: (n, n * 10000 // total, bp[d], n * 10000 // total - bp[d])
        for d, n in cnt.items()
    }
    got = {
        r.digit: (r.n, r.share_bp, r.benford_bp, r.dev_bp)
        for r in SPECS["agg_benford"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_benford_shares_sum(spark, sf_dir):
    rows = SPECS["agg_benford"].fn(spark, sf_dir).collect()
    s = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) < s <= 10000
    assert {r.digit for r in rows} <= set(range(1, 10))


# --------------------------------------------------------------------------
# dedup_bloom
# --------------------------------------------------------------------------


def _bloom_pos(key: str, d: int) -> int:
    import hashlib

    h = hashlib.md5(f"{key}#{d}".encode()).hexdigest()
    return int(h[:8], 16) % 1024


def test_bloom_replay(spark, sf_dir, duck):
    import hashlib

    corpus_keys = set()
    for (t,) in duck.execute(
        "SELECT text FROM documents WHERE doc_id % 10 < 8"
    ).fetchall():
        corpus_keys.add(hashlib.md5(t.encode()).hexdigest())
    bits = set()
    for k in corpus_keys:
        for d in range(4):
            bits.add(_bloom_pos(k, d))
    want = {}
    for doc_id, t in duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8"
    ).fetchall():
        k = hashlib.md5(t.encode()).hexdigest()
        hit = all(_bloom_pos(k, d) in bits for d in range(4))
        dup = k in corpus_keys
        want[doc_id] = (int(hit), int(dup), int(hit and not dup))
    got = {
        r.doc_id: (r.bloom_hit, r.true_dup, r.is_fp)
        for r in SPECS["dedup_bloom"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_bloom_no_false_negatives(spark, sf_dir):
    # the defining bloom guarantee: a true dup ALWAYS hits
    for r in SPECS["dedup_bloom"].fn(spark, sf_dir).collect():
        if r.true_dup:
            assert r.bloom_hit == 1
        assert r.is_fp == int(r.bloom_hit == 1 and r.true_dup == 0)


# --------------------------------------------------------------------------
# events_session_hist
# --------------------------------------------------------------------------


def test_session_hist_replay(spark, sf_dir, duck):
    GAP = 600_000_000
    sessions = []
    cur_user, cur = None, None
    for u, ts in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events "
        "ORDER BY user_id, ts, event_id"
    ).fetchall():
        if u != cur_user or ts - cur[-1] > GAP:
            cur = []
            sessions.append((u, cur))
            cur_user = u
        cur.append(ts)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, set(), 0])
    for u, s in sessions:
        dur_s = (max(s) - min(s)) // 1_000_000
        bucket = (dur_s + 1).bit_length() - 1
        a = agg[bucket]
        a[0] += 1
        a[1].add(u)
        a[2] += len(s)
    want = {
        b: ((1 << b) - 1, n, len(us), ev)
        for b, (n, us, ev) in agg.items()
    }
    got = {
        r.bucket: (r.lo_s, r.n_sessions, r.n_users, r.total_events)
        for r in SPECS["events_session_hist"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_session_hist_conserves_sessions(spark, sf_dir):
    hist = SPECS["events_session_hist"].fn(spark, sf_dir).collect()
    assert sum(r.n_sessions for r in hist) == SPECS[
        "win_sessionize"
    ].fn(spark, sf_dir).count()


# --------------------------------------------------------------------------
# orders_abc_class
# --------------------------------------------------------------------------


def test_abc_replay(spark, sf_dir, duck):
    parts = duck.execute(
        "SELECT l_partkey, SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
        " FROM lineitem GROUP BY 1"
    ).fetchall()
    ranked = sorted(parts, key=lambda x: (-x[1], x[0]))
    tot = sum(c for _, c in ranked)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    cum = 0
    for _, c in ranked:
        cum += c
        cls = "A" if cum * 10 <= tot * 8 else ("B" if cum * 20 <= tot * 19 else "C")
        agg[cls][0] += 1
        agg[cls][1] += c
    want = {
        k: (n, cents, cents * 10000 // tot) for k, (n, cents) in agg.items()
    }
    got = {
        r.abc_class: (r.n_parts, r.revenue_cents, r.share_bp)
        for r in SPECS["orders_abc_class"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_abc_pareto_shape(spark, sf_dir):
    rows = {r.abc_class: r for r in
            SPECS["orders_abc_class"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "C"}
    # A carries at most 80% by construction; A parts are fewer than C's
    assert rows["A"].share_bp <= 8000
    total = sum(r.revenue_cents for r in rows.values())
    assert sum(r.n_parts for r in rows.values()) > 0
    assert total > 0


# --------------------------------------------------------------------------
# events_new_vs_returning
# --------------------------------------------------------------------------


def test_new_returning_replay(spark, sf_dir, duck):
    from collections import defaultdict

    ud = set(duck.execute(
        "SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 FROM events"
    ).fetchall())
    first = {}
    for u, d in sorted(ud, key=lambda x: x[1]):
        first.setdefault(u, d)
    agg = defaultdict(lambda: [0, 0])
    for u, d in ud:
        agg[d][0] += 1
        agg[d][1] += d == first[u]
    want = {
        d: (n, new, n - new, new * 10000 // n)
        for d, (n, new) in agg.items()
    }
    got = {
        r.day: (r.n_active, r.n_new, r.n_returning, r.new_bp)
        for r in SPECS["events_new_vs_returning"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_new_returning_conservation(spark, sf_dir):
    rows = SPECS["events_new_vs_returning"].fn(spark, sf_dir).collect()
    # every user is new exactly once: sum(n_new) == distinct users
    n_users = sum(r.n_new for r in rows)
    first_day = min(rows, key=lambda r: r.day)
    assert first_day.n_returning == 0  # nobody can return on day 1
    assert all(r.n_active == r.n_new + r.n_returning for r in rows)
    assert n_users > 0


# --------------------------------------------------------------------------
# text_readability
# --------------------------------------------------------------------------


def test_readability_replay(spark, sf_dir, duck):
    import re
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for lang, text in duck.execute(
        "SELECT lang, text FROM documents"
    ).fetchall():
        w = len(re.findall(r"[^ ]+", text))
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        a = agg[lang]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    want = {}
    for lang, (n, w, s, y) in agg.items():
        want[lang] = (
            n, w, s, y,
            w * 1000 // s,
            y * 1000 // w,
            w * 390 // s + y * 11800 // w - 15590,
        )
    got = {
        r.lang: (
            r.n_docs, r.words, r.sentences, r.syllables,
            r.words_per_sentence_milli, r.syllables_per_word_milli,
            r.fk_grade_milli,
        )
        for r in SPECS["text_readability"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# graph_sssp_weighted
# --------------------------------------------------------------------------


def _weighted_edges(duck):
    from collections import defaultdict

    orders = defaultdict(set)
    for ok, pk in duck.execute(
        "SELECT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        orders[ok].add(pk)
    cnt = defaultdict(int)
    for ps in orders.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                cnt[(ps[i], ps[j])] += 1
    edges = defaultdict(dict)
    for (u, v), c in cnt.items():
        w = 1000 // c
        edges[u][v] = w
        edges[v][u] = w
    return edges


def test_sssp_replay(spark, sf_dir, duck):
    edges = _weighted_edges(duck)
    src = min(edges)
    dist = {src: 0}
    for _ in range(3):  # bounded Bellman-Ford, exactly as the op
        nxt = dict(dist)
        for u, du in dist.items():
            for v, w in edges[u].items():
                if du + w < nxt.get(v, float("inf")):
                    nxt[v] = du + w
        dist = nxt
    got = {
        r.p_partkey: r.dist
        for r in SPECS["graph_sssp_weighted"].fn(spark, sf_dir).collect()
    }
    assert got == dist


def test_sssp_dominates_bfs_support(spark, sf_dir):
    # every vertex BFS reaches in <=3 hops is reachable here too
    bfs = {r.p_partkey for r in SPECS["graph_bfs"].fn(spark, sf_dir).collect()}
    sssp = {
        r.p_partkey: r.dist
        for r in SPECS["graph_sssp_weighted"].fn(spark, sf_dir).collect()
    }
    assert bfs <= set(sssp)
    assert sssp[min(sssp)] >= 0


# --------------------------------------------------------------------------
# orders_hhi
# --------------------------------------------------------------------------


def test_hhi_replay(spark, sf_dir, duck):
    from collections import defaultdict

    cells = defaultdict(dict)
    for ym, seg, cents in duck.execute(
        "SELECT year(o_orderdate) * 100 + month(o_orderdate), c_mktsegment,"
        " SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
        " FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2"
    ).fetchall():
        cells[int(ym)][seg] = int(cents)
    want = {}
    for ym, d in cells.items():
        tot = sum(d.values())
        shares = [c * 10000 // tot for c in d.values()]
        want[ym] = (
            len(shares),
            max(shares),
            sum(s * s for s in shares) // 10000,
        )
    got = {
        r.ym: (r.n_segments, r.top_share_bp, r.hhi_bp)
        for r in SPECS["orders_hhi"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_hhi_bounds(spark, sf_dir):
    for r in SPECS["orders_hhi"].fn(spark, sf_dir).collect():
        # HHI in [10000/n - slack, 10000]; top share bounds it below
        assert r.hhi_bp <= 10000
        assert r.hhi_bp >= (r.top_share_bp * r.top_share_bp) // 10000
        assert r.top_share_bp <= 10000


# --------------------------------------------------------------------------
# dq_embed_drift
# --------------------------------------------------------------------------


def test_embed_drift_replay(spark, sf_dir, duck):
    from collections import defaultdict

    s = defaultdict(lambda: [0, 0, 0, 0])  # dim -> n1, n2, s1, s2
    for vec_id, emb in duck.execute(
        "SELECT vec_id, embedding FROM embeddings"
    ).fetchall():
        half = vec_id % 2
        for d, x in enumerate(emb):
            q = int(round(x * 1000))  # python round is banker's...
            # replicate round-half-away like Spark/DuckDB round()
            import decimal

            q = int(
                decimal.Decimal(x * 1000).quantize(
                    0, rounding=decimal.ROUND_HALF_UP
                )
            )
            a = s[d]
            a[0] += half == 0
            a[1] += half == 1
            a[2] += q if half == 0 else 0
            a[3] += q if half == 1 else 0
    want = {
        d: (n1, n2, s1, s2, float(abs(s1 * n2 - s2 * n1)))
        for d, (n1, n2, s1, s2) in s.items()
    }
    got = {
        r.dim: (r.n1, r.n2, r.s1, r.s2, r.shift_num)
        for r in SPECS["dq_embed_drift"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# dedup_recall_eval
# --------------------------------------------------------------------------


def test_recall_eval_consistency(spark, sf_dir):
    rows = SPECS["dedup_recall_eval"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r.probe_id % 10 == 3
        assert 0 <= r.n_hit <= r.n_true
        assert r.n_hit <= r.n_cand or r.n_cand == 0 and r.n_hit == 0
        assert r.recall_bp == r.n_hit * 10000 // r.n_true


def test_recall_eval_truth_replay(spark, sf_dir, duck):
    # independent exact ground truth: per probe, brute-force jaccard
    # over 3-token shingle md5-32 sets (the engine's _K / hash family)
    import hashlib
    from collections import defaultdict

    sets = {}
    for doc_id, text in duck.execute(
        "SELECT doc_id, text FROM documents"
    ).fetchall():
        w = text.split(" ")
        if len(w) < 3:
            continue
        hs = set()
        for i in range(len(w) - 2):
            sh = " ".join(w[i : i + 3])
            hs.add(int(hashlib.md5(sh.encode()).hexdigest()[:8], 16))
        sets[doc_id] = hs
    want = defaultdict(int)
    for p, sp in sets.items():
        if p % 10 != 3:
            continue
        for d, sd in sets.items():
            if d == p:
                continue
            inter = len(sp & sd)
            if inter and 3 * inter >= len(sp) + len(sd):
                want[p] += 1
    got = {
        r.probe_id: r.n_true
        for r in SPECS["dedup_recall_eval"].fn(spark, sf_dir).collect()
    }
    assert got == dict(want)


# --------------------------------------------------------------------------
# graph_assortativity
# --------------------------------------------------------------------------


def test_assortativity_replay(spark, sf_dir, duck):
    import math
    from collections import defaultdict

    orders = defaultdict(set)
    for ok, pk in duck.execute(
        "SELECT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        orders[ok].add(pk)
    edges = set()
    for ps in orders.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
                edges.add((ps[j], ps[i]))
    deg = defaultdict(int)
    for u, _ in edges:
        deg[u] += 1
    n = len(edges)
    sx = sum(deg[u] for u, _ in edges)
    sy = sum(deg[v] for _, v in edges)
    sxy = sum(deg[u] * deg[v] for u, v in edges)
    sxx = sum(deg[u] ** 2 for u, _ in edges)
    syy = sum(deg[v] ** 2 for _, v in edges)
    want = (n * sxy - sx * sy) / math.sqrt(
        float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    )
    row = SPECS["graph_assortativity"].fn(spark, sf_dir).collect()[0]
    assert row.n_edges == n
    assert row.assortativity == want  # IEEE-exact, bit-for-bit


# --------------------------------------------------------------------------
# curate_funnel_report
# --------------------------------------------------------------------------


def test_funnel_report_composes_verdict(spark, sf_dir):
    verdict = SPECS["curate_corpus"].fn(spark, sf_dir).collect()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for v in verdict:
        a = agg[v.source]
        a[0] += 1
        a[1] += v.n_tokens
        if v.is_low_quality:
            a[2] += 1
        elif v.is_repetitive:
            a[3] += 1
        elif v.is_exact_dup:
            a[4] += 1
        a[5] += v.keep
        a[6] += v.n_tokens if v.keep else 0
    rows = SPECS["curate_funnel_report"].fn(spark, sf_dir).collect()
    got = {
        r.source: [
            r.n_docs, r.n_tokens, r.killed_quality, r.killed_repetition,
            r.killed_dedup, r.n_kept, r.kept_tokens,
        ]
        for r in rows
    }
    assert got == {k: list(v) for k, v in agg.items()}
    for r in rows:
        # the funnel must conserve: kills + kept == docs
        assert (
            r.killed_quality + r.killed_repetition + r.killed_dedup + r.n_kept
            == r.n_docs
        )
        assert r.keep_bp == r.n_kept * 10000 // r.n_docs


# --------------------------------------------------------------------------
# orders_customer_migration
# --------------------------------------------------------------------------


def test_migration_replay(spark, sf_dir, duck):
    from collections import defaultdict

    per = defaultdict(dict)
    for ck, p, cents in duck.execute(
        "SELECT o_custkey,"
        " CASE WHEN year(o_orderdate)*100+month(o_orderdate) < 199800"
        " THEN 1 ELSE 2 END,"
        " SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))"
        " FROM orders GROUP BY 1, 2"
    ).fetchall():
        per[p][ck] = int(cents)
    tiers = {}
    for p, d in per.items():
        ranked = sorted(d.items(), key=lambda x: (-x[1], x[0]))
        n = len(ranked)
        for i, (ck, _) in enumerate(ranked):
            tiers[(p, ck)] = i * 3 // n + 1
    allc = set(per.get(1, {})) | set(per.get(2, {}))
    from collections import Counter

    want = Counter(
        (tiers.get((1, ck), 0), tiers.get((2, ck), 0)) for ck in allc
    )
    got = {
        (r.tier_then, r.tier_now): r.n_customers
        for r in SPECS["orders_customer_migration"].fn(spark, sf_dir).collect()
    }
    assert got == dict(want)


def test_migration_conserves_customers(spark, sf_dir, duck):
    rows = SPECS["orders_customer_migration"].fn(spark, sf_dir).collect()
    n = sum(r.n_customers for r in rows)
    (want,) = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()
    assert n == want
    assert all(0 <= r.tier_then <= 3 and 0 <= r.tier_now <= 3 for r in rows)


# --------------------------------------------------------------------------
# events_lateness_profile
# --------------------------------------------------------------------------


def test_lateness_replay(spark, sf_dir, duck):
    from collections import defaultdict

    WM = 600_000_000
    stats = defaultdict(lambda: [0, 0, 0, 0])  # n, ooo, max_late, dropped
    hwm = {}
    for et, eid, ts in duck.execute(
        "SELECT event_type, event_id, epoch_us(ts) FROM events "
        "ORDER BY event_id"
    ).fetchall():
        a = stats[et]
        a[0] += 1
        h = hwm.get(et)
        late = 0 if h is None or ts >= h else h - ts
        if late > 0:
            a[1] += 1
            a[2] = max(a[2], late)
        if late > WM:
            a[3] += 1
        hwm[et] = max(h or 0, ts)
    want = {
        et: (n, ooo, mx, dr, ooo * 10000 // n)
        for et, (n, ooo, mx, dr) in stats.items()
    }
    got = {
        r.event_type: (
            r.n_events, r.n_out_of_order, r.max_late_us,
            r.n_dropped_by_wm, r.ooo_bp,
        )
        for r in SPECS["events_lateness_profile"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# sample_group_holdout
# --------------------------------------------------------------------------


def test_group_holdout_replay(spark, sf_dir, duck):
    import hashlib
    from collections import defaultdict

    agg = defaultdict(lambda: [0, set(), 0])
    for lang, source, text in duck.execute(
        "SELECT lang, source, text FROM documents"
    ).fetchall():
        h = int(hashlib.md5(source.encode()).hexdigest()[:8], 16) % 100
        split = "eval" if h < 25 else "train"
        a = agg[(split, lang)]
        a[0] += 1
        a[1].add(source)
        a[2] += len(text.split(" "))
    want = {k: (n, len(s), t) for k, (n, s, t) in agg.items()}
    got = {
        (r.split, r.lang): (r.n_docs, r.n_sources, r.n_tokens)
        for r in SPECS["sample_group_holdout"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_group_holdout_no_source_straddles(spark, sf_dir, duck):
    # the defining guarantee: no source appears in both splits
    import hashlib

    rows = SPECS["sample_group_holdout"].fn(spark, sf_dir).collect()
    assert {r.split for r in rows} <= {"train", "eval"}
    sources = [
        s for (s,) in duck.execute(
            "SELECT DISTINCT source FROM documents"
        ).fetchall()
    ]
    eval_sources = {
        s for s in sources
        if int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 100 < 25
    }
    n_eval = sum(r.n_sources for r in rows if r.split == "eval")
    n_train = sum(r.n_sources for r in rows if r.split == "train")
    # per-lang counts can double-count a multi-lang source, but the
    # partition itself is source-exact: eval rows only ever contain
    # eval_sources (and vice versa), so the totals bound holds
    assert n_eval >= len(eval_sources) > 0
    assert n_train >= len(sources) - len(eval_sources) > 0


# --------------------------------------------------------------------------
# sim_ivf_balance
# --------------------------------------------------------------------------


def test_ivf_balance_conserves_corpus(spark, sf_dir, duck):
    rows = SPECS["sim_ivf_balance"].fn(spark, sf_dir).collect()
    (n_vecs,) = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()
    assert sum(r.n_vectors for r in rows) == n_vecs
    tot_share = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) < tot_share <= 10000
    for r in rows:
        # load ratio is share * ncells (floor legs may differ by <1bp*ncells)
        assert abs(r.load_ratio_bp - r.share_bp * 8) <= 8


def test_ivf_balance_matches_index_cells(spark, sf_dir):
    # the diagnostic and the index must see the SAME cell universe:
    # every cell the IVF query path probes exists in the balance table
    balance_cells = {
        r.cell for r in SPECS["sim_ivf_balance"].fn(spark, sf_dir).collect()
    }
    assert balance_cells  # non-empty, bounded by ncells+1 (ids 0..8)
    assert len(balance_cells) <= 9


# --------------------------------------------------------------------------
# dedup_cluster_stats
# --------------------------------------------------------------------------


def test_cluster_stats_composes_clusters(spark, sf_dir):
    from collections import Counter

    cc = SPECS["dedup_clusters"].fn(spark, sf_dir).collect()
    sizes = Counter()
    for r in cc:
        if r.is_canonical:
            sizes[r.cluster_size] += 1
    rows = SPECS["dedup_cluster_stats"].fn(spark, sf_dir).collect()
    got = {r.cluster_size: r.n_clusters for r in rows}
    assert got == dict(sizes)
    for r in rows:
        assert r.n_docs == r.cluster_size * r.n_clusters
        assert r.n_redundant == (r.cluster_size - 1) * r.n_clusters
        assert r.cluster_size >= 2  # CC input is the pair graph


# --------------------------------------------------------------------------
# graph_clustering_coeff
# --------------------------------------------------------------------------


def test_clustering_coeff_composes(spark, sf_dir):
    tri = SPECS["graph_triangles"].fn(spark, sf_dir).collect()[0]
    cc = SPECS["graph_clustering_coeff"].fn(spark, sf_dir).collect()[0]
    assert cc.n_triangles == tri.n_triangles
    assert cc.global_cc_bp == 3 * cc.n_triangles * 10000 // cc.n_wedges
    assert 0 <= cc.global_cc_bp <= 10000


def test_clustering_coeff_wedges_replay(spark, sf_dir, duck):
    from collections import defaultdict

    orders = defaultdict(set)
    for ok, pk in duck.execute(
        "SELECT l_orderkey, l_partkey FROM lineitem"
    ).fetchall():
        orders[ok].add(pk)
    deg = defaultdict(int)
    seen = set()
    for ps in orders.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                if (ps[i], ps[j]) not in seen:
                    seen.add((ps[i], ps[j]))
                    deg[ps[i]] += 1
                    deg[ps[j]] += 1
    want = sum(d * (d - 1) // 2 for d in deg.values())
    cc = SPECS["graph_clustering_coeff"].fn(spark, sf_dir).collect()[0]
    assert cc.n_wedges == want


# --------------------------------------------------------------------------
# events_conversion_lag
# --------------------------------------------------------------------------


def test_conversion_lag_replay(spark, sf_dir, duck):
    from bisect import bisect_right as br
    from collections import defaultdict

    clicks = defaultdict(list)
    for u, ts in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events "
        "WHERE event_type = 'click' ORDER BY user_id, ts"
    ).fetchall():
        clicks[u].append(ts)
    gaps = []
    n_purch = 0
    for u, ts in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events "
        "WHERE event_type = 'purchase'"
    ).fetchall():
        n_purch += 1
        arr = clicks.get(u, [])
        i = br(arr, ts)
        if i:
            gaps.append(ts - arr[i - 1])
    gaps.sort()
    n = len(gaps)
    med2 = gaps[(n - 1) // 2] + gaps[n // 2]
    p90 = gaps[(9 * n + 9) // 10 - 1]
    row = SPECS["events_conversion_lag"].fn(spark, sf_dir).collect()[0]
    assert (
        row.n_purchases, row.n_converted, row.min_gap_us,
        row.med2_gap_us, row.p90_gap_us, row.max_gap_us,
    ) == (n_purch, n, min(gaps), med2, p90, max(gaps))


# --------------------------------------------------------------------------
# fn_surrogate_key
# --------------------------------------------------------------------------


def test_surrogate_key_replay(spark, sf_dir, duck):
    import hashlib
    from collections import Counter

    keys = {}
    for ck, name, nk in duck.execute(
        "SELECT c_custkey, c_name, c_nationkey FROM customer"
    ).fetchall():
        keys[ck] = int(
            hashlib.md5(f"{name}#{nk}".encode()).hexdigest()[:15], 16
        )
    shared = Counter(keys.values())
    rows = SPECS["fn_surrogate_key"].fn(spark, sf_dir).collect()
    got = {r.c_custkey: (r.skey, r.n_shared) for r in rows}
    assert got == {ck: (k, shared[k]) for ck, k in keys.items()}


def test_surrogate_key_stability(spark, sf_dir):
    # pure function of the key: two invocations mint identical keys
    a = {r.c_custkey: r.skey
         for r in SPECS["fn_surrogate_key"].fn(spark, sf_dir).collect()}
    b = {r.c_custkey: r.skey
         for r in SPECS["fn_surrogate_key"].fn(spark, sf_dir).collect()}
    assert a == b
    assert all(k >= 0 for k in a.values())  # 60-bit => positive int64


# --------------------------------------------------------------------------
# orders_backlog
# --------------------------------------------------------------------------


def test_orders_backlog_replay(spark, sf_dir, duck):
    # literal interval semantics: for each month-end, count orders with
    # open <= eom and close > eom — the definition the differencing
    # form must reproduce exactly
    opens = dict(duck.execute(
        "SELECT strftime(o_orderdate, '%Y-%m'), COUNT(*) "
        "FROM orders GROUP BY 1"
    ).fetchall())
    closes = dict(duck.execute(
        "SELECT strftime(GREATEST(ship_d, o_orderdate), '%Y-%m'), COUNT(*) "
        "FROM orders JOIN ("
        "  SELECT l_orderkey, MAX(l_shipdate) AS ship_d FROM lineitem "
        "  GROUP BY 1) ON o_orderkey = l_orderkey GROUP BY 1"
    ).fetchall())
    months = sorted(set(opens) | set(closes))
    run, want = 0, {}
    for m in months:
        run += opens.get(m, 0) - closes.get(m, 0)
        want[m] = (opens.get(m, 0), closes.get(m, 0), run)
    rows = SPECS["orders_backlog"].fn(spark, sf_dir).collect()
    got = {r.mo: (r.n_opened, r.n_closed, r.backlog_eom) for r in rows}
    assert got == want
    # differencing == interval definition, spot-checked per month-end
    for m in months[::7]:
        # open <= eom AND (never ships OR clamped close > eom)
        n_open = duck.execute(
            "SELECT COUNT(*) FROM orders o LEFT JOIN ("
            "  SELECT l_orderkey, MAX(l_shipdate) AS ship_d "
            "  FROM lineitem GROUP BY 1) c "
            "ON o.o_orderkey = c.l_orderkey "
            "WHERE strftime(o.o_orderdate, '%Y-%m') <= ? "
            "  AND (c.ship_d IS NULL OR "
            "       strftime(GREATEST(c.ship_d, o.o_orderdate), "
            "                '%Y-%m') > ?)",
            [m, m],
        ).fetchone()[0]
        assert want[m][2] == n_open, m


# --------------------------------------------------------------------------
# graph_link_predict
# --------------------------------------------------------------------------


def test_link_predict_replay(spark, sf_dir, duck):
    LP_SCALE, CAP, TOPK = 1_000_000, 64, 20
    adj = defaultdict(set)
    for u, v in duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a "
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey"
    ).fetchall():
        adj[u].add(v)
    score, common = defaultdict(int), defaultdict(int)
    for w, ns in adj.items():
        if len(ns) > CAP:
            continue
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                if b not in adj[a]:  # non-adjacent candidates only
                    score[(a, b)] += LP_SCALE // len(ns)
                    common[(a, b)] += 1
    want = sorted(
        ((a, b, s, common[(a, b)]) for (a, b), s in score.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:TOPK]
    rows = SPECS["graph_link_predict"].fn(spark, sf_dir).collect()
    got = [(r.u, r.v, r.ra_score, r.n_common) for r in rows]
    assert got == want


# --------------------------------------------------------------------------
# ts_changepoint
# --------------------------------------------------------------------------


def test_changepoint_replay(spark, sf_dir, duck):
    daily = dict(duck.execute(
        "SELECT epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1"
    ).fetchall())
    days = sorted(daily)
    n, s = len(days), sum(daily.values())
    best = None
    ps = 0
    for t, d in enumerate(days, start=1):
        ps += daily[d]
        if t == n:
            continue  # C_n == 0 identically, excluded by the operator
        c = n * ps - t * s
        key = (-abs(c), d)
        if best is None or key < best[0]:
            best = (key, (d, t, ps, c))
    d, t, ps, c = best[1]
    row = SPECS["ts_changepoint"].fn(spark, sf_dir).collect()[0]
    assert (
        row.cp_day, row.n_days, row.total_events, row.cusum_cp,
        row.days_before, row.mean_before_x100, row.mean_after_x100,
    ) == (d, n, s, c, t, 100 * ps // t, 100 * (s - ps) // (n - t))
    # the chosen day genuinely splits the means (non-degenerate series)
    assert row.mean_before_x100 != row.mean_after_x100


# --------------------------------------------------------------------------
# sample_time_split
# --------------------------------------------------------------------------


def test_time_split_replay(spark, sf_dir, duck):
    TRAIN_END, EVAL_START = 19_742, 19_745
    per = defaultdict(lambda: [0, set(), None, None])
    for ts_us, u in duck.execute(
        "SELECT epoch_us(ts), user_id FROM events"
    ).fetchall():
        day = ts_us // DAY_US
        b = ("train" if day < TRAIN_END
             else "embargo" if day < EVAL_START else "eval")
        s = per[b]
        s[0] += 1
        s[1].add(u)
        s[2] = day if s[2] is None else min(s[2], day)
        s[3] = day if s[3] is None else max(s[3], day)
    train_users = per["train"][1]
    rows = SPECS["sample_time_split"].fn(spark, sf_dir).collect()
    got = {r.split: (r.n_events, r.n_users, r.min_day, r.max_day,
                     r.n_users_seen_in_train) for r in rows}
    want = {b: (s[0], len(s[1]), s[2], s[3], len(s[1] & train_users))
            for b, s in per.items()}
    assert got == want
    # split boundaries leave a genuine embargo gap
    assert got["train"][3] < TRAIN_END <= got["embargo"][2]
    assert got["embargo"][3] < EVAL_START <= got["eval"][2]


# --------------------------------------------------------------------------
# curate_canonical
# --------------------------------------------------------------------------


def test_curate_canonical_replay(spark, sf_dir, duck):
    # clusters from the registered clustering op (composition is the
    # contract); richness replayed in pure python
    cc = SPECS["dedup_clusters"].fn(spark, sf_dir).collect()
    rich = {
        d: len(set(t.split(" ")))
        for d, t in duck.execute(
            "SELECT doc_id, text FROM documents"
        ).fetchall()
    }
    by_cluster = defaultdict(list)
    for r in cc:
        by_cluster[r.cluster_id].append(r.doc_id)
    want = {}
    for cid, docs in by_cluster.items():
        keep = min(docs, key=lambda d: (-rich[d], d))
        want[cid] = (len(docs), keep, rich[keep], int(keep != cid))
    rows = SPECS["curate_canonical"].fn(spark, sf_dir).collect()
    got = {r.cluster_id: (r.cluster_size, r.keep_doc_id,
                          r.keep_richness, r.switched) for r in rows}
    assert got == want
    # the quality-aware pick must actually differ somewhere, or the
    # operator adds nothing over dedup_clusters' min-id default
    assert any(v[3] for v in got.values())


# --------------------------------------------------------------------------
# agg_winsorized_mean
# --------------------------------------------------------------------------


def test_winsorized_mean_replay(spark, sf_dir, duck):
    vals = defaultdict(list)
    for f, p in duck.execute(
        "SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100, 0) "
        "AS BIGINT) FROM lineitem"
    ).fetchall():
        vals[f].append(p)
    want = {}
    for f, xs in vals.items():
        xs.sort()
        n = len(xs)
        lo = xs[(5 * n + 99) // 100 - 1]
        hi = xs[(95 * n + 99) // 100 - 1]
        clamped = [min(max(x, lo), hi) for x in xs]
        want[f] = (
            n, lo, hi,
            sum(x < lo for x in xs), sum(x > hi for x in xs),
            sum(clamped) // n, sum(xs) // n,
        )
    rows = SPECS["agg_winsorized_mean"].fn(spark, sf_dir).collect()
    got = {r.l_returnflag: (
        r.n, r.lo_cents, r.hi_cents, r.n_clamped_low, r.n_clamped_high,
        r.winsor_mean_cents, r.raw_mean_cents) for r in rows}
    assert got == want
    # the clamp must move the mean on this heavy-tailed data, and the
    # clamped mass must be ~5% per side (ceil-rank gives <= p% below)
    for f in got:
        n, lo, hi, nl, nh, wm, rm = got[f]
        assert wm != rm
        assert nl <= n * 5 // 100 and nh <= n * 5 // 100


# --------------------------------------------------------------------------
# win_rolling_regression
# --------------------------------------------------------------------------


def test_rolling_regression_replay(spark, sf_dir, duck):
    series = defaultdict(list)
    for et, day, y in duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall():
        series[et].append((day, y))
    want = {}
    for et, pts in series.items():
        for i in range(6, len(pts)):
            frame = pts[i - 6:i + 1]
            k = len(frame)
            sx = sum(d for d, _ in frame)
            sy = sum(y for _, y in frame)
            sxy = sum(d * y for d, y in frame)
            sxx = sum(d * d for d, _ in frame)
            num, den = k * sxy - sx * sy, k * sxx - sx * sx
            day, y = pts[i]
            want[(et, day)] = (y, num, den, num / den)
    rows = SPECS["win_rolling_regression"].fn(spark, sf_dir).collect()
    got = {(r.event_type, r.day): (r.y, r.slope_num, r.slope_den, r.slope)
           for r in rows}
    assert got == want
    # trends must move in both directions on real data
    slopes = [v[3] for v in got.values()]
    assert min(slopes) < 0 < max(slopes)


# --------------------------------------------------------------------------
# sample_balanced
# --------------------------------------------------------------------------


def test_sample_balanced_replay(spark, sf_dir, duck):
    import hashlib
    by_class = defaultdict(list)
    for et, eid in duck.execute(
        "SELECT event_type, event_id FROM events"
    ).fetchall():
        h = hashlib.md5(str(eid).encode()).hexdigest()
        by_class[et].append((h, eid))
    k = min(len(v) for v in by_class.values())
    want = set()
    for et, xs in by_class.items():
        xs.sort()
        want |= {(et, eid) for _, eid in xs[:k]}
    rows = SPECS["sample_balanced"].fn(spark, sf_dir).collect()
    got = {(r.event_type, r.event_id) for r in rows}
    assert got == want
    # perfectly balanced: every class at exactly k
    from collections import Counter
    cnt = Counter(et for et, _ in got)
    assert set(cnt.values()) == {k}


# --------------------------------------------------------------------------
# ts_decompose
# --------------------------------------------------------------------------


def test_ts_decompose_replay(spark, sf_dir, duck):
    M = 1_000_000_000
    daily = dict(duck.execute(
        "SELECT epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1"
    ).fetchall())
    days = sorted(daily)
    trend, det = {}, {}
    for i in range(3, len(days) - 3):
        d = days[i]
        trend[d] = 100 * sum(daily[x] for x in days[i - 3:i + 4]) // 7
        det[d] = 100 * daily[d] - trend[d]
    seas = {}
    for dow in range(7):
        ds = [det[d] for d in det if (d + 4) % 7 == dow]
        if ds:
            seas[dow] = sum(x + M for x in ds) // len(ds) - M
    rows = SPECS["ts_decompose"].fn(spark, sf_dir).collect()
    got = {r.day: (r.x, r.dow, r.trend_x100, r.seasonal_x100,
                   r.resid_x100) for r in rows}
    want = {d: (daily[d], (d + 4) % 7, trend[d], seas[(d + 4) % 7],
                det[d] - seas[(d + 4) % 7]) for d in det}
    assert got == want
    # components genuinely split the signal: residual smaller than raw
    # deviation on average (the whole point of decomposing first)
    mean_x100 = 100 * sum(daily.values()) // len(daily)
    raw_dev = sum(abs(100 * daily[d] - mean_x100) for d in det)
    resid_dev = sum(abs(v[4]) for v in got.values())
    assert resid_dev < raw_dev


# --------------------------------------------------------------------------
# dedup_threshold_sweep
# --------------------------------------------------------------------------


def test_threshold_sweep_replay(spark, sf_dir, duck):
    # replay the sweep from the REGISTERED pair op's own output — the
    # composition contract: sweep == re-aggregation of those pairs
    pairs = SPECS["dedup_embed_cosine"].fn(spark, sf_dir).collect()
    want = {}
    for i in range(11):
        t_bp = 4000 + 500 * i
        hit = [p for p in pairs if int(p.cos_sim * 10000) >= t_bp]
        docs = {p.vec_a for p in hit} | {p.vec_b for p in hit}
        want[t_bp] = (len(hit), len(docs))
    rows = SPECS["dedup_threshold_sweep"].fn(spark, sf_dir).collect()
    got = {r.t_bp: (r.n_pairs, r.n_docs) for r in rows}
    assert got == want
    # curve must be monotone non-increasing in the threshold
    ts = sorted(got)
    for a, b in zip(ts, ts[1:]):
        assert got[a][0] >= got[b][0] and got[a][1] >= got[b][1]
    assert got[ts[0]][0] > 0  # floor threshold reproduces the dedup op


# --------------------------------------------------------------------------
# graph_modularity
# --------------------------------------------------------------------------


def test_graph_modularity_replay(spark, sf_dir, duck):
    edges = duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a "
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey"
    ).fetchall()
    brand = dict(duck.execute(
        "SELECT p_partkey, p_brand FROM part"
    ).fetchall())
    m2 = len(edges)
    d_c, e2_c = defaultdict(int), defaultdict(int)
    for u, v in edges:
        d_c[brand[u]] += 1
        if brand[u] == brand[v]:
            e2_c[brand[u]] += 1
    rows = SPECS["graph_modularity"].fn(spark, sf_dir).collect()
    got = {r.brand: (r.d_c, r.e2_c, r.q_contrib) for r in rows}
    assert set(got) == set(d_c)
    q_total = 0.0
    for b in d_c:
        num = m2 * e2_c[b] - d_c[b] * d_c[b]
        assert got[b][:2] == (d_c[b], e2_c[b])
        assert got[b][2] == num / (m2 * m2)
        q_total += num / (m2 * m2)
    # sanity: modularity lives in [-1, 1]; and with ~25 brands the
    # null expectation term forces Q well below 1
    assert -1.0 <= q_total <= 1.0


# --------------------------------------------------------------------------
# multimodal_phash_clusters
# --------------------------------------------------------------------------


def test_phash_clusters_vs_pairs(spark, sf_dir):
    # transitive closure of the registered pair op: every pair lands in
    # one cluster; every cluster is connected via pairs
    pairs = [
        (r.doc_a, r.doc_b)
        for r in SPECS["multimodal_phash_pairs"].fn(spark, sf_dir).collect()
    ]
    rows = SPECS["multimodal_phash_clusters"].fn(spark, sf_dir).collect()
    lbl = {r.doc_id: r.cluster_id for r in rows}
    for a, b in pairs:
        assert lbl[a] == lbl[b]
    by_cluster = defaultdict(set)
    for r in rows:
        by_cluster[r.cluster_id].add(r.doc_id)
        assert r.cluster_id == min(by_cluster[r.cluster_id] | {r.cluster_id})
        assert r.is_canonical == int(r.doc_id == r.cluster_id)
    sizes = {r.cluster_id: r.cluster_size for r in rows}
    for cid, members in by_cluster.items():
        assert sizes[cid] == len(members)
        assert min(members) == cid


# --------------------------------------------------------------------------
# win_ohlc_bars
# --------------------------------------------------------------------------


def test_ohlc_bars_replay(spark, sf_dir, duck):
    bars = defaultdict(list)
    for et, ts_us, eid, cents in duck.execute(
        "SELECT event_type, epoch_us(ts), event_id, "
        "CAST(ROUND(value * 100, 0) AS BIGINT) FROM events"
    ).fetchall():
        bars[(et, ts_us // DAY_US)].append((ts_us, eid, cents))
    want = {}
    for key, xs in bars.items():
        xs.sort()
        cs = [c for _, _, c in xs]
        want[key] = (xs[0][2], max(cs), min(cs), xs[-1][2], sum(cs),
                     len(cs))
    rows = SPECS["win_ohlc_bars"].fn(spark, sf_dir).collect()
    got = {(r.event_type, r.day): (
        r.open_cents, r.high_cents, r.low_cents, r.close_cents,
        r.volume_cents, r.n_events) for r in rows}
    assert got == want
    # invariant: low <= open, close <= high on every bar
    for o, h, l, c, _, _ in got.values():
        assert l <= o <= h and l <= c <= h


# --------------------------------------------------------------------------
# orders_reorder_rate
# --------------------------------------------------------------------------


def test_reorder_rate_replay(spark, sf_dir, duck):
    cp = defaultdict(set)
    for ck, pk, ok in duck.execute(
        "SELECT o.o_custkey, l.l_partkey, l.l_orderkey FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).fetchall():
        cp[(ck, pk)].add(ok)
    per_part = defaultdict(lambda: [0, 0, 0])
    for (ck, pk), orders in cp.items():
        s = per_part[pk]
        s[0] += 1
        s[1] += int(len(orders) >= 2)
        s[2] += len(orders)
    rows = SPECS["orders_reorder_rate"].fn(spark, sf_dir).collect()
    got = {r.l_partkey: (r.n_buyers, r.n_repeat_buyers, r.n_orders_total,
                         r.repeat_bp) for r in rows}
    want = {pk: (s[0], s[1], s[2], s[1] * 10000 // s[0])
            for pk, s in per_part.items()}
    assert got == want


# --------------------------------------------------------------------------
# events_hazard_rate
# --------------------------------------------------------------------------


def test_hazard_rate_replay(spark, sf_dir, duck):
    users = {}
    obs_end = 0
    for u, day, et in duck.execute(
        "SELECT user_id, epoch_us(ts) // 86400000000, event_type "
        "FROM events"
    ).fetchall():
        obs_end = max(obs_end, day)
        first, conv = users.get(u, (day, None))
        first = min(first, day)
        if et == "purchase":
            conv = day if conv is None else min(conv, day)
        users[u] = (first, conv)
    conv_k, cens_k = defaultdict(int), defaultdict(int)
    for first, conv in users.values():
        if conv is not None:
            conv_k[conv - first] += 1
        else:
            cens_k[obs_end - first] += 1
    ks = sorted(set(conv_k) | set(cens_k))
    want = {}
    for k in ks:
        at_risk = sum(v for j, v in conv_k.items() if j >= k) + sum(
            v for j, v in cens_k.items() if j >= k)
        want[k] = (at_risk, conv_k.get(k, 0), cens_k.get(k, 0),
                   conv_k.get(k, 0) * 10000 // at_risk)
    rows = SPECS["events_hazard_rate"].fn(spark, sf_dir).collect()
    got = {r.k: (r.n_at_risk, r.n_converted, r.n_censored, r.hazard_bp)
           for r in rows}
    assert got == want
    # life-table identity: at-risk at the smallest k equals all users
    assert got[ks[0]][0] == len(users)


# --------------------------------------------------------------------------
# graph_random_walk
# --------------------------------------------------------------------------


def test_random_walk_replay(spark, sf_dir, duck):
    import hashlib
    adj = defaultdict(set)
    for u, v in duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a "
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey"
    ).fetchall():
        adj[u].add(v)

    def h(start, step, nxt):
        return int(
            hashlib.md5(f"{start}|{step}|{nxt}".encode()).hexdigest()[:8],
            16,
        )

    want = {}
    for start in adj:
        cur, hops = start, []
        for step in range(1, 5):
            cur = min(adj[cur], key=lambda y: (h(start, step, y), y))
            hops.append(cur)
        want[start] = tuple(hops)
    rows = SPECS["graph_random_walk"].fn(spark, sf_dir).collect()
    got = {r.start: (r.hop1, r.hop2, r.hop3, r.hop4) for r in rows}
    assert got == want
    # every hop must actually be a neighbor of its predecessor
    for start, hops in got.items():
        prev = start
        for nxt in hops:
            assert nxt in adj[prev]
            prev = nxt
    # the corpus is not one frozen successor function: some vertex is
    # left via different edges in different walks (start re-keying)
    succ = defaultdict(set)
    for start, hops in got.items():
        prev = start
        for i, nxt in enumerate(hops):
            succ[(prev, i % 2)].add(nxt)
            prev = nxt
    assert any(len(v) > 1 for v in succ.values())


# --------------------------------------------------------------------------
# table_fingerprint
# --------------------------------------------------------------------------


def test_table_fingerprint_replay(spark, sf_dir, duck):
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    n, tot = 0, 0
    for ok, ck, st, dt in duck.execute(
        "SELECT o_orderkey, o_custkey, o_orderstatus, "
        "strftime(o_orderdate, '%Y-%m-%d') FROM orders"
    ).fetchall():
        tot += h60(f"{ok}|{ck}|{st}|{dt}")
        n += 1
    want["orders"] = (n, tot % 2**60)
    n, tot = 0, 0
    for ck, nm, nk in duck.execute(
        "SELECT c_custkey, c_name, c_nationkey FROM customer"
    ).fetchall():
        tot += h60(f"{ck}|{nm}|{nk}")
        n += 1
    want["customer"] = (n, tot % 2**60)
    n, tot = 0, 0
    for sk, nm, nk in duck.execute(
        "SELECT s_suppkey, s_name, s_nationkey FROM supplier"
    ).fetchall():
        tot += h60(f"{sk}|{nm}|{nk}")
        n += 1
    want["supplier"] = (n, tot % 2**60)
    rows = SPECS["table_fingerprint"].fn(spark, sf_dir).collect()
    got = {r.tbl: (r.n_rows, int(r.checksum)) for r in rows}
    assert got == want


# --------------------------------------------------------------------------
# dq_referential_integrity
# --------------------------------------------------------------------------


def test_referential_integrity_replay(spark, sf_dir, duck):
    li_ok = {r[0] for r in duck.execute(
        "SELECT DISTINCT l_orderkey FROM lineitem").fetchall()}
    o_ok = {r[0] for r in duck.execute(
        "SELECT o_orderkey FROM orders").fetchall()}
    n_li = duck.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    n_o = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    rows = SPECS["dq_referential_integrity"].fn(spark, sf_dir).collect()
    got = {r.check_name: (r.n_violations, r.n_checked, r.violation_bp)
           for r in rows}
    assert set(got) == {
        "lineitem_orphan_orderkey", "order_without_lineitems",
        "lineitem_orphan_partkey", "orders_orphan_custkey",
        "ship_before_order",
    }
    n_orphan_o = len(o_ok - li_ok)
    assert got["order_without_lineitems"] == (
        n_orphan_o, n_o, n_orphan_o * 10000 // n_o)
    n_ship = duck.execute(
        "SELECT COUNT(*) FROM lineitem l JOIN orders o "
        "ON o.o_orderkey = l.l_orderkey "
        "WHERE l.l_shipdate < o.o_orderdate").fetchone()[0]
    assert got["ship_before_order"] == (
        n_ship, n_li, n_ship * 10000 // n_li)
    # this synthetic dataset genuinely violates exactly these two
    assert got["order_without_lineitems"][0] > 0
    assert got["ship_before_order"][0] > 0
    assert got["lineitem_orphan_orderkey"][0] == 0
    assert got["lineitem_orphan_partkey"][0] == 0
    assert got["orders_orphan_custkey"][0] == 0


# --------------------------------------------------------------------------
# win_cusum_chart
# --------------------------------------------------------------------------


def test_cusum_chart_replay(spark, sf_dir, duck):
    series = defaultdict(dict)
    for et, day, x in duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall():
        series[et][day] = x

    def med2_of(xs):
        xs = sorted(xs)
        n = len(xs)
        return (xs[(n - 1) // 2] + xs[n // 2])

    want = {}
    for et, by_day in series.items():
        med2 = med2_of(list(by_day.values()))
        mad4 = med2_of([abs(2 * x - med2) for x in by_day.values()])
        # literal recursion S_t = max(0, S_{t-1} + d8_t) — the closed
        # form the operator uses must match this exactly
        s8 = 0
        for day in sorted(by_day):
            d8 = 8 * by_day[day] - 4 * med2 - mad4
            s8 = max(0, s8 + d8)
            want[(et, day)] = (by_day[day], mad4, s8,
                               int(s8 > 10 * mad4))
    rows = SPECS["win_cusum_chart"].fn(spark, sf_dir).collect()
    got = {(r.event_type, r.day): (r.x, r.mad4, r.s8, r.alarm)
           for r in rows}
    assert got == want


# --------------------------------------------------------------------------
# join_pit_scd2
# --------------------------------------------------------------------------


def test_pit_scd2_replay(spark, sf_dir, duck):
    from bisect import bisect_right
    orders = duck.execute(
        "SELECT o_custkey, o_orderkey, o_orderdate FROM orders "
        "ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall()
    own, vd = {}, defaultdict(list)
    prev_c, ver = None, 0
    for ck, ok, d in orders:
        ver = ver + 1 if ck == prev_c else 1
        prev_c = ck
        own[ok] = (ck, ver)
        vd[ck].append((d, ver))
    # collapse to one (date -> max version) ladder per customer
    ladder = {}
    for ck, vs in vd.items():
        by_date = {}
        for d, v in vs:
            by_date[d] = max(by_date.get(d, 0), v)
        ds = sorted(by_date)
        ladder[ck] = (ds, [by_date[d] for d in ds])
    last_ship = dict(duck.execute(
        "SELECT l_orderkey, MAX(l_shipdate) FROM lineitem GROUP BY 1"
    ).fetchall())
    rows = SPECS["join_pit_scd2"].fn(spark, sf_dir).collect()
    got = {r.o_orderkey: (r.o_custkey, r.own_version, r.version_at_ship,
                          r.versions_advanced, r.matched) for r in rows}
    assert set(got) == set(last_ship) & set(own)
    n_neg = 0
    for ok, ship in last_ship.items():
        ck, ov = own[ok]
        ds, vs = ladder[ck]
        i = bisect_right(ds, ship)
        if i == 0:
            assert got[ok] == (ck, ov, None, None, 0)
        else:
            vas = vs[i - 1]
            assert got[ok] == (ck, ov, vas, vas - ov, 1)
            n_neg += vas < ov
    # the ship-before-order defect must be visible as regressions
    assert n_neg > 0


# --------------------------------------------------------------------------
# multimodal_audio_vad
# --------------------------------------------------------------------------


def test_audio_vad_replay(spark, sf_dir, duck):
    FRAME = 64
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        s = [(b - 128) * 256 for b in (text.encode("utf-8") or b"\x80")]
        nf = (len(s) + FRAME - 1) // FRAME
        fe = [sum(x * x for x in s[i * FRAME:(i + 1) * FRAME])
              for i in range(nf)]
        tot = sum(fe)
        act = [e * nf > tot for e in fe]
        n_seg = longest = run = 0
        for a in act:
            if a:
                run += 1
                n_seg += run == 1
                longest = max(longest, run)
            else:
                run = 0
        want[doc_id] = (len(s), nf, sum(act), n_seg, longest,
                        sum(act) * 10000 // nf)
    rows = SPECS["multimodal_audio_vad"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_samples, r.n_frames, r.n_active, r.n_segments,
                      r.longest_run, r.active_bp) for r in rows}
    assert got == want
    # the adaptive gate must produce real segmentation structure
    assert any(v[3] >= 2 for v in got.values())
    assert all(0 < v[5] < 10000 for v in got.values() if v[1] > 1)


# --------------------------------------------------------------------------
# dedup_band_tuning
# --------------------------------------------------------------------------


def test_band_tuning_replay(spark, sf_dir, duck):
    rows = SPECS["dedup_band_tuning"].fn(spark, sf_dir).collect()
    got = {(r.bands, r.rows_per_band): (r.n_candidates, r.n_verified,
                                        r.recall_bp, r.expected_p50_bp)
           for r in rows}
    assert set(got) == {(4, 8), (8, 4), (16, 2), (32, 1)}
    # looser banding (fewer rows per band) can only widen candidates
    # and catch at least as many verified dups — monotone in r
    order = [(4, 8), (8, 4), (16, 2), (32, 1)]
    for a, b in zip(order, order[1:]):
        assert got[a][0] <= got[b][0]
        assert got[a][1] <= got[b][1]
    # 32x1 is the truth set: recall exactly 10000 bp
    assert got[(32, 1)][2] == 10000
    # theoretical S-curve at j=0.5: 1-(1-0.5^r)^b in floor bp
    for b, r in order:
        assert got[(b, r)][3] == int((1 - (1 - 0.5**r) ** b) * 10000)
    # shipped 8x4 config catches everything on this corpus (its
    # certified pair count matches the sweep's verified count)
    shipped = len(SPECS["dedup_minhash"].fn(spark, sf_dir).collect())
    assert got[(8, 4)][1] <= shipped + got[(8, 4)][0]


# --------------------------------------------------------------------------
# events_did
# --------------------------------------------------------------------------


def test_events_did_replay(spark, sf_dir, duck):
    import hashlib
    cells = defaultdict(lambda: [0, 0])
    for u, ts_us, cents in duck.execute(
        "SELECT user_id, epoch_us(ts), CAST(ROUND(value * 100, 0) AS "
        "BIGINT) FROM events WHERE event_type = 'purchase'"
    ).fetchall():
        grp = ("treatment"
               if int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
               else "control")
        period = "post" if ts_us // DAY_US >= 19_738 else "pre"
        c = cells[(grp, period)]
        c[0] += 1
        c[1] += cents
    means = {k: v[1] * 100 // v[0] for k, v in cells.items()}
    did = ((means[("treatment", "post")] - means[("treatment", "pre")])
           - (means[("control", "post")] - means[("control", "pre")]))
    rows = SPECS["events_did"].fn(spark, sf_dir).collect()
    got = {(r.grp, r.period): (r.n, r.sum_cents, r.mean_x100, r.did_x100)
           for r in rows}
    assert set(got) == set(cells)
    for k, (n, sc) in ((k, (v[0], v[1])) for k, v in cells.items()):
        assert got[k] == (n, sc, means[k], did)
    # hash assignment splits purchases roughly in half
    nt = sum(v[0] for k, v in cells.items() if k[0] == "treatment")
    nc = sum(v[0] for k, v in cells.items() if k[0] == "control")
    assert abs(nt - nc) < (nt + nc) // 4


# --------------------------------------------------------------------------
# sample_kfold
# --------------------------------------------------------------------------


def test_sample_kfold_replay(spark, sf_dir, duck):
    import hashlib
    cells = defaultdict(lambda: [0, 0])
    n_total = 0
    for d, lang, nc in duck.execute(
        "SELECT doc_id, lang, n_chars FROM documents"
    ).fetchall():
        fold = int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16) % 5
        cells[(fold, lang)][0] += 1
        cells[(fold, lang)][1] += nc
        n_total += 1
    rows = SPECS["sample_kfold"].fn(spark, sf_dir).collect()
    got = {(r.fold, r.lang): (r.n_docs, r.n_chars,
                              r.n_train_pool_if_holdout) for r in rows}
    want = {k: (v[0], v[1], n_total - v[0]) for k, v in cells.items()}
    assert got == want
    # disjoint + exhaustive: fold doc counts sum to the corpus
    assert sum(v[0] for v in got.values()) == n_total
    assert {f for f, _ in got} == set(range(5))


# --------------------------------------------------------------------------
# scan_txn_log
# --------------------------------------------------------------------------


def test_txn_log_replay(spark, sf_dir, duck):
    months = sorted(
        (mo, n) for mo, n in duck.execute(
            "SELECT strftime(o_orderdate, '%Y-%m'), COUNT(*) "
            "FROM orders GROUP BY 1"
        ).fetchall()
    )
    want = {}
    for i, (mo, n) in enumerate(months):
        if i % 4 == 2:
            want[f"{mo}-compact.parquet"] = (n, 1000 + i)
        else:
            want[f"{mo}.parquet"] = (n, i)
    rows = SPECS["scan_txn_log"].fn(spark, sf_dir).collect()
    got = {r.file: (r.n_rows, r.version_added) for r in rows}
    assert got == want
    # removed originals must NOT be served
    for i, (mo, _n) in enumerate(months):
        if i % 4 == 2:
            assert f"{mo}.parquet" not in got
    # snapshot row total equals the table (no rows lost to compaction)
    assert sum(n for n, _ in got.values()) == sum(n for _, n in months)


# --------------------------------------------------------------------------
# graph_ego_features
# --------------------------------------------------------------------------


def test_ego_features_replay(spark, sf_dir, duck):
    adj = defaultdict(set)
    for u, v in duck.execute(
        "SELECT DISTINCT a.l_partkey, b.l_partkey FROM lineitem a "
        "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey <> b.l_partkey"
    ).fetchall():
        adj[u].add(v)
    rows = SPECS["graph_ego_features"].fn(spark, sf_dir).collect()
    got = {r.p_partkey: (r.degree, r.n_triangles, r.ego_density_bp)
           for r in rows}
    assert set(got) == set(adj)
    total_t = 0
    for n, ns in adj.items():
        d = len(ns)
        t = sum(
            1 for a in ns for b in ns if a < b and b in adj[a]
        )
        dens = 2 * t * 10000 // (d * (d - 1)) if d >= 2 else 0
        assert got[n] == (d, t, dens), n
        total_t += t
    # per-node counts triple-count the global triangle total
    g = SPECS["graph_triangles"].fn(spark, sf_dir).collect()[0]
    assert total_t == 3 * g.n_triangles


# --------------------------------------------------------------------------
# orders_margin_waterfall
# --------------------------------------------------------------------------


def test_margin_waterfall_reconciles(spark, sf_dir, duck):
    rows = SPECS["orders_margin_waterfall"].fn(spark, sf_dir).collect()
    assert len(rows) > 70
    for r in rows:
        # the identities hold exactly in the decimal layer; collected
        # values pass through the compat decimal->double conversion,
        # so the replay checks them at double-ulp tolerance
        assert abs((r.gross - r.discount_amt) - r.net_of_discount) < 1e-5
        assert abs((r.net_of_discount + r.tax_amt) - r.charged) < 1e-5
        assert r.discount_amt > 0 and r.tax_amt > 0
    # months partition the joined fact table
    n_lines = duck.execute(
        "SELECT COUNT(*) FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey").fetchone()[0]
    assert sum(r.n_lines for r in rows) == n_lines


# --------------------------------------------------------------------------
# events_incidents
# --------------------------------------------------------------------------


def test_incidents_vs_chart(spark, sf_dir):
    # incidents must be exactly the maximal consecutive alarm runs of
    # the registered chart — the composition contract
    chart = SPECS["win_cusum_chart"].fn(spark, sf_dir).collect()
    alarms = defaultdict(list)
    for r in chart:
        if r.alarm:
            alarms[r.event_type].append((r.day, r.s8))
    want = []
    for et, ds in alarms.items():
        ds.sort()
        run = [ds[0]]
        for d, s8 in ds[1:]:
            if d == run[-1][0] + 1:
                run.append((d, s8))
            else:
                want.append((et, run[0][0], run[-1][0], len(run),
                             max(s for _, s in run)))
                run = [(d, s8)]
        want.append((et, run[0][0], run[-1][0], len(run),
                     max(s for _, s in run)))
    rows = SPECS["events_incidents"].fn(spark, sf_dir).collect()
    got = [(r.event_type, r.start_day, r.end_day, r.n_days, r.peak_s8)
           for r in rows]
    assert sorted(got) == sorted(want)


# --------------------------------------------------------------------------
# orders_supplier_scorecard
# --------------------------------------------------------------------------


def test_supplier_scorecard_replay(spark, sf_dir, duck):
    from datetime import timedelta
    stats = defaultdict(lambda: [0, set(), set(), 0])
    for sk, pk, ck, ship, od in duck.execute(
        "SELECT l.l_suppkey, l.l_partkey, o.o_custkey, l.l_shipdate, "
        "o.o_orderdate FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey"
    ).fetchall():
        s = stats[sk]
        s[0] += 1
        s[1].add(pk)
        s[2].add(ck)
        s[3] += ship > od + timedelta(days=30)
    names = dict(duck.execute(
        "SELECT s_suppkey, s_name FROM supplier").fetchall())
    rows = SPECS["orders_supplier_scorecard"].fn(spark, sf_dir).collect()
    got = {r.l_suppkey: (r.s_name, r.n_lines, r.n_parts, r.n_customers,
                         r.late_bp, r.revenue_rank) for r in rows}
    assert set(got) == set(stats)
    for sk, s in stats.items():
        assert got[sk][:5] == (names[sk], s[0], len(s[1]), len(s[2]),
                               s[3] * 10000 // s[0])
    # dense revenue rank: permutation-free sanity via rank set
    ranks = sorted(v[5] for v in got.values())
    assert ranks[0] == 1 and ranks[-1] <= len(got)


# --------------------------------------------------------------------------
# tokenize_truncation_audit
# --------------------------------------------------------------------------


def test_truncation_audit_replay(spark, sf_dir, duck):
    toks = [len(t.split(" ")) for (t,) in duck.execute(
        "SELECT text FROM documents").fetchall()]
    n_docs, n_tok = len(toks), sum(toks)
    rows = SPECS["tokenize_truncation_audit"].fn(spark, sf_dir).collect()
    got = {r.max_len: (r.n_truncated_docs, r.n_lost_tokens,
                       r.doc_trunc_bp, r.token_loss_bp) for r in rows}
    assert set(got) == {16, 64, 256, 1024}
    for ml in got:
        td = sum(1 for t in toks if t > ml)
        lost = sum(max(t - ml, 0) for t in toks)
        assert got[ml] == (td, lost, td * 10000 // n_docs,
                           lost * 10000 // n_tok)
    # longer context can only lose less
    ladder = sorted(got)
    for a, b in zip(ladder, ladder[1:]):
        assert got[a][1] >= got[b][1]


# --------------------------------------------------------------------------
# text_rake_keyphrases
# --------------------------------------------------------------------------


def test_rake_replay(spark, sf_dir, duck):
    STOP = {"the", "a"}
    phrases = []
    for (text,) in duck.execute("SELECT text FROM documents").fetchall():
        run = []
        for w in text.lower().split(" "):
            if w in STOP:
                if run and len(run) <= 4:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run and len(run) <= 4:
            phrases.append(tuple(run))
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    ws = {w: deg[w] * 1000 // freq[w] for w in freq}
    from collections import Counter
    occ = Counter(phrases)
    score = {}
    for p, n in occ.items():
        score[" ".join(p)] = (sum(ws[w] for w in p) * n // n, n)
    want = sorted(
        ((ph, s, n) for ph, (s, n) in score.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    rows = SPECS["text_rake_keyphrases"].fn(spark, sf_dir).collect()
    got = [(r.phrase, r.score_x1000, r.n_occurrences) for r in rows]
    assert got == want
    # multiword phrases must be able to outrank single words
    assert any(" " in ph for ph, _, _ in got)


# --------------------------------------------------------------------------
# ts_densify
# --------------------------------------------------------------------------


def test_densify_replay(spark, sf_dir, duck):
    series = defaultdict(dict)
    for et, day, n in duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000, COUNT(*) "
        "FROM events GROUP BY 1, 2"
    ).fetchall():
        series[et][day] = n
    want = {}
    for et, by_day in series.items():
        for d in range(min(by_day), max(by_day) + 1):
            want[(et, d)] = (by_day.get(d, 0), int(d not in by_day))
    rows = SPECS["ts_densify"].fn(spark, sf_dir).collect()
    got = {(r.event_type, r.day): (r.x, r.is_imputed) for r in rows}
    assert got == want
    # the dense grid has no positional gaps per series
    for et in series:
        days = sorted(d for e, d in got if e == et)
        assert days == list(range(days[0], days[-1] + 1))


# --------------------------------------------------------------------------
# stream_ohlc (batch form vs win_ohlc_bars semantics)
# --------------------------------------------------------------------------


def test_stream_ohlc_vs_daily_bars(spark, sf_dir):
    # 5-minute bars must roll up to the daily bars win_ohlc_bars emits
    # (open of first 5m bar = daily open, max of highs = daily high...)
    bars5 = SPECS["stream_ohlc"].fn(spark, sf_dir).collect()
    daily = {(r.event_type, r.day): r for r in
             SPECS["win_ohlc_bars"].fn(spark, sf_dir).collect()}
    rolls = defaultdict(list)
    for b in bars5:
        rolls[(b.event_type, b.wstart_us // DAY_US)].append(b)
    assert set(rolls) == set(daily)
    for key, bs in rolls.items():
        bs.sort(key=lambda b: b.wstart_us)
        d = daily[key]
        assert bs[0].open_cents == d.open_cents
        assert bs[-1].close_cents == d.close_cents
        assert max(b.high_cents for b in bs) == d.high_cents
        assert min(b.low_cents for b in bs) == d.low_cents
        assert sum(b.volume_cents for b in bs) == d.volume_cents
        assert sum(b.n for b in bs) == d.n_events


# --------------------------------------------------------------------------
# text_lang_confusion
# --------------------------------------------------------------------------


def test_lang_confusion_vs_langid(spark, sf_dir):
    pred = SPECS["text_langid"].fn(spark, sf_dir).collect()
    from collections import Counter
    cm = Counter((r.true_lang, r.pred_lang) for r in pred)
    rt = Counter(t for t, _ in cm.elements())
    ct = Counter(p for _, p in cm.elements())
    rows = SPECS["text_lang_confusion"].fn(spark, sf_dir).collect()
    got = {(r.true_lang, r.pred_lang): (r.n, r.recall_bp, r.precision_bp)
           for r in rows}
    assert set(got) == set(cm)
    for (t, p), n in cm.items():
        assert got[(t, p)] == (n, n * 10000 // rt[t], n * 10000 // ct[p])
    # matrix total equals the corpus, and the diagonal dominates (the
    # classifier is self-trained — it had better beat chance)
    assert sum(n for n, _, _ in got.values()) == len(pred)
    diag = sum(n for (t, p), (n, _, _) in got.items() if t == p)
    assert diag * 5 > len(pred)


# --------------------------------------------------------------------------
# agg_weighted_percentile
# --------------------------------------------------------------------------


def test_weighted_percentile_replay(spark, sf_dir, duck):
    groups = defaultdict(list)
    for f, cents, w in duck.execute(
        "SELECT l_returnflag, CAST(ROUND(l_extendedprice * 100, 0) AS "
        "BIGINT), CAST(ROUND(l_quantity) AS BIGINT) FROM lineitem"
    ).fetchall():
        groups[f].append((cents, w))
    rows = SPECS["agg_weighted_percentile"].fn(spark, sf_dir).collect()
    got = {r.l_returnflag: (r.total_weight, r.wp50_cents, r.wp90_cents,
                            r.wp99_cents) for r in rows}
    for f, xs in groups.items():
        xs.sort()
        totw = sum(w for _, w in xs)
        def wp(p):
            cum = 0
            for cents, w in xs:
                cum += w
                if 100 * cum >= p * totw:
                    return cents
        assert got[f] == (totw, wp(50), wp(90), wp(99))
        # weighted median differs from the line count median check:
        # both are valid; weighted <= p99 ordering always holds
        assert got[f][1] <= got[f][2] <= got[f][3]


# --------------------------------------------------------------------------
# events_decay_attribution
# --------------------------------------------------------------------------


def test_decay_attribution_replay(spark, sf_dir, duck):
    from collections import Counter
    p = defaultdict(list)
    c = defaultdict(list)
    for u, d, et in duck.execute(
        "SELECT user_id, epoch_us(ts) // 86400000000, event_type "
        "FROM events WHERE event_type IN ('purchase', 'click')"
    ).fetchall():
        (p if et == "purchase" else c)[u].append(d)
    hist = Counter()
    for u, pds in p.items():
        for pd_ in pds:
            for cd in c.get(u, []):
                k = pd_ - cd
                if 0 <= k <= 7:
                    hist[k] += 1
    credit = {k: n * (1_000_000 // 2**k) for k, n in hist.items()}
    t = sum(credit.values())
    rows = SPECS["events_decay_attribution"].fn(spark, sf_dir).collect()
    got = {r.k: (r.n_pairs, r.credit_ppm, r.credit_share_bp) for r in rows}
    want = {k: (hist[k], credit[k], credit[k] * 10000 // t) for k in hist}
    assert got == want
    # decay must concentrate credit at small ages relative to pairs
    assert got[0][2] > got[max(got)][2]


# --------------------------------------------------------------------------
# multimodal_image_stats
# --------------------------------------------------------------------------


def test_image_stats_replay(spark, sf_dir, duck):
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        data = text.encode("utf-8") or b"\x00"
        row_px = 48
        n_rows = max(1, len(data) // row_px)
        need = n_rows * row_px
        px = (data * (need // len(data) + 1))[:need]
        luma = [px[r * row_px + c * 3] + px[r * row_px + c * 3 + 1]
                + px[r * row_px + c * 3 + 2]
                for r in range(n_rows) for c in range(16)]
        want[doc_id] = (16 * n_rows, 16, n_rows, min(luma), max(luma),
                        sum(luma), max(luma) - min(luma))
    rows = SPECS["multimodal_image_stats"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_pixels, r.width, r.height, r.min_luma3,
                      r.max_luma3, r.sum_luma3, r.contrast3) for r in rows}
    assert got == want
    # luma bounds live in the valid 3-channel range
    assert all(0 <= v[3] <= v[4] <= 765 for v in got.values())


# --------------------------------------------------------------------------
# scan_mor_deletes
# --------------------------------------------------------------------------


def test_mor_deletes_replay(spark, sf_dir, duck):
    import hashlib
    want = defaultdict(lambda: [0, 0.0])
    n_deleted = 0
    for ok, st, tp in duck.execute(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"
    ).fetchall():
        if int(hashlib.md5(str(ok).encode()).hexdigest()[:8], 16) % 10 == 3:
            n_deleted += 1
            continue
        want[st][0] += 1
        want[st][1] += tp
    rows = SPECS["scan_mor_deletes"].fn(spark, sf_dir).collect()
    got = {r.o_orderstatus: (r.n_live, r.sum_price) for r in rows}
    assert set(got) == set(want)
    for st, (n, sp) in want.items():
        assert got[st][0] == n
        assert abs(got[st][1] - sp) < 1e-3
    # the delete file genuinely removed ~10% of rows
    n_orders = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    assert 0 < n_deleted < n_orders // 5
    assert sum(n for n, _ in got.values()) == n_orders - n_deleted


# --------------------------------------------------------------------------
# events_slo_burn
# --------------------------------------------------------------------------


def test_slo_burn_replay(spark, sf_dir, duck):
    daily = {}
    for day, nt, ne in duck.execute(
        "SELECT epoch_us(ts) // 86400000000, COUNT(*), "
        "SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        "FROM events GROUP BY 1"
    ).fetchall():
        daily[day] = (nt, ne)
    days = sorted(daily)
    rows = SPECS["events_slo_burn"].fn(spark, sf_dir).collect()
    got = {r.day: (r.n_total, r.n_errors, r.err_bp, r.burn_x100,
                   r.budget_used_x100, r.page) for r in rows}
    for i, d in enumerate(days):
        nt, ne = daily[d]
        wnd = days[max(0, i - 6):i + 1]
        tw = sum(daily[x][0] for x in wnd)
        ew = sum(daily[x][1] for x in wnd)
        tc = sum(daily[x][0] for x in days[:i + 1])
        ec = sum(daily[x][1] for x in days[:i + 1])
        assert got[d] == (
            nt, ne, ne * 10000 // nt,
            1_000_000 * ew // (100 * tw),
            1_000_000 * ec // (100 * tc),
            int(1_000_000 * ew > 200 * tw),
        )
    # this synthetic stream errors well above a 1% SLO — it must page
    assert any(v[5] for v in got.values())


# --------------------------------------------------------------------------
# dedup_agreement
# --------------------------------------------------------------------------


def test_dedup_agreement_vs_detectors(spark, sf_dir):
    lex = {(r.doc_a, r.doc_b)
           for r in SPECS["dedup_minhash"].fn(spark, sf_dir).collect()}
    sem = {(r.vec_a, r.vec_b)
           for r in SPECS["dedup_embed_cosine"].fn(spark, sf_dir).collect()}
    r = SPECS["dedup_agreement"].fn(spark, sf_dir).collect()[0]
    both = len(lex & sem)
    union = len(lex | sem)
    assert (r.n_both, r.n_lexical_only, r.n_semantic_only) == (
        both, len(lex - sem), len(sem - lex))
    assert r.jaccard_bp == both * 10000 // union
    # the detectors are genuinely different lenses on this corpus
    assert r.n_lexical_only > 0 or r.n_semantic_only > 0


# --------------------------------------------------------------------------
# orders_aging_wip
# --------------------------------------------------------------------------


def test_aging_wip_replay(spark, sf_dir, duck):
    from datetime import date
    SNAP = date(1998, 6, 1)
    ships = dict(duck.execute(
        "SELECT l_orderkey, MAX(l_shipdate)::DATE FROM lineitem GROUP BY 1"
    ).fetchall())
    cells = defaultdict(lambda: [0, 0.0, 0])
    for ok, prio, tp, od in duck.execute(
        "SELECT o_orderkey, o_orderpriority, o_totalprice, "
        "o_orderdate::DATE FROM orders"
    ).fetchall():
        if od > SNAP:
            continue
        ship = ships.get(ok)
        close = max(ship, od) if ship is not None else None
        if close is not None and close <= SNAP:
            continue
        age = (SNAP - od).days
        b = ("0-7" if age <= 7 else "8-30" if age <= 30
             else "31-90" if age <= 90 else "91+")
        c = cells[(prio, b)]
        c[0] += 1
        c[1] += tp
        c[2] = max(c[2], age)
    rows = SPECS["orders_aging_wip"].fn(spark, sf_dir).collect()
    got = {(r.o_orderpriority, r.age_bucket):
           (r.n_orders, r.open_value, r.oldest_age_days) for r in rows}
    assert set(got) == set(cells)
    for k, (n, v, a) in cells.items():
        assert got[k][0] == n and got[k][2] == a
        assert abs(got[k][1] - v) < 1e-3
    # line-less never-closers pile up in the oldest band
    assert any(b == "91+" for _, b in got)


# --------------------------------------------------------------------------
# embed_separability
# --------------------------------------------------------------------------


def test_separability_replay(spark, sf_dir, duck):
    by_label = defaultdict(list)
    for label, v in duck.execute(
        "SELECT label, embedding::DOUBLE[] FROM embeddings"
    ).fetchall():
        by_label[label].append([round(x * 1_000_000) for x in v])
    rows = SPECS["embed_separability"].fn(spark, sf_dir).collect()
    got = {r.label: (r.n_vecs, r.msd_within_q2, r.centroid_norm2_q2)
           for r in rows}
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        n = len(vecs)
        pp = sum(sum(x * x for x in v) for v in vecs)
        s2 = sum(
            sum(v[d] for v in vecs) ** 2 for d in range(len(vecs[0]))
        )
        assert got[label] == (n, (n * pp - s2) // (n * n),
                              s2 // (n * n))
        # scatter identity sanity: within msd is non-negative
        assert got[label][1] >= 0


# --------------------------------------------------------------------------
# multimodal_scene_changes
# --------------------------------------------------------------------------


def test_scene_changes_replay(spark, sf_dir, duck):
    FL, FS = 128, 256
    docs = duck.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2"
    ).fetchall()
    want = {}
    for doc_id, text in docs:
        data = text.encode("utf-8")
        frames = []
        for off in range(0, max(len(data), 1), FS):
            fr = data[off:off + FL]
            frames.append(fr + b"\x00" * (FL - len(fr)))
        deltas = [sum(abs(a - b) for a, b in zip(frames[i], frames[i + 1]))
                  for i in range(len(frames) - 1)]
        nd, tot = len(deltas), sum(deltas)
        cuts = sum(1 for d in deltas if d * nd > tot)
        want[doc_id] = (len(frames), nd, cuts,
                        max(deltas) if deltas else 0, tot)
    rows = SPECS["multimodal_scene_changes"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_frames, r.n_deltas, r.n_cuts, r.max_delta,
                      r.sum_delta) for r in rows}
    assert got == want


# --------------------------------------------------------------------------
# fn_fiscal_calendar
# --------------------------------------------------------------------------


def test_fiscal_calendar_replay(spark, sf_dir, duck):
    ANCHOR = 9_132
    cells = defaultdict(lambda: [0, 0.0])
    for day, tp in duck.execute(
        "SELECT epoch_us(o_orderdate) // 86400000000, o_totalprice "
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-02'"
    ).fetchall():
        wk = (day - ANCHOR) // 7
        fy = 1995 + wk // 52
        wy = min(wk % 52, 51)
        period = (wy // 13) * 3 + (1 if wy % 13 < 4
                                   else 2 if wy % 13 < 8 else 3)
        cells[(fy, period)][0] += 1
        cells[(fy, period)][1] += tp
    rows = SPECS["fn_fiscal_calendar"].fn(spark, sf_dir).collect()
    got = {(r.fiscal_year, r.fiscal_period): (r.n_orders, r.revenue)
           for r in rows}
    assert set(got) == set(cells)
    for k, (n, v) in cells.items():
        assert got[k][0] == n
        assert abs(got[k][1] - v) < 1e-3
    # exactly 12 periods per full fiscal year, 1-indexed
    periods = {p for _, p in got}
    assert periods <= set(range(1, 13))


# --------------------------------------------------------------------------
# orders_pvm_variance
# --------------------------------------------------------------------------


def test_pvm_reconciles_exactly(spark, sf_dir, duck):
    rows = SPECS["orders_pvm_variance"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        # the floor convention makes the bridge EXACT, not approximate
        assert (r.price_effect + r.volume_effect + r.new_effect
                + r.exit_effect) == r.rev1_cents - r.rev0_cents
    # brand totals reconcile to the corpus-level year revenues
    want = dict(duck.execute(
        "SELECT year(l_shipdate), SUM(CAST(ROUND(l_extendedprice * 100, "
        "0) AS BIGINT)) FROM lineitem WHERE year(l_shipdate) IN "
        "(1996, 1997) GROUP BY 1").fetchall())
    assert sum(r.rev0_cents for r in rows) == want[1996]
    assert sum(r.rev1_cents for r in rows) == want[1997]
    # the decomposition is non-degenerate on this data
    assert any(r.price_effect != 0 for r in rows)
    assert any(r.new_effect != 0 or r.exit_effect != 0 for r in rows)


# --------------------------------------------------------------------------
# set_except_all
# --------------------------------------------------------------------------


def test_except_all_replay(spark, sf_dir, duck):
    from collections import Counter
    left = Counter(k for (k,) in duck.execute(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    ).fetchall())
    right = Counter(k for (k,) in duck.execute(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"
    ).fetchall())
    want = Counter()
    for k, n in left.items():
        m = n - right.get(k, 0)
        if m > 0:
            want[k] = m
    rows = SPECS["set_except_all"].fn(spark, sf_dir).collect()
    got = Counter(r.o_custkey for r in rows)
    assert got == want
    # bag semantics genuinely differ from the distinct EXCEPT here
    distinct_count = len({k for k in want})
    assert sum(want.values()) > distinct_count


# --------------------------------------------------------------------------
# sample_smote_midpoints
# --------------------------------------------------------------------------


def test_smote_midpoints_replay(spark, sf_dir, duck):
    qv = {
        vid: [round(x * 1_000_000) for x in v]
        for vid, v in duck.execute(
            "SELECT vec_id, embedding::DOUBLE[] FROM embeddings"
        ).fetchall()
    }
    labels = dict(duck.execute(
        "SELECT vec_id, label FROM embeddings").fetchall())
    pairs = [(r.vec_a, r.vec_b) for r in
             SPECS["dedup_embed_cosine"].fn(spark, sf_dir).collect()]
    want = {}
    for a, b in pairs:
        if labels[a] != labels[b]:
            continue
        m2 = [x + y for x, y in zip(qv[a], qv[b])]
        want[(a, b)] = (labels[a], sum(m2), sum(x * x for x in m2),
                        min(m2), max(m2))
    rows = SPECS["sample_smote_midpoints"].fn(spark, sf_dir).collect()
    got = {(r.vec_a, r.vec_b): (r.label, r.sum_q2, r.norm2_q2,
                                r.min_q2, r.max_q2) for r in rows}
    assert got == want
    # same-label restriction genuinely filters the pair stream
    assert len(got) < len(pairs)


# --------------------------------------------------------------------------
# events_bot_flags
# --------------------------------------------------------------------------


def test_bot_flags_replay(spark, sf_dir, duck):
    per = defaultdict(list)
    for u, ts in duck.execute(
        "SELECT user_id, epoch_us(ts) FROM events ORDER BY user_id, ts"
    ).fetchall():
        per[u].append(ts)
    rows = SPECS["events_bot_flags"].fn(spark, sf_dir).collect()
    got = {r.user_id: r for r in rows}
    assert set(got) == set(per)
    for u, tss in per.items():
        gaps = sorted(b - a for a, b in zip(tss, tss[1:]))
        n = len(gaps)
        med2 = gaps[(n - 1) // 2] + gaps[n // 2]
        hours = {(t // 3_600_000_000) % 24 for t in tss}
        night = sum(1 for t in tss if (t // 3_600_000_000) % 24 < 6)
        night_bp = night * 10000 // len(tss)
        r = got[u]
        assert (r.n_events, r.active_hours, r.night_bp, r.med2_gap) == (
            len(tss), len(hours), night_bp, med2)
        cw = int(len(tss) >= 50 and med2 < 120_000_000)
        ao = int(len(hours) >= 20)
        no = int(night_bp > 4000)
        assert (r.clockwork, r.always_on, r.nocturnal, r.is_bot) == (
            cw, ao, no, int(bool(cw or ao or no)))


# --------------------------------------------------------------------------
# events_srm_check
# --------------------------------------------------------------------------


def test_srm_check_replay(spark, sf_dir, duck):
    daily = defaultdict(lambda: [0, 0])
    for day, u in duck.execute(
        "SELECT epoch_us(ts) // 86400000000, user_id FROM events"
    ).fetchall():
        daily[day][u % 2] += 1
    rows = SPECS["events_srm_check"].fn(spark, sf_dir).collect()
    got = {r.day: (r.na, r.nb, r.chi2_x10000, r.srm_flag) for r in rows}
    assert set(got) == set(daily)
    for d, (na, nb) in daily.items():
        chi2 = (na - nb) ** 2 * 10000 // (na + nb)
        flag = int(10000 * (na - nb) ** 2 > 38_415 * (na + nb))
        assert got[d] == (na, nb, chi2, flag)
    # the statistic itself is the ground truth here (the exact replay
    # above); at tiny SFs the parity deviation can legitimately flag
    assert all(v[3] in (0, 1) for v in got.values())


# --------------------------------------------------------------------------
# win_mtd_ytd
# --------------------------------------------------------------------------


def test_mtd_ytd_replay(spark, sf_dir, duck):
    daily = {}
    for day, cents in duck.execute(
        "SELECT o_orderdate::DATE, SUM(CAST(ROUND(o_totalprice * 100, 0)"
        " AS BIGINT)) FROM orders GROUP BY 1 ORDER BY 1"
    ).fetchall():
        daily[day] = cents
    rows = SPECS["win_mtd_ytd"].fn(spark, sf_dir).collect()
    got = {r.day: (r.day_cents, r.mtd_cents, r.ytd_cents,
                   r.day_of_period) for r in rows}
    mtd, ytd, dop = {}, {}, {}
    for day in sorted(daily):
        mk, yk = (day.year, day.month), day.year
        mtd[mk] = mtd.get(mk, 0) + daily[day]
        ytd[yk] = ytd.get(yk, 0) + daily[day]
        dop[mk] = dop.get(mk, 0) + 1
        key = day.strftime("%Y-%m-%d")
        assert got[key] == (daily[day], mtd[mk], ytd[yk], dop[mk])
    assert len(got) == len(daily)


# --------------------------------------------------------------------------
# text_code_detection
# --------------------------------------------------------------------------


def test_code_detection_replay(spark, sf_dir, duck):
    import re as _re
    rows = SPECS["text_code_detection"].fn(spark, sf_dir).collect()
    got = {r.doc_id: (r.n_chars, r.symbol_bp, r.digit_bp, r.alpha_bp,
                      r.is_code) for r in rows}
    for doc_id, text in duck.execute(
        "SELECT doc_id, text FROM documents WHERE len(text) > 0"
    ).fetchall():
        n = len(text)
        sym = len(_re.findall(r"[{}()\[\];=<>]", text))
        dig = len(_re.findall(r"[0-9]", text))
        alp = len(_re.findall(r"[a-zA-Z]", text))
        want = (n, sym * 10000 // n, dig * 10000 // n, alp * 10000 // n,
                int(sym * 10000 // n > 800 and alp * 10000 // n < 6000))
        assert got[doc_id] == want, doc_id
    # synthetic prose corpus: flags are rare but densities are real
    assert all(v[3] > 0 for v in got.values())


# --------------------------------------------------------------------------
# sim_nprobe_sweep
# --------------------------------------------------------------------------


def test_nprobe_sweep_properties(spark, sf_dir):
    rows = SPECS["sim_nprobe_sweep"].fn(spark, sf_dir).collect()
    got = {r.nprobe: (r.n_candidates, r.n_hits, r.n_exact, r.recall_bp)
           for r in rows}
    assert set(got) == {1, 2, 3, 4}
    n_exact = {v[2] for v in got.values()}
    assert len(n_exact) == 1
    # deeper probes can only add candidates and hits, never lose them
    for a, b in zip(sorted(got), sorted(got)[1:]):
        assert got[a][0] <= got[b][0]
        assert got[a][1] <= got[b][1]
    # recall_bp consistent with hits/exact
    for p, (nc, nh, ne, rbp) in got.items():
        assert rbp == nh * 10000 // ne
        assert nh <= ne
    # the sweep's shipped-config row (nprobe=2) must agree with the
    # independently certified recall evaluator's total hits
    eval_rows = SPECS["ann_recall_eval"].fn(spark, sf_dir).collect()
    assert got[2][1] == sum(r.n_hits for r in eval_rows)


# --------------------------------------------------------------------------
# orders_xyz_class
# --------------------------------------------------------------------------


def test_xyz_class_replay(spark, sf_dir, duck):
    monthly = defaultdict(dict)
    mo_all = set()
    for pk, mo, q in duck.execute(
        "SELECT l_partkey, year(l_shipdate) * 12 + month(l_shipdate) - 1,"
        " SUM(CAST(ROUND(l_quantity) AS BIGINT)) FROM lineitem"
        " GROUP BY 1, 2"
    ).fetchall():
        monthly[pk][mo] = q
        mo_all.add(mo)
    n_months = max(mo_all) - min(mo_all) + 1
    rows = SPECS["orders_xyz_class"].fn(spark, sf_dir).collect()
    got = {r.l_partkey: (r.n_months, r.n_active, r.total_qty, r.cv2_bp,
                         r.xyz_class) for r in rows}
    assert set(got) == set(monthly)
    for pk, by_mo in monthly.items():
        sq = sum(by_mo.values())
        sqq = sum(q * q for q in by_mo.values())
        num = n_months * sqq - sq * sq
        cv2 = num * 10000 // (sq * sq)
        cls = ("X" if num * 10000 < 2500 * sq * sq
               else "Y" if num * 10000 < 10000 * sq * sq else "Z")
        assert got[pk] == (n_months, len(by_mo), sq, cv2, cls)
    # sparse synthetic demand is dominated by erratic parts; the class
    # labels themselves are pinned by the exact replay above
    assert {v[4] for v in got.values()} <= {"X", "Y", "Z"}


# --------------------------------------------------------------------------
# sample_class_weights
# --------------------------------------------------------------------------


def test_class_weights_replay(spark, sf_dir, duck):
    counts = dict(duck.execute(
        "SELECT event_type, COUNT(*) FROM events GROUP BY 1").fetchall())
    total, k = sum(counts.values()), len(counts)
    rows = SPECS["sample_class_weights"].fn(spark, sf_dir).collect()
    got = {r.event_type: (r.n, r.weight_bp, r.weighted_mass) for r in rows}
    assert set(got) == set(counts)
    for et, n in counts.items():
        w = total * 10000 // (k * n)
        assert got[et] == (n, w, n * w)
    # balanced masses: every class within one floor step of total/k*1e4
    masses = [v[2] for v in got.values()]
    assert max(masses) - min(masses) <= max(counts.values())


# --------------------------------------------------------------------------
# events_growth_accounting
# --------------------------------------------------------------------------


def test_growth_accounting_replay(spark, sf_dir, duck):
    months = defaultdict(set)
    for u, mo in duck.execute(
        "SELECT DISTINCT user_id, year(ts) * 12 + month(ts) - 1 "
        "FROM events"
    ).fetchall():
        months[u].add(mo)
    by_mo = defaultdict(lambda: [0, 0, 0, 0, 0])  # mau new ret res ch
    for u, mos in months.items():
        s = sorted(mos)
        for i, mo in enumerate(s):
            c = by_mo[mo]
            c[0] += 1
            if i == 0:
                c[1] += 1
            elif s[i - 1] == mo - 1:
                c[2] += 1
            else:
                c[3] += 1
        for i, mo in enumerate(s):
            nxt = s[i + 1] if i + 1 < len(s) else None
            if nxt is None or nxt > mo + 1:
                by_mo[mo + 1][4] += 1
    rows = SPECS["events_growth_accounting"].fn(spark, sf_dir).collect()
    got = {r.mo: (r.mau, r.n_new, r.n_retained, r.n_resurrected,
                  r.n_churned) for r in rows}
    for mo, (mau, nn, nr, ns, nc) in got.items():
        w = by_mo[mo]
        assert (mau, nn, nr, ns, nc) == tuple(w)
        # the growth-accounting identity, exactly
        assert mau == nn + nr + ns


# --------------------------------------------------------------------------
# sample_hard_negatives
# --------------------------------------------------------------------------


def test_hard_negatives_vs_smote_complement(spark, sf_dir, duck):
    labels = dict(duck.execute(
        "SELECT vec_id, label FROM embeddings").fetchall())
    pairs = [(r.vec_a, r.vec_b) for r in
             SPECS["dedup_embed_cosine"].fn(spark, sf_dir).collect()]
    hard = SPECS["sample_hard_negatives"].fn(spark, sf_dir).collect()
    got = {(r.vec_a, r.vec_b): (r.label_a, r.label_b, r.hardness_rank)
           for r in hard}
    cos = {(r.vec_a, r.vec_b): r.cos_sim for r in
           SPECS["dedup_embed_cosine"].fn(spark, sf_dir).collect()}
    want_all = [(a, b) for a, b in pairs if labels[a] != labels[b]]
    # capped at the top _HARD_NEG_CAP hardest by (cos desc, pair)
    want = set(sorted(
        want_all, key=lambda p: (-cos[p], p[0], p[1])
    )[:_HARD_NEG_CAP])
    assert set(got) == want
    for (a, b), (la, lb, _) in got.items():
        assert (la, lb) == (labels[a], labels[b]) and la != lb
    # ranks are a 1..n permutation ordered by cosine desc
    ranks = sorted(r.hardness_rank for r in hard)
    assert ranks == list(range(1, len(hard) + 1))
    by_rank = sorted(hard, key=lambda r: r.hardness_rank)
    for x, y in zip(by_rank, by_rank[1:]):
        assert x.cos_sim >= y.cos_sim
    # together with SMOTE's same-label set, the split is exhaustive
    # (below the cap the mined set is the FULL cross-label complement)
    if len(want_all) <= _HARD_NEG_CAP:
        smote = SPECS["sample_smote_midpoints"].fn(spark, sf_dir).collect()
        assert len(hard) + len(smote) == len(pairs)


# --------------------------------------------------------------------------
# win_yoy_compare
# --------------------------------------------------------------------------


def test_yoy_compare_replay(spark, sf_dir, duck):
    m = dict(duck.execute(
        "SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1, "
        "SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) "
        "FROM orders GROUP BY 1"
    ).fetchall())
    lo, hi = min(m), max(m)
    dense = {mo: m.get(mo, 0) for mo in range(lo, hi + 1)}
    rows = SPECS["win_yoy_compare"].fn(spark, sf_dir).collect()
    got = {r.mo: (r.cents, r.prev_cents, r.yoy_delta_cents,
                  r.yoy_growth_bp) for r in rows}
    assert set(got) == set(range(lo + 12, hi + 1))
    def tdiv(a, b):  # both engines truncate toward zero on negatives
        return a // b if a >= 0 else -((-a) // b)

    for mo in got:
        c, p = dense[mo], dense[mo - 12]
        bp = tdiv((c - p) * 10000, p) if p > 0 else None
        assert got[mo] == (c, p, c - p, bp)


# --------------------------------------------------------------------------
# agg_tukey_fences
# --------------------------------------------------------------------------


def test_tukey_fences_replay(spark, sf_dir, duck):
    groups = defaultdict(list)
    for prio, cents in duck.execute(
        "SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100, 0) AS "
        "BIGINT) FROM orders"
    ).fetchall():
        groups[prio].append(cents)
    rows = SPECS["agg_tukey_fences"].fn(spark, sf_dir).collect()
    got = {r.o_orderpriority: (r.n, r.q1, r.q3, r.iqr, r.n_low_outliers,
                               r.n_high_outliers) for r in rows}
    for prio, xs in groups.items():
        xs.sort()
        n = len(xs)
        q1 = xs[(25 * n + 99) // 100 - 1]
        q3 = xs[(75 * n + 99) // 100 - 1]
        iqr = q3 - q1
        lo = sum(1 for x in xs if 2 * x < 2 * q1 - 3 * iqr)
        hi = sum(1 for x in xs if 2 * x > 2 * q3 + 3 * iqr)
        assert got[prio] == (n, q1, q3, iqr, lo, hi)


# --------------------------------------------------------------------------
# dedup_minhash_estimate
# --------------------------------------------------------------------------


def test_minhash_estimate_vs_exact(spark, sf_dir):
    rows = SPECS["dedup_minhash_estimate"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # err is exactly est - exact, and both are valid bp values
        assert r.err_bp == r.est_bp - r.exact_bp
        assert 0 <= r.est_bp <= 10000 and 0 <= r.exact_bp <= 10000
    # candidate pairs equal the shipped banding's candidate universe:
    # every certified dedup_minhash pair appears with exact >= 5000
    shipped = {(p.doc_a, p.doc_b)
               for p in SPECS["dedup_minhash"].fn(spark, sf_dir).collect()}
    audited = {(r.doc_a, r.doc_b): r.exact_bp for r in rows}
    for pair in shipped:
        assert audited[pair] >= 5000
    # the estimator is genuinely informative: mean |err| under 20%
    errs = [abs(r.err_bp) for r in rows]
    assert sum(errs) / len(errs) < 2000


# --------------------------------------------------------------------------
# text_vocab_overlap
# --------------------------------------------------------------------------


def test_vocab_overlap_replay(spark, sf_dir, duck):
    from collections import Counter
    by_lang = defaultdict(Counter)
    for lang, text in duck.execute(
        "SELECT lang, text FROM documents").fetchall():
        by_lang[lang].update(text.split(" "))
    tops = {
        lang: {w for w, _ in sorted(
            c.items(), key=lambda kv: (-kv[1], kv[0]))[:100]}
        for lang, c in by_lang.items()
    }
    rows = SPECS["text_vocab_overlap"].fn(spark, sf_dir).collect()
    got = {(r.lang_a, r.lang_b): (r.n_shared, r.jaccard_bp) for r in rows}
    langs = sorted(tops)
    want_keys = {(a, b) for i, a in enumerate(langs)
                 for b in langs[i + 1:]}
    assert set(got) == want_keys
    for (a, b), (ns, jbp) in got.items():
        shared = len(tops[a] & tops[b])
        assert (ns, jbp) == (shared, shared * 10000 // (200 - shared))


# --------------------------------------------------------------------------
# orders_returns_rate
# --------------------------------------------------------------------------


def test_returns_rate_replay(spark, sf_dir, duck):
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for brand, yr, rf, cents in duck.execute(
        "SELECT p.p_brand, year(l.l_shipdate), l.l_returnflag, "
        "CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT) "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
    ).fetchall():
        c = cells[(brand, yr)]
        c[0] += 1
        c[2] += cents
        if rf == "R":
            c[1] += 1
            c[3] += cents
    rows = SPECS["orders_returns_rate"].fn(spark, sf_dir).collect()
    got = {(r.p_brand, r.ship_year): (r.n_lines, r.n_returned,
                                      r.return_line_bp, r.return_value_bp)
           for r in rows}
    assert set(got) == set(cells)
    for k, (n, nr, tot, rv) in cells.items():
        assert got[k] == (n, nr, nr * 10000 // n, rv * 10000 // tot)


# --------------------------------------------------------------------------
# sub_not_in_null
# --------------------------------------------------------------------------


def test_not_in_null_replay(spark, sf_dir, duck):
    r = SPECS["sub_not_in_null"].fn(spark, sf_dir).collect()[0]
    present = {k for (k, ln) in duck.execute(
        "SELECT l_partkey, l_linenumber FROM lineitem").fetchall()
        if ln != 7}
    n_parts = duck.execute("SELECT COUNT(*) FROM part").fetchone()[0]
    n_nulls = duck.execute(
        "SELECT COUNT(*) FROM lineitem WHERE l_linenumber = 7"
    ).fetchone()[0]
    parts = {k for (k,) in duck.execute(
        "SELECT p_partkey FROM part").fetchall()}
    # the trap, demonstrated: NOT IN collapses to zero; NOT EXISTS
    # returns the true complement
    assert r.n_null_keys == n_nulls and n_nulls > 0
    assert r.n_not_in == 0
    assert r.n_not_exists == len(parts - present)
    assert r.n_not_exists >= 0 and r.n_not_exists < n_parts


# --------------------------------------------------------------------------
# win_change_runs
# --------------------------------------------------------------------------


def test_change_runs_replay(spark, sf_dir, duck):
    per = defaultdict(list)
    for ck, ok, st, d in duck.execute(
        "SELECT o_custkey, o_orderkey, o_orderstatus, "
        "strftime(o_orderdate, '%Y-%m-%d') FROM orders "
        "ORDER BY o_custkey, o_orderdate, o_orderkey"
    ).fetchall():
        per[ck].append((st, d))
    want = set()
    n_orders = 0
    for ck, seq in per.items():
        run_id, prev = 0, None
        start = end = None
        length = 0
        for st, d in seq:
            n_orders += 1
            if st != prev:
                if prev is not None:
                    want.add((ck, run_id, prev, start, end, length))
                run_id += 1
                prev, start, length = st, d, 0
            end = d
            length += 1
        want.add((ck, run_id, prev, start, end, length))
    rows = SPECS["win_change_runs"].fn(spark, sf_dir).collect()
    got = {(r.o_custkey, r.run_id, r.o_orderstatus, r.run_start,
            r.run_end, r.run_len) for r in rows}
    assert got == want
    # compression is lossless: run lengths sum to the order count
    assert sum(r.run_len for r in rows) == n_orders
    # and real: fewer runs than orders
    assert len(rows) < n_orders


# --------------------------------------------------------------------------
# events_cuped
# --------------------------------------------------------------------------


def test_cuped_replay(spark, sf_dir, duck):
    users = defaultdict(lambda: [0, 0])
    for u, ts_us, cents in duck.execute(
        "SELECT user_id, epoch_us(ts), CAST(ROUND(value * 100, 0) AS "
        "BIGINT) FROM events WHERE event_type = 'purchase'"
    ).fetchall():
        users[u][0 if ts_us // DAY_US < 19_738 else 1] += cents
    xs = [(u % 2, x, y) for u, (x, y) in users.items()]
    n = len(xs)
    sx = sum(x for _, x, _ in xs)
    sy = sum(y for _, _, y in xs)
    sxy = sum(x * y for _, x, y in xs)
    sxx = sum(x * x for _, x, _ in xs)
    theta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    rows = SPECS["events_cuped"].fn(spark, sf_dir).collect()
    got = {r.variant: r for r in rows}
    assert set(got) == {0, 1}
    for v in (0, 1):
        vs = [(x, y) for var, x, y in xs if var == v]
        nv = len(vs)
        svx, svy = sum(x for x, _ in vs), sum(y for _, y in vs)
        r = got[v]
        assert (r.n_users, r.sum_x, r.sum_y) == (nv, svx, svy)
        assert abs(r.theta - theta) < 1e-9
        adj = svy / nv - theta * (svx / nv - sx / n)
        assert abs(r.adj_mean_y - adj) < 1e-6
    # CUPED moves both variants' means by the SAME theta — the lift
    # direction survives adjustment only if pre-period imbalance is
    # what raw lift was measuring; both readings must be present
    assert got[0].mean_y != got[0].adj_mean_y or theta == 0


# --------------------------------------------------------------------------
# events_mann_whitney
# --------------------------------------------------------------------------


def test_mann_whitney_replay(spark, sf_dir, duck):
    vals = duck.execute(
        "SELECT CAST(user_id % 2 AS INT), CAST(ROUND(value * 100, 0) AS "
        "BIGINT) FROM events WHERE event_type = 'purchase'"
    ).fetchall()
    allv = sorted(c for _, c in vals)
    # doubled midrank per value: first rank + last rank (1-based)
    first = {}
    for i, c in enumerate(allv, start=1):
        first.setdefault(c, i)
    from collections import Counter
    cnt = Counter(allv)
    mid2 = {c: 2 * first[c] + cnt[c] - 1 for c in cnt}
    r2a = sum(mid2[c] for v, c in vals if v == 0)
    na = sum(1 for v, _ in vals if v == 0)
    nb = len(vals) - na
    u2 = r2a - na * (na + 1)
    centered = u2 - na * nb
    sig = int(3 * 10000 * centered * centered
              > 38_415 * na * nb * (na + nb + 1))
    r = SPECS["events_mann_whitney"].fn(spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b, r.u2_a, r.u2_centered, r.significant) == (
        na, nb, u2, centered, sig)
    # U is bounded by 2*nA*nB (doubled convention)
    assert 0 <= u2 <= 2 * na * nb
