"""Unit tests for the final round-8 operators: independent pure-Python
replays of the semantics the oracle hash alone can't localize —
skyline dominance by brute force, streak islands, the distributed
Lorenz rank, lerp arithmetic on the gap spine, diversity counting, and
the Poisson inverse-CDF against hashlib."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


# --------------------------------------------------------------------------
# agg_skyline
# --------------------------------------------------------------------------


def test_skyline_matches_bruteforce_dominance(spark, sf_dir, duck):
    pts = duck.execute(
        "SELECT p_partkey, CAST(ROUND(p_retailprice*100) AS BIGINT), "
        "p_size FROM part"
    ).fetchall()
    want = {
        (k, c, s)
        for k, c, s in pts
        if not any(
            qc <= c and qs >= s and (qc < c or qs > s)
            for _, qc, qs in pts
        )
    }
    got = {
        (r.p_partkey, r.price_cents, r.size)
        for r in SPECS["agg_skyline"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # frontier is non-trivial: something survives, something is pruned
    assert want and len(want) < len(pts)


def test_skyline_is_mutually_nondominating(spark, sf_dir):
    rows = [
        (r.price_cents, r.size)
        for r in SPECS["agg_skyline"].fn(spark, sf_dir).collect()
    ]
    for c, s in rows:
        for qc, qs in rows:
            assert not (qc <= c and qs >= s and (qc < c or qs > s))


# --------------------------------------------------------------------------
# win_streak
# --------------------------------------------------------------------------


def test_streak_islands_replay(spark, sf_dir, duck):
    days = defaultdict(set)
    for u, d in duck.execute(
        "SELECT DISTINCT user_id, epoch_us(ts)//86400000000 FROM events"
    ).fetchall():
        days[u].add(d)
    want = {}
    for u, ds in days.items():
        runs, cur = [], []
        for d in sorted(ds):
            if cur and d == cur[-1] + 1:
                cur.append(d)
            else:
                if cur:
                    runs.append(len(cur))
                cur = [d]
        runs.append(len(cur))
        want[u] = (max(runs), len(runs), sum(runs))
    got = {
        r.user_id: (r.max_streak_days, r.n_streaks, r.active_days)
        for r in SPECS["win_streak"].fn(spark, sf_dir).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# win_lorenz
# --------------------------------------------------------------------------


def test_lorenz_deciles_replay_and_shape(spark, sf_dir, duck):
    cust = duck.execute(
        "SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice*100) AS "
        "BIGINT)) AS BIGINT) FROM orders GROUP BY 1"
    ).fetchall()
    ranked = sorted(cust, key=lambda t: (-t[1], t[0]))
    n = len(ranked)
    total = sum(c for _, c in ranked)
    buckets = defaultdict(lambda: [0, 0])
    for i, (_, c) in enumerate(ranked):
        d = i * 10 // n + 1
        buckets[d][0] += 1
        buckets[d][1] += c
    got = {
        r.decile: (r.n_customers, r.revenue_cents, r.share_bp, r.cum_share_bp)
        for r in SPECS["win_lorenz"].fn(spark, sf_dir).collect()
    }
    cum = 0
    for d in sorted(buckets):
        nc, cents = buckets[d]
        cum += cents
        assert got[d] == (
            nc,
            cents,
            cents * 10000 // total,
            cum * 10000 // total,
        )
    # Lorenz invariants: deciles exhaust the customers, shares
    # monotone non-increasing (ranked by revenue), cumulative ends ~1
    assert sum(v[0] for v in got.values()) == n
    shares = [got[d][2] for d in sorted(got)]
    assert shares == sorted(shares, reverse=True)
    assert 9990 <= got[max(got)][3] <= 10000


# --------------------------------------------------------------------------
# ts_interpolate
# --------------------------------------------------------------------------


def test_interpolate_replay(spark, sf_dir, duck):
    obs = defaultdict(dict)
    for t, d, c in duck.execute(
        "SELECT event_type, epoch_us(ts)//3600000000, "
        "SUM(CAST(ROUND(value*100) AS BIGINT)) FROM events GROUP BY 1, 2"
    ).fetchall():
        obs[t][d] = c
    want = {}
    for t, series in obs.items():
        ds = sorted(series)
        for d in range(ds[0], ds[-1] + 1):
            if d in series:
                want[(t, d)] = (1, series[d], series[d] * 1000)
            else:
                pd = max(x for x in ds if x < d)
                nd = min(x for x in ds if x > d)
                pc, nc = series[pd], series[nd]
                interp = (pc * (nd - d) + nc * (d - pd)) * 1000 // (nd - pd)
                want[(t, d)] = (0, 0, interp)
    got = {
        (r.event_type, r.bucket_idx): (r.observed, r.cents, r.interp_millicents)
        for r in SPECS["ts_interpolate"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # the gap branch must actually run on the fixture
    assert any(o == 0 for o, _, _ in want.values())


def test_interpolate_gap_values_bracketed(spark, sf_dir):
    rows = SPECS["ts_interpolate"].fn(spark, sf_dir).collect()
    by_series = defaultdict(dict)
    for r in rows:
        by_series[r.event_type][r.bucket_idx] = r
    for series in by_series.values():
        for d, r in series.items():
            if r.observed:
                continue
            # interpolated point lies between its bracketing observations
            prev = max(
                x for x, q in series.items() if q.observed and x < d
            )
            nxt = min(x for x, q in series.items() if q.observed and x > d)
            lo = min(series[prev].cents, series[nxt].cents) * 1000
            hi = max(series[prev].cents, series[nxt].cents) * 1000
            assert lo - 1000 <= r.interp_millicents <= hi


# --------------------------------------------------------------------------
# text_diversity
# --------------------------------------------------------------------------


def test_diversity_replay(spark, sf_dir, duck):
    counts = defaultdict(Counter)
    for lang, text in duck.execute(
        "SELECT lang, text FROM documents"
    ).fetchall():
        counts[lang].update(text.split(" "))
    got = {
        r.lang: (r.n_types, r.n_tokens, r.ttr_bp, r.simpson_ppm)
        for r in SPECS["text_diversity"].fn(spark, sf_dir).collect()
    }
    for lang, c in counts.items():
        types, tokens = len(c), sum(c.values())
        collision = sum(v * v for v in c.values())
        assert got[lang] == (
            types,
            tokens,
            types * 10000 // tokens,
            collision * 1000000 // (tokens * tokens),
        )
    assert set(got) == set(counts)


# --------------------------------------------------------------------------
# sample_poisson
# --------------------------------------------------------------------------

_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)


def _poisson_draw(key: str) -> int:
    u = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    for k, t in enumerate(_POIS_T):
        if u < t:
            return k
    return 5


def test_poisson_thresholds_are_the_frozen_cdf():
    # the literals ARE floor(CDF_Poisson(1)(k) * 2^32) — recompute
    cum = 0.0
    for k, t in enumerate(_POIS_T):
        cum += math.exp(-1) / math.factorial(k)
        assert t == int(cum * 2**32)


def test_poisson_replay(spark, sf_dir, duck):
    rows = duck.execute(
        "SELECT l_returnflag, l_orderkey, l_linenumber, "
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) FROM lineitem"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for flag, ok, ln, cents in rows:
        k = _poisson_draw(f"{ok}-{ln}")
        a = agg[flag]
        a[0] += 1
        a[1] += k
        a[2] += cents
        a[3] += k * cents
    got = {
        r.l_returnflag: (r.n_rows, r.boot_rows, r.sum_cents, r.boot_cents, r.err_bp)
        for r in SPECS["sample_poisson"].fn(spark, sf_dir).collect()
    }
    for flag, (n, bn, sc, bc) in agg.items():
        assert got[flag] == (n, bn, sc, bc, abs(bc - sc) * 10000 // sc)
    # the bootstrap replicate tracks the actuals: mean-1 Poisson keeps
    # the resampled mass within a few percent of the original
    for n, bn, sc, bc, err in got.values():
        assert abs(bn - n) * 10 <= n or n < 100
        assert err <= 500


# --------------------------------------------------------------------------
# events_overlap_matrix
# --------------------------------------------------------------------------


def test_overlap_matrix_replay(spark, sf_dir, duck):
    cells = set(
        duck.execute(
            "SELECT DISTINCT user_id, epoch_us(ts)//86400000000, "
            "event_type FROM events"
        ).fetchall()
    )
    by_type = defaultdict(set)
    for u, d, t in cells:
        by_type[t].add((u, d))
    got = {
        (r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.jaccard_bp)
        for r in SPECS["events_overlap_matrix"].fn(spark, sf_dir).collect()
    }
    types = sorted(by_type)
    want = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(by_type[a] & by_type[b])
            if both:
                na, nb = len(by_type[a]), len(by_type[b])
                want[(a, b)] = (both, na, nb, both * 10000 // (na + nb - both))
    assert got == want
    # pairs are emitted once, in canonical (a < b) order
    assert all(a < b for a, b in got)


# --------------------------------------------------------------------------
# curate_domain_balance
# --------------------------------------------------------------------------


def test_domain_balance_cap_and_selection_order(spark, sf_dir, duck):
    rows = SPECS["curate_domain_balance"].fn(spark, sf_dir).collect()
    docs = duck.execute("SELECT doc_id, source FROM documents").fetchall()
    by_src = defaultdict(list)
    for did, src in docs:
        by_src[src].append(did)
    kept = defaultdict(dict)
    for r in rows:
        kept[r.source][r.keep_rank] = r.doc_id
        assert r.keep_rank <= 20
        assert r.n_source_docs == len(by_src[r.source])
    for src, dids in by_src.items():
        order = sorted(
            dids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        want = {i + 1: d for i, d in enumerate(order[:20])}
        assert kept[src] == want


# --------------------------------------------------------------------------
# scan_partition_pruned
# --------------------------------------------------------------------------


def test_partition_pruned_scan_layout_and_result(spark, sf_dir, duck):
    import os

    rows = {
        r.source: (r.n_docs, r.sum_chars)
        for r in SPECS["scan_partition_pruned"].fn(spark, sf_dir).collect()
    }
    want = {
        s: (n, c)
        for s, n, c in duck.execute(
            "SELECT source, COUNT(*), SUM(n_chars) FROM documents "
            "WHERE lang = 'en' GROUP BY 1"
        ).fetchall()
    }
    assert rows == want
    # the scratch layout is genuinely Hive-partitioned by lang
    from nchu_bigdata_spark.queries.relational import scratch_dir

    out = scratch_dir(sf_dir, "docs_by_lang")
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {
        lang
        for (lang,) in duck.execute(
            "SELECT DISTINCT lang FROM documents"
        ).fetchall()
    }
    assert dirs == {f"lang={l}" for l in langs}


# --------------------------------------------------------------------------
# events_forecast_snaive
# --------------------------------------------------------------------------


def test_snaive_replay(spark, sf_dir, duck):
    cells = {}
    for t, b, c in duck.execute(
        "SELECT event_type, epoch_us(ts)//3600000000, "
        "SUM(CAST(ROUND(value*100) AS BIGINT)) FROM events GROUP BY 1,2"
    ).fetchall():
        cells[(t, b)] = c
    agg = defaultdict(lambda: [0, 0, 0])
    for (t, b), c in cells.items():
        f = cells.get((t, b - 168))
        if f is None:
            continue
        a = agg[t]
        a[0] += 1
        a[1] += abs(c - f)
        a[2] += c - f
    got = {
        r.event_type: (r.n_scored, r.sum_abs_err_cents, r.bias_cents, r.mae_millicents)
        for r in SPECS["events_forecast_snaive"].fn(spark, sf_dir).collect()
    }
    want = {
        t: (n, sae, bias, sae * 1000 // n) for t, (n, sae, bias) in agg.items()
    }
    assert got == want
    # the one-week lag genuinely scores a meaningful share of slots
    assert all(n > 0 for n, _, _, _ in got.values())


# --------------------------------------------------------------------------
# orders_cohort_ltv
# --------------------------------------------------------------------------


def test_cohort_ltv_replay(spark, sf_dir, duck):
    orders = duck.execute(
        "SELECT o_custkey, year(o_orderdate)*12 + month(o_orderdate), "
        "CAST(ROUND(o_totalprice*100) AS BIGINT) FROM orders"
    ).fetchall()
    m0 = {}
    for ck, m, _ in orders:
        m0[ck] = min(m0.get(ck, m), m)
    cohort_n = Counter(m0.values())
    cells = defaultdict(lambda: [set(), 0])
    for ck, m, cents in orders:
        cell = cells[(m0[ck], m - m0[ck])]
        cell[0].add(ck)
        cell[1] += cents
    got = {
        (r.cohort_month, r.age_months): (
            r.cohort_size,
            r.n_active,
            r.revenue_cents,
            r.cum_revenue_cents,
        )
        for r in SPECS["orders_cohort_ltv"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(cells)
    for coh in {c for c, _ in cells}:
        cum = 0
        for age in sorted(a for c, a in cells if c == coh):
            users, cents = cells[(coh, age)]
            cum += cents
            assert got[(coh, age)] == (cohort_n[coh], len(users), cents, cum)
    # age 0 is always present and fully active (the acquisition month)
    for coh, n in cohort_n.items():
        assert got[(coh, 0)][1] <= n and got[(coh, 0)][1] > 0
