"""Round-11 operator births: brute-force pure-Python replays.

Each test recomputes the operator's DEFINITION from the raw parquet in
plain Python (no Spark expressions, no SQL) and demands exact equality
with the registered implementation — the independent-mechanism check
that guards both engines against a shared misreading of the spec.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from nchu_bigdata_spark.registry import load_all_queries


def _docs(duck):
    return duck.execute(
        "SELECT doc_id, text, lang, n_chars FROM documents ORDER BY doc_id"
    ).fetchall()


# ---------------------------------------------------------------- CDC


def _cdc_chunks(text: str) -> list[str]:
    from nchu_bigdata_spark.operators.dedup import (
        _CDC_COEF,
        _CDC_D,
        _CDC_K,
        _CDC_M,
    )

    n = len(text)
    bounds = []
    if n >= _CDC_K:
        for i in range(_CDC_K, n + 1):  # 1-based end position
            h = (
                sum(
                    ord(text[i - _CDC_K + j]) * _CDC_COEF[j]
                    for j in range(_CDC_K)
                )
                % _CDC_M
            )
            if h % _CDC_D == _CDC_D - 1 and i < n:
                bounds.append(i)
    cuts = [0] + bounds + [n]
    return [text[cuts[c] : cuts[c + 1]] for c in range(len(cuts) - 1)]


def test_dedup_cdc_chunks_replay(spark, sf_dir, duck):
    docs = _docs(duck)
    fp_count: dict[str, int] = {}
    per_doc: dict[int, list[tuple[str, int]]] = {}
    for doc_id, text, _lang, _nc in docs:
        chs = _cdc_chunks(text)
        per_doc[doc_id] = [
            (hashlib.md5(c.encode()).hexdigest(), len(c)) for c in chs
        ]
        for fp, _l in per_doc[doc_id]:
            fp_count[fp] = fp_count.get(fp, 0) + 1
    expect = {}
    for doc_id, chs in per_doc.items():
        dup = [(fp, l) for fp, l in chs if fp_count[fp] >= 2]
        tot = sum(l for _fp, l in chs)
        expect[doc_id] = (
            len(chs),
            len(dup),
            sum(l for _fp, l in dup),
            tot,
            (sum(l for _fp, l in dup) * 10_000 // tot) if tot else 0,
        )
    got = {
        r["doc_id"]: (
            r["n_chunks"], r["n_dup_chunks"], r["dup_bytes"],
            r["total_bytes"], r["dup_bp"],
        )
        for r in load_all_queries()["dedup_cdc_chunks"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # content-defined means boundaries exist at fixture lengths
    assert any(v[0] > 1 for v in expect.values())


def test_cdc_boundaries_shift_invariant():
    """The CDC property itself: prepending bytes to a document must not
    move boundaries far from the insertion point — shared suffixes
    chunk identically (what fixed-size blocking cannot do)."""
    import random
    import string

    rng = random.Random(20260815)
    # varied text: a periodic phrase has ~45 distinct k-grams and may
    # never hit the 1/64 boundary residue; random ASCII fires ~n/64
    base = "".join(
        rng.choice(string.ascii_letters + " .,") for _ in range(3000)
    )
    shifted = "PREFIX-" + base
    a, b = _cdc_chunks(base), _cdc_chunks(shifted)
    # after each side's first boundary the chunkings are identical
    assert a[1:] == b[1 + (len(b) - len(a)) :]
    assert len(a) > 3, "no boundaries fired — constants degenerate"


# ---------------------------------------------------------------- novelty


def test_text_novelty_replay(spark, sf_dir, duck):
    N = 3
    docs = _docs(duck)
    sh_per_doc = {}
    first: dict[str, int] = {}
    for doc_id, text, _lang, _nc in docs:
        tok = text.split(" ")
        shs = (
            {
                " ".join(tok[i : i + N])
                for i in range(len(tok) - N + 1)
            }
            if len(tok) >= N
            else set()
        )
        sh_per_doc[doc_id] = shs
        for s in shs:
            if s not in first or doc_id < first[s]:
                first[s] = doc_id
    expect = {}
    for doc_id, shs in sh_per_doc.items():
        novel = sum(1 for s in shs if first[s] == doc_id)
        expect[doc_id] = (
            len(shs),
            novel,
            (novel * 10_000 // len(shs)) if shs else 0,
        )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_bp"])
        for r in load_all_queries()["text_novelty"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    # doc 0 (lowest id with shingles) must be fully novel
    lowest = min(d for d, s in sh_per_doc.items() if s)
    assert got[lowest][2] == 10_000


# ---------------------------------------------------------------- mutual kNN


def test_sim_mutual_knn_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.operators.similarity import _MKNN_N, _TOPK

    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id <= {_MKNN_N} ORDER BY vec_id"
    ).fetchall()
    V = {r[0]: [float(x) for x in r[1]] for r in rows}
    Nrm = {k: math.sqrt(sum(x * x for x in v)) for k, v in V.items()}

    def cos(a, b):
        return round(
            sum(x * y for x, y in zip(V[a], V[b])) / (Nrm[a] * Nrm[b]), 6
        )

    knn = {}
    for a in V:
        ranked = sorted(
            ((b, cos(a, b)) for b in V if b != a),
            key=lambda t: (-t[1], t[0]),
        )[:_TOPK]
        knn[a] = {b: (r + 1, c) for r, (b, c) in enumerate(ranked)}
    expect = {}
    for a in V:
        for b, (rab, c) in knn[a].items():
            if a < b and a in knn[b]:
                expect[(a, b)] = (c, rab, knn[b][a][0])
    got = {
        (r["vec_a"], r["vec_b"]): (
            float(r["cos_sim"]), r["rank_ab"], r["rank_ba"]
        )
        for r in load_all_queries()["sim_mutual_knn"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(got) == set(expect)
    for k, (c, rab, rba) in expect.items():
        gc, grab, grba = got[k]
        assert (grab, grba) == (rab, rba), k
        assert abs(gc - c) < 1e-6, k
    assert expect, "no mutual pairs — vacuous"
    # mutual pruning bounds degree by k
    deg: dict[int, int] = {}
    for a, b in expect:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert max(deg.values()) <= _TOPK


# ---------------------------------------------------------------- ESS


def test_sample_ess_audit_replay(spark, sf_dir, duck):
    docs = _docs(duck)
    by_lang: dict[str, list[int]] = {}
    for _doc_id, _text, lang, n_chars in docs:
        by_lang.setdefault(lang, []).append(int(n_chars))
    expect = {}
    for lang, ws in by_lang.items():
        sw, sw2, n = sum(ws), sum(w * w for w in ws), len(ws)
        expect[lang] = (
            n, sw, sw * sw * 1000 // sw2, sw * sw * 10_000 // (sw2 * n)
        )
    got = {
        r["lang"]: (r["n_docs"], r["sum_w"], r["ess_milli"], r["ess_ratio_bp"])
        for r in load_all_queries()["sample_ess_audit"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # sanity: ESS can never exceed n, uniform weights would hit n
    for lang, (n, _sw, ess_milli, ratio_bp) in expect.items():
        assert ess_milli <= n * 1000
        assert 0 < ratio_bp <= 10_000


def test_round11_ids_certified_in_r11_window():
    """Round-11 births led the r11 driver window (memory convention:
    'born in round N: certify immediately') and every one earned a
    green CORRECTNESS_r11 row; post-rotation they live in the
    certified tail, so assert the completed lifecycle, not head
    position (which the r11→r12 rotation legitimately changed)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r11.json")
    with open(path, encoding="utf-8") as f:
        rows = json.load(f)
    for name in (
        "ts_kendall_tau",
        "sample_neyman_alloc",
        "events_welch_ttest",
        "agg_median_ci_bootstrap",  # r11 changed plan: re-certify
        "geo_bbox_join",
        "text_source_drift",
        "win_rsi",
        "ts_ljung_box",
        "dedup_cdc_chunks",
        "sample_ess_audit",
        "text_novelty",
        "sim_mutual_knn",
        "embed_pq",
        "ts_mann_kendall",
        "text_template_prefix",
        "geo_cell_join",
        "fn_ip_cidr",
        "agg_chi_square",
        "events_wilson_ctr",
        "win_rolling_corr",
        "text_heaps_law",
        "multimodal_phash",
        "multimodal_phash_pairs",
        "text_compression_ratio",
    ):
        assert name in rows, name
        row = rows[name]
        if name == "text_compression_ratio":
            # rows-only by design (DEFLATE isn't SQL): the strongest
            # driver row it can earn is err='no_oracle' with rows > 0.
            assert row["err"] == "no_oracle" and row["spark_rows"] > 0, row
        else:
            assert row["rows_match"] and row["schema_match"], (name, row)
            assert row["hash_match"] in (True, None) and not row["err"], (name, row)


def test_graph_checkpoint_count_invariant(spark, monkeypatch):
    """VERDICT r10 item 6: the iterative graph kernels' per-round
    localCheckpoint budget must be a CONSTANT of the algorithm (edges
    + labels + one per round), never a function of data scale — a
    checkpoint count that grew with the corpus would mean lineage (and
    driver bookkeeping) growth the 100 TB design forbids. Count
    shared_intermediate calls per run at two corpus sizes and demand
    equality."""
    import nchu_bigdata_spark.operators.graph as G
    from nchu_bigdata_spark.materialize import shared_intermediate as orig
    from nchu_bigdata_spark.materialize import shared_partitioned as orig_p
    from nchu_bigdata_spark.registry import load_all_queries

    calls: list[str] = []

    def counting(tag, df, eager=True):
        calls.append(tag)
        return orig(tag, df, eager)

    def counting_p(tag, df):
        calls.append(tag)
        return orig_p(tag, df)

    monkeypatch.setattr(G, "shared_intermediate", counting)
    monkeypatch.setattr(G, "shared_partitioned", counting_p)
    specs = load_all_queries()
    counts = {}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for name in ("graph_connected_components", "graph_pagerank"):
            calls.clear()
            specs[name].fn(spark, sf).write.format("noop").mode(
                "overwrite"
            ).save()
            counts[(name, sf)] = len(calls)
    for name in ("graph_connected_components", "graph_pagerank"):
        a = counts[(name, "/root/testdata/sf0.001")]
        b = counts[(name, "/root/testdata/sf0.01")]
        assert a == b > 0, (name, a, b)
    # the budget is the committed constant (r14 rework): both kernels
    # freeze ONLY the u-partitioned edge table (shared_partitioned)
    # and unroll their fixed rounds into a single bounded plan — CC's
    # per-round label checkpoints were retired by the self-loop
    # single-consumer recurrence.
    assert counts[("graph_connected_components", "/root/testdata/sf0.001")] \
        == 1
    assert counts[("graph_pagerank", "/root/testdata/sf0.001")] == 1


# ---------------------------------------------------------------- PQ


def test_embed_pq_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.operators.similarity import (
        _PQ_DIM,
        _PQ_K,
        _PQ_SUB,
        _Q,
    )

    rows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    QV = {
        r[0]: [int(round(float(x) * _Q)) for x in r[1]] for r in rows
    }
    cb = {c: QV[c + 1] for c in range(_PQ_K)}
    expect = {}
    for vid, qv in QV.items():
        code_word, err = 0, 0
        for s in range(_PQ_SUB):
            best = min(
                (
                    (
                        sum(
                            (qv[s * _PQ_DIM + d] - cb[c][s * _PQ_DIM + d])
                            ** 2
                            for d in range(_PQ_DIM)
                        ),
                        c,
                    )
                    for c in range(_PQ_K)
                )
            )
            code_word += best[1] * (_PQ_K ** s)
            err += best[0]
        expect[vid] = (code_word, err)
    got = {
        r["vec_id"]: (r["pq_code"], r["err_q"])
        for r in load_all_queries()["embed_pq"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    # codebook members reconstruct their own subspaces exactly
    for c in range(_PQ_K):
        assert expect[c + 1][1] == 0
    # non-degenerate: codes differ across the corpus
    assert len({v[0] for v in expect.values()}) > 1


# ---------------------------------------------------------------- MK


def test_ts_mann_kendall_replay(spark, sf_dir, duck):
    rows = duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000 AS day,"
        " COUNT(*) AS n FROM events GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, dict[int, int]] = {}
    for et, day, n in rows:
        series.setdefault(et, {})[int(day)] = int(n)
    expect = {}
    for et, cell in series.items():
        days = sorted(cell)
        vals = [cell[d] for d in days]
        n = len(vals)
        s = sum(
            (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_counts: dict[int, int] = {}
        for v in vals:
            tie_counts[v] = tie_counts.get(v, 0) + 1
        tie_adj = sum(
            t * (t - 1) * (2 * t + 5) for t in tie_counts.values() if t > 1
        )
        var18 = n * (n - 1) * (2 * n + 5) - tie_adj
        sig = 180_000 * s * s > 38_416 * var18
        expect[et] = (n, s, var18, (1 if s > 0 else -1) if sig else 0)
    got = {
        r["event_type"]: (r["n_days"], r["s_stat"], r["var18"], r["trend"])
        for r in load_all_queries()["ts_mann_kendall"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    assert expect, "no series"


# ---------------------------------------------------------------- LCP


def test_text_template_prefix_replay(spark, sf_dir, duck):
    docs = duck.execute(
        "SELECT source, text FROM documents ORDER BY doc_id"
    ).fetchall()
    by_src: dict[str, list[str]] = {}
    for src, text in docs:
        by_src.setdefault(src, []).append(text)
    expect = {}
    for src, texts in by_src.items():
        lo, hi = min(texts), max(texts)
        lim = min(len(lo), len(hi))
        lcp = lim
        for p in range(lim):
            if lo[p] != hi[p]:
                lcp = p
                break
        # the order-statistic trick must equal the true group LCP
        true_lcp = 0
        while true_lcp < min(len(t) for t in texts) and all(
            t[true_lcp] == texts[0][true_lcp] for t in texts
        ):
            true_lcp += 1
        assert lcp == true_lcp, (src, lcp, true_lcp)
        min_len = min(len(t) for t in texts)
        bp = lcp * 10_000 // min_len
        expect[src] = (len(texts), min_len, lcp, bp, int(bp >= 1500))
    got = {
        r["source"]: (
            r["n_docs"], r["min_len"], r["lcp_len"], r["lcp_bp"],
            r["is_templated"],
        )
        for r in load_all_queries()["text_template_prefix"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect


# ------------------------------------------------- round-11 second wave


def test_geo_cell_join_replay(spark, sf_dir, duck):
    """Brute-force O(C·S) replay of the ε-distance join definition —
    independent of both the grid-cell decomposition AND the oracle's
    theta-join."""
    from nchu_bigdata_spark.queries.geo import _AX, _AY, _OX, _OY, _R2, _SPAN

    custs = duck.execute(
        "SELECT c_custkey FROM customer ORDER BY 1"
    ).fetchall()
    supps = duck.execute(
        "SELECT s_suppkey FROM supplier ORDER BY 1"
    ).fetchall()
    spts = [
        (
            s,
            (s * _AX + _OX) % _SPAN,
            (s * _AY + _OY) % _SPAN,
        )
        for (s,) in supps
    ]
    expect = {}
    for (c,) in custs:
        cx, cy = (c * _AX) % _SPAN, (c * _AY) % _SPAN
        hits = [
            (d2, s)
            for s, sx, sy in spts
            if (d2 := (cx - sx) ** 2 + (cy - sy) ** 2) <= _R2
        ]
        if hits:
            d2, s = min(hits)
            expect[c] = (len(hits), d2, s)
        else:
            expect[c] = (0, None, None)

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        r.c_custkey: (r.n_within, r.min_d2, r.nearest_suppkey)
        for r in REGISTRY["geo_cell_join"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_geo_cell_exactness_invariant():
    """The grid decomposition is exact ONLY while cell edge >= radius
    (|Δcoord| <= R ⇒ |Δcell| <= 1). Pin the invariant so a future
    radius tweak can't silently break completeness."""
    from nchu_bigdata_spark.queries.geo import _R, _R2

    assert _R * _R == _R2  # cell edge == radius, squared bound coherent


def test_fn_ip_cidr_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.scalar_fns import (
        _IP_A,
        _IP_MOD,
        _LPM_ENC,
    )

    eids = [r[0] for r in duck.execute(
        "SELECT event_id FROM events").fetchall()]
    nats = [r[0] for r in duck.execute(
        "SELECT n_nationkey FROM nation").fetchall()]
    sups = [r[0] for r in duck.execute(
        "SELECT s_suppkey FROM supplier").fetchall()]
    n8 = {}
    for n in nats:
        a = (n * 7 + 3) % 256
        n8[a] = min(n8.get(a, n), n)
    n16 = {}
    for s in sups:
        key = ((s * 11 + 5) % 256, (s * 13 + 7) % 256)
        n16[key] = min(n16.get(key, s), s)
    groups = {}
    for e in eids:
        ip0 = (e * _IP_A) % _IP_MOD
        quad = f"{ip0 // 16777216}.{ip0 // 65536 % 256}.{ip0 // 256 % 256}.{ip0 % 256}"
        p = quad.split(".")
        ip = (
            int(p[0]) * 16777216
            + int(p[1]) * 65536
            + int(p[2]) * 256
            + int(p[3])
        )
        assert ip == ip0  # round-trip is part of the definition
        best = None
        a, b = ip // 16777216, (ip // 65536) % 256
        if a in n8:
            best = 8 * _LPM_ENC + n8[a]
        if (a, b) in n16:
            enc16 = 16 * _LPM_ENC + n16[(a, b)]
            best = enc16 if best is None else max(best, enc16)
        key = (best // _LPM_ENC, best % _LPM_ENC) if best else (0, -1)
        g = groups.setdefault(key, [0, set(), ip])
        g[0] += 1
        g[1].add(ip)
        g[2] = min(g[2], ip)

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        (r.prefix_len, r.net_key): (r.n_events, r.n_ips, r.min_ip)
        for r in REGISTRY["fn_ip_cidr"].fn(spark, sf_dir).collect()
    }
    expect = {k: (v[0], len(v[1]), v[2]) for k, v in groups.items()}
    assert got == expect


def test_agg_chi_square_replay(spark, sf_dir, duck):
    rows = duck.execute(
        "SELECT event_type, (epoch_us(ts) // 86400000000) % 7, COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    types = sorted({r[0] for r in rows})
    wds = sorted({r[1] for r in rows})
    o = {(t, w): 0 for t in types for w in wds}
    for t, w, c in rows:
        o[(t, w)] = c
    r_tot = {t: sum(o[(t, w)] for w in wds) for t in types}
    c_tot = {w: sum(o[(t, w)] for t in types) for w in wds}
    n = sum(r_tot.values())
    part = {}
    for t in types:
        acc = 0
        for w in wds:
            num = (o[(t, w)] * n - r_tot[t] * c_tot[w]) ** 2
            den = r_tot[t] * c_tot[w] * n
            acc += (num // den) * 10000 + (
                (num - (num // den) * den) * 10000
            ) // den
        part[t] = acc
    chi2 = sum(part.values())
    m = min(len(types), len(wds)) - 1
    v_e6 = math.isqrt((chi2 * 10**8) // (n * m))
    # math.isqrt(floor-division radicand) equals
    # floor(sqrt(radicand)) for radicand < 2^53 exactly
    df = (len(types) - 1) * (len(wds) - 1)

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        r.event_type: (
            r.n_obs,
            r.chi2_part_e4,
            r.chi2_total_e4,
            r.df,
            r.cramers_v_e6,
        )
        for r in REGISTRY["agg_chi_square"].fn(spark, sf_dir).collect()
    }
    expect = {t: (r_tot[t], part[t], chi2, df, v_e6) for t in types}
    assert got == expect


def test_events_wilson_ctr_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.analytics import (
        _W_Z2_E4,
        _W_Z2_HALF_E4,
        _W_Z4_QTR_E8,
    )

    rows = duck.execute(
        "SELECT user_id % 100, COUNT(*),"
        " SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)"
        " FROM events GROUP BY 1"
    ).fetchall()
    lbs = {}
    for item, n, s in rows:
        rad = (_W_Z2_E4 * 10000 * s * (n - s)) // n + _W_Z4_QTR_E8
        lb = (
            1000000 * (10000 * s + _W_Z2_HALF_E4 - math.isqrt(rad))
        ) // (10000 * n + _W_Z2_E4)
        lbs[item] = (n, s, lb)
    ranked = sorted(lbs.items(), key=lambda kv: (-kv[1][2], kv[0]))
    expect = {}
    for pos, (item, (n, s, lb)) in enumerate(ranked, 1):
        rank = pos
        # RANK(): ties share the first position
        j = pos - 1
        while j > 0 and ranked[j - 1][1][2] == lb:
            rank = j
            j -= 1
        expect[item] = (n, s, lb, rank)

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        r.item: (r.n_trials, r.n_success, r.wilson_lb_e6, r.lb_rank)
        for r in REGISTRY["events_wilson_ctr"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_wilson_lb_orders_small_n_below_large_n():
    """The point of Wilson: 3/3 must rank BELOW 97/100."""
    from nchu_bigdata_spark.queries.analytics import (
        _W_Z2_E4,
        _W_Z2_HALF_E4,
        _W_Z4_QTR_E8,
    )

    def lb(s, n):
        rad = (_W_Z2_E4 * 10000 * s * (n - s)) // n + _W_Z4_QTR_E8
        return (
            1000000 * (10000 * s + _W_Z2_HALF_E4 - math.isqrt(rad))
        ) // (10000 * n + _W_Z2_E4)

    assert lb(3, 3) < lb(97, 100)
    assert lb(0, 5) == 0 or lb(0, 5) > 0  # total-failure bound sane
    assert lb(100, 100) < 1_000_000  # never reaches certainty


def test_win_rolling_corr_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.windows import _RC_EMIT, _RC_N

    rows = duck.execute(
        "SELECT l_suppkey, CAST(ROUND(l_quantity) AS BIGINT),"
        " CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " FROM lineitem"
        " ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"
    ).fetchall()
    by_supp: dict[int, list[tuple[int, int]]] = {}
    for sk, x, y in rows:
        by_supp.setdefault(sk, []).append((x, y))
    expect = {}
    for sk, xs in by_supp.items():
        for idx in range(len(xs)):
            rn = idx + 1
            if rn < _RC_N or rn % _RC_EMIT != 0:
                continue
            fr = xs[idx - _RC_N + 1 : idx + 1]
            sx = sum(x for x, _ in fr)
            sy = sum(y for _, y in fr)
            sxx = sum(x * x for x, _ in fr)
            syy = sum(y * y for _, y in fr)
            sxy = sum(x * y for x, y in fr)
            num = _RC_N * sxy - sx * sy
            dxx = _RC_N * sxx - sx * sx
            dyy = _RC_N * syy - sy * sy
            if dxx == 0 or dyy == 0:
                expect[(sk, rn)] = None
                continue
            import math as _m

            isq = _m.floor(_m.sqrt(float(dxx * dyy)))
            expect[(sk, rn)] = (
                (1000000 * num) // isq
                if num >= 0
                else -((1000000 * (-num)) // isq)
            )

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        (r.l_suppkey, r.rn): r.corr_e6
        for r in REGISTRY["win_rolling_corr"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_text_heaps_law_replay(spark, sf_dir, duck):
    docs = duck.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchall()
    n = len(docs)
    seen: set[str] = set()
    toks_cum = 0
    # per-rank, then fold into deciles
    per_rank = []
    for doc_id, text in docs:
        words = text.split(" ")
        new = [w for w in words if w not in seen]
        seen.update(words)
        per_rank.append((doc_id + 1, len(words), len(set(new))))
    expect = {}
    docs_c = toks_c = vocab_c = 0
    by_dec: dict[int, list] = {}
    for r, ntok, _nnew in per_rank:
        by_dec.setdefault((10 * r + n - 1) // n, []).append((r, ntok))
    # vocabulary: first_rank per term
    first: dict[str, int] = {}
    for doc_id, text in docs:
        r = doc_id + 1
        for w in text.split(" "):
            if w not in first:
                first[w] = r
    vdec: dict[int, int] = {}
    for w, fr in first.items():
        d = (10 * fr + n - 1) // n
        vdec[d] = vdec.get(d, 0) + 1
    for d in sorted(by_dec):
        docs_c += len(by_dec[d])
        toks_c += sum(nt for _, nt in by_dec[d])
        vocab_c += vdec.get(d, 0)
        expect[d] = (docs_c, toks_c, vocab_c)

    load_all_queries()
    from nchu_bigdata_spark.registry import REGISTRY

    got = {
        r.decile: (r.k_docs, r.tokens_cum, r.vocab_cum)
        for r in REGISTRY["text_heaps_law"].fn(spark, sf_dir).collect()
    }
    assert got == expect


# ------------------------------------------------- round-11 third wave


def test_geo_bbox_join_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.geo import (
        _AX,
        _AY,
        _BX,
        _BY,
        _SPAN,
        _W_STEP,
    )

    custs = [
        ((c * _AX) % _SPAN, (c * _AY) % _SPAN, c)
        for (c,) in duck.execute(
            "SELECT c_custkey FROM customer"
        ).fetchall()
    ]
    expect = {}
    for (n,) in duck.execute(
        "SELECT n_nationkey FROM nation"
    ).fetchall():
        nx = (n * _AX + _BX) % _SPAN
        ny = (n * _AY + _BY) % _SPAN
        wx = 20000 + ((n * 37) % 8) * _W_STEP
        wy = 20000 + ((n * 53) % 8) * _W_STEP
        inside = [
            c
            for cx, cy, c in custs
            if nx - wx <= cx <= nx + wx and ny - wy <= cy <= ny + wy
        ]
        expect[n] = (
            nx - wx,
            nx + wx,
            ny - wy,
            ny + wy,
            len(inside),
            min(inside) if inside else None,
        )

    got = {
        r.n_nationkey: (
            r.x0, r.x1, r.y0, r.y1, r.n_points, r.min_custkey
        )
        for r in load_all_queries()["geo_bbox_join"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # the fixture geography must exercise BOTH populated and empty
    # rects for the left-join restore to be non-vacuous ... unless
    # every rect happens to be populated; assert at least populated
    assert any(v[4] > 0 for v in expect.values())


def test_text_source_drift_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.operators.text import _DRIFT_K

    docs = duck.execute(
        "SELECT source, text FROM documents"
    ).fetchall()
    from collections import Counter

    tot = Counter()
    per_src: dict[str, Counter] = {}
    for src, text in docs:
        ws = text.split(" ")
        tot.update(ws)
        per_src.setdefault(src, Counter()).update(ws)
    topk = {
        t
        for t, _ in sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_DRIFT_K
        ]
    }
    prof = {}
    for src, cnt in per_src.items():
        b = Counter()
        for t, c in cnt.items():
            b[t if t in topk else "__OTHER__"] += c
        prof[src] = b
    terms = set()
    for b in prof.values():
        terms |= set(b)
    expect = {}
    srcs = sorted(prof)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            na = sum(prof[a].values())
            nb = sum(prof[b].values())
            acc = 0
            for t in terms:
                oa, ob = prof[a].get(t, 0), prof[b].get(t, 0)
                if oa + ob == 0:
                    continue
                for o, r in ((oa, na), (ob, nb)):
                    num = (o * (na + nb) - r * (oa + ob)) ** 2
                    den = r * (oa + ob) * (na + nb)
                    acc += (num // den) * 10000 + (
                        (num - (num // den) * den) * 10000
                    ) // den
            expect[(a, b)] = (na, nb, acc)

    got = {
        (r.src_a, r.src_b): (r.n_tok_a, r.n_tok_b, r.chi2_e4)
        for r in load_all_queries()["text_source_drift"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect


def test_win_rsi_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.windows import _RSI_EMIT, _RSI_N

    rows = duck.execute(
        "SELECT event_type, CAST(ROUND(value * 100) AS BIGINT)"
        " FROM events ORDER BY event_type, ts, event_id"
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, cents in rows:
        series.setdefault(et, []).append(cents)
    expect = {}
    for et, cs in series.items():
        deltas = [None] + [
            cs[i] - cs[i - 1] for i in range(1, len(cs))
        ]
        for rn in range(1, len(cs) + 1):
            if rn % _RSI_EMIT != 0:
                continue
            fr = deltas[max(0, rn - _RSI_N) : rn]
            fr = [d for d in fr if d is not None]
            if len(fr) != _RSI_N:
                continue
            sg = sum(d for d in fr if d > 0)
            sl = sum(-d for d in fr if d < 0)
            expect[(et, rn)] = (
                None if sg + sl == 0 else (10000 * sg) // (sg + sl)
            )

    got = {
        (r.event_type, r.rn): r.rsi_bp
        for r in load_all_queries()["win_rsi"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_ts_ljung_box_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.analytics import _LB_CRIT_E4

    cells = duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000, COUNT(*)"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, _day, x in cells:
        series.setdefault(et, []).append(x)
    expect = {}
    for et, xs in series.items():
        n, s = len(xs), sum(xs)
        ct = [n * x - s for x in xs]
        den = sum(c * c for c in ct)
        q = 0
        rho1 = None
        for k in range(1, 8):
            num = sum(ct[i] * ct[i + k] for i in range(n - k))
            r = (
                (1000000 * num) // den
                if num >= 0
                else -((1000000 * (-num)) // den)
            )
            if k == 1:
                rho1 = r
            q += (n * (n + 2) * r * r) // (n - k)
        q_e4 = q // 100000000
        expect[et] = (n, rho1, q_e4, 1 if q_e4 > _LB_CRIT_E4 else 0)

    got = {
        r.event_type: (r.n_days, r.rho1_e6, r.q_e4, r.rejected)
        for r in load_all_queries()["ts_ljung_box"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect


def test_ts_kendall_tau_replay(spark, sf_dir, duck):
    cells = duck.execute(
        "SELECT event_type, epoch_us(ts) // 86400000000 AS day,"
        " COUNT(*) AS x,"
        " SUM(CAST(ROUND(value * 100) AS BIGINT)) AS y"
        " FROM events GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list[tuple[int, int]]] = {}
    for et, _d, x, y in cells:
        series.setdefault(et, []).append((x, y))
    expect = {}
    for et, pts in series.items():
        n = len(pts)
        s_stat = 0
        for i in range(n):
            for j in range(i + 1, n):
                dx = pts[j][0] - pts[i][0]
                dy = pts[j][1] - pts[i][1]
                if dx * dy > 0:
                    s_stat += 1
                elif dx * dy < 0:
                    s_stat -= 1
        from collections import Counter

        t0 = n * (n - 1) // 2
        t1 = sum(
            t * (t - 1) // 2
            for t in Counter(x for x, _ in pts).values()
            if t > 1
        )
        t2 = sum(
            t * (t - 1) // 2
            for t in Counter(y for _, y in pts).values()
            if t > 1
        )
        lx, ly = t0 - t1, t0 - t2
        if lx == 0 or ly == 0:
            tau = None
        else:
            import math as _m

            isq = _m.floor(_m.sqrt(float(lx * ly)))
            tau = (
                (1000000 * s_stat) // isq
                if s_stat >= 0
                else -((1000000 * (-s_stat)) // isq)
            )
        expect[et] = (n, s_stat, tau)

    got = {
        r.event_type: (r.n_days, r.s_stat, r.tau_b_e6)
        for r in load_all_queries()["ts_kendall_tau"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect


def test_sample_neyman_alloc_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.operators.pipeline import _NEY_BUDGET

    docs = duck.execute(
        "SELECT lang, n_chars FROM documents"
    ).fetchall()
    strata: dict[str, list[int]] = {}
    for lang, w in docs:
        strata.setdefault(lang, []).append(int(w))
    legs = {}
    for lang, ws in strata.items():
        n, sw, sw2 = len(ws), sum(ws), sum(w * w for w in ws)
        legs[lang] = (n, sw, math.isqrt(n * sw2 - sw * sw))
    tleg = sum(g for _n, _s, g in legs.values())
    expect = {
        lang: (
            n,
            sw,
            g,
            (10000 * g) // tleg,
            (_NEY_BUDGET * g) // tleg,
        )
        for lang, (n, sw, g) in legs.items()
    }

    got = {
        r.lang: (r.n_docs, r.sum_w, r.neyman_leg, r.alloc_bp, r.n_alloc)
        for r in load_all_queries()["sample_neyman_alloc"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # Neyman beats proportional only if variances differ; sanity: the
    # shares are a proper distribution (floor sum <= 10000)
    assert sum(v[3] for v in expect.values()) <= 10000


def test_geo_grid_neighborhood_invariant_exhaustive():
    """The exactness core of both geo ops: for non-negative integer
    coordinates and cell edge C >= R, |a - b| <= R implies the cell
    indices differ by at most 1 — so the 3x3 ring (cell_join) and the
    cover-cell set (bbox_join) are COMPLETE candidate generators.
    Exhaustive over a window spanning several cells including all
    boundary alignments."""
    from nchu_bigdata_spark.queries.geo import _R

    C = _R
    # scan a full cell plus both boundaries at fine granularity: every
    # residue class near 0, C-1 matters; use a small synthetic C to
    # keep it exhaustive, plus spot-check the real constant
    for c, r in ((7, 7), (7, 5), (C, C)):
        step = max(1, c // 7)
        pts = list(range(0, 3 * c + 2, step)) + [
            c - 1, c, c + 1, 2 * c - 1, 2 * c, 2 * c + 1
        ]
        for a in pts:
            for b in pts:
                if abs(a - b) <= r:
                    assert abs(a // c - b // c) <= 1, (a, b, c, r)


def test_geo_cell_join_pair_uniqueness():
    """9 distinct cell keys per facility (dx, dy distinct) ⇒ a
    (point, facility) pair can match at most once — the no-dedup
    argument, checked on the fixture by comparing pair multiset
    against the distinct pair set."""
    import duckdb

    from nchu_bigdata_spark.queries.geo import (
        _AX,
        _AY,
        _OX,
        _OY,
        _R,
        _SPAN,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH s AS (
            SELECT s_suppkey,
                   (s_suppkey * {_AX} + {_OX}) % {_SPAN} AS sx,
                   (s_suppkey * {_AY} + {_OY}) % {_SPAN} AS sy
            FROM '/root/testdata/sf0.01/supplier.parquet'
        ),
        r AS (
            SELECT s_suppkey,
                   (sx // {_R} + dx.d) * 1048576 + (sy // {_R} + dy.d)
                       AS cell
            FROM s,
                 (VALUES (-1), (0), (1)) dx(d),
                 (VALUES (-1), (0), (1)) dy(d)
        )
        SELECT s_suppkey, cell, COUNT(*) FROM r
        GROUP BY 1, 2 HAVING COUNT(*) > 1
        """
    ).fetchall()
    assert rows == [], rows


def test_events_welch_ttest_replay(spark, sf_dir, duck):
    from nchu_bigdata_spark.queries.analytics import _WT_Z2_E4

    rows = duck.execute(
        "SELECT event_type, user_id % 2,"
        " CAST(ROUND(value * 100) AS BIGINT) FROM events"
    ).fetchall()
    g: dict[str, dict[int, list[int]]] = {}
    for et, v, c in rows:
        g.setdefault(et, {0: [], 1: []})[v].append(c)
    expect = {}
    for et, parts in g.items():
        a, b = parts[0], parts[1]
        na, nb = len(a), len(b)
        if na < 2 or nb < 2:
            continue
        sa, sb = sum(a), sum(b)
        qa, qb = sum(x * x for x in a), sum(x * x for x in b)
        da, db = na * qa - sa * sa, nb * qb - sb * sb
        sd = sa * nb - sb * na
        num = sd * sd * (na - 1) * (nb - 1)
        den = da * nb * nb * (nb - 1) + db * na * na * (na - 1)
        md = (
            (100 * sd) // (na * nb)
            if sd >= 0
            else -((100 * (-sd)) // (na * nb))
        )
        if den == 0:
            t2, sig = None, 0
        else:
            t2 = (num // den) * 10000 + (
                (num - (num // den) * den) * 10000
            ) // den
            sig = 1 if t2 > _WT_Z2_E4 else 0
        expect[et] = (na, nb, md, t2, sig)

    got = {
        r.event_type: (
            r.n_a, r.n_b, r.mean_diff_cents_e2, r.t2_e4, r.significant
        )
        for r in load_all_queries()["events_welch_ttest"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # Welch identity sanity on a known asymmetric case: clearly
    # different means with tight variances must be significant
    a, b = [100] * 50 + [101] * 50, [200] * 50 + [201] * 50
    na = nb = 100
    sa, sb = sum(a), sum(b)
    qa, qb = sum(x * x for x in a), sum(x * x for x in b)
    da, db = na * qa - sa * sa, nb * qb - sb * sb
    sd = sa * nb - sb * na
    num = sd * sd * (na - 1) * (nb - 1)
    den = da * nb * nb * (nb - 1) + db * na * na * (na - 1)
    t2 = (num // den) * 10000 + ((num - (num // den) * den) * 10000) // den
    assert t2 > _WT_Z2_E4
