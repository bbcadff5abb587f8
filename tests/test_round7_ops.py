"""Unit tests for the round-7 operators (text_line_dedup,
mixture_weights, embed_covariance): engine output vs independent
Python replays on hand-built fixtures with known structure."""

from __future__ import annotations

import math
import random
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


def _write_documents(tmp_path, texts, langs=None):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs or ["en"] * n),
                "source": pa.array(["src0"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


# --------------------------------------------------------------------------
# text_line_dedup
# --------------------------------------------------------------------------


def _replay_line_dedup(texts, w=4, hot=3):
    segs = []  # (doc, s, seg)
    for d, t in enumerate(texts):
        toks = t.split(" ")
        n_seg = math.ceil(len(toks) / w)
        for s in range(n_seg):
            segs.append((d, s, " ".join(toks[s * w : s * w + w])))
    counts = Counter(seg for _, _, seg in segs)
    out = {}
    for d, t in enumerate(texts):
        kept = [seg for dd, s, seg in segs if dd == d and counts[seg] < hot]
        n_seg = math.ceil(len(t.split(" ")) / w)
        out[d] = (n_seg, len(kept), " ".join(kept))
    return out


def test_line_dedup_removes_corpus_hot_segments(spark, tmp_path):
    # "spam ham egg x" appears in 3 docs -> removed everywhere;
    # unique tails survive in original order.
    texts = [
        "spam ham egg x alpha beta gamma delta one two",
        "spam ham egg x epsilon zeta eta theta",
        "prefix a b c spam ham egg x",  # hot segment mid-document
        "solo doc with unique words only here",
    ]
    _write_documents(tmp_path, texts)
    rows = SPECS["text_line_dedup"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: (r.n_seg, r.n_seg_kept, r.kept_text) for r in rows}
    assert got == _replay_line_dedup(texts)
    # the hot segment really is gone from every survivor
    assert all("spam ham egg x" not in v[2] for v in got.values())


def test_line_dedup_all_segments_hot_yields_empty_doc(spark, tmp_path):
    texts = ["dup seg one two"] * 3 + ["fresh words entirely different"]
    _write_documents(tmp_path, texts)
    rows = SPECS["text_line_dedup"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: (r.n_seg, r.n_seg_kept, r.kept_text) for r in rows}
    for d in range(3):
        assert got[d] == (1, 0, "")
    assert got[3] == (1, 1, "fresh words entirely different")


# --------------------------------------------------------------------------
# mixture_weights
# --------------------------------------------------------------------------


def test_mixture_weights_integer_recipe(spark, tmp_path):
    # token counts: en=12, zh=2, es=4, de=4, fr=4 (zh is binding)
    texts, langs = [], []
    for lang, n_tok in (("en", 12), ("zh", 2), ("es", 4), ("de", 4), ("fr", 4)):
        texts.append(" ".join(f"{lang}tok{i}" for i in range(n_tok)))
        langs.append(lang)
    _write_documents(tmp_path, texts, langs)
    rows = SPECS["mixture_weights"].fn(spark, str(tmp_path)).collect()
    got = {r.lang: r for r in rows}
    target = {"en": 4000, "zh": 1500, "es": 1500, "de": 1500, "fr": 1500}
    n = {"en": 12, "zh": 2, "es": 4, "de": 4, "fr": 4}
    budget = min(n[L] * 10000 // target[L] for L in target)  # zh: 13
    total = sum(n.values())
    for L in target:
        desired = target[L] * budget // 10000
        assert got[L].n_tokens == n[L]
        assert got[L].actual_bp == n[L] * 10000 // total
        assert got[L].target_bp == target[L]
        assert got[L].desired_tokens == desired
        assert got[L].weight_bp == desired * 10000 // n[L]
        assert got[L].weight_bp <= 10000
    # the binding language is kept (nearly) whole; sum of desired
    # tokens is within rounding of the budget's proportions
    assert got["zh"].desired_tokens == 1  # floor(1500*13/10000)


# --------------------------------------------------------------------------
# embed_covariance
# --------------------------------------------------------------------------


def test_embed_covariance_matches_quantized_replay(spark, tmp_path):
    rng = random.Random(7)
    d, nvec = 5, 40
    vecs = [[rng.uniform(-2, 2) for _ in range(d)] for _ in range(nvec)]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(nvec), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * nvec, pa.int64()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = SPECS["embed_covariance"].fn(spark, str(tmp_path)).collect()
    got = {(r.i, r.j): (r.n, r.cov) for r in rows}
    assert len(got) == d * (d + 1) // 2

    # exact replay over the SAME float32-quantized values
    import struct as _struct

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    q = [
        [int(round(f32(x) * 1_000_000)) for x in v]  # noqa: RUF046
        for v in vecs
    ]
    n = nvec
    for i in range(d):
        for j in range(i, d):
            si = sum(v[i] for v in q)
            sj = sum(v[j] for v in q)
            spp = sum(v[i] * v[j] for v in q)
            want = float(n * spp - si * sj) / (float(n * (n - 1)) * 1e12)
            gn, gcov = got[(i + 1, j + 1)]
            assert gn == n
            assert math.isclose(gcov, want, rel_tol=1e-12, abs_tol=1e-15), (
                i,
                j,
                gcov,
                want,
            )


# --------------------------------------------------------------------------
# tokenize_chunk_overlap / project_unpivot
# --------------------------------------------------------------------------


def test_chunk_overlap_boundaries(spark, tmp_path):
    # n=64 -> exactly 1 chunk; n=65 -> 2 chunks (second has 17 tokens:
    # starts at 48, overlap 16 + 1 new); n=10 -> 1 short chunk
    texts = [
        " ".join(f"t{i}" for i in range(64)),
        " ".join(f"t{i}" for i in range(65)),
        " ".join(f"t{i}" for i in range(10)),
        " ".join(f"t{i}" for i in range(160)),  # 1+ceil(96/48)=3 chunks
    ]
    _write_documents(tmp_path, texts)
    rows = SPECS["tokenize_chunk_overlap"].fn(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0].n_tokens == 64
    assert len(by_doc[1]) == 2
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert (c1[0].n_tokens, c1[1].n_tokens) == (64, 17)
    # consecutive chunks overlap by 16 tokens
    assert c1[0].chunk_text.split(" ")[48:] == c1[1].chunk_text.split(" ")[:16]
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 10
    c3 = sorted(by_doc[3], key=lambda r: r.chunk_id)
    assert [c.n_tokens for c in c3] == [64, 64, 64]
    # full coverage: union of chunk tokens == original tokens
    seen = set()
    for c in c3:
        seen.update(c.chunk_text.split(" "))
    assert seen == set(texts[3].split(" "))


def test_unpivot_roundtrips_pivot(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10, 20], pa.int64()),
                "l_linenumber": pa.array([1, 1], pa.int32()),
                "l_quantity": pa.array([3.0, 4.0], pa.float64()),
                "l_extendedprice": pa.array([10.5, 20.25], pa.float64()),
                "l_discount": pa.array([0.1, 0.2], pa.float64()),
                "l_tax": pa.array([0.02, 0.04], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = SPECS["project_unpivot"].fn(spark, str(tmp_path)).collect()
    got = {(r.l_orderkey, r.measure): r.value for r in rows}
    assert len(rows) == 8  # 2 rows x 4 measures (both keys % 10 == 0)
    assert got[(10, "l_quantity")] == 3.0
    assert got[(20, "l_extendedprice")] == 20.25
    assert got[(10, "l_tax")] == 0.02


# --------------------------------------------------------------------------
# win_fill_forward / scan_csv_corrupt edge semantics
# --------------------------------------------------------------------------


def test_fill_forward_leading_null_stays_null(spark, tmp_path):
    # user 1: events 5,10 -> event 5 (id%5==0) is masked and has no
    # prior non-null, so filled stays NULL; event 10 is also masked and
    # ALSO has no prior non-null (both masked) -> NULL; user 2: 7,15 ->
    # 7 keeps its value, 15 masked inherits 7's value.
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000_000_000_000  # ns epoch, post-1970
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([5, 10, 7, 15], pa.int64()),
                "ts": pa.array(
                    [base, base + 10**9, base, base + 10**9], pa.int64()
                ),
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["click"] * 4),
                "value": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
                "props": pa.array(["{}"] * 4),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    rows = SPECS["win_fill_forward"].fn(spark, str(tmp_path)).collect()
    got = {r.event_id: (r.raw_value, r.filled_value) for r in rows}
    assert got[5] == (None, None)  # leading null: nothing to carry
    assert got[10] == (None, None)  # still nothing non-null before it
    assert got[7] == (3.5, 3.5)
    assert got[15] == (None, 3.5)  # LOCF from event 7


def test_csv_corrupt_quarantine_counts(spark, tmp_path):
    texts = ["aaa", "bbbb", "cc", "ddddd", "eee", "f", "gg", "hhh"]
    _write_documents(tmp_path, texts)  # doc_ids 0..7; 0 and 7 corrupt
    rows = SPECS["scan_csv_corrupt"].fn(spark, str(tmp_path)).collect()
    got = {r.lang: (r.n_good, r.sum_chars) for r in rows}
    # docs 0 and 7 are the % 7 == 0 ids -> quarantined
    assert got["<corrupt>"] == (2, 0)
    good_chars = sum(len(t) for i, t in enumerate(texts) if i % 7 != 0)
    assert got["en"] == (6, good_chars)


# --------------------------------------------------------------------------
# text_heavy_hitters
# --------------------------------------------------------------------------


def test_heavy_hitters_exact_on_zipf_corpus(spark, tmp_path):
    # Zipf-ish corpus: token "t0" dominates, a long tail of near-unique
    # tokens stresses the MG eviction path (vocab >> per-doc length).
    rng = random.Random(7)
    texts = []
    for d in range(200):
        toks = []
        for i in range(60):
            r = rng.random()
            if r < 0.30:
                toks.append("t0")
            elif r < 0.45:
                toks.append(f"mid{rng.randrange(5)}")
            else:
                toks.append(f"tail{d}_{i}")  # near-unique
        texts.append(" ".join(toks))
    _write_documents(tmp_path, texts)
    expect = Counter(w for t in texts for w in t.split(" "))
    total = sum(expect.values())
    want = {w: c for w, c in expect.items() if c * 1000 >= total}
    got = {
        r.word: r.cnt
        for r in SPECS["text_heavy_hitters"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert "t0" in got  # the dominant token must always surface


def test_heavy_hitters_uniform_corpus_reports_everything(spark, tmp_path):
    # 100 tokens each at exactly 1% >= 0.1% threshold: nothing may be
    # dropped even though every partition's summary stays tiny.
    texts = [" ".join(f"w{i}" for i in range(100))] * 10
    _write_documents(tmp_path, texts)
    got = {
        r.word: r.cnt
        for r in SPECS["text_heavy_hitters"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {f"w{i}": 10 for i in range(100)}


# --------------------------------------------------------------------------
# ts_resample
# --------------------------------------------------------------------------

_H_US = 3600 * 1_000_000


def _write_valued_events(tmp_path, rows):
    """rows = (ts_micros_offset, event_type, value); base not hour-aligned."""
    t0 = 1_700_000_000 * 1_000_000 + 123_000_000  # deliberately unaligned
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [t0 + r[0] for r in rows], pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    return t0


def test_ts_resample_manufactures_gap_rows_with_locf(spark, tmp_path):
    # series "a": hours 0, 1, [gap, gap], 4; series "b": single event
    rows = [
        (0, "a", 2.5),
        (1 * _H_US, "a", 1.5),
        (1 * _H_US + 60_000_000, "a", 1.0),  # same bucket as previous
        (4 * _H_US, "a", 3.0),
        (2 * _H_US, "b", 7.0),
    ]
    t0 = _write_valued_events(tmp_path, rows)
    got = {
        (r.event_type, r.bucket_us): (r.n_events, r.sum_value, r.locf_sum)
        for r in SPECS["ts_resample"].fn(spark, str(tmp_path)).collect()
    }
    b0 = (t0 // _H_US) * _H_US
    assert got == {
        ("a", b0): (1, 2.5, 2.5),
        ("a", b0 + _H_US): (2, 2.5, 2.5),
        ("a", b0 + 2 * _H_US): (0, None, 2.5),  # manufactured gap row
        ("a", b0 + 3 * _H_US): (0, None, 2.5),
        ("a", b0 + 4 * _H_US): (1, 3.0, 3.0),
        ("b", b0 + 2 * _H_US): (1, 7.0, 7.0),  # 1-bucket spine
    }


# --------------------------------------------------------------------------
# sample_importance
# --------------------------------------------------------------------------


def _replay_importance(docs):
    """docs: (doc_id, lang, text). Integer replay of the DSIR-lite vote."""
    c_all, c_tgt = Counter(), Counter()
    for _, lang, text in docs:
        for w in text.split(" "):
            c_all[w] += 1
            if lang == "en":
                c_tgt[w] += 1
    n_all = sum(c_all.values())
    n_tgt = sum(c_tgt.values())
    out = {}
    for d, _, text in docs:
        toks = text.split(" ")
        aff = sum(
            1
            for w in toks
            if c_tgt[w] * (n_all - n_tgt) > (c_all[w] - c_tgt[w]) * n_tgt
        )
        if 2 * aff >= len(toks):
            out[d] = (len(toks), aff)
    return out


def test_sample_importance_majority_vote(spark, tmp_path):
    docs = [
        (0, "en", "alpha beta alpha beta"),        # pure target vocab
        (1, "en", "alpha beta gamma delta"),       # mixed target doc
        (2, "de", "gamma delta gamma delta"),      # pure background
        (3, "de", "alpha alpha alpha delta"),      # bg doc, target-affine vocab
        (4, "de", "gamma gamma gamma alpha"),      # bg-leaning
    ]
    _write_documents(
        tmp_path, [d[2] for d in docs], langs=[d[1] for d in docs]
    )
    expect = _replay_importance(docs)
    got = {
        r.doc_id: (r.n_tok, r.n_affine)
        for r in SPECS["sample_importance"].fn(spark, str(tmp_path)).collect()
    }
    assert got == expect
    assert 0 in got and 3 in got and 2 not in got  # the vote, concretely


# --------------------------------------------------------------------------
# table_diff
# --------------------------------------------------------------------------


def _write_orders(tmp_path, keys):
    import datetime

    n = len(keys)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([k % 5 for k in keys], pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array([100.0 + k for k in keys], pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(2024, 1, 1 + (k % 20)) for k in keys],
                    pa.timestamp("us", tz="UTC"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )


def test_table_diff_classifies_each_change_once(spark, tmp_path):
    # keys 0..20: %10==0 -> D (0, 10, 20), %7==0 among survivors -> U
    # (7, 14), %13==0 -> I as -(k+1) (0, 13)
    _write_orders(tmp_path, list(range(21)))
    rows = SPECS["table_diff"].fn(spark, str(tmp_path)).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.change_type, set()).add(r.o_orderkey)
    assert by_type["D"] == {0, 10, 20}
    assert by_type["U"] == {7, 14}
    assert by_type["I"] == {-1, -14}
    assert len(rows) == 7  # every changed key exactly once, nothing else
    # U rows carry exact old/new prices (doubling is FP-exact)
    u = {r.o_orderkey: (r.old_price, r.new_price) for r in rows if r.change_type == "U"}
    assert u == {7: (107.0, 214.0), 14: (114.0, 228.0)}


def test_table_diff_identical_snapshots_when_no_rule_hits(spark, tmp_path):
    # keys chosen so no delete/update/insert rule fires -> empty diff
    _write_orders(tmp_path, [1, 2, 3, 4, 6, 8, 9, 11, 12])
    assert SPECS["table_diff"].fn(spark, str(tmp_path)).count() == 0


# --------------------------------------------------------------------------
# sim_mips
# --------------------------------------------------------------------------


def _write_embeddings(tmp_path, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int64()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )


def test_mips_matches_norm_augmentation_reduction(spark, tmp_path):
    # MIPS rank per query must equal cosine rank in the augmented space
    # (corpus vector gets sqrt(M^2 - |x|^2) appended, query gets 0) —
    # the Bachrach et al. reduction the docstring claims.
    rng = random.Random(11)
    d, nvec = 4, 30
    vecs = [[rng.uniform(-2, 2) for _ in range(d)] for _ in range(nvec)]
    _write_embeddings(tmp_path, vecs)
    got = {}
    for r in SPECS["sim_mips"].fn(spark, str(tmp_path)).collect():
        got.setdefault(r.q_id, []).append((r.rnk, r.vec_id, r.ip))
    # float32 storage: replay through float32 like the engine reads
    import numpy as np

    v32 = [np.array(v, dtype=np.float32).astype(np.float64) for v in vecs]
    M2 = max(float(np.dot(v, v)) for v in v32) + 1.0
    for q_id, ranked in got.items():
        ranked.sort()
        qv = v32[q_id]
        # direct MIPS replay (same 6dp rounding + id tiebreak)
        scores = sorted(
            (
                (-round(float(np.dot(qv, v32[c])), 6), c)
                for c in range(nvec)
                if c != q_id
            )
        )[:5]
        assert [(c, -s) for s, c in scores] == [
            (vec_id, float(ip)) for _, vec_id, ip in ranked
        ]
        # augmented-cosine replay: rank order must coincide
        aug = sorted(
            (
                (
                    -float(
                        np.dot(np.append(qv, 0.0), np.append(v32[c], np.sqrt(M2 - np.dot(v32[c], v32[c]))))
                        / (np.linalg.norm(qv) * np.sqrt(M2))
                    ),
                    c,
                )
                for c in range(nvec)
                if c != q_id
            )
        )[:5]
        assert [c for _, c in aug] == [vec_id for _, vec_id, _ in ranked]


# --------------------------------------------------------------------------
# sort_zorder
# --------------------------------------------------------------------------


def test_zorder_blocks_are_aligned_tiles(spark, tmp_path):
    # 1000 orders spreading both dims across their full 8-bit range.
    # An aligned Morton block of width 1024 is exactly one 32x32 tile,
    # so EVERY block's envelope must be narrow in BOTH dimensions —
    # the data-skipping property a single-dim sort cannot give (its
    # trailing dimension's envelope spans the full 0..255 range).
    import datetime

    keys = list(range(1000))
    base = datetime.datetime(2023, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([k * 17 % 251 for k in keys], pa.int64()),
                "o_orderstatus": pa.array(["O"] * 1000),
                "o_totalprice": pa.array([100.0] * 1000, pa.float64()),
                "o_orderdate": pa.array(
                    [base + datetime.timedelta(days=(k * 7) % 256) for k in keys],
                    pa.timestamp("us", tz="UTC"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 1000),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = SPECS["sort_zorder"].fn(spark, str(tmp_path)).collect()
    assert sum(r.n_rows for r in rows) == 1000
    assert len(rows) > 10  # the curve really spreads across blocks
    for r in rows:
        assert r.x_max - r.x_min <= 31, r
        assert r.y_max - r.y_min <= 31, r


# --------------------------------------------------------------------------
# agg_histogram
# --------------------------------------------------------------------------


def test_histogram_edges_and_clamp(spark, tmp_path):
    import datetime

    # prices exactly ON bin edges ($50k -> bin 1, not 0) and far past
    # the top edge (clamped into bin 11)
    prices = [0.0, 49999.99, 50000.0, 99999.99, 100000.0, 5_000_000.0]
    n = len(prices)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n), pa.int64()),
                "o_custkey": pa.array([1] * n, pa.int64()),
                "o_orderstatus": pa.array(["O"] * n),
                "o_totalprice": pa.array(prices, pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(2024, 1, 1)] * n, pa.timestamp("us", tz="UTC")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * n),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = {
        r.bin: (r.lo_cents, r.hi_cents, r.n)
        for r in SPECS["agg_histogram"].fn(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (0, 5_000_000, 2),          # 0.00 and 49999.99
        1: (5_000_000, 10_000_000, 2), # edge value 50000.00 and 99999.99
        2: (10_000_000, 15_000_000, 1),
        11: (55_000_000, 60_000_000, 1),  # 5M clamps into the top bin
    }


# --------------------------------------------------------------------------
# events_rfm
# --------------------------------------------------------------------------


def test_rfm_mean_split_flags(spark, tmp_path):
    # 3 users with hand-computable axes. Values chosen so each axis's
    # mean lands strictly between users, plus one exact-mean tie
    # (>= keeps it above the line).
    t0 = 1_700_000_000 * 1_000_000
    rows = []  # (ts_off, user, value)
    rows += [(0, 1, 10.0)]                       # u1: 1 event, early, $10
    rows += [(3_600_000_000 * k, 2, 20.0) for k in range(1, 4)]   # u2: 3 events
    rows += [(3_600_000_000 * k, 3, 50.0) for k in range(4, 6)]   # u3: 2 late events
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([t0 + r[0] for r in rows], pa.timestamp("us", tz="UTC")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(["e"] * len(rows)),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = {r.user_id: r for r in SPECS["events_rfm"].fn(spark, str(tmp_path)).collect()}
    # replay
    per = {
        1: (t0, 1, 1000),
        2: (t0 + 3 * 3_600_000_000, 3, 6000),
        3: (t0 + 5 * 3_600_000_000, 2, 10000),
    }
    n = 3
    s = [sum(p[i] for p in per.values()) for i in range(3)]
    for u, (ts, fq, c) in per.items():
        rf, ff, mf = (int(ts * n >= s[0]), int(fq * n >= s[1]), int(c * n >= s[2]))
        g = got[u]
        assert (g.last_ts_us, g.freq, g.cents) == (ts, fq, c)
        assert (g.r_flag, g.f_flag, g.m_flag) == (rf, ff, mf), u
        assert g.segment == rf * 4 + ff * 2 + mf
    # u2 freq (3) is exactly the mean (6/3=2 -> no; 3*3=9 >= 6 yes);
    # concrete sanity: u3 is champion on R and M, u1 on nothing
    assert got[3].r_flag == 1 and got[3].m_flag == 1
    assert got[1].segment == 0


# --------------------------------------------------------------------------
# agg_argmax
# --------------------------------------------------------------------------


def test_argmax_deterministic_tiebreak(spark, tmp_path):
    import datetime

    # customer 1: unique extremes; customer 2: ALL orders tie on price
    # -> the packed key must pick the LARGEST orderkey as argmax and
    # the SMALLEST as argmin, identically every run
    rows = [  # (orderkey, custkey, price)
        (10, 1, 50.0), (11, 1, 99.0), (12, 1, 1.0),
        (20, 2, 42.0), (21, 2, 42.0), (22, 2, 42.0),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.datetime(2024, 1, 1)] * len(rows),
                    pa.timestamp("us", tz="UTC"),
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    got = {r.o_custkey: r for r in SPECS["agg_argmax"].fn(spark, str(tmp_path)).collect()}
    assert (got[1].top_orderkey, got[1].bottom_orderkey, got[1].top_cents) == (11, 12, 9900)
    assert (got[2].top_orderkey, got[2].bottom_orderkey, got[2].top_cents) == (22, 20, 4200)
