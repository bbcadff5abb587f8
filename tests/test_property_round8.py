"""Hypothesis property tests for the round-8 operators whose
correctness claims are definitional (blocking completeness, asymmetric
containment, dyadic EWMA renormalization): engine output must match
an O(n²)/sequential pure-Python replay on ARBITRARY corpora, not just
the sf fixtures.

Example counts are small: every example pays a parquet write + Spark
job; a handful of adversarial examples beat hundreds that never touch
a boundary.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny-vocab word soup: low-entropy prefixes on purpose (the regime
# that broke prefix blocking in the 10x probe).
_WORDS = ["key", "agg", "row", "scan", "kex", "ke", "keyy", "agh"]
_DOCS = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=14,
)


def _write_docs(tmp_path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def _shingles(text, k=3):
    w = text.split(" ")
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


@settings(**_SETTINGS)
@given(texts=_DOCS)
def test_containment_matches_set_replay(spark, tmp_path_factory, texts):
    """dedup_containment == brute-force shingle-set containment with
    the same stop-shingle cutoff (df <= 100 never binds at this size,
    so candidates = any shared shingle)."""
    tmp = tmp_path_factory.mktemp("contain")
    _write_docs(tmp, texts)
    sets = {i: _shingles(t) for i, t in enumerate(texts)}
    expect = {}
    ids = sorted(sets)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            small = min(len(sets[a]), len(sets[b]))
            if small and inter and inter * 10 >= small * 8:
                expect[(a, b)] = (inter, small)
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_small)
        for r in SPECS["dedup_containment"].fn(spark, str(tmp)).collect()
    }
    assert got == expect


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(**_SETTINGS)
@given(texts=_DOCS)
def test_edit_distance_blocking_complete(spark, tmp_path_factory, texts):
    """dedup_edit_distance returns EXACTLY the pairs its documented
    blocking admits (prefix-8 equal, |len diff| <= 4, lev <= 4) — the
    composite (prefix, length) join key must not lose or duplicate
    pairs, including at short titles where the explode window dips
    below length 8."""
    tmp = tmp_path_factory.mktemp("edits")
    _write_docs(tmp, texts)
    titles = {i: t[:32] for i, t in enumerate(texts)}
    expect = {}
    ids = sorted(titles)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            ta, tb = titles[a], titles[b]
            if ta[:8] != tb[:8] or abs(len(ta) - len(tb)) > 4:
                continue
            d = _lev(ta, tb)
            if d <= 4:
                expect[(a, b)] = d
    got = {
        (r.doc_a, r.doc_b): r.dist
        for r in SPECS["dedup_edit_distance"].fn(spark, str(tmp)).collect()
    }
    assert got == expect


_SERIES = st.lists(
    st.integers(min_value=0, max_value=50_000).map(lambda c: c / 100.0),
    min_size=1,
    max_size=30,
)


@settings(**_SETTINGS)
@given(values=_SERIES)
def test_ewma_matches_sequential_replay(spark, tmp_path_factory, values):
    """ts_ewma == the sequential dyadic weighted sum over each prefix
    of the series (renormalized over available lags)."""
    tmp = tmp_path_factory.mktemp("ewma")
    n = len(values)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([7] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "value": pa.array(values, pa.float64()),
                "props": pa.array(["{}"] * n),
            }
        ),
        str(tmp / "events.parquet"),
    )
    cents = [round(v * 100) for v in values]
    out = {
        r.event_id: (r.ewma_num, r.ewma_den, r.ewma_cents)
        for r in SPECS["ts_ewma"].fn(spark, str(tmp)).collect()
    }
    for i in range(n):
        lags = cents[max(0, i - 7) : i + 1][::-1]  # newest first
        num = sum((1 << (7 - k)) * c for k, c in enumerate(lags))
        den = sum(1 << (7 - k) for k in range(len(lags)))
        assert out[i] == (num, den, num // den), i
