"""Hypothesis property tests for the round-7 exact-integer reworks:
the derived statistics must match independent Python/numpy replays on
ARBITRARY inputs, not just the sf fixtures — guarding the IEEE-exact
derivation claims (agg_percentile_exact's order-statistic
interpolation, agg_corr/agg_regression's co-moment algebra).

Example counts are small: every example pays a parquet write + Spark
job; 8 adversarial examples beat 200 that never touch a boundary.
"""

from __future__ import annotations

import math

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

# 2-decimal values (the cents-exact domain the operators declare)
_CENTS_VALS = st.lists(
    st.integers(min_value=0, max_value=2_000_00).map(lambda c: c / 100.0),
    min_size=1,
    max_size=60,
)


def _write_lineitem(tmp_path, qty, price):
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"] * len(qty)),
                "l_quantity": pa.array(qty, pa.float64()),
                "l_extendedprice": pa.array(price, pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def _pct_cont(vals, p):
    """PERCENTILE_CONT reference: numpy-free linear interpolation over
    the sorted multiset (same definition numpy calls 'linear')."""
    s = sorted(vals)
    r = (len(s) - 1) * p
    lo = math.floor(r)
    hi = min(lo + 1, len(s) - 1)
    return s[lo] + (s[hi] - s[lo]) * (r - lo)


@settings(**_SETTINGS)
@given(qty=_CENTS_VALS)
def test_percentile_exact_matches_reference(spark, tmp_path_factory, qty):
    tmp = tmp_path_factory.mktemp("pct")
    _write_lineitem(tmp, qty, [1.0] * len(qty))
    r = SPECS["agg_percentile_exact"].fn(spark, str(tmp)).collect()[0]
    for col, p in (("p50_qty", 0.5), ("p95_qty", 0.95)):
        want = _pct_cont(qty, p)
        assert math.isclose(r[col], want, rel_tol=1e-12, abs_tol=1e-9), (
            col,
            r[col],
            want,
            qty,
        )


@settings(**_SETTINGS)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(1, 5000).map(lambda c: c / 100.0),
            st.integers(0, 10_000_00).map(lambda c: c / 100.0),
        ),
        min_size=3,
        max_size=50,
    )
)
def test_corr_and_regression_match_comoment_replay(
    spark, tmp_path_factory, pairs
):
    """agg_corr / agg_regression vs an exact-integer Python replay of
    the SAME co-moment algebra (and, where defined, vs the textbook
    float formulas within float tolerance)."""
    qty = [x for x, _ in pairs]
    price = [y for _, y in pairs]
    tmp = tmp_path_factory.mktemp("cm")
    _write_lineitem(tmp, qty, price)
    xs = [round(x * 100) for x in qty]
    ys = [round(y * 100) for y in price]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    num = n * sxy - sx * sy
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy

    rc = SPECS["agg_corr"].fn(spark, str(tmp)).collect()[0]
    assert rc["n"] == n
    if denx > 0 and deny > 0:
        want_corr = float(num) / math.sqrt(float(denx) * float(deny))
        assert math.isclose(
            rc["qty_price_corr"], want_corr, rel_tol=1e-12, abs_tol=1e-12
        )
    if n > 1:
        want_cov = float(num) / (float(n * (n - 1)) * 10000.0)
        assert math.isclose(
            rc["qty_price_cov"], want_cov, rel_tol=1e-12, abs_tol=1e-12
        )

    rr = SPECS["agg_regression"].fn(spark, str(tmp)).collect()[0]
    assert rr["n"] == n
    if denx > 0:
        want_slope = float(num) / float(denx)
        assert math.isclose(
            rr["slope"], want_slope, rel_tol=1e-12, abs_tol=1e-12
        )
        want_icpt = (float(sy) - want_slope * float(sx)) / (float(n) * 100.0)
        assert math.isclose(
            rr["intercept"], want_icpt, rel_tol=1e-12, abs_tol=1e-9
        )


# --------------------------------------------------------------------------
# text_heavy_hitters: exactness on arbitrary corpora (the MG sketch
# pass is approximate, but the recount must make the OUTPUT exact —
# superset property + exact counts, regardless of skew or vocab size)
# --------------------------------------------------------------------------

# Corpora mixing a tiny hot vocabulary (heavy hitters likely) with a
# wide cold one (forces MG evictions): each doc is 1-40 draws.
_HH_DOC = st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=4).map(lambda i: f"hot{i}"),
        st.integers(min_value=0, max_value=5000).map(lambda i: f"cold{i}"),
    ),
    min_size=1,
    max_size=40,
)


@given(docs=st.lists(_HH_DOC, min_size=1, max_size=30))
@settings(**_SETTINGS)
def test_heavy_hitters_exact_on_arbitrary_corpora(spark, tmp_path_factory, docs):
    from collections import Counter

    tmp_path = tmp_path_factory.mktemp("hh")
    texts = [" ".join(d) for d in docs]
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
    counts = Counter(w for t in texts for w in t.split(" "))
    total = sum(counts.values())
    want = {w: c for w, c in counts.items() if c * 1000 >= total}
    got = {
        r.word: r.cnt
        for r in SPECS["text_heavy_hitters"].fn(spark, str(tmp_path)).collect()
    }
    assert got == want
