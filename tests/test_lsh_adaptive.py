"""Corpus-adaptive LSH band-width policy (round 9 scale-probe fix).

Fixed 4-bit bands hold 16 buckets per band forever, so candidate pairs
grow ~n²/32 per band — the 52.7× `dedup_agreement` probe breach. The
fix scales band width with the corpus (`_lsh_bits`), pinning expected
bucket occupancy near `_LSH_TARGET_BUCKET`. These tests pin the policy:

* the certified fixtures (n = 2000 at sf0.01 / sf0.1) stay on the
  4-bit floor, so the engine chain remains bit-identical to the
  fixed-width DuckDB oracle;
* width grows logarithmically past the floor and caps at 62 bits —
  the math bound for ONE band value as a positive BIGINT (band values
  are computed per band, never packed into a single signature word,
  so bands·bits has no joint ceiling);
* expected occupancy n / 2^bits never exceeds the target above the
  floor — the invariant that keeps candidate volume linear in n.
"""

from __future__ import annotations

from nchu_bigdata_spark.operators.similarity import (
    _LSH_BANDS,
    _LSH_BITS,
    _LSH_TARGET_BUCKET,
    _lsh_bits,
)


def test_fixture_corpora_stay_on_oracle_width():
    # both certified SFs carry 2000 vectors; the floor must hold with
    # margin so a small fixture bump can't silently change the chain
    for n in (1, 100, 2000, 4000):
        assert _lsh_bits(n) == _LSH_BITS


def test_width_grows_log_and_caps():
    assert _lsh_bits(4001) == 5
    assert _lsh_bits(20000) == 7  # the 10x probe corpus
    assert _lsh_bits(250 * 2**14) == 14
    assert _lsh_bits(10**12) == 32  # 10^12 vectors: bucket ~233
    assert _lsh_bits(10**21) == 62  # cap: one band value < 2^63
    widths = [_lsh_bits(n) for n in (10**3, 10**4, 10**5, 10**6, 10**7)]
    assert widths == sorted(widths)


def test_occupancy_invariant_above_floor():
    # expected bucket n / 2^bits <= target whenever the cap isn't hit
    for n in (4001, 10**4, 10**6, 10**9, 10**12, 250 * 2**14):
        bits = _lsh_bits(n)
        if bits < 62:
            assert n / 2**bits <= _LSH_TARGET_BUCKET
