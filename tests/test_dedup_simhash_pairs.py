"""SimHash hamming-band pair-join property tests on synthetic corpora.

The DuckDB oracle replays the SAME banding SQL, so it can confirm the
two engines agree but not that the banding itself is correct. These
tests check the claims the oracle can't:

  * completeness (pigeonhole): fingerprints within hamming distance 3
    of each other MUST share at least one of the 4 byte bands, so the
    banded join must find EVERY such pair a brute-force O(N²) hamming
    scan finds;
  * exactness: reported hamming distances equal the brute-force
    popcount of the fingerprint XOR, and no pair above the threshold
    leaks through.
"""

from __future__ import annotations

import itertools
import random

from nchu_bigdata_spark.operators.dedup import _simhash_fp, simhash_pairs

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _corpus(rng: random.Random, n_docs: int = 40) -> list[tuple[int, str]]:
    """Clustered synthetic corpus: a few base docs, many light mutations
    of them (near-dups land within small hamming distances), plus
    unrelated random docs."""
    docs = []
    bases = [
        [rng.choice(_WORDS) for _ in range(30)] for _ in range(4)
    ]
    for i in range(n_docs):
        if i % 4 == 3:  # unrelated doc
            toks = [rng.choice(_WORDS) for _ in range(30)]
        else:  # mutate a base: swap 0-3 positions
            toks = list(bases[i % 4])
            for _ in range(rng.randint(0, 3)):
                toks[rng.randrange(len(toks))] = rng.choice(_WORDS)
        docs.append((i, " ".join(toks)))
    return docs


def _brute_pairs(fps: dict[int, int], max_hamming: int) -> dict[tuple[int, int], int]:
    out = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= max_hamming:
            out[(a, b)] = h
    return out


def test_banded_join_finds_every_brute_force_pair(spark):
    rng = random.Random(20260813)
    docs = spark.createDataFrame(_corpus(rng), "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in _simhash_fp(docs).collect()}
    expected = _brute_pairs(fps, max_hamming=3)
    got = {
        (r.doc_a, r.doc_b): r.hamming for r in simhash_pairs(docs).collect()
    }
    assert got == expected
    assert expected, "degenerate test: no near-dup pairs generated"


def test_wider_threshold_is_within_band_recall_only(spark):
    # Above hamming 3 the pigeonhole guarantee ends: the banded join may
    # MISS pairs (that's the LSH recall trade) but must never invent one
    # or misreport a distance.
    rng = random.Random(7)
    docs = spark.createDataFrame(_corpus(rng), "doc_id long, text string")
    fps = {r.doc_id: r.simhash for r in _simhash_fp(docs).collect()}
    brute = _brute_pairs(fps, max_hamming=8)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, max_hamming=8).collect()
    }
    assert set(got) <= set(brute)
    assert all(brute[p] == h for p, h in got.items())
    # ...and the guaranteed region is still complete
    assert {p for p, h in brute.items() if h <= 3} <= set(got)
