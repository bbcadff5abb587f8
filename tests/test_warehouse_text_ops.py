"""Semantics unit tests for the warehouse temporal operators
(scd2_history, join_interval_overlap) and the corpus-statistics text
operators (text_collocation_pmi, text_bpe_pairs) born this round.

The registry-wide oracle differential already proves Spark and DuckDB
agree on the synthetic corpus; these pin WHAT they agree on with
hand-computable fixtures, including the branches the corpus never
exercises: SCD-2 date ties, the 3-calendar-month interval bin case
(a 30-day window containing all of February), exact window-boundary
exclusion, repeated-pair BPE counting, and the PMI formula itself
against an independent Python replay.
"""

from __future__ import annotations

import math
from collections import Counter
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nchu_bigdata_spark.registry import load_all_queries

SPECS = load_all_queries()


def _write_orders(path, rows):
    """rows: (o_orderkey, o_custkey, 'YYYY-MM-DD', totalprice)."""
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([float(r[3]) for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [datetime.fromisoformat(r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(["5-LOW"] * len(rows)),
            }
        ),
        str(path / "orders.parquet"),
    )


def _write_documents(path, texts):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src0"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int32()),
            }
        ),
        str(path / "documents.parquet"),
    )


# --------------------------------------------------------------------------
# scd2_history
# --------------------------------------------------------------------------


def test_scd2_versions_ranges_and_tie_break(spark, tmp_path):
    _write_orders(
        tmp_path,
        [
            # customer 1: three changes, the first two on the SAME date
            # (tie must break on o_orderkey: 11 before 12)
            (12, 1, "2024-01-05", 20.0),
            (11, 1, "2024-01-05", 10.0),
            (13, 1, "2024-03-01", 30.0),
            # customer 2: single order -> one current version
            (21, 2, "2024-02-02", 99.0),
        ],
    )
    rows = SPECS["scd2_history"].fn(spark, str(tmp_path)).collect()
    by_key = {r.o_orderkey: r for r in rows}

    assert [by_key[k].version for k in (11, 12, 13)] == [1, 2, 3]
    # ranges chain: each valid_to equals the next version's valid_from
    assert by_key[11].valid_from == "2024-01-05"
    assert by_key[11].valid_to == "2024-01-05"  # tie: zero-length range
    assert by_key[12].valid_to == "2024-03-01"
    assert by_key[13].valid_to is None and by_key[13].is_current
    # exactly one current row per customer
    cur = [r for r in rows if r.is_current]
    assert sorted(r.o_custkey for r in cur) == [1, 2]
    assert by_key[21].version == 1 and by_key[21].valid_from == "2024-02-02"


# --------------------------------------------------------------------------
# join_interval_overlap
# --------------------------------------------------------------------------


def test_interval_overlap_bins_and_boundaries(spark, tmp_path):
    _write_orders(
        tmp_path,
        [
            # customer 1: window of order 1 is [Jan 31, Mar 1) and spans
            # THREE calendar months (contains all of February 2023) —
            # the widest bin case the explode must cover
            (1, 1, "2023-01-31", 1.0),
            (2, 1, "2023-03-01", 1.0),  # last day INSIDE order 1's window? no:
            # Jan 31 + 30d = Mar 2, so Mar 1 is the final included day
            (3, 1, "2023-03-02", 1.0),  # exactly start+30d -> EXCLUDED
            # customer 2: same-date pair counts in BOTH directions
            (4, 2, "2023-06-10", 1.0),
            (5, 2, "2023-06-10", 1.0),
            # customer 3: same dates as customer 2 but must never pair
            # across customers
            (6, 3, "2023-06-10", 1.0),
        ],
    )
    got = {
        r.c_custkey: r.n_overlaps
        for r in SPECS["join_interval_overlap"].fn(spark, str(tmp_path)).collect()
    }
    # cust 1: 1->2 (Mar 1 inside [Jan 31, Mar 2)) and 2->3 (Mar 2
    # inside [Mar 1, Mar 31)); 1->3 excluded (boundary), backwards
    # pairs excluded (point before interval start)
    assert got.get(1) == 2
    # cust 2: (4,5) and (5,4) both qualify
    assert got.get(2) == 2
    # cust 3 has no partner; zero-count groups don't emit
    assert 3 not in got


def test_interval_overlap_matches_bruteforce(spark, tmp_path):
    # Deterministic pseudo-random fixture, checked against an O(n^2)
    # Python replay — independent of both engines' join machinery.
    rows = []
    k = 0
    for cust in range(1, 6):
        for i in range(12):
            day = 1 + (cust * 7 + i * 13) % 28
            month = 1 + (cust + i * 5) % 12
            rows.append((k, cust, f"2023-{month:02d}-{day:02d}", 1.0))
            k += 1
    _write_orders(tmp_path, rows)

    dates = {r[0]: datetime.fromisoformat(r[2]) for r in rows}
    expect: Counter[int] = Counter()
    for i, ci, di, _ in rows:
        for j, cj, dj, _ in rows:
            if i != j and ci == cj:
                delta = (dates[j] - dates[i]).days
                if 0 <= delta < 30:
                    expect[ci] += 1
    got = {
        r.c_custkey: r.n_overlaps
        for r in SPECS["join_interval_overlap"].fn(spark, str(tmp_path)).collect()
    }
    assert got == dict(expect)


# --------------------------------------------------------------------------
# text_bpe_pairs
# --------------------------------------------------------------------------


def test_bpe_pairs_weighted_and_repeated(spark, tmp_path):
    # vocab: "aaa" (freq 2), "bb" (freq 1), "a" (len<2, ignored)
    _write_documents(tmp_path, ["aaa bb aaa", "a"])
    rows = SPECS["text_bpe_pairs"].fn(spark, str(tmp_path)).collect()
    got = {r.pair: (r.n, r.n_types) for r in rows}
    # "aaa" contributes pair "aa" at TWO positions, weighted by freq 2
    assert got == {"aa": (4, 1), "bb": (1, 1)}


# --------------------------------------------------------------------------
# text_collocation_pmi
# --------------------------------------------------------------------------


def test_collocation_pmi_formula_replay(spark, tmp_path):
    # "alpha beta" always co-occurs (12 docs, above the support cutoff);
    # "the end" also repeats 12 times but "the" is diluted by 12 extra
    # solo occurrences, so its PMI must come out LOWER than alpha/beta's.
    texts = ["alpha beta"] * 12 + ["the end"] * 12 + ["the"] * 12
    _write_documents(tmp_path, texts)
    rows = SPECS["text_collocation_pmi"].fn(spark, str(tmp_path)).collect()
    got = {(r.l_tok, r.r_tok): (r.n_pair, r.c_l, r.c_r, r.lift) for r in rows}

    # independent replay of the formula (lift = exp(pmi); the operator
    # emits lift from exact integer products so it's bit-checkable —
    # float(num)/float(den) below is the same IEEE division)
    uni = Counter(w for t in texts for w in t.split(" "))
    n_t = sum(uni.values())
    bg = Counter(
        (ws[i], ws[i + 1])
        for t in texts
        for ws in [t.split(" ")]
        for i in range(len(ws) - 1)
    )
    n_b = sum(bg.values())

    def lift(pair):
        c = bg[pair]
        return float(c * n_t * n_t) / float(n_b * uni[pair[0]] * uni[pair[1]])

    assert got[("alpha", "beta")] == (12, 12, 12, lift(("alpha", "beta")))
    assert got[("the", "end")] == (12, 24, 12, lift(("the", "end")))
    assert got[("alpha", "beta")][3] > got[("the", "end")][3]
    # pmi = ln(lift) stays monotone-derivable from the output
    assert math.log(got[("alpha", "beta")][3]) > math.log(got[("the", "end")][3])


def test_collocation_pmi_support_cutoff(spark, tmp_path):
    # 9 occurrences < the support cutoff of 10 -> no output rows
    _write_documents(tmp_path, ["rare pair"] * 9)
    assert SPECS["text_collocation_pmi"].fn(spark, str(tmp_path)).count() == 0


# --------------------------------------------------------------------------
# tpch composites — fixture edge semantics the sf corpus can't pin
# --------------------------------------------------------------------------


def test_tpch_q12_lateness_residual(spark, tmp_path):
    # the ship-after-order predicate is a cross-table residual; a line
    # shipped BEFORE its order date must be excluded even inside the
    # ship-year range
    _write_orders(
        tmp_path,
        [
            (1, 1, "1997-06-01", 10.0),
            (2, 1, "1997-06-01", 10.0),
        ],
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], pa.int64()),
                "l_partkey": pa.array([1, 1], pa.int64()),
                "l_suppkey": pa.array([1, 1], pa.int64()),
                "l_linenumber": pa.array([1, 1], pa.int32()),
                "l_quantity": pa.array([1.0, 1.0], pa.float64()),
                "l_extendedprice": pa.array([1.0, 1.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.0], pa.float64()),
                "l_tax": pa.array([0.0, 0.0], pa.float64()),
                "l_returnflag": pa.array(["N", "N"]),
                "l_linestatus": pa.array(["O", "O"]),
                "l_shipdate": pa.array(
                    [datetime(1997, 6, 15), datetime(1997, 5, 20)],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    rows = SPECS["tpch_q12"].fn(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    # only order 1's line ships after its order date; priority 5-LOW
    assert (r.ship_class, r.high_line_count, r.low_line_count) == ("O", 0, 1)


# --------------------------------------------------------------------------
# text_compression_ratio — exact zlib replay + monotonicity
# --------------------------------------------------------------------------


def test_compression_ratio_exact_replay(spark, tmp_path):
    import zlib

    prose = (
        "compression behaves differently on natural language because "
        "letter frequencies and common digraphs give the encoder short "
        "codes while sentence structure repeats only loosely across a "
        "paragraph of ordinary descriptive writing"
    )
    # genuinely high-entropy printable text (chained sha256 bytes; a
    # polynomial-mod generator is periodic and compresses to ~0.25)
    import hashlib

    chunks, seed = [], b"entropy"
    while sum(len(c) for c in chunks) < 220:
        seed = hashlib.sha256(seed).digest()
        chunks.append("".join(chr(33 + b % 94) for b in seed))
    noise = "".join(chunks)[:220]
    texts = [
        "spam " * 200,  # highly repetitive
        prose,          # ordinary language (mid ratio)
        noise,          # pseudo-random printable (near-incompressible)
        "",             # empty (clip guard)
    ]
    _write_documents(tmp_path, texts)
    rows = SPECS["text_compression_ratio"].fn(spark, str(tmp_path)).collect()
    got = {r.doc_id: r for r in rows}
    for i, t in enumerate(texts):
        raw = t.encode("utf-8")
        comp = zlib.compress(raw, 6)
        r = got[i]
        assert (r.raw_len, r.comp_len) == (len(raw), len(comp)), i
        assert r.ratio_bp == len(comp) * 10_000 // max(len(raw), 1), i
    # monotonicity: repetitive < prose < noise
    assert got[0].ratio_bp < got[1].ratio_bp < got[2].ratio_bp
    assert got[0].flag_boilerplate and not got[2].flag_boilerplate


def test_percentile_exact_interpolation(spark, tmp_path):
    # 4 known values -> p50 must interpolate (PERCENTILE_CONT), not
    # pick a nearest-rank value
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["A"] * 4),
                "l_quantity": pa.array([1.0, 2.0, 3.0, 10.0], pa.float64()),
                "l_extendedprice": pa.array([1.0, 1.0, 1.0, 1.0], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    r = SPECS["agg_percentile_exact"].fn(spark, str(tmp_path)).collect()[0]
    assert r.p50_qty == 2.5          # (2+3)/2
    assert r.p95_qty == 8.95         # 3 + 0.85*(10-3) at rank 2.85
    assert r.p50_price == 1.0


def test_interval_overlap_non_midnight_timestamps(spark, tmp_path):
    """Review-finding regression: a window starting at 23:00 admits
    points up to start+30d (exclusive) — one calendar month past
    month(start+29d). The bin explode must reach that month."""
    _write_orders(
        tmp_path,
        [
            (1, 1, "2023-01-30T23:00:00", 1.0),
            # inside [Jan 30 23:00, Mar 1 23:00): must be found, and its
            # month (March) is beyond month(start + 29d) = February
            (2, 1, "2023-03-01T10:00:00", 1.0),
            # exactly start+30d -> excluded (half-open)
            (3, 1, "2023-03-01T23:00:00", 1.0),
        ],
    )
    got = {
        r.c_custkey: r.n_overlaps
        for r in SPECS["join_interval_overlap"].fn(spark, str(tmp_path)).collect()
    }
    # pairs: 1->2 only... plus 2->3 (Mar 1 23:00 inside [Mar 1 10:00, +30d))
    assert got == {1: 2}
