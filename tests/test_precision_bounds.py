"""Float-precision envelope guards (round 9 ADVICE refresh).

The repo's exactness policy derives cross-engine-comparable doubles
from IDENTICAL integers via correctly-rounded IEEE ops. That chain has
one soft link: DuckDB's HUGEINT→DOUBLE cast is NOT correctly rounded
(the round-7 finding), so any oracle that casts an exact integer
product to DOUBLE is bit-stable only while the product stays below
2^53 (where every int64 is exactly representable and no rounding
happens at all). These tests pin the envelope at the test scale
factors: if a future data bump pushes a product past 2^53, the guard
fails loudly HERE instead of surfacing as a 1-ulp oracle flake.

At production scale the documented path is the scaled-integer export
(quotient/remainder split) — see the operator docstrings.
"""

from __future__ import annotations

TWO53 = 2**53


def test_pmi_lift_products_within_exact_double_range(duck):
    """text_collocation_pmi: lift = c·n² / (nb·cl·cr) as one IEEE
    division of integer products. Both products must sit below 2^53
    for the doubles to be bit-identical across engines (sf0.1 holds
    ~340× headroom on the numerator; sf1 would cross the line —
    switch to the scaled-integer lift before bumping the gate SF)."""
    num, den = duck.execute(
        """
        WITH tok AS (
            SELECT string_split(text, ' ') AS w FROM documents
        ),
        uni AS (
            SELECT word, COUNT(*) AS c
            FROM (SELECT unnest(w) AS word FROM tok)
            WHERE word <> '' GROUP BY word
        ),
        nt AS (SELECT SUM(c) AS n FROM uni),
        bg AS (
            SELECT w[i] AS l, w[i + 1] AS r
            FROM tok, unnest(range(1, len(w))) AS t(i)
        ),
        bgc AS (
            SELECT l, r, COUNT(*) AS c FROM bg
            WHERE l <> '' AND r <> '' GROUP BY l, r
        ),
        nb AS (SELECT SUM(c) AS n FROM bgc)
        SELECT MAX(CAST(b.c AS HUGEINT) * nt.n * nt.n),
               MAX(CAST(nb.n AS HUGEINT) * ul.c * ur.c)
        FROM bgc b, nt, nb
        JOIN uni ul ON ul.word = b.l
        JOIN uni ur ON ur.word = b.r
        WHERE b.c >= 10
        """
    ).fetchone()
    assert int(num) < TWO53, f"PMI lift numerator {num} >= 2^53"
    assert int(den) < TWO53, f"PMI lift denominator {den} >= 2^53"


def test_embed_drift_shift_within_exact_double_range(duck):
    """dq_embed_drift: shift_num = |s1·n2 − s2·n1| over milli-quantized
    (×1000) per-dimension sums. With |x| ≲ 1, exact through ~3e6 rows
    per half (1000·n·n < 2^53); the 2k-row fixture holds ~6 orders of
    headroom. Mirrors the operator's own quantization (_ED_SCALE)."""
    mx = duck.execute(
        """
        WITH q AS (
            SELECT vec_id % 2 AS half, d,
                   CAST(round(x * 1000) AS BIGINT) AS qx
            FROM (
                SELECT vec_id,
                       unnest(embedding::DOUBLE[]) AS x,
                       unnest(range(len(embedding))) AS d
                FROM embeddings
            )
        ),
        s AS (
            SELECT d,
                   SUM(CASE WHEN half = 0 THEN qx ELSE 0 END) AS s1,
                   SUM(CASE WHEN half = 1 THEN qx ELSE 0 END) AS s2,
                   SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n1,
                   SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n2
            FROM q GROUP BY d
        )
        SELECT MAX(ABS(CAST(s1 AS HUGEINT) * n2
                       - CAST(s2 AS HUGEINT) * n1))
        FROM s
        """
    ).fetchone()[0]
    assert int(mx) < TWO53, f"embed drift shift_num {mx} >= 2^53"
