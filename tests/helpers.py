"""Oracle-differential comparison used across the test suite — the same
canonicalization as tools/check_oracle.py (strict multiset equality,
stricter than the driver's hash)."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, Decimal):
        return f"dec:{v.normalize():f}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def assert_df_matches_oracle(sdf, duck, oracle_sql: str, name: str = "query"):
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = duck.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"{name}: row count differs: spark={len(srows)} oracle={len(orows)}"
    )
    cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:5]
        raise AssertionError(f"{name}: values differ; first diffs: {diffs}")
