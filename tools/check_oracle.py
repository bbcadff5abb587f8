"""Local differential checker — mirrors the driver's correctness gate.

Runs every registered query's Spark implementation AND its DuckDB oracle
at a given sf dir, compares row-count + column names + order-insensitive
canonicalized values (stricter than a hash: full multiset equality).

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

from nchu_bigdata_spark.io import TABLES
from nchu_bigdata_spark.registry import load_all_queries
from nchu_bigdata_spark.session import get_session


def canon(v):
    """Canonical, engine-independent string form of one value."""
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


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def compare(name: str, spark, con, sf_dir: str, spec) -> tuple[bool, str]:
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    res = con.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    cs, co = canon_rows(scols, srows), canon_rows(ocols, orows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"{len(srows)} rows"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    specs = load_all_queries()
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failed, skipped = [], []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        if spec.oracle is None:
            # rows-only: just materialize and require a stable schema
            t0 = time.time()
            n = spec.fn(spark, sf_dir).count()
            print(f"  ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
            skipped.append(name)
            continue
        t0 = time.time()
        try:
            ok, msg = compare(name, spark, con, sf_dir, spec)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        status = "OK" if ok else "FAIL"
        print(f"  {status} {name}: {msg} ({time.time()-t0:.1f}s)")
        if not ok:
            failed.append(name)
    print(
        f"\n{len(specs) - len(failed) - len(skipped)} ok, "
        f"{len(failed)} failed, {len(skipped)} rows-only"
    )
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
