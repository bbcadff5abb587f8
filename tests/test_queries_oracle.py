"""Differential test: every registered query with an oracle must match
DuckDB exactly (strict multiset equality — stricter than the driver's
value hash). Rows-only queries must at least run and return a stable
schema."""

from __future__ import annotations

import pytest

from nchu_bigdata_spark.registry import load_all_queries

from tests.helpers import assert_df_matches_oracle

SPECS = load_all_queries()
ORACLE_IDS = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_IDS = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLE_IDS)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    assert_df_matches_oracle(sdf, duck, spec.oracle, name)


@pytest.mark.parametrize("name", ROWS_ONLY_IDS)
def test_rows_only_query_runs(name, spark, sf_dir):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    n = df.count()
    assert n >= 0


def test_agg_approx_within_documented_bounds(spark, sf_dir):
    """agg_approx is rows-only at the driver (sketches aren't
    SQL-reproducible), so back it with a real accuracy bound here:

    * ``approx_count_distinct(rsd=0.02)`` (HLL++): relative error vs
      the exact distinct count within 5×rsd (±5 standard deviations —
      far beyond any realistic flake rate).
    * ``percentile_approx(q, accuracy=10000)`` (KLL-style): the
      returned value's RANK in the sorted group is within
      ``n/accuracy`` (+1 slack) of ``q*n`` — the algorithm's documented
      guarantee, checked as rank error, not value error.
    """
    import bisect

    from pyspark.sql import functions as F

    from nchu_bigdata_spark.io import table

    got = {r["l_returnflag"]: r for r in SPECS["agg_approx"].fn(spark, sf_dir).collect()}
    li = table(spark, sf_dir, "lineitem")
    exact_counts = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    prices = {
        r["l_returnflag"]: sorted(r["vs"])
        for r in li.groupBy("l_returnflag")
        .agg(F.collect_list("l_extendedprice").alias("vs"))
        .collect()
    }
    assert set(got) == set(exact_counts)
    for flag, row in got.items():
        exact = exact_counts[flag]
        assert abs(row["approx_orders"] - exact) <= max(1, 5 * 0.02 * exact), (
            flag,
            row["approx_orders"],
            exact,
        )
        vs = prices[flag]
        n = len(vs)
        tol = n / 10000 + 1
        for q, col in ((0.25, "price_p25"), (0.5, "price_p50"), (0.75, "price_p75")):
            v = row[col]
            # rank range the value occupies in the sorted data
            lo = bisect.bisect_left(vs, v)
            hi = bisect.bisect_right(vs, v)
            assert lo - tol <= q * n <= hi + tol, (flag, col, v, lo, hi, q * n)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_contract_shape():
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 1


def test_queries_immune_to_caller_session_defaults(spark, sf_dir):
    """Registered queries pin UTC/ANSI-off/Arrow-on at invocation
    (registry.final_fn), so a caller session with hostile defaults —
    Spark 4 ships ANSI on; a driver box may sit in any timezone — must
    produce byte-identical results to the engine's own session. fn_date
    is the most TZ-sensitive query (to_date/year/dayofweek buckets);
    agg_hash covers decimal aggregation under ANSI."""
    from tests.helpers import canon_rows

    hostile = spark.newSession()
    hostile.conf.set("spark.sql.ansi.enabled", "true")
    hostile.conf.set("spark.sql.session.timeZone", "Asia/Taipei")
    for name in ("fn_date", "agg_hash"):
        base = SPECS[name].fn(spark, sf_dir)
        other = SPECS[name].fn(hostile, sf_dir)
        rows_a = canon_rows(base.columns, [tuple(r) for r in base.collect()])
        rows_b = canon_rows(other.columns, [tuple(r) for r in other.collect()])
        assert rows_a == rows_b, name


def test_driver_order_covers_registry_exactly():
    """DRIVER_ORDER is the driver's presentation order; a typo'd or
    missing id would silently fall to alphabetical append (or worse,
    shrink the checked window). Enforce the 1:1 correspondence."""
    from nchu_bigdata_spark.registry import DRIVER_ORDER

    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER)), "duplicate ids"
    assert set(DRIVER_ORDER) == set(SPECS), set(DRIVER_ORDER) ^ set(SPECS)
