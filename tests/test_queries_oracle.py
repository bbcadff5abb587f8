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
