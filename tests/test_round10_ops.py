"""Round-10-born operators: sink_compaction packing invariants."""

from __future__ import annotations

from nchu_bigdata_spark.registry import load_all_queries


def test_sink_compaction_packing_invariants(spark, sf_dir):
    """Capacity-bucket packing contract: every (lang, bucket) file
    lands wholly in one group, group ids are dense-from-zero per lang
    in bucket order, and no group's row total overshoots the target by
    a full file or more (the documented < max-file bound)."""
    specs = load_all_queries()
    rows = specs["sink_compaction"].fn(spark, sf_dir).collect()
    assert rows
    from nchu_bigdata_spark.queries.relational import (
        _COMPACT_BUCKETS,
        _COMPACT_TARGET_ROWS,
    )

    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    total_files = 0
    for lang, grp in by_lang.items():
        grp.sort(key=lambda r: r["cgroup"])
        # dense group ids from 0 (capacity buckets over a contiguous
        # cumulative axis can skip ids only if a single file exceeds
        # the target; then the skip is exactly that file's span)
        assert grp[0]["cgroup"] == 0, lang
        for r in grp:
            total_files += r["n_files"]
            assert r["n_files"] >= 1 and r["n_rows"] >= r["max_file_rows"]
            # overshoot bound: group start < (cgroup+1)*target, so
            # total < that boundary + max_file_rows
            assert r["n_rows"] < _COMPACT_TARGET_ROWS + r["max_file_rows"] or (
                r["n_files"] == 1
            ), (lang, dict(r.asDict()))
    # every non-empty (lang, doc_id % 16) bucket became exactly one file
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F

    n_buckets = (
        docs.select("lang", (F.col("doc_id") % _COMPACT_BUCKETS).alias("b"))
        .distinct()
        .count()
    )
    assert total_files == n_buckets
