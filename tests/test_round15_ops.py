"""Round-15 optimization tests: the scan-split estimator must replay
Spark's real partitioning (VERDICT r14 items 6+7) and survive non-local
schemes without the full-plan probe."""

from __future__ import annotations

import os

from nchu_bigdata_spark.io import (
    TABLES,
    _list_data_file_sizes,
    _scan_splits_estimate,
)

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def test_scan_splits_estimate_matches_actual_everywhere(spark):
    """estimate == spark.read.parquet(path).rdd.getNumPartitions() for
    EVERY testdata table at two SFs (VERDICT r14 item 6): the estimate
    replays FilePartition's maxSplitBytes + bin-packing exactly, so the
    parallel_table branch decision can never drift from what the scan
    would actually do."""
    for sf_dir in SF_DIRS:
        for name in TABLES:
            path = f"{sf_dir}/{name}.parquet"
            est = _scan_splits_estimate(spark, path)
            actual = spark.read.parquet(path).rdd.getNumPartitions()
            assert est == actual, (name, sf_dir, est, actual)


def test_scan_splits_estimate_nonlocal_scheme_no_rdd_probe(spark):
    """A non-``file:`` scheme routes through the Hadoop FileSystem
    listing (VERDICT r14 item 7), not a full plan + RDD conversion:
    mount the testdata dir into a ViewFileSystem table and demand the
    same listing and estimate as the local-FS path gives."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set(
        "fs.viewfs.mounttable.r15mock.link./data",
        "file:/root/testdata/sf0.01",
    )
    try:
        local = "/root/testdata/sf0.01/lineitem.parquet"
        mock = "viewfs://r15mock/data/lineitem.parquet"
        assert not os.path.isdir(mock) and not os.path.isfile(mock)
        assert sorted(_list_data_file_sizes(spark, mock)) == sorted(
            _list_data_file_sizes(spark, local)
        )
        assert _scan_splits_estimate(spark, mock) == _scan_splits_estimate(
            spark, local
        )
    finally:
        hconf.unset("fs.viewfs.mounttable.r15mock.link./data")


def test_scan_splits_estimate_partitioned_layout(spark, tmp_path):
    """One-level partition-directory recursion (ADVICE r14): a
    mo=…/part-*.parquet layout must estimate from the leaf files (the
    pre-r15 top-level listing saw only directories and returned 0,
    forcing an unconditional repartition)."""
    out = str(tmp_path / "hive_layout")
    spark.range(50_000).selectExpr(
        "id", "id % 3 AS mo"
    ).write.partitionBy("mo").mode("overwrite").parquet(out)
    est = _scan_splits_estimate(spark, out)
    actual = spark.read.parquet(out).rdd.getNumPartitions()
    assert est == actual, (est, actual)


def test_scan_splits_estimate_missing_path_returns_zero(spark):
    assert _scan_splits_estimate(spark, "/root/testdata/nope.parquet") == 0


def test_scan_splits_estimate_many_small_files(spark, tmp_path):
    """Bin-packing parity on the exact shape the old per-file ceil
    formula overcounted: many files far smaller than openCost pack
    ~32-to-a-split (128 MB / 4 MB), not one partition per file."""
    out = str(tmp_path / "many_small")
    spark.range(40).repartition(40).write.mode("overwrite").parquet(out)
    est = _scan_splits_estimate(spark, out)
    actual = spark.read.parquet(out).rdd.getNumPartitions()
    assert est == actual, (est, actual)
