"""Reference golden parity for the K-means module (SURVEY.md §5.2).

Fixtures are verbatim copies of the reference's own inputs and committed
golden outputs (data files, not code):
  pm25.txt                    input, 365 days × 24 hourly PM2.5 readings
  pm25.cluster.center.conf.txt  initial k=4 centers (4 actual days)
  golden_centers.txt          final centroids after 5 iterations
                              (pm25.cluster.center.conf.txt.hdfs)
  golden_assignments.txt      final per-row cluster ids
                              (kmeans.hdfs/part-r-00000; sizes 36/73/137/119)

Run config mirrors the reference exactly: k=4, metric = squared
Euclidean on abs() of both operands (src/Kmeans.java:66-70), 0-as-missing
kept as real zeros, fixed 5 iterations with no convergence stop (the
short-circuit is commented out at src/Kmeans.java:254-257), then one
labeling pass. Cluster ids are 1-based (src/Kmeans.java:79).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nchu_bigdata_spark.operators import kmeans

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

PM25_SCHEMA = T.StructType(
    [T.StructField("obs_date", T.StringType()),
     T.StructField("station", T.StringType()),
     T.StructField("pollutant", T.StringType())]
    + [T.StructField(f"h{i}", T.DoubleType()) for i in range(24)]
)


def _load_pm25(spark):
    df = spark.read.schema(PM25_SCHEMA).csv(os.path.join(FIXTURES, "pm25.txt"))
    return df.withColumn("features", F.array(*[f"h{i}" for i in range(24)]))


def _parse_centers_file(path: str) -> list[list[float]]:
    centers = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            fields = line.split(",")
            centers.append([float(x) for x in fields[3:]])
    return centers


def _parse_golden_centers() -> list[tuple[str, list[float]]]:
    out = []
    with open(os.path.join(FIXTURES, "golden_centers.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            fields = line.split(",")
            out.append((fields[0], [float(x) for x in fields[3:]]))
    return out


def _parse_golden_assignments() -> dict[str, int]:
    """date -> golden cluster id (1..4)."""
    out = {}
    with open(
        os.path.join(FIXTURES, "golden_assignments.txt"), encoding="utf-8"
    ) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cluster, row = line.split("\t")
            out[row.split(",")[0]] = int(cluster)
    return out


@pytest.fixture(scope="module")
def pm25_fit(spark):
    df = _load_pm25(spark)
    init = _parse_centers_file(
        os.path.join(FIXTURES, "pm25.cluster.center.conf.txt")
    )
    assert len(init) == 4 and all(len(c) == 24 for c in init)
    res = kmeans.fit(
        df, init, feature_col="features", metric="sq_euclidean_abs",
        max_iter=5, tol=None,
    )
    labeled = kmeans.label(df, res.centers, "features", "sq_euclidean_abs")
    return res, labeled


def test_cluster_sizes_match_golden(pm25_fit):
    _, labeled = pm25_fit
    sizes = {
        r["cluster"]: r["n"]
        for r in labeled.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sizes == {1: 36, 2: 73, 3: 137, 4: 119}


def test_per_row_assignments_match_golden(pm25_fit):
    _, labeled = pm25_fit
    golden = _parse_golden_assignments()
    ours = {
        r["obs_date"]: r["cluster"]
        for r in labeled.select("obs_date", "cluster").collect()
    }
    assert len(ours) == 365
    mismatches = {d: (c, golden[d]) for d, c in ours.items() if golden[d] != c}
    assert not mismatches, f"{len(mismatches)} rows diverge: {mismatches}"


def test_final_centroids_match_golden(pm25_fit):
    res, _ = pm25_fit
    golden = _parse_golden_centers()
    assert len(golden) == 4
    # Golden lines are emitted per reducer key (cluster 1..4 in order).
    for idx, (_, gvec) in enumerate(golden):
        ours = res.centers[idx]
        for j, (a, b) in enumerate(zip(ours, gvec)):
            assert a == pytest.approx(b, rel=1e-9), (
                f"centroid {idx + 1} dim {j}: {a} != {b}"
            )


def test_representative_day_divergence_documented(pm25_fit):
    """Ref A11 (src/Kmeans.java:114-130) picks the member day labeling
    each centroid, but its running-min update is missing (:125-127), so
    the golden labels are just each cluster's LAST reducer row. We
    implement the CORRECT argmin; this test pins both: our argmin is a
    true minimizer, and the documented golden labels exist in the right
    cluster (accepted divergence, SURVEY.md §7)."""
    res, labeled = pm25_fit
    golden = _parse_golden_centers()
    golden_assign = _parse_golden_assignments()
    from nchu_bigdata_spark.operators.vectors import sq_euclidean_abs

    centers_arr = {
        i + 1: c for i, c in enumerate(res.centers)
    }
    for cluster_id, (gdate, _) in enumerate(golden, start=1):
        # the buggy golden label still belongs to that cluster
        assert golden_assign[gdate] == cluster_id
        # our correct representative: true argmin of distance to centroid
        c = centers_arr[cluster_id]
        lit_center = F.array(*[F.lit(float(v)) for v in c])
        member = (
            labeled.filter(F.col("cluster") == cluster_id)
            .withColumn(
                "d",
                sq_euclidean_abs(
                    F.transform("features", lambda x: x.cast("double")),
                    lit_center,
                ),
            )
            .orderBy("d", "obs_date")
            .select("obs_date", "d")
            .first()
        )
        # sanity: the true argmin distance is <= the golden label's distance
        gd = (
            labeled.filter(F.col("obs_date") == gdate)
            .withColumn(
                "d",
                sq_euclidean_abs(
                    F.transform("features", lambda x: x.cast("double")),
                    lit_center,
                ),
            )
            .select("d")
            .first()["d"]
        )
        assert member["d"] <= gd


def _draft_subset(spark):
    """The draft variant's input: the first 34 rows of pm25.txt with the
    date/station/label prefix stripped (the draft's ``textToArray``
    parses every comma field as a double, ``Kmeans/kmeans.java:193-204``,
    so its input must be pure numeric CSV). Verified: each vector in the
    committed draft golden (``Kmeans/output/part-r-00000``) is exactly
    the value part of pm25.txt rows 1-34."""
    rows = []
    with open(os.path.join(FIXTURES, "pm25.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            value_part = line.split(",", 3)[3]  # verbatim numeric CSV
            rows.append((value_part, [float(x) for x in value_part.split(",")]))
            if len(rows) == 34:
                break
    return spark.createDataFrame(rows, "line string, features array<double>")


def _parse_draft_golden() -> dict[str, int]:
    out = {}
    with open(
        os.path.join(FIXTURES, "golden_draft_labels.txt"), encoding="utf-8"
    ) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            cluster, row = line.split("\t")
            out[row.strip()] = int(cluster)
    return out


def test_draft_variant_assignments_match_golden(spark):
    """Draft-variant golden parity (``Kmeans/output/part-r-00000``):
    34-row pm25 subset, k=4, normalized-squared metric
    (``Kmeans/kmeans.java:59-71``), iterate to exact convergence
    (``kmeans.java:221-224``), then label. Expected sizes 8/8/14/4 and
    all 34 per-row labels.

    Seeds: the draft OVERWRITES its center file in place each epoch
    (``kmeans.java:228-248``), so the committed conf files hold a
    different run's state and the golden's seed file is not in the repo.
    The seeds used here — input rows 1, 16, 27, 33 (1-based) — were
    recovered by exhaustive search over all C(34,4) seed choices as the
    (unique found) set for which the draft algorithm converges to the
    golden labeling exactly; with them, parity is exact on all 34 rows,
    not just on cluster sizes."""
    pts = _draft_subset(spark)
    rows = [
        (r["line"], [float(x) for x in r["line"].split(",")])
        for r in pts.select("line").collect()
    ]
    assert len(rows) == 34
    seeds = [rows[i][1] for i in (0, 15, 26, 32)]

    res = kmeans.fit(
        pts, seeds, feature_col="features", metric="normalized_sq",
        max_iter=30, tol=0.0,
    )
    labeled = kmeans.label(pts, res.centers, "features", "normalized_sq")
    ours = {
        r["line"]: r["cluster"]
        for r in labeled.select("line", "cluster").collect()
    }
    golden = _parse_draft_golden()
    assert len(ours) == 34
    sizes: dict[int, int] = {}
    for c in ours.values():
        sizes[c] = sizes.get(c, 0) + 1
    assert sizes == {1: 8, 2: 8, 3: 14, 4: 4}
    mismatches = {
        line: (c, golden[line]) for line, c in ours.items() if golden[line] != c
    }
    assert not mismatches, f"{len(mismatches)} rows diverge: {mismatches}"


def test_cli_reproduces_reference_run(spark, tmp_path):
    """Round-trip the CLI (`python -m nchu_bigdata_spark.kmeans`,
    mirroring ``README.md:21``: data centers out 5) against BOTH
    committed goldens:

    * assignments/part-* == ``kmeans.hdfs/part-r-00000`` — exact line
      multiset (``cluster\\t<original row>``);
    * centers.txt numeric text == ``pm25.cluster.center.conf.txt.hdfs``
      **byte-for-byte** (the deterministic final-iteration fold
      reproduces the reference reducer's summation order; Java
      ``Double.toString`` ≡ Python ``repr`` shortest round-trip).
      The representative DATE field is the documented A11 divergence
      (the reference's argmin never updates its running min,
      ``src/Kmeans.java:125-127``) and is excluded."""
    from nchu_bigdata_spark import kmeans as cli

    out = str(tmp_path / "kmeans_out")
    rc = cli.main(
        [
            os.path.join(FIXTURES, "pm25.txt"),
            os.path.join(FIXTURES, "pm25.cluster.center.conf.txt"),
            out,
            "5",
        ]
    )
    assert rc == 0

    # -- assignments vs kmeans.hdfs golden --
    emitted: list[str] = []
    adir = os.path.join(out, "assignments")
    for fn in sorted(os.listdir(adir)):
        if not fn.startswith("part-"):
            continue
        with open(os.path.join(adir, fn), encoding="utf-8") as f:
            emitted += [l.rstrip("\n") for l in f if l.strip()]
    with open(
        os.path.join(FIXTURES, "golden_assignments.txt"), encoding="utf-8"
    ) as f:
        golden_lines = [l.rstrip("\n") for l in f if l.strip()]
    assert sorted(emitted) == sorted(golden_lines)

    # -- centers.txt vs pm25.cluster.center.conf.txt.hdfs golden --
    with open(os.path.join(out, "centers.txt"), encoding="utf-8") as f:
        ours = [l.rstrip("\n") for l in f if l.strip()]
    with open(
        os.path.join(FIXTURES, "golden_centers.txt"), encoding="utf-8"
    ) as f:
        golden = [l.rstrip("\n") for l in f if l.strip()]
    assert len(ours) == len(golden) == 4
    for mine, gold in zip(ours, golden):
        # structure: \t<date>,大里,PM25,<values>
        assert mine.startswith("\t") and gold.startswith("\t")
        m_head, m_vals = mine.split("PM25,", 1)
        g_head, g_vals = gold.split("PM25,", 1)
        assert m_vals == g_vals  # byte-for-byte numeric parity
        assert m_head.endswith(",大里,") and g_head.endswith(",大里,")


def test_toy_points_converge(spark):
    """Draft-variant shape (Kmeans/kmeans.java): 26 2-d points, k=2,
    normalized-squared metric, exact-convergence stop
    (kmeans.java:221-224). No golden output exists for this input in the
    reference; assert the algorithmic contract instead: cost is
    monotonically non-increasing and the run converges."""
    pts = spark.read.schema("x double, y double").csv(
        os.path.join(FIXTURES, "kmeans_input_file.txt")
    ).withColumn("features", F.array("x", "y"))
    with open(
        os.path.join(FIXTURES, "cluster.center.conf.txt"), encoding="utf-8"
    ) as f:
        init = [
            [float(v) for v in line.strip().split(",")]
            for line in f
            if line.strip()
        ]
    assert len(init) == 2
    res = kmeans.fit(
        pts, init, metric="normalized_sq", max_iter=20, tol=0.0
    )
    assert res.converged
    for a, b in zip(res.costs, res.costs[1:]):
        assert b <= a + 1e-9
