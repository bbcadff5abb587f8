"""Corpus-adaptive LSH band-width policy (round 9 scale-probe fix).

Fixed 4-bit bands hold 16 buckets per band forever, so candidate pairs
grow ~n²/32 per band — the 52.7× `dedup_agreement` probe breach. The
fix scales band width with the corpus (`_lsh_bits`), pinning expected
bucket occupancy near `_LSH_TARGET_BUCKET`. These tests pin the policy:

* the certified fixtures (n = 2000 at sf0.01 / sf0.1) stay on the
  4-bit floor, so the engine chain remains bit-identical to the
  fixed-width DuckDB oracle;
* width grows logarithmically past the floor and caps at 62 bits —
  the math bound for ONE band value as a positive BIGINT (band values
  are computed per band, never packed into a single signature word,
  so bands·bits has no joint ceiling);
* expected occupancy n / 2^bits never exceeds the target above the
  floor — the invariant that keeps candidate volume linear in n.
"""

from __future__ import annotations

from nchu_bigdata_spark.operators.similarity import (
    _LSH_BANDS,
    _LSH_BITS,
    _LSH_TARGET_BUCKET,
    _lsh_bits,
)


def test_fixture_corpora_stay_on_oracle_width():
    # both certified SFs carry 2000 vectors; the floor must hold with
    # margin so a small fixture bump can't silently change the chain
    for n in (1, 100, 2000, 4000):
        assert _lsh_bits(n) == _LSH_BITS


def test_width_grows_log_and_caps():
    assert _lsh_bits(4001) == 5
    assert _lsh_bits(20000) == 7  # the 10x probe corpus
    assert _lsh_bits(250 * 2**14) == 14
    assert _lsh_bits(10**12) == 32  # 10^12 vectors: bucket ~233
    assert _lsh_bits(10**21) == 62  # cap: one band value < 2^63
    widths = [_lsh_bits(n) for n in (10**3, 10**4, 10**5, 10**6, 10**7)]
    assert widths == sorted(widths)


def test_occupancy_invariant_above_floor():
    # expected bucket n / 2^bits <= target whenever the cap isn't hit
    for n in (4001, 10**4, 10**6, 10**9, 10**12, 250 * 2**14):
        bits = _lsh_bits(n)
        if bits < 62:
            assert n / 2**bits <= _LSH_TARGET_BUCKET


def test_above_floor_chain_finds_planted_duplicates(spark, tmp_path):
    """Exercise the bits > 4 arm of the adaptive chain (the certified
    fixtures never leave the floor): 4100 vectors force bits = 5, and
    planted EXACT duplicates must all surface — identical vectors share
    every band bucket at ANY width, so this holds for every future
    width the clamp may pick, while still failing if the band
    derivation (grouping, powers, bucket arithmetic) breaks."""
    import pyspark.sql.functions as F

    from nchu_bigdata_spark.operators.similarity import (
        _lsh_bands,
        dedup_embed_cosine,
    )

    n_base = 2050  # 2 * 2050 = 4100 > the 4000-vector floor threshold
    base = spark.range(1, n_base + 1).select(
        F.col("id").cast("int").alias("vec_id"),
        F.lit("t").alias("label"),
        F.expr(
            "transform(sequence(0, 63), d ->"
            " CAST((pmod(hash(id, d), 2001) - 1000) / 1000.0 AS FLOAT))"
        ).alias("embedding"),
    )
    dup = base.select(
        (F.col("vec_id") + n_base).alias("vec_id"), "label", "embedding"
    )
    out = str(tmp_path / "embeddings.parquet")
    base.unionAll(dup).coalesce(2).write.parquet(out)

    assert _lsh_bits(2 * n_base) == 5
    _, bands = _lsh_bands(spark, str(tmp_path))
    stats = bands.agg(
        F.max("k").alias("mk"), F.min("bv").alias("lo"), F.max("bv").alias("hi")
    ).collect()[0]
    assert stats["mk"] == 3  # 4 bands
    assert 0 <= stats["lo"] and stats["hi"] < 2**5  # 5-bit buckets

    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_embed_cosine(spark, str(tmp_path))
        .filter(F.col("cos_sim") == 1.0)
        .collect()
    }
    planted = {(i, i + n_base) for i in range(1, n_base + 1)}
    assert planted <= pairs


def test_corpus_size_cache_invalidates_on_rewrite(spark, tmp_path):
    """ADVICE r9: a rebuilt/grown embeddings.parquet in the SAME dir
    must invalidate the memoized vector count — otherwise the adaptive
    band width is sized for the old corpus and the dedup/ANN chain
    silently changes shape relative to the data actually read."""
    import time

    import pyspark.sql.functions as F

    from nchu_bigdata_spark.operators.similarity import _corpus_size

    def write(n):
        spark.range(1, n + 1).select(
            F.col("id").cast("int").alias("vec_id"),
            F.lit("t").alias("label"),
            F.expr(
                "transform(sequence(0, 7), d ->"
                " CAST(pmod(hash(id, d), 100) / 100.0 AS FLOAT))"
            ).alias("embedding"),
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "embeddings.parquet")
        )

    write(100)
    assert _corpus_size(spark, str(tmp_path)) == 100
    time.sleep(0.02)  # ensure a distinct mtime_ns even on coarse clocks
    write(250)
    assert _corpus_size(spark, str(tmp_path)) == 250
