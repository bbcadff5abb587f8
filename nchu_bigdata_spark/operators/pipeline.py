"""Training-data pipeline operators: test-set decontamination,
stratified corpus sampling, and repetition-based quality filtering.

These are the corpus-curation steps a large-scale LLM data pipeline
runs between raw crawl and training shards (the public recipes: n-gram
train/test overlap removal as in the GPT-3 appendix-C and The Pile
decontamination procedures; per-source/per-language rebalancing; and
Gopher-style repetition filters). They generalize the reference's
"prepare a clean analysis input" stage (ref A1-A2, ``src/Kmeans.java``
reads a pre-filtered PM2.5 table) to document corpora.

Scale design (100 TB):
  * decontam_ngram — the *test* side (benchmark suites, at most MBs in
    practice) broadcasts into the train-gram stream, so the corpus is
    scanned once with no shuffle of train rows; hot n-grams (train
    document frequency > cutoff) are removed with a broadcast anti-join
    the same way ``dedup_ngram_jaccard`` kills stop-shingles, bounding
    the candidate blowup a boilerplate gram would cause.
  * sample_stratified — a pure narrow filter on a deterministic hash
    bucket: no shuffle, no state, trivially parallel; rates live in a
    tiny literal map (broadcast-equivalent).
  * text_repetition — entirely narrow per-row array expressions inside
    whole-stage codegen; zero shuffles. Per-doc cost is O(distinct ×
    tokens) which is bounded by document length, not corpus size.

Every fraction is computed with integer numerators/denominators and
rounded via the ``compat.py`` decimal policy, so Spark and the DuckDB
oracle agree bit-for-bit; boolean-ish flags are 0/1 ints derived from
pure integer comparisons (no float thresholds to straddle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.compat import dround, sql_dround
from nchu_bigdata_spark.io import local_rows, parallel_table, table
from nchu_bigdata_spark.materialize import range_pid_frozen
from nchu_bigdata_spark.operators.dedup import _h32
from nchu_bigdata_spark.registry import register

_DK = 5  # tokens per decontamination n-gram (>= dedup's 3: fewer chance collisions)
_DECONTAM_MIN_SHARED = 3  # shared distinct n-grams to flag a pair
_HOT_GRAM_DF = 1000  # train-df above this = boilerplate, excluded from matching
_TEST_MOD = 10  # doc_id % 10 == 0 -> held-out "test" split

# Per-language keep-rates (percent) for corpus rebalancing: downsample
# the dominant language, keep the tail. Deterministic hash sampling so
# both engines (and any two runs) select identical rows.
_STRATA_PCT = {"en": 25}
_DEFAULT_PCT = 100


def _doc_grams5(docs: DataFrame) -> DataFrame:
    """(doc_id, h) exploded distinct 5-gram 32-bit hashes (portable
    md5 prefix, same construction as dedup's shingle hashing)."""
    w = F.split("text", " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - _DK),
            lambda i: _h32(F.concat_ws(" ", F.slice(w, i + 1, _DK))),
        )
    )
    return docs.filter(F.size(F.split("text", " ")) >= _DK).select(
        "doc_id", F.explode(grams).alias("h")
    )


_SQL_GRAMS5 = f"""
        tok AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) >= {_DK}
        ),
        g AS (
            SELECT DISTINCT doc_id,
                   ('0x' || substr(md5(
                       array_to_string(w[i : i + {_DK} - 1], ' ')
                   ), 1, 8))::BIGINT AS h
            FROM tok, unnest(range(1, len(w) - {_DK} + 2)) AS r(i)
        )
"""


@register(
    "decontam_ngram",
    tags=("pipeline",),
    oracle=f"""
        WITH {_SQL_GRAMS5},
        test AS (SELECT doc_id, h FROM g WHERE doc_id % {_TEST_MOD} = 0),
        train AS (SELECT doc_id, h FROM g WHERE doc_id % {_TEST_MOD} != 0),
        hot AS (
            SELECT h FROM train GROUP BY h HAVING COUNT(*) > {_HOT_GRAM_DF}
        ),
        train_f AS (
            SELECT tr.doc_id, tr.h FROM train tr
            WHERE tr.h NOT IN (SELECT h FROM hot)
        ),
        hits AS (
            SELECT te.doc_id AS test_doc, tr.doc_id AS train_doc,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM test te JOIN train_f tr USING (h)
            GROUP BY te.doc_id, tr.doc_id
            HAVING COUNT(*) >= {_DECONTAM_MIN_SHARED}
        ),
        sizes AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_test_grams
            FROM test GROUP BY doc_id
        )
        SELECT h.test_doc, h.train_doc, h.n_shared, s.n_test_grams,
               {sql_dround("h.n_shared / CAST(s.n_test_grams AS DOUBLE)", 6)}
                   AS contamination
        FROM hits h JOIN sizes s ON s.doc_id = h.test_doc
    """,
)
def decontam_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test overlap detection (decontamination): flag (test doc,
    train doc) pairs sharing >= 3 distinct 5-gram hashes, with the
    contaminated fraction of the test doc's grams. The held-out split
    is deterministic (doc_id % 10).

    Plan: one gram-hash explode over the corpus (parallelism-guarded
    scan — md5 per gram dominates), split into test/train streams; hot
    boilerplate grams (train df > 1000) are removed by a broadcast
    anti-join; the (small) test-gram index broadcasts into the train
    stream, so the train side — the 100 TB side — is scanned once and
    never shuffled; one hash-agg on (test_doc, train_doc) produces
    overlap counts, map-side partials collapsing first."""
    docs = parallel_table(spark, sf_dir, "documents")
    grams = _doc_grams5(docs)
    test = grams.filter(F.col("doc_id") % _TEST_MOD == 0)
    train = grams.filter(F.col("doc_id") % _TEST_MOD != 0)
    hot = (
        train.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _HOT_GRAM_DF)
        .select("h")
    )
    train_f = train.join(F.broadcast(hot), "h", "left_anti")
    hits = (
        train_f.withColumnRenamed("doc_id", "train_doc")
        .join(
            F.broadcast(test.withColumnRenamed("doc_id", "test_doc")), "h"
        )
        .groupBy("test_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _DECONTAM_MIN_SHARED)
    )
    sizes = test.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_test_grams")
    )
    return (
        hits.join(sizes.withColumnRenamed("doc_id", "test_doc"), "test_doc")
        .select(
            "test_doc",
            "train_doc",
            "n_shared",
            "n_test_grams",
            dround(
                F.col("n_shared") / F.col("n_test_grams").cast("double"), 6
            ).alias("contamination"),
        )
    )


def _strata_case_sql() -> str:
    branches = " ".join(
        f"WHEN '{lang}' THEN {pct}" for lang, pct in _STRATA_PCT.items()
    )
    return f"CASE lang {branches} ELSE {_DEFAULT_PCT} END"


def _strata_rate_col():
    rate = F.lit(_DEFAULT_PCT)
    expr = F.when(F.lit(False), rate)  # seed a CASE chain
    for lang, pct in _STRATA_PCT.items():
        expr = expr.when(F.col("lang") == lang, F.lit(pct))
    return expr.otherwise(rate)


@register(
    "sample_stratified",
    tags=("pipeline",),
    oracle=f"""
        SELECT doc_id, lang, source
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 100 < ({_strata_case_sql()})
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling for corpus rebalancing: keep a
    per-language percentage of documents (downsample the dominant
    language, keep the tail), selecting rows by hash bucket rather than
    RNG so the sample is reproducible across engines, runs, and
    backfills — the property a production pipeline needs to re-derive
    a shard. Pure narrow filter: no shuffle, no state; the strata->rate
    map is a literal CASE (broadcast-equivalent at any size)."""
    docs = table(spark, sf_dir, "documents")
    bucket = _h32(F.col("doc_id").cast("string")) % 100
    return docs.filter(bucket < _strata_rate_col()).select(
        "doc_id", "lang", "source"
    )


@register(
    "text_repetition",
    tags=("pipeline",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE len(string_split(text, ' ')) >= 2
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(list_max(list_transform(
                       list_distinct(w),
                       x -> len(list_filter(w, y -> y = x))
                   )) AS BIGINT) AS max_tf,
                   CAST(len(w) - 1 AS BIGINT) AS n_bigrams,
                   CAST(len(list_distinct(
                       [array_to_string(w[i : i + 1], ' ')
                        for i in range(1, len(w))]
                   )) AS BIGINT) AS n_distinct_bigrams
            FROM t
        )
        SELECT doc_id, n_tokens, max_tf, n_bigrams, n_distinct_bigrams,
               {sql_dround("max_tf / CAST(n_tokens AS DOUBLE)", 6)}
                   AS top_word_frac,
               {sql_dround(
                   "(n_bigrams - n_distinct_bigrams)"
                   " / CAST(n_bigrams AS DOUBLE)", 6)}
                   AS dup_bigram_frac,
               CAST(CASE WHEN 5 * max_tf > n_tokens
                          OR 2 * (n_bigrams - n_distinct_bigrams) > n_bigrams
                     THEN 1 ELSE 0 END AS INT) AS is_repetitive
        FROM m
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: top-word
    fraction (max term frequency / tokens) and duplicate-bigram
    fraction, plus a 0/1 repetitive flag (top word > 20% of tokens OR
    >50% of bigrams duplicated — evaluated in exact integer arithmetic,
    ``5*max_tf > n`` / ``2*dups > n_bigrams``, so no float threshold
    can straddle between engines).

    Entirely narrow: term frequencies come from per-row higher-order
    array functions (O(distinct x tokens) per doc, bounded by document
    length), bigram distinctness from an array expression — zero
    shuffles, full whole-stage codegen, embarrassingly parallel at any
    corpus size. Parallelism-guarded scan: the per-row array compute is
    the whole query and there is no shuffle to redistribute it (A/B at
    sf0.1: 2.2s -> 0.6s)."""
    docs = parallel_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    max_tf = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    ).cast("long")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(w) - 2),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
    )
    m = docs.filter(F.size(w) >= 2).select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        max_tf.alias("max_tf"),
        (F.size(w) - 1).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("long").alias(
            "n_distinct_bigrams"
        ),
    )
    dup = F.col("n_bigrams") - F.col("n_distinct_bigrams")
    return m.select(
        "doc_id",
        "n_tokens",
        "max_tf",
        "n_bigrams",
        "n_distinct_bigrams",
        dround(F.col("max_tf") / F.col("n_tokens").cast("double"), 6).alias(
            "top_word_frac"
        ),
        dround(dup / F.col("n_bigrams").cast("double"), 6).alias(
            "dup_bigram_frac"
        ),
        (
            (5 * F.col("max_tf") > F.col("n_tokens"))
            | (2 * dup > F.col("n_bigrams"))
        )
        .cast("int")
        .alias("is_repetitive"),
    )


_PACK_BUDGET = 256  # tokens per packed training sequence


@register(
    "pack_sequences",
    tags=("pipeline",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, source, n_tokens,
                   CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS cum_before
            FROM t
            WINDOW w AS (PARTITION BY lang, source ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING)
        )
        SELECT doc_id, lang, source, n_tokens,
               CAST(cum_before // {_PACK_BUDGET} AS BIGINT) AS seq_id,
               CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS seq_offset,
               CAST(CASE WHEN cum_before % {_PACK_BUDGET} + n_tokens
                              > {_PACK_BUDGET}
                     THEN 1 ELSE 0 END AS INT) AS spans_boundary
        FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing: lay each (lang, source)
    stream of documents end-to-end in doc_id order and cut it into
    fixed token-budget training sequences, emitting for every document
    the sequence it starts in, its token offset there, and whether it
    spans a sequence boundary — the classic packing layout (documents
    concatenated with separators, chunked to context length).

    Scale design: packing is windowed *per (lang, source) shard*, never
    globally — a single global running total would serialize the corpus
    through one partition, while per-shard windows parallelize across
    shards exactly like the shard-per-worker layout a training job
    reads. One shuffle (the window partition), integer arithmetic only.
    """
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = docs.select(
        "doc_id", "lang", "source", n_tokens.alias("n_tokens")
    ).withColumn(
        "cum_before",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"),
    )
    b = F.lit(_PACK_BUDGET)
    return c.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        # integer division on both engines: `/` would be a double
        # quotient that DuckDB's BIGINT cast rounds but Spark truncates
        F.expr(f"cum_before div {_PACK_BUDGET}").cast("long").alias("seq_id"),
        (F.col("cum_before") % b).cast("long").alias("seq_offset"),
        (F.col("cum_before") % b + F.col("n_tokens") > b)
        .cast("int")
        .alias("spans_boundary"),
    )


# Integer-exact curation gates (no float thresholds to straddle):
#   low quality : n_tokens < 20  OR  10*n_distinct < 3*n_tokens (<0.3)
#   repetitive  : 5*max_tf > n_tokens  OR  2*dup_bigrams > n_bigrams
#   exact dup   : doc_id != min(doc_id) over sha256(text)
_CURATE_MIN_TOKENS = 20


# Shared curation-verdict SQL (the curate_corpus oracle body);
# curate_funnel_report aggregates the same verdict, so the two can
# never drift.
_SQL_CURATE_VERDICT = f"""
WITH base AS (
            SELECT doc_id, lang, source, text,
                   string_split(text, ' ') AS w,
                   MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keep_doc
            FROM documents
        ),
        m AS (
            SELECT doc_id, lang, source, keep_doc,
                   CAST(len(w) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
                   CAST(list_max(list_transform(
                       list_distinct(w),
                       x -> len(list_filter(w, y -> y = x))
                   )) AS BIGINT) AS max_tf,
                   CAST(GREATEST(len(w) - 1, 0) AS BIGINT) AS n_bigrams,
                   CAST(GREATEST(len(w) - 1, 0)
                        - len(list_distinct(
                            [array_to_string(w[i : i + 1], ' ')
                             for i in range(1, len(w))]))
                        AS BIGINT) AS dup_bigrams
            FROM base
        )
        SELECT doc_id, lang, source, n_tokens,
               CAST(CASE WHEN n_tokens < {_CURATE_MIN_TOKENS}
                          OR 10 * n_distinct < 3 * n_tokens
                     THEN 1 ELSE 0 END AS INT) AS is_low_quality,
               CAST(CASE WHEN 5 * max_tf > n_tokens
                          OR 2 * dup_bigrams > n_bigrams
                     THEN 1 ELSE 0 END AS INT) AS is_repetitive,
               CAST(CASE WHEN doc_id <> keep_doc THEN 1 ELSE 0 END AS INT)
                   AS is_exact_dup,
               CAST(CASE WHEN n_tokens >= {_CURATE_MIN_TOKENS}
                          AND 10 * n_distinct >= 3 * n_tokens
                          AND NOT (5 * max_tf > n_tokens
                                   OR 2 * dup_bigrams > n_bigrams)
                          AND doc_id = keep_doc
                     THEN 1 ELSE 0 END AS INT) AS keep
        FROM m
"""


@register(
    "curate_corpus",
    tags=("pipeline",),
    oracle=_SQL_CURATE_VERDICT,
)
def curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation verdict — the composed funnel a
    training-data pipeline actually runs (C4/Gopher-style): per document
    a quality gate (length + lexical diversity), a repetition gate
    (top-word / duplicate-bigram, Gopher §A.1.1 shape), an exact-dedup
    gate (keep the lowest doc_id per sha256), and the final ``keep``
    bit. Emitting per-gate flags rather than a filtered corpus is
    deliberate: curation runs are audited by "what did each gate kill",
    and the kept corpus is ``WHERE keep = 1`` away.

    Plan shape: every gate except dedup is a narrow per-row array
    expression inside whole-stage codegen; exact-dedup is ONE window
    shuffle on sha256(text) (min doc_id per content group — no join, no
    second pass over text). So the whole funnel costs a single shuffle
    of (hash, doc_id)-sized rows at any corpus size. Near-dup removal
    plugs in as a pre-computed kill list from ``dedup_clusters``
    (production would anti-join it here; kept separate so each stage
    stays independently oracle-checkable).

    All gates are integer comparisons — no float threshold can straddle
    engines.
    """
    docs = parallel_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    keep_doc = F.min("doc_id").over(
        Window.partitionBy(F.sha2(F.col("text"), 256))
    )
    max_tf = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    ).cast("long")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 2),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    m = docs.select(
        "doc_id",
        "lang",
        "source",
        keep_doc.alias("keep_doc"),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct"),
        max_tf.alias("max_tf"),
        F.greatest(F.size(w) - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        (
            F.greatest(F.size(w) - 1, F.lit(0))
            - F.size(F.array_distinct(bigrams))
        )
        .cast("long")
        .alias("dup_bigrams"),
    )
    low_q = (F.col("n_tokens") < _CURATE_MIN_TOKENS) | (
        10 * F.col("n_distinct") < 3 * F.col("n_tokens")
    )
    rep = (5 * F.col("max_tf") > F.col("n_tokens")) | (
        2 * F.col("dup_bigrams") > F.col("n_bigrams")
    )
    dup = F.col("doc_id") != F.col("keep_doc")
    return m.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        low_q.cast("int").alias("is_low_quality"),
        rep.cast("int").alias("is_repetitive"),
        dup.cast("int").alias("is_exact_dup"),
        (~low_q & ~rep & ~dup).cast("int").alias("keep"),
    )


# --------------------------------------------------------------------------
# sample_token_budget — budget-capped corpus mixing per (lang, source)
# --------------------------------------------------------------------------

_BUDGET_TOKENS = 300  # token budget per (lang, source) mixture cell


@register(
    "sample_token_budget",
    tags=("pipeline",),
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                       AS rnd
            FROM documents
        ),
        c AS (
            SELECT doc_id, lang, source, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang, source ORDER BY rnd, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM t
        )
        SELECT doc_id, lang, source, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped corpus mixing: fill each (lang, source) mixture
    cell with documents until a fixed TOKEN budget is exhausted — the
    public LLM corpus-recipe shape (mixture weights are specified in
    tokens, not document counts or keep-rates, which is what separates
    this from ``sample_stratified``). Documents are admitted in a
    deterministic pseudo-random order (md5 of doc_id), so the selection
    is reproducible across engines, runs, and backfills, and adding a
    new source never reshuffles the sample of existing cells.

    Plan: one running-total window per (lang, source) shard — same
    sharding rationale as ``pack_sequences``: the serial prefix-sum is
    per-cell, and cells are the parallelism unit, so no global serial
    window ever forms. At 100 TB the budgets live in exactly this
    per-cell form (a recipe table), and a cell's scan stops mattering
    once its cumsum passes budget — in production the window input is
    pre-pruned by the per-cell doc count. Integer token counts only;
    no float thresholds to straddle."""
    docs = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    rnd = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("rnd", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = docs.select(
        "doc_id", "lang", "source",
        n_tokens.alias("n_tokens"), rnd.alias("rnd"),
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "lang", "source", "n_tokens", "cum_tokens")
    )


# --------------------------------------------------------------------------
# sample_reservoir — deterministic fixed-k per-stratum sample
# --------------------------------------------------------------------------

_RSV_K = 5


@register(
    "sample_reservoir",
    tags=("pipeline",),
    oracle=f"""
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS rk
        FROM documents
        QUALIFY rk <= {_RSV_K}
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sample: exactly k documents per language
    (or all of them if the stratum is smaller), selected by hash order
    — the distributed, rerun-stable stand-in for reservoir sampling.
    Complements ``sample_stratified`` (FRACTION per stratum: output
    scales with the corpus) when the consumer needs a bounded-size
    sample per group — eval slices, human-review draws, per-domain
    probes — no matter how big the corpus grows.

    Determinism: the order key is ``md5(doc_id)`` — uniform,
    engine-identical, and independent of input row order — so the
    sample is a function of the DATA, not the execution (same property
    the hash-mod ``sample_hash`` relies on; doc_id tiebreak covers the
    impossible-in-practice hash collision).

    Scale: rank-filter-over-window compiles to WindowGroupLimit
    (asserted in the plan audit): each task heap-prunes its partition
    to k rows per stratum BEFORE the one shuffle, so wire volume is
    O(k × strata × tasks), not corpus-sized."""
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).cast("int").alias("rk"))
        .filter(F.col("rk") <= _RSV_K)
    )


# --------------------------------------------------------------------------
# mixture_weights — corpus mixture-recipe solver (round 7)
# --------------------------------------------------------------------------

# Target language proportions in basis points (sums to 10000) — the
# mixture a downstream training run wants, vs whatever the corpus has.
_MIX_TARGET_BP = {"en": 4000, "zh": 1500, "es": 1500, "de": 1500, "fr": 1500}


def _mix_target_col():
    expr = F.when(F.lit(False), F.lit(0))
    for lang, bp in _MIX_TARGET_BP.items():
        expr = expr.when(F.col("lang") == lang, F.lit(bp))
    return expr.otherwise(F.lit(0))


def _mix_target_sql() -> str:
    branches = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in _MIX_TARGET_BP.items()
    )
    return f"CASE lang {branches} ELSE 0 END"


@register(
    "mixture_weights",
    tags=("pipeline",),
    oracle=f"""
        WITH cell AS (
            SELECT lang,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                       AS n_tokens,
                   CAST({_mix_target_sql()} AS BIGINT) AS target_bp
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens FROM cell),
        cap AS (
            -- HUGEINT intermediates (ADVICE r7): BIGINT n_tokens*10000
            -- is a CHECKED multiply in DuckDB (errors past ~9.2e14
            -- tokens) while Spark's int64 wraps — both engines stay
            -- exact in 128-bit.
            SELECT MIN(CAST(n_tokens AS HUGEINT) * 10000 // target_bp)
                AS budget
            FROM cell WHERE target_bp > 0
        )
        SELECT c.lang, c.n_tokens,
               CAST(CAST(c.n_tokens AS HUGEINT) * 10000
                    // t.corpus_tokens AS BIGINT) AS actual_bp,
               c.target_bp,
               CAST(CAST(c.target_bp AS HUGEINT) * p.budget // 10000
                    AS BIGINT) AS desired_tokens,
               CAST(CASE WHEN c.n_tokens = 0 THEN 0
                         ELSE (CAST(c.target_bp AS HUGEINT) * p.budget
                               // 10000) * 10000
                              // c.n_tokens END AS BIGINT) AS weight_bp
        FROM cell c, tot t, cap p
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-recipe solver (the Pile/Dolma mixing step): given target
    language proportions, compute per-language keep-rates that hit the
    LARGEST corpus achievable at exactly those proportions. The binding
    constraint is the scarcest language relative to its target:
    ``budget = min_L floor(n_L · 10⁴ / target_L)`` total tokens; each
    language then contributes ``desired_L = floor(target_L · budget /
    10⁴)`` tokens, i.e. keep-rate ``weight_L = floor(desired_L · 10⁴ /
    n_L)`` ≤ 10⁴ by construction. Feed the rates into deterministic
    hash sampling (``sample_stratified``'s mechanism) to materialize.

    Determinism: every quantity is integer division on exact token
    counts — bit-identical across engines, no float shares anywhere.

    Plan: ONE hash agg over per-document token counts (a narrow
    ``size(split(...))`` projection — map-side combined); the corpus
    total and the binding budget are 1-row broadcast cross joins. At
    100 TB this is a metadata-sized computation riding one corpus
    scan."""
    docs = parallel_table(spark, sf_dir, "documents")
    cell = docs.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    ).withColumn("target_bp", _mix_target_col().cast("long"))
    tot = cell.agg(F.sum("n_tokens").cast("long").alias("corpus_tokens"))
    # decimal(38,0) intermediates mirror the oracle's HUGEINT (ADVICE
    # r7): n_tokens * 10000 in int64 wraps silently past ~9.2e14 tokens
    # under the pinned ANSI-off mode; a 100 TB corpus (~2.5e13 tokens)
    # leaves only ~36x headroom. `div` on decimal operands is Spark's
    # integral division, same floor semantics as DuckDB's `//`.
    cap = cell.filter(F.col("target_bp") > 0).agg(
        F.min(
            F.expr("CAST(n_tokens AS decimal(38,0)) * 10000 div target_bp")
        ).alias("budget")
    )
    desired = F.expr("CAST(target_bp AS decimal(38,0)) * budget div 10000")
    return (
        cell.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(cap))
        .select(
            "lang",
            "n_tokens",
            F.expr(
                "CAST(n_tokens AS decimal(38,0)) * 10000 div corpus_tokens"
            ).cast("long").alias("actual_bp"),
            "target_bp",
            desired.cast("long").alias("desired_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "(CAST(target_bp AS decimal(38,0)) * budget div 10000)"
                    " * 10000 div n_tokens"
                )
            )
            .cast("long")
            .alias("weight_bp"),
        )
    )


# --------------------------------------------------------------------------
# tokenize_chunk_overlap — sliding-window chunking (round 7)
# --------------------------------------------------------------------------

_CHUNK_N = 64  # tokens per chunk
_CHUNK_S = 48  # stride (overlap = _CHUNK_N - _CHUNK_S = 16 tokens)


@register(
    "tokenize_chunk_overlap",
    tags=("pipeline",),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS w,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        k AS (
            SELECT doc_id, w, n,
                   CASE WHEN n <= {_CHUNK_N} THEN 1
                        ELSE 1 + CAST(ceil((n - {_CHUNK_N})
                                           / {_CHUNK_S}.0) AS BIGINT)
                   END AS n_chunks
            FROM tok
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(len(w[(i * {_CHUNK_S} + 1):(i * {_CHUNK_S} + {_CHUNK_N})])
                    AS INT) AS n_tokens,
               array_to_string(
                   w[(i * {_CHUNK_S} + 1):(i * {_CHUNK_S} + {_CHUNK_N})], ' '
               ) AS chunk_text
        FROM k, unnest(range(0, n_chunks)) AS r(i)
    """,
)
def tokenize_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (the RAG / long-context
    preprocessing shape): each document splits into 64-token chunks at
    stride 48, so consecutive chunks share 16 tokens of context and no
    token is orphaned — ``n_chunks = 1`` for short docs, else
    ``1 + ceil((n − 64) / 48)`` (the last chunk may run short).

    Determinism: chunk boundaries are pure integer arithmetic on the
    token count; chunk text is slicing, no arithmetic on values.

    Plan: a narrow generator projection — sequence → transform →
    explode inside the scan stage, ZERO shuffles (chunking is
    embarrassingly parallel; the multiplier is ~n/S rows per doc,
    bounded by document length, not corpus size)."""
    docs = parallel_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n = F.size(w)
    n_chunks = F.when(n <= _CHUNK_N, F.lit(1).cast("long")).otherwise(
        1 + F.ceil((n - _CHUNK_N) / F.lit(float(_CHUNK_S)))
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.size(F.slice(w, i * _CHUNK_S + 1, _CHUNK_N))
            .cast("int")
            .alias("n_tokens"),
            F.concat_ws(" ", F.slice(w, i * _CHUNK_S + 1, _CHUNK_N)).alias(
                "chunk_text"
            ),
        ),
    )
    return docs.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text"
    )


# --------------------------------------------------------------------------
# text_heavy_hitters — two-pass Misra-Gries frequent-token mining (round 7)
# --------------------------------------------------------------------------

_HH_PERMILLE = 1  # report tokens with frequency >= 0.1% of the stream
_HH_CAP = 4096  # per-partition summary capacity; sound because CAP > 1000/permille


def _mg_candidates(batches):
    """Per-partition Misra-Gries summary over whitespace tokens.

    Classic decrement sketch, maintained by merging each Arrow batch's
    exact counts into the running summary and, whenever the summary
    exceeds ``_HH_CAP`` entries, subtracting the (CAP+1)-th largest
    count from everything and dropping the non-positives (the mergeable-
    summaries formulation of the MG decrement, Agarwal et al., PODS'12).
    Guarantee: any token whose count in THIS partition is > n_p/CAP
    survives; combined with the pigeonhole step in the caller docstring
    this makes the union of partition summaries a superset of every
    global >= 1/1000 heavy hitter, which the exact second pass then
    prunes to the true answer."""
    counts: dict[str, int] = {}
    for pdf in batches:
        for text in pdf["text"]:
            for w in text.split(" "):
                counts[w] = counts.get(w, 0) + 1
        if len(counts) > _HH_CAP:
            vals = sorted(counts.values(), reverse=True)
            thr = vals[_HH_CAP]
            counts = {w: c - thr for w, c in counts.items() if c > thr}
    import pandas as pd

    yield pd.DataFrame({"word": list(counts.keys())})


@register(
    "text_heavy_hitters",
    tags=("b10",),
    oracle=f"""
        WITH tok AS (
            SELECT unnest(string_split(text, ' ')) AS word FROM documents
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tok, tot
        GROUP BY word, tot.n
        HAVING COUNT(*) * {1000 // _HH_PERMILLE} >= tot.n
    """,
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token mining (exact counts for every token with
    frequency >= 0.1% of the corpus token stream) via a two-pass
    Misra-Gries sketch — the vocabulary heavy-hitter primitive behind
    stopword induction, boilerplate detection, and BPE seeding.

    Why not a plain groupBy+HAVING (the oracle's form): at 100 TB the
    token vocabulary is billions of distinct strings, and the single-
    pass agg shuffles one partial-count row per (partition, distinct
    token) — the full per-partition vocabulary. The two-pass shape
    bounds the shuffle by the SKETCH, not the vocabulary:

      pass 1  mapInPandas Misra-Gries per partition (capacity 4096)
              -> at most P x 4096 candidate tokens, no shuffle of the
              token stream at all (text crosses to Arrow once, whole
              docs, never exploded);
      pass 2  exact recount of ONLY the candidates: explode + broadcast
              LEFT SEMI prune, then hash agg — map-side combine means
              the shuffle carries <= P x 4096 partial rows.

    Soundness (why no heavy hitter can be missed): a token with global
    count >= N/1000 has, by pigeonhole over Sum(count_p) >= Sum(n_p)/1000,
    at least one partition where count_p >= n_p/1000 > n_p/4096 — and MG
    with capacity 4096 always retains such a token (``_mg_candidates``).
    The recount then restores EXACT global counts, so the final filter
    is deterministic and oracle-checkable even though the sketch pass
    is approximate: any candidate superset yields the identical result.

    The total-stream denominator is SUM(len(split(text))) computed
    without exploding — one documents scan, 1-row broadcast."""
    docs = parallel_table(spark, sf_dir, "documents")
    candidates = (
        docs.select("text").mapInPandas(_mg_candidates, "word string").distinct()
    )
    tokens = docs.select(F.explode(F.split("text", " ")).alias("word"))
    exact = (
        tokens.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = docs.agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n")
    )
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * (1000 // _HH_PERMILLE) >= F.col("n"))
        .select("word", "cnt")
    )


# --------------------------------------------------------------------------
# sample_importance — DSIR-style target-domain importance filter (round 7)
# --------------------------------------------------------------------------

_IMP_TARGET_LANG = "en"  # the "target domain" sample the filter steers toward


@register(
    "sample_importance",
    tags=("b10",),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        vocab AS (
            SELECT word,
                   CAST(COUNT(*) AS BIGINT) AS c_all,
                   CAST(SUM(CASE WHEN lang = '{_IMP_TARGET_LANG}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS c_tgt
            FROM tok GROUP BY word
        ),
        tot AS (
            SELECT SUM(c_all) AS n_all, SUM(c_tgt) AS n_tgt FROM vocab
        ),
        aff AS (
            SELECT v.word,
                   CASE WHEN v.c_tgt * (t.n_all - t.n_tgt)
                             > (v.c_all - v.c_tgt) * t.n_tgt
                        THEN 1 ELSE 0 END AS is_aff
            FROM vocab v, tot t
        )
        SELECT k.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(a.is_aff) AS BIGINT) AS n_affine
        FROM tok k JOIN aff a ON a.word = k.word
        GROUP BY k.doc_id
        HAVING 2 * SUM(a.is_aff) >= COUNT(*)
    """,
)
def sample_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-based corpus selection, the integer-exact core of
    DSIR (Data Selection with Importance Resampling, Xie et al. 2023):
    score every document by how much its token distribution leans
    toward a small TARGET domain (here the ``lang='en'`` slice standing
    in for "high-quality target sample") versus the background corpus,
    and keep documents where target-affine token occurrences hold a
    majority. DSIR's log-ratio sum is replaced by a per-token
    cross-multiplied integer comparison (is this token RELATIVELY more
    frequent in target than background: ``c_tgt*n_bg > c_bg*n_tgt``) and
    a majority vote — rank-equivalent per token to the sign of the
    log-ratio, with zero float arithmetic anywhere (the ADVICE r6
    boundary-straddle policy).

    Plan/scale: one (word) hash agg builds the vocabulary with BOTH
    counts in the same pass (conditional sum, no second scan); totals
    fold off the vocabulary (1-row broadcast). The doc scoring join is
    token-keyed vocab x occurrences — both sides hash-partition on the
    word, per-key width is bounded by the word's corpus frequency, and
    the downstream doc_id agg combines map-side. Nothing driver-side,
    no floats, no all-pairs."""
    toks = parallel_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = toks.groupBy("word").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum(
            F.when(F.col("lang") == _IMP_TARGET_LANG, 1).otherwise(0)
        ).alias("c_tgt"),
    )
    tot = vocab.agg(
        F.sum("c_all").alias("n_all"), F.sum("c_tgt").alias("n_tgt")
    )
    # The affinity cross-multiplication runs in decimal(38,0) (the
    # events_rfm precedent): c_tgt * (n_all - n_tgt) in int64 silently
    # wraps under the pinned ANSI-off mode once corpus totals pass
    # ~9.2e18, while the oracle's HUGEINT stays exact — at 100 TB
    # (~2.5e13 tokens) the product reaches ~1e26. decimal keeps both
    # engines exact to 38 digits. (ADVICE r7, medium.)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    aff = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        (
            dec(F.col("c_tgt")) * dec(F.col("n_all") - F.col("n_tgt"))
            > dec(F.col("c_all") - F.col("c_tgt")) * dec(F.col("n_tgt"))
        )
        .cast("int")
        .alias("is_aff"),
    )
    return (
        toks.join(aff, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("is_aff").alias("n_affine"),
        )
        .filter(2 * F.col("n_affine") >= F.col("n_tok"))
    )


# --------------------------------------------------------------------------
# tokenize_vocab_coverage — OOV-rate scoring vs corpus vocabulary (round 8)
# --------------------------------------------------------------------------

# A word is in-vocabulary iff its corpus occurrence share is at least
# 1/_VC_RARITY (relative cutoff: scales with the corpus, no magic
# absolute count that breaks across scale factors).
_VC_RARITY = 2_000


@register(
    "tokenize_vocab_coverage",
    tags=("pipeline",),
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        vocab AS (
            SELECT word FROM tok GROUP BY word
            HAVING CAST(COUNT(*) AS HUGEINT) * {_VC_RARITY}
                   >= (SELECT COUNT(*) FROM tok)
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(COUNT(*) - COUNT(v.word) AS BIGINT) AS n_oov,
               CAST((COUNT(*) - COUNT(v.word)) * 10000 // COUNT(*)
                    AS BIGINT) AS oov_bp
        FROM tok t LEFT JOIN vocab v ON v.word = t.word
        GROUP BY t.doc_id
    """,
)
def tokenize_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus-derived
    vocabulary (words holding ≥ 1/2000 of all token occurrences) — the
    tokenizer-coverage / domain-shift diagnostic run before committing
    a vocab: docs full of OOV tokens fragment into byte-fallback
    pieces, blowing up sequence length and training cost.

    The cutoff is RELATIVE (share of the token stream, exact integer
    cross-multiply — no float share, no absolute count pinned to one
    scale factor), so the operator means the same thing at sf0.001 and
    at 100 TB.

    Plan/scale: one (word) hash agg builds candidate counts (map-side
    combined), the 1-row stream total folds off it as a broadcast, and
    the resulting vocabulary — small by construction — broadcasts into
    a LEFT join against the token stream keyed per doc; the per-doc
    agg combines map-side. Same single-scan shape as
    ``sample_importance`` (which scores affinity; this scores
    coverage)."""
    toks = parallel_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("n_all"))
    vocab = (
        counts.crossJoin(F.broadcast(tot))
        .filter(
            F.col("c").cast("decimal(38,0)") * _VC_RARITY
            >= F.col("n_all").cast("decimal(38,0)")
        )
        .select("word", F.lit(1).alias("iv"))
    )
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            (F.count(F.lit(1)) - F.count("iv")).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tok",
            "n_oov",
            F.expr("n_oov * 10000 div n_tok").alias("oov_bp"),
        )
    )


# --------------------------------------------------------------------------
# sample_split — deterministic train/val/test partition (round 8)
# --------------------------------------------------------------------------

# md5-bucket split: 90 / 5 / 5. Buckets are a function of doc_id only,
# so membership is stable across runs, engines, and corpus growth
# (adding documents never moves an existing one between splits).
_SPLIT_BOUNDS = (("train", 0, 90), ("val", 90, 95), ("test", 95, 100))


@register(
    "sample_split",
    tags=("pipeline",),
    oracle=f"""
        WITH b AS (
            SELECT lang,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % 100 AS bkt,
                   len(string_split(text, ' ')) AS n_tok
            FROM documents
        )
        SELECT lang,
               CASE {' '.join(f"WHEN bkt >= {lo} AND bkt < {hi} THEN '{s}'"
                              for s, lo, hi in _SPLIT_BOUNDS)} END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM b GROUP BY 1, 2
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5 by md5 hash bucket of
    ``doc_id``) with per-(lang, split) document and token counts — the
    dataset-freeze step before training. Hash-bucket membership is a
    pure function of the KEY: stable across runs and engines, and —
    unlike ``df.randomSplit`` — appending new documents never moves an
    existing one between splits (no leakage on incremental rebuilds).
    Disjointness and exhaustiveness hold by construction (the three
    bucket ranges partition 0..99); the per-cell counts exported here
    are what a dataset card records.

    Plan/scale: one narrow projection (md5 + bucket CASE, codegen) +
    one map-side-combining hash agg over lang×3 cells. The actual
    materialization step would write ``partitionBy(split)`` using the
    same predicate — the ``sink_partitioned`` shape."""
    docs = parallel_table(spark, sf_dir, "documents")
    bkt = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
    )
    split = F.when(F.lit(False), F.lit(""))
    for s, lo, hi in _SPLIT_BOUNDS:
        split = split.when((bkt >= lo) & (bkt < hi), F.lit(s))
    return (
        docs.select(
            "lang",
            split.otherwise(F.lit(None)).alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# sample_negatives — deterministic contrastive negative sampling (round 8)
# --------------------------------------------------------------------------

_NEG_K = 3  # negatives per anchor
_NEG_BUCKETS = 8  # hash-ring shards (scale knob: ~N/bucket stays large)


@register(
    "sample_negatives",
    tags=("b10",),
    oracle=f"""
        -- deterministic negative sampling on a hash ring: docs land on
        -- a pseudo-random ring position (md5 60-bit int), sharded into
        -- {_NEG_BUCKETS} buckets; each anchor's k negatives are the
        -- next k docs around its bucket's ring (modulo wrap). Hash
        -- ordering is uncorrelated with content, so negatives are
        -- corpus-random — yet every engine/retry draws THE SAME ones.
        WITH ring AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       ::BIGINT AS h
            FROM documents
        ),
        pos AS (
            SELECT doc_id, h % {_NEG_BUCKETS} AS bucket,
                   ROW_NUMBER() OVER (
                       PARTITION BY h % {_NEG_BUCKETS}
                       ORDER BY h, doc_id) AS pos,
                   COUNT(*) OVER (
                       PARTITION BY h % {_NEG_BUCKETS}) AS n
            FROM ring
        )
        SELECT a.doc_id,
               CAST(j.j AS INT) AS neg_rank,
               b.doc_id AS neg_doc_id
        FROM pos a
        CROSS JOIN (SELECT unnest(range(1, {_NEG_K} + 1)) AS j) j
        JOIN pos b
          ON b.bucket = a.bucket
         AND b.pos = (a.pos - 1 + j.j) % a.n + 1
    """,
)
def sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE sampling for contrastive training: each
    anchor document draws k corpus-random negatives — the
    (anchor, negative) pair feed for embedding/reranker training —
    with the draw fully reproducible across engines, retries, and
    partitionings (``df.sample``'s seed is partition-layout-dependent;
    the dedup modules ban it from stored output for exactly that
    reason).

    Mechanism: a HASH RING — every doc gets a pseudo-random 60-bit
    position (md5 of its id, the `dedup_ngram_jaccard` key recipe),
    the ring shards into ``_NEG_BUCKETS`` buckets, and an anchor's negatives
    are the next k docs clockwise within its bucket (modulo wrap).
    Hash positions are uncorrelated with content or id order, so the
    draw is corpus-uniform in practice, while being a pure function of
    the corpus.

    Plan/scale: NO global sort — each bucket orders independently
    (one hash-partitioned window), and the wrap resolves as ONE equi
    self-join on (bucket, ring index), never nth_value gymnastics or
    a driver collect. Buckets scale as the knob: keep N/bucket ≫ k so
    wrap collisions stay impossible and windows stay wide-parallel."""
    docs = table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    ring = docs.select("doc_id", h.alias("h")).select(
        "doc_id", "h", (F.col("h") % _NEG_BUCKETS).alias("bucket")
    )
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    pos = ring.select(
        "doc_id",
        "bucket",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("bucket")).alias("n"),
    )
    anchors = pos.select(
        "doc_id",
        "bucket",
        "pos",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.lit(_NEG_K))
        ).alias("neg_rank"),
    ).withColumn(
        "target_pos", (F.col("pos") - 1 + F.col("neg_rank")) % F.col("n") + 1
    )
    targets = pos.select(
        F.col("bucket").alias("t_bucket"),
        F.col("pos").alias("t_pos"),
        F.col("doc_id").alias("neg_doc_id"),
    )
    return (
        anchors.join(
            targets,
            (anchors.bucket == targets.t_bucket)
            & (anchors.target_pos == targets.t_pos),
        )
        .select("doc_id", F.col("neg_rank").cast("int"), "neg_doc_id")
    )


# --------------------------------------------------------------------------
# sample_poisson — deterministic Poisson(1) bootstrap replicates (round 8)
# --------------------------------------------------------------------------

# Cumulative Poisson(1) CDF scaled to 2^32, floor'd to integer literals
# (k <= 4; the >=5 tail keeps the distribution's ~0.37% remainder).
# Frozen constants so both engines bucket the SAME hash-uniform —
# nothing is computed with exp() at query time on either side.
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)


def _pois_case_sql(u: str) -> str:
    """CASE expression mapping a uniform 32-bit value to a Poisson(1)
    draw via the frozen inverse-CDF thresholds (portable SQL: same
    text runs on Spark and DuckDB)."""
    branches = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE 5 END"


@register(
    "sample_poisson",
    tags=("pipeline",),
    oracle=f"""
        -- Poisson bootstrap: each lineitem row enters the replicate
        -- 0..5 times, the count drawn per-row from Poisson(1) via the
        -- frozen inverse-CDF over a 32-bit md5 uniform — the
        -- resampling scheme that needs NO global count and NO RNG
        -- state, so it is embarrassingly parallel and bit-reproducible
        -- under retries. The replicate's group sums track the actuals
        -- within an exact integer error bound in basis points.
        WITH k AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                   {_pois_case_sql("('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT")} AS k
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS boot_rows,
               CAST(SUM(cents) AS BIGINT) AS sum_cents,
               CAST(SUM(k * cents) AS BIGINT) AS boot_cents,
               -- the error leg is HUGEINT: worst-case |boot-actual|
               -- is bounded by the sums themselves (~1e16 cents at
               -- 100 TB), and *10^4 would overflow checked BIGINT
               CAST(ABS(CAST(SUM(k * cents) AS HUGEINT) - SUM(cents))
                    * 10000 // SUM(cents) AS BIGINT) AS err_bp
        FROM k
        GROUP BY l_returnflag
    """,
)
def sample_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson bootstrap — the variance-estimation
    workhorse for 100 TB pipelines: each row independently enters a
    bootstrap replicate Poisson(1)-many times (0..5, tail-capped), so
    a replicate needs no global row count, no sampling-without-
    replacement shuffle, and no RNG state — the draw is a pure
    function of the row key (md5 → uniform → frozen inverse-CDF
    thresholds), reproducible across engines, partitionings, and task
    retries. Per group the replicate's count/revenue track the actuals
    (err_bp stays small), which is exactly the property bootstrap
    confidence intervals lean on.

    Plan/scale: one narrow codegen projection (md5 + CASE ladder) and
    one map-side-combined hash agg — no shuffle beyond the 3-group
    rollup; N replicates would vary the hash salt, not re-scan."""
    li = table(spark, sf_dir, "lineitem")
    u = (
        "CAST(conv(substr(md5(CAST(l_orderkey AS STRING) || '-' ||"
        " CAST(l_linenumber AS STRING)), 1, 8), 16, 10) AS BIGINT)"
    )
    k = li.select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        F.expr(_pois_case_sql(u)).alias("k"),
    )
    return k.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("boot_rows"),
        F.sum("cents").cast("long").alias("sum_cents"),
        F.sum(F.col("k") * F.col("cents")).cast("long").alias("boot_cents"),
        F.expr(
            "abs(CAST(sum(k * cents) AS decimal(38,0)) - sum(cents))"
            " * 10000 div sum(cents)"
        )
        .cast("long")
        .alias("err_bp"),
    )


# --------------------------------------------------------------------------
# curate_domain_balance — per-source document cap (round 8)
# --------------------------------------------------------------------------

_DB_CAP = 20  # max docs kept per source


@register(
    "curate_domain_balance",
    tags=("pipeline",),
    oracle=f"""
        -- domain balancing: cap every source at {_DB_CAP} documents,
        -- selected in deterministic pseudo-random order (md5 of
        -- doc_id, doc_id tie-break) — the web-crawl rebalancing step
        -- that stops a handful of mega-domains from dominating the
        -- training mixture. Emits the kept docs with their selection
        -- rank and the source's pre-cap size.
        SELECT doc_id, source,
               CAST(rn AS BIGINT) AS keep_rank,
               CAST(n_source AS BIGINT) AS n_source_docs
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS n_source
            FROM documents
        )
        WHERE rn <= {_DB_CAP}
    """,
)
def curate_domain_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain balancing: keep at most ``_DB_CAP`` documents per
    source — the per-domain cap every web-scale corpus applies so a
    few enormous domains can't dominate the training mixture.
    Selection order is deterministic pseudo-random (md5 of doc_id
    with a doc_id tie-break) — reproducible across engines, retries,
    and partitionings, unlike a seeded shuffle.

    Plan/scale: one hash shuffle on source + one window sort. The
    ``row_number <= k`` filter compiles to WindowGroupLimit, which
    prunes each group to its top-k on the MAP side before the
    shuffle — a mega-domain with 1e8 docs ships k rows per input
    partition, not 1e8, which is what makes the cap runnable at
    crawl scale. The pre-cap size deliberately does NOT ride the
    same window (a full-group ``count() over`` would defeat the
    group-limit prune by forcing every row across); it is a separate
    map-side-combined agg — source-cardinality rows — broadcast back
    onto the capped survivors."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    sizes = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_source")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    kept = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _DB_CAP)
    )
    return kept.join(F.broadcast(sizes), "source").select(
        "doc_id",
        "source",
        F.col("rn").cast("long").alias("keep_rank"),
        F.col("n_source").cast("long").alias("n_source_docs"),
    )


# --------------------------------------------------------------------------
# sample_temperature — temperature-scaled mixture allocation (round 8)
# --------------------------------------------------------------------------

_TS_BUDGET = 1_000  # documents to draw across sources
_TS_SQ_SCALE = 1_000_000  # w = floor(sqrt(n · 10⁶)) ≈ 1000·√n


@register(
    "sample_temperature",
    tags=("b10",),
    oracle=f"""
        -- temperature-scaled sampling allocation (τ=2): per-source
        -- draw budgets ∝ n^(1/τ) = √n, vs the proportional (τ=1)
        -- allocation. The multilingual-corpus rebalancing rule
        -- (mT5/XLM-R style): temperature lifts the tail sources a
        -- proportional draw starves. Weights are integers
        -- w = floor(sqrt(n·10⁶)) — IEEE sqrt is correctly rounded on
        -- both engines and n·10⁶ is exactly representable below 2⁵³
        -- (n ≤ 9·10⁹ documents PER SOURCE, documented bound), so the
        -- floor is the SAME integer everywhere; allocations are then
        -- pure floor cross-multiplies, HUGEINT-routed.
        WITH g AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)
                                   * {_TS_SQ_SCALE})) AS BIGINT) AS w
            FROM documents GROUP BY source
        ),
        t AS (SELECT SUM(n_docs) AS tot_n, SUM(w) AS tot_w FROM g)
        SELECT source, n_docs, w AS w_milli,
               CAST(CAST({_TS_BUDGET} AS HUGEINT) * n_docs // tot_n
                    AS BIGINT) AS alloc_prop,
               CAST(CAST({_TS_BUDGET} AS HUGEINT) * w // tot_w
                    AS BIGINT) AS alloc_temp
        FROM g, t
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture allocation (τ=2): how many documents
    to draw from each source so tail sources are lifted relative to a
    proportional draw — the multilingual/multi-domain rebalancing rule
    (sampling ∝ n^(1/τ)) that decides a training mixture before
    `sample_stratified` executes the draw. Emits both the τ=1
    (proportional) and τ=2 (√n) allocations so the flattening is
    visible per source.

    Determinism: the ONLY float op is one IEEE sqrt per source —
    correctly rounded by spec on both engines over an exactly-
    representable integer input (n·10⁶ < 2⁵³ ⇔ n ≤ 9e9 docs/source;
    beyond that, widen the scale or switch to an integer Newton
    isqrt), floored to the integer weight BOTH engines agree on;
    every division after that is a decimal(38,0)/HUGEINT floor
    cross-multiply (Σw ~ 10⁹·√n overflows int64 cross-terms at corpus
    scale).

    Plan/scale: one map-side-combined source agg + a 1-row global
    rollup broadcast back — the mixture_weights shape; nothing
    driver-side, no window."""
    g = table(spark, sf_dir, "documents").groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.expr(
            f"CAST(FLOOR(SQRT(CAST(count(1) AS DOUBLE) * {_TS_SQ_SCALE}))"
            " AS BIGINT)"
        ).alias("w"),
    )
    t = g.groupBy().agg(
        F.sum("n_docs").alias("tot_n"), F.sum("w").alias("tot_w")
    )
    return g.join(F.broadcast(t)).select(
        "source",
        "n_docs",
        F.col("w").alias("w_milli"),
        F.expr(
            f"CAST(CAST({_TS_BUDGET} AS decimal(38,0)) * n_docs div tot_n"
            " AS BIGINT)"
        ).alias("alloc_prop"),
        F.expr(
            f"CAST(CAST({_TS_BUDGET} AS decimal(38,0)) * w div tot_w"
            " AS BIGINT)"
        ).alias("alloc_temp"),
    )


# --------------------------------------------------------------------------
# curate_funnel_report — per-source curation attrition report (round 8)
# --------------------------------------------------------------------------


@register(
    "curate_funnel_report",
    tags=("pipeline",),
    oracle=f"""
        -- stage-attrition report over the curate_corpus verdict (the
        -- SAME shared SQL — report and verdict can never drift): per
        -- source, survivors after each successive gate in pipeline
        -- order (quality -> repetition -> exact-dedup), each kill
        -- attributed to the FIRST gate that fired, plus kept tokens
        -- and the keep rate in bp. The "what did each gate cost us"
        -- audit every curation run publishes.
        WITH verdict AS ({_SQL_CURATE_VERDICT})
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN is_low_quality = 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS killed_quality,
               CAST(SUM(CASE WHEN is_low_quality = 0
                              AND is_repetitive = 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS killed_repetition,
               CAST(SUM(CASE WHEN is_low_quality = 0
                              AND is_repetitive = 0
                              AND is_exact_dup = 1
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS killed_dedup,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN keep = 1 THEN n_tokens ELSE 0 END)
                    AS BIGINT) AS kept_tokens,
               CAST(SUM(keep) * 10000 // COUNT(*) AS BIGINT) AS keep_bp
        FROM verdict GROUP BY source
    """,
)
def curate_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stage-attrition report over the `curate_corpus`
    verdict: how many documents each gate killed (attributed to the
    FIRST gate that fired, in pipeline order quality → repetition →
    exact-dedup), how many docs/tokens survived, and the keep rate —
    the audit table every curation run publishes before anyone trains
    on the output.

    Composition is literal: the engine calls the registered
    `curate_corpus` implementation UNCHANGED and aggregates its flags;
    the oracle wraps the SAME shared verdict SQL
    (`_SQL_CURATE_VERDICT`) — report and verdict cannot drift apart
    (the `ann_recall_eval` composition pattern).

    Plan/scale: adds ONE source-sized hash agg (map-side combined) on
    top of curate_corpus's single content-hash shuffle. Kill
    attribution and keep rate are integer CASE/floor-bp legs."""
    verdict = curate_corpus(spark, sf_dir)
    lq = F.col("is_low_quality")
    rep = F.col("is_repetitive")
    dup = F.col("is_exact_dup")
    return verdict.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum((lq == 1).cast("long")).cast("long").alias("killed_quality"),
        F.sum(((lq == 0) & (rep == 1)).cast("long"))
        .cast("long")
        .alias("killed_repetition"),
        F.sum(((lq == 0) & (rep == 0) & (dup == 1)).cast("long"))
        .cast("long")
        .alias("killed_dedup"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep") == 1, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.expr("CAST(sum(keep) * 10000 div count(*) AS BIGINT)").alias(
            "keep_bp"
        ),
    )


# --------------------------------------------------------------------------
# sample_group_holdout — domain-level holdout split (round 8)
# --------------------------------------------------------------------------

_GH_HOLD_BUCKETS = 25  # md5(source) % 100 < 25 => held-out domain (~25%)


@register(
    "sample_group_holdout",
    tags=("pipeline",),
    oracle=f"""
        -- GROUP-level holdout: entire SOURCES (domains) are assigned
        -- to eval by md5 hash bucket, never individual documents —
        -- the contamination-safe eval split (sample_split's row-level
        -- buckets leak near-duplicates of a training doc into eval
        -- when both live in the same domain; holding out whole
        -- domains cannot). Per (split, lang): docs + tokens.
        WITH assign AS (
            SELECT lang, source,
                   CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT
                             % 100 < {_GH_HOLD_BUCKETS}
                        THEN 'eval' ELSE 'train' END AS split,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT split, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM assign GROUP BY split, lang
    """,
)
def sample_group_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-level (domain) holdout split: whole SOURCES hash into
    train or eval — never individual documents. `sample_split`'s
    row-level buckets silently leak near-duplicates of a training doc
    into eval whenever both live in the same domain (boilerplate,
    mirrors, templated pages); holding out entire domains is the
    contamination-safe eval construction LLM pipelines use
    (leave-whole-site-out). Emits per-(split, lang) doc / source /
    token counts — the freeze manifest.

    Determinism: membership is md5(source) % 100 against a literal
    cutoff — the engine-portable hash family (`fn_hash` policy); a
    new document in an existing domain inherits the domain's split,
    and a new domain lands stably by its own hash. Disjoint and
    exhaustive by construction.

    Plan/scale: one codegen'd projection + one (split, lang)-sized
    hash agg with a distinct-source leg that collapses to
    domain-cardinality partials map-side. No shuffle of row-level
    data beyond the agg's partials, at any corpus size."""
    docs = parallel_table(spark, sf_dir, "documents")
    split = F.when(
        F.expr("conv(substr(md5(source), 1, 8), 16, 10)").cast("long")
        % 100
        < _GH_HOLD_BUCKETS,
        "eval",
    ).otherwise("train")
    a = docs.select(
        "lang",
        "source",
        split.alias("split"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    return a.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# sample_time_split — embargoed temporal holdout manifest (round 8)
# --------------------------------------------------------------------------

# Cutoffs as epoch-day literals (UTC session clock): train ends at
# 2024-01-20, a 3-day embargo absorbs boundary-straddling sessions and
# autocorrelated features, eval starts 2024-01-23. Membership is a
# pure function of ts — stable across runs, engines, and incremental
# rebuilds, like every other split operator here.
_TSPLIT_TRAIN_END_DAY = 19_742  # 2024-01-20
_TSPLIT_EVAL_START_DAY = 19_745  # 2024-01-23


@register(
    "sample_time_split",
    tags=("b8",),
    oracle=f"""
        -- temporal train/embargo/eval split manifest with the
        -- cross-period identity-leakage audit: hash/group holdouts
        -- (sample_split, sample_group_holdout) are the wrong tool for
        -- FORECASTING eval, where training on the future leaks by
        -- construction; the time split cuts on the clock and the
        -- embargo gap keeps boundary-straddling behavior out of eval.
        -- n_users_seen_in_train is the number every backtest claim
        -- gets audited against (returning users are fine for
        -- forecasting, fatal for cold-start claims — report it).
        WITH base AS (
            SELECT CASE
                     WHEN epoch_us(ts) // 86400000000
                          < {_TSPLIT_TRAIN_END_DAY} THEN 'train'
                     WHEN epoch_us(ts) // 86400000000
                          < {_TSPLIT_EVAL_START_DAY} THEN 'embargo'
                     ELSE 'eval'
                   END AS split,
                   epoch_us(ts) // 86400000000 AS day,
                   user_id
            FROM events
        ),
        stats AS (
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(MIN(day) AS BIGINT) AS min_day,
                   CAST(MAX(day) AS BIGINT) AS max_day
            FROM base GROUP BY split
        ),
        bu AS (SELECT DISTINCT split, user_id FROM base),
        seen AS (
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n
            FROM bu
            WHERE user_id IN
                  (SELECT user_id FROM bu WHERE split = 'train')
            GROUP BY split
        )
        SELECT s.split, n_events, n_users, min_day, max_day,
               CAST(COALESCE(seen.n, 0) AS BIGINT)
                   AS n_users_seen_in_train
        FROM stats s LEFT JOIN seen ON s.split = seen.split
    """,
)
def sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/embargo/eval split manifest with a cross-period
    identity-leakage audit. The hash and group holdouts
    (`sample_split`, `sample_group_holdout`) are the wrong tool when
    the eval task is FORECASTING — any random split trains on the
    future. The time split cuts on the clock, and the 3-day EMBARGO
    gap (the standard purged/embargoed backtest construction, e.g.
    de Prado's purged k-fold) keeps boundary-straddling sessions and
    autocorrelated features from leaking the eval period into train.
    ``n_users_seen_in_train`` audits the other leak axis — identity:
    returning users are fine for forecasting claims, fatal for
    cold-start claims, so the manifest reports the overlap instead of
    pretending it away. Membership is a pure function of ts: stable
    across runs, engines, and incremental rebuilds.

    Plan/scale: one codegen'd bucket projection + one map-side-
    combined stats agg; the audit adds a (split, user) distinct
    (bounded by 3x users) and a user-keyed semi join against the
    train side — no broadcast assumption, so a billion-user identity
    space still hash-joins cleanly."""
    ev = table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000")
    split = (
        F.when(day < _TSPLIT_TRAIN_END_DAY, "train")
        .when(day < _TSPLIT_EVAL_START_DAY, "embargo")
        .otherwise("eval")
    )
    base = ev.select(split.alias("split"), day.alias("day"), "user_id")
    stats = base.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min("day").cast("long").alias("min_day"),
        F.max("day").cast("long").alias("max_day"),
    )
    bu = base.select("split", "user_id").distinct()
    train_users = bu.filter(F.col("split") == "train").select("user_id")
    seen = (
        bu.join(train_users, "user_id", "left_semi")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_seen"))
    )
    return stats.join(seen, "split", "left").select(
        "split",
        "n_events",
        "n_users",
        "min_day",
        "max_day",
        F.coalesce("n_seen", F.lit(0))
        .cast("long")
        .alias("n_users_seen_in_train"),
    )


# --------------------------------------------------------------------------
# sample_balanced — downsample every class to the minority count (round 8)
# --------------------------------------------------------------------------


@register(
    "sample_balanced",
    tags=("b8",),
    oracle="""
        -- class-balanced downsampling: every event_type keeps exactly
        -- k = min-class-count rows, selected by deterministic
        -- md5(event_id) pseudo-random rank (the sample_reservoir
        -- order) — the label-balance step before training a classifier
        -- on skewed logs, reproducible across engines/runs/backfills
        -- unlike any RNG draw.
        WITH k AS (
            SELECT CAST(MIN(n) AS BIGINT) AS k FROM (
                SELECT COUNT(*) AS n FROM events GROUP BY event_type)
        ),
        r AS (
            SELECT event_type, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                   ) AS rk
            FROM events
        )
        SELECT event_type, event_id
        FROM r, k WHERE rk <= k.k
    """,
)
def sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: keep exactly k rows per
    event_type, where k is the MINORITY class count — the standard
    label-balance step before training a classifier on skewed logs
    (a 90/10 class mix trains a 90%-accurate constant). Selection
    order is deterministic pseudo-random md5(event_id) rank (the
    `sample_reservoir` order): unbiased w.r.t. any payload attribute,
    yet reproducible across engines, runs, and backfills — no RNG
    seed to lose.

    Plan/scale: one map-side-combined class-count agg collapses to
    label cardinality (its min is a 1-row broadcast, never a
    collect); the rank window partitions BY CLASS, so each class
    sorts in parallel over its own partition — no global sort. k is
    data-dependent, so the pre-shuffle WindowGroupLimit heap prune
    (literal-k `sample_reservoir`) doesn't apply; at 100 TB you
    bound the sort by pre-filtering each class to a cheap hash-bucket
    superset of k before ranking (same two-pass trick as
    `orders_abc_class`)."""
    ev = table(spark, sf_dir, "events")
    k = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").cast("long").alias("k"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    r = ev.select(
        "event_type", "event_id", F.row_number().over(w).alias("rk")
    )
    return (
        r.join(F.broadcast(k))
        .filter(F.col("rk") <= F.col("k"))
        .select("event_type", "event_id")
    )


# --------------------------------------------------------------------------
# sample_kfold — deterministic k-fold cross-validation manifest (round 8)
# --------------------------------------------------------------------------

_KFOLD_K = 5


@register(
    "sample_kfold",
    tags=("b8",),
    oracle=f"""
        -- {_KFOLD_K}-fold cross-validation manifest with the two
        -- properties a CV claim rests on checked IN the output:
        -- folds are disjoint and exhaustive by construction (md5
        -- bucket mod k is a partition of the key space), and the
        -- per-(fold, lang) counts expose imbalance before any model
        -- trains. Hash-fold membership is a pure key function —
        -- appending documents never moves an existing one across
        -- folds (no leakage on incremental rebuilds), the property
        -- randomized fold shuffles cannot offer.
        WITH f AS (
            SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                       % {_KFOLD_K} AS fold,
                   lang, n_chars
            FROM documents
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total
                FROM documents)
        SELECT CAST(fold AS BIGINT) AS fold, lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST((SELECT n_total FROM tot) - COUNT(*) AS BIGINT)
                   AS n_train_pool_if_holdout
        FROM f GROUP BY fold, lang
    """,
)
def sample_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-fold cross-validation manifest: every document lands in
    exactly one fold by md5(doc_id) mod {k} — disjoint and exhaustive
    BY CONSTRUCTION (the buckets partition the hash space), which is
    the property a CV variance estimate silently rests on. Per-
    (fold, lang) document and char counts expose fold imbalance
    before any model trains, and the train-pool size column is the
    leave-one-fold-out complement. Hash-fold membership is a pure
    key function: appending new documents never moves an existing
    one across folds — incremental rebuilds can't leak a former
    training doc into its own eval fold, which randomized fold
    shuffles cannot promise. Completes the split family:
    `sample_split` (fixed 90/5/5), `sample_group_holdout` (by
    source), `sample_time_split` (by clock) — this one is for
    small-data variance estimation.

    Plan/scale: one codegen'd hash projection + one map-side-combined
    (fold, lang) agg; the 1-row total joins broadcast. Nothing
    scales except the scan."""
    docs = parallel_table(spark, sf_dir, "documents")
    f = docs.select(
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            f" AS BIGINT) % {_KFOLD_K}"
        ).alias("fold"),
        "lang",
        "n_chars",
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    return (
        f.groupBy(F.col("fold").cast("long").alias("fold"), "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .join(F.broadcast(tot))
        .select(
            "fold",
            "lang",
            "n_docs",
            "n_chars",
            (F.col("n_total") - F.col("n_docs"))
            .cast("long")
            .alias("n_train_pool_if_holdout"),
        )
    )


# --------------------------------------------------------------------------
# tokenize_truncation_audit — context-length loss ladder (round 8)
# --------------------------------------------------------------------------

_TRUNC_LADDER = [16, 64, 256, 1024]


@register(
    "tokenize_truncation_audit",
    tags=("b8",),
    oracle=f"""
        -- context-length truncation audit: for each candidate
        -- max-seq-len, how many documents truncate and what share of
        -- TOKENS is lost, in exact bp — the table that picks a
        -- training context length (doc-level truncation rate alone
        -- misleads: 1% of docs can hold 30% of tokens). Whitespace
        -- token counts, ladder x corpus cross in one pass.
        WITH d AS (
            SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
                       AS n_tokens
            FROM documents
        ),
        lad AS (
            SELECT UNNEST({_TRUNC_LADDER}) AS max_len
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
            FROM d
        )
        SELECT CAST(lad.max_len AS BIGINT) AS max_len,
               CAST(SUM(CASE WHEN d.n_tokens > lad.max_len
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_truncated_docs,
               CAST(SUM(GREATEST(d.n_tokens - lad.max_len, 0))
                    AS BIGINT) AS n_lost_tokens,
               CAST(SUM(CASE WHEN d.n_tokens > lad.max_len
                             THEN 1 ELSE 0 END) * 10000
                    // MAX(tot.n_docs) AS BIGINT) AS doc_trunc_bp,
               CAST(SUM(GREATEST(d.n_tokens - lad.max_len, 0)) * 10000
                    // MAX(tot.n_tokens) AS BIGINT) AS token_loss_bp
        FROM lad, d, tot
        GROUP BY lad.max_len
    """,
)
def tokenize_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length truncation audit: for each candidate
    max-seq-len in the ladder, how many DOCUMENTS would truncate and
    what share of TOKENS would be lost, both in exact basis points.
    This is the table that actually picks a training context length
    — the doc-level truncation rate alone misleads, because 1% of
    documents can hold 30% of the tokens (long-tail corpora), and
    token loss is what the model never sees. Pairs with
    `tokenize_chunk_overlap` (what to do with the remainder) and
    `sample_token_budget` (what fits the budget).

    Plan/scale: the corpus collapses to per-doc token counts in the
    scan projection; the 4-row ladder crosses as a broadcast and all
    ladder cells aggregate in ONE map-side-combined pass — corpus
    x 4 rows in, 4 rows out, no second scan per ladder entry."""
    docs = parallel_table(spark, sf_dir, "documents")
    d = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    lad = F.broadcast(
        local_rows(
            spark, [(int(x),) for x in _TRUNC_LADDER], "max_len long"
        )
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens_total"),
    )
    return (
        d.crossJoin(lad)
        .crossJoin(F.broadcast(tot))
        .groupBy("max_len")
        .agg(
            F.sum((F.col("n_tokens") > F.col("max_len")).cast("long"))
            .cast("long")
            .alias("n_truncated_docs"),
            F.sum(F.greatest(F.col("n_tokens") - F.col("max_len"), F.lit(0)))
            .cast("long")
            .alias("n_lost_tokens"),
            F.expr(
                "CAST(sum(CASE WHEN n_tokens > max_len THEN 1 ELSE 0 END)"
                " * 10000 div max(n_docs) AS BIGINT)"
            ).alias("doc_trunc_bp"),
            F.expr(
                "CAST(sum(greatest(n_tokens - max_len, 0)) * 10000"
                " div max(n_tokens_total) AS BIGINT)"
            ).alias("token_loss_bp"),
        )
    )


# --------------------------------------------------------------------------
# sample_class_weights — inverse-frequency loss weights (round 8)
# --------------------------------------------------------------------------


@register(
    "sample_class_weights",
    tags=("b8",),
    oracle="""
        -- inverse-frequency class weights for loss weighting (the
        -- sklearn 'balanced' convention, total/(k*count), in exact
        -- bp): the zero-data-motion alternative to sample_balanced —
        -- reweight the loss instead of discarding majority rows —
        -- with the weighted-mass audit column proving every class
        -- now contributes ~equal total weight.
        WITH c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        ),
        t AS (
            SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM c
        )
        SELECT c.event_type, c.n,
               CAST(t.total * 10000 // (t.k * c.n) AS BIGINT)
                   AS weight_bp,
               CAST(c.n * (t.total * 10000 // (t.k * c.n))
                    AS BIGINT) AS weighted_mass
        FROM c, t
    """,
)
def sample_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights for loss weighting — the
    sklearn 'balanced' convention, weight = total/(k·count), in exact
    floor basis points. The zero-data-motion alternative to
    `sample_balanced`: instead of discarding majority-class rows to
    equalize counts, keep everything and scale each example's loss —
    the right call when the majority class still carries signal and
    the dataset was expensive to assemble. ``weighted_mass``
    (count × weight) is the audit column: every class lands within
    one floor-division step of the same total, which is the property
    the convention exists to produce.

    Plan/scale: one map-side class-count agg + a 1-row total
    broadcast — label-cardinality output, pure integer arithmetic."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    t = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return c.join(F.broadcast(t)).select(
        "event_type",
        "n",
        F.expr("CAST(total * 10000 div (k * n) AS BIGINT)").alias(
            "weight_bp"
        ),
        F.expr(
            "CAST(n * (total * 10000 div (k * n)) AS BIGINT)"
        ).alias("weighted_mass"),
    )


# --------------------------------------------------------------------------
# sample_shard_assign — deterministic training-shard writer layout (round 8)
# --------------------------------------------------------------------------

_SHARDS = 16


@register(
    "sample_shard_assign",
    tags=("b2",),
    oracle=f"""
        -- Deterministic shard assignment + within-shard order for a
        -- training-data writer: shard = md5(doc_id) mod {_SHARDS},
        -- intra-shard order = a SECOND independent md5 ('ord|' domain
        -- separator) -- the global shuffle every epoch reader depends
        -- on, as a pure function of the keys (resumable, engine-
        -- independent, re-runnable shard by shard; df.sample/
        -- repartition order would be none of those). The checksum
        -- SUM(pos * (doc_id % 1000003)) pins the ORDER, not just the
        -- membership: any swap of two distinct docs changes it.
        WITH s AS (
            SELECT doc_id, n_chars,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % {_SHARDS} AS shard,
                   ('0x' || substr(md5('ord|' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT AS okey
            FROM documents
        ),
        r AS (
            SELECT shard, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY shard ORDER BY okey, doc_id
                   ) AS pos
            FROM s
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(CAST(pos AS HUGEINT) * (doc_id % 1000003))
                    AS BIGINT) AS order_checksum
        FROM r GROUP BY shard
    """,
)
def sample_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + within-shard order — the
    training-data WRITER layout: every epoch reader needs the corpus
    globally shuffled, and at 100 TB that shuffle must be a pure
    function of the keys (resumable after a failed write, identical
    across engines and reruns, regenerable shard-by-shard) — which
    `df.sample`/`repartition` order is not. Two independent md5
    domains: shard = hash(doc_id) mod {_SHARDS}; intra-shard order =
    hash('ord|'‖doc_id) — the domain separator makes the order
    uncorrelated with the assignment (`graph_random_walk`'s md5
    construction).

    The emitted manifest is one row per shard with the doc count, byte
    (char) volume, and an ORDER-SENSITIVE checksum
    SUM(pos · (doc_id mod 1000003)) — any swap of two distinct docs
    changes it, so the oracle certifies the shuffle ORDER, not just
    membership.

    Plan/scale: the per-shard `row_number` window IS the physical
    writer plan — one shard = one write task
    (`repartition(shard).sortWithinPartitions(okey)`), so the window's
    partition count equals the shard count, which production scales
    with the corpus (10⁴–10⁵ shards at 100 TB keeps per-task rows
    bounded); the manifest rollup is {_SHARDS} rows."""
    docs = table(spark, sf_dir, "documents")
    h8 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    okey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("ord|"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    s = docs.select(
        "doc_id",
        "n_chars",
        (h8 % _SHARDS).alias("shard"),
        okey.alias("okey"),
    )
    w = Window.partitionBy("shard").orderBy("okey", "doc_id")
    r = s.withColumn("pos", F.row_number().over(w))
    return r.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.sum(F.expr("CAST(pos AS decimal(38,0)) * (doc_id % 1000003)"))
        .cast("long")
        .alias("order_checksum"),
    ).select(
        F.col("shard").cast("long").alias("shard"),
        "n_docs",
        "sum_chars",
        "order_checksum",
    )


# --------------------------------------------------------------------------
# sample_curriculum — difficulty-staged training manifest (round 8)
# --------------------------------------------------------------------------

_CURR_STAGES = 4


@register(
    "sample_curriculum",
    tags=("b2",),
    oracle=f"""
        -- Curriculum-learning manifest: documents ranked by a
        -- deterministic difficulty score (mean word length in
        -- millichars -- long words ~ harder text) and cut into
        -- {_CURR_STAGES} equi-depth stages by the closed-form
        -- (rank-1)*S//n -- train easy->hard by reading stages in
        -- order. Equi-depth (not fixed thresholds) so every stage is
        -- the same size: a curriculum schedule wants equal-length
        -- phases, not equal difficulty spans.
        WITH d AS (
            SELECT doc_id, lang,
                   strlen(replace(text, ' ', '')) AS chars,
                   len(string_split(text, ' ')) AS toks
            FROM documents
        ),
        s AS (
            SELECT doc_id, lang, toks,
                   1000 * chars // toks AS difficulty_milli
            FROM d
        ),
        r AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       ORDER BY difficulty_milli, doc_id
                   ) AS rnk,
                   COUNT(*) OVER () AS n
            FROM s
        )
        SELECT CAST((rnk - 1) * {_CURR_STAGES} // n AS BIGINT) AS stage,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS sum_tokens,
               CAST(MIN(difficulty_milli) AS BIGINT) AS min_difficulty,
               CAST(MAX(difficulty_milli) AS BIGINT) AS max_difficulty
        FROM r GROUP BY (rnk - 1) * {_CURR_STAGES} // n
    """,
)
def sample_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning manifest: documents ranked by a
    deterministic difficulty score (mean word length in millichars —
    longer words ≈ harder text, the cheap proxy behind
    `text_readability`'s full Flesch-Kincaid) and cut into
    {s} EQUI-DEPTH stages — train easy→hard by consuming stages in
    order (Bengio 2009). Equi-depth, not fixed thresholds: a
    curriculum schedule wants equal-LENGTH phases, and the stage
    boundaries then adapt to the corpus instead of needing re-tuning
    per dataset.

    Exactness: difficulty = 1000·chars div tokens (integer millis);
    stage = the closed-form (rank−1)·S div n equi-depth cut
    (`win_lorenz`'s decile rule).

    Plan/scale: the per-doc score is a narrow scan-stage projection;
    the global rank is the win_lorenz TWO-PASS distributed rank —
    range-repartition + local sort on (difficulty, doc_id), tiny
    per-partition counts → running offsets broadcast back,
    global_rank = offset + partition-local row_number (r9: replaced
    the single-task unpartitioned row_number the r8 form used).
    r10 (ADVICE r9 high): the pid-stamped range partitioning is FROZEN
    via ``materialize.range_pid_frozen`` (eager localCheckpoint) —
    without it the offsets branch and the row-number branch compile to
    two independently-sampled rangepartitioning exchanges and can
    disagree on where the boundaries fell, silently corrupting global
    ranks at scale. With one frozen partitioning the rank is invariant
    to where the sampled boundaries fall (the sort is a total order),
    so the stage cut is bit-stable."""
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.expr(
            "1000 * octet_length(replace(text, ' ', ''))"
            " div size(split(text, ' '))"
        ).alias("difficulty_milli"),
        F.size(F.split("text", " ")).alias("toks"),
    )
    pid = range_pid_frozen(
        "sample_curriculum.pid", s, "difficulty_milli", "doc_id"
    )
    pc = pid.groupBy("pid").agg(F.count(F.lit(1)).alias("pn"))
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = pc.select(
        "pid",
        F.coalesce(F.sum("pn").over(w_off), F.lit(0)).alias("off"),
        F.sum("pn").over(Window.partitionBy()).alias("n"),
    )
    w_local = Window.partitionBy("pid").orderBy(
        "difficulty_milli", "doc_id"
    )
    r = (
        pid.withColumn("rlocal", F.row_number().over(w_local))
        .join(F.broadcast(off), "pid")
        .select(
            "toks",
            "difficulty_milli",
            (F.col("off") + F.col("rlocal")).alias("rnk"),
            "n",
        )
    )
    return r.groupBy(
        F.expr(f"CAST((rnk - 1) * {_CURR_STAGES} div n AS BIGINT)").alias(
            "stage"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("sum_tokens"),
        F.min("difficulty_milli").cast("long").alias("min_difficulty"),
        F.max("difficulty_milli").cast("long").alias("max_difficulty"),
    )


# --------------------------------------------------------------------------
# tokenize_padding_waste — length-bucketing padding audit (round 8)
# --------------------------------------------------------------------------


@register(
    "tokenize_padding_waste",
    tags=("b2",),
    oracle="""
        -- Padding-waste audit: batching pads every sequence in a
        -- batch to the batch's longest. Bucketing documents by
        -- power-of-two token length bounds that waste to < 50% by
        -- construction; padding everything to the GLOBAL max is the
        -- naive collator. Per bucket: docs, real tokens, padded
        -- tokens at the bucket ceiling, waste bp -- plus the global-
        -- pad waste for the same docs, so the report quantifies
        -- exactly what bucketing buys (the GPU-hours line item of
        -- collation policy).
        WITH d AS (
            SELECT len(string_split(text, ' ')) AS toks FROM documents
        ),
        b AS (
            SELECT toks,
                   CAST(POW(2, CEIL(LOG2(GREATEST(toks, 1))))
                        AS BIGINT) AS bucket_cap
            FROM d
        ),
        g AS (SELECT MAX(toks) AS global_max FROM b)
        SELECT CAST(bucket_cap AS BIGINT) AS bucket_cap,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS real_tokens,
               CAST(COUNT(*) * bucket_cap AS BIGINT) AS padded_tokens,
               CAST((COUNT(*) * bucket_cap - SUM(toks)) * 10000
                    // (COUNT(*) * bucket_cap) AS BIGINT)
                   AS bucket_waste_bp,
               CAST((COUNT(*) * MAX(g.global_max) - SUM(toks)) * 10000
                    // (COUNT(*) * MAX(g.global_max)) AS BIGINT)
                   AS globalpad_waste_bp
        FROM b CROSS JOIN g
        GROUP BY bucket_cap
    """,
)
def tokenize_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste audit — the GPU-hours line item of collation
    policy: batching pads every sequence to its batch's longest, so
    bucketing documents by power-of-two token length bounds waste to
    <50% per bucket BY CONSTRUCTION, while the naive collator (pad
    everything to the global max) wastes whatever the length
    distribution says. Per bucket this reports real vs padded tokens
    and both waste rates side by side — the number that justifies (or
    kills) a bucketed sampler before anyone trains.

    Exactness: the power-of-two ceiling is exact for the token range
    here (LOG2/CEIL/POW over small integers hit exact doubles —
    documented bound: token counts < 2⁵³ᐟ²; an all-integer bit-length
    ladder replaces it beyond); waste is floor bp over integer token
    counts.

    Plan/scale: one scan-stage projection (token count + bucket), a
    1-row global-max broadcast, one bucket rollup (≤ log₂(max_len)
    groups — the histogram is CONSTANT-width however big the
    corpus)."""
    docs = table(spark, sf_dir, "documents")
    b = docs.select(
        F.size(F.split("text", " ")).alias("toks")
    ).select(
        "toks",
        F.expr(
            "CAST(POW(2, CEIL(LOG2(GREATEST(toks, 1)))) AS BIGINT)"
        ).alias("bucket_cap"),
    )
    g = F.broadcast(b.agg(F.max("toks").alias("global_max")))
    return (
        b.join(g)
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("toks").cast("long").alias("real_tokens"),
            F.expr("CAST(COUNT(*) * bucket_cap AS BIGINT)").alias(
                "padded_tokens"
            ),
            F.expr(
                "CAST((COUNT(*) * bucket_cap - SUM(toks)) * 10000"
                " div (COUNT(*) * bucket_cap) AS BIGINT)"
            ).alias("bucket_waste_bp"),
            F.expr(
                "CAST((COUNT(*) * MAX(global_max) - SUM(toks)) * 10000"
                " div (COUNT(*) * MAX(global_max)) AS BIGINT)"
            ).alias("globalpad_waste_bp"),
        )
    )


# --------------------------------------------------------------------------
# sample_ess_audit — effective-sample-size audit of importance weights (r11)
# --------------------------------------------------------------------------


@register(
    "sample_ess_audit",
    tags=("b10",),
    oracle="""
        -- Effective-sample-size audit per corpus domain (lang): for
        -- importance weights w (here the documents' byte masses — the
        -- weight a token-budgeted mixture assigns), Kish's
        -- ESS = (SUM w)^2 / SUM w^2 is the number of EQUALLY-weighted
        -- samples the weighted set is worth. ess_ratio_bp = ESS/n in
        -- basis points is the collapse diagnostic a mixture-reweighting
        -- pipeline alerts on (ratio near 10000 = uniform weights; near
        -- 0 = a few giant docs dominate the domain). All integer: the
        -- squared legs ride HUGEINT <-> decimal(38,0), divisions are
        -- floor cross-multiplies.
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_w,
               CAST(CAST(SUM(n_chars) AS HUGEINT) * SUM(n_chars) * 1000
                    // SUM(CAST(n_chars AS HUGEINT) * n_chars)
                    AS BIGINT) AS ess_milli,
               CAST(CAST(SUM(n_chars) AS HUGEINT) * SUM(n_chars) * 10000
                    // (SUM(CAST(n_chars AS HUGEINT) * n_chars) * COUNT(*))
                    AS BIGINT) AS ess_ratio_bp
        FROM documents
        GROUP BY lang
    """,
)
def sample_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective-sample-size audit of importance weights, per
    domain (lang): ESS = (Σw)²/Σw² — the number of equally-weighted
    samples a weighted corpus slice is actually worth. Reported as
    ESS×1000 (exact integer grid) and ESS/n in basis points; the
    ratio is THE collapse diagnostic for importance-sampled mixtures
    (`sample_importance`, `mixture_weights`): re-weighting that drives
    ess_ratio_bp toward 0 means a handful of documents carry the whole
    domain and variance explodes. Weights here are the documents'
    byte masses (`n_chars`) — the weight a token-budgeted sampler
    implicitly assigns.

    Determinism: pure integer — Σw and Σw² legs in decimal(38,0) ↔
    HUGEINT (at 100 TB, Σw ≈ 1e14 per domain → (Σw)² ≈ 1e28, past
    int64 but inside 38 digits), divisions are floor
    cross-multiplies. No floats anywhere.

    Plan/scale: ONE map-side-combined hash agg on the lang key
    computes n, Σw, Σw² in a single pass over the scan (column-pruned
    to lang + n_chars — no text bytes move); output is
    domain-cardinality. No join, no window, no shuffle beyond the
    5-key agg exchange."""
    return (
        parallel_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_w"),
            F.expr(
                "CAST(sum(n_chars) AS decimal(38,0)) * sum(n_chars) * 1000"
                " div sum(CAST(n_chars AS decimal(38,0)) * n_chars)"
            )
            .cast("long")
            .alias("ess_milli"),
            F.expr(
                "CAST(sum(n_chars) AS decimal(38,0)) * sum(n_chars) * 10000"
                " div (sum(CAST(n_chars AS decimal(38,0)) * n_chars)"
                " * count(1))"
            )
            .cast("long")
            .alias("ess_ratio_bp"),
        )
    )


# --------------------------------------------------------------------------
# sample_neyman_alloc — optimal stratified allocation (round 11)
# --------------------------------------------------------------------------

_NEY_BUDGET = 1_000  # illustrative total sample budget


@register(
    "sample_neyman_alloc",
    tags=("pipeline",),
    oracle=f"""
        -- Neyman optimal allocation (Neyman 1934): under a fixed
        -- total budget, sample stratum h proportionally to N_h*sigma_h
        -- — minimum-variance stratified sampling. The leg is computed
        -- EXACTLY: N_h*sigma_h = sqrt(N_h*sum(w^2) - sum(w)^2)
        -- (population-variance identity, integer radicand), one IEEE
        -- correctly-rounded sqrt + FLOOR per stratum (HUGEINT->DOUBLE
        -- cast is correctly rounded on both engines), then the
        -- allocation shares are exact integer floor divisions.
        WITH s AS (
            SELECT lang,
                   CAST(COUNT(*) AS HUGEINT) AS n_docs,
                   CAST(SUM(n_chars) AS HUGEINT) AS sw,
                   CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars)
                        AS HUGEINT) AS sw2
            FROM documents GROUP BY 1
        ),
        g AS (
            SELECT lang, n_docs, sw,
                   CAST(FLOOR(SQRT(CAST(n_docs * sw2 - sw * sw
                                        AS DOUBLE)))
                        AS HUGEINT) AS leg
            FROM s
        ),
        tot AS (SELECT SUM(leg) AS tleg FROM g)
        SELECT g.lang,
               CAST(g.n_docs AS BIGINT) AS n_docs,
               CAST(g.sw AS BIGINT) AS sum_w,
               CAST(g.leg AS BIGINT) AS neyman_leg,
               CAST((10000 * g.leg) // tot.tleg AS BIGINT) AS alloc_bp,
               CAST(({_NEY_BUDGET} * g.leg) // tot.tleg AS BIGINT)
                   AS n_alloc
        FROM g CROSS JOIN tot
    """,
)
def sample_neyman_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman optimal stratified allocation — under a fixed labeling /
    eval budget, sample each stratum (language here) proportionally to
    N_h·σ_h, the minimum-variance design (Neyman 1934). The design-of-
    experiments complement to `sample_stratified` (which executes a
    GIVEN allocation) and `sample_ess_audit` (which audits weights
    after the fact): this op COMPUTES the allocation.

    Exactness: the leg N_h·σ_h = sqrt(N_h·Σw² − (Σw)²) uses the
    population-variance identity so the radicand is ONE exact
    decimal(38,0) integer; the only float op per stratum is the IEEE
    correctly-rounded sqrt (+FLOOR) of that radicand (the
    decimal→double cast is correctly rounded on both engines, so the
    grid value is bit-stable even past 2⁵³); shares and the budget
    split are exact integer floor divisions.

    Plan/scale: ONE map-side-combinable hash agg over the stratum key
    computes all three moments in a single column-pruned pass (no
    text bytes move); everything after is |strata| rows. Radicand
    stays within 38 digits to ~10¹⁰ docs at these weight grids."""
    docs = table(spark, sf_dir, "documents")
    dec = "decimal(38,0)"
    s = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast(dec).alias("n_docs"),
        F.sum("n_chars").cast(dec).alias("sw"),
        F.sum(F.expr(f"CAST(n_chars AS {dec}) * n_chars")).alias("sw2"),
    )
    g = s.select(
        "lang",
        "n_docs",
        "sw",
        F.expr(
            f"CAST(FLOOR(SQRT(CAST(n_docs * sw2 - sw * sw AS DOUBLE)))"
            f" AS {dec})"
        ).alias("leg"),
    )
    tot = g.agg(F.sum("leg").alias("tleg"))
    return g.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("sw").cast("long").alias("sum_w"),
        F.col("leg").cast("long").alias("neyman_leg"),
        F.expr("CAST((10000 * leg) div tleg AS BIGINT)").alias(
            "alloc_bp"
        ),
        F.expr(
            f"CAST(({_NEY_BUDGET} * leg) div tleg AS BIGINT)"
        ).alias("n_alloc"),
    )


# --------------------------------------------------------------------------
# tokenize_fertility — per-corpus-slice tokenizer fertility audit (round 12)
# --------------------------------------------------------------------------

# Same portable subword proxy as operators/text.py:_SUBWORD_RE (maximal
# vowel/consonant runs); duplicated as a literal because the oracle SQL
# embeds it verbatim and the two must stay in lockstep HERE.
# Portability envelope (same class as the CDC ASCII doctrine): the \s
# class is Java-regex on Spark and RE2 on DuckDB, which disagree on
# exotic whitespace (Java \s includes \x0B, RE2's does not) — the
# equivalence is certified for the space-separated printable-ASCII
# corpus contract the documents table carries, not arbitrary bytes.
_FERT_SUBWORD_RE = r"[aeiou]+|[^aeiou\s]+"


@register(
    "tokenize_fertility",
    tags=("b10",),
    oracle=r"""
        -- Tokenizer fertility per (lang, source) slice: subword
        -- tokens per whitespace word and chars per subword token --
        -- THE multilingual tokenizer-efficiency table (SentencePiece /
        -- XLM-R report exactly this: languages with fertility >> 1 pay
        -- more context budget per word; slices driving it up are
        -- tokenizer-vocabulary gaps). Same portable subword proxy as
        -- text_token_count (maximal vowel/consonant runs); exact
        -- integer milli ratios via floor cross-multiplies.
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS ws_tokens,
               CAST(SUM(len(regexp_extract_all(
                        text, '[aeiou]+|[^aeiou\s]+'))) AS BIGINT)
                   AS subword_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars,
               CAST(1000 * SUM(len(regexp_extract_all(
                        text, '[aeiou]+|[^aeiou\s]+')))
                    // SUM(len(string_split(text, ' ')))
                    AS BIGINT) AS fertility_milli,
               CAST(CASE WHEN SUM(len(regexp_extract_all(
                             text, '[aeiou]+|[^aeiou\s]+'))) = 0 THEN 0
                         ELSE 1000 * SUM(n_chars)
                              // SUM(len(regexp_extract_all(
                                     text, '[aeiou]+|[^aeiou\s]+')))
                    END AS BIGINT) AS chars_per_subword_milli
        FROM documents
        GROUP BY lang, source
    """,
)
def tokenize_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per (lang, source) slice — subword tokens
    per whitespace word (fertility) and chars per subword token. The
    table a tokenizer owner reads before adding vocabulary: fertility
    far above the corpus norm on a slice means that slice's words
    shatter into many pieces and burn context budget (the standard
    multilingual-tokenizer efficiency metric). `text_token_count` is
    the per-DOC raw count; this is the corpus ROLLUP with exact
    integer milli ratios (1000·Σsub div Σws — floor cross-multiply,
    division-free decision grid).

    Plan/scale: the regexp counting is per-row codegen right above the
    scan; everything reduces through ONE map-side-combined hash agg
    on (lang, source) — partial aggregation ships six longs per slice
    per task, output bounded by |langs|×|sources|, never corpus size.
    The scan is parallelism-guarded (`parallel_table`): the per-row
    regexp dominates and the single-row-group test file would
    otherwise run it on one core (A/B at sf0.1: 4.5s → 0.9s, the same
    trap text_fingerprint documents).

    Ref parity: no counterpart in the reference (538-LoC k-means);
    capability-closure operator per SURVEY.md §2.B-10."""
    docs = parallel_table(spark, sf_dir, "documents")
    sub = F.regexp_count("text", F.lit(_FERT_SUBWORD_RE))
    ws = F.size(F.split("text", " "))
    agg = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(ws).cast("long").alias("ws_tokens"),
        F.sum(sub).cast("long").alias("subword_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "ws_tokens",
        "subword_tokens",
        "n_chars",
        # ws_tokens >= n_docs >= 1 on both engines (split of "" is [""]
        # — one element), so the fertility divisor can't be zero;
        # subword_tokens CAN be zero (all-whitespace slice) and integer
        # /0 semantics differ across engines, so it's CASE-guarded.
        F.expr("CAST(1000 * subword_tokens div ws_tokens AS BIGINT)").alias(
            "fertility_milli"
        ),
        F.expr(
            "CAST(CASE WHEN subword_tokens = 0 THEN 0"
            " ELSE 1000 * n_chars div subword_tokens END AS BIGINT)"
        ).alias("chars_per_subword_milli"),
    )


# --------------------------------------------------------------------------
# curate_quality_gate_sweep — quality-threshold yield curve (round 12)
# --------------------------------------------------------------------------

_QGATE_BP = (0, 1000, 2000, 3000, 4000, 5000, 6000)


@register(
    "curate_quality_gate_sweep",
    tags=("b10",),
    oracle=f"""
        -- Quality-gate yield curve: at each lexical-diversity gate
        -- (distinct-token ratio in exact floor bp), how many documents
        -- and how much token mass survive -- the "where do we set the
        -- quality bar" curve every corpus-curation decision reads
        -- (dedup_threshold_sweep is the same instrument pointed at
        -- dedup; this points it at quality filtering). Gates evaluate
        -- as conditional sums over ONE corpus pass; exact floor bp.
        WITH d AS (
            SELECT 10000 * len(list_distinct(string_split(text, ' ')))
                       // len(string_split(text, ' ')) AS q_bp,
                   len(string_split(text, ' ')) AS toks
            FROM documents
        ),
        tot AS (
            SELECT COUNT(*) AS all_docs, SUM(toks) AS all_toks FROM d
        )
        SELECT g.gate_bp,
               CAST(SUM(CASE WHEN d.q_bp >= g.gate_bp THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs_kept,
               CAST(SUM(CASE WHEN d.q_bp >= g.gate_bp THEN d.toks
                             ELSE 0 END) AS BIGINT) AS tokens_kept,
               CAST(10000 * SUM(CASE WHEN d.q_bp >= g.gate_bp THEN 1
                                     ELSE 0 END)
                    // MIN(tot.all_docs) AS BIGINT) AS docs_kept_bp,
               CAST(10000 * SUM(CASE WHEN d.q_bp >= g.gate_bp THEN d.toks
                                     ELSE 0 END)
                    // MIN(tot.all_toks) AS BIGINT) AS tokens_kept_bp
        FROM d CROSS JOIN tot
        CROSS JOIN (VALUES {", ".join(f"({g})" for g in _QGATE_BP)})
             AS g(gate_bp)
        GROUP BY g.gate_bp
    """,
)
def curate_quality_gate_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate yield curve: for each lexical-diversity gate
    (distinct-token ratio, exact floor bp), the documents and token
    mass a `q_bp >= gate` filter would keep, absolute and in bp of the
    corpus. This is the curve read before committing a quality bar —
    the knee where token yield collapses is the budget/quality
    frontier. Counterpart of `dedup_threshold_sweep` (which sweeps the
    cosine dedup threshold); the quality score is `text_quality`'s
    distinct-ratio leg on the exact integer grid.

    Plan/scale: NO join against a gates dim and NO per-gate rescan —
    the {n} gates compile to {n}×2 conditional sums inside ONE
    map-side-combined hash aggregate over a single corpus scan
    (partial aggregation ships ~{n}·2 longs per task); the bp algebra
    runs on the collapsed 1-row total. The gate dim in the ORACLE is a
    cross join for SQL brevity — same multiset, DuckDB-side only. The
    scan is parallelism-guarded (`parallel_table`): the per-row split +
    array_distinct is the same narrow-compute class as
    tokenize_fertility's regexp and would otherwise run on the
    single-row-group test file's one core.

    Ref parity: no counterpart in the reference (538-LoC k-means);
    capability-closure operator per SURVEY.md §2.B-10."""
    docs = parallel_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.select(
        F.expr(
            "CAST(10000 * size(array_distinct(split(text, ' ')))"
            " div size(split(text, ' ')) AS BIGINT)"
        ).alias("q_bp"),
        F.size(toks).cast("long").alias("toks"),
    )
    sums = []
    for g in _QGATE_BP:
        sums.append(
            F.sum(F.when(F.col("q_bp") >= g, 1).otherwise(0))
            .cast("long")
            .alias(f"d{g}")
        )
        sums.append(
            F.sum(F.when(F.col("q_bp") >= g, F.col("toks")).otherwise(0))
            .cast("long")
            .alias(f"t{g}")
        )
    one = d.agg(
        F.count(F.lit(1)).cast("long").alias("all_docs"),
        F.sum("toks").cast("long").alias("all_toks"),
        *sums,
    )
    rows = ", ".join(
        f"struct(CAST({g} AS BIGINT) AS gate_bp, d{g} AS n_docs_kept,"
        f" t{g} AS tokens_kept)"
        for g in _QGATE_BP
    )
    return one.select(
        F.explode(F.expr(f"array({rows})")).alias("r"),
        "all_docs",
        "all_toks",
    ).select(
        F.col("r.gate_bp").alias("gate_bp"),
        F.col("r.n_docs_kept").alias("n_docs_kept"),
        F.col("r.tokens_kept").alias("tokens_kept"),
        F.expr("CAST(10000 * r.n_docs_kept div all_docs AS BIGINT)").alias(
            "docs_kept_bp"
        ),
        F.expr(
            "CAST(10000 * r.tokens_kept div all_toks AS BIGINT)"
        ).alias("tokens_kept_bp"),
    )


# --------------------------------------------------------------------------
# sample_weighted_priority — deterministic priority sampling (round 14)
# --------------------------------------------------------------------------

_PRI_K = 8  # sample size per stratum


@register(
    "sample_weighted_priority",
    tags=("b10",),
    oracle=f"""
        -- Priority sampling (Duffield/Lund/Thorup, JACM '07): per
        -- language stratum draw k = {_PRI_K} docs with inclusion
        -- probability increasing in weight (n_chars). Each doc gets a
        -- deterministic 60-bit md5 draw h; its priority is the exact
        -- integer floor(h / w) — small h or large w = small priority;
        -- the k smallest priorities win. The 60-bit draw towers over
        -- any realistic weight, so integer flooring keeps ~40+ bits
        -- of resolution and everything stays inside BIGINT on both
        -- engines. tau (the (k+1)-th priority) is the stratum
        -- threshold the Horvitz-Thompson estimator needs: est_w =
        -- max(w, tau-inverse) per kept doc. Everything is integer, so
        -- both engines replay identical samples.
        WITH d AS (
            SELECT lang, doc_id, n_chars AS w,
                   ('0x' || substr(md5('pri:' || doc_id::VARCHAR),
                                   1, 15))::BIGINT AS h
            FROM documents
            WHERE n_chars > 0
        ),
        p AS (
            SELECT lang, doc_id, w,
                   CAST(h // w AS BIGINT) AS priority
            FROM d
        ),
        r AS (
            SELECT lang, doc_id, w, priority,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY priority, doc_id) AS rn
            FROM p
        ),
        tau AS (
            SELECT lang, priority AS tau
            FROM r WHERE rn = {_PRI_K + 1}
        )
        SELECT r.lang, r.doc_id, r.w, r.priority,
               CAST(r.rn AS INT) AS rank,
               t.tau
        FROM r LEFT JOIN tau t ON t.lang = r.lang
        WHERE r.rn <= {_PRI_K}
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT floats or RNG state: priority
    sampling (Duffield, Lund & Thorup, JACM '07) with a deterministic
    md5 draw — per language stratum, doc i gets priority
    floor(h_i / w_i) and the k smallest priorities are the
    sample, so heavier docs (here: n_chars — at a real 100 TB run,
    token counts) are proportionally likelier to be kept. The
    emitted `tau` ((k+1)-th priority, NULL when the stratum fits
    entirely) is exactly what the downstream Horvitz-Thompson
    estimator needs to reweight the sample into unbiased stratum
    totals — the reason production pipelines use priority sampling
    over ad-hoc weighted picks. The integer floor-division is exact
    and identical in both engines (the 60-bit draw keeps 40+ bits of
    resolution above any realistic weight), ties broken by
    doc_id: the sample is a pure function of the corpus — stable
    across retries, engines, and partitionings, like every sampler in
    this module.

    Plan/scale: one narrow projection computes priorities inside
    whole-stage codegen (no RNG, no UDF), then the bottom-k window
    runs under WindowGroupLimit rank pushdown — map tasks emit at
    most k+1 rows per stratum before the single shuffle, so exchange
    volume is partitions×(k+1)×strata regardless of corpus size. The
    tau join is strata-sized and broadcasts.

    Ref parity: no counterpart in the reference (538-LoC k-means);
    capability-closure operator per SURVEY.md §2.B-10."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").alias("w"),
            F.expr(
                "CAST(conv(substr(md5(concat('pri:',"
                " CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    p = d.select(
        "lang",
        "doc_id",
        "w",
        F.expr("h div w").alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy("priority", "doc_id")
    r = p.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _PRI_K + 1
    )
    tau = (
        r.filter(F.col("rn") == _PRI_K + 1)
        .select("lang", F.col("priority").alias("tau"))
    )
    return (
        r.filter(F.col("rn") <= _PRI_K)
        .join(F.broadcast(tau), "lang", "left")
        .select(
            "lang",
            "doc_id",
            "w",
            "priority",
            F.col("rn").cast("int").alias("rank"),
            "tau",
        )
    )
