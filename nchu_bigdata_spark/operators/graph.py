"""Graph analytics over the part co-purchase graph (SURVEY.md
§2.B-ext): PageRank and triangle counting.

The graph: parts are vertices; an undirected edge connects two parts
that appear together in at least one order ("frequently bought
together") — derived with one lineitem self-join on ``l_orderkey``
(per-order width bounds the pair blowup) + a distinct. The reference
has no graph surface at all; these add the two canonical iterative /
combinatorial graph kernels every warehouse-adjacent engine ends up
needing (influence ranking, community density).

Cross-engine determinism (the hard part of iterative float algorithms)
is solved by working in SCALED INT64 ARITHMETIC: ranks are integers
(1e9 = rank 1.0), every per-edge contribution is an integer division
``r div deg``, and the damping update is ``(85 * sum) div 100`` — all
exact, associative, and bit-identical on Spark and DuckDB, so a
5-iteration PageRank hash-checks against an UNROLLED 5-CTE SQL replay
with no float tolerance anywhere.

Scale notes (100 TB):
  * Edge derivation: shuffle on l_orderkey (bounded per-order groups),
    distinct on (u, v) — one more shuffle, vocabulary-sized output.
  * PageRank: each iteration is ONE shuffle (contributions aggregated
    by destination, partial sums map-side); edges and degrees are
    checkpointed once and reused across iterations instead of being
    recomputed 5× (``materialize.shared_intermediate``). Per-node
    state is a DataFrame — never collected to the driver — so vertex
    cardinality is unbounded.
  * Triangles: edges are ORIENTED from lower to higher (degree, id) —
    the classic trick that bounds every vertex's out-degree by
    O(sqrt(|E|)) under power-law degree distributions — and counted by
    ADJACENCY-INTERSECTION (per-edge |N(u) ∩ N(v)| over sorted
    neighbor arrays) so the Σ in·out wedge rows never materialize in a
    shuffle (the 10× scale probe caught the wedge-join form going
    super-linear; see SCALE_PROBE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.materialize import (
    shared_intermediate,
    shared_partitioned,
)
from nchu_bigdata_spark.registry import register

# Scaled-integer PageRank parameters: rank 1.0 == _PR_SCALE; damping
# 0.85 expressed as the exact integer update (85 * x) div 100.
_PR_SCALE = 1_000_000_000
_PR_BASE = 150_000_000  # (1 - 0.85) * _PR_SCALE
_PR_ITERS = 5

# Shared edge-derivation SQL (both graph oracles start from this).
_EDGES_SQL = """
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
"""


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, undirected: bool = False
) -> DataFrame:
    """Distinct co-purchase edges: ``undirected=True`` yields u < v
    half-pairs; the default symmetrizes via a post-distinct union (the
    dedup shuffle always carries only half-pair volume).

    Round-8 derivation (2× faster than the r6 lineitem self-join, same
    edge set): ONE orderkey shuffle builds per-order part sets
    (``collect_set`` — map-side combined), then all C(n,2) normalized
    pairs generate inside whole-stage codegen via nested ``transform``
    over the array (position i × positions >i, ``least``/``greatest``
    orients u < v), and ONE distinct shuffle dedups half-pair volume.
    The self-join form shuffled lineitem twice and pushed the
    symmetric (2×) pair stream through the distinct. Per-order
    fan-out is C(basket,2) in both forms; baskets are bounded (≤7
    lines in this schema) — a retail-scale basket cap would clamp
    ``ps`` with ``slice`` before the pair transform."""
    li = table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    half = (
        parts.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(least(x, y) AS u, greatest(x, y) AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
    )
    if undirected:
        return half
    return half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _pagerank_oracle() -> str:
    """Unrolled 5-iteration integer-PageRank CTE chain — the exact
    replay of the DataFrame loop (same scaled-int recurrence)."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u)",
        f"r0 AS (SELECT u AS node, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
                SELECT e.v AS node,
                       CAST({_PR_BASE} + (85 * SUM(r.r // d.d)) // 100 AS BIGINT) AS r
                FROM edges e
                JOIN r{i - 1} r ON r.node = e.u
                JOIN deg d ON d.u = e.u
                GROUP BY e.v
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT node AS p_partkey, r AS rank_scaled FROM r{_PR_ITERS}"
    )


@register("graph_pagerank", tags=("graph",), oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 fixed iterations, damping 0.85) over the part
    co-purchase graph, in exact scaled-int64 arithmetic (module doc).
    ``rank_scaled`` is the per-node-scale rank × 1e9; the per-node base
    term makes the recurrence N-independent.

    Plan: the edge table (with out-degree folded in) is computed once
    and localCheckpointed; each iteration is then ONE join
    (edges ⋈ ranks on the source) + one hash-agg on the destination —
    partial integer sums combine map-side, and the rank state never
    leaves the cluster (contrast: ``kmeans_fit`` collects k centroid
    rows; here the state is vertex-cardinality, so it stays a
    DataFrame)."""
    raw = _copurchase_edges(spark, sf_dir)
    deg = raw.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # Fold the out-degree INTO the frozen edge table once, so every
    # iteration is a single join (edges⋈ranks) instead of two — at
    # 100 TB that's one shuffle less per iteration, forever. r14 (guide
    # §2.4): the frozen segment is a u-partitioned PERSIST, not a
    # localCheckpoint — a checkpoint scans back as `Scan ExistingRDD`
    # with unknown partitioning, so all 5 per-iteration SHUFFLE_HASH
    # joins re-exchanged the |E|-row edge table; the cached
    # InMemoryTableScan reports hashpartitioning(u), so only the
    # |V|-row rank side moves per iteration (the graph_random_walk
    # rework, applied here).
    edges = shared_partitioned(
        "pagerank_edges", raw.join(deg, "u").repartition("u")
    )
    # Initial ranks come FROM the frozen segment (distinct sources), so
    # the lineitem pair derivation runs exactly once for the whole
    # query.
    ranks = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.lit(_PR_SCALE).cast("long").alias("r")
    )
    # SHUFFLE_HASH on the per-iteration join (the module's iterative
    # rule): the rank side is |V| rows and AQE would broadcast it —
    # five broadcasts retained in ONE unrolled plan OOMed the 8g
    # driver at the r11 10× probe (the CC/PPR incident, third time).
    # Shuffle-hash bounds every iteration's memory to one partition.
    for _ in range(_PR_ITERS):
        contrib = edges.join(
            ranks.hint("shuffle_hash"), edges.u == ranks.node
        ).select("v", F.expr("r DIV d").alias("c"))
        ranks = (
            contrib.groupBy("v")
            .agg(
                (F.lit(_PR_BASE) + F.expr("85 * sum(c) DIV 100"))
                .cast("long")
                .alias("r")
            )
            .select(F.col("v").alias("node"), "r")
        )
    return ranks.select(
        F.col("node").alias("p_partkey"), F.col("r").alias("rank_scaled")
    )


@register(
    "graph_triangles",
    tags=("graph",),
    oracle=f"""
        WITH sym AS ({_EDGES_SQL}),
        pairs AS (SELECT u AS x, v AS y FROM sym WHERE u < v),
        deg AS (
            SELECT n, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT x AS n FROM pairs UNION ALL SELECT y FROM pairs)
            GROUP BY n
        ),
        o AS (
            SELECT CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.x ELSE p.y END AS u,
                   CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.y ELSE p.x END AS v
            FROM pairs p
            JOIN deg dx ON dx.n = p.x
            JOIN deg dy ON dy.n = p.y
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_edges,
               CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM o e1
        JOIN o e2 ON e2.u = e1.v
        JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the undirected part co-purchase graph, with
    node/edge counts — the graph-density probe behind clustering
    coefficients and community detection.

    Degree-ordered orientation (module doc): every edge points from
    its lower (degree, id) endpoint to the higher, so each triangle is
    counted EXACTLY once and every oriented out-degree is bounded by
    O(sqrt(|E|)) even on power-law hubs.

    Counting uses the ADJACENCY-INTERSECTION formulation (round-7
    speedup, 2× over the wedge join on this corpus): per-node sorted
    out-neighbor arrays, then for each oriented edge (u, v) the
    triangles through it are |N(u) ∩ N(v)| — a JVM ``array_intersect``
    per edge row. Versus materializing every wedge as a row and hash-
    probing the closure join per wedge (Σ in·out rows through a
    shuffle), the intersection never materializes wedges: state is the
    |E|-row adjacency table (arrays ≤ out-degree ≤ √|E| — the same
    orientation bound), moved through two vertex-keyed equi hash
    joins, and the Σ|N(u)|+|N(v)| intersection work runs inside
    whole-stage codegen. The oracle replays the wedge-join SQL form —
    same count, independent mechanism."""
    half, deg, o = _oriented_adjacency(spark, sf_dir, "triangles")
    tri = _tri_count(o)
    counts = deg.agg(F.count(F.lit(1)).alias("n_nodes")).crossJoin(
        F.broadcast(o.agg(F.count(F.lit(1)).alias("n_edges")))
    )
    return F.broadcast(counts).crossJoin(tri).select("n_nodes", "n_edges", "n_triangles")


def _oriented_adjacency(spark: SparkSession, sf_dir: str, tag: str):
    """Shared triangle machinery: ONE frozen half-pair derivation
    (r15, guide §2.4 — the old graph_triangles plan re-ran the
    lineitem pair-gen + distinct chain 5× because the degree union
    scans the pair table twice and is itself instantiated as dx, dy
    and n_nodes; 14 parquet scans in the before plan), undirected
    degrees from the frozen table's endpoint union (identical
    integers: the half-pair count incident to n IS its symmetric
    degree), and the degree-oriented edge table as a u-partitioned
    persist instead of a localCheckpoint (r15 A/B at sf0.1: 4.41 →
    3.63 s min — the adjacency groupBy(u) and the per-edge u-join
    both read the preserved hashpartitioning, erasing two |E|
    exchanges; same §2.4 mechanism the r14 iterative kernels
    adopted)."""
    half = shared_intermediate(
        f"{tag}_half", _copurchase_edges(spark, sf_dir, undirected=True)
    )
    deg = (
        half.select(F.col("u").alias("n"))
        .unionAll(half.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    lt = F.struct(F.col("dx"), F.col("x")) < F.struct(F.col("dy"), F.col("y"))
    o = shared_partitioned(
        f"{tag}_oriented",
        half.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(lt, F.col("x")).otherwise(F.col("y")).alias("u"),
            F.when(lt, F.col("y")).otherwise(F.col("x")).alias("v"),
        )
        .repartition("u"),
    )
    return half, deg, o


def _tri_count(o: DataFrame) -> DataFrame:
    """1-row triangle count over a degree-oriented edge table via
    sorted-adjacency intersection (the audited round-7 formulation)."""
    adj = o.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nb"))
    au = adj.select("u", F.col("nb").alias("nu"))
    av = adj.select(F.col("u").alias("v"), F.col("nb").alias("nv"))
    return (
        o.join(au, "u")
        .join(av, "v")  # inner: a v without out-edges closes no triangle
        .agg(
            F.coalesce(
                F.sum(F.size(F.array_intersect("nu", "nv"))), F.lit(0)
            )
            .cast("long")
            .alias("n_triangles")
        )
    )


# --------------------------------------------------------------------------
# graph_bfs — frontier-expansion shortest hop distances (round 7)
# --------------------------------------------------------------------------

_BFS_DEPTH = 3


def _bfs_oracle() -> str:
    """Unrolled frontier CTE chain: level sets f0..f3, then MIN(dist)
    per node — the classic re-expansion-tolerant replay (a node reached
    at several levels keeps its smallest), which is exactly BFS
    distance for depth <= _BFS_DEPTH."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "f0 AS (SELECT MIN(u) AS node FROM edges)",
    ]
    for d in range(1, _BFS_DEPTH + 1):
        ctes.append(
            f"""f{d} AS (
                SELECT DISTINCT e.v AS node
                FROM edges e JOIN f{d - 1} f ON e.u = f.node
            )"""
        )
    levels = " UNION ALL ".join(
        f"SELECT node, {d} AS dist FROM f{d}" for d in range(_BFS_DEPTH + 1)
    )
    return (
        "WITH " + ",\n".join(ctes) + f",\nlv AS ({levels})\n"
        "SELECT node AS p_partkey, CAST(MIN(dist) AS BIGINT) AS dist\n"
        "FROM lv GROUP BY node"
    )


@register("graph_bfs", tags=("graph",), oracle=_bfs_oracle())
def graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breadth-first search from the smallest part vertex: hop distance
    (<= 3) over the co-purchase graph — the reachability / ego-network
    primitive behind "parts within N recommendation hops".

    Spark formulation is FRONTIER EXPANSION, the scale-safe BFS shape:
    per level, ONE equi join (edges x frontier on the source vertex) +
    a distinct, then a left-anti join against the visited set so
    already-settled vertices never re-expand. Each frontier is
    localCheckpointed (``shared_intermediate``) so iteration d+1 starts
    from a materialized vertex set instead of replaying the whole
    lineage — the same per-iteration budget rule as ``graph_pagerank``.
    State (visited, frontier) is vertex-cardinality DataFrames, never
    collected to the driver.

    The oracle replays the UNROLLED level-set SQL (module helper):
    re-expansion is allowed there and MIN(dist) recovers the BFS
    distance — an independent mechanism, same answer.

    At 100 TB: cost per level is one shuffle keyed on the frontier's
    source vertices; the anti join keeps every frontier's row count
    monotonically shrinking toward the BFS fringe instead of the
    exponential re-expansion the naive unrolled form pays."""
    # r14 (guide §2.4): u-partitioned persist instead of localCheckpoint
    # — the checkpoint erased the partitioning, so every level's
    # frontier join re-exchanged the full |E|-row edge table; the cache
    # keeps hashpartitioning(u) visible and only the (shrinking)
    # frontier shuffles per level. SHUFFLE_HASH on the frontier side:
    # broadcast would stack one retained relation per level (the CC 10×
    # incident), and SMJ would sort the edge side per level.
    edges = shared_partitioned(
        "bfs_edges", _copurchase_edges(spark, sf_dir).repartition("u")
    )
    # No broadcast hint on the seed: it flows into the `visited`
    # unionAll chain, where a join hint is dead (HintErrorLogger noise
    # in every gate run — VERDICT r10 item 5). The 1-row seed side of
    # the level-1 join is broadcast by AQE's runtime size stats anyway,
    # and later frontiers are checkpointed rows with accurate sizes.
    src = edges.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    visited = src
    frontier = src.select("node")
    for d in range(1, _BFS_DEPTH + 1):
        nxt = (
            edges.join(
                frontier.withColumnRenamed("node", "u").hint("shuffle_hash"),
                "u",
            )
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        nxt = shared_intermediate(f"bfs_frontier_{d}", nxt)
        visited = visited.unionAll(
            nxt.select("node", F.lit(d).cast("long").alias("dist"))
        )
        frontier = nxt
    return visited.select(F.col("node").alias("p_partkey"), "dist")


# --------------------------------------------------------------------------
# graph_degree_distribution — log2-bucketed degree histogram (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_degree_distribution",
    tags=("graph",),
    oracle=f"""
        WITH sym AS ({_EDGES_SQL}),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
        )
        SELECT bucket,
               CAST(2 ** bucket AS BIGINT) AS lo_degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(d) AS BIGINT) AS min_degree,
               CAST(MAX(d) AS BIGINT) AS max_degree
        FROM (SELECT d, CAST(length(bin(d)) - 1 AS INT) AS bucket FROM deg)
        GROUP BY bucket
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log₂-bucketed degree histogram of the co-purchase graph — the
    power-law probe run BEFORE committing to a graph plan: it tells
    you whether hubs exist (skew-join mitigation needed, triangle
    orientation worth it) and bounds the frontier fan-out of
    ``graph_bfs``. Every serious graph pipeline starts here; the
    engine's own triangle orientation (degree-ordered, O(√E) bound)
    is justified exactly by this distribution's tail.

    Bucketing is EXACT integer arithmetic portable across engines:
    ``bucket = length(bin(d)) - 1`` = floor(log₂ d) via the binary
    string length — both engines' ``bin`` emit minimal binary digits,
    no float log to straddle a power-of-two boundary.

    Plan/scale: degree agg (one shuffle over edge endpoints, map-side
    combined) then a ≤64-group hash agg — bucket cardinality is
    bounded by the int64 width forever."""
    deg = _copurchase_edges(spark, sf_dir).groupBy("u").agg(
        F.count(F.lit(1)).alias("d")
    )
    bucket = (F.length(F.bin("d")) - 1).cast("int")
    return (
        deg.select("d", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
        )
        .select(
            "bucket",
            F.pow(F.lit(2.0), F.col("bucket")).cast("long").alias("lo_degree"),
            "n_nodes",
            "min_degree",
            "max_degree",
        )
    )


# --------------------------------------------------------------------------
# graph_neighbor_jaccard — per-edge neighborhood similarity (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_neighbor_jaccard",
    tags=("graph",),
    oracle=f"""
        -- link-analysis staple: Jaccard similarity of the two
        -- endpoints' neighbor sets for every edge (embeddedness /
        -- tie-strength). Raw neighborhoods (endpoints included);
        -- |N(u) ∪ N(v)| = du + dv − common ≥ 2, so the basis-point
        -- floor division is always defined. Pure integers cross
        -- engines.
        WITH sym AS ({{edges}}),
        half AS (SELECT u, v FROM sym WHERE u < v),
        deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
                FROM sym GROUP BY u),
        com AS (
            SELECT e.u, e.v, CAST(COUNT(b.v) AS BIGINT) AS c
            FROM half e
            JOIN sym a ON a.u = e.u
            LEFT JOIN sym b ON b.u = e.v AND b.v = a.v
            GROUP BY e.u, e.v
        )
        SELECT com.u, com.v,
               com.c AS common_neighbors,
               du.d AS degree_u,
               dv.d AS degree_v,
               CAST(com.c * 10000 // (du.d + dv.d - com.c)
                    AS BIGINT) AS jaccard_bp
        FROM com
        JOIN deg du ON du.u = com.u
        JOIN deg dv ON dv.u = com.v
    """.format(edges=_EDGES_SQL),
)
def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge NEIGHBORHOOD Jaccard — the tie-strength / embeddedness
    coefficient of link analysis (strong ties share neighbors, bridges
    don't): for every co-purchase edge u<v, |N(u)∩N(v)| over
    |N(u)∪N(v)| in exact basis points, with the raw degrees alongside.
    Recommender candidate scoring and community-boundary detection
    both read this table.

    Exactness: neighborhoods are DISTINCT node sets, so intersection /
    union sizes are integers; the score is the floor cross-multiply
    ``c·10⁴ div (du+dv−c)`` (denominator ≥ 2 always — v∈N(u) keeps
    the union non-empty), never a float ratio.

    Plan/scale: adjacency collapses to one node→sorted-neighbor-set
    table (ONE shuffle, map-side combined); each half-edge then takes
    two build-side hash-join probes and a codegen'd
    ``array_intersect`` — the dedup_ngram_jaccard hot-set pattern.
    Work is Σ_edges(du+dv) = O(Σd²) wedge volume, the same inherent
    bound as triangle counting; hub rows are single wide rows, not
    row blow-ups, so AQE's skew splitter handles power-law tails.
    r15 (§2.4): the half-pair table is frozen ONCE and the symmetric
    table is its swap-union — the old form ran the full lineitem
    pair-gen + distinct chain twice (once symmetrized for adjacency,
    once as half-pairs for the edge stream)."""
    half = shared_intermediate(
        "nj_half", _copurchase_edges(spark, sf_dir, undirected=True)
    )
    sym = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nbr = sym.groupBy("u").agg(
        F.array_sort(F.collect_set("v")).alias("ns"),
        F.count(F.lit(1)).alias("d"),
    )
    a = nbr.select(
        F.col("u").alias("au"), F.col("ns").alias("a_ns"),
        F.col("d").alias("degree_u"),
    )
    b = nbr.select(
        F.col("u").alias("bu"), F.col("ns").alias("b_ns"),
        F.col("d").alias("degree_v"),
    )
    j = (
        half.join(a, half.u == a.au)
        .join(b, half.v == b.bu)
        .select(
            "u",
            "v",
            F.size(F.array_intersect("a_ns", "b_ns"))
            .cast("long")
            .alias("common_neighbors"),
            F.col("degree_u").cast("long").alias("degree_u"),
            F.col("degree_v").cast("long").alias("degree_v"),
        )
    )
    return j.withColumn(
        "jaccard_bp",
        F.expr(
            "common_neighbors * 10000 div "
            "(degree_u + degree_v - common_neighbors)"
        ).cast("long"),
    )


# --------------------------------------------------------------------------
# graph_kcore_peel — bounded-round k-core decomposition (round 8)
# --------------------------------------------------------------------------

_KC_ROUNDS = 3


def _kcore_round_sql(i: int) -> str:
    """One peel round as CTE fragments: edges among the previous alive
    set, fresh degrees, fresh alive set. Shared verbatim by the unrolled
    DuckDB oracle (only the integer-div token differs, handled by the
    caller)."""
    p = i - 1
    return f"""
        e{i} AS (
            SELECT e.u, e.v FROM e{p} e
            JOIN a{p} x ON e.u = x.u
            JOIN a{p} y ON e.v = y.u
        ),
        d{i} AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
                 FROM e{i} GROUP BY u),
        a{i} AS (SELECT d{i}.u FROM d{i}, kk WHERE d >= k)"""


@register(
    "graph_kcore_peel",
    tags=("b11",),
    oracle=f"""
        -- k-core peel, {_KC_ROUNDS} rounds unrolled: k = ceil(mean
        -- degree) (exact integers — (Σd + n − 1) // n), peel vertices
        -- with degree < k, recompute degrees among survivors, repeat.
        -- Survivors after round {_KC_ROUNDS} with their residual
        -- degrees = the dense backbone of the co-purchase graph (the
        -- community-core extraction step recommender pipelines run
        -- before expensive clustering). Bounded rounds, like
        -- graph_bfs's level cap — the fixpoint variant just loops the
        -- same round shape.
        WITH e0 AS ({{edges}}),
        d0 AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d
               FROM e0 GROUP BY u),
        kk AS (SELECT (3 * SUM(d) + 4 * COUNT(*) - 1)
                   // (4 * COUNT(*)) AS k FROM d0),
        a0 AS (SELECT d0.u FROM d0, kk WHERE d >= k),
        {','.join(_kcore_round_sql(i) for i in range(1, _KC_ROUNDS + 1))}
        SELECT d{_KC_ROUNDS}.u AS part_key, d AS core_deg
        FROM d{_KC_ROUNDS}, kk WHERE d >= k
    """.format(edges=_EDGES_SQL),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition of the co-purchase graph: with
    k = ceil(0.75 · mean degree) (data-dependent, exact integer
    arithmetic — the events_rfm mean-split policy applied to graphs;
    the 3/4 factor keeps the cascade non-trivial on a near-regular
    co-purchase graph, where a full-mean cut peels to empty in two
    rounds), repeatedly
    drop vertices whose degree among survivors falls below k. Three
    peel rounds are unrolled; survivors with their residual degrees
    are the graph's dense backbone — what community detection and
    recommender clustering run on after shedding the sparse fringe.
    The fixpoint algorithm is this exact round shape looped until no
    vertex drops (graph_bfs's bounded-level precedent).

    Determinism: k derives from the initial degree table with a
    ceiling division in integers; every round is joins + counts — no
    floats anywhere.

    Plan/scale: the symmetric edge table is localCheckpointed ONCE
    (shared_intermediate) and each round re-filters it with two
    alive-set hash joins (alive shrinks monotonically — AQE broadcasts
    it as soon as it fits) followed by one map-side-combined degree
    agg; k is a 1-row broadcast. State stays vertex/edge-cardinality
    DataFrames — nothing is collected. Per-round cost falls as the
    fringe sheds; the classic distributed k-core shape (Quick et al.'s
    Pregel formulation maps to the same join-agg round)."""
    # r14 note: tried the u-partitioned persist here (the graph_bfs
    # rework) — it REGRESSED ~3× at sf0.1: with accurate cache stats
    # the planner stops AQE-broadcasting the shrinking alive set and
    # sort-merges the |E|-row side twice per round. The checkpointed
    # form keeps alive-side broadcasts; left as-is (measured, guide
    # §1.2: algorithm first, and the measurement said no).
    edges = shared_intermediate(
        "kcore_edges", _copurchase_edges(spark, sf_dir)
    )
    d = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    kk = d.groupBy().agg(
        F.expr("(3 * sum(d) + 4 * count(1) - 1) div (4 * count(1))").alias("k")
    )
    alive = d.join(F.broadcast(kk)).where(F.col("d") >= F.col("k")).select("u")
    cur = edges
    for _ in range(_KC_ROUNDS):
        cur = cur.join(alive, "u").join(
            alive.withColumnRenamed("u", "v"), "v"
        ).select("u", "v")
        d = cur.groupBy("u").agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )
        alive = (
            d.join(F.broadcast(kk)).where(F.col("d") >= F.col("k")).select("u")
        )
    return (
        d.join(F.broadcast(kk))
        .where(F.col("d") >= F.col("k"))
        .select(F.col("u").alias("part_key"), F.col("d").alias("core_deg"))
    )


# --------------------------------------------------------------------------
# graph_sssp_weighted — bounded Bellman-Ford shortest paths (round 8)
# --------------------------------------------------------------------------

_SSSP_ROUNDS = 3  # relaxation rounds => shortest paths using <= 3 edges

_WEDGES_SQL = """
        SELECT u, v, CAST(1000 // cnt AS BIGINT) AS w FROM (
            SELECT a.l_partkey AS u, b.l_partkey AS v,
                   COUNT(DISTINCT a.l_orderkey) AS cnt
            FROM lineitem a
            JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey
            GROUP BY 1, 2
        )
"""


def _sssp_oracle() -> str:
    """Unrolled Bellman-Ford CTE chain — the exact replay of the
    DataFrame relaxation loop (same integer weights, same min-merge)."""
    ctes = [
        f"edges AS ({_WEDGES_SQL})",
        "d0 AS (SELECT (SELECT MIN(u) FROM edges) AS node,"
        " CAST(0 AS BIGINT) AS dist)",
    ]
    prev = "d0"
    for r in range(1, _SSSP_ROUNDS + 1):
        ctes.append(
            f"""d{r} AS (
                SELECT node, MIN(dist) AS dist FROM (
                    SELECT node, dist FROM {prev}
                    UNION ALL
                    SELECT e.v AS node, p.dist + e.w AS dist
                    FROM {prev} p JOIN edges e ON e.u = p.node
                ) GROUP BY node
            )"""
        )
        prev = f"d{r}"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS p_partkey, CAST(dist AS BIGINT) AS dist"
        f" FROM {prev}"
    )


@register("graph_sssp_weighted", tags=("graph",), oracle=_sssp_oracle())
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (bounded Bellman-Ford,
    3 relaxation rounds) from the smallest part vertex: edge cost =
    1000 div shared-order-count, so strong co-purchase ties are cheap —
    the "how related are these products really" distance that plain
    BFS hop counts (`graph_bfs`) flatten.

    Spark formulation: per round, ONE equi join (current distance set
    × edges on the source vertex) + a min-merge hash agg — the
    relax-all-edges step of Bellman-Ford, which unlike Dijkstra needs
    no priority queue and is exactly the join+combine shape that
    distributes. Each round's state is localCheckpointed
    (`graph_pagerank`'s per-iteration budget rule); distances are
    exact integers, so the min-merge is deterministic. After R rounds
    the result is the exact shortest distance among paths of ≤ R
    edges (the oracle replays the identical unrolled recurrence).

    At 100 TB: cost per round is one shuffle keyed on settled
    vertices + one vertex-keyed agg; state never leaves the cluster.
    Negative edges can't occur (weights ≥ 1000/max-basket), so the
    bounded unroll is monotone non-increasing per vertex."""
    li = table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    half = (
        parts.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) -> "
                    "transform(slice(ps, i + 2, size(ps) - i - 1), "
                    "y -> struct(least(x, y) AS u, greatest(x, y) AS v))))"
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wedges = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"), "cnt")
    ).select("u", "v", F.expr("CAST(1000 div cnt AS BIGINT)").alias("w"))
    # r14 (guide §2.4): u-partitioned persist (see graph_bfs) — the
    # localCheckpoint form re-exchanged the weighted edge table on
    # every relaxation round; cached hashpartitioning(u) moves only
    # the settled-distance side per round.
    edges = shared_partitioned("sssp_edges", wedges.repartition("u"))
    # Seed carries no broadcast hint: it is unioned with the relaxed
    # set each round (dead-hint HintErrorLogger noise, VERDICT r10
    # item 5); AQE broadcasts the 1-row side of the round-1 join from
    # runtime stats, and subsequent rounds re-derive `dist` from the
    # groupBy so a seed hint never survived past round 1 anyway.
    dist = edges.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    for r in range(1, _SSSP_ROUNDS + 1):
        relaxed = (
            edges.join(
                dist.withColumnRenamed("node", "u").hint("shuffle_hash"),
                "u",
            )
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionAll(relaxed)
            .groupBy("node")
            .agg(F.min("dist").cast("long").alias("dist"))
        )
        dist = shared_intermediate(f"sssp_d{r}", dist)
    return dist.select(F.col("node").alias("p_partkey"), "dist")


# --------------------------------------------------------------------------
# graph_assortativity — degree assortativity coefficient (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_assortativity",
    tags=("graph",),
    oracle=f"""
        -- degree assortativity (Newman 2002): Pearson correlation of
        -- endpoint degrees over every directed edge of the symmetrized
        -- co-purchase graph. Positive = hubs link hubs (social shape),
        -- negative = hubs link leaves (dissortative, typical of
        -- product/technology graphs) — decides whether hub-removal or
        -- degree-sketch sampling strategies will work. agg_corr's
        -- exact-co-moment discipline: HUGEINT legs, IEEE-exact final
        -- derivation, no float tolerance.
        WITH sym AS ({_EDGES_SQL}),
        deg AS (
            SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u
        ),
        m AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                   SUM(CAST(da.d AS HUGEINT)) AS sx,
                   SUM(CAST(db.d AS HUGEINT)) AS sy,
                   SUM(CAST(da.d AS HUGEINT) * db.d) AS sxy,
                   SUM(CAST(da.d AS HUGEINT) * da.d) AS sxx,
                   SUM(CAST(db.d AS HUGEINT) * db.d) AS syy
            FROM sym e
            JOIN deg da ON da.u = e.u
            JOIN deg db ON db.u = e.v
        )
        SELECT CAST(n AS BIGINT) AS n_edges,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS assortativity
        FROM m
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of the
    co-purchase graph: Pearson r of endpoint degrees over every
    directed edge. Positive = hubs attach to hubs; negative = hub-and-
    spoke — the structural prior that decides whether degree-based
    sampling, hub pruning, or `graph_kcore_peel`'s backbone extraction
    will behave.

    Determinism: the six co-moment legs are decimal(38,0)/HUGEINT
    sums of int64 degree products (exact, order-independent); r
    derives from those identical integers with IEEE-exact
    cast/mul/sub/div/sqrt — the `agg_corr` / `ts_autocorr` discipline.

    Plan/scale: degree agg (map-side combined) + two hash-join probes
    of the degree table against the edge list (the same u-keyed and
    v-keyed exchanges `graph_neighbor_jaccard` pays), collapsing into
    a 1-row moment agg. Edge-linear work; no window, no sort."""
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    j = (
        edges.join(deg.withColumnRenamed("d", "da"), "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("db")), "v"
        )
    )
    m = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("da").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("db").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("CAST(da AS decimal(38,0)) * db")).alias("sxy"),
        F.sum(F.expr("CAST(da AS decimal(38,0)) * da")).alias("sxx"),
        F.sum(F.expr("CAST(db AS decimal(38,0)) * db")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                    "double"
                )
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
            )
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# graph_clustering_coeff — global clustering coefficient (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_clustering_coeff",
    tags=("graph",),
    oracle=f"""
        -- global clustering coefficient: 3·triangles / wedges, in
        -- floor bp — the one-number transitivity summary over the
        -- SAME oriented-edge derivation graph_triangles registers
        -- (shared _EDGES_SQL + orientation — the coefficient can't
        -- drift from the counts it divides). Wedges = Σ d(d−1)/2
        -- over undirected degrees, exact integers end-to-end.
        WITH sym AS ({_EDGES_SQL}),
        pairs AS (SELECT u AS x, v AS y FROM sym WHERE u < v),
        deg AS (
            SELECT n, CAST(COUNT(*) AS BIGINT) AS d
            FROM (SELECT x AS n FROM pairs UNION ALL SELECT y FROM pairs)
            GROUP BY n
        ),
        o AS (
            SELECT CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.x ELSE p.y END AS u,
                   CASE WHEN (dx.d, p.x) < (dy.d, p.y) THEN p.y ELSE p.x END AS v
            FROM pairs p
            JOIN deg dx ON dx.n = p.x
            JOIN deg dy ON dy.n = p.y
        ),
        tri AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM o e1
            JOIN o e2 ON e2.u = e1.v
            JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        wedge AS (
            SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
            FROM deg
        )
        SELECT n_triangles, n_wedges,
               CAST(CAST(3 AS HUGEINT) * n_triangles * 10000 // n_wedges
                    AS BIGINT) AS global_cc_bp
        FROM tri, wedge
    """,
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity): 3·triangles over
    wedges, in floor basis points — the one-number "how cliquish is
    this graph" summary that calibrates community-detection
    expectations and validates the co-purchase graph against random-
    graph nulls (G(n,p) would sit near d̄/n).

    Composition: the triangle count comes from the same
    `_oriented_adjacency`/`_tri_count` machinery as the registered
    `graph_triangles` (1-row output); wedges are one Σ d(d−1)/2 agg
    over the SAME undirected degree table (r15, §2.4 — the old form
    called graph_triangles() and then re-derived the symmetric edge
    table once more just for degrees; endpoint-union degree over the
    frozen half-pair table is the identical integer). The oracle
    shares `_EDGES_SQL` + the same orientation chain, so the
    coefficient can never drift from the counts it divides.
    3·T·10⁴ routes through HUGEINT/decimal(38,0) (T can reach 10¹²
    at social scale; ×3×10⁴ would wrap int64).

    Plan/scale: adds one degree agg + a 1-row×1-row broadcast join on
    top of the audited triangle plan — cost is the triangle count
    itself, which is inherent (wedge enumeration)."""
    half, deg, o = _oriented_adjacency(spark, sf_dir, "gcc")
    tri = _tri_count(o)
    wedge = deg.agg(
        F.sum(F.expr("CAST(d AS BIGINT) * (d - 1) div 2"))
        .cast("long")
        .alias("n_wedges")
    )
    return (
        F.broadcast(tri)
        .crossJoin(F.broadcast(wedge))
        .select(
            "n_triangles",
            "n_wedges",
            F.expr(
                "CAST(CAST(3 AS decimal(38,0)) * n_triangles * 10000"
                " div n_wedges AS BIGINT)"
            ).alias("global_cc_bp"),
        )
    )


# --------------------------------------------------------------------------
# graph_link_predict — Resource-Allocation link prediction (round 8)
# --------------------------------------------------------------------------

# Hub cap for wedge centers: a common neighbor w contributes
# _LP_SCALE div deg(w) to each of C(deg(w), 2) candidate pairs, so
# hubs cost quadratic fan-out for vanishing per-pair signal
# (<= _LP_SCALE/_LP_DEG_CAP each). Excluding them bounds the wedge
# blowup at C(cap, 2) per center — the standard RA/AA truncation.
_LP_SCALE = 1_000_000
_LP_DEG_CAP = 64
_LP_TOPK = 20


@register(
    "graph_link_predict",
    tags=("bext",),
    oracle=f"""
        -- Resource-Allocation link prediction (Zhou-Lu-Zhang 2009):
        -- score every NON-ADJACENT part pair at distance 2 by
        -- sum(1/deg(w)) over common neighbors w, in exact scaled
        -- integers ({_LP_SCALE} div deg — RA needs no log, unlike
        -- Adamic-Adar, so the score is bit-exact cross-engine).
        -- Centers with deg > {_LP_DEG_CAP} are excluded on BOTH
        -- engines (per-pair contribution <= {_LP_SCALE // _LP_DEG_CAP}
        -- there; the cap is what bounds the wedge fan-out).
        WITH edges AS ({_EDGES_SQL}),
        nb AS (
            SELECT u AS w, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY u
        ),
        wedge AS (
            SELECT e1.v AS a, e2.v AS b, n.d
            FROM edges e1
            JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN nb n ON n.w = e1.u
            WHERE n.d <= {_LP_DEG_CAP}
        ),
        cand AS (
            SELECT a, b,
                   CAST(SUM({_LP_SCALE} // d) AS BIGINT) AS ra_score,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM wedge GROUP BY a, b
        )
        SELECT a AS u, b AS v, ra_score, n_common
        FROM cand c
        ANTI JOIN edges e ON c.a = e.u AND c.b = e.v
        ORDER BY ra_score DESC, a, b
        LIMIT {_LP_TOPK}
    """,
)
def graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} link prediction over the co-purchase graph by the
    Resource-Allocation index (Zhou-Lu-Zhang 2009): for every
    NON-ADJACENT pair (u, v) at distance 2, score = sum over common
    neighbors w of 1/deg(w) — RA is the integer-friendly sibling of
    Adamic-Adar (1/deg instead of 1/log deg), so the whole scoring
    runs in exact scaled int64 (`_LP_SCALE` div deg) with zero float
    drift cross-engine. This is the "customers who bought these also
    bought..." candidate generator.

    Plan/scale: ONE groupBy(center) shuffle builds capped neighbor
    sets, then all C(deg, 2) wedge pairs generate INSIDE whole-stage
    codegen via the nested-transform expansion (`_copurchase_edges`'s
    trick — no self-join, no wedge-row shuffle until the candidate
    agg); one (a, b) hash agg sums scores; one left-anti hash join
    removes existing edges; TakeOrdered merges per-partition top-{k}
    heaps (no global sort, no single-partition window). Hub centers
    (deg > {cap}) are excluded up front — that caps per-center fan-out
    at C({cap}, 2) rows and drops only contributions <=
    {scale}/{cap} apiece, the standard RA truncation at scale.
    Total ties at rank {k} break by (u, v) on both engines.
    r15 (§2.4): the symmetric edge table is consumed twice (neighbor-
    set agg + the existing-edge anti join), so the half-pair table is
    frozen once and symmetrized by swap-union — one lineitem pair
    derivation instead of two."""
    half = shared_intermediate(
        "lp_half", _copurchase_edges(spark, sf_dir, undirected=True)
    )
    sym = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nb = sym.groupBy(F.col("u").alias("w")).agg(
        F.collect_set("v").alias("ns")
    )
    wedges = (
        nb.filter(
            (F.size("ns") >= 2) & (F.size("ns") <= _LP_DEG_CAP)
        )
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (x, i) -> "
                    "transform(slice(ns, i + 2, size(ns) - i - 1), "
                    "y -> struct(least(x, y) AS a, greatest(x, y) AS b))))"
                )
            ).alias("e"),
            F.expr(f"{_LP_SCALE} div size(ns)").alias("contrib"),
        )
        .select("e.a", "e.b", "contrib")
    )
    cand = wedges.groupBy("a", "b").agg(
        F.sum("contrib").cast("long").alias("ra_score"),
        F.count(F.lit(1)).cast("long").alias("n_common"),
    )
    nonadj = cand.join(
        sym, (cand.a == sym.u) & (cand.b == sym.v), "left_anti"
    )
    return (
        nonadj.select(
            F.col("a").alias("u"),
            F.col("b").alias("v"),
            "ra_score",
            "n_common",
        )
        .orderBy(F.desc("ra_score"), "u", "v")
        .limit(_LP_TOPK)
    )


# --------------------------------------------------------------------------
# graph_modularity — brand-partition modularity (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_modularity",
    tags=("bext",),
    oracle=f"""
        -- Newman modularity of the co-purchase graph under the PART
        -- BRAND partition: does "frequently bought together" cluster
        -- by brand? Q = sum_c [e_c/m - (d_c/2m)^2] is a rational;
        -- multiplying by 4m^2 clears every denominator, so the
        -- per-community contribution 4m*e_c - d_c^2 and the total
        -- q_num = sum(4m*e_c) - sum(d_c^2) are EXACT integers
        -- (HUGEINT/decimal(38,0) for the squares), and Q itself is
        -- one correctly-rounded double division q_num / (4m^2).
        -- Directed-edge bookkeeping: over the symmetric edge table,
        -- within-edges count = 2*e_c and degree sums are exact, so
        -- the identity uses 2m = COUNT(edges), e2_c = within count.
        WITH edges AS ({_EDGES_SQL}),
        lab AS (SELECT p_partkey AS u, p_brand AS brand FROM part),
        m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM edges),
        deg AS (
            SELECT la.brand, CAST(COUNT(*) AS BIGINT) AS d_c
            FROM edges e JOIN lab la ON la.u = e.u
            GROUP BY la.brand
        ),
        win AS (
            SELECT la.brand, CAST(COUNT(*) AS BIGINT) AS e2_c
            FROM edges e
            JOIN lab la ON la.u = e.u
            JOIN lab lb ON lb.u = e.v
            WHERE la.brand = lb.brand
            GROUP BY la.brand
        ),
        c AS (
            SELECT deg.brand, deg.d_c,
                   CAST(COALESCE(win.e2_c, 0) AS BIGINT) AS e2_c,
                   CAST(CAST(m2.m2 AS HUGEINT)
                        * COALESCE(win.e2_c, 0)
                        - CAST(deg.d_c AS HUGEINT) * deg.d_c
                        AS DECIMAL(38,0)) AS contrib_num
            FROM deg LEFT JOIN win ON deg.brand = win.brand, m2
        )
        SELECT brand, d_c, e2_c,
               CAST(contrib_num AS DOUBLE)
                   / CAST(CAST((SELECT m2 FROM m2) AS HUGEINT)
                          * (SELECT m2 FROM m2) AS DOUBLE) AS q_contrib
        FROM c
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the co-purchase graph under the PART
    BRAND partition — does "frequently bought together" actually
    cluster by brand, or is the brand label orthogonal to purchase
    structure? Per brand c: Q_c = e_c/m − (d_c/2m)², and Σ Q_c is
    the modularity a community-detection run would have to beat to
    claim it found structure beyond the catalog's own taxonomy (the
    standard null-model comparison before investing in Louvain-style
    clustering at scale).

    Exactness: Q is a rational; multiplying by 4m² clears every
    denominator — with 2m = |symmetric edges| and e2_c = within-
    community directed count, the contribution numerator
    2m·e2_c − d_c² is an EXACT 128-bit integer (events_rfm decimal
    policy), and q_contrib is ONE correctly-rounded double division
    by (2m)² — bit-identical cross-engine, Σ recoverable exactly
    from the integer columns.

    Plan/scale: the brand label table is part-dimension-sized (one
    broadcast-friendly join per endpoint); degree and within aggs
    are FUSED into one map-side-combined pass over the edge stream
    (r15, §2.3 — the old form instantiated the labeled edge join
    twice, once per agg, plus a third edge derivation for 2m; with
    the half-pair table frozen the whole query is one derivation +
    one grouped pass); output is brand cardinality. No per-community
    state beyond one row."""
    half = shared_intermediate(
        "mod_half", _copurchase_edges(spark, sf_dir, undirected=True)
    )
    edges = half.unionAll(
        half.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    lab = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("u"), F.col("p_brand").alias("brand")
    )
    m2 = edges.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    la = lab
    lb = lab.select(F.col("u").alias("v"), F.col("brand").alias("brand_b"))
    ed = edges.join(la, "u").join(lb, "v")
    # one fused pass: d_c = all rows per brand, e2_c = the within-brand
    # subset — identical integers to the old separate deg/win aggs
    # (sum-of-indicator == count-after-filter, 0 when none matches the
    # old COALESCE(left join, 0))
    c = ed.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("d_c"),
        F.sum(
            F.when(F.col("brand") == F.col("brand_b"), 1).otherwise(0)
        )
        .cast("long")
        .alias("e2_c"),
    ).join(F.broadcast(m2))
    num = F.expr(
        "CAST(CAST(m2 AS decimal(38,0)) * e2_c"
        " - CAST(d_c AS decimal(38,0)) * d_c AS decimal(38,0))"
    )
    den = F.expr("CAST(CAST(m2 AS decimal(38,0)) * m2 AS decimal(38,0))")
    return c.select(
        "brand",
        "d_c",
        "e2_c",
        (num.cast("double") / den.cast("double")).alias("q_contrib"),
    )


# --------------------------------------------------------------------------
# graph_random_walk — deterministic walk corpus for embeddings (round 8)
# --------------------------------------------------------------------------

_WALK_STEPS = 4


def _walk_h(start: str, step: int, nxt: str, dialect: str) -> str:
    """Portable per-candidate walk hash: md5(start|step|neighbor) first
    8 hex chars as int64 — the same md5-prefix family every
    deterministic sampler here uses."""
    if dialect == "duck":
        return (
            f"('0x' || substr(md5({start}::VARCHAR || '|' || {step} || "
            f"'|' || {nxt}::VARCHAR), 1, 8))::BIGINT"
        )
    return (
        f"CAST(conv(substr(md5(concat(CAST({start} AS STRING), '|', "
        f"'{step}', '|', CAST({nxt} AS STRING))), 1, 8), 16, 10) AS BIGINT)"
    )


def _walk_oracle() -> str:
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "w0 AS (SELECT DISTINCT u AS start, u AS cur FROM edges)",
    ]
    for s in range(1, _WALK_STEPS + 1):
        h = _walk_h("w.start", s, "e.v", "duck")
        ctes.append(
            f"""w{s} AS (
                SELECT start, cur FROM (
                    SELECT w.start, e.v AS cur,
                           ROW_NUMBER() OVER (
                               PARTITION BY w.start
                               ORDER BY {h}, e.v) AS rk
                    FROM w{s - 1} w JOIN edges e ON e.u = w.cur
                ) WHERE rk = 1
            )"""
        )
    hops = ", ".join(
        f"CAST(w{s}.cur AS BIGINT) AS hop{s}"
        for s in range(1, _WALK_STEPS + 1)
    )
    joins = " ".join(
        f"JOIN w{s} ON w{s}.start = w0.start"
        for s in range(1, _WALK_STEPS + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT w0.start, {hops} FROM w0 {joins}"
    )


@register("graph_random_walk", tags=("bext",), oracle=_walk_oracle())
def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {n}-step walk corpus over the co-purchase graph —
    the DeepWalk/node2vec INPUT: one walk per start vertex, each step
    choosing the neighbor with the minimum portable hash
    md5(start|step|neighbor) (ties by vertex id). Hash-driven choice
    makes the "random" walk a pure function of the graph: bit-stable
    across engines, runs, and backfills — the property a training
    corpus needs (regenerate shard 7 without regenerating the world)
    and the reason this isn't `rand()`. Per (start, step) the hash
    re-keys on the START, so two walks crossing the same vertex
    diverge — the corpus isn't one frozen successor function
    (step-parity alone already breaks ping-pong loops within a walk).

    Plan/scale: each step is ONE equi join (frontier x edges on the
    current vertex) + a per-start rank-1 reduction — frontier stays
    exactly |V| rows every step, fan-out is bounded by degree before
    the reduction collapses it back. {n} steps = {n} keyed shuffles of
    the FRONTIER ONLY: edges are hash-partitioned on u once before the
    checkpoint, so every step's SHUFFLE_HASH join streams the
    (degree-heavy, avg ~120 at sf0.1) edge side partition-local with
    the |V|-row frontier as build side — the edge table never moves
    again, and nothing is broadcast (a frontier broadcast would be
    driver-materialized data-sized state; measured r14, the
    co-partitioned SHJ also beats it, 2.4 s vs 3.6 s vs 13.9 s for
    the SMJ form at sf0.1 — SMJ paid a 2.4M-row sort per step).
    State never leaves the cluster. The oracle replays the identical
    recurrence as an unrolled CTE chain (the `graph_pagerank`
    certification pattern).
    """
    edges = shared_partitioned(
        "walk_edges", _copurchase_edges(spark, sf_dir).repartition("u")
    )
    # The frontier CARRIES the accumulated hop columns, so each step is
    # exactly one frontier x edges join + one per-start argmin — no
    # end-of-walk reassembly joins (an earlier form joined the four
    # step outputs back together; at 10x that stacked four broadcasts
    # for no reason). The argmin is a MIN(STRUCT(hash, v)) HASH AGG,
    # not a rank-1 window: same (hash ASC, v ASC) pick (struct
    # comparison is lexicographic, the hash is never null), but a
    # partial-aggregating hash agg beats the window's per-start sort —
    # measured ~20% faster at sf0.1. Hop columns are constant within a
    # start's group (the frontier enters the join one-row-per-start),
    # so MAX() carries them through the agg unchanged.
    walk = edges.select(F.col("u").alias("start")).distinct().select(
        "start", F.col("start").alias("cur")
    )
    hops: list[str] = []
    for s in range(1, _WALK_STEPS + 1):
        h = _walk_h("start", s, "v", "spark")
        picks = [
            F.min(
                F.struct(F.expr(h).alias("h"), F.col("v").alias("v"))
            ).alias("pick")
        ] + [F.max(c).alias(c) for c in hops]
        walk = (
            walk.hint("shuffle_hash").join(edges, walk.cur == edges.u)
            .select("start", *hops, "v")
            .groupBy("start")
            .agg(*picks)
            .select(
                "start",
                *hops,
                F.col("pick.v").alias(f"hop{s}"),
                F.col("pick.v").alias("cur"),
            )
        )
        hops.append(f"hop{s}")
    return walk.select(
        "start", *[F.col(c).cast("long") for c in hops]
    )


# --------------------------------------------------------------------------
# graph_ego_features — per-node structural features (round 8)
# --------------------------------------------------------------------------


@register(
    "graph_ego_features",
    tags=("bext",),
    oracle=f"""
        -- per-node structural features for downstream graph ML:
        -- degree, triangles-at-node, and ego-net density (how
        -- interconnected a part's co-purchase neighborhood is, exact
        -- floor bp of 2t/(d(d-1))) — the classic hand-crafted node
        -- feature vector (degree/transitivity) every GNN baseline and
        -- fraud screen starts from. The oracle counts node triangles
        -- by the direct wedge-closure definition; the engine derives
        -- the SAME numbers from the oriented adjacency-intersection
        -- pipeline — two independent formulations must agree.
        WITH edges AS ({_EDGES_SQL}),
        half AS (SELECT u, v FROM edges WHERE u < v),
        deg AS (
            SELECT u AS n, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY u
        ),
        tri AS (
            SELECT x.n,
                   CAST(COUNT(*) AS BIGINT) AS t
            FROM (
                SELECT e1.u AS n, e1.v AS a, e2.v AS b
                FROM edges e1
                JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
            ) x
            JOIN half e3 ON e3.u = x.a AND e3.v = x.b
            GROUP BY x.n
        )
        SELECT deg.n AS p_partkey, deg.d AS degree,
               CAST(COALESCE(tri.t, 0) AS BIGINT) AS n_triangles,
               CAST(CASE WHEN deg.d >= 2
                         THEN 2 * COALESCE(tri.t, 0) * 10000
                              // (deg.d * (deg.d - 1))
                         ELSE 0 END AS BIGINT) AS ego_density_bp
        FROM deg LEFT JOIN tri ON tri.n = deg.n
    """,
)
def graph_ego_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node structural features: degree, triangles-at-node, and
    ego-net density (2t/(d(d−1)) in exact floor basis points) — the
    hand-crafted node feature vector every GNN baseline, recommender
    cold-start, and fraud screen starts from (a high-degree node with
    near-zero ego density is a BRIDGE or a bot; a dense ego net is a
    community core). Distributes the `graph_clustering_coeff` global
    number back onto every vertex.

    Engine formulation reuses the certified triangle machinery: the
    degree-ORIENTED edge table bounds wedge fan-out at O(√E) per
    vertex, per-edge sorted-adjacency intersections enumerate each
    triangle once, and one explode re-attributes it to its THREE
    corners (u and v from the edge, w from the intersection array) —
    triangle-volume rows, never wedge-volume. The oracle counts by
    the direct wedge-closure definition instead; two independent
    formulations must produce identical integers.

    Plan/scale: orientation + intersection is the audited
    `graph_triangles` plan; the re-attribution explode adds
    3·triangles rows into one node-keyed agg; the degree join is
    vertex-cardinality."""
    # r14: ONE edge derivation instead of two — the old form derived
    # the co-purchase pairs twice (symmetrized for degrees, half-pairs
    # for orientation), paying the lineitem pair-gen + distinct
    # shuffles twice per run. The half-pair table is frozen once and
    # degrees come from its endpoint union (identical integers: the
    # symmetric out-degree of n is exactly the number of half edges
    # incident to n — the graph_triangles degree derivation).
    half = shared_intermediate(
        "ego_half", _copurchase_edges(spark, sf_dir, undirected=True)
    )
    deg = (
        half.select(F.col("u").alias("n"))
        .unionAll(half.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dx = deg.select(F.col("n").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("d").alias("dy"))
    lt = F.struct(F.col("dx"), F.col("x")) < F.struct(
        F.col("dy"), F.col("y")
    )
    o = (
        half.select(F.col("u").alias("x"), F.col("v").alias("y"))
        .join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(lt, F.col("x")).otherwise(F.col("y")).alias("u"),
            F.when(lt, F.col("y")).otherwise(F.col("x")).alias("v"),
        )
    )
    o = shared_intermediate("ego_oriented", o)
    adj = o.groupBy("u").agg(
        F.sort_array(F.collect_list("v")).alias("nb")
    )
    au = adj.select("u", F.col("nb").alias("nu"))
    av = adj.select(F.col("u").alias("v"), F.col("nb").alias("nv"))
    tri_edges = (
        o.join(au, "u")
        .join(av, "v")
        .select("u", "v", F.array_intersect("nu", "nv").alias("ws"))
        .filter(F.size("ws") > 0)
    )
    # each (u,v,ws) row holds |ws| triangles: u and v corner all |ws|
    # of them, every w corners exactly one — so u and v repeat |ws|
    # times in the corner stream and the ws array rides through as-is
    tri = (
        tri_edges.select(
            F.explode(
                F.concat(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws")),
                        lambda _i: F.col("u"),
                    ),
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws")),
                        lambda _i: F.col("v"),
                    ),
                    F.col("ws"),
                )
            ).alias("n")
        )
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return deg.join(tri, "n", "left").select(
        F.col("n").alias("p_partkey"),
        F.col("d").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("long").alias("n_triangles"),
        F.expr(
            "CAST(CASE WHEN d >= 2 THEN 2 * COALESCE(t, 0) * 10000 "
            "div (d * (d - 1)) ELSE 0 END AS BIGINT)"
        ).alias("ego_density_bp"),
    )


# --------------------------------------------------------------------------
# graph_connected_components — bounded min-label propagation (round 8)
# --------------------------------------------------------------------------

_CC_ROUNDS = 6


def _cc_oracle() -> str:
    """Unrolled min-label propagation: l0 = identity labels, each round
    the UNION-ALL + MIN recurrence (keep own label, pull every incoming
    neighbor's) — the same recurrence the DataFrame loop runs."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)",
    ]
    for i in range(1, _CC_ROUNDS + 1):
        ctes.append(
            f"""l{i} AS (
                SELECT node, MIN(lbl) AS lbl FROM (
                    SELECT node, lbl FROM l{i - 1}
                    UNION ALL
                    SELECT e.v AS node, l.lbl
                    FROM edges e JOIN l{i - 1} l ON l.node = e.u
                ) GROUP BY node
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT lbl AS component, CAST(COUNT(*) AS BIGINT) AS n_nodes\n"
        f"FROM l{_CC_ROUNDS} GROUP BY lbl"
    )


@register(
    "graph_connected_components",
    tags=("graph",),
    oracle=_cc_oracle(),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-purchase graph by MIN-LABEL
    PROPAGATION, the Pregel-style building block behind entity
    resolution and dedup-cluster assignment at scale: every vertex
    starts labeled with its own id; each round it keeps the minimum of
    its label and all neighbors' labels. Semantics are EXACTLY
    ``_CC_ROUNDS`` rounds (deterministic, oracle-replayable); labels
    equal true component ids wherever the hop distance to the
    component's minimum vertex is <= the round budget — the standard
    bounded-frontier framing this module's BFS uses (co-purchase
    graphs are short-diameter, so the bound binds rarely; a production
    run would loop to fixpoint with the same per-round plan).

    Spark formulation — ONE exchange of |E| rows per round: the edge
    table is pre-partitioned on the source vertex ONCE (checkpointed),
    and labels stay hash-partitioned on vertex id across rounds, so
    the edges⋈labels probe reuses it; only the neighbor-min groupBy
    (keyed on the destination) shuffles the |V|-row label stream.
    Self-loops folded into the frozen edge table make the update a
    single-consumer recurrence (min over N(v) ∪ {v}), so all rounds
    chain into ONE linear plan with no per-round label
    materialization. Output folds to component
    cardinality (component id = its minimum vertex id), so the result
    is #components rows, never #vertices. The oracle replays the
    UNION-ALL+MIN recurrence — an independent formulation, same
    fixpoint algebra.

    At 100 TB: each round's cost is one shuffle keyed on vertex id
    over |V| + |E| rows; min-label propagation needs O(diameter)
    rounds — the alternating large-star/small-star variant (Kiveris
    2014) would cut that to O(log d) with the same per-round shape.
    Parity anchor: the reference's iterative MapReduce driver loop
    (hadoop_tutorial/src/Kmeans.java:170-183) is the same
    re-job-per-round pattern; here each round is one Spark stage."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # r14 rework (guide §2.4 + §1.2), measured -26% at sf0.1 with
    # identical output:
    #   * the edge freeze is a u-partitioned PERSIST — the old
    #     repartition+localCheckpoint erased the partitioning at the
    #     RDD scan, so all 6 rounds re-exchanged the |E|-row table
    #     despite the repartition; the cache keeps hashpartitioning(u)
    #     visible to every round's SHUFFLE_HASH probe;
    #   * SELF-LOOPS are folded into the frozen edge table once
    #     (u,u per vertex), so the min-label update is algebraically
    #     min over N(v) ∪ {v} = ONE join + ONE min-agg per round —
    #     the old form consumed the label table twice per round
    #     (neighbor-min join + keep-own left join) and had to
    #     localCheckpoint labels every round to stop the two-consumer
    #     recompute; single-consumer labels chain 6 rounds into ONE
    #     linear plan (the graph_pagerank shape): 13 jobs -> 3.
    # SHUFFLE_HASH on the label side: AQE would broadcast |V| rows and
    # six retained broadcasts OOMed the driver at the 10× probe (the
    # graph_random_walk incident); the hashed join reuses the cached
    # edge partitioning instead.
    half = _copurchase_edges(spark, sf_dir)
    withself = half.unionAll(
        half.select(F.col("u").alias("u")).distinct().select(
            "u", F.col("u").alias("v")
        )
    )
    edges = shared_partitioned(
        "cc_edges", withself.repartition(nparts, "u")
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(_CC_ROUNDS):
        labels = (
            edges.join(
                labels.withColumnRenamed("node", "u").hint("shuffle_hash"),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(F.min("lbl").alias("lbl"))
        )
    return labels.groupBy(F.col("lbl").alias("component")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


# --------------------------------------------------------------------------
# graph_hits — HITS hubs & authorities on the purchase bipartite (round 8)
# --------------------------------------------------------------------------

_HITS_ROUNDS = 3
_HITS_SCALE = 1_000_000
_HITS_TOP = 10


def _hits_oracle() -> str:
    """Unrolled HITS CTE chain on the customer→part bipartite: hub
    scores start uniform; each round auth = Σ incident hubs then
    renormalize to max = scale, hub = Σ incident auths then
    renormalize — the pagerank/pca bounded-iteration pattern (all
    scores nonnegative, so the renormalization is a plain floor
    division)."""
    ctes = [
        """be AS (
            SELECT DISTINCT o_custkey AS c, l_partkey AS p
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        )""",
        f"""h0 AS (
            SELECT c, CAST({_HITS_SCALE} AS HUGEINT) AS h
            FROM (SELECT DISTINCT c FROM be)
        )""",
    ]
    for i in range(1, _HITS_ROUNDS + 1):
        ctes.append(
            f"""ar{i} AS (
                SELECT p, CAST(SUM(h.h) AS HUGEINT) AS a
                FROM be JOIN h{i - 1} h USING (c) GROUP BY p
            )"""
        )
        ctes.append(
            f"""a{i} AS (
                SELECT p, a * {_HITS_SCALE}
                       // (SELECT MAX(a) FROM ar{i}) AS a
                FROM ar{i}
            )"""
        )
        ctes.append(
            f"""hr{i} AS (
                SELECT c, CAST(SUM(a.a) AS HUGEINT) AS h
                FROM be JOIN a{i} a USING (p) GROUP BY c
            )"""
        )
        ctes.append(
            f"""h{i} AS (
                SELECT c, h * {_HITS_SCALE}
                       // (SELECT MAX(h) FROM hr{i}) AS h
                FROM hr{i}
            )"""
        )
    n = _HITS_ROUNDS
    return (
        "WITH " + ",\n".join(ctes) + f""",
        ranked AS (
            SELECT 'auth' AS side, p AS id, a AS score_scaled,
                   ROW_NUMBER() OVER (ORDER BY a DESC, p) AS rnk
            FROM a{n}
            UNION ALL
            SELECT 'hub', c, h,
                   ROW_NUMBER() OVER (ORDER BY h DESC, c)
            FROM h{n}
        )
        SELECT side, CAST(id AS BIGINT) AS id,
               CAST(score_scaled AS BIGINT) AS score_scaled,
               CAST(rnk AS INT) AS rnk
        FROM ranked WHERE rnk <= {_HITS_TOP}"""
    )


@register("graph_hits", tags=("graph",), oracle=_hits_oracle())
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities on the customer→part
    purchase bipartite: a customer is a good HUB when it buys
    authoritative parts; a part is a good AUTHORITY when good hubs
    buy it — the mutual-reinforcement ranking that separates
    "buys everything" breadth from "everyone buys it" popularity
    (PageRank's bipartite sibling; the recommender-bootstrap
    ranking). Exactly {r} rounds from uniform hubs, each side
    renormalized to max = 10⁶ — the module's bounded-iteration
    framing (k-means/pagerank/pca), deterministic and
    oracle-replayable.

    Exactness: scores stay nonnegative integers end to end —
    Σ-aggregations in decimal(38,0), renormalization one plain floor
    division per side per round (no sign split needed, unlike
    `embed_pca_power`).

    Plan/scale: per round two |E|-row shuffle-hash joins + two
    map-side-combined aggs (auth keyed on part, hub keyed on
    customer). Both per-round joins carry explicit SHUFFLE_HASH
    hints — the connected-components 10× probe showed AQE broadcasting
    a |V|-row score side stacks one retained broadcast per round and
    OOMs the driver; hashed joins reuse the existing key partitioning
    instead. The per-side max is a 1-row agg broadcast back (never a
    global window over |V| rows). Raw per-side sums are checkpointed
    per half-round (the normalized views are cheap projections over
    them). Output is the top-{t} of each side via WindowGroupLimit."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # r14 (guide §2.4): the bipartite edge table is probed on BOTH key
    # sides per round (hub join on c, auth join on p), so keep TWO
    # partitioned persists — one per key. The old single checkpoint
    # erased the partitioning and re-exchanged |E| rows twice per
    # round; the second cached copy trades one extra |E| materialize
    # for 2·rounds edge exchanges (cache spills to disk at scale).
    be = shared_partitioned(
        "hits_edges",
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .repartition(nparts, "c"),
    )
    bep = shared_partitioned("hits_edges_p", be.repartition(nparts, "p"))
    # r15 (VERDICT r14 item 4, guide §2.4): freeze the RAW per-side
    # sums (ar/hr) instead of the NORMALIZED scores. The old loop
    # checkpointed auth/hub, but each checkpoint build consumed the
    # un-frozen ar/hr twice (once for the 1-row max agg, once inside
    # the normalize projection), so every half-round ran its |E|-row
    # join + agg TWICE. Frozen-raw, the join+agg runs once; the max
    # agg and the normalize projection are cheap reads of the frozen
    # |V|-row table, so auth/hub stay unfrozen views (≤2 consumers,
    # each a broadcast-join + map). The single-consumer h0 freeze is
    # dropped for the same reason. Same freeze-job count per round,
    # half the half-round join work, identical integers.
    hub = (
        be.select("c")
        .distinct()
        .select("c", F.lit(_HITS_SCALE).cast("decimal(38,0)").alias("h"))
    )
    auth = None
    for i in range(1, _HITS_ROUNDS + 1):
        ar = shared_intermediate(
            f"hits_a{i}",
            be.join(hub.hint("shuffle_hash"), "c")
            .groupBy("p")
            .agg(F.sum("h").cast("decimal(38,0)").alias("a")),
        )
        amx = F.broadcast(ar.agg(F.max("a").alias("amx")))
        auth = ar.join(amx).select(
            "p",
            F.expr(
                f"CAST(a * {_HITS_SCALE} div amx AS decimal(38,0))"
            ).alias("a"),
        )
        hr = shared_intermediate(
            f"hits_h{i}",
            bep.join(auth.hint("shuffle_hash"), "p")
            .groupBy("c")
            .agg(F.sum("a").cast("decimal(38,0)").alias("h")),
        )
        hmx = F.broadcast(hr.agg(F.max("h").alias("hmx")))
        hub = hr.join(hmx).select(
            "c",
            F.expr(
                f"CAST(h * {_HITS_SCALE} div hmx AS decimal(38,0))"
            ).alias("h"),
        )
    ranked = (
        auth.select(
            F.lit("auth").alias("side"),
            F.col("p").alias("id"),
            F.col("a").alias("score_scaled"),
        )
        .unionAll(
            hub.select(
                F.lit("hub").alias("side"),
                F.col("c").alias("id"),
                F.col("h").alias("score_scaled"),
            )
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("side").orderBy(
                    F.col("score_scaled").desc(), "id"
                )
            ),
        )
        .filter(F.col("rnk") <= _HITS_TOP)
    )
    return ranked.select(
        "side",
        F.col("id").cast("long").alias("id"),
        F.col("score_scaled").cast("long").alias("score_scaled"),
        F.col("rnk").cast("int").alias("rnk"),
    )


# --------------------------------------------------------------------------
# graph_label_propagation — deterministic community detection (round 8)
# --------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    """Unrolled synchronous LPA CTE chain: per round each vertex
    adopts the label that is MOST FREQUENT among its neighbors
    (ties → smallest label; isolated behavior impossible — every
    vertex has degree ≥ 1 in the co-purchase graph), replayed with
    the same (count DESC, label ASC) argmax on both engines."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM edges)",
    ]
    for i in range(1, _LPA_ROUNDS + 1):
        ctes.append(
            f"""c{i} AS (
                SELECT e.v AS node, l.lbl, COUNT(*) AS cnt
                FROM edges e JOIN l{i - 1} l ON l.node = e.u
                GROUP BY e.v, l.lbl
            )"""
        )
        ctes.append(
            f"""l{i} AS (
                SELECT node, lbl FROM (
                    SELECT node, lbl,
                           ROW_NUMBER() OVER (
                               PARTITION BY node
                               ORDER BY cnt DESC, lbl
                           ) AS rn
                    FROM c{i}
                ) WHERE rn = 1
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\n"
        f"SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes\n"
        f"FROM l{_LPA_ROUNDS} GROUP BY lbl"
    )


@register(
    "graph_label_propagation",
    tags=("graph",),
    oracle=_lpa_oracle(),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation
    (Raghavan 2007), made DETERMINISTIC: every vertex starts labeled
    with its own id; each round it adopts the label MOST FREQUENT
    among its neighbors, ties broken by smallest label — the
    asynchronous random-order variant of the paper is
    irreproducible, so this is the replayable form distributed
    engines actually ship (GraphX/GraphFrames LPA is the same
    synchronous recurrence). Exactly _LPA_ROUNDS rounds (the module's
    bounded-iteration framing). `graph_connected_components` answers
    WHO IS REACHABLE; LPA answers WHO CLUSTERS TOGETHER —
    densely-tied groups converge to one label even inside a single
    connected component, and `graph_modularity` can then SCORE the
    partition this op finds.

    Plan/scale: per round ONE |E|-row shuffle-hash join (the CC
    probe's no-broadcast-stacking rule) + a (node, label)
    map-side-combined count + a per-node rank-1 window — the argmax
    runs over each vertex's NEIGHBOR-LABEL cardinality (bounded by
    degree), never a global sort. Labels checkpoint per round; output
    folds to community cardinality."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # r14 (guide §2.4): u-partitioned persist (see
    # graph_connected_components) — the checkpoint form re-exchanged
    # the |E|-row table on every round's label-count join.
    edges = shared_partitioned(
        "lpa_edges",
        _copurchase_edges(spark, sf_dir).repartition(nparts, "u"),
    )
    labels = shared_intermediate(
        "lpa_labels_0",
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl")),
    )
    # The (count DESC, label ASC) argmax is a MIN(STRUCT(-cnt, lbl))
    # HASH AGG, not a rank-1 window (graph_random_walk's trick —
    # struct comparison is lexicographic and cnt is never null):
    # partial-aggregating hash agg instead of a per-node sort,
    # measured ~20% faster at sf0.1.
    for i in range(1, _LPA_ROUNDS + 1):
        cnt = (
            edges.join(
                labels.withColumnRenamed("node", "u").hint("shuffle_hash"),
                "u",
            )
            .groupBy(F.col("v").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("lbl").alias("lbl"),
                    )
                ).alias("p")
            )
            .select("node", F.col("p.lbl").alias("lbl"))
        )
        labels = shared_intermediate(f"lpa_labels_{i}", labels)
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )


# --------------------------------------------------------------------------
# graph_pagerank_personalized — seeded PPR recommendations (round 8)
# --------------------------------------------------------------------------

_PPR_SEED_MOD = 50  # seed set: partkeys ≡ 0 (mod 50)
_PPR_TOP = 20


def _ppr_oracle() -> str:
    """Unrolled personalized-PageRank CTE chain: the pagerank
    recurrence with the teleport mass restricted to the SEED set
    (base term only where v % {m} = 0)."""
    ctes = [
        f"edges AS ({_EDGES_SQL})",
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY u)",
        f"""r0 AS (
            SELECT u AS node,
                   CAST(CASE WHEN u % {_PPR_SEED_MOD} = 0
                        THEN {_PR_SCALE} ELSE 0 END AS BIGINT) AS r
            FROM deg
        )""",
    ]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS (
                SELECT d2.u AS node,
                       CAST(CASE WHEN d2.u % {_PPR_SEED_MOD} = 0
                            THEN {_PR_BASE} ELSE 0 END
                            + COALESCE(s.flow, 0) AS BIGINT) AS r
                FROM deg d2 LEFT JOIN (
                    SELECT e.v AS node,
                           (85 * SUM(r.r // d.d)) // 100 AS flow
                    FROM edges e
                    JOIN r{i - 1} r ON r.node = e.u
                    JOIN deg d ON d.u = e.u
                    WHERE r.r > 0
                    GROUP BY e.v
                ) s ON s.node = d2.u
            )"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
        SELECT node AS p_partkey, r AS ppr_scaled, rnk FROM (
            SELECT node, r,
                   CAST(ROW_NUMBER() OVER (ORDER BY r DESC, node) AS INT)
                       AS rnk
            FROM r{_PR_ITERS} WHERE r > 0
        ) WHERE rnk <= {_PPR_TOP}"""
    )


@register(
    "graph_pagerank_personalized", tags=("graph",), oracle=_ppr_oracle()
)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a seed set (partkeys ≡ 0 mod {m}) —
    the recommender workhorse: `graph_pagerank` ranks GLOBAL
    importance; PPR ranks importance AS SEEN FROM the seeds, which is
    exactly "parts related to this catalog subset" / "users similar
    to these". Same scaled-integer recurrence, with the teleport mass
    restricted to the seeds (unnormalized per-seed scale — rank
    order, which is what recommendations consume, is unaffected by
    the constant). Top-{t} non-zero scores.

    Exactness: the pagerank integer scheme verbatim (rank 10⁹-scaled,
    85/100 damping as integer div); the left join against the degree
    table keeps zero-mass vertices representable so the recurrence's
    support grows exactly one hop per round.

    Plan/scale: identical per-round cost to `graph_pagerank` (one
    edges⋈ranks join + destination agg) with ONE addition that
    matters at 100 TB: the `r > 0` filter — PPR mass is CONCENTRATED
    near the seeds, so early rounds stream a small frontier instead
    of |V| rows (the locality that makes PPR cheaper than global
    pagerank in practice). Ranks checkpoint per round."""
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    raw = _copurchase_edges(spark, sf_dir)
    deg = raw.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # r14 (guide §2.4): u-partitioned persists (see graph_pagerank) —
    # the checkpoint form re-exchanged the degree-folded edge table on
    # every round's frontier join AND the degree table on every
    # round's left join; both partitionings now survive the freeze.
    edges = shared_partitioned(
        "ppr_edges", raw.join(deg, "u").repartition(nparts, "u")
    )
    degs = shared_partitioned("ppr_deg", deg.repartition(nparts, "u"))
    ranks = degs.select(
        F.col("u").alias("node"),
        F.expr(
            f"CAST(CASE WHEN u % {_PPR_SEED_MOD} = 0"
            f" THEN {_PR_SCALE} ELSE 0 END AS BIGINT)"
        ).alias("r"),
    )
    # Both per-round joins carry SHUFFLE_HASH hints — the
    # connected-components 10× probe rule: one retained broadcast per
    # round OOMs the driver; hashed joins reuse the vertex-key
    # partitioning instead (this op re-hit exactly that failure at
    # 10× before the hints).
    for i in range(1, _PR_ITERS + 1):
        flow = (
            edges.join(
                ranks.filter(F.col("r") > 0)
                .withColumnRenamed("node", "u")
                .hint("shuffle_hash"),
                "u",
            )
            .groupBy(F.col("v").alias("node"))
            .agg(
                F.expr(f"(85 * SUM(r div d)) div 100").alias("flow")
            )
        )
        ranks = degs.join(
            flow.hint("shuffle_hash"), degs.u == flow.node, "left"
        ).select(
            F.col("u").alias("node"),
            F.expr(
                f"CAST(CASE WHEN u % {_PPR_SEED_MOD} = 0"
                f" THEN {_PR_BASE} ELSE 0 END"
                f" + COALESCE(flow, 0) AS BIGINT)"
            ).alias("r"),
        )
        ranks = shared_intermediate(f"ppr_ranks_{i}", ranks)
    w = Window.orderBy(F.col("r").desc(), "node")
    return (
        ranks.filter(F.col("r") > 0)
        .select(
            F.col("node").alias("p_partkey"),
            F.col("r").alias("ppr_scaled"),
            F.row_number().over(w).cast("int").alias("rnk"),
        )
        .filter(F.col("rnk") <= _PPR_TOP)
    )


# --------------------------------------------------------------------------
# graph_bipartite_projection — weighted one-mode projection (round 14)
# --------------------------------------------------------------------------

_BIP_CAP = 8  # per-order fanout cap (pairs per order <= C(8,2) = 28)
_BIP_TOP = 50  # reported strongest co-purchase edges


@register(
    "graph_bipartite_projection",
    tags=("b11",),
    oracle=f"""
        -- Weighted one-mode projection of the order-part bipartite
        -- graph (Newman PRE'01 'scientific collaboration networks'
        -- shape): edge weight between two parts = number of orders
        -- carrying BOTH. The quadratic hazard is hub orders (an
        -- order of m parts emits C(m,2) pairs), so each order is
        -- capped to its top {_BIP_CAP} parts by quantity (partkey
        -- ties) BEFORE pairing — the fanout cap every production
        -- projection applies. Oracle is the naive capped self-join;
        -- the engine expands pairs in-row. Top {_BIP_TOP} edges by
        -- shared-order count, part keys + names, deterministic ties.
        WITH w AS (
            SELECT l_orderkey AS o, l_partkey AS p,
                   SUM(CAST(l_quantity AS BIGINT)) AS qty
            FROM lineitem GROUP BY 1, 2
        ),
        capped AS (
            SELECT o, p FROM (
                SELECT o, p, ROW_NUMBER() OVER (
                    PARTITION BY o ORDER BY qty DESC, p) AS rn
                FROM w
            ) WHERE rn <= {_BIP_CAP}
        ),
        pairs AS (
            SELECT a.p AS part_a, b.p AS part_b,
                   CAST(COUNT(*) AS BIGINT) AS co_orders
            FROM capped a JOIN capped b
              ON a.o = b.o AND a.p < b.p
            GROUP BY 1, 2
        ),
        top AS (
            SELECT * FROM pairs
            ORDER BY co_orders DESC, part_a, part_b
            LIMIT {_BIP_TOP}
        )
        SELECT part_a, part_b, pa.p_name AS name_a, pb.p_name AS name_b,
               co_orders
        FROM top
        JOIN part pa ON pa.p_partkey = part_a
        JOIN part pb ON pb.p_partkey = part_b
    """,
)
def graph_bipartite_projection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted one-mode PROJECTION of the order-part bipartite graph
    — "frequently bought together" edge weights (Newman PRE'01;
    the co-occurrence projection behind every market-basket graph):
    weight(part_a, part_b) = number of orders containing both. This
    is the op that FEEDS the graph kernels above (their edge
    derivation is this projection unweighted) promoted to a
    first-class weighted output.

    The quadratic hazard of any bipartite projection is hub
    left-nodes: an order with m parts emits C(m,2) pairs, so m=10^4
    hub orders emit 5*10^7 pairs EACH. The engine therefore caps each
    order to its top {cap} parts by quantity (partkey ties,
    deterministic) BEFORE pairing — ROW_NUMBER under Spark's
    WindowGroupLimit rank pushdown, map tasks emit <= cap rows per
    order pre-shuffle — bounding pair generation at C({cap},2) = 28
    per order, linear in orders at any scale.

    Plan/scale: per-(order,part) weights are ONE map-side-combined
    agg; the capped parts collect per order (same orderkey
    partitioning, AQE elides the exchange) and pairs expand IN-ROW
    (sorted-array transform/slice, no lineitem self-join — the naive
    self-join lives only in the oracle); pair counts map-side
    combine; TakeOrderedAndProject keeps the top {top}; the part-name
    dimension join broadcasts. No shuffle carries more than
    orders x C(cap,2) rows.

    Ref parity: no counterpart in the reference (538-LoC k-means);
    capability-closure operator per SURVEY.md §2.B-11."""
    w = (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    win = Window.partitionBy("o").orderBy(
        F.col("qty").desc(), F.col("p")
    )
    capped = (
        w.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _BIP_CAP)
        .select("o", "p")
    )
    pairs = (
        capped.groupBy("o")
        .agg(F.array_sort(F.collect_list("p")).alias("ps"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (a, i) ->"
                    " transform(slice(ps, i + 2, size(ps)), b ->"
                    " struct(a AS part_a, b AS part_b))))"
                )
            ).alias("pr")
        )
        .groupBy("pr.part_a", "pr.part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("co_orders"))
        .orderBy(
            F.col("co_orders").desc(), F.col("part_a"), F.col("part_b")
        )
        .limit(_BIP_TOP)
    )
    names = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        pairs.join(
            F.broadcast(names.withColumnRenamed("p_name", "name_a")),
            pairs.part_a == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .join(
            F.broadcast(names.withColumnRenamed("p_name", "name_b")),
            F.col("part_b") == F.col("p_partkey"),
        )
        .drop("p_partkey")
        .select("part_a", "part_b", "name_a", "name_b", "co_orders")
    )
