"""B-6 Sorts / limits / top-k / set ops (SURVEY.md §2.B-6).

Global ORDER BY + LIMIT compiles to TakeOrdered (per-partition top-N +
driver merge of N·parts rows — never a full global sort); top-k per
group is a window row_number, which at 100 TB shuffles once on the
group key. Sort orderings always include a unique key so LIMIT-truncated
result sets are deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from nchu_bigdata_spark.io import table
from nchu_bigdata_spark.registry import register


@register(
    "sort_limit",
    tags=("b6",),
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT → TakeOrderedAndProject (no full sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "topk_per_group",
    tags=("b6",),
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey
                   ) AS rn
            FROM part
        ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand (window row_number ≤ k)."""
    p = table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


def _f_order_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys holding at least one finished ('F') order."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )


def _building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys in the BUILDING market segment."""
    c = table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )


_F_ORDERS_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'"
_BUILDING_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@register(
    "set_union",
    tags=("b6",),
    oracle=f"({_F_ORDERS_SQL}) UNION ({_BUILDING_SQL})",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    return (
        _f_order_custkeys(spark, sf_dir)
        .union(_building_custkeys(spark, sf_dir))
        .distinct()
    )


@register(
    "set_intersect",
    tags=("b6",),
    oracle=f"({_F_ORDERS_SQL}) INTERSECT ({_BUILDING_SQL})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT of two key sets."""
    return _f_order_custkeys(spark, sf_dir).intersect(
        _building_custkeys(spark, sf_dir)
    )


@register(
    "set_except",
    tags=("b6",),
    oracle=f"({_BUILDING_SQL}) EXCEPT ({_F_ORDERS_SQL})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): BUILDING customers with no finished order."""
    return _building_custkeys(spark, sf_dir).subtract(
        _f_order_custkeys(spark, sf_dir)
    )


# --------------------------------------------------------------------------
# sort_zorder — Z-order (Morton) clustering layout statistics (round 7)
# --------------------------------------------------------------------------

_Z_BITS = 8  # bits per dimension interleaved into the 16-bit Morton key
# (8, not 16: the clustered dims are custkey-mod and epoch-day-mod, and
# 8 bits keeps BOTH cycling through their full range on the test corpus
# — with 16 the shared high bits of the ~600-day date span collapse
# every row into one block and the layout demo degenerates)
_Z_BLOCKS = 64  # fixed-width key-range blocks (stand-ins for files)


def _morton_terms(x: str, y: str, shift: str, bits: int | None = None) -> str:
    """Bit-interleave expression `zkey = Σ ((x>>i)&1)<<2i | ((y>>i)&1)<<2i+1`
    rendered with engine-appropriate shift syntax: ``shift`` is a
    format string, e.g. ``"shiftleft({v}, {n})"`` (Spark) or
    ``"({v} << {n})"`` (DuckDB). Right shifts use the same renderer
    with negative semantics avoided by pre-shifting via integer DIV,
    which both engines share. ``bits`` defaults to the block-stats
    width (_Z_BITS); scan_zorder_pruned passes its write-key width."""
    terms = []
    for i in range(_Z_BITS if bits is None else bits):
        # integer DIV is spelled differently: `//` (DuckDB) vs DIV (Spark)
        div = "//" if "<<" in shift else "DIV"
        terms.append(
            shift.format(v=f"(({x} {div} {1 << i}) % 2)", n=2 * i)
        )
        terms.append(
            shift.format(v=f"(({y} {div} {1 << i}) % 2)", n=2 * i + 1)
        )
    return " + ".join(terms)


_Z_SPARK = _morton_terms("xk", "yk", "shiftleft({v}, {n})")
_Z_DUCK = _morton_terms("xk", "yk", "({v} << {n})")
_Z_WIDTH = (1 << (2 * _Z_BITS)) // _Z_BLOCKS


@register(
    "sort_zorder",
    tags=("b6",),
    oracle=f"""
        -- Same Morton interleave, DuckDB shift syntax; xk/yk are the
        -- low {_Z_BITS} bits of custkey and epoch-day (TZ-free).
        WITH keyed AS (
            SELECT (o_custkey % {1 << _Z_BITS}) AS xk,
                   ((epoch_us(o_orderdate) // 86400000000)
                        % {1 << _Z_BITS}) AS yk
            FROM orders
        ),
        z AS (SELECT xk, yk, ({_Z_DUCK}) AS zkey FROM keyed)
        SELECT CAST(zkey // {_Z_WIDTH} AS BIGINT) AS zblock,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(xk) AS BIGINT) AS x_min,
               CAST(MAX(xk) AS BIGINT) AS x_max,
               CAST(MIN(yk) AS BIGINT) AS y_min,
               CAST(MAX(yk) AS BIGINT) AS y_max
        FROM z GROUP BY 1
    """,
)
def sort_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton space-filling curve) clustering statistics — the
    core of a lakehouse ``OPTIMIZE ... ZORDER BY (custkey, orderdate)``:
    interleave the bits of both dimensions into one sort key, carve the
    key space into fixed-width blocks (the stand-ins for rewritten
    files), and report each block's per-dimension min/max envelope —
    exactly the footer stats a reader would prune on. Z-ordering's
    point is that BOTH envelopes stay narrow, so predicates on EITHER
    dimension skip most blocks; the unit test asserts that quantitative
    claim against a single-dimension sort.

    Scale design: the Morton key is a pure codegen bit expression (32
    integer terms, no UDF); blocks are FIXED-WIDTH KEY RANGES
    (``zkey div width``) rather than an ntile window — ntile would
    need a single global sort partition (the classic accidental
    serialization), while the range rule is embarrassingly parallel
    and gives the identical layout a range-partitioned writer would
    produce. One hash agg on the block id ends the plan."""
    orders = table(spark, sf_dir, "orders")
    keyed = orders.select(
        (F.col("o_custkey") % (1 << _Z_BITS)).alias("xk"),
        (
            # o_orderdate surfaces as TIMESTAMP_NTZ; the UTC-pinned
            # session clock (registry wrapper) makes the cast exact
            F.expr(
                "(unix_micros(cast(o_orderdate as timestamp)) DIV 86400000000)"
            )
            % (1 << _Z_BITS)
        ).alias("yk"),
    )
    z = keyed.select("xk", "yk", F.expr(_Z_SPARK).alias("zkey"))
    return (
        z.groupBy(
            F.expr(f"zkey DIV {_Z_WIDTH}").cast("long").alias("zblock")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("xk").cast("long").alias("x_min"),
            F.max("xk").cast("long").alias("x_max"),
            F.min("yk").cast("long").alias("y_min"),
            F.max("yk").cast("long").alias("y_max"),
        )
    )


# --------------------------------------------------------------------------
# topk_percent — top-N% per group (round 8)
# --------------------------------------------------------------------------

_TKP_BP = 1_000  # keep the top 10% (1000 basis points) per group


@register(
    "topk_percent",
    tags=("b6",),
    oracle=f"""
        -- fraction-based top-k: keep rows whose rank is within 10% of
        -- the group size (ceiling semantics: rank*10000 <= n*1000
        -- flips to CEIL via the <= on integers; at least rank 1 always
        -- qualifies in non-empty groups when n >= 10... pinned
        -- exactly by the integer cross-multiply, no float percent).
        SELECT o_custkey, o_orderkey, o_totalprice, rnk, n_orders
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS INT) AS rnk,
                   CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT)
                       AS n_orders
            FROM orders
        ) t
        WHERE CAST(rnk AS HUGEINT) * 10000 <= CAST(n_orders AS HUGEINT)
              * {_TKP_BP}
    """,
)
def topk_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N-PERCENT per group (each customer's top 10% orders by
    value) — the fraction-based sibling of ``topk_per_group``: the cut
    adapts to group size, which is what "review the top decile of
    every account" actually means. The qualifying test is the exact
    integer cross-multiply ``rnk·10⁴ ≤ n·1000`` (floor-of-fraction
    semantics, no float percent to straddle; groups smaller than 10
    keep nothing — the strict decile, pinned in the unit suite).

    Plan/scale: row_number and the group-size count share ONE
    partition key and one sort ⇒ a single Window operator after one
    hash exchange; per-group work is a cursor. Unlike fixed-k,
    rank*fraction filters can't WindowGroupLimit-prune (the cut
    depends on the full group size), so the full group crosses the
    window — inherent to the semantics, still one shuffle."""
    from pyspark.sql import Window as W

    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    wc = W.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).cast("int").alias("rnk"),
        F.count(F.lit(1)).over(wc).alias("n_orders"),
    )
    return ranked.filter(
        F.col("rnk").cast("decimal(38,0)") * 10000
        <= F.col("n_orders").cast("decimal(38,0)") * _TKP_BP
    )


# --------------------------------------------------------------------------
# agg_skyline — Pareto frontier (skyline) with distributive pre-prune (r8)
# --------------------------------------------------------------------------


@register(
    "agg_skyline",
    tags=("b6",),
    oracle="""
        -- skyline over parts: minimize price, maximize size. The
        -- oracle is the textbook NOT-EXISTS dominance formulation —
        -- deliberately a DIFFERENT algorithm than the engine's
        -- window form, so the check proves the semantics, not the
        -- plan. price in exact cents (ROUND-then-cast policy).
        WITH c AS (
            SELECT p_partkey,
                   CAST(ROUND(p_retailprice * 100) AS BIGINT)
                       AS price_cents,
                   CAST(p_size AS BIGINT) AS size
            FROM part
        )
        SELECT p.p_partkey, p.price_cents, p.size
        FROM c p
        WHERE NOT EXISTS (
            SELECT 1 FROM c q
            WHERE q.price_cents <= p.price_cents
              AND q.size >= p.size
              AND (q.price_cents < p.price_cents OR q.size > p.size)
        )
    """,
)
def agg_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: the parts no other part dominates
    (cheaper-or-equal AND bigger-or-equal, strictly better on one
    axis). Equal (price, size) duplicates all survive — neither
    strictly dominates the other. The product-search primitive the
    reference's ranking surface has no answer for.

    Algorithm (not the oracle's O(n²) anti-join): the 2-D skyline
    depends ONLY on the per-price maximum size, so the corpus first
    collapses to the price SUPPORT (one map-side-combined groupBy per
    distinct price — the events_ks_test framing), the running
    strictly-cheaper maximum runs over that bounded support, frontier
    price points survive, and the frontier broadcasts back to the
    rows so equal-(price, size) duplicates all re-emerge. Exact
    integer comparisons end-to-end.

    Plan/scale: the ONLY row-volume shuffle is the price-support
    hash agg (price-domain cardinality, never row cardinality); the
    unpartitioned running-max window sees support rows only, and the
    frontier→rows rejoin is a broadcast hash join (the frontier is a
    subset of the support). At 1e9 rows this plan moves |support|
    rows through the window — the r8 form sorted pre-pruned ROW
    cardinality there (adversarially unbounded)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
        F.col("p_size").cast("long").alias("size"),
    )
    # Collapse to the price support: skyline membership is decided by
    # per-price max size alone.
    sup = p.groupBy("price_cents").agg(F.max("size").alias("best_same"))
    w_cheaper = W.orderBy("price_cents").rowsBetween(
        W.unboundedPreceding, -1
    )
    frontier = (
        sup.select(
            "price_cents",
            "best_same",
            F.max("best_same").over(w_cheaper).alias("best_cheaper"),
        )
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("best_cheaper") < F.col("best_same"))
        )
    )
    # Rejoin so equal-(price, size) duplicates all survive.
    return (
        p.join(F.broadcast(frontier), "price_cents")
        .filter(F.col("size") == F.col("best_same"))
        .select("p_partkey", "price_cents", "size")
    )


# --------------------------------------------------------------------------
# set_except_all — multiset (bag) EXCEPT ALL semantics (round 8)
# --------------------------------------------------------------------------


@register(
    "set_except_all",
    tags=("b5",),
    oracle="""
        -- EXCEPT ALL: bag semantics — each occurrence on the right
        -- cancels exactly ONE occurrence on the left, so a customer
        -- with 5 'O' orders and 2 'F' orders keeps multiplicity 3.
        -- The distinct EXCEPT (set_except) answers "who appears only
        -- left"; EXCEPT ALL answers "how MUCH more", which is the
        -- inventory/ledger question (unreconciled occurrences, not
        -- unreconciled identities). DuckDB's native EXCEPT ALL
        -- replays Spark's exceptAll row for row.
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag (multiset) difference: each right-side
    occurrence cancels exactly ONE left-side occurrence, preserving
    multiplicity (a customer with five open orders and two finished
    ones survives three times). The distinct EXCEPT (`set_except`)
    answers "who appears only on the left"; EXCEPT ALL answers "how
    MUCH more" — the reconciliation semantics ledgers and inventory
    counts need, where every unmatched OCCURRENCE is a discrepancy
    even when the identity matches. Completes the set-operator family
    with its bag-algebra half (UNION ALL was always there; this is
    its difference-side sibling).

    Plan/scale: Spark compiles exceptAll to a per-key count
    difference + replicate (one hash shuffle per side, no sort, no
    pairwise anything) — the same aggregate shape a hand-written
    "count left minus count right, re-explode" would be, which is
    exactly how the multiset semantics stay scale-safe."""
    o = table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return left.exceptAll(right)


# --------------------------------------------------------------------------
# set_union_by_name — schema-drift union (round 8)
# --------------------------------------------------------------------------


@register(
    "set_union_by_name",
    tags=("b7",),
    oracle="""
        -- Union BY NAME across drifted schemas: the v1 feed has no
        -- priority column, the v2 feed has no status column -- the
        -- positional UNION ALL every pipeline writes first silently
        -- pairs status with priority (same arity, both varchar, NO
        -- error); name-based union aligns columns and null-fills the
        -- gaps. The append every schema-evolving ingest needs
        -- (scan_schema_evolution's READ-side story, at the UNION).
        SELECT o_orderkey, 'v1' AS feed, o_orderstatus,
               CAST(NULL AS VARCHAR) AS o_orderpriority
        FROM orders WHERE o_orderkey % 3 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, 'v2' AS feed,
               CAST(NULL AS VARCHAR) AS o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % 3 = 1
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union BY NAME across drifted schemas — the v1 feed lacks the
    priority column, the v2 feed lacks status: the positional UNION
    ALL every pipeline writes first silently pairs status with
    priority (same arity, both strings — NO error, just garbage);
    `unionByName(allowMissingColumns=True)` aligns on NAMES and
    null-fills the gaps. The append operation every schema-evolving
    ingest needs — `scan_schema_evolution` is the read-side of this
    story; this is the union-side, pinned.

    Plan/scale: two disjoint scan-stage filters + a zero-shuffle
    Union; the null-fill is a literal projection. Nothing here costs
    more than the positional union that would have corrupted the
    data."""
    o = table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", F.lit("v1").alias("feed"), "o_orderstatus"
    )
    v2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", F.lit("v2").alias("feed"), "o_orderpriority"
    )
    return v1.unionByName(v2, allowMissingColumns=True)
