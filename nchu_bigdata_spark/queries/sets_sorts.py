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
