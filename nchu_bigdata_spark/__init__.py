"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo (swguo/NCHU.BigData), generalized per
SURVEY.md §2.B.

The reference (``/root/reference/``) is a Hadoop-MapReduce iterative
K-means over a PM2.5 time-series (``hadoop_tutorial/src/Kmeans.java:1-282``).
This engine re-expresses that surface — and its capability closure —
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Pandas UDFs only where built-ins can't express the semantics.

Layout:
    session     SparkSession builder (AQE, Arrow, UTC, tuned shuffle)
    io          schemas + readers for the testdata tables
    registry    query registry consumed by __spark_entry__.py
    queries/    relational core, scalar fns, UDF surface, streaming-batch
    operators/  kmeans, dedup, similarity, text, as-of join, multimodal
    streaming/  Structured Streaming runners (parity with batch forms)
"""

from nchu_bigdata_spark.session import get_session
from nchu_bigdata_spark.registry import REGISTRY, register, QuerySpec

__all__ = ["get_session", "REGISTRY", "register", "QuerySpec"]

__version__ = "0.1.0"
