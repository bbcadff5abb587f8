"""Query registry — the single source of truth wiring the engine's
operator surface (SURVEY.md §2.B) to the driver contract in
``__spark_entry__.py``.

Every operator the engine claims is registered here with
  * a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
  * (when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.

Determinism contract (the driver hashes values order-insensitively but
exactly): every registered query must produce a bit-stable row multiset.
See ``compat.py`` for the decimal/rounding helpers that make float
aggregates reproducible across Spark and DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or "")
        )
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query/operator module (triggering registration) and
    return the registry."""
    # Imports are deferred so `import nchu_bigdata_spark` stays cheap and
    # circular imports are impossible.
    from nchu_bigdata_spark import queries as _q  # noqa: F401
    from nchu_bigdata_spark import operators as _o  # noqa: F401

    return REGISTRY
