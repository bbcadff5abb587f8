"""Algorithmic operators built above the DataFrame API (SURVEY.md §2.A,
§2.B-10): k-means, dedup family, similarity search, text analysis,
as-of join, multimodal columns. Importing this package registers their
query entries."""

import importlib

# Modules land incrementally; import those present so the registry
# stays usable mid-build.
for _mod in (
    "kmeans",
    "asof",
    "dedup",
    "similarity",
    "text",
    "multimodal",
    "pipeline",
    "graph",
):
    try:
        importlib.import_module(f"nchu_bigdata_spark.operators.{_mod}")
    except ModuleNotFoundError as e:
        if f"operators.{_mod}" not in str(e):
            raise
