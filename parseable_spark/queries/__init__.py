"""Query registry backing __spark_entry__.py.

Each QuerySpec pairs a Spark implementation (DataFrame API or generated
SQL routed through the engine) with the ANSI-SQL oracle DuckDB runs on
the same parquet tables. Column aliases MUST match between the two —
the driver sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver runs rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


def registry() -> dict[str, QuerySpec]:
    # import for side effects: each module registers its queries
    from . import llm, product, relational, traces_q  # noqa: F401

    return dict(_REGISTRY)
