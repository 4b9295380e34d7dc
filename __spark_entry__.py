"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — every implemented operator from SURVEY.md §2 plus the
                 LLM-pipeline operators; callables take (spark, sf_dir).
oracle_sql()   — DuckDB-equivalent SQL per query (omitted only for
                 approximate-by-construction sketch rollups: the HLL
                 distinct rollup and the KLL quantile rollup, whose
                 error bounds are asserted in tests instead).

Implementations live in parseable_spark/queries/ (relational.py,
product.py, llm.py); this module just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parseable_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary (hash
    aggregate over lineitem — SURVEY §2.2 'Hash aggregate')."""
    from parseable_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in sorted(registry().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(registry().items())
        if spec.oracle is not None
    }
