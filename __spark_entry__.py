"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query at sf0.001 (smoke check).
queries()      — every implemented operator from SURVEY.md §2 plus the
                 LLM-pipeline operators; callables take (spark, sf_dir).
                 Exactly 50 entries (q01..q50): the driver's correctness
                 gate enumerates at most 50 sorted names, so operators
                 sharing a scan are combined (COVERAGE.md has the
                 r2→r3 name mapping) and every family is hash-checked.
oracle_sql()   — DuckDB-equivalent SQL per query, for ALL 50 entries.
                 Even the approximate sketch rollup (q19) is hash-gated
                 since r4: it emits exact COUNT(DISTINCT)/percentile
                 companion columns plus within-bound booleans the oracle
                 pins to TRUE, so sketch drift flips the hash.

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
