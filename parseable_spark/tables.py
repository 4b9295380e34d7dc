"""Test-table loading and normalization.

The driver materializes TPC-H-ish tables plus `events`, `documents`,
`embeddings` under /root/testdata/sf*/ (TESTDATA.md). `events.ts` is a
parquet TIMESTAMP(NANOS) column which Spark cannot read natively; with
spark.sql.legacy.parquet.nanosAsLong=true it arrives as a raw
nanosecond epoch long and we rebuild a microsecond TIMESTAMP_NTZ with
pure (timezone-independent) arithmetic — bit-identical to DuckDB's
microsecond truncation of the same column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# NTZ epoch arithmetic: avoids session-timezone dependence entirely.
_NS_TO_NTZ = (
    "timestampadd(MICROSECOND, (ts div 1000) % 1000000, "
    "timestampadd(SECOND, ts div 1000000000, TIMESTAMP_NTZ '1970-01-01 00:00:00'))"
)


def normalize_events(df: DataFrame) -> DataFrame:
    """Convert the nanosAsLong `ts` column back to TIMESTAMP_NTZ (µs)."""
    if dict(df.dtypes).get("ts") == "bigint":
        return df.withColumn("ts", F.expr(_NS_TO_NTZ))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
