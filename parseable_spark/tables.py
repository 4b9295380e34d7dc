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


def fan_out(df: DataFrame, key: str, max_bytes: int = 512 * 1024 * 1024) -> DataFrame:
    """Hash-repartition an under-parallel scan before CPU-heavy per-row
    work (optimization guide §2.5, input skew: a single-row-group
    parquet file is unsplittable, so a small-file table scans as ONE
    task no matter how many cores the session has — every regex/HOF in
    the projection then serializes on one core).

    Deliberately conservative so it is a NO-OP at warehouse scale and
    only fires on the provably-tiny-local-scan case:
    - input must be a plain file scan with fewer files than
      defaultParallelism (many-file tables already parallelize);
    - every file must be local and stat-able (object-store inputs are
      the planner's split problem, not ours);
    - total bytes must be small (default ≤ 512 MiB) so the repartition
      shuffle itself is trivially cheap — larger inputs get real
      parallelism from maxPartitionBytes splits.

    Hash-partitions on `key` (a unique row id spreads evenly) rather
    than round-robin: keyed repartition skips the sort-before-
    repartition pass and is deterministic under task retry.

    Every decline path degrades to returning `df` unchanged (safe
    no-op); declines are debug-logged so an under-parallel scan in an
    unexpected environment is diagnosable (ADVICE r11). File URIs are
    percent-decoded before stat'ing so local paths with encoded
    characters don't spuriously decline.
    """
    import logging as _logging
    import os as _os
    from urllib.parse import unquote as _unquote

    log = _logging.getLogger(__name__)
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        log.debug("fan_out declined: inputFiles() unavailable for this plan")
        return df
    if not files or len(files) >= target:
        if files:
            log.debug(
                "fan_out declined: %d files >= parallelism %d",
                len(files), target,
            )
        return df
    total = 0
    for f in files:
        p = _unquote(f.removeprefix("file:"))
        if not _os.path.isfile(p):
            log.debug("fan_out declined: non-local/unstatable input %s", f)
            return df
        total += _os.path.getsize(p)
    if total > max_bytes:
        log.debug(
            "fan_out declined: %d bytes > max_bytes %d", total, max_bytes
        )
        return df
    return df.repartition(target, F.col(key))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
