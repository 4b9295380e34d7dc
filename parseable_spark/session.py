"""SparkSession construction and runtime configuration.

Mirrors the reference engine's session tuning (SURVEY.md §4.3,
reference src/query/mod.rs:212-277, src/cli.rs:221-229, 466-491) with
Spark-native equivalents: AQE instead of fixed target_partitions,
unified memory manager instead of a fixed memory pool.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that the engine depends on. Applied both when
# we build our own session and when the caller hands us one (the
# driver's verify harness builds its own SparkSession).
RUNTIME_CONFS = {
    # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
    # vectorized reader rejects; read as long and convert ourselves
    # (see tables.normalize_events).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE: runtime shuffle-partition coalescing and skew-join handling
    # are essential at 100 TB; harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # deterministic timestamp semantics vs the DuckDB oracle
    "spark.sql.session.timeZone": "UTC",
    # point-lookup IN-lists (dedup_index.partitioned_chunked_isin) must
    # push per-value parquet predicates, not the default min/max-range
    # fallback that prunes nothing for hash-distributed keys; chunks
    # are ≤512 values since r10 (whole-stage codegen's split-method
    # call chain overflows the executor stack ~1k literals in a fused
    # scan stage — measured, SCALE.md r10; parquet predicate
    # conversion itself overflows ~1.5k — r7). The threshold stays at
    # 1001 so an operator-tuned larger chunk still pushes. Engine-wide
    # and documented here rather than mutated ad hoc per probe (r7).
    "spark.sql.parquet.pushdown.inFilterThreshold": "1001",
    # NOT set: spark.sql.parquet.aggregatePushdown — it only activates
    # on the V2 parquet source (parquet is in useV1SourceList by
    # default), and flipping the whole engine to V2 changes
    # pushdown/stats behavior everywhere for a win the manifest
    # COUNT(*) fast path already covers. Measured inert on V1, reverted.
}


def default_parallelism() -> int:
    """SPARK_GRAFT_CPUS, clamped sane: an empty/garbage value (a wrapper
    exporting an unset var) or 0 must not brick every get_spark() call
    with ValueError / local[0] (review finding)."""
    raw = os.environ.get("SPARK_GRAFT_CPUS", "")
    try:
        n = int(raw)
    except ValueError:
        n = os.cpu_count() or 8
    return max(1, n) if n > 0 else (os.cpu_count() or 8)


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-provided)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; engine degrades gracefully
    return spark


def get_spark(app_name: str = "parseable-spark", master: str | None = None) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # one shuffle partition per core locally; a real cluster would
        # size this to ~2-3x total cores (AQE coalesces the excess)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
