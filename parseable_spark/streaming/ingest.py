"""Structured Streaming ingest — the reference's micro-batch staging
cycle, Spark-first.

Reference semantics (SURVEY.md §2.5): events buffer per-minute and
flush every 60 s to sorted parquet (src/lib.rs:80-86,
src/sync.rs:137-138); events whose user time partition is older than
N days (default 30) are rejected at ingest
(src/utils/json/flatten.rs:157-220). The reference has no windowed
aggregation engine — Spark's watermark + window is a superset we
expose as `windowed_counts`.

Scale notes: the streaming source/sink pair is the 1000-executor path
— `maxFilesPerTrigger` bounds per-batch work, the sink partitions by
date/hour/minute so downstream readers prune, and the watermark bounds
windowed-agg state. foreachBatch runs the same `write_stream_batch`
code as batch ingest, so both paths produce identical layouts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from parseable_spark.storage.writer import with_partition_columns

DEFAULT_FLUSH_SECONDS = 60  # staging flush cadence, src/lib.rs:80-86
DEFAULT_MAX_AGE_DAYS = 30  # time-partition age limit, flatten.rs:157-220


def _watermarkable(df: DataFrame, time_col: str) -> DataFrame:
    """Watermarks require TimestampType; p_timestamp is TIMESTAMP_NTZ
    engine-wide. With the session pinned to UTC the cast is lossless."""
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        return df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    return df


def json_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Micro-batch JSON source over a drop directory — the Spark analog
    of the reference's HTTP ingest buffer (src/handlers/http/ingest.rs:69).
    An explicit schema keeps the stream from re-inferring per batch;
    ingest-time normalization (flatten/coercion) happens upstream of the
    drop dir or inside foreachBatch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def late_data_filter(
    df: DataFrame,
    time_col: str = "p_timestamp",
    max_age_days: int = DEFAULT_MAX_AGE_DAYS,
) -> DataFrame:
    """Reject events older than `max_age_days` (and future-dated ones),
    matching the reference's user-time-partition validation
    (src/utils/json/flatten.rs:157-220)."""
    cutoff = F.current_timestamp() - F.expr(f"INTERVAL {int(max_age_days)} DAYS")
    return df.filter(
        (F.col(time_col) >= cutoff) & (F.col(time_col) <= F.current_timestamp())
    )


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    time_col: str = "p_timestamp",
    flush_seconds: int = DEFAULT_FLUSH_SECONDS,
    available_now: bool = False,
) -> StreamingQuery:
    """writeStream → partitioned parquet with the reference's 60 s flush
    cadence (src/sync.rs:137-138). Partition layout matches the batch
    writer (date/hour/minute) so the same table serves both paths."""
    out = with_partition_columns(df, time_col)
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .option("compression", "zstd")
        .partitionBy("date", "hour", "minute")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{flush_seconds} seconds")
    return writer.start()


def foreach_batch_sink(
    df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    flush_seconds: int = DEFAULT_FLUSH_SECONDS,
    available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch hook — runs the full batch ingest path (manifest
    commit, livetail fan-out, field-stats job) per micro-batch, the
    analog of the reference's per-flush pipeline
    (src/parseable/streams.rs:922+ → object_storage.rs:1035+)."""
    writer = df.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{flush_seconds} seconds")
    return writer.start()


def windowed_counts(
    df: DataFrame,
    time_col: str = "p_timestamp",
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window counts — the streaming analog of the
    counts-histogram API (src/query/mod.rs:537-662). The 5-minute
    default watermark mirrors the reference's staging freshness window
    (stream_schema_provider.rs:936-958); state for closed windows is
    dropped, which is what bounds memory on a long-running cluster."""
    keys = [F.window(F.col(time_col), window_duration)]
    keys += [F.col(c) for c in (group_cols or [])]
    return (
        _watermarkable(df, time_col)
        .withWatermark(time_col, watermark_delay)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("window.start").alias("start_time"),
            F.col("window.end").alias("end_time"),
            *[F.col(c) for c in (group_cols or [])],
            F.col("count"),
        )
    )


def sessionized_counts(
    df: DataFrame,
    time_col: str = "p_timestamp",
    gap: str = "5 minutes",
    watermark_delay: str = "5 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Session-window aggregation (gap-based): counts per activity
    session, per group key. A Spark-native stateful operator the
    reference has no analog for — watermark closes sessions whose gap
    has elapsed, bounding state on unbounded streams."""
    keys = [F.session_window(F.col(time_col), gap)]
    keys += [F.col(c) for c in (group_cols or [])]
    return (
        _watermarkable(df, time_col)
        .withWatermark(time_col, watermark_delay)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *[F.col(c) for c in (group_cols or [])],
            F.col("count"),
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    time_col: str = "p_timestamp",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """At-most-once per key within the watermark horizon
    (dropDuplicatesWithinWatermark): exactly the ingest-side idempotence
    an at-least-once delivery pipeline (Kafka/Kinesis retries) needs.
    State is bounded by the watermark — old keys age out, so this runs
    forever on an unbounded stream."""
    if df.isStreaming:
        return (
            _watermarkable(df, time_col)
            .withWatermark(time_col, watermark_delay)
            .dropDuplicatesWithinWatermark(keys)
        )
    return df.dropDuplicates(keys)  # batch frames: plain exact dedup
