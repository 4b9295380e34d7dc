"""Streaming sketch cube — per-day mergeable HLL/KLL partials
maintained by Structured Streaming, merged at query time.

The batch registry's q19_sketch_rollups shows the pre-aggregated-cube
pattern over data at rest; this is its streaming producer: every
micro-batch appends one partial-sketch row per (key, day) it touched.
Because HLL and KLL sketches are mergeable, the sink is APPEND-ONLY —
no read-modify-write, no state store, no upsert conflicts across
parallel writers. The cube stays tiny (rows = keys × days × batches,
compactable by re-merging), and any COUNT(DISTINCT)/percentile panel
over any day range is answered by unioning partials — at 100 TB the
raw events are never rescanned.

Reference parity: the reference keeps per-file field stats with its
hand-rolled HLL (src/storage/field_stats.rs:86-96) refreshed per
upload; the streaming cube is the same mergeable-partials idea wired
into the micro-batch pipeline. Beyond-reference: the reference has no
stream-processing engine (SURVEY §2.5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sketch_cube_batch_writer(
    cube_path: str,
    time_col: str = "p_timestamp",
    key_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    lg_k: int = 14,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: aggregate the micro-batch into per-(key,
    day) HLL(user) + KLL(value) partials and APPEND them to the cube.
    Partition by day so range queries prune at the directory level."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        daily = (
            batch_df.groupBy(
                F.col(key_col).alias("key"),
                F.to_date(F.col(time_col)).alias("day"),
            )
            .agg(
                # string form: hll_sketch_agg accepts int/bigint/string/
                # binary only; casting keeps the writer type-agnostic
                F.hll_sketch_agg(F.col(user_col).cast("string"), lg_k).alias("hll"),
                F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("kll"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .withColumn("batch_id", F.lit(batch_id))
        )
        daily.write.mode("append").partitionBy("day").parquet(cube_path)

    return write_batch


def query_sketch_cube(
    spark: SparkSession,
    cube_path: str,
    start_day: str | None = None,
    end_day: str | None = None,
    quantiles: tuple[float, ...] = (0.50, 0.95, 0.99),
) -> DataFrame:
    """Merge the cube's partials for a day range into per-key
    approx-distinct + quantile panels. Day predicates prune cube
    partitions; the union/fold runs over partial sketches only — the
    raw stream is never rescanned."""
    cube = spark.read.parquet(cube_path)
    if start_day is not None:
        cube = cube.filter(F.col("day") >= F.lit(start_day))
    if end_day is not None:
        cube = cube.filter(F.col("day") < F.lit(end_day))
    merged = (
        cube.groupBy("key")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("hll"))
            .cast("bigint")
            .alias("approx_users"),
            F.collect_list("kll").alias("_sks"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .select(
            "key",
            "approx_users",
            "n_rows",
            # binary fold over the bounded per-(key,day,batch) partial list
            F.aggregate(
                F.slice(F.col("_sks"), 2, F.greatest(F.size("_sks") - 1, F.lit(0))),
                F.element_at(F.col("_sks"), 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("_sk"),
        )
    )
    return merged.select(
        "key",
        "approx_users",
        "n_rows",
        *[
            F.round(F.kll_sketch_get_quantile_double("_sk", F.lit(q)), 3).alias(
                f"p{int(q * 100)}"
            )
            for q in quantiles
        ],
    ).orderBy("key")


def compact_sketch_cube(spark: SparkSession, cube_path: str, out_path: str) -> None:
    """Re-merge a cube's per-batch partials down to one row per (key,
    day) — the periodic maintenance job that keeps cube cardinality at
    keys × days regardless of how many micro-batches have appended."""
    cube = spark.read.parquet(cube_path)
    grouped = cube.groupBy("key", "day").agg(
        F.hll_union_agg("hll").alias("hll"),
        F.collect_list("kll").alias("_sks"),
        F.sum("n_rows").alias("n_rows"),
    )
    (
        grouped.select(
            "key",
            "day",
            "hll",
            F.aggregate(
                F.slice(F.col("_sks"), 2, F.greatest(F.size("_sks") - 1, F.lit(0))),
                F.element_at(F.col("_sks"), 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ).alias("kll"),
            "n_rows",
            F.lit(-1).alias("batch_id"),
        )
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(out_path)
    )
