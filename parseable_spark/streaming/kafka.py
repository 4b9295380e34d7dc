"""Kafka source — native Structured Streaming connector + envelope
parse into the ingest pipeline.

The reference embeds an rdkafka consumer that feeds consumed JSON
payloads into the same event pipeline as HTTP ingest
(src/connectors/kafka/*, SURVEY.md §2.1 'Kafka connector'). Spark's
built-in `kafka` source replaces ~2000 lines of consumer/partition
management: offsets, rebalancing, and backpressure
(maxOffsetsPerTrigger) are the connector's job, and each Kafka
partition becomes an input partition — on a 1000-executor cluster the
read parallelism is the topic's partition count, no custom code.

`parse_kafka_envelope` is a pure DataFrame transform (kafka wire
schema → typed event columns), so it is unit-testable without a
broker and identical in batch (`spark.read.format("kafka")`) and
streaming modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The exact option map handed to `format("kafka")` — pure so the
    contract is testable without the connector jar (the option names
    are the spark-sql-kafka public surface; a typo here is invisible
    until a real cluster run, hence the pin test)."""
    options = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        options["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return options


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """readStream over Kafka (requires the spark-sql-kafka package on
    the cluster — `kafka_wire.SPARK_SQL_KAFKA_PACKAGE` is the exact
    --packages pin for this pyspark build; raises AnalysisException
    where it isn't deployed). For jar-less environments,
    `kafka_wire.kafka_batch_df` consumes over the wire protocol
    directly into the same downstream shape."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        bootstrap_servers,
        topics,
        starting_offsets,
        max_offsets_per_trigger,
        fail_on_data_loss,
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_kafka_envelope(
    df: DataFrame,
    schema: StructType,
    timestamp_col: str = "p_timestamp",
) -> DataFrame:
    """Kafka wire records (binary key/value + topic/partition/offset
    metadata) → typed event rows.

    The value payload is JSON, parsed against an explicit schema
    (from_json is JVM-side — no Python in the hot path). The Kafka
    ingest timestamp becomes `p_timestamp` when the payload doesn't
    carry one, matching the reference where consumed events get
    ingest-time p_timestamp (src/connectors/kafka/processor.rs path).
    Envelope metadata is kept as p_-prefixed columns for lineage."""
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("event"),
        F.col("topic").alias("p_kafka_topic"),
        F.col("partition").alias("p_kafka_partition"),
        F.col("offset").alias("p_kafka_offset"),
        F.col("timestamp").alias("_kafka_ts"),
    )
    # backtick the field: OTel-style dotted names (service.name) would
    # otherwise parse as nested struct access and fail analysis
    cols = [F.col(f"event.`{f.name}`").alias(f.name) for f in schema.fields]
    out = parsed.select(
        *cols, "p_kafka_topic", "p_kafka_partition", "p_kafka_offset", "_kafka_ts"
    )
    if timestamp_col in schema.fieldNames():
        out = out.withColumn(
            timestamp_col,
            F.coalesce(F.col(timestamp_col), F.col("_kafka_ts").cast("timestamp_ntz")),
        )
    else:
        out = out.withColumn(timestamp_col, F.col("_kafka_ts").cast("timestamp_ntz"))
    return out.drop("_kafka_ts")
