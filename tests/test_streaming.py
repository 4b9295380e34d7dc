"""Streaming layer tests: Structured Streaming ingest cycle + livetail.

Models the reference's own coverage of the staging flush cycle
(src/parseable/streams.rs tests :1840-2190) and livetail channel
semantics (src/livetail.rs), via an end-to-end micro-batch run on a
temp drop directory.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from parseable_spark.streaming import (
    LiveTail,
    foreach_batch_sink,
    json_file_stream,
    late_data_filter,
    parquet_sink,
    windowed_counts,
)

SCHEMA = StructType(
    [
        StructField("p_timestamp", TimestampNTZType()),
        StructField("status", StringType()),
        StructField("latency_ms", DoubleType()),
    ]
)


def _write_drop_files(drop_dir, n_files=3, rows_per_file=10):
    base = datetime(2026, 8, 13, 12, 0, 0)
    total = 0
    for i in range(n_files):
        lines = []
        for j in range(rows_per_file):
            ts = base + timedelta(minutes=i, seconds=j)
            lines.append(
                json.dumps(
                    {
                        "p_timestamp": ts.isoformat(),
                        "status": "ok" if j % 2 == 0 else "error",
                        "latency_ms": float(10 * i + j),
                    }
                )
            )
            total += 1
        (drop_dir / f"batch_{i}.json").write_text("\n".join(lines))
    return total


def test_parquet_sink_end_to_end(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    n = _write_drop_files(drop)

    stream_df = json_file_stream(spark, str(drop), SCHEMA)
    assert stream_df.isStreaming
    q = parquet_sink(
        stream_df,
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "table"))
    assert out.count() == n
    # partition layout matches the batch writer (date/hour/minute)
    assert {"date", "hour", "minute"} <= set(out.columns)
    assert out.select("minute").distinct().count() == 3


def test_foreach_batch_runs_ingest_pipeline(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    n = _write_drop_files(drop, n_files=2)

    seen = {"rows": 0, "batches": 0}
    tail = LiveTail()
    pipe = tail.new_pipe("t1", "s1")

    def handle(batch_df, _batch_id):
        rows = [r.asDict() for r in batch_df.collect()]
        seen["rows"] += len(rows)
        seen["batches"] += 1
        tail.process("s1", rows)

    q = foreach_batch_sink(
        json_file_stream(spark, str(drop), SCHEMA),
        handle,
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    assert seen["rows"] == n
    got = sum(len(m.rows) for m in pipe if not m.is_skipped)
    assert got == n


def test_windowed_counts_batch_semantics(spark, tmp_path):
    # verify the aggregation shape on a static frame (same plan the
    # streaming query runs, minus the stateful watermark)
    base = datetime(2026, 8, 13, 12, 0, 0)
    rows = [
        (base + timedelta(seconds=30 * i), "ok" if i % 2 == 0 else "error", 1.0)
        for i in range(8)
    ]  # spans 12:00..12:03:30 → 4 one-minute windows
    df = spark.createDataFrame(rows, SCHEMA)
    out = windowed_counts(df, window_duration="1 minute", group_cols=["status"])
    res = {(r["start_time"].minute, r["status"]): r["count"] for r in out.collect()}
    assert res[(0, "ok")] == 1 and res[(0, "error")] == 1
    assert sum(res.values()) == 8


def test_late_data_filter(spark):
    now = datetime.utcnow()
    rows = [
        (now - timedelta(days=40), "too_old", 1.0),
        (now - timedelta(days=1), "fresh", 1.0),
        (now + timedelta(days=2), "future", 1.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    kept = [r["status"] for r in late_data_filter(df).collect()]
    assert kept == ["fresh"]


def test_livetail_overflow_skips():
    tail = LiveTail(capacity=2)
    pipe = tail.new_pipe("p1", "s")
    for i in range(4):
        tail.process("s", [{"i": i}])
    msgs = list(pipe)
    # first message is the skip marker (2 batches x 1 row dropped)
    assert msgs[0].is_skipped and msgs[0].skipped == 2
    assert [m.rows[0]["i"] for m in msgs[1:]] == [0, 1]


def test_livetail_unsubscribe():
    tail = LiveTail()
    tail.new_pipe("p1", "s")
    assert tail.has_subscribers("s")
    tail.drop_pipe("p1", "s")
    assert not tail.has_subscribers("s")
    tail.process("s", [{"x": 1}])  # no-op, must not raise
