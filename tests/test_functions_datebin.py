"""date_bin / epoch_seconds helpers (functions/__init__.py): floor
semantics for pre-anchor timestamps and Column-input robustness —
review findings r5 (CAST truncation binned pre-anchor timestamps one
bin too high vs DataFusion/DuckDB; _jc stringification broke on
aliased Columns).
"""

from __future__ import annotations

from datetime import datetime

import duckdb
from pyspark.sql import functions as F

from parseable_spark.functions import (
    date_bin,
    date_bin_sql,
    duckdb_date_bin_sql,
    epoch_seconds,
)


def test_pre_anchor_timestamps_floor_not_truncate(spark):
    """epoch 100 with anchor 200, bin 60: floor((100-200)/60) = -2 →
    bin start 80 (≤ ts). Truncation gave -1 → bin start 140, AFTER the
    timestamp itself."""
    df = spark.createDataFrame(
        [(datetime(1970, 1, 1, 0, 1, 40),)], "ts timestamp_ntz"
    )
    got = df.select(date_bin("ts", 60, anchor_epoch=200).alias("b")).collect()
    assert got[0]["b"] == 80


def test_date_bin_sql_matches_duckdb_everywhere(spark):
    """Spark SQL form == DuckDB oracle form for timestamps on both
    sides of the anchor."""
    stamps = [
        datetime(1970, 1, 1, 0, 0, 30),
        datetime(1970, 1, 1, 0, 1, 40),
        datetime(1970, 1, 1, 1, 0, 0),
        datetime(2026, 8, 15, 12, 34, 56),
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp_ntz")
    df.createOrReplaceTempView("bins_t")
    for anchor in (0, 200, 10_000):
        spark_rows = [
            r["b"]
            for r in spark.sql(
                f"SELECT {date_bin_sql('ts', 60, anchor)} AS b FROM bins_t ORDER BY ts"
            ).collect()
        ]
        con = duckdb.connect()
        duck_rows = [
            r[0]
            for r in con.sql(
                "SELECT "
                + duckdb_date_bin_sql("ts", 60, anchor)
                + " AS b FROM (SELECT unnest($stamps::TIMESTAMP[]) AS ts) ORDER BY ts",
                params={"stamps": stamps},
            ).fetchall()
        ]
        assert spark_rows == duck_rows, f"anchor={anchor}"
    spark.catalog.dropTempView("bins_t")


def test_epoch_seconds_accepts_aliased_and_derived_columns(spark):
    df = spark.createDataFrame(
        [(datetime(2026, 1, 1, 0, 0, 42),)], "ts timestamp_ntz"
    )
    # aliased Column: the old _jc.toString() round-trip produced
    # unparseable SQL ("ts AS x")
    got = df.select(
        epoch_seconds(F.col("ts").alias("x")).alias("e1"),
        epoch_seconds("ts").alias("e2"),
    ).collect()[0]
    assert got["e1"] == got["e2"] == 1767225642
