"""Z-order clustering layout (storage/layout.py).

The Morton key must interleave range-normalized column bits exactly
(pinned against an independent Python reference), and the clustered
layout must yield tight per-file min/max on EVERY clustered column —
the property parquet/manifest pruning consumes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parseable_spark.storage.layout import cluster_by_zorder, zorder_key


def _morton_ref(vals: list[int], bits: int) -> int:
    out = 0
    for b in range(bits):
        for ci, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * len(vals) + ci)
    return out


def test_key_matches_independent_morton_reference(spark):
    df = spark.range(256).select(
        F.col("id").alias("a"), (F.lit(255) - F.col("id")).alias("b")
    )
    got = {
        r["a"]: r["k"]
        for r in df.select("a", zorder_key(df, ["a", "b"], bits=8).alias("k")).collect()
    }
    # normalization maps [0,255] onto [0,255] exactly at bits=8
    for a in (0, 1, 17, 128, 255):
        assert got[a] == _morton_ref([a, 255 - a], 8), a


def test_single_column_key_is_monotone(spark):
    df = spark.range(1000).select((F.col("id") * 3).alias("v"))
    rows = df.select("v", zorder_key(df, ["v"], bits=10).alias("k")).orderBy("v").collect()
    ks = [r["k"] for r in rows]
    assert ks == sorted(ks)
    assert ks[0] == 0 and ks[-1] == (1 << 10) - 1


def test_string_columns_hash_bucket(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["s"])
    ks = [r["k"] for r in df.select(zorder_key(df, ["s"], bits=8).alias("k")).collect()]
    assert ks[0] == ks[2] and 0 <= ks[0] < 256  # stable bucket, in range
    assert ks[0] != ks[1]


def test_constant_and_null_safe(spark):
    df = spark.createDataFrame([(1,), (1,), (1,)], ["c"])
    ks = {r["k"] for r in df.select(zorder_key(df, ["c"], bits=8).alias("k")).collect()}
    assert ks == {0}  # degenerate range → 0, not division blowup


def test_errors(spark):
    df = spark.range(4).select(F.array(F.col("id")).alias("arr"), F.col("id"))
    with pytest.raises(ValueError, match="cannot z-order"):
        zorder_key(df, ["arr"])
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(df, ["id", "id", "id"], bits=21)


def test_clustered_files_have_tight_stats_on_both_columns(spark, tmp_path):
    """The pruning property: after cluster_by_zorder each file covers a
    compact rectangle, so the SUM of per-file ranges on EACH column is
    far below n_files * full_range (a time-sorted layout is tight on
    time only; ~full range on the other column in every file)."""
    n = 4096
    rng = np.random.default_rng(11)
    pdf = [(int(x), int(y)) for x, y in rng.integers(0, 10_000, size=(n, 2))]
    df = spark.createDataFrame(pdf, ["x", "y"])
    out = str(tmp_path / "z")
    cluster_by_zorder(df, ["x", "y"], num_files=16).write.parquet(out)

    import pyarrow.parquet as pq
    from pathlib import Path

    spans = {"x": [], "y": []}
    for f in Path(out).glob("*.parquet"):
        md = pq.ParquetFile(str(f)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for col in ("x", "y"):
            st = md.row_group(0).column(names[col]).statistics
            spans[col].append(st.max - st.min)
    for col in ("x", "y"):
        mean_span = sum(spans[col]) / len(spans[col])
        # 16 files ≈ 4×4 morton grid → each file spans ~1/4 of each
        # axis; assert well under half (a non-clustered layout sits ~1.0)
        assert mean_span < 0.5 * 10_000, (col, mean_span)
    # no rows lost, payload intact
    assert spark.read.parquet(out).count() == n
    assert spark.read.parquet(out).agg(F.sum("x")).first()[0] == sum(p[0] for p in pdf)


def test_zorder_column_dropped(spark):
    df = spark.range(100).select(F.col("id").alias("a"), (F.col("id") % 7).alias("b"))
    out = cluster_by_zorder(df, ["a", "b"], num_files=4)
    assert out.columns == ["a", "b"]
