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
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(df, ["id", "id", "id"], bits=21)
    # complex types hash-bucket instead of raising: zorder_key runs
    # inside the BACKGROUND compaction pass, where a ValueError means
    # the stream is never compacted again (r6 review)
    assert df.select(zorder_key(df, ["arr"]).alias("k")).count() == 4


def test_boolean_date_and_nan_columns_are_safe(spark):
    """r6 review: (a) boolean/date z-order columns raised ValueError
    forever inside compaction; they are orderable and now normalize.
    (b) one NaN/Inf in a numeric column made max() return NaN and the
    ANSI cast-to-long THROW for every row — non-finite values map to
    bucket 0 and the range stays finite."""
    from datetime import date

    df = spark.createDataFrame(
        [
            (True, date(2026, 1, 2), 1.0),
            (False, date(2026, 3, 4), float("nan")),
            (True, date(2026, 5, 6), float("inf")),
            (False, date(2026, 7, 8), 5.0),
        ],
        "b boolean, d date, x double",
    )
    keys = [r["k"] for r in df.select(zorder_key(df, ["b", "d", "x"]).alias("k")).collect()]
    assert len(keys) == 4 and all(k is not None and k >= 0 for k in keys)
    # single-column monotonicity for dates (orderable, not hashed)
    dk = [
        r["k"]
        for r in df.orderBy("d").select(zorder_key(df, ["d"]).alias("k")).collect()
    ]
    assert dk == sorted(dk)


def test_zorder_temp_column_name_collision(spark):
    """r6 review: a user column literally named __zorder made the
    layout select ambiguous / dropped user data."""
    df = spark.range(8).select(F.col("id"), F.lit("keep").alias("__zorder"))
    out = cluster_by_zorder(df, ["id"], 2)
    assert set(out.columns) == {"id", "__zorder"}
    assert out.filter(F.col("__zorder") == "keep").count() == 8


def test_compacted_zorder_files_do_not_overlap(spark, tmp_path):
    """r6 review: compact()'s coalesce produced output files with
    OVERLAPPING Morton ranges when n_out > 1 — defeating the
    file-level pruning the layout exists for. cluster_by_zorder's
    range partitioning gives disjoint per-file key ranges."""
    import glob as _glob

    import pyarrow.parquet as pq

    df = spark.range(4000).select(
        F.col("id"), (F.col("id") * 7 % 1000).alias("uid")
    )
    out = cluster_by_zorder(df, ["uid"], 4)
    out.write.mode("overwrite").parquet(str(tmp_path / "z"))
    ranges = []
    for f in _glob.glob(str(tmp_path / "z" / "*.parquet")):
        md = pq.ParquetFile(f).metadata
        uid_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "uid"
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(uid_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 4
    ranges.sort()
    overlaps = sum(
        1 for (a, b) in zip(ranges, ranges[1:]) if b[0] <= a[1]
    )
    # Morton-contiguous files: uid ranges are (near-)disjoint — strict
    # monotone ranges up to the one boundary value a range split shares
    assert overlaps <= 1, ranges


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


def test_compaction_applies_stream_zorder_config(spark, tmp_path):
    """Product integration: a stream created with zorder_cols gets
    Morton-sorted compacted files (tight per-row-group user_id stats),
    the setting survives restart via config.json, and query results are
    unaffected."""
    from datetime import datetime

    from parseable_spark.server import ParseableAPI

    root = str(tmp_path / "zc")
    api = ParseableAPI(spark, root)
    api.create_stream("ev", zorder_cols=["user_id", "p_timestamp"])
    store = api._stores["ev"]
    base = datetime(2026, 8, 10, 9, 0)
    import numpy as np

    rng = np.random.default_rng(3)
    for _ in range(3):  # 3 small files in one minute partition
        store.ingest(
            [{"user_id": int(u), "v": 1.0} for u in rng.integers(0, 10_000, 200)],
            p_timestamp=base,
        )
        store.flush()
    assert store.compact() == 1

    # compacted row groups are tight on user_id (a time-sorted layout
    # would span ~the full id range in every row group)
    import pyarrow.parquet as pq
    from glob import glob

    [f] = glob(f"{root}/ev/data/**/compacted-*.parquet", recursive=True)
    pf = pq.ParquetFile(f)
    md = pf.metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    # single row group here: whole-file sortedness shown by page-level
    # order — read user_id and assert Morton-ordering groups ids
    ids = pf.read(columns=["user_id"])["user_id"].to_pylist()
    # morton order on (user_id, ts) with constant ts ⇒ ascending user_id
    # BUCKETS (4096 normalization buckets; order within a bucket is
    # arbitrary)
    lo, hi = min(ids), max(ids)
    buckets = [int((i - lo) / (hi - lo) * 4095) for i in ids]
    assert buckets == sorted(buckets)
    assert md.row_group(0).column(names["user_id"]).statistics is not None

    # restart: zorder_cols reloads from config.json
    api2 = ParseableAPI(spark, root)
    assert api2._stores["ev"].config.zorder_cols == ["user_id", "p_timestamp"]
    # data intact
    assert api2._stores["ev"].scan().count() == 600


def test_create_stream_rejects_bad_zorder_name(spark, tmp_path):
    from parseable_spark.server import ApiError, ParseableAPI

    api = ParseableAPI(spark, str(tmp_path / "zbad"))
    with pytest.raises(ApiError, match="invalid z-order column"):
        api.create_stream("s", zorder_cols=["ok", "bad; DROP"])
