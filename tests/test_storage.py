"""Storage/catalog tests: sink layout, manifest stats, pruning, count
fast path, staging union, retention."""

from __future__ import annotations

from datetime import datetime, timedelta
from glob import glob

from parseable_spark.catalog.manifest import Manifest, build_file_stats
from parseable_spark.ingest.events import StreamConfig
from parseable_spark.storage.store import StreamStore


def _mk_store(spark, tmp_path, name="s1") -> StreamStore:
    return StreamStore(spark, str(tmp_path), StreamConfig(name=name))


def _ts(day: int, hour: int = 0, minute: int = 0) -> datetime:
    return datetime(2026, 8, day, hour, minute, 0)


class TestSinkAndManifest:
    def test_partition_layout_and_sorted_files(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        st.ingest([{"level": "info", "n": 1}], p_timestamp=_ts(1, 10, 5))
        st.ingest([{"level": "warn", "n": 2}], p_timestamp=_ts(1, 10, 5))
        st.ingest([{"level": "error", "n": 3}], p_timestamp=_ts(2, 11, 7))
        assert st.flush() == 3
        files = glob(f"{st.data_dir}/**/*.parquet", recursive=True)
        assert any("date=2026-08-01/hour=10/minute=05" in f for f in files)
        assert any("date=2026-08-02/hour=11/minute=07" in f for f in files)
        # manifest has footer stats incl. time bounds
        assert st.manifest.total_rows() == 3
        fs = st.manifest.files[0]
        assert fs.time_bounds("p_timestamp") is not None
        assert fs.file_size > 0

    def test_count_fast_path_agrees_with_scan(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        st.ingest([{"x": i} for i in range(50)], p_timestamp=_ts(1))
        st.flush()
        st.ingest([{"x": 99}], p_timestamp=_ts(3))  # still staged
        assert st.count_fast_path() == 51
        assert st.scan().count() == 51

    def test_manifest_pruning_skips_files(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        for day in (1, 2, 3):
            st.ingest([{"d": day}], p_timestamp=_ts(day))
            st.flush()  # one file per day
        all_paths = [f.file_path for f in st.manifest.files]
        pruned = st.manifest.prune_paths(
            "p_timestamp", "2026-08-02T00:00:00", "2026-08-03T00:00:00"
        )
        assert len(all_paths) == 3 and len(pruned) == 1
        df = st.scan(_ts(2), _ts(3), now=_ts(10))
        assert df.count() == 1
        assert df.collect()[0]["d"] == 2.0

    def test_limit_truncation(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        for day in (1, 2, 3):
            st.ingest([{"d": day} for _ in range(10)], p_timestamp=_ts(day))
            st.flush()
        paths = [f.file_path for f in st.manifest.files]
        assert len(st.manifest.limit_truncate(paths, 15)) == 2

    def test_metadata_histogram(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        for day in (1, 1, 2):
            st.ingest([{"d": day}], p_timestamp=_ts(day))
        st.flush()
        edges = ["2026-08-01T00:00:00", "2026-08-02T00:00:00", "2026-08-03T00:00:00"]
        assert st.manifest.histogram("p_timestamp", edges) == [2, 1]


class TestStagingWindow:
    def test_staging_included_only_in_fresh_window(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        st.ingest([{"x": 1}], p_timestamp=_ts(1, 10, 0))
        st.flush()
        st.ingest([{"x": 2}], p_timestamp=_ts(1, 12, 4))  # staged only
        now = _ts(1, 12, 5)
        # query window touches last 5 min → staging unioned in
        fresh = st.scan(_ts(1, 0, 0), _ts(1, 12, 5), now=now)
        assert fresh.count() == 2
        # historical window (end before now-5min) → parquet only
        old = st.scan(_ts(1, 0, 0), _ts(1, 11, 0), now=now)
        assert old.count() == 1

    def test_schema_evolution_across_flushes(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        st.ingest([{"a": 1}], p_timestamp=_ts(1))
        st.flush()
        st.ingest([{"b": "x"}], p_timestamp=_ts(2))
        st.flush()
        df = st.scan()
        assert {"a", "b"} <= set(df.columns)
        rows = {r["b"] for r in df.collect()}
        assert rows == {None, "x"}  # old file null-padded for new column


class TestRetention:
    def test_retention_deletes_old_partitions(self, spark, tmp_path):
        st = _mk_store(spark, tmp_path)
        for day in (1, 5, 9):
            st.ingest([{"d": day}], p_timestamp=_ts(day))
        st.flush()
        removed = st.apply_retention(days=5, now=_ts(10))
        assert removed == 1  # day 1 is >5 days old
        assert st.scan(now=_ts(10)).count() == 2
        assert st.manifest.total_rows() == 2


class TestFileStats:
    def test_build_file_stats_minmax(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(p)
        f = glob(f"{p}/*.parquet")[0]
        fs = build_file_stats(f)
        assert fs.num_rows == 100
        assert fs.columns["id"]["min"] == 0 and fs.columns["id"]["max"] == 99
        assert fs.columns["v"]["max"] == 198

    def test_prune_on_equals(self, spark, tmp_path):
        m = Manifest()
        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        spark.range(0, 10).coalesce(1).write.parquet(p1)
        spark.range(100, 110).coalesce(1).write.parquet(p2)
        for p in (p1, p2):
            m.add_file(glob(f"{p}/*.parquet")[0])
        assert len(m.prune_paths("id", equals={"id": 105})) == 1
        assert len(m.prune_paths("id", equals={"id": 50})) == 0
